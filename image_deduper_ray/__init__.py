"""Ray-Data-native near-duplicate detection + clustering engine for
source code — the capabilities of richardjlyon/image-deduper (read-only
reference at /root/reference) recast onto Parquet tables of code files.
See SURVEY.md for the structural mapping."""

from .config import DedupConfig, DEFAULT_CONFIG  # noqa: F401
