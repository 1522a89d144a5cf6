"""Discovery source: reading the files table.

Analog of ``discover_images`` / ``discover_images_in_directory``
(/root/reference/crates/image-deduper-core/src/discovery/mod.rs:16-109):
the recursive WalkDir + filters becomes the Parquet read itself —
multi-root fan-out is a list of paths, the extension/format predicate is
lang row-filter pushdown, the excluded-directories filter is a
vectorized path-prefix predicate, and per-file metadata (S3,
discovery/mod.rs:119-128) becomes derived columns computed in the same
batch pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


FILES_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_files(paths: str | list[str], *, langs: list[str] | None = None,
               exclude_path_prefixes: list[str] | None = None,
               include_hidden: bool = False,
               override_num_blocks: int | None = None) -> ray.data.Dataset:
    """Read the files table with predicate pushdown at the scan.

    langs -> row-group-level filter (the supported-format predicate,
    types.rs:38-44); exclude_path_prefixes -> the excluded-directories
    filter (discovery/mod.rs:68-72); hidden '.'-segment filter
    (discovery/mod.rs:61-66).
    """
    flt = None
    if langs is not None:
        flt = pc.field("lang").isin(langs)
    ds = ray.data.read_parquet(paths, columns=FILES_COLUMNS, filter=flt,
                               override_num_blocks=override_num_blocks)

    if exclude_path_prefixes or not include_hidden:
        prefixes = tuple(exclude_path_prefixes or ())

        def _filter(batch: pa.Table) -> pa.Table:
            mask = pa.array([True] * len(batch))
            for p in prefixes:
                mask = pc.and_(mask, pc.invert(pc.starts_with(batch["path"], p)))
            if not include_hidden:
                # any path segment starting with '.'
                hidden = pc.match_substring_regex(batch["path"], r"(^|/)\.")
                mask = pc.and_(mask, pc.invert(hidden))
            return batch.filter(mask)

        ds = ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)
    return ds
