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


def _sniff_format(paths: str | list[str]) -> str:
    """File-extension sniff over the first path entry (the
    magic-bytes-dispatch analog, M14): parquet | json | csv."""
    import os

    p = paths[0] if isinstance(paths, (list, tuple)) else paths
    if os.path.isdir(p):
        for f in sorted(os.listdir(p)):
            if f.startswith(("_", ".")):   # markers/manifests, not data
                continue
            ext = f.rsplit(".", 1)[-1].lower()
            if ext in ("parquet", "json", "jsonl", "csv"):
                return "json" if ext in ("json", "jsonl") else ext
        return "parquet"
    ext = p.rsplit(".", 1)[-1].lower()
    return {"json": "json", "jsonl": "json", "csv": "csv"}.get(ext, "parquet")


def read_files(paths: str | list[str], *, langs: list[str] | None = None,
               exclude_path_prefixes: list[str] | None = None,
               include_hidden: bool = False,
               override_num_blocks: int | None = None,
               file_format: str = "auto") -> ray.data.Dataset:
    """Read the files table with predicate pushdown at the scan.

    langs -> row-group-level filter (the supported-format predicate,
    types.rs:38-44); exclude_path_prefixes -> the excluded-directories
    filter (discovery/mod.rs:68-72); hidden '.'-segment filter
    (discovery/mod.rs:61-66).

    ``file_format``: 'parquet' (default), 'json' (JSONL) or 'csv' —
    'auto' sniffs the extension. Parquet gets true columnar pushdown
    (lang filter evaluated at the row-group scan); the row formats are
    full scans by nature, so their lang filter runs as the first
    vectorized batch predicate instead — same semantics, the format's
    own cost. Columns are conformed to FILES_COLUMNS either way so
    every downstream stage is format-agnostic."""
    if file_format == "auto":
        file_format = _sniff_format(paths)
    flt = None
    if file_format == "parquet":
        if langs is not None:
            flt = pc.field("lang").isin(langs)
        ds = ray.data.read_parquet(paths, columns=FILES_COLUMNS, filter=flt,
                                   override_num_blocks=override_num_blocks)
    else:
        if file_format == "json":
            ds = ray.data.read_json(
                paths, **({"override_num_blocks": override_num_blocks}
                          if override_num_blocks else {}))
        elif file_format == "csv":
            ds = ray.data.read_csv(
                paths, **({"override_num_blocks": override_num_blocks}
                          if override_num_blocks else {}))
        else:
            raise ValueError(f"unknown file_format {file_format!r}")
        lang_set = langs
        src_desc = paths if isinstance(paths, str) else ", ".join(paths)

        def conform(t: pa.Table) -> pa.Table:
            # validate before projecting: a hand-rolled JSONL/CSV file
            # missing a column should name the column and the source,
            # not surface as a bare KeyError deep inside a Ray task
            missing = [c for c in FILES_COLUMNS if c not in t.column_names]
            if missing and t.num_rows:
                raise ValueError(
                    f"{file_format} source {src_desc!r} is missing "
                    f"required files-table column(s) {missing}; "
                    f"expected {FILES_COLUMNS}, got {t.column_names}")
            if t.num_rows == 0:
                return pa.table({c: pa.array([], pa.string())
                                 for c in FILES_COLUMNS})
            out = pa.table({c: t[c].cast(pa.string())
                            for c in FILES_COLUMNS})
            if lang_set is not None:
                out = out.filter(pc.is_in(
                    out["lang"], value_set=pa.array(lang_set, pa.string())))
            return out

        ds = ds.map_batches(conform, batch_format="pyarrow",
                            zero_copy_batch=True)

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


# extension -> canonical lang (detect_image_format analog,
# file_processing.rs:214-231): used when the lang column is absent/dirty
EXT_LANG = {"py": "py", "pyw": "py", "js": "js", "mjs": "js", "ts": "ts",
            "go": "go", "rs": "rs", "c": "c", "h": "c", "cc": "cpp",
            "cpp": "cpp", "hpp": "cpp", "java": "java", "rb": "rb",
            "sh": "sh", "txt": "txt", "md": "md"}


def with_path_ext(ds: ray.data.Dataset, *, normalize_lang: bool = False) -> ray.data.Dataset:
    """Add ``ext`` (lowercased final extension of ``path``; '' if none —
    get_file_extension analog, file_validation.rs:82-87) and optionally
    ``lang_from_ext`` (M19 dict-normalized lang). Vectorized pyarrow
    regex — no Python rows."""

    def f(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["path"], r"\.(?P<ext>[A-Za-z0-9_]+)$")
        ext = pc.if_else(pc.is_valid(m),
                         pc.ascii_lower(pc.struct_field(m, "ext")), "")
        t = t.append_column("ext", ext)
        if normalize_lang:
            lang = pa.array([EXT_LANG.get(e, "other")
                             for e in ext.to_pylist()], pa.string())
            t = t.append_column("lang_from_ext", lang)
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
