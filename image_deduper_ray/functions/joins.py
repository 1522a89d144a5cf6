"""Explicit partitioned hash join (bucket -> per-bucket pandas merge).

Ray 2.49's ``Dataset.join`` (Acero-backed) intermittently loses block
schemas for empty partitions, which poisons chained joins. This module
implements the portable pattern instead: add ``__bucket = hash(key) % P``
to both sides (vectorized), conform both sides to one superset schema,
union, ``groupby("__bucket")`` (ONE shuffle), and run a C-speed
``pd.merge`` per bucket inside ``map_groups``. P = num_partitions bounds
reducer memory; skewed keys can be salted by raising P.

This is the J4 pair-signature attach / containment content attach /
cluster left-outer assign primitive (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_KEY = "__jk"
_BUCKET = "__bucket"
_SIDE = "__side"


def _bucket_of(keys: list[str], num_partitions: int) -> np.ndarray:
    """Deterministic bucket from the first 8 chars of a hex-ish string
    key, vectorized over fixed-width bytes (no Python hash())."""
    if not keys:
        return np.empty(0, dtype=np.int32)
    arr = np.array(keys, dtype="S8")  # first 8 bytes, zero-padded
    raw = np.zeros((len(keys), 8), dtype=np.uint8)
    view = arr.view(np.uint8).reshape(len(keys), -1)
    raw[:, : view.shape[1]] = view[:, :8]
    d = raw.astype(np.uint64)
    # map ASCII hex digits to values; non-hex bytes contribute their code
    d = np.where((d >= 97), d - 87, np.where(d >= 65, d - 55, np.where(d >= 48, d - 48, d)))
    val = np.zeros(len(keys), dtype=np.uint64)
    for i in range(8):
        val = val * np.uint64(31) + d[:, i]
    return (val % np.uint64(num_partitions)).astype(np.int32)


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key_left: str, key_right: str,
              left_schema: pa.Schema, right_schema: pa.Schema,
              how: str = "inner", num_partitions: int | None = None) -> ray.data.Dataset:
    """Join two datasets on string keys.

    ``left_schema`` / ``right_schema``: the exact output columns taken
    from each side (right_schema must EXCLUDE its key column; its values
    are attached to matching left rows). Column names must be disjoint.
    how: "inner" or "left".
    """
    from .groups import default_partitions

    num_partitions = num_partitions or default_partitions()
    lcols = left_schema.names
    rcols = right_schema.names
    super_fields = ([pa.field(_KEY, pa.string()), pa.field(_BUCKET, pa.int32()),
                     pa.field(_SIDE, pa.int8())]
                    + list(left_schema) + list(right_schema))
    super_schema = pa.schema(super_fields)

    def conform_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = t[key_left].to_pylist()
        cols = {_KEY: pa.array(keys, pa.string()),
                _BUCKET: pa.array(_bucket_of(keys, num_partitions)),
                _SIDE: pa.array(np.zeros(n, dtype=np.int8))}
        for f in left_schema:
            cols[f.name] = t[f.name].cast(f.type) if t[f.name].type != f.type else t[f.name]
        for f in right_schema:
            cols[f.name] = pa.nulls(n, f.type)
        return pa.table(cols, schema=super_schema)

    def conform_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = t[key_right].to_pylist()
        cols = {_KEY: pa.array(keys, pa.string()),
                _BUCKET: pa.array(_bucket_of(keys, num_partitions)),
                _SIDE: pa.array(np.ones(n, dtype=np.int8))}
        for f in left_schema:
            cols[f.name] = pa.nulls(n, f.type)
        for f in right_schema:
            cols[f.name] = t[f.name].cast(f.type) if t[f.name].type != f.type else t[f.name]
        return pa.table(cols, schema=super_schema)

    both = (left.map_batches(conform_left, batch_format="pyarrow",
                             zero_copy_batch=True)
            .union(right.map_batches(conform_right, batch_format="pyarrow",
                                     zero_copy_batch=True)))

    out_schema = pa.schema(list(left_schema) + list(right_schema))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ldf = g.loc[g[_SIDE] == 0, [_KEY] + lcols]
        rdf = g.loc[g[_SIDE] == 1, [_KEY] + rcols]
        rdf = rdf.drop_duplicates(subset=[_KEY])  # supply unique per key
        m = ldf.merge(rdf, on=_KEY, how="left" if how == "left" else "inner",
                      suffixes=(False, False))
        return m[lcols + rcols]

    joined = both.groupby(_BUCKET).map_groups(merge_bucket, batch_format="pandas")

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        cols = {}
        for f in out_schema:
            c = t[f.name]
            cols[f.name] = c.cast(f.type) if c.type != f.type else c
        return pa.table(cols, schema=out_schema)

    return joined.map_batches(finalize, batch_format="pyarrow")
