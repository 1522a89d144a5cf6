"""Partition-level group processing.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per GROUP —
per-group pandas slicing dominates wall time when groups are tiny and
numerous (one per file / per bucket), which is exactly the dedup shape.
The scale-correct pattern: hash-partition on the key (ONE shuffle into
``num_partitions`` groups — all rows of a key land together), then run
a vectorized block function once per PARTITION that handles all its
groups with numpy segment operations.

This is the engine's equivalent of choosing sensible reducer counts in
a shuffle: ``num_partitions`` bounds reducer memory and parallelism is
``num_partitions`` regardless of how many logical keys exist.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_PK = "__pk"


def default_partitions(min_parts: int = 32, per_cpu: int = 4) -> int:
    """Partition count scaled to the cluster: reducer parallelism for
    the wide ops follows CPU count instead of a fixed constant (a fixed
    32 under-partitions a 32-cpu node — skewed partitions leave cores
    idle; at multi-node scale this tracks total cluster CPUs)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return max(min_parts, per_cpu * cpus)


def _key_hash(t: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Deterministic uint64 hash of the key columns (pandas hash_array:
    fixed key, stable across processes — required for resume)."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    for c in key_cols:
        col = t[c].to_numpy(zero_copy_only=False)
        h = h * np.uint64(1099511628211) + pd.util.hash_array(col)
    return h


def partitioned_group_map(ds: ray.data.Dataset, key_cols: list[str],
                          block_fn, num_partitions: int | None,
                          out_schema: pa.Schema | None = None) -> ray.data.Dataset:
    """Hash-partition ``ds`` on ``key_cols`` and apply ``block_fn``
    (pandas DataFrame -> pandas DataFrame) once per partition. The block
    function sees every row of every key assigned to its partition and
    is responsible for its own group segmentation (sort + boundaries).
    If ``out_schema`` is given the output blocks are conformed to Arrow
    (mixing pandas map_groups blocks with arrow blocks trips Ray 2.49).
    ``num_partitions=None`` derives from cluster CPU count."""
    num_partitions = num_partitions or default_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        pk = (_key_hash(t, key_cols) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column(_PK, pa.array(pk))

    def run_block(df: pd.DataFrame) -> pd.DataFrame:
        return block_fn(df.drop(columns=[_PK]))

    out = (ds.map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(_PK).map_groups(run_block, batch_format="pandas"))
    if out_schema is not None:
        from .arrow_utils import ensure_schema

        out = out.map_batches(lambda t: ensure_schema(t, out_schema),
                              batch_format="pyarrow")
    return out


def group_starts(*key_arrays: np.ndarray) -> np.ndarray:
    """Boolean mask marking the first row of each group in
    already-sorted key arrays."""
    n = len(key_arrays[0])
    if n == 0:
        return np.zeros(0, dtype=bool)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in key_arrays:
        new[1:] |= k[1:] != k[:-1]
    return new
