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


@ray.remote
def _shuffle_map_task(key_cols: list[str], num_partitions: int, *blocks):
    """One map task of the raw hash shuffle: split its blocks into
    ``num_partitions`` zero-copy slices by key hash (one argsort, one
    take). Returns ``num_partitions`` values (None for empty slices).
    Takes SEVERAL upstream blocks (the driver coalesces small blocks)
    so task count stays O(CPUs), not O(blocks)."""
    ts = []
    for block in blocks:
        t = block if isinstance(block, pa.Table) \
            else pa.Table.from_pandas(block, preserve_index=False)
        # schema-less / empty blocks do arrive from upstream unions
        # (Ray 2.49): skip rather than KeyError
        if t.num_rows and all(c in t.column_names for c in key_cols):
            ts.append(t)
    if not ts:
        return tuple(None for _ in range(num_partitions))
    if len(ts) == 1:
        t = ts[0]
    else:
        cols = ts[0].column_names
        t = pa.concat_tables([x.select(cols) for x in ts])
    pk = (_key_hash(t, key_cols) % np.uint64(num_partitions)).astype(np.int64)
    order = np.argsort(pk, kind="stable")
    t2 = t.take(pa.array(order))
    pks = pk[order]
    bounds = np.searchsorted(pks, np.arange(num_partitions + 1))
    return tuple(
        t2.slice(bounds[i], bounds[i + 1] - bounds[i])
        if bounds[i + 1] > bounds[i] else None
        for i in range(num_partitions))


@ray.remote
def _shuffle_reduce_task(block_fn, out_schema: pa.Schema, as_pandas: bool,
                         *parts) -> pa.Table:
    """One reduce task: concat this partition's slices from every map
    task, run the block function once, conform to ``out_schema``."""
    from .arrow_utils import ensure_schema

    ts = [p for p in parts if p is not None and p.num_rows > 0]
    if not ts:
        return out_schema.empty_table()
    t = pa.concat_tables(ts).combine_chunks()
    if as_pandas:
        out = block_fn(t.to_pandas())
        out = pa.Table.from_pandas(out, preserve_index=False) \
            if not isinstance(out, pa.Table) else out
    else:
        out = block_fn(t)
    return ensure_schema(out, out_schema)


def _manual_shuffle(ds: ray.data.Dataset, key_cols: list[str], block_fn,
                    num_partitions: int, out_schema: pa.Schema,
                    as_pandas: bool) -> ray.data.Dataset:
    """Raw-task hash shuffle: one map task per upstream block (streamed
    via ``iter_internal_ref_bundles`` — the driver only ever handles
    refs), one reduce task per partition. Replaces Ray Data's sort-based
    ``groupby().map_groups`` for the partition-block pattern: the sort
    machinery costs ~9 s of mostly-serial overhead PER SHUFFLE at this
    scale (measured, 173k rows / 8 cpus) vs <1 s for this path — that
    overhead was the dominant scaling-efficiency loss across the wide
    stages. Driver ref load is num_blocks x num_partitions; keep
    ``num_partitions`` at O(4 x CPUs) (the default), not O(rows)."""
    import ray as _ray

    refs = [r for bundle in ds.iter_internal_ref_bundles()
            for r in bundle.block_refs]
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())
    # coalesce small upstream blocks: O(CPUs) map tasks, each slicing
    # into num_partitions — task count stays bounded however many tiny
    # blocks the upstream produced
    cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    n_maps = max(2, min(len(refs), 4 * cpus))
    per = (len(refs) + n_maps - 1) // n_maps
    maps = [
        _shuffle_map_task.options(num_returns=num_partitions).remote(
            key_cols, num_partitions, *refs[i:i + per])
        for i in range(0, len(refs), per)]
    outs = [
        _shuffle_reduce_task.remote(block_fn, out_schema, as_pandas,
                                    *(m[p] for m in maps))
        for p in range(num_partitions)]
    return ray.data.from_arrow_refs(outs)


def partitioned_group_map(ds: ray.data.Dataset, key_cols: list[str],
                          block_fn, num_partitions: int | None,
                          out_schema: pa.Schema | None = None) -> ray.data.Dataset:
    """Hash-partition ``ds`` on ``key_cols`` and apply ``block_fn``
    (pandas DataFrame -> pandas DataFrame) once per partition. The block
    function sees every row of every key assigned to its partition and
    is responsible for its own group segmentation (sort + boundaries).
    ``num_partitions=None`` derives from cluster CPU count.

    With ``out_schema`` given (every hot path) the shuffle runs on raw
    Ray tasks (``_manual_shuffle``) — Ray Data's sort-based groupby
    costs ~9 s serial overhead per shuffle at bench scale. Without a
    schema the legacy groupby path is kept (output schema of an empty
    partition would be unknowable)."""
    num_partitions = max(2, num_partitions or default_partitions())

    if out_schema is not None:
        return _manual_shuffle(ds, key_cols, block_fn, num_partitions,
                               out_schema, as_pandas=True)

    def add_pk(t: pa.Table) -> pa.Table:
        pk = (_key_hash(t, key_cols) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column(_PK, pa.array(pk))

    def run_block(df: pd.DataFrame) -> pd.DataFrame:
        return block_fn(df.drop(columns=[_PK]))

    return (ds.map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(_PK).map_groups(run_block, batch_format="pandas"))


def partitioned_group_map_arrow(ds: ray.data.Dataset, key_cols: list[str],
                                block_fn, num_partitions: int | None,
                                out_schema: pa.Schema | None = None
                                ) -> ray.data.Dataset:
    """``partitioned_group_map`` with an Arrow block function
    (pa.Table -> pa.Table). Use when the payload carries binary/string
    columns (e.g. 1 KB minhash signatures): the pandas path would turn
    every value into a Python object on both sides of the block call,
    while Arrow blocks keep them as C buffers end to end. Requires
    ``out_schema`` (the raw-task shuffle must type empty partitions)."""
    if out_schema is None:
        raise ValueError("partitioned_group_map_arrow requires out_schema")
    num_partitions = max(2, num_partitions or default_partitions())
    return _manual_shuffle(ds, key_cols, block_fn, num_partitions,
                           out_schema, as_pandas=False)


def partitioned_sum(ds: ray.data.Dataset, key_cols: list[str],
                    value_col: str, num_partitions: int | None,
                    out_schema: pa.Schema,
                    out_name: str | None = None,
                    ) -> ray.data.Dataset:
    """Distributed ``SELECT key_cols, SUM(value_col) GROUP BY key_cols``
    as a hash-partitioned vectorized block aggregate. Ray 2.49's native
    ``groupby().sum()`` runs a full sort-based shuffle that measures
    ~10x slower on narrow high-cardinality keys; this shape is one
    partition shuffle + one lexsort + one ``np.add.reduceat`` per
    partition. The sum column is named ``out_name`` (default
    ``sum(value_col)``, native-API compatible); ``out_schema`` must use
    the same name."""
    out_name = out_name or f"sum({value_col})"

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(key_cols + [value_col]).rename_columns(
                key_cols + [out_name])
        keys = [t[c].to_numpy(zero_copy_only=False) for c in key_cols]
        vals = t[value_col].to_numpy(zero_copy_only=False)
        order = np.lexsort(tuple(reversed(keys)))
        keys = [k[order] for k in keys]
        vals = vals[order]
        new = group_starts(*keys)
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(vals, starts)
        cols = {c: pa.array(k[starts]) for c, k in zip(key_cols, keys)}
        cols[out_name] = pa.array(sums)
        return pa.table(cols)

    return partitioned_group_map_arrow(ds, key_cols, block, num_partitions,
                                       out_schema=out_schema)


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


def segmented_rank(*key_arrays: np.ndarray) -> np.ndarray:
    """1-based rank of each row within its run of equal keys, for
    already-sorted key arrays — the vectorized ROW_NUMBER() OVER
    (PARTITION BY keys) for block functions (top-N per group, quota
    sampling)."""
    new = group_starts(*key_arrays)
    if len(new) == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.flatnonzero(new)
    gidx = np.cumsum(new, dtype=np.int64) - 1
    return np.arange(len(new), dtype=np.int64) - starts[gidx] + 1


def csr_expand(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Expand per-row half-open ranges [lo_i, hi_i) into flat gather
    indices: returns (row_idx, take) where ``take`` concatenates every
    range and ``row_idx[j]`` is the i that produced ``take[j]``. The
    vectorized inner loop of windowed joins and probe-table lookups —
    output size is the true hit count, never a cross product."""
    cnt = hi - lo
    rows = np.repeat(np.arange(len(lo)), cnt)
    take = np.repeat(lo, cnt) + (np.arange(cnt.sum()) -
                                 np.repeat(np.cumsum(cnt) - cnt, cnt))
    return rows, take
