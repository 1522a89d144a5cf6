"""Relational scan-aggregates over the TPC-H-ish tables.

The lineitem pricing summary is the canonical partial-aggregation
benchmark shape (TPC-H Q1): a predicate-pruned scan of the biggest
table, per-batch combiner aggregation down to a handful of
(returnflag, linestatus) groups, and one tiny final merge — no wide
shuffle at any scale, because the combiner output is O(groups) per
block regardless of input size.

Money columns are summed as exact integers (cents / basis points, the
same ``floor(x * scale + 0.5)`` rule on both engine and oracle side) so
the result is bit-stable under any summation order — distributed
float SUM would differ from the oracle's at the ULP level.

Reference analog: the per-batch counter rollup of process_batches
(/root/reference/crates/image-deduper-core/src/lib.rs:131-259) — many
workers emit partial counts, one final merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.groups import group_starts, partitioned_group_map

PRICING_CUTOFF = "1998-09-02"


def pricing_summary(sf_dir: str, cutoff: str = PRICING_CUTOFF,
                    ) -> ray.data.Dataset:
    """(l_returnflag, l_linestatus, sum_qty, sum_base_cents, sum_disc_bp,
    n_rows) for lineitems shipped at or before ``cutoff``.

    The shipdate predicate is pushed into the Parquet read (row-group
    pruning — untouched ranges never leave storage); only the six
    needed columns are scanned."""
    import datetime

    cut = datetime.datetime.fromisoformat(cutoff)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") <= pc.scalar(cut)))

    out_schema = pa.schema([
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("sum_qty", pa.int64()), ("sum_base_cents", pa.int64()),
        ("sum_disc_bp", pa.int64()), ("n_rows", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        # belt-and-braces re-filter: the pushdown prunes row groups, the
        # residual predicate must still hold row-exactly
        mask = pc.less_equal(t["l_shipdate"], pa.scalar(cut)).combine_chunks()
        t = t.filter(mask)
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "l_linestatus": t["l_linestatus"].to_numpy(zero_copy_only=False),
            # exact integer money: floor(x*scale + 0.5), the same rule as
            # the SQL oracle (and j_orders_by_segment's precedent)
            "qty": t["l_quantity"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "cents": np.floor(t["l_extendedprice"]
                              .to_numpy(zero_copy_only=False) * 100 + 0.5)
            .astype(np.int64),
            "bp": np.floor(t["l_discount"]
                           .to_numpy(zero_copy_only=False) * 10000 + 0.5)
            .astype(np.int64)})
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("qty", "sum"), sum_base_cents=("cents", "sum"),
            sum_disc_bp=("bp", "sum"), n_rows=("qty", "size"))
        g = g.reset_index()
        return pa.Table.from_pandas(g, schema=out_schema,
                                    preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["sum_qty", "sum_base_cents", "sum_disc_bp", "n_rows"]
        if df.empty:
            return pd.DataFrame({"l_returnflag": pd.Series([], dtype=object),
                                 "l_linestatus": pd.Series([], dtype=object),
                                 **{c: pd.Series([], dtype=np.int64)
                                    for c in cols}})
        df = df.sort_values(["l_returnflag", "l_linestatus"],
                            kind="mergesort")
        rf = df["l_returnflag"].to_numpy()
        ls = df["l_linestatus"].to_numpy()
        starts = np.flatnonzero(group_starts(rf, ls))
        out = {"l_returnflag": rf[starts], "l_linestatus": ls[starts]}
        for c in cols:
            out[c] = np.add.reduceat(df[c].to_numpy(np.int64), starts)
        return pd.DataFrame(out)

    # final merge input is O(groups x blocks) partial rows — tiny
    return partitioned_group_map(partials,
                                 ["l_returnflag", "l_linestatus"],
                                 merge, 4, out_schema=out_schema)
