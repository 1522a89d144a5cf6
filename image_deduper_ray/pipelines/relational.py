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


Q3_CUTOFF = "1997-06-30"


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = Q3_CUTOFF,
                      limit: int = 10,
                      cust_broadcast_max: int = 64 << 20
                      ) -> ray.data.Dataset:
    """(l_orderkey, revenue_cents, o_orderdate, rank) — the TPC-H Q3
    shape over three tables: customers of one market segment, their
    orders placed BEFORE ``cutoff``, lineitems shipped AFTER it,
    revenue = sum(extprice * (1 - discount)) as exact integer cents,
    global top-``limit`` by (revenue desc, orderkey) with NO global
    sort (per-block top-N partials + one tiny final rank).

    Scale shape: the customer dimension is small by nature — its
    in-segment custkeys broadcast as one sorted numpy array (byte-
    capped, loud failure past the cap); the orders stream filters
    against it and its (orderkey -> epoch-day) pairs attach to the big
    lineitem stream via the byte-capped zero-copy broadcast with the
    partitioned hash-join fallback (``broadcast_attach_i64``) — the
    fact table never shuffles below the cap."""
    import datetime

    from ..functions.joins import broadcast_attach_i64, collect_i64_under_cap

    cut = datetime.datetime.fromisoformat(cutoff)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == segment))
    # the repo convention (pricing_summary): the pushdown prunes row
    # groups, the residual predicate must still hold row-exactly
    cust = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"],
                                    segment).combine_chunks()),
        batch_format="pyarrow", zero_copy_batch=True)
    collected = collect_i64_under_cap(cust, ["c_custkey"],
                                      cust_broadcast_bytes := cust_broadcast_max)
    if collected is None:
        raise ValueError(
            "in-segment customer key set exceeds the broadcast budget "
            f"({cust_broadcast_bytes} B); raise cust_broadcast_max")
    import ray as _ray
    ckeys = np.sort(collected[0])
    ckeys_ref = _ray.put(ckeys)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < pc.scalar(cut)))

    def order_days(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                          "odays": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        # residual re-filter, same convention as above
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(cut))
                     .combine_chunks())
        if t.num_rows == 0:
            return empty
        ck = ray.get(ckeys_ref)
        custs = t["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(ck) == 0:
            return empty
        pos = np.searchsorted(ck, custs).clip(0, len(ck) - 1)
        t = t.filter(pa.array(ck[pos] == custs))
        if t.num_rows == 0:
            return empty
        us = t["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "odays": pa.array(us // 86_400_000_000)})

    okeys = orders.map_batches(order_days, batch_format="pyarrow",
                               zero_copy_batch=True)

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pc.field("l_shipdate") > pc.scalar(cut)))

    def line_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        mask = pc.greater(t["l_shipdate"], pa.scalar(cut)).combine_chunks()
        t = t.filter(mask)
        if t.num_rows == 0:
            return empty
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = t["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1 - dc) * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64), "cents": cents})
        g = df.groupby("l_orderkey", sort=False)["cents"].sum() \
            .reset_index()
        return pa.table({"l_orderkey": pa.array(g["l_orderkey"]
                                                .to_numpy(np.int64)),
                         "cents": pa.array(g["cents"]
                                           .to_numpy(np.int64))})

    partials = line.map_batches(line_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    attached = broadcast_attach_i64(partials, "l_orderkey", okeys,
                                    "o_orderkey", "odays", "odays")

    sum_schema = pa.schema([("l_orderkey", pa.int64()),
                            ("odays", pa.int64()),
                            ("cents", pa.int64())])

    def sum_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["odays"])   # no in-segment pre-cutoff order
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ["l_orderkey", "odays", "cents"]})
        df = df.sort_values("l_orderkey", kind="mergesort")
        ks = df["l_orderkey"].to_numpy(np.int64)
        starts = np.flatnonzero(group_starts(ks))
        return pd.DataFrame({
            "l_orderkey": ks[starts],
            "odays": df["odays"].to_numpy(np.int64)[starts],
            "cents": np.add.reduceat(df["cents"].to_numpy(np.int64),
                                     starts)})

    summed = partitioned_group_map(attached, ["l_orderkey"], sum_block,
                                   None, out_schema=sum_schema)

    out_schema = pa.schema([("l_orderkey", pa.int64()),
                            ("revenue_cents", pa.int64()),
                            ("o_orderdate", pa.string()),
                            ("rank", pa.int64())])

    def topn_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "odays": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64()),
                             "g": pa.array([], pa.int8())})
        ks = t["l_orderkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ks, -cents))[:limit]
        return pa.table({
            "l_orderkey": pa.array(ks[order].astype(np.int64)),
            "odays": pa.array(t["odays"].to_numpy(zero_copy_only=False)
                              [order].astype(np.int64)),
            "cents": pa.array(cents[order].astype(np.int64)),
            "g": pa.array(np.zeros(len(order), np.int8))})

    cands = summed.map_batches(topn_partial, batch_format="pyarrow",
                               zero_copy_batch=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"l_orderkey": pd.Series([], dtype=np.int64),
                 "revenue_cents": pd.Series([], dtype=np.int64),
                 "o_orderdate": pd.Series([], dtype=object),
                 "rank": pd.Series([], dtype=np.int64)})
        ks = df["l_orderkey"].to_numpy(np.int64)
        cents = df["cents"].to_numpy(np.int64)
        order = np.lexsort((ks, -cents))[:limit]
        days = df["odays"].to_numpy(np.int64)[order]
        dates = np.datetime_as_string(
            days.astype("datetime64[D]"), unit="D")
        return pd.DataFrame({
            "l_orderkey": ks[order],
            "revenue_cents": cents[order],
            "o_orderdate": dates.astype(object),
            "rank": np.arange(1, len(order) + 1, dtype=np.int64)})

    # single logical group: reduce input <= limit x num_blocks rows
    return partitioned_group_map(cands, ["g"], final, 2,
                                 out_schema=out_schema)
