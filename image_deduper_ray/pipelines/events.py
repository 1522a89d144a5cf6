"""Windowed / sessionized operators over the ``events`` table, plus a
join-aggregate over the TPC-H-ish tables.

These are the streaming-shaped custom operators SURVEY.md §2 notes the
reference lacks (§2.9: none — batch tool): a tumbling-window aggregate
and gap-based sessionization, expressed Ray-Data-first — the window key
is a derived column (one vectorized pass), the aggregate is a
hash-partitioned block groupby, and sessionization partitions by user
so each block scans its users' ordered event times with numpy. No
driver-side loops, no per-group Python calls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.groups import csr_expand, group_starts, partitioned_group_map


def windowed_event_counts(sf_dir: str,
                          window: str = "hour") -> ray.data.Dataset:
    """Tumbling-window aggregate: (window_start, event_type, n_events,
    sum_value-as-cents) — matches DuckDB date_trunc semantics."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": pc.floor_temporal(t["ts"], unit=window),
            "event_type": t["event_type"],
            "value": t["value"]})

    out_schema = pa.schema([("window_start", pa.timestamp("us")),
                            ("event_type", pa.string()),
                            ("n_events", pa.int64()),
                            ("sum_value_cents", pa.int64())])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"window_start": pd.Series([], dtype="datetime64[us]"),
                                 "event_type": pd.Series([], dtype=object),
                                 "n_events": pd.Series([], dtype=np.int64),
                                 "sum_value_cents": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["window_start", "event_type"], kind="mergesort")
        w = df["window_start"].to_numpy()
        e = df["event_type"].to_numpy()
        # integer cents (floor(x*100+.5): same half-up rule as the SQL
        # oracle) avoid float-sum order sensitivity
        cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        new = group_starts(w.view(np.int64), e)
        gidx = np.cumsum(new, dtype=np.int32) - 1
        return pd.DataFrame({
            "window_start": w[new],
            "event_type": e[new],
            "n_events": np.bincount(gidx).astype(np.int64),
            "sum_value_cents": np.bincount(gidx, weights=cents).astype(np.int64)})

    derived = ds.map_batches(derive, batch_format="pyarrow",
                             zero_copy_batch=True)
    return partitioned_group_map(derived, ["window_start", "event_type"],
                                 block, 16, out_schema=out_schema)


def distinct_users_daily(sf_dir: str,
                         num_partitions: int | None = None
                         ) -> ray.data.Dataset:
    """(day, event_type, n_users, n_events) with n_users an EXACT
    distinct count — the daily-active-users shape. Exact distinct at
    scale without ``unique()`` or a sketch: per-batch combiner dedupes
    (day, type, user) triples carrying an event count, the shuffle
    hash-partitions BY THE TRIPLE so every copy of a triple meets in one
    reduce block (cross-batch re-dedupe is local there), and a second
    narrow shuffle sums the per-(day, type) partials. Shuffle volume is
    O(distinct triples), never O(events); an approximate path (HLL)
    would trade the oracle-exact count for constant memory — not needed
    while triples hash-partition."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "user_id"])

    trip_schema = pa.schema([("day", pa.string()),
                             ("event_type", pa.string()),
                             ("user_id", pa.int64()),
                             ("n", pa.int64())])

    def triples(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return trip_schema.empty_table()
        day = pc.strftime(pc.floor_temporal(t["ts"], unit="day"),
                          format="%Y-%m-%d")
        df = pd.DataFrame({
            "day": day.to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        g = df.groupby(["day", "event_type", "user_id"], sort=False) \
            .size().reset_index(name="n")
        return pa.Table.from_pandas(g, schema=trip_schema,
                                    preserve_index=False)

    part_schema = pa.schema([("day", pa.string()),
                             ("event_type", pa.string()),
                             ("n_users", pa.int64()),
                             ("n_events", pa.int64())])

    def per_key_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"day": pd.Series([], dtype=object),
                 "event_type": pd.Series([], dtype=object),
                 "n_users": pd.Series([], dtype=np.int64),
                 "n_events": pd.Series([], dtype=np.int64)})
        # all copies of a triple are in this block: one dedupe-sum, then
        # users = triples per (day, type)
        g = df.groupby(["day", "event_type", "user_id"], sort=False)["n"] \
            .sum().reset_index()
        out = g.groupby(["day", "event_type"], sort=False).agg(
            n_users=("user_id", "size"), n_events=("n", "sum")) \
            .reset_index()
        return out.astype({"n_users": np.int64, "n_events": np.int64})

    partials = partitioned_group_map(
        ds.map_batches(triples, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["day", "event_type", "user_id"], per_key_block,
        num_partitions, out_schema=part_schema)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        df = df.sort_values(["day", "event_type"], kind="mergesort")
        d = df["day"].to_numpy()
        e = df["event_type"].to_numpy()
        starts = np.flatnonzero(group_starts(d, e))
        return pd.DataFrame({
            "day": d[starts], "event_type": e[starts],
            "n_users": np.add.reduceat(
                df["n_users"].to_numpy(np.int64), starts),
            "n_events": np.add.reduceat(
                df["n_events"].to_numpy(np.int64), starts)})

    return partitioned_group_map(partials, ["day", "event_type"], merge,
                                 8, out_schema=part_schema)


def sessionize(sf_dir: str, gap_s: int = 1800) -> ray.data.Dataset:
    """Gap-based sessionization: (user_id, n_sessions, n_events) — a new
    session starts when the inter-event gap exceeds ``gap_s``. Shuffle
    key = user_id; each block handles all its users vectorized."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_sessions", pa.int64()),
                            ("n_events", pa.int64())])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "n_sessions": pd.Series([], dtype=np.int64),
                                 "n_events": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        new_user = group_starts(u)
        gidx = np.cumsum(new_user, dtype=np.int32) - 1
        gap = np.empty(len(u), dtype=np.int64)
        gap[0] = np.iinfo(np.int64).max
        gap[1:] = ts[1:] - ts[:-1]
        gap[new_user] = np.iinfo(np.int64).max  # first event of each user
        starts = (gap > gap_s * 1_000_000).astype(np.int64)
        return pd.DataFrame({
            "user_id": u[new_user],
            "n_sessions": np.bincount(gidx, weights=starts).astype(np.int64),
            "n_events": np.bincount(gidx).astype(np.int64)})

    return partitioned_group_map(ds, ["user_id"], block, 16,
                                 out_schema=out_schema)


def _read_typed_events(sf_dir: str, types: list[str]) -> ray.data.Dataset:
    """events pruned at the scan: only the needed columns, only rows of
    the given event types (row-group filter pushdown — untouched row
    groups never leave storage)."""
    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=pc.field("event_type").isin(types))


def _packed_keys(u: np.ndarray, dt: np.ndarray
                 ) -> tuple[np.ndarray | None, np.int64]:
    """Pack (user_id, rebased-ts-us) into one sortable int64. Returns
    (keys, span_bits); keys is None when the value ranges genuinely
    can't share 62 bits (callers then take the per-user-segment path).
    span_bits is the single source of truth for the band layout — the
    window clamp in range_join derives its band base from it. A
    multi-year span is ~2^45 us, so packing holds for up to ~2^17 users
    per partition band — and user_id is the shuffle key, so each
    partition sees a small id set."""
    if len(u) == 0:
        return np.zeros(0, np.int64), np.int64(1)
    span_bits = np.int64(max(1, int(dt.max()).bit_length()))
    if int(u.min()) < 0:
        # negative ids would pass the bit_length check (Python uses the
        # magnitude) but (u << span_bits) destroys band ordering —
        # cross-user matches instead of the per-user fallback
        return None, span_bits
    u_bits = max(1, int(u.max()).bit_length())
    if int(span_bits) + u_bits > 62:
        return None, span_bits
    return (u << span_bits) | dt, span_bits


def _typed_arrays(df: pd.DataFrame, left_type: str, right_type: str):
    """Shared column extraction for the temporal joins: int64 views of
    (user, ts-us, event_id) plus the left/right type masks."""
    u = df["user_id"].to_numpy(np.int64)
    ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    eid = df["event_id"].to_numpy(np.int64)
    et = df["event_type"].to_numpy()
    return u, ts, eid, et == left_type, et == right_type


def _user_segments(u, ts, eid, is_l, is_r):
    """Fallback segmentation when packed keys don't fit: yields
    (l_idx, r_idx) ORIGINAL-index arrays per user, each ordered by
    (ts, event_id), skipping users missing either side. The per-user
    loop runs once per user in the partition, not per row."""
    order = np.lexsort((eid, ts, u))
    ui = u[order]
    ri, li = is_r[order], is_l[order]
    for uu in np.unique(ui):
        seg = np.flatnonzero(ui == uu)
        r = order[seg[ri[seg]]]
        l = order[seg[li[seg]]]
        if len(r) and len(l):
            yield l, r


def asof_match(sf_dir: str, left_type: str = "click",
               right_type: str = "view") -> ray.data.Dataset:
    """Per-key as-of join within events: for each ``left_type`` event,
    the most recent ``right_type`` event of the SAME user at-or-before
    its timestamp (tie on ts -> largest event_id; inner semantics —
    unmatched left rows drop). Returns (event_id, matched_event_id,
    matched_ts).

    Ray Data has no as-of join; this is the documented composition
    (SURVEY.md custom-operator rule): hash-partition on the join key so
    each partition owns whole users, then ONE vectorized searchsorted
    per partition over (user, ts) packed sort keys — no per-row Python,
    no per-group map_groups calls. Partitioning assumption: all rows of
    a user fit one partition (they do — the key IS user_id)."""
    ds = _read_typed_events(sf_dir, [left_type, right_type])
    out_schema = pa.schema([("event_id", pa.int64()),
                            ("matched_event_id", pa.int64()),
                            ("matched_ts", pa.timestamp("us"))])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_id": pd.Series([], dtype=np.int64),
             "matched_event_id": pd.Series([], dtype=np.int64),
             "matched_ts": pd.Series([], dtype="datetime64[us]")})
        if df.empty:
            return empty
        u, ts, eid, is_l, is_r = _typed_arrays(df, left_type, right_type)
        if not is_r.any() or not is_l.any():
            return empty
        dt = ts - ts.min()
        keys, _ = _packed_keys(u, dt)
        if keys is None:                      # per-user fallback (rare)
            out = []
            for l, r in _user_segments(u, ts, eid, is_l, is_r):
                pos = np.searchsorted(ts[r], ts[l], side="right") - 1
                ok = pos >= 0
                out.append((eid[l[ok]], eid[r[pos[ok]]], ts[r[pos[ok]]]))
            if not out:
                return empty
            le, me, mt = (np.concatenate(x) for x in zip(*out))
        else:
            rk, re_, rt = keys[is_r], eid[is_r], ts[is_r]
            order = np.lexsort((re_, rk))     # eid asc within equal key
            rk, re_, rt = rk[order], re_[order], rt[order]
            lk, le_, lu = keys[is_l], eid[is_l], u[is_l]
            pos = np.searchsorted(rk, lk, side="right") - 1
            ok = pos >= 0
            # the hit must be the SAME user (a user with no earlier
            # right rows would otherwise match the previous user's band)
            ru_sorted = u[is_r][order]
            ok[ok] &= ru_sorted[pos[ok]] == lu[ok]
            le, me, mt = le_[ok], re_[pos[ok]], rt[pos[ok]]
        return pd.DataFrame({
            "event_id": le, "matched_event_id": me,
            "matched_ts": mt.astype("datetime64[us]")})

    return partitioned_group_map(ds, ["user_id"], block, 16,
                                 out_schema=out_schema)


def range_join(sf_dir: str, left_type: str = "error",
               right_type: str = "click",
               window_s: int = 3600) -> ray.data.Dataset:
    """Interval (range) join within events: every (left, right) pair of
    the same user with ``right.ts`` in ``[left.ts - window_s, left.ts]``.
    Returns (event_id, near_event_id) — all qualifying pairs, a set, so
    no tie-break is needed.

    Same shape as ``asof_match``: hash-partition by user, one
    searchsorted pair per partition for the window bounds, CSR-style
    expansion (repeat + offset arithmetic) for the hits — output size
    is the true join cardinality, never a per-user cross product."""
    ds = _read_typed_events(sf_dir, [left_type, right_type])
    out_schema = pa.schema([("event_id", pa.int64()),
                            ("near_event_id", pa.int64())])
    w_us = np.int64(window_s) * 1_000_000

    def block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_id": pd.Series([], dtype=np.int64),
             "near_event_id": pd.Series([], dtype=np.int64)})
        if df.empty:
            return empty
        u, ts, eid, is_l, is_r = _typed_arrays(df, left_type, right_type)
        if not is_r.any() or not is_l.any():
            return empty
        dt = ts - ts.min()
        keys, span_bits = _packed_keys(u, dt)
        if keys is None:
            # per-user fallback mirrors asof_match's; window via two
            # searchsorted calls per user segment
            out_l, out_r = [], []
            for l, r in _user_segments(u, ts, eid, is_l, is_r):
                lo = np.searchsorted(ts[r], ts[l] - w_us, side="left")
                hi = np.searchsorted(ts[r], ts[l], side="right")
                rows, take = csr_expand(lo, hi)
                out_l.append(eid[l[rows]])
                out_r.append(eid[r[take]])
            if not out_l:
                return empty
            return pd.DataFrame({"event_id": np.concatenate(out_l),
                                 "near_event_id": np.concatenate(out_r)})
        rk, re_ = keys[is_r], eid[is_r]
        order = np.argsort(rk, kind="stable")
        rk, re_ = rk[order], re_[order]
        lk, le_ = keys[is_l], eid[is_l]
        # window bounds in packed space: dt-w clamped at the user's band
        # base (from _packed_keys' span_bits) stays inside that user —
        # no right row of the user sorts below it
        base = u[is_l] << span_bits
        lo_k = np.maximum(lk - w_us, base)
        lo = np.searchsorted(rk, lo_k, side="left")
        hi = np.searchsorted(rk, lk, side="right")
        rows, take = csr_expand(lo, hi)
        return pd.DataFrame({"event_id": le_[rows],
                             "near_event_id": re_[take]})

    return partitioned_group_map(ds, ["user_id"], block, 16,
                                 out_schema=out_schema)


def orders_by_segment(sf_dir: str,
                      broadcast_max_bytes: int = 256_000_000
                      ) -> ray.data.Dataset:
    """Join-aggregate over orders ⨝ customer: (c_mktsegment, n_orders,
    sum_total_cents).

    Customer is the classic small side: its (custkey, segment-code) map
    is put in the object store ONCE (``ray.put``) and every orders batch
    does a searchsorted lookup + per-batch partial aggregate — only
    (segment, count, cents) partials cross the wire, never the joined
    rows. Past ``broadcast_max_bytes`` the same query falls back to the
    partitioned hash join (both paths share the final combine)."""
    import pyarrow.parquet as pq
    import ray

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    out_schema = pa.schema([("c_mktsegment", pa.string()),
                            ("n_orders", pa.int64()),
                            ("sum_total_cents", pa.int64())])

    def combine_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"c_mktsegment": pd.Series([], dtype=object),
                                 "n_orders": pd.Series([], dtype=np.int64),
                                 "sum_total_cents": pd.Series([], dtype=np.int64)})
        g = df.groupby("c_mktsegment", sort=True)
        out = g.agg(n_orders=("n_orders", "sum"),
                    sum_total_cents=("sum_total_cents", "sum")).reset_index()
        out["n_orders"] = out["n_orders"].astype(np.int64)
        out["sum_total_cents"] = out["sum_total_cents"].astype(np.int64)
        return out

    cust_path = f"{sf_dir}/customer.parquet"
    cust_bytes = pq.ParquetFile(cust_path).metadata.serialized_size + sum(
        pq.ParquetFile(cust_path).metadata.row_group(i).total_byte_size
        for i in range(pq.ParquetFile(cust_path).metadata.num_row_groups))
    if cust_bytes <= broadcast_max_bytes:
        ct = pq.read_table(cust_path, columns=["c_custkey", "c_mktsegment"])
        keys = ct["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = ct["c_mktsegment"].to_numpy(zero_copy_only=False)
        segs, codes = np.unique(seg, return_inverse=True)
        order = np.argsort(keys, kind="stable")
        ref = ray.put((keys[order], codes[order].astype(np.int32),
                       [str(s) for s in segs]))

        def partial(t: pa.Table) -> pa.Table:
            k_sorted, code_sorted, segs_ = ray.get(ref)
            n_seg = len(segs_)
            if t.num_rows == 0 or n_seg == 0:
                return pa.table({"c_mktsegment": pa.array([], pa.string()),
                                 "n_orders": pa.array([], pa.int64()),
                                 "sum_total_cents": pa.array([], pa.int64())})
            ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            cents = np.floor(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
                + 0.5).astype(np.int64)
            pos = np.searchsorted(k_sorted, ck).clip(0, len(k_sorted) - 1)
            hit = k_sorted[pos] == ck        # inner-join: unmatched drop
            sc = code_sorted[pos[hit]]
            return pa.table({
                "c_mktsegment": pa.array(segs_, pa.string()),
                "n_orders": pa.array(np.bincount(sc, minlength=n_seg)
                                     .astype(np.int64)),
                "sum_total_cents": pa.array(
                    np.bincount(sc, weights=cents[hit], minlength=n_seg)
                    .astype(np.int64))})

        partials = orders.map_batches(partial, batch_format="pyarrow",
                                      zero_copy_batch=True)

        def drop_empty(df: pd.DataFrame) -> pd.DataFrame:
            out = combine_block(df)
            return out[out["n_orders"] > 0]

        return partitioned_group_map(partials, ["c_mktsegment"], drop_empty,
                                     4, out_schema=out_schema)

    # fallback: customer too big to broadcast -> partitioned hash join
    from ..functions.joins import hash_join

    cust = ray.data.read_parquet(cust_path,
                                 columns=["c_custkey", "c_mktsegment"])

    def okey(t: pa.Table) -> pa.Table:
        return t.append_column("k", t["o_custkey"].cast(pa.string()))

    def ckey(t: pa.Table) -> pa.Table:
        return t.append_column("k", t["c_custkey"].cast(pa.string()))

    j = hash_join(orders.map_batches(okey, batch_format="pyarrow"),
                  cust.map_batches(ckey, batch_format="pyarrow"),
                  "k", "k",
                  pa.schema([("o_totalprice", pa.float64())]),
                  pa.schema([("c_mktsegment", pa.string())]),
                  num_partitions=8)

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return combine_block(df)
        df = df.sort_values("c_mktsegment", kind="mergesort")
        seg = df["c_mktsegment"].to_numpy()
        cents = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        new = group_starts(seg)
        gidx = np.cumsum(new, dtype=np.int32) - 1
        return pd.DataFrame({
            "c_mktsegment": seg[new],
            "n_orders": np.bincount(gidx).astype(np.int64),
            "sum_total_cents": np.bincount(gidx, weights=cents).astype(np.int64)})

    return partitioned_group_map(j, ["c_mktsegment"], block, 8,
                                 out_schema=out_schema)


HLL_P = 12                          # 2^12 = 4096 registers


def hll_user_registers(sf_dir: str, p: int = HLL_P) -> ray.data.Dataset:
    """(bucket, max_rank) — the HyperLogLog register table for distinct
    ``user_id``, the SCALE path beside ``distinct_users_daily``'s exact
    triple shuffle: registers merge associatively (MAX per bucket), so
    the shuffle volume is O(2^p) per block REGARDLESS of cardinality —
    at 10^12 events the exact path shuffles O(distinct) rows, this
    ships 4096 tiny rows per block, and cross-day / cross-partition /
    cross-cluster merges are the same MAX.

    Emitting REGISTERS (not the estimate) keeps the operator exact and
    SQL-oracle-able: bucket = first ``p`` bits of sha256(user_id as
    decimal string), rank = leading zeros of the next 48 bits + 1
    (exact integer bit_length, never float log2 — ``2^k - 1`` rounds up
    under log2 at 48 bits). The estimate is a driver-side fold over
    4096 rows (``hll_estimate``), with the standard small-range linear
    counting correction."""
    from ..functions import hashing

    if not 4 <= p <= 16 or p % 4:
        raise ValueError(f"p={p}: need a multiple of 4 in [4, 16] "
                         "(hex-digit aligned so the SQL oracle shares "
                         "the arithmetic)")
    hex_b = p // 4                  # bucket hex digits

    out_schema = pa.schema([("bucket", pa.int64()),
                            ("max_rank", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        uids = np.unique(t["user_id"].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        hx = hashing.sha256_hex([str(u) for u in uids])
        buckets = np.empty(len(hx), np.int64)
        ranks = np.empty(len(hx), np.int64)
        for i, h in enumerate(hx):
            buckets[i] = int(h[:hex_b], 16)
            v = int(h[hex_b:hex_b + 12], 16)        # next 48 bits
            ranks[i] = 49 - v.bit_length() if v else 49
        df = pd.DataFrame({"bucket": buckets, "max_rank": ranks}) \
            .groupby("bucket", sort=False)["max_rank"].max().reset_index()
        return pa.Table.from_pandas(df, schema=out_schema,
                                    preserve_index=False)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                                 "max_rank": pd.Series([], dtype=np.int64)})
        df = df.sort_values("bucket", kind="mergesort")
        ks = df["bucket"].to_numpy(np.int64)
        starts = np.flatnonzero(group_starts(ks))
        return pd.DataFrame({
            "bucket": ks[starts],
            "max_rank": np.maximum.reduceat(
                df["max_rank"].to_numpy(np.int64), starts)})

    # merge input is O(2^p x blocks) rows — tiny at any input scale
    return partitioned_group_map(partials, ["bucket"], merge, 4,
                                 out_schema=out_schema)


def hll_estimate(registers: "pd.DataFrame", p: int = HLL_P) -> float:
    """Fold a (bucket, max_rank) register table to the HLL cardinality
    estimate (Flajolet et al. 2007): harmonic mean with the alpha_m
    bias constant, linear counting below the small-range threshold.
    Driver-side over 2^p rows — trivially cheap."""
    m = 1 << p
    regs = np.zeros(m, np.int64)
    if len(registers):
        regs[registers["bucket"].to_numpy(np.int64)] = \
            registers["max_rank"].to_numpy(np.int64)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)         # linear counting
    return float(est)


def user_running_totals(sf_dir: str) -> ray.data.Dataset:
    """(event_id, user_id, seq, cum_value_cents) — the analytic-window
    family Ray Data lacks natively: per-user ROW_NUMBER and cumulative
    value sum in event-time order (event_id is the tie-break, so the
    result is deterministic under any shuffle arrival order).

    Shape: ONE hash shuffle on user_id co-locates each user's events,
    then each block sorts its users once ((user, ts, id) mergesort)
    and computes every user's running sequence and cumulative sum in
    two vectorized passes — a per-user-segment cumsum is a global
    cumsum minus the segment-start offset, no Python per-user loop.
    Value accumulates as exact integer cents (per-row rounding, the
    same rule as the SQL oracle)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts",
                                        "value"])
    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("seq", pa.int64()),
                            ("cum_value_cents", pa.int64())])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ["event_id", "user_id", "seq",
                                           "cum_value_cents"]})
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        cents = np.floor(df["value"].to_numpy(np.float64) * 100 + 0.5) \
            .astype(np.int64)
        new_user = group_starts(u)
        idx = np.arange(len(u), dtype=np.int64)
        seg_start = idx[new_user][np.cumsum(new_user) - 1]
        seq = idx - seg_start + 1
        csum = np.cumsum(cents)
        base = np.concatenate([[0], csum])[seg_start]
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": u,
            "seq": seq,
            "cum_value_cents": csum - base})

    return partitioned_group_map(ds, ["user_id"], block, 16,
                                 out_schema=out_schema)


def hopping_event_counts(sf_dir: str, window_min: int = 60,
                         hop_min: int = 15) -> ray.data.Dataset:
    """Hopping (sliding) window aggregate: (window_start, event_type,
    n_events, sum_value_cents) over ``window_min``-minute windows that
    advance every ``hop_min`` minutes — each event lands in
    window/hop overlapping windows, the streaming shape tumbling
    windows can't express (rate monitoring, rolling SLAs).

    Scale shape: the explode happens INSIDE the combiner — each batch
    replicates its events into their window/hop assignments with one
    vectorized broadcast-subtract and immediately pre-aggregates, so
    the shuffle moves O(windows x types per block) partial rows, never
    the (window/hop)-times-inflated event stream. Window starts stay
    int64 epoch-micros through the shuffle; the final block renders
    timestamps. Alignment is the epoch grid (identical integer floor
    on the oracle side — no time_bucket-origin ambiguity). Assumes
    non-negative timestamps (floor-division alignment)."""
    if window_min % hop_min:
        raise ValueError("window_min must be a multiple of hop_min")
    hop = hop_min * 60_000_000
    k = window_min // hop_min

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"ws": pa.array([], pa.int64()),
                          "event_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tb = (us // hop) * hop
        starts = (tb[:, None]
                  - (np.arange(k - 1, -1, -1) * hop)[None, :]).ravel()
        et = np.repeat(t["event_type"].to_numpy(zero_copy_only=False), k)
        cents = np.repeat(
            np.floor(t["value"].to_numpy(zero_copy_only=False) * 100
                     + 0.5).astype(np.int64), k)
        df = pd.DataFrame({"ws": starts, "event_type": et, "c": cents})
        g = df.groupby(["ws", "event_type"], sort=False).agg(
            n=("c", "size"), s=("c", "sum")).reset_index()
        return pa.table({"ws": pa.array(g["ws"].to_numpy(np.int64)),
                         "event_type": pa.array(
                             g["event_type"].to_numpy(object),
                             pa.string()),
                         "n": pa.array(g["n"].to_numpy(np.int64)),
                         "s": pa.array(g["s"].to_numpy(np.int64))})

    out_schema = pa.schema([("window_start", pa.timestamp("us")),
                            ("event_type", pa.string()),
                            ("n_events", pa.int64()),
                            ("sum_value_cents", pa.int64())])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"window_start": pd.Series([], dtype="datetime64[us]"),
                 "event_type": pd.Series([], dtype=object),
                 "n_events": pd.Series([], dtype=np.int64),
                 "sum_value_cents": pd.Series([], dtype=np.int64)})
        g = df.groupby(["ws", "event_type"], sort=False).agg(
            n_events=("n", "sum"),
            sum_value_cents=("s", "sum")).reset_index()
        return pd.DataFrame({
            "window_start": g["ws"].to_numpy(np.int64)
            .view("datetime64[us]"),
            "event_type": g["event_type"],
            "n_events": g["n_events"].to_numpy(np.int64),
            "sum_value_cents": g["sum_value_cents"].to_numpy(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partitioned_group_map(partials, ["ws", "event_type"],
                                 block, 16, out_schema=out_schema)


FUNNEL_STAGES = ("signup", "click", "purchase")
FUNNEL_STEP_WINDOW_S = 2 * 86400


def funnel_counts(sf_dir: str,
                  stages: tuple[str, ...] = FUNNEL_STAGES,
                  step_window_s: int = FUNNEL_STEP_WINDOW_S
                  ) -> ray.data.Dataset:
    """(stage, n_users) — ORDERED-SEQUENCE (funnel) MATCHING per user:
    how many users reached each stage of ``stages`` in order, where
    stage k counts users with some stage-k event at-or-after their
    earliest stage-(k-1) completion time AND within ``step_window_s``
    seconds of it (min-after-within-deadline semantics, ties allowed —
    deterministic because each step takes a MIN).

    The streaming-analytics shape none of the window/sessionize/asof
    operators cover: per-key ORDER matters, not just membership or
    adjacency. One user_id hash shuffle of the type-pruned narrow
    stream (user, ts, stage int8); each partition lexsorts (user, ts)
    once and advances all funnel stages with vectorized
    ``minimum.reduceat`` sweeps over the user segments — no per-user
    Python loop; partials are O(stages) rows."""
    from ..functions.groups import partitioned_group_map_arrow

    n_stage = len(stages)
    sup_schema = pa.schema([("user_id", pa.int64()),
                            ("ts_us", pa.int64()),
                            ("code", pa.int8())])
    out_schema = pa.schema([("stage", pa.int64()),
                            ("n_users", pa.int64())])

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
        filter=pc.field("event_type").isin(list(stages)))

    stage_arr = pa.array(list(stages))

    def conform(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=stage_arr)
        t = t.filter(m.combine_chunks())
        # stage code via index_in (C speed) — never a per-row Python
        # dict lookup on the full event stream
        code = pc.index_in(t["event_type"], value_set=stage_arr) \
            .cast(pa.int8())
        return pa.table({
            "user_id": t["user_id"].cast(pa.int64()),
            "ts_us": pa.array(t["ts"].to_numpy(zero_copy_only=False)
                              .astype("datetime64[us]").astype(np.int64)),
            "code": code}, schema=sup_schema)

    stream = ev.map_batches(conform, batch_format="pyarrow",
                            zero_copy_batch=True)

    INF = np.iinfo(np.int64).max
    win_us = int(step_window_s) * 1_000_000

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        code = t["code"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts, code = u[order], ts[order], code[order]
        starts = np.flatnonzero(group_starts(u))
        # seg[i] = index of the user segment row i belongs to
        seg = np.cumsum(group_starts(u)) - 1
        reached = np.zeros(len(starts), np.int64)  # deepest stage + 1
        prev_t = np.full(len(starts), np.iinfo(np.int64).min)
        counts = []
        for k in range(n_stage):
            # candidate rows: stage-k events at/after the user's
            # stage-(k-1) completion time and inside the step deadline
            # (stage 0 has no deadline: prev_t is -inf, the addition
            # below would overflow — give stage 0 an explicit pass)
            ok = (code == k) & (reached[seg] == k) & (ts >= prev_t[seg])
            if k > 0:
                ok &= ts <= prev_t[seg] + win_us
            tk = np.where(ok, ts, INF)
            # min per segment; reduceat needs every segment present
            mins = np.minimum.reduceat(tk, starts)
            hit = mins != INF
            reached[hit & (reached == k)] += 1
            prev_t = np.where(hit & (reached == k + 1), mins, prev_t)
            counts.append(int(hit.sum()))
        return pa.table({
            "stage": pa.array(np.arange(1, n_stage + 1, dtype=np.int64)),
            "n_users": pa.array(np.array(counts, np.int64))},
            schema=out_schema)

    partials = partitioned_group_map_arrow(stream, ["user_id"], block,
                                           None, out_schema=out_schema)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        st = t["stage"].to_numpy(zero_copy_only=False)
        order = np.argsort(st, kind="stable")
        st = st[order]
        starts = np.flatnonzero(group_starts(st))
        return pa.table({
            "stage": pa.array(st[starts]),
            "n_users": pa.array(np.add.reduceat(
                t["n_users"].to_numpy(zero_copy_only=False)[order],
                starts))}, schema=out_schema)

    return partitioned_group_map_arrow(partials, ["stage"], merge, 2,
                                       out_schema=out_schema)


def retention_cohorts(sf_dir: str) -> ray.data.Dataset:
    """(cohort_day, day_offset, n_users) — COHORT RETENTION matrix:
    users grouped by the calendar day of their FIRST event, counted
    once per later day they return. The two-phase per-key-derived-
    attribute shape: a user's cohort is a function of their whole
    history, so phase 1 must see every event of a user — but only as
    (user, day) per-batch-DISTINCT pairs, so the single user_id
    shuffle moves O(users x active-days), never O(events). Each
    partition then derives cohort = min(day) per user and emits
    (cohort, offset) partials; the final merge is O(days²).

    Day arithmetic is pure integer (epoch_us // 86400e6) on both
    sides — no timezone, no date library."""
    from ..functions.groups import partitioned_group_map_arrow

    pair_schema = pa.schema([("user_id", pa.int64()),
                             ("day", pa.int64())])
    out_schema = pa.schema([("cohort_day", pa.int64()),
                            ("day_offset", pa.int64()),
                            ("n_users", pa.int64())])

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu = np.unique(np.stack([u, day], axis=1), axis=0)
        return pa.table({"user_id": pa.array(uu[:, 0]),
                         "day": pa.array(uu[:, 1])}, schema=pair_schema)

    stream = ev.map_batches(pairs, batch_format="pyarrow",
                            zero_copy_batch=True)

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        uniq = np.concatenate([[True], (u[1:] != u[:-1])
                               | (day[1:] != day[:-1])])
        u, day = u[uniq], day[uniq]         # global distinct (co-keyed)
        starts = np.flatnonzero(group_starts(u))
        sizes = np.diff(np.append(starts, len(u)))
        cohort = np.repeat(day[starts], sizes)  # per-user min day
        off = day - cohort
        comp = cohort * 100000 + off
        order2 = np.argsort(comp, kind="stable")
        comp = comp[order2]
        s2 = np.flatnonzero(group_starts(comp))
        c0 = comp[s2]
        return pa.table({
            "cohort_day": pa.array(c0 // 100000),
            "day_offset": pa.array(c0 % 100000),
            "n_users": pa.array(np.diff(np.append(s2, len(comp)))
                                .astype(np.int64))}, schema=out_schema)

    partials = partitioned_group_map_arrow(stream, ["user_id"], block,
                                           None, out_schema=out_schema)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        comp = (t["cohort_day"].to_numpy(zero_copy_only=False) * 100000
                + t["day_offset"].to_numpy(zero_copy_only=False))
        n = t["n_users"].to_numpy(zero_copy_only=False)
        order = np.argsort(comp, kind="stable")
        comp, n = comp[order], n[order]
        starts = np.flatnonzero(group_starts(comp))
        c0 = comp[starts]
        return pa.table({
            "cohort_day": pa.array(c0 // 100000),
            "day_offset": pa.array(c0 % 100000),
            "n_users": pa.array(np.add.reduceat(n, starts))},
            schema=out_schema)

    return partitioned_group_map_arrow(
        partials, ["cohort_day", "day_offset"], merge, 2,
        out_schema=out_schema)


MAD_K = 5


def value_mad_outliers(sf_dir: str, k: int = MAD_K) -> ray.data.Dataset:
    """(event_type, median_cents, mad_cents, n_outliers) — ROBUST
    outlier detection per event type: median and MAD (median absolute
    deviation) instead of mean/sigma, so a few extreme values can't
    drag the threshold (the monitoring-pipeline complement to
    `t_lang_token_outliers`' k-sigma test). An event is an outlier
    when ``|cents - median| > k * mad`` — all exact integers.

    ORDER STATISTICS AT SCALE without a sort: values quantize to
    integer cents with bounded cardinality, so each of the two passes
    is a distributed exact HISTOGRAM (per-batch (type, cents, cnt)
    partials, one narrow shuffle-sum) read off cumulatively at the
    driver — O(types x distinct-values) driver state. Pass 2
    histogram-counts |cents - median| with the tiny median map
    broadcast; the median rule is DuckDB's ``quantile_disc`` (Type-1,
    value at 1-based ceil(n/2))."""
    from ..functions.groups import partitioned_sum

    hist_schema = pa.schema([("event_type", pa.string()),
                             ("cents", pa.int64()),
                             ("cnt", pa.int64())])
    out_schema = pa.schema([("event_type", pa.string()),
                            ("median_cents", pa.int64()),
                            ("mad_cents", pa.int64()),
                            ("n_outliers", pa.int64())])

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _hist(et: np.ndarray, cents: np.ndarray) -> pa.Table:
        """(type, value, count) histogram partial — ONE implementation
        shared by the value pass and the deviation pass."""
        cnt = pd.DataFrame({"event_type": et, "cents": cents}) \
            .groupby(["event_type", "cents"], sort=False).size() \
            .reset_index(name="cnt")
        return pa.table({"event_type": pa.array(cnt["event_type"],
                                                pa.string()),
                         "cents": pa.array(cnt["cents"]
                                           .to_numpy(np.int64)),
                         "cnt": pa.array(cnt["cnt"].to_numpy(np.int64))},
                        schema=hist_schema)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        cents = np.floor(t["value"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
        return _hist(t["event_type"].to_numpy(zero_copy_only=False),
                     cents)

    def _read_hist(h: ray.data.Dataset) -> "pd.DataFrame":
        parts = [b.to_pandas() for b in h.iter_batches(
            batch_size=65536, batch_format="pyarrow") if b.num_rows > 0]
        return pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame({"event_type": [], "cents": [], "cnt": []})

    def _type1_median(df: "pd.DataFrame") -> dict:
        """quantile_disc(0.5) per type from a (type, value, cnt) hist."""
        med = {}
        for et, g in df.groupby("event_type", sort=False):
            g = g.sort_values("cents", kind="mergesort")
            cum = g["cnt"].to_numpy(np.int64).cumsum()
            pos = -(-cum[-1] // 2)          # ceil(n/2), 1-based
            med[et] = int(g["cents"].to_numpy(np.int64)[
                np.searchsorted(cum, pos)])
        return med

    # pass 1: value histogram -> per-type median (O(types x values)
    # driver state, the histogram itself reduced distributedly)
    hist1 = partitioned_sum(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type", "cents"], "cnt", None, hist_schema,
        out_name="cnt")
    h1 = _read_hist(hist1)
    medians = _type1_median(h1)
    med_ref = ray.put(medians)

    # pass 2: deviation histogram with the tiny median map broadcast
    def dev_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        med = ray.get(med_ref)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cents = np.floor(t["value"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
        # vectorized map; an event type pass 1 never saw maps to NaN
        # and FAILS the int64 cast loudly (never a silent median of 0)
        med_arr = pd.Series(et).map(med).to_numpy(np.int64)
        return _hist(et, np.abs(cents - med_arr))

    hist2 = partitioned_sum(
        ds.map_batches(dev_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type", "cents"], "cnt", None, hist_schema,
        out_name="cnt")
    h2 = _read_hist(hist2)
    mads = _type1_median(h2)

    # outlier counts read straight off the deviation histogram
    rows = {"event_type": [], "median_cents": [], "mad_cents": [],
            "n_outliers": []}
    for et, g in h2.groupby("event_type", sort=False):
        mad = mads[et]
        n_out = int(g.loc[g["cents"].to_numpy(np.int64) > k * mad,
                          "cnt"].sum())
        rows["event_type"].append(et)
        rows["median_cents"].append(medians[et])
        rows["mad_cents"].append(mad)
        rows["n_outliers"].append(n_out)
    return ray.data.from_arrow(pa.table(
        {k2: pa.array(v, out_schema.field(k2).type)
         for k2, v in rows.items()}, schema=out_schema))
