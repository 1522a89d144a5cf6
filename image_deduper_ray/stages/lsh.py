"""LSH banding + candidate-pair generation with explicit skew handling.

The near-dup grouping the reference intends via
``PHash::is_similar`` threshold grouping
(/root/reference/crates/image-deduper-core/src/processing/types.rs:47-58,
threshold ``phash_threshold=90`` at src/config.rs:105; intended flow in
dev_notes.md:28-38) — recast as MinHash-LSH (SURVEY.md §2.5 A2):

  explode: sig (P=128) -> b bands x r rows; band_key = rolling hash of
           the band's r values  (vectorized, one reshape + r fused ops)
  shuffle: hash-partition on (band_id, band_key, SALT) — a hot bucket's
           sub-buckets land on DIFFERENT reducers
  pairs:   one vectorized block per partition segments its sub-buckets
           (lexsort + boundary scan) and emits pairs numpy-only

Skew (vendored/boilerplate code — the north rule's explicit case):
buckets are Zipf-skewed, and pair-gen is quadratic in bucket size. Two
passes make the salting explicit and bounded:

  pass 1: SAMPLED partial bucket counts (1/hot_sample_k of rows) ->
          small groupby-sum -> keys estimated over bucket_cap become
          the HOT set {key: n_sub}, broadcast once via ray.put.
          Mega-buckets are found w.h.p.; a marginal miss is harmless
          (the pair-gen block windows any over-cap sub-bucket).
  pass 2: explode with salt = hash(file_id) % n_sub for hot keys.

Each salted sub-bucket emits its pairs plus ONE representative row
(min file_id); representatives of the same original bucket are
all-paired by a second, tiny shuffle on (band_id, band_key) —
preserving cluster connectivity across sub-buckets while no reducer
holds more than ~cap rows of one bucket. Note that exact-copy and
reformat-twin skew never reaches this stage at all: signature-identical
rows are collapsed to one representative upstream
(stages/verify.signature_representatives).

Containment candidates (for the suffix-array substring pass) ride the
same machinery as r=``containment_rows`` bands over the first
``containment_perms`` permutation values: if file A is contained in
file B, each perm's min over B's shingles equals A's with probability
|A|/|B∪A| = J, so a band of r perms collides with probability J^r.
r=2 (default) trades the lowest-J reach for ~J-fold suppression of
shared-boilerplate noise; hot containment buckets are additionally
dropped outright (df-pruning), and candidates must clear
``containment_est_jaccard_min`` in verification before the
content-joining substring pass.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..config import DedupConfig

_BAND_MULT = np.uint64(0x9E3779B97F4A7C15)
CONTAINMENT_BAND_BASE = 1000  # band_ids >= this are containment bands


def _combo(band_id: np.ndarray, band_key_i64: np.ndarray) -> np.ndarray:
    """uint64 merge of (band_id, band_key) used for hot-key lookups."""
    return (band_id.astype(np.uint64) * _BAND_MULT) ^ \
        band_key_i64.astype(np.int64).view(np.uint64)


def _sig_matrix(batch: pa.Table, num_perms: int) -> np.ndarray:
    from .verify import _sig_of
    return _sig_of(batch["minhash"], num_perms)


def _band_keys(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n, bands) uint64 rolling hash over each band's r values."""
    n = sigs.shape[0]
    s = sigs.reshape(n, bands, rows)
    bk = s[:, :, 0].copy()
    for i in range(1, rows):
        bk *= _BAND_MULT
        bk += s[:, :, i]
    # mix in band index so identical value-tuples in different bands differ
    bk += np.arange(bands, dtype=np.uint64)[None, :] * _BAND_MULT
    return bk


def _salt_for(file_ids, n_sub: np.ndarray) -> np.ndarray:
    """Deterministic salt = (low 8 hex chars of file_id) % n_sub,
    vectorized over the fixed-width hex id bytes (no per-row int())."""
    arr = np.asarray(file_ids, dtype="S32")
    view = arr.view(np.uint8).reshape(len(arr), -1)[:, -8:]
    d = view.astype(np.uint64)
    d = np.where(d >= 97, d - 87, np.where(d >= 65, d - 55,
                 np.where(d >= 48, d - 48, np.uint64(0))))
    base = np.zeros(len(arr), dtype=np.uint64)
    for i in range(8):  # 8 fixed iterations, each full-vector
        base = base * np.uint64(16) + d[:, i]
    return (base % np.maximum(n_sub.astype(np.uint64), 1)).astype(np.int32)


def fid64(file_ids) -> np.ndarray:
    """uint64 view of the FIRST 16 hex chars of each file_id.

    Band rows and pair-gen run on this 8-byte key instead of the
    32-char id string: ~55% less shuffle volume and int64 lexsorts
    instead of Python-object compares. 64 bits birthday-collide at
    ~10^10 ids, so pair RESOLUTION back to file_ids expands colliding
    keys to all their members (see candidate_pairs) — a collision can
    only add candidate pairs (verification rejects the junk), never
    drop one."""
    arr = np.asarray(file_ids, dtype="S32")
    view = arr.view(np.uint8).reshape(len(arr), -1)[:, :16]
    d = view.astype(np.uint64)
    d = np.where(d >= 97, d - 87, np.where(d >= 65, d - 55,
                 np.where(d >= 48, d - 48, np.uint64(0))))
    base = np.zeros(len(arr), dtype=np.uint64)
    for i in range(16):
        base = base * np.uint64(16) + d[:, i]
    return base


class ExplodeBands:
    """map_batches fn: signature rows -> (band_id, band_key, salt,
    file_id, simhash) rows. ``hot_ref`` is the broadcast hot-bucket
    table from the counting pass (empty on the counting pass itself):
    a PRE-SORTED (combo uint64 array, n_sub int64 array) pair — numpy
    arrays go zero-copy through plasma, and the searchsorted lookup
    tables are built once on the driver instead of once per actor
    (never a ray.put dict, which is stored pickled and re-unpickled by
    every worker)."""

    def __init__(self, config: DedupConfig, hot_ref=None, include_containment: bool = True):
        self.cfg = config
        self.include_containment = include_containment
        if hot_ref is not None:
            self._hot_combos, self._hot_nsub = ray.get(hot_ref)
        else:
            self._hot_combos = np.empty(0, dtype=np.uint64)
            self._hot_nsub = np.empty(0, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        mask = pa.compute.not_equal(batch["sig_kind"], "empty")
        batch = batch.filter(mask)
        n = batch.num_rows
        if n == 0:
            return pa.table({"band_id": pa.array([], pa.int32()),
                             "band_key": pa.array([], pa.int64()),
                             "salt": pa.array([], pa.int32()),
                             "n_sub": pa.array([], pa.int32()),
                             "fid": pa.array([], pa.int64()),
                             "simhash": pa.array([], pa.int64())})
        sigs = _sig_matrix(batch, cfg.num_perms)
        f64 = fid64(batch["file_id"].to_pylist())
        simhash = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.int64)

        bk = _band_keys(sigs, cfg.lsh_bands, cfg.lsh_rows)          # (n, b)
        band_ids = [np.repeat(np.arange(cfg.lsh_bands, dtype=np.int32)[None, :], n, axis=0)]
        band_keys = [bk]
        if self.include_containment and cfg.containment_perms > 0:
            cp, cr = cfg.containment_perms, cfg.containment_rows
            ncb = cp // cr
            cb = _band_keys(sigs[:, :cp].copy(), ncb, cr)            # (n, ncb)
            band_ids.append(np.repeat(
                (CONTAINMENT_BAND_BASE + np.arange(ncb, dtype=np.int32))[None, :], n, axis=0))
            band_keys.append(cb)
        bid = np.concatenate(band_ids, axis=1)                       # (n, B)
        bkey = np.concatenate(band_keys, axis=1)
        B = bid.shape[1]
        flat_bid = bid.reshape(-1)
        flat_bkey = bkey.reshape(-1)
        flat_fid = np.repeat(f64, B)                                 # uint64
        flat_sim = np.repeat(simhash, B)

        n_sub = np.ones(len(flat_bid), dtype=np.int64)
        if len(self._hot_combos):
            with np.errstate(over="ignore"):
                combos = _combo(flat_bid, flat_bkey.view(np.int64))
            pos = np.searchsorted(self._hot_combos, combos)
            pos[pos >= len(self._hot_combos)] = 0
            hit = self._hot_combos[pos] == combos
            n_sub[hit] = self._hot_nsub[pos[hit]]
            salt = (flat_fid % np.maximum(n_sub.astype(np.uint64), 1)) \
                .astype(np.int32)
        else:
            salt = np.zeros(len(flat_bid), dtype=np.int32)

        # int64 bit-views: Ray's aggregate shuffle mishandles uint64
        return pa.table({"band_id": pa.array(flat_bid),
                         "band_key": pa.array(flat_bkey.view(np.int64)),
                         "salt": pa.array(salt),
                         "n_sub": pa.array(n_sub.astype(np.int32)),
                         "fid": pa.array(flat_fid.view(np.int64)),
                         "simhash": pa.array(flat_sim.view(np.int64))})


class PartialBucketCounts:
    """Counting pass: per-batch partial counts (combiner) so the
    groupby-sum shuffles one row per distinct key per batch, not one row
    per (file, band)."""

    def __init__(self, config: DedupConfig, include_containment: bool = True):
        self.explode = ExplodeBands(config, None, include_containment)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.explode(batch)
        bid = t["band_id"].to_numpy(zero_copy_only=False)
        bkey = t["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        combo = bkey.view(np.uint64) ^ (bid.astype(np.uint64) * _BAND_MULT)
        uniq, inv, counts = np.unique(combo, return_inverse=True, return_counts=True)
        first = np.full(len(uniq), -1, dtype=np.int64)
        first[inv[::-1]] = np.arange(len(inv) - 1, -1, -1)
        return pa.table({"band_id": pa.array(bid[first]),
                         "band_key": pa.array(bkey[first]),
                         "partial": pa.array(counts.astype(np.int64))})


def find_hot_buckets(sigs: ray.data.Dataset, cfg: DedupConfig,
                     include_containment: bool = True):
    """Pass 1: returns a ray.put ObjectRef of the hot-bucket table —
    a pre-sorted (combo uint64 array, n_sub int64 array) pair for
    buckets whose total count exceeds bucket_cap (numpy broadcasts
    zero-copy through plasma; a dict would re-unpickle per worker).

    Counts on a deterministic 1/sample_k row sample (hash(file_id)
    selector): mega-buckets — the ones salting exists for — are found
    w.h.p., and a marginally-hot bucket that slips through is harmless
    because the pair-gen block windows any over-cap sub-bucket anyway.
    This keeps the counting shuffle at 1/sample_k of the band volume."""
    k = max(1, cfg.hot_sample_k)
    threshold = max(2.0, cfg.bucket_cap / k)

    def sample(t: pa.Table) -> pa.Table:
        if k == 1:
            return t
        # vectorized deterministic selector (same fixed-width hex trick
        # as _salt_for) — no per-row int(f[-4:], 16)
        sel = _salt_for(t["file_id"].to_pylist(),
                        np.full(t.num_rows, k, dtype=np.int64))
        return t.filter(pa.array(sel == 0))

    from ..functions.groups import partitioned_sum

    # partitioned vectorized sum — Ray's native groupby().sum() is a
    # full sort-based shuffle, ~10x slower on this narrow key shape
    counts = partitioned_sum(
        sigs.map_batches(sample, batch_format="pyarrow",
                         zero_copy_batch=True)
        .map_batches(PartialBucketCounts(cfg, include_containment),
                     batch_format="pyarrow", zero_copy_batch=True),
        ["band_id", "band_key"], "partial", cfg.pair_partitions,
        out_schema=pa.schema([("band_id", pa.int32()),
                              ("band_key", pa.int64()),
                              ("sum(partial)", pa.int64())]))
    hot_ds = counts.map_batches(
        lambda t: t.filter(pa.compute.greater(t["sum(partial)"], threshold)),
        batch_format="pyarrow", zero_copy_batch=True)
    bids, bkeys, nsubs = [], [], []
    for b in hot_ds.iter_batches(batch_size=65536,
                                 batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        bids.append(b["band_id"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        bkeys.append(b["band_key"].to_numpy(zero_copy_only=False)
                     .astype(np.int64))
        est = b["sum(partial)"].to_numpy(zero_copy_only=False) * k
        nsubs.append(np.ceil(est / cfg.bucket_cap).astype(np.int64))
    if bids:
        with np.errstate(over="ignore"):
            combos = _combo(np.concatenate(bids), np.concatenate(bkeys))
        nsub = np.concatenate(nsubs)
        order = np.argsort(combos)
        return ray.put((combos[order], nsub[order]))
    return ray.put((np.empty(0, dtype=np.uint64),
                    np.empty(0, dtype=np.int64)))


_EMPTY_RAW = {
    "a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
    "is_cont": pd.Series([], dtype=np.int8),
    "band_id": pd.Series([], dtype=np.int32),
    "band_key": pd.Series([], dtype=np.int64),
    "kind": pd.Series([], dtype=object)}


def _pairs_block(df: pd.DataFrame, cap: int, window: int) -> pd.DataFrame:
    """Pair-gen for one hash partition of band rows, partitioned on
    (band_id, band_key, SALT): a hot bucket's salt sub-buckets land on
    DIFFERENT reducers, so no reducer ever holds more than ~cap rows of
    one bucket — the actual point of salting. Each salted sub-bucket
    emits one representative row (kind='rep', b='') that a tiny second
    shuffle links across sub-buckets. Sub-buckets segment via one
    lexsort + boundary scan; the per-bucket loop is numpy-only."""
    if df.empty:
        return pd.DataFrame(_EMPTY_RAW)
    bid = df["band_id"].to_numpy(np.int32)
    bkey = df["band_key"].to_numpy(np.int64)
    salt = df["salt"].to_numpy(np.int32)
    n_sub = df["n_sub"].to_numpy(np.int32)
    fid = df["fid"].to_numpy(np.int64)
    sim = df["simhash"].to_numpy(np.int64)

    order = np.lexsort((fid, sim, salt, bkey, bid))
    bid, bkey, salt, n_sub, fid, sim = (bid[order], bkey[order], salt[order],
                                        n_sub[order], fid[order], sim[order])
    sub_new = np.zeros(len(bid), dtype=bool)
    sub_new[0] = True
    sub_new[1:] = ((bid[1:] != bid[:-1]) | (bkey[1:] != bkey[:-1])
                   | (salt[1:] != salt[:-1]))
    sub_bounds = np.append(np.flatnonzero(sub_new), len(bid))

    a_out: list = []
    b_out: list = []
    cont_out: list = []
    rep_a: list = []
    rep_bid: list = []
    rep_bkey: list = []
    rep_cont: list = []

    for s in range(len(sub_bounds) - 1):
        lo, hi = sub_bounds[s], sub_bounds[s + 1]
        n = hi - lo
        is_cont = np.int8(1 if bid[lo] >= CONTAINMENT_BAND_BASE else 0)
        salted = n_sub[lo] > 1
        if is_cont and salted:
            # df-pruning: a containment bucket that went hot means its
            # band value is boilerplate shared by many files — zero
            # containment signal, quadratic noise. Drop it (regular
            # bands keep salting: they are the near-dup path).
            continue
        members = fid[lo:hi]
        if n >= 2:
            if n <= cap:
                ia, ib = np.triu_indices(n, k=1)
                pa_, pb_ = members[ia], members[ib]
            else:
                # over cap even after salting: windowed pairs along the
                # similarity-sorted order (bounded n*window)
                pa_list, pb_list = [], []
                for w in range(1, window + 1):
                    pa_list.append(members[:-w])
                    pb_list.append(members[w:])
                pa_ = np.concatenate(pa_list)
                pb_ = np.concatenate(pb_list)
            a_out.append(np.minimum(pa_, pb_))
            b_out.append(np.maximum(pa_, pb_))
            cont_out.append(np.full(len(pa_), is_cont, dtype=np.int8))
        if salted:
            rep_a.append(members.min())
            rep_bid.append(bid[lo])
            rep_bkey.append(bkey[lo])
            rep_cont.append(is_cont)

    cands = pd.DataFrame({
        "a": np.concatenate(a_out) if a_out else np.array([], dtype=np.int64),
        "b": np.concatenate(b_out) if b_out else np.array([], dtype=np.int64),
        "is_cont": (np.concatenate(cont_out) if cont_out
                    else np.array([], dtype=np.int8))})
    cands["band_id"] = np.int32(-1)
    cands["band_key"] = np.int64(0)
    cands["kind"] = "cand"
    if rep_a:
        reps = pd.DataFrame({
            "a": np.array(rep_a, dtype=np.int64),
            "b": np.zeros(len(rep_a), dtype=np.int64),
            "is_cont": np.array(rep_cont, dtype=np.int8),
            "band_id": np.array(rep_bid, dtype=np.int32),
            "band_key": np.array(rep_bkey, dtype=np.int64),
            "kind": np.full(len(rep_a), "rep", dtype=object)})
        return pd.concat([cands, reps], ignore_index=True)
    return cands


def _link_reps_block(df: pd.DataFrame) -> pd.DataFrame:
    """Second (tiny) shuffle: all-pair the sub-bucket representatives of
    each hot bucket so salting never disconnects a component."""
    empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                          "b": pd.Series([], dtype=np.int64),
                          "is_cont": pd.Series([], dtype=np.int8)})
    if df.empty:
        return empty
    df = df.sort_values(["band_id", "band_key", "a"], kind="mergesort")
    bid = df["band_id"].to_numpy(np.int32)
    bkey = df["band_key"].to_numpy(np.int64)
    rep = df["a"].to_numpy(np.int64)
    cont = df["is_cont"].to_numpy(np.int8)
    new = np.zeros(len(bid), dtype=bool)
    new[0] = True
    new[1:] = (bid[1:] != bid[:-1]) | (bkey[1:] != bkey[:-1])
    bounds = np.append(np.flatnonzero(new), len(bid))
    a_out, b_out, c_out = [], [], []
    for s in range(len(bounds) - 1):
        lo, hi = bounds[s], bounds[s + 1]
        if hi - lo >= 2:
            r = np.unique(rep[lo:hi])
            ia, ib = np.triu_indices(len(r), k=1)
            a_out.append(r[ia])
            b_out.append(r[ib])
            c_out.append(np.full(len(ia), cont[lo], dtype=np.int8))
    if not a_out:
        return empty
    return pd.DataFrame({"a": np.concatenate(a_out),
                         "b": np.concatenate(b_out),
                         "is_cont": np.concatenate(c_out)})


def candidate_pairs(sigs: ray.data.Dataset, cfg: DedupConfig,
                    include_containment: bool = True,
                    n_sigs: int | None = None) -> ray.data.Dataset:
    """Full LSH candidate generation: counting pass, salted explode,
    partition-block pair-gen (reducers bounded by salt), representative
    linking (tiny second shuffle), pair dedup, then fid64 -> file_id
    resolution (the band rows and every pair shuffle run on 8-byte
    keys; only the final, small pair set touches id strings again).

    Returns distinct pairs (a, b, is_cont) with a < b; ``is_cont`` is
    the max over generating bands, so a pair seen only by containment
    bands is routed to the substring pass if Jaccard rejects it.
    ``n_sigs``: known signature row count (skips a counting pass when
    sizing the resolution broadcast)."""
    import pyarrow.compute as pc

    from ..functions.groups import partitioned_group_map

    cfg = cfg.resolved()
    hot_ref = find_hot_buckets(sigs, cfg, include_containment)
    bands = sigs.map_batches(ExplodeBands(cfg, hot_ref, include_containment),
                             batch_format="pyarrow", zero_copy_batch=True)

    raw_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("is_cont", pa.int8()), ("band_id", pa.int32()),
                            ("band_key", pa.int64()), ("kind", pa.string())])
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("is_cont", pa.int8())])
    raw = partitioned_group_map(
        bands, ["band_id", "band_key", "salt"],
        lambda df: _pairs_block(df, cfg.bucket_cap, cfg.salt_window),
        cfg.pair_partitions, out_schema=raw_schema)
    # consumed twice below (cand + rep split): materialize so the
    # explode + shuffle + pair-gen lineage runs once, not twice
    raw = raw.materialize()

    pairs = raw.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "cand"))
        .select(["a", "b", "is_cont"]),
        batch_format="pyarrow", zero_copy_batch=True)
    reps = raw.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "rep"))
        .select(["a", "is_cont", "band_id", "band_key"]),
        batch_format="pyarrow", zero_copy_batch=True)
    rep_pairs = partitioned_group_map(
        reps, ["band_id", "band_key"], _link_reps_block,
        max(8, cfg.pair_partitions // 8), out_schema=pair_schema)

    all_pairs = pairs.union(rep_pairs)

    # distinct on (a, b); is_cont = max => ANY containment-band evidence
    # routes a Jaccard-rejected pair to the substring pass. Partitioned
    # block dedup (sort + segment scan) — measurably faster than the
    # generic sort-based aggregate on string pair keys. Pairs seen ONLY
    # by containment bands must agree in >= containment_min_band_hits
    # bands: at band collision prob J^r a real containment pair (J >=
    # ~0.5) hits many bands, while a boilerplate-noise pair almost never
    # hits twice — the cheap pre-verify noise gate.
    min_hits = cfg.containment_min_band_hits

    def dedup_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "is_cont": pd.Series([], dtype=np.int8)})
        df = df.sort_values(["a", "b", "is_cont"], kind="mergesort")
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        c = df["is_cont"].to_numpy(np.int8)
        first = np.zeros(len(a), dtype=bool)
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        last = np.zeros(len(a), dtype=bool)
        last[-1] = True
        last[:-1] = first[1:]
        group_idx = np.cumsum(first, dtype=np.int32) - 1
        counts = np.bincount(group_idx)
        cont_only = c[first] == 1        # min is_cont (sort asc) == 1
        keep = ~cont_only | (counts >= min_hits)
        return pd.DataFrame({"a": a[last][keep], "b": b[last][keep],
                             "is_cont": c[last][keep]})  # max = last

    deduped = partitioned_group_map(all_pairs, ["a", "b"], dedup_block,
                                    cfg.pair_partitions,
                                    out_schema=pair_schema)
    return _resolve_pairs(deduped, sigs, cfg, n_sigs)


def _resolve_pairs(pairs64: ray.data.Dataset, sigs: ray.data.Dataset,
                   cfg: DedupConfig, n_sigs: int | None) -> ray.data.Dataset:
    """fid64 pairs -> file_id pairs.

    Broadcast path (fits cfg.verify_broadcast_max_bytes at 40 B/row):
    the sorted (fid64 -> file_id) map ships once via ray.put; each batch
    resolves with two searchsorted lookups. 64-bit COLLISIONS (two
    file_ids sharing a fid64 — expected only in the 10^10+ regime) are
    handled by expansion: a colliding endpoint resolves to ALL its
    member ids, so a collision can only add candidate pairs for
    verification to reject, never lose a true pair. Past the byte cap,
    a partitioned hash join resolves each side instead with
    ``right_dup="expand"`` — the SAME collision-expansion semantics as
    the broadcast path (every member id of a colliding key joins in;
    self-pairs filtered), so both routes are collision-lossless."""
    import pyarrow.compute as pc

    from ..functions.joins import hash_join

    if n_sigs is None:
        n_sigs = sigs.count()
    if n_sigs * 48 <= cfg.verify_broadcast_max_bytes:
        @ray.remote
        def _pack(block):
            t = block if isinstance(block, pa.Table) \
                else pa.Table.from_pandas(block)
            if t.num_rows == 0 or "file_id" not in t.column_names:
                # Ray 2.49 empty partitions can arrive schema-less
                return np.empty(0, np.uint64), np.empty(0, dtype="S32")
            ids = t["file_id"].to_pylist()
            return fid64(ids), np.array(ids, dtype="S32")

        bundles = sigs.select_columns(["file_id"]).iter_internal_ref_bundles()
        refs = [r for bundle in bundles for r in bundle.block_refs]
        parts = [p for p in ray.get([_pack.remote(r) for r in refs])
                 if len(p[0])]
        if parts:
            keys = np.concatenate([p[0] for p in parts])
            vals = np.concatenate([p[1] for p in parts])
            order = np.argsort(keys, kind="stable")
            keys, vals = keys[order], vals[order]
        else:
            keys = np.empty(0, np.uint64)
            vals = np.empty(0, dtype="S32")
        map_ref = ray.put((keys, vals))

        def resolve(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"a": pa.array([], pa.string()),
                                 "b": pa.array([], pa.string()),
                                 "is_cont": pa.array([], pa.int8())})
            ks, vs = ray.get(map_ref)
            a64 = t["a"].to_numpy(zero_copy_only=False).view(np.uint64)
            b64 = t["b"].to_numpy(zero_copy_only=False).view(np.uint64)
            cont = t["is_cont"].to_numpy(zero_copy_only=False)
            lo_a = np.searchsorted(ks, a64, "left")
            hi_a = np.searchsorted(ks, a64, "right")
            lo_b = np.searchsorted(ks, b64, "left")
            hi_b = np.searchsorted(ks, b64, "right")
            ca, cb_ = hi_a - lo_a, hi_b - lo_b
            simple = (ca == 1) & (cb_ == 1)
            out_a = [vs[lo_a[simple]]]
            out_b = [vs[lo_b[simple]]]
            out_c = [cont[simple]]
            for i in np.flatnonzero(~simple):       # collision expansion
                fa = vs[lo_a[i]:hi_a[i]]
                fb = vs[lo_b[i]:hi_b[i]]
                if len(fa) == 0 or len(fb) == 0:
                    continue
                ga = np.repeat(fa, len(fb))
                gb = np.tile(fb, len(fa))
                keep = ga != gb
                out_a.append(ga[keep])
                out_b.append(gb[keep])
                out_c.append(np.full(keep.sum(), cont[i], np.int8))
            ra = np.concatenate(out_a)
            rb = np.concatenate(out_b)
            lt = ra <= rb               # np.minimum has no S32 loop
            aa = np.where(lt, ra, rb)
            bb = np.where(lt, rb, ra)
            return pa.table({
                "a": pa.array(aa.astype("U32")),
                "b": pa.array(bb.astype("U32")),
                "is_cont": pa.array(np.concatenate(out_c), pa.int8())})

        return pairs64.map_batches(resolve, batch_format="pyarrow",
                                   zero_copy_batch=True)

    # beyond-broadcast: partitioned joins on stringified fid64 keys
    # stringify the SIGNED bit-view on both sides (pairs store fid64 as
    # an int64 bit-view, so unsigned stringification would mismatch)
    id_map = sigs.select_columns(["file_id"]).map_batches(
        lambda t: pa.table({
            "k": pa.array([str(x) for x in
                           fid64(t["file_id"].to_pylist()).view(np.int64)],
                          pa.string()),
            "file_id": t["file_id"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    str_pairs = pairs64.map_batches(
        lambda t: pa.table({
            "ka": pc.cast(t["a"], pa.string()),
            "kb": pc.cast(t["b"], pa.string()),
            "is_cont": t["is_cont"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    base = pa.schema([("ka", pa.string()), ("kb", pa.string()),
                      ("is_cont", pa.int8())])
    # right_dup="expand": a fid64 key shared by several file_ids
    # resolves each pair endpoint to ALL its member ids (cross-product
    # per colliding pair), exactly like the broadcast path's collision
    # expansion — candidates can only be added for verification to
    # reject, never lost. Self-pairs from a==b collisions are dropped
    # in fin below (broadcast path's ga != gb filter).
    j = hash_join(str_pairs, id_map.map_batches(
        lambda t: t.rename_columns(["k", "fa"]), batch_format="pyarrow"),
        "ka", "k", base, pa.schema([("fa", pa.string())]),
        num_partitions=cfg.join_num_partitions, right_dup="expand")
    j = hash_join(j, id_map.map_batches(
        lambda t: t.rename_columns(["k", "fb"]), batch_format="pyarrow"),
        "kb", "k", base.append(pa.field("fa", pa.string())),
        pa.schema([("fb", pa.string())]),
        num_partitions=cfg.join_num_partitions, right_dup="expand")

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "is_cont": pa.array([], pa.int8())})
        keep = pc.invert(pc.equal(t["fa"], t["fb"]))
        t = t.filter(keep)
        a = pc.min_element_wise(t["fa"], t["fb"])
        b = pc.max_element_wise(t["fa"], t["fb"])
        return pa.table({"a": a, "b": b, "is_cont": t["is_cont"]})

    return j.map_batches(fin, batch_format="pyarrow")
