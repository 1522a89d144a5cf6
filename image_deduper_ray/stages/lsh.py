"""LSH banding + candidate-pair generation with explicit skew handling.

The near-dup grouping the reference intends via
``PHash::is_similar`` threshold grouping
(/root/reference/crates/image-deduper-core/src/processing/types.rs:47-58,
threshold ``phash_threshold=90`` at src/config.rs:105; intended flow in
dev_notes.md:28-38) — recast as MinHash-LSH (SURVEY.md §2.5 A2):

  explode: sig (P=128) -> b bands x r rows; band_key = rolling hash of
           the band's r values  (vectorized, one reshape + r fused ops)
  shuffle: groupby(band_id, band_key, salt)
  pairs:   all pairs within a bucket, emitted inside map_groups

Skew (vendored/boilerplate code — the north rule's explicit case):
buckets are Zipf-skewed, and pair-gen is quadratic in bucket size. Two
passes make the salting explicit and bounded:

  pass 1: partial bucket counts inside map_batches (np.unique per
          batch) -> tiny groupby-sum -> keys with count > bucket_cap
          become the HOT set, broadcast once via ray.put.
  pass 2: explode with salt = hash(file_id) % n_sub for hot keys
          (n_sub = ceil(count / bucket_cap)), 0 otherwise.

Each salted sub-bucket emits its pairs plus ONE representative row
(min file_id); representatives of the same original bucket are then
all-paired in a second, tiny groupby — preserving cluster connectivity
across sub-buckets without any reducer ever seeing more than ~cap rows.

Containment candidates (for the suffix-array substring pass) ride the
same machinery as r=1 bands over the first ``containment_perms``
permutation values: if file A is contained in file B, each perm's min
over B's shingles equals A's with probability |A|/|B∪A|, so with 16
single-perm bands containment pairs surface even at low Jaccard.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..config import DedupConfig

_BAND_MULT = np.uint64(0x9E3779B97F4A7C15)
CONTAINMENT_BAND_BASE = 1000  # band_ids >= this are single-perm containment bands


def _sig_matrix(batch: pa.Table, num_perms: int) -> np.ndarray:
    col = batch["minhash"].combine_chunks()
    flat = np.frombuffer(b"".join(col.to_pylist()), dtype=np.uint64)
    return flat.reshape(-1, num_perms)


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


def _salt_for(file_ids: list[str], n_sub: np.ndarray) -> np.ndarray:
    """Deterministic salt = (low 8 hex chars of file_id) % n_sub."""
    base = np.array([int(f[-8:], 16) for f in file_ids], dtype=np.uint64)
    return (base % np.maximum(n_sub.astype(np.uint64), 1)).astype(np.int32)


class ExplodeBands:
    """map_batches fn: signature rows -> (band_id, band_key, salt,
    file_id, simhash) rows. ``hot_ref`` is the broadcast dict
    {(band_id, band_key): n_sub} from the counting pass (empty on the
    counting pass itself)."""

    def __init__(self, config: DedupConfig, hot_ref=None, include_containment: bool = True):
        self.cfg = config
        self.include_containment = include_containment
        self.hot = ray.get(hot_ref) if hot_ref is not None else {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        mask = pa.compute.not_equal(batch["sig_kind"], "empty")
        batch = batch.filter(mask)
        n = batch.num_rows
        if n == 0:
            return pa.table({"band_id": pa.array([], pa.int32()),
                             "band_key": pa.array([], pa.int64()),
                             "salt": pa.array([], pa.int32()),
                             "file_id": pa.array([], pa.string()),
                             "simhash": pa.array([], pa.int64())})
        sigs = _sig_matrix(batch, cfg.num_perms)
        fids = batch["file_id"].to_pylist()
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
        flat_fid = np.repeat(np.array(fids, dtype=object), B)
        flat_sim = np.repeat(simhash, B)

        if self.hot:
            # hot-dict keys use the SIGNED int64 view, matching the
            # band_key column type the counting pass emitted
            flat_bkey_i64 = flat_bkey.view(np.int64)
            n_sub = np.ones(len(flat_bid), dtype=np.int64)
            for i in range(len(flat_bid)):
                s = self.hot.get((int(flat_bid[i]), int(flat_bkey_i64[i])))
                if s:
                    n_sub[i] = s
            salt = _salt_for(list(flat_fid), n_sub)
        else:
            salt = np.zeros(len(flat_bid), dtype=np.int32)

        # int64 bit-views: Ray's aggregate shuffle mishandles uint64
        return pa.table({"band_id": pa.array(flat_bid),
                         "band_key": pa.array(flat_bkey.view(np.int64)),
                         "salt": pa.array(salt),
                         "file_id": pa.array(flat_fid.tolist(), pa.string()),
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
    """Pass 1: returns a ray.put ObjectRef of {(band_id, band_key): n_sub}
    for buckets whose total count exceeds bucket_cap. The hot set is
    small by construction (≤ N·B / cap keys) and usually tiny."""
    counts = (sigs.map_batches(PartialBucketCounts(cfg, include_containment),
                               batch_format="pyarrow", zero_copy_batch=True)
              .groupby(["band_id", "band_key"])
              .sum("partial"))
    hot_ds = counts.map_batches(
        lambda t: t.filter(pa.compute.greater(t["sum(partial)"], cfg.bucket_cap)),
        batch_format="pyarrow", zero_copy_batch=True)
    hot = {}
    for row in hot_ds.iter_rows():
        hot[(int(row["band_id"]), int(row["band_key"]))] = int(
            math.ceil(row["sum(partial)"] / cfg.bucket_cap))
    return ray.put(hot)


def _pairs_block(df: pd.DataFrame, cap: int, window: int) -> pd.DataFrame:
    """All candidate pairs for one hash partition of band rows.

    The partition key is (band_id, band_key), so EVERY salt sub-bucket
    of a bucket lands in the same block — sub-bucket pair-gen AND the
    representative linking across sub-buckets both happen here, with no
    second shuffle. Buckets segment via one lexsort + boundary scan;
    the per-bucket loop is numpy-only (no pandas construction per
    bucket, which is what made per-group map_groups quadratic in group
    count)."""
    if df.empty:
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "is_cont": pd.Series([], dtype=np.int8)})
    bid = df["band_id"].to_numpy(np.int32)
    bkey = df["band_key"].to_numpy(np.int64)
    salt = df["salt"].to_numpy(np.int32)
    fid = df["file_id"].to_numpy()
    sim = df["simhash"].to_numpy(np.int64)

    order = np.lexsort((fid, sim, salt, bkey, bid))
    bid, bkey, salt, fid, sim = (bid[order], bkey[order], salt[order],
                                 fid[order], sim[order])
    # sub-bucket = (band_id, band_key, salt); bucket = (band_id, band_key)
    sub_new = np.zeros(len(bid), dtype=bool)
    sub_new[0] = True
    sub_new[1:] = ((bid[1:] != bid[:-1]) | (bkey[1:] != bkey[:-1])
                   | (salt[1:] != salt[:-1]))
    buck_new = np.zeros(len(bid), dtype=bool)
    buck_new[0] = True
    buck_new[1:] = (bid[1:] != bid[:-1]) | (bkey[1:] != bkey[:-1])

    sub_bounds = np.flatnonzero(sub_new)
    sub_bounds = np.append(sub_bounds, len(bid))
    buck_of_sub = np.cumsum(buck_new)[sub_bounds[:-1]] - 1  # bucket idx per sub

    a_out: list = []
    b_out: list = []
    cont_out: list = []
    n_bucks = int(buck_of_sub[-1]) + 1 if len(buck_of_sub) else 0
    # reps[bucket] -> list of sub-bucket representatives (for salted buckets)
    reps: list[list] = [[] for _ in range(n_bucks)]
    buck_cont = np.zeros(n_bucks, dtype=np.int8)
    # a bucket is salted iff it has >1 sub-bucket or a nonzero salt —
    # ALL its sub-buckets then emit a representative (including salt=0)
    subs_per_bucket = np.bincount(buck_of_sub, minlength=n_bucks)
    salted_any = np.zeros(n_bucks, dtype=bool)
    np.logical_or.at(salted_any, buck_of_sub, salt[sub_bounds[:-1]] > 0)
    buck_salted = (subs_per_bucket > 1) | salted_any

    for s in range(len(sub_bounds) - 1):
        lo, hi = sub_bounds[s], sub_bounds[s + 1]
        n = hi - lo
        bk = buck_of_sub[s]
        is_cont = np.int8(1 if bid[lo] >= CONTAINMENT_BAND_BASE else 0)
        buck_cont[bk] = is_cont
        if is_cont and buck_salted[bk]:
            # df-pruning: a containment (single-perm) bucket that went
            # hot means its min-shingle is boilerplate shared by many
            # files — zero containment signal, quadratic noise. Drop it
            # (regular bands keep salting: they are the near-dup path).
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
        if buck_salted[bk]:
            reps[bk].append(members.min())

    # representative linking: sub-bucket reps of one bucket all-pair
    for bk in range(n_bucks):
        r = reps[bk]
        if len(r) >= 2:
            r = np.sort(np.array(r, dtype=object))
            ia, ib = np.triu_indices(len(r), k=1)
            a_out.append(r[ia])
            b_out.append(r[ib])
            cont_out.append(np.full(len(ia), buck_cont[bk], dtype=np.int8))

    if not a_out:
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "is_cont": pd.Series([], dtype=np.int8)})
    return pd.DataFrame({"a": np.concatenate(a_out),
                         "b": np.concatenate(b_out),
                         "is_cont": np.concatenate(cont_out)})


def candidate_pairs(sigs: ray.data.Dataset, cfg: DedupConfig,
                    include_containment: bool = True) -> ray.data.Dataset:
    """Full LSH candidate generation: counting pass, salted explode,
    partition-block pair-gen + representative linking (ONE shuffle),
    then pair dedup.

    Returns distinct pairs (a, b, is_cont) with a < b; ``is_cont`` is
    the max over generating bands, so a pair seen only by containment
    bands is routed to the substring pass if Jaccard rejects it."""
    from ..functions.groups import partitioned_group_map

    hot_ref = find_hot_buckets(sigs, cfg, include_containment)
    bands = sigs.map_batches(ExplodeBands(cfg, hot_ref, include_containment),
                             batch_format="pyarrow", zero_copy_batch=True)

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("is_cont", pa.int8())])
    all_pairs = partitioned_group_map(
        bands, ["band_id", "band_key"],
        lambda df: _pairs_block(df, cfg.bucket_cap, cfg.salt_window),
        cfg.pair_partitions, out_schema=pair_schema)
    # distinct on (a, b); is_cont = max => ANY containment-band evidence
    # routes a Jaccard-rejected pair to the substring pass
    return (all_pairs.groupby(["a", "b"]).max("is_cont")
            .map_batches(lambda t: t.rename_columns(["a", "b", "is_cont"]),
                         batch_format="pyarrow"))
