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
            cp = cfg.containment_perms
            cb = sigs[:, :cp].copy()                                 # (n, cp) single-perm keys
            band_ids.append(np.repeat(
                (CONTAINMENT_BAND_BASE + np.arange(cp, dtype=np.int32))[None, :], n, axis=0))
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


def _emit_pairs(group: pd.DataFrame, cap: int, window: int) -> pd.DataFrame:
    """Pairs within one (band_id, band_key, salt) bucket. Deterministic:
    members ordered by (simhash, file_id) so similar rows are adjacent
    if the bucket is still over cap and we fall back to windowed pairs."""
    g = group.sort_values(["simhash", "file_id"], kind="mergesort")
    fids = g["file_id"].to_numpy()
    n = len(fids)
    is_cont = 1 if int(g["band_id"].iloc[0]) >= CONTAINMENT_BAND_BASE else 0
    salted = int(g["salt"].iloc[0]) > 0 or (g["salt"].nunique() > 1)
    a_out, b_out = [], []
    if n >= 2:
        if n <= cap:
            ia, ib = np.triu_indices(n, k=1)
            a_out, b_out = fids[ia], fids[ib]
        else:
            # over cap even after salting: windowed pairs along the
            # similarity-sorted order (bounded n*window)
            for w in range(1, window + 1):
                a_out.extend(fids[:-w])
                b_out.extend(fids[w:])
            a_out, b_out = np.array(a_out, dtype=object), np.array(b_out, dtype=object)
    lo = np.minimum(a_out, b_out) if len(a_out) else np.array([], dtype=object)
    hi = np.maximum(a_out, b_out) if len(a_out) else np.array([], dtype=object)
    out = pd.DataFrame({"a": lo, "b": hi,
                        "is_cont": np.full(len(lo), is_cont, dtype=np.int8),
                        "kind": np.full(len(lo), "cand", dtype=object)})
    if salted and n >= 1:
        # representative row links this sub-bucket to its siblings
        rep = pd.DataFrame({"a": [fids.min()], "b": [""],
                            "is_cont": np.array([is_cont], dtype=np.int8),
                            "kind": ["rep"]})
        rep["band_id"] = int(g["band_id"].iloc[0])
        rep["band_key"] = np.int64(g["band_key"].iloc[0])
        out["band_id"] = -1
        out["band_key"] = np.int64(0)
        return pd.concat([out, rep], ignore_index=True)
    out["band_id"] = -1
    out["band_key"] = np.int64(0)
    return out


def candidate_pairs(sigs: ray.data.Dataset, cfg: DedupConfig,
                    include_containment: bool = True) -> ray.data.Dataset:
    """Full LSH candidate generation: counting pass, salted explode,
    bucket pair-gen, representative linking, pair dedup.

    Returns distinct pairs (a, b, is_cont) with a < b; ``is_cont`` = 1
    when ANY generating band was a containment band AND no regular band
    produced the pair (regular bands win so near-dup pairs are verified
    by Jaccard first)."""
    hot_ref = find_hot_buckets(sigs, cfg, include_containment)
    bands = sigs.map_batches(ExplodeBands(cfg, hot_ref, include_containment),
                             batch_format="pyarrow", zero_copy_batch=True)
    raw = bands.groupby(["band_id", "band_key", "salt"]).map_groups(
        lambda g: _emit_pairs(g, cfg.bucket_cap, cfg.salt_window),
        batch_format="pandas")

    import pyarrow.compute as pc

    reps = raw.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "rep"))
        .select(["a", "band_id", "band_key"]),
        batch_format="pyarrow", zero_copy_batch=True)
    pairs = raw.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "cand"))
        .select(["a", "b", "is_cont"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def _pair_reps(g: pd.DataFrame) -> pd.DataFrame:
        fids = np.sort(g["a"].unique())
        is_cont = 1 if int(g["band_id"].iloc[0]) >= CONTAINMENT_BAND_BASE else 0
        if len(fids) < 2:
            return pd.DataFrame({"a": [], "b": [], "is_cont": []})
        ia, ib = np.triu_indices(len(fids), k=1)
        return pd.DataFrame({"a": fids[ia], "b": fids[ib],
                             "is_cont": np.full(len(ia), is_cont, dtype=np.int8)})

    rep_pairs = reps.groupby(["band_id", "band_key"]).map_groups(
        _pair_reps, batch_format="pandas")
    all_pairs = pairs.union(rep_pairs)
    # distinct on (a, b); is_cont = max => ANY containment-band evidence
    # routes a Jaccard-rejected pair to the substring pass
    return (all_pairs.groupby(["a", "b"]).max("is_cont")
            .map_batches(lambda t: t.rename_columns(["a", "b", "is_cont"]),
                         batch_format="pyarrow"))
