"""Pair verification + exact-dup edges.

J4 in SURVEY.md §2.4: the reference's intended pair check is
``PHash::is_similar`` distance <= threshold
(/root/reference/crates/image-deduper-core/src/processing/types.rs:47-58).
Here: candidate pairs (a, b) are hash-joined with the signatures table
twice (``Dataset.join``, hash-partitioned on the key — the scale-safe
alternative to broadcasting every signature), then estimated Jaccard =
mean(sig_a == sig_b) is computed vectorized per batch and thresholded.

Exact dedup (A1, the commented-out ``_find_duplicate_images`` at
src/deduplication/mod.rs:8-32): groupby(sha256), emit (first, other)
edges per group — groups of size 1 emit nothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import DedupConfig


def _sig_of(batch_col: pa.ChunkedArray | pa.Array, num_perms: int) -> np.ndarray:
    if isinstance(batch_col, pa.ChunkedArray):
        batch_col = batch_col.combine_chunks()
    flat = np.frombuffer(b"".join(batch_col.to_pylist()), dtype=np.uint64)
    return flat.reshape(-1, num_perms)


def attach_signatures(pairs: ray.data.Dataset, sigs: ray.data.Dataset,
                      cfg: DedupConfig) -> ray.data.Dataset:
    """pairs(a, b, ...) -> + minhash_a, minhash_b via two partitioned
    hash joins (functions/joins.py)."""
    from ..functions.joins import hash_join

    sig_a = sigs.select_columns(["file_id", "minhash"]).map_batches(
        lambda t: t.rename_columns(["file_id", "minhash_a"]),
        batch_format="pyarrow", zero_copy_batch=True)
    sig_b = sigs.select_columns(["file_id", "minhash"]).map_batches(
        lambda t: t.rename_columns(["file_id", "minhash_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("is_cont", pa.int8())])
    j = hash_join(pairs, sig_a, "a", "file_id", pair_schema,
                  pa.schema([("minhash_a", pa.binary())]),
                  num_partitions=cfg.join_num_partitions)
    j = hash_join(j, sig_b, "b", "file_id",
                  pair_schema.append(pa.field("minhash_a", pa.binary())),
                  pa.schema([("minhash_b", pa.binary())]),
                  num_partitions=cfg.join_num_partitions)
    return j


class ScorePairs:
    """Vectorized est-Jaccard per batch; splits verified near-dup edges
    from containment candidates that still need the substring pass."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "jaccard": pa.array([], pa.float64()),
                             "verdict": pa.array([], pa.string())})
        sa = _sig_of(batch["minhash_a"], self.cfg.num_perms)
        sb = _sig_of(batch["minhash_b"], self.cfg.num_perms)
        jac = (sa == sb).mean(axis=1)
        is_cont = batch["is_cont"].to_numpy(zero_copy_only=False)
        # containment candidates must clear a signature floor before the
        # (content-joining) substring pass — see config.containment_est_jaccard_min
        cont_ok = (is_cont == 1) & (jac >= self.cfg.containment_est_jaccard_min)
        verdict = np.where(jac >= self.cfg.jaccard_threshold, "near_dup",
                           np.where(cont_ok, "containment_cand", "reject"))
        return pa.table({"a": batch["a"], "b": batch["b"],
                         "jaccard": pa.array(jac),
                         "verdict": pa.array(verdict.tolist(), pa.string())})


def verify_pairs(pairs: ray.data.Dataset, sigs: ray.data.Dataset,
                 cfg: DedupConfig) -> ray.data.Dataset:
    """-> (a, b, jaccard, verdict) for every candidate pair."""
    joined = attach_signatures(pairs, sigs, cfg)
    return joined.map_batches(ScorePairs(cfg), batch_format="pyarrow",
                              zero_copy_batch=True)


def sha_representatives(sigs: ray.data.Dataset, cfg: DedupConfig,
                        num_partitions: int = 32) -> ray.data.Dataset:
    """One representative row (min file_id) per sha256 group, projected
    to the columns LSH needs. Exact copies have identical signatures;
    letting them all into LSH creates every-band mega-buckets for edges
    that exact_dup_edges + CC transitivity already provide. The chosen
    representative equals exact_dup_edges' group anchor (min file_id),
    so the edge graph stays connected."""
    from ..functions.groups import group_starts, partitioned_group_map

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "file_id": pd.Series([], dtype=object),
                "minhash": pd.Series([], dtype=object),
                "simhash": pd.Series([], dtype=np.int64),
                "sig_kind": pd.Series([], dtype=object)})
        df = df.sort_values(["sha256", "file_id"], kind="mergesort")
        first = group_starts(df["sha256"].to_numpy())
        out = df.iloc[np.flatnonzero(first)]
        return out[["file_id", "minhash", "simhash", "sig_kind"]] \
            .reset_index(drop=True)

    schema = pa.schema([("file_id", pa.string()), ("minhash", pa.binary()),
                        ("simhash", pa.int64()), ("sig_kind", pa.string())])
    return partitioned_group_map(
        sigs.select_columns(["sha256", "file_id", "minhash", "simhash",
                             "sig_kind"]),
        ["sha256"], block, num_partitions, out_schema=schema)


def exact_dup_edges(sigs: ray.data.Dataset,
                    num_partitions: int = 32) -> ray.data.Dataset:
    """A1: sha256-equal edges (first-vs-rest per group, deterministic
    by file_id order). Empty-content rows are excluded (M16 validator
    semantics, file_validation.rs:37-51).

    Partition-level block processing (functions/groups.py): one shuffle
    on hash(sha256), then the whole partition's groups segment in one
    vectorized pass — no per-group Python overhead."""
    from ..functions.groups import group_starts, partitioned_group_map

    def block(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["sig_kind"] != "empty"]
        if df.empty:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        sha = df["sha256"].to_numpy()
        fid = df["file_id"].to_numpy()
        order = np.lexsort((fid, sha))
        sha, fid = sha[order], fid[order]
        new = group_starts(sha)
        group_idx = np.cumsum(new) - 1
        first_fid = fid[new][group_idx]  # group's min file_id, broadcast
        mask = ~new                      # every non-first row is an edge
        return pd.DataFrame({"a": first_fid[mask], "b": fid[mask]})

    return partitioned_group_map(
        sigs.select_columns(["sha256", "file_id", "sig_kind"]),
        ["sha256"], block, num_partitions,
        out_schema=pa.schema([("a", pa.string()), ("b", pa.string())]))
