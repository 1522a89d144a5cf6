"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine top-k is the exact baseline: the query matrix is
normalized once on the driver, broadcast once via ``ray.put`` (never
re-shipped per batch), and each ``map_batches`` task does one numpy
matmul (batch x dim @ dim x Q) — the per-batch partial top-k keeps the
shuffle tiny (only batch-local candidates reach the final per-query
group). The LSH-bucketed variant is the scale path: random-hyperplane
sketches route each vector to a bucket; queries probe only matching
buckets (approximate, rows-only oracle).

This is the embedding-space analog of the reference's pHash
nearest-neighbor intent (PHash::distance ranking,
/root/reference/crates/image-deduper-core/src/processing/types.rs:22-43).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _read_embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _to_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(t) if len(t) else 0
    return ids, flat.reshape(len(t), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def load_queries(sf_dir: str, num_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """The (small) query side: lowest ``num_queries`` vec_ids. Loaded on
    the driver once — at scale this is the broadcast side."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids, m = _to_matrix(t)
    order = np.argsort(ids, kind="stable")[:num_queries]
    return ids[order], _normalize(m[order])


def knn_brute(sf_dir: str, k: int = 10, num_queries: int = 8) -> ray.data.Dataset:
    """Exact cosine top-k: (query_id, neighbor_id, rank), self excluded.
    Tie-break (sim desc, neighbor_id asc) — deterministic, so the result
    hash-matches the DuckDB oracle."""
    qids, Q = load_queries(sf_dir, num_queries)
    q_ref = ray.put((qids, Q))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(q_ref)
        ids, M = _to_matrix(t)
        sims = _normalize(M) @ Q_.T  # (batch, nq)
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(qids_):
            col = sims[:, j]
            mask = ids != qid
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            take = min(k, len(cand_idx))
            top = cand_idx[np.argpartition(-col[cand_idx], take - 1)[:take]] \
                if len(cand_idx) > take else cand_idx
            out_q.extend([int(qid)] * len(top))
            out_n.extend(int(i) for i in ids[top])
            out_s.extend(float(c) for c in col[top])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    cands = _read_embeddings(sf_dir).map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return cands.groupby("query_id").map_groups(final_topk,
                                                batch_format="pandas")


def near_dup_pairs(sf_dir: str, tau: float = 0.35) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs (a < b) with cosine >= tau.

    Single-node-exact formulation: the full normalized matrix is small
    per-dimension (n x dim doubles), broadcast once; each batch matmuls
    against it and emits only its above-threshold pairs. At 100 TB the
    broadcast side flips to the IVF/LSH bucket route (knn_lsh below).
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    all_ids, M = _to_matrix(t)
    ref = ray.put((all_ids, _normalize(M)))

    def emit(t: pa.Table) -> pa.Table:
        all_ids_, N = ray.get(ref)
        ids, Mb = _to_matrix(t)
        sims = _normalize(Mb) @ N.T
        rows_a, rows_b = [], []
        hit_r, hit_c = np.nonzero(sims >= tau)
        for r, c in zip(hit_r, hit_c):
            a, b = int(ids[r]), int(all_ids_[c])
            if a < b:
                rows_a.append(a)
                rows_b.append(b)
        return pa.table({"a": pa.array(rows_a, pa.int64()),
                         "b": pa.array(rows_b, pa.int64())})

    return _read_embeddings(sf_dir).map_batches(
        emit, batch_format="pyarrow", zero_copy_batch=True)


def knn_lsh(sf_dir: str, k: int = 10, num_queries: int = 8,
            n_planes: int = 8, n_tables: int = 6,
            seed: int = 7) -> ray.data.Dataset:
    """Approximate top-k via multi-table random-hyperplane LSH: each of
    ``n_tables`` independent sketches routes a vector to one bucket;
    queries probe their bucket (plus Hamming-1 neighbors) in every
    table, candidates are exactly reranked. More tables -> higher
    recall, linearly more candidate work — the classic LSH dial.
    Approximate — rows-only oracle."""
    qids, Q = load_queries(sf_dir, num_queries)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, Q.shape[1], n_planes))

    def sketch(m: np.ndarray, t: int) -> np.ndarray:
        bits = (m @ planes[t]) > 0
        return (bits @ (1 << np.arange(n_planes))).astype(np.int64)

    probe: list[dict[int, list[int]]] = []
    for t in range(n_tables):
        q_buckets = sketch(Q, t)
        table_probe: dict[int, list[int]] = {}
        for j, b in enumerate(q_buckets):
            targets = [int(b)] + [int(b) ^ (1 << p) for p in range(n_planes)]
            for tgt in targets:
                table_probe.setdefault(tgt, []).append(j)
        probe.append(table_probe)
    ref = ray.put((qids, Q, probe))

    def candidates(t: pa.Table) -> pa.Table:
        qids_, Q_, probe_ = ray.get(ref)
        ids, M = _to_matrix(t)
        N = _normalize(M)
        hits: set[tuple[int, int]] = set()
        for tbl in range(n_tables):
            buckets = sketch(N, tbl)
            for i in range(len(ids)):
                for j in probe_[tbl].get(int(buckets[i]), ()):
                    if ids[i] != qids_[j]:
                        hits.add((i, j))
        out_q, out_n, out_s = [], [], []
        for i, j in hits:
            out_q.append(int(qids_[j]))
            out_n.append(int(ids[i]))
            out_s.append(float(N[i] @ Q_[j]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    cands = _read_embeddings(sf_dir).map_batches(
        candidates, batch_format="pyarrow", zero_copy_batch=True)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return cands.groupby("query_id").map_groups(final_topk,
                                                batch_format="pandas")
