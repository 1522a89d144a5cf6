"""Dedup variants over the ``documents`` table.

The flagship engine (pipelines/dedup.py) runs on the code-files schema;
this module adapts the documents table onto it and adds the remaining
dedup family members a training-data pipeline needs: exact (sha256),
MinHash+LSH (full pipeline), SimHash Hamming grouping, and exact word
n-gram Jaccard pairs (inverted-index formulation whose results are
SQL-reproducible, so the driver's DuckDB oracle can verify it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import DedupConfig
from ..functions import hashing
from ..functions import minhash as mh


def documents_as_files(sf_dir: str) -> ray.data.Dataset:
    """Map documents(doc_id, text, lang, source) onto the engine's files
    schema (repo, path, commit, lang, content)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        paths = pc.binary_join_element_wise(
            pa.array(["doc"] * n), t["doc_id"].cast(pa.string()), "/")
        return pa.table({
            "repo": t["source"],
            "path": paths,
            "commit": pa.array([""] * n, pa.string()),
            "lang": t["lang"],
            "content": t["text"],
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def exact_dup_groups(sf_dir: str) -> ray.data.Dataset:
    """A1 over documents: sha256 groups with >1 member.
    Columns (sha256, n_docs, min_doc_id) — names match the SQL oracle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def add_sha(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "sha256": pa.array(hashing.sha256_hex(t["text"].to_pylist()),
                               pa.string())})

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) <= 1:
            return pd.DataFrame({"sha256": pd.Series([], dtype=str),
                                 "n_docs": pd.Series([], dtype=np.int64),
                                 "min_doc_id": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"sha256": [g["sha256"].iloc[0]],
                             "n_docs": np.array([len(g)], np.int64),
                             "min_doc_id": np.array([g["doc_id"].min()], np.int64)})

    out_schema = pa.schema([("sha256", pa.string()), ("n_docs", pa.int64()),
                            ("min_doc_id", pa.int64())])

    def conform(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        return pa.table({f.name: t[f.name].cast(f.type) for f in out_schema},
                        schema=out_schema)

    grouped = (ds.map_batches(add_sha, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("sha256").map_groups(per_group, batch_format="pandas")
               .map_batches(conform, batch_format="pyarrow"))
    # a zero-match result must still carry the schema (Ray skips empty
    # blocks, so anchor it with an explicit empty Arrow block)
    return ray.data.from_arrow(out_schema.empty_table()).union(grouped)


def exact_dedup_keep_first(sf_dir: str) -> ray.data.Dataset:
    """A1+A4 over documents: keep the min doc_id per sha256 group —
    hash-partitioned 'first per key', no driver materialization."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def add_sha(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "sha256": pa.array(hashing.sha256_hex(t["text"].to_pylist()),
                               pa.string())})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": np.array([g["doc_id"].min()], np.int64)})

    return (ds.map_batches(add_sha, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("sha256").map_groups(keep_first, batch_format="pandas"))


def minhash_lsh_clusters(sf_dir: str, out_dir: str,
                         cfg: DedupConfig | None = None) -> ray.data.Dataset:
    """The full flagship pipeline (signatures -> salted LSH -> verify ->
    substring -> CC -> canonical) over documents. Returns
    (doc_id, cluster_id) with cluster_id = min doc_id of the component
    (stable, human-readable). Rows-only oracle (iterative/stateful)."""
    from .dedup import run_pipeline

    cfg = cfg or DedupConfig()
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)

    import os
    staged = os.path.join(out_dir, "_input")
    os.makedirs(staged, exist_ok=True)
    documents_as_files(sf_dir).write_parquet(staged)

    res = run_pipeline(staged, out_dir, cfg)
    clusters = res["clusters"]

    def doc_ids(t: pa.Table) -> pa.Table:
        dids = pc.cast(pc.utf8_slice_codeunits(t["path"], 4, 2**31 - 1),
                       pa.int64())
        return pa.table({"doc_id": dids, "cluster_key": t["cluster_id"]})

    labeled = clusters.map_batches(doc_ids, batch_format="pyarrow")

    def relabel(g: pd.DataFrame) -> pd.DataFrame:
        m = np.int64(g["doc_id"].min())
        return pd.DataFrame({"doc_id": g["doc_id"].astype(np.int64),
                             "cluster_id": np.full(len(g), m, np.int64)})

    return labeled.groupby("cluster_key").map_groups(relabel,
                                                     batch_format="pandas")


def simhash_groups(sf_dir: str, max_hamming: int = 3,
                   cfg: DedupConfig | None = None) -> ray.data.Dataset:
    """SimHash near-dup grouping: 64-bit SimHash per doc, banded into 4
    16-bit chunks (pigeonhole: Hamming<=3 pairs share at least one exact
    chunk), candidate pairs verified by exact Hamming, then co-grouped.
    Returns (doc_id, group_id = min doc_id). Rows-only oracle."""
    cfg = cfg or DedupConfig()

    def sigs(t: pa.Table) -> pa.Table:
        from ..functions import tokenize as tok
        out_id, out_sh = [], []
        for did, text, lang in zip(t["doc_id"].to_pylist(),
                                   t["text"].to_pylist(),
                                   t["lang"].to_pylist()):
            tokens = tok.tokenize(text, lang)
            th = np.array([hashing.token_hash64(x) for x in tokens],
                          dtype=np.uint64)
            sh = hashing.shingle_hashes(th, cfg.shingle_k)
            out_id.append(did)
            out_sh.append(mh.simhash64(sh))
        sh64 = np.array(out_sh, dtype=np.uint64).view(np.int64)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "simhash": pa.array(sh64, pa.int64())})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    sig = ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)

    def band(t: pa.Table) -> pa.Table:
        sh = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        bids, keys, dids, shs = [], [], [], []
        for chunk in range(4):
            part = (sh >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)
            bids.extend([chunk] * len(ids))
            keys.extend(int(x) for x in part)
            dids.extend(int(x) for x in ids)
            shs.extend(int(x) for x in sh.view(np.int64))
        bk = [f"{b}:{k}" for b, k in zip(bids, keys)]
        return pa.table({"band_key": pa.array(bk, pa.string()),
                         "doc_id": pa.array(dids, pa.int64()),
                         "simhash": pa.array(shs, pa.int64())})

    banded = sig.map_batches(band, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy(np.int64)
        sh = g["simhash"].to_numpy(np.int64).view(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        x = np.bitwise_xor(sh[:, None], sh[None, :])
        ham = np.unpackbits(
            x.view(np.uint8).reshape(len(ids), len(ids), 8), axis=2).sum(axis=2)
        r, c = np.nonzero(np.triu(ham <= max_hamming, k=1))
        return pd.DataFrame({"a": ids[r], "b": ids[c]})

    pairs = banded.groupby("band_key").map_groups(bucket_pairs,
                                                  batch_format="pandas")

    pdf = pairs.to_pandas().drop_duplicates()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pdf["a"], pdf["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = {x: find(x) for x in list(parent)}
    ref = ray.put(labels)

    def assign(t: pa.Table) -> pa.Table:
        lab = ray.get(ref)
        ids = t["doc_id"].to_pylist()
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "group_id": pa.array([lab.get(i, i) for i in ids],
                                              pa.int64())})

    return sig.map_batches(assign, batch_format="pyarrow")


def ngram_jaccard_pairs(sf_dir: str, n: int = 3,
                        tau: float = 0.1) -> ray.data.Dataset:
    """Exact word n-gram Jaccard pairs (a < b, jaccard >= tau) via the
    distributed inverted-index formulation: explode distinct n-grams,
    groupby(gram) emits co-occurrence pairs, groupby(pair) counts the
    intersection, per-doc distinct-gram counts are broadcast, Jaccard =
    i / (|A| + |B| - i). Exact (no LSH loss), so it hash-matches the
    DuckDB self-join oracle. Scale note: df-hot grams (stopword-ish)
    are the skew risk — at 100 TB add a document-frequency cap before
    pair-gen; kept exact here because the oracle joins all grams too."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def grams(t: pa.Table) -> pa.Table:
        out_d, out_g = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = text.split()
            gs = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
            out_d.extend([did] * len(gs))
            out_g.extend(gs)
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "gram": pa.array(out_g, pa.string())})

    from ..functions.groups import group_starts, partitioned_group_map

    exploded = ds.map_batches(grams, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # per-doc distinct gram counts — small (one int per doc), broadcast
    counts_df = (exploded.groupby("doc_id").count().to_pandas())
    doc_counts = dict(zip(counts_df["doc_id"].astype(int),
                          counts_df["count()"].astype(int)))
    cnt_ref = ray.put(doc_counts)

    def cooccur_block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64)})
        if df.empty:
            return empty
        df = df.sort_values(["gram", "doc_id"], kind="mergesort")
        g = df["gram"].to_numpy()
        d = df["doc_id"].to_numpy(np.int64)
        new = group_starts(g)
        bounds = np.append(np.flatnonzero(new), len(g))
        out_a, out_b = [], []
        for s in range(len(bounds) - 1):
            lo, hi = bounds[s], bounds[s + 1]
            if hi - lo >= 2:
                ids = d[lo:hi]  # already sorted, distinct per doc
                r, c = np.triu_indices(len(ids), k=1)
                out_a.append(ids[r])
                out_b.append(ids[c])
        if not out_a:
            return empty
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    pairs = partitioned_group_map(exploded, ["gram"], cooccur_block, 16,
                                  out_schema=pair_schema)

    def count_filter_block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64)})
        if df.empty:
            return empty
        cnts = ray.get(cnt_ref)
        df = df.sort_values(["a", "b"], kind="mergesort")
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        new = group_starts(a, b)
        gidx = np.cumsum(new, dtype=np.int32) - 1
        inter = np.bincount(gidx).astype(np.int64)
        ua, ub = a[new], b[new]
        ca = np.array([cnts[x] for x in ua], dtype=np.int64)
        cb = np.array([cnts[x] for x in ub], dtype=np.int64)
        union = ca + cb - inter
        keep = (union > 0) & (inter / np.maximum(union, 1) >= tau)
        return pd.DataFrame({"a": ua[keep], "b": ub[keep]})

    return partitioned_group_map(pairs, ["a", "b"], count_filter_block, 16,
                                 out_schema=pair_schema)
