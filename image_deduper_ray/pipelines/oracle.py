"""Single-process reference-semantics oracle.

Plays the role of the reference's golden-hash conformance tests
(/root/reference/crates/image-deduper-core/src/processing/processing_tests.rs:29-127):
a small, pure-Python, all-pairs implementation of the identical
shingle/signature config (same tokenize, same shingle hash, same
MinHash perms) whose threshold grouping defines the "reference
clusters" that the distributed engine must match at dup-pair recall
>= 0.99 (BASELINE.md). All-pairs means it has NO LSH recall loss, so
it strictly upper-bounds the engine's pair set.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..config import DedupConfig, DEFAULT_CONFIG
from ..functions import hashing, minhash as mh, tokenize as tok


def oracle_signatures(table: pa.Table, cfg: DedupConfig = DEFAULT_CONFIG) -> dict:
    """file_id -> dict(sig, sha256, n_bytes, meta…) — same kernels as the
    distributed SignatureStage, minus the distribution."""
    a, b = mh.make_perms(cfg.num_perms, cfg.minhash_seed)
    out = {}
    for row in table.to_pylist():
        content = row["content"]
        n_bytes = len(content.encode("utf-8", "surrogatepass"))
        fid = hashing.file_ids([row["repo"]], [row["path"]], [row["commit"]])[0]
        sha = hashlib.sha256(content.encode("utf-8", "surrogatepass")).hexdigest()
        if n_bytes == 0:
            sig, kind = np.zeros(cfg.num_perms, np.uint64), "empty"
        else:
            body = content[: cfg.max_content_bytes]
            tokens = tok.tokenize(body, row["lang"])
            if not tokens:
                sh = hashing.fallback_shingles(row["repo"], row["path"], n_bytes)
                sig, kind = mh.minhash_signature(sh, a, b), "fallback"
            else:
                th = np.array([hashing.token_hash64(t) for t in tokens], dtype=np.uint64)
                sh = hashing.shingle_hashes(th, cfg.shingle_k)
                sig, kind = mh.minhash_signature(sh, a, b), "ok"
        out[fid] = {"sig": sig, "sha256": sha, "n_bytes": n_bytes,
                    "sig_kind": kind, "content": content,
                    "repo": row["repo"], "path": row["path"],
                    "commit": row["commit"]}
    return out


def oracle_pairs(sigs: dict, cfg: DedupConfig = DEFAULT_CONFIG,
                 containment_min_len: int = 64) -> set[tuple[str, str]]:
    """All dup pairs under reference semantics: sha-equal OR estimated
    Jaccard >= tau OR verbatim containment. All-pairs, no LSH."""
    fids = sorted(sigs)
    pairs: set[tuple[str, str]] = set()
    for i in range(len(fids)):
        si = sigs[fids[i]]
        if si["sig_kind"] == "empty":
            continue
        for j in range(i + 1, len(fids)):
            sj = sigs[fids[j]]
            if sj["sig_kind"] == "empty":
                continue
            dup = False
            if si["sha256"] == sj["sha256"]:
                dup = True
            elif si["sig_kind"] == "ok" and sj["sig_kind"] == "ok":
                if mh.est_jaccard(si["sig"], sj["sig"]) >= cfg.jaccard_threshold:
                    dup = True
                else:
                    small, big = ((si, sj) if len(si["content"]) <= len(sj["content"])
                                  else (sj, si))
                    if (len(small["content"]) >= containment_min_len
                            and small["content"] in big["content"]):
                        dup = True
            if dup:
                pairs.add((fids[i], fids[j]))
    return pairs


def oracle_clusters(table: pa.Table, cfg: DedupConfig = DEFAULT_CONFIG) -> dict[str, str]:
    """file_id -> cluster_id (min file_id per component), union-find
    over the oracle pair set; singletons map to themselves."""
    sigs = oracle_signatures(table, cfg)
    pairs = oracle_pairs(sigs, cfg)
    parent = {f: f for f in sigs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {f: find(f) for f in sigs}


def dup_pair_recall(engine_clusters: dict[str, str],
                    ref_pairs: set[tuple[str, str]]) -> float:
    """Fraction of reference dup pairs co-clustered by the engine —
    the BASELINE.md >= 0.99 metric."""
    if not ref_pairs:
        return 1.0
    hit = sum(1 for a, b in ref_pairs
              if engine_clusters.get(a) is not None
              and engine_clusters.get(a) == engine_clusters.get(b))
    return hit / len(ref_pairs)
