"""Signature stage: the flagship stateful actor-pool map_batches stage.

Analog of ``process_single_image`` composition (validate -> crypto hash
-> perceptual hash, with timeouts and fallbacks) at
/root/reference/crates/image-deduper-core/src/processing/utils/image_processor.rs:12-72,
run per batch by ``process_image_batch``
(src/processing/utils/batch_processor.rs:30-69). Here it is one
``map_batches(SignatureStage, batch_format="pyarrow", concurrency=N)``:

  __init__ (once per actor): MinHash permutation coefficients, token
  hash cache, compiled regexes — the reference rebuilds none of this
  per file either (ST1 in SURVEY.md §2.3).
  __call__ (per batch): validate (M16/M17) -> sha256 (M1) -> tokenize
  via lang registry (M5) -> MinHash 128 (M3) + SimHash 64 (M2), with
  the windowed path for oversized rows (M6/M7, file_processing.rs:44-179),
  fallback signature for binary/unparseable rows (M8,
  file_processing.rs:182-200), junk-prefix recovery (M9, jpeg.rs:8-66),
  and a cooperative per-row time budget with poison memo (ST2/ST4,
  hash_computation_with_timeout.rs:19-42, timeout_utils.rs:63-153) —
  rows never throw; failures become the ``sig_kind``/``error`` columns.

Output schema (content is DROPPED here — SURVEY.md §7.4 'wide rows'):
  repo, path, commit, lang, file_id, sha256, n_bytes, n_tokens,
  n_shingles, simhash: uint64, minhash: binary (P packed u64s),
  sig_kind: {ok, fallback, empty}, error
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..functions import hashing, minhash as mh, tokenize as tok


class SignatureStage:
    def __init__(self, config: DedupConfig):
        self.cfg = config
        self.a, self.b = mh.make_perms(config.num_perms, config.minhash_seed)
        self.token_cache = hashing.TokenHashCache()
        self.poison: set[str] = set()  # ST2: per-actor skip memo
        # ST3 (ImageCache analog, types.rs:78-113): identical content is
        # signed once per worker — keyed by sha256, bounded, cleared at
        # capacity like the reference's cache
        self.sig_cache: dict[str, tuple] = {}

    # -- per-row kernel (strings force a row loop; all arithmetic inside
    #    is vectorized numpy over the row's shingles) --
    def _row_signature(self, repo: str, path: str, lang: str, content: str,
                       n_bytes: int) -> tuple[np.ndarray, int, int, int, str, str]:
        cfg = self.cfg
        if n_bytes == 0:
            return (np.zeros(cfg.num_perms, np.uint64), 0, 0, 0, "empty", "")
        key = f"{repo}\x1f{path}"
        if key in self.poison:
            sh = hashing.fallback_shingles(repo, path, n_bytes)
            sig = mh.minhash_signature(sh, self.a, self.b)
            return (sig, mh.simhash64(sh), 0, 1, "fallback", "poisoned")
        t0 = time.monotonic()
        if len(content) > cfg.max_content_bytes:
            # windowed path (M6/M7): signature over the deterministic
            # prefix window instead of the full body.
            content = content[: cfg.max_content_bytes]
        tokens = tok.tokenize(content, lang)
        if not tokens:
            sh = hashing.fallback_shingles(repo, path, n_bytes)
            sig = mh.minhash_signature(sh, self.a, self.b)
            return (sig, mh.simhash64(sh), 0, 1, "fallback",
                    "binary-or-empty-after-normalize")
        th = self.token_cache.hash_tokens(tokens)
        shingles = hashing.shingle_hashes(th, cfg.shingle_k)
        if cfg.shingle_stride > 1 and len(shingles) > cfg.shingle_stride:
            # fast mode (ultra_fast_phash analog, core.rs:158-199):
            # strided sample of the sorted shingle set
            shingles = shingles[:: cfg.shingle_stride]
        sig = mh.minhash_signature(shingles, self.a, self.b)
        simh = mh.simhash64(shingles)
        if time.monotonic() - t0 > cfg.row_time_budget_s:
            # cooperative budget exceeded: poison the key so a retry of
            # this task (or a later batch) falls back instantly.
            self.poison.add(key)
        return (sig, simh, len(tokens), len(shingles), "ok", "")

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        commits = batch["commit"].to_pylist()
        langs = batch["lang"].to_pylist()
        contents = batch["content"].to_pylist()
        n = len(repos)

        sha = hashing.sha256_hex(contents)
        fids = hashing.file_ids(repos, paths, commits)
        n_bytes = np.array([len(c.encode("utf-8", "surrogatepass")) for c in contents],
                           dtype=np.int64)

        sigs = np.empty((n, cfg.num_perms), dtype=np.uint64)
        simhashes = np.empty(n, dtype=np.uint64)
        n_tokens = np.empty(n, dtype=np.int64)
        n_shingles = np.empty(n, dtype=np.int64)
        kinds: list[str] = []
        errors: list[str] = []
        cache = self.sig_cache
        for i in range(n):
            hit = cache.get(sha[i])
            if hit is not None and hit[4] == "ok":
                sig, simh, nt, ns, kind, err = hit
            else:
                sig, simh, nt, ns, kind, err = self._row_signature(
                    repos[i], paths[i], langs[i], contents[i], int(n_bytes[i]))
                if kind == "ok":  # fallback/poison results are identity-specific
                    if len(cache) > self.cfg.sig_cache_capacity:
                        cache.clear()
                    cache[sha[i]] = (sig, simh, nt, ns, kind, err)
            sigs[i] = sig
            simhashes[i] = np.uint64(simh)
            n_tokens[i] = nt
            n_shingles[i] = ns
            kinds.append(kind)
            errors.append(err)

        # packed little-endian u64s (the analog of the reference's packed
        # u64 phash serialization, db.rs:287-331); plain binary so the
        # column survives Acero hash joins as a payload field.
        minhash_col = pa.array([sigs[i].tobytes() for i in range(n)], pa.binary())
        return pa.table({
            "repo": batch["repo"], "path": batch["path"],
            "commit": batch["commit"], "lang": batch["lang"],
            "file_id": pa.array(fids, pa.string()),
            "sha256": pa.array(sha, pa.string()),
            "n_bytes": pa.array(n_bytes),
            "n_tokens": pa.array(n_tokens),
            "n_shingles": pa.array(n_shingles),
            "simhash": pa.array(simhashes.view(np.int64)),  # int64 bit-view: Ray groupby chokes on uint64
            "minhash": minhash_col,
            "sig_kind": pa.array(kinds, pa.string()),
            "error": pa.array(errors, pa.string()),
        })
