"""Text-analysis operators over the ``documents`` table.

The training-data-pipeline companions to the dedup engine: token
counting, quality scoring, language ID, document fingerprinting. Each is
a single vectorized ``map_batches`` stage (pyarrow.compute kernels, no
Python row loops in the hot path) so the same code streams at 100 TB:
no shuffle, no materialization, column-pruned reads.

The per-row projections are the code-table analogs of the reference's
metadata/validation projections (get_file_metadata,
/root/reference/crates/image-deduper-core/src/discovery/mod.rs:119-128;
validate_file_size, src/processing/utils/file_validation.rs:37-79) and
the mislabel QA scan (examples/fixsuffix.rs:13-60).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DOCS_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]

# Shared with the DuckDB oracle: both sides are RE2, so semantics match.
_WS_TOKEN_RE = r"\S+"
_PUNCT_RE = r"[.!?,;:]"
_STOPWORD_RE = r"\b(the|a|and|of|in|to|is|for|on|with)\b"
_NORM_WS_RE = r"\s+"


def read_documents(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=columns or DOCS_COLUMNS)


_SUBTOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_count(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_subtokens) — whitespace tokens plus a
    BPE-ish pre-tokenizer count (letter runs / digit runs / one token
    per punctuation byte: the GPT-2-style split shape, a cheap proxy
    for model token cost). Both are single vectorized RE2 counts —
    identical regex semantics in Arrow and the DuckDB oracle."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], _WS_TOKEN_RE)
        s = pc.count_substring_regex(t["text"], _SUBTOKEN_RE)
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": n.cast(pa.int64()),
                         "n_subtokens": s.cast(pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    """Integer quality components per doc: lengths, punctuation count,
    stopword hits. Ratios are derived downstream (kept integral here so
    the result is hash-stable against the SQL oracle)."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        text = t["text"]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars_actual": pc.utf8_length(text).cast(pa.int64()),
            "n_tokens": pc.count_substring_regex(text, _WS_TOKEN_RE).cast(pa.int64()),
            "n_punct": pc.count_substring_regex(text, _PUNCT_RE).cast(pa.int64()),
            "n_stopwords": pc.count_substring_regex(
                pc.utf8_lower(text), _STOPWORD_RE).cast(pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, fp) — whitespace-normalized lowercase sha256 fingerprint:
    the 'same document modulo formatting' key (the text analog of the
    reference's format-invariant pHash expectation,
    src/processing/processing_tests.rs:93-127)."""
    import hashlib

    ds = read_documents(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        # collapse ALL runs of \s to one space, then strip the (single)
        # leading/trailing space — identical on the DuckDB oracle side as
        # trim(regexp_replace(text, '\s+', ' ', 'g'), ' '); avoids the
        # utf8_trim_whitespace-vs-trim() whitespace-set mismatch.
        norm = pc.utf8_lower(
            pc.utf8_trim(pc.replace_substring_regex(t["text"],
                                                    _NORM_WS_RE, " "), " "))
        fps = [hashlib.sha256(s.encode("utf-8", "surrogatepass")).hexdigest()
               for s in norm.to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "fp": pa.array(fps, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# --- language ID: n-gram/stopword heuristic (no model deps) ----------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with", "for"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "les", "des", "est", "une"),
    "es": ("el", "los", "las", "una", "que", "para"),
}


def _predict_langs(t: pa.Table) -> pa.Array:
    """Vectorized language prediction for a batch: one regex count per
    language + a CJK codepoint check. Shared by lang_id and
    mislabel_flags so both stay single-pass."""
    import numpy as np

    markers = {lang: r"\b(" + "|".join(words) + r")\b"
               for lang, words in _LANG_MARKERS.items()}
    low = pc.utf8_lower(t["text"])
    scores = np.stack([
        pc.count_substring_regex(low, pat).cast(pa.int64())
        .to_numpy(zero_copy_only=False)
        for pat in markers.values()])
    langs = np.array(list(markers))
    best = langs[scores.argmax(axis=0)]
    hit = scores.max(axis=0) > 0
    cjk = pc.count_substring_regex(t["text"], r"[\x{4e00}-\x{9fff}]") \
        .cast(pa.int64()).to_numpy(zero_copy_only=False) > 0
    pred = np.where(cjk, "zh", np.where(hit, best, "und"))
    return pa.array(pred.tolist(), pa.string())


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, lang_pred) — stopword-marker vote + CJK codepoint check.
    A heuristic operator: one vectorized pass, one regex count per
    language."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "lang_pred": _predict_langs(t)})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def mislabel_flags(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, lang, lang_pred, mismatch) — claimed vs sniffed language,
    the fixsuffix QA projection (examples/fixsuffix.rs:13-60 analog).
    Single pass: prediction and claimed label come from the same read —
    no self-join of the table on doc_id."""
    ds = read_documents(sf_dir, ["doc_id", "lang", "text"])

    def flag(t: pa.Table) -> pa.Table:
        pred = _predict_langs(t)
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "lang_pred": pred,
            "mismatch": pc.invert(pc.equal(t["lang"], pred))})

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


# --- corpus-level token statistics (vocabulary / heavy hitters) ------


def token_counts_by_lang(sf_dir: str,
                         num_partitions: int | None = None) -> ray.data.Dataset:
    """(lang, token, n) — exact global token frequencies, the shared
    input of the heavy-hitter and vocabulary operators. Combiner-first
    shape: each batch pre-aggregates its own (lang, token) counts (a
    C-speed pandas hash groupby), so only DISTINCT per-batch pairs cross
    the wire; the shuffle then hash-partitions on (lang, token) and sums
    partials per partition — the classic partial-agg-then-small-groupby
    discipline. Tokenization is RE2 ``\\S+`` on both sides (Arrow
    ``split_pattern_regex('\\s+')`` with boundary empties dropped ==
    DuckDB ``regexp_extract_all('\\S+')``)."""
    import numpy as np

    from ..functions.groups import partitioned_sum

    ds = read_documents(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "token": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, pattern=_NORM_WS_RE)
        flat = toks.flatten()
        row_idx = np.repeat(np.arange(t.num_rows),
                            np.diff(toks.offsets.to_numpy()))
        keep = pc.not_equal(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False)
        if not keep.any():
            return empty
        import pandas as pd
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False)[row_idx[keep]],
            "token": flat.filter(pa.array(keep)).to_pandas()})
        cnt = df.groupby(["lang", "token"], sort=False).size().reset_index(name="n")
        return pa.table({"lang": pa.array(cnt["lang"], pa.string()),
                         "token": pa.array(cnt["token"], pa.string()),
                         "n": pa.array(cnt["n"].to_numpy(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("lang", pa.string()), ("token", pa.string()),
                            ("n", pa.int64())])
    return partitioned_sum(partials, ["lang", "token"], "n",
                           num_partitions, out_schema=out_schema,
                           out_name="n")


def topk_tokens(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """(lang, token, n, rank) — the k most frequent tokens per language
    (heavy hitters), rank deterministic on (n desc, token asc). Stage 2
    partitions the ALREADY-AGGREGATED (vocab-sized, not corpus-sized)
    count table by lang so each language's top-k is exact in one
    vectorized block."""
    import numpy as np
    import pandas as pd

    from ..functions.groups import partitioned_group_map, segmented_rank

    counts = token_counts_by_lang(sf_dir)
    out_schema = pa.schema([("lang", pa.string()), ("token", pa.string()),
                            ("n", pa.int64()), ("rank", pa.int64())])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "token": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64),
                                 "rank": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["lang", "n", "token"],
                            ascending=[True, False, True], kind="mergesort")
        rank = segmented_rank(df["lang"].to_numpy())
        keep = rank <= k
        return pd.DataFrame({"lang": df["lang"].to_numpy()[keep],
                             "token": df["token"].to_numpy()[keep],
                             "n": df["n"].to_numpy(np.int64)[keep],
                             "rank": rank[keep]})

    return partitioned_group_map(counts, ["lang"], block, 8,
                                 out_schema=out_schema)


def vocab_stats(sf_dir: str) -> ray.data.Dataset:
    """(lang, n_distinct, n_total, n_hapax) — vocabulary size, total
    token volume and hapax-legomena count per language, reduced from the
    same exact count table as ``topk_tokens``. The distinct count is
    exact (token strings, not hashes, cross the combiner shuffle — the
    per-batch pre-dedup bounds the volume)."""
    import numpy as np
    import pandas as pd

    from ..functions.groups import group_starts, partitioned_group_map

    counts = token_counts_by_lang(sf_dir)
    out_schema = pa.schema([("lang", pa.string()),
                            ("n_distinct", pa.int64()),
                            ("n_total", pa.int64()),
                            ("n_hapax", pa.int64())])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "n_distinct": pd.Series([], dtype=np.int64),
                                 "n_total": pd.Series([], dtype=np.int64),
                                 "n_hapax": pd.Series([], dtype=np.int64)})
        df = df.sort_values("lang", kind="mergesort")
        lang = df["lang"].to_numpy()
        n = df["n"].to_numpy(np.int64)
        new = group_starts(lang)
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(lang))).astype(np.int64)
        return pd.DataFrame({
            "lang": lang[starts],
            "n_distinct": sizes,
            "n_total": np.add.reduceat(n, starts),
            "n_hapax": np.add.reduceat((n == 1).astype(np.int64), starts)})

    return partitioned_group_map(counts, ["lang"], block, 8,
                                 out_schema=out_schema)


def token_quantiles(sf_dir: str,
                    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
                    ) -> ray.data.Dataset:
    """(lang, p25, p50, p75, p90, p99) — exact per-language quantiles of
    per-doc token counts via a distributed HISTOGRAM, not a sort: token
    counts have bounded cardinality, so each batch emits partial
    (lang, n_tokens, cnt) rows, one hash-partitioned sum merges them,
    and the per-lang quantile reads off the cumulative histogram. The
    quantile rule is DuckDB's ``quantile_disc`` (Type-1: value at
    1-based position ``ceil(q * n)``), so the result hash-matches the
    SQL oracle."""
    import numpy as np
    import pandas as pd

    from ..functions.groups import (group_starts, partitioned_group_map,
                                    partitioned_sum)

    ds = read_documents(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "n_tokens": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        n = pc.count_substring_regex(t["text"], _WS_TOKEN_RE) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"lang": t["lang"].to_numpy(zero_copy_only=False),
                           "n_tokens": n})
        cnt = df.groupby(["lang", "n_tokens"], sort=False).size() \
            .reset_index(name="cnt")
        return pa.table({"lang": pa.array(cnt["lang"], pa.string()),
                         "n_tokens": pa.array(cnt["n_tokens"].to_numpy(np.int64)),
                         "cnt": pa.array(cnt["cnt"].to_numpy(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    hist = partitioned_sum(
        partials, ["lang", "n_tokens"], "cnt", None,
        out_schema=pa.schema([("lang", pa.string()),
                              ("n_tokens", pa.int64()),
                              ("cnt", pa.int64())]), out_name="cnt")

    q_names = [f"p{int(q * 100)}" for q in qs]
    out_schema = pa.schema([("lang", pa.string())] +
                           [(nm, pa.int64()) for nm in q_names])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 **{nm: pd.Series([], dtype=np.int64)
                                    for nm in q_names}})
        df = df.sort_values(["lang", "n_tokens"], kind="mergesort")
        lang = df["lang"].to_numpy()
        vals = df["n_tokens"].to_numpy(np.int64)
        cnt = df["cnt"].to_numpy(np.int64)
        bounds = np.append(np.flatnonzero(group_starts(lang)), len(lang))
        rows: dict[str, list] = {"lang": [], **{nm: [] for nm in q_names}}
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            cum = np.cumsum(cnt[lo:hi])
            total = cum[-1]
            rows["lang"].append(lang[lo])
            for q, nm in zip(qs, q_names):
                # quantile_disc: 1-based position ceil(q*n), float ceil
                # mirroring DuckDB's double arithmetic
                pos = int(np.ceil(np.float64(q) * total))
                j = int(np.searchsorted(cum, max(pos, 1)))
                rows[nm].append(vals[lo:hi][j])
        return pd.DataFrame({"lang": rows["lang"],
                             **{nm: np.array(rows[nm], np.int64)
                                for nm in q_names}})

    return partitioned_group_map(hist, ["lang"], block, 8,
                                 out_schema=out_schema)


def top_docs(sf_dir: str, limit: int = 25) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_stopwords, rank) — global top-N documents by
    stopword ratio (a stand-in quality ranking) WITHOUT a global sort:
    each batch keeps its local top-N candidates (one vectorized lexsort,
    ties kept by doc_id), then one single-group reduce ranks the tiny
    candidate union exactly. The ratio is float64 division of the same
    integers on both sides, so ordering (and the hash) matches the SQL
    oracle bit-for-bit."""
    import numpy as np
    import pandas as pd

    from ..functions.groups import partitioned_group_map

    ds = read_documents(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "n_stopwords": pa.array([], pa.int64()),
                          "g": pa.array([], pa.int8())})
        if t.num_rows == 0:
            return empty
        n_tok = pc.count_substring_regex(t["text"], _WS_TOKEN_RE) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_sw = pc.count_substring_regex(
            pc.utf8_lower(t["text"]), _STOPWORD_RE) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = n_tok > 0
        ids, n_tok, n_sw = ids[ok], n_tok[ok], n_sw[ok]
        if len(ids) == 0:
            return empty
        ratio = n_sw / n_tok
        order = np.lexsort((ids, -ratio))[:limit]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "n_tokens": pa.array(n_tok[order]),
                         "n_stopwords": pa.array(n_sw[order]),
                         "g": pa.array(np.zeros(len(order), np.int8))})

    cands = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    out_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                            ("n_stopwords", pa.int64()), ("rank", pa.int64())])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "n_tokens": pd.Series([], dtype=np.int64),
                                 "n_stopwords": pd.Series([], dtype=np.int64),
                                 "rank": pd.Series([], dtype=np.int64)})
        ids = df["doc_id"].to_numpy(np.int64)
        n_tok = df["n_tokens"].to_numpy(np.int64)
        n_sw = df["n_stopwords"].to_numpy(np.int64)
        order = np.lexsort((ids, -(n_sw / n_tok)))[:limit]
        return pd.DataFrame({"doc_id": ids[order],
                             "n_tokens": n_tok[order],
                             "n_stopwords": n_sw[order],
                             "rank": np.arange(1, len(order) + 1,
                                               dtype=np.int64)})

    # single logical group ("g" is constant): the reduce input is at most
    # limit x num_blocks rows — bounded by construction, not by luck
    return partitioned_group_map(cands, ["g"], final, 2,
                                 out_schema=out_schema)


def stratified_sample(sf_dir: str, per_stratum: int = 50) -> ray.data.Dataset:
    """Deterministic per-stratum quota sample: within each ``lang``,
    keep the ``per_stratum`` docs that sort first in md5(doc_id) hash
    order (tie -> doc_id). Hash-order selection makes the sample stable
    across reruns, row order, partitioning and cluster topology — the
    reproducibility property a training-data curation pass needs and a
    ``random_shuffle().limit()`` sample has none of. One narrow-column
    scan, one hash-partitioned shuffle on the stratum key, vectorized
    segmented rank per partition. Returns (doc_id, lang)."""
    import hashlib

    import numpy as np
    import pandas as pd

    from ..functions.groups import partitioned_group_map, segmented_rank

    ds = read_documents(sf_dir, ["doc_id", "lang"])

    def add_hkey(t: pa.Table) -> pa.Table:
        # per-row hashlib.md5 is deliberate: the selection order must
        # equal DuckDB's md5(CAST(doc_id AS VARCHAR)) byte-for-byte for
        # the driver oracle, and md5 has no numpy kernel. The loop is
        # C-speed over one short string per row and this is a
        # narrow-column sampling scan, not a hot path (0.2 s per
        # million rows measured); a non-oracle deployment would swap in
        # the vectorized fid64/splitmix hash.
        hk = [hashlib.md5(str(d).encode()).hexdigest()
              for d in t["doc_id"].to_pylist()]
        return t.append_column("hkey", pa.array(hk, pa.string()))

    out_schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "lang": pd.Series([], dtype=object)})
        df = df.sort_values(["lang", "hkey", "doc_id"], kind="mergesort")
        lang = df["lang"].to_numpy()
        keep = segmented_rank(lang) <= per_stratum
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64)[keep],
                             "lang": lang[keep]})

    keyed = ds.map_batches(add_hkey, batch_format="pyarrow",
                           zero_copy_batch=True)
    return partitioned_group_map(keyed, ["lang"], block, 8,
                                 out_schema=out_schema)


# --- LLM-data curation: decontamination, repetition, PII ---------------

def decontaminate(sf_dir: str, n: int = 5,
                  bench_mod: int = 29,
                  max_bench_bytes: int = 256 << 20) -> ray.data.Dataset:
    """Benchmark decontamination flags: (doc_id, n_hit_grams,
    contaminated) — how many of a doc's DISTINCT word ``n``-grams occur
    in the benchmark set's gram vocabulary (any hit = contaminated,
    the standard train/test-overlap scrub for LLM corpora).

    The benchmark here is the deterministic slice ``doc_id % bench_mod
    == 0`` of the same table, standing in for an external eval set —
    which is exactly the 100-TB shape: the benchmark side is SMALL by
    nature, so its gram vocabulary is collected once (byte-capped),
    broadcast via ``ray.put``, and the corpus-side scan is one
    stateless vectorized ``map_batches`` with a C-speed ``is_in`` probe
    per batch — no shuffle, no join, the corpus streams. A benchmark
    vocabulary past the byte cap raises (callers must shard the
    benchmark or raise the cap) rather than silently degrading."""
    import numpy as np
    import ray

    from .docdedup import _distinct_word_ngrams_batch

    def bench_grams(t: pa.Table) -> pa.Table:
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(dids % bench_mod == 0))
        if t.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.string())})
        _, gram = _distinct_word_ngrams_batch(t, n)
        if gram is None:
            return pa.table({"gram": pa.array([], pa.string())})
        return pa.table({"gram": pa.array(np.unique(gram), pa.string())})

    vocab: set[str] = set()
    total = 0
    # materialize before the driver loop: the collect must not throttle
    # the corpus scan to single-threaded driver consumption (the
    # benchmark gram table is small by construction)
    bds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        bench_grams, batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    for b in bds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for g in b["gram"].to_pylist() if b.num_rows else []:
            if g not in vocab:
                vocab.add(g)
                total += len(g)
        if total > max_bench_bytes:
            raise ValueError(
                "benchmark gram vocabulary exceeds the broadcast budget; "
                "shard the benchmark or raise max_bench_bytes")
    vocab_ref = ray.put(pa.array(sorted(vocab), pa.string()))

    def scan(t: pa.Table) -> pa.Table:
        import numpy as np
        vs = ray.get(vocab_ref)
        hits = np.zeros(t.num_rows, np.int64)
        d, gram = _distinct_word_ngrams_batch(t, n)
        if d is not None and len(d) and len(vs):
            hit = pc.is_in(pa.array(gram, pa.string()), value_set=vs) \
                .to_numpy(zero_copy_only=False)
            np.add.at(hits, d[hit], 1)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_hit_grams": pa.array(hits),
            "contaminated": pa.array(hits > 0)})

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True)


def dedup_against_reference(sf_dir: str, ref_mod: int = 31,
                            max_ref_bytes: int = 256 << 20
                            ) -> ray.data.Dataset:
    """Cross-corpus EXACT dedup by content hash: drop every corpus doc
    whose sha256(text) appears in the reference set — the hash-match
    decontamination / already-trained-on scrub that complements the
    n-gram overlap flagging of ``decontaminate``. Returns the SURVIVORS
    (doc_id, sha256).

    The reference here is the deterministic slice ``doc_id % ref_mod
    == 0`` of the same table (standing in for an external corpus), so
    matched == the slice's texts; at 100 TB the reference side is small
    by nature: its distinct hashes are collected once (byte-capped,
    raises past the cap — never silently degrades), broadcast via
    ``ray.put`` as ONE Arrow array (zero-copy through plasma), and the
    corpus streams through a stateless is_in probe — no shuffle."""
    import numpy as np
    import ray

    from ..functions import hashing

    def sha_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sha256": pa.array([], pa.string())})
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "sha256": pa.array(hashing.sha256_hex(t["text"].to_pylist()),
                               pa.string())})

    def ref_only(t: pa.Table) -> pa.Table:
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(dids % ref_mod == 0))

    ref_hashes: set[str] = set()
    rds = read_documents(sf_dir, ["doc_id", "text"]) \
        .map_batches(ref_only, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .map_batches(sha_rows, batch_format="pyarrow",
                     zero_copy_batch=True).materialize()
    for b in rds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_rows:
            ref_hashes.update(b["sha256"].to_pylist())
        if len(ref_hashes) * 64 > max_ref_bytes:
            raise ValueError(
                "reference hash set exceeds the broadcast budget; "
                "shard the reference or raise max_ref_bytes")
    ref_ref = ray.put(pa.array(sorted(ref_hashes), pa.string()))

    def scan(t: pa.Table) -> pa.Table:
        h = sha_rows(t)
        if h.num_rows == 0:
            return h
        vs = ray.get(ref_ref)
        if len(vs) == 0:
            return h
        hit = pc.is_in(h["sha256"], value_set=vs)
        return h.filter(pc.invert(hit))

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True)


NORM_DUP_SEED_OFFSET = 10_000_000


def normalized_dup_groups(sf_dir: str,
                          seed_dup_mod: int | None = 13
                          ) -> ray.data.Dataset:
    """Exact dedup AFTER text normalization (lowercase, collapse runs
    of whitespace to one space, trim) — the C4/RefinedWeb-style pass
    that catches trivially-reformatted duplicates a raw content hash
    misses. Returns (norm_sha256, n_docs, min_doc_id) for groups > 1.

    The synthetic corpora have no reformat twins, so the battery
    variant unions a re-keyed (+NORM_DUP_SEED_OFFSET) WHITESPACE-mutated
    copy ('\\t' prefix, doubled internal spaces, trailing ' \\n') of
    every ``doc_id % seed_dup_mod == 0`` doc — mutations chosen to be
    literal-replace reproducible in SQL, so the oracle applies the same
    mutation and normalization and the normalizer must collapse each
    pair into one group. Normalization itself runs on EVERY doc (the
    lower/collapse kernels' DuckDB parity is part of what the hash
    checks)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..functions import hashing
    from ..functions.groups import group_starts, partitioned_group_map

    ds = read_documents(sf_dir, ["doc_id", "text"])

    def add_norm_sha(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "norm_sha256": pa.array([], pa.string())})
        dids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if seed_dup_mod:
            if len(dids) and int(dids.max()) >= NORM_DUP_SEED_OFFSET:
                raise ValueError("seeded ids would collide with real ones")
            m = dids % seed_dup_mod == 0
            mutated = pc.binary_join_element_wise(
                "\t", pc.replace_substring(text.filter(pa.array(m)),
                                           " ", "  "), " \n", "")
            text = pa.concat_arrays([text, mutated.combine_chunks()
                                     if isinstance(mutated, pa.ChunkedArray)
                                     else mutated])
            dids = np.concatenate([dids, dids[m] + NORM_DUP_SEED_OFFSET])
        norm = pc.utf8_trim(pc.replace_substring_regex(
            pc.utf8_lower(text), r"\s+", " "), " ")
        sha = hashing.sha256_hex(norm.to_pylist())
        return pa.table({"doc_id": pa.array(dids),
                         "norm_sha256": pa.array(sha, pa.string())})

    out_schema = pa.schema([("norm_sha256", pa.string()),
                            ("n_docs", pa.int64()),
                            ("min_doc_id", pa.int64())])

    def groups_block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"norm_sha256": pd.Series([], dtype=str),
                              "n_docs": pd.Series([], dtype=np.int64),
                              "min_doc_id": pd.Series([], dtype=np.int64)})
        if df.empty:
            return empty
        df = df.sort_values(["norm_sha256", "doc_id"], kind="mergesort")
        sha = df["norm_sha256"].to_numpy()
        ids = df["doc_id"].to_numpy(np.int64)
        bounds = np.append(np.flatnonzero(group_starts(sha)), len(sha))
        sizes = np.diff(bounds).astype(np.int64)
        keep = sizes > 1
        if not keep.any():
            return empty
        lo = bounds[:-1][keep]
        return pd.DataFrame({"norm_sha256": sha[lo], "n_docs": sizes[keep],
                             "min_doc_id": ids[lo]})

    grouped = partitioned_group_map(
        ds.map_batches(add_norm_sha, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["norm_sha256"], groups_block, None, out_schema=out_schema)
    return ray.data.from_arrow(out_schema.empty_table()).union(grouped)


def repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_lines, n_distinct_lines) — the duplicate-line signal
    quality filters cut on (boilerplate/template pages repeat lines;
    cf. Gopher's repetition heuristics). Lines are '\\n' splits with
    empties KEPT, matching DuckDB ``string_split`` exactly. Vectorized:
    one Arrow split per batch, flat (doc, line) dedupe, two bincounts —
    no per-row Python."""
    import numpy as np
    import pandas as pd

    ds = read_documents(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_lines": pa.array([], pa.int64()),
                             "n_distinct_lines": pa.array([], pa.int64())})
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lines = pc.split_pattern(col, "\n")
        counts = np.diff(lines.offsets.to_numpy()).astype(np.int64)
        flat = lines.flatten()
        doc_idx = np.repeat(np.arange(t.num_rows), counts)
        dd = pd.DataFrame({"d": doc_idx, "l": flat.to_pandas()}) \
            .drop_duplicates()
        distinct = np.bincount(dd["d"].to_numpy(),
                               minlength=t.num_rows).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_lines": pa.array(counts),
                         "n_distinct_lines": pa.array(distinct)})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# RE2 on both sides (Arrow and DuckDB), so counts agree byte for byte.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_counts(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_emails, n_urls, n_ipv4) — PII/link density per doc,
    the scrub-or-drop signal of a curation pass. Three vectorized RE2
    counts per batch; the redaction variant would be the same kernels
    with replace_substring_regex."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        text = t["text"]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_emails": pc.count_substring_regex(
                text, _EMAIL_RE).cast(pa.int64()),
            "n_urls": pc.count_substring_regex(
                text, _URL_RE).cast(pa.int64()),
            "n_ipv4": pc.count_substring_regex(
                text, _IPV4_RE).cast(pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def lang_token_outliers(sf_dir: str, k: int = 1) -> ray.data.Dataset:
    """(doc_id, lang, n_tokens) for documents whose whitespace token
    count deviates from their language's mean by more than ``k``
    standard deviations — the per-group statistical outlier flag a
    quality-filtering pass runs before training (too-short / too-long
    documents relative to their language's distribution).

    The pattern: per-group STATISTICS BROADCAST BACK TO ROWS. Pass 1
    pre-reduces (lang, count, sum, sum-of-squares) per batch — the
    partials are O(langs) rows per block, so they collect driver-side
    without a shuffle; pass 2 re-streams the table and flags each row
    against its language's broadcast moments.

    Exactness: the test |n - mean| > k*sigma is evaluated in INTEGER
    arithmetic — (n*N - S)^2 > k^2 * (N*SS - S^2) — so the result is
    bit-stable and SQL-reproducible with no float epsilon. int64 is
    safe while N * max(n_tokens)^2 < 2^63 (10^12 docs of 10^3 tokens);
    past that the moments need a 128-bit accumulator (documented
    limit). The default k=1 suits the synthetic corpora's near-uniform
    token counts (a uniform distribution has NO 2-sigma tail: its
    range is ~±1.73 sigma); real corpora are heavy-tailed and want
    k=2+."""
    import numpy as np
    import pandas as pd
    import ray as _ray

    ds = read_documents(sf_dir, ["doc_id", "lang", "text"])

    def moments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "nn": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "ss": pa.array([], pa.int64())})
        n = pc.count_substring_regex(t["text"], _WS_TOKEN_RE) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "n": n, "n2": n * n})
        g = df.groupby("lang", sort=False).agg(
            nn=("n", "size"), s=("n", "sum"), ss=("n2", "sum")) \
            .reset_index()
        return pa.table({"lang": pa.array(g["lang"].to_numpy(object),
                                          pa.string()),
                         "nn": pa.array(g["nn"].to_numpy(np.int64)),
                         "s": pa.array(g["s"].to_numpy(np.int64)),
                         "ss": pa.array(g["ss"].to_numpy(np.int64))})

    parts = []
    for b in ds.map_batches(moments, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_rows:
            parts.append(b.to_pandas())
    if not parts:
        stats = pd.DataFrame({"lang": [], "nn": [], "s": [], "ss": []})
    else:
        stats = pd.concat(parts).groupby("lang", as_index=False).sum()
    langs = np.sort(stats["lang"].to_numpy(object).astype(str))
    order = np.argsort(stats["lang"].to_numpy(object).astype(str),
                       kind="stable")
    ref = _ray.put((langs,
                    stats["nn"].to_numpy(np.int64)[order],
                    stats["s"].to_numpy(np.int64)[order],
                    stats["ss"].to_numpy(np.int64)[order]))

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("lang", pa.string()),
                            ("n_tokens", pa.int64())])

    def flag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        lg, nn, s, ss = _ray.get(ref)
        n = pc.count_substring_regex(t["text"], _WS_TOKEN_RE) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        rl = t["lang"].to_numpy(zero_copy_only=False).astype(str)
        pos = np.searchsorted(lg, rl)
        d = n * nn[pos] - s[pos]
        var_n2 = nn[pos] * ss[pos] - s[pos] * s[pos]
        keep = d * d > k * k * var_n2
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64())
            .to_numpy(zero_copy_only=False)[keep],
            "lang": pa.array(rl[keep].astype(object), pa.string()),
            "n_tokens": pa.array(n[keep])})

    flagged = ds.map_batches(flag, batch_format="pyarrow",
                             zero_copy_batch=True)
    # zero-flag results must still carry the schema
    return ray.data.from_arrow(out_schema.empty_table()).union(flagged)


def topk_docs_per_lang(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """(lang, doc_id, n_tokens, rank) — the ``k`` longest documents
    (whitespace tokens, ties broken by lower doc_id) WITHIN each
    language: grouped top-k with no global sort.

    Scale shape: each batch prunes itself to at most ``k`` rows per
    language before anything moves (top-k is a decomposable
    aggregate: the global top-k per group is contained in the union
    of per-batch top-k's), so the shuffle moves O(k x langs x blocks)
    candidate rows, never the corpus. The final per-language rank is
    one ``partitioned_group_map`` over those candidates — same spine
    as ``topk_tokens``."""
    import numpy as np
    import pandas as pd

    from ..functions.groups import partitioned_group_map, segmented_rank

    ds = read_documents(sf_dir, ["doc_id", "text", "lang"])
    cand_schema = pa.schema([("lang", pa.string()), ("doc_id", pa.int64()),
                             ("n_tokens", pa.int64())])
    out_schema = pa.schema([("lang", pa.string()), ("doc_id", pa.int64()),
                            ("n_tokens", pa.int64()), ("rank", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cand_schema.empty_table()
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n_tokens": pc.count_substring_regex(t["text"], _WS_TOKEN_RE)
            .cast(pa.int64()).to_numpy(zero_copy_only=False)})
        df = df.sort_values(["lang", "n_tokens", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        keep = segmented_rank(df["lang"].to_numpy()) <= k
        return pa.Table.from_pandas(df[keep], schema=cand_schema,
                                    preserve_index=False)

    cands = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "doc_id": pd.Series([], dtype=np.int64),
                                 "n_tokens": pd.Series([], dtype=np.int64),
                                 "rank": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["lang", "n_tokens", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        rank = segmented_rank(df["lang"].to_numpy())
        keep = rank <= k
        return pd.DataFrame({"lang": df["lang"].to_numpy()[keep],
                             "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
                             "n_tokens":
                             df["n_tokens"].to_numpy(np.int64)[keep],
                             "rank": rank[keep]})

    return partitioned_group_map(cands, ["lang"], block, 8,
                                 out_schema=out_schema)


def bloom_decontaminate(sf_dir: str, n: int = 5, bench_mod: int = 29,
                        m_bits: int = 65536) -> ray.data.Dataset:
    """Sketch-based decontamination: (doc_id, n_bloom_hits,
    bloom_contaminated) — the Bloom-filter companion to
    ``decontaminate``. The benchmark side's distinct word ``n``-grams
    set k=2 bits each in an ``m_bits``-wide filter (positions = the
    first two 16-bit words of sha256(gram)); the corpus streams
    through one stateless vectorized probe per batch against the
    broadcast 8 KB bitset. A gram "hits" when BOTH of its positions
    are set — Bloom semantics, deterministic false positives
    included, so the DuckDB oracle reproduces the result bit-exactly
    from the same sha256 hex digits.

    This is the 100-TB scale path for decontamination: the exact
    variant broadcasts the benchmark's gram VOCABULARY (bounded by
    ``max_bench_bytes``), while the filter here is fixed-size
    regardless of benchmark size — the standard memory/precision
    trade. No shuffle, no join; one tiny benchmark scan plus one
    streaming corpus scan."""
    import hashlib

    import numpy as np
    import ray

    from .docdedup import _distinct_word_ngrams_batch

    assert m_bits & (m_bits - 1) == 0 and m_bits <= 1 << 32

    def gram_positions(grams) -> np.ndarray:
        """(n_grams, 2) uint32 bit positions from sha256 bytes 0-1 and
        2-3 (== hex digits 1-4 / 5-8, the oracle's digit arithmetic)."""
        out = np.empty((len(grams), 2), np.uint32)
        for i, g in enumerate(grams):
            d = hashlib.sha256(g.encode()).digest()
            out[i, 0] = int.from_bytes(d[0:2], "big")
            out[i, 1] = int.from_bytes(d[2:4], "big")
        return out % m_bits

    def bench_positions(t: pa.Table) -> pa.Table:
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(dids % bench_mod == 0))
        empty = pa.table({"pos": pa.array([], pa.uint32())})
        if t.num_rows == 0:
            return empty
        _, gram = _distinct_word_ngrams_batch(t, n)
        if gram is None:
            return empty
        pos = gram_positions(np.unique(gram)).ravel()
        return pa.table({"pos": pa.array(np.unique(pos), pa.uint32())})

    bits = np.zeros(m_bits, bool)
    bds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        bench_positions, batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    for b in bds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_rows:
            bits[b["pos"].to_numpy(zero_copy_only=False)] = True
    bits_ref = ray.put(np.packbits(bits))

    def scan(t: pa.Table) -> pa.Table:
        import numpy as np
        bset = np.unpackbits(ray.get(bits_ref)).astype(bool)
        hits = np.zeros(t.num_rows, np.int64)
        d, gram = _distinct_word_ngrams_batch(t, n)
        if d is not None and len(d):
            pos = gram_positions(gram)
            hit = bset[pos[:, 0]] & bset[pos[:, 1]]
            np.add.at(hits, d[hit], 1)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bloom_hits": pa.array(hits),
            "bloom_contaminated": pa.array(hits > 0)})

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True)


def _token_explode(t: pa.Table) -> "tuple":
    """Shared token-explode idiom: split ``text`` on the repo-wide
    ``\\S+`` rule and return (flat_tokens ndarray, row_idx ndarray) —
    boundary empties dropped so the result matches DuckDB
    ``regexp_extract_all('\\S+')`` exactly. ONE implementation so the
    tokenization rule can never diverge between the operators that
    explode (tf-idf, posting lists, packing)."""
    import numpy as np

    col = t["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern_regex(col, pattern=_NORM_WS_RE)
    flat = toks.flatten()
    row_idx = np.repeat(np.arange(t.num_rows),
                        np.diff(toks.offsets.to_numpy()))
    keep = pc.not_equal(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    return (flat.filter(pa.array(keep)).to_numpy(zero_copy_only=False),
            row_idx[keep])


def tfidf_top_terms(sf_dir: str, k: int = 2,
                    vocab_cap_bytes: int = 256 << 20) -> ray.data.Dataset:
    """(doc_id, token, score, rank) — the ``k`` most
    corpus-distinctive tokens per document by an integer-exact tf-idf
    surrogate ``score = tf * N // df`` (N docs, df = documents
    containing the token; plain floor division so engine and oracle
    agree bit-for-bit — the float ``log`` idf would differ at ULP
    level between libms). Ties rank by token ascending.

    The GLOBAL-STATISTIC BROADCAST-BACK shape: one token-partitioned
    shuffle of per-batch-distinct (token, doc-count) partials builds
    the O(vocab) df table, which collects under a byte cap and
    broadcasts once via ``ray.put`` as a sorted array pair; the
    scoring pass then needs NO shuffle at all — a document's tf is
    computed entirely inside its own row, so each batch scores and
    ranks its documents independently against the broadcast df."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ..functions.groups import partitioned_sum, segmented_rank

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet") \
        .metadata.num_rows

    ds = read_documents(sf_dir, ["doc_id", "text"])

    df_part_schema = pa.schema([("token", pa.string()),
                                ("df", pa.int64())])

    def df_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return df_part_schema.empty_table()
        flat, row_idx = _token_explode(t)
        if len(flat) == 0:
            return df_part_schema.empty_table()
        # distinct (token, doc) inside the batch, then doc counts per
        # token — only vocab-sized partials cross the shuffle
        dfr = pd.DataFrame({"token": flat, "row": row_idx})
        cnt = (dfr.drop_duplicates().groupby("token", sort=False)
               .size().reset_index(name="df"))
        return pa.table({"token": pa.array(cnt["token"], pa.string()),
                         "df": pa.array(cnt["df"].to_numpy(np.int64))},
                        schema=df_part_schema)

    df_tbl = partitioned_sum(
        ds.map_batches(df_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["token"], "df", None, df_part_schema, out_name="df")

    # O(vocab) broadcast: sorted token strings + parallel df counts,
    # collected streaming UNDER THE BYTE CAP — a corpus whose vocab
    # outgrows it needs the partitioned-join route instead of a
    # silent driver OOM
    parts = []
    total_bytes = 0
    for b in df_tbl.iter_batches(batch_size=65536,
                                 batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        total_bytes += b.nbytes
        if total_bytes > vocab_cap_bytes:
            raise NotImplementedError(
                "df vocabulary exceeded the broadcast byte cap; score "
                "via a token-partitioned join instead of broadcast-back")
        parts.append(b)
    if parts:
        vt = pa.concat_tables(parts).combine_chunks()
        vtok = vt["token"].to_numpy(zero_copy_only=False)
        vdf = vt["df"].to_numpy(zero_copy_only=False)
        order = np.argsort(vtok, kind="stable")
        vtok, vdf = vtok[order], vdf[order]
    else:
        vtok, vdf = np.empty(0, object), np.empty(0, np.int64)
    df_ref = ray.put((vtok, vdf))

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("token", pa.string()),
                            ("score", pa.int64()),
                            ("rank", pa.int64())])

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        tok_arr, df_arr = ray.get(df_ref)
        flat, row_idx = _token_explode(t)
        if len(flat) == 0 or len(tok_arr) == 0:
            return out_schema.empty_table()
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[row_idx]
        dfr = pd.DataFrame({"doc": doc_ids, "token": flat})
        tf = (dfr.groupby(["doc", "token"], sort=False).size()
              .reset_index(name="tf"))
        pos = np.searchsorted(tok_arr, tf["token"].to_numpy())
        dfv = df_arr[pos]                  # every token is in the vocab
        sc = tf["tf"].to_numpy(np.int64) * n_docs // dfv
        out = pd.DataFrame({"doc_id": tf["doc"].to_numpy(np.int64),
                            "token": tf["token"].to_numpy(),
                            "score": sc})
        out = out.sort_values(["doc_id", "score", "token"],
                              ascending=[True, False, True],
                              kind="mergesort")
        rank = segmented_rank(out["doc_id"].to_numpy())
        keep = rank <= k
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)[keep]),
            "token": pa.array(out["token"].to_numpy()[keep], pa.string()),
            "score": pa.array(out["score"].to_numpy(np.int64)[keep]),
            "rank": pa.array(rank[keep].astype(np.int64))},
            schema=out_schema)

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


PACK_BUDGET = 2048


def pack_sequences(sf_dir: str, budget: int = PACK_BUDGET,
                   num_ranges: int | None = None) -> ray.data.Dataset:
    """(doc_id, n_tokens, bin_id, offset_tokens) — SEQUENCE PACKING
    for training-batch assembly: documents concatenate in doc_id
    order into fixed ``budget``-token bins (streaming concat — a doc
    may straddle a bin boundary; ``bin_id``/``offset_tokens`` locate
    its first token). The primitive underneath is a DISTRIBUTED
    GLOBAL PREFIX SUM over one total order — none of the existing
    operators need cross-partition carry; this one does.

    Two passes, O(ranges) driver state: doc_id is dense 0..N-1, so
    range r = ``doc_id * R // N`` is a balanced pre-sorted range
    partition with NO sampling sort. Pass 1 reduces per-range token
    sums (O(R) rows) to the driver, which computes exclusive range
    offsets; pass 2 shuffles the narrow (range, doc_id, n_tokens)
    stream once, and each partition cumsums its ranges locally and
    adds the carried offset. Token counts are the repo's ``\\S+``
    rule on both sides."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.groups import group_starts, partitioned_group_map_arrow

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet") \
        .metadata.num_rows
    R = num_ranges or 32

    ds = read_documents(sf_dir, ["doc_id", "text"])
    nar_schema = pa.schema([("rng", pa.int64()), ("doc_id", pa.int64()),
                            ("n_tokens", pa.int64())])
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_tokens", pa.int64()),
                            ("bin_id", pa.int64()),
                            ("offset_tokens", pa.int64())])

    def narrow(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return nar_schema.empty_table()
        # per-row token counts via the SHARED explode rule (one
        # implementation of the \S+ semantics repo-wide)
        _, row_idx = _token_explode(t)
        n_tok = np.bincount(row_idx, minlength=t.num_rows) \
            .astype(np.int64)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"rng": pa.array(did * R // n_docs),
                         "doc_id": pa.array(did),
                         "n_tokens": pa.array(n_tok)},
                        schema=nar_schema)

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    # pass 1: DISTRIBUTED per-range partials (each batch collapses to
    # <= R rows before anything reaches the driver), then a tiny
    # driver merge into exclusive offsets — the driver never streams
    # the O(N) narrow rows itself
    def range_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"rng": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        rng = t["rng"].to_numpy(zero_copy_only=False)
        nt = t["n_tokens"].to_numpy(zero_copy_only=False)
        sums = np.zeros(R, np.int64)
        np.add.at(sums, rng, nt)
        nz = np.flatnonzero(sums)
        return pa.table({"rng": pa.array(nz.astype(np.int64)),
                         "s": pa.array(sums[nz])})

    range_sums = np.zeros(R, np.int64)
    for b in narrow_ds.map_batches(range_partial,
                                   batch_format="pyarrow") \
            .iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        np.add.at(range_sums,
                  b["rng"].to_numpy(zero_copy_only=False),
                  b["s"].to_numpy(zero_copy_only=False))
    offsets = np.concatenate([[0], np.cumsum(range_sums)[:-1]])
    off_ref = ray.put(offsets)

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        offs = ray.get(off_ref)
        rng = t["rng"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        nt = t["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, rng))
        rng, did, nt = rng[order], did[order], nt[order]
        cum = np.cumsum(nt)
        excl = cum - nt                     # exclusive cumsum, flat
        starts = np.flatnonzero(group_starts(rng))
        sizes = np.diff(np.append(starts, len(rng)))
        # subtract each range segment's own base, add its global offset
        seg_base = np.repeat(excl[starts], sizes)
        cb = excl - seg_base + np.repeat(offs[rng[starts]], sizes)
        return pa.table({"doc_id": pa.array(did),
                         "n_tokens": pa.array(nt),
                         "bin_id": pa.array(cb // budget),
                         "offset_tokens": pa.array(cb % budget)},
                        schema=out_schema)

    return partitioned_group_map_arrow(narrow_ds, ["rng"], block, None,
                                       out_schema=out_schema)


POSTINGS_CAP = 20


def posting_lists(sf_dir: str, cap: int = POSTINGS_CAP
                  ) -> ray.data.Dataset:
    """(token, n_docs, postings) — INVERTED-INDEX build: per token the
    exact document frequency and the first ``cap`` doc_ids ascending,
    comma-joined (the grouped ORDERED-LIST MATERIALIZATION shape; the
    cap is the posting-list truncation any web-scale index needs —
    stopword rows stay O(cap) wide while n_docs stays exact).

    One token-partitioned shuffle of per-batch-DISTINCT (token,
    doc_id) pairs; each partition owns its tokens entirely, so the
    sort, count and truncation are all partition-local."""
    import numpy as np
    import pandas as pd

    from ..functions.groups import partitioned_group_map_arrow

    pair_schema = pa.schema([("token", pa.string()),
                             ("doc_id", pa.int64())])
    out_schema = pa.schema([("token", pa.string()),
                            ("n_docs", pa.int64()),
                            ("postings", pa.string())])

    ds = read_documents(sf_dir, ["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        flat, row_idx = _token_explode(t)
        if len(flat) == 0:
            return pair_schema.empty_table()
        df = pd.DataFrame({
            "token": flat,
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64)[row_idx]}).drop_duplicates()
        return pa.table({"token": pa.array(df["token"], pa.string()),
                         "doc_id": pa.array(df["doc_id"]
                                            .to_numpy(np.int64))},
                        schema=pair_schema)

    pair_stream = ds.map_batches(pairs, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        tok = t["token"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"token": tok, "doc_id": did}) \
            .drop_duplicates().sort_values(["token", "doc_id"],
                                           kind="mergesort")
        g = df.groupby("token", sort=False)["doc_id"]
        agg = g.agg(n_docs="size",
                    postings=lambda s: ",".join(map(str, s.iloc[:cap])))
        agg = agg.reset_index()
        return pa.table({"token": pa.array(agg["token"], pa.string()),
                         "n_docs": pa.array(agg["n_docs"]
                                            .to_numpy(np.int64)),
                         "postings": pa.array(agg["postings"],
                                              pa.string())},
                        schema=out_schema)

    return partitioned_group_map_arrow(pair_stream, ["token"], block,
                                       None, out_schema=out_schema)


SPLIT_VAL_MOD = 10


def leakfree_split(sf_dir: str, val_mod: int = SPLIT_VAL_MOD
                   ) -> ray.data.Dataset:
    """(doc_id, split) — deterministic CONTENT-HASH train/val split:
    the split key is the whitespace-normalized lowercase sha256
    fingerprint (the ``fingerprint`` operator's rule), so exact and
    formatting-level duplicates always land in the SAME split — the
    leak-free assignment a training pipeline needs, with no
    coordination and no shuffle (pure map; any node can re-derive any
    row's split). val when the first 8 hex digits mod ``val_mod`` == 0
    (~10%), train otherwise."""
    import hashlib

    ds = read_documents(sf_dir, ["doc_id", "text"])
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("split", pa.string())])

    def f(t: pa.Table) -> pa.Table:
        norm = pc.utf8_lower(
            pc.utf8_trim(pc.replace_substring_regex(t["text"],
                                                    _NORM_WS_RE, " "), " "))
        splits = ["val" if int(hashlib.sha256(
            s.encode("utf-8", "surrogatepass")).hexdigest()[:8], 16)
            % val_mod == 0 else "train" for s in norm.to_pylist()]
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "split": pa.array(splits, pa.string())},
                        schema=out_schema)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def quality_weighted_sample(sf_dir: str, base_bp: int = 2000,
                            per_stopword_bp: int = 400,
                            cap_bp: int = 9000) -> ray.data.Dataset:
    """(doc_id, keep_rate_bp, sampled) — QUALITY-WEIGHTED DOWNSAMPLING
    (the CCNet-style importance sampler): each document's keep rate in
    basis points is ``min(base + per_stopword * n_stopwords, cap)`` —
    a cheap fluency proxy — and the keep decision compares a
    16-bit hash of the raw text (sha256 hex digits 1-4, the repo's
    sketch-oracle digit rule) against the rate. Deterministic,
    map-only, zero coordination: resampling a 100-TB corpus is
    embarrassingly parallel and reproducible row-by-row, and raising
    ``cap_bp`` later keeps every previously sampled doc sampled
    (monotone in the rate)."""
    import hashlib

    import numpy as np

    ds = read_documents(sf_dir, ["doc_id", "text"])
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("keep_rate_bp", pa.int64()),
                            ("sampled", pa.bool_())])

    def f(t: pa.Table) -> pa.Table:
        n_stop = pc.count_substring_regex(
            pc.utf8_lower(t["text"]), _STOPWORD_RE) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        rate = np.minimum(base_bp + per_stopword_bp * n_stop, cap_bp)
        w = np.array([int(hashlib.sha256(
            s.encode("utf-8", "surrogatepass")).hexdigest()[:4], 16)
            for s in t["text"].to_pylist()], np.int64)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "keep_rate_bp": pa.array(rate),
                         "sampled": pa.array((w % 10000) < rate)},
                        schema=out_schema)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def fuzzy_decontaminate(sf_dir: str, n: int = 5, bench_mod: int = 29,
                        tau_bp: int = 5000,
                        max_bench_bytes: int = 256 << 20
                        ) -> ray.data.Dataset:
    """(doc_id, n_flagged_bench, fuzzy_contaminated) — FUZZY
    decontamination: a document is contaminated when its distinct
    word ``n``-gram Jaccard against SOME benchmark document (doc_id %%
    ``bench_mod`` == 0, self excluded) reaches ``tau_bp`` basis
    points — the GPT-3-style overlap check that catches paraphrased /
    partially copied eval data the exact-hash and Bloom variants
    miss. The threshold test is integer cross-multiplication
    (``inter * 10000 >= tau_bp * (|A| + |B| - inter)``), bit-stable
    against the SQL oracle.

    Scale shape: the benchmark side reduces to a CSR gram table —
    unique grams as ONE Arrow StringArray (zero-copy through plasma,
    probed with the C-level ``index_in`` kernel) plus int64 offset /
    bench-position arrays — collected under ``max_bench_bytes`` and
    broadcast once; each corpus batch probes with one ``index_in`` +
    a CSR expand, and collapses straight to per-(doc, bench)
    intersection counts. No shuffle touches the corpus."""
    import numpy as np
    import pandas as pd

    from ..functions.groups import csr_expand
    from .docdedup import _distinct_word_ngrams_batch

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_flagged_bench", pa.int64()),
                            ("fuzzy_contaminated", pa.bool_())])

    ds = read_documents(sf_dir, ["doc_id", "text"])

    # benchmark side: per-batch distinct (bench_id, gram) pairs, then
    # a driver merge under the byte cap
    def bench_pairs(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(did % bench_mod == 0))
        if t.num_rows == 0:
            return pa.table({"b_id": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.string())})
        d, grams = _distinct_word_ngrams_batch(t, n)
        if d is None:
            return pa.table({"b_id": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.string())})
        bid = t["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[d]
        return pa.table({"b_id": pa.array(bid),
                         "gram": pa.array(grams, pa.string())})

    parts = []
    total = 0
    for b in ds.map_batches(bench_pairs, batch_format="pyarrow") \
            .iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        total += b.nbytes
        if total > max_bench_bytes:
            raise NotImplementedError(
                "benchmark gram table exceeded the broadcast byte cap; "
                "probe via a gram-partitioned join instead")
        parts.append(b)
    if parts:
        bt = pa.concat_tables(parts).combine_chunks()
        # no driver dedupe needed: each document is ONE row handled by
        # exactly one bench_pairs call, which already emits distinct
        # (b_id, gram) pairs
        bg = bt["gram"].to_numpy(zero_copy_only=False)
        bb = bt["b_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((bb, bg))
        bg, bb = bg[order], bb[order]
        ub, binv = np.unique(bb, return_inverse=True)
        bsz = np.bincount(binv).astype(np.int64)   # |B| per bench doc
        # CSR over UNIQUE grams: offsets into the (gram-sorted) flat
        # bench-position array — index_in probes the unique StringArray
        # at C speed, and the per-occurrence bench position (binv) is
        # computed ONCE here, never re-derived per batch
        ug_np, counts = np.unique(bg, return_counts=True)
        ug = pa.array(ug_np, pa.string())
        offsets = np.concatenate([[0], np.cumsum(counts)]) \
            .astype(np.int64)
        bpos_flat = binv.astype(np.int64)          # aligned with bg order
    else:
        ug = pa.array([], pa.string())
        offsets = np.zeros(1, np.int64)
        bpos_flat = ub = bsz = np.empty(0, np.int64)
    bench_ref = ray.put((ug, offsets, bpos_flat, ub, bsz))

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ug_, off_, bpf_, ub_, bsz_ = ray.get(bench_ref)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flagged = np.zeros(t.num_rows, np.int64)
        d, grams = (None, None) if len(ub_) == 0 else \
            _distinct_word_ngrams_batch(t, n)
        if d is not None:
            sizes = np.bincount(d, minlength=t.num_rows)  # |A| per row
            pos = pc.index_in(pa.array(grams, pa.string()),
                              value_set=ug_).fill_null(-1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            found = pos >= 0
            lo = np.where(found, off_[np.maximum(pos, 0)], 0)
            hi = np.where(found, off_[np.maximum(pos, 0) + 1], 0)
            src, tgt = csr_expand(lo, hi)
            # src: index into grams (-> row d[src]); tgt: bench row
            if len(src):
                row = d[src]
                bpos = bpf_[tgt]
                # drop the self pair (a benchmark doc vs itself)
                notself = did[row] != ub_[bpos]
                row, bpos = row[notself], bpos[notself]
                comp = row.astype(np.int64) * len(ub_) + bpos
                uc, inter = np.unique(comp, return_counts=True)
                r = (uc // len(ub_)).astype(np.int64)
                bp = (uc % len(ub_)).astype(np.int64)
                na = sizes[r]
                nb = bsz_[bp]
                hit = inter * 10000 >= tau_bp * (na + nb - inter)
                if hit.any():
                    np.add.at(flagged, r[hit], 1)
        return pa.table({"doc_id": pa.array(did),
                         "n_flagged_bench": pa.array(flagged),
                         "fuzzy_contaminated": pa.array(flagged > 0)},
                        schema=out_schema)

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)
