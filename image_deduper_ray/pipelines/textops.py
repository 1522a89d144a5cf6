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
