"""df_cap scale rule: bounded reducer work with a planted heavy gram,
and cap-exact containment (the ``inter == |A|`` premise must survive
capping). SURVEY.md §7.4 'skewed buckets' — the 100-TB guard for the
gram inverted index."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(path: str, texts: list[str]) -> str:
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        os.path.join(path, "documents.parquet"))
    return path


@pytest.fixture(scope="module")
def jaccard_corpus(tmp_path_factory):
    # every doc carries the heavy gram "zz yy xx" (df = 400); each
    # consecutive pair (2k, 2k+1) shares three rare grams
    texts = []
    for k in range(200):
        texts.append(f"zz yy xx r{k}a r{k}b r{k}c r{k}d")
        texts.append(f"zz yy xx r{k}a r{k}b r{k}c r{k}e")
    return _write_docs(str(tmp_path_factory.mktemp("dfcap_j")), texts)


def test_df_cap_bounds_cooccurrence_fanout(jaccard_corpus):
    """The planted df-400 gram alone implies C(400,2) = 79,800
    co-occurrence rows uncapped; with the cap the intersection stream
    must collapse to the rare-gram pairs only (bounded reducer work)."""
    from image_deduper_ray.pipelines.docdedup import _gram_intersections

    uncapped = _gram_intersections(jaccard_corpus, 3, None, 8).count()
    capped = _gram_intersections(jaccard_corpus, 3, 8, 8).count()
    assert uncapped >= 79_800          # the quadratic blowup, witnessed
    assert capped <= 1_000             # cap kills the heavy-gram fanout
    assert capped >= 200               # rare-gram pairs survive


def test_df_cap_keeps_true_jaccard_pairs(jaccard_corpus):
    """Capping drops only heavy-gram overlap: at tau below the planted
    pairs' capped similarity, capped and exact runs return the SAME
    pair set — precision is never lost, and the planted recall holds."""
    from image_deduper_ray.pipelines.docdedup import ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(jaccard_corpus, n=3, tau=0.3,
                                df_cap=None).to_pandas()
    capped = ngram_jaccard_pairs(jaccard_corpus, n=3, tau=0.3,
                                 df_cap=8).to_pandas()
    want = {(2 * k, 2 * k + 1) for k in range(200)}
    assert set(zip(exact.a, exact.b)) == want
    assert set(zip(capped.a, capped.b)) == want


@pytest.fixture(scope="module")
def containment_corpus(tmp_path_factory):
    # inner docs start with the heavy gram and are embedded verbatim
    # (whitespace-aligned) in their hosts; every doc sees df("zz yy xx")
    # = 40 > cap
    inners, hosts = [], []
    for i in range(20):
        a = f"q{i}l" + "x" * 18
        b = f"q{i}m" + "x" * 18
        c = f"q{i}r" + "x" * 18
        inner = f"zz yy xx {a} {b} {c}"
        assert len(inner) >= 64
        inners.append(inner)
        hosts.append(inner + f" tail{i}0 tail{i}1")
    return _write_docs(str(tmp_path_factory.mktemp("dfcap_c")),
                       inners + hosts)


def test_cap_exact_containment_survives_heavy_gram(containment_corpus):
    """With the heavy gram over the cap, plain capping would undercount
    ``inter`` (but not |A|) and silently lose every candidate. The
    cap-exact mode recomputes |A| over surviving grams, so the full
    planted containment set must come back identical to the uncapped
    run."""
    from image_deduper_ray.pipelines.docdedup import containment_pairs

    want = {(i, i + 20) for i in range(20)}
    exact = containment_pairs(containment_corpus, df_cap=None).to_pandas()
    assert set(zip(exact.inner_doc_id, exact.host_doc_id)) == want
    capped = containment_pairs(containment_corpus, df_cap=8).to_pandas()
    assert set(zip(capped.inner_doc_id, capped.host_doc_id)) == want


def test_auto_df_cap_resolution(tmp_path):
    """auto -> None at oracle scales; a finite cap past the threshold
    (checked against the rule, not a magic number)."""
    from image_deduper_ray.pipelines import docdedup as dd

    d = _write_docs(str(tmp_path / "tiny"), ["a b c d"] * 5)
    assert dd._resolve_df_cap(d, "auto") is None
    assert dd._resolve_df_cap(d, None) is None
    assert dd._resolve_df_cap(d, 7) == 7
    # the rule itself, without writing 200k rows: resolution is pure
    # arithmetic past the threshold
    assert dd.AUTO_DF_CAP_MIN_DOCS // dd.AUTO_DF_DIVISOR >= 512


def test_containment_broadcast_and_join_routes_agree(containment_corpus):
    """Forcing the byte caps to zero pushes containment through the
    partitioned-join scale route (no candidate-id prune, no text
    broadcast); results must be identical to the broadcast fast path."""
    from image_deduper_ray.pipelines.docdedup import containment_pairs

    want = {(i, i + 20) for i in range(20)}
    fast = containment_pairs(containment_corpus).to_pandas()
    slow = containment_pairs(containment_corpus,
                             cand_broadcast_bytes=0,
                             text_broadcast_bytes=0).to_pandas()
    assert set(zip(fast.inner_doc_id, fast.host_doc_id)) == want
    assert set(zip(slow.inner_doc_id, slow.host_doc_id)) == want


def test_operators_handle_empty_documents(tmp_path):
    """An empty shard is a normal event at scale: the gram, simhash,
    curation and dedup operators must return empty TYPED results, not
    crash on Ray 2.49's schema-less empty blocks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "empty")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}),
        os.path.join(d, "documents.parquet"))

    from image_deduper_ray.pipelines.docdedup import (containment_pairs,
                                                      exact_dup_groups,
                                                      ngram_jaccard_pairs,
                                                      simhash_text_groups)
    from image_deduper_ray.pipelines.textops import (decontaminate,
                                                     pii_counts,
                                                     repetition_stats)

    assert len(exact_dup_groups(d, seed_dup_mod=17).to_pandas()) == 0
    assert len(ngram_jaccard_pairs(d, df_cap=None).to_pandas()) == 0
    assert len(ngram_jaccard_pairs(d, df_cap=8).to_pandas()) == 0
    assert len(containment_pairs(d, df_cap=8).to_pandas()) == 0
    assert len(simhash_text_groups(d).to_pandas()) == 0
    assert len(decontaminate(d).to_pandas()) == 0
    assert len(repetition_stats(d).to_pandas()) == 0
    assert len(pii_counts(d).to_pandas()) == 0
