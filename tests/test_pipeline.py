"""End-to-end pipeline tests on the synthetic corpus.

The grouping analog of the reference's discovery/grouping behavior
tests (/root/reference/crates/image-deduper-core/src/discovery/tests/
file_system_tests.rs:25-102): planted cluster families must co-cluster,
high-edit variants and singletons must not, and a rerun must resume
from checkpoints instead of recomputing.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from image_deduper_ray.corpus import generate_corpus, write_corpus
from image_deduper_ray.pipelines.dedup import run_pipeline
from image_deduper_ray.pipelines.oracle import (dup_pair_recall, oracle_pairs,
                                                oracle_signatures)

N_CLUSTERS = 10


@pytest.fixture(scope="module")
def corpus_run(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("corpus"))
    out_dir = str(tmp_path_factory.mktemp("out"))
    shutil.rmtree(data_dir, ignore_errors=True)
    d, expected = write_corpus(data_dir, n_clusters=N_CLUSTERS)
    res = run_pipeline(d, out_dir)
    table, _ = generate_corpus(N_CLUSTERS)
    return d, out_dir, res, table, expected


def _engine_clusters(res) -> dict[str, str]:
    cl = res["clusters"].to_pandas()
    return dict(zip(cl.file_id, cl.cluster_id))


def test_recall_vs_oracle(corpus_run):
    _, _, res, table, _ = corpus_run
    engine = _engine_clusters(res)
    ref_pairs = oracle_pairs(oracle_signatures(table))
    assert dup_pair_recall(engine, ref_pairs) >= 0.99


def test_planted_families_cocluster(corpus_run):
    _, _, res, table, expected = corpus_run
    engine = _engine_clusters(res)
    from image_deduper_ray.functions import hashing

    fids = hashing.file_ids(table["repo"].to_pylist(),
                            table["path"].to_pylist(),
                            table["commit"].to_pylist())
    for group in expected:
        labels = {engine[fids[i]] for i in group}
        assert len(labels) == 1, f"family {group} split into {labels}"


def test_singletons_stay_alone(corpus_run):
    _, _, res, table, expected = corpus_run
    engine = _engine_clusters(res)
    from image_deduper_ray.functions import hashing

    fids = hashing.file_ids(table["repo"].to_pylist(),
                            table["path"].to_pylist(),
                            table["commit"].to_pylist())
    planted = {i for g in expected for i in g}
    singles = [i for i, r in enumerate(table["repo"].to_pylist())
               if r.startswith("solo") and i not in planted]
    assert singles
    for i in singles:
        cid = engine[fids[i]]
        members = [f for f, c in engine.items() if c == cid]
        assert members == [fids[i]]


def test_high_edit_variants_split(corpus_run):
    _, _, res, table, expected = corpus_run
    engine = _engine_clusters(res)
    from image_deduper_ray.functions import hashing

    fids = hashing.file_ids(table["repo"].to_pylist(),
                            table["path"].to_pylist(),
                            table["commit"].to_pylist())
    paths = table["path"].to_pylist()
    e25 = [i for i, p in enumerate(paths) if "/e25/" in p]
    assert e25
    for i in e25:
        base_idx = next(j for g in expected for j in g
                        if paths[j].startswith("src/mod_")
                        and table["repo"][j].as_py().split("/")[0]
                        == table["repo"][i].as_py().split("/")[0])
        assert engine[fids[i]] != engine[fids[base_idx]]


def test_actions_lineage(corpus_run):
    _, _, res, _, _ = corpus_run
    acts = res["actions"].to_pandas()
    # one canonical per cluster; every non-canonical is a dup row
    roles = acts.groupby("cluster_id")["role"].apply(
        lambda s: (s == "keep").sum())
    assert (roles == 1).all()


def test_all_stages_checkpointed(corpus_run):
    _, out_dir, _, _, _ = corpus_run
    for stage in ["signatures", "edges_exact", "edges_sig", "pairs",
                  "verified", "edges_cont", "edges", "clusters", "actions"]:
        mpath = os.path.join(out_dir, stage, "_MANIFEST.json")
        assert os.path.exists(mpath), stage
        with open(mpath) as fh:
            assert json.load(fh)["rows"] >= 0


def test_rerun_resumes(corpus_run):
    d, out_dir, _, _, _ = corpus_run
    import time

    t0 = time.time()
    res2 = run_pipeline(d, out_dir)  # everything complete -> all skips
    assert time.time() - t0 < 15
    assert res2["clusters"].count() == res2["actions"].count()


def test_salting_preserves_recall(tmp_path):
    """With a tiny bucket_cap every near-dup family's buckets are salted
    into sub-buckets; representative linking must keep components
    connected (recall still 1.0)."""
    from image_deduper_ray.config import DedupConfig

    cfg = DedupConfig(bucket_cap=2, salt_window=2)
    data_dir = str(tmp_path / "corpus")
    d, _ = write_corpus(data_dir, n_clusters=8)
    res = run_pipeline(d, str(tmp_path / "out"), cfg)
    engine = _engine_clusters(res)
    table, _ = generate_corpus(8)
    ref_pairs = oracle_pairs(oracle_signatures(table, cfg), cfg)
    assert dup_pair_recall(engine, ref_pairs) >= 0.99


def test_vectorized_signature_path_recall(tmp_path):
    """The vectorized batch lexer/signature kernel must reach the same
    recall vs ITS oracle (both switch on cfg.vectorized_signatures)."""
    from image_deduper_ray.config import DedupConfig

    cfg = DedupConfig(vectorized_signatures=True)
    d, _ = write_corpus(str(tmp_path / "corpus"), n_clusters=8)
    res = run_pipeline(d, str(tmp_path / "out"), cfg)
    engine = _engine_clusters(res)
    table, _ = generate_corpus(8)
    ref_pairs = oracle_pairs(oracle_signatures(table, cfg), cfg)
    assert dup_pair_recall(engine, ref_pairs) >= 0.99


def test_distributed_cc_matches_driver(corpus_run):
    """Label propagation (distributed path) must produce exactly the
    driver union-find components."""
    import ray.data

    from image_deduper_ray.config import DedupConfig
    from image_deduper_ray.stages.cc import connected_components

    _, out_dir, res, _, _ = corpus_run
    edges = res["edges"]
    cfg = DedupConfig()
    drv = connected_components(edges, cfg, mode="driver").to_pandas()
    dist = connected_components(edges, cfg, mode="distributed").to_pandas()
    a = drv.sort_values("file_id").reset_index(drop=True)
    b = dist.sort_values("file_id").reset_index(drop=True)
    assert a.equals(b[["file_id", "cluster_id"]].reset_index(drop=True))


def test_signature_antijoin_resume(corpus_run, tmp_path):
    """Partial signature checkpoint: rerun must hash only missing rows
    and the final count must not grow (find_new_images discipline)."""
    d, out_dir, res, _, _ = corpus_run
    n_before = res["signatures"].count()

    out2 = str(tmp_path / "resume_out")
    shutil.copytree(os.path.join(out_dir, "signatures"),
                    os.path.join(out2, "signatures"))
    # drop the manifest (stage incomplete) but keep the parquet rows
    os.remove(os.path.join(out2, "signatures", "_MANIFEST.json"))
    res2 = run_pipeline(d, out2)
    assert res2["signatures"].count() == n_before


def test_containment_semijoin_fallback_recall(tmp_path):
    """With cont_max_broadcast_ids=0 the candidate-id prune must flip to
    the distributed hash semi-join (no driver id set) and still reach
    full recall."""
    from image_deduper_ray.config import DedupConfig

    cfg = DedupConfig(cont_max_broadcast_ids=0)
    d, _ = write_corpus(str(tmp_path / "corpus"), n_clusters=8)
    res = run_pipeline(d, str(tmp_path / "out"), cfg)
    engine = _engine_clusters(res)
    table, _ = generate_corpus(8)
    ref_pairs = oracle_pairs(oracle_signatures(table, cfg), cfg)
    assert dup_pair_recall(engine, ref_pairs) >= 0.99


def test_containment_content_join_fallback_recall(tmp_path):
    """With cont_broadcast_max_bytes=0 the candidate-content broadcast
    (Arrow-table fast path) must flip to the partitioned content joins
    and still reach full recall."""
    from image_deduper_ray.config import DedupConfig

    cfg = DedupConfig(cont_broadcast_max_bytes=0)
    d, _ = write_corpus(str(tmp_path / "corpus"), n_clusters=8)
    res = run_pipeline(d, str(tmp_path / "out"), cfg)
    engine = _engine_clusters(res)
    table, _ = generate_corpus(8)
    ref_pairs = oracle_pairs(oracle_signatures(table, cfg), cfg)
    assert dup_pair_recall(engine, ref_pairs) >= 0.99


def test_join_verify_path_recall(tmp_path):
    """verify_broadcast_max_bytes=0 forces the partitioned hash-join +
    ScorePairs path (the beyond-broadcast regime) — recall must hold."""
    from image_deduper_ray.config import DedupConfig

    cfg = DedupConfig(verify_broadcast_max_bytes=0)
    d, _ = write_corpus(str(tmp_path / "corpus"), n_clusters=8)
    res = run_pipeline(d, str(tmp_path / "out"), cfg)
    engine = _engine_clusters(res)
    table, _ = generate_corpus(8)
    ref_pairs = oracle_pairs(oracle_signatures(table, cfg), cfg)
    assert dup_pair_recall(engine, ref_pairs) >= 0.99


def test_light_checkpoint_mode_same_clusters(tmp_path, corpus_run):
    """checkpoint_mode='light' (edge stages stay in the object store)
    must produce exactly the clusters of the full-checkpoint run; only
    signatures/clusters/actions appear on disk."""
    from image_deduper_ray.config import DedupConfig

    cfg = DedupConfig(checkpoint_mode="light")
    data_dir, _out_dir, full, _table, _exp = corpus_run
    out2 = str(tmp_path / "light_out")
    res = run_pipeline(data_dir, out2, cfg)
    light_clusters = _engine_clusters(res)
    assert light_clusters == _engine_clusters(full)
    present = set(os.listdir(out2))
    assert {"signatures", "clusters", "actions"} <= present
    assert not ({"pairs", "verified", "edges"} & present)
