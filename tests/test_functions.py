"""Unit tests for the signature kernels (no Ray needed).

Mirrors the reference's golden-hash + distance-property test strategy
(/root/reference/crates/image-deduper-core/src/processing/processing_tests.rs:29-183):
pinned golden values for a fixed config, and monotone-distance property
tests under increasing edits.
"""

from __future__ import annotations

import numpy as np
import pytest

from image_deduper_ray.config import DedupConfig
from image_deduper_ray.functions import hashing, minhash as mh, tokenize as tok


def _sig(text: str, lang: str = "py", cfg: DedupConfig = DedupConfig()):
    a, b = mh.make_perms(cfg.num_perms, cfg.minhash_seed)
    tokens = tok.tokenize(text, lang)
    th = np.array([hashing.token_hash64(t) for t in tokens], dtype=np.uint64)
    sh = hashing.shingle_hashes(th, cfg.shingle_k)
    return mh.minhash_signature(sh, a, b), sh


CODE = "\n".join(f"    x_{i} = value + total * {i}" for i in range(40))


class TestTokenize:
    def test_whitespace_invariance(self):
        # the compression-leaves-distance-0 analog (processing_tests.rs:144-145)
        assert tok.tokenize(CODE, "py") == tok.tokenize(
            CODE.replace("    ", "\t\t").replace("\n", "\n\n  \n"), "py")

    def test_comment_invariance(self):
        with_comments = "\n".join(
            line + "  # churn" for line in CODE.split("\n"))
        assert tok.tokenize(CODE, "py") == tok.tokenize(with_comments, "py")
        # but comment markers are NOT stripped for unknown langs
        assert tok.tokenize("a # b", "weird") != tok.tokenize("a", "weird")

    def test_junk_prefix_recovery(self):
        # corrupted-JPEG SOI-scan analog (formats/jpeg.rs:34-66)
        assert tok.tokenize("﻿\x01\x02" + CODE, "py") == tok.tokenize(CODE, "py")

    def test_binary_sniff(self):
        assert tok.tokenize("abc\x00def", "py") == []
        assert tok.is_binary("\x00" * 10)
        assert not tok.is_binary(CODE)


class TestShingles:
    def test_short_input_single_shingle(self):
        th = np.array([1, 2, 3], dtype=np.uint64)
        assert len(hashing.shingle_hashes(th, 5)) == 1

    def test_deterministic(self):
        th = np.array([hashing.token_hash64(t) for t in "a b c d e f g".split()],
                      dtype=np.uint64)
        s1 = hashing.shingle_hashes(th, 5)
        s2 = hashing.shingle_hashes(th.copy(), 5)
        assert (s1 == s2).all()

    def test_golden_token_hash(self):
        # pinned golden value (processing_tests.rs:29-62 analog): any
        # unintended change to the hash chain breaks cluster stability
        assert hashing.token_hash64("def") == 8631541059365646922


class TestMinHash:
    def test_identical_signature(self):
        s1, _ = _sig(CODE)
        s2, _ = _sig(CODE)
        assert (s1 == s2).all()
        assert mh.est_jaccard(s1, s2) == 1.0

    def test_distance_monotone_under_edits(self):
        # the rotate_5/10 monotone-distance property (processing_tests.rs:169-182)
        base, _ = _sig(CODE)
        lines = CODE.split("\n")
        sims = []
        for frac in (0.05, 0.2, 0.5):
            k = max(1, int(len(lines) * frac))
            edited = lines.copy()
            for i in range(k):
                edited[i] = f"    completely_new_{i} = other_{i}"
            s, _ = _sig("\n".join(edited))
            sims.append(mh.est_jaccard(base, s))
        assert sims[0] > sims[1] > sims[2]

    def test_est_jaccard_tracks_true_jaccard(self):
        _, sh1 = _sig(CODE)
        lines = CODE.split("\n")
        lines[0] = "    zz = 1"
        lines[10] = "    qq = 2"
        s2, sh2 = _sig("\n".join(lines))
        s1, _ = _sig(CODE)
        true_j = len(np.intersect1d(sh1, sh2)) / len(np.union1d(sh1, sh2))
        assert abs(mh.est_jaccard(s1, s2) - true_j) < 0.12

    def test_simhash_hamming_small_for_near_dup(self):
        _, sh1 = _sig(CODE)
        lines = CODE.split("\n")
        lines[3] = "    tweaked = 9"
        _, sh2 = _sig("\n".join(lines))
        h1 = np.array([mh.simhash64(sh1)], dtype=np.uint64)
        h2 = np.array([mh.simhash64(sh2)], dtype=np.uint64)
        assert mh.hamming64(h1, h2)[0] <= 12


class TestHashing:
    def test_sha256_matches_duckdb_semantics(self):
        import duckdb
        import hashlib
        text = "héllo wörld 中文"
        ours = hashing.sha256_hex([text])[0]
        con = duckdb.connect()
        theirs = con.execute("select sha256(?)", [text]).fetchone()[0]
        con.close()
        assert ours == theirs == hashlib.sha256(text.encode()).hexdigest()

    def test_file_id_stable_and_distinct(self):
        ids = hashing.file_ids(["r", "r"], ["p1", "p2"], ["c", "c"])
        assert len(set(ids)) == 2
        assert ids == hashing.file_ids(["r", "r"], ["p1", "p2"], ["c", "c"])

    def test_fallback_shingles_deterministic(self):
        a = hashing.fallback_shingles("r", "p", 10)
        b = hashing.fallback_shingles("r", "p", 10)
        c = hashing.fallback_shingles("r", "p", 11)
        assert a[0] == b[0] != c[0]


class TestConfig:
    def test_band_validation(self):
        with pytest.raises(ValueError):
            DedupConfig(lsh_bands=3, lsh_rows=4)

    def test_json_roundtrip(self):
        cfg = DedupConfig(jaccard_threshold=0.7)
        assert DedupConfig.from_json(cfg.to_json()) == cfg


def test_cross_variant_downgrade():
    """Enhanced<->Standard interop (types.rs:34-43 analog): pairs missing
    a full MinHash on either side compare on the shared 64 SimHash bits,
    both in the kernel and through ScorePairs."""
    import numpy as np
    import pyarrow as pa
    from image_deduper_ray.config import DedupConfig
    from image_deduper_ray.functions.minhash import cross_variant_similarity
    from image_deduper_ray.stages.verify import ScorePairs

    sig = np.arange(128, dtype=np.uint64)
    sim, basis = cross_variant_similarity(sig, sig.copy(), 1, 2, 128)
    assert (sim, basis) == (1.0, "minhash")
    sim, basis = cross_variant_similarity(None, sig, 0b1011, 0b0011, 128)
    assert basis == "simhash64" and abs(sim - (1 - 1 / 64)) < 1e-12

    cfg = DedupConfig()
    full = sig.tobytes()
    batch = pa.table({
        "a": ["x", "x"], "b": ["y", "z"],
        "is_cont": pa.array([0, 0], pa.int8()),
        "minhash_a": pa.array([full, None], pa.binary()),
        "minhash_b": pa.array([full, full], pa.binary()),
        "simhash_a": pa.array([7, 0b111], pa.int64()),
        "simhash_b": pa.array([7, 0b101], pa.int64())})
    out = ScorePairs(cfg)(batch)
    jac = out["jaccard"].to_pylist()
    verd = out["verdict"].to_pylist()
    assert jac[0] == 1.0 and verd[0] == "near_dup"     # full-width match
    assert abs(jac[1] - (1 - 1 / 64)) < 1e-12          # downgraded pair
    assert verd[1] == "near_dup"                       # 63/64 >= 0.8


def test_fid64_collision_expansion():
    """Two file_ids sharing their first 16 hex chars (a 64-bit fid
    collision, the 10^10+ regime) must EXPAND at pair resolution: every
    member pairs with the other endpoint — collisions add candidates
    for verification to reject, never drop a true pair."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from image_deduper_ray.config import DedupConfig
    from image_deduper_ray.stages.lsh import _resolve_pairs, fid64

    ids = ["aaaaaaaaaaaaaaaa0000000000000001",   # collide on first 16
           "aaaaaaaaaaaaaaaa0000000000000002",
           "bbbbbbbbbbbbbbbb0000000000000003"]
    f = fid64(ids)
    assert f[0] == f[1] and f[0] != f[2]
    sigs = ray.data.from_arrow(pa.table({"file_id": pa.array(ids)}))
    pairs64 = ray.data.from_arrow(pa.table({
        "a": pa.array(f[[0, 2]].view(np.int64)[:1]),
        "b": pa.array(f[[2]].view(np.int64)),
        "is_cont": pa.array([0], pa.int8())}))

    for cap in (10**9, 0):   # broadcast path and join path
        cfg = DedupConfig(verify_broadcast_max_bytes=cap)
        out = _resolve_pairs(pairs64, sigs, cfg.resolved(), n_sigs=3) \
            .to_pandas()
        got = set(zip(out.a, out.b))
        # BOTH routes expand the colliding endpoint to all member ids
        # (the join route via hash_join right_dup="expand") and neither
        # emits self-pairs
        assert (ids[0], ids[2]) in got
        assert (ids[1], ids[2]) in got
        assert all(a != b for a, b in got)


def test_fixed_str_view_layouts():
    """fixed_str_view must equal the pylist conversion on every
    accepted layout (uniform-width fast path incl. sliced offsets,
    shorter-value and chunked fallbacks) and must REFUSE layouts the
    S-dtype would silently corrupt: over-width values (truncation
    collides distinct keys) and nulls."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from image_deduper_ray.functions.arrow_utils import fixed_str_view

    ids = [f"{i:032x}" for i in range(10)]
    ref = np.array(ids, dtype="S32")

    flat = pa.array(ids)
    np.testing.assert_array_equal(fixed_str_view(flat, 32), ref)
    np.testing.assert_array_equal(fixed_str_view(flat.slice(3, 4), 32),
                                  ref[3:7])
    chunked = pa.chunked_array([ids[:4], ids[4:]])
    np.testing.assert_array_equal(fixed_str_view(chunked, 32), ref)

    shorter = pa.array(["ab", "c" * 32, "d"])   # <= width: pads, safe
    np.testing.assert_array_equal(
        fixed_str_view(shorter, 32),
        np.array(["ab", "c" * 32, "d"], dtype="S32"))
    with pytest.raises(ValueError):             # > width: would collide
        fixed_str_view(pa.array(["x" * 33]), 32)
    with pytest.raises(ValueError):             # null: would stringify
        fixed_str_view(pa.array([ids[0], None]), 32)
    assert fixed_str_view(pa.array([], pa.string()), 32).shape == (0,)


def test_hash_join_right_dup_modes():
    """right_dup='unique' keeps one right row per key (supply
    semantics); right_dup='expand' emits one output row per matching
    right row (collision-expansion semantics)."""
    import pyarrow as pa
    import ray.data

    from image_deduper_ray.functions.joins import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["x", "y"]), "lv": pa.array([1, 2], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array(["x", "x", "y"]),
        "rv": pa.array([10, 11, 20], pa.int64())}))
    ls = pa.schema([("k", pa.string()), ("lv", pa.int64())])
    rs = pa.schema([("rv", pa.int64())])

    uniq = hash_join(left, right, "k", "rk", ls, rs,
                     num_partitions=2).to_pandas()
    assert len(uniq) == 2          # one row per left key
    exp = hash_join(left, right, "k", "rk", ls, rs,
                    num_partitions=2, right_dup="expand").to_pandas()
    assert len(exp) == 3           # x expands to both right rows
    assert sorted(exp[exp.k == "x"].rv) == [10, 11]

    import pytest
    with pytest.raises(ValueError):
        hash_join(left, right, "k", "rk", ls, rs, right_dup="bogus")


def test_broadcast_attach_str_routes():
    """Both routes of the string-keyed label attach (zero-copy Arrow
    broadcast and hash-join fallback at cap=0) agree: matched keys get
    the value, unmatched get null, left row count preserved."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from image_deduper_ray.functions.joins import broadcast_attach_str

    left = ray.data.from_arrow(pa.table({
        "file_id": pa.array(["a", "b", "c", "d"]),
        "x": pa.array([1, 2, 3, 4], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "node": pa.array(["b", "d"]),
        "label": pa.array(["b", "b"])}))

    outs = []
    for cap in (1 << 20, 0):
        df = broadcast_attach_str(
            ray.data.from_arrow(pa.table({
                "file_id": pa.array(["a", "b", "c", "d"]),
                "x": pa.array([1, 2, 3, 4], pa.int64())})),
            "file_id", right, "node", "label", "cluster",
            max_bytes=cap, num_partitions=2).to_pandas() \
            .sort_values("file_id").reset_index(drop=True)
        assert len(df) == 4
        assert df.loc[df.file_id == "b", "cluster"].iloc[0] == "b"
        assert df.loc[df.file_id == "d", "cluster"].iloc[0] == "b"
        assert df.loc[df.file_id.isin(["a", "c"]), "cluster"].isna().all()
        outs.append(df)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_broadcast_attach_i64_routes():
    """Both routes of the byte-capped broadcast attach (broadcast and
    hash-join fallback) produce identical left-join semantics on
    unique right keys (the documented contract): matched keys get the
    value, unmatched get null."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from image_deduper_ray.functions.joins import broadcast_attach_i64

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([5, 1, 9, 7], pa.int64()),
        "payload": pa.array(["a", "b", "c", "d"])}))
    right = ray.data.from_arrow(pa.table({
        "node": pa.array([1, 9], pa.int64()),
        "lbl": pa.array([100, 900], pa.int64())}))

    for cap in (1 << 30, 0):  # broadcast path, then forced join path
        out = broadcast_attach_i64(left, "k", right, "node", "lbl",
                                   "lbl_out", max_bytes=cap) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        assert out["k"].tolist() == [1, 5, 7, 9]
        got = {int(k): (None if pd.isna(v) else int(v))
               for k, v in zip(out["k"], out["lbl_out"])}
        assert got == {1: 100, 5: None, 7: None, 9: 900}
        assert "payload" in out.columns


def test_broadcast_attach_i64_empty_right():
    import pyarrow as pa
    import ray.data

    from image_deduper_ray.functions.joins import broadcast_attach_i64

    left = ray.data.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "node": pa.array([], pa.int64()), "lbl": pa.array([], pa.int64())}))
    out = broadcast_attach_i64(left, "k", right, "node", "lbl",
                               "lbl_out").to_pandas()
    assert len(out) == 2
    assert out["lbl_out"].isna().all()


def test_packed_keys_negative_ids_take_fallback():
    """Negative user ids pass a bit_length check (magnitude only) but
    would corrupt the packed band ordering — _packed_keys must refuse
    them so the temporal joins route to the per-user-segment fallback."""
    import numpy as np
    from image_deduper_ray.pipelines.events import _packed_keys

    u = np.array([5, -3, 9], dtype=np.int64)
    dt = np.array([10, 20, 30], dtype=np.int64)
    keys, _ = _packed_keys(u, dt)
    assert keys is None

    ok, span = _packed_keys(np.abs(u), dt)
    assert ok is not None
    # packed keys sort by (user, dt)
    order = np.argsort(ok, kind="stable")
    assert list(np.abs(u)[order]) == [3, 5, 9]


def test_safe_coalesce_misaligned_chunks():
    """pyarrow 16.1.0's coalesce kernel leaks masked-out garbage values
    through the validity bitmap when its two arguments have MISALIGNED
    chunk layouts (found in situ: a null cluster label coalesced to the
    searchsorted slot's raw value, silently absorbing singletons into
    the wrong group). safe_coalesce must be immune; this test also
    pins the upstream bug so a pyarrow upgrade that fixes it is
    visible."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from image_deduper_ray.functions.arrow_utils import safe_coalesce

    ids = np.arange(64, dtype=np.int64)
    vals = ids.copy()
    mask = np.zeros(64, bool)
    mask[42] = mask[43] = True
    vals[42] = vals[43] = 99          # masked-out garbage
    g = pa.chunked_array([pa.array(vals, pa.int64(), mask=mask)])
    d = pa.chunked_array([pa.array(ids[s:s + 16], pa.int64())
                          for s in (0, 16, 32, 48)])
    assert safe_coalesce(g, d).to_pylist()[42:44] == [42, 43]
    # document the raw-kernel behavior this helper exists for (if this
    # starts FAILING, pyarrow fixed the bug and the helper can go)
    raw = pc.coalesce(g, d).to_pylist()[42:44]
    assert raw in ([99, 99], [42, 43])
