"""Suffix-array substring pass unit tests (no Ray needed)."""

from __future__ import annotations

import numpy as np

from image_deduper_ray.stages.substring import (find_containments,
                                                 suffix_array)


def _sa_naive(s: np.ndarray) -> np.ndarray:
    return np.array(sorted(range(len(s)), key=lambda i: tuple(s[i:])),
                    dtype=np.int64)


class TestSuffixArray:
    def test_matches_naive(self):
        rng = np.random.default_rng(0)
        for n in (1, 2, 7, 40, 200):
            s = rng.integers(0, 5, size=n).astype(np.int64)
            assert (suffix_array(s) == _sa_naive(s)).all()

    def test_empty(self):
        assert len(suffix_array(np.empty(0, dtype=np.int64))) == 0

    def test_repetitive(self):
        s = np.array([1] * 50, dtype=np.int64)
        assert (suffix_array(s) == np.arange(49, -1, -1)).all()


class TestFindContainments:
    def test_detects_embedding(self):
        needle = "def shared_helper(x):\n    return x * 41\n"
        host = "import os\n" + needle + "print('done')\n"
        other = "completely unrelated text that stands alone here ok"
        got = find_containments(["n", "h", "o"], [needle, host, other],
                                min_len=16)
        assert got == [("n", "h")]

    def test_respects_min_len(self):
        got = find_containments(["a", "b"], ["xy", "wxyz"], min_len=16)
        assert got == []

    def test_no_self_or_equal_len(self):
        t = "some sufficiently long piece of text for the scan!"
        assert find_containments(["a", "b"], [t, t], min_len=8) == []

    def test_multiple_hosts(self):
        needle = "the common embedded fragment, long enough to count"
        hosts = [f"prefix{i} {needle} suffix{i}" for i in range(3)]
        ids = ["n", "h0", "h1", "h2"]
        got = set(find_containments(ids, [needle] + hosts, min_len=16))
        assert got == {("n", "h0"), ("n", "h1"), ("n", "h2")}

    def test_unicode(self):
        needle = "中文片段嵌入测试，足够长的片段内容。"
        host = "开头 " + needle + " 结尾"
        assert find_containments(["n", "h"], [needle, host],
                                 min_len=4) == [("n", "h")]


class TestContainmentVerify:
    def _run(self, pairs, **kw):
        import pyarrow as pa

        from image_deduper_ray.stages.substring import ContainmentVerify

        batch = pa.table({
            "a": pa.array([p[0] for p in pairs], pa.string()),
            "b": pa.array([p[1] for p in pairs], pa.string()),
            "content_a": pa.array([p[2] for p in pairs], pa.string()),
            "content_b": pa.array([p[3] for p in pairs], pa.string())})
        out = ContainmentVerify(**kw)(batch)
        return set(zip(out["a"].to_pylist(), out["b"].to_pylist()))

    def test_suffix_array_path_matches_scan_path(self):
        host = " ".join(f"hostword{i}" for i in range(200))
        needles = [host[k * 50 : k * 50 + 80] for k in range(5)]
        miss = "totally absent needle that is long enough to qualify!!"
        pairs = [(f"n{k}", "H", ndl, host) for k, ndl in enumerate(needles)]
        pairs.append(("nm", "H", miss, host))
        # sa_min_needles=1 forces the suffix-array path; high threshold
        # forces the linear-scan path — results must agree
        expect = {(f"n{k}", "H") for k in range(5)}
        assert self._run(pairs, min_len=16, sa_min_needles=1) == expect
        assert self._run(pairs, min_len=16, sa_min_needles=99) == expect
