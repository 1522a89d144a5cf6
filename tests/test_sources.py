"""Discovery-source tests (read filters + projections)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from image_deduper_ray.sources.files import read_files, with_path_ext


def _write(tmp_path):
    t = pa.table({
        "repo": ["r"] * 6,
        "path": ["src/a.py", "vendor/b.js", ".hidden/c.py", "src/.d.py",
                 "src/e.RS", "src/noext"],
        "commit": ["c"] * 6,
        "lang": ["py", "js", "py", "py", "rs", "txt"],
        "content": ["x"] * 6,
    })
    p = str(tmp_path / "files.parquet")
    pq.write_table(t, p)
    return p


def test_lang_pushdown_and_filters(tmp_path):
    p = _write(tmp_path)
    got = read_files(p, langs=["py"]).to_pandas()
    # hidden path segments dropped (discovery/mod.rs:61-66 analog)
    assert sorted(got.path) == ["src/a.py"]

    got2 = read_files(p, exclude_path_prefixes=["vendor/"]).to_pandas()
    assert "vendor/b.js" not in set(got2.path)

    got3 = read_files(p, include_hidden=True, langs=["py"]).to_pandas()
    assert sorted(got3.path) == [".hidden/c.py", "src/.d.py", "src/a.py"]


def test_with_path_ext(tmp_path):
    p = _write(tmp_path)
    ds = with_path_ext(read_files(p, include_hidden=True),
                       normalize_lang=True)
    df = ds.to_pandas().set_index("path")
    assert df.loc["src/a.py", "ext"] == "py"
    assert df.loc["src/e.RS", "ext"] == "rs"
    assert df.loc["src/noext", "ext"] == ""
    assert df.loc["src/e.RS", "lang_from_ext"] == "rs"
    assert df.loc["src/noext", "lang_from_ext"] == "other"
