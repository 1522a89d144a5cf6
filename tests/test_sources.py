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


def test_row_format_sources_match_parquet(tmp_path):
    """JSONL and CSV sources must conform to the same files schema and
    pass the same filters — every downstream stage is format-agnostic
    (S1/S2 over a second and third source format)."""
    import csv
    import json

    rows = [
        {"repo": "r", "path": "src/a.py", "commit": "c", "lang": "py",
         "content": "def a(): pass"},
        {"repo": "r", "path": "vendor/b.js", "commit": "c", "lang": "js",
         "content": "function b() {}"},
        {"repo": "r", "path": ".hidden/c.py", "commit": "c", "lang": "py",
         "content": "def c(): pass"},
    ]
    jp = str(tmp_path / "files.jsonl")
    with open(jp, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    cp = str(tmp_path / "files.csv")
    with open(cp, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    for p in (jp, cp):
        df = read_files(p).to_pandas()           # auto-sniffed format
        assert list(df.columns) == ["repo", "path", "commit", "lang",
                                    "content"]
        assert sorted(df.path) == ["src/a.py", "vendor/b.js"]  # hidden cut
        only_py = read_files(p, langs=["py"],
                             include_hidden=True).to_pandas()
        assert sorted(only_py.path) == [".hidden/c.py", "src/a.py"]


def test_flagship_runs_over_jsonl_corpus(tmp_path):
    """The full dedup pipeline over a JSONL files table must produce
    the same clusters as the identical Parquet table."""
    import json

    import pyarrow.parquet as pq2
    from image_deduper_ray.corpus import write_corpus
    from image_deduper_ray.pipelines.dedup import run_pipeline

    d, _ = write_corpus(str(tmp_path / "pq"), n_clusters=6)
    # re-encode the same table as JSONL
    jd = tmp_path / "jsonl"
    jd.mkdir()
    import os
    rows = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            rows.extend(pq2.read_table(os.path.join(d, f)).to_pylist())
    with open(jd / "files.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    res_pq = run_pipeline(d, str(tmp_path / "out_pq"))
    res_js = run_pipeline(str(jd), str(tmp_path / "out_js"))
    a = res_pq["clusters"].to_pandas().set_index("file_id")["cluster_id"]
    b = res_js["clusters"].to_pandas().set_index("file_id")["cluster_id"]
    assert a.sort_index().equals(b.sort_index())
