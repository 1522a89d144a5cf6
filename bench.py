"""Benchmark driver. Prints ONE JSON line on stdout.

Default mode: ray.init(num_cpus=$RAY_GRAFT_CPUS or 32), run the
headline pipelines — the flagship code-dedup pipeline over a
deterministic synthetic corpus of the BASELINE.json input shape
(repo, path, commit, lang, content), plus the documents/embeddings
operator battery over $GRAFT_SF_DIR (default /root/testdata/sf0.1) —
and report per-query seconds.

--scaling: run the flagship dedup job in FRESH processes at two
parallelism levels (default num_cpus=2 and num_cpus=8, overridable via
RAY_GRAFT_SCALING_LEVELS="lo,hi"), several interleaved samples each
(RAY_GRAFT_SCALING_SAMPLES, default 3), and report per-level median
throughput (files/sec) plus scaling efficiency
(thr_hi / ((hi/lo) * thr_lo)) — the in-sandbox evidence for the
N-vs-4N cluster-size criterion (BASELINE.md).

Each child is CPU-PINNED (taskset -c 0-(n-1)) so level n really gets n
cores: without pinning, Arrow/parquet thread pools inside each worker
use every host core, silently inflating the low-cpu level and
corrupting the ratio. The scaling corpus defaults to
IDR_BENCH_CLUSTERS=48000 (~173k files) — large enough that per-stage
fixed costs (executor spin-up, checkpoint round-trips, actor-pool
startup; ~10-15 s/run) do not dominate the numerator.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# queries() entries the battery loop skips — MUST stay the only
# difference between the bench battery and __ray_entry__.queries()
# (pinned by tests/test_ops.py::test_bench_covers_every_query)
BENCH_SKIP = {"minhash_lsh_clusters"}  # flagship, measured separately
BENCH_CLUSTERS = int(os.environ.get("IDR_BENCH_CLUSTERS", "24000"))
CORPUS_DIR = f"/tmp/idr_bench_corpus_{BENCH_CLUSTERS}"


def _ensure_corpus() -> tuple[str, int]:
    """Deterministic synthetic input of the BASELINE.json shape, cached
    on disk (regenerating it is cheap but pointless per run)."""
    import pyarrow.parquet as pq

    marker = os.path.join(CORPUS_DIR, "_DONE")
    if not os.path.exists(marker):
        from image_deduper_ray.corpus import write_corpus

        shutil.rmtree(CORPUS_DIR, ignore_errors=True)
        write_corpus(CORPUS_DIR, n_clusters=BENCH_CLUSTERS,
                     rows_per_file=2000)
        open(marker, "w").close()
    n = sum(pq.ParquetFile(os.path.join(CORPUS_DIR, f)).metadata.num_rows
            for f in os.listdir(CORPUS_DIR) if f.endswith(".parquet"))
    return CORPUS_DIR, n


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _stage_walls(out_dir: str) -> dict[str, float]:
    """Per-stage wall seconds from the run's metrics checkpoint — the
    evidence that lets a reviewer attribute wall-clock variance (this
    host's memory bandwidth swings >2x between windows) to specific
    stages instead of guessing."""
    import pyarrow.parquet as pq

    d = os.path.join(out_dir, "metrics")
    walls: dict[str, float] = {}
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(d, f),
                                  columns=["stage", "wall_s"])
                for s, w in zip(t["stage"].to_pylist(),
                                t["wall_s"].to_pylist()):
                    walls[s] = round(walls.get(s, 0.0) + w, 2)
    return walls


def _run_flagship(num_cpus: int) -> tuple[float, int, dict]:
    """Full dedup pipeline on the bench corpus, fresh (no resume).
    Returns (wall_s, n_files, per-stage walls)."""
    from image_deduper_ray.config import DedupConfig
    from image_deduper_ray.pipelines.dedup import run_pipeline

    corpus, n_files = _ensure_corpus()
    out = f"/tmp/idr_bench_out_{num_cpus}"
    shutil.rmtree(out, ignore_errors=True)
    # min pool size = 3/4 width (1 below 4 cpus): the autoscaler ramps
    # slowly, and every second of ramp is a fixed cost that the high
    # parallelism level pays proportionally more of (capping N->4N
    # scaling efficiency) — but the floor must leave CPU headroom for
    # the upstream read tasks: a floor equal to num_cpus reserves every
    # core for actors and DEADLOCKS the pipeline at small cpu counts
    # (observed at num_cpus=2: two pinned SignatureStage actors, reader
    # starved forever). light checkpoints: the cheap edge stages stay
    # in the object store (production resume granularity is a config
    # choice, measured here at the throughput-oriented setting).
    floor = 1 if num_cpus < 4 else num_cpus - max(1, num_cpus // 4)
    cfg = DedupConfig(sig_concurrency=(floor, num_cpus),
                      checkpoint_mode="light")
    t0 = time.time()
    run_pipeline(corpus, out, cfg, resume=False)
    return time.time() - t0, n_files, _stage_walls(out)


def _consume(res) -> int:
    if hasattr(res, "to_pandas"):
        return len(res.to_pandas())
    return res.num_rows if hasattr(res, "num_rows") else len(res)


def main() -> None:
    if "--child" in sys.argv:
        num_cpus = int(sys.argv[sys.argv.index("--child") + 1])
        _init_ray(num_cpus)
        wall, n_files, stages = _run_flagship(num_cpus)
        print(json.dumps({"wall": wall, "files": n_files,
                          "stages": stages, "num_cpus": num_cpus}))
        import ray

        ray.shutdown()
        return

    if "--scaling" in sys.argv:
        levels = [int(x) for x in os.environ.get(
            "RAY_GRAFT_SCALING_LEVELS", "2,8").split(",")]
        samples = int(os.environ.get("RAY_GRAFT_SCALING_SAMPLES", "3"))
        clusters = os.environ.get("IDR_BENCH_CLUSTERS", "48000")
        if len(levels) != 2:
            raise SystemExit(
                f"RAY_GRAFT_SCALING_LEVELS must be exactly two "
                f"comma-separated cpu counts (lo,hi); got {levels!r}")
        lo, hi = levels
        have_taskset = shutil.which("taskset") is not None
        walls: dict[int, list[float]] = {n: [] for n in levels}
        stage_walls: dict[int, dict[str, list[float]]] = {n: {} for n in levels}
        files = None
        env = dict(os.environ, IDR_BENCH_CLUSTERS=clusters)
        for s in range(samples):
            for n in levels:            # interleaved: host drift hits both
                cmd = [sys.executable, __file__, "--child", str(n)]
                if have_taskset and n <= (os.cpu_count() or n):
                    cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
                out = subprocess.run(
                    cmd, capture_output=True, text=True, env=env,
                    cwd=os.path.dirname(os.path.abspath(__file__)))
                if out.returncode != 0:
                    sys.stderr.write(out.stderr[-4000:])
                    raise SystemExit(f"scaling child num_cpus={n} "
                                     f"failed rc={out.returncode}")
                r = json.loads(out.stdout.strip().splitlines()[-1])
                walls[n].append(round(r["wall"], 1))
                if files is not None and r["files"] != files:
                    raise SystemExit(
                        f"scaling children disagree on corpus size: "
                        f"{r['files']} vs {files} — stale corpus cache?")
                files = r["files"]
                for st, w in r.get("stages", {}).items():
                    stage_walls[n].setdefault(st, []).append(w)

        def med(xs):
            xs = sorted(xs)
            m = len(xs) // 2
            return xs[m] if len(xs) % 2 else (xs[m - 1] + xs[m]) / 2

        thr = {n: files / med(walls[n]) for n in levels}
        eff = thr[hi] / (thr[lo] * (hi / lo))
        print(json.dumps({
            "metric": "dedup_scaling_files_per_sec",
            "value": round(eff, 4), "unit": "efficiency",
            "sf": int(clusters),
            "files": files,
            "samples": samples,
            "pinned": have_taskset,
            "wall_samples": {str(n): walls[n] for n in levels},
            "stage_wall_medians": {
                str(n): {st: round(med(ws), 2)
                         for st, ws in sorted(stage_walls[n].items())}
                for n in levels},
            "stage_efficiency": {
                st: round((med(stage_walls[lo][st]) /
                           max(med(stage_walls[hi][st]), 1e-9)) / (hi / lo), 3)
                for st in sorted(stage_walls[lo])
                if st in stage_walls[hi]},
            "throughput_median": {str(n): round(thr[n], 1) for n in levels},
            "num_cpus": levels,
            "scaling_efficiency": round(eff, 4)}))
        return

    _init_ray(CPUS)
    import __ray_entry__ as entry

    timings: dict[str, float] = {}

    t0 = time.time()
    wall, n_files, flagship_stages = _run_flagship(CPUS)
    timings["flagship_code_dedup"] = round(wall, 3)
    files_per_sec = n_files / wall

    for name, fn in entry.queries().items():
        if name in BENCH_SKIP:
            continue
        t0 = time.time()
        try:
            _consume(fn(SF_DIR))
            timings[name] = round(time.time() - t0, 3)
        except Exception as ex:  # a broken query must not hide the rest
            print(f"bench query {name} failed: {ex}", file=sys.stderr)
            timings[name] = -1.0

    total = sum(v for v in timings.values() if v > 0)
    print(json.dumps({
        "metric": "dedup_files_per_sec",
        "value": round(files_per_sec, 1),
        "unit": "sec",
        "queries": timings,
        "total_sec": round(total, 3),
        "flagship_files": n_files,
        "flagship_stages": flagship_stages,
        "sf": SF_DIR,
        "num_cpus": CPUS}))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
