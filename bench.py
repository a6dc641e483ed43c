"""Benchmark runner.

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and print ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

``--scaling``: run the headline extraction twice in FRESH subprocesses
(default num_cpus pair 2 and 8, same input) and report both
throughputs, raw + hardware-normalized scaling efficiency, and the
host burn-test calibration (BENCH/BASELINE.md protocol; target ≥ 0.8).

The headline input is a deterministic synthetic pages corpus (seeded,
cached under /tmp) sized to the scale factor: ~20 pages per documents
row → ~100k pages at sf0.1, written as multiple parquet files so
partitioning is real.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def ensure_bench_corpus(sf_dir: str) -> tuple[str, int]:
    """Deterministic pages corpus sized to the sf (cached)."""
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    n_pages = max(2_000, n_docs * 20)
    out = f"/tmp/graft_bench_pages_{n_pages}"
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        from pdf_extractor_ray.sources.pages import write_pages_corpus

        n_files = max(8, n_pages // 12_500)
        write_pages_corpus(out, n_rows=n_pages, n_files=n_files, seed=42)
        with open(marker, "w") as f:
            f.write(str(n_pages))
    return out, n_pages


def run_headline(corpus_dir: str, num_cpus: int) -> dict:
    """Extraction throughput over the bench corpus (consume = count by
    status; no driver materialization of text)."""
    import glob

    import ray

    from pdf_extractor_ray.pipelines.flagship import build_extraction_pipeline, extraction_summary

    paths = sorted(glob.glob(os.path.join(corpus_dir, "pages_*.parquet")))
    n_bytes_in = sum(os.path.getsize(p) for p in paths)
    # warm-up: full pass spins up every worker process + imports
    # kernels (excluded from the measurement, BASELINE.md protocol);
    # then best-of-reps to damp noisy-neighbor CPU steal on this host.
    build_extraction_pipeline(paths).count()
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    wall = float("inf")
    summary = None
    for _ in range(reps):
        t0 = time.monotonic()
        ds = build_extraction_pipeline(paths)
        s = extraction_summary(ds).to_pandas()
        wall_i = time.monotonic() - t0
        if wall_i < wall:
            wall, summary = wall_i, s
    n_docs = int(summary["n_docs"].sum())
    return {
        "wall_s": round(wall, 3),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / wall, 1),
        "mb_per_sec": round(n_bytes_in / wall / 1e6, 1),
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    """Per-query wall times for the registered operator suite.

    Each query is timed best-of-``$GRAFT_BENCH_REPS`` (default 3), and
    the reps are INTERLEAVED as full passes over the suite rather than
    run back-to-back: the host is a shared, throttled sandbox whose
    CPU-steal episodes last minutes (BENCH/BASELINE.md, rounds 3-5 —
    a round-5 consecutive-reps run read 66 s for a 21 s suite with a
    healthy PRE-run calibration), so three consecutive reps of one
    query all land inside the same bad minute, while passes put a
    query's reps ~a suite-length apart and the min escapes any episode
    shorter than the whole run. The suite is ~20 s, so 3× is
    affordable in the driver's one shot."""
    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    bench_set = [
        "q1_pricing_summary",
        "q3_top_building_orders",
        "q5_region_nation_revenue",
        "events_hourly",
        "dedup_exact_documents",
        "dedup_minhash_documents",
        "knn_cosine_topk",
        "doc_token_stats",
        "extract_flagship",
        "extract_fields_documents",
        "sessionize_events",
        # added round 4 (extraction → cross-doc paragraph dedup): the
        # suite TOTAL is therefore not comparable to r3 without
        # subtracting this entry — per-query columns are.
        "paragraph_dedup_documents",
    ]
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    times = {name: float("inf") for name in bench_set}
    for _ in range(reps):  # passes, not consecutive reps (see docstring)
        for name in bench_set:
            t0 = time.monotonic()
            result = qs[name](sf_dir)
            # consume lazily-built datasets without keeping data
            if hasattr(result, "count"):
                result.count()
            times[name] = min(times[name], time.monotonic() - t0)
    return {name: round(t, 3) for name, t in times.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()

    if args.scaling:
        run_scaling(args)
        return

    # burn-test calibration BEFORE ray.init (no contention with Ray
    # workers): how many effective cores the shared host delivers at
    # this process count right now. Printed in the JSON so a throttled
    # window is self-identifying — e.g. 18/32 means every wall time in
    # this run carries a ~1.8× host deficit vs a healthy window (~20+),
    # and the reader should compare against BENCH/BASELINE.md's
    # calibrated bands rather than raw prior rounds.
    cal_cores = host_effective_cores(args.cpus)

    import ray

    from pdf_extractor_ray.quiet import quiet_data_logs

    quiet_data_logs()
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    corpus, _ = ensure_bench_corpus(args.sf_dir)
    headline = run_headline(corpus, args.cpus)
    queries = {} if args.headline_only else run_queries(args.sf_dir)
    # second calibration AFTER the suite: the pair brackets the run, so
    # a throttle episode that began mid-run (invisible to the pre-run
    # burn) is still self-identifying in the JSON
    cal_after = host_effective_cores(args.cpus)

    total = headline["wall_s"] + sum(queries.values())
    out = {
        "metric": "docs/sec extraction throughput (byte-identical text per url)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"extract_headline": headline["wall_s"], **queries},
        "sf": args.sf_dir,
        "num_cpus": args.cpus,
        "docs_per_sec": headline["docs_per_sec"],
        "mb_per_sec": headline["mb_per_sec"],
        "headline_docs": headline["docs"],
        # host throttle self-identification: effective cores the burn
        # test measured at num_cpus procs, before and after the suite
        # (healthy ≈ 20-22/32; a low AFTER value flags a mid-run
        # throttle episode even when the pre-run read was healthy)
        "host_effective_cores": cal_cores,
        "host_effective_cores_after": cal_after,
        "bench_reps": int(os.environ.get("GRAFT_BENCH_REPS", "3")),
    }
    print(json.dumps(out))
    ray.shutdown()


def host_effective_cores(n_procs: int) -> float:
    """Calibrate what the (shared, throttled) host actually delivers at
    a given process count — pure-python burn, no Ray. Reported alongside
    the scaling numbers so the reader can separate engine scaling from
    host-ceiling effects."""
    import multiprocessing as mp

    def burn(q):
        t0 = time.monotonic()
        x = 0
        for i in range(20_000_000):
            x += i
        q.put(time.monotonic() - t0)

    q = mp.Queue()
    p = mp.Process(target=burn, args=(q,))
    p.start()
    p.join()
    t_one = q.get()
    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(n_procs)]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    wall = time.monotonic() - t0
    return round(n_procs * t_one / wall, 1)


def run_scaling(args) -> None:
    """Fresh process per parallelism level, same input, full warm-up +
    best-of-3 reps per level (protocol in BENCH/BASELINE.md). Default
    pair is (cpus/16, cpus/4) = 2 and 8 on a 32-vCPU host: on this
    throttled shared host, higher levels (16+) hit visible core-ceiling
    effects that corrupt the RAW ratio even when the hw-normalized one
    is ~1.0 — BENCH/BASELINE.md records both pairs' measurements, and
    every run prints the burn-test calibration + both efficiency
    readings."""
    low = max(2, args.cpus // 16)
    high = low * 4
    results = {}
    for cpus in (low, high):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--headline-only", "--cpus", str(cpus), "--sf-dir", args.sf_dir],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=3600,
        )
        json_lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not json_lines:
            sys.stderr.write(f"scaling subprocess (cpus={cpus}) failed rc={proc.returncode}\n")
            sys.stderr.write(proc.stderr[-2000:] + "\n")
            raise SystemExit(1)
        results[cpus] = json.loads(json_lines[-1])
    tp_low = results[low]["docs_per_sec"]
    tp_high = results[high]["docs_per_sec"]
    eff = (tp_high / tp_low) / (high / low)
    cores_low = host_effective_cores(low)
    cores_high = host_effective_cores(high)
    # the sandbox host is throttled/noisy: it often delivers well under
    # its nominal vCPUs, and unevenly across levels. The hw-normalized
    # efficiency divides by the cores the host ACTUALLY provided (pure
    # python burn calibration) — the number a real fixed-size cluster
    # comparison would see.
    eff_hw = (tp_high / tp_low) / (cores_high / cores_low) if cores_low else None
    out = {
        "metric": "scaling efficiency (docs/sec, fresh processes, same input)",
        "cpus_low": low,
        "cpus_high": high,
        "docs_per_sec_low": tp_low,
        "docs_per_sec_high": tp_high,
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_hw_normalized": round(eff_hw, 3) if eff_hw else None,
        "target": 0.8,
        "host_effective_cores_low": cores_low,
        "host_effective_cores_high": cores_high,
        "sf": args.sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
