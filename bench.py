"""Benchmark harness: headline crawl + operator suite over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "crawl": {"pages": P, "pages_per_sec": ..., "frontier_ops_per_sec": ...},
   "frontier": {offers/pops per sec + seen/spill bytes from a 300k-URL
                stress through the real actor banks — the north-metric
                numbers, in every round's driver artifact; excluded
                from "value" so suite totals stay comparable}}

`python bench.py --scaling` runs the same bench in two fresh processes at
num_cpus=8 and num_cpus=32 (the sandbox stand-in for N vs 4N node
clusters) and reports both throughputs plus scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def run_scaling_workload() -> dict:
    """The two-parallelism-level workload: a compute-bound crawl (heavy
    pages: ~700 spans, ~170 games each, ~2.8 ms fetch+parse per page —
    was ~9 ms before the vectorized calc parser — × 120k pages ≈ 340
    CPU-seconds) so throughput actually tracks CPUs — the sf0.1
    operator suite is fixed-overhead-dominated and cannot evidence
    scaling. Store writes are disabled here (persist_games=False):
    on one box they bottleneck on the single shared disk, a resource that
    scales with node count on the real N vs 4N clusters this measurement
    stands in for; full-pipeline numbers are recorded in BASELINE.md."""
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fide_crawler_ray import synth
    from fide_crawler_ray.pipelines import crawl as CR

    cfg = synth.SiteConfig(
        seed=42, n_players=4800, n_queries=160, n_months=24,
        games_lo=50, games_hi=90, max_tournaments_per_month=5,
    )
    # FCRAY_SCALE_PERSIST=1 turns parquet game stores ON (the 100-TB
    # contract includes writes); pair it with a tmpfs FCRAY_SCALE_OUT
    # (e.g. /dev/shm) so the single shared disk doesn't masquerade as
    # an engine bottleneck — on the real N vs 4N clusters, disks scale
    # with node count.
    persist = os.environ.get("FCRAY_SCALE_PERSIST", "0") == "1"
    out_base = os.environ.get("FCRAY_SCALE_OUT", "/tmp")
    out_dir = f"{out_base}/fcray_scale_{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    res = CR.run_crawl(
        cfg, out_dir, n_shards=8, batch_size=256,
        fetch_concurrency=max(2, num_cpus), pop_budget=60_000,
        persist_docs=False, persist_games=persist, checkpoint_every=0,
        finalize=False,
    )
    sec = time.perf_counter() - t0
    pages = res.pages()
    out = {
        "metric": "heavy-crawl wall time", "value": round(sec, 3),
        "unit": "sec", "queries": {"crawl": round(sec, 3)},
        "sf": "synthetic-heavy", "num_cpus": num_cpus,
        "crawl": {
            "pages": pages,
            "pages_per_sec": round(pages / sec, 1),
            "frontier_ops": res.frontier_ops(),
            "frontier_ops_per_sec": round(res.frontier_ops() / sec, 1),
        },
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    return out


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from fide_crawler_ray import synth
    from fide_crawler_ray.pipelines import crawl as CR
    from fide_crawler_ray.pipelines import queries as Q

    # warm the page cache with one untimed read
    Q.T(sf_dir, "lineitem").count()

    timings: dict[str, float] = {}

    # ---- headline: synthetic crawl (pages/sec + frontier-ops/sec)
    cfg = synth.SiteConfig(seed=42, n_players=48, n_queries=12, n_months=24)
    out_dir = f"/tmp/fcray_bench_{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    res = CR.run_crawl(
        cfg, out_dir, n_shards=4,
        fetch_concurrency=max(2, num_cpus // 4),
        batch_size=64, pop_budget=1_000_000,
    )
    crawl_sec = time.perf_counter() - t0
    pages = res.pages()
    fops = res.frontier_ops()
    timings["crawl"] = round(crawl_sec, 3)

    # ---- operator suite over the sf dir
    suite = [
        "a5_grouped_multi_agg", "a10_rollup", "a1_first_last",
        "d1_exact_dedup", "o2_topk", "j1_broadcast_join",
        "text_token_stats", "text_quality", "dedup_exact_text",
        "ann_bruteforce", "events_sessionize", "dedup_minhash",
        "j_inner_join", "asof_join", "window_functions", "term_doc_freq",
        "range_join", "similarity_join", "span_dedup", "embedding_kmeans",
        "table_diff", "above_customer_avg", "pagerank", "triangle_count",
        # r3 additions — one stage per new machinery class: md5-derived
        # replicate weights, partitioned two-pointer windows, actor-pool
        # inference + join, skew-salted join, basket self-merge pairs,
        # contingency-fold privacy audit
        "bootstrap_ci", "window_range_sum", "confusion_matrix",
        "salted_join", "frequent_itemsets", "t_closeness",
        # late-r3 machinery: datelist-bitmask sliding distinct count
        # (link_prediction is benchmarked in BASELINE.md but kept out
        # of the suite: its 3M-wedge expansion runs 8-12 s on this
        # host and would swamp the total with host variance)
        "sliding_distinct_types",
        # tenth-session machinery: corpus-keyed keep-first winner
        # groupby + per-doc reassembly (C4 span dedup)
        "span_keep_first",
        # fifth-session machinery: REAL PNG encode→decode round trip
        # (pure-python codec, actor-pool stage) and the Q×N sorted
        # suffix-scan valuation
        "png_pixel_stats", "knn_shapley",
        # r4 machinery: REAL baseline-JPEG encode→decode round trip
        # (pure-python codec, actor pool) and the M17 dp-table rollup
        "jpeg_pixel_stats", "perf_rating_dp",
        # r5: "embedding_kmeans" became the deterministic zero-Lloyd
        # driver query; the 5-round distributed Lloyd workload it used
        # to time (actor/task spin per round) stays measured here under
        # its new name so the signal survives across rounds
        "embedding_kmeans_lloyd",
    ]
    qs = Q.queries()
    for name in suite:
        t0 = time.perf_counter()
        r = qs[name](sf_dir)
        # force execution without driver materialization of big results
        if hasattr(r, "count"):
            r.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    # ---- frontier-tier stress (north metric): offers/pops through the
    # REAL actor banks with the seen-spill tier ON. Sized to ~5 s so the
    # per-round driver artifact carries the ops/s + bytes/URL numbers
    # (the full 1.5M-URL run stays available via `bench.py --frontier`).
    # Deliberately NOT part of `value`: the suite total stays comparable
    # across rounds.
    from tools.bench_frontier import run as _frontier_run

    frontier = _frontier_run(
        int(os.environ.get("FCRAY_FRONTIER_SUITE_URLS", "300000")),
        num_cpus)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "crawl+operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "num_cpus": num_cpus,
        "crawl": {
            "pages": pages,
            "pages_per_sec": round(pages / crawl_sec, 1),
            "frontier_ops": fops,
            "frontier_ops_per_sec": round(fops / crawl_sec, 1),
        },
        "frontier": frontier,
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    return result


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def host_scaling_control(lo: int, hi: int, per: int = 12_000_000) -> dict:
    """Zero-Ray, zero-engine control: N multiprocessing workers burning
    pure-Python CPU. On a dedicated box this reads ~1.0 efficiency from
    lo→hi workers; on THIS sandbox it reads ~0.7 at 8→32 (the nominal
    32 cores are oversubscribed vCPUs), which bounds what ANY engine can
    measure at that pair. The crawl's raw 8v32 number is therefore
    reported alongside this control and as a normalized ratio
    (raw / control) — the engine's own contribution to the scaling
    loss."""
    import multiprocessing as mp
    import time as _t

    def run(workers: int) -> float:
        t0 = _t.perf_counter()
        with mp.Pool(workers) as p:
            p.map(_burn, [per] * workers)
        return workers * per / (_t.perf_counter() - t0)

    r_lo, r_hi = run(lo), run(hi)
    return {"ops_lo": round(r_lo / 1e6, 1), "ops_hi": round(r_hi / 1e6, 1),
            "control_efficiency": round(r_hi / r_lo / (hi / lo), 3)}


def run_scaling() -> None:
    """Same job, same input, fresh processes at num_cpus=8 and 32 (the
    sandbox stand-in for N vs 4N node clusters).

    The sandbox host drifts 3–8× slower for minutes at a time
    (documented in BASELINE.md with a fixed-code control run), and the
    two legs run minutes apart — one un-repeated pair can measure the
    host's phase, not the engine (observed: a 2-leg in a fast window +
    an 8-leg in a slow one read 0.48 where healthy repeats read ~0.9).
    So legs are INTERLEAVED (lo, hi, lo, hi, …) and each level takes
    its BEST wall time over FCRAY_SCALE_REPEATS rounds (default 2):
    best-of-N estimates the unloaded-host time for both levels alike —
    it does not favor either leg."""
    import subprocess

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   FCRAY_BENCH_MODE="scaling-workload")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    levels = os.environ.get("FCRAY_SCALE_LEVELS", "8,32")
    repeats = int(os.environ.get("FCRAY_SCALE_REPEATS", "2"))
    lo, hi = (int(x) for x in levels.split(","))
    runs_lo, runs_hi = [], []
    for _ in range(repeats):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    control = host_scaling_control(lo, hi)
    print(json.dumps({
        f"sec_{lo}": t_lo, f"sec_{hi}": t_hi,
        f"sec_{lo}_runs": [r["value"] for r in runs_lo],
        f"sec_{hi}_runs": [r["value"] for r in runs_hi],
        f"throughput_{lo}": round(1.0 / t_lo, 6),
        f"throughput_{hi}": round(1.0 / t_hi, 6),
        f"pages_per_sec_{lo}": r_lo["crawl"]["pages_per_sec"],
        f"pages_per_sec_{hi}": r_hi["crawl"]["pages_per_sec"],
        "levels": [lo, hi],
        "repeats": repeats,
        "scaling_efficiency": round(eff, 3),
        "host_control": control,
        "normalized_efficiency": round(
            eff / control["control_efficiency"], 3),
        "pages": r_hi["crawl"]["pages"],
    }))


if __name__ == "__main__":
    if "--frontier" in sys.argv:
        # frontier-tier stress (offers/pops through the real actor
        # banks + measured per-URL memory) — see tools/bench_frontier.py
        from tools.bench_frontier import main as _frontier_main

        _frontier_main(int(os.environ.get("FCRAY_FRONTIER_URLS",
                                          "1000000")),
                       int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    elif "--scaling" in sys.argv:
        run_scaling()
    elif os.environ.get("FCRAY_BENCH_MODE") == "scaling-workload":
        print(json.dumps(run_scaling_workload()))
    else:
        print(json.dumps(run_bench()))
