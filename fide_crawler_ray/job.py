"""``ray job submit`` entrypoint — the cluster-facing way to run the
crawl (BASELINE.json north_rule: "run via ray job submit on a
fixed-size multi-node Ray cluster").

On a real cluster:

    ray job submit --working-dir /path/to/repo -- \
        python -m fide_crawler_ray --out /shared/crawl \
            --players 4800 --queries 160 --months 24 \
            --shards 64 --fetch-concurrency 256 --resume

In this sandbox the same command runs against the local Ray instance
(`RAY_ADDRESS=local`); the entrypoint owns the Ray session only when
one does not already exist (Ray Job Server pre-initialises the driver
in cluster mode — `ray.init(address="auto")` inside a submitted job
attaches to it, so the guard below covers both paths). Library code
never calls ray.init (driver contract, __ray_entry__.py docstring).

The job prints one JSON line with pages, rows, wall time and per-shard
frontier metrics — the same shape bench.py emits — and exits non-zero
on failure, so schedulers can gate on it.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="fide_crawler_ray",
                                description="Ray-Data FIDE crawl job")
    p.add_argument("--out", required=True, help="output/checkpoint dir")
    p.add_argument("--players", type=int, default=48)
    p.add_argument("--queries", type=int, default=12)
    p.add_argument("--months", type=int, default=24)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--shards", type=int, default=4,
                   help="frontier shards (scale with cluster size)")
    p.add_argument("--fetch-concurrency", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--pop-budget", type=int, default=100_000,
                   help="pages per shard per epoch")
    p.add_argument("--resume", action="store_true",
                   help="resume from the out dir's checkpoint")
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--no-finalize", action="store_true",
                   help="skip normalize+dedup finalize")
    p.add_argument("--start-month", default=None)
    p.add_argument("--end-month", default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # standalone: local session; under Ray Job Server the driver is
        # already attached and this branch is skipped
        ray.init(include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fide_crawler_ray import synth
    from fide_crawler_ray.pipelines import crawl as CR

    cfg = synth.SiteConfig(seed=args.seed, n_players=args.players,
                           n_queries=args.queries, n_months=args.months)
    t0 = time.perf_counter()
    res = CR.run_crawl(
        cfg, args.out, n_shards=args.shards,
        fetch_concurrency=args.fetch_concurrency,
        batch_size=args.batch_size, pop_budget=args.pop_budget,
        resume=args.resume, max_epochs=args.max_epochs,
        finalize=not args.no_finalize,
        start_month=args.start_month, end_month=args.end_month,
    )
    sec = time.perf_counter() - t0
    gh = res.game_history()
    print(json.dumps({
        "pages": res.pages(),
        "pages_per_sec": round(res.pages() / sec, 1) if sec else None,
        "frontier_ops": res.frontier_ops(),
        "game_rows": gh.count() if gh is not None else 0,
        "wall_sec": round(sec, 3),
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
