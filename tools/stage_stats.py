"""Per-stage wall-time profiler for any `queries()` entry — surfaces
Ray Data's `ds.stats()` so a slow stage is attributed to its operator
instead of guessed at (the feedback loop BASELINE.md's per-stage notes
come from).

Usage: python tools/stage_stats.py <query_name> [sf_dir]

Runs the query once (fresh local Ray session), forces execution, then
prints (a) the raw `Dataset.stats()` report when the result is a
Dataset, and (b) a one-line-per-operator summary sorted by wall time.
Non-Dataset results (driver-side frames) still report total wall time.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import importlib

    entry = importlib.import_module("__ray_entry__")
    qs = entry.queries()
    if name not in qs:
        print(f"unknown query {name!r}; {len(qs)} available")
        raise SystemExit(2)

    t0 = time.perf_counter()
    result = qs[name](sf_dir)
    is_ds = hasattr(result, "stats")
    if is_ds:
        result = result.materialize()
    wall = time.perf_counter() - t0
    print(f"== {name} @ {sf_dir}: {wall:.3f} s total ==")
    if is_ds:
        stats = result.stats()
        print(stats)
        # one-line-per-operator summary, sorted by wall time
        rows = []
        for m in re.finditer(
                r"(?:Operator|Stage) \d+ (\S+):.*?\n(.*?)(?=\n(?:Operator|Stage) \d|\Z)",
                stats, re.S):
            op, body = m.group(1), m.group(2)
            t = re.search(
                r"\* Remote wall time:.*?([\d.]+)(ms|s|us) max, "
                r"[\d.]+(?:ms|s|us) mean, ([\d.]+)(ms|s|us) total", body)
            if t:
                val, unit = float(t.group(3)), t.group(4)
                sec = val * {"s": 1, "ms": 1e-3, "us": 1e-6}[unit]
                rows.append((sec, op))
        if rows:
            print("-- operator remote wall-time totals (desc) --")
            for sec, op in sorted(rows, reverse=True):
                print(f"{sec:10.3f} s  {op}")
    ray.shutdown()


if __name__ == "__main__":
    main()
