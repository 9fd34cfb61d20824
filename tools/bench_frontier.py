"""Frontier-tier stress bench: offers/sec + pops/sec through the REAL
SeenFilterShard / FrontierShard actor banks, at a frontier far past what
the page-crawl bench reaches — the direct evidence for BASELINE.json's
"frontier-ops/sec ... at 10^10-URL frontier scale" metric.

Workload (fide.com-dominance shape per the north rule): N_URLS unique
synthetic URLs, HOT_FRAC on one host, the rest uniform over COLD_HOSTS;
offers arrive in batches through the salted seen bank (robots + cuckoo +
exact LSM tier test-and-insert) → host-sharded frontier heaps (pending
SPILL TIER ON, so the 10^10 path — bounded in-memory heaps + sorted
chunk files — is what's measured, not an unbounded dict). Then:

- a 50% duplicate re-offer wave (the dominant frontier traffic at
  10^10: most discovered URLs are already seen);
- pop waves draining the frontier in politeness order.

Reports per-phase ops/sec plus per-URL memory in the seen tier
(in-memory uint64 pairs + spilled segment bytes) for the 10^10
extrapolation recorded in BASELINE.md.

Usage: python tools/bench_frontier.py [n_urls] [n_cpus]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILTERS = 8
N_SHARDS = 8
BATCH = 50_000
HOT_FRAC = 0.8
COLD_HOSTS = 10_000


def _url_batch(start: int, n: int) -> pa.Table:
    """Deterministic synthetic URL rows (URL_FIELDS schema)."""
    from fide_crawler_ray.stages.urls import pack_priority

    idx = np.arange(start, start + n)
    hot = (idx % 10) < int(HOT_FRAC * 10)
    hosts = np.where(
        hot, "ratings.fide.com",
        np.char.add("h", ((idx * 2654435761) % COLD_HOSTS).astype(str)))
    urls = np.char.add(
        np.char.add("https://", hosts),
        np.char.add("/profile/", idx.astype(str)))
    hashes = [hashlib.sha1(u.encode()).digest() for u in urls.tolist()]
    prios = [pack_priority(int(i) % 512, int(i) % 100, 2, int(i) % 64)
             for i in idx]
    return pa.table({
        "url": pa.array(urls.tolist(), pa.string()),
        "host": pa.array(hosts.tolist(), pa.string()),
        "url_hash": pa.array(hashes, pa.binary()),
        "kind": pa.array(["profile"] * n, pa.string()),
        "fide_id": pa.array((idx % 1_000_000).astype(str).tolist(),
                            pa.string()),
        "period": pa.array(["2024-01"] * n, pa.string()),
        "player_name": pa.array(["p"] * n, pa.string()),
        "priority": pa.array(prios, pa.int64()),
    })


def run(n_urls: int, n_cpus: int) -> dict:
    """Run the stress phases inside the CALLER's Ray session and return
    the metrics dict (``main`` owns init/print for standalone use; the
    default ``bench.py`` run embeds this as its ``frontier`` block so
    every round's driver artifact carries the north-metric numbers)."""
    import ray

    from fide_crawler_ray.state.frontier import (FrontierShard,
                                                 SeenFilterShard,
                                                 salt_of_hashes, shard_of)
    from fide_crawler_ray.state.cuckoo import sha1_bytes_to_array

    spill_dir = "/tmp/fcray_frontier_bench_spill"
    shutil.rmtree(spill_dir, ignore_errors=True)
    # seen_max_inmem is deliberately small so the sorted-segment spill
    # tier (the 10^10 path: 16 B/URL numpy pairs + per-segment blooms)
    # is what gets measured, not the in-memory python-set tier
    filters = [SeenFilterShard.remote(i, N_FILTERS,
                                      seen_capacity=1 << 20,
                                      seen_max_inmem=1 << 15)
               for i in range(N_FILTERS)]
    shards = [FrontierShard.remote(i, N_SHARDS, politeness_gap_us=1_000,
                                   max_pending_inmem=200_000,
                                   spill_dir=spill_dir)
              for i in range(N_SHARDS)]

    def offer_wave(tables) -> int:
        """Salt-partition each batch across the filter bank, route the
        admitted rows to frontier shards by host; returns rows offered."""
        total = 0
        admit_refs = []
        for t in tables:
            total += t.num_rows
            hashes = sha1_bytes_to_array(t["url_hash"].to_pylist())
            salts = salt_of_hashes(hashes, N_FILTERS)
            for f in range(N_FILTERS):
                part = t.filter(pa.array(salts == f))
                if part.num_rows:
                    admit_refs.append(filters[f].admit.remote(part))
        enq_refs = []
        for adm in ray.get(admit_refs):
            if adm.num_rows == 0:
                continue
            hosts = adm["host"].to_pylist()
            sh = np.array([shard_of(h, N_SHARDS) for h in hosts])
            for s in range(N_SHARDS):
                part = adm.filter(pa.array(sh == s))
                if part.num_rows:
                    enq_refs.append(shards[s].offer.remote(part))
        ray.get(enq_refs)
        return total

    # phase 1: fresh offers. Batches are PRE-BUILT so the driver-side
    # synthetic URL generation (python sha1 loop, ~75k rows/s — not an
    # engine component) stays OUTSIDE the timed phases; this bounds a
    # single run to ~2M unique URLs of driver memory. In the real crawl
    # the equivalent work (canonicalize+SHA1) runs vectorized inside
    # distributed map_batches stages, not on a driver thread.
    batches = [_url_batch(i, min(BATCH, n_urls - i))
               for i in range(0, n_urls, BATCH)]
    t0 = time.perf_counter()
    offered = offer_wave(batches)
    t_fresh = time.perf_counter() - t0
    del batches

    # phase 2: 50% duplicate re-offer (the steady-state frontier mix)
    mixed = [pa.concat_tables([
        _url_batch(i, min(BATCH, n_urls // 2 - i)),
        _url_batch(n_urls + i, min(BATCH, n_urls // 2 - i))])
        for i in range(0, n_urls // 2, BATCH)]
    t0 = time.perf_counter()
    re_offered = offer_wave(mixed)
    t_mixed = time.perf_counter() - t0
    del mixed

    # spill-tier accounting at PEAK PENDING (before the drain): chunk
    # files are append-only for resume-safety, so measuring after the
    # pops would report cumulative-ever-spilled as if it were pending
    shard_stats = ray.get([s.stats.remote() for s in shards])
    spilled_urls = sum(st.get("spilled", 0) for st in shard_stats)
    peak_spill_bytes = sum(
        os.path.getsize(os.path.join(spill_dir, f))
        for f in os.listdir(spill_dir)) if os.path.isdir(spill_dir) else 0

    # phase 3: pop everything in politeness order
    t0 = time.perf_counter()
    popped = 0
    while True:
        outs = ray.get([s.pop_ready.remote(20_000) for s in shards])
        got = sum(o.num_rows for o in outs if o is not None)
        if got == 0:
            break
        popped += got
    t_pop = time.perf_counter() - t0

    # memory accounting in the seen tier — MEASURED from the shards
    stats = ray.get([f.seen_stats.remote() for f in filters])
    seen_n = sum(st["n_seen"] for st in stats)
    seen_bytes = sum(st["exact_inmem_bytes"] + st["segment_bytes"]
                     + st["bloom_bytes"] + st["cuckoo_bytes"]
                     for st in stats)

    out = {
        "n_cpus": n_cpus, "n_urls": n_urls,
        "fresh_offers_per_sec": round(offered / t_fresh, 1),
        "mixed_offers_per_sec": round(re_offered / t_mixed, 1),
        "pops_per_sec": round(popped / t_pop, 1),
        "popped": popped,
        "seen_n": seen_n,
        "seen_bytes": seen_bytes,
        "seen_bytes_per_url": round(seen_bytes / max(1, seen_n), 1),
        "seen_segments": sum(st["segments"] for st in stats),
        "peak_spill_bytes": peak_spill_bytes,
        "spilled_urls": spilled_urls,
        "spill_bytes_per_spilled_url": round(
            peak_spill_bytes / max(1, spilled_urls), 1),
    }
    shutil.rmtree(spill_dir, ignore_errors=True)
    for a in filters + shards:
        ray.kill(a)
    return out


def main(n_urls: int, n_cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=n_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    print(json.dumps(run(n_urls, n_cpus)))
    ray.shutdown()


if __name__ == "__main__":
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    main(n_urls, n_cpus)
