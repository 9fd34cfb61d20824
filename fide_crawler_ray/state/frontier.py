"""Frontier shard actors: politeness heaps + robots + URL-seen + fetch log.

The engine's central stateful stage (SURVEY.md §4, ST2-ST4). The frontier
is sharded by ``crc32(host) % n_shards`` (NOT Python ``hash()``, which is
PYTHONHASHSEED-dependent — routing must be stable across processes and
restarts or resumed per-host state lands on the wrong shards) so each
host's politeness state
(next-fetch time, robots rules) lives in exactly one actor — per-host
crawl rate is politeness-bound no matter how many workers exist, so
sharding a single host finer cannot speed it up; breadth across hosts is
where parallelism comes from. Hot-host *offer* traffic (fide.com
dominates; BASELINE.json north_star) is absorbed by the callers: the
link-routing stage partitions each Arrow batch by shard and issues
concurrent ``offer`` calls from every fetch task, so no driver-side or
single-queue bottleneck exists on the enqueue path.

Politeness uses VIRTUAL time (microseconds): ``pop_ready`` assigns each
URL a fetch timestamp ≥ host_next_vts and advances the host clock by the
politeness gap — reproducing the reference's one-connection-per-host
sequential behavior and its 1 req/s budget
(reference: old_scripts/fide-games-scraper-public.py:22-23, :160) without
real sleeping. Determinism: within a host, URLs pop in crawl-priority
order; across hosts, by (host_next_vts, host). The shard records a fetch
log so tests can verify exact crawl ordering against the sequential
reference order (refsem.crawl).

robots.txt handling is engine-added behavior required by the north_rule
(the reference has none): rules are fetched once per host by the crawl
driver, parsed, and pushed into the owning shard; offers matching a
disallowed path prefix are dropped and counted.
"""

from __future__ import annotations

import heapq
import zlib
from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray

from .cuckoo import SeenSet, sha1_bytes_to_array

URL_FIELDS = ["url", "host", "url_hash", "kind", "fide_id", "period",
              "player_name", "priority"]


def shard_of(host: str, n_shards: int) -> int:
    return zlib.crc32(host.encode()) % n_shards


@ray.remote(num_cpus=0)
class FrontierShard:
    """One shard of the distributed frontier (see module docstring).

    num_cpus=0: shards are lightweight coordinators (heap ops + filter
    probes, milliseconds per call); reserving fractional CPUs for them
    starves the fetch/parse task pool on small clusters (8 shards × 0.1
    CPU consumed 40% of a 2-CPU cluster)."""

    def __init__(self, shard_id: int, n_shards: int,
                 politeness_gap_us: int = 1_000_000,
                 seen_capacity: int = 1 << 16,
                 seen_max_inmem: int = 1 << 20,
                 record_log: bool = False):
        self.shard_id = shard_id
        self.n_shards = n_shards
        self.gap_us = politeness_gap_us
        self.seen = SeenSet(capacity=seen_capacity, max_inmem=seen_max_inmem)
        self.heaps: dict[str, list] = defaultdict(list)  # host → [(priority, row)]
        self.host_next_vts: dict[str, int] = defaultdict(int)
        # host-level selection heap: (next_vts, host) for every host with
        # pending URLs, membership-tracked so each host appears once.
        # pop_ready is O(log H) per host selection; the r1 version
        # re-listed and re-sorted every live host per outer iteration —
        # O(H² log H) per epoch in the breadth-across-hosts regime the
        # module docstring names as the parallelism source.
        self.host_heap: list[tuple[int, str]] = []
        self.hosts_in_heap: set[str] = set()
        self.robots: dict[str, list[str]] = {}  # host → disallow path prefixes
        # fetch log: OPT-IN (ordering tests only). On the production path
        # it would be an O(total-pops) memory leak inside the most
        # critical actor at a 10^10-URL frontier, so it defaults off and
        # is excluded from snapshots when disabled.
        self.record_log = record_log
        self.fetch_log: list[tuple[int, int, str]] = []  # (vts, priority, url)
        self.counters = defaultdict(int)

    # ------------------------------------------------------------- robots
    def set_robots(self, host: str, disallow_prefixes: list[str]) -> None:
        self.robots[host] = list(disallow_prefixes)

    def _robots_allowed(self, host: str, url: str) -> bool:
        rules = self.robots.get(host)
        if not rules:
            return True
        path = url.split("//", 1)[-1]
        path = "/" + path.split("/", 1)[1] if "/" in path else "/"
        return not any(path.startswith(p) for p in rules)

    # -------------------------------------------------------------- offer
    def offer(self, rows: pa.Table) -> dict:
        """Enqueue unseen, robots-allowed URL rows. Returns counters.

        Hot path for the dominant host (all of its offers serialize into
        this one actor): columnar extraction (`to_pylist` per column,
        C-level) instead of per-cell `.as_py()`, and heap entries are
        (priority, url, row-tuple) — no per-row dict building."""
        n = rows.num_rows
        self.counters["offered"] += n
        if n == 0:
            return {"offered": 0, "enqueued": 0}
        cols = [rows[f].to_pylist() for f in URL_FIELDS]
        hosts = cols[1]
        urls = cols[0]
        prios = cols[7]
        hashes = sha1_bytes_to_array(cols[2])  # one extraction, shared layout
        robots_ok = np.ones(n, dtype=bool)
        # only ROWS whose host carries rules pay the per-row path check
        rule_hosts = {h for h, r in self.robots.items() if r}
        if rule_hosts:
            for j in range(n):
                h = hosts[j]
                if h in rule_hosts and not self._robots_allowed(h, urls[j]):
                    robots_ok[j] = False
        self.counters["robots_dropped"] += int((~robots_ok).sum())
        # seen-check only robots-allowed urls (a disallowed url stays
        # unseen: a later robots change could admit it)
        idx = np.flatnonzero(robots_ok)
        already = np.ones(n, dtype=bool)
        if len(idx):
            already[idx] = self.seen.check_and_add(hashes[idx])
        self.counters["dup_dropped"] += int(already[idx].sum())
        enq = 0
        for j in np.flatnonzero(~already):
            h = hosts[j]
            heap = self.heaps[h]
            heapq.heappush(heap, (prios[j], urls[j], tuple(c[j] for c in cols)))
            if h not in self.hosts_in_heap:
                heapq.heappush(self.host_heap, (self.host_next_vts[h], h))
                self.hosts_in_heap.add(h)
            enq += 1
        self.counters["enqueued"] += enq
        return {"offered": n, "enqueued": enq}

    def mark_seen(self, rows: pa.Table) -> int:
        """Insert URL hashes into the seen set WITHOUT enqueuing — the
        store-cache pre-seed path (ST2): URLs whose content the store
        already holds are never fetched again."""
        n = rows.num_rows
        if n == 0:
            return 0
        hashes = sha1_bytes_to_array(rows["url_hash"].to_pylist())
        already = self.seen.check_and_add(hashes)
        added = int((~already).sum())
        self.counters["cache_preseeded"] += added
        return added

    # --------------------------------------------------------------- pop
    def pop_ready(self, max_n: int) -> pa.Table | None:
        """Pop up to max_n URLs in politeness order, assigning virtual
        fetch timestamps. Deterministic: host with smallest
        (next_vts, host) first; within host, ascending priority.

        The inner loop drains one host as long as it stays the earliest
        host — for a dominant host that makes the loop a tight
        heappop-per-URL with no host re-selection cost."""
        out_rows: list[tuple] = []
        out_vts: list[int] = []
        while len(out_rows) < max_n and self.host_heap:
            _, host = heapq.heappop(self.host_heap)
            self.hosts_in_heap.discard(host)
            heap = self.heaps.get(host)
            if not heap:  # drained by a previous call in this epoch
                self.heaps.pop(host, None)
                continue
            # the runner-up host's entry is accurate (vts only changes
            # here, and changed hosts are re-pushed with the new value)
            nxt = self.host_heap[0] if self.host_heap else None
            vts = self.host_next_vts[host]
            # drain while this host still wins the (vts, host) tiebreak
            while heap and len(out_rows) < max_n and (
                nxt is None or (vts, host) < nxt
            ):
                prio, url, row = heapq.heappop(heap)
                if self.record_log:
                    self.fetch_log.append((vts, prio, url))
                out_rows.append(row)
                out_vts.append(vts)
                vts += self.gap_us
            self.host_next_vts[host] = vts
            if heap:
                heapq.heappush(self.host_heap, (vts, host))
                self.hosts_in_heap.add(host)
            else:
                # delete drained hosts (politeness clock survives in
                # host_next_vts) so H never inflates across the run
                self.heaps.pop(host, None)
        self.counters["popped"] += len(out_rows)
        if not out_rows:
            return None
        cols = list(zip(*out_rows))  # columnar transpose, C-level
        t = pa.table(
            {
                "url": pa.array(cols[0], pa.string()),
                "host": pa.array(cols[1], pa.string()),
                "url_hash": pa.array(cols[2], pa.binary(20)),
                "kind": pa.array(cols[3], pa.string()),
                "fide_id": pa.array(cols[4], pa.string()),
                "period": pa.array(cols[5], pa.string()),
                "player_name": pa.array(cols[6], pa.string()),
                "priority": pa.array(cols[7], pa.int64()),
                "next_fetch_vts": pa.array(out_vts, pa.int64()),
            }
        )
        return t

    # ------------------------------------------------------------- status
    def pending(self) -> int:
        return sum(len(h) for h in self.heaps.values())

    def stats(self) -> dict:
        return dict(self.counters, pending=self.pending(), shard=self.shard_id,
                    seen=self.seen.n)

    def get_fetch_log(self) -> list[tuple[int, int, str]]:
        return list(self.fetch_log)

    def seen_hashes(self) -> list[bytes]:
        return self.seen.all_hashes()

    # --------------------------------------------------------- checkpoint
    def snapshot(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "gap_us": self.gap_us,
            "pending": {h: list(hp) for h, hp in self.heaps.items() if hp},
            "host_next_vts": dict(self.host_next_vts),
            "robots": dict(self.robots),
            "seen": self.seen.state(),
            "record_log": self.record_log,
            "fetch_log": list(self.fetch_log) if self.record_log else [],
            "counters": dict(self.counters),
        }

    def restore(self, snap: dict) -> None:
        self.gap_us = snap["gap_us"]
        self.heaps = defaultdict(list)
        self.host_heap = []
        self.hosts_in_heap = set()
        for h, entries in snap["pending"].items():
            self.heaps[h] = [tuple(e) for e in entries]
            heapq.heapify(self.heaps[h])
        self.host_next_vts = defaultdict(int, snap["host_next_vts"])
        for h in self.heaps:
            heapq.heappush(self.host_heap, (self.host_next_vts[h], h))
            self.hosts_in_heap.add(h)
        self.robots = dict(snap["robots"])
        self.seen = SeenSet.from_state(snap["seen"])
        if self.record_log and not snap.get("record_log", False):
            # the pre-checkpoint pops were never recorded: an ordering
            # log resumed from this snapshot would silently present a
            # TRUNCATED crawl order as complete — refuse instead
            raise ValueError(
                "record_log=True resume from a snapshot written with "
                "record_log=False: the earlier crawl order is unrecoverable"
            )
        self.fetch_log = ([tuple(e) for e in snap["fetch_log"]]
                          if self.record_log else [])
        self.counters = defaultdict(int, snap["counters"])
