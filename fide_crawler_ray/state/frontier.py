"""Frontier actors: salted URL-seen bank + politeness shards + fetch log.

The engine's central stateful stage (SURVEY.md §4, ST2-ST4), split into
two actor banks with DIFFERENT partitioning keys:

- ``SeenFilterShard`` — the authoritative URL-seen set, partitioned by a
  SALT derived from the SHA1 url_hash (host-independent). This is the
  north rule's "explicit salting for hot-host skew": offer traffic is
  duplicate-dominated and all of it for fide.com would otherwise
  serialize into the one actor that owns the host. Hash-salting spreads
  the dedup work uniformly across the bank no matter how skewed the host
  distribution is; only the already-deduplicated survivors (bounded by
  the true frontier growth, not by offer volume) reach the host-owned
  politeness shard. robots.txt rules are replicated into every filter
  (write-once per run, tiny) and applied BEFORE the seen-insert so a
  disallowed URL stays unseen — a later robots change could admit it.

- ``FrontierShard`` — per-host politeness state, sharded by
  ``crc32(host) % n_shards`` (NOT Python ``hash()``, which is
  PYTHONHASHSEED-dependent — routing must be stable across processes and
  restarts or resumed per-host state lands on the wrong shards) so each
  host's next-fetch clock lives in exactly one actor — per-host crawl
  rate is politeness-bound no matter how many workers exist, so sharding
  a single host finer cannot speed it up; breadth across hosts is where
  pop parallelism comes from. Its ``offer`` is now enqueue-only (heap
  push of pre-deduplicated rows), so the hot shard's serialized work per
  epoch is O(unique new URLs), not O(offered rows).

The link-routing stage partitions each Arrow batch by salt, then the
admitted survivors by host, issuing concurrent calls from every fetch
task — no driver-side or single-queue bottleneck on the enqueue path.

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
import os
import pickle
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


def salt_of_hashes(hashes: np.ndarray, n_filters: int) -> np.ndarray:
    """url_hash rows ((n, 20) uint8 SHA1) → owning seen-filter index.

    Derived from SHA1 tail bytes 16:20 — disjoint from the cuckoo key
    bytes 0:8 and fingerprint bytes 8:10 (cuckoo._keys64 /
    _parts_from_sha1), so bank routing cannot correlate with in-filter
    bucket placement. Host-independent by construction: a dominant
    host's offers spread uniformly across the bank."""
    return (hashes[:, 16:20].copy().view(">u4").reshape(-1)
            % np.uint32(n_filters)).astype(np.int64)


@ray.remote(num_cpus=0)
class SeenFilterShard:
    """One shard of the salted URL-seen bank (see module docstring).

    Authoritative first-offer-wins admission: ``admit`` applies robots
    rules, then atomically tests-and-inserts the url hashes into this
    partition of the seen set and returns only the rows never offered
    before. Partitioned by ``salt_of_hashes``, NOT by host — the whole
    point is that hot-host offer traffic parallelizes across the bank.

    num_cpus=0 for the same reason as FrontierShard: lightweight
    coordinators that must not starve the fetch/parse pool on small
    clusters."""

    def __init__(self, filter_id: int, n_filters: int,
                 seen_capacity: int = 1 << 16,
                 seen_max_inmem: int = 1 << 20):
        self.filter_id = filter_id
        self.n_filters = n_filters
        self.seen = SeenSet(capacity=seen_capacity, max_inmem=seen_max_inmem)
        self.robots: dict[str, list[str]] = {}  # host → disallow prefixes
        self.counters = defaultdict(int)

    def set_robots(self, host: str, disallow_prefixes: list[str]) -> None:
        # replicated into every filter: rules are write-once per run and
        # a few strings per host; replication keeps admit() single-hop
        self.robots[host] = list(disallow_prefixes)

    def _robots_allowed(self, host: str, url: str) -> bool:
        rules = self.robots.get(host)
        if not rules:
            return True
        path = url.split("//", 1)[-1]
        path = "/" + path.split("/", 1)[1] if "/" in path else "/"
        return not any(path.startswith(p) for p in rules)

    def admit(self, rows: pa.Table) -> pa.Table:
        """robots-filter + seen test-and-insert; returns admitted rows.

        Order matters: a robots-disallowed URL is NOT inserted into the
        seen set (a later robots change could admit it). Duplicate URLs
        offered concurrently race here, and actor-serialized
        check_and_add guarantees exactly one caller gets the row back."""
        n = rows.num_rows
        self.counters["offered"] += n
        if n == 0:
            return rows
        keep = np.ones(n, dtype=bool)
        rule_hosts = {h for h, r in self.robots.items() if r}
        if rule_hosts:
            hosts = rows["host"].to_pylist()
            urls = rows["url"].to_pylist()
            for j in range(n):
                h = hosts[j]
                if h in rule_hosts and not self._robots_allowed(h, urls[j]):
                    keep[j] = False
            self.counters["robots_dropped"] += int((~keep).sum())
        idx = np.flatnonzero(keep)
        if len(idx):
            hashes = sha1_bytes_to_array(rows["url_hash"].to_pylist())
            already = self.seen.check_and_add(hashes[idx])
            self.counters["dup_dropped"] += int(already.sum())
            keep[idx[already]] = False
        admitted = rows.filter(pa.array(keep))
        self.counters["admitted"] += admitted.num_rows
        return admitted

    def seen_stats(self) -> dict:
        """Memory accounting of this shard's seen tier — used by
        tools/bench_frontier.py for the 10^10-URL extrapolation
        (measured bytes per URL, not an analytic estimate: the exact
        in-memory tier is costed at its REAL Python footprint —
        getsizeof(set) + getsizeof per bytes element — which is ~4×
        the 20 payload bytes; the spilled segments are the tier that
        dominates at scale and they are flat numpy)."""
        import sys as _sys

        s = self.seen
        seg_rows = int(sum(len(seg) for seg in s.segments))
        exact_bytes = _sys.getsizeof(s.exact) + sum(
            _sys.getsizeof(h) for h in s.exact)
        ovf = getattr(s.cuckoo, "overflow", None) or set()
        return {
            "n_seen": int(s.n),
            "exact_inmem_rows": len(s.exact),
            "exact_inmem_bytes": int(exact_bytes),
            "segments": len(s.segments),
            "segment_rows": seg_rows,
            "segment_bytes": int(sum(seg.nbytes for seg in s.segments)),
            "bloom_bytes": int(sum(b.bits.nbytes
                                   for b in s.seg_blooms)),
            "cuckoo_bytes": int(s.cuckoo.table.nbytes)
            + int(_sys.getsizeof(ovf)) + 28 * len(ovf),
        }

    def mark_seen(self, rows: pa.Table) -> int:
        """Insert URL hashes WITHOUT admission — the store-cache pre-seed
        path (ST2): URLs whose content the store already holds are never
        fetched again."""
        n = rows.num_rows
        if n == 0:
            return 0
        hashes = sha1_bytes_to_array(rows["url_hash"].to_pylist())
        already = self.seen.check_and_add(hashes)
        added = int((~already).sum())
        self.counters["cache_preseeded"] += added
        return added

    def seen_hashes(self) -> list[bytes]:
        return self.seen.all_hashes()

    def stats(self) -> dict:
        return dict(self.counters, filter=self.filter_id, seen=self.seen.n)

    def snapshot(self) -> dict:
        return {
            "filter_id": self.filter_id,
            "n_filters": self.n_filters,
            "robots": dict(self.robots),
            "seen": self.seen.state(),
            "counters": dict(self.counters),
        }

    def restore(self, snap: dict) -> None:
        self.robots = dict(snap["robots"])
        self.seen = SeenSet.from_state(snap["seen"])
        self.counters = defaultdict(int, snap["counters"])


@ray.remote(num_cpus=0)
class FrontierShard:
    """One shard of the distributed frontier (see module docstring).

    num_cpus=0: shards are lightweight coordinators (heap ops + filter
    probes, milliseconds per call); reserving fractional CPUs for them
    starves the fetch/parse task pool on small clusters (8 shards × 0.1
    CPU consumed 40% of a 2-CPU cluster)."""

    def __init__(self, shard_id: int, n_shards: int,
                 politeness_gap_us: int = 1_000_000,
                 record_log: bool = False,
                 max_pending_inmem: int | None = None,
                 spill_dir: str | None = None,
                 spill_chunk: int = 4096):
        self.shard_id = shard_id
        self.n_shards = n_shards
        self.gap_us = politeness_gap_us
        self.heaps: dict[str, list] = defaultdict(list)  # host → [(priority, row)]
        # pending-queue spill tier (10^10-URL frontiers: the in-memory
        # heaps are the one remaining unbounded state — the seen set
        # already spills via SeenSet segments). Opt-in: when the shard's
        # total in-memory pending exceeds max_pending_inmem, the hottest
        # host's heap tail (HIGHEST priorities — popped last) is written
        # as priority-sorted chunk files; pop_ready reloads chunks in
        # priority order before it could ever pop past them, so crawl
        # ordering is bit-identical to the unlimited path (asserted in
        # tests/test_crawl_e2e.py::test_pending_spill_ordering_exact).
        self.max_pending_inmem = max_pending_inmem
        self.spill_dir = spill_dir
        self.spill_chunk = spill_chunk
        self.pending_inmem = 0
        # host → list of chunk descriptors {path, n, min_prio}, sorted
        # ascending by min_prio (consecutive priority ranges of one or
        # more sorted runs; merged lazily at refill by min_prio order)
        self.spill_chunks: dict[str, list[dict]] = defaultdict(list)
        self._spill_seq = 0
        if max_pending_inmem is not None and spill_dir is None:
            raise ValueError("max_pending_inmem requires spill_dir")
        self.host_next_vts: dict[str, int] = defaultdict(int)
        # host-level selection heap: (next_vts, host) for every host with
        # pending URLs, membership-tracked so each host appears once.
        # pop_ready is O(log H) per host selection; the r1 version
        # re-listed and re-sorted every live host per outer iteration —
        # O(H² log H) per epoch in the breadth-across-hosts regime the
        # module docstring names as the parallelism source.
        self.host_heap: list[tuple[int, str]] = []
        self.hosts_in_heap: set[str] = set()
        # fetch log: OPT-IN (ordering tests only). On the production path
        # it would be an O(total-pops) memory leak inside the most
        # critical actor at a 10^10-URL frontier, so it defaults off and
        # is excluded from snapshots when disabled.
        self.record_log = record_log
        self.fetch_log: list[tuple[int, int, str]] = []  # (vts, priority, url)
        self.counters = defaultdict(int)

    # -------------------------------------------------------------- offer
    def offer(self, rows: pa.Table) -> dict:
        """Enqueue pre-admitted URL rows (robots + seen dedup already
        applied by the SeenFilterShard bank — the rows arriving here are
        first-offer winners). Returns counters.

        Still the hot shard for a dominant host, but its serialized work
        is now O(unique new URLs): columnar extraction (`to_pylist` per
        column, C-level) instead of per-cell `.as_py()`, and heap entries
        are (priority, url, row-tuple) — no per-row dict building."""
        n = rows.num_rows
        if n == 0:
            return {"enqueued": 0}
        cols = [rows[f].to_pylist() for f in URL_FIELDS]
        hosts = cols[1]
        urls = cols[0]
        prios = cols[7]
        row_tuples = list(zip(*cols))  # one C-level transpose, no per-row gen
        for j in range(n):
            h = hosts[j]
            heap = self.heaps[h]
            heapq.heappush(heap, (prios[j], urls[j], row_tuples[j]))
            if h not in self.hosts_in_heap:
                heapq.heappush(self.host_heap, (self.host_next_vts[h], h))
                self.hosts_in_heap.add(h)
        self.counters["enqueued"] += n
        self.pending_inmem += n
        self._maybe_spill()
        return {"enqueued": n}

    # --------------------------------------------------------------- spill
    def _maybe_spill(self) -> None:
        """Spill the hottest host's heap tail to priority-sorted chunk
        files once in-memory pending exceeds the bound. The hot head
        (lowest priorities — popped first) stays in memory; effective
        in-memory bound is max(max_pending_inmem, live_hosts ×
        spill_chunk). Chunk files are never deleted mid-run so a resume
        from any checkpoint still finds every file its snapshot
        references; a fresh run's out_dir cleanup garbage-collects them."""
        if self.max_pending_inmem is None:
            return
        while self.pending_inmem > self.max_pending_inmem:
            host = max(self.heaps, key=lambda h: len(self.heaps[h]))
            heap = self.heaps[host]
            if len(heap) <= self.spill_chunk:
                break  # every heap is within one hot window — nothing to gain
            os.makedirs(self.spill_dir, exist_ok=True)
            entries = sorted(heap)
            self.heaps[host] = entries[: self.spill_chunk]  # sorted IS a heap
            tail = entries[self.spill_chunk:]
            for i in range(0, len(tail), self.spill_chunk):
                chunk = tail[i:i + self.spill_chunk]
                path = os.path.join(
                    self.spill_dir,
                    f"shard{self.shard_id}_chunk{self._spill_seq}.pkl")
                self._spill_seq += 1
                with open(path + ".tmp", "wb") as f:
                    pickle.dump(chunk, f)
                os.replace(path + ".tmp", path)
                self.spill_chunks[host].append(
                    {"path": path, "n": len(chunk), "min_prio": chunk[0][0]})
            self.spill_chunks[host].sort(key=lambda c: c["min_prio"])
            self.pending_inmem -= len(tail)
            self.counters["spilled"] += len(tail)

    def _refill(self, host: str) -> None:
        """Reload spilled chunks until the in-memory heap provably covers
        the next pop: safe to pop the heap top only while it is strictly
        below every unloaded chunk's min_prio (priorities are unique —
        pack_priority range-guards the fields)."""
        chunks = self.spill_chunks.get(host)
        if not chunks:
            return
        heap = self.heaps[host]
        while chunks and (not heap or heap[0][0] >= chunks[0]["min_prio"]):
            c = chunks.pop(0)
            with open(c["path"], "rb") as f:
                for e in pickle.load(f):
                    heapq.heappush(heap, tuple(e))
            self.pending_inmem += c["n"]
            self.counters["refilled"] += c["n"]
        if not chunks:
            self.spill_chunks.pop(host, None)

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
            self._refill(host)
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
                ch = self.spill_chunks.get(host)
                if ch and heap[0][0] >= ch[0]["min_prio"]:
                    # the next pop would skip past a spilled entry —
                    # reload before popping (keeps ordering exact)
                    self._refill(host)
                    continue
                prio, url, row = heapq.heappop(heap)
                self.pending_inmem -= 1
                if self.record_log:
                    self.fetch_log.append((vts, prio, url))
                out_rows.append(row)
                out_vts.append(vts)
                vts += self.gap_us
            self.host_next_vts[host] = vts
            if heap or self.spill_chunks.get(host):
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
        return (sum(len(h) for h in self.heaps.values())
                + sum(c["n"] for chunks in self.spill_chunks.values()
                      for c in chunks))

    def stats(self) -> dict:
        return dict(self.counters, pending=self.pending(), shard=self.shard_id)

    def get_fetch_log(self) -> list[tuple[int, int, str]]:
        return list(self.fetch_log)

    # --------------------------------------------------------- checkpoint
    def snapshot(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "gap_us": self.gap_us,
            "pending": {h: list(hp) for h, hp in self.heaps.items() if hp},
            # spilled pending: chunk DESCRIPTORS only — the chunk files
            # stay on disk (never deleted mid-run), so a restore from
            # this snapshot finds exactly the chunks it references
            "pending_spill": {h: list(cs) for h, cs
                              in self.spill_chunks.items() if cs},
            "spill_seq": self._spill_seq,
            "host_next_vts": dict(self.host_next_vts),
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
        self.pending_inmem = sum(len(hp) for hp in self.heaps.values())
        self.spill_chunks = defaultdict(list)
        for h, chunks in snap.get("pending_spill", {}).items():
            for c in chunks:
                if not os.path.exists(c["path"]):
                    raise RuntimeError(
                        f"spill chunk missing on restore: {c['path']}")
            self.spill_chunks[h] = [dict(c) for c in chunks]
        self._spill_seq = snap.get("spill_seq", 0)
        self.host_next_vts = defaultdict(int, snap["host_next_vts"])
        for h in set(self.heaps) | set(self.spill_chunks):
            heapq.heappush(self.host_heap, (self.host_next_vts[h], h))
            self.hosts_in_heap.add(h)
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
