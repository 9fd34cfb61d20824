"""Approximate-membership filters for the URL-seen set.

- ``CuckooFilter``: partial-key cuckoo hashing (Fan, Andersen, Kaminsky,
  Mitzenmacher — "Cuckoo Filter: Practically Better Than Bloom",
  CoNEXT 2014; see PAPERS.md): b=4 slots per bucket, 16-bit fingerprints,
  alternate bucket i2 = i1 XOR hash(fingerprint). Supports deletion and
  ~95% load factor; no false negatives.
- ``BloomFilter``: classic k-hash bit array — the spill tier for cold
  shards (insert-only, smaller per-key footprint).
- ``SeenSet``: the per-shard composite the frontier uses. The cuckoo
  filter answers "definitely not seen" with no false negatives (the fast
  path: brand-new URLs — the overwhelming majority at the frontier);
  a "maybe seen" consults the authoritative exact tier so the final
  URL-seen set is EXACT (north_rule requires exactness; cuckoo alone
  would drop fresh URLs on false positives). The exact tier holds recent
  hashes in RAM and spills immutable sorted segments (binary-searchable
  uint64 pairs) once ``max_inmem`` is exceeded; segments COMPACT
  (LSM-style full merge) past ``max_segments`` so probe cost stays
  bounded over crawl age.

All membership checks are vectorized (numpy) over batches of 20-byte
SHA1 URL hashes; bulk inserts place fingerprints vectorized per bucket
and fall back to the per-key eviction walk only for the collision tail.
Snapshots carry STRUCTURAL state (tables, segment arrays) — a
state()/from_state() round trip preserves capacity exactly and never
replays per-key inserts.
"""

from __future__ import annotations

import numpy as np

_EMPTY = 0  # fingerprint 0 marks an empty slot; real fps are 1..65535


def _keys64(hashes: np.ndarray) -> np.ndarray:
    """(n, 20) uint8 SHA1 rows → big-endian uint64 keys from the first 8
    bytes — THE key convention shared by the cuckoo h64, segment sort
    keys and bloom keys (one definition so they can never desync)."""
    return hashes[:, :8].copy().view(">u8").reshape(-1)


def _parts_from_sha1(hashes: np.ndarray):
    """hashes: (n, 20) uint8 → (h64, fp16, h_fp) derived fields."""
    h64 = _keys64(hashes).astype(np.uint64)
    fp = (hashes[:, 8].astype(np.uint16) << 8) | hashes[:, 9].astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp).astype(np.uint16)
    # hash of the fingerprint for the alternate-bucket XOR (odd multiplier)
    h_fp = (fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)) >> np.uint64(32)
    return h64, fp, h_fp


def sha1_bytes_to_array(hashes: list[bytes]) -> np.ndarray:
    return np.frombuffer(b"".join(hashes), dtype=np.uint8).reshape(-1, 20)


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16, max_kicks: int = 500, seed: int = 7):
        n_buckets = 1
        while n_buckets * 4 < capacity / 0.95:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.max_kicks = max_kicks
        self.count = 0
        self.overflow: set[int] = set()  # keys that failed insertion
        self._overflow_arr: np.ndarray | None = None  # sorted cache
        self._rng = np.random.default_rng(seed)

    def _indices(self, h64: np.ndarray, h_fp: np.ndarray):
        mask = np.uint64(self.n_buckets - 1)
        i1 = (h64 & mask).astype(np.int64)
        i2 = ((h64 ^ h_fp) & mask).astype(np.int64)
        return i1, i2

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: (n,20) uint8 → bool[n]."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h64, fp, h_fp = _parts_from_sha1(hashes)
        i1, i2 = self._indices(h64, h_fp)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if self.overflow:
            if self._overflow_arr is None:
                self._overflow_arr = np.fromiter(
                    self.overflow, dtype=np.uint64, count=len(self.overflow))
                self._overflow_arr.sort()
            hit |= np.isin(h64, self._overflow_arr)
        return hit

    def insert_one(self, h64: int, fp: int, h_fp: int) -> None:
        mask = self.n_buckets - 1
        i1 = h64 & mask
        i2 = (h64 ^ h_fp) & mask
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return
        # evict: random walk up to max_kicks (partial-key cuckoo hashing);
        # record the swap trail so a failed walk can be rolled back — else
        # the victim fingerprint held at give-up time would be lost (a
        # false negative, which the filter must never produce)
        i = int(self._rng.choice((i1, i2)))
        cur = np.uint16(fp)
        trail: list[tuple[int, int]] = []
        for _ in range(self.max_kicks):
            slot = int(self._rng.integers(0, 4))
            trail.append((i, slot))
            cur, self.table[i, slot] = self.table[i, slot], cur
            h_cur = (int(cur) * 0x5BD1E9955BD1E995 & ((1 << 64) - 1)) >> 32
            i = (i ^ h_cur) & mask
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return
        for j, slot in reversed(trail):  # undo swaps, restore invariants
            cur, self.table[j, slot] = self.table[j, slot], cur
        self.overflow.add(int(h64))  # table saturated; exact overflow set
        self._overflow_arr = None
        self.count += 1

    def _bulk_place(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Vectorized placement of fingerprints into bucket indices
        ``idx`` where free slots allow (per-bucket occupancy + rank);
        returns the bool mask of PLACED keys."""
        order = np.argsort(idx, kind="stable")
        si = idx[order]
        # rank of each key within its bucket group
        starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
        lens = np.diff(np.r_[starts, len(si)])
        ranks = np.arange(len(si)) - np.repeat(starts, lens)
        occ = (self.table[si] != _EMPTY).sum(axis=1)
        slot = occ + ranks
        ok = slot < 4
        self.table[si[ok], slot[ok]] = fp[order][ok]
        placed = np.zeros(len(idx), dtype=bool)
        placed[order[ok]] = True
        return placed

    def insert_batch(self, hashes: np.ndarray) -> None:
        """Bulk insert: vectorized i1-then-i2 placement (covers ~all keys
        below ~85% load), per-key eviction walk only for the remainder —
        the path that makes filter REBUILDS (grow, restore) O(n) numpy
        instead of n Python insert_one calls."""
        if len(hashes) == 0:
            return
        h64, fp, h_fp = _parts_from_sha1(hashes)
        i1, i2 = self._indices(h64, h_fp)
        placed = self._bulk_place(i1, fp)
        rest = ~placed
        if rest.any():
            placed2 = np.zeros(len(h64), dtype=bool)
            placed2[rest] = self._bulk_place(i2[rest], fp[rest])
            rest &= ~placed2
        self.count += int(len(h64) - rest.sum())
        for j in np.flatnonzero(rest):
            self.insert_one(int(h64[j]), int(fp[j]), int(h_fp[j]))

    def state(self) -> dict:
        return {
            "table": self.table.copy(),
            "overflow": sorted(self.overflow),
            "count": self.count,
        }

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        f = cls()
        f.table = st["table"].copy()
        f.n_buckets = f.table.shape[0]
        f.overflow = set(st["overflow"])
        f.count = st["count"]
        return f


class BloomFilter:
    """k-hash Bloom filter over 64-bit keys (spill tier; insert-only)."""

    def __init__(self, capacity: int = 1 << 20, fp_rate: float = 0.01):
        import math

        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = 1 << (m - 1).bit_length()
        self.k = max(1, round(self.m / capacity * 0.6931))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    def _positions(self, h64: np.ndarray) -> np.ndarray:
        # double hashing: pos_i = h1 + i*h2 (Kirsch–Mitzenmacher)
        h1 = h64
        h2 = (h64 * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        idx = np.empty((self.k, len(h64)), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
        return idx

    def insert_batch64(self, h64: np.ndarray) -> None:
        if len(h64) == 0:
            return
        idx = self._positions(h64).reshape(-1)
        np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))

    def contains_batch64(self, h64: np.ndarray) -> np.ndarray:
        if len(h64) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._positions(h64)
        words = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit = (words >> (idx & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)


def _make_segment(rows: np.ndarray) -> np.ndarray:
    """(n, 20) uint8 rows → sorted structured segment (k: >u8, v: rows)."""
    seg = np.empty(len(rows), dtype=[("k", ">u8"), ("v", np.uint8, 20)])
    seg["k"] = _keys64(rows)
    seg["v"] = rows
    order = np.argsort(seg["k"], kind="stable")
    return seg[order]


def _segment_bloom(seg: np.ndarray) -> BloomFilter:
    bloom = BloomFilter(capacity=max(1024, len(seg)))
    bloom.insert_batch64(seg["k"].astype(np.uint64))
    return bloom


class SeenSet:
    """Exact URL-seen set with a cuckoo fast path and sorted spill segments."""

    MAX_SEGMENTS = 8  # compact (full merge) past this many spill segments

    def __init__(self, capacity: int = 1 << 16, max_inmem: int = 1 << 20):
        self.cuckoo = CuckooFilter(capacity=capacity)
        self.exact: set[bytes] = set()
        self.segments: list[np.ndarray] = []  # sorted (k,v) structured arrays
        self.seg_blooms: list[BloomFilter] = []  # per-segment spill-tier blooms
        self.max_inmem = max_inmem
        self.n = 0

    def _exact_contains(self, hashes: np.ndarray) -> np.ndarray:
        out = np.fromiter(
            (h.tobytes() in self.exact for h in hashes), dtype=bool, count=len(hashes)
        )
        if not self.segments:
            return out
        keys = _keys64(hashes)
        for seg, bloom in zip(self.segments, self.seg_blooms):
            # bloom first, then binary-search ONLY the admitted keys —
            # a cold segment costs its bloom probe plus O(admitted log n)
            maybe = bloom.contains_batch64(keys) & ~out
            cand = np.flatnonzero(maybe)
            if not len(cand):
                continue
            lo = np.searchsorted(seg["k"], keys[cand], side="left")
            hi = np.searchsorted(seg["k"], keys[cand], side="right")
            for t in np.flatnonzero(lo < hi):
                j = cand[t]
                rows = seg["v"][lo[t]:hi[t]]
                if any(r.tobytes() == hashes[j].tobytes() for r in rows):
                    out[j] = True
        return out

    def _all_rows(self) -> np.ndarray | None:
        """Every seen hash as one (n, 20) uint8 array — numpy end to end
        (no per-row bytes objects), unsorted (callers that need order
        sort the 8-byte keys, not 20-byte rows)."""
        parts = []
        if self.exact:
            parts.append(np.frombuffer(b"".join(self.exact),
                                       dtype=np.uint8).reshape(-1, 20))
        for seg in self.segments:
            parts.append(np.asarray(seg["v"]))
        if not parts:
            return None
        return np.concatenate(parts) if len(parts) > 1 else parts[0]

    def _maybe_grow(self, incoming: int) -> None:
        """Auto-grow the cuckoo filter BEFORE it saturates: past ~90% load
        every insert degenerates into a full failed eviction walk
        (max_kicks numpy ops per key — a 100x slowdown observed at 4x
        overload). Rebuild at the next power-of-two capacity from the
        exact tier (vectorized bulk load — no per-key Python walk)."""
        cap = self.cuckoo.n_buckets * 4
        if self.cuckoo.count + incoming <= 0.85 * cap:
            return
        target = cap
        while self.cuckoo.count + incoming > 0.5 * target:
            target *= 2
        fresh = CuckooFilter(capacity=target)
        rows = self._all_rows()
        if rows is not None:
            fresh.insert_batch(rows)
        self.cuckoo = fresh

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Returns bool[n]: True where the hash was ALREADY seen; all
        unseen hashes are inserted. Exact (no false positives/negatives)."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        self._maybe_grow(len(hashes))
        maybe = self.cuckoo.contains_batch(hashes)
        seen = np.zeros(len(hashes), dtype=bool)
        if maybe.any():
            seen[maybe] = self._exact_contains(hashes[maybe])
        # also dedup within the incoming batch itself (first occurrence wins)
        new_idx = []
        batch_seen: set[bytes] = set()
        for j in np.flatnonzero(~seen):
            b = hashes[j].tobytes()
            if b in batch_seen:
                seen[j] = True
            else:
                batch_seen.add(b)
                new_idx.append(j)
        if new_idx:
            arr = hashes[new_idx]
            self.cuckoo.insert_batch(arr)
            for j in new_idx:
                self.exact.add(hashes[j].tobytes())
            self.n += len(new_idx)
            if len(self.exact) > self.max_inmem:
                self._spill()
        return seen

    def _spill(self) -> None:
        rows = np.frombuffer(b"".join(self.exact), dtype=np.uint8).reshape(-1, 20)
        self.segments.append(_make_segment(rows))
        self.seg_blooms.append(_segment_bloom(self.segments[-1]))
        self.exact = set()
        if len(self.segments) > self.MAX_SEGMENTS:
            # LSM-style compaction: per-query probe cost is linear in
            # segment count, so an uncompacted shard degrades with crawl
            # age; one merged segment restores O(log n) + one bloom
            merged = _make_segment(
                np.concatenate([np.asarray(s["v"]) for s in self.segments]))
            self.segments = [merged]
            self.seg_blooms = [_segment_bloom(merged)]

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        maybe = self.cuckoo.contains_batch(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        if maybe.any():
            out[maybe] = self._exact_contains(hashes[maybe])
        return out

    def all_hashes(self) -> list[bytes]:
        """Test-only convenience (sorted bytes of every seen hash)."""
        rows = self._all_rows()
        if rows is None:
            return []
        return sorted(r.tobytes() for r in rows)

    def state(self) -> dict:
        """STRUCTURAL snapshot: tables and segment arrays, not a per-key
        hash list — a state/from_state round trip preserves the cuckoo
        capacity exactly (the r2-interim form re-derived capacity from
        the slot count and DOUBLED the table every resume) and restores
        in O(n) numpy instead of replaying n Python inserts."""
        return {
            "format": 2,
            "max_inmem": self.max_inmem,
            "n": self.n,
            "cuckoo": self.cuckoo.state(),
            "exact": (np.frombuffer(b"".join(self.exact),
                                    dtype=np.uint8).reshape(-1, 20).copy()
                      if self.exact else None),
            "segments": [np.asarray(s).copy() for s in self.segments],
        }

    @classmethod
    def from_state(cls, st: dict) -> "SeenSet":
        if "hashes" in st:  # legacy (r2-interim) hash-list snapshots
            s = cls(capacity=st["capacity"], max_inmem=st["max_inmem"])
            if st["hashes"]:
                s.check_and_add(sha1_bytes_to_array(st["hashes"]))
            return s
        s = cls(max_inmem=st["max_inmem"])
        s.cuckoo = CuckooFilter.from_state(st["cuckoo"])
        s.n = st["n"]
        if st["exact"] is not None:
            s.exact = {r.tobytes() for r in st["exact"]}
        s.segments = [np.asarray(seg) for seg in st["segments"]]
        s.seg_blooms = [_segment_bloom(seg) for seg in s.segments]
        return s
