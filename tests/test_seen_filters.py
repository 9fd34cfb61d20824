"""Cuckoo/Bloom/SeenSet invariants: no false negatives, exactness of the
composite seen-set (incl. spill segments), serialization round-trip."""

import hashlib

import numpy as np

from fide_crawler_ray.state.cuckoo import (
    BloomFilter,
    CuckooFilter,
    SeenSet,
    sha1_bytes_to_array,
)


def _hashes(n, salt=""):
    return sha1_bytes_to_array(
        [hashlib.sha1(f"{salt}url-{i}".encode()).digest() for i in range(n)]
    )


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(capacity=4096)
    h = _hashes(3000)
    f.insert_batch(h)
    assert f.contains_batch(h).all()


def test_cuckoo_low_false_positive_rate():
    f = CuckooFilter(capacity=4096)
    f.insert_batch(_hashes(3000))
    other = _hashes(3000, salt="other")
    fp_rate = f.contains_batch(other).mean()
    assert fp_rate < 0.02  # 16-bit fingerprints, b=4 → expected ~0.1%


def test_cuckoo_overflow_at_saturation_stays_exact():
    f = CuckooFilter(capacity=256)
    h = _hashes(1000)  # 4x capacity → forced overflow
    f.insert_batch(h)
    assert f.contains_batch(h).all()


def test_cuckoo_state_roundtrip():
    f = CuckooFilter(capacity=1024)
    h = _hashes(500)
    f.insert_batch(h)
    g = CuckooFilter.from_state(f.state())
    assert g.contains_batch(h).all()


def test_bloom_no_false_negatives():
    b = BloomFilter(capacity=10000)
    h64 = np.arange(5000, dtype=np.uint64) * np.uint64(2654435761)
    b.insert_batch64(h64)
    assert b.contains_batch64(h64).all()
    other = (np.arange(5000, 10000, dtype=np.uint64)) * np.uint64(0x9E3779B9)
    assert b.contains_batch64(other).mean() < 0.05


def test_seenset_exact_check_and_add():
    s = SeenSet(capacity=1024)
    h = _hashes(800)
    first = s.check_and_add(h)
    assert not first.any()
    again = s.check_and_add(h)
    assert again.all()
    fresh = _hashes(800, salt="fresh")
    assert not s.check_and_add(fresh).any()  # exact: no false positives


def test_seenset_within_batch_dedup():
    s = SeenSet(capacity=256)
    h = _hashes(10)
    doubled = np.concatenate([h, h])
    seen = s.check_and_add(doubled)
    assert not seen[:10].any()
    assert seen[10:].all()


def test_seenset_spill_segments_stay_exact():
    s = SeenSet(capacity=4096, max_inmem=300)
    h1, h2, h3 = _hashes(400, "a"), _hashes(400, "b"), _hashes(400, "c")
    s.check_and_add(h1)
    s.check_and_add(h2)  # forces spills
    assert len(s.segments) >= 1
    assert s.contains_batch(h1).all()
    assert s.contains_batch(h2).all()
    assert not s.contains_batch(h3).any()
    assert s.check_and_add(h1).all()  # still recognized as seen post-spill
    st = s.state()
    s2 = SeenSet.from_state(st)
    assert s2.contains_batch(h1).all() and s2.contains_batch(h2).all()


def test_seenset_autogrows_past_capacity():
    """Inserting far beyond the initial cuckoo capacity must stay fast
    (auto-grow) and exact."""
    import time

    s = SeenSet(capacity=1 << 10)
    h = _hashes(100_000, "grow")
    t0 = time.perf_counter()
    first = s.check_and_add(h)
    dt = time.perf_counter() - t0
    assert not first.any()
    assert dt < 5.0, f"saturated-filter slowdown: {dt:.1f}s"
    assert s.cuckoo.n_buckets * 4 >= 100_000
    assert s.check_and_add(h).all()
    assert not s.contains_batch(_hashes(1000, "other")).any()


def test_state_round_trip_preserves_capacity_and_exactness():
    """state()/from_state() must keep the cuckoo table dimensions EXACT
    (the r2-interim hash-list form re-derived capacity from the slot
    count and doubled the table on every resume) and reproduce the full
    membership set structurally."""
    import hashlib

    s = SeenSet(capacity=1 << 12, max_inmem=1 << 10)
    hs = sha1_bytes_to_array(
        [hashlib.sha1(str(i).encode()).digest() for i in range(5000)])
    assert not s.check_and_add(hs).any()
    for _ in range(6):
        s = SeenSet.from_state(s.state())
    assert s.check_and_add(hs).all()  # everything still seen
    slots0 = s.cuckoo.n_buckets
    s2 = SeenSet.from_state(s.state())
    assert s2.cuckoo.n_buckets == slots0  # no inflation per round trip
    assert s2.n == s.n


def test_spill_segments_compact():
    """Past MAX_SEGMENTS spills the exact tier compacts to one merged
    segment with no membership change."""
    import hashlib

    s = SeenSet(capacity=1 << 12, max_inmem=256)
    hs = sha1_bytes_to_array(
        [hashlib.sha1(f"c{i}".encode()).digest() for i in range(5000)])
    for i in range(0, len(hs), 512):
        s.check_and_add(hs[i:i + 512])
    assert len(s.segments) <= SeenSet.MAX_SEGMENTS + 1
    assert s.contains_batch(hs).all()
    other = sha1_bytes_to_array(
        [hashlib.sha1(f"z{i}".encode()).digest() for i in range(1000)])
    assert not s.contains_batch(other).any()


# ---------------------------------------------------------------- salted bank

def test_salt_of_hashes_uniform_and_disjoint_from_cuckoo_bytes():
    """Salt routing uses SHA1 tail bytes: host-independent (same-host URLs
    spread across the bank) and stable across calls."""
    from fide_crawler_ray.state.frontier import salt_of_hashes

    h = _hashes(4000, salt="onehost/")  # one "host" prefix, many URLs
    s = salt_of_hashes(h, 8)
    assert s.min() >= 0 and s.max() <= 7
    counts = np.bincount(s, minlength=8)
    # uniform-ish: no filter owns more than 2x its fair share
    assert counts.max() < 2 * (4000 / 8)
    # deterministic
    assert (salt_of_hashes(h, 8) == s).all()


def test_seen_filter_shard_admit_semantics(ray_session):
    """First-offer-wins exactly once; robots-disallowed rows dropped AND
    left unseen (a later robots change could admit them)."""
    import pyarrow as pa
    import ray as _ray

    from fide_crawler_ray.stages import urls as U
    from fide_crawler_ray.state.frontier import SeenFilterShard

    f = SeenFilterShard.remote(0, 1)
    _ray.get(f.set_robots.remote("h.example", ["/blocked"]))
    urls = ["https://h.example/a", "https://h.example/blocked/x",
            "https://h.example/b"]
    rows = U.make_url_rows(urls, ["calc"] * 3, [""] * 3, [""] * 3, [""] * 3,
                           [1, 2, 3])
    adm1 = _ray.get(f.admit.remote(rows))
    assert adm1["url"].to_pylist() == ["https://h.example/a",
                                       "https://h.example/b"]
    # duplicate re-offer: nothing admitted
    adm2 = _ray.get(f.admit.remote(rows.slice(0, 1)))
    assert adm2.num_rows == 0
    # the disallowed URL was NOT marked seen: lifting robots admits it
    _ray.get(f.set_robots.remote("h.example", []))
    adm3 = _ray.get(f.admit.remote(rows.slice(1, 1)))
    assert adm3["url"].to_pylist() == ["https://h.example/blocked/x"]
    st = _ray.get(f.stats.remote())
    assert st["offered"] == 5 and st["robots_dropped"] == 1
    assert st["dup_dropped"] == 1 and st["admitted"] == 3
