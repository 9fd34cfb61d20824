"""Distributed near-dup clustering: pinned survivor sets on a crafted
cluster fixture (guards the r1→r2 move from driver union-find to
distributed min-label propagation — survivors must not change), and the
label-propagation components cross-checked against a reference
union-find on random edge sets."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from fide_crawler_ray.functions import sketches as SK
from fide_crawler_ray.pipelines import dedup_text as DT


def _cluster_docs():
    """Three explicit near-dup clusters + singletons; expected survivors
    are derivable by hand: the min doc_id of each cluster + singletons."""
    base1 = ("the quick brown fox jumps over the lazy dog while the cat "
             "watches from the warm windowsill nearby in the afternoon sun")
    base2 = ("distributed data processing engines stream arrow record "
             "batches through actor pools with backpressure and spilling "
             "to object storage under memory pressure")
    texts = {
        10: base1,
        11: base1,                                    # exact dup → cluster A
        12: base1.replace("lazy", "sleepy"),          # near dup → cluster A
        20: base2,
        21: base2.replace("memory", "disk"),          # near dup → cluster B
        22: base2.replace("arrow", "columnar"),
        30: "a singleton document about chess ratings and tournaments",
        31: "another singleton concerning crawl frontiers and politeness",
        32: "short unique text",
    }
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
    }))


def test_minhash_pinned_survivors():
    survivors, pairs = DT.minhash_lsh_dedup(_cluster_docs(), threshold=0.5)
    got = sorted(survivors.to_pandas()["doc_id"])
    # cluster A (10,11,12) → 10; cluster B (20,21,22) → 20; singletons stay
    assert got == [10, 20, 30, 31, 32]
    ps = {(r["a"], r["b"]) for r in pairs.take_all()}
    assert (10, 11) in ps and (10, 12) in ps


def test_simhash_pinned_survivors():
    survivors, _ = DT.simhash_dedup(_cluster_docs(), max_hamming=12)
    got = sorted(survivors.to_pandas()["doc_id"])
    assert 10 in got and 11 not in got
    assert 30 in got and 31 in got and 32 in got


def test_ngram_jaccard_dedup_pinned_survivors():
    survivors, pairs = DT.ngram_jaccard_dedup(_cluster_docs(), threshold=0.8)
    got = sorted(survivors.to_pandas()["doc_id"])
    # exact dup 11 always drops; one-char-class edits (12, 21, 22) stay
    # near-identical at the char-5-gram level → clusters collapse to min
    assert got == [10, 20, 30, 31, 32]
    ps = {(r["a"], r["b"]) for r in pairs.take_all()}
    assert (10, 11) in ps


def test_min_label_components_equals_union_find():
    rng = np.random.default_rng(17)
    nodes = np.arange(0, 200)
    a = rng.choice(nodes, 120)
    off = rng.integers(1, 40, 120)
    b = a + off  # a < b always
    pairs = rd.from_arrow(pa.table({
        "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
    }))
    labels = DT._min_label_components(pairs)
    got = {r["node"]: r["label"] for r in labels.take_all()}

    uf = SK.UnionFind()
    for x, y in zip(a.tolist(), b.tolist()):
        uf.union(int(x), int(y))
    exp = uf.groups()
    assert got == exp  # identical component roots (min id)


def test_guard_paths_identical(monkeypatch):
    """Driver union-find / ref-broadcast path (default at toy scale) and
    the distributed label-propagation + join path (forced by zeroing the
    guard thresholds) must produce identical survivors and pairs."""
    docs = _cluster_docs()
    s_small, p_small = DT.minhash_lsh_dedup(docs, threshold=0.5)
    small = sorted(s_small.to_pandas()["doc_id"])
    pairs_small = sorted((r["a"], r["b"]) for r in p_small.take_all())

    monkeypatch.setattr(DT, "MAX_DRIVER_PAIRS", 0)
    monkeypatch.setattr(DT, "MAX_BROADCAST_KEYS", 0)
    s_big, p_big = DT.minhash_lsh_dedup(docs, threshold=0.5)
    assert sorted(s_big.to_pandas()["doc_id"]) == small
    assert sorted((r["a"], r["b"]) for r in p_big.take_all()) == pairs_small


def test_bucket_cap_star_pairing_preserves_components():
    """With a tiny bucket_cap every bucket degenerates to star pairs;
    survivors must still equal the uncapped run (components connect
    through the bucket min)."""
    docs = _cluster_docs()
    s_full, _ = DT.minhash_lsh_dedup(docs, threshold=0.5, bucket_cap=512)
    s_star, _ = DT.minhash_lsh_dedup(docs, threshold=0.5, bucket_cap=1)
    assert sorted(s_full.to_pandas()["doc_id"]) == sorted(s_star.to_pandas()["doc_id"])


def test_missing_pair_ids_dropped_not_phantom_verified():
    """A candidate pair naming doc_ids absent from the corpus must be
    dropped (the join path's inner-join semantics) — NOT verified at
    jaccard('','') == 1.0 by the small-path lookup default."""
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["alpha beta gamma delta epsilon", "alpha beta gamma delta zeta"],
    }))
    verified = DT.ngram_jaccard_pairs(docs, [(1, 2), (98, 99)], threshold=0.5)
    rows = verified.to_pandas()
    assert set(zip(rows["a"], rows["b"])) == {(1, 2)}


def test_simhash_unverified_candidates_typed_empty_pairs():
    """Candidates that collide in a band but all fail the hamming gate
    must yield a properly TYPED empty pairs dataset (a, b, hamming) —
    not fastagg's zero-column table."""
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["the quick brown fox jumps over the lazy dog",
                 "the quick brown fox jumped over the lazy dogs"],
    }))
    surv, pairs = DT.simhash_dedup(docs, max_hamming=0)
    names = set(pairs.schema().names)
    assert names == {"a", "b", "hamming"}, names
    assert pairs.count() == 0 or surv.count() == 1  # identical-hash edge
