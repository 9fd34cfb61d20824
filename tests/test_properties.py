"""Property-based tests (hypothesis): canonicalization idempotence,
seen-set exactness under arbitrary insert sequences, dedup keep-first
invariants, perf-rating table symmetry."""

import hashlib

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from fide_crawler_ray.functions.perf_rating import rating_performance
from fide_crawler_ray.stages import urls as U
from fide_crawler_ray.state.cuckoo import SeenSet, sha1_bytes_to_array

url_st = st.builds(
    lambda scheme, host, path, q, frag: f"{scheme}://{host}/{path}"
    + (f"?{q}" if q else "") + (f"#{frag}" if frag else ""),
    st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
    st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True),
    st.from_regex(r"[A-Za-z0-9/\-_.]{0,30}", fullmatch=True),
    st.from_regex(r"([a-z]{1,5}=[a-z0-9]{0,5}&){0,3}[a-z]{1,5}=[a-z0-9]{0,5}", fullmatch=True) | st.just(""),
    st.from_regex(r"[a-z0-9]{0,8}", fullmatch=True),
)


@given(url_st)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(url):
    c1 = U.canonicalize(url)
    assert U.canonicalize(c1) == c1
    assert "#" not in c1


@given(st.lists(st.binary(min_size=4, max_size=12), min_size=1, max_size=300))
@settings(max_examples=50, deadline=None)
def test_seenset_exact_for_any_sequence(blobs):
    """First occurrence of any key is never 'seen'; later ones always are."""
    s = SeenSet(capacity=256, max_inmem=64)  # tiny: forces spills + overflow
    seen_before: set[bytes] = set()
    for i in range(0, len(blobs), 7):
        chunk = blobs[i : i + 7]
        hashes = sha1_bytes_to_array([hashlib.sha1(b).digest() for b in chunk])
        out = s.check_and_add(hashes)
        within: set[bytes] = set()
        for j, b in enumerate(chunk):
            h = hashlib.sha1(b).digest()
            expect = h in seen_before or h in within
            assert bool(out[j]) == expect, (j, b)
            within.add(h)
        seen_before |= {hashlib.sha1(b).digest() for b in chunk}


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 5), st.integers(0, 10**6)),
        min_size=1, max_size=200,
    )
)
@settings(max_examples=50, deadline=None)
def test_dedup_keeps_exactly_first_per_key(rows):
    """dedup_dataset semantics vs a direct dict scan, on arbitrary
    (key, lineage) multisets (batch-level, via the same sig+probe path)."""
    import pandas as pd
    import pyarrow as pa

    from fide_crawler_ray.stages.dedup import _key_sig

    # unique lineage per row (keep-first is defined by lineage order)
    t = pa.table({
        "k1": pa.array([str(r[0]) for r in rows]),
        "k2": pa.array([str(r[1]) for r in rows]),
        "lineage": pa.array(list(range(len(rows))), pa.int64()),
    })
    sig = _key_sig(t, ("k1", "k2"))
    df = pd.DataFrame({"a": sig["a"], "b": sig["b"],
                       "lineage": range(len(rows))})
    got = df.sort_values("lineage").drop_duplicates(["a", "b"], keep="first")
    expect_first = {}
    for i, r in enumerate(rows):
        expect_first.setdefault((r[0], r[1]), i)
    assert sorted(got["lineage"]) == sorted(expect_first.values())


@given(st.integers(8, 11), st.integers(0, 22))
@settings(max_examples=100, deadline=None)
def test_perf_rating_antisymmetry(n, p2):
    """dp(n, p) == -dp(n, n-p) around the average (reference table is
    symmetric: performanceCalculator.py)."""
    if p2 > 2 * n:
        return
    p = p2 / 2
    mirror = n - p
    a = rating_performance(np.array([n]), np.array([p]), np.array([0.0]),
                           np.zeros(1), np.zeros(1), np.zeros(1))[0]
    b = rating_performance(np.array([n]), np.array([mirror]), np.array([0.0]),
                           np.zeros(1), np.zeros(1), np.zeros(1))[0]
    assert (np.isnan(a) and np.isnan(b)) or a == -b


# random span documents: kinds and pipe-counts chosen adversarially so
# every parser path (state fill, color zip, malformed rollback, dropna)
# is reachable
_span_st = st.builds(
    lambda kind, npipes, media_white, empty_first: {
        "kind": kind,
        "text": ("|" if empty_first else "") + "|".join(
            f"f{i}" for i in range(npipes)),
        "media_ref": "clr_wh" if media_white else "clr_bl",
        "offset": 0,  # rewritten to the span index below
    },
    st.sampled_from(["header", "rating", "game", "media", "footnote",
                     "field"]),
    st.integers(min_value=0, max_value=8),
    st.booleans(),
    st.booleans(),
)
_doc_st = st.lists(_span_st, min_size=0, max_size=12)


@given(st.lists(_doc_st, min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_parse_calc_vectorized_matches_scalar_property(docs):
    """parse_calc_batch (vectorized) ≡ parse_calc_batch_scalar on
    arbitrary span documents — including malformed ones that trigger
    the whole-document rollback."""
    import pandas as pd
    import pyarrow as pa

    from fide_crawler_ray.stages import parse as P

    spans_type = pa.list_(pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]))
    fixed = [
        [dict(s, offset=i) for i, s in enumerate(doc)] for doc in docs
    ]
    batch = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(fixed))], pa.string()),
        "doc_kind": pa.array(["calc"] * len(fixed), pa.string()),
        "spans": pa.array(fixed, spans_type),
        "fide_id": pa.array([f"f{i}" for i in range(len(fixed))], pa.string()),
        "player_name": pa.array([f"p{i}" for i in range(len(fixed))],
                                pa.string()),
        "priority": pa.array(list(range(len(fixed))), pa.int64()),
    })
    a = P.parse_calc_batch_scalar(batch).to_pandas()
    b = P.parse_calc_batch(batch).to_pandas()
    pd.testing.assert_frame_equal(a, b)


docs_st = st.lists(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta",
                              "eps", "zeta"]),
             min_size=3, max_size=12).map(" ".join),
    min_size=2, max_size=12)


@given(docs_st)
@settings(max_examples=25, deadline=None)
def test_ppjoin_candidates_superset_of_true_pairs(texts):
    """PPJoin's prefix + length + positional filters must NEVER drop a
    true pair: on arbitrary small corpora, every (a, b) with word-shingle
    Jaccard ≥ θ must appear in the candidate set produced by
    _prefix_rows_table → _prefix_pairs_task."""
    import pyarrow as pa
    import ray

    from fide_crawler_ray.pipelines import relational as R

    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    left = R._shingle_rows(tbl)
    if left.num_rows == 0:
        return
    sh = left["sh"].to_numpy(zero_copy_only=False)
    hs, cnt = np.unique(sh, return_counts=True)
    thr_num, thr_den = 50, 100
    prefix = R._prefix_rows_table(left, hs, cnt.astype(np.int64),
                                  thr_num, thr_den)
    cand = ray.get(R._prefix_pairs_task.remote(
        R.SIM_JOIN_PAIR_BUDGET, thr_num, thr_den, prefix))
    got = set(zip(cand["a"].to_pylist(), cand["b"].to_pylist()))
    # brute force truth
    sets = []
    for t in texts:
        toks = R._TOKEN.findall(t.lower())
        sets.append({" ".join(toks[i:i + R.SIM_JOIN_K])
                     for i in range(len(toks) - R.SIM_JOIN_K + 1)})
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if not a or not b:
                continue
            inter = len(a & b)
            uni = len(a | b)
            if inter * thr_den >= uni * thr_num:
                assert (i, j) in got, (texts[i], texts[j], inter, uni)


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                max_size=400))
@settings(max_examples=100, deadline=None)
def test_trimmed_histogram_slice_equals_sorted_slice(vals):
    """The rank-overlap histogram computation (q_trimmed_mean's kernel)
    must equal 'sort, drop n//10 off each end' for ANY multiset."""
    arr = np.sort(np.array(vals, np.int64))
    n = len(arr)
    lo, hi = n // 10, n - n // 10
    expect = arr[lo:hi]
    # histogram path
    uvals, cnts = np.unique(arr, return_counts=True)
    cum = np.cumsum(cnts)
    start = cum - cnts
    kept = np.clip(np.minimum(cum, hi) - np.maximum(start, lo), 0, None)
    assert int(kept.sum()) == len(expect)
    assert int((uvals * kept).sum()) == int(expect.sum())


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=500),
       st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=200))
@settings(max_examples=30, deadline=None)
def test_bloom_never_false_negative(members, probes):
    from fide_crawler_ray.functions.sketches import (
        bloom_partial, bloom_probe)

    keys = np.array(members, np.uint64)
    w = bloom_partial(keys, 1 << 14)
    assert bloom_probe(w, keys).all()
    # merged partials behave identically
    w2 = np.zeros_like(w)
    for c in np.array_split(keys, 3):
        if len(c):
            w2 |= bloom_partial(c, 1 << 14)
    p = np.array(probes, np.uint64)
    assert np.array_equal(bloom_probe(w, p), bloom_probe(w2, p))


@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=8,
                max_size=60))
@settings(max_examples=100, deadline=None)
def test_anomaly_integer_rule_equals_float_rule(counts):
    """(n·k−S)² > 9·(S2·k−S²) ⟺ (n−mean)² > 9·var for every day with a
    full trailing window — the all-integer cross-multiplication never
    flips the 3σ verdict."""
    n = np.array(counts, np.int64)
    k = 7
    for i in range(k, len(n)):
        w = n[i - k:i]
        s, s2 = int(w.sum()), int((w * w).sum())
        int_rule = (int(n[i]) * k - s) ** 2 > 9 * (s2 * k - s * s)
        mean = s / k
        var = (s2 - s * s / k) / k
        float_rule = (n[i] - mean) ** 2 > 9 * var
        # exact ties under the float rule can round either way; the
        # integer rule is the specification — they must agree whenever
        # the float expressions are not at an exact boundary
        if (n[i] - mean) ** 2 != 9 * var:
            assert int_rule == float_rule


@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=8),
                min_size=1, max_size=30),
       st.sampled_from(["a", "b", "c", "d"]),
       st.sampled_from(["a", "b", "c", "d"]))
@settings(max_examples=60, deadline=None)
def test_bpe_apply_preserves_text_and_shrinks(words, la, lb):
    """_bpe_apply invariants: the concatenation of symbols is unchanged
    (a merge only regroups, never rewrites), the symbol count never
    grows, and applying the same merge twice is idempotent."""
    from fide_crawler_ray.pipelines.textclean import _bpe_apply

    for w in words:
        syms = list(w) + ["</w>"]
        out = _bpe_apply(syms, la, lb)
        assert "".join(out) == "".join(syms)
        assert len(out) <= len(syms)
        assert _bpe_apply(out, la, lb) == out


@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=2, max_size=200, unique=True))
@settings(max_examples=40, deadline=None)
def test_epoch_shuffle_key_is_total_order(ids):
    """The (md5, id) shuffle key is a strict total order over any id
    set (no collisions can make the epoch order ambiguous)."""
    keys = [(hashlib.md5(f"0:{i}".encode()).hexdigest(), i)
            for i in ids]
    assert len(set(keys)) == len(ids)
    a = sorted(ids, key=lambda i: (
        hashlib.md5(f"0:{i}".encode()).hexdigest(), i))
    b = sorted(ids, key=lambda i: (
        hashlib.md5(f"0:{i}".encode()).hexdigest(), i))
    assert a == b


@given(st.lists(st.integers(min_value=0, max_value=500),
                min_size=1, max_size=50))
@settings(max_examples=40, deadline=None)
def test_psi_term_zero_iff_identical_distributions(counts):
    """PSI property: when both periods have IDENTICAL bucket counts the
    per-bucket term is exactly 0 (p1 == p2 bitwise under the mirrored
    expression), so equal distributions can never read as drift."""
    import math

    t = sum(counts)
    nb = len(counts)
    for c in counts:
        p1 = (c + 1.0) / (t + float(nb))
        p2 = (c + 1.0) / (t + float(nb))
        term = 1e9 * ((p1 - p2) * math.log(p1 / p2))
        assert term == 0.0


@given(st.lists(st.tuples(st.integers(1, 50), st.integers(1, 20)),
                min_size=1, max_size=60))
@settings(max_examples=100, deadline=None)
def test_weighted_median_rank_rule_equals_expansion(pairs):
    """The histogram rank rule (smallest v with 2·cumw ≥ W) equals the
    median position of the weight-EXPANDED multiset."""
    vals = np.array([v for v, _ in pairs], np.int64)
    wts = np.array([w for _, w in pairs], np.int64)
    order = np.argsort(vals, kind="stable")
    v_s, w_s = vals[order], wts[order]
    # collapse duplicate values like the engine's histogram
    uniq, inv = np.unique(v_s, return_inverse=True)
    wv = np.zeros(len(uniq), np.int64)
    np.add.at(wv, inv, w_s)
    cw = np.cumsum(wv)
    rank_rule = int(uniq[np.argmax(2 * cw >= cw[-1])])
    expanded = np.repeat(vals, wts)
    expanded.sort()
    w_total = int(wts.sum())
    # the element at 0-based position ceil(W/2)-1 of the expansion
    pos = (w_total + 1) // 2 - 1 if w_total % 2 else w_total // 2 - 1
    assert rank_rule == int(expanded[pos])


@given(st.lists(st.integers(0, 5 * 86_400), min_size=1, max_size=80),
       st.integers(60, 36_000))
@settings(max_examples=100, deadline=None)
@example(starts=[0, 60], dur=60)          # exact-touch tie
@example(starts=[50_400, 86_400], dur=36_000)  # touch at midnight
def test_sweepline_day_partition_equals_global_sweep(starts, dur):
    """Per-day halo decomposition preserves every day's peak under the
    operator's DECLARED semantics (q_max_concurrency docstring): the
    sweep processes +1 before −1 at equal t, i.e. concurrency at
    instant t counts every clipped interval with cs <= t <= ce (CLOSED
    membership — touching intervals are concurrent). The reference
    below evaluates that pointwise definition directly; the sweep must
    reproduce it for any duration up to 10h (≤ 1-day spillover). An
    interval ending exactly at midnight lives only in the earlier day
    (its next-day clip is empty), so a pair touching exactly at a day
    boundary is not concurrent — the one documented ownership caveat."""
    DAY = 86_400
    s = np.array(sorted(starts), np.int64)
    e = s + dur
    days = np.unique(np.concatenate([s // DAY, e // DAY]))
    for day in days:
        lo_d, hi_d = day * DAY, (day + 1) * DAY
        cs = np.maximum(s, lo_d)
        ce = np.minimum(e, hi_d)
        keep = cs < ce
        if not keep.any():
            continue
        pts = np.concatenate([
            np.stack([cs[keep], np.ones(keep.sum(), np.int64)], 1),
            np.stack([ce[keep], -np.ones(keep.sum(), np.int64)], 1)])
        order = np.lexsort((-pts[:, 1], pts[:, 0]))
        clipped_peak = int(np.cumsum(pts[order, 1]).max())
        # reference: closed-interval concurrency of the day-clipped
        # intervals at every boundary instant (peaks occur at starts)
        ref = 0
        for t in pts[:, 0]:
            ref = max(ref, int(((cs[keep] <= t) & (t <= ce[keep])).sum()))
        assert clipped_peak == ref


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 2),
                          st.integers(0, 1000)),
                min_size=1, max_size=100))
@settings(max_examples=100, deadline=None)
def test_cdc_merge_is_log_order_invariant(ops):
    """Last-writer-wins by version is invariant to the arrival order of
    the change log (the property the mergeable grouped top-1 relies
    on), with deletes (version 2) beating updates beating base."""
    import random

    def apply(log):
        # deterministic winner per key: max (version, payload) —
        # the tie rule grouped_topk's stable sort realizes
        best = {}
        for key, version, payload in log:
            v = best.get(key)
            if v is None or (version, payload) > v:
                best[key] = (version, payload)
        return best

    a = apply(ops)
    shuffled = ops[:]
    random.Random(7).shuffle(shuffled)
    b = apply(shuffled)
    assert a == b


@given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_clamped_balance_closed_form_matches_recurrence(deltas):
    """q_clamped_balance's algebra: b_t = max(0, b_{t-1} + d_t) equals
    S_t - min(0, cummin S), and a clamp fires iff S_t < the one-step-
    shifted floor — over arbitrary integer delta streams."""
    import numpy as np

    d = np.array(deltas, dtype=np.int64)
    s = np.cumsum(d)
    smin = np.minimum.accumulate(s)
    floor = np.minimum(smin, 0)
    bal_closed = s - floor
    prev_floor = np.minimum(np.r_[np.int64(0), smin[:-1]], 0)
    clamp_closed = s < prev_floor
    bal, clamps = 0, []
    bals = []
    for x in d:
        if bal + int(x) < 0:
            bal = 0
            clamps.append(True)
        else:
            bal += int(x)
            clamps.append(False)
        bals.append(bal)
    assert bal_closed.tolist() == bals
    assert clamp_closed.tolist() == clamps


@given(st.lists(st.integers(min_value=0, max_value=60),
                min_size=1, max_size=80))
@settings(max_examples=200, deadline=None)
def test_islands_day_minus_rank_rule(days):
    """q_longest_streak's island id (day − positional rank constant
    within an island) equals the scan definition of consecutive runs,
    for arbitrary day multisets (dedup + sort happen first, as in the
    query plan)."""
    import numpy as np

    d = np.unique(np.array(days, dtype=np.int64))
    rank = np.arange(len(d), dtype=np.int64)
    island = np.r_[True, (d[1:] - rank[1:]) != (d[:-1] - rank[:-1])]
    lens = np.diff(np.r_[np.flatnonzero(island), len(d)])
    # reference scan
    best = cur = 1
    ref_lens = []
    run = 1
    for a, b in zip(d, d[1:]):
        if b == a + 1:
            run += 1
        else:
            ref_lens.append(run)
            run = 1
    ref_lens.append(run)
    assert lens.tolist() == ref_lens
    assert int(lens.max()) == max(ref_lens)


@given(st.lists(st.tuples(st.booleans(),
                          st.integers(min_value=0, max_value=9),
                          st.integers(min_value=1, max_value=5)),
                min_size=1, max_size=24))
@settings(max_examples=120, deadline=None)
def test_fifo_closed_form_matches_unit_simulation(rows):
    """The G(x)-based FIFO allocation (cost of first x units, evaluated
    at each sale's cumulative boundaries) must equal a literal
    one-unit-at-a-time FIFO simulation for any lot/sale sequence."""
    import numpy as np
    import pandas as pd

    from fide_crawler_ray.pipelines.relational import q_fifo_lot_matching

    # build the same frame shape the map_groups kernel receives; reach
    # the kernel through the closure to test it without a Ray session
    kernel = None

    def _grab(sf_dir=None):
        nonlocal kernel
        import fide_crawler_ray.pipelines.relational as R

        src = R.q_fifo_lot_matching.__code__
        for c in src.co_consts:
            if hasattr(c, "co_name") and c.co_name == "_fifo":
                import types
                kernel = types.FunctionType(
                    c, {"pd": pd, "np": np}, "_fifo")
    _grab()
    assert kernel is not None

    df = pd.DataFrame({
        "l_partkey": np.zeros(len(rows), dtype=np.int64),
        "l_orderkey": np.arange(len(rows), dtype=np.int64),
        "l_linenumber": np.array(
            [0 if is_lot else 1 for is_lot, _, _ in rows], dtype=np.int64),
        "qty": np.array([q for _, q, _ in rows], dtype=np.int64),
        "unit_fp": np.array([u for _, _, u in rows], dtype=np.int64),
    })
    got = kernel(df).sort_values("sale_seq").reset_index(drop=True)

    # literal simulation: a queue of (unit_cost) per single unit
    units = []
    for is_lot, q, u in rows:
        if is_lot:
            units.extend([u] * q)
    pos = 0
    exp = []
    for is_lot, q, u in rows:
        if is_lot:
            continue
        take = min(q, len(units) - pos)
        cogs = sum(units[pos:pos + take])
        pos += take
        exp.append((take, cogs, q - take))
    assert len(got) == len(exp)
    for i, (alloc, cogs, unfilled) in enumerate(exp):
        assert got.loc[i, "alloc_qty"] == alloc
        assert got.loc[i, "cogs_fp"] == cogs
        assert got.loc[i, "unfilled_qty"] == unfilled
