"""Tests for the relational/window/sampling tier (pipelines/relational.py):
HLL accuracy, as-of join semantics, quantile rank rule, rollup level
consistency, and the window kernel — the non-SQL parts the driver's
oracle gate can't see (oracle parity itself is covered by
tools/check_oracles.py and the driver gate)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

# the engine-wide fixed-point rounding (half away from zero, matching SQL
# round()) — tests must NOT use pandas .round() (half to even) or a .5
# product diverges 1 fixed-point unit from the engine/oracle
from fide_crawler_ray.pipelines.relational import _round_half_away as _rha  # noqa: E402


def test_hll_error_bound():
    """HLL (p=14) must stay within ~3 standard errors (0.81% × 3) of the
    exact distinct count on real data."""
    from fide_crawler_ray.pipelines.relational import q_hll_distinct

    row = q_hll_distinct(SF).iloc[0]
    assert row["exact"] > 0
    assert row["rel_err"] < 0.025, row.to_dict()


def test_hll_merge_equals_single_pass():
    """Register-max merging of batch partials == one-shot sketch."""
    from fide_crawler_ray.functions.sketches import (
        HLL_P, hll_estimate, hll_partial)

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 40, size=50_000).astype(np.uint64)
    single = hll_partial(keys)
    merged = np.zeros(1 << HLL_P, dtype=np.uint8)
    for chunk in np.array_split(keys, 13):
        np.maximum(merged, hll_partial(chunk), out=merged)
    assert np.array_equal(single, merged)
    assert hll_estimate(single) == hll_estimate(merged)


def test_asof_join_semantics():
    """Every matched marker is the LATEST marker ≤ the event's ts for
    that user; events before any marker are null."""
    from fide_crawler_ray.pipelines.relational import T, q_asof_join

    out = q_asof_join(SF).to_pandas().set_index("event_id")
    ev = T(SF, "events", ["event_id", "user_id", "ts"]).to_pandas()
    markers = ev[ev["event_id"] % 97 == 0]
    # expected: per user, sort markers by ts, pick last ≤ event ts
    joined = 0
    for _, e in ev.sample(n=min(len(ev), 300), random_state=1).iterrows():
        m = markers[(markers["user_id"] == e["user_id"])
                    & (markers["ts"] <= e["ts"])]
        got = out.loc[e["event_id"], "marker_event_id"]
        if m.empty:
            assert pd.isna(got)
        else:
            best_ts = m["ts"].max()
            expect = m[m["ts"] == best_ts]["event_id"].max()
            assert got == expect
            joined += 1
    assert joined > 0  # the sample must exercise real matches


def test_quantile_rank_rule():
    """The distributed CDF pick equals a direct sorted-array pick with
    rank ceil(q*n) on the same data."""
    import math

    from fide_crawler_ray.pipelines.relational import _Q_LEVELS, T, q_quantiles

    got = q_quantiles(SF).iloc[0]
    vals = np.sort(
        T(SF, "lineitem", ["l_quantity"]).to_pandas()["l_quantity"].to_numpy()
    )
    n = len(vals)
    for q, name in _Q_LEVELS:
        expect = vals[max(1, math.ceil(q * n)) - 1]
        assert got[name] == expect, (name, got[name], expect)


def test_rollup_levels_consistent():
    """Subtotal tiers must equal the sum of their children and the grand
    total must equal the full row count."""
    from fide_crawler_ray.pipelines.relational import T, q_rollup_agg

    df = q_rollup_agg(SF).to_pandas()
    leaf = df[df["l_linestatus"].notna()]
    lvl1 = df[df["l_linestatus"].isna() & df["l_returnflag"].notna()]
    total = df[df["l_returnflag"].isna()]
    assert len(total) == 1
    assert total["n"].iloc[0] == leaf["n"].sum()
    assert total["sum_qty_fp"].iloc[0] == leaf["sum_qty_fp"].sum()
    by_flag = leaf.groupby("l_returnflag")[["n", "sum_qty_fp"]].sum()
    for _, r in lvl1.iterrows():
        assert r["n"] == by_flag.loc[r["l_returnflag"], "n"]
        assert r["sum_qty_fp"] == by_flag.loc[r["l_returnflag"], "sum_qty_fp"]
    assert total["n"].iloc[0] == T(SF, "lineitem", ["l_orderkey"]).count()


def test_window_kernel_per_group():
    """Running sum / lag-delta / row_number against a hand-computed
    single-user fixture."""
    from fide_crawler_ray.pipelines.relational import T, q_window_functions

    out = q_window_functions(SF).to_pandas()
    user = out["user_id"].iloc[0]
    one = out[out["user_id"] == user].sort_values("rn")
    assert list(one["rn"]) == list(range(1, len(one) + 1))
    # recompute the running fixed-point sum directly from events
    ev = T(SF, "events", ["user_id", "ts", "event_id", "value"]).to_pandas()
    ev = ev[ev["user_id"] == user].sort_values(
        ["ts", "event_id"], kind="mergesort")
    expect = np.cumsum(np.rint(ev["value"].to_numpy() * 1e6).astype(np.int64))
    v = one.sort_values("rn")["run_sum_fp"].to_numpy()
    ord_match = one.sort_values("rn")["event_id"].to_numpy()
    assert np.array_equal(ord_match, ev["event_id"].to_numpy())
    assert np.array_equal(v, expect)
    assert np.isnan(one["step_fp"].iloc[0])
    # step_fp[i] = contrib[i] - contrib[i-1], where contrib = diff of the
    # running sum
    contrib = np.diff(v, prepend=0.0)
    assert np.array_equal(one["step_fp"].to_numpy()[1:], np.diff(contrib))


def test_sample_hash_deterministic():
    """Same input → byte-identical sample, and the kept fraction is
    near 25%."""
    from fide_crawler_ray.pipelines.relational import q_sample_hash

    a = q_sample_hash(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = q_sample_hash(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert 0.15 < len(a) / 500 < 0.35


def test_registry_consistency():
    """Every oracle key has a query; registries import cleanly from the
    driver entry module (the contract the correctness gate runs on)."""
    import __ray_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    assert len(q) >= 60 and len(o) >= 45


def test_approx_quantiles_error_bound():
    """Histogram-sketch quantiles must land within 0.5% RANK error of the
    exact quantile on a continuous column (bin mass bound)."""
    from fide_crawler_ray.pipelines.relational import T, q_approx_quantiles

    row = q_approx_quantiles(SF).iloc[0]
    vals = np.sort(T(SF, "lineitem", ["l_extendedprice"])
                   .to_pandas()["l_extendedprice"].to_numpy())
    n = len(vals)
    assert row["n"] == n
    for q, name in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
        rank = np.searchsorted(vals, row[name]) / n
        assert abs(rank - q) < 0.005, (name, row[name], rank)


def test_hist_partial_merge_equals_single_pass():
    from fide_crawler_ray.functions.sketches import hist_partial

    rng = np.random.default_rng(11)
    v = rng.normal(50, 20, size=40_000)
    lo, hi = float(v.min()), float(v.max())
    single = hist_partial(v, lo, hi)
    merged = sum(hist_partial(c, lo, hi) for c in np.array_split(v, 9))
    assert np.array_equal(single, merged)
    assert single.sum() == len(v)


def test_pack_sequences_feasible_and_ordered():
    """Every bin respects the token budget (except single-doc overflow),
    bins are contiguous in doc_id order within a block, every doc
    appears exactly once."""
    from fide_crawler_ray.pipelines.relational import q_pack_sequences

    budget = 2048
    df = q_pack_sequences(SF, budget=budget).to_pandas()
    assert df["doc_id"].is_unique and len(df) == 500
    sums = df.groupby("bin")["n_tokens"].sum()
    sizes = df.groupby("bin")["n_tokens"].count()
    over = sums[sums > budget]
    # any over-budget bin must be a single doc longer than the budget
    assert all(sizes[b] == 1 for b in over.index)


def test_decontaminate_flags_real_overlaps():
    """Flagged docs must actually share an 8-shingle with the benchmark
    set; benchmark docs flag themselves; at least the benchmark rows are
    flagged."""
    from fide_crawler_ray.functions.sketches import shingles
    from fide_crawler_ray.pipelines.relational import T, q_decontaminate

    out = q_decontaminate(SF).to_pandas().set_index("doc_id")
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas()
    bench_sh = set()
    for _, r in docs[docs["doc_id"] < 5].iterrows():
        bench_sh.update(shingles(r["text"], 8))
    n_flagged = 0
    for _, r in docs.iterrows():
        flagged = bool(out.loc[r["doc_id"], "contaminated"])
        expect = (r["doc_id"] < 5
                  or bool(bench_sh & set(shingles(r["text"], 8))))
        assert flagged == expect, r["doc_id"]
        n_flagged += flagged
    assert n_flagged >= 5


def test_tfidf_guard_paths_identical():
    """The broadcast-df path and the join+grouped-topk path (forced by a
    zero vocab threshold) must produce identical rows."""
    from fide_crawler_ray.pipelines.relational import q_tfidf_top_terms

    cols = ["doc_id", "term", "tf", "score_fp"]
    a = (q_tfidf_top_terms(SF).to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    b = (q_tfidf_top_terms(SF, max_broadcast_vocab=0).to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_range_join_matches_bruteforce():
    """Every (event, window) pair from the interval join must be exactly
    the containment set a brute-force O(E·W) pandas scan produces —
    including overlapping windows (multiplicity) and variable spans."""
    from fide_crawler_ray.pipelines.relational import (
        RANGE_JOIN_MOD, T, q_range_join)

    out = q_range_join(SF).to_pandas()
    ev = T(SF, "events", ["event_id", "ts"]).to_pandas()
    w = ev[ev["event_id"] % RANGE_JOIN_MOD == 0].copy()
    w["start"] = w["ts"]
    w["end"] = w["ts"] + pd.to_timedelta(
        30 + (w["event_id"] % 5) * 15, unit="m")
    expect = set()
    for _, win in w.iterrows():
        hit = ev[(ev["ts"] >= win["start"]) & (ev["ts"] < win["end"])]
        expect.update((int(e), int(win["event_id"]))
                      for e in hit["event_id"])
    got = set(zip(out["event_id"].astype(int), out["window_id"].astype(int)))
    assert got == expect
    assert len(out) == len(got)  # no duplicate pairs


def test_similarity_join_matches_bruteforce():
    """The inverted-index similarity self-join must equal the all-pairs
    exact word-3-shingle Jaccard computation (it is exact by design:
    J > 0 ⇒ the pair shares a shingle ⇒ the index join sees it)."""
    from fide_crawler_ray.pipelines.relational import (
        _TOKEN, SIM_JOIN_K, T, q_similarity_join)

    out = q_similarity_join(SF).to_pandas()
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas()
    sets = {
        int(r["doc_id"]): {
            " ".join(toks[i:i + SIM_JOIN_K])
            for toks in [_TOKEN.findall(r["text"].lower())]
            for i in range(len(toks) - SIM_JOIN_K + 1)
        }
        for _, r in docs.iterrows()
    }
    expect = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            uni = len(sets[a] | sets[b])
            if inter * 100 >= uni * 50:
                expect[(a, b)] = inter * 1_000_000 // uni
    got = {(int(r["a"]), int(r["b"])): int(r["jaccard_fp"])
           for _, r in out.iterrows()}
    assert got == expect
    assert len(expect) > 0  # corpus contains near-duplicates by design


def test_mode_per_group_tiebreak_and_counts():
    """The modal event type must be the true per-user argmax by count,
    with ties broken toward the lexicographically smaller type."""
    from fide_crawler_ray.pipelines.relational import T, q_mode_per_group

    out = q_mode_per_group(SF).to_pandas().set_index("user_id")
    ev = T(SF, "events", ["user_id", "event_type"]).to_pandas()
    counts = (ev.groupby(["user_id", "event_type"]).size()
                .rename("n").reset_index())
    for uid, g in counts.groupby("user_id"):
        g = g.sort_values(["n", "event_type"],
                          ascending=[False, True])
        assert out.loc[uid, "mode_event"] == g.iloc[0]["event_type"]
        assert out.loc[uid, "n"] == g.iloc[0]["n"]


def test_grouped_variance_matches_pandas():
    """var_pop per flag (on the ×100 fixed-point values, scaled back)
    must agree with pandas population variance to canon precision."""
    from fide_crawler_ray.pipelines.relational import T, q_grouped_variance

    out = q_grouped_variance(SF).to_pandas().set_index("l_returnflag")
    li = T(SF, "lineitem", ["l_returnflag", "l_quantity"]).to_pandas()
    li["v"] = _rha(li["l_quantity"].to_numpy() * 100.0).astype("int64")
    for flag, g in li.groupby("l_returnflag"):
        expect = g["v"].var(ddof=0) / 10000.0
        assert abs(out.loc[flag, "var_pop"] - expect) < 1e-4
        assert out.loc[flag, "n"] == len(g)


def test_heavy_hitters_mg_guarantee():
    """Misra-Gries invariants on real data: estimates never exceed true
    counts, total undercount ≤ N_tokens/(k+1) per reported term, and
    every term whose true count clears twice that bound is reported."""
    from fide_crawler_ray.pipelines.relational import (
        _TOKEN, MG_CAPACITY, T, q_heavy_hitters)

    out = q_heavy_hitters(SF, top=MG_CAPACITY)
    docs = T(SF, "documents", ["text"]).to_pandas()
    exact: dict[str, int] = {}
    n_tokens = 0
    for txt in docs["text"]:
        for t in _TOKEN.findall(txt.lower()):
            exact[t] = exact.get(t, 0) + 1
            n_tokens += 1
    bound = n_tokens / (MG_CAPACITY + 1)
    reported = dict(zip(out["term"], out["est_count"]))
    for term, est in reported.items():
        assert est <= exact[term]
        assert exact[term] - est <= bound, (term, est, exact[term], bound)
    top_exact = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
    for term, cnt in top_exact[:5]:
        if cnt > 2 * bound:
            assert term in reported, (term, cnt, bound)


def test_grouped_hll_error_bound():
    """Per-group HLL (p=12) stays within 5 % (≈3σ) of the exact grouped
    distinct count, for every group."""
    from fide_crawler_ray.pipelines.relational import q_grouped_hll

    out = q_grouped_hll(SF)
    assert len(out) == 5  # one row per event type
    assert (out["n_users"] > 0).all()
    assert (out["rel_err"] < 0.05).all(), out.to_dict("records")


def test_similarity_join_paths_identical():
    """The prefix-filter+verify plan and the exchange-only full-join
    plan (forced via a zero vocab threshold) must produce identical
    pairs and fixed-point scores."""
    from fide_crawler_ray.pipelines.relational import q_similarity_join

    cols = ["a", "b", "jaccard_fp"]
    fast = (q_similarity_join(SF).to_pandas()[cols]
            .sort_values(cols).reset_index(drop=True))
    full = (q_similarity_join(SF, max_broadcast_vocab=0).to_pandas()[cols]
            .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, full)


def test_bigram_stats_guard_paths_identical():
    """Broadcast-head-totals path vs join path (forced by a zero vocab
    threshold) must produce identical bigram rows."""
    from fide_crawler_ray.pipelines.relational import q_bigram_stats

    cols = ["w1", "w2", "c", "prob_fp"]
    a = (q_bigram_stats(SF).to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    b = (q_bigram_stats(SF, max_broadcast_vocab=0).to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_cube_agg_tiers_consistent():
    """Every CUBE tier must re-aggregate to the same grand total."""
    from fide_crawler_ray.pipelines.relational import q_cube_agg

    out = q_cube_agg(SF).to_pandas()
    leaf = out[out["l_returnflag"].notna() & out["l_linestatus"].notna()]
    by_rf = out[out["l_returnflag"].notna() & out["l_linestatus"].isna()]
    by_ls = out[out["l_returnflag"].isna() & out["l_linestatus"].notna()]
    grand = out[out["l_returnflag"].isna() & out["l_linestatus"].isna()]
    assert len(grand) == 1
    g = int(grand["sum_qty_fp"].iloc[0])
    for tier in (leaf, by_rf, by_ls):
        assert int(tier["sum_qty_fp"].sum()) == g
        assert int(tier["n"].sum()) == int(grand["n"].iloc[0])


def test_rank_functions_invariants():
    """rank/dense_rank/ntile invariants per partition: rank jumps by
    tie-group size, dense_rank is contiguous, ntile buckets differ by
    at most one row, percent_rank endpoints are 0 and 10^6."""
    from fide_crawler_ray.pipelines.relational import q_rank_functions

    out = q_rank_functions(SF).to_pandas()
    for uid, g in out.groupby("user_id"):
        n = len(g)
        assert sorted(g["rnk"].unique()) == sorted(
            g.groupby("rnk").size().pipe(
                lambda s: np.cumsum([1] + list(s.iloc[:-1]))))
        assert set(g["drnk"]) == set(range(1, g["drnk"].max() + 1))
        sizes = g.groupby("tile").size()
        assert sizes.max() - sizes.min() <= 1
        if n > 1:
            assert g["pct_fp"].min() == 0
            assert g["pct_fp"].max() == 1_000_000


def test_similarity_join_verify_tiers_identical(monkeypatch):
    """Broadcast-texts lookup verify vs pair→text join verify (forced
    by a zero broadcast-docs guard) must produce identical pairs."""
    import fide_crawler_ray.pipelines.relational as R

    cols = ["a", "b", "jaccard_fp"]
    fast = (R.q_similarity_join(SF).to_pandas()[cols]
            .sort_values(cols).reset_index(drop=True))
    monkeypatch.setattr(R, "SIM_JOIN_MAX_BROADCAST_DOCS", 0)
    slow = (R.q_similarity_join(SF).to_pandas()[cols]
            .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow)


def test_similarity_join_pair_tiers_identical(monkeypatch):
    """Single-task run-expansion pairing vs hash self-join pairing
    (forced via a zero prefix guard) must produce identical pairs."""
    import fide_crawler_ray.pipelines.relational as R

    cols = ["a", "b", "jaccard_fp"]
    fast = (R.q_similarity_join(SF).to_pandas()[cols]
            .sort_values(cols).reset_index(drop=True))
    monkeypatch.setattr(R, "SIM_JOIN_MAX_SINGLE_PREFIX", 0)
    slow = (R.q_similarity_join(SF).to_pandas()[cols]
            .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow)


def test_run_pair_chunks_matches_triu():
    """Chunked equal-run pair expansion must enumerate exactly the
    triu pairs of every run, for any chunk size (including chunks
    smaller than one row's pair count, forcing the ≥1-row advance)."""
    import numpy as np

    import fide_crawler_ray.pipelines.relational as R

    lens = np.array([1, 4, 2, 7, 3], np.int64)
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    runs = np.flatnonzero(lens >= 2)
    want = set()
    for r in runs:
        s, k = int(starts[r]), int(lens[r])
        iu, ju = np.triu_indices(k, k=1)
        want |= set(zip((s + iu).tolist(), (s + ju).tolist()))
    for chunk in (1, 2, 5, 1000):
        got = []
        for iu, ju in R._run_pair_chunks(starts, lens, runs, chunk):
            assert len(iu) == len(ju)
            got += list(zip(iu.tolist(), ju.tolist()))
        assert len(got) == len(set(got)) == len(want)
        assert set(got) == want


def test_similarity_join_degenerate_run_falls_back(monkeypatch):
    """A candidate-pair volume above SIM_JOIN_PAIR_BUDGET must reroute
    to the distributed join tier (not OOM the pairing task) and still
    produce the same pairs."""
    import fide_crawler_ray.pipelines.relational as R

    cols = ["a", "b", "jaccard_fp"]
    base = (R.q_similarity_join(SF).to_pandas()[cols]
            .sort_values(cols).reset_index(drop=True))
    monkeypatch.setattr(R, "SIM_JOIN_PAIR_BUDGET", 0)
    rerouted = (R.q_similarity_join(SF).to_pandas()[cols]
                .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(base, rerouted)


def test_set_ops_algebra():
    """EXCEPT and INTERSECT must partition side A's distinct rows:
    disjoint from each other, and their union re-assembles exactly the
    distinct rows of A (pandas brute force)."""
    from fide_crawler_ray.pipelines.relational import (
        T, q_set_except, q_set_intersect)

    from fide_crawler_ray.pipelines.queries import to_df_any

    cols = ["p_brand", "p_type", "p_size"]
    ex = to_df_any(q_set_except(SF))
    it = to_df_any(q_set_intersect(SF))
    part = T(SF, "part", cols + ["p_retailprice"]).to_pandas()
    a = part[part["p_size"] > 25][cols].drop_duplicates()
    b = part[part["p_retailprice"] > 950][cols].drop_duplicates()
    def key(d):
        # an all-empty Ray result loses its columns in to_pandas()
        if len(d) == 0:
            return set()
        return set(map(tuple, d[cols].itertuples(index=False)))

    ka, kb, kex, kit = key(a), key(b), key(ex), key(it)
    assert kex == ka - kb
    assert kit == ka & kb
    assert not (kex & kit) and (kex | kit) == ka


def test_grouped_corr_matches_pandas():
    """corr_fp must equal pandas' Pearson r (to the 1e-6 fixed point)
    on the same rounded-unit values."""
    from fide_crawler_ray.pipelines.relational import T, q_grouped_corr

    out = q_grouped_corr(SF).to_pandas().set_index("l_returnflag")
    df = T(SF, "lineitem",
           ["l_returnflag", "l_quantity", "l_extendedprice"]).to_pandas()
    df["x"] = _rha(df["l_quantity"].to_numpy()).astype("int64")
    df["y"] = _rha(df["l_extendedprice"].to_numpy()).astype("int64")
    for rf, g in df.groupby("l_returnflag"):
        r = g["x"].corr(g["y"])
        got = out.loc[rf, "corr_fp"] / 1e6
        assert abs(got - r) < 2e-6, (rf, got, r)
        assert out.loc[rf, "n"] == len(g)


def test_percentile_cont_matches_numpy():
    """p25/p50/p75 must equal numpy's linear (type-7) interpolation on
    the ×100-rounded values."""
    from fide_crawler_ray.pipelines.relational import T, q_percentile_cont

    out = q_percentile_cont(SF).to_pandas().set_index("l_returnflag")
    df = T(SF, "lineitem",
           ["l_returnflag", "l_extendedprice"]).to_pandas()
    v100 = pd.Series(_rha(df["l_extendedprice"].to_numpy() * 100.0)
                     .astype("int64"))
    for rf, g in v100.groupby(df["l_returnflag"]):
        for q, col in ((25, "p25"), (50, "p50"), (75, "p75")):
            want = np.percentile(g.to_numpy(), q, method="linear") / 100.0
            assert abs(out.loc[rf, col] - want) < 1e-9, (rf, col)
        assert out.loc[rf, "n"] == len(g)


def test_grouped_entropy_bounds_and_values():
    """Entropy must match a direct computation and respect the
    [0, ln(n_types)] bound."""
    from fide_crawler_ray.pipelines.relational import T, q_grouped_entropy

    out = q_grouped_entropy(SF).to_pandas().set_index("user_id")
    ev = T(SF, "events", ["user_id", "event_type"]).to_pandas()
    for uid, g in ev.groupby("user_id"):
        p = g["event_type"].value_counts(normalize=True).to_numpy()
        want = float(-(p * np.log(p)).sum())
        got = out.loc[uid, "entropy_fp"] / 1e6
        assert abs(got - want) < 2e-6, (uid, got, want)
        assert -1e-9 <= got <= np.log(len(p)) + 1e-6


def test_cross_join_full_product():
    """Every (region, nation) pair exactly once, with the derived label."""
    from fide_crawler_ray.pipelines.relational import T, q_cross_join

    out = q_cross_join(SF).to_pandas()
    r = T(SF, "region", ["r_name"]).to_pandas()["r_name"]
    n = T(SF, "nation", ["n_name"]).to_pandas()["n_name"]
    assert len(out) == len(r) * len(n)
    got = set(map(tuple, out[["r_name", "n_name"]].itertuples(index=False)))
    assert got == {(a, b) for a in r for b in n}
    assert (out["pair"] == out["r_name"] + ":" + out["n_name"]).all()


def test_pagerank_tiers_identical():
    """Single-task iteration vs the join-per-iteration distributed plan
    (forced via a zero edge guard) must produce identical integer ranks."""
    from fide_crawler_ray.pipelines.relational import q_pagerank

    # iters=2: tier bit-identity is iteration-shape-independent (each
    # round is the same plan); the driver query keeps its default
    fast = (q_pagerank(SF, iters=2).to_pandas()
            .sort_values("node").reset_index(drop=True))
    slow = (q_pagerank(SF, iters=2, max_single_edges=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow)


def test_pagerank_invariants():
    """Every node ≥ the teleport floor; total mass ≤ the initial 10⁹
    (floor divisions only ever evaporate mass); in-degree correlates
    with rank (the node with max in-degree outranks the median)."""
    from fide_crawler_ray.pipelines.relational import (
        PAGERANK_SCALE, T, _pagerank_edges, q_pagerank)

    out = q_pagerank(SF).to_pandas().set_index("node")["pr_fp"]
    n = len(out)
    tele = (15 * PAGERANK_SCALE // 100) // n
    assert (out >= tele).all()
    assert out.sum() <= PAGERANK_SCALE + n
    ed = _pagerank_edges(SF, n).to_pandas()
    indeg = ed["dst"].value_counts()
    assert out.loc[indeg.idxmax()] > out.median()


def test_triangle_count_tiers_identical():
    """Single-task wedge expansion vs the double-hash-join plan (forced
    via a zero edge guard) must agree exactly."""
    from fide_crawler_ray.pipelines.relational import q_triangle_count

    fast = q_triangle_count(SF).to_pandas()
    slow = q_triangle_count(SF, max_single_edges=0).to_pandas()
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True))
    assert fast["n_wedges"].iloc[0] >= fast["n_triangles"].iloc[0] >= 0


def test_above_customer_avg_tiers_identical(monkeypatch):
    """Broadcast-by-ref tier vs the hash-join tier (forced via a zero
    guard — the 100-TB path where the per-customer aggregate is too
    big to broadcast) must agree exactly."""
    import fide_crawler_ray.pipelines.relational as R

    base = (R.q_above_customer_avg(SF).to_pandas()
            .sort_values("o_orderkey").reset_index(drop=True))
    monkeypatch.setattr(R, "ABOVE_AVG_MAX_BROADCAST", 0)
    joined = (R.q_above_customer_avg(SF).to_pandas()
              .sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, joined[["o_orderkey"]])


def test_region_revenue_tiers_identical(monkeypatch):
    """custkey→region broadcast probe vs the orders⋈customer hash join
    (forced via a zero guard) must agree exactly."""
    import fide_crawler_ray.pipelines.relational as R

    cols = ["r_name", "revenue", "n_orders"]
    base = (R.q_region_revenue(SF).to_pandas()[cols]
            .sort_values("r_name").reset_index(drop=True))
    monkeypatch.setattr(R, "REGION_REV_MAX_BROADCAST", 0)
    joined = (R.q_region_revenue(SF).to_pandas()[cols]
              .sort_values("r_name").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, joined)


def test_quantile_norm_tiers_identical(monkeypatch):
    """Broadcast rank-table probe vs the hash-join tier (forced via a
    zero distinct-value guard) must agree exactly; q_fp spans the full
    [0, 1e6] range with min-rank tie semantics."""
    import fide_crawler_ray.pipelines.relational as R

    base = (R.q_quantile_norm(SF).to_pandas()
            .sort_values("o_orderkey").reset_index(drop=True))
    assert base["q_fp"].min() == 0
    assert base["q_fp"].max() == 1_000_000
    monkeypatch.setattr(R, "QNORM_MAX_BROADCAST_VALUES", 0)
    joined = (R.q_quantile_norm(SF).to_pandas()
              .sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, joined)


def test_bigram_lm_score_tiers_identical(monkeypatch):
    """Broadcast-model scoring (pure map) vs the hash-join tier (forced
    via a zero bigram guard) must agree exactly; scores are negative
    log-likelihood sums, so every ll_fp < 0."""
    import fide_crawler_ray.pipelines.relational as R

    cols = ["doc_id", "n_bigrams", "ll_fp"]
    base = (R.q_bigram_lm_score(SF).to_pandas()[cols]
            .sort_values("doc_id").reset_index(drop=True))
    assert (base["ll_fp"] < 0).all()
    assert (base["n_bigrams"] > 0).all()
    monkeypatch.setattr(R, "LM_MAX_BROADCAST_BIGRAMS", 0)
    joined = (R.q_bigram_lm_score(SF).to_pandas()[cols]
              .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, joined)


def test_triangle_count_hub_budget_falls_back(monkeypatch):
    """A wedge volume above TRIANGLES_WEDGE_BUDGET must reroute the
    single-task tier to the join tier (not OOM one task) and still
    produce the same counts."""
    import fide_crawler_ray.pipelines.relational as R

    base = R.q_triangle_count(SF).to_pandas().reset_index(drop=True)
    monkeypatch.setattr(R, "TRIANGLES_WEDGE_BUDGET", 0)
    rerouted = R.q_triangle_count(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(base, rerouted)


def test_winsorize_clip_fractions():
    """Clip counts must respect the rank rule (≈5% each tail) and the
    clipped sum must equal a direct pandas winsorization."""
    from fide_crawler_ray.pipelines.relational import T, q_winsorize
    import math

    out = q_winsorize(SF).to_pandas().set_index("l_returnflag")
    df = T(SF, "lineitem",
           ["l_returnflag", "l_extendedprice"]).to_pandas()
    df["v"] = _rha(df["l_extendedprice"].to_numpy() * 100.0).astype("int64")
    for rf, g in df.groupby("l_returnflag"):
        v = np.sort(g["v"].to_numpy())
        n = len(v)
        lo = v[max(1, math.ceil(0.05 * n)) - 1]
        hi = v[max(1, math.ceil(0.95 * n)) - 1]
        assert out.loc[rf, "n"] == n
        assert out.loc[rf, "n_clipped_lo"] == int((g["v"] < lo).sum())
        assert out.loc[rf, "n_clipped_hi"] == int((g["v"] > hi).sum())
        assert out.loc[rf, "sum_clipped_fp"] == int(
            g["v"].clip(lo, hi).sum())
        assert out.loc[rf, "n_clipped_lo"] <= math.ceil(0.05 * n)


def test_key_skew_gini_properties():
    """Gini must match a direct computation and sit in [0, 1); top-1
    share must equal the max key frequency."""
    from fide_crawler_ray.pipelines.relational import T, q_key_skew

    row = q_key_skew(SF).to_pandas().iloc[0]
    vc = T(SF, "orders", ["o_custkey"]).to_pandas()["o_custkey"] \
        .value_counts().to_numpy()
    c = np.sort(vc.astype(np.int64))
    k, s = len(c), int(c.sum())
    i = np.arange(1, k + 1, dtype=np.int64)
    num = 2 * int((i * c).sum()) - (k + 1) * s
    assert row["n_keys"] == k and row["n_rows"] == s
    assert row["top1_fp"] == int(c[-1]) * 1_000_000 // s
    assert row["gini_fp"] == num * 1_000_000 // (k * s)
    assert 0 <= row["gini_fp"] < 1_000_000


def test_pareto_frontier_matches_bruteforce():
    """The mergeable per-block skyline must equal the O(n²) dominance
    definition, duplicates included."""
    from fide_crawler_ray.pipelines.relational import (
        T, _round_half_away, _skyline_2d, q_pareto_frontier)

    out = q_pareto_frontier(SF).to_pandas()
    df = T(SF, "orders",
           ["o_orderkey", "o_totalprice", "o_orderdate"]).to_pandas()
    p = _round_half_away(
        df["o_totalprice"].to_numpy() * 100.0).astype("int64")
    d = df["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64")
    survivors = set()
    for i in range(len(p)):
        dominated = (((p >= p[i]) & (d <= d[i]))
                     & ((p > p[i]) | (d < d[i]))).any()
        if not dominated:
            survivors.add(int(df["o_orderkey"].iloc[i]))
    assert set(out["o_orderkey"]) == survivors
    # the vectorized kernel agrees with the same brute force
    mask = _skyline_2d(p, d)
    assert set(df["o_orderkey"].to_numpy()[mask]) == survivors


def test_skyline_merge_property():
    """skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) on random
    integer points (the invariant the distributed plan relies on)."""
    from fide_crawler_ray.pipelines.relational import _skyline_2d

    rng = np.random.default_rng(3)
    for _ in range(20):
        p = rng.integers(0, 40, size=200).astype(np.int64)
        d = rng.integers(0, 40, size=200).astype(np.int64)
        full = _skyline_2d(p, d)
        half = np.zeros(200, dtype=bool)
        half[:100] = _skyline_2d(p[:100], d[:100])
        half[100:] = _skyline_2d(p[100:], d[100:])
        pm, dm = p[half], d[half]
        merged = _skyline_2d(pm, dm)
        got = set(zip(pm[merged], dm[merged]))
        want = set(zip(p[full], d[full]))
        assert got == want


def test_rolling_active_users_matches_pandas():
    """Per-day WAU must equal a direct pandas rolling-window distinct
    count over the same day grid."""
    from fide_crawler_ray.pipelines.relational import (
        T, q_rolling_active_users)

    out = (q_rolling_active_users(SF).to_pandas()
           .set_index("day")["wau"].sort_index())
    ev = T(SF, "events", ["user_id", "ts"]).to_pandas()
    ev["day"] = ev["ts"].to_numpy().astype("datetime64[D]")
    du = ev[["day", "user_id"]].drop_duplicates()
    want = {}
    for d in du["day"].unique():
        for k in range(7):
            wd = str(np.datetime64(d, "D") + np.timedelta64(k, "D"))
            want.setdefault(wd, set())
    for wd in want:
        lo = np.datetime64(wd) - np.timedelta64(6, "D")
        m = (du["day"] >= lo) & (du["day"] <= np.datetime64(wd))
        want[wd] = du[m]["user_id"].nunique()
    assert dict(out) == want


def test_event_transitions_matches_pandas():
    """Global transition counts must equal a direct per-user
    sort + shift count."""
    from fide_crawler_ray.pipelines.relational import (
        T, q_event_transitions)

    out = q_event_transitions(SF).to_pandas()
    got = {(r.prev_event, r.next_event): r.n
           for r in out.itertuples(index=False)}
    ev = T(SF, "events",
           ["user_id", "event_type", "ts", "event_id"]).to_pandas()
    want: dict = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        e = g["event_type"].to_numpy()
        for a, b in zip(e[:-1], e[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


def test_grouped_mad_matches_direct():
    """median_fp / mad_fp must equal the rank-rule picks computed
    directly, and MAD must be ≤ the group's value range."""
    from fide_crawler_ray.pipelines.relational import (
        T, _rank_pick_sorted, q_grouped_mad)

    out = q_grouped_mad(SF).to_pandas().set_index("l_returnflag")
    df = T(SF, "lineitem", ["l_returnflag", "l_quantity"]).to_pandas()
    df["v"] = _rha(df["l_quantity"].to_numpy() * 100.0).astype("int64")
    for rf, g in df.groupby("l_returnflag"):
        v = np.sort(g["v"].to_numpy())
        med = int(_rank_pick_sorted(v, 0.5))
        mad = int(_rank_pick_sorted(np.sort(np.abs(v - med)), 0.5))
        assert out.loc[rf, "median_fp"] == med
        assert out.loc[rf, "mad_fp"] == mad
        assert 0 <= mad <= v[-1] - v[0]


def test_cohort_retention_matches_pandas():
    """The matrix must equal a direct pandas cohort computation, and
    k=0 of each cohort must equal the cohort's size."""
    from fide_crawler_ray.pipelines.relational import (
        T, q_cohort_retention)

    out = q_cohort_retention(SF).to_pandas()
    got = {(r.cohort_day, r.k): r.n_users
           for r in out.itertuples(index=False)}
    ev = T(SF, "events", ["user_id", "ts"]).to_pandas()
    ev["day"] = ev["ts"].to_numpy().astype("datetime64[D]")
    du = ev[["day", "user_id"]].drop_duplicates()
    first = du.groupby("user_id")["day"].min()
    want: dict = {}
    for _, r in du.iterrows():
        c = first[r["user_id"]]
        k = int((r["day"] - c).days)
        if k <= 13:
            key = (str(np.datetime64(c, "D")), k)
            want[key] = want.get(key, 0) + 1
    assert got == want
    sizes = first.value_counts()
    for c, n in sizes.items():
        assert got[(str(np.datetime64(c, "D")), 0)] == n


def test_graph_bfs_tiers_identical_and_valid():
    """Single-task and distributed BFS tiers must return identical
    distances, distances obey the edge relaxation property, and the
    source is 0."""
    from fide_crawler_ray.pipelines.queries import to_df_any
    from fide_crawler_ray.pipelines.relational import (
        _pagerank_edges, q_graph_bfs)

    a = to_df_any(q_graph_bfs(SF)).sort_values("node").reset_index(drop=True)
    b = to_df_any(q_graph_bfs(SF, max_single_edges=0)) \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    dist = dict(zip(a["node"], a["dist"]))
    assert dist[0] == 0
    edges = _pagerank_edges(SF, len(a)).to_pandas()
    for s, d in zip(edges["src"], edges["dst"]):
        if dist[s] >= 0 and dist[d] >= 0:
            assert dist[d] <= dist[s] + 1  # triangle inequality on hops


def test_unnest_explode_roundtrip():
    """Exploded rows must reassemble to the original vectors."""
    from fide_crawler_ray.pipelines.relational import T, q_unnest_explode

    out = q_unnest_explode(SF).to_pandas()
    emb = T(SF, "embeddings", ["vec_id", "embedding"]).to_pandas()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples(index=False)}
    assert len(out) == sum(len(v) for v in vecs.values())
    g = out.sort_values(["vec_id", "ord"]).groupby("vec_id")["val"]
    for vid, vals in g:
        assert np.array_equal(vals.to_numpy(), vecs[vid])


def test_gap_fill_dense_and_consistent():
    """Every user's day axis is dense lo..hi; nonzero counts match the
    raw per-day counts; fill rows are exactly the missing days."""
    from fide_crawler_ray.pipelines.relational import T, q_gap_fill

    out = q_gap_fill(SF).to_pandas()
    ev = T(SF, "events", ["user_id", "ts"]).to_pandas()
    ev["day"] = ev["ts"].to_numpy().astype("datetime64[D]").astype("int64")
    raw = ev.groupby(["user_id", "day"]).size()
    for uid, g in out.groupby("user_id"):
        days = g["day"].to_numpy()
        assert np.array_equal(days, np.arange(days[0], days[-1] + 1))
        for d, n in zip(days, g["n"]):
            assert n == raw.get((uid, d), 0)


def test_cdc_upsert_last_write_wins():
    from fide_crawler_ray.pipelines.relational import T, q_cdc_upsert

    out = q_cdc_upsert(SF).to_pandas()
    orders = T(SF, "orders", ["o_orderkey"]).to_pandas()
    assert len(out) == orders["o_orderkey"].nunique()  # one row per key
    upd = out["o_orderkey"] % 7 == 0
    assert (out.loc[upd, "version"] == 1).all()
    assert (out.loc[~upd, "version"] == 0).all()


def test_full_outer_join_both_sides_preserved():
    """Left-only, right-only, and matched keys all survive the full
    outer join with the correct flag/count fills."""
    from fide_crawler_ray.pipelines.relational import T, q_j_full_outer

    out = q_j_full_outer(SF).to_pandas().set_index("custkey")
    cust = T(SF, "customer", ["c_custkey", "c_acctbal"]).to_pandas()
    orders = T(SF, "orders", ["o_custkey", "o_totalprice"]).to_pandas()
    neg = set(cust.loc[cust["c_acctbal"] < 0, "c_custkey"])
    big = orders[orders["o_totalprice"] > 300000] \
        .groupby("o_custkey").size().to_dict()
    assert set(out.index) == neg | set(big)
    for k, row in out.iterrows():
        assert row["has_neg_bal"] == (1 if k in neg else 0)
        assert row["n_big"] == big.get(k, 0)


def test_forward_fill_locf_semantics():
    """Per user in (ts, event_id) order: each row carries the latest
    reading (event_id of the last %7==0 row) at or before it; leading
    rows are NaN."""
    from fide_crawler_ray.pipelines.relational import T, q_forward_fill

    out = q_forward_fill(SF).to_pandas()
    ev = T(SF, "events", ["user_id", "ts", "event_id"]).to_pandas()
    got = out.set_index("event_id")["filled"]
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        carry = np.nan
        for eid in g["event_id"]:
            if eid % 7 == 0:
                carry = float(eid)
            want = got.loc[eid]
            assert (np.isnan(want) and np.isnan(carry)) or want == carry


def test_exists_subquery_matches_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_exists_subquery

    out = q_exists_subquery(SF).to_pandas() \
        .set_index("o_orderpriority")["n_orders"]
    li = T(SF, "lineitem", ["l_orderkey", "l_quantity"]).to_pandas()
    orders = T(SF, "orders", ["o_orderkey", "o_orderpriority"]).to_pandas()
    keys = set(li.loc[li["l_quantity"] > 45, "l_orderkey"])
    want = orders[orders["o_orderkey"].isin(keys)] \
        .groupby("o_orderpriority").size()
    assert out.sort_index().equals(want.sort_index())


def test_order_count_distribution_includes_zero_bucket():
    from fide_crawler_ray.pipelines.relational import (
        T, q_order_count_distribution)

    out = q_order_count_distribution(SF).to_pandas() \
        .set_index("n_orders")["n_custs"]
    cust = T(SF, "customer", ["c_custkey"]).to_pandas()
    orders = T(SF, "orders", ["o_custkey"]).to_pandas()
    per_cust = orders.groupby("o_custkey").size() \
        .reindex(cust["c_custkey"], fill_value=0)
    want = per_cust.value_counts()
    assert out.sort_index().equals(want.sort_index())
    assert out.sum() == len(cust)


def test_argmax_join_per_nation_max_with_tiebreak():
    from fide_crawler_ray.pipelines.relational import T, q_argmax_join

    out = q_argmax_join(SF).to_pandas().set_index("c_nationkey")
    cust = T(SF, "customer",
             ["c_nationkey", "c_custkey", "c_acctbal"]).to_pandas()
    for nk, g in cust.groupby("c_nationkey"):
        best = g[g["c_acctbal"] == g["c_acctbal"].max()]
        want = best.loc[best["c_custkey"].idxmin()]
        assert out.loc[nk, "c_custkey"] == want["c_custkey"]
        assert out.loc[nk, "c_acctbal"] == want["c_acctbal"]


def test_mom_growth_lag_semantics():
    from fide_crawler_ray.pipelines.relational import q_mom_growth

    out = q_mom_growth(SF).to_pandas()
    for _, g in out.groupby("c_mktsegment"):
        g = g.sort_values("month")
        assert np.isnan(g["prev_fp"].iloc[0])  # first month has no lag
        got_prev = g["prev_fp"].to_numpy()[1:]
        assert np.array_equal(got_prev,
                              g["rev_fp"].to_numpy()[:-1].astype(float))
        d = g["diff_fp"].to_numpy()[1:]
        assert np.array_equal(
            d, g["rev_fp"].to_numpy()[1:] - g["rev_fp"].to_numpy()[:-1])


def test_source_jaccard_matches_bruteforce_sets():
    from fide_crawler_ray.pipelines.relational import (
        _TOKEN, T, q_source_jaccard)

    out = q_source_jaccard(SF)
    docs = T(SF, "documents", ["source", "text"]).to_pandas()
    sets: dict = {}
    for s, txt in zip(docs["source"], docs["text"]):
        sets.setdefault(s, set()).update(_TOKEN.findall(txt.lower()))
    got = {(r.src_a, r.src_b): (r.n_inter, r.n_union, r.jaccard)
           for r in out.itertuples()}
    srcs = sorted(sets)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            ni = len(sets[a] & sets[b])
            if ni == 0:
                assert (a, b) not in got
                continue
            nu = len(sets[a] | sets[b])
            assert got[(a, b)] == (ni, nu, ni / nu)


def test_cms_partials_merge_and_never_underestimate():
    from fide_crawler_ray.functions.sketches import cms_partial, cms_query

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 3000, size=120_000)
    merged = np.zeros_like(cms_partial(keys[:1]))
    for chunk in np.array_split(keys, 11):
        merged += cms_partial(chunk)
    assert np.array_equal(merged, cms_partial(keys))  # mergeable
    qk = np.arange(3000)
    est = cms_query(merged, qk)
    exact = np.bincount(keys, minlength=3000)
    assert (est >= exact).all()


def test_bucketed_join_equals_shuffle_join_and_is_partitioned():
    """The zero-exchange bucketed plan must agree with the shuffle-join
    aggregate (nation keys + counts), and bucket count must not change
    the result (partial sums are exact integers)."""
    from fide_crawler_ray.pipelines.relational import (
        q_bucketed_join, q_j_inner_join)

    a = q_bucketed_join(SF).to_pandas() \
        .sort_values("c_nationkey").reset_index(drop=True)
    b = q_bucketed_join(SF, n_buckets=5).to_pandas() \
        .sort_values("c_nationkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    j = q_j_inner_join(SF).to_pandas() \
        .sort_values("c_nationkey").reset_index(drop=True)
    assert a["c_nationkey"].tolist() == j["c_nationkey"].tolist()
    assert a["n_orders"].tolist() == j["n_orders"].tolist()


def test_trimmed_mean_histogram_equals_sorted_slice():
    """The histogram rank-overlap plan must equal the brute-force
    'sort each group, drop n//10 off each end' computation."""
    from fide_crawler_ray.pipelines.relational import T, q_trimmed_mean

    got = q_trimmed_mean(SF).set_index("l_returnflag")
    df = T(SF, "lineitem", ["l_returnflag", "l_quantity"]).to_pandas()
    for flag, g in df.groupby("l_returnflag"):
        qc = np.sort(_rha(g["l_quantity"].to_numpy() * 100).astype(np.int64))
        n = len(qc)
        kept = qc[n // 10: n - n // 10]
        assert got.loc[flag, "n_kept"] == len(kept)
        assert got.loc[flag, "sum_fp"] == int(kept.sum())
        assert got.loc[flag, "mean_fp"] == int(
            _rha(np.float64(kept.sum()) / len(kept)))


def test_chi_square_marginal_consistency():
    """Expected counts must reproduce the observed marginals (Σe per
    row/column/total == observed, within fixed-point rounding)."""
    from fide_crawler_ray.pipelines.relational import q_chi_square

    out = q_chi_square(SF)
    n_tot = out["n"].sum()
    assert abs(out["e_fp"].sum() - n_tot * 1_000_000) <= len(out)
    for col in ("o_orderstatus", "o_orderpriority"):
        g = out.groupby(col).agg(n=("n", "sum"), e=("e_fp", "sum"))
        assert (abs(g["e"] - g["n"] * 1_000_000) <= len(out)).all()
    assert (out["chi2_fp"] >= 0).all()


def test_fk_integrity_counts_match_pandas():
    from fide_crawler_ray.pipelines.relational import T, q_fk_integrity

    got = q_fk_integrity(SF).set_index("relation")
    li = T(SF, "lineitem", ["l_orderkey", "l_partkey"]).to_pandas()
    orders = T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    part = T(SF, "part", ["p_partkey"]).to_pandas()
    cust = T(SF, "customer", ["c_custkey"]).to_pandas()
    cases = {
        "lineitem.l_orderkey->orders":
            (li["l_orderkey"], orders["o_orderkey"]),
        "lineitem.l_partkey->part": (li["l_partkey"], part["p_partkey"]),
        "orders.o_custkey->customer":
            (orders["o_custkey"], cust["c_custkey"]),
    }
    for rel, (child, parent) in cases.items():
        ck = set(child)
        assert got.loc[rel, "n_child_keys"] == len(ck)
        assert got.loc[rel, "n_orphans"] == len(ck - set(parent))


def test_group_mean_impute_semantics():
    """Missing rows take their user's present-value mean; present rows
    pass through; all-missing users stay null."""
    from fide_crawler_ray.pipelines.relational import T, q_group_mean_impute

    out = q_group_mean_impute(SF).to_pandas().set_index("event_id")
    ev = T(SF, "events", ["event_id", "user_id", "value"]).to_pandas()
    ev["v_fp"] = _rha(ev["value"].to_numpy() * 1e6).astype(np.int64)
    ev["miss"] = ev["event_id"] % 11 == 0
    means = {}
    for uid, g in ev[~ev["miss"]].groupby("user_id"):
        means[uid] = int(_rha(np.float64(g["v_fp"].sum()) / len(g)))
    checked_missing = 0
    for _, e in ev.sample(n=min(len(ev), 400), random_state=2).iterrows():
        got = out.loc[e["event_id"], "value_fp"]
        if not e["miss"]:
            assert got == e["v_fp"]
        elif e["user_id"] in means:
            assert got == means[e["user_id"]]
            checked_missing += 1
        else:
            assert pd.isna(got)
    assert checked_missing > 0


def test_ratio_to_report_shares_sum_to_unit():
    """Within every region the nation shares must sum to 1e9 (within
    per-nation rounding), and rev_fp must be consistent with shares."""
    from fide_crawler_ray.pipelines.relational import q_ratio_to_report

    out = q_ratio_to_report(SF)
    for region, g in out.groupby("r_name"):
        assert abs(g["share_fp"].sum() - 1_000_000_000) <= len(g)
        # the largest-revenue nation must carry the largest share
        assert (g["rev_fp"].idxmax() == g["share_fp"].idxmax())


def test_idle_rich_customers_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        _IDLE_RICH_NATIONS, T, q_idle_rich_customers)

    got = q_idle_rich_customers(SF).to_pandas() \
        .sort_values("c_nationkey").reset_index(drop=True)
    cust = T(SF, "customer",
             ["c_custkey", "c_nationkey", "c_acctbal"]).to_pandas()
    orders = T(SF, "orders", ["o_custkey", "o_totalprice"]).to_pandas()
    pool = cust[(cust["c_acctbal"] > 0.0)
                & cust["c_nationkey"].isin(_IDLE_RICH_NATIONS)].copy()
    pool["bal_c"] = _rha(pool["c_acctbal"].to_numpy() * 100).astype(np.int64)
    tot, n = int(pool["bal_c"].sum()), len(pool)
    big = set(orders[orders["o_totalprice"] > 450000.0]["o_custkey"])
    sel = pool[(pool["bal_c"] * n > tot)
               & ~pool["c_custkey"].isin(big)]
    exp = sel.groupby("c_nationkey").agg(
        n_custs=("bal_c", "size"), totbal_fp=("bal_c", "sum"),
    ).reset_index().sort_values("c_nationkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_custs": "int64", "totbal_fp": "int64"}), exp,
        check_dtype=False)


def test_dedup_survivor_keeps_best_per_cluster():
    """Each md5 cluster keeps exactly one row: max n_chars, min doc_id
    tie-break — and every cluster is represented."""
    import hashlib

    from fide_crawler_ray.pipelines.relational import T, q_dedup_survivor

    got = q_dedup_survivor(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    docs = T(SF, "documents", ["doc_id", "text", "source",
                               "n_chars"]).to_pandas()
    docs["h"] = [hashlib.md5((t or "").encode()).hexdigest()
                 for t in docs["text"]]
    exp = docs.sort_values(["n_chars", "doc_id"],
                           ascending=[False, True]) \
        .groupby("h", sort=False).head(1)
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])
    assert len(got) == docs["h"].nunique()


def test_time_weighted_avg_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_time_weighted_avg

    got = q_time_weighted_avg(SF).to_pandas().set_index("user_id")
    ev = T(SF, "events", ["user_id", "ts", "event_id",
                          "value"]).to_pandas()
    checked = 0
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ms = g["ts"].to_numpy().astype("datetime64[ms]").view("int64")
        dw = ms[1:] - ms[:-1]
        if len(g) < 2 or dw.sum() == 0:
            assert uid not in got.index
            continue
        v = _rha(g["value"].to_numpy() * 1e3).astype(np.int64)
        assert got.loc[uid, "total_dwell_ms"] == dw.sum()
        assert got.loc[uid, "twa_fp"] == int(
            _rha(np.float64((v[:-1] * dw).sum()) / dw.sum()))
        checked += 1
        if checked >= 40:
            break
    assert checked > 0


def test_weighted_sample_deterministic_and_weight_biased():
    """Same input → bit-identical sample; and A-ES must favor heavy
    rows: the sample's mean weight exceeds the population mean."""
    from fide_crawler_ray.pipelines.relational import T, q_weighted_sample

    a = q_weighted_sample(SF).to_pandas()
    b = q_weighted_sample(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    orders = T(SF, "orders", ["o_orderkey", "o_totalprice"]).to_pandas()
    w = orders.set_index("o_orderkey")["o_totalprice"]
    assert w.loc[a["o_orderkey"]].mean() > w.mean()


def test_bloom_kernels_mergeable_no_false_negatives():
    from fide_crawler_ray.functions.sketches import (
        bloom_partial, bloom_probe)

    keys = np.arange(5000, dtype=np.uint64) * 7919
    m = 1 << 17
    single = bloom_partial(keys, m)
    merged = np.zeros_like(single)
    for c in np.array_split(keys, 9):
        merged |= bloom_partial(c, m)
    assert np.array_equal(single, merged)
    assert bloom_probe(single, keys).all()
    probe = np.arange(10_000_000, 10_050_000, dtype=np.uint64)
    assert bloom_probe(single, probe).mean() < 0.01


def test_bloom_semi_join_audit():
    """Exact semi count must equal the true pandas semi count and the
    in-query gates must hold (they assert internally)."""
    from fide_crawler_ray.pipelines.relational import T, q_bloom_semi_join

    row = q_bloom_semi_join(SF).iloc[0]
    cust = T(SF, "customer", ["c_custkey", "c_acctbal"]).to_pandas()
    orders = T(SF, "orders", ["o_custkey"]).to_pandas()
    rich = set(cust[cust["c_acctbal"] > 4000.0]["c_custkey"])
    assert row["n_exact"] == orders["o_custkey"].isin(rich).sum()
    assert row["n_bloom_pass"] >= row["n_exact"]
    assert row["n_orders"] == len(orders)


def test_join_size_estimate_exact_side():
    """The exact Σf² must equal the brute-force self-join size; the
    sketch gates assert inside the query."""
    from fide_crawler_ray.pipelines.relational import (
        T, q_join_size_estimate)

    row = q_join_size_estimate(SF).iloc[0]
    li = T(SF, "lineitem", ["l_partkey"]).to_pandas()
    f = li["l_partkey"].value_counts().to_numpy()
    assert row["exact"] == int((f.astype(object) ** 2).sum())
    assert row["est"] >= row["exact"]


def test_pmi_bigrams_bruteforce():
    import math
    import re

    from fide_crawler_ray.pipelines.relational import T, q_pmi_bigrams

    got = q_pmi_bigrams(SF).to_pandas()
    texts = T(SF, "documents", ["text"]).to_pandas()["text"]
    tok = re.compile(r"[a-z0-9_]+")
    cnt = {}
    for t in texts:
        ws = tok.findall(t.lower())
        for a, b in zip(ws, ws[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    nb = sum(cnt.values())
    c1, c2 = {}, {}
    for (a, b), c in cnt.items():
        c1[a] = c1.get(a, 0) + c
        c2[b] = c2.get(b, 0) + c
    exp = {k: int(_rha(np.float64(1e9 * math.log(
        float(c * nb) / float(c1[k[0]] * c2[k[1]])))))
        for k, c in cnt.items() if c >= 5}
    gotmap = {(r["w1"], r["w2"]): (r["c"], r["pmi_fp"])
              for _, r in got.iterrows()}
    assert set(gotmap) == set(exp)
    for k, pmi in exp.items():
        assert gotmap[k] == (cnt[k], pmi), k


def test_daily_anomaly_integer_rule_matches_float_sigma():
    """The cross-multiplied integer rule must agree with the float 3σ
    rule on every scored day (and on a synthetic spike)."""
    from fide_crawler_ray.pipelines.relational import q_daily_anomaly

    out = q_daily_anomaly(SF)
    assert len(out) > 0
    # re-derive the float rule from the integer outputs: dev_sq>thr
    # ⟺ (n-mean)² > 9·var with mean=s/7, var=(s2·7−s²)/49 — verify on
    # a synthetic series with a known spike
    n = np.array([100, 101, 99, 100, 102, 98, 100, 100, 180], np.int64)
    k = 7
    s = n[1:8].sum()
    s2 = (n[1:8] ** 2).sum()
    dev_sq = (n[8] * k - s) ** 2
    thr = 9 * (s2 * k - s * s)
    mean = s / k
    var = (s2 - s * s / k) / k
    assert (dev_sq > thr) == ((n[8] - mean) ** 2 > 9 * var)
    assert dev_sq > thr  # the spike must trip the detector
    # and on the real data both formulations agree day by day
    for _, r in out.iterrows():
        assert (r["dev_sq"] > r["thr"]) == bool(r["is_anomaly"])


def test_ship_delay_distribution_matches_bruteforce():
    """The histogram totals the lineitem row count and matches the
    pandas merge + day-delta value counts exactly (the synthetic
    shipdates are independent of order dates, so deltas span both
    signs — the operator must not assume an ordering)."""
    from fide_crawler_ray.pipelines.relational import (
        T, q_ship_delay_distribution)

    out = q_ship_delay_distribution(SF).to_pandas() \
        .sort_values("delay_days").reset_index(drop=True)
    li = T(SF, "lineitem", ["l_orderkey", "l_shipdate"]).to_pandas()
    orders = T(SF, "orders", ["o_orderkey", "o_orderdate"]).to_pandas()
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    delta = (m["l_shipdate"].to_numpy().astype("datetime64[D]")
             - m["o_orderdate"].to_numpy().astype("datetime64[D]")
             ).astype(np.int64)
    exp = pd.Series(delta).value_counts().sort_index()
    assert out["n"].sum() == len(li)
    assert out["delay_days"].tolist() == exp.index.tolist()
    assert out["n"].tolist() == exp.tolist()


def test_promo_ratio_bounds_and_consistency():
    from fide_crawler_ray.pipelines.relational import q_promo_revenue_ratio

    out = q_promo_revenue_ratio(SF).to_pandas()
    assert ((out["ratio_fp"] >= 0) & (out["ratio_fp"] <= 10**9)).all()
    assert (out["promo_fp"] <= out["total_fp"]).all()
    assert len(out) > 12  # multiple ship months present


def test_standardize_groupwise_properties():
    """Within each event_type the z-scores must have ~zero mean and
    ~unit variance (up to the 1e-6 fixed-point grid)."""
    from fide_crawler_ray.pipelines.relational import q_standardize

    out = q_standardize(SF).to_pandas()
    for et, g in out.groupby("event_type"):
        z = g["z_fp"].to_numpy(np.float64) / 1e6
        assert abs(z.mean()) < 1e-3, et
        assert abs(z.std(ddof=0) - 1.0) < 1e-3, et


def test_split_is_stable_under_corpus_growth():
    """Hash-based assignment: every doc keeps its split when new docs
    arrive (the reproducibility property RNG splits lack) — check by
    assigning a superset and comparing the overlap; and the global
    80/10/10 proportions hold loosely."""
    import hashlib

    from fide_crawler_ray.pipelines.relational import (
        T, q_train_val_test_split)

    out = q_train_val_test_split(SF).to_pandas()
    tot = out.groupby("split")["n"].sum()
    n = tot.sum()
    assert 0.7 <= tot.get("train", 0) / n <= 0.9
    ids = T(SF, "documents", ["doc_id"]).to_pandas()["doc_id"].tolist()

    def assign(i):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10
        return "train" if b < 8 else ("val" if b == 8 else "test")

    base = {i: assign(i) for i in ids}
    grown = {i: assign(i) for i in ids + list(range(10**9, 10**9 + 500))}
    assert all(grown[i] == base[i] for i in ids)


def test_quality_top_quartile_threshold_rule():
    """Kept docs are exactly those above their source's rank-rule p75
    (value at row ceil(0.75·n) of the sorted multiset)."""
    import math

    from fide_crawler_ray.pipelines.relational import (
        T, q_quality_top_quartile)

    got = set(q_quality_top_quartile(SF).to_pandas()["doc_id"])
    docs = T(SF, "documents", ["doc_id", "source", "n_chars"]).to_pandas()
    exp = set()
    for src, g in docs.groupby("source"):
        vals = np.sort(g["n_chars"].to_numpy())
        p75 = vals[max(1, math.ceil(0.75 * len(vals))) - 1]
        exp |= set(g[g["n_chars"] > p75]["doc_id"])
    assert got == exp


def test_schema_evolution_read_backfills_nulls():
    """Epoch-1 rows (written before the column existed) must surface
    with NULL priority; epoch-2 rows keep theirs; totals reconcile with
    the base table."""
    from fide_crawler_ray.pipelines.relational import (
        T, q_schema_evolution_read)

    out = q_schema_evolution_read(SF).to_pandas()
    orders = T(SF, "orders",
               ["o_orderkey", "o_totalprice", "o_orderpriority"]
               ).to_pandas()
    n_even = (orders["o_orderkey"] % 2 == 0).sum()
    null_row = out[out["o_orderpriority_u"].isna()]
    assert len(null_row) == 1 and null_row["n"].iloc[0] == n_even
    assert out["n"].sum() == len(orders)
    odd = orders[orders["o_orderkey"] % 2 == 1]
    for pri, g in odd.groupby("o_orderpriority"):
        assert out[out["o_orderpriority_u"] == pri]["n"].iloc[0] == len(g)


def test_kcore_tiers_equal_and_match_bruteforce():
    """Single-task peel == distributed join tier == brute-force numpy
    peel; gates (≥k degree, fixpoint) assert inside the query."""
    from fide_crawler_ray.pipelines.relational import (
        KCORE_K, T, _pagerank_edges, q_graph_kcore)

    a = q_graph_kcore(SF).to_pandas().sort_values("node") \
        .reset_index(drop=True)
    b = q_graph_kcore(SF, max_single_edges=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    n = T(SF, "customer", ["c_custkey"]).count()
    raw = _pagerank_edges(SF, n).to_pandas()
    s, d = raw["src"].to_numpy(), raw["dst"].to_numpy()
    keep = s != d
    e = np.unique(np.stack([np.minimum(s[keep], d[keep]),
                            np.maximum(s[keep], d[keep])], 1), axis=0)
    u, v = e[:, 0], e[:, 1]
    live = np.ones(len(u), bool)
    while True:
        deg = (np.bincount(u[live], minlength=n)
               + np.bincount(v[live], minlength=n))
        bad = (deg > 0) & (deg < KCORE_K)
        if not bad.any():
            break
        live &= ~(bad[u] | bad[v])
    deg = (np.bincount(u[live], minlength=n)
           + np.bincount(v[live], minlength=n))
    nodes = np.flatnonzero(deg >= KCORE_K)
    assert a["node"].tolist() == nodes.tolist()
    assert a["core_deg"].tolist() == deg[nodes].tolist()


def test_incremental_agg_merge_equals_recompute():
    """Merging the pre-cutoff base with the late delta must equal the
    full recompute (exact integer partials)."""
    from fide_crawler_ray.pipelines.relational import (
        T, q_incremental_agg)

    got = q_incremental_agg(SF).to_pandas().sort_values("month") \
        .reset_index(drop=True)
    orders = T(SF, "orders", ["o_orderdate", "o_totalprice"]).to_pandas()
    orders["month"] = orders["o_orderdate"].dt.strftime("%Y-%m")
    orders["fp"] = _rha(orders["o_totalprice"].to_numpy() * 100) \
        .astype(np.int64)
    exp = orders.groupby("month").agg(
        rev_fp=("fp", "sum"), n=("fp", "size")).reset_index() \
        .sort_values("month").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"rev_fp": "int64", "n": "int64"}), exp,
        check_dtype=False)


def test_time_to_convert_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_time_to_convert

    got = q_time_to_convert(SF).to_pandas().set_index("user_id")
    ev = T(SF, "events", ["user_id", "ts", "event_type"]).to_pandas()
    ev["ms"] = ev["ts"].to_numpy().astype("datetime64[ms]").view("int64")
    checked = 0
    for uid, g in ev.groupby("user_id"):
        views = g[g["event_type"] == "view"]["ms"]
        if views.empty:
            assert uid not in got.index
            continue
        v = views.min()
        purch = g[(g["event_type"] == "purchase") & (g["ms"] >= v)]["ms"]
        if purch.empty:
            assert uid not in got.index
        else:
            assert got.loc[uid, "ttc_ms"] == purch.min() - v
            checked += 1
    assert checked > 0


def test_rfm_segments_bruteforce():
    import math

    from fide_crawler_ray.pipelines.relational import T, q_rfm_segments

    got = q_rfm_segments(SF).to_pandas() \
        .sort_values(["r_bucket", "f_bucket", "m_band"]) \
        .reset_index(drop=True)
    orders = T(SF, "orders",
               ["o_custkey", "o_orderdate", "o_totalprice"]).to_pandas()
    orders["day"] = orders["o_orderdate"].to_numpy() \
        .astype("datetime64[D]").view("int64")
    orders["cents"] = _rha(
        orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    pc_ = orders.groupby("o_custkey").agg(
        last_day=("day", "max"), f=("day", "size"),
        m=("cents", "sum"))
    ref = pc_["last_day"].max()
    r = (ref - pc_["last_day"]).to_numpy()
    f = pc_["f"].to_numpy()

    def th(v):
        s = np.sort(v)
        return [int(s[max(1, math.ceil(q * len(s))) - 1])
                for q in (0.25, 0.5, 0.75)]

    rt, ft = th(r), th(f)
    rb = 1 + sum((r > t).astype(int) for t in rt)
    fb = 1 + sum((f > t).astype(int) for t in ft)
    mb = pc_["m"].astype(str).str.len().to_numpy()
    exp = pd.DataFrame({"r_bucket": rb, "f_bucket": fb, "m_band": mb}) \
        .groupby(["r_bucket", "f_bucket", "m_band"]).size() \
        .rename("n_custs").reset_index() \
        .sort_values(["r_bucket", "f_bucket", "m_band"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(exp.dtypes.to_dict()), exp, check_dtype=False)


def test_supplier_profit_tiers_equal():
    """Broadcast tier == hash-join tier (forced via max_broadcast=0)."""
    from fide_crawler_ray.pipelines.relational import (
        q_supplier_nation_profit)

    a = q_supplier_nation_profit(SF).to_pandas() \
        .sort_values(["n_name", "o_year"]).reset_index(drop=True)
    b = q_supplier_nation_profit(SF, max_broadcast=0).to_pandas() \
        .sort_values(["n_name", "o_year"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])


def test_disjunctive_band_revenue_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, q_disjunctive_band_revenue)

    got = q_disjunctive_band_revenue(SF).iloc[0]
    li = T(SF, "lineitem", ["l_partkey", "l_quantity",
                            "l_extendedprice", "l_discount"]).to_pandas()
    part = T(SF, "part", ["p_partkey", "p_type", "p_size"]).to_pandas()
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    q, t, s = m["l_quantity"], m["p_type"], m["p_size"]
    keep = (((t == "PROMO") & q.between(1, 11))
            | ((t == "SMALL") & s.between(1, 25) & q.between(10, 20))
            | ((t == "LARGE") & (s >= 10) & q.between(20, 30)))
    fp = _rha(m.loc[keep, "l_extendedprice"].to_numpy()
              * (1.0 - m.loc[keep, "l_discount"].to_numpy())
              * 100.0).astype(np.int64)
    assert got["n_rows"] == int(keep.sum())
    assert got["revenue_fp"] == int(fp.sum())


def test_zorder_layout_prunes_most_blocks():
    """The z-layout claim: the fixed 2-D range touches a small minority
    of z-blocks, and zone maps are consistent (min<=max, rows>0)."""
    from fide_crawler_ray.pipelines.relational import q_zorder_layout

    out = q_zorder_layout(SF).to_pandas()
    assert (out["n_rows"] > 0).all()
    assert (out["min_x"] <= out["max_x"]).all()
    assert (out["min_y"] <= out["max_y"]).all()
    if len(out) >= 8:
        assert out["touched"].mean() < 0.5, out["touched"].mean()


def test_q3_shipping_priority_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, q_q3_shipping_priority)

    got = q_q3_shipping_priority(SF)
    li = T(SF, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice",
                            "l_discount"]).to_pandas()
    o = T(SF, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                         "o_orderpriority"]).to_pandas()
    c = T(SF, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    cut = pd.Timestamp("1998-07-01")
    li = li[li["l_shipdate"] > cut].copy()
    li["revenue_fp"] = _rha(li["l_extendedprice"].to_numpy()
                            * (1.0 - li["l_discount"].to_numpy())
                            * 100.0).astype(np.int64)
    agg = li.groupby("l_orderkey")["revenue_fp"].sum().reset_index()
    m = (agg.merge(o[o["o_orderdate"] < cut], left_on="l_orderkey",
                   right_on="o_orderkey")
         .merge(c[c["c_mktsegment"] == "BUILDING"], left_on="o_custkey",
                right_on="c_custkey"))
    exp = (m.sort_values(["revenue_fp", "l_orderkey"],
                         ascending=[False, True]).head(10)
           [["l_orderkey", "o_orderdate", "o_orderpriority", "revenue_fp"]]
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_q7_nation_trade_volume_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, q_q7_nation_trade_volume)

    got = (q_q7_nation_trade_volume(SF).to_pandas()
           .sort_values(["supp_nation", "cust_nation", "l_year"])
           .reset_index(drop=True))
    li = T(SF, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate",
                            "l_extendedprice", "l_discount"]).to_pandas()
    s = T(SF, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    o = T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    c = T(SF, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    n = T(SF, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nm = dict(zip(n["n_nationkey"], n["n_name"]))
    m = (li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
         .merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey"))
    m["supp_nation"] = m["s_nationkey"].map(nm)
    m["cust_nation"] = m["c_nationkey"].map(nm)
    m = m[m["supp_nation"] != m["cust_nation"]].copy()
    m["l_year"] = m["l_shipdate"].dt.year.astype("int64")
    m["volume_fp"] = _rha(m["l_extendedprice"].to_numpy()
                          * (1.0 - m["l_discount"].to_numpy())
                          * 100.0).astype(np.int64)
    exp = (m.groupby(["supp_nation", "cust_nation", "l_year"])
           .agg(volume_fp=("volume_fp", "sum"),
                n_items=("volume_fp", "size"))
           .reset_index()
           .sort_values(["supp_nation", "cust_nation", "l_year"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)


def test_q15_top_supplier_is_argmax_with_ties():
    from fide_crawler_ray.pipelines.relational import (
        T, q_q15_top_supplier)

    got = q_q15_top_supplier(SF)
    li = T(SF, "lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice",
                            "l_discount"]).to_pandas()
    li = li[(li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1997-04-01"))].copy()
    li["fp"] = _rha(li["l_extendedprice"].to_numpy()
                    * (1.0 - li["l_discount"].to_numpy())
                    * 100.0).astype(np.int64)
    per = li.groupby("l_suppkey")["fp"].sum()
    best = per.max()
    exp = sorted(per[per == best].index.tolist())
    assert got["l_suppkey"].tolist() == exp
    assert (got["total_fp"] == best).all()


def test_q17_integer_condition_matches_float_form():
    """The cross-multiplied all-integer condition (5·qty_fp·n < Σqty_fp)
    must select exactly the rows the float form qty < 0.2·avg does on
    this data (the integer form exists to kill div-rounding ambiguity,
    not to change semantics)."""
    from fide_crawler_ray.pipelines.relational import (
        T, q_q17_small_qty_revenue)

    got = q_q17_small_qty_revenue(SF).iloc[0]
    li = T(SF, "lineitem",
           ["l_partkey", "l_quantity", "l_extendedprice"]).to_pandas()
    qty_fp = _rha(li["l_quantity"].to_numpy() * 100.0).astype(np.int64)
    cents = _rha(li["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
    g = pd.DataFrame({"pk": li["l_partkey"], "q": qty_fp}).groupby("pk")["q"]
    s = g.sum().reindex(li["l_partkey"]).to_numpy()
    n = g.size().reindex(li["l_partkey"]).to_numpy()
    keep_int = 5 * qty_fp * n < s
    assert got["n_rows"] == int(keep_int.sum())
    assert got["revenue_fp"] == int(cents[keep_int].sum())


def test_q18_large_orders_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, q_q18_large_orders)

    got = q_q18_large_orders(SF)
    li = T(SF, "lineitem", ["l_orderkey", "l_quantity"]).to_pandas()
    li["qty_fp"] = _rha(li["l_quantity"].to_numpy() * 100.0).astype(np.int64)
    agg = li.groupby("l_orderkey")["qty_fp"].sum()
    big = agg[agg > 25_000].rename("sum_qty_fp").reset_index()
    o = T(SF, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                         "o_totalprice"]).to_pandas()
    o["total_cents"] = _rha(o["o_totalprice"].to_numpy()
                            * 100.0).astype(np.int64)
    m = big.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    exp = (m.sort_values(["total_cents", "l_orderkey"],
                         ascending=[False, True]).head(20)
           [["l_orderkey", "o_custkey", "o_orderdate", "total_cents",
             "sum_qty_fp"]].reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_q8_market_share_bounds_and_one_year():
    from fide_crawler_ray.pipelines.relational import (
        T, q_q8_market_share)

    out = q_q8_market_share(SF).to_pandas()
    assert (out["target_fp"] <= out["total_fp"]).all()
    assert out["share_fp"].between(0, 10**9).all()
    # brute-force one year end-to-end
    li = T(SF, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice",
                            "l_discount"]).to_pandas()
    s = T(SF, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    o = T(SF, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
          ).to_pandas()
    c = T(SF, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    n = T(SF, "nation", ["n_nationkey", "n_name", "n_regionkey"]
          ).to_pandas()
    r = T(SF, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia = set(n.merge(r, left_on="n_regionkey", right_on="r_regionkey")
               .query("r_name == 'ASIA'")["n_nationkey"])
    target = set(n.query("n_name == 'NATION_3'")["n_nationkey"])
    m = (li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
         .merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey"))
    m = m[m["c_nationkey"].isin(asia)].copy()
    m["rev"] = _rha(m["l_extendedprice"].to_numpy()
                    * (1.0 - m["l_discount"].to_numpy())
                    * 100.0).astype(np.int64)
    year = int(out["o_year"].iloc[0])
    my = m[m["o_orderdate"].dt.year == year]
    row = out.set_index("o_year").loc[year]
    assert row["total_fp"] == int(my["rev"].sum())
    assert row["target_fp"] == int(
        my.loc[my["s_nationkey"].isin(target), "rev"].sum())


def test_q16_part_supplier_counts_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, q_q16_part_supplier_counts)

    got = (q_q16_part_supplier_counts(SF).to_pandas()
           .sort_values(["p_brand", "p_type", "p_size"])
           .reset_index(drop=True))
    li = T(SF, "lineitem", ["l_partkey", "l_suppkey"]).to_pandas()
    p = T(SF, "part", ["p_partkey", "p_brand", "p_type", "p_size"]
          ).to_pandas()
    m = li.merge(p[p["p_brand"] != "Brand#1"], left_on="l_partkey",
                 right_on="p_partkey")
    exp = (m.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
           .nunique().rename("supplier_cnt").reset_index()
           .sort_values(["p_brand", "p_type", "p_size"])
           .reset_index(drop=True))
    exp["supplier_cnt"] = exp["supplier_cnt"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_q21_late_sole_supplier_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, q_q21_late_sole_supplier)

    got = q_q21_late_sole_supplier(SF)
    li = T(SF, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]
           ).to_pandas()
    o = T(SF, "orders", ["o_orderkey", "o_orderdate"]).to_pandas()
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["late"] = ((m["l_shipdate"] - m["o_orderdate"]).dt.days
                 > 365).astype(int)
    pp = (m.groupby(["l_orderkey", "l_suppkey"])["late"].max()
          .reset_index())
    po = pp.groupby("l_orderkey").agg(
        ns=("late", "size"), nl=("late", "sum"),
        lsk=("l_suppkey", lambda s: -1))
    late_sk = (pp[pp["late"] == 1].groupby("l_orderkey")["l_suppkey"]
               .max())
    po["lsk"] = late_sk.reindex(po.index, fill_value=-1)
    sole = po[(po["ns"] > 1) & (po["nl"] == 1)]
    exp = (sole.groupby("lsk").size().rename("numwait").reset_index()
           .rename(columns={"lsk": "l_suppkey"})
           .sort_values(["numwait", "l_suppkey"],
                        ascending=[False, True]).head(20)
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_churned_customers_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, q_churned_customers)

    got = (q_churned_customers(SF).to_pandas()
           .sort_values("month").reset_index(drop=True))
    o = T(SF, "orders", ["o_custkey", "o_orderdate"]).to_pandas()
    o["mnum"] = (o["o_orderdate"].dt.year * 12
                 + o["o_orderdate"].dt.month - 1)
    pairs = set(zip(o["o_custkey"], o["mnum"]))
    mx = o["mnum"].max()
    from collections import Counter
    c = Counter(m for ck, m in pairs
                if m < mx and (ck, m + 1) not in pairs)
    exp = (pd.DataFrame(
        [{"month": f"{m // 12:04d}-{m % 12 + 1:02d}", "n_churned": n}
         for m, n in c.items()])
        .sort_values("month").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_late_events_bruteforce():
    import hashlib

    from fide_crawler_ray.pipelines.relational import T, q_late_events

    got = q_late_events(SF).to_pandas().set_index("user_id")
    ev = T(SF, "events", ["user_id", "event_id", "ts"]).to_pandas()
    ev["h"] = ev["event_id"].map(
        lambda i: hashlib.md5(str(i).encode()).hexdigest())
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["h", "event_id"])
        ts = g["ts"].astype("int64").to_numpy()
        run = np.maximum.accumulate(ts)
        late = (ts[1:] < run[:-1]).sum()
        assert got.loc[uid, "n_events"] == len(g)
        assert got.loc[uid, "n_late"] == int(late)
    # the md5 permutation must actually produce disorder somewhere
    assert got["n_late"].sum() > 0


def test_benford_audit_counts_and_expectation():
    from fide_crawler_ray.pipelines.relational import (
        T, q_benford_audit)

    out = q_benford_audit(SF).to_pandas().sort_values("digit")
    n_orders = T(SF, "orders", ["o_orderkey"]).count()
    assert out["n"].sum() == n_orders
    assert set(out["digit"]).issubset(set(range(1, 10)))
    # Benford frequencies sum to 1 when all 9 digits appear
    if len(out) == 9:
        assert abs(out["benford_fp"].sum() - 10**9) <= 5


def test_orc_roundtrip_preserves_totals():
    from fide_crawler_ray.pipelines.relational import T, q_orc_roundtrip

    out = q_orc_roundtrip(SF)
    li = T(SF, "lineitem", ["l_orderkey", "l_quantity"]).to_pandas()
    assert out["n"].sum() == len(li)
    assert out["key_sum"].sum() == li["l_orderkey"].sum()
    assert out["qty_sum_fp"].sum() == int(
        _rha(li["l_quantity"].to_numpy() * 100.0).astype(np.int64).sum())


def test_event_cooccurrence_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, q_event_cooccurrence)

    got = (q_event_cooccurrence(SF).to_pandas()
           .sort_values(["first_type", "second_type"])
           .reset_index(drop=True))
    ev = T(SF, "events", ["user_id", "event_id", "ts", "event_type"]
           ).to_pandas()
    ev["ts_ns"] = ev["ts"].astype("datetime64[ns]").astype("int64")
    from collections import Counter
    c = Counter()
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_ns", "event_id"]).reset_index(drop=True)
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                if g["ts_ns"].iloc[j] - g["ts_ns"].iloc[i] \
                        > 3600 * 10**9:
                    break
                c[(g["event_type"].iloc[i],
                   g["event_type"].iloc[j])] += 1
    exp = (pd.DataFrame(
        [{"first_type": a, "second_type": b, "n": n}
         for (a, b), n in c.items()])
        .sort_values(["first_type", "second_type"])
        .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_compact_store_reduces_files_and_preserves_totals():
    from fide_crawler_ray.pipelines.relational import (
        T, q_compact_store)

    out = q_compact_store(SF).iloc[0]
    docs = T(SF, "documents", ["doc_id", "n_chars"]).to_pandas()
    assert out["n_rows"] == len(docs)
    assert out["id_sum"] == docs["doc_id"].sum()
    assert out["chars_sum"] == docs["n_chars"].sum()
    assert bool(out["compacted"])


def test_theil_index_matches_direct_computation():
    import math

    from fide_crawler_ray.pipelines.relational import T, q_theil_index

    got = q_theil_index(SF).iloc[0]
    o = T(SF, "orders", ["o_custkey", "o_totalprice"]).to_pandas()
    cents = pd.Series(
        _rha(o["o_totalprice"].to_numpy() * 100.0).astype(np.int64))
    x = cents.groupby(o["o_custkey"]).sum()
    n, s = len(x), int(x.sum())
    terms = _rha(np.array([
        1e9 * ((int(v) * n / s)
               * (math.log(int(v)) + math.log(n) - math.log(s)))
        for v in x])).astype(np.int64)
    assert got["n_customers"] == n
    assert got["theil_sum_fp"] == int(terms.sum())
    # Theil index is non-negative and 0 only under perfect equality
    assert got["theil_sum_fp"] >= 0


def test_label_reachability_tiers_equal_and_semantics():
    """The distributed product-graph tier (forced via guard=0) must
    equal the single-task tier, and hop-1 nodes must be exactly the
    lbl-0 out-neighbors of node 0 (the DFA's required first step)."""
    from fide_crawler_ray.pipelines.relational import (
        T, q_label_reachability)

    one = (q_label_reachability(SF).to_pandas()
           .sort_values("node").reset_index(drop=True))
    dist = (q_label_reachability(SF, max_single_edges=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, dist)

    o = T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    n = T(SF, "customer", ["c_custkey"]).count()
    e = pd.DataFrame({
        "src": o["o_custkey"].astype("int64"),
        "dst": (o["o_orderkey"] % n).astype("int64"),
        "lbl": (o["o_orderkey"] % 3).astype("int64"),
    })
    hop1 = set(e[(e["src"] == 0) & (e["lbl"] == 0)]["dst"])
    got1 = set(one[one["dist"] == 1]["node"])
    assert got1 == hop1
    assert (one["dist"] >= 1).all()


def test_graph_sssp_tiers_equal_and_optimal():
    """Distributed Bellman-Ford (forced via guard=0) equals the
    single-task tier, and every reported distance equals the true
    shortest ≤4-edge path cost from a driver-side relaxation."""
    from fide_crawler_ray.pipelines.relational import T, q_graph_sssp

    one = (q_graph_sssp(SF).to_pandas()
           .sort_values("node").reset_index(drop=True))
    dist = (q_graph_sssp(SF, max_single_edges=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, dist)

    o = T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    n = T(SF, "customer", ["c_custkey"]).count()
    src = o["o_custkey"].to_numpy(np.int64)
    dst = (o["o_orderkey"] % n).to_numpy(np.int64)
    w = ((o["o_orderkey"] // n) % 9 + 1).to_numpy(np.int64)
    INF = np.iinfo(np.int64).max // 4
    d = np.full(n, INF, np.int64)
    d[0] = 0
    for _ in range(4):
        cand = d[src] + w
        nd = d.copy()
        np.minimum.at(nd, dst, cand)
        d = nd
    exp = pd.DataFrame({
        "node": np.arange(n, dtype=np.int64)[d < INF],
        "dist": d[d < INF],
    }).reset_index(drop=True)
    pd.testing.assert_frame_equal(one, exp)


def test_q1_pricing_summary_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_q1_pricing_summary

    got = (q_q1_pricing_summary(SF).to_pandas()
           .sort_values(["l_returnflag", "l_linestatus"])
           .reset_index(drop=True))
    li = T(SF, "lineitem",
           ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate"]).to_pandas()
    li = li[li["l_shipdate"] <= pd.Timestamp("2001-09-01")].copy()
    qty = li["l_quantity"].to_numpy()
    price = li["l_extendedprice"].to_numpy()
    disc = li["l_discount"].to_numpy()
    tax = li["l_tax"].to_numpy()
    li["sum_qty_fp"] = _rha(qty * 100.0).astype(np.int64)
    li["sum_base_fp"] = _rha(price * 100.0).astype(np.int64)
    li["sum_disc_price_fp"] = _rha(
        price * (1.0 - disc) * 100.0).astype(np.int64)
    li["sum_charge_fp"] = _rha(
        price * (1.0 - disc) * (1.0 + tax) * 100.0).astype(np.int64)
    li["sum_disc_fp"] = _rha(disc * 10_000.0).astype(np.int64)
    li["count_order"] = np.int64(1)
    g = (li.groupby(["l_returnflag", "l_linestatus"], as_index=False)
         [["sum_qty_fp", "sum_base_fp", "sum_disc_price_fp",
           "sum_charge_fp", "sum_disc_fp", "count_order"]].sum()
         .sort_values(["l_returnflag", "l_linestatus"])
         .reset_index(drop=True))
    n = g["count_order"].to_numpy().astype(np.float64)
    exp = g.assign(
        avg_qty_fp=_rha(1e4 * (g["sum_qty_fp"].to_numpy()
                               / (100.0 * n))).astype(np.int64),
        avg_price_fp=_rha(1e4 * (g["sum_base_fp"].to_numpy()
                                 / (100.0 * n))).astype(np.int64),
        avg_disc_fp=_rha(1e4 * (g["sum_disc_fp"].to_numpy()
                                / (10_000.0 * n))).astype(np.int64),
    ).drop(columns=["sum_disc_fp"])
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


def test_q4_order_priority_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_q4_order_priority

    got = (q_q4_order_priority(SF).to_pandas()
           .sort_values("o_orderpriority").reset_index(drop=True))
    li = T(SF, "lineitem", ["l_orderkey", "l_shipdate"]).to_pandas()
    last = li.groupby("l_orderkey")["l_shipdate"].max()
    o = T(SF, "orders",
          ["o_orderkey", "o_orderdate", "o_orderpriority"]).to_pandas()
    o = o[(o["o_orderdate"] >= pd.Timestamp("1997-01-01"))
          & (o["o_orderdate"] < pd.Timestamp("1997-04-01"))].copy()
    o["max_ship"] = o["o_orderkey"].map(last)
    late = o[o["max_ship"] > o["o_orderdate"]]
    exp = (late.groupby("o_orderpriority").size().rename("order_count")
           .reset_index().sort_values("o_orderpriority")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_q11_important_parts_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_q11_important_parts

    got = (q_q11_important_parts(SF).to_pandas()
           .sort_values("partkey").reset_index(drop=True))
    li = T(SF, "lineitem",
           ["l_partkey", "l_extendedprice", "l_discount"]).to_pandas()
    li["value_fp"] = _rha(
        li["l_extendedprice"].to_numpy()
        * (1.0 - li["l_discount"].to_numpy()) * 100.0).astype(np.int64)
    v = li.groupby("l_partkey", as_index=False)["value_fp"].sum()
    total = int(v["value_fp"].sum())
    exp = (v[v["value_fp"] * (len(v) * 3) > total * 4]
           .rename(columns={"l_partkey": "partkey"})
           .sort_values("partkey").reset_index(drop=True))
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got, exp)


def test_q12_priority_by_returnflag_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, q_q12_priority_by_returnflag)

    got = (q_q12_priority_by_returnflag(SF).to_pandas()
           .sort_values("l_returnflag").reset_index(drop=True))
    li = T(SF, "lineitem",
           ["l_orderkey", "l_returnflag", "l_shipdate"]).to_pandas()
    li = li[(li["l_shipdate"] >= pd.Timestamp("1998-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1999-01-01"))]
    o = T(SF, "orders", ["o_orderkey", "o_orderpriority"]).to_pandas()
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["high_line_count"] = m["o_orderpriority"].isin(
        ["1-URGENT", "2-HIGH"]).astype(np.int64)
    m["low_line_count"] = np.int64(1) - m["high_line_count"]
    exp = (m.groupby("l_returnflag", as_index=False)
           [["high_line_count", "low_line_count"]].sum()
           .sort_values("l_returnflag").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_q20_excess_suppliers_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, q_q20_excess_suppliers)

    got = (q_q20_excess_suppliers(SF).to_pandas()
           .sort_values("s_suppkey").reset_index(drop=True))
    part = T(SF, "part", ["p_partkey", "p_name"]).to_pandas()
    red = set(part[part["p_name"].str.startswith("red")]["p_partkey"])
    li = T(SF, "lineitem",
           ["l_partkey", "l_suppkey", "l_quantity"]).to_pandas()
    li = li[li["l_partkey"].isin(red)].copy()
    li["qty_fp"] = _rha(li["l_quantity"].to_numpy() * 100.0).astype(np.int64)
    v = li.groupby("l_suppkey", as_index=False)["qty_fp"].sum()
    sup = T(SF, "supplier",
            ["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    s = v.merge(sup[sup["s_nationkey"] < 13], left_on="l_suppkey",
                right_on="s_suppkey")
    total, ns = int(s["qty_fp"].sum()), len(s)
    exp = (s[s["qty_fp"] * ns > total]
           [["s_suppkey", "s_name", "qty_fp"]]
           .sort_values("s_suppkey").reset_index(drop=True))
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


def test_embedding_covariance_matches_numpy():
    from fide_crawler_ray.pipelines.relational import (
        T, q_embedding_covariance)

    got = (q_embedding_covariance(SF).to_pandas()
           .sort_values(["i", "j"]).reset_index(drop=True))
    emb = T(SF, "embeddings", ["embedding"]).to_pandas()["embedding"]
    x = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
    q = _rha(x * 1e4).astype(np.int64)
    n = q.shape[0]
    s_ij = q.T @ q
    s_i = q.sum(axis=0)
    iu, ju = np.triu_indices(q.shape[1])
    exp = pd.DataFrame({
        "i": iu + 1, "j": ju + 1,
        "cov_n2_fp": n * s_ij[iu, ju] - s_i[iu] * s_i[ju],
    }).astype(np.int64).sort_values(["i", "j"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # the packed statistic really is n²·covariance: spot-check one cell
    c = np.cov(q[:, 0], q[:, 1], bias=True)[0, 1]
    row = exp[(exp["i"] == 1) & (exp["j"] == 2)]["cov_n2_fp"].iloc[0]
    assert abs(row / (n * n) - c) < 1e-6


def test_weighted_median_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_weighted_median

    got = (q_weighted_median(SF).to_pandas()
           .sort_values("l_returnflag").reset_index(drop=True))
    li = T(SF, "lineitem",
           ["l_returnflag", "l_quantity", "l_extendedprice"]).to_pandas()
    li["v"] = _rha(li["l_quantity"].to_numpy() * 100.0).astype(np.int64)
    li["wt"] = _rha(li["l_extendedprice"].to_numpy() * 100.0
                    ).astype(np.int64)
    out = []
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values("v")
        # expand-by-weight definition: smallest v where cumweight
        # reaches half the total weight
        cw = g["wt"].cumsum().to_numpy()
        out.append({"l_returnflag": flag,
                    "wmedian_fp": int(g["v"].to_numpy()
                                      [np.argmax(2 * cw >= cw[-1])])})
    exp = (pd.DataFrame(out).sort_values("l_returnflag")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_store_time_travel_cuts_match_modulo():
    from fide_crawler_ray.pipelines.relational import (
        T, _round_half_away as rha, q_store_time_travel)

    got = q_store_time_travel(SF)
    o = T(SF, "orders", ["o_orderkey", "o_totalprice"]).to_pandas()
    o["cents"] = rha(o["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    for e in range(3):
        cut = o[o["o_orderkey"] % 3 <= e]
        row = got[got["as_of_epoch"] == e].iloc[0]
        assert row["n_rows"] == len(cut)
        assert row["total_cents"] == int(cut["cents"].sum())
    # monotone growth across epochs (snapshot isolation sanity)
    assert got.sort_values("as_of_epoch")["n_rows"].is_monotonic_increasing


def test_cumulative_users_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_cumulative_users

    got = (q_cumulative_users(SF).to_pandas()
           .sort_values("day").reset_index(drop=True))
    ev = T(SF, "events", ["user_id", "ts"]).to_pandas()
    ev["day"] = (ev["ts"].astype("datetime64[ns]").astype(np.int64)
                 // 86_400_000_000_000)
    first = ev.groupby("user_id")["day"].min()
    exp = (first.value_counts().sort_index().cumsum()
           .rename("cum_users").reset_index()
           .rename(columns={"index": "day"}).astype(np.int64))
    pd.testing.assert_frame_equal(got, exp)
    assert got["cum_users"].iloc[-1] == ev["user_id"].nunique()


def test_max_concurrency_bruteforce():
    """Day-partitioned sweep == a single global sweep, sliced by day."""
    from fide_crawler_ray.pipelines.relational import (
        DAY_NS, T, q_max_concurrency)

    got = (q_max_concurrency(SF).to_pandas()
           .sort_values("day").reset_index(drop=True))
    ts = (T(SF, "events", ["ts"]).to_pandas()["ts"]
          .astype("datetime64[ns]").astype(np.int64).to_numpy())
    dur = 1_800_000_000_000
    exp_rows = {}
    for day in np.unique(np.concatenate([ts // DAY_NS,
                                         (ts + dur) // DAY_NS])):
        lo_d, hi_d = day * DAY_NS, (day + 1) * DAY_NS
        s = np.maximum(ts, lo_d)
        e = np.minimum(ts + dur, hi_d)
        keep = s < e
        if not keep.any():
            continue
        pts = np.concatenate([np.stack([s[keep],
                                        np.ones(keep.sum())], 1),
                              np.stack([e[keep],
                                        -np.ones(keep.sum())], 1)])
        order = np.lexsort((-pts[:, 1], pts[:, 0]))
        exp_rows[int(day)] = int(np.cumsum(pts[order, 1]).max())
    exp = (pd.DataFrame({"day": list(exp_rows), "peak": list(
        exp_rows.values())}).astype(np.int64)
        .sort_values("day").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_pca_top_component_dominates_axes():
    """λ₁ from the returned loading vector must beat every single-axis
    variance, and the loading must be unit-norm (×1e6 quantized)."""
    from fide_crawler_ray.pipelines.relational import (
        q_embedding_covariance, q_pca_top_component)

    got = q_pca_top_component(SF)
    v = got["loading_x1e6"].to_numpy() / 1e6
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    cov = q_embedding_covariance(SF).to_pandas()
    d = int(cov["i"].max())
    m = np.zeros((d, d))
    m[cov["i"] - 1, cov["j"] - 1] = cov["cov_n2_fp"]
    m[cov["j"] - 1, cov["i"] - 1] = cov["cov_n2_fp"]
    rayleigh = float(v @ m @ v) / float(v @ v)
    assert rayleigh >= m.diagonal().max() * (1 - 1e-9)


def test_crawl_politeness_audit_gaps():
    from fide_crawler_ray.pipelines.queries import q_crawl_politeness_audit

    out = q_crawl_politeness_audit(SF)
    assert len(out) >= 1
    assert bool(out["gap_ok"].all())
    assert (out.loc[out["n_fetches"] > 1, "min_gap_us"]
            >= 1_000_000).all()


def test_hll_union_intersect_gate():
    from fide_crawler_ray.pipelines.relational import q_hll_union_intersect

    row = q_hll_union_intersect(SF).iloc[0]
    assert row["exact_union"] >= max(row["exact_a"], row["exact_b"])
    assert row["exact_intersect"] >= 0
    # in-query asserts already bound the sketch error; re-check union
    assert (abs(row["est_union"] - row["exact_union"])
            / max(row["exact_union"], 1)) < 0.025


def test_session_paths_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_session_paths

    got = (q_session_paths(SF).to_pandas().reset_index(drop=True))
    ev = (T(SF, "events", ["user_id", "ts", "event_id", "event_type"])
          .to_pandas().sort_values(["user_id", "ts", "event_id"]))
    counts: dict = {}
    for _, g in ev.groupby("user_id"):
        t = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        sess = np.cumsum(np.concatenate(
            [[0], (np.diff(t) > 1_800_000_000_000).astype(int)]))
        et = g["event_type"].to_numpy()
        for i in range(len(g) - 2):
            if sess[i] == sess[i + 1] == sess[i + 2]:
                k = (et[i], et[i + 1], et[i + 2])
                counts[k] = counts.get(k, 0) + 1
    exp = (pd.DataFrame([{"t1": a, "t2": b, "t3": c, "n": n}
                         for (a, b, c), n in counts.items()])
           .sort_values(["n", "t1", "t2", "t3"],
                        ascending=[False, True, True, True])
           .head(20).reset_index(drop=True))
    exp["n"] = exp["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_cdc_merge_delete_semantics():
    from fide_crawler_ray.pipelines.relational import (
        T, _round_half_away as rha, q_cdc_merge_delete)

    got = (q_cdc_merge_delete(SF).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    o = T(SF, "orders", ["o_orderkey", "o_totalprice"]).to_pandas()
    # deletes win over updates: a key hit by both must be absent
    both = o[(o["o_orderkey"] % 7 == 0) & (o["o_orderkey"] % 11 == 0)]
    assert not got["o_orderkey"].isin(both["o_orderkey"]).any()
    surv = o[o["o_orderkey"] % 11 != 0].copy()
    surv["price_fp"] = (rha(surv["o_totalprice"].to_numpy() * 100)
                        .astype(np.int64)
                        + np.where(surv["o_orderkey"] % 7 == 0,
                                   100_000, 0))
    exp = (surv[["o_orderkey", "price_fp"]]
           .sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_balanced_downsample_equal_classes():
    from fide_crawler_ray.pipelines.relational import (
        T, q_balanced_downsample)

    got = q_balanced_downsample(SF).to_pandas()
    sizes = got.groupby("label").size()
    full = T(SF, "embeddings", ["label"]).to_pandas()["label"]
    assert (sizes == full.value_counts().min()).all()
    assert sizes.index.tolist() == sorted(full.unique().tolist())
    # deterministic: same call twice picks the same rows
    again = q_balanced_downsample(SF).to_pandas()
    a = got.sort_values(["label", "vec_id"]).reset_index(drop=True)
    b = again.sort_values(["label", "vec_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_target_encode_loo_excludes_own_row():
    from fide_crawler_ray.pipelines.relational import (
        T, _round_half_away as rha, q_target_encode_loo)

    got = (q_target_encode_loo(SF).to_pandas()
           .set_index("o_orderkey"))
    o = T(SF, "orders", ["o_orderkey", "o_orderpriority",
                         "o_totalprice"]).to_pandas()
    o["cents"] = rha(o["o_totalprice"].to_numpy() * 100.0
                     ).astype(np.int64)
    g = o.groupby("o_orderpriority")["cents"].agg(["sum", "count"])
    for _, r in o.sample(n=50, random_state=5).iterrows():
        s, n = g.loc[r["o_orderpriority"]]
        exp = int(rha(np.array([1e6 * ((s - r["cents"]) / (n - 1))]))[0])
        assert got.loc[r["o_orderkey"], "loo_enc_fp"] == exp


def test_collapse_runs_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_collapse_runs

    got = (q_collapse_runs(SF).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ev = (T(SF, "events", ["user_id", "ts", "event_id", "event_type"])
          .to_pandas().sort_values(["user_id", "ts", "event_id"]))
    rows = []
    for uid, g in ev.groupby("user_id"):
        et = g["event_type"].to_numpy()
        rows.append({"user_id": uid,
                     "n_events": np.int64(len(g)),
                     "n_runs": np.int64(
                         1 + (et[1:] != et[:-1]).sum())})
    exp = (pd.DataFrame(rows).sort_values("user_id")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    assert (got["n_runs"] <= got["n_events"]).all()


def test_info_gain_bounds():
    """IG must sit in [0, min(H(X), H(Y))] (standard mutual-information
    bound), computed here in floats for the sanity check only."""
    from fide_crawler_ray.pipelines.relational import T, q_info_gain

    row = q_info_gain(SF).iloc[0]
    o = T(SF, "orders", ["o_orderpriority", "o_orderstatus"]).to_pandas()

    def ent(s):
        p = s.value_counts(normalize=True).to_numpy()
        return float(-(p * np.log(p)).sum())

    ig = row["ig_fp"] / 1e6
    assert -1e-6 <= ig <= min(ent(o["o_orderpriority"]),
                              ent(o["o_orderstatus"])) + 1e-6


def test_label_centroids_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, _round_half_away as rha, q_label_centroids)

    got = (q_label_centroids(SF).to_pandas()
           .sort_values(["label", "dim"]).reset_index(drop=True))
    emb = T(SF, "embeddings", ["label", "embedding"]).to_pandas()
    x = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]])
    q = rha(x * 1e4).astype(np.int64)
    rows = []
    for lv, idx in emb.groupby("label").groups.items():
        rowsq = q[emb.index.get_indexer(idx)]
        s = rowsq.sum(axis=0)
        n = rowsq.shape[0]
        for d in range(q.shape[1]):
            rows.append({"label": int(lv), "dim": d + 1,
                         "s_fp": int(s[d]), "n": n,
                         "mean_fp": int(rha(np.array(
                             [1e6 * (s[d] / (1e4 * n))]))[0])})
    exp = (pd.DataFrame(rows).astype(np.int64)
           .sort_values(["label", "dim"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_resume_export_counts_match_source():
    """The in-query asserts already pin the skip-finished semantics
    (survivor mtimes + exact re-written set); here: end state == source."""
    from fide_crawler_ray.pipelines.relational import T, q_resume_export

    got = (q_resume_export(SF).sort_values("month")
           .reset_index(drop=True))
    o = T(SF, "orders", ["o_orderdate"]).to_pandas()
    exp = (o["o_orderdate"].dt.strftime("%Y-%m").value_counts()
           .sort_index().rename("n").reset_index()
           .rename(columns={"index": "month", "o_orderdate": "month"}))
    exp["n"] = exp["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_degree_assortativity_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, q_degree_assortativity)

    got = q_degree_assortativity(SF).iloc[0]
    o = T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    n = T(SF, "customer", ["c_custkey"]).count()
    src = o["o_custkey"].to_numpy()
    dst = (o["o_orderkey"].to_numpy().astype(np.int64) ** 2) % n
    od = pd.Series(src).value_counts()
    idg = pd.Series(dst).value_counts()
    x = od[src].to_numpy().astype(float)
    y = idg[dst].to_numpy().astype(float)
    r = np.corrcoef(x, y)[0, 1]
    assert got["n"] == len(o)
    assert abs(got["assort_fp"] / 1e6 - r) < 1e-4
    assert -1_000_000 <= got["assort_fp"] <= 1_000_000


def test_time_split_embargo_no_leakage():
    from fide_crawler_ray.pipelines.relational import (
        T, q_time_split_embargo)

    got = q_time_split_embargo(SF).set_index("split")
    gap_lo = np.datetime64("2024-01-11").astype(
        "datetime64[ns]").view("int64") // 86_400_000_000_000
    gap_hi = np.datetime64("2024-01-16").astype(
        "datetime64[ns]").view("int64") // 86_400_000_000_000
    assert got.loc["train", "max_day"] < gap_lo
    assert got.loc["test", "min_day"] >= gap_hi
    ev = T(SF, "events", ["ts"]).to_pandas()
    d = (ev["ts"].astype("datetime64[ns]").astype(np.int64)
         // 86_400_000_000_000)
    assert int(got["n_rows"].sum()) == int(
        ((d < gap_lo) | (d >= gap_hi)).sum())


def test_pareto_8020_cut_is_minimal():
    from fide_crawler_ray.pipelines.relational import (
        T, _round_half_away as rha, q_pareto_8020)

    row = q_pareto_8020(SF).to_pandas().iloc[0]
    o = T(SF, "orders", ["o_custkey", "o_totalprice"]).to_pandas()
    o["cents"] = rha(o["o_totalprice"].to_numpy() * 100.0
                     ).astype(np.int64)
    v = (o.groupby("o_custkey")["cents"].sum()
         .sort_values(ascending=False))
    cum = v.cumsum().to_numpy()
    total = int(v.sum())
    assert row["total_cents"] == total
    k = int(row["k_top"])
    assert 5 * cum[k - 1] >= 4 * total          # reaches 80%
    assert k == 1 or 5 * cum[k - 2] < 4 * total  # and is minimal
    assert row["top_cents"] == int(cum[k - 1])


def test_clustering_coefficient_consistent_with_global_triangles():
    """Σ per-node triangle counts == 3 × the global triangle count
    (every triangle touches exactly three nodes), and coefficients
    live in [0, 1]."""
    from fide_crawler_ray.pipelines.relational import (
        q_clustering_coefficient, q_triangle_count)

    got = q_clustering_coefficient(SF).to_pandas()
    tri = q_triangle_count(SF).to_pandas().iloc[0]
    assert int(got["n_tri"].sum()) == 3 * int(tri["n_triangles"])
    assert got["coef_fp"].between(0, 1_000_000).all()
    assert (got["deg"] >= 2).all()


def test_sampled_estimate_interval_covers_sample_rate():
    from fide_crawler_ray.pipelines.relational import (
        T, q_sampled_estimate)

    row = q_sampled_estimate(SF).iloc[0]
    assert 0 < row["n_sampled"] < row["n_total"]
    p = row["n_long_sampled"] / row["n_sampled"]
    assert row["ci_lo_fp"] <= int(round(p * 1e6)) <= row["ci_hi_fp"]
    # the full-corpus truth should land inside the 95% interval here
    # (deterministic data, wide interval at this n)
    docs = T(SF, "documents", ["n_chars"]).to_pandas()
    truth = (docs["n_chars"] >= 300).mean()
    assert row["ci_lo_fp"] / 1e6 - 0.02 <= truth <= \
        row["ci_hi_fp"] / 1e6 + 0.02


def test_containment_join_bruteforce_and_asymmetry():
    from fide_crawler_ray.pipelines.queries import to_df_any
    from fide_crawler_ray.pipelines.relational import (
        _TOKEN, T, q_containment_join)

    got = to_df_any(q_containment_join(SF))
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas()
    sets = {}
    for _, r in docs.iterrows():
        t = _TOKEN.findall(r["text"].lower())
        sets[r["doc_id"]] = {" ".join(t[i:i + 3])
                             for i in range(len(t) - 2)}
    exp = []
    ids = list(sets)
    for a in ids:
        for b in ids:
            if a == b or not sets[a]:
                continue
            inter = len(sets[a] & sets[b])
            if inter * 100 >= 80 * len(sets[a]):
                exp.append((a, b, inter,
                            inter * 1_000_000 // len(sets[a])))
    gotset = set(map(tuple, got[["a", "b", "inter", "containment_fp"]]
                     .itertuples(index=False)))
    assert gotset == set(exp)
    # containment is genuinely asymmetric: at least one pair must NOT
    # have its mirror in the result unless sizes match
    if exp:
        asym = [(a, b) for a, b, *_ in exp
                if (b, a) not in {(x[0], x[1]) for x in exp}]
        sym = [(a, b) for a, b, *_ in exp
               if (b, a) in {(x[0], x[1]) for x in exp}]
        assert len(asym) + len(sym) == len(exp)


def test_cascade_delete_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_cascade_delete

    row = q_cascade_delete(SF).iloc[0]
    cust = T(SF, "customer", ["c_custkey", "c_acctbal"]).to_pandas()
    orders = T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    li = T(SF, "lineitem", ["l_orderkey"]).to_pandas()
    gone = set(cust[cust["c_acctbal"] < 0]["c_custkey"])
    so = orders[~orders["o_custkey"].isin(gone)]
    assert row["n_customers_deleted"] == len(gone)
    assert row["n_orders_surviving"] == len(so)
    assert row["n_lineitems_surviving"] == int(
        li["l_orderkey"].isin(set(so["o_orderkey"])).sum())


def test_semi_anti_join_aggregate_is_quarantined():
    """Ray 2.49's global Dataset.aggregate silently loses all rows when
    planned over a left_semi/left_anti join output (cascade_delete's
    docstring). This canary pins the behavior we code around: if it
    starts passing, the workaround notes can be retired."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from fide_crawler_ray.pipelines.queries import T

    keep = T(SF, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda b: b.filter(pc.less(b["c_acctbal"], 0.0))
        .select(["c_custkey"]),
        batch_format="pyarrow")
    semi = T(SF, "orders", ["o_orderkey", "o_custkey"]).join(
        keep, "left_semi", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",))
    n_count = semi.count()
    n_agg = int(semi.aggregate(Count(alias_name="n"))["n"])
    assert n_count > 0
    # the buggy behavior we avoid: aggregate sees zero rows
    assert n_agg in (0, n_count)
    if n_agg == n_count:
        raise AssertionError(
            "Ray fixed aggregate-over-semi-join; retire the "
            ".count() workaround notes")


def test_rollup_consistency_totals_agree():
    from fide_crawler_ray.pipelines.relational import (
        T, q_rollup_consistency)

    got = q_rollup_consistency(SF)
    assert got["total_cents"].nunique() == 1
    assert got["n_orders"].nunique() == 1
    d = got.set_index("granularity")["n_groups"]
    assert d["day"] >= d["month"] >= d["year"]


def test_weekday_profile_bruteforce():
    from fide_crawler_ray.pipelines.relational import (
        T, _round_half_away as rha, q_weekday_profile)

    got = (q_weekday_profile(SF).to_pandas()
           .sort_values("weekday").reset_index(drop=True))
    o = T(SF, "orders", ["o_orderdate", "o_totalprice"]).to_pandas()
    o["weekday"] = o["o_orderdate"].dt.isocalendar()["day"].astype(
        "int64").to_numpy()
    o["cents"] = rha(o["o_totalprice"].to_numpy() * 100.0
                     ).astype(np.int64)
    g = o.groupby("weekday").agg(
        revenue_fp=("cents", "sum"), n_orders=("cents", "size"))
    exp = g.reset_index()
    exp["avg_cents_fp"] = rha(
        1e4 * (exp["revenue_fp"].to_numpy().astype(float)
               / exp["n_orders"].to_numpy().astype(float))
    ).astype(np.int64)
    exp = exp.astype({"revenue_fp": np.int64, "n_orders": np.int64})
    pd.testing.assert_frame_equal(got, exp)


def test_corpus_card_bruteforce():
    from fide_crawler_ray.pipelines.relational import T, q_corpus_card

    row = q_corpus_card(SF).iloc[0]
    docs = T(SF, "documents", ["text", "lang", "source"]).to_pandas()
    assert row["n_docs"] == len(docs)
    assert row["n_languages"] == docs["lang"].nunique()
    assert row["n_sources"] == docs["source"].nunique()
    import re
    assert row["total_tokens"] == int(
        docs["text"].map(lambda t: len(re.split(r"\s+", t))).sum())
    assert row["total_chars"] == int(docs["text"].str.len().sum())
    p = docs["lang"].value_counts(normalize=True).to_numpy()
    ent = float(-(p * np.log(p)).sum())
    assert abs(row["lang_entropy_fp"] / 1e6 - ent) < 1e-4


def test_median_of_means_bruteforce():
    import hashlib

    from fide_crawler_ray.pipelines.relational import (
        T, _round_half_away as rha, q_median_of_means)

    row = q_median_of_means(SF).iloc[0]
    li = T(SF, "lineitem", ["l_orderkey", "l_extendedprice"]).to_pandas()
    li["bucket"] = li["l_orderkey"].map(
        lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[0], 16)
        % 16)
    li["cents"] = rha(li["l_extendedprice"].to_numpy() * 100.0
                      ).astype(np.int64)
    g = li.groupby("bucket").agg(s=("cents", "sum"),
                                 n=("cents", "size"))
    means = np.sort(rha(
        1e4 * (g["s"].to_numpy().astype(float)
               / (100.0 * g["n"].to_numpy().astype(float)))
    ).astype(np.int64))
    assert row["n_buckets"] == len(means)
    assert row["mom_fp"] == int(means[(len(means) - 1) // 2])
    # robustness sanity: MoM sits inside the bucket-mean envelope
    assert row["min_bucket_mean_fp"] <= row["mom_fp"] \
        <= row["max_bucket_mean_fp"]


def test_fd_discovery_known_dependencies():
    from fide_crawler_ray.pipelines.relational import T, q_fd_discovery

    got = q_fd_discovery(SF).set_index(["lhs", "rhs"])
    # p_partkey is the PK of part → trivially determines p_brand
    assert bool(got.loc[("p_partkey", "p_brand"), "fd_holds"])
    part = T(SF, "part", ["p_brand", "p_type"]).to_pandas()
    expected_bt = (part.groupby("p_brand")["p_type"].nunique() == 1).all()
    assert bool(got.loc[("p_brand", "p_type"), "fd_holds"]) == bool(
        expected_bt)


def test_hill_tail_index_bruteforce():
    import math

    from fide_crawler_ray.pipelines.relational import (
        T, _round_half_away as rha, q_hill_tail_index)

    row = q_hill_tail_index(SF).iloc[0]
    o = T(SF, "orders", ["o_totalprice"]).to_pandas()
    cents = np.sort(rha(o["o_totalprice"].to_numpy() * 100.0
                        ).astype(np.int64))[-201:]
    xk1 = int(cents[0])
    s = sum(int(rha(np.array(
        [(math.log(float(int(v))) - math.log(float(xk1))) * 1e9]))[0])
        for v in cents[1:])
    assert row["xk1_cents"] == xk1
    assert row["hill_fp"] == int(rha(np.array(
        [1e6 * ((s / 1e9) / 200)]))[0])
    assert row["hill_fp"] >= 0


def test_hits_tiers_identical_and_sane():
    """Single-task HITS vs the join-per-iteration distributed plan
    (forced via a zero edge guard) must match bit for bit; L1 mass of
    each vector stays < 2× the 10⁹ scale (the divide-first normalizer
    floors its denominator, so Σ(x_raw // ⌊Σ/S⌋) < S·(k+1)/k ≤ 2S),
    and a node with no in-edges has authority exactly 0 (dually no
    out-edges ⇒ hub 0) — propagation only ever reaches along edges."""
    import numpy as np

    from fide_crawler_ray.pipelines.relational import (
        HITS_SCALE, _pagerank_edges, q_hits_scores)

    # iters=2 for the tier-equality half (iteration-shape-independent);
    # the sanity invariants below run on the default-iters fast tier
    t_fast = (q_hits_scores(SF, iters=2).to_pandas()
              .sort_values("node").reset_index(drop=True))
    t_slow = (q_hits_scores(SF, iters=2, max_single_edges=0).to_pandas()
              .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(t_fast, t_slow)
    fast = (q_hits_scores(SF).to_pandas()
            .sort_values("node").reset_index(drop=True))

    n = len(fast)
    assert fast["hub_fp"].sum() < 2 * HITS_SCALE
    assert fast["auth_fp"].sum() < 2 * HITS_SCALE
    assert (fast["hub_fp"] >= 0).all() and (fast["auth_fp"] >= 0).all()

    e = _pagerank_edges(SF, n).to_pandas()
    idx = fast.set_index("node")
    no_in = set(range(n)) - set(e["dst"])
    no_out = set(range(n)) - set(e["src"])
    assert all(idx.loc[v, "auth_fp"] == 0 for v in no_in)
    assert all(idx.loc[v, "hub_fp"] == 0 for v in no_out)
    # and at least SOME mass survives three rounds of floor division
    assert fast["auth_fp"].sum() > HITS_SCALE // 2


def test_spatial_grid_nn_matches_bruteforce_within_radius():
    """The grid-bucketed argmin must equal the full brute-force nearest
    neighbor for every customer whose true NN lies inside the 3×3 cell
    neighborhood, and every reported pair must actually BE in that
    neighborhood with the exact packed-min tiebreak (min suppkey)."""
    import numpy as np

    from fide_crawler_ray.pipelines.relational import (
        GEO_CELL, GEO_DOMAIN, T, _geo_xy, q_spatial_grid_nn)

    out = q_spatial_grid_nn(SF).to_pandas().set_index("c_custkey")
    ck = T(SF, "customer", ["c_custkey"]).to_pandas()[
        "c_custkey"].to_numpy().astype(np.int64)
    sk = T(SF, "supplier", ["s_suppkey"]).to_pandas()[
        "s_suppkey"].to_numpy().astype(np.int64)
    cx, cy = _geo_xy(ck, 0, 0)
    sx, sy = _geo_xy(sk, 12345, 54321)

    d2 = ((cx[:, None] - sx[None, :]) ** 2
          + (cy[:, None] - sy[None, :]) ** 2)
    near = ((np.abs(cx[:, None] // GEO_CELL - sx[None, :] // GEO_CELL) <= 1)
            & (np.abs(cy[:, None] // GEO_CELL - sy[None, :] // GEO_CELL)
               <= 1))
    for i, c in enumerate(ck):
        cand = np.where(near[i])[0]
        if len(cand) == 0:
            assert c not in out.index
            continue
        dmin = d2[i, cand].min()
        winners = cand[d2[i, cand] == dmin]
        assert out.loc[c, "d2"] == dmin
        assert out.loc[c, "nn_suppkey"] == sk[winners].min()
        # when the GLOBAL argmin is inside the neighborhood the bounded
        # search is exact, not just locally optimal
        if d2[i].min() == dmin:
            assert out.loc[c, "d2"] == d2[i].min()


def _brute_und_graph():
    """Undirected distinct edge set of the derived order graph at SF."""
    import pyarrow.parquet as pq

    n = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]).num_rows
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_custkey"]).to_pandas()
    adj: dict = {}
    for s, d in zip(o["o_custkey"], o["o_orderkey"] % n):
        s, d = int(s), int(d)
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    return n, adj


def test_two_hop_neighbors_bruteforce():
    from fide_crawler_ray.pipelines.relational import q_two_hop_neighbors

    n, adj = _brute_und_graph()
    got = q_two_hop_neighbors(SF).to_pandas().set_index("node")
    assert len(got) == n
    for node in list(adj)[:200]:
        nbrs = adj[node]
        hop2 = set().union(*(adj[w] for w in nbrs)) - nbrs - {node}
        assert got.loc[node, "n1"] == len(nbrs)
        assert got.loc[node, "n2"] == len(hop2)


def test_link_prediction_bruteforce():
    """Engine top-k vs an exhaustive python scorer under the same total
    ordering (ra_fp desc, cn desc, u, v)."""
    from fide_crawler_ray.pipelines.relational import q_link_prediction

    _, adj = _brute_und_graph()
    scores = {}
    for u, nbrs in adj.items():
        for w in nbrs:
            for v in adj[w]:
                if v <= u or v in nbrs:
                    continue
                cn, ra = scores.get((u, v), (0, 0))
                scores[(u, v)] = (cn + 1, ra + 1_000_000_000 // len(adj[w]))
    rows = sorted(
        ((ra, cn, u, v) for (u, v), (cn, ra) in scores.items()),
        key=lambda r: (-r[0], -r[1], r[2], r[3]))[:50]
    got = q_link_prediction(SF, k=50).to_pandas()
    assert len(got) == 50
    for i, (ra, cn, u, v) in enumerate(rows):
        assert (got.loc[i, "u"], got.loc[i, "v"]) == (u, v)
        assert got.loc[i, "ra_fp"] == ra and got.loc[i, "cn"] == cn
        duv = len(adj[u]) + len(adj[v]) - cn
        assert got.loc[i, "jaccard_fp"] == (1_000_000_000 * cn) // duv


def test_link_prediction_tiers_identical():
    """Single-task packed-key tier vs the wedge-join plan (forced via a
    zero edge guard) must agree exactly."""
    from fide_crawler_ray.pipelines.relational import q_link_prediction

    fast = q_link_prediction(SF, k=50).to_pandas().reset_index(drop=True)
    slow = q_link_prediction(SF, k=50, max_single_edges=0) \
        .to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_wl_refinement_brute_force():
    """2-round 1-WL color histogram vs an independent pure-Python
    refinement over the same derived graph at sf0.001."""
    import hashlib
    from collections import Counter, defaultdict

    from fide_crawler_ray.pipelines.relational import q_wl_refinement

    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    n = len(cust)
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderkey"])
    adj = defaultdict(set)
    for s, d in zip(orders["o_custkey"].to_numpy(),
                    (orders["o_orderkey"] % n).to_numpy()):
        if s != d:
            adj[int(s)].add(int(d))
            adj[int(d)].add(int(s))
    col = {v: str(len(nb)) for v, nb in adj.items()}
    for _ in range(2):
        col = {v: hashlib.md5(
            (col[v] + "|" + ",".join(sorted(col[u] for u in adj[v])))
            .encode()).hexdigest() for v in adj}
    exp = Counter(col.values())
    c_iso = "0"
    for _ in range(2):
        c_iso = hashlib.md5((c_iso + "|").encode()).hexdigest()
    if n - len(adj) > 0:
        exp[c_iso] += n - len(adj)
    got = q_wl_refinement(SF).to_pandas()
    assert dict(zip(got["color"], got["n_nodes"])) == dict(exp)
    assert got["n_nodes"].sum() == n


def test_bm25_ranking_properties():
    """BM25 top-k: scores agree with an independent float BM25 on
    ranking (same order), and the integer score is within quantization
    of the float one scaled."""
    import math
    import re
    from collections import Counter

    from fide_crawler_ray.pipelines.relational import (
        BM25_QUERY_TERMS, q_bm25_retrieval)

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9_]+")
    toks = {r.doc_id: tok.findall(r.text.lower())
            for r in docs.itertuples(index=False)}
    n = len(docs)
    t_tok = sum(len(v) for v in toks.values())
    avgdl = t_tok / n
    df = {t: sum(1 for v in toks.values() if t in v)
          for t in BM25_QUERY_TERMS}
    ref = {}
    for d, v in toks.items():
        c = Counter(v)
        s = 0.0
        for t in BM25_QUERY_TERMS:
            f = c.get(t, 0)
            if f:
                idf = (n - df[t] + 0.5) / (df[t] + 0.5)
                s += idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75
                                                 * len(v) / avgdl))
        if s > 0:
            ref[d] = s
    top = sorted(ref, key=lambda d: (-ref[d], d))[:20]
    got = q_bm25_retrieval(SF).to_pandas()
    assert got["doc_id"].tolist() == top
    for r in got.itertuples(index=False):
        assert math.isclose(r.score_fp / 1e6, ref[r.doc_id],
                            rel_tol=5e-3)
        assert r.dl == len(toks[r.doc_id])


def test_grouped_ols_matches_polyfit():
    from fide_crawler_ray.pipelines.relational import (
        OLS_DAY0, q_grouped_ols)

    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderpriority", "o_orderdate",
                                 "o_totalprice"])
    o["x"] = o["o_orderdate"].values.astype("datetime64[D]") \
        .astype(np.int64) - OLS_DAY0
    o["y"] = np.rint(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    got = q_grouped_ols(SF)
    for r in got.itertuples(index=False):
        g = o[o["o_orderpriority"] == r.o_orderpriority]
        slope, intercept = np.polyfit(g["x"], g["y"], 1)
        assert abs(r.slope_fp / 1e6 - slope) < 1e-3 + abs(slope) * 1e-6
        assert abs(r.intercept_fp / 1e6 - intercept) \
            < 1e-2 + abs(intercept) * 1e-6
        assert r.n == len(g)


def test_rrf_customer_fusion_brute_force():
    from fide_crawler_ray.pipelines.relational import q_rrf_customer_fusion

    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    o["cents"] = np.rint(o["o_totalprice"].to_numpy() * 100) \
        .astype(np.int64)
    per = o.groupby("o_custkey").agg(
        cents=("cents", "sum"), f=("cents", "size")).reset_index()
    ra = per.sort_values(["cents", "o_custkey"],
                         ascending=[False, True])
    rank_a = dict(zip(ra["o_custkey"], np.arange(1, len(ra) + 1)))
    rb = per.sort_values(["f", "o_custkey"], ascending=[False, True])
    rank_b = dict(zip(rb["o_custkey"], np.arange(1, len(rb) + 1)))
    score = {c: 10**9 // (60 + rank_a[c]) + 10**9 // (60 + rank_b[c])
             for c in rank_a}
    top = sorted(score, key=lambda c: (-score[c], c))[:20]
    got = q_rrf_customer_fusion(SF).to_pandas()
    assert got["c_custkey"].tolist() == top
    for r in got.itertuples(index=False):
        assert r.rank_rev == rank_a[r.c_custkey]
        assert r.rank_freq == rank_b[r.c_custkey]
        assert r.rrf_fp == score[r.c_custkey]


def test_priority_sample_brute_force():
    import hashlib

    from fide_crawler_ray.pipelines.relational import q_priority_sample

    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"])
    w = np.rint(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    hv = np.array([int(hashlib.md5(str(int(k)).encode())
                       .hexdigest()[:15], 16)
                   for k in o["o_orderkey"]], dtype=np.int64)
    prio = hv // w
    ref = pd.DataFrame({"o_orderkey": o["o_orderkey"], "w_cents": w,
                        "prio": prio}) \
        .sort_values(["prio", "o_orderkey"]).head(100) \
        .reset_index(drop=True)
    got = q_priority_sample(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)
    # heavy rows should be overrepresented: mean weight of the sample
    # exceeds the population mean (weight-proportional inclusion)
    assert got["w_cents"].mean() > w.mean()
