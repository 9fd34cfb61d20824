"""Brute-force references for t_closeness and theil_sen. The DuckDB
oracles pin engine↔SQL parity; these recompute the MATH independently
(Fraction-exact TVD; Fraction-exact pairwise slopes) from raw parquet.
"""

from fractions import Fraction

import numpy as np
import pandas as pd
import pytest

from fide_crawler_ray.pipelines import relational as R

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_t_closeness_matches_fraction_tvd(ray_session, orders):
    got = R.q_t_closeness(SF).set_index(["o_orderpriority", "omonth"])
    df = pd.DataFrame({
        "pri": orders["o_orderpriority"],
        "omonth": orders["o_orderdate"].dt.year * 100
        + orders["o_orderdate"].dt.month,
        "s": orders["o_orderstatus"],
    })
    n_total = len(df)
    glob = df["s"].value_counts()
    for (pri, om), grp in df.groupby(["pri", "omonth"]):
        cnt = grp["s"].value_counts()
        # exact total-variation distance over the full domain
        tvd = sum(
            abs(Fraction(int(cnt.get(s, 0)), len(grp))
                - Fraction(int(glob[s]), n_total))
            for s in glob.index) / 2
        row = got.loc[(pri, om)]
        assert int(row["n_rows"]) == len(grp)
        assert int(row["tvd_fp"]) == int(tvd * 1_000_000)  # floor
        assert bool(row["breach"]) == (int(tvd * 1_000_000) > 200_000)
    assert len(got) == df.groupby(["pri", "omonth"]).ngroups


def test_t_closeness_bounds(ray_session):
    got = R.q_t_closeness(SF)
    assert ((got["tvd_fp"] >= 0) & (got["tvd_fp"] <= 1_000_000)).all()
    # mass conservation: group sizes sum to the table size
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    assert int(got["n_rows"].sum()) == len(orders)


def test_theil_sen_matches_fraction_median(ray_session, events):
    got = R.q_theil_sen(SF).to_pandas().set_index("user_id")
    df = pd.DataFrame({
        "u": events["user_id"],
        "day": events["ts"].values.astype("datetime64[D]")
        .astype(np.int64),
        "y": np.round(events["value"].to_numpy() * 100.0)
        .astype(np.int64),
    })
    seen = 0
    for u, grp in df.groupby("u"):
        day = grp["day"].to_numpy()
        y = grp["y"].to_numpy()
        slopes = []
        for a in range(len(day)):
            for b in range(len(day)):
                if day[b] > day[a]:
                    # exact floor of the ×1e6 slope fraction
                    num = (int(y[b]) - int(y[a])) * 1_000_000
                    dx = int(day[b]) - int(day[a])
                    slopes.append(num // dx)
        if not slopes:
            assert u not in got.index
            continue
        seen += 1
        slopes.sort()
        k = (len(slopes) + 1) // 2
        row = got.loc[u]
        assert int(row["n_pairs"]) == len(slopes)
        assert int(row["slope_fp"]) == slopes[k - 1]
    assert seen == len(got)


def test_forecast_mase_matches_bruteforce(ray_session, orders):
    got = R.q_forecast_mase(SF).iloc[0]
    cents = np.round(orders["o_totalprice"].to_numpy() * 100.0) \
        .astype(np.int64)
    day = orders["o_orderdate"].values.astype("datetime64[D]") \
        .astype(np.int64)
    lo, hi = int(day.min()), int(day.max())
    y = np.zeros(hi - lo + 1, np.int64)
    np.add.at(y, day - lo, cents)
    n = len(y)
    err7 = int(np.abs(y[7:] - y[:-7]).sum())
    err1 = int(np.abs(y[1:] - y[:-1]).sum())
    assert int(got["n_days"]) == n
    assert int(got["err_m_sum"]) == err7
    assert int(got["err_1_sum"]) == err1
    assert int(got["mase_fp"]) == 1_000_000 * err7 * (n - 1) \
        // (err1 * (n - 7))


def test_attribution_credit_conservation(ray_session, events):
    got = R.q_attribution_position(SF).to_pandas()
    # every converter with >=1 prior touch distributes exactly 1e6 ppm
    conv = events[events["event_type"] == "purchase"] \
        .groupby("user_id")["ts"].min()
    ev = events.merge(conv.rename("cts"), on="user_id")
    touch = ev[(ev["event_type"] != "purchase") & (ev["ts"] < ev["cts"])]
    n_credited = touch["user_id"].nunique()
    assert int(got["credit_ppm"].sum()) == n_credited * 1_000_000
    assert (got["credit_ppm"] > 0).all()


def test_attribution_matches_bruteforce(ray_session, events):
    got = R.q_attribution_position(SF).to_pandas() \
        .set_index("event_type")["credit_ppm"]
    conv = events[events["event_type"] == "purchase"] \
        .groupby("user_id")["ts"].min()
    expect: dict = {}
    for u, cts in conv.items():
        t = events[(events["user_id"] == u)
                   & (events["event_type"] != "purchase")
                   & (events["ts"] < cts)] \
            .sort_values(["ts", "event_id"])
        k = len(t)
        if k == 0:
            continue
        for i, et in enumerate(t["event_type"]):
            if k == 1:
                c = 1_000_000
            elif k == 2:
                c = 500_000
            elif i == 0 or i == k - 1:
                c = 400_000
            else:
                c = 200_000 // (k - 2) + (1 if i - 1 < 200_000 % (k - 2)
                                          else 0)
            expect[et] = expect.get(et, 0) + c
    assert dict(got.astype(int)) == expect


def test_frequent_itemsets_tiers_identical(ray_session):
    fast = R.q_frequent_itemsets(SF).to_pandas() \
        .sort_values(["item_a", "item_b"]).reset_index(drop=True)
    slow = R.q_frequent_itemsets(SF, max_broadcast_parts=0).to_pandas() \
        .sort_values(["item_a", "item_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_rendezvous_matches_bruteforce(ray_session):
    import hashlib
    got = R.q_rendezvous_shards(SF)
    cust = pd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey"])
    n_b = [0] * 9
    n_a = [0] * 9
    moved = [0] * 9
    for k in cust["c_custkey"]:
        w = [int(hashlib.md5(f"{k}:{s}".encode()).hexdigest()[:15], 16)
             for s in range(9)]
        a8 = max(range(8), key=lambda s: (w[s], -s))
        a9 = max(range(9), key=lambda s: (w[s], -s))
        n_b[a8] += 1
        n_a[a9] += 1
        if a8 != a9:
            moved[a9] += 1
    assert got["n_before"].tolist() == n_b
    assert got["n_after"].tolist() == n_a
    assert got["moved_in"].tolist() == moved
    # growth moved roughly 1/9 of keys (binomial tolerance)
    frac = sum(moved) / len(cust)
    assert 0.02 < frac < 0.25


def test_clamped_balance_matches_sequential(ray_session, events):
    got = R.q_clamped_balance(SF).to_pandas().set_index("user_id")
    for u, g in events.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cents = np.round(g["value"].to_numpy() * 100.0).astype(np.int64)
        d = np.where(g["event_type"].to_numpy() == "purchase",
                     -cents, cents)
        bal, n_clamp, mx = 0, 0, 0
        for x in d:
            if bal + int(x) < 0:
                bal, n_clamp = 0, n_clamp + 1
            else:
                bal += int(x)
            mx = max(mx, bal)
        row = got.loc[u]
        assert int(row["final_fp"]) == bal, u
        assert int(row["n_clamped"]) == n_clamp, u
        assert int(row["max_fp"]) == mx, u


def test_longest_streak_matches_bruteforce(ray_session, events):
    got = R.q_longest_streak(SF).to_pandas().set_index("user_id")
    days = pd.DataFrame({
        "u": events["user_id"],
        "d": events["ts"].values.astype("datetime64[D]")
        .astype(np.int64)}).drop_duplicates()
    for u, g in days.groupby("u"):
        ds_ = sorted(g["d"])
        best = cur = 1
        for a, b in zip(ds_, ds_[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        assert int(got.loc[u]["longest"]) == best
        assert int(got.loc[u]["n_active_days"]) == len(ds_)


def test_lpt_plan_beats_naive_hash_on_skew(ray_session):
    got = R.q_lpt_partition_plan(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey"])
    hist = li.groupby("l_partkey").size()
    total = int(hist.sum())
    assert int(got["load"].sum()) == total
    assert int(got["n_keys"].sum()) == hist.size
    lb = max(-(-total // 16), int(hist.max()))
    assert int(got["lb_opt"].iloc[0]) == lb
    assert int(got["load"].max()) * 3 <= 4 * lb
    # LPT's makespan is never worse than modulo-hash partitioning's
    naive = hist.groupby(hist.index % 16).sum().max()
    assert int(got["load"].max()) <= int(naive)


def test_span_reflow_matches_bruteforce(ray_session):
    from fide_crawler_ray.pipelines import queries as Q
    from fide_crawler_ray.sources import store
    got = Q.q_span_reflow(SF).set_index("doc_kind")
    out = Q._crawl_store("fixed")
    docs = store.read_all(
        out, "docs", columns=["doc_id", "doc_kind", "spans"]).to_pandas()
    exp: dict = {}
    for _, row in docs.iterrows():
        spans = row["spans"]
        after = 0
        prev = None
        for s in spans:
            k = s["kind"]
            if not (k == prev and k != "media"):
                after += 1
            prev = k
        e = exp.setdefault(row["doc_kind"],
                           {"n_docs": 0, "spans_before": 0,
                            "spans_after": 0, "media_spans": 0})
        e["n_docs"] += 1
        e["spans_before"] += len(spans)
        e["spans_after"] += after
        e["media_spans"] += sum(s["kind"] == "media" for s in spans)
    for k, e in exp.items():
        row = got.loc[k]
        for col, v in e.items():
            assert int(row[col]) == v, (k, col, int(row[col]), v)


def test_holdout_leakage_matches_bruteforce(ray_session):
    import hashlib
    got = R.q_holdout_leakage(SF).iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    seen: dict = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        b = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16) % 10
        split = "train" if b < 8 else ("val" if b == 8 else "test")
        seen.setdefault(hashlib.md5((txt or "").encode()).hexdigest(),
                        set()).add(split)
    ks = [len(v) for v in seen.values()]
    assert int(got["n_texts"]) == len(ks)
    assert int(got["n_leaky_texts"]) == sum(k >= 2 for k in ks)
    assert int(got["n_leaked_pairs"]) == sum(k * (k - 1) // 2 for k in ks)
    # at sf0.001 every planted dup lands inside one split (verified by
    # the brute force above); sf0.1 is where dups straddle the split
    # boundary, so the positive-signal check runs there
    got01 = R.q_holdout_leakage("/root/testdata/sf0.1").iloc[0]
    assert int(got01["n_leaky_texts"]) > 0


def test_scd2_intervals_tile_and_match(ray_session, events):
    got = R.q_scd2_build(SF).to_pandas()
    for u, g in got.groupby("user_id"):
        g = g.sort_values("valid_from_us")
        # intervals tile: each valid_to equals the next valid_from,
        # exactly one open current interval per user
        assert (g["valid_to_us"].to_numpy()[:-1]
                == g["valid_from_us"].to_numpy()[1:]).all()
        assert int(g["is_current"].sum()) == 1
        assert bool(g["is_current"].iloc[-1])
        # adjacent intervals always change value
        v = g["value_fp"].to_numpy()
        assert (v[1:] != v[:-1]).all()
    # row-level reference for one user
    ev = events.sort_values(["ts", "event_id"])
    u0 = int(ev["user_id"].iloc[0])
    g = ev[ev["user_id"] == u0]
    cents = np.round(g["value"].to_numpy() * 100.0).astype(np.int64)
    kept = [i for i in range(len(cents))
            if i == 0 or cents[i] != cents[i - 1]]
    assert len(got[got["user_id"] == u0]) == len(kept)


def test_pit_join_matches_bruteforce(ray_session, events):
    got = R.q_pit_feature_join(SF).to_pandas().set_index("event_id")
    views = events[events["event_type"] == "view"]
    buys = events[events["event_type"] == "purchase"]
    assert len(got) == len(buys)
    for _, f in buys.iterrows():
        vs = views[(views["user_id"] == f["user_id"])
                   & (views["ts"] <= f["ts"])] \
            .sort_values(["ts", "event_id"])
        exp = (int(np.round(vs["value"].iloc[-1] * 100.0))
               if len(vs) else -1)
        row = got.loc[int(f["event_id"])]
        assert int(row["feature_fp"]) == exp
        assert int(row["purchase_fp"]) == int(np.round(f["value"] * 100))


def test_ams_f2_gate_and_exact_side(ray_session):
    got = R.q_ams_f2(SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey"])
    f2 = int((li.groupby("l_partkey").size().astype(object) ** 2).sum())
    assert int(got["f2_exact"]) == f2
    assert int(got["rel_err_ppm"]) <= 500_000
    assert int(got["f2_est"]) > 0


def test_roc_auc_matches_sklearn_free_bruteforce(ray_session):
    got = R.q_roc_auc(SF).iloc[0]
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy())
    j = np.arange(m.shape[1])
    w1 = ((j * 31 + 17) % 7 - 3).astype(np.int64)
    efp = np.round(m.astype(np.float64) * 1e6).astype(np.int64)
    score = (efp @ w1) // 1_000_000  # quantized buckets
    y = emb["label"].to_numpy().astype(np.int64) % 2
    # exact midrank Mann-Whitney AUC over the bucketed scores
    order = np.argsort(score, kind="mergesort")
    s, yy = score[order], y[order]
    ranks = np.empty(len(s), dtype=np.float64)
    i = 0
    while i < len(s):
        k = i
        while k < len(s) and s[k] == s[i]:
            k += 1
        ranks[i:k] = (i + 1 + k) / 2.0
        i = k
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    u = ranks[yy == 1].sum() - n_pos * (n_pos + 1) / 2.0
    auc = u / (n_pos * n_neg)
    assert int(got["n_pos"]) == n_pos
    assert int(got["n_neg"]) == n_neg
    assert abs(int(got["auc_fp"]) - auc * 1e6) <= 1  # floor vs float


def test_interval_scheduling_greedy_is_optimal(ray_session, events):
    got = R.q_interval_scheduling(SF).to_pandas().set_index("user_id")
    for u, g in events.groupby("user_id"):
        st = (g["ts"].values.astype("datetime64[us]").astype(np.int64))
        dur = np.round(g["value"].to_numpy() * 1e6).astype(np.int64)
        en = st + dur
        order = np.lexsort((g["event_id"].to_numpy(), en))
        st, en = st[order], en[order]
        # DP over end-sorted intervals: opt[i] = max non-overlap count
        # among the first i intervals (weighted-interval DP, weight 1)
        opt = [0] * (len(st) + 1)
        for i in range(1, len(st) + 1):
            j = int(np.searchsorted(en[:i - 1], st[i - 1],
                                    side="right"))
            opt[i] = max(opt[i - 1], opt[j] + 1)
        assert int(got.loc[u]["n_scheduled"]) == opt[len(st)], u


def test_fair_share_maxmin_properties(ray_session):
    got = R.q_fair_share_alloc(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source"])
    cap = len(docs) // 2
    assert int(got["alloc"].sum()) == cap
    assert (got["alloc"] <= got["demand"]).all()
    # max-min fairness: every saturated demand is <= every unsaturated
    # allocation + 1 (no one starves while another feasibly gets more)
    sat = got[got["saturated"]]
    unsat = got[~got["saturated"]]
    if len(sat) and len(unsat):
        assert int(sat["demand"].max()) <= int(unsat["alloc"].min()) + 1
    # unsaturated allocations differ by at most 1 (common water level)
    if len(unsat):
        assert int(unsat["alloc"].max()) - int(unsat["alloc"].min()) <= 1


def test_voptimal_dp_matches_exhaustive(ray_session):
    from itertools import combinations
    got = R.q_voptimal_histogram(SF, n_buckets=4)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["n_chars"])
    h = (docs["n_chars"] // 10).value_counts().sort_index()
    x = h.index.to_numpy(np.int64)
    w = h.to_numpy(np.int64)
    n = len(x)
    pw = np.r_[0, np.cumsum(w)]
    pwx = np.r_[0, np.cumsum(w * x)]
    pwx2 = np.r_[0, np.cumsum(w * x * x)]

    def cost(i, j):
        sw = int(pw[j] - pw[i])
        sx = int(pwx[j] - pwx[i])
        return int(pwx2[j] - pwx2[i]) - sx * sx // sw

    best = None
    for cuts in combinations(range(1, n), 3):  # 4 buckets
        edges = [0, *cuts, n]
        tot = sum(cost(edges[k], edges[k + 1]) for k in range(4))
        if best is None or tot < best:
            best = tot
    assert int(got["sse_fp"].sum()) == best
    assert len(got) == 4


def test_lttb_bucket_and_extreme_properties(ray_session, orders):
    got = R.q_lttb_downsample(SF, n_out=30)
    cents = np.round(orders["o_totalprice"].to_numpy() * 100.0) \
        .astype(np.int64)
    day = orders["o_orderdate"].values.astype("datetime64[D]") \
        .astype(np.int64)
    s = pd.DataFrame({"d": day, "v": cents}).groupby("d")["v"].sum()
    x = s.index.to_numpy(np.int64)
    y = s.to_numpy(np.int64)
    assert len(got) == 30
    assert int(got["d"].iloc[0]) == int(x[0])
    assert int(got["d"].iloc[-1]) == int(x[-1])
    assert (np.diff(got["d"].to_numpy()) > 0).all()
    # every kept (d, v) is a real point of the series
    lut = dict(zip(x.tolist(), y.tolist()))
    for d, v in zip(got["d"], got["v"]):
        assert lut[int(d)] == int(v)
    # the global maximum is visually load-bearing; LTTB must keep it
    assert int(y.max()) in set(got["v"].astype(int))
