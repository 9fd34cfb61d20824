"""Brute-force references for the r3 seventh batch (hhi_concentration,
grouped_harmonic, spearman_corr, survival_km, equidepth_histogram).
The DuckDB oracles pin engine↔SQL parity; these tests pin the MATH —
each operator is recomputed here from the raw parquet with an
independent (pandas / numpy / fractions) formulation.
"""

import math
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
def lineitem():
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def test_hhi_matches_bruteforce(ray_session, orders):
    got = R.q_hhi_concentration(SF).iloc[0]
    cust = pd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    p = np.round(orders["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    df = pd.DataFrame({"ck": orders["o_custkey"], "p": p}).merge(
        cust, left_on="ck", right_on="c_custkey")
    s = df.groupby("c_nationkey")["p"].sum()
    tot = int(s.sum())
    ssq = sum(int(v) ** 2 for v in s)
    assert int(got["n_nations"]) == s.size
    assert int(got["hhi_fp"]) == ssq * 10**12 // (tot * tot)
    # HHI of k equal shares is 1/k; concentration can only raise it
    assert int(got["hhi_fp"]) >= 10**12 // s.size


def test_grouped_harmonic_matches_fractions(ray_session, lineitem):
    got = R.q_grouped_harmonic(SF).set_index("l_returnflag")
    x = np.round(lineitem["l_quantity"].to_numpy()).astype(np.int64)
    for f, g in pd.DataFrame(
            {"f": lineitem["l_returnflag"], "x": x}).groupby("f"):
        recip = sum(Fraction(1, int(v)) for v in g["x"])
        harm = Fraction(len(g)) / recip  # exact rational harmonic mean
        want = (harm.numerator * 10**6) // harm.denominator
        assert int(got.loc[f, "harm_fp"]) == want
        assert int(got.loc[f, "n"]) == len(g)
        # harmonic ≤ arithmetic mean (AM–HM), strict under any spread
        assert want <= int(g["x"].mean() * 1e6) + 1


def test_spearman_matches_pandas_rank(ray_session, lineitem):
    got = R.q_spearman_corr(SF).iloc[0]
    x = np.round(lineitem["l_quantity"].to_numpy()).astype(np.int64)
    y = np.round(lineitem["l_discount"].to_numpy() * 100.0).astype(np.int64)
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    rho = np.corrcoef(rx, ry)[0, 1]
    assert int(got["n"]) == len(x)
    assert abs(int(got["rho_fp"]) / 1e9 - rho) < 1e-6
    assert -(10**9) <= int(got["rho_fp"]) <= 10**9


def test_survival_km_matches_bruteforce(ray_session, orders):
    got = R.q_survival_km(SF)
    day = 86_400_000_000
    ts = orders["o_orderdate"].astype("int64")
    gmax = int(ts.max())
    durs, obs = [], []
    for _, g in pd.DataFrame(
            {"ck": orders["o_custkey"], "t": ts}).groupby("ck"):
        t = np.sort(g["t"].to_numpy())
        if len(t) >= 2:
            durs.append((int(t[1]) - int(t[0])) // day)
            obs.append(1)
        else:
            durs.append((gmax - int(t[0])) // day)
            obs.append(0)
    d = pd.DataFrame({"dur": durs, "obs": obs})
    rows = []
    s = 1.0
    n_remaining = len(d)
    for t in sorted(d["dur"].unique()):
        at = d[d["dur"] == t]
        n_risk = int((d["dur"] >= t).sum())
        de = int(at["obs"].sum())
        if de > 0:
            s *= (n_risk - de) / n_risk
            rows.append((t, n_risk, de, s))
    exp = pd.DataFrame(rows, columns=["t_days", "n_risk", "d_events", "s"])
    got = got.sort_values("t_days").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["t_days"].to_numpy() == exp["t_days"].to_numpy()).all()
    assert (got["n_risk"].to_numpy() == exp["n_risk"].to_numpy()).all()
    assert (got["d_events"].to_numpy() == exp["d_events"].to_numpy()).all()
    assert np.allclose(got["surv_fp"].to_numpy() / 1e9, exp["s"], atol=1e-8)
    # survival is a monotone non-increasing step function in (0, 1]
    sv = got["surv_fp"].to_numpy()
    assert (np.diff(sv) <= 0).all() and sv[0] <= 10**9 and sv[-1] >= 0


def test_equidepth_matches_numpy(ray_session, orders):
    got = R.q_equidepth_histogram(SF).sort_values("bucket")
    v = np.sort(np.round(orders["o_totalprice"].to_numpy() * 100.0)
                .astype(np.int64))
    n = len(v)
    for j, rk, b in zip(got["bucket"], got["cum_rank"], got["boundary"]):
        want_rk = math.ceil(j * n / 10.0)
        assert int(rk) == want_rk
        assert int(b) == int(v[want_rk - 1])
    # bucket 10's boundary is the global max; boundaries are monotone
    assert int(got["boundary"].iloc[-1]) == int(v[-1])
    assert (np.diff(got["boundary"].to_numpy()) >= 0).all()


def test_daily_ewma_matches_bruteforce(ray_session, orders):
    got = R.q_daily_ewma(SF).sort_values("d").reset_index(drop=True)
    day = 86_400_000_000
    df = pd.DataFrame({
        "d": orders["o_orderdate"].astype("int64") // day,
        "v": np.round(orders["o_totalprice"].to_numpy() * 100.0)
        .astype(np.int64),
    }).groupby("d")["v"].sum().sort_index()
    assert (got["d"].to_numpy() == df.index.to_numpy()).all()
    assert (got["v"].to_numpy() == df.to_numpy()).all()
    s = None
    for i, v in enumerate(df.to_numpy()):
        s = 1.0 * v if s is None else 0.25 * v + 0.75 * s
        assert abs(int(got["ewma_fp"].iloc[i]) - s * 100.0) <= 0.51
    # EWMA stays inside the running min/max envelope of its inputs
    assert got["ewma_fp"].between(df.min() * 100, df.max() * 100).all()


def test_grouped_boxplot_matches_bruteforce(ray_session, lineitem):
    got = R.q_grouped_boxplot(SF).set_index("l_returnflag")
    x = np.round(lineitem["l_quantity"].to_numpy()).astype(np.int64)
    for f, g in pd.DataFrame(
            {"f": lineitem["l_returnflag"], "x": x}).groupby("f"):
        v = np.sort(g["x"].to_numpy())
        n = len(v)
        q1 = int(v[math.ceil(0.25 * n) - 1])
        med = int(v[math.ceil(0.5 * n) - 1])
        q3 = int(v[math.ceil(0.75 * n) - 1])
        iqr = q3 - q1
        n_out = int(((2 * v < 2 * q1 - 3 * iqr)
                     | (2 * v > 2 * q3 + 3 * iqr)).sum())
        row = got.loc[f]
        assert (int(row["x_min"]), int(row["q1"]), int(row["med"]),
                int(row["q3"]), int(row["x_max"]), int(row["n_outliers"]),
                int(row["n"])) == (int(v[0]), q1, med, q3, int(v[-1]),
                                   n_out, n)


def test_interpolate_daily_matches_bruteforce(ray_session, orders):
    got = R.q_interpolate_daily(SF).sort_values("t").reset_index(drop=True)
    day = 86_400_000_000
    df = pd.DataFrame({
        "d": orders["o_orderdate"].astype("int64") // day,
        "v": np.round(orders["o_totalprice"].to_numpy() * 100.0)
        .astype(np.int64),
    }).groupby("d")["v"].sum().sort_index()
    ds_, vs = df.index.to_numpy(), df.to_numpy()
    assert int(got["t"].iloc[0]) == int(ds_[0])
    assert int(got["t"].iloc[-1]) == int(ds_[-1])
    assert len(got) == int(ds_[-1]) - int(ds_[0]) + 1
    # present days reproduce their value exactly (×1e3)
    present = got.set_index("t").loc[ds_, "v_fp"].to_numpy()
    assert (present == vs * 1000).all()
    # interpolated days sit within [min, max] of their two anchors
    for t, vfp in zip(got["t"], got["v_fp"]):
        i = np.searchsorted(ds_, t)
        if i < len(ds_) and ds_[i] == t:
            continue
        lo = min(vs[i - 1], vs[i]) * 1000
        hi = max(vs[i - 1], vs[i]) * 1000
        assert lo <= int(vfp) <= hi


def test_kendall_tau_matches_bruteforce(ray_session, lineitem):
    got = R.q_kendall_tau(SF).iloc[0]
    x = np.round(lineitem["l_quantity"].to_numpy()).astype(np.int64)
    y = np.round(lineitem["l_discount"].to_numpy() * 100.0).astype(np.int64)
    n = len(x)
    # O(n^2) broadcast concordance count (6k rows at sf0.001)
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    prod = dx * dy
    conc = int((prod > 0).sum()) // 2
    disc = int((prod < 0).sum()) // 2
    assert int(got["n"]) == n
    assert int(got["conc"]) == conc
    assert int(got["disc"]) == disc
    n0 = n * (n - 1) // 2
    n1 = sum(c * (c - 1) // 2 for c in pd.Series(x).value_counts())
    n2 = sum(c * (c - 1) // 2 for c in pd.Series(y).value_counts())
    tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
    assert abs(int(got["tau_fp"]) / 1e9 - tau) < 1e-6


def test_markov_stationary_matches_float_reference(ray_session):
    got = R.q_markov_stationary(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"])
    pairs = []
    for _, g in ev.groupby("user_id"):
        et = g["event_type"].to_numpy()
        pairs += list(zip(et[:-1], et[1:]))
    tc = pd.Series(pairs).value_counts()
    states = sorted(ev["event_type"].unique())
    k = len(states)
    idx = {s: i for i, s in enumerate(states)}
    m = np.zeros((k, k))
    for (a, b), c in tc.items():
        m[idx[a], idx[b]] = c
    m = m / m.sum(axis=1, keepdims=True)
    p = np.full(k, 1.0 / k)
    for _ in range(60):
        p = p @ m
    # fixed-point iterate (12 rounds, floor losses ≤ iters·k states)
    pi = got["pi_fp"].to_numpy() / 1e9
    assert np.allclose(pi, p, atol=5e-3)
    assert 0.98 <= pi.sum() <= 1.0  # floor evaporation only, never gain
    assert set(got.index) == set(states)


def test_tokenizer_fertility_gates(ray_session):
    from fide_crawler_ray.pipelines import textclean as TC

    got = TC.q_tokenizer_fertility(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert set(got["lang"]) == set(docs["lang"])
    assert int(got["n_docs"].sum()) == len(docs)
    assert (got["fertility_fp"] >= 10**6).all()
    # tokens can never outnumber characters+words → cpt strictly > 0
    assert (got["chars_per_token_fp"] > 0).all()


def test_confusion_matrix_consistency(ray_session):
    got = R.q_confusion_matrix(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    n = len(emb)
    # every vector lands in exactly one (truth, pred) cell
    assert int((got["tp"] + got["fn"]).sum()) == n
    assert int((got["tp"] + got["fp"]).sum()) == n
    # truth marginals match label % 3 counts
    tc = (emb["label"] % 3).value_counts()
    for _, r in got.iterrows():
        assert int(r["tp"] + r["fn"]) == int(tc[int(r["class"])])
        p, q = int(r["prec_fp"]), int(r["rec_fp"])
        assert 0 <= p <= 10**6 and 0 <= q <= 10**6
        # F1 is the integer harmonic mean, between min and max of p, r
        if p + q:
            assert min(p, q) <= int(r["f1_fp"]) <= max(p, q)


def test_window_range_sum_matches_bruteforce(ray_session, orders):
    got = R.q_window_range_sum(SF).to_pandas().set_index("o_orderkey")
    day = 86_400_000_000
    df = pd.DataFrame({
        "ok": orders["o_orderkey"],
        "ck": orders["o_custkey"],
        "d": orders["o_orderdate"].astype("int64") // day,
        "v": np.round(orders["o_totalprice"].to_numpy() * 100.0)
        .astype(np.int64),
    })
    assert len(got) == len(df)
    for _, g in df.groupby("ck"):
        d = g["d"].to_numpy()
        v = g["v"].to_numpy()
        for ok, di in zip(g["ok"], d):
            want = int(v[(d >= di - 30) & (d <= di + 30)].sum())
            assert int(got.loc[int(ok), "range_sum"]) == want
    # the own row is always inside its frame → sum ≥ own value
    m = df.set_index("ok")["v"]
    assert (got["range_sum"] >= m.reindex(got.index)).all()


def test_hierarchy_rollup_conservation(ray_session, orders):
    got = R.q_hierarchy_rollup(SF).to_pandas().set_index("node")
    p = np.round(orders["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    per_cust = pd.DataFrame({"ck": orders["o_custkey"], "p": p}) \
        .groupby("ck")["p"].sum()
    total = int(per_cust.sum())
    # the root's subtree is the whole tree
    assert int(got.loc[0, "subtree_rev"]) == total
    assert int(got.loc[0, "n_customers"]) == len(per_cust)
    # every leaf equals its own revenue
    for ck, rev in per_cust.items():
        assert int(got.loc[int(ck), "subtree_rev"]) >= int(rev)
    # level-1 children partition the root (keys 1..9 plus leaf 0)
    lvl1 = [n for n in got.index if 1 <= n <= 9]
    own0 = int(per_cust.get(0, 0))
    assert sum(int(got.loc[n, "subtree_rev"]) for n in lvl1) + own0 == total


def test_table_checksum_order_invariant(ray_session, orders):
    got = R.q_table_checksum(SF).iloc[0]
    import hashlib as H
    day = 86_400_000_000
    acc_sum, acc_xor = 0, 0
    # brute force in REVERSED row order — digest must not care
    for _, r in orders.iloc[::-1].iterrows():
        s = (f"{int(r['o_orderkey'])}|{int(r['o_custkey'])}|"
             f"{r['o_orderstatus']}|"
             f"{int(round(r['o_totalprice'] * 100))}|"
             f"{int(r['o_orderdate'].value // 1000) // day}|"
             f"{r['o_orderpriority']}")
        h = int(H.md5(s.encode()).hexdigest()[:15], 16)
        acc_sum = (acc_sum + h) % (2**63)
        acc_xor ^= h
    assert int(got["checksum_sum"]) == acc_sum
    assert int(got["checksum_xor"]) == acc_xor
    assert int(got["n_rows"]) == len(orders)


def test_running_median_matches_bruteforce(ray_session, orders):
    got = R.q_running_median(SF).sort_values("d").reset_index(drop=True)
    day = 86_400_000_000
    df = pd.DataFrame({
        "d": orders["o_orderdate"].astype("int64") // day,
        "v": np.round(orders["o_totalprice"].to_numpy() * 100.0)
        .astype(np.int64),
    }).groupby("d")["v"].sum().sort_index()
    vs = df.to_numpy()
    for i in range(len(vs)):
        pre = np.sort(vs[:i + 1])
        assert int(got["run_med"].iloc[i]) == int(pre[(i + 2) // 2 - 1])


def test_source_knapsack_optimality(ray_session):
    got = R.q_source_knapsack(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per = docs.assign(val=docs["text"].str.contains("the").astype(int)) \
        .groupby("source").agg(val=("val", "sum"), w=("n_chars", "sum")) \
        .sort_index()
    budget = int(per["w"].sum()) * 60 // 100
    vals = per["val"].to_list()
    ws = per["w"].to_list()
    k = len(per)
    best_v, best_w = -1, None
    for mask in range(1 << k):
        tv = sum(vals[i] for i in range(k) if (mask >> i) & 1)
        tw = sum(ws[i] for i in range(k) if (mask >> i) & 1)
        if tw <= budget and (tv > best_v or (tv == best_v
                                             and tw < best_w)):
            best_v, best_w = tv, tw
    assert int(got["total_val"].iloc[0]) == best_v
    assert int(got["total_w"].iloc[0]) == best_w
    chosen_w = int((got["chosen"] * got["w"]).sum())
    chosen_v = int((got["chosen"] * got["val"]).sum())
    assert (chosen_v, chosen_w) == (best_v, best_w)
    assert chosen_w <= budget


def test_calibration_bins_consistency(ray_session):
    got = R.q_calibration_bins(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    assert int(got["n"].sum()) == len(emb)
    assert (got["bin"] >= 0).all() and (got["bin"] <= 9).all()
    assert (got["correct"] <= got["n"]).all()
    for _, r in got.iterrows():
        assert int(r["acc_fp"]) == int(r["correct"]) * 10**6 // int(r["n"])


def test_seasonal_strength_matches_float_reference(ray_session, orders):
    got = R.q_seasonal_strength(SF).iloc[0]
    day = 86_400_000_000
    df = pd.DataFrame({
        "d": orders["o_orderdate"].astype("int64") // day,
        "v": np.round(orders["o_totalprice"].to_numpy() * 100.0)
        .astype(np.int64),
    }).groupby("d")["v"].sum().reset_index()
    x = df["v"].to_numpy(np.float64)
    w = (df["d"].to_numpy() % 7)
    wmean = pd.Series(x).groupby(w).transform("mean").to_numpy()
    var_tot = ((x - x.mean()) ** 2).sum()
    var_res = ((x - wmean) ** 2).sum()
    want = 1.0 - var_res / var_tot
    assert int(got["n_days"]) == len(x)
    assert abs(int(got["strength_fp"]) / 1e9 - want) < 1e-5
    # residual variance can never exceed total (weekday means minimize)
    assert int(got["strength_fp"]) >= -7  # per-term rounding slack only


def test_reset_cumsum_matches_bruteforce(ray_session):
    got = R.q_reset_cumsum(SF).to_pandas().set_index("event_id")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"])
    for _, g in ev.groupby("user_id"):
        run = 0
        for _, r in g.iterrows():
            v = int(round(r["value"] * 1e6))
            if r["event_type"] == "signup":
                run = v
            else:
                run += v
            assert int(got.loc[int(r["event_id"]), "run_sum"]) == run
