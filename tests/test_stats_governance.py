"""Brute-force references for the r3 drift/test/governance operators
(ks_drift, mann_whitney, cusum_changepoint, lag1_autocorr,
apportion_quota, incremental_dedup, edge_reciprocity,
stickiness_dau_mau). The DuckDB oracles pin engine↔SQL parity; these
tests pin the MATH — each operator is recomputed here from the raw
parquet with an independent (row-at-a-time / scipy-free) formulation.
"""

import hashlib

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


def test_ks_drift_matches_bruteforce(ray_session, orders):
    got = R.q_ks_drift(SF).iloc[0]
    df = orders[orders["o_orderstatus"].isin(["F", "O"])]
    v = (np.round(df["o_totalprice"].to_numpy() * 100.0)
         .astype(np.int64) // 100)
    f = df["o_orderstatus"].to_numpy() == "F"
    x1, x2 = np.sort(v[f]), np.sort(v[~f])
    n1, n2 = len(x1), len(x2)
    grid = np.unique(v)
    cum1 = np.searchsorted(x1, grid, side="right")
    cum2 = np.searchsorted(x2, grid, side="right")
    d = np.abs(n2 * cum1 - n1 * cum2).max()
    assert int(got["n1"]) == n1 and int(got["n2"]) == n2
    assert int(got["d_num"]) == int(d)
    # the classic float KS agrees to 1e-9 of the fixed-point value
    ks = d / (n1 * n2)
    assert abs(int(got["ks_fp"]) / 1e9 - ks) < 2e-9


def test_mann_whitney_matches_midrank_bruteforce(ray_session):
    got = R.q_mann_whitney(SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    li = li[li["l_returnflag"].isin(["R", "N"])]
    v = np.round(li["l_quantity"].to_numpy()).astype(np.int64)
    g1 = li["l_returnflag"].to_numpy() == "R"
    pooled = np.concatenate([v[g1], v[~g1]])
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled), np.float64)
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):  # midranks over tie runs
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n1 = int(g1.sum())
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert int(got["u1_x2"]) == int(round(2 * u1))
    assert int(got["u1_x2"]) + int(got["u2_x2"]) == \
        2 * int(got["n1"]) * int(got["n2"])


def test_cusum_and_autocorr_match_bruteforce(ray_session, events):
    day = (events["ts"].astype("datetime64[ns]").astype(np.int64)
           // R.DAY_NS)
    x = day.value_counts().sort_index()
    days, xs = x.index.to_numpy(), x.to_numpy().astype(object)
    n, s = len(xs), int(xs.sum())
    dev = n * np.cumsum(xs) - np.arange(1, n + 1, dtype=object) * s
    got = R.q_cusum_changepoint(SF).iloc[0]
    best = int(np.abs(dev).max())
    assert int(got["max_dev_abs"]) == best
    assert int(got["cp_day"]) == int(days[np.abs(dev).argmax()])
    dv = n * xs - s
    num = int((dv[:-1] * dv[1:]).sum())
    den = int((dv * dv).sum())
    ac = R.q_lag1_autocorr(SF).iloc[0]
    assert (int(ac["num"]), int(ac["den"])) == (num, den)
    assert abs(int(ac["acf_fp"]) / 1e9 - num / den) < 2e-9


def test_apportion_quota_exhausts_total(ray_session):
    out = R.q_apportion_quota(SF)
    assert int(out["quota"].sum()) == 1000
    # proportionality sandwich: every quota within 1 of the exact share
    w = out["n_docs"].to_numpy().astype(object) ** 2
    exact = 1000 * w / w.sum()
    assert (np.abs(out["quota"].to_numpy() - exact) <= 1.0).all()


def test_incremental_dedup_matches_pandas(ray_session):
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    cutoff = int(docs["doc_id"].max()) * 4 // 5
    fp = docs["text"].str[:16].map(
        lambda t: hashlib.md5(t.encode()).hexdigest())
    store = set(fp[docs["doc_id"] < cutoff])
    batch = docs[docs["doc_id"] >= cutoff].assign(h=fp)
    keep = (batch.groupby("h")["doc_id"].min()
            .loc[lambda s: ~s.index.isin(store)].sort_values())
    got = R.q_incremental_dedup(SF).to_pandas()["doc_id"].sort_values()
    assert list(got) == list(keep)
    assert len(got) < (docs["doc_id"] >= cutoff).sum()  # dropped some


def test_edge_reciprocity_matches_bruteforce(ray_session, events):
    ids = events["event_id"].to_numpy()
    s, d = ids % 151, (ids * ids) % 151
    e = set(zip(s[s != d].tolist(), d[s != d].tolist()))
    nr = sum((b, a) in e for a, b in e)
    got = R.q_edge_reciprocity(SF).iloc[0]
    assert int(got["m_edges"]) == len(e)
    assert int(got["n_reciprocated"]) == nr


def test_stickiness_bounds(ray_session, events):
    out = R.q_stickiness_dau_mau(SF)
    assert len(out) == 1  # synth events span a single calendar month
    r = out.iloc[0]
    sdau, ndays, mau = int(r["sdau"]), int(r["ndays"]), int(r["mau"])
    assert mau <= sdau <= ndays * mau
    assert 0 < int(r["stickiness_fp"]) <= 1_000_000


def test_dq_violations_total_checked_consistent(ray_session):
    out = R.q_dq_violations(SF).to_pandas()
    li_rows = len(pd.read_parquet(f"{SF}/lineitem.parquet",
                                  columns=["l_orderkey"]))
    assert (out["n_checked"] == li_rows).all()
    assert len(out) == 5
    # known-by-construction outcomes on TPC-H-ish data
    byrule = out.set_index("rule")["n_violations"]
    assert byrule["qty_out_of_range"] == 0
    assert byrule["bad_returnflag"] == 0
    assert byrule["discount_gt_tax"] > 0


def test_anova_f_matches_float_reference(ray_session):
    got = R.q_anova_f(SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    x = np.round(li["l_quantity"].to_numpy())
    g = li["l_returnflag"].to_numpy()
    groups = [x[g == f] for f in np.unique(g)]
    k, n = len(groups), len(x)
    gm = x.mean()
    ssb = sum(len(gi) * (gi.mean() - gm) ** 2 for gi in groups)
    ssw = sum(((gi - gi.mean()) ** 2).sum() for gi in groups)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert int(got["k_groups"]) == k and int(got["n_total"]) == n
    assert abs(int(got["ssb_fp"]) / 1e6 - ssb) < 1e-2
    assert abs(int(got["f_fp"]) / 1e6 - f_ref) < 1e-3


def test_pava_pools_exactly():
    # decreasing means -> one global pool
    out = R._pava([1, 1, 1], [30, 20, 10])
    assert out == [[60, 3]]
    # already monotone -> untouched
    out = R._pava([2, 1, 3], [2, 4, 30])
    assert out == [[2, 2], [4, 1], [30, 3]]
    # single violation (1, 5, 3) pools only the trailing pair -> mean 4
    out = R._pava([1, 1, 1], [1, 5, 3])
    assert out == [[1, 1], [8, 2]]


def test_isotonic_fit_monotone_and_conservative(ray_session):
    out = R.q_isotonic_fit(SF)
    f = out["fitted_mean_fp"].to_numpy()
    assert (np.diff(f) >= 0).all()
    assert len(out) == out["lvl"].nunique()


def test_set_cover_greedy_matches_bruteforce(ray_session):
    got = R.q_set_cover_sources(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    sets = {}
    for s, t in zip(docs["source"], docs["text"]):
        sets.setdefault(s, set()).update(R._TOKEN.findall(t.lower()))
    covered, picks = set(), []
    for _ in range(5):
        src = min(sets, key=lambda s: (-len(sets[s] - covered), s))
        picks.append((src, len(sets[src] - covered)))
        covered |= sets.pop(src)
    assert list(got["source"]) == [p[0] for p in picks]
    assert list(got["marginal_new_terms"]) == [p[1] for p in picks]
    assert int(got["covered_terms"].iloc[-1]) == len(covered)


def test_trending_terms_conserves_counts(ray_session):
    out = R.q_trending_terms(SF).to_pandas()
    assert len(out) == 20
    assert (out["delta"] == out["c_late"] - out["c_early"]).all()
    assert (out["delta"].to_numpy()[:-1] >= out["delta"].to_numpy()[1:]).all()


def test_compression_ratio_batch_invariant(ray_session):
    import zlib
    out = R.q_compression_ratio(SF).sort_values("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    raw = docs.groupby("source")["text"].apply(
        lambda s: sum(len(t.encode()) for t in s))
    comp = docs.groupby("source")["text"].apply(
        lambda s: sum(len(zlib.compress(t.encode(), 6)) for t in s))
    assert list(out["raw_bytes"]) == list(raw.sort_index())
    assert list(out["comp_bytes"]) == list(comp.sort_index())
