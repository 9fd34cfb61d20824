"""Brute-force references for the streaming/curation operators added in
round 3's closing sessions (ttl_dedup, decayed_counts, temperature_mix).
The DuckDB oracles pin engine↔SQL parity; these tests pin the MATH with
independent row-at-a-time / float-reference recomputations.
"""

import numpy as np
import pandas as pd
import pytest

from fide_crawler_ray.pipelines import relational as R

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def documents():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_ttl_dedup_matches_rowwise_chain(ray_session, events):
    got = set(R.q_ttl_dedup(SF).to_pandas()["event_id"])
    ttl = pd.Timedelta(days=7)
    want = set()
    for _, g in events.groupby(["user_id", "event_type"]):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        last_kept = None
        for _, row in g.iterrows():  # row-at-a-time independent reference
            if last_kept is None or row["ts"] >= last_kept + ttl:
                want.add(row["event_id"])
                last_kept = row["ts"]
    assert got == want


def test_ttl_dedup_first_per_key_always_kept(ray_session, events):
    kept = R.q_ttl_dedup(SF).to_pandas()
    firsts = (events.sort_values(["ts", "event_id"], kind="mergesort")
              .groupby(["user_id", "event_type"]).head(1))
    assert set(firsts["event_id"]).issubset(set(kept["event_id"]))


def test_decayed_counts_matches_float_reference(ray_session, events):
    got = R.q_decayed_counts(SF).to_pandas().set_index("event_type")
    gmax = events["ts"].max().normalize()
    age = (gmax - events["ts"].dt.normalize()).dt.days.to_numpy()
    ref = pd.DataFrame({
        "event_type": events["event_type"],
        "d": np.exp2(-age / 30.0),
    }).groupby("event_type")["d"].agg(["sum", "count"])
    for et, row in ref.iterrows():
        # per-term quantization error is < 0.5 fp units per event
        assert abs(got.loc[et, "decay_fp"] / 1e9 - row["sum"]) \
            <= 0.5e-9 * row["count"] + 1e-9
        assert got.loc[et, "n"] == row["count"]


def test_decayed_counts_monotone_in_age(ray_session, events):
    # every term is in (0, 1]: 0 < decay_fp <= 1e9 * n
    got = R.q_decayed_counts(SF).to_pandas()
    assert (got["decay_fp"] > 0).all()
    assert (got["decay_fp"] <= 10**9 * got["n"]).all()


def test_temperature_mix_matches_float_reference(ray_session, documents):
    got = R.q_temperature_mix(SF).to_pandas().set_index("source")
    n = documents.groupby("source").size()
    w = np.sqrt(n.astype(float))
    p = w / w.sum()
    assert set(got.index) == set(n.index)
    for s in n.index:
        assert got.loc[s, "n_docs"] == n[s]
        assert abs(got.loc[s, "share_ppm"] - 1e6 * p[s]) <= 1.0
    # floor division: shares sum to at most 1e6, within n_sources ulps
    assert 10**6 - len(n) <= got["share_ppm"].sum() <= 10**6


def test_temperature_mix_flattens_distribution(ray_session, documents):
    # temperature scaling upweights small sources: the share ratio between
    # the largest and smallest source shrinks vs the raw count ratio
    got = R.q_temperature_mix(SF).to_pandas()
    n = got["n_docs"].to_numpy().astype(float)
    s = got["share_ppm"].to_numpy().astype(float)
    if n.max() > n.min():
        assert s.max() / s.min() < n.max() / n.min()


def test_salted_join_equals_unsalted_reference(ray_session):
    got = (R.q_salted_join(SF).to_pandas()
           .sort_values("c_mktsegment").reset_index(drop=True))
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.round(j["o_totalprice"] * 100.0).astype(np.int64)
    ref = (j.groupby("c_mktsegment")
           .agg(revenue_c=("cents", "sum"), n_orders=("cents", "size"))
           .reset_index().sort_values("c_mktsegment")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["c_mktsegment", "revenue_c", "n_orders"]], ref)


def test_salted_join_salt_count_invariance(ray_session):
    # the salted plan is salt-count-invariant: S=3 and S=8 agree exactly
    a = (R.q_salted_join(SF, n_salts=3).to_pandas()
         .sort_values("c_mktsegment").reset_index(drop=True))
    b = (R.q_salted_join(SF, n_salts=8).to_pandas()
         .sort_values("c_mktsegment").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_partition_prune_read_matches_reference(ray_session, events):
    got = (R.q_partition_prune_read(SF)
           .sort_values(["event_type", "month"]).reset_index(drop=True))
    df = events[events["event_type"].isin(["click", "purchase"])].copy()
    df["month"] = df["ts"].dt.strftime("%Y-%m")
    ref = (df.groupby(["event_type", "month"]).size().rename("n")
           .reset_index().sort_values(["event_type", "month"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, ref.astype({"n": np.int64}), check_dtype=False)


def test_bootstrap_ci_replicates_bracket_true_mean(ray_session):
    got = R.q_bootstrap_ci(SF).to_pandas()
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    cents = np.round(o["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    true_mean = cents.mean()
    se = cents.std() / np.sqrt(len(cents))
    means = got["mean_fp"].to_numpy() / 1e6
    assert len(got) == 16
    # every replicate mean lands within 6 standard errors of the truth,
    # and the replicate spread is on the order of the standard error
    assert np.all(np.abs(means - true_mean) < 6 * se)
    assert 0.2 * se < means.std(ddof=1) < 5 * se
    # Poisson(1) weights conserve mass in expectation (E[w] = 257/256)
    n = len(cents)
    assert np.all(np.abs(got["n_eff"].to_numpy() - n) < 6 * np.sqrt(n) + 10)
