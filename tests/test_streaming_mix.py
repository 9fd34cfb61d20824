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
