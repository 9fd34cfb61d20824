"""Analytics over a crawled store (vs pandas-computed expectations) and
the media pipeline plumbing."""

import numpy as np
import pandas as pd
import pytest

from fide_crawler_ray import refsem, synth
from fide_crawler_ray.pipelines import analytics as AN
from fide_crawler_ray.pipelines import crawl as C
from fide_crawler_ray.stages import media as M

CFG = synth.SiteConfig(seed=42, n_players=6, n_queries=2, n_months=6)


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("an"))
    res = C.run_crawl(CFG, out, n_shards=2)
    return res


def _pdf(store):
    return store.game_history().drop_columns(["lineage"]).to_pandas()


def test_player_summary(store):
    gh = store.game_history()
    df = _pdf(store)
    out = AN.player_summary(gh)
    assert out["n_games"].iloc[0] == len(df)
    assert out["first_date"].iloc[0] == df["date"].min()
    assert out["last_date"].iloc[0] == df["date"].max()
    assert out["avg_opponent_rating"].iloc[0] == round(df["opponent_rating"].mean(), 4)


def test_tournament_summary_and_topk(store):
    gh = store.game_history()
    df = _pdf(store)
    out = AN.tournament_summary(gh).to_pandas()
    exp = df.groupby(["tournament_name", "date"]).agg(
        points=("result", "sum"), n_games=("result", "count"),
        avg=("opponent_rating", "mean"),
    ).reset_index()
    assert len(out) == len(exp)
    merged = out.merge(exp, on=["tournament_name", "date"])
    assert (merged["points_x"] == merged["points_y"]).all()
    assert (merged["avg_opponent_rating"] == merged["avg"].round().astype("int64")).all()
    top = AN.recent_tournaments(gh, 3).to_pandas()
    assert len(top) == 3
    assert list(top["date"]) == sorted(out["date"], reverse=True)[:3]


def test_result_color_counts_and_means(store):
    gh = store.game_history()
    df = _pdf(store)
    counts = AN.result_color_counts(gh)
    total = counts.drop(columns=["player_color"]).to_numpy().sum()
    assert total == len(df)
    means = AN.conditional_mean_ratings(gh)
    overall = means[means["player_color"] == "all"]["avg_opp"].iloc[0]
    assert overall == round(df["opponent_rating"].mean(), 4)


def test_result_distribution_and_filters(store):
    gh = store.game_history()
    df = _pdf(store)
    dist = AN.result_distribution(gh)
    assert abs(dist["pct"].sum() - 1.0) < 1e-6
    wins = AN.result_isin_filter(gh, [1.0]).count()
    assert wins == (df["result"] == 1.0).sum()
    some = AN.opponent_name_filter(gh, "opponent 1").count()
    assert some == df["opponent_name"].str.contains("opponent 1", case=False).sum()
    uniq = AN.unique_opponents(gh).to_pandas()
    assert list(uniq["opponent_name"]) == sorted(df["opponent_name"].unique())


def test_tournament_rollup_performance(store):
    gh = store.game_history()
    df = _pdf(store)
    roll = AN.tournament_rollup(gh)
    key = ["fide_id", "tournament_name", "date"]
    exp = df.groupby(key).agg(
        n_games=("result", "count"), points=("result", "sum"),
        rating_sum=("opponent_rating", "sum"),
        wins=("result", lambda s: (s == 1.0).sum()),
        losses=("result", lambda s: (s == 0.0).sum()),
    ).reset_index()
    m = roll.merge(exp, on=key, suffixes=("", "_e"))
    assert len(m) == len(exp)
    assert (m["n_games"] == m["n_games_e"]).all()
    assert (m["wins"] == m["wins_e"]).all()
    # spot-check performance against the scalar reference for closed form
    big = m[(m["n_games"] < 8) | (m["n_games"] > 11)]
    for _, r in big.head(10).iterrows():
        expect = round((r["rating_sum"] + 400 * (r["wins"] - r["losses"])) / r["n_games"])
        assert r["performance"] == expect


def test_media_pipeline_plumbing(store):
    players = store.players()
    out = M.media_pipeline(players).to_pandas()
    assert len(out) == players.count()
    assert out["media_mime"].eq("image/jpeg").all()
    assert out["media_len"].gt(0).all()
    assert out["width"].between(64, 255).all()
    assert out["media_embedding"].map(len).eq(M.MediaFeatureStub.DIM).all()
    # deterministic: same payload → same fake dims
    out2 = M.media_pipeline(players).to_pandas()
    a = out.sort_values("fide_id")[["width", "height"]].reset_index(drop=True)
    b = out2.sort_values("fide_id")[["width", "height"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_media_handles_bad_refs():
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({
        "fide_id": ["1", "2", "3"],
        "profile_photo": ["data:image/png;base64,@@notbase64@@",
                          "https://example.com/x.jpg", ""],
    })
    out = M.media_pipeline(rd.from_arrow(t)).to_pandas()
    assert out["media_payload"].isna().all() or out["media_len"].isna().any()
    assert out["width"].isna().all()
