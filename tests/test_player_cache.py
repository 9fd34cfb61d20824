"""ST2 player-store cache: profiles already in the store are never
refetched (legacy monolith semantic, en-US:211-231)."""

from fide_crawler_ray import synth
from fide_crawler_ray.pipelines import crawl as C
from fide_crawler_ray.sources import store

CFG = synth.SiteConfig(seed=42, n_players=6, n_queries=2, n_months=4)


def test_player_store_preseed_suppresses_profile_refetch(tmp_path):
    first = C.run_crawl(CFG, str(tmp_path / "one"), n_shards=2, record_log=True)
    fetched1 = {u for (_, _, u) in first.fetch_log()}
    assert any("/profile/" in u for u in fetched1)

    second = C.run_crawl(CFG, str(tmp_path / "two"), n_shards=2, record_log=True,
                         player_store=first.players())
    fetched2 = {u for (_, _, u) in second.fetch_log()}
    assert not any("/profile/" in u and "calculations" not in u for u in fetched2)
    # calc pages still fetched (no game watermarks were given)
    assert any("a_indv_calculations" in u for u in fetched2)
    stats = second.stats()
    assert sum(s.get("cache_preseeded", 0) for s in stats) == CFG.n_players
    # game output identical to the first crawl
    a = first.game_history().drop_columns(["lineage"]).to_pandas()
    b = second.game_history().drop_columns(["lineage"]).to_pandas()
    cols = sorted(a.columns)
    sort_cols = ["fide_id", "date", "tournament_name", "opponent_name", "chg"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.sort_values(sort_cols).reset_index(drop=True)[cols],
        b.sort_values(sort_cols).reset_index(drop=True)[cols],
    )


def test_manifest_lineage_and_metrics(tmp_path):
    res = C.run_crawl(CFG, str(tmp_path / "m"), n_shards=2)
    m = store.load_manifest(res.out_dir)
    assert m["finished"] is True
    assert m["completed_epochs"] >= 2
    epochs = m["epochs"]
    assert sum(e["urls_fetched"] for e in epochs.values()) == res.pages()
    assert sum(e["games_raw_rows"] for e in epochs.values()) > 0
    # priority ranges are monotone across epochs (crawl-order lineage)
    keys = sorted(epochs, key=int)
    for a, b in zip(keys, keys[1:]):
        assert epochs[a]["priority_min"] <= epochs[b]["priority_min"]
    assert "shards" in m["metrics"]
    assert sum(s.get("popped", 0) for s in m["metrics"]["shards"]) == res.pages()
