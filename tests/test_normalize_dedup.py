"""Normalize + exact dedup parity: the Ray pipeline (normalize →
groupby(key_hash) keep-first → dropna) must equal the reference's
process_game_history + store-wide windowed dedup on the same raw rows."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from fide_crawler_ray import refsem, synth
from fide_crawler_ray.schema import DEDUP_KEY, GAME_RAW
from fide_crawler_ray.stages import dedup as DD
from fide_crawler_ray.stages import normalize as NZ

CFG = synth.SiteConfig(seed=42, n_players=6, n_queries=2, n_months=10)


def _raw_rows():
    _, _, games_raw, games_norm = refsem.crawl(CFG)
    return games_raw, games_norm


def _raw_to_table(games_raw):
    cols = {f.name: [str(g[f.name]) for g in games_raw] for f in GAME_RAW}
    t = pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})
    return t.append_column("lineage", pa.array(range(len(games_raw)), pa.int64()))


def _norm_df(rows):
    df = pd.DataFrame(rows)
    return (
        df.sort_values(["date", "tournament_name", "opponent_name", "result",
                        "player_name", "chg"])
        .reset_index(drop=True)
    )


def test_normalize_dedup_matches_reference():
    games_raw, games_norm = _raw_rows()
    assert len(games_raw) > 200
    assert len(games_norm) < len(games_raw)  # dups existed and were removed

    ds = rd.from_arrow(_raw_to_table(games_raw)).repartition(8)
    ds = ds.map_batches(NZ.normalize_games_batch, batch_format="pyarrow")
    ds = DD.dedup_dataset(ds)
    ds = ds.map_batches(NZ.drop_null_batch, batch_format="pyarrow")
    got = ds.drop_columns(["lineage"]).to_pandas()
    for c in ("player_rating", "opponent_rating", "k"):
        got[c] = got[c].astype("int64")
    for c in ("result", "chg", "k_chg"):
        got[c] = got[c].astype("float64").round(4)

    exp = pd.DataFrame(games_norm)
    for c in ("result", "chg", "k_chg"):
        exp[c] = exp[c].astype("float64").round(4)

    got_s = _norm_df(got)[exp.columns.tolist()]
    exp_s = _norm_df(exp)
    pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False)


def test_dedup_idempotent():
    games_raw, _ = _raw_rows()
    ds = rd.from_arrow(_raw_to_table(games_raw)).repartition(4)
    ds = ds.map_batches(NZ.normalize_games_batch, batch_format="pyarrow")
    once = DD.dedup_dataset(ds).materialize()
    twice = DD.dedup_dataset(once).materialize()
    assert once.count() == twice.count()
    a = once.to_pandas().sort_values("lineage").reset_index(drop=True)
    b = twice.to_pandas().sort_values("lineage").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_dedup_keeps_first_by_lineage():
    t = pa.table({
        "date": ["2022-01-31"] * 3,
        "tournament_name": ["T"] * 3,
        "player_name": ["P"] * 3,
        "opponent_name": ["O"] * 3,
        "result": [1.0, 1.0, 0.5],
        "marker": ["first", "second", "other"],
        "lineage": pa.array([5, 9, 7], pa.int64()),
    })
    out = DD.dedup_dataset(rd.from_arrow(t), key_cols=DEDUP_KEY).to_pandas()
    assert sorted(out["marker"]) == ["first", "other"]


def test_dedup_join_fallback_matches_primary():
    """dedup_dataset_join (the at-scale all-to-all fallback) must produce
    exactly the same survivors as the partial-min + probe plan."""
    games_raw, _ = _raw_rows()
    ds = rd.from_arrow(_raw_to_table(games_raw)).repartition(4)
    ds = ds.map_batches(NZ.normalize_games_batch, batch_format="pyarrow")
    a = DD.dedup_dataset(ds).to_pandas()
    b = DD.dedup_dataset_join(ds).to_pandas()
    a = a.sort_values("lineage").reset_index(drop=True)
    b = b.sort_values("lineage").reset_index(drop=True)[a.columns.tolist()]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_dedup_partitioned_combine_matches_single(monkeypatch):
    """The partitioned combine (large-partial tier) must produce exactly
    the same survivors as the single-task combine, including order
    ties (several rows at a key's min lineage keep one representative)."""
    games_raw, _ = _raw_rows()
    ds = rd.from_arrow(_raw_to_table(games_raw)).repartition(4)
    ds = ds.map_batches(NZ.normalize_games_batch, batch_format="pyarrow")
    a = DD.dedup_dataset(ds).to_pandas()
    monkeypatch.setattr(DD, "SINGLE_COMBINE_MAX_ROWS", 0)
    b = DD.dedup_dataset(ds).to_pandas()
    a = a.sort_values("lineage").reset_index(drop=True)
    b = b.sort_values("lineage").reset_index(drop=True)[a.columns.tolist()]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # tie case through the partitioned path
    t = pa.table({
        "date": ["2022-01-01"] * 3,
        "tournament_name": ["T"] * 3,
        "player_name": ["P"] * 3,
        "opponent_name": ["O"] * 3,
        "result": [1.0, 1.0, 0.5],
        "marker": ["first", "second", "other"],
        "lineage": pa.array([5, 5, 7], pa.int64()),
    })
    out = DD.dedup_dataset(rd.from_arrow(t), key_cols=DEDUP_KEY).to_pandas()
    assert len(out) == 2 and "other" in set(out["marker"])


def test_dedup_on_binary_key():
    """dedup_dataset accepts binary key columns (url_hash / media
    payloads): keep-first by lineage per distinct byte string."""
    t = pa.table({
        "payload": pa.array([b"\x00\x01", b"\x00\x01", b"zz", None, None],
                            pa.binary()),
        "marker": ["first", "second", "z", "n1", "n2"],
        "lineage": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = DD.dedup_dataset(rd.from_arrow(t), key_cols=("payload",),
                           order_col="lineage").to_pandas()
    assert sorted(out["marker"]) == ["first", "n1", "z"]

    fb = pa.table({
        "h": pa.array([b"a" * 20, b"a" * 20, b"b" * 20], pa.binary(20)),
        "marker": ["first", "second", "other"],
        "lineage": pa.array([1, 2, 3], pa.int64()),
    })
    out = DD.dedup_dataset(rd.from_arrow(fb), key_cols=("h",),
                           order_col="lineage").to_pandas()
    assert sorted(out["marker"]) == ["first", "other"]
