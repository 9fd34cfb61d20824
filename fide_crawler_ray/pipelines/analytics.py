"""Analytics operators over the game_history store — the reference's
query/analytics layer (ui/streamlit_ui.py) re-expressed as generic
Dataset transforms (SURVEY.md §2.5-2.7: A1-A11, O1-O4, M13-M16, J3).

Each function takes a game_history Dataset (schema.GAME_HISTORY) and
returns a small aggregate Dataset/DataFrame — aggregates are the only
things materialized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions.perf_rating import rating_performance


def player_summary(games_ds) -> pd.DataFrame:
    """A1-A4: initial/final rating (by date), rating delta, mean opponent
    rating, date range, total games (ui/streamlit_ui.py:136-146)."""
    agg = games_ds.aggregate(
        Min("date", alias_name="first_date"),
        Max("date", alias_name="last_date"),
        Mean("opponent_rating", alias_name="avg_opponent_rating"),
        Count(alias_name="n_games"),
    )
    # initial/final player_rating = value at min/max date (arg_min/arg_max);
    # resolved with a tiny sorted head/tail, not a full materialize
    first = games_ds.sort(["date", "lineage"]).limit(1).take_all()[0]
    last = games_ds.sort(["date", "lineage"], descending=[True, True]).limit(1).take_all()[0]
    return pd.DataFrame([{
        "initial_rating": first["player_rating"],
        "final_rating": last["player_rating"],
        "rating_delta": last["player_rating"] - first["player_rating"],
        "avg_opponent_rating": round(agg["avg_opponent_rating"], 4),
        "first_date": agg["first_date"],
        "last_date": agg["last_date"],
        "n_games": agg["n_games"],
    }])


def tournament_summary(games_ds):
    """A5+A6: groupby (tournament_name, date): mean opponent rating,
    points=sum(result), games=count; 'points/games' display column
    (ui/streamlit_ui.py:164-190)."""
    agg = games_ds.groupby(["tournament_name", "date"]).aggregate(
        Mean("opponent_rating", alias_name="avg_opponent_rating"),
        Sum("result", alias_name="points"),
        Count(alias_name="n_games"),
    )

    def _post(b: pa.Table) -> pa.Table:
        avg = pc.round(b["avg_opponent_rating"], ndigits=0)
        pts = b["points"].to_pylist()
        games = b["n_games"].to_pylist()
        disp = [
            f"{int(p) if float(p).is_integer() else p}/{g}" for p, g in zip(pts, games)
        ]
        return b.set_column(
            b.schema.get_field_index("avg_opponent_rating"),
            "avg_opponent_rating", pc.cast(avg, pa.int64()),
        ).append_column("points_per_games", pa.array(disp, pa.string()))

    return agg.map_batches(_post, batch_format="pyarrow")


def recent_tournaments(games_ds, k: int = 3):
    """O2: top-k most recent tournaments (ui/streamlit_ui.py:184-187)."""
    return tournament_summary(games_ds).sort("date", descending=True).limit(k)


def result_color_counts(games_ds) -> pd.DataFrame:
    """A7: the 9-cell result × color count matrix from one groupby
    (ui/streamlit_ui.py:217-229 runs 9 separate mask counts)."""
    agg = games_ds.groupby(["player_color", "result"]).aggregate(Count(alias_name="n"))
    df = agg.to_pandas()
    pivot = df.pivot_table(index="player_color", columns="result", values="n",
                           fill_value=0, aggfunc="sum")
    return pivot.reset_index()


def conditional_mean_ratings(games_ds) -> pd.DataFrame:
    """A8: mean opponent rating by (color, result) + overall
    (ui/streamlit_ui.py:268-279)."""
    agg = games_ds.groupby(["player_color", "result"]).aggregate(
        Mean("opponent_rating", alias_name="avg_opp")
    ).to_pandas()
    overall = games_ds.aggregate(Mean("opponent_rating", alias_name="avg"))["avg"]
    agg["avg_opp"] = agg["avg_opp"].round(4)
    total = pd.DataFrame([{"player_color": "all", "result": -1.0,
                           "avg_opp": round(overall, 4)}])
    return pd.concat([agg, total], ignore_index=True)


def result_distribution(games_ds) -> pd.DataFrame:
    """A9: result value-counts normalized to %
    (old_scripts/fide-player-stats-en-US.py:516-519)."""
    agg = games_ds.groupby("result").aggregate(Count(alias_name="n")).to_pandas()
    agg["pct"] = (agg["n"] / agg["n"].sum()).round(6)
    return agg


def opponent_name_filter(games_ds, needle: str):
    """M14: case-insensitive substring filter (ui/streamlit_ui.py:322-324)."""
    return games_ds.map_batches(
        lambda b: b.filter(pc.match_substring(b["opponent_name"], needle,
                                              ignore_case=True)),
        batch_format="pyarrow",
    )


def result_isin_filter(games_ds, selected: list[float]):
    """M13: result.isin(selected) (ui/streamlit_ui.py:311-319)."""
    return games_ds.map_batches(
        lambda b: b.filter(pc.is_in(b["result"],
                                    value_set=pa.array(selected, pa.float32()))),
        batch_format="pyarrow",
    )


def unique_opponents(games_ds):
    """O4: unique + lexicographic sort of opponent names
    (ui/streamlit_ui.py:325-327)."""
    return games_ds.select_columns(["opponent_name"]).groupby(
        "opponent_name"
    ).aggregate(Count(alias_name="n")).drop_columns(["n"]).sort("opponent_name")


def tournament_rollup(games_ds):
    """A10+M17: per (fide_id, tournament_name, date) rollup with the FIDE
    performance rating (old_scripts/fide-games-scraper-public.py:86-95 +
    performanceCalculator.py)."""
    def _indicators(b: pa.Table) -> pa.Table:
        win = pc.cast(pc.equal(b["result"], 1.0), pa.int64())
        loss = pc.cast(pc.equal(b["result"], 0.0), pa.int64())
        return b.append_column("win", win).append_column("loss", loss)

    agg = games_ds.map_batches(_indicators, batch_format="pyarrow").groupby(
        ["fide_id", "tournament_name", "date"]
    ).aggregate(  # ONE shuffle: win/loss counts as summed indicators
        Count(alias_name="n_games"),
        Sum("result", alias_name="points"),
        Sum("opponent_rating", alias_name="rating_sum"),
        Mean("opponent_rating", alias_name="avg_opp_rating"),
        Sum("win", alias_name="wins"),
        Sum("loss", alias_name="losses"),
    )
    df = agg.to_pandas()
    perf = rating_performance(
        df["n_games"].to_numpy(), df["points"].to_numpy(),
        np.round(df["avg_opp_rating"].to_numpy()),
        df["rating_sum"].to_numpy(), df["wins"].to_numpy(), df["losses"].to_numpy(),
    )
    df["performance"] = perf
    df["points_per_game"] = (df["points"] / df["n_games"]).round(6)
    return df
