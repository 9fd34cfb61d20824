"""relational layer (5/7): graph algorithms (HITS, k-core, SSSP, label propagation, link
prediction), time series, geo cells, streaming joins.

Split out of pipelines/relational.py (r4) with ZERO behavior change —
statements keep their original order; ``relational`` re-exports
everything, and ORACLES entries registered here mutate the shared dict
owned by rel_audit_core (or the facade-merged view). See
pipelines/relational.py for the facade contract.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..stages.fastagg import fast_groupby_agg, live_arrow
from .queries import JOIN_PARTS, T, _canon_stage, _queries_matrix
from .rel_joins import (
    PAGERANK_ITERS,
    PAGERANK_SCALE,
    SIM_JOIN_PAIR_CHUNK,
    _TOKEN,
    _pagerank_edges,
    _pagerank_oracle,
    _round_half_away,
    _run_pair_chunks,
    _ts_ns,
)
from .rel_text_profile import (
    _daily_event_counts,
)
from .rel_audit_core import (
    ORACLES,
)



ORACLES["t_closeness"] = """
    WITH g AS (
        SELECT o_orderpriority,
               CAST(year(o_orderdate) * 100 + month(o_orderdate)
                    AS BIGINT) AS omonth,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS nf,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS no,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                    AS BIGINT) AS np,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM orders GROUP BY 1, 2
    ),
    t AS (
        SELECT CAST(sum(nf) AS BIGINT) AS tf,
               CAST(sum(no) AS BIGINT) AS "to",
               CAST(sum(np) AS BIGINT) AS tp,
               CAST(sum(n_rows) AS BIGINT) AS tn
        FROM g
    )
    SELECT o_orderpriority, omonth, n_rows,
           CAST(1000000 * (abs(nf * tn - tf * n_rows)
                           + abs(no * tn - "to" * n_rows)
                           + abs(np * tn - tp * n_rows))
                // (2 * n_rows * tn) AS BIGINT) AS tvd_fp,
           (1000000 * (abs(nf * tn - tf * n_rows)
                       + abs(no * tn - "to" * n_rows)
                       + abs(np * tn - tp * n_rows))
            // (2 * n_rows * tn)) > 200000 AS breach
    FROM g, t
"""


def q_theil_sen(sf_dir):
    """Per-user Theil–Sen robust trend (median of all pairwise slopes —
    the estimator that shrugs off the outliers OLS chases; the robust
    counterpart to grouped_regression). x = day index of ts, y = value
    in cents; slope over every pair with distinct days, as an EXACT
    integer: floor(dy_cents·10⁶ / dx_days), numpy's native floor
    division, mirrored in SQL by truncating `//` plus the one-row
    negative-remainder correction (dx > 0 always — pairs are day-
    ordered). Median = the pinned lower-median rank ceil(n/2) (the
    grouped_boxplot rule). Plan: ONE hash shuffle on user_id, then
    per-group vectorized pair enumeration (np.triu over the day-sorted
    arrays) — O(k²) per key under the documented bounded-events-per-
    user contract (max 86 here); the exchange is rows, the output is
    users. Groups spanning a single day emit nothing on both sides."""
    ds = T(sf_dir, "events", ["user_id", "ts", "value"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "day": pa.array(_ts_ns(b["ts"]) // 86_400_000_000_000,
                            pa.int64()),
            "y_fp": pa.array(_round_half_away(
                b["value"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)),
        })

    def _sen(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["day", "y_fp"], kind="mergesort")
        day = d["day"].to_numpy(np.int64)
        y = d["y_fp"].to_numpy(np.int64)
        i, j = np.triu_indices(len(day), k=1)
        keep = day[j] > day[i]
        if not keep.any():
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "n_pairs": pd.Series([], dtype=np.int64),
                "slope_fp": pd.Series([], dtype=np.int64)})
        i, j = i[keep], j[keep]
        slopes = np.sort((y[j] - y[i]) * 1_000_000 // (day[j] - day[i]))
        k = (len(slopes) + 1) // 2  # lower median, rank ceil(n/2)
        return pd.DataFrame({
            "user_id": [np.int64(df["user_id"].iloc[0])],
            "n_pairs": [np.int64(len(slopes))],
            "slope_fp": [np.int64(slopes[k - 1])]})

    return (ds.map_batches(_prep, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(_sen, batch_format="pandas"))


ORACLES["theil_sen"] = """
    WITH e AS (
        SELECT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day,
               CAST(round(value * 100) AS BIGINT) AS y_fp
        FROM events
    ),
    pairs AS (
        SELECT a.user_id,
               (b.y_fp - a.y_fp) * 1000000 AS dy6,
               (b.day - a.day) AS dx
        FROM e a JOIN e b
          ON a.user_id = b.user_id AND b.day > a.day
    ),
    s AS (
        SELECT user_id,
               dy6 // dx - CASE WHEN dy6 % dx <> 0 AND dy6 < 0
                                THEN 1 ELSE 0 END AS slope_fp
        FROM pairs
    ),
    r AS (
        SELECT user_id, slope_fp,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY slope_fp) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_pairs
        FROM s
    )
    SELECT user_id, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(slope_fp AS BIGINT) AS slope_fp
    FROM r WHERE rn = (n_pairs + 1) // 2
"""


def q_forecast_mase(sf_dir, m: int = 7):
    """Forecast-accuracy scorecard: MASE (mean absolute SCALED error,
    Hyndman & Koehler) of the seasonal-naive weekly forecast
    ŷ_t = y_{t−7} over daily revenue — the standard dimensionless
    baseline every forecasting pipeline must beat, here computed
    EXACTLY: the distributed part is one map-side-combined day
    histogram (time-span-bounded, the daily_ewma exchange); the dense
    day grid zero-fills gaps so both lags are defined on a regular
    calendar; numerator Σ|y_t − y_{t−m}| and the naive-walk denominator
    Σ|y_t − y_{t−1}| are integer-cent sums, and the final ratio is one
    ×10⁶ cross-multiplied floor division — no float anywhere."""
    orders = T(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def _day(b: pa.Table) -> pa.Table:
        return pa.table({
            "d": pa.array(
                b["o_orderdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 86_400_000_000, pa.int64()),
            "v": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    vc = fast_groupby_agg(
        orders.map_batches(_day, batch_format="pyarrow"),
        ["d"], {"v": ("v", "sum")}).to_pandas()
    d = vc["d"].to_numpy(np.int64)
    lo, hi = int(d.min()), int(d.max())
    y = np.zeros(hi - lo + 1, np.int64)
    y[d - lo] = vc["v"].to_numpy(np.int64)
    n = len(y)
    err_m = int(np.abs(y[m:] - y[:-m]).sum())
    err_1 = int(np.abs(y[1:] - y[:-1]).sum())
    mase = (1_000_000 * err_m * (n - 1) // (err_1 * (n - m))
            if err_1 and n > m else 0)
    return pd.DataFrame([{
        "n_days": np.int64(n), "err_m_sum": np.int64(err_m),
        "err_1_sum": np.int64(err_1), "mase_fp": np.int64(mase),
    }])


ORACLES["forecast_mase"] = """
    WITH day AS (
        SELECT datediff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
    ),
    grid AS (
        SELECT unnest(generate_series((SELECT min(d) FROM day),
                                      (SELECT max(d) FROM day))) AS d
    ),
    dense AS (
        SELECT g.d, COALESCE(day.v, 0) AS v
        FROM grid g LEFT JOIN day ON day.d = g.d
    ),
    lagged AS (
        SELECT v,
               lag(v, 7) OVER (ORDER BY d) AS v7,
               lag(v, 1) OVER (ORDER BY d) AS v1
        FROM dense
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CASE WHEN v7 IS NULL THEN 0
                             ELSE abs(v - v7) END) AS BIGINT) AS err_m_sum,
               CAST(sum(CASE WHEN v1 IS NULL THEN 0
                             ELSE abs(v - v1) END) AS BIGINT) AS err_1_sum
        FROM lagged
    )
    SELECT n_days, err_m_sum, err_1_sum,
           CASE WHEN err_1_sum > 0 AND n_days > 7
                THEN CAST(1000000 * CAST(err_m_sum AS HUGEINT)
                          * (n_days - 1)
                          // (CAST(err_1_sum AS HUGEINT)
                              * (n_days - 7)) AS BIGINT)
                ELSE 0 END AS mase_fp
    FROM s
"""


def q_attribution_position(sf_dir):
    """Position-based (U-shaped) multi-touch attribution — each user's
    first conversion distributes 1,000,000 ppm of credit over the
    TOUCH events that precede it: 40% to the first touch, 40% to the
    last, 20% split over the middles (n=1 → all; n=2 → 500k/500k —
    the collapse rule is pinned); integer remainders of the middle
    split go to the EARLIEST middles (the apportion_quota largest-
    remainder discipline, deterministic). Touch = any non-purchase
    event before the user's first 'purchase'. Plan: one
    splitmix64(user) % P shuffle, then per-partition VECTORIZED pandas
    (transform-min for the conversion time, cumcount ranks, np.where
    credit rule — no per-user Python). Output: total credited ppm per
    event_type — conservation (Σ = converters × 10⁶) is asserted by
    test."""
    from ..functions.sketches import _splitmix64

    P = 64
    ev = T(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def _part(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((_splitmix64(u) % np.uint64(P))
                             .astype(np.int64)))

    def _credit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        is_p = (g["event_type"] == "purchase").to_numpy()
        pts = g["ts"].where(pd.Series(is_p, index=g.index))
        first_p = pts.groupby(g["user_id"]).transform("min")
        touch = g[(~is_p) & g["ts"].lt(first_p)].copy()
        if len(touch) == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=str),
                "credit_ppm": pd.Series([], dtype=np.int64)})
        grp = touch.groupby("user_id", sort=False)
        rn = grp.cumcount().to_numpy(np.int64)
        k = grp["event_id"].transform("size").to_numpy(np.int64)
        first = rn == 0
        last = rn == k - 1
        mid = ~(first | last)
        n_mid = k - 2
        base = np.where(mid, 200_000 // np.maximum(n_mid, 1), 0)
        rem = np.where(mid, 200_000 % np.maximum(n_mid, 1), 0)
        credit = np.where(
            k == 1, 1_000_000,
            np.where(k == 2, 500_000,
                     np.where(first | last, 400_000,
                              base + (rn - 1 < rem).astype(np.int64))))
        touch["credit_ppm"] = credit.astype(np.int64)
        out = touch.groupby("event_type", sort=False)["credit_ppm"] \
            .sum().reset_index()
        out["credit_ppm"] = out["credit_ppm"].astype(np.int64)
        return out

    parts = ev.map_batches(_part, batch_format="pyarrow") \
        .groupby("part").map_groups(_credit, batch_format="pandas")
    return fast_groupby_agg(parts, ["event_type"],
                            {"credit_ppm": ("credit_ppm", "sum")})


ORACLES["attribution_position"] = """
    WITH conv AS (
        SELECT user_id, min(ts) AS cts FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touch AS (
        SELECT e.user_id, e.event_type,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn,
               count(*) OVER (PARTITION BY e.user_id) AS k
        FROM events e JOIN conv c ON c.user_id = e.user_id
        WHERE e.event_type <> 'purchase' AND e.ts < c.cts
    ),
    credit AS (
        SELECT event_type,
               CASE WHEN k = 1 THEN 1000000
                    WHEN k = 2 THEN 500000
                    WHEN rn = 1 OR rn = k THEN 400000
                    ELSE 200000 // (k - 2)
                         + CASE WHEN rn - 2 < 200000 % (k - 2)
                                THEN 1 ELSE 0 END
               END AS ppm
        FROM touch
    )
    SELECT event_type, CAST(sum(ppm) AS BIGINT) AS credit_ppm
    FROM credit GROUP BY event_type
"""


def q_rendezvous_shards(sf_dir, s_before: int = 8):
    """Rendezvous (highest-random-weight) consistent sharding audit —
    the shard-assignment discipline a 10¹⁰-key frontier needs to grow
    its shard pool without a stop-the-world reshuffle: every key goes
    to argmax_s md5(key ':' s) (60-bit integer weight, ties to the
    smallest s — the table_checksum md5-60-bit bridge), and when the
    pool grows S → S+1 the ONLY keys that move are those won by the
    NEW shard (≈ 1/(S+1) of them) — asserted in-query: moved_in = 0
    for every pre-existing shard. Plan: one map over customer keys
    computing both assignments per row, per-batch bincount partials,
    one 9-row exchange; the oracle replays the argmax with windowed
    row_number over the key × shard cross product."""
    ds = T(sf_dir, "customer", ["c_custkey"])
    s_after = s_before + 1

    def _assign(b: pa.Table) -> pa.Table:
        keys = b["c_custkey"].to_numpy(zero_copy_only=False)
        w = np.empty((len(keys), s_after), np.int64)
        for s in range(s_after):
            suf = f":{s}"
            w[:, s] = [int(hashlib.md5(f"{k}{suf}".encode())
                           .hexdigest()[:15], 16) for k in keys]
        a8 = np.argmax(w[:, :s_before], axis=1)  # first max = smallest s
        a9 = np.argmax(w, axis=1)
        moved = a9 != a8
        return pa.table({
            "shard": pa.array(np.arange(s_after, dtype=np.int64)),
            "n_before": pa.array(
                np.bincount(a8, minlength=s_after).astype(np.int64)),
            "n_after": pa.array(
                np.bincount(a9, minlength=s_after).astype(np.int64)),
            "moved_in": pa.array(
                np.bincount(a9[moved], minlength=s_after)
                .astype(np.int64)),
        })

    out = fast_groupby_agg(
        ds.map_batches(_assign, batch_format="pyarrow"), ["shard"], {
            "n_before": ("n_before", "sum"),
            "n_after": ("n_after", "sum"),
            "moved_in": ("moved_in", "sum"),
        }).to_pandas().sort_values("shard").reset_index(drop=True)
    # the rendezvous minimal-disruption invariant: growth only ever
    # moves keys INTO the new shard
    assert (out.loc[out["shard"] < s_before, "moved_in"] == 0).all()
    assert int(out.loc[out["shard"] == s_before, "moved_in"].iloc[0]) \
        == int(out.loc[out["shard"] == s_before, "n_after"].iloc[0])
    return out


ORACLES["rendezvous_shards"] = """
    WITH k AS (SELECT c_custkey AS key FROM customer),
    w AS (
        SELECT key, s,
               CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || ':'
                                        || CAST(s AS VARCHAR)), 1, 15))
                    AS BIGINT) AS wt
        FROM k, unnest(generate_series(0, 8)) AS t(s)
    ),
    s9 AS (
        SELECT key, s AS shard9 FROM (
            SELECT key, s, row_number() OVER (
                PARTITION BY key ORDER BY wt DESC, s) AS rn FROM w)
        WHERE rn = 1
    ),
    s8 AS (
        SELECT key, s AS shard8 FROM (
            SELECT key, s, row_number() OVER (
                PARTITION BY key ORDER BY wt DESC, s) AS rn
            FROM w WHERE s < 8)
        WHERE rn = 1
    ),
    j AS (SELECT s9.key, shard9, shard8
          FROM s9 JOIN s8 ON s8.key = s9.key),
    grid AS (SELECT unnest(generate_series(0, 8)) AS shard)
    SELECT g.shard,
           CAST(COALESCE(sum(CASE WHEN shard8 = g.shard
                                  THEN 1 END), 0) AS BIGINT) AS n_before,
           CAST(COALESCE(sum(CASE WHEN shard9 = g.shard
                                  THEN 1 END), 0) AS BIGINT) AS n_after,
           CAST(COALESCE(sum(CASE WHEN shard9 = g.shard
                                  AND shard8 <> shard9
                                  THEN 1 END), 0) AS BIGINT) AS moved_in
    FROM grid g LEFT JOIN j ON j.shard9 = g.shard OR j.shard8 = g.shard
    GROUP BY g.shard
"""


def q_clamped_balance(sf_dir):
    """Floor-clamped running balance — per user, credits (non-purchase
    event values) and debits (purchases) in time order with the
    balance clamped at zero: b_t = max(0, b_{t−1} + d_t), the
    inventory/wallet scan that looks sequential but has the exact
    closed form b_t = S_t − min(0, min_{j≤t} S_j) (S = prefix sum), so
    BOTH sides stay vectorized: the engine runs segment cumsum/cummin
    per splitmix64(user) % P partition, the oracle nests two window
    passes — no recursion, no row loop. A clamp fires at t iff
    S_t < min(0, min_{j<t} S_j); integer cents throughout. Output per
    user: final balance, clamp count, running-balance max."""
    from ..functions.sketches import _splitmix64

    P = 64
    ev = T(sf_dir, "events", ["user_id", "event_type", "ts",
                              "event_id", "value"])

    def _part(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        cents = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        debit = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"], "ts": b["ts"],
            "event_id": b["event_id"],
            "d": pa.array(np.where(debit, -cents, cents)),
            "part": pa.array((_splitmix64(u) % np.uint64(P))
                             .astype(np.int64)),
        })

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        s = grp["d"].cumsum()
        # running min of S per user, then clamp algebra
        smin = s.groupby(g["user_id"], sort=False).cummin()
        floor = np.minimum(smin.to_numpy(np.int64), 0)
        bal = s.to_numpy(np.int64) - floor
        # clamp at t iff S_t < min(0, min_{j<t} S_j): shift the floor
        prev_floor = np.minimum(
            smin.groupby(g["user_id"], sort=False).shift(1)
            .fillna(0).to_numpy(np.int64), 0)
        clamped = s.to_numpy(np.int64) < prev_floor
        out = pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64),
            "bal": bal, "clamp": clamped.astype(np.int64)})
        agg = out.groupby("user_id", sort=False).agg(
            final_fp=("bal", "last"), n_clamped=("clamp", "sum"),
            max_fp=("bal", "max"))
        return agg.reset_index().astype(np.int64)

    parts = ev.map_batches(_part, batch_format="pyarrow") \
        .groupby("part").map_groups(_scan, batch_format="pandas")
    return parts.select_columns(
        ["user_id", "final_fp", "n_clamped", "max_fp"])


ORACLES["clamped_balance"] = """
    WITH d AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN -CAST(round(value * 100) AS BIGINT)
                    ELSE CAST(round(value * 100) AS BIGINT) END AS d
        FROM events
    ),
    s AS (
        SELECT user_id, ts, event_id,
               sum(d) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rs
        FROM d
    ),
    m AS (
        SELECT user_id, ts, event_id, rs,
               LEAST(min(rs) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id), 0) AS fl,
               LEAST(COALESCE(min(rs) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0), 0) AS prev_fl,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC)
                   AS rn_last
        FROM s
    )
    SELECT user_id,
           CAST(max(CASE WHEN rn_last = 1 THEN rs - fl END)
                AS BIGINT) AS final_fp,
           CAST(sum(CASE WHEN rs < prev_fl THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped,
           CAST(max(rs - fl) AS BIGINT) AS max_fp
    FROM m GROUP BY user_id
"""


def q_longest_streak(sf_dir):
    """Longest run of CONSECUTIVE active days per user — the
    gaps-and-islands classic (engagement-streak feature): distinct
    active days collapse to islands by the day − rank trick (both
    sides), island length = count, answer = per-user max. Engine:
    distinct (user, day) via one map-side-combined groupby, then a
    fully vectorized island fold per splitmix64(user) % P partition
    (sorted day − positional rank is constant within an island). All
    integers."""
    from ..functions.sketches import _splitmix64

    P = 64
    ev = T(sf_dir, "events", ["user_id", "ts"])

    def _day(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "day": pa.array(_ts_ns(b["ts"]) // 86_400_000_000_000,
                            pa.int64()),
            "part": pa.array((_splitmix64(u) % np.uint64(P))
                             .astype(np.int64)),
        })

    days = fast_groupby_agg(
        ev.map_batches(_day, batch_format="pyarrow"),
        ["user_id", "day", "part"], {"_n": (None, "count")})

    def _streak(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        rank = np.arange(len(d), dtype=np.int64)
        # island id: same user AND same (day − positional rank)
        island = np.r_[True, (u[1:] != u[:-1])
                       | ((d[1:] - rank[1:]) != (d[:-1] - rank[:-1]))]
        iid = np.cumsum(island) - 1
        lens = np.bincount(iid)
        df = pd.DataFrame({"user_id": u[island], "len": lens})
        agg = df.groupby("user_id", sort=False).agg(
            longest=("len", "max"), n_active_days=("len", "sum"))
        return agg.reset_index().astype(np.int64)

    return days.groupby("part").map_groups(
        _streak, batch_format="pandas").select_columns(
        ["user_id", "longest", "n_active_days"])


ORACLES["longest_streak"] = """
    WITH days AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day
        FROM events
    ),
    isl AS (
        SELECT user_id,
               day - row_number() OVER (PARTITION BY user_id
                                        ORDER BY day) AS grp
        FROM days
    ),
    lens AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS len
        FROM isl GROUP BY user_id, grp
    )
    SELECT user_id, CAST(max(len) AS BIGINT) AS longest,
           CAST(sum(len) AS BIGINT) AS n_active_days
    FROM lens GROUP BY user_id
"""


def q_lpt_partition_plan(sf_dir, n_workers: int = 16):
    """Skew-aware partition planner — Longest-Processing-Time greedy
    assignment of per-key load onto P workers (the planning step
    behind salted_join/key_skew remediation: given the measured key
    histogram, pick WHICH keys co-locate so the heaviest worker is
    minimal). Keys = l_partkey, load = row count. The histogram is a
    map-side-combined groupby (key-domain-sized); the greedy runs on
    the driver over that bounded histogram (sorted desc, least-loaded
    heap, ties to the lower worker id — deterministic). Rows-only
    (LPT is a 20k-step sequential recurrence — not SQL), but gated
    in-query by Graham's bound: max_load ≤ 4/3·OPT via the certified
    lower bound OPT ≥ max(⌈total/P⌉, max single key), plus exact
    conservation Σ loads = Σ rows. Output: one row per worker."""
    import heapq

    hist = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_partkey"]),
        ["l_partkey"], {"n": (None, "count")}).to_pandas()
    hist = hist.sort_values(["n", "l_partkey"],
                            ascending=[False, True])
    loads = hist["n"].to_numpy(np.int64)
    heap = [(0, w) for w in range(n_workers)]
    tot_load = np.zeros(n_workers, np.int64)
    n_keys = np.zeros(n_workers, np.int64)
    for n in loads:
        load, w = heapq.heappop(heap)
        tot_load[w] += int(n)
        n_keys[w] += 1
        heapq.heappush(heap, (load + int(n), w))
    total = int(loads.sum())
    lb = max(-(-total // n_workers), int(loads.max()))
    assert int(tot_load.max()) * 3 <= 4 * lb, \
        (int(tot_load.max()), lb)  # Graham's LPT guarantee vs OPT ≥ lb
    assert int(tot_load.sum()) == total
    return pd.DataFrame({
        "worker": np.arange(n_workers, dtype=np.int64),
        "load": tot_load,
        "n_keys": n_keys,
        "lb_opt": np.full(n_workers, lb, np.int64),
    })


def q_holdout_leakage(sf_dir):
    """Holdout-leakage audit — the eval-integrity check that follows
    q_train_val_test_split: EXACT-duplicate texts that straddle a
    split boundary leak eval data into training (Lee et al. §5 report
    the same failure class for deduplicated benchmarks). Reuses the
    split rule verbatim (md5(doc_id) bucket 80/10/10) and the exact
    dedup discipline (md5(text) identity). Plan: one map emits
    (text_hash, split); a map-side-combined groupby collapses to
    DISTINCT (hash, split); a second groupby counts splits per hash;
    the final exchange is hash-domain-sized. Output: total distinct
    texts, texts present in ≥2 splits, and the leaked-pair count
    Σ(n_splits choose 2)."""
    ds = T(sf_dir, "documents", ["doc_id", "text"])

    def _hs(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        bucket = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10
             for i in ids], np.int64)
        split = np.where(bucket < 8, "train",
                         np.where(bucket == 8, "val", "test"))
        th = [hashlib.md5((t or "").encode()).hexdigest()
              for t in b["text"].to_pylist()]
        return pa.table({
            "h": pa.array(th, pa.string()),
            "split": pa.array(split.tolist(), pa.string()),
        })

    per_split = fast_groupby_agg(
        ds.map_batches(_hs, batch_format="pyarrow"),
        ["h", "split"], {"_n": (None, "count")})
    per_hash = fast_groupby_agg(
        per_split, ["h"], {"n_splits": (None, "count")})

    def _fold(b: pa.Table) -> pa.Table:
        k = b["n_splits"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_texts": pa.array([len(k)], pa.int64()),
            "n_leaky_texts": pa.array([int((k >= 2).sum())], pa.int64()),
            "n_leaked_pairs": pa.array(
                [int((k * (k - 1) // 2).sum())], pa.int64()),
        })

    parts = per_hash.map_batches(_fold, batch_format="pyarrow") \
        .to_pandas()
    return pd.DataFrame([{
        "n_texts": np.int64(parts["n_texts"].sum()),
        "n_leaky_texts": np.int64(parts["n_leaky_texts"].sum()),
        "n_leaked_pairs": np.int64(parts["n_leaked_pairs"].sum()),
    }])


ORACLES["holdout_leakage"] = """
    WITH s AS (
        SELECT md5(text) AS h,
               CASE WHEN CAST(('0x' || substr(
                        md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        % 10 < 8 THEN 'train'
                    WHEN CAST(('0x' || substr(
                        md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        % 10 = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    d AS (SELECT DISTINCT h, split FROM s),
    k AS (SELECT h, CAST(count(*) AS BIGINT) AS n_splits
          FROM d GROUP BY h)
    SELECT CAST(count(*) AS BIGINT) AS n_texts,
           CAST(sum(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaky_texts,
           CAST(sum(n_splits * (n_splits - 1) // 2)
                AS BIGINT) AS n_leaked_pairs
    FROM k
"""


_SCD2_OPEN_US = 253_402_214_400_000_000  # 9999-12-31 00:00:00 UTC


def q_scd2_build(sf_dir):
    """Slowly-changing-dimension TYPE-2 build — compress each user's
    value stream (cents) into validity intervals [valid_from, valid_to)
    with an is_current flag: the warehouse-dimension primitive that
    turns a CDC change feed into point-in-time-joinable history.
    Change compression keeps a row iff its value differs from the
    user's previous row (ties totally ordered by (ts, event_id));
    valid_to = next kept row's ts, open intervals get the 9999-12-31
    sentinel. Timestamps travel as epoch MICROSECONDS (int64) so the
    comparison is format-free. Plan: one splitmix64(user) % P shuffle,
    then a fully vectorized per-partition shift/compare — mirrored by
    lag/lead windows in SQL."""
    from ..functions.sketches import _splitmix64

    P = 64
    ev = T(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def _part(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "us": pa.array(_ts_ns(b["ts"]) // 1_000, pa.int64()),
            "event_id": b["event_id"],
            "v": pa.array(_round_half_away(
                b["value"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)),
            "part": pa.array((_splitmix64(u) % np.uint64(P))
                             .astype(np.int64)),
        })

    def _scd(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        keep = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        ku, kus, kv = u[keep], us[keep], v[keep]
        nxt = np.r_[kus[1:], np.int64(_SCD2_OPEN_US)]
        same = np.r_[ku[1:] == ku[:-1], False]
        vt = np.where(same, nxt, np.int64(_SCD2_OPEN_US))
        return pd.DataFrame({
            "user_id": ku, "valid_from_us": kus,
            "valid_to_us": vt.astype(np.int64),
            "value_fp": kv,
            "is_current": ~same,
        })

    return ev.map_batches(_part, batch_format="pyarrow") \
        .groupby("part").map_groups(_scd, batch_format="pandas") \
        .select_columns(["user_id", "valid_from_us", "valid_to_us",
                         "value_fp", "is_current"])


ORACLES["scd2_build"] = """
    WITH s AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ),
    o AS (
        SELECT *, lag(v) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS pv
        FROM s
    ),
    c AS (SELECT user_id, us, event_id, v FROM o
          WHERE pv IS NULL OR v <> pv),
    f AS (
        SELECT user_id, us AS valid_from_us,
               lead(us) OVER (PARTITION BY user_id
                              ORDER BY us, event_id) AS nxt,
               v AS value_fp
        FROM c
    )
    SELECT user_id, valid_from_us,
           CAST(COALESCE(nxt, 253402214400000000) AS BIGINT)
               AS valid_to_us,
           value_fp, nxt IS NULL AS is_current
    FROM f
"""


def q_pit_feature_join(sf_dir):
    """Point-in-time-correct feature join — the leakage-free feature
    lookup every training pipeline needs: each 'purchase' fact joins
    the FEATURE VALUE IN EFFECT at its timestamp, where the feature is
    the SCD2-compressed stream of the same user's 'view' values
    (q_scd2_build's discipline restricted to views). Using any later
    value would leak the future into training; using the raw stream
    would double-count unchanged values. Plan: one splitmix64(user) % P
    shuffle carrying BOTH roles in one table (no second exchange), then
    a per-partition vectorized MERGE + FORWARD-FILL: rows sort by
    (user, us, dim-before-fact, event_id) and each fact takes the last
    preceding change point's value via one maximum.accumulate (user
    equality checked on the filled index — no composite-key stride
    arithmetic, no overflow) — mirrored in SQL by an interval join
    against the lag/lead CTE. Facts before the first view carry
    feature_fp −1 (pinned)."""
    from ..functions.sketches import _splitmix64

    P = 64
    ev = T(sf_dir, "events", ["user_id", "event_type", "ts",
                              "event_id", "value"])

    def _part(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "purchase") | (et == "view")
        t = pa.table({
            "user_id": b["user_id"],
            "is_fact": pa.array(et == "purchase"),
            "us": pa.array(_ts_ns(b["ts"]) // 1_000, pa.int64()),
            "event_id": b["event_id"],
            "v": pa.array(_round_half_away(
                b["value"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)),
            "part": pa.array((_splitmix64(u) % np.uint64(P))
                             .astype(np.int64)),
        })
        return t.filter(pa.array(keep))

    def _pit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort")
        fact_all = g["is_fact"].to_numpy()
        dim = g[~fact_all]
        u_d = dim["user_id"].to_numpy(np.int64)
        us_d = dim["us"].to_numpy(np.int64)
        v_d = dim["v"].to_numpy(np.int64)
        # SCD2 change compression of the view stream
        keep = np.r_[True, (u_d[1:] != u_d[:-1]) | (v_d[1:] != v_d[:-1])] \
            if len(u_d) else np.zeros(0, bool)
        ku, kus, kv = u_d[keep], us_d[keep], v_d[keep]
        facts = g[fact_all]
        u_f = facts["user_id"].to_numpy(np.int64)
        us_f = facts["us"].to_numpy(np.int64)
        # merge: change points and facts in one (user, us, dim-first)
        # order; each fact forward-fills the last change-point index
        nd, nf = len(ku), len(u_f)
        mu = np.concatenate([ku, u_f])
        mus = np.concatenate([kus, us_f])
        mrole = np.concatenate([np.zeros(nd, np.int8),
                                np.ones(nf, np.int8)])  # dim before fact
        order = np.lexsort((mrole, mus, mu))
        is_dim = mrole[order] == 0
        last_dim = np.maximum.accumulate(
            np.where(is_dim, np.arange(nd + nf), -1))
        src = np.concatenate([np.arange(nd), np.arange(nf)])
        fact_pos = np.flatnonzero(~is_dim)
        fidx = src[order][fact_pos]           # index into the facts
        didx = last_dim[fact_pos]             # merged pos of last dim
        valid = didx >= 0
        dsrc = src[order][np.maximum(didx, 0)]  # index into change pts
        if nd:
            valid &= ku[dsrc] == u_f[fidx]
        feat = np.full(nf, np.int64(-1))
        if nd:
            feat_v = np.where(valid, kv[dsrc], np.int64(-1))
            feat[fidx] = feat_v
        return pd.DataFrame({
            "event_id": facts["event_id"].to_numpy(np.int64),
            "user_id": u_f,
            "purchase_fp": facts["v"].to_numpy(np.int64),
            "feature_fp": feat.astype(np.int64),
        })

    return ev.map_batches(_part, batch_format="pyarrow") \
        .groupby("part").map_groups(_pit, batch_format="pandas") \
        .select_columns(["event_id", "user_id", "purchase_fp",
                         "feature_fp"])


ORACLES["pit_feature_join"] = """
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100) AS BIGINT) AS fv
        FROM events WHERE event_type = 'view'
    ),
    o AS (
        SELECT *, lag(fv) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS pv
        FROM v
    ),
    c AS (SELECT user_id, us, event_id, fv FROM o
          WHERE pv IS NULL OR fv <> pv),
    dim AS (
        SELECT user_id, us AS vf,
               lead(us) OVER (PARTITION BY user_id
                              ORDER BY us, event_id) AS vt,
               fv
        FROM c
    ),
    f AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CAST(round(value * 100) AS BIGINT) AS purchase_fp
        FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.purchase_fp,
           CAST(COALESCE(d.fv, -1) AS BIGINT) AS feature_fp
    FROM f LEFT JOIN dim d
      ON d.user_id = f.user_id AND d.vf <= f.us
         AND (d.vt IS NULL OR f.us < d.vt)
"""


def q_ams_f2(sf_dir, n_est: int = 96):
    """AMS second-frequency-moment sketch (Alon–Matias–Szegedy F₂ =
    Σ_k c_k² — the self-join-size / skew statistic) — completes the
    mergeable-sketch family next to HLL (F₀), CMS (point counts) and
    Misra–Gries (heavy hitters). Each of ``n_est`` estimators keeps one
    signed counter z_r = Σ s_r(key) over occurrences, with s_r(key) =
    ±1 from the parity of splitmix64(key XOR r·φ64) — an INDEPENDENT
    rehash per estimator (bit-slicing one hash correlates the
    estimators); F̂₂ = the canonical AMS median-of-means: mean of z²
    within each of 12 groups of 8, median across groups (the median of
    RAW z² values estimates the χ²₁ median ≈ 0.455·F₂, not F₂ — and a
    single grand mean of 48 showed ±25% one-draw spread across seeds,
    so the group count matters as much as the estimator count).
    Per-batch partials
    are an n_est-int vector, tree-combined by +. Gated in-query against
    the EXACT F₂ (one groupby + fold): median-of-48 is within ±50% with
    overwhelming margin (Var(z²) ≤ 2F₂²). Rows-only (randomized
    estimator; the exact side rides along in the output)."""
    from ..functions.sketches import _splitmix64

    GOLDEN = np.uint64(0x9E3779B97F4A7C15)
    ds = T(sf_dir, "lineitem", ["l_partkey"])

    def _partial(b: pa.Table) -> pa.Table:
        k = b["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        z = np.empty(n_est, np.int64)
        for r in range(n_est):
            h = _splitmix64(k ^ (np.uint64(r) * GOLDEN))
            parity = ((h >> np.uint64(32)) ^ h) & np.uint64(1)
            z[r] = int((2 * parity.astype(np.int64) - 1).sum())
        return pa.table({"r": pa.array(np.arange(n_est, dtype=np.int64)),
                         "z": pa.array(z)})

    zs = fast_groupby_agg(
        ds.map_batches(_partial, batch_format="pyarrow"),
        ["r"], {"z": ("z", "sum")}).to_pandas()
    z = zs.sort_values("r")["z"].to_numpy(np.int64)
    sq = (z.astype(object)) ** 2
    groups = [int(sum(sq[g::12])) // (n_est // 12) for g in range(12)]
    est = int(np.median(np.array(groups, dtype=object)))
    exact_df = fast_groupby_agg(
        ds, ["l_partkey"], {"c": (None, "count")}).map_batches(
        lambda b: pa.table({"f2": pa.array(
            [int((b["c"].to_numpy(zero_copy_only=False).astype(object)
                  ** 2).sum())], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    f2 = int(exact_df["f2"].sum())
    rel_err_ppm = abs(est - f2) * 1_000_000 // max(f2, 1)
    assert rel_err_ppm <= 500_000, (est, f2, rel_err_ppm)
    return pd.DataFrame([{
        "n_estimators": np.int64(n_est),
        "f2_exact": np.int64(f2),
        "f2_est": np.int64(est),
        "rel_err_ppm": np.int64(rel_err_ppm),
    }])


def q_roc_auc(sf_dir):
    """Exact ROC-AUC of the batch-inference scorer (class-1 logit)
    against the derived binary truth label % 2 — the model-eval rank
    statistic next to confusion_matrix, computed EXACTLY by the
    Mann–Whitney identity with midrank tie handling: AUC =
    (Σ_pos 2·midrank − n₊(n₊+1)) / (2·n₊·n₋), every term an integer.
    Scores quantize to logit_fp // 10⁶ buckets on BOTH sides (numpy
    floor ↔ SQL `//` with the negative-remainder correction), so the
    exchange is the (bucket, truth) value-count fold — the engine's
    bounded-value-histogram contract (grouped_median's discipline),
    never a global sort. The driver walk is one cumulative pass over
    the bucket histogram."""
    ds = T(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    class _Score:
        def __init__(self):
            self.w1: np.ndarray | None = None

        def __call__(self, b: pa.Table) -> pa.Table:
            from ..functions import ann as ANN

            m = ANN._to_matrix(b["embedding"]).astype(np.float64)
            if self.w1 is None:
                j = np.arange(m.shape[1])
                self.w1 = ((j * 31 + 17) % 7 - 3).astype(np.int64)
            efp = _round_half_away(m * 1e6).astype(np.int64)
            s = efp @ self.w1
            y = (b["label"].to_numpy(zero_copy_only=False)
                 .astype(np.int64) % 2)
            return pa.table({
                "b": pa.array(s // 1_000_000),  # numpy floor division
                "y": pa.array(y),
            })

    hist = fast_groupby_agg(
        ds.map_batches(_Score, batch_format="pyarrow",
                       batch_size=4096, concurrency=(1, 4)),
        ["b"], {"n": (None, "count"), "p": ("y", "sum")}).to_pandas()
    hist = hist.sort_values("b")
    n = hist["n"].to_numpy(np.int64)
    p = hist["p"].to_numpy(np.int64)
    c = np.concatenate([[0], np.cumsum(n)[:-1]])
    s2 = int((p.astype(object) * (2 * c.astype(object) + n + 1)).sum())
    n_pos = int(p.sum())
    n_neg = int(n.sum()) - n_pos
    auc = (1_000_000 * (s2 - n_pos * (n_pos + 1))
           // (2 * n_pos * n_neg)) if n_pos and n_neg else 0
    return pd.DataFrame([{
        "n_pos": np.int64(n_pos), "n_neg": np.int64(n_neg),
        "auc_fp": np.int64(auc),
    }])


ORACLES["roc_auc"] = """
    WITH e AS (
        SELECT vec_id, gs - 1 AS j,
               CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                    AS BIGINT) AS efp
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(gs)
    ),
    l1 AS (
        SELECT vec_id,
               CAST(sum(efp * (((j * 31 + 17) % 7) - 3)) AS BIGINT) AS s
        FROM e GROUP BY vec_id
    ),
    q AS (
        SELECT l1.vec_id,
               s // 1000000 - CASE WHEN s % 1000000 <> 0 AND s < 0
                                   THEN 1 ELSE 0 END AS b,
               CAST(emb.label % 2 AS BIGINT) AS y
        FROM l1 JOIN embeddings emb ON emb.vec_id = l1.vec_id
    ),
    h AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS p
          FROM q GROUP BY b),
    w AS (
        SELECT b, n, p,
               COALESCE(sum(n) OVER (ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS c
        FROM h
    ),
    s AS (SELECT CAST(sum(p * (2 * c + n + 1)) AS BIGINT) AS s2,
                 CAST(sum(p) AS BIGINT) AS np,
                 CAST(sum(n - p) AS BIGINT) AS nn
          FROM w)
    SELECT np AS n_pos, nn AS n_neg,
           CAST(1000000 * (CAST(s2 AS HUGEINT) - CAST(np AS HUGEINT)
                           * (np + 1))
                // (2 * CAST(np AS HUGEINT) * nn) AS BIGINT) AS auc_fp
    FROM s
"""


def q_interval_scheduling(sf_dir):
    """Maximum non-overlapping interval set per user (earliest-end
    greedy — provably optimal; the capacity-planning / session-
    scheduling classic and a THIRD data-dependent chain next to
    ttl_dedup and clamped_balance, with an end-time recurrence instead
    of a fixed TTL): intervals are [ts, ts + value µs-quantized
    seconds) — the duration is max(round(value·10⁶), 1) µs, clamped
    STRICTLY positive on BOTH sides (a zero-length interval satisfies
    its own start ≥ end and traps the oracle's LATERAL chain in a
    self-loop; sf0.1 has 6 events with value = 0.0, which the
    pre-clamp assert caught in the scale sweep; with dur > 0 the kept
    end strictly increases, so both walks terminate); the chain
    keeps an interval iff its start ≥ the last kept interval's end,
    scanning in (end, event_id) order. Back-to-back touching intervals
    (start == previous end) are compatible — the ≥ rule is pinned on
    both sides. Plan: one splitmix64(user) % P shuffle, per-user walk
    over end-sorted arrays (O(n) after the partition sort). Oracle:
    the ttl_dedup-style RECURSIVE LATERAL next-compatible probe.
    Output per user: intervals kept, total busy µs."""
    from ..functions.sketches import _splitmix64

    P = 64
    ev = T(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def _part(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        st = _ts_ns(b["ts"]) // 1_000
        dur = np.maximum(_round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64), 1)
        return pa.table({
            "user_id": b["user_id"], "event_id": b["event_id"],
            "st": pa.array(st, pa.int64()),
            "en": pa.array(st + dur, pa.int64()),
            "part": pa.array((_splitmix64(u) % np.uint64(P))
                             .astype(np.int64)),
        })

    def _greedy(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "en", "event_id"],
                          kind="mergesort")
        out = []
        for u, grp in g.groupby("user_id", sort=False):
            st = grp["st"].to_numpy(np.int64)
            en = grp["en"].to_numpy(np.int64)
            cur = np.int64(-2 ** 62)
            n_kept = 0
            busy = 0
            for i in range(len(st)):
                if st[i] >= cur:
                    n_kept += 1
                    busy += int(en[i] - st[i])
                    cur = en[i]
            out.append({"user_id": np.int64(u),
                        "n_scheduled": np.int64(n_kept),
                        "busy_us": np.int64(busy)})
        return pd.DataFrame(out)

    return ev.map_batches(_part, batch_format="pyarrow") \
        .groupby("part").map_groups(_greedy, batch_format="pandas") \
        .select_columns(["user_id", "n_scheduled", "busy_us"])


ORACLES["interval_scheduling"] = """
    WITH RECURSIVE iv AS (
        SELECT user_id, event_id, epoch_us(ts) AS st,
               epoch_us(ts) + greatest(
                   CAST(round(value * 1000000) AS BIGINT), 1) AS en
        FROM events
    ),
    k AS (
        SELECT user_id, event_id, st, en
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY en, event_id) AS rn
              FROM iv)
        WHERE rn = 1
        UNION ALL
        SELECT n.user_id, n.event_id, n.st, n.en
        FROM k, LATERAL (
            SELECT user_id, event_id, st, en FROM iv
            WHERE iv.user_id = k.user_id AND iv.st >= k.en
            ORDER BY en, event_id LIMIT 1
        ) n
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_scheduled,
           CAST(sum(en - st) AS BIGINT) AS busy_us
    FROM k GROUP BY user_id
"""


def q_cohens_kappa(sf_dir, n_classes: int = 3):
    """Cohen's κ inter-rater agreement between the batch-inference
    scorer and the derived rater label % n_classes — the eval statistic
    that discounts chance agreement (the confusion_matrix companion).
    All-integer: with confusion counts c_ij, κ·10⁶ =
    10⁶·(N·Σc_ii − Σ_i r_i·c_i) // (N² − Σ_i r_i·c_i) where r/c are row
    and column marginals — one k×k exchange (the same fold as
    confusion_matrix), a driver finale over k² integers."""
    from .queries import q_batch_inference

    pred = q_batch_inference(sf_dir, n_classes)
    emb = T(sf_dir, "embeddings", ["vec_id", "label"])

    def _truth(b: pa.Table) -> pa.Table:
        return pa.table({
            "vid_r": b["vec_id"],
            "truth": pa.array(
                b["label"].to_numpy(zero_copy_only=False)
                .astype(np.int64) % n_classes, pa.int64()),
        })

    j = pred.join(emb.map_batches(_truth, batch_format="pyarrow"),
                  "inner", num_partitions=4,
                  on=("vec_id",), right_on=("vid_r",))
    cm = fast_groupby_agg(
        j, ["truth", "pred"], {"c": (None, "count")}).to_pandas()
    mat = np.zeros((n_classes, n_classes), np.int64)
    for t, p, c in zip(cm["truth"], cm["pred"], cm["c"]):
        mat[int(t), int(p)] = int(c)
    n = int(mat.sum())
    agree = int(np.trace(mat))
    chance = int((mat.sum(axis=1).astype(object)
                  * mat.sum(axis=0).astype(object)).sum())
    denom = n * n - chance
    kappa = (1_000_000 * (n * agree - chance) // denom) if denom else 0
    return pd.DataFrame([{
        "n": np.int64(n), "n_agree": np.int64(agree),
        "chance_mass": np.int64(chance),
        "kappa_fp": np.int64(kappa),
    }])


ORACLES["cohens_kappa"] = """
    WITH e AS (
        SELECT vec_id, gs - 1 AS j,
               CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                    AS BIGINT) AS efp
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(gs)
    ),
    l AS (
        SELECT vec_id, c,
               CAST(sum(efp * (((j * 31 + c * 17) % 7) - 3))
                    AS BIGINT) AS logit_fp
        FROM e, unnest(generate_series(0, 2)) AS cc(c)
        GROUP BY vec_id, c
    ),
    r AS (
        SELECT vec_id, c, row_number() OVER (
            PARTITION BY vec_id ORDER BY logit_fp DESC, c) AS rn
        FROM l
    ),
    p AS (
        SELECT r.vec_id, CAST(r.c AS BIGINT) AS pred,
               CAST(emb.label % 3 AS BIGINT) AS truth
        FROM r JOIN embeddings emb ON emb.vec_id = r.vec_id
        WHERE rn = 1
    ),
    m AS (SELECT truth, pred, CAST(count(*) AS BIGINT) AS c
          FROM p GROUP BY truth, pred),
    tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CASE WHEN truth = pred THEN c ELSE 0 END)
                    AS BIGINT) AS agree,
               CAST((SELECT sum(rm.r_n * cm.c_n) FROM
                     (SELECT truth AS k, sum(c) AS r_n FROM m
                      GROUP BY truth) rm
                     JOIN
                     (SELECT pred AS k, sum(c) AS c_n FROM m
                      GROUP BY pred) cm
                     ON cm.k = rm.k) AS BIGINT) AS chance
        FROM m
    )
    SELECT n, agree AS n_agree, chance AS chance_mass,
           CASE WHEN n * n - chance <> 0 THEN CAST(
                1000000 * (CAST(n AS HUGEINT) * agree - chance)
                // (CAST(n AS HUGEINT) * n - chance)
                - CASE WHEN (1000000 * (CAST(n AS HUGEINT) * agree
                                        - chance))
                            % (CAST(n AS HUGEINT) * n - chance) <> 0
                        AND 1000000 * (CAST(n AS HUGEINT) * agree
                                       - chance) < 0
                       THEN 1 ELSE 0 END AS BIGINT)
                ELSE 0 END AS kappa_fp
    FROM tot
"""


def q_type_token_ratio(sf_dir):
    """Per-source lexical diversity: type–token ratio (distinct words /
    total words, ×10⁶ floor) — the quick corpus-health statistic next
    to the Gopher rules. Distinct (source, word) collapses map-side
    before the count (the A-Priori discipline), so the exchange is
    vocabulary-sized, never token-sized."""
    ds = T(sf_dir, "documents", ["source", "text"])

    def _tok(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        src = b["source"].to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(len(src)), lens)
        return pa.table({
            "source": pa.array(src[rep]),
            "word": pc.list_flatten(words),
        })

    toks = ds.map_batches(_tok, batch_format="pyarrow")
    total = fast_groupby_agg(toks, ["source"],
                             {"n_tokens": (None, "count")}).to_pandas()
    per_word = fast_groupby_agg(toks, ["source", "word"],
                                {"_n": (None, "count")})
    types = fast_groupby_agg(per_word, ["source"],
                             {"n_types": (None, "count")}).to_pandas()
    out = total.merge(types, on="source").sort_values("source")
    out["ttr_fp"] = (out["n_types"] * 1_000_000
                     // out["n_tokens"]).astype(np.int64)
    return out.reset_index(drop=True)


ORACLES["type_token_ratio"] = """
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT word) AS BIGINT) AS n_types
        FROM tok GROUP BY source
    )
    SELECT source, n_tokens, n_types,
           CAST(n_types * 1000000 // n_tokens AS BIGINT) AS ttr_fp
    FROM s
"""


def q_rare_label_collapse(sf_dir):
    """Rare-category collapse (feature-engineering's OTHER bucket):
    part types BELOW the mean type count fold into 'OTHER' (the
    threshold is scale-free — n·n_types ≥ total keeps a type — per the
    q11 lesson that fixed fractions degenerate across sf), and the
    recount conserves total mass. Plan: one type-domain groupby, a
    driver-side threshold over the bounded type domain broadcast back
    as a frozenset, one recount groupby — the standard two-pass
    rare-label encoder."""
    ds = T(sf_dir, "part", ["p_type"])
    counts = fast_groupby_agg(ds, ["p_type"],
                              {"n": (None, "count")}).to_pandas()
    total = int(counts["n"].sum())
    n_types = len(counts)
    keep = frozenset(
        counts.loc[counts["n"] * n_types >= total, "p_type"])
    keep_ref = ray.put(keep)

    def _collapse(b: pa.Table) -> pa.Table:
        k = ray.get(keep_ref)
        t = b["p_type"].to_numpy(zero_copy_only=False)
        lab = np.where(np.isin(t, list(k)), t, "OTHER")
        return pa.table({"label": pa.array(lab.tolist(), pa.string())})

    out = fast_groupby_agg(
        ds.map_batches(_collapse, batch_format="pyarrow"),
        ["label"], {"n": (None, "count")})
    return out


ORACLES["rare_label_collapse"] = """
    WITH c AS (SELECT p_type, count(*) AS n FROM part GROUP BY p_type),
    t AS (SELECT sum(n) AS total, count(*) AS n_types FROM c),
    lab AS (
        SELECT CASE WHEN c.n * t.n_types >= t.total
                    THEN p.p_type ELSE 'OTHER' END AS label
        FROM part p JOIN c ON c.p_type = p.p_type, t
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n FROM lab GROUP BY label
"""


def q_arrow_ipc_roundtrip(sf_dir):
    """Arrow IPC (Feather v2) source/sink round trip — the fourth
    interchange format after JSONL/CSV and ORC: orders stream to
    sharded .arrow files (one per block via pyarrow.ipc inside
    map_batches — zero-copy columnar, THE format for handing batches
    to Arrow-native consumers), the shards read back one-task-per-file
    from the paths Dataset (the partitioned, resumable layout), and
    per-status counts plus integer checksums prove the trip
    value-faithful against an oracle that never touches IPC."""
    import shutil
    import tempfile
    import uuid

    out = tempfile.mkdtemp(prefix="fcray_ipc_")
    try:
        def _write(b: pa.Table) -> pa.Table:
            import pyarrow.ipc as ipc

            t = pa.table({
                "o_orderkey": b["o_orderkey"],
                "o_orderstatus": b["o_orderstatus"],
                "price_fp": pa.array(_round_half_away(
                    b["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64), pa.int64()),
            })
            path = f"{out}/{uuid.uuid4().hex}.arrow"
            with ipc.new_file(path, t.schema) as w:
                w.write_table(t)
            return pa.table({"path": pa.array([path], pa.string())})

        paths = T(sf_dir, "orders",
                  ["o_orderkey", "o_orderstatus", "o_totalprice"]
                  ).map_batches(_write, batch_format="pyarrow") \
            .materialize()

        def _read(b: pa.Table) -> pa.Table:
            import pyarrow.ipc as ipc

            tabs = []
            for p in b["path"].to_pylist():
                with ipc.open_file(p) as r:
                    tabs.append(r.read_all())
            return pa.concat_tables(tabs)

        rows = paths.map_batches(_read, batch_format="pyarrow")
        agg = fast_groupby_agg(rows, ["o_orderstatus"], {
            "n": (None, "count"),
            "price_sum_fp": ("price_fp", "sum"),
            "key_sum": ("o_orderkey", "sum"),
        })
        return agg.to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


ORACLES["arrow_ipc_roundtrip"] = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS price_sum_fp,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders GROUP BY o_orderstatus
"""


def q_npy_roundtrip(sf_dir):
    """NumPy .npy source/sink round trip — the tensor-interchange
    format (what embedding dumps and checkpoint shards actually ship
    as): the embeddings matrix quantizes ×10⁶ to int64, streams to one
    .npy shard per block, reads back via ``ray.data.read_numpy`` (the
    native Ray tensor source), and integer column checksums prove the
    trip value-faithful against an oracle that recomputes them from
    the parquet list column directly."""
    import shutil
    import tempfile
    import uuid

    import ray.data as rd

    out = tempfile.mkdtemp(prefix="fcray_npy_")
    try:
        def _write(b: pa.Table) -> pa.Table:
            from ..functions import ann as ANN

            m = ANN._to_matrix(b["embedding"]).astype(np.float64)
            q = _round_half_away(m * 1e6).astype(np.int64)
            path = f"{out}/{uuid.uuid4().hex}.npy"
            np.save(path, q)
            return pa.table({"path": pa.array([path], pa.string())})

        T(sf_dir, "embeddings", ["embedding"]).map_batches(
            _write, batch_format="pyarrow").materialize()
        back = rd.read_numpy(f"{out}/")

        def _fold(b: pa.Table) -> pa.Table:
            col = b["data"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # read_numpy yields Ray's ArrowTensorArray extension column
            m = col.to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "n_rows": pa.array([m.shape[0]], pa.int64()),
                "sum_all": pa.array([int(m.astype(object).sum())],
                                    pa.int64()),
                "sum_abs": pa.array(
                    [int(np.abs(m).astype(object).sum())], pa.int64()),
            })

        parts = back.map_batches(_fold, batch_format="pyarrow") \
            .to_pandas()
        return pd.DataFrame([{
            "n_rows": np.int64(parts["n_rows"].sum()),
            "sum_all": np.int64(parts["sum_all"].sum()),
            "sum_abs": np.int64(parts["sum_abs"].sum()),
        }])
    finally:
        shutil.rmtree(out, ignore_errors=True)


ORACLES["npy_roundtrip"] = """
    WITH e AS (
        SELECT CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS q,
               vec_id
        FROM embeddings
    )
    SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_rows,
           CAST(sum(q) AS BIGINT) AS sum_all,
           CAST(sum(abs(q)) AS BIGINT) AS sum_abs
    FROM e
"""


def q_inference_margin(sf_dir, n_classes: int = 3, band_fp: int = 10**9):
    """Top-1 − top-2 logit margin histogram of the batch-inference
    scorer — the model-confidence profile that drives abstention /
    active-learning thresholds: exact integer logits (the
    confusion_matrix scorer), margin = best − second, banded by one
    integer floor division. One actor-pool inference pass + a
    band-domain groupby."""
    ds = T(sf_dir, "embeddings", ["vec_id", "embedding"])

    class _Margin:
        def __init__(self):
            self.W: np.ndarray | None = None
            self.C = n_classes

        def __call__(self, b: pa.Table) -> pa.Table:
            from ..functions import ann as ANN

            m = ANN._to_matrix(b["embedding"]).astype(np.float64)
            if self.W is None:
                j = np.arange(m.shape[1])[:, None]
                c = np.arange(self.C)[None, :]
                self.W = ((j * 31 + c * 17) % 7 - 3).astype(np.int64)
            efp = _round_half_away(m * 1e6).astype(np.int64)
            logits = efp @ self.W
            part = np.sort(logits, axis=1)
            margin = part[:, -1] - part[:, -2]  # ≥ 0 by construction
            return pa.table({
                "band": pa.array(margin // band_fp, pa.int64()),
            })

    return fast_groupby_agg(
        ds.map_batches(_Margin, batch_format="pyarrow",
                       batch_size=4096, concurrency=(1, 4)),
        ["band"], {"n": (None, "count")})


ORACLES["inference_margin"] = """
    WITH e AS (
        SELECT vec_id, gs - 1 AS j,
               CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                    AS BIGINT) AS efp
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(gs)
    ),
    l AS (
        SELECT vec_id, c,
               CAST(sum(efp * (((j * 31 + c * 17) % 7) - 3))
                    AS BIGINT) AS logit_fp
        FROM e, unnest(generate_series(0, 2)) AS cc(c)
        GROUP BY vec_id, c
    ),
    r AS (
        SELECT vec_id, logit_fp, row_number() OVER (
            PARTITION BY vec_id ORDER BY logit_fp DESC) AS rn
        FROM l
    ),
    m AS (
        SELECT a.vec_id, (a.logit_fp - b.logit_fp) // 1000000000 AS band
        FROM (SELECT * FROM r WHERE rn = 1) a
        JOIN (SELECT * FROM r WHERE rn = 2) b ON b.vec_id = a.vec_id
    )
    SELECT band, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY band
"""


def q_fair_share_alloc(sf_dir):
    """Max-min fair (water-filling) quota allocation — the multi-tenant
    scheduling primitive: each source demands its document count, the
    capacity is half the corpus, and the allocation saturates small
    demanders while splitting the rest at a common water level. The
    level is found EXACTLY on the sorted demands: the first k where
    remaining ≤ (n−k)·d_{k+1} fixes level = remaining // (n−k), and
    the integer remainder goes to the LEXICOGRAPHICALLY FIRST
    unsaturated sources (pinned largest-remainder discipline, like
    apportion_quota). Conservation Σ alloc = capacity is asserted
    in-query. The distributed part is one source-domain groupby; the
    walk runs on the bounded domain. Mirrored in SQL by window
    cumulative sums over the same sort."""
    docs = T(sf_dir, "documents", ["source"])
    dem = fast_groupby_agg(docs, ["source"],
                           {"demand": (None, "count")}).to_pandas()
    dem = dem.sort_values(["demand", "source"]).reset_index(drop=True)
    d = dem["demand"].to_numpy(np.int64)
    n = len(d)
    cap = int(d.sum()) // 2
    alloc = np.zeros(n, np.int64)
    remaining = cap
    level = 0
    k = 0
    while k < n:
        if d[k] * (n - k) <= remaining:
            alloc[k] = d[k]
            remaining -= int(d[k])
            k += 1
        else:
            level = remaining // (n - k)
            extra = remaining % (n - k)
            # unsaturated sources get the level; the remainder goes to
            # the lexicographically first among them
            unsat = dem.iloc[k:].sort_values("source")
            bonus_idx = set(unsat.index[:extra])
            for i in range(k, n):
                alloc[i] = level + (1 if i in bonus_idx else 0)
            break
    dem["alloc"] = alloc
    dem["saturated"] = dem["alloc"] == dem["demand"]
    assert int(dem["alloc"].sum()) == cap
    assert (dem["alloc"] <= dem["demand"]).all()
    return dem.sort_values("source").reset_index(drop=True)[
        ["source", "demand", "alloc", "saturated"]]


ORACLES["fair_share_alloc"] = """
    WITH dem AS (
        SELECT source, CAST(count(*) AS BIGINT) AS demand
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(demand) // 2 AS cap, count(*) AS n FROM dem),
    s AS (
        SELECT source, demand,
               row_number() OVER (ORDER BY demand, source) AS rn,
               COALESCE(sum(demand) OVER (ORDER BY demand, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum_before
        FROM dem
    ),
    -- a row is SATURATED iff its full demand fits the max-min rule:
    -- demand*(n-rn+1) <= cap - cum_before
    flagged AS (
        SELECT s.*, t.cap, t.n,
               demand * (t.n - rn + 1) <= t.cap - cum_before
                   AS saturated
        FROM s, tot t
    ),
    lvl AS (
        SELECT
            COALESCE(sum(CASE WHEN saturated THEN demand END), 0)
                AS sat_mass,
            COALESCE(sum(CASE WHEN saturated THEN 1 ELSE 0 END), 0)
                AS n_sat,
            max(cap) AS cap, max(n) AS n
        FROM flagged
    ),
    lv AS (
        SELECT sat_mass, n_sat, cap, n,
               CASE WHEN n > n_sat
                    THEN (cap - sat_mass) // (n - n_sat) ELSE 0 END
                   AS level,
               CASE WHEN n > n_sat
                    THEN (cap - sat_mass) % (n - n_sat) ELSE 0 END
                   AS extra
        FROM lvl
    ),
    unsat_rank AS (
        SELECT f.source,
               row_number() OVER (ORDER BY f.source) AS ur
        FROM flagged f WHERE NOT f.saturated
    )
    SELECT f.source, f.demand,
           CAST(CASE WHEN f.saturated THEN f.demand
                     ELSE lv.level
                          + CASE WHEN u.ur <= lv.extra THEN 1 ELSE 0
                            END
                END AS BIGINT) AS alloc,
           f.saturated
    FROM flagged f
    LEFT JOIN unsat_rank u ON u.source = f.source, lv
"""


def q_minmax_scale(sf_dir):
    """Per-source min-max feature scaling audit (the [0,1] normalizer
    of classic feature pipelines, as an exact integer): each
    document's n_chars maps to (x − min)·10⁶ // (max − min) within its
    source; the audit returns per-source min/max plus the scaled-value
    sum and extremes (0 and 10⁶ must both be attained — asserted).
    Plan: one source-domain groupby for the bounds, broadcast back as
    dicts, one vectorized rescale + per-source fold. Degenerate
    single-value sources pin to 0 (both sides)."""
    ds = T(sf_dir, "documents", ["source", "n_chars"])
    bounds = fast_groupby_agg(ds, ["source"], {
        "lo": ("n_chars", "min"), "hi": ("n_chars", "max"),
    }).to_pandas()
    lo = dict(zip(bounds["source"], bounds["lo"].astype(int)))
    hi = dict(zip(bounds["source"], bounds["hi"].astype(int)))
    lo_ref, hi_ref = ray.put(lo), ray.put(hi)

    def _scale(b: pa.Table) -> pa.Table:
        lo_d, hi_d = ray.get(lo_ref), ray.get(hi_ref)
        src = b["source"].to_numpy(zero_copy_only=False)
        x = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        l = np.array([lo_d[s] for s in src], np.int64)
        h = np.array([hi_d[s] for s in src], np.int64)
        rng = np.maximum(h - l, 1)
        scaled = np.where(h > l, (x - l) * 1_000_000 // rng, 0)
        return pa.table({
            "source": b["source"],
            "scaled": pa.array(scaled.astype(np.int64)),
        })

    out = fast_groupby_agg(
        ds.map_batches(_scale, batch_format="pyarrow"), ["source"], {
            "n": (None, "count"),
            "scaled_sum": ("scaled", "sum"),
            "scaled_min": ("scaled", "min"),
            "scaled_max": ("scaled", "max"),
        }).to_pandas().sort_values("source").reset_index(drop=True)
    assert (out["scaled_min"] == 0).all()
    assert ((out["scaled_max"] == 1_000_000)
            | (out["scaled_max"] == 0)).all()
    return out


ORACLES["minmax_scale"] = """
    WITH b AS (
        SELECT source, min(n_chars) AS lo, max(n_chars) AS hi
        FROM documents GROUP BY source
    ),
    s AS (
        SELECT d.source,
               CASE WHEN b.hi > b.lo
                    THEN (d.n_chars - b.lo) * 1000000 // (b.hi - b.lo)
                    ELSE 0 END AS scaled
        FROM documents d JOIN b ON b.source = d.source
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(scaled) AS BIGINT) AS scaled_sum,
           CAST(min(scaled) AS BIGINT) AS scaled_min,
           CAST(max(scaled) AS BIGINT) AS scaled_max
    FROM s GROUP BY source
"""


def q_length_hist_overlap(sf_dir, band: int = 100, top: int = 15):
    """Histogram-intersection similarity between sources' document-
    length distributions — the corpus-profiling statistic behind
    'which sources look alike' (mixture design, dedup triage):
    overlap(a,b) = Σ_band min(p_a, p_b) computed EXACTLY over the
    common denominator N_a·N_b (×10⁶ one floor division per pair —
    no float probabilities). The distributed part is one
    (source × band) groupby; the pairwise fold runs on that bounded
    domain (|sources|² × bands). Output: top pairs by overlap."""
    ds = T(sf_dir, "documents", ["source", "n_chars"])

    def _band(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b["source"],
            "band": pa.array(
                b["n_chars"].to_numpy(zero_copy_only=False)
                .astype(np.int64) // band),
        })

    h = fast_groupby_agg(
        ds.map_batches(_band, batch_format="pyarrow"),
        ["source", "band"], {"n": (None, "count")}).to_pandas()
    piv = h.pivot_table(index="band", columns="source", values="n",
                        fill_value=0, aggfunc="sum").astype(np.int64)
    totals = piv.sum(axis=0).astype(np.int64)
    srcs = sorted(piv.columns)
    rows = []
    for i, a in enumerate(srcs):
        for b_ in srcs[i + 1:]:
            na, nb = int(totals[a]), int(totals[b_])
            inter = int(np.minimum(
                piv[a].to_numpy(object) * nb,
                piv[b_].to_numpy(object) * na).sum())
            rows.append({
                "source_a": a, "source_b": b_,
                "overlap_fp": np.int64(1_000_000 * inter // (na * nb)),
            })
    out = pd.DataFrame(rows).sort_values(
        ["overlap_fp", "source_a", "source_b"],
        ascending=[False, True, True]).head(top)
    return out.reset_index(drop=True)


ORACLES["length_hist_overlap"] = """
    WITH h AS (
        SELECT source, n_chars // 100 AS band,
               CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY source, band
    ),
    tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt
            FROM h GROUP BY source),
    pairs AS (
        SELECT a.source AS sa, a.nt AS na, b.source AS sb, b.nt AS nb
        FROM tot a JOIN tot b ON a.source < b.source
    ),
    bands AS (SELECT DISTINCT band FROM h),
    grid AS (SELECT p.*, bd.band FROM pairs p, bands bd),
    j AS (
        SELECT g.sa, g.sb, g.na, g.nb,
               LEAST(COALESCE(ha.n, 0) * g.nb,
                     COALESCE(hb.n, 0) * g.na) AS m
        FROM grid g
        LEFT JOIN h ha ON ha.source = g.sa AND ha.band = g.band
        LEFT JOIN h hb ON hb.source = g.sb AND hb.band = g.band
    ),
    o AS (
        SELECT sa AS source_a, sb AS source_b,
               CAST(1000000 * sum(m) // (max(na) * max(nb)) AS BIGINT)
                   AS overlap_fp
        FROM j GROUP BY sa, sb, na, nb
    )
    SELECT source_a, source_b, overlap_fp FROM o
    ORDER BY overlap_fp DESC, source_a, source_b LIMIT 15
"""


def q_hapax_ratio(sf_dir):
    """Hapax-legomena profile per source — the share of vocabulary
    appearing exactly once (the Heaps'-law companion to
    type_token_ratio; a high hapax share predicts vocabulary growth
    and OCR/noise contamination). Same vocabulary-sized exchange as
    TTR: distinct (source, word) counts map-side, then a constant fold
    per source. ×10⁶ integer ratios."""
    ds = T(sf_dir, "documents", ["source", "text"])

    def _tok(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        src = b["source"].to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(len(src)), lens)
        return pa.table({
            "source": pa.array(src[rep]),
            "word": pc.list_flatten(words),
        })

    per_word = fast_groupby_agg(
        ds.map_batches(_tok, batch_format="pyarrow"),
        ["source", "word"], {"n": ("word", "count")})

    def _fold(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": b["source"],
            "t": pa.array(np.ones(len(n), np.int64)),
            "h": pa.array((n == 1).astype(np.int64)),
        })

    out = fast_groupby_agg(
        per_word.map_batches(_fold, batch_format="pyarrow"),
        ["source"], {"n_types": ("t", "sum"), "n_hapax": ("h", "sum")},
    ).to_pandas().sort_values("source").reset_index(drop=True)
    out["hapax_fp"] = (out["n_hapax"] * 1_000_000
                       // out["n_types"]).astype(np.int64)
    return out


ORACLES["hapax_ratio"] = """
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    v AS (SELECT source, word, count(*) AS n
          FROM tok GROUP BY source, word),
    s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax
        FROM v GROUP BY source
    )
    SELECT source, n_types, n_hapax,
           CAST(n_hapax * 1000000 // n_types AS BIGINT) AS hapax_fp
    FROM s
"""


def q_voptimal_histogram(sf_dir, n_buckets: int = 8, band: int = 10):
    """V-optimal histogram construction — the query-optimizer synopsis
    that beats equi-width/equi-depth on skew: partition the banded
    n_chars domain into B contiguous buckets minimizing total
    within-bucket SSE. Cost uses the integer floor form
    Σw·x² − (Σw·x)²//Σw, so the DP (O(bands²·B), on the driver over
    the BOUNDED band histogram from one groupby) is deterministic and
    library-free; ties break to the shortest right bucket (pinned by
    the strict `<` improvement test). Rows-only (a DP is not SQL), but
    the in-query asserts pin: buckets tile the domain, exactly B, and
    total cost never increases when B grows (checked vs B−1)."""
    ds = T(sf_dir, "documents", ["n_chars"])

    def _band(b: pa.Table) -> pa.Table:
        return pa.table({"band": pa.array(
            b["n_chars"].to_numpy(zero_copy_only=False)
            .astype(np.int64) // band)})

    h = fast_groupby_agg(
        ds.map_batches(_band, batch_format="pyarrow"),
        ["band"], {"w": (None, "count")}).to_pandas().sort_values("band")
    x = h["band"].to_numpy(np.int64)
    w = h["w"].to_numpy(np.int64)
    n = len(x)
    pw = np.concatenate([[0], np.cumsum(w)])
    pwx = np.concatenate([[0], np.cumsum(w * x)])
    pwx2 = np.concatenate([[0], np.cumsum(w * x * x)])

    def seg_cost(i: int, j: int) -> int:  # bands [i, j)
        sw = int(pw[j] - pw[i])
        sx = int(pwx[j] - pwx[i])
        sx2 = int(pwx2[j] - pwx2[i])
        return sx2 - sx * sx // sw

    def dp_solve(B: int):
        INF = float("inf")
        dp = [[INF] * (n + 1) for _ in range(B + 1)]
        back = [[0] * (n + 1) for _ in range(B + 1)]
        dp[0][0] = 0
        for b_ in range(1, B + 1):
            for j in range(1, n + 1):
                for i in range(b_ - 1, j):
                    if dp[b_ - 1][i] == INF:
                        continue
                    c = dp[b_ - 1][i] + seg_cost(i, j)
                    if c < dp[b_][j]:  # strict: ties keep LARGEST i
                        dp[b_][j], back[b_][j] = c, i
        cuts = [n]
        for b_ in range(B, 0, -1):
            cuts.append(back[b_][cuts[-1]])
        return dp[B][n], cuts[::-1]

    best, cuts = dp_solve(min(n_buckets, n))
    prev_cost, _ = dp_solve(min(n_buckets - 1, n)) \
        if min(n_buckets, n) > 1 else (best, None)
    assert best <= prev_cost  # more buckets never hurt
    rows = []
    for k in range(len(cuts) - 1):
        i, j = cuts[k], cuts[k + 1]
        rows.append({
            "bucket": np.int64(k),
            "band_lo": np.int64(x[i]),
            "band_hi": np.int64(x[j - 1]),
            "n_rows": np.int64(pw[j] - pw[i]),
            "sse_fp": np.int64(seg_cost(i, j)),
        })
    out = pd.DataFrame(rows)
    assert int(out["n_rows"].sum()) == int(pw[n])
    return out


_DAY_US = 86_400_000_000


def q_prorate_across_days(sf_dir):
    """Calendar proration — split each event's active interval
    [ts, ts + value seconds) across the calendar days it touches and
    account the EXACT microseconds per day (the billing/occupancy
    primitive; point-in-time sums get month boundaries wrong). The
    expansion is a vectorized flat-map (np.repeat + arange over the
    ≤2-day spans here, general for any span), overlap = min(en, day
    end) − max(st, day start), all integer µs; the exchange is the
    day-domain groupby. Total-mass conservation Σ us == Σ durations is
    asserted in-query. Oracle: LATERAL generate_series over the same
    day range with GREATEST/LEAST clipping."""
    ev = T(sf_dir, "events", ["ts", "value"])

    def _split(b: pa.Table) -> pa.Table:
        st = _ts_ns(b["ts"]) // 1_000
        dur = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        en = st + dur
        d0 = st // _DAY_US
        d1 = (en - 1) // _DAY_US
        nd = (d1 - d0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(st)), nd)
        starts = np.concatenate([[0], np.cumsum(nd)[:-1]])
        off = np.arange(int(nd.sum()), dtype=np.int64) - starts[rep]
        day = d0[rep] + off
        lo = np.maximum(st[rep], day * _DAY_US)
        hi = np.minimum(en[rep], (day + 1) * _DAY_US)
        return pa.table({
            "day": pa.array(day, pa.int64()),
            "us": pa.array(hi - lo, pa.int64()),
        })

    out = fast_groupby_agg(
        ev.map_batches(_split, batch_format="pyarrow"),
        ["day"], {"busy_us": ("us", "sum"), "n_spans": (None, "count")},
    ).to_pandas().sort_values("day").reset_index(drop=True)

    def _mass(b: pa.Table) -> pa.Table:
        dur = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        return pa.table({"m": pa.array([int(dur.sum())], pa.int64())})

    total = int(ev.map_batches(_mass, batch_format="pyarrow")
                .to_pandas()["m"].sum())
    assert int(out["busy_us"].sum()) == total
    return out


ORACLES["prorate_across_days"] = """
    WITH iv AS (
        SELECT epoch_us(ts) AS st,
               epoch_us(ts) + CAST(round(value * 1000000) AS BIGINT)
                   AS en
        FROM events
    ),
    ex AS (
        SELECT d.day,
               LEAST(iv.en, (d.day + 1) * 86400000000)
               - GREATEST(iv.st, d.day * 86400000000) AS us
        FROM iv, LATERAL (
            SELECT unnest(generate_series(
                iv.st // 86400000000,
                (iv.en - 1) // 86400000000)) AS day
        ) d
    )
    SELECT day, CAST(sum(us) AS BIGINT) AS busy_us,
           CAST(count(*) AS BIGINT) AS n_spans
    FROM ex GROUP BY day
"""


def q_selectivity_independence(sf_dir):
    """Optimizer-statistics audit: how wrong is the INDEPENDENCE
    assumption (sel(A∧B) ≈ sel(A)·sel(B) — what every cost-based
    planner assumes when it lacks multi-column statistics) for each
    pair of single-column predicates over orders. Actual and expected
    conjunction counts are exact integers (expected ×10⁶ =
    n_a·n_b·10⁶ // N); the signed error is expected − actual ×10⁶ //
    N·… kept as two exact columns instead of a ratio so zero-actual
    pairs stay well-defined. ONE vectorized scan emits all per-batch
    predicate and pair counts (constant-width partials), one
    constant-size groupby combines."""
    ds = T(sf_dir, "orders",
           ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    # predicate definitions (id → name) — evaluated identically in SQL
    names = ["status_F", "prio_urgent", "price_gt_150k"]

    def _preds(b: pa.Table):
        st = b["o_orderstatus"].to_numpy(zero_copy_only=False)
        pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
        return [st == "F", pr == "1-URGENT", tp > 150_000.0]

    def _fold(b: pa.Table) -> pa.Table:
        ms = _preds(b)
        pa_, pb_, na_, nb_, nab_, nt_ = [], [], [], [], [], []
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pa_.append(names[i])
                pb_.append(names[j])
                na_.append(int(ms[i].sum()))
                nb_.append(int(ms[j].sum()))
                nab_.append(int((ms[i] & ms[j]).sum()))
                nt_.append(len(ms[i]))
        return pa.table({
            "pred_a": pa.array(pa_, pa.string()),
            "pred_b": pa.array(pb_, pa.string()),
            "n_a": pa.array(na_, pa.int64()),
            "n_b": pa.array(nb_, pa.int64()),
            "n_and": pa.array(nab_, pa.int64()),
            "n": pa.array(nt_, pa.int64()),
        })

    agg = fast_groupby_agg(
        ds.map_batches(_fold, batch_format="pyarrow"),
        ["pred_a", "pred_b"], {
            "n_a": ("n_a", "sum"), "n_b": ("n_b", "sum"),
            "n_and": ("n_and", "sum"), "n": ("n", "sum"),
        }).to_pandas().sort_values(["pred_a", "pred_b"]) \
        .reset_index(drop=True)
    agg["expected_fp"] = (agg["n_a"].astype(object)
                          * agg["n_b"].astype(object) * 10**6
                          // agg["n"].astype(object)).astype(np.int64)
    agg["actual_fp"] = (agg["n_and"] * 10**6).astype(np.int64)
    return agg


ORACLES["selectivity_independence"] = """
    WITH m AS (
        SELECT CAST(o_orderstatus = 'F' AS BIGINT) AS p0,
               CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS p1,
               CAST(o_totalprice > 150000.0 AS BIGINT) AS p2
        FROM orders
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(p0) AS BIGINT) AS c0,
               CAST(sum(p1) AS BIGINT) AS c1,
               CAST(sum(p2) AS BIGINT) AS c2,
               CAST(sum(p0 * p1) AS BIGINT) AS c01,
               CAST(sum(p0 * p2) AS BIGINT) AS c02,
               CAST(sum(p1 * p2) AS BIGINT) AS c12
        FROM m
    )
    SELECT * FROM (
        SELECT 'status_F' AS pred_a, 'prio_urgent' AS pred_b,
               c0 AS n_a, c1 AS n_b, c01 AS n_and, n,
               CAST(CAST(c0 AS HUGEINT) * c1 * 1000000 // n AS BIGINT)
                   AS expected_fp,
               CAST(c01 * 1000000 AS BIGINT) AS actual_fp
        FROM s
        UNION ALL
        SELECT 'status_F', 'price_gt_150k',
               c0, c2, c02, n,
               CAST(CAST(c0 AS HUGEINT) * c2 * 1000000 // n AS BIGINT),
               CAST(c02 * 1000000 AS BIGINT)
        FROM s
        UNION ALL
        SELECT 'prio_urgent', 'price_gt_150k',
               c1, c2, c12, n,
               CAST(CAST(c1 AS HUGEINT) * c2 * 1000000 // n AS BIGINT),
               CAST(c12 * 1000000 AS BIGINT)
        FROM s
    )
"""


def q_repartition_invariance(sf_dir):
    """Engine-invariant audit: the same grouped aggregate computed
    under THREE different block layouts (engine default, 2 fat blocks,
    41 skinny blocks — 41 is prime, so block boundaries never align
    with any natural key period) must be IDENTICAL — the
    partial/combine monoid law every distributed aggregate relies on,
    surfaced as a driver-visible row instead of an assumption. Any
    nondeterministic kernel (float association order, per-block state
    leak) fails this row before it can corrupt a real pipeline."""
    import ray.data as rd

    path = os.path.join(sf_dir, "lineitem.parquet")

    def plan(nb):
        src = (T(sf_dir, "lineitem",
                 ["l_returnflag", "l_quantity", "l_extendedprice"])
               if nb is None else
               rd.read_parquet(path, columns=[
                   "l_returnflag", "l_quantity", "l_extendedprice"],
                   override_num_blocks=nb))

        def _fp(b: pa.Table) -> pa.Table:
            return pa.table({
                "flag": b["l_returnflag"],
                "qty_fp": pa.array(_round_half_away(
                    b["l_quantity"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)),
                "price_fp": pa.array(_round_half_away(
                    b["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)),
            })

        return fast_groupby_agg(
            src.map_batches(_fp, batch_format="pyarrow"), ["flag"], {
                "n": (None, "count"),
                "qty_sum": ("qty_fp", "sum"),
                "price_sum": ("price_fp", "sum"),
                "qty_min": ("qty_fp", "min"),
                "qty_max": ("qty_fp", "max"),
            }).to_pandas().sort_values("flag").reset_index(drop=True)

    base = plan(None)
    for nb in (2, 41):
        other = plan(nb)
        pd.testing.assert_frame_equal(base, other)
    return base


ORACLES["repartition_invariance"] = """
    SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                AS BIGINT) AS qty_sum,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS price_sum,
           CAST(min(CAST(round(l_quantity * 100) AS BIGINT))
                AS BIGINT) AS qty_min,
           CAST(max(CAST(round(l_quantity * 100) AS BIGINT))
                AS BIGINT) AS qty_max
    FROM lineitem GROUP BY l_returnflag
"""


def q_neyman_allocation(sf_dir, budget: int = 1000):
    """Neyman-optimal stratified sample allocation — the survey-design
    answer to 'how many docs per source should the eval sample take':
    n_h ∝ N_h·σ_h, which is EXACTLY √(N_h·Σx² − (Σx)²) (the integer
    N_h²·Var numerator), so the weight needs ONE IEEE sqrt of an exact
    integer — floor(sqrt) agrees bit-for-bit between numpy and DuckDB
    because int→double rounds half-even identically and IEEE sqrt is
    correctly rounded. Seats then fill by the apportion_quota
    largest-remainder discipline (ties to the lexicographically first
    source). Allocation conservation Σn_h = budget asserted in-query.
    One source-domain groupby; the apportionment runs on the bounded
    domain."""
    ds = T(sf_dir, "documents", ["source", "n_chars"])

    def _mom(b: pa.Table) -> pa.Table:
        x = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "source": b["source"],
            "one": pa.array(np.ones(len(x), np.int64)),
            "x": pa.array(x), "x2": pa.array(x * x),
        })

    g = fast_groupby_agg(
        ds.map_batches(_mom, batch_format="pyarrow"), ["source"], {
            "n_h": ("one", "sum"), "sx": ("x", "sum"),
            "sx2": ("x2", "sum"),
        }).to_pandas().sort_values("source").reset_index(drop=True)
    var_num = (g["n_h"].astype(object) * g["sx2"].astype(object)
               - g["sx"].astype(object) ** 2)
    w = np.array([math.floor(math.sqrt(float(v))) for v in var_num],
                 dtype=np.int64)
    W = int(w.sum())
    base = budget * w // W
    rem = budget * w % W
    leftover = budget - int(base.sum())
    order = sorted(range(len(g)),
                   key=lambda i: (-int(rem[i]), g["source"][i]))
    alloc = base.copy()
    for i in order[:leftover]:
        alloc[i] += 1
    g["weight"] = w
    g["alloc"] = alloc.astype(np.int64)
    assert int(g["alloc"].sum()) == budget
    return g[["source", "n_h", "weight", "alloc"]]


ORACLES["neyman_allocation"] = """
    WITH m AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_h,
               CAST(sum(n_chars) AS BIGINT) AS sx,
               CAST(sum(CAST(n_chars AS HUGEINT) * n_chars)
                    AS DECIMAL(38,0)) AS sx2
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_h,
               CAST(floor(sqrt(CAST(CAST(n_h AS HUGEINT) * sx2
                                    - CAST(sx AS HUGEINT) * sx
                                    AS DOUBLE))) AS BIGINT) AS weight
        FROM m
    ),
    t0 AS (SELECT CAST(sum(weight) AS BIGINT) AS tw FROM w),
    t AS (SELECT t0.tw,
                 (SELECT CAST(sum(1000 * weight // t0.tw) AS BIGINT)
                  FROM w) AS base_sum
          FROM t0),
    b AS (
        SELECT w.source, w.n_h, w.weight,
               1000 * w.weight // t.tw AS base,
               1000 * w.weight % t.tw AS rem,
               row_number() OVER (ORDER BY 1000 * w.weight % t.tw DESC,
                                  w.source) AS pri,
               1000 - t.base_sum AS leftover
        FROM w, t
    )
    SELECT source, n_h, weight,
           CAST(base + CASE WHEN pri <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM b
"""


def q_term_burstiness(sf_dir, top: int = 20):
    """Term burstiness — the variance-to-mean ratio of per-document
    term counts (Church & Gale's content-word detector: function words
    scatter ~Poisson with VMR ≈ 1, topical words clump with VMR ≫ 1)
    for the corpus' top terms, EXACT: with per-doc counts c over N
    docs (zeros included via the moment identity), VMR·10⁶ =
    10⁶·(N·Σc² − (Σc)²) // (N·Σc). Tokens explode vectorized; the
    (doc, term) fold collapses map-side; the final exchange is
    term-domain-sized."""
    ds = T(sf_dir, "documents", ["doc_id", "text"])
    n_docs = int(ds.count())

    def _tok(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(len(did)), lens)
        return pa.table({
            "doc_id": pa.array(did[rep], pa.int64()),
            "term": pc.list_flatten(words),
        })

    per_doc = fast_groupby_agg(
        ds.map_batches(_tok, batch_format="pyarrow"),
        ["term", "doc_id"], {"c": ("term", "count")})

    def _mom(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        return pa.table({
            "term": b["term"],
            "s1": pa.array(c.astype(np.int64)),
            "s2": pa.array((c * c).astype(np.int64)),
            "df": pa.array(np.ones(len(c), np.int64)),
        })

    mom = fast_groupby_agg(
        per_doc.map_batches(_mom, batch_format="pyarrow"),
        ["term"], {"s1": ("s1", "sum"), "s2": ("s2", "sum"),
                   "df": ("df", "sum")}).to_pandas()
    mom = mom.sort_values(["s1", "term"],
                          ascending=[False, True]).head(top)
    s1 = mom["s1"].astype(object)
    s2 = mom["s2"].astype(object)
    mom["vmr_fp"] = np.array(
        [int(1_000_000 * (n_docs * b - a * a) // (n_docs * a))
         for a, b in zip(s1, s2)], dtype=np.int64)
    return mom.reset_index(drop=True)


ORACLES["term_burstiness"] = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    pd AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY term, doc_id),
    m AS (
        SELECT term, CAST(sum(c) AS BIGINT) AS s1,
               CAST(sum(c * c) AS BIGINT) AS s2,
               CAST(count(*) AS BIGINT) AS df
        FROM pd GROUP BY term
    ),
    n AS (SELECT count(*) AS nd FROM documents)
    SELECT term, s1, s2, df,
           CAST(1000000 * (CAST(n.nd AS HUGEINT) * s2
                           - CAST(s1 AS HUGEINT) * s1)
                // (CAST(n.nd AS HUGEINT) * s1) AS BIGINT) AS vmr_fp
    FROM m, n
    ORDER BY s1 DESC, term LIMIT 20
"""


def q_bag_set_ops(sf_dir):
    """Bag-semantics set algebra — EXCEPT ALL / INTERSECT ALL
    multiplicities (the set_union/set_except suite is SET-semantics;
    bags are what dedup accounting actually needs): between the
    multisets of (status, priority) pairs from 1996 vs 1997 orders,
    per-key m_except = max(a−b, 0), m_intersect = min(a, b), plus both
    input multiplicities. Two map-side-combined groupbys per side fold
    into ONE via a year indicator — a single exchange carries both
    bags."""
    ds = T(sf_dir, "orders",
           ["o_orderstatus", "o_orderpriority", "o_orderdate"])

    def _fold(b: pa.Table) -> pa.Table:
        yr = pd.to_datetime(
            b["o_orderdate"].to_pandas()).dt.year.to_numpy(np.int64)
        keep = (yr == 1996) | (yr == 1997)
        t = pa.table({
            "o_orderstatus": b["o_orderstatus"],
            "o_orderpriority": b["o_orderpriority"],
            "a": pa.array((yr == 1996).astype(np.int64)),
            "b": pa.array((yr == 1997).astype(np.int64)),
        })
        return t.filter(pa.array(keep))

    g = fast_groupby_agg(
        ds.map_batches(_fold, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        {"n_a": ("a", "sum"), "n_b": ("b", "sum")}).to_pandas()
    g["m_except"] = np.maximum(g["n_a"] - g["n_b"], 0).astype(np.int64)
    g["m_intersect"] = np.minimum(g["n_a"], g["n_b"]).astype(np.int64)
    return g.sort_values(["o_orderstatus", "o_orderpriority"]) \
        .reset_index(drop=True)


ORACLES["bag_set_ops"] = """
    WITH f AS (
        SELECT o_orderstatus, o_orderpriority,
               year(o_orderdate) AS yr
        FROM orders WHERE year(o_orderdate) IN (1996, 1997)
    ),
    g AS (
        SELECT o_orderstatus, o_orderpriority,
               CAST(sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN yr = 1997 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b
        FROM f GROUP BY 1, 2
    )
    SELECT o_orderstatus, o_orderpriority, n_a, n_b,
           CAST(GREATEST(n_a - n_b, 0) AS BIGINT) AS m_except,
           CAST(LEAST(n_a, n_b) AS BIGINT) AS m_intersect
    FROM g
"""


def q_lttb_downsample(sf_dir, n_out: int = 30):
    """LTTB (largest-triangle-three-buckets) downsampling of the daily
    revenue series — the standard visual-fidelity reduction (Steinarsson
    2013): keep first and last points; each interior bucket keeps the
    point forming the LARGEST triangle with the previously kept point
    and the next bucket's centroid. All-integer: the centroid division
    is cleared by multiplying both candidate areas through by the next
    bucket's size, so comparisons are exact cross products (ties → the
    earliest day, pinned). The distributed part is the day-histogram
    exchange (time-span bounded); the anchor walk is sequential by
    construction and runs over that bounded domain. Rows-only (the
    anchor recurrence is not SQL), with shape invariants asserted
    in-query: endpoints kept, one point per bucket, days strictly
    increasing."""
    orders = T(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def _day(b: pa.Table) -> pa.Table:
        return pa.table({
            "d": pa.array(
                b["o_orderdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 86_400_000_000, pa.int64()),
            "v": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)),
        })

    vc = fast_groupby_agg(
        orders.map_batches(_day, batch_format="pyarrow"),
        ["d"], {"v": ("v", "sum")}).to_pandas().sort_values("d")
    x = vc["d"].to_numpy(np.int64)
    y = vc["v"].to_numpy(np.int64)
    n = len(x)
    if n <= n_out:
        out = pd.DataFrame({"d": x, "v": y})
        out["kept_rank"] = np.arange(len(out), dtype=np.int64)
        return out
    # bucket boundaries over the interior points (standard LTTB)
    edges = [1 + (n - 2) * k // (n_out - 2) for k in range(n_out - 1)]
    sel = [0]
    for k in range(n_out - 2):
        lo, hi = edges[k], edges[k + 1]
        if k + 1 < n_out - 2:
            nlo, nhi = edges[k + 1], edges[k + 2]
        else:
            nlo, nhi = n - 1, n
        m = nhi - nlo
        cx = int(x[nlo:nhi].sum())   # centroid × m
        cy = int(y[nlo:nhi].sum())
        a = sel[-1]
        ax, ay = int(x[a]), int(y[a])
        best_i, best_area = lo, -1
        for i in range(lo, hi):
            # 2·area·m: |(cx−m·ax)(y_i−ay) − (x_i−ax)(cy−m·ay)|
            area = abs((cx - m * ax) * (int(y[i]) - ay)
                       - (int(x[i]) - ax) * (cy - m * ay))
            if area > best_area:
                best_area, best_i = area, i
        sel.append(best_i)
    sel.append(n - 1)
    sel_a = np.array(sel, np.int64)
    assert sel_a[0] == 0 and sel_a[-1] == n - 1
    assert (np.diff(sel_a) > 0).all()
    assert len(sel_a) == n_out
    return pd.DataFrame({
        "d": x[sel_a], "v": y[sel_a],
        "kept_rank": np.arange(n_out, dtype=np.int64),
    })


def q_id_gap_report(sf_dir):
    """Sequence-gap report — the ingestion-completeness audit (missing
    event_id ranges reveal dropped batches): every maximal gap
    [gap_lo, gap_hi] strictly inside the observed id range. Plan: one
    distributed SORT by event_id, then gaps split into (a) block-LOCAL
    gaps found vectorized inside each sorted block and (b) BOUNDARY
    gaps stitched on the driver from the per-block (min, max) summary
    (block-count-sized — the only driver state). This is the general
    adjacent-pair-after-sort pattern: block-local work distributed,
    O(blocks) stitching. Oracle: lead() over the sorted distinct ids.
    Testdata event_ids are contiguous, so both sides drop ids
    divisible by 97 to plant deterministic gaps the audit must find."""

    def _drop_97(t: pa.Table) -> pa.Table:
        r = pc.subtract(t["event_id"],
                        pc.multiply(pc.divide(t["event_id"], 97), 97))
        return t.filter(pc.not_equal(r, 0))

    ds = T(sf_dir, "events", ["event_id"]).map_batches(
        _drop_97, batch_format="pyarrow")
    dids = fast_groupby_agg(ds, ["event_id"], {"_n": (None, "count")}) \
        .drop_columns(["_n"]).sort("event_id")

    @ray.remote
    def _block_gaps(t: pa.Table):
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return None, None, []
        d = np.diff(ids)
        pos = np.flatnonzero(d > 1)
        gaps = [(int(ids[p]) + 1, int(ids[p + 1]) - 1) for p in pos]
        return int(ids[0]), int(ids[-1]), gaps

    refs = [_block_gaps.remote(r) for r in dids.to_arrow_refs()]
    parts = [p for p in ray.get(refs) if p[0] is not None]
    parts.sort(key=lambda p: p[0])
    gaps: list = []
    for k, (lo, hi, inner) in enumerate(parts):
        if k > 0:
            prev_hi = parts[k - 1][1]
            if lo - prev_hi > 1:
                gaps.append((prev_hi + 1, lo - 1))
        gaps.extend(inner)
    gaps.sort()
    return pd.DataFrame({
        "gap_lo": pd.Series([g[0] for g in gaps], dtype=np.int64),
        "gap_hi": pd.Series([g[1] for g in gaps], dtype=np.int64),
        "width": pd.Series([g[1] - g[0] + 1 for g in gaps],
                           dtype=np.int64),
    })


ORACLES["id_gap_report"] = """
    WITH d AS (SELECT DISTINCT event_id FROM events
               WHERE event_id % 97 <> 0),
    l AS (
        SELECT event_id,
               lead(event_id) OVER (ORDER BY event_id) AS nxt
        FROM d
    )
    SELECT event_id + 1 AS gap_lo, nxt - 1 AS gap_hi,
           CAST(nxt - event_id - 1 AS BIGINT) AS width
    FROM l WHERE nxt IS NOT NULL AND nxt - event_id > 1
"""


def q_q5_local_supplier_volume(sf_dir, region: str = "ASIA",
                               year: int = 1996):
    """TPC-H Q5: revenue per nation from orders where the customer and
    the line item's supplier sit in the SAME nation of one region, one
    order year. Completes the engine's TPC-H set (Q5 was the one shape
    missing: a 6-table join closed by an equality between two
    DIFFERENT dimension attributes, c_nationkey = s_nationkey).

    Plan: nation⋈region prunes to the ≤25-key region nation set, which
    rides in closures (true fixed dimensions). Customer and supplier
    both GROW with data, so each attaches its nationkey via hash join
    — customer onto date-pruned orders (orders side pre-filtered to
    the year window at the read), supplier onto cents-folded lineitem.
    The same-nation equality is a vectorized post-join filter, and the
    final groupby is over ≤25 nation names. No fact-scale broadcast
    anywhere; two hash exchanges of pre-projected columns only."""
    nat = T(sf_dir, "nation",
            ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = T(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rk = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(rk)]
    keep_nk = set(int(k) for k in nat["n_nationkey"])
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    lo = np.datetime64(f"{year}-01-01").astype("datetime64[ns]").view("int64")
    hi = np.datetime64(f"{year + 1}-01-01").astype(
        "datetime64[ns]").view("int64")

    def _cust(b: pa.Table) -> pa.Table:
        m = np.isin(b["c_nationkey"].to_numpy(zero_copy_only=False),
                    list(keep_nk))
        t = b.filter(pa.array(m))
        return pa.table({"c_custkey": t["c_custkey"],
                         "cust_nk": pc.cast(t["c_nationkey"], pa.int64())})

    def _ord(b: pa.Table) -> pa.Table:
        d = _ts_ns(b["o_orderdate"])
        return b.filter(pa.array((d >= lo) & (d < hi)))

    oc = T(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(_ord, batch_format="pyarrow") \
        .select_columns(["o_orderkey", "o_custkey"]) \
        .join(T(sf_dir, "customer", ["c_custkey", "c_nationkey"])
              .map_batches(_cust, batch_format="pyarrow"),
              "inner", num_partitions=JOIN_PARTS,
              on=("o_custkey",), right_on=("c_custkey",))

    def _sup(b: pa.Table) -> pa.Table:
        m = np.isin(b["s_nationkey"].to_numpy(zero_copy_only=False),
                    list(keep_nk))
        t = b.filter(pa.array(m))
        return pa.table({"s_suppkey": t["s_suppkey"],
                         "supp_nk": pc.cast(t["s_nationkey"], pa.int64())})

    def _fold(b: pa.Table) -> pa.Table:
        fp = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0).astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "cents": pa.array(fp, pa.int64())})

    li = T(sf_dir, "lineitem",
           ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]) \
        .map_batches(_fold, batch_format="pyarrow") \
        .join(T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
              .map_batches(_sup, batch_format="pyarrow"),
              "inner", num_partitions=JOIN_PARTS,
              on=("l_suppkey",), right_on=("s_suppkey",))

    j = li.join(oc, "inner", num_partitions=JOIN_PARTS,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def _same_nation(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["supp_nk"], b["cust_nk"]))
        nk = t["supp_nk"].to_numpy(zero_copy_only=False)
        nm = pd.Series(nk).map(names).tolist()
        return pa.table({"n_name": pa.array(nm, pa.string()),
                         "cents": t["cents"]})

    out = fast_groupby_agg(
        j.map_batches(_same_nation, batch_format="pyarrow"),
        ["n_name"], {"revenue_fp": ("cents", "sum"),
                     "n_items": (None, "count")})
    return out.sort("n_name")


ORACLES["q5_local_supplier_volume"] = """
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                               * 100) AS BIGINT)) AS BIGINT) AS revenue_fp,
           count(*) AS n_items
    FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY n_name
"""


HITS_ITERS = 3
HITS_SCALE = 10 ** 9
HITS_MAX_SINGLE_EDGES = 5_000_000


@ray.remote
def _hits_task(n: int, iters: int, *tables: pa.Table) -> pa.Table:
    """Single-task HITS over the collected edge list — the small-graph
    tier (guard: HITS_MAX_SINGLE_EDGES)."""
    live = live_arrow(tables)
    t = pa.concat_tables(live)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    h = np.full(n, HITS_SCALE // n, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        ar = np.zeros(n, dtype=np.int64)
        np.add.at(ar, dst, h[src])
        a = ar // max(1, int(ar.sum()) // HITS_SCALE)
        hr = np.zeros(n, dtype=np.int64)
        np.add.at(hr, src, a[dst])
        h = hr // max(1, int(hr.sum()) // HITS_SCALE)
    return pa.table({
        "node": pa.array(np.arange(n, dtype=np.int64)),
        "hub_fp": pa.array(h, pa.int64()),
        "auth_fp": pa.array(a, pa.int64()),
    })


def q_hits_scores(sf_dir, iters: int = HITS_ITERS,
                  max_single_edges: int = HITS_MAX_SINGLE_EDGES):
    """HITS hubs & authorities over the derived order graph — the
    OTHER eigenvector-style link-analysis primitive next to
    q_pagerank, and unlike PageRank it alternates two propagation
    directions per round (auth pulls over in-edges, hub pulls back
    over out-edges). Runs entirely in ×10⁹ integer fixed point with
    DIVIDE-FIRST L1 normalization — x ← x_raw // max(1, Σx_raw // S)
    — so every intermediate stays ≤ |E|·S ≪ 2⁶³ (no big-product
    overflow, no float), results are summation-order independent, and
    the DuckDB oracle (the same recurrence unrolled, one CTE pair per
    iteration) matches bit for bit.

    Scale plan (above ``max_single_edges``): per iteration one hash
    join edges⋈h on src + groupby dst (authority pull), one hash join
    edges⋈a on dst + groupby src (hub pull), each followed by a
    left-outer join onto the node list; the two Σ/S normalizers are
    scalar aggregates. Nothing node- or edge-sized on the driver;
    both tiers pinned identical by test."""
    from ray.data.aggregate import Count, Max, Min

    cust = T(sf_dir, "customer", ["c_custkey"])
    dom = cust.aggregate(Min("c_custkey"), Max("c_custkey"), Count())
    n = dom["count()"]
    if dom["min(c_custkey)"] != 0 or dom["max(c_custkey)"] != n - 1:
        raise ValueError(
            f"hits needs dense 0-based c_custkey; got "
            f"[{dom['min(c_custkey)']}, {dom['max(c_custkey)']}] n={n}")
    edges = _pagerank_edges(sf_dir, n).materialize()
    import ray.data as rd

    if edges.count() <= max_single_edges:
        return rd.from_arrow_refs(
            [_hits_task.remote(n, iters, *edges.to_arrow_refs())])

    nodes = T(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: pa.table({"node": b["c_custkey"]}),
        batch_format="pyarrow").materialize()

    def _init(name):
        v = HITS_SCALE // n

        def _m(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": b["node"],
                name: pa.array(np.full(b.num_rows, v), pa.int64()),
            })
        return _m

    def _pull(vec, vec_col, join_on, group_by, out_col):
        """One propagation: edges ⋈ vec on ``join_on``, sum vec_col by
        ``group_by``, divide-first normalize, left-join onto nodes."""
        j = edges.join(vec, "inner", num_partitions=JOIN_PARTS,
                       on=(join_on,), right_on=("node",))
        raw = fast_groupby_agg(
            j.map_batches(
                lambda b: pa.table({"k": b[group_by], "v": b[vec_col]}),
                batch_format="pyarrow"),
            ["k"], {"s": ("v", "sum")}).materialize()
        den = max(1, int(raw.sum("s")) // HITS_SCALE)
        out = nodes.join(raw, "left_outer", num_partitions=JOIN_PARTS,
                         on=("node",), right_on=("k",))
        return out.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                out_col: pa.array(
                    pc.fill_null(b["s"], 0).to_numpy(zero_copy_only=False)
                    // den, pa.int64()),
            }), batch_format="pyarrow").materialize()

    h = nodes.map_batches(_init("h"), batch_format="pyarrow").materialize()
    a = None
    for _ in range(iters):
        a = _pull(h, "h", "src", "dst", "a")
        h = _pull(a, "a", "dst", "src", "h")
    out = h.join(a, "inner", num_partitions=JOIN_PARTS, on=("node",))
    return out.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "hub_fp": b["h"], "auth_fp": b["a"]}),
        batch_format="pyarrow")


def _hits_oracle(iters: int = HITS_ITERS) -> str:
    """The q_hits_scores recurrence unrolled — one (ar, a, hr, h) CTE
    quartet per iteration, all-integer, bit-identical to the engine."""
    S = HITS_SCALE
    head = f"""
        WITH nn AS (SELECT count(*) AS c FROM customer),
        edges AS (
            SELECT o_custkey AS src,
                   o_orderkey % (SELECT c FROM nn) AS dst
            FROM orders
        ),
        nodes AS (SELECT c_custkey AS node FROM customer),
        h0 AS (SELECT node, {S} // (SELECT c FROM nn) AS h FROM nodes)"""
    body = ""
    for i in range(1, iters + 1):
        body += f""",
        ar{i} AS (
            SELECT e.dst AS node, sum(h.h) AS ar
            FROM edges e JOIN h{i - 1} h ON h.node = e.src
            GROUP BY e.dst
        ),
        a{i} AS (
            SELECT n.node, COALESCE(r.ar, 0)
                   // greatest(1, (SELECT sum(ar) FROM ar{i}) // {S}) AS a
            FROM nodes n LEFT JOIN ar{i} r ON r.node = n.node
        ),
        hr{i} AS (
            SELECT e.src AS node, sum(a.a) AS hr
            FROM edges e JOIN a{i} a ON a.node = e.dst
            GROUP BY e.src
        ),
        h{i} AS (
            SELECT n.node, COALESCE(r.hr, 0)
                   // greatest(1, (SELECT sum(hr) FROM hr{i}) // {S}) AS h
            FROM nodes n LEFT JOIN hr{i} r ON r.node = n.node
        )"""
    return head + body + f"""
        SELECT h.node, CAST(h.h AS BIGINT) AS hub_fp,
               CAST(a.a AS BIGINT) AS auth_fp
        FROM h{iters} h JOIN a{iters} a ON a.node = h.node
    """


ORACLES["hits_scores"] = _hits_oracle()


def q_fifo_lot_matching(sf_dir):
    """FIFO inventory lot matching — the cost-basis allocation every
    ledger/inventory pipeline needs: per part, even line numbers act as
    purchase LOTS (qty, integer unit cost) and odd line numbers as
    SALES consuming lots strictly first-in-first-out; each sale reports
    its allocated quantity, exact integer COGS, and unfilled remainder
    once supply runs out.

    Plan: one hash shuffle (groupby l_partkey) then a fully vectorized
    per-group kernel — no per-lot loop: with G(x) = cost of the first
    x units (prefix-weighted cumsum of qty·unit, evaluated by
    searchsorted into the lot cumsum), a sale spanning cumulative
    units [lo, hi) has cogs = G(min(hi,S)) − G(min(lo,S)) where S is
    total supply. Same per-key-fits-a-worker assumption as
    q_window_functions. The oracle states the SAME allocation as a
    cumulative-interval overlap join (two window cumsums + an
    inequality join), so engine and SQL agree through a completely
    different formulation — all-integer on both sides."""
    ds = T(sf_dir, "lineitem",
           ["l_partkey", "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice"])

    def _prep(b: pa.Table) -> pa.Table:
        qty = _round_half_away(
            b["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        unit = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
        ).astype(np.int64) % 1000 + 1
        return pa.table({
            "l_partkey": b["l_partkey"],
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": pc.cast(b["l_linenumber"], pa.int64()),
            "qty": pa.array(qty, pa.int64()),
            "unit_fp": pa.array(unit, pa.int64()),
        })

    def _fifo(df: pd.DataFrame) -> pd.DataFrame:
        # (l_orderkey, l_linenumber) is NOT unique per part in the
        # testdata; qty+unit complete a deterministic total order
        # (remaining full duplicates are interchangeable for FIFO)
        df = df.sort_values(
            ["l_orderkey", "l_linenumber", "qty", "unit_fp"],
            kind="mergesort")
        is_lot = (df["l_linenumber"].to_numpy() % 2) == 0
        p, s = df[is_lot], df[~is_lot]
        pq = p["qty"].to_numpy()
        pu = p["unit_fp"].to_numpy()
        p_hi = np.cumsum(pq)                      # lot cum boundaries
        p_lo = p_hi - pq
        w = np.cumsum(pq * pu)                    # G at lot boundaries
        total = int(p_hi[-1]) if len(pq) else 0

        def G(x):                                 # cost of first x units
            if len(pq) == 0:
                return np.zeros(len(x), dtype=np.int64)
            x = np.minimum(x, total)
            i = np.searchsorted(p_hi, x, side="left")
            full = np.where(i > 0, w[np.maximum(i - 1, 0)], 0)
            inlot = np.where(
                i < len(pq),
                (x - np.where(i > 0, p_hi[np.maximum(i - 1, 0)], 0))
                * pu[np.minimum(i, len(pq) - 1)], 0)
            return full + inlot

        sq = s["qty"].to_numpy()
        s_hi = np.cumsum(sq)
        s_lo = s_hi - sq
        alloc = np.minimum(s_hi, total) - np.minimum(s_lo, total)
        cogs = G(s_hi) - G(s_lo)
        return pd.DataFrame({
            "l_partkey": s["l_partkey"].to_numpy(),
            "sale_seq": np.arange(1, len(s) + 1, dtype=np.int64),
            "l_orderkey": s["l_orderkey"].to_numpy(),
            "l_linenumber": s["l_linenumber"].to_numpy(),
            "alloc_qty": alloc.astype(np.int64),
            "cogs_fp": cogs.astype(np.int64),
            "unfilled_qty": (sq - alloc).astype(np.int64),
        })

    return ds.map_batches(_prep, batch_format="pyarrow") \
        .groupby("l_partkey").map_groups(_fifo, batch_format="pandas")


ORACLES["fifo_lot_matching"] = """
    WITH x AS (
        SELECT l_partkey, l_orderkey,
               CAST(l_linenumber AS BIGINT) AS l_linenumber,
               CAST(round(l_quantity) AS BIGINT) AS qty,
               CAST(round(l_extendedprice) AS BIGINT) % 1000 + 1
                   AS unit_fp
        FROM lineitem
    ),
    p AS (
        SELECT l_partkey, qty, unit_fp,
               sum(qty) OVER (PARTITION BY l_partkey
                              ORDER BY l_orderkey, l_linenumber, qty,
                                       unit_fp
                              ROWS UNBOUNDED PRECEDING) AS hi
        FROM x WHERE l_linenumber % 2 = 0
    ),
    s AS (
        SELECT l_partkey, l_orderkey, l_linenumber, qty,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY l_orderkey, l_linenumber,
                                           qty, unit_fp) AS seq,
               sum(qty) OVER (PARTITION BY l_partkey
                              ORDER BY l_orderkey, l_linenumber, qty,
                                       unit_fp
                              ROWS UNBOUNDED PRECEDING) AS hi
        FROM x WHERE l_linenumber % 2 = 1
    ),
    ov AS (
        SELECT s.l_partkey, s.seq,
               least(p.hi, s.hi)
               - greatest(p.hi - p.qty, s.hi - s.qty) AS units,
               p.unit_fp
        FROM s JOIN p ON p.l_partkey = s.l_partkey
                     AND p.hi > s.hi - s.qty
                     AND p.hi - p.qty < s.hi
    )
    SELECT s.l_partkey, CAST(s.seq AS BIGINT) AS sale_seq,
           s.l_orderkey, s.l_linenumber,
           CAST(COALESCE(sum(ov.units), 0) AS BIGINT) AS alloc_qty,
           CAST(COALESCE(sum(ov.units * ov.unit_fp), 0) AS BIGINT)
               AS cogs_fp,
           CAST(s.qty - COALESCE(sum(ov.units), 0) AS BIGINT)
               AS unfilled_qty
    FROM s LEFT JOIN ov ON ov.l_partkey = s.l_partkey
                       AND ov.seq = s.seq
    GROUP BY s.l_partkey, s.seq, s.l_orderkey, s.l_linenumber, s.qty
"""


ACF_MAX_LAG = 7


def q_acf_correlogram(sf_dir, max_lag: int = ACF_MAX_LAG):
    """Multi-lag autocorrelation (the correlogram, lags 1..7) of the
    daily event-count series — q_lag1_autocorr generalized to the full
    weekly-seasonality probe (lag-7 spikes reveal day-of-week cycles).
    Identical exactness policy: with d_t = n·x_t − S (n²-scaled
    centering, no float), num_k = Σ d_t·d_{t+k} and den = Σ d_t² are
    association-free integer sums over the calendar-bounded daily
    series (≤36.5k rows per century at ANY scale — the distributed
    part is the day-count groupby); one mirrored ×1e9 division per
    lag at the end."""
    d = _daily_event_counts(sf_dir).sort_values("day")
    xs = d["x"].to_numpy().astype(object)
    n = len(xs)
    s = int(d["x"].sum())
    dv = np.array([n * int(x) - s for x in xs], dtype=object)
    den = int(sum(a * a for a in dv))
    rows = []
    for k in range(1, max_lag + 1):
        num = int(sum(dv[:-k] * dv[k:])) if k < n else 0
        acf = 1e9 * (num / den)
        rows.append({
            "lag": k, "num": num, "den": den,
            "acf_fp": int(_round_half_away(np.array([acf]))[0])})
    out = pd.DataFrame(rows)
    out["lag"] = out["lag"].astype(np.int64)
    out["num"] = out["num"].astype(np.int64)
    out["den"] = out["den"].astype(np.int64)
    return out


def _acf_oracle(max_lag: int = ACF_MAX_LAG) -> str:
    """One lead(·, k) branch per lag over the same centered integer
    series — bit-identical to the engine per the lag-1 precedent."""
    branches = []
    for k in range(1, max_lag + 1):
        branches.append(f"""
        SELECT {k} AS lag,
               CAST(sum(CASE WHEN dn{k} IS NULL THEN 0
                             ELSE dv * dn{k} END) AS BIGINT) AS num
        FROM v""")
    return f"""
    WITH d AS (
        SELECT epoch_ns(ts) // 86400000000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY day
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS s FROM d),
    v AS (SELECT t.n * d.x - t.s AS dv,
                 {", ".join(f"lead(t.n * d.x - t.s, {k}) OVER (ORDER BY d.day) AS dn{k}" for k in range(1, max_lag + 1))}
          FROM d, t),
    den AS (SELECT CAST(sum(dv * dv) AS BIGINT) AS den FROM v),
    nums AS ({" UNION ALL ".join(branches)})
    SELECT nums.lag, nums.num, den.den,
           CAST(round(1e9 * (CAST(nums.num AS DOUBLE) / den.den))
                AS BIGINT) AS acf_fp
    FROM nums, den
    ORDER BY nums.lag
"""


ORACLES["acf_correlogram"] = _acf_oracle()


RANK_OVERLAP_KS = (1, 5, 10, 25, 50)


def q_rank_overlap_at_k(sf_dir, ks=RANK_OVERLAP_KS):
    """Ranking-stability audit: how much of the top-k supplier revenue
    ranking survives from one year to the next (overlap@k + Jaccard@k
    for k ∈ {1,5,10,25,50}) — the drift check for any leaderboard- or
    retrieval-shaped pipeline. Plan: ONE grouped sum per supplier with
    two conditionally-folded cent columns (year windows resolved
    map-side, one exchange of |supplier| partials), then each top-k
    head is extracted by a distributed sort + limit(max k) — only the
    ≤2·max(k) head rows ever reach the driver. Ties broken by suppkey
    ascending, mirrored in the oracle's row_number ORDER BY."""
    lo1 = np.datetime64("1996-01-01").astype("datetime64[ns]").view("int64")
    lo2 = np.datetime64("1997-01-01").astype("datetime64[ns]").view("int64")
    hi2 = np.datetime64("1998-01-01").astype("datetime64[ns]").view("int64")

    def _fold(b: pa.Table) -> pa.Table:
        ship = _ts_ns(b["l_shipdate"])
        cents = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0).astype(np.int64)
        in1 = (ship >= lo1) & (ship < lo2)
        in2 = (ship >= lo2) & (ship < hi2)
        keep = in1 | in2
        return pa.table({
            "l_suppkey": pc.array_filter(b["l_suppkey"], pa.array(keep)),
            "rev1": pa.array(np.where(in1, cents, 0)[keep], pa.int64()),
            "rev2": pa.array(np.where(in2, cents, 0)[keep], pa.int64()),
        })

    per_sup = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(_fold, batch_format="pyarrow"),
        ["l_suppkey"], {"rev1": ("rev1", "sum"), "rev2": ("rev2", "sum")}
    ).materialize()
    kmax = max(ks)

    def _head(col):
        h = per_sup.sort([col, "l_suppkey"], descending=[True, False]) \
            .limit(kmax).to_pandas()
        return h["l_suppkey"].tolist()

    top1, top2 = _head("rev1"), _head("rev2")
    rows = []
    for k in ks:
        a, b = set(top1[:k]), set(top2[:k])
        ov = len(a & b)
        uni = len(a | b)
        rows.append({
            "k": k, "overlap": ov,
            "jaccard_fp": int(_round_half_away(
                np.array([1e9 * ov / uni]))[0]),
        })
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def _rank_overlap_oracle(ks=RANK_OVERLAP_KS) -> str:
    branches = " UNION ALL ".join(f"SELECT {k} AS k" for k in ks)
    return f"""
    WITH per AS (
        SELECT l_suppkey,
               CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                              AND l_shipdate <  TIMESTAMP '1997-01-01'
                             THEN CAST(round(l_extendedprice
                                  * (1.0 - l_discount) * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS rev1,
               CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                              AND l_shipdate <  TIMESTAMP '1998-01-01'
                             THEN CAST(round(l_extendedprice
                                  * (1.0 - l_discount) * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS rev2
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
    ),
    r AS (
        SELECT l_suppkey,
               row_number() OVER (ORDER BY rev1 DESC, l_suppkey) AS r1,
               row_number() OVER (ORDER BY rev2 DESC, l_suppkey) AS r2
        FROM per
    ),
    kk AS ({branches})
    SELECT kk.k,
           CAST(sum(CASE WHEN r.r1 <= kk.k AND r.r2 <= kk.k
                         THEN 1 ELSE 0 END) AS BIGINT) AS overlap,
           CAST(round(1e9 * sum(CASE WHEN r.r1 <= kk.k AND r.r2 <= kk.k
                                     THEN 1 ELSE 0 END)
                / sum(CASE WHEN r.r1 <= kk.k OR r.r2 <= kk.k
                           THEN 1 ELSE 0 END))
                AS BIGINT) AS jaccard_fp
    FROM kk, r
    GROUP BY kk.k
    ORDER BY kk.k
"""


ORACLES["rank_overlap_at_k"] = _rank_overlap_oracle()


GEO_DOMAIN = 100_000          # coordinates live on [0, 1e5)²
GEO_CELL = 10_000             # 10×10 grid cells
GEO_PACK = 10_000_000         # pack = d2·PACK + suppkey (d2 ≤ 2e10)


def _geo_xy(key: np.ndarray, off_x: int, off_y: int):
    """Deterministic synthetic coordinates from an integer key — the
    same multiplicative-hash arithmetic runs in the SQL oracle, all
    products ≤ ~4e13 so int64-safe on both sides."""
    x = (key * 2654435761 + off_x) % GEO_DOMAIN
    y = (key * 97003969 + off_y) % GEO_DOMAIN
    return x.astype(np.int64), y.astype(np.int64)


def q_spatial_grid_nn(sf_dir):
    """Bounded-radius spatial nearest neighbor — the grid-bucketed
    spatial join every geo pipeline needs: each customer point finds
    its closest supplier point among the 3×3 grid-cell neighborhood
    (exact argmin there; customers whose neighborhood is empty are
    dropped — bounded-radius semantics, stated, not approximated).
    Points are deterministic multiplicative hashes of the keys.

    Plan: suppliers flat-map into their 9 neighbor cells (constant 9×
    expansion of the SMALLER side), ONE hash join on cell id against
    customers mapped to their exact cell, then a map-side-combined
    grouped MIN over the packed (d2·1e7 + suppkey) composite — the
    argmin-with-deterministic-tie in one integer aggregate, no
    all-pairs anywhere. At any scale the exchange is |supplier|·9 +
    |customer| rows; skewed cells behave like any hash-join hot key."""
    ncells = GEO_DOMAIN // GEO_CELL

    def _cust(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = _geo_xy(k, 0, 0)
        return pa.table({
            "c_custkey": pa.array(k, pa.int64()),
            "cell": pa.array((x // GEO_CELL) * ncells + y // GEO_CELL,
                             pa.int64()),
            "cx": pa.array(x, pa.int64()),
            "cy": pa.array(y, pa.int64()),
        })

    def _sup9(b: pa.Table) -> pa.Table:
        k = b["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = _geo_xy(k, 12345, 54321)
        cellx, celly = x // GEO_CELL, y // GEO_CELL
        ks, xs, ys, cells = [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                gx, gy = cellx + dx, celly + dy
                ok = (gx >= 0) & (gx < ncells) & (gy >= 0) & (gy < ncells)
                ks.append(k[ok]); xs.append(x[ok]); ys.append(y[ok])
                cells.append(gx[ok] * ncells + gy[ok])
        return pa.table({
            "s_suppkey": pa.array(np.concatenate(ks), pa.int64()),
            "cell": pa.array(np.concatenate(cells), pa.int64()),
            "sx": pa.array(np.concatenate(xs), pa.int64()),
            "sy": pa.array(np.concatenate(ys), pa.int64()),
        })

    cust = T(sf_dir, "customer", ["c_custkey"]).map_batches(
        _cust, batch_format="pyarrow")
    sup = T(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        _sup9, batch_format="pyarrow")
    j = cust.join(sup, "inner", num_partitions=JOIN_PARTS, on=("cell",))

    def _pack(b: pa.Table) -> pa.Table:
        dx = (b["cx"].to_numpy(zero_copy_only=False)
              - b["sx"].to_numpy(zero_copy_only=False))
        dy = (b["cy"].to_numpy(zero_copy_only=False)
              - b["sy"].to_numpy(zero_copy_only=False))
        d2 = dx * dx + dy * dy
        return pa.table({
            "c_custkey": b["c_custkey"],
            "pack": pa.array(
                d2 * GEO_PACK
                + b["s_suppkey"].to_numpy(zero_copy_only=False),
                pa.int64()),
        })

    best = fast_groupby_agg(
        j.map_batches(_pack, batch_format="pyarrow"),
        ["c_custkey"], {"pack": ("pack", "min")})
    return best.map_batches(
        lambda b: pa.table({
            "c_custkey": b["c_custkey"],
            "nn_suppkey": pa.array(
                b["pack"].to_numpy(zero_copy_only=False) % GEO_PACK,
                pa.int64()),
            "d2": pa.array(
                b["pack"].to_numpy(zero_copy_only=False) // GEO_PACK,
                pa.int64()),
        }), batch_format="pyarrow")


ORACLES["spatial_grid_nn"] = f"""
    WITH c AS (
        SELECT c_custkey,
               (c_custkey * 2654435761) % {GEO_DOMAIN} AS cx,
               (c_custkey * 97003969) % {GEO_DOMAIN} AS cy
        FROM customer
    ),
    s AS (
        SELECT s_suppkey,
               (s_suppkey * 2654435761 + 12345) % {GEO_DOMAIN} AS sx,
               (s_suppkey * 97003969 + 54321) % {GEO_DOMAIN} AS sy
        FROM supplier
    ),
    cand AS (
        SELECT c.c_custkey, s.s_suppkey,
               (c.cx - s.sx) * (c.cx - s.sx)
               + (c.cy - s.sy) * (c.cy - s.sy) AS d2
        FROM c JOIN s
          ON abs(c.cx // {GEO_CELL} - s.sx // {GEO_CELL}) <= 1
         AND abs(c.cy // {GEO_CELL} - s.sy // {GEO_CELL}) <= 1
    )
    SELECT c_custkey,
           CAST(min(d2 * {GEO_PACK} + s_suppkey) % {GEO_PACK} AS BIGINT)
               AS nn_suppkey,
           CAST(min(d2 * {GEO_PACK} + s_suppkey) // {GEO_PACK} AS BIGINT)
               AS d2
    FROM cand GROUP BY c_custkey
"""


STREAM_JOIN_WINDOW_MS = 30 * 86_400_000  # 30 days


def q_stream_stream_join(sf_dir, window_ms: int = STREAM_JOIN_WINDOW_MS):
    """Stream-stream interval join — the windowed two-stream correlation
    every event pipeline needs (ad-click ↔ conversion attribution):
    for EVERY click event, the number of same-user purchase events in
    the strict window (t, t+Δ] and the timestamp of the first one.
    Unlike q_time_to_convert (one first-view row per user) this is a
    per-left-event banded join, the relational stream-stream shape.

    Plan: one hash shuffle (groupby user) then a loop-free per-group
    kernel — purchases sorted once per user, every click answered by
    two searchsorted probes (count = hi−lo, first = p[lo] when inside
    the window). Same per-key-fits-a-worker assumption as sessionize;
    at scale a hot user is a hot hash key, not a cross join. Oracle:
    the literal SQL band join, LEFT so zero-purchase clicks survive."""
    ev = T(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def _typed(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array(["click", "purchase"]))
        t = b.filter(keep)
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ms": pa.array(_ts_ns(t["ts"]) // 1_000_000, pa.int64()),
            "is_click": pc.equal(t["event_type"], "click"),
        })

    def _band(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["is_click"]].sort_values(["ms", "event_id"])
        p = df[~df["is_click"]].sort_values("ms")
        pms = p["ms"].to_numpy()
        cms = c["ms"].to_numpy()
        lo = np.searchsorted(pms, cms, side="right")
        hi = np.searchsorted(pms, cms + window_ms, side="right")
        n = (hi - lo).astype(np.int64)
        first = np.full(len(cms), np.nan)
        has = n > 0
        first[has] = pms[lo[has]].astype(np.float64)
        return pd.DataFrame({
            "user_id": c["user_id"].to_numpy(),
            "event_id": c["event_id"].to_numpy(),
            "click_ms": cms,
            "n_purch": n,
            "first_purch_ms": first,
        })

    return ev.map_batches(_typed, batch_format="pyarrow") \
        .groupby("user_id").map_groups(_band, batch_format="pandas")


ORACLES["stream_stream_join"] = f"""
    WITH c AS (
        SELECT user_id, event_id, epoch_ms(ts) AS cms
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT user_id, epoch_ms(ts) AS pms
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.event_id, c.cms AS click_ms,
           CAST(count(p.pms) AS BIGINT) AS n_purch,
           CAST(min(p.pms) AS DOUBLE) AS first_purch_ms
    FROM c LEFT JOIN p
      ON p.user_id = c.user_id
     AND p.pms > c.cms AND p.pms <= c.cms + {STREAM_JOIN_WINDOW_MS}
    GROUP BY c.user_id, c.event_id, c.cms
"""


def q_mask_plan_audit(sf_dir):
    """Deterministic span-corruption (masking) plan audit — the
    pretraining-data contract check: token i of doc d is masked iff
    (131·d + 17·i) ≡ 0 (mod 5), and the audit reports per doc the
    token count, masked count, and masked ratio. The ENGINE never
    materializes a single token index: since 17 ≡ 2 (mod 5), the
    masked positions are exactly i ≡ 3·(−d) (mod 5), so the count is
    the closed form ⌈(n − r)/5⌉ — one vectorized regex token count
    (Arrow RE2, same engine DuckDB uses) plus integer arithmetic per
    row. The ORACLE explodes every token index via
    unnest(generate_series) and counts literally, so the two sides
    prove the closed form against the definition on real data."""
    ds = T(sf_dir, "documents", ["doc_id", "text"])

    def _plan(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b["text"], r"\w+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = ((5 - (131 * d) % 5) % 5 * 3) % 5  # smallest masked index
        msk = np.where(n > r, (n - r + 4) // 5, 0).astype(np.int64)
        ratio = np.zeros(len(n), dtype=np.int64)
        pos = n > 0
        ratio[pos] = _round_half_away(
            1e9 * msk[pos] / n[pos]).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tok": pa.array(n, pa.int64()),
            "n_masked": pa.array(msk, pa.int64()),
            "mask_ratio_fp": pa.array(ratio, pa.int64()),
        })

    return ds.map_batches(_plan, batch_format="pyarrow")


ORACLES["mask_plan_audit"] = r"""
    WITH d AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n
        FROM documents
    ),
    ex AS (
        SELECT doc_id,
               unnest(generate_series(0, n - 1)) AS i
        FROM d
    ),
    m AS (
        SELECT doc_id,
               sum(CASE WHEN (131 * doc_id + 17 * i) % 5 = 0
                        THEN 1 ELSE 0 END) AS msk
        FROM ex GROUP BY doc_id
    )
    SELECT d.doc_id, d.n AS n_tok,
           CAST(COALESCE(m.msk, 0) AS BIGINT) AS n_masked,
           CAST(CASE WHEN d.n = 0 THEN 0
                     ELSE round(1e9 * COALESCE(m.msk, 0) / d.n)
                END AS BIGINT) AS mask_ratio_fp
    FROM d LEFT JOIN m ON m.doc_id = d.doc_id
"""


def q_two_hop_neighbors(sf_dir):
    """Friends-of-friends: per node of the derived order graph
    (undirected view), the distinct 1-hop neighbor count and the
    distinct STRICTLY-2-hop count (reachable in two steps, excluding
    the node itself and its direct neighbors) — the reach/expansion
    metric for influence and recommendation pipelines, and the one
    neighborhood statistic triangles/wedges don't give.

    Plan: symmetrize+distinct the edge list (one map-side-combined
    groupby), then 2-hop candidates come from ONE hash self-join on
    the middle node followed by distinct, and the strictness is a
    hash-partitioned left_anti join against the direct edges — joins,
    distincts and anti-joins end to end; nothing driver-sized. The
    wedge-shaped intermediate is Σ deg(u)² rows pre-distinct; a hub
    node is a hot hash key, the same skew profile (and remedy:
    salting) as the triangle counter's join tier."""
    from ray.data.aggregate import Count, Max, Min

    cust = T(sf_dir, "customer", ["c_custkey"])
    dom = cust.aggregate(Min("c_custkey"), Max("c_custkey"), Count())
    n = dom["count()"]
    edges = _pagerank_edges(sf_dir, n)

    def _sym(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        a = np.concatenate([s, d])
        bb = np.concatenate([d, s])
        keep = a != bb
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(bb[keep], pa.int64())})

    und = fast_groupby_agg(
        edges.map_batches(_sym, batch_format="pyarrow"),
        ["a", "b"], {"__n": (None, "count")}) \
        .drop_columns(["__n"]).materialize()

    n1 = fast_groupby_agg(und, ["a"], {"n1": (None, "count")})

    # rename the probe side so the self-join emits distinct names
    rhs = und.map_batches(
        lambda b: pa.table({"m": b["a"], "w": b["b"]}),
        batch_format="pyarrow")
    hop2 = und.join(rhs, "inner", num_partitions=JOIN_PARTS,
                    on=("b",), right_on=("m",))

    def _pairs(b: pa.Table) -> pa.Table:
        t = pa.table({"a": b["a"], "w": b["w"]})
        return t.filter(pc.invert(pc.equal(t["a"], t["w"])))

    p2 = fast_groupby_agg(
        hop2.map_batches(_pairs, batch_format="pyarrow"),
        ["a", "w"], {"__n": (None, "count")}).drop_columns(["__n"])
    strict = p2.join(und, "left_anti", num_partitions=JOIN_PARTS,
                     on=("a", "w"), right_on=("a", "b"))
    n2 = fast_groupby_agg(strict, ["a"], {"n2": (None, "count")})

    nodes = cust.map_batches(
        lambda b: pa.table({"node": b["c_custkey"]}),
        batch_format="pyarrow")
    out = nodes.join(n1, "left_outer", num_partitions=JOIN_PARTS,
                     on=("node",), right_on=("a",))
    out = out.join(n2, "left_outer", num_partitions=JOIN_PARTS,
                   on=("node",), right_on=("a",))
    return out.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "n1": pc.fill_null(pc.cast(b["n1"], pa.int64()), 0),
            "n2": pc.fill_null(pc.cast(b["n2"], pa.int64()), 0),
        }), batch_format="pyarrow")


ORACLES["two_hop_neighbors"] = """
    WITH nn AS (SELECT count(*) AS c FROM customer),
    e AS (
        SELECT o_custkey AS src,
               o_orderkey % (SELECT c FROM nn) AS dst
        FROM orders
    ),
    und AS (
        SELECT DISTINCT a, b FROM (
            SELECT src AS a, dst AS b FROM e
            UNION ALL
            SELECT dst AS a, src AS b FROM e
        ) WHERE a <> b
    ),
    n1 AS (SELECT a, count(*) AS c FROM und GROUP BY a),
    p2 AS (
        SELECT DISTINCT u1.a AS a, u2.b AS w
        FROM und u1 JOIN und u2 ON u2.a = u1.b
        WHERE u2.b <> u1.a
    ),
    n2 AS (
        SELECT p2.a, count(*) AS c
        FROM p2 LEFT JOIN und ON und.a = p2.a AND und.b = p2.w
        WHERE und.a IS NULL
        GROUP BY p2.a
    )
    SELECT c_custkey AS node,
           CAST(COALESCE(n1.c, 0) AS BIGINT) AS n1,
           CAST(COALESCE(n2.c, 0) AS BIGINT) AS n2
    FROM customer
    LEFT JOIN n1 ON n1.a = c_custkey
    LEFT JOIN n2 ON n2.a = c_custkey
"""


LINKPRED_MAX_SINGLE_EDGES = 5_000_000
LINKPRED_WEDGE_BUDGET = 30_000_000


@ray.remote
def _link_pred_task(k: int, max_wedges: int, *tables: pa.Table) -> pa.Table:
    """Single-task link-prediction scoring over the collected symmetric
    distinct edge list (a → b, b-sorted within equal-a runs): wedges
    expand per middle-node run in bounded chunks (_run_pair_chunks);
    within a run the neighbor list is sorted and distinct, so every
    expanded pair already satisfies u < v. Scores fold via one packed-
    key sort + reduceat; adjacency is one searchsorted probe against
    the packed (a<<32|b) edges; degrees come from run lengths. Guarded
    on TOTAL wedge volume (hub skew fail-over to the join tier, the
    triangle counter's discipline). Node ids must fit 32 bits (the
    derived graph's domain is 0..n_customers)."""
    from ..stages.fastagg import live_arrow

    t = pa.concat_tables(live_arrow(tables))
    a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keys = (a << 32) | b
    starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
    lens = np.diff(np.r_[starts, len(a)]).astype(np.int64)
    nodes = a[starts]
    runs = np.flatnonzero(lens >= 2)
    kk = lens[runs]
    n_w = int((kk * (kk - 1) // 2).sum())
    if n_w > max_wedges:
        raise ValueError(
            f"degenerate hub: {n_w} wedges (budget {max_wedges})")
    # middle-node RA share by DIRECT position index (1e9 // deg of the
    # run each row sits in) — no per-pair searchsorted
    share_pos = np.repeat(1_000_000_000 // lens, lens)
    pk_chunks, ra_chunks = [], []
    for iu, ju in _run_pair_chunks(starts, lens, runs,
                                   SIM_JOIN_PAIR_CHUNK):
        pk_chunks.append((b[iu] << 32) | b[ju])
        ra_chunks.append(share_pos[iu])
    if not pk_chunks:
        empty = pa.array([], pa.int64())
        return pa.table({"u": empty, "v": empty, "cn": empty,
                         "ra_fp": empty, "jaccard_fp": empty})
    pk = np.concatenate(pk_chunks)
    ra = np.concatenate(ra_chunks)
    srt = np.argsort(pk)  # grouping only — the fold is commutative
    pk, ra = pk[srt], ra[srt]
    gs = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
    cn = np.diff(np.r_[gs, len(pk)]).astype(np.int64)
    ra_sum = np.add.reduceat(ra, gs)
    upk = pk[gs]
    pos = np.searchsorted(keys, upk)
    pos[pos >= len(keys)] = len(keys) - 1
    keep = keys[pos] != upk  # strictly non-adjacent pairs
    upk, cn, ra_sum = upk[keep], cn[keep], ra_sum[keep]
    # top-k without a full candidate-sized 4-key lexsort: partition on
    # the primary key, keep every candidate at/above the k-th RA (ties
    # included), then order only that small head exactly
    if len(ra_sum) > k:
        thr = np.partition(ra_sum, len(ra_sum) - k)[len(ra_sum) - k]
        head = ra_sum >= thr
        upk, cn, ra_sum = upk[head], cn[head], ra_sum[head]
    u = upk >> 32
    v = upk & np.int64(0xFFFFFFFF)
    top = np.lexsort((v, u, -cn, -ra_sum))[:k]
    u, v, cn, ra_sum = u[top], v[top], cn[top], ra_sum[top]
    # degrees / Jaccard only for the k winners — never candidate-sized
    du = lens[np.searchsorted(nodes, u)]
    dv = lens[np.searchsorted(nodes, v)]
    jac = (1_000_000_000 * cn) // (du + dv - cn)
    return pa.table({
        "u": pa.array(u, pa.int64()),
        "v": pa.array(v, pa.int64()),
        "cn": pa.array(cn, pa.int64()),
        "ra_fp": pa.array(ra_sum, pa.int64()),
        "jaccard_fp": pa.array(jac, pa.int64()),
    })


def q_link_prediction(sf_dir, k: int = 100,
                      max_single_edges: int = LINKPRED_MAX_SINGLE_EDGES):
    """Link prediction scores over the derived order graph: for every
    NON-adjacent 2-hop pair (u < v), common-neighbor count, the
    resource-allocation index Σ_{w∈N(u)∩N(v)} 1/deg(w) (Zhou et al.'s
    RA — Adamic–Adar with 1/deg instead of 1/ln deg, chosen so the
    score is EXACT integer floor-division fixed point, no libm), and
    neighborhood Jaccard — the candidate-generation stage of a
    friend/item recommender. Top-k by RA under a total ordering.

    Plan: symmetrize+distinct edges, degree via one map-side-combined
    groupby, enrich each edge with its MIDDLE node's 1/deg share once
    (edge-scale join), then wedges from ONE hash self-join on the
    middle (u < v dedup inside the batch kernel), partial-agg to
    (u, v, cn, ra_fp), anti-join out already-adjacent pairs, two
    candidate-scale degree joins for Jaccard, and a distributed
    sort+limit on the tiny scored set. Hub middles are hot hash keys
    (Σ deg² wedge rows) — same skew profile and salting remedy as the
    triangle counter's join tier."""
    from ray.data.aggregate import Count, Max, Min

    cust = T(sf_dir, "customer", ["c_custkey"])
    dom = cust.aggregate(Min("c_custkey"), Max("c_custkey"), Count())
    n = dom["count()"]
    edges = _pagerank_edges(sf_dir, n)

    def _sym(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        a = np.concatenate([s, d])
        bb = np.concatenate([d, s])
        keep = a != bb
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(bb[keep], pa.int64())})

    und = fast_groupby_agg(
        edges.map_batches(_sym, batch_format="pyarrow"),
        ["a", "b"], {"__n": (None, "count")}) \
        .drop_columns(["__n"]).materialize()

    import ray.data as rd

    if und.count() <= max_single_edges:
        try:
            return rd.from_arrow_refs(
                [_link_pred_task.remote(k, LINKPRED_WEDGE_BUDGET,
                                        *und.to_arrow_refs())]
            ).materialize()
        except Exception as e:  # RayTaskError wraps the ValueError
            if "degenerate hub" not in str(e):
                raise
            # hub skew: the join tier below spreads the expansion

    deg = fast_groupby_agg(und, ["a"], {"d": (None, "count")})

    # edge (m → u) carrying floor(1e9 / deg(m)): the middle node's RA share
    share = und.join(
        deg.map_batches(lambda b: b.rename_columns(["m", "d"]),
                        batch_format="pyarrow"),
        "inner", num_partitions=JOIN_PARTS, on=("a",), right_on=("m",)) \
        .map_batches(
            lambda b: pa.table({
                "m": b["a"], "u": b["b"],
                "ra": pa.array(
                    1_000_000_000
                    // b["d"].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64()),
            }), batch_format="pyarrow").materialize()

    rhs = share.map_batches(
        lambda b: pa.table({"m2": b["m"], "v": b["u"]}),
        batch_format="pyarrow")
    wedge = share.join(rhs, "inner", num_partitions=JOIN_PARTS,
                       on=("m",), right_on=("m2",))

    def _ordered(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        keep = u < v
        return pa.table({
            "u": pa.array(u[keep], pa.int64()),
            "v": pa.array(v[keep], pa.int64()),
            "ra": b["ra"].filter(pa.array(keep)),
        })

    cand = fast_groupby_agg(
        wedge.map_batches(_ordered, batch_format="pyarrow"),
        ["u", "v"], {"cn": (None, "count"), "ra_fp": ("ra", "sum")})
    nonadj = cand.join(und, "left_anti", num_partitions=JOIN_PARTS,
                       on=("u", "v"), right_on=("a", "b"))

    du = deg.map_batches(lambda b: b.rename_columns(["ku", "du"]),
                         batch_format="pyarrow")
    dv = deg.map_batches(lambda b: b.rename_columns(["kv", "dv"]),
                         batch_format="pyarrow")
    scored = nonadj.join(du, "inner", num_partitions=JOIN_PARTS,
                         on=("u",), right_on=("ku",)) \
        .join(dv, "inner", num_partitions=JOIN_PARTS, on=("v",), right_on=("kv",))

    def _jac(b: pa.Table) -> pa.Table:
        cn = b["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        duv = (b["du"].to_numpy(zero_copy_only=False).astype(np.int64)
               + b["dv"].to_numpy(zero_copy_only=False).astype(np.int64)
               - cn)
        return pa.table({
            "u": b["u"], "v": b["v"],
            "cn": pa.array(cn, pa.int64()),
            "ra_fp": pc.cast(b["ra_fp"], pa.int64()),
            "jaccard_fp": pa.array((1_000_000_000 * cn) // duv, pa.int64()),
        })

    return scored.map_batches(_jac, batch_format="pyarrow") \
        .sort(["ra_fp", "cn", "u", "v"],
              descending=[True, True, False, False]).limit(k)


ORACLES["link_prediction"] = """
    WITH nn AS (SELECT count(*) AS c FROM customer),
    e AS (
        SELECT o_custkey AS src,
               o_orderkey % (SELECT c FROM nn) AS dst
        FROM orders
    ),
    und AS (
        SELECT DISTINCT a, b FROM (
            SELECT src AS a, dst AS b FROM e
            UNION ALL
            SELECT dst AS a, src AS b FROM e
        ) WHERE a <> b
    ),
    deg AS (SELECT a, count(*) AS d FROM und GROUP BY a),
    wedge AS (
        SELECT u1.b AS u, u2.b AS v, u1.a AS m
        FROM und u1 JOIN und u2 ON u2.a = u1.a AND u1.b < u2.b
    ),
    cand AS (
        SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
               CAST(sum(1000000000 // d.d) AS BIGINT) AS ra_fp
        FROM wedge JOIN deg d ON d.a = wedge.m
        GROUP BY u, v
    ),
    nonadj AS (
        SELECT c.* FROM cand c
        LEFT JOIN und ON und.a = c.u AND und.b = c.v
        WHERE und.a IS NULL
    )
    SELECT u, v, cn, ra_fp,
           CAST((1000000000 * cn) // (du.d + dv.d - cn) AS BIGINT)
               AS jaccard_fp
    FROM nonadj
    JOIN deg du ON du.a = u
    JOIN deg dv ON dv.a = v
    ORDER BY ra_fp DESC, cn DESC, u, v
    LIMIT 100
"""


def q_bot_regularity(sf_dir, min_gaps: int = 5):
    """Bot / automation detector over the event stream — the abuse
    heuristic every crawl and analytics pipeline runs: per user, the
    squared coefficient of variation of CONSECUTIVE inter-event gaps
    (clock-regular agents have near-zero CV; humans are bursty). Gaps
    are clipped whole seconds (≤ 10⁶ s — longer absences count as one
    cap, stated semantics), so the per-user partials (n, Σd, Σd²) are
    exact integers; ``is_bot`` is decided ENTIRELY in integers —
    4·(n·Σd² − (Σd)²) < (Σd)², i.e. cv² < ¼, evaluated in arbitrary
    precision (python ints / HUGEINT) — and cv² itself is the module's
    mirrored float tree, canonicalized to 4 decimals.

    Plan: the attribution discipline — one splitmix64(user) % P
    shuffle, then a fully VECTORIZED per-partition pandas kernel (sort
    by user/ts/id, np.diff, boundary mask — no per-user Python); a
    user's rows land in exactly one partition so no boundary stitch is
    needed. The exchange is the raw event rows once; output is
    user-cardinality-sized."""
    from ..functions.sketches import _splitmix64

    P = 64
    ev = T(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _part(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ns": pa.array(_ts_ns(b["ts"]), pa.int64()),
            "part": pa.array((_splitmix64(u) % np.uint64(P))
                             .astype(np.int64)),
        })

    def _cv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ns", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy()
        ns = g["ns"].to_numpy(np.int64)
        if len(g) < 2:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=u.dtype),
                "n_gaps": pd.Series([], dtype=np.int64),
                "s_sec": pd.Series([], dtype=np.int64),
                "s2_sec": pd.Series([], dtype=np.int64),
                "is_bot": pd.Series([], dtype=np.int64),
                "cv2": pd.Series([], dtype=np.float64)})
        same = u[1:] == u[:-1]
        d = np.minimum(np.diff(ns) // 1_000_000_000, 1_000_000)[same]
        d2 = d * d
        df = pd.DataFrame({"user_id": u[1:][same], "d": d, "d2": d2})
        a = df.groupby("user_id", sort=False).agg(
            n_gaps=("d", "size"), s_sec=("d", "sum"), s2_sec=("d2", "sum"))
        a = a[a["n_gaps"] >= min_gaps].reset_index()
        # exact integer bot rule in arbitrary precision (no int64 limit)
        n_o = a["n_gaps"].astype(object)
        s_o = a["s_sec"].astype(object)
        s2_o = a["s2_sec"].astype(object)
        a["is_bot"] = ((4 * (n_o * s2_o - s_o * s_o) < s_o * s_o)
                       .astype(np.int64))
        n = a["n_gaps"].to_numpy(np.float64)
        s = a["s_sec"].to_numpy(np.float64)
        s2 = a["s2_sec"].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            cv2 = np.where(s > 0, (s2 * n - s * s) / (s * s), 0.0)
        a["cv2"] = cv2
        for c in ("n_gaps", "s_sec", "s2_sec"):
            a[c] = a[c].astype(np.int64)
        return a[["user_id", "n_gaps", "s_sec", "s2_sec",
                  "is_bot", "cv2"]]

    out = ev.map_batches(_part, batch_format="pyarrow") \
        .groupby("part").map_groups(_cv, batch_format="pandas")
    return out.map_batches(_canon_stage({"cv2": 4}),
                           batch_format="pyarrow")


ORACLES["bot_regularity"] = """
    WITH s AS (
        SELECT user_id, epoch_us(ts) AS tu, event_id FROM events
    ),
    dr AS (
        SELECT user_id,
               (tu - lag(tu) OVER (PARTITION BY user_id
                                   ORDER BY tu, event_id))
               // 1000000 AS r
        FROM s
    ),
    d AS (
        -- NOT least(r, cap): DuckDB's least() IGNORES nulls, which
        -- would turn every user's first row into a spurious cap gap
        SELECT user_id,
               CASE WHEN r > 1000000 THEN 1000000 ELSE r END AS d
        FROM dr
    ),
    g AS (
        SELECT user_id, count(d) AS n, sum(d) AS sd, sum(d * d) AS s2
        FROM d WHERE d IS NOT NULL GROUP BY user_id
        HAVING count(d) >= 5
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_gaps,
           CAST(sd AS BIGINT) AS s_sec,
           CAST(s2 AS BIGINT) AS s2_sec,
           CAST(CASE WHEN 4 * (n * s2 - sd * sd) < sd * sd
                THEN 1 ELSE 0 END AS BIGINT) AS is_bot,
           CASE WHEN sd > 0
                THEN round((s2 * 1.0 * n - (sd * 1.0) * (sd * 1.0))
                           / ((sd * 1.0) * (sd * 1.0)) * 10000.0)
                     / 10000.0
                ELSE 0.0 END AS cv2
    FROM g
"""


def q_conformal_quantile(sf_dir, alpha_pct: int = 10):
    """Split-conformal calibration — the distribution-free uncertainty
    primitive modern eval pipelines attach to any scorer: over the
    batch-inference logit (roc_auc's scorer, bucketized s // 10⁶ on
    both sides), nonconformity α = (1 − 2y)·b (high score conforms
    for positives), calibration split vec_id % 5 == 0, and q̂ = the
    ⌈(1−α)(n+1)⌉-th smallest calibration score (clamped to n) — then
    the realized coverage of {α ≤ q̂} on the held-out rest. All
    integers end to end; the order statistic is an exact cumulative
    walk over the BOUNDED score-bucket histogram (grouped_median's
    discipline — the exchange is a (split, bucket) value-count fold,
    never a sort).

    Plan: one actor-pool scoring pass (weights built once per actor) →
    map-side-combined (cal, alpha) histogram → a driver walk over the
    bucket-domain-sized table."""
    ds = T(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    class _Alpha:
        def __init__(self):
            self.w1: np.ndarray | None = None

        def __call__(self, b: pa.Table) -> pa.Table:
            from ..functions import ann as ANN

            m = ANN._to_matrix(b["embedding"]).astype(np.float64)
            if self.w1 is None:
                j = np.arange(m.shape[1])
                self.w1 = ((j * 31 + 17) % 7 - 3).astype(np.int64)
            efp = _round_half_away(m * 1e6).astype(np.int64)
            s = efp @ self.w1
            bkt = s // 1_000_000  # numpy floor division, mirrored in SQL
            y = (b["label"].to_numpy(zero_copy_only=False)
                 .astype(np.int64) % 2)
            vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "cal": pa.array((vid % 5 == 0).astype(np.int64)),
                "alpha": pa.array((1 - 2 * y) * bkt, pa.int64()),
            })

    hist = fast_groupby_agg(
        ds.map_batches(_Alpha, batch_format="pyarrow",
                       batch_size=4096, concurrency=(1, 4)),
        ["cal", "alpha"], {"c": (None, "count")}).to_pandas()
    hist = hist.sort_values("alpha")
    ch = hist[hist["cal"] == 1]
    th = hist[hist["cal"] == 0]
    n_cal = int(ch["c"].sum())
    k = min((9 * (n_cal + 1) + 9) // 10, n_cal) \
        if alpha_pct == 10 else min(
            (((100 - alpha_pct) * (n_cal + 1)) + (100 - 1)) // 100, n_cal)
    cum = ch["c"].cumsum().to_numpy(np.int64)
    qhat = int(ch["alpha"].to_numpy(np.int64)[np.searchsorted(cum, k)])
    n_test = int(th["c"].sum())
    n_cov = int(th.loc[th["alpha"] <= qhat, "c"].sum())
    return pd.DataFrame([{
        "n_cal": np.int64(n_cal), "k": np.int64(k),
        "qhat": np.int64(qhat), "n_test": np.int64(n_test),
        "n_covered": np.int64(n_cov),
        "cov_fp": np.int64(1_000_000 * n_cov // n_test),
    }])


ORACLES["conformal_quantile"] = """
    WITH e AS (
        SELECT vec_id, gs - 1 AS j,
               CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                    AS BIGINT) AS efp
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(gs)
    ),
    l1 AS (
        SELECT vec_id,
               CAST(sum(efp * (((j * 31 + 17) % 7) - 3)) AS BIGINT) AS s
        FROM e GROUP BY vec_id
    ),
    q AS (
        SELECT l1.vec_id,
               s // 1000000 - CASE WHEN s % 1000000 <> 0 AND s < 0
                                   THEN 1 ELSE 0 END AS b,
               CAST(emb.label % 2 AS BIGINT) AS y,
               CASE WHEN l1.vec_id % 5 = 0 THEN 1 ELSE 0 END AS cal
        FROM l1 JOIN embeddings emb ON emb.vec_id = l1.vec_id
    ),
    a AS (SELECT vec_id, cal, (1 - 2 * y) * b AS alpha FROM q),
    kk AS (
        SELECT count(*) AS n_cal,
               least((9 * (count(*) + 1) + 9) // 10, count(*)) AS k
        FROM a WHERE cal = 1
    ),
    h AS (SELECT alpha, count(*) AS c FROM a WHERE cal = 1
          GROUP BY alpha),
    w AS (SELECT alpha, sum(c) OVER (ORDER BY alpha) AS cum FROM h),
    qh AS (SELECT min(alpha) AS qhat FROM w, kk WHERE cum >= kk.k),
    cov AS (
        SELECT count(*) AS n_test,
               sum(CASE WHEN alpha <= qh.qhat THEN 1 ELSE 0 END) AS n_cov
        FROM a, qh WHERE cal = 0
    )
    SELECT CAST(kk.n_cal AS BIGINT) AS n_cal,
           CAST(kk.k AS BIGINT) AS k,
           CAST(qh.qhat AS BIGINT) AS qhat,
           CAST(cov.n_test AS BIGINT) AS n_test,
           CAST(cov.n_cov AS BIGINT) AS n_covered,
           CAST(1000000 * cov.n_cov // cov.n_test AS BIGINT) AS cov_fp
    FROM kk, qh, cov
"""


def q_novelty_rate(sf_dir, n_epochs: int = 8):
    """Corpus novelty curve — the freshness metric a continuously-
    ingested training corpus is monitored by: split the corpus into
    ingestion epochs (doc_id order, equal-width id bands), and per
    epoch report how many docs carry a content fingerprint NEVER seen
    in any earlier epoch (md5 of the text — the exact-dedup key), as
    a share of the epoch's docs. A collapsing novelty share is the
    signal to stop re-crawling a source.

    Plan: one scan emits (fp, epoch); one map-side-combined groupby
    takes min(epoch) per fingerprint (fingerprint-domain exchange,
    the dedup_exact_text shape); a second tiny groupby counts first-
    seen fps per epoch; doc counts per epoch fold map-side. No join —
    the epoch of first sight IS the group key."""
    import hashlib as _hl

    from ray.data.aggregate import Max

    docs = T(sf_dir, "documents", ["doc_id", "text"])
    mx = docs.aggregate(Max("doc_id"))["max(doc_id)"]

    def _fp(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = ids * n_epochs // (mx + 1)
        fps = [_hl.md5(t.encode("utf-8", "surrogatepass")).hexdigest()
               for t in b["text"].to_pylist()]
        return pa.table({
            "fp": pa.array(fps, pa.string()),
            "epoch": pa.array(ep, pa.int64()),
        })

    fp_epoch = docs.map_batches(_fp, batch_format="pyarrow").materialize()
    first = fast_groupby_agg(fp_epoch, ["fp"], {"e0": ("epoch", "min")})
    novel = fast_groupby_agg(first, ["e0"], {"n_first": (None, "count")}) \
        .map_batches(lambda b: b.rename_columns(["epoch", "n_first"]),
                     batch_format="pyarrow")
    per_epoch = fast_groupby_agg(fp_epoch, ["epoch"],
                                 {"n_docs": (None, "count")})
    out = per_epoch.join(novel, "left_outer", num_partitions=2,
                         on=("epoch",))

    def _rate(b: pa.Table) -> pa.Table:
        nd = b["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        nf = pc.fill_null(pc.cast(b["n_first"], pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "epoch": b["epoch"],
            "n_docs": pa.array(nd, pa.int64()),
            "n_first_seen": pa.array(nf, pa.int64()),
            "novelty_fp": pa.array(1_000_000 * nf // nd, pa.int64()),
        })

    return out.map_batches(_rate, batch_format="pyarrow")


ORACLES["novelty_rate"] = """
    WITH mx AS (SELECT max(doc_id) AS m FROM documents),
    f AS (
        SELECT md5(text) AS fp,
               doc_id * 8 // ((SELECT m FROM mx) + 1) AS epoch
        FROM documents
    ),
    first_seen AS (SELECT fp, min(epoch) AS e0 FROM f GROUP BY fp),
    nv AS (SELECT e0 AS epoch, count(*) AS n_first
           FROM first_seen GROUP BY e0),
    pe AS (SELECT epoch, count(*) AS n_docs FROM f GROUP BY epoch)
    SELECT pe.epoch,
           CAST(pe.n_docs AS BIGINT) AS n_docs,
           CAST(COALESCE(nv.n_first, 0) AS BIGINT) AS n_first_seen,
           CAST(1000000 * COALESCE(nv.n_first, 0) // pe.n_docs
                AS BIGINT) AS novelty_fp
    FROM pe LEFT JOIN nv ON nv.epoch = pe.epoch
"""


def q_ndcg_at_k(sf_dir, k: int = 10):
    """nDCG@10 of the exact cosine retrieval (ann_bruteforce's ranking,
    whose ordering is pinned by its own green oracle) against graded
    relevance rel = label % 4 — THE ranking-quality metric for any
    retrieval/rerank pipeline. Every DCG term is quantized
    independently — term_fp = round(10⁶·(2^rel − 1)/log2(rank+1)) —
    BEFORE the sum (hill_tail_index's association-free discipline), so
    per-query DCG is an exact integer sum; the ideal DCG comes from the
    corpus-level top-k grades (grades are query-independent here), and
    nDCG = 10⁶·dcg_fp // idcg_fp stays in integers.

    Plan: the distributed part is the brute-force top-k retrieval
    (per-batch matmul partials) + one 4-bucket grade histogram; the
    finish is output-sized (≤ 5·k rows + 4 buckets on the driver)."""
    from ..functions import ann as ANN

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    topk = ANN.brute_force_topk(
        emb.select_columns(["vec_id", "embedding"]),
        _queries_matrix(sf_dir), k=k).to_pandas()

    need = pa.array(sorted(set(topk["vec_id"].tolist())), pa.int64())
    lab = emb.map_batches(
        lambda b: pa.table({
            "vec_id": b["vec_id"],
            "rel": pa.array(
                b["label"].to_numpy(zero_copy_only=False)
                .astype(np.int64) % 4, pa.int64()),
        }).filter(pc.is_in(b["vec_id"], value_set=need)),
        batch_format="pyarrow").to_pandas()  # ≤ 5·k rows
    rel_of = dict(zip(lab["vec_id"].astype(int), lab["rel"].astype(int)))

    hist = fast_groupby_agg(
        emb.map_batches(
            lambda b: pa.table({"rel": pa.array(
                b["label"].to_numpy(zero_copy_only=False)
                .astype(np.int64) % 4, pa.int64())}),
            batch_format="pyarrow"),
        ["rel"], {"c": (None, "count")}).to_pandas() \
        .sort_values("rel", ascending=False)

    def _term(rel: int, rank: int) -> int:
        return int(_round_half_away(
            np.float64((1 << rel) - 1) / np.log2(np.float64(rank + 1))
            * 1e6))

    ideal = []
    for _, row in hist.iterrows():
        ideal.extend([int(row["rel"])] * int(row["c"]))
        if len(ideal) >= k:
            break
    idcg_fp = sum(_term(r, i + 1) for i, r in enumerate(ideal[:k]))

    rows = []
    for qid, g in topk.groupby("query_id"):
        dcg_fp = sum(_term(rel_of[int(v)], int(r))
                     for v, r in zip(g["vec_id"], g["rank"]))
        rows.append({
            "query_id": np.int64(qid),
            "dcg_fp": np.int64(dcg_fp),
            "idcg_fp": np.int64(idcg_fp),
            "ndcg_fp": np.int64(1_000_000 * dcg_fp // idcg_fp),
        })
    return pd.DataFrame(rows)


ORACLES["ndcg_at_k"] = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < 5),
    s AS (SELECT q.qid AS query_id, e.vec_id,
                 CAST(list_cosine_similarity(q.qe, e.embedding)
                      AS DOUBLE) AS raw
          FROM q, embeddings e),
    r AS (SELECT query_id, vec_id, ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY raw DESC, vec_id) AS rank
          FROM s),
    g AS (SELECT r.query_id, r.rank,
                 CAST(e.label % 4 AS BIGINT) AS rel
          FROM r JOIN embeddings e ON e.vec_id = r.vec_id
          WHERE r.rank <= 10),
    d AS (SELECT query_id,
                 CAST(sum(CAST(round((pow(2, rel) - 1)
                                     / log2(rank + 1) * 1000000)
                               AS BIGINT)) AS BIGINT) AS dcg_fp
          FROM g GROUP BY query_id),
    ig AS (SELECT CAST(label % 4 AS BIGINT) AS rel,
                  ROW_NUMBER() OVER (ORDER BY label % 4 DESC, vec_id)
                      AS rank
           FROM embeddings),
    i AS (SELECT CAST(sum(CAST(round((pow(2, rel) - 1)
                                     / log2(rank + 1) * 1000000)
                               AS BIGINT)) AS BIGINT) AS idcg_fp
          FROM ig WHERE rank <= 10)
    SELECT d.query_id, d.dcg_fp, i.idcg_fp,
           CAST(1000000 * d.dcg_fp // i.idcg_fp AS BIGINT) AS ndcg_fp
    FROM d, i
"""


def q_sliding_distinct_types(sf_dir, window_days: int = 7):
    """Trailing-window DISTINCT count — per user and active day, the
    number of distinct event types in the trailing 7 days. COUNT
    (DISTINCT) over a sliding window doesn't decompose like a sum, so
    the engine uses the industry "datelist bitmask" plan: the type
    vocabulary (tiny, one distinct fold) maps each type to a bit;
    (user, day) masks OR together map-side (distinct (user, day, type)
    rows → summing distinct powers of two IS the OR); the 7-day window
    is then SEVEN vectorized searchsorted shift-ORs inside a
    hash-partitioned kernel (a user's days live in one partition — no
    per-user Python, no boundary stitch), and popcount is a 16-bit
    lookup. The exchange carries one row per (user, day, type) — never
    the raw events.

    Same shuffle key (splitmix user) as attribution/bot_regularity —
    the ONE partitioning reused across the event-stream operators."""
    from ..functions.sketches import _splitmix64

    P = 64
    ev = T(sf_dir, "events", ["user_id", "ts", "event_type"])

    types = sorted(
        r["event_type"]
        for r in fast_groupby_agg(ev.select_columns(["event_type"]),
                                  ["event_type"],
                                  {"__n": (None, "count")}).take_all())
    if len(types) > 16:  # mask fits the 16-bit popcount LUT
        raise ValueError(
            f"{len(types)} event types exceed the 16-bit datelist mask; "
            "widen the LUT (or chunk the vocabulary) before use")
    bit_of = {t: i for i, t in enumerate(types)}

    def _udt(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = _ts_ns(b["ts"]) // 86_400_000_000_000
        bits = np.array([bit_of[t] for t in b["event_type"].to_pylist()],
                        dtype=np.int64)
        return pa.table({
            "user_id": pa.array(u), "day": pa.array(day),
            "bit": pa.array(bits),
        })

    # distinct (user, day, bit) → per-(user, day) OR via sum of powers
    udb = fast_groupby_agg(
        ev.map_batches(_udt, batch_format="pyarrow"),
        ["user_id", "day", "bit"], {"__n": (None, "count")})

    def _mask(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"], "day": b["day"],
            "m": pa.array(
                np.int64(1) << b["bit"].to_numpy(zero_copy_only=False),
                pa.int64()),
        })

    ud = fast_groupby_agg(
        udb.map_batches(_mask, batch_format="pyarrow"),
        ["user_id", "day"], {"m": ("m", "sum")})

    def _part(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((_splitmix64(u) % np.uint64(P))
                             .astype(np.int64)))

    pop16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                     dtype=np.int64)

    def _window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        m = g["m"].to_numpy(np.int64)
        acc = m.copy()
        # per-user segments: searchsorted needs ONE monotone key — pack
        # (user, day) into an int64 (day < 2^22 ≈ 11k years of days)
        key = u * np.int64(1 << 22) + d
        for k in range(1, window_days):
            pos = np.searchsorted(key, key - k)
            hit = (pos < len(key)) & (key[np.minimum(pos, len(key) - 1)]
                                      == key - k)
            acc[hit] |= m[np.minimum(pos, len(key) - 1)][hit]
        return pd.DataFrame({
            "user_id": u, "day": d,
            "n_types_7d": pop16[acc],
        })

    return ud.map_batches(_part, batch_format="pyarrow") \
        .groupby("part").map_groups(_window, batch_format="pandas")


ORACLES["sliding_distinct_types"] = """
    WITH e AS (
        SELECT user_id,
               epoch_us(ts) // 86400000000 AS day,
               event_type
        FROM events
    ),
    d AS (SELECT DISTINCT user_id, day FROM e)
    SELECT d.user_id, d.day,
           CAST(count(DISTINCT e2.event_type) AS BIGINT) AS n_types_7d
    FROM d JOIN e e2
      ON e2.user_id = d.user_id
     AND e2.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.user_id, d.day
"""


def q_holt_forecast(sf_dir, horizon: int = 7):
    """Holt double exponential smoothing (level + trend, α = β = ½)
    over the daily event-count series, forecasting 7 days ahead — the
    trend-aware upgrade of daily_ewma and the simplest real forecaster
    a volume-monitoring pipeline runs. The recursion is EXACT ×1000
    integer fixed point: l_t = (1000·x_t + l_{t−1} + b_{t−1}) ÷ 2,
    b_t = (l_t − l_{t−1} + b_{t−1}) ÷ 2, both with TRUNCATING division
    mirrored to DuckDB's `//` semantics (which truncates toward zero —
    NOT floor — on negatives; the trend term goes negative).

    Plan: the distributed part is the calendar-bounded day-count fold
    (_daily_event_counts — constant-size exchange at any data scale);
    the recursion is inherently sequential and runs over that bounded
    series on the driver, mirrored by an unbounded-depth recursive CTE
    on the oracle side."""
    d = _daily_event_counts(sf_dir).sort_values("day")
    xs = [int(v) for v in d["x"]]
    n = len(xs)

    def tdiv(a: int, b: int) -> int:  # DuckDB // truncates toward zero
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    l = 1000 * xs[0]
    b = 1000 * (xs[1] - xs[0]) if n >= 2 else 0
    for x in xs[1:]:
        nl = tdiv(1000 * x + l + b, 2)
        b = tdiv(nl - l + b, 2)
        l = nl
    return pd.DataFrame([{
        "n_days": np.int64(n),
        "level_fp": np.int64(l),
        "trend_fp": np.int64(b),
        "forecast_7d_fp": np.int64(l + horizon * b),
    }])


ORACLES["holt_forecast"] = """
    WITH RECURSIVE d AS (
        SELECT epoch_ns(ts) // 86400000000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY day
    ),
    o AS (SELECT x, row_number() OVER (ORDER BY day) AS rn FROM d),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
    r AS (
        SELECT CAST(1 AS BIGINT) AS rn,
               CAST(1000 * (SELECT x FROM o WHERE rn = 1)
                    AS BIGINT) AS l,
               CAST(1000 * ((SELECT x FROM o WHERE rn = 2)
                            - (SELECT x FROM o WHERE rn = 1))
                    AS BIGINT) AS b
        UNION ALL
        SELECT s.rn, s.l, (s.l - s.pl + s.pb) // 2 AS b
        FROM (
            SELECT r.rn + 1 AS rn,
                   (1000 * o.x + r.l + r.b) // 2 AS l,
                   r.l AS pl, r.b AS pb
            FROM r JOIN o ON o.rn = r.rn + 1
        ) s
    )
    SELECT nn.n AS n_days,
           CAST(f.l AS BIGINT) AS level_fp,
           CAST(f.b AS BIGINT) AS trend_fp,
           CAST(f.l + 7 * f.b AS BIGINT) AS forecast_7d_fp
    FROM nn, (SELECT l, b FROM r ORDER BY rn DESC LIMIT 1) f
"""


def q_median_two_pass(sf_dir):
    """Exact global median over an UNBOUNDED value domain — the
    machinery grouped_median's bounded-histogram contract cannot give
    you: l_extendedprice spans ~10⁸ distinct cent values, far past any
    value-count fold. Classic two-pass radix refinement: pass 1 folds a
    4096-bucket coarse histogram (cents >> 12) and the driver locates
    the bucket holding the k-th rank (k = ⌈n/2⌉, the lower median);
    pass 2 folds a second 4096-value histogram of cents & 0xFFF INSIDE
    that bucket only (filter pushed into the map) and the driver reads
    the exact value off the cumulative counts. Each exchange is ≤ 4096
    rows at ANY data scale; two scans total, no sort, no row ever
    collected. (A k-th-smallest generalization is the same code with a
    different k.)"""
    li = T(sf_dir, "lineitem", ["l_extendedprice"])

    def _cents(b: pa.Table) -> np.ndarray:
        return _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)

    def _coarse(b: pa.Table) -> pa.Table:
        return pa.table({"bkt": pa.array(_cents(b) >> 12, pa.int64())})

    h1 = fast_groupby_agg(
        li.map_batches(_coarse, batch_format="pyarrow"),
        ["bkt"], {"c": (None, "count")}).to_pandas().sort_values("bkt")
    n = int(h1["c"].sum())
    k = (n + 1) // 2  # 1-indexed lower-median rank
    cum = h1["c"].cumsum().to_numpy(np.int64)
    i = int(np.searchsorted(cum, k))
    bkt = int(h1["bkt"].to_numpy(np.int64)[i])
    below = int(cum[i - 1]) if i else 0

    def _fine(b: pa.Table) -> pa.Table:
        c = _cents(b)
        c = c[(c >> 12) == bkt]
        return pa.table({"lo": pa.array(c & 0xFFF, pa.int64())})

    h2 = fast_groupby_agg(
        li.map_batches(_fine, batch_format="pyarrow"),
        ["lo"], {"c": (None, "count")}).to_pandas().sort_values("lo")
    cum2 = h2["c"].cumsum().to_numpy(np.int64)
    j = int(np.searchsorted(cum2, k - below))
    median_cents = (bkt << 12) | int(h2["lo"].to_numpy(np.int64)[j])
    return pd.DataFrame([{
        "n": np.int64(n), "k": np.int64(k),
        "median_cents": np.int64(median_cents),
    }])


ORACLES["median_two_pass"] = """
    WITH v AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        FROM lineitem
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  (count(*) + 1) // 2 AS k FROM v),
    r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v)
    SELECT nn.n, CAST(nn.k AS BIGINT) AS k,
           r.c AS median_cents
    FROM nn JOIN r ON r.rn = nn.k
"""


EDIT_JOIN_BUCKET_CAP = 10_000


def q_edit_distance_join(sf_dir, bucket_cap: int = EDIT_JOIN_BUCKET_CAP):
    """Edit-distance ≤ 1 self-join over supplier names — the
    entity-resolution blocking primitive (typo-tolerant key matching).
    SymSpell deletion-neighborhood blocking: every name emits itself
    plus each single-character deletion as a block key; two strings
    within edit distance 1 PROVABLY share a key (equal → the string
    itself; substitution at i → both i-deletions collide; insertion →
    the deletion at the inserted position equals the shorter string),
    so the block join loses no true pair, and sharing a key bounds the
    distance by 2 — one cheap vectorized verify finishes the job.

    Plan: flat-map names into (variant, key, name) rows (L+1 per row —
    constant blowup), ONE hash shuffle on the variant, per-bucket pair
    expansion (buckets are collision-neighborhood-sized; a bucket past
    ``bucket_cap`` — an identical-name pileup — raises loudly rather
    than degrade to silent O(n²)), a (a, b) distinct fold, then an
    equal-length mismatch-count / one-gap verify kernel. No driver
    state; the exchange carries short variant strings."""
    sup = T(sf_dir, "supplier", ["s_suppkey", "s_name"])

    def _variants(b: pa.Table) -> pa.Table:
        keys, names, vs = [], [], []
        for k, nm in zip(b["s_suppkey"].to_pylist(),
                         b["s_name"].to_pylist()):
            vs.append(nm)
            keys.append(k)
            names.append(nm)
            for i in range(len(nm)):
                vs.append(nm[:i] + nm[i + 1:])
                keys.append(k)
                names.append(nm)
        return pa.table({
            "v": pa.array(vs, pa.string()),
            "id": pa.array(keys, pa.int64()),
            "nm": pa.array(names, pa.string()),
        })

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id")
        if len(g) > bucket_cap:
            raise ValueError(
                f"edit-join bucket overflow ({len(g)} > {bucket_cap}): "
                "identical-name pileup; raise the cap or pre-dedup")
        if len(g) < 2:
            return pd.DataFrame({
                "a": pd.Series([], dtype=np.int64),
                "b": pd.Series([], dtype=np.int64),
                "na": pd.Series([], dtype=str),
                "nb": pd.Series([], dtype=str)})
        ids = g["id"].to_numpy(np.int64)
        nms = g["nm"].to_numpy()
        iu, ju = np.triu_indices(len(g), k=1)
        a, bb = ids[iu], ids[ju]
        na, nb = nms[iu], nms[ju]
        swap = a > bb
        a2 = np.where(swap, bb, a)
        b2 = np.where(swap, a, bb)
        return pd.DataFrame({
            "a": a2, "b": b2,
            "na": np.where(swap, nb, na), "nb": np.where(swap, na, nb)})

    cand = sup.map_batches(_variants, batch_format="pyarrow") \
        .groupby("v").map_groups(_pairs, batch_format="pandas")
    dedup = fast_groupby_agg(cand, ["a", "b", "na", "nb"],
                             {"__n": (None, "count")})

    def _verify(b: pa.Table) -> pa.Table:
        na = b["na"].to_pylist()
        nb = b["nb"].to_pylist()
        la = np.array([len(x) for x in na], np.int64)
        lb = np.array([len(x) for x in nb], np.int64)
        dist = np.full(len(na), 2, np.int64)
        # equal-length pairs (the dominant case): byte-matrix mismatch
        # count per length group — no per-character Python
        eq = np.flatnonzero(la == lb)
        for L in np.unique(la[eq]):
            sel = eq[la[eq] == L]
            if L == 0:
                dist[sel] = 0
                continue
            ma = np.frombuffer(
                "".join(na[i] for i in sel).encode("utf-8",
                                                   "surrogatepass"),
                np.uint8)
            mb = np.frombuffer(
                "".join(nb[i] for i in sel).encode("utf-8",
                                                   "surrogatepass"),
                np.uint8)
            if len(ma) == len(sel) * L and len(mb) == len(sel) * L:
                mm = (ma.reshape(-1, L) != mb.reshape(-1, L)).sum(axis=1)
                dist[sel] = np.minimum(mm, 2)
            else:  # multi-byte codepoints: per-pair fallback
                for i in sel:
                    dist[i] = min(sum(
                        cx != cy for cx, cy in zip(na[i], nb[i])), 2)
        # length-diff-1 pairs: one-gap check (insertion/deletion)
        for i in np.flatnonzero(np.abs(la - lb) == 1):
            x, y = (na[i], nb[i]) if la[i] < lb[i] else (nb[i], na[i])
            k = 0
            while k < len(x) and x[k] == y[k]:
                k += 1
            dist[i] = 1 if x[k:] == y[k + 1:] else 2
        t = pa.table({
            "a": b["a"], "b": b["b"],
            "dist": pa.array(dist, pa.int64()),
        })
        return t.filter(pc.less_equal(t["dist"], 1))

    return dedup.drop_columns(["__n"]) \
        .map_batches(_verify, batch_format="pyarrow")


ORACLES["edit_distance_join"] = """
    SELECT a.s_suppkey AS a, b.s_suppkey AS b,
           CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
    FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


# ==================================================== WL refinement


def q_wl_refinement(sf_dir, rounds: int = 2):
    """1-WL (Weisfeiler–Leman) color refinement over the derived order
    graph — the canonical graph-fingerprint primitive behind graph
    dedup, isomorphism screening and GNN expressivity tests: start from
    degree colors, then each round every node's new color is the hash
    of (own color, SORTED multiset of neighbor colors). The output is
    the final color histogram (color, n_nodes) — the refinement
    partition any two isomorphic graphs must share.

    Exact oracle: colors are md5 hex strings (hashlib.md5 ≡ DuckDB
    ``md5()``, both lowercase hex); the per-round signature is
    ``col || '|' || ','.join(sorted(neighbor_cols))`` where the sort is
    plain lexicographic — md5 hex and decimal degree strings are ASCII,
    so Python ``sorted()`` matches DuckDB's binary varchar ORDER BY
    byte for byte. Isolated nodes never enter the edge joins; their
    color evolves in closed form (deg "0", then md5 of sig with an
    empty neighbor list each round) and is appended as one histogram
    row, mirrored by the oracle's UNION ALL branch.

    Scale plan: per round, TWO hash joins ship each und edge its
    endpoint colors (edge-list-sized exchanges, node-domain-sized color
    table), then one splitmix64(node) % P shuffle into a vectorized
    per-partition pandas kernel (lexsort, groupby-join, one md5 per
    NODE — node-domain-sized work, never edge-sized Python). No driver
    state beyond two scalars (|V|, |V with deg>0|)."""
    from ..functions.sketches import _splitmix64

    P = 32
    cust = T(sf_dir, "customer", ["c_custkey"])
    n = cust.count()
    edges = _pagerank_edges(sf_dir, n)

    def _sym(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        a = np.concatenate([s, d])
        bb = np.concatenate([d, s])
        keep = a != bb
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(bb[keep], pa.int64())})

    und = fast_groupby_agg(
        edges.map_batches(_sym, batch_format="pyarrow"),
        ["a", "b"], {"__n": (None, "count")}) \
        .drop_columns(["__n"]).materialize()

    colors = fast_groupby_agg(und, ["a"], {"deg": (None, "count")}) \
        .map_batches(
            lambda t: pa.table({
                "node": t["a"],
                "col": pc.cast(t["deg"], pa.string()),
            }), batch_format="pyarrow").materialize()
    n_active = colors.count()

    def _part(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": t["a"], "ncol": t["ncol"], "col": t["col"],
            "part": pa.array(
                (_splitmix64(a) % np.uint64(P)).astype(np.int64)),
        })

    def _sig(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "node": pd.Series([], dtype=np.int64),
                "col": pd.Series([], dtype=object)})
        g = g.sort_values(["a", "ncol"], kind="mergesort")
        gb = g.groupby("a", sort=True)
        sig = gb["col"].first() + "|" + gb["ncol"].agg(",".join)
        return pd.DataFrame({
            "node": sig.index.to_numpy(np.int64),
            "col": [hashlib.md5(s.encode()).hexdigest()
                    for s in sig.to_numpy()]})

    for _ in range(rounds):
        nbr = colors.map_batches(
            lambda t: pa.table({"bnode": t["node"], "ncol": t["col"]}),
            batch_format="pyarrow")
        own = colors.map_batches(
            lambda t: pa.table({"anode": t["node"], "col": t["col"]}),
            batch_format="pyarrow")
        nb = und.join(nbr, "inner", num_partitions=JOIN_PARTS,
                      on=("b",), right_on=("bnode",))
        nb = nb.join(own, "inner", num_partitions=JOIN_PARTS,
                     on=("a",), right_on=("anode",))
        colors = nb.map_batches(_part, batch_format="pyarrow") \
            .groupby("part").map_groups(_sig, batch_format="pandas") \
            .materialize()

    hist = fast_groupby_agg(colors, ["col"],
                            {"n_nodes": (None, "count")}) \
        .map_batches(
            lambda t: pa.table({
                "color": t["col"],
                "n_nodes": pc.cast(t["n_nodes"], pa.int64()),
            }), batch_format="pyarrow")

    n_iso = n - n_active
    if n_iso > 0:
        c = "0"
        for _ in range(rounds):
            c = hashlib.md5((c + "|").encode()).hexdigest()
        iso = ray.data.from_items([{"color": c, "n_nodes": n_iso}])
        hist = hist.union(iso)
    return hist


ORACLES["wl_refinement"] = """
    WITH nn AS (SELECT count(*) AS n FROM customer),
    e AS (SELECT o_custkey AS s,
                 o_orderkey % (SELECT n FROM nn) AS d
          FROM orders),
    und AS (SELECT DISTINCT a, b FROM (
            SELECT s AS a, d AS b FROM e WHERE s <> d
            UNION ALL
            SELECT d AS a, s AS b FROM e WHERE s <> d)),
    c0 AS (SELECT a AS node, CAST(count(*) AS VARCHAR) AS col
           FROM und GROUP BY a),
    r1 AS (SELECT u.a AS node,
                  md5(c.col || '|' ||
                      string_agg(nc.col, ',' ORDER BY nc.col)) AS col
           FROM und u
           JOIN c0 c ON c.node = u.a
           JOIN c0 nc ON nc.node = u.b
           GROUP BY u.a, c.col),
    r2 AS (SELECT u.a AS node,
                  md5(c.col || '|' ||
                      string_agg(nc.col, ',' ORDER BY nc.col)) AS col
           FROM und u
           JOIN r1 c ON c.node = u.a
           JOIN r1 nc ON nc.node = u.b
           GROUP BY u.a, c.col),
    hist AS (SELECT col AS color, CAST(count(*) AS BIGINT) AS n_nodes
             FROM r2 GROUP BY col),
    iso AS (SELECT md5(md5('0|') || '|') AS color,
                   CAST((SELECT n FROM nn)
                        - (SELECT count(*) FROM c0) AS BIGINT)
                   AS n_nodes)
    SELECT color, n_nodes FROM hist
    UNION ALL
    SELECT color, n_nodes FROM iso WHERE n_nodes > 0
"""


# ==================================================== BM25 retrieval


BM25_QUERY_TERMS = ("merge", "stream", "window", "hash", "filter", "spark")


def q_bm25_retrieval(sf_dir, k: int = 20):
    """Okapi BM25 top-k retrieval over the document corpus for a fixed
    6-term query — the LOG-FREE integer-exact companion to q_bm25_topk
    (which mirrors the standard ln-idf float expression op-for-op):
    same k1 = 1.2 / b = 0.75 saturation, but every quantity here is an
    integer, so the scores are reproducible on any libm.
    All arithmetic is exact integer: the tf-saturation term
    tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) is cleared of floats by
    multiplying through by 10·T (T = total corpus tokens, avgdl = T/N),
    giving 22·T·tf // (10·T·tf + 3·T + 9·dl·N); the idf is the
    Robertson–Spärck-Jones odds (N−df+0.5)/(df+0.5) =
    (2(N−df)+1)/(2df+1) quantized ×10⁶ — monotone in the standard
    log-idf but bit-exact across engines (ln is not correctly rounded;
    the engine-wide ulp-parity policy). Per-term contributions are
    floor-divided then summed (≤ 2.2·odds_fp ≈ 10¹¹ each — int64-safe
    output, HUGEINT intermediates on the SQL side).

    Scale plan: pass 1 tokenizes each doc ONCE (same _TOKEN contract
    as q_term_doc_freq) into a doc-count-sized skinny stats table
    (doc_id, dl, tf per query term); a constant-width fold yields N,
    T and the 6 dfs (the only driver scalars); pass 2 filters to
    matched docs vectorized and scores them with Python-int exactness
    (matched-postings-sized loop, ≤6 terms/doc); a distributed
    sort+limit picks the top k. No corpus-sized driver state, no
    shuffle join — the query side is 9 broadcast integers."""
    from collections import Counter

    docs = T(sf_dir, "documents", ["doc_id", "text"])
    terms = BM25_QUERY_TERMS
    nt = len(terms)

    def _stats(b: pa.Table) -> pa.Table:
        dl: list[int] = []
        tfs: list[list[int]] = [[] for _ in range(nt)]
        for txt in b["text"].to_pylist():
            c = Counter(_TOKEN.findall(txt.lower()))
            dl.append(sum(c.values()))
            for j, t in enumerate(terms):
                tfs[j].append(c.get(t, 0))
        out = {"doc_id": b["doc_id"], "dl": pa.array(dl, pa.int64())}
        for j in range(nt):
            out[f"tf{j}"] = pa.array(tfs[j], pa.int64())
        return pa.table(out)

    stats = docs.map_batches(_stats, batch_format="pyarrow").materialize()

    def _fold(b: pa.Table) -> pa.Table:
        part = {"n": pa.array([len(b)], pa.int64()),
                "t": pa.array([int(pc.sum(b["dl"]).as_py() or 0)],
                              pa.int64())}
        for j in range(nt):
            part[f"df{j}"] = pa.array(
                [int(pc.sum(pc.cast(pc.greater(b[f"tf{j}"], 0),
                                    pa.int64())).as_py() or 0)],
                pa.int64())
        return pa.table(part)

    g = stats.map_batches(_fold, batch_format="pyarrow").to_pandas().sum()
    n_docs, t_tok = int(g["n"]), int(g["t"])
    odds = [((2 * (n_docs - int(g[f"df{j}"])) + 1) * 10**6)
            // (2 * int(g[f"df{j}"]) + 1) for j in range(nt)]

    def _score(b: pa.Table) -> pa.Table:
        tf = np.stack([b[f"tf{j}"].to_numpy(zero_copy_only=False)
                       for j in range(nt)], axis=1)
        keep = tf.sum(axis=1) > 0
        ids = b["doc_id"].to_numpy(zero_copy_only=False)[keep]
        dl = b["dl"].to_numpy(zero_copy_only=False)[keep]
        tf = tf[keep]
        scores, matched = [], []
        for i in range(len(ids)):
            s, m, d = 0, 0, int(dl[i])
            for j in range(nt):
                f = int(tf[i, j])
                if f:
                    m += 1
                    s += (odds[j] * 22 * t_tok * f) // (
                        10 * t_tok * f + 3 * t_tok + 9 * d * n_docs)
            scores.append(s)
            matched.append(m)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "score_fp": pa.array(scores, pa.int64()),
            "dl": pa.array(dl, pa.int64()),
            "n_matched": pa.array(matched, pa.int64()),
        })

    return stats.map_batches(_score, batch_format="pyarrow") \
        .sort(["score_fp", "doc_id"], descending=[True, False]).limit(k)


ORACLES["bm25_retrieval"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text),
                                            '[^a-z0-9_]+')) AS term
        FROM documents),
    tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
    g AS (SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT count(*) FROM tok2) AS t),
    q(term) AS (VALUES ('merge'), ('stream'), ('window'),
                       ('hash'), ('filter'), ('spark')),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM tok2 JOIN q USING (term) GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df
           FROM tok2 JOIN q USING (term) GROUP BY term),
    odds AS (SELECT term,
                    ((2 * ((SELECT n FROM g) - df) + 1) * 1000000)
                        // (2 * df + 1) AS odds_fp
             FROM df),
    s AS (SELECT tf.doc_id,
                 CAST(sum((CAST(odds.odds_fp AS HUGEINT) * 22
                           * (SELECT t FROM g) * tf.tf)
                     // (10 * CAST((SELECT t FROM g) AS HUGEINT) * tf.tf
                         + 3 * (SELECT t FROM g)
                         + 9 * CAST(dl.dl AS HUGEINT)
                             * (SELECT n FROM g))) AS BIGINT) AS score_fp,
                 CAST(count(*) AS BIGINT) AS n_matched,
                 CAST(any_value(dl.dl) AS BIGINT) AS dl
          FROM tf JOIN odds USING (term) JOIN dl USING (doc_id)
          GROUP BY tf.doc_id)
    SELECT doc_id, score_fp, dl, n_matched
    FROM s ORDER BY score_fp DESC, doc_id LIMIT 20
"""


# ==================================================== grouped OLS trend


OLS_DAY0 = 8000  # pinned epoch-day re-base, stated in the oracle SQL


def q_grouped_ols(sf_dir):
    """Per-group ordinary-least-squares trend (slope + intercept) of
    order value in cents against epoch day — the grouped linear-fit
    primitive behind drift monitors and per-segment forecasts. The
    five-moment decomposition (n, Σx, Σy, Σxy, Σx²) is a mergeable
    map-side fold — ONE constant-width row per group crosses the wire —
    and the closed forms
        slope_fp     = (n·Σxy − Σx·Σy)·10⁶ // (n·Σx² − (Σx)²)
        intercept_fp = (Σy·Σx² − Σx·Σxy)·10⁶ // (n·Σx² − (Σx)²)
    are evaluated on the 5-row group domain in arbitrary-precision
    Python ints, floor division mirrored to the oracle's negative-
    remainder-corrected `//` (theil_sen's correction; den > 0 by
    Cauchy–Schwarz whenever a group spans ≥2 distinct days). x is
    re-based to epoch_day − 8000 (pinned in the SQL) so the int64
    per-row products xy stay ≲1.6e11 and block partials are safe to
    sf≈100; past that the fold would carry split hi/lo limbs."""
    orders = T(sf_dir, "orders",
               ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def _mom(b: pa.Table) -> pa.Table:
        x = (_ts_ns(b["o_orderdate"]) // 86_400_000_000_000
             - OLS_DAY0).astype(np.int64)
        y = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "x": pa.array(x), "y": pa.array(y),
            "xy": pa.array(x * y), "xx": pa.array(x * x),
        })

    m = fast_groupby_agg(
        orders.map_batches(_mom, batch_format="pyarrow"),
        ["o_orderpriority"], {
            "n": (None, "count"), "sx": ("x", "sum"), "sy": ("y", "sum"),
            "sxy": ("xy", "sum"), "sxx": ("xx", "sum"),
        }).to_pandas().sort_values("o_orderpriority")

    rows = []
    for r in m.itertuples(index=False):
        n, sx, sy, sxy, sxx = (int(r.n), int(r.sx), int(r.sy),
                               int(r.sxy), int(r.sxx))
        den = n * sxx - sx * sx
        rows.append({
            "o_orderpriority": r.o_orderpriority,
            "n": n,
            "slope_fp": (n * sxy - sx * sy) * 10**6 // den,
            "intercept_fp": (sy * sxx - sx * sxy) * 10**6 // den,
        })
    out = pd.DataFrame(rows)
    for c in ("n", "slope_fp", "intercept_fp"):
        out[c] = out[c].astype(np.int64)
    return out


ORACLES["grouped_ols"] = """
    WITH m AS (
        SELECT o_orderpriority,
               count(*) AS n,
               sum(CAST(epoch_us(o_orderdate) // 86400000000 - 8000
                        AS HUGEINT)) AS sx,
               sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                        AS HUGEINT)) AS sy,
               sum(CAST(epoch_us(o_orderdate) // 86400000000 - 8000
                        AS HUGEINT)
                   * CAST(round(o_totalprice * 100) AS BIGINT)) AS sxy,
               sum(CAST(epoch_us(o_orderdate) // 86400000000 - 8000
                        AS HUGEINT)
                   * (epoch_us(o_orderdate) // 86400000000 - 8000))
                   AS sxx
        FROM orders GROUP BY o_orderpriority),
    d AS (SELECT o_orderpriority, n,
                 (n * sxy - sx * sy) * 1000000 AS num_s,
                 (sy * sxx - sx * sxy) * 1000000 AS num_i,
                 (n * sxx - sx * sx) AS den
          FROM m)
    SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
           CAST(num_s // den
                - CASE WHEN num_s % den <> 0 AND num_s < 0
                       THEN 1 ELSE 0 END AS BIGINT) AS slope_fp,
           CAST(num_i // den
                - CASE WHEN num_i % den <> 0 AND num_i < 0
                       THEN 1 ELSE 0 END AS BIGINT) AS intercept_fp
    FROM d ORDER BY o_orderpriority
"""


# ==================================================== RRF rank fusion


def q_rrf_customer_fusion(sf_dir, k: int = 20, rrf_k: int = 60):
    """Reciprocal-rank fusion of two full customer rankings — by total
    revenue and by order frequency — the standard score-free ensemble
    rule for merging heterogeneous retrieval/ranking lists
    (Cormack et al., SIGIR'09): rrf_fp = Σ 10⁹ // (60 + rank_i), all
    integer, so fusion is bit-deterministic.

    Scale plan: ONE per-customer mergeable fold (Σcents, count), then
    each ranking is a distributed sort whose global row_numbers are
    stitched WITHOUT a driver materialization: per-block (first-key,
    count) summaries (block-count-sized) order the blocks and yield
    prefix offsets; per-block remote tasks attach offset+arange. The
    two rank tables hash-join on custkey and a distributed top-k
    returns k rows. Driver state: O(blocks) ints per ranking."""
    orders = T(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["o_custkey"],
            "cents": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)),
        })

    per = fast_groupby_agg(
        orders.map_batches(_fp, batch_format="pyarrow"),
        ["c_custkey"], {"cents": ("cents", "sum"),
                        "f": (None, "count")}).materialize()

    def _ranked(metric: str, rank_name: str):
        srt = per.sort([metric, "c_custkey"], descending=[True, False])
        refs = srt.to_arrow_refs()

        @ray.remote
        def _head(t: pa.Table):
            if t.num_rows == 0:
                return None
            return (int(t[metric][0].as_py()),
                    int(t["c_custkey"][0].as_py()), t.num_rows)

        heads = ray.get([_head.remote(r) for r in refs])
        order = sorted(
            (i for i, h in enumerate(heads) if h is not None),
            key=lambda i: (-heads[i][0], heads[i][1]))
        offs, acc = {}, 0
        for i in order:
            offs[i] = acc
            acc += heads[i][2]

        @ray.remote
        def _rk(t: pa.Table, off: int):
            return pa.table({
                "c_custkey": t["c_custkey"],
                rank_name: pa.array(
                    np.arange(off + 1, off + 1 + t.num_rows,
                              dtype=np.int64)),
            })

        return ray.data.from_arrow_refs(
            [_rk.remote(r, offs[i]) for i, r in enumerate(refs)
             if heads[i] is not None])

    ra = _ranked("cents", "rank_rev")
    rb = _ranked("f", "rank_freq")
    fused = ra.join(rb, "inner", num_partitions=JOIN_PARTS, on=("c_custkey",))

    def _score(b: pa.Table) -> pa.Table:
        x = b["rank_rev"].to_numpy(zero_copy_only=False)
        y = b["rank_freq"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": b["c_custkey"],
            "rank_rev": b["rank_rev"], "rank_freq": b["rank_freq"],
            "rrf_fp": pa.array(10**9 // (rrf_k + x) + 10**9 // (rrf_k + y)),
        })

    return fused.map_batches(_score, batch_format="pyarrow") \
        .sort(["rrf_fp", "c_custkey"], descending=[True, False]).limit(k)


ORACLES["rrf_customer_fusion"] = """
    WITH per AS (
        SELECT o_custkey AS c,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
               count(*) AS f
        FROM orders GROUP BY o_custkey),
    r AS (SELECT c,
                 row_number() OVER (ORDER BY cents DESC, c) AS ra,
                 row_number() OVER (ORDER BY f DESC, c) AS rb
          FROM per)
    SELECT c AS c_custkey,
           CAST(ra AS BIGINT) AS rank_rev,
           CAST(rb AS BIGINT) AS rank_freq,
           CAST(1000000000 // (60 + ra)
                + 1000000000 // (60 + rb) AS BIGINT) AS rrf_fp
    FROM r ORDER BY rrf_fp DESC, c LIMIT 20
"""


# ==================================================== priority sampling


def q_priority_sample(sf_dir, k: int = 100):
    """Priority sampling (Duffield–Lund–Thorup, JACM'07):
    weight-proportional WITHOUT-replacement sample of k orders, the
    subset-sum-unbiased sampling rule a 100-TB pipeline uses to keep
    a small audit sample whose Horvitz–Thompson estimates stay
    unbiased. Each row draws priority = H // w with H the 60-bit md5
    of its key (the engine's pinned uniform-hash convention —
    table_checksum's substr(md5, 1, 15)) and w its weight in cents;
    the k SMALLEST priorities win (u/w small ⇔ w/u large), so heavy
    rows are near-certain members. Fully distributed: one vectorized
    scan computes priorities, a distributed sort+limit picks k — no
    shuffle, no driver state. H < 2⁶⁰ and w ≥ 1 keep the priority in
    int64. Ties broken by o_orderkey (md5 collisions aside, the order
    is total)."""
    orders = T(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _prio(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].to_numpy(zero_copy_only=False)
        w = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        hv = np.fromiter(
            (int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15], 16)
             for x in keys),
            dtype=np.int64, count=len(keys))
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "w_cents": pa.array(w),
            "prio": pa.array(hv // w),
        })

    return orders.map_batches(_prio, batch_format="pyarrow") \
        .sort(["prio", "o_orderkey"]).limit(k)


ORACLES["priority_sample"] = """
    WITH h AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents,
               CAST(concat('0x', substr(md5(
                   CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        FROM orders)
    SELECT o_orderkey, w_cents,
           CAST(hv // w_cents AS BIGINT) AS prio
    FROM h ORDER BY prio, o_orderkey LIMIT 100
"""


# ================================================ deterministic random walks


RW_STEPS = 4       # walk length (pinned in the oracle's unrolled CTEs)
RW_START_MOD = 7   # start set: active nodes ≡ 0 (mod 7)


def q_graph_random_walks(sf_dir):
    """Deterministic random-walk corpus over the derived order graph —
    the node2vec/DeepWalk TRAINING-DATA generator (walks are the
    sentences graph-embedding models train on), made bit-reproducible:
    from every start node (degree ≥ 1, node ≡ 0 mod 7) take RW_STEPS
    steps where the move out of v at step t of walk w is the
    r = md5₆₀(w|t|v) mod deg(v) -th SMALLEST neighbor of v. md5 replay
    makes the "randomness" a pure function both engines state verbatim
    (the table_checksum substr(md5,1,15) convention), so the corpus —
    not a statistic of it — is the oracle-checked output.

    Scale plan: the adjacency list is built ONCE with global neighbor
    ranks via a splitmix64(v)-partitioned vectorized lexsort kernel
    (no per-node Python); each step is ONE hash join of the
    walk-frontier against (v, rank) — walk-count-sized probe rows, L
    joins total, mirroring pagerank's join-per-round plan. No driver
    state; the md5s are computed on walk rows only (|starts| rows per
    step, not edges)."""
    from ..functions.sketches import _splitmix64

    P = 32
    cust = T(sf_dir, "customer", ["c_custkey"])
    n = cust.count()
    edges = _pagerank_edges(sf_dir, n)

    def _sym(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        a = np.concatenate([s, d])
        bb = np.concatenate([d, s])
        keep = a != bb
        return pa.table({"v": pa.array(a[keep], pa.int64()),
                         "nbr": pa.array(bb[keep], pa.int64())})

    und = fast_groupby_agg(
        edges.map_batches(_sym, batch_format="pyarrow"),
        ["v", "nbr"], {"__n": (None, "count")}).drop_columns(["__n"])

    def _part(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({
            "v": t["v"], "nbr": t["nbr"],
            "part": pa.array(
                (_splitmix64(v) % np.uint64(P)).astype(np.int64)),
        })

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["v", "nbr"], kind="mergesort")
        rn = g.groupby("v", sort=False).cumcount()
        return pd.DataFrame({
            "av": g["v"].to_numpy(np.int64),
            "rn": rn.to_numpy(np.int64),
            "nbr": g["nbr"].to_numpy(np.int64)})

    adj = und.map_batches(_part, batch_format="pyarrow") \
        .groupby("part").map_groups(_rank, batch_format="pandas") \
        .materialize()
    deg = fast_groupby_agg(adj, ["av"], {"deg": (None, "count")}) \
        .map_batches(lambda t: pa.table({"dv": t["av"], "deg": t["deg"]}),
                     batch_format="pyarrow").materialize()

    def _starts(t: pa.Table) -> pa.Table:
        v = t["dv"].to_numpy(zero_copy_only=False)
        keep = v % RW_START_MOD == 0
        return pa.table({"walk_id": pa.array(v[keep], pa.int64()),
                         "v": pa.array(v[keep], pa.int64())})

    frontier = deg.map_batches(_starts, batch_format="pyarrow")
    out = frontier.map_batches(
        lambda t: pa.table({"walk_id": t["walk_id"],
                            "step": pa.array([0] * len(t), pa.int64()),
                            "node": t["v"]}), batch_format="pyarrow")

    for t_step in range(1, RW_STEPS + 1):
        cur = frontier.join(deg, "inner", num_partitions=JOIN_PARTS,
                            on=("v",), right_on=("dv",))

        def _pick(b: pa.Table, _t=t_step) -> pa.Table:
            w = b["walk_id"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            dg = b["deg"].to_numpy(zero_copy_only=False)
            r = np.fromiter(
                (int(hashlib.md5(f"{int(wi)}|{_t}|{int(vi)}".encode())
                     .hexdigest()[:15], 16) % int(di)
                 for wi, vi, di in zip(w, v, dg)),
                dtype=np.int64, count=len(w))
            return pa.table({"walk_id": b["walk_id"], "jv": b["v"],
                             "jr": pa.array(r)})

        nxt = cur.map_batches(_pick, batch_format="pyarrow") \
            .join(adj, "inner", num_partitions=JOIN_PARTS,
                  on=("jv", "jr"), right_on=("av", "rn"))
        frontier = nxt.map_batches(
            lambda t: pa.table({"walk_id": t["walk_id"], "v": t["nbr"]}),
            batch_format="pyarrow").materialize()
        out = out.union(frontier.map_batches(
            lambda t, _t=t_step: pa.table({
                "walk_id": t["walk_id"],
                "step": pa.array([_t] * len(t), pa.int64()),
                "node": t["v"]}), batch_format="pyarrow"))
    return out


ORACLES["graph_random_walks"] = """
    WITH nn AS (SELECT count(*) AS n FROM customer),
    e AS (SELECT o_custkey AS s,
                 o_orderkey % (SELECT n FROM nn) AS d
          FROM orders),
    und AS (SELECT DISTINCT v, nbr FROM (
            SELECT s AS v, d AS nbr FROM e WHERE s <> d
            UNION ALL
            SELECT d AS v, s AS nbr FROM e WHERE s <> d)),
    adj AS (SELECT v, nbr,
                   row_number() OVER (PARTITION BY v ORDER BY nbr) - 1
                       AS rn,
                   count(*) OVER (PARTITION BY v) AS deg
            FROM und),
    dv AS (SELECT DISTINCT v, deg FROM adj),
    w0 AS (SELECT v AS walk_id, v FROM dv WHERE v % 7 = 0),
    w1 AS (SELECT w.walk_id, a.nbr AS v
           FROM w0 w JOIN dv d ON d.v = w.v
           JOIN adj a ON a.v = w.v AND a.rn =
               CAST(concat('0x', substr(md5(
                   CAST(w.walk_id AS VARCHAR) || '|1|' ||
                   CAST(w.v AS VARCHAR)), 1, 15)) AS BIGINT) % d.deg),
    w2 AS (SELECT w.walk_id, a.nbr AS v
           FROM w1 w JOIN dv d ON d.v = w.v
           JOIN adj a ON a.v = w.v AND a.rn =
               CAST(concat('0x', substr(md5(
                   CAST(w.walk_id AS VARCHAR) || '|2|' ||
                   CAST(w.v AS VARCHAR)), 1, 15)) AS BIGINT) % d.deg),
    w3 AS (SELECT w.walk_id, a.nbr AS v
           FROM w2 w JOIN dv d ON d.v = w.v
           JOIN adj a ON a.v = w.v AND a.rn =
               CAST(concat('0x', substr(md5(
                   CAST(w.walk_id AS VARCHAR) || '|3|' ||
                   CAST(w.v AS VARCHAR)), 1, 15)) AS BIGINT) % d.deg),
    w4 AS (SELECT w.walk_id, a.nbr AS v
           FROM w3 w JOIN dv d ON d.v = w.v
           JOIN adj a ON a.v = w.v AND a.rn =
               CAST(concat('0x', substr(md5(
                   CAST(w.walk_id AS VARCHAR) || '|4|' ||
                   CAST(w.v AS VARCHAR)), 1, 15)) AS BIGINT) % d.deg)
    SELECT walk_id, CAST(0 AS BIGINT) AS step, v AS node FROM w0
    UNION ALL SELECT walk_id, CAST(1 AS BIGINT), v FROM w1
    UNION ALL SELECT walk_id, CAST(2 AS BIGINT), v FROM w2
    UNION ALL SELECT walk_id, CAST(3 AS BIGINT), v FROM w3
    UNION ALL SELECT walk_id, CAST(4 AS BIGINT), v FROM w4
"""


# ==================================================== length-2 betweenness


def q_betweenness_len2(sf_dir):
    """Exact length-2 betweenness (bridging centrality) over the
    derived order graph: for every NON-adjacent pair {s,t} with c ≥ 1
    common neighbors, d(s,t) = 2 and every shortest path runs through
    exactly one common neighbor, so each common neighbor v earns
    σ_sv·σ_vt/σ_st = 1/c. This is the d≤2 slice of Brandes'
    betweenness — the slice that is exactly SQL-expressible — and it
    is computed in PURE integer arithmetic (credit = 10⁹ // c, floor
    division mirrored verbatim in the oracle), so the comparison is
    bitwise, not float-tolerant.

    Scale plan: identical wedge topology to q_clustering_coefficient
    (adjacency self-join keyed on the wedge CENTER — volume Σ deg²,
    partitioned hash joins throughout); the pair table is
    de-adjacencied with ONE anti-join against the distinct edge list,
    then joined back to the wedge rows for per-center credit. No
    driver state, no all-pairs: everything is wedge- or node-sized."""
    n = T(sf_dir, "customer", ["c_custkey"]).count()
    raw = _pagerank_edges(sf_dir, n)

    def _norm(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "u": pa.array(np.minimum(s, d), pa.int64()),
            "v": pa.array(np.maximum(s, d), pa.int64()),
        })

    edges = fast_groupby_agg(
        raw.map_batches(_norm, batch_format="pyarrow"),
        ["u", "v"], {"_n": (None, "count")},
    ).map_batches(lambda b: b.select(["u", "v"]),
                  batch_format="pyarrow").materialize()
    adj = edges.map_batches(
        lambda b: pa.table({
            "c": pa.array(np.concatenate(
                [b["u"].to_numpy(zero_copy_only=False),
                 b["v"].to_numpy(zero_copy_only=False)]), pa.int64()),
            "nb": pa.array(np.concatenate(
                [b["v"].to_numpy(zero_copy_only=False),
                 b["u"].to_numpy(zero_copy_only=False)]), pa.int64()),
        }),
        batch_format="pyarrow").materialize()
    right = adj.map_batches(
        lambda b: b.rename_columns(["c_r", "nb2"]),
        batch_format="pyarrow")
    wedges = adj.join(right, "inner", num_partitions=JOIN_PARTS,
                      on=("c",), right_on=("c_r",)).map_batches(
        lambda b: b.filter(pc.less(b["nb"], b["nb2"]))
        .rename_columns(["ctr", "a", "b"]),
        batch_format="pyarrow").materialize()
    pairs = fast_groupby_agg(wedges, ["a", "b"], {"n_cn": (None, "count")})
    nonadj = pairs.join(
        edges.map_batches(lambda b: b.rename_columns(["a_r", "b_r"]),
                          batch_format="pyarrow"),
        "left_anti", num_partitions=JOIN_PARTS, on=("a", "b"),
        right_on=("a_r", "b_r"))
    credited = wedges.join(nonadj, "inner", num_partitions=JOIN_PARTS,
                           on=("a", "b"))

    def _credit(b: pa.Table) -> pa.Table:
        c = b["n_cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": b["ctr"],
            "credit": pa.array(10**9 // c, pa.int64()),
        })

    scored = credited.map_batches(_credit, batch_format="pyarrow")
    return fast_groupby_agg(
        scored, ["node"],
        {"n_pairs": (None, "count"), "bw2_fp": ("credit", "sum")})


ORACLES["betweenness_len2"] = """
    WITH nn AS (SELECT count(*) AS n FROM customer),
    raw AS (SELECT o_custkey AS s,
                   o_orderkey % (SELECT n FROM nn) AS d
            FROM orders),
    e AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
          FROM raw WHERE s <> d),
    adj AS (SELECT u AS c, v AS nb FROM e
            UNION ALL SELECT v AS c, u AS nb FROM e),
    wedge AS (SELECT a1.c AS ctr, a1.nb AS a, a2.nb AS b
              FROM adj a1 JOIN adj a2
                ON a1.c = a2.c AND a1.nb < a2.nb),
    pairs AS (SELECT a, b, count(*) AS n_cn FROM wedge GROUP BY a, b),
    nonadj AS (SELECT p.a, p.b, p.n_cn FROM pairs p
               ANTI JOIN e ON e.u = p.a AND e.v = p.b)
    SELECT w.ctr AS node,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(1000000000 // na.n_cn) AS BIGINT) AS bw2_fp
    FROM wedge w JOIN nonadj na ON na.a = w.a AND na.b = w.b
    GROUP BY w.ctr
"""


# ===================================================== growth accounting


def q_growth_accounting(sf_dir):
    """Daily growth accounting over event activity — the standard
    DAU decomposition (new / retained / resurrected, plus churned
    attributed to the day AFTER last activity): for each user-day,
    classify it against the user's previous active day, and count
    churn events where the next active day is not adjacent. Extends
    q_cohort_retention (fixed cohort × offset matrix) with the
    flow-based view growth teams actually chart. Days are integer
    epoch-day indexed so every comparison is int64 — no interval
    arithmetic to disagree on. (Day granularity because the synthetic
    event stream spans one month; the plan is period-agnostic.)

    Scale plan: ONE distinct-pair groupby collapses events to
    user-days (mergeable, exchange is active-pairs-sized); the
    classification is a per-user map_groups whose groups are
    months-per-user-sized (bounded by the calendar, not the data); the
    final month × kind rollup is a tiny groupby. The only driver state
    is the global max month (one int)."""
    from ray.data.aggregate import Max

    ev = T(sf_dir, "events", ["user_id", "ts"])

    def _um(b: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(b["ts"], pa.date32()), pa.int32()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "m": pa.array(d.astype(np.int64), pa.int64())})

    pairs = fast_groupby_agg(
        ev.map_batches(_um, batch_format="pyarrow"),
        ["user_id", "m"], {"_n": (None, "count")}) \
        .drop_columns(["_n"]).materialize()
    mm = pairs.aggregate(Max("m"))["max(m)"]

    def _classify(g: pd.DataFrame) -> pd.DataFrame:
        ms = np.sort(g["m"].to_numpy(np.int64))
        prev = np.empty_like(ms)
        prev[0] = -1
        prev[1:] = ms[:-1]
        is_new = prev == -1
        is_ret = prev == ms - 1
        is_res = (~is_new) & (~is_ret)
        nxt = np.empty_like(ms)
        nxt[:-1] = ms[1:]
        nxt[-1] = np.iinfo(np.int64).max
        churn_at = ms[nxt > ms + 1] + 1
        churn_at = churn_at[churn_at <= mm]
        out_m = np.concatenate([ms, churn_at])
        z = np.zeros(len(churn_at), dtype=np.int64)
        return pd.DataFrame({
            "m": out_m,
            "n_new": np.concatenate([is_new.astype(np.int64), z]),
            "n_retained": np.concatenate([is_ret.astype(np.int64), z]),
            "n_resurrected": np.concatenate([is_res.astype(np.int64), z]),
            "n_churned": np.concatenate([np.zeros(len(ms), np.int64),
                                         z + 1])})

    flows = pairs.groupby("user_id").map_groups(_classify,
                                                batch_format="pandas")
    out = fast_groupby_agg(flows, ["m"], {
        "n_new": ("n_new", "sum"), "n_retained": ("n_retained", "sum"),
        "n_resurrected": ("n_resurrected", "sum"),
        "n_churned": ("n_churned", "sum")})
    return out.map_batches(
        lambda b: b.rename_columns(
            ["day_idx", "n_new", "n_retained", "n_resurrected",
             "n_churned"]), batch_format="pyarrow")


ORACLES["growth_accounting"] = """
    WITH um AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS BIGINT) AS m
        FROM events),
    mx AS (SELECT max(m) AS mm FROM um),
    seq AS (
        SELECT user_id, m,
               lag(m) OVER (PARTITION BY user_id ORDER BY m) AS pm,
               lead(m) OVER (PARTITION BY user_id ORDER BY m) AS nm
        FROM um),
    base AS (
        SELECT m,
               CASE WHEN pm IS NULL THEN 1 ELSE 0 END AS is_new,
               CASE WHEN pm = m - 1 THEN 1 ELSE 0 END AS is_ret,
               CASE WHEN pm IS NOT NULL AND pm < m - 1
                    THEN 1 ELSE 0 END AS is_res
        FROM seq),
    ag AS (
        SELECT m, CAST(sum(is_new) AS BIGINT) AS n_new,
               CAST(sum(is_ret) AS BIGINT) AS n_retained,
               CAST(sum(is_res) AS BIGINT) AS n_resurrected
        FROM base GROUP BY m),
    ch AS (
        SELECT s.m + 1 AS m, CAST(count(*) AS BIGINT) AS n_ch
        FROM seq s, mx
        WHERE (s.nm IS NULL OR s.nm > s.m + 1) AND s.m + 1 <= mx.mm
        GROUP BY s.m + 1)
    SELECT coalesce(ag.m, ch.m) AS day_idx,
           CAST(coalesce(ag.n_new, 0) AS BIGINT) AS n_new,
           CAST(coalesce(ag.n_retained, 0) AS BIGINT) AS n_retained,
           CAST(coalesce(ag.n_resurrected, 0) AS BIGINT)
               AS n_resurrected,
           CAST(coalesce(ch.n_ch, 0) AS BIGINT) AS n_churned
    FROM ag FULL OUTER JOIN ch ON ch.m = ag.m
"""


# ====================================================== graph modularity


def q_graph_modularity(sf_dir):
    """Exact Newman–Girvan modularity of the nation partition over the
    derived order graph — Q = Σ_c e_c/m − Σ_c (d_c/2m)², the quality
    score community detectors optimize, here evaluated for the given
    attribute communities (the endpoint customer's nation). Computed
    over the COMMON fraction form Q = (4m·Σe_c − Σd_c²) / 4m², with
    the numerator assembled in arbitrary-precision Python ints (at
    100 TB Σd_c² overflows int64; the oracle's HUGEINT does the same
    128-bit job) and ONE floored ×10⁹ division — bitwise, no floats.

    Scale plan: edges label their endpoints via TWO hash joins against
    the customer dimension (fact-scale — never broadcast, per the
    region_revenue guard lesson); intra-edge and degree-mass rollups
    are nation-keyed groupbys whose outputs are community-sized (25
    rows), the only thing the driver ever sees."""
    edges = _modularity_edges(sf_dir)
    m = edges.count()
    cust = T(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cu = cust.map_batches(
        lambda b: pa.table({"k": b["c_custkey"], "nat": b["c_nationkey"]}),
        batch_format="pyarrow").materialize()
    lab = edges.join(cu, "inner", num_partitions=JOIN_PARTS,
                     on=("u",), right_on=("k",)) \
        .map_batches(lambda b: pa.table({
            "v": b["v"], "nu": b["nat"]}), batch_format="pyarrow") \
        .join(cu.map_batches(
            lambda b: b.rename_columns(["k2", "nat2"]),
            batch_format="pyarrow"),
        "inner", num_partitions=JOIN_PARTS, on=("v",), right_on=("k2",))
    intra = lab.map_batches(
        lambda b: pa.table({
            "nat": b["nu"],
            "i": pc.cast(pc.equal(b["nu"], b["nat2"]), pa.int64())}),
        batch_format="pyarrow")
    ec = fast_groupby_agg(intra, ["nat"], {"e_c": ("i", "sum")}) \
        .to_pandas()
    adj = edges.map_batches(
        lambda b: pa.table({"node": pa.array(np.concatenate(
            [b["u"].to_numpy(zero_copy_only=False),
             b["v"].to_numpy(zero_copy_only=False)]), pa.int64())}),
        batch_format="pyarrow")
    deg = fast_groupby_agg(adj, ["node"], {"d": (None, "count")})
    dc = fast_groupby_agg(
        deg.join(cu, "inner", num_partitions=JOIN_PARTS,
                 on=("node",), right_on=("k",)),
        ["nat"], {"d_c": ("d", "sum")}).to_pandas()
    se = int(ec["e_c"].sum())
    sd2 = sum(int(x) ** 2 for x in dc["d_c"])
    q_fp = (4 * m * se - sd2) * 10**9 // (4 * m * m)
    return pd.DataFrame({
        "n_edges": [np.int64(m)],
        "n_comms": [np.int64(len(dc))],
        "sum_intra": [np.int64(se)],
        "q_fp": [np.int64(q_fp)]})


def _modularity_edges(sf_dir):
    """Distinct undirected (u<v) edges of the derived order graph."""
    n = T(sf_dir, "customer", ["c_custkey"]).count()
    raw = _pagerank_edges(sf_dir, n)

    def _norm(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "u": pa.array(np.minimum(s, d), pa.int64()),
            "v": pa.array(np.maximum(s, d), pa.int64())})

    return fast_groupby_agg(
        raw.map_batches(_norm, batch_format="pyarrow"),
        ["u", "v"], {"_n": (None, "count")},
    ).map_batches(lambda b: b.select(["u", "v"]),
                  batch_format="pyarrow").materialize()


ORACLES["graph_modularity"] = """
    WITH nn AS (SELECT count(*) AS n FROM customer),
    raw AS (SELECT o_custkey AS s,
                   o_orderkey % (SELECT n FROM nn) AS d
            FROM orders),
    e AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
          FROM raw WHERE s <> d),
    m AS (SELECT count(*) AS c FROM e),
    cu AS (SELECT c_custkey AS k, c_nationkey AS nat FROM customer),
    lab AS (SELECT cu1.nat AS nu, cu2.nat AS nv
            FROM e JOIN cu cu1 ON cu1.k = e.u
                   JOIN cu cu2 ON cu2.k = e.v),
    se AS (SELECT count(*) AS s FROM lab WHERE nu = nv),
    deg AS (SELECT node, count(*) AS d FROM (
                SELECT u AS node FROM e
                UNION ALL SELECT v AS node FROM e)
            GROUP BY node),
    dc AS (SELECT cu.nat, sum(deg.d) AS d_c
           FROM deg JOIN cu ON cu.k = deg.node GROUP BY cu.nat),
    agg AS (SELECT (SELECT s FROM se) AS se,
                   (SELECT sum(d_c * d_c) FROM dc) AS sd2,
                   (SELECT c FROM m) AS mm,
                   (SELECT count(*) FROM dc) AS nc)
    SELECT CAST(mm AS BIGINT) AS n_edges,
           CAST(nc AS BIGINT) AS n_comms,
           CAST(se AS BIGINT) AS sum_intra,
           CAST((4 * mm * se - sd2) * 1000000000 // (4 * mm * mm)
                - CASE WHEN (4 * mm * se - sd2) * 1000000000
                            % (4 * mm * mm) <> 0
                            AND (4 * mm * se - sd2) < 0
                       THEN 1 ELSE 0 END AS BIGINT) AS q_fp
    FROM agg
"""


# ====================================================== vocab coverage


VOCAB_COVERAGE_KS = (10, 100, 1000)


def q_vocab_coverage(sf_dir, ks: tuple = VOCAB_COVERAGE_KS):
    """Vocabulary coverage curve: what fraction of the corpus's total
    token mass the top-k most frequent terms cover, k ∈ {10, 100,
    1000} — the Zipf-mass diagnostic that sizes tokenizer vocabularies
    and stopword lists (complement of q_hapax_ratio's tail view).
    Coverage is mass_k·10⁹ // total in arbitrary-precision Python ints
    (total token mass at 100 TB overflows int64; the oracle's HUGEINT
    window sum does the same job).

    Scale plan: per-batch pandas value_counts folds tokens to (term,
    count) partials map-side, ONE vocabulary-sized groupby sums them,
    and a distributed sort+limit(max k) brings exactly 1000 rows to
    the driver — bounded constant at any corpus size. Total mass rides
    the same partials; nothing corpus-sized moves."""
    docs = T(sf_dir, "documents", ["text"])

    def _tc(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame({"term": vc.index.astype(object),
                             "c": vc.to_numpy(np.int64)})

    counts = fast_groupby_agg(
        docs.map_batches(_tc, batch_format="pandas"),
        ["term"], {"c": ("c", "sum")}).materialize()
    from ray.data.aggregate import Sum

    total = int(counts.aggregate(Sum("c"))["sum(c)"])
    top = counts.sort(["c", "term"], descending=[True, False]) \
        .limit(max(ks)).to_pandas()
    cum = top["c"].to_numpy(np.int64).cumsum()
    rows = []
    for k in ks:
        mass = int(cum[min(k, len(cum)) - 1]) if len(cum) else 0
        rows.append({"k": np.int64(k),
                     "topk_mass": np.int64(mass),
                     "total_mass": np.int64(total),
                     "coverage_fp": np.int64(mass * 10**9 // total)})
    return pd.DataFrame(rows)


ORACLES["vocab_coverage"] = """
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS t FROM documents),
    tc AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT sum(c) AS s FROM tc),
    top AS (SELECT c, row_number() OVER (ORDER BY c DESC, t) AS r
            FROM tc),
    cum AS (SELECT r, sum(c) OVER (ORDER BY r) AS cm
            FROM top WHERE r <= 1000),
    ks AS (SELECT unnest([10, 100, 1000]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST((SELECT max(cm) FROM cum WHERE r <= ks.k) AS BIGINT)
               AS topk_mass,
           CAST(tot.s AS BIGINT) AS total_mass,
           CAST((SELECT max(cm) FROM cum WHERE r <= ks.k)
                * 1000000000 // tot.s AS BIGINT) AS coverage_fp
    FROM ks, tot
"""


# ==================================================== padding efficiency


PAD_BATCH = 32


def q_padding_efficiency(sf_dir, b: int = PAD_BATCH):
    """Padding-waste audit of fixed-size training batches: group docs
    into batches of ``b`` under (1) arrival order (doc_id) and (2)
    length-sorted order, pad every sequence in a batch to the batch
    max, and report the padded-token share each policy wastes — the
    measurement that justifies length-bucketed batching (and
    complements q_pack_sequences' packing path). All integers: waste =
    Σ_batch (rows·max_len − Σlen), share = waste·10⁹ // padded_total.

    Scale plan: ONE map pass folds docs to (doc_id, len) rows; each
    ordering is a distributed sort whose global row_numbers are
    stitched from per-block counts (the q_rrf_customer_fusion
    block-offset pattern — O(blocks) driver ints, no driver
    materialization); batch stats are a batch-count-sized groupby and
    the final two-row rollup is constant-sized."""
    import ray.data as rd

    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _len(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "l": df["text"].str.split(" ").str.len()
            .to_numpy(np.int64)})

    lens = docs.map_batches(_len, batch_format="pandas").materialize()

    def _policy(kind: str, keys: list, desc: list):
        srt = lens.sort(keys, descending=desc)
        refs = srt.to_arrow_refs()

        @ray.remote
        def _n(t: pa.Table) -> int:
            return t.num_rows

        ns = ray.get([_n.remote(r) for r in refs])
        offs = np.concatenate([[0], np.cumsum(ns)[:-1]])

        @ray.remote
        def _bat(t: pa.Table, off: int) -> pa.Table:
            rn = np.arange(off, off + t.num_rows, dtype=np.int64)
            return pa.table({
                "batch": pa.array(rn // b, pa.int64()),
                "l": t["l"]})

        bt = rd.from_arrow_refs(
            [_bat.remote(r, int(offs[i])) for i, r in enumerate(refs)])
        per = fast_groupby_agg(bt, ["batch"], {
            "n": (None, "count"), "mx": ("l", "max"),
            "s": ("l", "sum")}).to_pandas()
        padded = int((per["n"].astype(object)
                      * per["mx"].astype(object)).sum())
        tokens = int(per["s"].sum())
        waste = padded - tokens
        return {"policy": kind,
                "n_docs": np.int64(per["n"].sum()),
                "n_batches": np.int64(len(per)),
                "total_tokens": np.int64(tokens),
                "total_padding": np.int64(waste),
                "pad_share_fp": np.int64(waste * 10**9 // padded)}

    rows = [_policy("arrival", ["doc_id"], [False]),
            _policy("sorted", ["l", "doc_id"], [False, False])]
    out = pd.DataFrame(rows)
    assert int(out.loc[1, "total_padding"]) <= \
        int(out.loc[0, "total_padding"]), out  # sorting never pads more
    return out


ORACLES["padding_efficiency"] = f"""
    WITH L AS (SELECT doc_id, len(string_split(text, ' ')) AS l
               FROM documents),
    a AS (SELECT l, (row_number() OVER (ORDER BY doc_id) - 1)
                    // {PAD_BATCH} AS b FROM L),
    s AS (SELECT l, (row_number() OVER (ORDER BY l, doc_id) - 1)
                    // {PAD_BATCH} AS b FROM L),
    wa AS (SELECT count(*) AS n, max(l) AS m, sum(l) AS t
           FROM a GROUP BY b),
    ws AS (SELECT count(*) AS n, max(l) AS m, sum(l) AS t
           FROM s GROUP BY b)
    SELECT 'arrival' AS policy,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(t) AS BIGINT) AS total_tokens,
           CAST(sum(n * m) - sum(t) AS BIGINT) AS total_padding,
           CAST((sum(n * m) - sum(t)) * 1000000000
                // sum(n * m) AS BIGINT) AS pad_share_fp
    FROM wa
    UNION ALL
    SELECT 'sorted',
           CAST(sum(n) AS BIGINT), CAST(count(*) AS BIGINT),
           CAST(sum(t) AS BIGINT),
           CAST(sum(n * m) - sum(t) AS BIGINT),
           CAST((sum(n * m) - sum(t)) * 1000000000
                // sum(n * m) AS BIGINT)
    FROM ws
"""


# ================================================ checkpointed iteration


PR_CKPT_EVERY = 3


def run_pagerank_checkpointed(sf_dir, out_dir, iters: int = PAGERANK_ITERS,
                              every: int = PR_CKPT_EVERY,
                              stop_after_iter: int | None = None):
    """q_pagerank's join-tier recurrence as a RESUMABLE iterative job:
    every ``every`` iterations the (node, pr_fp) state is committed as
    an atomic store epoch (tmp+rename — an epoch is fully visible or
    absent) with the completed-iteration watermark in the manifest; on
    start, the loop reads the newest checkpoint and continues from
    there. Because the recurrence is all-integer, a killed-and-resumed
    run is BIT-IDENTICAL to an uninterrupted one (pinned by test and by
    this op's exact oracle — the same unrolled CTE as q_pagerank's).
    This is the pattern that makes a week-long 100 TB iterative job
    survivable: worst case loses ``every−1`` iterations, never the run.

    ``stop_after_iter`` simulates the kill: return after finishing that
    iteration WITHOUT checkpointing it (unless it lands on the cadence)."""
    import ray.data as rd

    from ..sources import store

    cust = T(sf_dir, "customer", ["c_custkey"])
    n = cust.count()
    edges = _pagerank_edges(sf_dir, n).materialize()
    tele = (15 * PAGERANK_SCALE // 100) // n
    nodes = cust.map_batches(
        lambda b: pa.table({"node": b["c_custkey"]}),
        batch_format="pyarrow").materialize()
    outd = fast_groupby_agg(edges, ["src"], {"od": (None, "count")})
    edges_od = edges.join(outd, "inner", num_partitions=JOIN_PARTS,
                          on=("src",)).materialize()

    manifest = store.load_manifest(out_dir) or {}
    done = int(manifest.get("done_iter", 0))
    if done > 0:
        # columns= drops the hive `epoch=` partition key the path encodes
        pr = rd.read_parquet(
            store.epoch_dir(out_dir, "pr", done),
            columns=["node", "pr_fp"]).materialize()
    else:
        pr = nodes.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "pr_fp": pa.array(
                    np.full(b.num_rows, PAGERANK_SCALE // n), pa.int64()),
            }), batch_format="pyarrow").materialize()

    for t in range(done + 1, iters + 1):
        j = edges_od.join(pr, "inner", num_partitions=JOIN_PARTS,
                          on=("src",), right_on=("node",))
        contrib = j.map_batches(
            lambda b: pa.table({
                "dst": b["dst"],
                "c": pa.array(
                    b["pr_fp"].to_numpy(zero_copy_only=False)
                    // b["od"].to_numpy(zero_copy_only=False), pa.int64()),
            }), batch_format="pyarrow")
        s = fast_groupby_agg(contrib, ["dst"], {"s": ("c", "sum")})
        joined = nodes.join(s, "left_outer", num_partitions=JOIN_PARTS,
                            on=("node",), right_on=("dst",))
        pr = joined.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "pr_fp": pa.array(
                    tele + (85 * pc.fill_null(b["s"], 0)
                            .to_numpy(zero_copy_only=False)) // 100,
                    pa.int64()),
            }), batch_format="pyarrow").materialize()
        if t % every == 0 or t == iters:
            store.write_epoch(pr, out_dir, "pr", t)
            store.save_manifest(out_dir, {"done_iter": t})
        if stop_after_iter is not None and t >= stop_after_iter:
            return None  # simulated mid-run kill
    return pr


def q_pagerank_checkpointed(sf_dir):
    """Kill/resume drill for the checkpointed iterative runner, WITHIN
    the driver-checked query: phase 1 runs the job and "dies" after
    iteration 4 (past the iteration-3 checkpoint, before the next);
    phase 2 resumes from the manifest watermark — replaying iteration
    4 — and finishes. The exact oracle (q_pagerank's unrolled CTE)
    certifies the resumed run equals an uninterrupted one bit for bit."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="fcray_prckpt_")
    try:
        run_pagerank_checkpointed(sf_dir, out, stop_after_iter=4)
        pr = run_pagerank_checkpointed(sf_dir, out)
        return pr.materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


ORACLES["pagerank_checkpointed"] = _pagerank_oracle(PAGERANK_ITERS)
