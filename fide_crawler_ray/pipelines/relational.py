"""Relational + window + sampling operators beyond the reference's own
surface — the second tier of the engine's query layer (hash joins, as-of
join, SQL window functions, ROLLUP, exact quantiles, deterministic
sampling, term document frequency, embedding norms, HLL distinct).

Every SQL-expressible query here has a DuckDB oracle in ORACLES with
matching column names; float outputs follow queries.py's fixed-point
canonicalization policy, and window/rollup sums are computed in INTEGER
fixed-point (scale → int64 → sum) so the result is exact and
association-order-free on both sides.

Reference parity notes: the reference has only key joins (SURVEY §2.4
J1/J2) and no window functions; these operators are the "large-scale
training-data pipeline" extensions the engine adds (as-of joins for
event alignment, hash sampling for corpus subsetting, doc-frequency for
vocabulary pruning, HLL for cheap distinct counts at 100 TB).
"""

from __future__ import annotations

import hashlib
import math
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..stages.fastagg import fast_groupby_agg, live_arrow
from .queries import JOIN_PARTS, T, _canon_stage, _queries_matrix

# ============================================================== joins


def q_j_inner_join(sf_dir):
    """Row-level hash inner join orders⋈customer (``Dataset.join`` —
    both sides hash-partitioned through the exchange, no driver state),
    then revenue per nation. The row-level join is deliberate: it
    exercises the shuffle-join path, unlike J1's broadcast plan."""
    orders = T(sf_dir, "orders", ["o_custkey", "o_totalprice"],
               target_block_mb=32, min_blocks=8)
    cust = T(sf_dir, "customer", ["c_custkey", "c_nationkey"],
             target_block_mb=32, min_blocks=4)
    j = orders.join(cust, "inner", num_partitions=JOIN_PARTS,
                    on=("o_custkey",), right_on=("c_custkey",))
    out = fast_groupby_agg(j, ["c_nationkey"], {
        "revenue": ("o_totalprice", "sum"),
        "n_orders": (None, "count"),
    })
    return out.map_batches(_canon_stage({"revenue": 4}),
                           batch_format="pyarrow")


def q_j_left_outer(sf_dir):
    """Left-outer join with null preservation: orders-per-customer
    including zero-order customers. Scale plan: pre-aggregate the fact
    side to one row per key (map-side combine), THEN left-outer join —
    the exchange moves key counts, never raw orders."""
    counts = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey"]), ["o_custkey"],
        {"n_orders": (None, "count")},
    )
    j = T(sf_dir, "customer", ["c_custkey"],
          target_block_mb=32, min_blocks=4).join(
        counts, "left_outer", num_partitions=JOIN_PARTS,
        on=("c_custkey",), right_on=("o_custkey",),
    )
    return j.map_batches(
        lambda b: pa.table({
            "c_custkey": b["c_custkey"],
            "n_orders": pc.fill_null(b["n_orders"], 0),
        }),
        batch_format="pyarrow",
    )


def _ts_ns(col) -> np.ndarray:
    """Arrow timestamp column → int64 nanoseconds (comparison domain for
    the as-of probe; both sides use the same conversion)."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return a.to_numpy(zero_copy_only=False).astype("datetime64[ns]").view("int64")


def q_asof_join(sf_dir):
    """As-of join (event-time alignment): each event matched to the
    latest marker event (event_id % 97 == 0) of the same user with
    marker.ts <= event.ts — the canonical "align log records to the most
    recent checkpoint" operator that Ray Data lacks natively.

    Plan: the marker side is sparse by construction (1/97 of events), so
    it is broadcast once (``ray.put``) and probed per batch with numpy
    ``searchsorted`` per user — vectorized within each user segment, no
    shuffle of the big side. Partitioning assumption (documented per the
    engine's custom-operator contract): the MARKER side fits in one
    worker's memory; if it did not, the fallback is range-partitioning
    both sides by (user, ts-bucket) and running the same probe per
    partition."""
    ev = T(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _markers(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 97 == 0))

    # dedup markers to one per (user, ts): keep max event_id (ties in ts
    # would otherwise make "the" as-of match ambiguous on both sides)
    markers = fast_groupby_agg(
        ev.map_batches(_markers, batch_format="pyarrow"),
        ["user_id", "ts"], {"marker_event_id": ("event_id", "max")},
    ).materialize()
    mref = ray.put(markers.to_arrow_refs())

    class _AsOf:
        def __init__(self):
            live = [t for t in ray.get(ray.get(mref)) if t.num_rows > 0]
            if not live:  # no markers at all → every event gets NULL
                self.mt = np.empty(0, dtype=np.int64)
                self.mid = np.empty(0, dtype=np.int64)
                self.seg = {}
                return
            m = pa.concat_tables(live)
            mu = m["user_id"].to_numpy(zero_copy_only=False)
            mt = _ts_ns(m["ts"])
            mid = m["marker_event_id"].to_numpy(zero_copy_only=False)
            order = np.lexsort((mt, mu))
            mu, self.mt, self.mid = mu[order], mt[order], mid[order]
            starts = np.flatnonzero(np.r_[True, mu[1:] != mu[:-1]])
            ends = np.r_[starts[1:], len(mu)]
            self.seg = {int(u): (s, e) for u, s, e in
                        zip(mu[starts], starts, ends)}

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({
                    "event_id": b["event_id"],
                    "marker_event_id": pa.array([], pa.int64()),
                })
            u = b["user_id"].to_numpy(zero_copy_only=False)
            t = _ts_ns(b["ts"])
            out = np.zeros(len(u), dtype=np.int64)
            null = np.ones(len(u), dtype=bool)
            order = np.argsort(u, kind="stable")
            us = u[order]
            starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
            ends = np.r_[starts[1:], len(us)]
            for s, e in zip(starts, ends):
                seg = self.seg.get(int(us[s]))
                if seg is None:
                    continue
                ms, me = seg
                rows = order[s:e]
                idx = np.searchsorted(self.mt[ms:me], t[rows],
                                      side="right") - 1
                hit = idx >= 0
                out[rows[hit]] = self.mid[ms + idx[hit]]
                null[rows[hit]] = False
            return pa.table({
                "event_id": b["event_id"],
                "marker_event_id": pa.array(out, mask=null),
            })

    return ev.map_batches(_AsOf, batch_format="pyarrow", concurrency=2)


# customer→region map broadcast below this; above it customer is treated
# as what it really is at scale — a fact-sized table — and orders
# hash-join against it (nation/region stay broadcast: genuinely tiny)
REGION_REV_MAX_BROADCAST = 2_000_000


def q_region_revenue(sf_dir):
    """Three-table join chain orders⋈customer⋈nation⋈region. Below
    REGION_REV_MAX_BROADCAST customers the dimension chain (customer→
    nation→region) is pre-joined into a custkey→region map per actor in
    ``__init__`` — ONE broadcast probe; a chained shuffle join would
    move the fact table three times for no reason. Customer is the one
    "dimension" that grows with the dataset, so above the guard the
    nation→region label (≤25 rows) attaches to customer map-side and
    orders hash-join customer on custkey — one fact exchange. Tiers
    pinned identical by test."""
    cust = T(sf_dir, "customer", ["c_custkey", "c_nationkey"]).materialize()
    nr_refs = ray.put((
        T(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_arrow_refs(),
        T(sf_dir, "region", ["r_regionkey", "r_name"]).to_arrow_refs(),
    ))

    def _nation_region_map():
        n, r = ray.get(nr_refs)
        nd = pa.concat_tables(ray.get(n)).to_pandas()
        rd_ = pa.concat_tables(ray.get(r)).to_pandas()
        m = nd.merge(rd_, left_on="n_regionkey", right_on="r_regionkey")
        return (pa.array(m["n_nationkey"].to_numpy()),
                pa.array(m["r_name"], pa.string()))

    orders = T(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    if cust.count() > REGION_REV_MAX_BROADCAST:
        def _label(b: pa.Table) -> pa.Table:
            nk, names = _nation_region_map()
            idx = pc.index_in(b["c_nationkey"], value_set=nk)
            return pa.table({
                "ck_r": b["c_custkey"],
                "r_name": pc.take(names, idx),
            }).filter(pc.is_valid(idx))

        labeled = cust.map_batches(_label, batch_format="pyarrow")
        ds = orders.join(labeled, "inner", num_partitions=16,
                         on=("o_custkey",), right_on=("ck_r",))
    else:
        cref = ray.put(cust.to_arrow_refs())

        class _Chain:
            def __init__(self):
                cd = pa.concat_tables(ray.get(ray.get(cref))).to_pandas()
                nk, names = _nation_region_map()
                nd = pa.table({"n_nationkey": nk,
                               "r_name": names}).to_pandas()
                m = cd.merge(nd, left_on="c_nationkey",
                             right_on="n_nationkey")
                self.keys = pa.array(m["c_custkey"].to_numpy())
                self.names = pa.array(m["r_name"], pa.string())

            def __call__(self, b: pa.Table) -> pa.Table:
                idx = pc.index_in(b["o_custkey"], value_set=self.keys)
                t = b.append_column("r_name", pc.take(self.names, idx))
                return t.filter(pc.is_valid(idx))

        ds = orders.map_batches(_Chain, batch_format="pyarrow",
                                concurrency=2)
    out = fast_groupby_agg(ds, ["r_name"], {
        "revenue": ("o_totalprice", "sum"), "n_orders": (None, "count"),
    })
    return out.map_batches(_canon_stage({"revenue": 4}),
                           batch_format="pyarrow")


def q_event_funnel(sf_dir):
    """Sequential conversion funnel view → click → purchase per user
    (stage k counts users whose earliest stage-k event strictly follows
    their earliest qualifying stage-(k-1) event) — the ordered-pattern
    operator SQL needs three correlated joins for. Per-user map_groups
    (same user-fits-a-worker contract as sessionize), then one tiny sum."""
    ds = T(sf_dir, "events", ["user_id", "ts", "event_type"])

    def _stages(df: pd.DataFrame) -> pd.DataFrame:
        def first_after(kind, t0):
            sel = df[(df["event_type"] == kind) & (df["ts"] > t0)] \
                if t0 is not None else df[df["event_type"] == kind]
            return sel["ts"].min() if len(sel) else None

        t_view = first_after("view", None)
        t_click = first_after("click", t_view) if t_view is not None else None
        t_purch = (first_after("purchase", t_click)
                   if t_click is not None else None)
        return pd.DataFrame([{
            "v": int(t_view is not None),
            "c": int(t_click is not None),
            "p": int(t_purch is not None),
        }])

    flags = ds.groupby("user_id").map_groups(_stages, batch_format="pandas")
    from ray.data.aggregate import Sum

    row = flags.aggregate(Sum("v", alias_name="n_view"),
                          Sum("c", alias_name="n_view_click"),
                          Sum("p", alias_name="n_view_click_purchase"))
    return pd.DataFrame([{
        "n_view": int(row["n_view"]),
        "n_view_click": int(row["n_view_click"]),
        "n_view_click_purchase": int(row["n_view_click_purchase"]),
    }])


def _rank_pick_sorted(v: np.ndarray, q: float):
    """The engine-wide exact-quantile RANK RULE — the value at 1-based
    rank max(1, ceil(q·n)) of the sorted array. Every rank-rule oracle
    mirrors it as ``GREATEST(1, CAST(ceil(q * n) AS BIGINT))``; keep the
    two in lockstep (q_quantiles/q_grouped_median pick the same rank off
    a CDF instead of a sorted array)."""
    return v[max(1, math.ceil(q * len(v))) - 1]


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """SQL round() semantics (half away from zero, like C++ std::round),
    NOT numpy's half-to-even — an exact-.5 product would otherwise land
    1 fixed-point unit apart from the oracle. trunc/frac arithmetic is
    exact in IEEE (|x - trunc(x)| subtraction is Sterbenz-safe), so this
    matches DuckDB's round() bit for bit."""
    t = np.trunc(x)
    frac = x - t
    return t + np.where(np.abs(frac) >= 0.5, np.sign(x), 0.0)


def _compact_small(ds, rows_per_block: int = 65_536):
    """Materialize a SMALL (dimension-scale) join side and repartition it
    into guaranteed-nonempty blocks; returns None when the side is empty.

    Works around a Ray 2.49 hash-shuffle-join edge: the join's schema
    broadcast rides on the FIRST shuffle task of each input sequence, and
    a task whose input block is empty returns before broadcasting
    (ray/data/_internal/execution/operators/hash_shuffle.py:223), while
    every later task skips empty shards — so a partition that then
    receives no real row for that side finalizes against a column-less
    table and pyarrow raises "No match for FieldRef". Heavily-filtered
    tiny sides (a dimension filter at small sf) are exactly the shape
    that produces an empty FIRST block, and whether the crash fires
    depends on task scheduling order, so it is flaky. Compacting to
    ceil(n / rows_per_block) blocks (≥1 row each) makes every shuffle
    task's input nonempty. Only use on sides that are small by design —
    the materialize is one extra object-store copy of that side."""
    m = ds.materialize()
    n = m.count()
    if n == 0:
        return None
    return m.repartition(max(1, min(32, -(-n // rows_per_block))))


# ===================================================== window functions


def q_window_functions(sf_dir):
    """SQL window functions per user ordered by (ts, event_id):
    row_number, running sum, and lag-delta. Sums are integer fixed-point
    (value scaled by 1e6 → int64) so the running sum is exact and
    association-free — no float canonicalization gamble on 60k+ rows.

    Plan: ``groupby(user).map_groups`` with numpy cumsum inside — the
    same per-key-fits-a-worker assumption as sessionize (events are
    user-partitioned; one user's history is bounded)."""
    ds = T(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def _wins(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        v = _round_half_away(df["value"].to_numpy() * 1e6).astype(np.int64)
        # first row's lag is NULL (SQL semantics); both DuckDB's .df()
        # and Arrow's to_pandas surface nullable BIGINT as float64+NaN,
        # so float64 here IS the comparison dtype (values ≤ ~1e12 are
        # exactly representable)
        step = np.zeros(len(v), dtype=np.float64)
        step[1:] = (v[1:] - v[:-1]).astype(np.float64)
        step[0] = np.nan
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "event_id": df["event_id"].to_numpy(),
            "rn": np.arange(1, len(v) + 1, dtype=np.int64),
            "run_sum_fp": np.cumsum(v),
            "step_fp": step,
        })

    return ds.groupby("user_id").map_groups(_wins, batch_format="pandas")


# ============================================================= rollup


def q_rollup_agg(sf_dir):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): leaf groups +
    per-returnflag subtotals + grand total, each level re-aggregated
    from the one below (sums are integer fixed-point → re-aggregation
    is exact, so levels agree with a direct computation). The subtotal
    tiers are O(distinct returnflag) rows — bounded, driver-safe."""
    ds = T(sf_dir, "lineitem",
           ["l_returnflag", "l_linestatus", "l_quantity"]).map_batches(
        lambda b: pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty_fp": pc.cast(pc.round(pc.multiply(b["l_quantity"], 100.0)),
                              pa.int64()),
        }),
        batch_format="pyarrow",
    )
    leaf = fast_groupby_agg(ds, ["l_returnflag", "l_linestatus"], {
        "sum_qty_fp": ("qty_fp", "sum"), "n": (None, "count"),
    }).materialize()
    lvl1 = fast_groupby_agg(leaf, ["l_returnflag"], {
        "sum_qty_fp": ("sum_qty_fp", "sum"), "n": ("n", "sum"),
    }).map_batches(
        lambda b: pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": pa.nulls(b.num_rows, pa.string()),
            "sum_qty_fp": b["sum_qty_fp"], "n": b["n"],
        }),
        batch_format="pyarrow",
    ).materialize()
    total = pa.concat_tables(
        t for t in ray.get(lvl1.to_arrow_refs()) if t.num_rows > 0
    )
    lvl2 = pa.table({
        "l_returnflag": pa.nulls(1, pa.string()),
        "l_linestatus": pa.nulls(1, pa.string()),
        "sum_qty_fp": pa.array([pc.sum(total["sum_qty_fp"]).as_py()],
                               pa.int64()),
        "n": pa.array([pc.sum(total["n"]).as_py()], pa.int64()),
    })
    import ray.data as rd

    return leaf.union(lvl1, rd.from_arrow(lvl2))


def q_cube_agg(sf_dir):
    """GROUP BY CUBE(l_returnflag, l_linestatus): the full lattice —
    leaf groups, BOTH single-dimension subtotal tiers, and the grand
    total. Same plan as ROLLUP (each tier re-aggregated from the leaf
    table, integer fixed-point sums → re-aggregation exact) plus the
    linestatus-only tier ROLLUP omits; every tier above the leaf is
    O(distinct dimension values) rows — bounded, driver-safe."""
    ds = T(sf_dir, "lineitem",
           ["l_returnflag", "l_linestatus", "l_quantity"]).map_batches(
        lambda b: pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty_fp": pc.cast(pc.round(pc.multiply(b["l_quantity"], 100.0)),
                              pa.int64()),
        }),
        batch_format="pyarrow",
    )
    leaf = fast_groupby_agg(ds, ["l_returnflag", "l_linestatus"], {
        "sum_qty_fp": ("qty_fp", "sum"), "n": (None, "count"),
    }).materialize()

    def _null_col(b: pa.Table, keep: str) -> pa.Table:
        cols = {
            "l_returnflag": (b["l_returnflag"] if keep == "l_returnflag"
                             else pa.nulls(b.num_rows, pa.string())),
            "l_linestatus": (b["l_linestatus"] if keep == "l_linestatus"
                             else pa.nulls(b.num_rows, pa.string())),
            "sum_qty_fp": b["sum_qty_fp"], "n": b["n"],
        }
        return pa.table(cols)

    by_rf = fast_groupby_agg(leaf, ["l_returnflag"], {
        "sum_qty_fp": ("sum_qty_fp", "sum"), "n": ("n", "sum"),
    }).map_batches(lambda b: _null_col(b, "l_returnflag"),
                   batch_format="pyarrow").materialize()
    by_ls = fast_groupby_agg(leaf, ["l_linestatus"], {
        "sum_qty_fp": ("sum_qty_fp", "sum"), "n": ("n", "sum"),
    }).map_batches(lambda b: _null_col(b, "l_linestatus"),
                   batch_format="pyarrow").materialize()
    total = pa.concat_tables(
        t for t in ray.get(by_rf.to_arrow_refs()) if t.num_rows > 0
    )
    grand = pa.table({
        "l_returnflag": pa.nulls(1, pa.string()),
        "l_linestatus": pa.nulls(1, pa.string()),
        "sum_qty_fp": pa.array([pc.sum(total["sum_qty_fp"]).as_py()],
                               pa.int64()),
        "n": pa.array([pc.sum(total["n"]).as_py()], pa.int64()),
    })
    import ray.data as rd

    return leaf.union(by_rf, by_ls, rd.from_arrow(grand))


_DIVISION_PARTS = (1, 2, 3, 4, 5)


def q_relational_division(sf_dir):
    """Relational DIVISION (threshold form) — "suppliers that supply at
    least K parts of the target set" (K = |set| is exact ∀-division;
    the synthetic lineitem tops out at 4-of-5, so K=3 keeps the result
    non-degenerate): filter lineitem to the target partkeys
    (map-side ``pc.is_in``), reduce to distinct (supp, part) pairs with
    one partial-agg groupby, then a per-supplier distinct count — the
    exchange moves distinct pairs (≤ |suppliers|·|set|), never raw
    lineitem rows."""
    target = list(_DIVISION_PARTS)
    li = T(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def _flt(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["l_partkey"],
                                 value_set=pa.array(target, pa.int64())))

    pairs = fast_groupby_agg(
        li.map_batches(_flt, batch_format="pyarrow"),
        ["l_suppkey", "l_partkey"], {"_n": (None, "count")},
    )
    counts = fast_groupby_agg(pairs, ["l_suppkey"],
                              {"n_parts": (None, "count")})
    out = counts.map_batches(
        lambda b: pa.table({
            "l_suppkey": b["l_suppkey"].filter(
                pc.greater_equal(b["n_parts"], 3)),
        }),
        batch_format="pyarrow",
    ).materialize()
    if out.count() == 0:
        # legitimately empty at some sf (sf0.1: no supplier reaches
        # 3-of-5) — an all-empty Dataset drops its schema, so hand
        # back a TYPED empty frame
        return pd.DataFrame({"l_suppkey": pd.Series(dtype="int64")})
    return out


# per-group aggregate rows broadcast (by block ref, plasma-shared) below
# this; above it the decorrelated aggregate stays a Dataset and the fact
# side hash-joins against it — the aggregate is customer-CARDINALITY
# sized, i.e. it grows with the dataset, unlike a true dimension
ABOVE_AVG_MAX_BROADCAST = 2_000_000


def q_above_customer_avg(sf_dir):
    """Decorrelated subquery — the classic "rows above their group's
    average" pattern (``WHERE o_totalprice > (SELECT avg(..) ... WHERE
    same customer)``): per-customer (Σprice_fp, n) via one partial-agg
    groupby, then a map-side INTEGER cross-product predicate
    ``price_fp · n > Σprice_fp`` — exact, no division, no float edge.
    Dual tier: below ABOVE_AVG_MAX_BROADCAST the per-customer aggregate
    ships as BLOCK REFS (actors assemble the probe arrays from plasma —
    nothing lands on the driver); above it the aggregate stays a
    Dataset and orders hash-join against it (customer is fact-scale:
    at 100 TB the aggregate is too big to broadcast). Both tiers are
    pinned identical by test."""
    orders = T(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "p": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    fp = orders.map_batches(_fp, batch_format="pyarrow").materialize()
    agg = fast_groupby_agg(fp, ["o_custkey"], {
        "s": ("p", "sum"), "n": (None, "count"),
    }).materialize()

    if agg.count() > ABOVE_AVG_MAX_BROADCAST:
        j = fp.join(
            agg.map_batches(
                lambda b: b.rename_columns(["ck_r", "s", "n"]),
                batch_format="pyarrow"),
            "inner", num_partitions=16,
            on=("o_custkey",), right_on=("ck_r",))

        def _pred(b: pa.Table) -> pa.Table:
            p = b["p"].to_numpy(zero_copy_only=False)
            s = b["s"].to_numpy(zero_copy_only=False)
            n = b["n"].to_numpy(zero_copy_only=False)
            return pa.table({
                "o_orderkey": b["o_orderkey"].filter(pa.array(p * n > s)),
            })

        return j.map_batches(_pred, batch_format="pyarrow")

    aref = ray.put(agg.to_arrow_refs())

    class _Above:
        def __init__(self):
            t = pa.concat_tables(ray.get(ray.get(aref)))
            k = t["o_custkey"].to_numpy(zero_copy_only=False)
            s = t["s"].to_numpy(zero_copy_only=False)
            n = t["n"].to_numpy(zero_copy_only=False)
            order = np.argsort(k)
            self.k, self.s, self.n = k[order], s[order], n[order]

        def __call__(self, b: pa.Table) -> pa.Table:
            ck = b["o_custkey"].to_numpy(zero_copy_only=False)
            p = b["p"].to_numpy(zero_copy_only=False)
            ix = np.searchsorted(self.k, ck)
            keep = p * self.n[ix] > self.s[ix]
            return pa.table({
                "o_orderkey": b["o_orderkey"].filter(pa.array(keep)),
            })

    return fp.map_batches(_Above, batch_format="pyarrow", concurrency=2)


def q_table_diff(sf_dir):
    """Snapshot diff — the incremental-pipeline primitive: classify
    every key of two table versions as added / removed / changed /
    same. The two "snapshots" are derived deterministically from
    orders (old = keys ∉ 0 mod 10; new = keys ∉ 0 mod 7 with price
    doubled on keys ≡ 0 mod 3), prices compared in integer fixed-point.

    Plan: no join at all — both snapshots union into (key, src, p)
    rows and ONE partial-agg groupby folds each key's ≤2 rows into
    (n, src_sum, p_old, p_new); status is a map-side expression over
    that. The exchange moves one row per key per side — the same cost
    as the outer join the SQL oracle spells out, with no null-handling
    asymmetry between engines."""
    def _snap(src: int):
        def _f(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            p = _round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            if src == 0:
                keep = k % 10 != 0
                k, p = k[keep], p[keep]
            else:
                keep = k % 7 != 0
                k, p = k[keep], p[keep]
                p = np.where(k % 3 == 0, p * 2, p)
            return pa.table({
                "o_orderkey": pa.array(k, pa.int64()),
                "src": pa.array(np.full(len(k), src, dtype=np.int64)),
                "p_old": pa.array(np.where(src == 0, p, 0), pa.int64()),
                "p_new": pa.array(np.where(src == 1, p, 0), pa.int64()),
            })
        return _f

    base = T(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    both = base.map_batches(_snap(0), batch_format="pyarrow").union(
        base.map_batches(_snap(1), batch_format="pyarrow"))
    agg = fast_groupby_agg(both, ["o_orderkey"], {
        "n": (None, "count"), "src_sum": ("src", "sum"),
        "p_old": ("p_old", "sum"), "p_new": ("p_new", "sum"),
    })

    def _status(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        ss = b["src_sum"].to_numpy(zero_copy_only=False)
        po = b["p_old"].to_numpy(zero_copy_only=False)
        pn = b["p_new"].to_numpy(zero_copy_only=False)
        st = np.where(
            n == 1,
            np.where(ss == 1, "added", "removed"),
            np.where(po != pn, "changed", "same"),
        )
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "status": pa.array(st.tolist(), pa.string()),
        })

    return agg.map_batches(_status, batch_format="pyarrow")


def q_rank_functions(sf_dir):
    """Ranking window functions per user over event value: ``rank``,
    ``dense_rank``, integer fixed-point ``percent_rank`` and
    ``ntile(4)`` — the second half of the SQL window surface
    (q_window_functions covers row_number / running sum / lag). Ranks
    order by the fixed-point value alone (well-defined under ties);
    ntile orders by (value, event_id) — a total order, so the bucket
    assignment is deterministic on both engines. percent_rank is
    computed as ``(rank−1)·10⁶ // (n−1)`` in int64 — exact, no float.

    Plan: ``groupby(user).map_groups`` with numpy rank kernels — same
    per-key-fits-a-worker assumption as q_window_functions."""
    ds = T(sf_dir, "events", ["user_id", "event_id", "value"])

    def _ranks(df: pd.DataFrame) -> pd.DataFrame:
        v = _round_half_away(df["value"].to_numpy() * 1e6).astype(np.int64)
        eid = df["event_id"].to_numpy()
        order = np.lexsort((eid, v))
        vs, es = v[order], eid[order]
        n = len(vs)
        new = np.ones(n, dtype=bool)
        new[1:] = vs[1:] != vs[:-1]
        rnk = np.where(new, np.arange(1, n + 1, dtype=np.int64), 0)
        rnk = np.maximum.accumulate(rnk)
        drnk = np.cumsum(new).astype(np.int64)
        pct = (rnk - 1) * 1_000_000 // (n - 1) if n > 1 else np.zeros(
            n, dtype=np.int64)
        base, rem = divmod(n, 4)
        counts = np.array([base + 1] * rem + [base] * (4 - rem),
                          dtype=np.int64)
        tile = np.repeat(np.arange(1, 5, dtype=np.int64), counts)[:n]
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy()[order],
            "event_id": es,
            "rnk": rnk,
            "drnk": drnk,
            "pct_fp": pct,
            "tile": tile,
        })

    return ds.groupby("user_id").map_groups(_ranks, batch_format="pandas")


# ====================================================== exact quantiles


_Q_LEVELS = [(0.25, "q25"), (0.5, "q50"), (0.75, "q75"), (0.95, "q95")]


def q_quantiles(sf_dir):
    """Exact distributed quantiles of l_quantity via the value-counts
    CDF: a map-side-combined groupby produces one row per DISTINCT value
    (small domain), the driver sorts the tiny CDF and picks rank
    ceil(q*n). Never sorts or collects the raw column — the shuffle
    moves |distinct values| rows, not |input| rows. Rank rule is pinned
    in the oracle SQL itself (row_number = ceil(q*n)) so both sides use
    the identical IEEE double product."""
    vc = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_quantity"]), ["l_quantity"],
        {"n": (None, "count")},
    ).materialize()
    t = pa.concat_tables(
        b for b in ray.get(vc.to_arrow_refs()) if b.num_rows > 0
    )
    vals = t["l_quantity"].to_numpy(zero_copy_only=False)
    cnts = t["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    row = {}
    for q, name in _Q_LEVELS:
        r = max(1, math.ceil(q * n))
        row[name] = float(vals[np.searchsorted(cum, r)])
    return pd.DataFrame([row])


def q_grouped_median(sf_dir):
    """Per-group exact quantiles (median + p90) via the grouped
    distinct-value CDF: one map-side-combined groupby on (group, value)
    — the exchange moves |group × distinct value| rows — then a bounded
    driver pick per group (groups × distinct values ≤ a few hundred
    here; for continuous value domains this operator would bin first)."""
    vc = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]),
        ["l_returnflag", "l_quantity"], {"n": (None, "count")},
    ).materialize()
    t = pa.concat_tables(
        b for b in ray.get(vc.to_arrow_refs()) if b.num_rows > 0
    )
    df = t.to_pandas().sort_values(["l_returnflag", "l_quantity"])
    rows = []
    for flag, g in df.groupby("l_returnflag", sort=True):
        cum = g["n"].cumsum().to_numpy()
        vals = g["l_quantity"].to_numpy()
        n = int(cum[-1])

        def pick(q):
            return float(vals[np.searchsorted(cum, max(1, math.ceil(q * n)))])

        rows.append({"l_returnflag": flag,
                     "median_qty": pick(0.5), "p90_qty": pick(0.9)})
    return pd.DataFrame(rows)


PAGERANK_ITERS = 5
PAGERANK_SCALE = 10 ** 9
PAGERANK_MAX_SINGLE_EDGES = 5_000_000


def _pagerank_edges(sf_dir, n_nodes: int):
    """Deterministic synthetic link graph over the customer node domain
    (0..n−1, dense): one edge per order, src = o_custkey,
    dst = o_orderkey mod n — the same derived-input pattern as
    q_table_diff's snapshots."""
    orders = T(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _e(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        c = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(c.astype(np.int64), pa.int64()),
            "dst": pa.array((k % n_nodes).astype(np.int64), pa.int64()),
        })

    return orders.map_batches(_e, batch_format="pyarrow")


@ray.remote
def _pagerank_task(n: int, iters: int, *tables: pa.Table) -> pa.Table:
    """Single-task PageRank iteration over the collected edge list —
    the small-graph tier (guard: PAGERANK_MAX_SINGLE_EDGES)."""
    live = live_arrow(tables)
    t = pa.concat_tables(live)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    od = np.bincount(src, minlength=n).astype(np.int64)
    pr = np.full(n, PAGERANK_SCALE // n, dtype=np.int64)
    tele = (15 * PAGERANK_SCALE // 100) // n
    for _ in range(iters):
        c = pr[src] // od[src]
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst, c)
        pr = tele + (85 * s) // 100
    return pa.table({
        "node": pa.array(np.arange(n, dtype=np.int64)),
        "pr_fp": pa.array(pr, pa.int64()),
    })


def q_pagerank(sf_dir, iters: int = PAGERANK_ITERS,
               max_single_edges: int = PAGERANK_MAX_SINGLE_EDGES):
    """PageRank (damping 0.85, fixed iteration count, evaporating
    dangling mass) over the derived order graph — the iterative
    distributed graph algorithm class (alongside q_connected_components'
    label propagation). The recurrence runs ENTIRELY in ×10⁹ integer
    fixed point — pr′(v) = ⌊0.15·S⌋/n + ⌊85·Σ_{u→v}⌊pr(u)/outdeg(u)⌋/100⌋
    — so results are exact, summation-order-independent, and the DuckDB
    oracle (the same recurrence unrolled into one CTE per iteration)
    matches bit for bit.

    Scale plan: per iteration one hash join (edges ⋈ pr on src), one
    map-side-combined groupby on dst, and one left-outer join back onto
    the node list — nothing node- or edge-sized ever sits on the
    driver. Below ``max_single_edges`` the collected-edge single-task
    tier runs instead (both tiers pinned identical by test)."""
    from ray.data.aggregate import Count, Max, Min

    cust = T(sf_dir, "customer", ["c_custkey"])
    dom = cust.aggregate(Min("c_custkey"), Max("c_custkey"), Count())
    n = dom["count()"]
    if dom["min(c_custkey)"] != 0 or dom["max(c_custkey)"] != n - 1:
        # both tiers and the SQL oracle assume a dense 0-based node
        # domain (pr[src] indexing / bincount / arange node ids);
        # diverging silently on a 1-based dump would be worse than
        # failing fast
        raise ValueError(
            f"pagerank needs dense 0-based c_custkey; got "
            f"[{dom['min(c_custkey)']}, {dom['max(c_custkey)']}] n={n}")
    edges = _pagerank_edges(sf_dir, n).materialize()
    tele = (15 * PAGERANK_SCALE // 100) // n
    import ray.data as rd

    if edges.count() <= max_single_edges:
        return rd.from_arrow_refs(
            [_pagerank_task.remote(n, iters, *edges.to_arrow_refs())])

    # materialized: the left-outer join re-consumes nodes every
    # iteration — without this each round re-reads the customer parquet
    nodes = T(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: pa.table({"node": b["c_custkey"]}),
        batch_format="pyarrow").materialize()
    outd = fast_groupby_agg(edges, ["src"], {"od": (None, "count")})
    edges_od = edges.join(outd, "inner", num_partitions=JOIN_PARTS,
                          on=("src",)).materialize()
    pr = nodes.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "pr_fp": pa.array(np.full(b.num_rows, PAGERANK_SCALE // n),
                              pa.int64()),
        }), batch_format="pyarrow").materialize()
    for _ in range(iters):
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
    return pr


def _pagerank_oracle(iters: int = PAGERANK_ITERS) -> str:
    """The q_pagerank recurrence unrolled into one CTE per iteration —
    all-integer arithmetic, so it matches the engine bit for bit."""
    head = f"""
        WITH nn AS (SELECT count(*) AS c FROM customer),
        edges AS (
            SELECT o_custkey AS src,
                   o_orderkey % (SELECT c FROM nn) AS dst
            FROM orders
        ),
        outd AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
        p0 AS (
            SELECT c_custkey AS node,
                   {PAGERANK_SCALE} // (SELECT c FROM nn) AS pr
            FROM customer
        )"""
    body = ""
    for i in range(1, iters + 1):
        body += f""",
        p{i} AS (
            SELECT b.node,
                   ({15 * PAGERANK_SCALE // 100} // (SELECT c FROM nn))
                   + (85 * COALESCE(s.s, 0)) // 100 AS pr
            FROM (SELECT node FROM p0) b
            LEFT JOIN (
                SELECT e.dst AS node, sum(p.pr // o.od) AS s
                FROM edges e
                JOIN p{i - 1} p ON p.node = e.src
                JOIN outd o ON o.src = e.src
                GROUP BY e.dst
            ) s ON s.node = b.node
        )"""
    return head + body + f"""
        SELECT node, CAST(pr AS BIGINT) AS pr_fp FROM p{iters}
    """


TRIANGLES_MAX_SINGLE_EDGES = 20_000_000


TRIANGLES_WEDGE_BUDGET = 50_000_000  # Σ deg·(deg−1)/2 cap for the 1-task tier


@ray.remote
def _triangle_task(max_wedges: int, *tables: pa.Table) -> pa.Table:
    """Single-task wedge expansion + membership probe over the collected
    normalized edge list (u < v, distinct): per equal-u run, all (a < b)
    neighbor pairs expanded in bounded chunks (_run_pair_chunks — peak
    memory O(chunk), not O(Σ deg²)); a wedge is a triangle iff (a, b) is
    itself an edge — probed with one searchsorted per chunk against the
    packed (u<<32|v) edge keys. Counts each triangle exactly once (at
    its minimum node). Guarded on TOTAL wedge volume Σ k·(k−1)/2 — one
    hub under the edge-count guard can still cost O(deg²) compute, so
    the caller falls back to the distributed join tier above the
    budget (the edge-count guard alone cannot see hub skew)."""
    t = pa.concat_tables([x for x in tables if x.num_rows > 0])
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    # already sorted: (u<<32)|v is monotone under the (u, v) lexsort
    keys = (u.astype(np.int64) << 32) | v.astype(np.int64)
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    lens = np.diff(np.r_[starts, len(u)])
    runs = np.flatnonzero(lens >= 2)
    kk = lens[runs].astype(np.int64)
    n_wedges = int((kk * (kk - 1) // 2).sum())
    if n_wedges > max_wedges:
        raise ValueError(
            f"degenerate hub: {n_wedges} wedges across equal-u runs "
            f"(budget {max_wedges})")
    n_tri = 0
    for iu, ju in _run_pair_chunks(starts, lens, runs,
                                   SIM_JOIN_PAIR_CHUNK):
        wk = (v[iu].astype(np.int64) << 32) | v[ju].astype(np.int64)
        pos = np.searchsorted(keys, wk)
        pos[pos >= len(keys)] = len(keys) - 1
        n_tri += int((keys[pos] == wk).sum())
    return pa.table({"n_wedges": pa.array([n_wedges], pa.int64()),
                     "n_triangles": pa.array([n_tri], pa.int64())})


def q_triangle_count(sf_dir,
                     max_single_edges: int = TRIANGLES_MAX_SINGLE_EDGES):
    """Triangle + wedge counts of the derived order graph (undirected,
    de-duplicated, loop-free) — the second-order graph-analytics
    primitive next to q_pagerank/q_connected_components. Each triangle
    counts once, at its minimum-id node (wedges pair only
    greater-than-center neighbors).

    Scale plan: normalized distinct edges via one partial-agg groupby;
    wedges from an edges⋈edges hash self-join on the center node;
    triangles from a second hash join of wedge (a, b) pairs against the
    edge list; both joins carry one count partial-agg behind them —
    nothing graph-sized on the driver. Under the edge guard the
    collected single-task tier runs instead (pinned identical by
    test), itself guarded on TOTAL wedge volume Σ deg·(deg−1)/2
    (TRIANGLES_WEDGE_BUDGET) with fail-over to the join tier — the
    same enforced degenerate-run protection as the similarity join,
    since one hub node under the edge-count guard is still O(deg²)."""
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
    import ray.data as rd

    if edges.count() <= max_single_edges:
        try:
            return rd.from_arrow_refs(
                [_triangle_task.remote(TRIANGLES_WEDGE_BUDGET,
                                       *edges.to_arrow_refs())]
            ).materialize()
        except Exception as e:  # RayTaskError wraps the ValueError
            if "degenerate hub" not in str(e):
                raise
            # hub skew: wedge volume exceeds the single-task budget —
            # the join tier below spreads the same expansion

    right = edges.map_batches(
        lambda b: b.rename_columns(["u_r", "b"]), batch_format="pyarrow")
    wedges = edges.join(right, "inner", num_partitions=JOIN_PARTS,
                        on=("u",), right_on=("u_r",)).map_batches(
        lambda b: b.filter(pc.less(b["v"], b["b"]))
                   .select(["v", "b"]).rename_columns(["a", "b"]),
        batch_format="pyarrow").materialize()
    tri = wedges.join(
        edges.map_batches(lambda b: b.rename_columns(["a_r", "b_r"]),
                          batch_format="pyarrow"),
        "inner", num_partitions=JOIN_PARTS,
        on=("a", "b"), right_on=("a_r", "b_r"))
    return rd.from_arrow(pa.table({
        "n_wedges": pa.array([wedges.count()], pa.int64()),
        "n_triangles": pa.array([tri.count()], pa.int64()),
    }))


def q_percentile_cont(sf_dir):
    """Interpolated (type-7 / SQL percentile_cont) quartiles of
    l_extendedprice per return flag — unlike q_quantiles/q_grouped_median
    (rank-rule picks), these INTERPOLATE between order statistics.
    Exactness: values go to ×100 integer fixed point, and a quartile at
    0-based position k·(n−1)/4 is the integer 4·lo + rem·(hi−lo) in ×400
    units (rem = k·(n−1) mod 4), so engine and oracle do ONE identical
    float division at the end. Plan: one hash shuffle
    (groupby.map_groups) with a per-group numpy sort — group count is
    the partition bound (3 flags here); a high-cardinality group column
    would use the grouped-CDF plan of q_grouped_median instead."""
    ds = T(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def _q(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(_round_half_away(
            g["l_extendedprice"].to_numpy() * 100.0).astype(np.int64))
        n = len(v)
        out = {"l_returnflag": [g["l_returnflag"].iloc[0]], "n": [n]}
        for k, name in ((1, "p25"), (2, "p50"), (3, "p75")):
            pos = k * (n - 1)
            idx, rem = pos // 4, pos % 4
            lo = v[idx]
            hi = v[idx + 1] if rem else lo
            out[name] = [(4 * lo + rem * (hi - lo)) / 400.0]
        return pd.DataFrame(out)

    return ds.groupby("l_returnflag").map_groups(_q, batch_format="pandas")


def q_cohort_retention(sf_dir, max_k: int = 13):
    """Cohort retention matrix — users grouped by their FIRST active
    day (the cohort), counted on each later day-offset k ≤ ``max_k``:
    the canonical product-analytics table. Distinct (day, user) pairs
    and per-user first days each come from one map-side-combined
    partial-agg; a hash join attaches the cohort back onto the pair
    table (user-keyed — the side that can be huge — so no broadcast),
    and the final count is exact because the joined pairs are already
    distinct per (cohort, k, user)."""
    ev = T(sf_dir, "events", ["user_id", "ts"])

    def _day_pairs(b: pa.Table) -> pa.Table:
        d = (b["ts"].to_pandas().to_numpy()
             .astype("datetime64[D]").astype("int64"))
        t = pa.table({"day": pa.array(d, pa.int64()),
                      "user_id": b["user_id"]})
        return pa.TableGroupBy(t, ["day", "user_id"]).aggregate(
            []).rename_columns(["day", "user_id"])

    du = fast_groupby_agg(
        ev.map_batches(_day_pairs, batch_format="pyarrow"),
        ["day", "user_id"], {"_n": (None, "count")},
    ).map_batches(lambda b: b.select(["day", "user_id"]),
                  batch_format="pyarrow").materialize()
    first = fast_groupby_agg(du, ["user_id"], {"c": ("day", "min")}) \
        .map_batches(lambda b: b.rename_columns(["user_r", "c"]),
                     batch_format="pyarrow")
    j = du.join(first, "inner", num_partitions=JOIN_PARTS,
                on=("user_id",), right_on=("user_r",))

    def _mat(b: pa.Table) -> pa.Table:
        day = b["day"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        k = day - c
        keep = k <= max_k
        return pa.table({
            "cohort_day": pa.array(np.datetime_as_string(
                c[keep].astype("datetime64[D]"), unit="D"), pa.string()),
            "k": pa.array(k[keep], pa.int64()),
        })

    return fast_groupby_agg(
        j.map_batches(_mat, batch_format="pyarrow"),
        ["cohort_day", "k"], {"n_users": (None, "count")},
    )


def q_grouped_mad(sf_dir):
    """Median absolute deviation of l_quantity per return flag — the
    outlier-robust spread statistic next to q_grouped_variance. Both
    medians use the engine-wide rank rule (``_rank_pick_sorted``) over
    ×100 integer fixed point, so the two-level SQL window oracle
    matches exactly. Per-group numpy sorts in map_groups (3 groups —
    the partition bound, same caveat as q_percentile_cont)."""
    ds = T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _mad(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(_round_half_away(
            g["l_quantity"].to_numpy() * 100.0).astype(np.int64))
        med = int(_rank_pick_sorted(v, 0.5))
        dd = np.sort(np.abs(v - med))
        return pd.DataFrame({
            "l_returnflag": [g["l_returnflag"].iloc[0]],
            "median_fp": [med],
            "mad_fp": [int(_rank_pick_sorted(dd, 0.5))],
        })

    return ds.groupby("l_returnflag").map_groups(_mad,
                                                 batch_format="pandas")


def q_event_transitions(sf_dir):
    """Per-user event-type transition counts (the Markov/session-mining
    primitive: how often does event X follow event Y?). One hash
    shuffle partitions by user; each group sorts by the deterministic
    (ts, event_id) order and pairs consecutive events with a vectorized
    shift; per-group counters are partial rows that one
    map-side-combined groupby folds globally — the exchange after the
    user partition moves only (prev, next, n) triples."""
    ev = T(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        prev = g["event_type"].to_numpy()[:-1]
        nxt = g["event_type"].to_numpy()[1:]
        if len(prev) == 0:
            return pd.DataFrame({
                "prev_event": pd.Series([], dtype="object"),
                "next_event": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")})
        d = (pd.DataFrame({"prev_event": prev, "next_event": nxt})
             .groupby(["prev_event", "next_event"], sort=False)
             .size().reset_index(name="n"))
        d["n"] = d["n"].astype("int64")
        return d

    pairs = ev.groupby("user_id").map_groups(_pairs, batch_format="pandas")
    return fast_groupby_agg(pairs, ["prev_event", "next_event"],
                            {"n": ("n", "sum")})


def q_fuzzy_best_match(sf_dir):
    """Oracle-backed fuzzy best match: deterministic typo queries
    (p_name with the character at position p_partkey mod len removed,
    for the first 50 parts) matched against the 500-part candidate name
    list by MIN unit-cost Levenshtein, ties broken by name — the
    entity-resolution primitive with an EXACT DuckDB ``levenshtein()``
    oracle (the probabilistic enrich path stays in ``fuzzy_match``).

    Plan: candidates broadcast once by ref into an actor pool (500
    names — the guarded-small side); each query row scans them with the
    two-row DP in ``__call__``. The scan is O(|candidates|) per query —
    the honest cost of exact 1-NN edit distance; a large candidate side
    would move to the n-gram-blocked fuzzy_match plan instead."""
    from ..functions.fuzzy import edit_distance

    part = T(sf_dir, "part", ["p_partkey", "p_name"])
    cand = part.filter(expr="p_partkey < 500").map_batches(
        lambda b: b.select(["p_name"]), batch_format="pyarrow")
    cref = ray.put(sorted(cand.to_pandas()["p_name"].tolist()))

    class _Best:
        def __init__(self):
            self.cands = ray.get(cref)

        def __call__(self, b: pa.Table) -> pa.Table:
            keys, names, dists, qnames = [], [], [], []
            for k, nm in zip(b["p_partkey"].to_pylist(),
                             b["p_name"].to_pylist()):
                pos = k % len(nm)
                q = nm[:pos] + nm[pos + 1:]
                best_d, best_n = None, None
                for c in self.cands:  # sorted — first win = name tiebreak
                    d = edit_distance(q, c)
                    if best_d is None or d < best_d:
                        best_d, best_n = d, c
                keys.append(k)
                qnames.append(q)
                names.append(best_n)
                dists.append(best_d)
            return pa.table({
                "p_partkey": pa.array(keys, pa.int64()),
                "qname": pa.array(qnames, pa.string()),
                "match_name": pa.array(names, pa.string()),
                "dist": pa.array(dists, pa.int64()),
            })

    return part.filter(expr="p_partkey < 50").map_batches(
        _Best, batch_format="pyarrow", concurrency=(1, 4), batch_size=16)


def q_rolling_active_users(sf_dir, window_days: int = 7):
    """Rolling 7-day distinct active users (WAU) per day — the
    retention-dashboard primitive that needs a DISTINCT inside a
    sliding window. Exact and fully distributed: distinct (day, user)
    pairs via one map-side-combined groupby, each pair exploded into
    its ``window_days`` contributing window-end days (a ×7 fan-out of
    the already-distinct pair table, not of raw events), then a second
    distinct-pair + count exchange. Every day from an activity day D to
    D+6 receives D's users; both sides state the same fan-out, so the
    oracle matches exactly."""
    ev = T(sf_dir, "events", ["user_id", "ts"])

    def _day_pairs(b: pa.Table) -> pa.Table:
        d = (b["ts"].to_pandas().to_numpy()
             .astype("datetime64[D]").astype("int64"))
        t = pa.table({
            "day": pa.array(d, pa.int64()),
            "user_id": b["user_id"],
        })
        # map-side distinct before the exchange
        return pa.TableGroupBy(t, ["day", "user_id"]).aggregate(
            []).rename_columns(["day", "user_id"])

    pairs = fast_groupby_agg(
        ev.map_batches(_day_pairs, batch_format="pyarrow"),
        ["day", "user_id"], {"_n": (None, "count")},
    )

    def _explode(b: pa.Table) -> pa.Table:
        d = b["day"].to_numpy(zero_copy_only=False)
        u = b["user_id"].to_numpy(zero_copy_only=False)
        k = window_days
        return pa.table({
            "wday": pa.array(np.repeat(d, k)
                             + np.tile(np.arange(k, dtype=np.int64),
                                       len(d)), pa.int64()),
            "user_id": pa.array(np.repeat(u, k), pa.int64()),
        })

    wpairs = fast_groupby_agg(
        pairs.map_batches(_explode, batch_format="pyarrow"),
        ["wday", "user_id"], {"_n": (None, "count")},
    )
    counts = fast_groupby_agg(wpairs, ["wday"], {"wau": (None, "count")})

    def _fmt(b: pa.Table) -> pa.Table:
        days = b["wday"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        return pa.table({
            "day": pa.array(np.datetime_as_string(days, unit="D"),
                            pa.string()),
            "wau": b["wau"],
        })

    return counts.map_batches(_fmt, batch_format="pyarrow")


def q_key_skew(sf_dir):
    """Key-distribution skew profile of orders.o_custkey — the
    diagnostic a shuffle planner consults before picking partition
    counts / salting hot keys: distinct-key count, top-1 key share, and
    the Gini coefficient of the per-key frequency distribution. All
    integer arithmetic (shares and Gini emitted as ×10⁶ floor
    fixed-point), so the oracle matches exactly. Gini over counts c_i
    sorted ascending (1-based rank i): (2·Σi·c_i − (k+1)·S) / (k·S) —
    rank ties among equal counts don't change the sum, so the
    deterministic tie order is irrelevant.

    Plan: one map-side-combined groupby to per-key counts (the only
    corpus-sized exchange), then the k-row count table aggregates via a
    sort + one map_groups fold — key-table-sized, never row-sized."""
    counts = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey"]),
        ["o_custkey"], {"c": (None, "count")},
    )

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(g["c"].to_numpy().astype(np.int64))
        k = len(c)
        s = int(c.sum())
        i = np.arange(1, k + 1, dtype=np.int64)
        num = 2 * int((i * c).sum()) - (k + 1) * s
        return pd.DataFrame({
            "n_keys": [k], "n_rows": [s],
            "top1_fp": [int(c[-1]) * 1_000_000 // s],
            "gini_fp": [num * 1_000_000 // (k * s)],
        })

    return counts.map_batches(
        lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                 pa.int64())),
        batch_format="pyarrow",
    ).groupby("_g").map_groups(
        lambda g: _fold(g), batch_format="pandas")


def q_winsorize(sf_dir):
    """Winsorized (percentile-clipped) grouped sums — the outlier-
    robust feature-normalization primitive: clip l_extendedprice to its
    per-group [p05, p95] band (rank-rule quantiles, same pick as
    q_quantiles) and report clip counts + the clipped sum, all in ×100
    integer fixed point so engine and oracle agree exactly.

    Two passes: per-group quantiles from a map_groups numpy sort
    (3 groups — the partition bound; a wide group column would use the
    grouped-CDF plan), thresholds broadcast as a dict (group-count
    sized), then one map-side clip + partial-agg sum — the second pass
    exchanges only group partials."""
    ds = T(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "v": pa.array(_round_half_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False)
                * 100.0).astype(np.int64), pa.int64()),
        })

    fp = ds.map_batches(_fp, batch_format="pyarrow").materialize()

    def _qs(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["v"].to_numpy())
        return pd.DataFrame({"l_returnflag": [g["l_returnflag"].iloc[0]],
                             "lo": [int(_rank_pick_sorted(v, 0.05))],
                             "hi": [int(_rank_pick_sorted(v, 0.95))]})

    band_rows = (fp.groupby("l_returnflag")
                   .map_groups(_qs, batch_format="pandas").take_all())
    bref = ray.put((
        pa.array([r["l_returnflag"] for r in band_rows]),
        np.array([r["lo"] for r in band_rows], dtype=np.int64),
        np.array([r["hi"] for r in band_rows], dtype=np.int64),
    ))

    def _clip(b: pa.Table) -> pa.Table:
        # vectorized band probe: one dictionary-encode of the group
        # column against the band keys, then two numpy takes — no
        # per-row Python
        keys, los, his = ray.get(bref)
        codes = pc.index_in(b["l_returnflag"], value_set=keys) \
            .to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        lo = los[codes]
        hi = his[codes]
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "clo": pa.array((v < lo).astype(np.int64), pa.int64()),
            "chi": pa.array((v > hi).astype(np.int64), pa.int64()),
            "cv": pa.array(np.clip(v, lo, hi), pa.int64()),
        })

    return fast_groupby_agg(
        fp.map_batches(_clip, batch_format="pyarrow"),
        ["l_returnflag"],
        {"n": (None, "count"), "n_clipped_lo": ("clo", "sum"),
         "n_clipped_hi": ("chi", "sum"), "sum_clipped_fp": ("cv", "sum")},
    )


def q_grouped_entropy(sf_dir):
    """Shannon entropy (nats) of each user's event-type distribution —
    the distribution-skew signal corpus-balancing pipelines gate on.
    Two partial-agg exchanges, both pre-combined map-side: (user, type)
    counts, then per-user (n, Σ round(c·ln c · 10⁹)) — the ln is applied
    to EXACT integer counts on both engine and oracle sides and each
    term is quantized to ×10⁹ int64 BEFORE the distributed sum, so the
    exchange moves only integers and the result is summation-order
    independent (float addition is not associative; an unquantized
    float Σ would make the bitwise oracle gate layout-dependent).
    ln is evaluated through libm (math.log per distinct count) rather
    than numpy's SIMD log: DuckDB's ln calls std::log → libm, and the
    two implementations can disagree by 1 ulp, which near a .5
    quantization boundary would flip the fixed-point bit — same-libm
    evaluation makes both sides bit-identical on a host.
    Headroom: c·ln(c)·10⁹ stays under int64 through c ≈ 2×10⁸ events
    per (user, type). The final expression ln(n) − (s/10⁹)/n is
    mirrored operation-for-operation, emitted as ×10⁶ half-away fixed
    point."""
    counts = fast_groupby_agg(
        T(sf_dir, "events", ["user_id", "event_type"]),
        ["user_id", "event_type"], {"c": (None, "count")},
    )

    def _clnc(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(c, return_inverse=True)
        lnu = np.array([math.log(float(u)) for u in uniq], np.float64)
        cln = c.astype(np.float64) * lnu[inv]
        return pa.table({
            "user_id": b["user_id"],
            "c": b["c"],
            "clnc_fp": pa.array(
                _round_half_away(cln * 1e9).astype(np.int64),
                pa.int64()),
        })

    agg = fast_groupby_agg(
        counts.map_batches(_clnc, batch_format="pyarrow"),
        ["user_id"], {"n": ("c", "sum"), "s": ("clnc_fp", "sum")},
    )

    def _ent(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["s"].to_numpy(zero_copy_only=False).astype(np.float64) / 1e9
        un, inv = np.unique(n, return_inverse=True)
        lnn = np.array([math.log(float(u)) for u in un], np.float64)
        ent = lnn[inv] - s / n
        return pa.table({
            "user_id": b["user_id"],
            "n_events": b["n"],
            "entropy_fp": pa.array(
                _round_half_away(ent * 1_000_000.0).astype(np.int64),
                pa.int64()),
        })

    return agg.map_batches(_ent, batch_format="pyarrow")


def q_cross_join(sf_dir):
    """Cartesian product region × nation with a derived label — the
    small-dimension CROSS JOIN (enumeration/grid expansion) primitive.
    One side broadcasts by ref (5 rows); each nation batch emits its
    product block map-side — no shuffle at all. A big×big cross join
    has no scale-correct form and is deliberately not offered."""
    regions = ray.put(pa.concat_tables(ray.get(
        T(sf_dir, "region", ["r_name"]).to_arrow_refs())))

    class _Cross:
        def __init__(self):
            r = ray.get(regions)
            self.r_names = r["r_name"].to_pylist()

        def __call__(self, b: pa.Table) -> pa.Table:
            k = len(self.r_names)
            n = b.num_rows
            nn = b["n_name"].to_pylist()
            return pa.table({
                "r_name": pa.array(np.repeat(self.r_names, n).tolist(),
                                   pa.string()),
                "n_name": pa.array(nn * k, pa.string()),
                "pair": pa.array(
                    [f"{r}:{x}" for r in self.r_names for x in nn],
                    pa.string()),
            })

    return T(sf_dir, "nation", ["n_name"]).map_batches(
        _Cross, batch_format="pyarrow", concurrency=(1, 2))


def q_segment_monthly_revenue(sf_dir):
    """TPC-H-Q3-shaped composite: semi-filter orders to one customer
    segment with a broadcast key set (``ray.put`` once, vectorized
    ``pc.index_in`` probe per batch), then a monthly revenue rollup —
    filter-pushdown + broadcast-join + aggregate in one pipeline."""
    keys = ray.put(
        T(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
            lambda b: b.filter(
                pc.equal(b["c_mktsegment"], "BUILDING")
            ).select(["c_custkey"]),
            batch_format="pyarrow",
        ).to_arrow_refs()
    )

    class _Semi:
        def __init__(self):
            live = [x for x in ray.get(ray.get(keys)) if x.num_rows > 0]
            # zero matching customers → empty key set → filter drops all
            self.keys = (pa.concat_tables(live)["c_custkey"].combine_chunks()
                         if live else pa.array([], pa.int64()))

        def __call__(self, b: pa.Table) -> pa.Table:
            return b.filter(
                pc.is_valid(pc.index_in(b["o_custkey"], value_set=self.keys))
            )

    ds = T(sf_dir, "orders",
           ["o_custkey", "o_orderdate", "o_totalprice"]).map_batches(
        _Semi, batch_format="pyarrow", concurrency=2)
    ds = ds.map_batches(
        lambda b: pa.table({
            "month": pc.strftime(b["o_orderdate"], format="%Y-%m"),
            "o_totalprice": b["o_totalprice"],
        }),
        batch_format="pyarrow",
    )
    out = fast_groupby_agg(ds, ["month"], {
        "revenue": ("o_totalprice", "sum"), "n_orders": (None, "count"),
    })
    return out.map_batches(_canon_stage({"revenue": 4}),
                           batch_format="pyarrow")


# ========================================================== string agg


def q_string_agg(sf_dir):
    """Ordered string aggregation: nation names per region, sorted and
    comma-joined (bounded group count → map_groups is fine)."""
    ds = T(sf_dir, "nation", ["n_regionkey", "n_name"])

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_regionkey": [df["n_regionkey"].iloc[0]],
            "nations": [",".join(sorted(df["n_name"]))],
        })

    return ds.groupby("n_regionkey").map_groups(_agg, batch_format="pandas")


# ======================================================= distinct count


def q_distinct_count(sf_dir):
    """Exact global distinct counts via map-side-combined value-counts
    (the shuffle moves one row per distinct key)."""
    n_parts = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_partkey"]), ["l_partkey"],
        {"__n": (None, "count")},
    ).count()
    n_supps = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_suppkey"]), ["l_suppkey"],
        {"__n": (None, "count")},
    ).count()
    return pd.DataFrame([{"n_parts": n_parts, "n_supps": n_supps}])


def q_hll_distinct(sf_dir):
    """Approximate distinct count of l_partkey with a HyperLogLog sketch
    (p=14, 16 KiB registers): per-batch register partials merged with a
    single elementwise-max reduction — the 100-TB path for distinct
    counts where the exact value-counts shuffle is unaffordable. Returns
    approx, exact, and relative error (rows-only check; the error bound
    is asserted in tests/test_relational.py)."""
    from ..functions.sketches import HLL_P, hll_estimate, hll_partial

    ds = T(sf_dir, "lineitem", ["l_partkey"])

    def _partial(b: pa.Table) -> pa.Table:
        keys = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({"regs": pa.array([hll_partial(keys).tobytes()],
                                          pa.binary())})

    # register max is associative → tree-combine inside Ray
    # (_tree_reduce_buffers); the driver only ever sees ≤32 partial
    # buffers (one buffer per block would be 16 KB × n_blocks — real
    # memory at 100-TB block counts)
    parts = ds.map_batches(_partial, batch_format="pyarrow")
    regs = _tree_reduce_buffers(parts, "regs", np.maximum, np.uint8)
    approx = hll_estimate(regs)
    exact = fast_groupby_agg(ds, ["l_partkey"],
                             {"__n": (None, "count")}).count()
    return pd.DataFrame([{
        "approx": float(approx), "exact": int(exact),
        "rel_err": abs(approx - exact) / max(exact, 1),
    }])


def _tree_reduce_buffers(parts, col: str, combine, dtype) -> np.ndarray:
    """Tree-combine single-binary-column sketch partials (one fixed-size
    buffer per input block) inside Ray; the driver only ever sees ≤32
    buffers regardless of block count. `combine(acc, arr)` must be
    associative+commutative (sum, max…)."""

    def _merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        acc = None
        for buf in b[col].to_pylist():
            arr = np.frombuffer(buf, dtype=dtype)
            acc = arr.copy() if acc is None else combine(acc, arr)
        return pa.table({col: pa.array([acc.tobytes()], pa.binary())})

    parts = parts.materialize()
    while parts.count() > 32:
        parts = parts.repartition(
            max(1, parts.num_blocks() // 8)
        ).map_batches(_merge, batch_format="pyarrow",
                      batch_size=None).materialize()
    acc = None
    for t in ray.get(parts.to_arrow_refs()):
        for buf in t[col].to_pylist():
            arr = np.frombuffer(buf, dtype=dtype)
            acc = arr.copy() if acc is None else combine(acc, arr)
    return acc


def q_approx_quantiles(sf_dir):
    """Continuous-column quantiles via a mergeable fixed-range histogram
    sketch (8192 bins): pass 1 is a min/max aggregate, pass 2 emits one
    64 KiB count buffer per block, tree-summed inside Ray — no sort, no
    distinct-value exchange (the exact-CDF plan q_quantiles uses is only
    for small discrete domains). Rank error ≤ one bin mass; asserted
    against the exact quantile in tests (rows-only for the driver)."""
    from ray.data.aggregate import Max, Min

    from ..functions.sketches import hist_partial, hist_quantile

    ds = T(sf_dir, "lineitem", ["l_extendedprice"])
    mm = ds.aggregate(Min("l_extendedprice", alias_name="lo"),
                      Max("l_extendedprice", alias_name="hi"))
    lo, hi = float(mm["lo"]), float(mm["hi"])

    def _partial(b: pa.Table) -> pa.Table:
        v = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({"counts": pa.array(
            [hist_partial(v, lo, hi).tobytes()], pa.binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    counts = _tree_reduce_buffers(parts, "counts", np.add, np.int64)
    return pd.DataFrame([{
        "p50": hist_quantile(counts, lo, hi, 0.5),
        "p95": hist_quantile(counts, lo, hi, 0.95),
        "p99": hist_quantile(counts, lo, hi, 0.99),
        "n": int(counts.sum()), "lo": lo, "hi": hi,
    }])


def q_source_cap(sf_dir):
    """Per-source document cap (corpus balancing / data mixing): keep at
    most 15 docs per source, selected in deterministic md5 order —
    mergeable grouped top-k (stages/fastagg.grouped_topk), so the cap
    runs map-side and the exchange carries ≤ cap rows per (block,
    source)."""
    from ..stages.fastagg import grouped_topk

    def _h(b: pa.Table) -> pa.Table:
        h = [hashlib.md5(str(i).encode()).hexdigest()
             for i in b["doc_id"].to_pylist()]
        return b.append_column("h", pa.array(h, pa.string()))

    ds = T(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        _h, batch_format="pyarrow")
    out = grouped_topk(ds, ["source"], ["h", "doc_id"], [True, True], 15)
    return out.select_columns(["source", "doc_id", "rank"])


def q_stratified_sample(sf_dir):
    """Stratified deterministic sampling with per-stratum rates (25% of
    'en' docs, 50% of every other language) — the language-rebalancing
    primitive; md5-gated so the sample is reproducible and oracle-exact
    across runs and cluster sizes."""

    def _s(b: pa.Table) -> pa.Table:
        keep = []
        for i, lang in zip(b["doc_id"].to_pylist(), b["lang"].to_pylist()):
            if lang is None:  # SQL: NULL <> 'en' is NULL → row excluded
                keep.append(False)
                continue
            nib = int(hashlib.md5(str(i).encode()).hexdigest()[0], 16)
            keep.append(nib < (4 if lang == "en" else 8))
        return b.filter(pa.array(keep, pa.bool_()))

    return T(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        _s, batch_format="pyarrow")


# ===================================================== hash sampling


def q_sample_hash(sf_dir):
    """Deterministic hash sampling: keep documents whose md5(doc_id)
    starts with hex 0–3 (a 25% reproducible sample — the corpus-subset
    primitive; unlike random_sample it is oracle-exact and stable across
    runs/cluster sizes)."""

    def _sample(b: pa.Table) -> pa.Table:
        mask = [hashlib.md5(str(i).encode()).hexdigest()[0] in "0123"
                for i in b["doc_id"].to_pylist()]
        return b.filter(pa.array(mask, pa.bool_()))

    return T(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _sample, batch_format="pyarrow")


# =============================================== term document frequency


_TOKEN = re.compile(r"[a-z0-9_]+")


def _distinct_terms_batch(b: pa.Table) -> pa.Table:
    """Per-doc DISTINCT tokens flat-mapped to term rows (shared by
    q_term_doc_freq and q_tfidf_top_terms so tokenization can never
    desynchronize between them and their oracles)."""
    terms: list[str] = []
    for txt in b["text"].to_pylist():
        terms.extend(set(_TOKEN.findall(txt.lower())))
    return pa.table({"term": pa.array(terms, pa.string())})



def q_term_doc_freq(sf_dir):
    """Top-50 vocabulary terms by document frequency: per-doc DISTINCT
    tokens flat-mapped to term rows, map-side-combined groupby count,
    then a tiny sort+limit. The flat_map emits |vocab per doc| rows, and
    the shuffle moves one row per (block, term) — vocabulary-sized, not
    corpus-sized."""

    ds = T(sf_dir, "documents", ["text"]).map_batches(
        _distinct_terms_batch, batch_format="pyarrow")
    out = fast_groupby_agg(ds, ["term"], {"df": (None, "count")})
    return out.sort(["df", "term"], descending=[True, False]).limit(50)


# Above this many vocabulary terms the per-actor df dict stops being a
# "small side" (a web corpus's raw vocabulary is effectively unbounded:
# urls, typos, ids) and the join path runs instead. Same guard pattern
# as dedup_text.MAX_BROADCAST_KEYS; both paths pinned identical by
# tests/test_relational.py.
TFIDF_MAX_BROADCAST_VOCAB = 2_000_000


def q_tfidf_top_terms(sf_dir,
                      max_broadcast_vocab: int = TFIDF_MAX_BROADCAST_VOCAB):
    """Per-document top-3 vocabulary terms by a tf/df relevance score —
    the vocabulary-pruning / keyword-extraction primitive. Two passes:
    (1) document frequency via the same distinct-term flat_map as
    q_term_doc_freq; (2) per-doc tf scored against df, local top-3.
    Score is INTEGER (tf·10⁶ // df) so ranking is bitwise deterministic
    on both engine and oracle sides — a float tf·ln(N/df) would
    rank-flip on 1-ULP log differences between numpy and SQL.

    The df side is CARDINALITY GUARDED: below `max_broadcast_vocab` it
    broadcasts once (``ray.put``) into scoring actors; above it (raw web
    vocabulary is unbounded — urls, typos) the (doc, term, tf) rows hash-
    join the df table and a mergeable grouped top-k picks the winners."""

    docs = T(sf_dir, "documents", ["doc_id", "text"])
    df_tbl = fast_groupby_agg(
        docs.map_batches(_distinct_terms_batch, batch_format="pyarrow"),
        ["term"], {"df": (None, "count")},
    ).materialize()

    def _tf_rows(b: pa.Table) -> pa.Table:
        out_doc, out_term, out_tf = [], [], []
        for doc_id, txt in zip(b["doc_id"].to_pylist(),
                               b["text"].to_pylist()):
            tf: dict[str, int] = {}
            for w in _TOKEN.findall(txt.lower()):
                tf[w] = tf.get(w, 0) + 1
            for t, c in tf.items():
                out_doc.append(doc_id)
                out_term.append(t)
                out_tf.append(c)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "term": pa.array(out_term, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
        })

    if df_tbl.count() > max_broadcast_vocab:
        # join path: (doc, term, tf) ⋈ df on term, then mergeable top-k
        from ..stages.fastagg import grouped_topk

        tf_rows = docs.map_batches(_tf_rows, batch_format="pyarrow")
        joined = tf_rows.join(df_tbl, "inner", num_partitions=JOIN_PARTS,
                              on=("term",))
        scored = joined.map_batches(
            lambda b: pa.table({
                "doc_id": b["doc_id"],
                "term": b["term"],
                "tf": b["tf"],
                "score_fp": pc.cast(
                    pc.divide(pc.multiply(b["tf"], 1_000_000), b["df"]),
                    pa.int64()),
            }),
            batch_format="pyarrow",
        )
        top = grouped_topk(scored, ["doc_id"], ["score_fp", "term"],
                           [False, True], 3)
        return top.select_columns(["doc_id", "term", "tf", "score_fp"])

    dref = ray.put(df_tbl.to_arrow_refs())

    class _Score:
        def __init__(self):
            t = pa.concat_tables(
                x for x in ray.get(ray.get(dref)) if x.num_rows > 0
            )
            self.df = dict(zip(t["term"].to_pylist(),
                               t["df"].to_pylist()))

        def __call__(self, b: pa.Table) -> pa.Table:
            out_doc, out_term, out_tf, out_score = [], [], [], []
            for doc_id, txt in zip(b["doc_id"].to_pylist(),
                                   b["text"].to_pylist()):
                tf: dict[str, int] = {}
                for w in _TOKEN.findall(txt.lower()):
                    tf[w] = tf.get(w, 0) + 1
                scored = sorted(
                    ((t, c, (c * 1_000_000) // self.df[t])
                     for t, c in tf.items()),
                    key=lambda x: (-x[2], x[0]),
                )[:3]
                for t, c, s in scored:
                    out_doc.append(doc_id)
                    out_term.append(t)
                    out_tf.append(c)
                    out_score.append(s)
            return pa.table({
                "doc_id": pa.array(out_doc, pa.int64()),
                "term": pa.array(out_term, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
                "score_fp": pa.array(out_score, pa.int64()),
            })

    return docs.map_batches(_Score, batch_format="pyarrow", concurrency=2)


# ==================================================== embedding norms


def q_embedding_norms(sf_dir):
    """Per-vector L2 norm over the list<float> embedding column — the
    zero-copy Arrow list kernel pattern (values buffer → numpy,
    reduceat over offsets; no per-row Python)."""

    def _norms(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = la.values.to_numpy(zero_copy_only=False).astype(np.float64)
        offs = la.offsets.to_numpy().astype(np.int64)
        sums = np.add.reduceat(flat * flat, offs[:-1])
        sums[offs[:-1] == offs[1:]] = 0.0  # reduceat quirk on empty lists
        l2 = np.sqrt(sums)
        p = 1e6
        return pa.table({
            "vec_id": b["vec_id"],
            "l2": np.round(l2 * p) / p,
        })

    return T(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        _norms, batch_format="pyarrow")


def q_export_partitioned(sf_dir):
    """Partitioned-sink round trip: orders written as hive-partitioned
    Parquet (one directory per order month — the resumable-output layout
    the store contract requires), read back with partition pruning, then
    counted per partition. The oracle recomputes the per-month counts
    from the source table, so the sink+read-back path is end-to-end
    value-checked, not just smoke-tested."""
    import shutil
    import tempfile

    import ray.data as rd

    out = tempfile.mkdtemp(prefix="fcray_export_")
    try:
        ds = T(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
            lambda b: pa.table({
                "o_orderkey": b["o_orderkey"],
                "month": pc.strftime(b["o_orderdate"], format="%Y-%m"),
            }),
            batch_format="pyarrow",
        )
        ds.write_parquet(out, partition_cols=["month"])
        back = rd.read_parquet(out)
        got = fast_groupby_agg(back, ["month"], {"n": (None, "count")})
        # hive partition values read back as large_string/dictionary on
        # some paths — pin the comparison dtype
        return got.map_batches(
            lambda b: pa.table({
                "month": pc.cast(b["month"], pa.string()),
                "n": b["n"],
            }),
            batch_format="pyarrow",
        ).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _skyline_2d(p: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D skyline (maximize p, minimize d) with
    duplicate-safe dominance: a row survives iff its d equals the min d
    at its own p AND is strictly below the min d over all higher p.
    O(n log n); identical (p, d) duplicates all survive (neither
    dominates the other — no strict part)."""
    up, inv = np.unique(p, return_inverse=True)  # up ascending
    k = len(up)
    md = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(md, inv, d)
    # higher[i] = min d over prices STRICTLY above up[i] (suffix min
    # of md, shifted to exclude self; +inf at the top price)
    higher = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
    if k > 1:
        higher[:-1] = np.minimum.accumulate(md[::-1])[::-1][1:]
    return (d == md[inv]) & (d < higher[inv])


def q_pareto_frontier(sf_dir):
    """Pareto frontier (skyline) of orders — maximize price, minimize
    order date: the multi-objective shortlist operator (best-tradeoff
    rows no other row beats on both axes). Dominance is duplicate-safe
    (tied rows survive together) and runs in ×100 integer fixed point /
    epoch days, exactly as the NOT EXISTS oracle states it.

    Scale plan: the skyline filter is MERGEABLE — skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B)) since any dominator itself
    survives locally — so each block reduces to its local frontier
    (vectorized O(n log n)) and one tiny final task merges the
    frontiers; the exchange moves only local-skyline rows (typically
    O(log n) of each block)."""
    ds = T(sf_dir, "orders",
           ["o_orderkey", "o_totalprice", "o_orderdate"])

    def _prep(b: pa.Table) -> pa.Table:
        p = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)
        d = (b["o_orderdate"].to_pandas().to_numpy()
             .astype("datetime64[D]").astype("int64"))
        keep = _skyline_2d(p, d)
        return pa.table({
            "o_orderkey": b["o_orderkey"].filter(pa.array(keep)),
            "price_fp": pa.array(p[keep], pa.int64()),
            "d": pa.array(d[keep], pa.int64()),
            "date": pc.strftime(b["o_orderdate"].filter(pa.array(keep)),
                                format="%Y-%m-%d"),
        })

    local = ds.map_batches(_prep, batch_format="pyarrow").materialize()

    @ray.remote
    def _merge(*tables: pa.Table) -> pa.Table:
        live = [x for x in tables if x.num_rows > 0]
        if not live:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "price_fp": pa.array([], pa.int64()),
                             "date": pa.array([], pa.string())})
        t = pa.concat_tables(live)
        keep = _skyline_2d(t["price_fp"].to_numpy(zero_copy_only=False),
                           t["d"].to_numpy(zero_copy_only=False))
        return t.filter(pa.array(keep)).select(
            ["o_orderkey", "price_fp", "date"])

    import ray.data as rd
    return rd.from_arrow_refs([_merge.remote(*local.to_arrow_refs())])


def q_export_jsonl_csv(sf_dir):
    """JSONL + CSV source/sink round trip — the interchange formats
    every ingest pipeline meets before Parquet: documents stream to
    newline-delimited JSON, events stream to CSV (both sharded — one
    file per block, the resumable layout), each is read back with Ray
    Data's native readers, and per-source / per-type counts plus an
    integer value checksum prove the round trip byte-faithful. The
    oracle recomputes both from the source tables, so sink + reader are
    value-checked end to end, not smoke-tested."""
    import shutil
    import tempfile

    import ray.data as rd

    out = tempfile.mkdtemp(prefix="fcray_interchange_")
    try:
        T(sf_dir, "documents", ["doc_id", "source"]) \
            .write_json(f"{out}/docs")
        T(sf_dir, "events", ["event_id", "event_type"]) \
            .write_csv(f"{out}/events")
        docs = fast_groupby_agg(
            rd.read_json(f"{out}/docs"), ["source"],
            {"n": (None, "count"), "id_sum": ("doc_id", "sum")},
        ).map_batches(
            lambda b: pa.table({
                "key": pc.cast(b["source"], pa.string()),
                "n": b["n"],
                "id_sum": pc.cast(b["id_sum"], pa.int64()),
            }), batch_format="pyarrow")
        ev = fast_groupby_agg(
            rd.read_csv(f"{out}/events"), ["event_type"],
            {"n": (None, "count"), "id_sum": ("event_id", "sum")},
        ).map_batches(
            lambda b: pa.table({
                "key": pc.cast(b["event_type"], pa.string()),
                "n": b["n"],
                "id_sum": pc.cast(b["id_sum"], pa.int64()),
            }), batch_format="pyarrow")
        return docs.union(ev).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_pack_sequences(sf_dir, budget: int = 2048):
    """Sequence packing: greedy next-fit of documents into fixed
    token-budget bins (the batch-construction op for LLM training).
    Docs are processed in doc_id order WITHIN each block and bins never
    span blocks — packing is embarrassingly parallel per partition, at
    the cost of some per-block fragmentation (bounded by one bin per
    block). A doc longer than the budget gets its own bin. Rows-only:
    bin feasibility + order preservation are asserted in tests."""

    def _pack(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values("doc_id")
        toks = np.minimum(df["n_chars"].to_numpy() // 4, 10**9)  # ~4 chars/token
        bins, fill = [], 0
        cur = 0
        for t in toks:
            if fill > 0 and fill + t > budget:
                cur += 1
                fill = 0
            bins.append(cur)
            fill += t
        # bin ids must be GLOBALLY unique while packing stays per-block:
        # namespace them by the block's first doc_id (blocks partition
        # the id space, so namespaces can't collide)
        ns = int(df["doc_id"].iloc[0]) * 1_000_000 if len(df) else 0
        out = pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy()),
            "n_tokens": pa.array(toks.astype(np.int64)),
            "bin": pa.array(ns + np.asarray(bins, dtype=np.int64)),
        })
        return out

    # batch_size=None → one call per block: bins are per-block by design
    return T(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _pack, batch_format="pyarrow", batch_size=None)


def q_decontaminate(sf_dir, bench_docs: int = 5, k: int = 8):
    """Train/test decontamination: flag training documents sharing any
    word 8-shingle with a benchmark set (here: the first `bench_docs`
    docs stand in for the eval set). The benchmark shingle-hash set is
    tiny by construction → broadcast once (``ray.put``); each batch
    probes with a vectorized ``np.isin``. Returns (doc_id,
    contaminated) for every doc. Rows-only: overlap semantics are
    asserted in tests (every flagged doc really shares a shingle)."""
    from ..functions.sketches import _hash64, shingles

    docs = T(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.map_batches(
        lambda b: b.filter(pc.less(b["doc_id"], bench_docs)),
        batch_format="pyarrow",
    )
    bench_hashes: set[int] = set()
    for b in bench.iter_batches(batch_format="pyarrow"):
        for txt in b["text"].to_pylist():
            bench_hashes.update(_hash64(shingles(txt, k)).tolist())
    href = ray.put(np.fromiter(bench_hashes, dtype=np.uint64,
                               count=len(bench_hashes)))

    class _Probe:
        def __init__(self):
            self.bench = np.sort(ray.get(href))

        def __call__(self, b: pa.Table) -> pa.Table:
            flags = []
            for doc_id, txt in zip(b["doc_id"].to_pylist(),
                                   b["text"].to_pylist()):
                if doc_id < bench_docs:
                    flags.append(True)  # the benchmark itself
                    continue
                h = _hash64(shingles(txt, k))
                if len(h) == 0 or len(self.bench) == 0:
                    flags.append(False)  # nothing to overlap with
                    continue
                idx = np.searchsorted(self.bench, h)
                idx[idx == len(self.bench)] = 0
                flags.append(bool(np.any(self.bench[idx] == h)))
            return pa.table({
                "doc_id": b["doc_id"],
                "contaminated": pa.array(flags, pa.bool_()),
            })

    return docs.map_batches(_Probe, batch_format="pyarrow", concurrency=2)


# ============================================== range join / similarity join

RANGE_JOIN_MOD = 89        # window selector (co-prime with as-of's 97)
_RJ_US_PER_MIN = 60_000_000


def q_range_join(sf_dir):
    """Interval (range) join: each event matched to EVERY "campaign
    window" whose [start, end) span contains the event's timestamp — the
    general non-equi containment join Ray Data lacks natively (as-of
    covers only "latest marker ≤ ts"; this has multiplicity, and windows
    may overlap). Windows derive deterministically from the events table
    itself: rows with ``event_id % 89 == 0`` open a window of
    ``30 + (event_id % 5) * 15`` minutes — variable spans, so the probe
    needs the max-span candidate bound (the general interval-join shape,
    not fixed-width bucketing).

    Plan: the window side is sparse by construction (1/89 of events), so
    it is broadcast once (``ray.put``) sorted by start; each batch finds
    its candidate windows with two vectorized ``searchsorted`` calls
    (start ≤ ts and start > ts − max_span — anything earlier provably
    ended) and filters candidates by window end. O(log W + hits) per
    event, no shuffle of the big side. Partitioning assumption (per the
    engine's custom-operator contract): the WINDOW side fits in worker
    memory; if it did not, range-partition both sides by time bucket
    (windows replicated into each bucket they overlap) and run the same
    probe per bucket."""
    ev = T(sf_dir, "events", ["event_id", "ts"])

    def _windows(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False)
        w = b.filter(pa.array(ids % RANGE_JOIN_MOD == 0))
        wid = w["event_id"].to_numpy(zero_copy_only=False)
        start = _ts_us(w["ts"])
        dur = (30 + (wid % 5) * 15) * _RJ_US_PER_MIN
        return pa.table({
            "window_id": pa.array(wid, pa.int64()),
            "start_us": pa.array(start, pa.int64()),
            "end_us": pa.array(start + dur, pa.int64()),
        })

    windows = ev.map_batches(_windows, batch_format="pyarrow").materialize()
    wref = ray.put(windows.to_arrow_refs())

    class _RangeProbe:
        def __init__(self):
            live = [t for t in ray.get(ray.get(wref)) if t.num_rows > 0]
            if not live:
                self.start = np.empty(0, dtype=np.int64)
                self.end = np.empty(0, dtype=np.int64)
                self.wid = np.empty(0, dtype=np.int64)
                self.max_span = 0
                return
            w = pa.concat_tables(live)
            start = w["start_us"].to_numpy(zero_copy_only=False)
            order = np.argsort(start, kind="stable")
            self.start = start[order]
            self.end = w["end_us"].to_numpy(zero_copy_only=False)[order]
            self.wid = w["window_id"].to_numpy(zero_copy_only=False)[order]
            self.max_span = int(np.max(self.end - self.start))

        def __call__(self, b: pa.Table) -> pa.Table:
            out = {"event_id": pa.array([], pa.int64()),
                   "window_id": pa.array([], pa.int64())}
            if b.num_rows == 0 or len(self.start) == 0:
                return pa.table(out)
            t = _ts_us(b["ts"])
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            # candidates: start in (t - max_span, t]  (start ≤ t - max_span
            # ⇒ end = start + dur ≤ start + max_span ≤ t ⇒ cannot contain)
            lo = np.searchsorted(self.start, t - self.max_span, side="right")
            hi = np.searchsorted(self.start, t, side="right")
            counts = hi - lo
            total = int(counts.sum())
            if total == 0:
                return pa.table(out)
            rows = np.repeat(np.arange(len(t)), counts)
            offs = np.cumsum(counts)
            ramp = np.arange(total) - np.repeat(offs - counts, counts)
            cidx = np.repeat(lo, counts) + ramp
            keep = self.end[cidx] > t[rows]
            return pa.table({
                "event_id": pa.array(eid[rows[keep]], pa.int64()),
                "window_id": pa.array(self.wid[cidx[keep]], pa.int64()),
            })

    return ev.map_batches(_RangeProbe, batch_format="pyarrow", concurrency=2)


def _ts_us(col) -> np.ndarray:
    """Arrow timestamp column → int64 MICROseconds (matches DuckDB's
    ``epoch_us``; the comparison domain on both range-join sides)."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return a.to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")


SIM_JOIN_K = 3             # words per shingle
SIM_JOIN_THRESHOLD = 0.5
# Broadcast the dup-shingle (df ≥ 2) hash set below this cardinality;
# above it the unfiltered self-join runs (same answer, no driver state).
SIM_JOIN_MAX_BROADCAST = 4_000_000
SIM_JOIN_MAX_SINGLE_PREFIX = 5_000_000  # prefix rows for 1-task pairing
# single-task pairing guard: TOTAL Σ k·(k−1)/2 candidate pairs across all
# equal-runs (the quantity that actually costs memory/compute — a per-run
# length cap of 20k used to admit one ~2e8-pair run ≈ 15 GB of derived
# int64 arrays in a single task); above it fail over to the join tier
SIM_JOIN_PAIR_BUDGET = 50_000_000
SIM_JOIN_PAIR_CHUNK = 4_000_000  # pairs expanded per chunk (~0.4 GB peak)
# verify tier: max DISTINCT docs named by candidate pairs whose texts
# may ship by ref to lookup actors (bounds the per-worker lookup dict)
SIM_JOIN_MAX_BROADCAST_DOCS = 200_000


def _shingle_rows(b: pa.Table, rename: bool = False) -> pa.Table:
    """(doc_id, sh, sz) rows: per-doc DISTINCT word-3-shingles (same
    ``[a-z0-9_]+`` tokenizer as q_term_doc_freq) hashed to int64; sz
    (the doc's distinct-shingle count) rides on every row so pair
    scoring needs no second sizes join."""
    out_id, out_sh, out_sz = [], [], []
    for doc_id, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
        toks = _TOKEN.findall(txt.lower())
        shs = {" ".join(toks[i:i + SIM_JOIN_K])
               for i in range(len(toks) - SIM_JOIN_K + 1)}
        for s in shs:
            out_id.append(doc_id)
            out_sh.append(int.from_bytes(
                hashlib.md5(s.encode()).digest()[:8], "big", signed=True))
            out_sz.append(len(shs))
    a, h, z = ("b", "sh_r", "sz_b") if rename else ("a", "sh", "sz_a")
    return pa.table({
        a: pa.array(out_id, pa.int64()),
        h: pa.array(out_sh, pa.int64()),
        z: pa.array(out_sz, pa.int64()),
    })


def _sim_score_stage(threshold: float):
    """Integer fixed-point Jaccard (inter·10⁶ // union) + threshold as
    an integer cross-multiplication — exact on both engine and oracle
    sides, no float round-mode to disagree on."""
    thr_num, thr_den = int(threshold * 100), 100

    def _score(b: pa.Table) -> pa.Table:
        inter = b["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        uni = (b["sz_a"].to_numpy(zero_copy_only=False).astype(np.int64)
               + b["sz_b"].to_numpy(zero_copy_only=False) - inter)
        keep = inter * thr_den >= uni * thr_num
        return pa.table({
            "a": b["a"].filter(pa.array(keep)),
            "b": b["b"].filter(pa.array(keep)),
            "jaccard_fp": pa.array(inter[keep] * 1_000_000 // uni[keep],
                                   pa.int64()),
        })

    return _score


def _sim_join_exchange(left, threshold: float):
    """Exchange-only similarity-join plan: full inverted-index self-join
    on shingle hash → a<b pair rows → partial-agg intersection counts.
    No driver state at any cardinality, but a shingle with document
    frequency df contributes df² join rows — the guarded fallback when
    the vocabulary is too large to broadcast for the prefix path."""
    right = left.map_batches(
        lambda b: b.rename_columns(["b", "sh_r", "sz_b"]),
        batch_format="pyarrow",
    )
    j = left.join(right, "inner", num_partitions=JOIN_PARTS,
                  on=("sh",), right_on=("sh_r",))
    pairs = j.map_batches(
        lambda b: b.filter(pc.less(b["a"], b["b"])).select(
            ["a", "b", "sz_a", "sz_b"]),
        batch_format="pyarrow",
    )
    agg = fast_groupby_agg(pairs, ["a", "b"], {
        "inter": (None, "count"),
        "sz_a": ("sz_a", "max"),
        "sz_b": ("sz_b", "max"),
    })
    return agg.map_batches(_sim_score_stage(threshold),
                           batch_format="pyarrow")


class _ExactVerify:
    """Exact per-pair verification from the attached texts: rebuild both
    distinct-shingle STRING sets (same tokenizer as the index pass —
    and no hash involved, so a hash collision can only create a false
    candidate, never a wrong answer) and keep pairs at ≥ threshold with
    integer fixed-point Jaccard. Per-worker set cache: candidate lists
    repeat the same near-dup docs heavily."""

    def __init__(self, threshold: float):
        self.thr_num, self.thr_den = int(threshold * 100), 100
        self.cache: dict = {}

    def _set(self, doc_id, txt: str) -> frozenset:
        s = self.cache.get(doc_id)
        if s is None:
            toks = _TOKEN.findall((txt or "").lower())
            s = frozenset(" ".join(toks[i:i + SIM_JOIN_K])
                          for i in range(len(toks) - SIM_JOIN_K + 1))
            if len(self.cache) > 100_000:
                self.cache.clear()
            self.cache[doc_id] = s
        return s

    def __call__(self, b: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a, bb, ta, tb in zip(b["a"].to_pylist(), b["b"].to_pylist(),
                                 b["__text_a"].to_pylist(),
                                 b["__text_b"].to_pylist()):
            sa, sb = self._set(a, ta), self._set(bb, tb)
            inter = len(sa & sb)
            if inter == 0:
                continue
            uni = len(sa) + len(sb) - inter
            if inter * self.thr_den >= uni * self.thr_num:
                out_a.append(a)
                out_b.append(bb)
                out_j.append(inter * 1_000_000 // uni)
        return pa.table({
            "a": pa.array(out_a, pa.int64()),
            "b": pa.array(out_b, pa.int64()),
            "jaccard_fp": pa.array(out_j, pa.int64()),
        })


def _prefix_rows_table(b: pa.Table, hs: np.ndarray, dfs: np.ndarray,
                       thr_num: int, thr_den: int) -> pa.Table:
    """Prefix selection straight off the materialized shingle index
    (a, sh, sz_a) — the corpus is tokenized/hashed exactly ONCE (in
    _shingle_rows); this pass is pure numpy segment math in a task pool
    (no actor spin-up). Per doc run: order rows by (df, hash) and keep
    the first sz − ⌈θ·sz⌉ + 1. If a doc's rows ever fragment across
    blocks, each fragment keeps its own first p — a SUPERSET of the
    true prefix's rows in that fragment (|P ∩ frag| ≤ p and P-rows sort
    first), so candidates are only added, never missed; exact
    verification absorbs the surplus. ``pos_a`` is the row's rank in
    its doc's global (df, hash) shingle order — the PPJoin positional
    filter's input downstream. Module-level (not nested in
    q_similarity_join) so the property test can drive it directly."""
    aa = b["a"].to_numpy(zero_copy_only=False)
    sh = b["sh"].to_numpy(zero_copy_only=False)
    sz = b["sz_a"].to_numpy(zero_copy_only=False)
    dd = dfs[np.searchsorted(hs, sh)]
    o = np.lexsort((sh, dd, aa))  # doc-major, then (df, hash)
    aa, sh, sz = aa[o], sh[o], sz[o]
    starts = np.flatnonzero(np.r_[True, aa[1:] != aa[:-1]])
    lens = np.diff(np.r_[starts, len(aa)])
    szd = sz[starts]
    t = -(-szd * thr_num // thr_den)  # integer ceil ⌈θ·sz⌉
    p = np.minimum(szd - t + 1, lens)
    rank = np.arange(len(aa)) - np.repeat(starts, lens)
    keep = rank < np.repeat(p, lens)
    return pa.table({"a": pa.array(aa[keep], pa.int64()),
                     "sh": pa.array(sh[keep], pa.int64()),
                     "sz_a": pa.array(sz[keep], pa.int64()),
                     "pos_a": pa.array(rank[keep], pa.int64())})


def _run_pair_chunks(starts: np.ndarray, lens: np.ndarray,
                     runs: np.ndarray, chunk_pairs: int):
    """Yield (iu, ju) GLOBAL index pairs (iu < ju, both inside one
    equal-run) in chunks of ≤ chunk_pairs pairs, fully vectorized
    (repeat + cumsum ramp — no per-pair or per-row Python loop).
    Bounds peak memory at O(chunk) independent of run shape: a single
    2e8-pair run streams through as ~50 chunks instead of one 15 GB
    triu materialization."""
    # per run, row i (0-based, i < k-1) contributes k-1-i pairs
    row_run = np.repeat(runs, np.maximum(lens[runs] - 1, 0))
    row_i = (np.arange(len(row_run))
             - np.repeat(np.cumsum(np.maximum(lens[runs] - 1, 0))
                         - np.maximum(lens[runs] - 1, 0),
                         np.maximum(lens[runs] - 1, 0)))
    row_pairs = lens[row_run] - 1 - row_i
    cum = np.cumsum(row_pairs)
    lo_row = 0
    while lo_row < len(row_run):
        base = cum[lo_row - 1] if lo_row else 0
        hi_row = int(np.searchsorted(cum, base + chunk_pairs, "right"))
        hi_row = max(hi_row, lo_row + 1)  # always advance ≥ 1 row
        rr = row_run[lo_row:hi_row]
        ri = row_i[lo_row:hi_row]
        counts = (lens[rr] - 1 - ri).astype(np.int64)
        iu = np.repeat(starts[rr] + ri, counts)
        offs = np.cumsum(counts)
        ramp = np.arange(int(offs[-1])) - np.repeat(offs - counts, counts)
        ju = iu + 1 + ramp
        yield iu, ju
        lo_row = hi_row


@ray.remote
def _prefix_pairs_task(max_pairs: int, thr_num: int, thr_den: int,
                       *tables: pa.Table) -> pa.Table:
    """Distinct candidate pairs (a < b) from the prefix index in one
    task: sort rows by shingle hash, expand each equal-run's pair
    matrix in bounded chunks with repeat/cumsum-ramp (no Python loop
    over pairs, ≤ SIM_JOIN_PAIR_CHUNK pairs live at once), apply the
    PPJoin LENGTH filter (J ≥ θ requires θ·max(|A|,|B|) ≤ min(|A|,|B|))
    and POSITIONAL filter (a collision at ordered-prefix positions
    (i, j) bounds |A∩B| ≤ 1 + min(|A|−i−1, |B|−j−1), which must reach
    ⌈θ/(1+θ)·(|A|+|B|)⌉; a pair survives if ANY of its collisions
    passes — a superset of PPJoin's accumulate form, so no true pair
    is lost), then a structured np.unique dedups multi-shingle
    survivors. Guarded on TOTAL Σ k·(k−1)/2 across runs (max_pairs),
    the quantity that costs compute — the caller falls back to the
    distributed join tier above it. On a boilerplate corpus the
    filtered-out collisions are the bulk of the naive candidate set."""
    live = live_arrow(tables)
    if not live:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    t = pa.concat_tables(live)
    sh = t["sh"].to_numpy(zero_copy_only=False)
    ids = t["a"].to_numpy(zero_copy_only=False)
    szs = t["sz_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    poss = t["pos_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(sh, kind="stable")
    sh, ids, szs, poss = sh[order], ids[order], szs[order], poss[order]
    n = len(sh)
    starts = np.flatnonzero(np.concatenate([[True], sh[1:] != sh[:-1]]))
    lens = np.diff(np.r_[starts, n])
    runs = np.flatnonzero(lens >= 2)
    if runs.size == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    kk = lens[runs].astype(np.int64)
    total_pairs = int((kk * (kk - 1) // 2).sum())
    if total_pairs > max_pairs:
        # Σ pair-matrix volume would swamp this one task's time budget;
        # the caller falls back to the distributed join tier
        raise ValueError(
            f"degenerate prefix run: {total_pairs} candidate pairs "
            f"across equal-runs (budget {max_pairs})")
    # for a run of length k: k*(k-1)/2 ordered index pairs (i<j),
    # expanded in ≤ SIM_JOIN_PAIR_CHUNK-pair chunks (bounded peak RSS)
    out_a: list = []
    out_b: list = []
    for iu, ju in _run_pair_chunks(starts, lens, runs,
                                   SIM_JOIN_PAIR_CHUNK):
        pa_, pb_ = ids[iu], ids[ju]
        sa_, sb_ = szs[iu], szs[ju]
        smin = np.minimum(sa_, sb_)
        smax = np.maximum(sa_, sb_)
        lo = np.minimum(pa_, pb_)
        hi = np.maximum(pa_, pb_)
        # required intersection (integer ceil) and positional upper bound
        req = -(-(sa_ + sb_) * thr_num // (thr_num + thr_den))
        ub = 1 + np.minimum(sa_ - poss[iu] - 1, sb_ - poss[ju] - 1)
        keep = ((lo != hi) & (smin * thr_den >= smax * thr_num)
                & (ub >= req))
        out_a.append(lo[keep])
        out_b.append(hi[keep])
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    pair = np.empty(len(a), dtype=[("a", np.int64), ("b", np.int64)])
    pair["a"], pair["b"] = a, b
    uniq = np.unique(pair)  # full-width ids — no 32-bit packing assumption
    return pa.table({
        "a": pa.array(uniq["a"], pa.int64()),
        "b": pa.array(uniq["b"], pa.int64()),
    })


class _ExactVerifyLookup(_ExactVerify):
    """Small-pair-tier variant of _ExactVerify: texts arrive as block
    REFS (is_in-filtered to the docs the pairs name, never the corpus),
    built into a lookup dict once per worker; a pair naming a missing
    doc is dropped (mirrors the join path's inner-join semantics)."""

    def __init__(self, threshold: float, tref):
        super().__init__(threshold)
        self.tref = tref
        self.texts = None

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.texts is None:
            self.texts = {}
            for t in ray.get(ray.get(self.tref)):
                self.texts.update(zip(t["doc_id"].to_pylist(),
                                      t["text"].to_pylist()))
        ta = [self.texts.get(x) for x in b["a"].to_pylist()]
        tb = [self.texts.get(x) for x in b["b"].to_pylist()]
        keep = pa.array([x is not None and y is not None
                         for x, y in zip(ta, tb)])
        b2 = pa.table({
            "a": b["a"], "b": b["b"],
            "__text_a": pa.array(ta, pa.string()),
            "__text_b": pa.array(tb, pa.string()),
        }).filter(keep)
        return super().__call__(b2)


def _sim_empty():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "jaccard_fp": pa.array([], pa.int64()),
    }))


def q_similarity_join(sf_dir, threshold: float = SIM_JOIN_THRESHOLD,
                      max_broadcast_vocab: int = SIM_JOIN_MAX_BROADCAST):
    """EXACT set-similarity self-join: all document pairs with word-
    3-shingle Jaccard ≥ threshold — exact (so DuckDB-oracle-checkable
    bit-for-bit), unlike the probabilistic MinHash/SimHash dedup paths.

    Default plan is POSITIONAL PREFIX FILTERING (AllPairs/PPJoin): order
    every doc's shingles by the global (df, hash) order and index only
    its first |x| − ⌈θ·|x|⌉ + 1 — any pair with J ≥ θ provably collides
    within both prefixes (two-sided prefix theorem), so boilerplate
    shingles (the df² blowup of a naive inverted-index join) never
    enter the index. Candidates are then verified EXACTLY from the two
    texts via distributed pair→text joins (dedup_text._pair_texts; no
    corpus-sized driver state). On this boilerplate-heavy corpus the
    naive join materializes 1.1M candidate pairs for 256 real ones;
    prefix filtering cuts end-to-end wall time ~2.5× at sf0.1 even
    though it adds the verify stage.

    The df side broadcasts (vocabulary-guarded, same pattern as
    q_tfidf_top_terms); past `max_broadcast_vocab` the exchange-only
    full-join plan runs instead — same answer (pinned by a path-equality
    test), the scale path there being a df JOIN instead of a broadcast."""
    # join-feeding read: size-based blocks (see T's docstring) — the
    # prefix self-join pays per-(block, partition) shuffle overhead
    docs = T(sf_dir, "documents", ["doc_id", "text"],
             target_block_mb=8, min_blocks=4)
    left = docs.map_batches(_shingle_rows,
                            batch_format="pyarrow").materialize()
    df_ds = fast_groupby_agg(left, ["sh"], {"df": (None, "count")})
    if df_ds.count() > max_broadcast_vocab:
        return _sim_join_exchange(left, threshold)

    df_tbl = pa.concat_tables(ray.get(df_ds.to_arrow_refs()))
    h = df_tbl["sh"].combine_chunks().to_numpy(zero_copy_only=False)
    d = df_tbl["df"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    dfref = ray.put((h[order], d[order].astype(np.int64)))
    thr_num, thr_den = int(threshold * 100), 100

    def _prefix_rows(b: pa.Table) -> pa.Table:
        hs, dfs = ray.get(dfref)  # plasma shared-memory, zero-copy
        return _prefix_rows_table(b, hs, dfs, thr_num, thr_den)

    prefix = left.map_batches(_prefix_rows, batch_format="pyarrow",
                              batch_size=None).materialize()
    if prefix.count() <= SIM_JOIN_MAX_SINGLE_PREFIX:
        # prefix rows are (int64, int64) pairs — at this size ONE task
        # sorting by shingle and expanding equal-runs beats the hash
        # self-join's fixed pipeline cost (~2 s at sf0.1); identical
        # candidates (pinned by test). The join path remains the scale
        # plan above the guard.
        import ray.data as rd

        try:
            cand = rd.from_arrow_refs(
                [_prefix_pairs_task.remote(SIM_JOIN_PAIR_BUDGET,
                                           thr_num, thr_den,
                                           *prefix.to_arrow_refs())]
            ).materialize()
        except Exception as e:  # RayTaskError wraps the task's ValueError
            if "degenerate prefix run" not in str(e):
                raise
            # Σ k² pair volume exceeds the single-task budget; the
            # distributed join tier spreads/spills the same blow-up
            # instead
            cand = None
    else:
        cand = None
    if cand is None:
        pright = prefix.map_batches(
            lambda b: b.rename_columns(["b", "sh_r", "sz_b", "pos_b"]),
            batch_format="pyarrow")
        cj = prefix.join(pright, "inner", num_partitions=JOIN_PARTS,
                         on=("sh",), right_on=("sh_r",))

        def _pair_filter(b: pa.Table) -> pa.Table:
            # same a<b + PPJoin length/positional filters as the
            # single-task tier (any-collision-passes semantics: the
            # groupby below keeps a pair if any collision row survives)
            sa_ = b["sz_a"].to_numpy(zero_copy_only=False)
            sb_ = b["sz_b"].to_numpy(zero_copy_only=False)
            ia = b["pos_a"].to_numpy(zero_copy_only=False)
            jb = b["pos_b"].to_numpy(zero_copy_only=False)
            req = -(-(sa_ + sb_) * thr_num // (thr_num + thr_den))
            ub = 1 + np.minimum(sa_ - ia - 1, sb_ - jb - 1)
            keep = ((np.minimum(sa_, sb_) * thr_den
                     >= np.maximum(sa_, sb_) * thr_num)
                    & (ub >= req)
                    & (b["a"].to_numpy(zero_copy_only=False)
                       < b["b"].to_numpy(zero_copy_only=False)))
            return b.filter(pa.array(keep)).select(["a", "b"])

        cand = fast_groupby_agg(
            cj.map_batches(_pair_filter, batch_format="pyarrow"),
            ["a", "b"], {"_n": (None, "count")},
        ).map_batches(lambda b: b.select(["a", "b"]),
                      batch_format="pyarrow").materialize()
    if cand.count() == 0:
        return _sim_empty()
    from .dedup_text import _id_type, _pair_texts, _semi

    # Verify tier choice is guarded on the DISTINCT DOCS the candidate
    # pairs name (computed distributedly — the pair set itself never
    # collects), not on pair count: PPJoin candidates concentrate on
    # the near-dup docs, so even a large pair set usually names a small
    # doc set. Below the guard the named texts are is_in-filtered from
    # the corpus and ship by REF into lookup actors (pairs stream);
    # above it the exchange path attaches texts with two hash joins.
    it = _id_type(docs, "doc_id")

    def _ends(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            b["a"].to_numpy(zero_copy_only=False),
            b["b"].to_numpy(zero_copy_only=False),
        ]))
        return pa.table({"doc_id": pa.array(u, it)})

    ids_ds = fast_groupby_agg(
        cand.map_batches(_ends, batch_format="pyarrow"),
        ["doc_id"], {"_n": (None, "count")},
    ).map_batches(lambda b: b.select(["doc_id"]),
                  batch_format="pyarrow").materialize()
    if ids_ds.count() <= SIM_JOIN_MAX_BROADCAST_DOCS:
        texts = _semi(docs.select_columns(["doc_id", "text"]),
                      ids_ds, "doc_id", "doc_id",
                      pa.schema([("doc_id", it), ("text", pa.string())])
                      ).materialize()
        tref = ray.put(texts.to_arrow_refs())
        return cand.map_batches(
            _ExactVerifyLookup(threshold, tref),
            batch_format="pyarrow", batch_size=2048)
    return _pair_texts(cand, docs).map_batches(
        _ExactVerify(threshold), batch_format="pyarrow", batch_size=2048)


def q_connected_components(sf_dir, threshold: float = SIM_JOIN_THRESHOLD):
    """Connected components of the EXACT similarity graph (edges =
    q_similarity_join pairs): distributed min-label propagation over the
    edge Dataset (dedup_text._min_label_components — iterate label(n) ←
    min over n ∪ neighbors until fixpoint; the same iterative engine the
    near-dup survivor paths use, here exposed with an exact ORACLE: a
    DuckDB recursive-CTE transitive closure computes the identical
    (doc, min-reachable-id) labeling, so the driver gate proves the
    iterative algorithm, not just its row count)."""
    pairs = q_similarity_join(sf_dir, threshold).materialize()
    if pairs.count() == 0:
        return _sim_empty().map_batches(
            lambda b: pa.table({"doc_id": b["a"], "component": b["b"]}),
            batch_format="pyarrow")
    from .dedup_text import _min_label_components
    comp = _min_label_components(pairs)
    return comp.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "component": b["label"]}),
        batch_format="pyarrow")


def q_grouped_hll(sf_dir, p: int = 12):
    """Approximate DISTINCT users per event_type — the sketch-as-
    grouped-aggregation-state pattern: each batch emits one HLL register
    buffer per (block, group), and the groupby merges buffers by
    elementwise max, so the exchange moves sketch bytes (4 KiB at p=12),
    never raw user ids. Pairs with q_grouped_distinct_count (the exact
    plan) the way q_hll_distinct pairs with q_distinct_count. Registers
    use p=12 here (vs the global sketch's p=14) because the per-group
    buffer rides in every block's partial row. The merge is
    ``map_groups`` over event_type — fine because group cardinality is
    tiny; a high-cardinality grouped sketch would instead band groups
    into shards and merge within each shard. Rows-only: per-group
    relative error < 5 % (3σ at p=12) is asserted in tests."""
    from ..functions.sketches import hll_estimate, hll_partial

    ev = T(sf_dir, "events", ["event_type", "user_id"])

    def _partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        rows_t, rows_r = [], []
        for et, g in df.groupby("event_type", sort=False):
            keys = g["user_id"].to_numpy().astype(np.uint64)
            rows_t.append(et)
            rows_r.append(hll_partial(keys, p).tobytes())
        return pa.table({"event_type": pa.array(rows_t, pa.string()),
                         "regs": pa.array(rows_r, pa.binary())})

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(1 << p, dtype=np.uint8)
        for buf in df["regs"]:
            np.maximum(acc, np.frombuffer(buf, dtype=np.uint8), out=acc)
        return pd.DataFrame({
            "event_type": [df["event_type"].iloc[0]],
            "approx": [float(hll_estimate(acc, p))],
        })

    approx = (ev.map_batches(_partial, batch_format="pyarrow")
                .groupby("event_type").map_groups(_merge,
                                                  batch_format="pandas")
                .to_pandas())
    exact = q_grouped_distinct_count(sf_dir).to_pandas()
    out = approx.merge(exact, on="event_type")
    out["rel_err"] = (out["approx"] - out["n_users"]).abs() / out["n_users"]
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------- heavy hitters (MG)

MG_CAPACITY = 64


def _mg_compress(terms: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries compression: keep the k largest counters minus the
    (k+1)-th value (deterministic tie-break by term). Per-term
    undercount introduced ≤ the subtracted value; summaries merge by
    counter SUM (order-independent) + one final compression — the
    mergeable-summaries construction (Agarwal et al., PODS'12)."""
    if len(terms) <= k:
        return terms, counts
    order = np.lexsort((terms, -counts))
    d = counts[order[k]]
    keep = order[:k]
    est = counts[keep] - d
    pos = est > 0
    return terms[keep][pos], est[pos]


def q_heavy_hitters(sf_dir, k: int = MG_CAPACITY, top: int = 20):
    """Approximate most-frequent terms (heavy hitters) across the
    corpus with a Misra-Gries sketch — the third mergeable-sketch
    family next to HLL (distinct) and the histogram (quantiles), for
    when the exact term-count shuffle is unaffordable. Per-batch exact
    counts are MG-compressed to ≤ k counters, partials merge by plain
    counter sum (a tiny partial-agg groupby over ≤ k·n_blocks rows),
    and ONE final compression yields the sketch — merge-order
    independent, so the result is deterministic. Total undercount
    ≤ N_tokens/(k+1), asserted in tests. Rows-only: estimates are
    sketch values, not exact counts."""
    ds = T(sf_dir, "documents", ["text"])

    def _partial(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        for txt in b["text"].to_pylist():
            toks.extend(_TOKEN.findall(txt.lower()))
        terms, counts = np.unique(np.asarray(toks, dtype=object),
                                  return_counts=True)
        terms, counts = _mg_compress(terms, counts.astype(np.int64), k)
        return pa.table({
            "term": pa.array(terms.tolist(), pa.string()),
            "cnt": pa.array(counts, pa.int64()),
        })

    summed = fast_groupby_agg(
        ds.map_batches(_partial, batch_format="pyarrow"),
        ["term"], {"cnt": ("cnt", "sum")},
    ).to_pandas()  # ≤ k × n_blocks rows — sketch-sized, not corpus-sized
    terms = summed["term"].to_numpy(dtype=object)
    counts = summed["cnt"].to_numpy(dtype=np.int64)
    terms, counts = _mg_compress(terms, counts, k)
    out = pd.DataFrame({"term": terms, "est_count": counts})
    return (out.sort_values(["est_count", "term"],
                            ascending=[False, True], kind="mergesort")
               .head(top).reset_index(drop=True))


# =========================================== profiling / reshape operators

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_grouped_distinct_count(sf_dir):
    """COUNT(DISTINCT user) per event_type — the grouped-distinct shape
    whose naive plan reshuffles every raw row. Two partial-agg stages:
    (1) distinct (type, user) pairs (map-side combine dedupes within
    each batch, so the exchange moves pair cardinality, not row count),
    (2) pair counts per type."""
    ev = T(sf_dir, "events", ["event_type", "user_id"])
    pairs = fast_groupby_agg(ev, ["event_type", "user_id"],
                             {"_n": (None, "count")})
    return fast_groupby_agg(pairs, ["event_type"],
                            {"n_users": (None, "count")})


def q_mode_per_group(sf_dir):
    """Per-user modal event type (argmax-by-count) with a deterministic
    tie-break (higher count, then lexicographically smaller type) —
    grouped counts then the mergeable grouped top-1, no per-group
    Python."""
    from ..stages.fastagg import grouped_topk

    ev = T(sf_dir, "events", ["user_id", "event_type"])
    counts = fast_groupby_agg(ev, ["user_id", "event_type"],
                              {"n": (None, "count")})
    top = grouped_topk(counts, ["user_id"], ["n", "event_type"],
                       [False, True], 1)
    return top.map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "mode_event": b["event_type"],
            "n": b["n"],
        }),
        batch_format="pyarrow",
    )


def q_histogram(sf_dir):
    """Fixed-width value histogram of l_quantity (width 5.0, domain
    [1, 50]) — the data-profiling primitive. Bucket assignment is
    INTEGER fixed-point (round(v·100) // 500) so bin edges are exact on
    both engine and oracle sides; the groupby moves one row per
    (block, bucket)."""
    ds = T(sf_dir, "lineitem", ["l_quantity"])

    def _bucket(b: pa.Table) -> pa.Table:
        v = np.round(b["l_quantity"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        return pa.table({"bucket": pa.array(v // 500, pa.int64())})

    return fast_groupby_agg(
        ds.map_batches(_bucket, batch_format="pyarrow"),
        ["bucket"], {"n": (None, "count")},
    )


def q_grouped_variance(sf_dir):
    """Population variance of l_quantity per return flag from mergeable
    moments (n, Σv, Σv²) — v held in integer fixed-point (×100) so the
    partials are EXACT integers and the only floats are the final
    per-group expression, written identically on both sides
    ((s2 − s²/n)/n scaled back to original units, then the module's
    fixed-point canonicalization)."""
    ds = T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _moments(b: pa.Table) -> pa.Table:
        v = np.round(b["l_quantity"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "v": pa.array(v, pa.int64()),
            "v2": pa.array(v * v, pa.int64()),
        })

    agg = fast_groupby_agg(
        ds.map_batches(_moments, batch_format="pyarrow"),
        ["l_returnflag"],
        {"n": (None, "count"), "s": ("v", "sum"), "s2": ("v2", "sum")},
    )

    def _var(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = b["s2"].to_numpy(zero_copy_only=False).astype(np.float64)
        # same op order as the SQL: (s2 - s*s/n)/n, then ÷10⁴ (v was ×100)
        var = (s2 - s * s / n) / n / 10000.0
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"],
            "var_pop": pa.array(var, pa.float64()),
        })

    return agg.map_batches(_var, batch_format="pyarrow").map_batches(
        _canon_stage({"var_pop": 4}), batch_format="pyarrow")


def _set_op(sf_dir, want_in_b: bool):
    """Shared plan for EXCEPT / INTERSECT (SQL set semantics, i.e.
    DISTINCT rows) over (p_brand, p_type, p_size) keys: side A = parts
    with p_size > 25, side B = parts with p_retailprice > 950. ONE scan
    computes, per block, the distinct keys matching either predicate
    with (in_a, in_b) indicator maxima; ONE partial-agg groupby folds
    them globally; a map-side predicate picks the set op. The exchange
    moves one row per distinct key per block — never the raw table —
    and there is no join and no driver-side key set."""
    part = T(sf_dir, "part",
             ["p_brand", "p_type", "p_size", "p_retailprice"])
    keys = ["p_brand", "p_type", "p_size"]

    def _sides(df: pd.DataFrame) -> pa.Table:
        df = df.assign(
            in_a=(df["p_size"] > 25).astype("int64"),
            in_b=(df["p_retailprice"] > 950).astype("int64"))
        d = (df[df["in_a"] + df["in_b"] > 0]
             .groupby(keys, sort=False, as_index=False)[["in_a", "in_b"]]
             .max())
        return pa.table({
            "p_brand": pa.array(d["p_brand"], pa.string()),
            "p_type": pa.array(d["p_type"], pa.string()),
            "p_size": pa.array(d["p_size"].to_numpy(), pa.int64()),
            "in_a": pa.array(d["in_a"].to_numpy(), pa.int64()),
            "in_b": pa.array(d["in_b"].to_numpy(), pa.int64()),
        })

    agg = fast_groupby_agg(
        part.map_batches(_sides, batch_format="pandas"), keys, {
            "in_a": ("in_a", "max"), "in_b": ("in_b", "max"),
        })

    def _pick(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["in_a"], 1),
                       pc.equal(t["in_b"], 1 if want_in_b else 0))
        return t.filter(keep).select(["p_brand", "p_type", "p_size"])

    out = agg.map_batches(_pick, batch_format="pyarrow").materialize()
    if out.count() == 0:
        # an all-empty Dataset drops its schema; the INTERSECT can be
        # legitimately empty at tiny sf — hand back a TYPED empty frame
        return pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                             "p_type": pd.Series(dtype="object"),
                             "p_size": pd.Series(dtype="int64")})
    return out


def q_set_except(sf_dir):
    """SQL EXCEPT (set difference, distinct semantics): rows of side A
    not present in side B. See _set_op for the exchange plan."""
    return _set_op(sf_dir, want_in_b=False)


def q_set_intersect(sf_dir):
    """SQL INTERSECT (distinct semantics): rows present in both sides.
    See _set_op for the exchange plan."""
    return _set_op(sf_dir, want_in_b=True)


def q_grouped_corr(sf_dir):
    """Pearson correlation of l_quantity vs l_extendedprice (rounded to
    whole units) per return flag, from mergeable EXACT integer moments
    (n, Σx, Σy, Σx², Σy², Σxy) — the only floats are one final
    per-group expression written operation-for-operation identically in
    the SQL oracle, then integer fixed-point (×10⁶, half-away) on both
    sides. Values are held at unit scale (not ×100) so Σy² stays under
    int64 through ~sf100 (~1.2e10 per row × 6e7 rows/group); the
    partials are a constant 6 ints per group — the exchange never moves
    rows."""
    ds = T(sf_dir, "lineitem",
           ["l_returnflag", "l_quantity", "l_extendedprice"])

    def _moments(b: pa.Table) -> pa.Table:
        x = _round_half_away(
            b["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        y = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
            "xx": pa.array(x * x, pa.int64()),
            "yy": pa.array(y * y, pa.int64()),
            "xy": pa.array(x * y, pa.int64()),
        })

    agg = fast_groupby_agg(
        ds.map_batches(_moments, batch_format="pyarrow"),
        ["l_returnflag"],
        {"n": (None, "count"), "sx": ("x", "sum"), "sy": ("y", "sum"),
         "sxx": ("xx", "sum"), "syy": ("yy", "sum"), "sxy": ("xy", "sum")},
    )

    def _corr(b: pa.Table) -> pa.Table:
        f = {c: b[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        # same op order as the SQL: (n*1.0)*sxy - (sx*1.0)*sy, etc.
        num = f["n"] * f["sxy"] - f["sx"] * f["sy"]
        den = (np.sqrt(f["n"] * f["sxx"] - f["sx"] * f["sx"])
               * np.sqrt(f["n"] * f["syy"] - f["sy"] * f["sy"]))
        corr_fp = _round_half_away(num / den * 1_000_000.0).astype(np.int64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"],
            "corr_fp": pa.array(corr_fp, pa.int64()),
        })

    return agg.map_batches(_corr, batch_format="pyarrow")


def q_bigram_stats(sf_dir, min_count: int = 5,
                   max_broadcast_vocab: int = TFIDF_MAX_BROADCAST_VOCAB):
    """Corpus bigram statistics — counts and integer fixed-point
    conditional probabilities P(w2|w1) for bigrams seen ≥ min_count
    times — the n-gram language-model table every classic LM-data
    pipeline materializes. Per-batch bigram counters (map-side combine)
    → partial-agg sum per (w1, w2); head totals are a second partial-agg
    over the ALREADY-AGGREGATED bigram table (vocabulary-sized, never
    corpus-sized). The head-total side is vocabulary-guarded like
    q_tfidf_top_terms: broadcast dict below the threshold, hash join
    above it — both produce identical rows."""
    docs = T(sf_dir, "documents", ["text"])

    def _bi(b: pa.Table) -> pa.Table:
        cnt: dict = {}
        for txt in b["text"].to_pylist():
            toks = _TOKEN.findall(txt.lower())
            for i in range(len(toks) - 1):
                k = (toks[i], toks[i + 1])
                cnt[k] = cnt.get(k, 0) + 1
        return pa.table({
            "w1": pa.array([k[0] for k in cnt], pa.string()),
            "w2": pa.array([k[1] for k in cnt], pa.string()),
            "c": pa.array(list(cnt.values()), pa.int64()),
        })

    bi = fast_groupby_agg(
        docs.map_batches(_bi, batch_format="pyarrow"),
        ["w1", "w2"], {"c": ("c", "sum")},
    ).materialize()
    heads = fast_groupby_agg(bi, ["w1"], {"hc": ("c", "sum")})

    if heads.count() <= max_broadcast_vocab:
        hdf = heads.to_pandas()
        href = ray.put(dict(zip(hdf["w1"], hdf["hc"].astype(np.int64))))

        class _Prob:
            def __init__(self):
                self.hc = ray.get(href)

            def __call__(self, b: pa.Table) -> pa.Table:
                keep = pc.greater_equal(b["c"], min_count)
                b = b.filter(keep)
                c = b["c"].to_numpy(zero_copy_only=False)
                hc = pd.Series(b["w1"].to_pylist()).map(self.hc).to_numpy(
                    dtype=np.int64)
                return pa.table({
                    "w1": b["w1"], "w2": b["w2"], "c": b["c"],
                    "prob_fp": pa.array(c * 1_000_000 // hc, pa.int64()),
                })

        return bi.map_batches(_Prob, batch_format="pyarrow", concurrency=2)

    j = bi.map_batches(
        lambda b: b.filter(pc.greater_equal(b["c"], min_count)),
        batch_format="pyarrow",
    ).join(heads, "inner", num_partitions=JOIN_PARTS, on=("w1",))
    return j.map_batches(
        lambda b: pa.table({
            "w1": b["w1"], "w2": b["w2"], "c": b["c"],
            "prob_fp": pa.array(
                b["c"].to_numpy(zero_copy_only=False) * 1_000_000
                // b["hc"].to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64()),
        }),
        batch_format="pyarrow",
    )


def q_group_outliers(sf_dir):
    """Per-group 3σ outlier counts over events.value — the anomaly-
    detection composition: one pass of exact integer moments (n, Σv,
    Σv² on ×100 fixed-point values, same partials as
    q_grouped_variance), the tiny 5-row moment table broadcast, then a
    map-side squared-z-score predicate — no second shuffle of the raw
    rows. The predicate compares (v − s/n)² > 9·var with the SAME
    float64 op sequence the oracle SQL spells out, so the row set is
    bitwise-identical on both sides (no sqrt, no round-mode)."""
    ev = T(sf_dir, "events", ["event_type", "value"])

    def _fp(b: pa.Table) -> pa.Table:
        v = np.round(b["value"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        return pa.table({
            "event_type": b["event_type"],
            "v": pa.array(v, pa.int64()),
            "v2": pa.array(v * v, pa.int64()),
        })

    fp = ev.map_batches(_fp, batch_format="pyarrow")
    mom = fast_groupby_agg(fp, ["event_type"], {
        "n": (None, "count"), "s": ("v", "sum"), "s2": ("v2", "sum"),
    }).to_pandas()  # one row per event type — broadcast side
    mref = ray.put({
        r["event_type"]: (float(r["n"]), float(r["s"]), float(r["s2"]))
        for _, r in mom.iterrows()
    })

    class _Flag:
        def __init__(self):
            self.m = ray.get(mref)

        def __call__(self, b: pa.Table) -> pa.Table:
            et = pd.Series(b["event_type"].to_pylist())
            v = np.round(b["value"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64).astype(np.float64)
            n = et.map(lambda t: self.m[t][0]).to_numpy()
            s = et.map(lambda t: self.m[t][1]).to_numpy()
            s2 = et.map(lambda t: self.m[t][2]).to_numpy()
            dev = v - s / n
            keep = dev * dev > 9.0 * ((s2 - (s * s) / n) / n)
            return pa.table({
                "event_type": b["event_type"].filter(pa.array(keep))})

    flagged = ev.map_batches(_Flag, batch_format="pyarrow", concurrency=2)
    return fast_groupby_agg(flagged, ["event_type"],
                            {"n_outliers": (None, "count")})


def q_pivot_wide(sf_dir):
    """Long→wide pivot: per-user event counts spread into one column per
    event type (the reshape every feature-table build needs). Map-side
    0/1 indicator columns + partial-agg sums — the exchange moves one
    row per (block, user), and no stage ever needs a whole group in one
    place."""
    ev = T(sf_dir, "events", ["user_id", "event_type"])

    def _ind(b: pa.Table) -> pa.Table:
        cols = {"user_id": b["user_id"]}
        for t in EVENT_TYPES:
            cols[f"n_{t}"] = pc.cast(pc.equal(b["event_type"], t),
                                     pa.int64())
        return pa.table(cols)

    return fast_groupby_agg(
        ev.map_batches(_ind, batch_format="pyarrow"),
        ["user_id"],
        {f"n_{t}": (f"n_{t}", "sum") for t in EVENT_TYPES},
    )


# ============================================================ registry


def q_grouped_regression(sf_dir):
    """Per-group ordinary-least-squares fit (regr_slope / regr_intercept
    semantics): l_extendedprice (whole units) on l_quantity per return
    flag — the grouped-regression primitive feature pipelines use for
    trend features. Mergeable EXACT integer moments (n, Σx, Σy, Σx²,
    Σxy); the final slope/intercept are one float expression written
    operation-for-operation identically in SQL (+,−,×,÷ are IEEE
    correctly-rounded, so identical trees on identical integer inputs
    are bit-identical — only libm functions can diverge), then ×10⁶
    half-away fixed point. The exchange moves 5 ints per group."""
    ds = T(sf_dir, "lineitem",
           ["l_returnflag", "l_quantity", "l_extendedprice"])

    def _moments(b: pa.Table) -> pa.Table:
        x = _round_half_away(
            b["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        y = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
            "xx": pa.array(x * x, pa.int64()),
            "xy": pa.array(x * y, pa.int64()),
        })

    agg = fast_groupby_agg(
        ds.map_batches(_moments, batch_format="pyarrow"),
        ["l_returnflag"],
        {"n": (None, "count"), "sx": ("x", "sum"), "sy": ("y", "sum"),
         "sxx": ("xx", "sum"), "sxy": ("xy", "sum")},
    )

    def _fit(b: pa.Table) -> pa.Table:
        f = {c: b[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in ("n", "sx", "sy", "sxx", "sxy")}
        # same op order as the SQL oracle, term for term
        slope = ((f["n"] * f["sxy"] - f["sx"] * f["sy"])
                 / (f["n"] * f["sxx"] - f["sx"] * f["sx"]))
        intercept = (f["sy"] - slope * f["sx"]) / f["n"]
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"],
            "slope_fp": pa.array(_round_half_away(
                slope * 1_000_000.0).astype(np.int64), pa.int64()),
            "intercept_fp": pa.array(_round_half_away(
                intercept * 1_000_000.0).astype(np.int64), pa.int64()),
        })

    return agg.map_batches(_fit, batch_format="pyarrow")


def q_weighted_avg(sf_dir):
    """Revenue-weighted mean discount per return flag — the weighted
    aggregate primitive (mixture weights, weighted quality scores).
    ALL-integer: Σ(price_fp·disc_fp) and Σ(price_fp) are mergeable int64
    partials; the final ×10⁴ // division runs in PYTHON ints on the
    group-count-sized table (HUGEINT-equivalent — numpy int64 would
    overflow the ×10⁴ rescale at large sf, the oracle's HUGEINT does
    not), so engine and oracle agree exactly at every scale."""
    ds = T(sf_dir, "lineitem",
           ["l_returnflag", "l_extendedprice", "l_discount"])

    def _fp(b: pa.Table) -> pa.Table:
        p = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d = _round_half_away(
            b["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "p": pa.array(p, pa.int64()),
            "pd": pa.array(p * d, pa.int64()),
        })

    agg = fast_groupby_agg(
        ds.map_batches(_fp, batch_format="pyarrow"),
        ["l_returnflag"],
        {"n": (None, "count"), "sp": ("p", "sum"), "spd": ("pd", "sum")},
    )

    def _div(b: pa.Table) -> pa.Table:
        spd = [int(v) for v in b["spd"].to_pylist()]
        sp = [int(v) for v in b["sp"].to_pylist()]
        w = [x * 10_000 // y for x, y in zip(spd, sp)]
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"],
            "wavg_disc_fp": pa.array(w, pa.int64()),
        })

    return agg.map_batches(_div, batch_format="pyarrow")


def q_unpivot_long(sf_dir):
    """UNPIVOT / melt — wide part columns (p_size, p_retailprice) to
    long (key, attr, val_fp) rows, the inverse of q_pivot_wide and the
    schema-normalization primitive feature stores need. A pure map:
    each batch emits its k× long block map-side — no shuffle, perfectly
    scale-oblivious. Values ride as ×100 int64 fixed point so one
    column carries both attributes exactly."""
    ds = T(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def _melt(b: pa.Table) -> pa.Table:
        k = b["p_partkey"].to_numpy(zero_copy_only=False)
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = _round_half_away(
            b["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        n = len(k)
        return pa.table({
            "p_partkey": pa.array(np.concatenate([k, k]), pa.int64()),
            "attr": pa.array(["p_size"] * n + ["p_retailprice"] * n,
                             pa.string()),
            "val_fp": pa.array(np.concatenate([size * 100, price]),
                               pa.int64()),
        })

    return ds.map_batches(_melt, batch_format="pyarrow")


def q_grouped_skew(sf_dir):
    """Population skewness of l_quantity per return flag — the
    third-moment distribution-shape signal (corpus length/quality skew
    checks). Mergeable EXACT integer moments (n, Σx, Σx², Σx³); the
    final expression uses only IEEE correctly-rounded ops (+,−,×,÷,
    sqrt — sqrt IS correctly rounded, unlike pow/ln) written
    operation-for-operation identically in the SQL oracle, so the
    ×10⁶ fixed-point result is bit-identical. x is whole units so Σx³
    stays far under 2⁵³ through sf100."""
    ds = T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _moments(b: pa.Table) -> pa.Table:
        x = _round_half_away(
            b["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "x": pa.array(x, pa.int64()),
            "xx": pa.array(x * x, pa.int64()),
            "xxx": pa.array(x * x * x, pa.int64()),
        })

    agg = fast_groupby_agg(
        ds.map_batches(_moments, batch_format="pyarrow"),
        ["l_returnflag"],
        {"n": (None, "count"), "sx": ("x", "sum"),
         "sxx": ("xx", "sum"), "sxxx": ("xxx", "sum")},
    )

    def _skew(b: pa.Table) -> pa.Table:
        f = {c: b[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in ("n", "sx", "sxx", "sxxx")}
        # identical op tree to the SQL oracle (explicit parens)
        m2 = (f["n"] * f["sxx"] - f["sx"] * f["sx"]) / (f["n"] * f["n"])
        m3 = (((f["n"] * f["n"]) * f["sxxx"]
               - (3.0 * f["n"]) * (f["sx"] * f["sxx"]))
              + (2.0 * f["sx"]) * (f["sx"] * f["sx"])) \
            / ((f["n"] * f["n"]) * f["n"])
        skew = m3 / (m2 * np.sqrt(m2))
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"],
            "skew_fp": pa.array(_round_half_away(
                skew * 1_000_000.0).astype(np.int64), pa.int64()),
        })

    return agg.map_batches(_skew, batch_format="pyarrow")


LM_MAX_BROADCAST_BIGRAMS = 4_000_000


def _ln_fp9(v: int) -> int:
    """``CAST(round(ln(v) * 1e9) AS BIGINT)`` for a positive int, via
    libm (math.log — same code path as DuckDB's ln) and half-away
    rounding (trunc/frac arithmetic, exact in IEEE — matches the array
    kernel _round_half_away)."""
    x = math.log(v) * 1e9
    t = math.trunc(x)
    return int(t + 1) if x - t >= 0.5 else int(t)


def q_bigram_lm_score(sf_dir,
                      max_broadcast: int = LM_MAX_BROADCAST_BIGRAMS):
    """Per-document add-one-smoothed bigram log-likelihood under the
    corpus's own bigram model — the n-gram LM quality signal classic
    data pipelines (CCNet-style) gate on before training. Each doc's
    score is Σ ln((c(w1,w2)+1)/(hc(w1)+V)) over its adjacent token
    pairs, emitted as an EXACT ×10⁹ int64 fixed-point sum: every term
    quantizes ln(c+1) and ln(hc+V) separately through libm (math.log —
    same code path as DuckDB's ln, so bit-identical on a host; see
    q_grouped_entropy) BEFORE the distributed sum, making the result
    summation-order independent.

    Plan: bigram counts + head totals via map-side counters → one
    vocabulary-sized partial-agg each; V from a distinct-token count.
    Below ``max_broadcast`` bigram types the model ships as plasma
    dicts and scoring is a PURE MAP (zero exchange); above it the doc
    bigram rows hash-join the model tables (two joins + one per-doc
    groupby) — the corpus never concentrates anywhere. Tiers pinned
    identical by test."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _bi_counts(b: pa.Table) -> pa.Table:
        cnt: dict = {}
        for txt in b["text"].to_pylist():
            toks = _TOKEN.findall(txt.lower())
            for i in range(len(toks) - 1):
                k = (toks[i], toks[i + 1])
                cnt[k] = cnt.get(k, 0) + 1
        return pa.table({
            "w1": pa.array([k[0] for k in cnt], pa.string()),
            "w2": pa.array([k[1] for k in cnt], pa.string()),
            "c": pa.array(list(cnt.values()), pa.int64()),
        })

    def _uni(b: pa.Table) -> pa.Table:
        toks = set()
        for txt in b["text"].to_pylist():
            toks.update(_TOKEN.findall(txt.lower()))
        return pa.table({"tok": pa.array(sorted(toks), pa.string())})

    bi = fast_groupby_agg(
        docs.map_batches(_bi_counts, batch_format="pyarrow"),
        ["w1", "w2"], {"c": ("c", "sum")},
    ).materialize()
    heads = fast_groupby_agg(bi, ["w1"], {"hc": ("c", "sum")})
    vocab = fast_groupby_agg(
        docs.map_batches(_uni, batch_format="pyarrow"),
        ["tok"], {"_n": (None, "count")},
    )
    n_vocab = vocab.count()

    def _score_rows(doc_ids, texts, cdict, hdict, lncache):
        out_id, out_n, out_s = [], [], []
        for did, txt in zip(doc_ids, texts):
            toks = _TOKEN.findall(txt.lower())
            if len(toks) < 2:
                continue
            s = 0
            for i in range(len(toks) - 1):
                num = cdict[(toks[i], toks[i + 1])] + 1
                den = hdict[toks[i]] + n_vocab
                for v in (num, den):
                    if v not in lncache:
                        lncache[v] = _ln_fp9(v)
                s += lncache[num] - lncache[den]
            out_id.append(did)
            out_n.append(len(toks) - 1)
            out_s.append(s)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_bigrams": pa.array(out_n, pa.int64()),
            "ll_fp": pa.array(out_s, pa.int64()),
        })

    if bi.count() <= max_broadcast:
        bref = ray.put((bi.to_arrow_refs(), heads.to_arrow_refs()))

        class _Score:
            def __init__(self):
                brefs, hrefs = ray.get(bref)
                self.c, self.h = {}, {}
                for t in ray.get(brefs):
                    self.c.update(zip(zip(t["w1"].to_pylist(),
                                          t["w2"].to_pylist()),
                                      t["c"].to_pylist()))
                for t in ray.get(hrefs):
                    self.h.update(zip(t["w1"].to_pylist(),
                                      t["hc"].to_pylist()))
                self.ln: dict = {}

            def __call__(self, b: pa.Table) -> pa.Table:
                return _score_rows(b["doc_id"].to_pylist(),
                                   b["text"].to_pylist(),
                                   self.c, self.h, self.ln)

        return docs.map_batches(_Score, batch_format="pyarrow",
                                concurrency=(1, 4))

    # exchange tier: doc bigram rows join the model tables
    def _bg_rows(b: pa.Table) -> pa.Table:
        out_id, out_w1, out_w2 = [], [], []
        for did, txt in zip(b["doc_id"].to_pylist(),
                            b["text"].to_pylist()):
            toks = _TOKEN.findall(txt.lower())
            for i in range(len(toks) - 1):
                out_id.append(did)
                out_w1.append(toks[i])
                out_w2.append(toks[i + 1])
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "w1": pa.array(out_w1, pa.string()),
            "w2": pa.array(out_w2, pa.string()),
        })

    bg = docs.map_batches(_bg_rows, batch_format="pyarrow")
    j1 = bg.join(
        bi.map_batches(lambda t: t.rename_columns(["b1", "b2", "c"]),
                       batch_format="pyarrow"),
        "inner", num_partitions=16,
        on=("w1", "w2"), right_on=("b1", "b2"))
    j2 = j1.join(
        heads.map_batches(lambda t: t.rename_columns(["h1", "hc"]),
                          batch_format="pyarrow"),
        "inner", num_partitions=16, on=("w1",), right_on=("h1",))

    class _Term:
        def __init__(self):
            self.ln: dict = {}

        def __call__(self, b: pa.Table) -> pa.Table:
            c = b["c"].to_numpy(zero_copy_only=False)
            h = b["hc"].to_numpy(zero_copy_only=False)
            term = np.empty(len(c), np.int64)
            for i in range(len(c)):
                num, den = int(c[i]) + 1, int(h[i]) + n_vocab
                for v in (num, den):
                    if v not in self.ln:
                        self.ln[v] = _ln_fp9(v)
                term[i] = self.ln[num] - self.ln[den]
            return pa.table({
                "doc_id": b["doc_id"],
                "one": pa.array(np.ones(len(c), np.int64), pa.int64()),
                "term_fp": pa.array(term, pa.int64()),
            })

    terms = j2.map_batches(_Term, batch_format="pyarrow",
                           concurrency=(1, 4))
    return fast_groupby_agg(
        terms, ["doc_id"],
        {"n_bigrams": ("one", "sum"), "ll_fp": ("term_fp", "sum")},
    )


QNORM_MAX_BROADCAST_VALUES = 4_000_000


def q_quantile_norm(sf_dir, max_broadcast: int = QNORM_MAX_BROADCAST_VALUES):
    """GLOBAL quantile normalization — map every order's price to its
    corpus-wide percent_rank (rank−1)·10⁶ // (n−1), the rank→uniform
    transform feature pipelines use to decouple a feature from its
    marginal distribution. Unlike q_rank_functions (per-user windows,
    bounded groups) this is a TOTAL ordering over the whole table — the
    one window shape that cannot ride on map_groups.

    Plan: no global sort of the rows. The min-rank of a VALUE is
    1 + (count of strictly smaller values), so one partial-agg groupby
    builds the distinct-value histogram, its cumulative counts (sorted
    once — distinct-value-sized, not row-sized) give rank(v), and a
    map-side searchsorted stamps every row. Distinct values broadcast
    below the guard; above it rows hash-join the rank table instead.
    Ties get the min rank — exactly SQL rank(), so percent_rank matches
    the oracle bit for bit (all-integer arithmetic)."""
    orders = T(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "p": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    fp = orders.map_batches(_fp, batch_format="pyarrow").materialize()
    hist = fast_groupby_agg(fp, ["p"], {"c": (None, "count")}).materialize()
    n_total = int(fp.count())

    if hist.count() <= max_broadcast:
        href = ray.put(hist.to_arrow_refs())

        class _Rank:
            def __init__(self):
                t = pa.concat_tables(
                    [x for x in ray.get(ray.get(href)) if x.num_rows])
                v = t["p"].to_numpy(zero_copy_only=False)
                c = t["c"].to_numpy(zero_copy_only=False)
                order = np.argsort(v)
                self.v = v[order]
                cc = np.cumsum(c[order])
                # min-rank of value i = 1 + rows strictly smaller
                self.rank = np.r_[0, cc[:-1]] + 1

            def __call__(self, b: pa.Table) -> pa.Table:
                p = b["p"].to_numpy(zero_copy_only=False)
                r = self.rank[np.searchsorted(self.v, p)]
                q = (r - 1) * 1_000_000 // (n_total - 1)
                return pa.table({
                    "o_orderkey": b["o_orderkey"],
                    "q_fp": pa.array(q, pa.int64()),
                })

        return fp.map_batches(_Rank, batch_format="pyarrow",
                              concurrency=(1, 4))

    # exchange tier: rank table derived once (distinct-value-sized sort
    # in one task), rows hash-join it on the value
    @ray.remote
    def _rank_table(*tables: pa.Table) -> pa.Table:
        t = pa.concat_tables([x for x in tables if x.num_rows])
        v = t["p"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        cc = np.cumsum(c[order])
        return pa.table({
            "pv": pa.array(v[order], pa.int64()),
            "rank": pa.array(np.r_[0, cc[:-1]] + 1, pa.int64()),
        })

    import ray.data as rd

    ranks = rd.from_arrow_refs([_rank_table.remote(*hist.to_arrow_refs())])
    j = fp.join(ranks, "inner", num_partitions=16,
                on=("p",), right_on=("pv",))

    def _q(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "q_fp": pa.array((r - 1) * 1_000_000 // (n_total - 1),
                             pa.int64()),
        })

    return j.map_batches(_q, batch_format="pyarrow")


def q_grouped_geomean(sf_dir):
    """Per-group geometric-mean invariant: n and Σ round(ln(p_fp)·10⁹)
    over ×100 fixed-point prices per order priority — the log-domain
    mean pipelines use for strictly-positive, skewed features. Each ln
    term quantizes to int64 BEFORE the distributed sum (order
    independent, same policy as q_grouped_entropy / q_bigram_lm_score)
    through libm math.log — bit-identical to DuckDB's ln on a host."""
    ds = T(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def _lnp(b: pa.Table) -> pa.Table:
        p = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        uniq, inv = np.unique(p, return_inverse=True)
        lnu = np.empty(len(uniq), np.int64)
        for i, u in enumerate(uniq):
            lnu[i] = _ln_fp9(int(u))
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "lnp": pa.array(lnu[inv], pa.int64()),
        })

    return fast_groupby_agg(
        ds.map_batches(_lnp, batch_format="pyarrow"),
        ["o_orderpriority"], {"n": (None, "count"),
                              "ln_sum_fp": ("lnp", "sum")},
    )


BM25_QUERY = ("hash", "join", "vector")
BM25_K1, BM25_B = 1.2, 0.75


def _bm25_scored(sf_dir):
    """BM25 scoring of every document for a fixed keyword query —
    the lexical-retrieval primitive next to the tf-idf and ANN entries.
    Okapi BM25 (k1=1.2, b=0.75): Σ_t idf(t)·tf·(k1+1)/(tf + k1·(1−b +
    b·dl/avgdl)), idf = ln((N−df+0.5)/(df+0.5)).

    One tokenization pass materializes the per-doc feature row
    (doc_id, tf_t…, dl) — vocabulary-free, one row per doc; corpus
    stats (N, Σdl, df_t) are ONE tiny global aggregate over it; scoring
    is a pure map with the stats in the closure (a handful of ints),
    then a distributed sort + limit(k). The float score expression is
    mirrored operation-for-operation in SQL (fixed 3-term sum in fixed
    order; ln through libm), emitted ×10⁶ fixed point with a doc_id
    tie-break, so top-k is deterministic and bit-exact."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _feat(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        tfs = [[] for _ in BM25_QUERY]
        dls = []
        for txt in b["text"].to_pylist():
            toks = _TOKEN.findall(txt.lower())
            dls.append(len(toks))
            for qi, qt in enumerate(BM25_QUERY):
                tfs[qi].append(sum(1 for t in toks if t == qt))
        cols = {"doc_id": pa.array(ids, pa.int64()),
                "dl": pa.array(dls, pa.int64())}
        for qi in range(len(BM25_QUERY)):
            cols[f"tf{qi}"] = pa.array(tfs[qi], pa.int64())
        return pa.table(cols)

    feat = docs.map_batches(_feat, batch_format="pyarrow").materialize()

    def _stats(b: pa.Table) -> pa.Table:
        out = {"n": pa.array([b.num_rows], pa.int64()),
               "total": pa.array(
                   [int(b["dl"].to_numpy(zero_copy_only=False).sum())],
                   pa.int64())}
        for qi in range(len(BM25_QUERY)):
            tf = b[f"tf{qi}"].to_numpy(zero_copy_only=False)
            out[f"df{qi}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(out)

    parts = feat.map_batches(_stats, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n"].sum())
    total = int(parts["total"].sum())
    dfs = [int(parts[f"df{qi}"].sum()) for qi in range(len(BM25_QUERY))]

    def _score(b: pa.Table) -> pa.Table:
        dl = b["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        avgdl = (total * 1.0) / n_docs
        score = np.zeros(len(dl), np.float64)
        # fixed term order — the SQL sums the same three terms in the
        # same order (float addition is order-sensitive)
        for qi in range(len(BM25_QUERY)):
            tf = b[f"tf{qi}"].to_numpy(
                zero_copy_only=False).astype(np.float64)
            idf = math.log(((n_docs - dfs[qi]) + 0.5) / (dfs[qi] + 0.5))
            # 2.2 as a LITERAL, not k1+1.0: the float sum 1.2+1.0 lands
            # a rounding tie away from the double the SQL literal 2.2
            # parses to — literals on both sides are identical by
            # construction
            score = score + idf * ((tf * 2.2)
                                   / (tf + BM25_K1 * ((1.0 - BM25_B)
                                      + BM25_B * (dl / avgdl))))
        return pa.table({
            "doc_id": b["doc_id"],
            "score_fp": pa.array(_round_half_away(
                score * 1_000_000.0).astype(np.int64), pa.int64()),
        })

    return feat.map_batches(_score, batch_format="pyarrow")


def q_bm25_topk(sf_dir, k: int = 10):
    """Top-k BM25 retrieval — see _bm25_scored for the plan; this is
    the scored dataset through one distributed sort + limit with a
    doc_id tie-break (deterministic cutoff)."""
    return _bm25_scored(sf_dir).sort(
        ["score_fp", "doc_id"], descending=[True, False]).limit(k)


RRF_K = 60       # the standard RRF dampening constant
RRF_LIST = 20    # per-ranker candidate list length


def q_rrf_fusion(sf_dir, k: int = 10):
    """Reciprocal-rank fusion of two retrieval modalities — BM25
    (lexical, _bm25_scored) and embedding cosine against the vec_id=0
    query vector (dense) — the hybrid-retrieval primitive RAG data
    pipelines rank with. Each ranker contributes 10⁶ // (60 + rank)
    for its top-RRF_LIST docs (integer — the fusion itself has no float
    at all); fused top-k breaks ties by doc_id.

    The cosine ranking is exact and order-independent: per-dimension
    products quantize to ×10¹² int64 BEFORE summation (float Σ over an
    unnest has no defined order in SQL), and the final similarity is a
    mirrored float expression over those integer sums (÷, ×, sqrt —
    all IEEE correctly-rounded). Both ranker sorts are distributed
    sort+limit; only the two RRF_LIST-row lists ever reach the driver
    (bounded by the constant, not the corpus)."""
    top_a = (_bm25_scored(sf_dir)
             .sort(["score_fp", "doc_id"], descending=[True, False])
             .limit(RRF_LIST).to_pandas())

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])
    q0 = emb.map_batches(
        lambda b: b.filter(pc.equal(b["vec_id"], 0)),
        batch_format="pyarrow").take_all()
    qv = np.asarray(q0[0]["embedding"], np.float64)
    nb = int(_round_half_away((qv * qv) * 1e12).astype(np.int64).sum())
    qref = ray.put(qv)

    def _sim(b: pa.Table) -> pa.Table:
        q = ray.get(qref)
        col = b["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(-1, len(q))
        dot = _round_half_away((m * q) * 1e12).astype(np.int64).sum(axis=1)
        na = _round_half_away((m * m) * 1e12).astype(np.int64).sum(axis=1)
        sim = ((dot * 1.0) / (np.sqrt(na * 1.0) * np.sqrt(nb * 1.0))
               * 1_000_000.0)
        return pa.table({
            "vec_id": b["vec_id"],
            "sim_fp": pa.array(_round_half_away(sim).astype(np.int64),
                               pa.int64()),
        })

    top_b = (emb.map_batches(_sim, batch_format="pyarrow")
             .sort(["sim_fp", "vec_id"], descending=[True, False])
             .limit(RRF_LIST).to_pandas())

    fused: dict[int, int] = {}
    for r, did in enumerate(top_a["doc_id"], start=1):
        fused[int(did)] = fused.get(int(did), 0) + 1_000_000 // (RRF_K + r)
    for r, vid in enumerate(top_b["vec_id"], start=1):
        fused[int(vid)] = fused.get(int(vid), 0) + 1_000_000 // (RRF_K + r)
    rows = sorted(fused.items(), key=lambda x: (-x[1], x[0]))[:k]
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "rrf_fp": pa.array([s for _, s in rows], pa.int64()),
    }))


INTERVAL_COVER_S = 300  # each event covers [ts, ts+300s)


def q_interval_coverage(sf_dir):
    """Gaps-and-islands interval merging — per user, merge overlapping
    [ts, ts+300s) event windows into maximal islands and report island
    count + total covered seconds (the classic SQL pattern behind
    session stitching, uptime/coverage accounting, and span
    consolidation). All-integer epoch-seconds arithmetic.

    Plan: per-user ``groupby.map_groups`` (same user-fits-a-worker
    contract as sessionize) with a vectorized island kernel — sorted
    starts vs the running cummax of ends; islands cut where the start
    clears every previous end; reduceat folds per-island extents. One
    exchange (the groupby); the oracle spells the identical semantics
    with two window functions."""
    ds = T(sf_dir, "events", ["user_id", "ts"])

    def _islands(df: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(df["ts"].to_numpy().astype("datetime64[us]")
                    .view("int64") // 1_000_000)
        s, e = t, t + INTERVAL_COVER_S
        cummax_e = np.maximum.accumulate(e)
        cut = np.r_[True, s[1:] > cummax_e[:-1]]
        idx = np.flatnonzero(cut)
        ends = np.maximum.reduceat(e, idx)
        covered = int((ends - s[idx]).sum())
        return pd.DataFrame([{
            "user_id": df["user_id"].iloc[0],
            "n_islands": int(cut.sum()),
            "covered_s": covered,
        }])

    out = ds.groupby("user_id").map_groups(_islands, batch_format="pandas")

    def _cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "n_islands": b["n_islands"].cast(pa.int64()),
            "covered_s": b["covered_s"].cast(pa.int64()),
        })

    return out.map_batches(_cast, batch_format="pyarrow")


def q_json_extract(sf_dir):
    """Semi-structured column extraction — parse the events.props JSON
    payload into typed fields and aggregate per event type (Σk, count,
    distinct k) — the schema-on-read op every log/telemetry pipeline
    starts with. The parse is a real JSON decode (stdlib json per
    value, inside map_batches — same python-kernel class as the
    tokenizer stages; pyarrow has no JSON-parse kernel), the
    aggregation one map-side-combined partial-agg exchange."""
    import json as _json

    ds = T(sf_dir, "events", ["event_type", "props"])

    def _parse(b: pa.Table) -> pa.Table:
        ks = [int(_json.loads(p)["k"]) for p in b["props"].to_pylist()]
        return pa.table({
            "event_type": b["event_type"],
            "k": pa.array(ks, pa.int64()),
        })

    parsed = ds.map_batches(_parse, batch_format="pyarrow")
    # (type, k) counts first: the second groupby then sees the DISTINCT
    # (type, k) table, so distinct-k is an exact count, not a sketch
    counts = fast_groupby_agg(parsed, ["event_type", "k"],
                              {"c": (None, "count")})

    def _kc(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "c": b["c"],
            "kc": pc.multiply(b["k"], b["c"]),
        })

    return fast_groupby_agg(
        counts.map_batches(_kc, batch_format="pyarrow"),
        ["event_type"],
        {"n_distinct_k": (None, "count"), "n": ("c", "sum"),
         "k_sum": ("kc", "sum")},
    )


# ============================================ r3 batch-2: explode / fill /
# lead / CDC compaction / BFS — the remaining classic pipeline primitives


def q_unnest_explode(sf_dir):
    """UNNEST-with-ordinality (the `explode` / flat_map primitive): one
    output row per (vec, position) over the list<float> embedding
    column. Fully vectorized zero-copy Arrow: ``pc.list_flatten`` for
    values, value-lengths arithmetic for the 1-based ordinal — no
    Python per row, no per-list loop. The float32→float64 widening is
    bit-exact on both engines (no arithmetic), so the oracle matches
    without fixed-point."""
    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _ex(b: pa.Table) -> pa.Table:
        col = b["embedding"].combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col)
        vid = np.repeat(b["vec_id"].to_numpy(zero_copy_only=False), lens)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        ordv = np.arange(int(lens.sum()), dtype=np.int64) - starts + 1
        return pa.table({
            "vec_id": pa.array(vid.astype(np.int64), pa.int64()),
            "ord": pa.array(ordv, pa.int64()),
            "val": pc.cast(flat, pa.float64()),
        })

    return emb.map_batches(_ex, batch_format="pyarrow")


def q_gap_fill(sf_dir):
    """Sparse→dense time-series densification (gap fill): per-user DAILY
    event counts with every missing day between the user's first and
    last activity emitted as an explicit 0 — the precondition for any
    rolling/window computation that assumes a dense axis. Plan: one
    map-side-combined (user, day) count exchange, then per-user
    ``map_groups`` materializes the dense range (per-key output is
    bounded by the TIME SPAN, not the data size — same per-key-fits-a-
    worker contract as sessionize; a multi-year span × billion-user
    fill would instead explode (user, day-range) spans via flat_map)."""
    ev = T(sf_dir, "events", ["user_id", "ts"])

    def _day_map(b: pa.Table) -> pa.Table:
        d = (b["ts"].to_pandas().to_numpy()
             .astype("datetime64[D]").astype("int64"))
        return pa.table({"user_id": b["user_id"],
                         "day": pa.array(d, pa.int64())})

    counts = fast_groupby_agg(
        ev.map_batches(_day_map, batch_format="pyarrow"),
        ["user_id", "day"], {"n": (None, "count")},
    )

    def _fill(df: pd.DataFrame) -> pd.DataFrame:
        lo = int(df["day"].min())
        full = np.arange(lo, int(df["day"].max()) + 1, dtype=np.int64)
        n = np.zeros(len(full), dtype=np.int64)
        n[df["day"].to_numpy() - lo] = df["n"].to_numpy()
        return pd.DataFrame({"user_id": df["user_id"].iloc[0],
                             "day": full, "n": n})

    return counts.groupby("user_id").map_groups(_fill, batch_format="pandas")


def q_lead_dwell(sf_dir):
    """Per-event dwell time: LEAD(ts) − ts within each user's (ts,
    event_id)-ordered history, in exact integer microseconds (surfaced
    as float64 because SQL LEAD is NULL on the last row — the same
    nullable-BIGINT ↔ float64+NaN convention as q_window_functions'
    lag column; month-scale spans ≪ 2^53 stay exact). Completes the
    lag/lead pair of the window surface."""
    ds = T(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _dwell(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        t = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        dw = np.full(len(t), np.nan)
        dw[:-1] = (t[1:] - t[:-1]).astype(np.float64)
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                             "event_id": df["event_id"].to_numpy(),
                             "dwell_us": dw})

    return ds.groupby("user_id").map_groups(_dwell, batch_format="pandas")


def q_cdc_upsert(sf_dir):
    """CDC upsert compaction (last-write-wins): a base snapshot plus a
    derived update stream (every 7th order re-priced, version 1) merged
    to one current row per key — the lakehouse MERGE/compaction shape.
    Plan: both channels are emitted in ONE pass over the input, then
    the mergeable grouped top-1 by version keeps the latest — map-side
    compaction, so the exchange carries ≤ one row per (block, key),
    never the raw change stream. Prices are ×100 integer fixed-point."""
    from ..stages.fastagg import grouped_topk

    orders = T(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _channels(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        upd = (k % 7) == 0
        return pa.table({
            "o_orderkey": pa.array(np.concatenate([k, k[upd]]), pa.int64()),
            "price_fp": pa.array(
                np.concatenate([p, p[upd] + 100_000]), pa.int64()),
            "version": pa.array(
                np.concatenate([np.zeros(len(k), np.int64),
                                np.ones(int(upd.sum()), np.int64)]),
                pa.int64()),
        })

    ds = orders.map_batches(_channels, batch_format="pyarrow")
    out = grouped_topk(ds, ["o_orderkey"], ["version"], [False], 1)
    return out.select_columns(["o_orderkey", "price_fp", "version"])


BFS_MAX_HOPS = 6
BFS_MAX_SINGLE_EDGES = 5_000_000


@ray.remote
def _bfs_task(n: int, max_hops: int, *tables: pa.Table) -> pa.Table:
    """Single-task BFS over the collected edge list (small-graph tier,
    guard: BFS_MAX_SINGLE_EDGES): edges sorted by src once, each hop's
    neighbor gather is a searchsorted slice — work per hop is edges
    touched, not edges total."""
    live = live_arrow(tables)
    t = pa.concat_tables(live)
    order = np.argsort(t["src"].to_numpy(zero_copy_only=False),
                       kind="stable")
    src_s = t["src"].to_numpy(zero_copy_only=False)[order]
    dst_s = t["dst"].to_numpy(zero_copy_only=False)[order]
    dist = np.full(n, -1, dtype=np.int64)
    dist[0] = 0
    frontier = np.array([0], dtype=np.int64)
    for hop in range(1, max_hops + 1):
        lo = np.searchsorted(src_s, frontier, side="left")
        hi = np.searchsorted(src_s, frontier, side="right")
        parts = [dst_s[a:b] for a, b in zip(lo, hi) if b > a]
        if not parts:
            break
        cand = np.unique(np.concatenate(parts))
        new = cand[dist[cand] == -1]
        if len(new) == 0:
            break
        dist[new] = hop
        frontier = new
    return pa.table({"node": pa.array(np.arange(n, dtype=np.int64)),
                     "dist": pa.array(dist, pa.int64())})


def q_graph_bfs(sf_dir, max_hops: int = BFS_MAX_HOPS,
                max_single_edges: int = BFS_MAX_SINGLE_EDGES):
    """Single-source BFS hop distance from node 0 over the derived order
    graph (same deterministic edge set as q_pagerank) — the traversal
    member of the graph family (pagerank = fixed-iteration, connected
    components = converging labels, BFS = expanding frontier).
    Unreached-within-max_hops nodes report −1 (no nullable-int dtype
    gamble).

    Scale plan: per hop one hash join (frontier ⋈ edges on src), a
    map-side-distinct on dst, and an anti-join against the visited set
    — the frontier and visited sets are node-sized Datasets, never
    driver state. Below ``max_single_edges`` the collected-edge
    single-task tier runs instead (tiers pinned identical by test)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    cust = T(sf_dir, "customer", ["c_custkey"])
    dom = cust.aggregate(Min("c_custkey"), Max("c_custkey"), Count())
    n = dom["count()"]
    if dom["min(c_custkey)"] != 0 or dom["max(c_custkey)"] != n - 1:
        raise ValueError(
            f"graph_bfs needs dense 0-based c_custkey; got "
            f"[{dom['min(c_custkey)']}, {dom['max(c_custkey)']}] n={n}")
    edges = _pagerank_edges(sf_dir, n).materialize()

    if edges.count() <= max_single_edges:
        return rd.from_arrow_refs(
            [_bfs_task.remote(n, max_hops, *edges.to_arrow_refs())])

    visited = rd.from_arrow(pa.table({
        "node": pa.array([0], pa.int64()),
        "dist": pa.array([0], pa.int64()),
    })).materialize()
    frontier = visited
    for hop in range(1, max_hops + 1):
        cand = edges.join(
            frontier.map_batches(
                lambda b: pa.table({"src": b["node"]}),
                batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=("src",),
        ).map_batches(lambda b: pa.table({"node": b["dst"]}),
                      batch_format="pyarrow")
        cand = fast_groupby_agg(cand, ["node"], {"_n": (None, "count")})
        new = cand.join(visited.select_columns(["node"]), "left_anti",
                        num_partitions=JOIN_PARTS, on=("node",))
        new = new.map_batches(
            lambda b, h=hop: pa.table({
                "node": b["node"],
                "dist": pa.array(np.full(b.num_rows, h), pa.int64()),
            }),
            batch_format="pyarrow",
        ).materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new

    nodes = cust.map_batches(
        lambda b: pa.table({"node": b["c_custkey"]}), batch_format="pyarrow")
    out = nodes.join(visited, "left_outer", num_partitions=JOIN_PARTS, on=("node",))
    return out.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "dist": pc.fill_null(b["dist"], -1),
        }),
        batch_format="pyarrow",
    )


def _bfs_oracle(max_hops: int = BFS_MAX_HOPS) -> str:
    """Recursive-CTE BFS: UNION-dedup on (node, dist) pairs bounds the
    recursion; min(dist) per node == first-reach hop."""
    return f"""
        WITH RECURSIVE nn AS (SELECT count(*) AS c FROM customer),
        e AS (
            SELECT o_custkey AS src,
                   o_orderkey % (SELECT c FROM nn) AS dst
            FROM orders
        ),
        bfs AS (
            SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
            UNION
            SELECT e.dst, bfs.dist + 1
            FROM bfs JOIN e ON e.src = bfs.node
            WHERE bfs.dist < {max_hops}
        ),
        d AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY node)
        SELECT c.c_custkey AS node,
               CAST(COALESCE(d.dist, -1) AS BIGINT) AS dist
        FROM customer c LEFT JOIN d ON d.node = c.c_custkey
    """


def q_j_full_outer(sf_dir):
    """Full-outer join with unmatched rows on BOTH sides: negative-balance
    customers vs per-customer counts of large orders (>300k). Completes
    the join family (inner / left / semi / anti / full). Scale plan: both
    sides are filtered + pre-aggregated BEFORE the exchange (the join
    moves one row per surviving key, never raw facts); Ray's hash
    full-outer coalesces the key into the left column, and a flag column
    carried through the join marks left-side presence."""
    neg = T(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda b: pa.table({
            "c_custkey": b.filter(pc.less(b["c_acctbal"], 0.0))["c_custkey"],
        }).append_column("__left", pa.array(
            np.ones(len(b.filter(pc.less(b["c_acctbal"], 0.0))), np.int64))),
        batch_format="pyarrow",
    )
    big = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            lambda b: pa.table({
                "o_custkey":
                    b.filter(pc.greater(b["o_totalprice"], 300000.0))
                    ["o_custkey"],
            }),
            batch_format="pyarrow"),
        ["o_custkey"], {"n_big": (None, "count")},
    )
    j = neg.join(big, "full_outer", num_partitions=JOIN_PARTS,
                 on=("c_custkey",), right_on=("o_custkey",))
    return j.map_batches(
        lambda b: pa.table({
            "custkey": b["c_custkey"],
            "has_neg_bal": pc.fill_null(b["__left"], 0),
            "n_big": pc.fill_null(b["n_big"], 0),
        }),
        batch_format="pyarrow",
    )


def q_forward_fill(sf_dir):
    """Forward fill (last observation carried forward): every 7th event
    carries a reading; all rows report the latest reading at-or-before
    them per user in (ts, event_id) order — the sensor-gap/LOCF operator.
    Leading rows before any reading are NULL (surfaced as NaN, the
    nullable-BIGINT comparison dtype).

    Plan: ``groupby(user).map_groups`` + a vectorized cummax-of-positions
    fill inside each group — same bounded-per-key assumption as
    window_functions; a cross-partition variant would carry per-block
    (first/last reading) boundary rows through a second tiny exchange."""
    ds = T(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _fill(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        eid = df["event_id"].to_numpy()
        have = (eid % 7) == 0
        pos = np.where(have, np.arange(len(eid)), -1)
        np.maximum.accumulate(pos, out=pos)
        filled = np.where(
            pos >= 0, eid[np.maximum(pos, 0)].astype(np.float64), np.nan)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "event_id": eid,
            "filled": filled,
        })

    return ds.groupby("user_id").map_groups(_fill, batch_format="pandas")


def q_exists_subquery(sf_dir):
    """EXISTS correlated subquery (TPC-H Q4 shape): orders per priority
    that have at least one high-quantity line item. Plan: the subquery
    side is reduced to map-side-distinct keys (the exchange moves one
    row per qualifying order, not lineitem rows), then a hash
    ``left_semi`` join and a small groupby — no driver key set."""
    keys = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
            lambda b: pa.table({
                "l_orderkey":
                    b.filter(pc.greater(b["l_quantity"], 45.0))
                    ["l_orderkey"],
            }),
            batch_format="pyarrow"),
        ["l_orderkey"], {"__n": (None, "count")},
    ).drop_columns(["__n"])
    sj = T(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).join(
        keys, "left_semi", num_partitions=JOIN_PARTS,
        on=("o_orderkey",), right_on=("l_orderkey",))
    return fast_groupby_agg(sj, ["o_orderpriority"],
                            {"n_orders": (None, "count")})


def q_order_count_distribution(sf_dir):
    """Two-level aggregation (TPC-H Q13 shape): orders-per-customer
    including zero-order customers, then the distribution of those
    counts. Plan: pre-aggregate orders to one row per customer, hash
    left-outer join against customer keys, then a second (tiny) groupby
    over the count domain — both exchanges move key-sized tables."""
    counts = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey"]), ["o_custkey"],
        {"n_orders": (None, "count")},
    )
    j = T(sf_dir, "customer", ["c_custkey"]).join(
        counts, "left_outer", num_partitions=JOIN_PARTS,
        on=("c_custkey",), right_on=("o_custkey",),
    ).map_batches(
        lambda b: pa.table({"n_orders": pc.fill_null(b["n_orders"], 0)}),
        batch_format="pyarrow",
    )
    return fast_groupby_agg(j, ["n_orders"], {"n_custs": (None, "count")})


def q_argmax_join(sf_dir):
    """Greatest-per-group join-back (TPC-H Q2 shape): per nation, the
    customer with the max account balance (ties → min custkey), enriched
    with the nation name. Plan: the mergeable grouped top-1
    (stages/fastagg.grouped_topk — per-block top-1, tree combine) keeps
    whole rows so no join-back to the fact table is needed; the nation
    name comes from a broadcast of the 25-row dimension."""
    from ..stages.fastagg import grouped_topk

    top = grouped_topk(
        T(sf_dir, "customer", ["c_nationkey", "c_custkey", "c_acctbal"]),
        ["c_nationkey"], ["c_acctbal", "c_custkey"], [False, True], 1,
    )
    names = dict(zip(
        *(T(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
          [c].tolist() for c in ("n_nationkey", "n_name"))))

    def _name(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_pylist()
        return pa.table({
            "c_nationkey": b["c_nationkey"],
            "n_name": pa.array([names[k] for k in nk], pa.string()),
            "c_custkey": b["c_custkey"],
            "c_acctbal": b["c_acctbal"],
        })

    return top.map_batches(_name, batch_format="pyarrow")


def q_mom_growth(sf_dir):
    """Month-over-month revenue delta per market segment: hash-join
    orders⋈customer, monthly ×100 fixed-point revenue rollup, then a
    per-segment LAG — the time-series growth-report shape. First month
    per segment has NULL prev/diff (nullable-BIGINT → float64 comparison
    dtype). The exchange moves one row per (segment, month); the lag
    runs on the tiny aggregate."""
    j = T(sf_dir, "orders",
          ["o_custkey", "o_orderdate", "o_totalprice"]).join(
        T(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))
    m = j.map_batches(
        lambda b: pa.table({
            "c_mktsegment": b["c_mktsegment"],
            "month": pc.strftime(b["o_orderdate"], format="%Y-%m"),
            "rev_fp": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)),
        }),
        batch_format="pyarrow",
    )
    agg = fast_groupby_agg(m, ["c_mktsegment", "month"],
                           {"rev_fp": ("rev_fp", "sum")})

    def _lag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("month", kind="mergesort")
        prev = df["rev_fp"].shift(1)
        return pd.DataFrame({
            "c_mktsegment": df["c_mktsegment"].to_numpy(),
            "month": df["month"].to_numpy(),
            "rev_fp": df["rev_fp"].to_numpy(),
            "prev_fp": prev.to_numpy(dtype=np.float64),
            "diff_fp": (df["rev_fp"] - prev).to_numpy(dtype=np.float64),
        })

    return agg.groupby("c_mktsegment").map_groups(_lag,
                                                  batch_format="pandas")


SOURCE_JACCARD_MAX_SOURCES = 63    # bitmask plan bound (one uint64)
SOURCE_JACCARD_MAX_MASKS = 4_000_000  # distinct-mask final-task bound


def q_source_jaccard(sf_dir):
    """Pairwise token-set Jaccard similarity between document SOURCES —
    the corpus-mixing diagnostic ("how much does src A's vocabulary
    overlap src B's?"). Plan: per-doc distinct tokens → map-side
    distinct (source, token) rows → each source gets a bit → per-token
    source BITMASK (sum of distinct per-source bits == OR) → distinct
    masks counted — so the final task sees |distinct masks| rows (≤ 2^S,
    in practice ≪), never token-scale data. Pairs with zero overlap are
    not emitted (matches the oracle's inner join). The single float
    division inter/union is the only float op, identical on both sides.

    Guards: > SOURCE_JACCARD_MAX_SOURCES sources (bitmask width) or
    > SOURCE_JACCARD_MAX_MASKS distinct masks → the plan raises; the
    scale path would shard the mask domain (pair counting distributes
    over disjoint mask subsets by linearity)."""
    docs = T(sf_dir, "documents", ["source", "text"])

    def _src_tokens(b: pa.Table) -> pa.Table:
        srcs, toks = [], []
        for s, txt in zip(b["source"].to_pylist(), b["text"].to_pylist()):
            t = set(_TOKEN.findall(txt.lower()))
            srcs.extend([s] * len(t))
            toks.extend(t)
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "token": pa.array(toks, pa.string())})

    pairs = fast_groupby_agg(
        docs.map_batches(_src_tokens, batch_format="pyarrow"),
        ["source", "token"], {"__n": (None, "count")},
    ).drop_columns(["__n"])

    sources = sorted(set(
        fast_groupby_agg(docs.select_columns(["source"]), ["source"],
                         {"__n": (None, "count")})
        .to_pandas()["source"]))
    if len(sources) > SOURCE_JACCARD_MAX_SOURCES:
        raise ValueError(
            f"source_jaccard bitmask plan supports ≤"
            f"{SOURCE_JACCARD_MAX_SOURCES} sources, got {len(sources)}")
    bit = {s: i for i, s in enumerate(sources)}
    bref = ray.put(bit)

    class _Mask:
        def __init__(self):
            self.bit = ray.get(bref)

        def __call__(self, b: pa.Table) -> pa.Table:
            masks = np.array([1 << self.bit[s]
                              for s in b["source"].to_pylist()], np.int64)
            return pa.table({"token": b["token"],
                             "mask": pa.array(masks, pa.int64())})

    # per-token OR == SUM (each source appears once per token after the
    # distinct), then count tokens per distinct mask
    tok_masks = fast_groupby_agg(
        pairs.map_batches(_Mask, batch_format="pyarrow", concurrency=2),
        ["token"], {"mask": ("mask", "sum")},
    )
    mask_counts = fast_groupby_agg(
        tok_masks.drop_columns(["token"]), ["mask"],
        {"n_tokens": (None, "count")},
    ).to_pandas()
    if len(mask_counts) > SOURCE_JACCARD_MAX_MASKS:
        raise ValueError("source_jaccard: distinct-mask domain too large")

    s_n = len(sources)
    sizes = np.zeros(s_n, dtype=np.int64)
    inter = np.zeros((s_n, s_n), dtype=np.int64)
    for m, n in zip(mask_counts["mask"].to_numpy(),
                    mask_counts["n_tokens"].to_numpy()):
        bits = [i for i in range(s_n) if (int(m) >> i) & 1]
        for i in bits:
            sizes[i] += n
        for ai in range(len(bits)):
            for bi in range(ai + 1, len(bits)):
                inter[bits[ai], bits[bi]] += n
    rows = []
    for a in range(s_n):
        for b_ in range(a + 1, s_n):
            ni = int(inter[a, b_])
            if ni == 0:
                continue
            nu = int(sizes[a] + sizes[b_] - ni)
            rows.append({"src_a": sources[a], "src_b": sources[b_],
                         "n_inter": ni, "n_union": nu,
                         "jaccard": ni / nu})
    return pd.DataFrame(rows)


def q_cms_frequency(sf_dir, top: int = 20):
    """Count-min-sketch point-frequency estimates for the top-`top`
    l_partkey heavy hitters, with the exact counts and asserted error
    gates (never-underestimate; overcount within 3× the e/W·N bound;
    mean overcount within the bound itself) — the mergeable-sketch
    companion to the Misra–Gries heavy_hitters entry. Per-batch d×w
    partials tree-combine by elementwise sum; the driver never sees more
    than ~32 sketch buffers."""
    from ..functions.sketches import CMS_D, CMS_W, cms_partial, cms_query

    ds = T(sf_dir, "lineitem", ["l_partkey"])

    def _partial(b: pa.Table) -> pa.Table:
        keys = b["l_partkey"].to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([cms_partial(keys).tobytes()],
                                       pa.binary())})

    sketch = _tree_reduce_buffers(
        ds.map_batches(_partial, batch_format="pyarrow"), "m",
        np.add, np.int64)
    exact = fast_groupby_agg(ds, ["l_partkey"], {"n": (None, "count")})
    n_total = int(T(sf_dir, "lineitem", ["l_partkey"]).count())
    top_df = (exact.sort(["n", "l_partkey"], descending=[True, False])
              .limit(top).to_pandas())
    est = cms_query(sketch, top_df["l_partkey"].to_numpy())
    over = est - top_df["n"].to_numpy()
    bound = math.e / CMS_W * n_total
    assert (over >= 0).all(), "CMS underestimated a count"
    assert over.max() <= max(3 * bound, 3.0), (over.max(), bound)
    assert over.mean() <= max(bound, 1.0), (over.mean(), bound)
    return pd.DataFrame({
        "l_partkey": top_df["l_partkey"].to_numpy(),
        "exact": top_df["n"].to_numpy(),
        "est": est,
        "overcount": over,
        "d": np.full(len(est), CMS_D),
        "w": np.full(len(est), CMS_W),
    })


BUCKETED_JOIN_BUCKETS = 16


def q_bucketed_join(sf_dir, n_buckets: int = BUCKETED_JOIN_BUCKETS):
    """Layout-aware co-partitioned join: both sides are written ONCE
    hash-bucketed by the join key (splitmix64(key) mod n_buckets), then
    each bucket pair joins LOCALLY in its own task — ZERO exchange at
    join time. This is the 100-TB plan for repeated joins on one key:
    pay the shuffle once at layout time, amortize it over every
    subsequent join (and co-locate bucket i of both tables on one node).
    Revenue is ×100 integer fixed-point so the per-bucket partial →
    final-sum plan is bit-exact regardless of bucket count.

    The per-bucket task does read → pyarrow hash join → nation-level
    partial agg, so the union carries ≤ |nations| rows per bucket."""
    import os
    import shutil

    import ray.data as rd

    from ..functions.sketches import _splitmix64

    root = f"/tmp/fcray_bucketed_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)

    def _bucketize(key):
        def _b(b: pa.Table) -> pa.Table:
            k = b[key].to_numpy(zero_copy_only=False).astype(np.uint64)
            return b.append_column("bucket", pa.array(
                (_splitmix64(k) % np.uint64(n_buckets)).astype(np.int64)))
        return _b

    T(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        _bucketize("o_custkey"), batch_format="pyarrow",
    ).write_parquet(f"{root}/orders", partition_cols=["bucket"])
    T(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        _bucketize("c_custkey"), batch_format="pyarrow",
    ).write_parquet(f"{root}/customer", partition_cols=["bucket"])

    @ray.remote
    def _bucket_join(i: int) -> pa.Table:
        import pyarrow.parquet as pq
        o = pq.read_table(f"{root}/orders/bucket={i}",
                          columns=["o_custkey", "o_totalprice"])
        c = pq.read_table(f"{root}/customer/bucket={i}",
                          columns=["c_custkey", "c_nationkey"])
        j = o.join(c, keys="o_custkey", right_keys="c_custkey",
                   join_type="inner")
        fp = _round_half_away(
            j["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame({
            "c_nationkey":
                j["c_nationkey"].to_numpy(zero_copy_only=False),
            "rev_fp": fp,
        })
        g = df.groupby("c_nationkey", sort=False)
        out = g.agg(rev_fp=("rev_fp", "sum"), n_orders=("rev_fp", "size"))
        return pa.Table.from_pandas(out.reset_index(),
                                    preserve_index=False)

    refs = [_bucket_join.remote(i) for i in range(n_buckets)]
    ray.wait(refs, num_returns=len(refs))
    shutil.rmtree(root, ignore_errors=True)
    partials = rd.from_arrow_refs(refs)
    return fast_groupby_agg(partials, ["c_nationkey"], {
        "rev_fp": ("rev_fp", "sum"),
        "n_orders": ("n_orders", "sum"),
    })


# ====================================================== data auditing

_FK_RELATIONS = (
    # (label, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
)


def q_fk_integrity(sf_dir):
    """Referential-integrity audit: per FK relation, the number of
    distinct child keys and how many of them are orphans (missing from
    the parent table) — the data-quality gate every ingest pipeline runs
    before joining. Scale plan: each side is reduced to map-side
    DISTINCT keys before the hash ``left_anti`` exchange, so the
    all-to-all moves key sets, never fact rows; the three relations'
    outputs are driver scalars (one int pair each)."""
    from concurrent.futures import ThreadPoolExecutor

    def _audit(rel):
        label, child, ck, parent, pk = rel
        ckeys = fast_groupby_agg(
            T(sf_dir, child, [ck]), [ck], {"__n": (None, "count")},
        ).drop_columns(["__n"]).materialize()
        orphans = ckeys.join(
            T(sf_dir, parent, [pk]), "left_anti", num_partitions=4,
            on=(ck,), right_on=(pk,))
        return {"relation": label, "n_child_keys": ckeys.count(),
                "n_orphans": orphans.count()}

    # the three audits are independent Dataset pipelines — run them
    # concurrently (each execution gets its own streaming executor)
    with ThreadPoolExecutor(max_workers=len(_FK_RELATIONS)) as ex:
        rows = list(ex.map(_audit, _FK_RELATIONS))
    return pd.DataFrame(rows).sort_values("relation").reset_index(drop=True)


_PROFILE_COLS = ("o_custkey", "o_orderpriority", "o_orderstatus")


def q_table_profile(sf_dir):
    """Column profiler (the first stage of any schema-drift monitor):
    per column of ``orders`` — row count, null count, exact distinct
    count. Plan: ONE long-format pass; each block emits (a) 3 count/null
    partial rows and (b) its block-DISTINCT (col, val-as-string) pairs,
    so the single exchange carries per-block distinct pairs (bounded by
    value domain × blocks), never raw rows. Stringification is injective
    per column (values never cross columns), so per-column distinct
    counts are exact."""
    ds = T(sf_dir, "orders", list(_PROFILE_COLS))

    def _counts(b: pa.Table) -> pa.Table:
        return pa.table({
            "col": pa.array(list(_PROFILE_COLS), pa.string()),
            "n_rows": pa.array([len(b)] * len(_PROFILE_COLS), pa.int64()),
            "n_null": pa.array([b[c].null_count for c in _PROFILE_COLS],
                               pa.int64()),
        })

    def _pairs(b: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in _PROFILE_COLS:
            u = pc.unique(pc.cast(b[c], pa.string()))
            cols.append(pa.array([c] * len(u), pa.string()))
            vals.append(u)
        return pa.table({"col": pa.concat_arrays(cols),
                         "val": pa.concat_arrays(
                             a.combine_chunks() if isinstance(
                                 a, pa.ChunkedArray) else a for a in vals)})

    counts = fast_groupby_agg(
        ds.map_batches(_counts, batch_format="pyarrow"), ["col"],
        {"n_rows": ("n_rows", "sum"), "n_null": ("n_null", "sum")},
    ).to_pandas()
    distinct = fast_groupby_agg(
        fast_groupby_agg(
            ds.map_batches(_pairs, batch_format="pyarrow"),
            ["col", "val"], {"__n": (None, "count")}),
        ["col"], {"n_distinct": (None, "count")},
    ).to_pandas()
    out = counts.merge(distinct, on="col").sort_values("col")
    return out[["col", "n_rows", "n_null", "n_distinct"]] \
        .reset_index(drop=True)


def q_chi_square(sf_dir):
    """Chi-square independence decomposition of a contingency table
    (o_orderstatus × o_orderpriority): per cell the observed count, the
    expected count under independence (×1e6 fixed point) and the cell's
    χ² contribution (×1e9) — the categorical-drift / feature-selection
    statistic. Plan: one partial-agg groupby builds the |statuses|×
    |priorities| table; the marginals and per-cell terms run on that
    tiny aggregate. Float policy: e = double(rt·ct)/N and (n−e)²/e are
    single IEEE ops mirrored verbatim in the oracle, then half-away
    rounding on both sides."""
    cont = fast_groupby_agg(
        T(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"]),
        ["o_orderstatus", "o_orderpriority"], {"n": (None, "count")},
    ).to_pandas()
    n = cont["n"].to_numpy(np.int64)
    rt = cont.groupby("o_orderstatus")["n"].transform("sum") \
        .to_numpy(np.int64)
    ct = cont.groupby("o_orderpriority")["n"].transform("sum") \
        .to_numpy(np.int64)
    tot = int(n.sum())
    e = (rt * ct).astype(np.float64) / tot
    d = n - e
    chi2 = d * d / e
    out = pd.DataFrame({
        "o_orderstatus": cont["o_orderstatus"],
        "o_orderpriority": cont["o_orderpriority"],
        "n": n,
        "e_fp": _round_half_away(1e6 * e).astype(np.int64),
        "chi2_fp": _round_half_away(1e9 * chi2).astype(np.int64),
    })
    return out.sort_values(["o_orderstatus", "o_orderpriority"]) \
        .reset_index(drop=True)


_IDLE_RICH_NATIONS = (1, 3, 5, 7, 9, 11, 13)


def q_idle_rich_customers(sf_dir):
    """TPC-H Q22 shape: customers in selected nations with positive,
    above-pool-average balance who never placed a LARGE order
    (>450k) — per nation count and total balance. Composite of scalar
    subquery + anti-join + grouped agg. Exactness: balances are ×100
    integer cents and the average comparison is the cross-multiplied
    ``bal·n > Σbal`` (no division). Scale plan: the pool scalar is two
    ints (per-block partials summed); the anti-join probes
    map-side-distinct large-order custkeys through a hash ``left_anti``
    exchange — key-sized, never fact-sized."""
    pool = T(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def _pool(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater(b["c_acctbal"], 0.0),
            pc.is_in(b["c_nationkey"],
                     value_set=pa.array(_IDLE_RICH_NATIONS, pa.int64())))
        t = b.filter(keep)
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_nationkey": t["c_nationkey"],
            "bal_c": pa.array(_round_half_away(
                t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    fp = pool.map_batches(_pool, batch_format="pyarrow").materialize()
    parts = fp.map_batches(
        lambda b: pa.table({
            "s": pa.array([int(pc.sum(b["bal_c"]).as_py() or 0)], pa.int64()),
            "n": pa.array([len(b)], pa.int64()),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    tot, np_ = int(parts["s"].sum()), int(parts["n"].sum())

    okeys = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            lambda b: pa.table({
                "o_custkey":
                    b.filter(pc.greater(b["o_totalprice"], 450000.0))
                    ["o_custkey"],
            }),
            batch_format="pyarrow"),
        ["o_custkey"], {"__n": (None, "count")},
    ).drop_columns(["__n"])
    rich = fp.map_batches(
        lambda b: b.filter(pc.greater(
            pc.multiply(b["bal_c"], np.int64(np_)), np.int64(tot))),
        batch_format="pyarrow",
    )
    idle = rich.join(okeys, "left_anti", num_partitions=4,
                     on=("c_custkey",), right_on=("o_custkey",))
    return fast_groupby_agg(idle, ["c_nationkey"], {
        "n_custs": (None, "count"), "totbal_fp": ("bal_c", "sum"),
    })


def q_group_mean_impute(sf_dir):
    """Group-mean imputation (the tabular-ML missing-value stage):
    events whose ``event_id % 11 == 0`` are treated as missing and take
    their user's mean of present values; everything is ×1e6 integer
    fixed point and the mean divides once per user on the tiny
    aggregate (double(Σ)/n, mirrored in the oracle). Users with no
    present value stay NULL. Plan: per-user (Σ, n) partial-agg groupby,
    hash left-outer join back, vectorized where() — the exchange moves
    one row per user plus the fact rows once."""
    ds = T(sf_dir, "events", ["event_id", "user_id", "value"])

    def _fp(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        v = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "v_fp": pa.array(v, pa.int64()),
            "miss": pa.array(eid % 11 == 0),
        })

    fp = ds.map_batches(_fp, batch_format="pyarrow").materialize()
    present = fp.map_batches(
        lambda b: b.filter(pc.invert(b["miss"])).select(
            ["user_id", "v_fp"]),
        batch_format="pyarrow")
    means = fast_groupby_agg(present, ["user_id"], {
        "s": ("v_fp", "sum"), "n": (None, "count"),
    }).map_batches(
        lambda b: pa.table({
            "uid_r": b["user_id"],
            "mean_fp": pa.array(_round_half_away(
                b["s"].to_numpy(zero_copy_only=False).astype(np.float64)
                / b["n"].to_numpy(zero_copy_only=False)
            ).astype(np.int64), pa.int64()),
        }),
        batch_format="pyarrow")
    j = fp.join(means, "left_outer", num_partitions=JOIN_PARTS,
                on=("user_id",), right_on=("uid_r",))

    def _impute(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "value_fp": pc.if_else(b["miss"], b["mean_fp"], b["v_fp"]),
        })

    return j.map_batches(_impute, batch_format="pyarrow")


def q_trimmed_mean(sf_dir):
    """Per-group 10% trimmed mean of l_quantity WITHOUT any row sort:
    the grouped value-counts histogram (one partial-agg exchange, |flag|
    × |distinct qty| rows) yields exact rank thresholds by cumulative
    sum, and each value's kept multiplicity is the overlap of its rank
    interval with (n//10, n − n//10] — bit-identical to the oracle's
    row_number window because a rank slice of a sorted multiset is
    tie-order-free. The robust-statistics aggregate at 100 TB: the raw
    column never moves, only the tiny histogram does."""
    hist = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]),
        ["l_returnflag", "l_quantity"], {"cnt": (None, "count")},
    ).to_pandas()
    rows = []
    for flag, g in hist.groupby("l_returnflag"):
        g = g.sort_values("l_quantity")
        qc = _round_half_away(
            g["l_quantity"].to_numpy(np.float64) * 100).astype(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        lo, hi = n // 10, n - n // 10
        start = cum - cnt  # ranks (start, cum] hold this value
        kept = np.clip(np.minimum(cum, hi) - np.maximum(start, lo), 0, None)
        n_kept = int(kept.sum())
        s = int((qc * kept).sum())
        rows.append({
            "l_returnflag": flag, "n_kept": n_kept, "sum_fp": s,
            "mean_fp": int(_round_half_away(
                np.float64(s) / n_kept)) if n_kept else None,
        })
    return pd.DataFrame(rows).sort_values("l_returnflag") \
        .reset_index(drop=True)


def q_ratio_to_report(sf_dir):
    """Ratio-to-report window (revenue share of each nation within its
    region, ×1e9 fixed point): hash-join orders⋈customer pre-aggregated
    to nation grain, broadcast the 25/5-row nation→region dimensions,
    and compute shares on the |nations|-row aggregate. The only
    fact-sized motion is the orders→nation partial agg; division happens
    once per nation on exact integer sums (double/double, mirrored)."""
    names = {
        int(r["n_nationkey"]): (str(r["n_name"]), int(r["n_regionkey"]))
        for _, r in T(sf_dir, "nation").to_pandas().iterrows()
    }
    regions = {
        int(r["r_regionkey"]): str(r["r_name"])
        for _, r in T(sf_dir, "region").to_pandas().iterrows()
    }

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "rev_c": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    j = T(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        _fp, batch_format="pyarrow",
    ).join(
        T(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))
    nr = fast_groupby_agg(j, ["c_nationkey"], {"rev_fp": ("rev_c", "sum")}
                          ).to_pandas()
    nr["n_name"] = [names[k][0] for k in nr["c_nationkey"]]
    nr["r_name"] = [regions[names[k][1]] for k in nr["c_nationkey"]]
    reg = nr.groupby("r_name")["rev_fp"].transform("sum")
    share = 1e9 * (nr["rev_fp"].to_numpy(np.float64)
                   / reg.to_numpy(np.float64))
    out = pd.DataFrame({
        "n_name": nr["n_name"], "r_name": nr["r_name"],
        "rev_fp": nr["rev_fp"],
        "share_fp": _round_half_away(share).astype(np.int64),
    })
    return out.sort_values("n_name").reset_index(drop=True)


def q_dedup_survivor(sf_dir):
    """Quality-aware survivorship dedup: per exact-duplicate cluster
    (raw-text md5) keep the BEST record — max n_chars, tie-broken by min
    doc_id — not merely the first-seen. This is the canonicalization
    flavor of D1 a training-data pipeline wants (keep the longest/most
    complete copy). Plan: md5 map-side, then the mergeable grouped top-1
    (per-block top-1, tree combine) — no per-group Python, no join-back;
    the exchange carries ≤1 row per (block × cluster)."""
    from ..stages.fastagg import grouped_topk

    def _h(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        return pa.table({
            "h": pa.array([hashlib.md5((t or "").encode()).hexdigest()
                           for t in texts], pa.string()),
            "doc_id": b["doc_id"],
            "source": b["source"],
            "n_chars": b["n_chars"],
        })

    ds = T(sf_dir, "documents", ["doc_id", "text", "source", "n_chars"]
           ).map_batches(_h, batch_format="pyarrow")
    top = grouped_topk(ds, ["h"], ["n_chars", "doc_id"], [False, True], 1)
    return top.select_columns(["doc_id", "source", "n_chars"])


def q_time_weighted_avg(sf_dir):
    """Time-weighted average (TWAP): per user, each value weighted by
    its dwell — the milliseconds until the user's next event in
    (ts, event_id) order; the last event carries no weight. The
    stream-analytics aggregate for irregularly-sampled series. Exactness:
    values are ×1e3 integers, dwell is exact epoch-ms, Σ(v·dw) and Σdw
    are exact int64 sums (|v_fp|≤5e5, dw≤1e8 ⇒ products ≤5e13), and the
    single final division is double/int mirrored in the oracle. Plan:
    per-user ``map_groups`` with a vectorized shift — the same
    bounded-rows-per-key assumption as window_functions; the exchange
    moves each event row once."""
    ds = T(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    _empty = pd.DataFrame({
        "user_id": pd.Series(dtype="int64"),
        "total_dwell_ms": pd.Series(dtype="int64"),
        "twa_fp": pd.Series(dtype="int64"),
    })

    def _twa(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        ms = df["ts"].to_numpy().astype("datetime64[ms]").view("int64")
        v = _round_half_away(df["value"].to_numpy() * 1e3).astype(np.int64)
        dw = ms[1:] - ms[:-1]
        tot = int(dw.sum())
        if len(df) < 2 or tot == 0:
            # <2 events → no dwell rows; all-same-ms → HAVING Σdw > 0
            return _empty
        s = int((v[:-1] * dw).sum())
        return pd.DataFrame({
            "user_id": df["user_id"].iloc[:1],
            "total_dwell_ms": np.array([tot], np.int64),
            "twa_fp": np.array(
                [int(_round_half_away(np.float64(s) / tot))], np.int64),
        })

    return ds.groupby("user_id").map_groups(_twa, batch_format="pandas")


WEIGHTED_SAMPLE_K = 100


def q_weighted_sample(sf_dir, k: int = WEIGHTED_SAMPLE_K):
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-ES): each order draws u ∈ (0,1] from md5(o_orderkey) and
    scores key = ln(u)/w with w = o_totalprice; the top-k keys are the
    sample — inclusion probability ∝ weight, yet fully reproducible (and
    therefore exactly SQL-oracle-able, unlike RNG sampling). Plan:
    per-block local top-k, then one final combine task over ≤ blocks×k
    rows — no global sort, no shuffle. ln is libm ``math.log`` on both
    sides (the engine-wide ulp-parity policy)."""

    def _keys(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_pylist()
        w = b["o_totalprice"].to_numpy(zero_copy_only=False)
        u = np.array(
            [int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) + 1
             for x in ok], np.float64) / 4294967296.0
        key = np.array([math.log(x) for x in u], np.float64) / w
        df = pd.DataFrame({"o_orderkey": ok, "key": key})
        df = df.sort_values(["key", "o_orderkey"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = T(sf_dir, "orders", ["o_orderkey", "o_totalprice"]
              ).map_batches(_keys, batch_format="pyarrow").materialize()

    @ray.remote
    def _final(refs) -> pa.Table:
        blocks = ray.get(list(refs))
        t = pa.concat_tables([b for b in blocks if b.num_rows])
        df = t.to_pandas().sort_values(
            ["key", "o_orderkey"], ascending=[False, True]).head(k)
        return pa.table({
            "o_orderkey": pa.array(df["o_orderkey"].to_numpy(np.int64)),
            "key_fp": pa.array(_round_half_away(
                df["key"].to_numpy() * 1e9).astype(np.int64)),
        })

    import ray.data as rd

    # block refs go to the combine task unresolved (plasma-shared);
    # ≤ blocks×k rows ever co-reside there, nothing lands on the driver
    ref = _final.remote(parts.to_arrow_refs())
    return rd.from_arrow_refs([ref])


def q_bloom_semi_join(sf_dir):
    """Broadcast-Bloom join pushdown — THE shuffle-avoidance pattern for
    selective joins at 100 TB: build a Bloom filter over the small
    side's keys (rich customers), OR-merge the per-block partials (only
    filter buffers move, never keys), broadcast the filter, and pre-drop
    fact rows map-side BEFORE the expensive exchange. Returns a one-row
    audit: candidate counts, false-positive rate, and the exact semi
    count — with asserted gates (zero false negatives; FP rate within 3×
    the (1−e^{−kn/m})^k analytic bound). Not SQL-expressible (the FP set
    depends on the hash), so rows-only + gates, like cms_frequency."""
    from ..functions.sketches import BLOOM_K, bloom_partial, bloom_probe

    dim = fast_groupby_agg(
        T(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
            lambda b: pa.table({
                "c_custkey":
                    b.filter(pc.greater(b["c_acctbal"], 4000.0))
                    ["c_custkey"],
            }),
            batch_format="pyarrow"),
        ["c_custkey"], {"__n": (None, "count")},
    ).drop_columns(["__n"]).materialize()
    n_keys = dim.count()
    # 16 bits/key, capped at 2^30 bits (128 MB broadcast buffer): past
    # ~67M keys the FP rate degrades rather than the buffer growing —
    # at that scale a real deployment shards the filter by key hash
    # (blocked Bloom) instead of broadcasting one buffer; the FP gate
    # below uses the ACTUAL m, so degradation is measured, not hidden
    m_bits = 1 << min(30, max(14, int(math.ceil(
        math.log2(16 * max(n_keys, 1))))))

    def _build(b: pa.Table) -> pa.Table:
        keys = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array(
            [bloom_partial(keys, m_bits).tobytes()], pa.binary())})

    words = _tree_reduce_buffers(
        dim.map_batches(_build, batch_format="pyarrow"), "w",
        np.bitwise_or, np.uint64)
    wref = ray.put(words)

    class _Probe:
        def __init__(self):
            self.words = ray.get(wref)

        def __call__(self, b: pa.Table) -> pa.Table:
            keys = b["o_custkey"].to_numpy(zero_copy_only=False)
            ok = bloom_probe(self.words, keys)
            return pa.table({
                "n": pa.array([len(b)], pa.int64()),
                "n_pass": pa.array([int(ok.sum())], pa.int64()),
            })

    orders = T(sf_dir, "orders", ["o_custkey"])
    counts = orders.map_batches(_Probe, batch_format="pyarrow",
                                concurrency=(1, 4)).to_pandas()
    n_orders, n_pass = int(counts["n"].sum()), int(counts["n_pass"].sum())
    n_exact = orders.join(dim, "left_semi", num_partitions=4,
                          on=("o_custkey",),
                          right_on=("c_custkey",)).count()
    assert n_pass >= n_exact, "Bloom dropped a true match (false negative)"
    fp = (n_pass - n_exact) / max(n_orders - n_exact, 1)
    bound = (1.0 - math.exp(-BLOOM_K * n_keys / m_bits)) ** BLOOM_K
    assert fp <= max(3 * bound, 1e-3), (fp, bound)
    return pd.DataFrame([{
        "n_orders": n_orders, "n_exact": n_exact, "n_bloom_pass": n_pass,
        "n_false_pos": n_pass - n_exact,
        "fp_rate_fp": int(_round_half_away(np.float64(fp) * 1e9)),
        "m_bits": m_bits, "k": BLOOM_K, "n_keys": n_keys,
    }])


JOIN_EST_W = 1 << 17  # inner-product noise ≈ N²/w → w must absorb N²
JOIN_EST_D = 4


def q_join_size_estimate(sf_dir):
    """Sketch-based join-cardinality estimation (the optimizer
    primitive): the self-join size of lineitem on l_partkey — Σ_k f(k)²
    — estimated as the count-min row-wise inner product min_i Σ_w
    cms[i,w]², against the exact value from the grouped counts. The CMS
    inner product never underestimates (cross-collision terms only
    add); its expected overcount is (N²−Σf²)/w ≈ N²/w, so the asserted
    gate is the analytic 3·N²/w — scale-aware, unlike a fixed ratio
    (at 10× data the noise grows 100× and a fixed-w fixed-ratio gate
    would flip). Sketch partials tree-combine (d×w int64, ~4 MB); the
    exact side's exchange carries one row per distinct key."""
    from ..functions.sketches import cms_partial

    ds = T(sf_dir, "lineitem", ["l_partkey"])

    def _partial(b: pa.Table) -> pa.Table:
        keys = b["l_partkey"].to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array(
            [cms_partial(keys, w=JOIN_EST_W, d=JOIN_EST_D).tobytes()],
            pa.binary())})

    sketch = _tree_reduce_buffers(
        ds.map_batches(_partial, batch_format="pyarrow"), "m",
        np.add, np.int64).reshape(JOIN_EST_D, JOIN_EST_W)
    est = int(min(int((row.astype(object) * row).sum()) for row in sketch))
    n_total = int(sketch[0].sum())

    counts = fast_groupby_agg(ds, ["l_partkey"], {"n": (None, "count")})
    sq = counts.map_batches(
        lambda b: pa.table({"s": pa.array(
            [int((b["n"].to_numpy(zero_copy_only=False).astype(object)
                  ** 2).sum())], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    exact = int(sq["s"].sum())
    assert est >= exact, "CMS inner product underestimated the join size"
    bound = 3.0 * n_total * n_total / JOIN_EST_W
    assert est - exact <= bound, (est, exact, bound)
    rel = (est - exact) / max(exact, 1)
    return pd.DataFrame([{
        "exact": exact, "est": est,
        "rel_err_fp": int(_round_half_away(np.float64(rel) * 1e9)),
        "d": JOIN_EST_D, "w": JOIN_EST_W,
    }])


def q_pmi_bigrams(sf_dir, min_count: int = 5):
    """Pointwise mutual information for corpus bigrams seen ≥ min_count
    times — the collocation/association-mining statistic (PMI =
    ln(c·N / (c1·c2)) with c1/c2 the first-/second-position marginals).
    Plan: the per-batch bigram counters and partial-agg sum are shared
    with bigram_stats; marginals and N are second-level aggregates over
    the ALREADY vocabulary-sized bigram table, joined back with two
    hash joins (no driver state at any cardinality). Float policy: the
    integer products stay < 2^53 so the double ratio is exact-operand
    correctly-rounded division, and ln is libm ``math.log`` on both
    sides (the engine-wide ulp-parity policy)."""
    docs = T(sf_dir, "documents", ["text"])

    def _bi(b: pa.Table) -> pa.Table:
        cnt: dict = {}
        for txt in b["text"].to_pylist():
            toks = _TOKEN.findall(txt.lower())
            for i in range(len(toks) - 1):
                k = (toks[i], toks[i + 1])
                cnt[k] = cnt.get(k, 0) + 1
        return pa.table({
            "w1": pa.array([k[0] for k in cnt], pa.string()),
            "w2": pa.array([k[1] for k in cnt], pa.string()),
            "c": pa.array(list(cnt.values()), pa.int64()),
        })

    bi = fast_groupby_agg(
        docs.map_batches(_bi, batch_format="pyarrow"),
        ["w1", "w2"], {"c": ("c", "sum")},
    ).materialize()
    heads = fast_groupby_agg(bi, ["w1"], {"c1": ("c", "sum")})
    tails = fast_groupby_agg(bi, ["w2"], {"c2": ("c", "sum")}).map_batches(
        lambda b: b.rename_columns(["w2_r", "c2"]), batch_format="pyarrow")
    nb = int(bi.map_batches(
        lambda b: pa.table({"s": pa.array(
            [int(pc.sum(b["c"]).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow").to_pandas()["s"].sum())

    j = bi.map_batches(
        lambda b: b.filter(pc.greater_equal(b["c"], min_count)),
        batch_format="pyarrow",
    ).join(heads, "inner", num_partitions=JOIN_PARTS, on=("w1",)) \
        .join(tails, "inner", num_partitions=JOIN_PARTS,
              on=("w2",), right_on=("w2_r",))

    def _pmi(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        c1 = b["c1"].to_numpy(zero_copy_only=False)
        c2 = b["c2"].to_numpy(zero_copy_only=False)
        ratio = (c * nb).astype(np.float64) / (c1 * c2).astype(np.float64)
        pmi = np.array([math.log(x) for x in ratio], np.float64)
        return pa.table({
            "w1": b["w1"], "w2": b["w2"], "c": b["c"],
            "pmi_fp": pa.array(_round_half_away(1e9 * pmi)
                               .astype(np.int64), pa.int64()),
        })

    return j.map_batches(_pmi, batch_format="pyarrow")


def q_daily_anomaly(sf_dir):
    """Seasonal-naive anomaly detection on the event stream: each day
    with a full trailing week is scored against the trailing-week
    baseline and flagged when it deviates by more than 3σ. The z-test is
    ALL-INTEGER — (n·k − S)² > 9·(S2·k − S²) is the 3σ rule
    cross-multiplied by k², so there is no float anywhere and the oracle
    matches bit-for-bit by construction. Plan: the only fact-scale work
    is the daily-count partial agg; the trailing window runs on the
    date-cardinality-bounded aggregate (days, not events)."""
    daily = fast_groupby_agg(
        T(sf_dir, "events", ["ts"]).map_batches(
            lambda b: pa.table(
                {"day": pc.strftime(b["ts"], format="%Y-%m-%d")}),
            batch_format="pyarrow"),
        ["day"], {"n": (None, "count")},
    ).to_pandas().sort_values("day").reset_index(drop=True)
    n = daily["n"].to_numpy(np.int64)
    k = 7
    s = pd.Series(n).rolling(k).sum().shift(1).to_numpy()
    s2 = pd.Series(n * n).rolling(k).sum().shift(1).to_numpy()
    full = ~np.isnan(s)
    s_i = np.where(full, s, 0).astype(np.int64)
    s2_i = np.where(full, s2, 0).astype(np.int64)
    dev_sq = (n * k - s_i) ** 2
    thr = 9 * (s2_i * k - s_i * s_i)
    out = pd.DataFrame({
        "day": daily["day"][full],
        "n": n[full],
        "dev_sq": dev_sq[full],
        "thr": thr[full],
        "is_anomaly": (dev_sq > thr)[full],
    })
    return out.sort_values("day").reset_index(drop=True)


def q_q6_band_revenue(sf_dir):
    """TPC-H Q6 shape: forecast-revenue-change — one tight filter band
    (ship year 1996, discount ∈ [0.05, 0.07], quantity < 24) and a
    global sum of price·discount. The per-row product is ONE float
    multiply quantized ×1e4 before the integer sum, so block/batch
    association order cannot move the result. Plan: pure filtered
    map + partial sums; the only thing that ever moves is one int pair
    per block."""
    ds = T(sf_dir, "lineitem",
           ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    lo = np.datetime64("1996-01-01").astype("datetime64[ns]").view("int64")
    hi = np.datetime64("1997-01-01").astype("datetime64[ns]").view("int64")

    def _band(b: pa.Table) -> pa.Table:
        ship = _ts_ns(b["l_shipdate"])
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        keep = ((ship >= lo) & (ship < hi)
                & (disc >= 0.05) & (disc <= 0.07) & (qty < 24.0))
        fp = _round_half_away(
            price[keep] * disc[keep] * 1e4).astype(np.int64)
        return pa.table({
            "revenue_fp": pa.array([int(fp.sum())], pa.int64()),
            "n_rows": pa.array([int(keep.sum())], pa.int64()),
        })

    parts = ds.map_batches(_band, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([{
        "revenue_fp": int(parts["revenue_fp"].sum()),
        "n_rows": int(parts["n_rows"].sum()),
    }])


def q_ship_delay_distribution(sf_dir):
    """Order-to-ship latency distribution: exact integer day deltas
    between o_orderdate and l_shipdate, counted per delay — the
    fulfillment-SLA histogram. This is the one genuine FACT⋈FACT join
    in the suite (lineitem⋈orders): both sides are projected to
    (key, epoch-day) BEFORE the hash exchange, and the second groupby
    runs on the tiny delay domain."""
    li = T(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        lambda b: pa.table({
            "l_orderkey": b["l_orderkey"],
            "ship_day": pa.array(
                _ts_ns(b["l_shipdate"]) // 86_400_000_000_000, pa.int64()),
        }),
        batch_format="pyarrow")
    orders = T(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pa.table({
            "o_orderkey": b["o_orderkey"],
            "order_day": pa.array(
                _ts_ns(b["o_orderdate"]) // 86_400_000_000_000, pa.int64()),
        }),
        batch_format="pyarrow")
    j = li.join(orders, "inner", num_partitions=JOIN_PARTS,
                on=("l_orderkey",), right_on=("o_orderkey",))
    d = j.map_batches(
        lambda b: pa.table({
            "delay_days": pc.subtract(b["ship_day"], b["order_day"]),
        }),
        batch_format="pyarrow")
    return fast_groupby_agg(d, ["delay_days"], {"n": (None, "count")})


def q_promo_revenue_ratio(sf_dir):
    """TPC-H Q14 shape: per ship-month, the share of revenue from PROMO
    parts (×1e9). Plan: part is a TRUE dimension (does not grow with
    fact data) — its partkey→is-promo map broadcasts once per actor and
    the fact side folds to (month, promo_fp, total_fp) partials
    map-side; the exchange carries one row per (block × month). The
    final ratio divides two exact integer cent-sums (double/double,
    mirrored)."""
    pref = ray.put(
        T(sf_dir, "part", ["p_partkey", "p_type"]).to_arrow_refs())

    class _Fold:
        def __init__(self):
            t = pa.concat_tables(ray.get(ray.get(pref)))
            self.keys = t["p_partkey"].combine_chunks()
            self.promo = pc.equal(t["p_type"], "PROMO").combine_chunks()

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b["l_partkey"], value_set=self.keys)
            is_promo = self.promo.take(idx).to_numpy(zero_copy_only=False)
            month = pc.strftime(b["l_shipdate"], format="%Y-%m")
            fp = _round_half_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            df = pd.DataFrame({
                "month": month.to_pandas(),
                "promo_fp": np.where(is_promo, fp, 0),
                "total_fp": fp,
            })
            g = df.groupby("month", sort=False).sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

    folded = T(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice"]).map_batches(
        _Fold, batch_format="pyarrow", concurrency=(1, 4))
    agg = fast_groupby_agg(folded, ["month"], {
        "promo_fp": ("promo_fp", "sum"), "total_fp": ("total_fp", "sum"),
    })

    def _ratio(b: pa.Table) -> pa.Table:
        p = b["promo_fp"].to_numpy(zero_copy_only=False)
        t = b["total_fp"].to_numpy(zero_copy_only=False)
        r = 1e9 * (p.astype(np.float64) / t.astype(np.float64))
        return b.append_column(
            "ratio_fp", pa.array(_round_half_away(r).astype(np.int64)))

    return agg.map_batches(_ratio, batch_format="pyarrow")


def q_standardize(sf_dir):
    """Per-group z-score feature scaling (the tabular-ML preprocessing
    stage): every event's value standardized against its event_type's
    mean/std, ×1e6 fixed point. Values are ×100 integer cents; the
    per-group moments (n, Σv, Σv²) are exact integers from one
    partial-agg groupby; the per-row float expression is mirrored
    op-for-op in the oracle (sub, div, sqrt are IEEE correctly-rounded).
    Plan: event_type is a bounded domain → the 3-number moments
    broadcast; the fact side is one pure map pass."""
    ds = T(sf_dir, "events", ["event_id", "event_type", "value"])

    def _v(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "v": pa.array(v, pa.int64()),
            "v2": pa.array(v * v, pa.int64()),
        })

    fp = ds.map_batches(_v, batch_format="pyarrow").materialize()
    mom = fast_groupby_agg(fp, ["event_type"], {
        "n": (None, "count"), "s": ("v", "sum"), "s2": ("v2", "sum"),
    }).to_pandas()
    mref = ray.put({
        r["event_type"]: (int(r["n"]), int(r["s"]), int(r["s2"]))
        for _, r in mom.iterrows()
    })

    class _Z:
        def __init__(self):
            self.m = ray.get(mref)

        def __call__(self, b: pa.Table) -> pa.Table:
            et = pd.Series(b["event_type"].to_pylist())
            n = et.map({k: v[0] for k, v in self.m.items()}).to_numpy(
                np.float64)
            s = et.map({k: v[1] for k, v in self.m.items()}).to_numpy(
                np.float64)
            s2 = et.map({k: v[2] for k, v in self.m.items()}).to_numpy(
                np.float64)
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.float64)
            z = (v - s / n) / np.sqrt((s2 - s * s / n) / n)
            return pa.table({
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "z_fp": pa.array(_round_half_away(1e6 * z)
                                 .astype(np.int64), pa.int64()),
            })

    return fp.drop_columns(["v2"]).map_batches(
        _Z, batch_format="pyarrow", concurrency=(1, 4))


def q_train_val_test_split(sf_dir):
    """Deterministic train/val/test corpus split (80/10/10 by
    md5(doc_id) bucket) audited per source — the holdout-assignment
    stage every training pipeline needs to be reproducible across runs
    and machines (hash-based, NOT RNG-based, so adding documents never
    reshuffles existing assignments). Plan: pure map + one tiny
    (source × split) partial-agg groupby."""
    ds = T(sf_dir, "documents", ["doc_id", "source"])

    def _split(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        bucket = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10
             for i in ids], np.int64)
        split = np.where(bucket < 8, "train",
                         np.where(bucket == 8, "val", "test"))
        return pa.table({
            "source": b["source"],
            "split": pa.array(split.tolist(), pa.string()),
        })

    return fast_groupby_agg(
        ds.map_batches(_split, batch_format="pyarrow"),
        ["source", "split"], {"n": (None, "count")},
    )


def q_quality_top_quartile(sf_dir):
    """Per-source quality gating at a percentile threshold: keep the
    documents whose n_chars exceeds their source's p75 (rank rule:
    value at row ceil(0.75·n) of the sorted multiset — tie-order-free,
    pinned in the oracle). The curriculum/quality-mixing primitive.
    Plan: per-source distinct-value histogram (one partial-agg
    exchange, |sources|×|distinct n_chars| rows), thresholds from the
    tiny CDF, broadcast dict, pure filter map — the raw corpus is
    scanned twice but never sorted or shuffled."""
    docs = T(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    hist = fast_groupby_agg(
        docs.drop_columns(["doc_id"]), ["source", "n_chars"],
        {"cnt": (None, "count")},
    ).to_pandas()
    thresholds = {}
    for src, g in hist.groupby("source"):
        g = g.sort_values("n_chars")
        cum = g["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        r = max(1, math.ceil(0.75 * n))
        thresholds[src] = int(
            g["n_chars"].to_numpy()[np.searchsorted(cum, r)])
    tref = ray.put(thresholds)

    class _Gate:
        def __init__(self):
            self.thr = ray.get(tref)

        def __call__(self, b: pa.Table) -> pa.Table:
            thr = pd.Series(b["source"].to_pylist()).map(self.thr) \
                .to_numpy(np.int64)
            keep = b["n_chars"].to_numpy(zero_copy_only=False) > thr
            return b.filter(pa.array(keep))

    return docs.map_batches(_Gate, batch_format="pyarrow",
                            concurrency=(1, 4))


def q_schema_evolution_read(sf_dir):
    """Schema-evolution tolerant store read: epoch-1 parquet was written
    BEFORE a column existed (even orderkeys: o_orderkey, o_totalprice),
    epoch-2 after (odd orderkeys: + o_orderpriority); the reader must
    union-by-name, back-filling NULL for pre-evolution rows — the
    ingest reality of every long-lived 100-TB store. The engine writes
    both epochs (real files), reads each with its own schema, aligns,
    unions, and aggregates; the oracle derives the identical result from
    the base table (pre-evolution rows ⇒ NULL priority), so it needs no
    filesystem state."""
    import os
    import shutil

    import ray.data as rd

    root = f"/tmp/fcray_schemaevo_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_orderpriority"])
    orders.map_batches(
        lambda b: b.filter(
            pc.equal(pc.bit_wise_and(b["o_orderkey"], 1), 0)
        ).select(["o_orderkey", "o_totalprice"]),
        batch_format="pyarrow",
    ).write_parquet(f"{root}/epoch1")
    orders.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b["o_orderkey"], 1),
                                    1)),
        batch_format="pyarrow",
    ).write_parquet(f"{root}/epoch2")

    v1 = rd.read_parquet(f"{root}/epoch1").map_batches(
        lambda b: b.append_column(
            "o_orderpriority", pa.nulls(len(b), pa.string())),
        batch_format="pyarrow")
    v2 = rd.read_parquet(f"{root}/epoch2").map_batches(
        lambda b: b.select(["o_orderkey", "o_totalprice",
                            "o_orderpriority"]),
        batch_format="pyarrow")
    both = v1.union(v2).map_batches(
        lambda b: pa.table({
            "o_orderpriority_u": b["o_orderpriority"],
            "fp": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        }),
        batch_format="pyarrow")
    out = fast_groupby_agg(both, ["o_orderpriority_u"], {
        "n": (None, "count"), "tot_fp": ("fp", "sum"),
    }).materialize()
    shutil.rmtree(root, ignore_errors=True)
    return out


INCR_AGG_CUTOFF = "1999-01-01"


def q_incremental_agg(sf_dir):
    """Incremental aggregate maintenance (the streaming-warehouse
    pattern): a 'materialized' monthly-revenue base built from orders
    BEFORE the cutoff is updated with the late-arriving delta (orders at
    or after it) by MERGING partial sums — never recomputing the base.
    Because the partials are exact ×100 integers, merge == full
    recompute bit-for-bit, which is exactly what the oracle (a plain
    full-table aggregate) checks. The delta pass scans ONLY delta rows;
    the merge exchanges one row per (month, side)."""
    cutoff = np.datetime64(INCR_AGG_CUTOFF).astype(
        "datetime64[ns]").view("int64")

    def _part(lo: bool):
        def _f(b: pa.Table) -> pa.Table:
            d = _ts_ns(b["o_orderdate"])
            keep = d < cutoff if lo else d >= cutoff
            t = b.filter(pa.array(keep))
            return pa.table({
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "rev_fp": pa.array(_round_half_away(
                    t["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64), pa.int64()),
                "n": pa.array(np.ones(len(t), np.int64), pa.int64()),
            })
        return _f

    orders = T(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    base = fast_groupby_agg(
        orders.map_batches(_part(True), batch_format="pyarrow"),
        ["month"], {"rev_fp": ("rev_fp", "sum"), "n": ("n", "sum")})
    delta = fast_groupby_agg(
        orders.map_batches(_part(False), batch_format="pyarrow"),
        ["month"], {"rev_fp": ("rev_fp", "sum"), "n": ("n", "sum")})
    # merge = one more mergeable partial-agg over the two tiny sides
    return fast_groupby_agg(
        base.union(delta), ["month"],
        {"rev_fp": ("rev_fp", "sum"), "n": ("n", "sum")})


KCORE_K = 14
KCORE_MAX_SINGLE_EDGES = 20_000_000
KCORE_MAX_ROUNDS = 200


@ray.remote
def _kcore_task(k: int, *tables: pa.Table) -> pa.Table:
    """Single-task k-core peel over the collected normalized edge list
    (guard: KCORE_MAX_SINGLE_EDGES): repeatedly drop nodes with
    within-subgraph degree < k until fixpoint — O(rounds · |E|)
    vectorized bincounts."""
    live_t = live_arrow(tables)
    t = pa.concat_tables(live_t)
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    n = int(max(u.max(), v.max())) + 1 if len(u) else 0
    live = np.ones(len(u), bool)
    for _ in range(KCORE_MAX_ROUNDS):
        deg = (np.bincount(u[live], minlength=n)
               + np.bincount(v[live], minlength=n))
        bad = (deg > 0) & (deg < k)
        if not bad.any():
            break
        live &= ~(bad[u] | bad[v])
    deg = (np.bincount(u[live], minlength=n)
           + np.bincount(v[live], minlength=n))
    nodes = np.flatnonzero(deg >= k)
    return pa.table({
        "node": pa.array(nodes.astype(np.int64), pa.int64()),
        "core_deg": pa.array(deg[nodes].astype(np.int64), pa.int64()),
    })


def q_graph_kcore(sf_dir, k: int = KCORE_K,
                  max_single_edges: int = KCORE_MAX_SINGLE_EDGES):
    """K-core decomposition (k=14) of the derived order graph — the
    community/spam-filter graph primitive next to pagerank/BFS/
    triangles: iteratively peel nodes whose within-subgraph degree is
    below k until fixpoint. Dual tier: under the edge guard one task
    peels the collected edge list with vectorized bincounts; above it,
    each round is a degree partial-agg + two hash ``left_semi`` joins
    that keep only edges with BOTH endpoints live (exchange carries
    key-sized node sets, never raw degrees×rows). Both tiers are pinned
    identical by test. Asserted gates (rows-only — peeling is not
    SQL-expressible): every output node has within-core degree ≥ k, and
    one extra peel round removes nothing (fixpoint ⇒ maximality)."""
    import ray.data as rd

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

    if edges.count() <= max_single_edges:
        out = rd.from_arrow_refs(
            [_kcore_task.remote(k, *edges.to_arrow_refs())]).materialize()
    else:
        out = _kcore_join_tier(edges, k)

    # in-query invariant gates: ≥k within-core degree always; the full
    # fixpoint re-check collects the edge table, so it only runs under
    # the same edge guard as the single-task tier (above it the join
    # tier's own termination condition — a round that removed nothing —
    # IS the fixpoint proof, no driver copy needed)
    df = out.to_pandas()
    assert (df["core_deg"] >= k).all() or df.empty, "sub-k node in core"
    if edges.count() <= max_single_edges:
        core = df["node"].to_numpy(np.int64)
        et = pa.concat_tables(
            [b for b in ray.get(edges.to_arrow_refs()) if b.num_rows])
        uu = et["u"].to_numpy(zero_copy_only=False)
        vv = et["v"].to_numpy(zero_copy_only=False)
        inc = np.isin(uu, core) & np.isin(vv, core)
        degc = np.bincount(uu[inc], minlength=n) + np.bincount(
            vv[inc], minlength=n)
        assert not ((degc > 0) & (degc < k)).any(), "not a fixpoint"
    return out


def _kcore_join_tier(edges, k: int, num_partitions: int = 8):
    """Distributed peel: per round, degree partial-agg over live edges →
    live node set (≥k) → two semi joins keep edges with both endpoints
    live. Terminates when the edge count stops shrinking."""
    import ray.data as rd

    live = edges.materialize()
    prev = live.count()
    for _ in range(KCORE_MAX_ROUNDS):
        both = live.map_batches(
            lambda b: pa.table({"node": pa.concat_arrays([
                b["u"].combine_chunks() if isinstance(b["u"],
                                                      pa.ChunkedArray)
                else b["u"],
                b["v"].combine_chunks() if isinstance(b["v"],
                                                      pa.ChunkedArray)
                else b["v"]])}),
            batch_format="pyarrow")
        deg = fast_groupby_agg(both, ["node"], {"deg": (None, "count")})
        keep = deg.map_batches(
            lambda b: b.filter(pc.greater_equal(b["deg"], k))
                       .select(["node"]),
            batch_format="pyarrow").materialize()
        live = live.join(keep, "left_semi", num_partitions=num_partitions,
                         on=("u",), right_on=("node",)) \
                   .join(keep, "left_semi", num_partitions=num_partitions,
                         on=("v",), right_on=("node",)).materialize()
        cur = live.count()
        if cur == prev:
            break
        prev = cur
    both = live.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays([
            b["u"].combine_chunks() if isinstance(b["u"], pa.ChunkedArray)
            else b["u"],
            b["v"].combine_chunks() if isinstance(b["v"], pa.ChunkedArray)
            else b["v"]])}),
        batch_format="pyarrow")
    return fast_groupby_agg(both, ["node"], {"core_deg": (None, "count")})


def q_time_to_convert(sf_dir):
    """Conversion latency: per user, milliseconds from their FIRST
    'view' to the first 'purchase' at-or-after it — the funnel-timing
    KPI. All-integer epoch-ms, so exact. Plan: grouped-min first-view
    (key-sized), hash join against map-side-filtered purchases, then
    min(p_ms − v_ms) per user — one exchange of purchase rows, one of
    user-level aggregates; no per-group Python anywhere."""
    ev = T(sf_dir, "events", ["user_id", "ts", "event_type"])

    def _typed(kind):
        def _f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b["event_type"], kind))
            return pa.table({
                "user_id": t["user_id"],
                "ms": pa.array(_ts_ns(t["ts"]) // 1_000_000, pa.int64()),
            })
        return _f

    fv = fast_groupby_agg(
        ev.map_batches(_typed("view"), batch_format="pyarrow"),
        ["user_id"], {"v_ms": ("ms", "min")},
    ).map_batches(lambda b: b.rename_columns(["uid_r", "v_ms"]),
                  batch_format="pyarrow")
    j = ev.map_batches(_typed("purchase"), batch_format="pyarrow").join(
        fv, "inner", num_partitions=JOIN_PARTS,
        on=("user_id",), right_on=("uid_r",))
    diffs = j.map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "d": pc.subtract(b["ms"], b["v_ms"]),
        }).filter(pc.greater_equal(
            pc.subtract(b["ms"], b["v_ms"]), 0)),
        batch_format="pyarrow")
    return fast_groupby_agg(diffs, ["user_id"], {"ttc_ms": ("d", "min")})


def q_first_touch_attribution(sf_dir):
    """First-touch attribution: every purchase credits the channel (the
    event_type of its user's FIRST event by (ts, event_id)); output
    purchases per channel. Plan: the mergeable grouped first/last
    aggregate (stages/fastagg.grouped_first_last — per-block partials,
    tree combine, no per-group Python) produces one (user, first
    channel) row, purchases pre-count map-side to one row per user, and
    the two key-sized aggregates hash-join before a tiny rollup."""
    from ..stages.fastagg import grouped_first_last

    ev = T(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    first = grouped_first_last(ev, ["user_id"], "event_type",
                               ["ts", "event_id"]).map_batches(
        lambda b: pa.table({
            "uid_r": b["user_id"],
            "channel": b["first_value"],
        }),
        batch_format="pyarrow")
    purchases = fast_groupby_agg(
        ev.map_batches(
            lambda b: pa.table({
                "user_id":
                    b.filter(pc.equal(b["event_type"], "purchase"))
                    ["user_id"],
            }),
            batch_format="pyarrow"),
        ["user_id"], {"n_purch": (None, "count")},
    )
    j = purchases.join(first, "inner", num_partitions=JOIN_PARTS,
                       on=("user_id",), right_on=("uid_r",))
    return fast_groupby_agg(j, ["channel"], {
        "n_purchases": ("n_purch", "sum"),
        "n_users": (None, "count"),
    })


def _rank_thresholds(vals: np.ndarray, cnts: np.ndarray,
                     qs=(0.25, 0.5, 0.75)) -> list[int]:
    """Quartile thresholds by the engine-wide rank rule (value at row
    ceil(q·n) of the sorted multiset) from a distinct-value CDF."""
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    return [int(vals[np.searchsorted(cum, max(1, math.ceil(q * n)))])
            for q in qs]


def q_rfm_segments(sf_dir):
    """RFM customer segmentation: recency (days since last order,
    quartile-bucketed), frequency (order count, quartile-bucketed),
    monetary (total cents, decimal-digit band) — counts per segment.
    Bucket rule: 1 + Σ[v > t_q] with t_q the rank-rule quartiles, so
    ties are deterministic and the oracle states the same arithmetic.
    Scale plan: one per-customer partial-agg groupby; the quartiles come
    from SMALL-DOMAIN distinct-value CDFs (days, order counts — bounded
    domains, not customer-sized); the monetary band is a pure function
    (digit count) needing no quantile at all."""
    orders = T(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "day": pa.array(_ts_ns(b["o_orderdate"])
                            // 86_400_000_000_000, pa.int64()),
            "cents": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    per_cust = fast_groupby_agg(
        orders.map_batches(_fp, batch_format="pyarrow"),
        ["o_custkey"], {
            "last_day": ("day", "max"),
            "f": (None, "count"),
            "m_cents": ("cents", "sum"),
        }).materialize()
    ref_day = int(fast_groupby_agg(
        per_cust.map_batches(
            lambda b: pa.table({"k": pa.array([0] * len(b), pa.int64()),
                                "d": b["last_day"]}),
            batch_format="pyarrow"),
        ["k"], {"mx": ("d", "max")}).to_pandas()["mx"].iloc[0])

    rec = per_cust.map_batches(
        lambda b: pa.table({
            "r": pc.subtract(np.int64(ref_day), b["last_day"]),
            "f": b["f"],
        }),
        batch_format="pyarrow").materialize()
    r_hist = fast_groupby_agg(rec, ["r"], {"c": (None, "count")}
                              ).to_pandas()
    f_hist = fast_groupby_agg(rec, ["f"], {"c": (None, "count")}
                              ).to_pandas()
    r_t = _rank_thresholds(r_hist["r"].to_numpy(np.int64),
                           r_hist["c"].to_numpy(np.int64))
    f_t = _rank_thresholds(f_hist["f"].to_numpy(np.int64),
                           f_hist["c"].to_numpy(np.int64))
    tref = ray.put((ref_day, r_t, f_t))

    class _Seg:
        def __init__(self):
            self.ref_day, self.r_t, self.f_t = ray.get(tref)

        def __call__(self, b: pa.Table) -> pa.Table:
            r = self.ref_day - b["last_day"].to_numpy(zero_copy_only=False)
            f = b["f"].to_numpy(zero_copy_only=False)
            m = b["m_cents"].to_numpy(zero_copy_only=False)
            rb = 1 + sum((r > t).astype(np.int64) for t in self.r_t)
            fb = 1 + sum((f > t).astype(np.int64) for t in self.f_t)
            mb = np.char.str_len(m.astype("U"))  # decimal digit count
            return pa.table({
                "r_bucket": pa.array(rb, pa.int64()),
                "f_bucket": pa.array(fb, pa.int64()),
                "m_band": pa.array(mb.astype(np.int64), pa.int64()),
            })

    seg = per_cust.map_batches(_Seg, batch_format="pyarrow",
                               concurrency=(1, 4))
    return fast_groupby_agg(seg, ["r_bucket", "f_bucket", "m_band"],
                            {"n_custs": (None, "count")})


def q_returned_revenue_topk(sf_dir, k: int = 20):
    """TPC-H Q10 shape: the top-k customers by revenue lost to returned
    line items (l_returnflag = 'R'), with nation name. Plan: lineitem is
    filtered + ×100-quantized + pre-aggregated to (orderkey, cents)
    MAP-SIDE, hash-joined to orders (→ custkey), re-aggregated per
    customer, top-k via the mergeable grouped top-1-style partial sort
    (distributed sort + limit on the tiny aggregate), and the 25-row
    nation dimension broadcast for the name."""
    li = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_orderkey", "l_returnflag", "l_extendedprice"]).map_batches(
            lambda b: (lambda t: pa.table({
                "l_orderkey": t["l_orderkey"],
                "cents": pa.array(_round_half_away(
                    t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64), pa.int64()),
            }))(b.filter(pc.equal(b["l_returnflag"], "R"))),
            batch_format="pyarrow"),
        ["l_orderkey"], {"cents": ("cents", "sum")},
    )
    j = li.join(
        T(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        "inner", num_partitions=JOIN_PARTS,
        on=("l_orderkey",), right_on=("o_orderkey",))
    per_cust = fast_groupby_agg(j, ["o_custkey"],
                                {"lost_fp": ("cents", "sum")})
    cust = per_cust.join(
        T(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))
    names = dict(zip(
        *(T(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
          [c].tolist() for c in ("n_nationkey", "n_name"))))
    top = cust.sort(["lost_fp", "o_custkey"],
                    descending=[True, False]).limit(k).to_pandas()
    top["n_name"] = top["c_nationkey"].map(names)
    return top[["o_custkey", "n_name", "lost_fp"]].reset_index(drop=True)


SUPPLIER_MAX_BROADCAST = 2_000_000


def q_supplier_nation_profit(sf_dir,
                             max_broadcast: int = SUPPLIER_MAX_BROADCAST):
    """TPC-H Q9 shape: profit per supplier nation per order year, with
    profit = Σ(extendedprice·(1−discount)) over line items, ×100 fixed
    point quantized per row (one mirrored float expression) before the
    integer sums. Plan: suppkey→nation broadcasts below
    SUPPLIER_MAX_BROADCAST (supplier GROWS with the dataset, unlike
    nation — same guard class as region_revenue); above it the supplier
    keys hash-join instead. The year comes from a hash join against
    orders pre-projected to (orderkey, year) — the only unavoidable
    fact-sized exchange."""
    nat = dict(zip(
        *(T(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
          [c].tolist() for c in ("n_nationkey", "n_name"))))
    sup_ds = T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    if sup_ds.count() > max_broadcast:
        # supplier grows with the dataset (unlike nation): above the
        # guard ship only the 25-row nation map and hash-join the
        # supplier keys instead of broadcasting them
        named = sup_ds.map_batches(
            lambda b: pa.table({
                "sk_r": b["s_suppkey"],
                "n_name": pa.array(
                    pd.Series(b["s_nationkey"].to_numpy(
                        zero_copy_only=False)).map(nat).tolist(),
                    pa.string()),
            }),
            batch_format="pyarrow")
        li = T(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"]).map_batches(
            lambda b: pa.table({
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "profit_fp": pa.array(_round_half_away(
                    b["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * (1.0 - b["l_discount"].to_numpy(
                        zero_copy_only=False)) * 100.0
                ).astype(np.int64), pa.int64()),
            }),
            batch_format="pyarrow",
        ).join(named, "inner", num_partitions=JOIN_PARTS,
               on=("l_suppkey",), right_on=("sk_r",))
        years = T(sf_dir, "orders",
                  ["o_orderkey", "o_orderdate"]).map_batches(
            lambda b: pa.table({
                "o_orderkey": b["o_orderkey"],
                "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
            }),
            batch_format="pyarrow")
        j = li.join(years, "inner", num_partitions=JOIN_PARTS,
                    on=("l_orderkey",), right_on=("o_orderkey",))
        return fast_groupby_agg(j, ["n_name", "o_year"], {
            "profit_fp": ("profit_fp", "sum"),
            "n_items": (None, "count"),
        })
    sup = sup_ds.to_pandas()
    s2n = ray.put({int(r["s_suppkey"]): nat[int(r["s_nationkey"])]
                   for _, r in sup.iterrows()})

    class _Profit:
        def __init__(self):
            self.s2n = ray.get(s2n)

        def __call__(self, b: pa.Table) -> pa.Table:
            price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = b["l_discount"].to_numpy(zero_copy_only=False)
            fp = _round_half_away(
                price * (1.0 - disc) * 100.0).astype(np.int64)
            names = pd.Series(
                b["l_suppkey"].to_numpy(zero_copy_only=False)
            ).map(self.s2n)
            return pa.table({
                "l_orderkey": b["l_orderkey"],
                "n_name": pa.array(names.tolist(), pa.string()),
                "profit_fp": pa.array(fp, pa.int64()),
            })

    li = T(sf_dir, "lineitem",
           ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
           ).map_batches(_Profit, batch_format="pyarrow",
                         concurrency=(1, 4))
    years = T(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
        }),
        batch_format="pyarrow")
    j = li.join(years, "inner", num_partitions=JOIN_PARTS,
                on=("l_orderkey",), right_on=("o_orderkey",))
    return fast_groupby_agg(j, ["n_name", "o_year"], {
        "profit_fp": ("profit_fp", "sum"), "n_items": (None, "count"),
    })


def q_disjunctive_band_revenue(sf_dir):
    """TPC-H Q19 shape: revenue from line items matching ANY of three
    (part-attribute band × quantity band) disjuncts — the
    multi-predicate pushdown pattern where the dimension attributes
    must reach the fact scan BEFORE filtering. Plan: part is a true
    dimension → broadcast (type, size) per partkey; one map pass
    evaluates the OR of the three bands vectorized and quantizes
    ×100 before the integer partial sums."""
    pref = ray.put(
        T(sf_dir, "part", ["p_partkey", "p_type", "p_size"]
          ).to_arrow_refs())

    class _Bands:
        def __init__(self):
            t = pa.concat_tables(ray.get(ray.get(pref)))
            self.keys = t["p_partkey"].combine_chunks()
            self.types = t["p_type"].combine_chunks()
            self.sizes = t["p_size"].combine_chunks()

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b["l_partkey"], value_set=self.keys)
            ptype = np.asarray(self.types.take(idx))
            psize = self.sizes.take(idx).to_numpy(zero_copy_only=False)
            qty = b["l_quantity"].to_numpy(zero_copy_only=False)
            keep = (
                ((ptype == "PROMO") & (qty >= 1.0) & (qty <= 11.0))
                | ((ptype == "SMALL") & (psize >= 1) & (psize <= 25)
                   & (qty >= 10.0) & (qty <= 20.0))
                | ((ptype == "LARGE") & (psize >= 10)
                   & (qty >= 20.0) & (qty <= 30.0))
            )
            price = b["l_extendedprice"].to_numpy(
                zero_copy_only=False)[keep]
            disc = b["l_discount"].to_numpy(zero_copy_only=False)[keep]
            fp = _round_half_away(
                price * (1.0 - disc) * 100.0).astype(np.int64)
            return pa.table({
                "revenue_fp": pa.array([int(fp.sum())], pa.int64()),
                "n_rows": pa.array([int(keep.sum())], pa.int64()),
            })

    parts = T(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice",
               "l_discount"]).map_batches(
        _Bands, batch_format="pyarrow", concurrency=(1, 4)).to_pandas()
    return pd.DataFrame([{
        "revenue_fp": int(parts["revenue_fp"].sum()),
        "n_rows": int(parts["n_rows"].sum()),
    }])


ZORDER_BITS = 20
ZORDER_BLOCK_SHIFT = 28
# the audited 2-D range predicate: custkey band × order-day band
ZORDER_RANGE = (2_000, 4_000, 9_500, 10_500)


def q_zorder_layout(sf_dir):
    """Z-order (Morton) layout audit — the data-layout half of the
    100-TB story: interleave the bits of (custkey, order-day) into a
    space-filling key, bucket rows into coarse z-blocks, and emit each
    block's zone map (min/max of BOTH dimensions) plus whether a fixed
    2-D range predicate can PRUNE it (zone map disjoint from the
    range). Under a z-sorted layout both dimensions cluster, so a 2-D
    range touches O(√blocks) instead of all of them — the measurable
    claim this operator audits. All-integer (bit ops only), so the
    oracle (unrolled bit-interleave in SQL) matches exactly."""
    x_lo, x_hi, y_lo, y_hi = ZORDER_RANGE

    def _z(b: pa.Table) -> pa.Table:
        x = (b["o_custkey"].to_numpy(zero_copy_only=False)
             % (1 << ZORDER_BITS)).astype(np.int64)
        y = ((_ts_ns(b["o_orderdate"]) // 86_400_000_000_000)
             % (1 << ZORDER_BITS)).astype(np.int64)
        z = np.zeros(len(x), np.int64)
        for i in range(ZORDER_BITS):
            z |= (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1)
                                                << (2 * i + 1))
        return pa.table({
            "zblock": pa.array(z >> ZORDER_BLOCK_SHIFT, pa.int64()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        })

    blocks = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            _z, batch_format="pyarrow"),
        ["zblock"], {
            "n_rows": (None, "count"),
            "min_x": ("x", "min"), "max_x": ("x", "max"),
            "min_y": ("y", "min"), "max_y": ("y", "max"),
        })

    def _touch(b: pa.Table) -> pa.Table:
        touched = pc.and_(
            pc.and_(pc.less_equal(b["min_x"], x_hi),
                    pc.greater_equal(b["max_x"], x_lo)),
            pc.and_(pc.less_equal(b["min_y"], y_hi),
                    pc.greater_equal(b["max_y"], y_lo)))
        return b.append_column("touched", touched)

    return blocks.map_batches(_touch, batch_format="pyarrow")


def q_q3_shipping_priority(sf_dir, k: int = 10):
    """TPC-H Q3 shape: top unshipped-revenue orders for one market
    segment — customers in BUILDING, orders placed before the cutoff,
    revenue restricted to line items shipped after it. Plan: lineitem
    quantizes price·(1−disc) ×100 per row and pre-aggregates to one
    (orderkey, revenue) row MAP-SIDE before any exchange; orders is
    semi-filtered against the BUILDING customers by hash join (customer
    grows with the dataset — never broadcast); the final top-k sorts the
    per-order aggregate (≤ |orders| rows), never raw lineitem."""
    cutoff = np.datetime64("1998-07-01").astype(
        "datetime64[ns]").view("int64")

    def _rev(b: pa.Table) -> pa.Table:
        t = b.filter(pa.array(_ts_ns(b["l_shipdate"]) > cutoff))
        fp = _round_half_away(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "revenue_fp": pa.array(fp, pa.int64())})

    li = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
          ).map_batches(_rev, batch_format="pyarrow"),
        ["l_orderkey"], {"revenue_fp": ("revenue_fp", "sum")})
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate",
                "o_orderpriority"]).map_batches(
        lambda b: b.filter(pa.array(_ts_ns(b["o_orderdate"]) < cutoff)),
        batch_format="pyarrow")
    bld = T(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], "BUILDING"))
                   .select(["c_custkey"]),
        batch_format="pyarrow")
    orders = orders.join(bld, "inner", num_partitions=JOIN_PARTS,
                         on=("o_custkey",), right_on=("c_custkey",))
    j = li.join(orders, "inner", num_partitions=JOIN_PARTS,
                on=("l_orderkey",), right_on=("o_orderkey",))
    top = j.sort(["revenue_fp", "l_orderkey"],
                 descending=[True, False]).limit(k).to_pandas()
    return top[["l_orderkey", "o_orderdate", "o_orderpriority",
                "revenue_fp"]].reset_index(drop=True)


def q_q7_nation_trade_volume(sf_dir):
    """TPC-H Q7 shape: shipping volume between every (supplier nation,
    customer nation) pair per ship year, cross-nation pairs only. Plan:
    the 25-row nation name map rides inside each projection closure (a
    true fixed-size dimension); supplier and customer both GROW with
    the dataset, so each attaches its nation via hash join — never a
    broadcast; lineitem folds price·(1−disc) ×100 per row before the
    join chain lineitem⋈supplier⋈orders⋈customer. The final groupby is
    over ≤ 25·25·|years| keys."""
    nat = dict(zip(
        *(T(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
          [c].tolist() for c in ("n_nationkey", "n_name"))))

    def _name_col(col, b):
        return pa.array(pd.Series(
            b[col].to_numpy(zero_copy_only=False)).map(nat).tolist(),
            pa.string())

    sup = T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: pa.table({"s_suppkey": b["s_suppkey"],
                            "supp_nation": _name_col("s_nationkey", b)}),
        batch_format="pyarrow")
    cust = T(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"],
                            "cust_nation": _name_col("c_nationkey", b)}),
        batch_format="pyarrow")
    oc = T(sf_dir, "orders", ["o_orderkey", "o_custkey"]).join(
        cust, "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))

    def _fold(b: pa.Table) -> pa.Table:
        fp = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0).astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "l_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
            "volume_fp": pa.array(fp, pa.int64()),
        })

    li = T(sf_dir, "lineitem",
           ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
            "l_discount"]).map_batches(_fold, batch_format="pyarrow")
    j = li.join(sup, "inner", num_partitions=JOIN_PARTS, on=("l_suppkey",),
                right_on=("s_suppkey",))
    j = j.join(oc, "inner", num_partitions=JOIN_PARTS, on=("l_orderkey",),
               right_on=("o_orderkey",))
    j = j.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["supp_nation"],
                                              b["cust_nation"]))),
        batch_format="pyarrow")
    return fast_groupby_agg(j, ["supp_nation", "cust_nation", "l_year"], {
        "volume_fp": ("volume_fp", "sum"), "n_items": (None, "count"),
    })


def q_q15_top_supplier(sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    quarter (ties all returned, like the reference query's view+max).
    Plan: lineitem folds to (suppkey, cents) map-side; the per-supplier
    aggregate STAYS a Dataset (supplier grows with data); only the
    scalar max crosses to the driver, and the winner filter re-streams
    the aggregate against that scalar."""
    q_lo = np.datetime64("1997-01-01").astype("datetime64[ns]").view("int64")
    q_hi = np.datetime64("1997-04-01").astype("datetime64[ns]").view("int64")

    def _fold(b: pa.Table) -> pa.Table:
        ship = _ts_ns(b["l_shipdate"])
        t = b.filter(pa.array((ship >= q_lo) & (ship < q_hi)))
        fp = _round_half_away(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0).astype(np.int64)
        return pa.table({"l_suppkey": t["l_suppkey"],
                         "total_fp": pa.array(fp, pa.int64())})

    per_sup = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
          ).map_batches(_fold, batch_format="pyarrow"),
        ["l_suppkey"], {"total_fp": ("total_fp", "sum")})
    best = per_sup.max("total_fp")
    out = per_sup.map_batches(
        lambda b: b.filter(pc.equal(b["total_fp"], best)),
        batch_format="pyarrow")
    return out.sort("l_suppkey").to_pandas()


def q_q17_small_qty_revenue(sf_dir):
    """TPC-H Q17 shape: revenue locked in small-quantity line items —
    rows whose quantity is below 20% of their part's average quantity.
    The correlated per-part average becomes a fact⋈fact-aggregate hash
    self-join on partkey (the aggregate side is one row per part and
    STAYS a Dataset); the comparison cross-multiplies to all-integer
    form (5·qty_fp·n < Σqty_fp) so no division ever happens, and the
    output is one global (revenue_fp, n_rows) pair from partial sums."""
    proj = T(sf_dir, "lineitem",
             ["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
        lambda b: pa.table({
            "l_partkey": b["l_partkey"],
            "qty_fp": pa.array(_round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
            "cents": pa.array(_round_half_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        }),
        batch_format="pyarrow")
    agg = fast_groupby_agg(proj, ["l_partkey"], {
        "sum_qty_fp": ("qty_fp", "sum"), "n_li": (None, "count"),
    }).map_batches(
        lambda b: b.rename_columns(["pk_r", "sum_qty_fp", "n_li"]),
        batch_format="pyarrow")
    j = proj.join(agg, "inner", num_partitions=JOIN_PARTS,
                  on=("l_partkey",), right_on=("pk_r",))

    def _small(b: pa.Table) -> pa.Table:
        qty = b["qty_fp"].to_numpy(zero_copy_only=False)
        n = b["n_li"].to_numpy(zero_copy_only=False)
        s = b["sum_qty_fp"].to_numpy(zero_copy_only=False)
        keep = 5 * qty * n < s
        cents = b["cents"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "revenue_fp": pa.array([int(cents.sum())], pa.int64()),
            "n_rows": pa.array([int(keep.sum())], pa.int64()),
        })

    parts = j.map_batches(_small, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([{
        "revenue_fp": int(parts["revenue_fp"].sum()),
        "n_rows": int(parts["n_rows"].sum()),
    }])


def q_q18_large_orders(sf_dir, k: int = 20, min_qty_fp: int = 25_000):
    """TPC-H Q18 shape: the top-k largest orders by value among orders
    whose total line-item quantity exceeds a threshold (250.00, held
    ×100 fixed point). Plan: lineitem pre-folds to per-order quantity
    sums map-side, the HAVING filter runs on that aggregate (one row
    per order), and only surviving orders hash-join back to the orders
    table for customer/date/value — the top-k sort never sees raw
    lineitem rows."""
    qty = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
            lambda b: pa.table({
                "l_orderkey": b["l_orderkey"],
                "qty_fp": pa.array(_round_half_away(
                    b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
                ).astype(np.int64), pa.int64()),
            }),
            batch_format="pyarrow"),
        ["l_orderkey"], {"sum_qty_fp": ("qty_fp", "sum")},
    ).map_batches(
        lambda b: b.filter(pc.greater(b["sum_qty_fp"], min_qty_fp)),
        batch_format="pyarrow")
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
               ).map_batches(
        lambda b: pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "o_orderdate": b["o_orderdate"],
            "total_cents": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        }),
        batch_format="pyarrow")
    j = qty.join(orders, "inner", num_partitions=JOIN_PARTS,
                 on=("l_orderkey",), right_on=("o_orderkey",))
    top = j.sort(["total_cents", "l_orderkey"],
                 descending=[True, False]).limit(k).to_pandas()
    return top[["l_orderkey", "o_custkey", "o_orderdate", "total_cents",
                "sum_qty_fp"]].reset_index(drop=True)


def q_q8_market_share(sf_dir, region: str = "ASIA",
                      target: str = "NATION_3"):
    """TPC-H Q8 shape: one supplier nation's share of revenue in one
    region's customer market, per order year (×1e9 mirrored div of two
    exact integer cent-sums). Plan: nation/region are fixed-size
    dimensions and ride as in-closure maps; supplier and customer GROW
    with the data, so the target-supplier flag and the region filter
    both attach by hash join; the share division happens once per year
    row on two exact integer sums."""
    nat = T(sf_dir, "nation",
            ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = T(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    region_keys = set(
        nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
        .query("r_name == @region")["n_nationkey"].tolist())
    target_keys = set(nat.query("n_name == @target")["n_nationkey"])

    sup = T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: pa.table({
            "s_suppkey": b["s_suppkey"],
            "is_target": pa.array(np.isin(
                b["s_nationkey"].to_numpy(zero_copy_only=False),
                list(target_keys)).astype(np.int64), pa.int64()),
        }),
        batch_format="pyarrow")
    cust = T(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: b.filter(pa.array(np.isin(
            b["c_nationkey"].to_numpy(zero_copy_only=False),
            list(region_keys)))).select(["c_custkey"]),
        batch_format="pyarrow")
    oc = T(sf_dir, "orders",
           ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda b: pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
        }),
        batch_format="pyarrow").join(
        cust, "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))

    li = T(sf_dir, "lineitem",
           ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
           ).map_batches(
        lambda b: pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "rev_fp": pa.array(_round_half_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False)
                * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
                * 100.0).astype(np.int64), pa.int64()),
        }),
        batch_format="pyarrow")
    j = li.join(sup, "inner", num_partitions=JOIN_PARTS,
                on=("l_suppkey",), right_on=("s_suppkey",))
    j = j.join(oc, "inner", num_partitions=JOIN_PARTS,
               on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.map_batches(
        lambda b: b.append_column("target_rev", pc.multiply(
            b["rev_fp"], b["is_target"])),
        batch_format="pyarrow")
    agg = fast_groupby_agg(j, ["o_year"], {
        "target_fp": ("target_rev", "sum"),
        "total_fp": ("rev_fp", "sum"),
    })

    def _share(b: pa.Table) -> pa.Table:
        t = b["target_fp"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = b["total_fp"].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column("share_fp", pa.array(
            _round_half_away(1e9 * (t / d)).astype(np.int64)))

    return agg.map_batches(_share, batch_format="pyarrow")


def q_q16_part_supplier_counts(sf_dir, excl_brand: str = "Brand#1"):
    """TPC-H Q16 shape (adapted: lineitem is the part⇄supplier link —
    the synthetic schema has no partsupp): distinct suppliers per
    (brand, type, size), one brand excluded. Plan: raw lineitem first
    collapses to DISTINCT (partkey, suppkey) pairs map-side (groupby on
    the pair), joins the part attributes by hash join, then dedups the
    (brand, type, size, suppkey) quadruple before the final count —
    each exchange carries only shrinking distinct sets, never raw
    fact rows."""
    pairs = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        ["l_partkey", "l_suppkey"], {"n": (None, "count")})
    part = T(sf_dir, "part",
             ["p_partkey", "p_brand", "p_type", "p_size"]).map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["p_brand"], excl_brand))),
        batch_format="pyarrow")
    j = pairs.join(part, "inner", num_partitions=JOIN_PARTS,
                   on=("l_partkey",), right_on=("p_partkey",))
    quad = fast_groupby_agg(
        j, ["p_brand", "p_type", "p_size", "l_suppkey"],
        {"m": (None, "count")})
    return fast_groupby_agg(quad, ["p_brand", "p_type", "p_size"], {
        "supplier_cnt": (None, "count")})


def q_q21_late_sole_supplier(sf_dir, k: int = 20,
                             late_days: int = 365):
    """TPC-H Q21 shape (adapted to the available columns: late means
    shipped > late_days after the order date): suppliers who were the
    ONLY late supplier in a multi-supplier order, ranked by how many
    orders they alone held up. Plan: lineitem⋈orders is the one
    fact-sized hash exchange; everything after runs on per-(order,
    supplier) then per-order aggregates that shrink monotonically. The
    'which supplier was late' argmax is a max over sk·late with -1
    fill — no per-group Python."""
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pa.table({
            "o_orderkey": b["o_orderkey"],
            "order_day": pa.array(
                _ts_ns(b["o_orderdate"]) // 86_400_000_000_000,
                pa.int64()),
        }),
        batch_format="pyarrow")
    li = T(sf_dir, "lineitem",
           ["l_orderkey", "l_suppkey", "l_shipdate"]).map_batches(
        lambda b: pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "ship_day": pa.array(
                _ts_ns(b["l_shipdate"]) // 86_400_000_000_000,
                pa.int64()),
        }),
        batch_format="pyarrow")
    j = li.join(orders, "inner", num_partitions=JOIN_PARTS,
                on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.map_batches(
        lambda b: pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "late": pc.cast(pc.greater(
                b["ship_day"],
                pc.add(b["order_day"], late_days)), pa.int64()),
        }),
        batch_format="pyarrow")
    per_pair = fast_groupby_agg(j, ["l_orderkey", "l_suppkey"],
                                {"late_any": ("late", "max")})
    per_pair = per_pair.map_batches(
        lambda b: b.append_column("sk_if_late", pc.subtract(
            pc.multiply(pc.add(b["l_suppkey"], 1), b["late_any"]), 1)),
        batch_format="pyarrow")
    per_order = fast_groupby_agg(per_pair, ["l_orderkey"], {
        "ns": (None, "count"),
        "nl": ("late_any", "sum"),
        "lsk": ("sk_if_late", "max"),
    })
    sole = per_order.map_batches(
        lambda b: (lambda t: pa.table({"l_suppkey": t["lsk"]}))(
            b.filter(pc.and_(pc.greater(b["ns"], 1),
                             pc.equal(b["nl"], 1)))),
        batch_format="pyarrow")
    counts = fast_groupby_agg(sole, ["l_suppkey"],
                              {"numwait": (None, "count")})
    return counts.sort(["numwait", "l_suppkey"],
                       descending=[True, False]).limit(k).to_pandas()


def q_orc_roundtrip(sf_dir):
    """ORC source/sink round trip — the third interchange format after
    JSONL/CSV (export_jsonl_csv): lineitem streams to sharded ORC (one
    file per block via pyarrow.orc inside map_batches — Ray has no
    native ORC writer), the shards are read back one-task-per-file
    (paths Dataset → pyarrow.orc read per batch — the partitioned,
    resumable layout), and per-flag counts plus an integer checksum
    prove the round trip value-faithful against an oracle that never
    touches ORC."""
    import shutil
    import tempfile
    import uuid

    import ray.data as rd

    out = tempfile.mkdtemp(prefix="fcray_orc_")
    try:
        def _write(b: pa.Table) -> pa.Table:
            import pyarrow.orc as orc

            t = pa.table({
                "l_orderkey": b["l_orderkey"],
                "l_returnflag": b["l_returnflag"],
                "qty_fp": pa.array(_round_half_away(
                    b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
                ).astype(np.int64), pa.int64()),
            })
            path = f"{out}/{uuid.uuid4().hex}.orc"
            orc.write_table(t, path)
            return pa.table({"path": pa.array([path], pa.string())})

        paths = T(sf_dir, "lineitem",
                  ["l_orderkey", "l_returnflag", "l_quantity"]
                  ).map_batches(_write, batch_format="pyarrow") \
            .materialize()

        def _read(b: pa.Table) -> pa.Table:
            import pyarrow.orc as orc

            return pa.concat_tables(
                [orc.read_table(p) for p in b["path"].to_pylist()])

        rows = paths.map_batches(_read, batch_format="pyarrow")
        agg = fast_groupby_agg(rows, ["l_returnflag"], {
            "n": (None, "count"),
            "qty_sum_fp": ("qty_fp", "sum"),
            "key_sum": ("l_orderkey", "sum"),
        })
        return agg.to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_benford_audit(sf_dir):
    """Benford's-law audit of order values (the fraud/data-quality
    screen): observed leading-digit counts of o_totalprice cents vs the
    Benford expectation ln(1+1/d)/ln(10) ×1e9. The leading digit comes
    from the INTEGER cent string (no float log10 anywhere); expected
    frequencies use libm ln on exact small ints, mirrored term for term
    in the oracle. One map + one 9-row groupby."""
    import math

    def _digits(b: pa.Table) -> pa.Table:
        cents = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        first = np.array([int(str(c)[0]) for c in cents], np.int64)
        return pa.table({"digit": pa.array(first, pa.int64())})

    counts = fast_groupby_agg(
        T(sf_dir, "orders", ["o_totalprice"]).map_batches(
            _digits, batch_format="pyarrow"),
        ["digit"], {"n": (None, "count")})

    def _expected(b: pa.Table) -> pa.Table:
        d = b["digit"].to_numpy(zero_copy_only=False)
        exp = np.array([
            1e9 * ((math.log(int(x) + 1.0) - math.log(float(x)))
                   / math.log(10.0)) for x in d])
        return b.append_column("benford_fp", pa.array(
            _round_half_away(exp).astype(np.int64)))

    return counts.map_batches(_expected, batch_format="pyarrow")


def q_grouping_sets_agg(sf_dir):
    """GROUPING SETS ((returnflag), (linestatus)) — the non-hierarchical
    grouping shape ROLLUP/CUBE don't cover: two independent unit sets,
    each an exact-integer aggregate, unioned with ''-filled keys.
    Plan: one shared quantized scan feeds two map-side-combined
    groupbys; no lattice re-aggregation needed (the sets overlap in
    neither direction)."""
    scan = T(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity"]).map_batches(
        lambda b: pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty_fp": pa.array(_round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        }),
        batch_format="pyarrow").materialize()
    by_rf = fast_groupby_agg(scan, ["l_returnflag"], {
        "sum_qty_fp": ("qty_fp", "sum"), "n": (None, "count"),
    }).map_batches(
        lambda b: pa.table({
            "rf": b["l_returnflag"],
            "ls": pa.array([""] * len(b), pa.string()),
            "sum_qty_fp": b["sum_qty_fp"], "n": b["n"],
        }),
        batch_format="pyarrow")
    by_ls = fast_groupby_agg(scan, ["l_linestatus"], {
        "sum_qty_fp": ("qty_fp", "sum"), "n": (None, "count"),
    }).map_batches(
        lambda b: pa.table({
            "rf": pa.array([""] * len(b), pa.string()),
            "ls": b["l_linestatus"],
            "sum_qty_fp": b["sum_qty_fp"], "n": b["n"],
        }),
        batch_format="pyarrow")
    return by_rf.union(by_ls)


def q_churned_customers(sf_dir):
    """Month-over-month churn: per month, how many customers ordered in
    it but not in the following month (absence detection — the windowed
    anti-join shape). Plan: orders collapse to DISTINCT (custkey,
    month#) pairs map-side; churn = pair-table LEFT ANTI pair-table on
    (custkey, month#+1) — both sides key-sized, hash-partitioned; the
    final count groupby is month-domain-sized. The global max month is
    excluded (no data after it to churn into)."""
    pairs = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            lambda b: pa.table({
                "o_custkey": b["o_custkey"],
                "mnum": pa.array(
                    pc.year(b["o_orderdate"]).to_numpy(
                        zero_copy_only=False) * 12
                    + pc.month(b["o_orderdate"]).to_numpy(
                        zero_copy_only=False) - 1, pa.int64()),
            }),
            batch_format="pyarrow"),
        ["o_custkey", "mnum"], {"c": (None, "count")},
    ).drop_columns(["c"]).materialize()
    max_m = pairs.max("mnum")
    probe = pairs.map_batches(
        lambda b: (lambda t: pa.table({
            "o_custkey": t["o_custkey"],
            "mnum": t["mnum"],
            "next_m": pc.add(t["mnum"], 1),
        }))(b.filter(pc.less(b["mnum"], max_m))),
        batch_format="pyarrow")
    anti = probe.join(pairs.map_batches(
        lambda b: b.rename_columns(["ck_r", "m_r"]),
        batch_format="pyarrow"),
        "left_anti", num_partitions=JOIN_PARTS,
        on=("o_custkey", "next_m"), right_on=("ck_r", "m_r"))
    out = fast_groupby_agg(anti, ["mnum"], {"n_churned": (None, "count")})
    return out.map_batches(
        lambda b: pa.table({
            "month": pa.array([
                f"{m // 12:04d}-{m % 12 + 1:02d}"
                for m in b["mnum"].to_pylist()], pa.string()),
            "n_churned": b["n_churned"],
        }),
        batch_format="pyarrow")


def q_late_events(sf_dir):
    """Out-of-order-arrival audit (the streaming watermark primitive):
    events 'arrive' in a deterministic md5(event_id) permutation of the
    stream; an event is LATE if its timestamp is behind the running max
    already seen for its user — exactly what a watermark operator would
    flag. Per-user counts via sorted map_groups (bounded per-user
    volume, same assumption as the other per-key window ops)."""

    def _h(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_pylist()
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_ns": pa.array(_ts_ns(b["ts"]), pa.int64()),
            "h": pa.array([hashlib.md5(str(i).encode()).hexdigest()
                           for i in ids], pa.string()),
        })

    keyed = T(sf_dir, "events",
              ["user_id", "event_id", "ts"]).map_batches(
        _h, batch_format="pyarrow")

    def _audit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "event_id"])
        ts = g["ts_ns"].to_numpy()
        run_max = np.maximum.accumulate(ts)
        late = np.zeros(len(ts), bool)
        late[1:] = ts[1:] < run_max[:-1]
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_events": [len(g)],
            "n_late": [int(late.sum())],
        })

    return keyed.groupby("user_id").map_groups(
        _audit, batch_format="pandas")


def q_inverted_index(sf_dir, k_postings: int = 10):
    """Inverted-index build (the IR/retrieval primitive): per term, its
    document frequency, total term frequency, and the first
    ``k_postings`` doc_ids of its posting list. Plan: one tokenize pass
    emits the (term, doc_id, tf) index rows; df/tf fold through a
    map-side-combined groupby; the posting heads use the MERGEABLE
    grouped top-k (top-k of a union == top-k of per-part top-ks), so a
    stopword term with a billion postings still only ships k rows per
    block; the final term-keyed join is vocabulary-sized (Heaps-
    bounded), never corpus-sized."""
    from ..stages.fastagg import grouped_topk

    def _tf(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        ex = df["text"].fillna("").str.split(" ").explode()
        g = (pd.DataFrame({
            "term": ex.to_numpy(),
            "doc_id": df["doc_id"].to_numpy()[
                ex.index.to_numpy(np.int64)],
        }).groupby(["term", "doc_id"], sort=False).size()
            .rename("tf").reset_index())
        g["tf"] = g["tf"].astype("int64")
        return g

    tdf = T(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _tf, batch_format="pandas").materialize()
    stats = fast_groupby_agg(tdf, ["term"], {
        "df": (None, "count"), "tf_total": ("tf", "sum")})
    heads = grouped_topk(tdf, ["term"], ["doc_id"], [True], k_postings)

    def _join_postings(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        return pd.DataFrame({
            "term": [g["term"].iloc[0]],
            "postings": [",".join(str(int(d)) for d in g["doc_id"])],
        })

    postings = heads.groupby("term").map_groups(
        _join_postings, batch_format="pandas")
    out = stats.join(postings.map_batches(
        lambda b: b.rename_columns(["t_r", "postings"]),
        batch_format="pyarrow"),
        "inner", num_partitions=JOIN_PARTS, on=("term",), right_on=("t_r",))
    return out.select_columns(["term", "df", "tf_total", "postings"])


def q_event_cooccurrence(sf_dir, window_s: int = 3600):
    """Event-type co-occurrence mining: counts of ordered (first,
    second) event-type pairs where the same user produced both within
    one hour — the session-context / market-basket primitive. Per-user
    sorted two-pointer window (searchsorted, no O(n²) unless the window
    itself is O(n)); the exchange after is the tiny type×type matrix.
    Per-user volume is the same bounded-key assumption as the other
    window ops."""
    win_ns = window_s * 1_000_000_000

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_ns": pa.array(_ts_ns(b["ts"]), pa.int64()),
            "event_type": b["event_type"],
        })

    ev = T(sf_dir, "events",
           ["user_id", "event_id", "ts", "event_type"]).map_batches(
        _proj, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_ns", "event_id"])
        ts = g["ts_ns"].to_numpy()
        types = g["event_type"].to_numpy()
        hi = np.searchsorted(ts, ts + win_ns, side="right")
        starts = np.arange(len(ts)) + 1
        n = np.maximum(hi - starts, 0)
        if n.sum() == 0:
            return pd.DataFrame({"first_type": [], "second_type": []})
        first_idx = np.repeat(np.arange(len(ts)), n)
        second_idx = np.concatenate(
            [np.arange(s, h) for s, h in zip(starts, hi) if h > s])
        return pd.DataFrame({
            "first_type": types[first_idx],
            "second_type": types[second_idx],
        })

    pairs = ev.groupby("user_id").map_groups(
        _pairs, batch_format="pandas")
    return fast_groupby_agg(pairs, ["first_type", "second_type"],
                            {"n": (None, "count")})


def q_compact_store(sf_dir, shard_rows: int = 1000,
                    target_mb: int = 8):
    """Small-file compaction (the lakehouse maintenance op a 100-TB
    store needs continuously): documents are first written as MANY tiny
    parquet shards (the pathological post-ingest layout), then
    compacted by a size-based re-read (T()'s own block arithmetic) into
    few right-sized files. The audit row proves rows and an integer
    checksum survived, and that the file count actually dropped — a
    compaction that loses or duplicates rows fails the oracle, not just
    a smoke test."""
    import os as _os
    import shutil
    import tempfile

    import ray.data as rd

    out = tempfile.mkdtemp(prefix="fcray_compact_")
    try:
        docs = T(sf_dir, "documents", ["doc_id", "n_chars"])
        small = _os.path.join(out, "small")
        docs.repartition(
            max(8, docs.count() // shard_rows)).write_parquet(small)
        n_before = len([f for f in _os.listdir(small)
                        if f.endswith(".parquet")])
        compacted = _os.path.join(out, "compacted")
        nb = max(1, -(-sum(
            e.stat().st_size for e in _os.scandir(small)
            if e.is_file()) // (target_mb << 20)))
        rd.read_parquet(small).repartition(nb).write_parquet(
            compacted, min_rows_per_file=shard_rows * 4)
        n_after = len([f for f in _os.listdir(compacted)
                       if f.endswith(".parquet")])
        back = rd.read_parquet(compacted)
        agg = back.map_batches(
            lambda b: pa.table({
                "n_rows": pa.array([len(b)], pa.int64()),
                "id_sum": pa.array(
                    [int(b["doc_id"].to_numpy(
                        zero_copy_only=False).sum())], pa.int64()),
                "chars_sum": pa.array(
                    [int(b["n_chars"].to_numpy(
                        zero_copy_only=False).sum())], pa.int64()),
            }),
            batch_format="pyarrow").to_pandas()
        return pd.DataFrame([{
            "n_rows": int(agg["n_rows"].sum()),
            "id_sum": int(agg["id_sum"].sum()),
            "chars_sum": int(agg["chars_sum"].sum()),
            "compacted": bool(n_after < n_before),
        }])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_theil_index(sf_dir):
    """Theil-T inequality index of customer spend (the concentration
    audit beside key_skew's Gini): T = (1/n)·Σ (x/μ)·ln(x/μ) over
    per-customer cent totals. Every ln term is computed on EXACT
    integers — ln(x·n/S) = ln(x)+ln(n)−ln(S), each a libm log of an
    exact int64 — and quantized ×1e9 per customer before the integer
    sum, so the index is association-order-free. The per-customer
    aggregate stays a Dataset; only n and S (two scalars) cross to the
    driver before the final map."""
    import math

    per_cust = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            lambda b: pa.table({
                "o_custkey": b["o_custkey"],
                "cents": pa.array(_round_half_away(
                    b["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64), pa.int64()),
            }),
            batch_format="pyarrow"),
        ["o_custkey"], {"x": ("cents", "sum")}).materialize()
    n = per_cust.count()
    s = per_cust.sum("x")
    ln_n, ln_s = math.log(n), math.log(s)

    def _terms(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        # (x/μ)·ln(x/μ) = (x·n/S)·(ln x + ln n − ln S); ln on exact ints
        t = np.array([
            1e9 * ((int(v) * n / s)
                   * (math.log(int(v)) + ln_n - ln_s)) for v in x])
        return pa.table({
            "term_fp": pa.array(_round_half_away(t).astype(np.int64)),
            "one": pa.array(np.ones(len(x), np.int64)),
        })

    parts = per_cust.map_batches(_terms, batch_format="pyarrow") \
        .to_pandas()
    return pd.DataFrame([{
        "n_customers": int(parts["one"].sum()),
        "theil_sum_fp": int(parts["term_fp"].sum()),
    }])


WEIGHTED_JOIN_SAMPLE_K = 50


def q_weighted_join_sample(sf_dir, k: int = WEIGHTED_JOIN_SAMPLE_K):
    """Weighted sampling over a JOIN (the 'Streaming Weighted Sampling
    over Join Queries' shape, EDBT 2023 — see PAPERS.md): draw k line
    items ∝ extendedprice FROM THE JOIN lineitem⋈part, carrying the
    joined attribute (p_type) into the sample. Same deterministic A-ES
    construction as q_weighted_sample (u from md5 of the row key, score
    = ln(u)/w, libm ln both sides) — the join never materializes
    globally: part attrs ride per actor (true dimension, the
    promo_revenue_ratio pattern), each block keeps its local top-k, and
    one combine task folds ≤ blocks×k rows."""
    import math

    pref = ray.put(
        T(sf_dir, "part", ["p_partkey", "p_type"]).to_arrow_refs())

    class _Keys:
        def __init__(self):
            t = pa.concat_tables(ray.get(ray.get(pref)))
            self.keys = t["p_partkey"].combine_chunks()
            self.types = t["p_type"].combine_chunks()

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b["l_partkey"], value_set=self.keys)
            ptype = self.types.take(idx)
            ok = b["l_orderkey"].to_pylist()
            ln_ = b["l_linenumber"].to_pylist()
            w = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            u = np.array(
                [int(hashlib.md5(f"{o}:{n}".encode()).hexdigest()[:8],
                     16) + 1 for o, n in zip(ok, ln_)],
                np.float64) / 4294967296.0
            key = np.array([math.log(x) for x in u], np.float64) / w
            df = pd.DataFrame({
                "l_orderkey": ok, "l_linenumber": ln_,
                "p_type": ptype.to_pylist(), "key": key,
            })
            df = df.sort_values(
                ["key", "l_orderkey", "l_linenumber"],
                ascending=[False, True, True]).head(k)
            return pa.Table.from_pandas(df, preserve_index=False)

    parts = T(sf_dir, "lineitem",
              ["l_orderkey", "l_linenumber", "l_partkey",
               "l_extendedprice"]).map_batches(
        _Keys, batch_format="pyarrow",
        concurrency=(1, 4)).materialize()

    @ray.remote
    def _final(refs) -> pa.Table:
        blocks = ray.get(list(refs))
        t = pa.concat_tables([b for b in blocks if b.num_rows])
        df = t.to_pandas().sort_values(
            ["key", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True]).head(k)
        return pa.table({
            "l_orderkey": pa.array(df["l_orderkey"].to_numpy(np.int64)),
            "l_linenumber": pa.array(
                df["l_linenumber"].to_numpy(np.int64)),
            "p_type": pa.array(df["p_type"].tolist(), pa.string()),
            "key_fp": pa.array(_round_half_away(
                df["key"].to_numpy() * 1e9).astype(np.int64)),
        })

    import ray.data as rd

    return rd.from_arrow_refs([_final.remote(parts.to_arrow_refs())])


LCR_MAX_HOPS = 3
LCR_MAX_SINGLE_EDGES = 5_000_000

# DFA for the path-label language 0·1* (first edge labeled 0, then any
# number of 1-labeled edges): state 0 --lbl 0--> state 1 --lbl 1--> 1.
# Accepting state: 1. Encoded as {(q, lbl): q'}.
_LCR_DFA = {(0, 0): 1, (1, 1): 1}
_LCR_ACCEPT = 1


@ray.remote
def _lcr_task(n: int, max_hops: int, *tables: pa.Table) -> pa.Table:
    """Single-task label-constrained BFS over the PRODUCT graph
    (node × DFA state) — small-graph tier. Same searchsorted slicing
    as _bfs_task, with the automaton step fused into the gather."""
    live = live_arrow(tables)
    t = pa.concat_tables(live)
    order = np.argsort(t["src"].to_numpy(zero_copy_only=False),
                       kind="stable")
    src_s = t["src"].to_numpy(zero_copy_only=False)[order]
    dst_s = t["dst"].to_numpy(zero_copy_only=False)[order]
    lbl_s = t["lbl"].to_numpy(zero_copy_only=False)[order]
    n_q = 2
    dist = np.full(n * n_q, -1, dtype=np.int64)  # (node, q) → hop
    dist[0 * n_q + 0] = 0
    frontier = np.array([0 * n_q + 0], dtype=np.int64)
    for hop in range(1, max_hops + 1):
        nodes = frontier // n_q
        qs = frontier % n_q
        lo = np.searchsorted(src_s, nodes, side="left")
        hi = np.searchsorted(src_s, nodes, side="right")
        outs = []
        for a, b, q in zip(lo, hi, qs):
            if b <= a:
                continue
            d, l = dst_s[a:b], lbl_s[a:b]
            for (q0, lbl), q1 in _LCR_DFA.items():
                if q0 != q:
                    continue
                m = l == lbl
                if m.any():
                    outs.append(d[m] * n_q + q1)
        if not outs:
            break
        cand = np.unique(np.concatenate(outs))
        new = cand[dist[cand] == -1]
        if len(new) == 0:
            break
        dist[new] = hop
        frontier = new
    # per NODE: min hop over accepting product states
    acc = dist[np.arange(n) * n_q + _LCR_ACCEPT]
    keep = acc >= 0
    return pa.table({
        "node": pa.array(np.arange(n, dtype=np.int64)[keep]),
        "dist": pa.array(acc[keep], pa.int64()),
    })


def q_label_reachability(sf_dir, max_hops: int = LCR_MAX_HOPS,
                         max_single_edges: int = LCR_MAX_SINGLE_EDGES):
    """Label-constrained reachability (the ICDE 2022 billion-scale LCR
    shape, see PAPERS.md): nodes reachable from node 0 by a path whose
    EDGE-LABEL SEQUENCE matches the regular language 0·1*, with the min
    hop count. Solved as BFS over the PRODUCT graph (node × DFA state)
    — the standard LCR construction — so the distributed tier is
    exactly the graph_bfs join plan with a (node, q) composite frontier
    key and a vectorized automaton step after the edge join. Edge
    labels derive deterministically from the order graph
    (lbl = o_orderkey mod 3). Below the edge guard the collected
    single-task tier runs instead (tiers pinned identical by test)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    cust = T(sf_dir, "customer", ["c_custkey"])
    dom = cust.aggregate(Min("c_custkey"), Max("c_custkey"), Count())
    n = dom["count()"]
    if dom["min(c_custkey)"] != 0 or dom["max(c_custkey)"] != n - 1:
        raise ValueError("label_reachability needs dense 0-based "
                         "c_custkey")
    orders = T(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _e(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        c = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(c.astype(np.int64), pa.int64()),
            "dst": pa.array((k % n).astype(np.int64), pa.int64()),
            "lbl": pa.array((k % 3).astype(np.int64), pa.int64()),
        })

    edges = orders.map_batches(_e, batch_format="pyarrow").materialize()
    if edges.count() <= max_single_edges:
        return rd.from_arrow_refs(
            [_lcr_task.remote(n, max_hops, *edges.to_arrow_refs())])

    n_q = 2
    visited = rd.from_arrow(pa.table({
        "pk": pa.array([0 * n_q + 0], pa.int64()),
        "dist": pa.array([0], pa.int64()),
    })).materialize()
    frontier = visited
    for hop in range(1, max_hops + 1):
        fr = frontier.map_batches(
            lambda b: pa.table({
                "src": pc.cast(pc.divide(b["pk"], n_q), pa.int64()),
                "q": pa.array(
                    b["pk"].to_numpy(zero_copy_only=False) % n_q,
                    pa.int64()),
            }),
            batch_format="pyarrow")
        cand = edges.join(fr, "inner", num_partitions=JOIN_PARTS, on=("src",))

        def _step(b: pa.Table) -> pa.Table:
            q = b["q"].to_numpy(zero_copy_only=False)
            lbl = b["lbl"].to_numpy(zero_copy_only=False)
            dst = b["dst"].to_numpy(zero_copy_only=False)
            q1 = np.full(len(q), -1, np.int64)
            for (q0, lb), qn in _LCR_DFA.items():
                q1[(q == q0) & (lbl == lb)] = qn
            keep = q1 >= 0
            return pa.table({"pk": pa.array(
                dst[keep] * n_q + q1[keep], pa.int64())})

        cand = fast_groupby_agg(
            cand.map_batches(_step, batch_format="pyarrow"),
            ["pk"], {"_n": (None, "count")})
        new = cand.join(visited.select_columns(["pk"]), "left_anti",
                        num_partitions=JOIN_PARTS, on=("pk",))
        new = new.map_batches(
            lambda b, h=hop: pa.table({
                "pk": b["pk"],
                "dist": pa.array(np.full(b.num_rows, h), pa.int64()),
            }),
            batch_format="pyarrow").materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new

    acc = visited.map_batches(
        lambda b: (lambda pk, d: pa.table({
            "node": pa.array(pk[pk % n_q == _LCR_ACCEPT] // n_q,
                             pa.int64()),
            "dist": pa.array(d[pk % n_q == _LCR_ACCEPT], pa.int64()),
        }))(b["pk"].to_numpy(zero_copy_only=False),
            b["dist"].to_numpy(zero_copy_only=False)),
        batch_format="pyarrow")
    return acc


def q_k_anonymity(sf_dir, k: int = 5):
    """k-anonymity audit (the re-identification-risk screen a training
    corpus with person-level rows needs): customers grouped by the
    quasi-identifier triple (nation, market segment, account-balance
    band of 1000); any group smaller than k is re-identifiable. Output
    is the audit summary — total groups, risky groups, rows at risk,
    and the worst (smallest) group size. Plan: one map-side-combined
    groupby over the quasi-identifier (group-count-sized exchange),
    then per-block partial sums of the risk flags — the quasi-id
    aggregate never lands on the driver."""
    quasi = T(sf_dir, "customer",
              ["c_nationkey", "c_mktsegment", "c_acctbal"]).map_batches(
        lambda b: pa.table({
            "c_nationkey": b["c_nationkey"],
            "c_mktsegment": b["c_mktsegment"],
            # +100000 shift keeps the dividend positive (acctbal can be
            # negative; python // floors but DuckDB // truncates — on
            # nonneg ints they agree)
            "bal_band": pa.array(
                (_round_half_away(
                    b["c_acctbal"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64) + 100_000) // 100_000,
                pa.int64()),
        }),
        batch_format="pyarrow")
    groups = fast_groupby_agg(
        quasi, ["c_nationkey", "c_mktsegment", "bal_band"],
        {"n": (None, "count")})

    def _audit(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        risky = n < k
        return pa.table({
            "n_groups": pa.array([len(n)], pa.int64()),
            "n_risky_groups": pa.array([int(risky.sum())], pa.int64()),
            "n_risky_rows": pa.array([int(n[risky].sum())], pa.int64()),
            "min_group": pa.array([int(n.min()) if len(n) else 0],
                                  pa.int64()),
        })

    parts = groups.map_batches(_audit, batch_format="pyarrow") \
        .to_pandas()
    return pd.DataFrame([{
        "n_groups": int(parts["n_groups"].sum()),
        "n_risky_groups": int(parts["n_risky_groups"].sum()),
        "n_risky_rows": int(parts["n_risky_rows"].sum()),
        "min_group": int(parts["min_group"].min()),
    }])


def q_weekly_revenue(sf_dir):
    """ISO-calendar weekly revenue rollup (the calendar-correct weekly
    reporting shape — ISO weeks straddle year boundaries, so naive
    year+weekofyear double-counts): key = (isoyear, isoweek), verified
    pandas.isocalendar ≡ DuckDB isoyear()/week() on this data. One
    map + one week-domain-sized groupby over integer cents."""

    def _wk(df: pd.DataFrame) -> pd.DataFrame:
        ic = df["o_orderdate"].dt.isocalendar()
        return pd.DataFrame({
            "iso_year": ic["year"].astype("int64"),
            "iso_week": ic["week"].astype("int64"),
            "cents": pd.Series(_round_half_away(
                df["o_totalprice"].to_numpy() * 100.0
            ).astype(np.int64)),
            "one": np.ones(len(df), np.int64),
        })

    folded = T(sf_dir, "orders",
               ["o_orderdate", "o_totalprice"]).map_batches(
        _wk, batch_format="pandas")
    return fast_groupby_agg(folded, ["iso_year", "iso_week"], {
        "revenue_fp": ("cents", "sum"), "n_orders": (None, "count"),
    })


def q_psi_drift(sf_dir):
    """Population-stability-index drift detector (the ML-ops screen for
    feature drift between two periods): event values banded to 20.00
    buckets, distributions compared between the first and second half
    of the stream, PSI term (p1−p2)·ln(p1/p2) per bucket with add-one
    smoothing. Every probability is one exact-int double division, the
    ln is libm on that ratio, and the ×1e9 quantization happens per
    BUCKET before any sum — the standard mirrored-float-tree policy.
    Plan: per-block (bucket, c1, c2) partials → one bucket-domain-sized
    groupby; only three scalars (t1, t2, n_buckets) touch the driver."""
    import math

    cut = np.datetime64("2024-01-16").astype(
        "datetime64[ns]").view("int64")

    def _b(b: pa.Table) -> pa.Table:
        cents = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        bucket = cents // 2000
        p1 = (_ts_ns(b["ts"]) < cut).astype(np.int64)
        return pa.table({
            "bucket": pa.array(bucket, pa.int64()),
            "c1": pa.array(p1, pa.int64()),
            "c2": pa.array(1 - p1, pa.int64()),
        })

    cnt = fast_groupby_agg(
        T(sf_dir, "events", ["ts", "value"]).map_batches(
            _b, batch_format="pyarrow"),
        ["bucket"], {"c1": ("c1", "sum"), "c2": ("c2", "sum")},
    ).materialize()
    t1 = cnt.sum("c1")
    t2 = cnt.sum("c2")
    nb = cnt.count()

    def _terms(b: pa.Table) -> pa.Table:
        c1 = b["c1"].to_numpy(zero_copy_only=False)
        c2 = b["c2"].to_numpy(zero_copy_only=False)
        term = np.empty(len(c1), np.float64)
        for i in range(len(c1)):
            p1 = (int(c1[i]) + 1.0) / (t1 + float(nb))
            p2 = (int(c2[i]) + 1.0) / (t2 + float(nb))
            term[i] = 1e9 * ((p1 - p2) * math.log(p1 / p2))
        return b.append_column("psi_term_fp", pa.array(
            _round_half_away(term).astype(np.int64)))

    return cnt.map_batches(_terms, batch_format="pyarrow")


def q_ab_test_welch(sf_dir):
    """Deterministic A/B experiment readout with a Welch unequal-
    variance 95% CI: users split into arms by md5(user_id) first nibble
    (reproducible assignment — the experimentation primitive), value
    compared in exact integer cents. All moments (n, Σx, Σx²) are exact
    int64 partial sums; mean/variance/CI are ONE mirrored float tree
    over those exact ints (sample variance /(n−1), se = sqrt(va/na +
    vb/nb), the 1.96 literal written identically on both sides — sqrt
    is IEEE-exact, the tree is shape-mirrored). Per-block partials →
    one 2-row combine; nothing user-level leaves the workers."""
    import hashlib as _hl
    import math

    def _m(b: pa.Table) -> pa.Table:
        cents = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        arm_a = np.array([
            int(_hl.md5(str(u).encode()).hexdigest()[0], 16) < 8
            for u in b["user_id"].to_pylist()])
        rows = []
        for arm, mask in (("A", arm_a), ("B", ~arm_a)):
            x = cents[mask]
            rows.append({"arm": arm, "n": len(x),
                         "s": int(x.sum()),
                         "s2": int((x * x).sum())})
        df = pd.DataFrame(rows)
        return pa.Table.from_pandas(df, preserve_index=False)

    mom = fast_groupby_agg(
        T(sf_dir, "events", ["user_id", "value"]).map_batches(
            _m, batch_format="pyarrow"),
        ["arm"], {"n": ("n", "sum"), "s": ("s", "sum"),
                  "s2": ("s2", "sum")}).to_pandas().set_index("arm")
    na, sa, s2a = (int(mom.loc["A", c]) for c in ("n", "s", "s2"))
    nb_, sb, s2b = (int(mom.loc["B", c]) for c in ("n", "s", "s2"))
    ma = (sa * 1.0) / na
    mb = (sb * 1.0) / nb_
    va = (s2a * 1.0 - (sa * 1.0) * (sa * 1.0) / na) / (na - 1)
    vb = (s2b * 1.0 - (sb * 1.0) * (sb * 1.0) / nb_) / (nb_ - 1)
    se = math.sqrt(va / na + vb / nb_)
    diff = ma - mb
    fp = _round_half_away(np.array([
        1e6 * diff, 1e6 * (diff - 1.96 * se), 1e6 * (diff + 1.96 * se),
    ])).astype(np.int64)
    return pd.DataFrame([{
        "n_a": na, "n_b": nb_,
        "diff_fp": int(fp[0]),
        "ci_lo_fp": int(fp[1]),
        "ci_hi_fp": int(fp[2]),
    }])


def q_frequent_itemsets(sf_dir, min_support: int = 10,
                        max_broadcast_parts: int = 2_000_000):
    """Market-basket frequent PAIRS (the A-Priori second pass): baskets
    are orders, items are the part types they contain; count baskets
    containing each unordered type pair, keep support ≥ min_support.
    Plan: the partkey→type lookup is CARDINALITY GUARDED — below
    `max_broadcast_parts` it ships once as a ray.put sorted-key array
    probed by searchsorted inside map_batches directly over raw
    lineitem, so ONE distinct-(order, type) groupby does the A-Priori
    dedup (the join tier needs the (order, partkey) pre-distinct first
    to keep the exchange bounded — one extra shuffle, which is why the
    broadcast tier is the default); above the guard the hash-join tier
    runs (part grows with the dataset, so the broadcast is not
    assumed); pair expansion runs VECTORIZED per
    splitmix64(orderkey) % P partition as a basket-keyed self-merge
    (C-speed pandas hash join + one `<` filter — the per-basket
    Python loop this replaces cost minutes at sf0.1: one UDF call per
    basket × 150k baskets); the final exchange is the tiny type×type
    count matrix. Baskets are small by construction, so the merge
    blowup per partition is Σk² over its baskets — bounded by the
    same per-key contract the loop relied on."""
    from ..functions.sketches import _splitmix64

    P = 64
    li = T(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    part = T(sf_dir, "part", ["p_partkey", "p_type"])
    if part.count() <= max_broadcast_parts:
        pt = part.to_pandas().sort_values("p_partkey")
        keys_ref = ray.put(pt["p_partkey"].to_numpy(np.int64))
        types_ref = ray.put(pt["p_type"].to_numpy(object))

        def _probe(b: pa.Table) -> pa.Table:
            keys, types = ray.get(keys_ref), ray.get(types_ref)
            pk = b["l_partkey"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(keys, pk)
            ok = (idx < len(keys)) & (keys[np.minimum(
                idx, len(keys) - 1)] == pk)
            return pa.table({
                "l_orderkey": pa.array(
                    b["l_orderkey"].to_numpy(zero_copy_only=False)[ok],
                    pa.int64()),
                "p_type": pa.array(types[idx[ok]], pa.string()),
            })

        typed = li.map_batches(_probe, batch_format="pyarrow")
    else:
        pairs_src = fast_groupby_agg(
            li, ["l_orderkey", "l_partkey"], {"_n": (None, "count")})
        typed = pairs_src.join(part, "inner", num_partitions=JOIN_PARTS,
                               on=("l_partkey",), right_on=("p_partkey",))
    ot = fast_groupby_agg(typed, ["l_orderkey", "p_type"],
                          {"_m": (None, "count")})

    def _part(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": b["l_orderkey"], "p_type": b["p_type"],
            "part": pa.array(
                (_splitmix64(ok) % np.uint64(P)).astype(np.int64)),
        })

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["l_orderkey", "p_type"]]
        m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["p_type_a"] < m["p_type_b"]]
        return pd.DataFrame({"item_a": m["p_type_a"].to_numpy(),
                             "item_b": m["p_type_b"].to_numpy()})

    pairs = ot.map_batches(_part, batch_format="pyarrow") \
        .groupby("part").map_groups(_pairs, batch_format="pandas")
    counts = fast_groupby_agg(pairs, ["item_a", "item_b"],
                              {"support": (None, "count")})
    return counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["support"], min_support)),
        batch_format="pyarrow")


def q_db_file_export(sf_dir):
    """S9: single-file database export — the reference ships its crawl
    output as a copyable sqlite .db artifact (SURVEY §2.1 S9, scoped
    out until now); the engine exports a report aggregate into a
    DuckDB database FILE and round-trips it. The exported table is
    report-sized (an aggregate, never fact data), so the single-file
    artifact step is driver-side by design — the same contract as the
    reference's artifact copy. The oracle recomputes the aggregate
    straight from parquet, so a lossy export fails the hash, not just
    a smoke test."""
    import os as _os
    import shutil
    import tempfile

    import duckdb as _dk

    agg = fast_groupby_agg(
        T(sf_dir, "orders", ["o_orderstatus", "o_totalprice"]
          ).map_batches(
            lambda b: pa.table({
                "o_orderstatus": b["o_orderstatus"],
                "cents": pa.array(_round_half_away(
                    b["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64), pa.int64()),
            }),
            batch_format="pyarrow"),
        ["o_orderstatus"], {"n": (None, "count"),
                            "revenue_fp": ("cents", "sum")}
    ).to_pandas()
    out = tempfile.mkdtemp(prefix="fcray_dbexport_")
    try:
        path = _os.path.join(out, "report.duckdb")
        con = _dk.connect(path)
        con.execute("CREATE TABLE report AS SELECT * FROM agg")
        con.close()
        ro = _dk.connect(path, read_only=True)
        back = ro.execute(
            "SELECT o_orderstatus, CAST(n AS BIGINT) AS n, "
            "CAST(revenue_fp AS BIGINT) AS revenue_fp "
            "FROM report ORDER BY o_orderstatus").df()
        ro.close()
        return back
    finally:
        shutil.rmtree(out, ignore_errors=True)


SSSP_ROUNDS = 4
SSSP_MAX_SINGLE_EDGES = 5_000_000


@ray.remote
def _sssp_task(n: int, rounds: int, *tables: pa.Table) -> pa.Table:
    """Single-task Bellman-Ford over the collected weighted edge list
    (small-graph tier). Integer weights → exact distances."""
    live = live_arrow(tables)
    t = pa.concat_tables(live)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    w = t["w"].to_numpy(zero_copy_only=False)
    INF = np.iinfo(np.int64).max // 4
    dist = np.full(n, INF, dtype=np.int64)
    dist[0] = 0
    for _ in range(rounds):
        cand = dist[src] + w
        nd = dist.copy()
        np.minimum.at(nd, dst, cand)
        if np.array_equal(nd, dist):
            break
        dist = nd
    keep = dist < INF
    return pa.table({
        "node": pa.array(np.arange(n, dtype=np.int64)[keep]),
        "dist": pa.array(dist[keep], pa.int64()),
    })


def q_graph_sssp(sf_dir, rounds: int = SSSP_ROUNDS,
                 max_single_edges: int = SSSP_MAX_SINGLE_EDGES):
    """Weighted single-source shortest paths from node 0, Bellman-Ford
    with a fixed round budget (the min-plus-semiring member of the
    graph family: BFS counts hops, this minimizes integer edge-weight
    sums — exact, no floats anywhere). Edge weights derive
    deterministically from the order graph (w = okey//n mod 9 + 1).
    Distributed tier per round: dist⋈edges hash join on src → map
    candidate (dst, dist+w) → map-side-combined min per dst →
    left-outer merge with the previous front. Below the edge guard the
    collected single-task tier runs (pinned identical by test)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    cust = T(sf_dir, "customer", ["c_custkey"])
    dom = cust.aggregate(Min("c_custkey"), Max("c_custkey"), Count())
    n = dom["count()"]
    if dom["min(c_custkey)"] != 0 or dom["max(c_custkey)"] != n - 1:
        raise ValueError("graph_sssp needs dense 0-based c_custkey")
    orders = T(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _e(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        c = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(c.astype(np.int64), pa.int64()),
            "dst": pa.array((k % n).astype(np.int64), pa.int64()),
            "w": pa.array(((k // n) % 9 + 1).astype(np.int64),
                          pa.int64()),
        })

    edges = orders.map_batches(_e, batch_format="pyarrow").materialize()
    if edges.count() <= max_single_edges:
        return rd.from_arrow_refs(
            [_sssp_task.remote(n, rounds, *edges.to_arrow_refs())])

    dist = rd.from_arrow(pa.table({
        "node": pa.array([0], pa.int64()),
        "dist": pa.array([0], pa.int64()),
    })).materialize()
    for _ in range(rounds):
        cand = edges.join(
            dist.map_batches(
                lambda b: b.rename_columns(["src", "d0"]),
                batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=("src",))
        cand = cand.map_batches(
            lambda b: pa.table({
                "node": b["dst"],
                "dist": pc.add(b["d0"], b["w"]),
            }),
            batch_format="pyarrow")
        merged = fast_groupby_agg(
            cand.union(dist), ["node"], {"dist": ("dist", "min")},
        ).materialize()
        same = (merged.count() == dist.count())
        dist = merged
        if same:
            # counts equal is necessary but not sufficient; one cheap
            # extra round is the convergence check at this budget
            continue
    return dist


def q_did_estimate(sf_dir):
    """Difference-in-differences readout (the quasi-experimental
    counterpart of ab_test_welch): arms assigned by md5 nibble,
    periods split at the stream midpoint; DiD = (Ā₂−Ā₁)−(B̄₂−B̄₁) in
    cents. All four cell moments are exact int64 partial sums; the
    four means and the final subtraction are one shape-mirrored float
    tree ×1e6. The exchange is the 4-row (arm, period) moment table."""
    import hashlib as _hl

    cut = np.datetime64("2024-01-16").astype(
        "datetime64[ns]").view("int64")

    def _m(b: pa.Table) -> pa.Table:
        cents = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        arm_a = np.array([
            int(_hl.md5(str(u).encode()).hexdigest()[0], 16) < 8
            for u in b["user_id"].to_pylist()])
        p2 = _ts_ns(b["ts"]) >= cut
        rows = []
        for arm, am in (("A", arm_a), ("B", ~arm_a)):
            for per, pm in ((1, ~p2), (2, p2)):
                x = cents[am & pm]
                rows.append({"arm": arm, "period": per,
                             "n": len(x), "s": int(x.sum())})
        return pa.Table.from_pandas(pd.DataFrame(rows),
                                    preserve_index=False)

    mom = fast_groupby_agg(
        T(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
            _m, batch_format="pyarrow"),
        ["arm", "period"], {"n": ("n", "sum"), "s": ("s", "sum")},
    ).to_pandas().set_index(["arm", "period"])

    def mean(arm, per):
        return (int(mom.loc[(arm, per), "s"]) * 1.0) \
            / int(mom.loc[(arm, per), "n"])

    did = (mean("A", 2) - mean("A", 1)) - (mean("B", 2) - mean("B", 1))
    return pd.DataFrame([{
        "n_a1": int(mom.loc[("A", 1), "n"]),
        "n_a2": int(mom.loc[("A", 2), "n"]),
        "n_b1": int(mom.loc[("B", 1), "n"]),
        "n_b2": int(mom.loc[("B", 2), "n"]),
        "did_fp": int(_round_half_away(
            np.array([1e6 * did]))[0]),
    }])


def q_q2_min_cost_supplier(sf_dir, region: str = "EUROPE"):
    """TPC-H Q2 shape (adapted: the synthetic schema has no partsupp,
    so the part⇄supplier catalog is the DISTINCT lineitem pair set and
    supplycost is the deterministic integer
    ((pk·31 + sk·17) mod 10000) + 1): for every part, the minimum-cost
    supplier among its region suppliers, ties to the smaller suppkey.
    Plan: pair collapse map-side → region flag attaches to supplier by
    hash join (supplier grows with data) → the correlated min becomes
    ONE map-side-combined min over the packed key cost·2³²+sk (argmin
    without a second pass or a self-join) → decode. All integers."""
    nat = T(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = T(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    region_keys = set(
        nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
        .query("r_name == @region")["n_nationkey"].tolist())
    sup = T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: b.filter(pa.array(np.isin(
            b["s_nationkey"].to_numpy(zero_copy_only=False),
            list(region_keys)))).select(["s_suppkey"]),
        batch_format="pyarrow")
    sup = _compact_small(sup)
    if sup is None:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "best_suppkey": pd.Series([], dtype="int64"),
                             "min_cost": pd.Series([], dtype="int64")})
    pairs = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        ["l_partkey", "l_suppkey"], {"_n": (None, "count")})
    j = pairs.join(sup, "inner", num_partitions=JOIN_PARTS,
                   on=("l_suppkey",), right_on=("s_suppkey",))

    def _pack(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        cost = (pk * 31 + sk * 17) % 10_000 + 1
        return pa.table({
            "l_partkey": pa.array(pk.astype(np.int64), pa.int64()),
            "packed": pa.array((cost.astype(np.int64) << 32)
                               + sk.astype(np.int64), pa.int64()),
        })

    best = fast_groupby_agg(
        j.map_batches(_pack, batch_format="pyarrow"),
        ["l_partkey"], {"packed": ("packed", "min")})
    return best.map_batches(
        lambda b: pa.table({
            "p_partkey": b["l_partkey"],
            "best_suppkey": pa.array(
                b["packed"].to_numpy(zero_copy_only=False)
                & ((1 << 32) - 1), pa.int64()),
            "min_cost": pa.array(
                b["packed"].to_numpy(zero_copy_only=False) >> 32,
                pa.int64()),
        }),
        batch_format="pyarrow")


def q_q1_pricing_summary(sf_dir):
    """TPC-H Q1 (full shape, all eight aggregates): the pricing summary
    report over lineitem shipped on or before the cutoff, grouped by
    (returnflag, linestatus). Every money sum is ONE per-row float
    expression quantized to integer cents before the sum, and the three
    averages divide exact integer sums (double/double, mirrored in the
    oracle) — so block/batch association order cannot move any output
    bit. Plan: map-side fold to per-block (flag, status) partials (the
    key domain is ~6 pairs), one tiny groupby-sum exchange, vectorized
    finalize. Reference parity: the widest grouped-aggregate shape in
    the engine (the reference's tournament summary,
    ui/streamlit_ui.py:164-167, stops at three aggregates)."""
    cutoff = np.datetime64("2001-09-01").astype("datetime64[ns]").view("int64")
    ds = T(sf_dir, "lineitem",
           ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate"])

    def _fold(b: pa.Table) -> pa.Table:
        t = b.filter(pa.array(_ts_ns(b["l_shipdate"]) <= cutoff))
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        tax = t["l_tax"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_pandas(),
            "l_linestatus": t["l_linestatus"].to_pandas(),
            "sum_qty_fp": _round_half_away(qty * 100.0).astype(np.int64),
            "sum_base_fp": _round_half_away(price * 100.0).astype(np.int64),
            "sum_disc_price_fp": _round_half_away(
                price * (1.0 - disc) * 100.0).astype(np.int64),
            "sum_charge_fp": _round_half_away(
                price * (1.0 - disc) * (1.0 + tax) * 100.0
            ).astype(np.int64),
            "sum_disc_fp": _round_half_away(disc * 10_000.0).astype(np.int64),
            "count_order": np.ones(len(qty), np.int64),
        })
        g = (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
             .sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = ["sum_qty_fp", "sum_base_fp", "sum_disc_price_fp",
            "sum_charge_fp", "sum_disc_fp", "count_order"]
    agg = fast_groupby_agg(
        ds.map_batches(_fold, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"], {c: (c, "sum") for c in sums})

    def _finalize(b: pa.Table) -> pa.Table:
        n = b["count_order"].to_numpy(zero_copy_only=False).astype(np.float64)
        q = b["sum_qty_fp"].to_numpy(zero_copy_only=False)
        p = b["sum_base_fp"].to_numpy(zero_copy_only=False)
        d = b["sum_disc_fp"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty_fp": b["sum_qty_fp"],
            "sum_base_fp": b["sum_base_fp"],
            "sum_disc_price_fp": b["sum_disc_price_fp"],
            "sum_charge_fp": b["sum_charge_fp"],
            "avg_qty_fp": pa.array(_round_half_away(
                1e4 * (q / (100.0 * n))).astype(np.int64)),
            "avg_price_fp": pa.array(_round_half_away(
                1e4 * (p / (100.0 * n))).astype(np.int64)),
            "avg_disc_fp": pa.array(_round_half_away(
                1e4 * (d / (10_000.0 * n))).astype(np.int64)),
            "count_order": b["count_order"],
        })

    return agg.map_batches(_finalize, batch_format="pyarrow")


def q_q4_order_priority(sf_dir):
    """TPC-H Q4 shape (adapted: the synthetic lineitem has no
    commitdate/receiptdate, so the "late" EXISTS predicate is
    l_shipdate > o_orderdate): count of orders per priority in one
    quarter having at least one late-shipped line. Plan: the EXISTS
    collapses to ONE mergeable per-order max(ship_ns) partial aggregate
    on the fact side — no row-level semi-join fan-out — then a
    fact⋈fact hash join against the window-filtered orders and a
    grouped count over the 5-value priority domain. All-integer ns
    comparisons on both sides."""
    lo = np.datetime64("1997-01-01").astype("datetime64[ns]").view("int64")
    hi = np.datetime64("1997-04-01").astype("datetime64[ns]").view("int64")
    last_ship = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
            lambda b: pa.table({
                "l_orderkey": b["l_orderkey"],
                "ship_ns": pa.array(_ts_ns(b["l_shipdate"]), pa.int64()),
            }),
            batch_format="pyarrow"),
        ["l_orderkey"], {"max_ship_ns": ("ship_ns", "max")})

    def _win(b: pa.Table) -> pa.Table:
        ons = _ts_ns(b["o_orderdate"])
        t = b.filter(pa.array((ons >= lo) & (ons < hi)))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_orderpriority": t["o_orderpriority"],
            "order_ns": pa.array(_ts_ns(t["o_orderdate"]), pa.int64()),
        })

    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        _win, batch_format="pyarrow")
    j = orders.join(last_ship, "inner", num_partitions=JOIN_PARTS,
                    on=("o_orderkey",), right_on=("l_orderkey",))
    late = j.map_batches(
        lambda b: b.filter(
            pc.greater(b["max_ship_ns"], b["order_ns"])
        ).select(["o_orderpriority"]),
        batch_format="pyarrow")
    return fast_groupby_agg(late, ["o_orderpriority"],
                            {"order_count": (None, "count")})


def q_q11_important_parts(sf_dir):
    """TPC-H Q11 shape (adapted: no partsupp table, so "value" is the
    discounted revenue a part actually moved in lineitem): parts whose
    share of total value exceeds 4/3 of the MEAN share (the TPC-H
    fraction is FRACTION/SF for exactly this reason — a fixed fraction
    degenerates as the part count grows; a mean-relative one is
    scale-free) — the correlated scalar subquery decorrelated into a
    per-part integer cent-sum plus ONE streaming scalar aggregate.
    The comparison is all-integer cross-multiplication
    (value_fp·n_parts·3 > total·4), so no division or float appears.
    Plan: map-side per-part partials → small groupby (|part| rows) →
    scalar total via Dataset.aggregate → closure-scalar filter. The
    per-part table never lands on the driver."""
    from ray.data.aggregate import Sum

    v = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_partkey", "l_extendedprice", "l_discount"]).map_batches(
            lambda b: pa.table({
                "partkey": b["l_partkey"],
                "value_fp": pa.array(_round_half_away(
                    b["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
                    * 100.0).astype(np.int64)),
            }),
            batch_format="pyarrow"),
        ["partkey"], {"value_fp": ("value_fp", "sum")})
    from ray.data.aggregate import Count

    agg = v.aggregate(Sum("value_fp", alias_name="t"),
                      Count(alias_name="np"))
    total, np_ = int(agg["t"]), int(agg["np"])
    return v.map_batches(
        lambda b: b.filter(pa.array(
            b["value_fp"].to_numpy(zero_copy_only=False) * (np_ * 3)
            > total * 4)),
        batch_format="pyarrow")


def q_q12_priority_by_returnflag(sf_dir):
    """TPC-H Q12 shape (adapted: the synthetic lineitem has no shipmode,
    so the line-class axis is l_returnflag): per returnflag, how many
    1998-shipped lines belong to high-priority (1-URGENT / 2-HIGH)
    orders vs not. Plan: orders project to (key, is_high∈{0,1}) —
    ONE int column through the fact⋈fact hash exchange — and the
    grouped sum runs over the 3-value returnflag domain. All integers."""
    lo = np.datetime64("1998-01-01").astype("datetime64[ns]").view("int64")
    hi = np.datetime64("1999-01-01").astype("datetime64[ns]").view("int64")
    li = T(sf_dir, "lineitem",
           ["l_orderkey", "l_returnflag", "l_shipdate"]).map_batches(
        lambda b: b.filter(pa.array(
            (_ts_ns(b["l_shipdate"]) >= lo)
            & (_ts_ns(b["l_shipdate"]) < hi)
        )).select(["l_orderkey", "l_returnflag"]),
        batch_format="pyarrow")
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda b: pa.table({
            "o_orderkey": b["o_orderkey"],
            "is_high": pc.cast(pc.is_in(
                b["o_orderpriority"],
                value_set=pa.array(["1-URGENT", "2-HIGH"])), pa.int64()),
        }),
        batch_format="pyarrow")
    j = li.join(orders, "inner", num_partitions=JOIN_PARTS,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def _fold(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": b["l_returnflag"].to_pandas(),
            "high_line_count": b["is_high"].to_numpy(zero_copy_only=False),
        })
        df["low_line_count"] = 1 - df["high_line_count"]
        g = df.groupby("l_returnflag", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return fast_groupby_agg(
        j.map_batches(_fold, batch_format="pyarrow"),
        ["l_returnflag"], {"high_line_count": ("high_line_count", "sum"),
                           "low_line_count": ("low_line_count", "sum")})


def q_q20_excess_suppliers(sf_dir):
    """TPC-H Q20 shape (adapted: no partsupp/availqty, so "excess" is
    relative volume): suppliers from the low half of nations whose
    shipped quantity of 'red%'-named parts exceeds the mean share among
    those suppliers (the max is ≥ the mean, so the result is nonempty
    at every sf). The threshold is the all-integer cross-multiplication
    qty_fp·ns > total, so the fraction never becomes a float. Plan: part is a TRUE dimension →
    its target-partkey set broadcasts once per actor; the fact side
    folds to per-supplier integer partials; supplier attaches by hash
    join (supplier grows with data); (total, ns) come from ONE
    streaming scalar aggregate, never a driver row set."""
    from ray.data.aggregate import Count, Sum

    pref = ray.put(T(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
        lambda b: b.filter(pc.starts_with(b["p_name"], "red"))
        .select(["p_partkey"]),
        batch_format="pyarrow").to_arrow_refs())

    class _Fold:
        def __init__(self):
            t = pa.concat_tables(ray.get(ray.get(pref)))
            self.keys = t["p_partkey"].combine_chunks()

        def __call__(self, b: pa.Table) -> pa.Table:
            hit = pc.is_valid(
                pc.index_in(b["l_partkey"], value_set=self.keys))
            t = b.filter(hit)
            df = pd.DataFrame({
                "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "qty_fp": _round_half_away(
                    t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
                ).astype(np.int64),
            })
            g = df.groupby("l_suppkey", sort=False).sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

    v = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_partkey", "l_suppkey", "l_quantity"]).map_batches(
            _Fold, batch_format="pyarrow", concurrency=(1, 4)),
        ["l_suppkey"], {"qty_fp": ("qty_fp", "sum")})
    sup = _compact_small(T(sf_dir, "supplier",
                           ["s_suppkey", "s_name", "s_nationkey"]).map_batches(
        lambda b: b.filter(pc.less(b["s_nationkey"], 13))
        .select(["s_suppkey", "s_name"]),
        batch_format="pyarrow"))
    if sup is None:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object"),
                             "qty_fp": pd.Series([], dtype="int64")})
    s = v.join(sup, "inner", num_partitions=JOIN_PARTS,
               on=("l_suppkey",), right_on=("s_suppkey",))
    tot = s.aggregate(Sum("qty_fp", alias_name="total"),
                      Count(alias_name="ns"))
    if not tot or tot.get("total") is None:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object"),
                             "qty_fp": pd.Series([], dtype="int64")})
    total, ns = int(tot["total"]), int(tot["ns"])
    return s.map_batches(
        lambda b: pa.table({
            "s_suppkey": b["l_suppkey"],
            "s_name": b["s_name"],
            "qty_fp": b["qty_fp"],
        }).filter(pa.array(
            b["qty_fp"].to_numpy(zero_copy_only=False) * ns > total)),
        batch_format="pyarrow")


def q_embedding_covariance(sf_dir):
    """Exact d×d covariance over the embedding column, as the all-integer
    statistic n·S_ij − S_i·S_j on ×1e4-quantized components (float32 →
    float64 is exact, ONE float multiply before the quantize). The d²
    result is constant-sized (d=64 → 2080 upper-triangle cells), so the
    only thing that ever moves is one (d×d + d + 1)-int partial per
    block. Plan: per-block numpy Q^T·Q (vectorized matmul on the
    zero-copy list buffer), long-form partials keyed (i, j), one tiny
    groupby-sum, integer finalize. The ×1e4 scale keeps q_i·q_j ≈ 1e8,
    so the int64 sum is overflow-safe to ~9×10^10 rows."""

    def _partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = la.values.to_numpy(zero_copy_only=False).astype(np.float64)
        d = 64
        q = _round_half_away(flat * 1e4).astype(np.int64).reshape(-1, d)
        s_ij = q.T @ q                      # d×d integer partial
        s_i = q.sum(axis=0)
        iu, ju = np.triu_indices(d)
        i = np.concatenate([iu + 1, np.arange(1, d + 1), [0]])
        j = np.concatenate([ju + 1, np.zeros(d, np.int64), [0]])
        s = np.concatenate([s_ij[iu, ju], s_i, [q.shape[0]]])
        return pa.table({"i": pa.array(i, pa.int64()),
                         "j": pa.array(j, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    agg = fast_groupby_agg(
        T(sf_dir, "embeddings", ["embedding"]).map_batches(
            _partial, batch_format="pyarrow"),
        ["i", "j"], {"s": ("s", "sum")})

    def _finalize(b: pa.Table) -> pa.Table:
        # constant-size (d²+d+1 rows) — decode the packed partial rows
        df = b.to_pandas()
        n = int(df.loc[(df["i"] == 0) & (df["j"] == 0), "s"].iloc[0])
        sums = (df[(df["j"] == 0) & (df["i"] > 0)]
                .set_index("i")["s"].to_dict())
        p = df[(df["i"] > 0) & (df["j"] > 0)]
        cov = (n * p["s"].to_numpy()
               - np.array([sums[i] for i in p["i"]])
               * np.array([sums[j] for j in p["j"]]))
        return pa.table({
            "i": pa.array(p["i"].to_numpy(), pa.int64()),
            "j": pa.array(p["j"].to_numpy(), pa.int64()),
            "cov_n2_fp": pa.array(cov, pa.int64()),
        })

    return agg.repartition(1).map_batches(
        _finalize, batch_format="pyarrow", batch_size=None)


def q_weighted_median(sf_dir):
    """Per-returnflag revenue-weighted median quantity: the smallest
    quantity v with 2·cumweight(v) ≥ totalweight, weights = exact
    integer cents. NO row sort anywhere: the value domain is collapsed
    map-side to a (flag, qty_fp) weight histogram (bounded by the
    distinct-quantity domain, not row count), and the rank rule runs
    over that tiny histogram. Mirrors the trimmed_mean/quantile_norm
    histogram-rank pattern; all integers end to end."""

    def _fold(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": b["l_returnflag"].to_pandas(),
            "v": _round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64),
            "wt": _round_half_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64),
        })
        g = (df.groupby(["l_returnflag", "v"], sort=False)["wt"]
             .sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_returnflag", "l_quantity", "l_extendedprice"]).map_batches(
            _fold, batch_format="pyarrow"),
        ["l_returnflag", "v"], {"wt": ("wt", "sum")})

    def _rank(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["l_returnflag", "v"])
        out = []
        for flag, g in df.groupby("l_returnflag", sort=True):
            vs = g["v"].to_numpy()
            cw = np.cumsum(g["wt"].to_numpy())
            out.append({"l_returnflag": flag,
                        "wmedian_fp": int(vs[np.argmax(2 * cw >= cw[-1])])})
        return pa.Table.from_pandas(pd.DataFrame(out), preserve_index=False)

    return hist.repartition(1).map_batches(
        _rank, batch_format="pyarrow", batch_size=None)


def q_store_time_travel(sf_dir):
    """Snapshot-isolation time travel over the engine's own epoch store
    (sources/store.py — atomic tmp+rename partitions + manifest, the
    resumable-output/lineage contract): orders land in three epochs
    (epoch k = o_orderkey % 3 == k), then the table is read AS OF each
    epoch and aggregated. Because an epoch is either fully renamed in or
    absent, the as-of cut is exact — the oracle recomputes each cut as
    the modulo predicate. Epoch writes stream (write_epoch consumes the
    Dataset); each as-of read is a pruned parquet scan of ≤k epochs."""
    import shutil

    from ray.data.aggregate import Count, Sum

    from ..sources import store

    root = "/tmp/fcray_time_travel"
    shutil.rmtree(root, ignore_errors=True)
    src = T(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda b: b.append_column("total_cents", pa.array(
            _round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64))),
        batch_format="pyarrow")
    for k in range(3):
        part = src.map_batches(
            lambda b, k=k: b.filter(pa.array(
                b["o_orderkey"].to_numpy(zero_copy_only=False) % 3 == k
            )).select(["o_orderkey", "total_cents"]),
            batch_format="pyarrow")
        store.write_epoch(part, root, "orders", k)
    rows = []
    for e in range(3):
        ds = store.read_all(root, "orders", max_epoch=e,
                            columns=["total_cents"])
        agg = ds.aggregate(Count(alias_name="n_rows"),
                           Sum("total_cents", alias_name="total_cents"))
        rows.append({"as_of_epoch": e, "n_rows": int(agg["n_rows"]),
                     "total_cents": int(agg["total_cents"])})
    shutil.rmtree(root, ignore_errors=True)
    return pd.DataFrame(rows)


def q_cumulative_users(sf_dir):
    """Per-day cumulative distinct users (the audience-growth curve):
    distinct-counting under a running window collapses to "count each
    user once, on their FIRST day" — a mergeable per-user min, then a
    day histogram and one cumsum over the tiny day domain. No window
    fan-out, no per-day distinct sets."""
    first = fast_groupby_agg(
        T(sf_dir, "events", ["user_id", "ts"]).map_batches(
            lambda b: pa.table({
                "user_id": b["user_id"],
                "day": pa.array(_ts_ns(b["ts"]) // 86_400_000_000_000,
                                pa.int64()),
            }),
            batch_format="pyarrow"),
        ["user_id"], {"day": ("day", "min")})
    hist = fast_groupby_agg(first, ["day"], {"n": (None, "count")})

    def _cum(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values("day")
        return pa.table({
            "day": pa.array(df["day"].to_numpy(), pa.int64()),
            "cum_users": pa.array(np.cumsum(df["n"].to_numpy()),
                                  pa.int64()),
        })

    return hist.repartition(1).map_batches(
        _cum, batch_format="pyarrow", batch_size=None)


DAY_NS = 86_400_000_000_000


def q_max_concurrency(sf_dir, dur_ns: int = 1_800_000_000_000):
    """Per-day peak concurrency of 30-minute event intervals — the
    sweep-line operator, made scale-safe by TIME partitioning instead of
    a global sort: each interval emits clipped (+1, −1) boundaries into
    every day it overlaps (≤2 with a sub-day duration — the halo), so
    each day's sweep is independent and runs vectorized inside one
    map_groups over that day's boundaries (bounded by per-day event
    volume, the documented partition assumption). Touching intervals
    count as concurrent (+1 sorts before −1 at equal t; mirrored as
    ORDER BY t, d DESC in the oracle), EXCEPT a pair touching exactly
    at a day boundary: the ending interval lives only in the earlier
    day (its next-day clip is empty), so midnight-exact touches are
    not concurrent — on µs event data this is measure-zero, and the
    oracle applies the identical clip. All-integer ns arithmetic."""
    ev = T(sf_dir, "events", ["ts"])

    def _bounds(b: pa.Table) -> pa.Table:
        s = _ts_ns(b["ts"])
        e = s + dur_ns
        d0 = s // DAY_NS
        d1 = e // DAY_NS
        # first-day part: [s, min(e, day_end)) — always nonempty
        hi0 = np.minimum(e, (d0 + 1) * DAY_NS)
        # spillover part: [day_start, e), only when it crosses midnight
        # with a nonzero remainder
        cross = (d1 > d0) & (e > d1 * DAY_NS)
        lo1 = d1[cross] * DAY_NS
        day = np.concatenate([d0, d0, d1[cross], d1[cross]])
        t = np.concatenate([s, hi0, lo1, e[cross]])
        n0, n1 = len(s), int(cross.sum())
        dd = np.concatenate([np.ones(n0, np.int64),
                             -np.ones(n0, np.int64),
                             np.ones(n1, np.int64),
                             -np.ones(n1, np.int64)])
        return pa.table({"day": pa.array(day, pa.int64()),
                         "t": pa.array(t, pa.int64()),
                         "d": pa.array(dd, pa.int64())})

    bounds = ev.map_batches(_bounds, batch_format="pyarrow")

    def _sweep(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((-g["d"].to_numpy(), g["t"].to_numpy()))
        run = np.cumsum(g["d"].to_numpy()[order])
        return pd.DataFrame({"day": [int(g["day"].iloc[0])],
                             "peak": [int(run.max())]})

    return bounds.groupby("day").map_groups(
        _sweep, batch_format="pandas")


def q_pca_top_component(sf_dir, iters: int = 60):
    """Top principal component of the embedding corpus: the distributed
    pass is q_embedding_covariance's fold into the EXACT integer
    n·S_ij − S_i·S_j statistic (constant d×d size); the eigen-iteration
    then runs on that d×d matrix — dimension-sized math, corpus never
    revisited. Power iteration from a fixed start, sign-normalized on
    the largest-|loading| coordinate. Rows-only (iterative); the
    Rayleigh-dominance gate (λ₁ ≥ every single-axis variance) is
    asserted in-query so a regression fails the run."""
    cov = q_embedding_covariance(sf_dir).to_pandas()
    d = int(cov["i"].max())
    m = np.zeros((d, d))
    m[cov["i"] - 1, cov["j"] - 1] = cov["cov_n2_fp"]
    m[cov["j"] - 1, cov["i"] - 1] = cov["cov_n2_fp"]
    scale = np.abs(m).max()
    a = m / scale  # condition the iteration; eigenvectors unchanged
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        w = a @ v
        v = w / np.linalg.norm(w)
    lam = float(v @ a @ v) * scale
    assert lam >= m.diagonal().max() - 1e-6 * scale, \
        "power iteration lost Rayleigh dominance"
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    return pd.DataFrame({
        "dim": np.arange(1, d + 1, dtype=np.int64),
        "loading_x1e6": np.round(v * 1e6).astype(np.int64),
    })


def q_hll_union_intersect(sf_dir):
    """HLL set algebra: the distinct audiences of 'click' and 'view'
    events, their UNION (elementwise register max — the merge HLL is
    closed under) and their INTERSECTION via inclusion–exclusion.
    This is the 100-TB audience-overlap path: three 16 KiB sketches
    instead of a distinct-pair shuffle. Exact counterparts are computed
    engine-side for the gate: union rel-err must stay inside the HLL
    bound, intersection abs-err inside 5% of the union (IE error
    compounds — the documented weakness of sketch intersection).
    Rows-only (randomized summary)."""
    from ..functions.sketches import hll_estimate, hll_partial

    def _sketch(event_type: str) -> np.ndarray:
        ds = T(sf_dir, "events", ["user_id", "event_type"]).map_batches(
            lambda b: pa.table({"user_id": b["user_id"].filter(
                pc.equal(b["event_type"], event_type))}),
            batch_format="pyarrow")
        parts = ds.map_batches(
            lambda b: pa.table({"regs": pa.array(
                [hll_partial(b["user_id"].to_numpy(
                    zero_copy_only=False).astype(np.uint64)).tobytes()],
                pa.binary())}),
            batch_format="pyarrow")
        return _tree_reduce_buffers(parts, "regs", np.maximum, np.uint8)

    ra, rb = _sketch("click"), _sketch("view")
    est_a, est_b = hll_estimate(ra), hll_estimate(rb)
    est_union = hll_estimate(np.maximum(ra, rb))
    est_inter = est_a + est_b - est_union

    def _exact(types: tuple) -> int:
        ds = T(sf_dir, "events", ["user_id", "event_type"]).map_batches(
            lambda b: pa.table({"user_id": b["user_id"].filter(
                pc.is_in(b["event_type"],
                         value_set=pa.array(list(types))))}),
            batch_format="pyarrow")
        return fast_groupby_agg(ds, ["user_id"],
                                {"__n": (None, "count")}).count()

    ex_a, ex_b = _exact(("click",)), _exact(("view",))
    ex_union = _exact(("click", "view"))
    ex_inter = ex_a + ex_b - ex_union
    assert abs(est_union - ex_union) / max(ex_union, 1) < 0.025, \
        (est_union, ex_union)
    assert abs(est_inter - ex_inter) <= 0.05 * max(ex_union, 1), \
        (est_inter, ex_inter)
    return pd.DataFrame([{
        "est_a": float(est_a), "est_b": float(est_b),
        "est_union": float(est_union), "est_intersect": float(est_inter),
        "exact_a": ex_a, "exact_b": ex_b, "exact_union": ex_union,
        "exact_intersect": ex_inter,
    }])


def q_session_paths(sf_dir, gap_ns: int = 1_800_000_000_000, topn: int = 20):
    """Top event-type TRIGRAM paths within sessions (the clickstream
    path-mining shape): per user, events sessionize on a 30-min gap,
    each session contributes its consecutive type-trigrams, and the
    global top-20 paths are ranked (count desc, then lexicographic —
    a total order, so the cut is deterministic). Plan: per-user sorted
    map_groups (bounded per-user volume — the engine's documented
    per-key assumption) emits trigram PARTIAL counts; the exchange is
    the ≤|types|³ path matrix; top-20 sorts that tiny domain."""

    _empty = pa.table({"t1": pa.array([], pa.string()),
                       "t2": pa.array([], pa.string()),
                       "t3": pa.array([], pa.string()),
                       "n": pa.array([], pa.int64())})

    def _paths(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["ts", "event_id"])
        if len(g) < 3:
            return _empty
        t = g["ts"].to_numpy().astype("datetime64[ns]").view("int64")
        brk = np.zeros(len(g), np.int64)
        brk[1:] = (np.diff(t) > gap_ns).astype(np.int64)
        sess = np.cumsum(brk)
        ok = np.arange(len(g) - 2)
        same = (sess[ok] == sess[ok + 1]) & (sess[ok] == sess[ok + 2])
        i = ok[same]
        if len(i) == 0:
            return _empty
        et = g["event_type"].to_numpy()
        df = pd.DataFrame({"t1": et[i], "t2": et[i + 1], "t3": et[i + 2]})
        out = (df.groupby(["t1", "t2", "t3"], sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    ev = T(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    partial = ev.groupby("user_id").map_groups(
        _paths, batch_format="pandas")
    agg = fast_groupby_agg(partial, ["t1", "t2", "t3"],
                           {"n": ("n", "sum")})
    return (agg.sort(["n", "t1", "t2", "t3"],
                     descending=[True, False, False, False])
            .limit(topn))


def q_cdc_merge_delete(sf_dir):
    """CDC MERGE with deletes (lakehouse change-log apply): a base
    snapshot (v0) + a derived update stream (every 7th order re-priced,
    v1) + a delete stream (every 11th order tombstoned, v2) compact to
    one surviving row per key. All channels are emitted in ONE pass
    over the input; the mergeable grouped top-1 by version keeps the
    latest op map-side, and tombstones filter AFTER the merge — so a
    delete wins over any earlier update, the MERGE semantic. Integer
    cents throughout."""
    from ..stages.fastagg import grouped_topk

    orders = T(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _channels(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        upd = (k % 7) == 0
        dele = (k % 11) == 0
        return pa.table({
            "o_orderkey": pa.array(
                np.concatenate([k, k[upd], k[dele]]), pa.int64()),
            "price_fp": pa.array(
                np.concatenate([p, p[upd] + 100_000,
                                np.zeros(int(dele.sum()), np.int64)]),
                pa.int64()),
            "version": pa.array(
                np.concatenate([np.zeros(len(k), np.int64),
                                np.ones(int(upd.sum()), np.int64),
                                np.full(int(dele.sum()), 2, np.int64)]),
                pa.int64()),
            "is_delete": pa.array(
                np.concatenate([np.zeros(len(k) + int(upd.sum()),
                                         np.int64),
                                np.ones(int(dele.sum()), np.int64)]),
                pa.int64()),
        })

    log = orders.map_batches(_channels, batch_format="pyarrow")
    latest = grouped_topk(log, ["o_orderkey"], ["version"], [False], 1)
    return latest.map_batches(
        lambda b: b.filter(pc.equal(b["is_delete"], 0))
        .select(["o_orderkey", "price_fp"]),
        batch_format="pyarrow")


def q_balanced_downsample(sf_dir):
    """Class-balanced downsampling of the labeled embedding corpus:
    every label keeps exactly min-class-count rows, chosen in
    deterministic md5(vec_id) order — reproducible at any cluster
    size/retry, unlike a random sample, and oracle-exact. Plan: the
    per-label counts are one tiny groupby (label domain); the selection
    is the mergeable grouped top-k by (md5 hex, vec_id), so only
    k-row partials per block move."""
    from ..stages.fastagg import grouped_topk

    counts = fast_groupby_agg(
        T(sf_dir, "embeddings", ["label"]),
        ["label"], {"n": (None, "count")}).to_pandas()
    k = int(counts["n"].min())

    def _hash(b: pa.Table) -> pa.Table:
        h = [hashlib.md5(str(i).encode()).hexdigest()
             for i in b["vec_id"].to_pylist()]
        return pa.table({"vec_id": b["vec_id"], "label": b["label"],
                         "h": pa.array(h, pa.string())})

    hashed = T(sf_dir, "embeddings", ["vec_id", "label"]).map_batches(
        _hash, batch_format="pyarrow")
    picked = grouped_topk(hashed, ["label"], ["h", "vec_id"],
                          [True, True], k)
    return picked.select_columns(["label", "vec_id"])


def q_target_encode_loo(sf_dir):
    """Leave-one-out target (mean) encoding of o_orderpriority against
    the order total — the categorical-feature trick that avoids
    leaking each row's own target: enc = (S_g − x)/(n_g − 1) on exact
    integer cent sums, ×1e6 quantized after ONE mirrored float
    division. Plan: per-category (S, n) is a tiny groupby broadcast
    back via closure (category domain is 5); the encode itself is a
    pure map — no row ever moves twice."""
    o = T(sf_dir, "orders", ["o_orderkey", "o_orderpriority",
                             "o_totalprice"])
    stats = fast_groupby_agg(
        o.map_batches(
            lambda b: pa.table({
                "o_orderpriority": b["o_orderpriority"],
                "cents": pa.array(_round_half_away(
                    b["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)),
            }),
            batch_format="pyarrow"),
        ["o_orderpriority"], {"s": ("cents", "sum"),
                              "n": (None, "count")}).to_pandas()
    smap = dict(zip(stats["o_orderpriority"],
                    zip(stats["s"], stats["n"])))

    def _encode(b: pa.Table) -> pa.Table:
        cents = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        pr = b["o_orderpriority"].to_pylist()
        s = np.array([smap[p][0] for p in pr], np.int64)
        n = np.array([smap[p][1] for p in pr], np.int64)
        enc = _round_half_away(
            1e6 * ((s - cents).astype(np.float64)
                   / (n - 1).astype(np.float64))).astype(np.int64)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "loo_enc_fp": pa.array(enc, pa.int64())})

    return o.map_batches(_encode, batch_format="pyarrow")


def q_collapse_runs(sf_dir):
    """Run-length collapse of consecutive duplicate event types per
    user (the event-stream de-bounce): per user, count events and RUNS
    (a run starts where the type differs from its predecessor in
    (ts, event_id) order). Per-user sorted map_groups, one vectorized
    shift-compare per group; the exchange is one row per user."""

    def _runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        starts = 1 + int((et[1:] != et[:-1]).sum()) if len(et) else 0
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_events": np.array([len(g)], np.int64),
                             "n_runs": np.array([starts], np.int64)})

    ev = T(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return ev.groupby("user_id").map_groups(_runs, batch_format="pandas")


def q_info_gain(sf_dir):
    """Information gain of o_orderpriority → o_orderstatus (the
    entropy-based feature-selection score): IG = ln N + (Σ_xy c·ln c −
    Σ_x n·ln n − Σ_y c·ln c)/N, every c·ln c term libm-ln of an EXACT
    integer count quantized ×1e9 BEFORE the sums (grouped_entropy's
    policy — numpy SIMD log can differ from DuckDB's libm by 1 ulp).
    The distributed work is ONE (x, y) contingency fold; everything
    after is domain-sized."""
    cont = fast_groupby_agg(
        T(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"]),
        ["o_orderpriority", "o_orderstatus"], {"c": (None, "count")}
    ).to_pandas()  # |X|×|Y| rows — domain-sized, not data-sized

    def _slnsum(counts) -> int:
        return int(sum(
            int(_round_half_away(np.array(
                [c * math.log(float(c)) * 1e9]))[0])
            for c in counts if c > 0))

    n = int(cont["c"].sum())
    s_xy = _slnsum(cont["c"])
    s_x = _slnsum(cont.groupby("o_orderpriority")["c"].sum())
    s_y = _slnsum(cont.groupby("o_orderstatus")["c"].sum())
    ig = math.log(float(n)) + ((s_xy - s_x - s_y) / 1e9) / n
    return pd.DataFrame([{
        "n": n,
        "ig_fp": int(_round_half_away(np.array([ig * 1e6]))[0]),
    }])


def q_label_centroids(sf_dir):
    """Per-class mean embedding (the class-prototype primitive behind
    nearest-centroid classification and SemDeDup cluster seeding),
    exact: components quantize ×1e4 (float32→float64 exact, one
    multiply), per-(label, dim) integer sums + counts fold map-side
    (the partial is ≤ |labels|·(d+1) ints per block), and the mean is
    ONE mirrored float division emitted ×1e6."""

    def _fold(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        la = (col.combine_chunks()
              if isinstance(col, pa.ChunkedArray) else col)
        d = 64
        q = _round_half_away(la.values.to_numpy(
            zero_copy_only=False).astype(np.float64) * 1e4
        ).astype(np.int64).reshape(-1, d)
        lab = b["label"].to_numpy(zero_copy_only=False)
        labs, dims, sums, ns = [], [], [], []
        for lv in np.unique(lab):
            rows = q[lab == lv]
            labs.extend([int(lv)] * d)
            dims.extend(range(1, d + 1))
            sums.extend(rows.sum(axis=0).tolist())
            ns.extend([rows.shape[0]] * d)
        return pa.table({"label": pa.array(labs, pa.int64()),
                         "dim": pa.array(dims, pa.int64()),
                         "s_fp": pa.array(sums, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    agg = fast_groupby_agg(
        T(sf_dir, "embeddings", ["label", "embedding"]).map_batches(
            _fold, batch_format="pyarrow"),
        ["label", "dim"], {"s_fp": ("s_fp", "sum"), "n": ("n", "sum")})

    def _mean(b: pa.Table) -> pa.Table:
        s = b["s_fp"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        mean = _round_half_away(
            1e6 * (s.astype(np.float64) / (1e4 * n.astype(np.float64)))
        ).astype(np.int64)
        return b.append_column("mean_fp", pa.array(mean, pa.int64()))

    return agg.map_batches(_mean, batch_format="pyarrow")


def q_resume_export(sf_dir):
    """Resumable partitioned export with skip-finished semantics (the
    100-TB output contract: a failed run must not rewrite completed
    partitions): pass 1 writes every order month through a staging dir,
    atomically renames each month partition into place and records a
    manifest marker; a simulated failure deletes two partitions (data +
    marker); the RESUME pass prunes finished months AT THE READ (row
    filter into read_parquet's scan) and writes only the missing ones.
    Survivor partitions are asserted byte-untouched (mtime + file set),
    and the read-back counts are oracle-checked — so both the skip
    logic and the data are value-verified, not just smoke-tested."""
    import shutil
    import tempfile

    import ray.data as rd

    root = tempfile.mkdtemp(prefix="fcray_resume_")
    data_d = os.path.join(root, "data")
    man_d = os.path.join(root, "manifest")
    os.makedirs(data_d), os.makedirs(man_d)

    def _write_missing():
        done = {f[:-5] for f in os.listdir(man_d) if f.endswith(".done")}
        stage = tempfile.mkdtemp(prefix="stage_", dir=root)
        ds = T(sf_dir, "orders",
               ["o_orderkey", "o_orderdate"]).map_batches(
            lambda b: pa.table({
                "o_orderkey": b["o_orderkey"],
                "month": pc.strftime(b["o_orderdate"], format="%Y-%m"),
            }),
            batch_format="pyarrow")
        if done:  # prune finished partitions before any byte moves
            ds = ds.map_batches(
                lambda b: b.filter(pc.invert(pc.is_in(
                    b["month"], value_set=pa.array(sorted(done))))),
                batch_format="pyarrow")
        ds.write_parquet(stage, partition_cols=["month"])
        wrote = []
        for d in sorted(os.listdir(stage)):
            if not d.startswith("month="):
                continue
            m = d.split("=", 1)[1]
            os.replace(os.path.join(stage, d), os.path.join(data_d, d))
            with open(os.path.join(man_d, f"{m}.done"), "w") as f:
                f.write("ok")
            wrote.append(m)
        shutil.rmtree(stage, ignore_errors=True)
        return wrote

    try:
        first = _write_missing()
        assert len(first) > 3
        lost = first[:2]
        for m in lost:
            shutil.rmtree(os.path.join(data_d, f"month={m}"))
            os.remove(os.path.join(man_d, f"{m}.done"))
        kept_state = {
            d: (os.path.getmtime(os.path.join(data_d, d)),
                tuple(sorted(os.listdir(os.path.join(data_d, d)))))
            for d in os.listdir(data_d)}
        second = _write_missing()
        assert sorted(second) == sorted(lost), (second, lost)
        for d, st in kept_state.items():
            now = (os.path.getmtime(os.path.join(data_d, d)),
                   tuple(sorted(os.listdir(os.path.join(data_d, d)))))
            assert now == st, f"resume rewrote finished partition {d}"
        back = rd.read_parquet(data_d)
        got = fast_groupby_agg(back, ["month"], {"n": (None, "count")})
        return got.map_batches(
            lambda b: pa.table({
                "month": pc.cast(b["month"], pa.string()),
                "n": b["n"],
            }),
            batch_format="pyarrow").to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_degree_assortativity(sf_dir):
    """Directed degree assortativity (out-degree of source vs in-degree
    of target, Pearson over edges) of the derived order graph — the
    network-structure scalar. Plan: two degree groupbys (node-sized),
    two fact-scale hash joins to attach degrees to edges, then EXACT
    int64 moments (n, Σx, Σy, Σxx, Σyy, Σxy) via map-side partial sums
    and ONE mirrored float tree ×1e6 (grouped_corr's policy — sqrt is
    IEEE-exact, the op order matches the SQL literally)."""
    from ray.data.aggregate import Sum as ASum

    n_nodes = T(sf_dir, "customer", ["c_custkey"]).count()
    # dst = k² mod n (NOT k mod n as in the pagerank graph): dense
    # orderkeys make k mod n perfectly uniform — in-degree variance 0
    # and the correlation undefined; quadratic residues repeat, so
    # in-degrees genuinely vary
    edges = T(sf_dir, "orders",
              ["o_orderkey", "o_custkey"]).map_batches(
        lambda b: pa.table({
            "src": pc.cast(b["o_custkey"], pa.int64()),
            "dst": pa.array(
                (b["o_orderkey"].to_numpy(zero_copy_only=False)
                 .astype(np.int64) ** 2) % n_nodes, pa.int64()),
        }),
        batch_format="pyarrow")
    od = fast_groupby_agg(edges, ["src"], {"x": (None, "count")})
    idg = fast_groupby_agg(edges, ["dst"], {"y": (None, "count")})
    j = edges.join(od, "inner", num_partitions=JOIN_PARTS, on=("src",)) \
             .join(idg, "inner", num_partitions=JOIN_PARTS, on=("dst",))
    mom = j.map_batches(
        lambda b: pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "sx": pa.array([int(b["x"].to_numpy(
                zero_copy_only=False).sum())], pa.int64()),
            "sy": pa.array([int(b["y"].to_numpy(
                zero_copy_only=False).sum())], pa.int64()),
            "sxx": pa.array([int((b["x"].to_numpy(zero_copy_only=False)
                                  ** 2).sum())], pa.int64()),
            "syy": pa.array([int((b["y"].to_numpy(zero_copy_only=False)
                                  ** 2).sum())], pa.int64()),
            "sxy": pa.array([int((b["x"].to_numpy(zero_copy_only=False)
                                  * b["y"].to_numpy(
                                      zero_copy_only=False)).sum())],
                            pa.int64()),
        }),
        batch_format="pyarrow")
    agg = mom.aggregate(*(ASum(c, alias_name=c)
                          for c in ("n", "sx", "sy", "sxx", "syy",
                                    "sxy")))
    f = {c: float(agg[c]) for c in ("n", "sx", "sy", "sxx", "syy",
                                    "sxy")}
    num = f["n"] * f["sxy"] - f["sx"] * f["sy"]
    den = (np.sqrt(f["n"] * f["sxx"] - f["sx"] * f["sx"])
           * np.sqrt(f["n"] * f["syy"] - f["sy"] * f["sy"]))
    fp = int(_round_half_away(np.array([1e6 * (num / den)]))[0])
    return pd.DataFrame([{"n": int(agg["n"]), "assort_fp": fp}])


def q_time_split_embargo(sf_dir):
    """Temporal train/test split with an embargo gap (leak-proof
    time-series CV): train strictly before 1997-01-01, a one-year
    embargo, test from 1998-01-01 — rows inside the gap are dropped so
    label leakage across the boundary is structurally impossible.
    Pure map + two tiny aggregates; per-split row/user counts and day
    bounds are the oracle-checked evidence."""
    t1 = np.datetime64("2024-01-11").astype("datetime64[ns]").view("int64")
    t2 = np.datetime64("2024-01-16").astype("datetime64[ns]").view("int64")

    def _tag(b: pa.Table) -> pa.Table:
        ts = _ts_ns(b["ts"])
        split = np.where(ts < t1, "train",
                         np.where(ts >= t2, "test", ""))
        keep = split != ""
        return pa.table({
            "split": pa.array(split[keep], pa.string()),
            "user_id": b["user_id"].filter(pa.array(keep)),
            "day": pa.array(ts[keep] // 86_400_000_000_000, pa.int64()),
        })

    tagged = T(sf_dir, "events", ["user_id", "ts"]).map_batches(
        _tag, batch_format="pyarrow")
    users = fast_groupby_agg(tagged, ["split", "user_id"],
                             {"_n": (None, "count")})
    nuser = fast_groupby_agg(users, ["split"],
                             {"n_users": (None, "count")})
    span = fast_groupby_agg(tagged, ["split"], {
        "n_rows": (None, "count"), "min_day": ("day", "min"),
        "max_day": ("day", "max")})
    # both sides are 2 rows — merge driver-side, no shuffle join
    return (span.to_pandas().merge(nuser.to_pandas(), on="split")
            .sort_values("split").reset_index(drop=True))


def q_pareto_8020(sf_dir):
    """Revenue concentration (the 80/20 cut): the smallest set of
    customers, taken in (revenue desc, custkey) order, whose exact
    integer cent sum reaches 80% of total — compared all-integer
    (5·cumsum ≥ 4·total), no float share ever computed. Plan: the
    distributed part is the per-customer cent fold (fact → key-sized);
    the ordered prefix scan then runs in ONE task over the
    customer-sized table (documented tier — at 100 TB the same scan is
    a distributed sort plus ordered per-block prefix partials)."""
    v = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            lambda b: pa.table({
                "o_custkey": b["o_custkey"],
                "cents": pa.array(_round_half_away(
                    b["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)),
            }),
            batch_format="pyarrow"),
        ["o_custkey"], {"cents": ("cents", "sum")})

    def _cut(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["cents", "o_custkey"], ascending=[False, True])
        c = df["cents"].to_numpy()
        total = int(c.sum())
        cum = np.cumsum(c)
        k = int(np.argmax(5 * cum >= 4 * total)) + 1
        return pa.table({
            "n_customers": pa.array([len(df)], pa.int64()),
            "k_top": pa.array([k], pa.int64()),
            "total_cents": pa.array([total], pa.int64()),
            "top_cents": pa.array([int(cum[k - 1])], pa.int64()),
        })

    return v.repartition(1).map_batches(
        _cut, batch_format="pyarrow", batch_size=None)


def q_clustering_coefficient(sf_dir):
    """Per-node local clustering coefficient of the derived order graph
    (2·tri(v) / deg(v)·(deg(v)−1)) — the third graph-structure
    primitive after PageRank and global triangles. Plan: adjacency =
    both orientations of the distinct edge list; wedges KEEP their
    center through the self-join (unlike q_triangle_count's min-center
    wedges) so the closing edge join yields per-center triangle counts
    directly; degrees are one node-sized groupby; the final left join
    is node-sized. One mirrored float division ×1e6; nodes with
    deg < 2 are excluded (coefficient undefined)."""
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
    deg = fast_groupby_agg(adj, ["c"], {"deg": (None, "count")})
    right = adj.map_batches(
        lambda b: b.rename_columns(["c_r", "nb2"]),
        batch_format="pyarrow")
    wedges = adj.join(right, "inner", num_partitions=JOIN_PARTS,
                      on=("c",), right_on=("c_r",)).map_batches(
        lambda b: b.filter(pc.less(b["nb"], b["nb2"]))
        .rename_columns(["c", "a", "b"]),
        batch_format="pyarrow")
    closed = wedges.join(
        edges.map_batches(lambda b: b.rename_columns(["a_r", "b_r"]),
                          batch_format="pyarrow"),
        "inner", num_partitions=JOIN_PARTS, on=("a", "b"),
        right_on=("a_r", "b_r"))
    tri = fast_groupby_agg(closed, ["c"], {"n_tri": (None, "count")})
    out = deg.join(tri, "left_outer", num_partitions=JOIN_PARTS, on=("c",))

    def _coef(b: pa.Table) -> pa.Table:
        d = b["deg"].to_numpy(zero_copy_only=False)
        t = pc.fill_null(b["n_tri"], 0).to_numpy(zero_copy_only=False)
        t = t.astype(np.int64)
        keep = d >= 2
        d, t, node = d[keep], t[keep], \
            b["c"].to_numpy(zero_copy_only=False)[keep]
        fp = _round_half_away(
            1e6 * ((2.0 * t) / (d * (d - 1)).astype(np.float64))
        ).astype(np.int64)
        return pa.table({"node": pa.array(node, pa.int64()),
                         "deg": pa.array(d, pa.int64()),
                         "n_tri": pa.array(t, pa.int64()),
                         "coef_fp": pa.array(fp, pa.int64())})

    return out.map_batches(_coef, batch_format="pyarrow")


def q_sampled_estimate(sf_dir):
    """Corpus statistics from a deterministic 1/4 hash sample with a
    Wilson 95% interval — the pattern for "estimate a property of
    100 TB without scanning it": the sample is md5-gated (reproducible,
    oracle-exact), the measured property is the long-document rate,
    and the estimate + interval are ONE mirrored float tree over exact
    integer counts (sqrt is IEEE-exact, 1.96 literal mirrored)."""
    ds = T(sf_dir, "documents", ["doc_id", "n_chars"])

    def _fold(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        in_sample = np.array(
            [hashlib.md5(str(i).encode()).hexdigest()[0] in "0123"
             for i in ids])
        long_doc = (b["n_chars"].to_numpy(zero_copy_only=False)
                    >= 300) & in_sample
        return pa.table({
            "n_sampled": pa.array([int(in_sample.sum())], pa.int64()),
            "n_long": pa.array([int(long_doc.sum())], pa.int64()),
            "n_total": pa.array([b.num_rows], pa.int64()),
        })

    from ray.data.aggregate import Sum

    parts = ds.map_batches(_fold, batch_format="pyarrow")
    agg = parts.aggregate(*(Sum(c, alias_name=c)
                            for c in ("n_sampled", "n_long", "n_total")))
    n, x = int(agg["n_sampled"]), int(agg["n_long"])
    total = int(agg["n_total"])
    z = 1.96
    p = x / n
    den = 1.0 + z * z / n
    center = (p + z * z / (2.0 * n)) / den
    half = (z * math.sqrt(p * (1.0 - p) / n
                          + z * z / (4.0 * (n * 1.0 * n)))) / den
    return pd.DataFrame([{
        "n_total": total, "n_sampled": n, "n_long_sampled": x,
        "est_long_total": int(_round_half_away(
            np.array([p * total]))[0]),
        "ci_lo_fp": int(_round_half_away(
            np.array([1e6 * (center - half)]))[0]),
        "ci_hi_fp": int(_round_half_away(
            np.array([1e6 * (center + half)]))[0]),
    }])


def q_containment_join(sf_dir, threshold: float = 0.8,
                       max_broadcast_vocab: int = SIM_JOIN_MAX_BROADCAST):
    """ASYMMETRIC containment self-join: ordered pairs (a, b) where
    |a ∩ b| / |a| ≥ θ over word-3-shingle sets — the near-subset
    detector (quotes, boilerplate wrappers, partial mirrors) that
    Jaccard misses: a tiny doc fully inside a huge one has J ≈ |a|/|b|,
    below any symmetric threshold. Candidate generation is the
    one-sided containment prefix theorem: index side stays FULL, probe
    side keeps only |a| − ⌈θ·|a|⌉ + 1 shingles in the global (df, hash)
    order (the exact prefix pass _prefix_rows_table already implements
    — reused verbatim). Candidates then verify EXACTLY by a
    two-hop join back through the shingle index (pair ⋈ a-rows ⋈
    b-rows on (b, sh) = true intersection counts); vocabulary-guarded
    broadcast with full-join fallback, like the Jaccard join."""
    docs = T(sf_dir, "documents", ["doc_id", "text"],
             target_block_mb=8, min_blocks=4)
    rows = docs.map_batches(_shingle_rows,
                            batch_format="pyarrow").materialize()
    thr_num, thr_den = int(threshold * 100), 100
    df_ds = fast_groupby_agg(rows, ["sh"], {"df": (None, "count")})
    if df_ds.count() <= max_broadcast_vocab:
        df_tbl = pa.concat_tables(ray.get(df_ds.to_arrow_refs()))
        h = df_tbl["sh"].combine_chunks().to_numpy(zero_copy_only=False)
        d = df_tbl["df"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        dfref = ray.put((h[order], d[order].astype(np.int64)))
        probe = rows.map_batches(
            lambda b: _prefix_rows_table(b, *ray.get(dfref),
                                         thr_num, thr_den),
            batch_format="pyarrow", batch_size=None)
    else:
        probe = rows  # full probe side — correct superset, no prefix
    index = rows.map_batches(
        lambda b: _shingle_rows_rename(b), batch_format="pyarrow")
    cand = fast_groupby_agg(
        probe.join(index, "inner", num_partitions=JOIN_PARTS,
                   on=("sh",), right_on=("sh_r",)).map_batches(
            lambda b: pa.table({
                "a": b["a"].filter(
                    pc.not_equal(b["a"], b["b_r"])),
                "b": b["b_r"].filter(
                    pc.not_equal(b["a"], b["b_r"])),
            }),
            batch_format="pyarrow"),
        ["a", "b"], {"_n": (None, "count")}).map_batches(
        lambda b: b.select(["a", "b"]), batch_format="pyarrow")
    # exact verify: pair ⋈ a-shingles, then ⋈ b-shingles on (b, sh)
    hop1 = cand.join(rows, "inner", num_partitions=JOIN_PARTS, on=("a",))
    inter = fast_groupby_agg(
        hop1.join(index, "inner", num_partitions=JOIN_PARTS,
                  on=("b", "sh"), right_on=("b_r", "sh_r")).map_batches(
            lambda b: b.select(["a", "b", "sz_a"]),
            batch_format="pyarrow"),
        ["a", "b"], {"inter": (None, "count"),
                     "sz_a": ("sz_a", "max")})

    def _score(b: pa.Table) -> pa.Table:
        i = b["inter"].to_numpy(zero_copy_only=False)
        sz = b["sz_a"].to_numpy(zero_copy_only=False)
        keep = i * thr_den >= thr_num * sz
        i, sz = i[keep], sz[keep]
        return pa.table({
            "a": b["a"].filter(pa.array(keep)),
            "b": b["b"].filter(pa.array(keep)),
            "inter": pa.array(i, pa.int64()),
            "containment_fp": pa.array(
                (i * 1_000_000) // sz, pa.int64()),
        })

    out = inter.map_batches(_score, batch_format="pyarrow").materialize()
    if out.count() == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "inter": pd.Series(dtype="int64"),
                             "containment_fp": pd.Series(dtype="int64")})
    return out


def _shingle_rows_rename(b: pa.Table) -> pa.Table:
    """(a, sh, sz_a) → (b_r, sh_r, sz_b) for the index side of the
    containment join (matches _shingle_rows' layout without
    re-tokenizing the corpus)."""
    return b.rename_columns(["b_r", "sh_r", "sz_b"])


def q_cascade_delete(sf_dir):
    """Referential cascade audit: deleting negative-balance customers
    must take their orders and those orders' lineitems with them — two
    chained hash anti-joins (each side projected to keys before the
    exchange), counted per table. The 'deleted customer keys' side is
    customer-scale, so it flows through the exchange, never the
    driver. (Counts use Dataset.count(), NOT Dataset.aggregate —
    Ray 2.49's global Aggregate silently returns 0 rows when planned
    on top of a left_semi/left_anti join output; .count() and
    map_batches execute the join correctly.)"""
    gone = T(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda b: b.filter(pc.less(b["c_acctbal"], 0.0))
        .select(["c_custkey"]),
        batch_format="pyarrow")
    surviving_orders = T(sf_dir, "orders",
                         ["o_orderkey", "o_custkey"]).join(
        gone, "left_anti", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))
    okeys = surviving_orders.map_batches(
        lambda b: b.select(["o_orderkey"]), batch_format="pyarrow")
    surviving_li = T(sf_dir, "lineitem", ["l_orderkey"]).join(
        okeys, "left_semi", num_partitions=JOIN_PARTS,
        on=("l_orderkey",), right_on=("o_orderkey",))
    n_cust_gone = gone.count()
    n_orders = surviving_orders.count()
    n_li = surviving_li.count()
    return pd.DataFrame([{
        "n_customers_deleted": int(n_cust_gone),
        "n_orders_surviving": int(n_orders),
        "n_lineitems_surviving": int(n_li),
    }])


def q_rollup_consistency(sf_dir):
    """Multi-granularity rollup consistency audit (the reconciliation
    check every reporting stack needs): daily, monthly, and yearly
    revenue cent-sums computed as three INDEPENDENT grouped plans over
    one shared quantized scan must re-aggregate to identical totals.
    The audit compares exact integers per granularity — a mismatch is
    a real pipeline bug, not float noise — and returns the per-
    granularity row the driver hashes."""
    folded = T(sf_dir, "orders",
               ["o_orderdate", "o_totalprice"]).map_batches(
        lambda b: pa.table({
            "day": pa.array(_ts_ns(b["o_orderdate"])
                            // 86_400_000_000_000, pa.int64()),
            "month": pc.strftime(b["o_orderdate"], format="%Y-%m"),
            "year": pc.strftime(b["o_orderdate"], format="%Y"),
            "cents": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False)
                * 100.0).astype(np.int64)),
        }),
        batch_format="pyarrow").materialize()
    rows = []
    for gran in ("day", "month", "year"):
        g = fast_groupby_agg(folded, [gran],
                             {"cents": ("cents", "sum"),
                              "n": (None, "count")})
        from ray.data.aggregate import Count, Sum

        agg = g.aggregate(Sum("cents", alias_name="s"),
                          Count(alias_name="groups"),
                          Sum("n", alias_name="n"))
        rows.append({"granularity": gran,
                     "n_groups": int(agg["groups"]),
                     "n_orders": int(agg["n"]),
                     "total_cents": int(agg["s"])})
    df = pd.DataFrame(rows)
    assert df["total_cents"].nunique() == 1, df.to_dict("records")
    assert df["n_orders"].nunique() == 1
    return df


def q_weekday_profile(sf_dir):
    """Revenue and volume by ISO weekday (1=Mon..7=Sun) — the intra-week
    seasonality profile. One map + a 7-row groupby over integer cents;
    the mean divides two exact integers, mirrored ×1e4."""

    def _wd(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "weekday": df["o_orderdate"].dt.isocalendar()["day"]
            .astype("int64").to_numpy(),
            "cents": _round_half_away(
                df["o_totalprice"].to_numpy() * 100.0
            ).astype(np.int64),
        })

    folded = T(sf_dir, "orders",
               ["o_orderdate", "o_totalprice"]).map_batches(
        _wd, batch_format="pandas")
    agg = fast_groupby_agg(folded, ["weekday"], {
        "revenue_fp": ("cents", "sum"), "n_orders": (None, "count")})

    def _mean(b: pa.Table) -> pa.Table:
        r = b["revenue_fp"].to_numpy(zero_copy_only=False)
        n = b["n_orders"].to_numpy(zero_copy_only=False)
        return b.append_column("avg_cents_fp", pa.array(
            _round_half_away(
                1e4 * (r.astype(np.float64) / n.astype(np.float64))
            ).astype(np.int64)))

    return agg.map_batches(_mean, batch_format="pyarrow")


def q_corpus_card(sf_dir):
    """Corpus datasheet (the 'data card' summary a training-data release
    ships with): document/source/language counts, exact token volume,
    length moments, and the language-distribution entropy — ONE shared
    tokenize-free scan (tokens = whitespace runs counted vectorized),
    three domain-sized groupbys, libm-ln entropy on exact integer
    counts (grouped_entropy's policy). Single-row output, every field
    an exact integer or a mirrored ×1e6 fixed point."""

    def _fold(b: pa.Table) -> pa.Table:
        txt = b["text"]
        n_tok = pc.list_value_length(pc.split_pattern_regex(
            txt, pattern="\\s+"))
        return pa.table({
            "lang": b["lang"],
            "source": b["source"],
            "n_tokens": pc.cast(n_tok, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
        })

    rows = T(sf_dir, "documents",
             ["text", "lang", "source"]).map_batches(
        _fold, batch_format="pyarrow").materialize()
    lang = fast_groupby_agg(rows, ["lang"],
                            {"c": (None, "count")}).to_pandas()
    n_src = fast_groupby_agg(rows, ["source"],
                             {"c": (None, "count")}).count()
    from ray.data.aggregate import Count, Sum

    agg = rows.aggregate(Count(alias_name="n_docs"),
                         Sum("n_tokens", alias_name="tok"),
                         Sum("n_chars", alias_name="ch"))
    n = int(agg["n_docs"])
    # language entropy: ln(n) − Σ c·ln(c)/n, per-term ×1e9 libm
    s = int(sum(int(_round_half_away(np.array(
        [c * math.log(float(c)) * 1e9]))[0])
        for c in lang["c"] if c > 0))
    ent = math.log(float(n)) - (s / 1e9) / n
    return pd.DataFrame([{
        "n_docs": n,
        "n_languages": len(lang),
        "n_sources": int(n_src),
        "total_tokens": int(agg["tok"]),
        "total_chars": int(agg["ch"]),
        "lang_entropy_fp": int(_round_half_away(
            np.array([ent * 1e6]))[0]),
    }])


def q_median_of_means(sf_dir, n_buckets: int = 16):
    """Median-of-means robust mean estimator (heavy-tail-resistant, the
    streaming-analytics alternative to a trimmed mean): rows land in 16
    deterministic md5 buckets, each bucket's mean divides exact integer
    cent sums (one mirrored float division ×1e4), and the estimate is
    the rank-rule median of the 16 bucket means — all bucket state is
    32 integers, so the exchange is constant-sized at any scale."""

    def _fold(b: pa.Table) -> pa.Table:
        ids = b["l_orderkey"].to_pylist()
        bk = np.array([int(hashlib.md5(str(i).encode())
                           .hexdigest()[0], 16) % n_buckets
                       for i in ids], np.int64)
        cents = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        df = pd.DataFrame({"bucket": bk, "s": cents,
                           "n": np.ones(len(bk), np.int64)})
        g = df.groupby("bucket", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_orderkey", "l_extendedprice"]).map_batches(
            _fold, batch_format="pyarrow"),
        ["bucket"], {"s": ("s", "sum"), "n": ("n", "sum")}).to_pandas()
    means = np.sort(_round_half_away(
        1e4 * (agg["s"].to_numpy().astype(np.float64)
               / (100.0 * agg["n"].to_numpy().astype(np.float64)))
    ).astype(np.int64))
    k = len(means)
    mom = int(means[(k - 1) // 2])  # lower median (rank rule)
    return pd.DataFrame([{
        "n_buckets": k, "mom_fp": mom,
        "min_bucket_mean_fp": int(means[0]),
        "max_bucket_mean_fp": int(means[-1]),
    }])


def q_fd_discovery(sf_dir):
    """Functional-dependency discovery (schema profiling): does column A
    determine column B? FD A→B holds iff |distinct A| == |distinct
    (A,B)| — two map-side-combined distinct counts per candidate, no
    row-level comparison. Candidates span a true FD (partkey→brand), a
    violated one (brand→type), and a cross-column pair on orders; the
    holds flag is the all-integer count equality."""
    cands = [
        ("part", "p_partkey", "p_brand"),
        ("part", "p_brand", "p_type"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("lineitem", "l_orderkey", "l_returnflag"),
    ]
    rows = []
    for tbl, a, b_ in cands:
        ds = T(sf_dir, tbl, [a, b_])
        n_a = fast_groupby_agg(ds, [a], {"_n": (None, "count")}).count()
        n_ab = fast_groupby_agg(ds, [a, b_],
                                {"_n": (None, "count")}).count()
        rows.append({"table_name": tbl, "lhs": a, "rhs": b_,
                     "n_distinct_lhs": int(n_a),
                     "n_distinct_pair": int(n_ab),
                     "fd_holds": bool(n_a == n_ab)})
    return pd.DataFrame(rows)


def q_hill_tail_index(sf_dir, k: int = 200):
    """Hill estimator of the price distribution's tail index from the
    top-k order statistics — the heavy-tail diagnostic: H = (1/k)·Σ
    ln(x_(i)/x_(k+1)) over the k largest values, 1/H the tail exponent.
    The top-(k+1) comes from the mergeable per-block top-k partials
    (k+1 ints per block — constant exchange); each ln term is libm on
    an exact integer cent RATIO (ln(a)−ln(b) form), ×1e9 quantized
    BEFORE the sum, so the estimate is association-order-free."""

    def _top(b: pa.Table) -> pa.Table:
        cents = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        top = np.sort(cents)[-(k + 1):]
        return pa.table({"cents": pa.array(top, pa.int64())})

    parts = T(sf_dir, "orders", ["o_totalprice"]).map_batches(
        _top, batch_format="pyarrow").to_pandas()  # ≤ blocks·(k+1)
    top = np.sort(parts["cents"].to_numpy())[-(k + 1):]
    xk1 = int(top[0])
    terms = [int(_round_half_away(np.array(
        [(math.log(float(int(v))) - math.log(float(xk1))) * 1e9]))[0])
        for v in top[1:]]
    s = int(sum(terms))
    hill = (s / 1e9) / k
    return pd.DataFrame([{
        "k": k, "xk1_cents": xk1,
        "hill_fp": int(_round_half_away(np.array([hill * 1e6]))[0]),
    }])


# ===================================== drift / tests / governance (r3)


def _daily_event_counts(sf_dir) -> pd.DataFrame:
    """Distributed day histogram of events: the only exchange is the
    per-day count partials (calendar-bounded — ≤ 36.5k rows per century
    at ANY data scale), so the driver frame is constant-sized."""
    ev = T(sf_dir, "events", ["ts"])

    def _d(b: pa.Table) -> pa.Table:
        d = _ts_ns(b["ts"]) // DAY_NS
        return pa.table({"day": pa.array(d, pa.int64())})

    return fast_groupby_agg(
        ev.map_batches(_d, batch_format="pyarrow"),
        ["day"], {"x": (None, "count")}).to_pandas()


def q_ks_drift(sf_dir):
    """Two-sample Kolmogorov–Smirnov drift statistic between the
    o_totalprice distributions of finished ('F') vs open ('O') orders —
    the distribution-shift monitor a training-data pipeline runs
    between snapshots. EXACT integer form: values are bucketed to whole
    dollars (domain-bounded histogram — the only exchange), and
    D = max|n2·F1 − n1·F2| is computed cross-multiplied as
    max|n2·cum1 − n1·cum2| over the merged value domain, so no ECDF
    float ever forms. The single mirrored float division (×1e9) happens
    once, on identical exact integers, on both sides. The driver pass
    is python-int exact (no int64 product overflow at any n)."""

    def _pts(b: pa.Table) -> pa.Table:
        st = b["o_orderstatus"].to_numpy(zero_copy_only=False)
        keep = (st == "F") | (st == "O")
        cents = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False)[keep]
            * 100.0).astype(np.int64)
        is1 = (st[keep] == "F").astype(np.int64)
        return pa.table({"v": pa.array(cents // 100, pa.int64()),
                         "a": pa.array(is1, pa.int64()),
                         "b": pa.array(1 - is1, pa.int64())})

    g = fast_groupby_agg(
        T(sf_dir, "orders", ["o_orderstatus", "o_totalprice"]).map_batches(
            _pts, batch_format="pyarrow"),
        ["v"], {"c1": ("a", "sum"), "c2": ("b", "sum")}
    ).to_pandas().sort_values("v")
    c1 = [int(v) for v in g["c1"]]
    c2 = [int(v) for v in g["c2"]]
    n1, n2 = sum(c1), sum(c2)
    cum1 = cum2 = 0
    d_num = 0
    for a, b in zip(c1, c2):
        cum1 += a
        cum2 += b
        d_num = max(d_num, abs(n2 * cum1 - n1 * cum2))
    ks = 1e9 * (d_num / (n1 * n2))
    return pd.DataFrame([{
        "n1": n1, "n2": n2, "d_num": d_num,
        "ks_fp": int(_round_half_away(np.array([ks]))[0])}])


def q_mann_whitney(sf_dir):
    """Mann–Whitney U rank test between l_quantity of returned ('R')
    vs unreturned ('N') lineitems — the nonparametric A/B companion to
    ab_test_welch. Tie handling is the textbook midrank rule kept
    EXACT by doubling: for value v with cnt ties after cumb smaller
    values, 2·midrank = 2·cumb + cnt + 1 (always integer), so
    2·R1 = Σ c1(v)·(2·cumb + cnt + 1) and 2·U1 = 2·R1 − n1(n1+1) are
    all-integer on both sides. The exchange is the value histogram
    (quantity domain ≤ 50 buckets at any scale)."""

    def _pts(b: pa.Table) -> pa.Table:
        fl = b["l_returnflag"].to_numpy(zero_copy_only=False)
        keep = (fl == "R") | (fl == "N")
        v = _round_half_away(
            b["l_quantity"].to_numpy(zero_copy_only=False)[keep]
        ).astype(np.int64)
        is1 = (fl[keep] == "R").astype(np.int64)
        return pa.table({"v": pa.array(v, pa.int64()),
                         "a": pa.array(is1, pa.int64()),
                         "b": pa.array(1 - is1, pa.int64())})

    g = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]).map_batches(
            _pts, batch_format="pyarrow"),
        ["v"], {"c1": ("a", "sum"), "c2": ("b", "sum")}
    ).to_pandas().sort_values("v")
    c1 = [int(v) for v in g["c1"]]
    c2 = [int(v) for v in g["c2"]]
    n1, n2 = sum(c1), sum(c2)
    cumb = 0
    r1x2 = 0
    for a, b in zip(c1, c2):
        cnt = a + b
        r1x2 += a * (2 * cumb + cnt + 1)
        cumb += cnt
    u1x2 = r1x2 - n1 * (n1 + 1)
    return pd.DataFrame([{
        "n1": n1, "n2": n2, "u1_x2": u1x2,
        "u2_x2": 2 * n1 * n2 - u1x2}])


def q_cusum_changepoint(sf_dir):
    """CUSUM change-point detector over the daily event-count series:
    the day with the largest |cumulative deviation from the mean rate|.
    Cross-multiplied to stay integer: dev_t = n·cum_t − t·S (the ×n
    CUSUM of x − mean), so no mean float forms; earliest day wins ties
    (mirrored ORDER BY dev DESC, day LIMIT 1). Exchange = the
    calendar-bounded day histogram."""
    d = _daily_event_counts(sf_dir).sort_values("day")
    days = [int(v) for v in d["day"]]
    xs = [int(v) for v in d["x"]]
    n, s = len(xs), sum(xs)
    cum = 0
    best_dev, best_day = -1, -1
    for t, (day, x) in enumerate(zip(days, xs), start=1):
        cum += x
        dev = abs(n * cum - t * s)
        if dev > best_dev:
            best_dev, best_day = dev, day
    return pd.DataFrame([{
        "n_days": n, "total_events": s,
        "max_dev_abs": best_dev, "cp_day": best_day}])


def q_lag1_autocorr(sf_dir):
    """Lag-1 autocorrelation of the daily event-count series (the
    burstiness/seasonality probe). Numerator and denominator are kept
    as EXACT n²-scaled integers via d_t = n·x_t − S: num = Σ d_t·d_{t+1},
    den = Σ d_t² — both association-order-free integer sums over the
    calendar-bounded series; one mirrored ×1e9 division at the end."""
    d = _daily_event_counts(sf_dir).sort_values("day")
    xs = [int(v) for v in d["x"]]
    n, s = len(xs), sum(xs)
    dv = [n * x - s for x in xs]
    num = sum(a * b for a, b in zip(dv, dv[1:]))
    den = sum(a * a for a in dv)
    acf = 1e9 * (num / den)
    return pd.DataFrame([{
        "n_days": n, "num": num, "den": den,
        "acf_fp": int(_round_half_away(np.array([acf]))[0])}])


def _yyyymm_from_ns(ns: np.ndarray) -> np.ndarray:
    """int64 epoch-ns → yyyymm int64 (calendar month key), via the
    exact datetime64[M] month index — no float, no timezone."""
    mo = ns.astype("datetime64[ns]").astype("datetime64[M]").view("int64")
    return (1970 + mo // 12) * 100 + (mo % 12 + 1)


def q_l_diversity(sf_dir):
    """l-diversity audit (privacy governance, k_anonymity's companion):
    for each quasi-identifier group (o_orderpriority × order month),
    the row count and the number of DISTINCT sensitive values
    (o_orderstatus). Two stacked map-side-combined groupbys — the
    second input is already (QI × sensitive)-sized, so the exchange is
    domain-bounded at any scale."""
    ds = T(sf_dir, "orders",
           ["o_orderpriority", "o_orderdate", "o_orderstatus"])

    def _qi(b: pa.Table) -> pa.Table:
        mm = _yyyymm_from_ns(_ts_ns(b["o_orderdate"]))
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "omonth": pa.array(mm, pa.int64()),
            "o_orderstatus": b["o_orderstatus"]})

    per_sv = fast_groupby_agg(
        ds.map_batches(_qi, batch_format="pyarrow"),
        ["o_orderpriority", "omonth", "o_orderstatus"],
        {"n": (None, "count")})
    return fast_groupby_agg(
        per_sv, ["o_orderpriority", "omonth"],
        {"n_rows": ("n", "sum"), "n_sensitive": (None, "count")})


_DQ_SHIP_CUTOFF_NS = np.datetime64("1996-01-01").astype(
    "datetime64[ns]").view("int64")


def q_dq_violations(sf_dir):
    """Declarative data-quality rule engine: five constraint rules
    evaluated in ONE vectorized scan of lineitem; each batch emits
    5 partial rows (rule, violations, checked) and the combine is a
    constant-size groupby-sum — rule evaluation never leaves the map
    side. The float comparisons mirror the oracle exactly (same
    doubles, same strict <)."""
    ds = T(sf_dir, "lineitem",
           ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_shipdate"])

    def _rules(b: pa.Table) -> pa.Table:
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        tax = b["l_tax"].to_numpy(zero_copy_only=False)
        flag = b["l_returnflag"].to_numpy(zero_copy_only=False)
        ship = _ts_ns(b["l_shipdate"])
        n = len(qty)
        viol = {
            "bad_returnflag": int((~np.isin(flag, ["R", "N", "A"])).sum()),
            "discount_gt_tax": int((disc > tax).sum()),
            "price_below_1000x_qty": int((price < 1000.0 * qty).sum()),
            "qty_out_of_range": int(((qty < 1.0) | (qty > 50.0)).sum()),
            "ship_before_1996": int((ship < _DQ_SHIP_CUTOFF_NS).sum()),
        }
        return pa.table({
            "rule": pa.array(sorted(viol), pa.string()),
            "v": pa.array([viol[k] for k in sorted(viol)], pa.int64()),
            "c": pa.array([n] * len(viol), pa.int64())})

    return fast_groupby_agg(
        ds.map_batches(_rules, batch_format="pyarrow"),
        ["rule"], {"n_violations": ("v", "sum"), "n_checked": ("c", "sum")})


def q_zone_map_pruning(sf_dir):
    """Zone-map (min/max statistics) construction per ship-month
    partition plus the pruning decision for a 1996 predicate — the
    storage-layout primitive behind 'prune at the read': a scan with
    WHERE shipdate IN 1996 touches only would_scan partitions. The
    build is one map-side-combined groupby; the decision is a
    vectorized flag on the month-domain-sized result."""
    ds = T(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def _zm(b: pa.Table) -> pa.Table:
        return pa.table({
            "yyyymm": pa.array(_yyyymm_from_ns(_ts_ns(b["l_shipdate"])),
                               pa.int64()),
            "k": b["l_orderkey"]})

    g = fast_groupby_agg(
        ds.map_batches(_zm, batch_format="pyarrow"), ["yyyymm"],
        {"n_rows": (None, "count"), "min_key": ("k", "min"),
         "max_key": ("k", "max")})

    def _flag(b: pa.Table) -> pa.Table:
        mm = b["yyyymm"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "would_scan",
            pa.array((mm >= 199601) & (mm <= 199612), pa.bool_()))

    return g.map_batches(_flag, batch_format="pyarrow")


def q_incremental_dedup(sf_dir):
    """Incremental-ingest dedup: the newest 20% of documents (by
    doc_id — the arriving batch) are deduped BOTH within the batch
    (grouped min doc_id per fingerprint) and against the existing
    store (hash-partitioned left-anti join on fingerprints) — the
    shape every snapshot-append corpus pipeline runs. The fingerprint
    is md5 of the first 16 chars (a coarse prefix key, so the synth
    corpus actually HAS collisions to drop — raw texts are all
    unique). No driver key set: both sides stream the exchange."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])
    from ray.data.aggregate import Max

    cutoff = int(docs.aggregate(Max("doc_id", alias_name="m"))["m"]) \
        * 4 // 5

    def _fp(lo: bool):
        def _f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            keep = ids < cutoff if lo else ids >= cutoff
            txt = [t[:16] for t, k in zip(b["text"].to_pylist(), keep)
                   if k]
            h = [hashlib.md5(t.encode()).hexdigest() for t in txt]
            return pa.table({
                "doc_id": pa.array(ids[keep], pa.int64()),
                "h": pa.array(h, pa.string())})
        return _f

    store_keys = _compact_small(fast_groupby_agg(
        docs.map_batches(_fp(True), batch_format="pyarrow"),
        ["h"], {"__n": (None, "count")}
    ).drop_columns(["__n"]).rename_columns({"h": "sh"}))
    batch_min = _compact_small(fast_groupby_agg(
        docs.map_batches(_fp(False), batch_format="pyarrow"),
        ["h"], {"doc_id": ("doc_id", "min")}))
    return batch_min.join(
        store_keys, "left_anti", num_partitions=JOIN_PARTS,
        on=("h",), right_on=("sh",),
    ).drop_columns(["h"])


def q_apportion_quota(sf_dir, total: int = 1000, alpha: int = 2):
    """Temperature-weighted source apportionment by the
    largest-remainder method (Hamilton): target sample quotas per
    source with weight n², EXACT end-to-end because integer weights
    make every quotient/remainder integer — q₀ = ⌊N·w/W⌋, the ΣN−Σq₀
    leftover goes to the largest remainders (source name breaks ties).
    The distributed part is the source histogram; the apportionment is
    source-domain-sized driver math, mirrored row-for-row in SQL
    window functions."""
    g = fast_groupby_agg(
        T(sf_dir, "documents", ["source"]), ["source"],
        {"n_docs": (None, "count")}).to_pandas()
    src = list(g["source"])
    n = [int(v) for v in g["n_docs"]]
    w = [v ** alpha for v in n]
    tot_w = sum(w)
    q0 = [total * x // tot_w for x in w]
    rem = [total * x - q * tot_w for x, q in zip(w, q0)]
    left = total - sum(q0)
    order = sorted(range(len(src)), key=lambda i: (-rem[i], src[i]))
    bonus = set(order[:left])
    return pd.DataFrame({
        "source": src, "n_docs": n,
        "quota": [q + (1 if i in bonus else 0)
                  for i, q in enumerate(q0)]})


def q_edge_reciprocity(sf_dir, nodes: int = 151):
    """Directed-edge reciprocity of the hash-derived benchmark graph
    (src = id mod p, dst = id² mod p, p=151 prime — the same derived
    graph family as degree_assortativity): the fraction of distinct
    edges whose reverse edge exists. Distinct edges come from a
    map-side-combined groupby (node-budget-bounded ≤ p²); the
    reciprocal probe is a hash-partitioned self-join against the
    swapped edge list — no driver edge set. Join sides are compacted
    (nonempty first block) per the Ray 2.49 schema-broadcast dodge."""
    ev = T(sf_dir, "events", ["event_id"])

    def _e(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False)
        s = ids % nodes
        d = (ids * ids) % nodes
        keep = s != d
        return pa.table({"src": pa.array(s[keep], pa.int64()),
                         "dst": pa.array(d[keep], pa.int64())})

    edges = _compact_small(fast_groupby_agg(
        ev.map_batches(_e, batch_format="pyarrow"),
        ["src", "dst"], {"__n": (None, "count")}).drop_columns(["__n"]))
    swapped = _compact_small(
        edges.rename_columns({"src": "rsrc", "dst": "rdst"}))
    m = edges.count()
    nr = edges.join(swapped, "inner", num_partitions=4,
                    on=("src", "dst"), right_on=("rdst", "rsrc")).count()
    recip = 1e6 * (nr / m)
    return pd.DataFrame([{
        "m_edges": int(m), "n_reciprocated": int(nr),
        "recip_fp": int(_round_half_away(np.array([recip]))[0])}])


def q_stickiness_dau_mau(sf_dir):
    """DAU/MAU stickiness per calendar month — Σ(daily distinct users)
    over (days-in-month × monthly distinct users). The wide step is
    ONE distinct over (month, day, user) pairs (map-side combined);
    the three per-month reductions run over that already-distinct
    dataset and meet in a month-domain-sized driver merge. The single
    float division is mirrored ×1e6 on exact integers."""
    ev = T(sf_dir, "events", ["ts", "user_id"])

    def _p(b: pa.Table) -> pa.Table:
        ns = _ts_ns(b["ts"])
        return pa.table({
            "month": pa.array(_yyyymm_from_ns(ns), pa.int64()),
            "day": pa.array(ns // DAY_NS, pa.int64()),
            "user_id": b["user_id"]})

    pairs = fast_groupby_agg(
        ev.map_batches(_p, batch_format="pyarrow"),
        ["month", "day", "user_id"], {"__n": (None, "count")}
    ).drop_columns(["__n"]).materialize()
    sdau = fast_groupby_agg(pairs, ["month"],
                            {"sdau": (None, "count")}).to_pandas()
    ndays = fast_groupby_agg(
        fast_groupby_agg(pairs, ["month", "day"],
                         {"__n": (None, "count")}),
        ["month"], {"ndays": (None, "count")}).to_pandas()
    mau = fast_groupby_agg(
        fast_groupby_agg(pairs, ["month", "user_id"],
                         {"__n": (None, "count")}),
        ["month"], {"mau": (None, "count")}).to_pandas()
    out = sdau.merge(ndays, on="month").merge(mau, on="month")
    st = [int(_round_half_away(np.array(
        [1e6 * (int(s) / (int(d) * int(m)))]))[0])
        for s, d, m in zip(out["sdau"], out["ndays"], out["mau"])]
    out["stickiness_fp"] = np.array(st, np.int64)
    return out


def q_anova_f(sf_dir):
    """One-way ANOVA F of l_quantity across return flags (the
    does-the-split-matter gate for dataset partitions). Per-group EXACT
    integer moments (n, Σx, Σx²) merge map-side; each group's
    between-term S_i²/n_i is ×1e6-quantized to an integer BEFORE the
    cross-group sum (per-term quantization policy — the sum is then
    association-order-free), and F forms from those integers with one
    mirrored float division. x is whole units, so every integer stays
    far under 2⁵³ through sf100."""
    ds = T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _m(b: pa.Table) -> pa.Table:
        x = _round_half_away(
            b["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({"g": b["l_returnflag"],
                         "x": pa.array(x, pa.int64()),
                         "xx": pa.array(x * x, pa.int64())})

    m = fast_groupby_agg(
        ds.map_batches(_m, batch_format="pyarrow"), ["g"],
        {"n": (None, "count"), "sx": ("x", "sum"), "sxx": ("xx", "sum")}
    ).to_pandas()  # k rows — group-domain sized
    ns = [int(v) for v in m["n"]]
    sxs = [int(v) for v in m["sx"]]
    k, n, s, q = len(ns), sum(ns), sum(sxs), int(m["sxx"].sum())
    # mirrored op tree: CAST(sx AS DOUBLE) * sx / n, ×1e6, round
    terms = [int(_round_half_away(np.array(
        [1e6 * ((float(sx) * sx) / ni)]))[0])
        for sx, ni in zip(sxs, ns)]
    st = sum(terms)
    ssb = st - int(_round_half_away(np.array(
        [1e6 * ((float(s) * s) / n)]))[0])
    ssw = 1_000_000 * q - st
    f = 1e6 * (float((n - k) * ssb) / float((k - 1) * ssw))
    return pd.DataFrame([{
        "k_groups": k, "n_total": n, "ssb_fp": ssb, "ssw_fp": ssw,
        "f_fp": int(_round_half_away(np.array([f]))[0])}])


def q_trending_terms(sf_dir):
    """Trending vocabulary between corpus snapshots: token counts in
    the newer half of documents (by doc_id) minus the older half,
    top-20 risers by (Δcount desc, term). Tokenization is the shared
    ``[a-z0-9_]+`` kernel (same as term_doc_freq, so the oracle's
    regexp_split can never desynchronize); the exchange is the
    vocabulary-sized (term, early, late) histogram."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])
    from ray.data.aggregate import Max

    cutoff = int(docs.aggregate(Max("doc_id", alias_name="m"))["m"]) // 2

    def _tok(b: pa.Table) -> pa.Table:
        terms: list[str] = []
        late: list[int] = []
        for i, txt in zip(b["doc_id"].to_pylist(),
                          b["text"].to_pylist()):
            toks = _TOKEN.findall(txt.lower())
            terms.extend(toks)
            late.extend([1 if i >= cutoff else 0] * len(toks))
        lt = np.array(late, np.int64)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "lt": pa.array(lt, pa.int64()),
                         "er": pa.array(1 - lt, pa.int64())})

    g = fast_groupby_agg(
        docs.map_batches(_tok, batch_format="pyarrow"),
        ["term"], {"c_early": ("er", "sum"), "c_late": ("lt", "sum")})

    def _score(b: pa.Table) -> pa.Table:
        return b.append_column(
            "delta", pc.subtract(b["c_late"], b["c_early"]))

    return g.map_batches(_score, batch_format="pyarrow").sort(
        ["delta", "term"], descending=[True, False]).limit(20)


def q_dup_cluster_sizes(sf_dir):
    """Dedup report: the duplicate-cluster size histogram over the
    prefix-16 fingerprint (incremental_dedup's key) — how many
    clusters of each size the dedup would collapse. Two stacked
    map-side-combined groupbys; the second input is already
    fingerprint-domain sized."""
    docs = T(sf_dir, "documents", ["text"])

    def _fp(b: pa.Table) -> pa.Table:
        h = [hashlib.md5(t[:16].encode()).hexdigest()
             for t in b["text"].to_pylist()]
        return pa.table({"h": pa.array(h, pa.string())})

    clusters = fast_groupby_agg(
        docs.map_batches(_fp, batch_format="pyarrow"),
        ["h"], {"sz": (None, "count")})
    return fast_groupby_agg(
        clusters, ["sz"], {"n_clusters": (None, "count")}
    ).rename_columns({"sz": "cluster_size"})


def q_set_cover_sources(sf_dir, rounds: int = 5,
                        max_pairs: int = TFIDF_MAX_BROADCAST_VOCAB):
    """Greedy max-coverage source selection (the data-curation
    'which sources buy the most new vocabulary' question): pick
    ``rounds`` sources, each maximizing marginal new-term coverage
    (ties by source name). The distributed fold is the DISTINCT
    (source, term) pair set (vocabulary × source bounded, guarded by
    ``max_pairs`` — beyond it a web-scale corpus needs a sketch-based
    variant); the greedy itself is source-domain driver math.
    Rows-only: greedy is iterative, but submodularity is asserted
    in-query (marginal gains non-increasing, coverage monotone)."""
    docs = T(sf_dir, "documents", ["source", "text"])

    def _pairs(b: pa.Table) -> pa.Table:
        src: list[str] = []
        term: list[str] = []
        for s, txt in zip(b["source"].to_pylist(),
                          b["text"].to_pylist()):
            toks = set(_TOKEN.findall(txt.lower()))
            src.extend([s] * len(toks))
            term.extend(toks)
        return pa.table({"source": pa.array(src, pa.string()),
                         "term": pa.array(term, pa.string())})

    pairs = fast_groupby_agg(
        docs.map_batches(_pairs, batch_format="pyarrow"),
        ["source", "term"], {"__n": (None, "count")}).drop_columns(["__n"])
    df = pairs.to_pandas()
    assert len(df) <= max_pairs, \
        f"source×vocab pairs {len(df)} exceed the broadcast guard"
    sets = {s: set(g["term"]) for s, g in df.groupby("source")}
    covered: set = set()
    out = []
    prev_gain = None
    for rnd in range(1, rounds + 1):
        best = min(((-len(v - covered), k) for k, v in sets.items()))
        gain, src = -best[0], best[1]
        covered |= sets.pop(src)
        assert prev_gain is None or gain <= prev_gain, \
            "greedy marginal gain increased (submodularity violated)"
        prev_gain = gain
        out.append({"round": rnd, "source": src,
                    "marginal_new_terms": gain,
                    "covered_terms": len(covered)})
    return pd.DataFrame(out)


def q_compression_ratio(sf_dir):
    """Per-source zlib compressibility — the Gopher-style quality
    signal (templated/repetitive text compresses far better than
    natural prose). Per-batch C-speed deflate inside map_batches with
    mergeable integer byte sums; one ×1e6 division per source at the
    end. Rows-only (the ratio depends on the zlib build, not on SQL
    semantics); sanity gates asserted in-query."""
    import zlib

    docs = T(sf_dir, "documents", ["source", "text"])

    def _z(b: pa.Table) -> pa.Table:
        srcs = b["source"].to_pylist()
        raw = [t.encode() for t in b["text"].to_pylist()]
        comp = [len(zlib.compress(r, 6)) for r in raw]
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "raw_b": pa.array([len(r) for r in raw], pa.int64()),
            "comp_b": pa.array(comp, pa.int64())})

    g = fast_groupby_agg(
        docs.map_batches(_z, batch_format="pyarrow"), ["source"],
        {"n_docs": (None, "count"), "raw_bytes": ("raw_b", "sum"),
         "comp_bytes": ("comp_b", "sum")}).to_pandas()
    ratio = [int(_round_half_away(np.array(
        [1e6 * (int(c) / int(r))]))[0])
        for c, r in zip(g["comp_bytes"], g["raw_bytes"])]
    g["ratio_fp"] = np.array(ratio, np.int64)
    assert ((g["ratio_fp"] > 0) & (g["ratio_fp"] < 1_200_000)).all(), \
        "compression ratio outside sane (0, 1.2) band"
    return g


def _pava(ns: list, ss: list):
    """Pool-adjacent-violators on exact (Σx, n) pairs: returns pooled
    (Σx, n) per input level, means non-decreasing. All arithmetic is
    integer cross-multiplication (s_a·n_b vs s_b·n_a) — no float until
    the caller divides, so pooling decisions are exact."""
    blocks = [[s, n] for s, n in zip(ss, ns)]  # [sum, count]
    out: list = []
    for b in blocks:
        out.append(b)
        while len(out) >= 2 and \
                out[-2][0] * out[-1][1] > out[-1][0] * out[-2][1]:
            s2, n2 = out.pop()
            out[-1][0] += s2
            out[-1][1] += n2
    return out


def q_isotonic_fit(sf_dir):
    """Isotonic regression (PAVA) of mean extended price on quantity
    level — the monotone-calibration primitive. The distributed fold
    is the ≤50-level (n, Σcents) histogram; pooling runs on the driver
    with EXACT integer cross-multiplied comparisons, so the fit is
    deterministic at any parallelism. Rows-only (iterative pooling);
    monotonicity and mass conservation asserted in-query."""
    ds = T(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def _lv(b: pa.Table) -> pa.Table:
        q = _round_half_away(
            b["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        c = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"lvl": pa.array(q, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    g = fast_groupby_agg(
        ds.map_batches(_lv, batch_format="pyarrow"), ["lvl"],
        {"n": (None, "count"), "s": ("c", "sum")}
    ).to_pandas().sort_values("lvl")
    ns = [int(v) for v in g["n"]]
    ss = [int(v) for v in g["s"]]
    pooled = _pava(ns, ss)
    # expand pooled blocks back to levels
    fitted = []
    for s_blk, n_blk in pooled:
        fitted.append((s_blk, n_blk))
    rows = []
    i = 0
    for s_blk, n_blk in fitted:
        taken = 0
        while taken < n_blk:
            rows.append(int(_round_half_away(np.array(
                [1e4 * (s_blk / (100.0 * n_blk))]))[0]))
            taken += ns[i]
            i += 1
    out = pd.DataFrame({
        "lvl": g["lvl"].to_numpy(np.int64),
        "n": np.array(ns, np.int64),
        "fitted_mean_fp": np.array(rows, np.int64)})
    f = out["fitted_mean_fp"].to_numpy()
    assert (np.diff(f) >= 0).all(), "isotonic fit not monotone"
    assert sum(s for s, _ in pooled) == sum(ss) and \
        sum(n for _, n in pooled) == sum(ns), "PAVA lost mass"
    return out


def queries() -> dict:
    return {
        "j_inner_join": q_j_inner_join,
        "j_left_outer": q_j_left_outer,
        "asof_join": q_asof_join,
        "region_revenue": q_region_revenue,
        "event_funnel": q_event_funnel,
        "window_functions": q_window_functions,
        "rollup_agg": q_rollup_agg,
        "cube_agg": q_cube_agg,
        "rank_functions": q_rank_functions,
        "table_diff": q_table_diff,
        "above_customer_avg": q_above_customer_avg,
        "relational_division": q_relational_division,
        "quantiles": q_quantiles,
        "grouped_median": q_grouped_median,
        "percentile_cont": q_percentile_cont,
        "grouped_entropy": q_grouped_entropy,
        "cross_join": q_cross_join,
        "pagerank": q_pagerank,
        "triangle_count": q_triangle_count,
        "winsorize": q_winsorize,
        "key_skew": q_key_skew,
        "export_jsonl_csv": q_export_jsonl_csv,
        "pareto_frontier": q_pareto_frontier,
        "rolling_active_users": q_rolling_active_users,
        "fuzzy_best_match": q_fuzzy_best_match,
        "event_transitions": q_event_transitions,
        "grouped_mad": q_grouped_mad,
        "cohort_retention": q_cohort_retention,
        "segment_monthly_revenue": q_segment_monthly_revenue,
        "string_agg": q_string_agg,
        "distinct_count": q_distinct_count,
        "hll_distinct": q_hll_distinct,
        "sample_hash": q_sample_hash,
        "approx_quantiles": q_approx_quantiles,
        "source_cap": q_source_cap,
        "stratified_sample": q_stratified_sample,
        "term_doc_freq": q_term_doc_freq,
        "tfidf_top_terms": q_tfidf_top_terms,
        "embedding_norms": q_embedding_norms,
        "export_partitioned": q_export_partitioned,
        "pack_sequences": q_pack_sequences,
        "decontaminate": q_decontaminate,
        "range_join": q_range_join,
        "similarity_join": q_similarity_join,
        "heavy_hitters": q_heavy_hitters,
        "grouped_hll": q_grouped_hll,
        "connected_components": q_connected_components,
        "grouped_distinct_count": q_grouped_distinct_count,
        "mode_per_group": q_mode_per_group,
        "histogram": q_histogram,
        "grouped_variance": q_grouped_variance,
        "pivot_wide": q_pivot_wide,
        "group_outliers": q_group_outliers,
        "bigram_stats": q_bigram_stats,
        "set_except": q_set_except,
        "set_intersect": q_set_intersect,
        "grouped_corr": q_grouped_corr,
        "grouped_regression": q_grouped_regression,
        "weighted_avg": q_weighted_avg,
        "unpivot_long": q_unpivot_long,
        "grouped_skew": q_grouped_skew,
        "bigram_lm_score": q_bigram_lm_score,
        "quantile_norm": q_quantile_norm,
        "grouped_geomean": q_grouped_geomean,
        "bm25_topk": q_bm25_topk,
        "rrf_fusion": q_rrf_fusion,
        "interval_coverage": q_interval_coverage,
        "json_extract": q_json_extract,
        "unnest_explode": q_unnest_explode,
        "gap_fill": q_gap_fill,
        "lead_dwell": q_lead_dwell,
        "cdc_upsert": q_cdc_upsert,
        "graph_bfs": q_graph_bfs,
        "j_full_outer": q_j_full_outer,
        "forward_fill": q_forward_fill,
        "exists_subquery": q_exists_subquery,
        "order_count_distribution": q_order_count_distribution,
        "argmax_join": q_argmax_join,
        "mom_growth": q_mom_growth,
        "source_jaccard": q_source_jaccard,
        "cms_frequency": q_cms_frequency,
        "bucketed_join": q_bucketed_join,
        "fk_integrity": q_fk_integrity,
        "table_profile": q_table_profile,
        "chi_square": q_chi_square,
        "idle_rich_customers": q_idle_rich_customers,
        "group_mean_impute": q_group_mean_impute,
        "trimmed_mean": q_trimmed_mean,
        "ratio_to_report": q_ratio_to_report,
        "dedup_survivor": q_dedup_survivor,
        "time_weighted_avg": q_time_weighted_avg,
        "weighted_sample": q_weighted_sample,
        "bloom_semi_join": q_bloom_semi_join,
        "join_size_estimate": q_join_size_estimate,
        "pmi_bigrams": q_pmi_bigrams,
        "daily_anomaly": q_daily_anomaly,
        "q6_band_revenue": q_q6_band_revenue,
        "ship_delay_distribution": q_ship_delay_distribution,
        "promo_revenue_ratio": q_promo_revenue_ratio,
        "standardize": q_standardize,
        "train_val_test_split": q_train_val_test_split,
        "quality_top_quartile": q_quality_top_quartile,
        "schema_evolution_read": q_schema_evolution_read,
        "incremental_agg": q_incremental_agg,
        "graph_kcore": q_graph_kcore,
        "time_to_convert": q_time_to_convert,
        "first_touch_attribution": q_first_touch_attribution,
        "rfm_segments": q_rfm_segments,
        "returned_revenue_topk": q_returned_revenue_topk,
        "supplier_nation_profit": q_supplier_nation_profit,
        "disjunctive_band_revenue": q_disjunctive_band_revenue,
        "zorder_layout": q_zorder_layout,
        "q3_shipping_priority": q_q3_shipping_priority,
        "q7_nation_trade_volume": q_q7_nation_trade_volume,
        "q15_top_supplier": q_q15_top_supplier,
        "q17_small_qty_revenue": q_q17_small_qty_revenue,
        "q18_large_orders": q_q18_large_orders,
        "q8_market_share": q_q8_market_share,
        "q16_part_supplier_counts": q_q16_part_supplier_counts,
        "q21_late_sole_supplier": q_q21_late_sole_supplier,
        "orc_roundtrip": q_orc_roundtrip,
        "benford_audit": q_benford_audit,
        "grouping_sets_agg": q_grouping_sets_agg,
        "churned_customers": q_churned_customers,
        "late_events": q_late_events,
        "inverted_index": q_inverted_index,
        "event_cooccurrence": q_event_cooccurrence,
        "compact_store": q_compact_store,
        "theil_index": q_theil_index,
        "weighted_join_sample": q_weighted_join_sample,
        "label_reachability": q_label_reachability,
        "k_anonymity": q_k_anonymity,
        "weekly_revenue": q_weekly_revenue,
        "psi_drift": q_psi_drift,
        "ab_test_welch": q_ab_test_welch,
        "frequent_itemsets": q_frequent_itemsets,
        "db_file_export": q_db_file_export,
        "graph_sssp": q_graph_sssp,
        "did_estimate": q_did_estimate,
        "q2_min_cost_supplier": q_q2_min_cost_supplier,
        "q1_pricing_summary": q_q1_pricing_summary,
        "q4_order_priority": q_q4_order_priority,
        "q11_important_parts": q_q11_important_parts,
        "q12_priority_by_returnflag": q_q12_priority_by_returnflag,
        "q20_excess_suppliers": q_q20_excess_suppliers,
        "embedding_covariance": q_embedding_covariance,
        "weighted_median": q_weighted_median,
        "store_time_travel": q_store_time_travel,
        "cumulative_users": q_cumulative_users,
        "max_concurrency": q_max_concurrency,
        "hll_union_intersect": q_hll_union_intersect,
        "session_paths": q_session_paths,
        "cdc_merge_delete": q_cdc_merge_delete,
        "balanced_downsample": q_balanced_downsample,
        "target_encode_loo": q_target_encode_loo,
        "collapse_runs": q_collapse_runs,
        "info_gain": q_info_gain,
        "label_centroids": q_label_centroids,
        "resume_export": q_resume_export,
        "degree_assortativity": q_degree_assortativity,
        "time_split_embargo": q_time_split_embargo,
        "pareto_8020": q_pareto_8020,
        "clustering_coefficient": q_clustering_coefficient,
        "sampled_estimate": q_sampled_estimate,
        "containment_join": q_containment_join,
        "cascade_delete": q_cascade_delete,
        "rollup_consistency": q_rollup_consistency,
        "weekday_profile": q_weekday_profile,
        "corpus_card": q_corpus_card,
        "median_of_means": q_median_of_means,
        "fd_discovery": q_fd_discovery,
        "hill_tail_index": q_hill_tail_index,
        "pca_top_component": q_pca_top_component,
        "ks_drift": q_ks_drift,
        "mann_whitney": q_mann_whitney,
        "cusum_changepoint": q_cusum_changepoint,
        "lag1_autocorr": q_lag1_autocorr,
        "l_diversity": q_l_diversity,
        "dq_violations": q_dq_violations,
        "zone_map_pruning": q_zone_map_pruning,
        "incremental_dedup": q_incremental_dedup,
        "apportion_quota": q_apportion_quota,
        "edge_reciprocity": q_edge_reciprocity,
        "stickiness_dau_mau": q_stickiness_dau_mau,
        "anova_f": q_anova_f,
        "trending_terms": q_trending_terms,
        "dup_cluster_sizes": q_dup_cluster_sizes,
        "set_cover_sources": q_set_cover_sources,
        "compression_ratio": q_compression_ratio,
        "isotonic_fit": q_isotonic_fit,
        "hhi_concentration": q_hhi_concentration,
        "grouped_harmonic": q_grouped_harmonic,
        "spearman_corr": q_spearman_corr,
        "survival_km": q_survival_km,
        "equidepth_histogram": q_equidepth_histogram,
        "daily_ewma": q_daily_ewma,
        "grouped_boxplot": q_grouped_boxplot,
        "interpolate_daily": q_interpolate_daily,
        "kendall_tau": q_kendall_tau,
        "markov_stationary": q_markov_stationary,
        "confusion_matrix": q_confusion_matrix,
        "window_range_sum": q_window_range_sum,
        "hierarchy_rollup": q_hierarchy_rollup,
        "table_checksum": q_table_checksum,
        "running_median": q_running_median,
        "source_knapsack": q_source_knapsack,
        "calibration_bins": q_calibration_bins,
        "seasonal_strength": q_seasonal_strength,
        "reset_cumsum": q_reset_cumsum,
        "ttl_dedup": q_ttl_dedup,
        "decayed_counts": q_decayed_counts,
        "temperature_mix": q_temperature_mix,
        "salted_join": q_salted_join,
        "partition_prune_read": q_partition_prune_read,
        "bootstrap_ci": q_bootstrap_ci,
        "t_closeness": q_t_closeness,
        "theil_sen": q_theil_sen,
        "forecast_mase": q_forecast_mase,
        "attribution_position": q_attribution_position,
        "rendezvous_shards": q_rendezvous_shards,
        "clamped_balance": q_clamped_balance,
        "longest_streak": q_longest_streak,
        "lpt_partition_plan": q_lpt_partition_plan,
        "holdout_leakage": q_holdout_leakage,
        "scd2_build": q_scd2_build,
        "pit_feature_join": q_pit_feature_join,
        "ams_f2": q_ams_f2,
        "roc_auc": q_roc_auc,
        "interval_scheduling": q_interval_scheduling,
        "cohens_kappa": q_cohens_kappa,
        "type_token_ratio": q_type_token_ratio,
        "rare_label_collapse": q_rare_label_collapse,
        "arrow_ipc_roundtrip": q_arrow_ipc_roundtrip,
        "npy_roundtrip": q_npy_roundtrip,
        "inference_margin": q_inference_margin,
        "fair_share_alloc": q_fair_share_alloc,
        "minmax_scale": q_minmax_scale,
        "length_hist_overlap": q_length_hist_overlap,
        "hapax_ratio": q_hapax_ratio,
        "voptimal_histogram": q_voptimal_histogram,
        "prorate_across_days": q_prorate_across_days,
        "selectivity_independence": q_selectivity_independence,
        "repartition_invariance": q_repartition_invariance,
        "neyman_allocation": q_neyman_allocation,
        "term_burstiness": q_term_burstiness,
        "bag_set_ops": q_bag_set_ops,
        "lttb_downsample": q_lttb_downsample,
        "id_gap_report": q_id_gap_report,
        "q5_local_supplier_volume": q_q5_local_supplier_volume,
        "hits_scores": q_hits_scores,
        "fifo_lot_matching": q_fifo_lot_matching,
        "acf_correlogram": q_acf_correlogram,
        "rank_overlap_at_k": q_rank_overlap_at_k,
        "spatial_grid_nn": q_spatial_grid_nn,
        "stream_stream_join": q_stream_stream_join,
        "mask_plan_audit": q_mask_plan_audit,
        "two_hop_neighbors": q_two_hop_neighbors,
        "link_prediction": q_link_prediction,
        "bot_regularity": q_bot_regularity,
        "conformal_quantile": q_conformal_quantile,
        "novelty_rate": q_novelty_rate,
        "ndcg_at_k": q_ndcg_at_k,
        "sliding_distinct_types": q_sliding_distinct_types,
        "holt_forecast": q_holt_forecast,
        "median_two_pass": q_median_two_pass,
        "edit_distance_join": q_edit_distance_join,
        "wl_refinement": q_wl_refinement,
        "bm25_retrieval": q_bm25_retrieval,
        "grouped_ols": q_grouped_ols,
        "rrf_customer_fusion": q_rrf_customer_fusion,
        "priority_sample": q_priority_sample,
        "graph_random_walks": q_graph_random_walks,
        "betweenness_len2": q_betweenness_len2,
        "growth_accounting": q_growth_accounting,
        "graph_modularity": q_graph_modularity,
        "vocab_coverage": q_vocab_coverage,
        "padding_efficiency": q_padding_efficiency,
        "pagerank_checkpointed": q_pagerank_checkpointed,
        "int8_quant_audit": q_int8_quant_audit,
        "skipgram_pairs": q_skipgram_pairs,
        "permutation_test": q_permutation_test,
        "kmv_distinct": q_kmv_distinct,
        "oversample_balance": q_oversample_balance,
        "kwic_snippets": q_kwic_snippets,
        "group_aware_split": q_group_aware_split,
        "labeling_functions_audit": q_labeling_functions_audit,
        "paired_diversity": q_paired_diversity,
        "kcenter_coreset": q_kcenter_coreset,
        "wasserstein_1d": q_wasserstein_1d,
        "max_drawdown": q_max_drawdown,
        "reciprocal_best_match": q_reciprocal_best_match,
        "golden_record": q_golden_record,
        "fellegi_sunter": q_fellegi_sunter,
        "dbscan_core": q_dbscan_core,
        "stable_matching": q_stable_matching,
        "linkage_quality": q_linkage_quality,
        "frequent_directions": q_frequent_directions,
        "dag_critical_path": q_dag_critical_path,
        "vacuum_store": q_vacuum_store,
        "dp_histogram": q_dp_histogram,
        "merkle_partition_diff": q_merkle_partition_diff,
        "feature_hashing": q_feature_hashing,
        "fairness_audit": q_fairness_audit,
        "qini_uplift": q_qini_uplift,
        "luby_mis": q_luby_mis,
        "negative_sampling": q_negative_sampling,
        "delta_join_view": q_delta_join_view,
        "ddsketch_quantiles": q_ddsketch_quantiles,
        "ktruss": q_ktruss,
        "coordinated_sample_join": q_coordinated_sample_join,
    }


ORACLES: dict[str, str] = {
    "grouped_distinct_count": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "mode_per_group": """
        WITH c AS (
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY user_id, event_type
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
            FROM c
        )
        SELECT user_id, event_type AS mode_event, n FROM r WHERE rn = 1
    """,
    "histogram": """
        SELECT CAST(round(l_quantity * 100) AS BIGINT) // 500 AS bucket,
               count(*) AS n
        FROM lineitem GROUP BY bucket
    """,
    "set_except": """
        SELECT p_brand, p_type, p_size FROM part WHERE p_size > 25
        EXCEPT
        SELECT p_brand, p_type, p_size FROM part WHERE p_retailprice > 950
    """,
    "set_intersect": """
        SELECT p_brand, p_type, p_size FROM part WHERE p_size > 25
        INTERSECT
        SELECT p_brand, p_type, p_size FROM part WHERE p_retailprice > 950
    """,
    "bm25_topk": """
        WITH arr AS (
            SELECT doc_id,
                   string_split_regex(lower(text), '[^a-z0-9_]+') AS a
            FROM documents
        ),
        tok AS (
            SELECT doc_id, a[i] AS tok
            FROM arr, UNNEST(generate_series(1, len(a))) AS g(i)
            WHERE a[i] <> ''
        ),
        f AS (
            SELECT doc_id, count(*) AS dl,
                   sum(CASE WHEN tok = 'hash' THEN 1 ELSE 0 END) AS tf0,
                   sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS tf1,
                   sum(CASE WHEN tok = 'vector' THEN 1 ELSE 0 END) AS tf2
            FROM tok GROUP BY doc_id
        ),
        g AS (
            SELECT count(*) AS n, sum(dl) AS total,
                   sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                   sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                   sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
            FROM f
        ),
        s AS (
            SELECT doc_id,
                   ln(((n - df0) + 0.5) / (df0 + 0.5))
                   * ((tf0 * 2.2) / (tf0 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                 + ln(((n - df1) + 0.5) / (df1 + 0.5))
                   * ((tf1 * 2.2) / (tf1 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                 + ln(((n - df2) + 0.5) / (df2 + 0.5))
                   * ((tf2 * 2.2) / (tf2 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                   AS score
            FROM f, g
        )
        SELECT doc_id,
               CAST(round(score * 1000000.0) AS BIGINT) AS score_fp
        FROM s ORDER BY score_fp DESC, doc_id LIMIT 10
    """,
    "json_extract": """
        WITH m AS (
            SELECT event_type,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        ),
        c AS (
            SELECT event_type, k, count(*) AS c
            FROM m GROUP BY event_type, k
        )
        SELECT event_type, count(*) AS n_distinct_k,
               CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(k * c) AS BIGINT) AS k_sum
        FROM c GROUP BY event_type
    """,
    "interval_coverage": """
        WITH m AS (
            SELECT user_id, epoch_us(ts) // 1000000 AS s,
                   epoch_us(ts) // 1000000 + 300 AS e
            FROM events
        ),
        w AS (
            SELECT user_id, s, e,
                   max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pmax
            FROM m
        ),
        g AS (
            SELECT user_id, s, e,
                   sum(CASE WHEN pmax IS NULL OR s > pmax
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS isl
            FROM w
        ),
        i AS (
            SELECT user_id, isl, min(s) AS st, max(e) AS en
            FROM g GROUP BY user_id, isl
        )
        SELECT user_id, count(*) AS n_islands,
               CAST(sum(en - st) AS BIGINT) AS covered_s
        FROM i GROUP BY user_id
    """,
    "rrf_fusion": """
        WITH arr AS (
            SELECT doc_id,
                   string_split_regex(lower(text), '[^a-z0-9_]+') AS a
            FROM documents
        ),
        tok AS (
            SELECT doc_id, a[i] AS tok
            FROM arr, UNNEST(generate_series(1, len(a))) AS g(i)
            WHERE a[i] <> ''
        ),
        f AS (
            SELECT doc_id, count(*) AS dl,
                   sum(CASE WHEN tok = 'hash' THEN 1 ELSE 0 END) AS tf0,
                   sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS tf1,
                   sum(CASE WHEN tok = 'vector' THEN 1 ELSE 0 END) AS tf2
            FROM tok GROUP BY doc_id
        ),
        g AS (
            SELECT count(*) AS n, sum(dl) AS total,
                   sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                   sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                   sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
            FROM f
        ),
        s AS (
            SELECT doc_id,
                   CAST(round((
                   ln(((n - df0) + 0.5) / (df0 + 0.5))
                   * ((tf0 * 2.2) / (tf0 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                 + ln(((n - df1) + 0.5) / (df1 + 0.5))
                   * ((tf1 * 2.2) / (tf1 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                 + ln(((n - df2) + 0.5) / (df2 + 0.5))
                   * ((tf2 * 2.2) / (tf2 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                   ) * 1000000.0) AS BIGINT) AS score_fp
            FROM f, g
        ),
        la AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score_fp DESC, doc_id)
                       AS r
            FROM s QUALIFY r <= 20
        ),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        dims AS (
            SELECT e.vec_id,
                   CAST(round((CAST(e.embedding[i] AS DOUBLE)
                               * CAST(q.qe[i] AS DOUBLE)) * 1e12)
                        AS BIGINT) AS pxy,
                   CAST(round((CAST(e.embedding[i] AS DOUBLE)
                               * CAST(e.embedding[i] AS DOUBLE)) * 1e12)
                        AS BIGINT) AS pxx
            FROM embeddings e, q,
                 UNNEST(generate_series(1, len(e.embedding))) AS gg(i)
        ),
        nb AS (
            SELECT CAST(sum(CAST(round((CAST(qe[i] AS DOUBLE)
                                        * CAST(qe[i] AS DOUBLE)) * 1e12)
                                 AS BIGINT)) AS BIGINT) AS nb
            FROM q, UNNEST(generate_series(1, len(qe))) AS gg(i)
        ),
        sims AS (
            SELECT vec_id,
                   CAST(round((CAST(sum(pxy) AS BIGINT) * 1.0)
                              / (sqrt(CAST(sum(pxx) AS BIGINT) * 1.0)
                                 * sqrt((SELECT nb FROM nb) * 1.0))
                              * 1000000.0) AS BIGINT) AS sim_fp
            FROM dims GROUP BY vec_id
        ),
        lb AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY sim_fp DESC, vec_id) AS r
            FROM sims QUALIFY r <= 20
        ),
        u AS (
            SELECT doc_id, 1000000 // (60 + r) AS c FROM la
            UNION ALL
            SELECT vec_id AS doc_id, 1000000 // (60 + r) AS c FROM lb
        )
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_fp
        FROM u GROUP BY doc_id
        ORDER BY rrf_fp DESC, doc_id LIMIT 10
    """,
    "quantile_norm": """
        WITH m AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS p
            FROM orders
        )
        SELECT o_orderkey,
               CAST((rank() OVER (ORDER BY p) - 1) * 1000000
                    // ((SELECT count(*) FROM m) - 1) AS BIGINT) AS q_fp
        FROM m
    """,
    "grouped_geomean": """
        WITH m AS (
            SELECT o_orderpriority,
                   CAST(round(ln(CAST(round(o_totalprice * 100) AS BIGINT)
                                 * 1.0) * 1000000000.0) AS BIGINT) AS lnp
            FROM orders
        )
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(lnp) AS BIGINT) AS ln_sum_fp
        FROM m GROUP BY o_orderpriority
    """,
    "bigram_lm_score": """
        WITH arr AS (
            SELECT doc_id,
                   string_split_regex(lower(text), '[^a-z0-9_]+') AS a
            FROM documents
        ),
        tok AS (
            SELECT doc_id, a[i] AS tok,
                   row_number() OVER (PARTITION BY doc_id ORDER BY i)
                       AS pos
            FROM arr, UNNEST(generate_series(1, len(a))) AS g(i)
            WHERE a[i] <> ''
        ),
        bg AS (
            SELECT t1.doc_id, t1.tok AS w1, t2.tok AS w2
            FROM tok t1
            JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
        ),
        bi AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
        hd AS (SELECT w1, CAST(sum(c) AS BIGINT) AS hc
               FROM bi GROUP BY w1),
        v AS (SELECT count(DISTINCT tok) AS nv FROM tok),
        term AS (
            SELECT bg.doc_id,
                   CAST(round(ln((bi.c + 1) * 1.0) * 1000000000.0)
                        AS BIGINT)
                   - CAST(round(ln((hd.hc + (SELECT nv FROM v)) * 1.0)
                                * 1000000000.0) AS BIGINT) AS term_fp
            FROM bg JOIN bi USING (w1, w2) JOIN hd USING (w1)
        )
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum(term_fp) AS BIGINT) AS ll_fp
        FROM term GROUP BY doc_id
    """,
    "grouped_regression": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity) AS BIGINT) AS x,
                   CAST(round(l_extendedprice) AS BIGINT) AS y
            FROM lineitem
        ),
        a AS (
            SELECT l_returnflag, count(*) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy
            FROM m GROUP BY l_returnflag
        ),
        f AS (
            SELECT l_returnflag, n,
                   ((n * 1.0) * sxy - (sx * 1.0) * sy)
                   / ((n * 1.0) * sxx - (sx * 1.0) * sx) AS slope
            FROM a
        )
        SELECT f.l_returnflag, f.n,
               CAST(round(slope * 1000000.0) AS BIGINT) AS slope_fp,
               CAST(round(((a.sy * 1.0) - slope * (a.sx * 1.0))
                          / (a.n * 1.0) * 1000000.0)
                    AS BIGINT) AS intercept_fp
        FROM f JOIN a USING (l_returnflag)
    """,
    "weighted_avg": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
                   CAST(round(l_discount * 100) AS BIGINT) AS d
            FROM lineitem
        ),
        a AS (
            SELECT l_returnflag, count(*) AS n,
                   sum(p) AS sp, sum(p * d) AS spd
            FROM m GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               CAST(spd * 10000 // sp AS BIGINT) AS wavg_disc_fp
        FROM a
    """,
    "unpivot_long": """
        SELECT p_partkey, 'p_size' AS attr,
               CAST(p_size AS BIGINT) * 100 AS val_fp
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS attr,
               CAST(round(p_retailprice * 100) AS BIGINT) AS val_fp
        FROM part
    """,
    "grouped_skew": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity) AS BIGINT) AS x
            FROM lineitem
        ),
        a AS (
            SELECT l_returnflag, count(*) AS n,
                   sum(x) AS sx, sum(x * x) AS sxx,
                   sum(x * x * x) AS sxxx
            FROM m GROUP BY l_returnflag
        ),
        f AS (
            SELECT l_returnflag, n,
                   ((n * 1.0) * sxx - (sx * 1.0) * sx)
                   / ((n * 1.0) * (n * 1.0)) AS m2,
                   ((((n * 1.0) * (n * 1.0)) * sxxx
                     - (3.0 * (n * 1.0)) * ((sx * 1.0) * sxx))
                    + (2.0 * (sx * 1.0)) * ((sx * 1.0) * sx))
                   / (((n * 1.0) * (n * 1.0)) * (n * 1.0)) AS m3
            FROM a
        )
        SELECT l_returnflag, n,
               CAST(round(m3 / (m2 * sqrt(m2)) * 1000000.0)
                    AS BIGINT) AS skew_fp
        FROM f
    """,
    "grouped_corr": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity) AS BIGINT) AS x,
                   CAST(round(l_extendedprice) AS BIGINT) AS y
            FROM lineitem
        ),
        a AS (
            SELECT l_returnflag, count(*) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(y * y) AS syy,
                   sum(x * y) AS sxy
            FROM m GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               CAST(round(
                   ((n * 1.0) * sxy - (sx * 1.0) * sy)
                   / (sqrt((n * 1.0) * sxx - (sx * 1.0) * sx)
                      * sqrt((n * 1.0) * syy - (sy * 1.0) * sy))
                   * 1000000.0) AS BIGINT) AS corr_fp
        FROM a
    """,
    "grouped_variance": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity * 100) AS BIGINT) AS v
            FROM lineitem
        ),
        a AS (
            SELECT l_returnflag, count(*) AS n,
                   sum(v) AS s, sum(v * v) AS s2
            FROM m GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               round((s2 * 1.0 - (s * 1.0) * (s * 1.0) / n) / n / 10000.0
                     * 10000.0) / 10000.0 AS var_pop
        FROM a
    """,
    "bigram_stats": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text),
                                                  '[^a-z0-9_]+'),
                               t -> t <> '') AS w
            FROM documents
        ),
        bi AS (
            SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS c
            FROM toks, UNNEST(range(1, len(w))) AS u(i)
            WHERE len(w) >= 2
            GROUP BY w1, w2
        ),
        h AS (SELECT w1, sum(c) AS hc FROM bi GROUP BY w1)
        SELECT bi.w1, bi.w2, c,
               CAST((c * 1000000) // hc AS BIGINT) AS prob_fp
        FROM bi JOIN h USING (w1)
        WHERE c >= 5
    """,
    "group_outliers": """
        WITH m AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
            FROM events
        ),
        a AS (
            SELECT event_type, count(*) AS n,
                   sum(v) AS s, sum(v * v) AS s2
            FROM m GROUP BY event_type
        )
        SELECT m.event_type, count(*) AS n_outliers
        FROM m JOIN a USING (event_type)
        WHERE (m.v * 1.0 - a.s * 1.0 / a.n)
              * (m.v * 1.0 - a.s * 1.0 / a.n)
              > 9.0 * ((a.s2 * 1.0 - (a.s * 1.0) * (a.s * 1.0) / a.n)
                       / a.n)
        GROUP BY m.event_type
    """,
    "pivot_wide": """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    """,
    "range_join": """
        WITH w AS (
            SELECT event_id AS window_id,
                   epoch_us(ts) AS start_us,
                   epoch_us(ts) + (30 + (event_id % 5) * 15) * 60000000
                       AS end_us
            FROM events WHERE event_id % 89 = 0
        )
        SELECT e.event_id, w.window_id
        FROM events e JOIN w
          ON epoch_us(e.ts) >= w.start_us AND epoch_us(e.ts) < w.end_us
    """,
    "similarity_join": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text),
                                                  '[^a-z0-9_]+'),
                               t -> t <> '') AS w
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
            FROM toks, UNNEST(range(1, len(w) - 1)) AS u(i)
            WHERE len(w) >= 3
        ),
        szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        pairs AS (
            SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
            FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id
        )
        SELECT a, b,
               CAST((inter * 1000000) // (sa.sz + sb.sz - inter) AS BIGINT)
                   AS jaccard_fp
        FROM pairs
        JOIN szs sa ON a = sa.doc_id
        JOIN szs sb ON b = sb.doc_id
        WHERE inter * 100 >= (sa.sz + sb.sz - inter) * 50
    """,
    "j_inner_join": """
        SELECT c_nationkey,
               round(sum(o_totalprice) * 10000.0) / 10000.0 AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    """,
    "j_left_outer": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "asof_join": """
        WITH m AS (
            SELECT user_id, ts, max(event_id) AS marker_event_id
            FROM events WHERE event_id % 97 = 0 GROUP BY user_id, ts
        )
        SELECT e.event_id, m.marker_event_id
        FROM events e ASOF LEFT JOIN m
          ON e.user_id = m.user_id AND e.ts >= m.ts
    """,
    "region_revenue": """
        SELECT r_name,
               round(sum(o_totalprice) * 10000.0) / 10000.0 AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "event_funnel": """
        WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS t_click
              FROM events e JOIN v USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > v.t_view
              GROUP BY e.user_id),
        p AS (SELECT e.user_id FROM events e JOIN c USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > c.t_click
              GROUP BY e.user_id)
        SELECT (SELECT count(*) FROM v) AS n_view,
               (SELECT count(*) FROM c) AS n_view_click,
               (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
    "window_functions": """
        WITH s AS (
            SELECT user_id, ts, event_id,
                   CAST(round(value * 1000000) AS BIGINT) AS v
            FROM events
        )
        SELECT user_id, event_id,
               row_number() OVER w AS rn,
               CAST(sum(v) OVER w AS BIGINT) AS run_sum_fp,
               v - lag(v) OVER w AS step_fp
        FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "rollup_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_fp,
               count(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "cube_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_fp,
               count(*) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "relational_division": """
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (1, 2, 3, 4, 5)
        GROUP BY l_suppkey
        HAVING count(DISTINCT l_partkey) >= 3
    """,
    "above_customer_avg": """
        WITH fp AS (
            SELECT o_orderkey, o_custkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS p
            FROM orders),
        agg AS (
            SELECT o_custkey AS k, sum(p) AS s, count(*) AS n
            FROM fp GROUP BY o_custkey)
        SELECT fp.o_orderkey
        FROM fp JOIN agg ON fp.o_custkey = agg.k
        WHERE fp.p * agg.n > agg.s
    """,
    "table_diff": """
        WITH old AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS p
            FROM orders WHERE o_orderkey % 10 != 0),
        new AS (
            SELECT o_orderkey,
                   (CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END)
                   * CAST(round(o_totalprice * 100) AS BIGINT) AS p
            FROM orders WHERE o_orderkey % 7 != 0)
        SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
               CASE WHEN old.o_orderkey IS NULL THEN 'added'
                    WHEN new.o_orderkey IS NULL THEN 'removed'
                    WHEN old.p != new.p THEN 'changed'
                    ELSE 'same' END AS status
        FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    """,
    "rank_functions": """
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(round(value * 1000000) AS BIGINT) AS v
            FROM events
        )
        SELECT user_id, event_id,
               rank() OVER (PARTITION BY user_id ORDER BY v) AS rnk,
               dense_rank() OVER (PARTITION BY user_id ORDER BY v) AS drnk,
               CASE WHEN count(*) OVER (PARTITION BY user_id) = 1 THEN 0
                    ELSE (rank() OVER (PARTITION BY user_id ORDER BY v) - 1)
                         * 1000000
                         // (count(*) OVER (PARTITION BY user_id) - 1)
               END AS pct_fp,
               ntile(4) OVER (PARTITION BY user_id ORDER BY v, event_id)
                   AS tile
        FROM e
    """,
    "quantiles": """
        WITH s AS (
            SELECT l_quantity AS v,
                   row_number() OVER (ORDER BY l_quantity) AS rn,
                   count(*) OVER () AS n
            FROM lineitem
        )
        SELECT max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.25 * n) AS BIGINT))
                        THEN v END) AS q25,
               max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.50 * n) AS BIGINT))
                        THEN v END) AS q50,
               max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.75 * n) AS BIGINT))
                        THEN v END) AS q75,
               max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.95 * n) AS BIGINT))
                        THEN v END) AS q95
        FROM s
    """,
    "grouped_median": """
        WITH s AS (
            SELECT l_returnflag, l_quantity AS v,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_quantity) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem)
        SELECT l_returnflag,
               max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT))
                        THEN v END) AS median_qty,
               max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.9 * n) AS BIGINT))
                        THEN v END) AS p90_qty
        FROM s GROUP BY l_returnflag
    """,
    "pagerank": _pagerank_oracle(),
    "key_skew": """
        WITH c AS (
            SELECT o_custkey, count(*) AS c
            FROM orders GROUP BY o_custkey
        ),
        r AS (
            SELECT c, row_number() OVER (ORDER BY c, o_custkey) AS i
            FROM c
        ),
        a AS (
            SELECT count(*) AS k, sum(c) AS s,
                   max(c) AS top1, sum(i * c) AS ic
            FROM r
        )
        SELECT k AS n_keys, CAST(s AS BIGINT) AS n_rows,
               CAST(top1 * 1000000 // s AS BIGINT) AS top1_fp,
               CAST((2 * ic - (k + 1) * s) * 1000000 // (k * s)
                    AS BIGINT) AS gini_fp
        FROM a
    """,
    "winsorize": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS v
            FROM lineitem
        ),
        s AS (
            SELECT l_returnflag, v,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY v) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM m
        ),
        q AS (
            SELECT l_returnflag,
                   max(CASE WHEN rn = GREATEST(1,
                       CAST(ceil(0.05 * n) AS BIGINT)) THEN v END) AS lo,
                   max(CASE WHEN rn = GREATEST(1,
                       CAST(ceil(0.95 * n) AS BIGINT)) THEN v END) AS hi
            FROM s GROUP BY 1
        )
        SELECT m.l_returnflag, count(*) AS n,
               CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_lo,
               CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_hi,
               CAST(sum(CASE WHEN v < lo THEN lo
                             WHEN v > hi THEN hi ELSE v END)
                    AS BIGINT) AS sum_clipped_fp
        FROM m JOIN q USING (l_returnflag)
        GROUP BY 1
    """,
    "triangle_count": """
        WITH nn AS (SELECT count(*) AS c FROM customer),
        e0 AS (
            SELECT o_custkey AS src,
                   o_orderkey % (SELECT c FROM nn) AS dst
            FROM orders
        ),
        e AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM e0 WHERE src <> dst
        ),
        w AS (
            SELECT e1.v AS a, e2.v AS b
            FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        )
        SELECT (SELECT count(*) FROM w) AS n_wedges,
               (SELECT count(*) FROM w JOIN e
                 ON e.u = w.a AND e.v = w.b) AS n_triangles
    """,
    "percentile_cont": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS v
            FROM lineitem
        ),
        s AS (
            SELECT l_returnflag, v,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY v) - 1 AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM m
        ),
        q AS (
            SELECT g.l_returnflag, g.n, t.k,
                   (t.k * (g.n - 1)) // 4 AS idx,
                   (t.k * (g.n - 1)) % 4 AS rem
            FROM (SELECT DISTINCT l_returnflag, n FROM s) g
            CROSS JOIN (VALUES (1), (2), (3)) t(k)
        ),
        j AS (
            SELECT q.l_returnflag, q.n, q.k, q.rem,
                   max(CASE WHEN s.rn = q.idx THEN s.v END) AS lo,
                   max(CASE WHEN s.rn = q.idx + 1 THEN s.v END) AS hi
            FROM q JOIN s
              ON s.l_returnflag = q.l_returnflag
             AND (s.rn = q.idx OR s.rn = q.idx + 1)
            GROUP BY 1, 2, 3, 4
        )
        SELECT l_returnflag, any_value(n) AS n,
               max(CASE WHEN k = 1 THEN
                   (4 * lo + rem * (COALESCE(hi, lo) - lo)) / 400.0
                   END) AS p25,
               max(CASE WHEN k = 2 THEN
                   (4 * lo + rem * (COALESCE(hi, lo) - lo)) / 400.0
                   END) AS p50,
               max(CASE WHEN k = 3 THEN
                   (4 * lo + rem * (COALESCE(hi, lo) - lo)) / 400.0
                   END) AS p75
        FROM j GROUP BY l_returnflag
    """,
    "grouped_entropy": """
        WITH c AS (
            SELECT user_id, event_type, count(*) AS c
            FROM events GROUP BY user_id, event_type
        ),
        a AS (
            SELECT user_id, sum(c) AS n,
                   sum(CAST(round(c * ln(c) * 1000000000.0) AS BIGINT))
                       AS s
            FROM c GROUP BY user_id
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_events,
               CAST(round((ln(n) - (s / 1000000000.0) / n) * 1000000.0)
                    AS BIGINT) AS entropy_fp
        FROM a
    """,
    "cross_join": """
        SELECT r_name, n_name, r_name || ':' || n_name AS pair
        FROM region CROSS JOIN nation
    """,
    "segment_monthly_revenue": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               round(sum(o_totalprice) * 10000.0) / 10000.0 AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY 1
    """,
    "string_agg": """
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey
    """,
    "distinct_count": """
        SELECT count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps
        FROM lineitem
    """,
    "sample_hash": """
        SELECT doc_id, n_chars FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    """,
    "source_cap": """
        SELECT source, doc_id, rn AS rank FROM (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents) WHERE rn <= 15
    """,
    "stratified_sample": """
        SELECT doc_id, lang FROM documents
        WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3'))
           OR (lang <> 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3','4','5','6','7'))
    """,
    "term_doc_freq": """
        SELECT term, count(*) AS df FROM (
            SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text),
                                                    '[^a-z0-9_]+')) AS term
                FROM documents)
            WHERE term <> '')
        GROUP BY term ORDER BY df DESC, term LIMIT 50
    """,
    "tfidf_top_terms": """
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text),
                                                '[^a-z0-9_]+')) AS term
            FROM documents),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM tok WHERE term <> '' GROUP BY doc_id, term),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS df
            FROM tok WHERE term <> '' GROUP BY term),
        s AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                   (tf.tf * 1000000) // df.df AS score_fp,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY (tf.tf * 1000000) // df.df DESC, tf.term
                   ) AS rn
            FROM tf JOIN df USING (term))
        SELECT doc_id, term, tf, CAST(score_fp AS BIGINT) AS score_fp
        FROM s WHERE rn <= 3
    """,
    "export_partitioned": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
        FROM orders GROUP BY 1
    """,
    "cohort_retention": """
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        f AS (SELECT user_id, min(day) AS c FROM du GROUP BY user_id)
        SELECT strftime(f.c, '%Y-%m-%d') AS cohort_day,
               CAST(du.day - f.c AS BIGINT) AS k,
               count(*) AS n_users
        FROM du JOIN f USING (user_id)
        WHERE du.day - f.c <= 13
        GROUP BY 1, 2
    """,
    "grouped_mad": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity * 100) AS BIGINT) AS v
            FROM lineitem
        ),
        s AS (
            SELECT l_returnflag, v,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY v) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM m
        ),
        med AS (
            SELECT l_returnflag,
                   max(CASE WHEN rn = GREATEST(1,
                       CAST(ceil(0.5 * n) AS BIGINT)) THEN v END) AS med
            FROM s GROUP BY 1
        ),
        dev AS (
            SELECT m.l_returnflag, med.med, abs(m.v - med.med) AS dd
            FROM m JOIN med USING (l_returnflag)
        ),
        s2 AS (
            SELECT l_returnflag, med, dd,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY dd) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM dev
        )
        SELECT l_returnflag, any_value(med) AS median_fp,
               max(CASE WHEN rn = GREATEST(1,
                   CAST(ceil(0.5 * n) AS BIGINT)) THEN dd END) AS mad_fp
        FROM s2 GROUP BY 1
    """,
    "event_transitions": """
        WITH s AS (
            SELECT event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS nxt
            FROM events
        )
        SELECT event_type AS prev_event, nxt AS next_event,
               count(*) AS n
        FROM s WHERE nxt IS NOT NULL
        GROUP BY 1, 2
    """,
    "fuzzy_best_match": """
        WITH q AS (
            SELECT p_partkey,
                   substr(p_name, 1, p_partkey % length(p_name))
                   || substr(p_name, p_partkey % length(p_name) + 2)
                       AS qname
            FROM part WHERE p_partkey < 50
        ),
        c AS (SELECT p_name AS cname FROM part WHERE p_partkey < 500),
        d AS (
            SELECT q.p_partkey, q.qname, c.cname,
                   levenshtein(q.qname, c.cname) AS dist,
                   row_number() OVER (
                       PARTITION BY q.p_partkey
                       ORDER BY levenshtein(q.qname, c.cname), c.cname
                   ) AS rn
            FROM q CROSS JOIN c
        )
        SELECT p_partkey, qname, cname AS match_name, dist
        FROM d WHERE rn = 1
    """,
    "rolling_active_users": """
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        w AS (
            SELECT CAST(day + g.i * INTERVAL 1 DAY AS DATE) AS wday,
                   user_id
            FROM du CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6))
                 g(i)
        )
        SELECT strftime(wday, '%Y-%m-%d') AS day,
               count(DISTINCT user_id) AS wau
        FROM w GROUP BY 1
    """,
    "pareto_frontier": """
        WITH m AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS p,
                   CAST(o_orderdate AS DATE) AS d
            FROM orders
        )
        SELECT o_orderkey, p AS price_fp,
               strftime(d, '%Y-%m-%d') AS date
        FROM m b
        WHERE NOT EXISTS (
            SELECT 1 FROM m a
            WHERE a.p >= b.p AND a.d <= b.d
              AND (a.p > b.p OR a.d < b.d))
    """,
    "export_jsonl_csv": """
        SELECT CAST(source AS VARCHAR) AS key, count(*) AS n,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM documents GROUP BY source
        UNION ALL
        SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS n,
               CAST(sum(event_id) AS BIGINT) AS id_sum
        FROM events GROUP BY event_type
    """,
    "embedding_norms": """
        SELECT vec_id,
               round(sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                     * 1000000.0) / 1000000.0 AS l2
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        GROUP BY vec_id
    """,
}

# Composed oracle: transitive closure over the similarity pairs — the
# recursive CTE replays q_connected_components' min-label fixpoint.
ORACLES["connected_components"] = (
    "WITH RECURSIVE pairs_t AS (" + ORACLES["similarity_join"] + "),\n"
    """e AS (
        SELECT a AS src, b AS dst FROM pairs_t
        UNION SELECT b, a FROM pairs_t
        UNION SELECT a, a FROM pairs_t
        UNION SELECT b, b FROM pairs_t
    ),
    reach(n, m) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.n, e2.dst FROM reach r JOIN e e2 ON r.m = e2.src
    )
    SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n"""
)

ORACLES["unnest_explode"] = """
    SELECT vec_id, ord, embedding[ord]::DOUBLE AS val
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(ord)
"""

ORACLES["gap_fill"] = """
    WITH m AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM m GROUP BY 1),
    g AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day FROM b)
    SELECT g.user_id, g.day, CAST(COALESCE(m.n, 0) AS BIGINT) AS n
    FROM g LEFT JOIN m ON g.user_id = m.user_id AND g.day = m.day
"""

ORACLES["lead_dwell"] = """
    SELECT user_id, event_id,
           CAST(date_diff('microsecond', ts,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                AS DOUBLE) AS dwell_us
    FROM events
"""

ORACLES["cdc_upsert"] = """
    WITH base AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_fp,
               CAST(0 AS BIGINT) AS version
        FROM orders
    ),
    upd AS (
        SELECT o_orderkey, price_fp + 100000 AS price_fp,
               CAST(1 AS BIGINT) AS version
        FROM base WHERE o_orderkey % 7 = 0
    ),
    allr AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY version DESC) AS rn
        FROM allr
    )
    SELECT o_orderkey, price_fp, version FROM r WHERE rn = 1
"""

ORACLES["graph_bfs"] = _bfs_oracle()

ORACLES["j_full_outer"] = """
    WITH l AS (
        SELECT c_custkey, CAST(1 AS BIGINT) AS has_neg_bal
        FROM customer WHERE c_acctbal < 0
    ),
    r AS (
        SELECT o_custkey, count(*) AS n_big
        FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
    )
    SELECT COALESCE(l.c_custkey, r.o_custkey) AS custkey,
           COALESCE(l.has_neg_bal, 0) AS has_neg_bal,
           CAST(COALESCE(r.n_big, 0) AS BIGINT) AS n_big
    FROM l FULL OUTER JOIN r ON l.c_custkey = r.o_custkey
"""

ORACLES["forward_fill"] = """
    SELECT user_id, event_id,
           last_value(CASE WHEN event_id % 7 = 0 THEN event_id END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled
    FROM events
"""

ORACLES["exists_subquery"] = """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
"""

ORACLES["order_count_distribution"] = """
    WITH c AS (
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    SELECT n_orders, count(*) AS n_custs FROM c GROUP BY n_orders
"""

ORACLES["argmax_join"] = """
    SELECT c_nationkey, n_name, c_custkey, c_acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer) t JOIN nation ON n_nationkey = c_nationkey
    WHERE rn = 1
"""

ORACLES["mom_growth"] = """
    WITH m AS (
        SELECT c_mktsegment, strftime(o_orderdate, '%Y-%m') AS month,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_fp
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2)
    SELECT c_mktsegment, month, rev_fp,
           lag(rev_fp) OVER (PARTITION BY c_mktsegment ORDER BY month)
               AS prev_fp,
           rev_fp - lag(rev_fp) OVER (PARTITION BY c_mktsegment
                                      ORDER BY month) AS diff_fp
    FROM m
"""

ORACLES["source_jaccard"] = """
    WITH tok AS (
        SELECT DISTINCT source, term FROM (
            SELECT source,
                   unnest(regexp_split_to_array(lower(text),
                                                '[^a-z0-9_]+')) AS term
            FROM documents)
        WHERE term <> ''),
    sz AS (SELECT source, count(*) AS n FROM tok GROUP BY source),
    i AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
        FROM tok a JOIN tok b ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2)
    SELECT i.src_a, i.src_b,
           CAST(i.n_inter AS BIGINT) AS n_inter,
           CAST(sa.n + sb.n - i.n_inter AS BIGINT) AS n_union,
           i.n_inter / (sa.n + sb.n - i.n_inter) AS jaccard
    FROM i JOIN sz sa ON sa.source = i.src_a
           JOIN sz sb ON sb.source = i.src_b
"""

ORACLES["bucketed_join"] = """
    SELECT c_nationkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS rev_fp,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
"""

ORACLES["fk_integrity"] = """
    SELECT 'lineitem.l_orderkey->orders' AS relation,
           count(DISTINCT l_orderkey) AS n_child_keys,
           (SELECT count(DISTINCT l.l_orderkey) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphans
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           count(DISTINCT l_partkey),
           (SELECT count(DISTINCT l.l_partkey) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    FROM lineitem
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           count(DISTINCT o_custkey),
           (SELECT count(DISTINCT o.o_custkey) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    FROM orders
    ORDER BY relation
"""

ORACLES["table_profile"] = """
    SELECT 'o_custkey' AS col, count(*) AS n_rows,
           count(*) - count(o_custkey) AS n_null,
           count(DISTINCT o_custkey) AS n_distinct FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus) FROM orders
    ORDER BY col
"""

ORACLES["chi_square"] = """
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ),
    t AS (
        SELECT *,
               CAST(sum(n) OVER (PARTITION BY o_orderstatus) AS BIGINT)
                   AS rt,
               CAST(sum(n) OVER (PARTITION BY o_orderpriority) AS BIGINT)
                   AS ct,
               CAST(sum(n) OVER () AS BIGINT) AS tot
        FROM c
    )
    SELECT o_orderstatus, o_orderpriority, n,
           CAST(round(1e6 * (CAST(rt * ct AS DOUBLE) / tot))
                AS BIGINT) AS e_fp,
           CAST(round(1e9 * ((n - CAST(rt * ct AS DOUBLE) / tot)
                             * (n - CAST(rt * ct AS DOUBLE) / tot)
                             / (CAST(rt * ct AS DOUBLE) / tot)))
                AS BIGINT) AS chi2_fp
    FROM t ORDER BY o_orderstatus, o_orderpriority
"""

ORACLES["idle_rich_customers"] = """
    WITH pool AS (
        SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer
        WHERE c_acctbal > 0.0
          AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    s AS (SELECT CAST(sum(bal_c) AS BIGINT) AS tot,
                 count(*) AS np FROM pool)
    SELECT c_nationkey, count(*) AS n_custs,
           CAST(sum(bal_c) AS BIGINT) AS totbal_fp
    FROM pool, s
    WHERE bal_c * np > tot
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = pool.c_custkey
                        AND o.o_totalprice > 450000.0)
    GROUP BY c_nationkey
"""

ORACLES["group_mean_impute"] = """
    WITH v AS (
        SELECT event_id, user_id,
               CAST(round(value * 1e6) AS BIGINT) AS v_fp,
               (event_id % 11 = 0) AS miss
        FROM events
    ),
    m AS (
        SELECT user_id,
               CAST(round(CAST(sum(CASE WHEN NOT miss THEN v_fp END)
                               AS DOUBLE)
                          / NULLIF(count(CASE WHEN NOT miss THEN 1 END),
                                   0))
                    AS BIGINT) AS mean_fp
        FROM v GROUP BY user_id
    )
    SELECT v.event_id, v.user_id,
           CASE WHEN v.miss THEN m.mean_fp ELSE v.v_fp END AS value_fp
    FROM v JOIN m USING (user_id)
"""

ORACLES["trimmed_mean"] = """
    WITH q AS (
        SELECT l_returnflag,
               CAST(round(l_quantity * 100) AS BIGINT) AS qc,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_quantity) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    )
    SELECT l_returnflag, count(*) AS n_kept,
           CAST(sum(qc) AS BIGINT) AS sum_fp,
           CAST(round(CAST(sum(qc) AS DOUBLE) / count(*))
                AS BIGINT) AS mean_fp
    FROM q WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY l_returnflag ORDER BY l_returnflag
"""

# decontaminate gained an exact oracle (string-level shingle overlap —
# the engine's 64-bit shingle hashes are injective in practice, verified
# by this very comparison): windows mirror functions/sketches.shingles
# (k=8; ≤k tokens → ONE whole-doc shingle via greatest(len−6, 2))
ORACLES["decontaminate"] = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text),
                                              '[^a-z0-9_]+'),
                           t -> t <> '') AS ts
        FROM documents
    ),
    wins AS (
        SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS sh
        FROM toks, UNNEST(range(1, greatest(len(ts) - 6, 2))) AS u(i)
        WHERE len(ts) >= 1
    ),
    bench AS (SELECT DISTINCT sh FROM wins WHERE doc_id < 5),
    flags AS (
        SELECT w.doc_id,
               max(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS hit
        FROM wins w LEFT JOIN bench b ON w.sh = b.sh
        GROUP BY w.doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id < 5 THEN TRUE
                ELSE COALESCE(f.hit, 0) = 1 END AS contaminated
    FROM documents d LEFT JOIN flags f ON d.doc_id = f.doc_id
"""

ORACLES["zorder_layout"] = """
    WITH xy AS (
        SELECT o_custkey % 1048576 AS x,
               CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT)
                   % 1048576 AS y
        FROM orders
    ),
    z AS (
        SELECT x, y,
               CAST((SELECT sum((((x >> i) & 1) * (2.0 ** (2 * i)))
                                + (((y >> i) & 1)
                                   * (2.0 ** (2 * i + 1))))
                     FROM range(0, 20) t(i)) AS BIGINT) >> 28 AS zblock
        FROM xy
    ),
    blk AS (
        SELECT zblock, count(*) AS n_rows,
               min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y
        FROM z GROUP BY zblock
    )
    SELECT zblock, n_rows, min_x, max_x, min_y, max_y,
           (min_x <= 4000 AND max_x >= 2000
            AND min_y <= 10500 AND max_y >= 9500) AS touched
    FROM blk
"""

ORACLES["disjunctive_band_revenue"] = """
    SELECT CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                               * 100) AS BIGINT)) AS BIGINT)
               AS revenue_fp,
           count(*) AS n_rows
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_type = 'PROMO'
           AND l_quantity >= 1.0 AND l_quantity <= 11.0)
       OR (p_type = 'SMALL' AND p_size >= 1 AND p_size <= 25
           AND l_quantity >= 10.0 AND l_quantity <= 20.0)
       OR (p_type = 'LARGE' AND p_size >= 10
           AND l_quantity >= 20.0 AND l_quantity <= 30.0)
"""

ORACLES["supplier_nation_profit"] = """
    SELECT n_name,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                               * 100) AS BIGINT)) AS BIGINT)
               AS profit_fp,
           count(*) AS n_items
    FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON n_nationkey = s_nationkey
         JOIN orders ON o_orderkey = l_orderkey
    GROUP BY n_name, o_year
"""

ORACLES["returned_revenue_topk"] = """
    WITH lost AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS lost_fp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY o_custkey
    )
    SELECT o_custkey, n_name, lost_fp
    FROM lost JOIN customer ON c_custkey = o_custkey
              JOIN nation ON n_nationkey = c_nationkey
    ORDER BY lost_fp DESC, o_custkey
    LIMIT 20
"""

ORACLES["rfm_segments"] = """
    WITH pc AS (
        SELECT o_custkey,
               max(CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT))
                   AS last_day,
               count(*) AS f,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS m_cents
        FROM orders GROUP BY o_custkey
    ),
    rd AS (SELECT max(last_day) AS ref_day FROM pc),
    rf AS (SELECT ref_day - last_day AS r, f, m_cents FROM pc, rd),
    ranked AS (
        SELECT r, f, m_cents,
               row_number() OVER (ORDER BY r) AS rr,
               row_number() OVER (ORDER BY f) AS fr,
               count(*) OVER () AS n
        FROM rf
    ),
    th AS (
        SELECT
            max(CASE WHEN rr = greatest(1, CAST(ceil(0.25 * n)
                                                AS BIGINT))
                     THEN r END) AS r25,
            max(CASE WHEN rr = greatest(1, CAST(ceil(0.5 * n)
                                                AS BIGINT))
                     THEN r END) AS r50,
            max(CASE WHEN rr = greatest(1, CAST(ceil(0.75 * n)
                                                AS BIGINT))
                     THEN r END) AS r75,
            max(CASE WHEN fr = greatest(1, CAST(ceil(0.25 * n)
                                                AS BIGINT))
                     THEN f END) AS f25,
            max(CASE WHEN fr = greatest(1, CAST(ceil(0.5 * n)
                                                AS BIGINT))
                     THEN f END) AS f50,
            max(CASE WHEN fr = greatest(1, CAST(ceil(0.75 * n)
                                                AS BIGINT))
                     THEN f END) AS f75
        FROM ranked
    )
    SELECT 1 + CAST(r > r25 AS BIGINT) + CAST(r > r50 AS BIGINT)
             + CAST(r > r75 AS BIGINT) AS r_bucket,
           1 + CAST(f > f25 AS BIGINT) + CAST(f > f50 AS BIGINT)
             + CAST(f > f75 AS BIGINT) AS f_bucket,
           CAST(length(CAST(m_cents AS VARCHAR)) AS BIGINT) AS m_band,
           count(*) AS n_custs
    FROM rf, th
    GROUP BY r_bucket, f_bucket, m_band
"""

ORACLES["first_touch_attribution"] = """
    WITH f AS (
        SELECT user_id, first(event_type ORDER BY ts, event_id)
                   AS channel
        FROM events GROUP BY user_id
    ),
    p AS (
        SELECT user_id, count(*) AS n_purch
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT channel,
           CAST(sum(n_purch) AS BIGINT) AS n_purchases,
           count(*) AS n_users
    FROM p JOIN f USING (user_id)
    GROUP BY channel
"""

ORACLES["time_to_convert"] = """
    WITH fv AS (
        SELECT user_id, min(epoch_ms(ts)) AS v_ms
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    d AS (
        SELECT e.user_id, epoch_ms(e.ts) - fv.v_ms AS dd
        FROM events e JOIN fv USING (user_id)
        WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= fv.v_ms
    )
    SELECT user_id, CAST(min(dd) AS BIGINT) AS ttc_ms
    FROM d GROUP BY user_id
"""

ORACLES["incremental_agg"] = """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS rev_fp,
           count(*) AS n
    FROM orders GROUP BY month
"""

ORACLES["quality_top_quartile"] = """
    WITH r AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    ),
    t AS (
        SELECT source,
               max(CASE WHEN rn = CAST(greatest(1, ceil(0.75 * n))
                                       AS BIGINT)
                        THEN n_chars END) AS p75
        FROM r GROUP BY source
    )
    SELECT doc_id, documents.source, n_chars
    FROM documents JOIN t ON documents.source = t.source
    WHERE n_chars > p75
"""

ORACLES["schema_evolution_read"] = """
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
               AS o_orderpriority_u,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS tot_fp
    FROM orders GROUP BY o_orderpriority_u
"""

ORACLES["standardize"] = """
    WITH m AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ),
    a AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(v) AS BIGINT) AS s,
               CAST(sum(v * v) AS BIGINT) AS s2
        FROM m GROUP BY event_type
    )
    SELECT event_id, m.event_type,
           CAST(round(1e6 * ((m.v * 1.0 - a.s * 1.0 / a.n)
                             / sqrt((a.s2 * 1.0
                                     - (a.s * 1.0) * (a.s * 1.0) / a.n)
                                    / a.n)))
                AS BIGINT) AS z_fp
    FROM m JOIN a USING (event_type)
"""

ORACLES["train_val_test_split"] = """
    WITH b AS (
        SELECT source,
               CAST((SELECT sum((strpos('0123456789abcdef',
                                        substr(h, i, 1)) - 1)
                                * 16 ** (8 - i))
                     FROM range(1, 9) t(i)) AS BIGINT) % 10 AS bucket
        FROM (SELECT source, md5(CAST(doc_id AS VARCHAR)) AS h
              FROM documents)
    )
    SELECT source,
           CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n
    FROM b GROUP BY source, split
"""

ORACLES["q6_band_revenue"] = """
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 1e4)
                         AS BIGINT)) AS BIGINT) AS revenue_fp,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24.0
"""

ORACLES["ship_delay_distribution"] = """
    SELECT date_diff('day', CAST(o_orderdate AS DATE),
                     CAST(l_shipdate AS DATE)) AS delay_days,
           count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY delay_days
"""

ORACLES["promo_revenue_ratio"] = """
    WITH m AS (
        SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m')
                   AS month,
               CAST(sum(CASE WHEN p_type = 'PROMO'
                             THEN CAST(round(l_extendedprice * 100)
                                       AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS promo_fp,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS total_fp
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY month
    )
    SELECT month, promo_fp, total_fp,
           CAST(round(1e9 * (CAST(promo_fp AS DOUBLE)
                             / CAST(total_fp AS DOUBLE)))
                AS BIGINT) AS ratio_fp
    FROM m
"""

ORACLES["pmi_bigrams"] = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text),
                                              '[^a-z0-9_]+'),
                           t -> t <> '') AS w
        FROM documents
    ),
    bi AS (
        SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS c
        FROM toks, UNNEST(range(1, len(w))) AS u(i)
        WHERE len(w) >= 2
        GROUP BY w1, w2
    ),
    h AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM bi GROUP BY w1),
    t AS (SELECT w2, CAST(sum(c) AS BIGINT) AS c2 FROM bi GROUP BY w2),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS nb FROM bi)
    SELECT bi.w1, bi.w2, c,
           CAST(round(1e9 * ln((c * nb) * 1.0 / (c1 * c2)))
                AS BIGINT) AS pmi_fp
    FROM bi JOIN h USING (w1) JOIN t USING (w2), nn
    WHERE c >= 5
"""

ORACLES["daily_anomaly"] = """
    WITH d AS (
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    w AS (
        SELECT day, CAST(n AS BIGINT) AS n,
               CAST(count(*) OVER win AS BIGINT) AS k,
               CAST(COALESCE(sum(n) OVER win, 0) AS BIGINT) AS s,
               CAST(COALESCE(sum(n * n) OVER win, 0) AS BIGINT) AS s2
        FROM d
        WINDOW win AS (ORDER BY day
                       ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, n,
           (n * 7 - s) * (n * 7 - s) AS dev_sq,
           9 * (s2 * 7 - s * s) AS thr,
           (n * 7 - s) * (n * 7 - s) > 9 * (s2 * 7 - s * s)
               AS is_anomaly
    FROM w
    WHERE k = 7
    ORDER BY day
"""

ORACLES["dedup_survivor"] = """
    WITH h AS (
        SELECT doc_id, source, n_chars, md5(text) AS hh FROM documents
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY hh ORDER BY n_chars DESC, doc_id) AS rn
        FROM h
    )
    SELECT doc_id, source, n_chars FROM r WHERE rn = 1 ORDER BY doc_id
"""

ORACLES["time_weighted_avg"] = """
    WITH o AS (
        SELECT user_id,
               CAST(round(value * 1e3) AS BIGINT) AS v_fp,
               epoch_ms(ts) AS ms,
               lead(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    d AS (
        SELECT user_id, v_fp, nxt - ms AS dw FROM o WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           CAST(sum(dw) AS BIGINT) AS total_dwell_ms,
           CAST(round(CAST(sum(v_fp * dw) AS DOUBLE)
                      / sum(dw)) AS BIGINT) AS twa_fp
    FROM d GROUP BY user_id HAVING sum(dw) > 0
"""

ORACLES["weighted_sample"] = """
    WITH u AS (
        SELECT o_orderkey, o_totalprice,
               ((SELECT sum((strpos('0123456789abcdef',
                                    substr(h, i, 1)) - 1)
                            * 16 ** (8 - i))
                 FROM range(1, 9) t(i)) + 1) / 4294967296.0 AS uu
        FROM (SELECT o_orderkey, o_totalprice,
                     md5(CAST(o_orderkey AS VARCHAR)) AS h FROM orders)
    )
    SELECT o_orderkey,
           CAST(round(1e9 * (ln(uu) / o_totalprice)) AS BIGINT) AS key_fp
    FROM u
    ORDER BY ln(uu) / o_totalprice DESC, o_orderkey
    LIMIT 100
"""

ORACLES["ratio_to_report"] = """
    WITH nr AS (
        SELECT c_nationkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_fp
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    ),
    x AS (
        SELECT n_name, r_name, rev_fp,
               CAST(sum(rev_fp) OVER (PARTITION BY r_name) AS BIGINT)
                   AS reg_fp
        FROM nr JOIN nation ON n_nationkey = c_nationkey
                JOIN region ON r_regionkey = n_regionkey
    )
    SELECT n_name, r_name, rev_fp,
           CAST(round(1e9 * (CAST(rev_fp AS DOUBLE)
                             / CAST(reg_fp AS DOUBLE)))
                AS BIGINT) AS share_fp
    FROM x ORDER BY n_name
"""

ORACLES["q3_shipping_priority"] = """
    WITH li AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_fp
        FROM lineitem
        WHERE l_shipdate > TIMESTAMP '1998-07-01'
        GROUP BY l_orderkey
    )
    SELECT l_orderkey, o_orderdate, o_orderpriority, revenue_fp
    FROM li JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
    ORDER BY revenue_fp DESC, l_orderkey
    LIMIT 10
"""

ORACLES["q7_nation_trade_volume"] = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                               * 100) AS BIGINT)) AS BIGINT)
               AS volume_fp,
           count(*) AS n_items
    FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON sn.n_nationkey = s_nationkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY supp_nation, cust_nation, l_year
"""

ORACLES["q15_top_supplier"] = """
    WITH r AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS total_fp
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT l_suppkey, total_fp FROM r
    WHERE total_fp = (SELECT max(total_fp) FROM r)
    ORDER BY l_suppkey
"""

ORACLES["q17_small_qty_revenue"] = """
    WITH q AS (
        SELECT l_partkey,
               CAST(round(l_quantity * 100) AS BIGINT) AS qty_fp,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ),
    a AS (
        SELECT l_partkey AS pk,
               CAST(sum(qty_fp) AS BIGINT) AS sum_qty_fp,
               count(*) AS n_li
        FROM q GROUP BY l_partkey
    )
    SELECT CAST(sum(cents) AS BIGINT) AS revenue_fp,
           count(*) AS n_rows
    FROM q JOIN a ON l_partkey = pk
    WHERE 5 * qty_fp * n_li < sum_qty_fp
"""

ORACLES["q18_large_orders"] = """
    WITH q AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                    AS BIGINT) AS sum_qty_fp
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 25000
    )
    SELECT l_orderkey, o_custkey, o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
           sum_qty_fp
    FROM q JOIN orders ON o_orderkey = l_orderkey
    ORDER BY total_cents DESC, l_orderkey
    LIMIT 20
"""

ORACLES["q8_market_share"] = """
    WITH t AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                    AS BIGINT) AS rev,
               CASE WHEN sn.n_name = 'NATION_3' THEN 1 ELSE 0 END AS ist
        FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation sn ON sn.n_nationkey = s_nationkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation cn ON cn.n_nationkey = c_nationkey
             JOIN region ON r_regionkey = cn.n_regionkey
        WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(sum(rev * ist) AS BIGINT) AS target_fp,
           CAST(sum(rev) AS BIGINT) AS total_fp,
           CAST(round(1e9 * (CAST(sum(rev * ist) AS DOUBLE)
                             / CAST(sum(rev) AS DOUBLE)))
                AS BIGINT) AS share_fp
    FROM t GROUP BY o_year
"""

ORACLES["q16_part_supplier_counts"] = """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
    GROUP BY p_brand, p_type, p_size
"""

ORACLES["q21_late_sole_supplier"] = """
    WITH ls AS (
        SELECT l_orderkey AS ok, l_suppkey AS sk,
               max(CASE WHEN l_shipdate > o_orderdate
                             + INTERVAL 365 DAY
                        THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY ok, sk
    ),
    po AS (
        SELECT ok, count(*) AS ns, sum(late) AS nl,
               max(CASE WHEN late = 1 THEN sk END) AS lsk
        FROM ls GROUP BY ok
    )
    SELECT lsk AS l_suppkey, count(*) AS numwait
    FROM po WHERE ns > 1 AND nl = 1
    GROUP BY lsk
    ORDER BY numwait DESC, l_suppkey
    LIMIT 20
"""

ORACLES["orc_roundtrip"] = """
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_sum_fp,
           CAST(sum(l_orderkey) AS BIGINT) AS key_sum
    FROM lineitem GROUP BY l_returnflag
"""

ORACLES["benford_audit"] = """
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                                     AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS digit
        FROM orders
    )
    SELECT digit, count(*) AS n,
           CAST(round(1e9 * ((ln(digit + 1.0)
                              - ln(CAST(digit AS DOUBLE)))
                             / ln(10.0))) AS BIGINT) AS benford_fp
    FROM d GROUP BY digit
"""

ORACLES["grouping_sets_agg"] = """
    SELECT COALESCE(l_returnflag, '') AS rf,
           COALESCE(l_linestatus, '') AS ls,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS sum_qty_fp,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""

ORACLES["churned_customers"] = """
    WITH pairs AS (
        SELECT DISTINCT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                    AS BIGINT) AS mnum
        FROM orders
    ),
    mx AS (SELECT max(mnum) AS m FROM pairs)
    SELECT lpad(CAST(mnum // 12 AS VARCHAR), 4, '0') || '-'
               || lpad(CAST(mnum % 12 + 1 AS VARCHAR), 2, '0') AS month,
           count(*) AS n_churned
    FROM pairs p, mx
    WHERE p.mnum < mx.m
      AND NOT EXISTS (
          SELECT 1 FROM pairs q
          WHERE q.o_custkey = p.o_custkey AND q.mnum = p.mnum + 1)
    GROUP BY month
"""

ORACLES["late_events"] = """
    WITH a AS (
        SELECT user_id, event_id, ts,
               md5(CAST(event_id AS VARCHAR)) AS h
        FROM events
    ),
    x AS (
        SELECT user_id, ts,
               max(ts) OVER (PARTITION BY user_id ORDER BY h, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS mx
        FROM a
    )
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN ts < mx THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late
    FROM x GROUP BY user_id
"""

ORACLES["inverted_index"] = """
    WITH tok AS (
        SELECT doc_id, u.tok AS term
        FROM documents, unnest(string_split(text, ' ')) AS u(tok)
    ),
    td AS (
        SELECT term, doc_id, count(*) AS tf
        FROM tok GROUP BY term, doc_id
    ),
    r AS (
        SELECT term, doc_id, tf, row_number() OVER (
            PARTITION BY term ORDER BY doc_id) AS rn
        FROM td
    )
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
           string_agg(CASE WHEN rn <= 10
                           THEN CAST(doc_id AS VARCHAR) END,
                      ',' ORDER BY doc_id) AS postings
    FROM r GROUP BY term
"""

ORACLES["event_cooccurrence"] = """
    SELECT a.event_type AS first_type, b.event_type AS second_type,
           count(*) AS n
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY first_type, second_type
"""

ORACLES["compact_store"] = """
    SELECT count(*) AS n_rows,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           true AS compacted
    FROM documents
"""

ORACLES["theil_index"] = """
    WITH pc AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders GROUP BY o_custkey
    ),
    t AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s FROM pc)
    SELECT n AS n_customers,
           CAST(sum(CAST(round(1e9 * (((x * n) / s)
                                      * (ln(x) + ln(n) - ln(s))))
                         AS BIGINT)) AS BIGINT) AS theil_sum_fp
    FROM pc, t GROUP BY n
"""

ORACLES["weighted_join_sample"] = """
    WITH j AS (
        SELECT l_orderkey, l_linenumber, p_type, l_extendedprice,
               md5(CAST(l_orderkey AS VARCHAR) || ':'
                   || CAST(l_linenumber AS VARCHAR)) AS h
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    u AS (
        SELECT l_orderkey, l_linenumber, p_type, l_extendedprice,
               ((SELECT sum((strpos('0123456789abcdef',
                                    substr(h, i, 1)) - 1)
                            * 16 ** (8 - i))
                 FROM range(1, 9) t(i)) + 1) / 4294967296.0 AS uu
        FROM j
    )
    SELECT l_orderkey, l_linenumber, p_type,
           CAST(round(1e9 * (ln(uu) / l_extendedprice)) AS BIGINT)
               AS key_fp
    FROM u
    ORDER BY ln(uu) / l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
"""

ORACLES["label_reachability"] = """
    WITH e AS (
        SELECT o_custkey AS src,
               o_orderkey % (SELECT count(*) FROM customer) AS dst,
               o_orderkey % 3 AS lbl
        FROM orders
    ),
    f0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS q,
                  CAST(0 AS BIGINT) AS d),
    v0 AS (SELECT * FROM f0),
    n1 AS (
        SELECT DISTINCT e.dst AS node, CAST(1 AS BIGINT) AS q,
               CAST(1 AS BIGINT) AS d
        FROM f0 f JOIN e ON e.src = f.node
        WHERE (f.q = 0 AND e.lbl = 0) OR (f.q = 1 AND e.lbl = 1)
    ),
    f1 AS (SELECT * FROM n1 WHERE NOT EXISTS (
               SELECT 1 FROM v0 v
               WHERE v.node = n1.node AND v.q = n1.q)),
    v1 AS (SELECT * FROM v0 UNION ALL SELECT * FROM f1),
    n2 AS (
        SELECT DISTINCT e.dst AS node, CAST(1 AS BIGINT) AS q,
               CAST(2 AS BIGINT) AS d
        FROM f1 f JOIN e ON e.src = f.node
        WHERE (f.q = 0 AND e.lbl = 0) OR (f.q = 1 AND e.lbl = 1)
    ),
    f2 AS (SELECT * FROM n2 WHERE NOT EXISTS (
               SELECT 1 FROM v1 v
               WHERE v.node = n2.node AND v.q = n2.q)),
    v2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM f2),
    n3 AS (
        SELECT DISTINCT e.dst AS node, CAST(1 AS BIGINT) AS q,
               CAST(3 AS BIGINT) AS d
        FROM f2 f JOIN e ON e.src = f.node
        WHERE (f.q = 0 AND e.lbl = 0) OR (f.q = 1 AND e.lbl = 1)
    ),
    f3 AS (SELECT * FROM n3 WHERE NOT EXISTS (
               SELECT 1 FROM v2 v
               WHERE v.node = n3.node AND v.q = n3.q)),
    v3 AS (SELECT * FROM v2 UNION ALL SELECT * FROM f3)
    SELECT node, d AS dist FROM v3 WHERE q = 1
"""

ORACLES["k_anonymity"] = """
    WITH q AS (
        SELECT c_nationkey, c_mktsegment,
               (CAST(round(c_acctbal * 100) AS BIGINT) + 100000)
                   // 100000 AS bal_band
        FROM customer
    ),
    g AS (
        SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS n
        FROM q GROUP BY c_nationkey, c_mktsegment, bal_band
    )
    SELECT count(*) AS n_groups,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_risky_groups,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
               AS n_risky_rows,
           CAST(min(n) AS BIGINT) AS min_group
    FROM g
"""

ORACLES["weekly_revenue"] = """
    SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
           CAST(week(o_orderdate) AS BIGINT) AS iso_week,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_fp,
           count(*) AS n_orders
    FROM orders GROUP BY iso_year, iso_week
"""

ORACLES["psi_drift"] = """
    WITH b AS (
        SELECT CAST(round(value * 100) AS BIGINT) // 2000 AS bucket,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
                   AS in1
        FROM events
    ),
    cnt AS (
        SELECT bucket,
               CAST(sum(in1) AS BIGINT) AS c1,
               CAST(sum(1 - in1) AS BIGINT) AS c2
        FROM b GROUP BY bucket
    ),
    tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t1,
                   CAST(sum(c2) AS BIGINT) AS t2,
                   count(*) AS nb
            FROM cnt)
    SELECT bucket, c1, c2,
           CAST(round(1e9 * ((((c1 + 1.0) / (t1 + CAST(nb AS DOUBLE)))
                              - ((c2 + 1.0) / (t2 + CAST(nb AS DOUBLE))))
                             * ln(((c1 + 1.0) / (t1 + CAST(nb AS DOUBLE)))
                                  / ((c2 + 1.0)
                                     / (t2 + CAST(nb AS DOUBLE))))))
                AS BIGINT) AS psi_term_fp
    FROM cnt, tot
"""

ORACLES["ab_test_welch"] = """
    WITH a AS (
        SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT arm, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS s2
        FROM a GROUP BY arm
    ),
    w AS (
        SELECT
            max(CASE WHEN arm = 'A' THEN n END) AS na,
            max(CASE WHEN arm = 'A' THEN s END) AS sa,
            max(CASE WHEN arm = 'A' THEN s2 END) AS s2a,
            max(CASE WHEN arm = 'B' THEN n END) AS nb,
            max(CASE WHEN arm = 'B' THEN s END) AS sb,
            max(CASE WHEN arm = 'B' THEN s2 END) AS s2b
        FROM m
    ),
    c AS (
        SELECT na, nb,
               (sa * 1.0) / na - (sb * 1.0) / nb AS diff,
               sqrt(((s2a * 1.0 - (sa * 1.0) * (sa * 1.0) / na)
                     / (na - 1)) / na
                    + ((s2b * 1.0 - (sb * 1.0) * (sb * 1.0) / nb)
                       / (nb - 1)) / nb) AS se
        FROM w
    )
    SELECT na AS n_a, nb AS n_b,
           CAST(round(1e6 * diff) AS BIGINT) AS diff_fp,
           CAST(round(1e6 * (diff - 1.96 * se)) AS BIGINT) AS ci_lo_fp,
           CAST(round(1e6 * (diff + 1.96 * se)) AS BIGINT) AS ci_hi_fp
    FROM c
"""

ORACLES["frequent_itemsets"] = """
    WITH ot AS (
        SELECT DISTINCT l_orderkey, p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT a.p_type AS item_a, b.p_type AS item_b,
           count(*) AS support
    FROM ot a JOIN ot b
      ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
    GROUP BY item_a, item_b
    HAVING count(*) >= 10
"""

ORACLES["db_file_export"] = """
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_fp
    FROM orders GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""

ORACLES["graph_sssp"] = """
    WITH e AS (
        SELECT CAST(o_custkey AS BIGINT) AS src,
               CAST(o_orderkey % (SELECT count(*) FROM customer)
                    AS BIGINT) AS dst,
               CAST((o_orderkey // (SELECT count(*) FROM customer))
                    % 9 + 1 AS BIGINT) AS w
        FROM orders
    ),
    d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
    c1 AS (SELECT e.dst AS node, min(d.dist + e.w) AS dist
           FROM d0 d JOIN e ON e.src = d.node GROUP BY e.dst),
    d1 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM
           (SELECT * FROM d0 UNION ALL SELECT * FROM c1) GROUP BY node),
    c2 AS (SELECT e.dst AS node, min(d.dist + e.w) AS dist
           FROM d1 d JOIN e ON e.src = d.node GROUP BY e.dst),
    d2 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM
           (SELECT * FROM d1 UNION ALL SELECT * FROM c2) GROUP BY node),
    c3 AS (SELECT e.dst AS node, min(d.dist + e.w) AS dist
           FROM d2 d JOIN e ON e.src = d.node GROUP BY e.dst),
    d3 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM
           (SELECT * FROM d2 UNION ALL SELECT * FROM c3) GROUP BY node),
    c4 AS (SELECT e.dst AS node, min(d.dist + e.w) AS dist
           FROM d3 d JOIN e ON e.src = d.node GROUP BY e.dst),
    d4 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM
           (SELECT * FROM d3 UNION ALL SELECT * FROM c4) GROUP BY node)
    SELECT node, dist FROM d4
"""

ORACLES["did_estimate"] = """
    WITH a AS (
        SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm,
               CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 2 ELSE 1
                    END AS period,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT arm, period, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS s
        FROM a GROUP BY arm, period
    ),
    w AS (
        SELECT
            max(CASE WHEN arm='A' AND period=1 THEN n END) AS na1,
            max(CASE WHEN arm='A' AND period=1 THEN s END) AS sa1,
            max(CASE WHEN arm='A' AND period=2 THEN n END) AS na2,
            max(CASE WHEN arm='A' AND period=2 THEN s END) AS sa2,
            max(CASE WHEN arm='B' AND period=1 THEN n END) AS nb1,
            max(CASE WHEN arm='B' AND period=1 THEN s END) AS sb1,
            max(CASE WHEN arm='B' AND period=2 THEN n END) AS nb2,
            max(CASE WHEN arm='B' AND period=2 THEN s END) AS sb2
        FROM m
    )
    SELECT na1 AS n_a1, na2 AS n_a2, nb1 AS n_b1, nb2 AS n_b2,
           CAST(round(1e6 * (((sa2 * 1.0) / na2 - (sa1 * 1.0) / na1)
                             - ((sb2 * 1.0) / nb2
                                - (sb1 * 1.0) / nb1)))
                AS BIGINT) AS did_fp
    FROM w
"""

ORACLES["q2_min_cost_supplier"] = """
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey
        FROM lineitem
    ),
    r AS (
        SELECT n_nationkey FROM nation JOIN region
          ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ),
    c AS (
        SELECT l_partkey, l_suppkey,
               (l_partkey * 31 + l_suppkey * 17) % 10000 + 1 AS cost
        FROM ps JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey IN (SELECT n_nationkey FROM r)
    ),
    k AS (
        SELECT l_partkey,
               min(cost * 4294967296 + l_suppkey) AS packed
        FROM c GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           CAST(packed % 4294967296 AS BIGINT) AS best_suppkey,
           CAST(packed // 4294967296 AS BIGINT) AS min_cost
    FROM k
"""

ORACLES["q1_pricing_summary"] = """
    WITH f AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity * 100.0) AS BIGINT) AS q_fp,
               CAST(round(l_extendedprice * 100.0) AS BIGINT) AS p_fp,
               CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                    AS BIGINT) AS dp_fp,
               CAST(round(l_extendedprice * (1.0 - l_discount)
                          * (1.0 + l_tax) * 100.0) AS BIGINT) AS ch_fp,
               CAST(round(l_discount * 10000.0) AS BIGINT) AS d_fp
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    ),
    g AS (
        SELECT l_returnflag, l_linestatus,
               CAST(sum(q_fp) AS BIGINT) AS sum_qty_fp,
               CAST(sum(p_fp) AS BIGINT) AS sum_base_fp,
               CAST(sum(dp_fp) AS BIGINT) AS sum_disc_price_fp,
               CAST(sum(ch_fp) AS BIGINT) AS sum_charge_fp,
               CAST(sum(d_fp) AS BIGINT) AS sum_disc_fp,
               count(*) AS count_order
        FROM f GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, sum_qty_fp, sum_base_fp,
           sum_disc_price_fp, sum_charge_fp,
           CAST(round(1e4 * (CAST(sum_qty_fp AS DOUBLE)
                             / (100.0 * count_order)))
                AS BIGINT) AS avg_qty_fp,
           CAST(round(1e4 * (CAST(sum_base_fp AS DOUBLE)
                             / (100.0 * count_order)))
                AS BIGINT) AS avg_price_fp,
           CAST(round(1e4 * (CAST(sum_disc_fp AS DOUBLE)
                             / (10000.0 * count_order)))
                AS BIGINT) AS avg_disc_fp,
           count_order
    FROM g
"""

ORACLES["q4_order_priority"] = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
"""

ORACLES["q11_important_parts"] = """
    WITH v AS (
        SELECT l_partkey AS partkey,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                                   * 100.0) AS BIGINT))
                    AS BIGINT) AS value_fp
        FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT CAST(sum(value_fp) AS HUGEINT) AS total,
                 count(*) AS np FROM v)
    SELECT partkey, value_fp FROM v, t
    WHERE value_fp * (np * 3) > total * 4
"""

ORACLES["q12_priority_by_returnflag"] = """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l_returnflag
"""

ORACLES["q20_excess_suppliers"] = """
    WITH tp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    v AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT))
                    AS BIGINT) AS qty_fp
        FROM lineitem JOIN tp ON l_partkey = p_partkey
        GROUP BY l_suppkey
    ),
    s AS (
        SELECT l_suppkey, s_name, qty_fp
        FROM v JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey < 13
    ),
    t AS (SELECT CAST(sum(qty_fp) AS HUGEINT) AS total,
                 count(*) AS ns FROM s)
    SELECT l_suppkey AS s_suppkey, s_name, qty_fp
    FROM s, t
    WHERE qty_fp * ns > total
"""

ORACLES["embedding_covariance"] = """
    WITH e AS (
        SELECT vec_id, i,
               CAST(round(x * 1e4) AS BIGINT) AS q
        FROM (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
    ),
    p AS (
        SELECT a.i AS i, b.i AS j,
               CAST(sum(a.q * b.q) AS BIGINT) AS s_ij
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
        GROUP BY a.i, b.i
    ),
    s AS (SELECT i, CAST(sum(q) AS BIGINT) AS s_i FROM e GROUP BY i),
    n AS (SELECT count(*) AS n FROM embeddings)
    SELECT p.i, p.j,
           CAST(n.n * p.s_ij - sa.s_i * sb.s_i AS BIGINT) AS cov_n2_fp
    FROM p
    JOIN s sa ON sa.i = p.i
    JOIN s sb ON sb.i = p.j, n
"""

ORACLES["weighted_median"] = """
    WITH w AS (
        SELECT l_returnflag,
               CAST(round(l_quantity * 100.0) AS BIGINT) AS v,
               CAST(round(l_extendedprice * 100.0) AS BIGINT) AS wt
        FROM lineitem
    ),
    g AS (
        SELECT l_returnflag, v, CAST(sum(wt) AS BIGINT) AS wv
        FROM w GROUP BY l_returnflag, v
    ),
    c AS (
        SELECT l_returnflag, v, wv,
               sum(wv) OVER (PARTITION BY l_returnflag ORDER BY v)
                   AS cw,
               sum(wv) OVER (PARTITION BY l_returnflag) AS tw
        FROM g
    )
    SELECT l_returnflag, CAST(min(v) AS BIGINT) AS wmedian_fp
    FROM c WHERE 2 * cw >= tw
    GROUP BY l_returnflag
"""

ORACLES["store_time_travel"] = """
    SELECT g.e AS as_of_epoch, count(*) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders, (SELECT unnest([0, 1, 2]) AS e) g
    WHERE o_orderkey % 3 <= g.e
    GROUP BY g.e
"""

ORACLES["cumulative_users"] = """
    WITH f AS (
        SELECT user_id,
               min(date_diff('day', DATE '1970-01-01',
                             CAST(ts AS DATE))) AS day
        FROM events GROUP BY user_id
    ),
    c AS (SELECT day, count(*) AS n FROM f GROUP BY day)
    SELECT day, CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM c
"""

ORACLES["max_concurrency"] = """
    WITH iv AS (
        SELECT epoch_ns(ts) AS s,
               epoch_ns(ts) + 1800000000000 AS e
        FROM events
    ),
    b AS (
        SELECT s // 86400000000000 AS day, s AS t, 1 AS d FROM iv
        UNION ALL
        SELECT s // 86400000000000 AS day,
               least(e, (s // 86400000000000 + 1) * 86400000000000)
                   AS t, -1 AS d
        FROM iv
        UNION ALL
        SELECT e // 86400000000000 AS day,
               (e // 86400000000000) * 86400000000000 AS t, 1 AS d
        FROM iv
        WHERE e // 86400000000000 > s // 86400000000000
          AND e > (e // 86400000000000) * 86400000000000
        UNION ALL
        SELECT e // 86400000000000 AS day, e AS t, -1 AS d
        FROM iv
        WHERE e // 86400000000000 > s // 86400000000000
          AND e > (e // 86400000000000) * 86400000000000
    ),
    r AS (
        SELECT day,
               sum(d) OVER (PARTITION BY day ORDER BY t, d DESC
                            ROWS UNBOUNDED PRECEDING) AS run
        FROM b
    )
    SELECT day, CAST(max(run) AS BIGINT) AS peak FROM r GROUP BY day
"""

ORACLES["session_paths"] = """
    WITH brk AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS b
        FROM events
    ),
    s AS (
        SELECT user_id, ts, event_id, event_type,
               sum(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
        FROM brk
    ),
    o AS (
        SELECT user_id, sess, event_type,
               row_number() OVER (PARTITION BY user_id, sess
                                  ORDER BY ts, event_id) AS rn
        FROM s
    ),
    tri AS (
        SELECT a.event_type AS t1, b.event_type AS t2,
               c.event_type AS t3, count(*) AS n
        FROM o a
        JOIN o b ON a.user_id = b.user_id AND a.sess = b.sess
               AND b.rn = a.rn + 1
        JOIN o c ON a.user_id = c.user_id AND a.sess = c.sess
               AND c.rn = a.rn + 2
        GROUP BY t1, t2, t3
    )
    SELECT t1, t2, t3, CAST(n AS BIGINT) AS n
    FROM tri ORDER BY n DESC, t1, t2, t3 LIMIT 20
"""

ORACLES["cdc_merge_delete"] = """
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 7 = 0
                      THEN 100000 ELSE 0 END AS price_fp
    FROM orders
    WHERE o_orderkey % 11 <> 0
"""

ORACLES["balanced_downsample"] = """
    WITH c AS (SELECT label, count(*) AS n FROM embeddings
               GROUP BY label),
    k AS (SELECT min(n) AS k FROM c),
    h AS (SELECT label, vec_id,
                 md5(CAST(vec_id AS VARCHAR)) AS h
          FROM embeddings),
    r AS (SELECT label, vec_id,
                 row_number() OVER (PARTITION BY label
                                    ORDER BY h, vec_id) AS rn
          FROM h)
    SELECT label, vec_id FROM r, k WHERE rn <= k.k
"""

ORACLES["target_encode_loo"] = """
    WITH c AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders
    ),
    g AS (
        SELECT o_orderpriority, CAST(sum(cents) AS BIGINT) AS s,
               count(*) AS n
        FROM c GROUP BY o_orderpriority
    )
    SELECT o_orderkey,
           CAST(round(1e6 * (CAST(s - cents AS DOUBLE)
                             / CAST(n - 1 AS DOUBLE)))
                AS BIGINT) AS loo_enc_fp
    FROM c JOIN g USING (o_orderpriority)
"""

ORACLES["collapse_runs"] = """
    WITH l AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN prev IS NULL OR event_type <> prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
    FROM l GROUP BY user_id
"""

ORACLES["info_gain"] = """
    WITH cont AS (
        SELECT o_orderpriority AS x, o_orderstatus AS y,
               count(*) AS c
        FROM orders GROUP BY x, y
    ),
    sxy AS (SELECT CAST(sum(CAST(round(c * ln(c) * 1e9) AS BIGINT))
                        AS BIGINT) AS s FROM cont),
    mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS c FROM cont GROUP BY x),
    sx AS (SELECT CAST(sum(CAST(round(c * ln(c) * 1e9) AS BIGINT))
                       AS BIGINT) AS s FROM mx),
    my AS (SELECT y, CAST(sum(c) AS BIGINT) AS c FROM cont GROUP BY y),
    sy AS (SELECT CAST(sum(CAST(round(c * ln(c) * 1e9) AS BIGINT))
                       AS BIGINT) AS s FROM my),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cont)
    SELECT n,
           CAST(round(1e6 * (ln(n) + ((CAST(sxy.s - sx.s - sy.s
                                            AS DOUBLE) / 1e9) / n)))
                AS BIGINT) AS ig_fp
    FROM nn, sxy, sx, sy
"""

ORACLES["label_centroids"] = """
    WITH e AS (
        SELECT label, i, CAST(round(x * 1e4) AS BIGINT) AS q
        FROM (SELECT label, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
    ),
    g AS (
        SELECT label, i AS dim, CAST(sum(q) AS BIGINT) AS s_fp,
               count(*) AS n
        FROM e GROUP BY label, i
    )
    SELECT label, dim, s_fp, n,
           CAST(round(1e6 * (CAST(s_fp AS DOUBLE) / (1e4 * n)))
                AS BIGINT) AS mean_fp
    FROM g
"""

ORACLES["resume_export"] = """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           count(*) AS n
    FROM orders GROUP BY month
"""

ORACLES["degree_assortativity"] = """
    WITH e AS (
        SELECT o_custkey AS src,
               (o_orderkey * o_orderkey)
                   % (SELECT count(*) FROM customer) AS dst
        FROM orders
    ),
    od AS (SELECT src, count(*) AS x FROM e GROUP BY src),
    idg AS (SELECT dst, count(*) AS y FROM e GROUP BY dst),
    j AS (SELECT x, y FROM e JOIN od USING (src)
          JOIN idg USING (dst)),
    m AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM j
    )
    SELECT n,
           CAST(round(1e6 * (((n * 1.0) * sxy - (sx * 1.0) * sy)
                / (sqrt((n * 1.0) * sxx - (sx * 1.0) * sx)
                   * sqrt((n * 1.0) * syy - (sy * 1.0) * sy))))
                AS BIGINT) AS assort_fp
    FROM m
"""

ORACLES["time_split_embargo"] = """
    WITH t AS (
        SELECT CASE WHEN ts < TIMESTAMP '2024-01-11' THEN 'train'
                    WHEN ts >= TIMESTAMP '2024-01-16' THEN 'test'
                    ELSE '' END AS split,
               user_id,
               epoch_ns(ts) // 86400000000000 AS day
        FROM events
    )
    SELECT split, count(*) AS n_rows,
           CAST(min(day) AS BIGINT) AS min_day,
           CAST(max(day) AS BIGINT) AS max_day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM t WHERE split <> '' GROUP BY split
"""

ORACLES["pareto_8020"] = """
    WITH v AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT cents,
               sum(cents) OVER (ORDER BY cents DESC, o_custkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
               row_number() OVER (ORDER BY cents DESC, o_custkey)
                   AS rn
        FROM v
    ),
    t AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
                 count(*) AS n_customers FROM v),
    k AS (SELECT min(rn) AS k_top FROM r, t
          WHERE 5 * cum >= 4 * total)
    SELECT n_customers, k_top, total AS total_cents,
           (SELECT CAST(cum AS BIGINT) FROM r, k
            WHERE rn = k.k_top) AS top_cents
    FROM t, k
"""

ORACLES["clustering_coefficient"] = """
    WITH e0 AS (
        SELECT o_custkey AS s,
               o_orderkey % (SELECT count(*) FROM customer) AS d
        FROM orders
    ),
    e1 AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
           FROM e0 WHERE s <> d),
    adj AS (SELECT u AS c, v AS nb FROM e1
            UNION ALL SELECT v, u FROM e1),
    deg AS (SELECT c, count(*) AS deg FROM adj GROUP BY c),
    w AS (SELECT x.c, x.nb AS a, y.nb AS b
          FROM adj x JOIN adj y ON x.c = y.c AND x.nb < y.nb),
    t AS (SELECT w.c, count(*) AS n_tri
          FROM w JOIN e1 ON w.a = e1.u AND w.b = e1.v
          GROUP BY w.c)
    SELECT deg.c AS node, deg.deg,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
           CAST(round(1e6 * ((2.0 * coalesce(t.n_tri, 0))
                             / (deg.deg * (deg.deg - 1))))
                AS BIGINT) AS coef_fp
    FROM deg LEFT JOIN t ON deg.c = t.c
    WHERE deg.deg >= 2
"""

ORACLES["sampled_estimate"] = """
    WITH s AS (
        SELECT count(*) AS n_total,
               CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, 1)
                             IN ('0', '1', '2', '3')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, 1)
                             IN ('0', '1', '2', '3')
                              AND n_chars >= 300
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_long_sampled
        FROM documents
    ),
    w AS (
        SELECT n_total, n_sampled, n_long_sampled,
               CAST(n_long_sampled AS DOUBLE) / n_sampled AS p,
               1.0 + (1.96 * 1.96) / n_sampled AS den
        FROM s
    ),
    h AS (
        SELECT *,
               (p + (1.96 * 1.96) / (2.0 * n_sampled)) / den AS center,
               (1.96 * sqrt((p * (1.0 - p)) / n_sampled
                            + (1.96 * 1.96)
                              / (4.0 * ((n_sampled * 1.0)
                                        * n_sampled)))) / den AS half
        FROM w
    )
    SELECT n_total, n_sampled, n_long_sampled,
           CAST(round(p * n_total) AS BIGINT) AS est_long_total,
           CAST(round(1e6 * (center - half)) AS BIGINT) AS ci_lo_fp,
           CAST(round(1e6 * (center + half)) AS BIGINT) AS ci_hi_fp
    FROM h
"""

ORACLES["containment_join"] = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text),
                                              '[^a-z0-9_]+'),
                           t -> t <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
        FROM toks, UNNEST(range(1, len(w) - 1)) AS u(i)
        WHERE len(w) >= 3
    ),
    szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id <> y.doc_id
        GROUP BY x.doc_id, y.doc_id
    )
    SELECT a, b, inter,
           CAST((inter * 1000000) // sa.sz AS BIGINT)
               AS containment_fp
    FROM pairs JOIN szs sa ON a = sa.doc_id
    WHERE inter * 100 >= 80 * sa.sz
"""

ORACLES["cascade_delete"] = """
    WITH gone AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0.0),
    so AS (SELECT o_orderkey FROM orders
           WHERE o_custkey NOT IN (SELECT c_custkey FROM gone))
    SELECT (SELECT count(*) FROM gone) AS n_customers_deleted,
           (SELECT count(*) FROM so) AS n_orders_surviving,
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM so))
               AS n_lineitems_surviving
"""

ORACLES["rollup_consistency"] = """
    WITH c AS (
        SELECT epoch_ns(o_orderdate) // 86400000000000 AS day,
               strftime(date_trunc('month', o_orderdate), '%Y-%m')
                   AS month,
               strftime(o_orderdate, '%Y') AS year,
               CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders
    ),
    g AS (
        SELECT 'day' AS granularity, count(DISTINCT day) AS n_groups,
               count(*) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS total_cents FROM c
        UNION ALL
        SELECT 'month', count(DISTINCT month), count(*),
               CAST(sum(cents) AS BIGINT) FROM c
        UNION ALL
        SELECT 'year', count(DISTINCT year), count(*),
               CAST(sum(cents) AS BIGINT) FROM c
    )
    SELECT granularity, n_groups, n_orders, total_cents FROM g
"""

ORACLES["weekday_profile"] = """
    WITH c AS (
        SELECT isodow(o_orderdate) AS weekday,
               CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders
    ),
    g AS (
        SELECT weekday, CAST(sum(cents) AS BIGINT) AS revenue_fp,
               count(*) AS n_orders
        FROM c GROUP BY weekday
    )
    SELECT weekday, revenue_fp, n_orders,
           CAST(round(1e4 * (CAST(revenue_fp AS DOUBLE)
                             / CAST(n_orders AS DOUBLE)))
                AS BIGINT) AS avg_cents_fp
    FROM g
"""

ORACLES["corpus_card"] = """
    WITH d AS (
        SELECT lang, source,
               len(string_split_regex(text, '\\s+')) AS n_tokens,
               len(text) AS n_chars
        FROM documents
    ),
    l AS (SELECT lang, count(*) AS c FROM d GROUP BY lang),
    s AS (SELECT CAST(sum(CAST(round(c * ln(c) * 1e9) AS BIGINT))
                      AS BIGINT) AS s FROM l),
    t AS (SELECT count(*) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(sum(n_chars) AS BIGINT) AS total_chars FROM d),
    ls AS (SELECT count(*) AS n_languages FROM l),
    sc AS (SELECT count(DISTINCT source) AS n_sources FROM d)
    SELECT n_docs, n_languages, n_sources, total_tokens, total_chars,
           CAST(round(1e6 * (ln(n_docs)
                             - ((CAST(s.s AS DOUBLE) / 1e9)
                                / n_docs))) AS BIGINT)
               AS lang_entropy_fp
    FROM t, ls, sc, s
"""

ORACLES["median_of_means"] = """
    WITH c AS (
        SELECT CAST(strpos('0123456789abcdef',
                           substr(md5(CAST(l_orderkey AS VARCHAR)),
                                  1, 1)) - 1 AS BIGINT) % 16 AS bucket,
               CAST(round(l_extendedprice * 100.0) AS BIGINT) AS cents
        FROM lineitem
    ),
    g AS (
        SELECT bucket, CAST(sum(cents) AS BIGINT) AS s,
               count(*) AS n
        FROM c GROUP BY bucket
    ),
    m AS (
        SELECT CAST(round(1e4 * (CAST(s AS DOUBLE)
                                 / (100.0 * n))) AS BIGINT) AS mean_fp
        FROM g
    ),
    r AS (
        SELECT mean_fp,
               row_number() OVER (ORDER BY mean_fp) AS rn,
               count(*) OVER () AS k
        FROM m
    )
    SELECT (SELECT CAST(max(k) AS BIGINT) FROM r) AS n_buckets,
           (SELECT mean_fp FROM r WHERE rn = (k - 1) // 2 + 1)
               AS mom_fp,
           (SELECT min(mean_fp) FROM r) AS min_bucket_mean_fp,
           (SELECT max(mean_fp) FROM r) AS max_bucket_mean_fp
"""

ORACLES["fd_discovery"] = """
    WITH cand AS (
        SELECT 'part' AS table_name, 'p_partkey' AS lhs,
               'p_brand' AS rhs,
               (SELECT count(DISTINCT p_partkey) FROM part)
                   AS n_distinct_lhs,
               (SELECT count(*) FROM (SELECT DISTINCT p_partkey,
                                             p_brand FROM part))
                   AS n_distinct_pair
        UNION ALL
        SELECT 'part', 'p_brand', 'p_type',
               (SELECT count(DISTINCT p_brand) FROM part),
               (SELECT count(*) FROM (SELECT DISTINCT p_brand, p_type
                                      FROM part))
        UNION ALL
        SELECT 'orders', 'o_custkey', 'o_orderpriority',
               (SELECT count(DISTINCT o_custkey) FROM orders),
               (SELECT count(*) FROM (SELECT DISTINCT o_custkey,
                                             o_orderpriority
                                      FROM orders))
        UNION ALL
        SELECT 'lineitem', 'l_orderkey', 'l_returnflag',
               (SELECT count(DISTINCT l_orderkey) FROM lineitem),
               (SELECT count(*) FROM (SELECT DISTINCT l_orderkey,
                                             l_returnflag
                                      FROM lineitem))
    )
    SELECT table_name, lhs, rhs,
           CAST(n_distinct_lhs AS BIGINT) AS n_distinct_lhs,
           CAST(n_distinct_pair AS BIGINT) AS n_distinct_pair,
           n_distinct_lhs = n_distinct_pair AS fd_holds
    FROM cand
"""

ORACLES["hill_tail_index"] = """
    WITH c AS (
        SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders ORDER BY cents DESC LIMIT 201
    ),
    m AS (SELECT CAST(min(cents) AS BIGINT) AS xk1 FROM c),
    t AS (
        SELECT CAST(sum(CAST(round((ln(cents) - ln(xk1)) * 1e9)
                             AS BIGINT)) AS BIGINT) AS s
        FROM c, m WHERE cents > xk1 OR cents = xk1
    )
    SELECT 200 AS k, xk1 AS xk1_cents,
           CAST(round(1e6 * ((CAST(s AS DOUBLE) / 1e9) / 200))
                AS BIGINT) AS hill_fp
    FROM t, m
"""

ORACLES["ks_drift"] = """
    WITH pts AS (
        SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) // 100 AS v,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS a,
               CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS b
        FROM orders WHERE o_orderstatus IN ('F', 'O')
    ),
    g AS (SELECT v, sum(a) AS c1, sum(b) AS c2 FROM pts GROUP BY v),
    t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c2) AS BIGINT) AS n2 FROM g),
    c AS (SELECT sum(c1) OVER w AS cum1, sum(c2) OVER w AS cum2
          FROM g WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
    d AS (SELECT CAST(max(abs(t.n2 * c.cum1 - t.n1 * c.cum2)) AS BIGINT)
              AS d_num FROM c, t)
    SELECT t.n1, t.n2, d.d_num,
           CAST(round(1e9 * (CAST(d.d_num AS DOUBLE) / (t.n1 * t.n2)))
                AS BIGINT) AS ks_fp
    FROM t, d
"""

ORACLES["mann_whitney"] = """
    WITH pts AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS a,
               CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS b
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    g AS (SELECT v, sum(a) AS c1, sum(b) AS c2 FROM pts GROUP BY v),
    c AS (SELECT c1, c2, c1 + c2 AS cnt,
                 coalesce(sum(c1 + c2) OVER (
                     ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS cumb
          FROM g),
    t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c2) AS BIGINT) AS n2,
                 CAST(sum(c1 * (2 * cumb + cnt + 1)) AS BIGINT) AS r1x2
          FROM c)
    SELECT n1, n2,
           CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(2 * n1 * n2 - (r1x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2
    FROM t
"""

ORACLES["cusum_changepoint"] = """
    WITH d AS (
        SELECT epoch_ns(ts) // 86400000000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY day
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS s FROM d),
    c AS (SELECT day,
                 sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                     AS cum,
                 row_number() OVER (ORDER BY day) AS rn
          FROM d),
    e AS (SELECT day, abs(t.n * c.cum - c.rn * t.s) AS dev FROM c, t),
    b AS (SELECT day, dev FROM e ORDER BY dev DESC, day LIMIT 1)
    SELECT t.n AS n_days, t.s AS total_events,
           CAST(b.dev AS BIGINT) AS max_dev_abs, b.day AS cp_day
    FROM t, b
"""

ORACLES["lag1_autocorr"] = """
    WITH d AS (
        SELECT epoch_ns(ts) // 86400000000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY day
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS s FROM d),
    v AS (SELECT t.n * d.x - t.s AS dv,
                 lead(t.n * d.x - t.s) OVER (ORDER BY d.day) AS dnx
          FROM d, t),
    agg AS (SELECT CAST(sum(CASE WHEN dnx IS NULL THEN 0
                                 ELSE dv * dnx END) AS BIGINT) AS num,
                   CAST(sum(dv * dv) AS BIGINT) AS den
            FROM v)
    SELECT t.n AS n_days, agg.num, agg.den,
           CAST(round(1e9 * (CAST(agg.num AS DOUBLE) / agg.den))
                AS BIGINT) AS acf_fp
    FROM t, agg
"""

ORACLES["l_diversity"] = """
    SELECT o_orderpriority,
           CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS omonth,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_sensitive
    FROM orders GROUP BY 1, 2
"""

ORACLES["dq_violations"] = """
    SELECT 'bad_returnflag' AS rule,
           CAST(sum(CASE WHEN l_returnflag NOT IN ('R', 'N', 'A')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           CAST(count(*) AS BIGINT) AS n_checked
    FROM lineitem
    UNION ALL
    SELECT 'discount_gt_tax',
           CAST(sum(CASE WHEN l_discount > l_tax THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'price_below_1000x_qty',
           CAST(sum(CASE WHEN l_extendedprice < 1000.0 * l_quantity
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'qty_out_of_range',
           CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'ship_before_1996',
           CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1996-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
"""

ORACLES["zone_map_pruning"] = """
    WITH z AS (
        SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate)
                    AS BIGINT) AS yyyymm,
               l_orderkey
        FROM lineitem
    )
    SELECT yyyymm,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(l_orderkey) AS BIGINT) AS min_key,
           CAST(max(l_orderkey) AS BIGINT) AS max_key,
           yyyymm >= 199601 AND yyyymm <= 199612 AS would_scan
    FROM z GROUP BY yyyymm
"""

ORACLES["incremental_dedup"] = """
    WITH mx AS (
        SELECT CAST(max(doc_id) AS BIGINT) * 4 // 5 AS cutoff
        FROM documents
    ),
    store AS (
        SELECT DISTINCT md5(substr(text, 1, 16)) AS h
        FROM documents, mx WHERE doc_id < cutoff
    ),
    batch AS (
        SELECT md5(substr(text, 1, 16)) AS h,
               CAST(min(doc_id) AS BIGINT) AS doc_id
        FROM documents, mx WHERE doc_id >= cutoff GROUP BY 1
    )
    SELECT b.doc_id
    FROM batch b LEFT JOIN store s ON b.h = s.h
    WHERE s.h IS NULL
"""

ORACLES["apportion_quota"] = """
    WITH s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY source
    ),
    w AS (SELECT source, n, n * n AS wt FROM s),
    t AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM w),
    q AS (SELECT source, n, (1000 * wt) // t.tw AS q0,
                 1000 * wt - ((1000 * wt) // t.tw) * t.tw AS rem
          FROM w, t),
    l AS (SELECT CAST(1000 - sum(q0) AS BIGINT) AS leftover FROM q),
    r AS (SELECT source, n, q0,
                 row_number() OVER (ORDER BY rem DESC, source) AS rk
          FROM q)
    SELECT r.source, r.n AS n_docs,
           CAST(r.q0 + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM r, l
"""

ORACLES["edge_reciprocity"] = """
    WITH e AS (
        SELECT DISTINCT event_id % 151 AS src,
               (event_id * event_id) % 151 AS dst
        FROM events
        WHERE event_id % 151 <> (event_id * event_id) % 151
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM e),
    r AS (SELECT CAST(count(*) AS BIGINT) AS nr
          FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src)
    SELECT m.m_edges, r.nr AS n_reciprocated,
           CAST(round(1e6 * (CAST(r.nr AS DOUBLE) / m.m_edges))
                AS BIGINT) AS recip_fp
    FROM m, r
"""

ORACLES["stickiness_dau_mau"] = """
    WITH p AS (
        SELECT DISTINCT
               CAST(year(ts) * 100 + month(ts) AS BIGINT) AS mo,
               epoch_ns(ts) // 86400000000000 AS day, user_id
        FROM events
    ),
    a AS (SELECT mo, CAST(count(*) AS BIGINT) AS sdau
          FROM p GROUP BY mo),
    d AS (SELECT mo, CAST(count(DISTINCT day) AS BIGINT) AS ndays
          FROM p GROUP BY mo),
    u AS (SELECT mo, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
          FROM p GROUP BY mo)
    SELECT a.mo AS month, a.sdau, d.ndays, u.mau,
           CAST(round(1e6 * (CAST(a.sdau AS DOUBLE)
                             / (d.ndays * u.mau))) AS BIGINT)
               AS stickiness_fp
    FROM a JOIN d ON a.mo = d.mo JOIN u ON a.mo = u.mo
"""

ORACLES["anova_f"] = """
    WITH m AS (
        SELECT l_returnflag AS g,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sx,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sxx
        FROM lineitem GROUP BY 1
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS n,
                 CAST(sum(sx) AS BIGINT) AS s,
                 CAST(sum(sxx) AS BIGINT) AS q FROM m),
    b AS (SELECT CAST(sum(CAST(round(
                     1e6 * ((CAST(sx AS DOUBLE) * sx) / n))
                     AS BIGINT)) AS BIGINT) AS st FROM m),
    s2 AS (SELECT t.k, t.n,
                  b.st - CAST(round(1e6 * ((CAST(t.s AS DOUBLE) * t.s)
                                           / t.n)) AS BIGINT) AS ssb,
                  1000000 * t.q - b.st AS ssw
           FROM t, b)
    SELECT k AS k_groups, n AS n_total,
           CAST(ssb AS BIGINT) AS ssb_fp, CAST(ssw AS BIGINT) AS ssw_fp,
           CAST(round(1e6 * (CAST((n - k) * ssb AS DOUBLE)
                             / CAST((k - 1) * ssw AS DOUBLE)))
                AS BIGINT) AS f_fp
    FROM s2
"""

ORACLES["trending_terms"] = """
    WITH mx AS (SELECT CAST(max(doc_id) AS BIGINT) // 2 AS cutoff
                FROM documents),
    tok AS (
        SELECT CASE WHEN doc_id >= mx.cutoff THEN 1 ELSE 0 END AS lt,
               unnest(regexp_split_to_array(lower(text),
                                            '[^a-z0-9_]+')) AS term
        FROM documents, mx
    ),
    g AS (
        SELECT term,
               CAST(sum(1 - lt) AS BIGINT) AS c_early,
               CAST(sum(lt) AS BIGINT) AS c_late
        FROM tok WHERE term <> '' GROUP BY term
    )
    SELECT term, c_early, c_late,
           CAST(c_late - c_early AS BIGINT) AS delta
    FROM g ORDER BY delta DESC, term LIMIT 20
"""

ORACLES["dup_cluster_sizes"] = """
    WITH c AS (
        SELECT md5(substr(text, 1, 16)) AS h,
               CAST(count(*) AS BIGINT) AS sz
        FROM documents GROUP BY 1
    )
    SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
    FROM c GROUP BY sz
"""


# =============================================== round-3 seventh batch


def q_hhi_concentration(sf_dir):
    """Herfindahl–Hirschman revenue-concentration index across nations
    (the market-concentration gate a source-mixing pipeline runs before
    trusting a corpus split). Revenue is integer cents; orders pre-
    aggregate to one row per customer BEFORE the customer join (the
    exchange moves |customer| skinny rows, never |orders|), nation sums
    are ≤25 rows, and the final share-of-squares is EXACT Python-int
    arithmetic mirrored by HUGEINT in the oracle — Σsᵢ²·10¹² and the
    grand total² stay under 128 bits through ~sf1000. Division is
    positive-truncating on both sides (Python ``//`` vs HUGEINT ``/``)."""
    orders = T(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "ck": b["o_custkey"],
            "p": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    per_cust = fast_groupby_agg(
        orders.map_batches(_fp, batch_format="pyarrow"),
        ["ck"], {"s": ("p", "sum")})
    cust = T(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = per_cust.join(cust, "inner", num_partitions=JOIN_PARTS,
                      on=("ck",), right_on=("c_custkey",))
    nat = fast_groupby_agg(j, ["c_nationkey"], {"s": ("s", "sum")}).to_pandas()
    s = [int(v) for v in nat["s"]]
    tot = sum(s)
    ssq = sum(v * v for v in s)
    return pd.DataFrame([{
        "n_nations": np.int64(len(s)),
        "hhi_fp": np.int64(ssq * 10**12 // (tot * tot)),
    }])


# lcm(1..50): every rounded l_quantity divides it exactly, so per-value
# reciprocal mass c·(L/x) is an exact integer on both engines.
_HARMONIC_L = 3099044504245996706400  # 72 bits; HUGEINT literal in SQL


def q_grouped_harmonic(sf_dir):
    """Exact harmonic mean of l_quantity per return flag via the
    common-denominator trick: with L = lcm(1..50), Σ 1/x = Σ (L/x) / L
    is EXACT integer arithmetic — no float reciprocal sum (whose result
    would depend on association order). The distributed part is a
    (flag, value) value-count groupby (≤ 200 rows out, map-side
    combined); the ≤200-row table finishes on the driver in Python
    ints, mirrored by HUGEINT in the oracle. n·L·10⁶ < 2¹²⁷ through
    ~sf100."""
    li = T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _x(b: pa.Table) -> pa.Table:
        return pa.table({
            "f": b["l_returnflag"],
            "x": pa.array(_round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False)
            ).astype(np.int64), pa.int64()),
        })

    cells = fast_groupby_agg(
        li.map_batches(_x, batch_format="pyarrow"),
        ["f", "x"], {"c": (None, "count")}).to_pandas()
    rows = []
    for f, g in cells.groupby("f", sort=True):
        n = int(g["c"].sum())
        s = sum(int(c) * (_HARMONIC_L // int(x))
                for x, c in zip(g["x"], g["c"]))
        rows.append({"l_returnflag": f, "n": np.int64(n),
                     "harm_fp": np.int64(n * _HARMONIC_L * 10**6 // s)})
    return pd.DataFrame(rows)


def q_spearman_corr(sf_dir):
    """Global Spearman rank correlation of l_quantity vs l_discount —
    the monotone-association check (Pearson misses nonlinear ties;
    grouped_corr covers that side). Both columns have TINY domains
    (≤50 × ≤11 distinct values), so the whole fact table reduces to a
    map-side-combined (x, y) contingency table; average tie-ranks are
    held as EXACT integers via the 2·rank trick (2·cum_before+cnt+1),
    and all six rank moments are Python-int / HUGEINT exact (< 2¹²⁷
    through sf100). The only floats are the mirrored final expression:
    int→double casts (correctly rounded on BOTH engines — verified
    against DuckDB's HUGEINT cast at half-ulp tie points), IEEE sqrt
    and one division."""
    li = T(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def _xy(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pa.array(_round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False)
            ).astype(np.int64), pa.int64()),
            "y": pa.array(_round_half_away(
                b["l_discount"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    cells = fast_groupby_agg(
        li.map_batches(_xy, batch_format="pyarrow"),
        ["x", "y"], {"c": (None, "count")}).to_pandas()

    def _rank2(marg: dict[int, int]) -> dict[int, int]:
        out, cum = {}, 0
        for v in sorted(marg):
            out[v] = 2 * cum + marg[v] + 1
            cum += marg[v]
        return out

    mx = cells.groupby("x")["c"].sum().astype(int).to_dict()
    my = cells.groupby("y")["c"].sum().astype(int).to_dict()
    r2x, r2y = _rank2(mx), _rank2(my)
    n = sx = sy = sxx = syy = sxy = 0
    for x, y, c in zip(cells["x"], cells["y"], cells["c"]):
        c, rx, ry = int(c), r2x[int(x)], r2y[int(y)]
        n += c
        sx += c * rx
        sy += c * ry
        sxx += c * rx * rx
        syy += c * ry * ry
        sxy += c * rx * ry
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    rho = float(num) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
    return pd.DataFrame([{
        "n": np.int64(n),
        "rho_fp": np.int64(int(_round_half_away(
            np.array([rho * 1e9]))[0])),
    }])


def q_survival_km(sf_dir):
    """Kaplan–Meier survival curve for repeat purchase: per customer,
    days from the FIRST order to the SECOND; single-order customers
    are right-censored at the dataset's last order date — the textbook
    churn estimator with real censoring. The per-customer bottom-2
    order dates come from ONE splitmix64(custkey) % P shuffle and a
    vectorized per-partition walk (lexsort by (ck, t), np.unique group
    starts — P udf calls, not one per customer); a map-side-combined
    value-count over
    (duration_days, observed) then leaves a TIME-SPAN-sized table
    (≤ ~2400 rows at any sf) for the driver. Survival is the
    left-to-right float product Π (n_risk−d)/n_risk — every factor is
    a ≤2⁵³-exact int division and IEEE multiply, so the recurrence is
    bit-equal to the oracle's ordered RECURSIVE CTE (no libm
    anywhere)."""
    orders = T(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    from ..functions.sketches import _splitmix64

    P = 64

    def _us(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ck": b["o_custkey"],
            "part": pa.array(
                (_splitmix64(ck) % np.uint64(P)).astype(np.int64)),
            "t": b["o_orderdate"].cast(pa.int64())})

    tsd = orders.map_batches(_us, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Max

    gmax = int(tsd.aggregate(Max("t", alias_name="m"))["m"])

    def _bottom2(df: pd.DataFrame) -> pd.DataFrame:
        ck0 = df["ck"].to_numpy(np.int64)
        t0 = df["t"].to_numpy(np.int64)
        order = np.lexsort((t0, ck0))
        ck, t = ck0[order], t0[order]
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        counts = np.diff(np.r_[starts, len(ck)])
        multi = counts >= 2
        t1 = t[starts]
        second = np.where(multi, t[np.minimum(starts + 1, len(t) - 1)],
                          gmax)
        return pd.DataFrame({
            "dur": ((second - t1) // 86_400_000_000).astype(np.int64),
            "obs": multi.astype(np.int64),
        })

    per_cust = tsd.groupby("part").map_groups(
        _bottom2, batch_format="pandas")
    vc = fast_groupby_agg(
        per_cust, ["dur"],
        {"d": ("obs", "sum"), "tot": (None, "count")}).to_pandas()
    vc = vc.sort_values("dur", ascending=False).reset_index(drop=True)
    n_risk = vc["tot"].cumsum().astype(int)
    rows = []
    s = None
    for dur, d, nr in sorted(zip(vc["dur"].astype(int), vc["d"].astype(int),
                                 n_risk), key=lambda r: r[0]):
        if d == 0:
            continue
        # mirrored op order: (n_risk − d) * 1.0 / n_risk, seeded at 1.0
        factor = float(nr - d) * 1.0 / float(nr)
        s = factor if s is None else s * factor
        rows.append({"t_days": np.int64(dur), "n_risk": np.int64(nr),
                     "d_events": np.int64(d),
                     "surv_fp": np.int64(int(_round_half_away(
                         np.array([s * 1e9]))[0]))})
    return pd.DataFrame(rows)


@ray.remote
def _block_nrows_task(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _block_take_task(t: pa.Table, idxs: list[int]) -> list[int]:
    col = t["v"].to_numpy(zero_copy_only=False)
    return [int(col[i]) for i in idxs]


def q_equidepth_histogram(sf_dir):
    """Equi-depth (equal-frequency) 10-bucket histogram of order value —
    the statistics primitive equi-WIDTH histograms (q_histogram) can't
    replace on skewed data, and the building block for range-
    partitioning a fact column. o_totalprice is near-unique, so the
    value-counts CDF of q_quantiles would be corpus-sized; instead this
    is a distributed RANK-SELECT: sort the fp column (the one sanctioned
    all-to-all), read per-block row counts via skinny remote tasks
    (blocks stay in plasma — the driver holds ONE int per block), then
    fetch exactly the ≤10 boundary rows from the ≤10 blocks that
    contain them. Boundary ranks are ceil(j·n/10) with the float
    product mirrored in the oracle (j·n exact in double through 2⁵³)."""
    orders = T(sf_dir, "orders", ["o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({"v": pa.array(_round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64), pa.int64())})

    ds = orders.map_batches(_fp, batch_format="pyarrow") \
        .sort("v").materialize()
    refs = ds.to_arrow_refs()
    counts = ray.get([_block_nrows_task.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)])
    n = int(offsets[-1])
    ranks = [(j, int(math.ceil(j * n / 10.0))) for j in range(1, 11)]
    wanted: dict[int, list[tuple[int, int]]] = {}
    for j, rk in ranks:
        # rk is 1-based; row index rk-1 lives in block bi with
        # offsets[bi] <= rk-1 < offsets[bi+1]
        bi = int(np.searchsorted(offsets[1:], rk - 1, side="right"))
        wanted.setdefault(bi, []).append((j, rk - 1 - int(offsets[bi])))
    fetched = ray.get([
        _block_take_task.remote(refs[bi], [li for _, li in pairs])
        for bi, pairs in wanted.items()])
    out = {}
    for (bi, pairs), vals in zip(wanted.items(), fetched):
        for (j, _), v in zip(pairs, vals):
            out[j] = v
    return pd.DataFrame([{
        "bucket": np.int64(j), "cum_rank": np.int64(rk),
        "boundary": np.int64(out[j]),
    } for j, rk in ranks])


ORACLES["hhi_concentration"] = """
    WITH r AS (
        -- sum(BIGINT) is an exact HUGEINT in DuckDB; sum(HUGEINT)
        -- silently degrades to DOUBLE, hence the DECIMAL(38,0) sums
        -- at the next level
        SELECT c_nationkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    ),
    t AS (SELECT count(*) AS k,
                 CAST(sum(CAST(s AS DECIMAL(38, 0))) AS HUGEINT) AS tot,
                 CAST(sum(CAST(s * s AS DECIMAL(38, 0))) AS HUGEINT) AS ssq
          FROM r)
    SELECT CAST(k AS BIGINT) AS n_nations,
           CAST(ssq * 1000000000000 // (tot * tot) AS BIGINT) AS hhi_fp
    FROM t
"""

ORACLES["grouped_harmonic"] = """
    WITH m AS (
        SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS x
        FROM lineitem
    ),
    g AS (SELECT l_returnflag, x, count(*) AS c FROM m GROUP BY 1, 2),
    a AS (
        SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CAST(CAST(c AS HUGEINT)
                   * (CAST('3099044504245996706400' AS HUGEINT) // x)
                   AS DECIMAL(38, 0))) AS HUGEINT) AS s
        FROM g GROUP BY 1
    )
    SELECT l_returnflag, n,
           CAST(CAST(n AS HUGEINT)
                * CAST('3099044504245996706400' AS HUGEINT)
                * 1000000 // s AS BIGINT) AS harm_fp
    FROM a
"""

ORACLES["spearman_corr"] = """
    WITH m AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_discount * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    cells AS (SELECT x, y, count(*) AS c FROM m GROUP BY x, y),
    mgx AS (SELECT x, sum(c) AS cx FROM cells GROUP BY x),
    mgy AS (SELECT y, sum(c) AS cy FROM cells GROUP BY y),
    rx AS (
        SELECT x, 2 * CAST(COALESCE(sum(cx) OVER (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT)
                 + CAST(cx AS BIGINT) + 1 AS r2x
        FROM mgx
    ),
    ry AS (
        SELECT y, 2 * CAST(COALESCE(sum(cy) OVER (ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT)
                 + CAST(cy AS BIGINT) + 1 AS r2y
        FROM mgy
    ),
    s AS (
        -- DECIMAL(38,0) sums: sum(HUGEINT) degrades to DOUBLE in
        -- DuckDB, which is exact only below 2^53 and would silently
        -- drift at scale
        SELECT CAST(sum(c) AS HUGEINT) AS n,
               CAST(sum(CAST(CAST(c AS HUGEINT) * r2x
                    AS DECIMAL(38, 0))) AS HUGEINT) AS sx,
               CAST(sum(CAST(CAST(c AS HUGEINT) * r2y
                    AS DECIMAL(38, 0))) AS HUGEINT) AS sy,
               CAST(sum(CAST(CAST(c AS HUGEINT) * r2x * r2x
                    AS DECIMAL(38, 0))) AS HUGEINT) AS sxx,
               CAST(sum(CAST(CAST(c AS HUGEINT) * r2y * r2y
                    AS DECIMAL(38, 0))) AS HUGEINT) AS syy,
               CAST(sum(CAST(CAST(c AS HUGEINT) * r2x * r2y
                    AS DECIMAL(38, 0))) AS HUGEINT) AS sxy
        FROM cells JOIN rx USING (x) JOIN ry USING (y)
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
                / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                   * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                * 1000000000.0) AS BIGINT) AS rho_fp
    FROM s
"""

ORACLES["survival_km"] = """
    WITH RECURSIVE o2 AS (
        SELECT o_custkey, epoch_us(o_orderdate) AS t FROM orders
    ),
    g AS (SELECT max(t) AS gmax FROM o2),
    r AS (
        SELECT o_custkey, t,
               row_number() OVER (PARTITION BY o_custkey ORDER BY t) AS rn
        FROM o2
    ),
    u AS (
        SELECT o_custkey, min(t) AS mn, count(*) AS c,
               min(CASE WHEN rn = 2 THEN t END) AS m2
        FROM r GROUP BY o_custkey
    ),
    d AS (
        SELECT CASE WHEN c >= 2 THEN (m2 - mn) // 86400000000
                    ELSE ((SELECT gmax FROM g) - mn) // 86400000000
               END AS dur,
               CASE WHEN c >= 2 THEN 1 ELSE 0 END AS obs
        FROM u
    ),
    vc AS (
        SELECT dur, CAST(sum(obs) AS BIGINT) AS d_events,
               CAST(count(*) AS BIGINT) AS tot
        FROM d GROUP BY dur
    ),
    ev AS (
        SELECT dur, d_events,
               CAST(sum(tot) OVER (ORDER BY dur DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_risk
        FROM vc
    ),
    ev2 AS (
        SELECT dur, d_events, n_risk,
               row_number() OVER (ORDER BY dur) AS rn
        FROM ev WHERE d_events > 0
    ),
    km AS (
        SELECT rn, dur, d_events, n_risk,
               (n_risk - d_events) * 1.0 / n_risk AS s
        FROM ev2 WHERE rn = 1
        UNION ALL
        SELECT e.rn, e.dur, e.d_events, e.n_risk,
               km.s * ((e.n_risk - e.d_events) * 1.0 / e.n_risk)
        FROM km JOIN ev2 e ON e.rn = km.rn + 1
    )
    SELECT dur AS t_days, n_risk, d_events,
           CAST(round(s * 1000000000.0) AS BIGINT) AS surv_fp
    FROM km
"""

ORACLES["equidepth_histogram"] = """
    WITH m AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
    ),
    r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM m),
    t AS (SELECT count(*) AS n FROM m),
    b AS (
        SELECT CAST(j AS BIGINT) AS bucket,
               CAST(ceil(j * (SELECT n FROM t) / 10.0) AS BIGINT) AS cum_rank
        FROM range(1, 11) s(j)
    )
    SELECT bucket, cum_rank, r.v AS boundary
    FROM b JOIN r ON r.rn = b.cum_rank
"""


def q_daily_ewma(sf_dir):
    """Exponentially weighted moving average of daily revenue
    (α = 0.25) — the smoothing primitive behind anomaly baselines and
    trend dashboards, and a SECOND instance of the ordered-IEEE-
    recurrence contract introduced by survival_km: the distributed part
    is one map-side-combined day histogram (time-span bounded, ≤ ~2400
    rows at any sf); the recurrence s_t = 0.25·v_t + 0.75·s_{t−1} runs
    left-to-right over exact integer cents, so every step is two IEEE
    multiplies and an add — bit-equal to the oracle's ordered RECURSIVE
    CTE. ewma_fp is ×100 half-away quantized (cent-hundredths keep it
    under 2⁶³ through ~sf1000)."""
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
        ["d"], {"v": ("v", "sum")}).to_pandas().sort_values("d")
    rows, s = [], None
    for d, v in zip(vc["d"].astype(int), vc["v"].astype(int)):
        # mirrored op order: 0.25 * v + 0.75 * s (v implicit int→double)
        s = 1.0 * v if s is None else 0.25 * v + 0.75 * s
        rows.append({"d": np.int64(d), "v": np.int64(v),
                     "ewma_fp": np.int64(int(_round_half_away(
                         np.array([s * 100.0]))[0]))})
    return pd.DataFrame(rows)


def q_grouped_boxplot(sf_dir):
    """Five-number boxplot profile per return flag — min, Q1, median,
    Q3, max by the pinned rank rule (rank = ceil(q·n), the
    q_quantiles contract), plus the 1.5·IQR outlier count computed
    all-integer (2x vs 2·Q1 − 3·IQR cross-multiplication, no float
    anywhere). The distributed part is the (flag, value) value-count
    fold (≤ 200 rows out at any sf); the CDF walk finishes on the
    driver and is mirrored by window cumulative sums in the oracle."""
    li = T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _x(b: pa.Table) -> pa.Table:
        return pa.table({
            "f": b["l_returnflag"],
            "x": pa.array(_round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False)
            ).astype(np.int64), pa.int64()),
        })

    cells = fast_groupby_agg(
        li.map_batches(_x, batch_format="pyarrow"),
        ["f", "x"], {"c": (None, "count")}).to_pandas()
    rows = []
    for f, g in cells.sort_values("x").groupby("f", sort=True):
        xs = g["x"].to_numpy(np.int64)
        cs = g["c"].to_numpy(np.int64)
        cum = np.cumsum(cs)
        n = int(cum[-1])

        def _at(q: float) -> int:
            rk = math.ceil(q * n)  # mirrored float product, exact <2^53
            return int(xs[np.searchsorted(cum, rk, side="left")])

        q1, med, q3 = _at(0.25), _at(0.5), _at(0.75)
        iqr = q3 - q1
        out_mask = (2 * xs < 2 * q1 - 3 * iqr) | (2 * xs > 2 * q3 + 3 * iqr)
        rows.append({
            "l_returnflag": f, "n": np.int64(n),
            "x_min": np.int64(xs[0]), "q1": np.int64(q1),
            "med": np.int64(med), "q3": np.int64(q3),
            "x_max": np.int64(xs[-1]),
            "n_outliers": np.int64(int(cs[out_mask].sum())),
        })
    return pd.DataFrame(rows)


def q_interpolate_daily(sf_dir):
    """Dense daily revenue series with LINEAR interpolation across
    missing days (gap_fill's zero-fill sibling — the resampling rule a
    rate metric needs). Interpolation is exact integer cross-
    multiplication, (v0·(d1−t) + v1·(t−d0))·10³ // (d1−d0), in Python
    ints mirrored by HUGEINT — no float slope, no accumulation. The
    distributed part is the one day-histogram exchange; the dense walk
    is TIME-SPAN bounded (~2400 rows/decade) on the driver, mirrored
    by a generate_series × prev/next lookup in the oracle."""
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
        ["d"], {"v": ("v", "sum")}).to_pandas().sort_values("d")
    ds_ = vc["d"].to_numpy(np.int64)
    vs = vc["v"].to_numpy(np.int64)
    rows = []
    for t in range(int(ds_[0]), int(ds_[-1]) + 1):
        i = int(np.searchsorted(ds_, t, side="left"))
        if i < len(ds_) and int(ds_[i]) == t:
            v_fp = int(vs[i]) * 1000
        else:
            d0, v0 = int(ds_[i - 1]), int(vs[i - 1])
            d1, v1 = int(ds_[i]), int(vs[i])
            v_fp = (v0 * (d1 - t) + v1 * (t - d0)) * 1000 // (d1 - d0)
        rows.append({"t": np.int64(t), "v_fp": np.int64(v_fp)})
    return pd.DataFrame(rows)


ORACLES["daily_ewma"] = """
    WITH RECURSIVE m AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS d,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
        FROM orders GROUP BY 1
    ),
    e AS (
        SELECT d, CAST(v AS BIGINT) AS v,
               row_number() OVER (ORDER BY d) AS rn
        FROM m
    ),
    w AS (
        -- e0 suffixes force DOUBLE literals (bare 0.25 is DECIMAL in
        -- DuckDB, which would diverge from the engine's IEEE ops)
        SELECT rn, d, v, 1.0e0 * v AS s FROM e WHERE rn = 1
        UNION ALL
        SELECT e.rn, e.d, e.v, 0.25e0 * e.v + 0.75e0 * w.s
        FROM w JOIN e ON e.rn = w.rn + 1
    )
    SELECT d, v, CAST(round(s * 100.0) AS BIGINT) AS ewma_fp FROM w
"""

ORACLES["grouped_boxplot"] = """
    WITH m AS (
        SELECT l_returnflag AS f,
               CAST(round(l_quantity) AS BIGINT) AS x
        FROM lineitem
    ),
    g AS (SELECT f, x, CAST(count(*) AS BIGINT) AS c FROM m GROUP BY 1, 2),
    w AS (
        SELECT f, x, c,
               CAST(sum(c) OVER (PARTITION BY f ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(sum(c) OVER (PARTITION BY f) AS BIGINT) AS n
        FROM g
    ),
    pick AS (
        SELECT f, n,
               min(x) FILTER (cum >= CAST(ceil(0.25 * n) AS BIGINT)) AS q1,
               min(x) FILTER (cum >= CAST(ceil(0.5 * n) AS BIGINT)) AS med,
               min(x) FILTER (cum >= CAST(ceil(0.75 * n) AS BIGINT)) AS q3,
               min(x) AS x_min, max(x) AS x_max
        FROM w GROUP BY f, n
    )
    SELECT p.f AS l_returnflag, p.n, p.x_min, p.q1, p.med, p.q3, p.x_max,
           CAST(COALESCE((
               SELECT sum(g2.c) FROM g g2
               WHERE g2.f = p.f
                 AND (2 * g2.x < 2 * p.q1 - 3 * (p.q3 - p.q1)
                      OR 2 * g2.x > 2 * p.q3 + 3 * (p.q3 - p.q1))
           ), 0) AS BIGINT) AS n_outliers
    FROM pick p
"""

ORACLES["interpolate_daily"] = """
    WITH m AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
    ),
    b AS (SELECT min(d) AS lo, max(d) AS hi FROM m),
    days AS (
        SELECT unnest(generate_series(lo, hi)) AS t FROM b
    ),
    nb AS (
        SELECT t,
               (SELECT max(d) FROM m WHERE d <= t) AS d0,
               (SELECT min(d) FROM m WHERE d >= t) AS d1
        FROM days
    )
    SELECT nb.t,
           CASE WHEN nb.d0 = nb.d1
                THEN (SELECT v FROM m WHERE d = nb.t) * 1000
                ELSE CAST((CAST(m0.v AS HUGEINT) * (nb.d1 - nb.t)
                           + CAST(m1.v AS HUGEINT) * (nb.t - nb.d0))
                          * 1000 // (nb.d1 - nb.d0) AS BIGINT)
           END AS v_fp
    FROM nb
    LEFT JOIN m m0 ON m0.d = nb.d0
    LEFT JOIN m m1 ON m1.d = nb.d1
"""


def q_kendall_tau(sf_dir):
    """Kendall τ-b of l_quantity vs l_discount — the concordance-based
    rank association (Spearman's sibling; robust to different tie
    structure). Everything before the final division is EXACT integer:
    concordant/discordant pair mass comes from the tiny-domain (x, y)
    contingency fold (≤ 550 cells at any sf) as Σ c_a·c_b over cell
    pairs strictly ordered in both / opposite dimensions, and the tie
    corrections n₀−n₁, n₀−n₂ are integer marginal sums. The oracle
    mirrors with HUGEINT (sum(BIGINT)→HUGEINT is exact; per-term
    products stay under 2⁶³ through sf100) and the one final
    float-sqrt-division expression is written operation-for-operation
    identically."""
    li = T(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def _xy(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pa.array(_round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False)
            ).astype(np.int64), pa.int64()),
            "y": pa.array(_round_half_away(
                b["l_discount"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    cells = fast_groupby_agg(
        li.map_batches(_xy, batch_format="pyarrow"),
        ["x", "y"], {"c": (None, "count")}).to_pandas()
    recs = [(int(x), int(y), int(c))
            for x, y, c in zip(cells["x"], cells["y"], cells["c"])]
    conc = disc = 0
    for xa, ya, ca in recs:
        for xb, yb, cb in recs:
            if xb > xa and yb > ya:
                conc += ca * cb
            elif xb > xa and yb < ya:
                disc += ca * cb
    n = sum(c for _, _, c in recs)
    n0 = n * (n - 1) // 2
    mx: dict[int, int] = {}
    my: dict[int, int] = {}
    for x, y, c in recs:
        mx[x] = mx.get(x, 0) + c
        my[y] = my.get(y, 0) + c
    n1 = sum(c * (c - 1) // 2 for c in mx.values())
    n2 = sum(c * (c - 1) // 2 for c in my.values())
    tau = float(conc - disc) / (math.sqrt(float(n0 - n1))
                                * math.sqrt(float(n0 - n2)))
    return pd.DataFrame([{
        "n": np.int64(n), "conc": np.int64(conc), "disc": np.int64(disc),
        "tau_fp": np.int64(int(_round_half_away(np.array([tau * 1e9]))[0])),
    }])


_MARKOV_ITERS = 12
_MARKOV_SCALE = 10**9


def q_markov_stationary(sf_dir, iters: int = _MARKOV_ITERS):
    """Stationary distribution of the event-type Markov chain by power
    iteration — where does a user's session settle? States are the
    event-type domain (≤ a handful); the DISTRIBUTED work is the
    consecutive-pair transition count (per-user sorted pairing, then a
    map-side-combined (prev, next) fold — the event_transitions plan,
    aggregated globally); the k×k iteration runs on the driver
    ENTIRELY in ×10⁹ integer fixed point — pᵗ⁺¹(j) = Σᵢ pᵗ(i)·c(i,j)
    // out(i) — so every level is summation-order-free and the oracle
    (the same recurrence unrolled one CTE per iteration, pagerank's
    pattern) matches bit for bit. Mass evaporates at states with no
    outgoing edges (documented; none in this domain); states with no
    incoming edges read 0 via the final left join."""
    ev = T(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        return pd.DataFrame({"prv": et[:-1], "nxt": et[1:]})

    trans = fast_groupby_agg(
        ev.groupby("user_id").map_groups(_pairs, batch_format="pandas"),
        ["prv", "nxt"], {"c": (None, "count")}).to_pandas()
    states = sorted(set(ev.unique("event_type")))
    out = {s: 0 for s in states}
    for p, c in zip(trans["prv"], trans["c"]):
        out[p] += int(c)
    k = len(states)
    pi = {s: _MARKOV_SCALE // k for s in states}
    tl = [(p, nx, int(c)) for p, nx, c in
          zip(trans["prv"], trans["nxt"], trans["c"])]
    for _ in range(iters):
        nxt_pi = {s: 0 for s in states}
        for p, nx, c in tl:
            nxt_pi[nx] += pi[p] * c // out[p]
        pi = nxt_pi
    return pd.DataFrame([
        {"event_type": s, "pi_fp": np.int64(pi[s])} for s in states])


def _markov_oracle(iters: int = _MARKOV_ITERS) -> str:
    """Unrolled power-iteration CTE (one level per iteration — the
    pagerank oracle pattern; integer fixed point throughout)."""
    lvls = [f"""
    p0 AS (
        SELECT st, CAST({_MARKOV_SCALE} // (SELECT count(*) FROM states)
                   AS BIGINT) AS pi
        FROM states
    )"""]
    for i in range(iters):
        lvls.append(f"""
    p{i + 1} AS (
        SELECT t.nxt AS st,
               CAST(sum(p.pi * t.c // t.rt) AS BIGINT) AS pi
        FROM p{i} p JOIN trans t ON t.prv = p.st
        GROUP BY t.nxt
    )""")
    return f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    raw AS (
        SELECT event_type AS prv, nxt, CAST(count(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    trans AS (
        SELECT prv, nxt, c,
               CAST(sum(c) OVER (PARTITION BY prv) AS BIGINT) AS rt
        FROM raw
    ),
    states AS (SELECT DISTINCT event_type AS st FROM events),
    {','.join(lvls)}
    SELECT s.st AS event_type,
           CAST(COALESCE(p.pi, 0) AS BIGINT) AS pi_fp
    FROM states s LEFT JOIN p{iters} p ON p.st = s.st
"""


ORACLES["kendall_tau"] = """
    WITH m AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_discount * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
              FROM m GROUP BY x, y),
    cd AS (
        SELECT
            CAST(COALESCE((SELECT sum(a.c * b.c) FROM cells a
                 JOIN cells b ON b.x > a.x AND b.y > a.y), 0)
                 AS HUGEINT) AS conc,
            CAST(COALESCE((SELECT sum(a.c * b.c) FROM cells a
                 JOIN cells b ON b.x > a.x AND b.y < a.y), 0)
                 AS HUGEINT) AS disc
    ),
    marg AS (
        SELECT CAST(sum(c) AS HUGEINT) AS n,
               CAST((SELECT sum(cx * (cx - 1) // 2) FROM (
                    SELECT sum(c) AS cx FROM cells GROUP BY x))
                    AS HUGEINT) AS n1,
               CAST((SELECT sum(cy * (cy - 1) // 2) FROM (
                    SELECT sum(c) AS cy FROM cells GROUP BY y))
                    AS HUGEINT) AS n2
        FROM cells
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(conc AS BIGINT) AS conc,
           CAST(disc AS BIGINT) AS disc,
           CAST(round(CAST(conc - disc AS DOUBLE)
                / (sqrt(CAST(n * (n - 1) // 2 - n1 AS DOUBLE))
                   * sqrt(CAST(n * (n - 1) // 2 - n2 AS DOUBLE)))
                * 1000000000.0) AS BIGINT) AS tau_fp
    FROM cd, marg
"""

ORACLES["markov_stationary"] = _markov_oracle()


def q_confusion_matrix(sf_dir, n_classes: int = 3):
    """Model-evaluation scorecard: per-class TP/FP/FN and integer ×10⁶
    precision / recall / F1 of the q_batch_inference scorer against
    the derived ground truth ``label % n_classes`` (the embeddings
    table's 10 raw labels folded onto the scorer's 3-class head).
    Distributed part: the inference Dataset hash-joins embeddings on
    vec_id, then one map-side-combined (truth, pred) fold — the
    exchange is the k×k confusion matrix, never rows. Per-class ratios
    are floor divisions over exact counts; F1 is the all-integer
    2·p·r // (p+r) with a zero guard — mirrored literally in SQL."""
    from .queries import q_batch_inference

    pred = q_batch_inference(sf_dir, n_classes)
    emb = T(sf_dir, "embeddings", ["vec_id", "label"])

    def _truth(b: pa.Table) -> pa.Table:
        return pa.table({
            "vid_r": b["vec_id"],
            "truth": pa.array(
                b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
                % n_classes, pa.int64()),
        })

    j = pred.join(emb.map_batches(_truth, batch_format="pyarrow"),
                  "inner", num_partitions=4,
                  on=("vec_id",), right_on=("vid_r",))
    cm = fast_groupby_agg(
        j, ["truth", "pred"], {"c": (None, "count")}).to_pandas()
    classes = list(range(n_classes))
    tp = {k: 0 for k in classes}
    pred_cnt = {k: 0 for k in classes}
    truth_cnt = {k: 0 for k in classes}
    for t, p, c in zip(cm["truth"], cm["pred"], cm["c"]):
        t, p, c = int(t), int(p), int(c)
        pred_cnt[p] += c
        truth_cnt[t] += c
        if t == p:
            tp[t] = c
    rows = []
    for k in classes:
        prec = tp[k] * 10**6 // pred_cnt[k] if pred_cnt[k] else 0
        rec = tp[k] * 10**6 // truth_cnt[k] if truth_cnt[k] else 0
        f1 = 2 * prec * rec // (prec + rec) if prec + rec else 0
        rows.append({
            "class": np.int64(k), "tp": np.int64(tp[k]),
            "fp": np.int64(pred_cnt[k] - tp[k]),
            "fn": np.int64(truth_cnt[k] - tp[k]),
            "prec_fp": np.int64(prec), "rec_fp": np.int64(rec),
            "f1_fp": np.int64(f1),
        })
    return pd.DataFrame(rows)


def q_window_range_sum(sf_dir):
    """Value-based RANGE window frame — for every order, the same
    customer's total order value within ±30 DAYS of it (the
    window-function class the ROWS-frame suite can't express: the
    frame is defined by the ORDER BY *value*, so it is insensitive to
    tie order and row position). Plan: ONE hash shuffle into
    splitmix64(custkey) % P partitions, then a fully VECTORIZED
    two-pointer over each partition: rows lexsorted by (ck, day),
    windows resolved by searchsorted on the composite key
    ck·SPAN + (day − dmin) with SPAN = day-range + 2·30 + 1, so a
    ±30-day probe can never cross into a neighboring customer's key
    range — P udf calls total, not one per customer (the map_groups
    original paid 15k pandas calls at sf0.1; this is ~5×).
    All integer cents; no float anywhere."""
    from ..functions.sketches import _splitmix64

    P = 64
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ok": b["o_orderkey"], "ck": b["o_custkey"],
            "part": pa.array(
                (_splitmix64(ck) % np.uint64(P)).astype(np.int64)),
            "d": pa.array(
                b["o_orderdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 86_400_000_000, pa.int64()),
            "v": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    def _range_sum(g: pd.DataFrame) -> pd.DataFrame:
        ck0 = g["ck"].to_numpy(np.int64)
        d0 = g["d"].to_numpy(np.int64)
        order = np.lexsort((d0, ck0))
        ck, d = ck0[order], d0[order]
        v = g["v"].to_numpy(np.int64)[order]
        ok = g["ok"].to_numpy(np.int64)[order]
        dmin = int(d.min())
        span = int(d.max()) - dmin + 61
        key = ck * span + (d - dmin)
        pre = np.concatenate([[0], np.cumsum(v)])
        lo = np.searchsorted(key, key - 30, side="left")
        hi = np.searchsorted(key, key + 30, side="right")
        return pd.DataFrame({
            "o_orderkey": ok,
            "range_sum": (pre[hi] - pre[lo]).astype(np.int64),
        })

    return orders.map_batches(_fp, batch_format="pyarrow") \
        .groupby("part").map_groups(_range_sum, batch_format="pandas")


ORACLES["confusion_matrix"] = """
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
    k AS (SELECT CAST(gs AS BIGINT) AS cls
          FROM unnest(generate_series(0, 2)) AS t(gs)),
    agg AS (
        SELECT cls,
               CAST(COALESCE((SELECT count(*) FROM p
                    WHERE truth = cls AND pred = cls), 0) AS BIGINT) AS tp,
               CAST(COALESCE((SELECT count(*) FROM p
                    WHERE pred = cls), 0) AS BIGINT) AS pc,
               CAST(COALESCE((SELECT count(*) FROM p
                    WHERE truth = cls), 0) AS BIGINT) AS tc
        FROM k
    )
    SELECT cls AS class, tp, pc - tp AS fp, tc - tp AS fn,
           CASE WHEN pc > 0 THEN tp * 1000000 // pc ELSE 0 END AS prec_fp,
           CASE WHEN tc > 0 THEN tp * 1000000 // tc ELSE 0 END AS rec_fp,
           CASE WHEN (CASE WHEN pc > 0 THEN tp * 1000000 // pc ELSE 0 END)
                     + (CASE WHEN tc > 0 THEN tp * 1000000 // tc ELSE 0 END)
                     > 0
                THEN 2 * (CASE WHEN pc > 0 THEN tp * 1000000 // pc
                          ELSE 0 END)
                       * (CASE WHEN tc > 0 THEN tp * 1000000 // tc
                          ELSE 0 END)
                     // ((CASE WHEN pc > 0 THEN tp * 1000000 // pc
                          ELSE 0 END)
                         + (CASE WHEN tc > 0 THEN tp * 1000000 // tc
                            ELSE 0 END))
                ELSE 0 END AS f1_fp
    FROM agg
"""

ORACLES["window_range_sum"] = """
    WITH m AS (
        SELECT o_orderkey,
               o_custkey AS ck,
               epoch_us(o_orderdate) // 86400000000 AS d,
               CAST(round(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    )
    SELECT o_orderkey,
           CAST(sum(v) OVER (PARTITION BY ck ORDER BY d
                RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)
                AS BIGINT) AS range_sum
    FROM m
"""


_HIER_DIVISORS = [10**i for i in range(9)]  # customer keys < 10^8 guard


def q_hierarchy_rollup(sf_dir):
    """Subtree aggregation over a hierarchy — every prefix node of the
    decimal-digit customer-key trie (parent(k) = k//10, root 0) gets
    its subtree customer count and revenue. The classic recursive
    rollup needs NO iteration here because ancestors are computable:
    each per-customer row flat-maps to its ≤9-row ancestor chain and
    ONE map-side-combined groupby folds the tree — the pattern for any
    materialized-path / fixed-arity hierarchy at 100 TB (vs. the
    join-per-level plans the iterative graph family uses when parents
    are data). All integer cents; the oracle mirrors the chain with a
    divisor table + DISTINCT (the engine's strictly-decreasing chain
    and the divisor set collapse to the same node set)."""
    orders = T(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "ck": b["o_custkey"],
            "p": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    per_cust = fast_groupby_agg(
        orders.map_batches(_fp, batch_format="pyarrow"),
        ["ck"], {"rev": ("p", "sum")})

    def _ancestors(b: pa.Table) -> pa.Table:
        ck = b["ck"].to_numpy(zero_copy_only=False)
        if len(ck) and int(ck.max()) >= _HIER_DIVISORS[-1]:
            raise ValueError("hierarchy_rollup assumes custkey < 10^8")
        rev = b["rev"].to_numpy(zero_copy_only=False)
        nodes, revs = [], []
        for k, r in zip(ck, rev):
            k, r = int(k), int(r)
            while True:
                nodes.append(k)
                revs.append(r)
                if k == 0:
                    break
                k //= 10
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "rev": pa.array(revs, pa.int64()),
                         "one": pa.array(np.ones(len(nodes), np.int64))})

    return fast_groupby_agg(
        per_cust.map_batches(_ancestors, batch_format="pyarrow"),
        ["node"],
        {"n_customers": ("one", "sum"), "subtree_rev": ("rev", "sum")})


def q_table_checksum(sf_dir):
    """Order-invariant distributed table checksum — the replication /
    migration integrity primitive: every row canonicalizes to a pinned
    string, md5's leading 60 bits become an int64, and the table
    digest is (Σ mod 2⁶³, XOR, count) — all three mergeable map-side,
    so the exchange is three integers per block and the result is
    independent of row order, partitioning, and parallelism. The
    row-serialization contract (field order, '|' separator, cents,
    epoch days) is pinned in the oracle SQL string itself."""
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority"])

    def _h(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        st = b["o_orderstatus"].to_pylist()
        p = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d = b["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000
        pr = b["o_orderpriority"].to_pylist()
        hs = np.fromiter(
            (int(hashlib.md5(
                f"{a}|{c}|{s}|{v}|{dd}|{q}".encode()).hexdigest()[:15], 16)
             for a, c, s, v, dd, q in zip(ok, ck, st, p, d, pr)),
            dtype=np.int64, count=len(ok))
        acc_sum = 0
        for h in hs:
            acc_sum = (acc_sum + int(h)) % (2**63)
        acc_xor = int(np.bitwise_xor.reduce(hs)) if len(hs) else 0
        return pa.table({
            "s": pa.array([acc_sum], pa.int64()),
            "x": pa.array([acc_xor], pa.int64()),
            "n": pa.array([len(hs)], pa.int64()),
        })

    parts = orders.map_batches(_h, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([{
        "checksum_sum": np.int64(int(parts["s"].astype(object).sum())
                                 % (2**63)),
        "checksum_xor": np.int64(np.bitwise_xor.reduce(
            parts["x"].to_numpy(np.int64)) if len(parts) else 0),
        "n_rows": np.int64(int(parts["n"].sum())),
    }])


ORACLES["hierarchy_rollup"] = """
    WITH pc AS (
        SELECT o_custkey AS ck,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
        FROM orders GROUP BY 1
    ),
    dv AS (SELECT CAST(pow(10, g) AS BIGINT) AS d
           FROM unnest(generate_series(0, 8)) AS t(g)),
    anc AS (SELECT DISTINCT ck, ck // d AS node, rev FROM pc, dv)
    SELECT node,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(rev AS BIGINT)) AS BIGINT) AS subtree_rev
    FROM anc GROUP BY node
"""

ORACLES["table_checksum"] = """
    WITH h AS (
        SELECT CAST(concat('0x', substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|' ||
                   CAST(o_custkey AS VARCHAR) || '|' ||
                   o_orderstatus || '|' ||
                   CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                        AS VARCHAR) || '|' ||
                   CAST(epoch_us(o_orderdate) // 86400000000
                        AS VARCHAR) || '|' ||
                   o_orderpriority), 1, 15)) AS BIGINT) AS v
        FROM orders
    )
    SELECT CAST(CAST(sum(v) AS HUGEINT)
                % 9223372036854775808 AS BIGINT) AS checksum_sum,
           CAST(bit_xor(v) AS BIGINT) AS checksum_xor,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM h
"""


def q_running_median(sf_dir):
    """Order-sensitive running (cumulative) median of daily revenue —
    the windowed-QUANTILE class (sum/rank windows are algebraic; a
    running median needs an order-statistics structure). Distributed
    part: the one day-histogram exchange; the walk is TIME-SPAN
    bounded on the driver with an insertion-sorted buffer (the
    two-heap equivalent), lower-median rank rule ceil(n/2) pinned by
    the oracle's windowed quantile_disc(0.5). All integer cents."""
    import bisect

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
        ["d"], {"v": ("v", "sum")}).to_pandas().sort_values("d")
    buf: list[int] = []
    rows = []
    for d, v in zip(vc["d"].astype(int), vc["v"].astype(int)):
        bisect.insort(buf, v)
        rows.append({"d": np.int64(d), "v": np.int64(v),
                     "run_med": np.int64(buf[(len(buf) + 1) // 2 - 1])})
    return pd.DataFrame(rows)


_KNAPSACK_MAX_SOURCES = 20


def q_source_knapsack(sf_dir, budget_pct: int = 60):
    """Exact 0/1-knapsack source selection — choose the subset of
    corpus sources maximizing content value (docs containing 'the' —
    the stand-in for a quality score) under a character budget (60% of
    the corpus), the data-mixing decision a token-budgeted training
    run actually makes (greedy set_cover's optimal sibling). The
    distributed part is ONE per-source (value, weight) fold; the
    source domain is tiny by nature, so exhaustive 2^k enumeration on
    the driver IS the spec (vectorized numpy bit folds, guarded at 20
    sources ≈ 1M masks; beyond that a dp over quantized budget
    replaces it), and the oracle enumerates the same masks with bit
    arithmetic. Ties pinned: value DESC, weight ASC, mask ASC over
    lexicographically bit-indexed sources."""
    docs = T(sf_dir, "documents", ["source", "text", "n_chars"])

    def _vw(b: pa.Table) -> pa.Table:
        has = pc.match_substring(b["text"], "the")
        return pa.table({
            "source": b["source"],
            "val": pa.array(
                has.to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64()),
            "w": b["n_chars"],
        })

    sv = fast_groupby_agg(
        docs.map_batches(_vw, batch_format="pyarrow"),
        ["source"], {"val": ("val", "sum"), "w": ("w", "sum")}
    ).to_pandas().sort_values("source").reset_index(drop=True)
    k = len(sv)
    if k > _KNAPSACK_MAX_SOURCES:
        raise ValueError("source_knapsack enumerates 2^k; k too large")
    vals = [int(v) for v in sv["val"]]
    ws = [int(w) for w in sv["w"]]
    budget = sum(ws) * budget_pct // 100
    masks = np.arange(1 << k, dtype=np.int64)
    tv = np.zeros(1 << k, dtype=np.int64)
    tw = np.zeros(1 << k, dtype=np.int64)
    for i in range(k):
        bit = (masks >> i) & 1
        tv += bit * vals[i]
        tw += bit * ws[i]
    feas = tw <= budget
    order = np.lexsort((masks[feas], tw[feas], -tv[feas]))
    mask = int(masks[feas][order[0]])
    tv, tw = int(tv[feas][order[0]]), int(tw[feas][order[0]])
    return pd.DataFrame([{
        "source": s, "chosen": np.int64((mask >> i) & 1),
        "val": np.int64(vals[i]), "w": np.int64(ws[i]),
        "total_val": np.int64(tv), "total_w": np.int64(tw),
    } for i, s in enumerate(sv["source"])])


ORACLES["running_median"] = """
    WITH m AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
    )
    SELECT d, v,
           CAST(quantile_disc(v, 0.5) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS run_med
    FROM m
"""

ORACLES["source_knapsack"] = """
    WITH sv AS (
        SELECT source,
               CAST(sum(CASE WHEN contains(text, 'the')
                        THEN 1 ELSE 0 END) AS BIGINT) AS val,
               CAST(sum(n_chars) AS BIGINT) AS w,
               row_number() OVER (ORDER BY source) - 1 AS i
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(w) * 60 // 100 AS BIGINT) AS budget,
                   count(*) AS k FROM sv),
    masks AS (
        SELECT CAST(gs AS BIGINT) AS mask
        FROM tot, unnest(generate_series(
             0, CAST(pow(2, k) AS BIGINT) - 1)) AS t(gs)
    ),
    scored AS (
        SELECT m.mask,
               CAST(COALESCE(sum(CASE WHEN (m.mask >> s.i) & 1 = 1
                    THEN s.val END), 0) AS BIGINT) AS tv,
               CAST(COALESCE(sum(CASE WHEN (m.mask >> s.i) & 1 = 1
                    THEN s.w END), 0) AS BIGINT) AS tw
        FROM masks m, sv s GROUP BY m.mask
    ),
    best AS (
        SELECT mask, tv, tw FROM scored, tot WHERE tw <= budget
        ORDER BY tv DESC, tw ASC, mask ASC LIMIT 1
    )
    SELECT s.source,
           CAST((b.mask >> s.i) & 1 AS BIGINT) AS chosen,
           s.val, s.w,
           b.tv AS total_val, b.tw AS total_w
    FROM sv s, best b
"""


def q_calibration_bins(sf_dir, n_bins: int = 10):
    """Model-calibration reliability table — confidence-decile vs
    accuracy, the diagram every scorer ships with: q_batch_inference
    logits join ground truth (label % 3), rows bucket by EQUAL-WIDTH
    bins over the logit range (min/max from one aggregate — rank-free,
    so no sort), and each bin reports count + correct + integer ×10⁶
    accuracy. Everything is integer arithmetic over exact logits; bin
    index ⌊(logit−lo)·B/(hi−lo+1)⌋ is one integer cross-multiplication
    mirrored in SQL. The exchange is the B-row bin table."""
    from .queries import q_batch_inference

    pred = q_batch_inference(sf_dir).materialize()
    from ray.data.aggregate import Max, Min

    dom = pred.aggregate(Min("best_logit_fp"), Max("best_logit_fp"))
    lo, hi = int(dom["min(best_logit_fp)"]), int(dom["max(best_logit_fp)"])
    span = hi - lo + 1
    emb = T(sf_dir, "embeddings", ["vec_id", "label"])

    def _truth(b: pa.Table) -> pa.Table:
        return pa.table({
            "vid_r": b["vec_id"],
            "truth": pa.array(
                b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
                % 3, pa.int64()),
        })

    j = pred.join(emb.map_batches(_truth, batch_format="pyarrow"),
                  "inner", num_partitions=4,
                  on=("vec_id",), right_on=("vid_r",))

    def _bin(b: pa.Table) -> pa.Table:
        lg = b["best_logit_fp"].to_numpy(zero_copy_only=False)
        ok = (b["pred"].to_numpy(zero_copy_only=False)
              == b["truth"].to_numpy(zero_copy_only=False))
        return pa.table({
            "bin": pa.array((lg - lo) * n_bins // span, pa.int64()),
            "ok": pa.array(ok.astype(np.int64), pa.int64()),
        })

    g = fast_groupby_agg(
        j.map_batches(_bin, batch_format="pyarrow"),
        ["bin"], {"n": (None, "count"), "correct": ("ok", "sum")}
    ).to_pandas().sort_values("bin").reset_index(drop=True)
    return pd.DataFrame({
        "bin": g["bin"].astype(np.int64),
        "n": g["n"].astype(np.int64),
        "correct": g["correct"].astype(np.int64),
        "acc_fp": (g["correct"].astype(np.int64) * 10**6
                   // g["n"].astype(np.int64)),
    })


def q_seasonal_strength(sf_dir):
    """Weekday-seasonality strength of daily revenue — F_seasonal =
    1 − Var(residual)/Var(series), the STL decomposition's headline
    statistic with the seasonal component taken as weekday means.
    Every moment is an EXACT integer: the total deviation mass
    Vt = Σ(n·x_t − S)² and per-weekday residual masses
    A_w = Σ_{t∈w}(n_w·x_t − S_w)² come straight from the one
    day-histogram exchange (HUGEINT/DECIMAL(38,0) in the oracle,
    Python ints here); each A_w is ×10⁹-quantized BEFORE the 7-term
    cross-weekday sum (the anova_f per-term policy — the sum is then
    association-order-free), and the finale is one mirrored float
    tree. The exchange is the TIME-SPAN-sized day table."""
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
    d = [int(x) for x in vc["d"]]
    x = [int(v) for v in vc["v"]]
    n = len(x)
    s = sum(x)
    vt = sum((n * xi - s) ** 2 for xi in x)
    wsum = {w: 0 for w in range(7)}
    wcnt = {w: 0 for w in range(7)}
    for di, xi in zip(d, x):
        wsum[di % 7] += xi
        wcnt[di % 7] += 1
    aw = {w: 0 for w in range(7) if wcnt[w]}
    for di, xi in zip(d, x):
        w = di % 7
        aw[w] += (wcnt[w] * xi - wsum[w]) ** 2
    # per-weekday DIMENSIONLESS ratio term, ×1e9-quantized BEFORE the
    # 7-term sum (order-free; each ≲ 1e9 so int64-safe at any sf):
    # Var(res)/Var(tot) = Σ_w A_w·n²/(n_w²·Vt); strength stays integer
    sres = sum(int(_round_half_away(np.array(
        [float(a) * (n * n) / (wcnt[w] * wcnt[w]) / float(vt)
         * 1_000_000_000.0]))[0])
        for w, a in aw.items())
    return pd.DataFrame([{
        "n_days": np.int64(n),
        "strength_fp": np.int64(1_000_000_000 - sres),
    }])


ORACLES["calibration_bins"] = """
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
        SELECT vec_id, c, logit_fp, row_number() OVER (
            PARTITION BY vec_id ORDER BY logit_fp DESC, c) AS rn
        FROM l
    ),
    p AS (
        SELECT r.vec_id, CAST(r.c AS BIGINT) AS pred,
               r.logit_fp AS lg,
               CAST(emb.label % 3 AS BIGINT) AS truth
        FROM r JOIN embeddings emb ON emb.vec_id = r.vec_id
        WHERE rn = 1
    ),
    dom AS (SELECT min(lg) AS lo, max(lg) - min(lg) + 1 AS span FROM p)
    SELECT (p.lg - d.lo) * 10 // d.span AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END)
                AS BIGINT) AS correct,
           CAST(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS acc_fp
    FROM p, dom d
    GROUP BY 1
"""

ORACLES["seasonal_strength"] = """
    WITH m AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS s FROM m),
    vt AS (
        SELECT CAST(sum(CAST(
                   (CAST(t.n AS HUGEINT) * m.v - t.s)
                   * (CAST(t.n AS HUGEINT) * m.v - t.s)
                   AS DECIMAL(38, 0))) AS HUGEINT) AS vtot
        FROM m, tot t
    ),
    wk AS (
        SELECT d % 7 AS w, count(*) AS nw,
               CAST(sum(v) AS BIGINT) AS sw
        FROM m GROUP BY 1
    ),
    aw AS (
        SELECT w.w, w.nw,
               CAST(sum(CAST(
                   (CAST(w.nw AS HUGEINT) * m.v - w.sw)
                   * (CAST(w.nw AS HUGEINT) * m.v - w.sw)
                   AS DECIMAL(38, 0))) AS HUGEINT) AS a
        FROM m JOIN wk w ON m.d % 7 = w.w GROUP BY w.w, w.nw
    ),
    tq AS (
        SELECT CAST(sum(CAST(round(CAST(a AS DOUBLE) * (t.n * t.n)
                   / (nw * nw) / CAST(v.vtot AS DOUBLE)
                   * 1000000000.0) AS BIGINT)) AS BIGINT) AS sres
        FROM aw, tot t, vt v
    )
    SELECT CAST(t.n AS BIGINT) AS n_days,
           CAST(1000000000 - q.sres AS BIGINT) AS strength_fp
    FROM tq q, tot t
"""


def q_reset_cumsum(sf_dir):
    """Cumulative sum with RESET markers — per user, event values
    accumulate in order and restart at every 'signup' event (the
    odometer / session-scoped-accumulator scan; a running total that
    is NOT a plain window because the frame boundary is data-driven).
    Plan: one hash shuffle by user, per-group vectorized two-level
    cumsum (global cumsum minus the cumsum at the last reset —
    no Python loop); the oracle expresses the same thing with the
    count-of-resets-so-far window-partition trick. Values are ×10⁶
    integer fixed point; ties ordered by (ts, event_id) — a total
    order, pinned on both sides."""
    ev = T(sf_dir, "events", ["user_id", "event_type", "ts", "event_id",
                              "value"])

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        v = _round_half_away(g["value"].to_numpy() * 1e6).astype(np.int64)
        reset = (g["event_type"].to_numpy() == "signup")
        cum = np.cumsum(v)
        # cumsum value just BEFORE the most recent reset row (the reset
        # row itself starts the new run with its own value); the last
        # reset is tracked by POSITION so negative values are safe
        n = len(v)
        pos = np.where(reset, np.arange(n), -1)
        last_pos = np.maximum.accumulate(pos)
        base_at_reset = cum - v
        base = np.where(last_pos >= 0,
                        base_at_reset[np.maximum(last_pos, 0)], 0)
        run_sum = cum - base
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "run_sum": run_sum.astype(np.int64),
        })

    return ev.groupby("user_id").map_groups(_scan, batch_format="pandas")


ORACLES["reset_cumsum"] = """
    WITH m AS (
        SELECT user_id, event_id, ts,
               CAST(round(value * 1000000) AS BIGINT) AS v,
               CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS rs
        FROM events
    ),
    g AS (
        SELECT *, CAST(sum(rs) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS grp
        FROM m
    )
    SELECT event_id,
           CAST(sum(v) OVER (PARTITION BY user_id, grp
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS run_sum
    FROM g
"""


def q_ttl_dedup(sf_dir, ttl_days: int = 7):
    """Streaming TTL dedup: keep an event iff it is the first for its
    (user, event_type) key, OR its ts is at least TTL after the last
    KEPT event of that key — the suppression CHAIN of a streaming dedup
    operator with a time-to-live cache (an emitted event arms the
    suppressor for TTL; suppressed events do NOT re-arm it). This is
    data-dependent like reset_cumsum but worse: the frame boundary
    depends on prior *decisions*, so no window function expresses it.
    Plan: ONE hash shuffle by user_id, then a per-key searchsorted walk
    that jumps kept-row → kept-row in O(kept · log n) without touching
    suppressed rows. The oracle states the identical chain as a
    recursive CTE whose step is a LATERAL next-kept probe (first row
    by (ts, event_id) with ts ≥ kept.ts + TTL). Ties are total-ordered
    by (ts, event_id) on both sides; the ≥-at-boundary rule is pinned
    by side='left' ↔ `ts >= k.ts + INTERVAL`."""
    ev = T(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    ttl = np.timedelta64(ttl_days * 86_400 * 10**9, "ns")

    def _walk(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for et, sub in g.groupby("event_type", sort=False):
            sub = sub.sort_values(["ts", "event_id"], kind="mergesort")
            ts = sub["ts"].to_numpy(dtype="datetime64[ns]")
            ids = sub["event_id"].to_numpy()
            keep, pos, n = [], 0, len(ts)
            while pos < n:
                keep.append(pos)
                pos = int(np.searchsorted(ts, ts[pos] + ttl, side="left"))
            frames.append(pd.DataFrame({
                "event_type": et, "event_id": ids[keep]}))
        out = pd.concat(frames, ignore_index=True)
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return ev.groupby("user_id").map_groups(_walk, batch_format="pandas")


ORACLES["ttl_dedup"] = """
    WITH RECURSIVE k AS (
        SELECT user_id, event_type, ts, event_id
        FROM (SELECT user_id, event_type, ts, event_id,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1
        UNION ALL
        SELECT n.user_id, n.event_type, n.ts, n.event_id
        FROM k, LATERAL (
            SELECT user_id, event_type, ts, event_id FROM events e
            WHERE e.user_id = k.user_id AND e.event_type = k.event_type
              AND e.ts >= k.ts + INTERVAL 7 DAY
            ORDER BY ts, event_id LIMIT 1
        ) n
    )
    SELECT user_id, event_type, event_id FROM k
"""


# exp2(-r/H) sub-period decay factors: computed ONCE here (numpy libm)
# and INJECTED into the oracle SQL verbatim at 17 significant digits,
# so no transcendental is ever re-evaluated by the second engine — the
# hardened form of grouped_entropy's quantize-before-sum policy (the
# 1-ULP libm-divergence hazard flagged in round-2 ADVICE cannot occur
# when both sides read the same literal).
_DECAY_HALF_LIFE_DAYS = 30
_DECAY_LUT = np.exp2(-(np.arange(_DECAY_HALF_LIFE_DAYS)
                       / float(_DECAY_HALF_LIFE_DAYS)))


def q_decayed_counts(sf_dir):
    """Exponentially time-decayed event counts per type (half-life 30
    days, as-of the global max event date) — the freshness-weighted
    popularity statistic of every feed/trending system. Exactness:
    2^(-age/H) factors as ldexp(lut[age % H], -(age // H)); ldexp is
    EXACT power-of-two scaling (mirrored in SQL as division by
    1 << q, also exact), and the H lut constants are shared literals —
    so every per-event term is bit-identical on both sides before ×1e9
    quantization; the int64 sum is association-order-free. Plan: one
    scalar max (distributed), then a vectorized map + map-side-combined
    groupby over the ≤5-type domain. q is clamped at 62 on both sides
    (the term quantizes to 0 long before that at any data span)."""
    ev = T(sf_dir, "events", ["event_type", "ts"])
    gmax = np.datetime64(ev.max("ts"), "ns").astype("datetime64[D]")
    H = _DECAY_HALF_LIFE_DAYS

    def _terms(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        age = (gmax - ts).astype(np.int64)
        q = np.minimum(age // H, 62)
        term = np.ldexp(_DECAY_LUT[age % H], -q)
        return pa.table({
            "event_type": b["event_type"],
            "fp": pa.array(_round_half_away(term * 1e9).astype(np.int64)),
        })

    return fast_groupby_agg(
        ev.map_batches(_terms, batch_format="pyarrow"),
        ["event_type"], {"decay_fp": ("fp", "sum"), "n": (None, "count")})


def _decayed_counts_oracle() -> str:
    lut_rows = ", ".join(
        f"({r}, {v:.17g})" for r, v in enumerate(_DECAY_LUT))
    return f"""
    WITH lut(r, v) AS (VALUES {lut_rows}),
    m AS (
        SELECT event_type,
               date_diff('day', CAST(ts AS DATE),
                         (SELECT max(CAST(ts AS DATE)) FROM events)) AS age
        FROM events
    )
    SELECT m.event_type,
           CAST(sum(CAST(round(
                lut.v / CAST(1::BIGINT << LEAST(m.age // {_DECAY_HALF_LIFE_DAYS}, 62)
                             AS DOUBLE)
                * 1000000000) AS BIGINT)) AS BIGINT) AS decay_fp,
           count(*) AS n
    FROM m JOIN lut ON lut.r = m.age % {_DECAY_HALF_LIFE_DAYS}
    GROUP BY m.event_type
    """


ORACLES["decayed_counts"] = _decayed_counts_oracle()


def q_temperature_mix(sf_dir):
    """Temperature-scaled source mixing weights, w_s ∝ n_s^(1/2) — the
    multilingual/multi-source rebalancing rule (upweight small sources,
    temperature T=2) from multilingual-LM data work. Exactness: sqrt is
    CORRECTLY ROUNDED under IEEE 754 (unlike pow/exp), so numpy and
    DuckDB agree bit-for-bit on n^0.5; weights quantize ×1e9 to int64,
    and the ppm share is an exact integer cross floor-division done in
    Python ints (no overflow at any corpus size) ↔ HUGEINT/
    DECIMAL(38,0) in SQL. Plan: map-side-combined count per source
    (source domain ≤ tens of rows at any scale), driver finale over
    that domain-bounded frame."""
    counts = fast_groupby_agg(
        T(sf_dir, "documents", ["source"]),
        ["source"], {"n_docs": (None, "count")})
    pdf = counts.to_pandas()  # source-domain-sized
    n = pdf["n_docs"].to_numpy().astype(np.float64)
    w = _round_half_away(np.sqrt(n) * 1e9).astype(np.int64)
    tot = int(w.sum())
    return pa.table({
        "source": pa.array(pdf["source"].astype(str)),
        "n_docs": pa.array(pdf["n_docs"].to_numpy().astype(np.int64)),
        "w_fp": pa.array(w),
        "share_ppm": pa.array(
            np.array([int(x) * 1_000_000 // tot for x in w],
                     dtype=np.int64)),
    })


ORACLES["temperature_mix"] = """
    WITH c AS (SELECT source, count(*) AS n_docs FROM documents
               GROUP BY source),
    w AS (SELECT source, n_docs,
                 CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000000)
                      AS BIGINT) AS w_fp
          FROM c)
    SELECT source, n_docs, w_fp,
           CAST(CAST(w_fp AS HUGEINT) * 1000000
                // CAST(sum(CAST(w_fp AS DECIMAL(38,0))) OVER ()
                        AS HUGEINT) AS BIGINT) AS share_ppm
    FROM w
"""


def q_salted_join(sf_dir, n_salts: int = 8):
    """Skew-mitigating SALTED shuffle join: revenue per market segment
    via orders ⋈ customer where one hot customer key would otherwise
    pin an entire shuffle partition to one task. The probe side
    (orders) gets salt = splitmix64(o_orderkey) % S — a hot key's rows
    spread across S partitions — and the build side (customer) is
    replicated S× with salts 0..S−1 (bounded: S · |dim| rows, and the
    dim side is the SMALL side by construction). Joining on
    (key, salt) is then EXACTLY the plain key join, pinned here by the
    plain-SQL oracle and by a salted-vs-unsalted equality test. This is
    the standard hot-key fix for joins that carry row-level payloads,
    where fastagg's map-side pre-aggregation (the other skew weapon)
    does not apply. Revenue is ×100 integer cents end to end."""
    from ..functions.sketches import _splitmix64

    def _salt_orders(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "o_custkey": b["o_custkey"],
            "cents": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)),
            "salt": pa.array(
                (_splitmix64(k) % np.uint64(n_salts)).astype(np.int64)),
        })

    def _replicate_cust(b: pa.Table) -> pa.Table:
        n = b.num_rows
        idx = np.repeat(np.arange(n), n_salts)
        return pa.table({
            "c_custkey": b["c_custkey"].take(pa.array(idx)),
            "c_mktsegment": b["c_mktsegment"].take(pa.array(idx)),
            "salt": pa.array(np.tile(np.arange(n_salts, dtype=np.int64), n)),
        })

    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_totalprice"],
               target_block_mb=32, min_blocks=8).map_batches(
        _salt_orders, batch_format="pyarrow")
    cust = T(sf_dir, "customer", ["c_custkey", "c_mktsegment"],
             target_block_mb=32, min_blocks=4).map_batches(
        _replicate_cust, batch_format="pyarrow")
    j = orders.join(cust, "inner", num_partitions=JOIN_PARTS,
                    on=("o_custkey", "salt"),
                    right_on=("c_custkey", "salt"))
    return fast_groupby_agg(j, ["c_mktsegment"], {
        "revenue_c": ("cents", "sum"),
        "n_orders": (None, "count"),
    })


ORACLES["salted_join"] = """
    SELECT c_mktsegment,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_c,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


def q_partition_prune_read(sf_dir):
    """Path-level partition pruning: events written ONCE as
    hive-partitioned Parquet (one directory per event_type — the
    resumable layout), then a reader that needs only two types reads
    ONLY those two partition DIRECTORIES — no other partition's files
    are listed, opened, or filtered (directory pruning is a stronger
    guarantee than row-group zone-map pruning, which still lists every
    file: see q_zone_map_pruning for that tier). The in-query audit
    asserts every input file of the pruned read lives under the two
    selected dirs; the oracle recomputes the per-type monthly counts
    from the source table, value-checking the sink → pruned-read →
    aggregate path end to end."""
    import shutil

    import ray.data as rd

    root = f"/tmp/fcray_prune_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    try:
        # etype duplicates the partition column INSIDE the files: explicit
        # file-path reads (below) skip hive-partition inference, and a
        # real table layout keeps the partition key queryable either way
        T(sf_dir, "events", ["event_id", "event_type", "ts"]).map_batches(
            lambda b: pa.table({
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "etype": b["event_type"],
                "month": pc.strftime(b["ts"], format="%Y-%m"),
            }),
            batch_format="pyarrow",
        ).write_parquet(root, partition_cols=["event_type"])

        want = ["click", "purchase"]
        # ray 2.49 read_parquet expands ONE root dir but not a LIST of
        # dirs — list the partition files explicitly (this is also what
        # a manifest-driven reader would do)
        paths = sorted(
            f"{root}/event_type={t}/{f}" for t in want
            if os.path.isdir(f"{root}/event_type={t}")
            for f in os.listdir(f"{root}/event_type={t}")
            if f.endswith(".parquet"))
        back = rd.read_parquet(paths)
        files = back.input_files()
        assert files and all(
            any(f"/event_type={t}/" in f or f.rsplit("/", 2)[-2] ==
                f"event_type={t}" for t in want) for f in files), \
            f"pruned read touched a foreign partition: {files[:3]}"
        got = fast_groupby_agg(back, ["etype", "month"],
                               {"n": (None, "count")})
        return got.map_batches(
            lambda b: pa.table({
                "event_type": pc.cast(b["etype"], pa.string()),
                "month": pc.cast(b["month"], pa.string()),
                "n": b["n"],
            }),
            batch_format="pyarrow",
        ).to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLES["partition_prune_read"] = """
    SELECT event_type, strftime(ts, '%Y-%m') AS month, count(*) AS n
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type, month
"""


# Poisson(1) inverse-CDF thresholds at 8-bit resolution:
# floor(256 · P[X ≤ k]) for k = 0..4 — a row's bootstrap weight in
# replicate b is the count of thresholds ≤ its b-th md5 digest byte.
# Shared integer literals, so engine and oracle CANNOT diverge (and the
# transcendental e^-1 is evaluated exactly once, at import, per the
# decayed_counts policy).
_POIS1_TH = [int(math.floor(256 * sum(math.exp(-1) / math.factorial(i)
                                      for i in range(k + 1))))
             for k in range(5)]
_BOOTSTRAP_B = 16


def q_bootstrap_ci(sf_dir):
    """Poisson bootstrap of the mean order price — THE resampling
    technique for data too large to multinomial-resample (each row
    contributes an independent Poisson(1) weight per replicate, so a
    replicate needs one streaming pass, no global coordination; see
    Chamandy et al., "Estimating uncertainty for massive data streams").
    Deterministic: replicate b's weight is the inverse-CDF bucket of
    the b-th BYTE of md5(o_orderkey) — one digest per row serves all
    16 replicates, weights are small ints, and every aggregate is
    integer (Σw, Σw·cents; the replicate mean is an exact ×1e6 integer
    floor division). Plan: per-batch 16-row partials (b, Σw, Σw·cents)
    → map-side-combined groupby → 16-row driver finale. The replicate
    means' spread IS the sampling-uncertainty estimate; min/max/etc.
    are left to the reader since all 16 means are returned."""
    th = np.asarray(_POIS1_TH, dtype=np.uint8)
    B = _BOOTSTRAP_B

    def _partials(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].to_pylist()
        cents = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dig = b"".join(hashlib.md5(str(k).encode()).digest() for k in keys)
        v = np.frombuffer(dig, dtype=np.uint8).reshape(len(keys), 16)
        reps, n_effs, wsums = [], [], []
        for rb in range(B):
            w = np.searchsorted(th, v[:, rb], side="right").astype(np.int64)
            reps.append(rb)
            n_effs.append(int(w.sum()))
            wsums.append(int((w * cents).sum()))
        return pa.table({
            "replicate": pa.array(reps, pa.int64()),
            "n_eff": pa.array(n_effs, pa.int64()),
            "wsum": pa.array(wsums, pa.int64()),
        })

    agg = fast_groupby_agg(
        T(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
            _partials, batch_format="pyarrow"),
        ["replicate"], {"n_eff": ("n_eff", "sum"), "wsum": ("wsum", "sum")})
    pdf = agg.to_pandas()  # B rows
    mean_fp = [int(w) * 1_000_000 // max(int(n), 1)
               for w, n in zip(pdf["wsum"], pdf["n_eff"])]
    return pa.table({
        "replicate": pa.array(pdf["replicate"].to_numpy().astype(np.int64)),
        "n_eff": pa.array(pdf["n_eff"].to_numpy().astype(np.int64)),
        "wsum": pa.array(pdf["wsum"].to_numpy().astype(np.int64)),
        "mean_fp": pa.array(np.array(mean_fp, dtype=np.int64)),
    })


def _bootstrap_ci_oracle() -> str:
    w_cases = "\n            + ".join(
        f"CASE WHEN v >= {t} THEN 1 ELSE 0 END" for t in _POIS1_TH)
    return f"""
    WITH m AS (
        SELECT md5(CAST(o_orderkey AS VARCHAR)) AS h,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    r AS (SELECT unnest(generate_series(0, {_BOOTSTRAP_B - 1})) AS b),
    x AS (
        SELECT r.b,
               CAST(('0x' || substr(m.h, 2 * r.b + 1, 2)) AS INTEGER) AS v,
               m.cents
        FROM m CROSS JOIN r
    ),
    w AS (
        SELECT b, cents,
               ({w_cases}) AS wt
        FROM x
    ),
    a AS (
        SELECT b AS replicate,
               CAST(sum(wt) AS BIGINT) AS n_eff,
               CAST(sum(CAST(wt AS HUGEINT) * cents) AS DECIMAL(38,0)) AS ws
        FROM w GROUP BY b
    )
    SELECT replicate, n_eff, CAST(ws AS BIGINT) AS wsum,
           CAST(CAST(ws AS HUGEINT) * 1000000
                // GREATEST(CAST(n_eff AS HUGEINT), 1) AS BIGINT) AS mean_fp
    FROM a
    """


ORACLES["bootstrap_ci"] = _bootstrap_ci_oracle()


def q_t_closeness(sf_dir, t_fp: int = 200_000):
    """t-closeness audit — the third leg of the privacy-governance trio
    (k_anonymity: group size; l_diversity: distinct sensitive values;
    here: the DISTRIBUTION of the sensitive attribute inside each
    quasi-identifier group must stay within distance t of the global
    one, or the group leaks the attribute by association). Sensitive =
    o_orderstatus (3-value domain), QI = priority × order month (the
    l_diversity key). Distance = total variation, computed EXACTLY in
    integers: tvd = Σ_s |n_gs·N − N_s·n_g| / (2·n_g·N), emitted ×10⁶ by
    one floor division (every |·| term is a product of counts — no
    floats anywhere). Plan: the kendall_tau tiny-domain contingency
    fold — each batch emits per-QI one-hot partial sums, ONE map-side-
    combined groupby (QI-domain-sized exchange), a 3-integer global
    fold broadcast back as Python scalars, and a vectorized finale.
    Products are ≤ max_group·N; at true 100-TB counts route them
    through Python ints / DECIMAL(38) like hhi_concentration — the SQL
    side already does (count() sums are HUGEINT)."""
    ds = T(sf_dir, "orders",
           ["o_orderpriority", "o_orderdate", "o_orderstatus"])

    def _fold(b: pa.Table) -> pa.Table:
        s = b["o_orderstatus"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "omonth": pa.array(_yyyymm_from_ns(_ts_ns(b["o_orderdate"])),
                               pa.int64()),
            "f": pa.array((s == "F").astype(np.int64)),
            "o": pa.array((s == "O").astype(np.int64)),
            "p": pa.array((s == "P").astype(np.int64)),
        })

    g = fast_groupby_agg(
        ds.map_batches(_fold, batch_format="pyarrow"),
        ["o_orderpriority", "omonth"],
        {"nf": ("f", "sum"), "no": ("o", "sum"), "np": ("p", "sum"),
         "n_rows": (None, "count")}).to_pandas()
    # global sensitive-value counts: 3 integers (domain-sized, not
    # data-sized — the one driver-side fold this audit needs)
    tf, to, tp = (int(g["nf"].sum()), int(g["no"].sum()),
                  int(g["np"].sum()))
    tn = tf + to + tp
    nf = g["nf"].to_numpy(np.int64)
    no = g["no"].to_numpy(np.int64)
    npp = g["np"].to_numpy(np.int64)
    ng = g["n_rows"].to_numpy(np.int64)
    raw = (np.abs(nf * tn - tf * ng) + np.abs(no * tn - to * ng)
           + np.abs(npp * tn - tp * ng))
    tvd = 1_000_000 * raw // (2 * ng * tn)
    return pd.DataFrame({
        "o_orderpriority": g["o_orderpriority"],
        "omonth": g["omonth"].astype(np.int64),
        "n_rows": ng,
        "tvd_fp": tvd,
        "breach": tvd > t_fp,
    })


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
    seconds) — the duration round(value·10⁶) µs is STRICTLY positive
    (a zero-length interval satisfies its own start ≥ end and traps
    the oracle's LATERAL chain in a self-loop; with dur > 0 the kept
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
        dur = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        assert (dur > 0).all(), "zero-length interval"
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
               epoch_us(ts) + CAST(round(value * 1000000) AS BIGINT)
                   AS en
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


# ==================================================== int8 quantization


def q_int8_quant_audit(sf_dir):
    """Symmetric per-dimension int8 scalar quantization of the
    embedding table with EXACT error accounting — the storage-shrink
    step (4 B → 1 B per value) every billion-vector ANN deployment
    takes before IVF/PQ, audited: per vector, the L∞ and L1
    reconstruction error in the common 127·10⁶ fixed-point domain
    (err = |127·x_fp − q·m_dim|, all integer, so the oracle comparison
    is bitwise). q = ⌊(254·x_fp + m)/(2·m)⌋ — rounding mirrored to
    DuckDB's floor-corrected ``//`` — is clamped by construction to
    [−127, 127] (asserted in-kernel).

    Scale plan: pass 1 folds per-DIMENSION |x_fp| maxima map-side (d
    rows per block, one d-sized groupby — d is the model dim, a
    constant); the d scale ints broadcast by closure; pass 2 is one
    shuffle-free zero-copy list kernel (values buffer → numpy, reduceat
    per vector). Nothing vector-count-sized ever moves or lands on the
    driver beyond the result itself."""
    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _flat(b: pa.Table):
        col = b["embedding"]
        la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        flat = la.values.to_numpy(zero_copy_only=False).astype(np.float64)
        offs = la.offsets.to_numpy().astype(np.int64)
        return flat, offs

    def _dim_max(b: pa.Table) -> pa.Table:
        flat, offs = _flat(b)
        lens = np.diff(offs)
        if len(lens) == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        d = int(lens[0])
        assert (lens == d).all(), "ragged embedding dims"
        xfp = _round_half_away(flat * 1e6).astype(np.int64)
        mx = np.abs(xfp).reshape(-1, d).max(axis=0)
        return pa.table({"dim": pa.array(np.arange(d), pa.int64()),
                         "mx": pa.array(mx, pa.int64())})

    scales = fast_groupby_agg(
        emb.map_batches(_dim_max, batch_format="pyarrow"),
        ["dim"], {"mx": ("mx", "max")}).to_pandas().sort_values("dim")
    m = scales["mx"].to_numpy(np.int64)  # d ints — broadcast by closure

    def _audit(b: pa.Table) -> pa.Table:
        flat, offs = _flat(b)
        lens = np.diff(offs)
        d = len(m)
        xfp = _round_half_away(flat * 1e6).astype(np.int64).reshape(-1, d)
        mm = np.broadcast_to(m, xfp.shape)
        q = np.where(mm == 0, 0, (254 * xfp + mm) // (2 * np.maximum(mm, 1)))
        assert (np.abs(q) <= 127).all(), "int8 clamp violated"
        err = np.abs(127 * xfp - q * mm)
        return pa.table({
            "vec_id": b["vec_id"],
            "n_dims": pa.array(lens, pa.int64()),
            "max_err": pa.array(err.max(axis=1), pa.int64()),
            "sum_err": pa.array(err.sum(axis=1), pa.int64())})

    return emb.map_batches(_audit, batch_format="pyarrow")


ORACLES["int8_quant_audit"] = """
    WITH el AS (
        SELECT vec_id, gs - 1 AS dim,
               CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                    AS BIGINT) AS xfp
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(gs)),
    m AS (SELECT dim, max(abs(xfp)) AS mx FROM el GROUP BY dim),
    q AS (SELECT e.vec_id, e.xfp, m.mx,
                 CASE WHEN m.mx = 0 THEN 0
                      ELSE (254 * e.xfp + m.mx) // (2 * m.mx)
                           - CASE WHEN (254 * e.xfp + m.mx)
                                       % (2 * m.mx) <> 0
                                       AND (254 * e.xfp + m.mx) < 0
                                  THEN 1 ELSE 0 END
                 END AS qv
          FROM el e JOIN m ON m.dim = e.dim)
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_dims,
           CAST(max(abs(127 * xfp - qv * mx)) AS BIGINT) AS max_err,
           CAST(sum(abs(127 * xfp - qv * mx)) AS BIGINT) AS sum_err
    FROM q GROUP BY vec_id
"""


# ====================================================== skip-gram pairs


SKIPGRAM_WINDOW = 2


def q_skipgram_pairs(sf_dir, window: int = SKIPGRAM_WINDOW):
    """Skip-gram (center, context) pair counts over the deterministic
    random-walk corpus — the word2vec/DeepWalk TRAINING-PAIR generator
    (Perozzi et al., KDD'14 feed walks into skip-gram): for every walk,
    every ordered pair of nodes at step distance 1..``window`` emits
    one (center, context) example; the output is the aggregated pair
    multiset the embedding trainer consumes. Composes
    q_graph_random_walks (exact corpus) with one walk-keyed self-join —
    and the oracle composes the SAME unrolled-CTE walk SQL, so the
    pair table is bitwise-checked end to end.

    Scale plan: walks are (starts × steps)-sized, the self-join is
    hash-partitioned on walk_id with per-walk fan-out ≤ (L+1)·2w — a
    constant — and the final count groupby is pair-vocabulary-sized."""
    walks = q_graph_random_walks(sf_dir).materialize()
    right = walks.map_batches(
        lambda b: b.rename_columns(["wid_r", "step_r", "ctx"]),
        batch_format="pyarrow")
    j = walks.join(right, "inner", num_partitions=JOIN_PARTS,
                   on=("walk_id",), right_on=("wid_r",))

    def _pairs(b: pa.Table) -> pa.Table:
        s = b["step"].to_numpy(zero_copy_only=False)
        t = b["step_r"].to_numpy(zero_copy_only=False)
        d = np.abs(s - t)
        keep = (d >= 1) & (d <= window)
        return pa.table({
            "center": pa.array(
                b["node"].to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "context": pa.array(
                b["ctx"].to_numpy(zero_copy_only=False)[keep],
                pa.int64())})

    pairs = j.map_batches(_pairs, batch_format="pyarrow")
    return fast_groupby_agg(pairs, ["center", "context"],
                            {"n_pairs": (None, "count")})


def _skipgram_oracle() -> str:
    walks_sql = ORACLES["graph_random_walks"].strip()
    return f"""
    WITH walks AS ({walks_sql})
    SELECT a.node AS center, b.node AS context,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM walks a JOIN walks b
      ON a.walk_id = b.walk_id
     AND abs(a.step - b.step) BETWEEN 1 AND {SKIPGRAM_WINDOW}
    GROUP BY a.node, b.node
"""


ORACLES["skipgram_pairs"] = _skipgram_oracle()


# ==================================================== permutation test


PERM_TEST_BITS = 60


def q_permutation_test(sf_dir, n_perms: int = PERM_TEST_BITS):
    """EXACT distributed permutation test for the click-vs-rest mean
    difference of event value — the assumption-free significance test
    (Fisher 1935) made shuffle-free and bit-deterministic: ONE
    md5₆₀(event_id) per row supplies all ``n_perms`` random reassignments
    at once (bit p of the hash = row's group under permutation p), so
    the whole test is a constant-width map-side fold. Extremeness is
    decided WITHOUT division: |mean diff| comparisons cross-multiply to
    |D_p|·n_o·(n−n_o) ≥ |D_o|·n_p·(n−n_p) with D = S_g(n−n_g) −
    (S−S_g)·n_g, evaluated in arbitrary-precision Python ints (the
    oracle uses HUGEINT) — no float ever enters. Output: group sizes
    and the p-value as an integer fraction p_num/p_den.

    Scale plan: each batch folds to n_perms (S_p, n_p) partials plus
    the observed totals — a ~120-int exchange per block regardless of
    corpus size; the comparison runs once on the driver over those
    ~120 ints. Degenerate permutations (empty side) are excluded from
    p_den on both engines."""
    ev = T(sf_dir, "events", ["event_id", "event_type", "value"])

    def _fold(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False)
        vf = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        g = pc.equal(b["event_type"], "click").to_numpy(
            zero_copy_only=False)
        h = np.fromiter(
            (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:15], 16)
             for i in ids), dtype=np.int64, count=len(ids))
        bits = (h[:, None] >> np.arange(n_perms)) & 1  # (rows, perms)
        sp = (vf[:, None] * bits).sum(axis=0)
        npv = bits.sum(axis=0)
        p = np.arange(n_perms, dtype=np.int64)
        return pa.table({
            "p": pa.array(np.concatenate([p, [-1], [-2]]), pa.int64()),
            "s": pa.array(np.concatenate(
                [sp, [int(vf.sum())], [int(vf[g].sum())]]), pa.int64()),
            "c": pa.array(np.concatenate(
                [npv, [len(vf)], [int(g.sum())]]), pa.int64())})

    agg = fast_groupby_agg(
        ev.map_batches(_fold, batch_format="pyarrow"),
        ["p"], {"s": ("s", "sum"), "c": ("c", "sum")}) \
        .to_pandas().set_index("p")
    s, n = int(agg.loc[-1, "s"]), int(agg.loc[-1, "c"])
    s1, n1 = int(agg.loc[-2, "s"]), int(agg.loc[-2, "c"])
    d_obs = abs(s1 * (n - n1) - (s - s1) * n1)
    q_obs = n1 * (n - n1)
    p_num = p_den = 0
    for p in range(n_perms):
        sp, npv = int(agg.loc[p, "s"]), int(agg.loc[p, "c"])
        if npv == 0 or npv == n:
            continue
        p_den += 1
        dp = abs(sp * (n - npv) - (s - sp) * npv)
        if dp * q_obs >= d_obs * (npv * (n - npv)):
            p_num += 1
    return pd.DataFrame({
        "n": [np.int64(n)], "n1_obs": [np.int64(n1)],
        "p_num": [np.int64(p_num)], "p_den": [np.int64(p_den)]})


ORACLES["permutation_test"] = f"""
    WITH v AS (
        SELECT CAST(round(value * 1000000) AS BIGINT) AS vf,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
               CAST(concat('0x', substr(md5(
                   CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events),
    tot AS (SELECT sum(vf) AS s, count(*) AS n,
                   sum(vf * g) AS s1, sum(g) AS n1 FROM v),
    perm AS (
        SELECT p,
               sum(CASE WHEN (h >> p) & 1 = 1 THEN vf ELSE 0 END) AS sp,
               sum(CASE WHEN (h >> p) & 1 = 1 THEN 1 ELSE 0 END) AS np
        FROM v, unnest(generate_series(0, {PERM_TEST_BITS - 1})) AS t(p)
        GROUP BY p),
    cmp AS (
        SELECT count(*) AS den,
               sum(CASE WHEN
                   abs(CAST(sp AS HUGEINT) * (n - np)
                       - (CAST(s AS HUGEINT) - sp) * np)
                   * (CAST(n1 AS HUGEINT) * (n - n1))
                   >= abs(CAST(s1 AS HUGEINT) * (n - n1)
                          - (CAST(s AS HUGEINT) - s1) * n1)
                      * (CAST(np AS HUGEINT) * (n - np))
                   THEN 1 ELSE 0 END) AS num
        FROM perm, tot WHERE np > 0 AND np < n)
    SELECT CAST(n AS BIGINT) AS n, CAST(n1 AS BIGINT) AS n1_obs,
           CAST(num AS BIGINT) AS p_num, CAST(den AS BIGINT) AS p_den
    FROM tot, cmp
"""


# ======================================================== KMV sketch


KMV_K = 8


def q_kmv_distinct(sf_dir, k: int = KMV_K):
    """K-minimum-values distinct sketch per event_type (Bar-Yossef et
    al. 2002): over md5₆₀ hashes of the member ids, keep the k smallest
    DISTINCT hash values; estimate = (k−1)·2⁶⁰ // h_(k). Unlike the HLL
    pair (rows-only, asserted error bands), KMV is a pure function of
    the md5 convention both engines state verbatim — so this sketch has
    an EXACT oracle: the driver gate certifies the estimator itself,
    including its per-group error in integer permille. Groups with
    fewer than k distinct members are excluded on both sides (the
    sketch is undefined there).

    Scale plan: per-batch partials keep each group's k smallest
    distinct hashes (np.unique + partition — the union of per-batch
    k-mins contains the global k-mins, the standard KMV merge); the
    exchange is ≤ k rows per (block, group); the final per-group merge
    touches ≤ k·blocks values. The exact side reuses the distinct-count
    fold for the err column."""
    ev = T(sf_dir, "events", ["event_type", "user_id"])

    def _partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        types, hvs = [], []
        for et, g in df.groupby("event_type", sort=False):
            u = np.unique(g["user_id"].to_numpy(np.int64))
            h = np.fromiter(
                (int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15],
                     16) for x in u), dtype=np.int64, count=len(u))
            h = np.unique(h)
            kk = h[:k] if len(h) <= k else np.partition(h, k - 1)[:k]
            types.extend([et] * len(kk))
            hvs.extend(kk.tolist())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "hv": pa.array(hvs, pa.int64())})

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(g["hv"].to_numpy(np.int64))
        if len(h) < k:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "hk": pd.Series([], dtype="int64")})
        hk = int(np.sort(h)[k - 1])
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "hk": [np.int64(hk)]})

    sk = ev.map_batches(_partial, batch_format="pyarrow") \
        .groupby("event_type").map_groups(_merge, batch_format="pandas") \
        .to_pandas()
    exact = q_grouped_distinct_count(sf_dir).to_pandas()
    out = sk.merge(exact, on="event_type").sort_values("event_type")
    est = [(k - 1) * (1 << 60) // int(h) for h in out["hk"]]
    ex = out["n_users"].astype(int).tolist()
    return pd.DataFrame({
        "event_type": out["event_type"].to_numpy(),
        "hk": out["hk"].astype(np.int64),
        "est": np.array(est, dtype=np.int64),
        "n_exact": np.array(ex, dtype=np.int64),
        "err_pm": np.array([abs(e - x) * 1000 // x
                            for e, x in zip(est, ex)], dtype=np.int64)})


ORACLES["kmv_distinct"] = f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(concat('0x', substr(md5(
                   CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        FROM events),
    r AS (SELECT event_type, hv, row_number() OVER (
              PARTITION BY event_type ORDER BY hv) AS rn FROM h),
    kk AS (SELECT event_type, hv AS hk FROM r WHERE rn = {KMV_K}),
    ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
           FROM events GROUP BY event_type),
    est AS (SELECT k.event_type, k.hk,
                   CAST({KMV_K - 1} AS HUGEINT)
                   * 1152921504606846976 // k.hk AS e,
                   ex.n_exact
            FROM kk k JOIN ex ON ex.event_type = k.event_type)
    SELECT event_type, hk, CAST(e AS BIGINT) AS est,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(abs(e - n_exact) * 1000 // n_exact AS BIGINT) AS err_pm
    FROM est
"""


# ================================================== oversample balancing


def q_oversample_balance(sf_dir):
    """Deterministic minority-class oversampling plan over the document
    language labels: every class is replicated toward the majority
    count — integer base multiplier m//n per row plus ONE md5-gated
    extra copy for the fractional remainder (row gets the extra copy
    iff h < ⌈rem·2⁶⁰/n⌉, the per-class threshold precomputed in
    arbitrary-precision ints so the vectorized compare stays int64).
    The emitted plan is the per-class before/after ledger — the exact
    multiset a balanced training epoch would materialize, reproducible
    at any cluster size because membership is a pure hash function.

    Scale plan: class counts are one tiny groupby (driver-held —
    classes are enum-sized); the multiplier pass is shuffle-free
    map_batches with the per-class thresholds shipped by closure; the
    final ledger is a class-sized groupby."""
    docs = T(sf_dir, "documents", ["doc_id", "lang"])
    counts = fast_groupby_agg(docs, ["lang"], {"n": (None, "count")}) \
        .to_pandas()
    cnt = dict(zip(counts["lang"], counts["n"].astype(int)))
    m = max(cnt.values())
    base = {la: m // n for la, n in cnt.items()}
    thr = {la: ((m % n) * (1 << 60) + n - 1) // n for la, n in cnt.items()}

    def _mult(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (int(hashlib.md5(str(int(d)).encode()).hexdigest()[:15], 16)
             for d in df["doc_id"]), dtype=np.int64, count=len(df))
        b = df["lang"].map(base).to_numpy(np.int64)
        t = df["lang"].map(thr).to_numpy(np.int64)
        return pd.DataFrame({
            "lang": df["lang"].to_numpy(),
            "mult": b + (h < t).astype(np.int64)})

    ledger = fast_groupby_agg(
        docs.map_batches(_mult, batch_format="pandas"),
        ["lang"], {"n_after": ("mult", "sum"),
                   "n_before": (None, "count")})

    def _fin(b: pa.Table) -> pa.Table:
        lang = b["lang"].to_pylist()
        return pa.table({
            "lang": b["lang"],
            "n_before": b["n_before"],
            "base_mult": pa.array([base[la] for la in lang], pa.int64()),
            "n_after": b["n_after"],
            "target": pa.array([m] * len(lang), pa.int64())})

    return ledger.map_batches(_fin, batch_format="pyarrow")


ORACLES["oversample_balance"] = """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    mx AS (SELECT max(n) AS m FROM c),
    r AS (SELECT d.lang, c.n, mx.m,
                 CAST(concat('0x', substr(md5(
                     CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
          FROM documents d JOIN c USING (lang), mx),
    q AS (SELECT lang, n, m,
                 (m // n) + CASE WHEN h <
                     (CAST(m % n AS HUGEINT) * 1152921504606846976
                      + n - 1) // n
                     THEN 1 ELSE 0 END AS mult
          FROM r)
    SELECT lang, CAST(min(n) AS BIGINT) AS n_before,
           CAST(min(m) // min(n) AS BIGINT) AS base_mult,
           CAST(sum(mult) AS BIGINT) AS n_after,
           CAST(min(m) AS BIGINT) AS target
    FROM q GROUP BY lang
"""


# ======================================================= KWIC snippets


KWIC_TERM = "merge"
KWIC_HALO = 3


def q_kwic_snippets(sf_dir, term: str = KWIC_TERM, halo: int = KWIC_HALO):
    """Keyword-in-context snippet extraction: for every document
    containing ``term``, cut the ±``halo``-token window around its
    FIRST occurrence — the retrieval-display / concordance primitive
    (and the context-window miner for term-sense datasets). Output per
    hit: the 1-based token index, the window size, and the md5
    fingerprint of the snippet text, so the oracle checks the emitted
    snippet bytes exactly.

    Scale plan: one shuffle-free map pass — split, index(), slice,
    join, hash, all within the document's own batch; the output is
    hit-sized. At 100 TB this is the same cost class as any tokenize
    pass; no exchange at all."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _kwic(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "idx": [], "n_window": [], "snippet_fp": []}
        for did, txt in zip(df["doc_id"].to_numpy(np.int64),
                            df["text"]):
            toks = txt.split(" ")
            try:
                i = toks.index(term)  # 0-based first occurrence
            except ValueError:
                continue
            win = toks[max(0, i - halo): i + halo + 1]
            snip = " ".join(win)
            rows["doc_id"].append(did)
            rows["idx"].append(i + 1)
            rows["n_window"].append(len(win))
            rows["snippet_fp"].append(
                int(hashlib.md5(snip.encode()).hexdigest()[:15], 16))
        return pd.DataFrame({
            "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
            "idx": pd.Series(rows["idx"], dtype="int64"),
            "n_window": pd.Series(rows["n_window"], dtype="int64"),
            "snippet_fp": pd.Series(rows["snippet_fp"], dtype="int64")})

    return docs.map_batches(_kwic, batch_format="pandas")


ORACLES["kwic_snippets"] = f"""
    WITH l AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    hit AS (SELECT doc_id, toks,
                   list_position(toks, '{KWIC_TERM}') AS i,
                   len(toks) AS n
            FROM l WHERE list_position(toks, '{KWIC_TERM}') > 0),
    win AS (SELECT doc_id, i,
                   toks[greatest(1, i - {KWIC_HALO})
                        : least(n, i + {KWIC_HALO})] AS w
            FROM hit)
    SELECT doc_id, CAST(i AS BIGINT) AS idx,
           CAST(len(w) AS BIGINT) AS n_window,
           CAST(concat('0x', substr(md5(
               array_to_string(w, ' ')), 1, 15)) AS BIGINT)
               AS snippet_fp
    FROM win
"""


# ==================================================== group-aware split


def q_group_aware_split(sf_dir):
    """Leakage-FREE train/val/test split: documents are assigned by the
    md5 of their exact-duplicate CLUSTER (min doc_id sharing the text
    hash), so identical texts can never straddle a split boundary — the
    fix for precisely the defect q_holdout_leakage audits (and the
    group-k-fold discipline sklearn's GroupKFold encodes). Split gate:
    first hex digit of md5(cluster) — 0–b train, c–d val, e–f test
    (12/2/2 of 16). Output: per split, document and cluster counts; the
    in-query invariant asserts every cluster lands in exactly one
    split.

    Scale plan: the cluster table is dedup_exact_text's exchange (one
    text-hash groupby carrying min doc_id); assignment is a hash join
    of docs against their cluster plus a map — no broadcast of anything
    corpus-sized; the ledger is a 3-row groupby."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "h": [hashlib.md5(t.encode()).hexdigest()
                  for t in df["text"]]})

    hashed = docs.map_batches(_hash, batch_format="pandas").materialize()
    clusters = fast_groupby_agg(hashed, ["h"],
                                {"cluster": ("doc_id", "min")})
    j = hashed.join(clusters, "inner", num_partitions=JOIN_PARTS,
                    on=("h",))

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        first = np.array([
            int(hashlib.md5(str(int(c)).encode()).hexdigest()[0], 16)
            for c in df["cluster"]])
        split = np.where(first < 12, "train",
                         np.where(first < 14, "val", "test"))
        return pd.DataFrame({
            "split": split, "cluster": df["cluster"].to_numpy(np.int64)})

    assigned = j.map_batches(_assign, batch_format="pandas") \
        .materialize()
    ledger = fast_groupby_agg(assigned, ["split"],
                              {"n_docs": (None, "count")}).to_pandas()
    ncl = fast_groupby_agg(
        fast_groupby_agg(assigned, ["split", "cluster"],
                         {"_n": (None, "count")}),
        ["split"], {"n_clusters": (None, "count")}).to_pandas()
    # invariant: no cluster appears under two splits
    total_cl = fast_groupby_agg(assigned, ["cluster"],
                                {"_n": (None, "count")}).count()
    assert int(ncl["n_clusters"].sum()) == total_cl, \
        "a duplicate cluster straddles a split boundary"
    out = ledger.merge(ncl, on="split").sort_values("split") \
        .reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_clusters"] = out["n_clusters"].astype(np.int64)
    return out


ORACLES["group_aware_split"] = """
    WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
    c AS (SELECT hh, min(doc_id) AS cluster FROM h GROUP BY hh),
    a AS (SELECT h.doc_id, c.cluster,
                 CASE WHEN CAST(concat('0x', substr(md5(
                          CAST(c.cluster AS VARCHAR)), 1, 1))
                          AS BIGINT) < 12 THEN 'train'
                      WHEN CAST(concat('0x', substr(md5(
                          CAST(c.cluster AS VARCHAR)), 1, 1))
                          AS BIGINT) < 14 THEN 'val'
                      ELSE 'test' END AS split
          FROM h JOIN c USING (hh))
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters
    FROM a GROUP BY split ORDER BY split
"""


# ============================================== labeling-function audit


# (name, trigger substring-token, vote) — deterministic keyword LFs
LF_RULES = (("lf_fast", "fast", 1),
            ("lf_slow", "slow", 0),
            ("lf_merge", "merge", 1))


def q_labeling_functions_audit(sf_dir, rules: tuple = LF_RULES):
    """Snorkel-style weak-supervision diagnostics (Ratner et al.,
    VLDB'18): three deterministic keyword labeling functions vote
    {0, 1, abstain} per document; per LF the audit reports coverage
    (votes), overlap (votes on docs where ANOTHER LF also voted) and
    conflict (votes on docs where another LF voted DIFFERENTLY) — the
    exact matrix a label-model practitioner reads before training — and
    the majority-vote label distribution (ties → abstain). All counts
    are integers over token-membership predicates, so the oracle is
    bitwise.

    Scale plan: one shuffle-free map evaluates every LF per batch
    (token-set membership on the split column); the per-LF ledger is a
    constant-width fold (rows = 3 LFs + 3 vote classes), never
    doc-sized."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _votes(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ").map(set)
        votes = np.full((len(df), len(rules)), -1, dtype=np.int64)
        for j, (_, kw, lab) in enumerate(rules):
            hit = np.fromiter((kw in s for s in toks), dtype=bool,
                              count=len(df))
            votes[hit, j] = lab
        voted = votes >= 0
        n_voted = voted.sum(axis=1)
        n_pos = (votes == 1).sum(axis=1)
        n_neg = (votes == 0).sum(axis=1)
        maj = np.where(n_pos > n_neg, 1, np.where(n_neg > n_pos, 0, -1))
        maj[n_voted == 0] = -1
        rows = []
        for j, (name, _, _) in enumerate(rules):
            v = voted[:, j]
            other = voted.copy()
            other[:, j] = False
            any_other = other.any(axis=1)
            conf = np.zeros(len(df), dtype=bool)
            for k in range(len(rules)):
                if k == j:
                    continue
                conf |= (voted[:, k] & v
                         & (votes[:, k] != votes[:, j]))
            rows.append({"lf": name,
                         "coverage": int(v.sum()),
                         "overlap": int((v & any_other).sum()),
                         "conflict": int(conf.sum())})
        for lab, nm in ((1, "vote_1"), (0, "vote_0"), (-1, "abstain")):
            rows.append({"lf": nm, "coverage": int((maj == lab).sum()),
                         "overlap": 0, "conflict": 0})
        out = pd.DataFrame(rows)
        out["coverage"] = out["coverage"].astype(np.int64)
        out["overlap"] = out["overlap"].astype(np.int64)
        out["conflict"] = out["conflict"].astype(np.int64)
        return out

    return fast_groupby_agg(
        docs.map_batches(_votes, batch_format="pandas"),
        ["lf"], {"coverage": ("coverage", "sum"),
                 "overlap": ("overlap", "sum"),
                 "conflict": ("conflict", "sum")})


ORACLES["labeling_functions_audit"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    v AS (SELECT doc_id,
                 CASE WHEN list_position(toks, 'fast') > 0
                      THEN 1 ELSE -1 END AS v1,
                 CASE WHEN list_position(toks, 'slow') > 0
                      THEN 0 ELSE -1 END AS v2,
                 CASE WHEN list_position(toks, 'merge') > 0
                      THEN 1 ELSE -1 END AS v3
          FROM t),
    m AS (SELECT doc_id, v1, v2, v3,
                 (CASE WHEN v1 = 1 THEN 1 ELSE 0 END
                  + CASE WHEN v2 = 1 THEN 1 ELSE 0 END
                  + CASE WHEN v3 = 1 THEN 1 ELSE 0 END) AS npos,
                 (CASE WHEN v1 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN v2 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN v3 = 0 THEN 1 ELSE 0 END) AS nneg
          FROM v),
    maj AS (SELECT CASE WHEN npos + nneg = 0 THEN -1
                        WHEN npos > nneg THEN 1
                        WHEN nneg > npos THEN 0
                        ELSE -1 END AS lab FROM m)
    SELECT 'lf_fast' AS lf,
           CAST(sum(CASE WHEN v1 >= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS coverage,
           CAST(sum(CASE WHEN v1 >= 0 AND (v2 >= 0 OR v3 >= 0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS overlap,
           CAST(sum(CASE WHEN v1 >= 0 AND ((v2 >= 0 AND v2 <> v1)
                         OR (v3 >= 0 AND v3 <> v1))
                    THEN 1 ELSE 0 END) AS BIGINT) AS conflict
    FROM v
    UNION ALL
    SELECT 'lf_slow',
           CAST(sum(CASE WHEN v2 >= 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN v2 >= 0 AND (v1 >= 0 OR v3 >= 0)
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN v2 >= 0 AND ((v1 >= 0 AND v1 <> v2)
                         OR (v3 >= 0 AND v3 <> v2))
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM v
    UNION ALL
    SELECT 'lf_merge',
           CAST(sum(CASE WHEN v3 >= 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN v3 >= 0 AND (v1 >= 0 OR v2 >= 0)
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN v3 >= 0 AND ((v1 >= 0 AND v1 <> v3)
                         OR (v2 >= 0 AND v2 <> v3))
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM v
    UNION ALL
    SELECT 'vote_1', CAST(sum(CASE WHEN lab = 1 THEN 1 ELSE 0 END)
                          AS BIGINT), 0, 0 FROM maj
    UNION ALL
    SELECT 'vote_0', CAST(sum(CASE WHEN lab = 0 THEN 1 ELSE 0 END)
                          AS BIGINT), 0, 0 FROM maj
    UNION ALL
    SELECT 'abstain', CAST(sum(CASE WHEN lab = -1 THEN 1 ELSE 0 END)
                           AS BIGINT), 0, 0 FROM maj
"""


# ====================================================== paired diversity


def q_paired_diversity(sf_dir):
    """Corpus diversity via HASH-PAIRED sampled pairwise Jaccard — the
    tractable stand-in for self-BLEU / all-pairs overlap (quadratic and
    impossible at 100 TB): documents are ordered by md5(doc_id) (a
    reproducible random shuffle), consecutive docs form pairs, and each
    pair's distinct-token Jaccard is emitted in ×10⁹ integer fixed
    point. n/2 pairs ≡ a uniform random pairing, so the mean is an
    unbiased diversity estimate at LINEAR cost, and the per-pair table
    (not just the mean) is the oracle-checked output.

    Scale plan: one distributed sort on the hash key; global
    row_numbers stitched from per-block counts (block-offset pattern);
    the partner join is ONE hash join on pair id; Jaccard is per-batch
    numpy/set work on pair-local data. Driver state: O(blocks) ints."""
    import ray.data as rd

    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _hk(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "hk": [hashlib.md5(str(int(d)).encode()).hexdigest()
                   for d in df["doc_id"]],
            "text": df["text"]})

    srt = docs.map_batches(_hk, batch_format="pandas") \
        .sort(["hk", "doc_id"]).materialize()
    refs = srt.to_arrow_refs()

    @ray.remote
    def _n(t: pa.Table) -> int:
        return t.num_rows

    ns = ray.get([_n.remote(r) for r in refs])
    offs = np.concatenate([[0], np.cumsum(ns)[:-1]])

    @ray.remote
    def _pairid(t: pa.Table, off: int) -> pa.Table:
        rn = np.arange(off + 1, off + 1 + t.num_rows, dtype=np.int64)
        return pa.table({
            "pid": pa.array((rn - 1) // 2, pa.int64()),
            "side": pa.array(rn % 2, pa.int64()),
            "doc_id": t["doc_id"], "text": t["text"]})

    sided = rd.from_arrow_refs(
        [_pairid.remote(r, int(offs[i])) for i, r in enumerate(refs)])
    a = sided.filter(expr="side == 1").drop_columns(["side"])
    b = sided.filter(expr="side == 0").map_batches(
        lambda t: pa.table({"pid_r": t["pid"], "doc_b": t["doc_id"],
                            "text_b": t["text"]}),
        batch_format="pyarrow")
    pairs = a.join(b, "inner", num_partitions=JOIN_PARTS,
                   on=("pid",), right_on=("pid_r",))

    def _jac(df: pd.DataFrame) -> pd.DataFrame:
        out = {"pid": [], "doc_a": [], "doc_b": [], "jac_fp": []}
        for pid, da, db, ta, tb in zip(
                df["pid"], df["doc_id"], df["doc_b"],
                df["text"], df["text_b"]):
            sa, sb = set(ta.split(" ")), set(tb.split(" "))
            inter = len(sa & sb)
            uni = len(sa | sb)
            out["pid"].append(int(pid))
            out["doc_a"].append(int(da))
            out["doc_b"].append(int(db))
            out["jac_fp"].append(inter * 10**9 // uni)
        return pd.DataFrame({k: pd.Series(v, dtype="int64")
                             for k, v in out.items()})

    return pairs.map_batches(_jac, batch_format="pandas")


ORACLES["paired_diversity"] = """
    WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk,
                      string_split(text, ' ') AS toks
               FROM documents),
    r AS (SELECT doc_id, toks,
                 row_number() OVER (ORDER BY hk, doc_id) AS rn FROM h),
    p AS (SELECT (rn - 1) // 2 AS pid, rn % 2 AS side, doc_id, toks
          FROM r)
    SELECT a.pid,
           a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(list_distinct(a.toks),
                                   list_distinct(b.toks)))
                * 1000000000
                // len(list_distinct(list_concat(a.toks, b.toks)))
                AS BIGINT) AS jac_fp
    FROM p a JOIN p b ON a.pid = b.pid AND a.side = 1 AND b.side = 0
"""


# ====================================================== k-center coreset


KCENTER_K = 8


def q_kcenter_coreset(sf_dir, k: int = KCENTER_K):
    """Greedy k-center CORESET selection over the embedding table
    (Gonzalez 1985 farthest-point traversal — the 2-approximation
    behind coreset/active-learning selection à la Sener & Savarese
    2018): seed with the min vec_id, then repeatedly pick the point
    farthest from the chosen set (ties → min id). Distances are exact
    integer squared L2 in the ×10⁶ fixed-point domain, so the greedy
    trajectory — each chosen center and its selection-time gain — is
    bit-deterministic and oracle-checked step by step (one unrolled CTE
    per round, pagerank-style).

    Scale plan: the state is ONE dataset (vec_id, embedding, dmin);
    each round is (a) a distributed top-1 (sort+limit — only one row
    reaches the driver), (b) a 64-int center broadcast by closure, and
    (c) a shuffle-free map lowering dmin. k rounds total, no joins, no
    driver materialization of anything point-sized."""
    from ray.data.aggregate import Min

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _xfp(b: pa.Table) -> np.ndarray:
        col = b["embedding"]
        la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        flat = la.values.to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // b.num_rows if b.num_rows else 0
        return _round_half_away(flat * 1e6).astype(np.int64) \
            .reshape(-1, d) if b.num_rows else np.zeros((0, 0), np.int64)

    c0 = int(emb.aggregate(Min("vec_id"))["min(vec_id)"])

    def _center_vec(ds, cid: int) -> np.ndarray:
        row = ds.filter(expr=f"vec_id == {cid}") \
            .take(1)[0]["embedding"]
        return _round_half_away(
            np.asarray(row, dtype=np.float64) * 1e6).astype(np.int64)

    cvec = _center_vec(emb, c0)

    def _init(b: pa.Table, _c=cvec) -> pa.Table:
        x = _xfp(b)
        d2 = ((x - _c) ** 2).sum(axis=1) if len(x) else \
            np.zeros(0, np.int64)
        return pa.table({"vec_id": b["vec_id"],
                         "embedding": b["embedding"],
                         "dmin": pa.array(d2, pa.int64())})

    state = emb.map_batches(_init, batch_format="pyarrow").materialize()
    rows = [(1, c0, 0)]
    for step in range(2, k + 1):
        top = state.sort(["dmin", "vec_id"],
                         descending=[True, False]).limit(1).take(1)[0]
        cid, gain = int(top["vec_id"]), int(top["dmin"])
        rows.append((step, cid, gain))
        cv = _center_vec(state, cid)

        def _lower(b: pa.Table, _c=cv) -> pa.Table:
            x = _xfp(b)
            d2 = ((x - _c) ** 2).sum(axis=1) if len(x) else \
                np.zeros(0, np.int64)
            return pa.table({
                "vec_id": b["vec_id"], "embedding": b["embedding"],
                "dmin": pa.array(np.minimum(
                    b["dmin"].to_numpy(zero_copy_only=False), d2),
                    pa.int64())})

        state = state.map_batches(_lower,
                                  batch_format="pyarrow").materialize()
    return pd.DataFrame({
        "step": pd.Series([r[0] for r in rows], dtype="int64"),
        "center_id": pd.Series([r[1] for r in rows], dtype="int64"),
        "gain_fp": pd.Series([r[2] for r in rows], dtype="int64")})


def _kcenter_oracle(k: int = KCENTER_K) -> str:
    head = """
    WITH efp AS (
        SELECT vec_id, gs AS j,
               CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                    AS BIGINT) AS xfp
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(gs)),
    c1 AS (SELECT min(vec_id) AS cid FROM embeddings),
    d1 AS (SELECT a.vec_id, sum((a.xfp - b.xfp) * (a.xfp - b.xfp)) AS d
           FROM efp a JOIN efp b
             ON b.vec_id = (SELECT cid FROM c1) AND b.j = a.j
           GROUP BY a.vec_id)"""
    body = ""
    for t in range(2, k + 1):
        body += f""",
    s{t} AS (SELECT vec_id AS cid, d AS gain FROM d{t - 1}
             ORDER BY d DESC, vec_id LIMIT 1),
    nd{t} AS (SELECT a.vec_id,
                     sum((a.xfp - b.xfp) * (a.xfp - b.xfp)) AS d
              FROM efp a JOIN efp b
                ON b.vec_id = (SELECT cid FROM s{t}) AND b.j = a.j
              GROUP BY a.vec_id),
    d{t} AS (SELECT p.vec_id, least(p.d, n.d) AS d
             FROM d{t - 1} p JOIN nd{t} n USING (vec_id))"""
    tail = """
    SELECT 1 AS step, (SELECT cid FROM c1) AS center_id,
           CAST(0 AS BIGINT) AS gain_fp"""
    for t in range(2, k + 1):
        tail += f"""
    UNION ALL SELECT {t}, (SELECT cid FROM s{t}),
           CAST((SELECT gain FROM s{t}) AS BIGINT)"""
    return head + body + tail


ORACLES["kcenter_coreset"] = _kcenter_oracle()


# ==================================================== 1-D Wasserstein


W1_BUCKET = 10  # chars per histogram bucket


def q_wasserstein_1d(sf_dir, bucket: int = W1_BUCKET):
    """Exact 1-D Wasserstein-1 (earth mover's) distance between the
    document-length distributions of the 'en' subcorpus and the rest —
    the transport-cost drift metric that complements q_ks_drift (sup of
    CDF gap) and q_psi_drift (binned likelihood): W₁ = Σ_buckets
    |CDF_a − CDF_b| · width. Computed over the COMMON integer scale
    n_a·n_b (|cum_a·n_b − cum_b·n_a| per bucket), so no probability is
    ever a float; the final value is the integer numerator plus its
    denominator — an exact rational.

    Scale plan: one map folds docs to (group, bucket) count partials —
    histogram-sized exchange; the CDF walk runs over the bucket-count-
    sized table on the driver (bounded by the value domain, not the
    corpus). At 100 TB this is the cheapest drift stat in the file."""
    docs = T(sf_dir, "documents", ["lang", "n_chars"])

    def _fold(b: pa.Table) -> pa.Table:
        grp = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
        bk = (b["n_chars"].to_numpy(zero_copy_only=False)
              // bucket).astype(np.int64)
        df = pd.DataFrame({"g": grp.astype(np.int64), "bk": bk})
        vc = df.groupby(["g", "bk"], sort=False).size().reset_index()
        return pa.table({"g": pa.array(vc["g"], pa.int64()),
                         "bk": pa.array(vc["bk"], pa.int64()),
                         "n": pa.array(vc[0], pa.int64())})

    h = fast_groupby_agg(
        docs.map_batches(_fold, batch_format="pyarrow"),
        ["g", "bk"], {"n": ("n", "sum")}).to_pandas()
    na = int(h.loc[h["g"] == 1, "n"].sum())
    nb = int(h.loc[h["g"] == 0, "n"].sum())
    bks = np.arange(int(h["bk"].max()) + 1)
    ca = np.zeros(len(bks), dtype=object)
    cb = np.zeros(len(bks), dtype=object)
    for _, r in h.iterrows():
        (ca if r["g"] == 1 else cb)[int(r["bk"])] += int(r["n"])
    cum_a = np.cumsum(ca)
    cum_b = np.cumsum(cb)
    num = int(sum(abs(int(x) * nb - int(y) * na)
                  for x, y in zip(cum_a, cum_b))) * bucket
    return pd.DataFrame({
        "n_en": [np.int64(na)], "n_rest": [np.int64(nb)],
        "w1_num": [np.int64(num)],
        "w1_den": [np.int64(na * nb)]})


ORACLES["wasserstein_1d"] = f"""
    WITH d AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g,
                      n_chars // {W1_BUCKET} AS bk
               FROM documents),
    h AS (SELECT bk,
                 sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS a,
                 sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS b
          FROM d GROUP BY bk),
    spine AS (SELECT unnest(generate_series(
                  0, (SELECT max(bk) FROM h))) AS bk),
    f AS (SELECT s.bk, coalesce(h.a, 0) AS a, coalesce(h.b, 0) AS b
          FROM spine s LEFT JOIN h ON h.bk = s.bk),
    tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM f),
    c AS (SELECT bk, sum(a) OVER (ORDER BY bk) AS ca,
                 sum(b) OVER (ORDER BY bk) AS cb FROM f)
    SELECT CAST(tot.na AS BIGINT) AS n_en,
           CAST(tot.nb AS BIGINT) AS n_rest,
           CAST((SELECT sum(abs(CAST(ca AS HUGEINT) * tot.nb
                                - CAST(cb AS HUGEINT) * tot.na))
                 FROM c) * {W1_BUCKET} AS BIGINT) AS w1_num,
           CAST(tot.na * tot.nb AS BIGINT) AS w1_den
    FROM tot
"""


# ======================================================= max drawdown


def q_max_drawdown(sf_dir):
    """Per-event-type MAXIMUM DRAWDOWN of the cumulative daily value
    series — the running peak-to-trough metric (finance risk, and the
    regression-depth statistic for any KPI time series): dd = max over
    days of (running-max of cumulative sum − cumulative sum), plus the
    day it bottoms (first such day on ties). Everything runs in ×10⁶
    integer cents of the value column, so peak/trough arithmetic is
    exact.

    Scale plan: one (type, day) fold collapses events to a
    calendar-bounded table (types × days rows); the sequential
    peak-tracking scan runs per type in a map_groups whose group size
    is the CALENDAR, not the data. The same shape as q_daily_ewma /
    q_holt_forecast."""
    ev = T(sf_dir, "events", ["event_type", "ts", "value"])

    def _fold(b: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(b["ts"], pa.date32()), pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        vf = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pylist(),
                           "d": d, "v": vf})
        g = df.groupby(["event_type", "d"], sort=False)["v"].sum() \
            .reset_index()
        return pa.table({
            "event_type": pa.array(g["event_type"], pa.string()),
            "d": pa.array(g["d"], pa.int64()),
            "v": pa.array(g["v"], pa.int64())})

    daily = fast_groupby_agg(
        ev.map_batches(_fold, batch_format="pyarrow"),
        ["event_type", "d"], {"v": ("v", "sum")})

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("d", kind="mergesort")
        cum = g["v"].to_numpy(np.int64).cumsum()
        peak = np.maximum.accumulate(cum)
        dd = peak - cum
        i = int(np.argmax(dd))  # first max on ties
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "max_dd_fp": [np.int64(dd[i])],
            "trough_day": [np.int64(g["d"].iloc[i])],
            "final_cum_fp": [np.int64(cum[-1])]})

    return daily.groupby("event_type").map_groups(
        _scan, batch_format="pandas")


ORACLES["max_drawdown"] = """
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS BIGINT) AS d,
               CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                    AS BIGINT) AS v
        FROM events GROUP BY event_type, d),
    c AS (SELECT event_type, d,
                 sum(v) OVER (PARTITION BY event_type ORDER BY d)
                     AS cum
          FROM daily),
    p AS (SELECT event_type, d, cum,
                 max(cum) OVER (PARTITION BY event_type ORDER BY d)
                     AS peak
          FROM c),
    dd AS (SELECT event_type, d, CAST(peak - cum AS BIGINT) AS dd, cum,
                  row_number() OVER (
                      PARTITION BY event_type
                      ORDER BY peak - cum DESC, d) AS rn
           FROM p),
    fin AS (SELECT event_type, CAST(max(cum) FILTER (
                WHERE d = (SELECT max(d) FROM daily dd2
                           WHERE dd2.event_type = p2.event_type))
                AS BIGINT) AS final_cum
            FROM p p2 GROUP BY event_type)
    SELECT dd.event_type, CAST(dd.dd AS BIGINT) AS max_dd_fp,
           CAST(dd.d AS BIGINT) AS trough_day,
           CAST(fin.final_cum AS BIGINT) AS final_cum_fp
    FROM dd JOIN fin ON fin.event_type = dd.event_type
    WHERE dd.rn = 1
"""


# ---------------------------------------------------------------------------
# Matching & linkage session: reciprocal best match, golden-record merge,
# Fellegi–Sunter blocked linkage, DBSCAN density profile, stable matching
# ---------------------------------------------------------------------------

def q_reciprocal_best_match(sf_dir):
    """Reciprocal best match — the mutual-argmin join used in record
    linkage and bilingual-lexicon induction: a (part, supplier) edge
    survives only if the supplier is that part's CHEAPEST source AND
    the part is that supplier's cheapest line, ties broken by the
    minimal counterpart key on both sides, over exact ×100 fixed-point
    minimum prices (both argmins rank identical integers).

    Plan: one partial-agg groupby collapses lineitem to its
    (part, supplier) min-price edge list; two mergeable grouped top-1
    passes (stages/fastagg.grouped_topk — per-block head, tree combine)
    pick each side's best edge; a hash join on the composite key keeps
    the mutual pairs. The exchange moves edge aggregates, never raw
    lineitem rows. Reference parity: generalizes the reference's
    best-candidate selection (fide_crawler.py search-result ranking)
    to a two-sided mutual criterion."""
    from ..stages.fastagg import grouped_topk

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": b["l_partkey"],
            "l_suppkey": b["l_suppkey"],
            "price_fp": pa.array(_round_half_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    ps = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_partkey", "l_suppkey", "l_extendedprice"]).map_batches(
            _fp, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], {"price_fp": ("price_fp", "min")})
    bp = grouped_topk(ps, ["l_partkey"], ["price_fp", "l_suppkey"],
                      [True, True], 1).drop_columns(["rank"])
    bs = grouped_topk(ps, ["l_suppkey"], ["price_fp", "l_partkey"],
                      [True, True], 1).drop_columns(["rank", "price_fp"])
    return bp.join(bs, "inner", num_partitions=JOIN_PARTS,
                   on=("l_partkey", "l_suppkey"))


ORACLES["reciprocal_best_match"] = """
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS price_fp
        FROM lineitem GROUP BY 1, 2),
    bp AS (
        SELECT l_partkey, l_suppkey, price_fp, row_number() OVER (
               PARTITION BY l_partkey ORDER BY price_fp, l_suppkey) AS rn
        FROM ps),
    bs AS (
        SELECT l_partkey, l_suppkey, row_number() OVER (
               PARTITION BY l_suppkey ORDER BY price_fp, l_partkey) AS rn
        FROM ps)
    SELECT bp.l_partkey, bp.l_suppkey, CAST(bp.price_fp AS BIGINT) AS price_fp
    FROM bp JOIN bs ON bp.l_partkey = bs.l_partkey
                   AND bp.l_suppkey = bs.l_suppkey
    WHERE bp.rn = 1 AND bs.rn = 1
"""


def q_golden_record(sf_dir):
    """Golden-record survivorship merge (MDM consolidation): one row
    per customer assembled from their order history under
    last-non-null-wins rules — the consolidated clerk comes from the
    newest FINALIZED order, the consolidated priority from the newest
    OPEN order (recency = (o_orderdate, o_orderkey)), plus the source
    count; customers whose history lacks a rule's evidence keep NULL
    for that attribute.

    Plan: each survivorship rule is a mergeable grouped top-1 over the
    rule's evidence subset (vectorized filter → grouped_topk on the
    int32-day + orderkey recency), left-outer-joined onto the
    per-customer count aggregate — three skinny aggregates exchange,
    the fact table never does."""
    from ..stages.fastagg import grouped_topk

    orders = T(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus",
                "o_totalprice", "o_orderpriority"])

    def _fp(t: pa.Table):
        return pa.array(_round_half_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64), pa.int64())

    base = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey"]), ["o_custkey"],
        {"n_src": (None, "count")})

    def _leg(status: str, out: str, value):
        def _f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b["o_orderstatus"], status))
            return pa.table({
                "custkey": t["o_custkey"],
                out: value(t),
                "d": t["o_orderdate"].cast(pa.int64()),  # µs since epoch
                "k": t["o_orderkey"],
            })

        top = grouped_topk(orders.map_batches(_f, batch_format="pyarrow"),
                           ["custkey"], ["d", "k"], [False, False], 1)
        return top.drop_columns(["rank", "d", "k"])

    j = base.join(
        _leg("F", "prio_final", lambda t: t["o_orderpriority"]),
        "left_outer", num_partitions=JOIN_PARTS, on=("o_custkey",),
        right_on=("custkey",))
    j = j.map_batches(
        lambda b: pa.table({
            "o_custkey": b["o_custkey"],
            "n_src": b["n_src"],
            "prio_final": b["prio_final"],
        }), batch_format="pyarrow")
    j = j.join(_leg("O", "open_price_fp", _fp), "left_outer",
               num_partitions=JOIN_PARTS, on=("o_custkey",),
               right_on=("custkey",))
    return j.map_batches(
        lambda b: pa.table({
            "custkey": b["o_custkey"],
            "n_src": b["n_src"],
            "prio_final": b["prio_final"],
            "open_price_fp": b["open_price_fp"],
        }), batch_format="pyarrow")


ORACLES["golden_record"] = """
    WITH base AS (
        SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_src
        FROM orders GROUP BY 1),
    f AS (
        SELECT o_custkey AS custkey, o_orderpriority AS prio_final,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderstatus = 'F'),
    o AS (
        SELECT o_custkey AS custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS open_price_fp,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderstatus = 'O')
    SELECT base.custkey, base.n_src, f.prio_final, o.open_price_fp
    FROM base
    LEFT JOIN f ON f.custkey = base.custkey AND f.rn = 1
    LEFT JOIN o ON o.custkey = base.custkey AND o.rn = 1
"""


# Fellegi–Sunter integer log-odds weights: quantized ln(m/u) constants
# (×1e6) for each agreement field, injected identically into the oracle.
FS_W_SIGN_A, FS_W_SIGN_D = 120_000, -80_000
FS_W_SUFFIX_A, FS_W_SUFFIX_D = 460_000, -5_000
FS_W_LENBAND_A, FS_W_LENBAND_D = 230_000, -40_000
FS_THRESHOLD = 500_000


def q_fellegi_sunter(sf_dir):
    """Fellegi–Sunter probabilistic record linkage over a blocked
    candidate space: customer and supplier records are blocked on
    nation (the classic blocking key); each candidate pair is scored
    by an agreement vector — balance-sign agreement, id-suffix
    agreement (the zero-padded name suffix, i.e. key mod 100), and
    balance-band agreement (cents shifted non-negative so floor and
    truncating division coincide across engines) — with fixed integer
    log-odds weights, keeping pairs at or above the decision
    threshold.

    Plan: ONE hash join on the blocking key (candidate volume =
    Σ_block |cust_b|·|supp_b| — the linkage-standard bound, never the
    full cross product), then purely vectorized integer scoring and
    filtering. At 100 TB the blocking key is the partitioner; a skewed
    block behaves like any hot join key (salt if needed)."""

    def _band(bal: np.ndarray) -> np.ndarray:
        # cents + 1e6 ≥ 0 for TPC-H balances (≥ −999.99), so numpy's
        # floor // equals DuckDB's truncating // — exact both sides
        cents = _round_half_away(bal * 100.0).astype(np.int64)
        return (cents + 1_000_000) // 100_000

    def _c(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": pa.array(k, pa.int64()),
            "nk": b["c_nationkey"].cast(pa.int64()),
            "c_sign": pa.array(bal >= 0.0),
            "c_suf": pa.array(k % 100, pa.int64()),
            "c_lb": pa.array(_band(bal), pa.int64()),
        })

    def _s(b: pa.Table) -> pa.Table:
        k = b["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bal = b["s_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table({
            "s_suppkey": pa.array(k, pa.int64()),
            "nk": b["s_nationkey"].cast(pa.int64()),
            "s_sign": pa.array(bal >= 0.0),
            "s_suf": pa.array(k % 100, pa.int64()),
            "s_lb": pa.array(_band(bal), pa.int64()),
        })

    j = T(sf_dir, "customer",
          ["c_custkey", "c_nationkey", "c_acctbal"]
          ).map_batches(_c, batch_format="pyarrow").join(
        T(sf_dir, "supplier",
          ["s_suppkey", "s_nationkey", "s_acctbal"]
          ).map_batches(_s, batch_format="pyarrow"),
        "inner", num_partitions=JOIN_PARTS, on=("nk",))

    def _score(b: pa.Table) -> pa.Table:
        def col(n):
            return b[n].to_numpy(zero_copy_only=False)

        sc = (np.where(col("c_sign") == col("s_sign"),
                       FS_W_SIGN_A, FS_W_SIGN_D)
              + np.where(col("c_suf") == col("s_suf"),
                         FS_W_SUFFIX_A, FS_W_SUFFIX_D)
              + np.where(col("c_lb") == col("s_lb"),
                         FS_W_LENBAND_A, FS_W_LENBAND_D)).astype(np.int64)
        m = sc >= FS_THRESHOLD
        return pa.table({
            "c_custkey": pa.array(col("c_custkey")[m], pa.int64()),
            "s_suppkey": pa.array(col("s_suppkey")[m], pa.int64()),
            "score": pa.array(sc[m], pa.int64()),
        })

    return j.map_batches(_score, batch_format="pyarrow")


ORACLES["fellegi_sunter"] = f"""
    SELECT c_custkey, s_suppkey, CAST(score AS BIGINT) AS score FROM (
        SELECT c_custkey, s_suppkey,
               CASE WHEN (c_acctbal >= 0) = (s_acctbal >= 0)
                    THEN {FS_W_SIGN_A} ELSE {FS_W_SIGN_D} END
             + CASE WHEN c_custkey % 100 = s_suppkey % 100
                    THEN {FS_W_SUFFIX_A} ELSE {FS_W_SUFFIX_D} END
             + CASE WHEN (CAST(round(c_acctbal * 100) AS BIGINT)
                          + 1000000) // 100000
                        = (CAST(round(s_acctbal * 100) AS BIGINT)
                           + 1000000) // 100000
                    THEN {FS_W_LENBAND_A} ELSE {FS_W_LENBAND_D} END AS score
        FROM customer JOIN supplier ON c_nationkey = s_nationkey)
    WHERE score >= {FS_THRESHOLD}
"""


DBSCAN_EPS = 2_000    # range radius on the GEO_DOMAIN² point grid
DBSCAN_MINPTS = 3     # core point = ≥3 other points within eps


def q_dbscan_core(sf_dir):
    """DBSCAN density profile — the grid-bucketed range COUNT that
    underlies density clustering (vs spatial_grid_nn's argmin): each
    customer point (same deterministic multiplicative-hash coordinates
    as spatial_grid_nn) counts the OTHER points within eps and flags
    cores (≥ minpts). Cluster labels over core-core edges would reuse
    the engine's connected-components; this query certifies the
    density kernel exactly.

    Plan: the self-join bucketizes on eps-sized grid cells — build
    side keyed by its own cell, probe side flat-mapped into the 3×3
    neighborhood, ONE hash join on cell id, exact integer distance
    filter INCLUDING the self-pair (distance 0), then a
    map-side-combined per-point count minus one. Counting the
    self-pair guarantees every point (isolated ones too) survives to
    the output without a join-back. Exchange is 10×|points| skinny
    rows; no all-pairs anywhere."""
    ncells = GEO_DOMAIN // DBSCAN_EPS
    eps2 = DBSCAN_EPS * DBSCAN_EPS

    def _build(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = _geo_xy(k, 0, 0)
        return pa.table({
            "bid": pa.array(k, pa.int64()),
            "cell": pa.array(
                (x // DBSCAN_EPS) * ncells + y // DBSCAN_EPS, pa.int64()),
            "bx": pa.array(x, pa.int64()),
            "by": pa.array(y, pa.int64()),
        })

    def _probe9(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = _geo_xy(k, 0, 0)
        cx, cy = x // DBSCAN_EPS, y // DBSCAN_EPS
        ks, xs, ys, cells = [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                gx, gy = cx + dx, cy + dy
                ok = (gx >= 0) & (gx < ncells) & (gy >= 0) & (gy < ncells)
                ks.append(k[ok]); xs.append(x[ok]); ys.append(y[ok])
                cells.append(gx[ok] * ncells + gy[ok])
        return pa.table({
            "id": pa.array(np.concatenate(ks), pa.int64()),
            "cell": pa.array(np.concatenate(cells), pa.int64()),
            "px": pa.array(np.concatenate(xs), pa.int64()),
            "py": pa.array(np.concatenate(ys), pa.int64()),
        })

    pts = T(sf_dir, "customer", ["c_custkey"])
    j = pts.map_batches(_probe9, batch_format="pyarrow").join(
        pts.map_batches(_build, batch_format="pyarrow"),
        "inner", num_partitions=JOIN_PARTS, on=("cell",))

    def _near(b: pa.Table) -> pa.Table:
        dx = (b["px"].to_numpy(zero_copy_only=False)
              - b["bx"].to_numpy(zero_copy_only=False))
        dy = (b["py"].to_numpy(zero_copy_only=False)
              - b["by"].to_numpy(zero_copy_only=False))
        ids = b["id"].to_numpy(zero_copy_only=False)
        m = dx * dx + dy * dy <= eps2   # self-pair (d2=0) stays in
        return pa.table({"id": pa.array(ids[m], pa.int64())})

    counts = fast_groupby_agg(
        j.map_batches(_near, batch_format="pyarrow"),
        ["id"], {"n_within": (None, "count")})

    def _fin(b: pa.Table) -> pa.Table:
        n = (b["n_within"].to_numpy(zero_copy_only=False)
             .astype(np.int64) - 1)
        return pa.table({
            "custkey": b["id"],
            "n_neighbors": pa.array(n, pa.int64()),
            "is_core": pa.array(n >= DBSCAN_MINPTS),
        })

    return counts.map_batches(_fin, batch_format="pyarrow")


ORACLES["dbscan_core"] = f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               (c_custkey * 2654435761) % {GEO_DOMAIN} AS x,
               (c_custkey * 97003969) % {GEO_DOMAIN} AS y
        FROM customer)
    SELECT a.id AS custkey,
           CAST(count(b.id) AS BIGINT) AS n_neighbors,
           count(b.id) >= {DBSCAN_MINPTS} AS is_core
    FROM pts a LEFT JOIN pts b
      ON b.id <> a.id
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         <= {DBSCAN_EPS * DBSCAN_EPS}
    GROUP BY a.id
"""


SM_CAP = 2   # each supplier holds up to SM_CAP customers (hospital–residents)


def _sm_score(a: int, b: int, salt: str) -> int:
    """Deterministic md5-derived preference score (higher = preferred);
    the two sides use different salts so their lists are independent."""
    return int.from_bytes(
        hashlib.md5(f"{salt}:{a}:{b}".encode()).digest()[:8], "big")


def _gale_shapley_market(cs: list[int], ss: list[int],
                         cap: int) -> list[tuple[int, int, int]]:
    """Deferred acceptance for one market: customers propose down their
    preference lists, each supplier holds its best ≤ cap proposals
    (evicting the worst when full). Proposer-optimal outcome is unique
    and independent of proposal order. Returns (custkey, suppkey,
    cust_rank 1-based)."""
    prefs = {c: sorted(ss, key=lambda s: (-_sm_score(c, s, "c"), s))
             for c in cs}
    nxt = {c: 0 for c in cs}
    held: dict[int, list] = {s: [] for s in ss}   # ascending (score, -c)
    free = sorted(cs, reverse=True)
    while free:
        c = free.pop()
        while nxt[c] < len(prefs[c]):
            s = prefs[c][nxt[c]]
            nxt[c] += 1
            cand = (_sm_score(s, c, "s"), -c)
            h = held[s]
            if len(h) < cap:
                h.append((cand, c))
                h.sort()
                break
            if cand > h[0][0]:
                evicted = h[0][1]
                h[0] = (cand, c)
                h.sort()
                free.append(evicted)
                break
    out = []
    for s, h in held.items():
        for _, c in h:
            out.append((c, s, prefs[c].index(s) + 1))
    out.sort()
    return out


def q_stable_matching(sf_dir):
    """Gale–Shapley stable matching (hospital–residents form): within
    each nation — an independent market and the natural partitioner —
    customers propose to that nation's suppliers in preference order
    and each supplier holds its best ≤ cap proposals; preferences are
    deterministic md5-derived scores so the proposer-optimal outcome
    is reproducible. Output: (nation, custkey, suppkey, cust_rank).
    Non-SQL-expressible (iterative deferred acceptance) → rows-only
    driver check; pytest certifies the no-blocking-pair invariant and
    replays an independent brute-force GS per market.

    Plan: both sides ship as skinny role-tagged rows into ONE
    groupby(nation).map_groups; each market solves in its own task
    (markets are bounded — the deferred-acceptance loop is
    O(|C|·|S| log) per market) and markets parallelize across the
    cluster with no cross-market state."""
    cust = T(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pa.table({
            "nation": b["c_nationkey"].cast(pa.int64()),
            "key": b["c_custkey"].cast(pa.int64()),
            "role": pa.array(np.zeros(b.num_rows, np.int8)),
        }), batch_format="pyarrow")
    supp = T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: pa.table({
            "nation": b["s_nationkey"].cast(pa.int64()),
            "key": b["s_suppkey"].cast(pa.int64()),
            "role": pa.array(np.ones(b.num_rows, np.int8)),
        }), batch_format="pyarrow")

    def _market(g: pd.DataFrame) -> pd.DataFrame:
        cs = sorted(int(k) for k in g.loc[g["role"] == 0, "key"])
        ss = sorted(int(k) for k in g.loc[g["role"] == 1, "key"])
        rows = (_gale_shapley_market(cs, ss, SM_CAP)
                if cs and ss else [])
        nation = np.int64(g["nation"].iloc[0])
        return pd.DataFrame({
            "nation": np.full(len(rows), nation, np.int64),
            "custkey": np.array([r[0] for r in rows], np.int64),
            "suppkey": np.array([r[1] for r in rows], np.int64),
            "cust_rank": np.array([r[2] for r in rows], np.int64),
        })

    return cust.union(supp).groupby("nation").map_groups(
        _market, batch_format="pandas")


def q_linkage_quality(sf_dir):
    """Blocking-quality audit for the Fellegi–Sunter linkage — the two
    standard record-linkage metrics: reduction ratio (how much of the
    cross product the nation blocking prunes) and pair completeness
    (what share of ground-truth matches — id-suffix-equal pairs, the
    linkage's strongest field — survive the blocking). Both emitted as
    exact ×1e9 integer ratios.

    Plan: everything is computed from per-nation / per-suffix /
    per-(nation,suffix) COUNT aggregates — three tiny groupbys and
    joins over count tables whose size is bounded by |nations|×100
    regardless of data scale; the candidate space itself is never
    enumerated."""
    nc = fast_groupby_agg(
        T(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            lambda b: pa.table({
                "nk": b["c_nationkey"].cast(pa.int64()),
                "sfx": pa.array(
                    b["c_custkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64) % 100, pa.int64()),
            }), batch_format="pyarrow"),
        ["nk", "sfx"], {"n": (None, "count")}).materialize()
    ns = fast_groupby_agg(
        T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            lambda b: pa.table({
                "nk": b["s_nationkey"].cast(pa.int64()),
                "sfx": pa.array(
                    b["s_suppkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64) % 100, pa.int64()),
            }), batch_format="pyarrow"),
        ["nk", "sfx"], {"n": (None, "count")}).materialize()

    def _sum_prod(left, right, keys):
        la = fast_groupby_agg(left, keys, {"n": ("n", "sum")})
        ra = fast_groupby_agg(right, keys, {"m": ("n", "sum")})
        j = la.join(ra.map_batches(
            lambda b: b.rename_columns([*keys, "m"]),
            batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=tuple(keys))
        prod = j.map_batches(
            lambda b: pa.table({"p": pc.multiply(b["n"], b["m"])}),
            batch_format="pyarrow")
        s = prod.sum("p")
        return int(s) if s is not None else 0

    n_candidates = _sum_prod(nc, ns, ["nk"])
    n_truth = _sum_prod(nc, ns, ["sfx"])
    n_truth_blocked = _sum_prod(nc, ns, ["nk", "sfx"])
    n_cust = int(nc.sum("n"))
    n_supp = int(ns.sum("n"))
    cross = n_cust * n_supp
    return pd.DataFrame([{
        "n_candidates": np.int64(n_candidates),
        "n_truth": np.int64(n_truth),
        "n_truth_blocked": np.int64(n_truth_blocked),
        "reduction_ratio_fp": np.int64(
            (cross - n_candidates) * 1_000_000_000 // max(cross, 1)),
        "completeness_fp": np.int64(
            n_truth_blocked * 1_000_000_000 // max(n_truth, 1)),
    }])


ORACLES["linkage_quality"] = """
    WITH tcn AS (SELECT c_nationkey AS nk, c_custkey % 100 AS sfx,
                        count(*) AS n FROM customer GROUP BY 1, 2),
    tsn AS (SELECT s_nationkey AS nk, s_suppkey % 100 AS sfx,
                   count(*) AS n FROM supplier GROUP BY 1, 2),
    cand AS (SELECT coalesce(sum(a.n * b.n), 0) AS v
             FROM (SELECT nk, sum(n) AS n FROM tcn GROUP BY nk) a
             JOIN (SELECT nk, sum(n) AS n FROM tsn GROUP BY nk) b
               USING (nk)),
    tru AS (SELECT coalesce(sum(a.n * b.n), 0) AS v
            FROM (SELECT sfx, sum(n) AS n FROM tcn GROUP BY sfx) a
            JOIN (SELECT sfx, sum(n) AS n FROM tsn GROUP BY sfx) b
              USING (sfx)),
    tb AS (SELECT coalesce(sum(a.n * b.n), 0) AS v
           FROM tcn a JOIN tsn b USING (nk, sfx)),
    x AS (SELECT (SELECT count(*) FROM customer)
                 * (SELECT count(*) FROM supplier) AS v)
    SELECT CAST(cand.v AS BIGINT) AS n_candidates,
           CAST(tru.v AS BIGINT) AS n_truth,
           CAST(tb.v AS BIGINT) AS n_truth_blocked,
           CAST((x.v - cand.v) * 1000000000
                // (CASE WHEN x.v = 0 THEN 1 ELSE x.v END)
                AS BIGINT) AS reduction_ratio_fp,
           CAST(tb.v * 1000000000
                // (CASE WHEN tru.v = 0 THEN 1 ELSE tru.v END)
                AS BIGINT) AS completeness_fp
    FROM cand, tru, tb, x
"""


FD_ELL = 16       # Frequent-Directions sketch rows
FD_DIM = 64       # embedding dimensionality (schema contract)


def _fd_shrink(mat: np.ndarray, ell: int) -> np.ndarray:
    """One Frequent-Directions shrink (Liberty 2013): SVD, subtract the
    ℓ-th squared singular value from all of them, keep the top ℓ
    re-scaled right-singular rows. Inputs with ≤ ℓ rows pass through
    zero-padded."""
    if mat.shape[0] <= ell:
        out = np.zeros((ell, mat.shape[1]))
        out[:mat.shape[0]] = mat
        return out
    _, s, vt = np.linalg.svd(mat, full_matrices=False)
    s2 = s * s
    delta = s2[ell - 1] if s2.shape[0] >= ell else 0.0
    s_new = np.sqrt(np.maximum(s2 - delta, 0.0))
    k = min(ell, vt.shape[0])
    out = np.zeros((ell, mat.shape[1]))
    out[:k] = s_new[:k, None] * vt[:k]
    return out


def _lazy_fd_final_task():
    @ray.remote
    def _t(ell: int, d: int, *tables: pa.Table) -> pa.Table:
        tabs = live_arrow(tables)
        B = np.zeros((ell, d))
        G = np.zeros((d, d))
        n_rows = 0
        for t in tabs:
            kind = t["kind"].to_numpy(zero_copy_only=False)
            vals = t["v"].combine_chunks() if isinstance(
                t["v"], pa.ChunkedArray) else t["v"]
            rows = [np.asarray(vals[i].as_py(), dtype=np.float64)
                    for i in range(len(vals))]
            bi = np.array([rows[i] for i in np.flatnonzero(kind == 0)])
            gi = np.array([rows[i] for i in np.flatnonzero(kind == 1)])
            for i in np.flatnonzero(kind == 2):
                n_rows += int(rows[i][0])
            if len(bi):
                B = _fd_shrink(np.vstack([B, bi]), ell)
            if len(gi):
                G += gi
        err = float(np.abs(np.linalg.eigvalsh(G - B.T @ B)).max())
        bound = float(np.trace(G) / ell)
        ok = err <= bound * (1.0 + 1e-9)
        if not ok:
            raise AssertionError(
                f"FD guarantee violated: err {err} > bound {bound}")
        return pa.table({
            "n_rows": pa.array([n_rows], pa.int64()),
            "d": pa.array([d], pa.int64()),
            "ell": pa.array([ell], pa.int64()),
            "spectral_err": pa.array([err], pa.float64()),
            "bound": pa.array([bound], pa.float64()),
            "ok": pa.array([ok]),
        })

    return _t


_fd_final_task_ref = None


def q_frequent_directions(sf_dir, ell: int = FD_ELL):
    """Frequent-Directions matrix sketch (Liberty 2013; Ghashami et al.
    2016 mergeability) over the n×64 embedding matrix: a deterministic
    ℓ×d sketch B with the provable guarantee ‖AᵀA − BᵀB‖₂ ≤ ‖A‖_F²/ℓ.
    The low-rank primitive behind streaming PCA/spectral pruning at
    corpus scale.

    Plan: each block emits its own shrink (ℓ×d) plus its exact Gram
    partial (d×d) and row count — partials are constant-sized no matter
    the corpus, merged associatively in ONE small final task (FD
    sketches are fully mergeable). The query gates its own guarantee
    IN-QUERY against the exact Gram (assert, not vibes) and emits the
    audit row. Float SVD is not SQL-expressible → rows-only driver
    check; pytest replays the guarantee and mergeability on raw
    numpy."""
    global _fd_final_task_ref
    if _fd_final_task_ref is None:
        _fd_final_task_ref = _lazy_fd_final_task()
    import ray.data as rd

    def _partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        la = col.combine_chunks() if isinstance(
            col, pa.ChunkedArray) else col
        flat = la.values.to_numpy(zero_copy_only=False).astype(np.float64)
        a = flat.reshape(-1, FD_DIM)
        bi = _fd_shrink(a, ell)
        gi = a.T @ a
        kinds = np.concatenate([
            np.zeros(ell, np.int8), np.ones(FD_DIM, np.int8), [2]])
        rows = ([bi[i] for i in range(ell)]
                + [gi[i] for i in range(FD_DIM)]
                + [np.array([float(a.shape[0])])])
        return pa.table({
            "kind": pa.array(kinds, pa.int8()),
            "v": pa.array([r.tolist() for r in rows],
                          pa.list_(pa.float64())),
        })

    part = T(sf_dir, "embeddings", ["embedding"]).map_batches(
        _partial, batch_format="pyarrow").materialize()
    ref = _fd_final_task_ref.remote(ell, FD_DIM, *part.to_arrow_refs())
    return rd.from_arrow_refs([ref])


CP_ROUNDS = 4    # ≤K-edge critical path (matches the unrolled oracle)


def q_dag_critical_path(sf_dir, rounds: int = CP_ROUNDS):
    """Longest (critical) path with predecessor tracking over the
    order-derived DAG — the max-plus sibling of graph_sssp PLUS path
    reconstruction, i.e. the scheduling kernel: edges keep only
    src < dst (acyclic by construction), weights w = okey//n mod 9 + 1;
    dist_K(v) = the longest ≤K-edge path ending at v and pred(v) its
    argmax predecessor, both carried in ONE packed integer
    dist·n + pred so the per-round reduce is a single mergeable max
    (ties → larger pred, stated). Unreached nodes keep dist 0 and the
    self-pred sentinel.

    Plan per round: front ⋈ edges hash join on src → packed candidate →
    map-side-combined max per dst → union-merge max with the previous
    front. The exchange is one row per node per round; no adjacency
    ever concentrates."""
    cust = T(sf_dir, "customer", ["c_custkey"]).materialize()
    n = int(cust.count())
    orders = T(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _e(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = k % n
        m = c < dst                       # DAG by construction
        return pa.table({
            "src": pa.array(c[m], pa.int64()),
            "dst": pa.array(dst[m], pa.int64()),
            "w": pa.array(((k[m] // n) % 9 + 1), pa.int64()),
        })

    edges = orders.map_batches(_e, batch_format="pyarrow").materialize()
    front = cust.map_batches(
        lambda b: pa.table({
            "node": b["c_custkey"].cast(pa.int64()),
            "pack": b["c_custkey"].cast(pa.int64()),  # dist 0, pred=self
        }), batch_format="pyarrow").materialize()
    for _ in range(rounds):
        cand = edges.join(
            front.map_batches(
                lambda b: b.rename_columns(["src", "p0"]),
                batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=("src",))
        cand = cand.map_batches(
            lambda b: pa.table({
                "node": b["dst"],
                "pack": pa.array(
                    (b["p0"].to_numpy(zero_copy_only=False) // n
                     + b["w"].to_numpy(zero_copy_only=False)) * n
                    + b["src"].to_numpy(zero_copy_only=False),
                    pa.int64()),
            }), batch_format="pyarrow")
        front = fast_groupby_agg(front.union(cand), ["node"],
                                 {"pack": ("pack", "max")}).materialize()
    return front.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "dist": pa.array(
                b["pack"].to_numpy(zero_copy_only=False) // n, pa.int64()),
            "pred": pa.array(
                b["pack"].to_numpy(zero_copy_only=False) % n, pa.int64()),
        }), batch_format="pyarrow")


def _cp_oracle(rounds: int = CP_ROUNDS) -> str:
    base = """
    WITH nn AS (SELECT count(*) AS n FROM customer),
    e AS (
        SELECT CAST(o_custkey AS BIGINT) AS src,
               CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst,
               CAST((o_orderkey // (SELECT n FROM nn)) % 9 + 1
                    AS BIGINT) AS w
        FROM orders
        WHERE o_custkey < o_orderkey % (SELECT n FROM nn)
    ),
    d0 AS (SELECT CAST(c_custkey AS BIGINT) AS node,
                  CAST(c_custkey AS BIGINT) AS pack FROM customer)"""
    for i in range(1, rounds + 1):
        base += f""",
    c{i} AS (SELECT e.dst AS node,
                    max((d.pack // (SELECT n FROM nn) + e.w)
                        * (SELECT n FROM nn) + d.node) AS pack
             FROM d{i - 1} d JOIN e ON e.src = d.node GROUP BY e.dst),
    d{i} AS (SELECT node, CAST(max(pack) AS BIGINT) AS pack FROM
             (SELECT * FROM d{i - 1} UNION ALL SELECT * FROM c{i})
             GROUP BY node)"""
    base += f"""
    SELECT node,
           CAST(pack // (SELECT n FROM nn) AS BIGINT) AS dist,
           CAST(pack % (SELECT n FROM nn) AS BIGINT) AS pred
    FROM d{rounds}
"""
    return base


ORACLES["dag_critical_path"] = _cp_oracle()


def q_vacuum_store(sf_dir):
    """Epoch lifecycle: snapshot-expiry VACUUM on the partitioned
    store. Documents land as four append epochs, epochs ≤ 2 are folded
    into one compacted ``base=`` dir by sources/store.vacuum (the
    crash-consistent base-epoch protocol: readers use only the max
    base and skip epochs ≤ it, so every crash point is consistent and
    re-running is idempotent), then the audit row proves rows and an
    integer checksum survived and that expired epoch dirs are gone.
    A vacuum that loses or duplicates rows fails the oracle."""
    import os as _os
    import shutil
    import tempfile

    from ..sources import store as S

    out = tempfile.mkdtemp(prefix="fcray_vacuum_")
    try:
        docs = T(sf_dir, "documents", ["doc_id", "n_chars"])
        for ep in range(4):
            part = docs.map_batches(
                lambda b, _ep=ep: b.filter(pc.equal(
                    pc.bit_wise_and(b["doc_id"], 3),
                    pa.scalar(_ep, b["doc_id"].type))),
                batch_format="pyarrow")
            S.write_epoch(part, out, "docs", ep)
        S.vacuum(out, "docs", 2)
        dirs = sorted(_os.listdir(_os.path.join(out, "docs")))
        back = S.read_all(out, "docs")
        agg = back.map_batches(
            lambda b: pa.table({
                "n_rows": pa.array([len(b)], pa.int64()),
                "id_sum": pa.array(
                    [int(b["doc_id"].to_numpy(
                        zero_copy_only=False).sum())], pa.int64()),
                "chars_sum": pa.array(
                    [int(b["n_chars"].to_numpy(
                        zero_copy_only=False).sum())], pa.int64()),
            }), batch_format="pyarrow").to_pandas()
        return pd.DataFrame([{
            "n_rows": int(agg["n_rows"].sum()),
            "id_sum": int(agg["id_sum"].sum()),
            "chars_sum": int(agg["chars_sum"].sum()),
            "vacuumed": bool(
                "base=00002" in dirs
                and not any(d.startswith("epoch=0000") and
                            int(d.split("=", 1)[1]) <= 2 for d in dirs
                            if not d.endswith(".tmp"))),
        }])
    finally:
        shutil.rmtree(out, ignore_errors=True)


ORACLES["vacuum_store"] = """
    SELECT count(*) AS n_rows,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           true AS vacuumed
    FROM documents
"""


def q_dp_histogram(sf_dir):
    """ε=1 differentially-private histogram release of the event-type
    counts under the discrete-Laplace mechanism, with SEEDED noise so
    the exact mechanism — not a stub — is oracle-certified end to end:
    Z = G₁ − G₂ (difference of iid geometrics ≡ discrete Laplace),
    Gᵢ = ⌊−ln(1−uᵢ)⌋ with ln α = −ε = −1, and uᵢ the md5-60-bit uniform
    of the bucket key. Both sides evaluate the identical float64
    expression through the same libm (math.log ≡ DuckDB ln on one
    host — the grouped_entropy ulp policy). A production release would
    use an unpredictable seed and omit n_true; this query certifies
    the mechanism's plumbing and calibration.

    Plan: one enum-sized count groupby, then a pure map adds the
    per-bucket noise — nothing beyond |event types| rows ever moves."""
    import math as _m

    counts = fast_groupby_agg(
        T(sf_dir, "events", ["event_type"]),
        ["event_type"], {"n_true": (None, "count")})

    def _noise(b: pa.Table) -> pa.Table:
        def geo(tag: str, t: str) -> int:
            u = int(hashlib.md5(f"{tag}:{t}".encode())
                    .hexdigest()[:15], 16) / 2.0 ** 60
            return int(_m.floor(-_m.log(1.0 - u)))

        z = np.array([geo("dp1", t) - geo("dp2", t)
                      for t in b["event_type"].to_pylist()], np.int64)
        return pa.table({
            "event_type": b["event_type"],
            "n_true": b["n_true"],
            "n_dp": pa.array(
                b["n_true"].to_numpy(zero_copy_only=False) + z,
                pa.int64()),
        })

    return counts.map_batches(_noise, batch_format="pyarrow")


ORACLES["dp_histogram"] = """
    WITH c AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
        FROM events GROUP BY 1)
    SELECT event_type, n_true,
           CAST(n_true
                + CAST(floor(-ln(1.0
                    - CAST(CAST(('0x' || substr(md5('dp1:' || event_type),
                                                1, 15)) AS BIGINT)
                          AS DOUBLE) / 1152921504606846976.0))
                      AS BIGINT)
                - CAST(floor(-ln(1.0
                    - CAST(CAST(('0x' || substr(md5('dp2:' || event_type),
                                                1, 15)) AS BIGINT)
                          AS DOUBLE) / 1152921504606846976.0))
                      AS BIGINT)
                AS BIGINT) AS n_dp
    FROM c
"""


MERKLE_PARTS = 32   # hash partitions compared between replicas


def q_merkle_partition_diff(sf_dir):
    """Replica anti-entropy (Merkle-style partition digests): both
    copies of a table fold each hash partition to ONE order-free
    digest — the per-row md5-60 fingerprints XOR-folded, so the digest
    is mergeable map-side and insensitive to row order/blocking — and
    only digests are exchanged to find the partitions needing sync
    (Dynamo/Cassandra repair at 32 digests per table, never row
    shipping). Replica B is a deterministic mutation of A (every
    doc_id ≡ 13 mod 97 dropped, every doc_id ≡ 7 mod 101 has n_chars
    +1), so `differs` pins exactly the touched partitions.

    Plan: one scan per replica → per-block per-partition XOR partials
    (sort + reduceat, vectorized) → a partition-count-sized map_groups
    XOR fold → join of the two digest tables. XOR never overflows and
    needs no row bound, unlike a sum digest."""

    def _parts(mutate: bool):
        def _f(b: pa.Table) -> pa.Table:
            did = b["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            nch = b["n_chars"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            if mutate:
                keep = did % 97 != 13
                did, nch = did[keep], nch[keep]
                nch = nch + (did % 101 == 7)
            h = np.array([
                int(hashlib.md5(f"{d}:{c}".encode()).hexdigest()[:15], 16)
                for d, c in zip(did.tolist(), nch.tolist())], np.int64)
            part = did % MERKLE_PARTS
            o = np.argsort(part, kind="mergesort")
            part, h = part[o], h[o]
            starts = np.flatnonzero(
                np.concatenate([[True], part[1:] != part[:-1]]))
            digest = np.bitwise_xor.reduceat(h, starts) if len(h) else \
                np.array([], np.int64)
            return pa.table({
                "part": pa.array(part[starts] if len(h) else part,
                                 pa.int64()),
                "x": pa.array(digest, pa.int64()),
            })

        def _fold(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "part": [np.int64(g["part"].iloc[0])],
                "x": [np.int64(np.bitwise_xor.reduce(
                    g["x"].to_numpy()))],
            })

        return (T(sf_dir, "documents", ["doc_id", "n_chars"])
                .map_batches(_f, batch_format="pyarrow")
                .groupby("part").map_groups(_fold, batch_format="pandas"))

    a = _parts(False)
    b = _parts(True).map_batches(
        lambda t: t.rename_columns(["part", "xb"]),
        batch_format="pyarrow")
    j = a.join(b, "full_outer", num_partitions=JOIN_PARTS, on=("part",))

    def _cmp(t: pa.Table) -> pa.Table:
        xa = t["x"].to_numpy(zero_copy_only=False)
        xb = t["xb"].to_numpy(zero_copy_only=False)
        xa = np.where(pc.is_null(t["x"]).to_numpy(
            zero_copy_only=False), -1, xa).astype(np.int64)
        xb = np.where(pc.is_null(t["xb"]).to_numpy(
            zero_copy_only=False), -1, xb).astype(np.int64)
        return pa.table({
            "part": t["part"],
            "hash_a": pa.array(xa, pa.int64()),
            "hash_b": pa.array(xb, pa.int64()),
            "differs": pa.array(xa != xb),
        })

    return j.map_batches(_cmp, batch_format="pyarrow")


ORACLES["merkle_partition_diff"] = f"""
    WITH a AS (
        SELECT doc_id % {MERKLE_PARTS} AS part,
               bit_xor(CAST(('0x' || substr(
                   md5(doc_id || ':' || n_chars), 1, 15)) AS BIGINT))
                   AS x
        FROM documents GROUP BY 1),
    b AS (
        SELECT doc_id % {MERKLE_PARTS} AS part,
               bit_xor(CAST(('0x' || substr(
                   md5(doc_id || ':' ||
                       (n_chars + CASE WHEN doc_id % 101 = 7
                                       THEN 1 ELSE 0 END)), 1, 15))
                   AS BIGINT)) AS x
        FROM documents WHERE doc_id % 97 <> 13 GROUP BY 1)
    SELECT coalesce(a.part, b.part) AS part,
           CAST(coalesce(a.x, -1) AS BIGINT) AS hash_a,
           CAST(coalesce(b.x, -1) AS BIGINT) AS hash_b,
           coalesce(a.x, -1) <> coalesce(b.x, -1) AS differs
    FROM a FULL OUTER JOIN b ON a.part = b.part
"""


FH_BUCKETS = 1024   # hashing-trick feature space (2^10)


def q_feature_hashing(sf_dir):
    """Hashing-trick featurization audit — the collision accounting
    every hashed-feature pipeline (Vowpal-Wabbit-style) needs before
    committing to a bucket count: every corpus token hashes to
    md5-60(token) mod 2^10 and the audit row reports distinct
    vocabulary size, buckets used, the worst bucket's vocabulary load,
    how many tokens share a bucket, and the share of token OCCURRENCES
    landing in shared buckets (exact ×1e9 integer).

    Plan: tokenize map → (token, n) vocabulary-sized count groupby →
    pure map to (bucket, n) → bucket-sized stats groupby → constant
    fold. Nothing larger than the vocabulary ever shuffles, and the
    final exchange is ≤ 2^10 rows regardless of corpus size."""

    def _tok(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        for txt in b["text"].to_pylist():
            toks.extend(_TOKEN.findall(txt.lower()))
        return pa.table({"term": pa.array(toks, pa.string())})

    vocab = fast_groupby_agg(
        T(sf_dir, "documents", ["text"]).map_batches(
            _tok, batch_format="pyarrow"),
        ["term"], {"n": (None, "count")})

    def _bucket(b: pa.Table) -> pa.Table:
        h = np.array([
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            % FH_BUCKETS for t in b["term"].to_pylist()], np.int64)
        return pa.table({
            "bucket": pa.array(h, pa.int64()),
            "n": b["n"],
            "one": pa.array(np.ones(len(h), np.int64)),
        })

    per_bucket = fast_groupby_agg(
        vocab.map_batches(_bucket, batch_format="pyarrow"),
        ["bucket"], {"n_terms": ("one", "sum"), "mass": ("n", "sum")})

    global _fh_audit_task
    if _fh_audit_task is None:
        _fh_audit_task = _lazy_fh_audit_task()
    import ray.data as rd
    refs = per_bucket.materialize().to_arrow_refs()
    return rd.from_arrow_refs([_fh_audit_task.remote(*refs)])


def _lazy_fh_audit_task():
    @ray.remote
    def _t(*tables: pa.Table) -> pa.Table:
        live = live_arrow(tables)
        b = pa.concat_tables(live)
        nt = b["n_terms"].to_numpy(zero_copy_only=False)
        mass = b["mass"].to_numpy(zero_copy_only=False)
        shared = nt > 1
        return pa.table({
            "n_tokens": pa.array([int(nt.sum())], pa.int64()),
            "n_buckets_used": pa.array([len(nt)], pa.int64()),
            "max_bucket_load": pa.array([int(nt.max())], pa.int64()),
            "n_collided_tokens": pa.array(
                [int(nt[shared].sum())], pa.int64()),
            "collision_mass_fp": pa.array(
                [int(mass[shared].sum()) * 1_000_000_000
                 // int(mass.sum())], pa.int64()),
        })

    return _t


_fh_audit_task = None


ORACLES["feature_hashing"] = f"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(lower(text),
                                            '[^a-z0-9_]+')) AS term
        FROM documents),
    v AS (SELECT term, count(*) AS n FROM tok WHERE term <> ''
          GROUP BY term),
    b AS (SELECT CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT)
                 % {1024} AS bucket,
                 count(*) AS n_terms, sum(n) AS mass
          FROM v GROUP BY 1)
    SELECT CAST(sum(n_terms) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_buckets_used,
           CAST(max(n_terms) AS BIGINT) AS max_bucket_load,
           CAST(coalesce(sum(n_terms) FILTER (WHERE n_terms > 1), 0)
                AS BIGINT) AS n_collided_tokens,
           CAST(coalesce(sum(mass) FILTER (WHERE n_terms > 1), 0)
                * 1000000000 // sum(mass) AS BIGINT) AS collision_mass_fp
    FROM b
"""


FAIR_PRICE_THRESHOLD = 150_000.0   # "model" decision boundary (cents/100)


def q_fairness_audit(sf_dir):
    """Group-fairness audit — demographic parity and equalized odds,
    the two gates a governed scoring pipeline reports before shipping a
    model: per market segment (the protected group), the positive-
    prediction rate (parity), and the TPR/FPR of the deterministic
    "classifier" pred = (o_totalprice > threshold) against the label
    y = (o_orderstatus = 'F'), all as exact ×1e9 integer ratios.

    Plan: orders hash-join customer for the group, then ONE grouped
    fold of four conditional counts (n, y, ŷ, y∧ŷ, ¬y∧ŷ) — enum-sized
    exchange — and a pure ratio map. No floats: ratios are integer
    ×1e9 floor divisions."""
    j = T(sf_dir, "orders",
          ["o_custkey", "o_totalprice", "o_orderstatus"]).join(
        T(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))

    def _flags(b: pa.Table) -> pa.Table:
        y = (pc.equal(b["o_orderstatus"], "F")
             .to_numpy(zero_copy_only=False)).astype(np.int64)
        yh = (b["o_totalprice"].to_numpy(zero_copy_only=False)
              > FAIR_PRICE_THRESHOLD).astype(np.int64)
        return pa.table({
            "grp": b["c_mktsegment"],
            "one": pa.array(np.ones(len(y), np.int64)),
            "y": pa.array(y, pa.int64()),
            "yh": pa.array(yh, pa.int64()),
            "tp": pa.array(y * yh, pa.int64()),
            "fp": pa.array((1 - y) * yh, pa.int64()),
        })

    agg = fast_groupby_agg(
        j.map_batches(_flags, batch_format="pyarrow"), ["grp"],
        {"n": ("one", "sum"), "ny": ("y", "sum"), "nyh": ("yh", "sum"),
         "ntp": ("tp", "sum"), "nfp": ("fp", "sum")})

    def _rates(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        ny = b["ny"].to_numpy(zero_copy_only=False)
        nyh = b["nyh"].to_numpy(zero_copy_only=False)
        ntp = b["ntp"].to_numpy(zero_copy_only=False)
        nfp = b["nfp"].to_numpy(zero_copy_only=False)
        e9 = 1_000_000_000
        return pa.table({
            "grp": b["grp"],
            "n": b["n"],
            "pos_rate_fp": pa.array(nyh * e9 // n, pa.int64()),
            "base_rate_fp": pa.array(ny * e9 // n, pa.int64()),
            "tpr_fp": pa.array(ntp * e9 // np.maximum(ny, 1), pa.int64()),
            "fpr_fp": pa.array(nfp * e9 // np.maximum(n - ny, 1),
                               pa.int64()),
        })

    return agg.map_batches(_rates, batch_format="pyarrow")


ORACLES["fairness_audit"] = f"""
    WITH f AS (
        SELECT c_mktsegment AS grp,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               CASE WHEN o_totalprice > {FAIR_PRICE_THRESHOLD}
                    THEN 1 ELSE 0 END AS yh
        FROM orders JOIN customer ON o_custkey = c_custkey),
    a AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS ny,
                 CAST(sum(yh) AS BIGINT) AS nyh,
                 CAST(sum(y * yh) AS BIGINT) AS ntp,
                 CAST(sum((1 - y) * yh) AS BIGINT) AS nfp
          FROM f GROUP BY grp)
    SELECT grp, n,
           CAST(nyh * 1000000000 // n AS BIGINT) AS pos_rate_fp,
           CAST(ny * 1000000000 // n AS BIGINT) AS base_rate_fp,
           CAST(ntp * 1000000000
                // (CASE WHEN ny = 0 THEN 1 ELSE ny END)
                AS BIGINT) AS tpr_fp,
           CAST(nfp * 1000000000
                // (CASE WHEN n - ny = 0 THEN 1 ELSE n - ny END)
                AS BIGINT) AS fpr_fp
    FROM a
"""


def q_qini_uplift(sf_dir):
    """Decile uplift curve (Qini-style causal model evaluation): events
    are deterministically split into treatment (user_id even) and
    control, "scored" into 10 md5 deciles, and for every cumulative
    decile prefix (best-scored first) the treated and control response
    rates (outcome = value > 0) and their ×1e9 integer uplift are
    reported — the uplift-model acceptance artifact.

    Plan: one pass folds (decile, arm) conditional counts — a ≤20-row
    exchange — then the cumulative prefix and ratio arithmetic run on
    that constant-sized table in a single final map."""

    def _flags(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dec = np.array([
            int(hashlib.md5(f"uplift:{u}".encode()).hexdigest()[:15], 16)
            % 10 for u in uid.tolist()], np.int64)
        t = (uid % 2 == 0).astype(np.int64)
        y = (b["value"].to_numpy(zero_copy_only=False) > 0).astype(
            np.int64)
        return pa.table({
            "decile": pa.array(dec, pa.int64()),
            "one": pa.array(np.ones(len(uid), np.int64)),
            "nt": pa.array(t, pa.int64()),
            "yt": pa.array(t * y, pa.int64()),
            "nc": pa.array(1 - t, pa.int64()),
            "yc": pa.array((1 - t) * y, pa.int64()),
        })

    agg = fast_groupby_agg(
        T(sf_dir, "events", ["user_id", "value"]).map_batches(
            _flags, batch_format="pyarrow"),
        ["decile"], {"nt": ("nt", "sum"), "yt": ("yt", "sum"),
                     "nc": ("nc", "sum"), "yc": ("yc", "sum")})

    def _curve(df: pd.DataFrame) -> pd.DataFrame:
        # "best" deciles first: descending decile index = descending
        # score by construction
        df = df.sort_values("decile", ascending=False).reset_index(
            drop=True)
        e9 = 1_000_000_000
        cnt, cyt = df["nt"].cumsum(), df["yt"].cumsum()
        cnc, cyc = df["nc"].cumsum(), df["yc"].cumsum()
        return pd.DataFrame({
            "decile": df["decile"].astype(np.int64),
            "cum_nt": cnt.astype(np.int64),
            "cum_yt": cyt.astype(np.int64),
            "cum_nc": cnc.astype(np.int64),
            "cum_yc": cyc.astype(np.int64),
            "uplift_fp": (cyt * e9 // cnt.clip(lower=1)
                          - cyc * e9 // cnc.clip(lower=1)).astype(
                              np.int64),
        })

    # the ≤10-row aggregate must be ONE block: the cumulative prefix is
    # computed in a single map over it
    return agg.repartition(1).map_batches(
        _curve, batch_format="pandas", batch_size=None)


ORACLES["qini_uplift"] = """
    WITH f AS (
        SELECT CAST(('0x' || substr(md5('uplift:' || user_id), 1, 15))
                    AS BIGINT) % 10 AS decile,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
               CASE WHEN value > 0 THEN 1 ELSE 0 END AS y
        FROM events),
    a AS (SELECT decile,
                 CAST(sum(t) AS BIGINT) AS nt,
                 CAST(sum(t * y) AS BIGINT) AS yt,
                 CAST(sum(1 - t) AS BIGINT) AS nc,
                 CAST(sum((1 - t) * y) AS BIGINT) AS yc
          FROM f GROUP BY decile),
    c AS (SELECT decile,
                 CAST(sum(nt) OVER w AS BIGINT) AS cum_nt,
                 CAST(sum(yt) OVER w AS BIGINT) AS cum_yt,
                 CAST(sum(nc) OVER w AS BIGINT) AS cum_nc,
                 CAST(sum(yc) OVER w AS BIGINT) AS cum_yc
          FROM a WINDOW w AS (ORDER BY decile DESC))
    SELECT decile, cum_nt, cum_yt, cum_nc, cum_yc,
           CAST(cum_yt * 1000000000
                // (CASE WHEN cum_nt = 0 THEN 1 ELSE cum_nt END)
                - cum_yc * 1000000000
                // (CASE WHEN cum_nc = 0 THEN 1 ELSE cum_nc END)
                AS BIGINT) AS uplift_fp
    FROM c
"""


LUBY_ROUNDS = 3
# packed unique priority q = (md5-39bit) · 2^24 + node: the node id
# breaks 39-bit hash ties exactly, valid to 2^24 (16.7M) nodes — beyond
# that widen to a two-column (p, node) compare on both sides.
_LUBY_P_MOD = 549_755_813_888      # 2^39
_LUBY_PACK = 16_777_216            # 2^24

_compact_task = None


def _compact_one_block(ds):
    """Rebuild a small dataset as ONE typed arrow block via a worker
    task. Needed when a hash-join OUTPUT is reused as a JOIN SIDE: its
    empty partitions are zero-COLUMN blocks that Ray's map passes
    through untouched, and a later join then fails with 'no match for
    FieldRef' on the schema-less block. Cost: one task holding the
    whole (small) dataset — callers must bound the input (here:
    winner sets, ≤ |undecided| skinny rows)."""
    global _compact_task
    if _compact_task is None:
        import ray as _ray

        @_ray.remote
        def _t(*tables: pa.Table) -> pa.Table:
            live = live_arrow(tables)
            return pa.concat_tables(live) if live else tables[0]

        _compact_task = _t
    import ray.data as rd

    return rd.from_arrow_refs(
        [_compact_task.remote(*ds.to_arrow_refs())])


def _luby_q(nodes: np.ndarray, rnd: int) -> np.ndarray:
    return np.array([
        (int(hashlib.md5(f"mis:{rnd}:{v}".encode()).hexdigest()[:15], 16)
         % _LUBY_P_MOD) * _LUBY_PACK + int(v)
        for v in nodes.tolist()], np.int64)


def q_luby_mis(sf_dir, rounds: int = LUBY_ROUNDS):
    """Luby's maximal-independent-set — THE textbook O(log n)-round
    parallel symmetry-breaking algorithm (Luby 1986), the primitive
    under distributed coloring/matching/scheduling: each round every
    undecided node draws a fresh md5 priority and joins the MIS iff it
    beats every undecided neighbor; its neighbors drop out. After K
    rounds each node reports status (1 = in MIS, 2 = removed,
    0 = undecided — a FIXED round budget keeps the oracle expressible,
    like pagerank/sssp) and the round that decided it.

    Plan per round: fresh priorities are a pure map over the undecided
    set; the winner test is ONE hash join of the symmetric edge list
    against the undecided set + a map-side-combined grouped MAX + a
    left-outer compare; removals are one more join. Everything moves
    one row per (edge|node) per round — no adjacency concentrates
    anywhere. Invariants (independence, maximality at decided nodes)
    are pytest-pinned against a sequential replay."""
    import ray.data as rd

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

    ne = fast_groupby_agg(raw.map_batches(_norm, batch_format="pyarrow"),
                          ["u", "v"], {"c": (None, "count")})
    ed = ne.map_batches(
        lambda b: pa.table({
            "src": pa.concat_arrays([
                b["u"].combine_chunks() if isinstance(b["u"], pa.ChunkedArray) else b["u"],
                b["v"].combine_chunks() if isinstance(b["v"], pa.ChunkedArray) else b["v"]]),
            "dst": pa.concat_arrays([
                b["v"].combine_chunks() if isinstance(b["v"], pa.ChunkedArray) else b["v"],
                b["u"].combine_chunks() if isinstance(b["u"], pa.ChunkedArray) else b["u"]]),
        }), batch_format="pyarrow").materialize()

    und = T(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: pa.table({"node": b["c_custkey"].cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    decided = []
    for r in range(1, rounds + 1):
        if und.count() == 0:
            # unique priorities ⇒ a non-empty undecided set always has
            # a winner, so an exhausted set is the only early exit
            break
        uq = und.map_batches(
            lambda b, _r=r: pa.table({
                "node": b["node"],
                "q": pa.array(_luby_q(
                    b["node"].to_numpy(zero_copy_only=False), _r),
                    pa.int64()),
            }), batch_format="pyarrow").materialize()
        nb = ed.join(
            uq.map_batches(lambda b: b.rename_columns(["dst", "qd"]),
                           batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=("dst",))
        mx = fast_groupby_agg(
            nb.map_batches(lambda b: pa.table(
                {"node": b["src"], "qd": b["qd"]}),
                batch_format="pyarrow"),
            ["node"], {"mq": ("qd", "max")})
        wj = uq.join(mx, "left_outer", num_partitions=JOIN_PARTS,
                     on=("node",))
        win = _compact_one_block(wj.map_batches(
            lambda b: pa.table({"node": b["node"].filter(pc.greater(
                b["q"], pc.fill_null(b["mq"], -1)))}),
            batch_format="pyarrow")).materialize()
        decided.append(win.map_batches(
            lambda b, _r=r: pa.table({
                "node": b["node"],
                "status": pa.array(np.ones(b.num_rows, np.int64)),
                "decided_round": pa.array(
                    np.full(b.num_rows, _r, np.int64)),
            }), batch_format="pyarrow"))
        # removed = undecided neighbors of winners (dedup via groupby)
        rem = fast_groupby_agg(
            ed.join(win.map_batches(
                lambda b: b.rename_columns(["src"]),
                batch_format="pyarrow"),
                "inner", num_partitions=JOIN_PARTS, on=("src",)
            ).map_batches(lambda b: pa.table({"node": b["dst"]}),
                          batch_format="pyarrow"),
            ["node"], {"c": (None, "count")})
        # compact: rem's groupby can be schema-less when no winner has
        # an undecided neighbor (all-isolated round); win anchors the
        # schema inside the compact task
        gone = _compact_one_block(win.union(rem.map_batches(
            lambda b: pa.table({"node": b["node"]})
            if b.num_columns else b,
            batch_format="pyarrow")))
        still = und.join(gone, "left_anti", num_partitions=JOIN_PARTS,
                         on=("node",)).materialize()
        # removed ∩ undecided (rem can name already-decided nodes)
        rem_u = und.join(
            still.union(win), "left_anti",
            num_partitions=JOIN_PARTS, on=("node",))
        decided.append(rem_u.map_batches(
            lambda b, _r=r: pa.table({
                "node": b["node"],
                "status": pa.array(np.full(b.num_rows, 2, np.int64)),
                "decided_round": pa.array(
                    np.full(b.num_rows, _r, np.int64)),
            }), batch_format="pyarrow"))
        und = still
    out = und.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "status": pa.array(np.zeros(b.num_rows, np.int64)),
            "decided_round": pa.array(np.zeros(b.num_rows, np.int64)),
        }), batch_format="pyarrow")
    for d in decided:
        out = out.union(d)
    return out


def _luby_oracle(rounds: int = LUBY_ROUNDS) -> str:
    def qe(r: int) -> str:
        return (f"(CAST(('0x' || substr(md5('mis:{r}:' || node), 1, 15)) "
                f"AS BIGINT) % {_LUBY_P_MOD}) * {_LUBY_PACK} + node")

    sql = """
    WITH nn AS (SELECT count(*) AS n FROM customer),
    raw AS (SELECT CAST(o_custkey AS BIGINT) AS s,
                   CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS d
            FROM orders),
    ne AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
           FROM raw WHERE s <> d),
    ed AS (SELECT u AS src, v AS dst FROM ne
           UNION ALL SELECT v, u FROM ne),
    u0 AS (SELECT CAST(c_custkey AS BIGINT) AS node FROM customer)"""
    for r in range(1, rounds + 1):
        sql += f""",
    q{r} AS (SELECT node, {qe(r)} AS q FROM u{r - 1}),
    w{r} AS (SELECT a.node FROM q{r} a
             LEFT JOIN ed e ON e.src = a.node
             LEFT JOIN q{r} b ON b.node = e.dst
             GROUP BY a.node, a.q
             HAVING a.q > coalesce(max(b.q), -1)),
    rm{r} AS (SELECT DISTINCT e.dst AS node
              FROM w{r} w JOIN ed e ON e.src = w.node
              WHERE e.dst IN (SELECT node FROM u{r - 1})
                AND e.dst NOT IN (SELECT node FROM w{r})),
    u{r} AS (SELECT node FROM u{r - 1}
             WHERE node NOT IN (SELECT node FROM w{r})
               AND node NOT IN (SELECT node FROM rm{r}))"""
    parts = [
        f"""SELECT node, CAST(1 AS BIGINT) AS status,
               CAST({r} AS BIGINT) AS decided_round FROM w{r}
        UNION ALL
        SELECT node, CAST(2 AS BIGINT), CAST({r} AS BIGINT) FROM rm{r}"""
        for r in range(1, rounds + 1)]
    parts.append(f"SELECT node, CAST(0 AS BIGINT), CAST(0 AS BIGINT) "
                 f"FROM u{rounds}")
    sql += "\n    " + "\n    UNION ALL\n    ".join(parts)
    return sql


ORACLES["luby_mis"] = _luby_oracle()


NEG_SAMPLES_K = 2
NEG_MAX_BROADCAST_VOCAB = 2_000_000   # same guard class as TFIDF's

_neg_cum_task = None


def q_negative_sampling(sf_dir, k: int = NEG_SAMPLES_K):
    """Unigram negative sampling (the word2vec/contrastive-training
    draw) — ALL-INTEGER inverse-CDF so the exact draws are
    oracle-certified: per document, k negatives are drawn by mapping
    the md5-60 uniform u to rank r = u·N ≫ 60 (exact in arbitrary-
    precision ints / HUGEINT) and locating r in the term-ordered
    cumulative unigram table. Plain unigram (not ^0.75) keeps both
    sides in exact integers — the tempered variant would hinge on
    pow() libm parity.

    Plan: one vocabulary-sized count groupby; ONE worker task sorts it
    and builds the (term, lo) cumulative table whose ObjectRef is read
    per actor process (driver never assembles it; vocabulary guarded
    at NEG_MAX_BROADCAST_VOCAB — beyond it, switch to the interval
    hash-join plan); drawing is then a pure map with one vectorized
    searchsorted per batch."""
    global _neg_cum_task
    if _neg_cum_task is None:
        @ray.remote
        def _cum(*tables: pa.Table) -> pa.Table:
            t = pa.concat_tables(live_arrow(tables))
            df = t.to_pandas().sort_values("term").reset_index(drop=True)
            n = df["n"].to_numpy().astype(np.int64)
            lo = np.concatenate([[0], np.cumsum(n)[:-1]])
            return pa.table({
                "term": pa.array(df["term"], pa.string()),
                "lo": pa.array(lo, pa.int64()),
            })

        _neg_cum_task = _cum

    def _tok(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        for txt in b["text"].to_pylist():
            toks.extend(_TOKEN.findall(txt.lower()))
        return pa.table({"term": pa.array(toks, pa.string())})

    vocab = fast_groupby_agg(
        T(sf_dir, "documents", ["text"]).map_batches(
            _tok, batch_format="pyarrow"),
        ["term"], {"n": (None, "count")}).materialize()
    if vocab.count() > NEG_MAX_BROADCAST_VOCAB:
        raise NotImplementedError(
            "vocabulary exceeds the broadcast guard; use the interval "
            "hash-join plan (rank BETWEEN lo AND hi) at this scale")
    total = int(vocab.sum("n"))
    cum_ref = _neg_cum_task.remote(*vocab.to_arrow_refs())

    def _draw(b: pa.Table) -> pa.Table:
        cum = ray.get(cum_ref)
        lo = cum["lo"].to_numpy(zero_copy_only=False)
        terms = cum["term"].to_pylist()
        dids, js, ranks = [], [], []
        for d in b["doc_id"].to_pylist():
            for j in range(k):
                u = int(hashlib.md5(f"neg:{d}:{j}".encode())
                        .hexdigest()[:15], 16)
                dids.append(int(d))
                js.append(j)
                ranks.append((u * total) >> 60)   # exact: python ints
        idx = np.searchsorted(lo, np.array(ranks, np.int64),
                              side="right") - 1
        return pa.table({
            "doc_id": pa.array(dids, pa.int64()),
            "j": pa.array(js, pa.int64()),
            "neg_term": pa.array([terms[i] for i in idx], pa.string()),
        })

    return T(sf_dir, "documents", ["doc_id"]).map_batches(
        _draw, batch_format="pyarrow")


ORACLES["negative_sampling"] = f"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(lower(text),
                                            '[^a-z0-9_]+')) AS term
        FROM documents),
    v AS (SELECT term, count(*) AS n FROM tok WHERE term <> ''
          GROUP BY term),
    c AS (SELECT term, n,
                 coalesce(sum(n) OVER (ORDER BY term
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS lo
          FROM v),
    d AS (SELECT doc_id, j FROM documents,
          (VALUES (0), (1)) t(j)),
    r AS (SELECT doc_id, CAST(j AS BIGINT) AS j,
                 CAST(CAST(('0x' || substr(
                     md5('neg:' || doc_id || ':' || j), 1, 15))
                     AS BIGINT) AS HUGEINT)
                 * (SELECT CAST(sum(n) AS HUGEINT) FROM v)
                 // 1152921504606846976 AS rk
          FROM d)
    SELECT r.doc_id, r.j, c.term AS neg_term
    FROM r JOIN c ON r.rk >= c.lo AND r.rk < c.lo + c.n
"""


def q_delta_join_view(sf_dir):
    """Incremental view maintenance of an aggregate JOIN view (the
    delta-join algebra streaming systems run): the materialized view
    V = Γ_segment(count, Σcents)(orders ⋈ customer) is maintained from
    snapshot V₀ (orders with okey ≡ 3 mod 23 absent) by joining ONLY
    the delta — ΔV = Γ(ΔO ⋈ C), V₁ = V₀ ⊎ ΔV — and the query emits the
    maintained V₁ with a per-group `consistent` flag against the full
    recompute (both computed; a drifting maintenance fails the oracle,
    which expects all-true).

    Plan: the incremental exchange is |ΔO| join rows + two enum-sized
    aggregates; the full recompute here exists only as the in-query
    certifier. At scale the recompute is the (rare) backfill path and
    the delta join is the steady state."""
    cust = T(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def _agg(orders_ds):
        j = orders_ds.join(cust, "inner", num_partitions=JOIN_PARTS,
                           on=("o_custkey",), right_on=("c_custkey",))
        return fast_groupby_agg(
            j.map_batches(
                lambda b: pa.table({
                    "c_mktsegment": b["c_mktsegment"],
                    "one": pa.array(np.ones(b.num_rows, np.int64)),
                    "cents": pa.array(_round_half_away(
                        b["o_totalprice"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64), pa.int64()),
                }), batch_format="pyarrow"),
            ["c_mktsegment"],
            {"n_orders": ("one", "sum"), "rev_fp": ("cents", "sum")})

    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_totalprice"])

    def _split(want_delta: bool):
        def _f(b: pa.Table) -> pa.Table:
            m = (b["o_orderkey"].to_numpy(zero_copy_only=False)
                 % 23) == 3
            return b.filter(pa.array(m if want_delta else ~m))

        return orders.map_batches(_f, batch_format="pyarrow")

    v0 = _agg(_split(False))
    dv = _agg(_split(True))
    v1 = fast_groupby_agg(
        v0.union(dv), ["c_mktsegment"],
        {"n_orders": ("n_orders", "sum"), "rev_fp": ("rev_fp", "sum")})
    full = _agg(orders).map_batches(
        lambda b: b.rename_columns(["c_mktsegment", "nf", "rf"]),
        batch_format="pyarrow")
    j = v1.join(full, "full_outer", num_partitions=JOIN_PARTS,
                on=("c_mktsegment",))

    def _chk(b: pa.Table) -> pa.Table:
        n = b["n_orders"].to_numpy(zero_copy_only=False)
        r = b["rev_fp"].to_numpy(zero_copy_only=False)
        nf = b["nf"].to_numpy(zero_copy_only=False)
        rf = b["rf"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_mktsegment": b["c_mktsegment"],
            "n_orders": b["n_orders"],
            "rev_fp": b["rev_fp"],
            "consistent": pa.array((n == nf) & (r == rf)),
        })

    return j.map_batches(_chk, batch_format="pyarrow")


ORACLES["delta_join_view"] = """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS rev_fp,
           true AS consistent
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


_dd_locate_task = None
DD_ALPHA = 0.01    # DDSketch relative-accuracy target
DD_QS = (100, 500, 900, 990)   # probed quantiles, ‰


def q_ddsketch_quantiles(sf_dir, alpha: float = DD_ALPHA):
    """DDSketch (Masson et al., VLDB 2019) — the relative-error
    quantile sketch whose buckets are mergeable integer counts, the
    modern alternative to rank-error sketches for long-tailed metrics:
    order totalprice cents land in log-γ buckets (γ=(1+α)/(1−α)), the
    bucket histogram merges as a plain grouped SUM, and each probed
    quantile's estimate 2γ^b/(γ+1) carries the PROVABLE guarantee
    |est−x_q| ≤ α·x_q. The query computes the exact quantile values
    beside the sketch (value-histogram sort + cumulative rank locate)
    and asserts the guarantee IN-QUERY — float log buckets are not
    SQL-reproducible, so this is a rows-only driver row with a hard
    self-gate, the ann_ivf_recall pattern.

    Plan: one pass → per-batch bucket partials (vectorized log) →
    bucket-sized grouped sum; the exact side is a distinct-value
    histogram (≤ |distinct cents| skinny rows), one sort, and a
    cumulative locate on block-offset arithmetic."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = math.log(gamma)

    def _cents(b: pa.Table) -> pa.Table:
        return pa.table({"cents": pa.array(_round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64), pa.int64())})

    cents = T(sf_dir, "orders", ["o_totalprice"]).map_batches(
        _cents, batch_format="pyarrow")

    def _bucket(b: pa.Table) -> pa.Table:
        x = b["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        bk = np.ceil(np.log(x) / lg).astype(np.int64)
        return pa.table({"bucket": pa.array(bk, pa.int64()),
                         "one": pa.array(np.ones(len(bk), np.int64))})

    sketch = fast_groupby_agg(
        cents.map_batches(_bucket, batch_format="pyarrow"),
        ["bucket"], {"n": ("one", "sum")}).materialize()
    hist = fast_groupby_agg(cents, ["cents"],
                            {"n": (None, "count")}).materialize()
    global _dd_locate_task
    if _dd_locate_task is None:
        @ray.remote
        def _loc(gamma: float, alpha: float, qs, n_sk: int,
                 *tables: pa.Table) -> pa.Table:
            # first n_sk tables are sketch partials, rest histogram —
            # the locate runs histogram-sized in THIS task, the driver
            # only ever sees the 4 probe rows
            sk = pa.concat_tables([t for t in tables[:n_sk]
                                   if t.num_rows])
            hx = pa.concat_tables([t for t in tables[n_sk:]
                                   if t.num_rows])
            skd = sk.to_pandas().sort_values("bucket")
            hxd = hx.to_pandas().sort_values("cents")
            n_total = int(hxd["n"].sum())
            sk_cum = skd["n"].cumsum().to_numpy()
            hx_cum = hxd["n"].cumsum().to_numpy()
            rows = []
            for qm in qs:
                r = (n_total - 1) * qm // 1000 + 1   # 1-based rank
                bi = int(np.searchsorted(sk_cum, r, side="left"))
                est = (2.0 * gamma ** int(skd["bucket"].iloc[bi])
                       / (gamma + 1.0))
                xi = int(np.searchsorted(hx_cum, r, side="left"))
                exact = float(hxd["cents"].iloc[xi])
                if abs(est - exact) > alpha * exact * (1.0 + 1e-9):
                    raise AssertionError(
                        f"DDSketch guarantee violated at q={qm}: "
                        f"est {est} exact {exact}")
                rows.append((qm, est, int(exact)))
            return pa.table({
                "q_mille": pa.array([r[0] for r in rows], pa.int64()),
                "est": pa.array([r[1] for r in rows], pa.float64()),
                "exact_cents": pa.array([r[2] for r in rows],
                                        pa.int64()),
                "ok": pa.array([True] * len(rows)),
            })

        _dd_locate_task = _loc
    import ray.data as rd

    sk_refs = sketch.to_arrow_refs()
    ref = _dd_locate_task.remote(gamma, alpha, list(DD_QS),
                                 len(sk_refs), *sk_refs,
                                 *hist.to_arrow_refs())
    return rd.from_arrow_refs([ref])


KTRUSS_K = 3        # keep edges in ≥1 triangle (support ≥ k−2)
KTRUSS_ROUNDS = 3   # fixed peel rounds (matches the unrolled oracle)


def q_ktruss(sf_dir, k: int = KTRUSS_K, rounds: int = KTRUSS_ROUNDS):
    """k-truss decomposition (Cohen 2008) — the edge-cohesion sibling
    of q_graph_kcore: iteratively peel every edge in fewer than k−2
    triangles; what survives is the densest collaboration core. A
    FIXED round budget keeps the oracle expressible (pagerank/sssp/
    luby_mis policy); output is each surviving edge with its
    recomputed final support.

    Plan per round: triangle support per edge via the standard wedge
    plan — symmetric adjacency self-joined on the center, ordered pair
    filter, ONE composite-key hash join against the edge set, grouped
    count — then an edge-set filter. Wedge volume is Σ deg(c)², the
    same cost surface as q_triangle_count (its WEDGE_BUDGET note
    applies); every exchange is edge- or wedge-shaped, never
    node²-shaped. Edge sets between rounds are compacted
    (_compact_one_block) because join outputs are reused as join
    sides."""
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

    e = fast_groupby_agg(
        raw.map_batches(_norm, batch_format="pyarrow"),
        ["u", "v"], {"c": (None, "count")}).map_batches(
        lambda b: pa.table({"u": b["u"], "v": b["v"]}),
        batch_format="pyarrow").materialize()

    def _support(edges):
        ed = edges.map_batches(
            lambda b: pa.table({
                "c": pa.concat_arrays([
                    b["u"].combine_chunks() if isinstance(
                        b["u"], pa.ChunkedArray) else b["u"],
                    b["v"].combine_chunks() if isinstance(
                        b["v"], pa.ChunkedArray) else b["v"]]),
                "x": pa.concat_arrays([
                    b["v"].combine_chunks() if isinstance(
                        b["v"], pa.ChunkedArray) else b["v"],
                    b["u"].combine_chunks() if isinstance(
                        b["u"], pa.ChunkedArray) else b["u"]]),
            }), batch_format="pyarrow")
        pairs = ed.join(
            ed.map_batches(lambda b: b.rename_columns(["c", "x2"]),
                           batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=("c",))
        wedges = pairs.map_batches(
            lambda b: pa.table({
                "u": b["x"].filter(pc.less(b["x"], b["x2"])),
                "v": b["x2"].filter(pc.less(b["x"], b["x2"])),
            }), batch_format="pyarrow")
        tri = wedges.join(edges, "inner", num_partitions=JOIN_PARTS,
                          on=("u", "v"))
        return fast_groupby_agg(tri, ["u", "v"],
                                {"support": (None, "count")})

    for _ in range(rounds):
        if e.count() == 0:
            break
        sup = _support(e)
        e = _compact_one_block(
            e.join(sup, "left_outer", num_partitions=JOIN_PARTS,
                   on=("u", "v")).map_batches(
                lambda b: pa.table({
                    "u": b["u"].filter(pc.greater_equal(
                        pc.fill_null(b["support"], 0), k - 2)),
                    "v": b["v"].filter(pc.greater_equal(
                        pc.fill_null(b["support"], 0), k - 2)),
                }), batch_format="pyarrow")).materialize()
    if e.count() == 0:
        return pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "support": pa.array([], pa.int64())})
    fin = e.join(_support(e), "left_outer", num_partitions=JOIN_PARTS,
                 on=("u", "v"))
    return fin.map_batches(
        lambda b: pa.table({
            "u": b["u"], "v": b["v"],
            "support": pc.cast(pc.fill_null(b["support"], 0),
                               pa.int64()),
        }), batch_format="pyarrow")


def _ktruss_oracle(k: int = KTRUSS_K, rounds: int = KTRUSS_ROUNDS) -> str:
    sql = """
    WITH nn AS (SELECT count(*) AS n FROM customer),
    raw AS (SELECT CAST(o_custkey AS BIGINT) AS s,
                   CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS d
            FROM orders),
    e0 AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
           FROM raw WHERE s <> d)"""
    for i in range(1, rounds + 1):
        sql += f""",
    ed{i - 1} AS (SELECT u AS c, v AS x FROM e{i - 1}
                  UNION ALL SELECT v, u FROM e{i - 1}),
    w{i} AS (SELECT a.x AS u, b.x AS v, count(*) AS sup
             FROM ed{i - 1} a JOIN ed{i - 1} b
               ON a.c = b.c AND a.x < b.x
             JOIN e{i - 1} e ON e.u = a.x AND e.v = b.x
             GROUP BY a.x, b.x),
    e{i} AS (SELECT e.u, e.v FROM e{i - 1} e
             JOIN w{i} w ON w.u = e.u AND w.v = e.v
             WHERE w.sup >= {k - 2})"""
    sql += f""",
    edF AS (SELECT u AS c, v AS x FROM e{rounds}
            UNION ALL SELECT v, u FROM e{rounds}),
    wF AS (SELECT a.x AS u, b.x AS v, count(*) AS sup
           FROM edF a JOIN edF b ON a.c = b.c AND a.x < b.x
           JOIN e{rounds} e ON e.u = a.x AND e.v = b.x
           GROUP BY a.x, b.x)
    SELECT e.u, e.v, CAST(coalesce(w.sup, 0) AS BIGINT) AS support
    FROM e{rounds} e LEFT JOIN wF w ON w.u = e.u AND w.v = e.v
"""
    return sql


ORACLES["ktruss"] = _ktruss_oracle()


COORD_PCT = 10   # coordinated sample keeps keys with md5 % 100 < 10


def q_coordinated_sample_join(sf_dir, pct: int = COORD_PCT):
    """Coordinated (shared-seed) key sampling — the sampling-theory
    primitive that makes SAMPLED JOINS meaningful: both orders and
    lineitem keep a key iff md5(orderkey) mod 100 < pct, so the same
    key survives on both sides and each key stratum is kept whole
    (independent per-side sampling would quadratically under-sample
    matches). The sampled join count scaled by 100/pct is the
    Horvitz–Thompson estimate of the true join size; the query emits
    both plus the exact ×1e9 sampling error, all in exact integers.

    Plan: the sample predicates are pure maps; join sizes come from
    per-key count aggregates joined on the key and a Σ o_cnt·l_cnt
    fold — the join itself is never materialized, only key-count
    tables exchange."""

    def _keys(tbl: str, keycol: str):
        def _f(b: pa.Table) -> pa.Table:
            k = b[keycol].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"k": pa.array(k, pa.int64())})

        return fast_groupby_agg(
            T(sf_dir, tbl, [keycol]).map_batches(
                _f, batch_format="pyarrow"),
            ["k"], {"n": (None, "count")})

    ok = _keys("orders", "o_orderkey")
    lk = _keys("lineitem", "l_orderkey").map_batches(
        lambda b: b.rename_columns(["k", "m"]), batch_format="pyarrow")
    j = ok.join(lk, "inner", num_partitions=JOIN_PARTS, on=("k",))

    def _fold(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        prod = (b["n"].to_numpy(zero_copy_only=False)
                * b["m"].to_numpy(zero_copy_only=False))
        keep = np.array([
            int(hashlib.md5(f"coord:{v}".encode()).hexdigest()[:15], 16)
            % 100 < pct for v in k.tolist()])
        return pa.table({
            "exact": pa.array([int(prod.sum())], pa.int64()),
            "sampled": pa.array([int(prod[keep].sum())], pa.int64()),
            "keys_kept": pa.array([int(keep.sum())], pa.int64()),
        })

    agg = fast_groupby_agg(
        j.map_batches(_fold, batch_format="pyarrow").map_batches(
            lambda b: pa.table({
                "g": pa.array(np.zeros(b.num_rows, np.int64)),
                "exact": b["exact"], "sampled": b["sampled"],
                "keys_kept": b["keys_kept"],
            }), batch_format="pyarrow"),
        ["g"], {"exact": ("exact", "sum"), "sampled": ("sampled", "sum"),
                "keys_kept": ("keys_kept", "sum")})

    def _est(b: pa.Table) -> pa.Table:
        ex = int(b["exact"].to_numpy(zero_copy_only=False)[0])
        sm = int(b["sampled"].to_numpy(zero_copy_only=False)[0])
        est = sm * 100 // pct
        return pa.table({
            "n_join_exact": pa.array([ex], pa.int64()),
            "n_join_sampled": pa.array([sm], pa.int64()),
            "ht_estimate": pa.array([est], pa.int64()),
            "keys_kept": b["keys_kept"],
            "rel_err_fp": pa.array(
                [abs(est - ex) * 1_000_000_000 // max(ex, 1)],
                pa.int64()),
        })

    return agg.map_batches(_est, batch_format="pyarrow")


ORACLES["coordinated_sample_join"] = f"""
    WITH ok AS (SELECT o_orderkey AS k, count(*) AS n
                FROM orders GROUP BY 1),
    lk AS (SELECT l_orderkey AS k, count(*) AS m
           FROM lineitem GROUP BY 1),
    j AS (SELECT ok.k, ok.n * lk.m AS prod,
                 CAST(('0x' || substr(md5('coord:' || ok.k), 1, 15))
                      AS BIGINT) % 100 < {COORD_PCT} AS keep
          FROM ok JOIN lk ON ok.k = lk.k),
    a AS (SELECT CAST(sum(prod) AS BIGINT) AS exact,
                 CAST(coalesce(sum(prod) FILTER (WHERE keep), 0)
                      AS BIGINT) AS sampled,
                 CAST(coalesce(sum(CASE WHEN keep THEN 1 ELSE 0 END), 0)
                      AS BIGINT) AS keys_kept
          FROM j)
    SELECT exact AS n_join_exact, sampled AS n_join_sampled,
           CAST(sampled * 100 // {COORD_PCT} AS BIGINT) AS ht_estimate,
           keys_kept,
           CAST(abs(sampled * 100 // {COORD_PCT} - exact) * 1000000000
                // (CASE WHEN exact = 0 THEN 1 ELSE exact END)
                AS BIGINT) AS rel_err_fp
    FROM a
"""
