"""relational layer (1/7): hash/as-of joins, window functions, rollup/cube, exact quantiles,
sampling, term-doc frequency, embedding norms, range & similarity joins.

Split out of pipelines/relational.py (r4) with ZERO behavior change —
statements keep their original order; ``relational`` re-exports
everything, and ORACLES entries registered here mutate the shared dict
owned by rel_audit_core (or the facade-merged view). See
pipelines/relational.py for the facade contract.
"""

from __future__ import annotations

import hashlib
import math
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
    primitive; like random_sample since r4 it is oracle-exact and stable across
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
