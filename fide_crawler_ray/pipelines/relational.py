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
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..stages.fastagg import fast_groupby_agg
from .queries import T, _canon_stage

# ============================================================== joins


def q_j_inner_join(sf_dir):
    """Row-level hash inner join orders⋈customer (``Dataset.join`` —
    both sides hash-partitioned through the exchange, no driver state),
    then revenue per nation. The row-level join is deliberate: it
    exercises the shuffle-join path, unlike J1's broadcast plan."""
    orders = T(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = T(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = orders.join(cust, "inner", num_partitions=8,
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
    j = T(sf_dir, "customer", ["c_custkey"]).join(
        counts, "left_outer", num_partitions=8,
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
            m = pa.concat_tables(
                t for t in ray.get(ray.get(mref)) if t.num_rows > 0
            )
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
        v = np.rint(df["value"].to_numpy() * 1e6).astype(np.int64)
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

    def _merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        regs = np.zeros(1 << HLL_P, dtype=np.uint8)
        for buf in b["regs"].to_pylist():
            np.maximum(regs, np.frombuffer(buf, dtype=np.uint8), out=regs)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    # register max is associative → tree-combine inside Ray; the driver
    # only ever sees ≤32 partial buffers (one block per partial would be
    # 16 KB × n_blocks — real memory at 100-TB block counts)
    parts = ds.map_batches(_partial, batch_format="pyarrow").materialize()
    while parts.count() > 32:
        parts = parts.repartition(
            max(1, parts.num_blocks() // 8)
        ).map_batches(_merge, batch_format="pyarrow",
                      batch_size=None).materialize()
    regs = np.zeros(1 << HLL_P, dtype=np.uint8)
    for t in ray.get(parts.to_arrow_refs()):
        for buf in t["regs"].to_pylist():
            np.maximum(regs, np.frombuffer(buf, dtype=np.uint8), out=regs)
    approx = hll_estimate(regs)
    exact = fast_groupby_agg(ds, ["l_partkey"],
                             {"__n": (None, "count")}).count()
    return pd.DataFrame([{
        "approx": float(approx), "exact": int(exact),
        "rel_err": abs(approx - exact) / max(exact, 1),
    }])


# ===================================================== hash sampling


def q_sample_hash(sf_dir):
    """Deterministic hash sampling: keep documents whose md5(doc_id)
    starts with hex 0–3 (a 25% reproducible sample — the corpus-subset
    primitive; unlike random_sample it is oracle-exact and stable across
    runs/cluster sizes)."""

    def _sample(b: pa.Table) -> pa.Table:
        mask = [hashlib.md5(str(i).encode()).hexdigest()[0] in "0123"
                for i in b["doc_id"].to_pylist()]
        return b.filter(pa.array(mask))

    return T(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _sample, batch_format="pyarrow")


# =============================================== term document frequency


_TOKEN = re.compile(r"[a-z0-9_]+")


def q_term_doc_freq(sf_dir):
    """Top-50 vocabulary terms by document frequency: per-doc DISTINCT
    tokens flat-mapped to term rows, map-side-combined groupby count,
    then a tiny sort+limit. The flat_map emits |vocab per doc| rows, and
    the shuffle moves one row per (block, term) — vocabulary-sized, not
    corpus-sized."""

    def _terms(b: pa.Table) -> pa.Table:
        terms: list[str] = []
        for txt in b["text"].to_pylist():
            terms.extend(set(_TOKEN.findall(txt.lower())))
        return pa.table({"term": pa.array(terms, pa.string())})

    ds = T(sf_dir, "documents", ["text"]).map_batches(
        _terms, batch_format="pyarrow")
    out = fast_groupby_agg(ds, ["term"], {"df": (None, "count")})
    return out.sort(["df", "term"], descending=[True, False]).limit(50)


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


# ============================================================ registry


def queries() -> dict:
    return {
        "j_inner_join": q_j_inner_join,
        "j_left_outer": q_j_left_outer,
        "asof_join": q_asof_join,
        "window_functions": q_window_functions,
        "rollup_agg": q_rollup_agg,
        "quantiles": q_quantiles,
        "string_agg": q_string_agg,
        "distinct_count": q_distinct_count,
        "hll_distinct": q_hll_distinct,
        "sample_hash": q_sample_hash,
        "term_doc_freq": q_term_doc_freq,
        "embedding_norms": q_embedding_norms,
    }


ORACLES: dict[str, str] = {
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
    "embedding_norms": """
        SELECT vec_id,
               round(sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                     * 1000000.0) / 1000000.0 AS l2
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        GROUP BY vec_id
    """,
}
