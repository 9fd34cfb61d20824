"""relational layer (3/7): data auditing, TPC-H-style analytics, text/linkage operators,
set ops, export/layout queries.

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
    SIM_JOIN_MAX_BROADCAST,
    TFIDF_MAX_BROADCAST_VOCAB,
    _TOKEN,
    _compact_small,
    _pagerank_edges,
    _prefix_rows_table,
    _round_half_away,
    _shingle_rows,
    _tree_reduce_buffers,
    _ts_ns,
)



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


def _order_type_items(sf_dir, max_broadcast_parts: int):
    """Distinct (l_orderkey, p_type) basket-item rows — the shared
    input of q_frequent_itemsets and q_assoc_rules. The partkey→type
    lookup is CARDINALITY GUARDED: below `max_broadcast_parts` it ships
    once as a ray.put sorted-key array probed by searchsorted inside
    map_batches directly over raw lineitem (ONE distinct groupby does
    the A-Priori dedup); above the guard the hash-join tier runs (part
    grows with the dataset, so the broadcast is not assumed)."""
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
    return fast_groupby_agg(typed, ["l_orderkey", "p_type"],
                            {"_m": (None, "count")})


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
    ot = _order_type_items(sf_dir, max_broadcast_parts)

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
