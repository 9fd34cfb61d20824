"""Cardinality-guarded aggregation and dedup fallback paths produce
output identical to the primary (single-task-combine) plans, and the
dedup probe stays correct when a duplicate key's partials straddle
combined-block boundaries (the multi-block hazard: a per-call c>=2 prune
would drop a key seen once per block and let both duplicate rows
survive)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from fide_crawler_ray.stages import dedup as DD
from fide_crawler_ray.stages.fastagg import fast_groupby_agg


def _events_ds(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "k1": rng.integers(0, 40, n),
        "k2": rng.choice(["x", "y", "z"], n),
        # integer-valued floats so sums/means are exact in both plans
        "v": rng.integers(0, 1000, n).astype("float64"),
    })
    return rd.from_pandas(df), df


AGGS = {
    "n": (None, "count"),
    "total": ("v", "sum"),
    "lo": ("v", "min"),
    "hi": ("v", "max"),
    "avg": ("v", "mean"),
}


def _run(ds, **kw):
    out = fast_groupby_agg(ds, ["k1", "k2"], AGGS, **kw).to_pandas()
    return out.sort_values(["k1", "k2"]).reset_index(drop=True)


def test_fastagg_native_fallback_identical():
    ds, df = _events_ds()
    primary = _run(ds)
    # max_combine_rows=0 forces every call down the native-aggregate path
    fallback = _run(ds, max_combine_rows=0)
    assert list(primary.columns) == list(fallback.columns)
    pd.testing.assert_frame_equal(primary, fallback)
    # sanity vs plain pandas
    exp = (
        df.groupby(["k1", "k2"])["v"]
        .agg(n="size", total="sum", lo="min", hi="max", avg="mean")
        .reset_index().sort_values(["k1", "k2"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        primary.astype({"n": "int64"}), exp.astype({"n": "int64"}),
        check_dtype=False,
    )


def test_fastagg_arrow_and_pandas_partials_identical(monkeypatch):
    """The r4 Arrow-native partial path and the pandas fallback emit
    IDENTICAL values, dtypes, and Arrow schemas on the same eligible
    input (mixed int/uint/bool/string keys; int sum/mean; int, float
    and string min/max) — pinned by running fast_groupby_agg once with
    the arrow path live and once with _arrow_groupby_ok monkeypatched
    to False, as the r4 advice asked. Also pins the eligibility rule
    itself: the batch IS arrow-eligible, and a large_string min/max
    input is NOT (its pandas fallback would re-emit plain string)."""
    import fide_crawler_ray.stages.fastagg as FA

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "ki": rng.integers(0, 10, n).astype("int32"),
        "ku": rng.integers(0, 5, n).astype("uint16"),
        "kb": rng.integers(0, 2, n).astype(bool),
        "ks": rng.choice(["x", "y", "z"], n),
        "v": rng.integers(0, 1000, n),           # int64 sum/mean
        "f": rng.normal(size=n),                 # float min/max
        "s": rng.choice(["p", "q", "r"], n),     # string min/max
    })
    keys = ["ki", "ku", "kb", "ks"]
    aggs = {
        "cnt": (None, "count"), "total": ("v", "sum"),
        "avg": ("v", "mean"), "fmin": ("f", "min"), "fmax": ("f", "max"),
        "smin": ("s", "min"), "smax": ("s", "max"),
    }
    b = pa.Table.from_pandas(df, preserve_index=False)
    assert FA._arrow_groupby_ok(b, keys, list(aggs.values()))
    big = b.set_column(
        b.schema.get_field_index("s"), "s", b["s"].cast(pa.large_string()))
    assert not FA._arrow_groupby_ok(big, keys, list(aggs.values()))

    def run():
        out = FA.fast_groupby_agg(rd.from_pandas(df), keys, aggs)
        schema = out.schema().base_schema
        return schema, out.to_pandas().sort_values(keys) \
                          .reset_index(drop=True)

    arrow_schema, arrow_df = run()
    monkeypatch.setattr(FA, "_arrow_groupby_ok", lambda *a, **k: False)
    pandas_schema, pandas_df = run()
    assert arrow_schema == pandas_schema
    assert [str(d) for d in arrow_df.dtypes] \
        == [str(d) for d in pandas_df.dtypes]
    pd.testing.assert_frame_equal(arrow_df, pandas_df)


def test_multi_partition_joins_match_single_partition(monkeypatch):
    """conftest pins FCRAY_JOIN_PARTS=1 for suite speed, so this test
    restores multi-partition hash-join coverage explicitly: the
    pagerank JOIN tier (2 inner + 1 left-outer hash join per iteration,
    fastagg map-side combines in between) must be bit-identical at join
    width 8 and at the suite's width 1. q_pagerank is all-integer, so
    equality is exact."""
    import fide_crawler_ray.pipelines.rel_joins as RJ

    SF = "/root/testdata/sf0.001"

    def run():
        # max_single_edges=0 forces the distributed join tier
        return RJ.q_pagerank(SF, iters=2, max_single_edges=0) \
            .to_pandas().sort_values("node").reset_index(drop=True)

    base = run()  # width 1 (suite default via conftest env)
    monkeypatch.setattr(RJ, "JOIN_PARTS", 8)
    wide = run()
    pd.testing.assert_frame_equal(wide, base)


def test_grouped_first_last_matches_pandas_and_tree_path():
    from fide_crawler_ray.stages.fastagg import grouped_first_last

    rng = np.random.default_rng(5)
    n = 6000
    df = pd.DataFrame({
        "k": rng.integers(0, 80, n),
        "o1": rng.integers(0, 50, n),
        "o2": np.arange(n),  # unique tiebreak
        "v": rng.integers(0, 1000, n).astype("float64"),
    })
    ds = rd.from_pandas(df)

    def run(**kw):
        out = grouped_first_last(ds, ["k"], "v", ["o1", "o2"], **kw).to_pandas()
        return out.sort_values("k").reset_index(drop=True)

    got = run()
    tree = run(max_combine_rows=50)  # force several tree-combine rounds
    pd.testing.assert_frame_equal(got, tree)

    s = df.sort_values(["o1", "o2"], kind="mergesort")
    exp = pd.DataFrame({
        "k": sorted(df["k"].unique()),
        "first_value": s.groupby("k")["v"].first().sort_index().to_numpy(),
        "last_value": s.groupby("k")["v"].last().sort_index().to_numpy(),
    })
    pd.testing.assert_frame_equal(got.astype({"k": "int64"}), exp, check_dtype=False)


def test_grouped_topk_matches_pandas_and_tree_path():
    from fide_crawler_ray.stages.fastagg import grouped_topk

    rng = np.random.default_rng(13)
    n = 5000
    df = pd.DataFrame({
        "g": rng.integers(0, 40, n),
        "v": rng.standard_normal(n),
        "tie": np.arange(n),
    })
    ds = rd.from_pandas(df)

    def run(**kw):
        out = grouped_topk(ds, ["g"], ["v", "tie"], [False, True], 3, **kw)
        return (out.to_pandas().sort_values(["g", "rank"])
                .reset_index(drop=True))

    got = run()
    tree = run(max_combine_rows=64)  # force tree-combine rounds
    pd.testing.assert_frame_equal(got, tree)

    exp = (df.sort_values(["v", "tie"], ascending=[False, True])
           .groupby("g").head(3)
           .sort_values(["v", "tie"], ascending=[False, True]))
    exp["rank"] = exp.groupby("g").cumcount() + 1
    exp = exp.sort_values(["g", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "v", "tie", "rank"]],
                                  exp[["g", "v", "tie", "rank"]],
                                  check_dtype=False)


def test_sessionize_counts_boundary_stitch_matches_pandas():
    """Sort-based sessionize with sessions deliberately spanning block
    boundaries (8 input blocks) must equal the per-key pandas answer."""
    from fide_crawler_ray.stages.sessions import sessionize_counts

    rng = np.random.default_rng(9)
    n = 4000
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n),
        # mixture of small gaps (same session) and >30min jumps
        "ts": base + pd.to_timedelta(
            np.cumsum(rng.choice([60, 120, 2400], n)), unit="s"),
        "event_id": np.arange(n),
    })
    ds = rd.from_pandas(df).repartition(8)
    got = (sessionize_counts(ds, "user_id", "ts", ["event_id"], 1800)
           .to_pandas().sort_values("user_id").reset_index(drop=True))

    def _ref(g):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        return int(1 + (g["ts"].diff() > pd.Timedelta(minutes=30)).sum())

    exp = (df.groupby("user_id").apply(_ref, include_groups=False)
           .rename("n_sessions").reset_index()
           .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dedup_cardinality_guard_reroutes_identically():
    rng = np.random.default_rng(11)
    n = 4000
    t = pa.table({
        "key": pa.array(rng.integers(0, 1500, n)),
        "payload": pa.array(rng.integers(0, 10, n)),
        "lineage": pa.array(np.arange(n, dtype=np.int64)),
    })
    ds = rd.from_arrow(t)
    a = DD.dedup_dataset(ds, key_cols=("key",), order_col="lineage").to_pandas()
    b = DD.dedup_dataset(ds, key_cols=("key",), order_col="lineage",
                         max_combine_rows=0).to_pandas()
    a = a.sort_values("lineage").reset_index(drop=True)
    b = b.sort_values("lineage").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # keep-first semantics: one survivor per key, the min lineage
    exp = t.to_pandas().groupby("key")["lineage"].min().sort_values().tolist()
    assert a["lineage"].tolist() == exp


def test_combine_correct_under_tiny_block_size():
    """Ray splits output blocks over target_max_block_size, so a
    'single-task' combine expressed as repartition(1)+map_batches can
    silently run per-block — duplicating keys (fastagg) or letting
    split dup keys survive (dedup). Both now combine in one explicit
    Ray task; this pins correctness with the block cap forced tiny."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024  # 16 KB → everything splits
    try:
        ds, df = _events_ds(n=20000, seed=21)
        out = _run(ds)
        # every key appears exactly once
        assert not out.duplicated(["k1", "k2"]).any()
        exp = (df.groupby(["k1", "k2"])["v"]
               .agg(n="size", total="sum", lo="min", hi="max", avg="mean")
               .reset_index().sort_values(["k1", "k2"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(out, exp, check_dtype=False)

        rng = np.random.default_rng(22)
        n = 30000
        t = pa.table({
            "key": pa.array(rng.integers(0, 12000, n)),
            "lineage": pa.array(np.arange(n, dtype=np.int64)),
        })
        got = DD.dedup_dataset(rd.from_arrow(t), key_cols=("key",),
                               order_col="lineage").to_pandas()
        exp_l = t.to_pandas().groupby("key")["lineage"].min().sort_values()
        assert sorted(got["lineage"]) == exp_l.tolist()
    finally:
        ctx.target_max_block_size = old


def test_combine_task_merges_split_dup_key_and_ties():
    """A dup key whose two partials land in different partial blocks
    (c=1 in each) must still be flagged dup by the single combine task,
    and the at-min tie count `m` must merge only from partials whose
    local min IS the global min."""
    DD._probe_cache.clear()

    def blk(a, b, o, c, m):
        return pa.table({
            "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
            "o": pa.array(o, pa.int64()), "c": pa.array(c, pa.int64()),
            "m": pa.array(m, pa.int64()),
        })

    # (1,1) unique → pruned; (7,7) split dup, global min 2 from block 2
    # only (block 1's local min 4 contributes nothing to m); (9,9) dup
    # within one block with both rows AT the min → tied; (5,5) tied
    # ACROSS blocks (same min order in both).
    ref = DD._combine_all_task.remote(
        blk([1, 5, 7], [1, 5, 7], [10, 3, 4], [1, 1, 1], [1, 1, 1]),
        blk([5, 7, 9], [5, 7, 9], [3, 2, 5], [1, 1, 2], [1, 1, 2]),
    )
    ks, ms, td = DD._probe_arrays(ref)
    got = {(int(k["a"]), int(k["b"])): (int(m), bool(t))
           for k, m, t in zip(ks, ms, td)}
    assert got == {(5, 5): (3, True), (7, 7): (2, False), (9, 9): (5, True)}


def test_dedup_order_ties_keep_exactly_one_row_both_paths():
    """Identical rows sharing BOTH key and order (re-ingested duplicates
    with equal lineage) must yield exactly one survivor per key —
    reference ROW_NUMBER keeps rn=1, never all tied rows — on both the
    broadcast-probe path and the join fallback."""
    rng = np.random.default_rng(31)
    n = 3000
    key = rng.integers(0, 800, n)
    lin = rng.integers(0, 5, n).astype(np.int64)  # heavy order ties
    t = pa.table({
        "key": pa.array(key),
        "payload": pa.array(key * 7),  # key-determined → survivors comparable
        "lineage": pa.array(lin),
    })
    ds = rd.from_arrow(t).repartition(8)
    exp = (t.to_pandas().groupby("key")["lineage"].min()
           .reset_index().sort_values("key").reset_index(drop=True))
    for kw in ({}, {"max_combine_rows": 0}):
        got = (DD.dedup_dataset(ds, key_cols=("key",), order_col="lineage",
                                **kw).to_pandas()
               .sort_values("key").reset_index(drop=True))
        # exactly one row per key, at that key's min lineage
        assert got["key"].tolist() == exp["key"].tolist()
        assert got["lineage"].tolist() == exp["lineage"].tolist()
        assert (got["payload"] == got["key"] * 7).all()


def test_combine_survives_passthrough_empty_pandas_block(ray_session):
    """Ray's map operators pass zero-row blocks through WITHOUT running
    the UDF, so an empty zero-column pandas block minted upstream (an
    empty map_groups sort partition) can reach the combine task as-is.
    Seen as an intermittent full-suite failure (q_attribution_position
    under CPU contention); live_arrow() must absorb it."""
    ds, df = _events_ds(n=200)

    def _groups(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k1", sort=False)["v"].sum().reset_index()

    # many sort partitions over few keys → some partitions are empty
    # and surface as pandas blocks alongside the non-empty ones
    parts = ds.map_batches(
        lambda b: b.assign(part=b["k1"] % 3), batch_format="pandas"
    ).groupby("part").map_groups(_groups, batch_format="pandas")
    # inject a genuinely empty ZERO-COLUMN pandas block (the exact
    # shape Ray mints for an empty map_groups partition)
    empty = rd.from_pandas(pd.DataFrame())
    mixed = parts.union(empty)
    out = fast_groupby_agg(mixed, ["k1"], {"s": ("v", "sum")}).to_pandas()
    exp = df.groupby("k1")["v"].sum().reset_index(name="s")
    got = out.sort_values("k1").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, exp.sort_values("k1").reset_index(drop=True),
        check_dtype=False)


def test_live_arrow_coercion_unit():
    from fide_crawler_ray.stages.fastagg import live_arrow

    t = pa.table({"a": [1, 2]})
    out = live_arrow([
        t, pd.DataFrame(), pd.DataFrame({"a": [3]}),
        pa.table({}), t.slice(0, 0),
    ])
    assert [x.num_rows for x in out] == [2, 1]
    assert all(isinstance(x, pa.Table) for x in out)
