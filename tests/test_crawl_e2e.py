"""End-to-end crawl vs the sequential reference golden (north_rule gates):

- exact crawl ordering (priority-merged fetch log == refsem order; per-host
  virtual timestamps monotone with the politeness gap)
- exact final URL-seen set (sharded cuckoo+exact filters == refsem set)
- game_history store parity after normalize+dedup
- politeness budget respected per host
- robots.txt exclusion (engine-added behavior)
- checkpoint/resume equivalence
- incremental watermark crawl (gap months only)
"""

import shutil

import pandas as pd
import pytest

from fide_crawler_ray import refsem, synth
from fide_crawler_ray.pipelines import crawl as C
from fide_crawler_ray.stages import urls as U

CFG = synth.SiteConfig(seed=42, n_players=6, n_queries=2, n_months=6)
GAP = 1_000_000


@pytest.fixture(scope="module")
def crawl_and_golden(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl"))
    res = C.run_crawl(CFG, out, n_shards=2, fetch_concurrency=2,
                      politeness_gap_us=GAP, record_log=True)
    golden = refsem.crawl(CFG)
    yield res, golden
    shutil.rmtree(out, ignore_errors=True)


def test_crawl_ordering_exact(crawl_and_golden):
    res, (ref_order, _, _, _) = crawl_and_golden
    log = res.fetch_log()
    got_urls = [u for (_, _, u) in log]
    ref_canon = [U.canonicalize(u) for u in ref_order]
    assert got_urls == ref_canon


def test_per_host_politeness_and_priority_monotone(crawl_and_golden):
    res, _ = crawl_and_golden
    by_host: dict[str, list] = {}
    for shard_log in [res.fetch_log()]:
        for vts, prio, url in shard_log:
            host = url.split("//", 1)[1].split("/", 1)[0]
            by_host.setdefault(host, []).append((vts, prio))
    assert len(by_host) >= 2
    for host, entries in by_host.items():
        entries.sort()
        vts_list = [v for v, _ in entries]
        prios = [p for _, p in entries]
        assert all(b - a >= GAP for a, b in zip(vts_list, vts_list[1:]))
        assert prios == sorted(prios)  # per-host fetch order == crawl priority


def test_url_seen_set_exact(crawl_and_golden):
    res, (ref_order, _, _, _) = crawl_and_golden
    expect = {U.sha1_url(U.canonicalize(u)) for u in ref_order}
    got = res.seen_hashes()
    # engine's seen set additionally contains offered-but-not-fetched URLs?
    # No: everything offered gets fetched at exhaustion → sets must be equal.
    assert got == expect


def test_players_match_reference(crawl_and_golden):
    res, (_, ref_players, _, _) = crawl_and_golden
    got = res.players().to_pandas().sort_values("fide_id").reset_index(drop=True)
    exp = pd.DataFrame(ref_players).sort_values("fide_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_game_history_matches_reference(crawl_and_golden):
    res, (_, _, _, ref_norm) = crawl_and_golden
    got = res.game_history().drop_columns(["lineage"]).to_pandas()
    exp = pd.DataFrame(ref_norm)
    sort_cols = ["fide_id", "date", "tournament_name", "opponent_name", "result", "chg"]
    got = got.sort_values(sort_cols).reset_index(drop=True)[sorted(exp.columns)]
    exp = exp.sort_values(sort_cols).reset_index(drop=True)[sorted(exp.columns)]
    for c in ("result", "chg", "k_chg"):
        got[c] = got[c].astype("float64").round(4)
        exp[c] = exp[c].astype("float64").round(4)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_duplicate_seed_urls_dropped(tmp_path):
    seeds = synth.seed_queries(CFG) + [synth.seed_queries(CFG)[0]]
    out = str(tmp_path / "dupseed")
    res = C.run_crawl(CFG, out, seeds=seeds, n_shards=2, record_log=True)
    ref_order, _, _, _ = refsem.crawl(CFG, seeds=seeds)
    assert [u for (_, _, u) in res.fetch_log()] == [U.canonicalize(u) for u in ref_order]
    stats = res.stats()
    assert sum(s.get("dup_dropped", 0) for s in stats) > 0


def test_robots_exclusion(tmp_path):
    cfg = synth.SiteConfig(
        seed=42, n_players=6, n_queries=2, n_months=4,
        robots_disallow=(("ratings.fide.com", "/profile/100001"),),
    )
    out = str(tmp_path / "robots")
    res = C.run_crawl(cfg, out, n_shards=2, record_log=True)
    fetched = {u for (_, _, u) in res.fetch_log()}
    assert not any("/profile/100001" in u for u in fetched)
    # calc pages for that player are unaffected (different path)
    assert any("id_number=100001" in u for u in fetched)
    assert sum(s.get("robots_dropped", 0) for s in res.stats()) > 0


def test_checkpoint_resume_equivalence(tmp_path):
    out_full = str(tmp_path / "full")
    full = C.run_crawl(CFG, out_full, n_shards=2)
    full_games = full.game_history().drop_columns(["lineage"]).to_pandas()

    out_part = str(tmp_path / "part")
    C.run_crawl(CFG, out_part, n_shards=2, max_epochs=1)  # killed after epoch 1
    resumed = C.run_crawl(CFG, out_part, n_shards=2, resume=True)
    res_games = resumed.game_history().drop_columns(["lineage"]).to_pandas()

    sort_cols = ["fide_id", "date", "tournament_name", "opponent_name", "result", "chg"]
    a = full_games.sort_values(sort_cols).reset_index(drop=True)
    b = res_games.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
    # resumed run must also have the exact seen set
    assert resumed.seen_hashes() == full.seen_hashes()


def test_finalize_tiers_identical(tmp_path):
    """Single-task finalize (normalize+dedup+dropna+write in one task)
    vs the Dataset path (forced via a zero row guard) must produce the
    exact same game_history content."""
    out = str(tmp_path / "f")
    res = C.run_crawl(CFG, out, n_shards=2)
    small = res.game_history().to_pandas()
    C.finalize_game_history(out, max_single_rows=0)  # overwrite via big path
    big = C.run_crawl.__globals__["store"].read_all(
        out, "game_history").to_pandas()
    cols = sorted(small.columns)
    s = small[cols].sort_values(cols).reset_index(drop=True)
    b = big[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, b)


def test_watermark_windows_ds_matches_scalar_spec(tmp_path):
    """The distributed watermark plan (Dataset end-to-end, block-ref
    lookup) must produce exactly the dict the scalar spec computes."""
    months = synth.months_of(CFG)
    out1 = str(tmp_path / "w")
    first = C.run_crawl(CFG, out1, n_shards=2,
                        start_month=months[1], end_month=months[3])
    store1 = first.game_history()
    want = C.watermark_windows(C.store_watermarks(store1))
    assert want
    t = C.watermark_windows_ds(store1).to_pandas()
    got = {r.fide_id: (r.lo_excl, r.hi_excl) for r in t.itertuples()}
    assert got == want
    # the worker-side lookup assembles the same mapping from block refs
    import ray

    wm_ds = C.watermark_windows_ds(store1).materialize()
    wref = ray.put(wm_ds.to_arrow_refs())
    assert C._watermark_lookup(wref) == want
    assert C._watermark_lookup(None) == {}


def test_incremental_resume_reloads_watermark_sidecar(tmp_path):
    """A killed incremental crawl resumed WITHOUT incremental_store must
    reload the watermark parquet sidecar — fetching exactly the URL set
    of an uninterrupted incremental run (a lost sidecar would re-crawl
    the excluded months)."""
    months = synth.months_of(CFG)
    first = C.run_crawl(CFG, str(tmp_path / "a"), n_shards=2,
                        start_month=months[1], end_month=months[3])
    store1 = first.game_history()
    full = C.run_crawl(CFG, str(tmp_path / "full"), n_shards=2,
                       incremental_store=store1, record_log=True)
    out = str(tmp_path / "b")
    C.run_crawl(CFG, out, n_shards=2, incremental_store=store1,
                max_epochs=1, record_log=True)
    resumed = C.run_crawl(CFG, out, n_shards=2, resume=True,
                          record_log=True)
    assert ({u for (_, _, u) in resumed.fetch_log()}
            == {u for (_, _, u) in full.fetch_log()})


def test_incremental_watermark_crawl(tmp_path):
    months = synth.months_of(CFG)
    out1 = str(tmp_path / "w1")
    first = C.run_crawl(CFG, out1, n_shards=2,
                        start_month=months[1], end_month=months[3])
    store1 = first.game_history()

    out2 = str(tmp_path / "w2")
    second = C.run_crawl(CFG, out2, n_shards=2, incremental_store=store1,
                         record_log=True)
    fetched2 = {u for (_, _, u) in second.fetch_log()}
    # months strictly inside every player's stored window are not refetched
    wm = C.watermark_windows(C.store_watermarks(store1))
    assert wm, "watermarks should exist after the first crawl"
    skipped = 0
    for pid, (lo, hi) in wm.items():
        for m in months:
            if lo <= m <= hi:
                assert synth.calc_url(pid, m) not in {
                    u for u in fetched2 if f"id_number={pid}" in u
                }
                skipped += 1
    assert skipped > 0


def test_resume_refuses_missing_snapshots_and_wrong_shards(tmp_path):
    """A manifest without its shard snapshots (or with a different shard
    count) must REFUSE to resume — silently starting an empty frontier
    would mark the crawl finished with zero output."""
    import glob
    import os

    out = str(tmp_path / "r")
    C.run_crawl(CFG, out, n_shards=2, max_epochs=1)
    with pytest.raises(RuntimeError, match="n_shards"):
        C.run_crawl(CFG, out, n_shards=4, resume=True)
    for f in glob.glob(os.path.join(out, "checkpoint", "shard_*.pkl")):
        os.remove(f)
    with pytest.raises(RuntimeError, match="snapshots"):
        C.run_crawl(CFG, out, n_shards=2, resume=True)


def test_fresh_run_clears_stale_epoch_partitions(tmp_path):
    """resume=False into a used out_dir must not merge the previous
    run's surviving epoch partitions into the new stores."""
    out = str(tmp_path / "reuse")
    months = synth.months_of(CFG)
    big = C.run_crawl(CFG, out, n_shards=2)  # many epochs
    big_rows = big.game_history().count()

    small = C.run_crawl(CFG, out, n_shards=2,
                        start_month=months[0], end_month=months[1])
    small_rows = small.game_history().count()

    fresh = C.run_crawl(CFG, str(tmp_path / "clean"), n_shards=2,
                        start_month=months[0], end_month=months[1])
    assert small_rows == fresh.game_history().count()
    assert small_rows < big_rows


def test_pending_spill_ordering_exact(tmp_path, crawl_and_golden):
    """A tiny in-memory pending bound (forces heavy spill/refill churn)
    must leave the crawl order, seen set, and output bit-identical to the
    unlimited run — the spill tier may only move WHERE pending rows live,
    never WHAT pops next."""
    res_unlimited, (ref_order, _, _, _) = crawl_and_golden
    out = str(tmp_path / "spill_crawl")
    res = C.run_crawl(CFG, out, n_shards=2, fetch_concurrency=2,
                      politeness_gap_us=GAP, record_log=True,
                      max_pending_inmem=8, spill_chunk=4)
    stats = res.stats()
    assert sum(s.get("spilled", 0) for s in stats) > 0  # spill actually ran
    assert sum(s.get("spilled", 0) for s in stats) == \
        sum(s.get("refilled", 0) for s in stats)  # everything came back
    assert [u for (_, _, u) in res.fetch_log()] == \
        [u for (_, _, u) in res_unlimited.fetch_log()]
    assert res.seen_hashes() == res_unlimited.seen_hashes()
    assert res.game_history().count() == res_unlimited.game_history().count()


def test_pending_spill_survives_resume(tmp_path):
    """Kill after epoch 1 with spilled pending on disk; resume must reload
    the snapshot's chunk descriptors and finish with the same rows as an
    uninterrupted spilling run."""
    out_full = str(tmp_path / "full")
    full = C.run_crawl(CFG, out_full, n_shards=2, fetch_concurrency=2,
                       max_pending_inmem=8, spill_chunk=4)
    out = str(tmp_path / "killed")
    C.run_crawl(CFG, out, n_shards=2, fetch_concurrency=2,
                max_pending_inmem=8, spill_chunk=4,
                max_epochs=1, finalize=False)
    resumed = C.run_crawl(CFG, out, n_shards=2, fetch_concurrency=2,
                          max_pending_inmem=8, spill_chunk=4, resume=True)
    assert resumed.seen_hashes() == full.seen_hashes()
    assert resumed.game_history().count() == full.game_history().count()


def test_job_entrypoint(tmp_path, capsys):
    """`python -m fide_crawler_ray` CLI contract: runs inside an
    existing Ray session (the Ray Job Server case — no re-init), prints
    one JSON status line, exits 0."""
    import json

    from fide_crawler_ray.job import main

    rc = main(["--out", str(tmp_path / "job"), "--players", "4",
               "--queries", "2", "--months", "3", "--shards", "2"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)
    assert st["pages"] > 0 and st["game_rows"] > 0


def test_expansion_dedup_tiers_equivalent(tmp_path, monkeypatch):
    """The distributed dedup_dataset tier for large epoch expansions
    (forced via a zero single-task guard) must produce the exact same
    crawl as the single-task tier: same pages, same game_history rows,
    same final URL-seen behavior (re-run enqueues nothing new)."""
    from fide_crawler_ray.pipelines import crawl as C

    cfg = synth.SiteConfig(seed=13, n_players=12, n_queries=4, n_months=6)
    a = C.run_crawl(cfg, str(tmp_path / "a"), n_shards=2,
                    fetch_concurrency=2)
    monkeypatch.setattr(C, "EXPANSION_DEDUP_MAX_SINGLE", 0)
    b = C.run_crawl(cfg, str(tmp_path / "b"), n_shards=2,
                    fetch_concurrency=2)
    assert a.pages() == b.pages()
    ga = a.game_history().to_pandas().sort_values("lineage").reset_index(
        drop=True)
    gb = b.game_history().to_pandas().sort_values("lineage").reset_index(
        drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(ga, gb)


def test_transient_fetch_faults_retry_to_identical_output(tmp_path):
    """Deterministic transient fetch failures (every crc32%5==0 URL
    fails its first 2 attempts) must be absorbed by the in-slot retry:
    pages, ordering, and game rows bit-identical to the fault-free run."""
    import pandas as pd

    from fide_crawler_ray import synth
    from fide_crawler_ray.pipelines import crawl as C

    base = synth.SiteConfig(seed=11, n_players=6, n_queries=2, n_months=6)
    faulty = synth.SiteConfig(seed=11, n_players=6, n_queries=2,
                              n_months=6, fault_every=5, fault_attempts=2)
    a = C.run_crawl(base, str(tmp_path / "a"), n_shards=2,
                    fetch_concurrency=2)
    b = C.run_crawl(faulty, str(tmp_path / "b"), n_shards=2,
                    fetch_concurrency=2)
    assert a.pages() == b.pages()
    ga = a.game_history().to_pandas().sort_values("lineage") \
        .reset_index(drop=True)
    gb = b.game_history().to_pandas().sort_values("lineage") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(ga, gb)


def test_permanent_fetch_failure_raises():
    """Faults outlasting the retry budget must fail loudly, not emit
    partial documents."""
    import pyarrow as pa
    import pytest

    from fide_crawler_ray import synth
    from fide_crawler_ray.stages.parse import FETCH_MAX_ATTEMPTS, fetch_batch

    cfg = synth.SiteConfig(seed=1, fault_every=1,
                           fault_attempts=FETCH_MAX_ATTEMPTS + 1)
    batch = pa.table({
        "url": ["https://fide.com/search?query=Surname0"],
        "fide_id": [""], "player_name": [""], "priority": [0],
    })
    with pytest.raises(RuntimeError, match="fetch failed after"):
        fetch_batch(cfg, batch)


def test_lineage_audit_epochs_consistent():
    from fide_crawler_ray.pipelines.queries import q_lineage_audit

    out = q_lineage_audit("/root/testdata/sf0.001")
    assert len(out) >= 1
    assert bool(out["lineage_ok"].all())
    assert int(out["urls_fetched"].sum()) > 0


def test_frontier_snapshot_stats_resumable_state():
    from fide_crawler_ray.pipelines.queries import q_frontier_snapshot_stats

    out = q_frontier_snapshot_stats("/root/testdata/sf0.001")
    assert len(out) == 2
    assert int(out["n_pending"].sum()) > 0
    assert (out["gap_us"] == 1_000_000).all()


def test_crawl_metrics_conservation():
    from fide_crawler_ray.pipelines.queries import q_crawl_metrics

    out = q_crawl_metrics("/root/testdata/sf0.001")
    shards = out[out["component"].str.startswith("shard_")]
    filters = out[out["component"].str.startswith("seenfilter_")]
    assert len(shards) == 2 and len(filters) == 2
    assert int(shards["popped"].sum()) > 0
    # every offer is accounted for: enqueued into a shard, duplicate,
    # or robots-blocked
    offered = int(filters["offered"].sum())
    assert offered == int(shards["enqueued"].sum()
                          + filters["dup_dropped"].sum()
                          + filters["robots_dropped"].sum())


def test_span_stats_order_invariant_and_volume():
    from fide_crawler_ray.pipelines.queries import q_span_stats

    out = q_span_stats("/root/testdata/sf0.001")
    assert int(out["order_violations"].sum()) == 0
    assert int(out["n_spans"].sum()) > 0
    calc = out[out["doc_kind"] == "calc"]
    if len(calc):  # calc pages interleave media color markers with text
        assert int(calc["n_media"].iloc[0]) > 0


def test_flagship_crawl_oracle_replay_matches_engine():
    """The crawl_game_history DuckDB oracle (r5: full parse → normalize
    → min-lineage dedup → dropna replay over the ground-truth span
    sidecar) must match the engine's crawled store byte-for-byte — the
    in-suite version of the driver's hard gate, so a synth/parse/
    normalize drift that would break the flagship oracle fails HERE
    first."""
    import duckdb
    import pandas as pd

    from fide_crawler_ray.pipelines import queries as Q

    got = Q.q_crawl_game_history("/root/testdata/sf0.001").to_pandas()
    sql = Q.oracle_sql()["crawl_game_history"]
    exp = duckdb.connect().execute(sql).fetchdf()

    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64")
            elif pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
        return df.sort_values(list(df.columns), kind="mergesort") \
                 .reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(got), canon(exp))
