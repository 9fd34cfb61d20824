"""The distributed crawl pipeline (engine lifecycle, SURVEY.md §3).

Epoch loop over the sharded frontier:

    seeds → salted seen-filter bank (admit) → frontier shards (enqueue)
    loop:  shards.pop_ready (per-host politeness order, virtual time)
         → Dataset(url rows) → map_batches(Fetcher actor pool)   # fetch
         → docs partition written (resumable)                     # store
         → parse_search → expand (profile+calc URLs, watermark-gapped)
                        → salted admit → owning shards            # offer
         → parse_profile → players partition
         → parse_calc    → games_raw partition
         → checkpoint frontier snapshots + manifest
    until every shard's heap is empty
    finalize: games_raw → normalize → dedup(keep-first) → dropna
            → game_history store

Incremental crawl (reference data_fetching_processing.py:216-234): if an
existing game_history store is passed, per-player month windows already
covered are excluded during expansion (watermark A11: groupby(fide_id)
min/max date — an aggregation over the store, not actor state).

Ray usage notes: the only raw actors are the two frontier banks — the
salted seen filters and the politeness shards (shared
mutable state the Dataset API can't express); everything else is
Dataset ``map_batches``. ``pop_budget`` is PER SHARD (a hot host
concentrates in one shard, so a divided budget would starve skewed
epochs): per-epoch doc sets are bounded by n_shards × pop_budget, and
that is the bound on the epoch materialization that feeds the three
parse branches; stores stream via ``write_parquet``.
"""

from __future__ import annotations

import math
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .. import synth
from ..sources import store
from ..stages import dedup as DD
from ..stages.fastagg import live_arrow
from ..stages import normalize as NZ
from ..stages import parse as P
from ..stages import urls as U
from ..state.cuckoo import sha1_bytes_to_array
from ..state.frontier import (FrontierShard, SeenFilterShard, salt_of_hashes,
                              shard_of)


def _prev_month_str(period: str) -> str:
    y, m = int(period[:4]), int(period[5:7])
    y, m = (y - 1, 12) if m == 1 else (y, m - 1)
    return f"{y:04d}-{m:02d}-01"


def _next_month_str(period: str) -> str:
    y, m = int(period[:4]), int(period[5:7])
    y, m = (y + 1, 1) if m == 12 else (y, m + 1)
    return f"{y:04d}-{m:02d}-01"


def watermark_windows(min_max: dict[str, tuple[str, str]]) -> dict[str, tuple[str, str]]:
    """Per-player excluded month window from stored (min_date, max_date).

    Mirrors the reference's gap arithmetic (:224-234): head fetch runs to
    db_start-1day and tail from db_end+1day, so the boundary months are
    refetched; only months strictly inside are excluded."""
    from datetime import date, timedelta

    out = {}
    for pid, (dmin, dmax) in min_max.items():
        head_end = date.fromisoformat(dmin) - timedelta(days=1)   # :228
        tail_start = date.fromisoformat(dmax) + timedelta(days=1)  # :233
        lo_excl = _next_month_str(f"{head_end.year:04d}-{head_end.month:02d}-01")
        hi_excl = _prev_month_str(f"{tail_start.year:04d}-{tail_start.month:02d}-01")
        if lo_excl <= hi_excl:
            out[pid] = (lo_excl, hi_excl)
    return out


def store_watermarks(game_history_ds) -> dict[str, tuple[str, str]]:
    """A11: groupby(fide_id) min/max date over the existing store.

    Dict-returning scalar spec (test/API surface); the crawl itself uses
    ``watermark_windows_ds`` + ``_watermark_lookup`` so player-cardinality
    watermark state never lands on the driver (pinned equal by test)."""
    from ray.data.aggregate import Max, Min

    agg = game_history_ds.groupby("fide_id").aggregate(
        Min("date", alias_name="dmin"), Max("date", alias_name="dmax")
    )
    return {r["fide_id"]: (r["dmin"], r["dmax"]) for r in agg.take_all()}


def watermark_windows_ds(game_history_ds):
    """Distributed ST3 watermarks: groupby(fide_id) min/max date → the
    excluded-month window per player, as a DATASET end-to-end. Same gap
    arithmetic as watermark_windows (head refetches to db_start−1day,
    tail from db_end+1day — boundary months refetch, strictly-inside
    months are excluded), vectorized over pandas Periods per batch.
    Watermark state is player-cardinality-sized — at a 10^10-URL
    frontier it belongs in the object store, not a driver dict."""
    from ray.data.aggregate import Max, Min

    agg = game_history_ds.groupby("fide_id").aggregate(
        Min("date", alias_name="dmin"), Max("date", alias_name="dmax")
    )

    def _win(b: pa.Table) -> pa.Table:
        dmin = pd.to_datetime(pd.Series(b["dmin"].to_pylist()))
        dmax = pd.to_datetime(pd.Series(b["dmax"].to_pylist()))
        if len(dmin) == 0:
            return pa.table({"fide_id": pa.array([], pa.string()),
                             "lo_excl": pa.array([], pa.string()),
                             "hi_excl": pa.array([], pa.string())})
        lo = (dmin - pd.Timedelta(days=1)).dt.to_period("M") + 1
        hi = (dmax + pd.Timedelta(days=1)).dt.to_period("M") - 1
        keep = (lo <= hi).to_numpy()
        ids = np.asarray(b["fide_id"].to_pylist(), dtype=object)[keep]
        return pa.table({
            "fide_id": pa.array(ids, pa.string()),
            "lo_excl": pa.array(
                lo.dt.strftime("%Y-%m-01").to_numpy()[keep], pa.string()),
            "hi_excl": pa.array(
                hi.dt.strftime("%Y-%m-01").to_numpy()[keep], pa.string()),
        })

    return agg.map_batches(_win, batch_format="pyarrow")


# per-worker-process cache of the assembled watermark lookup (one build
# per worker, reused across that worker's expansion tasks)
_WM_CACHE: dict[str, dict] = {}


def _watermark_lookup(wref) -> dict[str, tuple[str, str]]:
    """fide_id → (lo_excl, hi_excl) built INSIDE the worker from plasma
    block refs (zero-copy reads; the driver never assembles the dict)."""
    if wref is None:
        return {}
    key = wref.hex()
    hit = _WM_CACHE.get(key)
    if hit is None:
        hit = {}
        for t in ray.get(ray.get(wref)):
            if t.num_rows == 0:  # empty blocks may carry a 0-col schema
                continue
            hit.update(zip(
                t["fide_id"].to_pylist(),
                zip(t["lo_excl"].to_pylist(), t["hi_excl"].to_pylist())))
        while len(_WM_CACHE) >= 4:
            _WM_CACHE.pop(next(iter(_WM_CACHE)))
        _WM_CACHE[key] = hit
    return hit


def partition_by_shard(rows: pa.Table, n_shards: int) -> dict[int, np.ndarray]:
    """host → owning-shard row index map (THE routing rule; every caller
    that talks to shards must use this one function so routing and the
    restored per-host state can never disagree). Vectorized: crc32 runs
    once per DISTINCT host (pandas factorize), not per row — offer
    batches are dominated by one host."""
    codes, uniques = pd.factorize(
        pd.Series(rows["host"].to_pylist(), dtype="object"))
    if (codes == -1).any():  # factorize maps null → -1; fail fast like
        raise ValueError("null host in frontier rows")  # shard_of would
    owner = np.array([shard_of(h, n_shards) for h in uniques],
                     dtype=np.int64)
    shard_per_row = owner[codes]
    return {int(s): np.flatnonzero(shard_per_row == s)
            for s in np.unique(shard_per_row)}


def partition_by_salt(rows: pa.Table, n_filters: int) -> dict[int, np.ndarray]:
    """url_hash-salt → seen-filter row index map (THE bank routing rule,
    mirroring partition_by_shard; vectorized — the salt is a numpy
    reduction over the SHA1 bytes, no per-row Python)."""
    salts = salt_of_hashes(sha1_bytes_to_array(rows["url_hash"].to_pylist()),
                           n_filters)
    return {int(s): np.flatnonzero(salts == s) for s in np.unique(salts)}


def offer_rows(filters, shards, rows: pa.Table) -> dict:
    """Two-hop admission — the salted enqueue path (north rule's hot-host
    skew handling). Hop 1 salt-partitions by url_hash to the seen-filter
    bank (parallel across the bank even when ONE host dominates); hop 2
    host-partitions the admitted survivors to the owning politeness
    shard. Survivor volume is bounded by true frontier growth, so the
    hot shard's serialized work no longer scales with offer traffic."""
    if rows.num_rows == 0:
        return {"offered": 0, "enqueued": 0}
    futs = [filters[s].admit.remote(rows.take(idx))
            for s, idx in partition_by_salt(rows, len(filters)).items()]
    admitted = [t for t in ray.get(futs) if t.num_rows]
    if not admitted:
        return {"offered": rows.num_rows, "enqueued": 0}
    adm = pa.concat_tables(admitted)
    stats = ray.get([shards[s].offer.remote(adm.take(idx)) for s, idx
                     in partition_by_shard(adm, len(shards)).items()])
    return {"offered": rows.num_rows,
            "enqueued": sum(s["enqueued"] for s in stats)}


def _save_frontier_snapshots(out_dir: str, shards, filters) -> None:
    """Checkpoint BOTH actor banks (politeness shards + seen filters);
    resume needs the pair or the restored frontier would re-admit every
    pending URL's duplicates (or worse, refetch admitted ones)."""
    all_snaps = ray.get([s.snapshot.remote() for s in shards]
                        + [f.snapshot.remote() for f in filters])
    store.save_shard_snapshots(out_dir, all_snaps[:len(shards)])
    store.save_shard_snapshots(out_dir, all_snaps[len(shards):],
                               prefix="seenfilter", id_key="filter_id")


# single-task tier bound for the epoch-expansion URL dedup (tests patch
# this to force the distributed dedup_dataset path)
EXPANSION_DEDUP_MAX_SINGLE = 2_000_000


@ray.remote
def _dedup_urls_task(*tables: pa.Table) -> pa.Table:
    """Small-expansion canonical URL dedup (keep the min-priority copy
    per url) in one task: stable sort by priority, first occurrence per
    url wins. Exact same survivors as dedup_dataset(key=url,
    order=priority) — priorities are unique (pack_priority is
    range-guarded), so there are no order ties."""
    live = live_arrow(tables)
    if not live:
        return tables[0] if tables else pa.table({})
    t = pa.concat_tables(live)
    prio = t["priority"].to_numpy(zero_copy_only=False)
    order = np.argsort(prio, kind="stable")
    t = t.take(pa.array(order.astype(np.int64)))
    df = pd.Series(t["url"].to_pylist())
    keep = ~df.duplicated(keep="first")
    return t.filter(pa.array(keep.to_numpy()))


def make_expander(months, wm_ref=None):
    """Expansion stage (pure compute, no RPCs): accepted search results →
    frontier URL rows (M7+M8 month walk, canonicalize+SHA1). Split from
    the offer stage so it parallelizes freely — the offers that follow
    are only safe to fan out AFTER the epoch's canonical dedup (see
    _run_search). ``wm_ref`` is a ray.put ref of watermark BLOCK refs;
    the per-player lookup is assembled inside each worker
    (_watermark_lookup, cached per process) — never on the driver."""

    def _expand(results: pa.Table) -> pa.Table:
        return P.expand_frontier_batch(results, months,
                                       _watermark_lookup(wm_ref))

    return _expand


def make_offer_stage(filters, shards):
    """Offer stage: route pre-deduped URL rows through the salted bank to
    the owning shards directly from the task (no driver collection — the
    scalable enqueue path). A plain task function: actor handles
    serialize into task closures, and tasks avoid per-epoch actor-pool
    spin-up.

    CONTRACT: input rows must contain each url_hash at most once across
    the WHOLE epoch (the caller dedups to the min-priority copy first).
    Concurrent offer tasks then cannot race on first-offer-wins
    admission, so the admitted set — and with it the exact crawl order
    vs the sequential reference — is independent of task scheduling.
    The r2 router that interleaved expansion and offers serialized the
    whole expansion behind per-batch RPC round-trips (~12 s of the
    heavy-crawl wall time in ONE task); this split is both faster and
    deterministic."""

    def _offer(rows: pa.Table) -> pa.Table:
        stats = offer_rows(filters, shards, rows)
        return pa.table(
            {
                "offered": pa.array([stats["offered"]], pa.int64()),
                "enqueued": pa.array([stats["enqueued"]], pa.int64()),
            }
        )

    return _offer


class CrawlResult:
    def __init__(self, out_dir: str, shards, filters, epochs: int):
        self.out_dir = out_dir
        self.shards = shards
        self.filters = filters
        self.epochs = epochs

    def stats(self) -> list[dict]:
        """Politeness-shard stats followed by seen-filter stats (offered /
        robots_dropped / dup_dropped live in the filters; popped /
        enqueued / pending in the shards)."""
        return ray.get([s.stats.remote() for s in self.shards]
                       + [f.stats.remote() for f in self.filters])

    def fetch_log(self) -> list[tuple[int, int, str]]:
        """Merged crawl order: per-shard logs in global priority order
        with virtual-time tiebreak. Requires ``run_crawl(...,
        record_log=True)`` — the log is opt-in (ordering tests only) so
        the hot shard path carries no unbounded state in production."""
        logs = ray.get([s.get_fetch_log.remote() for s in self.shards])
        merged = [e for log in logs for e in log]
        merged.sort(key=lambda e: (e[1], e[0]))  # (priority, vts)
        return merged

    def seen_hashes(self) -> set[bytes]:
        sets = ray.get([f.seen_hashes.remote() for f in self.filters])
        return set(b for s in sets for b in s)

    def game_history(self):
        return store.read_all(self.out_dir, "game_history")

    def players(self):
        return store.read_all(self.out_dir, "players")

    def docs(self):
        return store.read_all(self.out_dir, "docs")

    def frontier_ops(self) -> int:
        return sum(s.get("offered", 0) + s.get("popped", 0) for s in self.stats())

    def pages(self) -> int:
        return sum(s.get("popped", 0) for s in self.stats())


def run_crawl(
    cfg: synth.SiteConfig,
    out_dir: str,
    seeds: list[str] | None = None,
    n_shards: int = 2,
    n_seen_filters: int | None = None,
    pop_budget: int = 100_000,
    fetch_concurrency: int = 4,
    batch_size: int = 128,
    politeness_gap_us: int = 1_000_000,
    start_month: str | None = None,
    end_month: str | None = None,
    incremental_store=None,
    player_store=None,
    resume: bool = False,
    max_epochs: int | None = None,
    finalize: bool = True,
    persist_docs: bool = True,
    persist_games: bool = True,
    checkpoint_every: int = 1,
    record_log: bool = False,
    max_pending_inmem: int | None = None,
    spill_chunk: int = 4096,
) -> CrawlResult:
    """Run the crawl to frontier exhaustion (or ``max_epochs``, for the
    checkpoint/resume tests). ``pop_budget`` is PER SHARD (see module
    docstring — an epoch fetches ≤ n_shards × pop_budget pages). A fresh
    run (resume=False) into a previously-used out_dir clears the
    engine's own store/checkpoint subdirectories first; resume=True
    validates n_shards against the checkpoint and refuses to start from
    a manifest whose shard snapshots are missing."""
    _t_setup = time.perf_counter()
    months = [m for m in synth.months_of(cfg)
              if (start_month is None or m >= start_month)
              and (end_month is None or m <= end_month)]
    if seeds is None:
        seeds = synth.seed_queries(cfg)

    # pending-queue spill (10^10-URL frontiers): opt-in bound on each
    # shard's in-memory pending set; the overflow lives as priority-sorted
    # chunk files under out_dir/spill and reloads in exact pop order
    spill_dir = (os.path.join(out_dir, "spill")
                 if max_pending_inmem is not None else None)
    shards = [
        FrontierShard.remote(k, n_shards, politeness_gap_us=politeness_gap_us,
                             record_log=record_log,
                             max_pending_inmem=max_pending_inmem,
                             spill_dir=spill_dir, spill_chunk=spill_chunk)
        for k in range(n_shards)
    ]
    # salted URL-seen bank: partitioned by url-hash salt, NOT host, so a
    # dominant host's duplicate-heavy offer traffic parallelizes (north
    # rule). Defaults to n_shards actors; size it to offer volume, which
    # is independent of host skew by construction.
    n_filters = n_seen_filters if n_seen_filters is not None else n_shards
    filters = [SeenFilterShard.remote(k, n_filters) for k in range(n_filters)]
    # fire-and-forget warm-up: the FIRST pa.Table argument a fresh actor
    # deserializes costs ~0.45 s (arrow/ray serialization first-touch);
    # a 0-row table exercises exactly that path and returns before any
    # state is read (admit/offer early-exit on num_rows == 0). Actor
    # tasks run in submission order, so by the time real traffic
    # arrives the cost is already paid — measured: first offer_rows
    # 0.96 s → 0.05 s. No ray.get: it overlaps the rest of setup.
    _empty = U.make_url_rows([], [], [], [], [], [])
    _warm_refs = ([f.admit.remote(_empty) for f in filters]
                  + [s.offer.remote(_empty) for s in shards])  # noqa: F841
    epoch0 = 0
    if not resume and store.load_manifest(out_dir) is not None:
        # a FRESH run into a previously-used out_dir would otherwise
        # merge the old run's surviving epoch partitions into this run's
        # stores (read_all lists every epoch= dir) — clear the engine's
        # own artifacts (never anything else in the directory)
        for sub in ("docs", "players", "games_raw", "game_history",
                    "checkpoint", "spill"):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
    manifest = store.load_manifest(out_dir) if resume else None
    if manifest is not None:
        if manifest.get("n_shards") != n_shards:
            raise RuntimeError(
                f"resume with n_shards={n_shards} but the checkpoint was "
                f"written with n_shards={manifest.get('n_shards')}: per-host "
                "state would be routed to the wrong shards"
            )
        if manifest.get("n_seen_filters") != n_filters:
            raise RuntimeError(
                f"resume with n_seen_filters={n_filters} but the checkpoint "
                f"was written with {manifest.get('n_seen_filters')}: url-hash "
                "salts would route seen-state to the wrong filters"
            )
        snaps = store.load_shard_snapshots(out_dir, n_shards)
        fsnaps = store.load_shard_snapshots(out_dir, n_filters,
                                            prefix="seenfilter")
        if snaps is None or fsnaps is None:
            # refusing beats silently starting an empty crawl that then
            # marks itself finished with zero output
            raise RuntimeError(
                "resume requested but shard/filter snapshots are missing "
                "or incomplete; restart without resume=True"
            )
        ray.get([shards[s["shard_id"]].restore.remote(s) for s in snaps]
                + [filters[s["filter_id"]].restore.remote(s) for s in fsnaps])
        epoch0 = manifest["completed_epochs"]
    if manifest is None:
        # robots: fetch + parse robots.txt once per known host, push rules
        # into the owning shard (engine-added; reference has none)
        for host in (synth.SEARCH_HOST, synth.RATINGS_HOST):
            doc = synth.render_url(cfg, synth.robots_url(host))
            rules = [s["text"].split("|", 1)[1] for s in doc["spans"]
                     if s["kind"] == "field" and s["text"].startswith("disallow|")]
            # rules live in the seen-filter bank (replicated — admission
            # happens there, BEFORE the seen insert, so disallowed URLs
            # stay unseen)
            ray.get([f.set_robots.remote(host, rules) for f in filters])

        # watermarks from an existing store (incremental crawl, ST3/A11):
        # computed and kept as a Dataset, persisted as a parquet sidecar
        # (crash-safe for resume), shipped to expanders as block refs —
        # player-cardinality state never materializes on the driver
        wm_ds = None
        if incremental_store is not None:
            wm_ds = watermark_windows_ds(incremental_store).materialize()
            store.write_epoch(wm_ds, out_dir, "watermarks", 0)

        # ST2 player-store cache: pre-seed the URL-seen filters with the
        # profile URLs of players already stored, so they are never
        # refetched (the legacy monolith's check-then-scrape semantic,
        # reference old_scripts/fide-player-stats-en-US.py:211-231; the
        # current app lost it and always refetches, :118-120 — the engine
        # keeps the stronger cached behavior, SURVEY.md ST2)
        if player_store is not None:
            known = player_store.unique("fide_id")
            if known:
                rows = U.make_url_rows(
                    [synth.profile_url(p) for p in known],
                    ["profile"] * len(known), list(known), [""] * len(known),
                    [""] * len(known), [0] * len(known),
                )
                ray.get([filters[s].mark_seen.remote(rows.take(idx))
                         for s, idx in
                         partition_by_salt(rows, n_filters).items()])

        # seed offers: one search URL per seed query, in seed order
        seed_rows = U.make_url_rows(
            [synth.search_url(q) for q in seeds],
            ["search"] * len(seeds),
            [""] * len(seeds),
            [""] * len(seeds),
            [""] * len(seeds),
            [U.pack_priority(i, 0, U.KIND_SEARCH, 0) for i in range(len(seeds))],
        )
        offer_rows(filters, shards, seed_rows)
        # snapshots BEFORE manifest: the manifest's existence is the
        # resume signal, so it must never exist without its snapshots
        # (a crash between the two would otherwise make resume raise)
        _save_frontier_snapshots(out_dir, shards, filters)
        store.save_manifest(out_dir, {
            "completed_epochs": 0, "finished": False, "n_shards": n_shards,
            "n_seen_filters": n_filters,
            # the watermark sidecar (written above, before the manifest)
            # survives a crash DURING epoch 0, or resume would re-crawl
            # every month the incremental store already covers
            "has_watermarks": wm_ds is not None,
        })
    else:
        wm_ds = None
        if manifest.get("has_watermarks"):
            wm_ds = store.read_all(out_dir, "watermarks")
            wm_ds = wm_ds.materialize() if wm_ds is not None else None
    # block refs wrapped in one plasma object; wm_ds stays bound for the
    # whole crawl so the blocks cannot be released mid-run
    wm_ref = (ray.put(wm_ds.to_arrow_refs())
              if wm_ds is not None and wm_ds.count() > 0 else None)

    if os.environ.get("FCRAY_TIMING"):
        print(f"[setup] actors+seeds+snapshots="
              f"{time.perf_counter() - _t_setup:.2f}s", flush=True)
    epoch = epoch0
    # per-SHARD pop budget: a hot host concentrates in one shard (that is
    # what makes its politeness state consistent), so dividing the budget
    # by n_shards would starve the epoch to pop_budget/n_shards pages
    # whenever one host dominates — exactly the fide.com skew case.
    per_shard_budget = max(1, pop_budget)
    base_manifest = store.load_manifest(out_dir) or {}
    epochs_meta: dict[str, dict] = dict(base_manifest.get("epochs", {}))
    while True:
        if max_epochs is not None and epoch - epoch0 >= max_epochs:
            return CrawlResult(out_dir, shards, filters, epoch)
        _t0 = time.perf_counter()
        pops = ray.get([s.pop_ready.remote(per_shard_budget) for s in shards])
        tables = [t for t in pops if t is not None and t.num_rows > 0]
        if not tables:
            break
        url_table = pa.concat_tables(tables)
        _t_pop = time.perf_counter() - _t0

        def _kind_ds(kind: str):
            sub = url_table.filter(pa.compute.equal(url_table["kind"], kind))
            if sub.num_rows == 0:
                return None
            # search pages are ~750× heavier downstream (each expands to
            # O(results × months) URL rows in the FUSED parse+expand
            # stage), so they get small blocks for parallelism
            rpb = 8 if kind == "search" else batch_size
            nb = max(1, min(4 * fetch_concurrency,
                            math.ceil(sub.num_rows / rpb)))
            return rd.from_arrow(sub).repartition(nb)

        # URL kind is known BEFORE fetching, so each page type runs as its
        # own fetch→parse pipeline. Every URL is fetched EXACTLY ONCE:
        # when the docs store is on, each kind's fetched span documents
        # are materialized (bounded by the per-epoch pop budget) so the
        # parse branch and the docs partition share one fetch pass — the
        # earlier design ran a second all-docs fetch pipeline just for
        # the store, doubling the crawl's dominant cost (and, with a real
        # HTTP fetcher, its request traffic) every epoch. With the store
        # off, the fetch→parse pipelines stay fused and fully streaming.
        fetch_fn = P.make_fetch_fn(cfg)
        fetched_for_docs: list = []  # thread-safe appends (GIL)

        def _fetched(kind: str):
            ds = _kind_ds(kind)
            if ds is None:
                return None
            f = ds.map_batches(fetch_fn, batch_format="pyarrow",
                               batch_size=batch_size)
            if persist_docs:
                f = f.materialize()
                fetched_for_docs.append(f)
            return f

        # The three per-kind pipelines are independent — drive them from
        # concurrent driver threads so their fixed per-execution overheads
        # and compute phases overlap (serially they add ~2s × pipelines ×
        # epochs of pure dead time). All joined before the next pop.
        def _run_search() -> int:
            fetched = _fetched("search")
            if fetched is None:
                return 0
            # expand (pure compute, repartitioned so one search block
            # doesn't serialize it) → canonical min-priority dedup per
            # url_hash (a duplicate URL reached from two search results
            # must admit its FIRST-encounter copy — min priority — no
            # matter how offer tasks interleave; this reproduces the
            # sequential reference's first-offer-wins order exactly,
            # pinned by test_crawl_ordering_exact) → fanned-out offers.
            expander = make_expander(months, wm_ref)

            def _parse_expand(b: pa.Table) -> pa.Table:
                # fused: parse + expand in one stage (no intermediate
                # shuffle; _kind_ds already gives search small blocks)
                return expander(P.parse_search_batch(b))

            _ts = time.perf_counter()
            expanded = fetched.map_batches(
                _parse_expand, batch_format="pyarrow",
            ).materialize()  # bounded: one epoch's expansion
            if os.environ.get("FCRAY_TIMING"):
                print(f"[search] expand={time.perf_counter() - _ts:.2f}s",
                      flush=True)
            _ts = time.perf_counter()
            # dedup key is the canonical url STRING (url_hash is its
            # sha1 — same identity; _key_sig hashes string columns).
            # Below the guard, ONE explicit task sorts + keeps-first —
            # the full dedup_dataset pipeline costs ~3 s of fixed
            # Dataset executions, which dominates small-crawl epochs.
            small = expanded.count() <= EXPANSION_DEDUP_MAX_SINGLE
            if small:
                # ONE explicit task; the table comes back as a ref and
                # feeds the driver-RPC offer fan-out directly below
                dedup_ref = _dedup_urls_task.remote(*expanded.to_arrow_refs())
            else:
                deduped = DD.dedup_dataset(expanded, key_cols=("url",),
                                           order_col="priority")
            if os.environ.get("FCRAY_TIMING"):
                print(f"[search] dedup={time.perf_counter() - _ts:.2f}s",
                      flush=True)
            _ts = time.perf_counter()
            if small:
                # small tier: offer via the same salt/shard routing the
                # distributed stage uses (offer_rows == seed path), from
                # the driver — skips one whole Dataset execution (~0.5 s
                # of fixed cost per epoch); the big tier keeps offers
                # inside tasks where volume demands it
                tbl = ray.get(dedup_ref)
                offer_rows(filters, shards, tbl)
                n = tbl.num_rows
            else:
                n = deduped.map_batches(
                    make_offer_stage(filters, shards),
                    batch_format="pyarrow", batch_size=16384, num_cpus=0.1,
                ).count()  # forces offers to complete before the next pop
            if os.environ.get("FCRAY_TIMING"):
                print(f"[search] offers={time.perf_counter() - _ts:.2f}s",
                      flush=True)
            return n

        def _run_profiles() -> int:
            fetched = _fetched("profile")
            if fetched is None:
                return 0
            players = fetched.map_batches(P.parse_profile_batch,
                                          batch_format="pyarrow")
            return store.write_epoch(players, out_dir, "players", epoch)

        def _run_calcs() -> int:
            fetched = _fetched("calc")
            if fetched is None:
                return 0
            games = fetched.map_batches(P.parse_calc_batch,
                                        batch_format="pyarrow")
            # persist_games=False: throughput benches measure the
            # fetch+parse+frontier path without the shared single-node
            # disk (a real cluster's store bandwidth scales with nodes)
            return (store.write_epoch(games, out_dir, "games_raw", epoch)
                    if persist_games else games.count())

        _t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=3) as pool:
            f_search = pool.submit(_run_search)
            f_profiles = pool.submit(_run_profiles)
            f_games = pool.submit(_run_calcs)
            f_search.result()
            n_players = f_profiles.result()
            n_games = f_games.result()
        if os.environ.get("FCRAY_TIMING"):
            print(f"[epoch {epoch}] urls={url_table.num_rows} "
                  f"pop={_t_pop:.2f}s pipelines="
                  f"{time.perf_counter() - _t0:.2f}s", flush=True)

        n_docs = 0
        if fetched_for_docs:
            docs_all = fetched_for_docs[0]
            if len(fetched_for_docs) > 1:
                docs_all = docs_all.union(*fetched_for_docs[1:])
            n_docs = store.write_epoch(docs_all, out_dir, "docs", epoch)

        # per-partition lineage: what this epoch consumed and produced
        epochs_meta[str(epoch)] = {
            "urls_fetched": int(url_table.num_rows),
            "priority_min": int(pa.compute.min(url_table["priority"]).as_py()),
            "priority_max": int(pa.compute.max(url_table["priority"]).as_py()),
            "docs_rows": n_docs, "players_rows": n_players,
            "games_raw_rows": n_games,
        }
        epoch += 1
        if checkpoint_every and (epoch - epoch0) % checkpoint_every == 0:
            _save_frontier_snapshots(out_dir, shards, filters)
            store.save_manifest(out_dir, {
                "completed_epochs": epoch, "finished": False, "n_shards": n_shards,
                "n_seen_filters": n_filters,
                "has_watermarks": wm_ref is not None,
                "epochs": epochs_meta,
            })

    _t_fin = time.perf_counter()
    if finalize:
        finalize_game_history(out_dir)
    if os.environ.get("FCRAY_TIMING"):
        print(f"[finalize] {time.perf_counter() - _t_fin:.2f}s", flush=True)
    m = store.load_manifest(out_dir) or {}
    m["finished"] = True
    m["completed_epochs"] = epoch
    m["epochs"] = epochs_meta
    m["metrics"] = {
        "shards": ray.get([s.stats.remote() for s in shards]),
        "seen_filters": ray.get([f.stats.remote() for f in filters]),
        "epochs": epochs_meta,
    }
    store.save_manifest(out_dir, m)
    return CrawlResult(out_dir, shards, filters, epoch)


FINALIZE_MAX_SINGLE_ROWS = 2_000_000


@ray.remote
def _finalize_small_task(tmp_dir: str, *tables: pa.Table) -> int:
    """Small-store finalize in ONE task: normalize + keep-first dedup +
    dropna + parquet write. Same semantics as the Dataset path — min
    lineage per DEDUP_KEY; tied mins keep the candidate earliest in
    block order, which the stable lexsort preserves; surviving rows stay
    in input order (np.sort of the kept indices). The Dataset path costs
    ~4 fixed pipeline executions (~1.9 s) that dominate small crawls;
    above FINALIZE_MAX_SINGLE_ROWS the distributed path runs instead
    (pinned identical by test)."""
    import pyarrow.parquet as pq

    live = [NZ.normalize_games_batch(x) for x in tables if x.num_rows > 0]
    if not live:
        return 0
    t = pa.concat_tables(live)
    sig = DD._key_sig(t, DD.DEDUP_KEY)
    order = t["lineage"].to_numpy(zero_copy_only=False)
    perm = np.lexsort((order, sig))  # stable: input order breaks ties
    s = sig[perm]
    first = np.r_[True, s[1:] != s[:-1]]
    t = t.take(pa.array(np.sort(perm[first]).astype(np.int64)))
    t = NZ.drop_null_batch(t)
    if t.num_rows:
        pq.write_table(t, os.path.join(tmp_dir, "part-0.parquet"))
    return t.num_rows


def finalize_game_history(
        out_dir: str,
        max_single_rows: int | None = None) -> None:
    """games_raw (all epochs) → normalize → dedup keep-first → dropna →
    game_history store (reference process_game_history + DB dedup)."""
    raw = store.read_all(out_dir, "games_raw")
    if raw is None:
        return
    if max_single_rows is None:
        max_single_rows = FINALIZE_MAX_SINGLE_ROWS
    if raw.count() <= max_single_rows:
        final = store.epoch_dir(out_dir, "game_history", 0)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        n = ray.get(_finalize_small_task.remote(tmp, *raw.to_arrow_refs()))
        if n == 0:
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(final, exist_ok=True)  # empty partition marker
        else:
            os.rename(tmp, final)
        return
    # materialize the normalized rows once: dedup makes two passes over
    # its input (partial-min scan + probe scan) — without this the read +
    # normalize would execute twice. Bounded: the crawl's own game store.
    ds = raw.map_batches(NZ.normalize_games_batch, batch_format="pyarrow").materialize()
    ds = DD.dedup_dataset(ds)
    ds = ds.map_batches(NZ.drop_null_batch, batch_format="pyarrow")
    store.write_epoch(ds, out_dir, "game_history", 0)
