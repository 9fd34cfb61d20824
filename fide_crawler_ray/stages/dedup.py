"""Exact windowed dedup (D1/D2) — vectorized, no per-group Python.

Reference semantics (database/database_management.py:56-71): ROW_NUMBER()
OVER (PARTITION BY date, tournament_name, player_name, opponent_name,
result ORDER BY id), keep rn=1 — keep the first-inserted row per 5-col
key. The engine carries an explicit ``lineage`` column (crawl-order
monotone, stages/parse.py) instead of an autoincrement id.

Execution plan — two cheap map passes instead of an all-to-all shuffle:

1. per-row 128-bit content signature: two keyed 64-bit hashes (kept as a
   pair of uint64s — collision-free in practice at 10^10 keys; the
   synth-vs-reference parity tests pin exactness).
2. partial min-lineage per signature per batch (pandas groupby — one row
   per distinct key per batch).
3. partials coalesce into ONE small task (one row per distinct key,
   with the global occurrence count carried along) — the classic
   pre-aggregate/combine: the partial table is ~32 B/key, so even 10^8
   keys combine in one ~3 GB task; past ``max_combine_rows`` partial
   rows a cardinality guard reroutes to ``dedup_dataset_join`` (hash
   groupby + Dataset.join) automatically.
4. the combined (signature, min lineage, count) table ships by ref;
   each probe worker merges the blocks once (cached), prunes to keys
   with global count ≥ 2 — pruning must happen HERE, after the
   cross-block merge, or a dup key whose partials straddle combine
   calls would silently survive — and keeps rows whose lineage equals
   their key's minimum (vectorized searchsorted probe).

Why not ``groupby().map_groups(head(1))``: one Python call per group —
92 s at sf0.1 (~500k groups). Why not aggregate+join: two all-to-all
exchanges of the full dataset — 20 s. This plan: seconds, and the only
data movement is the tiny partial-min table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .fastagg import live_arrow

from ..schema import DEDUP_KEY

# exactly 16 chars each AND distinct — the r2-interim 17-byte literals
# truncated to the SAME 16 bytes, silently collapsing the "128-bit"
# signature to 64 bits (expected birthday collisions at the 10^10-key
# scale the join fallback exists for)
_HKEY_1 = "fcray-dedup-sd-1"
_HKEY_2 = "fcray-dedup-sd-2"
assert len(_HKEY_1) == len(_HKEY_2) == 16 and _HKEY_1 != _HKEY_2
_SIG_DT = np.dtype([("a", np.uint64), ("b", np.uint64)])


_MIX = np.uint64(0x9E3779B97F4A7C15)


def _key_sig(batch: pa.Table, key_cols) -> np.ndarray:
    """(n,) structured array of two keyed uint64 hashes (128-bit sig).

    Hashes each key column independently (vectorized) and mixes the
    per-column hashes with rotate+multiply — avoids materializing a
    concatenated key string per row, which dominated dedup time on wide
    multi-column keys."""
    n = batch.num_rows
    a = np.zeros(n, dtype=np.uint64)
    b = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, c in enumerate(key_cols):
            col_t = batch[c]
            if (pa.types.is_binary(col_t.type)
                    or pa.types.is_large_binary(col_t.type)
                    or pa.types.is_fixed_size_binary(col_t.type)):
                # binary keys (url_hash, media payloads): hash the raw
                # bytes — pd.util.hash_array handles object bytes rows
                col = col_t.to_pandas().fillna(b"\x00null")
            else:
                col = col_t.cast(pa.string()).to_pandas().fillna("\x00null")
            arr = col.to_numpy(dtype=object)
            h1 = pd.util.hash_array(arr, hash_key=_HKEY_1)
            h2 = pd.util.hash_array(arr, hash_key=_HKEY_2)
            rot = np.uint64((i * 13) % 64)
            a = (a * _MIX) ^ ((h1 << rot) | (h1 >> (np.uint64(64) - rot)) if rot else h1)
            b = (b * _MIX) ^ ((h2 << rot) | (h2 >> (np.uint64(64) - rot)) if rot else h2)
    sig = np.empty(n, dtype=_SIG_DT)
    sig["a"] = a
    sig["b"] = b
    return sig


def add_key_hash_batch(batch: pa.Table, key_cols=DEDUP_KEY) -> pa.Table:
    """Appends kh1/kh2 int64 signature columns (join-fallback path)."""
    sig = _key_sig(batch, key_cols)
    return batch.append_column(
        "kh1", pa.array(sig["a"].astype(np.int64), pa.int64())
    ).append_column("kh2", pa.array(sig["b"].astype(np.int64), pa.int64()))


def _partial_min(batch: pa.Table, key_cols, order_col: str) -> pa.Table:
    """Per-batch (key → min order, total count, count AT the min). The
    at-min count `m` is what lets the combine detect ORDER TIES — rows
    sharing a key's minimal lineage (identical re-ingested rows, e.g. an
    incremental boundary-month refetch), of which exactly one must
    survive (reference ROW_NUMBER keeps rn=1, never all tied rows)."""
    sig = _key_sig(batch, key_cols)
    df = pd.DataFrame({
        "a": sig["a"].astype(np.int64),
        "b": sig["b"].astype(np.int64),
        "o": batch[order_col].to_numpy(zero_copy_only=False),
    })
    g = df.groupby(["a", "b"], sort=False)["o"]
    m = g.agg(["min", "size"]).reset_index()
    m.columns = ["a", "b", "o", "c"]
    mins = g.transform("min")
    at_min = df[df["o"] == mins].groupby(["a", "b"], sort=False).size()
    m = m.merge(at_min.rename("m").reset_index(), on=["a", "b"])
    return pa.Table.from_pandas(m, preserve_index=False).replace_schema_metadata(None)


@ray.remote
def _combine_all_task(*tables: pa.Table) -> pa.Table:
    """Combine ALL partial blocks in one explicit Ray task → sorted
    DUP-ONLY (a, b, o, c) table.

    Why a raw task and not ``repartition(1).map_batches(batch_size=
    None)``: Ray splits any output block over ``target_max_block_size``
    (128 MB default), so past ~4M partial rows the "single" combine
    silently becomes several per-block calls — and pruning "count < 2"
    inside a call is only sound if the call saw every partial for the
    key (a dup key straddling calls would get c=1 in each and BOTH rows
    would survive). A task receiving every block ref by construction has
    no such failure mode, and pruning here keeps the probe broadcast
    dup-sized (the unique majority never ships).

    Vectorized: one concat + uint64 lexsort + reduceat min/sum. The
    output carries `m` = GLOBAL count of rows at the key's global min
    order (partials at a higher local min contribute zero), so the probe
    can tell apart the normal dup key (one winner) from an ORDER TIE
    (several identical winners, exactly one of which may survive)."""
    return _merge_partials(tables)


def _merge_partials(tables) -> pa.Table:
    """Vectorized merge of partial (a,b,o,c,m) tables → sorted dup-only
    table. Sound ONLY when `tables` together hold EVERY partial row of
    every key they mention (the whole frontier, or one complete hash
    partition of it) — the c>=2 prune needs global counts."""
    tables = live_arrow(tables)  # empties are 0-column
    n = sum(t.num_rows for t in tables)
    a = np.empty(n, dtype=np.uint64)
    b = np.empty(n, dtype=np.uint64)
    o = np.empty(n, dtype=np.int64)
    c = np.empty(n, dtype=np.int64)
    cm = np.empty(n, dtype=np.int64)
    at = 0
    for t in tables:
        k = t.num_rows
        a[at:at + k] = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b[at:at + k] = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        o[at:at + k] = t["o"].to_numpy(zero_copy_only=False)
        c[at:at + k] = t["c"].to_numpy(zero_copy_only=False)
        cm[at:at + k] = t["m"].to_numpy(zero_copy_only=False)
        at += k
    order = np.lexsort((b, a))
    a, b, o, c, cm = a[order], b[order], o[order], c[order], cm[order]
    if n:
        starts = np.flatnonzero(np.concatenate(
            [[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])]))
        lens = np.diff(np.r_[starts, n])
        gmin = np.minimum.reduceat(o, starts)
        # at-min counts only from partials whose local min IS the global min
        cm_tot = np.add.reduceat(
            np.where(o == np.repeat(gmin, lens), cm, 0), starts)
        o = gmin
        c = np.add.reduceat(c, starts)
        cm = cm_tot
        a, b = a[starts], b[starts]
    dup = c >= 2  # global counts — prune is safe here
    return pa.table({
        "a": pa.array(a[dup].astype(np.int64), pa.int64()),
        "b": pa.array(b[dup].astype(np.int64), pa.int64()),
        "o": pa.array(o[dup], pa.int64()),
        "c": pa.array(c[dup], pa.int64()),
        "m": pa.array(cm[dup], pa.int64()),
    })


SINGLE_COMBINE_MAX_ROWS = 4_000_000
DEDUP_COMBINE_PARTS = 32


@ray.remote
def _combine_partition_task(pid: int, n_parts: int,
                            *tables: pa.Table) -> pa.Table:
    """Merge ONE key partition (rows with a ≡ pid mod n_parts) of every
    partial block. Every partial of a key shares `a`, so the partition
    holds ALL rows of its keys and the c>=2 prune stays sound."""
    mine = []
    for t in tables:
        if t.num_rows == 0:
            continue
        au = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mask = (au % n_parts) == pid
        if mask.any():
            mine.append(t.filter(pa.array(mask)))
    return _merge_partials(mine)


@ray.remote
def _finalize_combine_task(*parts: pa.Table) -> pa.Table:
    """Concat + lexsort the partition-combine outputs (dup-only, skinny
    rows) in ONE worker task, so the sorted probe table never
    round-trips through the driver heap — the combine path's design
    goal is keeping its state off the driver, and a driver-side concat
    + single-threaded sort of the full dup table would be a transient
    driver-sized copy in exactly that path."""
    live = [t for t in parts if t.num_rows > 0]
    if not live:
        return pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "o": pa.array([], pa.int64()), "c": pa.array([], pa.int64()),
            "m": pa.array([], pa.int64()),
        })
    t = pa.concat_tables(live)
    au = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
    bu = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((bu, au))
    return t.take(pa.array(order.astype(np.int64)))


def _combine_partitioned(partial_ds, n_parts: int = DEDUP_COMBINE_PARTS):
    """Distributed combine for large partial sets: n_parts parallel
    tasks each read the partial blocks (zero-copy from the local object
    store), filter their key partition (pid = a mod n_parts) and merge
    it independently; a final worker task concats + re-sorts the
    dup-only results for the probe's searchsorted and its ObjectRef is
    handed straight to the probe — no partition result ever lands on
    the driver. The single-task combine above ~4M partial rows was the
    finalize bottleneck (19 s of a 17M-row dedup at 32 CPUs); partition
    tasks bring it to a few seconds.

    Scale note: every task reads every partial block, so cross-node
    traffic is n_parts × |partials| of SKINNY rows (~40 B/row). That is
    the right trade to ~10^8 partial rows; beyond it the caller's
    ``max_combine_rows`` guard reroutes to the hash-join plan whose
    exchange is one-pass."""
    refs = partial_ds.to_arrow_refs()
    return _finalize_combine_task.remote(*[
        _combine_partition_task.remote(pid, n_parts, *refs)
        for pid in range(n_parts)
    ])


@ray.remote
def _tied_reps_task(key_cols, *tables: pa.Table) -> pa.Table:
    """One representative row per TIED key (several rows share the key's
    minimal order — identical re-ingested rows). Stable argsort on the
    key signature keeps, per key, the candidate appearing earliest in
    block order — deterministic because the candidate dataset is
    materialized before its refs are passed here."""
    tabs = live_arrow(tables)
    if not tabs:
        return tables[0]
    t = pa.concat_tables(tabs)
    sig = _key_sig(t, key_cols)
    order = np.argsort(sig, kind="stable")
    s = sig[order]
    first = np.concatenate([[True], s[1:] != s[:-1]])
    return t.take(pa.array(order[first].astype(np.int64)))


# per-worker cache of the deserialized sorted min-table (one build per
# worker process, reused across that worker's probe tasks)
_probe_cache: dict[str, tuple] = {}


def _probe_arrays(ref) -> tuple:
    """Deserialize the single combine-task output (already sorted,
    already dup-pruned) into per-worker probe arrays (keys, mins, tied)
    — one build per worker process, cached by ref."""
    key = ref.hex() if hasattr(ref, "hex") else str(id(ref))
    hit = _probe_cache.get(key)
    if hit is None:
        t = ray.get(ref)
        n = t.num_rows
        keys = np.empty(n, dtype=_SIG_DT)
        keys["a"] = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keys["b"] = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mins = t["o"].to_numpy(zero_copy_only=False)
        tied = t["m"].to_numpy(zero_copy_only=False) >= 2
        hit = (keys, mins, tied)
        # bounded per-key cache (a single clear() made it one-slot and
        # two concurrent dedup pipelines evicted each other per batch)
        while len(_probe_cache) >= 4:
            _probe_cache.pop(next(iter(_probe_cache)))
        _probe_cache[key] = hit
    return hit


# Above this many partial rows (per-batch distinct keys summed — an
# upper bound on true key cardinality), the single-task combine and the
# per-worker probe arrays stop being "small": switch to the
# hash-partitioned join plan automatically.
DEDUP_MAX_COMBINE_ROWS = 20_000_000


def dedup_dataset(ds, key_cols=DEDUP_KEY, order_col: str = "lineage",
                  max_combine_rows: int = DEDUP_MAX_COMBINE_ROWS):
    """D1 over a Dataset — see module docstring for the plan. Past
    ``max_combine_rows`` partial rows the cardinality guard reroutes to
    ``dedup_dataset_join`` (identical output, pinned by
    tests/test_normalize_dedup.py) instead of the broadcast probe."""
    partial = ds.map_batches(
        lambda b: _partial_min(b, key_cols, order_col), batch_format="pyarrow"
    ).materialize()
    n_partial = partial.count()
    if n_partial > max_combine_rows:
        # NOTE the reroute re-hashes the dataset (the partial pass's
        # hashes are discarded): materializing kh columns for reuse would
        # pin a corpus-sized dataset in the object store — re-hashing is
        # the cheaper side at exactly the scale the reroute serves.
        return dedup_dataset_join(ds, key_cols, order_col)
    if n_partial > SINGLE_COMBINE_MAX_ROWS:
        ref = _combine_partitioned(partial)
    else:
        ref = _combine_all_task.remote(*partial.to_arrow_refs())

    def _probe(batch: pa.Table) -> pa.Table:
        ks, ms, td = _probe_arrays(ref)
        if len(ks) == 0:
            return batch  # no key occurs twice: input already deduped
        sig = _key_sig(batch, key_cols)
        idx = np.clip(np.searchsorted(ks, sig), 0, len(ks) - 1)
        is_dup_key = ks[idx] == sig
        at_min = (batch[order_col].to_numpy(zero_copy_only=False) == ms[idx])
        # unique keys kept; dup keys keep the min-order row — except keys
        # whose min is TIED (several identical rows share it): those are
        # dropped here and re-emitted exactly once by the representative
        # side channel below (keeping all tied copies would emit
        # duplicates; the reference ROW_NUMBER semantics keep rn=1)
        keep = ~is_dup_key | (at_min & ~td[idx])
        return batch.filter(pa.array(keep))

    main = ds.map_batches(_probe, batch_format="pyarrow")

    # tied-key representatives: the combine's dup table is the broadcast
    # small side already, so the driver may inspect it; ties are rare
    # (identical re-ingested rows) and their candidate rows are a tiny
    # subset, gathered in one task that keeps the first copy per key.
    comb = ray.get(ref)
    if comb.num_rows == 0 or not np.any(
            comb["m"].to_numpy(zero_copy_only=False) >= 2):
        return main

    def _tied_rows(batch: pa.Table) -> pa.Table:
        ks, ms, td = _probe_arrays(ref)
        sig = _key_sig(batch, key_cols)
        idx = np.clip(np.searchsorted(ks, sig), 0, len(ks) - 1)
        hit = (ks[idx] == sig) & td[idx] & (
            batch[order_col].to_numpy(zero_copy_only=False) == ms[idx])
        return batch.filter(pa.array(hit))

    tied_ds = ds.map_batches(_tied_rows, batch_format="pyarrow").materialize()
    rep_ref = _tied_reps_task.remote(list(key_cols), *tied_ds.to_arrow_refs())
    import ray.data as rd

    return main.union(rd.from_arrow_refs([rep_ref]))


def dedup_dataset_join(ds, key_cols=DEDUP_KEY, order_col: str = "lineage",
                       num_partitions: int = 16):
    """Fallback for key cardinalities too large for the single-task
    combine (>~10^8 distinct keys): vectorized hash groupby of min
    lineage + hash-partitioned Dataset.join, all-to-all but unbounded."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: add_key_hash_batch(b, key_cols), batch_format="pyarrow"
    )
    mins = hashed.groupby(["kh1", "kh2"]).aggregate(
        Min(order_col, alias_name="__min_ord")
    )
    joined = hashed.join(mins, "inner", num_partitions, on=("kh1", "kh2"))

    def _min_first(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b[order_col], b["__min_ord"]))
        # ORDER TIES (several identical rows at the key's min) keep
        # exactly one representative. Sound per-block because the hash
        # join co-partitions every row of a key into one partition and
        # batch_size=None maps whole blocks.
        k1 = b["kh1"].to_numpy(zero_copy_only=False)
        k2 = b["kh2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k2, k1))
        s1, s2 = k1[order], k2[order]
        first = np.concatenate(
            [[True], (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])]) if len(order) else \
            np.zeros(0, dtype=bool)
        keep = np.sort(order[first])
        return b.take(pa.array(keep.astype(np.int64)))

    out = joined.map_batches(_min_first, batch_format="pyarrow",
                             batch_size=None)
    return out.drop_columns(["kh1", "kh2", "__min_ord"])
