"""Partitioned Parquet store with a resume manifest.

Lance is unavailable in this environment, so the store layer the design
calls for (SURVEY.md §1.3) is implemented as partitioned Parquet — the
same columnar/batch write path (``ds.write_parquet``), laid out one
directory per epoch/partition so a failed run can skip finished
partitions (the "resumable output" contract):

    root/
      docs/epoch=00001/*.parquet        crawled span documents
      players/epoch=00001/*.parquet     PLAYER_DATA rows
      games_raw/epoch=00001/*.parquet   raw parsed game rows (+lineage)
      game_history/*.parquet            final normalized+deduped store
      checkpoint/shard_{k}.pkl          frontier shard snapshots
      checkpoint/MANIFEST.json          {completed_epochs, finished, ...}

Writes are atomic at the partition level: data lands in a ``.tmp``
directory that is renamed into place, and the manifest is only advanced
after the rename — a crashed epoch leaves no half-visible partition.
"""

from __future__ import annotations

import json
import os
import pickle
import shutil

import ray.data as rd


def epoch_dir(root: str, name: str, epoch: int) -> str:
    return os.path.join(root, name, f"epoch={epoch:05d}")


def write_epoch(ds, root: str, name: str, epoch: int) -> int:
    """Write one epoch partition atomically; returns rows written.

    Single pipeline execution: write first, then count from the written
    parquet footers (a pre-count would execute the pipeline twice)."""
    import pyarrow.parquet as pq

    final = epoch_dir(root, name, epoch)
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    ds.write_parquet(tmp)
    n = 0
    # an empty dataset may write no directory at all
    for f in (os.listdir(tmp) if os.path.isdir(tmp) else []):
        if f.endswith(".parquet"):
            n += pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
    if n == 0:
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(final, exist_ok=True)  # empty partition marker
        return 0
    os.rename(tmp, final)
    return n


def read_all(root: str, name: str, max_epoch: int | None = None, **kwargs):
    """Read every completed epoch partition of a table as one Dataset.

    ``max_epoch`` gives snapshot-isolation time travel: only epochs
    ≤ max_epoch are scanned, reproducing exactly the table state after
    that epoch committed (atomic tmp+rename means an epoch is either
    fully visible or absent — there is no torn cut to worry about).

    Expands partitions to explicit file paths: ray.data.read_parquet only
    directory-expands the FIRST of multiple paths, so passing several
    epoch directories fails on the second one.

    ``**kwargs`` pass through to ``read_parquet`` — in particular
    ``columns=[...]`` (column pruning) and ``filter=<pyarrow dataset
    expression>`` (row-group predicate pushdown), so only the needed
    columns/row groups leave storage (S3 pushdown contract; pinned by
    tests/test_report_media.py::test_store_filter_pushdown)."""
    base = os.path.join(root, name)
    files = []
    if os.path.isdir(base):
        entries = sorted(os.listdir(base))
        # vacuum bases: `base=<c>` holds the compacted fold of every
        # epoch ≤ c (and any older base). Readers use only the MAX base
        # and always skip epochs ≤ it and superseded bases — so the
        # not-yet-deleted dirs of a crashed vacuum() delete phase are
        # inert garbage, never a double count (crash consistency).
        vac = max((int(d.split("=", 1)[1]) for d in entries
                   if d.startswith("base=") and not d.endswith(".tmp")
                   and os.path.isdir(os.path.join(base, d))),
                  default=None)
        if vac is not None and max_epoch is not None and max_epoch < vac:
            raise ValueError(
                f"epochs ≤ {vac} of '{name}' were vacuumed; time travel "
                f"to {max_epoch} is gone (vacuum trades old snapshots "
                f"for space)")
        for d in entries:
            if d.endswith(".tmp"):
                continue
            if d.startswith("base=") and d != f"base={vac:05d}":
                continue
            if d.startswith("epoch="):
                try:
                    ep = int(d.split("=", 1)[1])
                except ValueError:
                    ep = None
                if ep is not None:
                    if vac is not None and ep <= vac:
                        continue
                    if max_epoch is not None and ep > max_epoch:
                        continue
            full = os.path.join(base, d)
            if os.path.isdir(full):
                files.extend(
                    os.path.join(full, f)
                    for f in sorted(os.listdir(full))
                    if f.endswith(".parquet")
                )
    if not files:
        return None
    # partitioning=None: the epoch= path component is layout, not data
    kwargs.setdefault("partitioning", None)
    cols = kwargs.pop("columns", None)
    if cols is not None:
        # Ray 2.49: columns + partitioning=None can crash in
        # _infer_columns (unbound partition_columns); apply the
        # projection as a select (the optimizer pushes it into the scan)
        return rd.read_parquet(files, **kwargs).select_columns(cols)
    return rd.read_parquet(files, **kwargs)


def vacuum(root: str, name: str, cutoff: int) -> dict:
    """Expire old epochs (lakehouse VACUUM / snapshot expiry): fold all
    epochs ≤ ``cutoff`` — plus any older base — into one compacted
    ``base=<cutoff>`` dir, then delete the expired dirs. Readers see an
    identical table throughout because read_all (a) ignores ``.tmp``
    dirs, (b) reads only the MAX base and (c) skips epochs ≤ that base:
    before the base rename they see the old view, after it the folded
    view with any straggler dirs inert — so a crash at ANY step leaves
    a consistent store and re-running vacuum() is idempotent. Time
    travel below the base is traded away (read_all raises), exactly the
    lakehouse VACUUM contract. Returns {"base": cutoff, "removed": n}."""
    final = os.path.join(root, name, f"base={cutoff:05d}")
    if not os.path.isdir(final):
        sub = read_all(root, name, max_epoch=cutoff)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        if sub is not None:
            sub.write_parquet(tmp)
        if os.path.isdir(tmp):
            os.rename(tmp, final)
        else:
            os.makedirs(final, exist_ok=True)  # empty base marker
    # delete phase: idempotent, stragglers already invisible to readers
    base_dir = os.path.join(root, name)
    removed = 0
    for d in sorted(os.listdir(base_dir)):
        full = os.path.join(base_dir, d)
        if d == f"base={cutoff:05d}" or not os.path.isdir(full):
            continue
        drop = d.endswith(".tmp")
        if d.startswith("epoch=") and not drop:
            try:
                drop = int(d.split("=", 1)[1]) <= cutoff
            except ValueError:
                pass
        elif d.startswith("base=") and not drop:
            try:
                drop = int(d.split("=", 1)[1]) < cutoff
            except ValueError:
                pass
        if drop:
            shutil.rmtree(full)
            removed += 1
    return {"base": cutoff, "removed": removed}


# ------------------------------------------------------------- manifest

def manifest_path(root: str) -> str:
    return os.path.join(root, "checkpoint", "MANIFEST.json")


def load_manifest(root: str) -> dict | None:
    p = manifest_path(root)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def save_manifest(root: str, manifest: dict) -> None:
    os.makedirs(os.path.join(root, "checkpoint"), exist_ok=True)
    tmp = manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, manifest_path(root))


def save_shard_snapshots(root: str, snapshots: list[dict],
                         prefix: str = "shard",
                         id_key: str = "shard_id") -> None:
    """Atomic per-actor snapshot files. ``prefix``/``id_key`` distinguish
    the politeness shards (``shard_{k}``, keyed ``shard_id``) from the
    salted seen-filter bank (``seenfilter_{k}``, keyed ``filter_id``)."""
    d = os.path.join(root, "checkpoint")
    os.makedirs(d, exist_ok=True)
    for snap in snapshots:
        tmp = os.path.join(d, f"{prefix}_{snap[id_key]}.pkl.tmp")
        with open(tmp, "wb") as f:
            pickle.dump(snap, f)
        os.replace(tmp, os.path.join(d, f"{prefix}_{snap[id_key]}.pkl"))


def load_shard_snapshots(root: str, n_shards: int,
                         prefix: str = "shard") -> list[dict] | None:
    d = os.path.join(root, "checkpoint")
    snaps = []
    for k in range(n_shards):
        p = os.path.join(d, f"{prefix}_{k}.pkl")
        if not os.path.exists(p):
            return None
        with open(p, "rb") as f:
            snaps.append(pickle.load(f))
    return snaps
