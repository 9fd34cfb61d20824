"""Similarity search over an embedding column (list<float>).

- ``BruteForceTopK``: the exact baseline — the query matrix is broadcast
  once (``ray.put`` on the driver, ``ray.get`` once per actor in
  ``__init__``), each batch does one numpy matmul against it and emits
  its local top-k per query; a final small groupby keeps the global
  top-k. Nothing corpus-sized ever leaves the workers.
- ``ivf_assign`` / ``ivf_search``: the scale path — IVF-style bucketing:
  centroids are a deterministic sample of the corpus; vectors are
  assigned to their nearest centroid (one matmul per batch); a query
  probes only the ``nprobe`` nearest buckets, turning top-k into a
  filtered brute-force over a small fraction of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _to_matrix(col) -> np.ndarray:
    """Arrow list<float> column → (n, d) float32 matrix, zero-copy-ish."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _normalize64(m: np.ndarray) -> np.ndarray:
    """float64 unit rows — the precision the tight driver oracles need
    (DuckDB DOUBLE[] cosine agrees with this to ~1e-15; the float32
    path agrees only to ~1e-7, fine for round-4 scores but not for
    1e-6 fixed-point quantization)."""
    m = np.asarray(m, dtype=np.float64)
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)


class BruteForceTopK:
    """map_batches stage: per-batch local top-k cosine scores per query.

    ``precise=True`` normalizes batch vectors and queries in float64
    (instead of float32-normalize-then-cast) so scores match a DuckDB
    DOUBLE replay to ~1e-15 — required by the deterministic IVF driver
    oracle where candidate sets depend on exact rank boundaries."""

    def __init__(self, queries_ref, k: int, precise: bool = False):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.precise = precise
        if precise:
            self.q = _normalize64(q)  # (nq, d) float64
        else:
            self.q = _normalize(np.asarray(q, dtype=np.float32))  # (nq, d)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        # score in float64 so ranking ties out identically with the
        # double-precision oracle; rounding happens only at final output
        m = _to_matrix(batch["embedding"])
        vecs = (_normalize64(m) if self.precise
                else _normalize(m).astype(np.float64))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = vecs @ self.q.T.astype(np.float64)  # (n, nq)
        n, nq = sims.shape
        k = min(self.k, n)
        out_q, out_id, out_s = [], [], []
        for j in range(nq):
            col = sims[:, j]
            idx = np.argpartition(-col, k - 1)[:k] if k < n else np.arange(n)
            for i in idx:
                out_q.append(j)
                out_id.append(int(ids[i]))
                out_s.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


class BruteForceTopKExclude(BruteForceTopK):
    """Hard-negative variant: per-batch local top-k cosine per query,
    EXCLUDING candidates that share the query's label (the contrastive-
    training hard-negative mining primitive). Same broadcast-once /
    one-matmul-per-batch plan as the base class; the label mask is one
    vectorized compare per batch."""

    def __init__(self, queries_ref, qlabels_ref, k: int):
        super().__init__(queries_ref, k)
        ql = (ray.get(qlabels_ref)
              if not isinstance(qlabels_ref, np.ndarray) else qlabels_ref)
        self.qlabels = np.asarray(ql, dtype=np.int64)  # (nq,)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_to_matrix(batch["embedding"])).astype(np.float64)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        labels = batch["label"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        sims = vecs @ self.q.T.astype(np.float64)  # (n, nq)
        # mask same-label candidates per query column
        sims[labels[:, None] == self.qlabels[None, :]] = -np.inf
        n, nq = sims.shape
        k = min(self.k, n)
        out_q, out_id, out_s = [], [], []
        for j in range(nq):
            col = sims[:, j]
            idx = np.argpartition(-col, k - 1)[:k] if k < n else np.arange(n)
            for i in idx:
                if col[i] == -np.inf:
                    continue
                out_q.append(j)
                out_id.append(int(ids[i]))
                out_s.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def hard_negatives_topk(embeddings_ds, queries: np.ndarray,
                        qlabels: np.ndarray, k: int = 10):
    """Exact cosine top-k hard negatives (different label than the
    query): Dataset of (vec_id, embedding, label) → Dataset of
    (query_id, vec_id, score, rank)."""
    qref = ray.put(np.asarray(queries, dtype=np.float32))
    lref = ray.put(np.asarray(qlabels, dtype=np.int64))
    partials = embeddings_ds.map_batches(
        BruteForceTopKExclude, fn_constructor_args=(qref, lref, k),
        batch_format="pyarrow", batch_size=4096, concurrency=4, num_cpus=0.5,
    )
    return partials.groupby("query_id").map_groups(
        topk_reduce(k), batch_format="pandas")


def topk_reduce(k: int):
    """Final per-query merge of local top-ks (groupby map_groups body)."""

    def _f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        g["score"] = g["score"].round(4)  # round only after ranking
        return g

    return _f


def brute_force_topk(embeddings_ds, queries: np.ndarray, k: int = 10,
                     precise: bool = False):
    """Exact cosine top-k: Dataset of (vec_id, embedding) → Dataset of
    (query_id, vec_id, score, rank). ``precise`` → float64 scoring
    (see BruteForceTopK)."""
    qref = ray.put(np.asarray(queries,
                              dtype=np.float64 if precise else np.float32))
    partials = embeddings_ds.map_batches(
        BruteForceTopK, fn_constructor_args=(qref, k, precise),
        batch_format="pyarrow", batch_size=4096, concurrency=4, num_cpus=0.5,
    )
    return partials.groupby("query_id").map_groups(topk_reduce(k), batch_format="pandas")


# ----------------------------------------------------------------- IVF

def sample_centroids(embeddings_ds, n_centroids: int, seed: int = 42) -> np.ndarray:
    """Deterministic centroid sample: the n_centroids corpus vectors with
    the smallest vec_id hash (stable across runs and cluster sizes)."""
    import zlib

    rows = embeddings_ds.map_batches(
        lambda b: pa.table({
            "vec_id": b["vec_id"],
            "h": pa.array([zlib.crc32(f"{seed}:{v}".encode()) for v in b["vec_id"].to_pylist()],
                          pa.int64()),
            "embedding": b["embedding"],
        }),
        batch_format="pyarrow",
    ).sort("h").limit(n_centroids).take_all()
    return _normalize(np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in rows]))


def md5_sample_centroids(embeddings_ds, n_centroids: int,
                         tag: str = "ivf:42") -> np.ndarray:
    """Deterministic AND SQL-replayable centroid sample: the
    ``n_centroids`` corpus vectors with the lexicographically smallest
    ``md5(f"{tag}:{vec_id}")`` hex digest (vec_id tie-break) — DuckDB
    replays the selection as ``ROW_NUMBER() OVER (ORDER BY
    md5(tag || ':' || vec_id), vec_id)``, which crc32 (the
    ``sample_centroids`` key) cannot. Distributed the same way: the key
    is added per batch, one sort + limit moves only n_centroids rows.
    Returns float64 unit rows in digest order (the bucket index both
    engines agree on)."""
    import hashlib

    rows = embeddings_ds.map_batches(
        lambda b: pa.table({
            "vec_id": b["vec_id"],
            "h": pa.array(
                [hashlib.md5(f"{tag}:{v}".encode()).hexdigest()
                 for v in b["vec_id"].to_pylist()], pa.string()),
            "embedding": b["embedding"],
        }),
        batch_format="pyarrow",
    ).sort(["h", "vec_id"]).limit(n_centroids).take_all()
    return _normalize64(np.stack([
        np.asarray(r["embedding"], dtype=np.float32) for r in rows]))


def kmeans_centroids(embeddings_ds, n_centroids: int, iters: int = 5,
                     seed: int = 42) -> np.ndarray:
    """Spherical k-means (Lloyd) for IVF centroids, distributed:

    - init = the deterministic hash sample (``sample_centroids``);
    - per iteration, a map_batches stage assigns each vector to its
      nearest centroid (one matmul) and emits per-centroid PARTIAL sums
      and counts — one k-row table per batch. Only those partials
      (k × d floats per batch, corpus-size-independent) are collected
      and combined; the corpus itself never moves;
    - centroids renormalize each round (cosine geometry). Empty
      centroids keep their previous position.

    Recall impact at sf0.01 (5 queries, k=10): 0.40 with raw sampled
    centroids at nprobe=4/16 → 0.54 after 5 Lloyd rounds → 0.8 at
    nprobe=8/16 (pinned ≥0.7 by the ann_ivf_recall driver query)."""
    import ray

    # iterative consumer: pin the input blocks once instead of re-running
    # the read every Lloyd round (object store spills under pressure)
    embeddings_ds = embeddings_ds.materialize()
    cents = sample_centroids(embeddings_ds, n_centroids, seed)
    k = cents.shape[0]

    def _partial(cref):
        # plain TASK map, not an actor pool: the only state is the k×d
        # centroid block (one tiny ray.get per task), and tasks reuse
        # warm workers across rounds — an actor pool re-spins per round
        # (measured: ~8 s → ~3 s for the 5-round sf0.1 clustering query)
        def _f(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            vecs = _normalize(_to_matrix(batch["embedding"]))
            assign = (vecs @ c.T).argmax(axis=1)
            d = vecs.shape[1]
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, assign, vecs.astype(np.float64))
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table({
                "centroid": pa.array(np.arange(k, dtype=np.int64)),
                "n": pa.array(counts),
                "sum": pa.array(list(sums), pa.list_(pa.float64())),
            })
        return _f

    for _ in range(iters):
        cref = ray.put(cents)
        parts = embeddings_ds.map_batches(
            _partial(cref),
            batch_format="pyarrow", batch_size=4096, num_cpus=0.5,
        ).to_pandas()
        d = cents.shape[1]
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        cids = parts["centroid"].to_numpy()
        np.add.at(counts, cids, parts["n"].to_numpy())
        np.add.at(sums, cids, np.stack(parts["sum"].to_numpy()))
        nonempty = counts > 0
        new = cents.astype(np.float64).copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        cents = _normalize(new.astype(np.float32))
    return cents


class ScopedTopK(BruteForceTopK):
    """Per-query bucket scoping applied to the score matrix BEFORE the
    local top-k (the BruteForceTopKExclude masking pattern): a vector
    outside a query's probed buckets must not occupy one of that
    query's k local slots. (r5 fix — the r4 version filtered AFTER the
    batch-global top-k, silently returning <k results per query; the
    deterministic ann_ivf oracle caught it.) Shared by the in-memory
    and persisted IVF search paths."""

    def __init__(self, queries_ref, probe_ref, k: int,
                 bucket_col: str = "ivf_bucket", precise: bool = False):
        super().__init__(queries_ref, k, precise=precise)
        self.probe = ray.get(probe_ref)
        self.bucket_col = bucket_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"])
        vecs = (_normalize64(m) if self.precise
                else _normalize(m).astype(np.float64))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        buckets = np.asarray(
            batch[self.bucket_col].to_numpy(zero_copy_only=False),
            dtype=np.int64)
        sims = vecs @ self.q.T.astype(np.float64)  # (n, nq)
        for j in range(sims.shape[1]):
            sims[~np.isin(buckets, np.asarray(self.probe[j],
                                              dtype=np.int64)), j] = -np.inf
        n, nq = sims.shape
        kk = min(self.k, n)
        out_q, out_id, out_s = [], [], []
        for j in range(nq):
            col = sims[:, j]
            idx = (np.argpartition(-col, kk - 1)[:kk]
                   if kk < n else np.arange(n))
            for i in idx:
                if col[i] == -np.inf:
                    continue
                out_q.append(j)
                out_id.append(int(ids[i]))
                out_s.append(float(col[i]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int32()),
            "vec_id": pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })


class IvfAssign:
    """Adds an ivf_bucket column: argmax cosine against the centroids.
    Ties break to the lowest centroid index (np.argmax first-max), which
    the SQL replay mirrors with ``ORDER BY cos DESC, cidx``. ``precise``
    runs the float64 path (see BruteForceTopK)."""

    def __init__(self, centroids_ref, precise: bool = False):
        c = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.precise = precise
        self.c = (_normalize64(c) if precise
                  else _normalize(np.asarray(c, dtype=np.float32)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"])
        vecs = _normalize64(m) if self.precise else _normalize(m)
        bucket = (vecs @ self.c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_bucket", pa.array(bucket, pa.int32()))


def ivf_search(embeddings_ds, centroids: np.ndarray, queries: np.ndarray,
               k: int = 10, nprobe: int = 4, precise: bool = False):
    """IVF top-k: probe the nprobe nearest buckets per query, then exact
    cosine within the probed subset. ``precise=True`` computes every
    cosine (assignment, probe ranking, scoring) in float64 with stable
    index tie-breaks so the whole result is exactly replayable in
    DuckDB DOUBLE arithmetic (the deterministic driver-oracle path)."""
    cref = ray.put(np.asarray(centroids,
                              dtype=np.float64 if precise else np.float32))
    assigned = embeddings_ds.map_batches(
        IvfAssign, fn_constructor_args=(cref, precise),
        batch_format="pyarrow", batch_size=4096, concurrency=4, num_cpus=0.5,
    )
    if precise:
        qn = _normalize64(queries)
        cn = _normalize64(centroids)
    else:
        qn = _normalize(np.asarray(queries, dtype=np.float32))
        cn = _normalize(np.asarray(centroids, dtype=np.float32))
    probe = np.argsort(-(qn @ cn.T), axis=1,
                       kind="stable")[:, :nprobe]  # (nq, nprobe)
    wanted = set(int(b) for b in probe.reshape(-1))
    filtered = assigned.map_batches(
        lambda b: b.filter(
            pa.array(np.isin(b["ivf_bucket"].to_numpy(zero_copy_only=False), list(wanted)))
        ),
        batch_format="pyarrow",
    )
    # per-query bucket masks are enforced in the scoring stage: a vector
    # only scores against the queries probing its bucket
    qref = ray.put(qn)
    pref = ray.put(probe)

    partials = filtered.map_batches(
        ScopedTopK, fn_constructor_args=(qref, pref, k, "ivf_bucket", precise),
        batch_format="pyarrow", batch_size=4096, concurrency=4, num_cpus=0.5,
    )
    return partials.groupby("query_id").map_groups(topk_reduce(k), batch_format="pandas")


def build_ivf_store(embeddings_ds, centroids: np.ndarray, out_dir: str):
    """Persist the corpus PARTITIONED BY IVF BUCKET (hive layout, one
    directory per bucket) — the prune-at-the-read contract applied to
    vector search: at rest, a query probing nprobe buckets opens only
    those directories' files; the rest of the corpus is never read.
    The bucket id is ALSO stored as an in-file column ("bucket") so the
    pruned read does not depend on hive-path inference."""
    import shutil

    cref = ray.put(_normalize(np.asarray(centroids, dtype=np.float32)))
    assigned = embeddings_ds.map_batches(
        IvfAssign, fn_constructor_args=(cref,),
        batch_format="pyarrow", batch_size=4096, concurrency=4,
        num_cpus=0.5,
    ).map_batches(lambda b: b.append_column("bucket", b["ivf_bucket"]),
                  batch_format="pyarrow")
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    assigned.write_parquet(tmp, partition_cols=["ivf_bucket"])
    import os

    os.rename(tmp, out_dir)  # atomic publish, store.py's discipline
    return out_dir


def ivf_search_persisted(index_dir: str, centroids: np.ndarray,
                         queries: np.ndarray, k: int = 10,
                         nprobe: int = 4):
    """IVF top-k over the PERSISTED index: per-query nprobe nearest
    buckets → read ONLY those bucket directories (file-level pruning by
    construction) → exact cosine within, scoped per query. Returns
    (result_ds, n_rows_read, n_buckets_read) so callers can assert the
    prune ratio."""
    import glob
    import os

    import ray.data as rd

    qn = _normalize(np.asarray(queries, dtype=np.float32))
    cn = _normalize(np.asarray(centroids, dtype=np.float32))
    probe = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]
    wanted = sorted(set(int(b) for b in probe.reshape(-1)))
    paths = []
    hit_buckets = 0
    for b in wanted:
        fs = sorted(glob.glob(os.path.join(index_dir,
                                           f"ivf_bucket={b}", "*.parquet")))
        if fs:
            hit_buckets += 1
            paths.extend(fs)
    ds = rd.read_parquet(paths, columns=["vec_id", "embedding", "bucket"]) \
        .materialize()
    n_read = ds.count()
    qref = ray.put(qn)
    pref = ray.put(probe)
    partials = ds.map_batches(
        ScopedTopK, fn_constructor_args=(qref, pref, k, "bucket"),
        batch_format="pyarrow", batch_size=4096,
        concurrency=2, num_cpus=0.5,
    )
    res = partials.groupby("query_id").map_groups(
        topk_reduce(k), batch_format="pandas")
    return res, n_read, hit_buckets
