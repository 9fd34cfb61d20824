"""Deduplication pipelines over a documents table (doc_id, text, ...).

Five operators, all expressed as Dataset pipelines:

- ``exact_dedup``: md5 fingerprint → hash groupby → keep min doc_id.
- ``minhash_lsh_dedup``: shingle → MinHash → LSH band buckets → candidate
  pairs → exact-Jaccard verification → connected components → survivors.
- ``simhash_dedup``: 64-bit SimHash → bit-band buckets → hamming-verified
  pairs → components → survivors.
- ``ngram_jaccard_pairs``: character-n-gram Jaccard verification over an
  explicit candidate pair set.
- ``embedding_cosine_dedup``: random-hyperplane LSH buckets over the
  embedding column → within-bucket pairwise cosine → pairs → survivors.

Scale contract (everything is a Dataset stage; the corpus and its texts
never land on the driver, and every small-side structure is CARDINALITY
GUARDED — broadcast-by-ref / bounded-driver below a threshold, a
hash-partitioned join / distributed algorithm above it; both sides of
every guard are pinned byte-identical by tests):

- colliding-bucket selection: count≥2 bucket keys → guarded semi-filter
  (``pc.is_in`` with ref-shipped value set, or ``left_semi`` join);
- per-bucket pair generation is ``groupby(band_key).map_groups`` with a
  ``bucket_cap``: oversized buckets (a degenerate band — e.g. an
  all-identical shard of a duplicate-heavy corpus) emit star pairs
  (bucket-min vs member, O(n)) instead of all-pairs O(n²). For the
  all-similar bucket this is exact (components connect through the
  min); for a HETEROGENEOUS oversized bucket it is a recall trade —
  a member-member duplicate neither of which verifies against the
  bucket min is missed in that bucket (it is usually recovered by the
  other bands; LSH candidate generation is probabilistic to begin
  with, and the cap bounds the O(n²) blowup that matters at scale);
- pair verification: small pair sets ship the pair-named texts by ref
  into lookup actors; large ones attach texts with two hash joins
  (pair→text on each end) and stream;
- clustering: small edge sets run a bounded driver union-find; large
  ones run distributed min-label propagation over the edge Dataset
  (iterate: label(n) ← min over n ∪ neighbors until no label changes —
  converges to the component minimum, exactly union-find-by-min-root);
- survivors: guarded anti-filter of docs against dropped labels
  (``pc.is_in``-invert, or ``left_anti`` join).

All dedup operators return ``(survivors_ds, pairs_ds)`` — both lazy
Datasets (r1 returned a driver-side pair list; collecting pairs is now
the caller's choice, and tests do so only at toy scale).

Corpus-scan count: each operator re-executes the ``docs_ds`` lineage up
to three times (band sketch, verification text fetch, survivor filter)
rather than materializing it — pinning a corpus-sized dataset in the
object store costs more than re-running a column-pruned parquet scan at
the 100-TB design point. A caller holding a small corpus can pass
``docs_ds.materialize()`` to collapse the scans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions import sketches as SK
from ..functions.textstats import fingerprint_batch
from ..stages.fastagg import fast_groupby_agg

# Default hash-join fan-out. On a real cluster this should scale with
# node count; the joins here move only band rows / candidate pairs (the
# sparse LSH tail), not the corpus.
from ..stages.fastagg import JOIN_PARTS as N_JOIN_PARTS  # one knob for all joins

# Cardinality guard (the fastagg pattern, applied to the dedup tail):
# below these thresholds the small side broadcasts — as OBJECT REFS
# consumed by vectorized pc.is_in filters, or as a bounded driver-side
# union-find — and above them the hash-partitioned join / distributed
# label-propagation paths run. Every Ray hash-shuffle join spins up its
# aggregator actors (~1-2 s fixed cost), so joining a 256-row pair set
# against a corpus is the wrong plan at small scale, and a corpus-sized
# broadcast is the wrong plan at large scale; the guard picks per run.
# Both paths are pinned byte-identical by tests/test_dedup_distributed.py.
MAX_BROADCAST_KEYS = 2_000_000
MAX_DRIVER_PAIRS = 200_000


# ------------------------------------------------------------- exact

def exact_dedup(docs_ds):
    """Exact text dedup: keep the smallest doc_id per normalized-text
    fingerprint. Returns a Dataset of surviving (doc_id, md5_fp).

    Pure vectorized aggregate — the survivor is fully determined by
    (md5_fp, min doc_id), so no per-group Python and no join is needed."""
    from ray.data.aggregate import Min

    fps = docs_ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    agg = fps.groupby("md5_fp").aggregate(Min("doc_id", alias_name="doc_id"))
    return agg.select_columns(["doc_id", "md5_fp"])


# ----------------------------------------- shared distributed plumbing

def _norm(ds, schema: pa.Schema):
    """Normalize NON-EMPTY block schemas after a join (column selection +
    order). Ray's hash-shuffle join (and aggregate) emit ZERO-COLUMN
    blocks for empty partitions, and ``map_batches`` never invokes the
    fn on an empty block — so those cannot be fixed here: they must be
    removed by ``_compact`` (before feeding another join) or skipped by
    the combine tasks (stages/fastagg.py, stages/dedup.py)."""
    names = schema.names

    def _f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return schema.empty_table()  # only batch-level empties arrive
        return b.select(names)

    return ds.map_batches(_f, batch_format="pyarrow")


def _compact(ds, rows_per_block: int = 65536):
    """Compact a Dataset into guaranteed-NONEMPTY blocks before feeding
    it to another join. Ray 2.49's hash-shuffle join broadcasts schemas
    to its aggregators only with the FIRST block of each side
    (hash_shuffle.py:548, send_empty_blocks) — and an empty block
    returns early without broadcasting (hash_shuffle.py:223), so a
    dataset whose first block is empty leaves empty join partitions
    schema-less and crashes Acero. Repartitioning to ≤ row-count blocks
    removes every empty block."""
    mat = ds.materialize()
    n = mat.count()
    if n == 0:
        return mat
    k = max(1, min(N_JOIN_PARTS, n // rows_per_block + 1))
    return mat.repartition(k)


# Per-worker cache of deserialized broadcast state (value sets / text
# dicts), keyed by the shipping ObjectRef — each worker process builds
# once and reuses across its tasks, so the filters can run as TASKS
# (reusing warm workers) instead of paying actor-pool spin-up per stage.
_bcast_cache: dict[str, object] = {}


def _cached_broadcast(refs_ref, build):
    import ray

    key = refs_ref.hex()
    hit = _bcast_cache.get(key)
    if hit is None:
        tables = ray.get(ray.get(refs_ref))
        hit = build(pa.concat_tables(tables))
        _bcast_cache.clear()
        _bcast_cache[key] = hit
    return hit


def _is_in_stage(refs_ref, col: str, key_col: str, invert: bool):
    """Vectorized membership filter with ref-shipped value set: key
    blocks live in the object store; each worker concatenates them once
    (cached) and probes per batch with one ``pc.is_in``. ``invert=True``
    keeps NON-members."""

    def _f(b: pa.Table) -> pa.Table:
        vs = _cached_broadcast(refs_ref,
                               lambda t: t[key_col].combine_chunks())
        mask = pc.is_in(b[col], value_set=vs)
        return b.filter(pc.invert(mask) if invert else mask)

    return _f


def _semi(ds, keys_ds, col: str, key_col: str, schema: pa.Schema,
          invert: bool = False, max_broadcast: int | None = None):
    """Guarded semi/anti-filter: keep ds rows whose `col` is (not, when
    inverted) in keys_ds[key_col]. Small key sets broadcast by ref into
    a pc.is_in map stage; large ones go through the hash-partitioned
    left_semi/left_anti join. keys_ds must be materialized."""
    import ray

    if max_broadcast is None:
        max_broadcast = MAX_BROADCAST_KEYS  # resolved at call time (tests patch it)
    n = keys_ds.count()
    if n <= max_broadcast:
        rref = ray.put(keys_ds.to_arrow_refs())
        return ds.map_batches(
            _is_in_stage(rref, col, key_col, invert), batch_format="pyarrow",
        )
    joined = ds.join(keys_ds, "left_anti" if invert else "left_semi",
                     N_JOIN_PARTS, on=(col,), right_on=(key_col,))
    return _norm(joined, schema)


def _colliding_rows(bands, key_col: str = "band_key"):
    """Band rows whose bucket key collides (count ≥ 2) — the sparse tail
    of LSH. Guarded semi-filter (broadcast refs small / semi-join big);
    no driver key set either way. Returns None when no bucket collides."""
    bands = bands.materialize()  # sketched once; counted AND probed below
    dup_keys = (
        fast_groupby_agg(bands, [key_col], {"n": (None, "count")})
        .filter(expr="n >= 2")
        .drop_columns(["n"])
        .materialize()
    )
    if dup_keys.count() == 0:
        return None
    return _semi(bands, dup_keys, key_col, key_col,
                 bands.schema().base_schema)


def _distinct_pairs(pairs_ds, cols=("a", "b")):
    """Distinct (a, b) via the partial-agg groupby (a pair surfacing in
    several bands verifies once)."""
    keep = list(cols)
    return fast_groupby_agg(
        pairs_ds.select_columns(keep), keep, {"__n": (None, "count")}
    ).drop_columns(["__n"])


def _pair_texts(pairs_ds, docs_ds, id_col: str = "doc_id",
                text_col: str = "text"):
    """Attach __text_a/__text_b to candidate pairs with two hash joins
    (pair → doc text on each end). The docs side streams through the
    exchange; no text ever lands on the driver."""
    it = _id_type(docs_ds, id_col)
    docs = docs_ds.select_columns([id_col, text_col])
    ta = docs.rename_columns({id_col: "a", text_col: "__text_a"})
    tb = docs.rename_columns({id_col: "b", text_col: "__text_b"})
    # pairs may arrive from fastagg's native fallback with empty leading
    # blocks — compact before the join (see _compact's docstring)
    pairs_ds = _compact(pairs_ds)
    withA = _compact(_norm(
        pairs_ds.join(ta, "inner", N_JOIN_PARTS, on=("a",)),
        pa.schema([("a", it), ("b", it), ("__text_a", pa.string())]),
    ))
    return _norm(
        withA.join(tb, "inner", N_JOIN_PARTS, on=("b",)),
        pa.schema([("a", it), ("b", it), ("__text_a", pa.string()),
                   ("__text_b", pa.string())]),
    )


def _verify_lookup_stage(texts_refs_ref, threshold: float, k_shingle: int,
                         char_n: int | None, id_col: str, text_col: str):
    """Verification stage for the SMALL-pair path: the texts of the docs
    named by candidate pairs (is_in-filtered from the corpus, never the
    corpus itself) ship as block refs; each worker builds the lookup
    dict once (cached) and each pair row is an O(1) lookup + exact
    Jaccard."""

    def _f(batch: pa.Table) -> pa.Table:
        texts = _cached_broadcast(
            texts_refs_ref,
            lambda t: dict(zip(t[id_col].to_pylist(), t[text_col].to_pylist())),
        )
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        # a pair naming a doc_id absent from the corpus must be DROPPED
        # (-1 sentinel fails the threshold), matching the large path's
        # inner-join semantics — texts.get(x, "") would instead score
        # two missing docs jaccard("","") == 1.0 and emit a phantom pair
        fn = (lambda x, y: SK.jaccard(x, y, k_shingle)) if char_n is None \
            else (lambda x, y: SK.ngram_jaccard(x, y, char_n))
        sims = [
            fn(ta, tb) if (ta := texts.get(x)) is not None
            and (tb := texts.get(y)) is not None else -1.0
            for x, y in zip(a, b)
        ]
        t = batch.append_column("jaccard", pa.array(np.round(sims, 6), pa.float64()))
        return t.filter(pc.greater_equal(t["jaccard"], threshold))

    return _f


class _VerifyJaccard:
    """Verification stage over joined pair rows (a, b, __text_a,
    __text_b): exact word-shingle (or char-n-gram) Jaccard, keep rows
    ≥ threshold (the LARGE-pair path, fed by ``_pair_texts`` joins)."""

    def __init__(self, threshold: float, k_shingle: int, char_n: int | None):
        self.t = threshold
        self.k = k_shingle
        self.char_n = char_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ta = batch["__text_a"].to_pylist()
        tb = batch["__text_b"].to_pylist()
        if self.char_n is None:
            sims = [SK.jaccard(x or "", y or "", self.k) for x, y in zip(ta, tb)]
        else:
            sims = [SK.ngram_jaccard(x or "", y or "", self.char_n)
                    for x, y in zip(ta, tb)]
        t = batch.drop_columns(["__text_a", "__text_b"])
        t = t.append_column("jaccard", pa.array(np.round(sims, 6), pa.float64()))
        return t.filter(pc.greater_equal(t["jaccard"], self.t))


def _min_label_components(pairs_ds, max_iters: int = 64):
    """Distributed connected components: min-label propagation over the
    (a, b) edge Dataset. Returns a Dataset (node, label) for every node
    appearing in an edge, where label = min id of its component.

    Per iteration: join labels onto symmetric edges, take the per-node
    min of neighbor labels (self-loops carry the node's own label), then
    a POINTER-DOUBLING shortcut (label ← label[label], r5) — labels are
    monotone non-increasing node ids, so the jump is always valid and
    collapses chains exponentially: convergence drops from
    O(component diameter) rounds to O(log diameter), which is the
    difference between ~20 and ~5 full pipeline executions on chain-y
    graphs here, and the difference between feasible and not at 100 TB
    (a web-graph component's diameter can be thousands). Stops when no
    label changed. The min-label step uses ``fast_groupby_agg``
    (partial combine), which also avoids the native aggregate's
    zero-column empty blocks that the next iteration's join would choke
    on."""

    def _sym(b: pa.Table) -> pa.Table:
        a, bb = b["a"].combine_chunks(), b["b"].combine_chunks()
        return pa.table({
            "src": pa.concat_arrays([a, bb, a, bb]),
            "dst": pa.concat_arrays([bb, a, a, bb]),  # + self-loops
        })

    edges = pairs_ds.select_columns(["a", "b"]).map_batches(
        _sym, batch_format="pyarrow"
    )
    # every join input below is _compact-ed: fastagg's native fallback
    # and filter stages can emit empty blocks, and an empty FIRST block
    # on a join side crashes Acero (see _compact's docstring) — exactly
    # at the large scale this path exists for
    edges = _compact(
        fast_groupby_agg(edges, ["src", "dst"], {"__n": (None, "count")})
        .drop_columns(["__n"])
    )

    labels = _compact(edges.map_batches(
        lambda b: pa.table({
            "node": b["src"].filter(pc.equal(b["src"], b["dst"])),
            "label": b["dst"].filter(pc.equal(b["src"], b["dst"])),
        }),
        batch_format="pyarrow",
    ))
    n_labels = labels.count()
    if n_labels == 0:
        return labels
    # adaptive join width: a hash-shuffle join spins num_partitions
    # aggregator actors PER EXECUTION (~0.9 s fixed at 8 parts, ~0.54 s
    # at 1 on this host) — size it to the label table, not a constant
    # (r5; at scale the same formula yields N_JOIN_PARTS)
    nparts = max(1, min(N_JOIN_PARTS, n_labels // 65536 + 1))
    # labels are monotone non-increasing (min-agg includes self; the
    # shortcut only jumps downward), so Σlabel strictly decreases while
    # anything changes — an O(1)-output aggregate replaces the r4
    # labels⋈old-labels diff join as the convergence check (r5)
    prev_sum = labels.sum("label")

    it = labels.schema().base_schema.field("node").type
    for _ in range(max_iters):
        j = _norm(
            edges.join(labels, "inner", nparts,
                       on=("dst",), right_on=("node",)),
            pa.schema([("src", it), ("label", it)]),
        )
        new_labels = _compact(
            fast_groupby_agg(j, ["src"], {"label": ("label", "min")})
            .rename_columns({"src": "node"})
        )
        # pointer-doubling shortcut: label ← label[label]. Every label
        # is itself a node in the table (it is some node's id seen via
        # an edge), and label[n] ≤ n after the min-agg, so the jumped
        # label can only decrease — semantics unchanged, chains collapse
        # in O(log d) rounds instead of O(d) (r5).
        new_labels = _compact(_norm(
            new_labels.join(
                new_labels.rename_columns({"node": "label",
                                           "label": "label2"}),
                "inner", nparts, on=("label",),
            ),
            pa.schema([("node", it), ("label", it), ("label2", it)]),
        ).map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["label2"]}),
            batch_format="pyarrow",
        ))
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    # a component whose labels still change after max_iters
    # doubling rounds (diameter > 2^max_iters) would exit with WRONG
    # labels — refuse to return silently-divergent survivors (the
    # driver union-find path would disagree, breaking the
    # guard-equality contract)
    raise RuntimeError(
        f"min-label propagation did not converge in {max_iters} iterations "
        "(component diameter exceeds the cap); raise max_iters"
    )


def _dropped_nodes(pairs_ds):
    """Dataset of every node whose component label is a smaller id
    (distributed label propagation — the LARGE-pair path)."""
    labels = _min_label_components(pairs_ds)
    return labels.map_batches(
        lambda b: pa.table(
            {"node": b["node"].filter(pc.not_equal(b["node"], b["label"]))}
        ),
        batch_format="pyarrow",
    )


def _dropped_nodes_guarded(verified, id_type: pa.DataType,
                           max_driver_pairs: int | None = None):
    """Dropped-node Dataset with the cardinality guard: a pair set below
    the threshold clusters with a BOUNDED driver union-find (the edges
    are the sparse tail — a few KB here vs ~10 s of join-actor spin-up
    for the distributed loop); above it, distributed min-label
    propagation. Identical output (union-by-min == min-label), pinned by
    tests. `verified` must be materialized."""
    if max_driver_pairs is None:
        max_driver_pairs = MAX_DRIVER_PAIRS  # resolved at call time (tests patch it)
    if verified.count() <= max_driver_pairs:
        uf = SK.UnionFind()
        for r in verified.select_columns(["a", "b"]).take_all():
            uf.union(r["a"], r["b"])
        dropped = sorted(x for x, root in uf.groups().items() if root != x)
        return rd.from_arrow(pa.table({"node": pa.array(dropped, id_type)}))
    return _dropped_nodes(verified)


def _survivors_guarded(ds, verified, id_col: str,
                       joinable: bool = True,
                       max_driver_pairs: int | None = None):
    """Survivors = rows whose id joins no smaller-id component member.
    The dropped set goes through the guarded anti-filter (`_semi` with
    invert): ref-broadcast pc.is_in when small, left_anti join when big.
    ``joinable=False`` forces the broadcast path for tables whose payload
    the Arrow join cannot carry (list<float> embedding columns are
    unsupported as join non-key fields)."""
    it = _id_type(ds, id_col)
    dropped = _dropped_nodes_guarded(verified, it, max_driver_pairs).materialize()
    max_broadcast = None if joinable else (1 << 62)
    return _semi(ds, dropped, id_col, "node", ds.schema().base_schema,
                 invert=True, max_broadcast=max_broadcast)


def _verified_minhash_pairs(pairs_ds, docs_ds, threshold: float,
                            k_shingle: int, char_n: int | None = None,
                            id_col: str = "doc_id", text_col: str = "text",
                            max_driver_pairs: int | None = None):
    """Exact-Jaccard verification of a (materialized) candidate-pair
    Dataset, guarded: below the threshold the pair ids collect (bounded)
    and the named texts ship by ref into lookup actors; above it, two
    hash joins attach texts and verification streams."""
    import ray

    if max_driver_pairs is None:
        max_driver_pairs = MAX_DRIVER_PAIRS  # resolved at call time (tests patch it)
    if pairs_ds.count() <= max_driver_pairs:
        ids = set()
        for r in pairs_ds.select_columns(["a", "b"]).take_all():
            ids.add(r["a"])
            ids.add(r["b"])
        it = _id_type(docs_ds, id_col)
        needed = rd.from_arrow(pa.table({id_col: pa.array(sorted(ids), it)}))
        texts = _semi(docs_ds.select_columns([id_col, text_col]),
                      needed.materialize(), id_col, id_col,
                      pa.schema([(id_col, it), (text_col, pa.string())])
                      ).materialize()
        tref = ray.put(texts.to_arrow_refs())
        return pairs_ds.map_batches(
            _verify_lookup_stage(tref, threshold, k_shingle, char_n,
                                 id_col, text_col),
            batch_format="pyarrow", batch_size=2048,
        )
    return _pair_texts(pairs_ds, docs_ds, id_col, text_col).map_batches(
        _VerifyJaccard(threshold, k_shingle, char_n),
        batch_format="pyarrow", batch_size=2048,
    )


def _empty_pairs(id_type: pa.DataType, score_col: str) -> "rd.Dataset":
    return rd.from_arrow(pa.table({
        "a": pa.array([], id_type), "b": pa.array([], id_type),
        score_col: pa.array([], pa.float64() if score_col != "hamming"
                            else pa.int64()),
    }))


def _id_type(ds, col: str) -> pa.DataType:
    f = ds.schema().base_schema.field(col)
    return f.type


# ------------------------------------------------------- minhash + LSH

class _MinHashBands:
    def __init__(self, n_perm: int, n_bands: int, k_shingle: int,
                 shingler=SK.shingles):
        self.mh = SK.MinHasher(n_perm=n_perm)
        self.n_bands = n_bands
        self.k = k_shingle
        self.shingler = shingler

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        sigs = self.mh.signatures(batch["text"].to_pylist(), self.k,
                                  self.shingler)
        ids, keys = [], []
        for doc_id, sig in zip(doc_ids, sigs):
            for bk in SK.band_keys(sig, self.n_bands):
                ids.append(doc_id)
                keys.append(bk)
        return pa.table({"doc_id": pa.array(ids), "band_key": pa.array(keys, pa.binary())})


def _bucket_pairs_capped(bucket_cap: int):
    """Per-bucket candidate pairs: all-pairs up to ``bucket_cap`` members,
    star pairs (min vs member) beyond — O(n) for degenerate buckets, and
    components still connect through the bucket min."""

    def _f(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        a, b = [], []
        if len(ids) > bucket_cap:
            root = ids[0]
            a = [root] * (len(ids) - 1)
            b = ids[1:]
        else:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i])
                    b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b})

    return _f


def minhash_lsh_dedup(docs_ds, threshold: float = 0.7, n_perm: int = 128,
                      n_bands: int = 16, k_shingle: int = 3,
                      bucket_cap: int = 512):
    """MinHash+LSH near-dedup. Returns (survivors_ds, verified_pairs_ds)
    — see the module docstring for the fully distributed plan."""
    # task-pool stage: MinHasher state (two rng-derived coefficient
    # arrays) rebuilds in microseconds, so tasks beat actor-pool spin-up.
    # batch_size=256: the sketch matmul stays vectorized at this size and
    # a 5k-doc corpus splits into ~20 tasks instead of 5 (the sketch was
    # parallelism-starved, not compute-bound).
    stage = _MinHashBands(n_perm, n_bands, k_shingle)
    bands = docs_ds.map_batches(stage, batch_format="pyarrow", batch_size=256)
    colliding = _colliding_rows(bands)
    if colliding is None:
        return docs_ds, _empty_pairs(_id_type(docs_ds, "doc_id"), "jaccard")
    cand = colliding.groupby("band_key").map_groups(
        _bucket_pairs_capped(bucket_cap), batch_format="pandas"
    )
    pairs = _distinct_pairs(cand).materialize()
    verified = _verified_minhash_pairs(
        pairs, docs_ds, threshold, k_shingle
    ).materialize()
    if verified.count() == 0:
        return docs_ds, verified
    return _survivors_guarded(docs_ds, verified, "doc_id"), verified


def ngram_jaccard_dedup(docs_ds, threshold: float = 0.8, char_n: int = 5,
                        n_perm: int = 128, n_bands: int = 16,
                        bucket_cap: int = 512):
    """Character-n-gram Jaccard near-dedup (the fourth dedup flavor):
    candidates from MinHash+LSH over CHAR n-gram shingles, verification
    by exact char-n-gram Jaccard, then the same guarded clustering /
    survivor plan as the word-shingle path. Returns
    (survivors_ds, verified_pairs_ds)."""
    stage = _MinHashBands(n_perm, n_bands, char_n, shingler=SK.char_shingles)
    bands = docs_ds.map_batches(stage, batch_format="pyarrow", batch_size=256)
    colliding = _colliding_rows(bands)
    if colliding is None:
        return docs_ds, _empty_pairs(_id_type(docs_ds, "doc_id"), "jaccard")
    cand = colliding.groupby("band_key").map_groups(
        _bucket_pairs_capped(bucket_cap), batch_format="pandas"
    )
    pairs = _distinct_pairs(cand).materialize()
    verified = _verified_minhash_pairs(
        pairs, docs_ds, threshold, char_n, char_n=char_n
    ).materialize()
    if verified.count() == 0:
        return docs_ds, verified
    return _survivors_guarded(docs_ds, verified, "doc_id"), verified


def ngram_jaccard_pairs(docs_ds, pairs: list[tuple], threshold: float = 0.5,
                        char_n: int = 5):
    """Character-n-gram Jaccard verification over an explicit candidate
    list — the pair Dataset goes through the same guarded verify stages
    as the LSH path."""
    it = _id_type(docs_ds, "doc_id")
    pair_ds = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], it),
        "b": pa.array([p[1] for p in pairs], it),
    })).materialize()
    return _verified_minhash_pairs(pair_ds, docs_ds, threshold, 3,
                                   char_n=char_n)


# ------------------------------------------------------------ simhash

class _SimHashBands:
    def __init__(self, n_bands: int):
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, keys, hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            h = SK.simhash64(text)
            for bk in SK.simhash_band_keys(h, self.n_bands):
                ids.append(doc_id)
                keys.append(bk)
                hashes.append(h)
        return pa.table({
            "doc_id": pa.array(ids),
            "band_key": pa.array(keys, pa.binary()),
            "simhash": pa.array(np.array(hashes, dtype=np.uint64).astype(np.int64)),
        })


def simhash_dedup(docs_ds, max_hamming: int = 3, n_bands: int = 4,
                  bucket_cap: int = 512):
    """SimHash near-dedup: candidate docs within hamming distance
    ≤ max_hamming of a smaller-id doc are dropped. Returns
    (survivors_ds, pairs_ds). Verification (hamming on the 64-bit
    signatures carried with the band rows) happens inside the bucket
    groups — no text join needed.

    Recall contract: band LSH GUARANTEES candidacy only for pairs with
    hamming < n_bands (pigeonhole — some band is untouched); for
    n_bands ≤ hamming ≤ max_hamming a pair is verified only if it still
    collides in some band (probabilistic, like every LSH scheme). Use
    more bands for a stronger guarantee at more shuffle volume."""
    bands = docs_ds.map_batches(
        _SimHashBands(n_bands), batch_format="pyarrow", batch_size=1024,
    )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].tolist()
        hs = [np.uint64(h).item() & ((1 << 64) - 1) for h in rows["simhash"]]
        a, b, d = [], [], []
        span = range(1, len(ids)) if len(ids) > bucket_cap else None
        if span is not None:  # degenerate bucket: star pairs vs the min
            for j in span:
                hd = SK.hamming64(hs[0], hs[j])
                if hd <= max_hamming:
                    a.append(ids[0]); b.append(ids[j]); d.append(hd)
        else:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    hd = SK.hamming64(hs[i], hs[j])
                    if hd <= max_hamming:
                        a.append(ids[i]); b.append(ids[j]); d.append(hd)
        return pd.DataFrame({"a": a, "b": b,
                             "hamming": pd.Series(d, dtype="int64")})

    colliding = _colliding_rows(bands)
    if colliding is None:
        return docs_ds, _empty_pairs(_id_type(docs_ds, "doc_id"), "hamming")
    pairs = colliding.groupby("band_key").map_groups(
        _pairs, batch_format="pandas"
    )
    verified = fast_groupby_agg(
        pairs, ["a", "b"], {"hamming": ("hamming", "min")}
    ).materialize()
    if verified.count() == 0:
        # fastagg's combine emits a zero-COLUMN table when every partial
        # is empty — return the properly typed empty pair schema instead
        return docs_ds, _empty_pairs(_id_type(docs_ds, "doc_id"), "hamming")
    return _survivors_guarded(docs_ds, verified, "doc_id"), verified


# ------------------------------------------- embedding cosine near-dup

class _HyperplaneBucket:
    """Multi-table hyperplane LSH: `n_tables` independent nbits-bit
    signatures per vector (planes stacked (n_tables·nbits, dim)), each
    emitted as its own namespaced bucket row. One table's recall for a
    boundary pair at angle θ is (1−θ/π)^nbits (~0.55 at cosine ≈ 0.98);
    T tables lift it to 1−(1−p)^T (~0.96 at T=4) — the standard
    recall/shuffle-volume trade, paid as T rows per vector through the
    bucket exchange. Cross-table duplicate pairs collapse in the
    max-cosine groupby downstream."""

    def __init__(self, planes_ref, n_tables: int):
        import ray

        self.planes = ray.get(planes_ref) if not isinstance(
            planes_ref, np.ndarray) else planes_ref
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.ann import _normalize, _to_matrix

        vecs = _normalize(_to_matrix(batch["embedding"]))
        signs = (vecs @ self.planes.T) > 0  # (n, n_tables·nbits)
        nbits = signs.shape[1] // self.n_tables
        weights = 1 << np.arange(nbits, dtype=np.int64)
        n = len(vecs)
        ids, buckets, embs = [], [], []
        emb_col = batch["embedding"]
        for t in range(self.n_tables):
            band = signs[:, t * nbits:(t + 1) * nbits]
            keys = (band.astype(np.int64) * weights).sum(axis=1)
            ids.append(batch["vec_id"])
            buckets.append(pa.array(
                keys + (np.int64(t) << np.int64(nbits)), pa.int64()))
            embs.append(emb_col)
        return pa.table({
            "vec_id": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                 else c for c in ids]),
            "bucket": pa.concat_arrays(buckets),
            "embedding": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                 else c for c in embs]),
        }) if n else pa.table({
            "vec_id": batch["vec_id"], "bucket": pa.array([], pa.int64()),
            "embedding": emb_col,
        })


def _cosine_pairs_group(threshold: float, cap: int):
    """map_groups body shared by the LSH-bucket and k-means-cluster
    embedding dedups: exact pairwise cosine inside one candidate group,
    emitting (a=min_id, b=max_id, cosine) for every pair ≥ threshold.
    A group larger than ``cap`` (a degenerate dense cluster) scores
    members against the group's min-id vector only — O(n) star
    fallback instead of the O(n²) matmul."""

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        m = np.stack([np.asarray(v, dtype=np.float32) for v in g["embedding"]])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        ids = g["vec_id"].to_numpy()
        a, b, s = [], [], []
        if len(g) > cap:  # degenerate group: star vs the min vec
            sims = (m[:1] @ m.T).ravel()
            for j in range(1, len(ids)):
                if sims[j] >= threshold:
                    a.append(int(ids[0])); b.append(int(ids[j]))
                    s.append(round(float(sims[j]), 6))
        else:
            sims = m @ m.T
            for i in range(len(ids)):
                row = sims[i]
                for j in range(i + 1, len(ids)):
                    if row[j] >= threshold:
                        a.append(int(ids[i])); b.append(int(ids[j]))
                        s.append(round(float(row[j]), 6))
        return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                             "b": pd.Series(b, dtype="int64"),
                             "cosine": pd.Series(s, dtype="float64")})

    return _pairs


def semdedup(embeddings_ds, n_clusters: int = 8, iters: int = 3,
             threshold: float = 0.98, cluster_cap: int = 8192,
             centroids=None):
    """SemDeDup (Abbas et al., arXiv:2303.09540 shape): spherical
    k-means clusters are the candidate groups — semantic near-dups land
    in the same cluster by construction — then exact pairwise cosine
    inside each cluster; every vec pairing ≥ threshold with a smaller
    vec_id is dropped. Differs from embedding_cosine_dedup only in the
    grouping stage (learned clusters vs random hyperplane buckets): the
    pair kernel, the cap fallback and the survivor anti-join are the
    same shared code. At 100 TB, n_clusters scales ~√N so |cluster|
    stays bounded; the centroid fit itself is the distributed Lloyd of
    functions/ann.kmeans_centroids (k×d partials only, corpus never
    moves) — or pass ``centroids`` (k×d) to skip the fit, e.g. the
    SQL-replayable md5 sample the driver oracle uses. Assignment runs
    in float64 so it matches a DuckDB DOUBLE replay exactly.
    Returns (survivors_ds, pairs_ds)."""
    import ray

    from ..functions.ann import kmeans_centroids

    embeddings_ds = embeddings_ds.materialize()
    cents = (np.asarray(centroids) if centroids is not None
             else kmeans_centroids(embeddings_ds, n_clusters, iters))
    cents = cents.astype(np.float64)
    n = np.linalg.norm(cents, axis=1, keepdims=True)
    n[n == 0] = 1.0
    cref = ray.put((cents / n).T)

    class _Assign:
        def __init__(self):
            self.ct = ray.get(cref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from ..functions.ann import _normalize64

            col = b["embedding"]
            la = (col.combine_chunks()
                  if isinstance(col, pa.ChunkedArray) else col)
            nm = _normalize64(
                la.values.to_numpy(zero_copy_only=False)
                .reshape(b.num_rows, -1))
            cl = (nm @ self.ct).argmax(axis=1).astype(np.int64)
            return pa.table({"vec_id": b["vec_id"], "embedding": la,
                             "cluster": pa.array(cl, pa.int64())})

    assigned = embeddings_ds.map_batches(
        _Assign, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 4), num_cpus=0.5)
    cand = assigned.groupby("cluster").map_groups(
        _cosine_pairs_group(threshold, cluster_cap),
        batch_format="pandas")
    verified = fast_groupby_agg(
        cand, ["a", "b"], {"cosine": ("cosine", "max")}
    ).materialize()
    if verified.count() == 0:
        return embeddings_ds, _empty_pairs(
            _id_type(embeddings_ds, "vec_id"), "cosine")
    return _survivors_guarded(embeddings_ds, verified, "vec_id",
                              joinable=False), verified


def embedding_cosine_dedup(embeddings_ds, threshold: float = 0.95,
                           nbits: int = 12, dim: int = 64, seed: int = 99,
                           bucket_cap: int = 4096, n_tables: int = 4):
    """Embedding near-dup: random-hyperplane LSH buckets, pairwise cosine
    within buckets (capped: an oversized bucket — a dense embedding
    cluster — scores members against the bucket-min vector only, O(n)),
    drop every vec that joins a component with a smaller vec_id.
    Returns (survivors_ds, pairs_ds)."""
    import ray

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * nbits, dim)).astype(np.float32)
    pref = ray.put(planes)
    bucketed = embeddings_ds.map_batches(
        _HyperplaneBucket, fn_constructor_args=(pref, n_tables),
        batch_format="pyarrow", batch_size=4096, concurrency=4, num_cpus=0.5,
    )

    _pairs = _cosine_pairs_group(threshold, bucket_cap)
    cand = bucketed.groupby("bucket").map_groups(_pairs, batch_format="pandas")
    # a pair can verify in several buckets; keep one row (max cosine)
    verified = fast_groupby_agg(
        cand, ["a", "b"], {"cosine": ("cosine", "max")}
    ).materialize()
    if verified.count() == 0:
        # typed empty pair schema (see simhash_dedup note)
        return embeddings_ds, _empty_pairs(
            _id_type(embeddings_ds, "vec_id"), "cosine")
    return _survivors_guarded(embeddings_ds, verified, "vec_id",
                              joinable=False), verified
