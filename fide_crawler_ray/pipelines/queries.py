"""Driver-facing queries over /root/testdata plus their DuckDB oracles.

Every operator in SURVEY.md §2 that is SQL-expressible has BOTH a Ray
Data implementation here and an equivalent ANSI-SQL string in ORACLES —
column names match exactly (the driver hashes values after sorting
columns by name). Non-SQL ops (crawl, sketches, language-ID, IVF) have
queries only → rows-only checks.

Float policy: aggregate outputs of double columns are canonicalized on
BOTH sides with the fixed-point round ``round(x * 10^d) / 10^d`` (engine:
``pc.round`` of the scaled value, then divide; oracle: the same formula
in SQL). Both sides then divide the *same exact integer* by the same
power of ten — IEEE division is correctly rounded and deterministic, so
the doubles are bitwise identical. A plain ``round(x, d)`` is NOT safe:
pyarrow's and DuckDB's d-digit rounding pick different 1-ULP neighbors
of the decimal value (r1 verdict: a10_rollup, 7400/14743 rows off by
1 ULP), because "the nearest double to 127071.8500" has no unique
implementation. Scaling to an integer first removes the ambiguity.
"""

from __future__ import annotations

import functools
import hashlib
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from .. import synth
from ..functions import ann as ANN
from ..functions import textstats as TS
from ..stages import dedup as DD
from ..stages.fastagg import JOIN_PARTS, fast_groupby_agg
from . import analytics as AN
from . import crawl as CR
from . import dedup_text as DT

_STOP_SQL = "('the','and','of','to','a','in','is','that','it','for')"


def T(sf_dir: str, name: str, columns=None, *,
      target_block_mb: int | None = 2, min_blocks: int = 8):
    """Read one testdata table, columns pruned at the read, with
    SIZE-BASED block sizing: blocks ≈ file_bytes / target, floored at
    ``min_blocks`` for parallelism. Ray's default splits any read to
    ~2×CPUs blocks regardless of size; every downstream task, shuffle
    send, and object transfer then pays per-block overhead, which
    dominates when blocks are tiny — a 3 MB join input split 64 ways
    costs 512 in-flight objects per side to move 3 MB. Measured on the
    sf0.1 suite: a 14-stage subset dropped 22.8 s → 11.0 s under this
    default, and the inner join 5–10 s → ~2 s. The policy is
    scale-invariant: at 100 TB the same arithmetic yields thousands of
    blocks and the floor is irrelevant. Pass ``target_block_mb=None``
    to fall back to Ray's own splitting."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    kwargs = {}
    if target_block_mb is not None:
        if os.path.isdir(path):  # directory-shaped parquet tables
            size = sum(e.stat().st_size for e in os.scandir(path)
                       if e.is_file())
        else:
            size = os.path.getsize(path)
        # parallelism floor, CLAMPED for tiny files: a 3 KB dimension
        # split 8 ways yields ~1-row blocks that a downstream filter
        # empties — and an empty FIRST block on a join side loses the
        # Ray 2.49 hash-shuffle schema broadcast (see _compact_small).
        # ≥4 KB per block keeps every block comfortably nonempty while
        # leaving real tables (MBs+) on the min_blocks floor.
        floor = min(min_blocks, -(-size // 4096))
        nb = max(floor, -(-size // (target_block_mb << 20)))
        kwargs["override_num_blocks"] = nb
    clean = _clean_schema(path, tuple(columns) if columns else None)
    if clean is not None:
        kwargs["schema"] = clean
    return rd.read_parquet(path, columns=columns, **kwargs)


_SCHEMA_CACHE: dict[tuple, "pa.Schema"] = {}


def _clean_schema(path: str, columns: tuple | None):
    """Footer schema with pandas metadata STRIPPED (projected to the
    selected columns), passed as read_parquet(schema=...). The testdata
    files carry pandas schema metadata whose embedded dict makes
    hash(Schema) raise in this pyarrow, so Ray's unify_schemas dedup
    fast path logs a 'Failed to hash the schemas' warning in every read
    worker; handing the read a metadata-free schema removes the noise
    at the source (types are the file's own — no cast). One footer read
    per (path, columns), cached per process."""
    if os.path.isdir(path):  # multi-file dirs: let Ray infer
        return None
    key = (path, columns)
    hit = _SCHEMA_CACHE.get(key)
    if hit is None:
        import pyarrow.parquet as pq

        s = pq.ParquetFile(path).schema_arrow.remove_metadata()
        if columns is not None:
            s = pa.schema([s.field(c) for c in columns])
        hit = _SCHEMA_CACHE[key] = s
    return hit


def _canon(v: float, ndigits: int) -> float:
    """Fixed-point canonical round for driver-side scalars (see module
    docstring). Matches the SQL ``round(x * 10^d) / 10^d``."""
    p = 10.0 ** ndigits
    return round(v * p) / p


def _canon_cols(tbl: pa.Table, cols: dict[str, int]) -> pa.Table:
    """Replace each float column with its fixed-point canonical round."""
    for name, nd in cols.items():
        p = 10.0 ** nd
        i = tbl.schema.get_field_index(name)
        tbl = tbl.set_column(
            i, name, pc.divide(pc.round(pc.multiply(tbl[name], p)), p)
        )
    return tbl


def _canon_stage(cols: dict[str, int]):
    """map_batches body applying _canon_cols (the last pipeline stage of
    every query with rounded double outputs)."""
    return lambda b: _canon_cols(b, cols)


# ===================================================== TPC-H-ish analytics

def q_a5_grouped_multi_agg(sf_dir):
    """A5: grouped multi-aggregate (the reference's tournament summary
    shape, ui/streamlit_ui.py:164-167) over lineitem."""
    ds = T(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                                "l_extendedprice"])
    out = fast_groupby_agg(ds, ["l_returnflag", "l_linestatus"], {
        "sum_qty": ("l_quantity", "sum"),
        "avg_price": ("l_extendedprice", "mean"),
        "n": (None, "count"),
    })
    return out.map_batches(
        _canon_stage({"avg_price": 4, "sum_qty": 4}), batch_format="pyarrow"
    )


def q_a1_first_last(sf_dir):
    """A1: per-user first/last value by time + delta (the reference's
    initial/final rating, ui/streamlit_ui.py:136-138). Mergeable
    first/last-by-order aggregate (stages/fastagg.grouped_first_last) —
    no per-group Python, so the plan survives key counts growing with
    data (the r1 map_groups version was one Python call per user)."""
    from ..stages.fastagg import grouped_first_last

    ds = T(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    out = grouped_first_last(ds, ["user_id"], "value", ["ts", "event_id"])

    def _delta(b: pa.Table) -> pa.Table:
        t = b.append_column(
            "value_delta", pc.subtract(b["last_value"], b["first_value"])
        )
        return _canon_cols(t, {"first_value": 6, "last_value": 6,
                               "value_delta": 6})

    return out.map_batches(_delta, batch_format="pyarrow")


def q_a2_global_mean(sf_dir):
    ds = T(sf_dir, "lineitem", ["l_extendedprice"])
    v = ds.aggregate(Mean("l_extendedprice", alias_name="avg_price"))["avg_price"]
    return pd.DataFrame([{"avg_price": _canon(v, 4)}])


def _ts_str(col) -> pa.Array:
    """Timestamp → 'YYYY-MM-DD HH:MM:SS' (pyarrow's %S emits fractional
    seconds, so slice to 19 chars to match DuckDB strftime)."""
    s = pc.strftime(col, format="%Y-%m-%d %H:%M:%S")
    return pc.utf8_slice_codeunits(s, 0, 19)


def q_a3_minmax_dates(sf_dir):
    ds = T(sf_dir, "orders", ["o_orderdate"]).map_batches(
        lambda b: pa.table({"d": _ts_str(b["o_orderdate"])}),
        batch_format="pyarrow",
    )
    agg = ds.aggregate(Min("d", alias_name="min_date"), Max("d", alias_name="max_date"))
    return pd.DataFrame([{"min_date": agg["min_date"], "max_date": agg["max_date"]}])


def q_a4_count(sf_dir):
    return pd.DataFrame([{"n_rows": T(sf_dir, "lineitem", ["l_orderkey"]).count()}])


def q_a7_filtered_counts(sf_dir):
    """A7: count matrix over two categorical axes (result × color shape,
    ui/streamlit_ui.py:217-229) — one groupby, not 9 mask scans."""
    ds = T(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    return fast_groupby_agg(ds, ["o_orderstatus", "o_orderpriority"],
                            {"n": (None, "count")})


def q_a8_conditional_means(sf_dir):
    ds = T(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    out = fast_groupby_agg(ds, ["o_orderstatus", "o_orderpriority"],
                           {"avg_price": ("o_totalprice", "mean")})
    return out.map_batches(_canon_stage({"avg_price": 4}), batch_format="pyarrow")


def q_a9_value_counts_pct(sf_dir):
    """A9: value-counts normalized to fractions (en-US:516-519)."""
    ds = T(sf_dir, "orders", ["o_orderstatus"])
    df = fast_groupby_agg(ds, ["o_orderstatus"], {"n": (None, "count")}).to_pandas()
    df["pct"] = (df["n"] / df["n"].sum()).map(lambda v: _canon(v, 6))
    return df


def q_a10_rollup(sf_dir):
    """A10: per-key rollup (tournament-rollup shape, batch scraper :86-95)."""
    ds = T(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_extendedprice",
                                "l_returnflag"])

    def _ind(b: pa.Table) -> pa.Table:
        return b.append_column(
            "is_return", pc.cast(pc.equal(b["l_returnflag"], "R"), pa.int64())
        )

    out = fast_groupby_agg(
        ds.map_batches(_ind, batch_format="pyarrow"), ["l_orderkey"], {
            "n_items": (None, "count"),
            "sum_qty": ("l_quantity", "sum"),
            "sum_price": ("l_extendedprice", "sum"),
            "n_returns": ("is_return", "sum"),
        })
    return out.map_batches(
        _canon_stage({"sum_qty": 4, "sum_price": 4}), batch_format="pyarrow"
    )


def q_a11_watermark(sf_dir):
    """A11: per-key min/max timestamp (the crawl watermark aggregate,
    reference data_fetching_processing.py:216-217)."""
    ds = T(sf_dir, "events", ["user_id", "ts"]).map_batches(
        lambda b: pa.table({"user_id": b["user_id"], "d": _ts_str(b["ts"])}),
        batch_format="pyarrow",
    )
    return fast_groupby_agg(ds, ["user_id"], {
        "min_ts": ("d", "min"), "max_ts": ("d", "max"),
    })


# ======================================================= sorts / top-k

def q_o2_topk(sf_dir):
    """O2: global top-k (ui/streamlit_ui.py:184-187)."""
    return (
        T(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


def q_o3_row_number(sf_dir):
    """O3: sort desc + display reindex 1.. (ui/streamlit_ui.py:299-301).
    Top-100 slice so the rank column is well-defined and small."""
    rows = (
        T(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
        .sort(["o_orderdate", "o_orderkey"], descending=[True, True])
        .limit(100)
        .to_pandas()
    )
    rows["o_orderdate"] = rows["o_orderdate"].dt.strftime("%Y-%m-%d %H:%M:%S")
    rows["rank"] = np.arange(1, len(rows) + 1, dtype=np.int64)
    return rows


def q_o4_unique_sorted(sf_dir):
    """O4: unique + lexicographic sort (ui/streamlit_ui.py:325-327)."""
    return (
        T(sf_dir, "customer", ["c_mktsegment"])
        .groupby("c_mktsegment").aggregate(Count(alias_name="n"))
        .drop_columns(["n"]).sort("c_mktsegment")
    )


# ===================================================== scalar map stages

def q_m10_clean_numeric(sf_dir):
    """M10: strip non-digits + numeric coerce (reference :200-201)."""
    ds = T(sf_dir, "customer", ["c_custkey", "c_name"])
    return ds.map_batches(
        lambda b: pa.table({
            "c_custkey": b["c_custkey"],
            "c_num": pc.cast(pc.replace_substring_regex(b["c_name"], r"\D", ""),
                             pa.int64()),
        }),
        batch_format="pyarrow",
    )


def q_m3_regex_extract(sf_dir):
    """M3: regex id extraction (reference :64-65)."""
    ds = T(sf_dir, "supplier", ["s_suppkey", "s_name"])
    return ds.map_batches(
        lambda b: pa.table({
            "s_suppkey": b["s_suppkey"],
            "sup_num": pc.struct_field(
                pc.extract_regex(b["s_name"], r"(?P<id>\d+)"), "id"),
        }),
        batch_format="pyarrow",
    )


def q_m12_month_trunc(sf_dir):
    """M12: month truncation + count (reference :212-213)."""
    ds = T(sf_dir, "events", ["ts"]).map_batches(
        lambda b: pa.table({"month": pc.strftime(b["ts"], format="%Y-%m")}),
        batch_format="pyarrow",
    )
    return fast_groupby_agg(ds, ["month"], {"n": (None, "count")})


def q_m13_isin_filter(sf_dir):
    """M13: isin multi-select filter (ui/streamlit_ui.py:311-319)."""
    ds = T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    kept = ds.map_batches(
        lambda b: b.filter(pc.is_in(b["l_returnflag"],
                                    value_set=pa.array(["A", "R"]))),
        batch_format="pyarrow",
    )
    return fast_groupby_agg(kept, ["l_returnflag"], {
        "n": (None, "count"), "sum_qty": ("l_quantity", "sum"),
    }).map_batches(_canon_stage({"sum_qty": 4}), batch_format="pyarrow")


def q_m14_substring_filter(sf_dir):
    """M14: case-insensitive substring filter (ui/streamlit_ui.py:322-324)."""
    ds = T(sf_dir, "part", ["p_partkey", "p_name"])
    return ds.map_batches(
        lambda b: b.filter(pc.match_substring(b["p_name"], "widget",
                                              ignore_case=True)),
        batch_format="pyarrow",
    )


# ============================================================= joins

def q_j1_broadcast_join(sf_dir):
    """J1: key join with a broadcast small side (player↔games shape).
    The small side is shipped once (``ray.put``), held per actor as an
    Arrow table, and probed with vectorized ``pc.index_in`` + take — no
    per-row Python on the fact-table side."""
    seg_map = ray.put(
        T(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_arrow_refs()
    )

    class _Join:
        def __init__(self):
            small = pa.concat_tables(ray.get(ray.get(seg_map)))
            self.keys = small["c_custkey"].combine_chunks()
            self.vals = small["c_mktsegment"].combine_chunks()

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b["o_custkey"], value_set=self.keys)
            t = b.append_column("c_mktsegment", self.vals.take(idx))
            return t.filter(pc.is_valid(idx))  # inner-join semantics

    ds = T(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        _Join, batch_format="pyarrow", concurrency=2,
    )
    out = fast_groupby_agg(ds, ["c_mktsegment"], {
        "revenue": ("o_totalprice", "sum"), "n_orders": (None, "count"),
    })
    return out.map_batches(_canon_stage({"revenue": 4}), batch_format="pyarrow")


def q_j4_anti_join(sf_dir):
    """J4: anti-join (the frontier's seen-check shape): orders with no
    lineitem rows. Hash-partitioned ``Dataset.join(left_anti)`` — both
    sides stream through the exchange; no key set ever materializes on
    the driver (the r1 version collected the fact-table key set, which
    cannot fit at 100×). The big probe side is pre-shrunk to distinct
    keys map-side (fast_groupby_agg) so the exchange moves keys, not rows."""
    keys = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_orderkey"]), ["l_orderkey"],
        {"__n": (None, "count")},
    ).drop_columns(["__n"])
    return T(sf_dir, "orders", ["o_orderkey"]).join(
        keys, "left_anti", num_partitions=JOIN_PARTS,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )


def q_semi_join(sf_dir):
    """Semi-join, hash-partitioned ``Dataset.join(left_semi)``: parts that
    appear in lineitem. Same no-driver-state plan as J4."""
    keys = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_partkey"]), ["l_partkey"],
        {"__n": (None, "count")},
    ).drop_columns(["__n"])
    return T(sf_dir, "part", ["p_partkey"]).join(
        keys, "left_semi", num_partitions=JOIN_PARTS,
        on=("p_partkey",), right_on=("l_partkey",),
    )


# ============================================================ dedup

def q_d1_exact_dedup(sf_dir):
    """D1: windowed exact dedup keep-first (database_management.py:56-71)
    on a deliberately non-unique key subset of lineitem."""
    ds = T(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey",
                                "l_suppkey"])
    ds = ds.map_batches(
        lambda b: b.append_column(
            "lineage",
            pc.add(pc.multiply(b["l_orderkey"], 100),
                   pc.cast(b["l_linenumber"], pa.int64())),
        ),
        batch_format="pyarrow",
    )
    out = DD.dedup_dataset(ds, key_cols=("l_partkey", "l_suppkey"),
                           order_col="lineage")
    return out.drop_columns(["lineage"])


def q_dedup_exact_text(sf_dir):
    """Exact text dedup on documents via md5 fingerprint."""
    return DT.exact_dedup(T(sf_dir, "documents", ["doc_id", "text"]))


# ===================================================== text analysis

def q_text_token_stats(sf_dir):
    return T(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        TS.token_stats_batch, batch_format="pyarrow"
    )


def q_text_quality(sf_dir):
    return T(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        TS.quality_batch, batch_format="pyarrow"
    )


def q_text_fingerprint(sf_dir):
    out = T(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        TS.fingerprint_batch, batch_format="pyarrow"
    )
    return out.drop_columns(["roll_fp"])  # roll_fp has no SQL equivalent


def q_text_langid(sf_dir):
    """Language-ID via stopword-profile voting. Oracle-backed: the SQL
    replays the vote with list_filter per profile. Parity note: the
    engine tokenizes with Unicode \\w (the profiles contain non-ASCII
    stopwords) while RE2's \\w is ASCII — identical on the ASCII
    testdata corpus the gate runs on."""
    return T(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        TS.LangId, batch_format="pyarrow", concurrency=2,
    )


def q_text_rolling_fp(sf_dir):
    """Order-sensitive rolling-hash fingerprint. Oracle-backed: the
    Rabin-Karp fold over md5-derived word hashes is replayed in DuckDB
    with list_reduce over HUGEINT arithmetic (see ORACLES)."""
    return T(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        TS.fingerprint_batch, batch_format="pyarrow"
    ).drop_columns(["md5_fp"])


# ================================================== near-dup / ANN

def q_dedup_minhash(sf_dir):
    """MinHash+LSH near-dedup survivors. Oracle-backed since r4: the
    verify stage is EXACT word-3-shingle Jaccard, so the survivor set is
    replayed brute-force in SQL (see the ``dedup_minhash`` ORACLES entry
    and its recall-1.0 precondition note)."""
    survivors, _ = DT.minhash_lsh_dedup(
        T(sf_dir, "documents", ["doc_id", "text"]), threshold=0.7
    )
    return survivors.select_columns(["doc_id"])


def q_dedup_simhash(sf_dir):
    """SimHash near-dedup survivors. Oracle-backed since r4: md5-derived
    token hashes make the whole simhash → hamming-graph → components
    chain SQL-replayable (see ``dedup_simhash`` in ORACLES)."""
    survivors, _ = DT.simhash_dedup(
        T(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3
    )
    return survivors.select_columns(["doc_id"])


def q_dedup_ngram(sf_dir):
    """Character-n-gram Jaccard near-dedup. Oracle-backed since r4:
    LSH only generates candidates; the exact char-5-gram Jaccard verify
    determines survivors, replayed brute-force in SQL."""
    survivors, _ = DT.ngram_jaccard_dedup(
        T(sf_dir, "documents", ["doc_id", "text"]), threshold=0.8, char_n=5
    )
    return survivors.select_columns(["doc_id"])


def q_dedup_embedding(sf_dir):
    """Embedding-cosine near-dedup survivors. Oracle-backed since r4:
    brute-force cosine graph in SQL (list_cosine_similarity) — exact on
    the driver corpora where no pair sits near the 0.98 threshold."""
    survivors, _ = DT.embedding_cosine_dedup(
        T(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.98
    )
    return survivors.select_columns(["vec_id"])


def q_semdedup(sf_dir, threshold: float = 0.5):
    """SemDeDup survivors (clusters → within-cluster exact cosine →
    drop everything reachable to a smaller id; dedup_text.semdedup).
    Hard oracle since r5: the 8 cluster centroids are the deterministic
    md5('km:42:'||vec_id) sample (zero Lloyd rounds), so the whole
    cluster → edge → connected-component chain replays in SQL. The
    driver threshold is 0.5 so the component machinery is actually
    exercised on the natural corpus (6 edges at sf0.1); margin
    |cos−0.5| ≥ 1.6e-3 at every SF vs ≤2.4e-7 cross-engine cosine
    error, so no edge can flip. The iterative-Lloyd production path
    (threshold 0.98) stays as ``semdedup_lloyd`` with the planted-dup
    recall gate (quality.q_semdedup_recall)."""
    # materialize ONCE: the sample, assignment, and survivor anti-join
    # all re-consume the table (semdedup materializes internally too,
    # but only after the centroid pass; r5 review fix)
    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    cents = ANN.md5_sample_centroids(emb, 8, tag="km:42")
    survivors, _ = DT.semdedup(emb, threshold=threshold, centroids=cents)
    return survivors.select_columns(["vec_id"])


def q_semdedup_lloyd(sf_dir):
    """SemDeDup with learned (iterative Lloyd) clusters at the
    production threshold 0.98 — rows-only (Lloyd isn't
    SQL-expressible); quality.q_semdedup_recall gates it on planted
    near-dups."""
    survivors, _ = DT.semdedup(
        T(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.98)
    return survivors.select_columns(["vec_id"])


def _queries_matrix(sf_dir, n=5):
    q = (
        T(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(expr=f"vec_id < {n}")
        .to_pandas().sort_values("vec_id")
    )
    return np.stack([np.asarray(v, dtype=np.float32) for v in q["embedding"]])


def q_ann_bruteforce(sf_dir):
    """Exact cosine top-10 for the first 5 vectors as queries."""
    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ANN.brute_force_topk(emb, _queries_matrix(sf_dir), k=10)


def q_mmr_rerank(sf_dir, k: int = 10, pool: int = 50):
    """MMR (maximal-marginal-relevance) diversified re-ranking of the
    exact ANN results: the distributed part is the brute-force top-pool
    retrieval (per-batch matmul partials, its own green oracle); the
    re-rank then runs on the OUTPUT-sized candidate set — pool
    embeddings fetched by a broadcast id filter, a pool² similarity
    matrix, and the greedy λ·rel − (1−λ)·max-sim-to-chosen selection
    (λ=0.7) with vec_id tie-break.

    Hard oracle since r5 — the greedy runs in INTEGER fixed point so
    every selection step is exactly replayable in SQL (10 unrolled
    argmax CTEs, see ``_mmr_sql``): relevance is the pool score (its
    4-dp rounding is already oracle-pinned) as rel12 = round(s·1e4)·1e8;
    pairwise similarity is the exact int64 dot of the 1e-6-quantized
    unit vectors (ufp = round_half_away(v̂·1e6), so sim_int ≈ cos·1e12
    and Σ|ufp_a·ufp_b| ≤ d·1e12 ≪ 2^53 — exact in DuckDB doubles too);
    the objective is obj = 7·rel12 − 3·sim_int in 1e-13 units. The only
    cross-engine float ops left are the 1e-6 component quantization
    (error ~1e-15 vs a 5e-7 boundary) and the pool's round-4 scores
    (margin ≥ 7.8e-4 at every SF)."""
    from .rel_joins import _round_half_away

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])
    cands = ANN.brute_force_topk(
        emb, _queries_matrix(sf_dir), k=pool, precise=True).to_pandas()
    need = pa.array(sorted(set(cands["vec_id"].tolist())), pa.int64())
    vec_df = emb.map_batches(
        lambda b: b.filter(pc.is_in(b["vec_id"], value_set=need)),
        batch_format="pyarrow").to_pandas()  # pool-set-sized
    m = ANN._normalize64(np.stack([np.asarray(v, dtype=np.float32)
                                   for v in vec_df["embedding"]]))
    ufp = _round_half_away(m * 1e6).astype(np.int64)
    row_of = {int(v): i for i, v in enumerate(vec_df["vec_id"])}
    sims_int = ufp @ ufp.T  # exact int64, ≈ cosine·1e12
    out = []
    for qid, g in cands.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True])
        ids = g["vec_id"].to_numpy()
        rel12 = (_round_half_away(g["score"].to_numpy() * 1e4)
                 .astype(np.int64) * 10**8)
        rows = np.array([row_of[int(v)] for v in ids])
        chosen: list[int] = []
        avail = np.ones(len(ids), bool)
        for rank in range(1, min(k, len(ids)) + 1):
            if chosen:
                div = sims_int[np.ix_(rows, rows[chosen])].max(axis=1)
            else:
                div = np.zeros(len(ids), dtype=np.int64)
            obj = 7 * rel12 - 3 * div  # 1e-13 units, exact int64
            best = min((i for i in range(len(ids)) if avail[i]),
                       key=lambda i: (-int(obj[i]), int(ids[i])))
            chosen.append(best)
            avail[best] = False
            out.append({"query_id": int(qid), "rank": rank,
                        "vec_id": int(ids[best]),
                        "mmr_fp": int(obj[best])})
    return pd.DataFrame(out)


def q_batch_inference(sf_dir, n_classes: int = 3):
    """Batched model-inference stage (the scoring/labeling step of a
    training-data pipeline) as an ACTOR-POOL map_batches: the 'model'
    (a deterministic integer weight matrix W[j,c] = ((j·31+c·17) mod 7)
    − 3 — the stand-in for real weights, which the env can't load) is
    built once per actor in ``__init__``; each batch is ONE matmul.
    Embeddings quantize ×1e6 to int64 before the integer matmul, so
    logits are exact integers and argmax ties break to the smallest
    class on both sides. The plumbing (broadcast-once weights, batch
    sizing, per-actor state) is exactly what a real checkpoint-loading
    scorer needs at 100 TB."""

    class _Infer:
        def __init__(self):
            self.W: np.ndarray | None = None  # built on first batch (needs d)
            self.C = n_classes

        def __call__(self, b: pa.Table) -> pa.Table:
            from .relational import _round_half_away

            m = ANN._to_matrix(b["embedding"]).astype(np.float64)
            if self.W is None:
                d = m.shape[1]
                j = np.arange(d)[:, None]
                c = np.arange(self.C)[None, :]
                self.W = ((j * 31 + c * 17) % 7 - 3).astype(np.int64)
            efp = _round_half_away(m * 1e6).astype(np.int64)
            logits = efp @ self.W  # (n, C) exact int64
            pred = np.argmax(logits, axis=1)  # first max = smallest c
            best = logits[np.arange(len(pred)), pred]
            return pa.table({
                "vec_id": b["vec_id"],
                "pred": pa.array(pred.astype(np.int64), pa.int64()),
                "best_logit_fp": pa.array(best, pa.int64()),
            })

    return T(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        _Infer, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 4))


def q_hard_negatives(sf_dir, k: int = 10):
    """Contrastive-training hard-negative mining: for each of the first
    5 vectors (as queries), the top-k most-cosine-similar corpus vectors
    whose LABEL differs from the query's — the embedding-space
    counterpart of in-batch negative sampling. Same scale plan as
    ann_bruteforce (queries+labels broadcast once, one matmul + one
    vectorized label mask per batch, k-row partials merged per query);
    exact DuckDB oracle via list_cosine_similarity with the label
    exclusion in the join predicate."""
    q = (
        T(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
        .filter(expr="vec_id < 5")
        .to_pandas().sort_values("vec_id")
    )
    queries = np.stack([np.asarray(v, dtype=np.float32)
                        for v in q["embedding"]])
    qlabels = q["label"].to_numpy().astype(np.int64)
    emb = T(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return ANN.hard_negatives_topk(emb, queries, qlabels, k=k)


def q_ann_ivf(sf_dir):
    """IVF-bucketed ANN. Hard oracle since r5: the 16 centroids are the
    deterministic md5('ivf:42:'||vec_id) sample (zero Lloyd rounds) and
    every cosine — bucket assignment, probe ranking, candidate scoring —
    runs in float64 with index tie-breaks, so the full probe→top-k chain
    replays exactly in DuckDB (min assignment margin 5.8e-6 and probe
    margin ≥2.3e-3 at every SF vs ~1e-15 double-path error). nprobe=8/16
    keeps recall@10 ≥ 0.8 on the near-uniform synthetic embeddings
    (gate: ann_ivf_recall); the learned-centroid production path stays
    as ``ann_ivf_lloyd``."""
    # materialize ONCE: centroid sample + assignment/scoring each
    # consume a full pass (r5 review fix)
    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    cents = ANN.md5_sample_centroids(emb, 16, tag="ivf:42")
    return ANN.ivf_search(emb, cents, _queries_matrix(sf_dir), k=10,
                          nprobe=8, precise=True)


def q_ann_ivf_lloyd(sf_dir):
    """IVF with 5-round Lloyd k-means centroids — the production path
    (rows-only: iterative fit). nprobe=8/16: the synthetic embeddings
    are near-uniform (no cluster structure), so cosine neighbors
    scatter across buckets — half the buckets probed buys recall ~0.8
    at 2x pruning; real clustered corpora probe far fewer."""
    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = ANN.kmeans_centroids(emb, n_centroids=16, iters=5)
    return ANN.ivf_search(emb, cents, _queries_matrix(sf_dir), k=10, nprobe=8)


def q_ann_ivf_recall(sf_dir):
    """Recall@10 of the deterministic IVF (nprobe=8 of 16 md5-sample
    buckets) against the exact brute-force top-k — the numeric quality
    gate for the approximate path, itself a hard oracle since r5 (both
    sides replay in SQL and the recall division is exact-int / 50).
    Asserts the threshold so a recall regression fails the run, not
    just drifts."""
    brute = to_df_any(q_ann_bruteforce(sf_dir))
    ivf = to_df_any(q_ann_ivf(sf_dir))
    hits = total = 0
    for qid in sorted(brute["query_id"].unique()):
        b = set(brute.loc[brute["query_id"] == qid, "vec_id"])
        i = set(ivf.loc[ivf["query_id"] == qid, "vec_id"])
        hits += len(b & i)
        total += len(b)
    recall = hits / max(total, 1)
    assert recall >= 0.7, f"IVF recall@10 regressed: {recall:.3f} < 0.7"
    return pd.DataFrame([{"recall_at_10": _canon(recall, 6),
                          "n_queries": int(brute["query_id"].nunique())}])


def _kmeans_stats(emb, cents) -> "rd.Dataset":
    """Shared assignment-stats pass for the k-means queries: one
    map_batches emitting per-batch per-cluster partials, folded by a
    k-row groupby. Each member's best cosine is quantized to int64
    micro-units (round_half_away(s·1e6)) BEFORE summing, so the
    per-cluster sum is an exact, summation-order-free integer — the r4
    float-sum + truncate design flipped the last digit between engines
    whenever distributed partial order moved the sum across a trunc
    boundary (observed at sf0.01, cluster 0). mean_sim_fp is the exact
    integer floor-division sum_sim_fp // n."""
    from .rel_joins import _round_half_away

    kk = cents.shape[0]
    cref = ray.put(np.asarray(cents, dtype=np.float64))

    class _Stats:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = ANN._normalize64(ANN._to_matrix(b["embedding"]))
            sims = m @ self.c.T
            assign = sims.argmax(axis=1)
            best = sims[np.arange(len(assign)), assign]
            sfp = _round_half_away(best * 1e6).astype(np.int64)
            n = np.bincount(assign, minlength=kk).astype(np.int64)
            s = np.zeros(kk, dtype=np.int64)
            np.add.at(s, assign, sfp)
            return pa.table({
                "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                "n": pa.array(n),
                "sum_sim_fp": pa.array(s),
            })

    parts = emb.map_batches(_Stats, batch_format="pyarrow",
                            batch_size=4096, concurrency=2)
    agg = fast_groupby_agg(parts, ["cluster"], {
        "n": ("n", "sum"), "sum_sim_fp": ("sum_sim_fp", "sum"),
    })

    def _final(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        s = b["sum_sim_fp"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cluster": b["cluster"],
            "n": b["n"],
            "sum_sim_fp": b["sum_sim_fp"],
            "mean_sim_fp": pa.array(
                np.where(n > 0, np.floor_divide(s, np.maximum(n, 1)), 0)
                .astype(np.int64), pa.int64()),
        })

    return agg.map_batches(_final, batch_format="pyarrow")


def q_embedding_kmeans(sf_dir, k: int = 8):
    """Corpus clustering stats (the SemDeDup / cluster-balanced-sampling
    primitive): one row per cluster with its size and the fixed-point
    sum/mean member→centroid cosine. Hard oracle since r5: centroids
    are the deterministic md5('km:42:'||vec_id) sample (zero Lloyd
    rounds → the assignment argmax and the exact-integer micro-unit
    sums replay in DuckDB DOUBLE arithmetic; min assignment margin
    1.04e-5 across SFs vs ~1e-15 error). The iterative Lloyd fit stays
    as ``embedding_kmeans_lloyd`` with its monotonicity gate.

    Scale plan: centroids are k×d floats broadcast once (``ray.put``);
    the assignment pass is one map_batches emitting per-batch
    per-cluster partials (k rows each, corpus-size-independent) folded
    by a k-row groupby."""
    # materialize ONCE: the centroid sample and the stats pass would
    # otherwise each re-read the parquet (r5 review fix)
    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    cents = ANN.md5_sample_centroids(emb, k, tag="km:42")
    return _kmeans_stats(emb, cents)


def q_embedding_kmeans_lloyd(sf_dir, k: int = 8, iters: int = 5):
    """Distributed spherical k-means (iterative Lloyd) cluster stats —
    rows-only; the Lloyd objective's monotonicity is asserted by a
    test. Per-round exchange is k×d partials only (see
    ANN.kmeans_centroids)."""
    # materialize ONCE here: kmeans_centroids' internal materialize only
    # rebinds its local parameter, so the final stats pass would
    # otherwise re-read the parquet
    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    cents = ANN.kmeans_centroids(emb, n_centroids=k, iters=iters)
    return _kmeans_stats(emb, cents)


def to_df_any(result):
    import ray.data as _rd

    if isinstance(result, _rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


# ========================================================= windows

def q_events_tumbling(sf_dir):
    """Tumbling 1-hour window per user: count + sum(value)."""
    ds = T(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "window_start": _ts_str(pc.floor_temporal(b["ts"], unit="hour")),
            "value": b["value"],
        }),
        batch_format="pyarrow",
    )
    out = fast_groupby_agg(ds, ["user_id", "window_start"], {
        "n": (None, "count"), "sum_value": ("value", "sum"),
    })
    return out.map_batches(_canon_stage({"sum_value": 6}), batch_format="pyarrow")


def q_events_sessionize(sf_dir):
    """Session windows (30-min inactivity gap) per user → session count.
    Sort-based vectorized plan (stages/sessions.py): range-partitioned
    sort + per-block session-start flags + a bounded one-row-per-block
    boundary stitch — no per-key Python (the r1 map_groups version was
    one call per user)."""
    from ..stages.sessions import sessionize_counts

    ds = T(sf_dir, "events", ["user_id", "ts", "event_id"])
    return sessionize_counts(ds, "user_id", "ts", ["event_id"],
                             gap_seconds=30 * 60)


# ==================================================== crawl (rows-only)

@functools.lru_cache(maxsize=4)
def _crawl_store(sf_key: str):
    cfg = synth.SiteConfig(seed=42, n_players=6, n_queries=2, n_months=12)
    out = tempfile.mkdtemp(prefix="fcray_q_", dir="/tmp")
    CR.run_crawl(cfg, out, n_shards=2, fetch_concurrency=2)
    return out


@functools.lru_cache(maxsize=2)
def _crawl_fetch_log(sf_key: str):
    """One small logged crawl (record_log=True is ordering-audit-only
    state, so it runs separately from the cached store crawl); returns
    the merged (vts, priority, url) fetch log."""
    cfg = synth.SiteConfig(seed=42, n_players=6, n_queries=2, n_months=12)
    out = tempfile.mkdtemp(prefix="fcray_qlog_", dir="/tmp")
    res = CR.run_crawl(cfg, out, n_shards=2, fetch_concurrency=2,
                       record_log=True, persist_docs=False,
                       persist_games=False, finalize=False)
    return res.fetch_log()


def q_crawl_politeness_audit(sf_dir):
    """Politeness audit over the crawl's own fetch log: per host, the
    minimum virtual-time gap between consecutive fetches must respect
    the politeness budget (1 s virtual). Hosts hash to exactly one
    frontier shard, so each host's log lives on one virtual clock and
    the per-host gap is globally meaningful. Asserts the budget
    in-query (a violation fails the run) and returns the per-host
    numbers as the driver-visible row. Rows-only (the crawl is not a
    SQL surface)."""
    log = _crawl_fetch_log("fixed")
    gap_budget = 1_000_000  # run_crawl default politeness_gap_us
    by_host: dict[str, list[int]] = {}
    for vts, _prio, url in log:
        host = url.split("://", 1)[-1].split("/", 1)[0]
        by_host.setdefault(host, []).append(int(vts))
    rows = []
    for host, vs in sorted(by_host.items()):
        vs.sort()
        gaps = np.diff(np.asarray(vs, dtype=np.int64))
        min_gap = int(gaps.min()) if len(gaps) else gap_budget
        ok = min_gap >= gap_budget
        assert ok, f"politeness violated on {host}: {min_gap} µs"
        rows.append({"host": host, "n_fetches": len(vs),
                     "min_gap_us": min_gap, "gap_ok": ok})
    return pd.DataFrame(rows)


@functools.lru_cache(maxsize=2)
def _crawl_store_partial(sf_key: str):
    """One-epoch checkpointed crawl (max_epochs=1) — leaves a LIVE
    frontier snapshot (nonempty pending heaps) plus the epoch-0 lineage
    manifest for the audit queries."""
    cfg = synth.SiteConfig(seed=42, n_players=6, n_queries=2, n_months=12)
    out = tempfile.mkdtemp(prefix="fcray_qsnap_", dir="/tmp")
    CR.run_crawl(cfg, out, n_shards=2, fetch_concurrency=2, max_epochs=1,
                 finalize=False)
    return out


def q_lineage_audit(sf_dir):
    """Per-partition lineage audit over the crawl store: every epoch's
    manifest entry (urls consumed, rows produced, priority window) is
    checked against the epoch partition it describes — row counts must
    match exactly and every game row's lineage id (priority << 16 |
    span offset) must decode into the epoch's recorded priority window.
    Violations raise; the per-epoch numbers return as the
    driver-visible rows. Rows-only (store manifests are not a SQL
    surface)."""
    out = _crawl_store("fixed")
    from ..sources import store

    manifest = store.load_manifest(out) or {}
    rows = []
    for epoch_s, meta in sorted(manifest.get("epochs", {}).items()):
        epoch = int(epoch_s)
        games = store.read_all(out, "games_raw", max_epoch=epoch)
        prev = (store.read_all(out, "games_raw", max_epoch=epoch - 1)
                if epoch else None)
        n_games = (games.count() if games is not None else 0) - \
            (prev.count() if prev is not None else 0)
        assert n_games == meta["games_raw_rows"], \
            (epoch, n_games, meta["games_raw_rows"])
        lineage_ok = True
        if meta["games_raw_rows"]:
            ep = store.read_all(out, "games_raw", max_epoch=epoch,
                                columns=["lineage"])
            # isolate THIS epoch's rows via the priority window
            lin = ep.to_pandas()["lineage"].to_numpy()
            prio = lin >> 16
            in_window = ((prio >= meta["priority_min"])
                         & (prio <= meta["priority_max"]))
            lineage_ok = bool(in_window.sum() >= meta["games_raw_rows"])
            assert lineage_ok, (epoch, int(in_window.sum()))
        rows.append({"epoch": epoch,
                     "urls_fetched": meta["urls_fetched"],
                     "docs_rows": meta["docs_rows"],
                     "games_raw_rows": meta["games_raw_rows"],
                     "lineage_ok": lineage_ok})
    assert rows, "manifest carried no epoch lineage"
    return pd.DataFrame(rows)


def q_frontier_snapshot_stats(sf_dir):
    """Checkpoint-resumable frontier evidence as a query: after a
    one-epoch crawl, the persisted per-shard snapshots must hold a
    LIVE frontier (nonempty pending heaps — the crawl is resumable
    from exactly this state, pinned by the resume e2e tests) and the
    seen-filter snapshots must carry the counters the manifest
    metrics report. Returns one row per politeness shard."""
    out = _crawl_store_partial("fixed")
    from ..sources import store

    shards = store.load_shard_snapshots(out, 2, prefix="shard") or []
    filters = store.load_shard_snapshots(out, 2, prefix="seenfilter") or []
    assert shards and filters, "checkpoint snapshots missing"
    rows = []
    for snap in shards:
        pending = sum(len(v) for v in snap["pending"].values())
        rows.append({
            "shard_id": int(snap["shard_id"]),
            "n_hosts_pending": len(snap["pending"]),
            "n_pending": pending,
            "gap_us": int(snap["gap_us"]),
        })
    assert sum(r["n_pending"] for r in rows) > 0, \
        "one-epoch crawl left no pending frontier to resume"
    return pd.DataFrame(rows)


def q_span_stats(sf_dir):
    """Interleaved span-document audit over the crawl's docs store (the
    BASELINE.json input_hint shape: doc_id + spans
    list<struct<kind,text,media_ref,offset>>): per doc_kind, span/media
    counts, text volume, and the ORDER invariant — every document's
    span offsets must be non-decreasing (span order is load-bearing:
    the reference zips media to text rows positionally). Zero-copy list
    kernel: flattened child arrays + reduceat over list offsets, no
    per-row Python. The order violation count must be zero (asserted).
    Rows-only (list<struct> store, not a SQL view)."""
    out = _crawl_store("fixed")
    from ..sources import store

    docs = store.read_all(out, "docs",
                          columns=["doc_id", "doc_kind", "spans"])

    def _stats(b: pa.Table) -> pa.Table:
        col = b["spans"]
        la = (col.combine_chunks()
              if isinstance(col, pa.ChunkedArray) else col)
        offs = la.offsets.to_numpy().astype(np.int64)
        kinds = la.values.field("kind").to_numpy(zero_copy_only=False)
        texts = la.values.field("text")
        span_off = la.values.field("offset").to_numpy(
            zero_copy_only=False).astype(np.int64)
        tlen = pc.coalesce(pc.utf8_length(texts),
                           pa.scalar(0)).to_numpy(zero_copy_only=False)
        is_media = (kinds == "media").astype(np.int64)
        n = len(b)
        lens = np.diff(offs)

        def _per_doc(vals):
            if len(vals) == 0:
                return np.zeros(n, np.int64)
            # trailing zero-span docs put len(vals) into offsets —
            # clip for reduceat, then zero every empty doc's slot
            s = np.add.reduceat(vals,
                                np.minimum(offs[:-1], len(vals) - 1))
            s[lens == 0] = 0
            return s.astype(np.int64)

        # order invariant: offsets non-decreasing WITHIN each doc
        incr = np.ones(len(span_off), np.int64)
        if len(span_off) > 1:
            incr[1:] = (span_off[1:] >= span_off[:-1]).astype(np.int64)
        incr[offs[:-1][lens > 0]] = 1  # document starts reset the chain
        df = pd.DataFrame({
            "doc_kind": b["doc_kind"].to_pandas(),
            "n_docs": np.ones(n, np.int64),
            "n_spans": lens,
            "n_media": _per_doc(is_media),
            "text_chars": _per_doc(tlen.astype(np.int64)),
            "order_violations": _per_doc(1 - incr),
        })
        g = df.groupby("doc_kind", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = fast_groupby_agg(
        docs.map_batches(_stats, batch_format="pyarrow"),
        ["doc_kind"], {c: (c, "sum") for c in
                       ["n_docs", "n_spans", "n_media", "text_chars",
                        "order_violations"]})
    res = agg.to_pandas()  # doc_kind domain-sized
    assert int(res["order_violations"].sum()) == 0, res.to_dict("records")
    return res.sort_values("doc_kind").reset_index(drop=True)


def q_span_reflow(sf_dir):
    """Interleaved span-document REFLOW — the canonicalization pass a
    text+media corpus needs before packing/training: consecutive text
    spans OF THE SAME KIND merge into one (single-space joined), media
    spans pass through untouched, span order is preserved. Runs as one zero-copy
    list-kernel map over the crawl docs store (flattened child arrays,
    run boundaries by vectorized doc/kind comparison, per-run join via
    a C-grouped pandas agg — no per-row Python). Conservation is
    asserted IN-QUERY per document: media span count unchanged and the
    doc's full text (space-joined word sequence) byte-identical before
    vs after. Output: per doc_kind, docs / spans before / spans after /
    media spans / merge count (violations must be zero). Rows-only
    (list<struct> store, not a SQL view)."""
    out = _crawl_store("fixed")
    from ..sources import store

    docs = store.read_all(out, "docs",
                          columns=["doc_id", "doc_kind", "spans"])

    def _reflow(b: pa.Table) -> pa.Table:
        col = b["spans"]
        la = (col.combine_chunks()
              if isinstance(col, pa.ChunkedArray) else col)
        offs = la.offsets.to_numpy().astype(np.int64)
        lens = np.diff(offs)
        n = len(b)
        kinds = la.values.field("kind").to_numpy(zero_copy_only=False)
        texts = pc.coalesce(la.values.field("text"), pa.scalar("")) \
            .to_pandas()
        m = len(kinds)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        is_text = kinds != "media"
        run_start = np.ones(m, bool)
        if m > 1:
            run_start[1:] = ((doc_idx[1:] != doc_idx[:-1])
                             | (kinds[1:] != kinds[:-1])
                             | ~(is_text[1:] & is_text[:-1]))
        run_id = np.cumsum(run_start) - 1
        # merged text per run (media runs are singletons by
        # construction: only text-text neighbors merge)
        merged = texts.groupby(run_id).agg(" ".join)
        run_doc = doc_idx[run_start]
        run_is_text = is_text[run_start]
        # conservation: per-doc word stream identical before/after
        before = texts[is_text].groupby(doc_idx[is_text]).agg(" ".join)
        after = merged[run_is_text].groupby(
            run_doc[run_is_text]).agg(" ".join)
        text_viol = int((~before.eq(
            after.reindex(before.index, fill_value=""))).sum())
        media_before = np.bincount(doc_idx[~is_text], minlength=n)
        media_after = np.bincount(run_doc[~run_is_text], minlength=n)
        media_viol = int((media_before != media_after).sum())
        df = pd.DataFrame({
            "doc_kind": b["doc_kind"].to_pandas(),
            "n_docs": np.ones(n, np.int64),
            "spans_before": lens,
            "spans_after": np.bincount(run_doc, minlength=n)
            .astype(np.int64),
            "media_spans": media_before.astype(np.int64),
        })
        g = df.groupby("doc_kind", sort=False).sum().reset_index()
        g["violations"] = np.int64(text_viol + media_viol)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = fast_groupby_agg(
        docs.map_batches(_reflow, batch_format="pyarrow"),
        ["doc_kind"], {c: (c, "sum") for c in
                       ["n_docs", "spans_before", "spans_after",
                        "media_spans", "violations"]})
    res = agg.to_pandas()
    assert int(res["violations"].sum()) == 0, res.to_dict("records")
    res["n_merged"] = (res["spans_before"] - res["spans_after"]) \
        .astype(np.int64)
    assert (res["spans_after"] <= res["spans_before"]).all()
    return res.sort_values("doc_kind").reset_index(drop=True)


def q_crawl_metrics(sf_dir):
    """Crawl progress counters (SURVEY ST6) surfaced from the finished
    store's manifest metrics: one row per frontier component (politeness
    shards + seen filters) with its counters, plus a conservation check —
    offered = enqueued + dup_dropped + robots_dropped across the filter
    bank, and popped == pages fetched per the epoch lineage. Rows-only."""
    out = _crawl_store("fixed")
    from ..sources import store

    m = (store.load_manifest(out) or {}).get("metrics", {})
    rows = []
    for s in m.get("shards", []):
        rows.append({"component": f"shard_{s['shard']}",
                     "popped": int(s.get("popped", 0)),
                     "enqueued": int(s.get("enqueued", 0)),
                     "offered": 0, "dup_dropped": 0, "robots_dropped": 0,
                     "seen": 0, "pending": int(s.get("pending", 0))})
    for f in m.get("seen_filters", []):
        rows.append({"component": f"seenfilter_{f['filter']}",
                     "popped": 0, "enqueued": 0,
                     "offered": int(f.get("offered", 0)),
                     "dup_dropped": int(f.get("dup_dropped", 0)),
                     "robots_dropped": int(f.get("robots_dropped", 0)),
                     "seen": int(f.get("seen", 0)), "pending": 0})
    df = pd.DataFrame(rows)
    total_popped = int(df["popped"].sum())
    fetched = sum(e["urls_fetched"]
                  for e in (store.load_manifest(out) or {})
                  .get("epochs", {}).values())
    assert total_popped == fetched, (total_popped, fetched)
    return df


# content-versioned name: the hash covers the generating config and a
# format version, so a stale sidecar from an older repo state (or an
# unrelated file squatting the name) can never be read as ground truth
_CALC_SPANS_SIDECAR = ("/tmp/fcray_q_calc_spans_"
                       + hashlib.md5(
                           b"v1|seed=42,n_players=6,n_queries=2,"
                           b"n_months=12").hexdigest()[:10]
                       + ".parquet")


@functools.lru_cache(maxsize=1)
def _calc_spans_sidecar() -> str:
    """Write the synthetic site's rendered calc-span documents as a
    parquet side-table (r5 — turns the flagship crawl into a HARD
    oracle): one row per REACHABLE calc doc (every player matches some
    seed query by construction) with its ground-truth spans straight
    from the synth renderer — independent input, NOT engine output.
    The ``crawl_game_history`` oracle SQL then replays the whole
    parse → normalize → keep-first-dedup → dropna chain over it in
    DuckDB, so any render/crawl/parse/normalize/dedup bug breaks the
    match.

    Priority note: the exported priority uses a constant
    (seed_rank=0, result_idx=1) prefix. That is sufficient for the
    min-lineage dedup replay because DEDUP_KEY contains player_name
    (unique per player), so lineage comparisons never cross players —
    and within one player the (seed_rank, result_idx) prefix is the
    same for every doc (all calc URLs expand from the player's single
    deduped profile fetch), leaving (month_idx, span offset) as the
    only deciding fields, which the sidecar preserves exactly.
    Written atomically (tmp + rename); called from BOTH the query and
    ``oracle_sql()`` so the file exists regardless of driver order."""
    import pyarrow.parquet as pq

    from ..stages import urls as U

    cfg = synth.SiteConfig(seed=42, n_players=6, n_queries=2, n_months=12)
    reach = set()
    for q in synth.seed_queries(cfg):
        reach.update(synth.players_for_query(cfg, q))
    rows = []
    for pid in sorted(reach):
        name = synth.player_name(cfg, pid)
        for m in synth.months_of(cfg):
            prio = U.pack_priority(0, 1, U.KIND_CALC, U.month_index(m))
            doc = synth.render_calc(cfg, pid, m)
            rows.append((pid, name, prio, doc["spans"]))
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                       ("media_ref", pa.string()), ("offset", pa.int64())])
    tbl = pa.table({
        "fide_id": pa.array([r[0] for r in rows], pa.string()),
        "player_name": pa.array([r[1] for r in rows], pa.string()),
        "priority": pa.array([r[2] for r in rows], pa.int64()),
        "spans": pa.array([r[3] for r in rows], pa.list_(span_t)),
    })
    tmp = _CALC_SPANS_SIDECAR + f".tmp{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, _CALC_SPANS_SIDECAR)
    return _CALC_SPANS_SIDECAR


def q_crawl_game_history(sf_dir):
    """Flagship crawl: synthetic site → frontier crawl → parsed,
    normalized, deduped game_history. Hard oracle since r5: the
    ``crawl_game_history`` SQL replays parse → normalize → dedup →
    dropna over the ground-truth span sidecar (see
    ``_calc_spans_sidecar``)."""
    out = _crawl_store("fixed")
    _calc_spans_sidecar()
    from ..sources import store

    return store.read_all(out, "game_history").drop_columns(["lineage"])


def q_crawl_players(sf_dir):
    out = _crawl_store("fixed")
    from ..sources import store

    return store.read_all(out, "players")


def q_tournament_rollup(sf_dir):
    """A10+M17 over the crawled store (performance rating has no SQL
    equivalent — FIDE dp lookup table)."""
    gh = q_crawl_game_history(sf_dir)
    df = AN.tournament_rollup(gh)
    for c in ("points", "rating_sum", "avg_opp_rating", "performance",
              "points_per_game"):
        df[c] = df[c].astype("float64").round(4)
    return df


def q_perf_rating_dp(sf_dir):
    """M17 with a hard oracle (r4): the FIDE dp performance-rating table
    applied through the SAME vectorized ``rating_performance`` used by
    tournament_rollup, but over a deterministic sf-table-derived game
    set so DuckDB can replay it (tournament_rollup itself consumes the
    crawled store, which the driver's oracle cannot see). Per supplier,
    the first 8+(suppkey mod 4) lineitems by (orderkey, linenumber) are
    its games — n is always in 8..11, so every output goes through the
    dp-table path (both halves via antisymmetry) with integer-exact
    arithmetic end to end. result=((okey+lineno) mod 3)/2, opponent
    rating 1500+(partkey mod 800), avg = round-half-up(rating_sum/n).

    Scale plan: one groupby(map_groups) with an in-group sort+head —
    group sizes are per-key order counts; the dp lookup is a 4×23
    constant."""
    from ..functions.perf_rating import rating_performance

    li = T(sf_dir, "lineitem",
           ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])

    def _per_supplier(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_orderkey", "l_linenumber"],
                          kind="mergesort")
        k = 8 + int(g["l_suppkey"].iloc[0]) % 4
        g = g.head(k)
        if len(g) < 8:
            # suppliers with fewer than 8 lineitems would take the
            # closed-form branch the oracle's dp INNER JOIN cannot see;
            # exclude them EXPLICITLY on both sides (the oracle's
            # n_games >= 8 filter) instead of relying on corpus shape
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in (
                "suppkey", "n_games", "points_x2", "rating_sum",
                "avg_opp", "perf")})
        res = ((g["l_orderkey"] + g["l_linenumber"]) % 3) / 2.0
        opp = 1500 + (g["l_partkey"] % 800)
        n = len(g)
        rs = int(opp.sum())
        avg = (2 * rs + n) // (2 * n)  # round-half-up, exact ints
        perf = rating_performance(
            np.array([n]), np.array([res.sum()]),
            np.array([avg], dtype=np.float64), np.array([rs]),
            np.array([(res == 1.0).sum()]),
            np.array([(res == 0.0).sum()]))
        return pd.DataFrame({
            "suppkey": [int(g["l_suppkey"].iloc[0])],
            "n_games": [n],
            "points_x2": [int(round(res.sum() * 2))],
            "rating_sum": [rs],
            "avg_opp": [avg],
            "perf": [int(perf[0])],
        })

    return li.groupby("l_suppkey").map_groups(
        _per_supplier, batch_format="pandas")


def q_media_features(sf_dir):
    """M16 multimodal pipeline over the crawled players store: data-URI
    parse → binary payload column → actor-pool decode (PIL → pure-python
    header parse → deterministic stub) → hash-embedding features
    (rows-only: binary payloads are not a SQL surface)."""
    from ..stages.media import media_pipeline

    players = q_crawl_players(sf_dir)
    out = media_pipeline(players)
    return out.map_batches(
        lambda b: pa.table({
            "fide_id": b["fide_id"],
            "media_mime": b["media_mime"],
            "media_len": b["media_len"],
            "width": b["width"],
            "height": b["height"],
            "emb_dim": pc.list_value_length(b["media_embedding"]),
        }),
        batch_format="pyarrow",
    )


def q_media_dedup(sf_dir):
    """Exact media dedup by raw payload BYTES (binary-key dedup — the
    image-level exact dedup every multimodal corpus pipeline runs before
    perceptual hashing): decode data-URIs to binary, keep the
    first-by-lineage copy of each distinct payload. Rows-only (binary
    payloads are not a SQL surface); keep-first semantics pinned by the
    binary-key dedup unit test."""
    from ..stages.media import materialize_media_batch

    players = q_crawl_players(sf_dir)
    withp = players.map_batches(materialize_media_batch,
                                batch_format="pyarrow", batch_size=256)
    # deterministic keep-first order: the numeric fide_id (unique per
    # player, block-layout-independent)
    withp = withp.map_batches(
        lambda b: b.append_column("lineage",
                                  pc.cast(b["fide_id"], pa.int64())),
        batch_format="pyarrow",
    )
    deduped = DD.dedup_dataset(
        withp.map_batches(
            lambda b: b.filter(pc.is_valid(b["media_payload"])),
            batch_format="pyarrow"),
        key_cols=("media_payload",), order_col="lineage",
    )
    return deduped.map_batches(
        lambda b: pa.table({
            "fide_id": b["fide_id"],
            "media_len": b["media_len"],
        }),
        batch_format="pyarrow",
    )


def q_media_thumbnails(sf_dir):
    """Multimodal resize stage on top of the decode pipeline: actor-pool
    ``ImageResizeStub`` (real aspect math; PIL-gated resample) producing
    thumbnail dims + payload lengths (rows-only: binary surface)."""
    from ..stages.media import MEDIA_BATCH_SIZE, ImageResizeStub, media_pipeline

    out = media_pipeline(q_crawl_players(sf_dir)).map_batches(
        ImageResizeStub, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=2, num_cpus=0.5,
    )
    return out.map_batches(
        lambda b: pa.table({
            "fide_id": b["fide_id"],
            "width": b["width"], "height": b["height"],
            "thumb_width": b["thumb_width"],
            "thumb_height": b["thumb_height"],
            "thumb_len": pc.binary_length(b["thumb_payload"]),
        }),
        batch_format="pyarrow",
    )


def q_audio_framing(sf_dir):
    """Audio framing over opaque binary payloads: documents' byte counts
    stand in for PCM (1 byte/sample, 16 kHz; the codec decode is the
    stubbed part — framing arithmetic is real). The actor stage computes
    frames from the ACTUAL payload length; the oracle recomputes the
    closed form from n_chars — so the binary plumbing is end-to-end
    oracle-checked."""
    from ..stages.media import MEDIA_BATCH_SIZE, AudioFrameStage

    def _payload(b: pa.Table) -> pa.Table:
        pays = [bytes(int(n)) for n in b["n_chars"].to_pylist()]
        return pa.table({
            "doc_id": b["doc_id"],
            "audio_payload": pa.array(pays, pa.binary()),
        })

    ds = T(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _payload, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)
    out = ds.map_batches(
        AudioFrameStage, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=2, num_cpus=0.5,
    )
    return out.map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"],
            "n_samples": b["n_samples"],
            "n_frames": b["n_frames"],
            # no rounding: duration is ONE IEEE division of the same
            # integers on both sides → already bitwise identical
            # (rounding would break: n/16000 × 1e6 lands exactly on .5
            # for odd n, where pyarrow and SQL round different ways)
            "duration_s": b["duration_s"],
        }),
        batch_format="pyarrow",
    )


def q_video_frame_sample(sf_dir):
    """Video frame-sampling plumbing: per-doc synthetic frame counts +
    payloads → uniform deterministic index selection + digest frame
    payloads (rows-only; index math unit-tested)."""
    from ..stages.media import MEDIA_BATCH_SIZE, VideoFrameSampleStub

    def _fake_video(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.add(pc.bit_wise_and(b["doc_id"], 255), 1), pa.int64())
        pays = [str(i).encode() for i in b["doc_id"].to_pylist()]
        return pa.table({
            "doc_id": b["doc_id"],
            "n_video_frames": n,
            "media_payload": pa.array(pays, pa.binary()),
        })

    ds = T(sf_dir, "documents", ["doc_id"]).map_batches(
        _fake_video, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)
    out = ds.map_batches(
        VideoFrameSampleStub, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=2, num_cpus=0.5,
    )
    return out.map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"],
            "n_video_frames": b["n_video_frames"],
            "n_sampled": pc.list_value_length(b["sampled_frames"]),
        }),
        batch_format="pyarrow",
    )


PNG_DIM = 8  # 8×8 RGB → 192 bytes = exactly 12 md5-digest cycles
JPEG_DIM_W, JPEG_DIM_H = 24, 20  # height not a block multiple → the
# encode pad / decode crop path is exercised on every document


def q_png_pixel_stats(sf_dir):
    """REAL image decode, oracle-certified end to end: per document a
    genuine 8×8 RGB PNG is encoded (``png_encode_rgb8`` — stdlib zlib,
    real IHDR/IDAT/IEND + CRCs) from md5(doc_id)-cycled pixel bytes,
    then DECODED back with the pure-python ``png_decode`` (full
    scanline unfiltering), and the per-channel pixel sums of the
    DECODED array are emitted. The DuckDB oracle recomputes the same
    sums from the md5 closed form (digest byte j lands on channel
    (16r+j) mod 3 for cycle r) WITHOUT decoding — so any bug anywhere
    in the encoder, the zlib framing, or the decoder breaks the hash
    match. This closes the round-2 'pixel decode is stubbed' gap with
    a no-image-library decode path (PIL still preferred when present
    for formats beyond PNG).

    Scale plan: actor-pool stage (house multimodal contract: small
    MEDIA_BATCH_SIZE batches, binary columns); exchange is doc-shaped
    stat rows, payloads never shuffle."""
    from ..stages.media import MEDIA_BATCH_SIZE, PngPixelStatsStage

    def _mk(b: pa.Table) -> pa.Table:
        from ..stages.media import png_encode_rgb8

        pays = [png_encode_rgb8(
            PNG_DIM, PNG_DIM,
            hashlib.md5(f"png,{did}".encode()).digest()
            * (PNG_DIM * PNG_DIM * 3 // 16))
            for did in b["doc_id"].to_pylist()]
        return pa.table({
            "doc_id": b["doc_id"],
            "media_payload": pa.array(pays, pa.binary()),
        })

    ds = T(sf_dir, "documents", ["doc_id"]).map_batches(
        _mk, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)
    return ds.map_batches(
        PngPixelStatsStage, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=2, num_cpus=0.5,
    )


def q_jpeg_pixel_stats(sf_dir):
    """REAL baseline-JPEG decode, oracle-certified end to end (r4 —
    closes M16): per document a genuine JFIF JPEG (stages/jpeg.py
    encoder: DCT + quality-95 quantization + Annex K Huffman + byte
    stuffing) of a solid md5(doc_id)-derived color is encoded, then
    DECODED back with the pure-python ``jpeg_decode`` (marker walk,
    Huffman, dequantize, IDCT, YCbCr→RGB), and the per-channel pixel
    sums of the DECODED array are emitted. Solid colors round-trip the
    codec bit-exactly at this quantization (error bound 2.772·q/16 <
    0.5; sampled exhaustively in tests), so the DuckDB oracle
    recomputes the sums from the md5 closed form WITHOUT decoding —
    any bug in either codec half breaks the hash match.

    Scale plan: actor-pool stage (house multimodal contract: small
    MEDIA_BATCH_SIZE batches, binary columns); exchange is doc-shaped
    stat rows, payloads never shuffle."""
    from ..stages.media import MEDIA_BATCH_SIZE, JpegPixelStatsStage

    def _mk(b: pa.Table) -> pa.Table:
        from ..stages.jpeg import jpeg_encode_baseline

        pays = []
        for did in b["doc_id"].to_pylist():
            d = hashlib.md5(f"jpg,{did}".encode()).digest()
            arr = np.full((JPEG_DIM_H, JPEG_DIM_W, 3), list(d[:3]),
                          dtype=np.uint8)
            pays.append(jpeg_encode_baseline(arr, quality=95))
        return pa.table({
            "doc_id": b["doc_id"],
            "media_payload": pa.array(pays, pa.binary()),
        })

    ds = T(sf_dir, "documents", ["doc_id"]).map_batches(
        _mk, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)
    # decode is the CPU-bound half (pure-python Huffman+IDCT even after
    # the r5 table-driven rewrite): give the actor pool room to scale to
    # the encode stage's output rate instead of pinning it at 2×0.5 CPU
    return ds.map_batches(
        JpegPixelStatsStage, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=(2, 8), num_cpus=0.5,
    )


def q_fuzzy_match(sf_dir):
    """J3: fuzzy external join (Levenshtein argmax enrich) over crawled
    tournament names vs deterministic candidate links (rows-only)."""
    from ..functions.fuzzy import FuzzyJoiner

    gh = q_crawl_game_history(sf_dir)
    names = gh.unique("tournament_name")
    cands = [f"https://view.livechesscloud.com/#{n.lower().replace(' ', '-')}"
             for n in sorted(names)[:20]]
    ds = rd.from_items([{"tournament_name": n} for n in sorted(names)])
    return ds.map_batches(
        FuzzyJoiner, fn_constructor_args=(cands,),
        batch_format="pyarrow", batch_size=256, concurrency=2,
    )




def q_set_union(sf_dir):
    """Set op: union of two disjoint slices (ds.union) with dedup-free
    append semantics (the reference's pd.concat append path)."""
    lo = T(sf_dir, "part", ["p_partkey", "p_name"]).filter(expr="p_partkey < 100")
    hi = T(sf_dir, "part", ["p_partkey", "p_name"]).filter(expr="p_partkey >= 100")
    return lo.union(hi)


def q_topk_per_group(sf_dir):
    """Top-3 orders by price within each order priority. Mergeable
    grouped top-k (stages/fastagg.grouped_topk): per-batch vectorized
    sort+head(k) partials → tree combine — no per-group Python, so the
    plan survives group counts growing with data."""
    from ..stages.fastagg import grouped_topk

    ds = T(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])
    return grouped_topk(ds, ["o_orderpriority"],
                        ["o_totalprice", "o_orderkey"], [False, True], 3)


def q_events_sliding(sf_dir):
    """Sliding window (1h width, 30min slide): each event lands in two
    windows — flat-mapped window assignment + partial-agg groupby."""
    ds = T(sf_dir, "events", ["user_id", "ts", "value"])

    def _assign(b: pa.Table) -> pa.Table:
        # fully vectorized 2x window explosion: numpy epoch math + one
        # strftime per offset, rows replicated with arrow concat (the
        # r1 version built python lists row by row)
        secs = (b["ts"].to_pandas().astype("datetime64[s]").astype("int64")
                .to_numpy())

        def _arr(col):
            c = col.combine_chunks()
            if isinstance(c, pa.ChunkedArray):
                return c.chunk(0) if c.num_chunks else pa.array([], col.type)
            return c

        uid = _arr(b["user_id"])
        val = _arr(b["value"])
        starts = []
        for off in (0, 1800):
            start = ((secs - off) // 3600) * 3600 + off
            sts = pd.to_datetime(start, unit="s").strftime("%Y-%m-%d %H:%M:%S")
            starts.append(pa.array(np.asarray(sts), pa.string()))
        return pa.table({
            "user_id": pa.concat_arrays([uid, uid]),
            "window_start": pa.concat_arrays(starts),
            "value": pa.concat_arrays([val, val]),
        })

    out = fast_groupby_agg(
        ds.map_batches(_assign, batch_format="pyarrow"),
        ["user_id", "window_start"],
        {"n": (None, "count"), "sum_value": ("value", "sum")},
    )
    return out.map_batches(_canon_stage({"sum_value": 6}), batch_format="pyarrow")


def q_random_sample(sf_dir):
    """Deterministic hash-Bernoulli sample of lineitem (~1.2%): keep
    rows whose md5('<orderkey>,<linenumber>') starts with hex 00–02.
    Replaces the seeded-RNG sample (rows-only: RNG streams differ
    across engines AND across cluster sizes/block layouts) with an
    oracle-exact, cluster-size-stable sample — the reproducible-subset
    primitive a 100-TB pipeline actually needs (the same rows are kept
    no matter how the corpus is partitioned)."""

    def _sample(b: pa.Table) -> pa.Table:
        mask = [
            hashlib.md5(f"{o},{ln}".encode()).hexdigest()[:2]
            in ("00", "01", "02")
            for o, ln in zip(b["l_orderkey"].to_pylist(),
                             b["l_linenumber"].to_pylist())
        ]
        return b.filter(pa.array(mask, pa.bool_()))

    return T(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"]).map_batches(
        _sample, batch_format="pyarrow")


# ============================================================ registry

def queries() -> dict:
    return {
        "a5_grouped_multi_agg": q_a5_grouped_multi_agg,
        "a1_first_last": q_a1_first_last,
        "a2_global_mean": q_a2_global_mean,
        "a3_minmax_dates": q_a3_minmax_dates,
        "a4_count": q_a4_count,
        "a7_filtered_counts": q_a7_filtered_counts,
        "a8_conditional_means": q_a8_conditional_means,
        "a9_value_counts_pct": q_a9_value_counts_pct,
        "a10_rollup": q_a10_rollup,
        "a11_watermark": q_a11_watermark,
        "o2_topk": q_o2_topk,
        "o3_row_number": q_o3_row_number,
        "o4_unique_sorted": q_o4_unique_sorted,
        "m10_clean_numeric": q_m10_clean_numeric,
        "m3_regex_extract": q_m3_regex_extract,
        "m12_month_trunc": q_m12_month_trunc,
        "m13_isin_filter": q_m13_isin_filter,
        "m14_substring_filter": q_m14_substring_filter,
        "j1_broadcast_join": q_j1_broadcast_join,
        "j4_anti_join": q_j4_anti_join,
        "semi_join": q_semi_join,
        "d1_exact_dedup": q_d1_exact_dedup,
        "dedup_exact_text": q_dedup_exact_text,
        "text_token_stats": q_text_token_stats,
        "text_quality": q_text_quality,
        "text_fingerprint": q_text_fingerprint,
        "text_langid": q_text_langid,
        "text_rolling_fp": q_text_rolling_fp,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram": q_dedup_ngram,
        "dedup_embedding": q_dedup_embedding,
        "semdedup": q_semdedup,
        "ann_bruteforce": q_ann_bruteforce,
        "mmr_rerank": q_mmr_rerank,
        "hard_negatives": q_hard_negatives,
        "batch_inference": q_batch_inference,
        "ann_ivf": q_ann_ivf,
        "ann_ivf_recall": q_ann_ivf_recall,
        "embedding_kmeans": q_embedding_kmeans,
        "events_tumbling": q_events_tumbling,
        "events_sessionize": q_events_sessionize,
        "set_union": q_set_union,
        "topk_per_group": q_topk_per_group,
        "events_sliding": q_events_sliding,
        "random_sample": q_random_sample,
        "crawl_game_history": q_crawl_game_history,
        "crawl_politeness_audit": q_crawl_politeness_audit,
        "lineage_audit": q_lineage_audit,
        "crawl_metrics": q_crawl_metrics,
        "span_stats": q_span_stats,
        "span_reflow": q_span_reflow,
        "frontier_snapshot_stats": q_frontier_snapshot_stats,
        "crawl_players": q_crawl_players,
        "tournament_rollup": q_tournament_rollup,
        "fuzzy_match": q_fuzzy_match,
        "media_features": q_media_features,
        "media_thumbnails": q_media_thumbnails,
        "media_dedup": q_media_dedup,
        "audio_framing": q_audio_framing,
        "video_frame_sample": q_video_frame_sample,
        "png_pixel_stats": q_png_pixel_stats,
        "jpeg_pixel_stats": q_jpeg_pixel_stats,
        "perf_rating_dp": q_perf_rating_dp,
        # iterative (Lloyd-seeded) production variants of the r5
        # deterministic driver queries — rows-only by nature, gated by
        # recall/monotonicity tests
        "ann_ivf_lloyd": q_ann_ivf_lloyd,
        "embedding_kmeans_lloyd": q_embedding_kmeans_lloyd,
        "semdedup_lloyd": q_semdedup_lloyd,
        **_relational_queries(),
        **_textclean_queries(),
        **_quality_queries(),
    }


def _relational_queries() -> dict:
    from . import relational  # deferred: relational imports T from here

    return relational.queries()


def _textclean_queries() -> dict:
    from . import textclean  # deferred: textclean imports T from here

    return textclean.queries()


def _quality_queries() -> dict:
    from . import quality  # deferred: quality imports T from here

    return quality.QUERIES


ORACLES: dict[str, str] = {
    # Float canonicalization: round(x * 10^d) / 10^d on both sides (see
    # module docstring) — NOT round(x, d), whose 1-ULP choice differs
    # between pyarrow and DuckDB.
    "a5_grouped_multi_agg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity) * 10000.0) / 10000.0 AS sum_qty,
               round(avg(l_extendedprice) * 10000.0) / 10000.0 AS avg_price,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "a1_first_last": """
        SELECT DISTINCT user_id,
               round(first_value(value) OVER w * 1000000.0) / 1000000.0 AS first_value,
               round(last_value(value) OVER w * 1000000.0) / 1000000.0 AS last_value,
               round((last_value(value) OVER w - first_value(value) OVER w)
                     * 1000000.0) / 1000000.0 AS value_delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "a2_global_mean":
        "SELECT round(avg(l_extendedprice) * 10000.0) / 10000.0 AS avg_price"
        " FROM lineitem",
    "a3_minmax_dates": """
        SELECT strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_date,
               strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_date
        FROM orders
    """,
    "a4_count": "SELECT count(*) AS n_rows FROM lineitem",
    "a7_filtered_counts": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2
    """,
    "a8_conditional_means": """
        SELECT o_orderstatus, o_orderpriority,
               round(avg(o_totalprice) * 10000.0) / 10000.0 AS avg_price
        FROM orders GROUP BY 1, 2
    """,
    "a9_value_counts_pct": """
        SELECT o_orderstatus, count(*) AS n,
               round(count(*)::DOUBLE / sum(count(*)) OVER () * 1000000.0)
                   / 1000000.0 AS pct
        FROM orders GROUP BY o_orderstatus
    """,
    "a10_rollup": """
        SELECT l_orderkey, count(*) AS n_items,
               round(sum(l_quantity) * 10000.0) / 10000.0 AS sum_qty,
               round(sum(l_extendedprice) * 10000.0) / 10000.0 AS sum_price,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returns
        FROM lineitem GROUP BY l_orderkey
    """,
    "a11_watermark": """
        SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
        FROM events GROUP BY user_id
    """,
    "o2_topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "o3_row_number": """
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
               ROW_NUMBER() OVER (ORDER BY o_orderdate DESC, o_orderkey DESC) AS rank
        FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 100
    """,
    "o4_unique_sorted": "SELECT DISTINCT c_mktsegment FROM customer ORDER BY 1",
    "m10_clean_numeric": """
        SELECT c_custkey,
               CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT) AS c_num
        FROM customer
    """,
    "m3_regex_extract": """
        SELECT s_suppkey, regexp_extract(s_name, '(\\d+)', 1) AS sup_num
        FROM supplier
    """,
    "m12_month_trunc": """
        SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month, count(*) AS n
        FROM events GROUP BY 1
    """,
    "m13_isin_filter": """
        SELECT l_returnflag, count(*) AS n,
               round(sum(l_quantity) * 10000.0) / 10000.0 AS sum_qty
        FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1
    """,
    "m14_substring_filter": """
        SELECT p_partkey, p_name FROM part WHERE lower(p_name) LIKE '%widget%'
    """,
    "j1_broadcast_join": """
        SELECT c_mktsegment,
               round(sum(o_totalprice) * 10000.0) / 10000.0 AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "j4_anti_join": """
        SELECT o_orderkey FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    """,
    "semi_join": """
        SELECT p_partkey FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
    "d1_exact_dedup": """
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY l_partkey, l_suppkey
                ORDER BY l_orderkey * 100 + l_linenumber) AS rn
            FROM lineitem) WHERE rn = 1
    """,
    "dedup_exact_text": """
        SELECT doc_id, md5_fp FROM (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS md5_fp,
                   ROW_NUMBER() OVER (
                       PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                       ORDER BY doc_id) AS rn
            FROM documents) WHERE rn = 1
    """,
    # -------- near-dup survivor oracles (r4): the LSH pipelines verify
    # candidates with EXACT similarity (word-3-shingle / char-5-gram
    # Jaccard, simhash hamming, cosine) and keep-min-per-component — so
    # the survivor set is replayed brute-force in SQL (all-pairs exact
    # similarity graph → recursive-CTE transitive closure → min label).
    # This is exact, not approximate, whenever LSH candidate recall is
    # 1.0 over the truly-similar pairs, which holds on the driver corpora
    # (verified at sf0.001/0.01/0.1: brute-force == LSH survivors for
    # all four flavors). Jaccard thresholds compare as exact integer
    # ratios (i*10 >= u*7 ⟺ i/u >= 0.7 for the rationals at this corpus
    # scale — the engine's round(j, 6) >= t can only diverge within
    # 5e-7 of the threshold, and shingle-set sizes cap at ~2.5k so the
    # nearest non-equal rational is ≥ 4e-4 away).
    # PRECONDITION (shared by all the near-dup oracles + text_langid):
    # the corpus is ASCII — DuckDB's RE2 '\w' is ASCII-only while the
    # engine's Python '\w' is Unicode, so 'würld' tokenizes differently
    # on the two sides. tests/test_r4_ops.py pins brute-force==LSH on
    # the actual gate corpus, which also guards this.
    "dedup_minhash": """
        WITH RECURSIVE toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t
          FROM documents
        ),
        shing AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                             WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
                             ELSE list_transform(range(1, len(t) - 1),
                                                 i -> array_to_string(t[i:i+2], ' '))
                        END) AS s
          FROM toks
        ),
        ds AS (SELECT DISTINCT doc_id, s FROM shing),
        n AS (SELECT doc_id, count(*) AS c FROM ds GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS i
          FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        edges AS (
          SELECT x, y FROM inter
          JOIN n na ON na.doc_id = x JOIN n nb ON nb.doc_id = y
          WHERE i * 10 >= (na.c + nb.c - i) * 7
        ),
        sym AS (SELECT x, y FROM edges UNION ALL SELECT y AS x, x AS y FROM edges),
        reach(x, y) AS (SELECT x, y FROM sym
                        UNION SELECT r.x, s.y FROM reach r JOIN sym s ON s.x = r.y),
        dropped AS (SELECT x AS node FROM reach GROUP BY x HAVING min(y) < x)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT node FROM dropped)
    """,
    "dedup_ngram": """
        WITH RECURSIVE g AS (SELECT doc_id, lower(text) AS t FROM documents),
        shing AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                             WHEN len(t) <= 5 THEN [t]
                             ELSE list_transform(range(1, len(t) - 3),
                                                 i -> substr(t, i, 5))
                        END) AS s
          FROM g
        ),
        ds AS (SELECT DISTINCT doc_id, s FROM shing),
        n AS (SELECT doc_id, count(*) AS c FROM ds GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS i
          FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        edges AS (
          SELECT x, y FROM inter
          JOIN n na ON na.doc_id = x JOIN n nb ON nb.doc_id = y
          WHERE i * 5 >= (na.c + nb.c - i) * 4
        ),
        sym AS (SELECT x, y FROM edges UNION ALL SELECT y AS x, x AS y FROM edges),
        reach(x, y) AS (SELECT x, y FROM sym
                        UNION SELECT r.x, s.y FROM reach r JOIN sym s ON s.x = r.y),
        dropped AS (SELECT x AS node FROM reach GROUP BY x HAVING min(y) < x)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT node FROM dropped)
    """,
    # full simhash replay: md5-derived token hashes (sketches.md5_hash64)
    # → tf-weighted bit votes → per-pair hamming over the 64 bit columns
    # → hamming ≤ 3 edges → components (4×16-bit bands give exact recall
    # for hamming < 4 by pigeonhole, so brute-force == LSH).
    "dedup_simhash": """
        WITH RECURSIVE tk AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
          FROM documents
        ),
        tc AS (SELECT doc_id, tok, count(*) AS cnt FROM tk GROUP BY 1, 2),
        th AS (SELECT doc_id, cnt,
                      CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS h
               FROM tc),
        acc AS (
          SELECT doc_id, jj.j AS j,
                 sum(cnt * (2 * CAST((h >> jj.j) & 1 AS BIGINT) - 1)) AS a
          FROM th CROSS JOIN (SELECT unnest(range(64)) AS j) jj
          GROUP BY doc_id, jj.j
        ),
        -- every doc gets 64 bit rows; token-less docs (no tc rows)
        -- coalesce to the all-zero simhash, matching the engine's
        -- simhash64('') == 0 (two such docs are hamming-0 duplicates)
        bits AS (
          SELECT d.doc_id, jj.j AS j,
                 CASE WHEN coalesce(a.a, 0) > 0 THEN 1 ELSE 0 END AS b
          FROM documents d
          CROSS JOIN (SELECT unnest(range(64)) AS j) jj
          LEFT JOIN acc a ON a.doc_id = d.doc_id AND a.j = jj.j
        ),
        ham AS (
          SELECT ba.doc_id AS x, bb.doc_id AS y,
                 sum(CASE WHEN ba.b <> bb.b THEN 1 ELSE 0 END) AS d
          FROM bits ba JOIN bits bb ON ba.j = bb.j AND ba.doc_id < bb.doc_id
          GROUP BY 1, 2
        ),
        edges AS (SELECT x, y FROM ham WHERE d <= 3),
        sym AS (SELECT x, y FROM edges UNION ALL SELECT y AS x, x AS y FROM edges),
        reach(x, y) AS (SELECT x, y FROM sym
                        UNION SELECT r.x, s.y FROM reach r JOIN sym s ON s.x = r.y),
        dropped AS (SELECT x AS node FROM reach GROUP BY x HAVING min(y) < x)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT node FROM dropped)
    """,
    # cosine threshold margin: no pair sits within 1e-4 of 0.98 on the
    # driver corpora (checked at all three SFs), so float32 (engine) vs
    # float (DuckDB) cosine cannot flip an edge.
    "dedup_embedding": """
        WITH RECURSIVE edges AS (
          SELECT a.vec_id AS x, b.vec_id AS y
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.98
        ),
        sym AS (SELECT x, y FROM edges UNION ALL SELECT y AS x, x AS y FROM edges),
        reach(x, y) AS (SELECT x, y FROM sym
                        UNION SELECT r.x, s.y FROM reach r JOIN sym s ON s.x = r.y),
        dropped AS (SELECT x AS node FROM reach GROUP BY x HAVING min(y) < x)
        SELECT vec_id FROM embeddings
        WHERE vec_id NOT IN (SELECT node FROM dropped)
    """,
    "random_sample": """
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ',' ||
                         CAST(l_linenumber AS VARCHAR)), 1, 2)
              IN ('00', '01', '02')
    """,
    "text_rolling_fp": """
        SELECT doc_id,
               CAST(list_reduce(
                   list_prepend(CAST(0 AS HUGEINT),
                       list_transform(
                           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                           w -> CAST(CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS HUGEINT))),
                   (h, x) -> (h * 1000003 + x) % 2305843009213693951) AS BIGINT) AS roll_fp
        FROM documents
    """,
    "text_token_stats": """
        SELECT doc_id,
               CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_ws_tokens,
               len(regexp_extract_all(text, '\\w+')) AS n_word_tokens,
               CASE WHEN len(regexp_extract_all(text, '\\w+')) = 0 THEN 0.0
                    ELSE round(len(regexp_replace(text, '[^a-zA-Z0-9_]', '', 'g'))::DOUBLE
                               / len(regexp_extract_all(text, '\\w+')), 6) END
                   AS avg_word_len
        FROM documents
    """,
    "text_quality": """
        WITH t AS (
            SELECT doc_id, text,
                   len(text) AS n_chars,
                   len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) AS n_punct,
                   len(regexp_extract_all(text, '[0-9]')) AS n_digit,
                   regexp_extract_all(lower(text), '\\w+') AS words
            FROM documents)
        SELECT doc_id, n_chars, len(words) AS n_words,
               round(n_punct::DOUBLE / greatest(n_chars, 1), 6) AS punct_ratio,
               round(n_digit::DOUBLE / greatest(n_chars, 1), 6) AS digit_ratio,
               round(len(list_filter(words, x -> x IN {stop}))::DOUBLE
                     / greatest(len(words), 1), 6) AS stopword_ratio,
               round(0.4 * round(len(list_filter(words, x -> x IN {stop}))::DOUBLE
                                 / greatest(len(words), 1), 6)
                     + 0.3 * (1.0 - round(n_punct::DOUBLE / greatest(n_chars, 1), 6))
                     + 0.3 * (1.0 - round(n_digit::DOUBLE / greatest(n_chars, 1), 6)),
                     6) AS quality_score
        FROM t
    """.replace("{stop}", _STOP_SQL),
    "text_fingerprint": """
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS md5_fp
        FROM documents
    """,
    "text_langid": """
        WITH t AS (
            SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS words
            FROM documents),
        s AS (
            SELECT doc_id, len(words) AS n,
                len(list_filter(words, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','auf','für'))) AS de,
                len(list_filter(words, x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS en,
                len(list_filter(words, x -> x IN ('el','la','los','y','es','un','una','en','por','que'))) AS es,
                len(list_filter(words, x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS fr,
                len(list_filter(words, x -> x IN ('o','a','os','e','é','um','uma','em','para','não'))) AS pt
            FROM t),
        m AS (
            SELECT *, greatest(de, en, es, fr, pt) AS mx,
                   (de = greatest(de, en, es, fr, pt))::INT
                 + (en = greatest(de, en, es, fr, pt))::INT
                 + (es = greatest(de, en, es, fr, pt))::INT
                 + (fr = greatest(de, en, es, fr, pt))::INT
                 + (pt = greatest(de, en, es, fr, pt))::INT AS ties
            FROM s)
        SELECT doc_id,
               CASE WHEN n = 0 OR mx = 0 OR ties > 1 THEN 'und'
                    WHEN de = mx THEN 'de' WHEN en = mx THEN 'en'
                    WHEN es = mx THEN 'es' WHEN fr = mx THEN 'fr'
                    ELSE 'pt' END AS lang_pred,
               CASE WHEN n = 0 OR mx = 0 OR ties > 1 THEN 0.0
                    ELSE round(mx::DOUBLE / n * 1000000.0) / 1000000.0
                    END AS lang_conf
        FROM m
    """,
    "set_union": """
        SELECT p_partkey, p_name FROM part WHERE p_partkey < 100
        UNION ALL
        SELECT p_partkey, p_name FROM part WHERE p_partkey >= 100
    """,
    "topk_per_group": """
        SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey) AS rank
            FROM orders) WHERE rank <= 3
    """,
    "events_sliding": """
        WITH w AS (
            SELECT user_id, value,
                   to_timestamp((floor(epoch(ts))::BIGINT // 3600) * 3600) AS ws
            FROM events
            UNION ALL
            SELECT user_id, value,
                   to_timestamp(((floor(epoch(ts))::BIGINT - 1800) // 3600) * 3600 + 1800) AS ws
            FROM events)
        SELECT user_id, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
               count(*) AS n,
               round(sum(value) * 1000000.0) / 1000000.0 AS sum_value
        FROM w GROUP BY 1, 2
    """,
    "events_tumbling": """
        SELECT user_id,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               count(*) AS n,
               round(sum(value) * 1000000.0) / 1000000.0 AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_sessionize": """
        SELECT user_id, (1 + sum(brk))::BIGINT AS n_sessions FROM (
            SELECT user_id,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
            FROM events) GROUP BY user_id
    """,
    "batch_inference": """
        WITH e AS (
            SELECT vec_id, gs - 1 AS j,
                   CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                        AS BIGINT) AS efp
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS t(gs)
        ),
        l AS (
            SELECT vec_id, c,
                   CAST(sum(efp * (((j * 31 + c * 17) % 7) - 3))
                        AS BIGINT) AS logit_fp
            FROM e, unnest(generate_series(0, 2)) AS cc(c)
            GROUP BY vec_id, c
        ),
        r AS (
            SELECT vec_id, c, logit_fp, row_number() OVER (
                PARTITION BY vec_id ORDER BY logit_fp DESC, c) AS rn
            FROM l
        )
        SELECT vec_id, CAST(c AS BIGINT) AS pred,
               logit_fp AS best_logit_fp
        FROM r WHERE rn = 1
    """,
    "hard_negatives": """
        WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
                   FROM embeddings WHERE vec_id < 5),
        s AS (SELECT q.qid AS query_id, e.vec_id,
                     CAST(list_cosine_similarity(q.qe, e.embedding)
                          AS DOUBLE) AS raw
              FROM q, embeddings e WHERE e.label <> q.ql),
        r AS (SELECT query_id, vec_id, raw, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY raw DESC, vec_id) AS rank
              FROM s)
        SELECT CAST(query_id AS INT) AS query_id, vec_id,
               round(raw, 4) AS score, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 10
    """,
    "ann_bruteforce": """
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id < 5),
        s AS (SELECT q.qid AS query_id, e.vec_id,
                     CAST(list_cosine_similarity(q.qe, e.embedding) AS DOUBLE) AS raw
              FROM q, embeddings e),
        r AS (SELECT query_id, vec_id, raw, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY raw DESC, vec_id) AS rank
              FROM s)
        SELECT CAST(query_id AS INT) AS query_id, vec_id,
               round(raw, 4) AS score, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 10
    """,
    # (ann_ivf / ann_ivf_recall are appended below ORACLES from the
    # shared _IVF_CHAIN_SQL fragment — r5 review: the two copies of the
    # centroid/assign/probe/score chain had already started to drift)
    # Deterministic k-means stats replay (r5): md5-sample centroids,
    # DOUBLE[] cosine (~1e-15 agreement with the engine's float64 path),
    # per-member micro-unit quantization BEFORE the sum so the cluster
    # aggregate is an exact, order-free integer on both sides.
    "embedding_kmeans": """
        WITH c AS (SELECT embedding AS ce,
                 ROW_NUMBER() OVER (ORDER BY
                     md5('km:42:' || CAST(vec_id AS VARCHAR)), vec_id)
                 - 1 AS cidx
               FROM embeddings QUALIFY cidx < 8),
        a AS (SELECT e.vec_id,
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                       CAST(c.ce AS DOUBLE[])) AS s,
                c.cidx,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id
                    ORDER BY list_cosine_similarity(
                                 CAST(e.embedding AS DOUBLE[]),
                                 CAST(c.ce AS DOUBLE[])) DESC, c.cidx)
                    AS rn
              FROM embeddings e, c),
        asg AS (SELECT vec_id, cidx AS cluster,
                  CAST(round(s * 1000000) AS BIGINT) AS sfp
                FROM a WHERE rn = 1),
        g AS (SELECT cluster, count(*) AS n, sum(sfp) AS s
              FROM asg GROUP BY cluster),
        allc AS (SELECT unnest(range(8)) AS cluster)
        SELECT CAST(allc.cluster AS BIGINT) AS cluster,
               COALESCE(g.n, 0) AS n,
               CAST(COALESCE(g.s, 0) AS BIGINT) AS sum_sim_fp,
               CAST(COALESCE(floor(g.s / g.n), 0) AS BIGINT) AS mean_sim_fp
        FROM allc LEFT JOIN g USING (cluster)
    """,
    # SemDeDup replay (r5): md5-sample clusters, within-cluster edges at
    # threshold 0.5 (margin |cos-0.5| ≥ 1.6e-3 at every SF), then the
    # same reachable-to-smaller-id component drop as dedup_embedding.
    # DOUBLE[] casts match the engine's float64 assignment path to
    # ~1e-15 (r5 review fix — uncast FLOAT[] is ~1.4e-7 off).
    "semdedup": """
        WITH RECURSIVE c AS (SELECT embedding AS ce,
                 ROW_NUMBER() OVER (ORDER BY
                     md5('km:42:' || CAST(vec_id AS VARCHAR)), vec_id)
                 - 1 AS cidx
               FROM embeddings QUALIFY cidx < 8),
        a AS (SELECT e.vec_id, e.embedding, c.cidx,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id
                    ORDER BY list_cosine_similarity(
                                 CAST(e.embedding AS DOUBLE[]),
                                 CAST(c.ce AS DOUBLE[])) DESC, c.cidx)
                    AS rn
              FROM embeddings e, c),
        asg AS (SELECT vec_id, embedding, cidx AS cluster
                FROM a WHERE rn = 1),
        edges AS (SELECT x.vec_id AS x, y.vec_id AS y
                  FROM asg x JOIN asg y ON x.cluster = y.cluster
                                       AND x.vec_id < y.vec_id
                  WHERE list_cosine_similarity(
                            CAST(x.embedding AS DOUBLE[]),
                            CAST(y.embedding AS DOUBLE[])) >= 0.5),
        sym AS (SELECT x, y FROM edges
                UNION ALL SELECT y AS x, x AS y FROM edges),
        reach(x, y) AS (SELECT x, y FROM sym
                        UNION SELECT r.x, s.y FROM reach r
                              JOIN sym s ON s.x = r.y),
        dropped AS (SELECT x AS node FROM reach GROUP BY x
                    HAVING min(y) < x)
        SELECT vec_id FROM embeddings
        WHERE vec_id NOT IN (SELECT node FROM dropped)
    """,
    # framing closed-form: engine computes from ACTUAL payload length,
    # oracle from n_chars (payload is n_chars bytes by construction)
    "audio_framing": """
        SELECT doc_id, n_chars AS n_samples,
               CASE WHEN n_chars >= 400
                    THEN CAST(floor((n_chars - 400) / 160.0) AS BIGINT) + 1
                    ELSE 0 END AS n_frames,
               n_chars / 16000.0 AS duration_s
        FROM documents
    """,
    # Closed form for the REAL encode→decode round trip: pixel bytes are
    # md5('png,'||doc_id) cycled 12×16=192 times over an 8×8 RGB image;
    # digest byte j of cycle r sits at flat index 16r+j → channel
    # (16r+j)%3 = (r+j)%3 (16 ≡ 1 mod 3). The engine side decodes the
    # actual PNG bytes; any encoder/zlib/unfilter bug breaks the match.
    # Closed form for the REAL JPEG encode→decode round trip: each doc's
    # image is a solid color (r,g,b) = first 3 md5('jpg,'||doc_id) bytes
    # over 24×20 pixels; solid colors round-trip the baseline codec
    # exactly at quality 95, so channel sums are value·480. The engine
    # side decodes the actual JPEG bytes — any Huffman/IDCT/color bug
    # breaks the match.
    "jpeg_pixel_stats": """
        SELECT doc_id, CAST(24 AS BIGINT) AS width,
               CAST(20 AS BIGINT) AS height,
               CAST(('0x' || substr(md5('jpg,' || CAST(doc_id AS VARCHAR)),
                                    1, 2)) AS BIGINT) * 480 AS r_sum,
               CAST(('0x' || substr(md5('jpg,' || CAST(doc_id AS VARCHAR)),
                                    3, 2)) AS BIGINT) * 480 AS g_sum,
               CAST(('0x' || substr(md5('jpg,' || CAST(doc_id AS VARCHAR)),
                                    5, 2)) AS BIGINT) * 480 AS b_sum
        FROM documents
    """,
    "png_pixel_stats": """
        WITH b AS (
          SELECT d.doc_id, (r.r + j.j) % 3 AS chan,
                 CAST(('0x' || substr(md5('png,' || CAST(d.doc_id AS VARCHAR)),
                                      2 * j.j + 1, 2)) AS INT) AS v
          FROM documents d,
               (SELECT unnest(range(12)) AS r) r,
               (SELECT unnest(range(16)) AS j) j
        )
        SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
               CAST(sum(CASE WHEN chan = 0 THEN v END) AS BIGINT) AS r_sum,
               CAST(sum(CASE WHEN chan = 1 THEN v END) AS BIGINT) AS g_sum,
               CAST(sum(CASE WHEN chan = 2 THEN v END) AS BIGINT) AS b_sum
        FROM b GROUP BY doc_id
    """,
}


def _perf_dp_values() -> str:
    """The M17 FIDE dp table as SQL VALUES rows (n, points*2, delta) —
    generated from the same ``perf_rating._TABLE`` the engine uses (the
    table itself is pinned against a reference transliteration in
    tests/test_functions.py; the oracle certifies the PIPELINE around
    it: grouping, first-k selection, exact integer aggregation,
    round-half-up average, antisymmetric mirror)."""
    from ..functions.perf_rating import _TABLE

    rows = []
    for n in range(8, 12):
        for p2 in range(0, 2 * n + 1):
            rows.append(f"({n},{p2},{int(_TABLE[n - 8, p2])})")
    return ", ".join(rows)


ORACLES["perf_rating_dp"] = f"""
    WITH g AS (
        SELECT l_suppkey AS suppkey, l_orderkey, l_linenumber,
               1500 + (l_partkey % 800) AS opp,
               (l_orderkey + l_linenumber) % 3 AS res2,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                  ORDER BY l_orderkey, l_linenumber) AS rn
        FROM lineitem
    ),
    sel AS (SELECT * FROM g WHERE rn <= 8 + suppkey % 4),
    agg AS (
        SELECT suppkey, count(*) AS n_games,
               CAST(sum(res2) AS BIGINT) AS points_x2,
               CAST(sum(opp) AS BIGINT) AS rating_sum
        FROM sel GROUP BY suppkey
        HAVING count(*) >= 8  -- mirror of the engine's explicit n>=8 gate
    ),
    dp(n, p2, delta) AS (VALUES {_perf_dp_values()}),
    fin AS (
        SELECT suppkey, n_games, points_x2, rating_sum,
               (2 * rating_sum + n_games) // (2 * n_games) AS avg_opp
        FROM agg)
    SELECT f.suppkey, f.n_games, f.points_x2, f.rating_sum, f.avg_opp,
           CAST(f.avg_opp + d.delta AS BIGINT) AS perf
    FROM fin f JOIN dp d ON d.n = f.n_games AND d.p2 = f.points_x2
"""


def _mmr_sql(k: int = 10, pool: int = 50) -> str:
    """Unrolled-greedy SQL replay of q_mmr_rerank (r5): the k selection
    steps become k chained argmax CTEs (ROW_NUMBER per query, obj DESC /
    vec_id tie-break), over the same integer fixed-point arithmetic the
    engine uses — rel12 from the oracle-pinned 4-dp pool scores, sim_int
    as the exact int64 dot of 1e-6-quantized unit vectors (products sum
    ≤ d·1e12 ≪ 2^53, so DuckDB's double list_inner_product is exact).
    CTEs are MATERIALIZED: DuckDB inlines plain CTEs per reference,
    which goes exponential over k chained steps."""
    steps = []
    for step in range(1, k + 1):
        if step == 1:
            steps.append("""s1 AS MATERIALIZED (
              SELECT query_id, vec_id, 1 AS rank, 7 * rel12 AS mmr_fp FROM (
                SELECT query_id, vec_id, rel12, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY rel12 DESC, vec_id) AS rn
                FROM cand)
              WHERE rn = 1)""")
            steps.append("ch1 AS MATERIALIZED ("
                         "SELECT query_id, vec_id FROM s1)")
        else:
            p = step - 1
            steps.append(f"""d{step} AS MATERIALIZED (
              SELECT p.query_id, p.vec_id, max(p.sim_int) AS m
              FROM psim p JOIN ch{p} c ON c.query_id = p.query_id
                                      AND c.vec_id = p.other_id
              GROUP BY 1, 2)""")
            steps.append(f"""s{step} AS MATERIALIZED (
              SELECT query_id, vec_id, {step} AS rank, obj AS mmr_fp FROM (
                SELECT c.query_id, c.vec_id,
                  7 * c.rel12 - 3 * COALESCE(d.m, 0) AS obj,
                  ROW_NUMBER() OVER (PARTITION BY c.query_id
                     ORDER BY 7 * c.rel12 - 3 * COALESCE(d.m, 0) DESC,
                              c.vec_id) AS rn
                FROM cand c
                LEFT JOIN d{step} d ON d.query_id = c.query_id
                                   AND d.vec_id = c.vec_id
                ANTI JOIN ch{p} x ON x.query_id = c.query_id
                                 AND x.vec_id = c.vec_id)
              WHERE rn = 1)""")
            steps.append(
                f"ch{step} AS MATERIALIZED (SELECT query_id, vec_id "
                f"FROM ch{p} UNION ALL SELECT query_id, vec_id FROM s{step})")
    union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, k + 1))
    return f"""
    WITH q AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qe
                            FROM embeddings WHERE vec_id < 5),
    s0 AS (SELECT q.qid AS query_id, e.vec_id,
             CAST(list_cosine_similarity(q.qe, e.embedding) AS DOUBLE)
                 AS raw
           FROM q, embeddings e),
    pool AS MATERIALIZED (SELECT query_id, vec_id, round(raw, 4) AS score
             FROM (SELECT query_id, vec_id, raw, ROW_NUMBER() OVER (
                     PARTITION BY query_id ORDER BY raw DESC, vec_id) AS rnk
                   FROM s0)
             WHERE rnk <= {pool}),
    ufp AS MATERIALIZED (SELECT e.vec_id,
             list_transform(CAST(e.embedding AS DOUBLE[]),
               x -> CAST(round(x / sqrt(list_inner_product(
                        CAST(e.embedding AS DOUBLE[]),
                        CAST(e.embedding AS DOUBLE[]))) * 1000000)
                    AS BIGINT)) AS u
           FROM embeddings e SEMI JOIN pool p ON p.vec_id = e.vec_id),
    cand AS MATERIALIZED (SELECT p.query_id, p.vec_id,
             CAST(round(p.score * 10000) AS BIGINT) * 100000000 AS rel12
           FROM pool p),
    psim AS MATERIALIZED (SELECT a.query_id, a.vec_id,
             b.vec_id AS other_id,
             CAST(list_inner_product(CAST(ua.u AS DOUBLE[]),
                                     CAST(ub.u AS DOUBLE[])) AS BIGINT)
                 AS sim_int
           FROM pool a JOIN pool b ON a.query_id = b.query_id
                                  AND a.vec_id <> b.vec_id
           JOIN ufp ua ON ua.vec_id = a.vec_id
           JOIN ufp ub ON ub.vec_id = b.vec_id),
    {','.join(steps)}
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(rank AS BIGINT) AS rank, vec_id,
           CAST(mmr_fp AS BIGINT) AS mmr_fp
    FROM ({union})
    """


ORACLES["mmr_rerank"] = _mmr_sql()

# Deterministic-IVF replay chain (r5), shared by ann_ivf and
# ann_ivf_recall so the two oracles cannot drift: centroids =
# md5-sample, zero Lloyd rounds; every cosine runs on DOUBLE[] casts so
# the SQL agrees with the engine's float64 precise=True path to ~1e-15
# (the uncast FLOAT[] path differs by up to ~1.4e-7 — measured — which
# is still inside the ≥5.8e-6 decision margins but erodes the headroom
# the design assumes; r5 review fix).
_IVF_CHAIN_SQL = """
    c AS (SELECT vec_id AS cvid, embedding AS ce,
             ROW_NUMBER() OVER (ORDER BY
                 md5('ivf:42:' || CAST(vec_id AS VARCHAR)), vec_id)
             - 1 AS cidx
           FROM embeddings QUALIFY cidx < 16),
    a AS (SELECT e.vec_id, e.embedding, c.cidx,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY list_cosine_similarity(
                             CAST(e.embedding AS DOUBLE[]),
                             CAST(c.ce AS DOUBLE[])) DESC, c.cidx) AS rn
          FROM embeddings e, c),
    asg AS (SELECT vec_id, embedding, cidx AS bucket FROM a WHERE rn = 1),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
          WHERE vec_id < 5),
    qp AS (SELECT q.qid, c.cidx,
             ROW_NUMBER() OVER (PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(
                              CAST(q.qe AS DOUBLE[]),
                              CAST(c.ce AS DOUBLE[])) DESC, c.cidx)
                 AS prn
           FROM q, c),
    probe AS (SELECT qid, cidx FROM qp WHERE prn <= 8),
    s AS (SELECT q.qid AS query_id, g.vec_id,
            list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                   CAST(g.embedding AS DOUBLE[])) AS raw
          FROM q JOIN probe p ON p.qid = q.qid
          JOIN asg g ON g.bucket = p.cidx)
"""

ORACLES["ann_ivf"] = f"""
    WITH {_IVF_CHAIN_SQL},
    r AS (SELECT query_id, vec_id, raw, ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY raw DESC, vec_id) AS rank
          FROM s)
    SELECT CAST(query_id AS INT) AS query_id, vec_id,
           round(raw, 4) AS score, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 10
"""

# Same probe chain, intersected with the brute-force top-10;
# recall = hits / 50 is exact-integer arithmetic.
ORACLES["ann_ivf_recall"] = f"""
    WITH {_IVF_CHAIN_SQL},
    ivf AS (SELECT query_id, vec_id FROM (
              SELECT query_id, vec_id, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY raw DESC, vec_id) AS rank
              FROM s) WHERE rank <= 10),
    bs AS (SELECT q.qid AS query_id, e.vec_id,
             list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])) AS raw
           FROM q, embeddings e),
    brute AS (SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY raw DESC, vec_id)
                    AS rnk
                FROM bs) WHERE rnk <= 10),
    h AS (SELECT count(*) AS hits FROM brute b
          SEMI JOIN ivf i ON i.query_id = b.query_id
                         AND i.vec_id = b.vec_id),
    t AS (SELECT count(*) AS total,
                 count(DISTINCT query_id) AS nq FROM brute)
    SELECT round(h.hits * 1000000.0 / t.total) / 1000000.0
               AS recall_at_10,
           CAST(t.nq AS BIGINT) AS n_queries
    FROM h, t
"""

# Flagship crawl replay (r5): the full parse (stages/parse.py:212
# semantics — header/rating forward-fill, i-th-media color join,
# malformed-doc drops, 7-field row gate) → normalize (M10/M11 casts) →
# min-lineage keep-first dedup → dropna chain, in SQL, over the
# ground-truth span sidecar written by _calc_spans_sidecar(). lineage =
# priority·2^16 + span offset, exactly the engine's packing.
ORACLES["crawl_game_history"] = f"""
    WITH docs AS (SELECT fide_id, player_name, priority, spans
                  FROM read_parquet('{_CALC_SPANS_SIDECAR}')),
    sp AS (SELECT fide_id, player_name, priority,
                  unnest(spans) AS s,
                  unnest(range(len(spans))) AS pos
           FROM docs),
    f AS (SELECT fide_id, player_name, priority, pos,
                 s.kind AS kind, s.text AS text, s.media_ref AS mref
          FROM sp),
    st AS (SELECT *,
             max(CASE WHEN kind = 'header' THEN pos END) OVER w AS hpos,
             max(CASE WHEN kind = 'rating' THEN pos END) OVER w AS rpos
           FROM f
           WINDOW w AS (PARTITION BY priority, fide_id ORDER BY pos)),
    games AS (SELECT *, row_number() OVER (PARTITION BY priority, fide_id
                                           ORDER BY pos) AS grank
              FROM st WHERE kind = 'game'),
    media AS (SELECT fide_id, priority,
                     row_number() OVER (PARTITION BY priority, fide_id
                                        ORDER BY pos) AS mrank,
                     (mref LIKE '%clr_wh%') AS is_white
              FROM f WHERE kind = 'media'),
    hdr AS (SELECT fide_id, priority, pos,
                   split_part(text, '|', 1) AS tname,
                   CASE WHEN strpos(text, '|') > 0
                        THEN split_part(text, '|', 2) END AS tdate,
                   (strpos(text, '|') = 0) AS hbad
            FROM f WHERE kind = 'header'),
    rat AS (SELECT fide_id, priority, pos, text AS prating
            FROM f WHERE kind = 'rating'),
    gm AS (SELECT fide_id, priority, count(*) AS ng FROM games GROUP BY 1, 2),
    mm AS (SELECT fide_id, priority, count(*) AS nm FROM media GROUP BY 1, 2),
    bad AS (
      SELECT fide_id, priority FROM hdr WHERE hbad
      UNION
      SELECT fide_id, priority FROM games
      WHERE len(string_split(text, '|')) < 7
      UNION
      SELECT g.fide_id, g.priority FROM gm g
      LEFT JOIN mm USING (fide_id, priority)
      WHERE g.ng > COALESCE(mm.nm, 0)),
    parsed AS (
      SELECT g.fide_id,
             h.tdate AS date,
             h.tname AS tournament_name,
             split_part(g.text, '|', 3) AS country,
             g.player_name,
             r.prating AS player_rating,
             CASE WHEN m.is_white THEN 'white' ELSE 'black' END
                 AS player_color,
             split_part(g.text, '|', 1) AS opponent_name,
             split_part(g.text, '|', 2) AS opponent_rating,
             split_part(g.text, '|', 4) AS result,
             split_part(g.text, '|', 5) AS chg,
             split_part(g.text, '|', 6) AS k,
             split_part(g.text, '|', 7) AS k_chg,
             g.priority * 65536 + g.pos AS lineage
      FROM games g
      ANTI JOIN bad b ON b.fide_id = g.fide_id AND b.priority = g.priority
      JOIN media m ON m.fide_id = g.fide_id AND m.priority = g.priority
                 AND m.mrank = g.grank
      LEFT JOIN hdr h ON h.fide_id = g.fide_id AND h.priority = g.priority
                     AND h.pos = g.hpos
      LEFT JOIN rat r ON r.fide_id = g.fide_id AND r.priority = g.priority
                     AND r.pos = g.rpos
      WHERE split_part(g.text, '|', 1) <> ''
        AND split_part(g.text, '|', 2) <> ''
        AND split_part(g.text, '|', 3) <> ''
        AND split_part(g.text, '|', 4) <> ''
        AND split_part(g.text, '|', 5) <> ''
        AND split_part(g.text, '|', 6) <> ''
        AND split_part(g.text, '|', 7) <> ''),
    norm AS (
      SELECT fide_id, date, tournament_name, country, player_name,
             CAST(CAST(NULLIF(trim(player_rating), '') AS DOUBLE) AS INT)
                 AS player_rating,
             player_color, opponent_name,
             CAST(CAST(NULLIF(regexp_replace(opponent_rating, '[^0-9]',
                                             '', 'g'), '') AS DOUBLE)
                  AS INT) AS opponent_rating,
             CAST(NULLIF(trim(result), '') AS REAL) AS result,
             CAST(NULLIF(trim(chg), '') AS REAL) AS chg,
             CAST(CAST(NULLIF(trim(k), '') AS DOUBLE) AS INT) AS k,
             CAST(NULLIF(trim(k_chg), '') AS REAL) AS k_chg,
             lineage
      FROM parsed),
    dedup AS (SELECT *, row_number() OVER (
                PARTITION BY date, tournament_name, player_name,
                             opponent_name, result
                ORDER BY lineage) AS rn
              FROM norm)
    SELECT fide_id, date, tournament_name, country, player_name,
           player_rating, player_color, opponent_name, opponent_rating,
           result, chg, k, k_chg
    FROM dedup
    WHERE rn = 1
      AND fide_id IS NOT NULL AND fide_id <> ''
      AND date IS NOT NULL AND date <> ''
      AND tournament_name IS NOT NULL AND tournament_name <> ''
      AND country IS NOT NULL AND country <> ''
      AND player_name IS NOT NULL AND player_name <> ''
      AND player_rating IS NOT NULL
      AND player_color IS NOT NULL AND player_color <> ''
      AND opponent_name IS NOT NULL AND opponent_name <> ''
      AND opponent_rating IS NOT NULL
      AND result IS NOT NULL AND chg IS NOT NULL
      AND k IS NOT NULL AND k_chg IS NOT NULL
"""


def oracle_sql() -> dict:
    from . import relational, textclean  # deferred: both import T from here

    # the crawl replay oracle reads the ground-truth span sidecar; write
    # it here too (cheap, idempotent, pure python — no Ray) so the file
    # exists no matter whether the driver runs queries or SQL first. A
    # write failure is only tolerable when a (content-versioned, so
    # guaranteed-current) sidecar already exists — otherwise surface it
    # rather than letting DuckDB fail on a missing file later.
    try:
        _calc_spans_sidecar()
    except Exception:
        if not os.path.exists(_CALC_SPANS_SIDECAR):
            raise
    return {**ORACLES, **relational.ORACLES, **textclean.ORACLES}
