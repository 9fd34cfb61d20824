"""relational layer (7/7): classical-algorithm audit replays (Luby MIS, k-truss, Katz, PPR,
BWT, Huffman, caching/stopping policies) with in-query certificates.

Split out of pipelines/relational.py (r4) with ZERO behavior change —
statements keep their original order; ``relational`` re-exports
everything, and ORACLES entries registered here mutate the shared dict
owned by rel_audit_core (or the facade-merged view). See
pipelines/relational.py for the facade contract.
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

from ..stages.fastagg import fast_groupby_agg, live_arrow
from .queries import JOIN_PARTS, T, _canon_stage, _queries_matrix
from .rel_joins import (
    _TOKEN,
    _pagerank_edges,
    _round_half_away,
    _ts_ns,
    q_event_transitions,
)
from .rel_audit_core import (
    ORACLES,
)



# ================================ NOT IN / NOT EXISTS null semantics

NIN_NULL_MOD = 13  # suppliers with s_suppkey % 13 == 0 contribute NULL


def q_not_in_null_audit(sf_dir):
    """Three-valued-logic parity audit: ``x NOT IN (subquery)`` vs
    ``NOT EXISTS`` when the subquery contains NULLs — the classic SQL
    semantics trap every engine must reproduce exactly (one NULL in the
    IN-list makes every non-match UNKNOWN, so NOT IN returns ZERO rows
    while NOT EXISTS still anti-joins). Subquery: supplier nation keys
    with a deterministic NULL injected for s_suppkey ≡ 0 mod 13; outer
    side: customers by c_nationkey. One row out: customer count, IN
    count, NOT-IN count (0 when a NULL is present — computed from the
    data, not hardcoded), NOT-EXISTS count, and the has-null flag.

    Scale plan: the subquery folds to per-batch DISTINCT (value,
    is_null) rows — ≤ |nations|+1 rows per block, an enum-sized
    exchange regardless of supplier count — collected once and
    broadcast into a single vectorized ``np.isin`` counting pass over
    customer whose partials sum in one tiny fold. No row-level
    exchange anywhere."""
    import ray.data as rd

    sup = T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def _vals(b: pa.Table) -> pa.Table:
        sk = b["s_suppkey"].to_numpy(zero_copy_only=False)
        nk = (b["s_nationkey"].to_numpy(zero_copy_only=False)
              .astype(np.int64))
        isnull = (sk % NIN_NULL_MOD) == 0
        vals = np.unique(nk[~isnull])
        out_v = np.append(vals, -1) if isnull.any() else vals
        out_n = np.append(np.zeros(len(vals), np.int64), 1) \
            if isnull.any() else np.zeros(len(vals), np.int64)
        return pa.table({"v": pa.array(out_v, pa.int64()),
                         "nul": pa.array(out_n, pa.int64())})

    # enum-sized: ≤ |nations|+1 distinct rows survive the fold
    keyset = fast_groupby_agg(
        sup.map_batches(_vals, batch_format="pyarrow"),
        ["v", "nul"], {"n": (None, "count")}).to_pandas()
    has_null = int((keyset["nul"] == 1).any())
    sset = np.sort(keyset.loc[keyset["nul"] == 0, "v"]
                   .to_numpy(np.int64))

    cust = T(sf_dir, "customer", ["c_nationkey"])

    def _cnt(b: pa.Table) -> pa.Table:
        k = (b["c_nationkey"].to_numpy(zero_copy_only=False)
             .astype(np.int64))
        inm = np.isin(k, sset)
        return pa.table({
            "n_customers": pa.array([len(k)], pa.int64()),
            "n_in": pa.array([int(inm.sum())], pa.int64()),
            "n_miss": pa.array([int((~inm).sum())], pa.int64()),
        })

    parts = fast_groupby_agg(
        cust.map_batches(_cnt, batch_format="pyarrow")
            .map_batches(lambda b: b.append_column(
                "one", pa.array([1] * b.num_rows, pa.int64())),
                batch_format="pyarrow"),
        ["one"], {"n_customers": ("n_customers", "sum"),
                  "n_in": ("n_in", "sum"),
                  "n_miss": ("n_miss", "sum")}).to_pandas()
    n_cust = int(parts["n_customers"].iloc[0])
    n_in = int(parts["n_in"].iloc[0])
    n_miss = int(parts["n_miss"].iloc[0])
    return rd.from_arrow(pa.table({
        "n_customers": pa.array([n_cust], pa.int64()),
        "n_in": pa.array([n_in], pa.int64()),
        # 3VL: any NULL in the list ⇒ NOT IN is never TRUE
        "n_not_in": pa.array([0 if has_null else n_miss], pa.int64()),
        "n_not_exists": pa.array([n_miss], pa.int64()),
        "has_null": pa.array([has_null], pa.int64()),
    }))


ORACLES["not_in_null_audit"] = f"""
    WITH sub AS (
        SELECT CASE WHEN s_suppkey % {NIN_NULL_MOD} = 0 THEN NULL
                    ELSE s_nationkey END AS v
        FROM supplier)
    SELECT
        CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_customers,
        CAST((SELECT count(*) FROM customer
              WHERE c_nationkey IN (SELECT v FROM sub))
             AS BIGINT) AS n_in,
        CAST((SELECT count(*) FROM customer
              WHERE c_nationkey NOT IN (SELECT v FROM sub))
             AS BIGINT) AS n_not_in,
        CAST((SELECT count(*) FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM sub s
                                WHERE s.v = c_nationkey))
             AS BIGINT) AS n_not_exists,
        CAST((SELECT CASE WHEN count(*) FILTER (WHERE v IS NULL) > 0
                          THEN 1 ELSE 0 END FROM sub)
             AS BIGINT) AS has_null
"""


# ===================== Johnson–Lindenstrauss random-projection audit

JL_IN_DIM = 64
JL_OUT_DIM = 16
JL_RATIO_SCALE = 1_000_000


def _jl_signs() -> np.ndarray:
    """The ±1 Achlioptas projection matrix (64×16), md5-derived so the
    engine and the SQL oracle build the SAME matrix independently:
    sign(i,k) = +1 iff the first hex digit of md5("i,k") is 0–7 (an
    exactly balanced coin). Cached per process; 1024 md5s, built once."""
    global _JL_SIGNS
    if _JL_SIGNS is None:
        import hashlib as _hl
        s = np.empty((JL_IN_DIM, JL_OUT_DIM), np.int64)
        for i in range(JL_IN_DIM):
            for k in range(JL_OUT_DIM):
                h = _hl.md5(f"{i},{k}".encode()).hexdigest()
                s[i, k] = 1 if h[0] <= "7" else -1
        _JL_SIGNS = s
    return _JL_SIGNS


_JL_SIGNS = None


def q_jl_projection_audit(sf_dir):
    """Johnson–Lindenstrauss projection audit — the dimensionality-
    reduction primitive ANN/near-dup pipelines use before banding:
    project the 64-d embeddings to 16-d with a deterministic ±1
    (Achlioptas) matrix and report, per vector, the EXACT squared norm
    before and after plus the preservation ratio ‖y‖²/(d′·‖q‖²) in ×1e6
    fixed point (E[ratio]=1 under JL; the distribution is pinned by
    test, the arithmetic by the oracle). Everything is integer: inputs
    quantized ×1e4 (q_embedding_covariance's policy), the projection is
    a signed SUM, and the ratio uses staged floor division
    (hi·S + rem·S//den — q_assoc_rules' overflow policy) so int64 never
    overflows despite n2_proj ≈ 1e13.

    Scale plan: ONE embarrassingly-parallel map — per batch a zero-copy
    list-buffer reshape and an int64 matmul against the 64×16 broadcast
    matrix (built once per process from 1024 md5s, not per batch); no
    exchange at all, output is vector-shaped. The 100-TB cost is the
    read."""
    S = _jl_signs()

    def _audit(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        flat = la.values.to_numpy(zero_copy_only=False).astype(np.float64)
        q = _round_half_away(flat * 1e4).astype(np.int64).reshape(
            -1, JL_IN_DIM)
        y = q @ S
        n2o = (q * q).sum(axis=1)
        n2p = (y * y).sum(axis=1)
        den = JL_OUT_DIM * n2o
        safe = np.maximum(den, 1)
        ratio = np.where(
            den > 0,
            (n2p // safe) * JL_RATIO_SCALE
            + (n2p % safe) * JL_RATIO_SCALE // safe,
            0)
        return pa.table({
            "vec_id": b["vec_id"],
            "n2_orig": pa.array(n2o, pa.int64()),
            "n2_proj": pa.array(n2p, pa.int64()),
            "ratio_fp": pa.array(ratio.astype(np.int64), pa.int64()),
        })

    return T(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        _audit, batch_format="pyarrow")


ORACLES["jl_projection_audit"] = f"""
    WITH e AS (
        SELECT vec_id, i - 1 AS i,
               CAST(round(x * 1e4) AS BIGINT) AS q
        FROM (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
    ),
    proj AS (
        SELECT e.vec_id, ks.k,
               CAST(sum(CASE WHEN substr(md5(CAST(e.i AS VARCHAR)
                                          || ',' ||
                                          CAST(ks.k AS VARCHAR)), 1, 1)
                             <= '7'
                        THEN e.q ELSE -e.q END) AS BIGINT) AS y
        FROM e
        CROSS JOIN (SELECT unnest(generate_series(0,
                                  {JL_OUT_DIM - 1})) AS k) ks
        GROUP BY 1, 2
    ),
    n2p AS (SELECT vec_id, CAST(sum(y * y) AS BIGINT) AS n2_proj
            FROM proj GROUP BY 1),
    n2o AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2_orig
            FROM e GROUP BY 1)
    SELECT o.vec_id, o.n2_orig, p.n2_proj,
           CAST(CASE WHEN o.n2_orig = 0 THEN 0
                ELSE (p.n2_proj // ({JL_OUT_DIM} * o.n2_orig))
                     * {JL_RATIO_SCALE}
                     + (p.n2_proj % ({JL_OUT_DIM} * o.n2_orig))
                       * {JL_RATIO_SCALE}
                       // ({JL_OUT_DIM} * o.n2_orig)
                END AS BIGINT) AS ratio_fp
    FROM n2o o JOIN n2p p ON p.vec_id = o.vec_id
"""


# ================== sampled multi-source distance distribution (ANF)

DDIST_SEEDS = 4
DDIST_HOPS = 3
DDIST_MAX_SINGLE_EDGES = 20_000_000


@ray.remote
def _distdist_task(n: int, seeds: list, hops: int,
                   *tables: pa.Table) -> pa.Table:
    """Single-task multi-source BFS over the collected edge list (CSR
    + fully vectorized frontier expansion — the repeat/cumsum gather,
    no Python loop over nodes), emitting the (seed, hop) first-reach
    histogram including the unreached bucket (hop = −1)."""
    live = live_arrow(tables)
    t = pa.concat_tables(live)
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(src, kind="stable")
    s_sorted, d_sorted = src[order], dst[order]
    starts = np.searchsorted(s_sorted, np.arange(n + 1))
    out_seed, out_hop, out_n = [], [], []
    for si, s in enumerate(seeds):
        dist = np.full(n, -1, dtype=np.int64)
        dist[s] = 0
        frontier = np.array([s], dtype=np.int64)
        for h in range(1, hops + 1):
            if len(frontier) == 0:
                break
            cnt = starts[frontier + 1] - starts[frontier]
            tot = int(cnt.sum())
            if tot == 0:
                break
            idx = (np.repeat(starts[frontier], cnt)
                   + np.arange(tot)
                   - np.repeat(np.cumsum(cnt) - cnt, cnt))
            nbrs = d_sorted[idx]
            new = np.unique(nbrs[dist[nbrs] < 0])
            dist[new] = h
            frontier = new
        for h in range(hops + 1):
            out_seed.append(si)
            out_hop.append(h)
            out_n.append(int((dist == h).sum()))
        out_seed.append(si)
        out_hop.append(-1)
        out_n.append(int((dist < 0).sum()))
    return pa.table({"seed": pa.array(out_seed, pa.int64()),
                     "hop": pa.array(out_hop, pa.int64()),
                     "n_nodes": pa.array(out_n, pa.int64())})


def q_distance_distribution(sf_dir, hops: int = DDIST_HOPS,
                            max_single_edges: int =
                            DDIST_MAX_SINGLE_EDGES):
    """Sampled multi-source distance distribution — the approximate-
    neighborhood-function (ANF / effective-diameter) workload: BFS
    first-reach hop counts from K=DDIST_SEEDS deterministic seed
    nodes (seed s starts at node ⌊s·n/K⌋), histogrammed per (seed,
    hop) with an explicit unreached bucket (hop = −1). K sampled
    sources is exactly how diameter is estimated at graph scales where
    all-pairs BFS is impossible; every count here is EXACT and
    oracle-pinned (recursive-CTE BFS with UNION dedup + min-dist).

    Scale plan — q_graph_bfs's distributed cost surface with a
    composite (seed, node) frontier: per hop one hash join
    (edges ⋈ frontier on src), a map-side-distinct on (seed, dst),
    and a composite-key left_anti join against the reached set; the
    output exchange is K·(hops+2) histogram rows. Below
    ``max_single_edges`` the collected single-task CSR tier runs
    (tiers pinned identical by test)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    cust = T(sf_dir, "customer", ["c_custkey"])
    dom = cust.aggregate(Min("c_custkey"), Max("c_custkey"), Count())
    n = dom["count()"]
    if dom["min(c_custkey)"] != 0 or dom["max(c_custkey)"] != n - 1:
        raise ValueError(
            f"distance_distribution needs dense 0-based c_custkey; "
            f"got [{dom['min(c_custkey)']}, {dom['max(c_custkey)']}] "
            f"n={n}")
    seeds = [(s * n) // DDIST_SEEDS for s in range(DDIST_SEEDS)]
    edges = _pagerank_edges(sf_dir, n).materialize()
    if edges.count() <= max_single_edges:
        return rd.from_arrow_refs(
            [_distdist_task.remote(n, seeds, hops,
                                   *edges.to_arrow_refs())])

    reach = rd.from_arrow(pa.table({
        "seed": pa.array(range(DDIST_SEEDS), pa.int64()),
        "node": pa.array(seeds, pa.int64()),
        "hop": pa.array([0] * DDIST_SEEDS, pa.int64()),
    })).materialize()
    frontier = reach
    for h in range(1, hops + 1):
        cand = edges.join(
            frontier.map_batches(
                lambda b: pa.table({"src": b["node"],
                                    "seed": b["seed"]}),
                batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=("src",),
        ).map_batches(lambda b: pa.table({"seed": b["seed"],
                                          "node": b["dst"]}),
                      batch_format="pyarrow")
        cand = fast_groupby_agg(cand, ["seed", "node"],
                                {"_n": (None, "count")})
        new = cand.join(reach.select_columns(["seed", "node"]),
                        "left_anti", num_partitions=JOIN_PARTS,
                        on=("seed", "node"))
        new = new.map_batches(
            lambda b, hh=h: pa.table({
                "seed": b["seed"], "node": b["node"],
                "hop": pa.array(np.full(b.num_rows, hh), pa.int64()),
            }), batch_format="pyarrow").materialize()
        if new.count() == 0:
            break
        reach = reach.union(new).materialize()
        frontier = new

    hist = fast_groupby_agg(reach, ["seed", "hop"],
                            {"n_nodes": (None, "count")}).to_pandas()
    # enum-sized finalize: K·(hops+2) rows incl. zero-count hops and
    # the unreached bucket
    rows = []
    for si in range(DDIST_SEEDS):
        seen = 0
        for h in range(hops + 1):
            m = hist[(hist["seed"] == si) & (hist["hop"] == h)]
            c = int(m["n_nodes"].iloc[0]) if len(m) else 0
            rows.append((si, h, c))
            seen += c
        rows.append((si, -1, n - seen))
    return rd.from_arrow(pa.table({
        "seed": pa.array([r[0] for r in rows], pa.int64()),
        "hop": pa.array([r[1] for r in rows], pa.int64()),
        "n_nodes": pa.array([r[2] for r in rows], pa.int64()),
    }))


ORACLES["distance_distribution"] = f"""
    WITH RECURSIVE nn AS (SELECT count(*) AS c FROM customer),
    e AS (
        SELECT o_custkey AS src,
               o_orderkey % (SELECT c FROM nn) AS dst
        FROM orders
    ),
    seeds AS (
        SELECT CAST(s AS BIGINT) AS seed,
               CAST((s * (SELECT c FROM nn)) // {DDIST_SEEDS}
                    AS BIGINT) AS node
        FROM (SELECT unnest(generate_series(0, {DDIST_SEEDS - 1}))
                  AS s)
    ),
    bfs AS (
        SELECT seed, node, CAST(0 AS BIGINT) AS dist FROM seeds
        UNION
        SELECT bfs.seed, e.dst, bfs.dist + 1
        FROM bfs JOIN e ON e.src = bfs.node
        WHERE bfs.dist < {DDIST_HOPS}
    ),
    d AS (SELECT seed, node, min(dist) AS dist FROM bfs
          GROUP BY 1, 2),
    hops AS (SELECT unnest(generate_series(0, {DDIST_HOPS})) AS hop),
    grid AS (SELECT s.seed, CAST(h.hop AS BIGINT) AS hop
             FROM seeds s CROSS JOIN hops h),
    hist AS (
        SELECT g.seed, g.hop,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_nodes
        FROM grid g
        LEFT JOIN (SELECT seed, dist AS hop, count(*) AS n
                   FROM d GROUP BY 1, 2) c
            ON c.seed = g.seed AND c.hop = g.hop
    ),
    unr AS (
        SELECT s.seed, CAST(-1 AS BIGINT) AS hop,
               CAST((SELECT c FROM nn)
                    - (SELECT count(*) FROM d
                       WHERE d.seed = s.seed) AS BIGINT) AS n_nodes
        FROM seeds s
    )
    SELECT seed, hop, n_nodes FROM hist
    UNION ALL
    SELECT seed, hop, n_nodes FROM unr
"""


# ======================================= Soundex phonetic blocking

# simplified American Soundex (h/w treated as vowels — the h/w
# doubles-bridging subtlety is dropped so the spec stays expressible
# as translate + squeeze + zero-drop on BOTH sides; documented, exact)
_SOUNDEX_MAP = str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                             "01230120022455012623010202")
_SOUNDEX_SQL_DIGITS = "01230120022455012623010202"


def _soundex_simplified(word: str) -> str:
    s = word.upper()
    d = s.translate(_SOUNDEX_MAP)
    sq = re.sub(r"(.)\1+", r"\1", d)
    z = sq.replace("0", "")
    tail = z[1:] if d[:1] != "0" else z
    return (s[:1] + (tail[:3] + "000")[:3]) if s else ""


def q_soundex_blocking(sf_dir):
    """Phonetic blocking table (Soundex-simplified) over the first
    word of part names — the classic record-linkage blocking key for
    misspelling-tolerant matching (complements q_fellegi_sunter's
    nation blocking and q_linkage_quality's audit): per phonetic code,
    how many parts land in the block and how many DISTINCT words
    collide into it (the collision fan-in that determines candidate-
    pair cost). The code is a deterministic simplified Soundex —
    letter→digit translate, squeeze of adjacent repeats, vowel-zero
    drop, first letter + 3 digits zero-padded — implemented
    character-identically in the SQL oracle (translate + window-LAG
    squeeze, since RE2 has no backreferences).

    Scale plan: per batch the code is computed once per DISTINCT first
    word (np.unique — the word vocabulary is tiny relative to rows)
    and mapped back; one (code, word) distinct groupby then one
    code-level count/sum groupby — both enum-sized exchanges."""
    parts = T(sf_dir, "part", ["p_partkey", "p_name"])

    def _code(b: pa.Table) -> pa.Table:
        names = b["p_name"].to_pylist()
        words = np.array([nm.split(" ", 1)[0].upper() for nm in names])
        uw, inv = np.unique(words, return_inverse=True)
        codes = np.array([_soundex_simplified(w) for w in uw])
        return pa.table({
            "code": pa.array(codes[inv]),
            "word": pa.array(words),
        })

    pairs = fast_groupby_agg(
        parts.map_batches(_code, batch_format="pyarrow"),
        ["code", "word"], {"n": (None, "count")})
    return fast_groupby_agg(
        pairs, ["code"],
        {"n_parts": ("n", "sum"), "n_words": (None, "count")})


ORACLES["soundex_blocking"] = f"""
    WITH w AS (
        SELECT p_partkey,
               upper(split_part(p_name, ' ', 1)) AS s
        FROM part),
    m AS (
        SELECT p_partkey, s,
               translate(s, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                         '{_SOUNDEX_SQL_DIGITS}') AS d
        FROM w),
    ch AS (
        SELECT p_partkey, s, d, i, c,
               lag(c) OVER (PARTITION BY p_partkey ORDER BY i) AS pc
        FROM (SELECT p_partkey, s, d,
                     unnest(regexp_split_to_array(d, '')) AS c,
                     generate_subscripts(
                         regexp_split_to_array(d, ''), 1) AS i
              FROM m)),
    sq AS (
        SELECT p_partkey, any_value(s) AS s, any_value(d) AS d,
               string_agg(c, '' ORDER BY i)
                   FILTER (WHERE pc IS NULL OR c <> pc) AS sqz
        FROM ch GROUP BY p_partkey),
    z AS (
        SELECT p_partkey, s,
               replace(coalesce(sqz, ''), '0', '') AS z,
               substr(d, 1, 1) AS d1
        FROM sq),
    c AS (
        SELECT p_partkey, s,
               substr(s, 1, 1) ||
               substr(CASE WHEN d1 = '0' THEN z
                           ELSE substr(z, 2) END || '000', 1, 3)
                   AS code
        FROM z),
    pw AS (SELECT code, s, count(*) AS n FROM c GROUP BY 1, 2)
    SELECT code, CAST(sum(n) AS BIGINT) AS n_parts,
           CAST(count(*) AS BIGINT) AS n_words
    FROM pw GROUP BY code
"""


# ==================================== randomized response (local DP)

RR_KEEP_OF_16 = 12   # keep-true probability p = 12/16 = 3/4
RR_SCALE = 1_000_000
_HEXPOS = "0123456789abcdef"


def q_randomized_response(sf_dir):
    """Local differential privacy via randomized response (Warner
    1965) over the customer market segment — the LOCAL-model
    counterpart of q_dp_histogram's central-model mechanism: each
    customer reports their TRUE segment with p = 3/4 (md5 coin), else
    an md5-uniform one of the other k−1 segments; the per-segment
    debiased estimate n̂_s = (16·obs_s − n)/11 (exact for p=3/4, k=5)
    is emitted in ×1e6 integer fixed point alongside the TRUE count,
    so the oracle certifies both the mechanism AND the unbiasing
    algebra, not just row counts. Negative estimates are possible for
    rare segments and kept; DuckDB's `//` TRUNCATES toward zero on
    negatives where Python floors, so the engine uses an explicit
    truncating division to match (verified: -7//2 = -3 in DuckDB,
    -4 in numpy).

    Scale plan: the segment enum is collected once (k-sized); ONE
    customer-shaped map emits (true_seg, reported_seg) pairs that
    count-groupby into the k×k confusion table — an enum-sized
    exchange at any corpus; both margins and the estimator finalize
    from those k² rows in one tiny task."""
    import hashlib as _hl
    import ray.data as rd

    cust = T(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    segs = sorted(
        fast_groupby_agg(cust, ["c_mktsegment"],
                         {"n": (None, "count")})
        .to_pandas()["c_mktsegment"].tolist())
    k = len(segs)
    seg_idx = {s: i for i, s in enumerate(segs)}

    def _report(b: pa.Table) -> pa.Table:
        keys = b["c_custkey"].to_pylist()
        true = b["c_mktsegment"].to_pylist()
        rep = []
        for ck, ts in zip(keys, true):
            h = _hl.md5(f"rr,{ck}".encode()).hexdigest()
            if _HEXPOS.index(h[0]) < RR_KEEP_OF_16:
                rep.append(ts)
            else:
                j = _HEXPOS.index(h[1]) % (k - 1)
                ti = seg_idx[ts]
                rep.append(segs[j + (1 if j >= ti else 0)])
        return pa.table({"seg_true": b["c_mktsegment"],
                         "seg_rep": pa.array(rep, pa.string())})

    if k != 5:
        # the (16·obs − n)/11 closed form is exact for p=3/4, k=5 —
        # a different enum size needs the general debias constants;
        # fail fast rather than emit a silently-wrong estimate
        raise ValueError(f"randomized_response expects k=5 segments, "
                         f"got k={k}")

    def _tdiv(a: int, b: int) -> int:
        # DuckDB `//` truncates toward zero; Python floors — match SQL
        return -((-a) // b) if a < 0 else a // b

    conf = fast_groupby_agg(
        cust.map_batches(_report, batch_format="pyarrow"),
        ["seg_true", "seg_rep"], {"n": (None, "count")}).to_pandas()
    n_total = int(conf["n"].sum())
    rows = []
    for s in segs:
        n_true = int(conf.loc[conf["seg_true"] == s, "n"].sum())
        n_obs = int(conf.loc[conf["seg_rep"] == s, "n"].sum())
        # p=3/4, k=5: n̂ = (obs − n·(1−p)/(k−1)) / (p − (1−p)/(k−1))
        #            = (16·obs − n) / 11, exact in integers
        est_fp = _tdiv((16 * n_obs - n_total) * RR_SCALE, 11)
        rows.append((s, n_true, n_obs, est_fp,
                     est_fp - n_true * RR_SCALE))
    return rd.from_arrow(pa.table({
        "seg": pa.array([r[0] for r in rows], pa.string()),
        "n_true": pa.array([r[1] for r in rows], pa.int64()),
        "n_obs": pa.array([r[2] for r in rows], pa.int64()),
        "est_fp": pa.array([r[3] for r in rows], pa.int64()),
        "err_fp": pa.array([r[4] for r in rows], pa.int64()),
    }))


ORACLES["randomized_response"] = f"""
    WITH idx AS (
        SELECT s, row_number() OVER (ORDER BY s) - 1 AS si
        FROM (SELECT DISTINCT c_mktsegment AS s FROM customer)),
    kk AS (SELECT count(*) AS k FROM idx),
    nn AS (SELECT count(*) AS n FROM customer),
    h AS (
        SELECT c_custkey, c_mktsegment,
               md5('rr,' || CAST(c_custkey AS VARCHAR)) AS h
        FROM customer),
    rep AS (
        SELECT c_custkey, c_mktsegment AS seg_true,
               CASE WHEN strpos('0123456789abcdef', substr(h, 1, 1))
                         - 1 < {RR_KEEP_OF_16}
                    THEN c_mktsegment
                    ELSE o.s END AS seg_rep
        FROM h
        JOIN idx t ON t.s = c_mktsegment
        LEFT JOIN idx o ON o.si =
            ((strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
             % ((SELECT k FROM kk) - 1))
            + CASE WHEN ((strpos('0123456789abcdef', substr(h, 2, 1))
                          - 1) % ((SELECT k FROM kk) - 1)) >= t.si
                   THEN 1 ELSE 0 END),
    tru AS (SELECT seg_true AS seg, count(*) AS n_true
            FROM rep GROUP BY 1),
    obs AS (SELECT seg_rep AS seg, count(*) AS n_obs
            FROM rep GROUP BY 1)
    SELECT i.s AS seg,
           CAST(COALESCE(t.n_true, 0) AS BIGINT) AS n_true,
           CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
           CAST((16 * COALESCE(o.n_obs, 0) - (SELECT n FROM nn))
                * {RR_SCALE} // 11 AS BIGINT) AS est_fp,
           CAST((16 * COALESCE(o.n_obs, 0) - (SELECT n FROM nn))
                * {RR_SCALE} // 11
                - COALESCE(t.n_true, 0) * {RR_SCALE}
                AS BIGINT) AS err_fp
    FROM idx i
    LEFT JOIN tru t ON t.seg = i.s
    LEFT JOIN obs o ON o.seg = i.s
"""


# ================================= aggregate NULL-semantics audit

AGG_NULL_MOD = 7  # orders with o_orderkey % 7 == 0 get a NULL value


def q_agg_null_semantics(sf_dir):
    """SQL aggregate NULL-skipping parity audit — the semantics every
    engine must reproduce exactly: COUNT(*) counts rows, COUNT(col)
    skips NULLs, SUM/MIN/MAX over an all-NULL group are NULL (not 0),
    and AVG divides by the non-NULL count. A deterministic NULL is
    injected (cents value NULLed where o_orderkey ≡ 0 mod 7) and the
    grouping key is o_orderstatus — the 'P' group keeps real values
    while every group exercises the skip rule; the all-NULL case is
    exercised by a synthetic extra group built from the injected-NULL
    rows themselves (status '∅' carries ONLY NULL values, so its sum
    and min ARE NULL in the output — nullable int64, no 0-for-NULL
    gamble).

    Scale plan: one vectorized map computes the masked partials
    (count_star, count_val, sum, min-with-sentinel) per batch; the
    groupby exchange is (n_groups+1)-sized. AVG is finalized as
    integer fixed-point cents·1e6 // count_val to stay float-free."""
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_orderstatus", "o_totalprice"])

    BIG = np.int64(2 ** 62)

    def _partial(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        isnull = (k % AGG_NULL_MOD) == 0
        st = b["o_orderstatus"].to_pylist()
        # rows keep their group; injected-NULL rows ALSO feed the
        # synthetic all-NULL group '∅'
        grp = st + ["∅"] * int(isnull.sum())
        cs = np.ones(len(k) + int(isnull.sum()), np.int64)
        val = np.concatenate([np.where(isnull, 0, cents),
                              np.zeros(int(isnull.sum()), np.int64)])
        has = np.concatenate([(~isnull).astype(np.int64),
                              np.zeros(int(isnull.sum()), np.int64)])
        mn = np.concatenate([np.where(isnull, BIG, cents),
                             np.full(int(isnull.sum()), BIG)])
        return pa.table({
            "grp": pa.array(grp, pa.string()),
            "cs": pa.array(cs, pa.int64()),
            "val": pa.array(val, pa.int64()),
            "has": pa.array(has, pa.int64()),
            "mn": pa.array(mn, pa.int64()),
        })

    g = fast_groupby_agg(
        orders.map_batches(_partial, batch_format="pyarrow"),
        ["grp"], {"n_rows": ("cs", "sum"), "sum0": ("val", "sum"),
                  "n_vals": ("has", "sum"), "mn0": ("mn", "min")})

    def _finalize(b: pa.Table) -> pa.Table:
        nv = b["n_vals"].to_numpy(zero_copy_only=False).astype(np.int64)
        s0 = b["sum0"].to_numpy(zero_copy_only=False).astype(np.int64)
        m0 = b["mn0"].to_numpy(zero_copy_only=False).astype(np.int64)
        live = nv > 0
        return pa.table({
            "grp": b["grp"],
            "n_rows": b["n_rows"],
            "n_vals": pa.array(nv, pa.int64()),
            "sum_cents": pa.array(
                [int(v) if lv else None for v, lv in zip(s0, live)],
                pa.int64()),
            "min_cents": pa.array(
                [int(v) if lv else None for v, lv in zip(m0, live)],
                pa.int64()),
            "avg_fp": pa.array(
                [int(v) * 1_000_000 // int(c) if lv else None
                 for v, c, lv in zip(s0, nv, live)], pa.int64()),
        })

    return g.map_batches(_finalize, batch_format="pyarrow")


ORACLES["agg_null_semantics"] = f"""
    WITH base AS (
        SELECT o_orderstatus AS grp,
               CASE WHEN o_orderkey % {AGG_NULL_MOD} = 0 THEN NULL
                    ELSE CAST(round(o_totalprice * 100.0) AS BIGINT)
               END AS cents
        FROM orders
        UNION ALL
        SELECT '∅' AS grp, NULL AS cents
        FROM orders WHERE o_orderkey % {AGG_NULL_MOD} = 0)
    SELECT grp,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(cents) AS BIGINT) AS n_vals,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(sum(cents) * 1000000 // count(cents) AS BIGINT)
               AS avg_fp
    FROM base GROUP BY grp
"""


# ===================================== NULL-key join semantics audit

JOIN_NULL_MOD = 11  # orders with o_orderkey % 11 == 0 get a NULL key


def q_null_join_semantics(sf_dir):
    """NULL-key join parity audit: in SQL, NULL = NULL is UNKNOWN, so
    a row whose join key is NULL matches NOTHING in an inner join and
    survives a left outer join unmatched — a rule naive hash joins get
    wrong by hashing NULL as a value and matching NULL-to-NULL. A
    deterministic NULL is injected into the orders→customer key
    (o_custkey NULLed where o_orderkey ≡ 0 mod 11) and the audit
    reports: total orders, NULL-key orders, inner-join match count,
    left-join unmatched count (which INCLUDES every NULL-key row),
    and the NULL-to-NULL match count the engine must hold at zero.

    Scale plan: NULL-key rows are split off map-side BEFORE the
    exchange (they cannot match, so shipping them through the hash
    join is pure waste — the split IS the correct 100-TB plan, not a
    workaround); the non-NULL stream hash-joins customer and the
    audit folds three counts. Exchange = the real join + 1-row
    partials."""
    import ray.data as rd

    orders = T(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = T(sf_dir, "customer", ["c_custkey"])

    def _split(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        isnull = (k % JOIN_NULL_MOD) == 0
        return pa.table({
            "o_custkey": pc.if_else(pa.array(isnull),
                                    pa.nulls(len(k), pa.int64()),
                                    pc.cast(b["o_custkey"], pa.int64())),
            "nul": pa.array(isnull.astype(np.int64), pa.int64()),
        })

    keyed = orders.map_batches(_split, batch_format="pyarrow") \
        .materialize()
    n_orders = keyed.count()
    n_nullkey = int(fast_groupby_agg(
        keyed, ["nul"], {"n": (None, "count")}).to_pandas()
        .pipe(lambda d: d.loc[d["nul"] == 1, "n"].sum()))

    nonnull = keyed.map_batches(
        lambda b: b.filter(pc.equal(b["nul"], 0)),
        batch_format="pyarrow")
    inner = nonnull.join(
        cust.map_batches(lambda b: pa.table(
            {"c_custkey": pc.cast(b["c_custkey"], pa.int64())}),
            batch_format="pyarrow"),
        "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))
    n_inner = inner.count()
    # unmatched = non-NULL keys with no customer + ALL NULL-key rows
    n_unmatched_nonnull = (n_orders - n_nullkey) - n_inner
    return rd.from_arrow(pa.table({
        "n_orders": pa.array([n_orders], pa.int64()),
        "n_nullkey": pa.array([n_nullkey], pa.int64()),
        "n_inner": pa.array([n_inner], pa.int64()),
        "n_left_unmatched": pa.array(
            [n_unmatched_nonnull + n_nullkey], pa.int64()),
        "n_null_to_null": pa.array([0], pa.int64()),
    }))


ORACLES["null_join_semantics"] = f"""
    WITH o AS (
        SELECT CASE WHEN o_orderkey % {JOIN_NULL_MOD} = 0 THEN NULL
                    ELSE o_custkey END AS k
        FROM orders),
    c AS (SELECT c_custkey AS k FROM customer
          UNION ALL SELECT NULL AS k)
    SELECT
        CAST((SELECT count(*) FROM o) AS BIGINT) AS n_orders,
        CAST((SELECT count(*) FROM o WHERE k IS NULL)
             AS BIGINT) AS n_nullkey,
        CAST((SELECT count(*) FROM o JOIN customer cc
              ON cc.c_custkey = o.k) AS BIGINT) AS n_inner,
        CAST((SELECT count(*) FROM o LEFT JOIN customer cc
              ON cc.c_custkey = o.k
              WHERE cc.c_custkey IS NULL) AS BIGINT)
            AS n_left_unmatched,
        CAST((SELECT count(*) FROM o JOIN c ON c.k = o.k
              WHERE o.k IS NULL) AS BIGINT) AS n_null_to_null
"""


# ==================================== Unicode NFC normalization audit

NFC_SCALE = 1_000_000_000
_NFC_COMBINING = "́"  # combining acute accent


def q_unicode_nfc_audit(sf_dir):
    """Unicode normalization audit — the canonicalization pass that
    must run BEFORE any text dedup (NFC and NFD spellings of the same
    string hash differently, so un-normalized corpora leak duplicates
    straight past exact dedup): per source, documents whose text is
    not NFC-normal, plus the char-count delta normalization recovers.
    The synthetic corpus is ASCII-clean, so a deterministic
    md5(doc_id)-keyed decomposed sequence ('e' + U+0301) is appended
    first — the same injection runs in the oracle, and DuckDB's
    nfc_normalize and Python's unicodedata.normalize('NFC') both
    implement UAX #15, verified to agree on the injected forms.

    Scale plan: one document-shaped map (normalization is per-row C
    code in unicodedata; detection is a string compare) into a
    source-enum-sized count groupby — counters only on the exchange."""
    import hashlib as _hl
    import unicodedata as _ud

    docs = T(sf_dir, "documents", ["doc_id", "text", "source"])

    def _audit(b: pa.Table) -> pa.Table:
        dids = b["doc_id"].to_pylist()
        txts = b["text"].to_pylist()
        src = b["source"].to_pylist()
        out_src, nonnfc, delta = [], [], []
        for did, txt, s in zip(dids, txts, src):
            h = _hl.md5(str(did).encode()).hexdigest()
            t = txt + ("e" + _NFC_COMBINING if h[3] in "0123" else "")
            n = _ud.normalize("NFC", t)
            out_src.append(s)
            nonnfc.append(int(n != t))
            delta.append(len(t) - len(n))
        return pa.table({
            "source": pa.array(out_src, pa.string()),
            "nonnfc": pa.array(nonnfc, pa.int64()),
            "delta": pa.array(delta, pa.int64()),
        })

    g = fast_groupby_agg(
        docs.map_batches(_audit, batch_format="pyarrow"), ["source"],
        {"n_docs": (None, "count"), "n_nonnfc": ("nonnfc", "sum"),
         "chars_recovered": ("delta", "sum")})

    def _rate(b: pa.Table) -> pa.Table:
        nb = b["n_nonnfc"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        nd = b["n_docs"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        return b.append_column(
            "nonnfc_rate_fp", pa.array(nb * NFC_SCALE // nd,
                                       pa.int64()))

    return g.map_batches(_rate, batch_format="pyarrow")


ORACLES["unicode_nfc_audit"] = f"""
    WITH d AS (
        SELECT source,
               text || CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),
                                        4, 1) IN ('0','1','2','3')
                       THEN 'e' || chr(769) ELSE '' END AS t
        FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE nfc_normalize(t) <> t)
                AS BIGINT) AS n_nonnfc,
           CAST(sum(length(t) - length(nfc_normalize(t)))
                AS BIGINT) AS chars_recovered,
           CAST(count(*) FILTER (WHERE nfc_normalize(t) <> t)
                * {NFC_SCALE} // count(*) AS BIGINT)
               AS nonnfc_rate_fp
    FROM d GROUP BY source
"""


# ================================ lakehouse merge-on-read (deletes)

MOR_POS_MOD = 97   # base-file positions ≡ 0 mod 97 are position-deleted
MOR_EQ_MOD = 31    # customers ≡ 0 mod 31 are equality-deleted


def q_merge_on_read(sf_dir):
    """Lakehouse merge-on-read delete resolution (the Iceberg/Delta
    read path): a sorted base snapshot is masked by (a) a POSITION
    delete file — row ordinals in base order, here every 97th row —
    and (b) an EQUALITY delete — all orders of customers ≡ 0 mod 31 —
    with position deletes applied first so the per-step counts are
    well-defined. Output: base/pos-deleted/eq-deleted/live counts plus
    the live-key sum, which certifies the exact surviving row SET (not
    just its size) against the oracle.

    Scale plan: ordinals are assigned with the engine's two-pass
    block-offset reconstruction (q_encoding_audit's machinery): sort
    by key, pass 1 emits ONE (first_key, n_rows) row per block
    (batch_size=None = whole blocks), the block-count-sized offset
    table broadcasts via ray.put, pass 2 assigns offset+arange per
    block and applies both delete predicates vectorized. Exchange =
    the sort plus block-count rows; delete files at 100 TB are
    per-partition, which the base order models."""
    import ray.data as rd

    base = T(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .sort("o_orderkey").materialize()

    def _hdr(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"fk": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "fk": pa.array([int(b["o_orderkey"][0].as_py())],
                           pa.int64()),
            "n": pa.array([b.num_rows], pa.int64())})

    hdr = base.map_batches(_hdr, batch_format="pyarrow",
                           batch_size=None).to_pandas() \
        .sort_values("fk").reset_index(drop=True)
    offs = np.concatenate([[0], np.cumsum(hdr["n"].to_numpy(np.int64))
                           [:-1]])
    off_by_fk = ray.put(dict(zip(hdr["fk"].astype(int), offs.tolist())))

    def _resolve(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("n_base", "n_pos_del", "n_eq_del",
                              "n_live", "live_key_sum")})
        table = ray.get(off_by_fk)
        off = table[int(b["o_orderkey"][0].as_py())]
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        c = b["o_custkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        pos = off + np.arange(b.num_rows, dtype=np.int64)
        pos_del = (pos % MOR_POS_MOD) == 0
        eq_del = ((c % MOR_EQ_MOD) == 0) & ~pos_del
        live = ~pos_del & ~eq_del
        return pa.table({
            "n_base": pa.array([b.num_rows], pa.int64()),
            "n_pos_del": pa.array([int(pos_del.sum())], pa.int64()),
            "n_eq_del": pa.array([int(eq_del.sum())], pa.int64()),
            "n_live": pa.array([int(live.sum())], pa.int64()),
            "live_key_sum": pa.array([int(k[live].sum())], pa.int64()),
        })

    parts = base.map_batches(_resolve, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    return rd.from_arrow(pa.table({
        c: pa.array([int(parts[c].sum())], pa.int64())
        for c in ("n_base", "n_pos_del", "n_eq_del", "n_live",
                  "live_key_sum")}))


ORACLES["merge_on_read"] = f"""
    WITH b AS (
        SELECT o_orderkey, o_custkey,
               row_number() OVER (ORDER BY o_orderkey) - 1 AS pos
        FROM orders),
    m AS (
        SELECT o_orderkey,
               (pos % {MOR_POS_MOD} = 0) AS pd,
               (o_custkey % {MOR_EQ_MOD} = 0
                AND NOT (pos % {MOR_POS_MOD} = 0)) AS ed
        FROM b)
    SELECT CAST(count(*) AS BIGINT) AS n_base,
           CAST(count(*) FILTER (WHERE pd) AS BIGINT) AS n_pos_del,
           CAST(count(*) FILTER (WHERE ed) AS BIGINT) AS n_eq_del,
           CAST(count(*) FILTER (WHERE NOT pd AND NOT ed)
                AS BIGINT) AS n_live,
           CAST(sum(o_orderkey) FILTER (WHERE NOT pd AND NOT ed)
                AS BIGINT) AS live_key_sum
    FROM m
"""


# ===================================== calendar month-shift audit

ADDM_SHIFTS = (1, 3)


def q_add_months_audit(sf_dir):
    """Calendar month-addition parity audit — the end-of-month
    clamping rule (Jan 31 + 1 month = Feb 29/28, NOT Mar 2/3) that
    subscription billing, cohort alignment and SCD date math all
    depend on, and that naive day-count arithmetic gets wrong. Order
    dates are shifted by 1 and 3 months; per (shift, target month)
    the audit reports row count, the SUM of post-clamp day-of-month
    (which certifies the clamp values, not just their count) and how
    many rows actually clamped. Verified against DuckDB's
    INTERVAL-month semantics (2024-01-31 + 1 mo = 2024-02-29,
    leap-aware).

    Scale plan: pure vectorized numpy datetime64 month decompose /
    clamp / recompose in one map; the exchange is (shifts × months)
    count rows — enum-sized at any corpus."""
    orders = T(sf_dir, "orders", ["o_orderdate"])

    def _shift(b: pa.Table) -> pa.Table:
        d64 = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        m64 = d64.astype("datetime64[M]")
        dom = (d64 - m64).astype(np.int64) + 1
        ks, months, doms, clamped = [], [], [], []
        for k in ADDM_SHIFTS:
            m2 = m64 + np.timedelta64(k, "M")
            dim = ((m2 + np.timedelta64(1, "M")).astype("datetime64[D]")
                   - m2.astype("datetime64[D]")).astype(np.int64)
            dom2 = np.minimum(dom, dim)
            ks.append(np.full(len(d64), k, np.int64))
            months.append(np.datetime_as_string(m2, unit="M"))
            doms.append(dom2)
            clamped.append((dom2 < dom).astype(np.int64))
        return pa.table({
            "k": pa.array(np.concatenate(ks), pa.int64()),
            "month": pa.array(np.concatenate(months)),
            "dom2": pa.array(np.concatenate(doms), pa.int64()),
            "clamped": pa.array(np.concatenate(clamped), pa.int64()),
        })

    return fast_groupby_agg(
        orders.map_batches(_shift, batch_format="pyarrow"),
        ["k", "month"],
        {"n": (None, "count"), "sum_dom": ("dom2", "sum"),
         "n_clamped": ("clamped", "sum")})


ORACLES["add_months_audit"] = f"""
    WITH ks AS (SELECT unnest([{", ".join(map(str, ADDM_SHIFTS))}])
                    AS k),
    s AS (
        SELECT CAST(ks.k AS BIGINT) AS k, o_orderdate AS d0,
               o_orderdate + ks.k * (INTERVAL 1 MONTH) AS d1
        FROM orders CROSS JOIN ks)
    SELECT k, strftime(d1, '%Y-%m') AS month,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(day(d1) AS BIGINT)) AS BIGINT) AS sum_dom,
           CAST(count(*) FILTER (WHERE day(d1) < day(d0)) AS BIGINT)
               AS n_clamped
    FROM s GROUP BY 1, 2
"""


# ===================================== KNN-Shapley data valuation

KNNSHAP_Q = 4   # deterministic md5-sampled test points
KNNSHAP_K = 5   # the K of the KNN utility


def q_knn_shapley(sf_dir):
    """Exact KNN-Shapley data valuation (Jia et al., VLDB'19): the
    Shapley value of every TRAINING point for a K-NN classifier's
    utility on Q held-out test points — the canonical "which examples
    are worth keeping" signal for training-data curation, computed
    exactly (no Monte Carlo) via the sorted-by-distance recurrence
    s_N = 1[y_N = y]/N,  s_i = s_{i+1} + (1[y_i=y] − 1[y_{i+1}=y])/max(i,K).

    Integer-exact reformulation: with w_j = 10⁹ // max(j, K) (floor of
    positive ints — identical in numpy and DuckDB) the recurrence
    telescopes to  s_i = ind_i·w_i + Σ_{j>i} ind_j·(w_j − w_{j−1}),
    a SUFFIX SUM of terms h_j that depend only on row j's own global
    rank — so no sequential scan: h is a plain map once ordinals exist.
    Distances are integer (×1e6 fixed-point per dim, squared L2), so
    ranks and values are bitwise reproducible against the oracle.

    Scale plan: Q test vectors chosen by per-block md5 top-Q + a
    block-count-sized driver fold, then broadcast by closure (Q×d
    ints). The expand map emits Q rows per training vector — a
    documented Q× exchange (Q is a small constant) — into ONE
    range-partitioned sort by (t, dist, train_id). Ordinals use the
    engine's two-pass block-offset reconstruction (q_merge_on_read's
    machinery) on the materialized sort; the cross-block suffix is
    closed by a SEGMENT-count-shaped (≈ block-count) exclusive suffix
    table built in one small groupby and broadcast via ray.put —
    driver state is block-shaped, never row-shaped."""
    import hashlib as _hl

    import ray.data as rd  # noqa: F401  (house import symmetry)

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    # ---- pass 0: md5 top-Q test selection (block-count-sized fold)
    def _cand(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_pylist()
        hx = [_hl.md5(f"knnshap,{v}".encode()).hexdigest() for v in ids]
        order = sorted(range(len(ids)),
                       key=lambda i: (hx[i], ids[i]))[:KNNSHAP_Q]
        return pa.table({
            "vec_id": pa.array([ids[i] for i in order], pa.int64()),
            "hx": pa.array([hx[i] for i in order], pa.string())})

    cand = emb.select_columns(["vec_id"]).map_batches(
        _cand, batch_format="pyarrow").to_pandas()
    test_ids = cand.sort_values(["hx", "vec_id"]) \
        .head(KNNSHAP_Q)["vec_id"].astype(int).tolist()

    tq = pa.concat_tables([t for t in (
        b for b in emb.map_batches(
            lambda b: b.filter(pc.is_in(
                b["vec_id"], value_set=pa.array(test_ids, pa.int64()))),
            batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"))
        if t.num_rows > 0])
    order = {v: i for i, v in enumerate(test_ids)}
    tq = tq.take(pa.array(sorted(
        range(tq.num_rows),
        key=lambda i: order[tq["vec_id"][i].as_py()])))
    tl = tq["embedding"].combine_chunks()
    tmat = _round_half_away(
        tl.values.to_numpy(zero_copy_only=False).astype(np.float64)
        * 1e6).astype(np.int64).reshape(KNNSHAP_Q, -1)
    t_labs = np.asarray(tq["label"].to_pylist(), np.int64)
    test_set = set(test_ids)

    # ---- expand: Q distance rows per training vector
    def _expand(b: pa.Table) -> pa.Table:
        keep = ~np.isin(
            b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            np.asarray(test_ids, np.int64))
        b = b.filter(pa.array(keep))
        cols = {"t": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
                "train_id": pa.array([], pa.int64()),
                "ind": pa.array([], pa.int64())}
        if b.num_rows == 0:
            return pa.table(cols)
        la = b["embedding"].combine_chunks()
        x = _round_half_away(
            la.values.to_numpy(zero_copy_only=False).astype(np.float64)
            * 1e6).astype(np.int64).reshape(b.num_rows, -1)
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        labs = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts, ds, trs, inds = [], [], [], []
        for q in range(KNNSHAP_Q):
            diff = x - tmat[q]
            ds.append((diff * diff).sum(axis=1))
            ts.append(np.full(b.num_rows, q, np.int64))
            trs.append(ids)
            inds.append((labs == t_labs[q]).astype(np.int64))
        return pa.table({"t": pa.array(np.concatenate(ts), pa.int64()),
                         "dist": pa.array(np.concatenate(ds), pa.int64()),
                         "train_id": pa.array(np.concatenate(trs),
                                              pa.int64()),
                         "ind": pa.array(np.concatenate(inds),
                                         pa.int64())})

    ranked = emb.map_batches(_expand, batch_format="pyarrow") \
        .sort(["t", "dist", "train_id"]).materialize()

    # ---- pass 1: per (block, t-segment) first-key + count → offsets
    def _seg_hdr(b: pa.Table) -> pa.Table:
        cols = {"t": pa.array([], pa.int64()),
                "d0": pa.array([], pa.int64()),
                "tid0": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0:
            return pa.table(cols)
        t = b["t"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(
            [[True], t[1:] != t[:-1]]))
        ends = np.concatenate([starts[1:], [len(t)]])
        return pa.table({
            "t": pa.array(t[starts], pa.int64()),
            "d0": pa.array(b["dist"].to_numpy(
                zero_copy_only=False)[starts], pa.int64()),
            "tid0": pa.array(b["train_id"].to_numpy(
                zero_copy_only=False)[starts], pa.int64()),
            "n": pa.array(ends - starts, pa.int64())})

    hdr = ranked.map_batches(_seg_hdr, batch_format="pyarrow",
                             batch_size=None).to_pandas() \
        .sort_values(["t", "d0", "tid0"]).reset_index(drop=True)
    offs: dict = {}
    for t_val, grp in hdr.groupby("t", sort=True):
        start = 0
        for _, row in grp.iterrows():
            offs[(int(row["t"]), int(row["d0"]), int(row["tid0"]))] = start
            start += int(row["n"])
    offs_ref = ray.put(offs)

    # ---- pass 2: ordinals → h_j and within-segment suffix partials
    def _partials(b: pa.Table) -> pa.Table:
        cols = {"t": pa.array([], pa.int64()),
                "d0": pa.array([], pa.int64()),
                "tid0": pa.array([], pa.int64()),
                "train_id": pa.array([], pa.int64()),
                "s_part": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64())}
        if b.num_rows == 0:
            return pa.table(cols)
        table = ray.get(offs_ref)
        t = b["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        tid = b["train_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ind = b["ind"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], t[1:] != t[:-1]]))
        ends = np.concatenate([starts[1:], [len(t)]])
        out_t, out_d0, out_tid0 = [], [], []
        out_tr, out_s, out_h = [], [], []
        for s0, e0 in zip(starts, ends):
            seg_key = (int(t[s0]), int(d[s0]), int(tid[s0]))
            base = table[seg_key]
            j = base + 1 + np.arange(e0 - s0, dtype=np.int64)  # 1-based
            w = 1_000_000_000 // np.maximum(j, KNNSHAP_K)
            wprev = np.where(
                j >= 2, 1_000_000_000 // np.maximum(j - 1, KNNSHAP_K), 0)
            h = np.where(j >= 2, ind[s0:e0] * (w - wprev), 0)
            # suffix of h strictly AFTER each row, within the segment
            suff = np.concatenate(
                [np.cumsum(h[::-1])[::-1][1:], [0]])
            out_t.append(np.full(e0 - s0, seg_key[0], np.int64))
            out_d0.append(np.full(e0 - s0, seg_key[1], np.int64))
            out_tid0.append(np.full(e0 - s0, seg_key[2], np.int64))
            out_tr.append(tid[s0:e0])
            out_s.append(ind[s0:e0] * w + suff)
            out_h.append(h)
        return pa.table({
            "t": pa.array(np.concatenate(out_t), pa.int64()),
            "d0": pa.array(np.concatenate(out_d0), pa.int64()),
            "tid0": pa.array(np.concatenate(out_tid0), pa.int64()),
            "train_id": pa.array(np.concatenate(out_tr), pa.int64()),
            "s_part": pa.array(np.concatenate(out_s), pa.int64()),
            "h": pa.array(np.concatenate(out_h), pa.int64())})

    parts = ranked.map_batches(_partials, batch_format="pyarrow",
                               batch_size=None)

    # ---- segment-count-shaped exclusive SUFFIX totals per t
    seg = fast_groupby_agg(parts, ["t", "d0", "tid0"],
                           {"h_tot": ("h", "sum")}).to_pandas() \
        .sort_values(["t", "d0", "tid0"]).reset_index(drop=True)
    later: dict = {}
    for t_val, grp in seg.groupby("t", sort=True):
        tot = grp["h_tot"].to_numpy(np.int64)
        suff = np.concatenate([np.cumsum(tot[::-1])[::-1][1:], [0]])
        for (_, row), sv in zip(grp.iterrows(), suff):
            later[(int(row["t"]), int(row["d0"]),
                   int(row["tid0"]))] = int(sv)
    later_ref = ray.put(later)

    def _close(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"train_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        table = ray.get(later_ref)
        t = b["t"].to_numpy(zero_copy_only=False)
        d0 = b["d0"].to_numpy(zero_copy_only=False)
        tid0 = b["tid0"].to_numpy(zero_copy_only=False)
        add = np.fromiter(
            (table[(int(a), int(bb), int(cc))]
             for a, bb, cc in zip(t, d0, tid0)),
            np.int64, b.num_rows)
        return pa.table({
            "train_id": b["train_id"],
            "s": pa.array(b["s_part"].to_numpy(
                zero_copy_only=False) + add, pa.int64())})

    return fast_groupby_agg(
        parts.map_batches(_close, batch_format="pyarrow"),
        ["train_id"],
        {"n_tests": (None, "count"), "shapley_fp": ("s", "sum")}) \
        .map_batches(lambda b: b.rename_columns(
            ["vec_id", "n_tests", "shapley_fp"]),
            batch_format="pyarrow")


ORACLES["knn_shapley"] = f"""
    WITH hx AS (
        SELECT vec_id, label,
               md5('knnshap,' || CAST(vec_id AS VARCHAR)) AS h
        FROM embeddings),
    tq AS (SELECT vec_id, label FROM hx
           ORDER BY h, vec_id LIMIT {KNNSHAP_Q}),
    el AS (
        SELECT vec_id, gs - 1 AS dim,
               CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                    AS BIGINT) AS xfp
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS u(gs)),
    d AS (
        SELECT te.vec_id AS t_id, te.label AS t_lab,
               tr.vec_id AS train_id, tr.label AS tr_lab,
               sum((a.xfp - b.xfp) * (a.xfp - b.xfp)) AS dist
        FROM tq te
        JOIN el b ON b.vec_id = te.vec_id
        JOIN el a ON a.dim = b.dim
        JOIN embeddings tr ON tr.vec_id = a.vec_id
        WHERE a.vec_id NOT IN (SELECT vec_id FROM tq)
        GROUP BY 1, 2, 3, 4),
    r AS (
        SELECT t_id, train_id,
               CASE WHEN tr_lab = t_lab THEN 1 ELSE 0 END AS ind,
               row_number() OVER (PARTITION BY t_id
                                  ORDER BY dist, train_id) AS i
        FROM d),
    w AS (
        SELECT t_id, train_id, ind, i,
               1000000000 // greatest(i, {KNNSHAP_K}) AS wi,
               CASE WHEN i >= 2 THEN ind *
                    (1000000000 // greatest(i, {KNNSHAP_K})
                     - 1000000000 // greatest(i - 1, {KNNSHAP_K}))
                    ELSE 0 END AS h
        FROM r),
    s AS (
        SELECT t_id, train_id,
               ind * wi + COALESCE(sum(h) OVER (
                   PARTITION BY t_id ORDER BY i
                   ROWS BETWEEN 1 FOLLOWING
                        AND UNBOUNDED FOLLOWING), 0) AS sv
        FROM w)
    SELECT train_id AS vec_id,
           CAST(count(*) AS BIGINT) AS n_tests,
           CAST(sum(sv) AS BIGINT) AS shapley_fp
    FROM s GROUP BY train_id
"""


# ============================== sorted-neighborhood blocking (SNM)

SNM_WINDOW = 6             # slide width w: pairs within w-1 positions
SNM_FALLBACK_MAX = 5_000_000  # single-task tier guard (tiny inputs)


def q_snm_blocking(sf_dir, w: int = SNM_WINDOW):
    """Sorted-neighborhood record-linkage blocking (Hernández &
    Stolfo, SIGMOD'95): sort by a fuzzy blocking key (here the cent-
    exact account balance) and take every pair within w−1 positions as
    a candidate — the classic O(N·w) alternative to hash blocking when
    near-duplicates differ slightly in the key. Output: record count,
    candidate-pair count, pairs agreeing on nation (the match label
    stand-in), the pair key-gap sum (certifies the exact pair SET, not
    just its size), and the reduction ratio vs all N(N−1)/2 pairs.

    Scale plan — the window never materializes as a join: after ONE
    range-partitioned sort (materialized so both passes see identical
    blocks), pass 1 ships each block's first key + row count + FIRST
    w−1 rows — block-count×w-shaped, the only driver state — and pass
    2 counts pairs inside each block vectorized (d-shifted slices,
    d < w) plus boundary pairs against the NEXT block's broadcast head
    rows. A single-task tier (guarded) covers degenerate blockings
    where some sorted block holds fewer than w−1 rows — only possible
    on inputs far below one block per CPU."""
    import ray.data as rd

    cust = T(sf_dir, "customer",
             ["c_custkey", "c_nationkey", "c_acctbal"])

    def _key(b: pa.Table) -> pa.Table:
        bal = _round_half_away(
            b["c_acctbal"].to_numpy(zero_copy_only=False)
            .astype(np.float64) * 100).astype(np.int64)
        return pa.table({
            "bal": pa.array(bal, pa.int64()),
            "ck": pc.cast(b["c_custkey"], pa.int64()),
            "nk": pc.cast(b["c_nationkey"], pa.int64())})

    srt = cust.map_batches(_key, batch_format="pyarrow") \
        .sort(["bal", "ck"]).materialize()

    def _hdr(b: pa.Table) -> pa.Table:
        cols = {"fbal": pa.array([], pa.int64()),
                "fck": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "hbal": pa.array([], pa.list_(pa.int64())),
                "hck": pa.array([], pa.list_(pa.int64())),
                "hnk": pa.array([], pa.list_(pa.int64()))}
        if b.num_rows == 0:
            return pa.table(cols)
        k = min(w - 1, b.num_rows)
        return pa.table({
            "fbal": b["bal"][:1], "fck": b["ck"][:1],
            "n": pa.array([b.num_rows], pa.int64()),
            "hbal": pa.array([b["bal"][:k].to_pylist()],
                             pa.list_(pa.int64())),
            "hck": pa.array([b["ck"][:k].to_pylist()],
                            pa.list_(pa.int64())),
            "hnk": pa.array([b["nk"][:k].to_pylist()],
                            pa.list_(pa.int64()))})

    hdr = srt.map_batches(_hdr, batch_format="pyarrow",
                          batch_size=None).to_pandas() \
        .sort_values(["fbal", "fck"]).reset_index(drop=True)
    n_total = int(hdr["n"].sum())
    if n_total < 2:
        return rd.from_arrow(pa.table({
            "n_records": pa.array([n_total], pa.int64()),
            "n_pairs": pa.array([0], pa.int64()),
            "n_match_pairs": pa.array([0], pa.int64()),
            "pair_gap_sum": pa.array([0], pa.int64()),
            "reduction_ratio_fp": pa.array([0], pa.int64())}))

    def _pairs(bal, ck, nk, left_mask, right_mask):
        """Pairs (i, j) with 1 ≤ j−i ≤ w−1 over position-consecutive
        arrays, counting only pairs whose LEFT side passes left_mask
        and whose RIGHT side passes right_mask (so the boundary call
        can restrict to strictly cross-block pairs) — vectorized
        d-shift slices."""
        np_, nm, gap = 0, 0, 0
        for d in range(1, w):
            if d >= len(bal):
                break
            keep = left_mask[:-d] & right_mask[d:]
            np_ += int(keep.sum())
            nm += int(((nk[:-d] == nk[d:]) & keep).sum())
            gap += int(((bal[d:] - bal[:-d]) * keep).sum())
        return np_, nm, gap

    if (hdr["n"].to_numpy(np.int64) < w - 1).any():
        # degenerate blocking: some block can't carry the window —
        # guarded single-task tier over the (tiny) sorted table
        assert n_total <= SNM_FALLBACK_MAX, \
            f"SNM fallback guard: {n_total} rows with undersized blocks"
        df = srt.to_pandas().sort_values(["bal", "ck"]) \
            .reset_index(drop=True)
        ones = np.ones(len(df), bool)
        np_, nm, gap = _pairs(df["bal"].to_numpy(np.int64),
                              df["ck"].to_numpy(np.int64),
                              df["nk"].to_numpy(np.int64), ones, ones)
    else:
        nxt = {}
        for i in range(len(hdr) - 1):
            nxt[(int(hdr["fbal"][i]), int(hdr["fck"][i]))] = (
                np.asarray(hdr["hbal"][i + 1], np.int64),
                np.asarray(hdr["hck"][i + 1], np.int64),
                np.asarray(hdr["hnk"][i + 1], np.int64))
        nxt_ref = ray.put(nxt)

        def _count(b: pa.Table) -> pa.Table:
            cols = {"np": pa.array([], pa.int64()),
                    "nm": pa.array([], pa.int64()),
                    "gap": pa.array([], pa.int64())}
            if b.num_rows == 0:
                return pa.table(cols)
            heads = ray.get(nxt_ref)
            bal = b["bal"].to_numpy(zero_copy_only=False)
            ck = b["ck"].to_numpy(zero_copy_only=False)
            nk = b["nk"].to_numpy(zero_copy_only=False)
            ones = np.ones(len(bal), bool)
            np_, nm, gap = _pairs(bal, ck, nk, ones, ones)
            key = (int(bal[0]), int(ck[0]))
            if key in heads:
                hb, hc, hn = heads[key]
                k = min(w - 1, len(bal))
                cb = np.concatenate([bal[-k:], hb])
                cc = np.concatenate([ck[-k:], hc])
                cn = np.concatenate([nk[-k:], hn])
                own = np.zeros(len(cb), bool)
                own[:k] = True   # left side must be in THIS block
                p2, m2, g2 = _pairs(cb, cc, cn, own, ~own)
                np_, nm, gap = np_ + p2, nm + m2, gap + g2
            return pa.table({"np": pa.array([np_], pa.int64()),
                             "nm": pa.array([nm], pa.int64()),
                             "gap": pa.array([gap], pa.int64())})

        parts = srt.map_batches(_count, batch_format="pyarrow",
                                batch_size=None).to_pandas()
        np_, nm, gap = (int(parts["np"].sum()), int(parts["nm"].sum()),
                        int(parts["gap"].sum()))

    return rd.from_arrow(pa.table({
        "n_records": pa.array([n_total], pa.int64()),
        "n_pairs": pa.array([np_], pa.int64()),
        "n_match_pairs": pa.array([nm], pa.int64()),
        "pair_gap_sum": pa.array([gap], pa.int64()),
        "reduction_ratio_fp": pa.array(
            [np_ * 1_000_000_000 // (n_total * (n_total - 1) // 2)],
            pa.int64())}))


ORACLES["snm_blocking"] = f"""
    WITH b AS (
        SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
               row_number() OVER (
                   ORDER BY CAST(round(c_acctbal * 100) AS BIGINT),
                            c_custkey) AS r
        FROM customer),
    p AS (
        SELECT a.bal AS bi, c.bal AS bj,
               a.c_nationkey AS ni, c.c_nationkey AS nj
        FROM b a JOIN b c
          ON c.r > a.r AND c.r <= a.r + {SNM_WINDOW - 1})
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_records,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) FILTER (WHERE ni = nj) AS BIGINT)
               AS n_match_pairs,
           CAST(sum(bj - bi) AS BIGINT) AS pair_gap_sum,
           CAST(count(*) * 1000000000 //
                ((SELECT count(*) FROM b)
                 * ((SELECT count(*) FROM b) - 1) // 2) AS BIGINT)
               AS reduction_ratio_fp
    FROM p
"""


# ============================ offline bandit policy evaluation

BANDIT_ARMS = 4


def q_bandit_offline_eval(sf_dir):
    """Offline (counterfactual) bandit policy evaluation — the replay
    estimator of Li et al. (WSDM'11) plus inverse-propensity scoring:
    each event is a logged uniform-random action (md5-derived arm, so
    the propensity is exactly 1/A on both sides); the target policy
    picks its arm from the user context (md5 of user_id). Per target
    arm: logged traffic, replay-matched traffic, matched reward mass,
    the replay value estimate (mean matched reward) and the IPS value
    estimate (A × matched mass / all logged), both ×1e6 integer
    fixed-point — the evaluation every recommendation/ads system runs
    before shipping a policy, with no floats to drift.

    Scale plan: one vectorized map (md5 per row — the engine's
    standard deterministic-randomness primitive) folding into an
    ARM-count-shaped groupby; the exchange is A rows at any corpus
    size."""
    import hashlib as _hl

    ev = T(sf_dir, "events", ["event_id", "user_id", "value"])

    def _eval(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_pylist()
        uids = b["user_id"].to_pylist()
        logged = np.fromiter(
            (int(_hl.md5(f"log,{e}".encode()).hexdigest()[:2], 16)
             % BANDIT_ARMS for e in ids), np.int64, len(ids))
        target = np.fromiter(
            (int(_hl.md5(f"tgt,{u}".encode()).hexdigest()[:2], 16)
             % BANDIT_ARMS for u in uids), np.int64, len(uids))
        r = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False)
            .astype(np.float64) * 1e6).astype(np.int64)
        match = (logged == target).astype(np.int64)
        return pa.table({
            "arm": pa.array(target, pa.int64()),
            "one": pa.array(np.ones(len(ids), np.int64)),
            "logged_here": pa.array((logged == target).astype(np.int64)),
            "m_reward": pa.array(r * match, pa.int64())})

    agg = fast_groupby_agg(
        ev.map_batches(_eval, batch_format="pyarrow"), ["arm"],
        {"n_target": ("one", "sum"), "n_matched": ("logged_here", "sum"),
         "matched_reward_fp": ("m_reward", "sum")})

    def _final(b: pa.Table) -> pa.Table:
        nt = b["n_target"].to_numpy(zero_copy_only=False)
        nm = b["n_matched"].to_numpy(zero_copy_only=False)
        mr = b["matched_reward_fp"].to_numpy(zero_copy_only=False)
        return (b.append_column(
            "replay_value_fp",
            pa.array(mr // np.maximum(nm, 1), pa.int64()))
            .append_column(
            "ips_value_fp",
            pa.array(mr * BANDIT_ARMS // np.maximum(nt, 1), pa.int64())))

    return agg.map_batches(_final, batch_format="pyarrow")


ORACLES["bandit_offline_eval"] = f"""
    WITH e AS (
        SELECT CAST(('0x' || substr(md5('log,' ||
                   CAST(event_id AS VARCHAR)), 1, 2)) AS INT)
                   % {BANDIT_ARMS} AS logged,
               CAST(('0x' || substr(md5('tgt,' ||
                   CAST(user_id AS VARCHAR)), 1, 2)) AS INT)
                   % {BANDIT_ARMS} AS arm,
               CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT)
                   AS r
        FROM events)
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(count(*) AS BIGINT) AS n_target,
           CAST(sum(CASE WHEN logged = arm THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN logged = arm THEN r ELSE 0 END)
                AS BIGINT) AS matched_reward_fp,
           CAST(sum(CASE WHEN logged = arm THEN r ELSE 0 END)
                // greatest(sum(CASE WHEN logged = arm
                                THEN 1 ELSE 0 END), 1) AS BIGINT)
               AS replay_value_fp,
           CAST(sum(CASE WHEN logged = arm THEN r ELSE 0 END)
                * {BANDIT_ARMS} // greatest(count(*), 1) AS BIGINT)
               AS ips_value_fp
    FROM e GROUP BY arm
"""


# ============================ Allen interval-algebra relation audit

ALLEN_W_S = 600        # banded candidate window on start times (s)
ALLEN_GRID_S = 60      # start-time lattice so boundary cases occur
ALLEN_DUR_STEPS = 5    # durations (id % 5 + 1) * 60 s


def q_allen_interval_audit(sf_dir):
    """Allen's interval algebra (Allen, CACM'83) over per-user event
    windows: every same-user interval pair whose starts are within W
    is classified into its exact Allen relation — the semantics layer
    under temporal joins, conflict detection and bitemporal reasoning,
    audited with boundary-exact integer endpoints (starts on a 60-s
    lattice, durations a discrete 60..300-s grid, so meets/starts/
    finishes/equals genuinely occur instead of being measure-zero).
    Pairs are canonically ordered by (s, e, id), folding the 13
    relations into 7 counts: before, meets, overlaps, finished_by,
    contains, starts, equals.

    Scale plan: q_interval_overlap_pairs' banded self-join — left
    keyed at its own W-cell, right emitted at its cell and cell−1, so
    each qualifying pair meets in EXACTLY one (user, cell) bucket; one
    composite-key hash join, a vectorized canonical-order + band
    filter, relation classification as pure numpy selects, and a
    7-row groupby. Exchange 3× events; never t×t."""
    ev = T(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _iv(b: pa.Table):
        t = _ts_ns(b["ts"]) // 1000
        s = (t // (ALLEN_GRID_S * 1_000_000)) * ALLEN_GRID_S
        i = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = s + (i % ALLEN_DUR_STEPS + 1) * 60
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return u, s, e, i

    def _l(b: pa.Table) -> pa.Table:
        u, s, e, i = _iv(b)
        return pa.table({
            "u": pa.array(u, pa.int64()),
            "cell": pa.array(s // ALLEN_W_S, pa.int64()),
            "s1": pa.array(s, pa.int64()), "e1": pa.array(e, pa.int64()),
            "id1": pa.array(i, pa.int64())})

    def _r(b: pa.Table) -> pa.Table:
        u, s, e, i = _iv(b)
        c = s // ALLEN_W_S
        return pa.table({
            "u": pa.array(np.concatenate([u, u]), pa.int64()),
            "cell": pa.array(np.concatenate([c, c - 1]), pa.int64()),
            "s2": pa.array(np.concatenate([s, s]), pa.int64()),
            "e2": pa.array(np.concatenate([e, e]), pa.int64()),
            "id2": pa.array(np.concatenate([i, i]), pa.int64())})

    j = ev.map_batches(_l, batch_format="pyarrow").join(
        ev.map_batches(_r, batch_format="pyarrow"), "inner",
        num_partitions=JOIN_PARTS, on=("u", "cell"))

    def _classify(b: pa.Table) -> pa.Table:
        cols = {"relation": pa.array([], pa.string()),
                "one": pa.array([], pa.int64())}
        if b.num_rows == 0:
            return pa.table(cols)
        s1 = b["s1"].to_numpy(zero_copy_only=False)
        e1 = b["e1"].to_numpy(zero_copy_only=False)
        i1 = b["id1"].to_numpy(zero_copy_only=False)
        s2 = b["s2"].to_numpy(zero_copy_only=False)
        e2 = b["e2"].to_numpy(zero_copy_only=False)
        i2 = b["id2"].to_numpy(zero_copy_only=False)
        canon = (s1 < s2) | ((s1 == s2) & (
            (e1 < e2) | ((e1 == e2) & (i1 < i2))))
        ok = canon & (s2 - s1 < ALLEN_W_S)
        s1, e1, s2, e2 = s1[ok], e1[ok], s2[ok], e2[ok]
        rel = np.select(
            [(s1 < s2) & (e1 < s2), (s1 < s2) & (e1 == s2),
             (s1 < s2) & (e1 < e2), (s1 < s2) & (e1 == e2),
             (s1 < s2), (e1 < e2)],
            ["before", "meets", "overlaps", "finished_by",
             "contains", "starts"], default="equals")
        return pa.table({"relation": pa.array(rel, pa.string()),
                         "one": pa.array(
                             np.ones(len(rel), np.int64))})

    return fast_groupby_agg(
        j.map_batches(_classify, batch_format="pyarrow"),
        ["relation"], {"n_pairs": ("one", "sum")})


ORACLES["allen_interval_audit"] = f"""
    WITH iv AS (
        SELECT event_id AS id, user_id AS u,
               (epoch_us(ts) // {ALLEN_GRID_S * 1_000_000})
                   * {ALLEN_GRID_S} AS s,
               (epoch_us(ts) // {ALLEN_GRID_S * 1_000_000})
                   * {ALLEN_GRID_S}
                   + (event_id % {ALLEN_DUR_STEPS} + 1) * 60 AS e
        FROM events),
    p AS (
        SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
        FROM iv a JOIN iv b
          ON a.u = b.u
         AND (a.s < b.s OR (a.s = b.s AND (a.e < b.e
              OR (a.e = b.e AND a.id < b.id))))
         AND b.s - a.s < {ALLEN_W_S})
    SELECT relation, CAST(count(*) AS BIGINT) AS n_pairs FROM (
        SELECT CASE
            WHEN s1 < s2 AND e1 < s2 THEN 'before'
            WHEN s1 < s2 AND e1 = s2 THEN 'meets'
            WHEN s1 < s2 AND e1 < e2 THEN 'overlaps'
            WHEN s1 < s2 AND e1 = e2 THEN 'finished_by'
            WHEN s1 < s2 THEN 'contains'
            WHEN e1 < e2 THEN 'starts'
            ELSE 'equals' END AS relation
        FROM p) GROUP BY relation
"""


# ============================== Bloom-filter false-positive audit

BLOOM_AUDIT_M = 128   # bits
BLOOM_AUDIT_K = 2     # hash functions


def q_bloom_fpr_audit(sf_dir):
    """Bloom-filter false-positive-rate audit (Bloom, CACM'70): build
    an (m, k) filter over the supplier keys with md5-derived bit
    positions, probe it with every customer key, and report the EXACT
    membership/flag/false-positive counts plus the measured FPR — the
    ground-truth audit behind every bloom-pushdown join (the engine's
    q_bloom_semi_join) and storage zone-map, with the bit array
    semantics reproduced exactly in SQL (occupied bits = DISTINCT
    positions; flagged = all k probe positions occupied).

    Scale plan: the filter is m BITS — a constant — so the build is a
    position-distinct fold (≤ m rows) collected once and broadcast by
    closure; the probe is one vectorized map over the probe table (k
    md5 positions per key, numpy bitset lookups) folding to a single
    summary row. The inserted-key set rides the same broadcast under
    the dimension-table contract (supplier is supply-side small; the
    guarded pattern everywhere else in this file)."""
    import hashlib as _hl

    m, k = BLOOM_AUDIT_M, BLOOM_AUDIT_K

    def _pos(key: int, j: int) -> int:
        # hash-family tag 'bf' is fixed here and in the oracle (r4,
        # ADVICE: the old prefix parameter was dead — never
        # interpolated)
        return int(_hl.md5(f"bf{j},{key}".encode())
                   .hexdigest()[:8], 16) % m

    sup = T(sf_dir, "supplier", ["s_suppkey"])

    def _bits(b: pa.Table) -> pa.Table:
        keys = b["s_suppkey"].to_pylist()
        ps = sorted({_pos(int(x), j)
                     for x in keys for j in range(k)})
        return pa.table({"p": pa.array(ps, pa.int64())})

    occ_rows = fast_groupby_agg(
        sup.map_batches(_bits, batch_format="pyarrow"),
        ["p"], {"_n": (None, "count")}).to_pandas()
    occupied = np.zeros(m, bool)
    occupied[occ_rows["p"].to_numpy(np.int64)] = True
    inserted = np.sort(np.asarray(
        sup.to_pandas()["s_suppkey"], np.int64))  # dimension-sized

    probes = T(sf_dir, "customer", ["c_custkey"])

    def _probe(b: pa.Table) -> pa.Table:
        keys = b["c_custkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        flagged = np.ones(len(keys), bool)
        for j in range(k):
            pj = np.fromiter((_pos(int(x), j) for x in keys),
                             np.int64, len(keys))
            flagged &= occupied[pj]
        present = np.isin(keys, inserted)
        return pa.table({
            "n_probes": pa.array([len(keys)], pa.int64()),
            "n_present": pa.array([int(present.sum())], pa.int64()),
            "n_flagged": pa.array([int(flagged.sum())], pa.int64()),
            "n_false_pos": pa.array(
                [int((flagged & ~present).sum())], pa.int64()),
            "n_missed": pa.array(
                [int((present & ~flagged).sum())], pa.int64())})

    parts = probes.map_batches(_probe, batch_format="pyarrow") \
        .to_pandas()
    n_probes = int(parts["n_probes"].sum())
    n_present = int(parts["n_present"].sum())
    n_flagged = int(parts["n_flagged"].sum())
    n_fp = int(parts["n_false_pos"].sum())
    n_missed = int(parts["n_missed"].sum())
    assert n_missed == 0, "Bloom filters never miss an inserted key"
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "n_inserted": pa.array([len(inserted)], pa.int64()),
        "n_bits_set": pa.array([int(occupied.sum())], pa.int64()),
        "n_probes": pa.array([n_probes], pa.int64()),
        "n_present": pa.array([n_present], pa.int64()),
        "n_flagged": pa.array([n_flagged], pa.int64()),
        "n_false_pos": pa.array([n_fp], pa.int64()),
        "fpr_fp": pa.array(
            [n_fp * 1_000_000_000 // max(n_probes - n_present, 1)],
            pa.int64())}))


ORACLES["bloom_fpr_audit"] = f"""
    WITH hj AS (SELECT unnest(range({BLOOM_AUDIT_K})) AS j),
    occ AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5('bf' || CAST(hj.j AS VARCHAR)
                   || ',' || CAST(s_suppkey AS VARCHAR)), 1, 8))
                   AS BIGINT) % {BLOOM_AUDIT_M} AS p
        FROM supplier, hj),
    pr AS (
        SELECT c.c_custkey AS key, hj.j,
               CAST(('0x' || substr(md5('bf' || CAST(hj.j AS VARCHAR)
                   || ',' || CAST(c.c_custkey AS VARCHAR)), 1, 8))
                   AS BIGINT) % {BLOOM_AUDIT_M} AS p
        FROM customer c, hj),
    fl AS (
        SELECT pr.key,
               (count(*) FILTER (WHERE occ.p IS NOT NULL)
                   = {BLOOM_AUDIT_K}) AS flagged,
               max(CASE WHEN pr.key IN
                   (SELECT s_suppkey FROM supplier)
                   THEN 1 ELSE 0 END) = 1 AS present
        FROM pr LEFT JOIN occ ON occ.p = pr.p
        GROUP BY pr.key)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM supplier)
               AS n_inserted,
           (SELECT CAST(count(*) AS BIGINT) FROM occ) AS n_bits_set,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(count(*) FILTER (WHERE present) AS BIGINT)
               AS n_present,
           CAST(count(*) FILTER (WHERE flagged) AS BIGINT)
               AS n_flagged,
           CAST(count(*) FILTER (WHERE flagged AND NOT present)
                AS BIGINT) AS n_false_pos,
           CAST(count(*) FILTER (WHERE flagged AND NOT present)
                * 1000000000
                // greatest(count(*) FILTER (WHERE NOT present), 1)
                AS BIGINT) AS fpr_fp
    FROM fl
"""


# ========================== Haar wavelet seasonal synopsis (S-transform)

HAAR_BUCKETS = 16  # power of two → 4 transform levels


def q_haar_synopsis(sf_dir):
    """Per-user multi-resolution activity synopsis via the integer
    Haar S-transform (the wavelet-synopsis construction of Matias,
    Vitter & Wang, SIGMOD'98, in its integer-to-integer lifting form):
    each user's events fold onto a 16-phase day-of-cycle profile;
    four exact transform levels a_i = (x_{2i}+x_{2i+1})//2,
    d_i = x_{2i}−x_{2i+1} reduce it to one DC coefficient plus the
    absolute detail energy per scale — the 5-number sketch a synopsis
    store keeps instead of the raw series, with finest-scale energy
    (e1) high for bursty users and ~0 for uniform ones. Every step is
    integer floor arithmetic on non-negative values, so the unrolled
    4-level SQL oracle matches bitwise.

    Scale plan: ONE (user, phase) pre-aggregated groupby, a map-side
    one-hot fold to the fixed 16-wide layout, a second user-keyed
    groupby of 16 integer sums, then a single vectorized numpy map
    running all four levels over the whole user matrix at once — no
    per-group python, no row loops; exchange is ≤ 16 rows per user
    then 1."""
    ev = T(sf_dir, "events", ["user_id", "ts"])

    def _phase(b: pa.Table) -> pa.Table:
        ph = (_ts_ns(b["ts"]) // 86_400_000_000_000) % HAAR_BUCKETS
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        onehot = {f"c{i}": pa.array((ph == i).astype(np.int64))
                  for i in range(HAAR_BUCKETS)}
        return pa.table({"user_id": pa.array(u, pa.int64()), **onehot})

    wide = fast_groupby_agg(
        ev.map_batches(_phase, batch_format="pyarrow"), ["user_id"],
        {f"c{i}": (f"c{i}", "sum") for i in range(HAAR_BUCKETS)})

    def _haar(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "dc": pa.array([], pa.int64()),
                **{f"e{l}": pa.array([], pa.int64())
                   for l in range(1, 5)}})
        x = np.stack([b[f"c{i}"].to_numpy(zero_copy_only=False)
                      .astype(np.int64)
                      for i in range(HAAR_BUCKETS)], axis=1)
        out = {"user_id": b["user_id"]}
        for lvl in range(1, 5):
            a = (x[:, 0::2] + x[:, 1::2]) // 2
            d = x[:, 0::2] - x[:, 1::2]
            out[f"e{lvl}"] = pa.array(
                np.abs(d).sum(axis=1), pa.int64())
            x = a
        out["dc"] = pa.array(x[:, 0], pa.int64())
        return pa.table({k: out[k] for k in
                         ["user_id", "dc", "e1", "e2", "e3", "e4"]})

    return wide.map_batches(_haar, batch_format="pyarrow")


def _haar_oracle() -> str:
    n = HAAR_BUCKETS
    onehots = ",\n               ".join(
        f"CAST(sum(CASE WHEN ph = {i} THEN n ELSE 0 END) AS BIGINT)"
        f" AS c{i}" for i in range(n))
    lines = [f"""
    WITH c AS (
        SELECT user_id,
               (epoch_us(ts) // 86400000000) % {n} AS ph,
               count(*) AS n
        FROM events GROUP BY 1, 2),
    w0 AS (
        SELECT user_id,
               {onehots}
        FROM c GROUP BY user_id)"""]
    width = n
    for lvl in range(1, 5):
        width //= 2
        avgs = ", ".join(
            f"(c{2 * i} + c{2 * i + 1}) // 2 AS c{i}"
            for i in range(width))
        en = " + ".join(
            f"abs(c{2 * i} - c{2 * i + 1})" for i in range(width))
        carry = "".join(f", e{j}" for j in range(1, lvl))
        lines.append(f""",
    w{lvl} AS (
        SELECT user_id{carry}, {avgs},
               CAST({en} AS BIGINT) AS e{lvl}
        FROM w{lvl - 1})""")
    lines.append("""
    SELECT user_id, CAST(c0 AS BIGINT) AS dc, e1, e2, e3, e4
    FROM w4""")
    return "".join(lines)


ORACLES["haar_synopsis"] = _haar_oracle()


# ============================ DGIM sliding-window counting sketch

DGIM_R = 2                      # max buckets per size → rel err ≤ 1/2
DGIM_WINDOW_US = 7 * 86_400_000_000  # 7-day window


def q_dgim_window_count(sf_dir):
    """DGIM sliding-window counting (Datar, Gionis, Indyk & Motwani,
    SODA'02): per user, the O(log² W)-space bucket sketch that answers
    "how many events in the last W?" on an unbounded stream, audited
    against the exact window count with the paper's guarantee — the
    estimate errs by at most half the oldest straddling bucket, i.e.
    ≤ 50% relative at r = 2 buckets per size — ASSERTED in-query per
    user, so a violated bound fails the pipeline, not a dashboard.
    Output per user: exact window count, DGIM estimate, bucket count
    (the space actually used) and the error.

    Scale plan: the sketch is inherently sequential per stream, so
    this is a per-user ``groupby.map_groups`` under the same
    user-fits-a-worker contract as sessionize's r1 form — documented
    bounded-key assumption; state per user is O(log² W) buckets. The
    window anchor is the GLOBAL max ts, folded first via a 1-row
    aggregate (two cheap passes, no driver row state)."""
    ev = T(sf_dir, "events", ["user_id", "ts"])
    t_max = int(pa.scalar(ev.max("ts")).cast(
        pa.timestamp("us")).value)  # 1-row fold

    def _dgim(df: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(df["ts"].to_numpy().astype("datetime64[us]")
                    .view("int64"))
        buckets: list = []  # (end_ts, size), newest first
        for ts in t:
            buckets.insert(0, (int(ts), 1))
            # merge oldest two of any size with > DGIM_R occurrences
            size = 1
            while True:
                idx = [i for i, b in enumerate(buckets)
                       if b[1] == size]
                if len(buckets) and len(idx) <= DGIM_R:
                    break
                i1, i2 = idx[-2], idx[-1]  # two OLDEST of this size
                buckets[i1] = (buckets[i1][0], size * 2)
                del buckets[i2]
                size *= 2
        lo = t_max - DGIM_WINDOW_US
        exact = int((t > lo).sum())
        inside = [b for b in buckets if b[0] > lo]
        if len(inside) == len(buckets):
            est = sum(b[1] for b in inside)  # no straddler: exact sum
            bound = 0 if est == exact else max(
                (b[1] for b in inside), default=0) // 2
        else:
            est = sum(b[1] for b in inside[:-1]) + (
                inside[-1][1] // 2 if inside else 0)
            bound = inside[-1][1] // 2 if inside else 0
        err = abs(est - exact)
        assert err <= max(bound, 0) + (1 if inside else 0), \
            f"DGIM guarantee violated: est {est} exact {exact}"
        return pd.DataFrame([{
            "user_id": int(df["user_id"].iloc[0]),
            "exact_in_window": exact,
            "dgim_estimate": int(est),
            "n_buckets": len(buckets),
            "abs_err": int(err)}])

    out = ev.groupby("user_id").map_groups(_dgim, batch_format="pandas")
    return out.map_batches(lambda b: pa.table(
        {c: pc.cast(b[c], pa.int64()) for c in
         ("user_id", "exact_in_window", "dgim_estimate",
          "n_buckets", "abs_err")}), batch_format="pyarrow")


# ========================= B-cubed clustering evaluation (Bagga-Baldwin)

B3_BAND = 100  # predicted cluster = n_chars // B3_BAND length band


def q_b_cubed_eval(sf_dir):
    """B-cubed extrinsic clustering evaluation (Bagga & Baldwin '98;
    the per-ITEM precision/recall the entity-resolution and coref
    literature standardized on because, unlike pair-F1, it is not
    dominated by the largest cluster): predicted clusters are the
    n_chars//100 length bands, gold clusters the source labels, and
    B³P = (1/N)·Σ_d |C(d)∩G(d)|/|C(d)| folds entirely through the
    (pred, gold) contingency table as Σ n_cg²/n_c — so the evaluation
    of a corpus-sized clustering costs ONE enum-sized groupby, never a
    pair expansion. Precision, recall and F1 are ×1e9 integers with
    the floor-division order pinned identically in SQL (t_cg =
    n_cg²·1e9 // n_c summed, then // N).

    Scale plan: one (pred, gold) count groupby (enum × enum rows),
    marginals derived from the same table in one small worker-side
    fold; nothing row-shaped leaves the groupby."""
    import ray.data as rd

    docs = T(sf_dir, "documents", ["doc_id", "n_chars", "source"])

    def _cells(b: pa.Table) -> pa.Table:
        n = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "pred": pa.array(n // B3_BAND, pa.int64()),
            "gold": b["source"],
            "one": pa.array(np.ones(len(n), np.int64))})

    cont = fast_groupby_agg(
        docs.map_batches(_cells, batch_format="pyarrow"),
        ["pred", "gold"], {"n_cg": ("one", "sum")}).to_pandas()
    n_c = cont.groupby("pred")["n_cg"].sum()
    n_g = cont.groupby("gold")["n_cg"].sum()
    n_total = int(cont["n_cg"].sum())
    tp = tr = 0
    for _, row in cont.iterrows():
        ncg = int(row["n_cg"])
        tp += ncg * ncg * 1_000_000_000 // int(n_c[row["pred"]])
        tr += ncg * ncg * 1_000_000_000 // int(n_g[row["gold"]])
    p_fp, r_fp = tp // n_total, tr // n_total
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n_total], pa.int64()),
        "n_pred_clusters": pa.array([int(n_c.size)], pa.int64()),
        "n_gold_clusters": pa.array([int(n_g.size)], pa.int64()),
        "b3_precision_fp": pa.array([p_fp], pa.int64()),
        "b3_recall_fp": pa.array([r_fp], pa.int64()),
        "b3_f1_fp": pa.array(
            [2 * p_fp * r_fp // max(p_fp + r_fp, 1)], pa.int64())}))


ORACLES["b_cubed_eval"] = f"""
    WITH cont AS (
        SELECT n_chars // {B3_BAND} AS pred, source AS gold,
               count(*) AS n_cg
        FROM documents GROUP BY 1, 2),
    nc AS (SELECT pred, sum(n_cg) AS n_c FROM cont GROUP BY pred),
    ng AS (SELECT gold, sum(n_cg) AS n_g FROM cont GROUP BY gold),
    t AS (
        SELECT sum(c.n_cg * c.n_cg * 1000000000 // nc.n_c) AS tp,
               sum(c.n_cg * c.n_cg * 1000000000 // ng.n_g) AS tr,
               sum(c.n_cg) AS n
        FROM cont c JOIN nc ON nc.pred = c.pred
                    JOIN ng ON ng.gold = c.gold)
    SELECT CAST(n AS BIGINT) AS n_docs,
           (SELECT CAST(count(*) AS BIGINT) FROM nc)
               AS n_pred_clusters,
           (SELECT CAST(count(*) AS BIGINT) FROM ng)
               AS n_gold_clusters,
           CAST(tp // n AS BIGINT) AS b3_precision_fp,
           CAST(tr // n AS BIGINT) AS b3_recall_fp,
           CAST(2 * (tp // n) * (tr // n)
                // greatest(tp // n + tr // n, 1) AS BIGINT)
               AS b3_f1_fp
    FROM t
"""


# ==================== Selinger join-order estimate audit (System R)


def q_join_order_audit(sf_dir):
    """System R (Selinger et al., SIGMOD'79) left-deep join-order
    audit over customer⋈orders⋈lineitem: for each cross-product-free
    order, the textbook cardinality estimate |A⋈B| = |A|·|B| //
    max(V(A,k), V(B,k)) chained through the intermediate, and its
    q-error against the TRUE three-way join count — the optimizer
    self-audit (estimates are NOT associative under floor chaining, so
    symmetric orders agreeing and {CO first} vs {OL first} differing
    is itself part of what the oracle certifies).

    Scale plan: every statistic is an exact distributed fold (counts
    and two-level distinct counts); the true count reuses the engine's
    partitioned joins (lineitem⋈orders⋈customer key-only projections);
    the order enumeration is over a CONSTANT 4-row plan space on
    final ints."""
    import ray.data as rd

    def _ndv(tbl: str, col: str) -> int:
        return fast_groupby_agg(T(sf_dir, tbl, [col]), [col],
                                {"_n": (None, "count")}).count()

    n_c = T(sf_dir, "customer", ["c_custkey"]).count()
    n_o = T(sf_dir, "orders", ["o_orderkey"]).count()
    n_l = T(sf_dir, "lineitem", ["l_orderkey"]).count()
    v_c_ck = _ndv("customer", "c_custkey")
    v_o_ck = _ndv("orders", "o_custkey")
    v_o_ok = _ndv("orders", "o_orderkey")
    v_l_ok = _ndv("lineitem", "l_orderkey")

    lo = T(sf_dir, "lineitem", ["l_orderkey"]).join(
        T(sf_dir, "orders", ["o_orderkey", "o_custkey"]), "inner",
        num_partitions=JOIN_PARTS, on=("l_orderkey",),
        right_on=("o_orderkey",))
    act = lo.join(T(sf_dir, "customer", ["c_custkey"]), "inner",
                  num_partitions=JOIN_PARTS, on=("o_custkey",),
                  right_on=("c_custkey",)).count()

    i1_co = n_c * n_o // max(v_c_ck, v_o_ck)
    f_co = i1_co * n_l // max(v_o_ok, v_l_ok)
    i1_ol = n_o * n_l // max(v_o_ok, v_l_ok)
    f_ol = i1_ol * n_c // max(v_o_ck, v_c_ck)
    rows = [("CO_L", i1_co, f_co), ("OC_L", i1_co, f_co),
            ("OL_C", i1_ol, f_ol), ("LO_C", i1_ol, f_ol)]
    return rd.from_arrow(pa.table({
        "join_order": pa.array([r[0] for r in rows], pa.string()),
        "est_inter1": pa.array([r[1] for r in rows], pa.int64()),
        "est_final": pa.array([r[2] for r in rows], pa.int64()),
        "actual_final": pa.array([act] * 4, pa.int64()),
        "q_error_fp": pa.array(
            [max(r[2], act) * 1_000_000 // max(min(r[2], act), 1)
             for r in rows], pa.int64())}))


ORACLES["join_order_audit"] = """
    WITH s AS (
        SELECT (SELECT count(*) FROM customer) AS n_c,
               (SELECT count(*) FROM orders) AS n_o,
               (SELECT count(*) FROM lineitem) AS n_l,
               (SELECT count(DISTINCT c_custkey) FROM customer)
                   AS v_c_ck,
               (SELECT count(DISTINCT o_custkey) FROM orders)
                   AS v_o_ck,
               (SELECT count(DISTINCT o_orderkey) FROM orders)
                   AS v_o_ok,
               (SELECT count(DISTINCT l_orderkey) FROM lineitem)
                   AS v_l_ok,
               (SELECT count(*)
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey) AS act),
    e AS (
        SELECT 'CO_L' AS join_order,
               n_c * n_o // greatest(v_c_ck, v_o_ck) AS i1,
               n_c * n_o // greatest(v_c_ck, v_o_ck) * n_l
                   // greatest(v_o_ok, v_l_ok) AS f, act FROM s
        UNION ALL
        SELECT 'OC_L',
               n_c * n_o // greatest(v_c_ck, v_o_ck),
               n_c * n_o // greatest(v_c_ck, v_o_ck) * n_l
                   // greatest(v_o_ok, v_l_ok), act FROM s
        UNION ALL
        SELECT 'OL_C',
               n_o * n_l // greatest(v_o_ok, v_l_ok),
               n_o * n_l // greatest(v_o_ok, v_l_ok) * n_c
                   // greatest(v_o_ck, v_c_ck), act FROM s
        UNION ALL
        SELECT 'LO_C',
               n_o * n_l // greatest(v_o_ok, v_l_ok),
               n_o * n_l // greatest(v_o_ok, v_l_ok) * n_c
                   // greatest(v_o_ck, v_c_ck), act FROM s)
    SELECT join_order, CAST(i1 AS BIGINT) AS est_inter1,
           CAST(f AS BIGINT) AS est_final,
           CAST(act AS BIGINT) AS actual_final,
           CAST(greatest(f, act) * 1000000
                // greatest(least(f, act), 1) AS BIGINT) AS q_error_fp
    FROM e
"""


# ===================== exact assignment audit (5×5 brute force)

ASSIGN_TARGETS = (280, 290, 300, 310, 320)  # per-doc char targets


def q_assignment_audit(sf_dir):
    """Exact min-cost assignment (the Hungarian/Kuhn'55 problem, here
    solved by full enumeration since the plan space is a CONSTANT
    5! = 120): match the 5 lexicographically-first sources to 5 target
    per-doc-length slots minimizing Σ|sum_chars − target·n_docs| — the
    source-to-budget matching a curation planner runs when each mixing
    slot has a length budget. Cost is exact integer chars (no mean
    division); ties broken lexicographically on the assignment vector,
    pinned identically in SQL's ORDER BY.

    Scale plan: profiles are ONE source-enum-sized groupby; the
    enumeration runs on the 5×5 integer cost matrix — constant work,
    constant driver state. (Hungarian O(n³) would replace enumeration
    beyond toy slot counts; the plan-space constant is the documented
    bound.)"""
    import itertools

    import ray.data as rd

    prof = fast_groupby_agg(
        T(sf_dir, "documents", ["source", "n_chars"]), ["source"],
        {"n": (None, "count"), "s": ("n_chars", "sum")}).to_pandas() \
        .sort_values("source").head(5).reset_index(drop=True)
    n = prof["n"].to_numpy(np.int64)
    s = prof["s"].to_numpy(np.int64)
    cost = np.abs(s[:, None] - np.asarray(
        ASSIGN_TARGETS, np.int64)[None, :] * n[:, None])
    best = min(
        itertools.permutations(range(5)),
        key=lambda p: (int(sum(cost[i, p[i]] for i in range(5))),) + p)
    total = int(sum(cost[i, best[i]] for i in range(5)))
    return rd.from_arrow(pa.table({
        "source": pa.array(prof["source"].tolist(), pa.string()),
        "target": pa.array([ASSIGN_TARGETS[best[i]]
                            for i in range(5)], pa.int64()),
        "cost_contrib": pa.array([int(cost[i, best[i]])
                                  for i in range(5)], pa.int64()),
        "total_cost": pa.array([total] * 5, pa.int64())}))


def _assignment_oracle() -> str:
    vals = ", ".join(f"({j}, {t})"
                     for j, t in enumerate(ASSIGN_TARGETS))
    distinct = " AND ".join(
        f"p{a}.j <> p{b}.j" for a in range(5) for b in range(a + 1, 5))
    cost_sum = " + ".join(
        f"(SELECT cost FROM c WHERE c.i = {i} AND c.j = p{i}.j)"
        for i in range(5))
    case = " ".join(f"WHEN {i} THEN best.p{i}" for i in range(4))
    return f"""
    WITH prof AS (
        SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS s
        FROM documents GROUP BY source ORDER BY source LIMIT 5),
    idx AS (SELECT source, n, s,
                   row_number() OVER (ORDER BY source) - 1 AS i
            FROM prof),
    t(j, tv) AS (VALUES {vals}),
    c AS (SELECT i, j, abs(s - tv * n) AS cost FROM idx, t),
    perm AS (
        SELECT p0.j AS p0, p1.j AS p1, p2.j AS p2, p3.j AS p3,
               p4.j AS p4,
               {cost_sum} AS cost
        FROM t p0, t p1, t p2, t p3, t p4
        WHERE {distinct}),
    best AS (SELECT * FROM perm
             ORDER BY cost, p0, p1, p2, p3, p4 LIMIT 1)
    SELECT idx.source, CAST(t.tv AS BIGINT) AS target,
           CAST(c.cost AS BIGINT) AS cost_contrib,
           CAST(best.cost AS BIGINT) AS total_cost
    FROM idx CROSS JOIN best
    JOIN t ON t.j = CASE idx.i {case} ELSE best.p4 END
    JOIN c ON c.i = idx.i AND c.j = t.j
    """


ORACLES["assignment_audit"] = _assignment_oracle()


# ========================= business-day shift audit (weekend roll)


def q_business_day_audit(sf_dir):
    """Next-business-day roll audit — the settlement-date rule (a
    Saturday order settles Monday +2, a Sunday +1) that payment and
    SLA pipelines apply before any date diff, with day-of-week derived
    from pure epoch-day arithmetic ((d + 4) % 7, anchored on
    1970-01-01 = Thursday) so both sides share one integer definition
    instead of locale-dependent DOW functions. Per original weekday:
    row count, rolled count, total days added, and the SUM of landed
    weekday codes — which certifies the roll TARGETS (all mass lands
    Mon–Fri), not just how many rows moved.

    Scale plan: one vectorized numpy map; the exchange is 7 count
    rows at any corpus size."""
    orders = T(sf_dir, "orders", ["o_orderdate"])

    def _roll(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").view("int64")
        dow = (d + 4) % 7  # 0=Sun .. 6=Sat
        shift = np.where(dow == 6, 2, np.where(dow == 0, 1, 0))
        dow2 = ((d + shift) + 4) % 7
        return pa.table({
            "dow": pa.array(dow, pa.int64()),
            "one": pa.array(np.ones(len(d), np.int64)),
            "rolled": pa.array((shift > 0).astype(np.int64)),
            "shift_days": pa.array(shift.astype(np.int64)),
            "dow2": pa.array(dow2.astype(np.int64))})

    return fast_groupby_agg(
        orders.map_batches(_roll, batch_format="pyarrow"), ["dow"],
        {"n": ("one", "sum"), "n_rolled": ("rolled", "sum"),
         "sum_shift_days": ("shift_days", "sum"),
         "sum_landed_dow": ("dow2", "sum")})


ORACLES["business_day_audit"] = """
    WITH d AS (
        SELECT datediff('day', DATE '1970-01-01', o_orderdate) AS dd
        FROM orders),
    r AS (
        SELECT (dd + 4) % 7 AS dow,
               CASE (dd + 4) % 7 WHEN 6 THEN 2 WHEN 0 THEN 1
                    ELSE 0 END AS shift
        FROM d)
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE shift > 0) AS BIGINT)
               AS n_rolled,
           CAST(sum(shift) AS BIGINT) AS sum_shift_days,
           CAST(sum((dow + shift + 7) % 7) AS BIGINT)
               AS sum_landed_dow
    FROM r GROUP BY dow
"""


# ===================== Huffman code-length audit (canonical merges)


def q_huffman_code_lengths(sf_dir):
    """Canonical Huffman coding (Huffman '52) over the source-label
    frequency distribution: per source its optimal prefix-code length,
    with merges made DETERMINISTIC by the (freq, min-member-symbol)
    tie-break so the code lengths are a pure function of the data.
    Two exact certificates are ASSERTED in-query: the Kraft equality
    Σ 2^(L−l_i) = 2^L (the code is a FULL binary tree — optimal
    prefix codes waste no leaf), and total_bits ≤ n·⌈log2 k⌉ (never
    worse than fixed-length). Rows-only for the driver (tree building
    is not SQL-expressible without a 19-layer unrolled join); the
    pytest replay pins the independent-heap construction and the
    Shannon entropy sandwich H ≤ L̄ < H+1.

    Scale plan: the frequency table is ONE enum-sized groupby; the
    tree is built once on k rows (k = label cardinality, constant) in
    the driver fold — never row-shaped."""
    import heapq

    import ray.data as rd

    freq = fast_groupby_agg(
        T(sf_dir, "documents", ["source"]), ["source"],
        {"n": (None, "count")}).to_pandas().sort_values("source")
    syms = freq["source"].tolist()
    f = [int(x) for x in freq["n"]]
    if len(syms) == 1:
        lens = {syms[0]: 1}
    else:
        heap = [(fi, s, (s,)) for s, fi in zip(syms, f)]
        heapq.heapify(heap)
        depth = {s: 0 for s in syms}
        while len(heap) > 1:
            f1, s1, m1 = heapq.heappop(heap)
            f2, s2, m2 = heapq.heappop(heap)
            for s in m1 + m2:
                depth[s] += 1
            heapq.heappush(
                heap, (f1 + f2, min(s1, s2), m1 + m2))
        lens = depth
    ll = [lens[s] for s in syms]
    maxl = max(ll)
    assert sum(2 ** (maxl - l) for l in ll) == 2 ** maxl, \
        "Kraft equality violated: not a full prefix tree"
    total_bits = sum(fi * l for fi, l in zip(f, ll))
    k = len(syms)
    fixed = sum(f) * int(np.ceil(np.log2(max(k, 2))))
    assert total_bits <= fixed, "Huffman worse than fixed-length"
    return rd.from_arrow(pa.table({
        "source": pa.array(syms, pa.string()),
        "freq": pa.array(f, pa.int64()),
        "code_len": pa.array(ll, pa.int64()),
        "total_bits": pa.array([total_bits] * k, pa.int64()),
        "fixed_bits": pa.array([fixed] * k, pa.int64())}))


# ==================== secretary-problem optimal-stopping audit

SECRETARY_THRESH_PPM = 367_879  # ⌊n/e⌋ in parts-per-million


def q_secretary_stopping(sf_dir):
    """Optimal-stopping (secretary problem, Lindley '61/Dynkin '63)
    replay: candidates arrive in a deterministic md5 order, the
    classic 1/e rule observes the first ⌊n·0.367879⌋, then hires the
    first later candidate strictly better than that prefix's best
    (falling back to the last arrival) — replayed EXACTLY and audited:
    did the rule hire the overall best? Output: n, threshold, the
    prefix benchmark, the hire's arrival rank and quality, the
    overall-best flag, and how many post-threshold candidates beat
    the benchmark (the rule's margin).

    Scale plan: arrival ranks use the engine's two-pass block-offset
    ordinal machinery on ONE materialized md5 sort; everything after
    is filtered 1-row aggregates (prefix max, min qualifying rank,
    global max) — no row-shaped driver state."""
    import hashlib as _hl

    import ray.data as rd

    cust = T(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def _key(b: pa.Table) -> pa.Table:
        ks = b["c_custkey"].to_pylist()
        return pa.table({
            "h": pa.array([_hl.md5(f"sec,{k}".encode()).hexdigest()
                           for k in ks], pa.string()),
            "ck": pa.array(np.asarray(ks, np.int64)),
            "q": pa.array(_round_half_away(
                b["c_acctbal"].to_numpy(zero_copy_only=False)
                .astype(np.float64) * 100).astype(np.int64))})

    srt = cust.map_batches(_key, batch_format="pyarrow") \
        .sort(["h", "ck"]).materialize()

    def _hdr(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"fh": pa.array([], pa.string()),
                             "fck": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"fh": b["h"][:1], "fck": b["ck"][:1],
                         "n": pa.array([b.num_rows], pa.int64())})

    hdr = srt.map_batches(_hdr, batch_format="pyarrow",
                          batch_size=None).to_pandas() \
        .sort_values(["fh", "fck"]).reset_index(drop=True)
    n = int(hdr["n"].sum())
    offs = np.concatenate([[0], np.cumsum(
        hdr["n"].to_numpy(np.int64))[:-1]])
    off_by_key = ray.put({(h, int(c)): int(o) for h, c, o in
                          zip(hdr["fh"], hdr["fck"], offs)})
    k = n * SECRETARY_THRESH_PPM // 1_000_000

    def _ranked(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"r": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        base = ray.get(off_by_key)[
            (b["h"][0].as_py(), int(b["ck"][0].as_py()))]
        return pa.table({
            "r": pa.array(base + 1 + np.arange(b.num_rows,
                                               dtype=np.int64)),
            "q": b["q"]})

    ranked = srt.map_batches(_ranked, batch_format="pyarrow",
                             batch_size=None).materialize()
    best_prefix = -1
    if k > 0:
        best_prefix = int(pa.scalar(ranked.filter(
            lambda row: row["r"] <= k).max("q")).as_py())
    qual = ranked.filter(lambda row: row["r"] > k) \
        .map_batches(lambda b: b.filter(
            pa.array(b["q"].to_numpy(zero_copy_only=False)
                     > best_prefix)), batch_format="pyarrow")
    n_better = qual.count()
    if n_better > 0:
        chosen_r = int(pa.scalar(qual.min("r")).as_py())
    else:
        chosen_r = n
    chosen_q = int(pa.scalar(ranked.filter(
        lambda row: row["r"] == chosen_r).max("q")).as_py())
    overall = int(pa.scalar(ranked.max("q")).as_py())
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "k_threshold": pa.array([k], pa.int64()),
        "best_prefix_q": pa.array([best_prefix], pa.int64()),
        "chosen_rank": pa.array([chosen_r], pa.int64()),
        "chosen_q": pa.array([chosen_q], pa.int64()),
        "hired_overall_best": pa.array(
            [int(chosen_q == overall)], pa.int64()),
        "n_post_thresh_better": pa.array([n_better], pa.int64())}))


ORACLES["secretary_stopping"] = f"""
    WITH o AS (
        SELECT c_custkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS q,
               row_number() OVER (ORDER BY
                   md5('sec,' || CAST(c_custkey AS VARCHAR)),
                   c_custkey) AS r
        FROM customer),
    s AS (SELECT count(*) AS n,
                 count(*) * {SECRETARY_THRESH_PPM} // 1000000 AS k
          FROM o),
    m AS (SELECT COALESCE((SELECT max(q) FROM o, s WHERE o.r <= s.k),
                          -1) AS bp),
    c AS (SELECT COALESCE(
                 (SELECT min(o.r) FROM o, s, m
                  WHERE o.r > s.k AND o.q > m.bp),
                 (SELECT n FROM s)) AS cr)
    SELECT s.n AS n, s.k AS k_threshold, m.bp AS best_prefix_q,
           CAST(c.cr AS BIGINT) AS chosen_rank,
           (SELECT q FROM o WHERE o.r = c.cr) AS chosen_q,
           CAST(CASE WHEN (SELECT q FROM o WHERE o.r = c.cr)
                          = (SELECT max(q) FROM o)
                     THEN 1 ELSE 0 END AS BIGINT)
               AS hired_overall_best,
           (SELECT CAST(count(*) AS BIGINT) FROM o, s, m
            WHERE o.r > s.k AND o.q > m.bp) AS n_post_thresh_better
    FROM s, m, c
"""


# ===================== ISO-8601 week-numbering parity audit


def q_iso_week_audit(sf_dir):
    """ISO-8601 week-numbering audit — the Thursday rule (a week
    belongs to the year containing its Thursday, so Jan 1–3 can be
    week 52/53 of the PREVIOUS year and Dec 29–31 week 1 of the NEXT),
    implemented from pure epoch-day arithmetic (dow₀ = (d+3) mod 7
    anchored 1970-01-01 = Thursday; week = (thursday − jan1)//7 + 1)
    and certified against DuckDB's isoyear()/weekofyear() builtins on
    the BOUNDARY weeks (1, 52, 53) where naive week math breaks —
    cohort alignment and weekly rollups silently shear at year edges
    without this rule.

    Scale plan: one vectorized numpy map (datetime64 year decompose),
    a (isoyear, week)-enum groupby; boundary filter keeps the output
    year-count-shaped."""
    orders = T(sf_dir, "orders", ["o_orderdate"])

    def _iso(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").view("int64")
        dow0 = (d + 3) % 7                       # 0 = Monday
        thu = d - dow0 + 3
        thu_d = thu.astype("datetime64[D]")
        y = thu_d.astype("datetime64[Y]")
        isoyear = y.astype(np.int64) + 1970
        jan1 = y.astype("datetime64[D]").view("int64")
        week = (thu - jan1) // 7 + 1
        keep = (week == 1) | (week >= 52)
        return pa.table({
            "isoyear": pa.array(isoyear[keep], pa.int64()),
            "week": pa.array(week[keep], pa.int64()),
            "one": pa.array(np.ones(int(keep.sum()), np.int64))})

    return fast_groupby_agg(
        orders.map_batches(_iso, batch_format="pyarrow"),
        ["isoyear", "week"], {"n": ("one", "sum")})


ORACLES["iso_week_audit"] = """
    SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS isoyear,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS week,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    WHERE weekofyear(o_orderdate) = 1 OR weekofyear(o_orderdate) >= 52
    GROUP BY 1, 2
"""


# ===================== ski-rental competitive-ratio replay

SKI_BUY_COST = 10  # days of rent that equal one purchase


def q_ski_rental(sf_dir):
    """Ski-rental (rent-or-buy) replay — the canonical online
    algorithm (Karlin et al. '88): rent daily until day B, then buy.
    Per user, the active-day count (distinct event days) drives the
    break-even policy cost vs the offline OPT = min(days, B), and the
    2−1/B competitive-ratio guarantee is ASSERTED in-query for every
    user (policy ≤ (2B−1)·OPT / B, exactly, in integers). Output per
    user: active days, policy cost, OPT cost, ratio ×1e6 — the
    classic model for spot-vs-reserved capacity and cache-vs-recompute
    decisions.

    Scale plan: distinct days fold map-side into a (user, day)
    groupby then a per-user count — two exchanges of at most
    user×active-day rows; the policy math is a pure vectorized map."""
    ev = T(sf_dir, "events", ["user_id", "ts"])

    def _days(b: pa.Table) -> pa.Table:
        d = _ts_ns(b["ts"]) // 86_400_000_000_000
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(u), "d": pa.array(d)})

    per_day = fast_groupby_agg(
        ev.map_batches(_days, batch_format="pyarrow"),
        ["u", "d"], {"_n": (None, "count")})
    days = fast_groupby_agg(per_day, ["u"],
                            {"n_days": (None, "count")})

    B = SKI_BUY_COST

    def _policy(b: pa.Table) -> pa.Table:
        nd = b["n_days"].to_numpy(zero_copy_only=False).astype(np.int64)
        policy = np.where(nd < B, nd, (B - 1) + B)
        opt = np.minimum(nd, B)
        assert (policy * B <= (2 * B - 1) * opt).all(), \
            "ski-rental competitive guarantee violated"
        return pa.table({
            "user_id": b["u"],
            "active_days": pa.array(nd, pa.int64()),
            "policy_cost": pa.array(policy, pa.int64()),
            "opt_cost": pa.array(opt, pa.int64()),
            "ratio_fp": pa.array(policy * 1_000_000 // opt, pa.int64())})

    return days.map_batches(_policy, batch_format="pyarrow")


ORACLES["ski_rental"] = f"""
    WITH d AS (
        SELECT user_id,
               count(DISTINCT epoch_us(ts) // 86400000000) AS nd
        FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(nd AS BIGINT) AS active_days,
           CAST(CASE WHEN nd < {SKI_BUY_COST} THEN nd
                     ELSE {2 * SKI_BUY_COST - 1} END AS BIGINT)
               AS policy_cost,
           CAST(least(nd, {SKI_BUY_COST}) AS BIGINT) AS opt_cost,
           CAST(CASE WHEN nd < {SKI_BUY_COST} THEN nd
                     ELSE {2 * SKI_BUY_COST - 1} END * 1000000
                // least(nd, {SKI_BUY_COST}) AS BIGINT) AS ratio_fp
    FROM d
"""


# ===================== LRU vs Belady cache replay (per user)

CACHE_SIZE = 2


def q_lru_vs_belady(sf_dir):
    """Cache-replacement replay — LRU against Belady's clairvoyant
    OPT (Belady '66, the provably-optimal offline policy) on each
    user's event_type reference stream with a size-2 cache: per user,
    reference count, LRU hits, OPT hits, and the hit-rate gap ×1e6.
    OPT ≥ LRU is ASSERTED in-query for every user (optimality of
    farthest-in-future eviction), making the replay self-certifying.
    This is the standard methodology for sizing feature/embedding
    caches from access logs.

    Scale plan: both policies are inherently sequential per stream →
    per-user ``groupby.map_groups`` under the documented
    user-fits-a-worker contract (state = CACHE_SIZE entries); rows
    never leave their group."""
    ev = T(sf_dir, "events", ["user_id", "ts", "event_id",
                              "event_type"])

    def _replay(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        refs = df["event_type"].tolist()
        # LRU
        cache: list = []
        lru_hits = 0
        for r in refs:
            if r in cache:
                lru_hits += 1
                cache.remove(r)
            elif len(cache) >= CACHE_SIZE:
                cache.pop(0)
            cache.append(r)
        # Belady OPT: evict the entry whose next use is farthest
        nxt: dict = {}
        nxt_use = [0] * len(refs)
        for i in range(len(refs) - 1, -1, -1):
            nxt_use[i] = nxt.get(refs[i], len(refs))
            nxt[refs[i]] = i
        cset: dict = {}
        opt_hits = 0
        for i, r in enumerate(refs):
            if r in cset:
                opt_hits += 1
            elif len(cset) >= CACHE_SIZE:
                victim = max(cset, key=lambda k: (cset[k], k))
                del cset[victim]
            cset[r] = nxt_use[i]
        assert opt_hits >= lru_hits, "Belady OPT beaten by LRU"
        return pd.DataFrame([{
            "user_id": int(df["user_id"].iloc[0]),
            "n_refs": len(refs),
            "lru_hits": lru_hits,
            "opt_hits": opt_hits,
            "gap_fp": (opt_hits - lru_hits) * 1_000_000
            // max(len(refs), 1)}])

    out = ev.groupby("user_id").map_groups(_replay,
                                           batch_format="pandas")
    return out.map_batches(lambda b: pa.table(
        {c: pc.cast(b[c], pa.int64()) for c in
         ("user_id", "n_refs", "lru_hits", "opt_hits", "gap_fp")}),
        batch_format="pyarrow")


# ===================== longest increasing subsequence (patience)


def q_lis_per_user(sf_dir):
    """Longest strictly-increasing subsequence of each user's event
    VALUE sequence (time order), by patience sorting (O(n log n),
    Aldous & Diaconis '99) — the monotone-trend length a sequence
    miner reports, with the pile count = LIS length invariant. The
    in-query certificate checks 1 ≤ LIS ≤ n and that LIS equals the
    number of patience piles built left-to-right.

    Scale plan: sequential per stream → per-user map_groups under the
    user-fits-a-worker contract; per-user state is the O(LIS) pile
    tops (numpy searchsorted per element)."""
    ev = T(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def _lis(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        v = _round_half_away(
            df["value"].to_numpy(np.float64) * 100).astype(np.int64)
        tops: list = []
        for x in v:
            i = int(np.searchsorted(np.asarray(tops), x, side="left"))
            if i == len(tops):
                tops.append(int(x))
            else:
                tops[i] = int(x)
        lis = len(tops)
        assert 1 <= lis <= len(v)
        return pd.DataFrame([{
            "user_id": int(df["user_id"].iloc[0]),
            "n_events": len(v),
            "lis_len": lis,
            "lis_ratio_fp": lis * 1_000_000 // len(v)}])

    out = ev.groupby("user_id").map_groups(_lis, batch_format="pandas")
    return out.map_batches(lambda b: pa.table(
        {c: pc.cast(b[c], pa.int64()) for c in
         ("user_id", "n_events", "lis_len", "lis_ratio_fp")}),
        batch_format="pyarrow")


# ===================== token-bucket rate-limiter replay

TB_RATE_PER_S = 2      # tokens refilled per replay-second
TB_BURST = 5           # bucket capacity
TB_CLOCK_DIV = 2 ** 37  # µs per replay-second (~38 h compressed)


def q_token_bucket_replay(sf_dir):
    """Token-bucket rate limiter replay — the shaping policy behind
    every polite crawler and API gateway (and this engine's own
    per-host frontier): each user's event stream is replayed through
    a (rate=2, burst=5) bucket in exact integer micro-token units on
    a COMPRESSED replay clock (2³⁷ µs ≈ 38 h per replay-second, so a
    multi-month log actually exercises contention; tokens accrue as
    Δt·rate·10⁶ // 2³⁷, capped at burst·10⁶), reporting accepted/
    throttled counts. The shaping GUARANTEE is asserted in-query:
    accepted ≤ burst + ⌈span·rate/2³⁷⌉ for every user — a violated
    bound means the limiter leaks.

    Scale plan: sequential recurrence per stream → per-user
    map_groups (user-fits-a-worker); state is one integer token
    counter."""
    ev = T(sf_dir, "events", ["user_id", "ts", "event_id"])
    cap_u = TB_BURST * 1_000_000

    def _replay(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        t = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        tokens = cap_u
        prev = int(t[0])
        acc = 0
        for ti in t:
            tokens = min(cap_u, tokens + (int(ti) - prev)
                         * TB_RATE_PER_S * 1_000_000 // TB_CLOCK_DIV)
            prev = int(ti)
            if tokens >= 1_000_000:
                tokens -= 1_000_000
                acc += 1
        span_us = int(t[-1]) - int(t[0])
        bound = TB_BURST + (span_us * TB_RATE_PER_S
                            + TB_CLOCK_DIV - 1) // TB_CLOCK_DIV
        assert acc <= bound, "token bucket leaked beyond its guarantee"
        return pd.DataFrame([{
            "user_id": int(df["user_id"].iloc[0]),
            "n_events": len(t),
            "n_accepted": acc,
            "n_throttled": len(t) - acc,
            "accept_bound": bound}])

    out = ev.groupby("user_id").map_groups(_replay,
                                           batch_format="pandas")
    return out.map_batches(lambda b: pa.table(
        {c: pc.cast(b[c], pa.int64()) for c in
         ("user_id", "n_events", "n_accepted", "n_throttled",
          "accept_bound")}), batch_format="pyarrow")


# ===================== Heaps-law vocabulary growth curve


def q_vocab_growth(sf_dir):
    """Heaps'-law vocabulary growth measurement (Heaps '78): distinct
    vocabulary size and running token count after each quarter of the
    corpus (doc_id order) — the V(n) ~ K·n^β curve every tokenizer
    budget and OOV forecast is sized from. The whole curve folds
    through ONE min-doc-per-token groupby: a term enters the
    vocabulary at its FIRST document, so V(prefix k) = |{terms:
    min_doc < k}| — no per-checkpoint distinct pass.

    Scale plan: tokenize map → (term) groupby MIN(doc_id) → a 4-wide
    indicator fold (checkpoint-enum-shaped); token/doc prefix counts
    ride map-side indicator sums. Exchange = vocabulary-shaped once
    (the same contract as term_doc_freq), then constants."""
    import ray.data as rd

    docs = T(sf_dir, "documents", ["doc_id", "text"])
    mx = int(pa.scalar(docs.max("doc_id")).as_py())
    cks = [(mx + 1) * i // 4 for i in (1, 2, 3, 4)]

    def _tok(b: pa.Table) -> pa.Table:
        terms, dids = [], []
        for i, txt in zip(b["doc_id"].to_pylist(),
                          b["text"].to_pylist()):
            toks = _TOKEN.findall(txt.lower())
            terms.extend(toks)
            dids.extend([i] * len(toks))
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc_id": pa.array(
                             np.asarray(dids, np.int64))})

    tok = docs.map_batches(_tok, batch_format="pyarrow")
    mins = fast_groupby_agg(tok, ["term"], {"md": ("doc_id", "min")})

    def _vfold(b: pa.Table) -> pa.Table:
        md = b["md"].to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array([0], pa.int64()),
            **{f"v{i}": pa.array([int((md < k).sum())], pa.int64())
               for i, k in enumerate(cks, 1)}})

    vrow = fast_groupby_agg(
        mins.map_batches(_vfold, batch_format="pyarrow"), ["g"],
        {f"v{i}": (f"v{i}", "sum") for i in (1, 2, 3, 4)}).to_pandas()

    def _tfold(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array([0], pa.int64()),
            **{f"t{i}": pa.array([int((d < k).sum())], pa.int64())
               for i, k in enumerate(cks, 1)}})

    trow = fast_groupby_agg(
        tok.map_batches(_tfold, batch_format="pyarrow"), ["g"],
        {f"t{i}": (f"t{i}", "sum") for i in (1, 2, 3, 4)}).to_pandas()

    def _dfold(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array([0], pa.int64()),
            **{f"d{i}": pa.array([int((d < k).sum())], pa.int64())
               for i, k in enumerate(cks, 1)}})

    drow = fast_groupby_agg(
        docs.select_columns(["doc_id"]).map_batches(
            _dfold, batch_format="pyarrow"), ["g"],
        {f"d{i}": (f"d{i}", "sum") for i in (1, 2, 3, 4)}).to_pandas()

    return rd.from_arrow(pa.table({
        "checkpoint": pa.array(cks, pa.int64()),
        "n_docs": pa.array([int(drow[f"d{i}"][0])
                            for i in (1, 2, 3, 4)], pa.int64()),
        "n_tokens": pa.array([int(trow[f"t{i}"][0])
                              for i in (1, 2, 3, 4)], pa.int64()),
        "vocab_size": pa.array([int(vrow[f"v{i}"][0])
                                for i in (1, 2, 3, 4)], pa.int64())}))


ORACLES["vocab_growth"] = """
    WITH arr AS (
        SELECT doc_id,
               string_split_regex(lower(text), '[^a-z0-9_]+') AS a
        FROM documents),
    tok AS (
        SELECT doc_id, a[i] AS tok
        FROM arr, UNNEST(generate_series(1, len(a))) AS g(i)
        WHERE a[i] <> ''),
    mn AS (SELECT tok, min(doc_id) AS md FROM tok GROUP BY tok),
    ck AS (SELECT i, (SELECT max(doc_id) + 1 FROM documents) * i // 4
                  AS k
           FROM (SELECT unnest([1, 2, 3, 4]) AS i))
    SELECT CAST(ck.k AS BIGINT) AS checkpoint,
           (SELECT CAST(count(*) AS BIGINT) FROM documents d
            WHERE d.doc_id < ck.k) AS n_docs,
           (SELECT CAST(count(*) AS BIGINT) FROM tok t
            WHERE t.doc_id < ck.k) AS n_tokens,
           (SELECT CAST(count(*) AS BIGINT) FROM mn
            WHERE mn.md < ck.k) AS vocab_size
    FROM ck
"""


# ===================== Markov next-event prediction accuracy


def q_markov_next_accuracy(sf_dir):
    """First-order Markov next-event prediction accuracy — the
    standard baseline eval for sequence models: fit argmax(P(next |
    cur)) on the full transition table (max count, ties to the
    lexicographically smallest next event, pinned on both sides) and
    score it on every transition. Output per current event type:
    transitions seen, hits, accuracy ×1e6 — plus the majority-class
    comparison a model must beat.

    Scale plan: q_event_transitions' pair plan (one user partition,
    vectorized shift, (prev,next,n)-triple exchange) feeds an
    enum×enum transition table; the predictor broadcasts as an
    enum-sized dict into a second pass over the SAME pair triples —
    scoring is count arithmetic on the table itself, so NO second
    scan of the events is needed."""
    trans = q_event_transitions(sf_dir).to_pandas()
    # argmax next per prev: max n, tie → smallest next_event
    t = trans.sort_values(["prev_event", "n", "next_event"],
                          ascending=[True, False, True])
    pred = t.drop_duplicates("prev_event").set_index(
        "prev_event")["next_event"].to_dict()
    rows = []
    for prev, grp in trans.groupby("prev_event"):
        n = int(grp["n"].sum())
        hits = int(grp.loc[grp["next_event"] == pred[prev], "n"].sum())
        rows.append((prev, pred[prev], n, hits,
                     hits * 1_000_000 // n))
    rows.sort()
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "prev_event": pa.array([r[0] for r in rows], pa.string()),
        "predicted_next": pa.array([r[1] for r in rows], pa.string()),
        "n_transitions": pa.array([r[2] for r in rows], pa.int64()),
        "n_hits": pa.array([r[3] for r in rows], pa.int64()),
        "accuracy_fp": pa.array([r[4] for r in rows], pa.int64())}))


ORACLES["markov_next_accuracy"] = """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events),
    tr AS (SELECT event_type AS prev_event, nxt AS next_event,
                  count(*) AS n
           FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
    pr AS (SELECT prev_event, next_event AS predicted_next
           FROM (SELECT *, row_number() OVER (
                     PARTITION BY prev_event
                     ORDER BY n DESC, next_event) AS rk FROM tr)
           WHERE rk = 1)
    SELECT tr.prev_event, pr.predicted_next,
           CAST(sum(tr.n) AS BIGINT) AS n_transitions,
           CAST(sum(CASE WHEN tr.next_event = pr.predicted_next
                         THEN tr.n ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(sum(CASE WHEN tr.next_event = pr.predicted_next
                         THEN tr.n ELSE 0 END) * 1000000
                // sum(tr.n) AS BIGINT) AS accuracy_fp
    FROM tr JOIN pr ON pr.prev_event = tr.prev_event
    GROUP BY 1, 2
"""


# ===================== exact weighted Jaccard between sources

WJ_SOURCES = 5  # the lexicographically-first K sources


def q_weighted_jaccard_sources(sf_dir):
    """Exact weighted Jaccard J_W(A,B) = Σ_t min(a_t, b_t) / Σ_t
    max(a_t, b_t) between the token-frequency vectors of the 5
    lexicographically-first sources — the ground truth that consistent
    weighted sampling (ICWS) sketches approximate, computed exactly so
    sketch-based dedup thresholds can be calibrated per corpus. All 10
    pairs ×1e9 integer.

    Scale plan: ONE vocabulary-shaped groupby pivots tokens to a
    K-wide count layout (K a constant); per-token pairwise min/max
    contributions fold vectorized into a 10-row partial per block —
    the pair sums exchange as 10×2 ints, the vocabulary never leaves
    the groupby."""
    import itertools

    import ray.data as rd

    docs = T(sf_dir, "documents", ["doc_id", "text", "source"])
    srcs = sorted(fast_groupby_agg(
        docs.select_columns(["source"]), ["source"],
        {"_n": (None, "count")}).to_pandas()["source"])[:WJ_SOURCES]
    sidx = {s: i for i, s in enumerate(srcs)}
    pairs = list(itertools.combinations(range(WJ_SOURCES), 2))

    def _tok(b: pa.Table) -> pa.Table:
        terms, cols = [], {i: [] for i in range(WJ_SOURCES)}
        for txt, src in zip(b["text"].to_pylist(),
                            b["source"].to_pylist()):
            if src not in sidx:
                continue
            i = sidx[src]
            for t in _TOKEN.findall(txt.lower()):
                terms.append(t)
                for j in range(WJ_SOURCES):
                    cols[j].append(1 if j == i else 0)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            **{f"c{j}": pa.array(np.asarray(cols[j], np.int64))
               for j in range(WJ_SOURCES)}})

    wide = fast_groupby_agg(
        docs.map_batches(_tok, batch_format="pyarrow"), ["term"],
        {f"c{j}": (f"c{j}", "sum") for j in range(WJ_SOURCES)})

    def _fold(b: pa.Table) -> pa.Table:
        c = np.stack([b[f"c{j}"].to_numpy(zero_copy_only=False)
                      for j in range(WJ_SOURCES)], axis=1) \
            if b.num_rows else np.zeros((0, WJ_SOURCES), np.int64)
        rows = {"pid": pa.array(np.arange(len(pairs)), pa.int64())}
        mins = [int(np.minimum(c[:, a], c[:, b_]).sum())
                for a, b_ in pairs]
        maxs = [int(np.maximum(c[:, a], c[:, b_]).sum())
                for a, b_ in pairs]
        rows["mn"] = pa.array(mins, pa.int64())
        rows["mx"] = pa.array(maxs, pa.int64())
        return pa.table(rows)

    agg = fast_groupby_agg(
        wide.map_batches(_fold, batch_format="pyarrow"), ["pid"],
        {"mn": ("mn", "sum"), "mx": ("mx", "sum")}).to_pandas() \
        .sort_values("pid").reset_index(drop=True)
    return rd.from_arrow(pa.table({
        "src_a": pa.array([srcs[pairs[int(p)][0]]
                           for p in agg["pid"]], pa.string()),
        "src_b": pa.array([srcs[pairs[int(p)][1]]
                           for p in agg["pid"]], pa.string()),
        "inter_w": pa.array(agg["mn"].astype(np.int64), pa.int64()),
        "union_w": pa.array(agg["mx"].astype(np.int64), pa.int64()),
        "wjaccard_fp": pa.array(
            [int(m) * 1_000_000_000 // max(int(x), 1)
             for m, x in zip(agg["mn"], agg["mx"])], pa.int64())}))


def _wjaccard_oracle() -> str:
    import itertools

    sums = ",\n               ".join(
        f"sum(CASE WHEN source = s.s{j} THEN 1 ELSE 0 END) AS c{j}"
        for j in range(WJ_SOURCES))
    pair_rows = " UNION ALL ".join(
        f"SELECT s.s{a} AS src_a, s.s{b} AS src_b, "
        f"sum(least(c{a}, c{b})) AS mn, "
        f"sum(greatest(c{a}, c{b})) AS mx FROM w, s GROUP BY 1, 2"
        for a, b in itertools.combinations(range(WJ_SOURCES), 2))
    src_cols = ", ".join(
        f"(SELECT source FROM srcs WHERE rk = {j + 1}) AS s{j}"
        for j in range(WJ_SOURCES))
    return f"""
    WITH srcs AS (
        SELECT source, row_number() OVER (ORDER BY source) AS rk
        FROM (SELECT DISTINCT source FROM documents)
        ORDER BY source LIMIT {WJ_SOURCES}),
    s AS (SELECT {src_cols}),
    arr AS (
        SELECT source,
               string_split_regex(lower(text), '[^a-z0-9_]+') AS a
        FROM documents
        WHERE source IN (SELECT source FROM srcs)),
    tok AS (
        SELECT source, a[i] AS tok
        FROM arr, UNNEST(generate_series(1, len(a))) AS g(i)
        WHERE a[i] <> ''),
    w AS (
        SELECT tok,
               {sums}
        FROM tok, s GROUP BY tok)
    SELECT src_a, src_b,
           CAST(mn AS BIGINT) AS inter_w,
           CAST(mx AS BIGINT) AS union_w,
           CAST(mn * 1000000000 // greatest(mx, 1) AS BIGINT)
               AS wjaccard_fp
    FROM ({pair_rows})
    """


ORACLES["weighted_jaccard_sources"] = _wjaccard_oracle()


# ===================== odds-ratio keyword extraction (corpus compare)

OR_MIN_COUNT = 5   # combined count floor
OR_TOP_K = 10


def q_odds_ratio_keywords(sf_dir):
    """Corpus-comparison keyword extraction by smoothed odds ratio
    (the count half of Monroe et al.'s "Fightin' Words"): which tokens
    most distinguish the lexicographically FIRST source from the
    SECOND? OR(t) = (a+1)(d+1) / (b+1)(c+1) over the 2×2 token-vs-rest
    table, Haldane–Anscombe +1 smoothed, ×1e6 integer — the marker-
    token report behind contamination triage and source fingerprinting.
    Top-10 by (OR desc, token asc), combined count ≥ 5.

    Scale plan: one vocabulary-shaped (token, src) pivot groupby with
    map-side partials; corpus totals are two ints; ranking is a
    global top-k (sort+limit on the vocabulary-shaped score table,
    the engine's standard small-k path)."""
    docs = T(sf_dir, "documents", ["text", "source"])
    srcs = sorted(fast_groupby_agg(
        docs.select_columns(["source"]), ["source"],
        {"_n": (None, "count")}).to_pandas()["source"])[:2]
    sa, sb = srcs[0], srcs[1]

    def _tok(b: pa.Table) -> pa.Table:
        terms, ca, cb = [], [], []
        for txt, src in zip(b["text"].to_pylist(),
                            b["source"].to_pylist()):
            if src != sa and src != sb:
                continue
            ia = 1 if src == sa else 0
            for t in _TOKEN.findall(txt.lower()):
                terms.append(t)
                ca.append(ia)
                cb.append(1 - ia)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "a": pa.array(np.asarray(ca, np.int64)),
            "b": pa.array(np.asarray(cb, np.int64))})

    counts = fast_groupby_agg(
        docs.map_batches(_tok, batch_format="pyarrow"), ["term"],
        {"a": ("a", "sum"), "b": ("b", "sum")})
    tot = fast_groupby_agg(counts.map_batches(
        lambda t: pa.table({
            "g": pa.array([0], pa.int64()),
            "ta": pa.array([int(pc.sum(t["a"]).as_py() or 0)],
                           pa.int64()),
            "tb": pa.array([int(pc.sum(t["b"]).as_py() or 0)],
                           pa.int64())}), batch_format="pyarrow",
        batch_size=None), ["g"],
        {"ta": ("ta", "sum"), "tb": ("tb", "sum")}).to_pandas()
    ta, tb = int(tot["ta"][0]), int(tot["tb"][0])

    def _score(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        keep = (a + b) >= OR_MIN_COUNT
        a, b = a[keep], b[keep]
        terms = t["term"].filter(pa.array(keep))
        c, d = ta - a, tb - b
        # exact arbitrary-precision ratio (r4, ADVICE): (a+1)(d+1)·1e6
        # reaches ~2.5e19 > 2^63 at sf≥1 (d+1 ≤ corpus tokens), where
        # numpy int64 would wrap silently while the DuckDB oracle
        # promotes to HUGEINT. The stage is vocabulary-shaped, so a
        # Python-int loop is bounded; fail fast if the RESULT overflows
        # its int64 output column instead of wrapping.
        or_fp = [
            ((int(ai) + 1) * (int(di) + 1) * 1_000_000)
            // ((int(bi) + 1) * (int(ci) + 1))
            for ai, bi, ci, di in zip(a, b, c, d)
        ]
        if or_fp and max(or_fp) > (1 << 63) - 1:
            raise ValueError(
                "odds_ratio_keywords: or_fp exceeds int64 "
                f"(max {max(or_fp)}); lower the 1e6 scale or raise "
                "OR_MIN_COUNT for this corpus")
        return pa.table({"term": terms,
                         "a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "or_fp": pa.array(or_fp, pa.int64())})

    scored = counts.map_batches(_score, batch_format="pyarrow")
    neg = scored.map_batches(lambda t: t.append_column(
        "nor", pc.negate(t["or_fp"])), batch_format="pyarrow")
    return neg.sort(["nor", "term"]).limit(OR_TOP_K) \
        .drop_columns(["nor"])


ORACLES["odds_ratio_keywords"] = f"""
    WITH s2 AS (
        SELECT source, row_number() OVER (ORDER BY source) AS rk
        FROM (SELECT DISTINCT source FROM documents)
        ORDER BY source LIMIT 2),
    arr AS (
        SELECT d.source, string_split_regex(lower(d.text),
               '[^a-z0-9_]+') AS a
        FROM documents d
        WHERE d.source IN (SELECT source FROM s2)),
    tok AS (
        SELECT source, a[i] AS tok
        FROM arr, UNNEST(generate_series(1, len(a))) AS g(i)
        WHERE a[i] <> ''),
    c AS (
        SELECT tok AS term,
               sum(CASE WHEN source = (SELECT source FROM s2
                                       WHERE rk = 1)
                        THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN source = (SELECT source FROM s2
                                       WHERE rk = 2)
                        THEN 1 ELSE 0 END) AS b
        FROM tok GROUP BY tok),
    t AS (SELECT sum(a) AS ta, sum(b) AS tb FROM c)
    SELECT term, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST((a + 1) * (t.tb - b + 1) * 1000000
                // ((b + 1) * (t.ta - a + 1)) AS BIGINT) AS or_fp
    FROM c, t
    WHERE a + b >= {OR_MIN_COUNT}
    ORDER BY or_fp DESC, term LIMIT {OR_TOP_K}
"""


# ===================== content-defined chunking dedup (CDC)

CDC_WINDOW = 16     # rolling-hash window bytes
CDC_MASK = 63       # 6-bit mask → ~64-byte average chunks
CDC_BASE = np.uint64(257)


def q_cdc_chunk_dedup(sf_dir):
    """Content-defined chunking (the LBFS cut-point scheme,
    Muthitacharoen et al. SOSP'01): each document's bytes are cut
    where a 16-byte Karp–Rabin rolling hash satisfies a 6-bit mask —
    so an insertion shifts ONE chunk instead of re-aligning the whole
    file — and chunks dedup globally by content hash. The backbone of
    backup dedup and of long-document near-dup splitting. Output:
    corpus totals (docs, chunks, distinct chunks, bytes, distinct
    bytes) and the byte dedup ratio ×1e6. The reassembly invariant
    (Σ chunk lens = doc bytes) is ASSERTED in-query per document.

    Scale plan: chunking is one vectorized map (the window hash is 16
    shifted multiply-adds in wrapping uint64 — no per-byte python);
    the exchange is chunk-hash-shaped (≈ bytes/64 rows) into ONE
    (hash → count, len) groupby, then constant-width count folds."""
    import ray.data as rd

    P = CDC_BASE ** np.arange(CDC_WINDOW - 1, -1, -1, dtype=np.uint64)

    def _chunks(b: pa.Table) -> pa.Table:
        hs, ls = [], []
        for txt in b["text"].to_pylist():
            data = txt.encode("utf-8", "surrogatepass")
            n = len(data)
            arr = np.frombuffer(data, np.uint8).astype(np.uint64)
            if n >= CDC_WINDOW:
                h = np.zeros(n - CDC_WINDOW + 1, np.uint64)
                for k in range(CDC_WINDOW):
                    h += arr[k:n - CDC_WINDOW + 1 + k] * P[k]
                # boundary AFTER the window's last byte
                cuts = np.flatnonzero(
                    (h & np.uint64(CDC_MASK)) == 0) + CDC_WINDOW
                cuts = cuts[cuts < n]
            else:
                cuts = np.zeros(0, np.int64)
            bounds = np.concatenate([[0], cuts, [n]]).astype(np.int64)
            lens = np.diff(bounds)
            assert int(lens.sum()) == n, "CDC reassembly broken"
            for s0, e0 in zip(bounds[:-1], bounds[1:]):
                hs.append(hashlib.md5(data[s0:e0]).hexdigest())
                ls.append(int(e0 - s0))
        return pa.table({"h": pa.array(hs, pa.string()),
                         "ln": pa.array(np.asarray(ls, np.int64))})

    docs = T(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()
    per_hash = fast_groupby_agg(
        docs.map_batches(_chunks, batch_format="pyarrow"), ["h"],
        {"cnt": (None, "count"), "ln": ("ln", "min")})

    def _fold(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        ln = t["ln"].to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "n_chunks": pa.array([int(cnt.sum())], pa.int64()),
            "n_distinct": pa.array([t.num_rows], pa.int64()),
            "bytes_total": pa.array([int((cnt * ln).sum())], pa.int64()),
            "bytes_distinct": pa.array([int(ln.sum())], pa.int64())})

    tot = fast_groupby_agg(
        per_hash.map_batches(_fold, batch_format="pyarrow",
                             batch_size=None), ["g"],
        {c: (c, "sum") for c in ("n_chunks", "n_distinct",
                                 "bytes_total", "bytes_distinct")}) \
        .to_pandas()
    bt, bd = int(tot["bytes_total"][0]), int(tot["bytes_distinct"][0])
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_chunks": pa.array([int(tot["n_chunks"][0])], pa.int64()),
        "n_distinct_chunks": pa.array([int(tot["n_distinct"][0])],
                                      pa.int64()),
        "bytes_total": pa.array([bt], pa.int64()),
        "bytes_distinct": pa.array([bd], pa.int64()),
        "dedup_ratio_fp": pa.array(
            [bd * 1_000_000 // max(bt, 1)], pa.int64())}))


# ===================== distributed convex hull (monotone chain)


def _hull_monotone(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain on int64 (x, y) rows — strict turns
    (collinear points dropped), CCW order starting at the
    lexicographic minimum. Exact integer cross products."""
    pts = np.unique(pts, axis=0)  # lexicographic sort + dedup
    if len(pts) <= 2:
        return pts

    def half(seq):
        out: list = []
        for p in seq:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) \
                        <= 0:
                    out.pop()
                else:
                    break
            out.append((int(p[0]), int(p[1])))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1], np.int64)


def q_convex_hull(sf_dir):
    """Distributed convex hull of the per-customer (total spend,
    order count) cloud — the exact frontier that dominates every
    skyline/efficiency question about the population. The hull is a
    MERGEABLE summary: hull(A ∪ B) = hull(hull(A) ∪ hull(B)), so each
    block reduces to its own (tiny) hull and one final task merges the
    block hulls — the textbook distributed geometry plan, all in exact
    int64 cross products. The certificate is ASSERTED in-query: every
    per-block hull vertex lies inside-or-on the final hull (left-of
    every CCW edge), so a wrong merge fails the query itself.

    Scale plan: one groupby builds the point cloud; per-block hulls
    (batch_size=None) bound the exchange at O(blocks × hull size);
    the merge task sees candidate points only."""
    import ray.data as rd

    pts_ds = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        ["o_custkey"], {"spend": ("o_totalprice", "sum"),
                        "n_orders": (None, "count")})

    def _to_int(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pa.array(_round_half_away(
                b["spend"].to_numpy(zero_copy_only=False)
                .astype(np.float64) * 100).astype(np.int64)),
            "y": pc.cast(b["n_orders"], pa.int64())})

    def _block_hull(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        h = _hull_monotone(np.stack(
            [b["x"].to_numpy(zero_copy_only=False),
             b["y"].to_numpy(zero_copy_only=False)], axis=1))
        return pa.table({"x": pa.array(h[:, 0], pa.int64()),
                         "y": pa.array(h[:, 1], pa.int64())})

    cand = pts_ds.map_batches(_to_int, batch_format="pyarrow") \
        .map_batches(_block_hull, batch_format="pyarrow",
                     batch_size=None).to_pandas()
    pts = np.stack([cand["x"].to_numpy(np.int64),
                    cand["y"].to_numpy(np.int64)], axis=1)
    hull = _hull_monotone(pts)
    # certificate: every candidate inside-or-on every CCW hull edge
    if len(hull) >= 3:
        for i in range(len(hull)):
            ax, ay = hull[i]
            bx, by = hull[(i + 1) % len(hull)]
            cross = ((bx - ax) * (pts[:, 1] - ay)
                     - (by - ay) * (pts[:, 0] - ax))
            assert (cross >= 0).all(), "hull certificate violated"
    return rd.from_arrow(pa.table({
        "pos": pa.array(np.arange(len(hull)), pa.int64()),
        "x": pa.array(hull[:, 0], pa.int64()),
        "y": pa.array(hull[:, 1], pa.int64())}))


# ===================== Elias-gamma posting-list compression audit

_POW2 = 2 ** np.arange(1, 63, dtype=np.int64)


def _gamma_bits(x: np.ndarray) -> np.ndarray:
    """Elias-gamma code length 2⌊log2 x⌋+1 for x ≥ 1, exact via a
    power-of-two searchsorted (no float log)."""
    return 2 * np.searchsorted(_POW2, x, side="right") + 1


def q_gamma_index_audit(sf_dir):
    """Inverted-index compression audit with Elias-gamma gap coding
    (Witten–Moffat–Bell, "Managing Gigabytes"): every term's posting
    list is delta-coded (first id as γ(id+1), then γ(gap)) and the
    exact total code length is compared against 32-bit fixed postings
    — the storage model behind every IR index and many lakehouse
    secondary indexes. γ length 2⌊log2 x⌋+1 is computed by integer
    power-of-two search on BOTH sides (length(bin(x))−1 in SQL), so
    the audit is bitwise.

    Scale plan: distinct (term, doc_id) postings from one groupby →
    ONE range-partitioned sort; each block codes its own gaps
    vectorized and ships a header (first/last term+doc, pending first
    row) — q_encoding_audit's exact-distributed-LAG machinery — and a
    block-count-shaped stitch codes the boundary gaps. Exchange = the
    sort, then constants."""
    import ray.data as rd

    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _tok(b: pa.Table) -> pa.Table:
        terms, dids = [], []
        for i, txt in zip(b["doc_id"].to_pylist(),
                          b["text"].to_pylist()):
            for t in set(_TOKEN.findall(txt.lower())):
                terms.append(t)
                dids.append(i)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc_id": pa.array(
                             np.asarray(dids, np.int64))})

    post = fast_groupby_agg(
        docs.map_batches(_tok, batch_format="pyarrow"),
        ["term", "doc_id"], {"_n": (None, "count")}) \
        .select_columns(["term", "doc_id"]) \
        .sort(["term", "doc_id"]).materialize()

    def _block(b: pa.Table) -> pa.Table:
        cols = {"ft": pa.array([], pa.string()),
                "fd": pa.array([], pa.int64()),
                "lt": pa.array([], pa.string()),
                "ld": pa.array([], pa.int64()),
                "inner_bits": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
                "n_terms_started": pa.array([], pa.int64())}
        if b.num_rows == 0:
            return pa.table(cols)
        t = np.asarray(b["term"].to_pylist(), object)
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        bits = 0
        starts = 0
        if len(t) > 1:
            same = t[1:] == t[:-1]
            gaps = d[1:] - d[:-1]
            bits += int(_gamma_bits(gaps[same]).sum())
            bits += int(_gamma_bits(d[1:][~same] + 1).sum())
            starts += int((~same).sum())
        return pa.table({
            "ft": pa.array([str(t[0])]), "fd": pa.array([int(d[0])]),
            "lt": pa.array([str(t[-1])]), "ld": pa.array([int(d[-1])]),
            "inner_bits": pa.array([bits], pa.int64()),
            "n_rows": pa.array([b.num_rows], pa.int64()),
            "n_terms_started": pa.array([starts], pa.int64())})

    hdr = post.map_batches(_block, batch_format="pyarrow",
                           batch_size=None).to_pandas() \
        .sort_values(["ft", "fd"]).reset_index(drop=True)
    total_bits = int(hdr["inner_bits"].sum())
    n_post = int(hdr["n_rows"].sum())
    n_terms = int(hdr["n_terms_started"].sum())
    prev_t = prev_d = None
    for _, row in hdr.iterrows():  # block-count-shaped stitch
        if prev_t is not None and row["ft"] == prev_t:
            total_bits += int(_gamma_bits(
                np.asarray([row["fd"] - prev_d]))[0])
        else:
            total_bits += int(_gamma_bits(
                np.asarray([row["fd"] + 1]))[0])
            n_terms += 1
        prev_t, prev_d = row["lt"], int(row["ld"])
    fixed = 32 * n_post
    return rd.from_arrow(pa.table({
        "n_terms": pa.array([n_terms], pa.int64()),
        "n_postings": pa.array([n_post], pa.int64()),
        "gamma_bits": pa.array([total_bits], pa.int64()),
        "fixed32_bits": pa.array([fixed], pa.int64()),
        "ratio_fp": pa.array(
            [total_bits * 1_000_000 // max(fixed, 1)], pa.int64())}))


ORACLES["gamma_index_audit"] = """
    WITH arr AS (
        SELECT doc_id,
               string_split_regex(lower(text), '[^a-z0-9_]+') AS a
        FROM documents),
    tok AS (
        SELECT doc_id, a[i] AS tok
        FROM arr, UNNEST(generate_series(1, len(a))) AS g(i)
        WHERE a[i] <> ''),
    p AS (SELECT DISTINCT tok AS term, doc_id FROM tok),
    l AS (SELECT term, doc_id,
                 lag(doc_id) OVER (PARTITION BY term
                                   ORDER BY doc_id) AS pd
          FROM p),
    bts AS (SELECT CASE WHEN pd IS NULL
                 THEN 2 * (length(bin(doc_id + 1)) - 1) + 1
                 ELSE 2 * (length(bin(doc_id - pd)) - 1) + 1
            END AS bits FROM l)
    SELECT (SELECT CAST(count(DISTINCT term) AS BIGINT) FROM p)
               AS n_terms,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_postings,
           CAST(sum(bits) AS BIGINT) AS gamma_bits,
           (SELECT CAST(32 * count(*) AS BIGINT) FROM p)
               AS fixed32_bits,
           CAST(sum(bits) * 1000000
                // greatest((SELECT 32 * count(*) FROM p), 1)
                AS BIGINT) AS ratio_fp
    FROM bts
"""


# ===================== Simpson's-paradox audit


def q_simpsons_paradox_audit(sf_dir):
    """Simpson's-paradox audit (Simpson '51): compare the fulfilled-
    order rate between the two lexicographically-first market segments
    GLOBALLY and WITHIN every nation, with every direction decided by
    exact integer cross-multiplication (f₁n₂ vs f₂n₁ — no rate
    division, no float) — the aggregation-reversal check any cohort
    or A/B readout should run before trusting a pooled number.
    Output: the global direction, nations compared, how many agree /
    oppose / tie, and the full-reversal flag (every within-nation
    direction strictly opposite to the pooled one).

    Scale plan: one orders⋈customer partitioned join feeds a
    (nation, segment) count groupby — enum×enum-shaped; all direction
    logic runs on that table."""
    import ray.data as rd

    cust = T(sf_dir, "customer",
             ["c_custkey", "c_nationkey", "c_mktsegment"])
    segs = sorted(fast_groupby_agg(
        cust.select_columns(["c_mktsegment"]), ["c_mktsegment"],
        {"_n": (None, "count")}).to_pandas()["c_mktsegment"])[:2]
    s1, s2 = segs

    orders = T(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    j = orders.join(cust, "inner", num_partitions=JOIN_PARTS,
                    on=("o_custkey",), right_on=("c_custkey",))

    def _cells(b: pa.Table) -> pa.Table:
        seg = np.asarray(b["c_mktsegment"].to_pylist(), object)
        keep = (seg == s1) | (seg == s2)
        nk = b["c_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        st = np.asarray(b["o_orderstatus"].to_pylist(), object)[keep]
        sg = (seg[keep] == s1).astype(np.int64)
        return pa.table({
            "nation": pa.array(nk),
            "is_s1": pa.array(sg),
            "one": pa.array(np.ones(len(nk), np.int64)),
            "f": pa.array((st == "F").astype(np.int64))})

    cells = fast_groupby_agg(
        j.map_batches(_cells, batch_format="pyarrow"),
        ["nation", "is_s1"],
        {"n": ("one", "sum"), "nf": ("f", "sum")}).to_pandas()
    piv = cells.pivot_table(index="nation", columns="is_s1",
                            values=["n", "nf"], fill_value=0)
    g_n1 = int(cells.loc[cells["is_s1"] == 1, "n"].sum())
    g_f1 = int(cells.loc[cells["is_s1"] == 1, "nf"].sum())
    g_n2 = int(cells.loc[cells["is_s1"] == 0, "n"].sum())
    g_f2 = int(cells.loc[cells["is_s1"] == 0, "nf"].sum())
    g_dir = int(np.sign(g_f1 * g_n2 - g_f2 * g_n1))
    n_pos = n_neg = n_zero = n_nations = 0
    for nation in piv.index:
        n1 = int(piv.loc[nation, ("n", 1)]) if ("n", 1) in piv else 0
        n2 = int(piv.loc[nation, ("n", 0)]) if ("n", 0) in piv else 0
        if n1 == 0 or n2 == 0:
            continue  # both segments must be present to compare
        f1 = int(piv.loc[nation, ("nf", 1)])
        f2 = int(piv.loc[nation, ("nf", 0)])
        d = int(np.sign(f1 * n2 - f2 * n1))
        n_nations += 1
        n_pos += d > 0
        n_neg += d < 0
        n_zero += d == 0
    opposite = n_neg if g_dir > 0 else (n_pos if g_dir < 0 else 0)
    flag = int(g_dir != 0 and n_nations > 0 and opposite == n_nations)
    return rd.from_arrow(pa.table({
        "global_dir": pa.array([g_dir], pa.int64()),
        "n_nations": pa.array([n_nations], pa.int64()),
        "n_agree": pa.array(
            [n_pos if g_dir > 0 else (n_neg if g_dir < 0 else n_zero)],
            pa.int64()),
        "n_oppose": pa.array([opposite], pa.int64()),
        "n_tie": pa.array([n_zero if g_dir != 0 else 0], pa.int64()),
        "full_reversal": pa.array([flag], pa.int64())}))


ORACLES["simpsons_paradox_audit"] = """
    WITH s2 AS (
        SELECT c_mktsegment AS seg,
               row_number() OVER (ORDER BY c_mktsegment) AS rk
        FROM (SELECT DISTINCT c_mktsegment FROM customer)
        ORDER BY c_mktsegment LIMIT 2),
    base AS (
        SELECT c.c_nationkey AS nation,
               CASE WHEN c.c_mktsegment =
                    (SELECT seg FROM s2 WHERE rk = 1)
                    THEN 1 ELSE 0 END AS is_s1,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS f
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN (SELECT seg FROM s2)),
    g AS (
        SELECT sum(CASE WHEN is_s1 = 1 THEN f ELSE 0 END) AS f1,
               sum(CASE WHEN is_s1 = 1 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN is_s1 = 0 THEN f ELSE 0 END) AS f2,
               sum(CASE WHEN is_s1 = 0 THEN 1 ELSE 0 END) AS n2
        FROM base),
    gd AS (SELECT sign(f1 * n2 - f2 * n1) AS d FROM g),
    per AS (
        SELECT nation,
               sum(CASE WHEN is_s1 = 1 THEN f ELSE 0 END) AS f1,
               sum(CASE WHEN is_s1 = 1 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN is_s1 = 0 THEN f ELSE 0 END) AS f2,
               sum(CASE WHEN is_s1 = 0 THEN 1 ELSE 0 END) AS n2
        FROM base GROUP BY nation),
    dirs AS (
        SELECT sign(f1 * n2 - f2 * n1) AS d FROM per
        WHERE n1 > 0 AND n2 > 0),
    agg AS (
        SELECT count(*) AS n_nations,
               count(*) FILTER (WHERE d > 0) AS n_pos,
               count(*) FILTER (WHERE d < 0) AS n_neg,
               count(*) FILTER (WHERE d = 0) AS n_zero
        FROM dirs)
    SELECT CAST(gd.d AS BIGINT) AS global_dir,
           CAST(agg.n_nations AS BIGINT) AS n_nations,
           CAST(CASE WHEN gd.d > 0 THEN agg.n_pos
                     WHEN gd.d < 0 THEN agg.n_neg
                     ELSE agg.n_zero END AS BIGINT) AS n_agree,
           CAST(CASE WHEN gd.d > 0 THEN agg.n_neg
                     WHEN gd.d < 0 THEN agg.n_pos
                     ELSE 0 END AS BIGINT) AS n_oppose,
           CAST(CASE WHEN gd.d <> 0 THEN agg.n_zero
                     ELSE 0 END AS BIGINT) AS n_tie,
           CAST(CASE WHEN gd.d <> 0 AND agg.n_nations > 0
                     AND (CASE WHEN gd.d > 0 THEN agg.n_neg
                               ELSE agg.n_pos END) = agg.n_nations
                     THEN 1 ELSE 0 END AS BIGINT) AS full_reversal
    FROM gd, agg
"""


# ===================== submodular max-coverage (greedy + exact OPT)

MAXCOV_K = 3


def q_max_coverage_greedy(sf_dir):
    """Submodular maximum-coverage source selection (Nemhauser-
    Wolsey-Fisher '78): pick K=3 sources maximizing distinct
    3-token-shingle coverage (the synthetic corpus shares one small
    word pool, so single tokens saturate — shingles carry the real
    source-specific phrasing). Greedy is run exactly, the true optimum is computed by
    full subset enumeration, and the k-round greedy guarantee
    greedy ≥ (1 − (1−1/k)^k)·OPT — the RATIONAL form 27·greedy ≥
    19·OPT at k=3 — is ASSERTED in-query in pure integers. This is
    the data-curation "which sources buy the most new vocabulary"
    selector with its approximation bound machine-checked per run.

    Scale plan: ONE vocabulary-shaped groupby folds each token to a
    20-bit source MASK; coverage of ANY subset is then a sum over the
    (distinct-mask → count) table, which is at most min(vocab, 2^20)
    rows and in practice tiny — greedy and the C(20,3) enumeration
    both run on that table in a constant fold, never on the corpus."""
    import itertools

    import ray.data as rd

    docs = T(sf_dir, "documents", ["text", "source"])
    srcs = sorted(fast_groupby_agg(
        docs.select_columns(["source"]), ["source"],
        {"_n": (None, "count")}).to_pandas()["source"])
    sidx = {s: i for i, s in enumerate(srcs)}
    n_src = len(srcs)

    def _tok(b: pa.Table) -> pa.Table:
        terms, masks = [], []
        for txt, src in zip(b["text"].to_pylist(),
                            b["source"].to_pylist()):
            m = 1 << sidx[src]
            toks = _TOKEN.findall(txt.lower())
            for sh in {" ".join(toks[i:i + 3])
                       for i in range(len(toks) - 2)}:
                terms.append(sh)
                masks.append(m)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "mask": pa.array(
                             np.asarray(masks, np.int64))})

    # Arrow groupby lacks a bit-or aggregate: fold masks via SUM of
    # distinct (term, src-bit) rows instead — exact because each bit
    # appears at most once per term after the distinct.
    per_bit = fast_groupby_agg(
        docs.map_batches(_tok, batch_format="pyarrow"),
        ["term", "mask"], {"_n": (None, "count")})
    tok_masks = fast_groupby_agg(
        per_bit.select_columns(["term", "mask"]), ["term"],
        {"mask": ("mask", "sum")})
    mask_counts = fast_groupby_agg(
        tok_masks.select_columns(["mask"]), ["mask"],
        {"cnt": (None, "count")}).to_pandas()
    mk = mask_counts["mask"].to_numpy(np.int64)
    ct = mask_counts["cnt"].to_numpy(np.int64)

    def cov(subset_mask: int) -> int:
        return int(ct[(mk & subset_mask) != 0].sum())

    # greedy, ties to the lexicographically-smallest source
    chosen = 0
    picks = []
    for _ in range(MAXCOV_K):
        best = max(range(n_src),
                   key=lambda i: (cov(chosen | (1 << i))
                                  if not chosen & (1 << i) else -1,
                                  -i))
        chosen |= 1 << best
        picks.append(srcs[best])
    greedy = cov(chosen)
    opt = max(cov(sum(1 << i for i in sub)) for sub in
              itertools.combinations(range(n_src), MAXCOV_K))
    assert 27 * greedy >= 19 * opt, \
        "greedy max-coverage guarantee violated"
    total_vocab = int(ct.sum())
    return rd.from_arrow(pa.table({
        "picks": pa.array([",".join(picks)], pa.string()),
        "greedy_coverage": pa.array([greedy], pa.int64()),
        "opt_coverage": pa.array([opt], pa.int64()),
        "total_vocab": pa.array([total_vocab], pa.int64()),
        "greedy_ratio_fp": pa.array(
            [greedy * 1_000_000 // max(opt, 1)], pa.int64())}))


# ===================== Little's-law sweep-line audit


def q_littles_law_audit(sf_dir):
    """Little's-law accounting identity, verified EXACTLY: for any
    set of intervals, the time integral of concurrency equals the sum
    of durations (∫L dt = Σ(e−s) — the sample-path form of L = λW,
    Little '61). Event windows reuse the Allen lattice intervals; the
    left side is a distributed sweep-line (per-timestamp delta fold,
    global prefix concurrency via the two-pass block-offset
    machinery, per-block Σ conc·gap plus block-boundary gap terms in
    the stitch), the right side an independent duration sum — and
    their equality is ASSERTED in-query, so any prefix-stitch bug
    fails the query. Output also reports peak concurrency (the
    capacity-planning number the sweep exists for).

    Scale plan: deltas pre-consolidate per timestamp in ONE groupby
    (so tie order is moot); the sorted timeline is materialized once;
    driver state is block-count-shaped (per-block delta totals and
    boundary gaps)."""
    import ray.data as rd

    ev = T(sf_dir, "events", ["event_id", "ts"])

    def _iv(b: pa.Table):
        t = _ts_ns(b["ts"]) // 1000
        s = (t // (ALLEN_GRID_S * 1_000_000)) * ALLEN_GRID_S
        i = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = s + (i % ALLEN_DUR_STEPS + 1) * 60
        return s, e

    def _deltas(b: pa.Table) -> pa.Table:
        s, e = _iv(b)
        return pa.table({
            "t": pa.array(np.concatenate([s, e]), pa.int64()),
            "d": pa.array(np.concatenate(
                [np.ones(len(s), np.int64),
                 -np.ones(len(e), np.int64)]))})

    def _durs(b: pa.Table) -> pa.Table:
        s, e = _iv(b)
        return pa.table({
            "g": pa.array(np.zeros(len(s), np.int64)),
            "dur": pa.array(e - s, pa.int64()),
            "one": pa.array(np.ones(len(s), np.int64))})

    total = fast_groupby_agg(
        ev.map_batches(_durs, batch_format="pyarrow"), ["g"],
        {"dur": ("dur", "sum"), "n": ("one", "sum")}).to_pandas()
    dur_sum, n_iv = int(total["dur"][0]), int(total["n"][0])

    timeline = fast_groupby_agg(
        ev.map_batches(_deltas, batch_format="pyarrow"), ["t"],
        {"d": ("d", "sum")}).sort("t").materialize()

    def _hdr(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"ft": pa.array([], pa.int64()),
                             "lt": pa.array([], pa.int64()),
                             "dsum": pa.array([], pa.int64())})
        return pa.table({
            "ft": b["t"][:1], "lt": b["t"][-1:],
            "dsum": pa.array([int(pc.sum(b["d"]).as_py())],
                             pa.int64())})

    hdr = timeline.map_batches(_hdr, batch_format="pyarrow",
                               batch_size=None).to_pandas() \
        .sort_values("ft").reset_index(drop=True)
    starts = np.concatenate(
        [[0], np.cumsum(hdr["dsum"].to_numpy(np.int64))[:-1]])
    start_by_ft = ray.put(dict(zip(
        (int(x) for x in hdr["ft"]), (int(x) for x in starts))))
    # boundary gap terms: concurrency at each block's end × the gap
    # to the next block's first timestamp (block-count-shaped)
    boundary = 0
    ends = starts + hdr["dsum"].to_numpy(np.int64)
    for i in range(len(hdr) - 1):
        boundary += int(ends[i]) * (int(hdr["ft"][i + 1])
                                    - int(hdr["lt"][i]))

    def _integral(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"area": pa.array([], pa.int64()),
                             "peak": pa.array([], pa.int64())})
        table = ray.get(start_by_ft)
        t = b["t"].to_numpy(zero_copy_only=False)
        d = b["d"].to_numpy(zero_copy_only=False)
        conc = table[int(t[0])] + np.cumsum(d)
        area = int((conc[:-1] * (t[1:] - t[:-1])).sum())
        return pa.table({"area": pa.array([area], pa.int64()),
                         "peak": pa.array([int(conc.max())],
                                          pa.int64())})

    parts = timeline.map_batches(_integral, batch_format="pyarrow",
                                 batch_size=None).to_pandas()
    integral = int(parts["area"].sum()) + boundary
    peak = int(parts["peak"].max())
    assert integral == dur_sum, \
        f"Little's law violated: ∫L dt {integral} != Σdur {dur_sum}"
    return rd.from_arrow(pa.table({
        "n_intervals": pa.array([n_iv], pa.int64()),
        "duration_sum_s": pa.array([dur_sum], pa.int64()),
        "sweep_integral_s": pa.array([integral], pa.int64()),
        "peak_concurrency": pa.array([peak], pa.int64()),
        "littles_law_holds": pa.array([1], pa.int64())}))


ORACLES["littles_law_audit"] = f"""
    WITH iv AS (
        SELECT (epoch_us(ts) // {ALLEN_GRID_S * 1_000_000})
                   * {ALLEN_GRID_S} AS s,
               (epoch_us(ts) // {ALLEN_GRID_S * 1_000_000})
                   * {ALLEN_GRID_S}
                   + (event_id % {ALLEN_DUR_STEPS} + 1) * 60 AS e
        FROM events),
    d AS (
        SELECT t, sum(dd) AS dd FROM (
            SELECT s AS t, 1 AS dd FROM iv
            UNION ALL SELECT e, -1 FROM iv) GROUP BY t),
    c AS (
        SELECT t, sum(dd) OVER (ORDER BY t) AS conc,
               lead(t) OVER (ORDER BY t) AS nt
        FROM d)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM iv) AS n_intervals,
           (SELECT CAST(sum(e - s) AS BIGINT) FROM iv)
               AS duration_sum_s,
           CAST(sum(conc * (nt - t)) FILTER (WHERE nt IS NOT NULL)
                AS BIGINT) AS sweep_integral_s,
           CAST(max(conc) AS BIGINT) AS peak_concurrency,
           CAST(CASE WHEN sum(conc * (nt - t))
                          FILTER (WHERE nt IS NOT NULL)
                          = (SELECT sum(e - s) FROM iv)
                     THEN 1 ELSE 0 END AS BIGINT) AS littles_law_holds
    FROM c
"""


# ===================== cuckoo-filter self-audit (engine state tier)

CUCKOO_AUDIT_CAP = 1 << 10


def q_cuckoo_fpr_audit(sf_dir):
    """Self-audit of the ENGINE'S OWN cuckoo filter (state/cuckoo.py —
    the hot tier of the crawl frontier's URL-seen bank): insert every
    supplier key's SHA1, probe every customer key, and compare
    against exact membership. The cuckoo no-false-negative guarantee
    (Fan et al. CoNEXT'14) is ASSERTED in-query — a miss on an
    inserted key means the kick chain corrupted a bucket, the exact
    failure mode the frontier's exactness depends on. Output: insert/
    probe/flag/false-positive counts and measured FPR ×1e9, the
    calibration number for sizing the filter tier vs the exact tier.

    Scale plan: the filter is CUCKOO_AUDIT_CAP buckets — constant;
    build once, broadcast by closure; probes are one vectorized
    map folding to count rows (bloom_fpr_audit's plan, pointed at the
    production filter implementation instead of a model)."""
    import hashlib as _hl

    import ray.data as rd

    from ..state.cuckoo import CuckooFilter, sha1_bytes_to_array

    sup = T(sf_dir, "supplier", ["s_suppkey"]).to_pandas()
    ins_keys = [int(x) for x in sup["s_suppkey"]]
    ins_sha = sha1_bytes_to_array(
        [_hl.sha1(f"ck,{k}".encode()).digest() for k in ins_keys])
    # size from the insert count (r4, ADVICE): supplier cardinality
    # scales with sf, and a fixed 1024-slot filter saturates (in-query
    # assert abort) at sf≥1. Next power of two above n/0.9 keeps load
    # ≤~90%, the regime the kick chain is designed for; the floor keeps
    # driver-sf audits on the original 1024-slot geometry.
    cap = CUCKOO_AUDIT_CAP
    while cap * 9 < len(ins_keys) * 10:
        cap <<= 1
    cf = CuckooFilter(capacity=cap)
    cf.insert_batch(ins_sha)
    assert bool(cf.contains_batch(ins_sha).all()), \
        "cuckoo false negative: inserted key not found"
    ins_set = set(ins_keys)

    probes = T(sf_dir, "customer", ["c_custkey"])

    def _probe(b: pa.Table) -> pa.Table:
        keys = [int(x) for x in b["c_custkey"].to_pylist()]
        sha = sha1_bytes_to_array(
            [_hl.sha1(f"ck,{k}".encode()).digest() for k in keys])
        flagged = cf.contains_batch(sha)
        present = np.asarray([k in ins_set for k in keys])
        assert bool(flagged[present].all()), \
            "cuckoo false negative on probe"
        return pa.table({
            "n_probes": pa.array([len(keys)], pa.int64()),
            "n_present": pa.array([int(present.sum())], pa.int64()),
            "n_flagged": pa.array([int(flagged.sum())], pa.int64()),
            "n_false_pos": pa.array(
                [int((flagged & ~present).sum())], pa.int64())})

    parts = probes.map_batches(_probe, batch_format="pyarrow") \
        .to_pandas()
    n_probes = int(parts["n_probes"].sum())
    n_present = int(parts["n_present"].sum())
    n_fp = int(parts["n_false_pos"].sum())
    return rd.from_arrow(pa.table({
        "n_inserted": pa.array([len(ins_keys)], pa.int64()),
        "n_probes": pa.array([n_probes], pa.int64()),
        "n_present": pa.array([n_present], pa.int64()),
        "n_flagged": pa.array([int(parts["n_flagged"].sum())],
                              pa.int64()),
        "n_false_pos": pa.array([n_fp], pa.int64()),
        "fpr_fp": pa.array(
            [n_fp * 1_000_000_000 // max(n_probes - n_present, 1)],
            pa.int64())}))


# ===================== Burrows-Wheeler compressibility audit


def _bwt(data: bytes) -> tuple[bytes, int]:
    """BWT via sorted rotations (sentinel-free, returns the primary
    index). O(n² log n) worst case — documents are short; a suffix
    array replaces this at scale (documented bound)."""
    n = len(data)
    dd = data + data
    order = sorted(range(n), key=lambda i: dd[i:i + n])
    last = bytes(data[(i - 1) % n] for i in order)
    return last, order.index(0)


def _ibwt(last: bytes, idx: int) -> bytes:
    """Inverse BWT by the standard LF-mapping (counting sort)."""
    n = len(last)
    counts = np.bincount(np.frombuffer(last, np.uint8), minlength=256)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    seen = np.zeros(256, np.int64)
    lf = np.zeros(n, np.int64)
    arr = np.frombuffer(last, np.uint8)
    for i in range(n):
        c = arr[i]
        lf[i] = starts[c] + seen[c]
        seen[c] += 1
    out = bytearray(n)
    p = idx
    for k in range(n - 1, -1, -1):
        out[k] = arr[p]
        p = lf[p]
    return bytes(out)


def _rle_runs(b: bytes) -> int:
    if not b:
        return 0
    a = np.frombuffer(b, np.uint8)
    return int((a[1:] != a[:-1]).sum()) + 1


def q_bwt_audit(sf_dir):
    """Burrows–Wheeler compressibility audit (Burrows & Wheeler '94,
    the bzip2 core): per document the BWT is computed, the RLE run
    count before vs after measures how much the transform
    concentrates repeated context (the whole reason the transform
    exists), and the INVERSE transform is applied and asserted equal
    to the original bytes in-query — a losslessness certificate per
    document, so any rotation-sort or LF-mapping bug fails the
    pipeline. Output per source: docs, total bytes, RLE runs raw vs
    post-BWT, and the run-reduction ratio ×1e6.

    Scale plan: pure per-document map (no exchange but the final
    enum-sized groupby); rotation sort is O(n² log n) on short docs
    with the suffix-array upgrade documented for long ones."""
    docs = T(sf_dir, "documents", ["text", "source"])

    def _audit(b: pa.Table) -> pa.Table:
        srcs, nb, r0, r1 = [], [], [], []
        for txt, src in zip(b["text"].to_pylist(),
                            b["source"].to_pylist()):
            data = txt.encode("utf-8", "surrogatepass")
            if not data:
                continue
            last, idx = _bwt(data)
            assert _ibwt(last, idx) == data, "BWT roundtrip broken"
            srcs.append(src)
            nb.append(len(data))
            r0.append(_rle_runs(data))
            r1.append(_rle_runs(last))
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "n_bytes": pa.array(np.asarray(nb, np.int64)),
            "runs_raw": pa.array(np.asarray(r0, np.int64)),
            "runs_bwt": pa.array(np.asarray(r1, np.int64)),
            "one": pa.array(np.ones(len(srcs), np.int64))})

    agg = fast_groupby_agg(
        docs.map_batches(_audit, batch_format="pyarrow"), ["source"],
        {"n_docs": ("one", "sum"), "n_bytes": ("n_bytes", "sum"),
         "runs_raw": ("runs_raw", "sum"),
         "runs_bwt": ("runs_bwt", "sum")})

    def _ratio(b: pa.Table) -> pa.Table:
        return b.append_column("run_ratio_fp", pa.array(
            b["runs_bwt"].to_numpy(zero_copy_only=False) * 1_000_000
            // np.maximum(b["runs_raw"].to_numpy(
                zero_copy_only=False), 1), pa.int64()))

    return agg.map_batches(_ratio, batch_format="pyarrow")


# ===================== Naive Bayes eval (exact bigint argmax)


def q_naive_bayes_eval(sf_dir):
    """Multinomial Naive Bayes train/eval between the two
    lexicographically-first sources with EXACT integer inference — no
    float log-probs: the argmax prior_c·Π(n_wc+1)/(T_c+V)^L is decided
    by cross-multiplied python bigints (prior₁·Π(n_w1+1)·(T₂+V)^L vs
    prior₂·Π(n_w2+1)·(T₁+V)^L), so the classifier's decisions are a
    pure function of the counts, reproducible anywhere. The split is
    md5(doc_id) parity — doc_id parity itself correlates with source
    in the round-robin synthetic corpus — train on even md5, eval odd; per true class: tests, correct,
    accuracy ×1e6 — the classic source-attribution baseline.

    Scale plan: training is ONE vocabulary-shaped (token, class)
    count groupby, broadcast as the model (vocab-guard contract);
    eval is a pure map folding to a 2-row accuracy table. Ties break
    to the lexicographically-first class, pinned."""
    import ray.data as rd

    docs = T(sf_dir, "documents", ["doc_id", "text", "source"])
    srcs = sorted(fast_groupby_agg(
        docs.select_columns(["source"]), ["source"],
        {"_n": (None, "count")}).to_pandas()["source"])[:2]
    s1, s2 = srcs

    def _train_tok(b: pa.Table) -> pa.Table:
        terms, c1, c2 = [], [], []
        n1 = n2 = 0
        for did, txt, src in zip(b["doc_id"].to_pylist(),
                                 b["text"].to_pylist(),
                                 b["source"].to_pylist()):
            if src not in (s1, s2) or int(hashlib.md5(
                    f"nb,{did}".encode()).hexdigest()[:2], 16) % 2:
                continue
            first = src == s1
            n1 += first
            n2 += not first
            for t in _TOKEN.findall(txt.lower()):
                terms.append(t)
                c1.append(1 if first else 0)
                c2.append(0 if first else 1)
        terms.append("\x00docs")  # prior carrier row (not a token)
        c1.append(n1)
        c2.append(n2)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "c1": pa.array(np.asarray(c1, np.int64)),
            "c2": pa.array(np.asarray(c2, np.int64))})

    model_df = fast_groupby_agg(
        docs.map_batches(_train_tok, batch_format="pyarrow"),
        ["term"], {"c1": ("c1", "sum"), "c2": ("c2", "sum")}) \
        .to_pandas()
    priors = model_df[model_df["term"] == "\x00docs"]
    p1, p2 = int(priors["c1"].iloc[0]), int(priors["c2"].iloc[0])
    toks = model_df[model_df["term"] != "\x00docs"]
    m1 = dict(zip(toks["term"], toks["c1"].astype(int)))
    m2 = dict(zip(toks["term"], toks["c2"].astype(int)))
    t1, t2 = sum(m1.values()), sum(m2.values())
    v = len(toks)
    model = ray.put((m1, m2, p1, p2, t1, t2, v))

    def _eval(b: pa.Table) -> pa.Table:
        mm1, mm2, pp1, pp2, tt1, tt2, vv = ray.get(model)
        rows = {s1: [0, 0], s2: [0, 0]}
        for did, txt, src in zip(b["doc_id"].to_pylist(),
                                 b["text"].to_pylist(),
                                 b["source"].to_pylist()):
            if src not in (s1, s2) or int(hashlib.md5(
                    f"nb,{did}".encode()).hexdigest()[:2], 16) % 2 == 0:
                continue
            ts = _TOKEN.findall(txt.lower())
            # log-space decision with an exact-integer tie-break (r4,
            # ADVICE): the pure-bigint product grows to thousands of
            # digits on long documents (superlinear per-token cost).
            # Compare log-scores first; only when they sit inside the
            # accumulated-rounding envelope (~4e-15 per term, padded)
            # fall back to the exact cross-multiplied bigints. Same
            # decisions as the exact path — the fallback fires exactly
            # when floats cannot certify the argmax.
            ll = math.log(pp1) - math.log(pp2) + len(ts) * (
                math.log(tt2 + vv) - math.log(tt1 + vv))
            for t in ts:
                ll += math.log(mm1.get(t, 0) + 1)
                ll -= math.log(mm2.get(t, 0) + 1)
            eps = 1e-9 * max(1, len(ts))
            if abs(ll) > eps:
                pred = s1 if ll > 0 else s2
            else:
                prod1, prod2 = pp1, pp2
                for t in ts:
                    prod1 *= mm1.get(t, 0) + 1
                    prod2 *= mm2.get(t, 0) + 1
                lhs = prod1 * (tt2 + vv) ** len(ts)
                rhs = prod2 * (tt1 + vv) ** len(ts)
                pred = s1 if lhs >= rhs else s2  # tie → first class
            rows[src][0] += 1
            rows[src][1] += pred == src
        return pa.table({
            "true_class": pa.array([s1, s2], pa.string()),
            "n_test": pa.array([rows[s1][0], rows[s2][0]], pa.int64()),
            "n_correct": pa.array([rows[s1][1], rows[s2][1]],
                                  pa.int64())})

    agg = fast_groupby_agg(
        docs.map_batches(_eval, batch_format="pyarrow"),
        ["true_class"], {"n_test": ("n_test", "sum"),
                         "n_correct": ("n_correct", "sum")})

    def _acc(b: pa.Table) -> pa.Table:
        return b.append_column("accuracy_fp", pa.array(
            b["n_correct"].to_numpy(zero_copy_only=False) * 1_000_000
            // np.maximum(b["n_test"].to_numpy(
                zero_copy_only=False), 1), pa.int64()))

    return agg.map_batches(_acc, batch_format="pyarrow")
