"""relational layer (6/7): record linkage (edit-distance joins, soundex, sorted-neighborhood),
sketches (frequent directions, KMV), matching markets, clustering.

Split out of pipelines/relational.py (r4) with ZERO behavior change —
statements keep their original order; ``relational`` re-exports
everything, and ORACLES entries registered here mutate the shared dict
owned by rel_audit_core (or the facade-merged view). See
pipelines/relational.py for the facade contract.
"""

from __future__ import annotations

import hashlib
import math

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
    q_grouped_distinct_count,
)
from .rel_text_profile import (
    _order_type_items,
)
from .rel_audit_core import (
    ORACLES,
)
from .rel_graph_stream import (
    GEO_DOMAIN,
    _geo_xy,
    q_graph_random_walks,
)



# ==================================================== int8 quantization


def q_int8_quant_audit(sf_dir):
    """Symmetric per-dimension int8 scalar quantization of the
    embedding table with EXACT error accounting — the storage-shrink
    step (4 B → 1 B per value) every billion-vector ANN deployment
    takes before IVF/PQ, audited: per vector, the L∞ and L1
    reconstruction error in the common 127·10⁶ fixed-point domain
    (err = |127·x_fp − q·m_dim|, all integer, so the oracle comparison
    is bitwise). q = ⌊(254·x_fp + m)/(2·m)⌋ — rounding mirrored to
    DuckDB's floor-corrected ``//`` — is clamped by construction to
    [−127, 127] (asserted in-kernel).

    Scale plan: pass 1 folds per-DIMENSION |x_fp| maxima map-side (d
    rows per block, one d-sized groupby — d is the model dim, a
    constant); the d scale ints broadcast by closure; pass 2 is one
    shuffle-free zero-copy list kernel (values buffer → numpy, reduceat
    per vector). Nothing vector-count-sized ever moves or lands on the
    driver beyond the result itself."""
    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _flat(b: pa.Table):
        col = b["embedding"]
        la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        flat = la.values.to_numpy(zero_copy_only=False).astype(np.float64)
        offs = la.offsets.to_numpy().astype(np.int64)
        return flat, offs

    def _dim_max(b: pa.Table) -> pa.Table:
        flat, offs = _flat(b)
        lens = np.diff(offs)
        if len(lens) == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        d = int(lens[0])
        assert (lens == d).all(), "ragged embedding dims"
        xfp = _round_half_away(flat * 1e6).astype(np.int64)
        mx = np.abs(xfp).reshape(-1, d).max(axis=0)
        return pa.table({"dim": pa.array(np.arange(d), pa.int64()),
                         "mx": pa.array(mx, pa.int64())})

    scales = fast_groupby_agg(
        emb.map_batches(_dim_max, batch_format="pyarrow"),
        ["dim"], {"mx": ("mx", "max")}).to_pandas().sort_values("dim")
    m = scales["mx"].to_numpy(np.int64)  # d ints — broadcast by closure

    def _audit(b: pa.Table) -> pa.Table:
        flat, offs = _flat(b)
        lens = np.diff(offs)
        d = len(m)
        xfp = _round_half_away(flat * 1e6).astype(np.int64).reshape(-1, d)
        mm = np.broadcast_to(m, xfp.shape)
        q = np.where(mm == 0, 0, (254 * xfp + mm) // (2 * np.maximum(mm, 1)))
        assert (np.abs(q) <= 127).all(), "int8 clamp violated"
        err = np.abs(127 * xfp - q * mm)
        return pa.table({
            "vec_id": b["vec_id"],
            "n_dims": pa.array(lens, pa.int64()),
            "max_err": pa.array(err.max(axis=1), pa.int64()),
            "sum_err": pa.array(err.sum(axis=1), pa.int64())})

    return emb.map_batches(_audit, batch_format="pyarrow")


ORACLES["int8_quant_audit"] = """
    WITH el AS (
        SELECT vec_id, gs - 1 AS dim,
               CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                    AS BIGINT) AS xfp
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(gs)),
    m AS (SELECT dim, max(abs(xfp)) AS mx FROM el GROUP BY dim),
    q AS (SELECT e.vec_id, e.xfp, m.mx,
                 CASE WHEN m.mx = 0 THEN 0
                      ELSE (254 * e.xfp + m.mx) // (2 * m.mx)
                           - CASE WHEN (254 * e.xfp + m.mx)
                                       % (2 * m.mx) <> 0
                                       AND (254 * e.xfp + m.mx) < 0
                                  THEN 1 ELSE 0 END
                 END AS qv
          FROM el e JOIN m ON m.dim = e.dim)
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_dims,
           CAST(max(abs(127 * xfp - qv * mx)) AS BIGINT) AS max_err,
           CAST(sum(abs(127 * xfp - qv * mx)) AS BIGINT) AS sum_err
    FROM q GROUP BY vec_id
"""


# ====================================================== skip-gram pairs


SKIPGRAM_WINDOW = 2


def q_skipgram_pairs(sf_dir, window: int = SKIPGRAM_WINDOW):
    """Skip-gram (center, context) pair counts over the deterministic
    random-walk corpus — the word2vec/DeepWalk TRAINING-PAIR generator
    (Perozzi et al., KDD'14 feed walks into skip-gram): for every walk,
    every ordered pair of nodes at step distance 1..``window`` emits
    one (center, context) example; the output is the aggregated pair
    multiset the embedding trainer consumes. Composes
    q_graph_random_walks (exact corpus) with one walk-keyed self-join —
    and the oracle composes the SAME unrolled-CTE walk SQL, so the
    pair table is bitwise-checked end to end.

    Scale plan: walks are (starts × steps)-sized, the self-join is
    hash-partitioned on walk_id with per-walk fan-out ≤ (L+1)·2w — a
    constant — and the final count groupby is pair-vocabulary-sized."""
    walks = q_graph_random_walks(sf_dir).materialize()
    right = walks.map_batches(
        lambda b: b.rename_columns(["wid_r", "step_r", "ctx"]),
        batch_format="pyarrow")
    j = walks.join(right, "inner", num_partitions=JOIN_PARTS,
                   on=("walk_id",), right_on=("wid_r",))

    def _pairs(b: pa.Table) -> pa.Table:
        s = b["step"].to_numpy(zero_copy_only=False)
        t = b["step_r"].to_numpy(zero_copy_only=False)
        d = np.abs(s - t)
        keep = (d >= 1) & (d <= window)
        return pa.table({
            "center": pa.array(
                b["node"].to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "context": pa.array(
                b["ctx"].to_numpy(zero_copy_only=False)[keep],
                pa.int64())})

    pairs = j.map_batches(_pairs, batch_format="pyarrow")
    return fast_groupby_agg(pairs, ["center", "context"],
                            {"n_pairs": (None, "count")})


def _skipgram_oracle() -> str:
    walks_sql = ORACLES["graph_random_walks"].strip()
    return f"""
    WITH walks AS ({walks_sql})
    SELECT a.node AS center, b.node AS context,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM walks a JOIN walks b
      ON a.walk_id = b.walk_id
     AND abs(a.step - b.step) BETWEEN 1 AND {SKIPGRAM_WINDOW}
    GROUP BY a.node, b.node
"""


ORACLES["skipgram_pairs"] = _skipgram_oracle()


# ==================================================== permutation test


PERM_TEST_BITS = 60


def q_permutation_test(sf_dir, n_perms: int = PERM_TEST_BITS):
    """EXACT distributed permutation test for the click-vs-rest mean
    difference of event value — the assumption-free significance test
    (Fisher 1935) made shuffle-free and bit-deterministic: ONE
    md5₆₀(event_id) per row supplies all ``n_perms`` random reassignments
    at once (bit p of the hash = row's group under permutation p), so
    the whole test is a constant-width map-side fold. Extremeness is
    decided WITHOUT division: |mean diff| comparisons cross-multiply to
    |D_p|·n_o·(n−n_o) ≥ |D_o|·n_p·(n−n_p) with D = S_g(n−n_g) −
    (S−S_g)·n_g, evaluated in arbitrary-precision Python ints (the
    oracle uses HUGEINT) — no float ever enters. Output: group sizes
    and the p-value as an integer fraction p_num/p_den.

    Scale plan: each batch folds to n_perms (S_p, n_p) partials plus
    the observed totals — a ~120-int exchange per block regardless of
    corpus size; the comparison runs once on the driver over those
    ~120 ints. Degenerate permutations (empty side) are excluded from
    p_den on both engines."""
    ev = T(sf_dir, "events", ["event_id", "event_type", "value"])

    def _fold(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False)
        vf = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        g = pc.equal(b["event_type"], "click").to_numpy(
            zero_copy_only=False)
        h = np.fromiter(
            (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:15], 16)
             for i in ids), dtype=np.int64, count=len(ids))
        bits = (h[:, None] >> np.arange(n_perms)) & 1  # (rows, perms)
        sp = (vf[:, None] * bits).sum(axis=0)
        npv = bits.sum(axis=0)
        p = np.arange(n_perms, dtype=np.int64)
        return pa.table({
            "p": pa.array(np.concatenate([p, [-1], [-2]]), pa.int64()),
            "s": pa.array(np.concatenate(
                [sp, [int(vf.sum())], [int(vf[g].sum())]]), pa.int64()),
            "c": pa.array(np.concatenate(
                [npv, [len(vf)], [int(g.sum())]]), pa.int64())})

    agg = fast_groupby_agg(
        ev.map_batches(_fold, batch_format="pyarrow"),
        ["p"], {"s": ("s", "sum"), "c": ("c", "sum")}) \
        .to_pandas().set_index("p")
    s, n = int(agg.loc[-1, "s"]), int(agg.loc[-1, "c"])
    s1, n1 = int(agg.loc[-2, "s"]), int(agg.loc[-2, "c"])
    d_obs = abs(s1 * (n - n1) - (s - s1) * n1)
    q_obs = n1 * (n - n1)
    p_num = p_den = 0
    for p in range(n_perms):
        sp, npv = int(agg.loc[p, "s"]), int(agg.loc[p, "c"])
        if npv == 0 or npv == n:
            continue
        p_den += 1
        dp = abs(sp * (n - npv) - (s - sp) * npv)
        if dp * q_obs >= d_obs * (npv * (n - npv)):
            p_num += 1
    return pd.DataFrame({
        "n": [np.int64(n)], "n1_obs": [np.int64(n1)],
        "p_num": [np.int64(p_num)], "p_den": [np.int64(p_den)]})


ORACLES["permutation_test"] = f"""
    WITH v AS (
        SELECT CAST(round(value * 1000000) AS BIGINT) AS vf,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
               CAST(concat('0x', substr(md5(
                   CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events),
    tot AS (SELECT sum(vf) AS s, count(*) AS n,
                   sum(vf * g) AS s1, sum(g) AS n1 FROM v),
    perm AS (
        SELECT p,
               sum(CASE WHEN (h >> p) & 1 = 1 THEN vf ELSE 0 END) AS sp,
               sum(CASE WHEN (h >> p) & 1 = 1 THEN 1 ELSE 0 END) AS np
        FROM v, unnest(generate_series(0, {PERM_TEST_BITS - 1})) AS t(p)
        GROUP BY p),
    cmp AS (
        SELECT count(*) AS den,
               sum(CASE WHEN
                   abs(CAST(sp AS HUGEINT) * (n - np)
                       - (CAST(s AS HUGEINT) - sp) * np)
                   * (CAST(n1 AS HUGEINT) * (n - n1))
                   >= abs(CAST(s1 AS HUGEINT) * (n - n1)
                          - (CAST(s AS HUGEINT) - s1) * n1)
                      * (CAST(np AS HUGEINT) * (n - np))
                   THEN 1 ELSE 0 END) AS num
        FROM perm, tot WHERE np > 0 AND np < n)
    SELECT CAST(n AS BIGINT) AS n, CAST(n1 AS BIGINT) AS n1_obs,
           CAST(num AS BIGINT) AS p_num, CAST(den AS BIGINT) AS p_den
    FROM tot, cmp
"""


# ======================================================== KMV sketch


KMV_K = 8


def q_kmv_distinct(sf_dir, k: int = KMV_K):
    """K-minimum-values distinct sketch per event_type (Bar-Yossef et
    al. 2002): over md5₆₀ hashes of the member ids, keep the k smallest
    DISTINCT hash values; estimate = (k−1)·2⁶⁰ // h_(k). Unlike the HLL
    pair (rows-only, asserted error bands), KMV is a pure function of
    the md5 convention both engines state verbatim — so this sketch has
    an EXACT oracle: the driver gate certifies the estimator itself,
    including its per-group error in integer permille. Groups with
    fewer than k distinct members are excluded on both sides (the
    sketch is undefined there).

    Scale plan: per-batch partials keep each group's k smallest
    distinct hashes (np.unique + partition — the union of per-batch
    k-mins contains the global k-mins, the standard KMV merge); the
    exchange is ≤ k rows per (block, group); the final per-group merge
    touches ≤ k·blocks values. The exact side reuses the distinct-count
    fold for the err column."""
    ev = T(sf_dir, "events", ["event_type", "user_id"])

    def _partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        types, hvs = [], []
        for et, g in df.groupby("event_type", sort=False):
            u = np.unique(g["user_id"].to_numpy(np.int64))
            h = np.fromiter(
                (int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15],
                     16) for x in u), dtype=np.int64, count=len(u))
            h = np.unique(h)
            kk = h[:k] if len(h) <= k else np.partition(h, k - 1)[:k]
            types.extend([et] * len(kk))
            hvs.extend(kk.tolist())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "hv": pa.array(hvs, pa.int64())})

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(g["hv"].to_numpy(np.int64))
        if len(h) < k:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "hk": pd.Series([], dtype="int64")})
        hk = int(np.sort(h)[k - 1])
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "hk": [np.int64(hk)]})

    sk = ev.map_batches(_partial, batch_format="pyarrow") \
        .groupby("event_type").map_groups(_merge, batch_format="pandas") \
        .to_pandas()
    exact = q_grouped_distinct_count(sf_dir).to_pandas()
    out = sk.merge(exact, on="event_type").sort_values("event_type")
    est = [(k - 1) * (1 << 60) // int(h) for h in out["hk"]]
    ex = out["n_users"].astype(int).tolist()
    return pd.DataFrame({
        "event_type": out["event_type"].to_numpy(),
        "hk": out["hk"].astype(np.int64),
        "est": np.array(est, dtype=np.int64),
        "n_exact": np.array(ex, dtype=np.int64),
        "err_pm": np.array([abs(e - x) * 1000 // x
                            for e, x in zip(est, ex)], dtype=np.int64)})


ORACLES["kmv_distinct"] = f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(concat('0x', substr(md5(
                   CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        FROM events),
    r AS (SELECT event_type, hv, row_number() OVER (
              PARTITION BY event_type ORDER BY hv) AS rn FROM h),
    kk AS (SELECT event_type, hv AS hk FROM r WHERE rn = {KMV_K}),
    ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
           FROM events GROUP BY event_type),
    est AS (SELECT k.event_type, k.hk,
                   CAST({KMV_K - 1} AS HUGEINT)
                   * 1152921504606846976 // k.hk AS e,
                   ex.n_exact
            FROM kk k JOIN ex ON ex.event_type = k.event_type)
    SELECT event_type, hk, CAST(e AS BIGINT) AS est,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(abs(e - n_exact) * 1000 // n_exact AS BIGINT) AS err_pm
    FROM est
"""


# ================================================== oversample balancing


def q_oversample_balance(sf_dir):
    """Deterministic minority-class oversampling plan over the document
    language labels: every class is replicated toward the majority
    count — integer base multiplier m//n per row plus ONE md5-gated
    extra copy for the fractional remainder (row gets the extra copy
    iff h < ⌈rem·2⁶⁰/n⌉, the per-class threshold precomputed in
    arbitrary-precision ints so the vectorized compare stays int64).
    The emitted plan is the per-class before/after ledger — the exact
    multiset a balanced training epoch would materialize, reproducible
    at any cluster size because membership is a pure hash function.

    Scale plan: class counts are one tiny groupby (driver-held —
    classes are enum-sized); the multiplier pass is shuffle-free
    map_batches with the per-class thresholds shipped by closure; the
    final ledger is a class-sized groupby."""
    docs = T(sf_dir, "documents", ["doc_id", "lang"])
    counts = fast_groupby_agg(docs, ["lang"], {"n": (None, "count")}) \
        .to_pandas()
    cnt = dict(zip(counts["lang"], counts["n"].astype(int)))
    m = max(cnt.values())
    base = {la: m // n for la, n in cnt.items()}
    thr = {la: ((m % n) * (1 << 60) + n - 1) // n for la, n in cnt.items()}

    def _mult(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (int(hashlib.md5(str(int(d)).encode()).hexdigest()[:15], 16)
             for d in df["doc_id"]), dtype=np.int64, count=len(df))
        b = df["lang"].map(base).to_numpy(np.int64)
        t = df["lang"].map(thr).to_numpy(np.int64)
        return pd.DataFrame({
            "lang": df["lang"].to_numpy(),
            "mult": b + (h < t).astype(np.int64)})

    ledger = fast_groupby_agg(
        docs.map_batches(_mult, batch_format="pandas"),
        ["lang"], {"n_after": ("mult", "sum"),
                   "n_before": (None, "count")})

    def _fin(b: pa.Table) -> pa.Table:
        lang = b["lang"].to_pylist()
        return pa.table({
            "lang": b["lang"],
            "n_before": b["n_before"],
            "base_mult": pa.array([base[la] for la in lang], pa.int64()),
            "n_after": b["n_after"],
            "target": pa.array([m] * len(lang), pa.int64())})

    return ledger.map_batches(_fin, batch_format="pyarrow")


ORACLES["oversample_balance"] = """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    mx AS (SELECT max(n) AS m FROM c),
    r AS (SELECT d.lang, c.n, mx.m,
                 CAST(concat('0x', substr(md5(
                     CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
          FROM documents d JOIN c USING (lang), mx),
    q AS (SELECT lang, n, m,
                 (m // n) + CASE WHEN h <
                     (CAST(m % n AS HUGEINT) * 1152921504606846976
                      + n - 1) // n
                     THEN 1 ELSE 0 END AS mult
          FROM r)
    SELECT lang, CAST(min(n) AS BIGINT) AS n_before,
           CAST(min(m) // min(n) AS BIGINT) AS base_mult,
           CAST(sum(mult) AS BIGINT) AS n_after,
           CAST(min(m) AS BIGINT) AS target
    FROM q GROUP BY lang
"""


# ======================================================= KWIC snippets


KWIC_TERM = "merge"
KWIC_HALO = 3


def q_kwic_snippets(sf_dir, term: str = KWIC_TERM, halo: int = KWIC_HALO):
    """Keyword-in-context snippet extraction: for every document
    containing ``term``, cut the ±``halo``-token window around its
    FIRST occurrence — the retrieval-display / concordance primitive
    (and the context-window miner for term-sense datasets). Output per
    hit: the 1-based token index, the window size, and the md5
    fingerprint of the snippet text, so the oracle checks the emitted
    snippet bytes exactly.

    Scale plan: one shuffle-free map pass — split, index(), slice,
    join, hash, all within the document's own batch; the output is
    hit-sized. At 100 TB this is the same cost class as any tokenize
    pass; no exchange at all."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _kwic(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "idx": [], "n_window": [], "snippet_fp": []}
        for did, txt in zip(df["doc_id"].to_numpy(np.int64),
                            df["text"]):
            toks = txt.split(" ")
            try:
                i = toks.index(term)  # 0-based first occurrence
            except ValueError:
                continue
            win = toks[max(0, i - halo): i + halo + 1]
            snip = " ".join(win)
            rows["doc_id"].append(did)
            rows["idx"].append(i + 1)
            rows["n_window"].append(len(win))
            rows["snippet_fp"].append(
                int(hashlib.md5(snip.encode()).hexdigest()[:15], 16))
        return pd.DataFrame({
            "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
            "idx": pd.Series(rows["idx"], dtype="int64"),
            "n_window": pd.Series(rows["n_window"], dtype="int64"),
            "snippet_fp": pd.Series(rows["snippet_fp"], dtype="int64")})

    return docs.map_batches(_kwic, batch_format="pandas")


ORACLES["kwic_snippets"] = f"""
    WITH l AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    hit AS (SELECT doc_id, toks,
                   list_position(toks, '{KWIC_TERM}') AS i,
                   len(toks) AS n
            FROM l WHERE list_position(toks, '{KWIC_TERM}') > 0),
    win AS (SELECT doc_id, i,
                   toks[greatest(1, i - {KWIC_HALO})
                        : least(n, i + {KWIC_HALO})] AS w
            FROM hit)
    SELECT doc_id, CAST(i AS BIGINT) AS idx,
           CAST(len(w) AS BIGINT) AS n_window,
           CAST(concat('0x', substr(md5(
               array_to_string(w, ' ')), 1, 15)) AS BIGINT)
               AS snippet_fp
    FROM win
"""


# ==================================================== group-aware split


def q_group_aware_split(sf_dir):
    """Leakage-FREE train/val/test split: documents are assigned by the
    md5 of their exact-duplicate CLUSTER (min doc_id sharing the text
    hash), so identical texts can never straddle a split boundary — the
    fix for precisely the defect q_holdout_leakage audits (and the
    group-k-fold discipline sklearn's GroupKFold encodes). Split gate:
    first hex digit of md5(cluster) — 0–b train, c–d val, e–f test
    (12/2/2 of 16). Output: per split, document and cluster counts; the
    in-query invariant asserts every cluster lands in exactly one
    split.

    Scale plan: the cluster table is dedup_exact_text's exchange (one
    text-hash groupby carrying min doc_id); assignment is a hash join
    of docs against their cluster plus a map — no broadcast of anything
    corpus-sized; the ledger is a 3-row groupby."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "h": [hashlib.md5(t.encode()).hexdigest()
                  for t in df["text"]]})

    hashed = docs.map_batches(_hash, batch_format="pandas").materialize()
    clusters = fast_groupby_agg(hashed, ["h"],
                                {"cluster": ("doc_id", "min")})
    j = hashed.join(clusters, "inner", num_partitions=JOIN_PARTS,
                    on=("h",))

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        first = np.array([
            int(hashlib.md5(str(int(c)).encode()).hexdigest()[0], 16)
            for c in df["cluster"]])
        split = np.where(first < 12, "train",
                         np.where(first < 14, "val", "test"))
        return pd.DataFrame({
            "split": split, "cluster": df["cluster"].to_numpy(np.int64)})

    assigned = j.map_batches(_assign, batch_format="pandas") \
        .materialize()
    ledger = fast_groupby_agg(assigned, ["split"],
                              {"n_docs": (None, "count")}).to_pandas()
    ncl = fast_groupby_agg(
        fast_groupby_agg(assigned, ["split", "cluster"],
                         {"_n": (None, "count")}),
        ["split"], {"n_clusters": (None, "count")}).to_pandas()
    # invariant: no cluster appears under two splits
    total_cl = fast_groupby_agg(assigned, ["cluster"],
                                {"_n": (None, "count")}).count()
    assert int(ncl["n_clusters"].sum()) == total_cl, \
        "a duplicate cluster straddles a split boundary"
    out = ledger.merge(ncl, on="split").sort_values("split") \
        .reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_clusters"] = out["n_clusters"].astype(np.int64)
    return out


ORACLES["group_aware_split"] = """
    WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
    c AS (SELECT hh, min(doc_id) AS cluster FROM h GROUP BY hh),
    a AS (SELECT h.doc_id, c.cluster,
                 CASE WHEN CAST(concat('0x', substr(md5(
                          CAST(c.cluster AS VARCHAR)), 1, 1))
                          AS BIGINT) < 12 THEN 'train'
                      WHEN CAST(concat('0x', substr(md5(
                          CAST(c.cluster AS VARCHAR)), 1, 1))
                          AS BIGINT) < 14 THEN 'val'
                      ELSE 'test' END AS split
          FROM h JOIN c USING (hh))
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters
    FROM a GROUP BY split ORDER BY split
"""


# ============================================== labeling-function audit


# (name, trigger substring-token, vote) — deterministic keyword LFs
LF_RULES = (("lf_fast", "fast", 1),
            ("lf_slow", "slow", 0),
            ("lf_merge", "merge", 1))


def q_labeling_functions_audit(sf_dir, rules: tuple = LF_RULES):
    """Snorkel-style weak-supervision diagnostics (Ratner et al.,
    VLDB'18): three deterministic keyword labeling functions vote
    {0, 1, abstain} per document; per LF the audit reports coverage
    (votes), overlap (votes on docs where ANOTHER LF also voted) and
    conflict (votes on docs where another LF voted DIFFERENTLY) — the
    exact matrix a label-model practitioner reads before training — and
    the majority-vote label distribution (ties → abstain). All counts
    are integers over token-membership predicates, so the oracle is
    bitwise.

    Scale plan: one shuffle-free map evaluates every LF per batch
    (token-set membership on the split column); the per-LF ledger is a
    constant-width fold (rows = 3 LFs + 3 vote classes), never
    doc-sized."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _votes(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ").map(set)
        votes = np.full((len(df), len(rules)), -1, dtype=np.int64)
        for j, (_, kw, lab) in enumerate(rules):
            hit = np.fromiter((kw in s for s in toks), dtype=bool,
                              count=len(df))
            votes[hit, j] = lab
        voted = votes >= 0
        n_voted = voted.sum(axis=1)
        n_pos = (votes == 1).sum(axis=1)
        n_neg = (votes == 0).sum(axis=1)
        maj = np.where(n_pos > n_neg, 1, np.where(n_neg > n_pos, 0, -1))
        maj[n_voted == 0] = -1
        rows = []
        for j, (name, _, _) in enumerate(rules):
            v = voted[:, j]
            other = voted.copy()
            other[:, j] = False
            any_other = other.any(axis=1)
            conf = np.zeros(len(df), dtype=bool)
            for k in range(len(rules)):
                if k == j:
                    continue
                conf |= (voted[:, k] & v
                         & (votes[:, k] != votes[:, j]))
            rows.append({"lf": name,
                         "coverage": int(v.sum()),
                         "overlap": int((v & any_other).sum()),
                         "conflict": int(conf.sum())})
        for lab, nm in ((1, "vote_1"), (0, "vote_0"), (-1, "abstain")):
            rows.append({"lf": nm, "coverage": int((maj == lab).sum()),
                         "overlap": 0, "conflict": 0})
        out = pd.DataFrame(rows)
        out["coverage"] = out["coverage"].astype(np.int64)
        out["overlap"] = out["overlap"].astype(np.int64)
        out["conflict"] = out["conflict"].astype(np.int64)
        return out

    return fast_groupby_agg(
        docs.map_batches(_votes, batch_format="pandas"),
        ["lf"], {"coverage": ("coverage", "sum"),
                 "overlap": ("overlap", "sum"),
                 "conflict": ("conflict", "sum")})


ORACLES["labeling_functions_audit"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    v AS (SELECT doc_id,
                 CASE WHEN list_position(toks, 'fast') > 0
                      THEN 1 ELSE -1 END AS v1,
                 CASE WHEN list_position(toks, 'slow') > 0
                      THEN 0 ELSE -1 END AS v2,
                 CASE WHEN list_position(toks, 'merge') > 0
                      THEN 1 ELSE -1 END AS v3
          FROM t),
    m AS (SELECT doc_id, v1, v2, v3,
                 (CASE WHEN v1 = 1 THEN 1 ELSE 0 END
                  + CASE WHEN v2 = 1 THEN 1 ELSE 0 END
                  + CASE WHEN v3 = 1 THEN 1 ELSE 0 END) AS npos,
                 (CASE WHEN v1 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN v2 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN v3 = 0 THEN 1 ELSE 0 END) AS nneg
          FROM v),
    maj AS (SELECT CASE WHEN npos + nneg = 0 THEN -1
                        WHEN npos > nneg THEN 1
                        WHEN nneg > npos THEN 0
                        ELSE -1 END AS lab FROM m)
    SELECT 'lf_fast' AS lf,
           CAST(sum(CASE WHEN v1 >= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS coverage,
           CAST(sum(CASE WHEN v1 >= 0 AND (v2 >= 0 OR v3 >= 0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS overlap,
           CAST(sum(CASE WHEN v1 >= 0 AND ((v2 >= 0 AND v2 <> v1)
                         OR (v3 >= 0 AND v3 <> v1))
                    THEN 1 ELSE 0 END) AS BIGINT) AS conflict
    FROM v
    UNION ALL
    SELECT 'lf_slow',
           CAST(sum(CASE WHEN v2 >= 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN v2 >= 0 AND (v1 >= 0 OR v3 >= 0)
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN v2 >= 0 AND ((v1 >= 0 AND v1 <> v2)
                         OR (v3 >= 0 AND v3 <> v2))
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM v
    UNION ALL
    SELECT 'lf_merge',
           CAST(sum(CASE WHEN v3 >= 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN v3 >= 0 AND (v1 >= 0 OR v2 >= 0)
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN v3 >= 0 AND ((v1 >= 0 AND v1 <> v3)
                         OR (v2 >= 0 AND v2 <> v3))
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM v
    UNION ALL
    SELECT 'vote_1', CAST(sum(CASE WHEN lab = 1 THEN 1 ELSE 0 END)
                          AS BIGINT), 0, 0 FROM maj
    UNION ALL
    SELECT 'vote_0', CAST(sum(CASE WHEN lab = 0 THEN 1 ELSE 0 END)
                          AS BIGINT), 0, 0 FROM maj
    UNION ALL
    SELECT 'abstain', CAST(sum(CASE WHEN lab = -1 THEN 1 ELSE 0 END)
                           AS BIGINT), 0, 0 FROM maj
"""


# ====================================================== paired diversity


def q_paired_diversity(sf_dir):
    """Corpus diversity via HASH-PAIRED sampled pairwise Jaccard — the
    tractable stand-in for self-BLEU / all-pairs overlap (quadratic and
    impossible at 100 TB): documents are ordered by md5(doc_id) (a
    reproducible random shuffle), consecutive docs form pairs, and each
    pair's distinct-token Jaccard is emitted in ×10⁹ integer fixed
    point. n/2 pairs ≡ a uniform random pairing, so the mean is an
    unbiased diversity estimate at LINEAR cost, and the per-pair table
    (not just the mean) is the oracle-checked output.

    Scale plan: one distributed sort on the hash key; global
    row_numbers stitched from per-block counts (block-offset pattern);
    the partner join is ONE hash join on pair id; Jaccard is per-batch
    numpy/set work on pair-local data. Driver state: O(blocks) ints."""
    import ray.data as rd

    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _hk(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "hk": [hashlib.md5(str(int(d)).encode()).hexdigest()
                   for d in df["doc_id"]],
            "text": df["text"]})

    srt = docs.map_batches(_hk, batch_format="pandas") \
        .sort(["hk", "doc_id"]).materialize()
    refs = srt.to_arrow_refs()

    @ray.remote
    def _n(t: pa.Table) -> int:
        return t.num_rows

    ns = ray.get([_n.remote(r) for r in refs])
    offs = np.concatenate([[0], np.cumsum(ns)[:-1]])

    @ray.remote
    def _pairid(t: pa.Table, off: int) -> pa.Table:
        rn = np.arange(off + 1, off + 1 + t.num_rows, dtype=np.int64)
        return pa.table({
            "pid": pa.array((rn - 1) // 2, pa.int64()),
            "side": pa.array(rn % 2, pa.int64()),
            "doc_id": t["doc_id"], "text": t["text"]})

    sided = rd.from_arrow_refs(
        [_pairid.remote(r, int(offs[i])) for i, r in enumerate(refs)])
    a = sided.filter(expr="side == 1").drop_columns(["side"])
    b = sided.filter(expr="side == 0").map_batches(
        lambda t: pa.table({"pid_r": t["pid"], "doc_b": t["doc_id"],
                            "text_b": t["text"]}),
        batch_format="pyarrow")
    pairs = a.join(b, "inner", num_partitions=JOIN_PARTS,
                   on=("pid",), right_on=("pid_r",))

    def _jac(df: pd.DataFrame) -> pd.DataFrame:
        out = {"pid": [], "doc_a": [], "doc_b": [], "jac_fp": []}
        for pid, da, db, ta, tb in zip(
                df["pid"], df["doc_id"], df["doc_b"],
                df["text"], df["text_b"]):
            sa, sb = set(ta.split(" ")), set(tb.split(" "))
            inter = len(sa & sb)
            uni = len(sa | sb)
            out["pid"].append(int(pid))
            out["doc_a"].append(int(da))
            out["doc_b"].append(int(db))
            out["jac_fp"].append(inter * 10**9 // uni)
        return pd.DataFrame({k: pd.Series(v, dtype="int64")
                             for k, v in out.items()})

    return pairs.map_batches(_jac, batch_format="pandas")


ORACLES["paired_diversity"] = """
    WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk,
                      string_split(text, ' ') AS toks
               FROM documents),
    r AS (SELECT doc_id, toks,
                 row_number() OVER (ORDER BY hk, doc_id) AS rn FROM h),
    p AS (SELECT (rn - 1) // 2 AS pid, rn % 2 AS side, doc_id, toks
          FROM r)
    SELECT a.pid,
           a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(list_distinct(a.toks),
                                   list_distinct(b.toks)))
                * 1000000000
                // len(list_distinct(list_concat(a.toks, b.toks)))
                AS BIGINT) AS jac_fp
    FROM p a JOIN p b ON a.pid = b.pid AND a.side = 1 AND b.side = 0
"""


# ====================================================== k-center coreset


KCENTER_K = 8


def q_kcenter_coreset(sf_dir, k: int = KCENTER_K):
    """Greedy k-center CORESET selection over the embedding table
    (Gonzalez 1985 farthest-point traversal — the 2-approximation
    behind coreset/active-learning selection à la Sener & Savarese
    2018): seed with the min vec_id, then repeatedly pick the point
    farthest from the chosen set (ties → min id). Distances are exact
    integer squared L2 in the ×10⁶ fixed-point domain, so the greedy
    trajectory — each chosen center and its selection-time gain — is
    bit-deterministic and oracle-checked step by step (one unrolled CTE
    per round, pagerank-style).

    Scale plan: the state is ONE dataset (vec_id, embedding, dmin);
    each round is (a) a distributed top-1 (sort+limit — only one row
    reaches the driver), (b) a 64-int center broadcast by closure, and
    (c) a shuffle-free map lowering dmin. k rounds total, no joins, no
    driver materialization of anything point-sized."""
    from ray.data.aggregate import Min

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _xfp(b: pa.Table) -> np.ndarray:
        col = b["embedding"]
        la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        flat = la.values.to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // b.num_rows if b.num_rows else 0
        return _round_half_away(flat * 1e6).astype(np.int64) \
            .reshape(-1, d) if b.num_rows else np.zeros((0, 0), np.int64)

    c0 = int(emb.aggregate(Min("vec_id"))["min(vec_id)"])

    def _center_vec(ds, cid: int) -> np.ndarray:
        row = ds.filter(expr=f"vec_id == {cid}") \
            .take(1)[0]["embedding"]
        return _round_half_away(
            np.asarray(row, dtype=np.float64) * 1e6).astype(np.int64)

    cvec = _center_vec(emb, c0)

    def _init(b: pa.Table, _c=cvec) -> pa.Table:
        x = _xfp(b)
        d2 = ((x - _c) ** 2).sum(axis=1) if len(x) else \
            np.zeros(0, np.int64)
        return pa.table({"vec_id": b["vec_id"],
                         "embedding": b["embedding"],
                         "dmin": pa.array(d2, pa.int64())})

    state = emb.map_batches(_init, batch_format="pyarrow").materialize()
    rows = [(1, c0, 0)]
    for step in range(2, k + 1):
        top = state.sort(["dmin", "vec_id"],
                         descending=[True, False]).limit(1).take(1)[0]
        cid, gain = int(top["vec_id"]), int(top["dmin"])
        rows.append((step, cid, gain))
        cv = _center_vec(state, cid)

        def _lower(b: pa.Table, _c=cv) -> pa.Table:
            x = _xfp(b)
            d2 = ((x - _c) ** 2).sum(axis=1) if len(x) else \
                np.zeros(0, np.int64)
            return pa.table({
                "vec_id": b["vec_id"], "embedding": b["embedding"],
                "dmin": pa.array(np.minimum(
                    b["dmin"].to_numpy(zero_copy_only=False), d2),
                    pa.int64())})

        state = state.map_batches(_lower,
                                  batch_format="pyarrow").materialize()
    return pd.DataFrame({
        "step": pd.Series([r[0] for r in rows], dtype="int64"),
        "center_id": pd.Series([r[1] for r in rows], dtype="int64"),
        "gain_fp": pd.Series([r[2] for r in rows], dtype="int64")})


def _kcenter_oracle(k: int = KCENTER_K) -> str:
    head = """
    WITH efp AS (
        SELECT vec_id, gs AS j,
               CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                    AS BIGINT) AS xfp
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(gs)),
    c1 AS (SELECT min(vec_id) AS cid FROM embeddings),
    d1 AS (SELECT a.vec_id, sum((a.xfp - b.xfp) * (a.xfp - b.xfp)) AS d
           FROM efp a JOIN efp b
             ON b.vec_id = (SELECT cid FROM c1) AND b.j = a.j
           GROUP BY a.vec_id)"""
    body = ""
    for t in range(2, k + 1):
        body += f""",
    s{t} AS (SELECT vec_id AS cid, d AS gain FROM d{t - 1}
             ORDER BY d DESC, vec_id LIMIT 1),
    nd{t} AS (SELECT a.vec_id,
                     sum((a.xfp - b.xfp) * (a.xfp - b.xfp)) AS d
              FROM efp a JOIN efp b
                ON b.vec_id = (SELECT cid FROM s{t}) AND b.j = a.j
              GROUP BY a.vec_id),
    d{t} AS (SELECT p.vec_id, least(p.d, n.d) AS d
             FROM d{t - 1} p JOIN nd{t} n USING (vec_id))"""
    tail = """
    SELECT 1 AS step, (SELECT cid FROM c1) AS center_id,
           CAST(0 AS BIGINT) AS gain_fp"""
    for t in range(2, k + 1):
        tail += f"""
    UNION ALL SELECT {t}, (SELECT cid FROM s{t}),
           CAST((SELECT gain FROM s{t}) AS BIGINT)"""
    return head + body + tail


ORACLES["kcenter_coreset"] = _kcenter_oracle()


# ==================================================== 1-D Wasserstein


W1_BUCKET = 10  # chars per histogram bucket


def q_wasserstein_1d(sf_dir, bucket: int = W1_BUCKET):
    """Exact 1-D Wasserstein-1 (earth mover's) distance between the
    document-length distributions of the 'en' subcorpus and the rest —
    the transport-cost drift metric that complements q_ks_drift (sup of
    CDF gap) and q_psi_drift (binned likelihood): W₁ = Σ_buckets
    |CDF_a − CDF_b| · width. Computed over the COMMON integer scale
    n_a·n_b (|cum_a·n_b − cum_b·n_a| per bucket), so no probability is
    ever a float; the final value is the integer numerator plus its
    denominator — an exact rational.

    Scale plan: one map folds docs to (group, bucket) count partials —
    histogram-sized exchange; the CDF walk runs over the bucket-count-
    sized table on the driver (bounded by the value domain, not the
    corpus). At 100 TB this is the cheapest drift stat in the file."""
    docs = T(sf_dir, "documents", ["lang", "n_chars"])

    def _fold(b: pa.Table) -> pa.Table:
        grp = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
        bk = (b["n_chars"].to_numpy(zero_copy_only=False)
              // bucket).astype(np.int64)
        df = pd.DataFrame({"g": grp.astype(np.int64), "bk": bk})
        vc = df.groupby(["g", "bk"], sort=False).size().reset_index()
        return pa.table({"g": pa.array(vc["g"], pa.int64()),
                         "bk": pa.array(vc["bk"], pa.int64()),
                         "n": pa.array(vc[0], pa.int64())})

    h = fast_groupby_agg(
        docs.map_batches(_fold, batch_format="pyarrow"),
        ["g", "bk"], {"n": ("n", "sum")}).to_pandas()
    na = int(h.loc[h["g"] == 1, "n"].sum())
    nb = int(h.loc[h["g"] == 0, "n"].sum())
    bks = np.arange(int(h["bk"].max()) + 1)
    ca = np.zeros(len(bks), dtype=object)
    cb = np.zeros(len(bks), dtype=object)
    for _, r in h.iterrows():
        (ca if r["g"] == 1 else cb)[int(r["bk"])] += int(r["n"])
    cum_a = np.cumsum(ca)
    cum_b = np.cumsum(cb)
    num = int(sum(abs(int(x) * nb - int(y) * na)
                  for x, y in zip(cum_a, cum_b))) * bucket
    return pd.DataFrame({
        "n_en": [np.int64(na)], "n_rest": [np.int64(nb)],
        "w1_num": [np.int64(num)],
        "w1_den": [np.int64(na * nb)]})


ORACLES["wasserstein_1d"] = f"""
    WITH d AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g,
                      n_chars // {W1_BUCKET} AS bk
               FROM documents),
    h AS (SELECT bk,
                 sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS a,
                 sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS b
          FROM d GROUP BY bk),
    spine AS (SELECT unnest(generate_series(
                  0, (SELECT max(bk) FROM h))) AS bk),
    f AS (SELECT s.bk, coalesce(h.a, 0) AS a, coalesce(h.b, 0) AS b
          FROM spine s LEFT JOIN h ON h.bk = s.bk),
    tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM f),
    c AS (SELECT bk, sum(a) OVER (ORDER BY bk) AS ca,
                 sum(b) OVER (ORDER BY bk) AS cb FROM f)
    SELECT CAST(tot.na AS BIGINT) AS n_en,
           CAST(tot.nb AS BIGINT) AS n_rest,
           CAST((SELECT sum(abs(CAST(ca AS HUGEINT) * tot.nb
                                - CAST(cb AS HUGEINT) * tot.na))
                 FROM c) * {W1_BUCKET} AS BIGINT) AS w1_num,
           CAST(tot.na * tot.nb AS BIGINT) AS w1_den
    FROM tot
"""


# ======================================================= max drawdown


def q_max_drawdown(sf_dir):
    """Per-event-type MAXIMUM DRAWDOWN of the cumulative daily value
    series — the running peak-to-trough metric (finance risk, and the
    regression-depth statistic for any KPI time series): dd = max over
    days of (running-max of cumulative sum − cumulative sum), plus the
    day it bottoms (first such day on ties). Everything runs in ×10⁶
    integer cents of the value column, so peak/trough arithmetic is
    exact.

    Scale plan: one (type, day) fold collapses events to a
    calendar-bounded table (types × days rows); the sequential
    peak-tracking scan runs per type in a map_groups whose group size
    is the CALENDAR, not the data. The same shape as q_daily_ewma /
    q_holt_forecast."""
    ev = T(sf_dir, "events", ["event_type", "ts", "value"])

    def _fold(b: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(b["ts"], pa.date32()), pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        vf = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pylist(),
                           "d": d, "v": vf})
        g = df.groupby(["event_type", "d"], sort=False)["v"].sum() \
            .reset_index()
        return pa.table({
            "event_type": pa.array(g["event_type"], pa.string()),
            "d": pa.array(g["d"], pa.int64()),
            "v": pa.array(g["v"], pa.int64())})

    daily = fast_groupby_agg(
        ev.map_batches(_fold, batch_format="pyarrow"),
        ["event_type", "d"], {"v": ("v", "sum")})

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("d", kind="mergesort")
        cum = g["v"].to_numpy(np.int64).cumsum()
        peak = np.maximum.accumulate(cum)
        dd = peak - cum
        i = int(np.argmax(dd))  # first max on ties
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "max_dd_fp": [np.int64(dd[i])],
            "trough_day": [np.int64(g["d"].iloc[i])],
            "final_cum_fp": [np.int64(cum[-1])]})

    return daily.groupby("event_type").map_groups(
        _scan, batch_format="pandas")


ORACLES["max_drawdown"] = """
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS BIGINT) AS d,
               CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                    AS BIGINT) AS v
        FROM events GROUP BY event_type, d),
    c AS (SELECT event_type, d,
                 sum(v) OVER (PARTITION BY event_type ORDER BY d)
                     AS cum
          FROM daily),
    p AS (SELECT event_type, d, cum,
                 max(cum) OVER (PARTITION BY event_type ORDER BY d)
                     AS peak
          FROM c),
    dd AS (SELECT event_type, d, CAST(peak - cum AS BIGINT) AS dd, cum,
                  row_number() OVER (
                      PARTITION BY event_type
                      ORDER BY peak - cum DESC, d) AS rn
           FROM p),
    fin AS (SELECT event_type, CAST(max(cum) FILTER (
                WHERE d = (SELECT max(d) FROM daily dd2
                           WHERE dd2.event_type = p2.event_type))
                AS BIGINT) AS final_cum
            FROM p p2 GROUP BY event_type)
    SELECT dd.event_type, CAST(dd.dd AS BIGINT) AS max_dd_fp,
           CAST(dd.d AS BIGINT) AS trough_day,
           CAST(fin.final_cum AS BIGINT) AS final_cum_fp
    FROM dd JOIN fin ON fin.event_type = dd.event_type
    WHERE dd.rn = 1
"""


# ---------------------------------------------------------------------------
# Matching & linkage session: reciprocal best match, golden-record merge,
# Fellegi–Sunter blocked linkage, DBSCAN density profile, stable matching
# ---------------------------------------------------------------------------

def q_reciprocal_best_match(sf_dir):
    """Reciprocal best match — the mutual-argmin join used in record
    linkage and bilingual-lexicon induction: a (part, supplier) edge
    survives only if the supplier is that part's CHEAPEST source AND
    the part is that supplier's cheapest line, ties broken by the
    minimal counterpart key on both sides, over exact ×100 fixed-point
    minimum prices (both argmins rank identical integers).

    Plan: one partial-agg groupby collapses lineitem to its
    (part, supplier) min-price edge list; two mergeable grouped top-1
    passes (stages/fastagg.grouped_topk — per-block head, tree combine)
    pick each side's best edge; a hash join on the composite key keeps
    the mutual pairs. The exchange moves edge aggregates, never raw
    lineitem rows. Reference parity: generalizes the reference's
    best-candidate selection (fide_crawler.py search-result ranking)
    to a two-sided mutual criterion."""
    from ..stages.fastagg import grouped_topk

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": b["l_partkey"],
            "l_suppkey": b["l_suppkey"],
            "price_fp": pa.array(_round_half_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    ps = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_partkey", "l_suppkey", "l_extendedprice"]).map_batches(
            _fp, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], {"price_fp": ("price_fp", "min")})
    bp = grouped_topk(ps, ["l_partkey"], ["price_fp", "l_suppkey"],
                      [True, True], 1).drop_columns(["rank"])
    bs = grouped_topk(ps, ["l_suppkey"], ["price_fp", "l_partkey"],
                      [True, True], 1).drop_columns(["rank", "price_fp"])
    return bp.join(bs, "inner", num_partitions=JOIN_PARTS,
                   on=("l_partkey", "l_suppkey"))


ORACLES["reciprocal_best_match"] = """
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS price_fp
        FROM lineitem GROUP BY 1, 2),
    bp AS (
        SELECT l_partkey, l_suppkey, price_fp, row_number() OVER (
               PARTITION BY l_partkey ORDER BY price_fp, l_suppkey) AS rn
        FROM ps),
    bs AS (
        SELECT l_partkey, l_suppkey, row_number() OVER (
               PARTITION BY l_suppkey ORDER BY price_fp, l_partkey) AS rn
        FROM ps)
    SELECT bp.l_partkey, bp.l_suppkey, CAST(bp.price_fp AS BIGINT) AS price_fp
    FROM bp JOIN bs ON bp.l_partkey = bs.l_partkey
                   AND bp.l_suppkey = bs.l_suppkey
    WHERE bp.rn = 1 AND bs.rn = 1
"""


def q_golden_record(sf_dir):
    """Golden-record survivorship merge (MDM consolidation): one row
    per customer assembled from their order history under
    last-non-null-wins rules — the consolidated clerk comes from the
    newest FINALIZED order, the consolidated priority from the newest
    OPEN order (recency = (o_orderdate, o_orderkey)), plus the source
    count; customers whose history lacks a rule's evidence keep NULL
    for that attribute.

    Plan: each survivorship rule is a mergeable grouped top-1 over the
    rule's evidence subset (vectorized filter → grouped_topk on the
    int32-day + orderkey recency), left-outer-joined onto the
    per-customer count aggregate — three skinny aggregates exchange,
    the fact table never does."""
    from ..stages.fastagg import grouped_topk

    orders = T(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus",
                "o_totalprice", "o_orderpriority"])

    def _fp(t: pa.Table):
        return pa.array(_round_half_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64), pa.int64())

    base = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey"]), ["o_custkey"],
        {"n_src": (None, "count")})

    def _leg(status: str, out: str, value):
        def _f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b["o_orderstatus"], status))
            return pa.table({
                "custkey": t["o_custkey"],
                out: value(t),
                "d": t["o_orderdate"].cast(pa.int64()),  # µs since epoch
                "k": t["o_orderkey"],
            })

        top = grouped_topk(orders.map_batches(_f, batch_format="pyarrow"),
                           ["custkey"], ["d", "k"], [False, False], 1)
        return top.drop_columns(["rank", "d", "k"])

    j = base.join(
        _leg("F", "prio_final", lambda t: t["o_orderpriority"]),
        "left_outer", num_partitions=JOIN_PARTS, on=("o_custkey",),
        right_on=("custkey",))
    j = j.map_batches(
        lambda b: pa.table({
            "o_custkey": b["o_custkey"],
            "n_src": b["n_src"],
            "prio_final": b["prio_final"],
        }), batch_format="pyarrow")
    j = j.join(_leg("O", "open_price_fp", _fp), "left_outer",
               num_partitions=JOIN_PARTS, on=("o_custkey",),
               right_on=("custkey",))
    return j.map_batches(
        lambda b: pa.table({
            "custkey": b["o_custkey"],
            "n_src": b["n_src"],
            "prio_final": b["prio_final"],
            "open_price_fp": b["open_price_fp"],
        }), batch_format="pyarrow")


ORACLES["golden_record"] = """
    WITH base AS (
        SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_src
        FROM orders GROUP BY 1),
    f AS (
        SELECT o_custkey AS custkey, o_orderpriority AS prio_final,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderstatus = 'F'),
    o AS (
        SELECT o_custkey AS custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS open_price_fp,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderstatus = 'O')
    SELECT base.custkey, base.n_src, f.prio_final, o.open_price_fp
    FROM base
    LEFT JOIN f ON f.custkey = base.custkey AND f.rn = 1
    LEFT JOIN o ON o.custkey = base.custkey AND o.rn = 1
"""


# Fellegi–Sunter integer log-odds weights: quantized ln(m/u) constants
# (×1e6) for each agreement field, injected identically into the oracle.
FS_W_SIGN_A, FS_W_SIGN_D = 120_000, -80_000
FS_W_SUFFIX_A, FS_W_SUFFIX_D = 460_000, -5_000
FS_W_LENBAND_A, FS_W_LENBAND_D = 230_000, -40_000
FS_THRESHOLD = 500_000


def q_fellegi_sunter(sf_dir):
    """Fellegi–Sunter probabilistic record linkage over a blocked
    candidate space: customer and supplier records are blocked on
    nation (the classic blocking key); each candidate pair is scored
    by an agreement vector — balance-sign agreement, id-suffix
    agreement (the zero-padded name suffix, i.e. key mod 100), and
    balance-band agreement (cents shifted non-negative so floor and
    truncating division coincide across engines) — with fixed integer
    log-odds weights, keeping pairs at or above the decision
    threshold.

    Plan: ONE hash join on the blocking key (candidate volume =
    Σ_block |cust_b|·|supp_b| — the linkage-standard bound, never the
    full cross product), then purely vectorized integer scoring and
    filtering. At 100 TB the blocking key is the partitioner; a skewed
    block behaves like any hot join key (salt if needed)."""

    def _band(bal: np.ndarray) -> np.ndarray:
        # cents + 1e6 ≥ 0 for TPC-H balances (≥ −999.99), so numpy's
        # floor // equals DuckDB's truncating // — exact both sides
        cents = _round_half_away(bal * 100.0).astype(np.int64)
        return (cents + 1_000_000) // 100_000

    def _c(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": pa.array(k, pa.int64()),
            "nk": b["c_nationkey"].cast(pa.int64()),
            "c_sign": pa.array(bal >= 0.0),
            "c_suf": pa.array(k % 100, pa.int64()),
            "c_lb": pa.array(_band(bal), pa.int64()),
        })

    def _s(b: pa.Table) -> pa.Table:
        k = b["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bal = b["s_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table({
            "s_suppkey": pa.array(k, pa.int64()),
            "nk": b["s_nationkey"].cast(pa.int64()),
            "s_sign": pa.array(bal >= 0.0),
            "s_suf": pa.array(k % 100, pa.int64()),
            "s_lb": pa.array(_band(bal), pa.int64()),
        })

    j = T(sf_dir, "customer",
          ["c_custkey", "c_nationkey", "c_acctbal"]
          ).map_batches(_c, batch_format="pyarrow").join(
        T(sf_dir, "supplier",
          ["s_suppkey", "s_nationkey", "s_acctbal"]
          ).map_batches(_s, batch_format="pyarrow"),
        "inner", num_partitions=JOIN_PARTS, on=("nk",))

    def _score(b: pa.Table) -> pa.Table:
        def col(n):
            return b[n].to_numpy(zero_copy_only=False)

        sc = (np.where(col("c_sign") == col("s_sign"),
                       FS_W_SIGN_A, FS_W_SIGN_D)
              + np.where(col("c_suf") == col("s_suf"),
                         FS_W_SUFFIX_A, FS_W_SUFFIX_D)
              + np.where(col("c_lb") == col("s_lb"),
                         FS_W_LENBAND_A, FS_W_LENBAND_D)).astype(np.int64)
        m = sc >= FS_THRESHOLD
        return pa.table({
            "c_custkey": pa.array(col("c_custkey")[m], pa.int64()),
            "s_suppkey": pa.array(col("s_suppkey")[m], pa.int64()),
            "score": pa.array(sc[m], pa.int64()),
        })

    return j.map_batches(_score, batch_format="pyarrow")


ORACLES["fellegi_sunter"] = f"""
    SELECT c_custkey, s_suppkey, CAST(score AS BIGINT) AS score FROM (
        SELECT c_custkey, s_suppkey,
               CASE WHEN (c_acctbal >= 0) = (s_acctbal >= 0)
                    THEN {FS_W_SIGN_A} ELSE {FS_W_SIGN_D} END
             + CASE WHEN c_custkey % 100 = s_suppkey % 100
                    THEN {FS_W_SUFFIX_A} ELSE {FS_W_SUFFIX_D} END
             + CASE WHEN (CAST(round(c_acctbal * 100) AS BIGINT)
                          + 1000000) // 100000
                        = (CAST(round(s_acctbal * 100) AS BIGINT)
                           + 1000000) // 100000
                    THEN {FS_W_LENBAND_A} ELSE {FS_W_LENBAND_D} END AS score
        FROM customer JOIN supplier ON c_nationkey = s_nationkey)
    WHERE score >= {FS_THRESHOLD}
"""


DBSCAN_EPS = 2_000    # range radius on the GEO_DOMAIN² point grid
DBSCAN_MINPTS = 3     # core point = ≥3 other points within eps


def q_dbscan_core(sf_dir):
    """DBSCAN density profile — the grid-bucketed range COUNT that
    underlies density clustering (vs spatial_grid_nn's argmin): each
    customer point (same deterministic multiplicative-hash coordinates
    as spatial_grid_nn) counts the OTHER points within eps and flags
    cores (≥ minpts). Cluster labels over core-core edges would reuse
    the engine's connected-components; this query certifies the
    density kernel exactly.

    Plan: the self-join bucketizes on eps-sized grid cells — build
    side keyed by its own cell, probe side flat-mapped into the 3×3
    neighborhood, ONE hash join on cell id, exact integer distance
    filter INCLUDING the self-pair (distance 0), then a
    map-side-combined per-point count minus one. Counting the
    self-pair guarantees every point (isolated ones too) survives to
    the output without a join-back. Exchange is 10×|points| skinny
    rows; no all-pairs anywhere."""
    ncells = GEO_DOMAIN // DBSCAN_EPS
    eps2 = DBSCAN_EPS * DBSCAN_EPS

    def _build(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = _geo_xy(k, 0, 0)
        return pa.table({
            "bid": pa.array(k, pa.int64()),
            "cell": pa.array(
                (x // DBSCAN_EPS) * ncells + y // DBSCAN_EPS, pa.int64()),
            "bx": pa.array(x, pa.int64()),
            "by": pa.array(y, pa.int64()),
        })

    def _probe9(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = _geo_xy(k, 0, 0)
        cx, cy = x // DBSCAN_EPS, y // DBSCAN_EPS
        ks, xs, ys, cells = [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                gx, gy = cx + dx, cy + dy
                ok = (gx >= 0) & (gx < ncells) & (gy >= 0) & (gy < ncells)
                ks.append(k[ok]); xs.append(x[ok]); ys.append(y[ok])
                cells.append(gx[ok] * ncells + gy[ok])
        return pa.table({
            "id": pa.array(np.concatenate(ks), pa.int64()),
            "cell": pa.array(np.concatenate(cells), pa.int64()),
            "px": pa.array(np.concatenate(xs), pa.int64()),
            "py": pa.array(np.concatenate(ys), pa.int64()),
        })

    pts = T(sf_dir, "customer", ["c_custkey"])
    j = pts.map_batches(_probe9, batch_format="pyarrow").join(
        pts.map_batches(_build, batch_format="pyarrow"),
        "inner", num_partitions=JOIN_PARTS, on=("cell",))

    def _near(b: pa.Table) -> pa.Table:
        dx = (b["px"].to_numpy(zero_copy_only=False)
              - b["bx"].to_numpy(zero_copy_only=False))
        dy = (b["py"].to_numpy(zero_copy_only=False)
              - b["by"].to_numpy(zero_copy_only=False))
        ids = b["id"].to_numpy(zero_copy_only=False)
        m = dx * dx + dy * dy <= eps2   # self-pair (d2=0) stays in
        return pa.table({"id": pa.array(ids[m], pa.int64())})

    counts = fast_groupby_agg(
        j.map_batches(_near, batch_format="pyarrow"),
        ["id"], {"n_within": (None, "count")})

    def _fin(b: pa.Table) -> pa.Table:
        n = (b["n_within"].to_numpy(zero_copy_only=False)
             .astype(np.int64) - 1)
        return pa.table({
            "custkey": b["id"],
            "n_neighbors": pa.array(n, pa.int64()),
            "is_core": pa.array(n >= DBSCAN_MINPTS),
        })

    return counts.map_batches(_fin, batch_format="pyarrow")


ORACLES["dbscan_core"] = f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               (c_custkey * 2654435761) % {GEO_DOMAIN} AS x,
               (c_custkey * 97003969) % {GEO_DOMAIN} AS y
        FROM customer)
    SELECT a.id AS custkey,
           CAST(count(b.id) AS BIGINT) AS n_neighbors,
           count(b.id) >= {DBSCAN_MINPTS} AS is_core
    FROM pts a LEFT JOIN pts b
      ON b.id <> a.id
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         <= {DBSCAN_EPS * DBSCAN_EPS}
    GROUP BY a.id
"""


SM_CAP = 2   # each supplier holds up to SM_CAP customers (hospital–residents)


def _sm_score(a: int, b: int, salt: str) -> int:
    """Deterministic md5-derived preference score (higher = preferred);
    the two sides use different salts so their lists are independent."""
    return int.from_bytes(
        hashlib.md5(f"{salt}:{a}:{b}".encode()).digest()[:8], "big")


def _gale_shapley_market(cs: list[int], ss: list[int],
                         cap: int) -> list[tuple[int, int, int]]:
    """Deferred acceptance for one market: customers propose down their
    preference lists, each supplier holds its best ≤ cap proposals
    (evicting the worst when full). Proposer-optimal outcome is unique
    and independent of proposal order. Returns (custkey, suppkey,
    cust_rank 1-based)."""
    prefs = {c: sorted(ss, key=lambda s: (-_sm_score(c, s, "c"), s))
             for c in cs}
    nxt = {c: 0 for c in cs}
    held: dict[int, list] = {s: [] for s in ss}   # ascending (score, -c)
    free = sorted(cs, reverse=True)
    while free:
        c = free.pop()
        while nxt[c] < len(prefs[c]):
            s = prefs[c][nxt[c]]
            nxt[c] += 1
            cand = (_sm_score(s, c, "s"), -c)
            h = held[s]
            if len(h) < cap:
                h.append((cand, c))
                h.sort()
                break
            if cand > h[0][0]:
                evicted = h[0][1]
                h[0] = (cand, c)
                h.sort()
                free.append(evicted)
                break
    out = []
    for s, h in held.items():
        for _, c in h:
            out.append((c, s, prefs[c].index(s) + 1))
    out.sort()
    return out


def q_stable_matching(sf_dir):
    """Gale–Shapley stable matching (hospital–residents form): within
    each nation — an independent market and the natural partitioner —
    customers propose to that nation's suppliers in preference order
    and each supplier holds its best ≤ cap proposals; preferences are
    deterministic md5-derived scores so the proposer-optimal outcome
    is reproducible. Output: (nation, custkey, suppkey, cust_rank).
    Non-SQL-expressible (iterative deferred acceptance) → rows-only
    driver check; pytest certifies the no-blocking-pair invariant and
    replays an independent brute-force GS per market.

    Plan: both sides ship as skinny role-tagged rows into ONE
    groupby(nation).map_groups; each market solves in its own task
    (markets are bounded — the deferred-acceptance loop is
    O(|C|·|S| log) per market) and markets parallelize across the
    cluster with no cross-market state."""
    cust = T(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pa.table({
            "nation": b["c_nationkey"].cast(pa.int64()),
            "key": b["c_custkey"].cast(pa.int64()),
            "role": pa.array(np.zeros(b.num_rows, np.int8)),
        }), batch_format="pyarrow")
    supp = T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: pa.table({
            "nation": b["s_nationkey"].cast(pa.int64()),
            "key": b["s_suppkey"].cast(pa.int64()),
            "role": pa.array(np.ones(b.num_rows, np.int8)),
        }), batch_format="pyarrow")

    def _market(g: pd.DataFrame) -> pd.DataFrame:
        cs = sorted(int(k) for k in g.loc[g["role"] == 0, "key"])
        ss = sorted(int(k) for k in g.loc[g["role"] == 1, "key"])
        rows = (_gale_shapley_market(cs, ss, SM_CAP)
                if cs and ss else [])
        nation = np.int64(g["nation"].iloc[0])
        return pd.DataFrame({
            "nation": np.full(len(rows), nation, np.int64),
            "custkey": np.array([r[0] for r in rows], np.int64),
            "suppkey": np.array([r[1] for r in rows], np.int64),
            "cust_rank": np.array([r[2] for r in rows], np.int64),
        })

    return cust.union(supp).groupby("nation").map_groups(
        _market, batch_format="pandas")


def q_linkage_quality(sf_dir):
    """Blocking-quality audit for the Fellegi–Sunter linkage — the two
    standard record-linkage metrics: reduction ratio (how much of the
    cross product the nation blocking prunes) and pair completeness
    (what share of ground-truth matches — id-suffix-equal pairs, the
    linkage's strongest field — survive the blocking). Both emitted as
    exact ×1e9 integer ratios.

    Plan: everything is computed from per-nation / per-suffix /
    per-(nation,suffix) COUNT aggregates — three tiny groupbys and
    joins over count tables whose size is bounded by |nations|×100
    regardless of data scale; the candidate space itself is never
    enumerated."""
    nc = fast_groupby_agg(
        T(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            lambda b: pa.table({
                "nk": b["c_nationkey"].cast(pa.int64()),
                "sfx": pa.array(
                    b["c_custkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64) % 100, pa.int64()),
            }), batch_format="pyarrow"),
        ["nk", "sfx"], {"n": (None, "count")}).materialize()
    ns = fast_groupby_agg(
        T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            lambda b: pa.table({
                "nk": b["s_nationkey"].cast(pa.int64()),
                "sfx": pa.array(
                    b["s_suppkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64) % 100, pa.int64()),
            }), batch_format="pyarrow"),
        ["nk", "sfx"], {"n": (None, "count")}).materialize()

    def _sum_prod(left, right, keys):
        la = fast_groupby_agg(left, keys, {"n": ("n", "sum")})
        ra = fast_groupby_agg(right, keys, {"m": ("n", "sum")})
        j = la.join(ra.map_batches(
            lambda b: b.rename_columns([*keys, "m"]),
            batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=tuple(keys))
        prod = j.map_batches(
            lambda b: pa.table({"p": pc.multiply(b["n"], b["m"])}),
            batch_format="pyarrow")
        s = prod.sum("p")
        return int(s) if s is not None else 0

    n_candidates = _sum_prod(nc, ns, ["nk"])
    n_truth = _sum_prod(nc, ns, ["sfx"])
    n_truth_blocked = _sum_prod(nc, ns, ["nk", "sfx"])
    n_cust = int(nc.sum("n"))
    n_supp = int(ns.sum("n"))
    cross = n_cust * n_supp
    return pd.DataFrame([{
        "n_candidates": np.int64(n_candidates),
        "n_truth": np.int64(n_truth),
        "n_truth_blocked": np.int64(n_truth_blocked),
        "reduction_ratio_fp": np.int64(
            (cross - n_candidates) * 1_000_000_000 // max(cross, 1)),
        "completeness_fp": np.int64(
            n_truth_blocked * 1_000_000_000 // max(n_truth, 1)),
    }])


ORACLES["linkage_quality"] = """
    WITH tcn AS (SELECT c_nationkey AS nk, c_custkey % 100 AS sfx,
                        count(*) AS n FROM customer GROUP BY 1, 2),
    tsn AS (SELECT s_nationkey AS nk, s_suppkey % 100 AS sfx,
                   count(*) AS n FROM supplier GROUP BY 1, 2),
    cand AS (SELECT coalesce(sum(a.n * b.n), 0) AS v
             FROM (SELECT nk, sum(n) AS n FROM tcn GROUP BY nk) a
             JOIN (SELECT nk, sum(n) AS n FROM tsn GROUP BY nk) b
               USING (nk)),
    tru AS (SELECT coalesce(sum(a.n * b.n), 0) AS v
            FROM (SELECT sfx, sum(n) AS n FROM tcn GROUP BY sfx) a
            JOIN (SELECT sfx, sum(n) AS n FROM tsn GROUP BY sfx) b
              USING (sfx)),
    tb AS (SELECT coalesce(sum(a.n * b.n), 0) AS v
           FROM tcn a JOIN tsn b USING (nk, sfx)),
    x AS (SELECT (SELECT count(*) FROM customer)
                 * (SELECT count(*) FROM supplier) AS v)
    SELECT CAST(cand.v AS BIGINT) AS n_candidates,
           CAST(tru.v AS BIGINT) AS n_truth,
           CAST(tb.v AS BIGINT) AS n_truth_blocked,
           CAST((x.v - cand.v) * 1000000000
                // (CASE WHEN x.v = 0 THEN 1 ELSE x.v END)
                AS BIGINT) AS reduction_ratio_fp,
           CAST(tb.v * 1000000000
                // (CASE WHEN tru.v = 0 THEN 1 ELSE tru.v END)
                AS BIGINT) AS completeness_fp
    FROM cand, tru, tb, x
"""


FD_ELL = 16       # Frequent-Directions sketch rows
FD_DIM = 64       # embedding dimensionality (schema contract)


def _fd_shrink(mat: np.ndarray, ell: int) -> np.ndarray:
    """One Frequent-Directions shrink (Liberty 2013): SVD, subtract the
    ℓ-th squared singular value from all of them, keep the top ℓ
    re-scaled right-singular rows. Inputs with ≤ ℓ rows pass through
    zero-padded."""
    if mat.shape[0] <= ell:
        out = np.zeros((ell, mat.shape[1]))
        out[:mat.shape[0]] = mat
        return out
    _, s, vt = np.linalg.svd(mat, full_matrices=False)
    s2 = s * s
    delta = s2[ell - 1] if s2.shape[0] >= ell else 0.0
    s_new = np.sqrt(np.maximum(s2 - delta, 0.0))
    k = min(ell, vt.shape[0])
    out = np.zeros((ell, mat.shape[1]))
    out[:k] = s_new[:k, None] * vt[:k]
    return out


def _lazy_fd_final_task():
    @ray.remote
    def _t(ell: int, d: int, *tables: pa.Table) -> pa.Table:
        tabs = live_arrow(tables)
        B = np.zeros((ell, d))
        G = np.zeros((d, d))
        n_rows = 0
        for t in tabs:
            kind = t["kind"].to_numpy(zero_copy_only=False)
            vals = t["v"].combine_chunks() if isinstance(
                t["v"], pa.ChunkedArray) else t["v"]
            rows = [np.asarray(vals[i].as_py(), dtype=np.float64)
                    for i in range(len(vals))]
            bi = np.array([rows[i] for i in np.flatnonzero(kind == 0)])
            gi = np.array([rows[i] for i in np.flatnonzero(kind == 1)])
            for i in np.flatnonzero(kind == 2):
                n_rows += int(rows[i][0])
            if len(bi):
                B = _fd_shrink(np.vstack([B, bi]), ell)
            if len(gi):
                G += gi
        err = float(np.abs(np.linalg.eigvalsh(G - B.T @ B)).max())
        bound = float(np.trace(G) / ell)
        ok = err <= bound * (1.0 + 1e-9)
        if not ok:
            raise AssertionError(
                f"FD guarantee violated: err {err} > bound {bound}")
        return pa.table({
            "n_rows": pa.array([n_rows], pa.int64()),
            "d": pa.array([d], pa.int64()),
            "ell": pa.array([ell], pa.int64()),
            "spectral_err": pa.array([err], pa.float64()),
            "bound": pa.array([bound], pa.float64()),
            "ok": pa.array([ok]),
        })

    return _t


_fd_final_task_ref = None


def q_frequent_directions(sf_dir, ell: int = FD_ELL):
    """Frequent-Directions matrix sketch (Liberty 2013; Ghashami et al.
    2016 mergeability) over the n×64 embedding matrix: a deterministic
    ℓ×d sketch B with the provable guarantee ‖AᵀA − BᵀB‖₂ ≤ ‖A‖_F²/ℓ.
    The low-rank primitive behind streaming PCA/spectral pruning at
    corpus scale.

    Plan: each block emits its own shrink (ℓ×d) plus its exact Gram
    partial (d×d) and row count — partials are constant-sized no matter
    the corpus, merged associatively in ONE small final task (FD
    sketches are fully mergeable). The query gates its own guarantee
    IN-QUERY against the exact Gram (assert, not vibes) and emits the
    audit row. Float SVD is not SQL-expressible → rows-only driver
    check; pytest replays the guarantee and mergeability on raw
    numpy."""
    global _fd_final_task_ref
    if _fd_final_task_ref is None:
        _fd_final_task_ref = _lazy_fd_final_task()
    import ray.data as rd

    def _partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        la = col.combine_chunks() if isinstance(
            col, pa.ChunkedArray) else col
        flat = la.values.to_numpy(zero_copy_only=False).astype(np.float64)
        a = flat.reshape(-1, FD_DIM)
        bi = _fd_shrink(a, ell)
        gi = a.T @ a
        kinds = np.concatenate([
            np.zeros(ell, np.int8), np.ones(FD_DIM, np.int8), [2]])
        rows = ([bi[i] for i in range(ell)]
                + [gi[i] for i in range(FD_DIM)]
                + [np.array([float(a.shape[0])])])
        return pa.table({
            "kind": pa.array(kinds, pa.int8()),
            "v": pa.array([r.tolist() for r in rows],
                          pa.list_(pa.float64())),
        })

    part = T(sf_dir, "embeddings", ["embedding"]).map_batches(
        _partial, batch_format="pyarrow").materialize()
    ref = _fd_final_task_ref.remote(ell, FD_DIM, *part.to_arrow_refs())
    return rd.from_arrow_refs([ref])


CP_ROUNDS = 4    # ≤K-edge critical path (matches the unrolled oracle)


def q_dag_critical_path(sf_dir, rounds: int = CP_ROUNDS):
    """Longest (critical) path with predecessor tracking over the
    order-derived DAG — the max-plus sibling of graph_sssp PLUS path
    reconstruction, i.e. the scheduling kernel: edges keep only
    src < dst (acyclic by construction), weights w = okey//n mod 9 + 1;
    dist_K(v) = the longest ≤K-edge path ending at v and pred(v) its
    argmax predecessor, both carried in ONE packed integer
    dist·n + pred so the per-round reduce is a single mergeable max
    (ties → larger pred, stated). Unreached nodes keep dist 0 and the
    self-pred sentinel.

    Plan per round: front ⋈ edges hash join on src → packed candidate →
    map-side-combined max per dst → union-merge max with the previous
    front. The exchange is one row per node per round; no adjacency
    ever concentrates."""
    cust = T(sf_dir, "customer", ["c_custkey"]).materialize()
    n = int(cust.count())
    orders = T(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _e(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = k % n
        m = c < dst                       # DAG by construction
        return pa.table({
            "src": pa.array(c[m], pa.int64()),
            "dst": pa.array(dst[m], pa.int64()),
            "w": pa.array(((k[m] // n) % 9 + 1), pa.int64()),
        })

    edges = orders.map_batches(_e, batch_format="pyarrow").materialize()
    front = cust.map_batches(
        lambda b: pa.table({
            "node": b["c_custkey"].cast(pa.int64()),
            "pack": b["c_custkey"].cast(pa.int64()),  # dist 0, pred=self
        }), batch_format="pyarrow").materialize()
    for _ in range(rounds):
        cand = edges.join(
            front.map_batches(
                lambda b: b.rename_columns(["src", "p0"]),
                batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=("src",))
        cand = cand.map_batches(
            lambda b: pa.table({
                "node": b["dst"],
                "pack": pa.array(
                    (b["p0"].to_numpy(zero_copy_only=False) // n
                     + b["w"].to_numpy(zero_copy_only=False)) * n
                    + b["src"].to_numpy(zero_copy_only=False),
                    pa.int64()),
            }), batch_format="pyarrow")
        front = fast_groupby_agg(front.union(cand), ["node"],
                                 {"pack": ("pack", "max")}).materialize()
    return front.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "dist": pa.array(
                b["pack"].to_numpy(zero_copy_only=False) // n, pa.int64()),
            "pred": pa.array(
                b["pack"].to_numpy(zero_copy_only=False) % n, pa.int64()),
        }), batch_format="pyarrow")


def _cp_oracle(rounds: int = CP_ROUNDS) -> str:
    base = """
    WITH nn AS (SELECT count(*) AS n FROM customer),
    e AS (
        SELECT CAST(o_custkey AS BIGINT) AS src,
               CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst,
               CAST((o_orderkey // (SELECT n FROM nn)) % 9 + 1
                    AS BIGINT) AS w
        FROM orders
        WHERE o_custkey < o_orderkey % (SELECT n FROM nn)
    ),
    d0 AS (SELECT CAST(c_custkey AS BIGINT) AS node,
                  CAST(c_custkey AS BIGINT) AS pack FROM customer)"""
    for i in range(1, rounds + 1):
        base += f""",
    c{i} AS (SELECT e.dst AS node,
                    max((d.pack // (SELECT n FROM nn) + e.w)
                        * (SELECT n FROM nn) + d.node) AS pack
             FROM d{i - 1} d JOIN e ON e.src = d.node GROUP BY e.dst),
    d{i} AS (SELECT node, CAST(max(pack) AS BIGINT) AS pack FROM
             (SELECT * FROM d{i - 1} UNION ALL SELECT * FROM c{i})
             GROUP BY node)"""
    base += f"""
    SELECT node,
           CAST(pack // (SELECT n FROM nn) AS BIGINT) AS dist,
           CAST(pack % (SELECT n FROM nn) AS BIGINT) AS pred
    FROM d{rounds}
"""
    return base


ORACLES["dag_critical_path"] = _cp_oracle()


def q_vacuum_store(sf_dir):
    """Epoch lifecycle: snapshot-expiry VACUUM on the partitioned
    store. Documents land as four append epochs, epochs ≤ 2 are folded
    into one compacted ``base=`` dir by sources/store.vacuum (the
    crash-consistent base-epoch protocol: readers use only the max
    base and skip epochs ≤ it, so every crash point is consistent and
    re-running is idempotent), then the audit row proves rows and an
    integer checksum survived and that expired epoch dirs are gone.
    A vacuum that loses or duplicates rows fails the oracle."""
    import os as _os
    import shutil
    import tempfile

    from ..sources import store as S

    out = tempfile.mkdtemp(prefix="fcray_vacuum_")
    try:
        docs = T(sf_dir, "documents", ["doc_id", "n_chars"])
        for ep in range(4):
            part = docs.map_batches(
                lambda b, _ep=ep: b.filter(pc.equal(
                    pc.bit_wise_and(b["doc_id"], 3),
                    pa.scalar(_ep, b["doc_id"].type))),
                batch_format="pyarrow")
            S.write_epoch(part, out, "docs", ep)
        S.vacuum(out, "docs", 2)
        dirs = sorted(_os.listdir(_os.path.join(out, "docs")))
        back = S.read_all(out, "docs")
        agg = back.map_batches(
            lambda b: pa.table({
                "n_rows": pa.array([len(b)], pa.int64()),
                "id_sum": pa.array(
                    [int(b["doc_id"].to_numpy(
                        zero_copy_only=False).sum())], pa.int64()),
                "chars_sum": pa.array(
                    [int(b["n_chars"].to_numpy(
                        zero_copy_only=False).sum())], pa.int64()),
            }), batch_format="pyarrow").to_pandas()
        return pd.DataFrame([{
            "n_rows": int(agg["n_rows"].sum()),
            "id_sum": int(agg["id_sum"].sum()),
            "chars_sum": int(agg["chars_sum"].sum()),
            "vacuumed": bool(
                "base=00002" in dirs
                and not any(d.startswith("epoch=0000") and
                            int(d.split("=", 1)[1]) <= 2 for d in dirs
                            if not d.endswith(".tmp"))),
        }])
    finally:
        shutil.rmtree(out, ignore_errors=True)


ORACLES["vacuum_store"] = """
    SELECT count(*) AS n_rows,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           true AS vacuumed
    FROM documents
"""


def q_dp_histogram(sf_dir):
    """ε=1 differentially-private histogram release of the event-type
    counts under the discrete-Laplace mechanism, with SEEDED noise so
    the exact mechanism — not a stub — is oracle-certified end to end:
    Z = G₁ − G₂ (difference of iid geometrics ≡ discrete Laplace),
    Gᵢ = ⌊−ln(1−uᵢ)⌋ with ln α = −ε = −1, and uᵢ the md5-60-bit uniform
    of the bucket key. Both sides evaluate the identical float64
    expression through the same libm (math.log ≡ DuckDB ln on one
    host — the grouped_entropy ulp policy). A production release would
    use an unpredictable seed and omit n_true; this query certifies
    the mechanism's plumbing and calibration.

    Plan: one enum-sized count groupby, then a pure map adds the
    per-bucket noise — nothing beyond |event types| rows ever moves."""
    import math as _m

    counts = fast_groupby_agg(
        T(sf_dir, "events", ["event_type"]),
        ["event_type"], {"n_true": (None, "count")})

    def _noise(b: pa.Table) -> pa.Table:
        def geo(tag: str, t: str) -> int:
            u = int(hashlib.md5(f"{tag}:{t}".encode())
                    .hexdigest()[:15], 16) / 2.0 ** 60
            return int(_m.floor(-_m.log(1.0 - u)))

        z = np.array([geo("dp1", t) - geo("dp2", t)
                      for t in b["event_type"].to_pylist()], np.int64)
        return pa.table({
            "event_type": b["event_type"],
            "n_true": b["n_true"],
            "n_dp": pa.array(
                b["n_true"].to_numpy(zero_copy_only=False) + z,
                pa.int64()),
        })

    return counts.map_batches(_noise, batch_format="pyarrow")


ORACLES["dp_histogram"] = """
    WITH c AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
        FROM events GROUP BY 1)
    SELECT event_type, n_true,
           CAST(n_true
                + CAST(floor(-ln(1.0
                    - CAST(CAST(('0x' || substr(md5('dp1:' || event_type),
                                                1, 15)) AS BIGINT)
                          AS DOUBLE) / 1152921504606846976.0))
                      AS BIGINT)
                - CAST(floor(-ln(1.0
                    - CAST(CAST(('0x' || substr(md5('dp2:' || event_type),
                                                1, 15)) AS BIGINT)
                          AS DOUBLE) / 1152921504606846976.0))
                      AS BIGINT)
                AS BIGINT) AS n_dp
    FROM c
"""


MERKLE_PARTS = 32   # hash partitions compared between replicas


def q_merkle_partition_diff(sf_dir):
    """Replica anti-entropy (Merkle-style partition digests): both
    copies of a table fold each hash partition to ONE order-free
    digest — the per-row md5-60 fingerprints XOR-folded, so the digest
    is mergeable map-side and insensitive to row order/blocking — and
    only digests are exchanged to find the partitions needing sync
    (Dynamo/Cassandra repair at 32 digests per table, never row
    shipping). Replica B is a deterministic mutation of A (every
    doc_id ≡ 13 mod 97 dropped, every doc_id ≡ 7 mod 101 has n_chars
    +1), so `differs` pins exactly the touched partitions.

    Plan: one scan per replica → per-block per-partition XOR partials
    (sort + reduceat, vectorized) → a partition-count-sized map_groups
    XOR fold → join of the two digest tables. XOR never overflows and
    needs no row bound, unlike a sum digest."""

    def _parts(mutate: bool):
        def _f(b: pa.Table) -> pa.Table:
            did = b["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            nch = b["n_chars"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            if mutate:
                keep = did % 97 != 13
                did, nch = did[keep], nch[keep]
                nch = nch + (did % 101 == 7)
            h = np.array([
                int(hashlib.md5(f"{d}:{c}".encode()).hexdigest()[:15], 16)
                for d, c in zip(did.tolist(), nch.tolist())], np.int64)
            part = did % MERKLE_PARTS
            o = np.argsort(part, kind="mergesort")
            part, h = part[o], h[o]
            starts = np.flatnonzero(
                np.concatenate([[True], part[1:] != part[:-1]]))
            digest = np.bitwise_xor.reduceat(h, starts) if len(h) else \
                np.array([], np.int64)
            return pa.table({
                "part": pa.array(part[starts] if len(h) else part,
                                 pa.int64()),
                "x": pa.array(digest, pa.int64()),
            })

        def _fold(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "part": [np.int64(g["part"].iloc[0])],
                "x": [np.int64(np.bitwise_xor.reduce(
                    g["x"].to_numpy()))],
            })

        return (T(sf_dir, "documents", ["doc_id", "n_chars"])
                .map_batches(_f, batch_format="pyarrow")
                .groupby("part").map_groups(_fold, batch_format="pandas"))

    a = _parts(False)
    b = _parts(True).map_batches(
        lambda t: t.rename_columns(["part", "xb"]),
        batch_format="pyarrow")
    j = a.join(b, "full_outer", num_partitions=JOIN_PARTS, on=("part",))

    def _cmp(t: pa.Table) -> pa.Table:
        xa = t["x"].to_numpy(zero_copy_only=False)
        xb = t["xb"].to_numpy(zero_copy_only=False)
        xa = np.where(pc.is_null(t["x"]).to_numpy(
            zero_copy_only=False), -1, xa).astype(np.int64)
        xb = np.where(pc.is_null(t["xb"]).to_numpy(
            zero_copy_only=False), -1, xb).astype(np.int64)
        return pa.table({
            "part": t["part"],
            "hash_a": pa.array(xa, pa.int64()),
            "hash_b": pa.array(xb, pa.int64()),
            "differs": pa.array(xa != xb),
        })

    return j.map_batches(_cmp, batch_format="pyarrow")


ORACLES["merkle_partition_diff"] = f"""
    WITH a AS (
        SELECT doc_id % {MERKLE_PARTS} AS part,
               bit_xor(CAST(('0x' || substr(
                   md5(doc_id || ':' || n_chars), 1, 15)) AS BIGINT))
                   AS x
        FROM documents GROUP BY 1),
    b AS (
        SELECT doc_id % {MERKLE_PARTS} AS part,
               bit_xor(CAST(('0x' || substr(
                   md5(doc_id || ':' ||
                       (n_chars + CASE WHEN doc_id % 101 = 7
                                       THEN 1 ELSE 0 END)), 1, 15))
                   AS BIGINT)) AS x
        FROM documents WHERE doc_id % 97 <> 13 GROUP BY 1)
    SELECT coalesce(a.part, b.part) AS part,
           CAST(coalesce(a.x, -1) AS BIGINT) AS hash_a,
           CAST(coalesce(b.x, -1) AS BIGINT) AS hash_b,
           coalesce(a.x, -1) <> coalesce(b.x, -1) AS differs
    FROM a FULL OUTER JOIN b ON a.part = b.part
"""


FH_BUCKETS = 1024   # hashing-trick feature space (2^10)


def q_feature_hashing(sf_dir):
    """Hashing-trick featurization audit — the collision accounting
    every hashed-feature pipeline (Vowpal-Wabbit-style) needs before
    committing to a bucket count: every corpus token hashes to
    md5-60(token) mod 2^10 and the audit row reports distinct
    vocabulary size, buckets used, the worst bucket's vocabulary load,
    how many tokens share a bucket, and the share of token OCCURRENCES
    landing in shared buckets (exact ×1e9 integer).

    Plan: tokenize map → (token, n) vocabulary-sized count groupby →
    pure map to (bucket, n) → bucket-sized stats groupby → constant
    fold. Nothing larger than the vocabulary ever shuffles, and the
    final exchange is ≤ 2^10 rows regardless of corpus size."""

    def _tok(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        for txt in b["text"].to_pylist():
            toks.extend(_TOKEN.findall(txt.lower()))
        return pa.table({"term": pa.array(toks, pa.string())})

    vocab = fast_groupby_agg(
        T(sf_dir, "documents", ["text"]).map_batches(
            _tok, batch_format="pyarrow"),
        ["term"], {"n": (None, "count")})

    def _bucket(b: pa.Table) -> pa.Table:
        h = np.array([
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            % FH_BUCKETS for t in b["term"].to_pylist()], np.int64)
        return pa.table({
            "bucket": pa.array(h, pa.int64()),
            "n": b["n"],
            "one": pa.array(np.ones(len(h), np.int64)),
        })

    per_bucket = fast_groupby_agg(
        vocab.map_batches(_bucket, batch_format="pyarrow"),
        ["bucket"], {"n_terms": ("one", "sum"), "mass": ("n", "sum")})

    global _fh_audit_task
    if _fh_audit_task is None:
        _fh_audit_task = _lazy_fh_audit_task()
    import ray.data as rd
    refs = per_bucket.materialize().to_arrow_refs()
    return rd.from_arrow_refs([_fh_audit_task.remote(*refs)])


def _lazy_fh_audit_task():
    @ray.remote
    def _t(*tables: pa.Table) -> pa.Table:
        live = live_arrow(tables)
        b = pa.concat_tables(live)
        nt = b["n_terms"].to_numpy(zero_copy_only=False)
        mass = b["mass"].to_numpy(zero_copy_only=False)
        shared = nt > 1
        return pa.table({
            "n_tokens": pa.array([int(nt.sum())], pa.int64()),
            "n_buckets_used": pa.array([len(nt)], pa.int64()),
            "max_bucket_load": pa.array([int(nt.max())], pa.int64()),
            "n_collided_tokens": pa.array(
                [int(nt[shared].sum())], pa.int64()),
            "collision_mass_fp": pa.array(
                [int(mass[shared].sum()) * 1_000_000_000
                 // int(mass.sum())], pa.int64()),
        })

    return _t


_fh_audit_task = None


ORACLES["feature_hashing"] = f"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(lower(text),
                                            '[^a-z0-9_]+')) AS term
        FROM documents),
    v AS (SELECT term, count(*) AS n FROM tok WHERE term <> ''
          GROUP BY term),
    b AS (SELECT CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT)
                 % {1024} AS bucket,
                 count(*) AS n_terms, sum(n) AS mass
          FROM v GROUP BY 1)
    SELECT CAST(sum(n_terms) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_buckets_used,
           CAST(max(n_terms) AS BIGINT) AS max_bucket_load,
           CAST(coalesce(sum(n_terms) FILTER (WHERE n_terms > 1), 0)
                AS BIGINT) AS n_collided_tokens,
           CAST(coalesce(sum(mass) FILTER (WHERE n_terms > 1), 0)
                * 1000000000 // sum(mass) AS BIGINT) AS collision_mass_fp
    FROM b
"""


FAIR_PRICE_THRESHOLD = 150_000.0   # "model" decision boundary (cents/100)


def q_fairness_audit(sf_dir):
    """Group-fairness audit — demographic parity and equalized odds,
    the two gates a governed scoring pipeline reports before shipping a
    model: per market segment (the protected group), the positive-
    prediction rate (parity), and the TPR/FPR of the deterministic
    "classifier" pred = (o_totalprice > threshold) against the label
    y = (o_orderstatus = 'F'), all as exact ×1e9 integer ratios.

    Plan: orders hash-join customer for the group, then ONE grouped
    fold of four conditional counts (n, y, ŷ, y∧ŷ, ¬y∧ŷ) — enum-sized
    exchange — and a pure ratio map. No floats: ratios are integer
    ×1e9 floor divisions."""
    j = T(sf_dir, "orders",
          ["o_custkey", "o_totalprice", "o_orderstatus"]).join(
        T(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))

    def _flags(b: pa.Table) -> pa.Table:
        y = (pc.equal(b["o_orderstatus"], "F")
             .to_numpy(zero_copy_only=False)).astype(np.int64)
        yh = (b["o_totalprice"].to_numpy(zero_copy_only=False)
              > FAIR_PRICE_THRESHOLD).astype(np.int64)
        return pa.table({
            "grp": b["c_mktsegment"],
            "one": pa.array(np.ones(len(y), np.int64)),
            "y": pa.array(y, pa.int64()),
            "yh": pa.array(yh, pa.int64()),
            "tp": pa.array(y * yh, pa.int64()),
            "fp": pa.array((1 - y) * yh, pa.int64()),
        })

    agg = fast_groupby_agg(
        j.map_batches(_flags, batch_format="pyarrow"), ["grp"],
        {"n": ("one", "sum"), "ny": ("y", "sum"), "nyh": ("yh", "sum"),
         "ntp": ("tp", "sum"), "nfp": ("fp", "sum")})

    def _rates(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        ny = b["ny"].to_numpy(zero_copy_only=False)
        nyh = b["nyh"].to_numpy(zero_copy_only=False)
        ntp = b["ntp"].to_numpy(zero_copy_only=False)
        nfp = b["nfp"].to_numpy(zero_copy_only=False)
        e9 = 1_000_000_000
        return pa.table({
            "grp": b["grp"],
            "n": b["n"],
            "pos_rate_fp": pa.array(nyh * e9 // n, pa.int64()),
            "base_rate_fp": pa.array(ny * e9 // n, pa.int64()),
            "tpr_fp": pa.array(ntp * e9 // np.maximum(ny, 1), pa.int64()),
            "fpr_fp": pa.array(nfp * e9 // np.maximum(n - ny, 1),
                               pa.int64()),
        })

    return agg.map_batches(_rates, batch_format="pyarrow")


ORACLES["fairness_audit"] = f"""
    WITH f AS (
        SELECT c_mktsegment AS grp,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               CASE WHEN o_totalprice > {FAIR_PRICE_THRESHOLD}
                    THEN 1 ELSE 0 END AS yh
        FROM orders JOIN customer ON o_custkey = c_custkey),
    a AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS ny,
                 CAST(sum(yh) AS BIGINT) AS nyh,
                 CAST(sum(y * yh) AS BIGINT) AS ntp,
                 CAST(sum((1 - y) * yh) AS BIGINT) AS nfp
          FROM f GROUP BY grp)
    SELECT grp, n,
           CAST(nyh * 1000000000 // n AS BIGINT) AS pos_rate_fp,
           CAST(ny * 1000000000 // n AS BIGINT) AS base_rate_fp,
           CAST(ntp * 1000000000
                // (CASE WHEN ny = 0 THEN 1 ELSE ny END)
                AS BIGINT) AS tpr_fp,
           CAST(nfp * 1000000000
                // (CASE WHEN n - ny = 0 THEN 1 ELSE n - ny END)
                AS BIGINT) AS fpr_fp
    FROM a
"""


def q_qini_uplift(sf_dir):
    """Decile uplift curve (Qini-style causal model evaluation): events
    are deterministically split into treatment (user_id even) and
    control, "scored" into 10 md5 deciles, and for every cumulative
    decile prefix (best-scored first) the treated and control response
    rates (outcome = value > 0) and their ×1e9 integer uplift are
    reported — the uplift-model acceptance artifact.

    Plan: one pass folds (decile, arm) conditional counts — a ≤20-row
    exchange — then the cumulative prefix and ratio arithmetic run on
    that constant-sized table in a single final map."""

    def _flags(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dec = np.array([
            int(hashlib.md5(f"uplift:{u}".encode()).hexdigest()[:15], 16)
            % 10 for u in uid.tolist()], np.int64)
        t = (uid % 2 == 0).astype(np.int64)
        y = (b["value"].to_numpy(zero_copy_only=False) > 0).astype(
            np.int64)
        return pa.table({
            "decile": pa.array(dec, pa.int64()),
            "one": pa.array(np.ones(len(uid), np.int64)),
            "nt": pa.array(t, pa.int64()),
            "yt": pa.array(t * y, pa.int64()),
            "nc": pa.array(1 - t, pa.int64()),
            "yc": pa.array((1 - t) * y, pa.int64()),
        })

    agg = fast_groupby_agg(
        T(sf_dir, "events", ["user_id", "value"]).map_batches(
            _flags, batch_format="pyarrow"),
        ["decile"], {"nt": ("nt", "sum"), "yt": ("yt", "sum"),
                     "nc": ("nc", "sum"), "yc": ("yc", "sum")})

    def _curve(df: pd.DataFrame) -> pd.DataFrame:
        # "best" deciles first: descending decile index = descending
        # score by construction
        df = df.sort_values("decile", ascending=False).reset_index(
            drop=True)
        e9 = 1_000_000_000
        cnt, cyt = df["nt"].cumsum(), df["yt"].cumsum()
        cnc, cyc = df["nc"].cumsum(), df["yc"].cumsum()
        return pd.DataFrame({
            "decile": df["decile"].astype(np.int64),
            "cum_nt": cnt.astype(np.int64),
            "cum_yt": cyt.astype(np.int64),
            "cum_nc": cnc.astype(np.int64),
            "cum_yc": cyc.astype(np.int64),
            "uplift_fp": (cyt * e9 // cnt.clip(lower=1)
                          - cyc * e9 // cnc.clip(lower=1)).astype(
                              np.int64),
        })

    # the ≤10-row aggregate must be ONE block: the cumulative prefix is
    # computed in a single map over it
    return agg.repartition(1).map_batches(
        _curve, batch_format="pandas", batch_size=None)


ORACLES["qini_uplift"] = """
    WITH f AS (
        SELECT CAST(('0x' || substr(md5('uplift:' || user_id), 1, 15))
                    AS BIGINT) % 10 AS decile,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
               CASE WHEN value > 0 THEN 1 ELSE 0 END AS y
        FROM events),
    a AS (SELECT decile,
                 CAST(sum(t) AS BIGINT) AS nt,
                 CAST(sum(t * y) AS BIGINT) AS yt,
                 CAST(sum(1 - t) AS BIGINT) AS nc,
                 CAST(sum((1 - t) * y) AS BIGINT) AS yc
          FROM f GROUP BY decile),
    c AS (SELECT decile,
                 CAST(sum(nt) OVER w AS BIGINT) AS cum_nt,
                 CAST(sum(yt) OVER w AS BIGINT) AS cum_yt,
                 CAST(sum(nc) OVER w AS BIGINT) AS cum_nc,
                 CAST(sum(yc) OVER w AS BIGINT) AS cum_yc
          FROM a WINDOW w AS (ORDER BY decile DESC))
    SELECT decile, cum_nt, cum_yt, cum_nc, cum_yc,
           CAST(cum_yt * 1000000000
                // (CASE WHEN cum_nt = 0 THEN 1 ELSE cum_nt END)
                - cum_yc * 1000000000
                // (CASE WHEN cum_nc = 0 THEN 1 ELSE cum_nc END)
                AS BIGINT) AS uplift_fp
    FROM c
"""


LUBY_ROUNDS = 3
# packed unique priority q = (md5-39bit) · 2^24 + node: the node id
# breaks 39-bit hash ties exactly, valid to 2^24 (16.7M) nodes — beyond
# that widen to a two-column (p, node) compare on both sides.
_LUBY_P_MOD = 549_755_813_888      # 2^39
_LUBY_PACK = 16_777_216            # 2^24

_compact_task = None


def _compact_one_block(ds):
    """Rebuild a small dataset as ONE typed arrow block via a worker
    task. Needed when a hash-join OUTPUT is reused as a JOIN SIDE: its
    empty partitions are zero-COLUMN blocks that Ray's map passes
    through untouched, and a later join then fails with 'no match for
    FieldRef' on the schema-less block. Cost: one task holding the
    whole (small) dataset — callers must bound the input (here:
    winner sets, ≤ |undecided| skinny rows)."""
    global _compact_task
    if _compact_task is None:
        import ray as _ray

        @_ray.remote
        def _t(*tables: pa.Table) -> pa.Table:
            live = live_arrow(tables)
            return pa.concat_tables(live) if live else tables[0]

        _compact_task = _t
    import ray.data as rd

    return rd.from_arrow_refs(
        [_compact_task.remote(*ds.to_arrow_refs())])


def _luby_q(nodes: np.ndarray, rnd: int) -> np.ndarray:
    return np.array([
        (int(hashlib.md5(f"mis:{rnd}:{v}".encode()).hexdigest()[:15], 16)
         % _LUBY_P_MOD) * _LUBY_PACK + int(v)
        for v in nodes.tolist()], np.int64)


def q_luby_mis(sf_dir, rounds: int = LUBY_ROUNDS):
    """Luby's maximal-independent-set — THE textbook O(log n)-round
    parallel symmetry-breaking algorithm (Luby 1986), the primitive
    under distributed coloring/matching/scheduling: each round every
    undecided node draws a fresh md5 priority and joins the MIS iff it
    beats every undecided neighbor; its neighbors drop out. After K
    rounds each node reports status (1 = in MIS, 2 = removed,
    0 = undecided — a FIXED round budget keeps the oracle expressible,
    like pagerank/sssp) and the round that decided it.

    Plan per round: fresh priorities are a pure map over the undecided
    set; the winner test is ONE hash join of the symmetric edge list
    against the undecided set + a map-side-combined grouped MAX + a
    left-outer compare; removals are one more join. Everything moves
    one row per (edge|node) per round — no adjacency concentrates
    anywhere. Invariants (independence, maximality at decided nodes)
    are pytest-pinned against a sequential replay."""
    import ray.data as rd

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

    ne = fast_groupby_agg(raw.map_batches(_norm, batch_format="pyarrow"),
                          ["u", "v"], {"c": (None, "count")})
    ed = ne.map_batches(
        lambda b: pa.table({
            "src": pa.concat_arrays([
                b["u"].combine_chunks() if isinstance(b["u"], pa.ChunkedArray) else b["u"],
                b["v"].combine_chunks() if isinstance(b["v"], pa.ChunkedArray) else b["v"]]),
            "dst": pa.concat_arrays([
                b["v"].combine_chunks() if isinstance(b["v"], pa.ChunkedArray) else b["v"],
                b["u"].combine_chunks() if isinstance(b["u"], pa.ChunkedArray) else b["u"]]),
        }), batch_format="pyarrow").materialize()

    und = T(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: pa.table({"node": b["c_custkey"].cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    decided = []
    for r in range(1, rounds + 1):
        if und.count() == 0:
            # unique priorities ⇒ a non-empty undecided set always has
            # a winner, so an exhausted set is the only early exit
            break
        uq = und.map_batches(
            lambda b, _r=r: pa.table({
                "node": b["node"],
                "q": pa.array(_luby_q(
                    b["node"].to_numpy(zero_copy_only=False), _r),
                    pa.int64()),
            }), batch_format="pyarrow").materialize()
        nb = ed.join(
            uq.map_batches(lambda b: b.rename_columns(["dst", "qd"]),
                           batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=("dst",))
        mx = fast_groupby_agg(
            nb.map_batches(lambda b: pa.table(
                {"node": b["src"], "qd": b["qd"]}),
                batch_format="pyarrow"),
            ["node"], {"mq": ("qd", "max")})
        wj = uq.join(mx, "left_outer", num_partitions=JOIN_PARTS,
                     on=("node",))
        win = _compact_one_block(wj.map_batches(
            lambda b: pa.table({"node": b["node"].filter(pc.greater(
                b["q"], pc.fill_null(b["mq"], -1)))}),
            batch_format="pyarrow")).materialize()
        decided.append(win.map_batches(
            lambda b, _r=r: pa.table({
                "node": b["node"],
                "status": pa.array(np.ones(b.num_rows, np.int64)),
                "decided_round": pa.array(
                    np.full(b.num_rows, _r, np.int64)),
            }), batch_format="pyarrow"))
        # removed = undecided neighbors of winners (dedup via groupby)
        rem = fast_groupby_agg(
            ed.join(win.map_batches(
                lambda b: b.rename_columns(["src"]),
                batch_format="pyarrow"),
                "inner", num_partitions=JOIN_PARTS, on=("src",)
            ).map_batches(lambda b: pa.table({"node": b["dst"]}),
                          batch_format="pyarrow"),
            ["node"], {"c": (None, "count")})
        # compact: rem's groupby can be schema-less when no winner has
        # an undecided neighbor (all-isolated round); win anchors the
        # schema inside the compact task
        gone = _compact_one_block(win.union(rem.map_batches(
            lambda b: pa.table({"node": b["node"]})
            if b.num_columns else b,
            batch_format="pyarrow")))
        still = und.join(gone, "left_anti", num_partitions=JOIN_PARTS,
                         on=("node",)).materialize()
        # removed ∩ undecided (rem can name already-decided nodes)
        rem_u = und.join(
            still.union(win), "left_anti",
            num_partitions=JOIN_PARTS, on=("node",))
        decided.append(rem_u.map_batches(
            lambda b, _r=r: pa.table({
                "node": b["node"],
                "status": pa.array(np.full(b.num_rows, 2, np.int64)),
                "decided_round": pa.array(
                    np.full(b.num_rows, _r, np.int64)),
            }), batch_format="pyarrow"))
        und = still
    out = und.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "status": pa.array(np.zeros(b.num_rows, np.int64)),
            "decided_round": pa.array(np.zeros(b.num_rows, np.int64)),
        }), batch_format="pyarrow")
    for d in decided:
        out = out.union(d)
    return out


def _luby_oracle(rounds: int = LUBY_ROUNDS) -> str:
    def qe(r: int) -> str:
        return (f"(CAST(('0x' || substr(md5('mis:{r}:' || node), 1, 15)) "
                f"AS BIGINT) % {_LUBY_P_MOD}) * {_LUBY_PACK} + node")

    sql = """
    WITH nn AS (SELECT count(*) AS n FROM customer),
    raw AS (SELECT CAST(o_custkey AS BIGINT) AS s,
                   CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS d
            FROM orders),
    ne AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
           FROM raw WHERE s <> d),
    ed AS (SELECT u AS src, v AS dst FROM ne
           UNION ALL SELECT v, u FROM ne),
    u0 AS (SELECT CAST(c_custkey AS BIGINT) AS node FROM customer)"""
    for r in range(1, rounds + 1):
        sql += f""",
    q{r} AS (SELECT node, {qe(r)} AS q FROM u{r - 1}),
    w{r} AS (SELECT a.node FROM q{r} a
             LEFT JOIN ed e ON e.src = a.node
             LEFT JOIN q{r} b ON b.node = e.dst
             GROUP BY a.node, a.q
             HAVING a.q > coalesce(max(b.q), -1)),
    rm{r} AS (SELECT DISTINCT e.dst AS node
              FROM w{r} w JOIN ed e ON e.src = w.node
              WHERE e.dst IN (SELECT node FROM u{r - 1})
                AND e.dst NOT IN (SELECT node FROM w{r})),
    u{r} AS (SELECT node FROM u{r - 1}
             WHERE node NOT IN (SELECT node FROM w{r})
               AND node NOT IN (SELECT node FROM rm{r}))"""
    parts = [
        f"""SELECT node, CAST(1 AS BIGINT) AS status,
               CAST({r} AS BIGINT) AS decided_round FROM w{r}
        UNION ALL
        SELECT node, CAST(2 AS BIGINT), CAST({r} AS BIGINT) FROM rm{r}"""
        for r in range(1, rounds + 1)]
    parts.append(f"SELECT node, CAST(0 AS BIGINT), CAST(0 AS BIGINT) "
                 f"FROM u{rounds}")
    sql += "\n    " + "\n    UNION ALL\n    ".join(parts)
    return sql


ORACLES["luby_mis"] = _luby_oracle()


NEG_SAMPLES_K = 2
NEG_MAX_BROADCAST_VOCAB = 2_000_000   # same guard class as TFIDF's

_neg_cum_task = None


def q_negative_sampling(sf_dir, k: int = NEG_SAMPLES_K):
    """Unigram negative sampling (the word2vec/contrastive-training
    draw) — ALL-INTEGER inverse-CDF so the exact draws are
    oracle-certified: per document, k negatives are drawn by mapping
    the md5-60 uniform u to rank r = u·N ≫ 60 (exact in arbitrary-
    precision ints / HUGEINT) and locating r in the term-ordered
    cumulative unigram table. Plain unigram (not ^0.75) keeps both
    sides in exact integers — the tempered variant would hinge on
    pow() libm parity.

    Plan: one vocabulary-sized count groupby; ONE worker task sorts it
    and builds the (term, lo) cumulative table whose ObjectRef is read
    per actor process (driver never assembles it; vocabulary guarded
    at NEG_MAX_BROADCAST_VOCAB — beyond it, switch to the interval
    hash-join plan); drawing is then a pure map with one vectorized
    searchsorted per batch."""
    global _neg_cum_task
    if _neg_cum_task is None:
        @ray.remote
        def _cum(*tables: pa.Table) -> pa.Table:
            t = pa.concat_tables(live_arrow(tables))
            df = t.to_pandas().sort_values("term").reset_index(drop=True)
            n = df["n"].to_numpy().astype(np.int64)
            lo = np.concatenate([[0], np.cumsum(n)[:-1]])
            return pa.table({
                "term": pa.array(df["term"], pa.string()),
                "lo": pa.array(lo, pa.int64()),
            })

        _neg_cum_task = _cum

    def _tok(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        for txt in b["text"].to_pylist():
            toks.extend(_TOKEN.findall(txt.lower()))
        return pa.table({"term": pa.array(toks, pa.string())})

    vocab = fast_groupby_agg(
        T(sf_dir, "documents", ["text"]).map_batches(
            _tok, batch_format="pyarrow"),
        ["term"], {"n": (None, "count")}).materialize()
    if vocab.count() > NEG_MAX_BROADCAST_VOCAB:
        raise NotImplementedError(
            "vocabulary exceeds the broadcast guard; use the interval "
            "hash-join plan (rank BETWEEN lo AND hi) at this scale")
    total = int(vocab.sum("n"))
    cum_ref = _neg_cum_task.remote(*vocab.to_arrow_refs())

    def _draw(b: pa.Table) -> pa.Table:
        cum = ray.get(cum_ref)
        lo = cum["lo"].to_numpy(zero_copy_only=False)
        terms = cum["term"].to_pylist()
        dids, js, ranks = [], [], []
        for d in b["doc_id"].to_pylist():
            for j in range(k):
                u = int(hashlib.md5(f"neg:{d}:{j}".encode())
                        .hexdigest()[:15], 16)
                dids.append(int(d))
                js.append(j)
                ranks.append((u * total) >> 60)   # exact: python ints
        idx = np.searchsorted(lo, np.array(ranks, np.int64),
                              side="right") - 1
        return pa.table({
            "doc_id": pa.array(dids, pa.int64()),
            "j": pa.array(js, pa.int64()),
            "neg_term": pa.array([terms[i] for i in idx], pa.string()),
        })

    return T(sf_dir, "documents", ["doc_id"]).map_batches(
        _draw, batch_format="pyarrow")


ORACLES["negative_sampling"] = f"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(lower(text),
                                            '[^a-z0-9_]+')) AS term
        FROM documents),
    v AS (SELECT term, count(*) AS n FROM tok WHERE term <> ''
          GROUP BY term),
    c AS (SELECT term, n,
                 coalesce(sum(n) OVER (ORDER BY term
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS lo
          FROM v),
    d AS (SELECT doc_id, j FROM documents,
          (VALUES (0), (1)) t(j)),
    r AS (SELECT doc_id, CAST(j AS BIGINT) AS j,
                 CAST(CAST(('0x' || substr(
                     md5('neg:' || doc_id || ':' || j), 1, 15))
                     AS BIGINT) AS HUGEINT)
                 * (SELECT CAST(sum(n) AS HUGEINT) FROM v)
                 // 1152921504606846976 AS rk
          FROM d)
    SELECT r.doc_id, r.j, c.term AS neg_term
    FROM r JOIN c ON r.rk >= c.lo AND r.rk < c.lo + c.n
"""


def q_delta_join_view(sf_dir):
    """Incremental view maintenance of an aggregate JOIN view (the
    delta-join algebra streaming systems run): the materialized view
    V = Γ_segment(count, Σcents)(orders ⋈ customer) is maintained from
    snapshot V₀ (orders with okey ≡ 3 mod 23 absent) by joining ONLY
    the delta — ΔV = Γ(ΔO ⋈ C), V₁ = V₀ ⊎ ΔV — and the query emits the
    maintained V₁ with a per-group `consistent` flag against the full
    recompute (both computed; a drifting maintenance fails the oracle,
    which expects all-true).

    Plan: the incremental exchange is |ΔO| join rows + two enum-sized
    aggregates; the full recompute here exists only as the in-query
    certifier. At scale the recompute is the (rare) backfill path and
    the delta join is the steady state."""
    cust = T(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def _agg(orders_ds):
        j = orders_ds.join(cust, "inner", num_partitions=JOIN_PARTS,
                           on=("o_custkey",), right_on=("c_custkey",))
        return fast_groupby_agg(
            j.map_batches(
                lambda b: pa.table({
                    "c_mktsegment": b["c_mktsegment"],
                    "one": pa.array(np.ones(b.num_rows, np.int64)),
                    "cents": pa.array(_round_half_away(
                        b["o_totalprice"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64), pa.int64()),
                }), batch_format="pyarrow"),
            ["c_mktsegment"],
            {"n_orders": ("one", "sum"), "rev_fp": ("cents", "sum")})

    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_totalprice"])

    def _split(want_delta: bool):
        def _f(b: pa.Table) -> pa.Table:
            m = (b["o_orderkey"].to_numpy(zero_copy_only=False)
                 % 23) == 3
            return b.filter(pa.array(m if want_delta else ~m))

        return orders.map_batches(_f, batch_format="pyarrow")

    v0 = _agg(_split(False))
    dv = _agg(_split(True))
    v1 = fast_groupby_agg(
        v0.union(dv), ["c_mktsegment"],
        {"n_orders": ("n_orders", "sum"), "rev_fp": ("rev_fp", "sum")})
    full = _agg(orders).map_batches(
        lambda b: b.rename_columns(["c_mktsegment", "nf", "rf"]),
        batch_format="pyarrow")
    j = v1.join(full, "full_outer", num_partitions=JOIN_PARTS,
                on=("c_mktsegment",))

    def _chk(b: pa.Table) -> pa.Table:
        n = b["n_orders"].to_numpy(zero_copy_only=False)
        r = b["rev_fp"].to_numpy(zero_copy_only=False)
        nf = b["nf"].to_numpy(zero_copy_only=False)
        rf = b["rf"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_mktsegment": b["c_mktsegment"],
            "n_orders": b["n_orders"],
            "rev_fp": b["rev_fp"],
            "consistent": pa.array((n == nf) & (r == rf)),
        })

    return j.map_batches(_chk, batch_format="pyarrow")


ORACLES["delta_join_view"] = """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS rev_fp,
           true AS consistent
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


_dd_locate_task = None
DD_ALPHA = 0.01    # DDSketch relative-accuracy target
DD_QS = (100, 500, 900, 990)   # probed quantiles, ‰


def q_ddsketch_quantiles(sf_dir, alpha: float = DD_ALPHA):
    """DDSketch (Masson et al., VLDB 2019) — the relative-error
    quantile sketch whose buckets are mergeable integer counts, the
    modern alternative to rank-error sketches for long-tailed metrics:
    order totalprice cents land in log-γ buckets (γ=(1+α)/(1−α)), the
    bucket histogram merges as a plain grouped SUM, and each probed
    quantile's estimate 2γ^b/(γ+1) carries the PROVABLE guarantee
    |est−x_q| ≤ α·x_q. The query computes the exact quantile values
    beside the sketch (value-histogram sort + cumulative rank locate)
    and asserts the guarantee IN-QUERY — float log buckets are not
    SQL-reproducible, so this is a rows-only driver row with a hard
    self-gate, the ann_ivf_recall pattern.

    Plan: one pass → per-batch bucket partials (vectorized log) →
    bucket-sized grouped sum; the exact side is a distinct-value
    histogram (≤ |distinct cents| skinny rows), one sort, and a
    cumulative locate on block-offset arithmetic."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = math.log(gamma)

    def _cents(b: pa.Table) -> pa.Table:
        return pa.table({"cents": pa.array(_round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64), pa.int64())})

    cents = T(sf_dir, "orders", ["o_totalprice"]).map_batches(
        _cents, batch_format="pyarrow")

    def _bucket(b: pa.Table) -> pa.Table:
        x = b["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        bk = np.ceil(np.log(x) / lg).astype(np.int64)
        return pa.table({"bucket": pa.array(bk, pa.int64()),
                         "one": pa.array(np.ones(len(bk), np.int64))})

    sketch = fast_groupby_agg(
        cents.map_batches(_bucket, batch_format="pyarrow"),
        ["bucket"], {"n": ("one", "sum")}).materialize()
    hist = fast_groupby_agg(cents, ["cents"],
                            {"n": (None, "count")}).materialize()
    global _dd_locate_task
    if _dd_locate_task is None:
        @ray.remote
        def _loc(gamma: float, alpha: float, qs, n_sk: int,
                 *tables: pa.Table) -> pa.Table:
            # first n_sk tables are sketch partials, rest histogram —
            # the locate runs histogram-sized in THIS task, the driver
            # only ever sees the 4 probe rows
            sk = pa.concat_tables([t for t in tables[:n_sk]
                                   if t.num_rows])
            hx = pa.concat_tables([t for t in tables[n_sk:]
                                   if t.num_rows])
            skd = sk.to_pandas().sort_values("bucket")
            hxd = hx.to_pandas().sort_values("cents")
            n_total = int(hxd["n"].sum())
            sk_cum = skd["n"].cumsum().to_numpy()
            hx_cum = hxd["n"].cumsum().to_numpy()
            rows = []
            for qm in qs:
                r = (n_total - 1) * qm // 1000 + 1   # 1-based rank
                bi = int(np.searchsorted(sk_cum, r, side="left"))
                est = (2.0 * gamma ** int(skd["bucket"].iloc[bi])
                       / (gamma + 1.0))
                xi = int(np.searchsorted(hx_cum, r, side="left"))
                exact = float(hxd["cents"].iloc[xi])
                if abs(est - exact) > alpha * exact * (1.0 + 1e-9):
                    raise AssertionError(
                        f"DDSketch guarantee violated at q={qm}: "
                        f"est {est} exact {exact}")
                rows.append((qm, est, int(exact)))
            return pa.table({
                "q_mille": pa.array([r[0] for r in rows], pa.int64()),
                "est": pa.array([r[1] for r in rows], pa.float64()),
                "exact_cents": pa.array([r[2] for r in rows],
                                        pa.int64()),
                "ok": pa.array([True] * len(rows)),
            })

        _dd_locate_task = _loc
    import ray.data as rd

    sk_refs = sketch.to_arrow_refs()
    ref = _dd_locate_task.remote(gamma, alpha, list(DD_QS),
                                 len(sk_refs), *sk_refs,
                                 *hist.to_arrow_refs())
    return rd.from_arrow_refs([ref])


KTRUSS_K = 3        # keep edges in ≥1 triangle (support ≥ k−2)
KTRUSS_ROUNDS = 3   # fixed peel rounds (matches the unrolled oracle)


def q_ktruss(sf_dir, k: int = KTRUSS_K, rounds: int = KTRUSS_ROUNDS):
    """k-truss decomposition (Cohen 2008) — the edge-cohesion sibling
    of q_graph_kcore: iteratively peel every edge in fewer than k−2
    triangles; what survives is the densest collaboration core. A
    FIXED round budget keeps the oracle expressible (pagerank/sssp/
    luby_mis policy); output is each surviving edge with its
    recomputed final support.

    Plan per round: triangle support per edge via the standard wedge
    plan — symmetric adjacency self-joined on the center, ordered pair
    filter, ONE composite-key hash join against the edge set, grouped
    count — then an edge-set filter. Wedge volume is Σ deg(c)², the
    same cost surface as q_triangle_count (its WEDGE_BUDGET note
    applies); every exchange is edge- or wedge-shaped, never
    node²-shaped. Edge sets between rounds are compacted
    (_compact_one_block) because join outputs are reused as join
    sides."""
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

    e = fast_groupby_agg(
        raw.map_batches(_norm, batch_format="pyarrow"),
        ["u", "v"], {"c": (None, "count")}).map_batches(
        lambda b: pa.table({"u": b["u"], "v": b["v"]}),
        batch_format="pyarrow").materialize()

    def _support(edges):
        ed = edges.map_batches(
            lambda b: pa.table({
                "c": pa.concat_arrays([
                    b["u"].combine_chunks() if isinstance(
                        b["u"], pa.ChunkedArray) else b["u"],
                    b["v"].combine_chunks() if isinstance(
                        b["v"], pa.ChunkedArray) else b["v"]]),
                "x": pa.concat_arrays([
                    b["v"].combine_chunks() if isinstance(
                        b["v"], pa.ChunkedArray) else b["v"],
                    b["u"].combine_chunks() if isinstance(
                        b["u"], pa.ChunkedArray) else b["u"]]),
            }), batch_format="pyarrow")
        pairs = ed.join(
            ed.map_batches(lambda b: b.rename_columns(["c", "x2"]),
                           batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=("c",))
        wedges = pairs.map_batches(
            lambda b: pa.table({
                "u": b["x"].filter(pc.less(b["x"], b["x2"])),
                "v": b["x2"].filter(pc.less(b["x"], b["x2"])),
            }), batch_format="pyarrow")
        tri = wedges.join(edges, "inner", num_partitions=JOIN_PARTS,
                          on=("u", "v"))
        return fast_groupby_agg(tri, ["u", "v"],
                                {"support": (None, "count")})

    for _ in range(rounds):
        if e.count() == 0:
            break
        sup = _support(e)
        e = _compact_one_block(
            e.join(sup, "left_outer", num_partitions=JOIN_PARTS,
                   on=("u", "v")).map_batches(
                lambda b: pa.table({
                    "u": b["u"].filter(pc.greater_equal(
                        pc.fill_null(b["support"], 0), k - 2)),
                    "v": b["v"].filter(pc.greater_equal(
                        pc.fill_null(b["support"], 0), k - 2)),
                }), batch_format="pyarrow")).materialize()
    if e.count() == 0:
        return pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "support": pa.array([], pa.int64())})
    fin = e.join(_support(e), "left_outer", num_partitions=JOIN_PARTS,
                 on=("u", "v"))
    return fin.map_batches(
        lambda b: pa.table({
            "u": b["u"], "v": b["v"],
            "support": pc.cast(pc.fill_null(b["support"], 0),
                               pa.int64()),
        }), batch_format="pyarrow")


def _ktruss_oracle(k: int = KTRUSS_K, rounds: int = KTRUSS_ROUNDS) -> str:
    sql = """
    WITH nn AS (SELECT count(*) AS n FROM customer),
    raw AS (SELECT CAST(o_custkey AS BIGINT) AS s,
                   CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS d
            FROM orders),
    e0 AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
           FROM raw WHERE s <> d)"""
    for i in range(1, rounds + 1):
        sql += f""",
    ed{i - 1} AS (SELECT u AS c, v AS x FROM e{i - 1}
                  UNION ALL SELECT v, u FROM e{i - 1}),
    w{i} AS (SELECT a.x AS u, b.x AS v, count(*) AS sup
             FROM ed{i - 1} a JOIN ed{i - 1} b
               ON a.c = b.c AND a.x < b.x
             JOIN e{i - 1} e ON e.u = a.x AND e.v = b.x
             GROUP BY a.x, b.x),
    e{i} AS (SELECT e.u, e.v FROM e{i - 1} e
             JOIN w{i} w ON w.u = e.u AND w.v = e.v
             WHERE w.sup >= {k - 2})"""
    sql += f""",
    edF AS (SELECT u AS c, v AS x FROM e{rounds}
            UNION ALL SELECT v, u FROM e{rounds}),
    wF AS (SELECT a.x AS u, b.x AS v, count(*) AS sup
           FROM edF a JOIN edF b ON a.c = b.c AND a.x < b.x
           JOIN e{rounds} e ON e.u = a.x AND e.v = b.x
           GROUP BY a.x, b.x)
    SELECT e.u, e.v, CAST(coalesce(w.sup, 0) AS BIGINT) AS support
    FROM e{rounds} e LEFT JOIN wF w ON w.u = e.u AND w.v = e.v
"""
    return sql


ORACLES["ktruss"] = _ktruss_oracle()


COORD_PCT = 10   # coordinated sample keeps keys with md5 % 100 < 10


def q_coordinated_sample_join(sf_dir, pct: int = COORD_PCT):
    """Coordinated (shared-seed) key sampling — the sampling-theory
    primitive that makes SAMPLED JOINS meaningful: both orders and
    lineitem keep a key iff md5(orderkey) mod 100 < pct, so the same
    key survives on both sides and each key stratum is kept whole
    (independent per-side sampling would quadratically under-sample
    matches). The sampled join count scaled by 100/pct is the
    Horvitz–Thompson estimate of the true join size; the query emits
    both plus the exact ×1e9 sampling error, all in exact integers.

    Plan: the sample predicates are pure maps; join sizes come from
    per-key count aggregates joined on the key and a Σ o_cnt·l_cnt
    fold — the join itself is never materialized, only key-count
    tables exchange."""

    def _keys(tbl: str, keycol: str):
        def _f(b: pa.Table) -> pa.Table:
            k = b[keycol].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"k": pa.array(k, pa.int64())})

        return fast_groupby_agg(
            T(sf_dir, tbl, [keycol]).map_batches(
                _f, batch_format="pyarrow"),
            ["k"], {"n": (None, "count")})

    ok = _keys("orders", "o_orderkey")
    lk = _keys("lineitem", "l_orderkey").map_batches(
        lambda b: b.rename_columns(["k", "m"]), batch_format="pyarrow")
    j = ok.join(lk, "inner", num_partitions=JOIN_PARTS, on=("k",))

    def _fold(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        prod = (b["n"].to_numpy(zero_copy_only=False)
                * b["m"].to_numpy(zero_copy_only=False))
        keep = np.array([
            int(hashlib.md5(f"coord:{v}".encode()).hexdigest()[:15], 16)
            % 100 < pct for v in k.tolist()])
        return pa.table({
            "exact": pa.array([int(prod.sum())], pa.int64()),
            "sampled": pa.array([int(prod[keep].sum())], pa.int64()),
            "keys_kept": pa.array([int(keep.sum())], pa.int64()),
        })

    agg = fast_groupby_agg(
        j.map_batches(_fold, batch_format="pyarrow").map_batches(
            lambda b: pa.table({
                "g": pa.array(np.zeros(b.num_rows, np.int64)),
                "exact": b["exact"], "sampled": b["sampled"],
                "keys_kept": b["keys_kept"],
            }), batch_format="pyarrow"),
        ["g"], {"exact": ("exact", "sum"), "sampled": ("sampled", "sum"),
                "keys_kept": ("keys_kept", "sum")})

    def _est(b: pa.Table) -> pa.Table:
        ex = int(b["exact"].to_numpy(zero_copy_only=False)[0])
        sm = int(b["sampled"].to_numpy(zero_copy_only=False)[0])
        est = sm * 100 // pct
        return pa.table({
            "n_join_exact": pa.array([ex], pa.int64()),
            "n_join_sampled": pa.array([sm], pa.int64()),
            "ht_estimate": pa.array([est], pa.int64()),
            "keys_kept": b["keys_kept"],
            "rel_err_fp": pa.array(
                [abs(est - ex) * 1_000_000_000 // max(ex, 1)],
                pa.int64()),
        })

    return agg.map_batches(_est, batch_format="pyarrow")


ORACLES["coordinated_sample_join"] = f"""
    WITH ok AS (SELECT o_orderkey AS k, count(*) AS n
                FROM orders GROUP BY 1),
    lk AS (SELECT l_orderkey AS k, count(*) AS m
           FROM lineitem GROUP BY 1),
    j AS (SELECT ok.k, ok.n * lk.m AS prod,
                 CAST(('0x' || substr(md5('coord:' || ok.k), 1, 15))
                      AS BIGINT) % 100 < {COORD_PCT} AS keep
          FROM ok JOIN lk ON ok.k = lk.k),
    a AS (SELECT CAST(sum(prod) AS BIGINT) AS exact,
                 CAST(coalesce(sum(prod) FILTER (WHERE keep), 0)
                      AS BIGINT) AS sampled,
                 CAST(coalesce(sum(CASE WHEN keep THEN 1 ELSE 0 END), 0)
                      AS BIGINT) AS keys_kept
          FROM j)
    SELECT exact AS n_join_exact, sampled AS n_join_sampled,
           CAST(sampled * 100 // {COORD_PCT} AS BIGINT) AS ht_estimate,
           keys_kept,
           CAST(abs(sampled * 100 // {COORD_PCT} - exact) * 1000000000
                // (CASE WHEN exact = 0 THEN 1 ELSE exact END)
                AS BIGINT) AS rel_err_fp
    FROM a
"""


# ================================================== temporal reachability

TR_ROUNDS = 4  # fixed relax rounds (matches the unrolled oracle)


def _temporal_edges(sf_dir, n_nodes: int):
    """Deterministic temporal link graph over the customer node domain:
    one edge per order, src = o_custkey, dst = o_orderkey mod n, active
    at t = epoch-microseconds(o_orderdate) — the timestamped sibling of
    _pagerank_edges (same derived-input pattern)."""
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate"])

    def _e(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        c = b["o_custkey"].to_numpy(zero_copy_only=False)
        t = _ts_ns(b["o_orderdate"]) // 1000  # ns → µs (epoch_us parity)
        return pa.table({
            "src": pa.array(c.astype(np.int64), pa.int64()),
            "dst": pa.array((k % n_nodes).astype(np.int64), pa.int64()),
            "t": pa.array(t.astype(np.int64), pa.int64()),
        })

    return orders.map_batches(_e, batch_format="pyarrow")


def q_temporal_reachability(sf_dir, rounds: int = TR_ROUNDS):
    """Time-respecting reachability (earliest-arrival temporal paths,
    Wu et al. VLDB'14 shape): a node v is reached when there is a path
    from node 0 whose edge timestamps are NON-DECREASING, and ea(v) is
    the minimum arrival time over such paths. Unlike q_graph_bfs (hop
    metric) or q_label_reachability (label-constrained), the frontier
    here carries the arrival TIME and an edge relaxes only if its
    timestamp is ≥ the frontier's — the temporal-graph traversal every
    contact-tracing / information-diffusion pipeline runs. A FIXED
    round budget keeps the oracle expressible (pagerank/bfs policy);
    unreached-within-rounds nodes report −1.

    Scale plan: per round ONE hash join (edges ⋈ frontier on src), a
    vectorized t ≥ ea filter, union with the current estimate and a
    map-side-combined min-groupby — every exchange is edge- or
    node-shaped, the frontier is a node-sized Dataset, never driver
    state. Frontier sets between rounds are compacted
    (_compact_one_block) because join outputs are reused as join
    sides."""
    import ray.data as rd

    n = T(sf_dir, "customer", ["c_custkey"]).count()
    edges = _temporal_edges(sf_dir, n).materialize()
    ea = rd.from_arrow(pa.table({
        "node": pa.array([0], pa.int64()),
        "ea": pa.array([0], pa.int64()),
    }))
    for _ in range(rounds):
        j = edges.join(ea, "inner", num_partitions=JOIN_PARTS,
                       on=("src",), right_on=("node",))

        def _step(b: pa.Table) -> pa.Table:
            ok = pc.greater_equal(b["t"], b["ea"])
            return pa.table({
                "node": b["dst"].filter(ok),
                "ea": b["t"].filter(ok),
            })

        stepped = j.map_batches(_step, batch_format="pyarrow")
        ea = _compact_one_block(fast_groupby_agg(
            stepped.union(ea), ["node"], {"ea": ("ea", "min")},
        )).materialize()
    out = T(sf_dir, "customer", ["c_custkey"]).join(
        ea, "left_outer", num_partitions=JOIN_PARTS,
        on=("c_custkey",), right_on=("node",))
    return out.map_batches(
        lambda b: pa.table({
            "node": b["c_custkey"],
            "ea_us": pc.cast(pc.fill_null(b["ea"], -1), pa.int64()),
        }), batch_format="pyarrow")


def _temporal_reachability_oracle(rounds: int = TR_ROUNDS) -> str:
    """Unrolled earliest-arrival relaxation: each level joins the
    previous estimate against the temporal edge set under t ≥ ea and
    min-compacts per node (ktruss/pagerank unrolled-CTE policy)."""
    lvls = ["ea0 AS (SELECT CAST(0 AS BIGINT) AS node,"
            " CAST(0 AS BIGINT) AS ea)"]
    for i in range(rounds):
        lvls.append(f"""ea{i + 1} AS (
            SELECT node, min(ea) AS ea FROM (
                SELECT node, ea FROM ea{i}
                UNION ALL
                SELECT e.dst, e.t FROM e
                JOIN ea{i} ON e.src = ea{i}.node AND e.t >= ea{i}.ea
            ) GROUP BY node)""")
    return f"""
        WITH nn AS (SELECT count(*) AS c FROM customer),
        e AS (
            SELECT o_custkey AS src,
                   o_orderkey % (SELECT c FROM nn) AS dst,
                   epoch_us(o_orderdate) AS t
            FROM orders
        ),
        {", ".join(lvls)}
        SELECT c.c_custkey AS node,
               CAST(COALESCE(ea{rounds}.ea, -1) AS BIGINT) AS ea_us
        FROM customer c LEFT JOIN ea{rounds} ON ea{rounds}.node = c.c_custkey
    """


ORACLES["temporal_reachability"] = _temporal_reachability_oracle()


# ====================================================== Katz centrality

KATZ_ROUNDS = 3
KATZ_SCALE = 1_000_000
KATZ_ALPHA_DIV = 4  # attenuation α = 1/4 as exact integer floor division


def q_katz_centrality(sf_dir, rounds: int = KATZ_ROUNDS):
    """Katz centrality (fixed-iteration truncation of
    Σ_k α^k·A^k·1): x_{i+1}(v) = SCALE + Σ_{(u,v)∈E} x_i(u)//4, edge
    MULTIPLICITY kept (one edge per order — the weighted variant), all
    arithmetic integer fixed-point so engine and oracle agree bitwise
    (pagerank policy: no float libm anywhere). Complements q_pagerank
    (degree-normalized) and q_hits_scores (mutual reinforcement) with
    the attenuated-path-count member of the centrality family.

    Scale plan: per round one hash join (node-sized x ⋈ edge set on
    src), per-edge floor-divided contribution, map-side-combined sum by
    dst, then a left join back onto the node domain — exchanges are
    edge-shaped, x is node-shaped, nothing on the driver."""
    n = T(sf_dir, "customer", ["c_custkey"]).count()
    edges = _pagerank_edges(sf_dir, n).materialize()
    nodes = T(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: pa.table({"node": b["c_custkey"]}),
        batch_format="pyarrow").materialize()
    x = nodes.map_batches(
        lambda b: b.append_column("x", pa.array(
            np.full(b.num_rows, KATZ_SCALE, np.int64))),
        batch_format="pyarrow")
    for _ in range(rounds):
        j = edges.join(x, "inner", num_partitions=JOIN_PARTS,
                       on=("src",), right_on=("node",))
        contrib = j.map_batches(
            lambda b: pa.table({
                "dst": b["dst"],
                "c": pa.array(
                    b["x"].to_numpy(zero_copy_only=False)
                    // KATZ_ALPHA_DIV, pa.int64()),
            }), batch_format="pyarrow")
        s = fast_groupby_agg(contrib, ["dst"], {"v": ("c", "sum")})
        x = _compact_one_block(nodes.join(
            s, "left_outer", num_partitions=JOIN_PARTS,
            on=("node",), right_on=("dst",)).map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "x": pc.cast(pc.add(pc.fill_null(b["v"], 0),
                                    KATZ_SCALE), pa.int64()),
            }), batch_format="pyarrow")).materialize()
    return x.map_batches(
        lambda b: pa.table({"node": b["node"], "katz_fp": b["x"]}),
        batch_format="pyarrow")


def _katz_oracle(rounds: int = KATZ_ROUNDS) -> str:
    lvls = [f"x0 AS (SELECT c_custkey AS node, "
            f"CAST({KATZ_SCALE} AS BIGINT) AS x FROM customer)"]
    for i in range(rounds):
        lvls.append(f"""x{i + 1} AS (
            SELECT n.node,
                   CAST({KATZ_SCALE} + COALESCE(s.v, 0) AS BIGINT) AS x
            FROM x0 n LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(sum(x{i}.x // {KATZ_ALPHA_DIV}) AS BIGINT) AS v
                FROM e JOIN x{i} ON e.src = x{i}.node
                GROUP BY 1
            ) s ON s.node = n.node)""")
    return f"""
        WITH nn AS (SELECT count(*) AS c FROM customer),
        e AS (
            SELECT o_custkey AS src,
                   o_orderkey % (SELECT c FROM nn) AS dst
            FROM orders
        ),
        {", ".join(lvls)}
        SELECT node, x AS katz_fp FROM x{rounds}
    """


ORACLES["katz_centrality"] = _katz_oracle()


# ====================================== inclusion-dependency discovery

# candidate key-typed columns (table, column) — the unary IND search
# space; 30 ordered pairs are audited in ONE pass
IND_COLS = [
    ("orders", "o_custkey"),
    ("customer", "c_custkey"),
    ("lineitem", "l_orderkey"),
    ("orders", "o_orderkey"),
    ("lineitem", "l_suppkey"),
    ("supplier", "s_suppkey"),
]


def q_ind_discovery(sf_dir):
    """Unary inclusion-dependency discovery (the SPIDER/BINDER shape,
    see Papenbrock et al.): for every ORDERED pair (A, B) of candidate
    key columns, does value-set(A) ⊆ value-set(B)? Reports distinct(A),
    the violation count |A \\ B| and a holds flag — the candidate-FK
    profiling pass schema-discovery tools run before q_fk_integrity can
    even be configured (fk_integrity audits KNOWN relations; this
    DISCOVERS them).

    Scale plan — one shuffle for all 30 pairs, never a join per pair:
    each column is reduced to per-batch-distinct (value, bit) rows
    (np.unique inside map_batches), one groupby dedupes (value, bit)
    globally, a second map-side-combined sum-groupby ORs the bits into
    one membership BITMASK per value (each column contributes its bit
    exactly once post-dedupe, so sum == bitwise-or), and every pair's
    distinct/violation counts are then PARTIAL-AGGREGATED from the
    bitmask batches (a constant 30-pair loop over vectorized numpy
    masks) into a 30-row table. The exchange is value-set-shaped; the
    driver sees 30 rows."""
    import ray.data as rd

    parts = []
    for i, (tbl, col) in enumerate(IND_COLS):
        def _dist(b: pa.Table, _i=i, _c=col) -> pa.Table:
            v = np.unique(
                b[_c].to_numpy(zero_copy_only=False).astype(np.int64))
            return pa.table({
                "v": pa.array(v, pa.int64()),
                "m": pa.array(np.full(len(v), 1 << _i, np.int64)),
            })

        parts.append(T(sf_dir, tbl, [col]).map_batches(
            _dist, batch_format="pyarrow"))
    u = parts[0].union(*parts[1:])
    dd = fast_groupby_agg(u, ["v", "m"], {"c": (None, "count")})
    masks = fast_groupby_agg(
        dd.map_batches(lambda b: pa.table({"v": b["v"], "m": b["m"]}),
                       batch_format="pyarrow"),
        ["v"], {"mask": ("m", "sum")})

    k = len(IND_COLS)

    def _pairs(b: pa.Table) -> pa.Table:
        m = b["mask"].to_numpy(zero_copy_only=False)
        ai, bi, nd, nv = [], [], [], []
        for a in range(k):
            in_a = (m >> a) & 1
            da = int(in_a.sum())
            for bb in range(k):
                if a == bb:
                    continue
                ai.append(a)
                bi.append(bb)
                nd.append(da)
                nv.append(int((in_a & (1 - ((m >> bb) & 1))).sum()))
        return pa.table({
            "a": pa.array(ai, pa.int64()), "b": pa.array(bi, pa.int64()),
            "nd": pa.array(nd, pa.int64()), "nv": pa.array(nv, pa.int64()),
        })

    partial = masks.map_batches(_pairs, batch_format="pyarrow")
    agg = fast_groupby_agg(partial, ["a", "b"], {
        "n_distinct_a": ("nd", "sum"),
        "n_violations": ("nv", "sum"),
    })

    def _names(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        nv = b["n_violations"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a_col": pa.array([IND_COLS[i][1] for i in a]),
            "b_col": pa.array([IND_COLS[i][1] for i in bb]),
            "n_distinct_a": pc.cast(b["n_distinct_a"], pa.int64()),
            "n_violations": pc.cast(b["n_violations"], pa.int64()),
            "holds": pa.array((nv == 0).astype(np.int64), pa.int64()),
        })

    return agg.map_batches(_names, batch_format="pyarrow")


def _ind_oracle() -> str:
    sels = []
    for (ta, ca) in IND_COLS:
        for (tb, cb) in IND_COLS:
            if (ta, ca) == (tb, cb):
                continue
            sels.append(f"""
        SELECT '{ca}' AS a_col, '{cb}' AS b_col,
               (SELECT count(DISTINCT {ca}) FROM {ta}) AS n_distinct_a,
               (SELECT count(*) FROM
                   (SELECT DISTINCT {ca} AS v FROM {ta}) da
                WHERE v NOT IN (SELECT {cb} FROM {tb})) AS n_violations""")
    body = " UNION ALL ".join(sels)
    return f"""
        SELECT a_col, b_col,
               CAST(n_distinct_a AS BIGINT) AS n_distinct_a,
               CAST(n_violations AS BIGINT) AS n_violations,
               CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS holds
        FROM ({body})
    """


ORACLES["ind_discovery"] = _ind_oracle()


# ============================================ Chao1 richness estimator

CHAO_PCT = 30  # md5-keyed basket sample rate (%)


def q_chao1_distinct(sf_dir, pct: int = CHAO_PCT):
    """Chao1 species-richness estimate (Chao 1984, the
    capture-recapture sibling of q_kmv_distinct / q_hll_distinct): from
    a deterministic md5-keyed ~pct% sample of ORDERS, the per-customer
    capture frequencies give f1 (singletons) and f2 (doubletons), and
    d_obs + f1·(f1−1)//(2·(f2+1)) (the bias-corrected integer form)
    estimates the TRUE number of distinct customers — the estimator a
    profiler uses when it can only afford to scan a sample but must
    report full-data distinct cardinality. The exact distinct count and
    the estimator's realized relative error ride along, so the oracle
    certifies the estimator itself (kmv/coordinated-sample policy); all
    arithmetic is integer.

    Scale plan: the sample filter is a per-batch md5 map, frequencies
    are ONE map-side-combined count-groupby (key-shaped exchange), and
    f1/f2/d_obs plus the exact distinct reduce through batch partials
    into a single-row table — nothing driver-sized anywhere."""
    orders = T(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _sample(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        keep = np.array([
            int(hashlib.md5(f"chao:{x}".encode()).hexdigest()[:8], 16)
            % 100 < pct for x in k], bool)
        return pa.table({"k": pa.array(
            b["o_custkey"].to_numpy(zero_copy_only=False)[keep],
            pa.int64())})

    freq = fast_groupby_agg(
        orders.map_batches(_sample, batch_format="pyarrow"),
        ["k"], {"n": (None, "count")})

    def _sf(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "d": pa.array([len(n)], pa.int64()),
            "f1": pa.array([int((n == 1).sum())], pa.int64()),
            "f2": pa.array([int((n == 2).sum())], pa.int64()),
            "ex": pa.array([0], pa.int64()),
        })

    full = fast_groupby_agg(orders, ["o_custkey"],
                            {"_n": (None, "count")})

    def _xf(b: pa.Table) -> pa.Table:
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "d": pa.array([0], pa.int64()),
            "f1": pa.array([0], pa.int64()),
            "f2": pa.array([0], pa.int64()),
            "ex": pa.array([b.num_rows], pa.int64()),
        })

    parts = freq.map_batches(_sf, batch_format="pyarrow").union(
        full.map_batches(_xf, batch_format="pyarrow"))
    agg = fast_groupby_agg(parts, ["g"], {
        "d": ("d", "sum"), "f1": ("f1", "sum"),
        "f2": ("f2", "sum"), "ex": ("ex", "sum")})

    def _est(b: pa.Table) -> pa.Table:
        d = int(b["d"][0].as_py())
        f1 = int(b["f1"][0].as_py())
        f2 = int(b["f2"][0].as_py())
        ex = int(b["ex"][0].as_py())
        chao = d + (f1 * (f1 - 1)) // (2 * (f2 + 1))
        return pa.table({
            "d_obs": pa.array([d], pa.int64()),
            "f1": pa.array([f1], pa.int64()),
            "f2": pa.array([f2], pa.int64()),
            "chao1": pa.array([chao], pa.int64()),
            "n_exact": pa.array([ex], pa.int64()),
            "rel_err_fp": pa.array(
                [abs(chao - ex) * 1_000_000_000 // max(ex, 1)],
                pa.int64()),
        })

    return agg.map_batches(_est, batch_format="pyarrow")


ORACLES["chao1_distinct"] = f"""
    WITH s AS (
        SELECT o_custkey AS k, count(*) AS n FROM orders
        WHERE CAST(('0x' || substr(md5('chao:' || o_orderkey), 1, 8))
                   AS BIGINT) % 100 < {CHAO_PCT}
        GROUP BY 1),
    a AS (SELECT count(*) AS d,
                 coalesce(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END), 0) AS f1,
                 coalesce(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END), 0) AS f2
          FROM s),
    x AS (SELECT count(DISTINCT o_custkey) AS ex FROM orders)
    SELECT CAST(d AS BIGINT) AS d_obs, CAST(f1 AS BIGINT) AS f1,
           CAST(f2 AS BIGINT) AS f2,
           CAST(d + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT) AS chao1,
           CAST(ex AS BIGINT) AS n_exact,
           CAST(abs(d + (f1 * (f1 - 1)) // (2 * (f2 + 1)) - ex)
                * 1000000000 // (CASE WHEN ex = 0 THEN 1 ELSE ex END)
                AS BIGINT) AS rel_err_fp
    FROM a, x
"""


# ========================================= banded interval self-join

OVERLAP_W_US = 300_000_000  # 300 s window, µs


def q_interval_overlap_pairs(sf_dir, w_us: int = OVERLAP_W_US):
    """Per-user count of OVERLAPPING event-window pairs: events carry a
    [ts, ts+300s) attention window; report, per user, how many
    unordered pairs of their events overlap — the interval self-join
    that q_range_join (events vs campaign windows) and
    q_interval_coverage (island merging) both sidestep, and the shape
    behind collision/conflict detection at scale.

    Scale plan — the BANDED temporal self-join, never t×t: time is cut
    into w-sized cells; the left side keys each event at its own cell,
    the right side emits each event at its cell AND the previous one,
    so a qualifying pair (t_i ≤ t_j < t_i+w) meets in EXACTLY one
    (user, cell) bucket (c_j ∈ {c_i, c_i+1} and the two right-side
    emissions land on distinct keys). One hash join on the composite
    (user, cell) key, a vectorized dt∈[0,w) + id tie-break filter, and
    a map-side-combined count-groupby — exchange volume is 3× events,
    join fan-out is bounded by per-user-per-cell density (the skew
    knob a real deployment salts)."""
    ev = T(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _l(b: pa.Table) -> pa.Table:
        t = _ts_ns(b["ts"]) // 1000
        return pa.table({
            "u": b["user_id"], "cell": pa.array(t // w_us, pa.int64()),
            "ti": pa.array(t, pa.int64()), "idi": b["event_id"],
        })

    def _r(b: pa.Table) -> pa.Table:
        t = _ts_ns(b["ts"]) // 1000
        u = b["user_id"].to_numpy(zero_copy_only=False)
        i = b["event_id"].to_numpy(zero_copy_only=False)
        c = t // w_us
        return pa.table({
            "u": pa.array(np.concatenate([u, u]), pa.int64()),
            "cell": pa.array(np.concatenate([c, c - 1]), pa.int64()),
            "tj": pa.array(np.concatenate([t, t]), pa.int64()),
            "idj": pa.array(np.concatenate([i, i]), pa.int64()),
        })

    left = ev.map_batches(_l, batch_format="pyarrow")
    right = ev.map_batches(_r, batch_format="pyarrow")
    j = left.join(right, "inner", num_partitions=JOIN_PARTS,
                  on=("u", "cell"))

    def _f(b: pa.Table) -> pa.Table:
        ti = b["ti"].to_numpy(zero_copy_only=False)
        tj = b["tj"].to_numpy(zero_copy_only=False)
        dt = tj - ti
        ok = (dt >= 0) & (dt < w_us) & (
            (dt > 0) | (b["idi"].to_numpy(zero_copy_only=False)
                        < b["idj"].to_numpy(zero_copy_only=False)))
        return pa.table({"user_id": b["u"].filter(pa.array(ok))})

    pairs = j.map_batches(_f, batch_format="pyarrow")
    return fast_groupby_agg(pairs, ["user_id"],
                            {"n_pairs": (None, "count")})


ORACLES["interval_overlap_pairs"] = f"""
    SELECT e1.user_id AS user_id, count(*) AS n_pairs
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND epoch_us(e2.ts) - epoch_us(e1.ts) >= 0
     AND epoch_us(e2.ts) - epoch_us(e1.ts) < {OVERLAP_W_US}
     AND (epoch_us(e2.ts) > epoch_us(e1.ts)
          OR e1.event_id < e2.event_id)
    GROUP BY 1
"""


# ============================================== association rules

ASSOC_MIN_SUPPORT = 10


def q_assoc_rules(sf_dir, min_support: int = ASSOC_MIN_SUPPORT,
                  max_broadcast_parts: int = 2_000_000):
    """Association rules over the frequent pairs (the A-Priori rule
    pass that q_frequent_itemsets stops short of): for every frequent
    unordered type pair, BOTH directed rules a→b with
    confidence = sup(ab)/sup(a) and lift = conf·N/sup(b) — the
    recommender/market-basket ranking metrics, in exact integer
    fixed-point (conf_fp = sup_ab·10⁹//sup_a, lift_fp = conf_fp·N//
    sup_b — the staged floor division keeps every intermediate within
    int64 at any N, unlike the naive sup_ab·N·10⁹ product).

    Scale plan: basket items via the shared guarded plan
    (_order_type_items), pair supports via the same partitioned
    vectorized self-merge as q_frequent_itemsets, item supports via one
    tiny type-shaped groupby BROADCAST into the final map (p_type
    cardinality is a bounded vocabulary, not data-scale), N via one
    count on the distinct-basket groupby."""
    from ..functions.sketches import _splitmix64

    P = 64
    ot = _order_type_items(sf_dir, max_broadcast_parts)

    n_baskets = fast_groupby_agg(
        ot, ["l_orderkey"], {"_n": (None, "count")}).count()
    it = fast_groupby_agg(ot, ["p_type"], {"sup": (None, "count")}) \
        .to_pandas().sort_values("p_type")
    types_ref = ray.put(it["p_type"].to_numpy(object))
    sups_ref = ray.put(it["sup"].to_numpy(np.int64))

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
                              {"sup_ab": (None, "count")}).map_batches(
        lambda b: b.filter(pc.greater_equal(b["sup_ab"], min_support)),
        batch_format="pyarrow")

    def _rules(b: pa.Table) -> pa.Table:
        types, sups = ray.get(types_ref), ray.get(sups_ref)
        a = b["item_a"].to_numpy(zero_copy_only=False)
        bb = b["item_b"].to_numpy(zero_copy_only=False)
        sab = b["sup_ab"].to_numpy(zero_copy_only=False).astype(np.int64)
        sa = sups[np.searchsorted(types, a)]
        sb = sups[np.searchsorted(types, bb)]
        ante = np.concatenate([a, bb])
        cons = np.concatenate([bb, a])
        s_ante = np.concatenate([sa, sb])
        s_cons = np.concatenate([sb, sa])
        sup2 = np.concatenate([sab, sab])
        conf = sup2 * 1_000_000_000 // s_ante
        lift = conf * n_baskets // s_cons
        return pa.table({
            "antecedent": pa.array(ante, pa.string()),
            "consequent": pa.array(cons, pa.string()),
            "support": pa.array(sup2, pa.int64()),
            "conf_fp": pa.array(conf, pa.int64()),
            "lift_fp": pa.array(lift, pa.int64()),
        })

    return counts.map_batches(_rules, batch_format="pyarrow")


ORACLES["assoc_rules"] = f"""
    WITH ot AS (SELECT DISTINCT l_orderkey AS o, p.p_type AS t
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT count(DISTINCT o) AS nb FROM ot),
    it AS (SELECT t, count(*) AS sup FROM ot GROUP BY 1),
    pr AS (SELECT a.t AS ia, b.t AS ib, count(*) AS sup_ab
           FROM ot a JOIN ot b ON a.o = b.o AND a.t < b.t
           GROUP BY 1, 2
           HAVING count(*) >= {ASSOC_MIN_SUPPORT}),
    d AS (SELECT ia AS antecedent, ib AS consequent, sup_ab FROM pr
          UNION ALL
          SELECT ib, ia, sup_ab FROM pr)
    SELECT d.antecedent, d.consequent,
           CAST(d.sup_ab AS BIGINT) AS support,
           CAST(d.sup_ab * 1000000000 // sa.sup AS BIGINT) AS conf_fp,
           CAST((d.sup_ab * 1000000000 // sa.sup) * (SELECT nb FROM n)
                // sb.sup AS BIGINT) AS lift_fp
    FROM d
    JOIN it sa ON sa.t = d.antecedent
    JOIN it sb ON sb.t = d.consequent
"""


# ================================================== encoding audit

ENC_COLS = ["l_returnflag", "l_linestatus", "l_suppkey"]


def q_encoding_audit(sf_dir):
    """Columnar-encoding audit under the canonical (l_orderkey,
    l_linenumber) clustering: per column, the exact RLE RUN count, the
    dictionary cardinality, and runs-per-1000-rows — the numbers a
    layout optimizer (Parquet writer, Z-order planner, q_zorder_layout's
    cost model) needs to choose RLE vs dictionary vs plain encodings.

    Scale plan — an exact distributed LAG with no global row numbers
    and no driver state: after ONE range-partitioned sort, each block
    (batch_size=None → one call per block) reduces in a SINGLE pass to
    one summary row carrying its row/change counts for all audited
    columns plus its FIRST sort key and first/last values (one pass,
    because re-consuming the lazy sort can re-plan with different
    block boundaries — the stitch must see the same batching the
    counts came from). Because sorted blocks own disjoint key ranges
    and the sort key is unique, sorting the summaries by first key
    inside one small worker task reconstructs block order exactly;
    that task adds the block-boundary changes — block-count-shaped
    state (thousands of rows at 100 TB), never row-shaped. Distinct
    counts ride the standard two-level groupby. n_runs = within +
    boundary changes + 1."""
    import ray.data as rd

    ds = T(sf_dir, "lineitem",
           ["l_orderkey", "l_linenumber"] + ENC_COLS) \
        .sort(["l_orderkey", "l_linenumber"])

    def _block(b: pa.Table) -> pa.Table:
        cols = {"k1": pa.array([], pa.int64()),
                "k2": pa.array([], pa.int64()),
                "rows": pa.array([], pa.int64())}
        for c in ENC_COLS:
            cols[f"ch_{c}"] = pa.array([], pa.int64())
            cols[f"fv_{c}"] = pa.array([], pa.string())
            cols[f"lv_{c}"] = pa.array([], pa.string())
        if b.num_rows == 0:
            return pa.table(cols)
        cols = {"k1": b["l_orderkey"][:1],
                "k2": pa.array([int(b["l_linenumber"][0].as_py())],
                               pa.int64()),
                "rows": pa.array([b.num_rows], pa.int64())}
        for c in ENC_COLS:
            v = b[c].to_numpy(zero_copy_only=False)
            cols[f"ch_{c}"] = pa.array(
                [int((v[1:] != v[:-1]).sum())], pa.int64())
            cols[f"fv_{c}"] = pa.array([str(b[c][0].as_py())])
            cols[f"lv_{c}"] = pa.array([str(b[c][-1].as_py())])
        return pa.table(cols)

    summaries = ds.map_batches(_block, batch_format="pyarrow",
                               batch_size=None)

    # distinct cardinality per audited column (two-level groupby each)
    nd_refs = {}
    for c in ENC_COLS:
        d = fast_groupby_agg(T(sf_dir, "lineitem", [c]), [c],
                             {"_n": (None, "count")})
        nd_refs[c] = fast_groupby_agg(d.map_batches(
            lambda b: pa.table({"g": pa.array(
                np.zeros(1, np.int64)), "d": pa.array(
                [b.num_rows], pa.int64())}), batch_format="pyarrow",
            batch_size=None), ["g"], {"d": ("d", "sum")}).to_arrow_refs()

    global _enc_final_task
    if _enc_final_task is None:
        @ray.remote
        def _ft(cols, n_sum, lens, *tables: pa.Table) -> pa.Table:
            summ = pa.concat_tables(live_arrow(tables[:n_sum]))
            df = summ.to_pandas().sort_values(["k1", "k2"]) \
                .reset_index(drop=True)
            rest = tables[n_sum:]
            rows = int(df["rows"].sum())
            name, n_runs, n_distinct = [], [], []
            off = 0
            for i, c in enumerate(cols):
                fv = df[f"fv_{c}"].to_numpy(object)
                lv = df[f"lv_{c}"].to_numpy(object)
                ch = int(df[f"ch_{c}"].sum()) + \
                    int((fv[1:] != lv[:-1]).sum())
                dt = pa.concat_tables(
                    live_arrow(rest[off:off + lens[i]]))
                off += lens[i]
                name.append(c)
                n_runs.append(ch + 1)
                n_distinct.append(int(pc.sum(dt["d"]).as_py()))
            return pa.table({
                "col": pa.array(name, pa.string()),
                "n_rows": pa.array([rows] * len(cols), pa.int64()),
                "n_runs": pa.array(n_runs, pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
                "runs_per_1k_fp": pa.array(
                    [r * 1000 * 1_000_000 // max(rows, 1)
                     for r in n_runs], pa.int64()),
            })

        _enc_final_task = _ft

    srefs = summaries.to_arrow_refs()
    flat = [r for c in ENC_COLS for r in nd_refs[c]]
    lens = [len(nd_refs[c]) for c in ENC_COLS]
    fref = _enc_final_task.remote(list(ENC_COLS), len(srefs), lens,
                                  *srefs, *flat)
    return rd.from_arrow_refs([fref])


_enc_final_task = None


def _encoding_audit_oracle() -> str:
    sels = []
    for c in ENC_COLS:
        sels.append(f"""
        SELECT '{c}' AS col,
               count(*) AS n_rows,
               count(*) FILTER (WHERE pv IS NULL
                                OR CAST(v AS VARCHAR)
                                   <> CAST(pv AS VARCHAR)) AS n_runs,
               (SELECT count(DISTINCT {c}) FROM lineitem) AS n_distinct
        FROM (SELECT {c} AS v,
                     lag({c}) OVER (ORDER BY l_orderkey, l_linenumber)
                         AS pv
              FROM lineitem)""")
    return f"""
        SELECT col, CAST(n_rows AS BIGINT) AS n_rows,
               CAST(n_runs AS BIGINT) AS n_runs,
               CAST(n_distinct AS BIGINT) AS n_distinct,
               CAST(n_runs * 1000 * 1000000 // n_rows AS BIGINT)
                   AS runs_per_1k_fp
        FROM ({" UNION ALL ".join(sels)})
    """


ORACLES["encoding_audit"] = _encoding_audit_oracle()


# ======================================= conjunctive posting retrieval

BOOLQ_AND = ("merge", "window")  # both required
BOOLQ_NOT = "spark"              # excluded


def q_boolean_retrieval(sf_dir, and_terms: tuple = BOOLQ_AND,
                        not_term: str = BOOLQ_NOT):
    """Boolean (conjunctive + negated) retrieval over the inverted
    index: documents containing EVERY term in ``and_terms`` and NOT
    containing ``not_term`` — the posting-list intersection/anti
    evaluation a search engine runs per query, and the missing QUERY
    half of q_inverted_index (which only BUILDS the index). Output:
    matching doc count plus per-source match counts (the facet
    aggregation real retrieval UIs attach).

    Scale plan: the tokenize map emits, per document, one row with a
    3-bit term-presence mask (query terms are a tiny constant set — a
    per-batch set-intersection against each doc's distinct tokens, no
    full posting lists materialized); mask rows groupby-reduce by
    source with a vectorized AND/NOT filter in between. The exchange
    is matched-doc-shaped; at 100 TB the query never shuffles raw
    postings — only per-source counts."""
    docs = T(sf_dir, "documents", ["doc_id", "text", "source"])
    need = list(and_terms)

    def _mask(b: pa.Table) -> pa.Table:
        src, keep = [], []
        for txt, s in zip(b["text"].to_pylist(),
                          b["source"].to_pylist()):
            toks = set(_TOKEN.findall(txt.lower()))
            if all(t in toks for t in need) and not_term not in toks:
                src.append(s)
        return pa.table({"source": pa.array(src, pa.string())})

    hits = docs.map_batches(_mask, batch_format="pyarrow")
    return fast_groupby_agg(hits, ["source"],
                            {"n_docs": (None, "count")})


ORACLES["boolean_retrieval"] = f"""
    WITH tok AS (
        SELECT doc_id, source, term FROM (
            SELECT doc_id, source,
                   unnest(regexp_split_to_array(lower(text),
                                                '[^a-z0-9_]+')) AS term
            FROM documents)
        WHERE term <> ''),
    m AS (
        SELECT doc_id, source,
               max(CASE WHEN term = '{BOOLQ_AND[0]}' THEN 1 ELSE 0 END)
                   AS h0,
               max(CASE WHEN term = '{BOOLQ_AND[1]}' THEN 1 ELSE 0 END)
                   AS h1,
               max(CASE WHEN term = '{BOOLQ_NOT}' THEN 1 ELSE 0 END)
                   AS hn
        FROM tok GROUP BY 1, 2)
    SELECT source, count(*) AS n_docs
    FROM m WHERE h0 = 1 AND h1 = 1 AND hn = 0
    GROUP BY 1
"""


# ============================================== personalized PageRank

PPR_ITERS = 4
PPR_SCALE = 1_000_000_000
PPR_SEED = 0
PPR_RESTART_PCT = 20  # restart probability, percent


def q_personalized_pagerank(sf_dir, iters: int = PPR_ITERS,
                            seed: int = PPR_SEED):
    """Personalized PageRank from a single seed node (random walk with
    restart — the recommendation / trust-propagation primitive; see
    also q_pagerank, whose teleport mass is UNIFORM where PPR's is
    concentrated on the seed): x_{i+1}(v) = restart·[v=seed] +
    (1−restart)·Σ_{(u,v)∈E} x_i(u)//outdeg(u), all integer fixed-point
    with the engine's floor-division policy so the unrolled oracle
    matches bitwise. Dangling mass simply decays (as in q_pagerank).

    Scale plan — identical cost surface to q_pagerank's distributed
    tier: per iteration one hash join (edges+outdeg ⋈ x on src), one
    map-side-combined sum-groupby on dst, one left-outer join onto the
    node domain; the seed's restart mass is added in the same
    vectorized map. x is node-shaped, exchanges are edge-shaped,
    nothing sits on the driver."""
    import ray.data as rd

    n = T(sf_dir, "customer", ["c_custkey"]).count()
    edges = _pagerank_edges(sf_dir, n).materialize()
    nodes = T(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: pa.table({"node": b["c_custkey"]}),
        batch_format="pyarrow").materialize()
    outd = fast_groupby_agg(edges, ["src"], {"od": (None, "count")})
    edges_od = edges.join(outd, "inner", num_partitions=JOIN_PARTS,
                          on=("src",)).materialize()
    rp = PPR_RESTART_PCT
    x = nodes.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "x": pa.array(np.where(
                b["node"].to_numpy(zero_copy_only=False) == seed,
                PPR_SCALE, 0).astype(np.int64), pa.int64()),
        }), batch_format="pyarrow").materialize()
    for _ in range(iters):
        j = edges_od.join(x, "inner", num_partitions=JOIN_PARTS,
                          on=("src",), right_on=("node",))
        contrib = j.map_batches(
            lambda b: pa.table({
                "dst": b["dst"],
                "c": pa.array(
                    b["x"].to_numpy(zero_copy_only=False)
                    // b["od"].to_numpy(zero_copy_only=False),
                    pa.int64()),
            }), batch_format="pyarrow")
        s = fast_groupby_agg(contrib, ["dst"], {"s": ("c", "sum")})
        x = _compact_one_block(nodes.join(
            s, "left_outer", num_partitions=JOIN_PARTS,
            on=("node",), right_on=("dst",)).map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "x": pa.array(
                    (rp * PPR_SCALE // 100) * (
                        b["node"].to_numpy(zero_copy_only=False)
                        == seed).astype(np.int64)
                    + ((100 - rp) * pc.fill_null(b["s"], 0)
                       .to_numpy(zero_copy_only=False)) // 100,
                    pa.int64()),
            }), batch_format="pyarrow")).materialize()
    return x.map_batches(
        lambda b: pa.table({"node": b["node"], "ppr_fp": b["x"]}),
        batch_format="pyarrow")


def _ppr_oracle(iters: int = PPR_ITERS, seed: int = PPR_SEED) -> str:
    rp = PPR_RESTART_PCT
    head = f"""
        WITH nn AS (SELECT count(*) AS c FROM customer),
        edges AS (
            SELECT o_custkey AS src,
                   o_orderkey % (SELECT c FROM nn) AS dst
            FROM orders
        ),
        outd AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
        x0 AS (
            SELECT c_custkey AS node,
                   CAST(CASE WHEN c_custkey = {seed}
                        THEN {PPR_SCALE} ELSE 0 END AS BIGINT) AS x
            FROM customer
        )"""
    body = ""
    for i in range(1, iters + 1):
        body += f""",
        x{i} AS (
            SELECT b.node,
                   CAST({rp * PPR_SCALE // 100}
                        * (CASE WHEN b.node = {seed} THEN 1 ELSE 0 END)
                        + ({100 - rp} * COALESCE(s.s, 0)) // 100
                        AS BIGINT) AS x
            FROM (SELECT node FROM x0) b
            LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(sum(p.x // o.od) AS BIGINT) AS s
                FROM edges e
                JOIN x{i - 1} p ON p.node = e.src
                JOIN outd o ON o.src = e.src
                GROUP BY e.dst
            ) s ON s.node = b.node
        )"""
    return head + body + f"""
        SELECT node, x AS ppr_fp FROM x{iters}
    """


ORACLES["personalized_pagerank"] = _ppr_oracle()


# ========================================== encoding-artifact audit

MOJI_SCALE = 1_000_000_000
# deterministic corruption rules shared bitwise with the oracle: which
# artifact a doc gets is decided by hex digits of md5(doc_id)
_MOJI_SEQ = "Ã©"   # 'é' double-encoded then mis-decoded ("Ã©")
_MOJI_CTRL = "\x07"          # stray C0 control byte
_MOJI_REPL = "�"        # U+FFFD replacement character


def q_mojibake_audit(sf_dir):
    """Encoding-artifact audit over the document corpus — the data-
    quality pass every web-scale text pipeline runs before training:
    per source, how many documents carry (a) CP1252-in-UTF-8 mojibake
    ("Ã©"-style double-encoding), (b) U+FFFD replacement characters
    (evidence of lossy decoding upstream), (c) stray C0 control bytes,
    plus the combined bad-document rate in ×1e9 fixed point.

    The synthetic corpus is clean, so a deterministic md5(doc_id)-keyed
    corruption is applied first (the q_merkle_partition_diff replica-B
    pattern) — the SAME mutation runs in the oracle, so the audit
    counts are pinned non-trivially on both sides.

    Scale plan: ONE document-shaped map (per-row md5 decides the
    injected artifact; detection itself is vectorized
    ``pc.match_substring`` over the mutated column) feeding a
    source-enum-sized count groupby — the exchange is per-source
    counters, never text. At 100 TB nothing shuffles but k rows per
    block."""
    import hashlib as _hl

    docs = T(sf_dir, "documents", ["doc_id", "text", "source"])

    def _audit(b: pa.Table) -> pa.Table:
        dids = b["doc_id"].to_pylist()
        txts = b["text"].to_pylist()
        mut = []
        for did, txt in zip(dids, txts):
            h = _hl.md5(str(did).encode()).hexdigest()
            t = txt
            if h[0] in "01":
                t += _MOJI_SEQ
            if h[1] == "f":
                t += _MOJI_CTRL
            if h[2] in "012":
                t += _MOJI_REPL
            mut.append(t)
        ta = pa.array(mut, pa.string())
        moji = pc.match_substring(ta, "Ã")
        repl = pc.match_substring(ta, _MOJI_REPL)
        ctrl = pc.match_substring(ta, _MOJI_CTRL)
        bad = pc.or_(pc.or_(moji, repl), ctrl)

        def i64(x):
            return pc.cast(x, pa.int64())

        return pa.table({
            "source": b["source"],
            "moji": i64(moji), "repl": i64(repl),
            "ctrl": i64(ctrl), "bad": i64(bad),
        })

    g = fast_groupby_agg(
        docs.map_batches(_audit, batch_format="pyarrow"), ["source"],
        {"n_docs": (None, "count"), "n_mojibake": ("moji", "sum"),
         "n_replacement": ("repl", "sum"), "n_ctrl": ("ctrl", "sum"),
         "n_bad": ("bad", "sum")})

    def _rate(b: pa.Table) -> pa.Table:
        nb = b["n_bad"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = b["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "bad_rate_fp", pa.array(nb * MOJI_SCALE // nd, pa.int64()))

    return g.map_batches(_rate, batch_format="pyarrow")


ORACLES["mojibake_audit"] = f"""
    WITH d AS (
        SELECT source,
               text
               || CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       IN ('0', '1')
                  THEN chr(195) || chr(169) ELSE '' END
               || CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)
                       = 'f'
                  THEN chr(7) ELSE '' END
               || CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)
                       IN ('0', '1', '2')
                  THEN chr(65533) ELSE '' END AS t
        FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE contains(t, chr(195)))
                AS BIGINT) AS n_mojibake,
           CAST(count(*) FILTER (WHERE contains(t, chr(65533)))
                AS BIGINT) AS n_replacement,
           CAST(count(*) FILTER (WHERE contains(t, chr(7)))
                AS BIGINT) AS n_ctrl,
           CAST(count(*) FILTER (WHERE contains(t, chr(195))
                                 OR contains(t, chr(65533))
                                 OR contains(t, chr(7)))
                AS BIGINT) AS n_bad,
           CAST(count(*) FILTER (WHERE contains(t, chr(195))
                                 OR contains(t, chr(65533))
                                 OR contains(t, chr(7)))
                * {MOJI_SCALE} // count(*) AS BIGINT) AS bad_rate_fp
    FROM d GROUP BY source
"""


# ============================== label-propagation community detection

LPA_ITERS = 3
LPA_MAX_SINGLE_EDGES = 20_000_000
LPA_LABEL_BITS = 24   # packed argmax assumes node ids < 2^24 (~16.7M);
                      # count field gets the remaining 39 bits (same
                      # packing bound as q_luby_mis, stated not silent)


def _lpa_edges(sf_dir, n_nodes: int):
    """Undirected multigraph view of the derived order graph (both
    directions of q_pagerank's src=o_custkey → dst=o_orderkey mod n) —
    LPA votes flow along edges both ways; parallel edges count as
    multiple votes on BOTH sides (engine and oracle)."""
    orders = T(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _e(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        c = b["o_custkey"].to_numpy(zero_copy_only=False)
        s = c.astype(np.int64)
        d = (k % n_nodes).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([s, d]), pa.int64()),
            "dst": pa.array(np.concatenate([d, s]), pa.int64()),
        })

    return orders.map_batches(_e, batch_format="pyarrow")


@ray.remote
def _lpa_task(n: int, iters: int, *tables: pa.Table) -> pa.Table:
    """Single-task synchronous LPA over the collected edge list — the
    small-graph tier (guard: LPA_MAX_SINGLE_EDGES). Per round each
    node adopts the most frequent label among its neighbours
    (ties → smallest label; isolated nodes keep their label),
    computed with one lexsort + run-length fold — no Python loop over
    nodes."""
    live = live_arrow(tables)
    t = pa.concat_tables(live)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    lab = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        vl = lab[src]
        # count votes per (dst, label) via sorted run lengths
        order = np.lexsort((vl, dst))
        dd, ll = dst[order], vl[order]
        new_run = np.empty(len(dd), dtype=bool)
        if len(dd):
            new_run[0] = True
            new_run[1:] = (dd[1:] != dd[:-1]) | (ll[1:] != ll[:-1])
        starts = np.flatnonzero(new_run)
        cnt = np.diff(np.append(starts, len(dd)))
        rd_, rl = dd[starts], ll[starts]
        # winner per dst: max count, tie → min label
        w_order = np.lexsort((rl, -cnt, rd_))
        wd, wl = rd_[w_order], rl[w_order]
        first = np.empty(len(wd), dtype=bool)
        if len(wd):
            first[0] = True
            first[1:] = wd[1:] != wd[:-1]
        nxt = lab.copy()
        nxt[wd[first]] = wl[first]
        lab = nxt
    return pa.table({"node": pa.array(np.arange(n, dtype=np.int64)),
                     "lab": pa.array(lab, pa.int64())})


def q_label_propagation(sf_dir, iters: int = LPA_ITERS,
                        max_single_edges: int = LPA_MAX_SINGLE_EDGES):
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, the deterministic synchronous variant): labels start as
    node ids; each round every node adopts the label most frequent
    among its neighbours, ties broken toward the SMALLEST label, nodes
    with no neighbours keep their label. Fixed ``iters`` rounds make
    the run deterministic and the DuckDB oracle expressible as one
    unrolled CTE per round (vote counts + row_number() tie-break).

    Scale plan — q_pagerank's distributed cost surface: per round one
    hash join (edges ⋈ labels on src), one map-side-combined count
    groupby on (dst, label), one packed-argmax groupby on dst
    (cnt·2^24 + (2^24−1−label) so grouped MAX realizes the exact
    max-count/min-label tie-break — q_dag_critical_path's packing),
    and one left-outer join onto the node domain with COALESCE to the
    previous label. Everything exchanged is edge- or node-shaped;
    below ``max_single_edges`` the collected single-task tier runs
    instead (tiers pinned identical by test)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    cust = T(sf_dir, "customer", ["c_custkey"])
    dom = cust.aggregate(Min("c_custkey"), Max("c_custkey"), Count())
    n = dom["count()"]
    if dom["min(c_custkey)"] != 0 or dom["max(c_custkey)"] != n - 1:
        # the single-task tier indexes lab[src] over a dense 0-based
        # node domain (q_pagerank's assumption, same fail-fast)
        raise ValueError(
            f"label_propagation needs dense 0-based c_custkey; got "
            f"[{dom['min(c_custkey)']}, {dom['max(c_custkey)']}] n={n}")
    if n >= (1 << LPA_LABEL_BITS):
        raise ValueError(
            f"label_propagation packs labels into {LPA_LABEL_BITS} "
            f"bits; n={n} exceeds the bound — raise LPA_LABEL_BITS")
    edges = _lpa_edges(sf_dir, n).materialize()
    if edges.count() <= max_single_edges:
        return rd.from_arrow_refs(
            [_lpa_task.remote(n, iters, *edges.to_arrow_refs())])

    mask = (1 << LPA_LABEL_BITS) - 1
    nodes = cust.map_batches(
        lambda b: pa.table({"node": pc.cast(b["c_custkey"], pa.int64())}),
        batch_format="pyarrow").materialize()
    lab = nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "lab": b["node"]}),
        batch_format="pyarrow")
    for _ in range(iters):
        votes = edges.join(
            lab.map_batches(
                lambda b: pa.table({"src": b["node"], "lab": b["lab"]}),
                batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=("src",))
        cnts = fast_groupby_agg(
            votes.map_batches(
                lambda b: pa.table({"dst": b["dst"], "lab": b["lab"]}),
                batch_format="pyarrow"),
            ["dst", "lab"], {"c": (None, "count")})

        def _pack(b: pa.Table) -> pa.Table:
            c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            lv = b["lab"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "dst": b["dst"],
                "p": pa.array((c << LPA_LABEL_BITS) + (mask - lv),
                              pa.int64()),
            })

        win = fast_groupby_agg(
            cnts.map_batches(_pack, batch_format="pyarrow"),
            ["dst"], {"p": ("p", "max")})

        def _unpack(b: pa.Table) -> pa.Table:
            p = b["p"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "node": b["dst"],
                "wlab": pa.array(mask - (p & mask), pa.int64()),
            })

        joined = lab.join(
            win.map_batches(_unpack, batch_format="pyarrow"),
            "left_outer", num_partitions=JOIN_PARTS, on=("node",))
        lab = joined.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "lab": pc.coalesce(b["wlab"], b["lab"]),
            }), batch_format="pyarrow").materialize()
    return lab


def _lpa_oracle(iters: int = LPA_ITERS) -> str:
    head = """
        WITH edges AS (
            SELECT o_custkey AS src,
                   o_orderkey % (SELECT count(*) FROM customer) AS dst
            FROM orders
            UNION ALL
            SELECT o_orderkey % (SELECT count(*) FROM customer) AS src,
                   o_custkey AS dst
            FROM orders
        ), l0 AS (
            SELECT c_custkey AS node, c_custkey AS lab FROM customer
        )"""
    body = ""
    for i in range(1, iters + 1):
        body += f""", v{i} AS (
            SELECT e.dst AS node, p.lab AS lab, count(*) AS c
            FROM edges e JOIN l{i - 1} p ON p.node = e.src
            GROUP BY 1, 2
        ), w{i} AS (
            SELECT node, lab FROM (
                SELECT node, lab,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY c DESC, lab ASC)
                           AS rn
                FROM v{i}) WHERE rn = 1
        ), l{i} AS (
            SELECT p.node, CAST(COALESCE(w.lab, p.lab) AS BIGINT) AS lab
            FROM l{i - 1} p
            LEFT JOIN w{i} w ON w.node = p.node
        )"""
    return head + body + f"""
        SELECT node, lab FROM l{iters}
    """


ORACLES["label_propagation"] = _lpa_oracle()
