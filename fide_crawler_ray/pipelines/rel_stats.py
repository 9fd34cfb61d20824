"""relational layer (2/7): grouped regression/statistics, reshape/profiling, explode/fill/CDC,
BM25/RRF ranking, graph BFS.

Split out of pipelines/relational.py (r4) with ZERO behavior change —
statements keep their original order; ``relational`` re-exports
everything, and ORACLES entries registered here mutate the shared dict
owned by rel_audit_core (or the facade-merged view). See
pipelines/relational.py for the facade contract.
"""

from __future__ import annotations

import hashlib
import math
import os

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
    _tree_reduce_buffers,
    _ts_ns,
)



# ============================================================ registry


def q_grouped_regression(sf_dir):
    """Per-group ordinary-least-squares fit (regr_slope / regr_intercept
    semantics): l_extendedprice (whole units) on l_quantity per return
    flag — the grouped-regression primitive feature pipelines use for
    trend features. Mergeable EXACT integer moments (n, Σx, Σy, Σx²,
    Σxy); the final slope/intercept are one float expression written
    operation-for-operation identically in SQL (+,−,×,÷ are IEEE
    correctly-rounded, so identical trees on identical integer inputs
    are bit-identical — only libm functions can diverge), then ×10⁶
    half-away fixed point. The exchange moves 5 ints per group."""
    ds = T(sf_dir, "lineitem",
           ["l_returnflag", "l_quantity", "l_extendedprice"])

    def _moments(b: pa.Table) -> pa.Table:
        x = _round_half_away(
            b["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        y = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
            "xx": pa.array(x * x, pa.int64()),
            "xy": pa.array(x * y, pa.int64()),
        })

    agg = fast_groupby_agg(
        ds.map_batches(_moments, batch_format="pyarrow"),
        ["l_returnflag"],
        {"n": (None, "count"), "sx": ("x", "sum"), "sy": ("y", "sum"),
         "sxx": ("xx", "sum"), "sxy": ("xy", "sum")},
    )

    def _fit(b: pa.Table) -> pa.Table:
        f = {c: b[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in ("n", "sx", "sy", "sxx", "sxy")}
        # same op order as the SQL oracle, term for term
        slope = ((f["n"] * f["sxy"] - f["sx"] * f["sy"])
                 / (f["n"] * f["sxx"] - f["sx"] * f["sx"]))
        intercept = (f["sy"] - slope * f["sx"]) / f["n"]
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"],
            "slope_fp": pa.array(_round_half_away(
                slope * 1_000_000.0).astype(np.int64), pa.int64()),
            "intercept_fp": pa.array(_round_half_away(
                intercept * 1_000_000.0).astype(np.int64), pa.int64()),
        })

    return agg.map_batches(_fit, batch_format="pyarrow")


def q_weighted_avg(sf_dir):
    """Revenue-weighted mean discount per return flag — the weighted
    aggregate primitive (mixture weights, weighted quality scores).
    ALL-integer: Σ(price_fp·disc_fp) and Σ(price_fp) are mergeable int64
    partials; the final ×10⁴ // division runs in PYTHON ints on the
    group-count-sized table (HUGEINT-equivalent — numpy int64 would
    overflow the ×10⁴ rescale at large sf, the oracle's HUGEINT does
    not), so engine and oracle agree exactly at every scale."""
    ds = T(sf_dir, "lineitem",
           ["l_returnflag", "l_extendedprice", "l_discount"])

    def _fp(b: pa.Table) -> pa.Table:
        p = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d = _round_half_away(
            b["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "p": pa.array(p, pa.int64()),
            "pd": pa.array(p * d, pa.int64()),
        })

    agg = fast_groupby_agg(
        ds.map_batches(_fp, batch_format="pyarrow"),
        ["l_returnflag"],
        {"n": (None, "count"), "sp": ("p", "sum"), "spd": ("pd", "sum")},
    )

    def _div(b: pa.Table) -> pa.Table:
        spd = [int(v) for v in b["spd"].to_pylist()]
        sp = [int(v) for v in b["sp"].to_pylist()]
        w = [x * 10_000 // y for x, y in zip(spd, sp)]
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"],
            "wavg_disc_fp": pa.array(w, pa.int64()),
        })

    return agg.map_batches(_div, batch_format="pyarrow")


def q_unpivot_long(sf_dir):
    """UNPIVOT / melt — wide part columns (p_size, p_retailprice) to
    long (key, attr, val_fp) rows, the inverse of q_pivot_wide and the
    schema-normalization primitive feature stores need. A pure map:
    each batch emits its k× long block map-side — no shuffle, perfectly
    scale-oblivious. Values ride as ×100 int64 fixed point so one
    column carries both attributes exactly."""
    ds = T(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def _melt(b: pa.Table) -> pa.Table:
        k = b["p_partkey"].to_numpy(zero_copy_only=False)
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = _round_half_away(
            b["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        n = len(k)
        return pa.table({
            "p_partkey": pa.array(np.concatenate([k, k]), pa.int64()),
            "attr": pa.array(["p_size"] * n + ["p_retailprice"] * n,
                             pa.string()),
            "val_fp": pa.array(np.concatenate([size * 100, price]),
                               pa.int64()),
        })

    return ds.map_batches(_melt, batch_format="pyarrow")


def q_grouped_skew(sf_dir):
    """Population skewness of l_quantity per return flag — the
    third-moment distribution-shape signal (corpus length/quality skew
    checks). Mergeable EXACT integer moments (n, Σx, Σx², Σx³); the
    final expression uses only IEEE correctly-rounded ops (+,−,×,÷,
    sqrt — sqrt IS correctly rounded, unlike pow/ln) written
    operation-for-operation identically in the SQL oracle, so the
    ×10⁶ fixed-point result is bit-identical. x is whole units so Σx³
    stays far under 2⁵³ through sf100."""
    ds = T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _moments(b: pa.Table) -> pa.Table:
        x = _round_half_away(
            b["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "x": pa.array(x, pa.int64()),
            "xx": pa.array(x * x, pa.int64()),
            "xxx": pa.array(x * x * x, pa.int64()),
        })

    agg = fast_groupby_agg(
        ds.map_batches(_moments, batch_format="pyarrow"),
        ["l_returnflag"],
        {"n": (None, "count"), "sx": ("x", "sum"),
         "sxx": ("xx", "sum"), "sxxx": ("xxx", "sum")},
    )

    def _skew(b: pa.Table) -> pa.Table:
        f = {c: b[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in ("n", "sx", "sxx", "sxxx")}
        # identical op tree to the SQL oracle (explicit parens)
        m2 = (f["n"] * f["sxx"] - f["sx"] * f["sx"]) / (f["n"] * f["n"])
        m3 = (((f["n"] * f["n"]) * f["sxxx"]
               - (3.0 * f["n"]) * (f["sx"] * f["sxx"]))
              + (2.0 * f["sx"]) * (f["sx"] * f["sx"])) \
            / ((f["n"] * f["n"]) * f["n"])
        skew = m3 / (m2 * np.sqrt(m2))
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"],
            "skew_fp": pa.array(_round_half_away(
                skew * 1_000_000.0).astype(np.int64), pa.int64()),
        })

    return agg.map_batches(_skew, batch_format="pyarrow")


LM_MAX_BROADCAST_BIGRAMS = 4_000_000


def _ln_fp9(v: int) -> int:
    """``CAST(round(ln(v) * 1e9) AS BIGINT)`` for a positive int, via
    libm (math.log — same code path as DuckDB's ln) and half-away
    rounding (trunc/frac arithmetic, exact in IEEE — matches the array
    kernel _round_half_away)."""
    x = math.log(v) * 1e9
    t = math.trunc(x)
    return int(t + 1) if x - t >= 0.5 else int(t)


def q_bigram_lm_score(sf_dir,
                      max_broadcast: int = LM_MAX_BROADCAST_BIGRAMS):
    """Per-document add-one-smoothed bigram log-likelihood under the
    corpus's own bigram model — the n-gram LM quality signal classic
    data pipelines (CCNet-style) gate on before training. Each doc's
    score is Σ ln((c(w1,w2)+1)/(hc(w1)+V)) over its adjacent token
    pairs, emitted as an EXACT ×10⁹ int64 fixed-point sum: every term
    quantizes ln(c+1) and ln(hc+V) separately through libm (math.log —
    same code path as DuckDB's ln, so bit-identical on a host; see
    q_grouped_entropy) BEFORE the distributed sum, making the result
    summation-order independent.

    Plan: bigram counts + head totals via map-side counters → one
    vocabulary-sized partial-agg each; V from a distinct-token count.
    Below ``max_broadcast`` bigram types the model ships as plasma
    dicts and scoring is a PURE MAP (zero exchange); above it the doc
    bigram rows hash-join the model tables (two joins + one per-doc
    groupby) — the corpus never concentrates anywhere. Tiers pinned
    identical by test."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _bi_counts(b: pa.Table) -> pa.Table:
        cnt: dict = {}
        for txt in b["text"].to_pylist():
            toks = _TOKEN.findall(txt.lower())
            for i in range(len(toks) - 1):
                k = (toks[i], toks[i + 1])
                cnt[k] = cnt.get(k, 0) + 1
        return pa.table({
            "w1": pa.array([k[0] for k in cnt], pa.string()),
            "w2": pa.array([k[1] for k in cnt], pa.string()),
            "c": pa.array(list(cnt.values()), pa.int64()),
        })

    def _uni(b: pa.Table) -> pa.Table:
        toks = set()
        for txt in b["text"].to_pylist():
            toks.update(_TOKEN.findall(txt.lower()))
        return pa.table({"tok": pa.array(sorted(toks), pa.string())})

    bi = fast_groupby_agg(
        docs.map_batches(_bi_counts, batch_format="pyarrow"),
        ["w1", "w2"], {"c": ("c", "sum")},
    ).materialize()
    heads = fast_groupby_agg(bi, ["w1"], {"hc": ("c", "sum")})
    vocab = fast_groupby_agg(
        docs.map_batches(_uni, batch_format="pyarrow"),
        ["tok"], {"_n": (None, "count")},
    )
    n_vocab = vocab.count()

    def _score_rows(doc_ids, texts, cdict, hdict, lncache):
        out_id, out_n, out_s = [], [], []
        for did, txt in zip(doc_ids, texts):
            toks = _TOKEN.findall(txt.lower())
            if len(toks) < 2:
                continue
            s = 0
            for i in range(len(toks) - 1):
                num = cdict[(toks[i], toks[i + 1])] + 1
                den = hdict[toks[i]] + n_vocab
                for v in (num, den):
                    if v not in lncache:
                        lncache[v] = _ln_fp9(v)
                s += lncache[num] - lncache[den]
            out_id.append(did)
            out_n.append(len(toks) - 1)
            out_s.append(s)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_bigrams": pa.array(out_n, pa.int64()),
            "ll_fp": pa.array(out_s, pa.int64()),
        })

    if bi.count() <= max_broadcast:
        bref = ray.put((bi.to_arrow_refs(), heads.to_arrow_refs()))

        class _Score:
            def __init__(self):
                brefs, hrefs = ray.get(bref)
                self.c, self.h = {}, {}
                for t in ray.get(brefs):
                    self.c.update(zip(zip(t["w1"].to_pylist(),
                                          t["w2"].to_pylist()),
                                      t["c"].to_pylist()))
                for t in ray.get(hrefs):
                    self.h.update(zip(t["w1"].to_pylist(),
                                      t["hc"].to_pylist()))
                self.ln: dict = {}

            def __call__(self, b: pa.Table) -> pa.Table:
                return _score_rows(b["doc_id"].to_pylist(),
                                   b["text"].to_pylist(),
                                   self.c, self.h, self.ln)

        return docs.map_batches(_Score, batch_format="pyarrow",
                                concurrency=(1, 4))

    # exchange tier: doc bigram rows join the model tables
    def _bg_rows(b: pa.Table) -> pa.Table:
        out_id, out_w1, out_w2 = [], [], []
        for did, txt in zip(b["doc_id"].to_pylist(),
                            b["text"].to_pylist()):
            toks = _TOKEN.findall(txt.lower())
            for i in range(len(toks) - 1):
                out_id.append(did)
                out_w1.append(toks[i])
                out_w2.append(toks[i + 1])
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "w1": pa.array(out_w1, pa.string()),
            "w2": pa.array(out_w2, pa.string()),
        })

    bg = docs.map_batches(_bg_rows, batch_format="pyarrow")
    j1 = bg.join(
        bi.map_batches(lambda t: t.rename_columns(["b1", "b2", "c"]),
                       batch_format="pyarrow"),
        "inner", num_partitions=16,
        on=("w1", "w2"), right_on=("b1", "b2"))
    j2 = j1.join(
        heads.map_batches(lambda t: t.rename_columns(["h1", "hc"]),
                          batch_format="pyarrow"),
        "inner", num_partitions=16, on=("w1",), right_on=("h1",))

    class _Term:
        def __init__(self):
            self.ln: dict = {}

        def __call__(self, b: pa.Table) -> pa.Table:
            c = b["c"].to_numpy(zero_copy_only=False)
            h = b["hc"].to_numpy(zero_copy_only=False)
            term = np.empty(len(c), np.int64)
            for i in range(len(c)):
                num, den = int(c[i]) + 1, int(h[i]) + n_vocab
                for v in (num, den):
                    if v not in self.ln:
                        self.ln[v] = _ln_fp9(v)
                term[i] = self.ln[num] - self.ln[den]
            return pa.table({
                "doc_id": b["doc_id"],
                "one": pa.array(np.ones(len(c), np.int64), pa.int64()),
                "term_fp": pa.array(term, pa.int64()),
            })

    terms = j2.map_batches(_Term, batch_format="pyarrow",
                           concurrency=(1, 4))
    return fast_groupby_agg(
        terms, ["doc_id"],
        {"n_bigrams": ("one", "sum"), "ll_fp": ("term_fp", "sum")},
    )


QNORM_MAX_BROADCAST_VALUES = 4_000_000


def q_quantile_norm(sf_dir, max_broadcast: int = QNORM_MAX_BROADCAST_VALUES):
    """GLOBAL quantile normalization — map every order's price to its
    corpus-wide percent_rank (rank−1)·10⁶ // (n−1), the rank→uniform
    transform feature pipelines use to decouple a feature from its
    marginal distribution. Unlike q_rank_functions (per-user windows,
    bounded groups) this is a TOTAL ordering over the whole table — the
    one window shape that cannot ride on map_groups.

    Plan: no global sort of the rows. The min-rank of a VALUE is
    1 + (count of strictly smaller values), so one partial-agg groupby
    builds the distinct-value histogram, its cumulative counts (sorted
    once — distinct-value-sized, not row-sized) give rank(v), and a
    map-side searchsorted stamps every row. Distinct values broadcast
    below the guard; above it rows hash-join the rank table instead.
    Ties get the min rank — exactly SQL rank(), so percent_rank matches
    the oracle bit for bit (all-integer arithmetic)."""
    orders = T(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "p": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    fp = orders.map_batches(_fp, batch_format="pyarrow").materialize()
    hist = fast_groupby_agg(fp, ["p"], {"c": (None, "count")}).materialize()
    n_total = int(fp.count())

    if hist.count() <= max_broadcast:
        href = ray.put(hist.to_arrow_refs())

        class _Rank:
            def __init__(self):
                t = pa.concat_tables(
                    [x for x in ray.get(ray.get(href)) if x.num_rows])
                v = t["p"].to_numpy(zero_copy_only=False)
                c = t["c"].to_numpy(zero_copy_only=False)
                order = np.argsort(v)
                self.v = v[order]
                cc = np.cumsum(c[order])
                # min-rank of value i = 1 + rows strictly smaller
                self.rank = np.r_[0, cc[:-1]] + 1

            def __call__(self, b: pa.Table) -> pa.Table:
                p = b["p"].to_numpy(zero_copy_only=False)
                r = self.rank[np.searchsorted(self.v, p)]
                q = (r - 1) * 1_000_000 // (n_total - 1)
                return pa.table({
                    "o_orderkey": b["o_orderkey"],
                    "q_fp": pa.array(q, pa.int64()),
                })

        return fp.map_batches(_Rank, batch_format="pyarrow",
                              concurrency=(1, 4))

    # exchange tier: rank table derived once (distinct-value-sized sort
    # in one task), rows hash-join it on the value
    @ray.remote
    def _rank_table(*tables: pa.Table) -> pa.Table:
        t = pa.concat_tables([x for x in tables if x.num_rows])
        v = t["p"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        cc = np.cumsum(c[order])
        return pa.table({
            "pv": pa.array(v[order], pa.int64()),
            "rank": pa.array(np.r_[0, cc[:-1]] + 1, pa.int64()),
        })

    import ray.data as rd

    ranks = rd.from_arrow_refs([_rank_table.remote(*hist.to_arrow_refs())])
    j = fp.join(ranks, "inner", num_partitions=16,
                on=("p",), right_on=("pv",))

    def _q(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "q_fp": pa.array((r - 1) * 1_000_000 // (n_total - 1),
                             pa.int64()),
        })

    return j.map_batches(_q, batch_format="pyarrow")


def q_grouped_geomean(sf_dir):
    """Per-group geometric-mean invariant: n and Σ round(ln(p_fp)·10⁹)
    over ×100 fixed-point prices per order priority — the log-domain
    mean pipelines use for strictly-positive, skewed features. Each ln
    term quantizes to int64 BEFORE the distributed sum (order
    independent, same policy as q_grouped_entropy / q_bigram_lm_score)
    through libm math.log — bit-identical to DuckDB's ln on a host."""
    ds = T(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def _lnp(b: pa.Table) -> pa.Table:
        p = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        uniq, inv = np.unique(p, return_inverse=True)
        lnu = np.empty(len(uniq), np.int64)
        for i, u in enumerate(uniq):
            lnu[i] = _ln_fp9(int(u))
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "lnp": pa.array(lnu[inv], pa.int64()),
        })

    return fast_groupby_agg(
        ds.map_batches(_lnp, batch_format="pyarrow"),
        ["o_orderpriority"], {"n": (None, "count"),
                              "ln_sum_fp": ("lnp", "sum")},
    )


BM25_QUERY = ("hash", "join", "vector")
BM25_K1, BM25_B = 1.2, 0.75


def _bm25_scored(sf_dir):
    """BM25 scoring of every document for a fixed keyword query —
    the lexical-retrieval primitive next to the tf-idf and ANN entries.
    Okapi BM25 (k1=1.2, b=0.75): Σ_t idf(t)·tf·(k1+1)/(tf + k1·(1−b +
    b·dl/avgdl)), idf = ln((N−df+0.5)/(df+0.5)).

    One tokenization pass materializes the per-doc feature row
    (doc_id, tf_t…, dl) — vocabulary-free, one row per doc; corpus
    stats (N, Σdl, df_t) are ONE tiny global aggregate over it; scoring
    is a pure map with the stats in the closure (a handful of ints),
    then a distributed sort + limit(k). The float score expression is
    mirrored operation-for-operation in SQL (fixed 3-term sum in fixed
    order; ln through libm), emitted ×10⁶ fixed point with a doc_id
    tie-break, so top-k is deterministic and bit-exact."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _feat(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        tfs = [[] for _ in BM25_QUERY]
        dls = []
        for txt in b["text"].to_pylist():
            toks = _TOKEN.findall(txt.lower())
            dls.append(len(toks))
            for qi, qt in enumerate(BM25_QUERY):
                tfs[qi].append(sum(1 for t in toks if t == qt))
        cols = {"doc_id": pa.array(ids, pa.int64()),
                "dl": pa.array(dls, pa.int64())}
        for qi in range(len(BM25_QUERY)):
            cols[f"tf{qi}"] = pa.array(tfs[qi], pa.int64())
        return pa.table(cols)

    feat = docs.map_batches(_feat, batch_format="pyarrow").materialize()

    def _stats(b: pa.Table) -> pa.Table:
        out = {"n": pa.array([b.num_rows], pa.int64()),
               "total": pa.array(
                   [int(b["dl"].to_numpy(zero_copy_only=False).sum())],
                   pa.int64())}
        for qi in range(len(BM25_QUERY)):
            tf = b[f"tf{qi}"].to_numpy(zero_copy_only=False)
            out[f"df{qi}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(out)

    parts = feat.map_batches(_stats, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n"].sum())
    total = int(parts["total"].sum())
    dfs = [int(parts[f"df{qi}"].sum()) for qi in range(len(BM25_QUERY))]

    def _score(b: pa.Table) -> pa.Table:
        dl = b["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        avgdl = (total * 1.0) / n_docs
        score = np.zeros(len(dl), np.float64)
        # fixed term order — the SQL sums the same three terms in the
        # same order (float addition is order-sensitive)
        for qi in range(len(BM25_QUERY)):
            tf = b[f"tf{qi}"].to_numpy(
                zero_copy_only=False).astype(np.float64)
            idf = math.log(((n_docs - dfs[qi]) + 0.5) / (dfs[qi] + 0.5))
            # 2.2 as a LITERAL, not k1+1.0: the float sum 1.2+1.0 lands
            # a rounding tie away from the double the SQL literal 2.2
            # parses to — literals on both sides are identical by
            # construction
            score = score + idf * ((tf * 2.2)
                                   / (tf + BM25_K1 * ((1.0 - BM25_B)
                                      + BM25_B * (dl / avgdl))))
        return pa.table({
            "doc_id": b["doc_id"],
            "score_fp": pa.array(_round_half_away(
                score * 1_000_000.0).astype(np.int64), pa.int64()),
        })

    return feat.map_batches(_score, batch_format="pyarrow")


def q_bm25_topk(sf_dir, k: int = 10):
    """Top-k BM25 retrieval — see _bm25_scored for the plan; this is
    the scored dataset through one distributed sort + limit with a
    doc_id tie-break (deterministic cutoff)."""
    return _bm25_scored(sf_dir).sort(
        ["score_fp", "doc_id"], descending=[True, False]).limit(k)


RRF_K = 60       # the standard RRF dampening constant
RRF_LIST = 20    # per-ranker candidate list length


def q_rrf_fusion(sf_dir, k: int = 10):
    """Reciprocal-rank fusion of two retrieval modalities — BM25
    (lexical, _bm25_scored) and embedding cosine against the vec_id=0
    query vector (dense) — the hybrid-retrieval primitive RAG data
    pipelines rank with. Each ranker contributes 10⁶ // (60 + rank)
    for its top-RRF_LIST docs (integer — the fusion itself has no float
    at all); fused top-k breaks ties by doc_id.

    The cosine ranking is exact and order-independent: per-dimension
    products quantize to ×10¹² int64 BEFORE summation (float Σ over an
    unnest has no defined order in SQL), and the final similarity is a
    mirrored float expression over those integer sums (÷, ×, sqrt —
    all IEEE correctly-rounded). Both ranker sorts are distributed
    sort+limit; only the two RRF_LIST-row lists ever reach the driver
    (bounded by the constant, not the corpus)."""
    top_a = (_bm25_scored(sf_dir)
             .sort(["score_fp", "doc_id"], descending=[True, False])
             .limit(RRF_LIST).to_pandas())

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])
    q0 = emb.map_batches(
        lambda b: b.filter(pc.equal(b["vec_id"], 0)),
        batch_format="pyarrow").take_all()
    qv = np.asarray(q0[0]["embedding"], np.float64)
    nb = int(_round_half_away((qv * qv) * 1e12).astype(np.int64).sum())
    qref = ray.put(qv)

    def _sim(b: pa.Table) -> pa.Table:
        q = ray.get(qref)
        col = b["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(-1, len(q))
        dot = _round_half_away((m * q) * 1e12).astype(np.int64).sum(axis=1)
        na = _round_half_away((m * m) * 1e12).astype(np.int64).sum(axis=1)
        sim = ((dot * 1.0) / (np.sqrt(na * 1.0) * np.sqrt(nb * 1.0))
               * 1_000_000.0)
        return pa.table({
            "vec_id": b["vec_id"],
            "sim_fp": pa.array(_round_half_away(sim).astype(np.int64),
                               pa.int64()),
        })

    top_b = (emb.map_batches(_sim, batch_format="pyarrow")
             .sort(["sim_fp", "vec_id"], descending=[True, False])
             .limit(RRF_LIST).to_pandas())

    fused: dict[int, int] = {}
    for r, did in enumerate(top_a["doc_id"], start=1):
        fused[int(did)] = fused.get(int(did), 0) + 1_000_000 // (RRF_K + r)
    for r, vid in enumerate(top_b["vec_id"], start=1):
        fused[int(vid)] = fused.get(int(vid), 0) + 1_000_000 // (RRF_K + r)
    rows = sorted(fused.items(), key=lambda x: (-x[1], x[0]))[:k]
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "rrf_fp": pa.array([s for _, s in rows], pa.int64()),
    }))


INTERVAL_COVER_S = 300  # each event covers [ts, ts+300s)


def q_interval_coverage(sf_dir):
    """Gaps-and-islands interval merging — per user, merge overlapping
    [ts, ts+300s) event windows into maximal islands and report island
    count + total covered seconds (the classic SQL pattern behind
    session stitching, uptime/coverage accounting, and span
    consolidation). All-integer epoch-seconds arithmetic.

    Plan: per-user ``groupby.map_groups`` (same user-fits-a-worker
    contract as sessionize) with a vectorized island kernel — sorted
    starts vs the running cummax of ends; islands cut where the start
    clears every previous end; reduceat folds per-island extents. One
    exchange (the groupby); the oracle spells the identical semantics
    with two window functions."""
    ds = T(sf_dir, "events", ["user_id", "ts"])

    def _islands(df: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(df["ts"].to_numpy().astype("datetime64[us]")
                    .view("int64") // 1_000_000)
        s, e = t, t + INTERVAL_COVER_S
        cummax_e = np.maximum.accumulate(e)
        cut = np.r_[True, s[1:] > cummax_e[:-1]]
        idx = np.flatnonzero(cut)
        ends = np.maximum.reduceat(e, idx)
        covered = int((ends - s[idx]).sum())
        return pd.DataFrame([{
            "user_id": df["user_id"].iloc[0],
            "n_islands": int(cut.sum()),
            "covered_s": covered,
        }])

    out = ds.groupby("user_id").map_groups(_islands, batch_format="pandas")

    def _cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "n_islands": b["n_islands"].cast(pa.int64()),
            "covered_s": b["covered_s"].cast(pa.int64()),
        })

    return out.map_batches(_cast, batch_format="pyarrow")


def q_json_extract(sf_dir):
    """Semi-structured column extraction — parse the events.props JSON
    payload into typed fields and aggregate per event type (Σk, count,
    distinct k) — the schema-on-read op every log/telemetry pipeline
    starts with. The parse is a real JSON decode (stdlib json per
    value, inside map_batches — same python-kernel class as the
    tokenizer stages; pyarrow has no JSON-parse kernel), the
    aggregation one map-side-combined partial-agg exchange."""
    import json as _json

    ds = T(sf_dir, "events", ["event_type", "props"])

    def _parse(b: pa.Table) -> pa.Table:
        ks = [int(_json.loads(p)["k"]) for p in b["props"].to_pylist()]
        return pa.table({
            "event_type": b["event_type"],
            "k": pa.array(ks, pa.int64()),
        })

    parsed = ds.map_batches(_parse, batch_format="pyarrow")
    # (type, k) counts first: the second groupby then sees the DISTINCT
    # (type, k) table, so distinct-k is an exact count, not a sketch
    counts = fast_groupby_agg(parsed, ["event_type", "k"],
                              {"c": (None, "count")})

    def _kc(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "c": b["c"],
            "kc": pc.multiply(b["k"], b["c"]),
        })

    return fast_groupby_agg(
        counts.map_batches(_kc, batch_format="pyarrow"),
        ["event_type"],
        {"n_distinct_k": (None, "count"), "n": ("c", "sum"),
         "k_sum": ("kc", "sum")},
    )


# ============================================ r3 batch-2: explode / fill /
# lead / CDC compaction / BFS — the remaining classic pipeline primitives


def q_unnest_explode(sf_dir):
    """UNNEST-with-ordinality (the `explode` / flat_map primitive): one
    output row per (vec, position) over the list<float> embedding
    column. Fully vectorized zero-copy Arrow: ``pc.list_flatten`` for
    values, value-lengths arithmetic for the 1-based ordinal — no
    Python per row, no per-list loop. The float32→float64 widening is
    bit-exact on both engines (no arithmetic), so the oracle matches
    without fixed-point."""
    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _ex(b: pa.Table) -> pa.Table:
        col = b["embedding"].combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col)
        vid = np.repeat(b["vec_id"].to_numpy(zero_copy_only=False), lens)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        ordv = np.arange(int(lens.sum()), dtype=np.int64) - starts + 1
        return pa.table({
            "vec_id": pa.array(vid.astype(np.int64), pa.int64()),
            "ord": pa.array(ordv, pa.int64()),
            "val": pc.cast(flat, pa.float64()),
        })

    return emb.map_batches(_ex, batch_format="pyarrow")


def q_gap_fill(sf_dir):
    """Sparse→dense time-series densification (gap fill): per-user DAILY
    event counts with every missing day between the user's first and
    last activity emitted as an explicit 0 — the precondition for any
    rolling/window computation that assumes a dense axis. Plan: one
    map-side-combined (user, day) count exchange, then per-user
    ``map_groups`` materializes the dense range (per-key output is
    bounded by the TIME SPAN, not the data size — same per-key-fits-a-
    worker contract as sessionize; a multi-year span × billion-user
    fill would instead explode (user, day-range) spans via flat_map)."""
    ev = T(sf_dir, "events", ["user_id", "ts"])

    def _day_map(b: pa.Table) -> pa.Table:
        d = (b["ts"].to_pandas().to_numpy()
             .astype("datetime64[D]").astype("int64"))
        return pa.table({"user_id": b["user_id"],
                         "day": pa.array(d, pa.int64())})

    counts = fast_groupby_agg(
        ev.map_batches(_day_map, batch_format="pyarrow"),
        ["user_id", "day"], {"n": (None, "count")},
    )

    def _fill(df: pd.DataFrame) -> pd.DataFrame:
        lo = int(df["day"].min())
        full = np.arange(lo, int(df["day"].max()) + 1, dtype=np.int64)
        n = np.zeros(len(full), dtype=np.int64)
        n[df["day"].to_numpy() - lo] = df["n"].to_numpy()
        return pd.DataFrame({"user_id": df["user_id"].iloc[0],
                             "day": full, "n": n})

    return counts.groupby("user_id").map_groups(_fill, batch_format="pandas")


def q_lead_dwell(sf_dir):
    """Per-event dwell time: LEAD(ts) − ts within each user's (ts,
    event_id)-ordered history, in exact integer microseconds (surfaced
    as float64 because SQL LEAD is NULL on the last row — the same
    nullable-BIGINT ↔ float64+NaN convention as q_window_functions'
    lag column; month-scale spans ≪ 2^53 stay exact). Completes the
    lag/lead pair of the window surface."""
    ds = T(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _dwell(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        t = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        dw = np.full(len(t), np.nan)
        dw[:-1] = (t[1:] - t[:-1]).astype(np.float64)
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                             "event_id": df["event_id"].to_numpy(),
                             "dwell_us": dw})

    return ds.groupby("user_id").map_groups(_dwell, batch_format="pandas")


def q_cdc_upsert(sf_dir):
    """CDC upsert compaction (last-write-wins): a base snapshot plus a
    derived update stream (every 7th order re-priced, version 1) merged
    to one current row per key — the lakehouse MERGE/compaction shape.
    Plan: both channels are emitted in ONE pass over the input, then
    the mergeable grouped top-1 by version keeps the latest — map-side
    compaction, so the exchange carries ≤ one row per (block, key),
    never the raw change stream. Prices are ×100 integer fixed-point."""
    from ..stages.fastagg import grouped_topk

    orders = T(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _channels(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        upd = (k % 7) == 0
        return pa.table({
            "o_orderkey": pa.array(np.concatenate([k, k[upd]]), pa.int64()),
            "price_fp": pa.array(
                np.concatenate([p, p[upd] + 100_000]), pa.int64()),
            "version": pa.array(
                np.concatenate([np.zeros(len(k), np.int64),
                                np.ones(int(upd.sum()), np.int64)]),
                pa.int64()),
        })

    ds = orders.map_batches(_channels, batch_format="pyarrow")
    out = grouped_topk(ds, ["o_orderkey"], ["version"], [False], 1)
    return out.select_columns(["o_orderkey", "price_fp", "version"])


BFS_MAX_HOPS = 6
BFS_MAX_SINGLE_EDGES = 5_000_000


@ray.remote
def _bfs_task(n: int, max_hops: int, *tables: pa.Table) -> pa.Table:
    """Single-task BFS over the collected edge list (small-graph tier,
    guard: BFS_MAX_SINGLE_EDGES): edges sorted by src once, each hop's
    neighbor gather is a searchsorted slice — work per hop is edges
    touched, not edges total."""
    live = live_arrow(tables)
    t = pa.concat_tables(live)
    order = np.argsort(t["src"].to_numpy(zero_copy_only=False),
                       kind="stable")
    src_s = t["src"].to_numpy(zero_copy_only=False)[order]
    dst_s = t["dst"].to_numpy(zero_copy_only=False)[order]
    dist = np.full(n, -1, dtype=np.int64)
    dist[0] = 0
    frontier = np.array([0], dtype=np.int64)
    for hop in range(1, max_hops + 1):
        lo = np.searchsorted(src_s, frontier, side="left")
        hi = np.searchsorted(src_s, frontier, side="right")
        parts = [dst_s[a:b] for a, b in zip(lo, hi) if b > a]
        if not parts:
            break
        cand = np.unique(np.concatenate(parts))
        new = cand[dist[cand] == -1]
        if len(new) == 0:
            break
        dist[new] = hop
        frontier = new
    return pa.table({"node": pa.array(np.arange(n, dtype=np.int64)),
                     "dist": pa.array(dist, pa.int64())})


def q_graph_bfs(sf_dir, max_hops: int = BFS_MAX_HOPS,
                max_single_edges: int = BFS_MAX_SINGLE_EDGES):
    """Single-source BFS hop distance from node 0 over the derived order
    graph (same deterministic edge set as q_pagerank) — the traversal
    member of the graph family (pagerank = fixed-iteration, connected
    components = converging labels, BFS = expanding frontier).
    Unreached-within-max_hops nodes report −1 (no nullable-int dtype
    gamble).

    Scale plan: per hop one hash join (frontier ⋈ edges on src), a
    map-side-distinct on dst, and an anti-join against the visited set
    — the frontier and visited sets are node-sized Datasets, never
    driver state. Below ``max_single_edges`` the collected-edge
    single-task tier runs instead (tiers pinned identical by test)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    cust = T(sf_dir, "customer", ["c_custkey"])
    dom = cust.aggregate(Min("c_custkey"), Max("c_custkey"), Count())
    n = dom["count()"]
    if dom["min(c_custkey)"] != 0 or dom["max(c_custkey)"] != n - 1:
        raise ValueError(
            f"graph_bfs needs dense 0-based c_custkey; got "
            f"[{dom['min(c_custkey)']}, {dom['max(c_custkey)']}] n={n}")
    edges = _pagerank_edges(sf_dir, n).materialize()

    if edges.count() <= max_single_edges:
        return rd.from_arrow_refs(
            [_bfs_task.remote(n, max_hops, *edges.to_arrow_refs())])

    visited = rd.from_arrow(pa.table({
        "node": pa.array([0], pa.int64()),
        "dist": pa.array([0], pa.int64()),
    })).materialize()
    frontier = visited
    for hop in range(1, max_hops + 1):
        cand = edges.join(
            frontier.map_batches(
                lambda b: pa.table({"src": b["node"]}),
                batch_format="pyarrow"),
            "inner", num_partitions=JOIN_PARTS, on=("src",),
        ).map_batches(lambda b: pa.table({"node": b["dst"]}),
                      batch_format="pyarrow")
        cand = fast_groupby_agg(cand, ["node"], {"_n": (None, "count")})
        new = cand.join(visited.select_columns(["node"]), "left_anti",
                        num_partitions=JOIN_PARTS, on=("node",))
        new = new.map_batches(
            lambda b, h=hop: pa.table({
                "node": b["node"],
                "dist": pa.array(np.full(b.num_rows, h), pa.int64()),
            }),
            batch_format="pyarrow",
        ).materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new

    nodes = cust.map_batches(
        lambda b: pa.table({"node": b["c_custkey"]}), batch_format="pyarrow")
    out = nodes.join(visited, "left_outer", num_partitions=JOIN_PARTS, on=("node",))
    return out.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "dist": pc.fill_null(b["dist"], -1),
        }),
        batch_format="pyarrow",
    )


def _bfs_oracle(max_hops: int = BFS_MAX_HOPS) -> str:
    """Recursive-CTE BFS: UNION-dedup on (node, dist) pairs bounds the
    recursion; min(dist) per node == first-reach hop."""
    return f"""
        WITH RECURSIVE nn AS (SELECT count(*) AS c FROM customer),
        e AS (
            SELECT o_custkey AS src,
                   o_orderkey % (SELECT c FROM nn) AS dst
            FROM orders
        ),
        bfs AS (
            SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
            UNION
            SELECT e.dst, bfs.dist + 1
            FROM bfs JOIN e ON e.src = bfs.node
            WHERE bfs.dist < {max_hops}
        ),
        d AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY node)
        SELECT c.c_custkey AS node,
               CAST(COALESCE(d.dist, -1) AS BIGINT) AS dist
        FROM customer c LEFT JOIN d ON d.node = c.c_custkey
    """


def q_j_full_outer(sf_dir):
    """Full-outer join with unmatched rows on BOTH sides: negative-balance
    customers vs per-customer counts of large orders (>300k). Completes
    the join family (inner / left / semi / anti / full). Scale plan: both
    sides are filtered + pre-aggregated BEFORE the exchange (the join
    moves one row per surviving key, never raw facts); Ray's hash
    full-outer coalesces the key into the left column, and a flag column
    carried through the join marks left-side presence."""
    neg = T(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda b: pa.table({
            "c_custkey": b.filter(pc.less(b["c_acctbal"], 0.0))["c_custkey"],
        }).append_column("__left", pa.array(
            np.ones(len(b.filter(pc.less(b["c_acctbal"], 0.0))), np.int64))),
        batch_format="pyarrow",
    )
    big = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            lambda b: pa.table({
                "o_custkey":
                    b.filter(pc.greater(b["o_totalprice"], 300000.0))
                    ["o_custkey"],
            }),
            batch_format="pyarrow"),
        ["o_custkey"], {"n_big": (None, "count")},
    )
    j = neg.join(big, "full_outer", num_partitions=JOIN_PARTS,
                 on=("c_custkey",), right_on=("o_custkey",))
    return j.map_batches(
        lambda b: pa.table({
            "custkey": b["c_custkey"],
            "has_neg_bal": pc.fill_null(b["__left"], 0),
            "n_big": pc.fill_null(b["n_big"], 0),
        }),
        batch_format="pyarrow",
    )


def q_forward_fill(sf_dir):
    """Forward fill (last observation carried forward): every 7th event
    carries a reading; all rows report the latest reading at-or-before
    them per user in (ts, event_id) order — the sensor-gap/LOCF operator.
    Leading rows before any reading are NULL (surfaced as NaN, the
    nullable-BIGINT comparison dtype).

    Plan: ``groupby(user).map_groups`` + a vectorized cummax-of-positions
    fill inside each group — same bounded-per-key assumption as
    window_functions; a cross-partition variant would carry per-block
    (first/last reading) boundary rows through a second tiny exchange."""
    ds = T(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _fill(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        eid = df["event_id"].to_numpy()
        have = (eid % 7) == 0
        pos = np.where(have, np.arange(len(eid)), -1)
        np.maximum.accumulate(pos, out=pos)
        filled = np.where(
            pos >= 0, eid[np.maximum(pos, 0)].astype(np.float64), np.nan)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "event_id": eid,
            "filled": filled,
        })

    return ds.groupby("user_id").map_groups(_fill, batch_format="pandas")


def q_exists_subquery(sf_dir):
    """EXISTS correlated subquery (TPC-H Q4 shape): orders per priority
    that have at least one high-quantity line item. Plan: the subquery
    side is reduced to map-side-distinct keys (the exchange moves one
    row per qualifying order, not lineitem rows), then a hash
    ``left_semi`` join and a small groupby — no driver key set."""
    keys = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
            lambda b: pa.table({
                "l_orderkey":
                    b.filter(pc.greater(b["l_quantity"], 45.0))
                    ["l_orderkey"],
            }),
            batch_format="pyarrow"),
        ["l_orderkey"], {"__n": (None, "count")},
    ).drop_columns(["__n"])
    sj = T(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).join(
        keys, "left_semi", num_partitions=JOIN_PARTS,
        on=("o_orderkey",), right_on=("l_orderkey",))
    return fast_groupby_agg(sj, ["o_orderpriority"],
                            {"n_orders": (None, "count")})


def q_order_count_distribution(sf_dir):
    """Two-level aggregation (TPC-H Q13 shape): orders-per-customer
    including zero-order customers, then the distribution of those
    counts. Plan: pre-aggregate orders to one row per customer, hash
    left-outer join against customer keys, then a second (tiny) groupby
    over the count domain — both exchanges move key-sized tables."""
    counts = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey"]), ["o_custkey"],
        {"n_orders": (None, "count")},
    )
    j = T(sf_dir, "customer", ["c_custkey"]).join(
        counts, "left_outer", num_partitions=JOIN_PARTS,
        on=("c_custkey",), right_on=("o_custkey",),
    ).map_batches(
        lambda b: pa.table({"n_orders": pc.fill_null(b["n_orders"], 0)}),
        batch_format="pyarrow",
    )
    return fast_groupby_agg(j, ["n_orders"], {"n_custs": (None, "count")})


def q_argmax_join(sf_dir):
    """Greatest-per-group join-back (TPC-H Q2 shape): per nation, the
    customer with the max account balance (ties → min custkey), enriched
    with the nation name. Plan: the mergeable grouped top-1
    (stages/fastagg.grouped_topk — per-block top-1, tree combine) keeps
    whole rows so no join-back to the fact table is needed; the nation
    name comes from a broadcast of the 25-row dimension."""
    from ..stages.fastagg import grouped_topk

    top = grouped_topk(
        T(sf_dir, "customer", ["c_nationkey", "c_custkey", "c_acctbal"]),
        ["c_nationkey"], ["c_acctbal", "c_custkey"], [False, True], 1,
    )
    names = dict(zip(
        *(T(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
          [c].tolist() for c in ("n_nationkey", "n_name"))))

    def _name(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_pylist()
        return pa.table({
            "c_nationkey": b["c_nationkey"],
            "n_name": pa.array([names[k] for k in nk], pa.string()),
            "c_custkey": b["c_custkey"],
            "c_acctbal": b["c_acctbal"],
        })

    return top.map_batches(_name, batch_format="pyarrow")


def q_mom_growth(sf_dir):
    """Month-over-month revenue delta per market segment: hash-join
    orders⋈customer, monthly ×100 fixed-point revenue rollup, then a
    per-segment LAG — the time-series growth-report shape. First month
    per segment has NULL prev/diff (nullable-BIGINT → float64 comparison
    dtype). The exchange moves one row per (segment, month); the lag
    runs on the tiny aggregate."""
    j = T(sf_dir, "orders",
          ["o_custkey", "o_orderdate", "o_totalprice"]).join(
        T(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))
    m = j.map_batches(
        lambda b: pa.table({
            "c_mktsegment": b["c_mktsegment"],
            "month": pc.strftime(b["o_orderdate"], format="%Y-%m"),
            "rev_fp": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)),
        }),
        batch_format="pyarrow",
    )
    agg = fast_groupby_agg(m, ["c_mktsegment", "month"],
                           {"rev_fp": ("rev_fp", "sum")})

    def _lag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("month", kind="mergesort")
        prev = df["rev_fp"].shift(1)
        return pd.DataFrame({
            "c_mktsegment": df["c_mktsegment"].to_numpy(),
            "month": df["month"].to_numpy(),
            "rev_fp": df["rev_fp"].to_numpy(),
            "prev_fp": prev.to_numpy(dtype=np.float64),
            "diff_fp": (df["rev_fp"] - prev).to_numpy(dtype=np.float64),
        })

    return agg.groupby("c_mktsegment").map_groups(_lag,
                                                  batch_format="pandas")


SOURCE_JACCARD_MAX_SOURCES = 63    # bitmask plan bound (one uint64)
SOURCE_JACCARD_MAX_MASKS = 4_000_000  # distinct-mask final-task bound


def q_source_jaccard(sf_dir):
    """Pairwise token-set Jaccard similarity between document SOURCES —
    the corpus-mixing diagnostic ("how much does src A's vocabulary
    overlap src B's?"). Plan: per-doc distinct tokens → map-side
    distinct (source, token) rows → each source gets a bit → per-token
    source BITMASK (sum of distinct per-source bits == OR) → distinct
    masks counted — so the final task sees |distinct masks| rows (≤ 2^S,
    in practice ≪), never token-scale data. Pairs with zero overlap are
    not emitted (matches the oracle's inner join). The single float
    division inter/union is the only float op, identical on both sides.

    Guards: > SOURCE_JACCARD_MAX_SOURCES sources (bitmask width) or
    > SOURCE_JACCARD_MAX_MASKS distinct masks → the plan raises; the
    scale path would shard the mask domain (pair counting distributes
    over disjoint mask subsets by linearity)."""
    docs = T(sf_dir, "documents", ["source", "text"])

    def _src_tokens(b: pa.Table) -> pa.Table:
        srcs, toks = [], []
        for s, txt in zip(b["source"].to_pylist(), b["text"].to_pylist()):
            t = set(_TOKEN.findall(txt.lower()))
            srcs.extend([s] * len(t))
            toks.extend(t)
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "token": pa.array(toks, pa.string())})

    pairs = fast_groupby_agg(
        docs.map_batches(_src_tokens, batch_format="pyarrow"),
        ["source", "token"], {"__n": (None, "count")},
    ).drop_columns(["__n"])

    sources = sorted(set(
        fast_groupby_agg(docs.select_columns(["source"]), ["source"],
                         {"__n": (None, "count")})
        .to_pandas()["source"]))
    if len(sources) > SOURCE_JACCARD_MAX_SOURCES:
        raise ValueError(
            f"source_jaccard bitmask plan supports ≤"
            f"{SOURCE_JACCARD_MAX_SOURCES} sources, got {len(sources)}")
    bit = {s: i for i, s in enumerate(sources)}
    bref = ray.put(bit)

    class _Mask:
        def __init__(self):
            self.bit = ray.get(bref)

        def __call__(self, b: pa.Table) -> pa.Table:
            masks = np.array([1 << self.bit[s]
                              for s in b["source"].to_pylist()], np.int64)
            return pa.table({"token": b["token"],
                             "mask": pa.array(masks, pa.int64())})

    # per-token OR == SUM (each source appears once per token after the
    # distinct), then count tokens per distinct mask
    tok_masks = fast_groupby_agg(
        pairs.map_batches(_Mask, batch_format="pyarrow", concurrency=2),
        ["token"], {"mask": ("mask", "sum")},
    )
    mask_counts = fast_groupby_agg(
        tok_masks.drop_columns(["token"]), ["mask"],
        {"n_tokens": (None, "count")},
    ).to_pandas()
    if len(mask_counts) > SOURCE_JACCARD_MAX_MASKS:
        raise ValueError("source_jaccard: distinct-mask domain too large")

    s_n = len(sources)
    sizes = np.zeros(s_n, dtype=np.int64)
    inter = np.zeros((s_n, s_n), dtype=np.int64)
    for m, n in zip(mask_counts["mask"].to_numpy(),
                    mask_counts["n_tokens"].to_numpy()):
        bits = [i for i in range(s_n) if (int(m) >> i) & 1]
        for i in bits:
            sizes[i] += n
        for ai in range(len(bits)):
            for bi in range(ai + 1, len(bits)):
                inter[bits[ai], bits[bi]] += n
    rows = []
    for a in range(s_n):
        for b_ in range(a + 1, s_n):
            ni = int(inter[a, b_])
            if ni == 0:
                continue
            nu = int(sizes[a] + sizes[b_] - ni)
            rows.append({"src_a": sources[a], "src_b": sources[b_],
                         "n_inter": ni, "n_union": nu,
                         "jaccard": ni / nu})
    return pd.DataFrame(rows)


def q_cms_frequency(sf_dir, top: int = 20):
    """Count-min-sketch point-frequency estimates for the top-`top`
    l_partkey heavy hitters, with the exact counts and asserted error
    gates (never-underestimate; overcount within 3× the e/W·N bound;
    mean overcount within the bound itself) — the mergeable-sketch
    companion to the Misra–Gries heavy_hitters entry. Per-batch d×w
    partials tree-combine by elementwise sum; the driver never sees more
    than ~32 sketch buffers."""
    from ..functions.sketches import CMS_D, CMS_W, cms_partial, cms_query

    ds = T(sf_dir, "lineitem", ["l_partkey"])

    def _partial(b: pa.Table) -> pa.Table:
        keys = b["l_partkey"].to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([cms_partial(keys).tobytes()],
                                       pa.binary())})

    sketch = _tree_reduce_buffers(
        ds.map_batches(_partial, batch_format="pyarrow"), "m",
        np.add, np.int64)
    exact = fast_groupby_agg(ds, ["l_partkey"], {"n": (None, "count")})
    n_total = int(T(sf_dir, "lineitem", ["l_partkey"]).count())
    top_df = (exact.sort(["n", "l_partkey"], descending=[True, False])
              .limit(top).to_pandas())
    est = cms_query(sketch, top_df["l_partkey"].to_numpy())
    over = est - top_df["n"].to_numpy()
    bound = math.e / CMS_W * n_total
    assert (over >= 0).all(), "CMS underestimated a count"
    assert over.max() <= max(3 * bound, 3.0), (over.max(), bound)
    assert over.mean() <= max(bound, 1.0), (over.mean(), bound)
    return pd.DataFrame({
        "l_partkey": top_df["l_partkey"].to_numpy(),
        "exact": top_df["n"].to_numpy(),
        "est": est,
        "overcount": over,
        "d": np.full(len(est), CMS_D),
        "w": np.full(len(est), CMS_W),
    })


BUCKETED_JOIN_BUCKETS = 16


def q_bucketed_join(sf_dir, n_buckets: int = BUCKETED_JOIN_BUCKETS):
    """Layout-aware co-partitioned join: both sides are written ONCE
    hash-bucketed by the join key (splitmix64(key) mod n_buckets), then
    each bucket pair joins LOCALLY in its own task — ZERO exchange at
    join time. This is the 100-TB plan for repeated joins on one key:
    pay the shuffle once at layout time, amortize it over every
    subsequent join (and co-locate bucket i of both tables on one node).
    Revenue is ×100 integer fixed-point so the per-bucket partial →
    final-sum plan is bit-exact regardless of bucket count.

    The per-bucket task does read → pyarrow hash join → nation-level
    partial agg, so the union carries ≤ |nations| rows per bucket."""
    import os
    import shutil

    import ray.data as rd

    from ..functions.sketches import _splitmix64

    root = f"/tmp/fcray_bucketed_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)

    def _bucketize(key):
        def _b(b: pa.Table) -> pa.Table:
            k = b[key].to_numpy(zero_copy_only=False).astype(np.uint64)
            return b.append_column("bucket", pa.array(
                (_splitmix64(k) % np.uint64(n_buckets)).astype(np.int64)))
        return _b

    T(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        _bucketize("o_custkey"), batch_format="pyarrow",
    ).write_parquet(f"{root}/orders", partition_cols=["bucket"])
    T(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        _bucketize("c_custkey"), batch_format="pyarrow",
    ).write_parquet(f"{root}/customer", partition_cols=["bucket"])

    @ray.remote
    def _bucket_join(i: int) -> pa.Table:
        import pyarrow.parquet as pq
        o = pq.read_table(f"{root}/orders/bucket={i}",
                          columns=["o_custkey", "o_totalprice"])
        c = pq.read_table(f"{root}/customer/bucket={i}",
                          columns=["c_custkey", "c_nationkey"])
        j = o.join(c, keys="o_custkey", right_keys="c_custkey",
                   join_type="inner")
        fp = _round_half_away(
            j["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame({
            "c_nationkey":
                j["c_nationkey"].to_numpy(zero_copy_only=False),
            "rev_fp": fp,
        })
        g = df.groupby("c_nationkey", sort=False)
        out = g.agg(rev_fp=("rev_fp", "sum"), n_orders=("rev_fp", "size"))
        return pa.Table.from_pandas(out.reset_index(),
                                    preserve_index=False)

    refs = [_bucket_join.remote(i) for i in range(n_buckets)]
    ray.wait(refs, num_returns=len(refs))
    shutil.rmtree(root, ignore_errors=True)
    partials = rd.from_arrow_refs(refs)
    return fast_groupby_agg(partials, ["c_nationkey"], {
        "rev_fp": ("rev_fp", "sum"),
        "n_orders": ("n_orders", "sum"),
    })


# ====================================================== data auditing

_FK_RELATIONS = (
    # (label, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
)


def q_fk_integrity(sf_dir):
    """Referential-integrity audit: per FK relation, the number of
    distinct child keys and how many of them are orphans (missing from
    the parent table) — the data-quality gate every ingest pipeline runs
    before joining. Scale plan: each side is reduced to map-side
    DISTINCT keys before the hash ``left_anti`` exchange, so the
    all-to-all moves key sets, never fact rows; the three relations'
    outputs are driver scalars (one int pair each)."""
    from concurrent.futures import ThreadPoolExecutor

    def _audit(rel):
        label, child, ck, parent, pk = rel
        ckeys = fast_groupby_agg(
            T(sf_dir, child, [ck]), [ck], {"__n": (None, "count")},
        ).drop_columns(["__n"]).materialize()
        orphans = ckeys.join(
            T(sf_dir, parent, [pk]), "left_anti", num_partitions=4,
            on=(ck,), right_on=(pk,))
        return {"relation": label, "n_child_keys": ckeys.count(),
                "n_orphans": orphans.count()}

    # the three audits are independent Dataset pipelines — run them
    # concurrently (each execution gets its own streaming executor)
    with ThreadPoolExecutor(max_workers=len(_FK_RELATIONS)) as ex:
        rows = list(ex.map(_audit, _FK_RELATIONS))
    return pd.DataFrame(rows).sort_values("relation").reset_index(drop=True)


_PROFILE_COLS = ("o_custkey", "o_orderpriority", "o_orderstatus")


def q_table_profile(sf_dir):
    """Column profiler (the first stage of any schema-drift monitor):
    per column of ``orders`` — row count, null count, exact distinct
    count. Plan: ONE long-format pass; each block emits (a) 3 count/null
    partial rows and (b) its block-DISTINCT (col, val-as-string) pairs,
    so the single exchange carries per-block distinct pairs (bounded by
    value domain × blocks), never raw rows. Stringification is injective
    per column (values never cross columns), so per-column distinct
    counts are exact."""
    ds = T(sf_dir, "orders", list(_PROFILE_COLS))

    def _counts(b: pa.Table) -> pa.Table:
        return pa.table({
            "col": pa.array(list(_PROFILE_COLS), pa.string()),
            "n_rows": pa.array([len(b)] * len(_PROFILE_COLS), pa.int64()),
            "n_null": pa.array([b[c].null_count for c in _PROFILE_COLS],
                               pa.int64()),
        })

    def _pairs(b: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in _PROFILE_COLS:
            u = pc.unique(pc.cast(b[c], pa.string()))
            cols.append(pa.array([c] * len(u), pa.string()))
            vals.append(u)
        return pa.table({"col": pa.concat_arrays(cols),
                         "val": pa.concat_arrays(
                             a.combine_chunks() if isinstance(
                                 a, pa.ChunkedArray) else a for a in vals)})

    counts = fast_groupby_agg(
        ds.map_batches(_counts, batch_format="pyarrow"), ["col"],
        {"n_rows": ("n_rows", "sum"), "n_null": ("n_null", "sum")},
    ).to_pandas()
    distinct = fast_groupby_agg(
        fast_groupby_agg(
            ds.map_batches(_pairs, batch_format="pyarrow"),
            ["col", "val"], {"__n": (None, "count")}),
        ["col"], {"n_distinct": (None, "count")},
    ).to_pandas()
    out = counts.merge(distinct, on="col").sort_values("col")
    return out[["col", "n_rows", "n_null", "n_distinct"]] \
        .reset_index(drop=True)


def q_chi_square(sf_dir):
    """Chi-square independence decomposition of a contingency table
    (o_orderstatus × o_orderpriority): per cell the observed count, the
    expected count under independence (×1e6 fixed point) and the cell's
    χ² contribution (×1e9) — the categorical-drift / feature-selection
    statistic. Plan: one partial-agg groupby builds the |statuses|×
    |priorities| table; the marginals and per-cell terms run on that
    tiny aggregate. Float policy: e = double(rt·ct)/N and (n−e)²/e are
    single IEEE ops mirrored verbatim in the oracle, then half-away
    rounding on both sides."""
    cont = fast_groupby_agg(
        T(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"]),
        ["o_orderstatus", "o_orderpriority"], {"n": (None, "count")},
    ).to_pandas()
    n = cont["n"].to_numpy(np.int64)
    rt = cont.groupby("o_orderstatus")["n"].transform("sum") \
        .to_numpy(np.int64)
    ct = cont.groupby("o_orderpriority")["n"].transform("sum") \
        .to_numpy(np.int64)
    tot = int(n.sum())
    e = (rt * ct).astype(np.float64) / tot
    d = n - e
    chi2 = d * d / e
    out = pd.DataFrame({
        "o_orderstatus": cont["o_orderstatus"],
        "o_orderpriority": cont["o_orderpriority"],
        "n": n,
        "e_fp": _round_half_away(1e6 * e).astype(np.int64),
        "chi2_fp": _round_half_away(1e9 * chi2).astype(np.int64),
    })
    return out.sort_values(["o_orderstatus", "o_orderpriority"]) \
        .reset_index(drop=True)


_IDLE_RICH_NATIONS = (1, 3, 5, 7, 9, 11, 13)


def q_idle_rich_customers(sf_dir):
    """TPC-H Q22 shape: customers in selected nations with positive,
    above-pool-average balance who never placed a LARGE order
    (>450k) — per nation count and total balance. Composite of scalar
    subquery + anti-join + grouped agg. Exactness: balances are ×100
    integer cents and the average comparison is the cross-multiplied
    ``bal·n > Σbal`` (no division). Scale plan: the pool scalar is two
    ints (per-block partials summed); the anti-join probes
    map-side-distinct large-order custkeys through a hash ``left_anti``
    exchange — key-sized, never fact-sized."""
    pool = T(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def _pool(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater(b["c_acctbal"], 0.0),
            pc.is_in(b["c_nationkey"],
                     value_set=pa.array(_IDLE_RICH_NATIONS, pa.int64())))
        t = b.filter(keep)
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_nationkey": t["c_nationkey"],
            "bal_c": pa.array(_round_half_away(
                t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    fp = pool.map_batches(_pool, batch_format="pyarrow").materialize()
    parts = fp.map_batches(
        lambda b: pa.table({
            "s": pa.array([int(pc.sum(b["bal_c"]).as_py() or 0)], pa.int64()),
            "n": pa.array([len(b)], pa.int64()),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    tot, np_ = int(parts["s"].sum()), int(parts["n"].sum())

    okeys = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            lambda b: pa.table({
                "o_custkey":
                    b.filter(pc.greater(b["o_totalprice"], 450000.0))
                    ["o_custkey"],
            }),
            batch_format="pyarrow"),
        ["o_custkey"], {"__n": (None, "count")},
    ).drop_columns(["__n"])
    rich = fp.map_batches(
        lambda b: b.filter(pc.greater(
            pc.multiply(b["bal_c"], np.int64(np_)), np.int64(tot))),
        batch_format="pyarrow",
    )
    idle = rich.join(okeys, "left_anti", num_partitions=4,
                     on=("c_custkey",), right_on=("o_custkey",))
    return fast_groupby_agg(idle, ["c_nationkey"], {
        "n_custs": (None, "count"), "totbal_fp": ("bal_c", "sum"),
    })


def q_group_mean_impute(sf_dir):
    """Group-mean imputation (the tabular-ML missing-value stage):
    events whose ``event_id % 11 == 0`` are treated as missing and take
    their user's mean of present values; everything is ×1e6 integer
    fixed point and the mean divides once per user on the tiny
    aggregate (double(Σ)/n, mirrored in the oracle). Users with no
    present value stay NULL. Plan: per-user (Σ, n) partial-agg groupby,
    hash left-outer join back, vectorized where() — the exchange moves
    one row per user plus the fact rows once."""
    ds = T(sf_dir, "events", ["event_id", "user_id", "value"])

    def _fp(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        v = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "v_fp": pa.array(v, pa.int64()),
            "miss": pa.array(eid % 11 == 0),
        })

    fp = ds.map_batches(_fp, batch_format="pyarrow").materialize()
    present = fp.map_batches(
        lambda b: b.filter(pc.invert(b["miss"])).select(
            ["user_id", "v_fp"]),
        batch_format="pyarrow")
    means = fast_groupby_agg(present, ["user_id"], {
        "s": ("v_fp", "sum"), "n": (None, "count"),
    }).map_batches(
        lambda b: pa.table({
            "uid_r": b["user_id"],
            "mean_fp": pa.array(_round_half_away(
                b["s"].to_numpy(zero_copy_only=False).astype(np.float64)
                / b["n"].to_numpy(zero_copy_only=False)
            ).astype(np.int64), pa.int64()),
        }),
        batch_format="pyarrow")
    j = fp.join(means, "left_outer", num_partitions=JOIN_PARTS,
                on=("user_id",), right_on=("uid_r",))

    def _impute(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "value_fp": pc.if_else(b["miss"], b["mean_fp"], b["v_fp"]),
        })

    return j.map_batches(_impute, batch_format="pyarrow")


def q_trimmed_mean(sf_dir):
    """Per-group 10% trimmed mean of l_quantity WITHOUT any row sort:
    the grouped value-counts histogram (one partial-agg exchange, |flag|
    × |distinct qty| rows) yields exact rank thresholds by cumulative
    sum, and each value's kept multiplicity is the overlap of its rank
    interval with (n//10, n − n//10] — bit-identical to the oracle's
    row_number window because a rank slice of a sorted multiset is
    tie-order-free. The robust-statistics aggregate at 100 TB: the raw
    column never moves, only the tiny histogram does."""
    hist = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]),
        ["l_returnflag", "l_quantity"], {"cnt": (None, "count")},
    ).to_pandas()
    rows = []
    for flag, g in hist.groupby("l_returnflag"):
        g = g.sort_values("l_quantity")
        qc = _round_half_away(
            g["l_quantity"].to_numpy(np.float64) * 100).astype(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        lo, hi = n // 10, n - n // 10
        start = cum - cnt  # ranks (start, cum] hold this value
        kept = np.clip(np.minimum(cum, hi) - np.maximum(start, lo), 0, None)
        n_kept = int(kept.sum())
        s = int((qc * kept).sum())
        rows.append({
            "l_returnflag": flag, "n_kept": n_kept, "sum_fp": s,
            "mean_fp": int(_round_half_away(
                np.float64(s) / n_kept)) if n_kept else None,
        })
    return pd.DataFrame(rows).sort_values("l_returnflag") \
        .reset_index(drop=True)


def q_ratio_to_report(sf_dir):
    """Ratio-to-report window (revenue share of each nation within its
    region, ×1e9 fixed point): hash-join orders⋈customer pre-aggregated
    to nation grain, broadcast the 25/5-row nation→region dimensions,
    and compute shares on the |nations|-row aggregate. The only
    fact-sized motion is the orders→nation partial agg; division happens
    once per nation on exact integer sums (double/double, mirrored)."""
    names = {
        int(r["n_nationkey"]): (str(r["n_name"]), int(r["n_regionkey"]))
        for _, r in T(sf_dir, "nation").to_pandas().iterrows()
    }
    regions = {
        int(r["r_regionkey"]): str(r["r_name"])
        for _, r in T(sf_dir, "region").to_pandas().iterrows()
    }

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "rev_c": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    j = T(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        _fp, batch_format="pyarrow",
    ).join(
        T(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))
    nr = fast_groupby_agg(j, ["c_nationkey"], {"rev_fp": ("rev_c", "sum")}
                          ).to_pandas()
    nr["n_name"] = [names[k][0] for k in nr["c_nationkey"]]
    nr["r_name"] = [regions[names[k][1]] for k in nr["c_nationkey"]]
    reg = nr.groupby("r_name")["rev_fp"].transform("sum")
    share = 1e9 * (nr["rev_fp"].to_numpy(np.float64)
                   / reg.to_numpy(np.float64))
    out = pd.DataFrame({
        "n_name": nr["n_name"], "r_name": nr["r_name"],
        "rev_fp": nr["rev_fp"],
        "share_fp": _round_half_away(share).astype(np.int64),
    })
    return out.sort_values("n_name").reset_index(drop=True)


def q_dedup_survivor(sf_dir):
    """Quality-aware survivorship dedup: per exact-duplicate cluster
    (raw-text md5) keep the BEST record — max n_chars, tie-broken by min
    doc_id — not merely the first-seen. This is the canonicalization
    flavor of D1 a training-data pipeline wants (keep the longest/most
    complete copy). Plan: md5 map-side, then the mergeable grouped top-1
    (per-block top-1, tree combine) — no per-group Python, no join-back;
    the exchange carries ≤1 row per (block × cluster)."""
    from ..stages.fastagg import grouped_topk

    def _h(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        return pa.table({
            "h": pa.array([hashlib.md5((t or "").encode()).hexdigest()
                           for t in texts], pa.string()),
            "doc_id": b["doc_id"],
            "source": b["source"],
            "n_chars": b["n_chars"],
        })

    ds = T(sf_dir, "documents", ["doc_id", "text", "source", "n_chars"]
           ).map_batches(_h, batch_format="pyarrow")
    top = grouped_topk(ds, ["h"], ["n_chars", "doc_id"], [False, True], 1)
    return top.select_columns(["doc_id", "source", "n_chars"])


def q_time_weighted_avg(sf_dir):
    """Time-weighted average (TWAP): per user, each value weighted by
    its dwell — the milliseconds until the user's next event in
    (ts, event_id) order; the last event carries no weight. The
    stream-analytics aggregate for irregularly-sampled series. Exactness:
    values are ×1e3 integers, dwell is exact epoch-ms, Σ(v·dw) and Σdw
    are exact int64 sums (|v_fp|≤5e5, dw≤1e8 ⇒ products ≤5e13), and the
    single final division is double/int mirrored in the oracle. Plan:
    per-user ``map_groups`` with a vectorized shift — the same
    bounded-rows-per-key assumption as window_functions; the exchange
    moves each event row once."""
    ds = T(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    _empty = pd.DataFrame({
        "user_id": pd.Series(dtype="int64"),
        "total_dwell_ms": pd.Series(dtype="int64"),
        "twa_fp": pd.Series(dtype="int64"),
    })

    def _twa(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        ms = df["ts"].to_numpy().astype("datetime64[ms]").view("int64")
        v = _round_half_away(df["value"].to_numpy() * 1e3).astype(np.int64)
        dw = ms[1:] - ms[:-1]
        tot = int(dw.sum())
        if len(df) < 2 or tot == 0:
            # <2 events → no dwell rows; all-same-ms → HAVING Σdw > 0
            return _empty
        s = int((v[:-1] * dw).sum())
        return pd.DataFrame({
            "user_id": df["user_id"].iloc[:1],
            "total_dwell_ms": np.array([tot], np.int64),
            "twa_fp": np.array(
                [int(_round_half_away(np.float64(s) / tot))], np.int64),
        })

    return ds.groupby("user_id").map_groups(_twa, batch_format="pandas")


WEIGHTED_SAMPLE_K = 100


def q_weighted_sample(sf_dir, k: int = WEIGHTED_SAMPLE_K):
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-ES): each order draws u ∈ (0,1] from md5(o_orderkey) and
    scores key = ln(u)/w with w = o_totalprice; the top-k keys are the
    sample — inclusion probability ∝ weight, yet fully reproducible (and
    therefore exactly SQL-oracle-able, unlike RNG sampling). Plan:
    per-block local top-k, then one final combine task over ≤ blocks×k
    rows — no global sort, no shuffle. ln is libm ``math.log`` on both
    sides (the engine-wide ulp-parity policy)."""

    def _keys(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_pylist()
        w = b["o_totalprice"].to_numpy(zero_copy_only=False)
        u = np.array(
            [int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) + 1
             for x in ok], np.float64) / 4294967296.0
        key = np.array([math.log(x) for x in u], np.float64) / w
        df = pd.DataFrame({"o_orderkey": ok, "key": key})
        df = df.sort_values(["key", "o_orderkey"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = T(sf_dir, "orders", ["o_orderkey", "o_totalprice"]
              ).map_batches(_keys, batch_format="pyarrow").materialize()

    @ray.remote
    def _final(refs) -> pa.Table:
        blocks = ray.get(list(refs))
        t = pa.concat_tables([b for b in blocks if b.num_rows])
        df = t.to_pandas().sort_values(
            ["key", "o_orderkey"], ascending=[False, True]).head(k)
        return pa.table({
            "o_orderkey": pa.array(df["o_orderkey"].to_numpy(np.int64)),
            "key_fp": pa.array(_round_half_away(
                df["key"].to_numpy() * 1e9).astype(np.int64)),
        })

    import ray.data as rd

    # block refs go to the combine task unresolved (plasma-shared);
    # ≤ blocks×k rows ever co-reside there, nothing lands on the driver
    ref = _final.remote(parts.to_arrow_refs())
    return rd.from_arrow_refs([ref])


def q_bloom_semi_join(sf_dir):
    """Broadcast-Bloom join pushdown — THE shuffle-avoidance pattern for
    selective joins at 100 TB: build a Bloom filter over the small
    side's keys (rich customers), OR-merge the per-block partials (only
    filter buffers move, never keys), broadcast the filter, and pre-drop
    fact rows map-side BEFORE the expensive exchange. Returns a one-row
    audit: candidate counts, false-positive rate, and the exact semi
    count — with asserted gates (zero false negatives; FP rate within 3×
    the (1−e^{−kn/m})^k analytic bound). Not SQL-expressible (the FP set
    depends on the hash), so rows-only + gates, like cms_frequency."""
    from ..functions.sketches import BLOOM_K, bloom_partial, bloom_probe

    dim = fast_groupby_agg(
        T(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
            lambda b: pa.table({
                "c_custkey":
                    b.filter(pc.greater(b["c_acctbal"], 4000.0))
                    ["c_custkey"],
            }),
            batch_format="pyarrow"),
        ["c_custkey"], {"__n": (None, "count")},
    ).drop_columns(["__n"]).materialize()
    n_keys = dim.count()
    # 16 bits/key, capped at 2^30 bits (128 MB broadcast buffer): past
    # ~67M keys the FP rate degrades rather than the buffer growing —
    # at that scale a real deployment shards the filter by key hash
    # (blocked Bloom) instead of broadcasting one buffer; the FP gate
    # below uses the ACTUAL m, so degradation is measured, not hidden
    m_bits = 1 << min(30, max(14, int(math.ceil(
        math.log2(16 * max(n_keys, 1))))))

    def _build(b: pa.Table) -> pa.Table:
        keys = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array(
            [bloom_partial(keys, m_bits).tobytes()], pa.binary())})

    words = _tree_reduce_buffers(
        dim.map_batches(_build, batch_format="pyarrow"), "w",
        np.bitwise_or, np.uint64)
    wref = ray.put(words)

    class _Probe:
        def __init__(self):
            self.words = ray.get(wref)

        def __call__(self, b: pa.Table) -> pa.Table:
            keys = b["o_custkey"].to_numpy(zero_copy_only=False)
            ok = bloom_probe(self.words, keys)
            return pa.table({
                "n": pa.array([len(b)], pa.int64()),
                "n_pass": pa.array([int(ok.sum())], pa.int64()),
            })

    orders = T(sf_dir, "orders", ["o_custkey"])
    counts = orders.map_batches(_Probe, batch_format="pyarrow",
                                concurrency=(1, 4)).to_pandas()
    n_orders, n_pass = int(counts["n"].sum()), int(counts["n_pass"].sum())
    n_exact = orders.join(dim, "left_semi", num_partitions=4,
                          on=("o_custkey",),
                          right_on=("c_custkey",)).count()
    assert n_pass >= n_exact, "Bloom dropped a true match (false negative)"
    fp = (n_pass - n_exact) / max(n_orders - n_exact, 1)
    bound = (1.0 - math.exp(-BLOOM_K * n_keys / m_bits)) ** BLOOM_K
    assert fp <= max(3 * bound, 1e-3), (fp, bound)
    return pd.DataFrame([{
        "n_orders": n_orders, "n_exact": n_exact, "n_bloom_pass": n_pass,
        "n_false_pos": n_pass - n_exact,
        "fp_rate_fp": int(_round_half_away(np.float64(fp) * 1e9)),
        "m_bits": m_bits, "k": BLOOM_K, "n_keys": n_keys,
    }])


JOIN_EST_W = 1 << 17  # inner-product noise ≈ N²/w → w must absorb N²
JOIN_EST_D = 4


def q_join_size_estimate(sf_dir):
    """Sketch-based join-cardinality estimation (the optimizer
    primitive): the self-join size of lineitem on l_partkey — Σ_k f(k)²
    — estimated as the count-min row-wise inner product min_i Σ_w
    cms[i,w]², against the exact value from the grouped counts. The CMS
    inner product never underestimates (cross-collision terms only
    add); its expected overcount is (N²−Σf²)/w ≈ N²/w, so the asserted
    gate is the analytic 3·N²/w — scale-aware, unlike a fixed ratio
    (at 10× data the noise grows 100× and a fixed-w fixed-ratio gate
    would flip). Sketch partials tree-combine (d×w int64, ~4 MB); the
    exact side's exchange carries one row per distinct key."""
    from ..functions.sketches import cms_partial

    ds = T(sf_dir, "lineitem", ["l_partkey"])

    def _partial(b: pa.Table) -> pa.Table:
        keys = b["l_partkey"].to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array(
            [cms_partial(keys, w=JOIN_EST_W, d=JOIN_EST_D).tobytes()],
            pa.binary())})

    sketch = _tree_reduce_buffers(
        ds.map_batches(_partial, batch_format="pyarrow"), "m",
        np.add, np.int64).reshape(JOIN_EST_D, JOIN_EST_W)
    est = int(min(int((row.astype(object) * row).sum()) for row in sketch))
    n_total = int(sketch[0].sum())

    counts = fast_groupby_agg(ds, ["l_partkey"], {"n": (None, "count")})
    sq = counts.map_batches(
        lambda b: pa.table({"s": pa.array(
            [int((b["n"].to_numpy(zero_copy_only=False).astype(object)
                  ** 2).sum())], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    exact = int(sq["s"].sum())
    assert est >= exact, "CMS inner product underestimated the join size"
    bound = 3.0 * n_total * n_total / JOIN_EST_W
    assert est - exact <= bound, (est, exact, bound)
    rel = (est - exact) / max(exact, 1)
    return pd.DataFrame([{
        "exact": exact, "est": est,
        "rel_err_fp": int(_round_half_away(np.float64(rel) * 1e9)),
        "d": JOIN_EST_D, "w": JOIN_EST_W,
    }])


def q_pmi_bigrams(sf_dir, min_count: int = 5):
    """Pointwise mutual information for corpus bigrams seen ≥ min_count
    times — the collocation/association-mining statistic (PMI =
    ln(c·N / (c1·c2)) with c1/c2 the first-/second-position marginals).
    Plan: the per-batch bigram counters and partial-agg sum are shared
    with bigram_stats; marginals and N are second-level aggregates over
    the ALREADY vocabulary-sized bigram table, joined back with two
    hash joins (no driver state at any cardinality). Float policy: the
    integer products stay < 2^53 so the double ratio is exact-operand
    correctly-rounded division, and ln is libm ``math.log`` on both
    sides (the engine-wide ulp-parity policy)."""
    docs = T(sf_dir, "documents", ["text"])

    def _bi(b: pa.Table) -> pa.Table:
        cnt: dict = {}
        for txt in b["text"].to_pylist():
            toks = _TOKEN.findall(txt.lower())
            for i in range(len(toks) - 1):
                k = (toks[i], toks[i + 1])
                cnt[k] = cnt.get(k, 0) + 1
        return pa.table({
            "w1": pa.array([k[0] for k in cnt], pa.string()),
            "w2": pa.array([k[1] for k in cnt], pa.string()),
            "c": pa.array(list(cnt.values()), pa.int64()),
        })

    bi = fast_groupby_agg(
        docs.map_batches(_bi, batch_format="pyarrow"),
        ["w1", "w2"], {"c": ("c", "sum")},
    ).materialize()
    heads = fast_groupby_agg(bi, ["w1"], {"c1": ("c", "sum")})
    tails = fast_groupby_agg(bi, ["w2"], {"c2": ("c", "sum")}).map_batches(
        lambda b: b.rename_columns(["w2_r", "c2"]), batch_format="pyarrow")
    nb = int(bi.map_batches(
        lambda b: pa.table({"s": pa.array(
            [int(pc.sum(b["c"]).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow").to_pandas()["s"].sum())

    j = bi.map_batches(
        lambda b: b.filter(pc.greater_equal(b["c"], min_count)),
        batch_format="pyarrow",
    ).join(heads, "inner", num_partitions=JOIN_PARTS, on=("w1",)) \
        .join(tails, "inner", num_partitions=JOIN_PARTS,
              on=("w2",), right_on=("w2_r",))

    def _pmi(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        c1 = b["c1"].to_numpy(zero_copy_only=False)
        c2 = b["c2"].to_numpy(zero_copy_only=False)
        ratio = (c * nb).astype(np.float64) / (c1 * c2).astype(np.float64)
        pmi = np.array([math.log(x) for x in ratio], np.float64)
        return pa.table({
            "w1": b["w1"], "w2": b["w2"], "c": b["c"],
            "pmi_fp": pa.array(_round_half_away(1e9 * pmi)
                               .astype(np.int64), pa.int64()),
        })

    return j.map_batches(_pmi, batch_format="pyarrow")


def q_daily_anomaly(sf_dir):
    """Seasonal-naive anomaly detection on the event stream: each day
    with a full trailing week is scored against the trailing-week
    baseline and flagged when it deviates by more than 3σ. The z-test is
    ALL-INTEGER — (n·k − S)² > 9·(S2·k − S²) is the 3σ rule
    cross-multiplied by k², so there is no float anywhere and the oracle
    matches bit-for-bit by construction. Plan: the only fact-scale work
    is the daily-count partial agg; the trailing window runs on the
    date-cardinality-bounded aggregate (days, not events)."""
    daily = fast_groupby_agg(
        T(sf_dir, "events", ["ts"]).map_batches(
            lambda b: pa.table(
                {"day": pc.strftime(b["ts"], format="%Y-%m-%d")}),
            batch_format="pyarrow"),
        ["day"], {"n": (None, "count")},
    ).to_pandas().sort_values("day").reset_index(drop=True)
    n = daily["n"].to_numpy(np.int64)
    k = 7
    s = pd.Series(n).rolling(k).sum().shift(1).to_numpy()
    s2 = pd.Series(n * n).rolling(k).sum().shift(1).to_numpy()
    full = ~np.isnan(s)
    s_i = np.where(full, s, 0).astype(np.int64)
    s2_i = np.where(full, s2, 0).astype(np.int64)
    dev_sq = (n * k - s_i) ** 2
    thr = 9 * (s2_i * k - s_i * s_i)
    out = pd.DataFrame({
        "day": daily["day"][full],
        "n": n[full],
        "dev_sq": dev_sq[full],
        "thr": thr[full],
        "is_anomaly": (dev_sq > thr)[full],
    })
    return out.sort_values("day").reset_index(drop=True)


def q_q6_band_revenue(sf_dir):
    """TPC-H Q6 shape: forecast-revenue-change — one tight filter band
    (ship year 1996, discount ∈ [0.05, 0.07], quantity < 24) and a
    global sum of price·discount. The per-row product is ONE float
    multiply quantized ×1e4 before the integer sum, so block/batch
    association order cannot move the result. Plan: pure filtered
    map + partial sums; the only thing that ever moves is one int pair
    per block."""
    ds = T(sf_dir, "lineitem",
           ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    lo = np.datetime64("1996-01-01").astype("datetime64[ns]").view("int64")
    hi = np.datetime64("1997-01-01").astype("datetime64[ns]").view("int64")

    def _band(b: pa.Table) -> pa.Table:
        ship = _ts_ns(b["l_shipdate"])
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        keep = ((ship >= lo) & (ship < hi)
                & (disc >= 0.05) & (disc <= 0.07) & (qty < 24.0))
        fp = _round_half_away(
            price[keep] * disc[keep] * 1e4).astype(np.int64)
        return pa.table({
            "revenue_fp": pa.array([int(fp.sum())], pa.int64()),
            "n_rows": pa.array([int(keep.sum())], pa.int64()),
        })

    parts = ds.map_batches(_band, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([{
        "revenue_fp": int(parts["revenue_fp"].sum()),
        "n_rows": int(parts["n_rows"].sum()),
    }])


def q_ship_delay_distribution(sf_dir):
    """Order-to-ship latency distribution: exact integer day deltas
    between o_orderdate and l_shipdate, counted per delay — the
    fulfillment-SLA histogram. This is the one genuine FACT⋈FACT join
    in the suite (lineitem⋈orders): both sides are projected to
    (key, epoch-day) BEFORE the hash exchange, and the second groupby
    runs on the tiny delay domain."""
    li = T(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        lambda b: pa.table({
            "l_orderkey": b["l_orderkey"],
            "ship_day": pa.array(
                _ts_ns(b["l_shipdate"]) // 86_400_000_000_000, pa.int64()),
        }),
        batch_format="pyarrow")
    orders = T(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pa.table({
            "o_orderkey": b["o_orderkey"],
            "order_day": pa.array(
                _ts_ns(b["o_orderdate"]) // 86_400_000_000_000, pa.int64()),
        }),
        batch_format="pyarrow")
    j = li.join(orders, "inner", num_partitions=JOIN_PARTS,
                on=("l_orderkey",), right_on=("o_orderkey",))
    d = j.map_batches(
        lambda b: pa.table({
            "delay_days": pc.subtract(b["ship_day"], b["order_day"]),
        }),
        batch_format="pyarrow")
    return fast_groupby_agg(d, ["delay_days"], {"n": (None, "count")})


def q_promo_revenue_ratio(sf_dir):
    """TPC-H Q14 shape: per ship-month, the share of revenue from PROMO
    parts (×1e9). Plan: part is a TRUE dimension (does not grow with
    fact data) — its partkey→is-promo map broadcasts once per actor and
    the fact side folds to (month, promo_fp, total_fp) partials
    map-side; the exchange carries one row per (block × month). The
    final ratio divides two exact integer cent-sums (double/double,
    mirrored)."""
    pref = ray.put(
        T(sf_dir, "part", ["p_partkey", "p_type"]).to_arrow_refs())

    class _Fold:
        def __init__(self):
            t = pa.concat_tables(ray.get(ray.get(pref)))
            self.keys = t["p_partkey"].combine_chunks()
            self.promo = pc.equal(t["p_type"], "PROMO").combine_chunks()

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b["l_partkey"], value_set=self.keys)
            is_promo = self.promo.take(idx).to_numpy(zero_copy_only=False)
            month = pc.strftime(b["l_shipdate"], format="%Y-%m")
            fp = _round_half_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            df = pd.DataFrame({
                "month": month.to_pandas(),
                "promo_fp": np.where(is_promo, fp, 0),
                "total_fp": fp,
            })
            g = df.groupby("month", sort=False).sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

    folded = T(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice"]).map_batches(
        _Fold, batch_format="pyarrow", concurrency=(1, 4))
    agg = fast_groupby_agg(folded, ["month"], {
        "promo_fp": ("promo_fp", "sum"), "total_fp": ("total_fp", "sum"),
    })

    def _ratio(b: pa.Table) -> pa.Table:
        p = b["promo_fp"].to_numpy(zero_copy_only=False)
        t = b["total_fp"].to_numpy(zero_copy_only=False)
        r = 1e9 * (p.astype(np.float64) / t.astype(np.float64))
        return b.append_column(
            "ratio_fp", pa.array(_round_half_away(r).astype(np.int64)))

    return agg.map_batches(_ratio, batch_format="pyarrow")


def q_standardize(sf_dir):
    """Per-group z-score feature scaling (the tabular-ML preprocessing
    stage): every event's value standardized against its event_type's
    mean/std, ×1e6 fixed point. Values are ×100 integer cents; the
    per-group moments (n, Σv, Σv²) are exact integers from one
    partial-agg groupby; the per-row float expression is mirrored
    op-for-op in the oracle (sub, div, sqrt are IEEE correctly-rounded).
    Plan: event_type is a bounded domain → the 3-number moments
    broadcast; the fact side is one pure map pass."""
    ds = T(sf_dir, "events", ["event_id", "event_type", "value"])

    def _v(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "v": pa.array(v, pa.int64()),
            "v2": pa.array(v * v, pa.int64()),
        })

    fp = ds.map_batches(_v, batch_format="pyarrow").materialize()
    mom = fast_groupby_agg(fp, ["event_type"], {
        "n": (None, "count"), "s": ("v", "sum"), "s2": ("v2", "sum"),
    }).to_pandas()
    mref = ray.put({
        r["event_type"]: (int(r["n"]), int(r["s"]), int(r["s2"]))
        for _, r in mom.iterrows()
    })

    class _Z:
        def __init__(self):
            self.m = ray.get(mref)

        def __call__(self, b: pa.Table) -> pa.Table:
            et = pd.Series(b["event_type"].to_pylist())
            n = et.map({k: v[0] for k, v in self.m.items()}).to_numpy(
                np.float64)
            s = et.map({k: v[1] for k, v in self.m.items()}).to_numpy(
                np.float64)
            s2 = et.map({k: v[2] for k, v in self.m.items()}).to_numpy(
                np.float64)
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.float64)
            z = (v - s / n) / np.sqrt((s2 - s * s / n) / n)
            return pa.table({
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "z_fp": pa.array(_round_half_away(1e6 * z)
                                 .astype(np.int64), pa.int64()),
            })

    return fp.drop_columns(["v2"]).map_batches(
        _Z, batch_format="pyarrow", concurrency=(1, 4))


def q_train_val_test_split(sf_dir):
    """Deterministic train/val/test corpus split (80/10/10 by
    md5(doc_id) bucket) audited per source — the holdout-assignment
    stage every training pipeline needs to be reproducible across runs
    and machines (hash-based, NOT RNG-based, so adding documents never
    reshuffles existing assignments). Plan: pure map + one tiny
    (source × split) partial-agg groupby."""
    ds = T(sf_dir, "documents", ["doc_id", "source"])

    def _split(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        bucket = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10
             for i in ids], np.int64)
        split = np.where(bucket < 8, "train",
                         np.where(bucket == 8, "val", "test"))
        return pa.table({
            "source": b["source"],
            "split": pa.array(split.tolist(), pa.string()),
        })

    return fast_groupby_agg(
        ds.map_batches(_split, batch_format="pyarrow"),
        ["source", "split"], {"n": (None, "count")},
    )


def q_quality_top_quartile(sf_dir):
    """Per-source quality gating at a percentile threshold: keep the
    documents whose n_chars exceeds their source's p75 (rank rule:
    value at row ceil(0.75·n) of the sorted multiset — tie-order-free,
    pinned in the oracle). The curriculum/quality-mixing primitive.
    Plan: per-source distinct-value histogram (one partial-agg
    exchange, |sources|×|distinct n_chars| rows), thresholds from the
    tiny CDF, broadcast dict, pure filter map — the raw corpus is
    scanned twice but never sorted or shuffled."""
    docs = T(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    hist = fast_groupby_agg(
        docs.drop_columns(["doc_id"]), ["source", "n_chars"],
        {"cnt": (None, "count")},
    ).to_pandas()
    thresholds = {}
    for src, g in hist.groupby("source"):
        g = g.sort_values("n_chars")
        cum = g["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        r = max(1, math.ceil(0.75 * n))
        thresholds[src] = int(
            g["n_chars"].to_numpy()[np.searchsorted(cum, r)])
    tref = ray.put(thresholds)

    class _Gate:
        def __init__(self):
            self.thr = ray.get(tref)

        def __call__(self, b: pa.Table) -> pa.Table:
            thr = pd.Series(b["source"].to_pylist()).map(self.thr) \
                .to_numpy(np.int64)
            keep = b["n_chars"].to_numpy(zero_copy_only=False) > thr
            return b.filter(pa.array(keep))

    return docs.map_batches(_Gate, batch_format="pyarrow",
                            concurrency=(1, 4))


def q_schema_evolution_read(sf_dir):
    """Schema-evolution tolerant store read: epoch-1 parquet was written
    BEFORE a column existed (even orderkeys: o_orderkey, o_totalprice),
    epoch-2 after (odd orderkeys: + o_orderpriority); the reader must
    union-by-name, back-filling NULL for pre-evolution rows — the
    ingest reality of every long-lived 100-TB store. The engine writes
    both epochs (real files), reads each with its own schema, aligns,
    unions, and aggregates; the oracle derives the identical result from
    the base table (pre-evolution rows ⇒ NULL priority), so it needs no
    filesystem state."""
    import os
    import shutil

    import ray.data as rd

    root = f"/tmp/fcray_schemaevo_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_orderpriority"])
    orders.map_batches(
        lambda b: b.filter(
            pc.equal(pc.bit_wise_and(b["o_orderkey"], 1), 0)
        ).select(["o_orderkey", "o_totalprice"]),
        batch_format="pyarrow",
    ).write_parquet(f"{root}/epoch1")
    orders.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b["o_orderkey"], 1),
                                    1)),
        batch_format="pyarrow",
    ).write_parquet(f"{root}/epoch2")

    v1 = rd.read_parquet(f"{root}/epoch1").map_batches(
        lambda b: b.append_column(
            "o_orderpriority", pa.nulls(len(b), pa.string())),
        batch_format="pyarrow")
    v2 = rd.read_parquet(f"{root}/epoch2").map_batches(
        lambda b: b.select(["o_orderkey", "o_totalprice",
                            "o_orderpriority"]),
        batch_format="pyarrow")
    both = v1.union(v2).map_batches(
        lambda b: pa.table({
            "o_orderpriority_u": b["o_orderpriority"],
            "fp": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        }),
        batch_format="pyarrow")
    out = fast_groupby_agg(both, ["o_orderpriority_u"], {
        "n": (None, "count"), "tot_fp": ("fp", "sum"),
    }).materialize()
    shutil.rmtree(root, ignore_errors=True)
    return out


INCR_AGG_CUTOFF = "1999-01-01"


def q_incremental_agg(sf_dir):
    """Incremental aggregate maintenance (the streaming-warehouse
    pattern): a 'materialized' monthly-revenue base built from orders
    BEFORE the cutoff is updated with the late-arriving delta (orders at
    or after it) by MERGING partial sums — never recomputing the base.
    Because the partials are exact ×100 integers, merge == full
    recompute bit-for-bit, which is exactly what the oracle (a plain
    full-table aggregate) checks. The delta pass scans ONLY delta rows;
    the merge exchanges one row per (month, side)."""
    cutoff = np.datetime64(INCR_AGG_CUTOFF).astype(
        "datetime64[ns]").view("int64")

    def _part(lo: bool):
        def _f(b: pa.Table) -> pa.Table:
            d = _ts_ns(b["o_orderdate"])
            keep = d < cutoff if lo else d >= cutoff
            t = b.filter(pa.array(keep))
            return pa.table({
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "rev_fp": pa.array(_round_half_away(
                    t["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64), pa.int64()),
                "n": pa.array(np.ones(len(t), np.int64), pa.int64()),
            })
        return _f

    orders = T(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    base = fast_groupby_agg(
        orders.map_batches(_part(True), batch_format="pyarrow"),
        ["month"], {"rev_fp": ("rev_fp", "sum"), "n": ("n", "sum")})
    delta = fast_groupby_agg(
        orders.map_batches(_part(False), batch_format="pyarrow"),
        ["month"], {"rev_fp": ("rev_fp", "sum"), "n": ("n", "sum")})
    # merge = one more mergeable partial-agg over the two tiny sides
    return fast_groupby_agg(
        base.union(delta), ["month"],
        {"rev_fp": ("rev_fp", "sum"), "n": ("n", "sum")})


KCORE_K = 14
KCORE_MAX_SINGLE_EDGES = 20_000_000
KCORE_MAX_ROUNDS = 200


@ray.remote
def _kcore_task(k: int, *tables: pa.Table) -> pa.Table:
    """Single-task k-core peel over the collected normalized edge list
    (guard: KCORE_MAX_SINGLE_EDGES): repeatedly drop nodes with
    within-subgraph degree < k until fixpoint — O(rounds · |E|)
    vectorized bincounts."""
    live_t = live_arrow(tables)
    t = pa.concat_tables(live_t)
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    n = int(max(u.max(), v.max())) + 1 if len(u) else 0
    live = np.ones(len(u), bool)
    for _ in range(KCORE_MAX_ROUNDS):
        deg = (np.bincount(u[live], minlength=n)
               + np.bincount(v[live], minlength=n))
        bad = (deg > 0) & (deg < k)
        if not bad.any():
            break
        live &= ~(bad[u] | bad[v])
    deg = (np.bincount(u[live], minlength=n)
           + np.bincount(v[live], minlength=n))
    nodes = np.flatnonzero(deg >= k)
    return pa.table({
        "node": pa.array(nodes.astype(np.int64), pa.int64()),
        "core_deg": pa.array(deg[nodes].astype(np.int64), pa.int64()),
    })


def q_graph_kcore(sf_dir, k: int = KCORE_K,
                  max_single_edges: int = KCORE_MAX_SINGLE_EDGES):
    """K-core decomposition (k=14) of the derived order graph — the
    community/spam-filter graph primitive next to pagerank/BFS/
    triangles: iteratively peel nodes whose within-subgraph degree is
    below k until fixpoint. Dual tier: under the edge guard one task
    peels the collected edge list with vectorized bincounts; above it,
    each round is a degree partial-agg + two hash ``left_semi`` joins
    that keep only edges with BOTH endpoints live (exchange carries
    key-sized node sets, never raw degrees×rows). Both tiers are pinned
    identical by test. Asserted gates (rows-only — peeling is not
    SQL-expressible): every output node has within-core degree ≥ k, and
    one extra peel round removes nothing (fixpoint ⇒ maximality)."""
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

    edges = fast_groupby_agg(
        raw.map_batches(_norm, batch_format="pyarrow"),
        ["u", "v"], {"_n": (None, "count")},
    ).map_batches(lambda b: b.select(["u", "v"]),
                  batch_format="pyarrow").materialize()

    if edges.count() <= max_single_edges:
        out = rd.from_arrow_refs(
            [_kcore_task.remote(k, *edges.to_arrow_refs())]).materialize()
    else:
        out = _kcore_join_tier(edges, k)

    # in-query invariant gates: ≥k within-core degree always; the full
    # fixpoint re-check collects the edge table, so it only runs under
    # the same edge guard as the single-task tier (above it the join
    # tier's own termination condition — a round that removed nothing —
    # IS the fixpoint proof, no driver copy needed)
    df = out.to_pandas()
    assert (df["core_deg"] >= k).all() or df.empty, "sub-k node in core"
    if edges.count() <= max_single_edges:
        core = df["node"].to_numpy(np.int64)
        et = pa.concat_tables(
            [b for b in ray.get(edges.to_arrow_refs()) if b.num_rows])
        uu = et["u"].to_numpy(zero_copy_only=False)
        vv = et["v"].to_numpy(zero_copy_only=False)
        inc = np.isin(uu, core) & np.isin(vv, core)
        degc = np.bincount(uu[inc], minlength=n) + np.bincount(
            vv[inc], minlength=n)
        assert not ((degc > 0) & (degc < k)).any(), "not a fixpoint"
    return out


def _kcore_join_tier(edges, k: int, num_partitions: int = 8):
    """Distributed peel: per round, degree partial-agg over live edges →
    live node set (≥k) → two semi joins keep edges with both endpoints
    live. Terminates when the edge count stops shrinking."""
    import ray.data as rd

    live = edges.materialize()
    prev = live.count()
    for _ in range(KCORE_MAX_ROUNDS):
        both = live.map_batches(
            lambda b: pa.table({"node": pa.concat_arrays([
                b["u"].combine_chunks() if isinstance(b["u"],
                                                      pa.ChunkedArray)
                else b["u"],
                b["v"].combine_chunks() if isinstance(b["v"],
                                                      pa.ChunkedArray)
                else b["v"]])}),
            batch_format="pyarrow")
        deg = fast_groupby_agg(both, ["node"], {"deg": (None, "count")})
        keep = deg.map_batches(
            lambda b: b.filter(pc.greater_equal(b["deg"], k))
                       .select(["node"]),
            batch_format="pyarrow").materialize()
        live = live.join(keep, "left_semi", num_partitions=num_partitions,
                         on=("u",), right_on=("node",)) \
                   .join(keep, "left_semi", num_partitions=num_partitions,
                         on=("v",), right_on=("node",)).materialize()
        cur = live.count()
        if cur == prev:
            break
        prev = cur
    both = live.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays([
            b["u"].combine_chunks() if isinstance(b["u"], pa.ChunkedArray)
            else b["u"],
            b["v"].combine_chunks() if isinstance(b["v"], pa.ChunkedArray)
            else b["v"]])}),
        batch_format="pyarrow")
    return fast_groupby_agg(both, ["node"], {"core_deg": (None, "count")})


def q_time_to_convert(sf_dir):
    """Conversion latency: per user, milliseconds from their FIRST
    'view' to the first 'purchase' at-or-after it — the funnel-timing
    KPI. All-integer epoch-ms, so exact. Plan: grouped-min first-view
    (key-sized), hash join against map-side-filtered purchases, then
    min(p_ms − v_ms) per user — one exchange of purchase rows, one of
    user-level aggregates; no per-group Python anywhere."""
    ev = T(sf_dir, "events", ["user_id", "ts", "event_type"])

    def _typed(kind):
        def _f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b["event_type"], kind))
            return pa.table({
                "user_id": t["user_id"],
                "ms": pa.array(_ts_ns(t["ts"]) // 1_000_000, pa.int64()),
            })
        return _f

    fv = fast_groupby_agg(
        ev.map_batches(_typed("view"), batch_format="pyarrow"),
        ["user_id"], {"v_ms": ("ms", "min")},
    ).map_batches(lambda b: b.rename_columns(["uid_r", "v_ms"]),
                  batch_format="pyarrow")
    j = ev.map_batches(_typed("purchase"), batch_format="pyarrow").join(
        fv, "inner", num_partitions=JOIN_PARTS,
        on=("user_id",), right_on=("uid_r",))
    diffs = j.map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "d": pc.subtract(b["ms"], b["v_ms"]),
        }).filter(pc.greater_equal(
            pc.subtract(b["ms"], b["v_ms"]), 0)),
        batch_format="pyarrow")
    return fast_groupby_agg(diffs, ["user_id"], {"ttc_ms": ("d", "min")})


def q_first_touch_attribution(sf_dir):
    """First-touch attribution: every purchase credits the channel (the
    event_type of its user's FIRST event by (ts, event_id)); output
    purchases per channel. Plan: the mergeable grouped first/last
    aggregate (stages/fastagg.grouped_first_last — per-block partials,
    tree combine, no per-group Python) produces one (user, first
    channel) row, purchases pre-count map-side to one row per user, and
    the two key-sized aggregates hash-join before a tiny rollup."""
    from ..stages.fastagg import grouped_first_last

    ev = T(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    first = grouped_first_last(ev, ["user_id"], "event_type",
                               ["ts", "event_id"]).map_batches(
        lambda b: pa.table({
            "uid_r": b["user_id"],
            "channel": b["first_value"],
        }),
        batch_format="pyarrow")
    purchases = fast_groupby_agg(
        ev.map_batches(
            lambda b: pa.table({
                "user_id":
                    b.filter(pc.equal(b["event_type"], "purchase"))
                    ["user_id"],
            }),
            batch_format="pyarrow"),
        ["user_id"], {"n_purch": (None, "count")},
    )
    j = purchases.join(first, "inner", num_partitions=JOIN_PARTS,
                       on=("user_id",), right_on=("uid_r",))
    return fast_groupby_agg(j, ["channel"], {
        "n_purchases": ("n_purch", "sum"),
        "n_users": (None, "count"),
    })


def _rank_thresholds(vals: np.ndarray, cnts: np.ndarray,
                     qs=(0.25, 0.5, 0.75)) -> list[int]:
    """Quartile thresholds by the engine-wide rank rule (value at row
    ceil(q·n) of the sorted multiset) from a distinct-value CDF."""
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    return [int(vals[np.searchsorted(cum, max(1, math.ceil(q * n)))])
            for q in qs]


def q_rfm_segments(sf_dir):
    """RFM customer segmentation: recency (days since last order,
    quartile-bucketed), frequency (order count, quartile-bucketed),
    monetary (total cents, decimal-digit band) — counts per segment.
    Bucket rule: 1 + Σ[v > t_q] with t_q the rank-rule quartiles, so
    ties are deterministic and the oracle states the same arithmetic.
    Scale plan: one per-customer partial-agg groupby; the quartiles come
    from SMALL-DOMAIN distinct-value CDFs (days, order counts — bounded
    domains, not customer-sized); the monetary band is a pure function
    (digit count) needing no quantile at all."""
    orders = T(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "day": pa.array(_ts_ns(b["o_orderdate"])
                            // 86_400_000_000_000, pa.int64()),
            "cents": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    per_cust = fast_groupby_agg(
        orders.map_batches(_fp, batch_format="pyarrow"),
        ["o_custkey"], {
            "last_day": ("day", "max"),
            "f": (None, "count"),
            "m_cents": ("cents", "sum"),
        }).materialize()
    ref_day = int(fast_groupby_agg(
        per_cust.map_batches(
            lambda b: pa.table({"k": pa.array([0] * len(b), pa.int64()),
                                "d": b["last_day"]}),
            batch_format="pyarrow"),
        ["k"], {"mx": ("d", "max")}).to_pandas()["mx"].iloc[0])

    rec = per_cust.map_batches(
        lambda b: pa.table({
            "r": pc.subtract(np.int64(ref_day), b["last_day"]),
            "f": b["f"],
        }),
        batch_format="pyarrow").materialize()
    r_hist = fast_groupby_agg(rec, ["r"], {"c": (None, "count")}
                              ).to_pandas()
    f_hist = fast_groupby_agg(rec, ["f"], {"c": (None, "count")}
                              ).to_pandas()
    r_t = _rank_thresholds(r_hist["r"].to_numpy(np.int64),
                           r_hist["c"].to_numpy(np.int64))
    f_t = _rank_thresholds(f_hist["f"].to_numpy(np.int64),
                           f_hist["c"].to_numpy(np.int64))
    tref = ray.put((ref_day, r_t, f_t))

    class _Seg:
        def __init__(self):
            self.ref_day, self.r_t, self.f_t = ray.get(tref)

        def __call__(self, b: pa.Table) -> pa.Table:
            r = self.ref_day - b["last_day"].to_numpy(zero_copy_only=False)
            f = b["f"].to_numpy(zero_copy_only=False)
            m = b["m_cents"].to_numpy(zero_copy_only=False)
            rb = 1 + sum((r > t).astype(np.int64) for t in self.r_t)
            fb = 1 + sum((f > t).astype(np.int64) for t in self.f_t)
            mb = np.char.str_len(m.astype("U"))  # decimal digit count
            return pa.table({
                "r_bucket": pa.array(rb, pa.int64()),
                "f_bucket": pa.array(fb, pa.int64()),
                "m_band": pa.array(mb.astype(np.int64), pa.int64()),
            })

    seg = per_cust.map_batches(_Seg, batch_format="pyarrow",
                               concurrency=(1, 4))
    return fast_groupby_agg(seg, ["r_bucket", "f_bucket", "m_band"],
                            {"n_custs": (None, "count")})


def q_returned_revenue_topk(sf_dir, k: int = 20):
    """TPC-H Q10 shape: the top-k customers by revenue lost to returned
    line items (l_returnflag = 'R'), with nation name. Plan: lineitem is
    filtered + ×100-quantized + pre-aggregated to (orderkey, cents)
    MAP-SIDE, hash-joined to orders (→ custkey), re-aggregated per
    customer, top-k via the mergeable grouped top-1-style partial sort
    (distributed sort + limit on the tiny aggregate), and the 25-row
    nation dimension broadcast for the name."""
    li = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_orderkey", "l_returnflag", "l_extendedprice"]).map_batches(
            lambda b: (lambda t: pa.table({
                "l_orderkey": t["l_orderkey"],
                "cents": pa.array(_round_half_away(
                    t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64), pa.int64()),
            }))(b.filter(pc.equal(b["l_returnflag"], "R"))),
            batch_format="pyarrow"),
        ["l_orderkey"], {"cents": ("cents", "sum")},
    )
    j = li.join(
        T(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        "inner", num_partitions=JOIN_PARTS,
        on=("l_orderkey",), right_on=("o_orderkey",))
    per_cust = fast_groupby_agg(j, ["o_custkey"],
                                {"lost_fp": ("cents", "sum")})
    cust = per_cust.join(
        T(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))
    names = dict(zip(
        *(T(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
          [c].tolist() for c in ("n_nationkey", "n_name"))))
    top = cust.sort(["lost_fp", "o_custkey"],
                    descending=[True, False]).limit(k).to_pandas()
    top["n_name"] = top["c_nationkey"].map(names)
    return top[["o_custkey", "n_name", "lost_fp"]].reset_index(drop=True)


SUPPLIER_MAX_BROADCAST = 2_000_000


def q_supplier_nation_profit(sf_dir,
                             max_broadcast: int = SUPPLIER_MAX_BROADCAST):
    """TPC-H Q9 shape: profit per supplier nation per order year, with
    profit = Σ(extendedprice·(1−discount)) over line items, ×100 fixed
    point quantized per row (one mirrored float expression) before the
    integer sums. Plan: suppkey→nation broadcasts below
    SUPPLIER_MAX_BROADCAST (supplier GROWS with the dataset, unlike
    nation — same guard class as region_revenue); above it the supplier
    keys hash-join instead. The year comes from a hash join against
    orders pre-projected to (orderkey, year) — the only unavoidable
    fact-sized exchange."""
    nat = dict(zip(
        *(T(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
          [c].tolist() for c in ("n_nationkey", "n_name"))))
    sup_ds = T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    if sup_ds.count() > max_broadcast:
        # supplier grows with the dataset (unlike nation): above the
        # guard ship only the 25-row nation map and hash-join the
        # supplier keys instead of broadcasting them
        named = sup_ds.map_batches(
            lambda b: pa.table({
                "sk_r": b["s_suppkey"],
                "n_name": pa.array(
                    pd.Series(b["s_nationkey"].to_numpy(
                        zero_copy_only=False)).map(nat).tolist(),
                    pa.string()),
            }),
            batch_format="pyarrow")
        li = T(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"]).map_batches(
            lambda b: pa.table({
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "profit_fp": pa.array(_round_half_away(
                    b["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * (1.0 - b["l_discount"].to_numpy(
                        zero_copy_only=False)) * 100.0
                ).astype(np.int64), pa.int64()),
            }),
            batch_format="pyarrow",
        ).join(named, "inner", num_partitions=JOIN_PARTS,
               on=("l_suppkey",), right_on=("sk_r",))
        years = T(sf_dir, "orders",
                  ["o_orderkey", "o_orderdate"]).map_batches(
            lambda b: pa.table({
                "o_orderkey": b["o_orderkey"],
                "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
            }),
            batch_format="pyarrow")
        j = li.join(years, "inner", num_partitions=JOIN_PARTS,
                    on=("l_orderkey",), right_on=("o_orderkey",))
        return fast_groupby_agg(j, ["n_name", "o_year"], {
            "profit_fp": ("profit_fp", "sum"),
            "n_items": (None, "count"),
        })
    sup = sup_ds.to_pandas()
    s2n = ray.put({int(r["s_suppkey"]): nat[int(r["s_nationkey"])]
                   for _, r in sup.iterrows()})

    class _Profit:
        def __init__(self):
            self.s2n = ray.get(s2n)

        def __call__(self, b: pa.Table) -> pa.Table:
            price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = b["l_discount"].to_numpy(zero_copy_only=False)
            fp = _round_half_away(
                price * (1.0 - disc) * 100.0).astype(np.int64)
            names = pd.Series(
                b["l_suppkey"].to_numpy(zero_copy_only=False)
            ).map(self.s2n)
            return pa.table({
                "l_orderkey": b["l_orderkey"],
                "n_name": pa.array(names.tolist(), pa.string()),
                "profit_fp": pa.array(fp, pa.int64()),
            })

    li = T(sf_dir, "lineitem",
           ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
           ).map_batches(_Profit, batch_format="pyarrow",
                         concurrency=(1, 4))
    years = T(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
        }),
        batch_format="pyarrow")
    j = li.join(years, "inner", num_partitions=JOIN_PARTS,
                on=("l_orderkey",), right_on=("o_orderkey",))
    return fast_groupby_agg(j, ["n_name", "o_year"], {
        "profit_fp": ("profit_fp", "sum"), "n_items": (None, "count"),
    })


def q_disjunctive_band_revenue(sf_dir):
    """TPC-H Q19 shape: revenue from line items matching ANY of three
    (part-attribute band × quantity band) disjuncts — the
    multi-predicate pushdown pattern where the dimension attributes
    must reach the fact scan BEFORE filtering. Plan: part is a true
    dimension → broadcast (type, size) per partkey; one map pass
    evaluates the OR of the three bands vectorized and quantizes
    ×100 before the integer partial sums."""
    pref = ray.put(
        T(sf_dir, "part", ["p_partkey", "p_type", "p_size"]
          ).to_arrow_refs())

    class _Bands:
        def __init__(self):
            t = pa.concat_tables(ray.get(ray.get(pref)))
            self.keys = t["p_partkey"].combine_chunks()
            self.types = t["p_type"].combine_chunks()
            self.sizes = t["p_size"].combine_chunks()

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b["l_partkey"], value_set=self.keys)
            ptype = np.asarray(self.types.take(idx))
            psize = self.sizes.take(idx).to_numpy(zero_copy_only=False)
            qty = b["l_quantity"].to_numpy(zero_copy_only=False)
            keep = (
                ((ptype == "PROMO") & (qty >= 1.0) & (qty <= 11.0))
                | ((ptype == "SMALL") & (psize >= 1) & (psize <= 25)
                   & (qty >= 10.0) & (qty <= 20.0))
                | ((ptype == "LARGE") & (psize >= 10)
                   & (qty >= 20.0) & (qty <= 30.0))
            )
            price = b["l_extendedprice"].to_numpy(
                zero_copy_only=False)[keep]
            disc = b["l_discount"].to_numpy(zero_copy_only=False)[keep]
            fp = _round_half_away(
                price * (1.0 - disc) * 100.0).astype(np.int64)
            return pa.table({
                "revenue_fp": pa.array([int(fp.sum())], pa.int64()),
                "n_rows": pa.array([int(keep.sum())], pa.int64()),
            })

    parts = T(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice",
               "l_discount"]).map_batches(
        _Bands, batch_format="pyarrow", concurrency=(1, 4)).to_pandas()
    return pd.DataFrame([{
        "revenue_fp": int(parts["revenue_fp"].sum()),
        "n_rows": int(parts["n_rows"].sum()),
    }])


ZORDER_BITS = 20
ZORDER_BLOCK_SHIFT = 28
# the audited 2-D range predicate: custkey band × order-day band
ZORDER_RANGE = (2_000, 4_000, 9_500, 10_500)


def q_zorder_layout(sf_dir):
    """Z-order (Morton) layout audit — the data-layout half of the
    100-TB story: interleave the bits of (custkey, order-day) into a
    space-filling key, bucket rows into coarse z-blocks, and emit each
    block's zone map (min/max of BOTH dimensions) plus whether a fixed
    2-D range predicate can PRUNE it (zone map disjoint from the
    range). Under a z-sorted layout both dimensions cluster, so a 2-D
    range touches O(√blocks) instead of all of them — the measurable
    claim this operator audits. All-integer (bit ops only), so the
    oracle (unrolled bit-interleave in SQL) matches exactly."""
    x_lo, x_hi, y_lo, y_hi = ZORDER_RANGE

    def _z(b: pa.Table) -> pa.Table:
        x = (b["o_custkey"].to_numpy(zero_copy_only=False)
             % (1 << ZORDER_BITS)).astype(np.int64)
        y = ((_ts_ns(b["o_orderdate"]) // 86_400_000_000_000)
             % (1 << ZORDER_BITS)).astype(np.int64)
        z = np.zeros(len(x), np.int64)
        for i in range(ZORDER_BITS):
            z |= (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1)
                                                << (2 * i + 1))
        return pa.table({
            "zblock": pa.array(z >> ZORDER_BLOCK_SHIFT, pa.int64()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        })

    blocks = fast_groupby_agg(
        T(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            _z, batch_format="pyarrow"),
        ["zblock"], {
            "n_rows": (None, "count"),
            "min_x": ("x", "min"), "max_x": ("x", "max"),
            "min_y": ("y", "min"), "max_y": ("y", "max"),
        })

    def _touch(b: pa.Table) -> pa.Table:
        touched = pc.and_(
            pc.and_(pc.less_equal(b["min_x"], x_hi),
                    pc.greater_equal(b["max_x"], x_lo)),
            pc.and_(pc.less_equal(b["min_y"], y_hi),
                    pc.greater_equal(b["max_y"], y_lo)))
        return b.append_column("touched", touched)

    return blocks.map_batches(_touch, batch_format="pyarrow")


def q_q3_shipping_priority(sf_dir, k: int = 10):
    """TPC-H Q3 shape: top unshipped-revenue orders for one market
    segment — customers in BUILDING, orders placed before the cutoff,
    revenue restricted to line items shipped after it. Plan: lineitem
    quantizes price·(1−disc) ×100 per row and pre-aggregates to one
    (orderkey, revenue) row MAP-SIDE before any exchange; orders is
    semi-filtered against the BUILDING customers by hash join (customer
    grows with the dataset — never broadcast); the final top-k sorts the
    per-order aggregate (≤ |orders| rows), never raw lineitem."""
    cutoff = np.datetime64("1998-07-01").astype(
        "datetime64[ns]").view("int64")

    def _rev(b: pa.Table) -> pa.Table:
        t = b.filter(pa.array(_ts_ns(b["l_shipdate"]) > cutoff))
        fp = _round_half_away(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "revenue_fp": pa.array(fp, pa.int64())})

    li = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
          ).map_batches(_rev, batch_format="pyarrow"),
        ["l_orderkey"], {"revenue_fp": ("revenue_fp", "sum")})
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate",
                "o_orderpriority"]).map_batches(
        lambda b: b.filter(pa.array(_ts_ns(b["o_orderdate"]) < cutoff)),
        batch_format="pyarrow")
    bld = T(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], "BUILDING"))
                   .select(["c_custkey"]),
        batch_format="pyarrow")
    orders = orders.join(bld, "inner", num_partitions=JOIN_PARTS,
                         on=("o_custkey",), right_on=("c_custkey",))
    j = li.join(orders, "inner", num_partitions=JOIN_PARTS,
                on=("l_orderkey",), right_on=("o_orderkey",))
    top = j.sort(["revenue_fp", "l_orderkey"],
                 descending=[True, False]).limit(k).to_pandas()
    return top[["l_orderkey", "o_orderdate", "o_orderpriority",
                "revenue_fp"]].reset_index(drop=True)


def q_q7_nation_trade_volume(sf_dir):
    """TPC-H Q7 shape: shipping volume between every (supplier nation,
    customer nation) pair per ship year, cross-nation pairs only. Plan:
    the 25-row nation name map rides inside each projection closure (a
    true fixed-size dimension); supplier and customer both GROW with
    the dataset, so each attaches its nation via hash join — never a
    broadcast; lineitem folds price·(1−disc) ×100 per row before the
    join chain lineitem⋈supplier⋈orders⋈customer. The final groupby is
    over ≤ 25·25·|years| keys."""
    nat = dict(zip(
        *(T(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
          [c].tolist() for c in ("n_nationkey", "n_name"))))

    def _name_col(col, b):
        return pa.array(pd.Series(
            b[col].to_numpy(zero_copy_only=False)).map(nat).tolist(),
            pa.string())

    sup = T(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: pa.table({"s_suppkey": b["s_suppkey"],
                            "supp_nation": _name_col("s_nationkey", b)}),
        batch_format="pyarrow")
    cust = T(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"],
                            "cust_nation": _name_col("c_nationkey", b)}),
        batch_format="pyarrow")
    oc = T(sf_dir, "orders", ["o_orderkey", "o_custkey"]).join(
        cust, "inner", num_partitions=JOIN_PARTS,
        on=("o_custkey",), right_on=("c_custkey",))

    def _fold(b: pa.Table) -> pa.Table:
        fp = _round_half_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0).astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "l_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
            "volume_fp": pa.array(fp, pa.int64()),
        })

    li = T(sf_dir, "lineitem",
           ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
            "l_discount"]).map_batches(_fold, batch_format="pyarrow")
    j = li.join(sup, "inner", num_partitions=JOIN_PARTS, on=("l_suppkey",),
                right_on=("s_suppkey",))
    j = j.join(oc, "inner", num_partitions=JOIN_PARTS, on=("l_orderkey",),
               right_on=("o_orderkey",))
    j = j.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["supp_nation"],
                                              b["cust_nation"]))),
        batch_format="pyarrow")
    return fast_groupby_agg(j, ["supp_nation", "cust_nation", "l_year"], {
        "volume_fp": ("volume_fp", "sum"), "n_items": (None, "count"),
    })


def q_q15_top_supplier(sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    quarter (ties all returned, like the reference query's view+max).
    Plan: lineitem folds to (suppkey, cents) map-side; the per-supplier
    aggregate STAYS a Dataset (supplier grows with data); only the
    scalar max crosses to the driver, and the winner filter re-streams
    the aggregate against that scalar."""
    q_lo = np.datetime64("1997-01-01").astype("datetime64[ns]").view("int64")
    q_hi = np.datetime64("1997-04-01").astype("datetime64[ns]").view("int64")

    def _fold(b: pa.Table) -> pa.Table:
        ship = _ts_ns(b["l_shipdate"])
        t = b.filter(pa.array((ship >= q_lo) & (ship < q_hi)))
        fp = _round_half_away(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0).astype(np.int64)
        return pa.table({"l_suppkey": t["l_suppkey"],
                         "total_fp": pa.array(fp, pa.int64())})

    per_sup = fast_groupby_agg(
        T(sf_dir, "lineitem",
          ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
          ).map_batches(_fold, batch_format="pyarrow"),
        ["l_suppkey"], {"total_fp": ("total_fp", "sum")})
    best = per_sup.max("total_fp")
    out = per_sup.map_batches(
        lambda b: b.filter(pc.equal(b["total_fp"], best)),
        batch_format="pyarrow")
    return out.sort("l_suppkey").to_pandas()


def q_q17_small_qty_revenue(sf_dir):
    """TPC-H Q17 shape: revenue locked in small-quantity line items —
    rows whose quantity is below 20% of their part's average quantity.
    The correlated per-part average becomes a fact⋈fact-aggregate hash
    self-join on partkey (the aggregate side is one row per part and
    STAYS a Dataset); the comparison cross-multiplies to all-integer
    form (5·qty_fp·n < Σqty_fp) so no division ever happens, and the
    output is one global (revenue_fp, n_rows) pair from partial sums."""
    proj = T(sf_dir, "lineitem",
             ["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
        lambda b: pa.table({
            "l_partkey": b["l_partkey"],
            "qty_fp": pa.array(_round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
            "cents": pa.array(_round_half_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        }),
        batch_format="pyarrow")
    agg = fast_groupby_agg(proj, ["l_partkey"], {
        "sum_qty_fp": ("qty_fp", "sum"), "n_li": (None, "count"),
    }).map_batches(
        lambda b: b.rename_columns(["pk_r", "sum_qty_fp", "n_li"]),
        batch_format="pyarrow")
    j = proj.join(agg, "inner", num_partitions=JOIN_PARTS,
                  on=("l_partkey",), right_on=("pk_r",))

    def _small(b: pa.Table) -> pa.Table:
        qty = b["qty_fp"].to_numpy(zero_copy_only=False)
        n = b["n_li"].to_numpy(zero_copy_only=False)
        s = b["sum_qty_fp"].to_numpy(zero_copy_only=False)
        keep = 5 * qty * n < s
        cents = b["cents"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "revenue_fp": pa.array([int(cents.sum())], pa.int64()),
            "n_rows": pa.array([int(keep.sum())], pa.int64()),
        })

    parts = j.map_batches(_small, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([{
        "revenue_fp": int(parts["revenue_fp"].sum()),
        "n_rows": int(parts["n_rows"].sum()),
    }])
