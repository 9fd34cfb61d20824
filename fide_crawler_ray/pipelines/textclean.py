"""Corpus-hygiene operators — the third tier of the engine's query layer:
PII scrubbing, Gopher-style quality gates, repetition statistics,
weighted source mixing, and document-frequency-band vocabulary pruning.

These are the text-cleaning stages a large-scale training-data pipeline
runs between crawl and tokenization (the reference stops at parse +
dedup; SURVEY §2 marks these as the engine's LLM-data extensions, like
pipelines/dedup_text.py and functions/textstats.py).

Scale notes (100 TB):
- Every kernel here is a single `map_batches` pass — no shuffle at all —
  except vocab pruning, whose only exchange is vocabulary-sized (Heaps'
  law: ~10^6 terms for 10^12 tokens), never corpus-sized.
- PII / quality / repetition are pandas-vectorized string kernels
  (str.count / str.replace / explode+groupby); no per-row Python in the
  regex paths.
- Source mixing is stateless deterministic hash sampling — identical
  output at any cluster size, any block layout, any retry (the property
  that makes a 100-TB mix reproducible).
- Vocabulary pruning broadcasts the kept-word set once (`ray.put`, read
  per actor in `__init__`); past ``max_broadcast_vocab`` distinct terms
  it reroutes to a hash-join plan whose exchange moves (doc_id, pos,
  word) token rows — unbounded, but only chosen when the vocabulary
  itself is object-store-sized.

Float policy: same fixed-point canonicalization as queries.py. All keep
flags compare INTEGER cross-products (``c*100 >= 10*n``) rather than
float thresholds, so the boolean can never straddle a rounding edge
between the engine and the oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..stages.fastagg import fast_groupby_agg
from .queries import JOIN_PARTS, T, _canon_stage

# ============================================================ PII scrub

# ASCII-only patterns, identical semantics under Python re and DuckDB's
# RE2 (verified: \b, {2,} and char classes agree; no \w/\s shorthand).
_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_PHONE = r"\b555-[0-9]{4}\b"


def _augment_pii(df: pd.DataFrame) -> pd.Series:
    """Deterministic PII-bearing suffix derived from doc_id — the
    synthetic corpus contains no PII, so both the engine and the oracle
    append the same synthetic contact block before scrubbing (the oracle
    builds the identical string in SQL)."""
    did = df["doc_id"].astype("int64")
    return (
        df["text"]
        + " contact user" + did.astype(str)
        + "@mail.example.com call 555-"
        + (did % 10000).astype(str).str.zfill(4)
        + " from 10." + (did % 200).astype(str)
        + "." + (did % 250).astype(str)
        + "." + (did % 9).astype(str)
    )


def q_pii_scrub(sf_dir):
    """PII redaction: emails, IPv4 addresses, phone-like numbers →
    typed placeholder tokens, with per-doc redaction counts. One
    vectorized map pass (pandas str kernels compile each regex once per
    batch under the hood); no shuffle, no state."""

    def _scrub(df: pd.DataFrame) -> pd.DataFrame:
        s = _augment_pii(df)
        n_em = s.str.count(_EMAIL)
        n_ip = s.str.count(_IP)
        n_ph = s.str.count(_PHONE)
        clean = (
            s.str.replace(_EMAIL, "<EMAIL>", regex=True)
            .str.replace(_IP, "<IP>", regex=True)
            .str.replace(_PHONE, "<PHONE>", regex=True)
        )
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "clean_text": clean,
            "n_emails": n_em.astype("int64"),
            "n_ips": n_ip.astype("int64"),
            "n_phones": n_ph.astype("int64"),
        })

    return T(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _scrub, batch_format="pandas")


# ===================================================== quality gates

def q_quality_gopher(sf_dir):
    """Gopher-style per-document quality gates: word count band, mean
    word length band, word-repetition ratio cap. Emits the metrics plus
    the composite keep flag (so downstream can either filter or audit
    the rejection reasons). Pure map pass, vectorized (explode + grouped
    nunique for the distinct-word count). The kernel is module-level
    (gopher_flags) so the curation composite reuses it verbatim."""
    return T(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        gopher_flags, batch_format="pandas")


def gopher_flags(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reset_index(drop=True)
    t = df["text"]
    n_words = (t.str.count(" ") + 1).astype("int64")
    n_nosp = (t.str.len() - (n_words - 1)).astype("int64")
    mwl = n_nosp / n_words
    distinct = (t.str.split(" ").explode().groupby(level=0).nunique()
                .reindex(df.index).astype("int64"))
    rep = 1.0 - distinct / n_words
    # integer cross-products: mwl>=4 ⇔ n_nosp >= 4*n_words, etc.;
    # rep<=0.6 ⇔ (n_words-distinct)*10 <= 6*n_words
    keep = (
        n_words.between(20, 90)
        & (n_nosp >= 4 * n_words) & (n_nosp <= 5 * n_words)
        & ((n_words - distinct) * 10 <= 6 * n_words)
    )
    out = pa.Table.from_pandas(pd.DataFrame({
        "doc_id": df["doc_id"],
        "n_words": n_words,
        "mean_word_len": mwl,
        "rep_ratio": rep,
        "keep": keep,
    }), preserve_index=False)
    return _canon_stage({"mean_word_len": 6, "rep_ratio": 6})(out)


def q_repetition_topgram(sf_dir):
    """Per-document top-bigram fraction (Gopher repetition signal: the
    most frequent 2-gram's share of all 2-grams) + keep flag. Vectorized
    via explode + within-doc shift — no per-row Python loop over words."""

    def _r(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        words = df["text"].str.split(" ")
        ex = words.explode().rename("w").reset_index()
        ex["w2"] = ex.groupby("index")["w"].shift(-1)
        bg = ex.dropna(subset=["w2"])
        top = (bg.groupby(["index", bg["w"] + " " + bg["w2"]]).size()
               .groupby(level=0).max())
        n_words = words.str.len().astype("int64")
        n_bigrams = (n_words - 1).clip(lower=0)
        mc = top.reindex(df.index, fill_value=0).astype("int64")
        frac = np.where(n_bigrams > 0, mc / n_bigrams.replace(0, 1), 0.0)
        keep = mc * 100 <= 5 * n_bigrams  # frac <= 0.05, integer form
        out = pa.Table.from_pandas(pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_bigrams": n_bigrams,
            "top_bigram_frac": frac,
            "keep": keep,
        }), preserve_index=False)
        return _canon_stage({"top_bigram_frac": 6})(out)

    return T(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _r, batch_format="pandas")


# ===================================================== source mixing

# per-source sampling weight, derived from the source index (idx mod 4):
# full / 0.75 / 0.5 / 0.25. Thresholds are 2-hex-char string bounds on
# md5(doc_id) — lexicographic compare of fixed-width lowercase hex IS
# the numeric compare, and 'zz' sorts above every hex digit (weight 1.0).
_MIX_THRESHOLDS = {0: "zz", 1: "c0", 2: "80", 3: "40"}


def q_mix_sources(sf_dir):
    """Weighted deterministic corpus mixing: each source keeps a fixed
    fraction of its documents (1.0 / 0.75 / 0.5 / 0.25 by source-index
    mod 4), selected by md5(doc_id) threshold — the multi-source
    training-mix primitive. Reproducible at any cluster size / block
    layout / retry, unlike rng-based sampling; no shuffle, no state."""

    def _mix(b: pa.Table) -> pa.Table:
        srcs = b["source"].to_pylist()
        dids = b["doc_id"].to_pylist()
        mask = [
            hashlib.md5(str(d).encode()).hexdigest()[:2]
            < _MIX_THRESHOLDS[int(s[3:]) % 4]
            for d, s in zip(dids, srcs)
        ]
        return b.filter(pa.array(mask, pa.bool_()))

    return T(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        _mix, batch_format="pyarrow")


# ================================================== vocabulary pruning

VOCAB_MAX_BROADCAST = 2_000_000


def q_vocab_prune(sf_dir, max_broadcast_vocab: int = VOCAB_MAX_BROADCAST):
    """Document-frequency-band vocabulary pruning: drop words appearing
    in <10% of documents (noise/rare) or >78% (corpus stopwords), then
    rebuild each document from its kept words in original order.

    Plan: per-doc DISTINCT words flat-map → map-side-combined df counts
    (vocabulary-sized, the only exchange) → kept-word set broadcast once
    by ref into an actor pool → vectorized explode/isin/reassemble per
    batch. Past ``max_broadcast_vocab`` distinct terms the kept set no
    longer broadcasts and the plan reroutes to a token-level hash join
    (`_vocab_prune_join`), identical output (pinned by
    tests/test_textclean.py)."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def _distinct(b: pa.Table) -> pa.Table:
        words: list[str] = []
        for txt in b["text"].to_pylist():
            words.extend(set(txt.split(" ")))
        return pa.table({"word": pa.array(words, pa.string())})

    df = fast_groupby_agg(
        docs.map_batches(_distinct, batch_format="pyarrow"),
        ["word"], {"c": (None, "count")},
    ).materialize()
    if df.count() > max_broadcast_vocab:
        return _vocab_prune_join(docs, df, n_docs)

    vocab = pa.concat_tables(ray.get(df.to_arrow_refs()))
    c = vocab["c"].to_numpy(zero_copy_only=False)
    band = (c * 100 >= 10 * n_docs) & (c * 100 <= 78 * n_docs)
    keep_ref = ray.put(frozenset(
        np.asarray(vocab["word"].to_pylist(), dtype=object)[band]))

    class _Prune:
        def __init__(self):
            self.keep = ray.get(keep_ref)  # once per actor

        def __call__(self, df_: pd.DataFrame) -> pd.DataFrame:
            df_ = df_.reset_index(drop=True)
            words = df_["text"].str.split(" ")
            ex = words.explode()
            m = ex.isin(self.keep)
            kept = ex[m].groupby(level=0).agg(" ".join)
            n_kept = m.groupby(level=0).sum()
            return pd.DataFrame({
                "doc_id": df_["doc_id"],
                "clean_text": kept.reindex(df_.index, fill_value=""),
                "n_dropped": (words.str.len() - n_kept).astype("int64"),
            })

    return docs.map_batches(_Prune, batch_format="pandas",
                            concurrency=(1, 2))


def _vocab_prune_join(docs, df, n_docs: int):
    """Join fallback for object-store-sized vocabularies: explode
    (doc_id, pos, word) token rows, hash-join against the banded kept
    words, reassemble per doc. The exchange is token-count-sized — the
    unbounded (but fully distributed) side of the cardinality guard.
    Because this IS the tier that runs at 100 TB, both ends are
    vectorized: the explode is Arrow split_pattern + list-flatten (no
    per-token Python), and reassembly is one splitmix64(doc_id) % P
    shuffle + a per-partition pandas groupby-agg (P udf calls, not one
    per document)."""
    from ..functions.sketches import _splitmix64

    P = 64

    def _band(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((c * 100 >= 10 * n_docs)
                                 & (c * 100 <= 78 * n_docs))).select(["word"])

    keepw = df.map_batches(_band, batch_format="pyarrow")

    def _explode(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(len(did)), lens)
        # position within doc: global arange minus each doc's start
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(int(lens.sum()), dtype=np.int64) - starts[rep]
        flat = pc.list_flatten(words)
        return pa.table({
            "doc_id": pa.array(did[rep], pa.int64()),
            "part": pa.array(
                (_splitmix64(did[rep]) % np.uint64(P)).astype(np.int64)),
            "pos": pa.array(pos, pa.int64()),
            "word": flat,
            "n_words": pa.array(lens[rep], pa.int64()),
        })

    toks = docs.map_batches(_explode, batch_format="pyarrow")
    kept = toks.join(keepw, "left_semi", num_partitions=JOIN_PARTS, on=("word",))

    def _reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "pos"], kind="mergesort")
        agg = g.groupby("doc_id", sort=False).agg(
            clean_text=("word", " ".join),
            n_words=("n_words", "first"),
            n_kept=("word", "size"))
        return pd.DataFrame({
            "doc_id": agg.index.to_numpy(np.int64),
            "clean_text": agg["clean_text"].to_numpy(),
            "n_dropped": (agg["n_words"] - agg["n_kept"])
            .to_numpy(np.int64),
        })

    out = kept.groupby("part").map_groups(_reassemble, batch_format="pandas")

    # docs whose words were ALL pruned vanish from the join — re-emit
    # them with empty text via an anti-join on the surviving doc ids.
    kept_ids = out.select_columns(["doc_id"])
    empty = docs.join(kept_ids, "left_anti", num_partitions=JOIN_PARTS,
                      on=("doc_id",)).map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"],
            "clean_text": pa.array([""] * b.num_rows, pa.string()),
            "n_dropped": pa.array(
                [t.count(" ") + 1 for t in b["text"].to_pylist()],
                pa.int64()),
        }), batch_format="pyarrow")
    return out.union(empty)


# ===================================================== span-level dedup

SPAN_W = 8  # tokens per window (Lee et al. use 50 BPE tokens; scaled to
#             the synthetic corpus' short docs so cross-doc dups exist)
SPAN_MAX_BROADCAST_DUPS = 2_000_000


def q_span_dedup(sf_dir, w: int = SPAN_W,
                 max_broadcast_dups: int = SPAN_MAX_BROADCAST_DUPS):
    """Exact duplicated-SPAN statistics — the substring-level exact
    dedup of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (arXiv:2107.06499), at window granularity: every
    ``w``-token sliding window is hashed, windows whose hash repeats
    anywhere in the corpus (``n_dup_windows``) or in a *different*
    document (``n_crossdoc_windows``) are counted per document, and a
    document is kept only while cross-document duplicated spans cover
    under half of its windows. Whole-doc dedup (dedup_exact_text /
    minhash) misses partially-copied text; this operator is the exact
    detector for it.

    Scale plan (100 TB): the window pass is one ``map_batches`` (tokens
    exploded with numpy, the w-gram join vectorized via shifted
    ``str.cat``, md5 per *window* — linear hashing work, the same cost
    class as exact text dedup); the exchange moves distinct
    ``(hash, doc)`` pairs pre-counted map-side, never raw windows; the
    duplicated-hash side (hashes with global count ≥ 2 — a tiny
    fraction of all hashes in a healthy corpus) is cardinality-guarded:
    broadcast + ``pc.index_in`` probe below ``max_broadcast_dups``,
    hash-partitioned left-outer ``Dataset.join`` above it. Both paths
    produce identical rows (pinned by test)."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _wins(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "h": pd.Series([], dtype="object"),
            "m": pd.Series([], dtype="int64"),
        })
        if len(df) == 0:
            return empty
        toks = df["text"].str.split(" ")
        lens = toks.map(len).to_numpy(dtype=np.int64)
        doc = np.repeat(df["doc_id"].to_numpy(), lens)
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks]
        ) if lens.sum() else np.empty(0, dtype=object)
        n = flat.shape[0]
        ok = np.zeros(n, dtype=bool)
        if n >= w:
            # a window starting at i is valid iff token i+w-1 is still
            # in the same document (each doc's tokens are contiguous)
            ok[: n - w + 1] = doc[: n - w + 1] == doc[w - 1:]
        idx = np.nonzero(ok)[0]
        if idx.size == 0:
            return empty
        joined = pd.Series(flat[idx], dtype=object).str.cat(
            [pd.Series(flat[idx + k], dtype=object) for k in range(1, w)],
            sep=" ",
        )
        hs = [hashlib.md5(s.encode()).hexdigest() for s in joined]
        # map-side combine: one (doc, hash) row with multiplicity m
        g = (pd.DataFrame({"doc_id": doc[idx], "h": hs})
             .groupby(["doc_id", "h"], sort=False).size()
             .reset_index(name="m"))
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "h": g["h"],
            "m": g["m"].astype("int64"),
        })

    pairs = fast_groupby_agg(
        docs.map_batches(_wins, batch_format="pandas"),
        ["h", "doc_id"], {"m": ("m", "sum")},
    ).materialize()
    hstats = fast_groupby_agg(pairs, ["h"], {
        "c": ("m", "sum"), "nd": (None, "count"),
    })
    dup = hstats.map_batches(
        lambda b: b.filter(pc.greater_equal(b["c"], 2)),
        batch_format="pyarrow",
    ).materialize()

    if dup.count() <= max_broadcast_dups:
        live = [t for t in ray.get(dup.to_arrow_refs()) if t.num_rows > 0]
        dt = (pa.concat_tables(live) if live
              else pa.table({"h": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "nd": pa.array([], pa.int64())}))
        dref = ray.put(dt)

        class _Flag:
            def __init__(self):
                d = ray.get(dref)
                self.hs = d["h"].combine_chunks()
                self.nd = d["nd"].to_numpy(zero_copy_only=False)

            def __call__(self, b: pa.Table) -> pa.Table:
                ix = pc.index_in(b["h"], value_set=self.hs)
                hit = pc.is_valid(ix).to_numpy(zero_copy_only=False)
                m = b["m"].to_numpy(zero_copy_only=False)
                nd = np.zeros(len(m), dtype=np.int64)
                if hit.any():
                    nd[hit] = self.nd[
                        ix.to_numpy(zero_copy_only=False)[hit].astype(np.int64)
                    ]
                return pa.table({
                    "doc_id": b["doc_id"],
                    "m": b["m"],
                    "dup_m": pa.array(np.where(hit, m, 0), pa.int64()),
                    "cross_m": pa.array(np.where(nd >= 2, m, 0), pa.int64()),
                })

        flagged = pairs.map_batches(_Flag, batch_format="pyarrow",
                                    concurrency=(1, 2))
    else:
        j = pairs.join(dup, "left_outer", num_partitions=JOIN_PARTS, on=("h",))

        def _flag_join(b: pa.Table) -> pa.Table:
            m = b["m"].to_numpy(zero_copy_only=False)
            hit = pc.is_valid(b["c"]).to_numpy(zero_copy_only=False)
            nd = pc.fill_null(b["nd"], 0).to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": b["doc_id"],
                "m": b["m"],
                "dup_m": pa.array(np.where(hit, m, 0), pa.int64()),
                "cross_m": pa.array(np.where(nd >= 2, m, 0), pa.int64()),
            })

        flagged = j.map_batches(_flag_join, batch_format="pyarrow")

    per_doc = fast_groupby_agg(flagged, ["doc_id"], {
        "n_windows": ("m", "sum"),
        "n_dup_windows": ("dup_m", "sum"),
        "n_crossdoc_windows": ("cross_m", "sum"),
    })
    return per_doc.map_batches(
        lambda b: b.append_column(
            "keep",
            pc.less(pc.multiply(b["n_crossdoc_windows"], 2),
                    b["n_windows"]),
        ),
        batch_format="pyarrow",
    )


# ============================================== quantile-gated filtering


def q_length_band_filter(sf_dir, q_lo: float = 0.1, q_hi: float = 0.9):
    """Percentile-band length filter — the "drop the tails" corpus gate
    (too-short docs are boilerplate, too-long are concatenation junk):
    keep documents whose word count lies within the corpus' exact
    [p10, p90] band. Composition: the exact distinct-value-CDF quantile
    plan (same as relational.q_quantiles — the exchange moves one row
    per DISTINCT length, the driver picks ranks from the tiny CDF) →
    two broadcast ints → a map-side integer predicate. Rank rule
    (row_number = ceil(q·n), floor 1) is pinned in the oracle SQL; the
    thresholds and counts are integers, so the keep flag cannot
    straddle a float edge."""
    import math

    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _nw(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_words": (df["text"].str.count(" ") + 1).astype("int64"),
        })

    nw = docs.map_batches(_nw, batch_format="pandas").materialize()
    vc = fast_groupby_agg(nw, ["n_words"], {"n": (None, "count")})
    t = pa.concat_tables(
        b for b in ray.get(vc.materialize().to_arrow_refs())
        if b.num_rows > 0
    )
    vals = t["n_words"].to_numpy(zero_copy_only=False)
    cnts = t["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])

    def pick(q: float) -> int:
        r = max(1, math.ceil(q * n))
        return int(vals[np.searchsorted(cum, r)])

    lo, hi = pick(q_lo), pick(q_hi)
    return nw.map_batches(
        lambda b: b.append_column(
            "keep",
            pc.and_(pc.greater_equal(b["n_words"], lo),
                    pc.less_equal(b["n_words"], hi))),
        batch_format="pyarrow",
    )


# ===================================================== document chunking

CHUNK_SIZE = 64    # tokens per chunk
CHUNK_STRIDE = 48  # tokens between chunk starts (overlap = 16)


def q_chunk_documents(sf_dir, size: int = CHUNK_SIZE,
                      stride: int = CHUNK_STRIDE):
    """Sliding-window document chunking — the pretraining / RAG
    pre-tokenization splitter: each document becomes overlapping
    ``size``-token chunks every ``stride`` tokens. A final partial
    chunk is emitted only while it contributes more than the overlap
    (start ≤ len − overlap), so no chunk is fully contained in its
    predecessor. Pure map — embarrassingly parallel, no exchange at
    all; the per-doc loop is the same linear cost class as
    tokenization itself (house policy for tokenize-shaped kernels,
    like q_bigram_stats)."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])
    overlap = size - stride

    def _chunks(df: pd.DataFrame) -> pd.DataFrame:
        out_id: list = []
        out_idx: list = []
        out_n: list = []
        out_txt: list = []
        for did, txt in zip(df["doc_id"].to_numpy(), df["text"]):
            ts = txt.split(" ")
            n = len(ts)
            bound = max(n - overlap, 1)
            s, ci = 0, 0
            while s < bound:
                w = ts[s:s + size]
                out_id.append(did)
                out_idx.append(ci)
                out_n.append(len(w))
                out_txt.append(" ".join(w))
                s += stride
                ci += 1
        return pd.DataFrame({
            "doc_id": np.array(out_id, np.int64),
            "chunk_idx": np.array(out_idx, np.int64),
            "n_tokens": np.array(out_n, np.int64),
            "chunk": pd.Series(out_txt, dtype="object"),
        })

    return docs.map_batches(_chunks, batch_format="pandas")


# ============================================== end-to-end curation

CURATION_BENCH_DOCS = 5


def q_curation_pipeline(sf_dir):
    """End-to-end corpus curation — the composition proof that the
    engine's cleaning stages CHAIN as one streaming Dataset program the
    way a real training-data pipeline runs them:

        lang-ID agreement → Gopher quality gates → exact dedup →
        MinHash near-dedup → decontamination vs the benchmark docs →
        train/val/test split

    Each stage consumes the previous stage's survivor Dataset (semi
    joins / survivor plans, never driver row sets beyond the guarded
    broadcast tiers the stages already own). Returns the per-stage
    attrition audit (rows_in → rows_out) plus final split counts.
    Rows-only (LSH-dependent); gates assert monotone non-increasing
    attrition and a non-empty final corpus."""
    import hashlib as _hl

    from ..functions import sketches as SK
    from ..functions import textstats as TS
    from . import dedup_text as DT

    docs0 = T(sf_dir, "documents",
              ["doc_id", "text", "lang", "source", "n_chars"]).materialize()
    stages: list[dict] = []
    cur = docs0
    n = cur.count()
    stages.append({"stage": "start", "rows_in": n, "rows_out": n})

    def _record(name: str, ds):
        nonlocal cur, n
        ds = ds.materialize()
        m = ds.count()
        stages.append({"stage": name, "rows_in": n, "rows_out": m})
        cur, n = ds, m

    # 1) language-ID agreement: detector must confirm the metadata lang
    pred = cur.map_batches(TS.LangId, batch_format="pyarrow",
                           concurrency=(1, 4)).map_batches(
        lambda b: b.select(["doc_id", "lang_pred"]).rename_columns(
            ["did_r", "lang_pred"]),
        batch_format="pyarrow")
    agree = cur.join(pred, "inner", num_partitions=4,
                     on=("doc_id",), right_on=("did_r",)).map_batches(
        lambda b: b.filter(pc.equal(b["lang"], b["lang_pred"]))
                   .select(["doc_id", "text", "lang", "source",
                            "n_chars"]),
        batch_format="pyarrow")
    _record("langid_agree", agree)

    # 2) Gopher quality gates (same kernel as q_quality_gopher)
    flags = cur.map_batches(
        lambda df: gopher_flags(df).select(["doc_id", "keep"]),
        batch_format="pandas").map_batches(
        lambda b: b.filter(b["keep"])
        .select(["doc_id"]).rename_columns(["did_r"]),
        batch_format="pyarrow").materialize()
    kept = cur.join(flags, "left_semi", num_partitions=4,
                    on=("doc_id",), right_on=("did_r",))
    _record("gopher_quality", kept)

    # 3) exact text dedup (keep min doc_id per md5 cluster)
    exact_ids = DT.exact_dedup(cur).materialize()
    _record("exact_dedup", DT._semi(
        cur, exact_ids, "doc_id", "doc_id", cur.schema().base_schema))

    # 4) MinHash+LSH near-dedup over the survivors
    survivors, _ = DT.minhash_lsh_dedup(cur, threshold=0.7)
    _record("minhash_dedup", survivors)

    # 5) decontamination: drop docs sharing an 8-shingle with the
    # benchmark docs (doc_id < CURATION_BENCH_DOCS of the ORIGINAL
    # corpus), and the benchmark docs themselves
    bench_hashes: set[int] = set()
    for b in docs0.iter_batches(batch_format="pyarrow"):
        t = b.filter(pc.less(b["doc_id"], CURATION_BENCH_DOCS))
        for txt in t["text"].to_pylist():
            bench_hashes.update(SK._hash64(SK.shingles(txt, 8)).tolist())
    bref = ray.put(np.sort(np.fromiter(
        bench_hashes, dtype=np.uint64, count=len(bench_hashes))))

    class _Decon:
        def __init__(self):
            self.bench = ray.get(bref)

        def __call__(self, b: pa.Table) -> pa.Table:
            keep = []
            for doc_id, txt in zip(b["doc_id"].to_pylist(),
                                   b["text"].to_pylist()):
                if doc_id < CURATION_BENCH_DOCS:
                    keep.append(False)
                    continue
                h = SK._hash64(SK.shingles(txt, 8))
                if len(h) == 0 or len(self.bench) == 0:
                    keep.append(True)
                    continue
                idx = np.searchsorted(self.bench, h)
                idx[idx == len(self.bench)] = 0
                keep.append(not bool(np.any(self.bench[idx] == h)))
            return b.filter(pa.array(keep))

    _record("decontaminate", cur.map_batches(
        _Decon, batch_format="pyarrow", concurrency=(1, 4)))

    # 6) split assignment audit (hash-based 80/10/10)
    final = cur.map_batches(
        lambda b: pa.table({"bucket": pa.array(
            [int(_hl.md5(str(i).encode()).hexdigest()[:8], 16) % 10
             for i in b["doc_id"].to_pylist()], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    for name, mask in (("train", final["bucket"] < 8),
                       ("val", final["bucket"] == 8),
                       ("test", final["bucket"] == 9)):
        stages.append({"stage": f"split:{name}", "rows_in": n,
                       "rows_out": int(mask.sum())})

    out = pd.DataFrame(stages)
    body = out[~out["stage"].str.startswith("split:")]
    assert (body["rows_out"] <= body["rows_in"]).all(), out
    assert n > 0, "curation emptied the corpus"
    split_total = out[out["stage"].str.startswith("split:")][
        "rows_out"].sum()
    assert split_total == n, out
    return out


# ============================================================ registry

DSIR_BUCKETS = 1024


def q_dsir_weights(sf_dir, n_buckets: int = DSIR_BUCKETS):
    """DSIR-style hashed importance weights (Xie et al. 2023): score
    every document by how target-like its hashed unigram distribution
    is, target = the English subcorpus. Per-bucket weight is
    ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B)) quantized ×1e9 per BUCKET
    (libm log on exact integer ratios, the grouped_entropy recipe), so
    each document's score is an exact INTEGER sum of its tokens'
    bucket weights — association-order-free at any parallelism.

    Scale plan (100 TB): pass 1 folds token→md5-bucket counts to B=1024
    mergeable partial rows per block (the only exchange is B-sized);
    the weight table is B rows and broadcasts by closure; pass 2 is one
    shuffle-free map with a per-actor token→bucket memo (vocabulary-
    sized, Heaps-bounded — the same budget vocab_prune's broadcast tier
    assumes)."""
    docs = T(sf_dir, "documents", ["doc_id", "text", "lang"])

    def _bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets

    def _bucket_series(ex: pd.Series, memo: dict) -> np.ndarray:
        """Vectorized token→bucket: md5 only on NEW vocabulary (memo),
        then one C-level dict map over the exploded token column."""
        for tok in pd.unique(ex.to_numpy()):
            if tok not in memo:
                memo[tok] = _bucket(tok)
        return ex.map(memo).to_numpy(np.int64)

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        ex = df["text"].str.split(" ").explode()
        bk = _bucket_series(ex, {})
        is_t = (df["lang"] == "en").to_numpy()[
            ex.index.to_numpy(np.int64)]
        r_cnt = np.bincount(bk, minlength=n_buckets).astype(np.int64)
        t_cnt = np.bincount(bk[is_t],
                            minlength=n_buckets).astype(np.int64)
        return pd.DataFrame({
            "bucket": np.arange(n_buckets, dtype=np.int64),
            "t_cnt": t_cnt,
            "r_cnt": r_cnt,
        })

    import math

    from .relational import _round_half_away

    cnt = fast_groupby_agg(
        docs.map_batches(_counts, batch_format="pandas"),
        ["bucket"], {"t_cnt": ("t_cnt", "sum"), "r_cnt": ("r_cnt", "sum")},
    ).to_pandas()  # B rows — fixed size, scale-independent
    tt = int(cnt["t_cnt"].sum())
    rt = int(cnt["r_cnt"].sum())
    w_raw = np.zeros(n_buckets, np.float64)
    for bk, t, r in zip(cnt["bucket"], cnt["t_cnt"], cnt["r_cnt"]):
        # libm log (math.log == DuckDB ln code path); ratio computed as
        # ONE double division on exact ints, mirrored in the oracle
        w_raw[int(bk)] = 1e9 * (
            math.log((int(t) + 1.0) / (tt + float(n_buckets)))
            - math.log((int(r) + 1.0) / (rt + float(n_buckets))))
    w_fp = _round_half_away(w_raw).astype(np.int64)

    class _Score:
        def __init__(self):
            self.memo: dict[str, int] = {}  # vocabulary-sized, per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.reset_index(drop=True)
            ex = df["text"].str.split(" ").explode()
            bk = _bucket_series(ex, self.memo)
            doc_idx = ex.index.to_numpy(np.int64)
            scores = np.bincount(
                doc_idx, weights=w_fp[bk].astype(np.float64),
                minlength=len(df)).astype(np.int64)
            # bincount weights go through double — exact only below
            # 2^53 per doc; per-doc |score| is ≤ tokens·max|w| ≈ 1e13,
            # comfortably inside. Assert so growth can't silently
            # round (then it must switch to np.add.at on int64).
            assert np.abs(scores).max(initial=0) < (1 << 52)
            n_tok = np.bincount(doc_idx,
                                minlength=len(df)).astype(np.int64)
            return pd.DataFrame({
                "doc_id": df["doc_id"],
                "n_tokens": n_tok,
                "score_fp": scores,
            })

    return docs.map_batches(_Score, batch_format="pandas",
                            concurrency=(1, 2))


EPOCH_SHUFFLE_SHARDS = 16


def q_epoch_shuffle(sf_dir, n_shards: int = EPOCH_SHUFFLE_SHARDS,
                    seed: int = 0):
    """Deterministic epoch shuffle for training-data ordering: every
    document gets a (shard, position) that is a pure function of
    (seed, doc_id) — reproducible at any cluster size, any block
    layout, any retry, unlike ``Dataset.random_shuffle``. Shard =
    md5 bucket; within-shard order = full md5 hex (doc_id tie-break).

    Scale plan (100 TB): the keying pass is shuffle-free; position
    assignment is a groupby(shard).map_groups sort — n_shards is
    chosen so one shard ≈ one worker's memory (shard COUNT grows with
    the corpus, shard SIZE stays fixed — the WebDataset-style
    shard-then-shuffle-within layout training loaders expect)."""
    docs = T(sf_dir, "documents", ["doc_id"])

    def _key(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        hs = [hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
              for i in ids]
        shard = [int(h[:8], 16) % n_shards for h in hs]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "h": pa.array(hs, pa.string()),
            "shard": pa.array(shard, pa.int64()),
        })

    keyed = docs.map_batches(_key, batch_format="pyarrow")

    def _pos(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"]).reset_index(drop=True)
        g["pos"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["doc_id", "shard", "pos"]]

    return keyed.groupby("shard").map_groups(_pos, batch_format="pandas")


BPE_MERGES = 20
BPE_VOCAB_DRIVER_MAX = 200_000


def _bpe_top_pair(counts: dict) -> tuple:
    """Deterministic best pair: max count, then lexicographic (a, b)."""
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def _bpe_apply(syms: list[str], a: str, b: str) -> list[str]:
    """Merge all non-overlapping (a, b) occurrences left to right."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_merges_local(word_counts: list, n_merges: int) -> pd.DataFrame:
    """Reference/driver tier: plain-python BPE over the (word, count)
    vocabulary. This is the executable spec the distributed tier is
    pinned against."""
    vocab = [(list(w) + ["</w>"], int(c)) for w, c in word_counts]
    rows = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for syms, c in vocab:
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        a, b = _bpe_top_pair(counts)
        rows.append({"rank": rank, "left": a, "right": b,
                     "pair_count": int(counts[(a, b)])})
        vocab = [(_bpe_apply(s, a, b), c) for s, c in vocab]
    return pd.DataFrame(rows)


def q_bpe_train(sf_dir, n_merges: int = BPE_MERGES,
                max_driver_vocab: int = BPE_VOCAB_DRIVER_MAX):
    """BPE tokenizer training (the merge-table build step of an LLM
    data pipeline), distributed: the corpus first collapses to a
    (word, count) VOCABULARY Dataset (map-side Counter partials → one
    vocabulary-sized groupby — the classic BPE trick: all later work is
    Heaps-bounded, never corpus-sized). Each merge round then needs one
    pair-count fold (map partials → groupby sum → global top-1 by
    (count desc, pair asc)) and one symbol-rewrite map over the
    vocabulary. Below ``max_driver_vocab`` the rounds run in plain
    python on the collected vocabulary (driver tier — the executable
    spec); above it every round stays a Dataset pipeline. Both tiers
    are pinned identical by test. Rows-only (iterative; not
    SQL-expressible)."""
    def _wc(df: pd.DataFrame) -> pd.DataFrame:
        vc = (df["text"].fillna("").str.split(" ").explode()
              .value_counts())
        return pd.DataFrame({"word": vc.index.to_numpy(),
                             "cnt": vc.to_numpy(np.int64)})

    vocab = fast_groupby_agg(
        T(sf_dir, "documents", ["text"]).map_batches(
            _wc, batch_format="pandas"),
        ["word"], {"cnt": ("cnt", "sum")}).materialize()

    if vocab.count() <= max_driver_vocab:
        wc = vocab.to_pandas()
        return _bpe_merges_local(
            list(zip(wc["word"], wc["cnt"])), n_merges)

    # distributed tier: symbols ride as one space-joined string column
    syms_ds = vocab.map_batches(
        lambda b: pa.table({
            "syms": pa.array(
                [" ".join(list(w) + ["</w>"])
                 for w in b["word"].to_pylist()], pa.string()),
            "cnt": b["cnt"],
        }),
        batch_format="pyarrow").materialize()
    rows = []
    for rank in range(1, n_merges + 1):
        def _pairs(b: pa.Table) -> pa.Table:
            c: dict = {}
            for s, n in zip(b["syms"].to_pylist(),
                            b["cnt"].to_pylist()):
                parts = s.split(" ")
                for p in zip(parts, parts[1:]):
                    c[p] = c.get(p, 0) + n
            ks = list(c.keys())
            return pa.table({
                "a": pa.array([k[0] for k in ks], pa.string()),
                "b": pa.array([k[1] for k in ks], pa.string()),
                "c": pa.array([c[k] for k in ks], pa.int64()),
            })

        agg = fast_groupby_agg(
            syms_ds.map_batches(_pairs, batch_format="pyarrow"),
            ["a", "b"], {"c": ("c", "sum")})
        top = agg.sort(["c", "a", "b"],
                       descending=[True, False, False]).limit(1) \
            .to_pandas()
        if top.empty:
            break
        a, b_, cnt = (str(top["a"].iloc[0]), str(top["b"].iloc[0]),
                      int(top["c"].iloc[0]))
        rows.append({"rank": rank, "left": a, "right": b_,
                     "pair_count": cnt})

        def _apply(t: pa.Table, a=a, b_=b_) -> pa.Table:
            return pa.table({
                "syms": pa.array(
                    [" ".join(_bpe_apply(s.split(" "), a, b_))
                     for s in t["syms"].to_pylist()], pa.string()),
                "cnt": t["cnt"],
            })

        syms_ds = syms_ds.map_batches(
            _apply, batch_format="pyarrow").materialize()
    return pd.DataFrame(rows)


def q_bpe_encode(sf_dir, n_merges: int = BPE_MERGES):
    """BPE tokenizer APPLY (the encode step that follows q_bpe_train in
    an LLM data pipeline): tokenize every document with the trained
    merge table and report per-doc word/token counts. The merge list is
    built once and ships to an actor pool via ``ray.put``; each actor
    memoizes word → token-count, so per-batch cost is bounded by the
    vocabulary it has seen (Heaps' law), not the corpus. A word always
    encodes to ≥1 token and merges only ever shrink the symbol count,
    so n_tokens ∈ [n_words, n_chars+n_words] — asserted by test, with
    the scalar re-encode as the executable spec. Rows-only (the merge
    table is iteratively trained; not SQL-expressible)."""
    merges = q_bpe_train(sf_dir, n_merges)
    mref = ray.put(list(zip(merges["left"], merges["right"])))

    class _Encode:
        def __init__(self):
            self.merges = ray.get(mref)
            self.memo: dict[str, int] = {}

        def _ntok(self, w: str) -> int:
            hit = self.memo.get(w)
            if hit is None:
                syms = list(w) + ["</w>"]
                for a, b in self.merges:
                    syms = _bpe_apply(syms, a, b)
                hit = self.memo[w] = len(syms)
            return hit

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            # Emit metadata-free Arrow (not a DataFrame): Ray's
            # pandas→Arrow block conversion attaches from_pandas schema
            # metadata whose embedded dict makes hash(Schema) raise in
            # the hash-shuffle join's schema-dedup fast path (noisy
            # per-aggregator warnings downstream).
            words = df["text"].fillna("").str.split(" ")
            return pa.table({
                "doc_id": pa.Array.from_pandas(df["doc_id"]),
                "n_words": pa.array(words.str.len().to_numpy(np.int64)),
                "n_tokens": pa.array(
                    [sum(self._ntok(w) for w in ws) for ws in words],
                    pa.int64()),
            })

    return T(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _Encode, batch_format="pandas", concurrency=(1, 4))


def queries() -> dict:
    return {
        "curation_pipeline": q_curation_pipeline,
        "bpe_encode": q_bpe_encode,
        "tokenizer_fertility": q_tokenizer_fertility,
        "dsir_weights": q_dsir_weights,
        "epoch_shuffle": q_epoch_shuffle,
        "bpe_train": q_bpe_train,
        "pii_scrub": q_pii_scrub,
        "quality_gopher": q_quality_gopher,
        "repetition_topgram": q_repetition_topgram,
        "mix_sources": q_mix_sources,
        "vocab_prune": q_vocab_prune,
        "span_dedup": q_span_dedup,
        "chunk_documents": q_chunk_documents,
        "length_band_filter": q_length_band_filter,
        "span_keep_first": q_span_keep_first,
        "interleave_curriculum": q_interleave_curriculum,
        "token_dropout_aug": q_token_dropout_aug,
    }


ORACLES: dict[str, str] = {
    "pii_scrub": f"""
        WITH aug AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@mail.example.com call 555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                        || '.' || CAST(doc_id % 250 AS VARCHAR)
                        || '.' || CAST(doc_id % 9 AS VARCHAR) AS s
            FROM documents)
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(s,
                   '{_EMAIL}', '<EMAIL>', 'g'),
                   '{_IP}', '<IP>', 'g'),
                   '{_PHONE}', '<PHONE>', 'g') AS clean_text,
               len(regexp_extract_all(s, '{_EMAIL}')) AS n_emails,
               len(regexp_extract_all(s, '{_IP}')) AS n_ips,
               len(regexp_extract_all(s, '{_PHONE}')) AS n_phones
        FROM aug
    """,
    "quality_gopher": """
        WITH m AS (
            SELECT doc_id,
                   len(split(text, ' ')) AS n_words,
                   len(replace(text, ' ', '')) AS n_nosp,
                   len(list_distinct(split(text, ' '))) AS n_distinct
            FROM documents)
        SELECT doc_id, n_words,
               round(n_nosp::DOUBLE / n_words * 1000000.0) / 1000000.0
                   AS mean_word_len,
               round((1.0 - n_distinct::DOUBLE / n_words) * 1000000.0)
                   / 1000000.0 AS rep_ratio,
               (n_words BETWEEN 20 AND 90
                AND n_nosp >= 4 * n_words AND n_nosp <= 5 * n_words
                AND (n_words - n_distinct) * 10 <= 6 * n_words) AS keep
        FROM m
    """,
    "repetition_topgram": """
        WITH w AS (SELECT doc_id, split(text, ' ') AS ws FROM documents),
        bg AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(ws)),
                             i -> ws[i] || ' ' || ws[i+1])) AS bigram
               FROM w),
        cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        mx AS (SELECT doc_id, max(c) AS mc FROM cnt GROUP BY 1)
        SELECT w.doc_id,
               greatest(len(ws) - 1, 0) AS n_bigrams,
               CASE WHEN len(ws) <= 1 THEN 0.0
                    ELSE round(mx.mc::DOUBLE / (len(ws) - 1) * 1000000.0)
                         / 1000000.0 END AS top_bigram_frac,
               coalesce(mx.mc, 0) * 100 <= 5 * greatest(len(ws) - 1, 0)
                   AS keep
        FROM w LEFT JOIN mx ON w.doc_id = mx.doc_id
    """,
    "mix_sources": """
        SELECT doc_id, source FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
              CASE CAST(substr(source, 4) AS INT) % 4
                   WHEN 0 THEN 'zz' WHEN 1 THEN 'c0'
                   WHEN 2 THEN '80' ELSE '40' END
    """,
    "vocab_prune": """
        WITH n AS (SELECT count(*) AS nd FROM documents),
        w AS (SELECT doc_id, split(text, ' ') AS ws FROM documents),
        tok AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(ws) + 1),
                              i -> {'w': ws[i], 'i': i})) AS t
                FROM w),
        df AS (SELECT t.w AS word, count(DISTINCT doc_id) AS c
               FROM tok GROUP BY 1),
        keepw AS (SELECT word FROM df, n
                  WHERE c * 100 >= 10 * nd AND c * 100 <= 78 * nd),
        kept AS (SELECT tok.doc_id, t.w AS word, t.i AS i
                 FROM tok JOIN keepw ON t.w = keepw.word),
        agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS clean_text,
                       count(*) AS n_kept
                FROM kept GROUP BY 1)
        SELECT d.doc_id,
               coalesce(agg.clean_text, '') AS clean_text,
               len(split(d.text, ' ')) - coalesce(agg.n_kept, 0) AS n_dropped
        FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """,
    # w = SPAN_W = 8 tokens → window i covers ts[i .. i+7]; documents
    # shorter than 8 tokens have no windows (inner join on both sides)
    "span_dedup": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        pos AS (
            SELECT doc_id, ts,
                   unnest(range(1, greatest(len(ts) - 6, 1))) AS i
            FROM toks),
        wins AS (
            SELECT doc_id, md5(array_to_string(ts[i:i+7], ' ')) AS h
            FROM pos),
        stats AS (
            SELECT h, count(*) AS c, count(DISTINCT doc_id) AS nd
            FROM wins GROUP BY h)
        SELECT w.doc_id,
               count(*) AS n_windows,
               CAST(sum(CASE WHEN s.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_windows,
               CAST(sum(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_crossdoc_windows,
               CAST(sum(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   * 2 < count(*) AS keep
        FROM wins w JOIN stats s ON w.h = s.h
        GROUP BY w.doc_id
    """,
    # size=64, stride=48, overlap=16: starts are 1-based 1, 49, … while
    # start ≤ greatest(len−16, 1); final partial chunk keeps its length
    "chunk_documents": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        starts AS (
            SELECT doc_id, ts,
                   unnest(range(1, greatest(len(ts) - 16, 1) + 1, 48)) AS s
            FROM toks)
        SELECT doc_id,
               CAST((s - 1) / 48 AS BIGINT) AS chunk_idx,
               least(64, len(ts) - s + 1) AS n_tokens,
               array_to_string(ts[s:s+63], ' ') AS chunk
        FROM starts
    """,
    # rank rule mirrors q_quantiles: row_number = greatest(1, ceil(q*n))
    "length_band_filter": """
        WITH nw AS (
            SELECT doc_id,
                   len(text) - len(replace(text, ' ', '')) + 1 AS n_words
            FROM documents),
        s AS (
            SELECT n_words AS v,
                   row_number() OVER (ORDER BY n_words) AS rn,
                   count(*) OVER () AS n
            FROM nw),
        b AS (
            SELECT max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.1 * n)
                             AS BIGINT)) THEN v END) AS lo,
                   max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.9 * n)
                             AS BIGINT)) THEN v END) AS hi
            FROM s)
        SELECT nw.doc_id, nw.n_words,
               nw.n_words BETWEEN b.lo AND b.hi AS keep
        FROM nw, b
    """,
}

ORACLES["dsir_weights"] = """
    WITH b AS (
        SELECT doc_id, lang,
               CAST((SELECT sum((strpos('0123456789abcdef',
                                        substr(h, i, 1)) - 1)
                                * 16 ** (8 - i))
                     FROM range(1, 9) t(i)) AS BIGINT) % 1024 AS bucket
        FROM (SELECT doc_id, lang, md5(u.tok) AS h
              FROM documents,
                   unnest(string_split(text, ' ')) AS u(tok))
    ),
    cnt AS (
        SELECT bucket,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_cnt,
               count(*) AS r_cnt
        FROM b GROUP BY bucket
    ),
    tot AS (SELECT sum(t_cnt) AS tt, sum(r_cnt) AS rt FROM cnt),
    w AS (
        SELECT bucket,
               CAST(round(1e9 * (ln((t_cnt + 1.0) / (tt + 1024.0))
                               - ln((r_cnt + 1.0) / (rt + 1024.0))))
                    AS BIGINT) AS w_fp
        FROM cnt, tot
    )
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(w_fp) AS BIGINT) AS score_fp
    FROM b JOIN w USING (bucket)
    GROUP BY doc_id
"""

ORACLES["epoch_shuffle"] = """
    WITH k AS (
        SELECT doc_id,
               md5('0:' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    s AS (
        SELECT doc_id, h,
               CAST((SELECT sum((strpos('0123456789abcdef',
                                        substr(h, i, 1)) - 1)
                                * 16 ** (8 - i))
                     FROM range(1, 9) t(i)) AS BIGINT) % 16 AS shard
        FROM k
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (
               PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
    FROM s
"""


def q_tokenizer_fertility(sf_dir, n_merges: int = BPE_MERGES):
    """Tokenizer-quality scorecard per language: FERTILITY (BPE tokens
    per whitespace word, the standard multilingual-tokenizer health
    metric) and chars-per-token, from the q_bpe_encode per-doc counts
    hash-joined back onto documents for (lang, n_chars). Ratios are
    integer ×10⁶ floor divisions over exact count sums — no float.
    Rows-only like the other BPE stages (the merge table is trained
    iteratively; not SQL-expressible), with the invariants asserted
    in-query: fertility ≥ 1 (a word is ≥ 1 token) and tokens ≤
    chars+words (merges only shrink)."""
    enc = q_bpe_encode(sf_dir, n_merges)
    docs = T(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    j = enc.join(docs.map_batches(
        lambda b: b.rename_columns(["doc_id_r", "lang", "n_chars"]),
        batch_format="pyarrow"),
        "inner", num_partitions=4, on=("doc_id",), right_on=("doc_id_r",))
    g = fast_groupby_agg(j, ["lang"], {
        "n_docs": (None, "count"), "w": ("n_words", "sum"),
        "t": ("n_tokens", "sum"), "ch": ("n_chars", "sum"),
    }).to_pandas().sort_values("lang").reset_index(drop=True)
    fert = (g["t"].astype(np.int64) * 10**6) // g["w"].astype(np.int64)
    cpt = (g["ch"].astype(np.int64) * 10**6) // g["t"].astype(np.int64)
    assert (fert >= 10**6).all(), "a word must encode to >= 1 token"
    assert (g["t"] <= g["ch"] + g["w"]).all(), "merges only ever shrink"
    return pd.DataFrame({
        "lang": g["lang"], "n_docs": g["n_docs"].astype(np.int64),
        "fertility_fp": fert.astype(np.int64),
        "chars_per_token_fp": cpt.astype(np.int64),
    })


# =================================================== keep-first span dedup

SPAN_KF_W = 10          # tumbling-span width in tokens
SPAN_KF_ORD_BITS = 20   # ord must fit in 2^20 spans per doc


SPAN_KF_MAX_BROADCAST_DUPS = 2_000_000


def _span_rows(df: pd.DataFrame, w: int) -> pd.DataFrame:
    """Tumbling w-token spans of one doc batch: (doc_id, ord, span,
    packed pos). A doc's spans never leave its batch."""
    if not len(df):
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "ord": pd.Series([], dtype="int64"),
            "span": pd.Series([], dtype="object"),
            "pos": pd.Series([], dtype="int64")})
    toks = df["text"].str.split(" ")
    lens = toks.str.len().to_numpy(np.int64)
    doc = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
    flat = toks.explode().to_numpy()
    tord = np.arange(lens.sum(), dtype=np.int64) \
        - np.repeat(np.cumsum(lens) - lens, lens)
    ordv = tord // w
    if len(ordv) and int(ordv.max()) >= (1 << SPAN_KF_ORD_BITS):
        raise ValueError("doc exceeds 2^20 spans; widen pos packing")
    g = pd.DataFrame({"doc_id": doc, "ord": ordv, "tok": flat}) \
        .groupby(["doc_id", "ord"], sort=False)["tok"] \
        .agg(" ".join).reset_index()
    return pd.DataFrame({
        "doc_id": g["doc_id"].astype("int64"),
        "ord": g["ord"].astype("int64"),
        "span": g["tok"],
        "pos": (g["doc_id"].astype("int64")
                * (1 << SPAN_KF_ORD_BITS)
                + g["ord"].astype("int64")).astype("int64")})


def q_span_keep_first(sf_dir, w: int = SPAN_KF_W,
                      max_broadcast_dups: int = SPAN_KF_MAX_BROADCAST_DUPS):
    """C4-style KEEP-FIRST span dedup with corpus reassembly (Raffel et
    al., "Exploring the Limits of Transfer Learning", §2.2: "we
    discarded all but one of any three-sentence span occurring more
    than once") at tumbling ``w``-token granularity: every duplicated
    span survives only at its globally FIRST position (minimal
    (doc_id, ord)), every other occurrence is cut, and each document is
    re-joined from its surviving spans in order. Unlike q_span_dedup
    (which COUNTS duplicated sliding windows and gates whole docs),
    this emits the cleaned corpus itself — per doc the span counts
    before/after and the md5 fingerprint of the cleaned text, so the
    oracle checks the actual output bytes.

    Scale plan (100 TB): the ONLY exchange is the span-keyed groupby
    carrying (min pos, count) — pre-deduped map-side by the partial-agg
    combine. The keep decision then follows d1_exact_dedup's DUP-ONLY
    probe: spans with count ≥ 2 (a tiny fraction of a healthy corpus)
    ship as one broadcast span→first-pos map read per worker, and a
    SECOND shuffle-free map over the docs re-derives spans in-batch,
    drops non-first duplicate occurrences, and reassembles each doc
    right in its own batch — no corpus-sized join, no per-doc
    map_groups (the first cut shuffled every span string and paid a
    5000-group map_groups: 4.6 s → ~1 s at sf0.1). Above
    ``max_broadcast_dups`` the guarded join tier runs instead (spans ⋈
    dup-winners hash join + block-local reassembly), pinned equal by
    test."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])
    spans = docs.map_batches(lambda df: _span_rows(df, w),
                             batch_format="pandas")
    agg = fast_groupby_agg(
        spans.map_batches(lambda b: b.select(["span", "pos"]),
                          batch_format="pyarrow"),
        ["span"], {"mpos": ("pos", "min"), "n": (None, "count")})
    dups = agg.filter(expr="n >= 2").drop_columns(["n"]).materialize()
    n_dups = dups.count()
    empty_fp = int(hashlib.md5(b"").hexdigest()[:15], 16)

    def _finish(g: pd.DataFrame) -> pd.DataFrame:
        """Per-doc counts + cleaned-text md5 from an in-batch kept-span
        frame (doc_id, ord, span, n_spans_total per doc provided)."""
        joined = g.groupby("doc_id", sort=False)["span"].agg(" ".join)
        nk = g.groupby("doc_id", sort=False)["span"].size()
        return joined, nk

    if n_dups <= max_broadcast_dups:
        dup_ref = ray.put(dups.to_pandas())

        def _probe(df: pd.DataFrame) -> pd.DataFrame:
            sp = _span_rows(df, w)
            dup = _bcast_dup(dup_ref)
            m = sp["span"].map(dup)
            keep = m.isna() | (m == sp["pos"])
            kept = sp[keep]
            ns = sp.groupby("doc_id", sort=False)["ord"].size()
            joined, nk = _finish(kept)
            # dict lookups, NOT Series.map+fillna: a single missing key
            # floats the whole column and rounds md5 ints above 2^53
            fp = {d: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                  for d, s in joined.items()}
            ns_d, nk_d = ns.to_dict(), nk.to_dict()
            ids = df["doc_id"].to_numpy(np.int64)
            return pd.DataFrame({
                "doc_id": ids,
                "n_spans": np.fromiter(
                    (ns_d.get(d, 0) for d in ids), np.int64, len(ids)),
                "n_kept": np.fromiter(
                    (nk_d.get(d, 0) for d in ids), np.int64, len(ids)),
                "clean_fp": np.fromiter(
                    (fp.get(d, empty_fp) for d in ids), np.int64,
                    len(ids))})

        return docs.map_batches(_probe, batch_format="pandas")

    # join tier: hash-join spans against the dup winners, drop losers,
    # reassemble per doc (pinned equal to the probe tier by test)
    spans = spans.materialize()
    nspans = fast_groupby_agg(spans, ["doc_id"],
                              {"n_spans": (None, "count")})
    flagged = spans.join(
        dups.map_batches(lambda b: b.rename_columns(["span_r", "mpos"]),
                         batch_format="pyarrow"),
        "left_outer", num_partitions=JOIN_PARTS,
        on=("span",), right_on=("span_r",))
    kept = flagged.map_batches(
        lambda b: b.filter(pc.or_kleene(
            pc.is_null(b["mpos"]), pc.equal(b["pos"], b["mpos"]))),
        batch_format="pyarrow")

    def _reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ord", kind="mergesort")
        clean = " ".join(g["span"].tolist())
        fp = int(hashlib.md5(clean.encode()).hexdigest()[:15], 16)
        return pd.DataFrame({
            "doc_id": [np.int64(g["doc_id"].iloc[0])],
            "n_kept": [np.int64(len(g))],
            "clean_fp": [np.int64(fp)]})

    re = kept.groupby("doc_id").map_groups(_reassemble,
                                           batch_format="pandas")
    out = nspans.join(re.map_batches(
        lambda b: b.rename_columns(["doc_id_r", "n_kept", "clean_fp"]),
        batch_format="pyarrow"),
        "left_outer", num_partitions=JOIN_PARTS,
        on=("doc_id",), right_on=("doc_id_r",))

    def _fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "n_spans": b["n_spans"],
            "n_kept": pc.cast(pc.fill_null(b["n_kept"], 0), pa.int64()),
            "clean_fp": pc.cast(
                pc.fill_null(b["clean_fp"], empty_fp), pa.int64())})

    return out.map_batches(_fin, batch_format="pyarrow")


_span_dup_cache: dict[str, pd.Series] = {}


def _bcast_dup(ref) -> pd.Series:
    """Per-worker cache of the broadcast dup span→first-pos map (one
    deserialize + Series build per worker process)."""
    key = ref.hex() if hasattr(ref, "hex") else str(id(ref))
    hit = _span_dup_cache.get(key)
    if hit is None:
        df = ray.get(ref)
        hit = pd.Series(df["mpos"].to_numpy(np.int64),
                        index=df["span"].to_numpy())
        _span_dup_cache.clear()
        _span_dup_cache[key] = hit
    return hit


ORACLES["span_keep_first"] = f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tk,
               unnest(generate_series(
                   1, len(string_split(text, ' ')))) AS tord
        FROM documents),
    sp AS (
        SELECT doc_id, CAST((tord - 1) // {SPAN_KF_W} AS BIGINT) AS ord,
               string_agg(tk, ' ' ORDER BY tord) AS span
        FROM tok GROUP BY doc_id, ord),
    win AS (
        SELECT span,
               min(doc_id * {1 << SPAN_KF_ORD_BITS} + ord) AS mpos
        FROM sp GROUP BY span),
    kept AS (
        SELECT s.doc_id, s.ord, s.span
        FROM sp s JOIN win w
          ON w.span = s.span
         AND s.doc_id * {1 << SPAN_KF_ORD_BITS} + s.ord = w.mpos),
    re AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(span, ' ' ORDER BY ord) AS clean
        FROM kept GROUP BY doc_id),
    ns AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id)
    SELECT ns.doc_id,
           CAST(ns.n_spans AS BIGINT) AS n_spans,
           CAST(coalesce(re.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(concat('0x', substr(md5(coalesce(re.clean, '')), 1, 15))
                AS BIGINT) AS clean_fp
    FROM ns LEFT JOIN re ON re.doc_id = ns.doc_id
"""


# ================================================ curriculum interleaving


def q_interleave_curriculum(sf_dir):
    """Deterministic TRAINING-ORDER materialization: rank documents
    within each source by quality (n_chars DESC, doc_id tie-break) and
    round-robin-interleave the sources — position = (rank−1)·n_sources
    + source_index — so every training-window prefix sees all sources
    at their per-source quality frontier (the curriculum + source-
    balancing order GPT-class data loaders consume). All-integer, so
    the emitted order is bit-reproducible across cluster sizes.

    Scale plan: ONE distributed sort by (source, quality↓, doc_id);
    within-source global ranks are stitched from per-block per-source
    counts (driver state O(blocks × sources) ints — sources are a
    handful, blocks are thousands at 100 TB) exactly like
    q_rrf_customer_fusion's block-offset row_number; position assembly
    is a per-block map task. No group ever materializes on one
    worker — the per-key map_groups trap for source-sized groups is
    avoided."""
    import ray.data as rd

    docs = T(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    srt = docs.sort(["source", "n_chars", "doc_id"],
                    descending=[False, True, False]).materialize()
    refs = srt.to_arrow_refs()

    @ray.remote
    def _counts(t: pa.Table):
        if t.num_rows == 0:
            return []
        s = pd.Series(t["source"].to_pylist())
        vc = s.groupby(s, sort=True).size()
        return list(zip(vc.index.tolist(), vc.to_numpy().tolist()))

    per_block = ray.get([_counts.remote(r) for r in refs])
    running: dict[str, int] = {}
    offsets: list[dict[str, int]] = []
    for blk in per_block:
        offsets.append({src: running.get(src, 0) for src, _ in blk})
        for src, c in blk:
            running[src] = running.get(src, 0) + c
    sources = sorted(running)
    src_idx = {s: i for i, s in enumerate(sources)}
    nsrc = len(sources)

    @ray.remote
    def _pos(t: pa.Table, off: dict, idx: dict, k: int):
        if t.num_rows == 0:
            return pa.table({"pos": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string()),
                             "r": pa.array([], pa.int64())})
        src = pd.Series(t["source"].to_pylist())
        within = src.groupby(src, sort=False).cumcount().to_numpy(
            np.int64)
        base = src.map(off).to_numpy(np.int64)
        si = src.map(idx).to_numpy(np.int64)
        r = base + within + 1
        return pa.table({
            "pos": pa.array((r - 1) * k + si, pa.int64()),
            "doc_id": t["doc_id"],
            "source": t["source"],
            "r": pa.array(r, pa.int64())})

    ranked = rd.from_arrow_refs(
        [_pos.remote(ref, offsets[i], src_idx, nsrc)
         for i, ref in enumerate(refs)])
    return ranked.sort("pos")


ORACLES["interleave_curriculum"] = """
    WITH s AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS r,
               dense_rank() OVER (ORDER BY source) AS si
        FROM documents),
    k AS (SELECT count(DISTINCT source) AS n FROM documents)
    SELECT CAST((s.r - 1) * k.n + s.si - 1 AS BIGINT) AS pos,
           s.doc_id, s.source, CAST(s.r AS BIGINT) AS r
    FROM s, k ORDER BY pos
"""


# ==================================================== dropout augmentation


def q_token_dropout_aug(sf_dir):
    """Reproducible token-dropout augmentation: drop a token iff the
    first hex digit of md5("{doc_id}|{position}") is '0' (p = 1/16) and
    re-join the survivors in order — the data-augmentation pattern
    (word dropout, Iyyer et al. 2015) made bit-deterministic so an
    augmented 100-TB corpus can be regenerated, audited, or diffed
    instead of stored. Output per doc: token counts before/after and
    the md5 fingerprint of the augmented text, so the oracle checks the
    emitted bytes, not a statistic.

    Scale plan: ONE shuffle-free map_batches — a document never leaves
    its batch (split, per-position md5 gate, C-grouped ' '.join). No
    exchange at all; linear md5 work in corpus tokens, the same cost
    class as exact-dedup hashing."""
    docs = T(sf_dir, "documents", ["doc_id", "text"])

    def _aug(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "n_kept": pd.Series([], dtype="int64"),
                "aug_fp": pd.Series([], dtype="int64")})
        toks = df["text"].str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        doc = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
        flat = toks.explode().to_numpy()
        tord = np.arange(lens.sum(), dtype=np.int64) \
            - np.repeat(np.cumsum(lens) - lens, lens)
        keep = np.fromiter(
            (hashlib.md5(f"{d}|{t}".encode()).hexdigest()[0] != "0"
             for d, t in zip(doc, tord)),
            dtype=bool, count=len(doc))
        kept = pd.DataFrame({"doc_id": doc[keep], "tok": flat[keep]})
        joined = kept.groupby("doc_id", sort=False)["tok"] \
            .agg(" ".join)
        nk = kept.groupby("doc_id", sort=False)["tok"].size().to_dict()
        # dict lookups, NOT Series.map+fillna: a single missing key
        # floats the whole column and rounds md5 ints above 2^53
        empty = int(hashlib.md5(b"").hexdigest()[:15], 16)
        fp = {d: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
              for d, s in joined.items()}
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "n_tokens": lens,
            "n_kept": np.fromiter(
                (nk.get(d, 0) for d in ids), np.int64, len(ids)),
            "aug_fp": np.fromiter(
                (fp.get(d, empty) for d in ids), np.int64, len(ids))})

    return docs.map_batches(_aug, batch_format="pandas")


ORACLES["token_dropout_aug"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tk,
               unnest(generate_series(
                   1, len(string_split(text, ' ')))) AS tord
        FROM documents),
    kept AS (
        SELECT doc_id, tk, tord FROM tok
        WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|'
                         || CAST(tord - 1 AS VARCHAR)), 1, 1) <> '0'),
    re AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(tk, ' ' ORDER BY tord) AS aug
        FROM kept GROUP BY doc_id),
    ns AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id)
    SELECT ns.doc_id,
           CAST(ns.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(re.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(concat('0x', substr(md5(coalesce(re.aug, '')), 1, 15))
                AS BIGINT) AS aug_fp
    FROM ns LEFT JOIN re ON re.doc_id = ns.doc_id
"""
