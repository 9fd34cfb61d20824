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
import ray

from ..stages.fastagg import fast_groupby_agg
from .queries import T, _canon_stage

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
    nunique for the distinct-word count)."""

    def _q(df: pd.DataFrame) -> pd.DataFrame:
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

    return T(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _q, batch_format="pandas")


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

    return docs.map_batches(_Prune, batch_format="pandas", concurrency=2)


def _vocab_prune_join(docs, df, n_docs: int):
    """Join fallback for object-store-sized vocabularies: explode
    (doc_id, pos, word) token rows, hash-join against the banded kept
    words, reassemble per doc. The exchange is token-count-sized — the
    unbounded (but fully distributed) side of the cardinality guard."""

    def _band(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((c * 100 >= 10 * n_docs)
                                 & (c * 100 <= 78 * n_docs))).select(["word"])

    keepw = df.map_batches(_band, batch_format="pyarrow")

    def _explode(b: pa.Table) -> pa.Table:
        dids, poss, ws, nw = [], [], [], []
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            parts = txt.split(" ")
            for i, w in enumerate(parts):
                dids.append(did)
                poss.append(i)
                ws.append(w)
                nw.append(len(parts))
        return pa.table({
            "doc_id": pa.array(dids, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
            "word": pa.array(ws, pa.string()),
            "n_words": pa.array(nw, pa.int64()),
        })

    toks = docs.map_batches(_explode, batch_format="pyarrow")
    kept = toks.join(keepw, "left_semi", num_partitions=8, on=("word",))

    def _reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("pos")
        return pd.DataFrame({
            "doc_id": [g["doc_id"].iloc[0]],
            "clean_text": [" ".join(g["word"])],
            "n_dropped": [int(g["n_words"].iloc[0]) - len(g)],
        })

    out = kept.groupby("doc_id").map_groups(_reassemble, batch_format="pandas")

    # docs whose words were ALL pruned vanish from the join — re-emit
    # them with empty text via an anti-join on the surviving doc ids.
    kept_ids = out.select_columns(["doc_id"])
    empty = docs.join(kept_ids, "left_anti", num_partitions=8,
                      on=("doc_id",)).map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"],
            "clean_text": pa.array([""] * b.num_rows, pa.string()),
            "n_dropped": pa.array(
                [t.count(" ") + 1 for t in b["text"].to_pylist()],
                pa.int64()),
        }), batch_format="pyarrow")
    return out.union(empty)


# ============================================================ registry

def queries() -> dict:
    return {
        "pii_scrub": q_pii_scrub,
        "quality_gopher": q_quality_gopher,
        "repetition_topgram": q_repetition_topgram,
        "mix_sources": q_mix_sources,
        "vocab_prune": q_vocab_prune,
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
}
