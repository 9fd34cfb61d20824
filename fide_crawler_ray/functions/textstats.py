"""Text-analysis stages for the documents table: token counting, quality
scoring, language-ID, fingerprinting. All are vectorized ``map_batches``
bodies (pandas string kernels / numpy), with regexes compiled once per
actor in ``__init__`` where stateful.

These are the training-data-pipeline operators the engine adds beyond
the reference (the reference's string ops M10/M14 are the primitive
versions of these; SURVEY.md §2.8).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# re.ASCII pins parity with the DuckDB oracles: RE2's \w / \s are ASCII
# classes, while Python's default is Unicode — they agree on ASCII-only
# corpora (the current testdata) but would silently diverge on non-ASCII
# text without the flag.
_WORD = re.compile(r"\w+", re.ASCII)
_WS = re.compile(r"\s+", re.ASCII)

# language profiles for the n-gram/stopword heuristic language-ID.
# Tiny on purpose: a deterministic, explainable heuristic, not a model.
LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "por", "que"},
    "pt": {"o", "a", "os", "e", "é", "um", "uma", "em", "para", "não"},
}
_STOPWORDS_EN = LANG_PROFILES["en"]


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """Token counting: whitespace tokens and word (\\w+) tokens, plus
    average word length. SQL-expressible → has a DuckDB oracle."""
    text = batch["text"].to_pandas().fillna("")
    stripped = text.str.strip()
    n_ws = stripped.str.split(_WS).map(len).where(stripped.str.len() > 0, 0)
    words = text.str.findall(_WORD)
    n_words = words.map(len)
    total_word_chars = words.map(lambda ws: sum(len(w) for w in ws))
    avg_len = (total_word_chars / n_words.replace(0, np.nan)).fillna(0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pa.array(n_ws.astype("int64")),
            "n_word_tokens": pa.array(n_words.astype("int64")),
            "avg_word_len": pa.array(avg_len.round(6).astype("float64")),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality scoring: length / punctuation / digit / stopword ratios and
    a composite score. Every column is plain arithmetic over counts so the
    DuckDB oracle can reproduce it exactly."""
    text = batch["text"].to_pandas().fillna("")
    n_chars = text.str.len().astype("int64")
    n_punct = text.str.count(r"[!-/:-@\[-`{-~]").astype("int64")
    n_digit = text.str.count(r"[0-9]").astype("int64")
    words = text.str.findall(_WORD)
    n_words = words.map(len).astype("int64")
    n_stop = words.map(lambda ws: sum(1 for w in ws if w.lower() in _STOPWORDS_EN)).astype("int64")
    denom_c = n_chars.replace(0, 1)
    denom_w = n_words.replace(0, 1)
    punct_ratio = (n_punct / denom_c).round(6)
    digit_ratio = (n_digit / denom_c).round(6)
    stop_ratio = (n_stop / denom_w).round(6)
    score = (
        0.4 * stop_ratio
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * (1.0 - digit_ratio)
    ).round(6)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars),
            "n_words": pa.array(n_words),
            "punct_ratio": pa.array(punct_ratio.astype("float64")),
            "digit_ratio": pa.array(digit_ratio.astype("float64")),
            "stopword_ratio": pa.array(stop_ratio.astype("float64")),
            "quality_score": pa.array(score.astype("float64")),
        }
    )


class LangId:
    """Language-ID via stopword-profile voting (n-gram heuristic):
    the language whose profile matches the most tokens wins; ties and
    zero-evidence rows → 'und'. Stateful stage: profiles and regex are
    prepared once per actor."""

    def __init__(self, profiles: dict[str, set[str]] | None = None):
        self.profiles = {k: frozenset(v) for k, v in (profiles or LANG_PROFILES).items()}
        # Unicode \w on purpose (unlike the oracled kernels above): the
        # profiles contain non-ASCII stopwords ("für", "não") and this
        # stage has no SQL oracle to stay bit-parallel with.
        self.word = re.compile(r"\w+")
        self.langs = sorted(self.profiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"].to_pandas().fillna("")
        preds, confs = [], []
        for t in text:
            toks = [w.lower() for w in self.word.findall(t)]
            if not toks:
                preds.append("und")
                confs.append(0.0)
                continue
            scores = {
                lang: sum(1 for w in toks if w in prof)
                for lang, prof in self.profiles.items()
            }
            best = max(self.langs, key=lambda l: scores[l])
            top = scores[best]
            if top == 0 or sum(1 for l in self.langs if scores[l] == top) > 1:
                preds.append("und")
                confs.append(0.0)
            else:
                preds.append(best)
                # fixed-point round (see pipelines/queries.py float
                # policy) so the DuckDB oracle matches bitwise
                confs.append(round(top / len(toks) * 1e6) / 1e6)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(preds, pa.string()),
                "lang_conf": pa.array(confs, pa.float64()),
            }
        )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprinting:

    - ``md5_fp``: md5 of the whitespace-collapsed lowercase text — the
      canonical exact-dup fingerprint (DuckDB-oracle-able via md5()).
    - ``roll_fp``: 61-bit polynomial rolling hash over word tokens
      (Rabin-Karp style), order-sensitive. Word hashes are md5-derived
      so the fold is exactly replayable in DuckDB via
      ``list_reduce((h,x) -> (h*B+x) % p)`` over
      ``('0x'||substr(md5(w),1,16))::UBIGINT`` — see the
      ``text_rolling_fp`` oracle in queries.py.
    """
    text = batch["text"].to_pandas().fillna("")
    norm = text.str.lower().str.replace(_WS, " ", regex=True).str.strip()
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in norm]
    from .sketches import md5_hash64

    rolls = []
    MOD = (1 << 61) - 1
    B = 1000003
    for t in norm:
        h = 0
        # md5_hash64 is THE single definition of the SQL-replayable
        # word-hash formula (('0x'||substr(md5(w),1,16))::UBIGINT)
        for wh in md5_hash64(t.split(" ")):
            h = (h * B + int(wh)) % MOD
        rolls.append(h)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "md5_fp": pa.array(md5s, pa.string()),
            "roll_fp": pa.array(np.array(rolls, dtype=np.uint64).astype(np.int64)),
        }
    )
