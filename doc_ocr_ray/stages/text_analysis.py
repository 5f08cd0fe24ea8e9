"""Text-analysis stages for large-scale training-data pipelines.

Per-document, embarrassingly parallel ``map_batches`` transforms over
the ``documents`` table: token counting, quality scoring, language-ID
(stopword heuristic), and document fingerprinting.  All are vectorized
pandas/numpy kernels; none shuffles.

These operators extend the reference's text toolbox (SURVEY.md
section 2.8) to corpus curation at scale.
"""
from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pandas as pd

# token = maximal run of non-whitespace (mirrors the SQL oracle's
# regexp_split_to_array(trim(text), '\s+'))
_WS = re.compile(r"\s+")

STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset({"the", "a", "of", "and", "to", "in", "is"}),
    "de": frozenset({"der", "die", "das", "und", "ist", "nicht"}),
    "fr": frozenset({"le", "la", "les", "et", "est", "une"}),
    "es": frozenset({"el", "la", "los", "y", "es", "una"}),
}
_CJK = re.compile(r"[一-鿿]")
# ASCII word semantics on purpose: the SQL oracle's RE2 \w is
# ASCII-only, and Python's unicode \w would silently diverge on the
# first non-ASCII corpus.  Consequence: non-Latin letters count as
# "punctuation" for this ratio — the quality scorer is a Latin-script
# heuristic (its stopwords are too); use lang_id to route scripts.
_PUNCT = re.compile(r"[^\w\s]", re.ASCII)


def _tokens(series: pd.Series) -> pd.Series:
    stripped = series.fillna("").str.strip()
    toks = stripped.str.split(_WS)
    return toks.where(stripped != "", other=pd.Series([[]] * len(series),
                                                      index=series.index))


def token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_tokens, n_chars — whitespace tokenization."""
    toks = _tokens(batch["text"])
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_tokens": toks.str.len().astype("int64"),
        "n_chars": batch["text"].fillna("").str.len().astype("int64"),
    })


# BPE-style pre-tokenization classes: letter runs, digit runs, single
# punctuation marks (a simplified GPT-2 pre-tokenizer whose semantics
# are identical in Python re and RE2, so the SQL oracle can mirror it)
_BPE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")


def bpe_token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_bpe_tokens — subword-style pre-tokenizer counts
    (letter runs / digit runs / punctuation marks on lowered text)."""
    text = batch["text"].fillna("").str.lower()
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_bpe_tokens": text.str.count(_BPE).astype("int64"),
    })


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality signals.

    Ratios rounded to 4 decimals so the DuckDB oracle hashes equal.
    """
    text = batch["text"].fillna("")
    toks = _tokens(text)
    n_tokens = toks.str.len().astype("int64")
    n_chars = text.str.len().astype("int64")
    n_punct = text.str.count(_PUNCT).astype("int64")
    stop_en = toks.map(lambda ws: sum(1 for w in ws if w.lower() in STOPWORDS["en"]))
    nonspace = text.str.replace(_WS, "", regex=True).str.len().astype("int64")
    denom_t = n_tokens.clip(lower=1)
    denom_c = n_chars.clip(lower=1)
    # floor-truncate to 4 decimals with the same operation order as the
    # SQL oracle (floor(10000*num/den)/10000): floor is identical
    # across engines, unlike round() (pandas half-even vs SQL half-up)
    t4 = lambda num, den: np.floor(10000 * num / den) / 10000
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_tokens": n_tokens,
        "punct_ratio": t4(n_punct, denom_c),
        "stopword_ratio": t4(stop_en, denom_t),
        "mean_token_len": t4(nonspace, denom_t),
    })


def lang_id_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Heuristic language-ID: CJK-char majority -> zh, else argmax of
    per-language stopword hits (alphabetical tie-break, 'en' default
    when no stopword hits at all)."""
    text = batch["text"].fillna("")
    toks = _tokens(text.str.lower())
    langs = sorted(STOPWORDS)           # de, en, es, fr — alphabetical

    def classify(row_tokens, raw):
        cjk = len(_CJK.findall(raw))
        if cjk * 2 > max(1, len(raw)):
            return "zh"
        counts = {lg: sum(1 for w in row_tokens if w in STOPWORDS[lg])
                  for lg in langs}
        best = max(counts.values())
        if best == 0:
            return "en"
        return min(lg for lg in langs if counts[lg] == best)

    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "lang_pred": [classify(t, r) for t, r in zip(toks, text)],
    })


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Whole-document fingerprint: md5 of the whitespace-normalized,
    lowercased text (SQL-mirrorable)."""
    norm = (batch["text"].fillna("").str.strip().str.lower()
            .str.replace(_WS, " ", regex=True))
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "fingerprint": [hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in norm],
    })


def winnow_fingerprints(text: str, k: int = 5, window: int = 4) -> List[int]:
    """Winnowing (Schleimer et al., SIGMOD'03): k-gram rolling hashes,
    min per sliding window -> sparse doc fingerprint set.  Rows-only
    operator (no SQL analog)."""
    t = _WS.sub(" ", (text or "").strip().lower())
    if len(t) < k:
        return []
    hashes = [int.from_bytes(hashlib.md5(t[i:i + k].encode("utf-8"))
                             .digest()[:8], "big")
              for i in range(len(t) - k + 1)]
    out, prev = [], None
    for i in range(max(1, len(hashes) - window + 1)):
        m = min(hashes[i:i + window])
        if m != prev:
            out.append(m)
            prev = m
    return out


def winnow_batch(batch: pd.DataFrame, k: int = 5, window: int = 4) -> pd.DataFrame:
    fps = [winnow_fingerprints(t, k, window) for t in batch["text"].fillna("")]
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_fingerprints": np.array([len(f) for f in fps], dtype="int64"),
        "min_fingerprint": np.array([min(f) % (2**63) if f else 0 for f in fps],
                                    dtype="int64"),
    })
