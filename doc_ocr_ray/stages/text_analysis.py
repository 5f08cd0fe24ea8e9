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
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from doc_ocr_ray.util import coarse_part, typed_if_empty

# Whitespace = the EXPLICIT class [\t\n\f\r ], which is exactly what
# RE2 (DuckDB regexp_*) means by \s — Python's unicode \s also matches
# \v and U+00A0 etc. and would silently diverge from every SQL oracle
# on the first corpus containing them.  Edge-stripping uses the same
# class (DuckDB trim() strips ONLY spaces, so oracles strip via regex).
_WS = re.compile(r"[\t\n\f\r ]+")
_EDGE_WS = re.compile(r"^[\t\n\f\r ]+|[\t\n\f\r ]+$")

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
_PUNCT = re.compile(r"[^\w\t\n\f\r ]", re.ASCII)


def _tokens(series: pd.Series) -> pd.Series:
    stripped = series.fillna("").str.replace(_EDGE_WS, "", regex=True)
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
_BPE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\t\n\f\r ]")


def bpe_token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_bpe_tokens — subword-style pre-tokenizer counts
    (letter runs / digit runs / punctuation marks on lowered text)."""
    text = batch["text"].fillna("").str.lower()
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_bpe_tokens": text.str.count(_BPE).astype("int64"),
    })


def _en_stopword_parts(toks: pd.Series):
    """(stopword counts, clipped token denominator) — the shared
    numerator/denominator convention behind every en-stopword ratio
    (quality_score_batch, select_top_quality's score grid)."""
    stop_en = toks.map(
        lambda ws: sum(1 for w in ws if w.lower() in STOPWORDS["en"]))
    return stop_en, toks.str.len().astype("int64").clip(lower=1)


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality signals.

    Ratios rounded to 4 decimals so the DuckDB oracle hashes equal.
    """
    text = batch["text"].fillna("")
    toks = _tokens(text)
    n_tokens = toks.str.len().astype("int64")
    n_chars = text.str.len().astype("int64")
    n_punct = text.str.count(_PUNCT).astype("int64")
    stop_en, denom_t = _en_stopword_parts(toks)
    nonspace = text.str.replace(_WS, "", regex=True).str.len().astype("int64")
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
    norm = (batch["text"].fillna("").str.replace(_EDGE_WS, "", regex=True)
            .str.lower().str.replace(_WS, " ", regex=True))
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "fingerprint": [hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in norm],
    })


def winnow_fingerprints(text: str, k: int = 5, window: int = 4) -> List[int]:
    """Winnowing (Schleimer et al., SIGMOD'03): k-gram rolling hashes,
    min per sliding window -> sparse doc fingerprint set.  Rows-only
    operator (no SQL analog)."""
    t = _WS.sub(" ", _EDGE_WS.sub("", text or "").lower())
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


# --------------------------------------------------------------- PII
# Patterns restricted to syntax whose semantics are IDENTICAL in
# Python re and RE2 (DuckDB regexp_*): no lookaround, no backrefs.
_EMAIL = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
# re.ASCII: RE2's \b is ASCII-only; unicode \b would diverge on CJK text
_PHONE = re.compile(r"\b555-[0-9]{4}\b", re.ASCII)
_IPV4 = re.compile(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", re.ASCII)

# SQL twins of the patterns above, for the DuckDB oracle (single
# source of truth: keep in lockstep with the compiled patterns)
PII_PATTERNS_SQL = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b555-[0-9]{4}\b",
    "ip": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_redact_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, redacted, n_emails, n_phones, n_ips — scrub emails,
    bare 555-phone numbers and IPv4 literals (the standard curation
    step before training-corpus release).  Rules apply in a fixed
    order (email, phone, ip) and each scans the PREVIOUS rule's
    output — the SQL oracle chains regexp_replace in the same order,
    so counts match even when rules interact.  Vectorized pandas .str
    kernels; no shuffle."""
    text = batch["text"].fillna("")
    n_emails = text.str.count(_EMAIL).astype("int64")
    red = text.str.replace(_EMAIL, "[EMAIL]", regex=True)
    n_phones = red.str.count(_PHONE).astype("int64")
    red = red.str.replace(_PHONE, "[PHONE]", regex=True)
    n_ips = red.str.count(_IPV4).astype("int64")
    red = red.str.replace(_IPV4, "[IP]", regex=True)
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "redacted": red,
        "n_emails": n_emails,
        "n_phones": n_phones,
        "n_ips": n_ips,
    })


def repetition_signals_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1):
    type-token ratio and the most-frequent word bigram per document.
    Docs with < 2 tokens drop (no bigram; the SQL twin's inner join
    drops them identically).

    Vectorized via explode + shift + groupby — no per-row Python loop:
    one flat (doc, word) frame serves the distinct-count, and a
    shifted copy forms bigrams.  Tie-break on equal bigram counts is
    lexicographic-min, deterministic in both engines.  TTR uses the
    floor(10000*num/den)/10000 grid rule shared with the quality
    scorer."""
    toks = _tokens(batch["text"])
    n_words = toks.str.len().astype("int64")
    flat = pd.DataFrame({
        "doc_id": batch["doc_id"].repeat(n_words.to_numpy()),
        "word": [w for ws in toks for w in ws],
    })
    if flat.empty:
        # pyarrow-typed empty block: an empty object column trips
        # Ray's block-size estimator (noisy per-block worker logs)
        import pyarrow as pa
        id_dtype = batch["doc_id"].to_numpy().dtype
        id_type = (pa.string() if id_dtype == np.dtype(object)
                   else pa.from_numpy_dtype(id_dtype))
        return pa.table({
            "doc_id": pa.array([], id_type),
            "n_words": pa.array([], pa.int64()),
            "n_distinct": pa.array([], pa.int64()),
            "ttr": pa.array([], pa.float64()),
            "top_bigram": pa.array([], pa.string()),
            "top_bigram_cnt": pa.array([], pa.int64()),
        })
    nxt = flat.groupby("doc_id", sort=False)["word"].shift(-1)
    big = flat[nxt.notna()].copy()
    big["bigram"] = big["word"] + " " + nxt.dropna()
    counts = (big.groupby(["doc_id", "bigram"], sort=False)
              .size().reset_index(name="top_bigram_cnt"))
    top = (counts.sort_values(["doc_id", "top_bigram_cnt", "bigram"],
                              ascending=[True, False, True],
                              kind="mergesort")
           .drop_duplicates("doc_id")
           .rename(columns={"bigram": "top_bigram"}))
    distinct = (flat.groupby("doc_id", sort=False)["word"].nunique()
                .rename("n_distinct"))
    base = pd.DataFrame({"doc_id": batch["doc_id"], "n_words": n_words})
    out = base.merge(distinct, on="doc_id").merge(top, on="doc_id")
    out["ttr"] = np.floor(10000.0 * out["n_distinct"] / out["n_words"]) / 10000
    return out[["doc_id", "n_words", "n_distinct", "ttr",
                "top_bigram", "top_bigram_cnt"]]


def dup_ngram_frac_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style duplicate n-gram fractions (Rae et al. 2021
    §A1.1): per document, the fraction of word bigram / trigram
    OCCURRENCES that belong to an n-gram appearing more than once —
    the standard machine-generated-repetition filter signal.

    Docs with fewer than 3 tokens drop (no trigram; the SQL twin's
    join drops them identically).  ``dup_bigram_frac`` /
    ``dup_trigram_frac`` use the shared floor(10000*num/den)/10000
    grid.  Vectorized explode + shift like
    :func:`repetition_signals_batch` — no per-row Python loop."""
    toks = _tokens(batch["text"])
    n_words = toks.str.len().astype("int64")
    flat = pd.DataFrame({
        "doc_id": batch["doc_id"].repeat(n_words.to_numpy()),
        "word": [w for ws in toks for w in ws],
    })
    if flat.empty:
        return typed_if_empty(pd.DataFrame({
            "doc_id": batch["doc_id"][:0], "n_words": n_words[:0],
            "dup_bigram_frac": pd.Series([], dtype="float64"),
            "dup_trigram_frac": pd.Series([], dtype="float64")}))

    def dup_frac(ngrams: pd.DataFrame) -> pd.Series:
        cnt = (ngrams.groupby(["doc_id", "gram"], sort=False)["gram"]
               .transform("size"))
        total = ngrams.groupby("doc_id", sort=False)["gram"].size()
        dup = (ngrams[cnt > 1].groupby("doc_id", sort=False)["gram"]
               .size().reindex(total.index, fill_value=0))
        return np.floor(10000.0 * dup / total) / 10000

    g = flat.groupby("doc_id", sort=False)["word"]
    nxt1, nxt2 = g.shift(-1), g.shift(-2)
    bi = flat[nxt1.notna()].copy()
    bi["gram"] = bi["word"] + " " + nxt1.dropna()
    tri = flat[nxt2.notna()].copy()
    tri["gram"] = (tri["word"] + " " + nxt1[nxt2.notna()]
                   + " " + nxt2.dropna())
    if tri.empty:
        return typed_if_empty(pd.DataFrame({
            "doc_id": batch["doc_id"][:0], "n_words": n_words[:0],
            "dup_bigram_frac": pd.Series([], dtype="float64"),
            "dup_trigram_frac": pd.Series([], dtype="float64")}))
    f2 = (dup_frac(bi[["doc_id", "gram"]])
          .rename("dup_bigram_frac").reset_index())
    f3 = (dup_frac(tri[["doc_id", "gram"]])
          .rename("dup_trigram_frac").reset_index())
    base = pd.DataFrame({"doc_id": batch["doc_id"],
                         "n_words": n_words})
    out = (base.merge(f3, on="doc_id")          # >=3 tokens only
           .merge(f2, on="doc_id"))
    return out[["doc_id", "n_words", "dup_bigram_frac",
                "dup_trigram_frac"]]


# ------------------------------------------------ quality classifier
# A linear text classifier in the fasttext-filter role (CCNet /
# GPT-3-style "looks like reference text" scoring).  Integer weights
# and an integer logit keep the decision EXACTLY reproducible in SQL —
# a float sigmoid would hash-diverge in the last ulp across engines.
DEFAULT_CLASSIFIER_WEIGHTS: Dict[str, int] = {
    # well-formed-English signals (function words)
    "the": 120, "and": 100, "of": 90, "is": 80, "to": 70, "in": 60,
    # boilerplate / spam signals
    "click": -400, "subscribe": -400, "buy": -250, "free": -200,
}
CLASSIFIER_BIAS = -150
CLASSIFIER_LEN_WEIGHT = 4       # per token, capped
CLASSIFIER_LEN_CAP = 100


class QualityClassifierStage:
    """Actor-pool scoring stage: the 'model' (term->weight table) is
    built once per actor in ``__init__`` — the slot where a real
    fasttext/ONNX model load goes — and ``__call__`` scores batches
    vectorized (one explode + filter + pivot per batch; no per-row
    Python loop).

    logit_milli = bias + sum(w[t] * count(t)) + w_len * min(n_tokens,
    cap); keep = logit_milli >= threshold.  All integers."""

    def __init__(self, weights: Optional[Dict[str, int]] = None,
                 threshold: int = 0):
        self.weights = dict(weights or DEFAULT_CLASSIFIER_WEIGHTS)
        self.threshold = threshold
        self.vocab = pd.Series(self.weights, name="w")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"].fillna("").str.lower())
        n_tokens = toks.str.len().astype("int64")
        idx = np.arange(len(batch))
        flat = pd.DataFrame({
            "i": np.repeat(idx, n_tokens.to_numpy()),
            "word": [w for ws in toks for w in ws],
        })
        hit = flat[flat["word"].isin(self.vocab.index)].copy()
        hit["w"] = hit["word"].map(self.weights)
        term_score = (hit.groupby("i")["w"].sum()
                      .reindex(idx, fill_value=0).astype("int64"))
        logit = (CLASSIFIER_BIAS
                 + term_score.to_numpy()
                 + CLASSIFIER_LEN_WEIGHT
                 * np.minimum(n_tokens.to_numpy(), CLASSIFIER_LEN_CAP))
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "logit_milli": logit.astype("int64"),
            "keep": logit >= self.threshold,
        })


def quality_classify(ds, weights: Optional[Dict[str, int]] = None,
                     threshold: int = 0, concurrency=(1, 8),
                     batch_size: int = 512):
    """Score documents with the linear quality classifier on an actor
    pool (weights table loaded once per actor, batches scored
    vectorized)."""
    return ds.map_batches(
        QualityClassifierStage,
        fn_constructor_kwargs={"weights": weights,
                               "threshold": threshold},
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency)


def tfidf_top_terms(ds, n_docs: int, k: int = 5,
                    num_partitions: int = 128):
    """Per-document top-k salient terms by TF-IDF — the two-pass
    learn-then-apply shape (global document frequencies, then per-doc
    scoring) collapsed into TWO exchanges, neither driver-side:

    1. explode to (doc_id, term, tf) rows (vectorized in-batch
       groupby), hash-partition by TERM: inside each term group the
       document frequency is simply the group's row count, so DF
       computation and the tf⋈df join cost ONE shuffle and no second
       pass over the corpus (and no driver-held vocabulary — at
       web scale the vocab never fits one process);
    2. hash-partition the scored rows by DOC for the per-doc top-k.

    Scores are integerized (``tf * floor(1000*ln(n_docs/df))``) so
    ranking is exactly reproducible in the SQL twin; ties break on
    term asc (terms are unique within a doc — total order).
    """
    def explode_tf(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"])
        n = toks.str.len().astype("int64")
        flat = pd.DataFrame({
            "doc_id": batch["doc_id"].repeat(n.to_numpy()),
            "term": [w for ws in toks for w in ws],
        })
        tf = (flat.groupby(["doc_id", "term"], sort=False)
              .size().reset_index(name="tf"))
        tf["part"] = coarse_part(tf["term"], num_partitions)
        return tf

    def score_term_part(group: pd.DataFrame) -> pd.DataFrame:
        # one row per (doc, term): the term's df IS its row count here
        df = group.groupby("term", sort=False)["doc_id"].transform("size")
        idf_milli = np.floor(
            1000.0 * np.log(np.float64(n_docs) / df.to_numpy())
        ).astype("int64")
        out = group[["doc_id", "term", "tf"]].copy()
        out["df"] = df.astype("int64").to_numpy()
        out["score_milli"] = out["tf"].to_numpy() * idf_milli
        out["part"] = coarse_part(out["doc_id"], num_partitions)
        return out

    def topk_doc_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["doc_id", "score_milli", "term"],
                              ascending=[True, False, True],
                              kind="mergesort")
        top = g.groupby("doc_id", sort=False).head(k).copy()
        top["rank"] = (top.groupby("doc_id", sort=False).cumcount() + 1
                       ).astype("int64")
        return top[["doc_id", "term", "tf", "df", "score_milli", "rank"]]

    return (ds.map_batches(explode_tf, batch_format="pandas")
            .groupby("part").map_groups(score_term_part,
                                        batch_format="pandas")
            .groupby("part").map_groups(topk_doc_part,
                                        batch_format="pandas"))


def _stopword_score(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, score) where score = floor(10000 * en-stopword-ratio)
    — an INTEGER on a bounded 0..10000 grid, which is what makes the
    histogram quantile in :func:`select_top_quality` exact."""
    stop_en, denom = _en_stopword_parts(_tokens(batch["text"].fillna("")))
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "score": np.floor(10000 * stop_en / denom).astype("int64"),
    })


def select_top_quality(ds, frac: float = 0.3):
    """Keep the globally top ``frac`` of documents by quality score
    WITHOUT a global sort — the FineWeb/C4 "keep the best X%" step as
    a two-pass histogram quantile:

    1. per-batch score histogram partials (score grid is 0..10000, so
       a partial is <=10001 tiny rows) combined on the driver —
       bounded like ``knn_brute``'s partial merge, never corpus-sized;
       the threshold is the k-th largest score, k = ceil(frac * N);
    2. a stateless filter pass keeps score >= threshold.

    Ties at the threshold are all kept (count may exceed k — standard
    quantile-filter semantics, deterministic in both engines).  A
    ``ds.sort`` would be an all-to-all exchange of the whole corpus;
    this moves only histograms.
    """
    import math

    if frac <= 0:
        def none_kept(batch: pd.DataFrame):
            return typed_if_empty(_stopword_score(batch).iloc[0:0])
        return ds.map_batches(none_kept, batch_format="pandas")
    if frac >= 1:
        return ds.map_batches(_stopword_score, batch_format="pandas")

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        s = _stopword_score(batch)["score"]
        vc = s.value_counts()
        return pd.DataFrame({"score": vc.index.astype("int64"),
                             "cnt": vc.to_numpy().astype("int64")})

    parts = ds.map_batches(hist, batch_format="pandas").to_pandas()
    agg = parts.groupby("score")["cnt"].sum().sort_index(ascending=False)
    total = int(agg.sum())
    if total == 0:
        return ds.map_batches(_stopword_score, batch_format="pandas")
    k = math.ceil(frac * total)
    cum = agg.cumsum()
    thr = int(cum.index[np.searchsorted(cum.to_numpy(), k)])

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        s = _stopword_score(batch)
        return typed_if_empty(s[s["score"] >= thr].reset_index(drop=True))

    return ds.map_batches(keep, batch_format="pandas")


def mix_plan(ds, weights: Dict[str, int], budget_tokens: int,
             group_col: str = "source"):
    """Data-mixing plan (Pile / Dolma style): per-source token totals
    and the repetition epochs needed to hit ``budget_tokens`` at the
    given mixture ``weights`` (milli-units).  All-integer arithmetic:
    target = budget * w_milli // 1000 (floor), epochs =
    ceil_div(budget * w_milli, 1000 * src_tokens) — bit-identical in
    the SQL twin, no float epsilon anywhere.

    Shape: per-batch partial (source, n_docs, n_tokens) combiner (the
    exchange carries one row per source per block), one tiny groupby
    to combine — the shared-nothing aggregation shape that holds at
    any corpus size.  Sources missing from ``weights`` get weight 0
    (epochs 0 — excluded from the mix).
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"].fillna(""))
        n = toks.str.len().astype("int64")
        g = (pd.DataFrame({group_col: batch[group_col], "n_tokens": n})
             .groupby(group_col, sort=False)["n_tokens"]
             .agg(["size", "sum"]).reset_index())
        return pd.DataFrame({group_col: g[group_col],
                             "n_docs": g["size"].astype("int64"),
                             "n_tokens": g["sum"].astype("int64")})

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        src = group[group_col].iloc[0]
        docs = int(group["n_docs"].sum())
        toks = int(group["n_tokens"].sum())
        w = int(weights.get(src, 0))
        target = budget_tokens * w // 1000
        num, den = budget_tokens * w, 1000 * toks
        epochs = (num + den - 1) // den if w > 0 and toks > 0 else 0
        return pd.DataFrame({group_col: [src],
                             "n_docs": pd.array([docs], dtype="int64"),
                             "n_tokens": pd.array([toks], dtype="int64"),
                             "weight_milli": pd.array([w], dtype="int64"),
                             "target_tokens": pd.array([target],
                                                       dtype="int64"),
                             "epochs": pd.array([epochs], dtype="int64")})

    return (ds.map_batches(partial, batch_format="pandas")
              .groupby(group_col).map_groups(combine,
                                             batch_format="pandas"))


def bpe_train(ds, merges: int = 3, num_parts: int = 64):
    """Distributed BPE tokenizer training (Sennrich et al. 2016):
    learn the top-``merges`` byte-pair merges over the corpus, exactly
    as HuggingFace-style trainers do — on the WORD HISTOGRAM, not the
    raw corpus.  Output: one row per learned merge,
    ``(rank, left_sym, right_sym, merged, cnt)``.

    Shape: ONE corpus pass builds the (word, cnt) vocabulary (the
    per-batch value-count partial is the combiner; one coarse
    word-keyed exchange), then each merge round runs over the
    vocab-sized symbol-sequence table: adjacent-pair counts (weighted
    by word count, overlapping pairs counted — the BPE convention)
    combine through a coarse pair-keyed exchange, each partition
    nominates its top-1, the driver picks the max of <= ``num_parts``
    candidates (bounded driver state), the winning pair broadcasts in
    the closure and a vectorized left-to-right non-overlapping string
    replace applies it.  The sequence table re-materializes per round
    (the pagerank/label-propagation trade).

    Exactness contract (mirrored by the SQL twin): symbol sequences
    are space-delimited with sentinel spaces (`` h e l l o ``); merge
    application is TWO passes of the plain substring replace of
    `` a b `` by `` ab `` (left-to-right, non-overlapping).  One pass
    alone skips every other occurrence in a run (the match consumes
    the trailing space the next match needs as its leading space); the
    second pass catches those leftovers, so the pair's merge COUNT
    always equals greedy BPE's.  The segmentation itself equals
    left-to-right greedy except inside runs of a self-pair (a == b) of
    length >= 5, where merge positions may differ — a documented
    variant, identical on both sides.  Ties break (cnt DESC, left
    ASC, right ASC).
    """
    import ray

    def word_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"])
        flat = pd.Series([w for ws in toks for w in ws], dtype="object")
        vc = flat.value_counts()
        out = pd.DataFrame({"word": vc.index.astype("object"),
                            "cnt": vc.to_numpy().astype("int64")})
        out["part"] = coarse_part(out["word"], num_parts)
        return typed_if_empty(out)

    def word_combine(group: pd.DataFrame) -> pd.DataFrame:
        out = (group.groupby("word", sort=False)["cnt"].sum()
               .reset_index())
        out["cnt"] = out["cnt"].astype("int64")
        out["seq"] = out["word"].map(
            lambda w: " " + " ".join(w) + " ")
        return typed_if_empty(out)

    vocab = (ds.map_batches(word_partial, batch_format="pandas")
             .groupby("part").map_groups(word_combine,
                                         batch_format="pandas")
             .materialize())

    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        syms = batch["seq"].str.strip(" ").str.split(" ")
        n = syms.str.len().to_numpy()
        reps = np.maximum(n - 1, 0)
        flat_a, flat_b = [], []
        for s in syms:
            flat_a.extend(s[:-1])
            flat_b.extend(s[1:])
        pairs = pd.DataFrame({
            "a": pd.Series(flat_a, dtype="object"),
            "b": pd.Series(flat_b, dtype="object"),
            "c": np.repeat(batch["cnt"].to_numpy(), reps)})
        out = (pairs.groupby(["a", "b"], sort=False)["c"].sum()
               .reset_index())
        out["c"] = out["c"].astype("int64")
        out["part"] = coarse_part(out["a"] + "\x00" + out["b"],
                                  num_parts)
        return typed_if_empty(out)

    def pair_top1(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["a", "b"], sort=False)["c"].sum()
             .reset_index())
        g["c"] = g["c"].astype("int64")
        g = g.sort_values(["c", "a", "b"],
                          ascending=[False, True, True]).head(1)
        return typed_if_empty(g[["a", "b", "c"]].reset_index(drop=True))

    learned = []
    for rank in range(1, merges + 1):
        cands = (vocab.map_batches(pair_partial, batch_format="pandas")
                 .groupby("part").map_groups(pair_top1,
                                             batch_format="pandas")
                 .to_pandas())
        if not len(cands):
            break
        cands = cands.sort_values(["c", "a", "b"],
                                  ascending=[False, True, True])
        a, b, c = (cands.iloc[0]["a"], cands.iloc[0]["b"],
                   int(cands.iloc[0]["c"]))
        learned.append({"rank": rank, "left_sym": a, "right_sym": b,
                        "merged": a + b, "cnt": c})

        def apply_merge(batch: pd.DataFrame, a=a, b=b) -> pd.DataFrame:
            out = batch.copy()
            pat, rep = f" {a} {b} ", f" {a}{b} "
            out["seq"] = (out["seq"]
                          .str.replace(pat, rep, regex=False)
                          .str.replace(pat, rep, regex=False))
            return out

        vocab = vocab.map_batches(apply_merge,
                                  batch_format="pandas").materialize()

    import pyarrow as pa
    out = pd.DataFrame(learned, columns=["rank", "left_sym",
                                         "right_sym", "merged", "cnt"])
    schema = pa.schema([("rank", pa.int64()), ("left_sym", pa.string()),
                        ("right_sym", pa.string()),
                        ("merged", pa.string()), ("cnt", pa.int64())])
    return pa.Table.from_pandas(out, schema=schema, preserve_index=False)


def zscore_by_group(ds, group_col: str = "source"):
    """Per-group z-score calibration of the whitespace token count —
    how a quality/length signal is made comparable ACROSS sources
    before a global cut (a raw threshold over mixed crawls keeps
    whatever the wordiest source produces).  Output per doc:
    ``(doc_id, group, n_tokens, z_micro)`` with
    ``z_micro = floor(1e6 * (x - mean) / std)`` per group.

    Two streaming passes, no shuffle of doc rows: (1) per-batch
    (group, n, sum, sum_sq) integer partials -> ONE tiny groupby
    (group-count-bounded) -> stats broadcast via ``ray.put``; (2) a
    stateless score pass.  Exactness: the algebra keeps integers as
    long as possible — ``z = (n*x - s1) / sqrt(n*(n*s2 - s1^2))``
    times sqrt(n)... reduced to ``(n*x - s1) / sqrt(n*s2 - s1^2)`` —
    numerator and radicand are EXACT integers, then exactly one
    double multiply, sqrt and divide in a stated order, so the DuckDB
    twin computes bit-identical doubles (the bm25 discipline).  The
    radicand ``n*s2 - s1^2`` is quadratic in corpus size, so it is
    computed per GROUP at the driver in Python ints (arbitrary
    precision — DuckDB's SUM(BIGINT) likewise promotes to HUGEINT);
    int64 would wrap silently past ~1e8 moderate-length docs per
    group.  Groups with zero variance (or a single row) define
    ``z_micro = 0``.  Envelope: the per-row numerator ``n*x`` must
    stay under 2^63 (n = group doc count, x = token count; holds to
    1e12 docs x 9e6 tokens); past 2^53 both engines round num→double
    identically, so bit-parity survives.
    """
    import math

    import ray

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = _tokens(batch["text"]).str.len().astype("int64")
        g = pd.DataFrame({group_col: batch[group_col], "x": x,
                          "x2": x * x})
        out = (g.groupby(group_col, sort=False)
               .agg(n=("x", "size"), s1=("x", "sum"), s2=("x2", "sum"))
               .reset_index())
        return typed_if_empty(out)

    stats = (ds.map_batches(partial, batch_format="pandas")
             .groupby(group_col)
             .sum(["n", "s1", "s2"]).to_pandas())
    stats = stats.rename(columns={"sum(n)": "n", "sum(s1)": "s1",
                                  "sum(s2)": "s2"})

    def _group_stats(r):
        n, s1, s2 = int(r["n"]), int(r["s1"]), int(r["s2"])
        den = n * s2 - s1 * s1          # exact Python ints, no wrap
        sd = math.sqrt(float(den)) if den > 0 else 0.0
        return (n, s1, sd)

    stats_ref = ray.put({r[group_col]: _group_stats(r)
                         for _, r in stats.iterrows()})

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(stats_ref)
        x = _tokens(batch["text"]).str.len().astype("int64")
        n = batch[group_col].map(lambda s: st[s][0]).astype("int64")
        s1 = batch[group_col].map(lambda s: st[s][1]).astype("int64")
        sd = batch[group_col].map(lambda s: st[s][2]).astype("float64")
        num = n * x - s1
        z = np.zeros(len(batch), dtype="int64")
        pos = (sd > 0).to_numpy()
        z[pos] = np.floor(
            (1000000.0 * num[pos].to_numpy()) / sd[pos].to_numpy()
        ).astype("int64")
        return typed_if_empty(pd.DataFrame({
            "doc_id": batch["doc_id"], group_col: batch[group_col],
            "n_tokens": x, "z_micro": z}))

    return ds.map_batches(score, batch_format="pandas")


def quantiles_by_source(ds, q_milli=(250, 500, 750)):
    """Per-source EXACT token-count quantiles without a sort: each
    batch emits a (source, n_tokens, cnt) value-count partial —
    bounded by the token-count grid, not the row count — ONE tiny
    groupby co-locates each source's partials, and the quantile is
    read off the combined cumulative histogram.

    Rank rule (explicit so the SQL oracle can state the identical
    thing with ``row_number()``): the q-quantile is the value at
    1-based sorted position ``ceil(q * n)`` computed in integer math
    as ``(q_milli * n + 999) // 1000`` — no float ever touches the
    rank, so even-count ties agree bit-for-bit across engines.

    Scale: a ``ds.sort`` per source would shuffle the corpus; this
    moves only per-batch histograms (the
    :func:`select_top_quality` trick, here per group instead of
    global).  Output: one row per source with ``n_docs`` and one
    ``p{q_milli}`` column per requested quantile.
    """
    q_milli = tuple(int(q) for q in q_milli)
    if not q_milli or not all(1 <= q <= 1000 for q in q_milli):
        raise ValueError(f"q_milli must be within 1..1000: {q_milli!r}")

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        # NULL source is its own group (SQL GROUP BY semantics):
        # encode it as ("", src_null=True) so the Ray groupby key is
        # never None — "" with src_null=False stays distinct
        src = batch["source"]
        vc = (pd.DataFrame({
                "source": src.fillna(""),
                "src_null": src.isna(),
                "n_tokens": _tokens(batch["text"]).str.len()
                            .astype("int64")})
              .groupby(["source", "src_null", "n_tokens"], sort=False)
              .size().reset_index(name="cnt"))
        vc["cnt"] = vc["cnt"].astype("int64")
        return typed_if_empty(vc)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        h = group.groupby("n_tokens")["cnt"].sum().sort_index()
        n = int(h.sum())
        cum = h.cumsum().to_numpy()
        vals = h.index.to_numpy()
        source = (None if bool(group["src_null"].iloc[0])
                  else group["source"].iloc[0])
        row = {"source": source, "n_docs": n}
        for qm in q_milli:
            rank = (qm * n + 999) // 1000
            row[f"p{qm}"] = int(vals[np.searchsorted(cum, rank)])
        return pd.DataFrame([row])

    return (ds.map_batches(hist, batch_format="pandas")
            .groupby(["source", "src_null"])
            .map_groups(combine, batch_format="pandas"))


def _bigram_codes(texts) -> tuple:
    """Vectorized char-bigram extraction for a whole batch: ONE utf-32
    encode of the sentinel-joined texts -> uint32 codepoint array ->
    adjacent-pair uint64 codes, with pairs crossing the doc sentinel
    masked out.  Returns (codes, doc_index) aligned per bigram.  No
    per-row Python loop touches the characters."""
    joined = "\x00".join(texts)
    if len(joined) < 2:
        return (np.array([], dtype=np.uint64),
                np.array([], dtype=np.int64))
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    codes = (cp[:-1].astype(np.uint64) << np.uint64(32)) | cp[1:]
    # doc/sentinel membership from POSITIONS, not the sentinel's char
    # value — document text may legally contain U+0000 itself
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                       count=len(texts))
    seg = lens + 1
    seg[-1] -= 1                      # no sentinel after the last doc
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), seg)[:-1]
    is_sent = np.zeros(len(cp), dtype=bool)
    if len(texts) > 1:
        is_sent[np.cumsum(lens[:-1] + 1) - 1] = True
    # both ends non-sentinel => same doc (sentinels separate docs)
    valid = ~is_sent[:-1] & ~is_sent[1:]
    return codes[valid], doc_idx[valid]


def lm_score(ds, num_parts: int = 256, scale: int = 1000,
             keep_cols: tuple = ()):
    """CCNet-shaped corpus language-model scoring in two passes:
    TRAIN — distributed char-bigram counting (per-batch vectorized
    ``np.unique`` partials, ONE coarse groupby combine, result bounded
    by the distinct-bigram vocabulary, not the corpus) — then the
    count table is broadcast once via ``ray.put``; SCORE — a stateless
    ``map_batches`` pass computes per-doc mean corpus-frequency of its
    bigrams, normalized by the most frequent bigram:

        lm_milli = floor(scale * sum(cnt[bg]) / (n_bigrams * cmax))

    — a single float division of exact integers, so the SQL oracle
    reproduces it bit for bit.  Docs shorter than 2 chars score 0.

    Honest scope: real CCNet buckets on a KenLM 5-gram perplexity;
    this keeps that pipeline's exact distributed shape (train pass ->
    broadcast model -> score pass, model never reshuffled per batch)
    with a deterministic bigram-frequency kernel standing in for the
    LM, so a real scorer drops into the same two passes.
    """
    import ray

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        codes, _ = _bigram_codes(list(batch["text"].fillna("")))
        u, c = np.unique(codes, return_counts=True)
        out = pd.DataFrame({"code": u.astype("uint64"),
                            "cnt": c.astype("int64")})
        out["part"] = coarse_part(out["code"], num_parts)
        return typed_if_empty(out)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("code", sort=False)["cnt"].sum().reset_index()
        g["cnt"] = g["cnt"].astype("int64")
        return g

    vocab = (ds.map_batches(count_partial, batch_format="pandas")
             .groupby("part").map_groups(combine, batch_format="pandas")
             .to_pandas())
    if len(vocab):
        order = np.argsort(vocab["code"].to_numpy())
        codes_sorted = vocab["code"].to_numpy()[order]
        counts_sorted = vocab["cnt"].to_numpy()[order]
        cmax = int(counts_sorted.max())
    else:
        codes_sorted = np.array([], dtype=np.uint64)
        counts_sorted = np.array([], dtype=np.int64)
        cmax = 1
    model = ray.put((codes_sorted, counts_sorted, cmax))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        codes_s, counts_s, m = ray.get(model)
        texts = list(batch["text"].fillna(""))
        codes, doc_idx = _bigram_codes(texts)
        sc = np.zeros(len(texts), dtype=np.int64)
        nb = np.zeros(len(texts), dtype=np.int64)
        if len(codes):
            if len(codes_s):
                # membership-checked lookup: a bigram outside the
                # trained vocab (nondeterministic upstream re-exec)
                # counts 0 instead of aliasing a neighbor's count
                pos = np.minimum(np.searchsorted(codes_s, codes),
                                 len(codes_s) - 1)
                cnt = np.where(codes_s[pos] == codes, counts_s[pos], 0)
            else:
                cnt = np.zeros(len(codes), dtype=np.int64)
            np.add.at(sc, doc_idx, cnt)
            np.add.at(nb, doc_idx, 1)
        denom = np.maximum(nb, 1) * m
        out = pd.DataFrame({
            "doc_id": batch["doc_id"],
            "lm_milli": np.floor((scale * sc).astype(np.float64)
                                 / denom).astype("int64"),
        })
        for c in keep_cols:     # passthrough (e.g. source for
            out[c] = batch[c]   # downstream per-group bucketing)
        return out

    return ds.map_batches(score, batch_format="pandas")


def _norm_tokens_flat(texts):
    """Normalized token stream for a batch (the ``_NORM`` contract the
    SQL oracles state): lower, ASCII-ws edge-strip, collapse runs to
    single spaces, split on ' '.  Returns ``(doc_index, tokens)``
    aligned per token occurrence."""
    norm = [_WS.sub(" ", _EDGE_WS.sub("", t or "").lower()) for t in texts]
    doc_idx, toks = [], []
    for i, t in enumerate(norm):
        if t:
            ws = t.split(" ")
            doc_idx.extend([i] * len(ws))
            toks.extend(ws)
    return (np.asarray(doc_idx, dtype=np.int64),
            np.asarray(toks, dtype=object))


def _hashed_bucket_counts(texts, num_buckets: int):
    """Per-batch hashed-token feature counts over the
    :func:`_norm_tokens_flat` stream; md5-hash each DISTINCT token once
    (md5 is the only hash both engines compute identically;
    ``np.unique`` bounds the calls by batch vocabulary, not token
    count), bucket = ``h64 % num_buckets``.  Returns
    ``(doc_index, bucket)`` aligned per token occurrence."""
    doc_idx, arr = _norm_tokens_flat(texts)
    if not len(arr):
        return (np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    uniq, inv = np.unique(arr, return_inverse=True)
    bkt_u = np.fromiter(
        (int(hashlib.md5(u.encode()).hexdigest()[:16], 16) % num_buckets
         for u in uniq), dtype=np.int64, count=len(uniq))
    return np.asarray(doc_idx, dtype=np.int64), bkt_u[inv]


def dsir_weights(ds, target_lang: str = "en", num_buckets: int = 64,
                 scale: int = 10_000):
    """DSIR-shaped importance weighting (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling") in the
    canonical two-pass distributed form:

    TRAIN — one ``map_batches`` pass emits per-batch hashed-feature
    count partials ``(bucket, raw_cnt, tgt_cnt)`` (raw = every doc,
    tgt = docs with ``lang == target_lang``), bounded by
    ``num_buckets`` rows per batch; ONE tiny groupby combines them and
    the ≤``num_buckets``-row bucket table lands on the driver, where
    the per-bucket importance weight is fixed on an integer grid:

        w[b] = (scale * (tgt_cnt[b] + 1)) // (raw_cnt[b] + 1)

    (add-one smoothing; ``//`` so DuckDB's integer division states the
    identical value — no float ever touches the weight).  The weight
    array is broadcast ONCE via ``ray.put``.

    SCORE — a stateless ``map_batches`` pass re-hashes each doc's
    tokens and sums bucket weights over token occurrences:

        dsir_weight = sum_t w[bucket(t)]        (exact int64)

    Honest scope: real DSIR uses hashed unigram+bigram counts and a
    log-likelihood-ratio under two bag-of-ngrams models, then Gumbel
    top-k resampling; this keeps the exact distributed shape (feature
    pass -> tiny model on the driver -> broadcast -> score pass, the
    corpus never reshuffled) with an integer ratio kernel standing in
    for the log-ratio so the oracle is bit-exact.  Resampling = feed
    ``dsir_weight`` to :func:`select_top_quality`'s histogram-quantile
    selection.  Scale: only bucket histograms and the ≤64-entry weight
    table cross the wire; both passes are embarrassingly parallel.
    """
    import ray

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        doc_idx, bkt = _hashed_bucket_counts(
            list(batch["text"].fillna("")), num_buckets)
        is_tgt = (batch["lang"] == target_lang).to_numpy()
        raw = np.bincount(bkt, minlength=num_buckets)
        tgt = np.bincount(bkt[is_tgt[doc_idx]], minlength=num_buckets)
        out = pd.DataFrame({
            "bucket": np.arange(num_buckets, dtype=np.int64),
            "raw_cnt": raw.astype("int64"),
            "tgt_cnt": tgt.astype("int64"),
        })
        return typed_if_empty(out[out["raw_cnt"] > 0])

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("bucket", sort=False)[["raw_cnt", "tgt_cnt"]]
             .sum().reset_index())
        return g.astype({"raw_cnt": "int64", "tgt_cnt": "int64"})

    cnts = (ds.map_batches(count_partial, batch_format="pandas")
            .groupby("bucket").map_groups(combine, batch_format="pandas")
            .to_pandas())
    weights = np.zeros(num_buckets, dtype=np.int64)
    # empty buckets score (scale*1)//1 — stated identically in SQL via
    # the left join's coalesce
    weights[:] = scale
    if len(cnts):        # empty corpus -> groupby emits a columnless frame
        for b, r, t in zip(cnts["bucket"], cnts["raw_cnt"],
                           cnts["tgt_cnt"]):
            weights[int(b)] = (scale * (int(t) + 1)) // (int(r) + 1)
    w_ref = ray.put(weights)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(w_ref)
        doc_idx, bkt = _hashed_bucket_counts(
            list(batch["text"].fillna("")), num_buckets)
        n = len(batch)
        s = np.zeros(n, dtype=np.int64)
        nt = np.zeros(n, dtype=np.int64)
        if len(bkt):
            np.add.at(s, doc_idx, w[bkt])
            np.add.at(nt, doc_idx, 1)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": nt,
            "dsir_weight": s,
        })

    return ds.map_batches(score, batch_format="pandas")


def heavy_hitters(ds, k: int = 20, capacity: int = 4096,
                  num_parts: int = 64):
    """Corpus-wide top-``k`` tokens via the two-phase heavy-hitter
    pattern (per-batch bounded summaries -> exact recount), the
    standard way to extract frequent vocabulary from a corpus whose
    FULL vocabulary is too large to shuffle:

    CANDIDATES — each batch counts its tokens exactly (``np.unique``,
    bounded by batch vocabulary) and emits only its top-``capacity``
    tokens — a SpaceSaving/Misra-Gries-shaped bounded summary, so the
    exchange carries <= capacity rows per batch no matter how large
    the batch vocabulary is; ONE coarse groupby sums candidate
    partials and the <= ``capacity`` best candidates land on the
    driver.

    EXACT RECOUNT — the candidate set is broadcast once (``ray.put``);
    a stateless second pass counts ONLY candidate tokens, a tiny
    combine sums them, and the driver takes the final top-k with the
    deterministic tie-break (count DESC, token ASC).

    Reported counts are EXACT (the recount sees every occurrence).
    Top-k membership is exact whenever each true top-k token makes
    some batch's top-``capacity`` — with capacity >> k this holds by
    orders of magnitude on Zipfian text (a token can only miss every
    batch summary if ~capacity distinct tokens out-count it in every
    batch it appears in).  Partition keys use the shared
    ``coarse_part`` hash (stable across processes), never Python's
    per-process-salted ``hash``.  Output: (rank, token, cnt), rank
    1-based.
    """
    import ray

    def _part(tokens) -> np.ndarray:
        return coarse_part(pd.Series(tokens, dtype="object"), num_parts)

    _empty = pd.DataFrame({"token": pd.Series([], dtype="object"),
                           "cnt": pd.Series([], dtype="int64"),
                           "part": pd.Series([], dtype="int64")})

    def candidates(batch: pd.DataFrame) -> pd.DataFrame:
        _, toks = _norm_tokens_flat(list(batch["text"].fillna("")))
        if not len(toks):
            return typed_if_empty(_empty)
        uniq, counts = np.unique(toks, return_counts=True)
        if len(uniq) > capacity:
            top = np.argsort(counts)[::-1][:capacity]
            uniq, counts = uniq[top], counts[top]
        return pd.DataFrame({"token": uniq, "cnt": counts.astype("int64"),
                             "part": _part(uniq)})

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("token", sort=False)["cnt"].sum()
             .reset_index())
        g["cnt"] = g["cnt"].astype("int64")
        if len(g) > capacity:
            # a global top-capacity token is necessarily top-capacity
            # within its part, so capping here cannot change the final
            # candidate set — it bounds the driver collect to
            # num_parts * capacity rows instead of the candidate union
            g = g.sort_values(["cnt", "token"],
                              ascending=[False, True]).head(capacity)
        return g

    cand = (ds.map_batches(candidates, batch_format="pandas")
            .groupby("part").map_groups(combine, batch_format="pandas")
            .to_pandas())
    # final result is driver-assembled (<= capacity rows) — return a
    # pandas frame: schema survives the empty case, which an empty Ray
    # Dataset round-trip would drop
    empty_out = pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                              "token": pd.Series([], dtype="object"),
                              "cnt": pd.Series([], dtype="int64")})
    if not len(cand):
        return empty_out
    cand = cand.sort_values(["cnt", "token"],
                            ascending=[False, True]).head(capacity)
    cand_ref = ray.put(frozenset(cand["token"]))

    def recount(batch: pd.DataFrame) -> pd.DataFrame:
        cands = ray.get(cand_ref)
        _, toks = _norm_tokens_flat(list(batch["text"].fillna("")))
        if not len(toks):
            return typed_if_empty(_empty)
        uniq, counts = np.unique(toks, return_counts=True)
        mask = pd.Series(uniq).isin(cands).to_numpy()
        uniq, counts = uniq[mask], counts[mask]
        return typed_if_empty(pd.DataFrame({
            "token": uniq, "cnt": counts.astype("int64"),
            "part": _part(uniq)}))

    exact = (ds.map_batches(recount, batch_format="pandas")
             .groupby("part").map_groups(combine, batch_format="pandas")
             .to_pandas())
    if not len(exact):
        return empty_out
    top = exact.sort_values(["cnt", "token"],
                            ascending=[False, True]).head(k)
    top = top.reset_index(drop=True)
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top[["rank", "token", "cnt"]]


def inverted_index(ds, min_df: int = 2, max_postings: int = 64,
                   num_parts: int = 256):
    """Distributed inverted index over the corpus: one row per token
    with its document frequency and a capped, ascending posting list
    (comma-joined string so the artifact is hash-comparable and
    SQL-mirrorable).

    Shape: each batch emits its DISTINCT (token, doc_id) pairs — the
    in-batch dedup is the combiner (a doc lives in exactly one batch,
    so pairs are globally distinct after it); ONE exchange keyed by
    ``coarse_part(token) % num_parts`` co-locates each token's postings; the
    group fn counts df, sorts, caps at ``max_postings`` and drops
    tokens below ``min_df``.  The exchange volume IS the index size —
    the irreducible cost of the operator; hapax pruning cannot happen
    earlier because df is only known after the exchange.  Output:
    (token, df, postings).
    """
    return (ds.map_batches(_index_pairs_fn(num_parts),
                           batch_format="pandas")
            .groupby("part").map_groups(
                _index_build_fn(min_df, max_postings),
                batch_format="pandas"))


_EMPTY_TOKEN_PAIRS = pd.DataFrame({
    "token": pd.Series([], dtype="object"),
    "doc_id": pd.Series([], dtype="int64"),
    "part": pd.Series([], dtype="int64")})


def _index_pairs_fn(num_parts: int):
    """Shared (doc text) -> distinct (token, doc_id, part) pair map —
    the combiner stage of :func:`inverted_index`, reused by
    :func:`inverted_index_delta` on changelog winners so the two
    operators tokenize identically by construction."""
    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        doc_idx, toks = _norm_tokens_flat(list(batch["text"].fillna("")))
        if not len(toks):
            return typed_if_empty(_EMPTY_TOKEN_PAIRS)
        ids = batch["doc_id"].to_numpy()[doc_idx]
        p = pd.DataFrame({"token": toks, "doc_id": ids}).drop_duplicates()
        p["doc_id"] = p["doc_id"].astype("int64")
        p["part"] = coarse_part(p["token"], num_parts)
        return p
    return pairs


def _index_build_fn(min_df, max_postings):
    """Shared per-partition posting-list builder (df count, ascending
    sort, cap, hapax prune) for :func:`inverted_index` and the merge
    side of :func:`inverted_index_delta`."""
    def build(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["token", "doc_id"])
        out_tok, out_df, out_post = [], [], []
        for tok, sub in g.groupby("token", sort=False):
            df = len(sub)
            if df < min_df:
                continue
            ids = sub["doc_id"].tolist()[:max_postings]
            out_tok.append(tok)
            out_df.append(df)
            out_post.append(",".join(str(i) for i in ids))
        return typed_if_empty(pd.DataFrame({
            "token": pd.Series(out_tok, dtype="object"),
            "df": pd.Series(out_df, dtype="int64"),
            "postings": pd.Series(out_post, dtype="object")}))
    return build


def inverted_index_delta(base_index_ds, changes_ds, num_parts: int = 256):
    """Incremental inverted-index maintenance — apply a CDC changelog
    (the :func:`doc_ocr_ray.stages.catalog.apply_changelog` event
    shape) to a persisted FULL index without rebuilding it: the
    Lucene segment-merge discipline collapsed to one compaction pass.

    ``base_index_ds``: (token, df, postings) built UNCAPPED and
    unpruned (``inverted_index(snapshot, min_df=1,
    max_postings=None)``) — the maintainable artifact.  A capped or
    min_df-pruned index is LOSSY (a tombstone on a capped posting
    list cannot reveal the 65th doc).  Capping is DETECTED and
    refused loudly (per-row ``df == len(postings)`` check); min_df
    pruning is NOT detectable from the artifact (a pruned hapax row
    is simply absent, indistinguishable from a token that never
    occurred) — feeding a pruned base silently loses its pruned
    postings, so ``min_df=1`` at build time is the caller's contract.
    Capping and hapax pruning are query-time views over this
    artifact.

    ``changes_ds``: (doc_id, text, ts, seq, op) with op in
    {'upsert', 'delete'} — (ts, seq) total order, exactly the
    ``apply_changelog`` contract.

    Output: the new full index, byte-equal to
    ``inverted_index(apply_changelog(snapshot, changes), min_df=1,
    max_postings=None)`` — the rebuild it replaces.

    Scale shape (why this beats the rebuild): the rebuild re-ships
    every (token, doc) pair of the corpus through the token exchange;
    here the only exchanges are DELTA-sized —
      1. changelog winner resolution (one coarse key exchange over
         change rows only),
      2. the merge exchange, which carries new-winner pairs plus the
         postings of AFFECTED tokens only (tokens occurring in winner
         texts).  Honest cost note: a stopword token touched by any
         changed doc re-ships its full posting list — inherent to
         exact df maintenance.
    Everything else is shuffle-free: changed doc ids (delta-sized)
    and the affected-token vocabulary (delta-vocab-sized) broadcast
    once via ``ray.put`` (the ``decontaminate`` trade, bound stated
    there), and the base index streams through stateless tombstone
    filtering — unaffected tokens never enter an exchange.  The base
    is consumed by TWO map_batches consumers; pass it materialized
    (or as a persisted parquet read) so the upstream isn't re-run.
    """
    import ray

    from doc_ocr_ray.stages.catalog import (changelog_resolve,
                                            changelog_tag_fn)

    # the changelog is consumed twice (winner resolution + tombstone
    # collection) and is delta-sized — materialize the tagged form
    # ONCE so an unmaterialized upstream (e.g. a parquet scan + event
    # derivation) isn't re-executed.  Validation (op whitelist,
    # non-negative ts/seq) is apply_changelog's own tag fn, so the
    # two operators accept exactly the same changelogs.
    tagged = (changes_ds.map_batches(changelog_tag_fn(num_parts),
                                     batch_format="pandas")
              .materialize())
    winners = (tagged.groupby("part")
               .map_groups(changelog_resolve, batch_format="pandas"))

    # winner texts tokenize through inverted_index's OWN pair map, so
    # delta and rebuild agree by construction; new_pairs feeds both
    # the affected-vocab collection and the merge union — materialize
    # once (delta-sized).
    new_pairs = (winners.map_batches(_index_pairs_fn(num_parts),
                                     batch_format="pandas")
                 .materialize())

    # delta-sized driver state, broadcast once: every changed key is a
    # tombstone; every token of a winner text is an affected token
    tomb = sorted({int(r["doc_id"]) for r in
                   tagged.select_columns(["doc_id"]).take_all()})
    affected = set()
    for b in new_pairs.select_columns(["token"]).iter_batches(
            batch_format="pandas"):
        affected.update(b["token"].tolist())
    bcast = ray.put((np.asarray(tomb, dtype=np.int64),
                     frozenset(affected)))

    def _split_base(batch: pd.DataFrame):
        """One vectorized tombstone pass over base rows: returns
        (kept-postings flat arrays per row, affected mask)."""
        tomb_arr, aff = ray.get(bcast)
        n = len(batch)
        counts = batch["df"].to_numpy(dtype=np.int64)
        if n:
            posts = batch["postings"].astype(str)
            # per-row lossless-base guard: a capped row has fewer
            # postings than df (batch-level sums could compensate)
            if (posts.str.count(",").to_numpy() + 1 != counts).any():
                raise ValueError(
                    "inverted_index_delta requires an UNCAPPED base "
                    "index (df == len(postings) on every row); build "
                    "it with min_df=1, max_postings=None")
            flat = np.array(",".join(posts.to_numpy()).split(","),
                            dtype=np.int64)
            row_idx = np.repeat(np.arange(n), counts)
            keep = ~np.isin(flat, tomb_arr)
        else:
            flat = np.array([], dtype=np.int64)
            row_idx = np.array([], dtype=np.int64)
            keep = np.array([], dtype=bool)
        aff_mask = batch["token"].isin(aff).to_numpy()
        return flat, row_idx, keep, aff_mask

    _empty_final = pd.DataFrame({
        "token": pd.Series([], dtype="object"),
        "df": pd.Series([], dtype="int64"),
        "postings": pd.Series([], dtype="object")})

    def finals(batch: pd.DataFrame) -> pd.DataFrame:
        # unaffected tokens: tombstone-filter in place, emit directly
        # — NO exchange; rows losing every posting drop.  The dominant
        # untouched rows pass through as ONE frame slice; only rows a
        # tombstone actually hit re-join their posting strings.
        flat, row_idx, keep, aff_mask = _split_base(batch)
        n = len(batch)
        new_cnt = np.bincount(row_idx[keep], minlength=n)
        changed = new_cnt != batch["df"].to_numpy(dtype=np.int64)
        emit = ~aff_mask & (new_cnt > 0)
        passthru = batch.loc[emit & ~changed,
                             ["token", "df", "postings"]]
        parts = [_empty_final, passthru]
        rejoin = np.nonzero(emit & changed)[0]
        if len(rejoin):
            kept_flat = flat[keep]
            starts = np.concatenate(([0], np.cumsum(new_cnt)))
            toks = batch["token"].to_numpy()
            parts.append(pd.DataFrame({
                "token": toks[rejoin],
                "df": new_cnt[rejoin].astype("int64"),
                "postings": [
                    ",".join(str(v) for v in
                             kept_flat[starts[i]:starts[i + 1]])
                    for i in rejoin]}))
        out = pd.concat(parts, ignore_index=True)
        out["df"] = out["df"].astype("int64")
        return typed_if_empty(out)

    def affected_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        # affected tokens: their SURVIVING base postings enter the
        # merge exchange as pairs alongside the new-winner pairs
        flat, row_idx, keep, aff_mask = _split_base(batch)
        sel = keep & aff_mask[row_idx]
        if not sel.any():
            return typed_if_empty(_EMPTY_TOKEN_PAIRS)
        toks = batch["token"].to_numpy()[row_idx[sel]]
        p = pd.DataFrame({"token": toks,
                          "doc_id": flat[sel].astype(np.int64)})
        p["part"] = coarse_part(p["token"], num_parts)
        return p

    merged = (base_index_ds.map_batches(affected_pairs,
                                        batch_format="pandas")
              .union(new_pairs)
              .groupby("part").map_groups(
                  _index_build_fn(1, None), batch_format="pandas"))
    return base_index_ds.map_batches(
        finals, batch_format="pandas").union(merged)


def chunk_documents(ds, chunk_tokens: int = 64, stride: int = 48):
    """Fixed-size token-window chunking with overlap — the standard
    RAG / training-prep doc splitter — over the normalized token
    stream (the ``_NORM`` contract).  Stateless flat ``map_batches``,
    NO shuffle; output size == chunk count, the irreducible cost.

    Chunk ``i`` starts at ``i * stride`` (every multiple strictly
    below the doc's token count) and covers up to ``chunk_tokens``
    tokens, so consecutive chunks overlap by ``chunk_tokens - stride``
    and the tail chunk may be short.  The per-chunk string join is the
    dominant work and is inherently per-chunk; the tokenization feeding
    it is the shared vectorized helper.  Output: (doc_id, chunk_id,
    n_tokens, chunk).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    _empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "chunk_id": pd.Series([], dtype="int64"),
        "n_tokens": pd.Series([], dtype="int64"),
        "chunk": pd.Series([], dtype="object")})

    def chunk(batch: pd.DataFrame) -> pd.DataFrame:
        doc_idx, toks = _norm_tokens_flat(list(batch["text"].fillna("")))
        if not len(toks):
            return typed_if_empty(_empty)
        ids = batch["doc_id"].to_numpy()
        counts = np.bincount(doc_idx, minlength=len(batch))
        out_doc, out_cid, out_n, out_txt = [], [], [], []
        pos = 0
        for i in range(len(batch)):
            n = int(counts[i])
            if n == 0:
                continue
            t = toks[pos:pos + n]
            pos += n
            for cid, start in enumerate(range(0, n, stride)):
                piece = t[start:start + chunk_tokens]
                out_doc.append(ids[i])
                out_cid.append(cid)
                out_n.append(len(piece))
                out_txt.append(" ".join(piece))
        return typed_if_empty(pd.DataFrame({
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "chunk_id": pd.Series(out_cid, dtype="int64"),
            "n_tokens": pd.Series(out_n, dtype="int64"),
            "chunk": pd.Series(out_txt, dtype="object")}))

    return ds.map_batches(chunk, batch_format="pandas")


def bm25_search(ds, query_tokens, k: int = 10, k1: float = 1.2,
                b: float = 0.75, scale: float = 1_000_000.0):
    """BM25 ranked retrieval (Robertson/Sparck Jones; the Lucene
    ``ln(1 + (N-df+0.5)/(df+0.5))`` idf) for a fixed token query over
    the corpus.  Two streaming passes, NO shuffle:

    STATS — each batch emits ONE partial row (n_docs, total_dl, df per
    query term); the driver sums num_batches rows.  SCORE — the ≤
    len(query) idf values plus avgdl ride the closure (bytes, not a
    broadcast table); each batch scores its matching docs vectorized
    (``np.bincount`` tf/dl) and emits only its local top-``k``; the
    driver merges num_batches * k candidate rows.

    Per-term scores are fixed on the integer micro grid
    (``floor(scale * term)``) and SUMMED AS INTEGERS, so the total is
    independent of term association order — the property that lets a
    SQL oracle reproduce the exact hash (floats summed in SQL group
    order would not).  numpy and DuckDB ``ln``/arithmetic on doubles
    are bit-identical for the shared formula (verified on this
    platform); every expression below is written in the same
    association order as the oracle SQL.  Output: (rank, doc_id,
    score_micro), rank 1-based by score DESC then doc_id ASC.
    """
    terms = sorted(set(query_tokens))
    m = len(terms)
    df_cols = [f"df_{i}" for i in range(m)]

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        doc_idx, toks = _norm_tokens_flat(list(batch["text"].fillna("")))
        row = {"n_docs": np.int64(len(batch)),
               "total_dl": np.int64(len(toks))}
        for i, t in enumerate(terms):
            hit = doc_idx[toks == t] if len(toks) else doc_idx
            row[df_cols[i]] = np.int64(len(np.unique(hit)))
        return pd.DataFrame([row])

    agg = ds.map_batches(stats, batch_format="pandas").to_pandas().sum()
    n_docs = int(agg["n_docs"])
    total_dl = int(agg["total_dl"])
    empty_out = pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                              "doc_id": pd.Series([], dtype="int64"),
                              "score_micro": pd.Series([], dtype="int64")})
    if total_dl == 0 or n_docs == 0:
        return empty_out
    avgdl = np.float64(total_dl) / np.float64(n_docs)
    # idf in the oracle's association order: ((N - df) + 0.5)/(df + 0.5) + 1
    idf = {t: np.log(((np.float64(n_docs - int(agg[df_cols[i]])) + 0.5)
                      / (np.float64(int(agg[df_cols[i]])) + 0.5)) + 1.0)
           for i, t in enumerate(terms) if int(agg[df_cols[i]]) > 0}

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        doc_idx, toks = _norm_tokens_flat(list(batch["text"].fillna("")))
        n = len(batch)
        z = typed_if_empty(pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "score_micro": pd.Series([], dtype="int64")}))
        if not len(toks) or not idf:
            return z
        dl = np.bincount(doc_idx, minlength=n).astype(np.float64)
        dlnorm = k1 * ((1.0 - b) + b * (dl / avgdl))
        total = np.zeros(n, dtype=np.int64)
        matched = np.zeros(n, dtype=bool)
        for t, w in idf.items():
            tf = np.bincount(doc_idx[toks == t],
                             minlength=n).astype(np.float64)
            hit = tf > 0
            if not hit.any():
                continue
            term = w * ((tf[hit] * (k1 + 1.0)) / (tf[hit] + dlnorm[hit]))
            total[hit] += np.floor(scale * term).astype(np.int64)
            matched |= hit
        if not matched.any():
            return z
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy()[matched].astype("int64"),
            "score_micro": total[matched]})
        return (out.sort_values(["score_micro", "doc_id"],
                                ascending=[False, True]).head(k))

    cand = ds.map_batches(score, batch_format="pandas").to_pandas()
    if not len(cand):
        return empty_out
    top = (cand.sort_values(["score_micro", "doc_id"],
                            ascending=[False, True])
           .head(k).reset_index(drop=True))
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top[["rank", "doc_id", "score_micro"]]


# ------------------------------------------------ boilerplate templates
def boilerplate_prefixes(ds, k: int = 3, min_frac: float = 0.2,
                         num_partitions: int = 128):
    """Per-source template-prefix detection — the corpus-level
    boilerplate signal behind "HTML boilerplate strip": site templates
    and OCR page headers repeat their leading tokens across a source's
    documents.  A document's ``k``-token prefix is a TEMPLATE iff at
    least two docs of its source share it AND it covers >= ``min_frac``
    of the source's documents (fraction on the shared
    floor(10000*num/den)/10000 grid, so the boundary compare is
    engine-identical).  Output per doc: ``(doc_id, source, prefix,
    n_source, n_prefix, prefix_frac, is_template)`` — a downstream
    strip pass filters ``is_template`` rows or cuts the prefix.

    ONE coarse source-keyed exchange; both counts are window
    transforms inside the group (all sources of a partition handled
    in one frame).  Only (doc_id, source, prefix) rides the shuffle —
    never the text."""

    def pfx(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"])
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "prefix": toks.map(lambda ws: " ".join(ws[:k])),
            "part": coarse_part(batch["source"], num_partitions),
        })

    def flag(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns=["part"]).copy()
        g["n_source"] = (g.groupby("source", sort=False)["doc_id"]
                         .transform("size").astype("int64"))
        g["n_prefix"] = (g.groupby(["source", "prefix"], sort=False)
                         ["doc_id"].transform("size").astype("int64"))
        g["prefix_frac"] = (np.floor(10000.0 * g["n_prefix"]
                                     / g["n_source"]) / 10000)
        g["is_template"] = ((g["n_prefix"] >= 2)
                            & (g["prefix_frac"] >= min_frac))
        return typed_if_empty(g.reset_index(drop=True))

    return (ds.map_batches(pfx, batch_format="pandas")
            .groupby("part").map_groups(flag, batch_format="pandas"))


# ------------------------------------------------ source-salient terms
def source_salient_terms(ds, k: int = 5, num_partitions: int = 128):
    """Per-source characteristic vocabulary — the domain-profiling
    step of corpus curation (what makes a crawl domain's language
    distinctive): for every source, the top ``k`` tokens by the ratio
    of within-source rate to corpus rate, as the exact integer
    ``score = (10^6 * cnt_sw * T) // (tok_s * cnt_w)`` (parts-per-
    million lift; Python-int math in the group so web-scale counts
    cannot silently wrap — the final int64 cast raises instead).

    Two coarse exchanges, both on combiner-shrunk (source, token,
    cnt) rows — never texts: the token-keyed one attaches each
    token's corpus count (all occurrences of a token co-locate), the
    source-keyed one derives per-source totals IN the group (every
    token of a source arrives there), scores, and ranks.  The corpus
    total T is the only driver-side scalar.  Output: (source, rank,
    token, cnt_sw, cnt_w, score), score DESC / token ASC tie-break."""

    def count_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"])
        n = toks.str.len().to_numpy()
        flat = pd.DataFrame({
            "source": batch["source"].repeat(n).to_numpy(),
            "token": [w for ws in toks for w in ws]})
        if flat.empty:
            return typed_if_empty(pd.DataFrame({
                "source": pd.Series([], dtype="object"),
                "token": pd.Series([], dtype="object"),
                "cnt": pd.Series([], dtype="int64"),
                "tpart": pd.Series([], dtype="int64")}))
        c = (flat.groupby(["source", "token"], sort=False).size()
             .rename("cnt").reset_index())
        c["cnt"] = c["cnt"].astype("int64")
        c["tpart"] = coarse_part(c["token"], num_partitions)
        return c

    # materialized once: both T and the token exchange consume it —
    # lazy lineage would re-run the tokenize pass twice
    counts = ds.map_batches(count_tokens,
                            batch_format="pandas").materialize()
    T = int(counts.sum("cnt"))

    def token_group(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["source", "token"], sort=False)["cnt"]
             .sum().rename("cnt_sw").reset_index())
        g["cnt_sw"] = g["cnt_sw"].astype("int64")
        g["cnt_w"] = (g.groupby("token", sort=False)["cnt_sw"]
                      .transform("sum").astype("int64"))
        g["spart"] = coarse_part(g["source"], num_partitions)
        return g

    def source_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns=["spart"]).copy()
        tok_s = g.groupby("source", sort=False)["cnt_sw"].transform("sum")
        num = g["cnt_sw"].astype(object) * (1_000_000 * T)
        den = tok_s.astype(object) * g["cnt_w"].astype(object)
        g["score"] = (num // den).astype("int64")
        g = g.sort_values(["source", "score", "token"],
                          ascending=[True, False, True], kind="mergesort")
        g["rank"] = (g.groupby("source", sort=False).cumcount()
                     + 1).astype("int64")
        g = g[g["rank"] <= k]
        return (g[["source", "rank", "token", "cnt_sw", "cnt_w",
                   "score"]].reset_index(drop=True))

    return (counts.groupby("tpart")
            .map_groups(token_group, batch_format="pandas")
            .groupby("spart")
            .map_groups(source_group, batch_format="pandas"))


# lines come from a chr(10) split, so the edge class here EXCLUDES \n
# (the oracle whitespace contract applied per line)
_LINE_EDGE = re.compile(r"^[\t\f\r ]+|[\t\f\r ]+$")
_ALPHA = re.compile(r"[A-Za-z]")


def _line_table(text: pd.Series):
    """Explode ``text`` into a per-line view: (row index into the
    batch, edge-stripped line).  Shared by the Gopher and C4 filters —
    one split, vectorized str kernels, no per-row Python loop."""
    lines = text.str.split("\n")
    n_lines = lines.str.len().astype("int64")
    idx = np.repeat(np.arange(len(text)), n_lines.to_numpy())
    flat = pd.Series([ln for ls in lines for ln in ls], dtype="object")
    flat = flat.str.replace(_LINE_EDGE, "", regex=True)
    return idx, flat, n_lines


def gopher_filter_batch(batch: pd.DataFrame, min_words: int = 50,
                        max_words: int = 100_000) -> pd.DataFrame:
    """Gopher-style composite quality rules (Rae et al. 2021, table A1)
    — the standard web-corpus document filter.  Per doc: word-count
    bounds, mean word length in [3,10], symbol-to-word ratio (# and
    non-overlapping "...") < 0.1, < 90% bullet-starting lines, < 30%
    ellipsis-ending lines, >= 80% words containing an ASCII letter,
    >= 2 distinct English stopwords present.

    Every ratio test is a CROSS-MULTIPLIED integer comparison
    (``10*sym < n_words`` etc.) — no division ever happens, so the
    DuckDB twin is trivially bit-exact and no rounding-grid discipline
    is needed.  Flags ship as int64 0/1 per rule plus the composite
    ``keep``; stateless map, no shuffle.
    """
    text = batch["text"].fillna("")
    toks = _tokens(text)
    n_words = toks.str.len().astype("int64")
    n_nonspace = (text.str.replace(_WS, "", regex=True)
                  .str.len().astype("int64"))
    n_hash = text.str.count("#").astype("int64")
    # replace-then-measure == non-overlapping left-to-right count,
    # the same semantics as SQL replace()
    n_ellipsis = ((text.str.len()
                   - text.str.replace("...", "", regex=False).str.len())
                  // 3).astype("int64")
    idx, flat, n_lines = _line_table(text)
    bullet = flat.str.match(r"[-*•]").to_numpy()
    ell = flat.str.endswith("...").to_numpy()
    n_bullet = np.bincount(idx, weights=bullet,
                           minlength=len(batch)).astype("int64")
    n_ell = np.bincount(idx, weights=ell,
                        minlength=len(batch)).astype("int64")
    # per-token scans (bounded by doc length, same shape as the
    # stopword ratio in quality_score_batch)
    n_alpha = toks.map(
        lambda ws: sum(1 for w in ws if _ALPHA.search(w))).astype("int64")
    n_stop = toks.map(
        lambda ws: len(STOPWORDS["en"].intersection(
            w.lower() for w in ws))).astype("int64")

    flags = {
        "wc_ok": (n_words >= min_words) & (n_words <= max_words),
        "mwl_ok": (3 * n_words <= n_nonspace)
                  & (n_nonspace <= 10 * n_words),
        "sym_ok": 10 * (n_hash + n_ellipsis) < n_words,
        "bullet_ok": 10 * n_bullet < 9 * n_lines.to_numpy(),
        "ellipsis_ok": 10 * n_ell < 3 * n_lines.to_numpy(),
        "alpha_ok": 5 * n_alpha >= 4 * n_words,
        "stop_ok": n_stop >= 2,
    }
    out = pd.DataFrame({"doc_id": batch["doc_id"],
                        "n_words": n_words})
    keep = np.ones(len(batch), dtype=bool)
    for name, f in flags.items():
        arr = np.asarray(f, dtype=bool)
        out[name] = arr.astype("int64")
        keep &= arr
    out["keep"] = keep.astype("int64")
    return typed_if_empty(out)


def c4_filter_batch(batch: pd.DataFrame,
                    min_sentences: int = 3) -> pd.DataFrame:
    """C4-style line/document cleaning (Raffel et al. 2020): keep only
    lines that end in terminal punctuation (``.!?"``) AND have >= 5
    words; drop documents with fewer than ``min_sentences`` kept
    lines, containing "lorem ipsum" (case-insensitive), or containing
    a ``{`` (code).  Output per doc: kept-line count, the rebuilt
    ``clean_text`` (edge-stripped kept lines joined by newline), the
    two blocklist flags, and the composite ``keep`` — every row
    retained so the decision is auditable (filter on keep==1
    downstream).  Stateless map, no shuffle; the line explode is one
    vectorized split."""
    text = batch["text"].fillna("")
    idx, flat, _ = _line_table(text)
    words = np.where(flat.to_numpy() == "", 0,
                     flat.str.count(_WS).to_numpy() + 1)
    kept = (flat.str.endswith((".", "!", "?", '"')).to_numpy()
            & (words >= 5))
    n_kept = np.bincount(idx, weights=kept,
                         minlength=len(batch)).astype("int64")
    kl = pd.DataFrame({"idx": idx[kept],
                       "line": flat.to_numpy()[kept]})
    joined = (kl.groupby("idx", sort=True)["line"].agg("\n".join)
              .reindex(np.arange(len(batch)), fill_value=""))
    has_lorem = (text.str.lower()
                 .str.contains("lorem ipsum", regex=False).to_numpy())
    has_brace = text.str.contains("{", regex=False).to_numpy()
    keep = (n_kept >= min_sentences) & ~has_lorem & ~has_brace
    return typed_if_empty(pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_kept_lines": n_kept,
        "has_lorem": has_lorem.astype("int64"),
        "has_brace": has_brace.astype("int64"),
        "keep": keep.astype("int64"),
        "clean_text": joined.to_numpy(),
    }))


def ccnet_buckets(ds, group_col: str = "source"):
    """CCNet-style head/middle/tail tertile bucketing of the LM score
    per source (Wenzek et al. 2020) — the standard way a crawl corpus
    is stratified by LM naturalness before sampling.  Output per doc:
    ``(doc_id, group, lm_milli, bucket)`` where ``head`` is the
    best-scoring third of its source, ``middle`` the next, ``tail``
    the rest.

    Thresholds are VALUES AT RANK in the per-source descending score
    multiset — rank1 = ``(n+2)//3``, rank2 = ``(2n+2)//3`` (1-based
    ceil thirds in pure integer math) — computed from per-batch
    ``(group, lm_milli, cnt)`` histogram partials, so only value
    counts ride the one tiny groupby (the quantiles_by_source shape);
    docs tied with a threshold value take the better bucket, which
    makes the rule order-free and lets the SQL twin state it with a
    plain ``row_number``.  The score pass streams twice (histogram,
    then assignment with the ≤|sources| threshold table broadcast via
    ``ray.put``) — the CCNet trade: re-scoring a pruned (doc_id,
    group, text) projection beats materializing per-doc scores for a
    10^12-doc corpus.
    """
    import ray

    scored = lm_score(ds, keep_cols=(group_col,))

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        g = (batch.groupby([group_col, "lm_milli"], sort=False).size()
             .rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype("int64")
        return typed_if_empty(g)

    def thresholds(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("lm_milli", sort=False)["cnt"].sum()
             .sort_index(ascending=False))
        cum = g.cumsum().to_numpy()
        n = int(cum[-1])
        r1, r2 = (n + 2) // 3, (2 * n + 2) // 3
        return pd.DataFrame({
            group_col: [group[group_col].iloc[0]],
            "t1": [int(g.index[np.searchsorted(cum, r1)])],
            "t2": [int(g.index[np.searchsorted(cum, r2)])]})

    stats = (scored.map_batches(hist, batch_format="pandas")
             .groupby(group_col)
             .map_groups(thresholds, batch_format="pandas")
             .to_pandas())
    ref = ray.put({r[group_col]: (int(r["t1"]), int(r["t2"]))
                   for _, r in stats.iterrows()})

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref)
        lm = batch["lm_milli"].to_numpy()
        t1 = batch[group_col].map(lambda s: t[s][0]).to_numpy()
        t2 = batch[group_col].map(lambda s: t[s][1]).to_numpy()
        return typed_if_empty(pd.DataFrame({
            "doc_id": batch["doc_id"],
            group_col: batch[group_col],
            "lm_milli": batch["lm_milli"],
            "bucket": np.where(lm >= t1, "head",
                               np.where(lm >= t2, "middle", "tail")),
        }))

    return scored.map_batches(assign, batch_format="pandas")


def phrase_blocklist_batch(batch: pd.DataFrame,
                           phrases: tuple = ("lorem ipsum",
                                             "click here",
                                             "all rights reserved"),
                           ) -> pd.DataFrame:
    """C4-style phrase-blocklist scoring: per doc, total occurrence
    count over a fixed phrase list (case-insensitive, per-phrase
    non-overlapping left-to-right — the replace() counting semantics,
    identical in pandas str.count and SQL length arithmetic) and
    ``keep`` = no hits.  Counts are summed PER PHRASE, not over an
    alternation, so two phrases overlapping each other in the text
    both count — the order-free definition both engines state
    identically.  Stateless map, no shuffle; k str passes for k
    phrases (k is a small constant)."""
    low = batch["text"].fillna("").str.lower()
    n_hits = np.zeros(len(batch), dtype="int64")
    for p in phrases:
        n_hits += low.str.count(re.escape(p.lower())).to_numpy()
    return typed_if_empty(pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_hits": n_hits,
        "keep": (n_hits == 0).astype("int64")}))


def char_entropy_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Character-distribution Shannon entropy — the cheap gibberish /
    encoding-junk detector (binary blobs and key-mash score near the
    uniform max; natural text sits in a narrow band).  Definition is
    DELIBERATELY integer-gridded so both engines are bit-exact despite
    float logs:

        ent_micro = floor(1e6*ln(n)) - (sum_c floor(1e6*c_i*ln(c_i))) // n

    over per-codepoint counts ``c_i`` (n = total chars; empty docs
    score 0).  Each per-character term is floored to int64 BEFORE the
    sum, so summation order cannot perturb the result (the bm25
    integer-micro-grid discipline; ln itself is libm on both sides,
    parity verified there).  Vectorized: one codepoint decode + one
    np.unique per doc group, no per-char Python."""
    texts = batch["text"].fillna("")
    ent = np.zeros(len(batch), dtype="int64")
    joined = "\x00".join(texts) if len(texts) else ""
    if joined:
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        lens = texts.str.len().to_numpy()
        doc_idx = np.repeat(np.arange(len(texts)),
                            np.where(np.arange(len(texts))
                                     < len(texts) - 1,
                                     lens + 1, lens))
        # per (doc, codepoint) counts in one unique over a packed key;
        # documents may legally contain U+0000 — exclude only the
        # separators by POSITION
        sep_pos = np.cumsum(lens[:-1] + 1) - 1 if len(texts) > 1 else \
            np.array([], dtype=np.int64)
        keep_mask = np.ones(len(cp), dtype=bool)
        keep_mask[sep_pos] = False
        key = (doc_idx[keep_mask].astype(np.uint64) << np.uint64(32)) \
            | cp[keep_mask].astype(np.uint64)
        uk, cnt = np.unique(key, return_counts=True)
        term = np.floor(1e6 * cnt * np.log(cnt)).astype(np.int64)
        docs_of_key = (uk >> np.uint64(32)).astype(np.int64)
        s = np.zeros(len(texts), dtype=np.int64)
        np.add.at(s, docs_of_key, term)
        n = np.maximum(lens, 1)
        ent = (np.floor(1e6 * np.log(n)).astype(np.int64)
               - s // n)
        ent[lens == 0] = 0
    return typed_if_empty(pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_chars": texts.str.len().astype("int64"),
        "ent_micro": ent}))


def script_profile_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-document character-class census — the script-routing signal
    (lang_id tells you the winner; this tells you the mix, e.g.
    code-heavy or digit-heavy docs inside a nominally-English crawl).
    Output: ``(doc_id, n_chars, n_latin, n_digit, n_cjk, n_ws,
    n_other)`` — pure integer counts, so cross-engine parity needs no
    rounding grid at all.  Classes: ASCII letters, ASCII digits, CJK
    U+4E00..U+9FFF (the lang_id class), the oracle whitespace class,
    rest.  One utf-32 decode + vectorized range masks + one bincount
    per class; no per-char Python."""
    texts = batch["text"].fillna("")
    n = len(texts)
    lens = texts.str.len().to_numpy() if n else np.array([], "int64")
    counts = {k: np.zeros(n, dtype="int64")
              for k in ("n_latin", "n_digit", "n_cjk", "n_ws")}
    joined = "\x00".join(texts) if n else ""
    if joined:
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        doc_idx = np.repeat(np.arange(n),
                            np.where(np.arange(n) < n - 1,
                                     lens + 1, lens))
        keep = np.ones(len(cp), dtype=bool)
        if n > 1:   # separators by POSITION (text may contain U+0000)
            keep[np.cumsum(lens[:-1] + 1) - 1] = False
        cp, doc_idx = cp[keep], doc_idx[keep]
        masks = {
            "n_latin": ((cp >= 65) & (cp <= 90))
                       | ((cp >= 97) & (cp <= 122)),
            "n_digit": (cp >= 48) & (cp <= 57),
            "n_cjk": (cp >= 0x4E00) & (cp <= 0x9FFF),
            "n_ws": np.isin(cp, (9, 10, 12, 13, 32)),
        }
        for k, m in masks.items():
            counts[k] = np.bincount(doc_idx, weights=m,
                                    minlength=n).astype("int64")
    out = pd.DataFrame({"doc_id": batch["doc_id"],
                        "n_chars": lens.astype("int64")})
    for k in ("n_latin", "n_digit", "n_cjk", "n_ws"):
        out[k] = counts[k]
    out["n_other"] = (out["n_chars"] - out["n_latin"] - out["n_digit"]
                      - out["n_cjk"] - out["n_ws"]).astype("int64")
    return typed_if_empty(out)


def dup_line_signals_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher's remaining repetition rule: WITHIN-document duplicate
    lines (repetition_signals covers type-token ratio / top bigram,
    dup_ngram_frac the n-gram fractions).  A line is a duplicate if an
    EARLIER line of the same document is byte-identical after edge
    strip; empty lines don't count.  Output: ``(doc_id, n_lines,
    n_dup_lines, dup_line_chars)`` — pure integers (the standard cut
    drops docs where dup_line_chars/total or n_dup/n exceeds a
    threshold; both derive from these counts).  One vectorized line
    explode + one (doc, line) duplicated() scan, no shuffle."""
    text = batch["text"].fillna("")
    idx, flat, n_lines = _line_table(text)
    nonempty = flat.to_numpy() != ""
    df = pd.DataFrame({"idx": idx, "line": flat})
    dup = df.duplicated(["idx", "line"]).to_numpy() & nonempty
    n_dup = np.bincount(idx, weights=dup,
                        minlength=len(batch)).astype("int64")
    chars = np.where(dup, flat.str.len().to_numpy(), 0)
    dup_chars = np.bincount(idx, weights=chars,
                            minlength=len(batch)).astype("int64")
    return typed_if_empty(pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_lines": n_lines.to_numpy(),
        "n_dup_lines": n_dup,
        "dup_line_chars": dup_chars}))


def normalize_unicode_batch(batch: pd.DataFrame,
                            form: str = "NFC") -> pd.DataFrame:
    """doc_id, norm_text, changed — Unicode normalization of the text
    column: corpus canonicalization run BEFORE any hashing/dedup stage
    so visually identical strings with different codepoint sequences
    (decomposed accents, ligature forms from PDF extraction) collide.
    NFC is the oracle-checked default — DuckDB ``nfc_normalize`` ==
    Python ``unicodedata.normalize`` bit for bit (verified on
    combining marks, ligatures, width forms).  NFKC/NFD/NFKD are
    available engine-side (DuckDB has no kernel to twin them).

    Deliberately NOT ``pyarrow.compute.utf8_normalize``: pyarrow
    16.1's ``form='NFC'`` emits DECOMPOSED output (é -> e+U+0301), so
    the "vectorized" kernel would diverge from both the oracle and
    Python.  ``unicodedata.normalize`` is a per-row call but C-level
    per string; NULL text normalizes from '' like the dedup
    normalizers."""
    import unicodedata
    text = batch["text"].fillna("")
    norm = text.map(lambda s: unicodedata.normalize(form, s))
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "norm_text": norm,
        "changed": (norm != text).astype("int64")})


def ntile_by_group(ds, tiles: int = 4, group_col: str = "source",
                   num_partitions: int = 64):
    """Distributed NTILE: equal-COUNT quantile buckets of the
    whitespace token count per group — SQL ``ntile(k) OVER
    (PARTITION BY group ORDER BY n_tokens, doc_id)`` semantics
    exactly, including the tie rule (the doc_id tie-break makes the
    order total, so bucket boundaries cut BETWEEN equal scores where
    SQL's row-order ntile does) and the size rule (the first n%k
    tiles get one extra row).  The difference from the
    value-threshold stratifiers (ccnet_buckets, quantiles): those
    give every equal score the same bucket; NTILE balances bucket
    SIZES.  Output: ``(doc_id, group, n_tokens, tile)``.

    Shape — global per-group ranks WITHOUT a global sort (the
    shuffle_positions offset pattern, keyed by value instead of a
    uniform hash): the corpus is tokenized ONCE into a materialized
    (doc_id, group, score) table that feeds both passes; (1)
    per-batch (group, score) value counts collapse
    to a tiny (group x distinct-score) table; the driver sorts it and
    broadcasts per-(group, score) base offsets + group totals via
    ``ray.put``; (2) ONE coarse (group, score)-keyed exchange gives
    each equal-score run its doc_id-ordered local ordinal; rank =
    offset + ordinal, tile = the integer size-rule formula.  NULL
    groups become '(null)' (corpus_report discipline)."""
    import ray

    def score_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return typed_if_empty(pd.DataFrame({
            "doc_id": batch["doc_id"],
            group_col: batch[group_col].fillna("(null)"),
            "score": _tokens(batch["text"]).str.len()
            .astype("int64")}))

    # tokenize ONCE; both the histogram and the exchange read this
    scored = ds.map_batches(score_rows,
                            batch_format="pandas").materialize()

    def score_counts(batch: pd.DataFrame) -> pd.DataFrame:
        out = (batch.groupby([group_col, "score"], sort=False).size()
               .reset_index(name="cnt"))
        out["cnt"] = out["cnt"].astype("int64")
        return typed_if_empty(out)

    hist = (scored.map_batches(score_counts, batch_format="pandas")
            .groupby([group_col, "score"])
            .sum("cnt").to_pandas()
            .rename(columns={"sum(cnt)": "cnt"})
            .sort_values([group_col, "score"]))
    offsets = {}
    totals = {}
    for grp, rows in hist.groupby(group_col, sort=False):
        acc = 0
        for s, c in zip(rows["score"], rows["cnt"]):
            offsets[(grp, int(s))] = acc
            acc += int(c)
        totals[grp] = acc
    maps_ref = ray.put((offsets, totals))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.copy()
        g["part"] = coarse_part(
            g[group_col] + ":" + g["score"].astype(str),
            num_partitions)
        return typed_if_empty(g)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        off, tot = ray.get(maps_ref)
        g = group.sort_values([group_col, "score", "doc_id"]).copy()
        ordinal = g.groupby([group_col, "score"], sort=False).cumcount()
        base = np.fromiter(
            (off[(s, int(v))] for s, v in
             zip(g[group_col], g["score"])),
            dtype="int64", count=len(g))
        rank = base + ordinal.to_numpy()           # 0-based in group
        n = np.fromiter((tot[s] for s in g[group_col]),
                        dtype="int64", count=len(g))
        k = tiles
        small = n // k
        m = n % k
        big = small + 1
        in_big = rank < m * big
        tile = np.where(
            in_big, rank // np.maximum(big, 1),
            m + np.where(small > 0,
                         (rank - m * big) // np.maximum(small, 1), 0)
        ) + 1
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            group_col: g[group_col].to_numpy(),
            "n_tokens": g["score"].to_numpy(),
            "tile": tile.astype("int64")})

    return (scored.map_batches(assign, batch_format="pandas")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas"))


def corpus_report(ds, group_col: str = "source"):
    """Corpus report card: per-source document/token/char totals,
    empty-after-normalization counts and token-count extrema, plus an
    ``ALL`` rollup row — the first thing anyone asks of a new crawl
    drop, and the lineage metric a curation run records per snapshot.
    Output: ``(source, n_docs, n_tokens, n_chars, n_empty,
    min_tokens, max_tokens)``.

    Shape: per-batch partials collapse to one row per source per
    block; ONE tiny source-keyed combine (sums + min-of-min +
    max-of-max are all distributive); the ALL row derives from the
    combined leaf (|sources| rows) at the driver.  Empty means the
    whitespace-normalized text is '' — the same normalization the
    dedup operators key on.  NULL sources report as their own
    ``(null)`` group (pandas groupby silently drops NaN keys, and a
    bare ROLLUP would conflate a NULL group with its subtotal row).
    """
    import pyarrow as pa

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        toks = _tokens(text)
        g = pd.DataFrame({
            group_col: batch[group_col].fillna("(null)"),
            "n_tokens": toks.str.len().astype("int64"),
            "n_chars": text.str.len().astype("int64"),
            "empty": (text.str.replace(_WS, "", regex=True) == "")
                     .astype("int64")})
        out = (g.groupby(group_col, sort=False)
               .agg(n_docs=("n_tokens", "size"),
                    n_tokens=("n_tokens", "sum"),
                    n_chars=("n_chars", "sum"),
                    n_empty=("empty", "sum"),
                    min_tokens=("n_tokens", "min"),
                    max_tokens=("n_tokens", "max"))
               .reset_index())
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return typed_if_empty(out)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            group_col: [group[group_col].iloc[0]],
            "n_docs": [int(group["n_docs"].sum())],
            "n_tokens": [int(group["n_tokens"].sum())],
            "n_chars": [int(group["n_chars"].sum())],
            "n_empty": [int(group["n_empty"].sum())],
            "min_tokens": [int(group["min_tokens"].min())],
            "max_tokens": [int(group["max_tokens"].max())]})

    leaf = (ds.map_batches(partial, batch_format="pandas")
            .groupby(group_col).map_groups(combine,
                                           batch_format="pandas")
            .to_pandas())
    grand = pd.DataFrame({
        group_col: ["ALL"],
        "n_docs": [int(leaf["n_docs"].sum())],
        "n_tokens": [int(leaf["n_tokens"].sum())],
        "n_chars": [int(leaf["n_chars"].sum())],
        "n_empty": [int(leaf["n_empty"].sum())],
        "min_tokens": [int(leaf["min_tokens"].min())
                       if len(leaf) else 0],
        "max_tokens": [int(leaf["max_tokens"].max())
                       if len(leaf) else 0]})
    out = pd.concat([leaf, grand], ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def bpe_apply(ds, merges_tbl):
    """Encode the corpus with LEARNED BPE merges — the application
    half that :func:`bpe_train` trains: per document, the total
    symbol count after every merge is applied in rank order.  Output:
    ``(doc_id, n_symbols)`` (empty docs encode to 0).

    The merge table (a handful of rows) rides the task closure; the
    pass is ONE stateless vectorized ``map_batches``, no shuffle.
    Semantics are bpe_train's exactly — TWO space-bounded substring
    replaces per merge — applied to a per-DOC sentinel string with
    DOUBLE spaces between words, so a merge pattern (single interior
    spaces) can never cross a word boundary and the result equals the
    per-word application the SQL twin states.
    """
    m = (merges_tbl.to_pandas()
         if not isinstance(merges_tbl, pd.DataFrame) else merges_tbl)
    pairs = list(zip(m.sort_values("rank")["left_sym"],
                     m.sort_values("rank")["right_sym"]))

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"])
        s = pd.Series(
            [(" " + "  ".join(" ".join(w) for w in ws) + " ")
             if len(ws) else "" for ws in toks],
            index=batch.index, dtype="object")
        for a, b in pairs:
            pat, rep = f" {a} {b} ", f" {a}{b} "
            s = (s.str.replace(pat, rep, regex=False)
                 .str.replace(pat, rep, regex=False))
        return typed_if_empty(pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_symbols": s.str.split().str.len()
                          .fillna(0).astype("int64")}))

    return ds.map_batches(encode, batch_format="pandas")


def pmi_top_pairs(ds, k: int = 30, min_count: int = 5,
                  num_partitions: int = 64):
    """Corpus collocation mining: top-k word bigrams by pointwise
    mutual information ``PMI = ln(c_xy * N / (c_x * c_y))`` with a
    ``min_count`` occurrence floor (rare pairs have unreliable PMI
    and unbounded scores).  Output: ``(w1, w2, n_pair, pmi_micro)``,
    ties broken (pmi DESC, w1, w2).

    Shape: ONE corpus pass emits per-batch bigram and unigram count
    partials (vectorized shift-concat, the repetition_signals
    machinery); each collapses through its own coarse token-keyed
    exchange.  Each surviving bigram (>= min_count — applied BEFORE
    the joins, so the expensive part is floor-bounded) then learns
    c_x and c_y through two tagged-union token-keyed exchanges (the
    triangle_count annotate shape — no vocab broadcast; web vocabs
    don't fit one node).  PMI lands on the integer micro grid with
    ONE stated float op order (c*N double-mult, cx*cy double-mult,
    divide, ln, *1e6, floor) so the DuckDB twin is bit-identical
    (np.log == DuckDB ln on this platform — the bm25/tfidf
    precedent).  Driver merges per-partition top-k partials."""
    import pyarrow as pa

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"])
        uni: Dict[str, int] = {}
        big: Dict[tuple, int] = {}
        flat = [w for ws in toks for w in ws]
        s = pd.Series(flat, dtype="object")
        for w, c in s.value_counts().items():
            uni[w] = int(c)
        # bigrams never cross documents: shift within each doc list
        firsts, seconds = [], []
        for ws in toks:
            if len(ws) >= 2:
                firsts.extend(ws[:-1])
                seconds.extend(ws[1:])
        bg = pd.DataFrame({"w1": firsts, "w2": seconds})
        out_u = pd.DataFrame({
            "w1": list(uni), "w2": "", "cnt": list(uni.values()),
            "kind": np.int8(0)})
        if len(bg):
            bgc = (bg.groupby(["w1", "w2"], sort=False).size()
                   .reset_index(name="cnt"))
            bgc["kind"] = np.int8(1)
            out = pd.concat([out_u, bgc], ignore_index=True)
        else:
            out = out_u
        out["cnt"] = out["cnt"].astype("int64")
        out["part"] = coarse_part(out["w1"] + "\x00" + out["w2"],
                                  num_partitions)
        return typed_if_empty(out)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["w1", "w2", "kind"], sort=False)["cnt"]
             .sum().reset_index())
        g["cnt"] = g["cnt"].astype("int64")
        return typed_if_empty(g)

    tallied = (ds.map_batches(counts, batch_format="pandas")
               .groupby("part").map_groups(combine,
                                           batch_format="pandas")
               .materialize())    # unigrams consumed 3x, bigrams 1x

    def keep_uni(batch: pd.DataFrame) -> pd.DataFrame:
        return typed_if_empty(batch[batch["kind"] == 0])

    def keep_big(batch: pd.DataFrame) -> pd.DataFrame:
        return typed_if_empty(batch[(batch["kind"] == 1)
                                    & (batch["cnt"] >= min_count)])

    unigrams = tallied.map_batches(keep_uni, batch_format="pandas")
    n_total = int(unigrams.sum("cnt"))     # scalar for a single column

    bigrams = tallied.map_batches(keep_big, batch_format="pandas")

    from doc_ocr_ray.util import tagged_union_annotate

    def annotate(tbl, endpoint, out_col):
        return tagged_union_annotate(tbl, unigrams, endpoint,
                                     "w1", "cnt", out_col,
                                     num_partitions=num_partitions)

    with_cx = annotate(bigrams, "w1", "c_x")
    with_both = annotate(with_cx, "w2", "c_y")

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return typed_if_empty(pd.DataFrame())
        c = batch["cnt"].to_numpy(dtype="float64")
        cx = batch["c_x"].to_numpy(dtype="float64")
        cy = batch["c_y"].to_numpy(dtype="float64")
        pmi = np.floor(1e6 * np.log((c * float(n_total)) / (cx * cy))) \
            .astype("int64")
        out = pd.DataFrame({
            "w1": batch["w1"].to_numpy(),
            "w2": batch["w2"].to_numpy(),
            "n_pair": batch["cnt"].astype("int64").to_numpy(),
            "pmi_micro": pmi})
        out = out.sort_values(["pmi_micro", "w1", "w2"],
                              ascending=[False, True, True]).head(k)
        return typed_if_empty(out)

    cand = with_both.map_batches(score,
                                 batch_format="pandas").to_pandas()
    top = (cand.sort_values(["pmi_micro", "w1", "w2"],
                            ascending=[False, True, True])
           .head(k).reset_index(drop=True))
    for c in ("n_pair", "pmi_micro"):
        top[c] = top[c].astype("int64")
    return pa.Table.from_pandas(top, preserve_index=False)


def winsorize_by_group(ds, lo_q: int = 5, hi_q: int = 95,
                       group_col: str = "source"):
    """Per-group winsorization of the whitespace token count — the
    outlier-clipping normalization a mixed-crawl pipeline applies
    before any mean-based statistic (one 10M-token megadoc otherwise
    owns its source's mean): every doc's count is clipped into its
    source's [p5, p95] (exact DISCRETE order statistics, rank
    ``floor(q/100 * (n-1))`` 0-indexed into the sorted multiset).

    Scale shape: the quantiles come from a mergeable per-(group,
    n_tokens) HISTOGRAM, not a per-group sort — token counts are
    bounded small integers, so the histogram is tiny no matter the
    corpus size.  Pass 1: per-batch (group, n_tokens) partial counts
    -> ONE small groupby -> per-group cumulative scan at the driver
    (distinct-count-bounded) -> bounds broadcast via ``ray.put``.
    Pass 2: stateless clip map.  Doc rows never shuffle; all
    arithmetic is exact integers (no percentile interpolation to
    match across engines).

    Output per doc: ``(doc_id, group, n_tokens, clipped)``.
    """
    import ray

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch.dropna(subset=[group_col])
        x = _tokens(t["text"]).str.len().astype("int64")
        g = pd.DataFrame({group_col: t[group_col], "n_tokens": x})
        out = (g.groupby([group_col, "n_tokens"], sort=False)
               .size().reset_index(name="cnt"))
        return typed_if_empty(out)

    hist = (ds.map_batches(partial, batch_format="pandas")
            .groupby([group_col, "n_tokens"])
            .sum("cnt").to_pandas()
            .rename(columns={"sum(cnt)": "cnt"}))
    if hist.empty:
        # zero-row to_pandas() drops the column list (CLAUDE.md) —
        # short-circuit before groupby would KeyError
        return ds.map_batches(
            lambda b: typed_if_empty(pd.DataFrame({
                "doc_id": pd.Series([], dtype="object"),
                group_col: pd.Series([], dtype="object"),
                "n_tokens": pd.Series([], dtype="int64"),
                "clipped": pd.Series([], dtype="int64")})),
            batch_format="pandas")

    bounds = {}
    for grp, h in hist.groupby(group_col, sort=False):
        h = h.sort_values("n_tokens")
        cnt = h["cnt"].to_numpy(dtype="int64")
        vals = h["n_tokens"].to_numpy(dtype="int64")
        n = int(cnt.sum())
        cum = np.cumsum(cnt)
        # value at 0-indexed rank r of the sorted multiset = first
        # histogram cell whose cumulative count exceeds r
        def at_rank(r):
            return int(vals[np.searchsorted(cum, r, side="right")])
        bounds[grp] = (at_rank(lo_q * (n - 1) // 100),
                       at_rank(hi_q * (n - 1) // 100))
    bounds_ref = ray.put(bounds)

    def clip(batch: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bounds_ref)
        # NULL group keys drop, matching the SQL twin's inner JOIN
        # USING (source) (pass 1's pandas groupby dropped them too)
        t = batch.dropna(subset=[group_col])
        x = _tokens(t["text"]).str.len().astype("int64")
        lo = t[group_col].map(lambda s: b[s][0]).astype("int64")
        hi = t[group_col].map(lambda s: b[s][1]).astype("int64")
        return typed_if_empty(pd.DataFrame({
            "doc_id": t["doc_id"],
            group_col: t[group_col],
            "n_tokens": x,
            "clipped": x.clip(lower=lo, upper=hi)}))

    return ds.map_batches(clip, batch_format="pandas")


def search_snippets(ds, query_tokens, k: int = 10, window: int = 5):
    """Keyword-in-context snippet extraction for the BM25 top-``k`` —
    the search-result presentation pass: each hit shows the
    ``2*window + 1``-token context around the EARLIEST occurrence of
    any query term (the ``least(list_position(...))`` rule the SQL
    twin states).  Tokenization is the shared ``_NORM`` contract, so
    positions agree between engines by construction.

    Shape: the ranking is :func:`bm25_search` unchanged (two
    streaming passes, no shuffle); the snippet pass broadcasts the
    tiny hit-id set in the task closure and streams the corpus ONCE
    more through a distributed filter — hit texts never gather on the
    driver, only k snippet rows do.  Output: ``(rank, doc_id,
    score_micro, snippet)``.
    """
    hits = bm25_search(ds, query_tokens, k=k)
    empty = pd.DataFrame({
        "rank": pd.Series([], dtype="int64"),
        "doc_id": pd.Series([], dtype="int64"),
        "score_micro": pd.Series([], dtype="int64"),
        "snippet": pd.Series([], dtype="object")})
    if not len(hits):
        return typed_if_empty(empty)
    hit_ids = frozenset(int(d) for d in hits["doc_id"])
    terms = frozenset(query_tokens)

    def snip(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["doc_id"].isin(hit_ids)]
        if not len(b):
            return typed_if_empty(empty[["doc_id", "snippet"]])
        out_id, out_sn = [], []
        for did, text in zip(b["doc_id"], b["text"]):
            toks = _WS.sub(" ", _EDGE_WS.sub("", text or "").lower()
                           ).split(" ")
            pos = min((i for i, t in enumerate(toks) if t in terms),
                      default=None)
            if pos is None:      # unreachable for BM25 hits; guard
                continue
            lo = max(0, pos - window)
            out_id.append(int(did))
            out_sn.append(" ".join(toks[lo:pos + window + 1]))
        return typed_if_empty(pd.DataFrame({
            "doc_id": pd.Series(out_id, dtype="int64"),
            "snippet": pd.Series(out_sn, dtype="object")}))

    sn = ds.map_batches(snip, batch_format="pandas").to_pandas()
    out = hits.merge(sn, on="doc_id", how="inner")
    return out[["rank", "doc_id", "score_micro", "snippet"]].sort_values(
        "rank").reset_index(drop=True)


def extract_entities(ds):
    """Structured entity extraction — the inverse presentation of
    :func:`pii_redact_batch`: instead of scrubbing, emit one row per
    match, ``(doc_id, kind, idx, value)``, where ``idx`` is the
    1-based occurrence index of that kind within the document (the
    ``generate_subscripts`` ordinal the SQL twin states).  Kinds and
    patterns are the shared RE2-parity PII set (email, phone, ip),
    applied to the RAW text independently per kind (no chaining — the
    redaction interaction rule belongs to the scrub, not the
    extraction).  A pure row-local flat_map: fan-out only, NO
    shuffle, docs with no matches emit nothing.
    """
    from doc_ocr_ray.util import typed_if_empty

    kinds = [("email", _EMAIL), ("phone", _PHONE), ("ip", _IPV4)]

    def flat(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        ids, out_kind, out_idx, out_val = [], [], [], []
        for kind, pat in kinds:
            hits = text.str.findall(pat)
            for did, vals in zip(batch["doc_id"], hits):
                for i, v in enumerate(vals, start=1):
                    ids.append(did)
                    out_kind.append(kind)
                    out_idx.append(i)
                    out_val.append(v)
        return typed_if_empty(pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "kind": pd.Series(out_kind, dtype="object"),
            "idx": pd.Series(out_idx, dtype="int64"),
            "value": pd.Series(out_val, dtype="object")}))

    return ds.map_batches(flat, batch_format="pandas")


def skipgram_pairs(ds, window: int = 3, k: int = 30,
                   num_parts: int = 64):
    """Skip-gram co-occurrence counts — the word2vec/GloVe
    preparation pass: unordered token pairs within ``window``
    positions of each other in the shared ``_NORM`` stream, counted
    corpus-wide, top-``k`` by (count DESC, w1, w2).  Pairs are
    canonicalized (w1 <= w2 lexicographically); a token never pairs
    with itself at distance 0, but equal TOKENS at different
    positions do pair (the standard skip-gram contract).

    Shape: per-batch vectorized shift-concat per offset (``window``
    aligned slices — no per-token loop), in-batch pair-count
    combiner, ONE coarse pair-keyed exchange for exact totals,
    per-partition top-k, driver merge of num_parts * k rows.
    """
    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        doc_idx, toks = _norm_tokens_flat(list(batch["text"].fillna("")))
        frames = []
        for off in range(1, window + 1):
            if len(toks) <= off:
                break
            a = toks[:-off]
            b = toks[off:]
            same = doc_idx[:-off] == doc_idx[off:]
            if not same.any():
                continue
            lo = np.minimum(a[same], b[same])
            hi = np.maximum(a[same], b[same])
            frames.append(pd.DataFrame({"w1": lo, "w2": hi}))
        if not frames:
            return typed_if_empty(pd.DataFrame({
                "w1": pd.Series([], dtype="object"),
                "w2": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "part": pd.Series([], dtype="int64")}))
        out = (pd.concat(frames, ignore_index=True)
               .groupby(["w1", "w2"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        out["part"] = coarse_part(out["w1"] + "\x00" + out["w2"],
                                  num_parts)
        return out

    def topk_per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["w1", "w2"], sort=False)["n"].sum()
             .reset_index())
        g["n"] = g["n"].astype("int64")
        g = g.sort_values(["n", "w1", "w2"],
                          ascending=[False, True, True]).head(k)
        return typed_if_empty(g[["w1", "w2", "n"]])

    import pyarrow as pa

    cand = (ds.map_batches(pair_partial, batch_format="pandas")
            .groupby("part").map_groups(topk_per_part,
                                        batch_format="pandas")
            .to_pandas())
    if not len(cand):
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    top = cand.sort_values(["n", "w1", "w2"],
                           ascending=[False, True, True]).head(k)
    return pa.Table.from_pandas(top.reset_index(drop=True),
                                preserve_index=False)


def mojibake_signals_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Encoding-damage census — the cheap pre-filter a crawl corpus
    runs before any language work, catching the three classic
    artifacts: U+FFFD replacement characters (decoder already gave
    up), C1 control codepoints U+0080-U+009F (cp1252 bytes decoded as
    latin-1/unicode), and the UTF-8-read-as-latin-1 double-encoding
    signature ``U+00C3 followed by U+0080-U+00BF`` (an e-acute that
    became two latin-1 characters).  Output: ``(doc_id, n_fffd, n_c1,
    n_double, mojibake)`` — pure integer counts (non-overlapping
    left-to-right matches, identical in Python re and RE2, so the SQL
    twin needs no grid).  One stateless map, no shuffle."""
    texts = batch["text"].fillna("")
    n_fffd = texts.str.count("\ufffd").astype("int64")
    n_c1 = texts.str.count("[\u0080-\u009f]").astype("int64")
    n_double = texts.str.count(
        "\u00c3[\u0080-\u00bf]").astype("int64")
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_fffd": n_fffd,
        "n_c1": n_c1,
        "n_double": n_double,
        "mojibake": ((n_fffd + n_c1 + n_double) > 0).astype("int64")})


def readability_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Surface readability statistics — the Flesch-style signals that
    are exactly computable cross-engine (syllable counting is not; the
    standard corpus-filter proxies below are): sentence count
    (maximal ``[.!?]`` runs), word count (the shared whitespace-token
    contract), non-whitespace char count, and the two integer-milli
    ratios ``words_per_sent_milli = 1000*n_words // max(n_sent, 1)``
    and ``chars_per_word_milli = 1000*n_chars // max(n_words, 1)``.
    Long sentences / long words flag legalese and OCR run-ons; tiny
    values flag listicles and tag soup.  One stateless map."""
    texts = batch["text"].fillna("")
    n_sent = texts.str.count(r"[.!?]+").astype("int64")
    toks = _tokens(texts)
    n_words = toks.str.len().astype("int64")
    n_chars = (texts.str.replace(_WS, "", regex=True)
               .str.len().astype("int64"))
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_sentences": n_sent,
        "n_words": n_words,
        "n_chars": n_chars,
        "words_per_sent_milli":
            (1000 * n_words) // np.maximum(n_sent, 1),
        "chars_per_word_milli":
            (1000 * n_chars) // np.maximum(n_words, 1)})


def vocab_coverage(ds, top_ns=(100, 1000, 10000), num_parts: int = 64):
    """Vocabulary-coverage curve: what fraction of all token
    occurrences do the top-N most frequent tokens cover?  The
    tokenizer-budget / OOV-rate planning signal (how large must a
    word-level vocab be; what does a 32k BPE leave on the table) and
    a corpus-health check (a coverage spike = boilerplate flooding).

    Coverage is computable from the count-of-counts HISTOGRAM alone
    (tokens with equal count are interchangeable for mass): take
    levels in count-DESC order, consume min(remaining_N, n_tokens)
    tokens per level.  So the final pass sees distinct COUNT VALUES
    (the host_skew discipline) — never the vocabulary, never the
    corpus: per-batch exact token counts (np.unique over the shared
    ``_norm_tokens_flat`` stream) meet on ONE coarse token-hash
    exchange whose group fn immediately collapses per-token totals to
    (count, n_tokens) partials; a token lives wholly in one part, so
    the partials are exact.

    Output one row per requested N: (top_n, covered_occurrences,
    total_occurrences, covered_ppm) with covered_ppm =
    covered * 10^6 // total (floor grid, SQL-statable).  Integer
    sums throughout; N larger than the vocabulary covers everything.
    """
    top_ns = [int(n) for n in top_ns]

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        _, toks = _norm_tokens_flat(list(batch["text"].fillna("")))
        empty = pd.DataFrame({
            "token": pd.Series([], dtype="object"),
            "cnt": pd.Series([], dtype="int64"),
            "part": pd.Series([], dtype="int64")})
        if not len(toks):
            return typed_if_empty(empty)
        uniq, counts = np.unique(toks, return_counts=True)
        out = pd.DataFrame({
            "token": pd.Series(uniq, dtype="object"),
            "cnt": counts.astype("int64")})
        out["part"] = coarse_part(out["token"], num_parts)
        return out

    def hist_partial(group: pd.DataFrame) -> pd.DataFrame:
        tc = (group.groupby("token", sort=False)["cnt"].sum()
              .to_numpy())
        lv, nt = np.unique(tc, return_counts=True)
        return pd.DataFrame({
            "c": lv.astype("int64"),
            "nt": nt.astype("int64"),
            "g": np.zeros(len(lv), dtype="int64")})

    def final(group: pd.DataFrame) -> pd.DataFrame:
        h = (group.groupby("c", sort=False)["nt"].sum()
             .reset_index().sort_values("c", ascending=False))
        levels = list(zip(h["c"].astype(int), h["nt"].astype(int)))
        total = sum(c * nt for c, nt in levels)
        rows = []
        for n in sorted(top_ns):
            remaining, covered = n, 0
            for c, nt in levels:
                if remaining <= 0:
                    break
                take = min(remaining, nt)
                covered += take * c
                remaining -= take
            rows.append((n, covered, total,
                         (covered * 10 ** 6) // total if total else 0))
        return pd.DataFrame({
            "top_n": pd.Series([r[0] for r in rows], dtype="int64"),
            "covered_occurrences": pd.Series([r[1] for r in rows],
                                             dtype="int64"),
            "total_occurrences": pd.Series([r[2] for r in rows],
                                           dtype="int64"),
            "covered_ppm": pd.Series([r[3] for r in rows],
                                     dtype="int64")})

    hist = (ds.map_batches(count_partial, batch_format="pandas")
            .groupby("part")
            .map_groups(hist_partial, batch_format="pandas"))
    # neutral seed level (util.seed_row): a zero-count level adds no
    # mass on real input, and on an all-empty corpus it keeps the
    # promised one-row-per-N output alive
    from doc_ocr_ray.util import seed_row
    seed = seed_row({"c": (0, "int64"), "nt": (0, "int64"),
                     "g": (0, "int64")})
    return (hist.union(seed)
            .groupby("g").map_groups(final, batch_format="pandas"))
