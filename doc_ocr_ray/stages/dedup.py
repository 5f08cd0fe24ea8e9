"""Deduplication operators for corpus curation at scale.

All variants follow the same shape: a vectorized ``map_batches`` stage
computes a compact key/sketch per document (the expensive part, fully
parallel), then ONE ``groupby`` on the small key does the exchange —
never a shuffle of full texts where a sketch suffices.

- exact:        normalized-text hash -> hash-partitioned keep-first
- token-multiset: order-insensitive exact dedup (sorted token list key)
- MinHash+LSH:  char-shingle minhash signatures -> banded buckets ->
                candidate pairs -> signature-similarity verify
- SimHash:      64-bit simhash -> 16-bit band blocking (pigeonhole for
                hamming<=3) -> hamming verify

The reference needs none of these (its dedup is intra-page only,
SURVEY.md section 2.7); they are the cross-document extension a
10^12-doc corpus requires.
"""
from __future__ import annotations

import hashlib
import re
from typing import Iterable, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")
_MERSENNE = (1 << 61) - 1
_MAXH = (1 << 32) - 1


def _normalize(series: pd.Series) -> pd.Series:
    return (series.fillna("").str.strip().str.lower()
            .str.replace(_WS, " ", regex=True))


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


# ---------------------------------------------------------------- exact
def add_text_key_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Append a 64-bit content hash; pre-dedup within the batch (the
    combiner: shrink the shuffle before the groupby)."""
    out = batch.copy()
    out["text_key"] = [_md5_64(t) for t in _normalize(batch[text_col])]
    out = out.sort_values("doc_id").drop_duplicates("text_key", keep="first")
    return out


def exact_dedup(ds, text_col: str = "text"):
    """Keep the min-doc_id representative per distinct normalized text.

    hash-partition + per-group first (groupby on the 64-bit key, never
    on the text itself); within a key group, ties break by doc_id.
    """
    keyed = ds.map_batches(add_text_key_batch, batch_format="pandas",
                           fn_kwargs={"text_col": text_col})

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        # guard against (astronomically unlikely) hash collisions: the
        # representative is min doc_id per *text*, as the SQL oracle
        # defines it
        return (g.groupby(_normalize(g[text_col]), sort=False)
                 .head(1).drop(columns=["text_key"]))

    return keyed.groupby("text_key").map_groups(keep_first, batch_format="pandas")


def token_multiset_dedup(ds, text_col: str = "text"):
    """Order-insensitive exact dedup: two docs are duplicates when
    their token multisets match (classic shuffle-attack-resistant
    near-dup).  Key = md5 of the sorted token list."""
    def key_batch(batch: pd.DataFrame) -> pd.DataFrame:
        norm = _normalize(batch[text_col])
        keys = [_md5_64(" ".join(sorted(t.split(" ")))) if t else 0
                for t in norm]
        out = batch.copy()
        out["ms_key"] = keys
        return out.sort_values("doc_id").drop_duplicates("ms_key", keep="first")

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values("doc_id").head(1).drop(columns=["ms_key"])

    return (ds.map_batches(key_batch, batch_format="pandas")
              .groupby("ms_key").map_groups(keep_first, batch_format="pandas"))


# ------------------------------------------------------------- minhash
def char_shingles(text: str, k: int = 5) -> Iterable[str]:
    t = _WS.sub(" ", (text or "").strip().lower())
    if len(t) < k:
        return [t] if t else []
    return (t[i:i + k] for i in range(len(t) - k + 1))


def _perm_params(num_perm: int, seed: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray,
                      k: int = 5) -> np.ndarray:
    hs = np.array([_md5_64(s) & _MAXH for s in char_shingles(text, k)],
                  dtype=np.uint64)
    if hs.size == 0:
        return np.full(len(a), _MAXH, dtype=np.uint64)
    # universal hashing min over shingles, per permutation
    hs_o = hs.astype(object)
    sig = np.array([int(((ai * hs_o + bi) % _MERSENNE).min()) & _MAXH
                    for ai, bi in zip(a, b)], dtype=np.uint64)
    return sig


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


class MinHashStage:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 1):
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [minhash_signature(t, self.a, self.b, self.shingle_k)
                for t in batch["text"].fillna("")]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "signature": [s.tolist() for s in sigs],
        })


def _explode_bands(batch: pd.DataFrame, num_bands: int) -> pd.DataFrame:
    rows_doc, rows_band, rows_hash, rows_sig = [], [], [], []
    for doc, sig in zip(batch["doc_id"], batch["signature"]):
        sig = list(sig)
        rpb = len(sig) // num_bands
        for band in range(num_bands):
            chunk = tuple(int(x) for x in sig[band * rpb:(band + 1) * rpb])
            rows_doc.append(doc)
            rows_band.append(band)
            rows_hash.append(_md5_64(repr(chunk)))
            rows_sig.append([int(x) for x in sig])
    return pd.DataFrame({"doc_id": rows_doc, "band": rows_band,
                         "band_hash": rows_hash, "signature": rows_sig})


def minhash_dedup_pairs(ds, num_perm: int = 64, num_bands: int = 16,
                        shingle_k: int = 5, threshold: float = 0.8,
                        concurrency=(1, 8)):
    """MinHash+LSH near-duplicate pairs.

    shingle -> minhash -> band -> bucket groupby -> per-bucket candidate
    pairs -> verify by signature similarity >= threshold.  The shuffle
    carries (doc_id, band keys, signature) — num_perm*4 bytes per band
    row — never the text.  Returns (doc_a, doc_b, est_jaccard) with
    doc_a < doc_b, one row per pair (min band wins for dedup).
    """
    sigs = ds.map_batches(MinHashStage, batch_format="pandas",
                          fn_constructor_kwargs={"num_perm": num_perm,
                                                 "shingle_k": shingle_k},
                          concurrency=concurrency)
    bands = sigs.map_batches(_explode_bands, batch_format="pandas",
                             fn_kwargs={"num_bands": num_bands})

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
        g = group.sort_values("doc_id")
        docs = g["doc_id"].tolist()
        sgs = [np.asarray(s, dtype=np.uint64) for s in g["signature"]]
        out_a, out_b, out_j = [], [], []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                est = estimate_jaccard(sgs[i], sgs[j])
                if est >= threshold:
                    out_a.append(docs[i]); out_b.append(docs[j]); out_j.append(round(est, 4))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "est_jaccard": out_j})

    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")

    # a pair can surface from several bands — keep one row
    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(first, batch_format="pandas")


def drop_near_duplicates(ds, pairs_ds):
    """Keep-min pruning: drop every doc that near-duplicates a
    smaller-id doc.  Victim set is small relative to the corpus ->
    broadcast it (ray.put) and anti-join inside map_batches."""
    import ray
    victims = set(r["doc_b"] for r in pairs_ds.select_columns(["doc_b"]).take_all())
    ref = ray.put(victims)

    def drop(batch: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(ref)
        return batch[~batch["doc_id"].isin(v)]
    return ds.map_batches(drop, batch_format="pandas")


# ------------------------------------------------------------- simhash
def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (Charikar'02)."""
    t = _WS.sub(" ", (text or "").strip().lower())
    if not t:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in t.split(" "):
        h = _md5_64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    return int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)


def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    sh = np.array([simhash64(t) for t in batch["text"].fillna("")],
                  dtype=np.uint64)
    out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
    out["simhash"] = sh.astype(np.int64)  # arrow-friendly
    # 4 x 16-bit bands: hamming distance <= 3 implies at least one
    # band matches exactly (pigeonhole blocking)
    for band in range(4):
        out[f"band{band}"] = ((sh >> np.uint64(band * 16))
                              & np.uint64(0xFFFF)).astype(np.int64)
    return out


def simhash_dedup_pairs(ds, max_hamming: int = 3):
    """SimHash near-dup pairs via 16-bit band blocking + hamming verify."""
    import ray.data

    hashed = ds.map_batches(simhash_batch, batch_format="pandas")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        g = group.sort_values("doc_id")
        docs = g["doc_id"].tolist()
        hs = g["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
        a_, b_, d_ = [], [], []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                d = int(bin(int(hs[i]) ^ int(hs[j])).count("1"))
                if d <= max_hamming:
                    a_.append(docs[i]); b_.append(docs[j]); d_.append(d)
        return pd.DataFrame({"doc_a": a_, "doc_b": b_, "hamming": d_})

    per_band = []
    for band in range(4):
        cols = hashed.select_columns(["doc_id", "simhash", f"band{band}"])
        per_band.append(
            cols.groupby(f"band{band}").map_groups(bucket_pairs,
                                                   batch_format="pandas"))
    pairs = per_band[0].union(*per_band[1:])

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(first, batch_format="pandas")


# ----------------------------------------------- exact n-gram jaccard
def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(char_shingles(a, k)), set(char_shingles(b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_exact(ds, pairs_ds, k: int = 5, threshold: float = 0.8):
    """Exact n-gram Jaccard verification of candidate pairs: broadcast
    the candidate docs' texts (the candidate set is tiny vs the corpus)
    and filter pairs by true Jaccard."""
    import ray
    pairs = pairs_ds.take_all()
    need = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    texts = {}
    for batch in ds.iter_batches(batch_size=4096, batch_format="pandas"):
        hit = batch[batch["doc_id"].isin(need)]
        texts.update(dict(zip(hit["doc_id"], hit["text"])))
    out = []
    for p in pairs:
        j = ngram_jaccard(texts.get(p["doc_a"], ""), texts.get(p["doc_b"], ""), k)
        if j >= threshold:
            out.append({"doc_a": p["doc_a"], "doc_b": p["doc_b"],
                        "jaccard": round(j, 4)})
    cols = {"doc_a": [o["doc_a"] for o in out],
            "doc_b": [o["doc_b"] for o in out],
            "jaccard": [o["jaccard"] for o in out]}
    return pa.table({"doc_a": pa.array(cols["doc_a"], pa.int64()),
                     "doc_b": pa.array(cols["doc_b"], pa.int64()),
                     "jaccard": pa.array(cols["jaccard"], pa.float64())})
