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
from typing import Iterable, Tuple

import numpy as np
import pandas as pd

from doc_ocr_ray.util import coarse_part, typed_if_empty
import pyarrow as pa

# explicit class == RE2 \s (see text_analysis._WS: unicode \s would
# diverge from the SQL oracles); edge-strip with the same class
_WS = re.compile(r"[\t\n\f\r ]+")
_EDGE_WS = re.compile(r"^[\t\n\f\r ]+|[\t\n\f\r ]+$")
_MERSENNE = (1 << 61) - 1
_MAXH = (1 << 32) - 1
_SHINGLE_MOD = (1 << 31) - 1        # Mersenne prime 2^31-1
_SHINGLE_BASE = 257


def _normalize(series: pd.Series) -> pd.Series:
    return (series.fillna("").str.replace(_EDGE_WS, "", regex=True).str.lower()
            .str.replace(_WS, " ", regex=True))


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


# ---------------------------------------------------------------- exact
def add_text_key_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Append a 64-bit content hash; pre-dedup within the batch (the
    combiner: shrink the shuffle before the groupby)."""
    out = batch.copy()
    # mask to 63 bits: full-range 64-bit values in an object column make
    # Arrow infer int64 for some blocks and uint64 for others, breaking
    # schema unification in the shuffle
    out["text_key"] = [_md5_64(t) >> 1 for t in _normalize(batch[text_col])]
    out = out.sort_values("doc_id").drop_duplicates("text_key", keep="first")
    return out


def exact_dedup(ds, text_col: str = "text"):
    """Keep the min-doc_id representative per distinct normalized text.

    hash-partition + per-group first (groupby on the 64-bit key, never
    on the text itself); within a key group, ties break by doc_id.
    """
    def key_and_part(batch: pd.DataFrame) -> pd.DataFrame:
        out = add_text_key_batch(batch, text_col)
        # coarse shuffle key: same text -> same partition; a partition
        # holds many texts so per-group call overhead amortizes
        out["part"] = (out["text_key"] % 256).astype("int64")
        return out

    keyed = ds.map_batches(key_and_part, batch_format="pandas")

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        # representative is min doc_id per *text* (not per hash), as the
        # SQL oracle defines it — robust to hash collisions
        return (g.groupby(_normalize(g[text_col]), sort=False)
                 .head(1).drop(columns=["text_key", "part"]))

    return keyed.groupby("part").map_groups(keep_first, batch_format="pandas")


def _sorted_token_key(series: pd.Series) -> pd.Series:
    return _normalize(series).map(
        lambda t: " ".join(sorted(t.split(" "))) if t else "")


def token_multiset_dedup(ds, text_col: str = "text"):
    """Order-insensitive exact dedup: two docs are duplicates when
    their token multisets match (classic shuffle-attack-resistant
    near-dup).  Shuffle key = md5 of the sorted token list; the actual
    drop decisions (in-batch combiner AND per-partition keep_first)
    group on the sorted-token STRING, so an md5 collision can never
    merge distinct documents — same discipline as exact_dedup."""
    def key_batch(batch: pd.DataFrame) -> pd.DataFrame:
        st = _sorted_token_key(batch[text_col])
        out = batch.copy()
        # >>1: keep int64-inferable (see text_key)
        out["ms_key"] = [_md5_64(t) >> 1 if t else 0 for t in st]
        out = out.sort_values("doc_id")
        out = out.groupby(st, sort=False).head(1)   # aligns by index
        out["part"] = (out["ms_key"] % 256).astype("int64")
        return out

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        return (g.groupby(_sorted_token_key(g[text_col]), sort=False)
                 .head(1).drop(columns=["ms_key", "part"]))

    return (ds.map_batches(key_batch, batch_format="pandas")
              .groupby("part").map_groups(keep_first, batch_format="pandas"))


def dedup_against_corpus(new_ds, corpus_ds, text_col: str = "text",
                         num_parts: int = 256):
    """Incremental exact dedup: drop NEW documents whose normalized
    text already exists in an established CORPUS, and dedup the new
    batch against itself (min-doc_id survivor) — the operator every
    continuously-ingesting pipeline runs per crawl snapshot (CCNet /
    NeMo-Curator "dedup against previous dumps").  Output: surviving
    new rows as (doc_id, ``text_col``).

    Shape: both sides slim to 16-byte md5 digests of the normalized
    text per in-batch-distinct doc (the combiner); tagged union; ONE
    coarse digest-hash exchange; inside a group, new rows drop on
    digest membership / keep min doc_id per digest.  The corpus ships
    digests ONLY — never its text (re-shuffling an established 100 TB
    corpus's text to string-compare would defeat the point), so unlike
    ``exact_dedup`` the equality witness here is the full 128-bit md5:
    a false drop needs an md5 collision between two normalized
    documents (~2^-64 birthday bound at 10^12 docs), stated as the
    operator's exactness envelope.
    """
    def _digest_frame(batch: pd.DataFrame, kind: int) -> pd.DataFrame:
        norm = _normalize(batch[text_col])
        dig = pd.Series([hashlib.md5(t.encode("utf-8")).digest()
                         for t in norm], index=batch.index, dtype="object")
        if kind == 0:                           # new: keep payload cols
            out = pd.DataFrame({
                "doc_id": batch["doc_id"].astype("int64"),
                text_col: batch[text_col].fillna(""),
                "digest": dig})
            out = (out.sort_values("doc_id")
                   .drop_duplicates("digest", keep="first"))
        else:                                   # corpus: digests only
            out = pd.DataFrame({
                "doc_id": np.full(len(batch), -1, dtype="int64"),
                text_col: pd.Series([""] * len(batch), dtype="object"),
                "digest": dig}).drop_duplicates("digest")
        out["kind"] = np.int8(kind)
        out["part"] = coarse_part(out["digest"], num_parts)
        return typed_if_empty_binary(out, ("digest",))

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        # NOT Series.isin: pandas coerces a bytes collection to
        # fixed-width 'S16', stripping trailing \x00 — any digest
        # ending in a zero byte (~1/16 of md5s) would escape.  map
        # against the set keeps elements as Python bytes.
        seen = set(group.loc[group["kind"] == 1, "digest"])
        g = group[group["kind"] == 0]
        # astype(bool): an empty map yields an OBJECT-dtype mask,
        # which pandas would treat as column selection, not a filter
        g = g[~g["digest"].map(seen.__contains__).astype(bool)]
        g = g.sort_values("doc_id").drop_duplicates("digest",
                                                    keep="first")
        out = g[["doc_id", text_col]].reset_index(drop=True)
        return typed_if_empty(out)

    tagged = (new_ds.map_batches(lambda b: _digest_frame(b, 0),
                                 batch_format="pandas")
              .union(corpus_ds.map_batches(
                  lambda b: _digest_frame(b, 1), batch_format="pandas")))
    return tagged.groupby("part").map_groups(resolve,
                                             batch_format="pandas")


def typed_if_empty_binary(df: pd.DataFrame, binary_cols=()):
    """``typed_if_empty`` variant for frames carrying bytes columns
    (object->string would mistype them; declare binary explicitly)."""
    if len(df):
        return df
    from doc_ocr_ray.util import typed_if_empty as _tie
    fields = []
    t = _tie(df.drop(columns=list(binary_cols)))
    for name in df.columns:
        if name in binary_cols:
            fields.append((name, pa.binary()))
        else:
            fields.append((name, t.schema.field(name).type))
    return pa.schema(fields).empty_table()


# ------------------------------------------------------------- minhash
def char_shingles(text: str, k: int = 5) -> Iterable[str]:
    t = _WS.sub(" ", _EDGE_WS.sub("", text or "").lower())
    if len(t) < k:
        return [t] if t else []
    return (t[i:i + k] for i in range(len(t) - k + 1))


def _perm_params(num_perm: int, seed: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    # multiply-shift hashing (Dietzfelbinger et al.): odd random 64-bit
    # multipliers; the uint64 product wraps mod 2^64, which IS the
    # scrambling — a modulus the product never reaches would leave the
    # hash monotone in the input and every "permutation" would pick the
    # same min shingle
    rng = np.random.RandomState(seed)
    a = (rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
         * np.uint64(2) + np.uint64(1))
    b = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Vectorized k-gram rolling hashes: sliding window over codepoints,
    polynomial hash mod 2^31-1 (one matmul, no per-shingle Python)."""
    t = _WS.sub(" ", _EDGE_WS.sub("", text or "").lower())
    if not t:
        return np.empty(0, dtype=np.uint64)
    c = np.fromiter(map(ord, t), dtype=np.int64, count=len(t))
    if len(c) < k:
        c = np.pad(c, (0, k - len(c)), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(c, k)
    powers = np.array([pow(_SHINGLE_BASE, k - 1 - j, _SHINGLE_MOD)
                       for j in range(k)], dtype=np.int64)
    # codepoint < 2^21, power < 2^31: products < 2^52, k-sum < 2^55 — exact
    return (((win * powers).sum(axis=1)) % _SHINGLE_MOD).astype(np.uint64)


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray,
                      k: int = 5) -> np.ndarray:
    hs = np.unique(shingle_hashes(text, k))
    if hs.size == 0:
        return np.full(len(a), _MAXH, dtype=np.uint64)
    # multiply-shift min-hash per permutation (broadcast, wraps mod 2^64)
    with np.errstate(over="ignore"):
        prods = a[:, None] * hs[None, :] + b[:, None]
    return (prods >> np.uint64(32)).min(axis=1)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


class MinHashStage:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 1):
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # signatures travel as packed uint32 bytes (num_perm*4 B), not
        # Python int lists — an order of magnitude less shuffle volume
        sigs = [minhash_signature(t, self.a, self.b, self.shingle_k)
                .astype(np.uint32).tobytes()
                for t in batch["text"].fillna("")]
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "signature": sigs,
        })
        if "kind" in batch.columns:     # side tag for incremental dedup
            out["kind"] = batch["kind"].to_numpy()
        return out


def _explode_bands(batch: pd.DataFrame, num_bands: int) -> pd.DataFrame:
    rows_doc, rows_band, rows_hash, rows_sig = [], [], [], []
    for doc, sig in zip(batch["doc_id"], batch["signature"]):
        rpb = len(sig) // 4 // num_bands * 4        # bytes per band
        for band in range(num_bands):
            chunk = sig[band * rpb:(band + 1) * rpb]
            rows_doc.append(doc)
            rows_band.append(band)
            rows_hash.append(int.from_bytes(
                hashlib.md5(chunk).digest()[:8], "big") >> 1)
            rows_sig.append(sig)
    out = pd.DataFrame({"doc_id": rows_doc, "band": rows_band,
                        "band_hash": rows_hash, "signature": rows_sig})
    if "kind" in batch.columns:         # side tag for incremental dedup
        out["kind"] = np.repeat(batch["kind"].to_numpy(), num_bands)
    return out


def band_bucket_pairs(group: pd.DataFrame, threshold: float,
                      clique_star: bool = False) -> pd.DataFrame:
    """Candidate-pair enumeration + signature verify over ONE coarse
    partition's (band, band_hash) buckets — the shared reduce of
    :func:`minhash_dedup_pairs` and the checkpointed per-bucket phase
    of ``jobs/run_neardup.py``.  Emits (doc_a, doc_b, est_jaccard)
    with doc_a < doc_b, est on the floor-10000 grid (NOT round():
    est = m/64 sits exactly on the 5th-decimal rounding tie whenever
    m % 4 == 2, where pandas half-even and SQL half-up disagree).

    ``clique_star=True`` is the JOBS-path scale guard against the
    degenerate bucket a real crawl always contains (millions of
    byte-identical boilerplate/empty pages land in ONE bucket, and
    full enumeration is O(b^2) pairs): docs whose FULL signatures are
    identical form a clique, which contributes the same connected
    components through a STAR to its min doc (est 1.0 >= any
    threshold) as through all b(b-1)/2 edges; pairwise verify then
    runs over distinct-signature representatives only.  Connectivity
    (hence the CC drop set) is provably identical — a non-rep member
    has the same signature as its rep, so any rep-rep edge that
    verifies stands in for every member-member edge.  Only the jobs
    path (pairs feed CC) uses it; the oracled full-enumeration
    default stays the library contract."""
    out_a, out_b, out_j = [], [], []
    seen = set()
    for _, bucket in group.groupby(["band", "band_hash"], sort=False):
        if len(bucket) < 2:
            continue
        # reset_index: rep selection below is positional; a caller
        # passing a concat frame with duplicate index labels would
        # otherwise select wrong rows via label lookup (review
        # finding: self-pairs / cross-signature mispairing)
        g = bucket.sort_values("doc_id").reset_index(drop=True)
        if clique_star:
            reps_rows = []
            for _s, sub in g.groupby("signature", sort=False):
                docs_sub = sub["doc_id"].tolist()   # ascending (g sorted)
                m = docs_sub[0]
                for d in docs_sub[1:]:
                    if (m, d) not in seen:
                        seen.add((m, d))
                        out_a.append(m)
                        out_b.append(d)
                        out_j.append(1.0)
                reps_rows.append(int(sub.index[0]))
            g = g.iloc[sorted(reps_rows)]
            if len(g) < 2:
                continue
        docs = g["doc_id"].tolist()
        sgs = np.stack([np.frombuffer(s, dtype=np.uint32)
                        for s in g["signature"]])
        for i in range(len(docs)):
            eq = (sgs[i + 1:] == sgs[i]).mean(axis=1)
            for dj, est in zip(docs[i + 1:], eq):
                if est >= threshold and (docs[i], dj) not in seen:
                    seen.add((docs[i], dj))
                    out_a.append(docs[i])
                    out_b.append(dj)
                    out_j.append(float(np.floor(10000.0 * float(est))
                                       / 10000))
    # explicit dtypes: bare empty lists infer float64 doc ids, and a
    # pairless bucket's empty parquet marker (run_neardup phase 2)
    # must not introduce a double schema into the phase-3 read —
    # doc_ids above 2^53 would corrupt under unification to double
    return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                         "doc_b": pd.Series(out_b, dtype="int64"),
                         "est_jaccard": pd.Series(out_j,
                                                  dtype="float64")})


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

    # Coarse shuffle key: the Ray-level groupby moves each bucket to one
    # worker but keys on bucket_hash % P so a group is MANY buckets —
    # per-group Python call overhead amortizes, the fine-grained
    # bucketing happens vectorized inside the group fn.
    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = (batch["band_hash"] % 256).astype("int64")
        return batch
    parts = bands.map_batches(add_part, batch_format="pandas")

    def part_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return band_bucket_pairs(group, threshold)

    pairs = parts.groupby("part").map_groups(part_pairs, batch_format="pandas")

    # a pair can still surface from buckets in different partitions —
    # final dedupe, again on a coarse key
    def pair_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["ppart"] = ((batch["doc_a"] * 31 + batch["doc_b"]) % 64).astype("int64")
        return batch

    def drop_dup(group: pd.DataFrame) -> pd.DataFrame:
        return (group.drop_duplicates(["doc_a", "doc_b"])
                     .drop(columns=["ppart"]))
    return (pairs.map_batches(pair_part, batch_format="pandas")
                 .groupby("ppart").map_groups(drop_dup, batch_format="pandas"))


def minhash_signatures(ds, text_col: str = "text", num_perm: int = 64,
                       shingle_k: int = 5, concurrency=(1, 8)):
    """Sign a corpus ONCE: (doc_id, signature, num_perm, shingle_k)
    with the signature as packed uint32 bytes.  Persist with
    ``write_table`` and feed the parquet back to
    :func:`minhash_against_corpus` with ``corpus_presigned=True`` —
    per-snapshot incremental dedup then never re-shingles the
    established corpus (the real cost at 10^12 docs; signatures are
    ~256 B/doc).  The parameter columns are constant (they compress
    to nothing) and let the consumer FAIL FAST on a num_perm /
    shingle_k mismatch instead of silently estimating Jaccard across
    incompatible shingle spaces."""
    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "text": batch[text_col]})

    def stamp(batch: pd.DataFrame) -> pd.DataFrame:
        batch["num_perm"] = np.int64(num_perm)
        batch["shingle_k"] = np.int64(shingle_k)
        return batch

    return (ds.map_batches(prep, batch_format="pandas")
            .map_batches(MinHashStage, batch_format="pandas",
                         fn_constructor_kwargs={"num_perm": num_perm,
                                                "shingle_k": shingle_k},
                         concurrency=concurrency)
            .map_batches(stamp, batch_format="pandas"))


def minhash_against_corpus(new_ds, corpus_ds, text_col: str = "text",
                           num_perm: int = 64, num_bands: int = 16,
                           shingle_k: int = 5, threshold: float = 0.6,
                           num_parts: int = 64, concurrency=(1, 8),
                           corpus_presigned: bool = False):
    """Incremental FUZZY dedup: drop NEW documents that near-duplicate
    (MinHash est >= ``threshold``) the established CORPUS or a
    smaller-id new document — the NeMo-Curator fuzzy-incremental shape
    that pairs with :func:`dedup_against_corpus`'s exact variant.
    Output: surviving new rows as (doc_id, ``text_col``).

    Drop rule is a pure PAIR predicate (greedy, non-transitive): a new
    doc drops iff some LSH bucket pairs it at est >= threshold with a
    corpus doc or a smaller-id new doc — deliberately independent of
    whether the blocker itself survives, so the rule needs no
    iteration and the SQL twin states it with one NOT EXISTS.

    Shape: both sides tagged and run through the SAME signature stage
    — or, with ``corpus_presigned=True``, the corpus side is a
    (doc_id, signature) table from :func:`minhash_signatures` and the
    established corpus is never re-shingled — band explode, ONE
    band-hash coarse exchange whose per-bucket scan emits only
    DROPPED new ids (signature bytes never leave the bucket group),
    then one doc-keyed anti-join rebuild.  Corpus text never rides
    any shuffle.
    """
    def _tag(kind):
        def tag(batch: pd.DataFrame) -> pd.DataFrame:
            # normalize the text column name for MinHashStage, which
            # reads batch["text"] (custom text_col would KeyError)
            out = pd.DataFrame({"doc_id": batch["doc_id"],
                                "text": batch[text_col]})
            out["kind"] = np.int8(kind)
            return out
        return tag

    def _sign(ds):
        return ds.map_batches(
            MinHashStage, batch_format="pandas",
            fn_constructor_kwargs={"num_perm": num_perm,
                                   "shingle_k": shingle_k},
            concurrency=concurrency)

    new_sigs = _sign(new_ds.map_batches(_tag(0),
                                        batch_format="pandas"))
    if corpus_presigned:
        def tag_signed(batch: pd.DataFrame) -> pd.DataFrame:
            # fail fast on parameter drift: estimating Jaccard across
            # signatures from different num_perm / shingle_k settings
            # would crash (length mismatch) or, worse, silently keep
            # near-duplicates (incompatible shingle spaces)
            for col, want in (("num_perm", num_perm),
                              ("shingle_k", shingle_k)):
                if col in batch.columns and len(batch):
                    got = set(batch[col].astype(int).unique())
                    if got != {want}:
                        raise ValueError(
                            f"presigned corpus was built with "
                            f"{col}={sorted(got)}, caller wants {want}")
            if len(batch):
                bad = batch["signature"].str.len() != num_perm * 4
                if bool(bad.any()):
                    raise ValueError(
                        "presigned signature byte length does not "
                        f"match num_perm={num_perm} (expected "
                        f"{num_perm * 4} bytes)")
            out = pd.DataFrame({"doc_id": batch["doc_id"],
                                "signature": batch["signature"]})
            out["kind"] = np.int8(1)
            return out
        corpus_sigs = corpus_ds.map_batches(tag_signed,
                                            batch_format="pandas")
    else:
        corpus_sigs = _sign(corpus_ds.map_batches(
            _tag(1), batch_format="pandas"))
    sigs = new_sigs.union(corpus_sigs)
    bands = sigs.map_batches(_explode_bands, batch_format="pandas",
                             fn_kwargs={"num_bands": num_bands})

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = (batch["band_hash"] % num_parts).astype("int64")
        return batch

    def part_drops(group: pd.DataFrame) -> pd.DataFrame:
        dropped: set = set()
        for _, bucket in group.groupby(["band", "band_hash"],
                                       sort=False):
            kinds = bucket["kind"].to_numpy()
            if len(bucket) < 2 or not (kinds == 0).any():
                continue
            ids = bucket["doc_id"].to_numpy()
            sgs = np.stack([np.frombuffer(s, dtype=np.uint32)
                            for s in bucket["signature"]])
            # row-at-a-time scan like part_pairs: O(n*perm) memory per
            # candidate — an n^2 broadcast would OOM on a degenerate
            # bucket (e.g. thousands of all-MAXH empty-doc signatures)
            is_corpus = kinds == 1
            is_new = kinds == 0
            for i in np.flatnonzero(is_new):
                est_i = (sgs == sgs[i]).mean(axis=1)
                blocks = (is_corpus | (is_new & (ids < ids[i])))
                if ((est_i >= threshold) & blocks).any():
                    dropped.add(int(ids[i]))
        return typed_if_empty(pd.DataFrame(
            {"doc_id": pd.Series(sorted(dropped), dtype="int64")}))

    drops = (bands.map_batches(add_part, batch_format="pandas")
             .groupby("part").map_groups(part_drops,
                                         batch_format="pandas"))

    # anti-join rebuild: dropped ids (kind=9 markers) meet the new
    # rows on ONE doc-keyed coarse exchange — no driver set, no
    # broadcast (the marker set is snapshot-sized in the worst case)
    def mark(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            text_col: pd.Series([""] * len(batch), dtype="object"),
            "kind": np.int8(9)})
        out["part"] = coarse_part(out["doc_id"], num_parts)
        return typed_if_empty(out)

    def new_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            text_col: batch[text_col].fillna(""),
            "kind": np.int8(0)})
        out["part"] = coarse_part(out["doc_id"], num_parts)
        return typed_if_empty(out)

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        bad = set(group.loc[group["kind"] == 9, "doc_id"].tolist())
        g = group[group["kind"] == 0]
        g = g[~g["doc_id"].isin(bad)]   # int64 keys — isin is safe here
        return typed_if_empty(
            g[["doc_id", text_col]].reset_index(drop=True))

    union = (new_ds.map_batches(new_rows, batch_format="pandas")
             .union(drops.map_batches(mark, batch_format="pandas")))
    return union.groupby("part").map_groups(resolve,
                                            batch_format="pandas")


def dedup_clusters(pairs_ds, max_iters: int = 30, num_parts: int = 64):
    """Connected components over the duplicate-pair graph -> (doc_id,
    cluster) with cluster = min doc_id of the component.

    Fully distributed: NOTHING graph-sized ever lands on the driver —
    each round is a hash-partitioned edge⋈label join (tagged-union +
    coarse-key groupby, the same shuffle discipline as every other
    exchange here) and convergence is a distributed sum over per-node
    changed flags.  Per round:

    1. neighbor-min: each edge endpoint sends its label to the other
       side (join on the source node), then a per-node min combines
       messages with the old label;
    2. pointer jumping x2: label <- label[label] via a self-join of the
       label table keyed on the label value.  Chains contract
       geometrically, so a path of length L converges in O(log L)
       rounds instead of O(L) — the property that makes web-scale
       duplicate chains (10^8-node components) tractable.

    The label table lives in the object store (``materialize()``) and
    is re-joined each round; only the scalar changed-count crosses to
    the driver.
    """
    P = num_parts

    edges = pairs_ds.select_columns(["doc_a", "doc_b"]).materialize()

    def seed_labels(batch: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.unique(pd.concat([batch["doc_a"], batch["doc_b"]]))
        return pd.DataFrame({"node": nodes, "label": nodes})

    def node_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = (batch["node"] % P).astype("int64")
        return batch

    def dedup_min(group: pd.DataFrame) -> pd.DataFrame:
        return (group.groupby("node", sort=False)["label"].min()
                     .reset_index())

    labels = (edges.map_batches(seed_labels, batch_format="pandas")
              .map_batches(node_part, batch_format="pandas")
              .groupby("part").map_groups(dedup_min, batch_format="pandas")
              ).materialize()

    # block budget for the per-round coalesce: few blocks at test scale
    # (task overhead dominates), proportional blocks at web scale
    # (~2M label rows per block).  The node set is fixed, so count once.
    n_nodes = labels.count()
    label_blocks = max(8, n_nodes // 2_000_000)

    # ---- join plumbing: tagged union on join_key, coarse partition
    def jpart(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = (batch["join_key"] % P).astype("int64")
        return batch

    def edge_requests(batch: pd.DataFrame) -> pd.DataFrame:
        # both directions: src's label must reach dst
        return pd.DataFrame({
            "join_key": pd.concat([batch["doc_a"], batch["doc_b"]],
                                  ignore_index=True),
            "other": pd.concat([batch["doc_b"], batch["doc_a"]],
                               ignore_index=True),
            "changed": np.int8(0),
            "is_prov": np.int8(0)})

    def label_providers(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "join_key": batch["node"], "other": batch["label"],
            "changed": np.int8(0), "is_prov": np.int8(1)})

    def join_emit(group: pd.DataFrame) -> pd.DataFrame:
        """requests (join_key, other=dst) x providers (join_key,
        other=label) -> (node=dst, label)."""
        prov = group[group["is_prov"] == 1]
        req = group[group["is_prov"] == 0]
        m = req[["join_key", "other"]].merge(
            prov[["join_key", "other"]].rename(columns={"other": "label"}),
            on="join_key", how="inner")
        return pd.DataFrame({"node": m["other"], "label": m["label"]})

    def combine_min(group: pd.DataFrame) -> pd.DataFrame:
        """old labels (is_old=1) + messages -> per-node min + changed."""
        mn = (group.groupby("node", sort=False)["label"].min()
                   .reset_index())
        old = group[group["is_old"] == 1].set_index("node")["label"]
        mn["changed"] = (mn["label"]
                         < old.reindex(mn["node"]).to_numpy()).astype("int8")
        return mn

    def jump_emit(group: pd.DataFrame) -> pd.DataFrame:
        """requests (join_key=old label, other=node, changed) x
        providers (join_key=node, other=that node's label) ->
        (node, label[label], changed).  The request's join_key IS the
        node's old label, so changed needs no extra pass."""
        prov = group[group["is_prov"] == 1]
        req = group[group["is_prov"] == 0]
        m = req[["join_key", "other", "changed"]].merge(
            prov[["join_key", "other"]].rename(columns={"other": "label"}),
            on="join_key", how="inner")
        return pd.DataFrame({
            "node": m["other"], "label": m["label"],
            "changed": np.maximum(
                m["changed"].to_numpy(),
                (m["label"] != m["join_key"]).astype("int8"))})

    def jump_both(batch: pd.DataFrame) -> pd.DataFrame:
        """Emit requests AND providers from one pass so the (lazy)
        upstream is consumed exactly once per jump."""
        ch = (batch["changed"].astype("int8") if "changed" in batch.columns
              else pd.Series(np.zeros(len(batch), dtype="int8")))
        reqs = pd.DataFrame({
            "join_key": batch["label"], "other": batch["node"],
            "changed": ch.to_numpy(), "is_prov": np.int8(0)})
        provs = pd.DataFrame({
            "join_key": batch["node"], "other": batch["label"],
            "changed": np.int8(0), "is_prov": np.int8(1)})
        return pd.concat([reqs, provs], ignore_index=True)

    def jump(lab_ds):
        return (lab_ds.map_batches(jump_both, batch_format="pandas")
                .map_batches(jpart, batch_format="pandas")
                .groupby("part").map_groups(jump_emit, batch_format="pandas"))

    for _ in range(max_iters):
        # 1. neighbor-min
        msgs = (edges.map_batches(edge_requests, batch_format="pandas")
                .union(labels.map_batches(label_providers,
                                          batch_format="pandas"))
                .map_batches(jpart, batch_format="pandas")
                .groupby("part").map_groups(join_emit, batch_format="pandas"))
        tagged_old = labels.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "label": b["label"],
                                    "is_old": np.int8(1)}),
            batch_format="pandas")
        tagged_msgs = msgs.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "label": b["label"],
                                    "is_old": np.int8(0)}),
            batch_format="pandas")
        combined = (tagged_old.union(tagged_msgs)
                    .map_batches(node_part, batch_format="pandas")
                    .groupby("part").map_groups(combine_min,
                                                batch_format="pandas"))
        # 2. pointer jumping x2.  The repartition is load-bearing: the
        # unions above double the block count every round (3 -> 7 -> 15
        # -> ... -> 1000+), so without coalescing, task count grows
        # exponentially with rounds.
        jumped = (jump(jump(combined))
                  .repartition(label_blocks).materialize())
        changed = jumped.sum("changed")
        labels = jumped
        if not changed:
            break
    return labels.map_batches(
        lambda b: b[["node", "label"]].rename(
            columns={"node": "doc_id", "label": "cluster"}),
        batch_format="pandas")


def drop_near_duplicates(ds, pairs_ds, strategy: str = "auto",
                         broadcast_limit: int = 50_000_000):
    """Keep-min pruning: drop every doc that near-duplicates a
    smaller-id doc.

    - ``auto`` (default; round-3 verdict item 4): count the victim
      side first — a cheap metadata pass over the materialized pair
      list — then pick and LOG the choice, so the default is safe at
      any scale instead of putting the memory envelope on the caller.
      ``broadcast_limit`` is the victim-count cutover (int64 ids in a
      shared-memory numpy array: 50M ids = 400 MB plasma, zero-copy
      per node, not per task).
    - ``broadcast``: the victim id-set rides the object store once
      and the anti-join is a shuffle-free ``map_batches`` filter.
    - ``shuffle``: tagged-union + coarse-key groupby anti-join — one
      corpus shuffle, no memory assumption.  Right when the duplicate
      fraction is so large the victim set itself is at corpus scale.
    """
    import logging

    import ray

    if strategy == "auto":
        pairs_ds = pairs_ds.materialize()
        n_pairs = pairs_ds.count()       # victims <= pairs: free bound
        strategy = ("broadcast" if n_pairs <= broadcast_limit
                    else "shuffle")
        logging.getLogger(__name__).info(
            "drop_near_duplicates auto: %d candidate pairs -> %s "
            "(cutover %d)", n_pairs, strategy, broadcast_limit)

    if strategy == "shuffle":
        def tag_docs(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["is_victim"] = np.int8(0)
            batch["part"] = coarse_part(batch["doc_id"], 256)
            return batch

        def tag_victims(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"doc_id": batch["doc_b"].unique()})
            out["is_victim"] = np.int8(1)
            out["part"] = coarse_part(out["doc_id"], 256)
            return out

        def anti(group: pd.DataFrame) -> pd.DataFrame:
            victims = set(group.loc[group["is_victim"] == 1, "doc_id"])
            keep = group[(group["is_victim"] == 0)
                         & ~group["doc_id"].isin(victims)]
            return keep.drop(columns=["is_victim", "part"])

        docs = ds.map_batches(tag_docs, batch_format="pandas")
        vic = pairs_ds.select_columns(["doc_b"]).map_batches(
            tag_victims, batch_format="pandas")
        # schema union: victim rows lack the doc columns; pandas concat
        # fills NaN, which the group fn never emits (is_victim==1 rows
        # are filter-only)
        return docs.union(vic).groupby("part").map_groups(
            anti, batch_format="pandas")

    # distributed distinct first, then a NUMPY id array (8 B/id,
    # zero-copy from plasma per node) — not a Python set (~90 B/id,
    # pickled per worker)
    victims = np.asarray(
        pairs_ds.select_columns(["doc_b"]).unique("doc_b"),
        dtype=np.int64)
    ref = ray.put(victims)

    def drop(batch: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(ref)
        return batch[~batch["doc_id"].isin(v)]
    return ds.map_batches(drop, batch_format="pandas")


# ------------------------------------------------------------- simhash
_token_hash_cache: dict = {}


def _token_hash(tok: str) -> int:
    h = _token_hash_cache.get(tok)
    if h is None:
        h = _md5_64(tok)
        if len(_token_hash_cache) < 1_000_000:
            _token_hash_cache[tok] = h
    return h


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (Charikar'02).

    Token hashes are md5-based but cached per worker (corpus
    vocabularies are Zipfian, so the cache hit rate is high); the
    bit-vote accumulation is one vectorized reduction.
    """
    t = _WS.sub(" ", _EDGE_WS.sub("", text or "").lower())
    if not t:
        return 0
    hs = np.array([_token_hash(tok) for tok in t.split(" ")], dtype=np.uint64)
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = np.uint64(0)
    for i in np.nonzero(acc > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return int(out)


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
    # materialize: four per-band pipelines consume this — without it,
    # simhash recomputes 4x (lazy lineage re-execution)
    hashed = ds.map_batches(simhash_batch,
                            batch_format="pandas").materialize()
    return hash64_band_pairs(hashed, hash_col="simhash",
                             max_hamming=max_hamming)


def hash64_band_pairs(hashed, hash_col: str = "simhash",
                      max_hamming: int = 3):
    """Banded near-dup pairs over ANY 64-bit per-doc hash: the
    4x16-bit pigeonhole blocking + in-bucket hamming verify that
    `simhash_dedup_pairs` introduced, factored out so other hash
    domains (perceptual image dHash in `stages/multimodal.py`) reuse
    the identical shuffle shape.  ``hashed`` must carry ``doc_id``,
    ``hash_col`` (int64, two's-complement of the uint64 hash) and
    ``band0..band3`` (the 16-bit slices); hamming <= 3 pigeonhole-
    implies a shared band, so the plain hamming predicate is the
    output contract.  Callers materialize ``hashed`` first — four
    per-band pipelines consume it."""

    def bucket_pairs_factory(band_col):
        def part_pairs(group: pd.DataFrame) -> pd.DataFrame:
            a_, b_, d_ = [], [], []
            for _, bucket in group.groupby(band_col, sort=False):
                if len(bucket) < 2:
                    continue
                g = bucket.sort_values("doc_id")
                docs = g["doc_id"].tolist()
                hs = g[hash_col].to_numpy(dtype=np.int64).astype(np.uint64)
                for i in range(len(docs)):
                    x = hs[i + 1:] ^ hs[i]
                    # vectorized popcount via bit tricks
                    d = np.array([bin(int(v)).count("1") for v in x])
                    hit = d <= max_hamming
                    for dj, dd in zip(np.array(docs[i + 1:])[hit], d[hit]):
                        a_.append(docs[i]); b_.append(int(dj)); d_.append(int(dd))
            return pd.DataFrame({"doc_a": a_, "doc_b": b_, "hamming": d_})
        return part_pairs

    per_band = []
    for band in range(4):
        cols = hashed.select_columns(["doc_id", hash_col, f"band{band}"])

        def add_part(batch: pd.DataFrame, band=band) -> pd.DataFrame:
            # assign (copy) — the Project upstream hands us a view and
            # in-place writes spam SettingWithCopyWarning per batch
            return batch.assign(
                part=(batch[f"band{band}"] % 64).astype("int64"))
        per_band.append(
            cols.map_batches(add_part, batch_format="pandas")
                .groupby("part").map_groups(bucket_pairs_factory(f"band{band}"),
                                            batch_format="pandas")
                .select_columns(["doc_a", "doc_b", "hamming"]))
    pairs = per_band[0].union(*per_band[1:])

    def pair_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["ppart"] = ((batch["doc_a"] * 31 + batch["doc_b"]) % 64).astype("int64")
        return batch

    def drop_dup(group: pd.DataFrame) -> pd.DataFrame:
        return (group.drop_duplicates(["doc_a", "doc_b"])
                     .drop(columns=["ppart"]))
    return (pairs.map_batches(pair_part, batch_format="pandas")
                 .groupby("ppart").map_groups(drop_dup, batch_format="pandas"))


# ----------------------------------------------- exact n-gram jaccard
def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(char_shingles(a, k)), set(char_shingles(b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _md5_shingle_set(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique 63-bit md5 hashes of the k-gram set.  md5 (not the
    rolling poly hash) so hash-set Jaccard equals string-set Jaccard:
    a 2^31-space rolling hash collides often enough across a candidate
    corpus to shift a ratio off its oracle value."""
    return np.unique(np.fromiter(
        (_md5_64(g) >> 1 for g in set(char_shingles(text, k))),
        dtype=np.int64, count=-1))


# Multiply-shift constants for the candidate-id bloom filter (two
# independent odd multipliers; uint64 wrap is the hash — same family as
# the MinHash permutations, see the modulus lesson in that docstring).
_BLOOM_C1 = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_C2 = np.uint64(0xC2B2AE3D27D4EB4F)
_BLOOM_CAP_BITS = 1 << 28          # 32 MiB of driver heap, hard cap


def _bloom_indices(ids: np.ndarray, m_bits: int):
    """Two bit positions per id (k=2 bloom), vectorized uint64
    multiply-shift; ``m_bits`` must be a power of two."""
    x = ids.astype(np.uint64)
    mask = np.uint64(m_bits - 1)
    h1 = ((x * _BLOOM_C1) >> np.uint64(32)) & mask
    h2 = ((x * _BLOOM_C2) >> np.uint64(32)) & mask
    return h1, h2


def _bloom_test(bloom: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Vectorized membership test: True where BOTH bits are set."""
    m_bits = len(bloom) * 64
    h1, h2 = _bloom_indices(ids, m_bits)
    t1 = (bloom[(h1 >> np.uint64(6)).astype(np.int64)]
          >> (h1 & np.uint64(63))) & np.uint64(1)
    t2 = (bloom[(h2 >> np.uint64(6)).astype(np.int64)]
          >> (h2 & np.uint64(63))) & np.uint64(1)
    return (t1 & t2).astype(bool)


def _candidate_bloom(pairs, n_pairs: int) -> np.ndarray:
    """Bloom filter over every doc id appearing in ``pairs``: the
    driver streams the raw id batches (16 B/pair ingress — a first
    cut shipped one m/8-byte bitmask PARTIAL per batch, ~512 B/pair
    at the cap and quadratic-ish below it; round-4 review finding)
    and sets bits into ONE capped numpy array, so driver heap stays
    O(m) regardless of candidate count.  Sized at ~16 bits/id (k=2 →
    ~2% false positives) up to a 32 MiB cap; past the cap the fp
    rate rises gracefully, costing only extra payload rows that the
    exchange-A inner merge drops."""
    m_bits = 1 << 20
    while m_bits < 16 * 2 * n_pairs and m_bits < _BLOOM_CAP_BITS:
        m_bits <<= 1
    bloom = np.zeros(m_bits // 64, dtype=np.uint64)
    for batch in pairs.iter_batches(batch_size=65536,
                                    batch_format="pandas"):
        ids = np.concatenate([
            batch["doc_a"].to_numpy(dtype=np.int64),
            batch["doc_b"].to_numpy(dtype=np.int64)])
        for h in _bloom_indices(ids, m_bits):
            np.bitwise_or.at(bloom,
                             (h >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (h & np.uint64(63)))
    return bloom


def _pair_verify_scaffold(ds, pairs_ds, per_doc, empty_df,
                          num_doc_parts: int = 64,
                          num_pair_parts: int = 64):
    """Shared distributed-join skeleton for the pair verifiers
    (:func:`verify_pairs_exact`, :func:`verify_pairs_edit`,
    :func:`setsim_join_pairs`) — the ``dedup_keep_best`` tagged-union
    shape (:func:`dedup_keep_best`): payloads meet their pairs inside
    group functions; NOTHING candidate-set-sized ever lives on the
    driver (round-2 finding: the previous version ``take_all()``-ed
    every candidate payload into one driver dict and ``ray.put`` it —
    tens of GB at 1e9 docs with a 1-5% LSH candidate rate).

    1. candidate pairs materialize once; a FIXED-SIZE bloom filter of
       the candidate ids (built by OR-ing per-batch bitmask partials —
       the driver holds one capped numpy array, never a per-id Python
       structure; round-3 finding: a ``set()`` of ints costs
       ~60-100 B/entry, several GB of driver heap at 1e9 docs × 1-5%
       candidate rate) is broadcast to prune the corpus scan.  Bloom
       false positives are HARMLESS: a payload row nobody requested is
       dropped by the inner merge in exchange A; false negatives are
       impossible, so results are byte-identical to the exact prune;
    2. payload rows ``(doc_id, payload: bytes)`` come from a
       distributed filter over the corpus (``per_doc(hit_rows) ->
       sequence[bytes]``) — candidate-sized output;
    3. exchange A (coarse ``doc_id`` key): payload rows ⊎ per-side
       pair request rows ``(doc_id, doc_a, doc_b, ppart)``; each
       request row picks up its doc's payload via a partition-local
       inner merge (docs absent from the corpus drop here, matching
       the old ``.get(...) is None`` skip);
    4. exchange B (coarse pair key): the two sides of each pair meet
       and pivot into one row per DISTINCT pair.

    Returns ``(Dataset[(doc_a, doc_b, payload_a, payload_b)] | None,
    empty_dataset)`` — callers map their score fn over the joined
    pairs, reading both payloads straight from the batch."""
    import ray
    import ray.data as _rd
    import pyarrow as pa

    pairs = pairs_ds.select_columns(["doc_a", "doc_b"]).materialize()
    n_pairs = pairs.count()          # metadata read, no data movement
    if not n_pairs:
        return None, _rd.from_pandas(empty_df)
    bloom_ref = ray.put(_candidate_bloom(pairs, n_pairs))

    _TAGGED = pa.schema([
        ("doc_id", pa.int64()), ("side", pa.int64()),
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("ppart", pa.int64()), ("dpart", pa.int64()),
        ("payload", pa.binary())])
    _ATTACHED = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("ppart", pa.int64()), ("doc_id", pa.int64()),
        ("payload", pa.binary())])
    _JOINED = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("payload_a", pa.binary()), ("payload_b", pa.binary())])

    def _empty(schema: pa.Schema) -> pa.Table:
        # typed_if_empty maps object->string; payloads are BINARY, so
        # empties carry an explicit schema (incl. the shuffle keys —
        # a key-less empty that wins sort-schema unification crashes
        # the downstream groupby order-dependently)
        return pa.table({f.name: pa.array([], f.type) for f in schema})

    def gather(batch: pd.DataFrame):
        bloom = ray.get(bloom_ref)
        hit = batch[_bloom_test(
            bloom, batch["doc_id"].to_numpy(dtype=np.int64))]
        if not len(hit):
            return _empty(_TAGGED)
        ids = hit["doc_id"].astype("int64")
        n = len(hit)
        return pd.DataFrame({
            "doc_id": ids.to_numpy(),
            "side": np.zeros(n, dtype="int64"),
            "doc_a": np.full(n, -1, dtype="int64"),
            "doc_b": np.full(n, -1, dtype="int64"),
            "ppart": np.full(n, -1, dtype="int64"),
            "dpart": coarse_part(ids, num_doc_parts),
            "payload": [bytes(p) for p in per_doc(hit)]})

    def requests(batch: pd.DataFrame):
        if not len(batch):
            return _empty(_TAGGED)
        a = batch["doc_a"].astype("int64").to_numpy()
        bb = batch["doc_b"].astype("int64").to_numpy()
        pp = ((a * 31 + bb) % num_pair_parts).astype("int64")
        ids = np.concatenate([a, bb])
        return pd.DataFrame({
            "doc_id": ids,
            "side": np.ones(2 * len(a), dtype="int64"),
            "doc_a": np.concatenate([a, a]),
            "doc_b": np.concatenate([bb, bb]),
            "ppart": np.concatenate([pp, pp]),
            "dpart": coarse_part(pd.Series(ids), num_doc_parts),
            "payload": [b""] * (2 * len(a))})

    tagged = (ds.map_batches(gather, batch_format="pandas")
              .union(pairs.map_batches(requests, batch_format="pandas")))

    def attach(group: pd.DataFrame):
        pay = group.loc[group["side"] == 0, ["doc_id", "payload"]]
        req = group.loc[group["side"] == 1,
                        ["doc_id", "doc_a", "doc_b", "ppart"]]
        out = req.merge(pay, on="doc_id", how="inner")
        if not len(out):
            return _empty(_ATTACHED)
        return out[["doc_a", "doc_b", "ppart", "doc_id", "payload"]]

    def assemble(group: pd.DataFrame):
        a_side = (group.loc[group["doc_id"] == group["doc_a"],
                            ["doc_a", "doc_b", "payload"]]
                  .drop_duplicates(["doc_a", "doc_b"])
                  .rename(columns={"payload": "payload_a"}))
        b_side = (group.loc[group["doc_id"] == group["doc_b"],
                            ["doc_a", "doc_b", "payload"]]
                  .drop_duplicates(["doc_a", "doc_b"])
                  .rename(columns={"payload": "payload_b"}))
        out = a_side.merge(b_side, on=["doc_a", "doc_b"], how="inner")
        if not len(out):
            return _empty(_JOINED)
        return out[["doc_a", "doc_b", "payload_a", "payload_b"]]

    joined = (tagged.groupby("dpart")
              .map_groups(attach, batch_format="pandas")
              .groupby("ppart")
              .map_groups(assemble, batch_format="pandas"))
    return joined, _rd.from_pandas(empty_df)


def verify_pairs_exact(ds, pairs_ds, k: int = 5, threshold: float = 0.8):
    """Exact n-gram Jaccard verification of candidate pairs — the
    :func:`_pair_verify_scaffold` shape with shingle-hash sets as the
    per-doc payload.  Pairs where either side has no shingles (empty
    text) are dropped.  ``jaccard`` uses the grid-safe ratio
    floor(1e4*inter/union)/1e4 (identical op order to the SQL oracle;
    round() is half-up in DuckDB but half-even here).  Returns a
    Dataset (doc_a, doc_b, jaccard)."""
    joined, empty = _pair_verify_scaffold(
        ds, pairs_ds,
        lambda hit: [_md5_shingle_set(t, k).tobytes()
                     for t in hit["text"].fillna("")],
        pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64")}))
    if joined is None:
        return empty

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for a, b, raw_a, raw_b in zip(batch["doc_a"], batch["doc_b"],
                                      batch["payload_a"],
                                      batch["payload_b"]):
            sa = np.frombuffer(raw_a, dtype=np.int64)
            sb = np.frombuffer(raw_b, dtype=np.int64)
            if not len(sa) or not len(sb):
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = len(sa) + len(sb) - inter
            if inter / union >= threshold:
                out_a.append(int(a)); out_b.append(int(b))
                out_j.append(np.floor(10000 * inter / union) / 10000)
        return pd.DataFrame({
            "doc_a": pd.Series(out_a, dtype="int64"),
            "doc_b": pd.Series(out_b, dtype="int64"),
            "jaccard": pd.Series(out_j, dtype="float64")})

    return joined.map_batches(score, batch_format="pandas")


def verify_pairs_containment(ds, pairs_ds, k: int = 5,
                             t_milli: int = 500):
    """CONTAINMENT verification of candidate pairs — the
    quote/superset detector resemblance misses: a short document fully
    embedded in a long one has Jaccard ~ \\|A\\|/\\|B\\| (tiny) but
    containment ``inter / min(|A|, |B|) = 1``.  Same distributed
    :func:`_pair_verify_scaffold` shape as :func:`verify_pairs_exact`
    (md5 shingle-hash sets as the payload); keeps pairs with
    ``cont_milli = (1000*inter) // min(|A|, |B|) >= t_milli`` (pure
    integers, the predicate ``1000*inter >= t_milli*min`` is stated
    identically in the SQL twin).  Returns (doc_a, doc_b,
    cont_milli)."""
    joined, empty = _pair_verify_scaffold(
        ds, pairs_ds,
        lambda hit: [_md5_shingle_set(t, k).tobytes()
                     for t in hit["text"].fillna("")],
        pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "cont_milli": pd.Series([], dtype="int64")}))
    if joined is None:
        return empty

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c = [], [], []
        for a, b, raw_a, raw_b in zip(batch["doc_a"], batch["doc_b"],
                                      batch["payload_a"],
                                      batch["payload_b"]):
            sa = np.frombuffer(raw_a, dtype=np.int64)
            sb = np.frombuffer(raw_b, dtype=np.int64)
            if not len(sa) or not len(sb):
                continue
            inter = int(np.intersect1d(sa, sb, assume_unique=True).size)
            lo = min(len(sa), len(sb))
            if 1000 * inter >= t_milli * lo:
                out_a.append(int(a)); out_b.append(int(b))
                out_c.append((1000 * inter) // lo)
        return typed_if_empty(pd.DataFrame({
            "doc_a": pd.Series(out_a, dtype="int64"),
            "doc_b": pd.Series(out_b, dtype="int64"),
            "cont_milli": pd.Series(out_c, dtype="int64")}))

    return joined.map_batches(score, batch_format="pandas")


def dedup_keep_best(docs_ds, clusters_ds, num_partitions: int = 64):
    """Canonical-document selection per near-duplicate cluster: the
    highest whitespace-token-count member wins, ties to the smaller
    doc_id; docs outside every cluster keep themselves (singleton
    cluster = own id).  This is the curation end-game the pair/cluster
    operators feed: corpus -> candidate pairs -> verified clusters ->
    ONE survivor per cluster.

    Shuffle shape: a typed tagged union (token counts ⊎ cluster
    labels, both int64-valued) rides ONE coarse doc_id partition for
    the left-join label resolution — no broadcast, no memory
    assumption, so it holds even when the duplicate graph is
    corpus-sized (unlike ``drop_near_duplicates``' broadcast
    strategy); a second coarse partition on cluster id takes the
    per-cluster argmax.
    """
    from doc_ocr_ray.stages.text_analysis import token_count_batch

    def part_of(series: pd.Series) -> np.ndarray:
        return coarse_part(series, num_partitions)

    def tag_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        t = token_count_batch(batch)
        return pd.DataFrame({
            "doc_id": t["doc_id"].astype("int64"),
            "val": t["n_tokens"].astype("int64"),
            "side": np.zeros(len(t), dtype="int64"),
            "part": part_of(t["doc_id"]),
        })

    def tag_labels(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "val": batch["cluster"].astype("int64"),
            "side": np.ones(len(batch), dtype="int64"),
            "part": part_of(batch["doc_id"]),
        })

    tagged = (docs_ds.map_batches(tag_tokens, batch_format="pandas")
              .union(clusters_ds.map_batches(tag_labels,
                                             batch_format="pandas")))

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        toks = (group[group["side"] == 0][["doc_id", "val"]]
                .rename(columns={"val": "n_tokens"}))
        labs = (group[group["side"] == 1][["doc_id", "val"]]
                .rename(columns={"val": "cluster"}))
        # nullable Int64 on the label side: a plain left merge would
        # upcast the WHOLE cluster column to float64 whenever any doc
        # lacks a label, silently rounding ids above 2^53
        labs = labs.astype({"cluster": "Int64"})
        out = toks.merge(labs, on="doc_id", how="left")
        cl = out["cluster"]
        out["cluster"] = np.where(cl.isna(), out["doc_id"].to_numpy(),
                                  cl.fillna(0).astype("int64").to_numpy())
        out["part"] = part_of(out["cluster"])
        return out

    def argmax_per_cluster(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cluster", "n_tokens", "doc_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
        top = g.drop_duplicates("cluster")
        return top[["cluster", "doc_id", "n_tokens"]]

    return (tagged.groupby("part")
            .map_groups(resolve, batch_format="pandas")
            .groupby("part")
            .map_groups(argmax_per_cluster, batch_format="pandas"))


def dedup_keep_min(ids_ds, clusters_ds, id_col: str = "doc_id",
                   num_partitions: int = 64):
    """Scoreless survivor selection: keep the SMALLEST id per
    near-duplicate cluster, singletons keep themselves — the
    `dedup_keep_best` shape for domains without a quality column
    (perceptual image clusters have no token count to argmax).

    ``ids_ds`` carries every id in the corpus (``id_col``);
    ``clusters_ds`` the (doc_id, cluster) labels from
    :func:`dedup_clusters` (a subset — only docs that had a pair).
    Same two-exchange tagged-union shape as keep_best: ids ⊎ labels
    on one coarse doc partition resolve each doc's cluster, a second
    coarse cluster partition takes the min.  Output:
    (cluster, doc_id) — one surviving id per cluster.
    """
    def part_of(series: pd.Series) -> np.ndarray:
        return coarse_part(series, num_partitions)

    def tag_ids(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].astype("int64")
        return pd.DataFrame({
            "doc_id": ids, "val": ids,
            "side": np.zeros(len(ids), dtype="int64"),
            "part": part_of(ids)})

    def tag_labels(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "val": batch["cluster"].astype("int64"),
            "side": np.ones(len(batch), dtype="int64"),
            "part": part_of(batch["doc_id"])})

    tagged = (ids_ds.map_batches(tag_ids, batch_format="pandas")
              .union(clusters_ds.map_batches(tag_labels,
                                             batch_format="pandas")))

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        # label rows (side 1) override the id row's own-id default;
        # sort puts them last so tail(1) per doc picks the label
        g = group.sort_values(["doc_id", "side"], kind="mergesort")
        last = g.groupby("doc_id", sort=False).tail(1)
        # docs absent from ids_ds (defensive: labels must be a subset)
        # contribute no survivor candidate
        present = set(g.loc[g["side"] == 0, "doc_id"].to_numpy())
        last = last[last["doc_id"].isin(present)]
        out = pd.DataFrame({
            "doc_id": last["doc_id"].to_numpy(),
            "cluster": last["val"].to_numpy()})
        out["part"] = part_of(out["cluster"])
        return typed_if_empty(out)

    def min_per_cluster(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("cluster", sort=False)["doc_id"]
             .min().reset_index())
        return typed_if_empty(
            g[["cluster", "doc_id"]].astype("int64"))

    return (tagged.groupby("part")
            .map_groups(resolve, batch_format="pandas")
            .groupby("part")
            .map_groups(min_per_cluster, batch_format="pandas"))


# ----------------------------------------------------------- line dedup
def dedup_lines(ds, text_col: str = "text", num_parts: int = 256):
    """C4/Dolma-style duplicated-LINE removal across the whole corpus:
    any exact line occurring more than once (in any document,
    including twice in one document) keeps only its globally first
    occurrence — smallest ``(doc_id, line_no)`` — and every other
    occurrence is deleted from its document.  Documents are rebuilt
    from their surviving lines in order; a document whose every line
    loses drops out entirely (C4 §2.2's "discard three-sentence spans
    seen before" rule, applied at line granularity).

    Shape: explode to (doc_id, line_no, line) with an IN-BATCH
    keep-first combiner, so a line repeated millions of times ships at
    most one candidate row per batch instead of one per occurrence
    (skew containment); ONE coarse line-keyed exchange picks the
    global winner per line — grouped on ``hash(line) % num_parts``
    but compared on the line STRING inside the group, so hash
    collisions can never merge distinct lines; ONE doc-keyed exchange
    reassembles survivors.  Line strings cross the wire once each;
    full documents never ride a shuffle.
    """
    from doc_ocr_ray.util import typed_if_empty

    def _typed_lines(df: pd.DataFrame) -> pd.DataFrame:
        if len(df):
            return df
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "line_no": pd.Series([], dtype="int64"),
            "line": pd.Series([], dtype="object"),
            "part": pd.Series([], dtype="int64")})

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        lines = batch[text_col].fillna("").str.split("\n")
        n = lines.str.len().to_numpy()
        if n.sum() == 0:
            return typed_if_empty(_typed_lines(pd.DataFrame()))
        flat = pd.DataFrame({
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), n),
            "line_no": np.concatenate(
                [np.arange(c, dtype=np.int64) for c in n]),
            "line": [l for ls in lines for l in ls],
        })
        # combiner: the global first occurrence is necessarily each
        # batch's first occurrence, so one candidate per distinct
        # line per batch suffices
        flat = (flat.sort_values(["line", "doc_id", "line_no"])
                .drop_duplicates("line", keep="first"))
        flat["part"] = coarse_part(flat["line"], num_parts)
        return flat.reset_index(drop=True)

    def winner_part(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.sort_values(["line", "doc_id", "line_no"])
             .drop_duplicates("line", keep="first"))
        g = g[["doc_id", "line_no", "line"]].copy()
        g["dpart"] = coarse_part(g["doc_id"], num_parts)
        return g.reset_index(drop=True)

    def rebuild_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["doc_id", "line_no"])
        agg = (g.groupby("doc_id", sort=False)["line"]
               .agg("\n".join).reset_index())
        agg.columns = ["doc_id", text_col]
        return agg

    return (ds.map_batches(explode, batch_format="pandas")
            .groupby("part").map_groups(winner_part,
                                        batch_format="pandas")
            .groupby("dpart").map_groups(rebuild_part,
                                         batch_format="pandas"))


# -------------------------------------- cross-doc duplicated substrings
def _window_grams(flat: pd.DataFrame, window: int, doc_col: str):
    """Shift-concat window-gram construction shared by the three
    ExactSubstr-family explodes (signals / removal / contamination):
    ``flat`` has one row per token (``word`` plus the per-document
    grouping column ``doc_col``); returns ``(valid, gram)`` where
    ``valid`` is a boolean Series over ``flat``'s rows (True where a
    full ``window``-token gram starts) and ``gram`` the space-joined
    gram strings aligned to ``flat.index[valid]``.  One definition so
    the measurement, the edit and the matrix stay gram-identical.
    """
    g = flat.groupby(doc_col, sort=False)["word"]
    parts = [flat["word"]] + [g.shift(-i) for i in range(1, window)]
    valid = parts[-1].notna()           # has window-1 successors
    gram = parts[0][valid]
    for p in parts[1:]:                 # all non-null where valid
        gram = gram + " " + p[valid]
    return valid, gram


def dup_substr_signals(ds, window: int = 8, text_col: str = "text",
                       num_parts: int = 256):
    """ExactSubstr-style duplicated-substring signals (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): for
    every document with at least ``window`` whitespace tokens, count
    how many of its overlapping ``window``-token substrings occur MORE
    THAN ONCE corpus-wide — in any other document or repeated within
    the same one.  Unlike ``dup_ngram_frac_batch`` (Gopher's
    WITHIN-doc repetition signal) this predicate is global: it is the
    cross-document memorization filter.  Output per qualifying doc:
    ``(doc_id, n_windows, dup_windows, dup_frac)`` with ``dup_frac``
    on the shared floor(10000*num/den)/10000 grid.

    Shape: ONE corpus scan — a vectorized explode (shift-concat like
    ``dup_ngram_frac_batch``, no per-row loop) emits gram rows with
    the (doc, gram) distinct-pair combiner (a phrase repeated k times
    inside one doc ships ONE row carrying its count, not k rows) PLUS
    one tagged per-doc window-total row, so the input is never
    consumed twice (no re-run of upstream lineage, no tokenize-twice);
    ONE coarse gram-keyed exchange totals occurrences per gram
    (compared on the gram STRING inside the group,
    hash-collision-safe), emits per-doc duplicated-position partials
    and forwards the total rows; ONE doc-keyed exchange finishes the
    counts.  Gram strings cross the wire once per distinct (doc,
    gram); full documents never ride a shuffle.  Lee et al. build a
    single-machine suffix array — this is the shuffle formulation of
    the same exact predicate, which is how it distributes.
    """
    from doc_ocr_ray.stages.text_analysis import _tokens
    from doc_ocr_ray.util import typed_if_empty

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch[text_col])
        n = toks.str.len().to_numpy()
        doc_ids = batch["doc_id"].to_numpy()
        nw = np.maximum(n - (window - 1), 0)
        has = nw > 0
        # tagged per-doc totals: ride the gram exchange (one extra row
        # per doc) instead of a second scan of the input
        tot = pd.DataFrame({
            "doc_id": doc_ids[has].astype("int64"),
            "gram": pd.Series([""] * int(has.sum()), dtype="object"),
            "cnt": nw[has].astype("int64"),
            "kind": np.full(int(has.sum()), 1, dtype=np.int8),
            "part": coarse_part(pd.Series(doc_ids[has]), num_parts),
        })
        flat = pd.DataFrame({
            "doc_id": np.repeat(doc_ids, n),
            "word": [w for ws in toks for w in ws],
        })
        if flat.empty:
            return typed_if_empty(tot)
        valid, gram = _window_grams(flat, window, "doc_id")
        occ = pd.DataFrame({"doc_id": flat.loc[valid, "doc_id"],
                            "gram": gram})
        comb = (occ.groupby(["doc_id", "gram"], sort=False)
                .size().rename("cnt").reset_index())
        comb["cnt"] = comb["cnt"].astype("int64")
        comb["kind"] = np.int8(0)
        comb["part"] = coarse_part(comb["gram"], num_parts)
        return typed_if_empty(pd.concat([comb, tot], ignore_index=True))

    def gram_group(group: pd.DataFrame) -> pd.DataFrame:
        g0 = group[group["kind"] == 0]
        tot = g0.groupby("gram", sort=False)["cnt"].transform("sum")
        dup = g0[tot >= 2]
        per_doc = (dup.groupby("doc_id", sort=False)["cnt"].sum()
                   .rename("dup_cnt").reset_index())
        per_doc["n_windows"] = np.int64(0)
        fwd = group.loc[group["kind"] == 1, ["doc_id"]].copy()
        fwd["dup_cnt"] = np.int64(0)
        fwd["n_windows"] = (group.loc[group["kind"] == 1, "cnt"]
                            .astype("int64").to_numpy())
        out = pd.concat([per_doc, fwd], ignore_index=True)
        out["dpart"] = coarse_part(out["doc_id"], num_parts)
        return typed_if_empty(out)

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        agg = (group.groupby("doc_id", sort=False)
               .agg(n_windows=("n_windows", "sum"),
                    dup_windows=("dup_cnt", "sum")).reset_index())
        agg = agg[agg["n_windows"] > 0]     # partial without a total
        agg["dup_frac"] = (np.floor(10000.0 * agg["dup_windows"]
                                    / agg["n_windows"]) / 10000)
        return agg.reset_index(drop=True)

    return (ds.map_batches(explode, batch_format="pandas")
            .groupby("part").map_groups(gram_group,
                                        batch_format="pandas")
            .groupby("dpart").map_groups(finish, batch_format="pandas"))


_EMPTY_SUBSTR_ROWS = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "payload": pa.array([], pa.binary()),
    "kind": pa.array([], pa.int8()),
    "part": pa.array([], pa.int64()),
    "gram": pa.array([], pa.string()),
    "cnt": pa.array([], pa.int64())})
_EMPTY_SUBSTR_FWD = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "payload": pa.array([], pa.binary()),
    "kind": pa.array([], pa.int8()),
    "dpart": pa.array([], pa.int64())})
_EMPTY_SUBSTR_OUT = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "text": pa.array([], pa.string())})


def dedup_substr_remove(ds, window: int = 8, text_col: str = "text",
                        num_parts: int = 256):
    """Full ExactSubstr REMOVAL (Lee et al. 2022): delete every token
    covered by ANY ``window``-token substring that occurs more than
    once corpus-wide, rebuild each document from its surviving tokens
    in order (whitespace-normalized), and DROP fully-covered
    documents.  ``dup_substr_signals`` is the measurement; this is
    the edit.

    Shape: ONE corpus scan emits (a) per-(doc, gram) candidate rows
    carrying their packed int64 start positions — the combiner, so a
    phrase repeated k times in one doc ships one row with k starts —
    keyed by gram hash, and (b) tagged doc rows carrying the utf-8
    text, keyed by doc hash (they pass through the gram exchange
    unread); the gram group keeps starts whose gram occurs >= 2 times
    (string-compared, collision-safe); the doc group marks covered
    positions with a difference array and re-joins survivors.  Text
    crosses the wire exactly twice (route + rebuild) — the same trade
    as ``dedup_lines``; gram strings cross once per distinct (doc,
    gram).  Binary payload column keeps starts and text in one typed
    Arrow schema (no object/string unification drift on empties).
    """
    from doc_ocr_ray.stages.text_analysis import _tokens

    def explode(batch: pd.DataFrame) -> "pd.DataFrame | pa.Table":
        if not len(batch):
            return _EMPTY_SUBSTR_ROWS
        toks = _tokens(batch[text_col])
        n = toks.str.len().to_numpy()
        doc_ids = batch["doc_id"].to_numpy()
        docs = pd.DataFrame({
            "doc_id": doc_ids.astype("int64"),
            "payload": [t.encode("utf-8")
                        for t in batch[text_col].fillna("")],
            "kind": np.full(len(batch), 1, dtype=np.int8),
            "part": coarse_part(pd.Series(doc_ids), num_parts),
        })
        docs = docs.assign(gram="", cnt=np.int64(0))
        flat = pd.DataFrame({
            "doc_id": np.repeat(doc_ids, n),
            "word": [w for ws in toks for w in ws],
        })
        if flat.empty:
            return docs
        pos = (flat.groupby("doc_id", sort=False)["word"]
               .cumcount() + 1).to_numpy()           # 1-based
        valid, gram = _window_grams(flat, window, "doc_id")
        if not valid.any():
            return docs
        occ = pd.DataFrame({"doc_id": flat.loc[valid, "doc_id"],
                            "gram": gram,
                            "pos": pos[valid.to_numpy()]})
        comb = (occ.groupby(["doc_id", "gram"], sort=False)["pos"]
                .agg(lambda s: np.asarray(s.to_numpy(),
                                          dtype="<i8").tobytes())
                .rename("payload").reset_index())
        # cnt == number of packed int64 starts: free from the payload,
        # no second groupby pass over the corpus-sized occ frame
        comb["cnt"] = (comb["payload"].str.len() // 8).astype("int64")
        comb["kind"] = np.int8(0)
        comb["part"] = coarse_part(comb["gram"], num_parts)
        out = pd.concat(
            [comb[["doc_id", "payload", "kind", "part", "gram", "cnt"]],
             docs[["doc_id", "payload", "kind", "part", "gram", "cnt"]]],
            ignore_index=True)
        return out

    def gram_group(group: pd.DataFrame) -> "pd.DataFrame | pa.Table":
        g0 = group[group["kind"] == 0]
        tot = g0.groupby("gram", sort=False)["cnt"].transform("sum")
        dup = g0[tot >= 2]
        fwd = group[group["kind"] == 1]
        out = pd.concat(
            [dup[["doc_id", "payload", "kind"]],
             fwd[["doc_id", "payload", "kind"]]], ignore_index=True)
        if not len(out):
            return _EMPTY_SUBSTR_FWD
        out["dpart"] = coarse_part(out["doc_id"], num_parts)
        return out

    def rebuild(group: pd.DataFrame) -> "pd.DataFrame | pa.Table":
        out_ids, out_txt = [], []
        for doc, sub in group.groupby("doc_id", sort=False):
            texts = sub.loc[sub["kind"] == 1, "payload"]
            if not len(texts):
                continue                      # starts without a doc row
            t = _EDGE_WS.sub("", bytes(texts.iloc[0]).decode("utf-8"))
            if not t:
                continue
            ws = _WS.split(t)
            nw = len(ws)
            acc = np.zeros(nw + 1, dtype=np.int64)
            for b in sub.loc[sub["kind"] == 0, "payload"]:
                starts = np.frombuffer(bytes(b), dtype="<i8") - 1
                np.add.at(acc, starts, 1)
                np.subtract.at(acc, np.minimum(starts + window, nw), 1)
            covered = np.cumsum(acc[:-1]) > 0
            if covered.all():
                continue
            kept = [w for w, c in zip(ws, covered) if not c]
            out_ids.append(doc)
            out_txt.append(" ".join(kept))
        if not out_ids:
            return _EMPTY_SUBSTR_OUT
        return pd.DataFrame({
            "doc_id": np.asarray(out_ids, dtype="int64"),
            text_col: pd.Series(out_txt, dtype="object")})

    return (ds.map_batches(explode, batch_format="pandas")
            .groupby("part").map_groups(gram_group,
                                        batch_format="pandas")
            .groupby("dpart").map_groups(rebuild, batch_format="pandas"))


def cross_source_overlap(ds, window: int = 8, num_parts: int = 256):
    """Pairwise source contamination matrix: for every pair of
    sources, the number of DISTINCT ``window``-token gram strings both
    contain — the corpus-analytics view behind "is crawl A a mirror of
    crawl B" / train-test split hygiene at source granularity.
    Output: (source_a, source_b, shared_grams), source_a < source_b.

    Shape: per-batch distinct (source, gram) pairs (the combiner);
    ONE gram-keyed coarse exchange; inside each group a vectorized
    self-merge on gram expands co-occurring source pairs (cost is
    sum over grams of s_g^2 — a gram present in MANY sources fans
    out quadratically; for web corpora with huge source counts,
    pre-prune such stop-grams upstream); a final tiny exchange sums
    pair partials (the matrix is #sources^2-bounded, never
    corpus-sized).
    """
    from doc_ocr_ray.stages.text_analysis import _tokens
    from doc_ocr_ray.util import typed_if_empty

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"])
        n = toks.str.len().to_numpy()
        flat = pd.DataFrame({
            "source": batch["source"].repeat(n).to_numpy(),
            "word": [w for ws in toks for w in ws],
            "doc": np.repeat(np.arange(len(batch)), n),
        })
        if flat.empty:
            return typed_if_empty(pd.DataFrame({
                "source": pd.Series([], dtype="object"),
                "gram": pd.Series([], dtype="object"),
                "part": pd.Series([], dtype="int64")}))
        valid, gram = _window_grams(flat, window, "doc")
        occ = (pd.DataFrame({"source": flat.loc[valid, "source"],
                             "gram": gram})
               .drop_duplicates())
        occ["part"] = coarse_part(occ["gram"], num_parts)
        return typed_if_empty(occ.reset_index(drop=True))

    def pair_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["source", "gram"]].drop_duplicates()
        m = g.merge(g, on="gram")
        m = m[m["source_x"] < m["source_y"]]
        out = (m.groupby(["source_x", "source_y"], sort=False)
               .size().rename("cnt").reset_index())
        out.columns = ["source_a", "source_b", "cnt"]
        out["cnt"] = out["cnt"].astype("int64")
        out["ppart"] = coarse_part(
            out["source_a"] + "\x00" + out["source_b"], 64)
        return typed_if_empty(out)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        out = (group.groupby(["source_a", "source_b"], sort=False)
               ["cnt"].sum().rename("shared_grams").reset_index())
        out["shared_grams"] = out["shared_grams"].astype("int64")
        return typed_if_empty(out)

    return (ds.map_batches(explode, batch_format="pandas")
            .groupby("part").map_groups(pair_group,
                                        batch_format="pandas")
            .groupby("ppart").map_groups(final, batch_format="pandas"))


def snapshot_diff(old_ds, new_ds, key: str = "doc_id",
                  text_col: str = "text", num_parts: int = 256):
    """Crawl-snapshot delta: classify every key across two corpus
    snapshots as ``added`` (new only), ``removed`` (old only) or
    ``changed`` (present in both, normalized-text md5 differs) — the
    incremental-ingestion planning operator that decides what to
    re-process.  UNCHANGED keys are dropped: at web scale they
    dominate and downstream wants the delta, not the corpus.  Output:
    ``(key, status)``.

    Shape: both sides slim to (key, hex digest) in-batch combiners —
    text never rides the exchange — tagged union, ONE key-hash coarse
    exchange, vectorized in-group compare.  Keys are expected unique
    per snapshot; duplicates resolve deterministically to the
    lexicographically smallest digest (min(), same on both engines).
    """
    def _slim(kind):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            dig = pd.Series(
                [hashlib.md5(t.encode("utf-8")).hexdigest()
                 for t in _normalize(batch[text_col])],
                index=batch.index)
            out = (pd.DataFrame({key: batch[key], "digest": dig})
                   .groupby(key, sort=False)["digest"].min()
                   .reset_index())
            out["kind"] = np.int8(kind)
            out["part"] = coarse_part(out[key], num_parts)
            return typed_if_empty(out)
        return f

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby([key, "kind"], sort=False)["digest"].min()
             .unstack("kind"))
        old_d = g[0] if 0 in g.columns else pd.Series(index=g.index,
                                                      dtype="object")
        new_d = g[1] if 1 in g.columns else pd.Series(index=g.index,
                                                      dtype="object")
        status = np.where(
            old_d.isna(), "added",
            np.where(new_d.isna(), "removed",
                     np.where(old_d != new_d, "changed", "")))
        out = pd.DataFrame({key: g.index, "status": status})
        out = out[out["status"] != ""]
        return typed_if_empty(out.reset_index(drop=True))

    tagged = (old_ds.map_batches(_slim(0), batch_format="pandas")
              .union(new_ds.map_batches(_slim(1),
                                        batch_format="pandas")))
    return tagged.groupby("part").map_groups(resolve,
                                             batch_format="pandas")


def _levenshtein(a, b) -> int:
    """Unit-cost Levenshtein over UTF-8 BYTES, two-row DP vectorized
    along the inner dimension with numpy (np.minimum.accumulate
    realizes the column-wise deletion recurrence).  Byte-level on
    purpose: DuckDB's ``levenshtein()`` operates on bytes, so the SQL
    twin is bit-exact; for ASCII text bytes == characters.  Accepts
    str or already-encoded bytes (the pair-verify payloads arrive as
    bytes; re-decoding just to re-encode here would be a wasted round
    trip per pair)."""
    if a == b:
        return 0
    ab = a.encode("utf-8") if isinstance(a, str) else a
    bbytes = b.encode("utf-8") if isinstance(b, str) else b
    if not ab:
        return len(bbytes)
    if not bbytes:
        return len(ab)
    bb = np.frombuffer(bbytes, dtype=np.uint8)
    prev = np.arange(len(bb) + 1, dtype=np.int64)
    for i, ca in enumerate(np.frombuffer(ab, dtype=np.uint8), 1):
        sub = prev[:-1] + (bb != ca)          # substitution / match
        ins = prev[1:] + 1                    # insertion (from above)
        cur = np.empty(len(bb) + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = np.minimum(sub, ins)
        # deletion (from the left) needs a running scan:
        # cur[j] = min(cur[j], cur[j-1] + 1)
        cur = np.minimum.accumulate(cur + np.arange(len(cur), 0, -1)) \
            - np.arange(len(cur), 0, -1)
        prev = cur
    return int(prev[-1])


def verify_pairs_edit(ds, pairs_ds, max_dist_milli: int = 200,
                      text_col: str = "text"):
    """Edit-distance verification of candidate pairs — the
    finest-grained (and most expensive) dedup verifier, run LAST in
    the ladder after LSH banding and n-gram Jaccard have cut the
    candidate set: keep pairs whose normalized-text Levenshtein
    distance is at most ``max_dist_milli``/1000 of the longer text.
    Returns (doc_a, doc_b, dist, dist_milli) with the ratio on the
    integer milli grid ``(1000*dist)//max(bytes_a,bytes_b)`` — pure
    integers over UTF-8 BYTE lengths (DuckDB's levenshtein and
    octet_length are byte-level), so the SQL twin is trivially
    bit-exact.

    Shares :func:`_pair_verify_scaffold` with
    :func:`verify_pairs_exact` (normalized text is the per-doc
    payload).  Per-pair cost is O(len_a*len_b/simd) — that is WHY this
    runs last — so pairs whose byte-length difference alone already
    exceeds the ratio bound (dist >= \\|la-lb\\|) skip the DP for free.
    """
    joined, empty = _pair_verify_scaffold(
        ds, pairs_ds,
        lambda hit: [t.encode("utf-8")
                     for t in _normalize(hit[text_col])],
        pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "dist": pd.Series([], dtype="int64"),
            "dist_milli": pd.Series([], dtype="int64")}))
    if joined is None:
        return empty

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d, out_m = [], [], [], []
        for a, b, raw_a, raw_b in zip(batch["doc_a"], batch["doc_b"],
                                      batch["payload_a"],
                                      batch["payload_b"]):
            la, lb = len(raw_a), len(raw_b)
            if not max(la, lb):
                continue
            if (1000 * abs(la - lb)) // max(la, lb) > max_dist_milli:
                continue          # guaranteed rejected: dist >= |la-lb|
            d = _levenshtein(raw_a, raw_b)
            m = (1000 * d) // max(la, lb)
            if m <= max_dist_milli:
                out_a.append(int(a)); out_b.append(int(b))
                out_d.append(d); out_m.append(m)
        return typed_if_empty(pd.DataFrame({
            "doc_a": pd.Series(out_a, dtype="int64"),
            "doc_b": pd.Series(out_b, dtype="int64"),
            "dist": pd.Series(out_d, dtype="int64"),
            "dist_milli": pd.Series(out_m, dtype="int64")}))

    return joined.map_batches(score, batch_format="pandas")


# ------------------------------------------------- prefix-filter join
def _md5_token_set(text: str) -> np.ndarray:
    """Sorted unique 63-bit md5 hashes of the normalized WORD-token
    set (the ``_NORM`` whitespace contract, not char shingles) — the
    verify payload for :func:`setsim_join_pairs`.  md5 so hash-set
    Jaccard equals string-set Jaccard up to an md5-64 collision (the
    table_stats / digest-dedup exactness envelope)."""
    t = _WS.sub(" ", _EDGE_WS.sub("", text or "").lower())
    if not t:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.fromiter(
        (_md5_64(w) >> 1 for w in set(t.split(" "))),
        dtype=np.int64, count=-1))


def setsim_join_pairs(ds, t_milli: int = 800, text_col: str = "text",
                      num_parts: int = 256, num_pair_parts: int = 64):
    """EXACT set-similarity self-join via prefix filtering (the
    AllPairs / PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    WWW'08): every pair of docs whose normalized word-token sets have
    Jaccard >= t_milli/1000, with NO probabilistic recall loss — the
    deterministic counterpart of :func:`minhash_dedup_pairs` (LSH can
    miss a qualifying pair; the prefix filter provably cannot).

    Completeness lemma (why no pair is lost): order all tokens by ONE
    global total order; if |A∩B| >= a then the first |A|-a+1 tokens of
    A and the first |B|-a+1 of B must share a token.  J(A,B) >= t
    implies |A∩B| >= t*|A∪B| >= t*max(|A|,|B|), so emitting each doc's
    first ``s - ceil(t*s) + 1`` tokens (s = set size, ceil on the
    integer grid ``(t_milli*s + 999)//1000``) guarantees every
    qualifying pair meets in some token bucket.  The global order is
    (df ASC, token ASC) — rarest first, the canonical PPJoin ordering
    that keeps stopwords OUT of prefixes so their buckets never form.

    Shuffle discipline — four exchanges, all pairs- or candidate-sized:
      1. distinct (token, doc) pairs keyed by token: each token group
         knows its global df and annotates its rows in place (no
         vocabulary broadcast, no separate df join);
      2. doc-keyed regroup: per doc, sort by (df, token), keep the
         prefix (vectorized transform/cumcount, no per-doc loop);
      3. token-keyed candidate buckets: per token, all doc pairs that
         survive the length filter ``1000*min(s) >= t_milli*max(s)``
         (J >= t forces min >= t*max).  Per-bucket cost is O(b^2) like
         every blocking join; the df-ascending order is the mitigation
         — a token appears in a doc's prefix only while it is among
         the doc's ~(1-t)*s rarest tokens;
      4. coarse pair-keyed dedupe (a pair can surface from several
         shared prefix tokens).
    Verification reuses :func:`_pair_verify_scaffold` (ids-only
    broadcast, distributed payload gather, tagged-union payload↔pair
    exchange; shape stated there).  The verify predicate and the
    reported score are integer-exact: keep iff ``1000*inter >=
    t_milli*union``, ``jac_milli = (1000*inter)//union``.

    Returns (doc_a, doc_b, jac_milli) with doc_a < doc_b — EXACTLY the
    pairs a brute-force O(n^2) Jaccard scan would emit (up to the
    md5-64 payload envelope).
    """
    from doc_ocr_ray.stages.text_analysis import _norm_tokens_flat

    if not 0 < t_milli <= 1000:
        raise ValueError("t_milli must be in (0, 1000]")

    _empty_tok = pd.DataFrame({
        "token": pd.Series([], dtype="object"),
        "doc_id": pd.Series([], dtype="int64"),
        "part": pd.Series([], dtype="int64")})

    def tok_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        doc_idx, toks = _norm_tokens_flat(list(batch[text_col].fillna("")))
        if not len(toks):
            return typed_if_empty(_empty_tok)
        ids = batch["doc_id"].to_numpy()[doc_idx]
        p = pd.DataFrame({"token": toks, "doc_id": ids}).drop_duplicates()
        p["doc_id"] = p["doc_id"].astype("int64")
        p["part"] = coarse_part(p["token"], num_parts)
        return p

    def annotate_df(group: pd.DataFrame) -> pd.DataFrame:
        # all rows of a token are co-located here, so its group size
        # IS the global df — annotated in place, nothing broadcast
        out = pd.DataFrame({
            "token": group["token"].to_numpy(),
            "doc_id": group["doc_id"].astype("int64").to_numpy(),
            "df": group.groupby("token")["doc_id"]
                       .transform("size").astype("int64").to_numpy()})
        out["part"] = coarse_part(out["doc_id"], num_parts)
        return typed_if_empty(out)

    _empty_pref = pd.DataFrame({
        "token": pd.Series([], dtype="object"),
        "doc_id": pd.Series([], dtype="int64"),
        "set_size": pd.Series([], dtype="int64"),
        "part": pd.Series([], dtype="int64")})

    def prefixes(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["doc_id", "df", "token"], kind="mergesort")
        s = g.groupby("doc_id")["token"].transform("size").to_numpy()
        rank = g.groupby("doc_id").cumcount().to_numpy()
        p_len = s - (t_milli * s + 999) // 1000 + 1
        keep = rank < p_len
        out = pd.DataFrame({
            "token": g["token"].to_numpy()[keep],
            "doc_id": g["doc_id"].to_numpy()[keep],
            "set_size": s[keep].astype("int64")})
        out["part"] = coarse_part(out["token"], num_parts)
        return typed_if_empty(out)

    _empty_pair = pd.DataFrame({
        "doc_a": pd.Series([], dtype="int64"),
        "doc_b": pd.Series([], dtype="int64")})

    def candidates(group: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in group.groupby("token", sort=False):
            n = len(sub)
            if n < 2:
                continue
            g = sub.sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            sz = g["set_size"].to_numpy()
            iu, ju = np.triu_indices(n, k=1)
            lo = np.minimum(sz[iu], sz[ju])
            hi = np.maximum(sz[iu], sz[ju])
            m = 1000 * lo >= t_milli * hi
            if m.any():
                outs.append(pd.DataFrame({"doc_a": ids[iu[m]],
                                          "doc_b": ids[ju[m]]}))
        if not outs:
            return typed_if_empty(_empty_pair)
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    cand = (ds.map_batches(tok_pairs, batch_format="pandas")
            .groupby("part").map_groups(annotate_df, batch_format="pandas")
            .groupby("part").map_groups(prefixes, batch_format="pandas")
            .groupby("part").map_groups(candidates, batch_format="pandas"))

    def pair_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["ppart"] = ((batch["doc_a"] * 31 + batch["doc_b"])
                          % num_pair_parts).astype("int64")
        return batch

    def drop_dup(group: pd.DataFrame) -> pd.DataFrame:
        return (group.drop_duplicates(["doc_a", "doc_b"])
                     .drop(columns=["ppart"]))

    uniq_pairs = (cand.map_batches(pair_part, batch_format="pandas")
                  .groupby("ppart").map_groups(drop_dup,
                                               batch_format="pandas"))

    joined, empty = _pair_verify_scaffold(
        ds, uniq_pairs,
        lambda hit: [_md5_token_set(t).tobytes()
                     for t in hit[text_col].fillna("")],
        pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "jac_milli": pd.Series([], dtype="int64")}))
    if joined is None:
        return empty

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for a, b, raw_a, raw_b in zip(batch["doc_a"], batch["doc_b"],
                                      batch["payload_a"],
                                      batch["payload_b"]):
            sa = np.frombuffer(raw_a, dtype=np.int64)
            sb = np.frombuffer(raw_b, dtype=np.int64)
            if not len(sa) or not len(sb):
                continue
            inter = int(np.intersect1d(sa, sb, assume_unique=True).size)
            union = len(sa) + len(sb) - inter
            if 1000 * inter >= t_milli * union:
                out_a.append(int(a)); out_b.append(int(b))
                out_j.append((1000 * inter) // union)
        return typed_if_empty(pd.DataFrame({
            "doc_a": pd.Series(out_a, dtype="int64"),
            "doc_b": pd.Series(out_b, dtype="int64"),
            "jac_milli": pd.Series(out_j, dtype="int64")}))

    return joined.map_batches(score, batch_format="pandas")


def pair_recall_floor(approx_ds, truth_ds, floor_milli: int,
                      num_parts: int = 64) -> pa.Table:
    """Distributed recall gate over PAIR sets — the similarity-family
    ``ann_recall_floor`` contract applied to dedup candidates: what
    fraction of the ground-truth pairs (an EXACT join such as
    :func:`setsim_join_pairs`) does a probabilistic candidate
    generator (:func:`minhash_dedup_pairs`) recover?  LSH banding CAN
    miss a qualifying pair; this pins the miss rate in the hash gate
    so a banding/permutation regression fails CORRECTNESS instead of
    passing rows-only.

    Both inputs are (doc_a, doc_b, ...) with doc_a < doc_b.  Tagged
    pair rows meet on one coarse pair-hash exchange; each group emits
    a single (n_truth, n_hit) partial; the driver folds <= num_parts
    partials into the literal one-row gate
    (n_truth, floor_milli, meets) the SQL oracle states verbatim.
    recall_milli = 1000 * hits // n_truth (0 truth pairs -> vacuous
    pass with n_truth = 0)."""

    cols = ["doc_a", "doc_b", "kind", "ppart"]

    def tag(kind):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            if batch.empty or "doc_a" not in batch.columns:
                return pa.schema(
                    [(c, pa.int64()) for c in cols]).empty_table()
            out = pd.DataFrame({
                "doc_a": batch["doc_a"].astype("int64"),
                "doc_b": batch["doc_b"].astype("int64")})
            out["kind"] = np.int64(kind)
            out["ppart"] = ((out["doc_a"] * 31 + out["doc_b"])
                            % num_parts).astype("int64")
            return out[cols]
        return fn

    def partial(group: pd.DataFrame) -> pd.DataFrame:
        t = group[group["kind"] == 0].drop_duplicates(
            ["doc_a", "doc_b"])
        a = group[group["kind"] == 1]
        hit = t.merge(a[["doc_a", "doc_b"]].drop_duplicates(),
                      on=["doc_a", "doc_b"])
        return pd.DataFrame({
            "n_truth": pd.Series([len(t)], dtype="int64"),
            "n_hit": pd.Series([len(hit)], dtype="int64")})

    parts = (truth_ds.map_batches(tag(0), batch_format="pandas")
             .union(approx_ds.map_batches(tag(1), batch_format="pandas"))
             .groupby("ppart")
             .map_groups(partial, batch_format="pandas")
             .take_all())                       # <= num_parts tiny rows
    n_truth = sum(int(r["n_truth"]) for r in parts)
    n_hit = sum(int(r["n_hit"]) for r in parts)
    recall = (1000 * n_hit) // n_truth if n_truth else 1000
    return pa.table({
        "n_truth": pa.array([n_truth], pa.int64()),
        "floor_milli": pa.array([int(floor_milli)], pa.int64()),
        "meets": pa.array([1 if recall >= floor_milli else 0],
                          pa.int64())})
