"""End-to-end corpus curation: the composed training-data pipeline.

interleaved documents
  -> extraction (split/merge -> question groups)
  -> keep question rows with usable text
  -> quality scoring (length/punct ratios)
  -> quality filter
  -> exact dedup on normalized question text (hash-partitioned)
  -> curated question corpus

Everything streams: two map_batches stages, one coarse-key groupby for
the dedup — no full materialization anywhere.  This is the pipeline a
user runs to turn raw page corpora into training text.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from doc_ocr_ray.config import PipelineConfig, DEFAULT_CONFIG
from doc_ocr_ray.pipelines.extract import extract_questions
from doc_ocr_ray.stages.dedup import exact_dedup
from doc_ocr_ray.stages.text_analysis import quality_score_batch
from doc_ocr_ray.util import coarse_part, typed_if_empty


def curate_corpus(docs_ds, config: Optional[PipelineConfig] = None,
                  min_tokens: int = 2, min_chars: int = 8,
                  max_punct_ratio: float = 0.5):
    """documents Dataset -> curated (doc_id, question_number, text,
    n_tokens) rows, deduplicated on normalized text."""
    config = config or DEFAULT_CONFIG
    questions = extract_questions(docs_ds, config=config)

    def to_text_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["doc_id", "question_id", "question_number",
                           "group_type", "merged_text"]).to_pandas()
        q = df[(df["group_type"] == "question")
               & (df["merged_text"].str.len() > 0)].copy()
        # unique id per question row: question_id is the stable per-doc
        # ordinal (a per-batch cumcount would collide when one doc's
        # rows straddle a batch boundary)
        q["doc_id"] = q["doc_id"] + "#q" + q["question_id"].astype(str)
        return q.rename(columns={"merged_text": "text"})[
            ["doc_id", "question_number", "text"]]

    texts = questions.map_batches(to_text_rows, batch_format="pyarrow")

    def score_filter(batch: pd.DataFrame) -> pd.DataFrame:
        scores = quality_score_batch(batch)
        # script-neutral punctuation ratio: count only ASCII punctuation
        # marks — quality_score_batch's punct_ratio treats every
        # non-Latin letter as punctuation (Latin-script heuristic) and
        # would discard all CJK questions
        text = batch["text"].fillna("")
        ascii_punct = (text.str.count(r"[!-/:-@\[-`{-~]")
                       / text.str.len().clip(lower=1))
        # length floor: whitespace tokens OR raw chars — a spaceless
        # CJK question is one "token" but plenty of content
        long_enough = ((scores["n_tokens"] >= min_tokens)
                       | (text.str.len() >= min_chars))
        keep = long_enough & (ascii_punct <= max_punct_ratio)
        out = batch[keep.to_numpy()].copy()
        out["n_tokens"] = scores.loc[keep, "n_tokens"].to_numpy()
        return out

    filtered = texts.map_batches(score_filter, batch_format="pandas")
    return exact_dedup(filtered, text_col="text")


def _md5_bucket(keys: pd.Series, seed: int, mod: int = 0) -> np.ndarray:
    """``int(md5(f"{seed}:{key}")[:8], 16)`` (optionally % mod) as an
    int64 array — the deterministic pseudo-random rank shared by every
    sampling / splitting / sharding operator here.  The DuckDB twin is
    ``('0x' || substr(md5(seed || ':' || key), 1, 8))::UINTEGER``, so
    the value is oracle-checkable bit for bit."""
    import hashlib
    it = (int(hashlib.md5(f"{seed}:{k}".encode()).hexdigest()[:8], 16)
          for k in keys.astype(str))
    buckets = np.fromiter(it, dtype="int64", count=len(keys))
    return buckets % mod if mod else buckets


def assign_split(ds, key: str = "doc_id", seed: int = 42,
                 ratios: Optional[Dict[str, float]] = None):
    """Deterministic stratified train/val/test assignment: each row
    lands in a split by ``md5(seed:key) % 10000`` against cumulative
    ratio thresholds.  Properties that matter at corpus scale:

    - membership is a pure function of (seed, key) — re-runs, resumes
      and incremental ingestion never reshuffle examples across splits
      (no leakage from val into train between runs);
    - embarrassingly parallel (a vectorized ``map_batches``, no
      shuffle, no global sampling pass);
    - the DuckDB twin computes the identical bucket from the identical
      md5 string, so assignment is oracle-checkable bit for bit.

    ``ratios`` values must sum to <= 1; the remainder (if any) falls
    into the last split.  Buckets quantize at 1/10000, so ratios finer
    than 0.01% won't separate."""
    ratios = ratios or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(ratios)
    edges = []
    acc = 0.0
    for n in names:
        acc += ratios[n]
        edges.append(int(round(acc * 10000)))
    edges[-1] = max(edges[-1], 10000)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        buckets = _md5_bucket(batch[key], seed, mod=10000)
        split = np.select(
            [buckets < e for e in edges], names, default=names[-1])
        out = batch.copy()
        out["bucket"] = buckets
        out["split"] = split
        return out

    return ds.map_batches(fn, batch_format="pandas")


def shuffle_positions(ds, key: str = "doc_id", seed: int = 42):
    """Deterministic global training-order shuffle with EXACT global
    positions — the final step before sharded export: every row gets
    ``position`` = its rank in the md5(seed:key) order, a pure
    function of (seed, key) so re-runs, resumes and multi-reader data
    loaders agree on the order without any shared state.  Output:
    ``(key, position)``, a permutation of 0..n-1.

    Shape — global positions WITHOUT a native global sort: the md5
    rank is uniform, so its first byte makes 256 balanced buckets
    whose cumulative counts are the bucket base offsets.  One
    distributed count pass (256-row result to the driver), offsets
    broadcast in the task closure, then ONE bucket-keyed exchange
    where each group sorts locally and adds its base offset.  The
    exchange carries (key, rank) only; no stage ever holds more than
    a bucket.  Tie-break on key after the full 32-hex rank (md5
    collisions being the usual documented envelope).

    The DuckDB twin is ``row_number() OVER (ORDER BY md5(..), key) -
    1`` — hex-string order == the engine's string compare."""
    import hashlib

    def add_rank(batch: pd.DataFrame) -> pd.DataFrame:
        ranks = [hashlib.md5(f"{seed}:{k}".encode()).hexdigest()
                 for k in batch[key].astype(str)]
        out = pd.DataFrame({key: batch[key], "rank": ranks})
        out["bucket"] = [int(r[:2], 16) for r in ranks]
        return typed_if_empty(out)

    # consumed by BOTH passes; deliberately NOT materialized — the
    # rank map is a deterministic stateless recompute (one md5/row),
    # cheaper at corpus scale than spilling a corpus-sized rank table
    ranked = ds.map_batches(add_rank, batch_format="pandas")

    # pass 1: bucket histogram -> base offsets (256 rows on the driver)
    def bucket_counts(batch: pd.DataFrame) -> pd.DataFrame:
        c = (batch.groupby("bucket", sort=False).size()
             .reset_index(name="n"))
        c["n"] = c["n"].astype("int64")
        return typed_if_empty(c)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bucket": [int(group["bucket"].iloc[0])],
                             "n": [int(group["n"].sum())]})

    hist = (ranked.map_batches(bucket_counts, batch_format="pandas")
            .groupby("bucket").map_groups(combine, batch_format="pandas")
            .to_pandas().sort_values("bucket"))
    base = {}
    acc = 0
    for b, n in zip(hist["bucket"], hist["n"]):
        base[int(b)] = acc
        acc += int(n)

    # pass 2: per-bucket local sort + base offset
    def place(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["rank", key])
        off = base[int(g["bucket"].iloc[0])]
        return pd.DataFrame({
            key: g[key].to_numpy(),
            "position": np.arange(off, off + len(g), dtype="int64")})

    return (ranked.groupby("bucket").map_groups(place,
                                                batch_format="pandas"))


def interleave_positions(ds, key: str = "doc_id",
                         source_col: str = "source", seed: int = 42):
    """Source-balanced deterministic training order: round-robin
    interleave across sources — row p of every source precedes row
    p+1 of any source, sources tie-broken by name — with each
    source's internal order the md5(seed:key) shuffle.  The mixing
    counterpart of :func:`shuffle_positions`: a loader reading the
    corpus in ``position`` order sees all sources interleaved
    proportionally instead of in storage clumps.  Output: ``(key,
    source, pos_in_source, position)``, ``position`` a permutation of
    0..n-1.

    Shape — closed form, NO global sort: per-(source, md5-bucket)
    counts (one distributed pass, |sources| x 256 rows to the driver)
    give both the within-source bucket base offsets AND the
    per-source totals n_s; ``pos_in_source`` is assigned in ONE
    (source, bucket)-keyed exchange like shuffle_positions; the
    GLOBAL position then needs no second exchange because rows
    ordered by (pos_in_source, source) sit at
    ``position = Σ_s' min(p, n_s') + |{s' < s : n_s' > p}|`` — a
    vectorized formula over the broadcast totals (NULL sources group
    under '(null)', the corpus_report discipline).

    The DuckDB twin nests two row_numbers (per-source md5 order, then
    the global (p, source) order)."""
    import hashlib

    def add_rank(batch: pd.DataFrame) -> pd.DataFrame:
        ranks = [hashlib.md5(f"{seed}:{k}".encode()).hexdigest()
                 for k in batch[key].astype(str)]
        out = pd.DataFrame({
            key: batch[key],
            # astype(str) AFTER fillna: every source handled as a
            # string everywhere (the offset dicts and the tie-break
            # order must key identically for int source columns too)
            "source": batch[source_col].fillna("(null)").astype(str),
            "rank": ranks})
        out["bucket"] = [int(r[:2], 16) for r in ranks]
        return typed_if_empty(out)

    ranked = ds.map_batches(add_rank, batch_format="pandas")

    def bucket_counts(batch: pd.DataFrame) -> pd.DataFrame:
        c = (batch.groupby(["source", "bucket"], sort=False).size()
             .reset_index(name="n"))
        c["n"] = c["n"].astype("int64")
        return typed_if_empty(c)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": [group["source"].iloc[0]],
            "bucket": [int(group["bucket"].iloc[0])],
            "n": [int(group["n"].sum())]})

    hist = (ranked.map_batches(bucket_counts, batch_format="pandas")
            .groupby(["source", "bucket"])
            .map_groups(combine, batch_format="pandas")
            .to_pandas().sort_values(["source", "bucket"]))
    base: Dict[tuple, int] = {}
    totals: Dict[str, int] = {}
    for src, grp in hist.groupby("source", sort=True):
        acc = 0
        for b, n in zip(grp["bucket"], grp["n"]):
            base[(src, int(b))] = acc
            acc += int(n)
        totals[str(src)] = acc
    sources = sorted(totals)           # tie-break order of the formula
    n_by_src = np.array([totals[s] for s in sources], dtype="int64")
    src_index = {s: i for i, s in enumerate(sources)}

    def place(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["rank", key])
        src = g["source"].iloc[0]
        p = np.arange(base[(src, int(g["bucket"].iloc[0]))],
                      base[(src, int(g["bucket"].iloc[0]))] + len(g),
                      dtype="int64")
        # rows before (p, src) in (pos, source) order:
        #   every source contributes its first min(p, n_s') rows,
        #   plus sources ordered before src still alive at p
        before = np.minimum.outer(p, n_by_src).sum(axis=1)
        alive_earlier = (n_by_src[None, :src_index[src]]
                         > p[:, None]).sum(axis=1)
        return pd.DataFrame({
            key: g[key].to_numpy(),
            "source": g["source"].to_numpy(),
            "pos_in_source": p,
            "position": before + alive_earlier})

    return (ranked.groupby(["source", "bucket"])
            .map_groups(place, batch_format="pandas"))


def weighted_sample_n(ds, n: int, key: str = "doc_id", seed: int = 42,
                      max_weight: int = 4):
    """Deterministic weighted sampling without replacement: draw ``n``
    rows with probability proportional to an INTEGER weight —
    Efraimidis-Spirakis order sampling realized as min-of-w-hashes,
    so it is integer-exact end to end (no u^(1/w), no ln, no float
    grid anywhere): a row with weight w gets w independent uniform
    hashes md5(seed:key:j) and ranks by their MINIMUM; the min of w
    uniforms is exactly the Beta(1, w) key the E-S scheme needs, so
    top-n-by-smallest-min IS the weighted sample.  Deterministic in
    (seed, key): reruns and resumes draw the same rows.

    The demo weight is ``1 + key % max_weight`` (stated identically
    in the SQL twin); swap in any integer weight column (quality
    tiers, dedup cluster sizes).  Output: ``(key, weight, rank)`` for
    the n winners, rank = the 32-bit min-hash (tie-break on key).

    Shape: stateless per-batch partial top-n (weight*w hashes per
    row, vectorized per copy-index), tiny driver merge of per-batch
    candidates — no shuffle, same pattern as similarity's partial
    top-k."""
    import hashlib

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch[key]
        if not pd.api.types.is_integer_dtype(keys):
            # silently falling back to weight=1 would return a UNIFORM
            # sample still labeled "weighted" — fail loudly instead
            raise TypeError(
                f"weighted_sample_n: the demo weight 1 + {key} % "
                f"{max_weight} needs an integer key column; got "
                f"{keys.dtype}. Derive an integer weight column first.")
        w = (1 + (keys.astype("int64") % max_weight)).to_numpy()
        best = np.full(len(keys), np.iinfo(np.int64).max,
                       dtype="int64")
        ks = keys.astype(str).to_numpy()
        for j in range(int(w.max()) if len(w) else 0):
            live = w > j
            hs = np.fromiter(
                (int(hashlib.md5(f"{seed}:{k}:{j}".encode())
                     .hexdigest()[:8], 16) for k in ks[live]),
                dtype="int64", count=int(live.sum()))
            best[live] = np.minimum(best[live], hs)
        out = pd.DataFrame({key: keys, "weight": w, "rank": best})
        out = out.sort_values(["rank", key]).head(n)
        return typed_if_empty(out)

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    win = cand.sort_values(["rank", key]).head(n).reset_index(drop=True)
    win["weight"] = win["weight"].astype("int64")
    win["rank"] = win["rank"].astype("int64")
    return pa.Table.from_pandas(win, preserve_index=False)


def curate_training_set(docs_ds, min_tokens: int = 40,
                        jaccard: float = 0.6, seed: int = 42):
    """The full training-corpus curation funnel, composed from the
    engine's own operators — every stage is individually
    oracle-checked, and the COMPOSITION has its own end-to-end DuckDB
    oracle (Q: ``curate_training_set``):

        redact PII -> quality filter (token floor) -> exact dedup ->
        MinHash candidates -> exact n-gram verify -> connected
        components -> keep-best survivor per cluster -> deterministic
        train/val/test assignment

    Output: one row per surviving document — (doc_id, n_tokens,
    bucket, split).

    Requires integer doc_ids (the cluster/keep-best stages key int64
    arithmetic on them); string-keyed corpora should map ids first —
    validated upfront so the failure is not an opaque mid-funnel
    TypeError.

    Scale shape: the deduped corpus is materialized ONCE between the
    exact-dedup phase and the near-dup phase (it is consumed three
    times there: sketching, verify gather, keep-best) — the standard
    checkpoint-between-funnel-phases trade; everything else streams,
    and each exchange is one of the audited coarse-key patterns.
    """
    from doc_ocr_ray.stages.dedup import (
        exact_dedup, minhash_dedup_pairs, verify_pairs_exact,
        dedup_clusters, dedup_keep_best)
    from doc_ocr_ray.stages.text_analysis import (
        PII_PATTERNS_SQL, token_count_batch)
    import re
    pii_res = [re.compile(PII_PATTERNS_SQL["email"]),
               re.compile(PII_PATTERNS_SQL["phone"], re.ASCII),
               re.compile(PII_PATTERNS_SQL["ip"], re.ASCII)]
    repls = ["[EMAIL]", "[PHONE]", "[IP]"]

    import pyarrow.types as patypes
    schema = docs_ds.schema()
    id_type = dict(zip(schema.names, schema.types))["doc_id"]
    # blocks may be Arrow (pyarrow DataType) or pandas (numpy dtype)
    is_int = (patypes.is_integer(id_type)
              if isinstance(id_type, pa.DataType)
              else np.issubdtype(np.dtype(id_type), np.integer))
    if not is_int:
        raise TypeError(
            f"curate_training_set requires integer doc_ids, got "
            f"{id_type}; map string ids to integers first")

    def redact_to_text(batch: pd.DataFrame) -> pd.DataFrame:
        # replace-only chain (no count columns — the funnel discards
        # them, so don't pay three extra full-text scans per batch)
        text = batch["text"].fillna("")
        for rx, repl in zip(pii_res, repls):
            text = text.str.replace(rx, repl, regex=True)
        return pd.DataFrame({"doc_id": batch["doc_id"], "text": text})

    def token_filter(batch: pd.DataFrame) -> pd.DataFrame:
        n = token_count_batch(batch)["n_tokens"]
        return batch[(n >= min_tokens).to_numpy()]

    cleaned = (docs_ds
               .map_batches(redact_to_text, batch_format="pandas")
               .map_batches(token_filter, batch_format="pandas"))
    deduped = exact_dedup(cleaned).materialize()

    cand = minhash_dedup_pairs(deduped, num_perm=256, num_bands=64,
                               threshold=jaccard)
    pairs = verify_pairs_exact(deduped, cand, threshold=jaccard)
    best = dedup_keep_best(deduped, dedup_clusters(pairs))

    labeled = assign_split(best, key="doc_id", seed=seed)
    return labeled.select_columns(["doc_id", "n_tokens", "bucket",
                                   "split"])


def stratified_sample(ds, rates: Dict[str, float],
                      group_col: str = "lang", key: str = "doc_id",
                      seed: int = 42, default_rate: float = 0.0):
    """Deterministic per-group downsampling — the domain/language
    rebalancing step of a training-data mixture (e.g. keep 100% of
    low-resource languages, 10% of English).

    A row survives iff ``md5(seed:key) % 10000 < rate[group] * 10000``
    — the same hash-grid rule as :func:`assign_split`, so membership is
    a pure function of (seed, key, group rate): re-runs, resumes and
    incremental ingestion sample the SAME rows, and changing one
    group's rate only adds/removes rows of that group.  Groups absent
    from ``rates`` get ``default_rate``.  No shuffle — one vectorized
    ``map_batches``; rates quantize at 1/10000."""
    thresholds = {g: int(round(r * 10000)) for g, r in rates.items()}
    default_thr = int(round(default_rate * 10000))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        buckets = _md5_bucket(batch[key], seed, mod=10000)
        thr = (batch[group_col].map(thresholds).fillna(default_thr)
               .astype("int64").to_numpy())
        out = batch[buckets < thr].copy()
        out["bucket"] = buckets[buckets < thr]
        return typed_if_empty(out)

    return ds.map_batches(fn, batch_format="pandas")


def per_source_cap(ds, cap: int, source_col: str = "source",
                   key: str = "doc_id", seed: int = 42,
                   num_partitions: int = 128):
    """Keep at most ``cap`` documents per source/domain — the standard
    anti-domination guard (no single crawl domain may flood the
    training mixture).

    Which ``cap`` rows survive is deterministic and seed-stable: rows
    rank within their source by ``(md5(seed:key) 32-bit value, key)``
    — a pseudo-random but reproducible preference, so re-runs keep the
    same representatives (a "first N in arrival order" rule would be
    nondeterministic under parallel ingestion).

    One coarse-key exchange: sources hash into ``num_partitions``
    groups, each group ranks its sources vectorized (millions of tiny
    per-source groups would cost ~1ms each at the Ray level — the
    group fn handles ALL sources of the partition in one frame).
    Output adds ``src_rank`` (1-based rank within source)."""

    def rank_and_keep(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        g["_bucket"] = _md5_bucket(g[key], seed)
        g = g.sort_values([source_col, "_bucket", key],
                          kind="mergesort")
        g["src_rank"] = (g.groupby(source_col, sort=False).cumcount()
                         + 1).astype("int64")
        g = g[g["src_rank"] <= cap].drop(columns=["_bucket", "part"])
        return typed_if_empty(g)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["part"] = coarse_part(out[source_col], num_partitions)
        return out

    return (ds.map_batches(add_part, batch_format="pandas")
            .groupby("part")
            .map_groups(rank_and_keep, batch_format="pandas"))


def sample_exact_n(ds, n: int, key: str = "doc_id", seed: int = 42):
    """Deterministic EXACT-size global sample — "give me exactly N
    eval docs, reproducibly": rows rank by the shared
    ``md5(seed:key)`` grid (tie-break on the key) and the N smallest
    ranks win, independent of partitioning, resume order or corpus
    growth direction.  Unlike ``stratified_sample`` (rate-based, size
    varies with the corpus) the output size is exactly
    ``min(N, corpus)``.  Output adds ``smp_rank`` (1..N in rank
    order).

    Shape: a per-batch partial top-N (the bounded combiner — each
    input block forwards at most N candidate rows) and ONE
    single-group combine over <= N x num_blocks candidates — no
    global sort.  The candidate volume is the scale bound: for N
    large enough that N x blocks rivals the corpus, use
    ``stratified_sample`` instead (noted here so the trade is
    explicit)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["_rank"] = _md5_bucket(b[key], seed)
        b = b.sort_values(["_rank", key], kind="mergesort").head(n)
        b["g"] = np.int64(0)
        return typed_if_empty(b)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.sort_values(["_rank", key], kind="mergesort")
             .head(n).drop(columns=["_rank", "g"]))
        g["smp_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return typed_if_empty(g.reset_index(drop=True))

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("g").map_groups(final, batch_format="pandas"))


def token_budget_select(ds, budget: int, source_col: str = "source",
                        num_partitions: int = 128):
    """Per-source token-budget selection — fill each domain's token
    quota with its best documents (the mixture-realization step after
    a ``mix_plan`` decides per-source quotas): within every source,
    rank documents by the shared integer stopword quality score
    (DESC, doc_id ASC tie-break) and keep the ordered PREFIX whose
    running token total — including the candidate — stays within
    ``budget``.

    Prefix semantics, not a skip-and-refill knapsack: the cumulative
    sum is over ALL higher-ranked documents, so one oversized document
    mid-ranking ends its source's prefix.  That is exactly the SQL
    window rule ``SUM(n_tokens) OVER (PARTITION BY source ORDER BY
    score DESC, doc_id) <= budget``, which keeps the operator
    bit-reproducible across engines and runs.

    ONE coarse source-keyed exchange (same shape as
    :func:`per_source_cap`): the scoring pass is stateless and
    vectorized; each partition sorts/cumsums ALL of its sources in
    one frame.  Output: (doc_id, source, score, n_tokens,
    cum_tokens)."""
    from doc_ocr_ray.stages.text_analysis import (_en_stopword_parts,
                                                  _tokens)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"].fillna(""))
        stop_en, denom = _en_stopword_parts(toks)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            source_col: batch[source_col],
            "score": np.floor(10000 * stop_en / denom).astype("int64"),
            "n_tokens": toks.str.len().astype("int64"),
            "part": coarse_part(batch[source_col], num_partitions),
        })

    def keep(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([source_col, "score", "doc_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
        g["cum_tokens"] = (g.groupby(source_col, sort=False)["n_tokens"]
                           .cumsum().astype("int64"))
        g = g[g["cum_tokens"] <= budget].drop(columns=["part"])
        return typed_if_empty(g.reset_index(drop=True))

    return (ds.map_batches(score, batch_format="pandas")
            .groupby("part").map_groups(keep, batch_format="pandas"))


def export_shards(ds, n_shards: int, key: str = "doc_id",
                  seed: int = 42):
    """Training-export layout: spread rows pseudo-randomly but
    DETERMINISTICALLY across ``n_shards`` shards and give each row its
    position within the shard — the global-shuffle-then-shard step
    before writing training files, without ``random_shuffle``'s
    unreproducible all-to-all.

    shard = md5-bucket(key) % n_shards; position = rank within shard
    by (bucket, key).  Because the md5 bucket is effectively uniform,
    shards balance to ~|ds|/n_shards rows, and consecutive input rows
    land in different shards (the "shuffle").  One exchange, keyed
    directly on the shard id; each shard sorts vectorized in its
    group.  Output: input columns + (shard, shard_pos)."""

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        bucket = _md5_bucket(out[key], seed)
        out["_bucket"] = bucket
        out["shard"] = bucket % n_shards
        return out

    def order_shard(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["_bucket", key], kind="mergesort").copy()
        g["shard_pos"] = np.arange(len(g), dtype="int64")
        return typed_if_empty(g.drop(columns=["_bucket"]))

    return (ds.map_batches(assign, batch_format="pandas")
            .groupby("shard")
            .map_groups(order_shard, batch_format="pandas"))


def interleaved_token_cost(flat_spans_ds, image_tokens: int = 64,
                           num_parts: int = 64):
    """Per-document TRAINING token cost of an interleaved text+media
    span stream (the multimodal-loader budget): text spans cost their
    whitespace token count, every media span a fixed ``image_tokens``
    patch budget (ViT-patch-style), so a packer can cut multimodal
    sequences the way a text packer cuts text.  Input: FLAT span rows
    (doc_id, kind, text, media_ref); media spans are the rows with a
    non-empty ``media_ref``.  Output per doc:
    ``(doc_id, n_text_tokens, n_media, n_tokens)``.

    Shape: vectorized per-span costs + in-batch per-doc partial sums
    (the combiner — a mega-doc's million spans leave each batch as one
    row), ONE coarse doc-keyed exchange summing partials.  Compose
    with :func:`pack_sequences` for multimodal sequence packing.
    """
    from doc_ocr_ray.stages.text_analysis import _tokens

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        is_media = batch["media_ref"].fillna("") != ""
        ntok = _tokens(batch["text"].where(~is_media, "")
                       ).str.len().astype("int64")
        part = pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_text_tokens": ntok,
            "n_media": is_media.astype("int64")})
        out = (part.groupby("doc_id", sort=False, as_index=False)
               [["n_text_tokens", "n_media"]].sum())
        out["part"] = coarse_part(out["doc_id"], num_parts)
        return typed_if_empty(out)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        out = (group.groupby("doc_id", sort=False, as_index=False)
               [["n_text_tokens", "n_media"]].sum())
        out["n_tokens"] = (out["n_text_tokens"]
                           + image_tokens * out["n_media"])
        return typed_if_empty(out)

    return (flat_spans_ds.map_batches(partial, batch_format="pandas")
            .groupby("part").map_groups(combine, batch_format="pandas"))


def pack_sequences(ds, target_tokens: int = 2048, key: str = "doc_id",
                   num_partitions: int = 64):
    """GPT-style sequence packing: concatenate the corpus in global
    ``key`` order and cut every ``target_tokens`` — each document gets
    its token interval ``[start_tok, start_tok + n_tokens)`` in the
    virtual concatenated stream, and the training sequences it lands
    in (``seq_first``..``seq_last``; a doc straddling a cut belongs to
    both, exactly like the standard pack-then-chunk loader).

    Input: Dataset with integer ``key`` and ``n_tokens`` columns (run
    ``token_count_batch`` first).  Zero-token docs drop.

    A global ordered prefix-sum without a global sort: range-partition
    on the key (one cheap min/max aggregate fixes the bins), sum each
    partition, prefix-add the ~``num_partitions`` partial sums on the
    driver (BOUNDED driver state: one int per partition, independent
    of corpus size), broadcast the offsets, then cumsum inside each
    partition.  The small (key, n_tokens) projection is materialized
    once because it is consumed three times — the standard checkpoint
    trade.  The DuckDB twin is ``SUM(n_tokens) OVER (ORDER BY key)``.
    """
    proj = (ds.select_columns([key, "n_tokens"])
            .filter(expr="n_tokens > 0")
            .materialize())
    if proj.count() == 0:
        return proj
    lo = proj.min(key)
    hi = proj.max(key)
    span = hi - lo + 1

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["part"] = ((out[key].astype("int64") - lo)
                       * num_partitions // span).astype("int64")
        return out

    parted = proj.map_batches(add_part, batch_format="pandas")
    totals = {r["part"]: r["sum(n_tokens)"]
              for r in parted.groupby("part").sum("n_tokens").take_all()}
    offsets = {}
    acc = 0
    for p in sorted(totals):
        offsets[p] = acc
        acc += int(totals[p])

    def pack_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(key, kind="mergesort").copy()
        n = g["n_tokens"].astype("int64")
        start = offsets[int(g["part"].iloc[0])] + n.cumsum() - n
        g["start_tok"] = start
        g["seq_first"] = start // target_tokens
        g["seq_last"] = (start + n - 1) // target_tokens
        return typed_if_empty(g.drop(columns=["part"]))

    return (parted.groupby("part")
            .map_groups(pack_part, batch_format="pandas"))


def curate_semantic(docs_ds, emb_ds, quality_min: int = 1000,
                    sim_threshold: float = 0.3, k: int = 8,
                    num_partitions: int | None = None):
    """Text-quality gate x semantic dedup across TWO tables: keep the
    documents that (a) pass the stopword-score quality gate and (b)
    survive SemDeDup pruning of their embeddings — the SemDeDup-paper
    workflow (score the text, prune the embedding space, intersect).

    Shape: the quality gate is a stateless ``map_batches`` filter over
    ``documents``; the semantic side is :func:`semdedup_prune` over
    ``embeddings`` (its output is ids only); the intersection is Ray
    Data's NATIVE hash shuffle join on doc_id = vec_id — both sides
    hash-partitioned, neither broadcast, so it holds when both
    survivor sets are corpus-sized (a broadcast id-set would not).

    ``num_partitions`` sizes the join's aggregator pool: each
    partition is a long-lived shuffle actor with ~100ms+ startup, a
    pure fixed cost at small scale (measured: 32 partitions cost ~3s
    more than 8 on a 2k-row join for identical output).  The default
    (None) derives it from the cluster — ~one partition per core,
    floored at 8 — so the same call is right at test scale AND on a
    wide cluster; pass an explicit value to override.

    Output: (doc_id, score, centroid_id) for the curated set.
    """
    from doc_ocr_ray.stages.similarity import semdedup_prune
    from doc_ocr_ray.stages.text_analysis import _stopword_score

    if num_partitions is None:
        import ray
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def quality_gate(batch: pd.DataFrame) -> pd.DataFrame:
        s = _stopword_score(batch)
        return typed_if_empty(
            s[s["score"] >= quality_min].reset_index(drop=True))

    kept = docs_ds.map_batches(quality_gate, batch_format="pandas")
    survivors = semdedup_prune(emb_ds, threshold=sim_threshold, k=k)
    joined = kept.join(survivors, join_type="inner",
                       num_partitions=num_partitions,
                       on=("doc_id",), right_on=("vec_id",))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "doc_id" not in batch.columns:
            # empty hash-join partitions arrive as 0-column frames
            return typed_if_empty(pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="int64"),
                "centroid_id": pd.Series([], dtype="int64")}))
        return batch[["doc_id", "score", "centroid_id"]]

    return joined.map_batches(project, batch_format="pandas")


def curate_web_corpus(ds, k_prefix: int = 3, template_min_frac: float = 0.2,
                      min_tokens: int = 10, dup_window: int = 8,
                      max_dup_frac: float = 0.5, budget: int = 700,
                      num_partitions: int = 128):
    """The web-curation funnel, composed from the engine's own
    operators — every stage is individually oracle-checked and the
    COMPOSITION has its own end-to-end DuckDB oracle (Q:
    ``curate_web_corpus``):

        template-prefix strip (boilerplate removal) -> token floor ->
        cross-document duplicated-substring drop (ExactSubstr) ->
        per-source token-budget selection

    Output matches :func:`token_budget_select`: one row per surviving
    document — (doc_id, source, score, n_tokens, cum_tokens).

    Scale shape: the template (source, prefix) set is one row per
    REPEATED source prefix — corpus-small by construction — and is
    broadcast once via ``ray.put`` (same trade as ``decontaminate``'s
    benchmark set); the stripped+floored corpus is materialized ONCE
    because two phases consume it (the dup-signal pass and the
    doc-keyed join); the drop join is a tagged-union coarse doc-keyed
    groupby, never a driver-side id set.
    """
    import ray
    from doc_ocr_ray.stages.dedup import dup_substr_signals
    from doc_ocr_ray.stages.text_analysis import (_tokens,
                                                  boilerplate_prefixes)

    # two consumers (template detection + the strip pass) — checkpoint
    # once instead of re-running the upstream read/inject lineage
    ds = ds.materialize()
    tmpl = (boilerplate_prefixes(ds, k=k_prefix,
                                 min_frac=template_min_frac,
                                 num_partitions=num_partitions)
            .map_batches(
                lambda b: typed_if_empty(
                    b.loc[b["is_template"], ["source", "prefix"]]
                    .drop_duplicates()),
                batch_format="pandas"))
    tset = set(map(tuple, tmpl.to_pandas().itertuples(index=False)))
    tref = ray.put(tset)

    def strip_and_floor(batch: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(tref)
        toks = _tokens(batch["text"])
        prefix = toks.map(lambda ws: " ".join(ws[:k_prefix]))
        hit = np.fromiter(((s, p) in t for s, p in
                           zip(batch["source"], prefix)),
                          dtype=bool, count=len(batch))
        # join the stripped text only for the (small) template
        # fraction; token counts derive from toks — no re-tokenize
        text = batch["text"].fillna("").to_numpy(dtype=object, copy=True)
        for i in np.nonzero(hit)[0]:
            text[i] = " ".join(toks.iat[i][k_prefix:])
        n = np.maximum(toks.str.len().to_numpy()
                       - np.where(hit, k_prefix, 0), 0)
        out = pd.DataFrame({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "text": text,
        })
        return typed_if_empty(out[n >= min_tokens])

    base = (ds.map_batches(strip_and_floor, batch_format="pandas")
            .materialize())
    flags = dup_substr_signals(base, window=dup_window,
                               num_parts=num_partitions)

    def tag_docs(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["dup_frac"] = np.float64(0.0)
        out["is_flag"] = np.int8(0)
        out["dpart"] = coarse_part(out["doc_id"], num_partitions)
        return out

    def tag_flags(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "source": pd.Series([""] * len(batch), dtype="object"),
            "text": pd.Series([""] * len(batch), dtype="object"),
            "dup_frac": batch["dup_frac"].astype("float64"),
        })
        out["is_flag"] = np.int8(1)
        out["dpart"] = coarse_part(out["doc_id"], num_partitions)
        return typed_if_empty(out)

    def drop_dupped(group: pd.DataFrame) -> pd.DataFrame:
        bad = set(group.loc[(group["is_flag"] == 1)
                            & (group["dup_frac"] > max_dup_frac),
                            "doc_id"])
        keep = group[(group["is_flag"] == 0)
                     & ~group["doc_id"].isin(bad)]
        return typed_if_empty(
            keep[["doc_id", "source", "text"]].reset_index(drop=True))

    kept = (base.map_batches(tag_docs, batch_format="pandas")
            .union(flags.map_batches(tag_flags, batch_format="pandas"))
            .groupby("dpart").map_groups(drop_dupped,
                                         batch_format="pandas"))
    return token_budget_select(kept, budget=budget,
                               num_partitions=num_partitions)


def realize_mix_plan(ds, weights, budget_tokens: int,
                     group_col: str = "source", key: str = "doc_id",
                     seed: int = 42):
    """REALIZE a data-mixing plan: emit the actual resampled corpus
    rows that :func:`~doc_ocr_ray.stages.text_analysis.mix_plan` only
    plans.  Every doc of source ``s`` appears ``epochs_milli // 1000``
    times, plus once more iff ``md5(seed:key) % 1000 <
    epochs_milli % 1000`` — the shared md5-grid rule, so which docs
    carry the fractional epoch is a pure function of (seed, key):
    re-runs and resumes regenerate the identical mixture.
    ``epochs_milli = ceil_div(1000 * target, src_tokens)`` with
    ``target = budget * w_milli // 1000`` (all integers, matching the
    mix_plan arithmetic).  Output: ``(doc_id, group, repeat_idx)``
    with repeat_idx 0-based per copy.

    Two streaming passes over the pruned (key, group, text)
    projection: the mix_plan stats combine (per-source totals), then
    a stateless explode with the ≤|sources| epoch table broadcast via
    ``ray.put`` — repeats are generated, never shuffled.
    """
    import ray

    from doc_ocr_ray.stages.text_analysis import mix_plan

    plan = mix_plan(ds, weights, budget_tokens, group_col).to_pandas()
    em = {}
    for _, r in plan.iterrows():
        toks, target = int(r["n_tokens"]), int(r["target_tokens"])
        em[r[group_col]] = ((1000 * target + toks - 1) // toks
                            if target > 0 and toks > 0 else 0)
    ref = ray.put(em)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref)
        emv = (batch[group_col].map(t).fillna(0)
               .astype("int64").to_numpy())
        # hash only rows that can emit anything: _md5_bucket is the
        # per-row cost of this stage, and zero-epoch sources (weight
        # 0 / excluded) may dominate the corpus
        live = emv > 0
        batch, emv = batch[live], emv[live]
        frac = emv % 1000
        extra = np.zeros(len(batch), dtype="int64")
        need = frac > 0
        if need.any():
            extra[need] = (_md5_bucket(batch[key][need], seed,
                                       mod=1000)
                           < frac[need]).astype("int64")
        reps = emv // 1000 + extra
        idx = np.repeat(np.arange(len(batch)), reps)
        total = int(reps.sum())
        # 0..reps_i-1 per doc, vectorized (no per-row arange loop)
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        out = pd.DataFrame({
            key: batch[key].to_numpy()[idx],
            group_col: batch[group_col].to_numpy()[idx],
            "repeat_idx": (np.arange(total) - starts).astype("int64"),
        })
        return typed_if_empty(out)

    # project BEFORE the second pass: explode never touches text, and
    # the projection pushes into the parquet scan
    return (ds.select_columns([key, group_col])
            .map_batches(explode, batch_format="pandas"))


def curate_quality_funnel(ds, min_words: int = 50,
                          min_sentences: int = 3,
                          min_ent_micro: int = 1_000_000):
    """The round-2 quality funnel, composed from the engine's own
    document filters — every stage individually oracle-checked and
    the COMPOSITION proven by one chained DuckDB oracle (Q:
    ``curate_quality_funnel``):

        Gopher composite rules -> C4 line cleaning (keep docs, text
        REBUILT from kept lines) -> phrase blocklist over the rebuilt
        text -> character-entropy floor (gibberish cut)

    Output per surviving doc: ``(doc_id, n_words, n_kept_lines,
    ent_micro, clean_text)``.

    Scale shape: a pure filter chain — ONE stateless ``map_batches``
    holding four vectorized kernels, no exchange anywhere, so the
    funnel is embarrassingly parallel at any corpus size and each
    stage only sees the previous stage's survivors.
    """
    from doc_ocr_ray.stages.text_analysis import (c4_filter_batch,
                                                  char_entropy_batch,
                                                  gopher_filter_batch,
                                                  phrase_blocklist_batch)

    empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "n_words": pd.Series([], dtype="int64"),
        "n_kept_lines": pd.Series([], dtype="int64"),
        "ent_micro": pd.Series([], dtype="int64"),
        "clean_text": pd.Series([], dtype="object")})

    def funnel(batch: pd.DataFrame) -> pd.DataFrame:
        g = gopher_filter_batch(batch, min_words=min_words)
        b = batch[(g["keep"] == 1).to_numpy()]
        if not len(b):
            return typed_if_empty(empty.copy())
        nw = g.loc[(g["keep"] == 1).to_numpy(), "n_words"].to_numpy()
        c = c4_filter_batch(b, min_sentences=min_sentences)
        ck = (c["keep"] == 1).to_numpy()
        if not ck.any():
            return typed_if_empty(empty.copy())
        stage2 = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy()[ck],
            "n_words": nw[ck],
            "n_kept_lines": c["n_kept_lines"].to_numpy()[ck],
            "text": c["clean_text"].to_numpy()[ck]})
        bl = phrase_blocklist_batch(stage2)
        stage3 = stage2[(bl["keep"] == 1).to_numpy()]
        if not len(stage3):
            return typed_if_empty(empty.copy())
        ent = char_entropy_batch(stage3)
        keep = (ent["ent_micro"] >= min_ent_micro).to_numpy()
        out = pd.DataFrame({
            "doc_id": stage3["doc_id"].to_numpy()[keep],
            "n_words": stage3["n_words"].to_numpy()[keep],
            "n_kept_lines": stage3["n_kept_lines"].to_numpy()[keep],
            "ent_micro": ent["ent_micro"].to_numpy()[keep],
            "clean_text": stage3["text"].to_numpy()[keep]})
        return typed_if_empty(out)

    return ds.map_batches(funnel, batch_format="pandas")


def pack_tokens(ds, seq_len: int = 2048, key: str = "doc_id",
                seed: int = 42):
    """GPT-style sequence packing — the training-prep step that turns
    a curated corpus into fixed-length model inputs: conceptually,
    concatenate every document's whitespace-token stream in the
    deterministic md5(seed:key) global shuffle order
    (:func:`shuffle_positions`'s order) and cut the stream into
    consecutive ``seq_len``-token bins.  The OUTPUT is the pack map a
    loader needs — one row per (bin, doc) intersection:

        (bin_id, doc_id, bin_off, doc_off, n_slice)

    meaning: tokens ``doc_off .. doc_off+n_slice`` of ``doc_id`` land
    at offset ``bin_off`` of training sequence ``bin_id``.  A doc
    crossing a bin boundary emits one row per bin it touches;
    zero-token docs emit nothing.  Pure function of (seed, key,
    corpus), so re-runs, resumes and multi-reader loaders agree
    without shared state — and every slice is independently
    addressable (resumable export: a loader can rebuild any bin from
    the map + the doc store without materializing packed text).

    Shape — exact global token offsets WITHOUT a global sort, the
    :func:`shuffle_positions` discipline with token-weighted counts:
    the md5 rank's first byte makes 256 balanced buckets; one
    distributed pass sums TOKEN counts per bucket (256 rows to the
    driver -> base token offsets); ONE bucket-keyed exchange sorts
    each bucket locally by (rank, key), cumsums token counts onto the
    bucket base, and EXPLODES each doc's [start, end) token range
    into its bin slices vectorized (np.repeat + clipped interval
    arithmetic — no per-doc loop, no second exchange).  The exchange
    carries (key, rank, n_tokens) only; text never rides a shuffle.

    The DuckDB twin: SUM(n) OVER (ORDER BY md5, key) cumulative
    starts + a range() unnest over each doc's touched bins with the
    identical greatest/least clip arithmetic.
    """
    import hashlib

    from doc_ocr_ray.stages.text_analysis import token_count_batch

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def add_rank(batch: pd.DataFrame) -> pd.DataFrame:
        n = token_count_batch(batch)["n_tokens"].to_numpy(dtype=np.int64)
        ranks = [hashlib.md5(f"{seed}:{k}".encode()).hexdigest()
                 for k in batch[key].astype(str)]
        out = pd.DataFrame({key: batch[key], "rank": ranks,
                            "ntok": n})
        out["bucket"] = [int(r[:2], 16) for r in ranks]
        return typed_if_empty(out)

    # NOT materialized: one md5 + token count per row is cheaper to
    # recompute than a corpus-sized rank table is to spill
    ranked = ds.map_batches(add_rank, batch_format="pandas")

    def bucket_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        c = (batch.groupby("bucket", sort=False)["ntok"].sum()
             .reset_index(name="n"))
        c["n"] = c["n"].astype("int64")
        return typed_if_empty(c)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bucket": [int(group["bucket"].iloc[0])],
                             "n": [int(group["n"].sum())]})

    hist = (ranked.map_batches(bucket_tokens, batch_format="pandas")
            .groupby("bucket").map_groups(combine, batch_format="pandas")
            .to_pandas().sort_values("bucket"))
    base = {}
    acc = 0
    for b, n in zip(hist["bucket"], hist["n"]):
        base[int(b)] = acc
        acc += int(n)

    _empty = pd.DataFrame({
        "bin_id": pd.Series([], dtype="int64"),
        "doc_id": pd.Series([], dtype="int64"),
        "bin_off": pd.Series([], dtype="int64"),
        "doc_off": pd.Series([], dtype="int64"),
        "n_slice": pd.Series([], dtype="int64")})

    def place_and_slice(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["rank", key])
        ntok = g["ntok"].to_numpy(dtype=np.int64)
        start = (np.concatenate(([0], np.cumsum(ntok)[:-1]))
                 + base[int(g["bucket"].iloc[0])])
        end = start + ntok
        nz = ntok > 0
        ids = g[key].to_numpy()[nz]
        start, end, ntok = start[nz], end[nz], ntok[nz]
        if not len(ids):
            return typed_if_empty(_empty)
        first = start // seq_len
        nbins = (end - 1) // seq_len - first + 1
        rep = np.repeat(np.arange(len(ids)), nbins)
        # bin index within each doc's run: global cumcount minus the
        # run's base
        run_base = np.concatenate(([0], np.cumsum(nbins)[:-1]))
        bin_id = first[rep] + (np.arange(rep.size)
                               - run_base[rep])
        lo = np.maximum(bin_id * seq_len, start[rep])
        hi = np.minimum((bin_id + 1) * seq_len, end[rep])
        return pd.DataFrame({
            "bin_id": bin_id.astype("int64"),
            "doc_id": ids[rep],
            "bin_off": (lo - bin_id * seq_len).astype("int64"),
            "doc_off": (lo - start[rep]).astype("int64"),
            "n_slice": (hi - lo).astype("int64")})

    return ranked.groupby("bucket").map_groups(place_and_slice,
                                               batch_format="pandas")


def sample_k_per_group(ds, k: int = 10, group_col: str = "source",
                       key: str = "doc_id", seed: int = 42):
    """Exact-``k`` uniform sample PER GROUP — the per-domain audit
    sample / eval-holdout draw (stratified_sample keeps a RATE, this
    keeps a COUNT): every row ranks by ``md5(seed:key)`` and each
    group keeps its ``k`` smallest ranks.  Membership is a pure
    function of (seed, key), so re-runs and incremental arrivals
    agree on already-sampled rows, and the md5 grid makes the DuckDB
    twin's ``row_number() OVER (ORDER BY md5(...))`` identical.

    Shape: the distributed top-k discipline — per-batch top-k per
    group (combiner: at most groups-in-batch x k rows reach the
    exchange), ONE coarse group-keyed exchange, exact per-group
    top-k inside the group fn.  Groups with fewer than ``k`` rows
    keep everything.  Output: ``(key, group_col, rank_hex)``.
    """
    import hashlib

    from doc_ocr_ray.util import coarse_part, typed_if_empty

    def rank_partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch.dropna(subset=[group_col])
        out = pd.DataFrame({
            key: t[key].astype(str),
            group_col: t[group_col],
            "rank_hex": [hashlib.md5(f"{seed}:{v}".encode())
                         .hexdigest() for v in t[key].astype(str)]})
        out = (out.sort_values("rank_hex")
               .groupby(group_col, sort=False).head(k))
        out["part"] = coarse_part(out[group_col], 64)
        return typed_if_empty(out.reset_index(drop=True))

    def per_group(group: pd.DataFrame) -> pd.DataFrame:
        out = (group.sort_values("rank_hex")
               .groupby(group_col, sort=False).head(k))
        return typed_if_empty(
            out[[key, group_col, "rank_hex"]].reset_index(drop=True))

    return (ds.map_batches(rank_partial, batch_format="pandas")
            .groupby("part").map_groups(per_group,
                                        batch_format="pandas"))


def split_leakage(ds, text_col: str = "text", key: str = "doc_id",
                  seed: int = 42, ratios: Optional[Dict[str, float]] = None,
                  num_parts: int = 256):
    """Train/test contamination audit: pairs of documents whose
    normalized texts are IDENTICAL but whose deterministic split
    assignments differ — exact-duplicate leakage across the
    train/val/test boundary.  The decontamination counterpart of
    :func:`assign_split`: a dedup pass run BEFORE splitting prevents
    these; this op audits a corpus where it didn't (the classic
    benchmark-inflation failure mode).

    Scale shape: split assignment is the embarrassingly-parallel
    md5-bucket map (assign_split's exact rule, composed); all rows
    then ride ONE md5-keyed coarse exchange — the exact_dedup
    discipline: shuffle on the 64-bit text key, group decisions on
    the normalized STRING, so a hash collision can never pair
    distinct texts.  Empty-normalized docs drop before the exchange
    (no content is not leakage — and one giant ''-group would be
    quadratic).  Within a norm group — duplicate sets are small by
    nature — cross-split pairs enumerate locally, ordered
    ``doc_a < doc_b``.  Output (doc_a, split_a, doc_b, split_b)."""
    from doc_ocr_ray.stages.dedup import _md5_64, _normalize

    assigned = assign_split(ds, key=key, seed=seed, ratios=ratios)

    def key_batch(batch: pd.DataFrame) -> pd.DataFrame:
        norm = _normalize(batch[text_col])
        out = pd.DataFrame({
            "doc_id": batch[key].astype("int64"),
            "norm": norm.astype(object),
            "split": batch["split"].astype(object)})
        out = out[out["norm"] != ""]
        out["part"] = pd.Series(
            [_md5_64(t) >> 1 for t in out["norm"]],
            index=out.index, dtype="int64") % num_parts
        return typed_if_empty(out)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids_a, sp_a, ids_b, sp_b = [], [], [], []
        for _, g in group.groupby("norm", sort=False):
            if g["split"].nunique() < 2:
                continue
            recs = sorted(zip(g["doc_id"], g["split"]))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    if recs[i][1] != recs[j][1]:
                        ids_a.append(recs[i][0])
                        sp_a.append(recs[i][1])
                        ids_b.append(recs[j][0])
                        sp_b.append(recs[j][1])
        return typed_if_empty(pd.DataFrame({
            "doc_a": pd.Series(ids_a, dtype="int64"),
            "split_a": pd.Series(sp_a, dtype=object),
            "doc_b": pd.Series(ids_b, dtype="int64"),
            "split_b": pd.Series(sp_b, dtype=object)}))

    return (assigned.map_batches(key_batch, batch_format="pandas")
            .groupby("part").map_groups(pairs, batch_format="pandas"))


def temperature_mix(ds, total: int, seed: int = 42,
                    source_col: str = "source", key: str = "doc_id",
                    num_partitions: int = 128):
    """Temperature-based source rebalancing at alpha = 1/2 — the
    multilingual sampling recipe of mT5 / XLM-R (sample source s with
    probability proportional to ``n_s^alpha``): upweights the tail
    languages/domains a raw-frequency mixture would drown, without
    letting any single giant source dominate.

    Targets are EXACT integer arithmetic so the DuckDB twin matches
    bit for bit: per-source weight ``w_s = isqrt(n_s * 10^12)`` (a
    fixed-point ``sqrt(n_s)`` on a 10^6 grid — Python ``math.isqrt``
    here, a double-sqrt seed corrected by +/-2 integer comparisons in
    the SQL), and target ``t_s = total * w_s // sum(w)``.  Floor
    division under-fills by < 1 doc per source (stated contract — no
    largest-remainder pass).  Which ``t_s`` docs survive per source is
    the ``per_source_cap`` rule: rank by (md5(seed:key), key), keep
    rank <= t_s; seed-stable under re-runs and incremental ingestion.

    Scale shape: per-source counts shrink in-batch (combiner) before
    ONE coarse source-hash exchange whose output is source-cardinality
    rows; the driver holds only the {source: target} map (sources are
    bounded — languages / registered domains — the mix_plan envelope)
    which broadcasts back inside the ranking stage's closure.  The
    ranking pass is the per_source_cap exchange: one coarse source
    hash, all sources of a partition ranked vectorized in one frame.
    Output (doc_id, source, mix_rank) for the kept rows.
    """
    import math

    # consumed twice (count pass + rank pass) — pin the input once
    # instead of re-executing its lineage (the embedding_neardup rule)
    ds = ds.materialize()

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (batch.groupby(source_col, sort=False)[key].count()
             .reset_index(name="n"))
        g["part"] = coarse_part(g[source_col], num_partitions)
        return typed_if_empty(g)

    def count_combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(source_col, sort=False)["n"].sum()
             .reset_index())
        return typed_if_empty(g)

    counts = (ds.map_batches(count_partial, batch_format="pandas")
              .groupby("part")
              .map_groups(count_combine, batch_format="pandas")
              .take_all())                     # source-bounded rows
    if not counts:
        return ds.map_batches(
            lambda b: typed_if_empty(pd.DataFrame({
                key: pd.Series([], dtype=b[key].dtype if key in b else "int64"),
                source_col: pd.Series([], dtype="object"),
                "mix_rank": pd.Series([], dtype="int64")})),
            batch_format="pandas")
    weights = {r[source_col]: math.isqrt(int(r["n"]) * 10 ** 12)
               for r in counts}
    t_sum = sum(weights.values())
    targets = {s: (int(total) * w) // t_sum for s, w in weights.items()}

    def rank_and_keep(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        g["_bucket"] = _md5_bucket(g[key], seed)
        g = g.sort_values([source_col, "_bucket", key],
                          kind="mergesort")
        g["mix_rank"] = (g.groupby(source_col, sort=False).cumcount()
                         + 1).astype("int64")
        cap = g[source_col].map(targets).fillna(0).astype("int64")
        g = g[g["mix_rank"] <= cap]
        return typed_if_empty(
            g[[key, source_col, "mix_rank"]].reset_index(drop=True))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[key, source_col]].copy()
        out["part"] = coarse_part(out[source_col], num_partitions)
        return typed_if_empty(out)

    return (ds.map_batches(add_part, batch_format="pandas")
            .groupby("part")
            .map_groups(rank_and_keep, batch_format="pandas"))
