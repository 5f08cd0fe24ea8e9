"""Tests for the training-data operators: dedup, similarity, text
analysis, multimodal plumbing, relational demos, metrics."""
import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def _docs_with_dups():
    import ray.data
    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).head(60)
    dup = df.head(20).copy()
    dup["doc_id"] = dup["doc_id"] + 1_000_000
    # near-dup: drop one word
    dup["text"] = dup["text"].map(
        lambda t: " ".join(w for i, w in enumerate(t.split(" ")) if i != 3))
    exact = df.iloc[20:30].copy()
    exact["doc_id"] = exact["doc_id"] + 2_000_000
    return ray.data.from_pandas(pd.concat([df, dup, exact],
                                          ignore_index=True))


def test_exact_dedup_drops_exact_copies():
    from doc_ocr_ray.stages.dedup import exact_dedup
    ds = _docs_with_dups()
    out = exact_dedup(ds).take_all()
    ids = sorted(r["doc_id"] for r in out)
    assert len(out) == 80                       # 60 base + 20 near (not exact)
    assert all(i < 2_000_000 for i in ids)      # exact copies lost, min kept


def test_token_multiset_dedup_catches_shuffled_text():
    import ray.data
    from doc_ocr_ray.stages.dedup import token_multiset_dedup
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta gamma", "gamma beta alpha", "alpha beta delta"],
    })
    out = token_multiset_dedup(ray.data.from_pandas(df)).take_all()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 3]


def test_minhash_finds_injected_near_dups():
    from doc_ocr_ray.stages.dedup import minhash_dedup_pairs
    pairs = minhash_dedup_pairs(_docs_with_dups(), threshold=0.6).take_all()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    hits = sum(1 for a, b in found if b == a + 1_000_000)
    assert hits >= 18                           # >=90% recall on injected dups
    exact_hits = sum(1 for a, b in found if b == a + 2_000_000)
    assert exact_hits == 10                     # exact copies always caught


def test_band_bucket_pairs_clique_star_equiv():
    """clique_star (the jobs-path scale guard): an identical-signature
    cluster emits a star to its min doc instead of all b(b-1)/2 pairs,
    and the connected components derived from the pairs are IDENTICAL
    to full enumeration — while pair count collapses from quadratic
    to linear in the cluster size."""
    import numpy as np
    from doc_ocr_ray.stages.dedup import band_bucket_pairs

    def union_groups(pairs_df):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
            parent[find(int(a))] = find(int(b))
        groups = {}
        for x in list(parent):
            groups.setdefault(find(x), set()).add(x)
        return {frozenset(g) for g in groups.values() if len(g) > 1}

    rng = np.random.RandomState(2)
    sig_a = rng.randint(0, 2**32, 64, dtype=np.uint64).astype(np.uint32)
    sig_b = sig_a.copy()
    sig_b[:8] = (sig_b[:8] + 1).astype(np.uint32)   # 56/64 agree: near
    sig_c = rng.randint(0, 2**32, 64, dtype=np.uint64).astype(np.uint32)
    rows = []
    # 40-member identical cluster + 3 near members + 2 unrelated
    for d in range(40):
        rows.append({"doc_id": d, "band": 0, "band_hash": 7,
                     "signature": sig_a.tobytes()})
    for d in (100, 101, 102):
        rows.append({"doc_id": d, "band": 0, "band_hash": 7,
                     "signature": sig_b.tobytes()})
    for d, s in ((200, sig_c), (201, sig_c[::-1].copy())):
        rows.append({"doc_id": d, "band": 0, "band_hash": 7,
                     "signature": s.tobytes()})
    group = pd.DataFrame(rows)
    full = band_bucket_pairs(group, threshold=0.8)
    star = band_bucket_pairs(group, threshold=0.8, clique_star=True)
    assert union_groups(full) == union_groups(star)
    # the identical 40-clique alone is 780 pairs in full mode
    assert len(full) > 700 and len(star) < 60
    # star edges anchor at the clique min with est 1.0
    star_a = star[star["est_jaccard"] == 1.0]
    assert set(star_a[star_a["doc_a"] == 0]["doc_b"]) == set(range(1, 40))

    # review regression: a concat input with DUPLICATE index labels
    # must not mis-select reps (self-pairs / cross-signature merges)
    dup_idx = pd.concat([group.iloc[:20], group.iloc[20:]])  # labels reused
    dup_idx.index = list(range(20)) + list(range(len(group) - 20))
    star2 = band_bucket_pairs(dup_idx, threshold=0.8, clique_star=True)
    assert not (star2["doc_a"] == star2["doc_b"]).any()
    assert union_groups(star2) == union_groups(full)


def test_minhash_verify_exact_jaccard():
    from doc_ocr_ray.stages.dedup import (minhash_dedup_pairs,
                                          verify_pairs_exact, ngram_jaccard)
    ds = _docs_with_dups()
    pairs = minhash_dedup_pairs(ds, threshold=0.6)
    verified = verify_pairs_exact(ds, pairs, threshold=0.6).take_all()
    assert verified
    assert all(v["jaccard"] >= 0.6 for v in verified)
    assert ngram_jaccard("abcdefgh", "abcdefgh") == 1.0
    assert ngram_jaccard("abcdefgh", "zzzzzzzz") == 0.0


def test_pair_verify_scaffold_matches_bruteforce():
    """The distributed tagged-union payload↔pair exchange (round-2
    verdict item 1: no driver-built payload dict) must emit exactly
    what a per-pair brute-force scorer would: one row per distinct
    qualifying pair, pairs referencing absent docs dropped, empty
    shingle sets dropped."""
    import ray
    from doc_ocr_ray.stages.dedup import verify_pairs_exact, ngram_jaccard

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "the quick brown fox jumped over the lazy dog",
                 "a completely different document about ray data",
                 "",                       # empty shingle set
                 "a completely different document about ray data!"]})
    pairs = pd.DataFrame({
        "doc_a": [1, 1, 3, 4, 7],          # (4,*): empty side
        "doc_b": [2, 3, 5, 5, 8]})         # (7,8): absent from corpus
    out = (verify_pairs_exact(ray.data.from_pandas(docs),
                              ray.data.from_pandas(pairs), threshold=0.5)
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    texts = dict(zip(docs["doc_id"], docs["text"]))
    expect = []
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        if a not in texts or b not in texts:
            continue
        if not texts[a] or not texts[b]:
            continue
        j = ngram_jaccard(texts[a], texts[b])
        if j >= 0.5:
            expect.append((a, b))
    assert list(zip(out["doc_a"], out["doc_b"])) == sorted(expect)
    assert (1, 2) in expect and (3, 5) in expect   # non-vacuous
    assert all(out["jaccard"] >= 0.5)


def test_candidate_bloom_no_false_negatives(ray_session):
    """The fixed-size bloom replacing the round-3 driver id set must
    never drop a real candidate (false negatives would silently lose
    verified pairs); false positives must stay rare at the 16-bits/id
    sizing (they only waste payload rows, but a sieve that passes
    everything is no prune at all)."""
    import ray
    from doc_ocr_ray.stages.dedup import _candidate_bloom, _bloom_test

    rng = np.random.default_rng(7)
    ids = rng.choice(10**12, size=4000, replace=False).astype("int64")
    pairs_df = pd.DataFrame({"doc_a": ids[:2000], "doc_b": ids[2000:]})
    pairs = ray.data.from_pandas(pairs_df).repartition(4).materialize()
    bloom = _candidate_bloom(pairs, pairs.count())
    assert bloom.dtype == np.uint64
    assert _bloom_test(bloom, ids).all()            # no false negatives
    absent = rng.choice(10**12, size=20000).astype("int64")
    absent = absent[~np.isin(absent, ids)]
    fp = _bloom_test(bloom, absent).mean()
    assert fp < 0.05, fp                             # ~2% at 16 bits/id


def test_containment_catches_quotes_jaccard_misses(ray_session):
    """verify_pairs_containment: a short quote embedded in a long doc
    scores containment 1000 while its Jaccard is far below any dedup
    threshold; unrelated pairs stay out."""
    import ray
    from doc_ocr_ray.stages.dedup import (ngram_jaccard,
                                          verify_pairs_containment)

    long_doc = " ".join(f"unique word number {i} in a long body"
                        for i in range(40))
    quote = " ".join(long_doc.split(" ")[:12])
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [long_doc, quote, "totally different content here"]})
    pairs = pd.DataFrame({"doc_a": [1, 1], "doc_b": [2, 3]})
    out = (verify_pairs_containment(ray.data.from_pandas(docs),
                                    ray.data.from_pandas(pairs),
                                    t_milli=900)
           .to_pandas())
    assert out.to_dict("records") == [
        {"doc_a": 1, "doc_b": 2, "cont_milli": 1000}]
    assert ngram_jaccard(long_doc, quote) < 0.3   # resemblance misses


def test_simhash_finds_injected_near_dups():
    from doc_ocr_ray.stages.dedup import simhash_dedup_pairs
    pairs = simhash_dedup_pairs(_docs_with_dups(), max_hamming=3).take_all()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    exact_hits = sum(1 for a, b in found if b == a + 2_000_000)
    assert exact_hits == 10
    assert all(p["hamming"] <= 3 for p in pairs)


def test_drop_near_duplicates():
    from doc_ocr_ray.stages.dedup import minhash_dedup_pairs, drop_near_duplicates
    ds = _docs_with_dups()
    pairs = minhash_dedup_pairs(ds, threshold=0.6)
    kept = drop_near_duplicates(ds, pairs).take_all()
    kept_ids = {r["doc_id"] for r in kept}
    # every injected exact dup (the larger id of its pair) is gone
    assert not any(i >= 2_000_000 for i in kept_ids)
    # and the NEAR duplicates (the function's main job): at most the
    # <=2 pairs minhash may miss survive
    near_survivors = sum(1 for i in kept_ids if 1_000_000 <= i < 2_000_000)
    assert near_survivors <= 2


def test_knn_brute_matches_numpy_oracle():
    import ray.data
    from doc_ocr_ray.stages.similarity import knn_brute
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    ds = ray.data.from_pandas(df)
    out = knn_brute(ds, query_ids=[0, 1, 2], k=4).to_pylist()
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    for qid in [0, 1, 2]:
        q = X[list(ids).index(qid)]
        scores = X @ q
        order = sorted(((float(s), int(v)) for s, v in zip(scores, ids)
                        if v != qid), key=lambda t: (-t[0], t[1]))[:4]
        got = [(r["vec_id"], r["score"]) for r in out if r["query_id"] == qid]
        assert [v for _, v in order] == [v for v, _ in got]


def test_knn_lsh_overlaps_brute():
    """Approximate path: top-1 should agree with brute force for most
    queries (sanity recall bound, deterministic seeds)."""
    import ray.data
    from doc_ocr_ray.stages.similarity import knn_brute, knn_lsh
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    ds = ray.data.from_pandas(df)
    qids = list(range(10))
    brute = {(r["query_id"]): r["vec_id"]
             for r in knn_brute(ds, qids, k=1).to_pylist()}
    approx = {(r["query_id"]): r["vec_id"]
              for r in knn_lsh(ds, qids, k=1, n_bits=6,
                               probe_hamming=1).to_pylist()}
    agree = sum(1 for q in qids if brute.get(q) == approx.get(q))
    assert agree >= 7


def test_lang_id_and_quality_kernels():
    from doc_ocr_ray.stages.text_analysis import lang_id_batch, quality_score_batch
    batch = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the cat is on the mat", "der hund ist nicht hier",
                 "这是一个中文句子的示例文本", ""],
    })
    out = lang_id_batch(batch)
    assert list(out["lang_pred"]) == ["en", "de", "zh", "en"]
    q = quality_score_batch(batch)
    assert q["n_tokens"].tolist() == [6, 5, 1, 0]
    assert (q["punct_ratio"] <= 1).all()


def test_winnow_fingerprints_stable():
    from doc_ocr_ray.stages.text_analysis import winnow_fingerprints
    a = winnow_fingerprints("the quick brown fox jumps over the lazy dog")
    b = winnow_fingerprints("the quick brown fox jumps over the lazy dog")
    assert a == b and a
    # winnowing is robust to a distant edit: shared prefix fingerprints overlap
    c = winnow_fingerprints("the quick brown fox jumps over the lazy cat")
    assert set(a) & set(c)


def test_multimodal_decode_plumbing():
    import ray.data
    from doc_ocr_ray.stages.multimodal import (
        MediaDecodeStage, FrameSampleStage, decode_media,
        synthesize_media_table, FEATURE_DIM)
    tbl = synthesize_media_table(["d1", "d2"], ["img:1", "img:2"])
    out = decode_media(ray.data.from_arrow(tbl), concurrency=1,
                       batch_size=2).take_all()
    assert len(out) == 2
    assert all(len(r["feature"]) == FEATURE_DIM for r in out)
    # deterministic features
    out2 = decode_media(ray.data.from_arrow(tbl), concurrency=1,
                        batch_size=2).take_all()
    assert out[0]["feature"] == out2[0]["feature"]
    # real-decoder hook is an explicit stub
    stage = MediaDecodeStage(use_fake_decoder=False)
    with pytest.raises(NotImplementedError):
        stage(tbl)
    frames = FrameSampleStage(every_n=2)(tbl)
    assert frames.num_rows > 2                  # one row in, N frames out

    # REAL frame sampling over y4m payloads (round-4: the stage's
    # fake-only path got the real decode): every-nth frame ref with
    # the true per-frame luma mean
    from doc_ocr_ray.stages.multimodal import (encode_y4m,
                                               synthesize_video_table)
    vt = synthesize_video_table([3])
    real = FrameSampleStage(every_n=10, use_fake_decoder=False)(vt)
    assert real.num_rows == 7                   # 65 frames, every 10th
    assert real["frame_ref"].to_pylist()[0] == "vid:3#frame0"
    lm = real["luma_mean"].to_pylist()
    assert all(0 <= v <= 255 for v in lm) and len(set(lm)) > 1


def test_metrics_evaluate_self_is_perfect():
    import ray.data
    from doc_ocr_ray import synth
    from doc_ocr_ray.pipelines.extract import extract_questions
    from doc_ocr_ray.pipelines.metrics import corpus_metadata, evaluate, qtype_histogram
    ds = ray.data.from_arrow(synth.generate_table(40, seed=42))
    qs = extract_questions(ds)
    m = corpus_metadata(qs)
    assert m["total_questions"] > 0
    assert m["total_images"] >= m["with_images"]
    hist = qtype_histogram(qs).take_all()
    assert sum(h["n"] for h in hist) == m["total_questions"]
    scores = evaluate(extract_questions(ds), extract_questions(ds))
    assert scores["precision"] == 1.0 and scores["recall"] == 1.0
    assert scores["f1"] == 1.0 and scores["image_assoc_accuracy"] == 1.0


def test_kmv_sketch_accuracy_and_mergeability():
    import ray.data
    from doc_ocr_ray.stages.sketch import kmv_distinct_tokens, exact_distinct_tokens
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    exact = exact_distinct_tokens(ds).to_pylist()[0]["n_distinct_tokens"]
    est = kmv_distinct_tokens(ds, k=1024)["estimate"]
    # corpus vocab is small (< k) -> sketch saw everything, exact match
    assert est == exact
    # force the estimation path with a tiny k
    est_small = kmv_distinct_tokens(ds, k=16)["estimate"]
    assert 0.3 * exact <= est_small <= 3 * exact
    # mergeability: the merged estimate is invariant to how the corpus
    # is batched — k smallest of the union is the same set regardless
    # of which partial sketch each hash came from
    est_1part = kmv_distinct_tokens(ds.repartition(1), k=16)["estimate"]
    est_8part = kmv_distinct_tokens(ds.repartition(8), k=16)["estimate"]
    assert est_1part == est_8part


def test_curate_corpus_end_to_end():
    import ray.data
    from doc_ocr_ray import synth
    from doc_ocr_ray.pipelines.curate import curate_corpus
    ds = ray.data.from_arrow(synth.generate_table(80, seed=42))
    rows = curate_corpus(ds).take_all()
    assert rows
    texts = [r["text"] for r in rows]
    # dedup happened: normalized texts are unique
    norm = [" ".join(t.strip().lower().split()) for t in texts]
    assert len(norm) == len(set(norm))
    # quality filter: no empty/tiny rows (token OR char floor — a
    # spaceless CJK question is one token but plenty of content)
    assert all(r["n_tokens"] >= 2 or len(r["text"]) >= 8 for r in rows)
    # question numbers preserved
    assert any(r["question_number"] > 0 for r in rows)


def test_dedup_lines_keeps_global_first_occurrence():
    """Every duplicated line survives only at its smallest
    (doc_id, line_no); docs rebuilt in order; fully-losing docs drop."""
    import ray.data
    from doc_ocr_ray.stages.dedup import dedup_lines
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["A\nB",        # both lines win
                 "B\nC",        # B loses to (0,1); C wins at (1,1)
                 "A\nC\nA",     # all three occurrences lose
                 "X",           # unique line
                 "B"],          # loses -> doc drops
    })
    out = (dedup_lines(ray.data.from_pandas(docs).repartition(3))
           .to_pandas().set_index("doc_id")["text"].to_dict())
    assert out == {0: "A\nB", 1: "C", 3: "X"}


def test_funnel_counts_strict_ordering():
    """Earliest-chain funnel with STRICT time ordering: user 3's
    same-timestamp click does not complete step 2, user 2's
    before-view click is ignored, user 4 without a view contributes
    nothing."""
    import ray.data
    from doc_ocr_ray.pipelines.events import funnel_counts
    ts = pd.to_datetime
    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 2, 2, 3, 3, 4, 4],
        "event_type": ["view", "click", "purchase",
                       "click", "view", "click", "purchase",
                       "view", "click",
                       "click", "purchase"],
        "ts": [ts("2024-01-01 00:00:01"), ts("2024-01-01 00:00:02"),
               ts("2024-01-01 00:00:03"),
               ts("2024-01-01 00:00:01"), ts("2024-01-01 00:00:02"),
               ts("2024-01-01 00:00:03"), ts("2024-01-01 00:00:05"),
               ts("2024-01-01 00:00:01"), ts("2024-01-01 00:00:01"),
               ts("2024-01-01 00:00:01"), ts("2024-01-01 00:00:02")],
    })
    out = (funnel_counts(ray.data.from_pandas(ev).repartition(3),
                         steps=["view", "click", "purchase"])
           .to_pandas().set_index("step")["users"].to_dict())
    assert out == {1: 3, 2: 2, 3: 2}


def test_sample_exact_n_partition_invariant():
    """Exactly n rows, the SAME n rows regardless of partitioning,
    numbered 1..n in md5-rank order; n >= corpus returns everything."""
    import ray.data
    from doc_ocr_ray.pipelines.curate import sample_exact_n, _md5_bucket
    docs = pd.DataFrame({"doc_id": list(range(40))})
    expect = (docs.assign(r=_md5_bucket(docs["doc_id"], 42))
              .sort_values(["r", "doc_id"]).head(7)["doc_id"].tolist())
    for parts in (1, 5):
        out = (sample_exact_n(
                   ray.data.from_pandas(docs).repartition(parts), n=7)
               .to_pandas().sort_values("smp_rank"))
        assert out["doc_id"].tolist() == expect
        assert out["smp_rank"].tolist() == list(range(1, 8))
    full = sample_exact_n(ray.data.from_pandas(docs), n=100).to_pandas()
    assert len(full) == 40


def test_exactsubstr_pair_matches_brute_force_reference():
    """One seeded randomized corpus (120 docs over a 4-token alphabet,
    window=3) checked against an independent pure-Python reference for
    BOTH ExactSubstr operators: signals (per-doc duplicated-window
    counts) and removal (covered-token edit + full-cover drop)."""
    import random
    import ray.data
    from doc_ocr_ray.stages.dedup import (dup_substr_signals,
                                          dedup_substr_remove)
    rng = random.Random(7)
    W, AB = 3, ["aa", "bb", "cc", "dd"]
    docs = {i: [rng.choice(AB) for _ in range(rng.randint(0, 9))]
            for i in range(120)}

    # reference: global window counts, then per-doc signals + edits
    from collections import Counter
    wins = Counter()
    for ws in docs.values():
        for i in range(len(ws) - W + 1):
            wins[" ".join(ws[i:i + W])] += 1
    exp_sig, exp_txt = {}, {}
    for d, ws in docs.items():
        starts = [i for i in range(len(ws) - W + 1)
                  if wins[" ".join(ws[i:i + W])] >= 2]
        if len(ws) >= W:
            exp_sig[d] = (len(ws) - W + 1, len(starts))
        covered = set()
        for s in starts:
            covered.update(range(s, s + W))
        kept = [w for p, w in enumerate(ws) if p not in covered]
        if kept:
            exp_txt[d] = " ".join(kept)

    ds = ray.data.from_items(
        [{"doc_id": d, "text": " ".join(ws)} for d, ws in docs.items()]
    ).repartition(5)
    sig = (dup_substr_signals(ds, window=W).to_pandas()
           .set_index("doc_id"))
    assert {d: (r["n_windows"], r["dup_windows"])
            for d, r in sig.iterrows()} == exp_sig
    txt = (dedup_substr_remove(ds, window=W).to_pandas()
           .set_index("doc_id")["text"].to_dict())
    assert txt == exp_txt


def test_media_dedup_keeps_min_doc_per_payload():
    """One survivor per distinct payload BYTES, smallest (doc_id,
    media_ref); payload equality is decided on the bytes inside the
    group, the md5 is only the shuffle key."""
    import pyarrow as pa
    import ray.data
    from doc_ocr_ray.stages.multimodal import media_dedup
    t = pa.table({
        "media_ref": ["r1", "r2", "r3", "r4"],
        "doc_id": ["d2", "d1", "d3", "d9"],
        "payload": [b"\x00" * 64, b"\x00" * 64, b"\x00" * 64, b"\xff"],
        "payload_len": [64, 64, 64, 1],
    })
    out = (media_dedup(ray.data.from_arrow(t).repartition(2))
           .to_pandas().sort_values("doc_id"))
    assert list(out["doc_id"]) == ["d1", "d9"]
    assert list(out["media_ref"]) == ["r2", "r4"]


def test_cross_source_overlap_distinct_gram_pairs():
    """Shared DISTINCT gram counts per source pair (window=2): s1/s2
    share only 'a b' (counted once though s1 has it in two docs),
    s1/s3 share 'b c', s2/s3 share nothing (no row)."""
    import ray.data
    from doc_ocr_ray.stages.dedup import cross_source_overlap
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "source": ["s1", "s1", "s2", "s3"],
        "text": ["a b c", "a b z", "a b x", "b c"],
    })
    out = (cross_source_overlap(
               ray.data.from_pandas(docs).repartition(2), window=2)
           .to_pandas().set_index(["source_a", "source_b"])
           ["shared_grams"].to_dict())
    assert out == {("s1", "s2"): 1, ("s1", "s3"): 1}


def test_dedup_substr_remove_edits_and_drops():
    """Tokens covered by ANY duplicated 8-window vanish — including
    boundary windows ([b..tail] matches across docs 1/2, so 'tail'
    goes too); fully-covered docs drop; <8-token docs and unique docs
    survive whole (token-rejoined)."""
    import ray.data
    from doc_ocr_ray.stages.dedup import dedup_substr_remove
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["a b c d e f g h tail one",
                 "x a b c d e f g h tail two",
                 "p q r s t u v w p q r s t u v w",
                 "short doc",
                 "m n o p q r s t unique"],
    })
    out = (dedup_substr_remove(
               ray.data.from_pandas(docs).repartition(3), window=8)
           .to_pandas().set_index("doc_id")["text"].to_dict())
    assert out == {1: "one", 2: "x two", 4: "short doc",
                   5: "m n o p q r s t unique"}


def test_curate_web_corpus_composition():
    """Every funnel stage must fire: docs 1-2 lose their s1 template
    prefix (2/4 of the source share it), doc 6 falls to the token
    floor after no strip, doc 4 exceeds max_dup_frac (2/3 of its
    3-token windows shared with doc 5) while doc 5 sits exactly ON the
    0.5 boundary and survives, and the budget keeps only the cumsum
    prefix per source."""
    import ray.data
    from doc_ocr_ray.pipelines.curate import curate_web_corpus
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "source": ["s1", "s1", "s1", "s2", "s2", "s1"],
        "text": ["HDR :: the cat sat on mat",
                 "HDR :: a dog ran far away",
                 "totally unique text without the pattern",
                 "alpha beta gamma delta epsilon",
                 "zeta beta gamma delta epsilon eta",
                 "too small"],
    })
    out = (curate_web_corpus(
               ray.data.from_pandas(docs).repartition(3),
               k_prefix=2, template_min_frac=0.5, min_tokens=4,
               dup_window=3, max_dup_frac=0.5, budget=10)
           .to_pandas().set_index("doc_id").sort_index())
    assert sorted(out.index) == [1, 2, 5]       # 3 over budget, 4 dup,
    assert out["cum_tokens"].to_dict() == {1: 5, 2: 10, 5: 6}
    assert out.loc[1, "score"] == 2000          # prefix was stripped


def test_source_salient_terms_ppm_lift():
    """score = (10^6 * cnt_sw * T) // (tok_s * cnt_w) exactly; ranks
    per source by score DESC, token ASC.  Hand-computed on a 5-token
    corpus: T=5; s1 apple 10^7//6, banana 5*10^6//6; s2 cherry
    5*10^6//2, banana 5*10^6//4."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import source_salient_terms
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "source": ["s1", "s1", "s2"],
        "text": ["apple apple", "banana", "banana cherry"],
    })
    out = (source_salient_terms(
               ray.data.from_pandas(docs).repartition(2), k=5)
           .to_pandas().set_index(["source", "rank"]).sort_index())
    assert out.loc[("s1", 1), "token"] == "apple"
    assert out.loc[("s1", 1), "score"] == 1_666_666
    assert out.loc[("s1", 2), "token"] == "banana"
    assert out.loc[("s1", 2), "score"] == 833_333
    assert out.loc[("s2", 1), "token"] == "cherry"
    assert out.loc[("s2", 1), "score"] == 2_500_000
    assert out.loc[("s2", 2), "token"] == "banana"
    assert out.loc[("s2", 2), "score"] == 1_250_000


def test_boilerplate_prefix_detection():
    """A 3-token prefix is a template iff >=2 docs of the source share
    it and it covers >= min_frac of the source; counts are per-source
    windows and must survive partitioning."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import boilerplate_prefixes
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "source": ["s1", "s1", "s1", "s1", "s2", "s2"],
        "text": ["hdr A :: body one",     # s1 template (2/4 = 0.5)
                 "hdr A :: body two",
                 "unique start here x",
                 "another unique doc y",
                 "hdr B :: only once",    # s2: no repeat -> no template
                 "different entirely z"],
    })
    out = (boilerplate_prefixes(
               ray.data.from_pandas(docs).repartition(3),
               k=3, min_frac=0.4)
           .to_pandas().set_index("doc_id").sort_index())
    assert out["is_template"].to_dict() == {
        1: True, 2: True, 3: False, 4: False, 5: False, 6: False}
    assert out.loc[1, "prefix"] == "hdr A ::"
    assert out.loc[1, "prefix_frac"] == 0.5
    assert out.loc[5, "n_prefix"] == 1


def test_token_budget_select_prefix_rule():
    """Within each source docs rank by stopword score DESC (doc_id
    tie-break) and the kept set is the ordered prefix whose running
    token total fits the budget — an oversized doc mid-ranking ends
    its source's prefix (window-cumsum semantics, not knapsack)."""
    import ray.data
    from doc_ocr_ray.pipelines.curate import token_budget_select
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "source": ["a", "a", "a", "a", "b", "b"],
        # scores: the=stopword; 1: 2/4 -> 5000, 2: 2/2 -> 10000,
        # 3: 1/8 -> 1250, 4: 0/1 -> 0, 5: 1/2 -> 5000, 6: 0/3 -> 0
        "text": ["the cat the mat",                   # 4 toks
                 "the the",                           # 2 toks
                 "the w w w w w w w",                 # 8 toks (oversized)
                 "x",                                 # 1 tok
                 "the dog",                           # 2 toks
                 "q r s"],                            # 3 toks
    })
    out = (token_budget_select(
               ray.data.from_pandas(docs).repartition(2), budget=6)
           .to_pandas().set_index("doc_id").sort_index())
    # source a order: 2 (10000), 1 (5000), 3 (1250), 4 (0);
    # cum = 2, 6, 14, 15 -> keep 2 and 1; doc 4 blocked by 3's cum
    # source b order: 5 (5000), 6 (0); cum = 2, 5 -> both kept
    assert sorted(out.index) == [1, 2, 5, 6]
    assert out["cum_tokens"].to_dict() == {1: 6, 2: 2, 5: 2, 6: 5}


def test_dup_substr_cross_doc_and_internal_repeats():
    """ExactSubstr window counting: a window is duplicated iff its
    8-token gram occurs >= 2 times corpus-wide — across docs (0 vs 1)
    or twice inside one doc (2); docs with < 8 tokens drop; batching /
    partitioning must not change counts."""
    import ray.data
    from doc_ocr_ray.stages.dedup import dup_substr_signals
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["a b c d e f g h tail1",            # 2 windows, 1 dup
                 "x a b c d e f g h tail2",          # 3 windows, 1 dup
                 "p q r s t u v w p q r s t u v w",  # pos 0 == pos 8
                 "short doc",                        # < 8 tokens: drops
                 "m n o p q r s t"],                 # 1 unique window
    })
    out = (dup_substr_signals(
               ray.data.from_pandas(docs).repartition(3), window=8)
           .to_pandas().set_index("doc_id").sort_index())
    assert out["n_windows"].to_dict() == {1: 2, 2: 3, 3: 9, 5: 1}
    assert out["dup_windows"].to_dict() == {1: 1, 2: 1, 3: 2, 5: 0}
    assert out.loc[3, "dup_frac"] == 0.2222          # floor grid


def test_lm_score_hand_computed_bigram_frequencies():
    """Corpus counts ab=3, ba=1 -> cmax=3; doc0 'abab' scores
    floor(1000*(3+1+3)/(3*3))=777, doc1 'ab' floor(1000*3/3)=1000,
    docs with <2 chars score 0.  Batching must not change counts."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import lm_score
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["abab", "ab", "x", None],
    })
    out = (lm_score(ray.data.from_pandas(docs).repartition(3))
           .to_pandas().set_index("doc_id")["lm_milli"].to_dict())
    assert out == {0: 777, 1: 1000, 2: 0, 3: 0}


def test_dsir_weights_integer_ratio_grid():
    """DSIR two-pass weighting: per-bucket weight
    (10000*(tgt+1))//(raw+1) over md5%64 hashed tokens, per-doc score =
    sum of bucket weights over occurrences.  Expected values computed
    by an independent dict-based path (collision-safe: buckets come
    from the same md5 contract the SQL oracle states); batching must
    not change anything."""
    import hashlib
    import ray.data
    from doc_ocr_ray.stages.text_analysis import dsir_weights
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["Foo  foo bar", "foo baz", "  ", None],
        "lang": ["en", "zh", "en", "fr"],
    })
    bkt = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:16], 16) % 64
    raw, tgt = {}, {}
    for text, lang in zip(docs["text"], docs["lang"]):
        for tok in (text or "").lower().split():
            b = bkt(tok)
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    w = {b: (10_000 * (tgt.get(b, 0) + 1)) // (raw[b] + 1) for b in raw}
    expect = {
        0: 2 * w[bkt("foo")] + w[bkt("bar")],
        1: w[bkt("foo")] + w[bkt("baz")],
        2: 0, 3: 0,
    }
    out = (dsir_weights(ray.data.from_pandas(docs).repartition(3))
           .to_pandas().set_index("doc_id"))
    assert out["dsir_weight"].to_dict() == expect
    assert out["n_tokens"].to_dict() == {0: 3, 1: 2, 2: 0, 3: 0}


def test_quantiles_by_source_exact_rank_rule():
    """Histogram-partial quantiles match the explicit rank rule
    ceil(q*n) on even counts and ties, independent of batching."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import quantiles_by_source
    # src a: token counts [1,2,3,4] -> p250=1 p500=2 p750=3
    # src b: counts [5,5,5,7]       -> p250=5 p500=5 p750=5 (ties)
    # src c: counts [9]             -> all quantiles 9
    def txt(n):
        return " ".join("w" * 1 for _ in range(n))
    docs = pd.DataFrame({
        "doc_id": range(9),
        "source": ["a"] * 4 + ["b"] * 4 + ["c"],
        "text": [txt(n) for n in [1, 2, 3, 4, 5, 5, 5, 7, 9]],
    })
    out = (quantiles_by_source(ray.data.from_pandas(docs).repartition(4))
           .to_pandas().set_index("source").sort_index())
    assert out.loc["a", ["n_docs", "p250", "p500", "p750"]].tolist() \
        == [4, 1, 2, 3]
    assert out.loc["b", ["n_docs", "p250", "p500", "p750"]].tolist() \
        == [4, 5, 5, 5]
    assert out.loc["c", ["n_docs", "p250", "p500", "p750"]].tolist() \
        == [1, 9, 9, 9]


def test_curate_semantic_intersects_both_gates():
    """curate_semantic keeps exactly the docs that pass the stopword
    quality gate AND whose embedding survives SemDeDup: doc 40 fails
    quality, vec 41 (injected near-copy of vec 40) is pruned, every
    other id survives with the full-stopword score."""
    import ray.data
    from doc_ocr_ray.pipelines.curate import curate_semantic
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    emb = emb[emb["vec_id"] < 60].reset_index(drop=True)
    vecs = {int(i): np.asarray(v, dtype=np.float64)
            for i, v in zip(emb["vec_id"], emb["embedding"])}
    vecs[41] = vecs[40] + 0.001       # near-copy -> same cluster, pruned
    emb["embedding"] = [list(vecs[int(i)]) for i in emb["vec_id"]]
    stop = "the a of and to in is"    # score 10000 on the 0..10000 grid
    docs = pd.DataFrame({
        "doc_id": list(range(60)),
        "text": ["zzz qqq" if i == 40 else stop for i in range(60)],
    })
    out = curate_semantic(ray.data.from_pandas(docs).repartition(3),
                          ray.data.from_pandas(emb).repartition(3),
                          quality_min=1000, sim_threshold=0.95,
                          k=8, num_partitions=4).to_pandas()
    ids = set(out["doc_id"])
    assert 40 not in ids              # failed the quality gate
    assert 41 not in ids              # pruned by SemDeDup
    assert ids == set(range(60)) - {40, 41}
    assert (out["score"] == 10000).all()
    assert set(out.columns) == {"doc_id", "score", "centroid_id"}


def test_drop_near_duplicates_shuffle_matches_broadcast():
    import ray.data
    from doc_ocr_ray.stages.dedup import minhash_dedup_pairs, drop_near_duplicates
    ds = _docs_with_dups()
    pairs = minhash_dedup_pairs(ds, threshold=0.6).materialize()
    bc = sorted(r["doc_id"] for r in
                drop_near_duplicates(ds, pairs,
                                     strategy="broadcast").take_all())
    sh = sorted(r["doc_id"] for r in
                drop_near_duplicates(ds, pairs,
                                     strategy="shuffle").take_all())
    assert bc == sh and len(bc) > 0
    # auto dispatch (round-3 verdict item 4): below the cutover picks
    # broadcast, a forced tiny cutover picks shuffle — both byte-equal
    au = sorted(r["doc_id"] for r in
                drop_near_duplicates(ds, pairs).take_all())
    au_sh = sorted(r["doc_id"] for r in
                   drop_near_duplicates(ds, pairs,
                                        broadcast_limit=0).take_all())
    assert au == bc and au_sh == bc


def test_whitespace_semantics_match_duckdb_on_dirty_text():
    """Engine tokenization/normalization vs the oracle SQL helpers on
    text with tabs, newlines, \\v and U+00A0 — the latent-divergence
    class flagged in review: DuckDB trim() strips only spaces and RE2
    \\s is the ASCII class [\\t\\n\\f\\r ], while Python's .strip() /
    unicode \\s cover more.  Both sides now use the explicit class."""
    import duckdb
    import pandas as pd
    from doc_ocr_ray.stages.text_analysis import (
        token_count_batch, fingerprint_batch, repetition_signals_batch)
    dirty = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["\tfoo bar\n", "a\vb a\vb", "x y x y z",
                 "  plain words here  "],
    })
    con = duckdb.connect()
    con.register("documents", dirty)
    strip = "regexp_replace(text, '^\\s+|\\s+$', '', 'g')"
    # token counts
    got = token_count_batch(dirty.copy())
    want = con.sql(f"""
        SELECT doc_id, CASE WHEN {strip} = '' THEN 0
               ELSE len(regexp_split_to_array({strip}, '\\s+')) END AS n
        FROM documents""").df()
    assert list(got["n_tokens"]) == list(want["n"])
    # fingerprints (md5 of normalized text)
    gf = fingerprint_batch(dirty.copy())
    wf = con.sql(f"""
        SELECT doc_id, md5(regexp_replace(lower({strip}),
                           '\\s+', ' ', 'g')) AS f FROM documents""").df()
    assert list(gf["fingerprint"]) == list(wf["f"])
    # repetition bigrams survive \v / nbsp "words"
    rep = repetition_signals_batch(dirty.copy()).set_index("doc_id")
    assert rep.loc[2, "top_bigram"] == "a\vb a\vb" or rep.loc[2, "n_words"] == 2
    assert rep.loc[3, "n_words"] == 3          # nbsp is NOT a separator


def test_dedup_keep_best_selects_canonical(ray_session):
    import ray.data
    from doc_ocr_ray.stages.dedup import dedup_keep_best
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 10],
        "text": ["a b c", "a b c d e", "a b", "lonely doc"],
    })
    clusters = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "cluster": [1, 1, 1],
    })
    out = dedup_keep_best(ray.data.from_pandas(docs),
                          ray.data.from_pandas(clusters)).take_all()
    got = {r["cluster"]: (r["doc_id"], r["n_tokens"]) for r in out}
    # doc 2 has the most tokens in cluster 1; doc 10 is a singleton
    assert got == {1: (2, 5), 10: (10, 2)}


def test_ppm_roundtrip_resize_and_real_decode_stage():
    from doc_ocr_ray.stages.multimodal import (
        encode_ppm, decode_ppm, resize_nearest, MediaDecodeStage,
        synthesize_ppm_media_table, FEATURE_DIM)
    img = (np.arange(2 * 3 * 3).reshape(2, 3, 3) % 256).astype(np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # comment + multi-whitespace header forms parse too
    hdr = b"P6\n# a comment\n 3\t2\n255\n" + img.tobytes()
    assert (decode_ppm(hdr) == img).all()
    # nearest resize: exact index mapping
    big = np.zeros((4, 4, 3), dtype=np.uint8)
    big[2:, :, :] = 200
    small = resize_nearest(big, 2, 2)
    assert small[0, 0, 0] == 0 and small[1, 0, 0] == 200
    # the REAL decode path (use_fake_decoder=False) works for PPM
    tbl = synthesize_ppm_media_table([7], width=8, height=8)
    stage = MediaDecodeStage(use_fake_decoder=False)
    out = stage(tbl)
    feat = out["feature"].to_pylist()[0]
    assert len(feat) == FEATURE_DIM and all(0 <= v <= 1 for v in feat)
    # closed form: pixel (0,0) of doc 7 = (0+0+37c+7)%256
    img7 = decode_ppm(tbl["payload"].to_pylist()[0])
    assert list(img7[0, 0]) == [7, 44, 81]
    # non-PPM payloads still raise the documented NotImplementedError
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        stage._decode_real(b"\x89PNG...", "image")


def test_png_all_five_filters_and_real_decode_stage():
    """decode_png must invert every scanline filter the spec allows,
    not just our encoder's filter-0: a reference-filtered stream
    (rows cycling None/Sub/Up/Average/Paeth) decodes back to the
    image; CRC corruption is detected; grayscale works; the real
    decode stage accepts PNG payloads."""
    import struct
    import zlib
    import pytest as _pytest
    from doc_ocr_ray.stages.multimodal import (
        encode_png, decode_png, _png_chunk, _PNG_SIG,
        MediaDecodeStage, synthesize_png_media_table, FEATURE_DIM)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 4, 3)).astype(np.uint8)
    assert (decode_png(encode_png(img)) == img).all()

    # reference-filter each row with its own filter type (PNG spec)
    h, w, nch = img.shape
    stride = w * nch
    flat = img.reshape(h, stride).astype(np.int64)
    raw = b""
    for y in range(h):
        ft = y % 5
        cur, prev = flat[y], (flat[y - 1] if y else np.zeros(stride,
                                                             np.int64))
        filt = np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            a = cur[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = (a if pa_ <= pb_ and pa_ <= pc_
                        else b if pb_ <= pc_ else c)
            filt[i] = (cur[i] - pred) & 255
        raw += bytes([ft]) + filt.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(raw))
               + _png_chunk(b"IEND", b""))
    assert (decode_png(payload) == img).all()

    gray = rng.randint(0, 256, size=(6, 7)).astype(np.uint8)
    assert (decode_png(encode_png(gray)) == gray).all()

    corrupt = bytearray(encode_png(img))
    corrupt[-5] ^= 0xFF                      # IEND CRC byte
    with _pytest.raises(ValueError):
        decode_png(bytes(corrupt))

    tbl = synthesize_png_media_table([7], width=8, height=8)
    stage = MediaDecodeStage(use_fake_decoder=False)
    feat = stage(tbl)["feature"].to_pylist()[0]
    assert len(feat) == FEATURE_DIM and all(0 <= v <= 1 for v in feat)

    # GRAYSCALE through the real stage: a 4x4 gray PNG makes the
    # resize an identity, so feature[i] == pixel[i]/255 exactly —
    # pins the channel-repeat axis in _decode_real's ndim==2 branch
    import pyarrow as pa
    gray4 = (np.arange(16).reshape(4, 4) * 16).astype(np.uint8)
    gtbl = pa.table({
        "media_ref": pa.array(["g:0"], pa.string()),
        "doc_id": pa.array(["0"], pa.string()),
        "media_type": pa.array(["image"], pa.string()),
        "payload": pa.array([encode_png(gray4)], pa.binary()),
        "payload_len": pa.array([len(encode_png(gray4))], pa.int64()),
    })
    gfeat = stage(gtbl)["feature"].to_pylist()[0]
    assert gfeat == [(i * 16) / 255.0 for i in range(16)]


def test_png_adam7_interlaced_decode():
    """Adam7 interlaced PNG decodes to the SAME pixels as the
    sequential render of the same image, across sizes where passes go
    empty (dims < 8), gray and RGB; truncating the pixel stream at any
    pass boundary raises; a bad interlace method raises; the oracle
    synthesizer's every-third-interlaced images roundtrip."""
    import struct
    import zlib
    import pytest as _pytest
    from doc_ocr_ray.stages.multimodal import (
        encode_png, decode_png, _png_chunk, _PNG_SIG,
        synthesize_png_media_table)
    rng = np.random.RandomState(11)
    for (h, w) in [(1, 1), (3, 3), (5, 7), (8, 8), (17, 33), (32, 32)]:
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert (decode_png(encode_png(img, interlace=True)) == img).all(), \
            (h, w)
        gray = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        assert (decode_png(encode_png(gray, interlace=True)) == gray).all()

    # adversarial: drop trailing bytes from the inflated pixel stream
    # (re-deflate a truncated stream behind valid CRCs) — must raise,
    # never return a silently-wrong image
    img = rng.randint(0, 256, size=(9, 9, 3)).astype(np.uint8)
    full = encode_png(img, interlace=True)
    # rebuild with truncated raw at several cut points
    raw_parts = []
    for x0, y0, xs, ys in [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                           (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                           (0, 1, 1, 2)]:
        sub = img[y0::ys, x0::xs]
        if sub.shape[0] and sub.shape[1]:
            raw_parts.extend(b"\x00" + sub[y].tobytes()
                             for y in range(sub.shape[0]))
    raw = b"".join(raw_parts)
    ihdr = struct.pack(">IIBBBBB", 9, 9, 8, 2, 0, 0, 1)
    for cut in (1, len(raw) // 2, len(raw) - 1):
        bad = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(raw[:cut]))
               + _png_chunk(b"IEND", b""))
        with _pytest.raises(ValueError):
            decode_png(bad)
    # extra trailing bytes must raise too (offset != len(raw))
    bad = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(raw + b"\x00"))
           + _png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError):
        decode_png(bad)
    # unknown interlace method
    ihdr_bad = struct.pack(">IIBBBBB", 9, 9, 8, 2, 0, 0, 2)
    bad = (_PNG_SIG + _png_chunk(b"IHDR", ihdr_bad)
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError):
        decode_png(bad)
    # implausible frame size fails fast (input cap)
    ihdr_huge = struct.pack(">IIBBBBB", 1 << 15, 1 << 15, 8, 2, 0, 0, 0)
    bad = (_PNG_SIG + _png_chunk(b"IHDR", ihdr_huge)
           + _png_chunk(b"IDAT", b"") + _png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError):
        decode_png(bad)

    # synthesizer: doc 0 and 3 interlaced, 1/2 sequential; all decode
    # to the same closed-form gradient
    tbl = synthesize_png_media_table([0, 1, 2, 3], width=16, height=16)
    x = np.arange(16)[None, :, None]
    y = np.arange(16)[:, None, None]
    c = np.arange(3)[None, None, :]
    for d, payload in zip([0, 1, 2, 3], tbl["payload"].to_pylist()):
        want = ((x + 2 * y + 37 * c + d) % 256).astype(np.uint8)
        got = decode_png(payload)
        assert (got == want).all()
        # wire format really differs: interlaced streams are Adam7
        ihdr_off = payload.index(b"IHDR") + 4
        assert payload[ihdr_off + 12] == (1 if d % 3 == 0 else 0)


def test_codec_property_roundtrips():
    """Hypothesis property tests over the from-scratch codecs: ANY
    byte string LZW-round-trips at any alphabet width; ANY image
    round-trips through sequential and Adam7 PNG and through the GIF
    container — shrinking finds boundary cases (width-schedule bumps,
    one-pixel passes) that fixed seeds can miss."""
    from hypothesis import given, settings, strategies as st
    from doc_ocr_ray.stages.gif import (_lzw_decode, _lzw_encode,
                                        decode_gif, encode_gif)
    from doc_ocr_ray.stages.multimodal import encode_png, decode_png

    @settings(max_examples=120, deadline=None)
    @given(st.integers(2, 8).flatmap(
        lambda mcs: st.tuples(
            st.just(mcs),
            st.binary(max_size=2000).map(
                lambda b: bytes(x % (1 << mcs) for x in b)))))
    def lzw_roundtrip(args):
        mcs, data = args
        assert _lzw_decode(mcs, _lzw_encode(mcs, data), len(data)) \
            == data
    lzw_roundtrip()

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**32 - 1))
    def png_roundtrip(h, w, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert (decode_png(encode_png(img)) == img).all()
        assert (decode_png(encode_png(img, interlace=True)) == img).all()
    png_roundtrip()

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**32 - 1),
           st.booleans())
    def gif_roundtrip(h, w, seed, interlace):
        rng = np.random.RandomState(seed)
        pal = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
        idx = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        fr = decode_gif(encode_gif(
            [{"indices": idx, "interlace": interlace}], pal))
        assert (fr[0] == pal[idx]).all()
    gif_roundtrip()


def test_gif_codec_roundtrip_and_compositing():
    """Built-in GIF codec: real LZW round-trips across width-boundary
    and dictionary-reset sizes, interlace inverts, multi-frame
    compositing honors transparency and disposal 2/3, local tables
    override the global one."""
    from doc_ocr_ray.stages.gif import (_lzw_decode, _lzw_encode,
                                        decode_gif, encode_gif)
    rng = np.random.RandomState(5)
    for size in (1, 2, 255, 256, 4097, 60000):
        for alphabet in (2, 7, 256):
            data = rng.randint(0, alphabet, size=size) \
                .astype(np.uint8).tobytes()
            mcs = max(2, (alphabet - 1).bit_length())
            assert _lzw_decode(mcs, _lzw_encode(mcs, data),
                               len(data)) == data, (size, alphabet)
    rep = b"abcabcabc" * 3000                 # deep dict + KwKwK
    assert _lzw_decode(8, _lzw_encode(8, rep), len(rep)) == rep

    pal = np.stack([(7 * np.arange(256)) % 256,
                    (5 * np.arange(256) + 11) % 256,
                    (3 * np.arange(256) + 23) % 256],
                   axis=1).astype(np.uint8)
    idx = rng.randint(0, 256, size=(17, 23)).astype(np.uint8)
    for interlace in (False, True):
        fr = decode_gif(encode_gif(
            [{"indices": idx, "interlace": interlace}], pal))
        assert fr.shape == (1, 17, 23, 3)
        assert (fr[0] == pal[idx]).all()

    # compositing: patch + transparency + local table
    idx0 = ((np.arange(32)[None, :] + 2 * np.arange(32)[:, None])
            % 256).astype(np.uint8)
    idx1 = ((np.arange(16)[None, :] + np.arange(16)[:, None])
            % 256).astype(np.uint8)
    lct = np.stack([(9 * np.arange(256) + 1) % 256,
                    (11 * np.arange(256) + 3) % 256,
                    (13 * np.arange(256) + 5) % 256],
                   axis=1).astype(np.uint8)
    fr = decode_gif(encode_gif(
        [{"indices": idx0, "disposal": 1},
         {"indices": idx1, "left": 8, "top": 8, "transparent": 9,
          "palette": lct}], pal))
    assert (fr[0] == pal[idx0]).all()
    want = pal[idx0].copy()
    patch = lct[idx1].copy()
    patch[idx1 == 9] = want[8:24, 8:24][idx1 == 9]
    want[8:24, 8:24] = patch
    assert (fr[1] == want).all()

    # disposal 2 (restore bg) and 3 (restore previous)
    g2 = encode_gif([{"indices": idx1, "disposal": 2},
                     {"indices": np.full((2, 2), 3, np.uint8),
                      "left": 30, "top": 30}],
                    pal, screen=(32, 32), bg_index=5)
    assert (decode_gif(g2)[1][0:16, 0:16] == pal[5]).all()
    g3 = encode_gif([{"indices": idx0},
                     {"indices": idx1, "disposal": 3},
                     {"indices": np.full((2, 2), 3, np.uint8),
                      "left": 30, "top": 30}], pal)
    fr3 = decode_gif(g3)
    assert (fr3[2][0:16, 0:16] == pal[idx0][0:16, 0:16]).all()


def test_gif_adversarial_inputs():
    """Parser-review rule: malformed GIF payloads raise, never return
    silently-wrong pixels — EVERY per-byte truncation raises, as do
    bad signatures, out-of-screen rects, out-of-table indices,
    unknown blocks, and implausible frame sizes."""
    import struct
    import pytest as _pytest
    from doc_ocr_ray.stages.gif import decode_gif, encode_gif
    from doc_ocr_ray.stages.multimodal import (
        MediaDecodeStage, synthesize_gif_media_table, FEATURE_DIM)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    idx0 = (np.arange(64, dtype=np.uint8).reshape(8, 8))
    full = encode_gif([{"indices": idx0, "disposal": 1},
                       {"indices": idx0[:4, :4], "left": 2, "top": 2,
                        "transparent": 1}], pal)
    assert (decode_gif(full)[0][0] == pal[idx0[0]]).all()

    def descriptors(payload):
        # structural walk (0x2C bytes also occur inside palettes and
        # LZW data, so find() would lie): returns image-descriptor
        # offsets
        packed = payload[10]
        pos = 13 + (3 * (2 << (packed & 7)) if packed & 0x80 else 0)
        out = []
        while payload[pos] != 0x3B:
            if payload[pos] == 0x21:            # extension
                pos += 2
                while payload[pos]:
                    pos += 1 + payload[pos]
                pos += 1
                continue
            assert payload[pos] == 0x2C
            out.append(pos)
            ip = payload[pos + 9]
            pos += 10
            if ip & 0x80:
                pos += 3 * (2 << (ip & 7))
            pos += 1                            # LZW min code size
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        return out

    for k in range(len(full)):
        with _pytest.raises(ValueError):
            decode_gif(full[:k])
    with _pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + full[6:])
    # image rect outside the logical screen
    bad = bytearray(full)
    off = descriptors(full)[0]
    struct.pack_into("<HH", bad, off + 1, 7, 7)     # left/top 7,7 + 8x8
    with _pytest.raises(ValueError):
        decode_gif(bytes(bad))
    # pixel index outside a small color table: the encoder refuses to
    # write it, and a hand-built stream (4-entry GCT, 3-bit LZW
    # emitting literal 5s) makes the DECODER refuse too
    small_pal = pal[:4]
    with _pytest.raises(ValueError):
        encode_gif([{"indices": np.full((2, 2), 5, np.uint8)}],
                   small_pal)
    from doc_ocr_ray.stages.gif import _lzw_encode, _sub_blocks
    crafted = (b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)
               + small_pal.tobytes()
               + b"\x2C" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
               + bytes([3]) + _sub_blocks(_lzw_encode(3, bytes([5] * 4)))
               + b"\x3B")
    with _pytest.raises(ValueError):
        decode_gif(crafted)
    # unknown block tag where an image/extension/trailer must sit
    pos = descriptors(full)[0]
    with _pytest.raises(ValueError):
        decode_gif(full[:pos] + b"\x7E" + full[pos + 1:])
    # implausible logical screen fails fast (input cap)
    huge = bytearray(full)
    struct.pack_into("<HH", huge, 6, 65535, 65535)
    with _pytest.raises(ValueError):
        decode_gif(bytes(huge))
    # CUMULATIVE output cap: a tiny stream of many one-pixel frames
    # over a large screen must fail fast, not amplify to n*w*h canvas
    # copies (review finding: per-frame cap alone misses this).
    # Patched cap so the test trips it without materializing 768 MB.
    import doc_ocr_ray.stages.gif as gifmod
    bomb = encode_gif(
        [{"indices": np.zeros((1, 1), np.uint8)}] * 17,
        pal[:4], screen=(128, 128))
    assert len(bomb) < 1024          # the whole attack stream is tiny
    old_cap = gifmod._MAX_PIXELS
    gifmod._MAX_PIXELS = 1 << 16
    try:
        with _pytest.raises(ValueError):
            decode_gif(bomb)
    finally:
        gifmod._MAX_PIXELS = old_cap
    assert decode_gif(bomb).shape == (17, 128, 128, 3)  # legal at real cap
    # undersized palettes are refused (N=1 would emit a corrupt file)
    with _pytest.raises(ValueError):
        encode_gif([{"indices": np.zeros((2, 2), np.uint8)}], pal[:1])
    with _pytest.raises(ValueError):
        encode_gif([{"indices": np.zeros((2, 2), np.uint8)}], pal[:2])

    # the synthesizer's wire-format variation really happens, and the
    # real decode stage accepts GIF payloads through the sniffer
    tbl = synthesize_gif_media_table([0, 1, 2, 3], width=32, height=32)
    for d, payload in zip([0, 1, 2, 3], tbl["payload"].to_pylist()):
        desc, desc2 = descriptors(payload)
        assert bool(payload[desc + 9] & 0x40) == (d % 3 == 0)  # interlace
        assert bool(payload[desc2 + 9] & 0x80) == (d % 2 == 1)  # LCT
    stage = MediaDecodeStage(use_fake_decoder=False)
    feat = stage(tbl)["feature"].to_pylist()[0]
    assert len(feat) == FEATURE_DIM and all(0 <= v <= 1 for v in feat)


def _jpeg_gradient(h=40, w=48, d=0):
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return (2 * x + 2 * y + 17 * c + d % 29).astype(np.uint8)


def test_jpeg_roundtrip_all_paths():
    """Built-in baseline JPEG codec (round-3 S2 closure): smooth
    gradients roundtrip within tight pixel tolerance across quality,
    4:2:0 subsampling, restart intervals, grayscale, odd/edge sizes;
    a gray frame DECLARING (2,2) sampling still decodes via the
    non-interleaved scan rule."""
    from doc_ocr_ray.stages.jpeg import encode_jpeg, decode_jpeg

    img = _jpeg_gradient()
    for q, sub, ri in [(95, False, 0), (85, True, 0), (90, False, 3),
                       (90, True, 2), (50, False, 0)]:
        dec = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub,
                                      restart_interval=ri))
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert dec.shape == img.shape and err <= 3, (q, sub, ri, err)

    gray = (np.add.outer(np.arange(24) * 3, np.arange(16) * 2)
            % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(gray, quality=90))
    assert dec.shape == gray.shape
    assert np.abs(dec.astype(int) - gray.astype(int)).max() <= 2

    # gray stream with (2,2) factors patched into SOF: T.81 A.2.2
    # says a single-component scan is non-interleaved single blocks
    enc = bytearray(encode_jpeg(gray, quality=90))
    i = enc.find(b"\xff\xc0")
    enc[i + 2 + 8 + 1] = 0x22
    dec = decode_jpeg(bytes(enc))
    assert np.abs(dec.astype(int) - gray.astype(int)).max() <= 2

    for shape in ((1, 1, 3), (8, 8, 3), (9, 8, 3), (17, 19, 3), (1, 1)):
        im = (np.indices(shape[:2]).sum(0) % 200 + 20).astype(np.uint8)
        if len(shape) == 3:
            im = np.stack([im] * 3, axis=2)
        dec = decode_jpeg(encode_jpeg(im, quality=90, subsample=True))
        assert dec.shape == im.shape
        assert np.abs(dec.astype(int) - im.astype(int)).max() <= 4


def test_jpeg_progressive_bit_identical_to_baseline():
    """Progressive (SOF2) decode: a progressive stream carries the
    SAME quantized coefficients as the baseline stream of the same
    image, so decode_jpeg of both must be BIT-IDENTICAL — this pins
    every G.2 path (interleaved DC first/refine, AC first with EOB
    runs, two rounds of AC refinement correction bits) against the
    independently-tested baseline decoder."""
    from doc_ocr_ray.stages.jpeg import (decode_jpeg, encode_jpeg,
                                         encode_jpeg_progressive)
    rng = np.random.default_rng(3)
    cases = [
        (_jpeg_gradient(), 85, False),
        (rng.integers(0, 256, (33, 31, 3), dtype=np.uint8), 90, False),
        (rng.integers(0, 256, (17, 19, 3), dtype=np.uint8), 75, True),
        ((np.add.outer(np.arange(24) * 3, np.arange(16) * 2)
          % 256).astype(np.uint8), 90, False),
        (rng.integers(0, 256, (8, 8, 3), dtype=np.uint8), 50, True),
    ]
    for img, q, sub in cases:
        base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q,
                                                   subsample=sub))
        assert (base == prog).all(), (img.shape, q, sub)

    # decode_image routes progressive too (no injected codec)
    from doc_ocr_ray.stages.multimodal import decode_image
    img = _jpeg_gradient()
    dec = decode_image(encode_jpeg_progressive(img, quality=90))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    # truncation sweep: every prefix either raises a controlled error
    # or (at a clean scan boundary) decodes a PARTIAL-precision image
    # whose shape is right — progressive's defining property
    enc = encode_jpeg_progressive(
        rng.integers(0, 256, (9, 12, 3), dtype=np.uint8))
    partial = 0
    for i in range(len(enc)):
        try:
            out = decode_jpeg(enc[:i])
            assert out.shape == (9, 12, 3)
            partial += 1
        except (ValueError, NotImplementedError):
            pass
    assert partial > 0          # early termination is a feature


def test_jpeg_adversarial_malformed_inputs():
    """Session-8 parser rule: malformed/truncated JPEG bytes raise
    CONTROLLED errors (ValueError / NotImplementedError), never
    index/struct crashes — every byte-prefix truncation included."""
    import pytest as _pytest
    import struct
    from doc_ocr_ray.stages.jpeg import encode_jpeg, decode_jpeg

    enc = encode_jpeg(_jpeg_gradient(16, 16), quality=90,
                      restart_interval=1)
    assert (decode_jpeg(enc) is not None)
    # every truncation up to the final entropy byte must raise; a
    # stream cut inside/before EOI alone still carries all MCUs and
    # decodes (deliberate lenience, like most codecs)
    for i in range(len(enc) - 2):
        with _pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(enc[:i])
    assert decode_jpeg(enc[:-2]) is not None

    with _pytest.raises(ValueError):             # not a JPEG
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with _pytest.raises(ValueError):             # SOS before SOF
        decode_jpeg(b"\xff\xd8\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00")
    # arithmetic coding (SOF9) -> NotImplementedError (codec seam);
    # bare SOF2 with no scan -> ValueError (progressive IS supported)
    sof9 = (b"\xff\xd8\xff\xc9"
            + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x01\x11\x00")
    with _pytest.raises(NotImplementedError):
        decode_jpeg(sof9)
    sof2 = (b"\xff\xd8\xff\xc2"
            + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x01\x11\x00")
    with _pytest.raises(ValueError):
        decode_jpeg(sof2)
    # zero dimension
    sof0 = (b"\xff\xd8\xff\xc0"
            + struct.pack(">HBHHB", 11, 8, 0, 8, 1) + b"\x01\x11\x00")
    with _pytest.raises(ValueError):
        decode_jpeg(sof0)
    # segment length overruns payload
    with _pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xdb\xff\xff\x00")
    # entropy garbage after valid headers: flip bits in the scan body
    bad = bytearray(enc)
    sos = bad.find(b"\xff\xda")
    for j in range(sos + 14, min(len(bad) - 2, sos + 40)):
        bad[j] ^= 0xA5
    try:
        decode_jpeg(bytes(bad))                  # may decode garbage
    except (ValueError, NotImplementedError):
        pass                                     # or fail cleanly


def test_jpeg_decode_image_routing_and_dhash_e2e(ray_session):
    """decode_image now routes JPEG magic to the built-in decoder (no
    injected codec); arithmetic-coded streams fall to the seam; the
    perceptual dHash pair pipeline finds a re-encoded (quality 60)
    JPEG near-dup end-to-end over real JPEG bytes."""
    import struct
    import pyarrow as pa
    import pytest as _pytest
    import ray
    from doc_ocr_ray.stages.jpeg import encode_jpeg
    from doc_ocr_ray.stages.multimodal import (decode_image,
                                               media_dhash_pairs)

    img = _jpeg_gradient()
    dec = decode_image(encode_jpeg(img, quality=90))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    # arithmetic-coded (SOF9) still routes to the injected-codec seam
    sof9 = (b"\xff\xd8\xff\xc9"
            + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x01\x11\x00")
    with _pytest.raises(NotImplementedError):
        decode_image(sof9)                       # no codec injected
    marker = np.zeros((4, 4, 3), dtype=np.uint8)
    assert (decode_image(sof9, codec=lambda p: marker) == marker).all()

    # e2e: same picture at q95 and q60 = near-dup; distinct picture out
    rng = np.random.default_rng(5)
    pic = (rng.integers(0, 64, (32, 32, 3)).cumsum(axis=1) % 256
           ).astype(np.uint8)
    other = (rng.integers(0, 64, (32, 32, 3)).cumsum(axis=0) % 256
             ).astype(np.uint8)
    payloads = [encode_jpeg(pic, quality=95),
                encode_jpeg(pic, quality=60, subsample=True),
                encode_jpeg(other, quality=95)]
    tbl = pa.table({
        "media_ref": pa.array([f"jpg:{i}" for i in range(3)]),
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "media_type": pa.array(["image"] * 3),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
    })
    pairs = media_dhash_pairs(ray.data.from_arrow(tbl).repartition(2),
                              max_hamming=6).take_all()
    got = {(p["doc_a"], p["doc_b"]) for p in pairs}
    assert (0, 1) in got and (0, 2) not in got and (1, 2) not in got


def test_jpeg_image_stats_gate(ray_session):
    """The multimodal_jpeg oracle contract: every synthesized image
    (quality/subsample/restart varied by doc id) decodes with exact
    dims and max pixel error <= 2."""
    import ray
    from doc_ocr_ray.stages.multimodal import (
        synthesize_jpeg_media_table, jpeg_image_stats)
    out = (jpeg_image_stats(ray.data.from_arrow(
        synthesize_jpeg_media_table(list(range(12)))))
        .to_pandas())
    assert len(out) == 12
    assert (out["width"] == 48).all() and (out["height"] == 40).all()
    assert (out["err_le_tol"] == 1).all()


def test_y4m_roundtrip_fingerprint_and_vfp_pairs(ray_session):
    """Real video path (round-3 stretch item): y4m roundtrips across
    chroma modes (planes JUMPED by computed length), the temporal
    energy-contour fingerprint absorbs a sum-invariant pan (v1) and a
    sub-contour bump (v2), and the pair pipeline reports exactly the
    within-group near-dups over real decoded frames."""
    import ray
    from doc_ocr_ray.stages.multimodal import (
        encode_y4m, decode_y4m, decode_video, video_fingerprint64,
        synthesize_video_table, media_vfp_pairs)

    rng = np.random.RandomState(4)
    frames = rng.randint(0, 256, size=(7, 6, 9)).astype(np.uint8)
    for ch in ("mono", "420", "444"):
        assert (decode_y4m(encode_y4m(frames, chroma=ch))
                == frames).all()

    tbl = synthesize_video_table(range(12))
    fps = [video_fingerprint64(decode_y4m(p))
           for p in tbl["payload"].to_pylist()]
    for g in range(4):
        assert fps[3 * g] == fps[3 * g + 1] == fps[3 * g + 2]

    pairs = media_vfp_pairs(
        ray.data.from_arrow(tbl).repartition(3)).take_all()
    got = {(p["doc_a"], p["doc_b"]) for p in pairs}
    want = {(3 * g + i, 3 * g + j)
            for g in range(4) for i in range(3) for j in range(i + 1, 3)}
    assert got == want
    assert all(p["hamming"] == 0 for p in pairs)


def test_y4m_adversarial_malformed_inputs():
    """Session-8 parser rule for the y4m decoder: truncations and
    malformed headers raise controlled errors; a prefix ending on an
    exact frame boundary is a VALID shorter clip (y4m has no trailer);
    unknown chroma goes to the injected-codec seam."""
    import pytest as _pytest
    from doc_ocr_ray.stages.multimodal import (encode_y4m, decode_y4m,
                                               decode_video)
    frames = (np.arange(3 * 4 * 5).reshape(3, 4, 5) % 256
              ).astype(np.uint8)
    enc = encode_y4m(frames, chroma="420")
    head_end = enc.index(b"\n") + 1
    frame_len = 6 + 4 * 5 + (4 * 5) // 2       # FRAME\n + luma + c
    for i in range(len(enc)):
        if i >= head_end and (i - head_end) % frame_len == 0 and i > head_end:
            assert len(decode_y4m(enc[:i])) == (i - head_end) // frame_len
        else:
            with _pytest.raises((ValueError, NotImplementedError)):
                decode_y4m(enc[:i])
    with _pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W0 H4 Cmono\nFRAME\n")
    with _pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H4 Cmono\nGARBAGE")
    with _pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W2 H2 C410\nFRAME\n" + b"\x00" * 4)
    marker = np.zeros((2, 2, 2), np.uint8)
    assert (decode_video(b"YUV4MPEG2 W2 H2 C410\nFRAME\n" + b"\x00" * 4,
                         codec=lambda p: marker) == marker).all()
    with _pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00 ftypmp42")


def test_wav_roundtrip_and_stats(ray_session):
    import ray.data
    from doc_ocr_ray.stages.multimodal import (
        encode_wav, decode_wav, synthesize_wav_media_table,
        wav_audio_stats)
    s = (np.arange(-5, 5) * 1000).astype(np.int16)
    d, rate = decode_wav(encode_wav(s, sample_rate=8000))
    assert (d == s).all() and rate == 8000
    # odd-sized chunk padding: extra chunk before data still parses
    import struct
    raw = encode_wav(s)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"   # padded chunk
    patched = raw[:12] + extra + raw[12:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8) + patched[8:]
    d2, _ = decode_wav(patched)
    assert (d2 == s).all()
    # stats over the closed-form testbed
    tbl = synthesize_wav_media_table([0], n_samples=4)
    out = wav_audio_stats(ray.data.from_arrow(tbl)).take_all()
    # doc 0: samples i*3 %65536 -32768 = [-32768, -32765, -32762, -32759]
    r = out[0]
    assert r["n_samples"] == 4 and r["peak"] == 32768
    import math
    expect = math.floor(10000 * math.sqrt(
        (32768**2 + 32765**2 + 32762**2 + 32759**2) / 4)) / 10000
    assert r["rms"] == expect


def test_wav_rejects_nonstandard_and_truncated():
    import io
    import wave as wavelib
    from doc_ocr_ray.stages.multimodal import encode_wav, decode_wav
    # 8-bit PCM must raise, not silently mis-decode as int16
    buf = io.BytesIO()
    with wavelib.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes(range(16)))
    with pytest.raises(ValueError):
        decode_wav(buf.getvalue())
    # truncated data chunk must raise, not decode short
    raw = encode_wav((np.arange(10) * 100).astype(np.int16))
    with pytest.raises(ValueError):
        decode_wav(raw[:-10])
    # stereo must raise
    buf2 = io.BytesIO()
    with wavelib.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(bytes(16))
    with pytest.raises(ValueError):
        decode_wav(buf2.getvalue())


def test_curate_training_set_funnel(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.curate import curate_training_set
    # 50 DISTINCT words: repeated-word text collapses to few distinct
    # shingles and left the near-dup pair within ~3% of the 0.6
    # threshold (seed-fragile); diverse words give a ~0.9 margin
    base = " ".join(f"w{i}" for i in range(50)) + " "
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            base + "alpha beta gamma",
            base + "alpha beta gamma",      # exact dup of 1 -> dropped
            base + "alpha beta delta",      # near-dup of 1 -> clustered
            "too short",                    # fails the token floor
        ],
    })
    out = curate_training_set(ray.data.from_pandas(docs),
                              min_tokens=40).take_all()
    ids = sorted(r["doc_id"] for r in out)
    # 2 gone (exact dup), 4 gone (short); 1 vs 3 near-dup cluster keeps
    # ONE survivor (equal tokens -> min doc_id = 1)
    assert ids == [1]
    assert out[0]["split"] in ("train", "val", "test")
    assert 0 <= out[0]["bucket"] < 10000


def test_stratified_sample_deterministic_and_rate_bounded(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.curate import stratified_sample
    docs = pd.DataFrame({
        "doc_id": np.arange(2000, dtype="int64"),
        "lang": ["en", "zh", "fr", "en"] * 500,
    })
    ds = ray.data.from_pandas(docs)
    rates = {"en": 0.5, "zh": 1.0}
    a = sorted(r["doc_id"] for r in
               stratified_sample(ds, rates, group_col="lang").take_all())
    b = sorted(r["doc_id"] for r in
               stratified_sample(ds, rates, group_col="lang").take_all())
    assert a == b                       # pure function of (seed, key)
    out = pd.DataFrame(
        stratified_sample(ds, rates, group_col="lang").take_all())
    by_lang = out.groupby("lang").size()
    assert by_lang.get("zh", 0) == 500           # rate 1.0 keeps all
    assert "fr" not in by_lang.index             # default_rate 0 drops
    assert 350 < by_lang["en"] < 650             # ~0.5 of 1000
    # incremental-ingestion stability: sampling a superset never
    # changes membership of previously seen keys
    more = pd.concat([docs, pd.DataFrame(
        {"doc_id": np.arange(2000, 2500, dtype="int64"),
         "lang": ["en"] * 500})], ignore_index=True)
    sup = set(r["doc_id"] for r in stratified_sample(
        ray.data.from_pandas(more), rates, group_col="lang").take_all())
    assert set(a) == {i for i in sup if i < 2000}


def test_per_source_cap_keeps_cap_and_is_seed_stable(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.curate import per_source_cap
    docs = pd.DataFrame({
        "doc_id": np.arange(300, dtype="int64"),
        "source": ["big.example"] * 200 + ["mid.example"] * 90
                  + ["tiny.example"] * 10,
    })
    ds = ray.data.from_pandas(docs)
    out = pd.DataFrame(per_source_cap(ds, cap=25).take_all())
    sizes = out.groupby("source").size()
    assert sizes["big.example"] == 25            # capped
    assert sizes["mid.example"] == 25            # capped
    assert sizes["tiny.example"] == 10           # under cap -> all kept
    assert out["src_rank"].max() <= 25 and out["src_rank"].min() == 1
    # survivors are a deterministic function of (seed, doc_id): re-run
    # keeps the same representatives
    again = pd.DataFrame(per_source_cap(ds, cap=25).take_all())
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])
    # not simply "first 25 by doc_id" — the rank is pseudo-random
    big = out[out["source"] == "big.example"]["doc_id"]
    assert sorted(big) != list(range(25))


def test_export_shards_balanced_positions_contiguous(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.curate import export_shards
    docs = pd.DataFrame({"doc_id": np.arange(1600, dtype="int64")})
    out = pd.DataFrame(
        export_shards(ray.data.from_pandas(docs), n_shards=8).take_all())
    assert len(out) == 1600
    sizes = out.groupby("shard").size()
    assert len(sizes) == 8
    # md5 buckets spread ~uniformly: every shard within 2x of fair share
    assert sizes.min() > 100 and sizes.max() < 400
    # positions are 0..len-1 within each shard (contiguous, no gaps)
    for _, g in out.groupby("shard"):
        assert sorted(g["shard_pos"]) == list(range(len(g)))
    # pseudo-random interleave: consecutive doc_ids land on many shards
    first16 = out[out["doc_id"] < 16]
    assert first16["shard"].nunique() >= 4


def test_dup_ngram_frac_known_values():
    from doc_ocr_ray.stages.text_analysis import dup_ngram_frac_batch
    b = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["a b a b a",        # bigrams all dup; trigrams 2/3
                 "x y z",            # no repeats
                 "one two",          # < 3 tokens -> dropped
                 "",                 # empty -> dropped
                 "r r r r"],         # every gram identical
    })
    out = dup_ngram_frac_batch(b).set_index("doc_id")
    assert sorted(out.index) == [1, 2, 5]
    assert out.loc[1, "dup_bigram_frac"] == 1.0
    assert out.loc[1, "dup_trigram_frac"] == 0.6666   # floor grid
    assert out.loc[2, "dup_bigram_frac"] == 0.0
    assert out.loc[2, "dup_trigram_frac"] == 0.0
    assert out.loc[5, "dup_bigram_frac"] == 1.0
    assert out.loc[5, "dup_trigram_frac"] == 1.0
    # all-short batch returns a typed empty frame, not a crash
    empty = dup_ngram_frac_batch(pd.DataFrame(
        {"doc_id": [9], "text": ["just two"]}))
    assert len(empty) == 0


def test_decontaminate_flags_and_drops(ray_session):
    import ray.data
    from doc_ocr_ray.stages.decontam import (build_benchmark_ngrams,
                                             decontaminate, text_ngrams)
    bench_texts = ["What is the capital of France Paris obviously said"]
    bench = build_benchmark_ngrams(bench_texts, n=8)
    assert len(bench) == 2                     # 9 tokens -> 2 windows
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            # exact 8-gram overlap, different case + extra whitespace
            "intro  WHAT IS THE CAPITAL OF FRANCE PARIS obviously tail",
            # only a 7-gram shared -> clean at n=8
            "what is the capital of france paris nothing more",
            "totally unrelated text about something else entirely ok",
            None,
        ],
    })
    ds = ray.data.from_pandas(docs)
    out = pd.DataFrame(decontaminate(ds, bench, n=8).take_all()
                       ).set_index("doc_id").sort_index()
    assert list(out["contaminated"]) == [True, False, False, False]
    assert out.loc[1, "n_hits"] >= 1
    kept = decontaminate(ds, bench, n=8, drop=True).take_all()
    assert sorted(r["doc_id"] for r in kept) == [2, 3, 4]
    # n-gram helper: windows are word-aligned on normalized text
    assert text_ngrams("A  b\tc d", 2) == {"a b", "b c", "c d"}


def test_pack_sequences_contiguous_intervals(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.curate import pack_sequences
    docs = pd.DataFrame({
        "doc_id": np.arange(200, dtype="int64"),
        # varied lengths incl. zero (must drop) and > target (spans
        # multiple sequences)
        "n_tokens": ([7, 13, 0, 40, 3] * 40),
    })
    out = pd.DataFrame(pack_sequences(
        ray.data.from_pandas(docs), target_tokens=16,
        num_partitions=8).take_all()).sort_values("doc_id")
    assert (out["n_tokens"] > 0).all()          # zero-token docs drop
    assert len(out) == 160
    # intervals tile the concatenated stream exactly: each start is
    # the previous start + previous length, beginning at 0
    starts = out["start_tok"].to_numpy()
    lens = out["n_tokens"].to_numpy()
    assert starts[0] == 0
    assert (starts[1:] == starts[:-1] + lens[:-1]).all()
    # sequence ids match the interval arithmetic
    assert (out["seq_first"] == starts // 16).all()
    assert (out["seq_last"] == (starts + lens - 1) // 16).all()
    # a 40-token doc at target 16 must span >= 3 sequences
    big = out[out["n_tokens"] == 40]
    assert ((big["seq_last"] - big["seq_first"]) >= 2).all()
    # empty input short-circuits
    empty = pack_sequences(ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1], "n_tokens": [0]})), 16)
    assert empty.count() == 0


def test_quality_classifier_actor_pool_scoring(ray_session):
    import ray.data
    from doc_ocr_ray.stages.text_analysis import (
        QualityClassifierStage, quality_classify, CLASSIFIER_BIAS)
    # kernel: known integer logits
    st = QualityClassifierStage()
    out = st(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the cat is here",          # -150+120+80+4*4 = 66
                 "click click click",        # -150-1200+12 = -1338
                 None],                      # bias only
    }))
    assert list(out["logit_milli"]) == [66, -1338, CLASSIFIER_BIAS]
    assert list(out["keep"]) == [True, False, False]
    # actor-pool path end to end, custom weights + threshold
    docs = pd.DataFrame({
        "doc_id": np.arange(100, dtype="int64"),
        "text": ["good the and of text here"] * 50
                + ["spam click subscribe buy"] * 50,
    })
    scored = pd.DataFrame(quality_classify(
        ray.data.from_pandas(docs), threshold=100,
        concurrency=(1, 2), batch_size=32).take_all())
    assert len(scored) == 100
    good = scored[scored["doc_id"] < 50]
    spam = scored[scored["doc_id"] >= 50]
    assert good["logit_milli"].nunique() == 1        # deterministic
    assert (good["logit_milli"] > spam["logit_milli"].max()).all()
    assert good["keep"].all() and not spam["keep"].any()


def test_select_top_quality_histogram_quantile(ray_session):
    """Threshold == k-th largest score; everything at or above it is
    kept (ties included), nothing below survives."""
    import math
    import ray.data
    from doc_ocr_ray.stages.text_analysis import (select_top_quality,
                                                  _stopword_score)
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    out = select_top_quality(
        ray.data.from_pandas(docs).repartition(5), frac=0.25).to_pandas()
    scores = _stopword_score(docs)["score"].sort_values(ascending=False)
    k = math.ceil(0.25 * len(docs))
    thr = int(scores.iloc[k - 1])
    want = set(docs.loc[_stopword_score(docs)["score"] >= thr, "doc_id"])
    assert set(out["doc_id"]) == want
    assert len(out) >= k                      # ties only ever add rows
    assert (out["score"] >= thr).all()


def test_mix_plan_integer_epochs(ray_session):
    """Epoch counts are exact ceil-division; zero-weight sources get 0
    epochs; epochs * n_tokens always covers the source target."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import mix_plan
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype="int64"),
        "source": ["a"] * 30 + ["b"] * 20 + ["c"] * 10,
        "text": ["one two three four five"] * 60,     # 5 tokens each
    })
    out = mix_plan(ray.data.from_pandas(docs).repartition(4),
                   weights={"a": 500, "b": 0}, budget_tokens=1000)
    df = out.to_pandas().set_index("source")
    assert df.loc["a", "n_tokens"] == 150 and df.loc["a", "n_docs"] == 30
    # target 1000*500//1000 = 500; epochs = ceil(500/150) = 4
    assert df.loc["a", "target_tokens"] == 500
    assert df.loc["a", "epochs"] == 4
    assert df.loc["a", "epochs"] * df.loc["a", "n_tokens"] >= 500
    assert df.loc["b", "epochs"] == 0 and df.loc["b", "target_tokens"] == 0
    assert df.loc["c", "weight_milli"] == 0 and df.loc["c", "epochs"] == 0


def test_lm_score_nul_character_stays_in_doc(ray_session):
    """A literal U+0000 inside a document is an ordinary character:
    bigrams after it must stay attributed to the SAME doc (the batch
    joiner identifies sentinels by position, not by char value).
    Expected values from an independent dict-based bigram count."""
    import math
    from collections import Counter
    import ray.data
    from doc_ocr_ray.stages.text_analysis import lm_score
    texts = {0: "xy\x00zz!", 1: "zz", 2: ""}
    allbg = Counter(t[i:i + 2] for t in texts.values()
                    for i in range(len(t) - 1))
    cmax = max(allbg.values())
    expect = {}
    for d, t in texts.items():
        bgs = [t[i:i + 2] for i in range(len(t) - 1)]
        expect[d] = math.floor(1000 * sum(allbg[b] for b in bgs)
                               / (max(len(bgs), 1) * cmax))
    docs = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = (lm_score(ray.data.from_pandas(docs).repartition(2))
           .to_pandas().set_index("doc_id"))
    assert out["lm_milli"].to_dict() == expect
    assert expect[0] != expect[1]      # sensitive to mis-attribution


def test_dsir_weights_nan_text_scores_zero(ray_session):
    """A float-NaN text cell (pandas block) is treated as empty text,
    not a crash: n_tokens 0, dsir_weight 0."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import dsir_weights
    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": [np.nan, "foo foo"],
        "lang": ["en", "en"],
    })
    out = (dsir_weights(ray.data.from_pandas(docs))
           .to_pandas().set_index("doc_id"))
    assert out.loc[0, "n_tokens"] == 0 and out.loc[0, "dsir_weight"] == 0
    assert out.loc[1, "n_tokens"] == 2


def test_quantiles_by_source_null_source_is_own_group(ray_session):
    """NULL source forms its own group (SQL GROUP BY semantics) and
    stays distinct from the empty-string source."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import quantiles_by_source
    docs = pd.DataFrame({
        "doc_id": range(5),
        "source": [None, None, "", "a", "a"],
        "text": ["w w w", "w", "w w", "w", "w w w w"],
    })
    out = quantiles_by_source(
        ray.data.from_pandas(docs).repartition(3)).to_pandas()
    by_key = {(None if pd.isna(s) else s): r
              for s, r in out.set_index("source").iterrows()}
    assert set(by_key) == {None, "", "a"}
    assert by_key[None]["n_docs"] == 2 and by_key[None]["p500"] == 1
    assert by_key[""]["n_docs"] == 1 and by_key[""]["p500"] == 2
    assert by_key["a"]["n_docs"] == 2 and by_key["a"]["p500"] == 1


def test_heavy_hitters_exact_topk_with_tiebreak(ray_session):
    """Two-phase heavy hitters reproduce the exact global top-k with
    the (cnt DESC, token ASC) tie-break, independent of batching; a
    tiny capacity still finds hitters that dominate within batches."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import heavy_hitters
    # b and c tie at 5 -> b before c; d (4) beats e (2); Zz lowers to zz
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["a a a b b c", "a b C c\tb", "a a d d Zz",
                 "c c d d b e", None, "a zz e  a"],
    })
    out = heavy_hitters(ray.data.from_pandas(docs).repartition(3),
                        k=4, capacity=8)
    got = list(zip(out["rank"], out["token"], out["cnt"]))
    assert got == [(1, "a", 8), (2, "b", 5), (3, "c", 5), (4, "d", 4)]
    # empty corpus -> typed empty frame, no crash
    empty = heavy_hitters(ray.data.from_pandas(
        pd.DataFrame({"doc_id": [0], "text": [None]})), k=3)
    assert len(empty) == 0 and list(empty.columns) == ["rank", "token", "cnt"]


def test_inverted_index_df_cap_and_order(ray_session):
    """Posting lists are ascending, capped, comma-joined; df counts
    documents (not occurrences); tokens under min_df are dropped;
    results are batching-independent."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import inverted_index
    docs = pd.DataFrame({
        "doc_id": [5, 3, 9, 1],
        "text": ["a a b", "a c", "a b", "a x"],
    })
    out = (inverted_index(ray.data.from_pandas(docs).repartition(3),
                          min_df=2, max_postings=3)
           .to_pandas().set_index("token").sort_index())
    assert list(out.index) == ["a", "b"]          # c, x are hapax
    assert out.loc["a", "df"] == 4                # docs, not the 5 occurrences
    assert out.loc["a", "postings"] == "1,3,5"    # ascending, capped at 3
    assert out.loc["b", "df"] == 2
    assert out.loc["b", "postings"] == "5,9"     # b lives in docs 5 and 9


def test_bm25_search_matches_plain_reference(ray_session):
    """bm25_search equals an independent per-doc plain-Python BM25
    (math.log, row loops) on the same integer micro grid, including
    the (score DESC, doc_id ASC) tie-break and the top-k cut."""
    import math
    import ray.data
    from doc_ocr_ray.stages.text_analysis import bm25_search
    texts = ["hash join hash", "window scan", "hash", "join join window",
             "scan scan scan", "", None, "hash hash hash hash join"]
    docs = pd.DataFrame({"doc_id": list(range(8)), "text": texts})
    terms, k1, b = ["hash", "join"], 1.2, 0.75

    toks = [(t or "").split() for t in texts]
    n_docs, total_dl = len(texts), sum(len(t) for t in toks)
    avgdl = total_dl / n_docs
    expect = {}
    for term in terms:
        df = sum(1 for t in toks if term in t)
        idf = math.log(((n_docs - df) + 0.5) / (df + 0.5) + 1.0)
        for i, t in enumerate(toks):
            tf = t.count(term)
            if tf:
                s = idf * ((tf * (k1 + 1.0))
                           / (tf + k1 * ((1.0 - b) + b * (len(t) / avgdl))))
                expect[i] = expect.get(i, 0) + math.floor(1_000_000.0 * s)
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:3]

    out = bm25_search(ray.data.from_pandas(docs).repartition(3),
                      terms, k=3, k1=k1, b=b)
    assert list(out.columns) == ["rank", "doc_id", "score_micro"]
    assert [(int(r.doc_id), int(r.score_micro))
            for r in out.itertuples()] == ranked
    assert list(out["rank"]) == [1, 2, 3]

    # no matching term -> empty with stable schema
    miss = bm25_search(ray.data.from_pandas(docs), ["zzz"], k=3)
    assert len(miss) == 0
    assert list(miss.columns) == ["rank", "doc_id", "score_micro"]


def test_chunk_documents_windows_and_overlap(ray_session):
    """Chunks start at stride multiples below the token count, overlap
    by chunk-stride, tail chunks are short, empty/None docs vanish."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import chunk_documents
    toks10 = " ".join(f"t{i}" for i in range(10))
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [toks10, "a b", "", None],
    })
    out = (chunk_documents(ray.data.from_pandas(docs).repartition(2),
                           chunk_tokens=4, stride=3)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    d1 = out[out["doc_id"] == 1]
    # starts 0,3,6,9 -> 4 chunks; last is the 1-token tail
    assert list(d1["chunk_id"]) == [0, 1, 2, 3]
    assert list(d1["n_tokens"]) == [4, 4, 4, 1]
    assert d1.iloc[0]["chunk"] == "t0 t1 t2 t3"
    assert d1.iloc[1]["chunk"] == "t3 t4 t5 t6"     # 1-token overlap
    assert d1.iloc[3]["chunk"] == "t9"
    d2 = out[out["doc_id"] == 2]
    assert len(d2) == 1 and d2.iloc[0]["chunk"] == "a b"
    assert set(out["doc_id"]) == {1, 2}             # empty/None dropped


def test_url_canonicalize_dedup_and_domain_filter(ray_session):
    """Canonicalization collapses scheme/www/case/query/slash variants;
    url_dedup keeps the min-doc_id survivor per canonical URL;
    filter_blocked_domains drops exactly the blocklisted domains and
    tolerates NULL urls (empty canon/domain, kept unless blocked)."""
    import ray.data
    from doc_ocr_ray.stages.urls import (
        canonicalize_urls, url_dedup, filter_blocked_domains)
    urls = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "url": [
            "https://www.Example.com/A/?utm_source=x",
            "http://example.com/a",                  # same page as 1
            "example.com/a/#frag",                   # scheme-less, same
            "https://other.org/a",                   # different host
            "https://blocked.net/deep/path?q=1",
            None,
        ]})
    c = canonicalize_urls(urls.copy())
    assert list(c["canon_url"]) == [
        "example.com/a", "example.com/a", "example.com/a",
        "other.org/a", "blocked.net/deep/path", ""]
    assert list(c["domain"]) == [
        "example.com", "example.com", "example.com",
        "other.org", "blocked.net", ""]
    ds = ray.data.from_pandas(urls).repartition(3)
    survivors = (url_dedup(ds).to_pandas()
                 .sort_values("doc_id").reset_index(drop=True))
    assert list(survivors["doc_id"]) == [1, 4, 5, 6]
    kept = filter_blocked_domains(ds, {"blocked.net"}).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 2, 3, 4, 6]


def test_dedup_against_corpus_semantics(ray_session):
    """Corpus matches drop (normalization-insensitive), intra-snapshot
    duplicates keep the min doc_id, fresh docs survive, and an empty
    corpus degrades to plain exact self-dedup."""
    import ray.data
    from doc_ocr_ray.stages.dedup import dedup_against_corpus
    corpus = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["Hello   World", "kept corpus doc"]}))
    new = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [10, 11, 12, 13, 14],
        "text": ["  hello\tworld ",        # corpus dup via normalize
                 "same new", "same new",   # intra-snapshot dup pair
                 "fresh one",
                 None],                    # NULL -> "" (no corpus "")
    })).repartition(2)
    out = (dedup_against_corpus(new, corpus).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [11, 13, 14]
    assert list(out["text"]) == ["same new", "fresh one", ""]
    # empty corpus: behaves as exact self-dedup of the snapshot
    empty = ray.data.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype="object")}))
    out2 = dedup_against_corpus(new, empty).to_pandas()
    assert sorted(out2["doc_id"]) == [10, 11, 13, 14]


def test_interleaved_token_cost_and_pack(ray_session):
    """Media spans cost the fixed patch budget, text spans their
    whitespace token count; per-doc partials combine across batches;
    composition with pack_sequences cuts multimodal sequences."""
    import ray.data
    from doc_ocr_ray.pipelines.curate import (interleaved_token_cost,
                                              pack_sequences)
    flat = pd.DataFrame({
        "doc_id": [1, 1, 1, 2, 2, 3],
        "kind": ["text", "image", "text", "text", "image", "image"],
        "text": ["two tokens", None, " three  more here ", "", None,
                 None],
        "media_ref": [None, "img:a", "", None, "img:b", "img:c"],
    })
    cost = (interleaved_token_cost(
        ray.data.from_pandas(flat).repartition(3), image_tokens=10)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(cost["doc_id"]) == [1, 2, 3]
    assert list(cost["n_text_tokens"]) == [5, 0, 0]
    assert list(cost["n_media"]) == [1, 1, 1]
    assert list(cost["n_tokens"]) == [15, 10, 10]
    packed = (pack_sequences(
        ray.data.from_pandas(cost[["doc_id", "n_tokens"]]),
        target_tokens=16)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(packed["start_tok"]) == [0, 15, 25]
    assert list(packed["seq_first"]) == [0, 0, 1]
    assert list(packed["seq_last"]) == [0, 1, 2]


def test_hopping_window_coverage_and_sums(ray_session):
    """Each event lands in exactly size/hop windows covering its ts;
    window sums equal the brute-force per-window recount."""
    import ray.data
    from doc_ocr_ray.pipelines.events import hopping_window
    ts = pd.to_datetime([
        "2026-01-01 00:05:00", "2026-01-01 00:35:00",
        "2026-01-01 01:59:59", "2026-01-01 02:00:00"])
    ev = pd.DataFrame({"event_type": ["a", "a", "a", "b"],
                       "ts": ts, "value": [1.0, 2.0, 4.0, 8.0]})
    out = (hopping_window(ray.data.from_pandas(ev).repartition(2),
                          size_minutes=60, hop_minutes=30)
           .to_pandas())
    # brute force: windows are [start, start+60min), start on the
    # 30-min grid
    import numpy as np
    epochs = (ts.astype("int64") // 10**9).to_numpy()
    expect = {}
    for t, e, v in zip(ev["event_type"], epochs, ev["value"]):
        slot = e // 1800 * 1800
        for k in range(2):
            key = (t, slot - k * 1800)
            n, s = expect.get(key, (0, 0))
            expect[key] = (n + 1, s + int(np.floor(v * 100 + 0.5)))
    got = {(r.event_type, r.window_start): (r.n, int(round(r.sum_value * 100)))
           for r in out.itertuples()}
    assert got == expect
    assert (out.groupby("event_type")["n"].sum()
            == ev.groupby("event_type").size() * 2).all()


def test_pagerank_matches_integer_reference(ray_session):
    """Distributed PageRank equals a single-process replay of the same
    integer-grid recurrence; a sink hub out-ranks spoke nodes; nodes
    outside the edge set keep the base mass."""
    import ray.data
    from doc_ocr_ray.stages.graph import pagerank
    # star: 0..4 -> 5 (hub), hub -> 0; node 6 isolated; a self-loop
    # and a duplicate edge that must be cleaned
    edges = pd.DataFrame({
        "src": [0, 1, 2, 3, 4, 5, 2, 2, 6],
        "dst": [5, 5, 5, 5, 5, 0, 5, 2, 6]})   # dup (2,5), loops (2,2),(6,6)
    nodes = pd.DataFrame({"node": list(range(7))})
    out = (pagerank(ray.data.from_pandas(edges).repartition(2),
                    ray.data.from_pandas(nodes).repartition(2),
                    iters=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    # single-process integer replay
    n, scale, d = 7, 10 ** 12, 85
    adj = {0: [5], 1: [5], 2: [5], 3: [5], 4: [5], 5: [0]}
    base = (scale * (100 - d) // 100) // n
    r = {v: scale // n for v in range(n)}
    for _ in range(3):
        infl = {v: 0 for v in range(n)}
        for s, ds_ in adj.items():
            for t in ds_:
                infl[t] += r[s] // len(ds_)
        r = {v: base + (d * infl[v]) // 100 for v in range(n)}
    assert dict(zip(out["node"], out["rank_scaled"])) == r
    assert r[5] > r[0] > r[1]          # hub > fed spoke > dry spoke
    assert r[6] == base                # isolated node: base mass only


def test_pagerank_hits_ignore_dangling_edge_sources(ray_session):
    """Round-4 review regression: an edge whose src is NOT in the
    node table must contribute nothing in ANY round — including the
    analytic round 1 (the fused engines once granted uniform mass to
    every edge source).  Same contract for HITS, where a dangling
    endpoint must also stay out of the L1 totals."""
    import ray.data
    from doc_ocr_ray.stages.graph import hits, pagerank
    edges = pd.DataFrame({"src": [99, 1], "dst": [1, 2]})
    nodes = pd.DataFrame({"node": [1, 2]})
    out = (pagerank(ray.data.from_pandas(edges),
                    ray.data.from_pandas(nodes), iters=1)
           .to_pandas().sort_values("node").reset_index(drop=True))
    scale, d, n = 10 ** 12, 85, 2
    base = (scale * (100 - d) // 100) // n
    assert list(out["node"]) == [1, 2]
    assert out["rank_scaled"][0] == base            # 99's mass ignored
    assert out["rank_scaled"][1] == base + (d * (scale // n)) // 100

    # HITS: edge 99->1 (src dangling) and 1->2 both present; only
    # 1->2 may move mass, and totals must renormalize over it alone
    h = (hits(ray.data.from_pandas(edges),
              ray.data.from_pandas(nodes), iters=1)
         .to_pandas().sort_values("node").reset_index(drop=True))
    s = 10 ** 9
    # A1: only node 2 receives (from hub(1)); L1 total = that sum
    # -> auth = [0, s]; H1: hub(1) = auth(2) pushed back -> [s, 0]
    assert list(h["node"]) == [1, 2]
    assert list(h["auth_scaled"]) == [0, s]
    assert list(h["hub_scaled"]) == [s, 0]


def test_hits_matches_integer_reference(ray_session):
    """Distributed HITS equals a single-process replay of the same
    L1-normalized integer recurrence; the page everyone points AT is
    the authority, the page pointing at everything is the hub."""
    import ray.data
    from doc_ocr_ray.stages.graph import hits
    # 0,1,2 -> 9 (authority); 3 -> {9, 0, 1} (hub); node 6 isolated;
    # dup edge + self-loop must be cleaned
    edges = pd.DataFrame({
        "src": [0, 1, 2, 3, 3, 3, 3, 6],
        "dst": [9, 9, 9, 9, 0, 1, 9, 6]})      # dup (3,9), loop (6,6)
    nodes = pd.DataFrame({"node": [0, 1, 2, 3, 6, 9]})
    out = (hits(ray.data.from_pandas(edges).repartition(2),
                ray.data.from_pandas(nodes).repartition(2), iters=2)
           .to_pandas().sort_values("node").reset_index(drop=True))

    # single-process integer replay of the same recurrence
    scale = 10 ** 9
    vs = [0, 1, 2, 3, 6, 9]
    es = {(0, 9), (1, 9), (2, 9), (3, 9), (3, 0), (3, 1)}
    h = {v: scale // len(vs) for v in vs}
    a = {}
    for _ in range(2):
        raw = {v: sum(h[u] for (u, w) in es if w == v) for v in vs}
        t = sum(raw.values())
        a = {v: (scale * raw[v]) // t if t else 0 for v in vs}
        raw = {v: sum(a[w] for (u, w) in es if u == v) for v in vs}
        t = sum(raw.values())
        h = {v: (scale * raw[v]) // t if t else 0 for v in vs}
    got_a = dict(zip(out["node"], out["auth_scaled"]))
    got_h = dict(zip(out["node"], out["hub_scaled"]))
    assert got_a == a and got_h == h
    assert a[9] == max(a.values()) and a[9] > 10 * a[2]   # authority
    assert h[3] == max(h.values()) and h[3] > h[0]        # hub
    assert a[6] == 0 and h[6] == 0                        # isolated

    # zero-edge graph: all scores 0, no division blow-up
    out0 = (hits(ray.data.from_pandas(
                pd.DataFrame({"src": [1], "dst": [1]})),  # only a loop
                ray.data.from_pandas(pd.DataFrame({"node": [1, 2]})),
                iters=1).to_pandas())
    assert sorted(out0["auth_scaled"]) == [0, 0]
    assert sorted(out0["hub_scaled"]) == [0, 0]


def test_zscore_by_group_exact_grid(ray_session):
    """Group stats are exact integers; z matches the closed form on
    the micro grid; zero-variance and singleton groups define z=0."""
    import math
    import ray.data
    from doc_ocr_ray.stages.text_analysis import zscore_by_group
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "source": ["a", "a", "a", "b", "b", "c"],
        "text": ["one", "one two", "one two three four five six",
                 "x y", "x y", "solo doc here"],
    })
    out = (zscore_by_group(ray.data.from_pandas(docs).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # source a: x = [1, 2, 6]; n=3, s1=9, s2=41 -> den = 3*41-81 = 42
    for x, doc in ((1, 0), (2, 1), (6, 2)):
        expect = math.floor(1000000.0 * (3 * x - 9) / math.sqrt(42.0))
        assert out.loc[doc, "z_micro"] == expect
    assert (out.loc[out["source"] == "b", "z_micro"] == 0).all()
    assert out.loc[5, "z_micro"] == 0


def test_bpe_train_learns_expected_merges(ray_session):
    """Merges follow exact weighted pair counts with the (cnt DESC,
    left, right) tie-break; later rounds count pairs over MERGED
    symbols; back-to-back pair runs merge fully (two-pass replace)."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import bpe_train
    # "abab" x3 and "ab" x2: pair (a,b) has count 3*2+2 = 8,
    # (b,a) count 3; round 1 must merge (a,b) -> "ab"; round 2 pairs
    # over merged symbols: ("ab","ab") count 3 wins
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["abab abab abab ab", "ab zzzz"],
    })
    out = (bpe_train(ray.data.from_pandas(docs).repartition(2),
                     merges=3).to_pandas())
    r1, r2, r3 = out.iloc[0], out.iloc[1], out.iloc[2]
    assert (r1["left_sym"], r1["right_sym"], r1["cnt"]) == ("a", "b", 8)
    assert (r2["left_sym"], r2["right_sym"], r2["merged"],
            r2["cnt"]) == ("ab", "ab", "abab", 3)
    # round 3: remaining pairs: z-z run "zzzz" = 3 overlapping (z,z)
    assert (r3["left_sym"], r3["right_sym"], r3["cnt"]) == ("z", "z", 3)


def test_gopher_filter_every_rule_both_polarities():
    from doc_ocr_ray.stages.text_analysis import gopher_filter_batch

    base = ("the cat and a dog of the barn is in town to see more "
            "words here now then when such fine long table chairs")
    docs = pd.DataFrame({"doc_id": list(range(1, 8)), "text": [
        base,                                    # passes everything
        "a b",                                   # wc + mean-word-len < 3
        base + " ##### " + "..." * 6,            # symbol ratio >= 0.1
        "\n".join(["- b"] * 19 + [base]),        # 95% bullet lines
        "\n".join(["wait..."] * 2 + [base]),     # 2/3 ellipsis lines
        "1 2 3 4 5 6 7 8 9 10 11 12",            # alpha frac 0 < 80%
        "zz yy xx ww vv uu tt ss rr qq",         # 0 stopwords
    ]})
    out = gopher_filter_batch(docs, min_words=10)
    by = out.set_index("doc_id")
    assert by.loc[1, "keep"] == 1
    assert by.loc[2, "wc_ok"] == 0 and by.loc[2, "mwl_ok"] == 0
    assert by.loc[3, "sym_ok"] == 0 and by.loc[3, "wc_ok"] == 1
    assert by.loc[4, "bullet_ok"] == 0
    assert by.loc[5, "ellipsis_ok"] == 0
    assert by.loc[6, "alpha_ok"] == 0 and by.loc[6, "stop_ok"] == 0
    assert by.loc[7, "stop_ok"] == 0 and by.loc[7, "alpha_ok"] == 1
    assert (by.loc[2:, "keep"] == 0).all()


def test_c4_filter_line_rules_and_clean_text():
    from doc_ocr_ray.stages.text_analysis import c4_filter_batch

    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [
        # 3 kept lines (>=5 words + terminal punct), 2 dropped
        "This line has five good words.\nshort line.\n"
        "no terminal punctuation at all\n"
        "  Another fine sentence right here!  \n"
        'A third quoted sentence ends here."',
        # blocked: lorem ipsum (case-insensitive)
        "Good sentence one is right here.\nGood sentence two is here "
        "too.\nGood sentence three is also here.\nLorem Ipsum dolor",
        # blocked: code brace
        "Good sentence one is right here.\nGood sentence two is here "
        "too.\nGood sentence three is also here.\nfn() {",
        # too few kept lines
        "Only one proper sentence lives here.",
    ]})
    out = c4_filter_batch(docs).set_index("doc_id")
    assert out.loc[1, "n_kept_lines"] == 3 and out.loc[1, "keep"] == 1
    assert out.loc[1, "clean_text"] == (
        "This line has five good words.\n"
        "Another fine sentence right here!\n"
        'A third quoted sentence ends here."')
    assert out.loc[2, "has_lorem"] == 1 and out.loc[2, "keep"] == 0
    assert out.loc[3, "has_brace"] == 1 and out.loc[3, "keep"] == 0
    assert out.loc[4, "n_kept_lines"] == 1 and out.loc[4, "keep"] == 0


def test_ccnet_buckets_tertiles_and_ties(ray_session):
    import ray.data
    from doc_ocr_ray.stages.text_analysis import ccnet_buckets

    # 9 docs, one source: bigram frequencies give strictly ordered
    # scores for repeated-char docs ("aa..." shares one hot bigram)
    docs = pd.DataFrame({
        "doc_id": list(range(1, 10)),
        "source": ["s"] * 9,
        # score ~ frequency of the doc's bigrams: 'aaaa' docs use the
        # corpus-dominant bigram -> high; mixed docs -> lower
        "text": ["aaaaaaaa", "aaaaaaab", "aaaaabbb",
                 "aabbbbbb", "abababab", "bbbbbbbb",
                 "bcbcbcbc", "cdcdcdcd", "xyzw"],
    })
    out = ccnet_buckets(
        ray.data.from_pandas(docs)).to_pandas().set_index("doc_id")
    assert set(out["bucket"]) == {"head", "middle", "tail"}
    # exactly thirds of 9 = 3/3/3 unless score ties straddle a rank
    counts = out["bucket"].value_counts()
    assert counts["head"] >= 3 and counts["tail"] <= 3
    # ordering respected: every head score >= every middle score >=
    # every tail score
    h = out.loc[out["bucket"] == "head", "lm_milli"]
    m = out.loc[out["bucket"] == "middle", "lm_milli"]
    t = out.loc[out["bucket"] == "tail", "lm_milli"]
    assert m.empty or (h.min() >= m.max() and m.min() >= t.max())
    # two-source independence: a tiny second source gets its own
    # thresholds (single doc -> head by the n=1 rank rule)
    docs2 = pd.concat([docs, pd.DataFrame({
        "doc_id": [100], "source": ["z"], "text": ["qq"]})],
        ignore_index=True)
    out2 = ccnet_buckets(
        ray.data.from_pandas(docs2)).to_pandas().set_index("doc_id")
    assert out2.loc[100, "bucket"] == "head"


def test_minhash_against_corpus_drop_rules(ray_session):
    import ray.data
    from doc_ocr_ray.stages.dedup import minhash_against_corpus

    base = ("the quick brown fox jumps over the lazy dog while the "
            "rain in spain falls mainly on the plain tonight")
    corpus = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1], "text": [base]}))
    new = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": [
            base + " extra",            # near-dups corpus -> drops
            base + " extra",            # near-dups corpus AND #10;
                                        # drops either way
            base + " extra word",       # near-dups #10/#11 (smaller
                                        # new ids) -> drops even though
                                        # its blockers also dropped
            "completely different content about database query "
            "engines and distributed shuffles with columnar arrow",
        ]}))
    out = minhash_against_corpus(new, corpus,
                                 threshold=0.6).to_pandas()
    assert sorted(out["doc_id"]) == [13]

    # doc_id namespaces may overlap across sides: same id, different
    # text must NOT self-block
    corpus2 = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [10],
        "text": ["unrelated corpus text entirely about astronomy "
                 "telescopes nebulae and the speed of light"]}))
    out2 = minhash_against_corpus(new, corpus2,
                                  threshold=0.6).to_pandas()
    # 10 survives (different text, id collision is fine); 11 drops
    # against smaller new id 10; 12 drops against 10/11; 13 survives
    assert sorted(out2["doc_id"]) == [10, 13]


def test_phrase_blocklist_counts_and_case():
    from doc_ocr_ray.stages.text_analysis import phrase_blocklist_batch

    b = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
        "CLICK HERE now, then Lorem Ipsum and click here again",
        "perfectly clean document",
        None,
    ]})
    out = phrase_blocklist_batch(b).set_index("doc_id")
    assert out.loc[1, "n_hits"] == 3 and out.loc[1, "keep"] == 0
    assert out.loc[2, "n_hits"] == 0 and out.loc[2, "keep"] == 1
    assert out.loc[3, "n_hits"] == 0 and out.loc[3, "keep"] == 1


def test_char_entropy_known_values_and_nul():
    import math
    from doc_ocr_ray.stages.text_analysis import char_entropy_batch

    b = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [
        "aaaaaaaa",          # zero entropy
        "abcd",              # uniform: ln(4) on the micro grid
        "",                  # empty: 0 by definition
        "a\x00b",            # doc-internal NUL must count as a char
    ]})
    out = char_entropy_batch(b).set_index("doc_id")
    assert out.loc[1, "ent_micro"] == 0
    assert out.loc[2, "ent_micro"] == math.floor(1e6 * math.log(4))
    assert out.loc[3, "ent_micro"] == 0 and out.loc[3, "n_chars"] == 0
    # 3 distinct chars incl. the NUL: uniform ln(3)
    assert out.loc[4, "n_chars"] == 3
    assert out.loc[4, "ent_micro"] == math.floor(1e6 * math.log(3))
    # gibberish scores above repetitive text
    g = char_entropy_batch(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["xK9#qZ!mW2@vN8&rT4$", "the the the the the the"]}))
    assert g.loc[0, "ent_micro"] > g.loc[1, "ent_micro"]


def test_media_context_stats_caption_rules(ray_session):
    import ray.data
    from doc_ocr_ray.stages.multimodal import media_context_stats

    flat = pd.DataFrame({
        "doc_id": ["a"] * 6 + ["b"] * 2,
        "kind":  ["image", "text", "image", "image", "text", "image",
                  "text", "image"],
        "text":  ["", "a caption here", "", "", "", "",
                  "bee caption", ""],
        "media_ref": ["m0", "", "m1", "m2", "", "m3", "", "m4"],
        "offset": [0, 1, 2, 3, 4, 5, 0, 1],
    })
    out = (media_context_stats(ray.data.from_pandas(flat))
           .to_pandas().set_index("doc_id"))
    # doc a: m0 orphan (doc start), m1 captioned by "a caption here",
    # m2 orphan (previous is media), m3 orphan (previous text empty)
    assert out.loc["a", "n_spans"] == 6
    assert out.loc["a", "n_media"] == 4
    assert out.loc["a", "n_captioned"] == 1
    assert out.loc["a", "context_chars"] == len("a caption here")
    # doc b: m4 captioned
    assert out.loc["b", "n_captioned"] == 1
    assert out.loc["b", "context_chars"] == len("bee caption")


def test_revenue_by_nation_same_nation_rule(ray_session):
    import pyarrow as pa
    import ray.data
    from doc_ocr_ray.pipelines.relational import revenue_by_nation

    region = pa.table({"r_regionkey": [0, 1],
                       "r_name": ["ASIA", "EUROPE"]})
    nation = pa.table({"n_nationkey": [0, 1, 2],
                       "n_name": ["CHINA", "JAPAN", "FRANCE"],
                       "n_regionkey": [0, 0, 1]})
    supplier = pa.table({"s_suppkey": [100, 101, 102],
                         "s_nationkey": [0, 1, 2]})
    customer = ray.data.from_pandas(pd.DataFrame({
        "c_custkey": [1, 2, 3],
        "c_nationkey": [0, 1, 2]}))     # cust 3 is FRANCE: outside ASIA
    orders = ray.data.from_pandas(pd.DataFrame({
        "o_orderkey": [10, 11, 12],
        "o_custkey": [1, 2, 3]}))
    lineitem = ray.data.from_pandas(pd.DataFrame({
        "l_orderkey":      [10,   10,   11,   12],
        "l_suppkey":       [100,  101,  101,  102],
        "l_extendedprice": [100.0, 50.0, 80.0, 999.0],
        "l_discount":      [0.1,   0.0,  0.25, 0.0]}))
    out = revenue_by_nation(lineitem, orders, customer, supplier,
                            nation, region, region="ASIA",
                            num_partitions=2).to_pandas()
    got = dict(zip(out["n_name"], out["revenue"]))
    # order 10 (CHINA cust): item via supplier 100 (CHINA) counts
    # 100*0.9 = 90; item via supplier 101 (JAPAN) mismatches -> out.
    # order 11 (JAPAN cust): supplier 101 (JAPAN) counts 80*0.75 = 60.
    # order 12: FRANCE cust filtered by region.
    assert got == {"CHINA": 90.0, "JAPAN": 60.0}


def test_script_profile_classes_and_nul():
    from doc_ocr_ray.stages.text_analysis import script_profile_batch

    b = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
        "ab1 中文!", "a\x00b", None]})
    out = script_profile_batch(b).set_index("doc_id")
    assert out.loc[1].tolist() == [7, 2, 1, 2, 1, 1]
    # NUL is a real char, counted as other
    assert out.loc[2, "n_chars"] == 3 and out.loc[2, "n_other"] == 1
    assert out.loc[3, "n_chars"] == 0
    # class partition is exhaustive: columns sum to n_chars
    s = out[["n_latin", "n_digit", "n_cjk", "n_ws", "n_other"]].sum(axis=1)
    assert (s == out["n_chars"]).all()


def test_dup_line_signals_within_doc_only():
    from doc_ocr_ray.stages.text_analysis import dup_line_signals_batch

    b = pd.DataFrame({"doc_id": [1, 2], "text": [
        "same line\nother\n same line \n\n\nsame line",
        "same line\nno dups here",     # cross-doc repeats don't count
    ]})
    out = dup_line_signals_batch(b).set_index("doc_id")
    # edge-stripped " same line " matches; empties never count
    assert out.loc[1, "n_lines"] == 6
    assert out.loc[1, "n_dup_lines"] == 2
    assert out.loc[1, "dup_line_chars"] == 2 * len("same line")
    assert out.loc[2, "n_dup_lines"] == 0


def test_minhash_against_corpus_presigned_equivalence(ray_session):
    import ray.data
    from doc_ocr_ray.stages.dedup import (minhash_against_corpus,
                                          minhash_signatures)

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "in spain falls mainly on the plain again tonight folks")
    corpus = pd.DataFrame({"doc_id": [1, 2],
                           "text": [base, "something else entirely "
                                    "about columnar shuffles"]})
    new = pd.DataFrame({"doc_id": [10, 11],
                        "text": [base + " x",
                                 "fresh unrelated content on actor "
                                 "pools and object store spilling"]})
    plain = minhash_against_corpus(
        ray.data.from_pandas(new), ray.data.from_pandas(corpus),
        threshold=0.6).to_pandas().sort_values("doc_id")
    signed = minhash_signatures(ray.data.from_pandas(corpus))
    pre = minhash_against_corpus(
        ray.data.from_pandas(new), signed, threshold=0.6,
        corpus_presigned=True).to_pandas().sort_values("doc_id")
    assert plain["doc_id"].tolist() == pre["doc_id"].tolist() == [11]


def test_realize_mix_plan_epochs_and_fraction(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.curate import realize_mix_plan, _md5_bucket

    docs = pd.DataFrame({
        "doc_id": list(range(8)),
        "source": ["a"] * 4 + ["b"] * 4,
        "text": ["one two three four five"] * 8})   # 5 tokens each
    # source a: 20 tokens, weight 500 -> target 50 -> 2.5 epochs
    # source b: weight 0 -> excluded entirely
    out = realize_mix_plan(
        ray.data.from_pandas(docs), weights={"a": 500, "b": 0},
        budget_tokens=100).to_pandas()
    assert set(out["source"]) == {"a"}
    per_doc = out.groupby("doc_id").size()
    # every a-doc appears 2 or 3 times; md5 grid decides the extras
    assert set(per_doc) <= {2, 3}
    expected_extra = {d: int(_md5_bucket(pd.Series([d]), 42,
                                         mod=1000)[0] < 500)
                      for d in range(4)}
    for d in range(4):
        assert per_doc[d] == 2 + expected_extra[d]
    # repeat_idx is dense 0..reps-1
    for d, g in out.groupby("doc_id"):
        assert sorted(g["repeat_idx"]) == list(range(len(g)))


def test_minhash_presigned_param_mismatch_fails_fast(ray_session):
    import pytest
    import ray.data
    from doc_ocr_ray.stages.dedup import (minhash_against_corpus,
                                          minhash_signatures)

    corpus = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1], "text": ["some corpus text right here"]}))
    new = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [10], "text": ["anything"]}))
    signed128 = minhash_signatures(corpus, num_perm=128)
    with pytest.raises(Exception, match="num_perm"):
        minhash_against_corpus(new, signed128, num_perm=64,
                               corpus_presigned=True).to_pandas()
    signed_k3 = minhash_signatures(corpus, shingle_k=3)
    with pytest.raises(Exception, match="shingle_k"):
        minhash_against_corpus(new, signed_k3, shingle_k=5,
                               corpus_presigned=True).to_pandas()


def test_curate_quality_funnel_every_stage_fires(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.curate import curate_quality_funnel

    good = ("the cat and a dog of the barn is in town to see more "
            "words here now then when such fine long table chairs.\n"
            "Second proper sentence with enough good words here.\n"
            "Third proper sentence with enough fine words too.")
    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5], "text": [
        good,                                    # survives all stages
        "a b",                                   # gopher: too short
        good + "\nOnly two proper sentences survive here sir."
        + "\nzz" * 0 + "\nlorem ipsum",          # c4: lorem blocklisted
        good + "\nPlease click here to continue reading now.",
        # entropy floor: gopher+c4-passing doc whose kept lines are
        # low-diversity enough to score under a high floor
        good,
    ]})
    out = curate_quality_funnel(
        ray.data.from_pandas(docs),
        min_words=10).to_pandas().set_index("doc_id")
    assert 1 in out.index and 5 in out.index
    assert 2 not in out.index          # gopher cut
    assert 3 not in out.index          # c4 lorem cut
    assert 4 not in out.index          # blocklist cut on rebuilt text
    # entropy floor fires when raised above natural text entropy
    strict = curate_quality_funnel(
        ray.data.from_pandas(docs), min_words=10,
        min_ent_micro=10_000_000).to_pandas()
    assert len(strict) == 0
    # gibberish scores BELOW normal text on the same floor: a doc of
    # repeated shouting passes gopher/c4 but fails a mid floor
    shout = pd.DataFrame({"doc_id": [9], "text": [
        "the aaaa aaaa of aaaa aaaa and aaaa aaaa to aaaa aaaa aaaa.\n"
        "the aaaa aaaa of aaaa aaaa and aaaa aaaa to aaaa aaaa aaaa!\n"
        "the aaaa aaaa of aaaa aaaa and aaaa aaaa to aaaa aaaa aaaa?"]})
    mid = curate_quality_funnel(ray.data.from_pandas(shout),
                                min_words=10,
                                min_ent_micro=2_000_000).to_pandas()
    assert len(mid) == 0               # ent(aaaa-text) < 2.0
    loose = curate_quality_funnel(ray.data.from_pandas(shout),
                                  min_words=10).to_pandas()
    assert len(loose) == 1             # but above the default floor


def test_snapshot_diff_statuses(ray_session):
    import ray.data
    from doc_ocr_ray.stages.dedup import snapshot_diff

    old = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["same", "will change", "gone", "  Same   WS  "]}))
    new = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 4, 5],
        "text": ["same", "did change", "same ws", "brand new"]}))
    out = (snapshot_diff(old, new).to_pandas()
           .set_index("doc_id")["status"])
    assert out.to_dict() == {2: "changed", 3: "removed", 5: "added"}
    # doc 1 unchanged (dropped); doc 4 unchanged after normalization
    # (edge strip + lowercase + whitespace collapse)


def test_corpus_report_rollup_and_extrema(ray_session):
    import ray.data
    from doc_ocr_ray.stages.text_analysis import corpus_report

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "source": ["a", "a", "b", "b"],
        "text": ["one two three", "one", "   ", None]})
    out = (corpus_report(ray.data.from_pandas(docs)).to_pandas()
           .set_index("source"))
    assert out.loc["a"].tolist() == [2, 4, 16, 0, 1, 3]
    # b: whitespace-only and NULL both count as empty, 0 tokens
    assert out.loc["b", "n_empty"] == 2
    assert out.loc["b", "n_tokens"] == 0
    assert out.loc["ALL", "n_docs"] == 4
    assert out.loc["ALL", "min_tokens"] == 0
    assert out.loc["ALL", "max_tokens"] == 3
    # NULL sources are their own labeled group, not silently dropped
    docs2 = pd.DataFrame({
        "doc_id": [1, 2],
        "source": ["a", None],
        "text": ["one two", "three"]})
    out2 = (corpus_report(ray.data.from_pandas(docs2)).to_pandas()
            .set_index("source"))
    assert out2.loc["(null)", "n_docs"] == 1
    assert out2.loc["ALL", "n_docs"] == 2
    assert out2.loc["ALL", "n_tokens"] == 3


def test_verify_pairs_edit_milli_grid(ray_session):
    import ray.data
    from doc_ocr_ray.stages.dedup import verify_pairs_edit, _levenshtein

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the quick brown fox jumps",
                 "the quick brown fox jump",     # dist 1 of 25 bytes
                 "completely different thing"]}))
    pairs = ray.data.from_pandas(pd.DataFrame({
        "doc_a": [1, 1], "doc_b": [2, 3]}))
    out = (verify_pairs_edit(docs, pairs, max_dist_milli=200)
           .to_pandas().set_index("doc_b"))
    assert list(out.index) == [2]
    assert out.loc[2, "dist"] == 1
    assert out.loc[2, "dist_milli"] == 1000 // 25
    # byte-level parity with DuckDB on multibyte text
    import duckdb
    for a, b in [("中文字符", "中字符号"), ("naïve", "naive")]:
        want = duckdb.sql(
            f"SELECT levenshtein('{a}', '{b}')").df().iloc[0, 0]
        assert _levenshtein(a, b) == want


def test_bpe_apply_counts_after_merges(ray_session):
    import ray.data
    from doc_ocr_ray.stages.text_analysis import bpe_apply

    merges = pd.DataFrame({
        "rank": [1, 2], "left_sym": ["e", "er"],
        "right_sym": ["r", "s"], "merged": ["er", "ers"],
        "cnt": [9, 9]})
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["hers verse", "", "xy"]}))
    out = bpe_apply(docs, merges).to_pandas().set_index("doc_id")
    # hers: h e r s -> h er s -> h ers (2); verse: v e r s e ->
    # v er s e -> v ers e (3)
    assert out.loc[1, "n_symbols"] == 2 + 3
    assert out.loc[2, "n_symbols"] == 0
    assert out.loc[3, "n_symbols"] == 2


def test_normalize_unicode_nfc_and_nfkc():
    from doc_ocr_ray.stages.text_analysis import normalize_unicode_batch

    b = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["café", "ﬁn", "plain", None]})
    nfc = normalize_unicode_batch(b)
    assert nfc["norm_text"].tolist() == ["café", "ﬁn",
                                         "plain", ""]
    assert nfc["changed"].tolist() == [1, 0, 0, 0]
    # NFKC additionally folds compatibility forms (no SQL twin)
    nfkc = normalize_unicode_batch(b, form="NFKC")
    assert nfkc["norm_text"].tolist() == ["café", "fin",
                                          "plain", ""]
    assert nfkc["changed"].tolist() == [1, 1, 0, 0]


def test_shuffle_positions_exact_permutation(ray_session):
    import hashlib
    import ray.data
    from doc_ocr_ray.pipelines.curate import shuffle_positions

    docs = pd.DataFrame({"doc_id": list(range(500))})
    out = (shuffle_positions(ray.data.from_pandas(docs), seed=7)
           .to_pandas().sort_values("position").reset_index(drop=True))
    # exact permutation of 0..n-1
    assert sorted(out["position"]) == list(range(500))
    # order matches the single-process md5 rank (cross-bucket offsets
    # are correct, not just within-bucket order)
    want = sorted(range(500),
                  key=lambda d: (hashlib.md5(f"7:{d}".encode())
                                 .hexdigest(), d))
    assert out["doc_id"].tolist() == want
    # pure function of (seed, key): a second run is identical
    again = (shuffle_positions(ray.data.from_pandas(docs), seed=7)
             .to_pandas().sort_values("position").reset_index(drop=True))
    assert again["doc_id"].tolist() == want


def test_table_stats_counts_nulls_distincts(ray_session):
    import ray.data
    from doc_ocr_ray.stages.catalog import table_stats

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a", "a", None, "b"],
        "lang": ["zh", "zh", "zh", "zh"]})
    out = (table_stats(ray.data.from_pandas(df),
                       columns=["doc_id", "text", "lang"])
           .to_pandas().set_index("col_name"))
    assert out.loc["doc_id"].tolist() == [4, 0, 4]
    assert out.loc["text"].tolist() == [4, 1, 2]   # null excluded
    assert out.loc["lang"].tolist() == [4, 0, 1]


def test_interleave_positions_round_robin(ray_session):
    import hashlib
    import ray.data
    from doc_ocr_ray.pipelines.curate import interleave_positions

    # skewed sources: a=6 docs, b=2, NULL=1 -> b and (null) exhaust
    docs = pd.DataFrame({
        "doc_id": list(range(9)),
        "source": ["a"] * 6 + ["b"] * 2 + [None]})
    out = (interleave_positions(ray.data.from_pandas(docs), seed=3)
           .to_pandas().sort_values("position").reset_index(drop=True))
    assert sorted(out["position"]) == list(range(9))
    # single-process replay of the contract: (pos_in_source, source)
    srcs = {d: ("a" if d < 6 else "b" if d < 8 else "(null)")
            for d in range(9)}
    pos = {}
    for s in ("(null)", "a", "b"):
        members = sorted((d for d in range(9) if srcs[d] == s),
                         key=lambda d: (hashlib.md5(f"3:{d}".encode())
                                        .hexdigest(), d))
        for p, d in enumerate(members):
            pos[d] = p
    want = sorted(range(9), key=lambda d: (pos[d], srcs[d]))
    assert out["doc_id"].tolist() == want
    # round-robin property: first |sources| rows are one per source
    assert set(out.loc[:2, "source"]) == {"a", "b", "(null)"}


def test_trailing_window_range_semantics(ray_session):
    import ray.data
    from doc_ocr_ray.stages.sketch import trailing_window_sum

    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 10:30",
        "2024-01-01 10:30",                       # peer of the above
        "2024-01-01 11:15",                       # 10:00 falls out
        "2024-01-02 09:00",                       # fresh frame
        "2024-01-01 10:45"])                      # other user
    ev = pd.DataFrame({
        "user_id": [5, 5, 5, 5, 5, 6],
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": ts,
        "value": [1.00, 2.00, 4.00, 8.00, 16.00, 32.00]})
    out = (trailing_window_sum(ray.data.from_pandas(ev),
                               window_minutes=60)
           .to_pandas().set_index("event_id").sort_index())
    # peers at 10:30 share one frame (both see 1+2+4)
    assert out.loc[2, "trailing_cents"] == 700
    assert out.loc[3, "trailing_cents"] == 700
    # at 11:15 the 10:00 row is outside [10:15, 11:15]
    assert out.loc[4, "trailing_cents"] == 1400
    assert out.loc[1, "trailing_cents"] == 100
    assert out.loc[5, "trailing_cents"] == 1600   # next day: alone
    assert out.loc[6, "trailing_cents"] == 3200   # user isolation


def test_weighted_sample_min_of_w_and_bias(ray_session):
    import hashlib
    import ray.data
    from doc_ocr_ray.pipelines.curate import weighted_sample_n

    docs = pd.DataFrame({"doc_id": list(range(400))})
    out = (weighted_sample_n(ray.data.from_pandas(docs), n=80, seed=42)
           .to_pandas())
    # single-process replay: rank == min of w hashes
    def rank(d):
        w = 1 + d % 4
        return min(int(hashlib.md5(f"42:{d}:{j}".encode())
                       .hexdigest()[:8], 16) for j in range(w))
    want = sorted(range(400), key=lambda d: (rank(d), d))[:80]
    assert out["doc_id"].tolist() == want
    # weighted: weight-4 docs (25% of corpus) should dominate the
    # weight-1 docs in the sample (E[share] 40% vs 10%)
    w4 = (out["weight"] == 4).sum()
    w1 = (out["weight"] == 1).sum()
    assert w4 > w1


def test_trailing_window_null_ts_and_value(ray_session):
    import ray.data
    from doc_ocr_ray.stages.sketch import trailing_window_sum

    ev = pd.DataFrame({
        "user_id": [5, 5, 5],
        "event_id": [1, 2, 3],
        "ts": pd.to_datetime(["2024-01-01 10:00", None,
                              "2024-01-01 10:30"]),
        "value": [1.00, 2.00, None]})
    out = (trailing_window_sum(ray.data.from_pandas(ev))
           .to_pandas().set_index("event_id").sort_index())
    assert 2 not in out.index            # NULL ts: no frame, dropped
    assert out.loc[1, "trailing_cents"] == 100
    assert out.loc[3, "trailing_cents"] == 100   # NULL value adds 0


def test_interleave_positions_int_source(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.curate import interleave_positions

    docs = pd.DataFrame({"doc_id": list(range(6)),
                         "src": [1, 1, 2, 2, 2, None]})
    out = (interleave_positions(ray.data.from_pandas(docs),
                                source_col="src")
           .to_pandas().sort_values("position"))
    assert sorted(out["position"]) == list(range(6))
    assert set(out["source"]) == {"1.0", "2.0", "(null)"} or \
        set(out["source"]) == {"1", "2", "(null)"}


def test_weighted_sample_rejects_non_integer_key(ray_session):
    import pytest as _pt
    import ray.data
    from doc_ocr_ray.pipelines.curate import weighted_sample_n

    docs = pd.DataFrame({"doc_id": ["a", "b", "c"]})
    with _pt.raises(Exception, match="integer key column"):
        weighted_sample_n(ray.data.from_pandas(docs), n=2)


def test_ntile_size_and_tie_rules(ray_session):
    import duckdb
    import ray.data
    from doc_ocr_ray.stages.text_analysis import ntile_by_group

    # 10 docs in one source with heavy score ties (words repeated),
    # plus a 3-doc source (n < k: each row its own tile)
    rows = []
    for i in range(10):
        rows.append({"doc_id": i, "source": "a",
                     "text": " ".join(["w"] * (1 + i // 3))})
    for i in range(10, 13):
        rows.append({"doc_id": i, "source": "b", "text": "x y"})
    df = pd.DataFrame(rows)
    out = (ntile_by_group(ray.data.from_pandas(df), tiles=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT doc_id,
               ntile(4) OVER (PARTITION BY source
                              ORDER BY len(str_split(trim(text), ' ')),
                                       doc_id) AS tile
        FROM df ORDER BY doc_id""").df()
    assert out["tile"].tolist() == want["tile"].tolist()
    # size rule: source a (10 rows, k=4) -> tiles sized 3,3,2,2
    a = out[out["source"] == "a"]["tile"].value_counts().sort_index()
    assert a.tolist() == [3, 3, 2, 2]


def test_pmi_top_pairs_counts_and_floor(ray_session):
    import math
    import ray.data
    from doc_ocr_ray.stages.text_analysis import pmi_top_pairs

    # "strong glue" appears 6x and only together; "the the" 5x among
    # many "the"; "rare pair" once (filtered by min_count)
    docs = pd.DataFrame({"text": (
        ["strong glue"] * 6 + ["the the"] * 5
        + ["the end of the story"] * 3 + ["rare pair"])})
    out = (pmi_top_pairs(ray.data.from_pandas(docs), k=10,
                         min_count=5).to_pandas())
    assert "rare" not in set(out["w1"])                # floored out
    row = out[(out["w1"] == "strong") & (out["w2"] == "glue")].iloc[0]
    n_total = 6 * 2 + 5 * 2 + 3 * 5 + 2
    want = math.floor(1e6 * math.log((6 * float(n_total)) / (6.0 * 6)))
    assert row["n_pair"] == 6 and row["pmi_micro"] == want
    # exclusive pair ranks above the promiscuous "the the"
    the = out[(out["w1"] == "the") & (out["w2"] == "the")].iloc[0]
    assert row["pmi_micro"] > the["pmi_micro"]


def test_kmv_by_type_exact_when_small_and_estimates(ray_session):
    import ray.data
    from doc_ocr_ray.stages.sketch import kmv_distinct_users_by_type

    # type 'small': 30 users (< k=16 after override -> exact);
    # type 'big': 500 users -> sketch path
    rows = ([{"event_type": "small", "user_id": u} for u in range(30)]
            + [{"event_type": "big", "user_id": 1000 + u}
               for u in range(500)] * 2)       # dupes don't inflate
    ev = pd.DataFrame(rows)
    out = (kmv_distinct_users_by_type(ray.data.from_pandas(ev), k=64)
           .to_pandas().set_index("event_type"))
    assert out.loc["small", "est_users"] == 30.0     # exact (< k)
    est = out.loc["big", "est_users"]
    assert 350 <= est <= 700                          # ~500 +/- sketch err


def test_value_time_corr_signs_and_zero_variance(ray_session):
    import ray.data
    from doc_ocr_ray.stages.sketch import value_time_corr

    ts = pd.date_range("2024-01-01", periods=50, freq="h")
    ev = pd.DataFrame({
        "event_type": (["up"] * 50 + ["down"] * 50 + ["flat"] * 50),
        "ts": list(ts) * 3,
        "value": ([float(i) for i in range(50)]
                  + [float(50 - i) for i in range(50)]
                  + [7.0] * 50)})
    out = (value_time_corr(ray.data.from_pandas(ev)).to_pandas()
           .set_index("event_type"))
    assert out.loc["up", "corr_micro"] in (999999, 1000000)
    assert out.loc["down", "corr_micro"] == -1000000
    assert out.loc["flat", "corr_micro"] == 0    # zero variance


def test_dhash_perceptual_dedup(ray_session):
    """dHash: resize-invariant bits, PPM/PNG container identity, and
    the banded pair stage finding exactly the designed near-dups."""
    import ray.data
    from doc_ocr_ray.stages.multimodal import (
        decode_image, dhash64, encode_png, encode_ppm,
        media_dhash_pairs, synthesize_neardup_ppm_table)

    # same pixels through both real decoders -> same hash
    img = (np.arange(16 * 18 * 3).reshape(16, 18, 3) % 251).astype(np.uint8)
    assert dhash64(decode_image(encode_ppm(img))) == \
        dhash64(decode_image(encode_png(img)))

    # perturbing only coordinates the 2x resize never samples leaves
    # the hash unchanged; flipping a sampled comparison changes it
    pert = img.copy()
    pert[1::2, :, :] = 0
    pert[:, 1::2, :] = 255
    assert dhash64(pert) == dhash64(img)
    flip = img.astype(np.int64)
    flip[0, 0, :] += 1000
    assert dhash64(flip.clip(0, 255).astype(np.uint8)) != dhash64(img)

    # the distributed stage: groups of 3 -> (v0,v1) hamming 0,
    # (v0,v2) and (v1,v2) hamming <= 1, nothing across groups here
    media = ray.data.from_arrow(synthesize_neardup_ppm_table(range(9)))
    pairs = media_dhash_pairs(media, max_hamming=3).to_pandas()
    got = {(int(a), int(b)): int(h) for a, b, h in
           zip(pairs["doc_a"], pairs["doc_b"], pairs["hamming"])}
    for g in range(3):
        assert got[(3 * g, 3 * g + 1)] == 0
        assert got[(3 * g, 3 * g + 2)] <= 1
        assert got[(3 * g + 1, 3 * g + 2)] <= 1
    assert len(got) == 9  # no cross-group pair at 9 docs
    # duplicate-pair suppression across bands: every pair once
    assert not pairs.duplicated(["doc_a", "doc_b"]).any()


def test_injected_codec_jpeg_seam(ray_session):
    """The injected-codec seam (round-2 verdict item 5): a mock codec
    plugs into decode_image / media_dhash_pairs / MediaDecodeStage
    without touching any stage; default stays the loud raise.  Since
    round 4 the built-in baseline decoder runs FIRST on JPEG magic —
    these payloads (SOI + PPM body) are outside any JPEG envelope, so
    they exercise the fall-through-to-codec path."""
    import pytest
    import ray.data
    import pyarrow as pa
    from doc_ocr_ray.stages.multimodal import (
        MediaDecodeStage, decode_image, dhash64, decode_media,
        encode_ppm, media_dhash_pairs, synthesize_neardup_ppm_table)

    base = synthesize_neardup_ppm_table(range(6))

    def mock_jpeg_codec(payload: bytes) -> np.ndarray:
        # "JPEG" = SOI marker + a real PPM body (a stand-in for what
        # PIL would do); the seam only sees bytes -> uint8 array
        assert payload[:3] == b"\xff\xd8\xff"
        from doc_ocr_ray.stages.multimodal import decode_ppm
        return decode_ppm(payload[3:])

    jpegized = pa.table({
        "media_ref": base["media_ref"],
        "doc_id": base["doc_id"],
        "media_type": pa.array(["image"] * base.num_rows, pa.string()),
        "payload": pa.array([b"\xff\xd8\xff" + p.as_py()
                             for p in base["payload"]], pa.binary()),
        "payload_len": base["payload_len"]})

    # decode_image: default raises (ValueError — the built-in decoder
    # rejects the stream), injected codec decodes
    jp = jpegized["payload"][0].as_py()
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(jp)
    assert dhash64(decode_image(jp, mock_jpeg_codec)) == \
        dhash64(decode_image(base["payload"][0].as_py()))

    # full distributed pair stage through the codec: same pairs as
    # the PPM originals
    want = media_dhash_pairs(
        ray.data.from_arrow(base), max_hamming=3).to_pandas()
    got = media_dhash_pairs(
        ray.data.from_arrow(jpegized), max_hamming=3,
        codec=mock_jpeg_codec).to_pandas()
    key = lambda df: sorted(zip(df["doc_a"], df["doc_b"], df["hamming"]))
    assert key(got) == key(want) and len(got) >= 6

    # actor-pool decode stage: real features via the injected codec
    feats = decode_media(ray.data.from_arrow(jpegized),
                         use_fake_decoder=False,
                         codec=mock_jpeg_codec).take_all()
    assert len(feats) == 6 and all(len(f["feature"]) == 16 for f in feats)
    # ...and without a codec the real path still raises loudly
    with pytest.raises(Exception):
        decode_media(ray.data.from_arrow(jpegized),
                     use_fake_decoder=False).take_all()
    # codec returning the wrong dtype is rejected at the seam
    with pytest.raises(ValueError):
        decode_image(jp, lambda p: np.zeros((2, 2), dtype=np.float64))


def test_dedup_keep_min_singletons_and_clusters(ray_session):
    import ray.data
    from doc_ocr_ray.stages.dedup import dedup_keep_min

    ids = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([1, 2, 3, 4, 5, 9], dtype="int64")}))
    labels = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([2, 3, 5], dtype="int64"),
         "cluster": pd.Series([2, 2, 5], dtype="int64")}))
    out = (dedup_keep_min(ids, labels).to_pandas()
           .sort_values("cluster").reset_index(drop=True))
    # cluster {2,3} keeps 2; the self-labelled 5 keeps itself;
    # unlabeled 1, 4, 9 are singletons keeping themselves
    assert list(map(tuple, out[["cluster", "doc_id"]].to_numpy())) == [
        (1, 1), (2, 2), (4, 4), (5, 5), (9, 9)]


def test_audio_fingerprint_dedup(ray_session):
    """Energy-contour fingerprint: decimation-invariant, zero-padding
    for short clips, and the banded pair stage on the testbed."""
    import ray.data
    from doc_ocr_ray.stages.multimodal import (
        audio_fingerprint64, decode_wav, encode_wav, media_afp_pairs,
        synthesize_neardup_wav_table)

    base = ((np.arange(2080, dtype=np.int64) ** 2 * 5) % 65536
            - 32768).astype(np.int16)
    # odd-index perturbation invisible to the decimated fingerprint
    pert = base.copy()
    pert[1::2] = 12345
    assert audio_fingerprint64(pert) == audio_fingerprint64(base)
    # sampled-index change at a contour-dominant scale flips bits
    loud = base.astype(np.int64)
    loud[0:64:2] = 32767
    assert audio_fingerprint64(loud.astype(np.int16)) != \
        audio_fingerprint64(base)
    # short clip: zero-pad, no crash, deterministic
    assert audio_fingerprint64(base[:100]) == \
        audio_fingerprint64(base[:100])
    # fingerprint survives a real encode/decode round trip
    dec, _ = decode_wav(encode_wav(base))
    assert audio_fingerprint64(dec) == audio_fingerprint64(base)

    media = ray.data.from_arrow(synthesize_neardup_wav_table(range(9)))
    pairs = media_afp_pairs(media, max_hamming=3).to_pandas()
    got = {(int(a), int(b)): int(h) for a, b, h in
           zip(pairs["doc_a"], pairs["doc_b"], pairs["hamming"])}
    for g in range(3):
        assert got[(3 * g, 3 * g + 1)] == 0     # odd-noise copy
        assert got[(3 * g, 3 * g + 2)] == 0     # sub-contour bump
    assert not pairs.duplicated(["doc_a", "doc_b"]).any()


def test_pdf_extract_parser_edges(ray_session):
    """Real PDF parse: escapes, octal, TJ kerning joins, FlateDecode,
    multi-page order, out-of-scope constructs raising loudly."""
    import ray.data
    from doc_ocr_ray.stages.pdf_extract import (
        decode_pdf_text, encode_pdf, extract_pdf_lines,
        synthesize_pdf_table)

    pages = [["plain line", "with (nested (parens)) ok",
              "back\\slash and tab\there"],
             ["second page"]]
    for comp in (False, True):
        assert decode_pdf_text(encode_pdf(pages, comp)) == pages

    # octal escape and backslash-newline continuation decode per spec
    raw = encode_pdf([["AB"]])
    hacked = raw.replace(b"(AB)", b"(\\101\\102 j\\\noined)")
    assert decode_pdf_text(hacked) == [["AB joined"]]

    # out-of-scope constructs fail loudly, never extract garbage
    with pytest.raises(ValueError):
        decode_pdf_text(b"%FDP not a pdf")
    with pytest.raises(ValueError):
        decode_pdf_text(raw.replace(b"/Length", b"/Filter /LZWDecode"
                                    b" /Length"))

    # distributed stage over the testbed: exact expected rows
    media = ray.data.from_arrow(synthesize_pdf_table(range(7)))
    out = (extract_pdf_lines(media.select_columns(["doc_id", "payload"]))
           .to_pandas().sort_values(["doc_id", "page", "offset"])
           .reset_index(drop=True))
    exp = []
    for d in range(7):
        for p in range(1 + d % 2):
            for j in range(2 + (d + p) % 2):
                exp.append((d, p, j, f"Doc {d} page {p} line {j} content."))
            if d % 3 == 0 and p == 0:
                exp.append((d, p, 2 + d % 2,
                            f"Escape (paren) and \\ slash in doc {d}."))
    got = list(map(tuple, out[["doc_id", "page", "offset",
                               "text"]].to_numpy()))
    assert got == sorted(exp)


def test_pdf_hex_strings_and_filter_seam():
    """Spec 7.3.4.3 hex strings (whitespace inside, odd-digit pad,
    malformed raising) and the injected non-Flate filter seam."""
    import zlib
    from doc_ocr_ray.stages.pdf_extract import decode_pdf_text, encode_pdf

    raw = encode_pdf([["AB"]])
    # <4142> == (AB); internal PDF whitespace is ignored
    assert decode_pdf_text(raw.replace(b"(AB) Tj", b"<4142> Tj")) == \
        [["AB"]]
    assert decode_pdf_text(raw.replace(b"(AB) Tj",
                                       b"<41\n4 2> Tj")) == [["AB"]]
    # odd digit count pads a trailing 0: <414> -> 0x41 0x40 == 'A@'
    assert decode_pdf_text(raw.replace(b"(AB) Tj", b"<414> Tj")) == \
        [["A@"]]
    # hex strings inside TJ arrays join like literals
    assert decode_pdf_text(raw.replace(
        b"(AB) Tj", b"[<41> -120 (B)] TJ")) == [["AB"]]
    with pytest.raises(ValueError):    # unterminated
        decode_pdf_text(raw.replace(b"(AB) Tj", b"<4142 Tj"))
    with pytest.raises(ValueError):    # non-hex byte
        decode_pdf_text(raw.replace(b"(AB) Tj", b"<41zz> Tj"))

    # injected filter: a mock "LZWDecode" (really zlib) plugs in
    # through the seam; without it the same payload raises
    comp = encode_pdf([["codec line"]], compress=True)
    hacked = comp.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode")
    assert decode_pdf_text(
        hacked, filters={b"LZWDecode": zlib.decompress}) == \
        [["codec line"]]
    with pytest.raises(ValueError):
        decode_pdf_text(hacked)
    # an array with an unknown member raises even when another member
    # is injected — never silently skip a chain link
    with pytest.raises(ValueError):
        decode_pdf_text(comp.replace(b"/Filter /FlateDecode",
                                     b"/Filter [/A /B]"),
                        filters={b"A": zlib.decompress})


def test_pdf_filter_chains():
    """Chained /Filter arrays (PDF 32000-1 7.4): members apply in
    listed order; ASCIIHexDecode is native (whitespace skip, > EOD,
    odd-digit pad); malformed chains raise loudly."""
    import binascii
    import zlib
    from doc_ocr_ray.stages.pdf_extract import (
        decode_pdf_text, encode_pdf, _ascii_hex_decode)

    pages = [["chained line one", "and (two) \\ three"],
             ["page two endstream prose"]]
    # writer's chain mode: hex-wrapped deflate behind
    # [/ASCIIHexDecode /FlateDecode], line-broken hex
    assert decode_pdf_text(encode_pdf(pages, chain=True)) == pages

    # single-element array == single filter
    comp = encode_pdf([["solo"]], compress=True)
    assert decode_pdf_text(comp.replace(
        b"/Filter /FlateDecode", b"/Filter [/FlateDecode]")) == [["solo"]]

    # injected codec works as an array member too
    hacked = comp.replace(b"/Filter /FlateDecode",
                          b"/Filter [/LZWDecode]")
    assert decode_pdf_text(
        hacked, filters={b"LZWDecode": zlib.decompress}) == [["solo"]]

    # WRONG member order must fail loudly: hex-decoding raw deflate
    # bytes hits a non-hex byte (never a silently-wrong parse)
    chained = encode_pdf([["x"]], chain=True)
    with pytest.raises((ValueError, zlib.error)):
        decode_pdf_text(chained.replace(
            b"/Filter [/ASCIIHexDecode /FlateDecode]",
            b"/Filter [/FlateDecode /ASCIIHexDecode]"))

    # unterminated array raises
    with pytest.raises(ValueError):
        decode_pdf_text(comp.replace(b"/Filter /FlateDecode",
                                     b"/Filter [/FlateDecode"))

    # native ASCIIHexDecode unit behavior
    assert _ascii_hex_decode(b"41 42\n43") == b"ABC"
    assert _ascii_hex_decode(b"414> junk after EOD ignored") == b"A@"
    assert _ascii_hex_decode(b"") == b""
    with pytest.raises(ValueError):
        _ascii_hex_decode(b"41zz")
    # truncated hex payload inflates to a zlib error, not garbage text
    hx = binascii.hexlify(zlib.compress(b"BT (hi) Tj ET"))
    body = hx[:len(hx) // 2] + b">"
    with pytest.raises((ValueError, zlib.error)):
        zlib.decompress(_ascii_hex_decode(body))


def test_pdf_parser_hardening():
    """Review-fix regressions: 'endobj' in prose, dicts in content
    streams, quote-operator line semantics, compressed streams whose
    bytes collide with structure keywords."""
    import zlib
    from doc_ocr_ray.stages.pdf_extract import decode_pdf_text, encode_pdf

    # the word endobj in page prose must not truncate the object scan
    pages = [["the word endobj appears in prose", "and obj too"]]
    for comp in (False, True):
        assert decode_pdf_text(encode_pdf(pages, comp)) == pages

    # a compressed stream whose INFLATED bytes contain structure
    # keywords round-trips (the /Length jump never pattern-matches)
    tricky = [["stream endstream endobj 4 0 obj xref trailer"]]
    assert decode_pdf_text(encode_pdf(tricky, True)) == tricky

    # a dictionary in the content stream (marked content) is skipped,
    # not misread as a hex string
    raw = encode_pdf([["AB"]])
    hacked = raw.replace(b"BT", b"/OC << /Type /OCMD >> BDC BT")
    assert decode_pdf_text(hacked) == [["AB"]]

    # quote operators: move to next line THEN show
    hacked = raw.replace(b"(AB) Tj", b"(first) Tj (second) '")
    assert decode_pdf_text(hacked) == [["first", "second"]]


def test_watermark_empty_input_keeps_schema(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import watermark_late_events
    empty = ray.data.from_pandas(pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "event_us": pd.Series([], dtype="int64"),
        "event_type": pd.Series([], dtype="object")}))
    out = watermark_late_events(empty, lateness_us=1,
                                carry_cols=("event_type",))
    # Dataset.to_pandas() flattens ANY zero-row dataset to a
    # column-less frame (Ray quirk); the schema is the contract
    assert out.schema().names == ["event_id", "event_us",
                                  "watermark_us", "late", "event_type"]
    assert out.count() == 0


def test_media_dhash_incremental_drops_recrawls(ray_session):
    """Incremental perceptual dedup: re-crawled copies (same pixels,
    new ids in an OVERLAPPING id space) drop; fresh patterns
    survive."""
    import pyarrow.compute as pc_
    import ray.data
    from doc_ocr_ray.stages.multimodal import (
        media_dhash_incremental, synthesize_neardup_ppm_table)

    old = ray.data.from_arrow(synthesize_neardup_ppm_table(range(12)))
    # new crawl: pixel-copies of ids 0..5 plus fresh patterns 30..35,
    # relabeled into ids that COLLIDE with old ones (0..11) — the
    # side bit must keep them apart
    newt = synthesize_neardup_ppm_table(list(range(6))
                                        + list(range(30, 36)))
    idx = newt.schema.get_field_index("doc_id")
    newt = newt.set_column(
        idx, "doc_id",
        pc_.add(pc_.subtract(newt["doc_id"],
                             pc_.min(newt["doc_id"])), 0))
    new = ray.data.from_arrow(newt)
    out = media_dhash_incremental(new, old).to_pandas()
    # copies of 0..5 (groups 0-1, fully present in old) drop; fresh
    # 30..35 (groups 10-11) survive under their original labels
    assert sorted(out["doc_id"]) == list(range(30, 36))


def test_hll_sketch_accuracy_merge_and_linear_counting():
    import math
    import ray.data
    from doc_ocr_ray.stages.sketch import hll_distinct_users_by_type
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    exact = ev.dropna().groupby("event_type")["user_id"].nunique()
    ds = ray.data.from_pandas(ev).repartition(6)
    out = hll_distinct_users_by_type(ds).to_pandas()
    assert set(out["event_type"]) == set(exact.index)
    # HLL with m=64 has sigma ~ 1.04/8 = 13%; allow 3.5 sigma
    for _, r in out.iterrows():
        true = exact[r["event_type"]]
        assert abs(r["est_users"] - true) <= max(3.0, 0.45 * true)
    # merge invariance: registers are maxes, batching cannot matter
    out1 = (hll_distinct_users_by_type(ds.repartition(1)).to_pandas()
            .sort_values("event_type").reset_index(drop=True))
    out8 = (hll_distinct_users_by_type(ds.repartition(8)).to_pandas()
            .sort_values("event_type").reset_index(drop=True))
    assert out1.equals(out8)
    # linear-counting branch pinned: one user -> 64*ln(64/63) -> 1.0
    one = ray.data.from_pandas(pd.DataFrame(
        {"event_type": ["t"], "user_id": [12345]}))
    got = hll_distinct_users_by_type(one).to_pandas()["est_users"][0]
    import numpy as _np
    assert got == _np.floor(10 * (64.0 * math.log(64.0 / 63.0))) / 10


def test_apply_changelog_semantics():
    """Upsert rewrite, delete, last-wins ordering, equal-ts seq tie,
    delete-then-upsert revival and fresh insert, all pinned."""
    import ray.data
    from doc_ocr_ray.stages.catalog import apply_changelog
    snap = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["a", "b", "c", "d", "e"]}))
    ch = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [2, 3, 4, 4, 6, 5, 5],
        "text": ["B", "", "X", "", "F", "", "E2"],
        "ts":   [2, 1, 5, 5, 0, 1, 2],
        "seq":  [1, 0, 0, 1, 0, 0, 1],
        "op": ["upsert", "delete", "upsert", "delete", "upsert",
               "delete", "upsert"]}))
    out = (apply_changelog(snap, ch).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(zip(out["doc_id"], out["text"])) == [
        (1, "a"), (2, "B"), (5, "E2"), (6, "F")]
    # unknown ops are refused loudly
    bad = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1], "text": ["x"], "ts": [1], "seq": [0],
        "op": ["merge"]}))
    import pytest as _pytest
    import ray.exceptions
    with _pytest.raises(ray.exceptions.RayTaskError):
        apply_changelog(snap, bad).to_pandas()
    # negative changelog coordinates would lose to the snapshot
    # sentinel — refused loudly
    neg = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1], "text": ["x"], "ts": [-2], "seq": [0],
        "op": ["upsert"]}))
    with _pytest.raises(ray.exceptions.RayTaskError):
        apply_changelog(snap, neg).to_pandas()


def test_validate_table_rules_and_cross_batch_unique():
    import ray.data
    from doc_ocr_ray.stages.catalog import validate_table
    df = pd.DataFrame({
        "k": [1, 2, 3, 4, 5, 6, 7, 1, 2, 1],     # 1 x3, 2 x2 dup
        "txt": ["a", None, "c", "d", None, "f", "g", "h", "i", "j"],
        "n": [5, 50, 500, -1, 50, 50, 50, 50, 50, None],
        "tag": ["aa", "bb", "xx", "ZZ", "aa", "a1", "aa", "aa",
                None, "aa"]})
    ds = ray.data.from_pandas(df).repartition(5)   # dups cross batches
    rules = [("u", "unique", "k"),
             ("u2", "unique", "txt"),            # no dups -> reports 0
             ("nn", "not_null", "txt"),
             ("rng", "int_range", "n", 1, 100),
             ("re", "regex_full", "tag", "[a-z]{2}"),
             ("set", "in_set", "tag", ["aa", "bb", "xx", "ZZ", "a1"])]
    out = (validate_table(ds, rules).to_pandas()
           .sort_values("rule_id").reset_index(drop=True))
    got = dict(zip(out["rule_id"], out["n_violations"]))
    # u: keys 1 (3 rows) + 2 (2 rows) = 5; nn: 2 NULLs; rng: -1 and
    # 500 (NULL n exempt) = 2; re: 'ZZ' and 'a1' fail, NULL exempt = 2;
    # set: all non-null in set = 0
    assert got == {"u": 5, "u2": 0, "nn": 2, "rng": 2, "re": 2,
                   "set": 0}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        validate_table(ds, [("bad", "between", "n", 1, 2)])
    with _pytest.raises(ValueError):
        validate_table(ds, [])


def test_inverted_index_delta_equals_rebuild():
    """Incremental index maintenance == full rebuild over the merged
    table, with every CDC rule firing: upsert rewrite (token loss +
    gain), full delete (token dies), fresh insert (new token),
    out-of-order loss, equal-ts seq tie, and tokens shared between
    affected and unaffected docs."""
    import ray.data
    from doc_ocr_ray.stages.catalog import apply_changelog
    from doc_ocr_ray.stages.text_analysis import (inverted_index,
                                                  inverted_index_delta)
    snap = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 7],
        "text": ["the cat sat", "the dog sat", "a cat ran",
                 "lonely tokens here", "the bird", "old seven"]}))
    ch = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [2, 3, 6, 5, 5, 7, 7],
        "text": ["the dog BARKED loud", "", "fresh cat",
                 "WRONG", "", "tiea cat", "tieb cat"],
        "ts":   [2, 1, 1, 1, 3, 4, 4],
        "seq":  [0, 0, 0, 0, 0, 0, 1],
        "op": ["upsert", "delete", "upsert", "upsert", "delete",
               "upsert", "upsert"]}))
    base = inverted_index(snap, min_df=1, max_postings=None,
                          num_parts=8).materialize()
    got = (inverted_index_delta(base.repartition(3), ch, num_parts=8)
           .to_pandas().sort_values("token").reset_index(drop=True))
    want = (inverted_index(apply_changelog(snap, ch), min_df=1,
                           max_postings=None, num_parts=8)
            .to_pandas().sort_values("token").reset_index(drop=True))
    assert got.equals(want)
    # spot-pins: tieb won doc 7; 'cat' = {1, 6, 7}; 'sat' lost doc 2;
    # 'bird'/'a'/'ran' died; 'fresh'/'barked' born
    idx = dict(zip(got["token"], got["postings"]))
    assert idx["cat"] == "1,6,7" and idx["tieb"] == "7"
    assert idx["sat"] == "1" and idx["barked"] == "2"
    assert "bird" not in idx and "ran" not in idx and "tiea" not in idx
    # a capped (lossy) base is refused loudly
    import pytest as _pytest
    import ray.exceptions
    capped = inverted_index(snap, min_df=1, max_postings=1,
                            num_parts=8).materialize()
    with _pytest.raises(ray.exceptions.RayTaskError):
        inverted_index_delta(capped, ch, num_parts=8).to_pandas()


def test_setsim_join_pairs_equals_bruteforce():
    """Prefix-filter exact Jaccard join == brute-force O(n^2) scan on
    a corpus built to stress the filter: exact duplicates, a pair
    exactly AT the threshold, one just below, high-df shared tokens
    (must not blow recall), and docs whose only shared tokens are
    common (prefix ordering must still catch qualifying pairs)."""
    import itertools
    import ray.data
    from doc_ocr_ray.stages.dedup import setsim_join_pairs

    vocab = [f"w{i}" for i in range(30)]
    texts = {
        0: "w0 w1 w2 w3 w4",          # |5|
        1: "w0 w1 w2 w3 w4",          # dup of 0 -> J=1000
        2: "w0 w1 w2 w3 w5",          # J(0,2)=4/6=666
        3: "w0 w1 w2 w3 w4 w5",       # J(0,3)=5/6=833 >= 800
        4: "w0 w1 w2 w3 w4 w5 w6 w7", # J(0,4)=5/8=625
        5: "w20 w21 w22 w23 w24 w25 w26 w27 w28 w29",
        6: "w20 w21 w22 w23 w24 w25 w26 w27 w28",  # J(5,6)=9/10=900
        7: "",                        # empty: never pairs
        8: "w0",                      # singleton set
        9: "w0",                      # J(8,9)=1000 via one common token
    }
    # bulk docs sharing the high-df tokens w0..w3 (stress df ordering)
    for i in range(10, 40):
        texts[i] = " ".join(["w0", "w1", "w2", "w3",
                             vocab[4 + (i % 26)], vocab[(i * 7) % 30],
                             vocab[(i * 11) % 30], f"u{i}"])
    t_milli = 800

    def jac(a, b):
        sa, sb = set(a.split()) - {""}, set(b.split()) - {""}
        if not sa or not sb:
            return None
        inter = len(sa & sb)
        union = len(sa | sb)
        return inter, union

    want = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        r = jac(texts[a], texts[b])
        if r and 1000 * r[0] >= t_milli * r[1]:
            want.add((a, b, (1000 * r[0]) // r[1]))

    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": sorted(texts), "text": [texts[k] for k in sorted(texts)]}))
    got = setsim_join_pairs(ds, t_milli=t_milli).to_pandas()
    got_set = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int),
                      got["jac_milli"].astype(int)))
    assert got_set == want
    # pins: the dup pair, the at-threshold pair, the rejected 666 pair
    assert (0, 1, 1000) in got_set and (0, 3, 833) in got_set
    assert (8, 9, 1000) in got_set
    assert not any(p[:2] == (0, 2) for p in got_set)
    with pytest.raises(ValueError):
        setsim_join_pairs(ds, t_milli=0)


def test_bloom_semi_join_exact_even_with_false_positives():
    """The bloom stage may pass false positives (tiny m_bits forces
    them here) but the exact finish must remove every one: output ==
    plain semi join, row for row.  No false negatives by construction."""
    import ray.data
    from doc_ocr_ray.pipelines.relational import bloom_semi_join

    big = pd.DataFrame({
        "k": np.arange(300, dtype=np.int64) % 150,
        "v": [f"row{i}" for i in range(300)]})
    keys = pd.DataFrame({"key": np.array(
        [3, 3, 7, 11, 140, 9999], dtype=np.int64)})  # 9999 matches nothing
    want = big[big["k"].isin(set(keys["key"]))].reset_index(drop=True)

    for m in (64, 1 << 16):  # m=64 over 6 keys*4 hashes -> fp-rich
        got = (bloom_semi_join(ray.data.from_pandas(big),
                               ray.data.from_pandas(keys),
                               "k", "key", m_bits=m, k_hashes=4)
               .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
        assert got.sort_values(["k", "v"]).reset_index(drop=True).equals(
            want.sort_values(["k", "v"]).reset_index(drop=True)), m

    with pytest.raises(ValueError):
        bloom_semi_join(ray.data.from_pandas(big),
                        ray.data.from_pandas(keys), "k", "key", m_bits=100)
    with pytest.raises(ValueError):
        bloom_semi_join(ray.data.from_pandas(big),
                        ray.data.from_pandas(keys), "k", "key", k_hashes=0)


def test_pack_tokens_replay_and_edges():
    """Pack map == single-process replay of the md5 order + stream
    chunking; covers multi-bin docs, an exactly-seq_len doc, empty
    docs (emit nothing), and conservation (slices tile each bin)."""
    import hashlib
    import ray.data
    from doc_ocr_ray.pipelines.curate import pack_tokens

    texts = {
        0: " ".join(f"t{i}" for i in range(13)),   # crosses bins
        1: "a b c d e f g h",                       # exactly 8 = L
        2: "",                                      # nothing
        3: "x",                                     # single token
        4: " ".join(f"u{i}" for i in range(21)),   # 3-bin crosser
        5: "  p   q  ",                             # ws collapse: 2
    }
    L, seed = 8, 7
    order = sorted(texts, key=lambda k: (hashlib.md5(
        f"{seed}:{k}".encode()).hexdigest(), k))
    want = []
    pos = 0
    for k in order:
        n = len(texts[k].split())
        s, e = pos, pos + n
        pos = e
        if n == 0:
            continue
        for b in range(s // L, (e - 1) // L + 1):
            lo, hi = max(b * L, s), min((b + 1) * L, e)
            want.append((b, k, lo - b * L, lo - s, hi - lo))

    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": sorted(texts), "text": [texts[k] for k in sorted(texts)]}))
    got = pack_tokens(ds, seq_len=L, seed=seed).to_pandas()
    got_rows = sorted(map(tuple, got.to_numpy()))
    assert got_rows == sorted(want)
    # conservation: every bin except the last is exactly tiled
    tot = sum(len(t.split()) for t in texts.values())
    per_bin = got.groupby("bin_id")["n_slice"].sum()
    for b, s in per_bin.items():
        assert s == (L if b < tot // L else tot % L)
    with pytest.raises(ValueError):
        pack_tokens(ds, seq_len=0)


def test_interval_lookup_bands_and_validation():
    import ray.data
    from doc_ocr_ray.pipelines.relational import interval_lookup

    df = pd.DataFrame({"k": np.arange(8, dtype=np.int64),
                       "v": np.array([-5, 0, 9, 10, 15, 19, 20, 100],
                                     dtype=np.int64)})
    iv = [(0, 10, "lo"), (10, 20, "mid"), (50, 60, "gap-right")]
    got = (interval_lookup(ray.data.from_pandas(df), iv, "v")
           .to_pandas().sort_values("k"))
    # boundaries: lo inclusive, hi exclusive; gaps/outside -> default
    assert got["band"].tolist() == [
        "(none)", "lo", "lo", "mid", "mid", "mid", "(none)", "(none)"]
    with pytest.raises(ValueError):
        interval_lookup(ray.data.from_pandas(df), [(5, 5, "x")], "v")
    with pytest.raises(ValueError):
        interval_lookup(ray.data.from_pandas(df),
                        [(0, 10, "a"), (9, 20, "b")], "v")
    with pytest.raises(ValueError):
        interval_lookup(ray.data.from_pandas(df), [], "v")


def test_host_graph_collapse_counts_and_distinct_pages():
    import ray.data
    from doc_ocr_ray.stages.graph import host_graph

    edges = pd.DataFrame({
        "src_url": ["http://a.test/p1", "https://www.a.test/p1?x=1",
                    "http://a.test/p2", "http://a.test/p2",
                    "http://b.test/q", "http://a.test/p3"],
        "dst_url": ["http://b.test/x", "http://b.test/y",
                    "https://b.test/z", "http://www.b.test/z2",
                    "http://a.test/home", "http://a.test/self"]})
    got = (host_graph(ray.data.from_pandas(edges.sample(
               frac=1.0, random_state=3)))  # order-free
           .to_pandas().sort_values(["src_host", "dst_host"])
           .reset_index(drop=True))
    # a.test/p1 canonicalizes across scheme/www/query variants -> ONE
    # distinct page; a->b has 4 links over 2 distinct pages
    rows = {(r.src_host, r.dst_host): (r.n_links, r.n_src_pages)
            for r in got.itertuples()}
    assert rows == {("a.test", "b.test"): (4, 2),
                    ("b.test", "a.test"): (1, 1),
                    ("a.test", "a.test"): (1, 1)}


def test_cms_token_counts_bounds_and_exactness():
    """CMS invariants: est >= true always; with a collision-free width
    est == true exactly (incl. 0 for absent tokens); partials merge so
    block layout cannot change the answer."""
    import collections
    import ray.data
    from doc_ocr_ray.stages.sketch import cms_token_counts

    texts = [f"alpha beta beta gamma{i % 7} alpha" for i in range(50)]
    true = collections.Counter(t for x in texts for t in x.split())
    df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                       "text": texts})
    q = ["alpha", "beta", "gamma0", "gamma6", "absent"]

    big = cms_token_counts(ray.data.from_pandas(df).repartition(7), q,
                           depth=4, width=4096)
    est = dict(zip(big["token"], big["est"]))
    assert est == {"alpha": 100, "beta": 100, "gamma0": 8,
                   "gamma6": 7, "absent": 0}

    # tiny width forces collisions: still an upper bound, never under
    small = cms_token_counts(ray.data.from_pandas(df), q,
                             depth=3, width=4)
    for t, e in zip(small["token"], small["est"]):
        assert e >= true.get(t, 0)

    # merge invariance: 1 block vs 7 blocks, identical sketch answers
    one = cms_token_counts(ray.data.from_pandas(df), q,
                           depth=3, width=4)
    assert one.equals(small)
    with pytest.raises(ValueError):
        cms_token_counts(ray.data.from_pandas(df), [], depth=4)
    with pytest.raises(ValueError):
        cms_token_counts(ray.data.from_pandas(df), q, width=0)


def test_resample_locf_carry_ties_and_leading_gap():
    import ray.data
    from doc_ocr_ray.pipelines.events import resample_locf

    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": np.array([7, 7, 7, 9, 9], dtype=np.int64),
        "ts": pd.to_datetime(["2024-01-02 05:00", "2024-01-02 05:00",
                              "2024-01-04 12:00", "2024-01-03 00:00",
                              "2024-01-10 00:00"]),
        "value": [1.00, 2.00, 3.50, 9.99, 0.01]})
    got = (resample_locf(ray.data.from_pandas(ev),
                         "2024-01-01", "2024-01-06", 1440)
           .to_pandas().sort_values(["user_id", "grid_ts"])
           .reset_index(drop=True))
    u7 = got[got["user_id"] == 7]
    # Jan 1-2 00:00 dropped (before the first event at Jan 2 05:00);
    # the 05:00 tie -> event_id 2 wins (200); carried through the
    # Jan 4 00:00 instant (event lands at noon), then 350
    assert pd.to_datetime(u7["grid_ts"]).dt.day.tolist() == [3, 4, 5, 6]
    assert u7["cents"].tolist() == [200, 200, 350, 350]
    u9 = got[got["user_id"] == 9]
    # exact-boundary event at Jan 3 00:00 included at its own instant
    assert u9["cents"].tolist() == [999, 999, 999, 999]
    with pytest.raises(ValueError):
        resample_locf(ray.data.from_pandas(ev),
                      "2024-01-06", "2024-01-01", 1440)


def test_scd2_intervals_ties_equal_values_open_end(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import scd2_intervals

    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": np.array([7, 7, 7, 9], dtype=np.int64),
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:00",
                              "2024-01-02 00:00", "2024-01-05 00:00"]),
        "value": [1.00, 2.00, 2.00, 5.00]})
    got = (scd2_intervals(ray.data.from_pandas(ev).repartition(2))
           .to_pandas()
           .sort_values(["user_id", "valid_from", "event_id"])
           .reset_index(drop=True))
    assert got["event_id"].tolist() == [1, 2, 3, 4]
    assert got["cents"].tolist() == [100, 200, 200, 500]
    # equal-timestamp tie: e1's interval closes at the SAME instant
    # e2 opens; an equal VALUE (e2 -> e3) still opens a new version
    assert got.loc[0, "valid_to"] == got.loc[1, "valid_from"]
    assert got.loc[1, "valid_to"] == got.loc[2, "valid_from"]
    # one open (NULL-ended) interval per user, on its last event
    assert pd.isna(got.loc[2, "valid_to"]) and pd.isna(got.loc[3, "valid_to"])
    assert got["valid_to"].notna().sum() == 2


def test_decayed_score_exact_weights_and_window(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import decayed_score_per_user

    ev = pd.DataFrame({
        "user_id": np.array([1, 1, 2, 2], dtype=np.int64),
        "ts": pd.to_datetime(["2024-01-31 12:00",   # age 0 -> 2^20
                              "2024-01-30 00:00",   # age 2 -> 2^18
                              "2024-01-01 00:00",   # age 31 -> drop
                              "2024-02-02 00:00"]), # after horizon
        "value": [1.00, 0.50, 9.99, 9.99]})
    got = (decayed_score_per_user(ray.data.from_pandas(ev)
                                  .repartition(2))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # exact integers: 100*2^20 + 50*2^18; out-of-window user stays
    # with score 0 (weight-zero terms, not dropped rows)
    assert got["user_id"].tolist() == [1, 2]
    assert got["score"].tolist() == [100 * 2**20 + 50 * 2**18, 0]


def test_quantile_hist_ranks_and_in_bin_interpolation(ray_session):
    import ray.data
    from doc_ocr_ray.stages.sketch import quantile_hist_by_type

    ev = pd.DataFrame({
        "event_type": ["a"] * 5 + ["b"] * 8,
        "value": [1.00, 2.00, 3.00, 4.00, 5.00] + [1.00] * 4 + [1.50] * 4})
    got = (quantile_hist_by_type(ray.data.from_pandas(ev).repartition(3),
                                 quantiles=(50,), bin_cents=100)
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    # type a: one count per bin -> p50 rank 2 lands at bin 3 exactly
    # type b: all 8 values share bin 1 -> rank 3 interpolates
    #         100 + 3*100//8 = 137 (pure integer arithmetic)
    assert got["event_type"].tolist() == ["a", "b"]
    assert got["est_cents"].tolist() == [300, 137]


def test_winsorize_by_group_discrete_bounds(ray_session):
    import ray.data
    from doc_ocr_ray.stages.text_analysis import winsorize_by_group

    docs = pd.DataFrame({
        "doc_id": [f"s{i}" for i in range(21)] + ["t0", "t1"],
        "source": ["s"] * 21 + ["t"] * 2,
        "text": ["w " * (i + 1) for i in range(21)]
                + ["w " * 5, "w " * 100]})
    got = (winsorize_by_group(ray.data.from_pandas(docs).repartition(3))
           .to_pandas().set_index("doc_id"))
    # source s: n=21, lo rank 5*20//100=1 -> 2, hi rank 95*20//100=19
    # -> 20; the tails clip, the middle passes through
    assert got.loc["s0", "clipped"] == 2
    assert got.loc["s20", "clipped"] == 20
    assert got.loc["s10", "clipped"] == got.loc["s10", "n_tokens"] == 11
    # source t: n=2 -> both ranks 0 -> both bounds = min value 5; the
    # megadoc is pinned to it (groups do not leak into each other)
    assert got.loc["t1", "n_tokens"] == 100
    assert got.loc["t1", "clipped"] == 5


def test_fuzzy_self_join_blocking_and_distinct(ray_session):
    import ray.data
    from doc_ocr_ray.stages.linkage import fuzzy_self_join, levenshtein

    assert levenshtein("red bolt", "red rod") == 3
    assert levenshtein("", "abc") == 3 and levenshtein("abc", "abc") == 0
    df = pd.DataFrame({"p_name": ["red bolt", "red rod", "blue bolt",
                                  "red bolt", None]})
    got = (fuzzy_self_join(ray.data.from_pandas(df).repartition(2),
                           "p_name")
           .to_pandas().sort_values(["val_a", "val_b"])
           .reset_index(drop=True))
    # blue bolt is within max_dist of red bolt but shares no block ->
    # never compared; the duplicate red bolt collapses (distinct join)
    assert got["val_a"].tolist() == ["red bolt"]
    assert got["val_b"].tolist() == ["red rod"]
    assert got["dist"].tolist() == [3]


def test_levenshtein_is_utf8_byte_based_like_duckdb():
    from doc_ocr_ray.stages.linkage import levenshtein
    import duckdb

    # DuckDB's levenshtein counts UTF-8 BYTES; the engine must match
    for a, b in [("é", "a"), ("café bolt", "cafe bolt"),
                 ("日本", "日木"), ("", "é"), ("naïve", "naive")]:
        want = duckdb.sql(
            "SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_winsorize_null_source_and_empty_input(ray_session):
    import ray.data
    from doc_ocr_ray.stages.text_analysis import winsorize_by_group

    # NULL source rows drop (SQL inner-join parity), others survive
    docs = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "source": ["s", None, "s"],
        "text": ["w w", "w w w w", "w"]})
    got = (winsorize_by_group(ray.data.from_pandas(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == ["a", "c"]

    # all-NULL / empty input returns a typed empty, no KeyError
    empty = pd.DataFrame({"doc_id": ["x"], "source": [None],
                          "text": ["w"]})
    got2 = winsorize_by_group(ray.data.from_pandas(empty))
    assert got2.count() == 0
    assert "clipped" in got2.schema().names


def test_scd2_intervals_single_row_user(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import scd2_intervals

    ev = pd.DataFrame({
        "event_id": [1],
        "user_id": np.array([5], dtype=np.int64),
        "ts": pd.to_datetime(["2024-01-01"]),
        "value": [1.0]})
    got = scd2_intervals(ray.data.from_pandas(ev)).to_pandas()
    assert len(got) == 1 and pd.isna(got.loc[0, "valid_to"])


def test_min_cost_supplier_ties_and_dup_pairs(ray_session):
    import ray.data
    import pyarrow as pa
    from doc_ocr_ray.pipelines.relational import min_cost_supplier

    li = pd.DataFrame({
        "l_partkey": np.array([1, 1, 1, 1, 2], dtype=np.int64),
        "l_suppkey": np.array([10, 11, 10, 12, 10], dtype=np.int64),
        "l_extendedprice": [5.00, 5.00, 5.00, 9.99, 7.77]})
    sup = pa.table({"s_suppkey": pa.array([10, 11, 12], pa.int64()),
                    "s_name": ["A", "B", "C"]})
    got = (min_cost_supplier(ray.data.from_pandas(li).repartition(3),
                             sup)
           .to_pandas().sort_values(["p_partkey", "s_suppkey"])
           .reset_index(drop=True))
    # part 1: suppliers 10 and 11 tie at the min (both kept); the
    # repeat (1, 10) hit collapses; supplier 12 misses the min
    assert got[["p_partkey", "s_suppkey"]].values.tolist() == \
        [[1, 10], [1, 11], [2, 10]]
    assert got["min_cents"].tolist() == [500, 500, 777]
    assert got["s_name"].tolist() == ["A", "B", "A"]


def test_late_orders_exists_counts_order_once(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.relational import late_orders_by_priority

    orders = pd.DataFrame({
        "o_orderkey": np.array([1, 2, 3], dtype=np.int64),
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
        "o_orderpriority": ["HI", "HI", "LO"]})
    li = pd.DataFrame({
        "l_orderkey": np.array([1, 1, 2, 3], dtype=np.int64),
        # order 1: TWO late lineitems -> still counts once (EXISTS);
        # order 2: exactly at the boundary (not >) -> not late;
        # order 3: one day past the 90-day grace -> late
        "l_shipdate": pd.to_datetime(
            ["2024-06-01", "2024-07-01", "2024-03-31", "2024-04-01"])})
    got = (late_orders_by_priority(ray.data.from_pandas(orders),
                                   ray.data.from_pandas(li)
                                   .repartition(2))
           .to_pandas().sort_values("o_orderpriority")
           .reset_index(drop=True))
    assert got["o_orderpriority"].tolist() == ["HI", "LO"]
    assert got["n_late_orders"].tolist() == [1, 1]


def test_mojibake_and_readability_batches():
    """Encoding-damage census and surface readability stats: exact
    integer counts and milli ratios on hand-built artifacts."""
    from doc_ocr_ray.stages.text_analysis import (mojibake_signals_batch,
                                                  readability_batch)
    double = "caf" + chr(0xC3) + chr(0xA9) + " menu"   # e-acute doubled
    b = pd.DataFrame({
        "doc_id": pd.Series([1, 2, 3, 4, 5], dtype="int64"),
        "text": ["clean text.", double,
                 "bad " + chr(0xFFFD) + " and " + chr(0x85),
                 "Two words! Three more words? ", None]})
    m = mojibake_signals_batch(b).set_index("doc_id")
    assert m.loc[1].tolist() == [0, 0, 0, 0]
    assert m.loc[2].tolist() == [0, 0, 1, 1]       # n_double
    assert m.loc[3].tolist() == [1, 1, 0, 1]       # fffd + C1
    assert m.loc[5].tolist() == [0, 0, 0, 0]       # None -> clean
    # a bare U+00C3 NOT followed by a continuation char is no signal
    solo = mojibake_signals_batch(pd.DataFrame({
        "doc_id": pd.Series([1], dtype="int64"),
        "text": [chr(0xC3) + "x"]}))
    assert solo["n_double"].tolist() == [0]

    r = readability_batch(b).set_index("doc_id")
    assert r.loc[1].tolist() == [1, 2, 10, 2000, 5000]
    assert r.loc[4, "n_sentences"] == 2            # '!' and '?' runs
    assert r.loc[4, "words_per_sent_milli"] == 2500
    assert r.loc[5].tolist() == [0, 0, 0, 0, 0]    # None -> all zero
    # '...' is ONE sentence-end run, not three
    ell = readability_batch(pd.DataFrame({
        "doc_id": pd.Series([1], dtype="int64"),
        "text": ["well... maybe."]}))
    assert ell["n_sentences"].tolist() == [2]


def test_small_qty_revenue_integer_fraction(ray_session):
    """Q17 shape: per-part avg on the integer grid, brand filter,
    strict < on the 1000*n*qty vs frac*sum inequality."""
    import ray.data
    import pyarrow as pa
    from doc_ocr_ray.pipelines.relational import small_qty_revenue

    # part 1 (brand X): qtys 1, 9 -> avg 5, 0.2*avg = 1.0; qty 1 is
    # NOT < 1.0 on the integer grid (1000*2*1 == 200*10) -> excluded.
    # part 2 (brand X): qtys 1, 99 -> 0.2*avg = 10 -> qty 1 kept.
    # part 3 (other brand) never enters.
    li = pd.DataFrame({
        "l_partkey": np.array([1, 1, 2, 2, 3], dtype=np.int64),
        "l_quantity": [1.0, 9.0, 1.0, 99.0, 1.0],
        "l_extendedprice": [10.00, 20.00, 5.50, 7.00, 99.0]})
    part = pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["X", "X", "Y"], pa.string())})
    got = small_qty_revenue(
        ray.data.from_pandas(li).repartition(3), part,
        brand="X", frac_milli=200).to_pandas()
    assert got.to_dict("records") == [{
        "p_brand": "X", "n_small": 1, "revenue_cents": 550,
        "avg_weekly_cents": 550 // 52}]


def test_late_supplier_blame_sole_late_semantics(ray_session):
    """Q21 shape: blame only the SOLE late supplier of a finished
    multi-supplier order; two late suppliers or single-supplier
    orders never blame; 'O'-status orders are ignored."""
    import ray.data
    import pyarrow as pa
    from doc_ocr_ray.pipelines.relational import late_supplier_blame

    orders = pd.DataFrame({
        "o_orderkey": np.array([1, 2, 3, 4, 5], dtype=np.int64),
        "o_orderstatus": ["F", "F", "F", "F", "O"],
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 5)})
    LATE, OK = "2024-06-01", "2024-01-15"
    li = pd.DataFrame({
        "l_orderkey": np.array(
            [1, 1, 1, 2, 2, 3, 4, 4, 5, 5], dtype=np.int64),
        "l_suppkey": np.array(
            [10, 10, 20, 10, 20, 10, 30, 40, 10, 20], dtype=np.int64),
        # order 1: supp 10 late twice (one triple), supp 20 on time ->
        #   blame 10 once; order 2: BOTH late -> nobody; order 3: one
        #   supplier only -> nobody; order 4: supp 30 late, 40 ok ->
        #   blame 30; order 5: status O -> ignored entirely
        "l_shipdate": pd.to_datetime(
            [LATE, LATE, OK, LATE, LATE, LATE, LATE, OK, LATE, OK])})
    sup = pa.table({
        "s_suppkey": pa.array([10, 20, 30, 40], pa.int64()),
        "s_name": pa.array(["S10", "S20", "S30", "S40"], pa.string())})
    got = (late_supplier_blame(ray.data.from_pandas(li).repartition(3),
                               ray.data.from_pandas(orders), sup)
           .to_pandas().sort_values("s_name").reset_index(drop=True))
    assert got.to_dict("records") == [
        {"s_name": "S10", "numwait": 1},
        {"s_name": "S30", "numwait": 1}]


def test_copurchase_pairs_distinct_within_basket(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.relational import copurchase_pairs

    li = pd.DataFrame({
        "l_orderkey": np.array([1, 1, 1, 2, 2, 2], dtype=np.int64),
        # part 7 twice in order 1 -> pair (7, 8) counted ONCE there
        "l_partkey": np.array([7, 7, 8, 7, 8, 9], dtype=np.int64)})
    got = (copurchase_pairs(ray.data.from_pandas(li).repartition(3),
                            k=2)
           .to_pandas())
    # (7,8) in both baskets; ties below broken by (p1, p2)
    assert got[["p1", "p2", "n"]].values.tolist() == \
        [[7, 8, 2], [7, 9, 1]]


def test_week_over_week_lag_across_gap(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import week_over_week

    ev = pd.DataFrame({
        "event_type": ["a"] * 4 + [None],
        # weeks 0, 0, 1, 3 of the epoch grid (gap at week 2)
        "ts": pd.to_datetime(["1970-01-01", "1970-01-07",
                              "1970-01-08", "1970-01-22",
                              "1970-01-02"])})
    got = (week_over_week(ray.data.from_pandas(ev).repartition(2))
           .to_pandas().sort_values("week").reset_index(drop=True))
    assert got["week"].tolist() == [0, 1, 3]
    assert got["n"].tolist() == [2, 1, 1]
    # lag semantics: week 3's reference is week 1 (last OBSERVED)
    assert got["prev_n"].tolist() == [0, 2, 1]
    assert got["delta"].tolist() == [2, -1, 0]


def test_ivm_refresh_merges_base_and_delta(ray_session):
    import ray.data
    from doc_ocr_ray.stages.catalog import ivm_refresh

    base = pd.DataFrame({"event_type": ["a", "b"],
                         "n": np.array([3, 1], dtype=np.int64),
                         "sum_cents": np.array([300, 50],
                                               dtype=np.int64)})
    delta = pd.DataFrame({
        "event_type": ["a", "c", None],
        "value": [1.00, 2.00, 9.99]})
    got = (ivm_refresh(ray.data.from_pandas(base),
                       ray.data.from_pandas(delta).repartition(2))
           .to_pandas().sort_values("event_type")
           .reset_index(drop=True))
    # a merges, b passes through untouched, c appears, NULL drops
    assert got["event_type"].tolist() == ["a", "b", "c"]
    assert got["n"].tolist() == [4, 1, 1]
    assert got["sum_cents"].tolist() == [400, 50, 200]


def test_supplier_variety_distinct_and_blocklist(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.relational import supplier_variety

    li = pd.DataFrame({
        "l_partkey": np.array([1, 1, 1, 2, 2], dtype=np.int64),
        # supplier 10 twice for part 1 -> counted once; 13 blocked
        "l_suppkey": np.array([10, 10, 13, 10, 11], dtype=np.int64)})
    part = pd.DataFrame({
        "p_partkey": np.array([1, 2], dtype=np.int64),
        "p_brand": ["X", "X"]})
    got = (supplier_variety(ray.data.from_pandas(li).repartition(2),
                            ray.data.from_pandas(part),
                            excluded_suppkeys=[13], num_partitions=2)
           .to_pandas())
    # brand X: suppliers {10, 11} (13 excluded, dup 10 collapsed)
    assert got["p_brand"].tolist() == ["X"]
    assert got["n_suppliers"].tolist() == [2]


def test_sample_k_per_group_exact_k_and_determinism(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.curate import sample_k_per_group

    docs = pd.DataFrame({
        "doc_id": list(range(30)),
        "source": ["big"] * 25 + ["tiny"] * 3 + [None] * 2})
    a = (sample_k_per_group(ray.data.from_pandas(docs)
                            .repartition(3), k=5)
         .to_pandas().sort_values(["source", "rank_hex"])
         .reset_index(drop=True))
    # exact k for the big group, everything for the small, NULL drops
    assert (a["source"] == "big").sum() == 5
    assert (a["source"] == "tiny").sum() == 3
    # determinism: a different partitioning yields the same sample
    b = (sample_k_per_group(ray.data.from_pandas(docs)
                            .repartition(7), k=5)
         .to_pandas().sort_values(["source", "rank_hex"])
         .reset_index(drop=True))
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_gram_matrix_exact_small_case(ray_session):
    import ray.data
    from doc_ocr_ray.stages.similarity import gram_matrix

    vecs = pd.DataFrame({"embedding": [
        np.array([1.0, 2.0], dtype=np.float32),
        np.array([0.5, -1.0], dtype=np.float32)]})
    got = (gram_matrix(ray.data.from_pandas(vecs).repartition(2),
                       grid=100)
           .to_pandas().sort_values(["i", "j"]).reset_index(drop=True))
    # q = [[100, 200], [50, -100]]: upper triangle of Q^T Q
    assert got[["i", "j"]].values.tolist() == [[1, 1], [1, 2], [2, 2]]
    assert got["s"].tolist() == [100*100 + 50*50,
                                 100*200 + 50*(-100),
                                 200*200 + (-100)*(-100)]


def test_week_over_week_pre_epoch_floor_parity(ray_session):
    import duckdb
    import ray.data
    import __ray_entry__ as entrymod
    from doc_ocr_ray.pipelines.events import week_over_week

    ev = pd.DataFrame({
        "event_type": ["a", "a", "a"],
        # 1969-12-28 is BEFORE the epoch: floor lands it in week -1,
        # truncation would say week 0 — this pins the floor contract
        "ts": pd.to_datetime(["1969-12-28", "1970-01-02",
                              "1970-01-09"])})
    got = (week_over_week(ray.data.from_pandas(ev))
           .to_pandas().sort_values("week").reset_index(drop=True))
    assert got["week"].tolist() == [-1, 0, 1]
    con = duckdb.connect()
    con.register("events", ev)
    want = (con.sql(entrymod.oracle_sql()["week_over_week"]).df()
            .sort_values("week").reset_index(drop=True))
    assert got["week"].tolist() == want["week"].tolist()
    assert got["prev_n"].tolist() == want["prev_n"].tolist()


def test_min_cost_supplier_unknown_supplier_drops(ray_session):
    import ray.data
    import pyarrow as pa
    from doc_ocr_ray.pipelines.relational import min_cost_supplier

    li = pd.DataFrame({
        "l_partkey": np.array([1, 1], dtype=np.int64),
        # supplier 99 is absent from the dimension; it holds the min,
        # so part 1 vanishes entirely (inner-join parity), leaving
        # only the known supplier's non-min row OUT as well
        "l_suppkey": np.array([99, 10], dtype=np.int64),
        "l_extendedprice": [1.00, 2.00]})
    sup = pa.table({"s_suppkey": pa.array([10], pa.int64()),
                    "s_name": ["A"]})
    got = min_cost_supplier(ray.data.from_pandas(li), sup).to_pandas()
    assert len(got) == 0


def test_copurchase_pairs_empty_candidates(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.relational import copurchase_pairs

    # single-item baskets -> zero pairs -> typed empty result
    li = pd.DataFrame({
        "l_orderkey": np.array([1, 2], dtype=np.int64),
        "l_partkey": np.array([7, 8], dtype=np.int64)})
    got = copurchase_pairs(ray.data.from_pandas(li), k=5)
    assert got.num_rows == 0
    assert got.column_names == ["p1", "p2", "n"]


def test_hard_negatives_label_mask(ray_session):
    import ray.data
    from doc_ocr_ray.stages.similarity import hard_negatives

    # anchor 0 (label 0): vec 1 is nearly identical but SAME label ->
    # excluded; vec 2 (different label, orthogonal-ish) must win
    vecs = pd.DataFrame({
        "vec_id": np.array([0, 1, 2, 3], dtype=np.int64),
        "label": np.array([0, 0, 1, 1], dtype=np.int64),
        "embedding": [np.array([1.0, 0.0], dtype=np.float32),
                      np.array([0.99, 0.01], dtype=np.float32),
                      np.array([0.5, 0.5], dtype=np.float32),
                      np.array([0.0, 1.0], dtype=np.float32)]})
    got = (hard_negatives(ray.data.from_pandas(vecs).repartition(2),
                          query_ids=[0], k=2).to_pandas())
    assert got["query_id"].tolist() == [0, 0]
    assert got["vec_id"].tolist() == [2, 3]   # never the same-label 1
    assert got["rank"].tolist() == [1, 2]


def test_search_snippets_window_and_earliest_term(ray_session):
    import ray.data
    from doc_ocr_ray.stages.text_analysis import search_snippets

    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["a b c d e f JOIN h i j k l hash",
                 "nothing relevant here at all"]})
    got = search_snippets(ray.data.from_pandas(docs),
                          ["hash", "join"], k=5, window=2)
    # earliest term occurrence wins (join at idx 6, hash at idx 12);
    # lowercase normalization applies; window clips at both ends
    assert got["doc_id"].tolist() == [1]
    assert got["snippet"].tolist() == ["e f join h i"]


def test_unpivot_reshape_and_dtype_guard(ray_session):
    import ray.data
    import pytest
    from doc_ocr_ray.pipelines.relational import unpivot

    df = pd.DataFrame({
        "id": np.array([1, 2], dtype=np.int64),
        "a": np.array([10, 20], dtype=np.int64),
        "b": np.array([30, 40], dtype=np.int64)})
    got = (unpivot(ray.data.from_pandas(df), ["id"], ["a", "b"],
                   var_name="m", value_name="v")
           .to_pandas().sort_values(["id", "m"]).reset_index(drop=True))
    assert got.values.tolist() == [[1, "a", 10], [1, "b", 30],
                                   [2, "a", 20], [2, "b", 40]]

    mixed = df.assign(b=df["b"].astype("float64"))
    with pytest.raises(Exception):
        unpivot(ray.data.from_pandas(mixed), ["id"],
                ["a", "b"]).to_pandas()


def test_count_anomalies_full_window_gate_and_burst(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import count_anomalies

    # type a: hours 0..3 quiet (1 each), hour 4 bursts to 9 -> flag;
    # hour 1 (n=1 vs partial trail 1) must NOT flag (window not full)
    ts = (["1970-01-01 00:30"] + ["1970-01-01 01:30"]
          + ["1970-01-01 02:30"] + ["1970-01-01 03:30"]
          + ["1970-01-01 04:30"] * 9)
    ev = pd.DataFrame({"event_type": ["a"] * len(ts),
                       "ts": pd.to_datetime(ts)})
    got = (count_anomalies(ray.data.from_pandas(ev).repartition(3))
           .to_pandas().sort_values("hour").reset_index(drop=True))
    assert got["n"].tolist() == [1, 1, 1, 1, 9]
    assert got["trail_sum"].tolist() == [0, 1, 2, 3, 4]
    assert got["is_anomaly"].tolist() == [False, False, False, False,
                                          True]


def test_extract_entities_order_and_index(ray_session):
    import ray.data
    from doc_ocr_ray.stages.text_analysis import extract_entities

    docs = pd.DataFrame({
        "doc_id": np.array([1], dtype=np.int64),
        "text": ["a@b.com then c@d.org and 10.0.0.1 end"]})
    got = (extract_entities(ray.data.from_pandas(docs))
           .to_pandas().sort_values(["kind", "idx"])
           .reset_index(drop=True))
    assert got[["kind", "idx", "value"]].values.tolist() == [
        ["email", 1, "a@b.com"], ["email", 2, "c@d.org"],
        ["ip", 1, "10.0.0.1"]]


def test_write_clustered_prunes_shards(ray_session, tmp_path):
    import ray.data
    from doc_ocr_ray.sources.io import (read_clustered_range,
                                        write_clustered)

    df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64),
                       "v": np.arange(1000, dtype=np.int64) * 2})
    out = str(tmp_path / "clustered")
    manifest = write_clustered(ray.data.from_pandas(df).repartition(4),
                               out, key="k", num_shards=8)
    assert sum(m["rows"] for m in manifest.values()) == 1000

    ds, n_read, n_total = read_clustered_range(out, 100, 120)
    rows = ds.to_pandas().sort_values("k")
    assert rows["k"].tolist() == list(range(100, 121))
    assert (rows["v"] == rows["k"] * 2).all()
    # the range spans ~2 of 8 shards; pruning must actually skip most
    assert n_total == 8 and n_read <= 2

    none_ds, n0, _ = read_clustered_range(out, 5000, 6000)
    assert none_ds is None and n0 == 0


def test_write_clustered_refresh_sorted_input_and_guards(
        ray_session, tmp_path):
    import ray.data
    import pytest
    from doc_ocr_ray.sources.io import (read_clustered_range,
                                        write_clustered)

    out = str(tmp_path / "c2")
    # KEY-SORTED input (the adversarial case for prefix sampling):
    # boundaries must still spread across the full key range
    df = pd.DataFrame({"k": np.arange(2000, dtype=np.int64),
                       "v": np.ones(2000, dtype=np.int64)})
    m1 = write_clustered(ray.data.from_pandas(df).repartition(8),
                         out, key="k", num_shards=8, sample_size=256)
    assert len(m1) >= 4        # not one giant shard
    _, n_read, n_total = read_clustered_range(out, 0, 100)
    assert n_read <= 2

    # refresh to the SAME path must replace, not crash
    m2 = write_clustered(ray.data.from_pandas(df.head(100)),
                         out, key="k", num_shards=4)
    assert sum(s["rows"] for s in m2.values()) == 100

    # float keys refused loudly (manifest stores exact ints)
    fdf = pd.DataFrame({"k": [1.5, 2.5], "v": [1, 2]})
    with pytest.raises(ValueError):
        write_clustered(ray.data.from_pandas(fdf),
                        str(tmp_path / "c3"), key="k")

    # empty input commits an empty-but-valid manifest
    empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                          "v": pd.Series([], dtype="int64")})
    m3 = write_clustered(ray.data.from_pandas(empty),
                         str(tmp_path / "c4"), key="k")
    assert m3 == {}
    none_ds, n0, t0 = read_clustered_range(str(tmp_path / "c4"), 0, 9)
    assert none_ds is None and n0 == 0 and t0 == 0


def test_count_anomalies_null_ts_dropped(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import count_anomalies

    ev = pd.DataFrame({
        "event_type": ["a", "a"],
        "ts": [pd.Timestamp("2024-01-01"), pd.NaT]})
    got = count_anomalies(ray.data.from_pandas(ev)).to_pandas()
    assert len(got) == 1 and got["n"].tolist() == [1]


def test_pareto_frontier_dominance_and_ties(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.relational import pareto_frontier

    part = pd.DataFrame({
        "p_partkey": np.array([1, 2, 3, 4, 5], dtype=np.int64),
        # 1: cheap+small (frontier), 2: dominated by 1 (same price,
        # smaller), 3: pricier+bigger (frontier), 4: duplicate of 3
        # (neither dominates -> BOTH on frontier), 5: dominated by 3
        "p_retailprice": [1.00, 1.00, 5.00, 5.00, 6.00],
        "p_size": np.array([10, 9, 20, 20, 19], dtype=np.int64)})
    got = (pareto_frontier(ray.data.from_pandas(part).repartition(3))
           .to_pandas().sort_values("p_partkey").reset_index(drop=True))
    assert got["p_partkey"].tolist() == [1, 3, 4]


def test_rolling_dau_window_and_dedup(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import rolling_dau

    ev = pd.DataFrame({
        "user_id": np.array([1, 1, 2, 1], dtype=np.int64),
        # user 1 active on days 0 and 0 (dup) and day 10;
        # user 2 on day 5: day-5 window [(-1)..5] catches user 1's
        # day-0?  no: 0 < 5-6 is false -> 0 IS within [5-6, 5] ->
        # wait: window_days=7 -> day 5 covers days -1..5, so day 0
        # counts; day 10 covers 4..10 -> users {1, 2}
        "ts": pd.to_datetime(["1970-01-01 01:00", "1970-01-01 09:00",
                              "1970-01-06 00:00", "1970-01-11 00:00"])})
    got = (rolling_dau(ray.data.from_pandas(ev).repartition(2))
           .to_pandas().sort_values("day").reset_index(drop=True))
    assert got["day"].tolist() == [0, 5, 10]
    assert got["n_users"].tolist() == [1, 2, 2]


def test_type_share_floor_grid(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import type_share_by_day

    ev = pd.DataFrame({
        "event_type": ["a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-01"] * 3)})
    got = (type_share_by_day(ray.data.from_pandas(ev))
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    # floor(10000*2/3) = 6666, floor(10000*1/3) = 3333
    assert got["share_bp"].tolist() == [6666, 3333]


def test_followed_by_strict_order_window_and_earliest(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import followed_by

    ev = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2, 2, 3, 3], dtype=np.int64),
        "event_type": ["view", "purchase", "purchase",
                       "purchase", "view",
                       "view", "purchase"],
        "ts": pd.to_datetime([
            "2024-01-01 10:00",   # u1 A
            "2024-01-01 10:30",   # u1 B within -> earliest B wins
            "2024-01-01 10:45",   # u1 later B ignored
            "2024-01-01 09:00",   # u2 B BEFORE its A -> no match
            "2024-01-01 10:00",   # u2 A
            "2024-01-01 08:00",   # u3 A
            "2024-01-01 09:30"])})  # u3 B at 90min -> outside window
    got = (followed_by(ray.data.from_pandas(ev).repartition(3),
                       "view", "purchase", within_minutes=60)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert got["user_id"].tolist() == [1]
    assert pd.Timestamp(got["b_us"][0], unit="us") == \
        pd.Timestamp("2024-01-01 10:30")


def test_session_stats_durations_and_max(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import session_stats

    ev = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 1], dtype=np.int64),
        "event_id": np.array([1, 2, 3, 4], dtype=np.int64),
        # session 1: two events 10 min apart; session 2 (after the
        # 30-min gap): two events at the same instant (duration 0)
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:10",
                              "2024-01-01 12:00", "2024-01-01 12:00"])})
    got = session_stats(ray.data.from_pandas(ev).repartition(2)
                        ).to_pandas()
    assert got["n_sessions"].tolist() == [2]
    assert got["total_events"].tolist() == [4]
    assert got["max_session_events"].tolist() == [2]
    assert got["total_duration_us"].tolist() == [600 * 1_000_000]


def test_invalid_transitions_user_boundary(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import invalid_transitions

    ev = pd.DataFrame({
        "user_id": np.array([1, 1, 2, 2], dtype=np.int64),
        "event_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "event_type": ["purchase", "view", "error", "error"],
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00",
                              "2024-01-01 10:00", "2024-01-01 11:00"])})
    got = (invalid_transitions(ray.data.from_pandas(ev),
                               allowed=[("view", "click")])
           .to_pandas().sort_values(["prev_type", "next_type"])
           .reset_index(drop=True))
    # user 1: purchase->view illegal; user 2: error->error illegal;
    # the u1-last -> u2-first boundary (view->error) must NOT count
    assert got[["prev_type", "next_type", "n"]].values.tolist() == [
        ["error", "error", 1], ["purchase", "view", 1]]


def test_rank_fusion_integer_points_and_union(ray_session):
    import ray.data
    from doc_ocr_ray.stages.similarity import rank_fusion

    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": ["alpha beta", "alpha", "gamma"]})
    emb = pd.DataFrame({
        "vec_id": np.array([0, 1, 2], dtype=np.int64),
        "embedding": [np.array([1.0, 0.0], dtype=np.float32),
                      np.array([0.0, 1.0], dtype=np.float32),
                      np.array([1.0, 0.1], dtype=np.float32)]})
    got = rank_fusion(ray.data.from_pandas(docs),
                      ray.data.from_pandas(emb),
                      ["alpha"], query_vec_id=0, n_candidates=2,
                      k=3).to_pandas()
    # bm25 ranks docs {0, 1}; cosine (self excluded) ranks {2, 1}.
    # doc appearing in both lists outranks single-list docs
    pts = dict(zip(got["doc_id"], got["rrf_micro"]))
    assert pts[1] == 1_000_000 // 61 + 1_000_000 // 62 \
        or pts[1] == 1_000_000 // 62 + 1_000_000 // 61
    assert got.loc[0, "doc_id"] == 1      # in both lists -> rank 1


def test_rolling_dau_null_user_day_not_observed(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import rolling_dau

    ev = pd.DataFrame({
        # day 3 exists ONLY via a NULL-user event: it must not become
        # an output day (oracle parity: observed days come from rows
        # with BOTH user_id and ts non-null)
        "user_id": pd.array([1, None], dtype="Int64"),
        "ts": pd.to_datetime(["1970-01-01", "1970-01-04"])})
    got = rolling_dau(ray.data.from_pandas(ev)).to_pandas()
    assert got["day"].tolist() == [0]


def test_behavior_strings_order_and_count(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import behavior_strings

    ev = pd.DataFrame({
        "user_id": np.array([1, 1, 2, 2, 3], dtype=np.int64),
        "event_id": np.array([2, 1, 3, 4, 5], dtype=np.int64),
        # u1: equal timestamps -> event_id breaks the tie (b then a
        # by id order: id 1 = 'b' comes first)
        "event_type": ["a", "b", "b", "a", "c"],
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:00",
                              "2024-01-01 09:00", "2024-01-01 10:00",
                              "2024-01-01 08:00"])})
    got = (behavior_strings(ray.data.from_pandas(ev).repartition(2))
           .to_pandas().sort_values("pattern").reset_index(drop=True))
    assert got[["pattern", "n_users"]].values.tolist() == [
        ["b>a", 2], ["c", 1]]


def test_anti_join_auto_dispatch_all_strategies_equal(ray_session):
    """anti_join_auto (round-4: the size-probed ladder) must return
    the same rows whichever strategy the cutovers force."""
    import ray.data
    from doc_ocr_ray.pipelines.events import anti_join_auto

    left = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                         "name": [f"c{i}" for i in range(50)]})
    right = pd.DataFrame({"rk": np.arange(0, 100, 3, dtype=np.int64)})
    want = sorted(set(left["k"]) - set(right["rk"]))

    def run(**kw):
        out = anti_join_auto(ray.data.from_pandas(left).repartition(2),
                             "k",
                             ray.data.from_pandas(right).repartition(2),
                             "rk", **kw).take_all()
        return sorted(r["k"] for r in out)

    assert run() == want                                  # broadcast
    assert run(broadcast_limit=0) == want                 # bloom
    assert run(broadcast_limit=0, bloom_limit=0) == want  # native


def test_median_value_hist_coarse_rekey_matches_sort_path(ray_session):
    """median_value_by_type_hist (round-4 re-key: coarse-hash combine
    instead of a native (type, cents) groupby sort) must equal the
    whole-group-sort twin on a multi-block testbed — the
    .repartition(2) rule for any re-keyed merge op: a (type, cents)
    partial split across blocks must sum, not dedup."""
    import ray.data
    from doc_ocr_ray.stages.sketch import (median_value_by_type,
                                           median_value_by_type_hist)
    rng = np.random.default_rng(11)
    ev = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], size=400),
        "value": np.round(rng.uniform(0, 50, size=400), 2)})
    # force duplicate (type, cents) pairs ACROSS blocks
    ev = pd.concat([ev, ev.iloc[:200]], ignore_index=True)
    ds = ray.data.from_pandas(ev).repartition(2)
    hist = (median_value_by_type_hist(ds).to_pandas()
            .sort_values("event_type").reset_index(drop=True))
    sort_twin = (median_value_by_type(ds).to_pandas()
                 .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(hist, sort_twin)


def test_mad_outliers_exact_median_and_flag(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import mad_outliers

    ev = pd.DataFrame({
        "event_id": np.arange(1, 8, dtype=np.int64),
        "event_type": ["a"] * 7,
        # cents: 100x6 + one 10000: med=100, devs {0 x6, 9900} ->
        # MAD=0 -> any nonzero deviation flags (strict >)
        "value": [1.0] * 6 + [100.0]})
    got = mad_outliers(ray.data.from_pandas(ev).repartition(3)
                       ).to_pandas()
    assert got["event_id"].tolist() == [7]
    assert got["cents"].tolist() == [10000]


def test_skipgram_pairs_window_and_canonical_order(ray_session):
    import ray.data
    from doc_ocr_ray.stages.text_analysis import skipgram_pairs

    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        # doc 1: pairs within window 2 of "z a b": (a,z),(b,z),(a,b)
        # doc 2: "c" alone pairs with nothing; doc boundary respected
        "text": ["z a b", "c"]})
    got = (skipgram_pairs(ray.data.from_pandas(docs).repartition(2),
                          window=2, k=10)
           .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True))
    assert got[["w1", "w2"]].values.tolist() == [
        ["a", "b"], ["a", "z"], ["b", "z"]]
    assert got["n"].tolist() == [1, 1, 1]


def test_mad_outliers_null_event_id_and_empty_result(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import mad_outliers

    # NULL event_id drops (oracle parity) instead of astype-crashing
    ev = pd.DataFrame({
        "event_id": pd.array([1, 2, 3, 4, 5, 6, None], dtype="Int64"),
        "event_type": ["a"] * 7,
        "value": [1.0] * 6 + [100.0]})
    got = mad_outliers(ray.data.from_pandas(ev)).to_pandas()
    assert len(got) == 0     # the only outlier had a NULL id

    # zero-outlier answer keeps its schema on the Dataset
    tight = pd.DataFrame({
        "event_id": np.arange(3, dtype=np.int64),
        "event_type": ["a"] * 3,
        "value": [1.0, 1.0, 1.0]})
    res = mad_outliers(ray.data.from_pandas(tight))
    assert res.count() == 0
    assert set(res.schema().names) == {"event_id", "event_type",
                                       "cents"}


def test_bfs_hops_min_distance_and_cleanup(ray_session):
    """Multi-source BFS: hop = MINIMUM distance from any seed (a node
    reachable at 2 via one path and 3 via another reports 2), seeds
    stay hop 0 even when re-reached, direction respected, loops and
    duplicate edges collapse, unreachable nodes absent, max_hops
    truncates; repartition forces cross-batch edge dedup."""
    import ray.data
    from doc_ocr_ray.stages.graph import bfs_hops
    # seeds {0, 10}.  0->1->2->3->4 chain; 10->2 shortcut (2 is hop 1
    # via 10, not hop 2 via 0); 3->0 back-edge (0 stays hop 0);
    # 5->6 unreachable island; dup (0,1) and loop (7,7) cleanup
    edges = pd.DataFrame({
        "src": [0, 0, 1, 2, 3, 10, 3, 5, 7],
        "dst": [1, 1, 2, 3, 4, 2, 0, 6, 7]})
    seeds = pd.DataFrame({"node": [0, 10]})
    out = (bfs_hops(ray.data.from_pandas(edges).repartition(3),
                    ray.data.from_pandas(seeds), max_hops=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    got = dict(zip(out["node"], out["hop"]))
    assert got == {0: 0, 10: 0, 1: 1, 2: 1, 3: 2, 4: 3}
    # max_hops truncation: hop-3 node 4 absent at max_hops=2
    out2 = (bfs_hops(ray.data.from_pandas(edges),
                     ray.data.from_pandas(seeds), max_hops=2)
            .to_pandas())
    assert dict(zip(out2["node"], out2["hop"])) == {
        0: 0, 10: 0, 1: 1, 2: 1, 3: 2}
    # empty seed set -> empty output, no crash
    empty = pd.DataFrame({"node": pd.Series([], dtype="int64")})
    assert bfs_hops(ray.data.from_pandas(edges),
                    ray.data.from_pandas(empty)).count() == 0


def test_important_parts_global_fraction_gate(ray_session):
    """Q11 shape: the gate compares each part's revenue against the
    GLOBAL total via the exact divmod predicate — strict inequality,
    both divmod branches (r == 0 and r > 0), cross-batch partial
    combining, empty input."""
    import ray.data
    from doc_ocr_ray.pipelines.relational import important_parts
    # part 1: 60.0 across two rows (split over batches); part 2: 30.0;
    # part 3: 10.0 -> total 100.0 = 1_000_000 tenk.  ppm=300_000
    # (30%): threshold = 300_000 * 1_000_000 / 10^6 = 300_000 tenk,
    # r == 0 branch, STRICT > keeps part 1 only (part 2 == 30% ties
    # and must drop).
    li = pd.DataFrame({
        "l_partkey": [1, 1, 2, 3],
        "l_extendedprice": [30.0, 30.0, 30.0, 10.0],
        "l_discount": [0.0, 0.0, 0.0, 0.0]})
    ds = ray.data.from_pandas(li).repartition(3)
    out = important_parts(ds, ppm=300000).to_pandas()
    assert dict(zip(out["l_partkey"], out["value_tenk"])) == {1: 600000}
    # r > 0 branch: ppm=299999 -> thr = 299999.0 -> part 2 (300000
    # tenk) now passes the >= q+1 gate, part 3 still drops
    out2 = important_parts(ray.data.from_pandas(li), ppm=299999).to_pandas()
    assert set(out2["l_partkey"]) == {1, 2}
    # empty input survives
    empty = ray.data.from_pandas(pd.DataFrame({
        "l_partkey": pd.Series([], dtype="int64"),
        "l_extendedprice": pd.Series([], dtype="float64"),
        "l_discount": pd.Series([], dtype="float64")}))
    assert important_parts(empty).count() == 0


def test_dominant_suppliers_share_gate_and_dims(ray_session):
    """Q20 shape: pair quantities combine across batches BEFORE the
    share gate (a split pair must not double-trigger), the gate is
    strict per-mille share, counts are parts-per-supplier, names ride
    the dimension broadcast."""
    import pyarrow as pa
    import ray.data
    from doc_ocr_ray.pipelines.relational import dominant_suppliers
    # part 10: supp 1 ships 3+4=7 of 10 (70% > 50%), supp 2 ships 3
    # part 20: supp 1 and 2 ship 5 each (50% NOT > 50%)
    # part 30: supp 2 ships all 8 (100%)
    li = pd.DataFrame({
        "l_partkey": [10, 10, 10, 20, 20, 30],
        "l_suppkey": [1, 1, 2, 1, 2, 2],
        "l_quantity": [3.0, 4.0, 3.0, 5.0, 5.0, 8.0]})
    supp = pa.table({"s_suppkey": [1, 2],
                     "s_name": ["alpha", "beta"],
                     "s_nationkey": [7, 9]})
    nat = pa.table({"n_nationkey": [7, 9],
                    "n_name": ["FR", "DE"]})
    out = (dominant_suppliers(
               ray.data.from_pandas(li).repartition(3), supp, nat,
               share_permille=500)
           .to_pandas().sort_values("s_suppkey")
           .reset_index(drop=True))
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == [(1, "alpha", "FR", 1), (2, "beta", "DE", 1)]


def test_split_leakage_pairs_and_empty_norm_drop(ray_session):
    """Leakage pairs = same normalized text, different split; pairs
    order doc_a < doc_b; same-split duplicates and empty-text docs
    never pair; whitespace/case variants leak (norm equality, not
    byte equality); repartition forces the cross-batch group."""
    import ray.data
    from doc_ocr_ray.pipelines.curate import split_leakage
    # Force splits via ratios on known md5 buckets: compute buckets
    # first, then pick ratios so docs straddle. Easier: use the real
    # rule and pick doc ids whose buckets differ across the 90% edge.
    import hashlib
    def bucket(i):
        return int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:8],
                   16) % 10000
    train = [i for i in range(200) if bucket(i) < 9000]
    test = [i for i in range(200) if bucket(i) >= 9500]
    a, b = train[0], test[0]           # same text, different split
    c, d_ = train[1], train[2]         # same text, SAME split
    e = test[1]                        # whitespace/case variant of a
    docs = pd.DataFrame({
        "doc_id": [a, b, c, d_, e, train[3], test[2]],
        "text": ["Shared  Text", "shared text", "twin", "twin",
                 "  SHARED\ttext ", "", ""]})
    out = (split_leakage(ray.data.from_pandas(docs).repartition(3))
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == {(min(a, b), max(a, b)), (min(a, e), max(a, e))}
    assert set(out["split_a"]) | set(out["split_b"]) == {"train", "test"}


def test_graph_ops_dedup_duplicate_nodes_and_seeds(ray_session):
    """Review fixes: duplicate node rows split across blocks must not
    shift pagerank/HITS grids (n inflation, double-counted L1 sums),
    and duplicate seeds must not duplicate bfs output rows."""
    import ray.data
    from doc_ocr_ray.stages.graph import bfs_hops, hits, pagerank
    edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 0]})
    nodes_uniq = pd.DataFrame({"node": [0, 1, 2, 3]})
    nodes_dup = pd.DataFrame({"node": [0, 1, 2, 3, 2, 0]})
    for fn, score_col in ((pagerank, "rank_scaled"),
                          (hits, "auth_scaled")):
        clean = (fn(ray.data.from_pandas(edges),
                    ray.data.from_pandas(nodes_uniq))
                 .to_pandas().sort_values("node").reset_index(drop=True))
        dup = (fn(ray.data.from_pandas(edges),
                  ray.data.from_pandas(nodes_dup).repartition(3))
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert clean.equals(dup), fn.__name__
    seeds_dup = pd.DataFrame({"node": [0, 0, 0]})
    out = (bfs_hops(ray.data.from_pandas(edges),
                    ray.data.from_pandas(seeds_dup).repartition(3))
           .to_pandas())
    assert sorted(zip(out["node"], out["hop"])) == [(0, 0), (1, 1), (2, 2)]


def test_zorder_layout_cells_and_extents(ray_session):
    """Morton cells: the interleave bounds BOTH dims per cell (the
    data-skipping property a single-column sort lacks); partials
    combine across batches; extents are in original units."""
    import ray.data
    from doc_ocr_ray.stages.catalog import zorder_layout
    # 2-bit cells (cell = top 2 bits of the 32-bit code = the two
    # dims' top quantized bits): four quadrants of the (a, b) plane
    df = pd.DataFrame({
        "a": [0, 1, 40000, 40001, 0, 40000],
        "b": [0, 2, 1, 3, 50000, 50001]})
    out = (zorder_layout(ray.data.from_pandas(df).repartition(3),
                         "a", "b", cell_bits=2)
           .to_pandas().sort_values("cell").reset_index(drop=True))
    got = {int(r["cell"]): (int(r["n_rows"]), int(r["min_a"]),
                            int(r["max_a"]), int(r["min_b"]),
                            int(r["max_b"]))
           for _, r in out.iterrows()}
    # cell bit layout: (b_top << 1) | a_top
    assert got[0] == (2, 0, 1, 0, 2)          # low-a, low-b
    assert got[1] == (2, 40000, 40001, 1, 3)  # high-a, low-b
    assert got[2] == (1, 0, 0, 50000, 50000)  # low-a, high-b
    assert got[3] == (1, 40000, 40000, 50001, 50001)
    # quantization: a narrow domain scaled onto the grid separates
    sep = (zorder_layout(ray.data.from_pandas(pd.DataFrame(
               {"a": [0, 100, 2000], "b": [0, 0, 0]})),
               "a", "b", cell_bits=2, scale_a=32)
           .to_pandas())
    assert len(sep) > 1                       # no longer all cell 0


def test_host_skew_exact_gini_and_shares(ray_session):
    """Skew report: exact integer Gini from the count-of-counts
    histogram (tie order irrelevant), top-1/top-10 shares, canonical
    host collapse (www/scheme/case/query variants are ONE host)."""
    import ray.data
    from doc_ocr_ray.stages.urls import host_skew
    # hosts: a=4 pages (via 4 canon variants), b=2, c=1, d=1
    urls = ["http://www.A.test/p1?q=1", "https://a.test/p2",
            "http://a.test/p3#f", "http://A.TEST/p4",
            "http://b.test/x", "http://www.b.test/y",
            "http://c.test/", "http://d.test/z"]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"url": pd.Series(urls, dtype="object")})).repartition(3)
    out = host_skew(ds).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_hosts"], r["n_pages"], r["max_count"]) == (4, 8, 4)
    assert r["top_share_ppm"] == 500000
    assert r["top10_share_ppm"] == 1000000     # <10 hosts: everything
    # exact Gini: sizes [1,1,2,4], n=4, total=8
    # num = sum v*(2i-n-1) over sorted = 1*(-3)+1*(-1)+2*1+4*3 = 10
    # gini_ppm = 10^6*10//(4*8) = 312500
    assert r["gini_ppm"] == 312500


def test_random_walks_deterministic_argmin(ray_session):
    """DeepWalk corpus: next hop = argmin (md5(seed|walk|step|dst),
    dst) over out-neighbours, verified against an independent pure-
    Python replay; sinks end walks early; duplicate edges and loops
    collapse; repartition forces the cross-batch edge path."""
    import hashlib
    import ray.data
    from doc_ocr_ray.stages.graph import random_walks

    edges = pd.DataFrame({
        "src": [0, 0, 0, 1, 1, 2, 4, 4, 5],
        "dst": [1, 2, 1, 2, 3, 0, 5, 5, 5]})  # dup (0,1),(4,5); loop (5,5)
    out = (random_walks(ray.data.from_pandas(edges).repartition(3),
                        walk_len=3, seed=7)
           .to_pandas())
    walks = {w: g.sort_values("step")["node"].tolist()
             for w, g in out.groupby("walk_id")}

    adj = {0: [1, 2], 1: [2, 3], 2: [0], 4: [5], 5: []}

    def replay(start):
        seq, cur = [start], start
        for t in range(1, 4):
            nbrs = adj.get(cur, [])
            if not nbrs:
                break
            cur = min(nbrs, key=lambda d: (hashlib.md5(
                f"7|{start}|{t}|{d}".encode()).hexdigest(), d))
            seq.append(cur)
        return seq

    # walks start at every non-sink node (5's only edge is its loop)
    assert set(walks) == {0, 1, 2, 4}
    for w in walks:
        assert walks[w] == replay(w), (w, walks[w], replay(w))
    # walk 4 hits sink 5 at step 1 and ends early
    assert walks[4] == [4, 5]
    # determinism: a different partitioning yields identical rows
    out2 = (random_walks(ray.data.from_pandas(edges).repartition(2),
                         walk_len=3, seed=7).to_pandas())
    a = out.sort_values(["walk_id", "step"]).reset_index(drop=True)
    b = out2.sort_values(["walk_id", "step"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_temperature_mix_alpha_half_targets(ray_session):
    """alpha=1/2 mixture: per-source targets equal the exact isqrt
    fixed-point replay, the tail is upweighted vs its raw share, the
    giant source is capped below its raw share, total kept <= total,
    and selection is partition-invariant."""
    import math
    import ray.data
    from doc_ocr_ray.pipelines.curate import temperature_mix

    # one giant source (800 docs) + 4 small ones (50 each)
    n_big, n_small = 800, 50
    rows = [{"doc_id": i, "source": "big"} for i in range(n_big)]
    rows += [{"doc_id": 10_000 + s * 1000 + i, "source": f"t{s}"}
             for s in range(4) for i in range(n_small)]
    df = pd.DataFrame(rows)
    total = 200
    out = (temperature_mix(ray.data.from_pandas(df).repartition(5),
                           total=total)
           .to_pandas())

    weights = {"big": math.isqrt(n_big * 10 ** 12),
               **{f"t{s}": math.isqrt(n_small * 10 ** 12)
                  for s in range(4)}}
    t_sum = sum(weights.values())
    targets = {s: total * w // t_sum for s, w in weights.items()}
    got = out.groupby("source")["doc_id"].count().to_dict()
    assert got == {s: t for s, t in targets.items() if t}
    assert out["doc_id"].nunique() == len(out) <= total
    # rebalancing direction: big holds 80% raw but < 70% of the mix;
    # each tail source rises above its 5% raw share
    assert got["big"] / len(out) < 0.70
    for s in range(4):
        assert got[f"t{s}"] / len(out) > 0.05
    # partition invariance
    out2 = (temperature_mix(ray.data.from_pandas(df).repartition(2),
                            total=total).to_pandas())
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_knn_graph_lsh_scores_and_gate(ray_session):
    """Approximate k-NN graph: every emitted edge's score equals the
    exact normalized cosine of that pair (bucket-local scoring is
    bit-identical to all-pairs), per-query ranks are 1..<=k with no
    duplicate neighbours, results are partition-invariant, and on a
    tightly clustered testbed the distributed recall gate passes a
    high floor."""
    import ray.data
    from doc_ocr_ray.stages.similarity import (
        knn_graph, knn_graph_lsh, graph_recall_floor)

    rng = np.random.RandomState(3)
    # 6 tight clusters of 20 vectors: LSH must find the in-cluster
    # neighbours (they share signs on almost every hyperplane)
    centers = rng.normal(size=(6, 16)) * 5
    vecs, ids = [], []
    for c in range(6):
        for i in range(20):
            vecs.append(centers[c] + rng.normal(size=16) * 0.05)
            ids.append(c * 100 + i)
    df = pd.DataFrame({"vec_id": pd.Series(ids, dtype="int64"),
                       "embedding": [v.astype("float32") for v in vecs]})
    ds = ray.data.from_pandas(df).repartition(4)
    ap = knn_graph_lsh(ds, k=3).to_pandas()
    ex = knn_graph(ds, k=3).to_pandas()

    # structural invariants
    g = ap.groupby("query_id")
    assert (g["rank"].apply(lambda r: sorted(r) ==
                            list(range(1, len(r) + 1)))).all()
    assert (g["vec_id"].nunique() == g["vec_id"].count()).all()
    # score exactness: join on (query_id, vec_id) against the exact
    # graph where the pair appears there too
    j = ap.merge(ex, on=["query_id", "vec_id"], suffixes=("_a", "_e"))
    assert len(j) > 0 and (j["score_a"] == j["score_e"]).all()
    # clustered testbed: gate clears a high floor
    gate = graph_recall_floor(knn_graph_lsh(ds, k=3),
                              knn_graph(ds, k=3), 900).to_pandas()
    assert gate.loc[0, "meets"] == 1 and gate.loc[0, "n_queries"] == 120
    # partition invariance
    ap2 = knn_graph_lsh(ray.data.from_pandas(df).repartition(7),
                        k=3).to_pandas()
    a = ap.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = ap2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_politeness_schedule_lane_and_spacing(ray_session):
    """Politeness invariants: a host maps to exactly one lane, slots
    within a host are gapless from 1 in canon_url order, offsets are
    (slot-1)*delay with the robots delay honoured and the default
    applied otherwise, duplicate canonical URLs collapse to one
    fetch, and the schedule is partition-invariant."""
    import ray.data
    from doc_ocr_ray.stages.urls import politeness_schedule

    urls = (["http://www.A.test/x", "https://a.test/y?q=1",
             "http://a.test/y",               # dup of previous
             "http://b.test/1", "http://b.test/2", "http://b.test/3"]
            + [f"http://c.test/p{i}" for i in range(4)])
    df = pd.DataFrame({"url": urls})
    delays = pd.DataFrame({"domain": ["b.test"], "delay_ms": [200]})
    out = (politeness_schedule(ray.data.from_pandas(df).repartition(3),
                               delays=delays, default_delay_ms=1000,
                               n_lanes=4)
           .to_pandas())
    # dup collapsed: a.test has x and y only
    a = out[out["domain"] == "a.test"].sort_values("canon_url")
    assert list(a["canon_url"]) == ["a.test/x", "a.test/y"]
    # one lane per host
    assert (out.groupby("domain")["lane"].nunique() == 1).all()
    assert out["lane"].between(0, 3).all()
    # gapless slots in canon_url order
    for _, g in out.groupby("domain"):
        g = g.sort_values("canon_url")
        assert list(g["slot"]) == list(range(1, len(g) + 1))
    # spacing: b.test at 200ms, others at the 1000ms default
    b = out[out["domain"] == "b.test"].sort_values("slot")
    assert list(b["fetch_offset_ms"]) == [0, 200, 400]
    c = out[out["domain"] == "c.test"].sort_values("slot")
    assert list(c["fetch_offset_ms"]) == [0, 1000, 2000, 3000]
    # partition invariance
    out2 = (politeness_schedule(ray.data.from_pandas(df).repartition(2),
                                delays=delays, default_delay_ms=1000,
                                n_lanes=4).to_pandas())
    x = out.sort_values(["domain", "slot"]).reset_index(drop=True)
    y = out2.sort_values(["domain", "slot"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(x, y[x.columns])


def test_domain_reputation_wilson_ordering(ray_session):
    """Wilson LB: a 3/3 micro-domain must rank BELOW a 9000/10000
    large domain (the raw-rate inversion the bound exists to fix);
    values match the exact integer replay; cross-batch (n, k)
    partials combine; all-fail domains land at 0."""
    import math
    import ray.data
    from doc_ocr_ray.stages.urls import domain_reputation

    rows = ([{"url": f"http://big.test/p{i}",
              "passed": 1 if i % 10 else 0} for i in range(1000)]
            + [{"url": f"http://tiny.test/p{i}", "passed": 1}
               for i in range(3)]
            + [{"url": f"http://bad.test/p{i}", "passed": 0}
               for i in range(5)])
    out = (domain_reputation(
        ray.data.from_pandas(pd.DataFrame(rows)).repartition(4))
        .to_pandas().set_index("domain"))

    def replay(n, k):
        m = (k * (n - k) * 10 ** 12) // n + 10 ** 12
        return max(0, ((k + 2) * 10 ** 6 - 2 * math.isqrt(m)) // (n + 4))

    assert out.loc["big.test", "n_docs"] == 1000
    assert out.loc["big.test", "n_pass"] == 900
    assert out.loc["big.test", "wilson_lb_ppm"] == replay(1000, 900)
    assert out.loc["tiny.test", "wilson_lb_ppm"] == replay(3, 3)
    # the inversion: tiny 100% < big 90%
    assert (out.loc["tiny.test", "wilson_lb_ppm"]
            < out.loc["big.test", "wilson_lb_ppm"])
    assert out.loc["bad.test", "wilson_lb_ppm"] == 0


def test_ks_drift_exact_and_sentinel(ray_session):
    """KS distance: identical distributions give 0, disjoint value
    ranges give 10^6, a hand-computed shift matches the integer
    replay, cross-batch histogram partials combine (repartition),
    and an empty side reports the maximal-drift sentinel."""
    import ray.data
    from doc_ocr_ray.stages.catalog import ks_drift

    def mk(vals):
        return ray.data.from_pandas(pd.DataFrame(
            {"n_chars": pd.Series(vals, dtype="int64")})).repartition(3)

    same = [10] * 5 + [20] * 5
    out = ks_drift(mk(same), mk(same)).to_pandas()
    assert out.loc[0, "ks_ppm"] == 0

    out = ks_drift(mk([1, 2, 3]), mk([10, 11, 12])).to_pandas()
    assert out.loc[0, "ks_ppm"] == 10 ** 6

    # A: half at 10, half at 20; B: all at 20 -> D = 1/2 at v=10
    out = ks_drift(mk([10, 10, 20, 20]), mk([20, 20, 20, 20])).to_pandas()
    assert out.loc[0, "ks_ppm"] == 500000
    assert out.loc[0, "n_a"] == 4 and out.loc[0, "n_b"] == 4

    empty = ray.data.from_pandas(
        pd.DataFrame({"n_chars": pd.Series([], dtype="int64")}))
    out = ks_drift(mk([1]), empty).to_pandas()
    assert out.loc[0, "ks_ppm"] == 10 ** 6 and out.loc[0, "n_b"] == 0


def test_vocab_coverage_histogram_exact(ray_session):
    """Coverage curve: hand-computable Zipf-ish corpus matches the
    exact replay at every N, N beyond the vocabulary covers all
    occurrences, ties at the N boundary are mass-exact regardless of
    which tied tokens 'win', and cross-batch counts combine."""
    import ray.data
    from doc_ocr_ray.stages.text_analysis import vocab_coverage

    # after lowercasing: a=7, c=3, b=2, d=1, e=1  (total 14)
    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": ["a a a b b c", "a a A c c d",
                                  "  a\te "]})
    out = (vocab_coverage(ray.data.from_pandas(docs).repartition(3),
                          top_ns=(1, 2, 4, 10))
           .to_pandas().set_index("top_n"))
    assert (out["total_occurrences"] == 14).all()
    assert out.loc[1, "covered_occurrences"] == 7          # a
    assert out.loc[2, "covered_occurrences"] == 10         # a + c
    # N=4: a,c,b + one of the count-1 tie {d, e} -> 13 either way
    assert out.loc[4, "covered_occurrences"] == 13
    assert out.loc[10, "covered_occurrences"] == 14        # everything
    assert out.loc[2, "covered_ppm"] == (10 * 10 ** 6) // 14


def test_robots_delays_group_semantics(ray_session):
    """Crawl-delay parse: *-group scoping (incl. multi-agent headers
    and repeated groups), first-valid-wins, strict decimal values,
    exact string->ms math, CRLF tolerance, comment strip, and the
    out-of-group directive being ignored."""
    import ray.data
    from doc_ocr_ray.stages.urls import robots_delays

    cases = {
        "plain": ("User-agent: *\nCrawl-delay: 2\nDisallow: /", 2000),
        "decimal": ("User-agent: *\nCrawl-delay: 0.1", 100),
        "truncate": ("User-agent: *\nCrawl-delay: 1.2345", 1234),
        "crlf": ("User-agent: *\r\nCrawl-delay: 3\r\n", 3000),
        "comment": ("User-agent: *\nCrawl-delay: 4 # be nice", 4000),
        "caps": ("USER-AGENT: *\nCRAWL-DELAY: 5", 5000),
        "multiagent": ("User-agent: a\nUser-agent: *\n"
                       "Crawl-delay: 6", 6000),
        "secondgroup": ("User-agent: bot\nDisallow: /\n"
                        "User-agent: *\nCrawl-delay: 7", 7000),
        "firstwins": ("User-agent: *\nCrawl-delay: 8\n"
                      "User-agent: *\nCrawl-delay: 9", 8000),
        "othergroup": ("User-agent: bot\nCrawl-delay: 1", None),
        "outofgroup": ("Crawl-delay: 1\nUser-agent: *\nDisallow:", None),
        "malformed": ("User-agent: *\nCrawl-delay: fast", None),
        "huge": ("User-agent: *\nCrawl-delay: "
                 "99999999999999999999", None),       # int64 overflow
        "zeropad": ("User-agent: *\nCrawl-delay: 0000000009", 9000),
        "trailingdot": ("User-agent: *\nCrawl-delay: 1.", None),
        "signed": ("User-agent: *\nCrawl-delay: +1", None),
        "empty": ("", None),
    }
    df = pd.DataFrame({"domain": list(cases),
                       "robots_txt": [v[0] for v in cases.values()]})
    out = (robots_delays(ray.data.from_pandas(df).repartition(3))
           .to_pandas().set_index("domain")["delay_ms"].to_dict())
    want = {k: v[1] for k, v in cases.items() if v[1] is not None}
    assert out == want


def test_url_templates_trap_detection(ray_session):
    """Template mining: digit runs collapse wherever they appear in
    the path, query params vanish before templating, path-less URLs
    template to '/', top-k ranks tie-break template-ascending, the
    share grid is exact, and cross-batch counts combine."""
    import ray.data
    from doc_ocr_ray.stages.urls import url_templates

    urls = ([f"http://www.Shop.test/item{i}/page{i % 3}?sess={i}"
             for i in range(8)]                    # /item#/page# x8
            + [f"http://shop.test/cat{i}" for i in range(4)]
            + ["http://shop.test/about", "https://shop.test"]
            + [f"http://tiny.test/x{i}" for i in range(2)])
    out = (url_templates(
        ray.data.from_pandas(pd.DataFrame({"url": urls}))
        .repartition(4), k=2)
        .to_pandas())
    shop = out[out["domain"] == "shop.test"].set_index("template")
    # 14 shop pages: item template 8, cat template 4, about 1, '/' 1
    assert shop.loc["/item#/page#", "cnt"] == 8
    assert shop.loc["/item#/page#", "tpl_rank"] == 1
    assert shop.loc["/item#/page#", "share_ppm"] == 8 * 10 ** 6 // 14
    assert shop.loc["/cat#", "cnt"] == 4
    assert shop.loc["/cat#", "tpl_rank"] == 2
    assert len(shop) == 2                          # k=2 cap
    tiny = out[out["domain"] == "tiny.test"]
    assert tiny.iloc[0]["template"] == "/x#"
    assert tiny.iloc[0]["share_ppm"] == 10 ** 6


def test_walk_skipgrams_window_pairs(ray_session):
    """Skip-gram pairs over walks: a single deterministic path walk
    yields exactly the window-2 symmetric pairs with multiplicity,
    and pair counts are partition-invariant."""
    import ray.data
    from doc_ocr_ray.stages.graph import walk_skipgrams, random_walks

    # chain 0->1->2->3 (each node one out-edge -> walks are forced)
    edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    out = (walk_skipgrams(ray.data.from_pandas(edges).repartition(2),
                          walk_len=3, window=2)
           .to_pandas())
    got = {(r.center, r.context): r.cnt for r in out.itertuples()}
    # walks: [0,1,2,3], [1,2,3], [2,3]
    walks = [[0, 1, 2, 3], [1, 2, 3], [2, 3]]
    want = {}
    for wk in walks:
        for i in range(len(wk)):
            for j in range(len(wk)):
                if i != j and abs(i - j) <= 2:
                    want[(wk[i], wk[j])] = want.get((wk[i], wk[j]), 0) + 1
    assert got == want
    out2 = (walk_skipgrams(ray.data.from_pandas(edges).repartition(3),
                           walk_len=3, window=2).to_pandas())
    assert {(r.center, r.context): r.cnt
            for r in out2.itertuples()} == want


def test_pair_recall_floor_gate(ray_session):
    """Pair-set recall gate: exact hit counting under duplicated and
    split-across-batch pair rows, meets flips at the floor, and an
    empty truth set passes vacuously."""
    import ray.data
    from doc_ocr_ray.stages.dedup import pair_recall_floor

    def mk(pairs, rep=1):
        df = pd.DataFrame(pairs * rep, columns=["doc_a", "doc_b"])
        return ray.data.from_pandas(df.astype("int64")).repartition(3)

    truth = mk([(1, 2), (3, 4), (5, 6), (7, 8)])
    approx = mk([(1, 2), (3, 4), (5, 6), (9, 10)], rep=2)  # dup rows
    # recall = 3/4 = 750 milli
    g = pair_recall_floor(approx, truth, 750).to_pandas()
    assert (g.loc[0, "n_truth"], g.loc[0, "meets"]) == (4, 1)
    assert pair_recall_floor(approx, truth, 751).to_pandas() \
        .loc[0, "meets"] == 0
    empty = mk([(1, 2)]).filter(lambda r: False)
    g = pair_recall_floor(approx, empty, 1000).to_pandas()
    assert (g.loc[0, "n_truth"], g.loc[0, "meets"]) == (0, 1)
