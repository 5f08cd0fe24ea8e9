"""Tests: IVF similarity and connected-components dedup clustering."""
import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def test_knn_ivf_recall_vs_brute():
    import ray.data
    from doc_ocr_ray.stages.similarity import knn_brute, knn_ivf
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    ds = ray.data.from_pandas(df)
    qids = list(range(10))
    brute = {}
    for r in knn_brute(ds, qids, k=5).to_pylist():
        brute.setdefault(r["query_id"], []).append(r["vec_id"])
    ivf = {}
    for r in knn_ivf(ds, qids, k=5, n_centroids=8, nprobe=3).to_pylist():
        ivf.setdefault(r["query_id"], []).append(r["vec_id"])
    # top-1 recall@5: ivf's best hit should be in brute's top-5 usually
    hits = sum(1 for q in qids if ivf.get(q) and ivf[q][0] in brute[q])
    assert hits >= 6
    # deterministic
    ivf2 = {}
    for r in knn_ivf(ds, qids, k=5, n_centroids=8, nprobe=3).to_pylist():
        ivf2.setdefault(r["query_id"], []).append(r["vec_id"])
    assert ivf == ivf2


def test_knn_ivf_full_probe_equals_brute():
    """nprobe == n_centroids probes every cell -> exact results."""
    import ray.data
    from doc_ocr_ray.stages.similarity import knn_brute, knn_ivf
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    ds = ray.data.from_pandas(df)
    qids = [0, 1, 2]
    brute = knn_brute(ds, qids, k=4).to_pylist()
    ivf = knn_ivf(ds, qids, k=4, n_centroids=4, nprobe=4).to_pylist()
    assert [(r["query_id"], r["rank"], r["vec_id"]) for r in brute] == \
           [(r["query_id"], r["rank"], r["vec_id"]) for r in ivf]


def test_ann_recall_and_floor_gate():
    """ann_recall / ann_recall_floor (round-2 verdict item 8): exact
    per-query arithmetic, missing-query handling, and the one-row
    oracle gate flipping when recall sinks below the floor."""
    import ray.data
    import pyarrow as pa
    from doc_ocr_ray.stages.similarity import (ann_recall,
                                               ann_recall_floor,
                                               knn_brute, knn_lsh)

    def topk(rows):
        q, v = zip(*rows)
        return pa.table({
            "query_id": pa.array(q, pa.int64()),
            "rank": pa.array([1] * len(q), pa.int64()),
            "vec_id": pa.array(v, pa.int64()),
            "score": pa.array([0.5] * len(q), pa.float64())})

    exact = topk([(0, 10), (0, 11), (1, 20), (1, 21), (2, 30)])
    approx = topk([(0, 10), (0, 99), (1, 20), (1, 21)])  # q2 missing
    d = ann_recall(approx, exact).to_pandas().set_index("query_id")
    assert d.loc[0, "n_hit"] == 1 and d.loc[0, "recall_milli"] == 500
    assert d.loc[1, "recall_milli"] == 1000
    assert d.loc[2, "n_hit"] == 0 and d.loc[2, "recall_milli"] == 0
    # mean = (500+1000+0)//3 = 500: gate passes at 500, fails at 501
    assert ann_recall_floor(approx, exact, 500).to_pylist() == \
        [{"n_queries": 3, "floor_milli": 500, "meets": 1}]
    assert ann_recall_floor(approx, exact, 501).to_pylist() == \
        [{"n_queries": 3, "floor_milli": 501, "meets": 0}]

    # end-to-end through the real LSH path on testdata: the gate row
    # the driver hashes is deterministic run-to-run
    ds = ray.data.from_pandas(pd.read_parquet(f"{SF}/embeddings.parquet"))
    qids = list(range(10))
    ex = knn_brute(ds, qids, k=5)
    ap = knn_lsh(ds, qids, k=5, n_bits=6, probe_hamming=1)
    g1 = ann_recall_floor(ap, ex, 700).to_pylist()
    g2 = ann_recall_floor(
        knn_lsh(ds, qids, k=5, n_bits=6, probe_hamming=1), ex,
        700).to_pylist()
    assert g1 == g2 == [{"n_queries": 10, "floor_milli": 700,
                         "meets": 1}]


def test_dedup_clusters_transitive():
    """A-B and B-C duplicate pairs must land in ONE cluster labeled by
    the min id (keep-min pruning alone would miss A-C transitivity)."""
    import ray.data
    from doc_ocr_ray.stages.dedup import dedup_clusters
    pairs = ray.data.from_pandas(pd.DataFrame({
        "doc_a": [1, 2, 10, 20],
        "doc_b": [2, 3, 11, 21],
    }))
    out = {r["doc_id"]: r["cluster"] for r in dedup_clusters(pairs).take_all()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dedup_clusters_chain():
    """A long chain converges (propagation, not single-hop)."""
    import ray.data
    from doc_ocr_ray.stages.dedup import dedup_clusters
    n = 12
    pairs = ray.data.from_pandas(pd.DataFrame({
        "doc_a": list(range(n - 1)),
        "doc_b": list(range(1, n)),
    }))
    out = {r["doc_id"]: r["cluster"] for r in dedup_clusters(pairs).take_all()}
    assert set(out.values()) == {0} and len(out) == n


def test_dedup_clusters_chain_100k():
    """Pathological 10^5-node chain (diameter = n): pointer jumping
    must converge in O(log n) distributed rounds with NO graph-sized
    driver materialization — the label table stays in the object store
    and only the scalar changed-count reaches the driver."""
    import ray.data
    from doc_ocr_ray.stages.dedup import dedup_clusters
    n = 100_000
    pairs = ray.data.from_pandas(pd.DataFrame({
        "doc_a": list(range(n - 1)),
        "doc_b": list(range(1, n)),
    }))
    df = dedup_clusters(pairs).to_pandas()
    assert len(df) == n
    assert (df["cluster"] == 0).all()


def test_embedding_neardup_injected_pairs():
    """Injected perturbed copies MUST all surface as near-dup pairs
    (multi-band recall), with no false positives at threshold 0.95."""
    import numpy as np
    import ray.data
    from doc_ocr_ray.stages.similarity import embedding_neardup_pairs
    rng = np.random.RandomState(3)
    base = rng.normal(size=(60, 16))
    ids = list(range(60))
    pert_ids = [i + 1000 for i in range(15)]
    pert = base[:15] + 0.01
    df = pd.DataFrame({
        "vec_id": ids + pert_ids,
        "embedding": [list(v) for v in base] + [list(v) for v in pert],
    })
    out = embedding_neardup_pairs(ray.data.from_pandas(df),
                                  threshold=0.95).take_all()
    got = sorted((r["vec_a"], r["vec_b"]) for r in out)
    assert got == [(i, i + 1000) for i in range(15)]
    for r in out:
        assert r["score"] >= 0.95


def test_embedding_neardup_bits_scale_with_corpus():
    """bits_per_band derives from corpus size: larger corpora get more
    bits (smaller buckets), preventing the fixed-width O(n^2) blow-up."""
    import numpy as np
    import ray.data
    from doc_ocr_ray.stages.similarity import embedding_neardup_pairs
    rng = np.random.RandomState(5)

    def make(n):
        return ray.data.from_pandas(pd.DataFrame({
            "vec_id": list(range(n)),
            "embedding": [list(v) for v in rng.normal(size=(n, 8))],
        }))

    # not asserting internals directly: with target_bucket=4, a 64-row
    # corpus needs 4 bits (16 buckets/band) — and still returns no
    # false pairs; an 8-row corpus runs with the 2-bit floor
    assert embedding_neardup_pairs(make(8), threshold=0.99,
                                   target_bucket=4).count() == 0
    assert embedding_neardup_pairs(make(64), threshold=0.99,
                                   target_bucket=4).count() == 0


def test_label_centroids_matches_numpy():
    """Distributed M-step == driver-side numpy mean on the same grid,
    regardless of how many blocks the partial sums arrive in."""
    import numpy as np
    import ray.data
    from doc_ocr_ray.stages.similarity import label_centroids
    df = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["label", "embedding"])
    out = label_centroids(
        ray.data.from_pandas(df).repartition(7)).to_pandas()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    S = np.floor(X * 1_000_000 + 0.5).astype(np.int64)
    labels = df["label"].to_numpy()
    assert len(out) == len(np.unique(labels)) * X.shape[1]
    for lab in np.unique(labels):
        m = labels == lab
        want = np.floor(10_000 * (S[m].sum(axis=0).astype(np.float64)
                                  / (1_000_000.0 * m.sum()))) / 10_000
        got = (out[out["label"] == lab].sort_values("dim")
               ["mean_val"].to_numpy())
        assert np.array_equal(got, want)
        assert (out[out["label"] == lab]["n"] == m.sum()).all()


def test_kmeans_assign_exact_and_composes():
    """E-step: seed centroids assign to themselves at distance 0, and
    the E-step output keyed into the M-step gives one full Lloyd
    iteration without any vector riding a shuffle."""
    import numpy as np
    import ray.data
    from doc_ocr_ray.stages.similarity import kmeans_assign, label_centroids
    df = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ds = ray.data.from_pandas(df).repartition(5)
    out = kmeans_assign(ds, k=4).to_pandas().sort_values("vec_id")
    assert len(out) == len(df)
    for cid in range(4):
        row = out[out["vec_id"] == cid].iloc[0]
        assert row["centroid_id"] == cid and row["dist_scaled"] == 0
    assert set(out["centroid_id"].unique()) <= set(range(4))
    # every vector's assigned distance is the true minimum
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    S = np.floor(X * 1_000_000 + 0.5).astype(np.int64)
    d = ((S[:, None, :] - S[None, :4, :]) ** 2).sum(axis=2)
    want = d.argmin(axis=1)
    got = out.sort_values("vec_id")["centroid_id"].to_numpy()
    assert np.array_equal(got, want)
    # one Lloyd iteration: relabel with the E-step output, M-step means
    lab = dict(zip(out["vec_id"], out["centroid_id"]))
    df2 = df.copy()
    df2["label"] = df2["vec_id"].map(lab)
    cent = label_centroids(
        ray.data.from_pandas(df2[["label", "embedding"]])).to_pandas()
    assert len(cent) == len(set(lab.values())) * X.shape[1]


def test_semdedup_drops_injected_copies():
    """Every perturbed copy that lands in its base's cluster is
    pruned; all base vectors survive (no base-base pair reaches the
    0.95 cosine threshold on random embeddings)."""
    import numpy as np
    import ray.data
    from doc_ocr_ray.stages.similarity import semdedup_prune
    df = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    df = df[df["vec_id"] < 60].reset_index(drop=True)
    df["embedding"] = df["embedding"].map(
        lambda v: np.asarray(v, dtype=np.float64))
    pert = df.copy()
    pert["vec_id"] = pert["vec_id"] + 1_000_000
    pert["embedding"] = pert["embedding"].map(lambda v: v + 0.01)
    both = pd.concat([df, pert], ignore_index=True)
    both["embedding"] = both["embedding"].map(list)
    ds = ray.data.from_pandas(both).repartition(4)
    out = semdedup_prune(ds, threshold=0.95, k=8).to_pandas()
    ids = set(out["vec_id"])
    assert set(range(60)) <= ids            # all bases survive
    # a copy survives ONLY if it was assigned a different cluster
    # than its base (boundary case) — same-cluster copies are pruned
    by_id = dict(zip(out["vec_id"], out["centroid_id"]))
    for b in range(60):
        c = b + 1_000_000
        if c in ids:
            assert by_id[c] != by_id.get(b)
    assert len(out) < len(both)             # something was pruned


def test_kmeans_fit_matches_numpy_replay():
    """The distributed 5-round Lloyd loop reproduces a single-process
    numpy replay bit for bit: integer-grid distances + grid-snapped
    means make the trajectory independent of batching/parallelism."""
    import numpy as np
    import ray.data
    from doc_ocr_ray.stages.similarity import kmeans_fit
    df = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = kmeans_fit(ray.data.from_pandas(df).repartition(6),
                     k=4, iters=5).to_pandas()

    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    order = np.argsort(df["vec_id"].to_numpy())
    X = X[order]
    C = X[:4].copy()
    cids = np.arange(4, dtype=np.int64)
    counts = np.zeros(4, dtype=np.int64)
    S = np.floor(X * 1_000_000 + 0.5).astype(np.int64)
    for _ in range(5):
        Cs = np.floor(C * 1_000_000 + 0.5).astype(np.int64)
        d = ((S[:, None, :] - Cs[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        present = np.unique(lab)            # drop-empty-clusters Lloyd
        new_C = np.empty((len(present), X.shape[1]))
        counts = np.zeros(len(present), dtype=np.int64)
        for i, c in enumerate(present):
            m = lab == c
            counts[i] = m.sum()
            new_C[i] = np.floor(10_000 * (S[m].sum(axis=0).astype(np.float64)
                                          / (1_000_000.0 * m.sum()))) / 10_000
        C, cids = new_C, cids[present]
    got = out.sort_values(["label", "dim"])
    assert np.array_equal(got["label"].unique(), cids)
    assert np.array_equal(got["mean_val"].to_numpy(), C.ravel())
    assert np.array_equal(
        got.groupby("label")["n"].first().to_numpy(), counts)


def test_kmeans_fit_drops_empty_cluster():
    """A duplicate seed vector ties every point to the smaller cid, so
    the larger-cid cluster empties in round 1 and is dropped — the
    drop-empty-clusters semantics the SQL twin computes."""
    import numpy as np
    import ray.data
    from doc_ocr_ray.stages.similarity import kmeans_fit
    rng = np.random.RandomState(3)
    X = rng.normal(size=(12, 8))
    X[1] = X[0]                       # seed 1 duplicates seed 0
    df = pd.DataFrame({"vec_id": np.arange(12, dtype="int64"),
                       "embedding": [list(map(float, v)) for v in X]})
    out = kmeans_fit(ray.data.from_pandas(df).repartition(3),
                     k=3, iters=2).to_pandas()
    labels = set(out["label"].unique())
    assert 1 not in labels            # duplicate-seed cluster dropped
    assert labels <= {0, 2} and len(out) == len(labels) * 8
    assert (out["n"] > 0).all()


def test_triangle_count_k4_and_noise(ray_session):
    import pandas as pd
    import ray.data
    from doc_ocr_ray.stages.graph import triangle_count

    # K4 on {0,1,2,3} (4 triangles), given as DIRECTED dupes + loops,
    # plus a pendant edge and an isolated edge (no new triangles)
    e = pd.DataFrame({
        "src": [0, 1, 0, 2, 0, 3, 1, 2, 1, 3, 2, 3, 3, 0, 4, 8],
        "dst": [1, 0, 2, 0, 3, 0, 2, 1, 3, 1, 3, 2, 3, 4, 5, 9]})
    out = triangle_count(ray.data.from_pandas(e)).to_pandas()
    assert out["n_triangles"].tolist() == [4]
    # CLAUDE.md dedup rule: duplicate edges SPLIT ACROSS BLOCKS must
    # still dedup (per-batch drop_duplicates is only a combiner — the
    # cross-batch dedup lives in the node-keyed group fn); tile the
    # duplicate-heavy edge list and repartition so copies of the same
    # edge land in different batches
    many = pd.concat([e] * 3, ignore_index=True)
    for parts in (2, 7):
        outp = triangle_count(
            ray.data.from_pandas(many).repartition(parts)).to_pandas()
        assert outp["n_triangles"].tolist() == [4], parts

    # triangle-free: a path
    p = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    out2 = triangle_count(ray.data.from_pandas(p)).to_pandas()
    assert out2["n_triangles"].tolist() == [0]


def test_pq_encode_matches_numpy_replay():
    """PQ codes: integer-grid argmin per (p*m)//dim subspace against
    the seed-pick sub-centroids, replayed single-process."""
    import numpy as np
    import ray.data
    from doc_ocr_ray.stages.similarity import pq_encode
    df = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ds = ray.data.from_pandas(df).repartition(4)
    out = (pq_encode(ds, m=4, n_codes=8).to_pandas()
           .sort_values(["vec_id", "sub"]).reset_index(drop=True))
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    S = np.floor(X * 1_000_000 + 0.5).astype(np.int64)
    order = df["vec_id"].to_numpy().argsort()
    S = S[order]
    dim = S.shape[1]
    subs = (np.arange(dim) * 4) // dim
    want = []
    for j in range(4):
        cols = subs == j
        d = ((S[:, None, cols] - S[None, :8, cols]) ** 2).sum(axis=2)
        want.append(d.argmin(axis=1))
    assert len(out) == 4 * len(df)
    for j in range(4):
        got = out[out["sub"] == j].sort_values("vec_id")["code"].to_numpy()
        assert np.array_equal(got, want[j])


def test_pq_search_adc_replay_and_recall():
    import numpy as np
    import ray.data
    from doc_ocr_ray.stages.similarity import pq_search, knn_brute
    df = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ds = ray.data.from_pandas(df).repartition(4)
    qids = list(range(6))
    res = pq_search(ds, qids, k=5, m=4, n_codes=8).to_pylist()
    # single-process ADC replay: encode everything, LUT-sum per query
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    S = np.floor(X * 1_000_000 + 0.5).astype(np.int64)
    order = df["vec_id"].to_numpy().argsort()
    S = S[order]
    dim = S.shape[1]
    subs = (np.arange(dim) * 4) // dim
    adc = np.zeros((len(qids), len(S)), dtype=np.int64)
    for j in range(4):
        cols = subs == j
        d = ((S[:, None, cols] - S[None, :8, cols]) ** 2).sum(axis=2)
        code = d.argmin(axis=1)
        lut = ((S[qids][:, None, cols] - S[None, :8, cols]) ** 2).sum(axis=2)
        adc += lut[:, code]
    want = []
    for qi, qid in enumerate(qids):
        cand = sorted((int(adc[qi, v]), v) for v in range(len(S))
                      if v != qid)[:5]
        for rank, (a, v) in enumerate(cand, start=1):
            want.append((qid, rank, v, a))
    got = [(r["query_id"], r["rank"], r["vec_id"], r["adc_scaled"])
           for r in res]
    assert got == want
    # sanity: PQ top-5 overlaps the exact cosine top-5 for most queries
    brute = {}
    for r in knn_brute(ds, qids, k=5).to_pylist():
        brute.setdefault(r["query_id"], set()).add(r["vec_id"])
    pq_top = {}
    for r in res:
        pq_top.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(1 for q in qids if pq_top[q] & brute[q])
    assert hits >= 3


def test_pq_uneven_dim_and_guards():
    """dim % m != 0: subspace boundaries come from (p*m)//dim on BOTH
    sides; m > dim is refused; empty query set returns empty."""
    import numpy as np
    import pytest as _pytest
    import ray.data
    from doc_ocr_ray.stages.similarity import pq_encode, pq_search
    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(12, 10)).round(3)
    df = pd.DataFrame({"vec_id": np.arange(12, dtype=np.int64),
                       "embedding": [list(map(float, v)) for v in vecs]})
    ds = ray.data.from_pandas(df).repartition(3)
    out = (pq_encode(ds, m=4, n_codes=3).to_pandas()
           .sort_values(["vec_id", "sub"]).reset_index(drop=True))
    S = np.floor(vecs * 1_000_000 + 0.5).astype(np.int64)
    subs = (np.arange(10) * 4) // 10
    assert [int((subs == j).sum()) for j in range(4)] == [3, 2, 3, 2]
    for j in range(4):
        cols = subs == j
        d = ((S[:, None, cols] - S[None, :3, cols]) ** 2).sum(axis=2)
        got = out[out["sub"] == j].sort_values("vec_id")["code"].to_numpy()
        assert np.array_equal(got, d.argmin(axis=1))
    with _pytest.raises(ValueError):
        pq_encode(ds, m=11, n_codes=3).to_pandas()
    empty = pq_search(ds, query_ids=[999], k=3, m=2, n_codes=3)
    assert empty.num_rows == 0


def test_pq_search_ivf_full_probe_equals_pq_and_recall():
    import ray.data
    from doc_ocr_ray.stages.similarity import pq_search, pq_search_ivf
    df = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ds = ray.data.from_pandas(df).repartition(4)
    qids = list(range(8))
    exact = pq_search(ds, qids, k=5, m=4, n_codes=8).to_pylist()
    full = pq_search_ivf(ds, qids, k=5, m=4, n_codes=8,
                         n_centroids=8, nprobe=8).to_pylist()
    key = lambda rows: [(r["query_id"], r["rank"], r["vec_id"],
                         r["adc_scaled"]) for r in rows]
    assert key(exact) == key(full)
    # pruned probing: deterministic, and every returned row's ADC is
    # present in the unpruned ranking (a subset, possibly re-ranked)
    ap1 = pq_search_ivf(ds, qids, k=5, m=4, n_codes=8,
                        n_centroids=8, nprobe=2).to_pylist()
    ap2 = pq_search_ivf(ds, qids, k=5, m=4, n_codes=8,
                        n_centroids=8, nprobe=2).to_pylist()
    assert key(ap1) == key(ap2)
    exact_pairs = {(r["query_id"], r["vec_id"], r["adc_scaled"])
                   for r in exact}
    hits = sum(1 for r in ap1 if r["rank"] == 1 and
               (r["query_id"], r["vec_id"], r["adc_scaled"])
               in exact_pairs)
    assert hits >= 3     # top-1 recall vs unpruned PQ on >= 3/8 queries
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pq_search_ivf(ds, qids, nprobe=0)


def test_search_rerank_flips_lexical_order_and_drops_unembedded():
    import ray.data
    from doc_ocr_ray.stages.similarity import search_rerank
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["hash hash hash join window",   # strongest BM25
                 "hash join",
                 "hash window join hash",
                 "nothing relevant"]}))
    emb = ray.data.from_pandas(pd.DataFrame({
        "vec_id": [99, 0, 1],                    # doc 2 unembedded
        "embedding": [[1.0, 0.0], [0.6, 0.8], [1.0, 0.0]]}))
    out = search_rerank(docs, emb, ["hash", "join", "window"],
                        query_vec_id=99, n_candidates=3, k=3).to_pylist()
    # BM25 ranks doc 0 first, but cosine puts doc 1 (identical to the
    # query) on top; the unembedded candidate 2 is dropped
    assert [(r["rank"], r["doc_id"], r["cos_sim"]) for r in out] == [
        (1, 1, 1.0), (2, 0, 0.6)]
    assert all(r["score_micro"] > 0 for r in out)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        search_rerank(docs, emb, ["hash"], query_vec_id=777)


def test_kcore_multiround_peel_and_cross_batch_dedup(ray_session):
    """Triangle 0-1-2 with a pendant chain 2-12-11-10: a 2-core peel
    needs THREE rounds (10 falls, then 11, then 12) — pins the
    iterative fixpoint, not just one filter pass.  Edges arrive as
    directed duplicates in BOTH orientations split across partitions
    (the cross-batch DISTINCT trap) plus a self-loop."""
    import pandas as pd
    import ray.data
    from doc_ocr_ray.stages.graph import kcore

    edges = pd.DataFrame({
        "src": [0, 1, 2, 2, 12, 11,   1, 0,  5],
        "dst": [1, 2, 0, 12, 11, 10,  0, 1,  5],
    })  # last three: reversed dup, exact dup, self-loop
    out = pd.DataFrame(kcore(ray.data.from_pandas(edges).repartition(3),
                             k=2, rounds=5).take_all())
    out = out.sort_values("node").reset_index(drop=True)
    assert list(out["node"]) == [0, 1, 2]
    assert list(out["deg"]) == [2, 2, 2]
    # insufficient rounds stop mid-peel: after ONE round only node 10
    # is gone, so 11 (now degree 1) is still present with its edge
    one = pd.DataFrame(kcore(ray.data.from_pandas(edges),
                             k=2, rounds=1).take_all())
    assert set(one["node"]) == {0, 1, 2, 11, 12}
    # k above the max degree empties the graph entirely
    assert kcore(ray.data.from_pandas(edges), k=5,
                 rounds=3).take_all() == []


def test_rp_project_replay_and_repartition_invariance(ray_session):
    # single-process replay of the multiply-shift sign projection,
    # and a repartition(3) run must emit the identical row set
    import numpy as np
    import ray.data
    from doc_ocr_ray.stages.similarity import rp_project, _rp_signs

    rng = np.random.RandomState(7)
    n, d, out_dim = 40, 12, 5
    X = rng.randn(n, d).astype("float32")
    rows = [{"vec_id": i, "embedding": X[i].tolist()} for i in range(n)]

    def run(ds):
        df = (rp_project(ds, out_dim=out_dim).to_pandas()
              .sort_values(["vec_id", "dim"]).reset_index(drop=True))
        return df

    got = run(ray.data.from_items(rows))
    reparted = run(ray.data.from_items(rows).repartition(3))
    pd.testing.assert_frame_equal(got, reparted)

    q = np.floor(X.astype("float64") * 1_000_000 + 0.5).astype("int64")
    expect = q @ _rp_signs(d, out_dim)
    assert got["value"].to_numpy().reshape(n, out_dim).tolist() \
        == expect.tolist()
    # sign matrix is balanced enough to be a real projection
    S = _rp_signs(64, 16)
    assert abs(int(S.sum())) < 64 * 16 // 4


def test_knn_graph_ties_self_exclusion_and_small_corpus(ray_session):
    """All-pairs kNN: ties resolve vec_id-ascending via the stable
    sort over the id-ordered corpus, self never appears, k > n-1
    yields n-1 neighbors, output is identical across partitionings
    (each batch's top-k is complete by construction)."""
    import ray.data
    from doc_ocr_ray.stages.similarity import knn_graph
    # vecs: 0 and 3 identical; 1 orthogonal-ish; 2 = negative of 0
    emb = pd.DataFrame({
        "vec_id": [0, 1, 2, 3],
        "embedding": [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [1.0, 0.0]]})
    one = (knn_graph(ray.data.from_pandas(emb), k=5)
           .to_pandas().sort_values(["query_id", "rank"])
           .reset_index(drop=True))
    two = (knn_graph(ray.data.from_pandas(emb).repartition(3), k=5)
           .to_pandas().sort_values(["query_id", "rank"])
           .reset_index(drop=True))
    assert one.equals(two)
    assert (one.groupby("query_id").size() == 3).all()   # n-1, not k
    assert not (one["query_id"] == one["vec_id"]).any()
    # query 1 sees scores (0, 0, 0) from vecs 0, 2, 3 -> tie order by id
    q1 = one[one["query_id"] == 1]
    assert list(q1["vec_id"]) == [0, 2, 3]
    # query 0's best is its twin 3 (score 1.0), then 1, then 2
    q0 = one[one["query_id"] == 0]
    assert list(q0["vec_id"]) == [3, 1, 2]
    assert list(q0["score"]) == [1.0, 0.0, -1.0]


def test_embedding_drift_counts_means_and_missing_side(ray_session):
    """Drift = L1 centroid displacement in grid units with shared
    snapshot-A centroids; clusters empty on one side report -1;
    membership counts track adds/drops; repartition exercises the
    tagged partial exchange."""
    import ray.data
    from doc_ocr_ray.stages.similarity import embedding_drift
    # centroids (vec_id < 2): c0 at (0,0), c1 at (10,10)
    a = pd.DataFrame({
        "vec_id": [0, 1, 2, 3, 4],
        "embedding": [[0.0, 0.0], [10.0, 10.0],
                      [0.2, 0.0],        # c0
                      [10.0, 10.2],      # c1
                      [0.0, 0.2]]})      # c0
    # B: drop vec 4 (c0 count 3->2), shift vec 2 to (0.4, 0.0)
    # (c0 mean moves), vec 3 unchanged, add vec 5 near c1
    b = pd.DataFrame({
        "vec_id": [0, 2, 3, 5],
        "embedding": [[0.0, 0.0], [0.4, 0.0], [10.0, 10.2],
                      [9.8, 10.0]]})
    out = (embedding_drift(ray.data.from_pandas(a).repartition(3),
                           ray.data.from_pandas(b).repartition(2), k=2)
           .to_pandas().sort_values("centroid_id")
           .reset_index(drop=True))
    got = {int(r["centroid_id"]): (int(r["n_a"]), int(r["n_b"]),
                                   int(r["drift_units"]))
           for _, r in out.iterrows()}
    # c0 A: {0,2,4} mean (0.0667.., 0.0667..) -> floor grid (666, 666)
    # c0 B: {0,2} mean (0.2, 0.0) -> (2000, 0)
    # drift = |666-2000| + |666-0| = 1334 + 666 = 2000
    assert got[0] == (3, 2, 2000)
    # c1 A: {1,3} mean (10.0, 10.1) -> (100000, 101000); B: {3,5}
    # mean (9.9, 10.1) -> (99000, 101000); drift 1000
    assert got[1] == (2, 2, 1000)
    # one-sided cluster: B empty entirely for a centroid
    b2 = pd.DataFrame({"vec_id": [0], "embedding": [[0.0, 0.0]]})
    out2 = (embedding_drift(ray.data.from_pandas(a),
                            ray.data.from_pandas(b2), k=2)
            .to_pandas().sort_values("centroid_id")
            .reset_index(drop=True))
    r1 = out2[out2["centroid_id"] == 1].iloc[0]
    assert (r1["n_a"], r1["n_b"], r1["drift_units"]) == (2, 0, -1)


def test_bitext_candidates_cross_lang_only(ray_session):
    """Bitext mining: same-language neighbors never appear (even when
    nearest), ranks re-number over cross-language hits only, tie rule
    is vec_id-ascending, k truncates."""
    import ray.data
    from doc_ocr_ray.stages.similarity import bitext_candidates
    emb = pd.DataFrame({
        "vec_id": [0, 1, 2, 3],
        "embedding": [[1.0, 0.0], [1.0, 0.0],     # 0 en, 1 en twin
                      [0.9, 0.1], [0.0, 1.0]]})   # 2 de near, 3 fr far
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "lang": ["en", "en", "de", "fr"]})
    out = (bitext_candidates(ray.data.from_pandas(emb).repartition(2),
                             ray.data.from_pandas(docs), k=2)
           .to_pandas().sort_values(["query_id", "rank"])
           .reset_index(drop=True))
    q0 = out[out["query_id"] == 0]
    # twin vec 1 (en, score 1.0) is EXCLUDED; best cross-lang is 2
    assert list(q0["vec_id"]) == [2, 3]
    assert list(q0["lang_b"]) == ["de", "fr"]
    assert list(q0["lang_a"]) == ["en", "en"]
    q2 = out[out["query_id"] == 2]            # de: all 3 others differ
    assert list(q2["vec_id"])[:1] == [0]      # tie 0 vs 1 -> lower id
    assert len(q2) == 2                       # k truncates


def test_stream_id_matrix_matches_row_assembly(ray_session):
    """The streamed corpus assembly (iter_batches -> numpy, no Python
    row list) must produce the identical id-ascending (ids, matrix)
    pair the old take_all row-dict path produced, across partitionings
    and shuffled input order; empty input yields typed empties."""
    import ray.data
    from doc_ocr_ray.stages.similarity import _stream_id_matrix
    rng = np.random.default_rng(7)
    n, d = 137, 5
    perm = rng.permutation(n)
    emb = pd.DataFrame({
        "vec_id": perm,
        "embedding": [list(map(float, rng.standard_normal(d)))
                      for _ in range(n)]})
    for parts in (1, 4):
        ds = ray.data.from_pandas(emb).repartition(parts)
        ids, X = _stream_id_matrix(ds, "vec_id", "embedding")
        assert ids.tolist() == sorted(perm.tolist())
        want = np.asarray(
            [emb.set_index("vec_id").loc[i, "embedding"] for i in ids],
            dtype=np.float64)
        assert np.array_equal(X, want)
    ids0, X0 = _stream_id_matrix(
        ray.data.from_pandas(emb.iloc[:0]), "vec_id", "embedding")
    assert ids0.size == 0 and X0.shape[0] == 0


def test_bitext_missing_lang_rows_dropped(ray_session):
    """A vector with no language row is dropped from both sides (the
    SQL twin's inner joins): never a query, never a neighbor."""
    import ray.data
    from doc_ocr_ray.stages.similarity import bitext_candidates
    emb = pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [[1.0, 0.0], [1.0, 0.1], [0.0, 1.0]]})
    docs = pd.DataFrame({"doc_id": [0, 2], "lang": ["en", "de"]})
    out = (bitext_candidates(ray.data.from_pandas(emb).repartition(2),
                             ray.data.from_pandas(docs), k=3)
           .to_pandas())
    assert 1 not in set(out["query_id"])
    assert 1 not in set(out["vec_id"])
    assert set(out["query_id"]) == {0, 2}
