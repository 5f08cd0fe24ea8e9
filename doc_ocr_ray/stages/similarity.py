"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: exact cosine top-k — the query matrix is broadcast
  once (``ray.put``), each batch does one f64 matmul and keeps a partial
  top-k, the driver merges the tiny partials.  No shuffle.
- ``knn_lsh``: random-hyperplane LSH bucketing — each vector gets a
  sign-bit code; only vectors whose code matches a query code (within
  ``probe_hamming``) are scored.  The scale path when brute force is
  too expensive; approximate by construction.
- ``embedding_neardup_pairs``: cosine near-duplicate pairs via the
  same LSH blocking.
"""
from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

from doc_ocr_ray.util import coarse_part, typed_if_empty


def _matrix(batch_col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in batch_col])


def _matrix_from_arrow(tbl: pa.Table, vec_col: str) -> np.ndarray:
    """Zero-copy-ish list<float> -> (n, dim) float64: flatten the Arrow
    list buffer once instead of converting per row."""
    col = tbl[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0))
    if isinstance(col, pa.ListArray) or isinstance(col, pa.LargeListArray):
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(n, -1)
    # Ray tensor extension array (from_pandas list columns) or fallback
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object:
        return np.stack([np.asarray(v, dtype=np.float64) for v in arr])
    return np.asarray(arr, dtype=np.float64).reshape(n, -1)


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _stream_id_matrix(ds, id_col: str, vec_col: str):
    """Stream a corpus Dataset into id-ascending ``(ids, matrix)``
    numpy arrays WITHOUT materializing Python row objects.

    The broadcast-anchor family (knn_graph, bitext_candidates) needs
    the whole corpus matrix driver-side once before ``ray.put`` — the
    documented exact-baseline envelope.  A ``take_all()`` row-dict
    assembly costs ~10x the matrix bytes in Python object overhead and
    is single-threaded dict churn; this helper instead walks
    ``iter_batches(batch_format="pyarrow")`` and converts each block
    column-wise (flat list-buffer -> (n, dim) float64), so peak driver
    memory is ~2x the final matrix (chunks + concatenate) and no
    corpus-sized Python list ever exists.  Rows are returned sorted by
    id (stable argsort) — the order the stable-argsort tie rule in the
    consumers depends on."""
    id_chunks: list = []
    vec_chunks: list = []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(
            batch_format="pyarrow", batch_size=8192):
        if b.num_rows == 0:
            continue
        id_chunks.append(b[id_col].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        vec_chunks.append(_matrix_from_arrow(b, vec_col))
    if not id_chunks:
        return np.array([], dtype=np.int64), np.empty((0, 0))
    ids = np.concatenate(id_chunks)
    X = np.concatenate(vec_chunks, axis=0)
    order = np.argsort(ids, kind="stable")
    return ids[order], X[order]


def _grab_rows_by_id(ds, ids, id_col: str):
    """Distributed row gather by id set, Arrow-side (``pc.is_in`` on
    zero-copy batches) so no-hit batches keep their exact schema —
    a pandas filter would leave empty OBJECT columns that trip Ray's
    block-size estimator and string-typing them would clash with the
    list<float> embedding schema."""
    import pyarrow.compute as pc

    qarr = pa.array(sorted(set(int(q) for q in ids)), pa.int64())

    def grab(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(
            batch[id_col], value_set=qarr.cast(batch[id_col].type)))

    return ds.map_batches(grab, batch_format="pyarrow").take_all()


def _empty_knn_table() -> pa.Table:
    return pa.table({"query_id": pa.array([], pa.int64()),
                     "rank": pa.array([], pa.int64()),
                     "vec_id": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())})


def _merge_partial_topk(partials, k: int) -> pa.Table:
    """Driver merge shared by every broadcast-anchor top-k (knn_brute,
    hard_negatives): n_q * k * n_blocks candidate rows -> ranked
    (query_id, rank, vec_id, score) with the ONE tie/rounding rule
    (score DESC, vec_id ASC; round(score, 4)) so the twins never
    drift."""
    best: dict = {}
    for r in partials:
        best.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["score"]))
    out_q, out_rank, out_v, out_s = [], [], [], []
    for qid in sorted(best):
        cand = sorted(best[qid], key=lambda t: (-t[1], t[0]))[:k]
        for rank, (vid, s) in enumerate(cand, start=1):
            out_q.append(qid); out_rank.append(rank)
            out_v.append(vid); out_s.append(round(s, 4))
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_rank, pa.int64()),
        "vec_id": pa.array(out_v, pa.int64()),
        "score": pa.array(out_s, pa.float64()),
    })


def knn_brute(ds, query_ids: List[int], k: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Exact cosine top-k of every query id against the whole corpus.

    Returns (query_id, rank, vec_id, score) with score rounded to 4
    decimals; ties break by vec_id ascending.  Self-matches excluded.
    """
    import ray

    qrows = _grab_rows_by_id(ds, query_ids, id_col)
    if not qrows:
        return _empty_knn_table()
    qrows.sort(key=lambda r: int(r[id_col]))
    q_ids = np.array([int(r[id_col]) for r in qrows])
    Q = _norm_rows(_matrix([r[vec_col] for r in qrows]))
    ref = ray.put((q_ids, Q))

    def partial_topk(batch: pa.Table) -> pd.DataFrame:
        ids, Qm = ray.get(ref)
        X = _norm_rows(_matrix_from_arrow(batch, vec_col))
        vids = batch[id_col].to_numpy()
        scores = Qm @ X.T                           # (n_q, n_batch)
        out_q, out_v, out_s = [], [], []
        kk = min(k + 1, scores.shape[1])            # +1 to survive self-drop
        for qi, qid in enumerate(ids):
            row = scores[qi]
            idx = np.argpartition(-row, kk - 1)[:kk]
            for j in idx:
                if int(vids[j]) == int(qid):
                    continue
                out_q.append(int(qid)); out_v.append(int(vids[j]))
                out_s.append(float(row[j]))
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v, "score": out_s})

    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=4096).take_all()
    # final merge: tiny (n_q * k * n_blocks rows)
    return _merge_partial_topk(partials, k)


class LshCoder:
    """Sign-bit codes from fixed random hyperplanes (seeded)."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_bits, dim))
        self.n_bits = n_bits

    def codes(self, X: np.ndarray) -> np.ndarray:
        bits = (X @ self.planes.T) > 0
        weights = (1 << np.arange(self.n_bits)).astype(np.int64)
        return bits.astype(np.int64) @ weights


def knn_lsh(ds, query_ids: List[int], k: int = 5, n_bits: int = 10,
            probe_hamming: int = 1, id_col: str = "vec_id",
            vec_col: str = "embedding") -> pa.Table:
    """Approximate cosine top-k: score only vectors whose LSH code is
    within ``probe_hamming`` of some query's code (multi-probe)."""
    import ray

    qset = set(int(q) for q in query_ids)
    qrows = ds.map_batches(lambda b: b[b[id_col].isin(qset)],
                           batch_format="pandas").take_all()
    if not qrows:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    qrows.sort(key=lambda r: int(r[id_col]))
    Q = _norm_rows(_matrix([r[vec_col] for r in qrows]))
    q_ids = np.array([int(r[id_col]) for r in qrows])
    dim = Q.shape[1]
    coder = LshCoder(dim, n_bits)
    qcodes = coder.codes(Q)
    # expand probe set: all codes within hamming distance
    probes = set(int(c) for c in qcodes)
    for _ in range(probe_hamming):
        for c in list(probes):
            for b in range(n_bits):
                probes.add(c ^ (1 << b))
    ref = ray.put((q_ids, Q, probes, coder.planes))

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids, Qm, probe_set, planes = ray.get(ref)
        X = _norm_rows(_matrix_from_arrow(batch, vec_col))
        bits = (X @ planes.T) > 0
        weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
        codes = bits.astype(np.int64) @ weights
        mask = np.array([int(c) in probe_set for c in codes])
        if not mask.any():
            return pd.DataFrame({"query_id": [], "vec_id": [], "score": []})
        Xc = X[mask]
        vids = batch[id_col].to_numpy()[mask]
        scores = Qm @ Xc.T
        out_q, out_v, out_s = [], [], []
        kk = min(k + 1, scores.shape[1])
        for qi, qid in enumerate(ids):
            row = scores[qi]
            idx = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) else np.arange(len(row))
            for j in idx:
                if int(vids[j]) == int(qid):
                    continue
                out_q.append(int(qid)); out_v.append(int(vids[j]))
                out_s.append(float(row[j]))
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v, "score": out_s})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=4096).take_all()
    best: dict = {}
    for r in partials:
        best.setdefault(r["query_id"], []).append((r["vec_id"], r["score"]))
    out_q, out_rank, out_v, out_s = [], [], [], []
    for qid in sorted(set(int(q) for q in query_ids)):
        cand = sorted(best.get(qid, []), key=lambda t: (-t[1], t[0]))[:k]
        for rank, (vid, s) in enumerate(cand, start=1):
            out_q.append(qid); out_rank.append(rank)
            out_v.append(vid); out_s.append(round(s, 4))
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_rank, pa.int64()),
        "vec_id": pa.array(out_v, pa.int64()),
        "score": pa.array(out_s, pa.float64()),
    })


def _kmeans(X: np.ndarray, k: int, iters: int = 10,
            seed: int = 11) -> np.ndarray:
    """Plain seeded Lloyd's k-means on normalized vectors (driver-side,
    runs on a SAMPLE — the classic IVF training step)."""
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ cents.T, axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def knn_ivf(ds, query_ids: List[int], k: int = 5, n_centroids: int = 16,
            nprobe: int = 3, train_sample: int = 2048,
            id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """IVF approximate top-k: train a coarse quantizer on a sample
    (driver-side k-means), then one distributed pass scores only the
    vectors whose nearest centroid is among each query's top-``nprobe``
    probed cells.  The scale path when brute force is too expensive:
    cost drops by ~n_centroids/nprobe; recall is approximate by
    construction (cross-cell neighbors are missed).
    """
    import ray

    # train on a bounded sample (never the full corpus)
    sample = ds.limit(train_sample).take_all()
    Xs = _norm_rows(_matrix([r[vec_col] for r in sample]))
    cents = _kmeans(Xs, n_centroids)

    qset = set(int(q) for q in query_ids)
    qrows = ds.map_batches(lambda b: b[b[id_col].isin(qset)],
                           batch_format="pandas").take_all()
    if not qrows:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    qrows.sort(key=lambda r: int(r[id_col]))
    q_ids = np.array([int(r[id_col]) for r in qrows])
    Q = _norm_rows(_matrix([r[vec_col] for r in qrows]))
    # per-query probed cells; the union drives the batch-side filter
    probe_cells = np.argsort(-(Q @ cents.T), axis=1)[:, :nprobe]
    probed_union = set(int(c) for c in probe_cells.ravel())
    ref = ray.put((q_ids, Q, cents, probe_cells, probed_union))

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids, Qm, C, cells, union = ray.get(ref)
        X = _norm_rows(_matrix_from_arrow(batch, vec_col))
        assign = np.argmax(X @ C.T, axis=1)
        mask = np.isin(assign, list(union))
        if not mask.any():
            return pd.DataFrame({"query_id": [], "vec_id": [], "score": []})
        Xc, Ac = X[mask], assign[mask]
        vids = batch[id_col].to_numpy()[mask]
        scores = Qm @ Xc.T
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids):
            cell_mask = np.isin(Ac, cells[qi])
            idx = np.nonzero(cell_mask)[0]
            if len(idx) == 0:
                continue
            row = scores[qi, idx]
            kk = min(k + 1, len(idx))
            top = idx[np.argpartition(-row, kk - 1)[:kk]] if kk < len(idx) else idx
            for j in top:
                if int(vids[j]) == int(qid):
                    continue
                out_q.append(int(qid)); out_v.append(int(vids[j]))
                out_s.append(float(scores[qi, j]))
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v, "score": out_s})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=4096).take_all()
    best: dict = {}
    for r in partials:
        best.setdefault(r["query_id"], []).append((r["vec_id"], r["score"]))
    out_q, out_rank, out_v, out_s = [], [], [], []
    for qid in sorted(set(int(q) for q in query_ids)):
        cand = sorted(best.get(qid, []), key=lambda t: (-t[1], t[0]))[:k]
        for rank, (vid, s) in enumerate(cand, start=1):
            out_q.append(qid); out_rank.append(rank)
            out_v.append(vid); out_s.append(round(s, 4))
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_rank, pa.int64()),
        "vec_id": pa.array(out_v, pa.int64()),
        "score": pa.array(out_s, pa.float64()),
    })


def label_centroids(ds, label_col: str = "label",
                    vec_col: str = "embedding", scale: int = 1_000_000,
                    grid: int = 10_000):
    """Per-label centroid means — the distributed M-step of Lloyd's
    k-means as a Ray Data pipeline (a "training pass" building block
    for embedding-cluster curation, e.g. SemDeDup-style pruning).

    Shape: one stateless ``map_batches`` pass emits per-batch PARTIAL
    sums — for each label present in the batch, 64 long-format rows
    ``(label, dim, sum_scaled, n)`` — so the exchange carries only
    ``n_blocks x k x dim`` tiny rows, never a vector column.  A single
    ``groupby(label)`` then combines partials per label (k groups,
    each a vectorized pandas groupby over dims).

    Oracle exactness: every component is snapped to an integer grid
    first (``floor(x * scale + 0.5)`` — explicit half-up, identical in
    DuckDB) and summed in int64, so partial-sum order cannot perturb
    the result; the single final division and ``floor``-grid to
    ``1/grid`` are one IEEE double op each, bit-identical in both
    engines.  int64 headroom: |component| <= ~1e3 scaled by 1e6 keeps
    per-label sums exact up to ~1e9 rows per label per dim; raise the
    combiner to Python ints if a corpus exceeds that.
    """
    import numpy as np

    def partial(batch: pa.Table) -> pd.DataFrame:
        X = _matrix_from_arrow(batch, vec_col)
        if X.size == 0:
            return pd.DataFrame({label_col: pd.Series([], dtype="int64"),
                                 "dim": pd.Series([], dtype="int64"),
                                 "sum_scaled": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        S = np.floor(X * scale + 0.5).astype(np.int64)
        labels = batch[label_col].to_numpy()
        dim = S.shape[1]
        uniq = np.unique(labels)
        out_l, out_d, out_s, out_n = [], [], [], []
        for lab in uniq:
            mask = labels == lab
            sums = S[mask].sum(axis=0)
            out_l.append(np.full(dim, lab, dtype=np.int64))
            out_d.append(np.arange(dim, dtype=np.int64))
            out_s.append(sums)
            out_n.append(np.full(dim, int(mask.sum()), dtype=np.int64))
        return pd.DataFrame({label_col: np.concatenate(out_l),
                             "dim": np.concatenate(out_d),
                             "sum_scaled": np.concatenate(out_s),
                             "n": np.concatenate(out_n)})

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        agg = (group.groupby("dim", sort=True)[["sum_scaled", "n"]]
                    .sum().reset_index())
        mean = np.floor(grid * (agg["sum_scaled"].to_numpy(np.float64)
                                / (float(scale) * agg["n"].to_numpy(np.float64)))) / grid
        return pd.DataFrame({label_col: group[label_col].iloc[0],
                             "dim": agg["dim"].astype("int64"),
                             "mean_val": mean,
                             "n": agg["n"].astype("int64")})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(label_col)
              .map_groups(combine, batch_format="pandas"))


def _seed_centroids(ds, k: int, id_col: str, vec_col: str):
    """Gather the deterministic seed-pick centroids (rows with id <
    ``k``) with one distributed Arrow-side filter (empty blocks keep
    their schema — no estimator noise from empty object columns) and
    return ``(cids, C)``: real ids ascending + float64 (k_eff, dim).
    """
    import pyarrow.compute as pc

    cent = ds.map_batches(lambda b: b.filter(pc.less(b[id_col], k)),
                          batch_format="pyarrow").take_all()
    if not cent:
        raise ValueError(
            f"no seed centroids: no rows with {id_col} < {k}")
    cent.sort(key=lambda r: int(r[id_col]))
    return (np.array([int(r[id_col]) for r in cent], dtype=np.int64),
            _matrix([r[vec_col] for r in cent]))


def kmeans_assign(ds, k: int = 8, id_col: str = "vec_id",
                  vec_col: str = "embedding", scale: int = 1_000_000):
    """E-step: assign every vector to its nearest centroid.  The
    centroid set is deterministic — the rows with id < ``k`` (a
    seed-pick that both the engine and a SQL oracle can name) —
    gathered with one distributed filter (k rows) and broadcast via
    ``ray.put``; a single stateless ``map_batches`` pass then computes
    squared L2 on the integer grid (``floor(x*scale+0.5)``), so the
    distances are exact int64 in any summation order and the argmin
    (ties -> smallest centroid id) is bit-identical across engines.

    Together with :func:`label_centroids` this is one full Lloyd's
    iteration expressed as two streaming Ray Data passes: no vector
    ever rides a shuffle, the only exchange is the tiny centroid
    broadcast.
    """
    import ray

    cids, Cf = _seed_centroids(ds, k, id_col, vec_col)
    C = np.floor(Cf * scale + 0.5).astype(np.int64)
    ref = ray.put((cids, C))

    def assign(batch: pa.Table) -> pd.DataFrame:
        cids_, C_ = ray.get(ref)
        X = np.floor(_matrix_from_arrow(batch, vec_col) * scale
                     + 0.5).astype(np.int64)
        if X.size == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "centroid_id": pd.Series([], dtype="int64"),
                                 "dist_scaled": pd.Series([], dtype="int64")})
        d = ((X[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2)
        best = d.argmin(axis=1)        # first occurrence == smallest cid
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "centroid_id": cids_[best],
            "dist_scaled": d[np.arange(len(best)), best],
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def semdedup_prune(ds, threshold: float = 0.95, k: int = 8,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   scale: int = 1_000_000):
    """SemDeDup-style semantic pruning: cluster the embeddings
    (``kmeans_assign`` seed-pick centroids), then inside each cluster
    drop every vector that has a smaller-id neighbor with cosine >=
    ``threshold`` (the epsilon-ball keep-first rule of Abbas et al.,
    "SemDeDup", 2023 — pairwise similarity is only ever computed
    WITHIN a cluster, which is the whole point of the method: the
    O(n^2) comparison becomes k * O((n/k)^2)).

    Shuffle discipline: the one exchange co-locates cluster members
    and must carry the vectors (within-cluster pairwise cosine needs
    them) — inherent to SemDeDup; cluster count scales with corpus
    size so per-group work stays bounded.  Output: the surviving
    ``(id, centroid_id)`` rows — ids only, vectors never leave the
    group task.
    """
    import ray

    cids, Cf = _seed_centroids(ds, k, id_col, vec_col)
    C = np.floor(Cf * scale + 0.5).astype(np.int64)
    ref = ray.put((cids, C))

    def assign_with_vec(batch: pd.DataFrame) -> pd.DataFrame:
        cids_, C_ = ray.get(ref)
        if len(batch) == 0:
            # typed empty: an object-dtype vector column would trip
            # Ray's block-size estimator / schema unification
            return pa.table({
                id_col: pa.array([], pa.int64()),
                vec_col: pa.array([], pa.list_(pa.float64())),
                "centroid_id": pa.array([], pa.int64())})
        S = np.floor(_matrix(batch[vec_col]) * scale
                     + 0.5).astype(np.int64)
        d = ((S[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2)
        out = batch[[id_col, vec_col]].copy()
        out["centroid_id"] = cids_[d.argmin(axis=1)]
        return out

    assigned = ds.map_batches(assign_with_vec, batch_format="pandas")

    def prune(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col).reset_index(drop=True)
        M = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g[vec_col]])
        Mn = _norm_rows(M)
        G = Mn @ Mn.T
        n = len(g)
        # drop i if any j < i (id order) has cos >= threshold
        iu = np.triu_indices(n, k=1)
        dropped = np.zeros(n, dtype=bool)
        hit = G[iu] >= threshold
        np.logical_or.at(dropped, iu[1][hit], True)
        keep = g.loc[~dropped, [id_col, "centroid_id"]]
        return keep.reset_index(drop=True)

    return assigned.groupby("centroid_id").map_groups(
        prune, batch_format="pandas")


def kmeans_fit(ds, k: int = 8, iters: int = 5, id_col: str = "vec_id",
               vec_col: str = "embedding", scale: int = 1_000_000,
               grid: int = 10_000):
    """Full distributed Lloyd's k-means: ``iters`` rounds, each ONE
    fused streaming pass (assign to the broadcast centroids + emit
    per-batch per-cluster integer partial sums) followed by a
    label-keyed ``groupby`` combine (the :func:`label_centroids`
    shape), so the driver reads exactly ``k x dim`` combined rows per
    round — NOT ``n_blocks x k x dim`` partials (round-2 finding: a
    100 TB corpus has 1e5-1e6 blocks, which made the old driver
    combine GBs per round).  All sums are int64 on the ``scale`` grid,
    so the distributed combine order cannot perturb the result.  The
    input is materialized once (consumed every round); centroids are
    snapped to the ``1/grid`` float grid after every M-step, so the
    whole trajectory is integer-deterministic and a single-process
    numpy replay reproduces it bit for bit (see
    tests/test_ivf_clusters.py) — and a SQL twin can chain the same
    E+M rounds as repeated CTEs.

    Initial centroids: the seed-pick rows with id < ``k`` (same rule
    as :func:`kmeans_assign`); cluster labels are the REAL seed ids.
    A cluster that receives no members is DROPPED for the remaining
    rounds (the drop-empty-clusters Lloyd variant) — this is exactly
    what the chained-CTE SQL twin computes (an empty cluster simply
    has no mean row to feed the next round), so engine and oracle
    agree on every input, not just ones where no cluster empties.
    Returns (label, dim, mean_val, n) for the surviving final
    centroids — same shape as :func:`label_centroids`.
    """
    import ray

    ds = ds.materialize()          # consumed once per iteration
    cids, C = _seed_centroids(ds, k, id_col, vec_col)
    dim = C.shape[1]
    counts = np.zeros(len(cids), dtype=np.int64)

    for _ in range(iters):
        Cs = np.floor(C * scale + 0.5).astype(np.int64)
        ref = ray.put(Cs)

        def partial(batch: pa.Table) -> pd.DataFrame:
            Cs_ = ray.get(ref)
            X = _matrix_from_arrow(batch, vec_col)
            if X.size == 0:
                return pd.DataFrame({
                    "label": pd.Series([], dtype="int64"),
                    "dim": pd.Series([], dtype="int64"),
                    "sum_scaled": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64")})
            S = np.floor(X * scale + 0.5).astype(np.int64)
            d = ((S[:, None, :] - Cs_[None, :, :]) ** 2).sum(axis=2)
            lab = d.argmin(axis=1)         # position in current Cs
            out_l, out_d, out_s, out_n = [], [], [], []
            for c in np.unique(lab):
                m = lab == c
                out_l.append(np.full(S.shape[1], c, dtype=np.int64))
                out_d.append(np.arange(S.shape[1], dtype=np.int64))
                out_s.append(S[m].sum(axis=0))
                out_n.append(np.full(S.shape[1], int(m.sum()),
                                     dtype=np.int64))
            return pd.DataFrame({"label": np.concatenate(out_l),
                                 "dim": np.concatenate(out_d),
                                 "sum_scaled": np.concatenate(out_s),
                                 "n": np.concatenate(out_n)})

        def combine(group: pd.DataFrame) -> pd.DataFrame:
            # int64 sums on the scale grid: order-free, bit-exact
            return (group.groupby(["label", "dim"], sort=True)
                    [["sum_scaled", "n"]].sum().reset_index())

        agg = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("label")
               .map_groups(combine, batch_format="pandas")
               .to_pandas())
        present = np.array(sorted(agg["label"].unique()), dtype=np.int64)
        new_C = np.empty((len(present), dim), dtype=np.float64)
        counts = np.zeros(len(present), dtype=np.int64)
        for i, c in enumerate(present):
            sub = agg[agg["label"] == c].sort_values("dim")
            n = int(sub["n"].iloc[0])
            counts[i] = n
            new_C[i] = np.floor(grid * (
                sub["sum_scaled"].to_numpy(np.float64)
                / (float(scale) * n))) / grid
        C, cids = new_C, cids[present]     # empty clusters drop out

    k_eff = len(cids)
    return pa.table({
        "label": pa.array(np.repeat(cids, dim), pa.int64()),
        "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), k_eff),
                        pa.int64()),
        "mean_val": pa.array(C.ravel(), pa.float64()),
        "n": pa.array(np.repeat(counts, dim), pa.int64()),
    })


def _pq_subspaces(dim: int, m: int) -> np.ndarray:
    """Column -> subspace assignment by the closed form ``(p*m)//dim``
    — the SAME expression the SQL twin states, so bucket boundaries
    cannot drift between engines when ``dim % m != 0``.  With
    ``m <= dim`` every subspace receives at least one column (the
    floor steps by at most 1 per column and ends at ``m-1``)."""
    if m > dim:
        raise ValueError(f"pq: m={m} exceeds embedding dim={dim}")
    return (np.arange(dim, dtype=np.int64) * m) // dim


def pq_encode(ds, m: int = 4, n_codes: int = 8, id_col: str = "vec_id",
              vec_col: str = "embedding", scale: int = 1_000_000):
    """Product-quantization encoding (Jegou et al., "Product
    Quantization for Nearest Neighbor Search", 2011): each vector is
    reduced to ``m`` one-byte-ish codes, one per contiguous column
    subspace, where code j is the id of the nearest seed-pick centroid
    (rows with id < ``n_codes`` — the :func:`kmeans_assign` rule)
    restricted to subspace j's columns.  Distances live on the integer
    grid (``floor(x*scale+0.5)`` per coordinate, int64 squared L2), so
    the argmin (ties -> smallest centroid id) is bit-identical in any
    engine and the DuckDB twin reproduces the codes exactly.

    At 100 TB this is the embedding-search memory story: ``m`` small
    ints replace ``dim`` floats per vector (64 f32 -> 4 codes is 64x),
    which is what lets a corpus-scale index stay in the object store.
    One tiny centroid broadcast, one stateless pass, no shuffle.
    Output long format: (vec_id, sub, code).
    """
    import ray

    cids, Cf = _seed_centroids(ds, n_codes, id_col, vec_col)
    C = np.floor(Cf * scale + 0.5).astype(np.int64)
    mm = int(m)
    _pq_subspaces(C.shape[1], mm)      # fail fast on m > dim
    ref = ray.put((cids, C))

    def encode(batch: pa.Table) -> pd.DataFrame:
        cids_, C_ = ray.get(ref)
        X = np.floor(_matrix_from_arrow(batch, vec_col) * scale
                     + 0.5).astype(np.int64)
        if X.size == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "sub": pd.Series([], dtype="int64"),
                                 "code": pd.Series([], dtype="int64")})
        subs = _pq_subspaces(X.shape[1], mm)
        ids = batch[id_col].to_numpy()
        out_id, out_sub, out_code = [], [], []
        for j in range(mm):
            cols = subs == j
            d = ((X[:, None, cols] - C_[None, :, cols]) ** 2).sum(axis=2)
            best = d.argmin(axis=1)        # first occurrence == smallest cid
            out_id.append(ids)
            out_sub.append(np.full(len(ids), j, dtype=np.int64))
            out_code.append(cids_[best])
        return pd.DataFrame({id_col: np.concatenate(out_id),
                             "sub": np.concatenate(out_sub),
                             "code": np.concatenate(out_code)})

    return ds.map_batches(encode, batch_format="pyarrow")


def _pq_lut(Qi: np.ndarray, C: np.ndarray, subs: np.ndarray,
            m: int) -> np.ndarray:
    """(n_q, m, n_codes) int64 table of squared L2 between each query
    subvector and each sub-centroid."""
    lut = np.empty((Qi.shape[0], m, C.shape[0]), dtype=np.int64)
    for j in range(m):
        cols = subs == j
        lut[:, j, :] = ((Qi[:, None, cols] - C[None, :, cols]) ** 2
                        ).sum(axis=2)
    return lut


def _pq_code_positions(X: np.ndarray, C: np.ndarray, subs: np.ndarray,
                       m: int) -> np.ndarray:
    """(n, m) centroid POSITIONS (0..k-1) per subspace — integer-grid
    argmin, first occurrence == smallest centroid id."""
    codepos = np.empty((X.shape[0], m), dtype=np.int64)
    for j in range(m):
        cols = subs == j
        d = ((X[:, None, cols] - C[None, :, cols]) ** 2).sum(axis=2)
        codepos[:, j] = d.argmin(axis=1)
    return codepos


_PQ_EMPTY = {"query_id": pa.int64(), "rank": pa.int64(),
             "vec_id": pa.int64(), "adc_scaled": pa.int64()}


def _pq_gather_queries(ds, query_ids, id_col, vec_col, scale):
    """Distributed query gather + integer-grid scaling shared by
    pq_search and pq_search_ivf (the exact-twin equality depends on
    both using the SAME prep).  Returns (q_ids, Qi) or (None, None)
    when no query row exists."""
    qrows = _grab_rows_by_id(ds, query_ids, id_col)
    if not qrows:
        return None, None
    qrows.sort(key=lambda r: int(r[id_col]))
    q_ids = np.array([int(r[id_col]) for r in qrows], dtype=np.int64)
    Qi = np.floor(_matrix([r[vec_col] for r in qrows]) * scale
                  + 0.5).astype(np.int64)
    return q_ids, Qi


def _pq_merge_topk(partials, k: int) -> pa.Table:
    """Driver merge of per-batch (query_id, vec_id, adc_scaled)
    candidates -> ranked top-k table; shared by pq_search and
    pq_search_ivf so tie handling cannot drift between the twins."""
    best: dict = {}
    for r in partials:
        best.setdefault(r["query_id"], []).append(
            (r["adc_scaled"], r["vec_id"]))
    out_q, out_rank, out_v, out_s = [], [], [], []
    for qid in sorted(best):
        cand = sorted(best[qid])[:k]
        for rank, (adc_v, vid) in enumerate(cand, start=1):
            out_q.append(qid); out_rank.append(rank)
            out_v.append(vid); out_s.append(adc_v)
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_rank, pa.int64()),
        "vec_id": pa.array(out_v, pa.int64()),
        "adc_scaled": pa.array(out_s, pa.int64()),
    })


def pq_search(ds, query_ids: List[int], k: int = 5, m: int = 4,
              n_codes: int = 8, id_col: str = "vec_id",
              vec_col: str = "embedding", scale: int = 1_000_000) -> pa.Table:
    """Asymmetric-distance PQ top-k: the IVF-PQ scale path's scoring
    half.  Queries stay EXACT (never quantized); each query precomputes
    a (m x n_codes) int64 lookup table of squared L2 to every
    sub-centroid, the LUT rides one ``ray.put`` broadcast, and a batch
    is scored by encoding it (same integer-grid argmin as
    :func:`pq_encode`) and summing ``m`` LUT gathers — no float math
    anywhere, so the ADC total is aggregation-order-free and the DuckDB
    twin is bit-exact.  Per-batch partial top-k keeps candidates by the
    FULL (adc, vec_id) tie order (int ADC ties are common, unlike
    cosine floats), the driver merges tiny partials.  No shuffle.

    Returns (query_id, rank, vec_id, adc_scaled); self-matches
    excluded; ties break by vec_id ascending.
    """
    import ray

    cids, Cf = _seed_centroids(ds, n_codes, id_col, vec_col)
    C = np.floor(Cf * scale + 0.5).astype(np.int64)
    q_ids, Qi = _pq_gather_queries(ds, query_ids, id_col, vec_col, scale)
    if q_ids is None:
        return pa.table({c: pa.array([], t) for c, t in _PQ_EMPTY.items()})
    mm = int(m)
    subs = _pq_subspaces(Qi.shape[1], mm)
    lut = _pq_lut(Qi, C, subs, mm)
    ref = ray.put((q_ids, C, lut))

    def partial_topk(batch: pa.Table) -> pd.DataFrame:
        ids_, C_, L_ = ray.get(ref)
        X = np.floor(_matrix_from_arrow(batch, vec_col) * scale
                     + 0.5).astype(np.int64)
        if X.size == 0:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "adc_scaled": pd.Series([], dtype="int64")})
        codepos = _pq_code_positions(
            X, C_, _pq_subspaces(X.shape[1], mm), mm)
        adc = np.zeros((L_.shape[0], X.shape[0]), dtype=np.int64)
        for j in range(mm):
            adc += L_[:, j, :][:, codepos[:, j]]
        vids = batch[id_col].to_numpy()
        kk = min(k + 1, adc.shape[1])           # +1 to survive self-drop
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids_):
            row = adc[qi]
            # lexicographic (adc, vec_id) so integer ties at the cut
            # keep the same candidates the SQL rank keeps
            idx = np.lexsort((vids, row))[:kk]
            for jx in idx:
                if int(vids[jx]) == int(qid):
                    continue
                out_q.append(int(qid)); out_v.append(int(vids[jx]))
                out_s.append(int(row[jx]))
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v,
                             "adc_scaled": out_s})

    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=4096).take_all()
    return _pq_merge_topk(partials, k)


def pq_search_ivf(ds, query_ids: List[int], k: int = 5, m: int = 4,
                  n_codes: int = 8, n_centroids: int = 16,
                  nprobe: int = 4, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  scale: int = 1_000_000) -> pa.Table:
    """Full IVF-PQ (Jegou et al. 2011): the coarse quantizer of
    :func:`knn_ivf` composed with the ADC scoring of
    :func:`pq_search` — THE standard corpus-scale ANN shape (a
    billion-vector index is an inverted file over coarse cells whose
    entries are PQ codes, ~m bytes each).

    Each query probes its ``nprobe`` nearest coarse cells (integer-grid
    distance, ties -> smaller centroid id); a batch vector is
    ADC-scored for a query only when its own coarse cell (same
    integer-grid argmin, seed-pick rows with id < ``n_centroids``) is
    in that query's probe set.  ``nprobe == n_centroids`` probes
    everything, making the operator provably equal to
    :func:`pq_search` — the exact-probe twin that lets the brute PQ
    SQL oracle hash-check this whole code path while the approximate
    default stays the scale path.  Three streaming passes (one shared
    seed scan, the query gather, the scoring pass), two tiny
    broadcasts, no shuffle.
    """
    import ray

    if int(nprobe) < 1:
        raise ValueError(f"pq_search_ivf: nprobe={nprobe} must be >= 1")
    # ONE seed scan covers both centroid sets (coarse ids and PQ
    # codebook ids are each a prefix of the id < kmax rows)
    cids_all, Call = _seed_centroids(
        ds, max(n_centroids, n_codes), id_col, vec_col)
    Ci_all = np.floor(Call * scale + 0.5).astype(np.int64)
    Cc = Ci_all[cids_all < n_centroids]
    Cq = Ci_all[cids_all < n_codes]
    q_ids, Qi = _pq_gather_queries(ds, query_ids, id_col, vec_col, scale)
    if q_ids is None:
        return pa.table({c: pa.array([], t) for c, t in _PQ_EMPTY.items()})
    mm = int(m)
    subs = _pq_subspaces(Qi.shape[1], mm)
    lut = _pq_lut(Qi, Cq, subs, mm)
    # probe sets: nprobe nearest coarse cells per query (ties -> the
    # POSITION order, which is ascending centroid id)
    dq = ((Qi[:, None, :] - Cc[None, :, :]) ** 2).sum(axis=2)
    order = np.argsort(dq, axis=1, kind="stable")
    probe = np.zeros((len(q_ids), Cc.shape[0]), dtype=bool)
    take = min(int(nprobe), Cc.shape[0])
    np.put_along_axis(probe, order[:, :take], True, axis=1)
    ref = ray.put((q_ids, Cq, lut, Cc, probe))

    def partial_topk(batch: pa.Table) -> pd.DataFrame:
        ids_, Cq_, L_, Cc_, probe_ = ray.get(ref)
        X = np.floor(_matrix_from_arrow(batch, vec_col) * scale
                     + 0.5).astype(np.int64)
        if X.size == 0:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "adc_scaled": pd.Series([], dtype="int64")})
        cell = ((X[:, None, :] - Cc_[None, :, :]) ** 2
                ).sum(axis=2).argmin(axis=1)        # coarse positions
        codepos = _pq_code_positions(
            X, Cq_, _pq_subspaces(X.shape[1], mm), mm)
        adc = np.zeros((L_.shape[0], X.shape[0]), dtype=np.int64)
        for j in range(mm):
            adc += L_[:, j, :][:, codepos[:, j]]
        vids = batch[id_col].to_numpy()
        kk = min(k + 1, adc.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids_):
            hit = probe_[qi, cell]
            if not hit.any():
                continue
            row = adc[qi, hit]
            vh = vids[hit]
            idx = np.lexsort((vh, row))[:kk]
            for jx in idx:
                if int(vh[jx]) == int(qid):
                    continue
                out_q.append(int(qid)); out_v.append(int(vh[jx]))
                out_s.append(int(row[jx]))
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v,
                             "adc_scaled": out_s})

    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=4096).take_all()
    return _pq_merge_topk(partials, k)


def ann_recall(approx: pa.Table, exact: pa.Table) -> pa.Table:
    """Per-query recall@k of an approximate ANN result against its
    exact twin — both in the (query_id, rank, vec_id, score) layout
    the knn_*/pq_search* family emits.  Returns (query_id, n_exact,
    n_hit, recall_milli) with ``recall_milli = (1000*n_hit)//n_exact``
    (integer grid, deterministic).  Driver-side pandas on n_q x k
    rows — both inputs are top-k results, never corpus-sized."""
    a = approx.to_pandas()
    e = exact.to_pandas()
    qs, n_ex, n_hit, rec = [], [], [], []
    a_by_q = a.groupby("query_id")["vec_id"].agg(set) if len(a) else {}
    for qid, grp in e.groupby("query_id"):
        want = set(grp["vec_id"])
        got = a_by_q.get(qid, set()) if len(a) else set()
        qs.append(int(qid))
        n_ex.append(len(want))
        n_hit.append(len(want & got))
        rec.append((1000 * len(want & got)) // len(want))
    return pa.table({
        "query_id": pa.array(qs, pa.int64()),
        "n_exact": pa.array(n_ex, pa.int64()),
        "n_hit": pa.array(n_hit, pa.int64()),
        "recall_milli": pa.array(rec, pa.int64())})


def ann_recall_floor(approx: pa.Table, exact: pa.Table,
                     floor_milli: int) -> pa.Table:
    """One-row recall gate: (n_queries, floor_milli, meets) where
    ``meets`` = 1 iff the MEAN per-query recall_milli over the exact
    twin's query set is >= ``floor_milli``.  The gate row is
    SQL-statable (a literal), so the driver's hash compare pins the
    approximate variants' recall instead of a rows-only check — any
    recall regression flips ``meets`` and fails the gate.  Mean (not
    min) because a single adversarial query can legitimately land at
    0 recall under an nprobe/hamming budget; the corpus-level promise
    is the mean."""
    detail = ann_recall(approx, exact).to_pandas()
    n_q = len(detail)
    mean_milli = (int(detail["recall_milli"].sum()) // n_q) if n_q else 0
    return pa.table({
        "n_queries": pa.array([n_q], pa.int64()),
        "floor_milli": pa.array([int(floor_milli)], pa.int64()),
        "meets": pa.array([1 if mean_milli >= floor_milli else 0],
                          pa.int64())})


def search_rerank(docs_ds, emb_ds, query_tokens, query_vec_id: int = 0,
                  n_candidates: int = 20, k: int = 5,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> pa.Table:
    """Hybrid retrieve-then-rerank — the RAG serving shape: lexical
    RECALL from :func:`doc_ocr_ray.stages.text_analysis.bm25_search`
    (two shuffle-free corpus passes, integer micro-grid scores), then
    semantic PRECISION by cosine against a query embedding over the
    candidate set only.

    The candidate set is ≤ ``n_candidates`` BY CONSTRUCTION, so the
    rerank stage is a bounded gather (the Arrow-side distributed
    filter of :func:`_grab_rows_by_id` — only candidate + query rows
    leave the corpus) and a driver-side sort of ≤ ``n_candidates``
    rows; the corpus is touched exactly three streaming times total
    (BM25 stats, BM25 score, embedding gather), never shuffled.

    Candidates without an embedding row are dropped (stated
    contract).  Cosine on the round-4 grid of :func:`knn_brute`; rank
    by (cos_sim DESC, doc_id ASC).  Returns (rank, doc_id,
    score_micro, cos_sim) — the BM25 integer score rides along for
    score fusion downstream.
    """
    from doc_ocr_ray.stages.text_analysis import bm25_search

    cands = bm25_search(docs_ds, query_tokens, k=n_candidates)
    cand_ids = [int(v) for v in cands["doc_id"]]       # pandas frame
    bm = dict(zip(cand_ids, (int(v) for v in cands["score_micro"])))
    rows = _grab_rows_by_id(emb_ds, set(cand_ids) | {int(query_vec_id)},
                            id_col)
    vecs = {int(r[id_col]): np.asarray(r[vec_col], dtype=np.float64)
            for r in rows}
    if int(query_vec_id) not in vecs:
        raise ValueError(f"query embedding {query_vec_id} not found")
    q = vecs[int(query_vec_id)]
    qn = q / (np.linalg.norm(q) or 1.0)
    scored = []
    for did in cand_ids:
        v = vecs.get(did)
        if v is None:
            continue
        vn = v / (np.linalg.norm(v) or 1.0)
        scored.append((round(float(qn @ vn), 4), did))
    scored.sort(key=lambda t: (-t[0], t[1]))
    top = scored[:k]
    return pa.table({
        "rank": pa.array(range(1, len(top) + 1), pa.int64()),
        "doc_id": pa.array([d for _, d in top], pa.int64()),
        "score_micro": pa.array([bm[d] for _, d in top], pa.int64()),
        "cos_sim": pa.array([s for s, _ in top], pa.float64()),
    })


def _lsh_setup(n: int, dim: int, num_bands: int, bits_per_band: int,
               target_bucket: int, seed: int):
    """Banded sign-LSH parameters shared by
    :func:`embedding_neardup_pairs` and :func:`knn_graph_lsh`:
    band width scales with corpus size (``log2(n / target_bucket)``)
    so buckets stay ~``target_bucket`` rows at any scale, hyperplanes
    are seed-deterministic, and bit weights pack each band's sign
    code into one int64.  Returns (bits_per_band, planes, weights).
    One home so a fix to the banding math cannot diverge between the
    two LSH operators."""
    if bits_per_band <= 0:
        bits_per_band = max(2, int(np.ceil(
            np.log2(max(2.0, n / max(1, target_bucket))))))
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_bands * bits_per_band, dim))
    weights = (1 << np.arange(bits_per_band)).astype(np.int64)
    return bits_per_band, planes, weights


def embedding_neardup_pairs(ds, threshold: float = 0.95,
                            num_bands: int = 8, bits_per_band: int = 0,
                            target_bucket: int = 64,
                            id_col: str = "vec_id", vec_col: str = "embedding"):
    """Cosine near-duplicate pairs via MULTI-BAND hyperplane LSH.

    Same banding shape as the MinHash path (dedup.py): ``num_bands``
    independent sign-bit codes of ``bits_per_band`` hyperplanes each; a
    pair is a candidate when ANY band matches, so recall is
    1-(1-p^r)^B instead of the single-code p^n cliff.  ``bits_per_band``
    scales with corpus size (log2(n/target_bucket)) so buckets stay
    ~target_bucket rows no matter the corpus — no O(n^2/2^bits) blow-up
    from a fixed code width.

    Shuffle discipline: the exchange carries (id, band, bucket) ONLY —
    vectors never ride the groupby.  Candidate pairs (id pairs, tiny vs
    the corpus) are verified in a second distributed pass: the
    candidate id-set is broadcast, matching vectors are gathered with a
    distributed filter (output is candidate-sized), the gathered matrix
    is broadcast back, and each pair partition scores its pairs
    locally.  Assumes the candidate set fits the object store — true
    whenever near-dup output itself is storable.
    """
    import ray

    # consumed four times (count, dim peek, coding scan, verify
    # gather) — pin the input once instead of re-executing lineage
    ds = ds.materialize()
    n = ds.count()
    first = ds.take(1)
    if not first:
        import ray.data as _rd
        return _rd.from_pandas(pd.DataFrame({
            "vec_a": pd.Series([], dtype="int64"),
            "vec_b": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64")}))
    dim = len(first[0][vec_col])
    bits_per_band, planes, weights = _lsh_setup(
        n, dim, num_bands, bits_per_band, target_bucket, seed=7)
    planes_ref = ray.put(planes)

    def code_batch(batch: pa.Table) -> pd.DataFrame:
        P = ray.get(planes_ref)
        X = _norm_rows(_matrix_from_arrow(batch, vec_col))
        bits = (X @ P.T) > 0                       # (n, B*r)
        ids = batch[id_col].to_numpy()
        out_id, out_band, out_bucket = [], [], []
        for band in range(num_bands):
            seg = bits[:, band * bits_per_band:(band + 1) * bits_per_band]
            codes = seg.astype(np.int64) @ weights
            out_id.append(ids)
            out_band.append(np.full(len(ids), band, dtype=np.int64))
            out_bucket.append(codes)
        return pd.DataFrame({
            id_col: np.concatenate(out_id),
            "band": np.concatenate(out_band),
            "bucket": np.concatenate(out_bucket),
            "part": ((np.concatenate(out_band) * 131071
                      + np.concatenate(out_bucket)) % 256),
        })

    coded = ds.map_batches(code_batch, batch_format="pyarrow")

    def part_pairs(group: pd.DataFrame) -> pd.DataFrame:
        a_, b_ = [], []
        for _, bucket in group.groupby(["band", "bucket"], sort=False):
            if len(bucket) < 2:
                continue
            ids = np.sort(bucket[id_col].to_numpy())
            ii, jj = np.triu_indices(len(ids), k=1)
            a_.append(ids[ii]); b_.append(ids[jj])
        if not a_:
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"vec_a": np.concatenate(a_),
                             "vec_b": np.concatenate(b_)})

    pairs = coded.groupby("part").map_groups(part_pairs, batch_format="pandas")

    # cross-band dedupe on a coarse pair key
    def pair_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["ppart"] = ((batch["vec_a"] * 31 + batch["vec_b"]) % 64).astype("int64")
        return batch

    def drop_dup(group: pd.DataFrame) -> pd.DataFrame:
        return (group.drop_duplicates(["vec_a", "vec_b"])
                     .drop(columns=["ppart"]))

    cand = (pairs.map_batches(pair_part, batch_format="pandas")
                 .groupby("ppart").map_groups(drop_dup, batch_format="pandas")
                 .materialize())        # consumed twice (id-set + verify)

    # ---- verify pass: candidate-sized gather + distributed scoring
    need = set()
    for b in cand.iter_batches(batch_size=65536, batch_format="pandas"):
        need.update(b["vec_a"].tolist()); need.update(b["vec_b"].tolist())
    if not need:
        import ray.data as _rd
        return _rd.from_pandas(pd.DataFrame({
            "vec_a": pd.Series([], dtype="int64"),
            "vec_b": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64")}))
    need_ref = ray.put(need)

    def grab(batch: pd.DataFrame) -> pd.DataFrame:
        ns = ray.get(need_ref)
        hit = batch[batch[id_col].isin(ns)]
        return pd.DataFrame({
            id_col: hit[id_col].to_numpy(),
            vec_col: [list(map(float, v)) for v in hit[vec_col]],
        })

    got = ds.map_batches(grab, batch_format="pandas").take_all()
    vecs = {int(r[id_col]): np.asarray(r[vec_col], dtype=np.float64)
            for r in got}
    # normalize once, broadcast the id->row lookup
    ids_sorted = sorted(vecs)
    M = _norm_rows(np.stack([vecs[i] for i in ids_sorted]))
    row_of = {i: r for r, i in enumerate(ids_sorted)}
    vec_ref = ray.put((M, row_of))

    def score_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        Mm, rows = ray.get(vec_ref)
        ra = batch["vec_a"].map(rows).to_numpy()
        rb = batch["vec_b"].map(rows).to_numpy()
        s = np.einsum("ij,ij->i", Mm[ra], Mm[rb])
        hit = s >= threshold
        return pd.DataFrame({
            "vec_a": batch["vec_a"].to_numpy()[hit],
            "vec_b": batch["vec_b"].to_numpy()[hit],
            "score": np.round(s[hit], 4),
        })

    return cand.map_batches(score_pairs, batch_format="pandas")


def gram_matrix(ds, vec_col: str = "embedding", grid: int = 1_000_000,
                num_parts: int = 32):
    """Distributed Gram / scatter matrix of the embedding column —
    the X^T X reduction under PCA, whitening, and linear-probe
    fitting: one (i, j, s) row per upper-triangle coordinate pair
    where ``s = sum_r q(x_ri) * q(x_rj)`` over all rows.

    Exactness: elements quantize once onto the ``1/grid`` integer
    grid (``floor(v * grid + 0.5)``, half-up — the house cents rule),
    then every product and sum is int64 — no float accumulation order
    to match, so the DuckDB twin is bit-exact.  Envelope: |q| < 2^21
    at grid=1e6 for unit-scale embeddings -> one product < 2^42;
    int64 absorbs ~2^21 rows before overflow — larger corpora raise
    the per-batch partial to HUGEINT territory, so callers shrink
    ``grid`` (the documented bit-parity contract, numpy wraps
    silently).

    Shape: per-batch vectorized ``Q^T Q`` (one einsum over the whole
    batch — d^2-sized partial no matter the batch), partials keyed by
    (i, j), ONE d^2-row groupby sum.  The corpus never shuffles; only
    d*(d+1)/2-row matrices do.
    """
    from doc_ocr_ray.util import typed_if_empty

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return typed_if_empty(pd.DataFrame({
                "i": pd.Series([], dtype="int64"),
                "j": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64"),
                "part": pd.Series([], dtype="int64")}))
        # widen float32 storage to float64 BEFORE the grid multiply:
        # SQL computes in DOUBLE (exact f32->f64), and a f32 product
        # rounds differently near floor boundaries
        x = np.stack(batch[vec_col].to_numpy()).astype("float64")
        q = np.floor(x * grid + 0.5).astype("int64")
        g = q.T @ q                      # (d, d) int64
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        out = pd.DataFrame({"i": iu.astype("int64") + 1,
                            "j": ju.astype("int64") + 1,
                            "s": g[iu, ju]})
        # coarse shuffle key: d^2 coordinates regroup INSIDE the
        # group fn (thousands of 1-row Ray groups cost ~1ms each)
        out["part"] = (out["i"] * 1009 + out["j"]) % num_parts
        return out

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        out = (group.groupby(["i", "j"], sort=False)["s"].sum()
               .reset_index())
        out["s"] = out["s"].astype("int64")
        return typed_if_empty(out)

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("part").map_groups(combine,
                                        batch_format="pandas"))


def hard_negatives(ds, query_ids, k: int = 5, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   label_col: str = "label") -> pa.Table:
    """Contrastive hard-negative mining — the pair-construction pass
    of an embedding-training pipeline: for each anchor, the top-``k``
    most cosine-similar vectors with a DIFFERENT label (near the
    anchor but semantically wrong — the negatives that actually teach
    the model).  Same distributed shape as :func:`knn_brute`: anchors
    (vectors + labels) broadcast once, each batch scores vectorized
    and emits its local top-k AFTER the same-label/self mask, the
    driver merges ``n_anchors * k * n_blocks`` candidate rows.
    Scores round to 4 decimals; ties break by vec_id ascending.

    Output: ``(query_id, rank, vec_id, score)``.
    """
    import ray

    qrows = _grab_rows_by_id(ds, query_ids, id_col)
    if not qrows:
        return _empty_knn_table()
    qrows.sort(key=lambda r: int(r[id_col]))
    q_ids = np.array([int(r[id_col]) for r in qrows])
    q_labels = np.array([int(r[label_col]) for r in qrows])
    Q = _norm_rows(_matrix([r[vec_col] for r in qrows]))
    ref = ray.put((q_ids, q_labels, Q))

    def partial_topk(batch: pa.Table) -> pd.DataFrame:
        ids, labels, Qm = ray.get(ref)
        X = _norm_rows(_matrix_from_arrow(batch, vec_col))
        vids = batch[id_col].to_numpy()
        vlabels = batch[label_col].to_numpy()
        scores = Qm @ X.T                       # (n_q, n_batch)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids):
            ok = vlabels != labels[qi]          # different label only
            ok &= vids != qid                   # (self shares a label
            if not ok.any():                    #  anyway; belt+braces)
                continue
            row = scores[qi][ok]
            cand_ids = vids[ok]
            kk = min(k, len(row))
            idx = np.argpartition(-row, kk - 1)[:kk]
            out_q.extend([int(qid)] * len(idx))
            out_v.extend(int(v) for v in cand_ids[idx])
            out_s.extend(float(s) for s in row[idx])
        return pd.DataFrame({
            "query_id": pd.Series(out_q, dtype="int64"),
            "vec_id": pd.Series(out_v, dtype="int64"),
            "score": pd.Series(out_s, dtype="float64")})

    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=4096).take_all()
    return _merge_partial_topk(partials, k)


def rank_fusion(docs_ds, emb_ds, query_tokens, query_vec_id: int = 0,
                n_candidates: int = 20, k: int = 10,
                rrf_k: int = 60) -> pa.Table:
    """Reciprocal-rank fusion of the lexical and semantic retrievers —
    the OTHER hybrid-search composition (:func:`search_rerank` is
    retrieve-then-rerank; RRF fuses two INDEPENDENT rankings, robust
    when either retriever's score scale is untrustworthy):

        rrf_micro(doc) = sum over lists of  1_000_000 // (rrf_k + rank)

    over the BM25 top-``n_candidates`` and the cosine
    top-``n_candidates`` (absent from a list = contributes 0).  Pure
    integer arithmetic — the DuckDB twin reproduces the fusion bit
    for bit.  Ties break by doc_id ascending; top-``k`` rows return.

    Shape: both retrievers are the existing shuffle-free passes (BM25
    twice over docs, one broadcast-matmul pass over embeddings); the
    fusion itself is a driver-side merge of two ≤ n_candidates lists.
    """
    from doc_ocr_ray.stages.text_analysis import bm25_search

    bm = bm25_search(docs_ds, query_tokens, k=n_candidates)
    cos = knn_brute(emb_ds, [int(query_vec_id)], k=n_candidates)

    points: dict = {}
    for rank, did in zip(bm["rank"], bm["doc_id"]):
        points[int(did)] = points.get(int(did), 0) \
            + 1_000_000 // (rrf_k + int(rank))
    for rank, did in zip(cos["rank"].to_pylist(),
                         cos["vec_id"].to_pylist()):
        points[int(did)] = points.get(int(did), 0) \
            + 1_000_000 // (rrf_k + int(rank))
    top = sorted(points.items(), key=lambda t: (-t[1], t[0]))[:k]
    return pa.table({
        "rank": pa.array(range(1, len(top) + 1), pa.int64()),
        "doc_id": pa.array([d for d, _ in top], pa.int64()),
        "rrf_micro": pa.array([s for _, s in top], pa.int64()),
    })


_RP_MULT = 11400714819323198485  # odd golden-ratio constant, 2^64/phi


def _rp_signs(dim: int, out_dim: int) -> np.ndarray:
    """Deterministic +-1 sign matrix S[j, i] via multiply-shift:
    sign = +1 iff (MULT * (j*out_dim + i + 1) mod 2^64) < 2^63.
    Pure function of the coordinate pair — both engines state the
    identical arithmetic (SQL: HUGEINT product mod 2^64)."""
    keys = (np.arange(dim, dtype=np.uint64)[:, None]
            * np.uint64(out_dim)
            + np.arange(out_dim, dtype=np.uint64)[None, :]
            + np.uint64(1))
    with np.errstate(over="ignore"):           # uint64 wrap IS the hash
        h = keys * np.uint64(_RP_MULT)
    return np.where(h < np.uint64(1 << 63), 1, -1).astype(np.int64)


def rp_project(ds, out_dim: int = 16, grid: int = 1_000_000,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Random-projection dimensionality reduction (Achlioptas 2003,
    dense +-1 variant) — the scale path BEFORE ANN indexing: project
    d-dim embeddings to ``out_dim`` coordinates with a deterministic
    sign matrix, so downstream LSH/IVF build over 4x-16x fewer floats.

    Exactness: elements quantize once onto the 1/grid integer grid
    (floor(v*grid + 0.5) after an f32->f64 widen — the house rule),
    the sign matrix is the pure multiply-shift function above, and
    every product/sum is int64 — no float accumulation order exists,
    so the DuckDB twin (cross-join range lateral + HUGEINT sign) is
    bit-exact.  Envelope: |q| < 2^21 at grid=1e6 for unit-scale
    embeddings -> |out| < d * 2^21 (2^27 at d=64); int64 is safe for
    any realistic dim.

    Shape: ONE stateless map_batches, row-local fan-out to long
    format (id, dim, value) — n*out_dim rows, NO shuffle; the sign
    matrix is rebuilt per batch from (d, out_dim) closures (cheap:
    d*out_dim uint64 multiplies), never shipped.
    """
    from doc_ocr_ray.util import typed_if_empty

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return typed_if_empty(pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "dim": pd.Series([], dtype="int64"),
                "value": pd.Series([], dtype="int64")}))
        x = np.stack(batch[vec_col].to_numpy()).astype("float64")
        q = np.floor(x * grid + 0.5).astype("int64")
        S = _rp_signs(x.shape[1], out_dim)
        out = q @ S                              # (n, out_dim) int64
        n = len(batch)
        ids = batch[id_col].to_numpy().astype("int64")
        return pd.DataFrame({
            id_col: np.repeat(ids, out_dim),
            "dim": np.tile(np.arange(out_dim, dtype="int64"), n),
            "value": out.reshape(-1)})

    return ds.map_batches(project, batch_format="pandas")


def knn_graph(ds, k: int = 5, id_col: str = "vec_id",
              vec_col: str = "embedding", batch_size: int = 4096):
    """ALL-pairs exact cosine k-NN graph — the SemDeDup /
    graph-based-dedup / label-propagation primitive: for EVERY
    vector, its top-``k`` cosine neighbours (self excluded), ranked
    by raw score DESC with ties broken vec_id ASC, score rounded to
    4 decimals AFTER ranking (the knn_brute tie/round rule, so the
    cross-join SQL twin never drifts).

    Scale shape: the corpus matrix broadcasts ONCE via ``ray.put``
    (the documented envelope: n x dim float64 must fit a worker heap
    — ~2M vectors/GiB at dim 64; beyond it the IVF-bucketed family
    is the scale path).  Each batch is its OWN query block against
    the broadcast matrix, so every batch's top-k is already COMPLETE
    and the output stays distributed — no driver merge at all,
    unlike the small-query-set :func:`knn_brute` whose driver merge
    is n_q-bounded.  The tie rule costs nothing: the corpus matrix
    is assembled in ascending vec_id order, so a STABLE argsort of
    -scores yields score-DESC-then-vec_id-ASC directly.  Output
    (query_id, rank, vec_id, score).

    The matrix is assembled by STREAMING numpy batches
    (:func:`_stream_id_matrix`) — no corpus-sized Python row list
    ever exists on the driver."""
    import ray

    c_ids, Xr = _stream_id_matrix(ds, id_col, vec_col)
    if not len(c_ids):
        import ray.data as _rd
        return _rd.from_arrow(_empty_knn_table())
    X = _norm_rows(Xr)
    del Xr
    ref = ray.put((c_ids, X))

    def block_topk(batch: pa.Table) -> pd.DataFrame:
        ids, Xm = ray.get(ref)
        Q = _norm_rows(_matrix_from_arrow(batch, vec_col))
        qids = batch[id_col].to_numpy()
        scores = Q @ Xm.T                        # (n_batch, n_corpus)
        kk = min(k + 1, scores.shape[1])         # +1 survives self-drop
        # stable sort on -score: corpus columns are vec_id-ascending,
        # so ties resolve vec_id ASC by stability
        order = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
        out_q, out_r, out_v, out_s = [], [], [], []
        for qi in range(scores.shape[0]):
            rank = 0
            for j in order[qi]:
                if int(ids[j]) == int(qids[qi]):
                    continue
                rank += 1
                if rank > k:
                    break
                out_q.append(int(qids[qi])); out_r.append(rank)
                out_v.append(int(ids[j]))
                out_s.append(round(float(scores[qi, j]), 4))
        return pd.DataFrame({
            "query_id": pd.Series(out_q, dtype="int64"),
            "rank": pd.Series(out_r, dtype="int64"),
            "vec_id": pd.Series(out_v, dtype="int64"),
            "score": pd.Series(out_s, dtype="float64")})

    return ds.map_batches(block_topk, batch_format="pyarrow",
                          batch_size=batch_size)


def embedding_drift(ds_a, ds_b, k: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding", scale: int = 1_000_000,
                    grid: int = 10_000):
    """Corpus-drift monitor between two embedding snapshots — the
    production guardrail for a continuously-ingested training corpus
    (did this week's crawl shift the topic mix?): both snapshots are
    clustered against the SAME deterministic centroids (snapshot A's
    seed-pick rows, ``vec_id < k``, the kmeans_assign rule), and per
    cluster the monitor reports membership counts and the L1 centroid
    displacement on the integer grid.

    Output (centroid_id, n_a, n_b, drift_units): drift_units =
    sum over dims of |mean_a - mean_b| in 1/``grid`` units (int64),
    or -1 when the cluster is empty on either side (no centroid to
    compare).  Means snap per dim exactly like label_centroids:
    ``floor(grid * (sum_scaled / (scale * n)))`` — one double
    division + one multiply + one floor, stated identically in the
    SQL twin, so drift is bit-exact.

    Scale shape: the centroid set broadcasts once (``ray.put``); each
    snapshot runs ONE stateless pass that assigns labels in-batch
    (integer-grid argmin, ties to smallest centroid id) and emits
    per-(label, dim) PARTIAL sums — vectors never ride a shuffle and
    per-row assignments never leave the batch; the tagged partials
    (2 x n_blocks x k x dim tiny rows) meet in a single
    groupby(label) combine that computes both snapshots' means and
    the drift inside the group fn."""
    import ray

    cids, Cf = _seed_centroids(ds_a, k, id_col, vec_col)
    C = np.floor(Cf * scale + 0.5).astype(np.int64)
    ref = ray.put((cids, C))

    def partials(src):
        def fn(batch: pa.Table) -> pd.DataFrame:
            empty = pd.DataFrame({
                "label": pd.Series([], dtype="int64"),
                "dim": pd.Series([], dtype="int64"),
                "sum_scaled": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "src": pd.Series([], dtype="int64")})
            cids_, C_ = ray.get(ref)
            Xf = _matrix_from_arrow(batch, vec_col)
            if Xf.size == 0:
                return empty
            X = np.floor(Xf * scale + 0.5).astype(np.int64)
            d = ((X[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2)
            labels = cids_[d.argmin(axis=1)]
            dim = X.shape[1]
            out = []
            for lab in np.unique(labels):
                mask = labels == lab
                out.append(pd.DataFrame({
                    "label": np.full(dim, lab, dtype=np.int64),
                    "dim": np.arange(dim, dtype=np.int64),
                    "sum_scaled": X[mask].sum(axis=0),
                    "n": np.full(dim, int(mask.sum()), dtype=np.int64),
                    "src": np.full(dim, src, dtype=np.int64)}))
            return pd.concat(out, ignore_index=True)
        return fn

    both = (ds_a.map_batches(partials(0), batch_format="pyarrow")
            .union(ds_b.map_batches(partials(1), batch_format="pyarrow")))

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        label = int(group["label"].iloc[0])
        sides = {}
        for src, g in group.groupby("src", sort=True):
            agg = (g.groupby("dim", sort=True)[["sum_scaled", "n"]]
                   .sum())
            n = int(agg["n"].iloc[0]) if len(agg) else 0
            if n:
                means = np.floor(
                    grid * (agg["sum_scaled"].to_numpy(np.float64)
                            / (float(scale) * agg["n"].to_numpy(
                                np.float64)))).astype(np.int64)
            else:
                means = None
            sides[int(src)] = (n, means)
        n_a, m_a = sides.get(0, (0, None))
        n_b, m_b = sides.get(1, (0, None))
        drift = (int(np.abs(m_a - m_b).sum())
                 if m_a is not None and m_b is not None else -1)
        return pd.DataFrame({
            "centroid_id": pd.Series([label], dtype="int64"),
            "n_a": pd.Series([n_a], dtype="int64"),
            "n_b": pd.Series([n_b], dtype="int64"),
            "drift_units": pd.Series([drift], dtype="int64")})

    return both.groupby("label").map_groups(combine,
                                            batch_format="pandas")


def bitext_candidates(emb_ds, docs_ds, k: int = 3,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      doc_id_col: str = "doc_id", lang_col: str = "lang",
                      batch_size: int = 4096):
    """Cross-language parallel-corpus mining (the CCMatrix / LASER
    margin-mining shape, exact-cosine baseline): for every document,
    its top-``k`` nearest embedding neighbours whose LANGUAGE differs
    — the candidate pairs a translation-pair miner feeds to
    alignment scoring.  Ranking/tie/round rule is knn_graph's (raw
    score DESC, vec_id ASC via stable argsort over the id-ordered
    corpus, round 4 after ranking).

    Scale shape: the :func:`knn_graph` envelope — corpus matrix plus
    an id-aligned language array broadcast once via ``ray.put``
    (beyond the fits-a-worker envelope the IVF-bucketed family is
    the scale path); each batch is its own complete query block, the
    output stays distributed, no driver merge.  Output (query_id,
    lang_a, rank, vec_id, lang_b, score)."""
    import ray

    # both broadcast sides stream into numpy arrays — no corpus-sized
    # Python row list or dict ever exists on the driver
    c_ids, Xr = _stream_id_matrix(emb_ds, id_col, vec_col)
    d_ids_chunks: list = []
    d_lang_chunks: list = []
    for b in docs_ds.select_columns([doc_id_col, lang_col]).iter_batches(
            batch_format="pyarrow", batch_size=8192):
        if b.num_rows == 0:
            continue
        d_ids_chunks.append(b[doc_id_col].to_numpy(zero_copy_only=False)
                            .astype(np.int64))
        d_lang_chunks.append(np.asarray(b[lang_col].to_pylist(),
                                        dtype=object))
    if not len(c_ids) or not d_ids_chunks:
        import ray.data as _rd
        return _rd.from_pandas(pd.DataFrame({
            "query_id": pd.Series([], dtype="int64"),
            "lang_a": pd.Series([], dtype="object"),
            "rank": pd.Series([], dtype="int64"),
            "vec_id": pd.Series([], dtype="int64"),
            "lang_b": pd.Series([], dtype="object"),
            "score": pd.Series([], dtype="float64")}))
    X = _norm_rows(Xr)
    del Xr
    d_ids = np.concatenate(d_ids_chunks)
    d_langs = np.concatenate(d_lang_chunks)
    d_order = np.argsort(d_ids, kind="stable")
    d_ids, d_langs = d_ids[d_order], d_langs[d_order]
    # align language to the id-ascending corpus: vectorized
    # searchsorted gather; missing doc -> "" (dropped, matching the
    # SQL twin's inner joins)
    pos = np.searchsorted(d_ids, c_ids)
    pos_c = np.clip(pos, 0, len(d_ids) - 1)
    hit = d_ids[pos_c] == c_ids
    c_langs = np.where(hit, d_langs[pos_c], "").astype(object)
    ref = ray.put((c_ids, X, c_langs))

    def block_topk(batch: pa.Table) -> pd.DataFrame:
        ids, Xm, langs = ray.get(ref)
        Q = _norm_rows(_matrix_from_arrow(batch, vec_col))
        qids = batch[id_col].to_numpy()
        scores = Q @ Xm.T
        order = np.argsort(-scores, axis=1, kind="stable")
        out = {"query_id": [], "lang_a": [], "rank": [],
               "vec_id": [], "lang_b": [], "score": []}
        for qi in range(scores.shape[0]):
            # query language rides the broadcast too (id-aligned);
            # no language row -> dropped from both sides (the SQL
            # twin's inner joins do the same)
            pos = np.searchsorted(ids, int(qids[qi]))
            qlang = (langs[pos] if pos < len(ids)
                     and ids[pos] == int(qids[qi]) else "")
            if qlang == "":
                continue
            rank = 0
            for j in order[qi]:
                if (int(ids[j]) == int(qids[qi])
                        or langs[j] == qlang or langs[j] == ""):
                    continue
                rank += 1
                if rank > k:
                    break
                out["query_id"].append(int(qids[qi]))
                out["lang_a"].append(qlang)
                out["rank"].append(rank)
                out["vec_id"].append(int(ids[j]))
                out["lang_b"].append(langs[j])
                out["score"].append(round(float(scores[qi, j]), 4))
        return pd.DataFrame({
            "query_id": pd.Series(out["query_id"], dtype="int64"),
            "lang_a": pd.Series(out["lang_a"], dtype="object"),
            "rank": pd.Series(out["rank"], dtype="int64"),
            "vec_id": pd.Series(out["vec_id"], dtype="int64"),
            "lang_b": pd.Series(out["lang_b"], dtype="object"),
            "score": pd.Series(out["score"], dtype="float64")})

    return emb_ds.map_batches(block_topk, batch_format="pyarrow",
                              batch_size=batch_size)


def knn_graph_lsh(ds, k: int = 5, num_bands: int = 8,
                  bits_per_band: int = 0, target_bucket: int = 64,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  num_parts: int = 64):
    """APPROXIMATE all-pairs cosine k-NN graph via banded hyperplane
    LSH — the scale path for :func:`knn_graph`, whose broadcast
    corpus matrix stops fitting a worker heap past ~10M vectors:
    instead of every-vs-every, each vector scores only against its
    LSH bucket mates, so total compare work is
    ``num_bands * n * target_bucket`` instead of ``n^2``.

    Same banding as :func:`embedding_neardup_pairs`: ``num_bands``
    independent sign-bit codes whose width scales with corpus size
    (``log2(n / target_bucket)``), so buckets stay ~``target_bucket``
    rows at any scale.  A node's candidate set is the union of its
    bucket mates across bands; recall follows the banded LSH curve
    (1-(1-p^r)^B) and is pinned by the hash-checked gate of
    :func:`graph_recall_floor` against the exact twin.

    Exactness of what IS returned: scores are the same normalized
    float64 dot products :func:`knn_graph` computes (the same pair
    scored in two different buckets yields the bit-identical float,
    so cross-band dedup is exact), ranked (-score, vec_id) with
    rounding to 4 decimals AFTER ranking.

    Shuffle discipline: vectors ride ONE coarse (band, bucket)-keyed
    exchange (``num_bands`` copies of the corpus — the documented
    price of banding; ids-and-floats candidate rows, k-bounded per
    (node, band), ride a second coarse node-keyed exchange for the
    cross-band merge).  Bucket groups are collapsed inside the part
    group fn (millions of tiny Ray-level groups would pay ~1ms each).
    Output (query_id, rank, vec_id, score) — the knn_graph layout.
    """
    import ray

    ds = ds.materialize()                  # count + dim peek + code scan
    n = ds.count()
    if n == 0:
        import ray.data as _rd
        return _rd.from_arrow(_empty_knn_table())
    first = ds.take(1)
    dim = len(first[0][vec_col])
    bits_per_band, planes, weights = _lsh_setup(
        n, dim, num_bands, bits_per_band, target_bucket, seed=11)
    planes_ref = ray.put(planes)

    def code_batch(batch: pa.Table) -> pd.DataFrame:
        P = ray.get(planes_ref)
        X = _matrix_from_arrow(batch, vec_col)
        ids = batch[id_col].to_numpy()
        if X.size == 0:
            # typed_if_empty would declare the binary vec column
            # pa.string() (its documented textual assumption) and
            # conflict with real blocks' float64 arrays — build the
            # correctly-typed empty Arrow table explicitly
            return pa.schema([
                (id_col, pa.int64()), ("bkey", pa.int64()),
                ("part", pa.int64()),
                ("vec", pa.list_(pa.float64()))]).empty_table()
        bits = (X @ P.T) >= 0.0                     # (n, bands*bits)
        out = []
        Xn = _norm_rows(X)
        for b in range(num_bands):
            seg = bits[:, b * bits_per_band:(b + 1) * bits_per_band]
            bucket = (seg.astype(np.int64) * weights).sum(axis=1)
            out.append(pd.DataFrame({
                id_col: ids.astype("int64"),
                "bkey": (np.int64(b) << np.int64(bits_per_band))
                        | bucket,
                "vec": list(Xn)}))
        o = pd.concat(out, ignore_index=True)
        o["part"] = coarse_part(o["bkey"], num_parts)
        return o[[id_col, "bkey", "part", "vec"]]

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        outs_q, outs_v, outs_s = [], [], []
        for _, g in group.groupby("bkey", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values(id_col, kind="mergesort")
            ids = g[id_col].to_numpy()
            X = np.stack(g["vec"].to_numpy())
            S = X @ X.T
            kk = min(k + 1, S.shape[1])
            order = np.argsort(-S, axis=1, kind="stable")[:, :kk]
            for qi in range(S.shape[0]):
                rank = 0
                for j in order[qi]:
                    if ids[j] == ids[qi]:
                        continue
                    rank += 1
                    if rank > k:
                        break
                    outs_q.append(int(ids[qi]))
                    outs_v.append(int(ids[j]))
                    outs_s.append(float(S[qi, j]))
        out = pd.DataFrame({
            "query_id": pd.Series(outs_q, dtype="int64"),
            "vec_id": pd.Series(outs_v, dtype="int64"),
            "raw": pd.Series(outs_s, dtype="float64")})
        out["part"] = coarse_part(out["query_id"], num_parts)
        return typed_if_empty(out)

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["query_id", "vec_id"])
        g = g.sort_values(["query_id", "raw", "vec_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        g["rank"] = (g.groupby("query_id", sort=False).cumcount()
                     + 1).astype("int64")
        g = g[g["rank"] <= k].copy()
        g["score"] = g["raw"].round(4)
        return typed_if_empty(
            g[["query_id", "rank", "vec_id", "score"]]
            .reset_index(drop=True))

    return (ds.map_batches(code_batch, batch_format="pyarrow")
            .groupby("part")
            .map_groups(bucket_topk, batch_format="pandas")
            .groupby("part")
            .map_groups(merge_topk, batch_format="pandas"))


def graph_recall_floor(approx_ds, exact_ds, floor_milli: int,
                       num_parts: int = 64) -> pa.Table:
    """Distributed recall gate for corpus-sized k-NN GRAPHS — the
    :func:`ann_recall_floor` contract (one literal gate row the SQL
    oracle states verbatim) without its driver-side pandas: here BOTH
    inputs have every node as a query, so per-query detail is
    corpus-sized and must never be gathered.  Tagged rows meet on one
    coarse query_id exchange; each group emits a single
    (sum_milli, n_q) partial; the driver folds <= num_parts partials
    into (n_queries, floor_milli, meets)."""

    cols = ["query_id", "vec_id", "kind", "part"]

    def tag(kind):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            if batch.empty or "query_id" not in batch.columns:
                return pa.schema(
                    [(c, pa.int64()) for c in cols]).empty_table()
            out = pd.DataFrame({
                "query_id": batch["query_id"].astype("int64"),
                "vec_id": batch["vec_id"].astype("int64")})
            out["kind"] = np.int64(kind)
            out["part"] = coarse_part(out["query_id"], num_parts)
            return out[cols]
        return fn

    def partial(group: pd.DataFrame) -> pd.DataFrame:
        e = group[group["kind"] == 0]
        a = group[group["kind"] == 1]
        got = (a.groupby("query_id")["vec_id"].agg(set)
               if len(a) else {})
        s_milli = 0
        n_q = 0
        for qid, grp in e.groupby("query_id"):
            want = set(grp["vec_id"])
            hit = len(want & (got.get(qid, set()) if len(a) else set()))
            s_milli += (1000 * hit) // len(want)
            n_q += 1
        return pd.DataFrame({
            "sum_milli": pd.Series([s_milli], dtype="int64"),
            "n_q": pd.Series([n_q], dtype="int64")})

    parts = (exact_ds.map_batches(tag(0), batch_format="pandas")
             .union(approx_ds.map_batches(tag(1), batch_format="pandas"))
             .groupby("part")
             .map_groups(partial, batch_format="pandas")
             .take_all())                       # <= num_parts tiny rows
    n_q = sum(int(r["n_q"]) for r in parts)
    mean = (sum(int(r["sum_milli"]) for r in parts) // n_q) if n_q else 0
    return pa.table({
        "n_queries": pa.array([n_q], pa.int64()),
        "floor_milli": pa.array([int(floor_milli)], pa.int64()),
        "meets": pa.array([1 if mean >= floor_milli else 0],
                          pa.int64())})
