"""Link-graph operators for web-corpus curation.

PageRank over the hyperlink graph is the classic crawl-prioritization
/ page-quality authority signal (the Common-Crawl-era counterpart of
the text quality scores in ``stages/text_analysis``).  The reference
engine has no graph surface; this is the web-scale extension, built
with the same machinery as ``dedup_clusters``'s label propagation:
ids-only coarse-key exchanges, per-round materialization of a
node-sized table, NO graph-sized driver state.

Exactness: all rank mass lives on an integer grid (``scale`` units =
total mass 1.0) with floor division at exactly two points per round —
``r // deg`` per out-edge source and ``damping_pct * inflow // 100``
per node — so integer sums are aggregation-order-free and a DuckDB
twin with the identical operation order is bit-exact.  Dangling nodes
(out-degree 0) drop their mass, the standard batch simplification.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from doc_ocr_ray.util import coarse_part, typed_if_empty


def _bound_blocks(num_parts: int) -> int:
    """Single audited home of the iterative-op block bound: every
    per-round (and build) materialize repartitions to this count,
    because a sort's output block count tracks its input's and
    feeding a round's output back in grows blocks per round
    (64 to 1416 in 4 hops once, at sf0.1 - the bfs_hops lesson)."""
    return max(8, num_parts // 2)


def _typed_empty(df: pd.DataFrame, cols, int8_cols=()):
    """Zero-row frames -> TYPED Arrow blocks with the stage's int64
    schema (``int8_cols`` override for tag columns) — the shared body
    of every stage-local ``_typed`` here; a schema-less empty block
    entering a groupby sort crashes schema unification
    order-dependently (CLAUDE.md)."""
    if len(df):
        return df
    return pa.schema([(c, pa.int8() if c in int8_cols else pa.int64())
                      for c in cols]).empty_table()


def pagerank(edges_ds, nodes_ds, iters: int = 3, damping_pct: int = 85,
             scale: int = 10 ** 12, num_parts: int = 64,
             checkpoint_dir: str | None = None):
    """Integer-grid PageRank.

    ``edges_ds``: (src:int64, dst:int64) directed links — multi-edges
    and self-loops are cleaned here (DISTINCT, src != dst).
    ``nodes_ds``: (node:int64) the full node set; nodes may have no
    edges.  Returns (node, rank_scaled) after ``iters`` rounds from
    the uniform start ``scale // n``.

    Per round, ONE ids-only exchange (round-3 verdict item 7 — the
    previous shape paid two): node part(v) is the SAME key scatter
    needs for src=v and gather needs for node v, so the gather of
    round k and the scatter of round k+1 fuse into one group fn —
    the only rows that truly cross partitions are the contributions
    moving from part(src) to part(dst).  Round 1's contributions
    need no exchange at all (the uniform start is analytic:
    ``r0 // deg`` per edge, combined per dst inside each batch), and
    contributions are pre-summed per dst INSIDE the group before the
    exchange, bounding per-round traffic by nodes x parts instead of
    edges.  The fused output is materialized once per round —
    without it, round k would re-execute all k-1 prior rounds (lazy
    lineage).  Edges are degree-annotated and materialized once.

    ``checkpoint_dir``: per-ROUND checkpoint resume — the iterative
    counterpart of the sharded jobs' per-partition manifests: after
    each round the node-sized rank table commits atomically
    (tmp+rename, ``sources/io.write_table`` round partitions), and a
    restarted call with the same dir skips every committed round by
    reloading the LATEST one instead of recomputing rounds 1..k
    (day-long 10^12-node runs die mid-iteration; re-running rounds
    is the expensive part, the edge rebuild is one exchange).  Rank
    mass is exact integers, so a resumed run is bit-identical to an
    uninterrupted one — pinned by test.  The caller owns parameter
    identity (same graph/iters/damping per dir), matching the
    reference's resume contract in jobs/_driver.
    """
    base_cols = ["src", "dst", "deg", "r", "kind", "part"]

    def _typed(df: pd.DataFrame):
        return _typed_empty(df, base_cols, int8_cols=("kind",))

    # --- ONE build exchange: edges keyed part(src) meet nodes keyed
    # part(node) — cross-batch dedup for both, degree annotation, AND
    # the dangling-source filter (an edge whose src is not in the
    # node table never pushes in ANY round — ranks only ever exist
    # for nodes — so dropping it here preserves semantics exactly
    # while making the analytic round-1 contributions correct;
    # round-4 review finding: uniform_contribs previously granted r0
    # to every edge src).  Edges to non-node dst STAY: they shape the
    # source's out-degree, and their contributions drop at gather,
    # both exactly as before.
    def edge_key(batch: pd.DataFrame) -> pd.DataFrame:
        e = batch[["src", "dst"]].drop_duplicates()
        e = e[e["src"] != e["dst"]]
        out = pd.DataFrame({
            "src": e["src"].astype("int64"),
            "dst": e["dst"].astype("int64"),
            "deg": np.int64(0), "r": np.int64(0)})
        out["kind"] = np.int8(0)
        out["part"] = coarse_part(out["src"], num_parts)
        return _typed(out[base_cols])

    def node_key(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "src": batch["node"].astype("int64"),
            "dst": np.int64(0), "deg": np.int64(0), "r": np.int64(0)})
        out = out.drop_duplicates("src")      # in-batch combiner
        out["kind"] = np.int8(2)
        out["part"] = coarse_part(out["src"], num_parts)
        return _typed(out[base_cols])

    def build_group(group: pd.DataFrame) -> pd.DataFrame:
        # exact cross-batch DISTINCT for nodes (a duplicate node row
        # would inflate n and emit two rank rows) AND edges (a
        # duplicate edge would double-push), then the src-in-nodes
        # filter and per-src out-degree
        nd = group[group["kind"] == 2].drop_duplicates(["src"])
        e = group[group["kind"] == 0].drop_duplicates(["src", "dst"])
        e = e[e["src"].isin(set(nd["src"]))]
        if len(e):
            e = e.assign(deg=e.groupby("src", sort=False)["src"]
                         .transform("size").astype("int64"))
        out = pd.concat([p for p in (e[base_cols], nd[base_cols])
                         if len(p)], ignore_index=True) \
            if len(e) or len(nd) else pd.DataFrame(columns=base_cols)
        return _typed(out)

    # the repartition bounds the block count the splits inherit: the
    # build sort tracks its (raw, often 100+-block) input, and every
    # later round's sort cost tracks THESE block counts
    static = (edges_ds.map_batches(edge_key, batch_format="pandas")
              .union(nodes_ds.map_batches(node_key,
                                          batch_format="pandas"))
              .groupby("part").map_groups(build_group,
                                          batch_format="pandas")
              .repartition(_bound_blocks(num_parts))
              .materialize())

    def only(kind):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return _typed(batch[batch["kind"] == kind][base_cols])
        return fn

    # split MATERIALIZED: the per-round unions consume both tables
    # every round, and a lazy filter would re-scan the whole static
    # table (edge rows included) each time — measured 2x wall at
    # sf0.1 before this materialize
    edges = static.map_batches(only(0),
                               batch_format="pandas").materialize()
    nodes = static.map_batches(only(2),
                               batch_format="pandas").materialize()
    del static     # free the duplicate copy (splits hold the same rows)
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda b: pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                    "rank_scaled": pd.Series(
                                        [], dtype="int64")}),
            batch_format="pandas")
    base_mass = (scale * (100 - damping_pct) // 100) // n
    r0 = scale // n

    def init_rank(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["r"] = np.int64(r0)
        out["kind"] = np.int8(1)
        return _typed(out[base_cols])

    ranks = nodes.map_batches(init_rank,
                              batch_format="pandas").materialize()

    def from_ckpt(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "src": batch["node"].astype("int64"),
            "dst": np.int64(0), "deg": np.int64(0),
            "r": batch["r"].astype("int64")})
        out["kind"] = np.int8(1)
        out["part"] = coarse_part(out["src"], num_parts)
        return _typed(out[base_cols])

    def to_ckpt(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": batch["src"].astype("int64"),
            "r": batch["r"].astype("int64")})

    start_round = 0
    if checkpoint_dir is not None:
        import glob as _glob

        import ray.data
        done = sorted(
            int(os.path.basename(p).split("-")[1])
            for p in _glob.glob(os.path.join(checkpoint_dir, "part-*")))
        usable = [k for k in done if k <= iters]
        if usable:
            start_round = max(usable)
            files = sorted(_glob.glob(os.path.join(
                checkpoint_dir, f"part-{start_round:05d}", "**",
                "*.parquet"), recursive=True))
            ranks = (ray.data.read_parquet(files)
                     .map_batches(from_ckpt, batch_format="pandas")
                     .materialize())

    def _scatter_from(e: pd.DataFrame, rk: pd.DataFrame) -> pd.DataFrame:
        """Edges meet rank rows (same src part): per-dst-COMBINED
        contributions keyed by part(dst) — the in-group combiner
        bounds exchange volume by distinct dst, not edge count."""
        if not len(e) or not len(rk):
            return pd.DataFrame(columns=base_cols)
        m = e.merge(rk[["src", "r"]], on="src", suffixes=("", "_rank"))
        if not len(m):
            return pd.DataFrame(columns=base_cols)
        per_dst = (pd.DataFrame({
            "dst": m["dst"].astype("int64"),
            "c": (m["r_rank"] // m["deg"]).astype("int64")})
            .groupby("dst", sort=False)["c"].sum())
        out = pd.DataFrame({
            "src": per_dst.index.to_numpy(),    # dst becomes the key
            "dst": np.int64(0), "deg": np.int64(0),
            "r": per_dst.to_numpy().astype("int64")})
        out["kind"] = np.int8(3)
        out["part"] = coarse_part(out["src"], num_parts)
        return out[base_cols]

    def scatter(group: pd.DataFrame) -> pd.DataFrame:
        """Rank rows meet out-edges (checkpoint-resume bootstrap)."""
        return _typed(_scatter_from(group[group["kind"] == 0],
                                    group[group["kind"] == 1]))

    def _gather_df(group: pd.DataFrame) -> pd.DataFrame:
        """Contributions meet the node table: new rank for EVERY node."""
        nd = group.loc[group["kind"] == 2, ["src", "part"]]
        if not len(nd):
            return pd.DataFrame(columns=base_cols)
        c = group[group["kind"] == 3]
        infl = c.groupby("src", sort=False)["r"].sum()
        out = nd.copy()
        # reindex with an int64 fill, NOT map+fillna: map on a partial
        # index yields NaN -> float64, silently rounding inflow sums
        # past 2^53 (breaks the documented bit-exactness at high scale)
        inflow = (infl.reindex(out["src"].to_numpy(), fill_value=0)
                  .to_numpy().astype("int64"))
        out["r"] = base_mass + (damping_pct * inflow) // 100
        out["dst"] = np.int64(0)
        out["deg"] = np.int64(0)
        out["kind"] = np.int8(1)
        return out[base_cols]

    def gather(group: pd.DataFrame) -> pd.DataFrame:
        return _typed(_gather_df(group))

    emit_ranks = checkpoint_dir is not None

    def fused(group: pd.DataFrame) -> pd.DataFrame:
        """gather(round k) + scatter(round k+1) in one group: emits
        next-round contributions (kind 3) and, when checkpointing,
        this round's rank rows (kind 1) for the atomic write."""
        rk = _gather_df(group)
        if not len(rk):
            return _typed(pd.DataFrame(columns=base_cols))
        nxt = _scatter_from(group[group["kind"] == 0], rk)
        if emit_ranks:
            nxt = (pd.concat([rk, nxt], ignore_index=True)
                   if len(nxt) else rk)
        return _typed(nxt)

    def uniform_contribs(batch: pd.DataFrame) -> pd.DataFrame:
        """Round-1 contributions straight off the edge table — the
        uniform start r0 is a CONSTANT, so no rank rows need to meet
        the edges and the first round costs zero exchanges."""
        e = batch[batch["kind"] == 0]
        rk = pd.DataFrame({"src": e["src"].unique()})
        rk["r"] = np.int64(r0)
        return _typed(_scatter_from(e, rk))

    if start_round >= iters:
        contribs = None                    # resumed past the last round
    elif start_round == 0:
        contribs = edges.map_batches(uniform_contribs,
                                     batch_format="pandas")
    else:
        # checkpoint resume: loaded ranks are non-uniform — one
        # bootstrap exchange rebuilds the in-flight contributions
        contribs = (edges.union(ranks)
                    .groupby("part").map_groups(scatter,
                                                batch_format="pandas"))

    for k in range(start_round + 1, iters + 1):
        if k < iters:
            # repartition before materialize: contribs feed the
            # previous round's blocks back in, and the sort's output
            # block count tracks its input's — unbounded iteration
            # counts need the bound (the bfs_hops lesson)
            out = (edges.union(nodes).union(contribs)
                   .groupby("part").map_groups(fused,
                                               batch_format="pandas")
                   .repartition(_bound_blocks(num_parts))
                   .materialize())
            contribs = out.map_batches(
                lambda b: _typed(b[b["kind"] == 3]),
                batch_format="pandas")
            if emit_ranks:
                ranks = out.map_batches(
                    lambda b: _typed(b[b["kind"] == 1]),
                    batch_format="pandas")
        else:
            ranks = (nodes.union(contribs)
                     .groupby("part").map_groups(gather,
                                                 batch_format="pandas")
                     .materialize())
        if checkpoint_dir is not None:
            from doc_ocr_ray.sources.io import write_table
            write_table(ranks.map_batches(to_ckpt,
                                          batch_format="pandas"),
                        checkpoint_dir, partition_id=k,
                        parquet_only=True)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": batch["src"].astype("int64"),
            "rank_scaled": batch["r"].astype("int64")})

    return ranks.map_batches(finish, batch_format="pandas")


def triangle_count(edges_ds, num_parts: int = 64):
    """Exact global triangle count over the (undirected) link graph —
    the clustering/link-spam signal next to :func:`pagerank`.  Input
    (src, dst) directed links; loops drop, multi-edges and direction
    collapse to canonical u<v pairs.  Returns a 1-row table
    ``(n_triangles,)``.

    Scale shape — the standard degree-ordered orientation (each edge
    is charged to its lower-(degree, id) endpoint, so per-node
    out-degree is O(sqrt(m)) and hub wedges never blow up), FUSED to
    four ids-only exchanges (was six + two materializes):

    1. node-keyed: each canonical edge ships to BOTH endpoints (after
       a per-batch dedup combiner); a node's group drops cross-batch
       duplicates and knows its exact degree = distinct incident
       edges, so dedup, degree counting AND half-annotation happen in
       ONE exchange — no separate dedupe pass, no degree table, no
       tagged-union lookup joins;
    2. pair-keyed: the two endpoint-degree half-records per edge meet,
       orient low->high by (deg, id) -> (x, y), materialized once
       (consumed by 3 and 4);
    3. x-keyed: each oriented source's out-neighbor PAIRS (the
       wedges) — bounded by outdeg^2 <= m per node;
    4. pair-keyed: wedges meet the oriented edges (reconstructed
       canonical pairs); matches are triangles, counted with
       per-partition partials.

    Each triangle u<v<w (by the orientation order) is emitted exactly
    once — by its smallest vertex's wedge — so the count is exact, no
    de-dup pass needed."""
    def to_both_endpoints(batch: pd.DataFrame) -> pd.DataFrame:
        e = batch[batch["src"] != batch["dst"]]
        u = np.minimum(e["src"].astype("int64"),
                       e["dst"].astype("int64"))
        v = np.maximum(e["src"].astype("int64"),
                       e["dst"].astype("int64"))
        pairs = pd.DataFrame({"u": u, "v": v}).drop_duplicates()
        out = pd.concat([
            pairs.assign(key=pairs["u"]),
            pairs.assign(key=pairs["v"])], ignore_index=True)
        out["key"] = out["key"].astype("int64")
        out["part"] = coarse_part(out["key"], num_parts)
        return typed_if_empty(out)

    def degree_halves(group: pd.DataFrame) -> pd.DataFrame:
        # per node in the part: distinct incident edges (cross-batch
        # dedup happens HERE — every copy of (u,v) keyed by n lands in
        # n's group), degree = their count, emit one half-record per
        # edge carrying this endpoint's degree
        g = group.drop_duplicates(["key", "u", "v"])
        deg = g.groupby("key", sort=False)["u"].transform("size")
        out = pd.DataFrame({
            "u": g["u"].to_numpy(), "v": g["v"].to_numpy(),
            "at_u": (g["key"] == g["u"]).to_numpy(),
            "deg": deg.to_numpy().astype("int64")})
        out["part"] = coarse_part(out["u"] * 1_000_003 + out["v"],
                                  num_parts)
        return typed_if_empty(out)

    halves = (edges_ds.map_batches(to_both_endpoints,
                                   batch_format="pandas")
              .groupby("part").map_groups(degree_halves,
                                          batch_format="pandas"))

    def orient(group: pd.DataFrame) -> pd.DataFrame:
        # pivot the two half-records per (u, v) into (deg_u, deg_v)
        # and orient; vectorized two-row pivot via sort + reshape
        g = group.sort_values(["u", "v", "at_u"],
                              ascending=[True, True, False])
        n2 = len(g)
        if n2 % 2:          # defensive: malformed input never pairs up
            raise ValueError("triangle_count: unpaired half-record")
        du = g["deg"].to_numpy()[0::2]          # at_u=True first
        dv = g["deg"].to_numpy()[1::2]
        u = g["u"].to_numpy()[0::2]
        v = g["v"].to_numpy()[0::2]
        lo_first = (du < dv) | ((du == dv) & (u < v))
        out = pd.DataFrame({
            "x": np.where(lo_first, u, v).astype("int64"),
            "y": np.where(lo_first, v, u).astype("int64")})
        out["part"] = coarse_part(out["x"], num_parts)
        return typed_if_empty(out)

    oriented = (halves.groupby("part")
                .map_groups(orient, batch_format="pandas")
                .materialize())     # consumed 2x: wedges, close

    def wedges(group: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _x, nbrs in group.groupby("x", sort=False)["y"]:
            a = np.sort(nbrs.to_numpy())
            if len(a) < 2:
                continue
            iu = np.triu_indices(len(a), k=1)
            outs.append(pd.DataFrame({"wu": a[iu[0]], "wv": a[iu[1]]}))
        if not outs:
            return typed_if_empty(pd.DataFrame({
                "wu": pd.Series([], dtype="int64"),
                "wv": pd.Series([], dtype="int64")}))
        return pd.concat(outs, ignore_index=True)

    wedge_ds = oriented.groupby("part").map_groups(
        wedges, batch_format="pandas")

    # --- close wedges against canonical edges on the pair key
    def tag_wedge(batch: pd.DataFrame) -> pd.DataFrame:
        u = np.minimum(batch["wu"], batch["wv"]).astype("int64")
        v = np.maximum(batch["wu"], batch["wv"]).astype("int64")
        out = pd.DataFrame({"u": u, "v": v})
        out["side"] = np.int8(0)
        out["part"] = coarse_part(out["u"] * 1_000_003 + out["v"],
                                  num_parts)
        return typed_if_empty(out)

    def tag_edge(batch: pd.DataFrame) -> pd.DataFrame:
        # oriented (x, y) IS the distinct canonical edge — restore
        # the (min, max) pair form for the close key
        out = pd.DataFrame({
            "u": np.minimum(batch["x"], batch["y"]).astype("int64"),
            "v": np.maximum(batch["x"], batch["y"]).astype("int64")})
        out["side"] = np.int8(1)
        out["part"] = coarse_part(out["u"] * 1_000_003 + out["v"],
                                  num_parts)
        return typed_if_empty(out)

    def close(group: pd.DataFrame) -> pd.DataFrame:
        real = group[group["side"] == 1][["u", "v"]]
        cand = group[group["side"] == 0][["u", "v"]]
        if not len(cand) or not len(real):
            return pd.DataFrame({"n": pd.Series([], dtype="int64")})
        merged = cand.merge(real.drop_duplicates(), on=["u", "v"])
        return pd.DataFrame({"n": [np.int64(len(merged))]})

    parts = (wedge_ds.map_batches(tag_wedge, batch_format="pandas")
             .union(oriented.map_batches(tag_edge,
                                         batch_format="pandas"))
             .groupby("part").map_groups(close, batch_format="pandas")
             .to_pandas())
    total = int(parts["n"].sum()) if len(parts) else 0
    return pa.table({"n_triangles": pa.array([total], pa.int64())})


def host_graph(edges_ds, src_col: str = "src_url",
               dst_col: str = "dst_url", num_parts: int = 64):
    """Collapse the page-level link graph to the HOST graph — the
    domain-authority / link-spam aggregation every web-corpus
    pipeline runs before host-level decisions (crawl budgets,
    domain-level quality priors, link-farm detection): one row per
    (src_host, dst_host) with

      - ``n_links``     total page-level links between the hosts,
      - ``n_src_pages`` DISTINCT linking source pages (the farm
        signal: high n_links over one page is a widget, over many
        pages a sitewide template or farm).

    Hosts come from the shared :func:`doc_ocr_ray.stages.urls`
    canonicalization chain (scheme/www strip, query cut), so the same
    URL never splits across scheme variants.  Intra-host edges
    (src_host == dst_host) are kept — their share is the template
    signal; filter downstream if not wanted.

    Shuffle shape: the in-batch combiner collapses to DISTINCT
    (src_host, dst_host, src_page) rows carrying a link-count
    partial, so a page linking its sibling 10^4 times ships ONE row;
    one coarse host-pair exchange sums counts and counts distinct
    pages vectorized in the group.  Exchange volume is bounded by
    distinct (host-pair, page) — the irreducible distinct-page
    signal.
    """
    from doc_ocr_ray.stages.urls import canonicalize_urls

    _empty = pd.DataFrame({
        "src_host": pd.Series([], dtype="object"),
        "dst_host": pd.Series([], dtype="object"),
        "src_page": pd.Series([], dtype="object"),
        "cnt": pd.Series([], dtype="int64"),
        "part": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return typed_if_empty(_empty)
        s = canonicalize_urls(batch[[src_col]].rename(
            columns={src_col: "url"}), "url")
        d = canonicalize_urls(batch[[dst_col]].rename(
            columns={dst_col: "url"}), "url")
        g = (pd.DataFrame({"src_host": s["domain"].to_numpy(),
                           "dst_host": d["domain"].to_numpy(),
                           "src_page": s["canon_url"].to_numpy()})
             .groupby(["src_host", "dst_host", "src_page"], sort=False)
             .size().reset_index(name="cnt"))
        g["cnt"] = g["cnt"].astype("int64")
        g["part"] = coarse_part(g["src_host"] + "\x1f" + g["dst_host"],
                                num_parts)
        return g

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        # a (pair, page) row may arrive once per upstream batch —
        # sum its count partials, THEN count distinct pages
        pp = (group.groupby(["src_host", "dst_host", "src_page"],
                            sort=False)["cnt"].sum().reset_index())
        out = (pp.groupby(["src_host", "dst_host"], sort=False)
               .agg(n_links=("cnt", "sum"),
                    n_src_pages=("src_page", "nunique"))
               .reset_index())
        out["n_links"] = out["n_links"].astype("int64")
        out["n_src_pages"] = out["n_src_pages"].astype("int64")
        return typed_if_empty(out)

    return (edges_ds.map_batches(partial, batch_format="pandas")
            .groupby("part").map_groups(combine, batch_format="pandas"))


def hits(edges_ds, nodes_ds, iters: int = 2, scale: int = 10 ** 9,
         num_parts: int = 64):
    """Integer-grid HITS (Kleinberg 1999): hub and authority scores
    over the directed link graph — :func:`pagerank`'s companion
    signal (PageRank ranks endorsement mass; HITS separates pages
    that POINT at good content from pages that ARE good content, the
    classic hub-farm / mixed-directory discriminant).

    Exactness: L1 normalization on the integer grid replaces the
    usual float L2 — after each half-step the raw sums renormalize as
    ``scale * raw // total`` (one floor division, order-free integer
    sums), so a chained-CTE DuckDB twin is bit-exact.  ``scale=1e9``
    bounds every intermediate product at ``scale * total < 2^63``
    for totals up to ~9e9 x scale (total = sum over edges of a
    normalized score <= scale per node).

    Shuffle shape per half-step: ONE ids-only coarse exchange
    (round-3 verdict item 7 — previously two): the L1 total needed
    between gather and the next push is just ``sum(contributions)``
    (reindex fill-0 adds nothing), an O(1) driver scalar off the
    contribution stream — so the gather+normalize of half-step s and
    the push of half-step s+1 fuse into one group fn keyed by the
    node part (which is both where contributions land and where the
    next direction's edge copy lives).  The first half-step's
    contributions are analytic (uniform hubs are a constant —
    ``(scale // n) * indeg`` straight off the edge table, zero
    exchanges), contributions pre-sum per receiver inside each
    group, and each fused output repartitions before materializing
    (the bfs_hops block-growth rule).  Edge tables (one keyed by
    src, one by dst) are degree-free and materialized once.
    Returns (node, auth_scaled, hub_scaled)."""
    if iters < 1:
        # the final zip consumes the last half-step's auth table;
        # with zero iterations there is none to zip
        raise ValueError(f"hits requires iters >= 1, got {iters}")
    base_cols = ["src", "dst", "r", "kind", "part"]

    def _typed(df: pd.DataFrame):
        return _typed_empty(df, base_cols, int8_cols=("kind",))

    def edge_key(key_col):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            # per-batch combiner only — a multi-edge split across
            # batches still needs the grouped global dedup below
            e = batch[["src", "dst"]].drop_duplicates()
            e = e[e["src"] != e["dst"]]
            out = pd.DataFrame({
                "src": e["src"].astype("int64"),
                "dst": e["dst"].astype("int64"),
                "r": np.int64(0)})
            out["kind"] = np.int8(0)
            out["part"] = coarse_part(out[key_col], num_parts)
            return typed_if_empty(out)
        return fn

    def node_key(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "src": batch["node"].astype("int64"),
            "dst": np.int64(0), "r": np.int64(0)})
        out = out.drop_duplicates("src")      # in-batch combiner
        out["kind"] = np.int8(2)
        out["part"] = coarse_part(out["src"], num_parts)
        return _typed(out[base_cols])

    # --- build: TWO node-keyed exchanges that dedup edges exactly
    # (cross-batch duplicates would double-push) AND drop every edge
    # with a DANGLING endpoint (round-4 review finding: an edge whose
    # src [dst] is not a node has no score to push in A-steps
    # [H-steps], and its contribution to a non-node would previously
    # drop at gather — filtering both endpoints up front reproduces
    # the old semantics exactly AND keeps non-node receivers out of
    # the stream-summed L1 totals).  Exchange 1 keys part(src):
    # dedup + src-in-nodes; exchange 2 keys part(dst): dst-in-nodes,
    # leaving the dst-keyed edge table; edges_by_src is a re-key map
    # off it.  Node rows ride both exchanges (exact dedup in the
    # first — a duplicate node row inflates n and double-counts raw
    # sums in the L1 total).
    def filter_end(end_col: str, dedup_nodes: bool):
        def fn(group: pd.DataFrame) -> pd.DataFrame:
            nd = group[group["kind"] == 2]
            if dedup_nodes:
                nd = nd.drop_duplicates(["src"])
            e = group[group["kind"] == 0].drop_duplicates(["src",
                                                           "dst"])
            e = e[e[end_col].isin(set(nd["src"]))].copy()
            e["part"] = coarse_part(e["dst"], num_parts)
            out = pd.concat([p for p in (e[base_cols], nd[base_cols])
                             if len(p)], ignore_index=True) \
                if len(e) or len(nd) else pd.DataFrame(columns=base_cols)
            return _typed(out)
        return fn

    static = (edges_ds.map_batches(edge_key("src"),
                                   batch_format="pandas")
              .union(nodes_ds.map_batches(node_key,
                                          batch_format="pandas"))
              .groupby("part").map_groups(filter_end("src", True),
                                          batch_format="pandas")
              .groupby("part").map_groups(filter_end("dst", False),
                                          batch_format="pandas")
              .repartition(_bound_blocks(num_parts))
              .materialize())

    def only(kind):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return _typed(batch[batch["kind"] == kind][base_cols])
        return fn

    # split MATERIALIZED — every half-step's union consumes nodes and
    # one edge copy; lazy filters would re-scan static per half-step
    edges_by_dst = static.map_batches(only(0),
                                      batch_format="pandas").materialize()
    nodes = static.map_batches(only(2),
                               batch_format="pandas").materialize()
    del static     # free the duplicate copy (splits hold the same rows)

    def rekey_src(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["part"] = coarse_part(out["src"], num_parts)
        return _typed(out[base_cols])

    edges_by_src = (edges_by_dst.map_batches(rekey_src,
                                             batch_format="pandas")
                    .materialize())
    n = nodes.count()
    empty_out = pd.DataFrame({
        "node": pd.Series([], dtype="int64"),
        "auth_scaled": pd.Series([], dtype="int64"),
        "hub_scaled": pd.Series([], dtype="int64")})
    if n == 0:
        import ray.data as _rd
        return _rd.from_pandas(empty_out)

    def _push_from(e: pd.DataFrame, scores: pd.DataFrame,
                   src_key: str, dst_key: str) -> pd.DataFrame:
        """Normalized scores meet edges on the pushing side's key:
        per-RECEIVER-combined contributions keyed part(receiver)."""
        if not len(e) or not len(scores):
            return pd.DataFrame(columns=base_cols)
        sc = scores[["src", "r"]].rename(
            columns={"src": src_key, "r": "score"})
        m = e.merge(sc, on=src_key)
        if not len(m):
            return pd.DataFrame(columns=base_cols)
        per_rx = (pd.DataFrame({
            "rx": m[dst_key].astype("int64"),
            "c": m["score"].astype("int64")})
            .groupby("rx", sort=False)["c"].sum())
        out = pd.DataFrame({
            "src": per_rx.index.to_numpy(),
            "dst": np.int64(0),
            "r": per_rx.to_numpy().astype("int64")})
        out["kind"] = np.int8(3)
        out["part"] = coarse_part(out["src"], num_parts)
        return out[base_cols]

    def _gather_norm(group: pd.DataFrame, total: int) -> pd.DataFrame:
        """Raw per-node sums -> L1-normalized score rows (kind 1)."""
        nd = group.loc[group["kind"] == 2, ["src", "part"]]
        if not len(nd):
            return pd.DataFrame(columns=base_cols)
        c = group[group["kind"] == 3]
        infl = c.groupby("src", sort=False)["r"].sum()
        raw = (infl.reindex(nd["src"].to_numpy(), fill_value=0)
               .to_numpy().astype("int64"))
        out = nd.copy()
        out["r"] = ((scale * raw) // total if total
                    else np.zeros(len(raw), dtype="int64"))
        out["dst"] = np.int64(0)
        out["kind"] = np.int8(1)
        return out[base_cols]

    def fused_step(total: int, src_key: str, dst_key: str,
                   emit_scores: bool):
        """gather+normalize of half-step s, push of half-step s+1."""
        def fn(group: pd.DataFrame) -> pd.DataFrame:
            sc = _gather_norm(group, total)
            if not len(sc):
                return _typed(pd.DataFrame(columns=base_cols))
            nxt = _push_from(group[group["kind"] == 0], sc,
                             src_key, dst_key)
            if emit_scores:
                nxt = (pd.concat([sc, nxt], ignore_index=True)
                       if len(nxt) else sc)
            return _typed(nxt)
        return fn

    def final_gather(total: int):
        def fn(group: pd.DataFrame) -> pd.DataFrame:
            return _typed(_gather_norm(group, total))
        return fn

    def uniform_contribs(batch: pd.DataFrame) -> pd.DataFrame:
        """A1 contributions off the src-keyed edge table: uniform hub
        score is a constant, so no exchange — (scale // n) per edge,
        combined per dst in-batch."""
        e = batch[batch["kind"] == 0]
        if not len(e):
            return _typed(pd.DataFrame(columns=base_cols))
        per_dst = (e.groupby("dst", sort=False)["src"].size()
                   * np.int64(scale // n))
        out = pd.DataFrame({
            "src": per_dst.index.to_numpy().astype("int64"),
            "dst": np.int64(0),
            "r": per_dst.to_numpy().astype("int64")})
        out["kind"] = np.int8(3)
        out["part"] = coarse_part(out["src"], num_parts)
        return _typed(out[base_cols])

    # half-steps s = 1..2*iters alternate auth (odd) / hub (even);
    # contribs_s feed half-step s.  Fused steps run for s < 2*iters
    # (auth scores push along dst->src, hub scores along src->dst);
    # s = 2*iters - 1 also emits the final AUTH table; the last
    # half-step is gather-only.
    contribs = edges_by_src.map_batches(uniform_contribs,
                                        batch_format="pandas")
    auth = None
    for s in range(1, 2 * iters + 1):
        # keep the materialized handle: the union below re-consumes
        # contribs, and without this it would re-run the lazy filter
        # lineage once per half-step (round-4 review finding)
        contribs = contribs.materialize()
        total = int(contribs.sum("r") or 0)
        if s < 2 * iters:
            odd = bool(s % 2)
            next_edges = edges_by_dst if odd else edges_by_src
            src_key, dst_key = ("dst", "src") if odd else ("src", "dst")
            out = (nodes.union(contribs).union(next_edges)
                   .groupby("part")
                   .map_groups(fused_step(total, src_key, dst_key,
                                          s == 2 * iters - 1),
                               batch_format="pandas")
                   .repartition(_bound_blocks(num_parts))
                   .materialize())
            contribs = out.map_batches(
                lambda b: _typed(b[b["kind"] == 3]),
                batch_format="pandas")
            if s == 2 * iters - 1:
                auth = out.map_batches(
                    lambda b: _typed(b[b["kind"] == 1]),
                    batch_format="pandas")
        else:
            hubs = (nodes.union(contribs)
                    .groupby("part")
                    .map_groups(final_gather(total),
                                batch_format="pandas")
                    .materialize())

    def tag(kind):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            out["dst"] = np.int64(kind)      # 0 = auth, 1 = hub
            return _typed(out[base_cols])
        return fn

    def zip_scores(group: pd.DataFrame) -> pd.DataFrame:
        a = group.loc[group["dst"] == 0, ["src", "r"]].rename(
            columns={"r": "auth_scaled"})
        h = group.loc[group["dst"] == 1, ["src", "r"]].rename(
            columns={"r": "hub_scaled"})
        out = a.merge(h, on="src").rename(columns={"src": "node"})
        if not len(out):
            return pa.schema([("node", pa.int64()),
                              ("auth_scaled", pa.int64()),
                              ("hub_scaled", pa.int64())]).empty_table()
        return out[["node", "auth_scaled", "hub_scaled"]]

    return (auth.map_batches(tag(0), batch_format="pandas")
            .union(hubs.map_batches(tag(1), batch_format="pandas"))
            .groupby("part").map_groups(zip_scores,
                                        batch_format="pandas"))


def kcore(edges_ds, k: int = 4, rounds: int = 4, num_parts: int = 64):
    """k-core decomposition by iterative peel — the link-farm /
    well-connectedness signal next to :func:`pagerank` (a page in a
    dense core is structurally unlike a spam leaf).  Input (src, dst)
    directed links; loops drop, direction and multi-edges collapse to
    canonical DISTINCT undirected edges (keyed group fn — cross-batch
    duplicates are real, see CLAUDE.md).  Output: ``(node, deg)`` for
    every node of the edge set remaining after ``rounds`` peel
    rounds, with its degree in that subgraph.

    The CONTRACT is "exactly ``rounds`` peel rounds", converged or
    not — that makes the chained-CTE DuckDB twin bit-exact by
    construction.  The engine still exits early when a round removes
    nothing: each round's edge set is a subset of the previous, so
    equal COUNTS imply equal SETS, and peel is a fixpoint iteration
    (an unchanged edge set never changes again) — the early exit is
    pure optimization, invisible in the result.

    Scale shape (the pagerank discipline): per round THREE ids-only
    coarse exchanges — (1) endpoint explode counts per-node degrees
    and keeps survivors (>= k), (2) edges meet survivors on the
    ``a``-key, (3) re-keyed edges meet survivors on the ``b``-key —
    with the edge table materialized per round (without it round r
    re-executes rounds 1..r-1) and the survivor table materialized
    because two exchanges consume it.  No graph-sized driver state;
    the driver sees one edge count per round."""
    cols = ["a", "b", "part", "kind"]

    def _typed(df: pd.DataFrame):
        return _typed_empty(df, cols)

    def edge_key(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["src"].astype("int64")
        d = batch["dst"].astype("int64")
        e = pd.DataFrame({"a": np.minimum(s, d), "b": np.maximum(s, d)})
        e = e[e["a"] != e["b"]].drop_duplicates()   # in-batch combiner
        e = e.assign(part=coarse_part(e["a"], num_parts),
                     kind=np.int64(0))
        return _typed(e[cols])

    def edge_dedup(group: pd.DataFrame) -> pd.DataFrame:
        return _typed(group.drop_duplicates(["a", "b"])[cols])

    edges = (edges_ds.map_batches(edge_key, batch_format="pandas")
             .groupby("part").map_groups(edge_dedup,
                                         batch_format="pandas")
             .repartition(_bound_blocks(num_parts))
             .materialize())
    n_edges = edges.count()

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "a" not in batch.columns:
            return _typed(pd.DataFrame(columns=cols))
        nodes = pd.concat([batch["a"], batch["b"]], ignore_index=True)
        out = pd.DataFrame({"a": nodes.astype("int64"),
                            "b": np.int64(0)})
        out["part"] = coarse_part(out["a"], num_parts)
        out["kind"] = np.int64(1)
        return _typed(out[cols])

    def survive(group: pd.DataFrame) -> pd.DataFrame:
        deg = group.groupby("a", sort=False).size()
        keep = deg[deg >= k].index
        out = pd.DataFrame({"a": keep.to_numpy(dtype="int64"),
                            "b": np.int64(0)})
        out["part"] = coarse_part(out["a"], num_parts)
        out["kind"] = np.int64(1)
        return _typed(out[cols])

    def filter_on_a(group: pd.DataFrame) -> pd.DataFrame:
        ok = set(group.loc[group["kind"] == 1, "a"])
        e = group[group["kind"] == 0]
        e = e[e["a"].isin(ok)].copy()
        e["part"] = coarse_part(e["b"], num_parts)
        return _typed(e[cols])

    def filter_on_b(group: pd.DataFrame) -> pd.DataFrame:
        # survivors arrive keyed by node == coarse(b) of these edges
        ok = set(group.loc[group["kind"] == 1, "a"])
        e = group[group["kind"] == 0]
        e = e[e["b"].isin(ok)].copy()
        e["part"] = coarse_part(e["a"], num_parts)
        return _typed(e[cols])

    for _ in range(rounds):
        if n_edges == 0:
            break
        # both repartitions are load-bearing (the bfs_hops rule): the
        # edge table feeds its own blocks back through two chained
        # sorts per round, so without the bound block count — and
        # with it every later round's sort cost — grows per round
        surv = (edges.map_batches(explode, batch_format="pandas")
                .groupby("part").map_groups(survive,
                                            batch_format="pandas")
                .repartition(_bound_blocks(num_parts))
                .materialize())           # consumed by BOTH filters
        edges = (edges.union(surv)
                 .groupby("part").map_groups(filter_on_a,
                                             batch_format="pandas")
                 .union(surv)
                 .groupby("part").map_groups(filter_on_b,
                                             batch_format="pandas")
                 .repartition(_bound_blocks(num_parts))
                 .materialize())
        remaining = edges.count()
        if remaining == n_edges:          # subset + equal count = fixpoint
            break
        n_edges = remaining

    def degrees(group: pd.DataFrame) -> pd.DataFrame:
        deg = (group.groupby("a", sort=False).size()
               .reset_index(name="deg"))
        return typed_if_empty(pd.DataFrame({
            "node": deg["a"].astype("int64"),
            "deg": deg["deg"].astype("int64")}))

    return (edges.map_batches(explode, batch_format="pandas")
            .groupby("part").map_groups(degrees, batch_format="pandas"))


def bfs_hops(edges_ds, seeds_ds, max_hops: int = 3,
             num_parts: int = 64):
    """Multi-source BFS over the directed link graph — crawl depth /
    reachability from a seed list (the frontier-expansion primitive
    under focused crawling and influence analysis).  Input ``(src,
    dst)`` directed links (loops drop, multi-edges collapse to
    DISTINCT via a keyed group fn — cross-batch duplicates are real)
    and a ``(node,)`` seed set.  Output ``(node, hop)``: the MINIMUM
    link distance from any seed, for every node within ``max_hops``
    (seeds at hop 0).

    Scale shape: edges dedup once and materialize keyed coarse on
    ``src`` (reused every round); per hop ONE ids-only coarse
    exchange (round-3 verdict item 7 — previously two): part(node)
    is both the key candidates arrive on and the key the node's
    out-edges live on, so the anti-join assigning hop k and the
    expansion emitting hop k+1 candidates fuse into one group fn.
    Seeds enter as hop-0 candidates against an empty visited set;
    the visited table re-emits through each group (so its block
    count stays ~num_parts without the separate union+repartition
    maintenance the two-exchange shape needed); the final hop runs
    assign-only (no edge rows ride that exchange).  The driver sees
    one candidate count per round.  Early exit on an empty
    candidate set is invisible (later rounds add nothing)."""
    cols = ["node", "val", "part", "kind"]

    def _typed(df: pd.DataFrame):
        return _typed_empty(df, cols)

    def edge_key(batch: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame({"node": batch["src"].astype("int64"),
                          "val": batch["dst"].astype("int64")})
        e = e[e["node"] != e["val"]].drop_duplicates()  # combiner
        e = e.assign(part=coarse_part(e["node"], num_parts),
                     kind=np.int64(0))
        return _typed(e[cols])

    def edge_dedup(group: pd.DataFrame) -> pd.DataFrame:
        return _typed(group.drop_duplicates(["node", "val"])[cols])

    edges = (edges_ds.map_batches(edge_key, batch_format="pandas")
             .groupby("part").map_groups(edge_dedup,
                                         batch_format="pandas")
             .repartition(_bound_blocks(num_parts))
             .materialize())

    def seed_key(batch: pd.DataFrame) -> pd.DataFrame:
        s = pd.DataFrame({"node": batch["node"].astype("int64")})
        s = s.drop_duplicates()               # in-batch combiner
        s = s.assign(val=np.int64(0),
                     part=coarse_part(s["node"], num_parts),
                     kind=np.int64(1))
        return _typed(s[cols])

    def seed_dedup(group: pd.DataFrame) -> pd.DataFrame:
        # exact cross-batch DISTINCT: a seed repeated across blocks
        # would emit duplicate (node, 0) output rows
        return _typed(group.drop_duplicates(["node"])[cols])

    # kinds: 0 = edge (node=src, val=dst), 1 = candidate, 2 = visited
    # (node, val=hop).  Seeds enter as hop-0 CANDIDATES; visited
    # starts empty and re-emits through each fused group.
    cand = (seeds_ds.map_batches(seed_key, batch_format="pandas")
            .groupby("part").map_groups(seed_dedup,
                                        batch_format="pandas")
            .materialize())
    import ray.data as _rd
    visited = _rd.from_arrow(pa.schema(
        [(c, pa.int64()) for c in cols]).empty_table())
    n_cand = cand.count()

    def fused_hop(hop: int, last: bool):
        def fn(group: pd.DataFrame) -> pd.DataFrame:
            old = group[group["kind"] == 2]
            seen = set(old["node"])
            c = group[group["kind"] == 1].drop_duplicates(["node"])
            new = c[~c["node"].isin(seen)].copy()
            new["val"] = np.int64(hop)
            new["kind"] = np.int64(2)
            parts = [old[cols], new[cols]]
            if not last and len(new):
                e = group[group["kind"] == 0]
                front = set(new["node"])
                nxt = (e.loc[e["node"].isin(front), ["val"]]
                       .drop_duplicates())
                cand_rows = pd.DataFrame({
                    "node": nxt["val"].astype("int64"),
                    "val": np.int64(0)})
                cand_rows["part"] = coarse_part(cand_rows["node"],
                                                num_parts)
                cand_rows["kind"] = np.int64(1)
                parts.append(cand_rows[cols])
            nonempty = [p for p in parts if len(p)]
            out = (pd.concat(nonempty, ignore_index=True)
                   if nonempty else pd.DataFrame(columns=cols))
            return _typed(out)
        return fn

    for hop in range(0, max_hops + 1):
        if n_cand == 0:
            break
        last = hop == max_hops
        inputs = visited.union(cand)
        if not last:
            inputs = inputs.union(edges)   # final hop is assign-only
        # repartition is load-bearing (the dedup_clusters rule): the
        # sort's output block count tracks its INPUT block count, and
        # visited+cand each feed the previous round's blocks back in —
        # without this the block count doubles per hop (64 -> 1416 in
        # 4 hops at sf0.1) and task overhead swamps the round
        out = (inputs.groupby("part")
               .map_groups(fused_hop(hop, last), batch_format="pandas")
               .repartition(_bound_blocks(num_parts))
               .materialize())
        visited = out.map_batches(
            lambda b: _typed(b[b["kind"] == 2]), batch_format="pandas")
        if last:
            break
        cand = out.map_batches(
            lambda b: _typed(b[b["kind"] == 1]), batch_format="pandas")
        n_cand = cand.count()

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "node" not in batch.columns:
            return typed_if_empty(pd.DataFrame({
                "node": pd.Series([], dtype="int64"),
                "hop": pd.Series([], dtype="int64")}))
        return pd.DataFrame({"node": batch["node"].astype("int64"),
                             "hop": batch["val"].astype("int64")})

    return visited.map_batches(finish, batch_format="pandas")


def random_walks(edges_ds, walk_len: int = 3, seed: int = 42,
                 num_parts: int = 64):
    """Deterministic truncated random walks over the directed link
    graph — the DeepWalk / node2vec corpus-generation primitive
    (Perozzi et al. 2014): walk sequences feed skip-gram training the
    same way ``skipgram_pairs`` consumes token streams.

    One walk starts at every node with at least one out-edge
    (``walk_id`` = start node).  At step ``t`` the walk at node ``u``
    moves to the out-neighbour ``v`` minimizing
    ``(md5(f"{seed}|{walk_id}|{t}|{v}"), v)`` — a deterministic
    pseudo-random choice that is a pure function of (seed, walk_id,
    step, candidate), so re-runs, resumes, and the DuckDB twin
    (chained per-step CTEs ranking by the identical md5 string)
    reproduce every walk bit for bit.  A walk that reaches a sink
    ends early (inner-join semantics).  Output (walk_id, step, node)
    for steps 0..``walk_len``.

    Scale shape (the bfs_hops discipline): edges collapse to
    DISTINCT once via a keyed group fn and materialize partitioned
    on a coarse src hash; per step ONE ids-only coarse exchange
    where the frontier (walk_id, current-node) rows meet the
    adjacency on that same key and each group picks per-walk argmin
    hashes — md5 evaluations per round are bounded by the frontier's
    out-degree sum, the exact volume a pagerank scatter round ships.
    Frontier blocks materialize per round; the accumulated walk
    table is a union of those already-materialized rounds and
    repartitions once at the end, so block count stays flat in
    ``walk_len`` and no graph-sized state ever sits on the driver.
    """
    import hashlib

    cols = ["a", "b", "part", "kind"]

    def _typed(df: pd.DataFrame):
        return _typed_empty(df, cols)

    def edge_key(batch: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame({"a": batch["src"].astype("int64"),
                          "b": batch["dst"].astype("int64")})
        e = e[e["a"] != e["b"]].drop_duplicates()    # in-batch combiner
        e = e.assign(part=coarse_part(e["a"], num_parts),
                     kind=np.int64(0))
        return _typed(e[cols])

    def edge_dedup(group: pd.DataFrame) -> pd.DataFrame:
        # exact cross-batch DISTINCT (the CLAUDE.md combiner-vs-dedup
        # rule: per-batch drop_duplicates upstream is only a
        # combiner), PLUS the distinct walk-start rows (kind=1, one
        # per distinct src) emitted from the SAME exact group — a
        # post-hoc per-block distinct would silently duplicate a
        # start whenever Ray splits a part's output into several
        # blocks, walking that walk_id twice
        e = group.drop_duplicates(["a", "b"])
        s = e.drop_duplicates(["a"])
        st = pd.DataFrame({"a": s["a"].astype("int64"),
                           "b": s["a"].astype("int64"),
                           "part": s["part"].astype("int64")})
        st["kind"] = np.int64(1)
        return _typed(pd.concat([e[cols], st[cols]],
                                ignore_index=True))

    base = (edges_ds.map_batches(edge_key, batch_format="pandas")
            .groupby("part").map_groups(edge_dedup,
                                        batch_format="pandas")
            .repartition(_bound_blocks(num_parts))
            .materialize())

    def only(kind):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            if batch.empty or "kind" not in batch.columns:
                return _typed(pd.DataFrame(columns=cols))
            return _typed(batch[batch["kind"] == kind][cols])
        return fn

    # edges stays a LAZY filter over base's pinned blocks: a second
    # materialize would hold a full duplicate copy of the edge table
    # in the object store for the whole walk; re-running a stateless
    # vectorized filter per round is the cheaper side of that trade.
    # The frontier (node-sized) materializes — it seeds round 1 and
    # the step-0 output rows.
    edges = base.map_batches(only(0), batch_format="pandas")
    frontier = base.map_batches(only(1),
                                batch_format="pandas").materialize()
    rounds = [(0, frontier)]

    def make_step(t):
        def fn(group: pd.DataFrame) -> pd.DataFrame:
            e = group[group["kind"] == 0]
            f = group[group["kind"] == 1]
            if e.empty or f.empty:
                return _typed(pd.DataFrame(columns=cols))
            adj = {int(s): d["b"].to_numpy()
                   for s, d in e.groupby("a", sort=False)}
            out_node, out_walk = [], []
            for cur, wd in f.groupby("a", sort=False):
                nbrs = adj.get(int(cur))
                if nbrs is None:
                    continue                       # sink: walk ends
                for w in wd["b"].to_numpy():
                    pre = f"{seed}|{int(w)}|{t}|"
                    best = min(
                        (hashlib.md5((pre + str(int(d))).encode())
                         .hexdigest(), int(d)) for d in nbrs)
                    out_node.append(best[1])
                    out_walk.append(int(w))
            out = pd.DataFrame({
                "a": pd.Series(out_node, dtype="int64"),
                "b": pd.Series(out_walk, dtype="int64")})
            out["part"] = coarse_part(out["a"], num_parts)
            out["kind"] = np.int64(1)
            return _typed(out[cols])
        return fn

    n_frontier = frontier.count()
    for t in range(1, walk_len + 1):
        if n_frontier == 0:
            break
        # repartition before materialize (the bfs_hops block-growth
        # rule): the frontier feeds its own blocks back each step
        frontier = (edges.union(frontier)
                    .groupby("part")
                    .map_groups(make_step(t), batch_format="pandas")
                    .repartition(_bound_blocks(num_parts))
                    .materialize())
        rounds.append((t, frontier))
        n_frontier = frontier.count()

    def finish(t):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            if batch.empty or "a" not in batch.columns:
                return typed_if_empty(pd.DataFrame({
                    "walk_id": pd.Series([], dtype="int64"),
                    "step": pd.Series([], dtype="int64"),
                    "node": pd.Series([], dtype="int64")}))
            return pd.DataFrame({
                "walk_id": batch["b"].astype("int64"),
                "step": np.full(len(batch), t, dtype="int64"),
                "node": batch["a"].astype("int64")})
        return fn

    outs = [fr.map_batches(finish(t), batch_format="pandas")
            for t, fr in rounds]
    walks = outs[0] if len(outs) == 1 else outs[0].union(*outs[1:])
    return walks.repartition(_bound_blocks(num_parts))


def walk_skipgrams(edges_ds, walk_len: int = 3, window: int = 2,
                   seed: int = 42, num_parts: int = 64):
    """Skip-gram training pairs over the :func:`random_walks` corpus —
    the composed DeepWalk shape (walk sequences ARE the sentences;
    this op is to walks what ``skipgram_pairs`` is to token streams):
    for every walk, each ordered pair of positions within ``window``
    steps of each other emits (center, context), aggregated to
    (center, context, cnt).

    Both directions emit (word2vec's symmetric context), so cnt sums
    multiplicity across walks AND directions; pairs are generated
    VECTORIZED over a partition's sorted (walk, step) arrays — per
    offset d, positions i and i+d pair exactly when they share a
    walk_id and their steps differ by exactly d (steps are
    consecutive integers per walk, so array shifts enumerate every
    in-window pair without a per-walk loop).

    Two coarse exchanges on top of the walk construction: walks meet
    on a walk-hash (pair generation is walk-local), pair counts
    combine in-batch then meet on a pair-hash.  Output
    (center, context, cnt)."""
    walks = random_walks(edges_ds, walk_len=walk_len, seed=seed,
                         num_parts=num_parts)

    def wkey(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["part"] = coarse_part(out["walk_id"], num_parts)
        return typed_if_empty(out)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["walk_id", "step"], kind="mergesort")
        w = g["walk_id"].to_numpy()
        s = g["step"].to_numpy()
        n = g["node"].to_numpy()
        cs, xs = [], []
        for d in range(1, window + 1):
            if d >= len(g):
                break
            m = (w[:-d] == w[d:]) & (s[d:] - s[:-d] == d)
            cs.append(n[:-d][m]); xs.append(n[d:][m])    # forward
            cs.append(n[d:][m]); xs.append(n[:-d][m])    # backward
        if not cs:
            return typed_if_empty(pd.DataFrame({
                "center": pd.Series([], dtype="int64"),
                "context": pd.Series([], dtype="int64"),
                "cnt": pd.Series([], dtype="int64"),
                "ppart": pd.Series([], dtype="int64")}))
        p = (pd.DataFrame({"center": np.concatenate(cs),
                           "context": np.concatenate(xs)})
             .groupby(["center", "context"], sort=False)
             .size().reset_index(name="cnt"))          # in-batch combine
        p["cnt"] = p["cnt"].astype("int64")
        p["ppart"] = coarse_part(p["center"] * 131071 + p["context"],
                                 num_parts)
        return typed_if_empty(p)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["center", "context"], sort=False)["cnt"]
             .sum().reset_index())
        g["cnt"] = g["cnt"].astype("int64")
        return typed_if_empty(g)

    return (walks.map_batches(wkey, batch_format="pandas")
            .groupby("part").map_groups(pairs, batch_format="pandas")
            .groupby("ppart").map_groups(combine, batch_format="pandas"))
