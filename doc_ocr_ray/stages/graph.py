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

import numpy as np
import pandas as pd
import pyarrow as pa

from doc_ocr_ray.util import coarse_part, typed_if_empty


def pagerank(edges_ds, nodes_ds, iters: int = 3, damping_pct: int = 85,
             scale: int = 10 ** 12, num_parts: int = 64):
    """Integer-grid PageRank.

    ``edges_ds``: (src:int64, dst:int64) directed links — multi-edges
    and self-loops are cleaned here (DISTINCT, src != dst).
    ``nodes_ds``: (node:int64) the full node set; nodes may have no
    edges.  Returns (node, rank_scaled) after ``iters`` rounds from
    the uniform start ``scale // n``.

    Per round, two ids-only exchanges: (1) ranks meet their out-edges
    on a coarse src-hash and emit (dst, contribution); (2)
    contributions meet the node table on a coarse node-hash and emit
    the new rank row for EVERY node (zero-inflow nodes get the base
    mass).  The rank table is materialized once per round — without
    it, round k would re-execute all k-1 prior rounds (lazy lineage).
    Edges are degree-annotated and materialized once.
    """
    base_cols = ["src", "dst", "deg", "r", "kind", "part"]

    def _typed(df: pd.DataFrame):
        if len(df):
            return df
        return pa.schema([(c, pa.int8() if c == "kind" else pa.int64())
                          for c in base_cols]).empty_table()

    # --- degree-annotated edge table, cleaned, materialized ONCE
    def edge_key(batch: pd.DataFrame) -> pd.DataFrame:
        e = batch[["src", "dst"]].drop_duplicates()
        e = e[e["src"] != e["dst"]]
        out = pd.DataFrame({
            "src": e["src"].astype("int64"),
            "dst": e["dst"].astype("int64")})
        out["part"] = coarse_part(out["src"], num_parts)
        return typed_if_empty(out)

    def degree_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["src", "dst"])
        g = g.assign(deg=g.groupby("src", sort=False)["src"]
                     .transform("size").astype("int64"),
                     r=np.int64(0), kind=np.int8(0))
        return _typed(g[base_cols])

    edges = (edges_ds.map_batches(edge_key, batch_format="pandas")
             .groupby("part").map_groups(degree_group,
                                         batch_format="pandas")
             .materialize())

    # --- node table (node rides in src), materialized ONCE
    def node_key(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "src": batch["node"].astype("int64"),
            "dst": np.int64(0), "deg": np.int64(0), "r": np.int64(0)})
        out["kind"] = np.int8(2)
        out["part"] = coarse_part(out["src"], num_parts)
        return _typed(out[base_cols])

    nodes = (nodes_ds.map_batches(node_key, batch_format="pandas")
             .materialize())
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

    def scatter(group: pd.DataFrame) -> pd.DataFrame:
        """Rank rows meet out-edges: emit (dst, r // deg) keyed by dst."""
        e = group[group["kind"] == 0]
        rk = group.loc[group["kind"] == 1, ["src", "r"]]
        if not len(e) or not len(rk):
            return _typed(pd.DataFrame(columns=base_cols))
        m = e.merge(rk, on="src", suffixes=("", "_rank"))
        out = pd.DataFrame({
            "src": m["dst"].astype("int64"),    # dst becomes the key
            "dst": np.int64(0), "deg": np.int64(0),
            "r": (m["r_rank"] // m["deg"]).astype("int64")})
        out["kind"] = np.int8(3)
        out["part"] = coarse_part(out["src"], num_parts)
        return _typed(out[base_cols])

    def gather(group: pd.DataFrame) -> pd.DataFrame:
        """Contributions meet the node table: new rank for EVERY node."""
        nd = group.loc[group["kind"] == 2, ["src", "part"]]
        if not len(nd):
            return _typed(pd.DataFrame(columns=base_cols))
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
        return _typed(out[base_cols])

    for _ in range(iters):
        contribs = (edges.union(ranks)
                    .groupby("part").map_groups(scatter,
                                                batch_format="pandas"))
        ranks = (nodes.union(contribs)
                 .groupby("part").map_groups(gather,
                                             batch_format="pandas")
                 .materialize())

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": batch["src"].astype("int64"),
            "rank_scaled": batch["r"].astype("int64")})

    return ranks.map_batches(finish, batch_format="pandas")
