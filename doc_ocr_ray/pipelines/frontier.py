"""Crawl-frontier construction — the composed scheduling operator
that closes the web-corpus loop: pages we HAVE -> links they cast ->
candidates we DON'T have -> politeness-filtered, authority-ranked
next fetches, capped per host.

Composes the engine's web stages end to end:

- ``stages/html_extract.extract_links`` — outlinks with RFC-lite
  reference resolution,
- ``stages/urls.robots_classify`` — canonicalization + simplified-REP
  politeness (longest prefix, tie to allow),
- ``stages/graph.pagerank`` output as the authority prior (any
  (node, rank_scaled) table drops in).

The reference repo has no crawler; this is the standard frontier
shape of web-corpus construction (cf. Heritrix / Common Crawl
frontier scheduling) expressed Ray-Data-first.

Shuffle discipline: THREE exchanges, each carrying slim rows only —
(1) NATIVE left_anti hash join drops already-crawled candidates
(both sides partitioned on canon_url; the crawled set is
corpus-sized, so it is never broadcast), (2) NATIVE inner hash join
annotates each surviving link with its source page's rank (ranks are
corpus-sized too), (3) ONE coarse domain-keyed exchange both sums
integer rank mass per candidate AND applies the per-host top-k cap:
domain is a deterministic function of canon_url, so keying the
partial combine by domain co-locates every candidate's partials
with its host peers and the cap runs inside the same group fn
(round-5 fusion — this was two exchanges).  A hot domain
concentrates its candidates in one group; that skew is bounded by
the host's own candidate fan-out, which the cap truncates anyway.
The only broadcast is the robots rule table, which is
domain-bounded by nature.  Scores are int64 sums of the pagerank
integer grid, so aggregation order cannot perturb them and a DuckDB
twin is bit-exact.
"""
from __future__ import annotations

import pandas as pd


def crawl_frontier(pages_ds, ranks_ds, rules, k_per_host: int = 3,
                   crawled_ds=None, num_parts: int = 64,
                   num_partitions: int | None = None):
    """Build the politeness-capped crawl frontier.

    ``pages_ds``: (doc_id, url, html) — the fetched snapshot.
    ``ranks_ds``: (node, rank_scaled) — authority per page doc_id
    (:func:`doc_ocr_ray.stages.graph.pagerank` output).
    ``rules``: robots (domain, path_prefix, allow) triples.
    ``crawled_ds``: dataset with a ``url`` column of already-fetched
    pages; defaults to ``pages_ds`` itself.

    Returns (domain, canon_url, frontier_score, n_links, host_rank):
    per host at most ``k_per_host`` candidate URLs, ranked by total
    linking-page rank mass (ties -> canon_url ascending).  A page
    linking the same candidate twice counts twice (link multiplicity
    is the signal, not distinct sources).
    """
    import ray
    from doc_ocr_ray.stages.html_extract import extract_links
    from doc_ocr_ray.stages.urls import robots_classify
    from doc_ocr_ray.stages.urls import canonicalize_urls
    from doc_ocr_ray.util import coarse_part, typed_if_empty

    if crawled_ds is None:
        crawled_ds = pages_ds.select_columns(["url"])
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = num_partitions or max(2, cpus // 2)

    links = extract_links(pages_ds)          # (doc_id, rank, href, target)

    def to_url(batch: pd.DataFrame) -> pd.DataFrame:
        return typed_if_empty(pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "url": batch["target"].astype("object")}))

    # politeness first (shuffle-free) so both joins see fewer rows
    rob = robots_classify(links.map_batches(to_url, batch_format="pandas"),
                          rules)

    def keep_allowed(batch: pd.DataFrame) -> pd.DataFrame:
        hit = batch[batch["allowed"] == 1]
        return typed_if_empty(pd.DataFrame({
            "doc_id": hit["doc_id"].astype("int64"),
            "canon_url": hit["canon_url"].astype("object"),
            "domain": hit["domain"].astype("object")}))

    allowed = rob.map_batches(keep_allowed, batch_format="pandas")

    def crawled_keys(batch: pd.DataFrame) -> pd.DataFrame:
        c = canonicalize_urls(batch, "url")
        return typed_if_empty(pd.DataFrame({
            "canon_url": c["canon_url"].astype("object")
        }).drop_duplicates())

    crawled = crawled_ds.map_batches(crawled_keys, batch_format="pandas")
    fresh = allowed.join(crawled, join_type="left_anti",
                         num_partitions=nparts, on=("canon_url",))
    scored = fresh.join(ranks_ds, join_type="inner",
                        num_partitions=nparts, on=("doc_id",),
                        right_on=("node",))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "canon_url" not in batch.columns:
            # empty hash-join partitions arrive as 0-column frames
            return typed_if_empty(pd.DataFrame({
                "canon_url": pd.Series([], dtype="object"),
                "domain": pd.Series([], dtype="object"),
                "frontier_score": pd.Series([], dtype="int64"),
                "n_links": pd.Series([], dtype="int64"),
                "part": pd.Series([], dtype="int64")}))
        g = (batch.groupby(["canon_url", "domain"], sort=False)
                  ["rank_scaled"].agg(["sum", "count"]).reset_index())
        out = pd.DataFrame({
            "canon_url": g["canon_url"].astype("object"),
            "domain": g["domain"].astype("object"),
            "frontier_score": g["sum"].astype("int64"),
            "n_links": g["count"].astype("int64")})
        # DOMAIN-keyed (not canon_url-keyed): domain is a function of
        # canon_url, so every candidate's partials still co-locate —
        # and so do its host peers, letting the per-host cap run in
        # the same group fn (one exchange instead of two)
        out["part"] = coarse_part(out["domain"], num_parts)
        return out

    def combine_cap(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["canon_url", "domain"], sort=False)
                  [["frontier_score", "n_links"]].sum().reset_index())
        g = g.sort_values(["domain", "frontier_score", "canon_url"],
                          ascending=[True, False, True],
                          kind="mergesort")
        g["host_rank"] = (g.groupby("domain", sort=False).cumcount()
                          + 1).astype("int64")
        g = g[g["host_rank"] <= k_per_host]
        return typed_if_empty(g[["domain", "canon_url", "frontier_score",
                                 "n_links", "host_rank"]]
                              .reset_index(drop=True))

    return (scored.map_batches(partial, batch_format="pandas")
                  .groupby("part")
                  .map_groups(combine_cap, batch_format="pandas"))
