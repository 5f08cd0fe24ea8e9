"""Record linkage: blocked fuzzy (edit-distance) joins.

The entity-resolution shape a data-cleaning pipeline runs before any
key-based join: candidate pairs come from a cheap BLOCKING key (here
the first token — two strings that share no block are assumed
non-matches, the standard linkage discipline), and only within-block
pairs pay the quadratic edit-distance verify.  Partitioning
assumption, stated: block sizes are bounded (vocabulary-like keys, not
power-law document keys); a skewed block should be split by a second
blocking key before this stage.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from doc_ocr_ray.util import coarse_part, typed_if_empty


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, the textbook two-row DP — computed
    over UTF-8 BYTES, not code points, because DuckDB's
    ``levenshtein()`` is byte-based ('é' vs 'a' = 2) and the SQL twin
    must be bit-exact on non-ASCII input too."""
    ab = a.encode("utf-8")
    bb = b.encode("utf-8")
    if ab == bb:
        return 0
    if not ab:
        return len(bb)
    if not bb:
        return len(ab)
    prev = list(range(len(bb) + 1))
    for i, ca in enumerate(ab, 1):
        cur = [i]
        for j, cb in enumerate(bb, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzzy_self_join(ds, col: str, max_dist: int = 6,
                    num_parts: int = 64):
    """Blocked fuzzy self-join over the DISTINCT values of ``col``:
    emit every unordered pair of distinct strings that share a first
    token (the block) and sit within ``max_dist`` edits, as
    ``(val_a, val_b, dist)`` with ``val_a < val_b``.

    Shape: distinct-reduce first (per-batch drop_duplicates combiner
    -> ONE coarse groupby on the full string, so the pair stage sees
    each value once no matter how many rows carry it), then a second
    coarse exchange on the BLOCK key and a per-block pairwise verify.
    The quadratic work is block-bounded by construction; the distinct
    reduce is the same cardinality discipline as dedup_exact.
    """
    def distinct_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[col].dropna().drop_duplicates()
        out = pd.DataFrame({"val": vals.astype(str)})
        out["part"] = coarse_part(out["val"], num_parts)
        return typed_if_empty(out)

    def distinct_final(group: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "val": group["val"].drop_duplicates()})
        # re-key by block for the pair stage
        out["block"] = out["val"].str.split(" ").str[0]
        out["bpart"] = coarse_part(out["block"], num_parts)
        return typed_if_empty(out)

    def per_block(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, blk in group.groupby("block", sort=False):
            vals = sorted(blk["val"].tolist())
            lens = [len(v.encode("utf-8")) for v in vals]
            for i in range(len(vals)):
                for j in range(i + 1, len(vals)):
                    # edit distance >= byte-length difference: skip
                    # the DP when the pair cannot pass the cutoff
                    if abs(lens[i] - lens[j]) > max_dist:
                        continue
                    d = levenshtein(vals[i], vals[j])
                    if d <= max_dist:
                        rows.append((vals[i], vals[j], d))
        if not rows:
            return typed_if_empty(pd.DataFrame({
                "val_a": pd.Series([], dtype="object"),
                "val_b": pd.Series([], dtype="object"),
                "dist": pd.Series([], dtype="int64")}))
        return pd.DataFrame(rows, columns=["val_a", "val_b", "dist"])

    return (ds.map_batches(distinct_partial, batch_format="pandas")
            .groupby("part").map_groups(distinct_final,
                                        batch_format="pandas")
            .groupby("bpart").map_groups(per_block,
                                         batch_format="pandas"))
