"""Catalog statistics: the per-column profiling pass a data engine
runs when a new table lands (row counts, null counts, exact distinct
counts) — the numbers that drive partition planning, join-side
selection (broadcast vs shuffle) and pruning decisions.
"""
from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd

from doc_ocr_ray.util import coarse_part, typed_if_empty


def table_stats(ds, columns: List[str], num_partitions: int = 64):
    """(col_name, n, n_null, n_distinct) per requested column — one
    corpus pass, one exchange:

    - per batch, each column emits ONE count partial (rows, nulls) and
      its batch-DISTINCT value digests (md5-64 of the value's string
      form — the same exactness envelope as the digest dedup
      operators: exact up to an md5 collision, and raw values never
      ride the shuffle);
    - the tagged union flows through ONE coarse (col, digest) exchange
      whose in-group dedupe yields per-partition distinct counts;
    - a tiny col-keyed combine sums counts and distinct partials.

    The string form is the value's canonical str() — identical to
    DuckDB ``CAST(x AS VARCHAR)`` for integers and strings (the
    supported profile columns; float columns need a grid rule first,
    like everything else here).  NULLs count in ``n_null`` and are
    excluded from ``n_distinct``."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for c in columns:
            s = batch[c]
            nn = int(s.isna().sum())
            out.append(pd.DataFrame({
                "col_name": [c], "kind": [0], "digest": [""],
                "n": [len(s)], "n_null": [nn]}))
            vals = s.dropna()
            if len(vals):
                digs = {hashlib.md5(str(v).encode()).hexdigest()[:16]
                        for v in set(vals)}
                out.append(pd.DataFrame({
                    "col_name": c, "kind": 1,
                    "digest": sorted(digs),
                    "n": 0, "n_null": 0}))
        res = pd.concat(out, ignore_index=True) if out else pd.DataFrame()
        res = typed_if_empty(res)
        if len(res):
            res["part"] = coarse_part(res["col_name"] + res["digest"],
                                      num_partitions)
        else:
            res["part"] = pd.Series([], dtype="int64")
        return res

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        counts = group[group["kind"] == 0]
        cpart = (counts.groupby("col_name", sort=False)
                 .agg(n=("n", "sum"), n_null=("n_null", "sum"))
                 .reset_index())
        digs = group[group["kind"] == 1]
        dpart = (digs.drop_duplicates(["col_name", "digest"])
                 .groupby("col_name", sort=False).size()
                 .reset_index(name="n_distinct"))
        out = cpart.merge(dpart, on="col_name", how="outer").fillna(0)
        for c in ("n", "n_null", "n_distinct"):
            out[c] = out[c].astype("int64")
        return typed_if_empty(out)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "col_name": [group["col_name"].iloc[0]],
            "n": [int(group["n"].sum())],
            "n_null": [int(group["n_null"].sum())],
            "n_distinct": [int(group["n_distinct"].sum())]})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("part").map_groups(per_part, batch_format="pandas")
            .groupby("col_name").map_groups(combine,
                                            batch_format="pandas"))
