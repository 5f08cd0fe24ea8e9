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


def apply_changelog(snapshot_ds, changes_ds, num_parts: int = 256):
    """CDC merge — maintain a keyed table under a change stream (the
    Delta/Hudi/Iceberg MERGE shape a living web corpus needs when
    re-crawls arrive as upsert/delete events instead of full
    snapshots).

    ``snapshot_ds``: (doc_id, text) — the current table.
    ``changes_ds``: (doc_id, text, ts, seq, op) with op in
    {'upsert', 'delete'}; (ts, seq) is the change total order (seq
    breaks equal-timestamp ties — the arrival sequence a changelog
    always has).  Returns the NEW snapshot (doc_id, text): per key
    the LATEST change wins (upsert rewrites, delete removes, a
    change-only key inserts); keys with no change keep their
    snapshot row.

    Shuffle discipline: tagged union, ONE coarse key exchange, and
    the winner resolution is a vectorized in-group sort +
    keep-last — no per-key loop, no broadcast (both sides are
    corpus-sized).  The exchange carries each row once; at 10^12
    keys this is the same single-exchange cost as exact dedup.
    """
    def tag_snap(batch: pd.DataFrame) -> pd.DataFrame:
        return typed_if_empty(pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "text": batch["text"].astype("object"),
            "ts": np.full(len(batch), -1, dtype=np.int64),
            "seq": np.full(len(batch), -1, dtype=np.int64),
            "op": np.full(len(batch), "snap", dtype=object),
            "part": coarse_part(batch["doc_id"], num_parts)}))

    def tag_change(batch: pd.DataFrame) -> pd.DataFrame:
        bad = set(batch["op"]) - {"upsert", "delete"}
        if bad:
            raise ValueError(f"unknown changelog ops: {sorted(bad)}")
        return typed_if_empty(pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "text": batch["text"].astype("object"),
            "ts": batch["ts"].astype("int64"),
            "seq": batch["seq"].astype("int64"),
            "op": batch["op"].astype("object"),
            "part": coarse_part(batch["doc_id"], num_parts)}))

    tagged = (snapshot_ds.map_batches(tag_snap, batch_format="pandas")
              .union(changes_ds.map_batches(tag_change,
                                            batch_format="pandas")))

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        # snapshot rows carry (ts, seq) = (-1, -1), so any change
        # outranks them in the same (ts, seq) order — one sort, one
        # keep-last, no per-key loop
        g = group.sort_values(["doc_id", "ts", "seq"], kind="mergesort")
        win = g.drop_duplicates("doc_id", keep="last")
        win = win[win["op"] != "delete"]
        return typed_if_empty(
            win[["doc_id", "text"]].reset_index(drop=True))

    return tagged.groupby("part").map_groups(resolve,
                                             batch_format="pandas")
