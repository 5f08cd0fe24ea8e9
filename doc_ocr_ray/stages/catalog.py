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

    tagged = (snapshot_ds.map_batches(tag_snap, batch_format="pandas")
              .union(changes_ds.map_batches(changelog_tag_fn(num_parts),
                                            batch_format="pandas")))

    return tagged.groupby("part").map_groups(changelog_resolve,
                                             batch_format="pandas")


def changelog_tag_fn(num_parts: int):
    """The shared changelog validation + tagging map (used by
    :func:`apply_changelog` and the incremental index maintainer in
    ``text_analysis.inverted_index_delta`` — ONE place decides what a
    well-formed changelog row is, so the two operators cannot drift
    on accepted inputs)."""
    def tag_change(batch: pd.DataFrame) -> pd.DataFrame:
        bad = set(batch["op"]) - {"upsert", "delete"}
        if bad:
            raise ValueError("unknown changelog ops: "
                             f"{sorted(str(b) for b in bad)}")
        if len(batch) and (int(batch["ts"].min()) < 0
                           or int(batch["seq"].min()) < 0):
            # the snapshot sentinel is (ts, seq) = (-1, -1); negative
            # changelog coordinates would silently lose to it
            raise ValueError("changelog ts/seq must be non-negative")
        return typed_if_empty(pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "text": batch["text"].astype("object"),
            "ts": batch["ts"].astype("int64"),
            "seq": batch["seq"].astype("int64"),
            "op": batch["op"].astype("object"),
            "part": coarse_part(batch["doc_id"], num_parts)}))
    return tag_change


def changelog_resolve(group: pd.DataFrame) -> pd.DataFrame:
    """Shared per-partition winner resolution: latest (ts, seq) per
    key, delete winners drop.  Snapshot rows (if present) carry the
    (-1, -1) sentinel so any change outranks them in the same order —
    one sort, one keep-last, no per-key loop."""
    g = group.sort_values(["doc_id", "ts", "seq"], kind="mergesort")
    win = g.drop_duplicates("doc_id", keep="last")
    win = win[win["op"] != "delete"]
    return typed_if_empty(
        win[["doc_id", "text"]].reset_index(drop=True))


def validate_table(ds, rules, num_parts: int = 64):
    """Distributed data-quality validation — the Great-Expectations /
    dbt-test shape that gates a corpus before training: every rule is
    checked in ONE streaming pass and the answer is a tiny
    (rule_id, n_violations) table.

    ``rules``: iterable of tuples
      ("id", "not_null", col)
      ("id", "unique", col)
      ("id", "int_range", col, lo, hi)   # NULLs exempt (not_null's job)
      ("id", "regex_full", col, pattern) # RE2-parity full match, NULLs exempt
      ("id", "in_set", col, values)      # NULLs exempt

    Row-local rules fold to per-batch partial counts inside the scan
    (the combiner shape — one count row per rule per batch rides the
    final tiny combine).  ``unique`` needs co-location: per-batch
    (value, count) partials flow through ONE coarse value exchange;
    a row violates when its value's total count exceeds 1, so the
    violation count is the sum of group counts > 1.  All unique rules
    share that ONE extra scan; keys ride the exchange in canonical
    ``str()`` form (the table_stats envelope — one exchange schema
    for differently-typed key columns; one row per DISTINCT batch
    value, never whole rows).
    """
    import re as _re

    row_rules, uniq_rules = [], []
    for r in rules:
        (uniq_rules if r[1] == "unique" else row_rules).append(r)
    for r in row_rules:
        if r[1] not in ("not_null", "int_range", "regex_full", "in_set"):
            raise ValueError(f"unknown validation rule kind: {r[1]}")
    compiled = {r[0]: _re.compile(r[3]) for r in row_rules
                if r[1] == "regex_full"}

    def row_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ns = [], []
        for r in row_rules:
            rid, kind, col = r[0], r[1], r[2]
            s = batch[col]
            if kind == "not_null":
                n = int(s.isna().sum())
            elif kind == "int_range":
                lo, hi = r[3], r[4]
                v = s.dropna()
                n = int(((v < lo) | (v > hi)).sum())
            elif kind == "regex_full":
                v = s.dropna()
                n = int((~v.astype(str).str.fullmatch(
                    compiled[rid])).sum())
            else:                                    # in_set
                allowed = set(r[3])
                v = s.dropna()
                n = int((~v.isin(allowed)).sum())
            ids.append(rid); ns.append(n)
        return pd.DataFrame({"rule_id": pd.Series(ids, dtype="object"),
                             "n": pd.Series(ns, dtype="int64"),
                             "part": pd.Series(np.zeros(len(ids),
                                                        dtype=np.int64))})

    outs = []
    if row_rules:
        outs.append(ds.map_batches(row_partial, batch_format="pandas"))

    if uniq_rules:
        ucols = [(r[0], r[2]) for r in uniq_rules]

        # ALL unique rules fold into ONE scan: keys ride in canonical
        # str() form (the table_stats envelope) so differently-typed
        # key columns share one exchange schema
        def key_partial(batch: pd.DataFrame) -> pd.DataFrame:
            frames = []
            for rid, col in ucols:
                g = (batch[[col]].dropna().groupby(col, sort=False)
                     .size().reset_index(name="cnt"))
                keys = g[col].astype(str)
                frames.append(pd.DataFrame({
                    "rule_id": np.full(len(g), rid, dtype=object),
                    "key": keys.to_numpy(dtype=object),
                    "cnt": g["cnt"].astype("int64"),
                    "kpart": coarse_part(keys, num_parts)}))
            return typed_if_empty(
                pd.concat(frames, ignore_index=True))

        def key_combine(group: pd.DataFrame) -> pd.DataFrame:
            tot = (group.groupby(["rule_id", "key"], sort=False)["cnt"]
                   .sum().reset_index())
            v = (tot[tot["cnt"] > 1].groupby("rule_id", sort=False)
                 ["cnt"].sum().reset_index())
            return typed_if_empty(pd.DataFrame({
                "rule_id": v["rule_id"].astype("object"),
                "n": v["cnt"].astype("int64"),
                "part": np.zeros(len(v), dtype=np.int64)}))

        outs.append(ds.map_batches(key_partial, batch_format="pandas")
                      .groupby("kpart")
                      .map_groups(key_combine, batch_format="pandas"))

    if not outs:
        raise ValueError("validate_table: no rules given")
    # every rule reports even with zero violations (the unique combine
    # emits only positive partials)
    import ray.data as _rd
    outs.append(_rd.from_pandas(pd.DataFrame({
        "rule_id": pd.Series([r[0] for r in rules], dtype="object"),
        "n": pd.Series([0] * len(rules), dtype="int64"),
        "part": pd.Series([0] * len(rules), dtype="int64")})))
    tagged = outs[0]
    for o in outs[1:]:
        tagged = tagged.union(o)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("rule_id", sort=True)["n"].sum()
             .reset_index(name="n_violations"))
        g["n_violations"] = g["n_violations"].astype("int64")
        return g

    return tagged.groupby("part").map_groups(final,
                                             batch_format="pandas")


def ivm_refresh(base_ds, delta_ds, num_parts: int = 64):
    """Incremental view maintenance for a per-key SUM/COUNT aggregate
    — the materialized-view refresh a warehouse runs on arrival of a
    delta batch instead of rescanning the corpus: ``base`` is the
    PREVIOUS aggregate snapshot ``(event_type, n, sum_cents)``,
    ``delta`` is the new raw events, and the refreshed view is the
    merge of the snapshot rows with the delta's partial aggregates —
    cost proportional to the DELTA (plus the key-cardinality
    snapshot), never the accumulated history.  Correctness contract:
    refresh(agg(old), delta) == agg(old UNION delta), which is
    exactly what the SQL twin checks.

    Shape: delta collapses in-batch to per-key partials (the standard
    combiner), snapshot rows pass through typed as partials of
    themselves, ONE tiny key-cardinality groupby merges both.  Keys
    present only in the delta appear; keys untouched by the delta
    survive unchanged.  NULL keys carry no view row and drop (GROUP
    BY parity).
    """
    from doc_ocr_ray.util import typed_if_empty

    def delta_partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch.dropna(subset=["event_type"])
        cents = np.floor(t["value"] * 100 + 0.5).astype("int64")
        g = (pd.DataFrame({"event_type": t["event_type"],
                           "cents": cents})
             .groupby("event_type", sort=False)["cents"]
             .agg(["count", "sum"]).reset_index())
        g.columns = ["event_type", "n", "sum_cents"]
        g["n"] = g["n"].astype("int64")
        g["sum_cents"] = g["sum_cents"].astype("int64")
        return typed_if_empty(g)

    def base_pass(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "event_type": batch["event_type"],
            "n": batch["n"].astype("int64"),
            "sum_cents": batch["sum_cents"].astype("int64")})
        return typed_if_empty(out)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [group["event_type"].iloc[0]],
            "n": [int(group["n"].sum())],
            "sum_cents": [int(group["sum_cents"].sum())]})

    partials = delta_ds.map_batches(delta_partial,
                                    batch_format="pandas")
    base = base_ds.map_batches(base_pass, batch_format="pandas")
    return (base.union(partials)
            .groupby("event_type")
            .map_groups(merge, batch_format="pandas"))


def _zorder_spread(x: np.ndarray) -> np.ndarray:
    """Spread 16 bits to the 32 even bit positions (the classic
    magic-mask interleave; identical &/|/<< chain in the SQL twin)."""
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def zorder_layout(ds, col_a: str, col_b: str, cell_bits: int = 6,
                  scale_a: int = 1, scale_b: int = 1,
                  num_parts: int = 64):
    """Z-order (Morton) layout planner — the space-filling-curve
    clustering step a 100 TB table uses so that BOTH ``col_a`` and
    ``col_b`` range predicates prune files (a sort on one column
    gives perfect zone maps for it and useless ones for the other;
    the Morton interleave bounds both).  Rows land in ``2^cell_bits``
    curve cells (cell = top bits of the 32-bit Morton code of the
    two columns' low 16 bits); the output is the zone-map table a
    layout writer would persist per file: ``(cell, n_rows, min_a,
    max_a, min_b, max_b)``.  Cell extents are what a scan planner
    compares against predicates — the demonstrable skipping win over
    a single-column sort.

    Scale shape: one stateless pass computes codes and per-batch
    combiners (groupby cell: count/min/max — constant-size partials
    per cell), then ONE exchange over the bounded cell key space
    combines partials; nothing corpus-sized concentrates anywhere.
    Negative or >16-bit values mask into the grid, and
    ``scale_a``/``scale_b`` quantize narrow domains ONTO the grid
    (a column spanning 0..2000 only fills the low 11 bits — every
    row would share cell 0; scaling by 32 spreads it across the
    curve, exactly the rank-quantization a real layout writer
    performs).  Zone-map extents stay in ORIGINAL column units."""
    shift = 32 - cell_bits

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch[col_a].astype("int64").to_numpy()
        b = batch[col_b].astype("int64").to_numpy()
        morton = (_zorder_spread((a * scale_a) & 0xFFFF)
                  | (_zorder_spread((b * scale_b) & 0xFFFF) << 1))
        cell = morton >> shift
        g = (pd.DataFrame({"cell": cell, "a": a, "b": b})
             .groupby("cell", sort=False)
             .agg(n_rows=("a", "size"), min_a=("a", "min"),
                  max_a=("a", "max"), min_b=("b", "min"),
                  max_b=("b", "max"))
             .reset_index())
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return typed_if_empty(g)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("cell", sort=False)
             .agg(n_rows=("n_rows", "sum"), min_a=("min_a", "min"),
                  max_a=("max_a", "max"), min_b=("min_b", "min"),
                  max_b=("max_b", "max"))
             .reset_index())
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return typed_if_empty(g)

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("cell").map_groups(combine,
                                        batch_format="pandas"))


def ks_drift(ds_a, ds_b, value_col: str = "n_chars",
             num_parts: int = 64):
    """Two-sample Kolmogorov-Smirnov distance between two corpus
    snapshots' distributions of an integer-valued column — the
    ingestion guardrail that catches "this week's crawl shifted the
    document-length (or score) distribution" even when means and
    counts look stable (cf. embedding_drift for the semantic
    counterpart; KS is the classic distribution-free test).

    Exact integers end to end: D_ppm = max over the merged value grid
    of |(cum_a*10^6)//n_a - (cum_b*10^6)//n_b| — two floor divisions
    stated identically in the SQL twin, so the statistic is
    hash-checkable (no p-value: at corpus n the threshold is policy,
    the monitor reports the distance).

    Scale shape (the host_skew histogram discipline): per-batch
    (value, count_a, count_b) partials combine in-batch, meet on ONE
    coarse value-hash exchange, and the final pass sees ONLY the
    distinct-value histogram — bounded by the value grid's
    cardinality (lengths, integer scores), NEVER by corpus rows.
    Continuous floats must be pre-quantized to a grid (the
    mad_outliers rule).  Output one row (n_a, n_b, ks_ppm)."""

    def partial(kind):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            g = (batch.groupby(value_col, sort=False)[value_col]
                 .count().rename("c").reset_index())
            out = pd.DataFrame({
                "v": g[value_col].astype("int64"),
                "ca": (g["c"] if kind == 0 else 0),
                "cb": (g["c"] if kind == 1 else 0)})
            out["ca"] = out["ca"].astype("int64")
            out["cb"] = out["cb"].astype("int64")
            out["part"] = coarse_part(out["v"], num_parts)
            return typed_if_empty(out)
        return fn

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("v", sort=False)[["ca", "cb"]]
             .sum().reset_index())
        g["g"] = np.int64(0)
        return typed_if_empty(g)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("v", kind="mergesort")
        na = int(g["ca"].sum())
        nb = int(g["cb"].sum())
        if na == 0 or nb == 0:
            # one side empty: KS is undefined — report the 10^6
            # sentinel (maximal drift) rather than crash mid-monitor
            return pd.DataFrame({
                "n_a": pd.Series([na], dtype="int64"),
                "n_b": pd.Series([nb], dtype="int64"),
                "ks_ppm": pd.Series([10 ** 6], dtype="int64")})
        cuma = g["ca"].cumsum().to_numpy()
        cumb = g["cb"].cumsum().to_numpy()
        d = np.abs(cuma * 10 ** 6 // na - cumb * 10 ** 6 // nb).max()
        return pd.DataFrame({
            "n_a": pd.Series([na], dtype="int64"),
            "n_b": pd.Series([nb], dtype="int64"),
            "ks_ppm": pd.Series([int(d)], dtype="int64")})

    hist = (ds_a.map_batches(partial(0), batch_format="pandas")
            .union(ds_b.map_batches(partial(1), batch_format="pandas"))
            .groupby("part").map_groups(combine, batch_format="pandas"))
    # neutral seed row (util.seed_row): a zero-count value changes no
    # cumulative sum (at most adds an evaluation point where D equals
    # its predecessor), so the statistic is untouched on real input
    # while the both-empty case still emits its sentinel row.
    from doc_ocr_ray.util import seed_row
    seed = seed_row({"v": (-2 ** 62, "int64"), "ca": (0, "int64"),
                     "cb": (0, "int64"), "g": (0, "int64")})
    return (hist.union(seed)
            .groupby("g").map_groups(final, batch_format="pandas"))
