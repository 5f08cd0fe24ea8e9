"""Shared kernel helpers used across stages/ and pipelines/.

Single audited home for the coarse-partition hash and the typed-empty
block guard — both were previously copied per module (stages cannot
import pipelines without inverting the layering, so the shared pieces
live here at package level).
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def coarse_part(series: pd.Series, num_partitions: int) -> np.ndarray:
    """Deterministic coarse shuffle key for int AND string key columns.

    ``pd.util.hash_array`` is keyed SipHash with a fixed default key —
    stable across worker processes and runs, unlike Python's builtin
    ``hash`` (randomized per process).
    """
    return (pd.util.hash_array(series.to_numpy(dtype=object))
            % num_partitions).astype("int64")


def revenue_cents(price: pd.Series, discount: pd.Series) -> "np.ndarray":
    """Discounted price -> exact ten-thousandths grid:
    floor(price * (1 - discount) * 10000 + 0.5) as int64 — explicit
    half-up, bit-matching the DuckDB oracle idiom
    ``CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS
    BIGINT)``.  The single audited home of the revenue-grid rule
    (order_priority_revenue, revenue_by_nation, shipping_priority,
    promo_revenue_share): sums accumulate as integers, ONE division
    at the end."""
    import numpy as np
    return np.floor(price * (1 - discount) * 10000 + 0.5).astype("int64")


def sentinel_frame(sentinel: dict) -> pd.DataFrame:
    """One-row frame from {column: scalar} (int scalars become int64,
    floats float64, strings object) — the unmatchable-row building
    block for :func:`sentinel_if_empty` and join seeding."""
    import numpy as np
    return pd.DataFrame({k: np.array([v]) for k, v in sentinel.items()})


def sentinel_if_empty(df: pd.DataFrame, **sentinel) -> pd.DataFrame:
    """Replace a filtered-to-empty JOIN-INPUT batch with ONE
    unmatchable sentinel row (negative join keys — the table key
    domains are non-negative).

    Why not a typed empty frame: Ray's hash shuffle broadcasts the
    schema to its aggregators only with the FIRST block it shuffles
    per input side, and ``_shuffle_block`` returns early on
    ``num_rows == 0`` — an empty first block consumes that one
    broadcast while shipping nothing, so partitions that never
    receive a row stay schema-less and pyarrow's join rejects the key
    FieldRef (crash instead of 0 rows).  Keeping every block
    non-empty makes the first broadcast always carry the schema; the
    sentinel itself is dropped by the inner join as unmatched."""
    if len(df):
        return df
    return sentinel_frame(sentinel)


def default_join_partitions() -> int:
    """Default ``num_partitions`` for Dataset.join: half the cluster
    CPUs.  Each native hash join reserves its own HashShuffleAggregator
    actors for the duration of the query, so a partition count at or
    above the CPU count starves upstream map operators outright on a
    small cluster (the fixed-pool deadlock noted in CLAUDE.md, join
    edition).  Queries that chain several concurrent joins inherit
    this per join; pass an explicit count on a real multi-node
    cluster."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, cpus // 2)


def epoch_days(ts: pd.Series) -> pd.Series:
    """Timestamps -> integer epoch days by floor division — tz-proof
    and exact for pre-1970 dates too (``//`` floors toward -inf,
    matching the oracle's floor(epoch(ts)/86400.0)).  The single
    audited home of the day rule shared by retention_cohorts and
    daily_activity; NaT rows must be filtered by the caller first."""
    return (ts.astype("datetime64[ns]").astype("int64")
            // 10**9 // 86400)


def tagged_union_annotate(tbl, lookup, endpoint: str,
                          lookup_key: str, lookup_val: str,
                          out_col: str, num_partitions: int = 64):
    """Distributed lookup-join via a tagged union — the shape shared
    by triangle_count (edge learns endpoint degree) and pmi_top_pairs
    (bigram learns unigram count): no broadcast, so the lookup table
    may be graph-/vocab-sized.

    Rows of ``tbl`` are tagged side 0 with ``node = row[endpoint]``;
    rows of ``lookup`` are tagged side 1 carrying ``(lookup_key ->
    node, lookup_val -> val)``.  ONE coarse node-keyed exchange
    resolves ``out_col = val`` for every side-0 row.  Two invariants
    live here ONCE: (a) empty side-0 groups return a frame that still
    carries tbl's columns (a column-less empty emits schema-less
    blocks Ray warns about); (b) numeric id columns are re-cast to
    int64 after the union (the absent side's NaN fill silently
    promotes them to float64, and float objects hash differently in
    the NEXT exchange's coarse_part)."""

    def tag_main(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["node"] = b[endpoint]
        b["val"] = np.int64(-1)
        b["side"] = np.int8(0)
        b["part"] = coarse_part(b["node"], num_partitions)
        return typed_if_empty(b)

    def tag_lookup(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"node": batch[lookup_key],
                            "val": batch[lookup_val].astype("int64")})
        out["side"] = np.int8(1)
        out["part"] = coarse_part(out["node"], num_partitions)
        return typed_if_empty(out)

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        vmap = group[group["side"] == 1].set_index("node")["val"]
        e = group[group["side"] == 0].copy()
        e = e.drop(columns=["node", "val", "side", "part"])
        if not len(e):
            e[out_col] = pd.Series([], dtype="int64")
            return typed_if_empty(e)
        e[out_col] = group.loc[e.index, "node"].map(vmap) \
            .astype("int64")
        for c in e.columns:
            if pd.api.types.is_float_dtype(e[c]):
                e[c] = e[c].astype("int64")
        return typed_if_empty(e)

    tagged = (tbl.map_batches(tag_main, batch_format="pandas")
              .union(lookup.map_batches(tag_lookup,
                                        batch_format="pandas")))
    return (tagged.groupby("part")
            .map_groups(resolve, batch_format="pandas"))


def typed_if_empty(df: pd.DataFrame):
    """Return empty results as TYPED Arrow blocks.

    Empty object-dtype columns trip Ray's pandas block-size estimator
    (noisy per-block 'cannot call vectorize' worker logs) and produce
    schema-less RefBundles that the streaming executor warns about.
    Mapping: object -> string (assumed textual — pass typed frames for
    binary payloads), pandas nullable extension dtypes via their numpy
    twin, numerics/timestamps via ``from_numpy_dtype``.
    """
    if len(df):
        return df
    import pyarrow as pa
    cols = {}
    for c in df.columns:
        dt = df[c].dtype
        if dt == object or str(dt) in ("string", "str"):
            t = pa.string()
        else:
            try:
                t = pa.from_numpy_dtype(dt)
            except (pa.lib.ArrowNotImplementedError, TypeError):
                np_twin = getattr(dt, "numpy_dtype", None)
                try:
                    t = (pa.from_numpy_dtype(np_twin) if np_twin is not None
                         else pa.string())
                except (pa.lib.ArrowNotImplementedError, TypeError):
                    t = pa.string()
        cols[c] = pa.array([], t)
    return pa.table(cols)


def str_or_empty(value) -> str:
    """Cell value -> str with one audited NaN contract: pandas object
    columns deliver None AND float NaN for missing values; ``or ""``
    misses NaN (truthy).  Shared by the html/pdf/warc batch parsers."""
    return value if isinstance(value, str) else ""


def value_cents(values: pd.Series) -> "np.ndarray":
    """2-decimal value -> exact integer cents: floor(x*100 + 0.5) as
    int64, explicit half-up — bit-matching the DuckDB oracle idiom
    ``CAST(floor(value * 100 + 0.5) AS BIGINT)``.  The audited home
    of the cents rule (the 100x sibling of :func:`revenue_cents`);
    new code must call this instead of inlining the formula."""
    import numpy as np
    return np.floor(values * 100 + 0.5).astype("int64")


def hist_value_at_rank(vals, cnts, r: int) -> int:
    """Value at 0-indexed rank ``r`` of the sorted multiset described
    by a (sorted values, counts) histogram — the cumsum+searchsorted
    rank pick shared by the histogram-quantile family (discrete
    medians, winsorize bounds, MAD)."""
    import numpy as np
    cum = np.cumsum(np.asarray(cnts, dtype="int64"))
    return int(np.asarray(vals, dtype="int64")[
        np.searchsorted(cum, r, side="right")])


def seed_row(cols):
    """One-row single-block Dataset used as a NEUTRAL seed unioned
    into a pre-groupby stream: when every real input is empty no
    group fn ever runs, the group-key column never exists in the
    schema, and an op's promised fixed-shape output (a sentinel or
    one-row-per-parameter table) silently vanishes — the seed
    guarantees the final group always fires.  ``cols`` maps column
    name -> (value, dtype).  Callers pick values that are no-ops on
    real data (zero counts, below-domain sentinels)."""
    import pandas as pd
    import ray.data
    return ray.data.from_pandas(pd.DataFrame(
        {c: pd.Series([v], dtype=dt) for c, (v, dt) in cols.items()}))
