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


def epoch_days(ts: pd.Series) -> pd.Series:
    """Timestamps -> integer epoch days by floor division — tz-proof
    and exact for pre-1970 dates too (``//`` floors toward -inf,
    matching the oracle's floor(epoch(ts)/86400.0)).  The single
    audited home of the day rule shared by retention_cohorts and
    daily_activity; NaT rows must be filtered by the caller first."""
    return (ts.astype("datetime64[ns]").astype("int64")
            // 10**9 // 86400)


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
