"""Mergeable sketches + distinct/quantile/running-window operators.

The reference has no sketches (SURVEY.md section 2.5); these are the
scale patterns a 10^12-doc pipeline needs: per-batch partial state that
is MERGEABLE, so the exchange moves one small sketch per batch instead
of the data.

- ``kmv_distinct_tokens``: K-minimum-values distinct-count sketch
  (Bar-Yossef et al. 2002): keep the k smallest 64-bit token hashes per
  batch, merge by re-taking the k smallest, estimate (k-1)/max_kth.
- ``exact_distinct_tokens``: the exact counterpart via hash-partitioned
  distinct (oracle-checkable).
- ``running_sum_per_user``: per-key ordered running aggregate (window
  function) inside coarse partitions.
- ``median_value_by_type``: exact quantile per group via per-group sort
  (linear interpolation, matching SQL quantile_cont).
"""
from __future__ import annotations

import hashlib
import re
import numpy as np
import pandas as pd

from doc_ocr_ray.util import coarse_part as _coarse_part
from doc_ocr_ray.util import typed_if_empty

# explicit class == RE2 \s (see text_analysis._WS: unicode \s would
# diverge from the SQL oracles); edge-strip with the same class
_WS = re.compile(r"[\t\n\f\r ]+")
_EDGE_WS = re.compile(r"^[\t\n\f\r ]+|[\t\n\f\r ]+$")
_SCALE = float(1 << 64)


def _token_hashes(text: str) -> np.ndarray:
    t = _WS.sub(" ", _EDGE_WS.sub("", text or "").lower())
    if not t:
        return np.empty(0, dtype=np.uint64)
    return np.array(
        [int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
         for tok in set(t.split(" "))], dtype=np.uint64)


def kmv_distinct_tokens(ds, k: int = 1024, text_col: str = "text") -> dict:
    """Approximate number of distinct tokens corpus-wide.

    One KMV sketch (k smallest hashes) per batch; driver merge re-takes
    the k smallest of the union — the merge is associative and
    commutative, so any tree of partial merges gives the same sketch.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hs = np.unique(np.concatenate(
            [_token_hashes(t) for t in batch[text_col]] or
            [np.empty(0, dtype=np.uint64)]))
        smallest = np.sort(hs)[:k]
        return pd.DataFrame({"sketch": [smallest.tobytes()]})

    sketches = ds.map_batches(partial, batch_format="pandas").take_all()
    merged = np.unique(np.concatenate(
        [np.frombuffer(s["sketch"], dtype=np.uint64) for s in sketches] or
        [np.empty(0, dtype=np.uint64)]))[:k]
    if len(merged) < k:
        estimate = float(len(merged))            # saw everything
    else:
        estimate = (k - 1) / (float(merged[-1]) / _SCALE)
    # grid-safe truncation (floor, same op order as the SQL oracle) —
    # round() is half-even here but half-up in DuckDB
    import math
    return {"estimate": math.floor(10 * estimate) / 10, "k": k,
            "sketch_values": len(merged)}


def exact_distinct_tokens(ds, text_col: str = "text"):
    """(n_distinct_tokens,) — exact, via per-batch token sets then a
    hash-partitioned distinct (the shuffle carries unique tokens only)."""
    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for t in batch[text_col]:
            norm = _WS.sub(" ", _EDGE_WS.sub("", t or "").lower())
            if norm:
                toks.update(norm.split(" "))
        out = pd.DataFrame({"tok": sorted(toks)})
        out["part"] = out["tok"].map(
            lambda s: int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % 64)
        return out

    def count_unique(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [group["tok"].nunique()]})

    parts = (ds.map_batches(explode, batch_format="pandas")
               .groupby("part").map_groups(count_unique, batch_format="pandas")
               .take_all())
    import pyarrow as pa
    return pa.table({"n_distinct_tokens":
                     pa.array([int(sum(p["n"] for p in parts))], pa.int64())})


def running_sum_per_user(ds):
    """(user_id, event_id, running_cents): cumulative sum of ``value``
    per user in (ts, event_id) order — the batch window-function
    pattern: coarse hash partition on the key, per-user sort + cumsum
    inside.  Accumulates in integer cents: float accumulation order
    differs between engines and a long running sum lands exactly ON
    rounding-grid boundaries (values are 2-decimal), so only integer
    arithmetic hash-matches an independent implementation."""
    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = _coarse_part(batch["user_id"], 128)
        return batch

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"]).copy()
        cents = np.floor(g["value"] * 100 + 0.5).astype("int64")
        g["running_cents"] = cents.groupby(g["user_id"], sort=False).cumsum()
        return g[["user_id", "event_id", "running_cents"]]

    return (ds.map_batches(add_part, batch_format="pandas")
              .groupby("part").map_groups(per_part, batch_format="pandas"))


def moving_sum_per_user(ds, window: int = 3):
    """(user_id, event_id, moving_cents, prev_cents): per-user
    ROWS-window aggregates in (ts, event_id) order — the fixed-width
    sliding-window counterpart of :func:`running_sum_per_user`:
    ``moving_cents`` is the sum of the last ``window`` rows (SQL ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW), ``prev_cents`` the
    previous row's value with default 0 (SQL ``lag(cents, 1, 0)``).

    Same shape: coarse hash partition on the key, per-user vectorized
    window math inside (the moving sum is cumsum minus the
    window-shifted cumsum — no per-row loop, no rolling object).
    Integer cents throughout so aggregation order cannot perturb the
    values (see running_sum_per_user)."""
    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = _coarse_part(batch["user_id"], 128)
        return batch

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"]).copy()
        cents = np.floor(g["value"] * 100 + 0.5).astype("int64")
        by_user = cents.groupby(g["user_id"], sort=False)
        cs = by_user.cumsum()
        cs_lag = (cs.groupby(g["user_id"], sort=False).shift(window)
                  .fillna(0).astype("int64"))
        g["moving_cents"] = cs - cs_lag
        g["prev_cents"] = (by_user.shift(1).fillna(0).astype("int64"))
        return g[["user_id", "event_id", "moving_cents", "prev_cents"]]

    return (ds.map_batches(add_part, batch_format="pandas")
              .groupby("part").map_groups(per_part,
                                          batch_format="pandas"))


def trailing_window_sum(ds, window_minutes: int = 60):
    """(user_id, event_id, trailing_cents): per-user TIME-based
    trailing window — the sum of ``value`` over the last
    ``window_minutes`` INCLUDING the current row's timestamp peers
    (SQL ``RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT ROW``
    semantics: the frame is defined by the inequality
    ``ts in [t - window, t]``, so equal-timestamp rows share one
    frame and the result is order-free).  The time-RANGE counterpart
    of :func:`moving_sum_per_user`'s ROWS window.

    Shape: coarse user partition, then FULLY vectorized in-group —
    rows sort by (user, ts), each user's slice boundaries come from a
    composite ``dense_user_idx * span + ts_offset`` key so ONE
    ``np.searchsorted`` pair resolves every row's frame (no per-user
    or per-row loop).  The composite stays in int64 because span is
    the partition's own ts range + window (documented bound:
    users-per-partition x ts-span-in-us must fit 2^63 — decades of
    microseconds x millions of users).  Integer cents as everywhere.
    A NULL ts defines no frame — those rows are dropped on both sides
    (NaT's int64 sentinel would poison the composite key); a NULL
    value keeps its row but contributes 0 to every frame, matching
    SQL sum()'s NULL-skipping."""
    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["ts"].notna()]
        batch = batch.assign(
            part=_coarse_part(batch["user_id"], 128))
        return batch

    win = np.int64(window_minutes) * 60_000_000     # us

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"]).copy()
        ts = (g["ts"].astype("datetime64[us]").astype("int64")
              .to_numpy())
        val = g["value"].to_numpy(dtype="float64")
        cents = np.where(np.isnan(val), 0,
                         np.floor(val * 100 + 0.5)).astype("int64")
        uid = g["user_id"].to_numpy()
        # dense user index within this partition
        uidx = np.cumsum(np.r_[0, uid[1:] != uid[:-1]])
        lo_ts, hi_ts = (int(ts.min()), int(ts.max())) if len(ts) \
            else (0, 0)
        span = np.int64(hi_ts - lo_ts) + win + 2
        key = uidx * span + (ts - lo_ts)
        cs = np.r_[0, np.cumsum(cents)]
        upper = np.searchsorted(key, key, side="right")
        lower = np.searchsorted(key, uidx * span
                                + np.maximum(ts - lo_ts - win, 0),
                                side="left")
        g["trailing_cents"] = cs[upper] - cs[lower]
        return g[["user_id", "event_id", "trailing_cents"]]

    return (ds.map_batches(add_part, batch_format="pandas")
              .groupby("part").map_groups(per_part,
                                          batch_format="pandas"))


def median_value_by_type(ds):
    """(event_type, median_value): exact per-group median with linear
    interpolation (same definition as SQL quantile_cont)."""
    def per_group(group: pd.DataFrame) -> pd.DataFrame:
        med = float(group["value"].quantile(0.5, interpolation="linear"))
        return pd.DataFrame({
            "event_type": [group["event_type"].iloc[0]],
            "median_value": [np.floor(10000 * med) / 10000],
        })
    return ds.groupby("event_type").map_groups(per_group,
                                               batch_format="pandas")


def kmv_distinct_users_by_type(ds, k: int = 256):
    """(event_type, est_users): per-GROUP K-minimum-values distinct
    sketch — what replaces ``distinct_users_by_type``'s exact
    distinct-pair exchange when the pair set itself is too big (the
    same trade the global KMV makes for tokens, now with the sketch
    as the per-group MERGEABLE partial).  Deterministic: the hash is
    md5, so the estimate is a pure function of the data and the
    DuckDB twin reproduces it bit for bit (an APPROXIMATE operator
    with an EXACT oracle — the estimator itself is deterministic,
    only its relation to the true count is approximate).

    Shape: per batch, per type, the k smallest distinct user hashes
    (<= k * |types| rows ride the exchange, never user rows); one
    tiny type-keyed combine re-takes the k smallest; groups that
    never fill the sketch report their exact distinct count.
    Estimate grid: floor(10 * est) / 10, est = (k-1) /
    (kth_min / 2^64) with the stated float op order."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.dropna(subset=["event_type", "user_id"])
        uid = g["user_id"]
        if pd.api.types.is_float_dtype(uid):
            # a null in the batch promoted int64 -> float64; str(u)
            # would hash '1000.0' where the oracle hashes '1000'
            uid = uid.astype("int64")
        outs = []
        for t, users in uid.groupby(g["event_type"], sort=False):
            hs = np.sort(np.array(
                [int.from_bytes(
                    hashlib.md5(str(u).encode()).digest()[:8], "big")
                 for u in set(users)], dtype=np.uint64))[:k]
            outs.append(pd.DataFrame({
                "event_type": t, "h": hs.astype("uint64")}))
        if not outs:
            return typed_if_empty(pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "h": pd.Series([], dtype="uint64")}))
        return pd.concat(outs, ignore_index=True)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        hs = np.sort(np.unique(group["h"].to_numpy()))[:k]
        if len(hs) < k:
            est = float(len(hs))
        else:
            est = (k - 1) / (float(hs[-1]) / _SCALE)
        return pd.DataFrame({
            "event_type": [group["event_type"].iloc[0]],
            "est_users": [np.floor(10 * est) / 10]})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type").map_groups(combine,
                                              batch_format="pandas"))


def hll_distinct_users_by_type(ds):
    """(event_type, est_users): per-group HyperLogLog (Flajolet et
    al. 2007), the CONSTANT-size companion to the KMV sketch — 64
    registers per group no matter the cardinality, where KMV carries
    k=256 hashes.  Deterministic like KMV: md5-derived registers make
    the estimate a pure function of the data, so this approximate
    operator still has a bit-exact DuckDB twin.

    Register rule (b=6, m=64): the md5-64 hash's TOP 6 bits pick the
    register, rho = 1 + leading zeros of the remaining 58 bits (zero
    suffix -> rho = 59); register value = max rho.  The mergeable
    partial is (event_type, register, M) maxes — <= 64 x |types| rows
    ride the ONE exchange, never user rows.

    Estimator with the float ops pinned: the indicator sum is EXACT —
    S = sum_j 2^(59 - M_j) as a Python int (untouched registers
    contribute 2^59; max 64 * 2^59 needs > int64, same HUGEINT
    discipline as the SQL twin) — then ONE stated float expression
    raw = (0.709 * 4096.0 * 2^59) / double(S); small-range correction
    (V = zero registers > 0 and raw <= 160.0) switches to linear
    counting 64 * ln(64 / V) (ln parity with DuckDB is verified by
    the bm25 oracle).  The 2^32 large-range correction of the paper
    does not exist here: the hash is 64-bit.  Grid: floor(10*est)/10.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.dropna(subset=["event_type", "user_id"])
        uid = g["user_id"]
        if pd.api.types.is_float_dtype(uid):
            # null promotion int64 -> float64 (see KMV above)
            uid = uid.astype("int64")
        outs = []
        for t, users in uid.groupby(g["event_type"], sort=False):
            regs: dict = {}
            for u in set(users):
                h = int.from_bytes(
                    hashlib.md5(str(u).encode()).digest()[:8], "big")
                j = h >> 58
                sfx = h & ((1 << 58) - 1)
                rho = 59 if sfx == 0 else 58 - sfx.bit_length() + 1
                if rho > regs.get(j, 0):
                    regs[j] = rho
            outs.append(pd.DataFrame({
                "event_type": t,
                "j": np.fromiter(regs.keys(), dtype=np.int64,
                                 count=len(regs)),
                "m_val": np.fromiter(regs.values(), dtype=np.int64,
                                     count=len(regs))}))
        if not outs:
            return typed_if_empty(pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "j": pd.Series([], dtype="int64"),
                "m_val": pd.Series([], dtype="int64")}))
        return pd.concat(outs, ignore_index=True)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        import math
        M = np.zeros(64, dtype=np.int64)
        agg = group.groupby("j")["m_val"].max()
        M[agg.index.to_numpy()] = agg.to_numpy()
        S = sum(1 << (59 - int(mj)) for mj in M)     # exact, > int64
        V = int((M == 0).sum())
        raw = (0.709 * 4096.0 * float(1 << 59)) / float(S)
        if V > 0 and raw <= 160.0:
            est = 64.0 * math.log(64.0 / float(V))
        else:
            est = raw
        return pd.DataFrame({
            "event_type": [group["event_type"].iloc[0]],
            "est_users": [np.floor(10 * est) / 10]})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type").map_groups(combine,
                                              batch_format="pandas"))


def median_value_by_type_hist(ds):
    """(event_type, median_value): exact interpolated median per
    group — same output (and SAME oracle) as
    :func:`median_value_by_type`, but scale-safe: that operator sorts
    each whole group in one task (a 100 TB corpus with 5 event types
    puts 20 TB in one sort); this one exploits the 2-decimal value
    grid — per-batch (type, cents) value counts collapse to a tiny
    histogram (|types| x |distinct cents| rows), and the driver reads
    the two middle order statistics straight off the cumulative
    counts.  Interpolation is the same double formula as SQL
    quantile_cont on values that sit exactly on the cents grid, so
    the floor(1e4*x)/1e4 result is bit-identical.

    Shuffle shape: the (type, cents) key space is near-corpus-
    cardinality, so a NATIVE groupby.sum pays an all-to-all sort of
    every per-batch partial (the mad_outliers lesson — ~12 s of this
    op's 12.1 s sf0.1 wall); partials re-key on a coarse hash and
    merge inside the group fn instead, and only the combined
    |types| x |distinct cents| histogram reaches the driver."""
    import pyarrow as pa

    from doc_ocr_ray.util import coarse_part

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.dropna(subset=["event_type", "value"])
        cents = np.floor(g["value"] * 100 + 0.5).astype("int64")
        out = (pd.DataFrame({"event_type": g["event_type"],
                             "cents": cents})
               .groupby(["event_type", "cents"], sort=False).size()
               .reset_index(name="cnt"))
        out["cnt"] = out["cnt"].astype("int64")
        out["part"] = coarse_part(
            out["event_type"].astype(str) + ":"
            + out["cents"].astype(str), 64)
        return typed_if_empty(out)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["event_type", "cents"], sort=False)["cnt"]
             .sum().reset_index())
        g["cnt"] = g["cnt"].astype("int64")
        return typed_if_empty(g[["event_type", "cents", "cnt"]])

    hist = (ds.map_batches(partial, batch_format="pandas")
            .groupby("part").map_groups(combine, batch_format="pandas")
            .to_pandas()
            .sort_values(["event_type", "cents"]))
    rows = []
    for t, grp in hist.groupby("event_type", sort=True):
        n = int(grp["cnt"].sum())
        cum = grp["cnt"].cumsum()
        h = (n - 1) * 0.5
        lo_rank, hi_rank = int(np.floor(h)), int(np.ceil(h))
        lo = float(grp["cents"].to_numpy()[
            np.searchsorted(cum.to_numpy(), lo_rank + 1)]) / 100.0
        hi = float(grp["cents"].to_numpy()[
            np.searchsorted(cum.to_numpy(), hi_rank + 1)]) / 100.0
        med = lo + (h - lo_rank) * (hi - lo)
        rows.append({"event_type": t,
                     "median_value": np.floor(10000 * med) / 10000})
    return pa.Table.from_pandas(pd.DataFrame(rows),
                                preserve_index=False)


def value_time_corr(ds, y_offset: int = 1_500_000_000):
    """(event_type, corr_micro): Pearson correlation between event
    value and event TIME per type — the drift detector (are purchases
    getting bigger over the log's life?).  Integer-exact moments, the
    zscore_by_group discipline: per-batch integer partials (n, Σx,
    Σy, Σxy, Σx², Σy²) over value CENTS and OFFSET epoch seconds —
    summed as PYTHON ints per batch (object-dtype products: y² alone
    is ~4e16/row on 2024 epochs, so int64 batch sums wrap at a few
    hundred same-type rows) and shipped as DECIMAL STRINGS, exact at
    any magnitude; the tiny per-type combine re-parses and sums at
    the driver, then corr = (nΣxy - ΣxΣy) /
    (sqrt(nΣx²-Σx²_) * sqrt(nΣy²-Σy²_)) with ONE stated
    double-conversion order so the HUGEINT-summing DuckDB twin is
    bit-identical.  Zero-variance groups define corr_micro = 0.
    NULL ts/value/type rows carry no signal — dropped both sides."""
    import math

    import pyarrow as pa

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.dropna(subset=["event_type", "ts", "value"])
        x = np.floor(g["value"] * 100 + 0.5).astype("int64")
        y = (g["ts"].astype("datetime64[ns]").astype("int64")
             // 10**9) - y_offset
        # object-dtype → python-int products/sums: EXACT at any
        # magnitude (int64 y² sums wrap within one large batch)
        xo = x.astype(object)
        yo = y.astype(object)
        f = pd.DataFrame({"event_type": g["event_type"],
                          "x": xo, "y": yo, "xy": xo * yo,
                          "xx": xo * xo, "yy": yo * yo})
        out = (f.groupby("event_type", sort=False)
               .agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
                    sxy=("xy", "sum"), sxx=("xx", "sum"),
                    syy=("yy", "sum"))
               .reset_index())
        out["n"] = out["n"].astype("int64")
        for c in ("sx", "sy", "sxy", "sxx", "syy"):
            out[c] = out[c].map(str)      # decimal strings ride Arrow
        return typed_if_empty(out)

    parts = (ds.map_batches(partial, batch_format="pandas")
             .to_pandas())
    rows = []
    for t, grp in parts.groupby("event_type", sort=True):
        n = int(grp["n"].sum())
        sx = sum(int(v) for v in grp["sx"])
        sy = sum(int(v) for v in grp["sy"])
        sxy = sum(int(v) for v in grp["sxy"])
        sxx = sum(int(v) for v in grp["sxx"])
        syy = sum(int(v) for v in grp["syy"])
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        if d1 <= 0 or d2 <= 0:
            cm = 0
        else:
            corr = float(num) / (math.sqrt(float(d1))
                                 * math.sqrt(float(d2)))
            cm = int(np.floor(1e6 * corr))
        rows.append({"event_type": t, "corr_micro": cm})
    out = pd.DataFrame(rows)
    out["corr_micro"] = out["corr_micro"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def cms_token_counts(ds, query_tokens, depth: int = 4,
                     width: int = 1024, text_col: str = "text"):
    """Count-Min Sketch token-frequency estimation (Cormode &
    Muthukrishnan 2005) — the CONSTANT-memory companion to the exact
    :func:`heavy_hitters` recount: estimate each query token's total
    occurrence count from a depth x width counter table, never
    holding (or shuffling) the corpus vocabulary.  Like the KMV/HLL
    sketches here, the estimator is DETERMINISTIC (md5-derived
    bucket functions), so this approximate operator still has a
    bit-exact SQL twin.

    Counters are MERGEABLE by plain addition: one corpus pass emits
    per-batch nonzero (row, bucket, cnt) partials over the normalized
    token stream (the ``_NORM`` contract, occurrence counts — a
    token's batch partial is ONE row per hash row, md5 evaluated once
    per DISTINCT batch token); one tiny groupby bounded by
    depth*width sums them; the finished sketch (<= depth*width rows)
    lands on the driver, where each query token reads
    ``min_j counter[j][h_j(token)]``.  Classic guarantee:
    ``est >= true`` always (returned estimates are upper bounds);
    overshoot is collision mass, bounded in expectation by
    ``total_tokens / width`` per row and min'd across rows.

    ``h_j(tok) = md5('<j>:' || tok)[:16 hex] % width`` — the dsir /
    simhash hex-prefix idiom both engines compute identically.
    Output: one row per query token, (token, est), est int64.
    """
    from doc_ocr_ray.stages.text_analysis import _norm_tokens_flat

    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    qtoks = list(dict.fromkeys(query_tokens))
    if not qtoks:
        raise ValueError("query_tokens must be non-empty")

    def _bucket(j: int, tok: str) -> int:
        return int(hashlib.md5(f"{j}:{tok}".encode())
                   .hexdigest()[:16], 16) % width

    _empty = pd.DataFrame({
        "row": pd.Series([], dtype="int64"),
        "bucket": pd.Series([], dtype="int64"),
        "cnt": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        _, toks = _norm_tokens_flat(list(batch[text_col].fillna("")))
        if not len(toks):
            return typed_if_empty(_empty)
        uniq, counts = np.unique(toks, return_counts=True)
        rows, buckets, cnts = [], [], []
        for j in range(depth):
            b = np.fromiter((_bucket(j, u) for u in uniq),
                            dtype=np.int64, count=len(uniq))
            agg = np.zeros(width, dtype=np.int64)
            np.add.at(agg, b, counts)
            nz = np.nonzero(agg)[0]
            rows.append(np.full(len(nz), j, dtype=np.int64))
            buckets.append(nz)
            cnts.append(agg[nz])
        return pd.DataFrame({
            "row": np.concatenate(rows),
            "bucket": np.concatenate(buckets),
            "cnt": np.concatenate(cnts)})

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["row", "bucket"], sort=False)["cnt"]
             .sum().reset_index())
        g["cnt"] = g["cnt"].astype("int64")
        return typed_if_empty(g)

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = ((batch["row"] * width + batch["bucket"])
                         % 64).astype("int64")
        return batch

    sketch = (ds.map_batches(partial, batch_format="pandas")
              .map_batches(key, batch_format="pandas")
              .groupby("part").map_groups(
                  lambda g: combine(g).assign(
                      part=g["part"].iloc[0]),
                  batch_format="pandas")
              .to_pandas())
    table = {(int(r), int(b)): int(c) for r, b, c in
             zip(sketch["row"], sketch["bucket"], sketch["cnt"])}
    return pd.DataFrame({
        "token": pd.Series(qtoks, dtype="object"),
        "est": pd.Series(
            [min(table.get((j, _bucket(j, t)), 0)
                 for j in range(depth)) for t in qtoks],
            dtype="int64")})


def quantile_hist_by_type(ds, quantiles=(50, 90, 99),
                          bin_cents: int = 500):
    """Mergeable equi-width-histogram quantile estimation per group —
    the fixed-memory alternative to a distributed sort when a
    pipeline needs p50/p90/p99 of a value column per key (t-digest /
    GK-sketch territory, realized here as the simplest mergeable
    summary with a DETERMINISTIC, SQL-twinnable estimate): values
    become integer cents, cents bucket into width-``bin_cents`` bins,
    per-batch (event_type, bin) partial counts merge in ONE tiny
    groupby, and the quantile estimate interpolates inside the
    winning bin with pure integer arithmetic:

        r        = q*(n-1) // 100          (0-indexed target rank)
        bin B    = first bin with cum(B) > r
        estimate = B*w + (r - cum_before) * w // count(B)

    Exactness: estimate error is bounded by one bin width (choose
    ``bin_cents`` to taste); the ARITHMETIC is exact integers, so the
    DuckDB twin reproduces it bit-for-bit — the sketch is approximate
    but verifiable, the CMS/HLL/KMV discipline.  NULL values and
    types carry no signal and drop.

    Output: one row per (event_type, q) — ``(event_type, q,
    est_cents)``, both engines' rows identical.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch.dropna(subset=["event_type", "value"])
        cents = np.floor(t["value"] * 100 + 0.5).astype("int64")
        g = pd.DataFrame({"event_type": t["event_type"],
                          "bin": cents // bin_cents})
        out = (g.groupby(["event_type", "bin"], sort=False)
               .size().reset_index(name="cnt"))
        return typed_if_empty(out)

    def estimate(group: pd.DataFrame) -> pd.DataFrame:
        # the upstream Ray groupby already merged counts: exactly one
        # row per (event_type, bin) reaches this fn
        g = group.sort_values("bin")
        bins = g["bin"].to_numpy(dtype="int64")
        cnt = g["cnt"].to_numpy(dtype="int64")
        n = int(cnt.sum())
        cum = np.cumsum(cnt)
        rows = []
        for q in quantiles:
            r = q * (n - 1) // 100
            i = int(np.searchsorted(cum, r, side="right"))
            before = int(cum[i - 1]) if i else 0
            est = (int(bins[i]) * bin_cents
                   + (r - before) * bin_cents // int(cnt[i]))
            rows.append((group["event_type"].iloc[0], int(q), est))
        return pd.DataFrame(rows, columns=["event_type", "q",
                                           "est_cents"])

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(["event_type", "bin"]).sum("cnt")
            .map_batches(lambda b: b.rename(
                columns={"sum(cnt)": "cnt"}), batch_format="pandas")
            .groupby("event_type")
            .map_groups(estimate, batch_format="pandas"))
