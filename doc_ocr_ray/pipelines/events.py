"""Stream-shaped operators over the ordered events log.

Ray Data has no event-time windowing; these implement the standard
batch formulations (ray_guide: treat the log as partitioned by key and
sorted by ts within each group):

- ``tumbling_window``: fixed windows via truncated-timestamp keys —
  a partial aggregate per batch, then one small groupby.
- ``sessionize``: gap-based sessions per user — coarse hash partition
  on user, per-user sort + gap-split inside the group fn.  Ordering
  assumption: all events of one user reach one group (guaranteed by
  the groupby); within-user order is (ts, event_id).
- ``top_k_per_group``: per-key top-k without a global sort.
- ``anti_join_broadcast``: NOT EXISTS via a broadcast key set.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def tumbling_window(ds, freq: str = "h"):
    """(event_type, window, n, sum_value): hourly tumbling counts."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            window=batch["ts"].dt.floor(freq),
            cents=np.floor(batch["value"] * 100 + 0.5).astype("int64"))
        g = (batch.groupby(["event_type", "window"], sort=False)["cents"]
                  .agg(["count", "sum"]).reset_index())
        g.columns = ["event_type", "window", "n", "sum_cents"]
        return g

    partials = ds.map_batches(partial, batch_format="pandas")

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [group["event_type"].iloc[0]],
            "window": [group["window"].iloc[0]],
            "n": [int(group["n"].sum())],
            # integer-cents accumulation: see events_by_type
            "sum_value": [int(group["sum_cents"].sum()) / 100.0],
        })
    return partials.groupby(["event_type", "window"]).map_groups(
        final, batch_format="pandas")


def hopping_window(ds, size_minutes: int = 120, hop_minutes: int = 30):
    """Overlapping (hopping/sliding) event-time windows: every event
    lands in the ``size/hop`` windows covering its timestamp; output
    ``(event_type, window_start, n, sum_value)`` with ``window_start``
    as epoch SECONDS (integer — timezone-proof across engines).

    Shape: per-batch partial aggregate on the base ``hop`` slot FIRST
    (collapses the batch to types x slots before any copying), then
    the small partial fans out to its ``size/hop`` covering windows —
    the exchange carries window partials, never per-event rows, and
    the overlap factor multiplies only the collapsed partial.
    ``size_minutes`` must be a multiple of ``hop_minutes``.
    """
    if size_minutes % hop_minutes:
        raise ValueError("size_minutes must be a multiple of hop_minutes")
    hop = hop_minutes * 60
    nwin = size_minutes // hop_minutes

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = (batch["ts"].astype("datetime64[ns]").astype("int64")
                 // 10**9)
        base = pd.DataFrame({
            "event_type": batch["event_type"],
            "slot": (epoch // hop) * hop,
            "cents": np.floor(batch["value"] * 100
                              + 0.5).astype("int64")})
        g = (base.groupby(["event_type", "slot"], sort=False)["cents"]
             .agg(["count", "sum"]).reset_index())
        g.columns = ["event_type", "slot", "n", "sum_cents"]
        fan = pd.concat([g.assign(window_start=g["slot"] - k * hop)
                         for k in range(nwin)], ignore_index=True)
        fan = fan[["event_type", "window_start", "n", "sum_cents"]]
        # coarse shuffle key (not the window itself): millions of tiny
        # (type, window) groups must combine inside the group fn
        fan["part"] = _coarse_part(
            fan["event_type"] + ":" + fan["window_start"].astype(str), 64)
        return _typed_if_empty(fan)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        out = (group.groupby(["event_type", "window_start"], sort=False)
               .agg(n=("n", "sum"), sum_cents=("sum_cents", "sum"))
               .reset_index())
        out["n"] = out["n"].astype("int64")
        # integer-cents accumulation: see events_by_type
        out["sum_value"] = out["sum_cents"].astype("int64") / 100.0
        return _typed_if_empty(out.drop(columns=["sum_cents"]))

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("part").map_groups(final, batch_format="pandas"))


def sessionize(ds, gap_minutes: int = 30):
    """Gap-based sessions: (user_id, session_id, n_events, start_ts,
    end_ts); session_id is the 1-based ordinal within the user."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = _coarse_part(batch["user_id"], 128)
        return batch

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in group.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "event_id"])
            brk = (g["ts"].diff() > gap) | g["ts"].diff().isna()
            sid = brk.cumsum()
            agg = g.groupby(sid).agg(n_events=("event_id", "count"),
                                     start_ts=("ts", "min"),
                                     end_ts=("ts", "max")).reset_index(drop=True)
            agg.insert(0, "user_id", uid)
            agg.insert(1, "session_id", range(1, len(agg) + 1))
            out.append(agg)
        return (pd.concat(out, ignore_index=True) if out
                else pd.DataFrame({"user_id": [], "session_id": [],
                                   "n_events": [], "start_ts": [],
                                   "end_ts": []}))

    return (ds.map_batches(add_part, batch_format="pandas")
              .groupby("part").map_groups(per_part, batch_format="pandas")
              .select_columns(["user_id", "session_id", "n_events",
                               "start_ts", "end_ts"]))


def sessionize_streaming(ds, gap_minutes: int = 30, num_buckets: int = 8,
                         chunk_rows: int = 20000):
    """Incremental sessionization with EXPLICIT actor state — the one
    place the engine drops to raw Ray actors, because "open session per
    user, updated as events arrive in time order" is mutable shared
    state the Dataset API cannot express.

    Topology (round-3 verdict item 5 — the previous shape routed
    everything through ONE dispatcher actor, a serial bottleneck):
    a user-hash-KEYED ACTOR POOL.  The ts-ordered stream (global
    sort, materialized to plasma) is consumed by every bucket actor
    IN PARALLEL; each actor zero-copy-filters the Arrow blocks to
    its own ``user_id % num_buckets`` slice, so per-user event-time
    order is preserved without any cross-actor coordination, state
    (open sessions, per-user ordinals) is partitioned by the key
    hash, and no single consumer serializes the stream.  Per-chunk
    processing is vectorized per user (numpy gap scan), not per
    event.  The result is assembled from per-actor DataFrame object
    refs (``from_pandas_refs``) — session rows never pass through
    the driver.  Produces exactly the batch ``sessionize`` output
    (asserted in tests), so the same SQL oracle applies.  At real
    scale the plasma-resident sorted stream is read once per bucket
    actor (zero-copy per node); the batch ``sessionize`` remains
    the one-scan path.
    """
    import numpy as np
    import ray
    import ray.data

    gap = pd.Timedelta(minutes=gap_minutes)

    @ray.remote
    class SessionActor:
        """Owns one key partition: open sessions + per-user session
        ordinals for ``user_id % num_buckets == bucket``."""

        def __init__(self, bucket: int, num_buckets: int):
            self.bucket = bucket
            self.num_buckets = num_buckets
            self.open = {}      # user_id -> [sid, n, start, end]
            self.counts = {}    # user_id -> sessions emitted so far
            self.closed = []

        def _chunk(self, df: pd.DataFrame) -> None:
            # df is ts-ordered and already filtered to this bucket;
            # stable groupby keeps each user's slice ts-ordered.
            # Vectorized gap scan per USER (not per event): brk[i] is
            # True iff event i opens a new session.
            gap_ns = np.timedelta64(gap.value, "ns")
            for uid, g in df.groupby("user_id", sort=False):
                ts = g["ts"].to_numpy()
                cur = self.open.get(uid)    # [sid, n, start, end]
                brk = np.empty(len(ts), dtype=bool)
                brk[0] = cur is None or (ts[0] - cur[3]) > gap_ns
                if len(ts) > 1:
                    brk[1:] = (ts[1:] - ts[:-1]) > gap_ns
                starts = np.flatnonzero(brk)
                if cur is not None and not brk[0]:
                    # leading events extend the open session
                    first_end = int(starts[0]) if len(starts) \
                        else len(ts)
                    cur[1] += first_end
                    cur[3] = ts[first_end - 1]
                if cur is not None and len(starts):
                    # a new session follows: the open one closes
                    self.closed.append((uid, cur[0], cur[1],
                                        cur[2], cur[3]))
                    del self.open[uid]
                bounds = [int(s) for s in starts] + [len(ts)]
                for i in range(len(starts)):
                    lo, hi = bounds[i], bounds[i + 1]
                    sid = self.counts.get(uid, 0) + 1
                    self.counts[uid] = sid
                    if i < len(starts) - 1:
                        self.closed.append((uid, sid, hi - lo,
                                            ts[lo], ts[hi - 1]))
                    else:
                        self.open[uid] = [sid, hi - lo,
                                          ts[lo], ts[hi - 1]]

        def run(self, ordered, chunk_rows: int) -> int:
            """Consume the shared ordered stream, keep only this
            bucket's rows (zero-copy Arrow filter), sessionize."""
            n = 0
            for batch in ordered.iter_batches(batch_size=chunk_rows,
                                              batch_format="pyarrow"):
                ids = batch["user_id"].to_numpy(zero_copy_only=False)
                mask = ids % self.num_buckets == self.bucket
                if not mask.any():
                    continue
                df = batch.take(np.flatnonzero(mask)).to_pandas()
                n += len(df)
                self._chunk(df)
            return n

        def finish(self) -> pd.DataFrame:
            rows = self.closed + [
                (uid, c[0], c[1], c[2], c[3])
                for uid, c in self.open.items()]
            self.open.clear()
            self.closed = []
            out = pd.DataFrame(rows, columns=["user_id", "session_id",
                                              "n_events", "start_ts",
                                              "end_ts"])
            # the ts casts matter for EMPTY buckets: object-dtype
            # start/end columns produce mixed block schemas in
            # from_pandas_refs and spam Ray's size estimator (the
            # typed-empty rule; round-4 review finding)
            return out.astype({"user_id": "int64", "session_id": "int64",
                               "n_events": "int64",
                               "start_ts": "datetime64[ns]",
                               "end_ts": "datetime64[ns]"})

    actors = [SessionActor.remote(b, num_buckets)
              for b in range(num_buckets)]
    ordered = ds.sort(["ts", "event_id"]).materialize()
    # all bucket consumers run concurrently — the parallelism IS the
    # actor pool; per-actor FIFO orders run() before finish()
    ray.get([a.run.remote(ordered, chunk_rows) for a in actors])
    refs = [a.finish.remote() for a in actors]
    return ray.data.from_pandas_refs(refs)


def top_k_per_group(ds, key: str, order_col: str, tiebreak_col: str,
                    k: int = 3):
    """Per-key top-k by order_col desc (ties by tiebreak asc), rank
    column included.  Coarse hash partition on the key -> per-key
    head(k) inside the group fn; no global sort."""
    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = _coarse_part(batch[key], 128)
        return batch

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key, order_col, tiebreak_col],
                              ascending=[True, False, True])
        top = g.groupby(key, sort=False).head(k).copy()
        top["rank"] = top.groupby(key, sort=False).cumcount() + 1
        return top.drop(columns=["part"])

    return (ds.map_batches(add_part, batch_format="pandas")
              .groupby("part").map_groups(per_part, batch_format="pandas"))


def top_k_per_group_salted(ds, key: str, order_col: str,
                           tiebreak_col: str, k: int = 3,
                           salt: int = 8):
    """:func:`top_k_per_group` for HOT keys: when one key owns a
    material fraction of the corpus (a mega-customer, a bot user),
    the plain coarse-key partition puts that key's entire row set in
    ONE group and the job runs at the speed of its slowest straggler.
    Top-k is MERGEABLE — the top-k of a union is contained in the
    union of the parts' top-ks — so the salted two-stage version is
    exactly equivalent:

    1. partition by (key, hash(tiebreak) % salt): a hot key's rows
       spread over ``salt`` groups; per-sub-group vectorized top-k
       caps every exchange-2 contribution at k rows per sub-group;
    2. a second exchange on the bare key merges the ≤ salt*k
       candidates per key and takes the final top-k + rank.

    Byte-identical output to the unsalted operator (same oracle), at
    the cost of one extra (tiny: |keys|*salt*k rows) exchange."""
    def add_salted_part(batch: pd.DataFrame) -> pd.DataFrame:
        # string-composed sub-key: works for ANY key dtype (the
        # unsalted operator's contract), not just integers
        batch["sub"] = _coarse_part(batch[tiebreak_col], salt)
        batch["part"] = _coarse_part(
            batch[key].astype(str) + ":" + batch["sub"].astype(str),
            128)
        return batch

    def sub_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key, "sub", order_col, tiebreak_col],
                              ascending=[True, True, False, True])
        top = g.groupby([key, "sub"], sort=False).head(k)
        return top.drop(columns=["part", "sub"])

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = _coarse_part(batch[key], 128)
        return batch

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key, order_col, tiebreak_col],
                              ascending=[True, False, True])
        top = g.groupby(key, sort=False).head(k).copy()
        top["rank"] = top.groupby(key, sort=False).cumcount() + 1
        return top.drop(columns=["part"])

    cand = (ds.map_batches(add_salted_part, batch_format="pandas")
            .groupby("part").map_groups(sub_topk,
                                        batch_format="pandas"))
    return (cand.map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(final_topk,
                                        batch_format="pandas"))


def parse_props_k(ds):
    """Structured-JSON field extraction from the ``props`` column
    (vectorized per batch) + distribution of the extracted value bucket:
    (k_bucket, n).  The engine's structured twin of the M13 JSON parse
    ladder, applied columnar."""
    import json

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        ks = []
        for p in batch["props"]:
            try:
                ks.append(int(json.loads(p).get("k", -1)))
            except (ValueError, TypeError, AttributeError,
                    json.JSONDecodeError):
                # AttributeError: valid JSON that isn't an object
                # ('[1]', '42', '"s"') has no .get — same -1 default as
                # the oracle's json_extract returning NULL
                ks.append(-1)
        out = pd.DataFrame({"k_bucket": pd.Series(ks, dtype="int64") // 10})
        return (out.groupby("k_bucket", sort=False).size()
                   .reset_index(name="n"))

    partials = ds.map_batches(extract, batch_format="pandas")

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k_bucket": [group["k_bucket"].iloc[0]],
                             "n": [int(group["n"].sum())]})
    return partials.groupby("k_bucket").map_groups(final, batch_format="pandas")


def anti_join_broadcast(ds, key: str, other_ds, other_key: str):
    """Rows of ds whose key has NO match in other_ds: the other side's
    distinct keys ride the object store once (semi/anti joins never
    need a shuffle when one side's key set fits in memory; use a Bloom
    filter at 10^12 scale)."""
    import ray
    # distributed distinct FIRST (Dataset.unique), so only the distinct
    # key set crosses to the driver for the broadcast — not every row
    keys = set(other_ds.select_columns([other_key]).unique(other_key))
    ref = ray.put(keys)

    def flt(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        return batch[~batch[key].isin(ks)]
    return ds.map_batches(flt, batch_format="pandas")


from doc_ocr_ray.util import coarse_part as _coarse_part  # noqa: E402


def _tag_part(key: str, num_partitions: int, tag: int):
    """map_batches fn adding the coarse partition + side-tag columns
    (the house pattern shared by the tagged-union joins)."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = _coarse_part(batch[key], num_partitions)
        batch["_side"] = tag
        return batch
    return fn


def asof_join(left_ds, right_ds, key: str, on: str,
              num_partitions: int = 128):
    """Backward as-of join: each left row is matched to the right row
    with the greatest ``on`` <= left ``on`` within the same ``key``
    (ties broken toward the later right row in (on, columns) sort
    order).  Inner semantics: unmatched left rows drop.  Right-side
    columns that collide with left names come back suffixed
    ``_right``.

    Both sides must share a schema (the common case: two slices of one
    event stream).  Shuffle shape: ONE coarse hash partition on ``key``
    over the tagged union of both sides (same as the eval join), then
    a vectorized ``pandas.merge_asof`` galloping merge inside each
    group.  Neither side is broadcast, so both may be web-scale; skew
    is bounded by the hottest single key.
    """
    tagged = (left_ds.map_batches(_tag_part(key, num_partitions, 0),
                                  batch_format="pandas")
              .union(right_ds.map_batches(_tag_part(key, num_partitions, 1),
                                          batch_format="pandas")))

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["_side"] == 0].drop(columns=["part", "_side"])
        right = group[group["_side"] == 1].drop(columns=["part", "_side"])
        # sort the right side by (on, *) so that among equal `on`
        # values merge_asof's "last row wins" picks a DETERMINISTIC
        # winner (the max of the remaining columns in order)
        tie_cols = [c for c in right.columns if c != on]
        right = (right.sort_values([on] + tie_cols, kind="mergesort")
                 .reset_index(drop=True))
        # merge only (key, on, row-pointer): payload columns must NOT
        # ride through merge_asof, whose NaN upcast to float64 silently
        # rounds int64 values > 2^53 (snowflake-style ids) even on the
        # rows that matched
        probe = right[[key, on]].copy()
        probe["_ridx"] = np.arange(len(right), dtype="int64")
        out = pd.merge_asof(
            left.sort_values(on, kind="mergesort").reset_index(drop=True),
            probe, on=on, by=key, direction="backward")
        out = out[out["_ridx"].notna()]
        ridx = out.pop("_ridx").to_numpy().astype("int64")
        matched = (right.iloc[ridx].reset_index(drop=True)
                   .drop(columns=[key]))
        matched.columns = [f"{c}_right" if c in left.columns else c
                           for c in matched.columns]
        return pd.concat([out.reset_index(drop=True), matched], axis=1)

    return (tagged.groupby("part")
            .map_groups(per_part, batch_format="pandas"))


def label_sessions(ds, gap_minutes: int = 30, num_partitions: int = 128):
    """Range (interval-containment) join, instantiated on sessions:
    each event row gets the ``session_id`` of the session whose
    ``[start_ts, end_ts]`` window contains its timestamp.

    The general pattern: point rows and interval rows ride ONE coarse
    hash partition on the key as a tagged union over a fully-TYPED
    common schema (sentinels, never nulls — null columns break Arrow
    block unification), then inside each group a backward
    ``merge_asof`` against interval starts plus an end-bound filter
    resolves containment.  This assumes intervals per key are
    NON-OVERLAPPING (true for sessions; for overlapping intervals
    fan out candidates with a bounded lookback instead).
    """
    sessions = sessionize(ds, gap_minutes=gap_minutes)

    def tag_points(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].astype("int64"),
            "t": batch["ts"],
            "end_t": batch["ts"],                      # sentinel
            "event_id": batch["event_id"].astype("int64"),
            "session_id": np.full(len(batch), -1, dtype="int64"),
            "part": _coarse_part(batch["user_id"], num_partitions),
            "_side": np.zeros(len(batch), dtype="int64"),
        })

    def tag_intervals(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].astype("int64"),
            "t": batch["start_ts"],
            "end_t": batch["end_ts"],
            "event_id": np.full(len(batch), -1, dtype="int64"),
            "session_id": batch["session_id"].astype("int64"),
            "part": _coarse_part(batch["user_id"], num_partitions),
            "_side": np.ones(len(batch), dtype="int64"),
        })

    tagged = (ds.map_batches(tag_points, batch_format="pandas")
              .union(sessions.map_batches(tag_intervals,
                                          batch_format="pandas")))

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        pts = group[group["_side"] == 0]
        ivs = group[group["_side"] == 1]
        out = pd.merge_asof(
            pts[["user_id", "t", "event_id"]].sort_values("t",
                                                          kind="mergesort"),
            ivs[["user_id", "t", "end_t", "session_id"]]
            .sort_values("t", kind="mergesort"),
            on="t", by="user_id", direction="backward")
        out = out[out["t"] <= out["end_t"]]
        out = out[["event_id", "user_id", "session_id"]].copy()
        out["session_id"] = out["session_id"].astype("int64")
        return out

    return (tagged.groupby("part")
            .map_groups(per_part, batch_format="pandas"))


def range_join_lookback(ds, anchor_type: str = "purchase",
                        window_minutes: int = 60,
                        num_partitions: int = 64):
    """Aggregating range join over OVERLAPPING lookback windows: every
    anchor row (``event_type == anchor_type``) collects ALL events of
    the same user with ``ts`` in ``[anchor.ts - window, anchor.ts)``
    — the attribution-window query (how much activity preceded each
    purchase).  Output per anchor: ``(event_id, user_id, n_prior,
    sum_prior_value)``; zero-match anchors are KEPT with n=0 (left
    semantics).

    This is the bounded-lookback fan-out :func:`label_sessions`'s
    docstring promises for overlapping intervals.  Scale shape: both
    sides ride ONE coarse hash exchange on ``(user, time-bucket)``
    with bucket width == window length, so an anchor's window spans at
    most TWO buckets; each anchor is replicated to both (bounded 2x
    fan-out, never a broadcast), probe rows land in exactly one.  A
    hot user's traffic spreads across time buckets instead of melting
    a single reducer — the skew defuse the user-keyed asof_join can't
    offer.  Inside each group one argsort + prefix-sum answers every
    anchor via two ``searchsorted`` probes (no per-row Python); the
    per-(anchor, bucket) partials combine in a second, anchor-sized
    exchange keyed on event_id.  Partitioning assumption, per the
    operator contract: window length <= bucket width (bucket is SET to
    the window, so it holds by construction).

    Value sums use the house integer-cents grid (floor(x*100+0.5),
    one division at the end) so the result bit-matches the SQL oracle
    regardless of partial-sum order.
    """
    win_us = int(window_minutes) * 60 * 1_000_000

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        tsu = batch["ts"].astype("datetime64[us]").astype("int64")
        uid = batch["user_id"].astype("int64")
        bucket = tsu // win_us
        probes = pd.DataFrame({
            "event_id": batch["event_id"].astype("int64"),
            "user_id": uid,
            "bucket": bucket,
            "tsu": tsu,
            "cents": np.floor(batch["value"] * 100 + 0.5).astype("int64"),
            "_side": np.ones(len(batch), dtype="int8"),
        })
        anchors = probes[(batch["event_type"] == anchor_type).to_numpy()]
        anchors = anchors.assign(_side=np.int8(0))
        # replicate each anchor to its own bucket AND the previous one:
        # with bucket == window, [ts-win, ts) can touch no others
        prev = anchors.assign(bucket=anchors["bucket"] - 1)
        out = pd.concat([probes, anchors, prev], ignore_index=True)
        # int64 wraparound is fine here — it's a hash input, and mixing
        # bucket in keeps one user's buckets on different reducers
        mixed = out["user_id"] * np.int64(1_000_003) + out["bucket"]
        out["part"] = _coarse_part(mixed, num_partitions)
        return out

    def per_cell(group: pd.DataFrame) -> pd.DataFrame:
        anc = group[group["_side"] == 0]
        if not len(anc):
            return _typed_if_empty(pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "cents": pd.Series([], dtype="int64"),
                "part2": pd.Series([], dtype="int64")}))
        pr = group[group["_side"] == 1]
        # dense cell rank over (user, bucket); offsets within a bucket
        # are < win_us, so key = r*(2*win_us) + offset is collision-free
        # and monotone per cell (anchor hi bound offset+win < 2*win)
        cells = pd.concat([pr[["user_id", "bucket"]],
                           anc[["user_id", "bucket"]]],
                          ignore_index=True).drop_duplicates()
        cells = cells.sort_values(["user_id", "bucket"]).reset_index(drop=True)
        cells["r"] = np.arange(len(cells), dtype="int64")
        M = np.int64(2 * win_us)
        pk = pr.merge(cells, on=["user_id", "bucket"], how="left")
        off = pk["tsu"].to_numpy() - pk["bucket"].to_numpy() * win_us
        keys = pk["r"].to_numpy() * M + off
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        csum = np.concatenate([[0], np.cumsum(
            pk["cents"].to_numpy()[order])])
        ak = anc.merge(cells, on=["user_id", "bucket"], how="left")
        a_off = ak["tsu"].to_numpy() - ak["bucket"].to_numpy() * win_us
        lo = ak["r"].to_numpy() * M + np.maximum(a_off - win_us, 0)
        hi = ak["r"].to_numpy() * M + a_off
        i0 = np.searchsorted(keys, lo, side="left")
        i1 = np.searchsorted(keys, hi, side="left")
        out = pd.DataFrame({
            "event_id": ak["event_id"].to_numpy(),
            "user_id": ak["user_id"].to_numpy(),
            "n": (i1 - i0).astype("int64"),
            "cents": csum[i1] - csum[i0],
        })
        out["part2"] = _coarse_part(out["event_id"], num_partitions)
        return out

    partials = (ds.map_batches(tag, batch_format="pandas")
                .groupby("part").map_groups(per_cell,
                                            batch_format="pandas"))

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("event_id", sort=False).agg(
            user_id=("user_id", "first"),
            n_prior=("n", "sum"), cents=("cents", "sum")).reset_index()
        g["n_prior"] = g["n_prior"].astype("int64")
        g["sum_prior_value"] = g["cents"].astype("int64") / 100.0
        return g[["event_id", "user_id", "n_prior", "sum_prior_value"]]

    return (partials.groupby("part2")
            .map_groups(combine, batch_format="pandas"))


from doc_ocr_ray.util import epoch_days as _epoch_days  # noqa: E402
from doc_ocr_ray.util import typed_if_empty as _typed_if_empty  # noqa: E402


def anti_join_auto(ds, key: str, other_ds, other_key: str,
                   broadcast_limit: int = 5_000_000,
                   bloom_limit: int = 500_000_000):
    """NOT EXISTS with a SIZE-PROBED strategy pick (the
    drop_near_duplicates ``auto`` pattern applied to the anti-join
    ladder): count the filter side — a metadata pass for parquet
    reads — then route to

    - :func:`anti_join_broadcast` when its row count fits the
      driver-distinct + broadcast envelope (``broadcast_limit``),
    - :func:`anti_join_bloom` while a ~16-bits/key bitmap stays
      effective (``bloom_limit``; past the 2^30-bit cap the fp rate
      degrades gracefully but verify broadcasts grow),
    - Ray Data's native ``left_anti`` hash join beyond that (both
      sides partitioned, nothing broadcast).

    The choice is LOGGED; all three produce identical rows (pinned
    by the shared oracle and an equality test)."""
    import logging

    import ray

    n_other = other_ds.count()
    if n_other <= broadcast_limit:
        strategy = "broadcast"
    elif n_other <= bloom_limit:
        strategy = "bloom"
    else:
        strategy = "native_left_anti"
    logging.getLogger(__name__).info(
        "anti_join_auto: filter side %d rows -> %s (cutovers %d / %d)",
        n_other, strategy, broadcast_limit, bloom_limit)
    if strategy == "broadcast":
        return anti_join_broadcast(ds, key, other_ds, other_key)
    if strategy == "bloom":
        return anti_join_bloom(ds, key, other_ds, other_key)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return ds.join(other_ds, join_type="left_anti",
                   num_partitions=max(2, cpus // 2),
                   on=(key,), right_on=(other_key,))


def anti_join_bloom(ds, key: str, other_ds, other_key: str,
                    m_bits=None, k_hashes: int = 4):
    """NOT EXISTS when the other side's key set is too large to
    broadcast: a Bloom filter carries its membership in a bitmap sized
    ~16 bits per key (auto: next power of two of ``16 * other row
    count``, floor 2^20, cap 2^30 = 128 MiB).  Output is EXACT, not
    approximate:

    1. each block of the other side builds a fixed-size bitmap
       (double hashing ``h1 + i*h2``, vectorized bit-set); per-block
       bitmaps tree-reduce by OR (a distributed combine stage first,
       then a handful of rows to the driver — never blocks x m/8
       driver traffic);
    2. rows whose key misses ANY bit are definite non-matches — kept
       immediately, no further work (the overwhelming majority under
       a selective join);
    3. the maybe-set (true matches + Bloom false positives) is
       exactly verified: its DISTINCT keys are broadcast to probe the
       other side, and the confirmed-match keys are broadcast back to
       filter the maybe rows.  Both broadcasts are bounded by the
       maybe-KEY count.

    Envelope, honestly stated: at 16 bits/key the false-positive rate
    is ~4e-4, so maybe ~= true matches; beyond the 2^30 cap (~6.7e7
    keys at 16 bits, degrading gracefully above) the fp rate rises and
    the maybe-set — and with it the verify broadcasts — grows toward
    the match count.  The operator stays exact throughout, but for a
    NON-selective join at extreme scale (most keys matching) the
    verify stage approaches a key-set broadcast again; that regime
    wants the shuffle anti-join instead.

    ``ds`` and ``other_ds`` are each consumed twice (definite/maybe
    split; bitmap build + probe) — hand in re-readable sources
    (parquet-backed), not exhausted iterators.  The maybe-set is
    materialized once (bounded by matches + fp) so it is not a third
    pass over ``ds``.
    """
    import ray

    if m_bits is None:
        n_other = other_ds.count()      # metadata-fast on parquet reads
        m_bits = 1 << max(20, min(30, int(16 * max(1, n_other) - 1)
                                  .bit_length()))
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    mask = np.uint64(m_bits - 1)

    def _hashes(values: np.ndarray):
        h = pd.util.hash_array(values.astype(object))
        h1 = h & mask
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        return h1, h2

    def block_bits(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        h1, h2 = _hashes(batch[other_key].to_numpy())
        for i in range(k_hashes):
            idx = ((h1 + np.uint64(i) * h2) & mask).astype(np.int64)
            np.bitwise_or.at(bits, idx >> 3,
                             (np.uint8(1) << (idx & 7).astype(np.uint8)))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    def or_rows(batch: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        for b in batch["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    bloom = np.zeros(m_bits // 8, dtype=np.uint8)
    partials = (other_ds.map_batches(block_bits, batch_format="pandas")
                .map_batches(or_rows, batch_size=64,
                             batch_format="pandas"))
    for row in partials.take_all():    # ~n_blocks/64 rows reach here
        bloom |= np.frombuffer(row["bits"], dtype=np.uint8)
    ref = ray.put(bloom.tobytes())

    def maybe_mask(batch: pd.DataFrame) -> np.ndarray:
        bits = np.frombuffer(ray.get(ref), dtype=np.uint8)
        h1, h2 = _hashes(batch[key].to_numpy())
        maybe = np.ones(len(batch), dtype=bool)
        for i in range(k_hashes):
            idx = ((h1 + np.uint64(i) * h2) & mask).astype(np.int64)
            maybe &= (bits[idx >> 3] & (np.uint8(1)
                                        << (idx & 7).astype(np.uint8))) != 0
        return maybe

    kept = ds.map_batches(lambda b: _typed_if_empty(b[~maybe_mask(b)]),
                          batch_format="pandas")
    # materialized once: bounded by matches + false positives, and the
    # later unique() + union would otherwise re-execute the full scan
    candidates = ds.map_batches(lambda b: _typed_if_empty(b[maybe_mask(b)]),
                                batch_format="pandas").materialize()

    # exact verify: distinct maybe-keys -> probe other side -> confirmed
    # match keys back as a broadcast filter
    maybe_keys = set(candidates.unique(key))
    if not maybe_keys:                 # no candidates: kept is exact
        return kept
    mk_ref = ray.put(maybe_keys)

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        mk = ray.get(mk_ref)
        hit = batch[batch[other_key].isin(mk)]
        return pd.DataFrame({"k": hit[other_key].unique()})

    matched = set(other_ds.map_batches(probe,
                                       batch_format="pandas").unique("k"))
    m_ref = ray.put(matched)

    def keep_unmatched(batch: pd.DataFrame) -> pd.DataFrame:
        return _typed_if_empty(batch[~batch[key].isin(ray.get(m_ref))])

    return kept.union(candidates.map_batches(keep_unmatched,
                                             batch_format="pandas"))


def funnel_counts(ds, steps, ts_col: str = "ts",
                  user_col: str = "user_id",
                  type_col: str = "event_type", num_parts: int = 64):
    """Ordered funnel analysis — "how many users did A, then B, then
    C": for each prefix of ``steps``, the number of users with a
    STRICTLY time-increasing completion chain, where step k's
    completion time is the user's earliest step-k event after their
    step-(k-1) completion (the standard earliest-chain funnel, and
    greedy-earliest is optimal here: any valid chain implies the
    earliest chain is valid).  Output: one row per step — (step,
    event_type, users).

    Shape: a stateless slim-and-filter map (only funnel-relevant
    events, three columns, survive the read), ONE coarse user-keyed
    exchange, per-partition vectorized frontier propagation (merge +
    groupby-min per step — no per-user Python), and a final
    step-keyed combine of #partitions x #steps partial rows."""
    from doc_ocr_ray.util import coarse_part, typed_if_empty

    steps = list(steps)

    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.loc[batch[type_col].isin(steps),
                      [user_col, type_col, ts_col]].copy()
        b["part"] = coarse_part(b[user_col], num_parts)
        return typed_if_empty(b)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(len(steps), dtype=np.int64)
        frontier = None
        for k, s in enumerate(steps):
            ev = group.loc[group[type_col] == s, [user_col, ts_col]]
            if frontier is not None:
                ev = ev.merge(frontier, on=user_col)
                ev = ev[ev[ts_col] > ev["ft"]]
            fr = (ev.groupby(user_col, sort=False)[ts_col].min()
                  .rename("ft").reset_index())
            frontier = fr[[user_col, "ft"]]
            counts[k] = len(frontier)
        return pd.DataFrame({
            "step": np.arange(1, len(steps) + 1, dtype=np.int64),
            "event_type": pd.Series(steps, dtype="object"),
            "users": counts})

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        out = (group.groupby(["step", "event_type"], sort=False)
               ["users"].sum().reset_index())
        out["users"] = out["users"].astype("int64")
        return typed_if_empty(out[["step", "event_type", "users"]])

    return (ds.map_batches(slim, batch_format="pandas")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas")
            .groupby("step").map_groups(combine, batch_format="pandas"))


def _events_type_day_leaf(ds) -> pd.DataFrame:
    """(event_type, day) leaf aggregates — the shared base of
    :func:`events_rollup` and :func:`events_cube`: one distributed
    partial-aggregate pass collapses the corpus to (type x day) leaf
    partials (cardinality-bounded, NOT corpus-bounded), one tiny
    groupby combines them.  Higher grouping levels derive FROM the
    combined leaf at the driver — rows touched after the one exchange
    = |types| x |days|.  Cents discipline as everywhere
    (see events_by_type).  Genuine NULL keys become their own
    ``(null)`` group (pandas groupby drops NaN keys silently, and the
    rollup/cube 'ALL' sentinel must never conflate with a real NULL —
    the corpus_report discipline)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "event_type": batch["event_type"].fillna("(null)"),
            "day": (batch["ts"].dt.strftime("%Y-%m-%d")
                    .fillna("(null)")),
            "cents": np.floor(batch["value"] * 100
                              + 0.5).astype("int64")})
        out = (g.groupby(["event_type", "day"], sort=False)["cents"]
               .agg(["count", "sum"]).reset_index())
        out.columns = ["event_type", "day", "n", "sum_cents"]
        return _typed_if_empty(out)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        out = (group.groupby(["event_type", "day"], sort=False)
               .agg(n=("n", "sum"), sum_cents=("sum_cents", "sum"))
               .reset_index())
        out["n"] = out["n"].astype("int64")
        out["sum_cents"] = out["sum_cents"].astype("int64")
        return _typed_if_empty(out)

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(["event_type", "day"])
            .map_groups(combine, batch_format="pandas")
            .to_pandas())


def _levels_from_leaf(leaf: pd.DataFrame, with_by_day: bool):
    """Derive the higher grouping levels from the combined (type, day)
    leaf — shared tail of :func:`events_rollup` (by-type + grand) and
    :func:`events_cube` (adds the by-day level): 'ALL' sentinels in
    the aggregated-away keys, cents to value with ONE division, and
    the SQL empty-input mirror (ROLLUP/CUBE on an empty input still
    emit the grand row, with sum() NULL, not 0)."""
    import pyarrow as pa

    by_type = (leaf.groupby("event_type", as_index=False)
               .agg(n=("n", "sum"), sum_cents=("sum_cents", "sum")))
    by_type["day"] = "ALL"
    levels = [leaf, by_type]
    if with_by_day:
        by_day = (leaf.groupby("day", as_index=False)
                  .agg(n=("n", "sum"), sum_cents=("sum_cents", "sum")))
        by_day["event_type"] = "ALL"
        levels.append(by_day)
    levels.append(pd.DataFrame({
        "event_type": ["ALL"], "day": ["ALL"],
        "n": [int(leaf["n"].sum())],
        "sum_cents": [int(leaf["sum_cents"].sum())]}))
    allr = pd.concat(levels, ignore_index=True)
    allr["sum_value"] = allr["sum_cents"].astype("int64") / 100.0
    if leaf.empty:
        allr["sum_value"] = np.nan
    allr["n"] = allr["n"].astype("int64")
    out = allr[["event_type", "day", "n", "sum_value"]]
    return pa.Table.from_pandas(out, preserve_index=False)


def events_rollup(ds):
    """GROUP BY ROLLUP parity: (event_type, day) leaf aggregates plus
    per-type subtotals plus the grand total, with the literal ``ALL``
    standing in for the rollup NULL (a real NULL key becomes its own
    ``(null)`` group BEFORE the rollup on both sides, so the sentinel
    never conflates with it).  Output: ``(event_type, day, n,
    sum_value)``.  Leaf shape: :func:`_events_type_day_leaf`."""
    return _levels_from_leaf(_events_type_day_leaf(ds),
                             with_by_day=False)


def pivot_counts(ds, key: str = "user_id", pivot_col: str = "event_type",
                 values: tuple = ("click", "error", "purchase",
                                  "signup", "view"),
                 num_partitions: int = 128):
    """Long-to-wide pivot: one row per ``key`` with a count column per
    named ``pivot_col`` value — the per-user feature table a
    personalization model trains on.  ``values`` is EXPLICIT (the
    caller names the output schema — a pivot whose columns depend on
    the data is not a stable contract); everything else, including
    NULL, lands in ``n_other``.  Output: ``(key, n_<v>..., n_other)``.

    Shape: per-batch (key, value) count partials are the combiner (the
    exchange carries the distinct pair set, never event rows), ONE
    coarse key exchange, in-group vectorized unstack."""
    val_list = list(values)
    cols = [f"n_{v}" for v in val_list] + ["n_other"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[pivot_col].where(batch[pivot_col].isin(val_list),
                                   "\x00other")
        g = (pd.DataFrame({key: batch[key], "v": v})
             .groupby([key, "v"], sort=False).size()
             .reset_index(name="n"))
        g["n"] = g["n"].astype("int64")
        g["part"] = _coarse_part(g[key], num_partitions)
        return _typed_if_empty(g)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        wide = (group.groupby([key, "v"], sort=False)["n"].sum()
                .unstack("v", fill_value=0))
        out = pd.DataFrame({key: wide.index.to_numpy()})
        for v, c in zip(val_list + ["\x00other"], cols):
            out[c] = (wide[v].astype("int64").to_numpy()
                      if v in wide.columns
                      else np.zeros(len(wide), dtype="int64"))
        return out

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas"))


def common_paths(ds, depth: int = 3, k: int = 20,
                 num_partitions: int = 128):
    """Top-k most common user journey prefixes: each user's first
    ``depth`` event types in (ts, event_id) order joined as
    ``a>b>c``, counted across users — the unordered-discovery
    complement of :func:`funnel_counts` (that one checks a GIVEN
    sequence; this one finds which sequences actually happen).
    Users with fewer than ``depth`` events contribute their full
    shorter path.  NULL-ts or NULL-type events are dropped (no
    order / no signal).  Output: ``(path, n_users)``, ties broken by
    path ascending.

    Shape: slim (user, ts, event_id, type) rows ride ONE coarse
    user-keyed exchange; each group sorts and takes per-user heads
    vectorized (groupby cumcount mask, no per-user loop), collapses
    to (path, partial count); a tiny path-keyed combine + driver
    top-k finish (path cardinality is bounded by |types|^depth, not
    by users)."""
    import pyarrow as pa

    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.dropna(subset=["ts", "event_type", "user_id"])
        out = pd.DataFrame({
            "user_id": g["user_id"], "ts": g["ts"],
            "event_id": g["event_id"], "event_type": g["event_type"]})
        out["part"] = _coarse_part(out["user_id"], num_partitions)
        return _typed_if_empty(out)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"])
        head = g[g.groupby("user_id", sort=False).cumcount() < depth]
        paths = (head.groupby("user_id", sort=False)["event_type"]
                 .agg(">".join))
        out = (paths.value_counts().rename_axis("path")
               .reset_index(name="n_users"))
        out["n_users"] = out["n_users"].astype("int64")
        return _typed_if_empty(out)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "path": [group["path"].iloc[0]],
            "n_users": [int(group["n_users"].sum())]})

    agg = (ds.map_batches(slim, batch_format="pandas")
           .groupby("part").map_groups(per_part, batch_format="pandas")
           .groupby("path").map_groups(combine, batch_format="pandas")
           .to_pandas())
    top = (agg.sort_values(["n_users", "path"],
                           ascending=[False, True])
           .head(k).reset_index(drop=True))
    return pa.Table.from_pandas(top, preserve_index=False)


def mode_event_type_per_user(ds, num_partitions: int = 128):
    """(user_id, top_type, n): each user's most frequent event type —
    grouped MODE with a deterministic tie-break (higher count wins,
    ties to the lexicographically smallest type), the per-key
    categorical summary a personalization/feature pipeline derives
    from an event log.  NULL event types carry no signal and are
    excluded (documented; the oracle filters them identically).

    Shape: per-batch (user, type) count partials are the combiner —
    the exchange carries the distinct pair set, never event rows —
    then ONE coarse user-keyed exchange resolves the argmax in-group
    with a vectorized sort + drop_duplicates (no per-user loop)."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[batch["event_type"].notna()]
        out = (g.groupby(["user_id", "event_type"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        out["part"] = _coarse_part(out["user_id"], num_partitions)
        return _typed_if_empty(out)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        c = (group.groupby(["user_id", "event_type"], sort=False)["n"]
             .sum().reset_index())
        c = c.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True])
        top = c.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": top["user_id"].astype("int64"),
            "top_type": top["event_type"],
            "n": top["n"].astype("int64")})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas"))


def events_cube(ds):
    """GROUP BY CUBE parity: every grouping level over (event_type,
    day) — the leaf, per-type subtotals, per-DAY subtotals (the level
    ROLLUP lacks), and the grand total, with the ``ALL`` sentinel in
    whichever key is aggregated away (same footgun rationale as
    :func:`events_rollup`).  Output: ``(event_type, day, n,
    sum_value)``.

    Same scale shape as the rollup: ONE distributed exchange builds
    the (type x day) leaf (:func:`_events_type_day_leaf`); all four
    cube levels derive from it at the driver
    (:func:`_levels_from_leaf`), touching |types| x |days| rows — a
    second corpus pass per level (what CUBE naively costs) is never
    needed because every level is a re-aggregation of the leaf."""
    return _levels_from_leaf(_events_type_day_leaf(ds),
                             with_by_day=True)


def distinct_users_by_type(ds, num_parts: int = 64):
    """Exact COUNT(DISTINCT user_id) per event_type.  The combiner
    emits per-batch DISTINCT (type, user) pairs — the exchange carries
    the distinct-pair set, never event rows — keyed so a given pair
    always lands in one group (dedupe there is exact), then per-part
    per-type counts sum in one tiny final groupby.  The distributed
    exact-distinct shape that KMV (distinct_tokens_kmv) approximates
    when even the pair set is too large."""
    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        # dropna: COUNT(DISTINCT user_id) excludes NULLs — a NaN
        # user would otherwise count as a distinct "user"
        out = (batch[["event_type", "user_id"]]
               .dropna(subset=["user_id"]).drop_duplicates())
        out["part"] = _coarse_part(
            out["event_type"] + ":" + out["user_id"].astype(str),
            num_parts)
        return _typed_if_empty(out.reset_index(drop=True))

    def count_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["event_type", "user_id"])
        out = (g.groupby("event_type", sort=False).size()
               .rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype("int64")
        return _typed_if_empty(out)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [group["event_type"].iloc[0]],
            "n_users": [int(group["n_users"].sum())]})

    return (ds.map_batches(pairs, batch_format="pandas")
            .groupby("part").map_groups(count_part,
                                        batch_format="pandas")
            .groupby("event_type").map_groups(final,
                                              batch_format="pandas"))


def retention_cohorts(ds, num_parts: int = 64):
    """Classic cohort retention: users grouped by first-activity day,
    counting DISTINCT users from each cohort active again ``offset``
    days later.  Output: ``(cohort_day, day_offset, n_users)`` with
    days as integer epoch days (floor division — tz-proof and exact
    across engines even pre-1970).

    Shape: the per-batch combiner slims events to distinct
    (user, day) pairs; ONE user-keyed coarse exchange co-locates each
    user's days, so cohort day (min) and offsets resolve in-group and
    each user contributes AT MOST ONE row per (cohort, offset) — the
    per-part counts are therefore exact partials and the final
    (cohort, offset) combine just sums disjoint users.  Nothing
    user-table-sized touches the driver.
    """
    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        # NaT would floor-divide its int64 sentinel into a garbage
        # epoch day; NULL-ts events carry no activity signal — drop
        # them (the oracle's epoch(NULL) likewise yields no day)
        batch = batch.dropna(subset=["ts", "user_id"])
        days = _epoch_days(batch["ts"])
        out = pd.DataFrame({"user_id": batch["user_id"],
                            "day": days.astype("int64")})
        out = out.drop_duplicates()
        out["part"] = _coarse_part(out["user_id"], num_parts)
        return _typed_if_empty(out.reset_index(drop=True))

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["user_id", "day"])
        first = g.groupby("user_id", sort=False)["day"].transform("min")
        out = (pd.DataFrame({
                   "cohort_day": first.astype("int64"),
                   "day_offset": (g["day"] - first).astype("int64")})
               .groupby(["cohort_day", "day_offset"], sort=False)
               .size().rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype("int64")
        return _typed_if_empty(out)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cohort_day": [int(group["cohort_day"].iloc[0])],
            "day_offset": [int(group["day_offset"].iloc[0])],
            "n_users": [int(group["n_users"].sum())]})

    return (ds.map_batches(pairs, batch_format="pandas")
            .groupby("part").map_groups(per_user,
                                        batch_format="pandas")
            .groupby(["cohort_day", "day_offset"])
            .map_groups(final, batch_format="pandas"))


def watermark_late_events(ds, lateness_us: int,
                          arrival_col: str = "event_id",
                          ts_col: str = "event_us",
                          carry_cols: tuple = (),
                          num_partitions: int = 64):
    """Flink-style watermark / late-data classification over an
    arrival-ordered stream: at each event, the watermark is the
    maximum event time seen at any STRICTLY EARLIER arrival position,
    and the event is late when its own event time trails that
    watermark by more than ``lateness_us``.  This is the missing
    policy half of the window operators above (tumbling / hopping /
    session assign perfect in-order delivery; real streams do not).

    Input: integer ``arrival_col`` (globally unique arrival sequence)
    and integer ``ts_col`` (event-time micros).  Output adds
    ``watermark_us`` (0 for the stream's first arrival — epoch zero
    predates any event) and ``late`` (0/1).

    Shape (the ``pack_sequences`` prefix discipline): an ordered
    prefix MAX without a global sort — range-partition on the arrival
    key (one min/max aggregate fixes the bins), take each partition's
    event-time max, prefix-combine the ~``num_partitions`` maxima on
    the driver (BOUNDED driver state: one int per partition), then a
    vectorized shifted cummax inside each partition.  The DuckDB twin
    is ``MAX(event_us) OVER (ORDER BY arrival ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``.
    """
    from doc_ocr_ray.util import typed_if_empty

    proj = ds.select_columns(
        [arrival_col, ts_col, *carry_cols]).materialize()
    if proj.count() == 0:
        # return the FULL output schema, not the bare projection —
        # downstream consumers index the watermark_us/late columns
        import pyarrow as pa
        import ray.data
        sch = proj.schema()
        carry_types = dict(zip(sch.names, sch.types))

        def as_arrow(t):      # ray Schema types may be numpy dtypes
            if isinstance(t, pa.DataType):
                return t
            try:
                return pa.from_numpy_dtype(np.dtype(t))
            except (TypeError, pa.ArrowNotImplementedError):
                return pa.string()      # object dtype = textual

        fields = [(arrival_col, pa.int64()), (ts_col, pa.int64()),
                  ("watermark_us", pa.int64()), ("late", pa.int64())]
        fields += [(c, as_arrow(carry_types[c])) for c in carry_cols]
        # via a pandas block: a zero-block arrow dataset's to_pandas
        # drops the column list entirely (Ray quirk)
        return ray.data.from_pandas(
            pa.schema(fields).empty_table().to_pandas())
    lo = proj.min(arrival_col)
    hi = proj.max(arrival_col)
    span = hi - lo + 1

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(part=(
            (batch[arrival_col].astype("int64") - lo)
            * num_partitions // span).astype("int64"))

    parted = proj.map_batches(add_part,
                              batch_format="pandas").materialize()
    maxes = {int(r["part"]): int(r[f"max({ts_col})"])
             for r in parted.groupby("part").max(ts_col).take_all()}
    prefix, running = {}, 0          # 0 = epoch floor for first rows
    for p in sorted(maxes):
        prefix[p] = running
        running = max(running, maxes[p])

    def late_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(arrival_col, kind="mergesort")
        ts = g[ts_col].astype("int64")
        base = prefix[int(g["part"].iloc[0])]
        prior = ts.cummax().shift(1, fill_value=0)
        wm = np.maximum(prior.to_numpy(), base)
        out = pd.DataFrame({
            arrival_col: g[arrival_col].astype("int64").to_numpy(),
            ts_col: ts.to_numpy(),
            "watermark_us": wm,
            "late": (ts.to_numpy() < wm - lateness_us)
                    .astype("int64"),
            **{c: g[c].to_numpy() for c in carry_cols}})
        return typed_if_empty(out)

    return (parted.groupby("part")
            .map_groups(late_part, batch_format="pandas"))


def resample_locf(ds, start: str, end: str, freq_minutes: int,
                  num_parts: int = 128):
    """Per-key regular time-grid resampling with
    last-observation-carried-forward (LOCF) — the gap-filling step
    that turns an irregular event stream into the fixed-cadence
    feature series a training pipeline joins on: for every user and
    every grid instant t in [start, end] (inclusive, stepping
    ``freq_minutes``), the value of the user's LATEST event at or
    before t, as integer cents (the shared float grid).  Grid rows
    before a user's first event are dropped (LOCF is undefined
    there); equal-timestamp ties go to the larger event_id, a total
    order both engines state.

    Shape: ONE coarse user-keyed exchange (events only — the grid is
    arithmetic, never materialized corpus-wide); per user a single
    ``np.searchsorted(side='right')`` maps every grid instant to its
    predecessor event, vectorized.  Output size = users x grid
    points, the irreducible resample cost.  Output: (user_id,
    grid_ts, cents).
    """
    grid = pd.date_range(start, end, freq=f"{freq_minutes}min")
    if not len(grid):
        raise ValueError("empty grid: check start/end/freq")
    grid_np = grid.to_numpy()

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": batch["user_id"].astype("int64"),
            "ts": batch["ts"],
            "event_id": batch["event_id"].astype("int64"),
            "cents": np.floor(batch["value"] * 100 + 0.5)
                       .astype("int64")})
        out["part"] = _coarse_part(out["user_id"], num_parts)
        return _typed_if_empty(out)

    _empty = pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "grid_ts": pd.Series([], dtype="datetime64[ns]"),
        "cents": pd.Series([], dtype="int64")})

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in group.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "event_id"])
            ts = g["ts"].to_numpy()
            idx = np.searchsorted(ts, grid_np, side="right") - 1
            keep = idx >= 0
            if not keep.any():
                continue
            out.append(pd.DataFrame({
                "user_id": np.full(int(keep.sum()), uid,
                                   dtype=np.int64),
                "grid_ts": grid_np[keep],
                "cents": g["cents"].to_numpy()[idx[keep]]}))
        if not out:
            return _typed_if_empty(_empty)
        return pd.concat(out, ignore_index=True)

    return (ds.map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas"))


def scd2_intervals(ds, num_parts: int = 128):
    """Slowly-changing-dimension (type 2) table build from an event
    changelog — the standard warehouse shape for "what was this
    user's value AT time t": each event sets the user's current
    value; the output is one validity interval per state, ``(user_id,
    cents, valid_from, valid_to)``, where ``valid_to`` is the next
    event's timestamp and NULL on the open (current) interval.
    Downstream temporal joins become a plain range predicate instead
    of a correlated latest-row lookup (the `resample_locf` shape).

    Consecutive events with the SAME value still open a new interval
    (every change event is a version — the reference warehouse
    semantics; collapsing equal neighbours is a separate compaction).
    Equal-timestamp ties order by event_id, the same stated total
    order as the LOCF twin.

    Shape: ONE coarse user-keyed exchange, then per user a vectorized
    sort + shift(-1) — no window function materializes more than the
    user's own rows.  Output rows == input rows (each event opens
    exactly one interval).
    """
    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": batch["user_id"].astype("int64"),
            "ts": batch["ts"],
            "event_id": batch["event_id"].astype("int64"),
            "cents": np.floor(batch["value"] * 100 + 0.5)
                       .astype("int64")})
        out["part"] = _coarse_part(out["user_id"], num_parts)
        return _typed_if_empty(out)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"],
                              ignore_index=True)
        nxt_ts = g["ts"].shift(-1)
        # user-boundary mask in pure int64 (shift(-1) upcasts int64 to
        # float64, where ids past 2^53 can alias across the boundary)
        uid = g["user_id"].to_numpy(dtype="int64")
        same_user = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            same_user[:-1] = uid[1:] == uid[:-1]
        # last row of each user opens the current (NULL-ended) interval
        valid_to = nxt_ts.where(same_user)
        return _typed_if_empty(pd.DataFrame({
            "user_id": g["user_id"],
            "event_id": g["event_id"],
            "cents": g["cents"],
            "valid_from": g["ts"],
            "valid_to": valid_to}))

    return (ds.map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas"))


def decayed_score_per_user(ds, horizon: str = "2024-02-01",
                           half_life_days: int = 1,
                           max_age_days: int = 20,
                           num_parts: int = 128):
    """Per-user exponentially time-decayed engagement score — the
    recency-weighted feature a ranking/freshness pipeline keeps per
    entity: ``score = sum(cents * 2^(max_age - age))`` where ``age``
    is whole half-lives (days by default) between the event and the
    horizon, so an event one half-life older counts half as much.
    The weights are kept as EXACT int64 powers of two (a left shift),
    the sum is exact integer arithmetic — no float accumulation
    order to match — and events older than ``max_age_days`` (or
    after the horizon) carry zero weight, so a user whose events all
    fall outside the window still reports an (exact) score of 0.

    Shape: pure map + tiny per-user aggregate — per-batch partial
    sums (in-batch combiner) then ONE coarse-keyed groupby of
    user-count-bounded partials, users regrouped INSIDE the group fn
    (1500 users must not become 1500 map_groups calls).  No per-user
    exchange of raw events.

    Envelope: cents < 2^17, weight <= 2^max_age (2^20 default), so
    one term < 2^37; int64 holds ~2^26 such terms per user — callers
    with hotter users or longer horizons raise ``half_life_days``
    (fewer distinct ages) or shrink ``max_age_days``; numpy wraps
    silently on overflow where DuckDB BIGINT errors, so the envelope
    is the bit-parity contract, not just a precision nicety.  Output:
    (user_id, score) with score the exact integer.
    """
    horizon_ts = pd.Timestamp(horizon)
    day_us = 86_400_000_000 * half_life_days

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(batch["value"] * 100 + 0.5).astype("int64")
        age = ((horizon_ts - batch["ts"]).to_numpy()
               .astype("timedelta64[us]").astype("int64") // day_us)
        keep = (age >= 0) & (age <= max_age_days)
        w = np.zeros(len(batch), dtype="int64")
        w[keep] = np.int64(1) << (max_age_days - age[keep])
        g = pd.DataFrame({"user_id": batch["user_id"].astype("int64"),
                          "term": cents * w})
        out = (g.groupby("user_id", sort=False)["term"].sum()
               .reset_index(name="score"))
        out["part"] = _coarse_part(out["user_id"], num_parts)
        return _typed_if_empty(out)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        out = (group.groupby("user_id", sort=False)["score"].sum()
               .reset_index(name="score"))
        out["score"] = out["score"].astype("int64")
        return _typed_if_empty(out)

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("part").map_groups(combine,
                                        batch_format="pandas")
            .select_columns(["user_id", "score"]))


def week_over_week(ds):
    """Period-over-period growth per event type — the trend table a
    monitoring/curation dashboard keeps: events bucket onto a fixed
    epoch-week grid (``floor(epoch_us / 604800e6)``, the 1970-01-01
    anchor, so the grid is engine-independent), and each observed
    (event_type, week) row carries its count, the PREVIOUS OBSERVED
    week's count (SQL ``lag()`` semantics: across a gap the last
    observed week is the reference, 0 when none), and the integer
    delta.

    Shape: per-batch (type, week) partial counts -> ONE tiny groupby
    -> per-type vectorized sort + shift.  The aggregate is
    types x weeks rows — sketch-sized no matter the corpus.  NULL
    event types carry no trend and drop.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch.dropna(subset=["event_type"])
        week = (t["ts"].to_numpy().astype("datetime64[us]")
                .astype("int64") // np.int64(604_800_000_000))
        g = pd.DataFrame({"event_type": t["event_type"], "week": week})
        out = (g.groupby(["event_type", "week"], sort=False)
               .size().reset_index(name="n"))
        return _typed_if_empty(out)

    def per_type(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("week", sort=True)["n"].sum()
             .reset_index())
        g["n"] = g["n"].astype("int64")
        g["prev_n"] = g["n"].shift(1, fill_value=0).astype("int64")
        g["delta"] = (g["n"] - g["prev_n"]).astype("int64")
        g.insert(0, "event_type", group["event_type"].iloc[0])
        return g

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type").map_groups(per_type,
                                              batch_format="pandas"))


def count_anomalies(ds, trail_hours: int = 4, factor: int = 2):
    """Burst detection over the event stream — the volume-anomaly
    monitor a pipeline runs per event type: hourly counts on the
    epoch-hour grid, each hour compared against the SUM of the
    ``trail_hours`` previous OBSERVED hours (SQL ``ROWS BETWEEN w
    PRECEDING AND 1 PRECEDING`` frame semantics), flagged when

        n * trail_hours > factor * trail_sum

    — the cross-multiplied integer comparison (no mean, no division,
    no rounding grid).  Hours without a FULL trailing window are
    never flagged (count of frame rows == trail_hours required), so
    a stream's first hours can't false-positive.  NULL types drop.

    Shape: per-batch (type, hour) partial counts -> ONE tiny groupby
    (types x hours rows) -> per-type vectorized cumsum/shift.
    Output: ``(event_type, hour, n, trail_sum, is_anomaly)`` with
    ``hour`` the epoch-hour integer.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # NaT would silently cast to int64-min and fabricate an
        # ancient hour bucket — NULL ts carries no signal, drop it
        t = batch.dropna(subset=["event_type", "ts"])
        hour = (t["ts"].to_numpy().astype("datetime64[us]")
                .astype("int64") // np.int64(3_600_000_000))
        g = pd.DataFrame({"event_type": t["event_type"], "hour": hour})
        out = (g.groupby(["event_type", "hour"], sort=False)
               .size().reset_index(name="n"))
        return _typed_if_empty(out)

    def per_type(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("hour", sort=True)["n"].sum()
             .reset_index())
        g["n"] = g["n"].astype("int64")
        c = g["n"].cumsum()
        # sum of the previous trail_hours OBSERVED rows (ROWS frame)
        trail = (c.shift(1, fill_value=0)
                 - c.shift(trail_hours + 1, fill_value=0)).astype("int64")
        full = np.arange(len(g)) >= trail_hours
        g["trail_sum"] = trail      # partial sums on early rows, the
        g["is_anomaly"] = full & (   # SQL ROWS-frame value; flag only
            g["n"] * trail_hours     # full windows
            > factor * g["trail_sum"])
        g.insert(0, "event_type", group["event_type"].iloc[0])
        return g

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type").map_groups(per_type,
                                              batch_format="pandas"))


def rolling_dau(ds, window_days: int = 7, num_parts: int = 64):
    """Trailing-window distinct users per observed day — the rolling
    WAU/DAU metric, computed EXACTLY without any sliding-window
    distinct state: the distinct (user, day) pair set fans each pair
    out to the ≤``window_days`` observed days it can contribute to
    (bounded replication — the window is a constant, never data-
    sized), then the standard distinct-pair discipline counts per
    target day.  Only days that actually appear in the stream emit a
    row (the SQL twin joins the observed-days list).

    Shape: per-batch distinct (user, day) combiner -> bounded fan-out
    -> ONE coarse (target-day)-keyed exchange with in-group exact
    dedup -> tiny per-day count.  NULL user/ts drop.
    Output: ``(day, n_users)`` with ``day`` the epoch-day integer.
    """
    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch.dropna(subset=["user_id", "ts"])
        g = (pd.DataFrame({"user_id": t["user_id"].astype("int64"),
                           "day": _epoch_days(t["ts"])})
             .drop_duplicates())
        return _typed_if_empty(g)

    # ONE corpus scan: the distinct-pair stage materializes once and
    # feeds BOTH the observed-day list (tiny: one per calendar day,
    # derived from the same non-null user+ts rows as the oracle's
    # CTE) and the fan-out
    pairs_ds = ds.map_batches(pairs, batch_format="pandas"
                              ).materialize()
    days = pairs_ds.select_columns(["day"]).to_pandas()
    observed = np.sort(days["day"].unique()) if len(days) else \
        np.array([], dtype="int64")

    def fan_out(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return _typed_if_empty(pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "target": pd.Series([], dtype="int64"),
                "part": pd.Series([], dtype="int64")}))
        reps = []
        for off in range(window_days):
            t = batch["day"].to_numpy() + off
            keep = np.isin(t, observed)
            reps.append(pd.DataFrame({
                "user_id": batch["user_id"].to_numpy()[keep],
                "target": t[keep]}))
        out = pd.concat(reps, ignore_index=True).drop_duplicates()
        out["part"] = _coarse_part(out["target"], num_parts)
        return _typed_if_empty(out)

    def count_per_day(group: pd.DataFrame) -> pd.DataFrame:
        d = group.drop_duplicates(["user_id", "target"])
        out = (d.groupby("target", sort=False).size()
               .reset_index(name="n_users"))
        out.columns = ["day", "n_users"]
        out["n_users"] = out["n_users"].astype("int64")
        return _typed_if_empty(out)

    return (pairs_ds
            .map_batches(fan_out, batch_format="pandas")
            .groupby("part").map_groups(count_per_day,
                                        batch_format="pandas"))


def type_share_by_day(ds):
    """Ratio-to-parent: each (day, event_type) count with its share
    of the day's total in basis points on the shared floor grid
    (``floor(10000 * n / day_total)`` — the engine-identical ratio
    rule).  Per-batch (day, type) partials -> ONE tiny groupby -> the
    day totals derive from the SAME leaf (no second corpus pass).
    Output: ``(day, event_type, n, share_bp)``.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch.dropna(subset=["event_type", "ts"])
        g = pd.DataFrame({"day": _epoch_days(t["ts"]),
                          "event_type": t["event_type"]})
        out = (g.groupby(["day", "event_type"], sort=False)
               .size().reset_index(name="n"))
        return _typed_if_empty(out)

    def per_day(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("event_type", sort=False)["n"].sum()
             .reset_index())
        g["n"] = g["n"].astype("int64")
        total = int(g["n"].sum())
        g["share_bp"] = (10000 * g["n"] // total).astype("int64")
        g.insert(0, "day", group["day"].iloc[0])
        return g

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("day").map_groups(per_day,
                                       batch_format="pandas"))


def followed_by(ds, first_type: str, then_type: str,
                within_minutes: int = 60, num_parts: int = 128):
    """Time-bound sequential pattern: users with an occurrence of
    ``then_type`` STRICTLY AFTER an occurrence of ``first_type`` and
    within ``within_minutes`` of it — the A-then-B-within-T conversion
    question (funnel_counts answers unbounded chains; the bound is
    what makes this attribution-grade).  Earliest-match semantics:
    the pair reported per user is the earliest B that any A reaches,
    with the latest qualifying A before it (deterministic).

    Shape: slim-and-filter map (only A/B rows of the two types ride),
    ONE coarse user-keyed exchange, per-user vectorized searchsorted
    of B times into A times.  Output: ``(user_id, a_ts, b_ts)``.
    """
    win_us = np.int64(within_minutes) * 60_000_000

    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch.dropna(subset=["event_type", "ts", "user_id"])
        t = t[t["event_type"].isin([first_type, then_type])]
        out = pd.DataFrame({
            "user_id": t["user_id"].astype("int64"),
            "is_a": (t["event_type"] == first_type).to_numpy(),
            "us": (t["ts"].to_numpy().astype("datetime64[us]")
                   .astype("int64"))})
        out["part"] = _coarse_part(out["user_id"], num_parts)
        return _typed_if_empty(out)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in group.groupby("user_id", sort=False):
            a = np.sort(g.loc[g["is_a"], "us"].to_numpy())
            b = np.sort(g.loc[~g["is_a"], "us"].to_numpy())
            if not len(a) or not len(b):
                continue
            # for each B, the latest A strictly before it
            idx = np.searchsorted(a, b, side="left") - 1
            valid = idx >= 0
            gap_ok = valid.copy()
            gap_ok[valid] = (b[valid] - a[idx[valid]]) <= win_us
            if gap_ok.any():
                j = int(np.argmax(gap_ok))    # earliest qualifying B
                rows.append((int(uid), int(a[idx[j]]), int(b[j])))
        if not rows:
            return _typed_if_empty(pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "a_us": pd.Series([], dtype="int64"),
                "b_us": pd.Series([], dtype="int64")}))
        return pd.DataFrame(rows, columns=["user_id", "a_us", "b_us"])

    return (ds.map_batches(slim, batch_format="pandas")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas"))


def session_stats(ds, gap_minutes: int = 30):
    """Per-user session summary — the composition a product-analytics
    pipeline derives from :func:`sessionize` (sessions are the unit,
    users the report key): ``(user_id, n_sessions, total_events,
    max_session_events, total_duration_us)`` with durations exact
    integer microseconds (sum of per-session end - start).

    Shape: sessionize's one user-keyed exchange does the heavy work;
    the summary collapses session rows (already user-cardinality-
    bounded) with an in-batch partial + ONE tiny user groupby.
    """
    sess = sessionize(ds, gap_minutes=gap_minutes)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        dur = (batch["end_ts"].to_numpy().astype("datetime64[us]")
               .astype("int64")
               - batch["start_ts"].to_numpy().astype("datetime64[us]")
               .astype("int64"))
        g = (pd.DataFrame({
                "user_id": batch["user_id"].astype("int64"),
                "n_sessions": np.int64(1),
                "total_events": batch["n_events"].astype("int64"),
                "max_session_events": batch["n_events"].astype("int64"),
                "dur": dur})
             .groupby("user_id", sort=False)
             .agg(n_sessions=("n_sessions", "sum"),
                  total_events=("total_events", "sum"),
                  max_session_events=("max_session_events", "max"),
                  total_duration_us=("dur", "sum"))
             .reset_index())
        for c in g.columns[1:]:
            g[c] = g[c].astype("int64")
        g["part"] = _coarse_part(g["user_id"], 64)
        return _typed_if_empty(g)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        # coarse key: users regroup INSIDE the group fn (one Ray
        # group per user costs ~1ms each)
        out = (group.groupby("user_id", sort=False)
               .agg(n_sessions=("n_sessions", "sum"),
                    total_events=("total_events", "sum"),
                    max_session_events=("max_session_events", "max"),
                    total_duration_us=("total_duration_us", "sum"))
               .reset_index())
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return _typed_if_empty(out)

    return (sess.map_batches(partial, batch_format="pandas")
            .groupby("part").map_groups(merge,
                                        batch_format="pandas")
            .select_columns(["user_id", "n_sessions", "total_events",
                             "max_session_events",
                             "total_duration_us"]))


def invalid_transitions(ds, allowed, num_parts: int = 128):
    """Sequence-level data-quality check: count the (prev, next)
    event-type transitions NOT in the ``allowed`` set, per ordered
    pair — the state-machine validation a pipeline runs on lifecycle
    logs (an order that ships before it's placed is a bug upstream).
    Order is the per-user (ts, event_id) total order; each user's
    first event has no prev and checks nothing.

    Shape: slim projection, ONE coarse user-keyed exchange, per-user
    vectorized shift + pair count; output is transition-cardinality
    (types x types at most).  Output: ``(prev_type, next_type, n)``
    for illegal pairs only.
    """
    allowed_set = frozenset((str(a), str(b)) for a, b in allowed)

    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        # event_id is part of the total order: a NULL there has no
        # defined position — dropped on BOTH sides (oracle filters
        # identically), never astype-crashed
        t = batch.dropna(subset=["user_id", "event_id",
                                 "event_type", "ts"])
        out = pd.DataFrame({
            "user_id": t["user_id"].astype("int64"),
            "event_id": t["event_id"].astype("int64"),
            "event_type": t["event_type"],
            "ts": t["ts"]})
        out["part"] = _coarse_part(out["user_id"], num_parts)
        return _typed_if_empty(out)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"],
                              ignore_index=True)
        uid = g["user_id"].to_numpy()
        same = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            same[1:] = uid[1:] == uid[:-1]
        prev = g["event_type"].shift(1)
        pairs = pd.DataFrame({"prev_type": prev[same],
                              "next_type": g["event_type"][same]})
        if len(pairs):
            legal = pd.Series(
                list(zip(pairs["prev_type"], pairs["next_type"])),
                index=pairs.index).isin(allowed_set)
            pairs = pairs[~legal]
        out = (pairs.groupby(["prev_type", "next_type"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64") if len(out) else out.get(
            "n", pd.Series([], dtype="int64"))
        return _typed_if_empty(out)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "prev_type": [group["prev_type"].iloc[0]],
            "next_type": [group["next_type"].iloc[0]],
            "n": [int(group["n"].sum())]})

    return (ds.map_batches(slim, batch_format="pandas")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas")
            .groupby(["prev_type", "next_type"])
            .map_groups(combine, batch_format="pandas"))


def behavior_strings(ds, num_parts: int = 64):
    """Behavior-pattern mining: each user's ordered event-type
    sequence collapsed to one ``a>b>c`` string (the (ts, event_id)
    total order), then users counted per distinct pattern — the
    sequence-level GROUP BY a product team runs to find the dominant
    journeys.  Output: ``(pattern, n_users)``.

    Shape: slim projection -> ONE coarse user-keyed exchange ->
    per-user vectorized string join -> pattern strings (one per
    user) re-keyed coarse for the tiny pattern count.  NULL
    user/type/ts/event_id rows drop (both sides).
    """
    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch.dropna(subset=["user_id", "event_id",
                                 "event_type", "ts"])
        out = pd.DataFrame({
            "user_id": t["user_id"].astype("int64"),
            "event_id": t["event_id"].astype("int64"),
            "event_type": t["event_type"].astype(str),
            "ts": t["ts"]})
        out["part"] = _coarse_part(out["user_id"], num_parts)
        return _typed_if_empty(out)

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"])
        pat = (g.groupby("user_id", sort=False)["event_type"]
               .agg(">".join).reset_index(name="pattern"))
        out = pd.DataFrame({"pattern": pat["pattern"]})
        out["ppart"] = _coarse_part(out["pattern"], num_parts)
        return _typed_if_empty(out)

    def count_patterns(group: pd.DataFrame) -> pd.DataFrame:
        out = (group.groupby("pattern", sort=False).size()
               .reset_index(name="n_users"))
        out["n_users"] = out["n_users"].astype("int64")
        return _typed_if_empty(out)

    return (ds.map_batches(slim, batch_format="pandas")
            .groupby("part").map_groups(per_user,
                                        batch_format="pandas")
            .groupby("ppart").map_groups(count_patterns,
                                         batch_format="pandas"))


def mad_outliers(ds, k_mad: int = 3):
    """Robust per-group outlier detection via median absolute
    deviation — the outlier rule that one megavalue can't corrupt
    (unlike z-scores, whose mean and stddev the outlier itself
    drags): per event type, ``med`` = the exact DISCRETE median of
    the value cents (0-indexed rank ``(n-1)//2`` of the sorted
    multiset) and ``mad`` = the same rank statistic of
    ``|cents - med|``; a row is an outlier iff
    ``|cents - med| > k_mad * mad``.  All arithmetic exact integers.

    Shape: two mergeable-histogram passes (the winsorize_by_group
    discipline — per-(type, value) counts ride the exchanges, never
    rows; group medians resolve from distinct-value-bounded
    histograms at the driver and broadcast in the closure), then one
    stateless flag map.  Output: outlier rows only,
    ``(event_id, event_type, cents)``.
    """
    from doc_ocr_ray.util import hist_value_at_rank, value_cents

    def cents_of(t: pd.DataFrame) -> np.ndarray:
        return value_cents(t["value"])

    def hist1(batch: pd.DataFrame) -> pd.DataFrame:
        # event_id rides to the output: NULL there would astype-crash
        # the flag pass, so it drops on BOTH sides (oracle filters
        # identically)
        t = batch.dropna(subset=["event_id", "event_type", "value"])
        g = pd.DataFrame({"event_type": t["event_type"],
                          "cents": cents_of(t)})
        out = (g.groupby(["event_type", "cents"], sort=False)
               .size().reset_index(name="cnt"))
        return _typed_if_empty(out)

    def rank_stat(hist: pd.DataFrame, val_col: str) -> dict:
        out = {}
        for grp, h in hist.groupby("event_type", sort=False):
            h = h.sort_values(val_col)
            n = int(h["cnt"].sum())
            out[grp] = hist_value_at_rank(
                h[val_col].to_numpy(), h["cnt"].to_numpy(),
                (n - 1) // 2)
        return out

    def hist_combine(partials_ds, val_col: str) -> pd.DataFrame:
        # the house coarse-key combine instead of a native groupby
        # sort: histogram partials re-key on a 32-way hash and merge
        # INSIDE the group fn (the native (type, value) groupby paid
        # an all-to-all sort over a near-corpus-sized key space when
        # values are continuous — 25 s of the old 30 s wall)
        def add_part(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["part"] = _coarse_part(
                b["event_type"].astype(str) + ":"
                + b[val_col].astype(str), 32)
            return b

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            out = (g.groupby(["event_type", val_col], sort=False)
                   ["cnt"].sum().reset_index())
            out["cnt"] = out["cnt"].astype("int64")
            return _typed_if_empty(out)

        return (partials_ds.map_batches(add_part,
                                        batch_format="pandas")
                .groupby("part").map_groups(combine,
                                            batch_format="pandas")
                .to_pandas())

    h1 = hist_combine(ds.map_batches(hist1, batch_format="pandas"),
                      "cents")
    if h1.empty:
        return ds.map_batches(
            lambda b: _typed_if_empty(pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "event_type": pd.Series([], dtype="object"),
                "cents": pd.Series([], dtype="int64")})),
            batch_format="pandas")
    med = rank_stat(h1, "cents")

    def hist2(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch.dropna(subset=["event_id", "event_type", "value"])
        c = cents_of(t)
        m = t["event_type"].map(med).astype("int64")
        g = pd.DataFrame({"event_type": t["event_type"],
                          "dev": np.abs(c - m)})
        out = (g.groupby(["event_type", "dev"], sort=False)
               .size().reset_index(name="cnt"))
        return _typed_if_empty(out)

    h2 = hist_combine(ds.map_batches(hist2, batch_format="pandas"),
                      "dev")
    mad = rank_stat(h2, "dev")

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch.dropna(subset=["event_id", "event_type", "value"])
        c = cents_of(t)
        m = t["event_type"].map(med).astype("int64")
        d = t["event_type"].map(mad).astype("int64")
        keep = np.abs(c - m) > k_mad * d
        out = pd.DataFrame({
            "event_id": t["event_id"].astype("int64")[keep],
            "event_type": t["event_type"][keep],
            "cents": c[keep]})
        return _typed_if_empty(out.reset_index(drop=True))

    return ds.map_batches(flag, batch_format="pandas")
