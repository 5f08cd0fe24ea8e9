"""General relational operators demonstrated over the test tables.

These exercise the engine's wide-operator patterns with exact DuckDB
oracles: partial-aggregate-then-groupby (combiner before the shuffle),
global sort + limit, and broadcast hash join (small side via ray.put,
no shuffle).  Float aggregates are rounded in BOTH engines so value
hashes match.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from doc_ocr_ray.util import default_join_partitions, revenue_cents


def events_by_type(ds):
    """events -> (event_type, n, sum_value): per-batch partial
    aggregation shrinks the shuffle to one row per key per batch.

    Sums accumulate in integer cents: float accumulation order differs
    between engines, and a sum of 2-decimal values lands exactly on the
    rounding grid, so only integer arithmetic hash-matches an
    independent implementation (see CLAUDE.md rounding rule)."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            cents=np.floor(batch["value"] * 100 + 0.5).astype("int64"))
        g = batch.groupby("event_type", sort=False)["cents"].agg(["count", "sum"])
        g = g.reset_index()
        g.columns = ["event_type", "n", "sum_cents"]
        return g

    partials = ds.map_batches(partial, batch_format="pandas")

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [group["event_type"].iloc[0]],
            "n": [int(group["n"].sum())],
            "sum_value": [int(group["sum_cents"].sum()) / 100.0],
        })
    return partials.groupby("event_type").map_groups(final, batch_format="pandas")


def events_by_type_native(ds):
    """Same result as events_by_type but via Ray Data's native
    aggregate API (Sum/Count with internal partial aggregation) —
    the idiomatic one-liner when no custom combiner is needed."""
    from ray.data.aggregate import Count, Sum

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        batch["cents"] = np.floor(batch["value"] * 100 + 0.5).astype("int64")
        return batch

    agg = (ds.map_batches(to_cents, batch_format="pandas")
           .groupby("event_type").aggregate(
               Count(alias_name="n"), Sum("cents", alias_name="sum_cents")))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["sum_value"] = batch["sum_cents"].astype("int64") / 100.0
        return batch[["event_type", "n", "sum_value"]]
    return agg.map_batches(finish, batch_format="pandas")


def lineitem_pricing(ds):
    """TPC-H Q1-shaped pricing summary (no date filter: whole table).

    Columns: l_returnflag, l_linestatus, sum_qty, sum_base_price,
    sum_disc_price, n — rounded to 2 decimals.
    """
    def partial(batch: pa.Table) -> pa.Table:
        # integer-grid accumulation (cents / ten-thousandths): per-row
        # products are identical doubles in both engines, so rounding
        # them to ints once and summing exactly hash-matches the oracle
        # regardless of accumulation order
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = (batch
             .append_column("qty_c", pc.cast(pc.floor(pc.add(
                 pc.multiply(batch["l_quantity"], pa.scalar(100.0)),
                 pa.scalar(0.5))), pa.int64()))
             .append_column("base_c", pc.cast(pc.floor(pc.add(
                 pc.multiply(batch["l_extendedprice"], pa.scalar(100.0)),
                 pa.scalar(0.5))), pa.int64()))
             .append_column("disc_c", pc.cast(pc.floor(pc.add(
                 pc.multiply(disc_price, pa.scalar(10000.0)),
                 pa.scalar(0.5))), pa.int64())))
        df = t.select(["l_returnflag", "l_linestatus", "qty_c",
                       "base_c", "disc_c"]).to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty_c=("qty_c", "sum"),
            sum_base_c=("base_c", "sum"),
            sum_disc_c=("disc_c", "sum"),
            n=("qty_c", "count")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": [group["l_returnflag"].iloc[0]],
            "l_linestatus": [group["l_linestatus"].iloc[0]],
            "sum_qty": [int(group["sum_qty_c"].sum()) / 100.0],
            "sum_base_price": [int(group["sum_base_c"].sum()) / 100.0],
            "sum_disc_price": [int(group["sum_disc_c"].sum()) / 10000.0],
            "n": [int(group["n"].sum())],
        })
    return partials.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        final, batch_format="pandas")


def top_orders(ds, k: int = 10):
    """Global top-k by total price (sort + limit; deterministic
    tie-break by o_orderkey)."""
    return (ds.select_columns(["o_orderkey", "o_totalprice"])
              .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
              .limit(k))


def supplier_count_by_nation(supplier_ds, nation_table: pa.Table):
    """Broadcast hash join: the nation dimension rides in the object
    store once (ray.put), every batch does a dict lookup — no shuffle
    for the join itself, then a tiny groupby for the count."""
    import ray
    lookup = dict(zip(nation_table["n_nationkey"].to_pylist(),
                      nation_table["n_name"].to_pylist()))
    ref = ray.put(lookup)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(ref)
        out = pd.DataFrame({
            "n_name": batch["s_nationkey"].map(lk),
        })
        g = out.groupby("n_name", sort=False).size().reset_index(name="n_suppliers")
        return g

    partials = supplier_ds.map_batches(join, batch_format="pandas")

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_name": [group["n_name"].iloc[0]],
            "n_suppliers": [int(group["n_suppliers"].sum())],
        })
    return partials.groupby("n_name").map_groups(final, batch_format="pandas")


def filter_documents_by_lang(ds, lang: str):
    """Predicate filter as a vectorized arrow mask inside map_batches."""
    def flt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["lang"], pa.scalar(lang)))
    return ds.map_batches(flt, batch_format="pyarrow")


def order_priority_revenue(lineitem_ds, orders_ds, num_partitions: int = 32):
    """Large ⋈ large: revenue per order priority through Ray Data's
    NATIVE hash shuffle join (``Dataset.join``, both sides
    hash-partitioned on the order key — neither side is broadcast),
    then the house partial-aggregate shape: in-batch integer-cents
    combine before the tiny final groupby.

    Revenue uses the exact-cents rule (floor(x*10000+0.5) per row,
    integer sum, one division at the end) so the DuckDB oracle hashes
    equal."""
    joined = lineitem_ds.join(
        orders_ds, join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from doc_ocr_ray.util import typed_if_empty
        if batch.empty or "l_extendedprice" not in batch.columns:
            # empty hash-join partitions arrive as 0-column frames;
            # emit a typed empty block so downstream schemas agree
            return typed_if_empty(pd.DataFrame({
                "o_orderpriority": pd.Series([], dtype="object"),
                "n_items": pd.Series([], dtype="int64"),
                "sum_cents": pd.Series([], dtype="int64"),
            }))
        cents = revenue_cents(batch["l_extendedprice"],
                              batch["l_discount"])
        g = (batch.assign(cents=cents)
             .groupby("o_orderpriority", sort=False)["cents"]
             .agg(["count", "sum"]).reset_index())
        g.columns = ["o_orderpriority", "n_items", "sum_cents"]
        return g

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": [group["o_orderpriority"].iloc[0]],
            "n_items": [int(group["n_items"].sum())],
            "revenue": [int(group["sum_cents"].sum()) / 10000.0],
        })

    return (joined.map_batches(partial, batch_format="pandas")
            .groupby("o_orderpriority")
            .map_groups(final, batch_format="pandas"))


def revenue_by_nation(lineitem_ds, orders_ds, customer_ds,
                      supplier_tbl: pa.Table, nation_tbl: pa.Table,
                      region_tbl: pa.Table, region: str = "ASIA",
                      num_partitions: int | None = None):
    """TPC-H Q5-shaped local-supplier revenue: per nation in one
    region, revenue from lineitems whose customer and supplier share
    that nation.  Exercises the full join-strategy ladder in one
    query: region/nation resolve at the driver (dozens of rows),
    supplier broadcasts via ``ray.put`` (SF x 10k rows of two ints —
    the canonical broadcastable dimension), and the two corpus-sized
    joins — orders⋈customer and lineitem⋈(orders⋈customer) — run
    through Ray Data's NATIVE hash shuffle join with both sides
    partitioned, never broadcast.  Column-pruned projections enter
    every join; revenue accumulates on the exact ten-thousandths
    integer grid (one division at the end) so the DuckDB twin hashes
    equal.

    ``num_partitions`` defaults to half the cluster CPUs PER JOIN:
    both joins pipeline concurrently and each reserves its own
    HashShuffleAggregator actors, so two fixed 32-partition joins
    starve an 8-CPU cluster outright (the fixed-pool deadlock noted
    in CLAUDE.md, join edition).  Pass it explicitly on a real
    multi-node cluster.
    """
    import ray

    if num_partitions is None:
        num_partitions = default_join_partitions()

    nat = nation_tbl.to_pandas()
    reg = region_tbl.to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"]
    keys = nat.loc[nat["n_regionkey"].isin(set(rkey)), "n_nationkey"]
    region_nations = frozenset(int(k) for k in keys)
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    sup = supplier_tbl.to_pandas()
    sup_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                               sup["s_nationkey"].astype(int))))

    def cust_in_region(batch: pd.DataFrame) -> pd.DataFrame:
        from doc_ocr_ray.util import typed_if_empty
        out = batch.loc[batch["c_nationkey"].isin(region_nations),
                        ["c_custkey", "c_nationkey"]]
        return typed_if_empty(out.reset_index(drop=True))

    cust = customer_ds.map_batches(cust_in_region,
                                   batch_format="pandas")
    ord_cust = orders_ds.select_columns(
        ["o_orderkey", "o_custkey"]).join(
        cust, join_type="inner", num_partitions=num_partitions,
        on=("o_custkey",), right_on=("c_custkey",))
    li = lineitem_ds.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    joined = li.join(ord_cust, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from doc_ocr_ray.util import typed_if_empty
        empty = pd.DataFrame({
            "n_nationkey": pd.Series([], dtype="int64"),
            "sum_cents": pd.Series([], dtype="int64")})
        if batch.empty or "l_suppkey" not in batch.columns:
            return typed_if_empty(empty)
        s_nat = batch["l_suppkey"].map(ray.get(sup_ref))
        keep = (s_nat == batch["c_nationkey"]).to_numpy()
        b = batch[keep]
        if not len(b):
            return typed_if_empty(empty)
        cents = revenue_cents(b["l_extendedprice"], b["l_discount"])
        g = (b.assign(cents=cents, n_nationkey=s_nat[keep]
                      .astype("int64"))
             .groupby("n_nationkey", sort=False)["cents"]
             .sum().reset_index(name="sum_cents"))
        g["sum_cents"] = g["sum_cents"].astype("int64")
        return g

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_name": [names[int(group["n_nationkey"].iloc[0])]],
            "revenue": [int(group["sum_cents"].sum()) / 10000.0],
        })

    return (joined.map_batches(partial, batch_format="pandas")
            .groupby("n_nationkey")
            .map_groups(final, batch_format="pandas"))


def above_avg_orders(orders_ds, num_partitions: int = 128):
    """Orders priced above their customer's average order price — the
    correlated-subquery shape (``WHERE o_totalprice > (SELECT avg(..)
    .. same custkey)``) without a second corpus pass: ONE coarse
    custkey-hash exchange co-locates each customer's orders, and the
    group filter is the DIVISION-FREE cross-multiplied comparison
    ``price_cents * n > sum_cents`` — no average is ever computed, so
    no float or rounding grid exists anywhere and the DuckDB window
    twin is trivially bit-exact.  Output: ``(o_orderkey, o_custkey,
    price_cents)``.

    Scale shape: the exchange carries (orderkey, custkey, cents) only;
    per-group work is two vectorized transforms.  Skewed customers cap
    at orders-per-customer, which is bounded in practice."""
    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        from doc_ocr_ray.util import coarse_part, typed_if_empty
        return typed_if_empty(pd.DataFrame({
            "o_orderkey": batch["o_orderkey"].astype("int64"),
            "o_custkey": batch["o_custkey"].astype("int64"),
            "price_cents": np.floor(batch["o_totalprice"] * 100
                                    + 0.5).astype("int64"),
            "part": coarse_part(batch["o_custkey"], num_partitions)}))

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        by_cust = group.groupby("o_custkey", sort=False)["price_cents"]
        s = by_cust.transform("sum")
        n = by_cust.transform("size")
        keep = group[group["price_cents"] * n > s]
        return keep[["o_orderkey", "o_custkey", "price_cents"]]

    return (orders_ds.map_batches(prep, batch_format="pandas")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas"))


def daily_activity(events_ds, orders_ds, num_partitions: int = 8):
    """Per-day activity reconciliation across two logs: event counts
    FULL OUTER order counts on the integer epoch day — the join mode
    where BOTH sides dangle (days with only events, days with only
    orders), completing the native-join ladder
    (inner/left_semi/left_anti/full_outer).  Output: ``(day,
    n_events, n_orders)`` with 0 on the absent side.

    Scale shape: each side collapses to per-day partials (in-batch
    combine, one tiny day-keyed groupby) BEFORE the join, so Ray
    Data's native hash-shuffle ``full_outer`` joins two
    cardinality-bounded aggregate tables, never event/order rows.
    Days use floor(epoch_seconds / 86400) (tz-proof, exact for
    pre-1970 dates too — same rule as retention_cohorts)."""
    def day_counts(ts_col, out_col):
        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            from doc_ocr_ray.util import epoch_days, typed_if_empty
            ts = batch[ts_col]
            days = epoch_days(ts[ts.notna()])
            out = (days.value_counts().rename_axis("day")
                   .reset_index(name=out_col))
            out["day"] = out["day"].astype("int64")
            out[out_col] = out[out_col].astype("int64")
            return typed_if_empty(out)

        def combine(group: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "day": [int(group["day"].iloc[0])],
                out_col: [int(group[out_col].sum())]})

        return partial, combine

    ep, ec = day_counts("ts", "n_events")
    op, oc = day_counts("o_orderdate", "n_orders")
    ev = (events_ds.map_batches(ep, batch_format="pandas")
          .groupby("day").map_groups(ec, batch_format="pandas"))
    od = (orders_ds.map_batches(op, batch_format="pandas")
          .groupby("day").map_groups(oc, batch_format="pandas"))
    joined = ev.join(od, join_type="full_outer",
                     num_partitions=num_partitions,
                     on=("day",), right_on=("day",),
                     left_suffix="_e", right_suffix="_o")

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        from doc_ocr_ray.util import typed_if_empty
        empty = pd.DataFrame({
            "day": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "n_orders": pd.Series([], dtype="int64")})
        if batch.empty:
            return typed_if_empty(empty)
        cols = {c: batch[c] for c in batch.columns}
        # full_outer emits each side's key column; the dangling side's
        # is NULL — coalesce to one day key, absent counts to 0
        day_e = cols.get("day_e", cols.get("day"))
        day_o = cols.get("day_o", cols.get("day"))
        day = day_e.where(day_e.notna(), day_o)
        out = pd.DataFrame({
            "day": day.astype("int64"),
            "n_events": cols["n_events"].fillna(0).astype("int64"),
            "n_orders": cols["n_orders"].fillna(0).astype("int64")})
        return out

    return joined.map_batches(finish, batch_format="pandas")


def orders_per_customer_hist(customer_ds, orders_ds,
                             num_partitions: int | None = None):
    """TPC-H Q13 shape: the distribution of orders per customer
    INCLUDING zero-order customers — (n_orders, n_customers).  The
    zero bucket is why this is not a plain groupby: customers with no
    orders never appear in the orders table, so the per-customer
    counts LEFT-join back onto the customer table.

    Shape: orders collapse to per-custkey count partials (in-batch
    combiner, one tiny custkey groupby — the exchange carries counts,
    never order rows), then Ray Data's native hash-shuffle
    ``left_outer`` join against the customer key table fills the
    zero bucket, and a cardinality-bounded histogram combine
    finishes.  Output rows are bounded by max orders-per-customer."""
    def order_partial(batch: pd.DataFrame) -> pd.DataFrame:
        from doc_ocr_ray.util import coarse_part, typed_if_empty
        out = (batch.groupby("o_custkey", sort=False).size()
               .reset_index(name="cnt"))
        out["o_custkey"] = out["o_custkey"].astype("int64")
        out["cnt"] = out["cnt"].astype("int64")
        out["part"] = coarse_part(out["o_custkey"], 256)
        return typed_if_empty(out)

    def count_combine(group: pd.DataFrame) -> pd.DataFrame:
        # custkey cardinality is corpus-sized: the Ray-level exchange
        # keys on coarse_part, the real per-custkey sum happens here
        g = (group.groupby("o_custkey", sort=False)["cnt"].sum()
             .reset_index())
        g["cnt"] = g["cnt"].astype("int64")
        return g

    if num_partitions is None:
        # half the CPUs, like revenue_by_nation: the join's aggregator
        # actors reserve cores, and a partition count at or above the
        # session CPU count starves upstream ops (deadlock at 4 cpus)
        num_partitions = default_join_partitions()
    per_cust = (orders_ds.map_batches(order_partial,
                                      batch_format="pandas")
                .groupby("part").map_groups(
                    count_combine, batch_format="pandas"))
    cust_keys = customer_ds.select_columns(["c_custkey"])
    joined = cust_keys.join(per_cust, join_type="left_outer",
                            num_partitions=num_partitions,
                            on=("c_custkey",),
                            right_on=("o_custkey",))

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        from doc_ocr_ray.util import typed_if_empty
        if batch.empty:
            return typed_if_empty(pd.DataFrame({
                "n_orders": pd.Series([], dtype="int64"),
                "n_customers": pd.Series([], dtype="int64")}))
        # KeyError loudly on schema drift — a missing join column must
        # fail at this stage, not surface as an all-zero histogram
        n = batch["cnt"].fillna(0).astype("int64")
        out = (n.value_counts().rename_axis("n_orders")
               .reset_index(name="n_customers"))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return typed_if_empty(out)

    def hist_combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_orders": [int(group["n_orders"].iloc[0])],
            "n_customers": [int(group["n_customers"].sum())]})

    return (joined.map_batches(hist_partial, batch_format="pandas")
            .groupby("n_orders").map_groups(hist_combine,
                                            batch_format="pandas"))


def _join_seed(ds, **sentinel):
    """Union ONE sentinel row (negative join keys that nothing real
    can match — the synth/TPC-H key domains are non-negative) onto a
    join input that could arrive with ZERO blocks (a filter that
    emptied every batch of an empty read); paired with
    :func:`doc_ocr_ray.util.sentinel_if_empty` inside the filter
    functions, which keeps every EMITTED block non-empty (see its
    docstring for the Ray hash-shuffle schema-broadcast race).  The
    sentinel is dropped by the inner join as unmatched."""
    import ray.data as _rd
    from doc_ocr_ray.util import sentinel_frame
    return ds.union(_rd.from_pandas(sentinel_frame(sentinel)))


def _scalar_seed(**cols):
    """One all-zero int64 partial row as a Dataset: unioned onto the
    partials of a scalar aggregate so the single output row exists
    even when the filter matches nothing (the SQL oracle's scalar
    aggregate always returns one row; COALESCE zeros it there) — the
    promo_revenue_share rule, shared by every scalar-aggregate op."""
    import ray.data as _rd
    return _rd.from_pandas(pd.DataFrame(
        {k: np.array([v], dtype="int64") for k, v in cols.items()}))


def shipping_priority(customer_ds, orders_ds, lineitem_ds,
                      segment: str = "BUILDING",
                      cutoff: str = "1999-01-01", k: int = 10,
                      num_partitions: int | None = None):
    """TPC-H Q3-shaped shipping priority: top-k unshipped orders by
    revenue within one market segment — the classic selective
    three-way join with filter pushdown on BOTH fact sides
    (``o_orderdate < cutoff`` prunes orders, ``l_shipdate > cutoff``
    prunes lineitems BEFORE either shuffle, so only qualifying rows
    ride the exchanges).  Both corpus-sized joins run through Ray
    Data's NATIVE hash shuffle join; revenue accumulates per order on
    the exact ten-thousandths integer grid, the per-order combine
    lands on a coarse 256-way key, each partition forwards only its
    local top-k, and the global sort+limit runs over <= 256*k
    candidate rows.  Output: ``(l_orderkey, order_day, revenue)``
    ordered by (revenue desc, order_day, l_orderkey).

    ``order_day`` is the integer epoch day (the house-audited day
    rule, :func:`doc_ocr_ray.util.epoch_days`) so the value hash is
    engine-neutral."""
    from doc_ocr_ray.util import (coarse_part, epoch_days,
                                  sentinel_if_empty, typed_if_empty)

    if num_partitions is None:
        num_partitions = default_join_partitions()
    cut = pd.Timestamp(cutoff)

    def cust_filter(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.loc[batch["c_mktsegment"] == segment, ["c_custkey"]]
        return sentinel_if_empty(out.reset_index(drop=True),
                                 c_custkey=-2)

    def ord_filter(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["o_orderdate"].notna() & (batch["o_orderdate"] < cut)
        out = batch.loc[keep, ["o_orderkey", "o_custkey"]].copy()
        out["order_day"] = epoch_days(batch.loc[keep, "o_orderdate"])
        return sentinel_if_empty(out.reset_index(drop=True),
                                 o_orderkey=-3, o_custkey=-1,
                                 order_day=0)

    def li_filter(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["l_shipdate"].notna() & (batch["l_shipdate"] > cut)
        b = batch.loc[keep]
        out = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].astype("int64").to_numpy(),
            "cents": revenue_cents(b["l_extendedprice"],
                                   b["l_discount"]),
        })
        return sentinel_if_empty(out, l_orderkey=-4, cents=0)

    # sentinel topology: per-batch sentinels are unmatchable (so they
    # never multiply through a join), and the orders⋈cust pair gets
    # ONE matched seed pair (o_custkey=-1 ⋈ c_custkey=-1) whose joined
    # row keeps the oc stream non-empty — oc feeds the SECOND hash
    # join, and a map_batches cannot resurrect an all-empty stream
    # (Ray never invokes the UDF on 0-row blocks), so the sentinel
    # must SURVIVE join 1.  The li sentinel (-4) matches nothing, and
    # the surviving oc sentinel (o_orderkey=-3) matches no real
    # l_orderkey, so nothing synthetic reaches the aggregate.
    cust = _join_seed(
        customer_ds.map_batches(cust_filter, batch_format="pandas"),
        c_custkey=-1)
    orders = _join_seed(
        orders_ds.map_batches(ord_filter, batch_format="pandas"),
        o_orderkey=-3, o_custkey=-1, order_day=0)
    li = _join_seed(
        lineitem_ds.map_batches(li_filter, batch_format="pandas"),
        l_orderkey=-4, cents=0)

    oc = orders.join(cust, join_type="inner",
                     num_partitions=num_partitions,
                     on=("o_custkey",), right_on=("c_custkey",))
    joined = li.join(oc, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    empty = pd.DataFrame({
        "l_orderkey": pd.Series([], dtype="int64"),
        "order_day": pd.Series([], dtype="int64"),
        "sum_cents": pd.Series([], dtype="int64"),
        "part": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "cents" not in batch.columns:
            return typed_if_empty(empty)   # 0-col empty join partition
        g = (batch.groupby(["l_orderkey", "order_day"], sort=False)
             ["cents"].sum().reset_index(name="sum_cents"))
        g["sum_cents"] = g["sum_cents"].astype("int64")
        g["part"] = coarse_part(g["l_orderkey"], 256)
        return g

    def combine_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["l_orderkey", "order_day"], sort=False)
             ["sum_cents"].sum().reset_index())
        g = g.sort_values(["sum_cents", "order_day", "l_orderkey"],
                          ascending=[False, True, True]).head(k)
        for c in ("l_orderkey", "order_day", "sum_cents"):
            g[c] = g[c].astype("int64")
        return g[["l_orderkey", "order_day", "sum_cents"]]

    cand = (joined.map_batches(partial, batch_format="pandas")
            .groupby("part").map_groups(combine_topk,
                                        batch_format="pandas"))
    top = cand.sort(["sum_cents", "order_day", "l_orderkey"],
                    descending=[True, False, False]).limit(k)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return typed_if_empty(pd.DataFrame({
            "l_orderkey": batch["l_orderkey"].astype("int64").to_numpy(),
            "order_day": batch["order_day"].astype("int64").to_numpy(),
            "revenue": (batch["sum_cents"] / 10000.0).to_numpy(),
        }))

    return top.map_batches(finish, batch_format="pandas")


def large_volume_orders(customer_ds, orders_ds, lineitem_ds,
                        qty_threshold: int = 150, k: int = 100,
                        num_partitions: int | None = None):
    """TPC-H Q18-shaped large-volume customers: orders whose total
    lineitem quantity exceeds a threshold, with their customer —
    the HAVING-filter semi-join shape.  The quantity total collapses
    to per-order partials inside ``map_batches`` (combiner before the
    exchange), the HAVING filter runs inside the coarse-key combine
    (only qualifying orders leave the group stage), and both
    enrichment joins — qualifying⋈orders and ⋈customer — are Ray
    Data NATIVE hash shuffle joins (at web scale both sides are
    corpus-sized; nothing broadcasts).  Per-batch partial top-k
    shrinks the candidate set before the global sort+limit.  Output:
    ``(c_name, c_custkey, o_orderkey, order_day, o_totalprice,
    total_qty)`` ordered by (o_totalprice desc, o_orderkey)."""
    from doc_ocr_ray.util import (coarse_part, epoch_days,
                                  sentinel_if_empty, typed_if_empty)

    if num_partitions is None:
        num_partitions = default_join_partitions()

    def qty_partial(batch: pd.DataFrame) -> pd.DataFrame:
        qty = np.floor(batch["l_quantity"] + 0.5).astype("int64")
        g = (pd.DataFrame({"l_orderkey":
                           batch["l_orderkey"].astype("int64"),
                           "qty": qty})
             .groupby("l_orderkey", sort=False)["qty"]
             .sum().reset_index(name="qty"))
        g["qty"] = g["qty"].astype("int64")
        g["part"] = coarse_part(g["l_orderkey"], 256)
        return typed_if_empty(g)

    def qty_combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("l_orderkey", sort=False)["qty"]
             .sum().reset_index(name="total_qty"))
        g = g[g["total_qty"] > qty_threshold].reset_index(drop=True)
        return sentinel_if_empty(g[["l_orderkey", "total_qty"]],
                                 l_orderkey=-2, total_qty=0)

    qualifying = (lineitem_ds.select_columns(["l_orderkey", "l_quantity"])
                  .map_batches(qty_partial, batch_format="pandas")
                  .groupby("part").map_groups(qty_combine,
                                              batch_format="pandas"))

    def ord_prep(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["o_orderdate"].notna()
        b = batch.loc[keep]
        out = b[["o_orderkey", "o_custkey", "o_totalprice"]].copy()
        out["order_day"] = epoch_days(b["o_orderdate"])
        return sentinel_if_empty(out.reset_index(drop=True),
                                 o_orderkey=-3, o_custkey=-4,
                                 o_totalprice=0.0, order_day=0)

    # matched seed pair (l_orderkey=-3 ⋈ o_orderkey=-3): its joined
    # row keeps oq non-empty for the SECOND hash join (see the
    # sentinel-topology note in shipping_priority); the surviving oq
    # sentinel's o_custkey=-4 then matches no customer and drops
    qualifying = _join_seed(qualifying, l_orderkey=-3, total_qty=0)
    orders = _join_seed(
        orders_ds.map_batches(ord_prep, batch_format="pandas"),
        o_orderkey=-3, o_custkey=-4, o_totalprice=0.0, order_day=0)
    oq = qualifying.join(orders, join_type="inner",
                         num_partitions=num_partitions,
                         on=("l_orderkey",), right_on=("o_orderkey",))
    cust = _join_seed(customer_ds.select_columns(["c_custkey", "c_name"]),
                      c_custkey=-5, c_name="")
    full = oq.join(cust, join_type="inner",
                   num_partitions=num_partitions,
                   on=("o_custkey",), right_on=("c_custkey",))

    cols = ["c_name", "c_custkey", "o_orderkey", "order_day",
            "o_totalprice", "total_qty"]
    empty = pd.DataFrame({
        "c_name": pd.Series([], dtype="object"),
        "c_custkey": pd.Series([], dtype="int64"),
        "o_orderkey": pd.Series([], dtype="int64"),
        "order_day": pd.Series([], dtype="int64"),
        "o_totalprice": pd.Series([], dtype="float64"),
        "total_qty": pd.Series([], dtype="int64")})

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "c_name" not in batch.columns:
            return typed_if_empty(empty)
        out = batch.rename(columns={"l_orderkey": "o_orderkey",
                                    "o_custkey": "c_custkey"})
        out = out.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True]).head(k)
        return out[cols].reset_index(drop=True)

    return (full.map_batches(local_topk, batch_format="pandas")
            .sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(k))


def promo_revenue_share(part_ds, lineitem_ds,
                        start: str = "1999-01-01",
                        end: str = "1999-04-01",
                        promo_type: str = "PROMO",
                        num_partitions: int | None = None):
    """TPC-H Q14-shaped promotion effect: the revenue share of promo
    parts within a shipdate window — the conditional-aggregate-over-
    a-join shape.  The shipdate filter prunes lineitem BEFORE the
    exchange, part projects to (key, flag), the join is Ray Data's
    NATIVE hash shuffle join (at TPC-H scale part is SF x 200k rows —
    too big to assume broadcastable), and each batch collapses to ONE
    (promo_cents, total_cents) partial so the final combine sees
    block-count rows.  The percentage lands on the exact ratio grid
    floor(10000 * (100 * promo) / total) / 10000 with the identical
    operation order in the DuckDB twin (both engines: exact integer
    numerator, one IEEE-double division, floor).  Output: one row
    ``(promo_revenue, total_revenue, promo_share_pct)``."""
    import math

    from doc_ocr_ray.util import sentinel_if_empty, typed_if_empty

    if num_partitions is None:
        num_partitions = default_join_partitions()
    lo, hi = pd.Timestamp(start), pd.Timestamp(end)

    def part_prep(batch: pd.DataFrame) -> pd.DataFrame:
        return sentinel_if_empty(pd.DataFrame({
            "p_partkey": batch["p_partkey"].astype("int64").to_numpy(),
            "is_promo": (batch["p_type"] == promo_type)
            .astype("int64").to_numpy()}), p_partkey=-3, is_promo=0)

    def li_prep(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["l_shipdate"].notna()
                & (batch["l_shipdate"] >= lo)
                & (batch["l_shipdate"] < hi))
        b = batch.loc[keep]
        return sentinel_if_empty(pd.DataFrame({
            "l_partkey": b["l_partkey"].astype("int64").to_numpy(),
            "cents": revenue_cents(b["l_extendedprice"],
                                   b["l_discount"])}),
            l_partkey=-2, cents=0)

    li = _join_seed(
        lineitem_ds.map_batches(li_prep, batch_format="pandas"),
        l_partkey=-2, cents=0)
    parts = _join_seed(
        part_ds.map_batches(part_prep, batch_format="pandas"),
        p_partkey=-3, is_promo=0)
    joined = li.join(parts, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_partkey",), right_on=("p_partkey",))

    empty = pd.DataFrame({
        "k": pd.Series([], dtype="int64"),
        "promo_cents": pd.Series([], dtype="int64"),
        "total_cents": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "cents" not in batch.columns:
            return typed_if_empty(empty)
        c = batch["cents"].to_numpy()
        return pd.DataFrame({
            "k": np.array([0], dtype="int64"),
            "promo_cents": [int(c[batch["is_promo"].to_numpy() == 1]
                                .sum())],
            "total_cents": [int(c.sum())]})

    def final(group: pd.DataFrame) -> pd.DataFrame:
        promo = int(group["promo_cents"].sum())
        total = int(group["total_cents"].sum())
        # identical-operation-order ratio: exact integer numerator,
        # then fl(num)/fl(den) — DuckDB casts the HUGEINT operands to
        # double BEFORE dividing, so the engine must too (a raw
        # int/int in Python is the correctly-rounded true quotient,
        # which can differ by 1 ulp and flip the floor)
        pct = (math.floor(float(10000 * (100 * promo)) / float(total))
               / 10000 if total else 0.0)
        return pd.DataFrame({
            "promo_revenue": [promo / 10000.0],
            "total_revenue": [total / 10000.0],
            "promo_share_pct": [pct]})

    seed = _scalar_seed(k=0, promo_cents=0, total_cents=0)
    return (joined.map_batches(partial, batch_format="pandas")
            .union(seed)
            .groupby("k").map_groups(final, batch_format="pandas"))


# 64-bit multiply-shift mixers for the bloom probe (odd multipliers;
# the uint64 wrap IS the scramble — the minhash _perm_params rule)
_BLOOM_A1 = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_B1 = np.uint64(0xD1B54A32D192ED03)
_BLOOM_A2 = np.uint64(0xC2B2AE3D27D4EB4F)
_BLOOM_B2 = np.uint64(0x165667B19E3779F9)


def _bloom_positions(keys: np.ndarray, m_bits: int,
                     k_hashes: int) -> np.ndarray:
    """(n, k_hashes) bit positions via double hashing
    h_i = (h1 + i*h2) & (m-1); h2 forced odd so the probe sequence
    cycles through the full power-of-two table."""
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = (_BLOOM_A1 * k + _BLOOM_B1) >> np.uint64(32)
        h2 = ((_BLOOM_A2 * k + _BLOOM_B2) >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            & np.uint64(m_bits - 1)).astype(np.int64)


def bloom_semi_join(big_ds, keys_ds, big_key: str, keys_key: str,
                    m_bits: int = 1 << 20, k_hashes: int = 4,
                    num_partitions: int = 16):
    """Bloom-filtered distributed semi-join — the classic exchange
    reducer every shuffle engine grows once tables stop fitting
    broadcasts: keep the big side's rows whose ``big_key`` appears in
    ``keys_ds.keys_key``, EXACTLY, but make the expensive hash
    exchange carry only bloom SURVIVORS instead of the whole big side.

    Why not broadcast the exact key set (the
    ``filter_blocked_domains`` strategy)?  At 10 bits/key the bitmap
    is ~80x smaller than an int64 key set — a 100M-key filter
    broadcasts as ~125 MB where the exact set would be GBs.  Why not
    a plain native semi join?  Its exchange ships every big-side row;
    here only rows that pass the bitmap (true matches + the ~(1/2)^k
    false-positive sliver) enter the join.

    Stages:
      1. BUILD — one pass over the key side emits per-batch DISTINCT
         bit positions; one coarse position-keyed distinct exchange
         bounds the driver collect by ``m_bits`` rows (never by
         |keys|); the packed boolean table broadcasts once via
         ``ray.put``.
      2. PROBE — stateless vectorized ``map_batches`` over the big
         side: a row survives iff all ``k_hashes`` bits are set.  No
         false negatives by construction (same mixers both sides).
      3. EXACT FINISH — native ``left_semi`` hash join of the
         survivors against the distinct key side removes the false
         positives, so the output equals the plain EXISTS semi-join
         row for row.

    Keys must be integer-valued.  ``m_bits`` must be a power of two
    (the mask IS the modulus).  Output: the big side's rows/columns.
    """
    import ray

    from doc_ocr_ray.util import coarse_part, typed_if_empty

    if m_bits <= 0 or (m_bits & (m_bits - 1)) != 0:
        raise ValueError("m_bits must be a positive power of two")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")

    _empty_pos = pd.DataFrame({"pos": pd.Series([], dtype="int64"),
                               "part": pd.Series([], dtype="int64")})

    def build_positions(batch: pd.DataFrame) -> pd.DataFrame:
        ks = np.unique(batch[keys_key].to_numpy(dtype=np.int64))
        if not len(ks):
            return typed_if_empty(_empty_pos)
        pos = np.unique(_bloom_positions(ks, m_bits, k_hashes))
        return pd.DataFrame({
            "pos": pos,
            "part": coarse_part(pd.Series(pos), num_partitions)})

    def distinct_pos(group: pd.DataFrame) -> pd.DataFrame:
        return group[["pos"]].drop_duplicates()

    bits = np.zeros(m_bits, dtype=bool)
    pos_ds = (keys_ds.map_batches(build_positions, batch_format="pandas")
              .groupby("part").map_groups(distinct_pos,
                                          batch_format="pandas"))
    for b in pos_ds.iter_batches(batch_size=65536,
                                 batch_format="pandas"):
        bits[b["pos"].to_numpy()] = True
    bits_ref = ray.put(np.packbits(bits))

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        bt = np.unpackbits(ray.get(bits_ref), count=m_bits).view(bool)
        ks = batch[big_key].to_numpy(dtype=np.int64)
        if not len(ks):
            return batch
        idx = _bloom_positions(ks, m_bits, k_hashes)
        return batch[bt[idx].all(axis=1)]

    def distinct_keys(batch: pd.DataFrame) -> pd.DataFrame:
        return typed_if_empty(pd.DataFrame({
            keys_key: batch[keys_key].astype("int64")
        }).drop_duplicates())

    survivors = big_ds.map_batches(probe, batch_format="pandas")
    keys_slim = keys_ds.map_batches(distinct_keys, batch_format="pandas")
    return survivors.join(keys_slim, join_type="left_semi",
                          num_partitions=num_partitions,
                          on=(big_key,), right_on=(keys_key,))


def interval_lookup(ds, intervals, value_col: str, out_col: str = "band",
                    default: str = "(none)"):
    """Broadcast non-equi lookup join — the GeoIP / CIDR-block /
    price-band shape: map each row's integer value to the label of
    the unique half-open interval [lo, hi) containing it, from a
    SMALL interval table that rides the task closure (the ntile
    threshold-table discipline; never a shuffle — a non-equi join has
    no hash key, so the distributed alternative is a range-partition
    exchange this operator exists to avoid).

    ``intervals``: iterable of (lo, hi, label), validated sorted-able,
    ``hi > lo`` and pairwise non-overlapping (the lookup would be
    ambiguous otherwise — refused loudly).  Rows covered by no
    interval keep ``default`` (LEFT-join semantics, no row loss).

    One vectorized ``np.searchsorted`` per batch: O(log k) per row
    against k intervals, exact for integers.  Output: the input
    columns plus ``out_col``.
    """
    iv = sorted((int(lo), int(hi), str(lab)) for lo, hi, lab in intervals)
    if not iv:
        raise ValueError("intervals must be non-empty")
    for (lo, hi, _), nxt in zip(iv, iv[1:] + [None]):
        if hi <= lo:
            raise ValueError(f"empty interval [{lo}, {hi})")
        if nxt is not None and nxt[0] < hi:
            raise ValueError(f"overlapping intervals at lo={nxt[0]}")
    los = np.array([x[0] for x in iv], dtype=np.int64)
    his = np.array([x[1] for x in iv], dtype=np.int64)
    labs = np.array([x[2] for x in iv], dtype=object)

    def lookup(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.int64)
        idx = np.searchsorted(los, v, side="right") - 1
        safe = np.clip(idx, 0, len(los) - 1)
        hit = (idx >= 0) & (v < his[safe])
        out = batch.copy()
        out[out_col] = np.where(hit, labs[safe], default)
        out[out_col] = out[out_col].astype(object)
        return out

    return ds.map_batches(lookup, batch_format="pandas")


def min_cost_supplier(lineitem_ds, supplier_tbl: pa.Table,
                      num_parts: int = 128):
    """TPC-H Q2-shaped correlated-subquery decorrelation: for every
    part, which supplier(s) ship it at the part's MINIMUM observed
    price (``WHERE price = (SELECT min(price) ... WHERE partkey =
    outer.partkey)``).  The classic rewrite is min-per-group + join
    back; at scale that join is a second all-to-all over a
    part-cardinality table, so this runs BOTH halves in ONE exchange:
    co-partition the pruned projection by part key, compute the
    group min and filter the achieving rows inside the same group fn.
    Supplier names resolve from the canonical broadcastable dimension
    (``ray.put`` once, read per batch).

    Ties keep every achieving supplier (SQL join-back semantics);
    repeat (part, supplier) hits collapse to one row (DISTINCT).
    Prices compare on the exact integer-cents grid.  Output:
    ``(p_partkey, s_suppkey, s_name, min_cents)``.
    """
    import ray
    from doc_ocr_ray.util import coarse_part, typed_if_empty

    sup = supplier_tbl.to_pandas()
    names_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                                 sup["s_name"])))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "p_partkey": batch["l_partkey"].astype("int64"),
            "s_suppkey": batch["l_suppkey"].astype("int64"),
            "cents": np.floor(batch["l_extendedprice"] * 100 + 0.5)
                       .astype("int64")})
        # in-batch combiner: only per-(part, supplier) minima survive
        # to the shuffle (row count bounded by distinct pairs)
        out = (out.groupby(["p_partkey", "s_suppkey"], sort=False)
               ["cents"].min().reset_index())
        out["part"] = coarse_part(out["p_partkey"], num_parts)
        return typed_if_empty(out)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(names_ref)
        g = group
        mins = g.groupby("p_partkey", sort=False)["cents"].transform("min")
        w = (g.loc[g["cents"] == mins,
                   ["p_partkey", "s_suppkey", "cents"]]
             .drop_duplicates(["p_partkey", "s_suppkey"]))
        nm = w["s_suppkey"].map(names)
        # inner-join parity with the oracle's JOIN supplier: suppliers
        # absent from the dimension drop instead of carrying NaN names
        w, nm = w[nm.notna()], nm[nm.notna()]
        return typed_if_empty(pd.DataFrame({
            "p_partkey": w["p_partkey"],
            "s_suppkey": w["s_suppkey"],
            "s_name": nm.astype(object),
            "min_cents": w["cents"]}))

    return (lineitem_ds
            .select_columns(["l_partkey", "l_suppkey",
                             "l_extendedprice"])
            .map_batches(project, batch_format="pandas")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas"))


def late_orders_by_priority(orders_ds, lineitem_ds,
                            grace_days: int = 90,
                            num_partitions: int | None = None,
                            num_parts: int = 128):
    """TPC-H Q4-shaped EXISTS with a CROSS-TABLE predicate: count per
    order priority the orders having at least one lineitem shipped
    more than ``grace_days`` after the order date.  The predicate
    needs columns from both sides, so a broadcast key set cannot
    express it — the shape is native hash join (both corpus-sized
    sides partitioned) -> per-batch predicate filter + in-batch
    DISTINCT partial -> one coarse order-keyed exchange for the exact
    cross-batch DISTINCT (EXISTS = at most one count per order) ->
    tiny per-priority sum.

    Date arithmetic is exact integer microseconds (grace window =
    ``grace_days`` whole days), matching the SQL twin's INTERVAL
    comparison bit-for-bit.  Output: ``(o_orderpriority,
    n_late_orders)``.
    """
    from doc_ocr_ray.util import coarse_part, typed_if_empty

    if num_partitions is None:
        num_partitions = default_join_partitions()
    grace_us = np.int64(grace_days) * 86_400_000_000

    joined = lineitem_ds.select_columns(["l_orderkey", "l_shipdate"]).join(
        orders_ds.select_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]),
        join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def late_partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_orderpriority": pd.Series([], dtype="object"),
            "part": pd.Series([], dtype="int64")})
        if batch.empty or "l_shipdate" not in batch.columns:
            return typed_if_empty(empty)
        ship = batch["l_shipdate"].to_numpy().astype(
            "datetime64[us]").astype("int64")
        odate = batch["o_orderdate"].to_numpy().astype(
            "datetime64[us]").astype("int64")
        # the native join keeps the LEFT key column (l_orderkey)
        b = batch.loc[ship > odate + grace_us,
                      ["l_orderkey", "o_orderpriority"]].rename(
            columns={"l_orderkey": "o_orderkey"})
        out = b.drop_duplicates("o_orderkey").reset_index(drop=True)
        if not len(out):
            return typed_if_empty(empty)
        out["o_orderkey"] = out["o_orderkey"].astype("int64")
        out["part"] = coarse_part(out["o_orderkey"], num_parts)
        return out

    def distinct_count(group: pd.DataFrame) -> pd.DataFrame:
        d = group.drop_duplicates("o_orderkey")
        out = (d.groupby("o_orderpriority", sort=False)
               .size().reset_index(name="n"))
        return typed_if_empty(out)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": [group["o_orderpriority"].iloc[0]],
            "n_late_orders": [int(group["n"].sum())]})

    return (joined.map_batches(late_partial, batch_format="pandas")
            .groupby("part").map_groups(distinct_count,
                                        batch_format="pandas")
            .groupby("o_orderpriority")
            .map_groups(final, batch_format="pandas"))


def copurchase_pairs(lineitem_ds, k: int = 20, num_parts: int = 128):
    """Market-basket co-occurrence — the "frequently bought together"
    aggregation every recommender corpus build runs: baskets are
    orders, items are the DISTINCT parts in each order, and the
    output is the top-``k`` unordered part pairs by basket count
    (ties broken by the pair keys, a total order, so the cut is
    deterministic).

    Shape: coarse order-keyed exchange of the two-column projection
    (an in-batch per-(order, part) DISTINCT shrinks it first), pair
    expansion INSIDE the group fn (baskets are small — the quadratic
    is basket-bounded), per-partition pair counts re-keyed by pair
    hash for the exact global count, per-partition top-k, and a
    num_parts*k-row driver merge — the global sort never touches the
    full pair table.
    """
    from doc_ocr_ray.util import coarse_part, typed_if_empty

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "o": batch["l_orderkey"].astype("int64"),
            "p": batch["l_partkey"].astype("int64")}
        ).drop_duplicates()
        out["part"] = coarse_part(out["o"], num_parts)
        return typed_if_empty(out)

    def pairs_in_baskets(group: pd.DataFrame) -> pd.DataFrame:
        d = group.drop_duplicates(["o", "p"]).sort_values(["o", "p"])
        rows = []
        for _, basket in d.groupby("o", sort=False):
            ps = basket["p"].to_numpy()
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    rows.append((ps[i], ps[j]))
        if not rows:
            return typed_if_empty(pd.DataFrame({
                "p1": pd.Series([], dtype="int64"),
                "p2": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "ppart": pd.Series([], dtype="int64")}))
        out = (pd.DataFrame(rows, columns=["p1", "p2"])
               .groupby(["p1", "p2"], sort=False)
               .size().reset_index(name="n"))
        out["ppart"] = coarse_part(
            out["p1"] * np.int64(1_000_003) + out["p2"], num_parts)
        return out

    def topk_per_pairpart(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["p1", "p2"], sort=False)["n"].sum()
             .reset_index())
        g["n"] = g["n"].astype("int64")
        g = g.sort_values(["n", "p1", "p2"],
                          ascending=[False, True, True]).head(k)
        return typed_if_empty(g[["p1", "p2", "n"]])

    cand = (lineitem_ds.select_columns(["l_orderkey", "l_partkey"])
            .map_batches(project, batch_format="pandas")
            .groupby("part").map_groups(pairs_in_baskets,
                                        batch_format="pandas")
            .groupby("ppart").map_groups(topk_per_pairpart,
                                         batch_format="pandas")
            .to_pandas())
    if not len(cand):
        # zero-row to_pandas() drops the column list (CLAUDE.md)
        return pa.table({"p1": pa.array([], pa.int64()),
                         "p2": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    top = cand.sort_values(["n", "p1", "p2"],
                           ascending=[False, True, True]).head(k)
    return pa.Table.from_pandas(top.reset_index(drop=True),
                                preserve_index=False)


def supplier_variety(lineitem_ds, part_ds, excluded_suppkeys,
                     num_partitions: int | None = None,
                     num_parts: int = 128):
    """TPC-H Q16-shaped supplier-variety count: DISTINCT suppliers
    per part brand, excluding a complaint blocklist (``COUNT(DISTINCT
    suppkey) ... WHERE suppkey NOT IN (...)``).  Both lineitem and
    part are corpus-sized at scale, so the brand resolves through the
    NATIVE hash join; the blocklist is the broadcastable side and
    filters BEFORE the join (the cheapest place).  The exchange then
    carries the DISTINCT (brand, suppkey) pair set — in-batch pair
    dedup first, exact cross-batch dedup in ONE coarse pair-keyed
    exchange, tiny per-brand count.

    Output: ``(p_brand, n_suppliers)``.
    """
    from doc_ocr_ray.util import coarse_part, typed_if_empty

    if num_partitions is None:
        num_partitions = default_join_partitions()
    excluded = frozenset(int(k) for k in excluded_suppkeys)

    def pre_filter(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.loc[~batch["l_suppkey"].isin(excluded),
                        ["l_partkey", "l_suppkey"]].drop_duplicates()
        return typed_if_empty(out.reset_index(drop=True))

    li = lineitem_ds.select_columns(
        ["l_partkey", "l_suppkey"]).map_batches(
        pre_filter, batch_format="pandas")
    joined = li.join(
        part_ds.select_columns(["p_partkey", "p_brand"]),
        join_type="inner", num_partitions=num_partitions,
        on=("l_partkey",), right_on=("p_partkey",))

    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "p_brand": pd.Series([], dtype="object"),
            "l_suppkey": pd.Series([], dtype="int64"),
            "part": pd.Series([], dtype="int64")})
        if batch.empty or "p_brand" not in batch.columns:
            return typed_if_empty(empty)
        out = (batch[["p_brand", "l_suppkey"]].drop_duplicates()
               .reset_index(drop=True))
        out["l_suppkey"] = out["l_suppkey"].astype("int64")
        out["part"] = coarse_part(
            out["p_brand"].astype(str) + ":"
            + out["l_suppkey"].astype(str), num_parts)
        return out

    def distinct_count(group: pd.DataFrame) -> pd.DataFrame:
        d = group.drop_duplicates(["p_brand", "l_suppkey"])
        out = (d.groupby("p_brand", sort=False)
               .size().reset_index(name="n"))
        return typed_if_empty(out)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_brand": [group["p_brand"].iloc[0]],
            "n_suppliers": [int(group["n"].sum())]})

    return (joined.map_batches(pair_partial, batch_format="pandas")
            .groupby("part").map_groups(distinct_count,
                                        batch_format="pandas")
            .groupby("p_brand")
            .map_groups(final, batch_format="pandas"))


def unpivot(ds, id_cols, value_cols, var_name: str = "measure",
            value_name: str = "val"):
    """Wide -> long reshape (the UNPIVOT twin of ``events_pivot``):
    each input row fans out to one row per value column, tagged with
    the column's name.  A pure per-batch ``melt`` — row-local fan-out,
    NO shuffle, output rows = input rows x len(value_cols).  Value
    columns must share one dtype (pandas melt would silently upcast
    mixed ints/floats to object; refused loudly instead).
    """
    from doc_ocr_ray.util import typed_if_empty

    id_cols = list(id_cols)
    value_cols = list(value_cols)

    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        dtypes = {str(batch[c].dtype) for c in value_cols}
        if len(dtypes) > 1:
            raise ValueError(
                f"unpivot value columns must share one dtype, got "
                f"{sorted(dtypes)}")
        out = batch.melt(id_vars=id_cols, value_vars=value_cols,
                         var_name=var_name, value_name=value_name)
        return typed_if_empty(out)

    return ds.map_batches(melt, batch_format="pandas")


def pareto_frontier(part_ds, num_parts: int = 64):
    """Distributed skyline / Pareto frontier over parts: the rows for
    which no other part is BOTH cheaper (retail price, minimized) AND
    larger-or-equal in size (maximized) with one strict improvement —
    the classic dominance query (best price/size trade-offs).

    Shape: the local-prune-then-merge discipline (the top-k shape
    generalized to dominance): every partition computes its LOCAL
    frontier — a row dominated within a partition is dominated
    globally, so local pruning is safe and the surviving set is a
    superset of the answer — then the tiny union of local frontiers
    takes one final single-group prune.  The frontier of a random
    partition is small (O(log n) expected for independent dims), so
    the merge input stays driver-safe even at corpus scale; a
    pathological all-frontier corpus degrades to the exact answer,
    never a wrong one.

    Prices compare on the exact cents grid.  Output:
    ``(p_partkey, price_cents, p_size)``.
    """
    from doc_ocr_ray.util import typed_if_empty

    def frontier(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_if_empty(df.reset_index(drop=True))
        # sort by (price asc, size desc); prev_best = max size among
        # strictly earlier rows.  keep = size >= prev_best is SAFE
        # (any dropped row is dominated by the earlier max-size row:
        # cheaper, or equal-price with strictly greater size) but may
        # keep dominated equal-price/equal-size combinations — the
        # exact pairwise recheck over the frontier-sized survivor set
        # removes those false positives and never restores drops
        g = df.sort_values(["price_cents", "p_size"],
                           ascending=[True, False],
                           kind="mergesort", ignore_index=True)
        size = g["p_size"].to_numpy()
        best = np.maximum.accumulate(size)
        prev_best = np.concatenate(([np.iinfo(np.int64).min],
                                    best[:-1]))
        cand = g[size >= prev_best]
        vals = cand[["price_cents", "p_size"]].to_numpy()
        ok = np.ones(len(cand), dtype=bool)
        for i in range(len(cand)):
            p, s = vals[i]
            dom = ((vals[:, 0] <= p) & (vals[:, 1] >= s)
                   & ((vals[:, 0] < p) | (vals[:, 1] > s)))
            ok[i] = not dom.any()
        return typed_if_empty(cand[ok].reset_index(drop=True))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "p_partkey": batch["p_partkey"].astype("int64"),
            "price_cents": np.floor(batch["p_retailprice"] * 100
                                    + 0.5).astype("int64"),
            "p_size": batch["p_size"].astype("int64")})
        return typed_if_empty(frontier(out))

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return frontier(group[["p_partkey", "price_cents",
                               "p_size"]])

    local = (part_ds.select_columns(["p_partkey", "p_retailprice",
                                     "p_size"])
             .map_batches(project, batch_format="pandas")
             .map_batches(lambda b: b.assign(g=np.int64(0)),
                          batch_format="pandas"))
    return (local.groupby("g").map_groups(merge,
                                          batch_format="pandas"))


def small_qty_revenue(lineitem_ds, part_tbl: pa.Table,
                      brand: str = "Brand#23", frac_milli: int = 200,
                      num_parts: int = 128):
    """TPC-H Q17-shaped correlated-AVERAGE decorrelation: total
    revenue of lineitems whose quantity is below ``frac_milli``/1000
    of their part's average quantity, restricted to one brand —
    ``WHERE l_quantity < 0.2 * (SELECT avg(l_quantity) ... WHERE
    l_partkey = outer.l_partkey)``.  Like :func:`min_cost_supplier`,
    the per-part aggregate and the achieving-row filter run in ONE
    part-keyed exchange (no join-back shuffle); the brand's part-key
    set is a dimension broadcast (``ray.put`` once).

    Grid exactness: quantities land on int64 via the house half-up
    rule ``floor(q + 0.5)`` stated identically in the SQL twin (a
    bare ``.astype`` truncates while ``CAST`` rounds — divergent the
    moment a quantity is non-integral), so the fraction compare is
    pure integers — keep a row iff
    ``1000 * n * qty < frac_milli * sum_qty`` (both engines state the
    identical inequality; no division ever happens).  Revenue sums in
    integer cents; ``avg_weekly_cents`` = ``revenue_cents // 52``
    (floor division in both engines).  Output one row:
    ``(p_brand, n_small, revenue_cents, avg_weekly_cents)``.
    """
    import ray
    from doc_ocr_ray.util import coarse_part, typed_if_empty

    pdf = part_tbl.to_pandas()
    keys_ref = ray.put(frozenset(
        pdf.loc[pdf["p_brand"] == brand, "p_partkey"].astype(int)))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        b = batch[batch["l_partkey"].isin(keys)]
        out = pd.DataFrame({
            "p_partkey": b["l_partkey"].astype("int64"),
            "qty": np.floor(b["l_quantity"] + 0.5).astype("int64"),
            "cents": np.floor(b["l_extendedprice"] * 100 + 0.5)
                       .astype("int64")})
        out["part"] = coarse_part(out["p_partkey"], num_parts)
        return typed_if_empty(out)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group
        n = g.groupby("p_partkey", sort=False)["qty"].transform("size")
        s = g.groupby("p_partkey", sort=False)["qty"].transform("sum")
        keep = 1000 * n.to_numpy() * g["qty"].to_numpy() \
            < frac_milli * s.to_numpy()
        return pd.DataFrame({
            "n_small": [int(keep.sum())],
            "cents": [int(g["cents"].to_numpy()[keep].sum())],
            "g": np.int64(0)})

    def final(group: pd.DataFrame) -> pd.DataFrame:
        cents = int(group["cents"].sum())
        return pd.DataFrame({
            "p_brand": [brand],
            "n_small": [int(group["n_small"].sum())],
            "revenue_cents": [cents],
            "avg_weekly_cents": [cents // 52]})

    seed = _scalar_seed(n_small=0, cents=0, g=0)

    return (lineitem_ds
            .map_batches(project, batch_format="pandas")
            .groupby("part").map_groups(per_part, batch_format="pandas")
            .union(seed)
            .groupby("g").map_groups(final, batch_format="pandas"))


def late_supplier_blame(lineitem_ds, orders_ds, supplier_tbl: pa.Table,
                        grace_days: int = 90,
                        num_partitions: int | None = None,
                        num_parts: int = 128):
    """TPC-H Q21-shaped multi-EXISTS decorrelation: suppliers who were
    the SOLE late shipper of a finished multi-supplier order —
    ``EXISTS (another supplier in the order) AND NOT EXISTS (another
    LATE supplier in the order)``.  Both quantified subqueries
    decorrelate into ONE order-keyed exchange: each order group knows
    its distinct suppliers and its distinct late suppliers, so the
    blame condition is a group-local predicate (n_supp >= 2 and
    exactly one late supplier).  Late = shipped more than
    ``grace_days`` whole days after the order date (exact integer
    microseconds, the :func:`late_orders_by_priority` rule); order
    status filters to 'F' BEFORE the native hash join.  Supplier
    names resolve from the broadcast dimension.  Output:
    ``(s_name, numwait)`` for suppliers with numwait > 0.

    Join-input hygiene: both sides carry their timestamps as int64
    epoch microseconds so the ``sentinel_if_empty`` + ``_join_seed``
    pair (the hash-shuffle schema-broadcast rule — see
    ``util.sentinel_if_empty``) stays all-integer; a status filter
    that empties a block (or an all-'O' corpus) must not feed the
    join a schema-less zero-row block."""
    import ray
    from doc_ocr_ray.util import (coarse_part, sentinel_if_empty,
                                  typed_if_empty)

    if num_partitions is None:
        num_partitions = default_join_partitions()
    grace_us = np.int64(grace_days) * 86_400_000_000
    sup = supplier_tbl.to_pandas()
    names_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                                 sup["s_name"])))

    def ord_prep(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["o_orderstatus"] == "F"]
        # NaT guard (the market_share/profit discipline): a NULL
        # order date casts to INT64_MIN epoch-us and would mark every
        # shipment late; the SQL twin's NULL comparison marks none
        b = b[b["o_orderdate"].notna()]
        out = pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype("int64").to_numpy(),
            "odate_us": b["o_orderdate"].to_numpy()
            .astype("datetime64[us]").astype("int64")})
        return sentinel_if_empty(out, o_orderkey=-3, odate_us=0)

    def li_prep(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "l_orderkey": batch["l_orderkey"].astype("int64").to_numpy(),
            "l_suppkey": batch["l_suppkey"].astype("int64").to_numpy(),
            "ship_us": batch["l_shipdate"].to_numpy()
            .astype("datetime64[us]").astype("int64")})
        return sentinel_if_empty(out, l_orderkey=-2, l_suppkey=-1,
                                 ship_us=0)

    finished = _join_seed(
        orders_ds.map_batches(ord_prep, batch_format="pandas"),
        o_orderkey=-3, odate_us=0)
    li = _join_seed(
        lineitem_ds.select_columns(
            ["l_orderkey", "l_suppkey", "l_shipdate"])
        .map_batches(li_prep, batch_format="pandas"),
        l_orderkey=-2, l_suppkey=-1, ship_us=0)

    joined = li.join(finished, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    _empty = pd.DataFrame({
        "o_orderkey": pd.Series([], dtype="int64"),
        "s_suppkey": pd.Series([], dtype="int64"),
        "late": pd.Series([], dtype="int64"),
        "part": pd.Series([], dtype="int64")})

    def flags(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "ship_us" not in batch.columns:
            return typed_if_empty(_empty)
        ship = batch["ship_us"].to_numpy()
        odate = batch["odate_us"].to_numpy()
        out = pd.DataFrame({
            "o_orderkey": batch["l_orderkey"].astype("int64"),
            "s_suppkey": batch["l_suppkey"].astype("int64"),
            "late": (ship > odate + grace_us).astype("int64")})
        # in-batch combiner: distinct (order, supplier, late) triples
        out = out.drop_duplicates()
        out["part"] = coarse_part(out["o_orderkey"], num_parts)
        return typed_if_empty(out)

    def blame(group: pd.DataFrame) -> pd.DataFrame:
        d = group.drop_duplicates(["o_orderkey", "s_suppkey", "late"])
        agg = d.groupby("o_orderkey").agg(
            n_supp=("s_suppkey", "nunique"))
        late = d[d["late"] == 1].groupby("o_orderkey").agg(
            n_late=("s_suppkey", "nunique"),
            who=("s_suppkey", "min"))
        m = agg.join(late, how="inner")
        hit = m[(m["n_supp"] >= 2) & (m["n_late"] == 1)]
        out = pd.DataFrame({"s_suppkey": hit["who"].astype("int64")})
        out["part"] = coarse_part(out["s_suppkey"], num_parts)
        return typed_if_empty(out)

    def count_names(group: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(names_ref)
        c = (group.groupby("s_suppkey", sort=False)
             .size().reset_index(name="numwait"))
        nm = c["s_suppkey"].map(names)
        c, nm = c[nm.notna()], nm[nm.notna()]
        return typed_if_empty(pd.DataFrame({
            "s_name": nm.astype(object),
            "numwait": c["numwait"].astype("int64")}))

    return (joined.map_batches(flags, batch_format="pandas")
            .groupby("part").map_groups(blame, batch_format="pandas")
            .groupby("part").map_groups(count_names,
                                        batch_format="pandas"))


def forecast_revenue(lineitem_ds, year: int = 1996,
                     disc_lo_c: int = 5, disc_hi_c: int = 7,
                     qty_max: float = 24.0):
    """TPC-H Q6-shaped forecast-revenue scalar: SUM(extendedprice *
    discount) over a one-year shipdate window, a discount band and a
    quantity ceiling — the pure filter-then-sum shape where EVERYTHING
    pushes below the (nonexistent) shuffle: one stateless pass emits a
    single int64 partial per batch and one trivial combine finishes.

    The discount band compares on the integer cents grid
    (``floor(d*100+0.5) BETWEEN lo AND hi``) stated identically in the
    SQL twin — comparing raw doubles against 0.05/0.07 literals would
    be exact too, but the grid keeps the predicate obviously
    engine-neutral.  Revenue accumulates on the ten-thousandths grid
    (per-row products are identical doubles in both engines; ints sum
    order-free).  Output: one row ``(revenue)``.

    Scale shape: no exchange at all; driver sees one row."""
    from doc_ocr_ray.util import typed_if_empty

    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")
    empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                          "tenk": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d_c = np.floor(batch["l_discount"] * 100 + 0.5).astype("int64")
        keep = (batch["l_shipdate"].notna()
                & (batch["l_shipdate"] >= lo) & (batch["l_shipdate"] < hi)
                & (d_c >= disc_lo_c) & (d_c <= disc_hi_c)
                & (batch["l_quantity"] < qty_max))
        b = batch.loc[keep]
        if not len(b):
            return typed_if_empty(empty)
        tenk = np.floor(b["l_extendedprice"] * b["l_discount"] * 10000
                        + 0.5).astype("int64").sum()
        return pd.DataFrame({"k": [0], "tenk": [int(tenk)]})

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"revenue": [int(group["tenk"].sum()) / 10000.0]})

    seed = _scalar_seed(k=0, tenk=0)

    return (lineitem_ds.map_batches(partial, batch_format="pandas")
            .union(seed)
            .groupby("k").map_groups(final, batch_format="pandas"))


def nation_trade_volume(lineitem_ds, orders_ds, customer_ds,
                        supplier_tbl: pa.Table, nation_tbl: pa.Table,
                        nation_a: str = "NATION_1",
                        nation_b: str = "NATION_2",
                        lo: str = "1996-01-01", hi: str = "1998-01-01",
                        num_partitions: int | None = None):
    """TPC-H Q7-shaped bilateral trade volume: revenue shipped between
    two named nations per shipment year, in both directions — supplier
    nation from a PRUNED broadcast (only the two nations' suppliers
    ride ``ray.put``), customer nation through the Q5 native-join
    chain (orders⋈customer then lineitem⋈that, both hash-shuffled,
    neither broadcast).  The lineitem filter drops rows outside the
    shipdate window AND rows whose supplier is in neither nation
    BEFORE the corpus join, so only candidate rows ride the exchange.

    Output: ``(supp_nation, cust_nation, l_year, revenue)`` for the
    two ordered direction pairs; revenue on the ten-thousandths grid,
    ``l_year`` = calendar year of ``l_shipdate`` (pandas ``dt.year``
    == DuckDB ``year()``)."""
    import ray

    from doc_ocr_ray.util import sentinel_if_empty, typed_if_empty

    if num_partitions is None:
        num_partitions = default_join_partitions()
    nat = nation_tbl.to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    key_of = {v: k for k, v in names.items()}
    ka, kb = key_of[nation_a], key_of[nation_b]
    sup = supplier_tbl.to_pandas()
    sup = sup[sup["s_nationkey"].isin((ka, kb))]
    sup_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                               sup["s_nationkey"].astype(int))))
    lo_ts, hi_ts = pd.Timestamp(lo), pd.Timestamp(hi)

    def cust_filter(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.loc[batch["c_nationkey"].isin((ka, kb)),
                        ["c_custkey"]].copy()
        out["c_nat"] = batch.loc[out.index, "c_nationkey"].astype("int64")
        return sentinel_if_empty(out.reset_index(drop=True),
                                 c_custkey=-2, c_nat=-9)

    def li_filter(batch: pd.DataFrame) -> pd.DataFrame:
        s_nat = batch["l_suppkey"].map(ray.get(sup_ref))
        keep = (s_nat.notna() & batch["l_shipdate"].notna()
                & (batch["l_shipdate"] >= lo_ts)
                & (batch["l_shipdate"] < hi_ts))
        b = batch.loc[keep]
        out = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].astype("int64").to_numpy(),
            "s_nat": s_nat[keep].astype("int64").to_numpy(),
            "l_year": b["l_shipdate"].dt.year.astype("int64").to_numpy(),
            "cents": revenue_cents(b["l_extendedprice"], b["l_discount"]),
        })
        return sentinel_if_empty(out, l_orderkey=-4, s_nat=-9,
                                 l_year=0, cents=0)

    # sentinel topology (see shipping_priority): the oc pair gets one
    # matched seed so the stream into join 2 is never empty; the li
    # sentinel matches no real order.
    cust = _join_seed(
        customer_ds.map_batches(cust_filter, batch_format="pandas"),
        c_custkey=-1, c_nat=-9)
    orders = _join_seed(
        orders_ds.select_columns(["o_orderkey", "o_custkey"]),
        o_orderkey=-3, o_custkey=-1)
    li = _join_seed(
        lineitem_ds.map_batches(li_filter, batch_format="pandas"),
        l_orderkey=-4, s_nat=-9, l_year=0, cents=0)

    oc = orders.join(cust, join_type="inner",
                     num_partitions=num_partitions,
                     on=("o_custkey",), right_on=("c_custkey",))
    joined = li.join(oc, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    empty = pd.DataFrame({
        "s_nat": pd.Series([], dtype="int64"),
        "c_nat": pd.Series([], dtype="int64"),
        "l_year": pd.Series([], dtype="int64"),
        "sum_tenk": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "cents" not in batch.columns:
            return typed_if_empty(empty)
        keep = (((batch["s_nat"] == ka) & (batch["c_nat"] == kb))
                | ((batch["s_nat"] == kb) & (batch["c_nat"] == ka)))
        b = batch.loc[keep]
        if not len(b):
            return typed_if_empty(empty)
        g = (b.groupby(["s_nat", "c_nat", "l_year"], sort=False)["cents"]
             .sum().reset_index(name="sum_tenk"))
        g["sum_tenk"] = g["sum_tenk"].astype("int64")
        return g

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "supp_nation": [names[int(group["s_nat"].iloc[0])]],
            "cust_nation": [names[int(group["c_nat"].iloc[0])]],
            "l_year": [int(group["l_year"].iloc[0])],
            "revenue": [int(group["sum_tenk"].sum()) / 10000.0],
        })

    return (joined.map_batches(partial, batch_format="pandas")
            .groupby(["s_nat", "c_nat", "l_year"])
            .map_groups(final, batch_format="pandas"))


def market_share(lineitem_ds, orders_ds, customer_ds,
                 supplier_tbl: pa.Table, nation_tbl: pa.Table,
                 region_tbl: pa.Table, part_tbl: pa.Table,
                 nation: str = "NATION_3", region: str = "ASIA",
                 p_type: str = "PROMO",
                 lo: str = "1995-01-01", hi: str = "1997-01-01",
                 num_partitions: int | None = None):
    """TPC-H Q8-shaped national market share: the target nation's
    share of revenue per order year, within one region's customer
    market and one part type.  The part predicate resolves to a
    broadcast partkey SET (one p_type slice — 1/|types| of part, the
    classic pushdown that turns a corpus join into a membership
    filter; at 100 TB that slice is SF x ~33k keys of int64, still a
    broadcast), supplier nation rides a second broadcast, and the
    corpus-sized joins (orders⋈region-customers, lineitem⋈that) run
    through Ray Data's native hash shuffle.

    The share itself is DIVISION-FREE until the last step: per-year
    numerator/denominator accumulate as ten-thousandths ints and the
    output is integer basis points ``(10000 * nation_vol) //
    total_vol`` — DuckDB ``//`` truncates toward zero, which equals
    floor on these non-negative sums, so the twin is bit-exact.
    Output: ``(o_year, mkt_share_bp)``."""
    import ray

    from doc_ocr_ray.util import sentinel_if_empty, typed_if_empty

    if num_partitions is None:
        num_partitions = default_join_partitions()
    nat = nation_tbl.to_pandas()
    reg = region_tbl.to_pandas()
    key_of = dict(zip(nat["n_name"], nat["n_nationkey"].astype(int)))
    target = key_of[nation]
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"]
    region_nations = frozenset(
        int(k) for k in nat.loc[nat["n_regionkey"].isin(set(rkey)),
                                "n_nationkey"])
    part = part_tbl.to_pandas()
    part_ref = ray.put(frozenset(
        int(k) for k in part.loc[part["p_type"] == p_type, "p_partkey"]))
    sup = supplier_tbl.to_pandas()
    sup_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                               sup["s_nationkey"].astype(int))))
    lo_ts, hi_ts = pd.Timestamp(lo), pd.Timestamp(hi)

    def cust_filter(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.loc[batch["c_nationkey"].isin(region_nations),
                        ["c_custkey"]]
        return sentinel_if_empty(out.reset_index(drop=True), c_custkey=-2)

    def ord_filter(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["o_orderdate"].notna()
                & (batch["o_orderdate"] >= lo_ts)
                & (batch["o_orderdate"] < hi_ts))
        b = batch.loc[keep]
        out = pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype("int64").to_numpy(),
            "o_custkey": b["o_custkey"].astype("int64").to_numpy(),
            "o_year": b["o_orderdate"].dt.year.astype("int64").to_numpy()})
        return sentinel_if_empty(out, o_orderkey=-3, o_custkey=-1, o_year=0)

    def li_filter(batch: pd.DataFrame) -> pd.DataFrame:
        pk = ray.get(part_ref)
        s_nat = batch["l_suppkey"].map(ray.get(sup_ref))
        keep = batch["l_partkey"].isin(pk) & s_nat.notna()
        b = batch.loc[keep]
        out = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].astype("int64").to_numpy(),
            "s_nat": s_nat[keep].astype("int64").to_numpy(),
            "cents": revenue_cents(b["l_extendedprice"], b["l_discount"])})
        return sentinel_if_empty(out, l_orderkey=-4, s_nat=-9, cents=0)

    cust = _join_seed(
        customer_ds.map_batches(cust_filter, batch_format="pandas"),
        c_custkey=-1)
    orders = _join_seed(
        orders_ds.map_batches(ord_filter, batch_format="pandas"),
        o_orderkey=-3, o_custkey=-1, o_year=0)
    li = _join_seed(
        lineitem_ds.map_batches(li_filter, batch_format="pandas"),
        l_orderkey=-4, s_nat=-9, cents=0)

    oc = orders.join(cust, join_type="inner",
                     num_partitions=num_partitions,
                     on=("o_custkey",), right_on=("c_custkey",))
    joined = li.join(oc, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    empty = pd.DataFrame({
        "o_year": pd.Series([], dtype="int64"),
        "nat_tenk": pd.Series([], dtype="int64"),
        "tot_tenk": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "cents" not in batch.columns:
            return typed_if_empty(empty)
        b = batch.loc[batch["o_year"] > 0]
        if not len(b):
            return typed_if_empty(empty)
        nat_c = np.where(b["s_nat"] == target, b["cents"], 0)
        g = (b.assign(nat_tenk=nat_c, tot_tenk=b["cents"])
             .groupby("o_year", sort=False)[["nat_tenk", "tot_tenk"]]
             .sum().reset_index())
        for c in ("o_year", "nat_tenk", "tot_tenk"):
            g[c] = g[c].astype("int64")
        return g

    def final(group: pd.DataFrame) -> pd.DataFrame:
        nat_s = int(group["nat_tenk"].sum())
        tot_s = int(group["tot_tenk"].sum())
        # tot == 0 (every matched row on revenue-grid zero): DuckDB
        # integer // 0 yields NULL, so emit a null, not a crash
        share = (10000 * nat_s) // tot_s if tot_s else None
        return pd.DataFrame({
            "o_year": [int(group["o_year"].iloc[0])],
            "mkt_share_bp": pd.array([share], dtype="Int64"),
        })

    return (joined.map_batches(partial, batch_format="pandas")
            .groupby("o_year").map_groups(final, batch_format="pandas"))


def profit_by_nation_year(lineitem_ds, orders_ds,
                          supplier_tbl: pa.Table, nation_tbl: pa.Table,
                          part_tbl: pa.Table,
                          name_contains: str = "widget",
                          num_partitions: int | None = None):
    """TPC-H Q9-shaped product-type profit per (supplier nation,
    order year).  The schema carries no partsupp table, so supply
    cost is the stated proxy ``0.1 * p_retailprice`` per unit —
    profit = revenue (ten-thousandths grid) minus
    ``floor(l_quantity * p_retailprice * 1000 + 0.5)`` (the same
    grid: 0.1 x retail x 10000 = retail x 1000), every per-row term
    an identical double in both engines, all sums integer.

    The part-name predicate prunes the broadcast: only matching
    parts' ``(partkey -> retail)`` rides ``ray.put`` (the Q9 LIKE
    keeps ~1/|nouns| of part).  Supplier nation is the second
    broadcast; the one corpus-sized join (lineitem⋈orders for the
    order year) is native hash shuffle.  Output:
    ``(n_name, o_year, profit)``."""
    import ray

    from doc_ocr_ray.util import sentinel_if_empty, typed_if_empty

    if num_partitions is None:
        num_partitions = default_join_partitions()
    nat = nation_tbl.to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    part = part_tbl.to_pandas()
    part = part[part["p_name"].str.contains(name_contains, regex=False)]
    part_ref = ray.put(dict(zip(part["p_partkey"].astype(int),
                                part["p_retailprice"].astype(float))))
    sup = supplier_tbl.to_pandas()
    sup_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                               sup["s_nationkey"].astype(int))))

    def li_filter(batch: pd.DataFrame) -> pd.DataFrame:
        retail = batch["l_partkey"].map(ray.get(part_ref))
        s_nat = batch["l_suppkey"].map(ray.get(sup_ref))
        keep = retail.notna() & s_nat.notna()
        b = batch.loc[keep]
        rev = revenue_cents(b["l_extendedprice"], b["l_discount"])
        cost = np.floor(b["l_quantity"] * retail[keep] * 1000
                        + 0.5).astype("int64")
        out = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].astype("int64").to_numpy(),
            "s_nat": s_nat[keep].astype("int64").to_numpy(),
            "profit_tenk": (rev - cost.to_numpy()),
        })
        return sentinel_if_empty(out, l_orderkey=-4, s_nat=-9,
                                 profit_tenk=0)

    def ord_prep(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.loc[batch["o_orderdate"].notna()]
        out = pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype("int64").to_numpy(),
            "o_year": b["o_orderdate"].dt.year.astype("int64").to_numpy()})
        return sentinel_if_empty(out, o_orderkey=-3, o_year=0)

    li = _join_seed(
        lineitem_ds.map_batches(li_filter, batch_format="pandas"),
        l_orderkey=-4, s_nat=-9, profit_tenk=0)
    orders = _join_seed(
        orders_ds.map_batches(ord_prep, batch_format="pandas"),
        o_orderkey=-4, o_year=0)

    joined = li.join(orders, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    empty = pd.DataFrame({
        "s_nat": pd.Series([], dtype="int64"),
        "o_year": pd.Series([], dtype="int64"),
        "sum_tenk": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "profit_tenk" not in batch.columns:
            return typed_if_empty(empty)
        b = batch.loc[batch["s_nat"] >= 0]
        if not len(b):
            return typed_if_empty(empty)
        g = (b.groupby(["s_nat", "o_year"], sort=False)["profit_tenk"]
             .sum().reset_index(name="sum_tenk"))
        for c in ("s_nat", "o_year", "sum_tenk"):
            g[c] = g[c].astype("int64")
        return g

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_name": [names[int(group["s_nat"].iloc[0])]],
            "o_year": [int(group["o_year"].iloc[0])],
            "profit": [int(group["sum_tenk"].sum()) / 10000.0],
        })

    return (joined.map_batches(partial, batch_format="pandas")
            .groupby(["s_nat", "o_year"])
            .map_groups(final, batch_format="pandas"))


def returned_item_customers(lineitem_ds, orders_ds, customer_ds,
                            nation_tbl: pa.Table,
                            lo: str = "1996-01-01", hi: str = "1996-07-01",
                            k: int = 20,
                            num_partitions: int | None = None):
    """TPC-H Q10-shaped returned-item losses: the top-k customers by
    revenue on RETURNED lineitems within an order-date window.  Both
    fact filters push below the native hash join (``l_returnflag='R'``
    prunes lineitem, the date window prunes orders); per-customer
    revenue combines on a coarse 256-way key; each partition forwards
    only its local top-k; and the <=k winners — a DRIVER-BOUNDED set
    by construction — broadcast back as a ``{custkey: cents}`` dict so
    the customer annotation (name, balance, nation) is one shuffle-free
    membership pass over the customer table, never a third join.

    Output: ``(c_custkey, c_name, revenue, c_acctbal, n_name)``; ties
    at the k boundary break by ascending custkey in both engines."""
    import ray

    from doc_ocr_ray.util import (coarse_part, sentinel_if_empty,
                                  typed_if_empty)

    if num_partitions is None:
        num_partitions = default_join_partitions()
    nat = nation_tbl.to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    lo_ts, hi_ts = pd.Timestamp(lo), pd.Timestamp(hi)

    def li_filter(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.loc[batch["l_returnflag"] == "R"]
        out = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].astype("int64").to_numpy(),
            "cents": revenue_cents(b["l_extendedprice"], b["l_discount"])})
        return sentinel_if_empty(out, l_orderkey=-4, cents=0)

    def ord_filter(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["o_orderdate"].notna()
                & (batch["o_orderdate"] >= lo_ts)
                & (batch["o_orderdate"] < hi_ts))
        out = batch.loc[keep, ["o_orderkey", "o_custkey"]].astype("int64")
        return sentinel_if_empty(out.reset_index(drop=True),
                                 o_orderkey=-3, o_custkey=-1)

    li = _join_seed(
        lineitem_ds.map_batches(li_filter, batch_format="pandas"),
        l_orderkey=-4, cents=0)
    orders = _join_seed(
        orders_ds.map_batches(ord_filter, batch_format="pandas"),
        o_orderkey=-4, o_custkey=-1)

    joined = li.join(orders, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    empty = pd.DataFrame({
        "o_custkey": pd.Series([], dtype="int64"),
        "sum_cents": pd.Series([], dtype="int64"),
        "part": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "cents" not in batch.columns:
            return typed_if_empty(empty)
        b = batch.loc[batch["o_custkey"] >= 0]
        if not len(b):
            return typed_if_empty(empty)
        g = (b.groupby("o_custkey", sort=False)["cents"].sum()
             .reset_index(name="sum_cents"))
        g["sum_cents"] = g["sum_cents"].astype("int64")
        g["part"] = coarse_part(g["o_custkey"], 256)
        return g

    def combine_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("o_custkey", sort=False)["sum_cents"].sum()
             .reset_index())
        g = g.sort_values(["sum_cents", "o_custkey"],
                          ascending=[False, True]).head(k)
        g["sum_cents"] = g["sum_cents"].astype("int64")
        return g[["o_custkey", "sum_cents"]]

    top = (joined.map_batches(partial, batch_format="pandas")
           .groupby("part").map_groups(combine_topk, batch_format="pandas")
           .sort(["sum_cents", "o_custkey"], descending=[True, False])
           .limit(k).take_all())          # bounded at k rows
    rev = {int(r["o_custkey"]): int(r["sum_cents"]) for r in top}
    rev_ref = ray.put(rev)

    def annotate(batch: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(rev_ref)
        b = batch.loc[batch["c_custkey"].isin(r.keys())]
        return typed_if_empty(pd.DataFrame({
            "c_custkey": b["c_custkey"].astype("int64").to_numpy(),
            "c_name": b["c_name"].astype(object).to_numpy(),
            "revenue": np.array([r[int(ck)] / 10000.0
                                 for ck in b["c_custkey"]], dtype="float64"),
            "c_acctbal": b["c_acctbal"].astype("float64").to_numpy(),
            "n_name": b["c_nationkey"].map(names).astype(object).to_numpy(),
        }))

    return customer_ds.map_batches(annotate, batch_format="pandas")


def top_supplier(lineitem_ds, supplier_tbl: pa.Table,
                 lo: str = "1996-01-01", hi: str = "1996-04-01"):
    """TPC-H Q15-shaped top supplier: the supplier(s) achieving the
    GLOBAL maximum revenue over a shipdate window — the
    aggregate-then-achievers shape where the "join back" is a single
    broadcast scalar, never a shuffle.  Per-supplier revenue combines
    exactly on a coarse key; the global max reduces through per-batch
    partial maxima (one row per batch to the driver); achieving rows
    filter shuffle-free and take their names from the broadcast
    supplier dimension.  Revenue on the ten-thousandths grid, so
    "equals max" is integer equality — no float-tie hazard.  Output:
    ``(s_suppkey, s_name, total_revenue)``."""
    import ray

    from doc_ocr_ray.util import coarse_part, typed_if_empty

    sup = supplier_tbl.to_pandas()
    names_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                                 sup["s_name"])))
    lo_ts, hi_ts = pd.Timestamp(lo), pd.Timestamp(hi)

    empty = pd.DataFrame({
        "l_suppkey": pd.Series([], dtype="int64"),
        "sum_tenk": pd.Series([], dtype="int64"),
        "part": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["l_shipdate"].notna()
                & (batch["l_shipdate"] >= lo_ts)
                & (batch["l_shipdate"] < hi_ts))
        b = batch.loc[keep]
        if not len(b):
            return typed_if_empty(empty)
        g = (b.assign(tenk=revenue_cents(b["l_extendedprice"],
                                         b["l_discount"]))
             .groupby("l_suppkey", sort=False)["tenk"].sum()
             .reset_index(name="sum_tenk"))
        g["l_suppkey"] = g["l_suppkey"].astype("int64")
        g["sum_tenk"] = g["sum_tenk"].astype("int64")
        g["part"] = coarse_part(g["l_suppkey"], 256)
        return g

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("l_suppkey", sort=False)["sum_tenk"].sum()
             .reset_index())
        g["sum_tenk"] = g["sum_tenk"].astype("int64")
        return g[["l_suppkey", "sum_tenk"]]

    totals = (lineitem_ds.map_batches(partial, batch_format="pandas")
              .groupby("part").map_groups(combine, batch_format="pandas")
              .materialize())       # consumed twice: max scan + filter

    def batch_max(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"mx": pd.Series([], dtype="int64")})
        return pd.DataFrame({"mx": [int(batch["sum_tenk"].max())]})

    cand = totals.map_batches(batch_max, batch_format="pandas").take_all()
    # a window matching no lineitems has no per-supplier totals: the
    # SQL twin's achievers filter returns 0 rows, so use a max no
    # real total equals (totals is empty anyway; belt and braces)
    mx = max((int(r["mx"]) for r in cand), default=None)

    def achievers(batch: pd.DataFrame) -> pd.DataFrame:
        nm = ray.get(names_ref)
        b = (batch.loc[batch["sum_tenk"] == mx] if mx is not None
             else batch.iloc[0:0])
        return typed_if_empty(pd.DataFrame({
            "s_suppkey": b["l_suppkey"].astype("int64").to_numpy(),
            "s_name": b["l_suppkey"].map(nm).astype(object).to_numpy(),
            "total_revenue": (b["sum_tenk"] / 10000.0).to_numpy(),
        }))

    return totals.map_batches(achievers, batch_format="pandas")


def disjunctive_revenue(lineitem_ds, part_tbl: pa.Table,
                        preds=(("Brand#12", 1, 15, 1.0, 11.0),
                               ("Brand#23", 1, 25, 10.0, 20.0),
                               ("Brand#3", 1, 50, 20.0, 30.0))):
    """TPC-H Q19-shaped disjunctive-predicate revenue: SUM of
    discounted price where ANY of several (brand, size range,
    quantity range) conjunctions holds — the multi-clause OR that
    defeats naive pushdown.  The part side prunes to the predicate
    brands and broadcasts ``partkey -> (brand, size)`` once via
    ``ray.put`` (a few brands of part — SF x ~24k keys); each batch
    evaluates the whole disjunction vectorized and emits one int64
    partial.  No shuffle anywhere.  Output: one row ``(revenue)``."""
    import ray

    from doc_ocr_ray.util import typed_if_empty

    brands = frozenset(p[0] for p in preds)
    part = part_tbl.to_pandas()
    part = part[part["p_brand"].isin(brands)]
    part_ref = ray.put({int(k): (b, int(s)) for k, b, s in
                        zip(part["p_partkey"], part["p_brand"],
                            part["p_size"])})

    empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                          "tenk": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        pm = ray.get(part_ref)
        meta = batch["l_partkey"].map(pm)
        hit = meta.notna()
        b = batch.loc[hit]
        if not len(b):
            return typed_if_empty(empty)
        brand = meta[hit].str[0]
        size = meta[hit].str[1].astype("int64")
        qty = b["l_quantity"]
        mask = np.zeros(len(b), dtype=bool)
        for pb, slo, shi, qlo, qhi in preds:
            mask |= ((brand == pb) & (size >= slo) & (size <= shi)
                     & (qty >= qlo) & (qty <= qhi)).to_numpy()
        b = b.loc[mask]
        if not len(b):
            return typed_if_empty(empty)
        tenk = revenue_cents(b["l_extendedprice"], b["l_discount"]).sum()
        return pd.DataFrame({"k": [0], "tenk": [int(tenk)]})

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"revenue": [int(group["tenk"].sum()) / 10000.0]})

    seed = _scalar_seed(k=0, tenk=0)

    return (lineitem_ds.map_batches(partial, batch_format="pandas")
            .union(seed)
            .groupby("k").map_groups(final, batch_format="pandas"))


def idle_rich_customers(customer_ds, orders_ds,
                        since: str = "1999-01-01",
                        num_partitions: int | None = None):
    """TPC-H Q22-shaped idle-capital report: per nation, the count and
    total balance of customers whose balance exceeds the global
    average POSITIVE balance and who placed no order since a cutoff.
    Two classic decorrelations in one operator: the scalar subquery
    (global average) reduces to ONE broadcast (n, sum_cents) pair and
    the filter is the division-free cross-multiply ``cents * n >
    sum_cents`` (no average is ever computed — the SQL twin states the
    same inequality, so no rounding grid exists); the NOT EXISTS
    becomes Ray Data's native ``left_anti`` hash join against the
    recent-order custkeys (corpus-sized — never broadcast), with an
    in-batch distinct combiner shrinking the right side first.

    Anti-join sentinel topology: per-batch sentinels on the LEFT
    survive an anti join by construction (nothing matches them), so
    the final aggregate drops negative keys; the right side seeds one
    ``-1`` row that matches the left's ``-1`` seed and annihilates it.
    Output: ``(c_nationkey, numcust, totacctbal)``.

    Overflow envelope: ``cents * n`` with balance cents ~1e6 stays
    within int64 up to ~9e12 customers — beyond any real corpus."""
    from doc_ocr_ray.util import sentinel_if_empty, typed_if_empty

    if num_partitions is None:
        num_partitions = default_join_partitions()
    since_ts = pd.Timestamp(since)

    # pass 1: global (n, sum_cents) over positive balances
    def stat_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.loc[batch["c_acctbal"] > 0.0]
        if not len(b):
            return typed_if_empty(pd.DataFrame({
                "k": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64")}))
        cents = np.floor(b["c_acctbal"] * 100 + 0.5).astype("int64")
        return pd.DataFrame({"k": [0], "n": [len(b)],
                             "s": [int(cents.sum())]})

    def stat_final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(group["n"].sum())],
                             "s": [int(group["s"].sum())]})

    stats = (customer_ds.map_batches(stat_partial, batch_format="pandas")
             .groupby("k").map_groups(stat_final, batch_format="pandas")
             .take_all())
    # no positive balances at all: every stat partial is a typed
    # empty, the groupby has no groups and stats is [] — then no
    # customer can exceed the (vacuous) average, same as the twin
    n_pos = int(stats[0]["n"]) if stats else 0
    s_pos = int(stats[0]["s"]) if stats else 0

    def rich_filter(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(batch["c_acctbal"] * 100 + 0.5).astype("int64")
        keep = (cents * n_pos) > s_pos
        b = batch.loc[keep]
        out = pd.DataFrame({
            "c_custkey": b["c_custkey"].astype("int64").to_numpy(),
            "c_nationkey": b["c_nationkey"].astype("int64").to_numpy(),
            "cents": cents[keep].to_numpy()})
        return sentinel_if_empty(out, c_custkey=-2, c_nationkey=-9, cents=0)

    def recent_orders(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["o_orderdate"].notna()
                & (batch["o_orderdate"] >= since_ts))
        out = (batch.loc[keep, ["o_custkey"]].astype("int64")
               .drop_duplicates())          # in-batch distinct combiner
        return sentinel_if_empty(out.reset_index(drop=True), o_custkey=-1)

    rich = _join_seed(
        customer_ds.map_batches(rich_filter, batch_format="pandas"),
        c_custkey=-1, c_nationkey=-9, cents=0)
    recent = _join_seed(
        orders_ds.map_batches(recent_orders, batch_format="pandas"),
        o_custkey=-1)

    idle = rich.join(recent, join_type="left_anti",
                     num_partitions=num_partitions,
                     on=("c_custkey",), right_on=("o_custkey",))

    empty = pd.DataFrame({
        "c_nationkey": pd.Series([], dtype="int64"),
        "numcust": pd.Series([], dtype="int64"),
        "sum_cents": pd.Series([], dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "cents" not in batch.columns:
            return typed_if_empty(empty)
        b = batch.loc[batch["c_custkey"] >= 0]
        if not len(b):
            return typed_if_empty(empty)
        g = (b.groupby("c_nationkey", sort=False)
             .agg(numcust=("cents", "size"), sum_cents=("cents", "sum"))
             .reset_index())
        for c in ("c_nationkey", "numcust", "sum_cents"):
            g[c] = g[c].astype("int64")
        return g

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_nationkey": [int(group["c_nationkey"].iloc[0])],
            "numcust": [int(group["numcust"].sum())],
            "totacctbal": [int(group["sum_cents"].sum()) / 100.0],
        })

    return (idle.map_batches(partial, batch_format="pandas")
            .groupby("c_nationkey").map_groups(final, batch_format="pandas"))


def shipmode_priority_counts(orders_ds, lineitem_ds,
                             year: int = 1996,
                             num_partitions: int | None = None):
    """TPC-H Q12-shaped conditional counts after a pruned join: per
    line status (the schema's stand-in for ship mode — no l_shipmode
    column exists), count lineitems shipped in ``year`` whose order
    is high priority (1-URGENT / 2-HIGH) vs everything else.

    Scale shape: the date-window filter pushes BELOW the join (only
    the year's lineitems enter the hash shuffle — the whole point of
    Q12), both sides are corpus-sized so the join is Ray Data's
    NATIVE hash join (neither side broadcast), and each joined batch
    collapses to at most |statuses| partial-count rows before one
    tiny status-keyed combine.  All counts are int64; no grid exists.
    Output: ``(l_linestatus, high_line_count, low_line_count)``.

    Join-input hygiene: the year filter can empty a block (or, for a
    window outside the corpus, EVERY block), so the filtered side
    follows the ``sentinel_if_empty`` + ``_join_seed`` rule (see
    ``util.sentinel_if_empty``); the orders side gets the seed too in
    case the orders read itself arrives with zero blocks.
    """
    from doc_ocr_ray.util import sentinel_if_empty, typed_if_empty

    if num_partitions is None:
        num_partitions = default_join_partitions()
    lo = np.datetime64(f"{year}-01-01", "us").astype("int64")
    hi = np.datetime64(f"{year + 1}-01-01", "us").astype("int64")

    def in_year(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            out = batch[["l_orderkey", "l_linestatus"]]
        else:
            ship = batch["l_shipdate"].to_numpy().astype(
                "datetime64[us]").astype("int64")
            out = batch.loc[(ship >= lo) & (ship < hi),
                            ["l_orderkey", "l_linestatus"]]
        return sentinel_if_empty(out.reset_index(drop=True),
                                 l_orderkey=-2, l_linestatus="~S~")

    joined = (_join_seed(
                  lineitem_ds
                  .select_columns(["l_orderkey", "l_linestatus",
                                   "l_shipdate"])
                  .map_batches(in_year, batch_format="pandas"),
                  l_orderkey=-2, l_linestatus="~S~")
              .join(_join_seed(orders_ds.select_columns(
                        ["o_orderkey", "o_orderpriority"]),
                        o_orderkey=-3, o_orderpriority="~S~"),
                    join_type="inner",
                    num_partitions=num_partitions,
                    on=("l_orderkey",), right_on=("o_orderkey",)))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "l_linestatus": pd.Series([], dtype="object"),
            "high": pd.Series([], dtype="int64"),
            "low": pd.Series([], dtype="int64")})
        if batch.empty or "o_orderpriority" not in batch.columns:
            return typed_if_empty(empty)
        hi_mask = batch["o_orderpriority"].isin(
            ["1-URGENT", "2-HIGH"]).to_numpy()
        g = (pd.DataFrame({"l_linestatus": batch["l_linestatus"],
                           "high": hi_mask.astype("int64"),
                           "low": (~hi_mask).astype("int64")})
             .groupby("l_linestatus", sort=False)[["high", "low"]]
             .sum().reset_index())
        g["high"] = g["high"].astype("int64")
        g["low"] = g["low"].astype("int64")
        return typed_if_empty(g)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_linestatus": [group["l_linestatus"].iloc[0]],
            "high_line_count": [int(group["high"].sum())],
            "low_line_count": [int(group["low"].sum())]})

    return (joined.map_batches(partial, batch_format="pandas")
            .groupby("l_linestatus").map_groups(
                final, batch_format="pandas"))


def important_parts(lineitem_ds, ppm: int = 500, num_parts: int = 128):
    """TPC-H Q11-shaped global-fraction gate: parts whose total
    discounted revenue strictly exceeds ``ppm``/1,000,000 of the
    WHOLE corpus revenue — the decorrelated ``HAVING sum(...) >
    (SELECT sum(...) * f FROM ...)`` two-pass shape.

    Scale shape: per-batch combiner (in-batch partkey sums on the
    integer revenue grid) -> ONE coarse part-keyed exchange for exact
    per-part totals, MATERIALIZED because it feeds both the global
    reduce and the gate; the global total is Ray's tree ``sum()``
    over the per-part rows (the driver holds ONE integer, broadcast
    into the filter closure) — nothing corpus- or parts-sized touches
    the driver.  The gate is the exact integer cross-multiply
    ``1_000_000 * part_value > ppm * total``, evaluated overflow-free
    in int64 via divmod: with ``q, r = divmod(ppm * total, 10**6)``
    it is ``value > q`` when ``r == 0`` else ``value >= q + 1`` (the
    SQL twin states the HUGEINT cross-multiply verbatim — same
    predicate, different overflow discipline).  Output
    ``(l_partkey, value_tenk)``.
    """
    from doc_ocr_ray.util import coarse_part, typed_if_empty

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "l_partkey": batch["l_partkey"].astype("int64"),
            "value_tenk": revenue_cents(batch["l_extendedprice"],
                                        batch["l_discount"])})
        out = (out.groupby("l_partkey", sort=False)["value_tenk"]
               .sum().reset_index())          # in-batch combiner
        out["value_tenk"] = out["value_tenk"].astype("int64")
        out["part"] = coarse_part(out["l_partkey"], num_parts)
        return typed_if_empty(out)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("l_partkey", sort=False)["value_tenk"]
             .sum().reset_index())
        g["value_tenk"] = g["value_tenk"].astype("int64")
        g["part"] = coarse_part(g["l_partkey"], num_parts)
        return typed_if_empty(g)

    totals = (lineitem_ds.map_batches(project, batch_format="pandas")
              .groupby("part").map_groups(per_part,
                                          batch_format="pandas")
              .materialize())                 # feeds reduce AND gate
    total = totals.sum("value_tenk") or 0     # one driver-side int
    thr_q, thr_r = divmod(ppm * int(total), 10 ** 6)

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value_tenk"].to_numpy()
        keep = (v > thr_q) if thr_r == 0 else (v >= thr_q + 1)
        out = batch.loc[keep, ["l_partkey", "value_tenk"]]
        return typed_if_empty(pd.DataFrame({
            "l_partkey": out["l_partkey"].astype("int64"),
            "value_tenk": out["value_tenk"].astype("int64")}))

    return totals.map_batches(gate, batch_format="pandas")


def dominant_suppliers(lineitem_ds, supplier_tbl: pa.Table,
                       nation_tbl: pa.Table,
                       share_permille: int = 120,
                       num_parts: int = 128):
    """TPC-H Q20-shaped nested semi-join: suppliers holding an
    OUTSIZED share of at least one part's shipments — their half-up
    integer quantity strictly exceeds ``share_permille``/1000 of the
    part's total (``1000 * qty(s, p) > share_permille *
    total_qty(p)``, the availqty-vs-fractional-demand decorrelation;
    a strict-majority gate is vacuous on corpora where every part
    has many evenly-matched suppliers) — with how many parts each
    dominates, joined to the supplier + nation dimensions for
    names.

    Scale shape: in-batch (partkey, suppkey) quantity combiner -> ONE
    part-keyed coarse exchange where exact pair sums, the per-part
    total (a ``transform('sum')`` inside the owning group) and the
    dominance gate all happen without a join-back shuffle -> one
    TINY suppkey-keyed exchange counts dominated parts per supplier
    (pairs surviving the gate are supplier-sized, not corpus-sized)
    -> supplier/nation dimensions ride in as a ``ray.put`` broadcast
    merged inside the final group fn (never shuffled).  Output
    ``(s_suppkey, s_name, n_name, n_parts)``.
    """
    import ray
    from doc_ocr_ray.util import coarse_part, typed_if_empty

    dims = supplier_tbl.to_pandas().merge(
        nation_tbl.to_pandas(), left_on="s_nationkey",
        right_on="n_nationkey")[["s_suppkey", "s_name", "n_name"]]
    dims_ref = ray.put(dims)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "l_partkey": batch["l_partkey"].astype("int64"),
            "l_suppkey": batch["l_suppkey"].astype("int64"),
            "qty": np.floor(batch["l_quantity"] + 0.5)
                     .astype("int64")})
        out = (out.groupby(["l_partkey", "l_suppkey"], sort=False)
               ["qty"].sum().reset_index())   # in-batch combiner
        out["qty"] = out["qty"].astype("int64")
        out["part"] = coarse_part(out["l_partkey"], num_parts)
        return typed_if_empty(out)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["l_partkey", "l_suppkey"], sort=False)
             ["qty"].sum().reset_index())
        tot = g.groupby("l_partkey", sort=False)["qty"].transform("sum")
        dom = g.loc[1000 * g["qty"] > share_permille * tot.to_numpy(),
                    ["l_suppkey", "l_partkey"]]
        out = pd.DataFrame({
            "l_suppkey": dom["l_suppkey"].astype("int64"),
            "l_partkey": dom["l_partkey"].astype("int64")})
        out["part"] = coarse_part(out["l_suppkey"], num_parts)
        return typed_if_empty(out)

    def per_supplier(group: pd.DataFrame) -> pd.DataFrame:
        cnt = (group.groupby("l_suppkey", sort=False).size()
               .reset_index(name="n_parts"))
        d = ray.get(dims_ref)
        out = cnt.merge(d, left_on="l_suppkey", right_on="s_suppkey")
        return typed_if_empty(pd.DataFrame({
            "s_suppkey": out["s_suppkey"].astype("int64"),
            "s_name": out["s_name"].astype(object),
            "n_name": out["n_name"].astype(object),
            "n_parts": out["n_parts"].astype("int64")}))

    return (lineitem_ds.map_batches(project, batch_format="pandas")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas")
            .groupby("part").map_groups(per_supplier,
                                        batch_format="pandas"))
