"""Edge-semantics pins for the round-3 TPC-H-shaped relational
operators (Q6/Q7/Q8/Q9/Q10/Q15/Q19/Q22 shapes).  The sf0.01 oracle
gate proves bulk equality; these pin the boundary rules a generated
corpus may never exercise: strict-vs-inclusive comparisons, tie
breaks, floor-division grids, sentinel survival through joins, and
the anti-join on the cross-multiplied scalar filter."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data
    return ray.data.from_pandas(df)


def _lineitem(rows):
    """rows: (orderkey, suppkey, partkey, qty, price, disc, ship,
    returnflag)"""
    return pd.DataFrame({
        "l_orderkey": np.array([r[0] for r in rows], dtype="int64"),
        "l_suppkey": np.array([r[1] for r in rows], dtype="int64"),
        "l_partkey": np.array([r[2] for r in rows], dtype="int64"),
        "l_quantity": np.array([r[3] for r in rows], dtype="float64"),
        "l_extendedprice": np.array([r[4] for r in rows], dtype="float64"),
        "l_discount": np.array([r[5] for r in rows], dtype="float64"),
        "l_shipdate": pd.to_datetime([r[6] for r in rows]),
        "l_returnflag": [r[7] for r in rows],
    })


def test_forecast_revenue_boundary_grid(ray_session):
    from doc_ocr_ray.pipelines.relational import forecast_revenue
    li = _lineitem([
        (1, 1, 1, 23.0, 100.0, 0.05, "1996-06-01", "N"),   # kept: 5.0
        (1, 1, 1, 1.0, 200.0, 0.07, "1996-01-01", "N"),    # kept: 14.0
        (1, 1, 1, 1.0, 100.0, 0.04, "1996-06-01", "N"),    # disc below
        (1, 1, 1, 1.0, 100.0, 0.08, "1996-06-01", "N"),    # disc above
        (1, 1, 1, 24.0, 100.0, 0.06, "1996-06-01", "N"),   # qty == max: out
        (1, 1, 1, 1.0, 100.0, 0.06, "1995-12-31", "N"),    # before window
        (1, 1, 1, 1.0, 100.0, 0.06, "1997-01-01", "N"),    # at hi: out
    ])
    out = forecast_revenue(_ds(li), year=1996).take_all()
    assert len(out) == 1 and out[0]["revenue"] == pytest.approx(19.0)


def _nation_tbl(pairs):
    return pa.table({
        "n_nationkey": pa.array([k for k, _ in pairs], pa.int32()),
        "n_name": [n for _, n in pairs],
        "n_regionkey": pa.array([0] * len(pairs), pa.int32())})


def test_nation_trade_volume_directions_and_window(ray_session):
    from doc_ocr_ray.pipelines.relational import nation_trade_volume
    li = _lineitem([
        (1, 1, 1, 1.0, 100.0, 0.0, "1996-05-01", "N"),  # N1 -> cust(o1)=N2
        (2, 2, 1, 1.0, 200.0, 0.0, "1997-03-01", "N"),  # N2 -> cust(o2)=N1
        (1, 2, 1, 1.0, 50.0, 0.0, "1996-06-01", "N"),   # N2 -> N2 same: out
        (3, 1, 1, 1.0, 70.0, 0.0, "1996-01-01", "N"),   # cust N0: out
        (1, 1, 1, 1.0, 99.0, 0.0, "1998-01-01", "N"),   # at hi: out
        (1, 3, 1, 1.0, 88.0, 0.0, "1996-02-01", "N"),   # supp N0 pruned: out
    ])
    orders = pd.DataFrame({"o_orderkey": np.array([1, 2, 3], dtype="int64"),
                           "o_custkey": np.array([1, 2, 3], dtype="int64")})
    cust = pd.DataFrame({"c_custkey": np.array([1, 2, 3], dtype="int64"),
                         "c_nationkey": pa.array([2, 1, 0], pa.int32())
                         .to_pandas()})
    sup = pa.table({"s_suppkey": pa.array([1, 2, 3], pa.int64()),
                    "s_nationkey": pa.array([1, 2, 0], pa.int32())})
    nat = _nation_tbl([(0, "NATION_0"), (1, "NATION_1"), (2, "NATION_2")])
    out = pd.DataFrame(nation_trade_volume(
        _ds(li), _ds(orders), _ds(cust).repartition(2), sup, nat,
        "NATION_1", "NATION_2", "1996-01-01", "1998-01-01").take_all())
    out = out.sort_values("l_year").reset_index(drop=True)
    assert list(out["supp_nation"]) == ["NATION_1", "NATION_2"]
    assert list(out["cust_nation"]) == ["NATION_2", "NATION_1"]
    assert list(out["l_year"]) == [1996, 1997]
    assert list(out["revenue"]) == [100.0, 200.0]


def test_market_share_floor_division_and_market_scope(ray_session):
    from doc_ocr_ray.pipelines.relational import market_share
    # region ASIA = regionkey 2 holds nations 1, 2; target NATION_3
    # supplies from outside the market region
    nat = pa.table({
        "n_nationkey": pa.array([0, 1, 2, 3], pa.int32()),
        "n_name": ["NATION_0", "NATION_1", "NATION_2", "NATION_3"],
        "n_regionkey": pa.array([0, 2, 2, 1], pa.int32())})
    reg = pa.table({"r_regionkey": pa.array([0, 1, 2], pa.int32()),
                    "r_name": ["AFRICA", "AMERICA", "ASIA"]})
    part = pa.table({"p_partkey": pa.array([1, 2], pa.int64()),
                     "p_type": ["PROMO", "OTHER"]})
    sup = pa.table({"s_suppkey": pa.array([1, 2], pa.int64()),
                    "s_nationkey": pa.array([3, 0], pa.int32())})
    cust = pd.DataFrame({
        "c_custkey": np.array([1, 2], dtype="int64"),
        "c_nationkey": np.array([1, 3], dtype="int32")})  # c2 not in region
    orders = pd.DataFrame({
        "o_orderkey": np.array([1, 2, 3, 4, 5], dtype="int64"),
        "o_custkey": np.array([1, 1, 1, 2, 1], dtype="int64"),
        "o_orderdate": pd.to_datetime(
            ["1995-03-01", "1995-06-01", "1995-09-01", "1995-04-01",
             "1997-01-01"])})
    li = _lineitem([
        (1, 1, 1, 1.0, 100.0, 0.0, "1995-05-01", "N"),  # target, counts both
        (2, 2, 1, 1.0, 50.0, 0.0, "1995-07-01", "N"),   # denominator only
        (3, 1, 2, 1.0, 77.0, 0.0, "1995-10-01", "N"),   # part type: out
        (4, 1, 1, 1.0, 88.0, 0.0, "1995-05-01", "N"),   # cust not in region
        (5, 1, 1, 1.0, 99.0, 0.0, "1997-02-01", "N"),   # order at hi: out
    ])
    out = market_share(_ds(li), _ds(orders), _ds(cust), sup, nat, reg,
                       part, nation="NATION_3", region="ASIA",
                       p_type="PROMO").take_all()
    assert len(out) == 1
    # (10000 * 1000000) // 1500000 = 6666 — floor, not round (6667)
    assert out[0]["o_year"] == 1995 and out[0]["mkt_share_bp"] == 6666


def test_profit_proxy_cost_grid(ray_session):
    from doc_ocr_ray.pipelines.relational import profit_by_nation_year
    li = _lineitem([
        (1, 1, 1, 2.0, 100.0, 0.0, "1996-05-01", "N"),  # cost 2*900*0.1=180
        (1, 1, 2, 1.0, 500.0, 0.0, "1996-05-01", "N"),  # name miss: out
    ])
    orders = pd.DataFrame({
        "o_orderkey": np.array([1], dtype="int64"),
        "o_orderdate": pd.to_datetime(["1996-03-01"])})
    sup = pa.table({"s_suppkey": pa.array([1], pa.int64()),
                    "s_nationkey": pa.array([1], pa.int32())})
    nat = _nation_tbl([(1, "NATION_1")])
    part = pa.table({"p_partkey": pa.array([1, 2], pa.int64()),
                     "p_name": ["green widget", "blue rod"],
                     "p_retailprice": pa.array([900.0, 910.0])})
    out = profit_by_nation_year(_ds(li), _ds(orders), sup, nat, part,
                                name_contains="widget").take_all()
    assert len(out) == 1
    row = out[0]
    assert (row["n_name"], row["o_year"]) == ("NATION_1", 1996)
    assert row["profit"] == pytest.approx(100.0 - 180.0)


def test_returned_items_topk_tiebreak_and_flags(ray_session):
    from doc_ocr_ray.pipelines.relational import returned_item_customers
    li = _lineitem([
        (1, 1, 1, 1.0, 300.0, 0.0, "1996-02-01", "R"),
        (2, 1, 1, 1.0, 200.0, 0.0, "1996-02-01", "R"),
        (3, 1, 1, 1.0, 200.0, 0.0, "1996-02-01", "R"),   # ties with c2
        (4, 1, 1, 1.0, 100.0, 0.0, "1996-02-01", "R"),
        (4, 1, 1, 1.0, 999.0, 0.0, "1996-02-01", "N"),   # not returned
        (5, 1, 1, 1.0, 888.0, 0.0, "1996-02-01", "R"),   # order out of window
    ])
    orders = pd.DataFrame({
        "o_orderkey": np.array([1, 2, 3, 4, 5], dtype="int64"),
        "o_custkey": np.array([1, 2, 3, 4, 1], dtype="int64"),
        "o_orderdate": pd.to_datetime(
            ["1996-01-05"] * 4 + ["1995-06-01"])})
    cust = pd.DataFrame({
        "c_custkey": np.array([1, 2, 3, 4], dtype="int64"),
        "c_name": [f"Customer#{k}" for k in (1, 2, 3, 4)],
        "c_acctbal": np.array([10.0, 20.0, 30.0, 40.0]),
        "c_nationkey": np.array([0, 0, 0, 0], dtype="int32")})
    nat = _nation_tbl([(0, "NATION_0")])
    out = pd.DataFrame(returned_item_customers(
        _ds(li).repartition(2), _ds(orders), _ds(cust), nat,
        lo="1996-01-01", hi="1996-07-01", k=2).take_all())
    out = out.sort_values("c_custkey").reset_index(drop=True)
    # tie at 200.0 between custkeys 2 and 3 breaks to the smaller key
    assert list(out["c_custkey"]) == [1, 2]
    assert list(out["revenue"]) == [300.0, 200.0]


def test_top_supplier_returns_all_max_achievers(ray_session):
    from doc_ocr_ray.pipelines.relational import top_supplier
    li = _lineitem([
        (1, 1, 1, 1.0, 150.0, 0.0, "1996-02-01", "N"),
        (1, 2, 1, 1.0, 100.0, 0.0, "1996-02-01", "N"),
        (1, 2, 1, 1.0, 50.0, 0.0, "1996-03-01", "N"),    # s2 also 150
        (1, 3, 1, 1.0, 100.0, 0.0, "1996-02-01", "N"),
        (1, 1, 1, 1.0, 999.0, 0.0, "1996-04-01", "N"),   # at hi: out
    ])
    sup = pa.table({"s_suppkey": pa.array([1, 2, 3], pa.int64()),
                    "s_name": ["S1", "S2", "S3"]})
    out = pd.DataFrame(top_supplier(
        _ds(li).repartition(3), sup,
        lo="1996-01-01", hi="1996-04-01").take_all())
    out = out.sort_values("s_suppkey").reset_index(drop=True)
    assert list(out["s_suppkey"]) == [1, 2]
    assert list(out["total_revenue"]) == [150.0, 150.0]


def test_disjunctive_revenue_clause_boundaries(ray_session):
    from doc_ocr_ray.pipelines.relational import disjunctive_revenue
    part = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_brand": ["B1", "B2", "B1", "B3"],
        "p_size": pa.array([5, 3, 6, 1], pa.int32())})
    preds = (("B1", 1, 5, 1.0, 10.0), ("B2", 3, 6, 5.0, 8.0))
    li = _lineitem([
        (1, 1, 1, 10.0, 100.0, 0.0, "1996-01-01", "N"),  # qty at hi: kept
        (1, 1, 1, 11.0, 999.0, 0.0, "1996-01-01", "N"),  # qty above: out
        (1, 1, 2, 5.0, 50.0, 0.0, "1996-01-01", "N"),    # clause 2: kept
        (1, 1, 3, 2.0, 999.0, 0.0, "1996-01-01", "N"),   # size 6 > 5: out
        (1, 1, 4, 2.0, 999.0, 0.0, "1996-01-01", "N"),   # brand B3: out
    ])
    out = disjunctive_revenue(_ds(li).repartition(2), part,
                              preds=preds).take_all()
    assert len(out) == 1 and out[0]["revenue"] == pytest.approx(150.0)


def test_idle_rich_cross_multiply_strict_and_anti_join(ray_session):
    from doc_ocr_ray.pipelines.relational import idle_rich_customers
    # positive balances: 100 x4 + 101 -> n=5, sum_cents=50100.
    # c1..c4: 10000*5 = 50000 < 50100 -> NOT rich (strict >).
    # c5: 10100*5 = 50500 > 50100 -> rich.  c6 negative: out of stats.
    cust = pd.DataFrame({
        "c_custkey": np.array([1, 2, 3, 4, 5, 6], dtype="int64"),
        "c_nationkey": np.array([1, 1, 1, 1, 2, 2], dtype="int32"),
        "c_acctbal": np.array([100.0, 100.0, 100.0, 100.0, 101.0, -5.0])})
    orders = pd.DataFrame({
        "o_custkey": np.array([1, 5], dtype="int64"),
        "o_orderdate": pd.to_datetime(["2000-01-01", "1998-06-01"])})
    out = idle_rich_customers(_ds(cust).repartition(2), _ds(orders),
                              since="1999-01-01").take_all()
    assert len(out) == 1
    row = out[0]
    assert (row["c_nationkey"], row["numcust"]) == (2, 1)
    assert row["totacctbal"] == pytest.approx(101.0)
    # and with a RECENT order for c5 the result set is empty of real
    # rows (anti join drops the only rich customer)
    orders2 = pd.DataFrame({
        "o_custkey": np.array([5], dtype="int64"),
        "o_orderdate": pd.to_datetime(["2000-01-01"])})
    out2 = idle_rich_customers(_ds(cust), _ds(orders2),
                               since="1999-01-01").take_all()
    assert out2 == []


def test_shipmode_priority_year_window_and_split(ray_session):
    # Q12 shape: year-window boundaries are [Jan 1, next Jan 1) and
    # the high/low split keys on exactly 1-URGENT / 2-HIGH
    from doc_ocr_ray.pipelines.relational import shipmode_priority_counts

    orders = pd.DataFrame({
        "o_orderkey": pd.Series([1, 2, 3, 4], dtype="int64"),
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"],
    })
    li = pd.DataFrame({
        "l_orderkey": pd.Series([1, 1, 2, 3, 4, 4], dtype="int64"),
        "l_linestatus": ["O", "F", "O", "O", "F", "O"],
        "l_shipdate": pd.to_datetime([
            "1996-01-01",   # inclusive lower bound -> counted (high, O)
            "1995-12-31",   # before window -> dropped
            "1996-06-15",   # counted (high, O)
            "1996-12-31",   # counted (low, O)
            "1996-07-01",   # counted (low, F)
            "1997-01-01",   # exclusive upper bound -> dropped
        ]),
    })
    out = (shipmode_priority_counts(_ds(orders), _ds(li),
                                    year=1996, num_partitions=2)
           .to_pandas().sort_values("l_linestatus")
           .reset_index(drop=True))
    assert out["l_linestatus"].tolist() == ["F", "O"]
    assert out["high_line_count"].tolist() == [0, 2]
    assert out["low_line_count"].tolist() == [1, 1]


# --- empty-match survival: every shape must mirror its SQL twin when
# --- the filter/window/brand matches NOTHING (review findings: scalar
# --- aggregates need the all-zero seed row; achiever/anti-join shapes
# --- return 0 rows without crashing; filtered join inputs must not
# --- feed the hash shuffle schema-less zero-row blocks)

def test_forecast_revenue_empty_window_one_zero_row(ray_session):
    from doc_ocr_ray.pipelines.relational import forecast_revenue
    li = _lineitem([(1, 1, 1, 1.0, 100.0, 0.06, "1996-06-01", "N")])
    out = forecast_revenue(_ds(li).repartition(2), year=2050).take_all()
    assert len(out) == 1 and out[0]["revenue"] == 0.0


def test_disjunctive_revenue_no_clause_hits_one_zero_row(ray_session):
    from doc_ocr_ray.pipelines.relational import disjunctive_revenue
    part = pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_brand": ["B1"], "p_size": pa.array([5], pa.int32())})
    li = _lineitem([(1, 1, 1, 99.0, 100.0, 0.0, "1996-01-01", "N")])
    out = disjunctive_revenue(
        _ds(li), part, preds=(("B1", 1, 5, 1.0, 10.0),)).take_all()
    assert len(out) == 1 and out[0]["revenue"] == 0.0


def test_small_qty_revenue_empty_brand_and_halfup_qty(ray_session):
    from doc_ocr_ray.pipelines.relational import small_qty_revenue
    part = pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_brand": ["Brand#23"]})
    # brand with NO lineitems: one all-zero row (oracle coalesce)
    li_none = _lineitem([(1, 1, 9, 1.0, 100.0, 0.0, "1996-01-01", "N")])
    out = small_qty_revenue(_ds(li_none), part).take_all()
    assert len(out) == 1
    assert (out[0]["n_small"], out[0]["revenue_cents"]) == (0, 0)
    # half-up quantity rounding (CAST parity): qty 1.5 -> 2, 2.5 -> 3,
    # sum_qty=5, n=2; keep iff 1000*2*qty < 200*5=1000 -> neither kept
    li_frac = _lineitem([
        (1, 1, 1, 1.5, 100.0, 0.0, "1996-01-01", "N"),
        (1, 1, 1, 2.5, 100.0, 0.0, "1996-01-01", "N")])
    out2 = small_qty_revenue(_ds(li_frac), part).take_all()
    assert len(out2) == 1 and out2[0]["n_small"] == 0


def test_top_supplier_empty_window_zero_rows(ray_session):
    from doc_ocr_ray.pipelines.relational import top_supplier
    li = _lineitem([(1, 1, 1, 1.0, 150.0, 0.0, "1996-02-01", "N")])
    sup = pa.table({"s_suppkey": pa.array([1], pa.int64()),
                    "s_name": ["S1"]})
    out = top_supplier(_ds(li).repartition(2), sup,
                       lo="2050-01-01", hi="2050-04-01").take_all()
    assert out == []


def test_idle_rich_no_positive_balances_zero_rows(ray_session):
    from doc_ocr_ray.pipelines.relational import idle_rich_customers
    cust = pd.DataFrame({
        "c_custkey": np.array([1, 2], dtype="int64"),
        "c_nationkey": np.array([1, 1], dtype="int32"),
        "c_acctbal": np.array([-5.0, 0.0])})
    orders = pd.DataFrame({
        "o_custkey": np.array([1], dtype="int64"),
        "o_orderdate": pd.to_datetime(["2000-01-01"])})
    out = idle_rich_customers(_ds(cust).repartition(2),
                              _ds(orders)).take_all()
    assert out == []


def test_late_supplier_blame_no_finished_orders(ray_session):
    from doc_ocr_ray.pipelines.relational import late_supplier_blame
    orders = pd.DataFrame({
        "o_orderkey": np.array([1, 2], dtype="int64"),
        "o_orderstatus": ["O", "O"],
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 2)})
    li = pd.DataFrame({
        "l_orderkey": np.array([1, 2], dtype="int64"),
        "l_suppkey": np.array([10, 20], dtype="int64"),
        "l_shipdate": pd.to_datetime(["2024-06-01", "2024-06-01"])})
    sup = pa.table({"s_suppkey": pa.array([10, 20], pa.int64()),
                    "s_name": ["S10", "S20"]})
    out = late_supplier_blame(_ds(li).repartition(2), _ds(orders),
                              sup, num_partitions=2).take_all()
    assert out == []


def test_shipmode_priority_empty_year_zero_rows(ray_session):
    from doc_ocr_ray.pipelines.relational import shipmode_priority_counts
    orders = pd.DataFrame({
        "o_orderkey": pd.Series([1], dtype="int64"),
        "o_orderpriority": ["1-URGENT"]})
    li = pd.DataFrame({
        "l_orderkey": pd.Series([1], dtype="int64"),
        "l_linestatus": ["O"],
        "l_shipdate": pd.to_datetime(["1996-06-15"])})
    out = shipmode_priority_counts(_ds(orders), _ds(li), year=2050,
                                   num_partitions=2).take_all()
    assert out == []


def test_hits_rejects_zero_iters(ray_session):
    from doc_ocr_ray.stages.graph import hits
    edges = pd.DataFrame({"src": np.array([1], dtype="int64"),
                          "dst": np.array([2], dtype="int64")})
    nodes = pd.DataFrame({"node": np.array([1, 2], dtype="int64")})
    with pytest.raises(ValueError, match="iters >= 1"):
        hits(_ds(edges), _ds(nodes), iters=0)


def test_market_share_zero_total_yields_null_not_crash(ray_session):
    # review fix: a year whose matched rows all land on revenue-grid
    # zero must emit a NULL share (DuckDB integer-//-0 parity), not
    # raise ZeroDivisionError
    from doc_ocr_ray.pipelines.relational import market_share
    nat = pa.table({
        "n_nationkey": pa.array([1, 3], pa.int32()),
        "n_name": ["NATION_1", "NATION_3"],
        "n_regionkey": pa.array([2, 1], pa.int32())})
    reg = pa.table({"r_regionkey": pa.array([1, 2], pa.int32()),
                    "r_name": ["AMERICA", "ASIA"]})
    part = pa.table({"p_partkey": pa.array([1], pa.int64()),
                     "p_type": ["PROMO"]})
    sup = pa.table({"s_suppkey": pa.array([1], pa.int64()),
                    "s_nationkey": pa.array([3], pa.int32())})
    cust = pd.DataFrame({
        "c_custkey": np.array([1], dtype="int64"),
        "c_nationkey": np.array([1], dtype="int32")})
    orders = pd.DataFrame({
        "o_orderkey": np.array([1], dtype="int64"),
        "o_custkey": np.array([1], dtype="int64"),
        "o_orderdate": pd.to_datetime(["1995-03-01"])})
    li = _lineitem([(1, 1, 1, 1.0, 0.0, 0.0, "1995-05-01", "N")])
    out = market_share(_ds(li), _ds(orders), _ds(cust), sup, nat, reg,
                       part, nation="NATION_3", region="ASIA",
                       p_type="PROMO").take_all()
    assert len(out) == 1
    assert out[0]["o_year"] == 1995
    assert out[0]["mkt_share_bp"] is None


def test_late_supplier_blame_null_orderdate_excluded(ray_session):
    # review fix: a NULL o_orderdate must not cast to INT64_MIN and
    # mark every shipment late — the SQL twin's NULL comparison marks
    # none, so the order contributes no blame in either engine
    from doc_ocr_ray.pipelines.relational import late_supplier_blame
    sup = pa.table({"s_suppkey": pa.array([1, 2], pa.int64()),
                    "s_name": ["alpha", "beta"]})
    orders = pd.DataFrame({
        "o_orderkey": np.array([1, 2], dtype="int64"),
        "o_orderstatus": ["F", "F"],
        "o_orderdate": pd.to_datetime(["2000-01-01", pd.NaT])})
    li = _lineitem([
        # order 1: supp 1 ships 200 days late, supp 2 on time -> blame 1
        (1, 1, 1, 1.0, 10.0, 0.0, "2000-07-19", "N"),
        (1, 2, 1, 1.0, 10.0, 0.0, "2000-01-10", "N"),
        # order 2 (NaT date): any shipment would be "late" vs INT64_MIN
        (2, 2, 1, 1.0, 10.0, 0.0, "2000-07-19", "N"),
    ])
    out = late_supplier_blame(_ds(li), _ds(orders), sup).take_all()
    got = {r["s_name"]: r["numwait"] for r in out}
    assert got.get("alpha", 0) == 1
    assert got.get("beta", 0) == 0 or "beta" not in got
