"""Tests for rendering, exam-info, geometry, and event operators."""
import pandas as pd
import pytest

from doc_ocr_ray.functions import geometry


def _span(kind, text, offset, media_ref=""):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_render_markdown_skips_boilerplate_and_links_media():
    from doc_ocr_ray.pipelines.render import render_doc_markdown
    spans = [
        _span("header", "第1页", 0),
        _span("doc_title", "六年级数学测试卷", 1),
        _span("paragraph_title", "一、填空题", 2),
        _span("text", "1.第一题内容。", 3),
        _span("image", "", 4, "img:7"),
        _span("footer", "共4页", 5),
    ]
    md = render_doc_markdown(spans)
    assert md.splitlines()[0] == "# 六年级数学测试卷"
    assert "## 一、填空题" in md
    assert "![](img:7)" in md
    assert "第1页" not in md and "共4页" not in md


def test_exam_info_extraction():
    from doc_ocr_ray.functions.textfns import extract_exam_info
    spans = [
        _span("doc_title", "六年级上册数学测试卷", 0),
        _span("text", "时间：60分钟 满分：100分", 1),
    ]
    info = extract_exam_info(spans)
    assert info == {"title": "六年级上册数学测试卷", "subject": "数学",
                    "grade": "六年级", "time_limit": "60分钟",
                    "total_score": "100"}


@pytest.mark.usefixtures("ray_session")
def test_exam_info_pipeline_on_fixture():
    import ray.data
    from doc_ocr_ray import fixtures
    from doc_ocr_ray.pipelines.render import extract_exam_info
    ds = ray.data.from_arrow(fixtures.load_fixture_documents())
    rows = {r["doc_id"]: r for r in extract_exam_info(ds).take_all()}
    m = rows["mifeng_doubao_1"]
    assert m["subject"] == "数学" and m["grade"] == "六年级"
    assert "测试卷" in m["title"]


def test_geometry_kernels():
    assert geometry.poly_to_bbox([[1, 2], [5, 2], [5, 8], [1, 8]],
                                 [10, 20, 99, 99]) == [11, 22, 15, 28]
    assert geometry.rescale_bbox_0_1000([500, 500, 1000, 1000], 200, 100) \
        == [100, 50, 200, 100]
    assert geometry.looks_normalized([100, 200, 300, 250], 2000, 1500)
    assert not geometry.looks_normalized([900, 1200, 1800, 1400], 2000, 1500)
    assert geometry.bbox_envelope([[0, 0, 5, 5], [3, 2, 9, 4]]) == [0, 0, 9, 5]
    assert geometry.bbox_envelope([]) == [0, 0, 0, 0]
    assert geometry.iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    assert geometry.iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
    est = geometry.estimate_positions_linear([0, 50], 100, [0, 100, 50, 300])
    assert est[0]["bbox"][1] == 100 and est[1]["bbox"][1] == 200
    assert est[0]["confidence"] == 0.5


@pytest.mark.usefixtures("ray_session")
def test_sessionize_gap_semantics():
    import ray.data
    from doc_ocr_ray.pipelines.events import sessionize
    ts = pd.to_datetime([
        "2026-01-01 10:00", "2026-01-01 10:10",     # session 1
        "2026-01-01 11:00",                          # gap 50min -> session 2
        "2026-01-01 11:29",                          # 29min -> still session 2
    ])
    df = pd.DataFrame({"user_id": [7] * 4, "event_id": [1, 2, 3, 4], "ts": ts})
    out = sessionize(ray.data.from_pandas(df), gap_minutes=30).take_all()
    out.sort(key=lambda r: r["session_id"])
    assert [r["n_events"] for r in out] == [2, 2]
    assert out[0]["session_id"] == 1 and out[1]["session_id"] == 2


@pytest.mark.usefixtures("ray_session")
def test_top_k_per_group():
    import ray.data
    from doc_ocr_ray.pipelines.events import top_k_per_group
    df = pd.DataFrame({
        "o_custkey": [1, 1, 1, 1, 2],
        "o_orderkey": [10, 11, 12, 13, 20],
        "o_totalprice": [5.0, 9.0, 9.0, 1.0, 3.0],
    })
    out = top_k_per_group(ray.data.from_pandas(df), key="o_custkey",
                          order_col="o_totalprice",
                          tiebreak_col="o_orderkey", k=2).take_all()
    c1 = sorted([r for r in out if r["o_custkey"] == 1],
                key=lambda r: r["rank"])
    assert [r["o_orderkey"] for r in c1] == [11, 12]   # tie broken by key
    assert len([r for r in out if r["o_custkey"] == 2]) == 1


@pytest.mark.usefixtures("ray_session")
def test_anti_join_broadcast():
    import ray.data
    from doc_ocr_ray.pipelines.events import anti_join_broadcast
    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "v": list("abcd")}))
    right = ray.data.from_pandas(pd.DataFrame({"fk": [2, 4, 4]}))
    out = anti_join_broadcast(left, "k", right, "fk").take_all()
    assert sorted(r["k"] for r in out) == [1, 3]


@pytest.mark.usefixtures("ray_session")
def test_sessionize_streaming_equals_batch():
    """The actor-based incremental sessionizer reproduces the batch
    groupby formulation exactly on real event data."""
    import ray.data
    from doc_ocr_ray.pipelines.events import sessionize, sessionize_streaming
    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["user_id", "event_id", "ts"])
    def canon(rows):
        return sorted((r["user_id"], r["session_id"], r["n_events"],
                       r["start_ts"], r["end_ts"]) for r in rows)
    batch = canon(sessionize(ds).take_all())
    stream = canon(sessionize_streaming(ds, chunk_rows=97).take_all())
    assert batch == stream and len(batch) > 10


@pytest.mark.usefixtures("ray_session")
def test_asof_join_backward_with_ties():
    import ray.data
    from doc_ocr_ray.pipelines.events import asof_join
    ts = pd.to_datetime
    left = pd.DataFrame({
        "event_id": [100, 101, 102],
        "user_id": [1, 1, 2],
        "ts": ts(["2026-01-01 00:10", "2026-01-01 00:20",
                  "2026-01-01 00:10"]),
    })
    right = pd.DataFrame({
        # user 1: two views at the SAME ts (tie -> max event_id wins),
        # one later view; user 3: never matches (inner join drops 102)
        "event_id": [7, 9, 8, 50],
        "user_id": [1, 1, 1, 3],
        "ts": ts(["2026-01-01 00:05", "2026-01-01 00:05",
                  "2026-01-01 00:15", "2026-01-01 00:01"]),
    })
    out = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    key="user_id", on="ts").take_all()
    got = {r["event_id"]: r["event_id_right"] for r in out}
    assert got == {100: 9, 101: 8}          # tie -> 9; backward -> 8
    row = next(r for r in out if r["event_id"] == 100)
    assert pd.Timestamp(row["ts_right"]) == pd.Timestamp("2026-01-01 00:05")


def test_pii_redact_patterns():
    from doc_ocr_ray.stages.text_analysis import pii_redact_batch
    batch = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "mail bob.smith%x@mail.example.org now",
            "call 555-1234 or 555-99990 from 10.0.300.7 and 10.0.30.7",
            "no pii here 汉字 555-0001",
        ],
    })
    out = pii_redact_batch(batch)
    assert out.loc[0, "redacted"] == "mail [EMAIL] now"
    # 555-99990 fails the trailing \b{4} rule; 10.0.300.7 still matches
    # the 1-3-digit octet rule (300 is syntactically valid per pattern)
    assert out.loc[1, "redacted"] == "call [PHONE] or 555-99990 from [IP] and [IP]"
    assert list(out["n_emails"]) == [1, 0, 0]
    assert list(out["n_phones"]) == [0, 1, 1]
    assert list(out["n_ips"]) == [0, 2, 0]
    # CJK-adjacent phone still matches under ASCII \b (RE2 parity)
    assert "[PHONE]" in out.loc[2, "redacted"]


def test_repetition_signals_tiebreak_and_ttr():
    from doc_ocr_ray.stages.text_analysis import repetition_signals_batch
    batch = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "a b a b c",          # bigrams: "a b"x2, "b a", "b c"
            "z y z y z x",        # "z y"x2 ties "y z"x2 -> lex min "y z"
            "single",             # < 2 tokens -> dropped
        ],
    })
    out = repetition_signals_batch(batch).set_index("doc_id")
    assert list(out.index) == [1, 2]
    assert out.loc[1, "top_bigram"] == "a b"
    assert out.loc[1, "top_bigram_cnt"] == 2
    assert out.loc[2, "top_bigram"] == "y z"
    assert out.loc[1, "n_words"] == 5 and out.loc[1, "n_distinct"] == 3
    assert out.loc[1, "ttr"] == 0.6


@pytest.mark.usefixtures("ray_session")
def test_label_sessions_matches_sessionize():
    import ray.data
    from doc_ocr_ray.pipelines.events import label_sessions
    ts = pd.to_datetime([
        "2026-01-01 10:00", "2026-01-01 10:10",     # session 1
        "2026-01-01 11:00", "2026-01-01 11:29",     # session 2
    ])
    df = pd.DataFrame({"user_id": [7] * 4, "event_id": [1, 2, 3, 4],
                       "ts": ts})
    out = label_sessions(ray.data.from_pandas(df), gap_minutes=30).take_all()
    got = {r["event_id"]: r["session_id"] for r in out}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2}


@pytest.mark.usefixtures("ray_session")
def test_assign_split_deterministic_and_proportional():
    import hashlib
    import ray.data
    from doc_ocr_ray.pipelines.curate import assign_split
    df = pd.DataFrame({"doc_id": range(2000)})
    out = assign_split(ray.data.from_pandas(df), key="doc_id",
                       seed=42).take_all()
    by_split = pd.Series([r["split"] for r in out]).value_counts()
    # ~90/5/5 within sampling noise at n=2000
    assert 1700 < by_split["train"] < 1900
    assert 50 < by_split["val"] < 150 and 50 < by_split["test"] < 150
    # bucket formula is exactly md5-derived (the SQL twin's contract)
    row = next(r for r in out if r["doc_id"] == 123)
    expect = int(hashlib.md5(b"42:123").hexdigest()[:8], 16) % 10000
    assert row["bucket"] == expect
    # stability: a second run assigns identically
    out2 = assign_split(ray.data.from_pandas(df.iloc[100:200]),
                        key="doc_id", seed=42).take_all()
    m1 = {r["doc_id"]: r["split"] for r in out}
    for r in out2:
        assert m1[r["doc_id"]] == r["split"]


@pytest.mark.usefixtures("ray_session")
def test_tfidf_top_terms():
    import ray.data
    from doc_ocr_ray.stages.text_analysis import tfidf_top_terms
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "rare common common",       # 'rare' df=1, 'common' df=3
            "common unique",            # 'unique' df=1
            "common shared shared",     # 'shared' df=1, tf=2
        ],
    })
    out = tfidf_top_terms(ray.data.from_pandas(df), n_docs=3,
                          k=2).take_all()
    top1 = {r["doc_id"]: r["term"] for r in out if r["rank"] == 1}
    # df=1 terms (idf=ln 3) dominate the df=3 term (idf=0)
    assert top1 == {1: "rare", 2: "unique", 3: "shared"}
    r3 = next(r for r in out if r["doc_id"] == 3 and r["rank"] == 1)
    assert r3["tf"] == 2 and r3["df"] == 1
    # idf_milli = floor(1000*ln(3)) = 1098; score = tf * idf_milli
    assert r3["score_milli"] == 2 * 1098
    # the ubiquitous term scores 0 (ln(3/3)=0) but still ranks 2nd
    common = [r for r in out if r["term"] == "common" and r["doc_id"] == 1]
    assert common and common[0]["score_milli"] == 0


@pytest.mark.usefixtures("ray_session")
def test_anti_join_bloom_exact_under_false_positives():
    import ray.data
    from doc_ocr_ray.pipelines.events import (anti_join_bloom,
                                              anti_join_broadcast)
    left = pd.DataFrame({"k": range(200), "v": [f"r{i}" for i in range(200)]})
    right = pd.DataFrame({"fk": [3, 7, 7, 150]})
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
    # m_bits=64: with 4 hashes the filter saturates and nearly every
    # key is a Bloom "maybe" — the exact-verify stage must still
    # produce precisely the broadcast anti-join's answer
    got = sorted(r["k"] for r in anti_join_bloom(
        lds, "k", rds, "fk", m_bits=64, k_hashes=4).take_all())
    want = sorted(r["k"] for r in anti_join_broadcast(
        lds, "k", rds, "fk").take_all())
    assert got == want and len(got) == 197
    # and with a roomy filter most rows take the no-shuffle path
    got2 = sorted(r["k"] for r in anti_join_bloom(
        lds, "k", rds, "fk", m_bits=1 << 16).take_all())
    assert got2 == want


@pytest.mark.usefixtures("ray_session")
def test_order_priority_revenue_native_join():
    import ray.data
    from doc_ocr_ray.pipelines.relational import order_priority_revenue
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3],
        "l_extendedprice": [100.0, 50.0, 10.0, 999.0],
        "l_discount": [0.1, 0.0, 0.5, 0.0],
    })
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 9],        # order 3 has no match -> drops
        "o_orderpriority": ["HIGH", "LOW", "LOW"],
    })
    out = order_priority_revenue(ray.data.from_pandas(li),
                                 ray.data.from_pandas(orders),
                                 num_partitions=4).take_all()
    got = {r["o_orderpriority"]: (r["n_items"], r["revenue"]) for r in out}
    assert got == {"HIGH": (2, 140.0), "LOW": (1, 5.0)}


def test_events_rollup_levels_consistent(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import events_rollup

    ev = pd.DataFrame({
        "event_type": ["a", "a", "b", "b", "b"],
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-02 11:00",
                              "2024-01-01 09:00", "2024-01-01 09:30",
                              "2024-01-02 23:59"]),
        "value": [1.00, 2.50, 0.25, 0.25, 10.00]})
    out = (events_rollup(ray.data.from_pandas(ev)).to_pandas()
           .set_index(["event_type", "day"]))
    assert out.loc[("a", "2024-01-01"), "sum_value"] == 1.00
    assert out.loc[("a", "ALL"), "n"] == 2
    assert out.loc[("a", "ALL"), "sum_value"] == 3.50
    assert out.loc[("b", "2024-01-01"), "sum_value"] == 0.50
    assert out.loc[("ALL", "ALL"), "n"] == 5
    assert out.loc[("ALL", "ALL"), "sum_value"] == 14.00
    # level row counts: 4 leaf + 2 per-type + 1 grand
    assert len(out) == 7


def test_events_cube_adds_by_day_level(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import events_cube

    ev = pd.DataFrame({
        "event_type": ["a", "a", "b", "b", "b"],
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-02 11:00",
                              "2024-01-01 09:00", "2024-01-01 09:30",
                              "2024-01-02 23:59"]),
        "value": [1.00, 2.50, 0.25, 0.25, 10.00]})
    out = (events_cube(ray.data.from_pandas(ev)).to_pandas()
           .set_index(["event_type", "day"]))
    # the rollup levels survive...
    assert out.loc[("a", "ALL"), "sum_value"] == 3.50
    assert out.loc[("ALL", "ALL"), "n"] == 5
    # ...plus the per-day level rollup lacks
    assert out.loc[("ALL", "2024-01-01"), "n"] == 3
    assert out.loc[("ALL", "2024-01-01"), "sum_value"] == 1.50
    assert out.loc[("ALL", "2024-01-02"), "sum_value"] == 12.50
    # 4 leaf + 2 per-type + 2 per-day + 1 grand
    assert len(out) == 9


def test_moving_sum_window_and_lag(ray_session):
    import ray.data
    from doc_ocr_ray.stages.sketch import moving_sum_per_user

    ev = pd.DataFrame({
        "user_id": [7, 7, 7, 7, 9],
        "event_id": [1, 2, 3, 4, 5],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02",
                              "2024-01-03", "2024-01-04",
                              "2024-01-01"]),
        "value": [1.00, 2.00, 4.00, 8.00, 5.00]})
    out = (moving_sum_per_user(ray.data.from_pandas(ev), window=3)
           .to_pandas().set_index("event_id").sort_index())
    # window clamps at the partition start, then slides
    assert out["moving_cents"].tolist() == [100, 300, 700, 1400, 500]
    # lag default 0 at each partition start (user 9 restarts)
    assert out["prev_cents"].tolist() == [0, 100, 200, 400, 0]


def test_above_avg_orders_cross_multiply(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.relational import above_avg_orders

    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_custkey": [10, 10, 10, 20, 20],
        # cust 10: avg 200 -> only the 300 order beats it;
        # cust 20: both exactly on the average -> ties excluded
        "o_totalprice": [100.0, 200.0, 300.0, 50.0, 50.0]})
    out = above_avg_orders(ray.data.from_pandas(orders)).to_pandas()
    assert out["o_orderkey"].tolist() == [3]
    assert out["price_cents"].tolist() == [30000]


def test_daily_activity_full_outer_dangles(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.relational import daily_activity

    ev = pd.DataFrame({"ts": pd.to_datetime(
        ["2024-01-01 05:00", "2024-01-01 06:00", "2024-01-02 07:00"])})
    od = pd.DataFrame({"o_orderdate": pd.to_datetime(
        ["2024-01-02", "2024-01-03", "2024-01-03"])})
    out = (daily_activity(ray.data.from_pandas(ev),
                          ray.data.from_pandas(od))
           .to_pandas().sort_values("day").reset_index(drop=True))
    epoch_day = pd.Timestamp("2024-01-01").value // 10**9 // 86400
    assert out["day"].tolist() == [epoch_day, epoch_day + 1,
                                   epoch_day + 2]
    assert out["n_events"].tolist() == [2, 1, 0]   # day 3 events-dangle
    assert out["n_orders"].tolist() == [0, 1, 2]   # day 1 orders-dangle


def test_distinct_users_by_type_exact(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import distinct_users_by_type

    ev = pd.DataFrame({
        "event_type": ["a"] * 5 + ["b"] * 3,
        "user_id": [1, 1, 2, 3, 3, 1, 1, 1]})
    out = (distinct_users_by_type(ray.data.from_pandas(ev))
           .to_pandas().set_index("event_type"))
    assert out.loc["a", "n_users"] == 3
    assert out.loc["b", "n_users"] == 1


def test_retention_cohorts_offsets_and_dedup(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import retention_cohorts

    d0 = pd.Timestamp("2024-01-01 05:00")
    day = pd.Timedelta(days=1)
    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 1,   2, 2,   3],
        "ts": [d0, d0 + pd.Timedelta(hours=2),   # same day: dedupes
               d0 + day, d0 + 3 * day,
               d0 + day, d0 + 2 * day,           # user 2: cohort day 1
               d0 + 3 * day]})
    out = (retention_cohorts(ray.data.from_pandas(ev)).to_pandas()
           .set_index(["cohort_day", "day_offset"]))
    c0 = int((d0.value // 10**9) // 86400)
    # user 1: cohort c0, offsets {0, 1, 3}
    assert out.loc[(c0, 0), "n_users"] == 1
    assert out.loc[(c0, 1), "n_users"] == 1
    assert out.loc[(c0, 3), "n_users"] == 1
    # users 2 and 3: cohort c0+1 and c0+3
    assert out.loc[(c0 + 1, 0), "n_users"] == 1
    assert out.loc[(c0 + 1, 1), "n_users"] == 1
    assert out.loc[(c0 + 3, 0), "n_users"] == 1
    assert len(out) == 6


def test_mode_event_type_tiebreak_and_nulls(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import mode_event_type_per_user

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 2, 3],
        "event_type": ["b", "a", "b", "z", "a", None, None]})
    out = (mode_event_type_per_user(ray.data.from_pandas(ev))
           .to_pandas().set_index("user_id").sort_index())
    assert out.loc[1, "top_type"] == "b" and out.loc[1, "n"] == 2
    # tie at 1-1 -> lexicographically smallest; NULL types excluded
    assert out.loc[2, "top_type"] == "a" and out.loc[2, "n"] == 1
    assert 3 not in out.index      # all-NULL user emits nothing


def test_pivot_counts_other_and_nulls(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import pivot_counts

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "event_type": ["click", "click", "weird", None, "view"]})
    out = (pivot_counts(ray.data.from_pandas(ev))
           .to_pandas().set_index("user_id").sort_index())
    assert out.loc[1, "n_click"] == 2
    assert out.loc[1, "n_other"] == 2      # unknown value + NULL
    assert out.loc[2, "n_view"] == 1 and out.loc[2, "n_other"] == 0
    assert out.loc[1, "n_view"] == 0


def test_rollup_and_cube_null_keys_sentinel(ray_session):
    """Genuine NULL keys become their own '(null)' group instead of
    being dropped (and never conflate with the 'ALL' sentinel)."""
    import ray.data
    from doc_ocr_ray.pipelines.events import events_cube, events_rollup

    ev = pd.DataFrame({
        "event_type": ["a", None, "a"],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-01", None]),
        "value": [1.0, 2.0, 4.0]})
    roll = (events_rollup(ray.data.from_pandas(ev)).to_pandas()
            .set_index(["event_type", "day"]))
    assert roll.loc[("(null)", "2024-01-01"), "sum_value"] == 2.0
    assert roll.loc[("a", "(null)"), "sum_value"] == 4.0
    assert roll.loc[("ALL", "ALL"), "n"] == 3          # nothing dropped
    cube = (events_cube(ray.data.from_pandas(ev)).to_pandas()
            .set_index(["event_type", "day"]))
    assert cube.loc[("ALL", "2024-01-01"), "n"] == 2
    assert cube.loc[("ALL", "(null)"), "sum_value"] == 4.0


def test_common_paths_depth_and_short_users(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import common_paths

    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 10:01", "2024-01-01 10:02",
        "2024-01-01 10:03",                       # 4th event ignored
        "2024-01-01 11:00", "2024-01-01 11:01", "2024-01-01 11:02",
        "2024-01-01 12:00"])                      # short user: 1 event
    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2, 2, 3],
        "event_id": list(range(1, 9)),
        "ts": ts,
        "event_type": ["a", "b", "c", "z",
                       "a", "b", "c", "a"]})
    out = (common_paths(ray.data.from_pandas(ev), depth=3)
           .to_pandas().set_index("path"))
    assert out.loc["a>b>c", "n_users"] == 2       # 4th event excluded
    assert out.loc["a", "n_users"] == 1           # short path kept
    assert len(out) == 2


def test_salted_topk_equals_unsalted_on_hot_key(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.events import (top_k_per_group,
                                              top_k_per_group_salted)

    # one mega-customer owns 90% of rows (the skew case salting is
    # for), plus ties at the cut boundary
    rows = [{"o_custkey": 1, "o_orderkey": i,
             "o_totalprice": float(i % 7)} for i in range(900)]
    rows += [{"o_custkey": c, "o_orderkey": 1000 + c,
              "o_totalprice": 5.0} for c in range(2, 102)]
    df = pd.DataFrame(rows)

    def canon(ds_out):
        return sorted((r["o_custkey"], r["o_orderkey"], r["rank"])
                      for r in ds_out.take_all())
    plain = canon(top_k_per_group(
        ray.data.from_pandas(df), key="o_custkey",
        order_col="o_totalprice", tiebreak_col="o_orderkey", k=3))
    salted = canon(top_k_per_group_salted(
        ray.data.from_pandas(df), key="o_custkey",
        order_col="o_totalprice", tiebreak_col="o_orderkey", k=3))
    assert plain == salted and len(plain) == 3 + 100


def test_orders_per_customer_hist_zero_bucket(ray_session):
    import ray.data
    from doc_ocr_ray.pipelines.relational import orders_per_customer_hist

    cust = pd.DataFrame({"c_custkey": [1, 2, 3, 4, 5]})
    orders = pd.DataFrame({"o_custkey": [1, 1, 1, 2, 2, 3]})
    out = (orders_per_customer_hist(ray.data.from_pandas(cust),
                                    ray.data.from_pandas(orders))
           .to_pandas().set_index("n_orders").sort_index())
    assert out.loc[0, "n_customers"] == 2     # custs 4,5: zero orders
    assert out.loc[1, "n_customers"] == 1
    assert out.loc[2, "n_customers"] == 1
    assert out.loc[3, "n_customers"] == 1


@pytest.mark.usefixtures("ray_session")
def test_range_join_lookback_window_edges():
    import ray.data
    from doc_ocr_ray.pipelines.events import range_join_lookback
    ts = pd.to_datetime
    # user 1's purchase at 01:30 has a window [00:30, 01:30) that SPANS
    # the 01:00 hour-bucket boundary: the 00:30 view sits exactly ON
    # the inclusive lower bound (in the PREVIOUS bucket), the 01:30
    # view exactly ON the exclusive upper bound; user 2's purchase has
    # no prior events at all (left semantics keeps it with n=0)
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "user_id":  [1, 1, 1, 1, 2, 1],
        "ts": ts(["2026-01-01 00:29:59", "2026-01-01 00:30:00",
                  "2026-01-01 01:10:00", "2026-01-01 01:30:00",
                  "2026-01-01 05:00:00", "2026-01-01 01:30:00"]),
        "event_type": ["view", "view", "view", "purchase",
                       "purchase", "view"],
        "value": [10.0, 0.25, 1.115, 99.0, 5.0, 7.0],
    })
    out = range_join_lookback(ray.data.from_pandas(ev),
                              anchor_type="purchase",
                              window_minutes=60).take_all()
    got = {r["event_id"]: (r["n_prior"], r["sum_prior_value"])
           for r in out}
    # event 4: matches 2 (00:30 inclusive) and 3; NOT 1 (before
    # window), NOT 6 (equal ts excluded), NOT itself.
    # cents grid: floor(0.25*100+0.5)=25, floor(1.115*100+0.5)=112
    assert got == {4: (2, 1.37), 5: (0, 0.0)}


def test_watermark_late_events_cross_partition(ray_session):
    """The watermark must carry the running max ACROSS range-partition
    boundaries: a huge early event time keeps later partitions' events
    late even when their own partition never saw it."""
    import numpy as np
    import ray.data
    from doc_ocr_ray.pipelines.events import watermark_late_events

    n = 200
    ts = np.full(n, 1_000_000, dtype=np.int64) + np.arange(n)
    ts[5] = 500_000_000          # early outlier drives the watermark
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64),
                       "event_us": ts})
    out = (watermark_late_events(
               ray.data.from_pandas(df).repartition(8),
               lateness_us=1_000, num_partitions=16)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert len(out) == n
    # first arrival: watermark 0, never late
    assert out.loc[0, "watermark_us"] == 0 and out.loc[0, "late"] == 0
    # before the outlier: watermark = previous ts, on time
    assert out.loc[5, "watermark_us"] == ts[4]
    # every event after the outlier is late by ~499s >> 1ms lateness,
    # including ones in far-away partitions
    assert (out.loc[6:, "watermark_us"] == 500_000_000).all()
    assert (out.loc[6:, "late"] == 1).all()
    # exact oracle twin: pandas shifted cummax
    exp_wm = pd.Series(ts).cummax().shift(1, fill_value=0)
    assert (out["watermark_us"].to_numpy() == exp_wm.to_numpy()).all()
