"""Synthetic-corpus pipeline tests: engine invariants + heuristic cases."""
import pytest

from doc_ocr_ray import synth
from doc_ocr_ray.config import PipelineConfig
from doc_ocr_ray.functions.detect import QuestionNumberDetector
from doc_ocr_ray.functions.merge import (
    HeuristicAggregator, RelatednessClassifier, postprocess,
)
from doc_ocr_ray.functions.split import split_doc_spans
from doc_ocr_ray.pipelines.extract import extract_questions
from doc_ocr_ray.stages.extract import extract_one_doc

CFG = PipelineConfig()
DET = QuestionNumberDetector(CFG)


def _span(kind, text, offset, media_ref=""):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_generator_deterministic():
    a = synth.generate_table(50, seed=42)
    b = synth.generate_table(50, seed=42)
    assert a.equals(b)
    c = synth.generate_table(50, seed=7)
    assert not a.equals(c)


def test_span_conservation():
    """Every post-split span is consumed by exactly one group (A2)."""
    table = synth.generate_table(40, seed=42)
    agg = HeuristicAggregator(CFG)
    for doc_id, spans in zip(table["doc_id"].to_pylist(),
                             table["spans"].to_pylist()):
        refined = split_doc_spans(spans, DET)
        groups = postprocess(refined, agg.aggregate(doc_id, refined))
        members = [m for g in groups for m in g["members"]]
        assert sorted(members) == list(range(len(refined))), doc_id


def test_related_image_claimed():
    """FIXTURES.md case 7: figure question claims its image."""
    spans = [
        _span("text", "5.如图，求阴影部分的面积（单位：厘米）。", 0),
        _span("image", "", 1, "img:a"),
    ]
    rows = extract_one_doc("d", spans, DET, HeuristicAggregator(CFG))
    q = [r for r in rows if r["group_type"] == "question"]
    assert len(q) == 1 and q[0]["n_images"] == 1
    assert q[0]["spans"][1]["media_ref"] == "img:a"


def test_multi_image_claim_and_cap():
    spans = [_span("text", "5.如图，观察下列四个图形回答问题。", 0)]
    for i in range(10):
        spans.append(_span("image", "", i + 1, f"img:{i}"))
    cfg = PipelineConfig(max_offset_distance=20)
    rows = extract_one_doc("d", spans, QuestionNumberDetector(cfg),
                           HeuristicAggregator(cfg))
    q = [r for r in rows if r["group_type"] == "question"][0]
    assert q["n_images"] == cfg.max_images_per_question  # cap 8 (T4)


def test_greedy_exclusive_claim():
    """An image between two figure questions goes to the earlier one (J2)."""
    spans = [
        _span("text", "1.如图，第一道图形题的内容。", 0),
        _span("image", "", 1, "img:x"),
        _span("text", "2.如图，第二道图形题的内容。", 2),
    ]
    rows = extract_one_doc("d", spans, DET, HeuristicAggregator(CFG))
    qs = [r for r in rows if r["group_type"] == "question"]
    assert qs[0]["n_images"] == 1 and qs[1]["n_images"] == 0


def test_unrelated_image_residual():
    """FIXTURES.md case 8: no figure reference -> image rejected ->
    residual unknown group."""
    spans = [
        _span("text", "3.计算下面各题，能简算的要简算。", 0),
        _span("image", "", 1, "img:deco"),
    ]
    rows = extract_one_doc("d", spans, DET, HeuristicAggregator(CFG))
    types = [r["group_type"] for r in rows]
    assert "unknown" in types
    unknown = [r for r in rows if r["group_type"] == "unknown"][0]
    assert unknown["spans"][0]["media_ref"] == "img:deco"


def test_boilerplate_becomes_aside():
    spans = [
        _span("header", "第1页", 0),
        _span("doc_title", "六年级上册数学测试卷", 1),
        _span("aside_text", "班级：___", 2),
        _span("text", "1.这是一道完整的题目内容。", 3),
        _span("footer", "共4页", 4),
    ]
    rows = extract_one_doc("d", spans, DET, HeuristicAggregator(CFG))
    types = [r["group_type"] for r in rows]
    assert types.count("aside") == 3
    assert "doc_title" in types and "question" in types
    # boilerplate never inside a question's span sequence
    for r in rows:
        if r["group_type"] == "question":
            assert all(s["kind"] not in CFG.boilerplate_kinds
                       for s in r["spans"])


def test_classifier_cache_hit():
    clf = RelatednessClassifier(CFG)
    clf.judge("如图，求面积", "img:1")
    clf.judge("如图，求面积", "img:1")
    assert clf.calls == 1


@pytest.mark.usefixtures("ray_session")
def test_pipeline_on_synth_corpus():
    import ray.data
    ds = ray.data.from_arrow(synth.generate_table(120, seed=42))
    out = extract_questions(ds)
    rows = out.take_all()
    assert len(rows) > 120          # many groups per doc
    docs = {r["doc_id"] for r in rows}
    assert len(docs) >= 118         # zero-span degenerate docs emit no rows
    qrows = [r for r in rows if r["group_type"] == "question"]
    assert qrows and all(r["merged_text"] for r in qrows)


@pytest.mark.usefixtures("ray_session")
def test_pipeline_deterministic_across_parallelism():
    import ray.data
    def run(blocks):
        ds = synth.generate_dataset(60, seed=42, override_num_blocks=blocks)
        rows = extract_questions(ds).take_all()
        return sorted(
            (r["doc_id"], r["question_id"], r["group_type"], r["merged_text"])
            for r in rows)
    assert run(2) == run(7)
