"""Unit tests for M6/M7 split semantics."""
from doc_ocr_ray.config import PipelineConfig
from doc_ocr_ray.functions.detect import QuestionNumberDetector
from doc_ocr_ray.functions.split import split_doc_spans, split_text

DET = QuestionNumberDetector()


def _span(kind, text, offset, media_ref=""):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_first_interval_from_zero_v2():
    # v2 semantics: prefix text stays attached to the first question
    # (tests/test_exam_paper_analysis_vl_ocr_v2.py:141-149)
    text = "本大题共两小题\n3.第一道题的完整内容。\n4.第二道题的完整内容。"
    matches = DET.arbitrate(text)
    parts = split_text(text, matches)
    assert len(parts) == 2
    assert parts[0]["text"].startswith("本大题共两小题")
    assert parts[0]["question_number"] == 3
    assert parts[1]["text"] == "4.第二道题的完整内容。"


def test_library_semantics_flag():
    # library variant starts at the first match (question_splitter.py:372-376)
    cfg = PipelineConfig(first_interval_from_zero=False)
    text = "前缀\n3.第一道题的完整内容。\n4.第二道题的完整内容。"
    det = QuestionNumberDetector(cfg)
    parts = split_text(text, det.arbitrate(text), cfg)
    assert parts[0]["text"] == "3.第一道题的完整内容。"


def test_intervals_are_half_open_and_stripped():
    text = "1.甲题内容足够长了吧   \n2.乙题内容也足够长了"
    parts = split_text(text, DET.arbitrate(text))
    assert parts[0]["text"] == "1.甲题内容足够长了吧"
    assert parts[1]["text"] == "2.乙题内容也足够长了"


def test_single_match_passthrough_annotated():
    # FIXTURES.md case 6: exactly one match -> passthrough with number
    spans = [_span("text", "7.只有一道题目的文本块内容。", 0)]
    out = split_doc_spans(spans, DET)
    assert len(out) == 1
    assert out[0]["question_number"] == 7
    assert out[0]["split_from_merged"] is False


def test_doc_span_rewrite_and_rerank():
    spans = [
        _span("doc_title", "测试卷", 0),
        _span("text", "1.第一道题的完整内容。2.第二道题的完整内容。", 1),
        _span("image", "", 2, media_ref="img:0"),
    ]
    out = split_doc_spans(spans, DET)
    assert [s["kind"] for s in out] == ["doc_title", "text", "text", "image"]
    assert [s["offset"] for s in out] == [0, 1, 2, 3]
    assert [s.get("question_number") for s in out] == [-1, 1, 2, -1]
    assert out[1]["split_from_merged"] and out[2]["split_from_merged"]


def test_empty_and_degenerate_docs():
    # FIXTURES.md case 12
    assert split_doc_spans([], DET) == []
    out = split_doc_spans([_span("text", "", 0)], DET)
    assert len(out) == 1 and out[0]["question_number"] == -1
