"""Unit tests for M2-M5 detection semantics (FIXTURES.md section 3)."""
from doc_ocr_ray.config import PipelineConfig
from doc_ocr_ray.functions.detect import QuestionNumberDetector

DET = QuestionNumberDetector()

# the literal probe case from /root/reference/tests/test_splitter.py:46
SPLITTER_LITERAL = (
    "3.找一个点D，使四边形ABCD是一个等腰梯形，画出这个等腰梯形。(2分)"
    "4.在这个等腰梯形中画一条线段，将其分成一个平行四边形与一个三角形。(2分)"
    "五、解决问题。(共13分)"
)


def test_splitter_literal_two_matches():
    # strict finds only the line-start "3."; loose also finds mid-line
    # "4."; the tie-break accepts [3, 4] (consecutive)
    matches = DET.arbitrate(SPLITTER_LITERAL)
    assert matches is not None
    assert [m.number for m in matches] == [3, 4]
    # the trailing 五、 section header is not a number match, and the
    # (2分)/(共13分) parens must not match the \((\d+)\) pattern
    loose = DET.detect(SPLITTER_LITERAL, strict_line_start=False)
    assert [m.number for m in loose] == [3, 4]


def test_all_five_patterns():
    for token in ["1.", "1、", "(1)", "第1题", "[1]", "【1】"]:
        text = f"{token}这是一道完整的题目内容示例。\n2.第二题的内容也足够长。"
        strict = DET.detect(text, strict_line_start=True)
        assert strict and strict[0].number == 1, token


def test_positional_dedup_window():
    # "1、" is matched by pattern 1 only once, but a token matched at
    # the same position by two patterns must be deduped: 【2】 matches
    # both the bracket pattern and nothing else -- construct overlap
    # with [3] vs 3.: "[3]." matches [3] at pos0 and "3." at pos1
    text = "[3].这里是足够长的题目内容甲乙丙丁\n4.第二题内容也足够长了"
    strict = DET.detect(text, strict_line_start=True)
    assert [m.number for m in strict] == [3, 4]


def test_midline_numbers_not_split():
    # FIXTURES.md case 5: decimals / mid-line numerals
    text = "一辆汽车的速度为 1.5m/s，行驶了 2.5 小时，路程约 13.5 千米。"
    assert DET.arbitrate(text) is None


def test_too_little_following_content():
    # <5 stripped chars after the match -> dropped
    # (question_splitter.py:156-159); note the window spans the rest of
    # the text, so only a trailing short match is droppable
    assert DET.detect("1.短", strict_line_start=True) == []
    got = DET.detect("1.这是一道完整的题目内容。\n2.短", strict_line_start=True)
    assert [m.number for m in got] == [1]


def test_garbage_sequence_rejected_by_locate_validation():
    # fixture 2 block 14: answer row "一、1.1052.2163.1074.55.33586.66"
    # strict finds [1, 2163] -> locate validation must kill the split
    text = "一、1.1052.2163.1074.55.33586.66"
    assert DET.arbitrate(text) is None


def test_nonconsecutive_loose_rejected():
    # mifeng block 8: strict=[2], loose=[2, 4] (the "(4)米" filler) ->
    # tie-break rejects, falls back to strict (single) -> no split
    text = "2.一个正方形的边长是$\\frac{1}{5}$米，它的周长是(4)米，它的面积是($\\frac{1}{25}$)平方米。"
    assert DET.arbitrate(text) is None


def test_five_question_run():
    text = "".join(f"{i}.这是第{i}道判断题的完整内容示例。" for i in range(1, 6))
    matches = DET.arbitrate(text)
    assert matches is not None
    assert [m.number for m in matches] == [1, 2, 3, 4, 5]


def test_patterns_user_extendable():
    cfg = PipelineConfig(question_patterns=[r"Q(\d+)\s*[:：]\s*"])
    det = QuestionNumberDetector(cfg)
    text = "Q1: what is the answer to this one\nQ2: and to this other one"
    matches = det.arbitrate(text)
    assert matches is not None
    assert [m.number for m in matches] == [1, 2]


def test_anchor_numbers_reanchoring():
    # O3: externally-detected numbers re-anchored to char offsets by
    # literal substitution into the pattern set; unfindable numbers drop
    text = "3.找一个点D，画出这个等腰梯形。(2分)4.在梯形中画一条线段。"
    anchored = DET.anchor_numbers(text, [4, 3, 99])
    assert [(m.number, m.position) for m in anchored] == [
        (3, 0), (4, text.index("4."))]
