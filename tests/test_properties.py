"""Property-based tests (hypothesis) for the split/merge kernels."""
import hypothesis.strategies as st
from hypothesis import given, settings

from doc_ocr_ray.functions.detect import QuestionNumberDetector
from doc_ocr_ray.functions.merge import HeuristicAggregator, postprocess
from doc_ocr_ray.functions.split import split_doc_spans, split_text

DET = QuestionNumberDetector()
AGG = HeuristicAggregator()

# text fragments that look like the corpus: CJK bodies, number tokens,
# whitespace, latex-ish fragments
_fragment = st.sampled_from([
    "这是一段题目内容甲乙丙丁",
    "计算下列各题并化简结果",
    "$\\frac{1}{2}+\\frac{1}{3}$",
    "（5分）", "(2分)", "\n", " ", "。", "speed 1.5m/s",
])
_number_token = st.integers(1, 30).flatmap(
    lambda n: st.sampled_from([f"{n}.", f"{n}、", f"({n})", f"第{n}题",
                               f"[{n}]", f"【{n}】"]))
_text = st.lists(st.one_of(_fragment, _number_token), min_size=0,
                 max_size=20).map("".join)


@given(_text)
@settings(max_examples=200, deadline=None)
def test_split_text_reconstructs_source(text):
    """Split intervals are a partition of the text: joining the raw
    (unstripped) intervals reproduces the source exactly."""
    matches, _ = DET.analyze(text)
    if not matches:
        return
    # recompute raw intervals like split_text but without strip
    starts = [0] + [m.position for m in matches[1:]]
    ends = [m.position for m in matches[1:]] + [len(text)]
    assert "".join(text[s:e] for s, e in zip(starts, ends)) == text
    parts = split_text(text, matches)
    assert len(parts) == len(matches)
    for part, m in zip(parts, matches):
        assert part["question_number"] == m.number
        assert part["text"] == part["text"].strip()


@given(_text)
@settings(max_examples=200, deadline=None)
def test_detect_positions_strictly_increasing(text):
    matches, strict = DET.analyze(text)
    for seq in ([m.position for m in strict],
                [m.position for m in (matches or [])]):
        assert seq == sorted(seq)
        assert all(b - a > DET.config.dedup_window
                   for a, b in zip(seq, seq[1:]))
    if matches:
        nums = [m.number for m in matches]
        assert all(0 < b - a <= DET.config.max_number_gap
                   for a, b in zip(nums, nums[1:]))


_kind = st.sampled_from(["text", "image", "doc_title", "paragraph_title",
                         "table", "display_formula", "header", "footer",
                         "aside_text"])


@st.composite
def _doc(draw):
    n = draw(st.integers(0, 15))
    spans = []
    for i in range(n):
        kind = draw(_kind)
        text = draw(_text) if kind not in ("image", "header") else ""
        spans.append({"kind": kind, "text": text,
                      "media_ref": f"img:{i}" if kind == "image" else "",
                      "offset": i})
    return spans


@given(_doc())
@settings(max_examples=100, deadline=None)
def test_every_span_consumed_exactly_once(spans):
    """A2 invariant: split + group + residual covers each post-split
    span exactly once, for arbitrary documents."""
    refined = split_doc_spans(spans, DET)
    groups = postprocess(refined, AGG.aggregate("d", refined))
    members = sorted(m for g in groups for m in g["members"])
    assert members == list(range(len(refined)))


@given(_doc())
@settings(max_examples=100, deadline=None)
def test_split_is_deterministic_and_offsets_ranked(spans):
    a = split_doc_spans(spans, DET)
    b = split_doc_spans(spans, DET)
    assert a == b
    assert [s["offset"] for s in a] == list(range(len(a)))
    # non-text spans survive untouched, in order
    assert [s["media_ref"] for s in a if s["kind"] == "image"] == \
           [s["media_ref"] for s in sorted(spans, key=lambda x: x["offset"])
            if s["kind"] == "image"]


def test_mega_doc_linear():
    """A 50k-span document must process without quadratic blowup."""
    import time
    spans = []
    for i in range(50_000):
        if i % 10 == 9:
            spans.append({"kind": "image", "text": "",
                          "media_ref": f"img:{i}", "offset": i})
        else:
            spans.append({"kind": "text",
                          "text": f"{(i % 30) + 1}.如图，这是第{i}道题的内容示例。",
                          "media_ref": "", "offset": i})
    t0 = time.time()
    refined = split_doc_spans(spans, DET)
    groups = postprocess(refined, AGG.aggregate("mega", refined))
    dt = time.time() - t0
    members = sorted(m for g in groups for m in g["members"])
    assert members == list(range(len(refined)))
    assert dt < 20, f"mega-doc took {dt:.1f}s — suspicious scaling"
