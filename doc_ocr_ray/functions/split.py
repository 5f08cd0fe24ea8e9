"""Offset splitter (operators M6/M7 of SURVEY.md section 2.2).

Splits a multi-question text span into per-question sub-spans at the
detected number positions.  Interval semantics are the v2 analyzer's,
which produced the fixtures (tests/test_exam_paper_analysis_vl_ocr_v2.py:139-162):

- half-open char intervals ``[pos_i, pos_{i+1})``, last to end of text;
- the FIRST sub-span starts at offset 0, keeping any prefix text
  attached to the first question (v2) — the library variant that starts
  at the first match (question_splitter.py:372-376) is available via
  ``PipelineConfig.first_interval_from_zero=False``;
- each side ``.strip()``-ed.

In the span domain char offsets are exact, so the OCR locate /
linear-estimate ladder (question_splitter.py:182-308) reduces to the
locate validation in detect.py; splits never fail positionally.
"""
from __future__ import annotations

from typing import Any, Dict, List

from doc_ocr_ray.config import PipelineConfig, DEFAULT_CONFIG
from doc_ocr_ray.functions.detect import QuestionNumberDetector, NumberMatch


def split_text(text: str, matches: List[NumberMatch],
               config: PipelineConfig = DEFAULT_CONFIG) -> List[Dict[str, Any]]:
    """Partition ``text`` at the match positions.

    Returns ``[{"text": str, "question_number": int}]`` in offset order.
    """
    out: List[Dict[str, Any]] = []
    for i, m in enumerate(matches):
        if i == 0 and config.first_interval_from_zero:
            start = 0
        else:
            start = m.position
        end = matches[i + 1].position if i + 1 < len(matches) else len(text)
        out.append({"text": text[start:end].strip(), "question_number": m.number})
    return out


def split_doc_spans(spans: List[Dict[str, Any]],
                    detector: QuestionNumberDetector) -> List[Dict[str, Any]]:
    """Rewrite one document's span list, splitting multi-question text spans.

    Input spans: dicts with kind/text/media_ref/offset.  Output spans
    additionally carry ``question_number`` (-1 when absent) and
    ``split_from_merged``; offsets are re-ranked 0..n-1 in reading
    order (the output order is the invariant, not the offset values).

    Mirrors the v2 step-2 loop (tests/..._v2.py:1330-1351): only
    ``text`` spans are candidates; non-text spans pass through; a span
    whose arbitration returns None passes through unsplit.
    """
    cfg = detector.config
    ordered = sorted(spans, key=lambda s: s["offset"])
    out: List[Dict[str, Any]] = []
    for span in ordered:
        if not cfg.enable_split or span["kind"] != "text" or not span["text"]:
            out.append({**span, "question_number": -1, "split_from_merged": False})
            continue
        matches, strict = detector.analyze(span["text"])
        if not matches:
            # single-match annotation, library behavior
            # (question_splitter.py:58-63): ONLY a span with exactly one
            # detected number keeps it — a rejected multi-number span
            # (garbage sequence) stays unannotated, as in the reference.
            qnum = strict[0].number if len(strict) == 1 else -1
            out.append({**span, "question_number": qnum, "split_from_merged": False})
            continue
        for part in split_text(span["text"], matches, cfg):
            out.append({
                "kind": "text",
                "text": part["text"],
                "media_ref": span["media_ref"],
                "offset": span["offset"],           # re-ranked below
                "question_number": part["question_number"],
                "split_from_merged": True,
            })
    for rank, span in enumerate(out):
        span["offset"] = rank
    return out
