"""Scalar text functions: question-type, score, exam-info (M10-M12).

Reference twins:
- question-type heuristics: src/question_extraction/extractor.py:253-280
- score extraction: src/question_extraction/extractor.py:282-303
- exam-info extraction: src/question_extraction/extractor.py:138-193

All regexes compile once at module import; the functions are pure and
vectorizable inside ``map_batches``.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List

_CHOICE = re.compile(r"[A-D][\.、]")
_BLANK = re.compile(r"[（(]\s*[）)]|_{2,}")
_JUDGE = re.compile(r"判断|对错|正确|错误|√|×|[（(]\s*[）)]")
_CALC = re.compile(r"计算|求值|求出|算出")
_SOLVE = re.compile(r"解答|证明|说明|分析|简述")

_SCORE_PATTERNS = [
    re.compile(r"[（(](\d+)分[）)]"),
    re.compile(r"(\d+)分"),
    re.compile(r"每题(\d+)分"),
    re.compile(r"共(\d+)分"),
]

_GRADE = re.compile(r"[一二三四五六七八九]年级")
_TIME = re.compile(r"时间[：:]\s*(\d+)\s*分钟")
_TOTAL = re.compile(r"满分[：:]\s*([\d+]+)\s*分")
_SUBJECTS = ("数学", "语文", "英语")


def identify_question_type(content: str) -> str:
    """Rule ladder from extractor.py:253-280 (first hit wins)."""
    if _CHOICE.search(content):
        return "选择题"
    if _BLANK.search(content):
        return "填空题"
    if _JUDGE.search(content) and len(content) < 200:
        return "判断题"
    if _CALC.search(content):
        return "计算题"
    if _SOLVE.search(content) or len(content) > 100:
        return "解答题"
    return "其他"


def extract_score(content: str) -> int:
    """First matching score pattern wins (extractor.py:282-303)."""
    for rx in _SCORE_PATTERNS:
        m = rx.search(content)
        if m:
            try:
                return int(m.group(1))
            except (ValueError, IndexError):
                continue
    return 0


def extract_exam_info(spans: List[Dict[str, Any]]) -> Dict[str, str]:
    """Per-doc exam metadata from the offset-ordered span list.

    First-match semantics over doc_title / text spans
    (extractor.py:138-193): title & subject & grade from doc_title
    spans (last doc_title wins for title, as in the reference's loop);
    time/total from the first text spans carrying them.
    """
    info = {"title": "", "subject": "", "grade": "", "time_limit": "", "total_score": ""}
    for span in spans:
        if span["kind"] == "doc_title":
            title = span["text"]
            info["title"] = title
            for subj in _SUBJECTS:
                if subj in title:
                    info["subject"] = subj
                    break
            gm = _GRADE.search(title)
            if gm:
                info["grade"] = gm.group(0)
    for span in spans:
        if span["kind"] == "text":
            content = span["text"]
            # each matching block OVERWRITES (reference semantics,
            # extractor.py:176-191) until one block has left both set
            tm = _TIME.search(content)
            if tm:
                info["time_limit"] = f"{tm.group(1)}分钟"
            sm = _TOTAL.search(content)
            if sm:
                info["total_score"] = sm.group(1)
            if info["time_limit"] and info["total_score"]:
                break
    return info
