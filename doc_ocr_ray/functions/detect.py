"""Question-number detection (operators M2-M5 of SURVEY.md section 2.2).

Pure functions over a single span's text.  Semantics match the
reference's v2 analyzer, which produced the golden fixtures:

- pattern scan + position sort + window-5 positional dedup + sequence
  validation: /root/reference/tests/test_exam_paper_analysis_vl_ocr_v2.py:401-500
  (library twin: src/question_extraction/question_splitter.py:92-180)
- strict-vs-loose arbitration with VL tie-break:
  tests/test_exam_paper_analysis_vl_ocr_v2.py:347-399
- the OCR line-locate abort ("number not found -> keep block"):
  tests/test_exam_paper_analysis_vl_ocr_v2.py:221-223

The VL tie-break and the OCR locate step are replaced here by
deterministic stand-ins (consecutive-ascending acceptance and
bounded-gap ascending validation) that reproduce the reference's
recorded verdicts on every committed fixture — see
tests/test_detect.py for the pinned cases.
"""
from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional, Sequence

from doc_ocr_ray.config import PipelineConfig, DEFAULT_CONFIG


@dataclass(frozen=True)
class NumberMatch:
    """One detected question-number token (question_splitter.py:92-132)."""
    number: int
    position: int       # char offset of the match start
    matched_str: str
    pattern: str


class QuestionNumberDetector:
    """Compiled-once detector; instantiate per worker, call per span."""

    def __init__(self, config: PipelineConfig = DEFAULT_CONFIG):
        self.config = config
        # two compilations per pattern: MULTILINE has no effect because
        # the patterns carry no anchors (v2 form), so one compile works
        # for both strict and loose scans; strictness lives in
        # validation (tests/..._v2.py:418-422 sets flags that are no-ops
        # for anchorless patterns).
        self._compiled = [re.compile(p, re.MULTILINE) for p in config.question_patterns]

    # -- M2 + M3 + M4 --------------------------------------------------
    def _scan_and_dedup(self, text: str) -> List[NumberMatch]:
        """Pattern scan + position sort + window dedup — identical for
        strict and loose modes (strictness lives in validation), so the
        arbiter computes this once and validates twice."""
        cfg = self.config
        found: List[NumberMatch] = []
        for pat, rx in zip(cfg.question_patterns, self._compiled):
            for m in rx.finditer(text):
                try:
                    number = int(m.group(1))
                except (ValueError, IndexError):
                    continue
                found.append(NumberMatch(number, m.start(), m.group(0), pat))
        found.sort(key=lambda x: x.position)

        # positional dedup: keep-first within the window
        # (question_splitter.py:121-127)
        filtered: List[NumberMatch] = []
        last_pos = -cfg.dedup_window * 2
        for qn in found:
            if qn.position - last_pos > cfg.dedup_window:
                filtered.append(qn)
                last_pos = qn.position
        return filtered

    def _validate(self, filtered: Sequence[NumberMatch], text: str,
                  strict_line_start: bool) -> List[NumberMatch]:
        """Sequence validation (question_splitter.py:134-163)."""
        cfg = self.config
        validated: List[NumberMatch] = []
        for qn in filtered:
            if strict_line_start and not self._is_at_line_start(qn.position, text):
                continue
            following = text[qn.position + len(qn.matched_str):
                             qn.position + cfg.following_window]
            if len(following.strip()) < cfg.min_following_chars:
                continue
            validated.append(qn)
        return validated

    def detect(self, text: str, strict_line_start: bool = True) -> List[NumberMatch]:
        """Scan all patterns, sort by position, dedup, validate."""
        return self._validate(self._scan_and_dedup(text), text,
                              strict_line_start)

    def _is_at_line_start(self, position: int, text: str) -> bool:
        """Line-start rule (question_splitter.py:165-180)."""
        if position == 0:
            return True
        before = text[:position]
        last_nl = before.rfind("\n")
        if last_nl == -1:
            return position < self.config.line_start_max_lead
        return len(before[last_nl + 1:position].strip()) == 0

    # -- M5: strict-vs-loose arbiter with deterministic tie-break ------
    def arbitrate(self, text: str) -> Optional[List[NumberMatch]]:
        """Return the match list that warrants a split, else None.

        Mirrors ContextAwareSplitter.detect_and_validate
        (tests/..._v2.py:347-399): equal counts -> strict; unequal ->
        tie-break; tie-break failure -> strict.  Both outcomes then pass
        the locate validation (the OCR-abort stand-in).
        """
        return self.analyze(text)[0]

    def analyze(self, text: str):
        """One scan, both outcomes: (split_matches_or_None, strict_matches).

        The strict list is what single-match annotation needs
        (question_splitter.py:58-63) — returning it here saves a third
        full pattern scan per unsplit span.
        """
        filtered = self._scan_and_dedup(text)
        strict = self._validate(filtered, text, strict_line_start=True)
        loose = self._validate(filtered, text, strict_line_start=False)

        if len(strict) == len(loose):
            matches = strict
        else:
            tb = self._tiebreak(loose)
            matches = tb if tb is not None else strict

        if len(matches) <= 1:
            return None, strict
        if not self.locate_validate(matches):
            return None, strict
        return matches, strict

    def _tiebreak(self, loose: Sequence[NumberMatch]) -> Optional[List[NumberMatch]]:
        """Deterministic stand-in for the VL tie-break (tests/..._v2.py:502-594).

        Accept the loose detection iff its numbers form a strictly
        consecutive ascending run (n, n+1, ...), which is what the VL
        model effectively confirmed on the fixtures (e.g. fixture 2
        block 5: strict=[3], loose=[3,4] -> VL said [3,4]).
        """
        if not self.config.tiebreak_require_consecutive:
            return list(loose) if len(loose) > 1 else None
        if len(loose) < 2:
            return None
        nums = [m.number for m in loose]
        if all(b == a + 1 for a, b in zip(nums, nums[1:])):
            return list(loose)
        return None

    def anchor_numbers(self, text: str,
                       numbers: Sequence[int]) -> List[NumberMatch]:
        """O3 offset re-anchoring: given question numbers returned by an
        external (VL) detector, find each number's char offset by
        substituting it into the pattern set and searching
        (tests/test_exam_paper_analysis_vl_ocr_v2.py:560-588 — the
        ``(\\d+)`` group replaced by the literal number, first pattern
        that matches wins).  Numbers not found in the text are dropped,
        as in the reference."""
        anchored: List[NumberMatch] = []
        for num in numbers:
            for pat in self.config.question_patterns:
                specific = pat.replace(r"(\d+)", str(int(num)))
                m = re.search(specific, text)
                if m:
                    anchored.append(NumberMatch(int(num), m.start(),
                                                m.group(0), pat))
                    break
        anchored.sort(key=lambda x: x.position)
        return anchored

    def locate_validate(self, matches: Sequence[NumberMatch]) -> bool:
        """Stand-in for OCR line-locate success (tests/..._v2.py:209-247).

        The reference aborts the split when a number can't be located on
        an OCR line; garbage sequences (fixture 2 block 14: [1, 2163])
        fail exactly there.  Span-domain analog: numbers must be
        strictly ascending with gaps <= max_number_gap.
        """
        nums = [m.number for m in matches]
        return all(0 < b - a <= self.config.max_number_gap
                   for a, b in zip(nums, nums[1:]))
