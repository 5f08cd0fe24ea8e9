"""Per-document grouping & text-media merge (J1-J3, A1-A2, O1-O4 stand-ins).

Everything here operates on ONE document's post-split span list in
offset order — the reference's merge is strictly intra-page
(question_merger.py:38-133), so no cross-document state exists and the
engine never needs a global shuffle for it.

Components:
- ``RelatednessClassifier``: deterministic stand-in for the Qwen-VL
  relatedness verdict (O1/O2, question_merger.py:329-472) behind the
  same protocol, with the reference's md5 cache-key formula (O7,
  question_merger.py:568-573).  A real VL client can be swapped in by
  subclassing and overriding ``_judge_uncached``.
- ``HeuristicAggregator``: deterministic stand-in for the VL semantic
  aggregator (O4, tests/test_exam_paper_analysis_vl_ocr_v2.py:894-1032):
  anchor-based grouping + greedy exclusive media claiming.
- ``ReplayAggregator``: replays recorded group verdicts (the engine
  analog of the reference's cached VL results making reruns
  reproducible without the API — SURVEY.md section 5.4).
- ``postprocess``: residual assignment + envelope merge
  (tests/..._v2.py:1130-1205).
"""
from __future__ import annotations

import hashlib
import re
from typing import Any, Dict, List, Optional, Sequence

from doc_ocr_ray.config import PipelineConfig, DEFAULT_CONFIG
from doc_ocr_ray.functions import textfns

Span = Dict[str, Any]
Group = Dict[str, Any]     # {"type": str, "members": [rank, ...]}


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


class RelatednessClassifier:
    """Deterministic question<->image relatedness verdicts (O1/O2 stand-in).

    Verdict shape matches the reference's VL response contract
    (question_merger.py:486-491): ``{is_related, reason, confidence}``.
    The stand-in rule: related iff the question text references a
    figure (keyword regex from PipelineConfig).  Cache key formula
    preserved: ``md5(question_text) + "_" + md5(identity)``
    (question_merger.py:568-573).
    """

    def __init__(self, config: PipelineConfig = DEFAULT_CONFIG):
        self.config = config
        self._figure_rx = re.compile(config.figure_keyword_pattern, re.IGNORECASE)
        self._cache: Dict[str, Dict[str, Any]] = {}
        self.calls = 0          # lineage metric: uncached judgments

    _MAX_CACHE = 1_000_000      # bound per-actor memory on huge corpora

    def judge(self, question_text: str, media_ref: str) -> Dict[str, Any]:
        key = f"{_md5(question_text)}_{_md5(media_ref)}"
        if self.config.enable_cache and key in self._cache:
            return self._cache[key]
        verdict = self._judge_uncached(question_text, media_ref)
        if self.config.enable_cache and len(self._cache) < self._MAX_CACHE:
            self._cache[key] = verdict
        return verdict

    def judge_batch(self, question_text: str,
                    media_refs: Sequence[str]) -> List[Dict[str, Any]]:
        """Batched verdicts (O2 analog, question_merger.py:375-472);
        degrade ladder = per-item judge, which is already the unit here."""
        return [self.judge(question_text, m) for m in media_refs]

    def _judge_uncached(self, question_text: str, media_ref: str) -> Dict[str, Any]:
        self.calls += 1
        related = bool(self._figure_rx.search(question_text))
        return {
            "is_related": related,
            "reason": "figure keyword" if related else "no figure reference",
            "confidence": 0.9 if related else 0.1,
        }


class HeuristicAggregator:
    """Deterministic anchor-based grouping (O4 stand-in).

    Walks the doc's spans in offset order and emits groups:
    - ``doc_title`` span -> its own ``doc_title`` group;
    - ``paragraph_title`` -> ``header`` group (section headings — the
      fixtures' VL maps paragraph_title blocks to type "header");
    - boilerplate kinds -> ``aside`` group each;
    - ``text`` span -> starts a group: ``question`` when a question
      number is attached, else ``text``;
    - ``image`` span -> candidate for the open question within
      ``max_offset_distance`` (offset-domain analog of the 300px rule,
      J1), claimed at most once in walk order (greedy exclusive
      ``used_images``, J2, question_merger.py:56-104), subject to the
      classifier verdict and the per-question cap (J3/T4,
      max_images_per_question); otherwise left unassigned for the
      residual pass (A2);
    - ``table`` / ``display_formula`` / ``inline_formula`` -> attach to
      the open question when adjacent, else their own group typed by
      kind (fixture mifeng_doubao_1: standalone table block 5 got its
      own "table" group).
    """

    def __init__(self, config: PipelineConfig = DEFAULT_CONFIG,
                 classifier: Optional[RelatednessClassifier] = None):
        self.config = config
        self.classifier = classifier or RelatednessClassifier(config)

    def aggregate(self, doc_id: str, spans: List[Span]) -> List[Group]:
        cfg = self.config
        groups: List[Group] = []
        open_q: Optional[Group] = None          # current question group
        open_q_last: int = -10**9               # rank of its last member
        open_q_text: str = ""
        open_q_images: int = 0

        for rank, span in enumerate(spans):
            kind = span["kind"]
            if kind in cfg.title_kinds:
                # doc_title keeps its type; section headings (e.g.
                # paragraph_title) group as "header", as the fixtures'
                # VL labels them
                gtype = "doc_title" if kind == "doc_title" else "header"
                groups.append({"type": gtype, "members": [rank]})
                open_q = None
            elif kind in cfg.boilerplate_kinds:
                groups.append({"type": "aside", "members": [rank]})
                # asides do not close the open question (marginalia)
            elif kind == "text":
                qnum = span.get("question_number", -1)
                gtype = "question" if qnum is not None and qnum >= 0 else "text"
                grp = {"type": gtype, "members": [rank]}
                groups.append(grp)
                if gtype == "question":
                    open_q, open_q_last = grp, rank
                    open_q_text, open_q_images = span["text"], 0
                else:
                    open_q = None
            elif kind == "image":
                if (open_q is not None
                        and rank - open_q_last <= cfg.max_offset_distance
                        and open_q_images < cfg.max_images_per_question):
                    verdict = self.classifier.judge(open_q_text, span["media_ref"])
                    if (verdict["is_related"]
                            and verdict["confidence"] > cfg.vl_confidence_threshold):
                        open_q["members"].append(rank)
                        open_q_last = rank
                        open_q_images += 1
                # unclaimed images fall through to the residual pass (A2)
            else:  # table / display_formula / inline_formula
                if open_q is not None and rank - open_q_last <= cfg.max_offset_distance:
                    open_q["members"].append(rank)
                    open_q_last = rank
                else:
                    groups.append({"type": kind, "members": [rank]})
        return groups


class ReplayAggregator:
    """Replays recorded group verdicts keyed by doc_id.

    Engine analog of the reference's persisted VL verdicts
    (cache/vl_results pickles + committed *_v2_result.json group
    assignments) that make merge reruns reproducible without the API.
    ``verdicts[doc_id]`` is a list of ``{"type": str, "members": [rank]}``.
    """

    def __init__(self, verdicts: Dict[str, List[Group]],
                 fallback: Optional[HeuristicAggregator] = None):
        self.verdicts = verdicts
        self.fallback = fallback

    def aggregate(self, doc_id: str, spans: List[Span]) -> List[Group]:
        if doc_id in self.verdicts:
            return [dict(g) for g in self.verdicts[doc_id]]
        if self.fallback is not None:
            return self.fallback.aggregate(doc_id, spans)
        return []


def postprocess(spans: List[Span], groups: List[Group]) -> List[Group]:
    """Residual assignment (A2, tests/..._v2.py:1168-1186): every span
    rank not covered by any group becomes a singleton ``unknown``
    group, so every span is consumed exactly once."""
    assigned = set()
    for g in groups:
        assigned.update(g["members"])
    for rank in range(len(spans)):
        if rank not in assigned:
            groups.append({"type": "unknown", "members": [rank]})
    return groups


def assemble_questions(doc_id: str, spans: List[Span],
                       groups: List[Group]) -> List[Dict[str, Any]]:
    """Build output rows: per group, offset-ordered member spans,
    text join " " (A1 envelope merge, tests/..._v2.py:1130-1166 — texts
    joined in member order, empties skipped), plus M10 type / M11 score.
    """
    n_spans = len(spans)
    rows: List[Dict[str, Any]] = []
    for ordinal, g in enumerate(groups, start=1):
        members = [m for m in g["members"] if 0 <= m < n_spans]
        # members are produced in ascending rank order by both
        # aggregators — sort only when an out-of-order list sneaks in
        if any(b < a for a, b in zip(members, members[1:])):
            members.sort()
        texts: List[str] = []
        out_spans: List[Dict[str, Any]] = []
        qnum = -1
        n_images = 0
        split_any = False
        for i, m in enumerate(members):
            s = spans[m]
            text = s["text"]
            if text:
                texts.append(text)
            if qnum < 0:
                sq = s.get("question_number", -1)
                if sq is not None and sq >= 0:
                    qnum = sq
            if s["kind"] == "image":
                n_images += 1
            if s.get("split_from_merged", False):
                split_any = True
            out_spans.append({"kind": s["kind"], "text": text,
                              "media_ref": s["media_ref"], "offset": i})
        merged_text = " ".join(texts)
        is_q = g["type"] == "question"
        rows.append({
            "doc_id": doc_id,
            "question_id": ordinal,
            "group_type": g["type"],
            "question_number": qnum,
            "spans": out_spans,
            "merged_text": merged_text,
            "qtype": textfns.identify_question_type(merged_text) if is_q else "",
            "score": textfns.extract_score(merged_text) if is_q else 0,
            "n_images": n_images,
            "split_from_merged": split_any,
        })
    return rows
