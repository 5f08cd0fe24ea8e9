"""The extraction stage: documents in, question groups out.

One ``map_batches`` stage does the whole per-document chain —
boilerplate strip (M1) -> detect (M2-M5) -> split (M6) -> group
(O4 stand-in / replay) -> claim media (J1-J3) -> residual (A2) ->
assemble (A1, M10-M12).  The reference runs the same chain one page at
a time in a single thread (extractor.py:36-136); here each batch of
documents is an independent task/actor call, so the stage is
embarrassingly parallel and needs NO shuffle: a document's spans are
one row, and every operator above is intra-document.

Hosted as a callable class so Ray Data runs it on an actor pool:
pattern compilation, the classifier "model", and the verdict cache are
built once per actor in ``__init__`` (stateful stage, SURVEY.md
section 2.3), not per batch.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import pyarrow as pa

from doc_ocr_ray.config import PipelineConfig, DEFAULT_CONFIG
from doc_ocr_ray.functions.detect import QuestionNumberDetector
from doc_ocr_ray.functions.split import split_doc_spans
from doc_ocr_ray.functions.merge import (
    HeuristicAggregator, RelatednessClassifier, ReplayAggregator,
    assemble_questions, postprocess,
)
from doc_ocr_ray.schema import QUESTIONS_SCHEMA, SPAN_STRUCT


def extract_one_doc(doc_id: str, spans: List[Dict[str, Any]],
                    detector: QuestionNumberDetector,
                    aggregator) -> List[Dict[str, Any]]:
    """Run the full per-document chain; pure function of its inputs."""
    cfg = detector.config
    # M1: strip boilerplate from the question path (kinds per
    # tests/pp_ocr_vl.py:28-36) — stripped spans still surface as
    # "aside" groups so every input span is accounted for.
    refined = split_doc_spans(spans, detector)
    groups = aggregator.aggregate(doc_id, refined)
    groups = postprocess(refined, groups)
    return assemble_questions(doc_id, refined, groups)


def _questions_to_table(rows: List[Dict[str, Any]]) -> pa.Table:
    """Row dicts -> Arrow table, building the nested spans column from
    flat parallel arrays + list offsets (no per-span dict conversion)."""
    n = len(rows)
    doc_id, question_id, group_type, question_number = [], [], [], []
    merged_text, qtype, score, n_images, split_fm = [], [], [], [], []
    s_kind, s_text, s_ref, s_off = [], [], [], []
    offsets = [0]
    for r in rows:
        doc_id.append(r["doc_id"])
        question_id.append(r["question_id"])
        group_type.append(r["group_type"])
        question_number.append(r["question_number"])
        merged_text.append(r["merged_text"])
        qtype.append(r["qtype"])
        score.append(r["score"])
        n_images.append(r["n_images"])
        split_fm.append(r["split_from_merged"])
        for s in r["spans"]:
            s_kind.append(s["kind"])
            s_text.append(s["text"])
            s_ref.append(s["media_ref"])
            s_off.append(s["offset"])
        offsets.append(len(s_kind))
    struct = pa.StructArray.from_arrays(
        [pa.array(s_kind, pa.string()), pa.array(s_text, pa.string()),
         pa.array(s_ref, pa.string()), pa.array(s_off, pa.int32())],
        fields=list(SPAN_STRUCT))
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    return pa.Table.from_arrays(
        [pa.array(doc_id, pa.string()), pa.array(question_id, pa.int32()),
         pa.array(group_type, pa.string()),
         pa.array(question_number, pa.int32()), spans,
         pa.array(merged_text, pa.string()), pa.array(qtype, pa.string()),
         pa.array(score, pa.int32()), pa.array(n_images, pa.int32()),
         pa.array(split_fm, pa.bool_())],
        schema=QUESTIONS_SCHEMA)


class ExtractStage:
    """Callable-class stage for ``ds.map_batches(ExtractStage, ...)``.

    ``verdicts`` switches the aggregator to replay mode (fixture
    equality); otherwise the deterministic heuristic aggregator with
    the relatedness classifier runs.
    """

    def __init__(self, config: Optional[PipelineConfig] = None,
                 verdicts: Optional[Dict[str, List[Dict[str, Any]]]] = None):
        self.config = config or DEFAULT_CONFIG
        self.detector = QuestionNumberDetector(self.config)
        self.classifier = RelatednessClassifier(self.config)
        heuristic = HeuristicAggregator(self.config, self.classifier)
        if verdicts:
            self.aggregator = ReplayAggregator(verdicts, fallback=heuristic)
        else:
            self.aggregator = heuristic

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        span_lists = batch["spans"].to_pylist()
        out: List[Dict[str, Any]] = []
        for doc_id, spans in zip(doc_ids, span_lists):
            try:
                out.extend(extract_one_doc(doc_id, spans or [],
                                           self.detector, self.aggregator))
            except Exception as exc:
                # poison-doc containment: one "error" row, job continues
                # (engine analog of the reference's keep-original-on-
                # failure ladders, tests/..._v2.py:1345-1347)
                if self.config.fail_fast:
                    raise
                out.append({
                    "doc_id": doc_id, "question_id": 1,
                    "group_type": "error", "question_number": -1,
                    "spans": [], "merged_text": f"{type(exc).__name__}: {exc}"[:500],
                    "qtype": "", "score": 0, "n_images": 0,
                    "split_from_merged": False,
                })
        return _questions_to_table(out)


class SplitStage:
    """Split-only stage: documents in, documents with rewritten spans
    out (the first-commit end-to-end slice; SURVEY.md section 7 step 2)."""

    def __init__(self, config: Optional[PipelineConfig] = None):
        self.config = config or DEFAULT_CONFIG
        self.detector = QuestionNumberDetector(self.config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        span_lists = batch["spans"].to_pylist()
        new_lists = []
        for spans in span_lists:
            refined = split_doc_spans(spans or [], self.detector)
            new_lists.append([
                {"kind": s["kind"], "text": s["text"],
                 "media_ref": s["media_ref"], "offset": s["offset"]}
                for s in refined])
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.string()),
             "spans": pa.array(new_lists, pa.list_(SPAN_STRUCT))})
