"""Converter: reference golden fixtures -> engine tables + expectations.

The reference commits, per analyzed page (SURVEY.md section 5):
- ``{stem}_v2_paddle_raw.json``  — input snapshot (blocks with
  id/bbox/text/label) -> converted to one input row per doc;
- ``{stem}_v2_split.json``       — split truth (children parent*100+i);
- ``{stem}_v2_result.json``      — grouping truth (question_groups with
  block_ids / merged_text).

Mapping per FIXTURES.md section 1: block -> span with kind=label,
text=text, media_ref="img:"+id for images, offset=file-order rank
(file order is reading order in these fixtures).

The grouping truth contains the reference VL model's semantic verdicts;
``replay_verdicts`` converts them into the engine's ReplayAggregator
input (rank-keyed), the analog of the reference's own cached VL results
that make merge reruns reproducible without the API
(question_merger.py:344-363).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Tuple

import pyarrow as pa

from doc_ocr_ray.schema import DOCUMENTS_SCHEMA, SPAN_STRUCT

FIXTURE_DIR = "/root/reference/output/exam_analysis_vl_v2"
FIXTURE_STEMS = ["2", "3", "7", "8", "mifeng_doubao_1"]

# v1 analyzer fixtures (no split step — the enable_ocr_split=False
# behavior): {stem}_vl_paddle_raw.json + {stem}_vl_result.json
V1_FIXTURE_DIR = "/root/reference/output/exam_analysis_vl"
V1_FIXTURE_STEMS = ["1", "mifeng_1"]


def _load(stem: str, which: str) -> Dict[str, Any]:
    path = os.path.join(FIXTURE_DIR, f"{stem}_v2_{which}.json")
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def _media_ref(block: Dict[str, Any]) -> str:
    return f"img:{block['id']}" if block["label"] == "image" else ""


def fixture_available() -> bool:
    return os.path.isdir(FIXTURE_DIR)


def load_fixture_documents(stems: List[str] = None) -> pa.Table:
    """Input rows (doc_id, spans) from the *_v2_paddle_raw.json snapshots."""
    stems = stems or FIXTURE_STEMS
    doc_ids, span_lists = [], []
    for stem in stems:
        raw = _load(stem, "paddle_raw")
        spans = [
            {"kind": b["label"], "text": b["text"],
             "media_ref": _media_ref(b), "offset": i}
            for i, b in enumerate(raw["blocks"])
        ]
        doc_ids.append(stem)
        span_lists.append(spans)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.string()),
         "spans": pa.array(span_lists, pa.list_(SPAN_STRUCT))},
        schema=DOCUMENTS_SCHEMA)


def expected_split_sequences(stems: List[str] = None
                             ) -> Dict[str, List[Tuple[str, str, str]]]:
    """Per doc, the expected post-split span sequence as ordered
    (kind, text, media_ref) tuples, from *_v2_split.json file order."""
    stems = stems or FIXTURE_STEMS
    out: Dict[str, List[Tuple[str, str, str]]] = {}
    for stem in stems:
        split = _load(stem, "split")
        out[stem] = [(b["label"], b["text"], _media_ref(b))
                     for b in split["blocks"]]
    return out


def _rank_map(stem: str) -> Dict[int, int]:
    """block id (post-split) -> rank in the post-split span sequence."""
    split = _load(stem, "split")
    return {b["id"]: i for i, b in enumerate(split["blocks"])}


def replay_verdicts(stems: List[str] = None) -> Dict[str, List[Dict[str, Any]]]:
    """ReplayAggregator input: doc_id -> [{"type", "members": [rank]}],
    from *_v2_result.json question_groups (block ids -> ranks)."""
    stems = stems or FIXTURE_STEMS
    out: Dict[str, List[Dict[str, Any]]] = {}
    for stem in stems:
        res = _load(stem, "result")
        ranks = _rank_map(stem)
        groups = []
        for g in res["question_groups"]:
            members = [ranks[i] for i in g["block_ids"] if i in ranks]
            groups.append({"type": g["type"], "members": members})
        out[stem] = groups
    return out


def _load_v1(stem: str, which: str) -> Dict[str, Any]:
    path = os.path.join(V1_FIXTURE_DIR, f"{stem}_vl_{which}.json")
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def _v1_media_ref(block: Dict[str, Any]) -> str:
    return f"img:{int(block['id'])}" if block["label"] == "image" else ""


def load_v1_documents(stems: List[str] = None) -> pa.Table:
    """v1 input rows; block ids are strings in the v1 raw dumps."""
    stems = stems or V1_FIXTURE_STEMS
    doc_ids, span_lists = [], []
    for stem in stems:
        raw = _load_v1(stem, "paddle_raw")
        spans = [
            {"kind": b["label"], "text": b["text"],
             "media_ref": _v1_media_ref(b), "offset": i}
            for i, b in enumerate(raw["blocks"])
        ]
        doc_ids.append(f"v1_{stem}")
        span_lists.append(spans)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.string()),
         "spans": pa.array(span_lists, pa.list_(SPAN_STRUCT))},
        schema=DOCUMENTS_SCHEMA)


def v1_replay_verdicts(stems: List[str] = None) -> Dict[str, List[Dict[str, Any]]]:
    """ReplayAggregator input for the v1 pages: ranks are raw file
    order (no split step in v1)."""
    stems = stems or V1_FIXTURE_STEMS
    out: Dict[str, List[Dict[str, Any]]] = {}
    for stem in stems:
        raw = _load_v1(stem, "paddle_raw")
        res = _load_v1(stem, "result")
        ranks = {int(b["id"]): i for i, b in enumerate(raw["blocks"])}
        out[f"v1_{stem}"] = [
            {"type": g["type"],
             "members": [ranks[i] for i in g["block_ids"] if i in ranks]}
            for g in res["question_groups"]]
    return out


def v1_expected_group_sequences(stems: List[str] = None
                                ) -> Dict[str, List[Dict[str, Any]]]:
    stems = stems or V1_FIXTURE_STEMS
    out: Dict[str, List[Dict[str, Any]]] = {}
    for stem in stems:
        raw = _load_v1(stem, "paddle_raw")
        res = _load_v1(stem, "result")
        by_id = {int(b["id"]): b for b in raw["blocks"]}
        ranks = {int(b["id"]): i for i, b in enumerate(raw["blocks"])}
        groups = []
        for g in res["question_groups"]:
            ids = sorted((i for i in g["block_ids"] if i in by_id),
                         key=lambda i: ranks[i])
            groups.append({
                "type": g["type"],
                "merged_text": g["merged_text"],
                "spans": [(by_id[i]["label"], by_id[i]["text"],
                           _v1_media_ref(by_id[i])) for i in ids],
            })
        out[f"v1_{stem}"] = groups
    return out


def expected_group_sequences(stems: List[str] = None
                             ) -> Dict[str, List[Dict[str, Any]]]:
    """Per doc, expected groups in result order: type, merged_text, and
    the ordered (kind, text, media_ref) span sequence of the members."""
    stems = stems or FIXTURE_STEMS
    out: Dict[str, List[Dict[str, Any]]] = {}
    for stem in stems:
        res = _load(stem, "result")
        split = _load(stem, "split")
        by_id = {b["id"]: b for b in split["blocks"]}
        ranks = _rank_map(stem)
        groups = []
        for g in res["question_groups"]:
            ids = [i for i in g["block_ids"] if i in by_id]
            ids.sort(key=lambda i: ranks[i])
            seq = [(by_id[i]["label"], by_id[i]["text"], _media_ref(by_id[i]))
                   for i in ids]
            groups.append({
                "type": g["type"],
                "merged_text": g["merged_text"],
                "spans": seq,
            })
        out[stem] = groups
    return out
