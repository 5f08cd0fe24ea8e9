"""V3 pure-VL one-shot pipeline: page image -> structured question
regions in a single model call (no layout-detection stage).

Reference twin: tests/exam_paper_splitter_v3.py — ExamPaperParser
builds one prompt (:42-89), sends the page image, parses the JSON
response with bbox strings ``<bbox>x y x y</bbox>`` (:92-106),
denormalizes 0-1000 coordinates to pixels (:108-126), and writes a
JSON + annotated-image sink (:277-308).

Engine shape: an actor-pool ``map_batches`` over the media table
(one page image per row) -> one output row per parsed question with
pixel-domain bboxes and blank counts.  The VL call is behind the same
pluggable-parser pattern as O1-O4: ``V3ClientParser`` for a real
OpenAI-compatible backend, ``StandInParser`` as the deterministic
no-network fake (payload-hash derived, exercises every downstream
step).
"""
from __future__ import annotations

import hashlib
import json
import re
from typing import Any, Dict, List, Optional

import pyarrow as pa

_BBOX = re.compile(r"<bbox>\s*(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*</bbox>")

# prompt contract mirrored from tests/exam_paper_splitter_v3.py:49-89
# (same reasoning as the relatedness/aggregate prompts: the text IS the
# model contract)
V3_PROMPT = """你是一个专业的试卷分析助手。请仔细分析这张试卷图片，识别并定位每道题目。

任务要求：
1. 识别所有题目，包括题目本身、配图、选项、作答区域
2. 对于每道题目，输出题目的完整边界框
3. 识别每道题目中的所有填空位置（横线、括号、方框、空白区域等）
4. 对于跨页的题目，输出多个边界框区域

输出格式（严格按照JSON格式）：
{"paper_info": {"total_questions": 题目总数},
 "questions": [{"question_id": 题号, "question_type": "题型",
   "question_text": "题目完整文本内容",
   "question_bboxes": ["<bbox>x_min y_min x_max y_max</bbox>"],
   "blanks": [{"blank_id": 填空序号,
     "blank_bbox": "<bbox>x_min y_min x_max y_max</bbox>",
     "blank_type": "填空类型"}]}]}

注意事项：坐标格式必须是 <bbox>x_min y_min x_max y_max</bbox>，坐标值范围0-1000。
请严格按照上述JSON格式输出，不要添加任何其他内容。"""

_QTYPES = ["填空题", "选择题", "计算题", "应用题", "判断题", "解答题"]


def parse_bbox(bbox_str: str) -> Optional[List[int]]:
    """``<bbox>175 98 791 476</bbox>`` -> [175, 98, 791, 476]
    (exam_paper_splitter_v3.py:92-106)."""
    m = _BBOX.search(bbox_str or "")
    return [int(m.group(i)) for i in range(1, 5)] if m else None


def denormalize_bbox(coords: List[int], width: int, height: int) -> List[int]:
    """0-1000 -> pixels with the reference's exact arithmetic
    (``int(x * w / 1000)``, exam_paper_splitter_v3.py:108-126)."""
    x1, y1, x2, y2 = coords
    return [int(x1 * width / 1000), int(y1 * height / 1000),
            int(x2 * width / 1000), int(y2 * height / 1000)]


def parse_v3_response(text: str) -> Dict[str, Any]:
    """Fence-strip + JSON parse + bbox-string resolution
    (exam_paper_splitter_v3.py:128-186).  Raises on unparseable JSON
    (the reference propagates too); the pipeline stage catches per
    page."""
    cleaned = re.sub(r"```json\s*", "", text or "")
    cleaned = re.sub(r"```\s*", "", cleaned).strip()
    data = json.loads(cleaned)
    for q in data.get("questions", []):
        q["question_bboxes"] = [c for c in
                                (parse_bbox(b) for b in
                                 q.get("question_bboxes", []))
                                if c]
        for blank in q.get("blanks", []):
            coords = parse_bbox(blank.get("blank_bbox", ""))
            if coords:
                blank["blank_bbox"] = coords
    return data


class StandInParser:
    """Deterministic no-network parse: question count/type/bboxes are
    md5-derived from the payload, so the full downstream path (bbox
    strings -> parse -> denormalize -> rows) runs reproducibly."""

    def parse(self, media_ref: str, payload: bytes) -> Dict[str, Any]:
        h = hashlib.md5(payload or media_ref.encode()).digest()
        n_q = 1 + h[0] % 4
        questions = []
        for i in range(n_q):
            x1, y1 = 50 + (h[i + 1] % 40) * 10, 60 + i * (900 // n_q)
            x2, y2 = min(999, x1 + 500), min(999, y1 + 800 // n_q)
            n_blanks = h[i + 5] % 3
            questions.append({
                "question_id": i + 1,
                "question_type": _QTYPES[h[i + 9] % len(_QTYPES)],
                "question_text": f"第{i + 1}题（{media_ref}）",
                "question_bboxes": [f"<bbox>{x1} {y1} {x2} {y2}</bbox>"],
                "blanks": [{
                    "blank_id": b + 1,
                    "blank_bbox": f"<bbox>{x1 + 20 * b} {y1 + 5} "
                                  f"{x1 + 20 * b + 15} {y1 + 15}</bbox>",
                    "blank_type": "横线",
                } for b in range(n_blanks)],
            })
        raw = json.dumps({"paper_info": {"total_questions": n_q},
                          "questions": questions}, ensure_ascii=False)
        return parse_v3_response(raw)


class V3ClientParser:
    """Client-backed one-shot parse (ExamPaperParser.parse_image,
    exam_paper_splitter_v3.py:186-239): one chat call per page with
    the V3 prompt + image; any client/parse failure returns None and
    the page is recorded as a parse-error row."""

    def __init__(self, client: Any, model: str, temperature: float = 0.1,
                 max_tokens: int = 4000):
        if client is None:
            raise ValueError("V3ClientParser needs an OpenAI-compatible "
                             "client; use StandInParser offline")
        self.client = client
        self.model = model
        self.temperature = temperature
        self.max_tokens = max_tokens

    def parse(self, media_ref: str, payload: bytes) -> Optional[Dict[str, Any]]:
        try:
            import base64
            content = [
                {"type": "image_url", "image_url": {
                    "url": "data:image/png;base64,"
                           + base64.b64encode(payload or b"").decode()}},
                {"type": "text", "text": V3_PROMPT},
            ]
            response = self.client.chat.completions.create(
                model=self.model,
                messages=[{"role": "user", "content": content}],
                temperature=self.temperature,
                max_tokens=self.max_tokens)
            return parse_v3_response(response.choices[0].message.content)
        except Exception:
            return None


class V3ParseStage:
    """Actor-pool stage: media rows -> one row per parsed question.

    Parser construction happens once per actor (``__init__``); pages
    whose parse fails emit a single question_id=-1 row (poison-page
    containment, same discipline as the extract stage).
    """

    def __init__(self, parser: Any = None, page_width: int = 1000,
                 page_height: int = 1400):
        if parser is None:
            parser = StandInParser()
        elif isinstance(parser, type) or (
                callable(parser) and not hasattr(parser, "parse")):
            # zero-arg factory (incl. a bare parser CLASS): real
            # clients build once per actor here rather than pickling a
            # live connection.  The isinstance check matters — a class
            # also hasattr 'parse', and keeping it unbound would bind
            # self=media_ref at call time.
            parser = parser()
        self.parser = parser
        self.w, self.h = page_width, page_height

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("media_ref", "doc_id", "question_id",
                               "question_type", "question_text",
                               "bbox", "n_regions", "n_blanks")}
        for ref, doc, payload in zip(batch["media_ref"].to_pylist(),
                                     batch["doc_id"].to_pylist(),
                                     batch["payload"].to_pylist()):
            parsed = self.parser.parse(ref, payload or b"")
            qs = (parsed or {}).get("questions", [])
            if parsed is None:
                out["media_ref"].append(ref); out["doc_id"].append(doc)
                out["question_id"].append(-1)
                out["question_type"].append("")
                out["question_text"].append("")
                out["bbox"].append([]); out["n_regions"].append(0)
                out["n_blanks"].append(0)
                continue
            for q in qs:
                boxes = [denormalize_bbox(c, self.w, self.h)
                         for c in q.get("question_bboxes", [])]
                try:
                    qid = int(q.get("question_id", -1))
                except (TypeError, ValueError):
                    qid = -1        # null/non-numeric id from a real model
                out["media_ref"].append(ref); out["doc_id"].append(doc)
                out["question_id"].append(qid)
                out["question_type"].append(q.get("question_type", ""))
                out["question_text"].append(q.get("question_text", ""))
                out["bbox"].append(boxes[0] if boxes else [])
                out["n_regions"].append(len(boxes))
                out["n_blanks"].append(len(q.get("blanks", [])))
        return pa.table({
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "question_id": pa.array(out["question_id"], pa.int32()),
            "question_type": pa.array(out["question_type"], pa.string()),
            "question_text": pa.array(out["question_text"], pa.string()),
            "bbox": pa.array(out["bbox"], pa.list_(pa.int32())),
            "n_regions": pa.array(out["n_regions"], pa.int32()),
            "n_blanks": pa.array(out["n_blanks"], pa.int32()),
        })


def parse_exam_pages(media_ds, parser_factory: Any = None,
                     page_width: int = 1000, page_height: int = 1400,
                     concurrency=(1, 8), batch_size: int = 16):
    """Media table -> per-question rows via the one-shot VL parse.

    Small ``batch_size``: each row carries a page image payload, and a
    real parser holds a model client — the canonical actor-pool shape
    for fat-row model stages."""
    kwargs: Dict[str, Any] = {}
    if parser_factory is not None:
        kwargs["parser"] = parser_factory
    return media_ds.map_batches(
        V3ParseStage, fn_constructor_kwargs={
            **kwargs, "page_width": page_width, "page_height": page_height},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
