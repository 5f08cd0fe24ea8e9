"""Pixel-domain geometry utilities (M7-M9, A1, evaluator IoU).

The span-domain engine does not need pixel coordinates for its
invariant (offsets are exact — SURVEY.md section 2.2 M7/M8), but the
reference's bbox toolbox is kept for parity and for pipelines that
re-attach layout geometry:

- linear y-estimation fallback:   question_splitter.py:277-308
- 4-point poly -> bbox + rebase:  question_splitter.py:310-336
- 0-1000 normalized -> pixels:    tests/exam_paper_splitter_v3.py:92-126
- scale-confusion detector:       docs/坐标缩放问题修复说明.md:39-62
- min/max envelope merge:         question_merger.py:542-555
- IoU:                            src/question_extraction/evaluator.py:135-161
"""
from __future__ import annotations

from typing import Dict, List, Sequence

Bbox = List[int]


def estimate_positions_linear(positions: Sequence[int], text_length: int,
                              bbox: Bbox, number_height: int = 30
                              ) -> List[Dict]:
    """Linear interpolation of y from char-position ratio (M7); fixed
    number height, confidence 0.5, exactly the reference's fallback."""
    x1, y1, x2, y2 = bbox
    block_height = y2 - y1
    out = []
    for pos in positions:
        rel = pos / text_length if text_length > 0 else 0
        est_y = y1 + int(block_height * rel)
        out.append({"bbox": [x1, est_y, x2, est_y + number_height],
                    "confidence": 0.5, "estimated": True})
    return out


def poly_to_bbox(poly: Sequence[Sequence[float]], base_bbox: Bbox) -> Bbox:
    """4-point OCR poly -> axis-aligned bbox rebased to page coords (M8)."""
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    return [int(base_bbox[0] + min(xs)), int(base_bbox[1] + min(ys)),
            int(base_bbox[0] + max(xs)), int(base_bbox[1] + max(ys))]


def rescale_bbox_0_1000(bbox: Sequence[float], width: int, height: int) -> Bbox:
    """Normalized 0-1000 VL bbox -> pixel bbox (M9)."""
    x1, y1, x2, y2 = bbox
    return [int(x1 / 1000 * width), int(y1 / 1000 * height),
            int(x2 / 1000 * width), int(y2 / 1000 * height)]


def looks_normalized(first_bbox: Sequence[float], width: int,
                     height: int) -> bool:
    """Scale-confusion heuristic: coordinates are 0-1000-normalized when
    the first box's max coordinate is under a third of the image
    dimension (docs/坐标缩放问题修复说明.md:39-62)."""
    m = max(first_bbox)
    return m < max(width, height) / 3


def bbox_envelope(bboxes: Sequence[Bbox]) -> Bbox:
    """Min/max envelope over member boxes (A1); empty -> [0,0,0,0]."""
    valid = [b for b in bboxes if len(b) == 4]
    if not valid:
        return [0, 0, 0, 0]
    return [min(b[0] for b in valid), min(b[1] for b in valid),
            max(b[2] for b in valid), max(b[3] for b in valid)]


def iou(a: Bbox, b: Bbox) -> float:
    """Intersection-over-union (evaluator.py:135-161)."""
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    if ix2 <= ix1 or iy2 <= iy1:
        return 0.0
    inter = (ix2 - ix1) * (iy2 - iy1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0
