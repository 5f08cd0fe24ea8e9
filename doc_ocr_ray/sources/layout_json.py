"""S1: PP-OCR-VL layout-JSON reader -> interleaved span rows.

The reference loads per-page result JSONs and digs
``layoutParsingResults[0].prunedResult.parsing_res_list``
(extractor.py:63-74); this reader does the same ingestion as a Ray
Data pipeline over many files: ``read_binary_files`` -> per-batch JSON
parse -> one (doc_id, spans) row per page.

Block -> span mapping (FIXTURES.md section 1): kind=block_label,
text=block_content, media_ref="img:"+block_id for image blocks,
offset = block_order when present else file order (ties (y1, x1)).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List

import pyarrow as pa

from doc_ocr_ray.schema import SPAN_STRUCT


def blocks_to_spans(blocks: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Order: block_order when present; otherwise file order (which is
    the detector's reading order in every observed result JSON)."""
    def order_key(idx_block):
        idx, b = idx_block
        order = b.get("block_order")
        return (0, order) if order is not None else (1, idx)
    ordered = sorted(enumerate(blocks), key=order_key)
    spans = []
    for rank, (_, b) in enumerate(ordered):
        label = b.get("block_label", "text")
        spans.append({
            "kind": label,
            "text": b.get("block_content", "") or "",
            "media_ref": f"img:{b.get('block_id')}" if label == "image" else "",
            "offset": rank,
        })
    return spans


def parse_layout_json(doc_id: str, payload: bytes) -> List[Dict[str, Any]]:
    """One result JSON -> one row per page."""
    data = json.loads(payload)
    rows = []
    results = data.get("layoutParsingResults", [])
    for page_idx, page in enumerate(results):
        blocks = (page.get("prunedResult") or {}).get("parsing_res_list", [])
        suffix = f"#page{page_idx}" if len(results) > 1 else ""
        rows.append({"doc_id": f"{doc_id}{suffix}",
                     "spans": blocks_to_spans(blocks)})
    return rows


def read_layout_json(paths) -> "ray.data.Dataset":
    """Directory / file list of PP-OCR-VL result JSONs -> documents
    Dataset.  Parsing runs distributed, one task per file batch."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        rows: List[Dict[str, Any]] = []
        for path, payload in zip(batch["path"].to_pylist(),
                                 batch["bytes"].to_pylist()):
            stem = os.path.splitext(os.path.basename(path))[0]
            rows.extend(parse_layout_json(stem, payload))
        return pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "spans": pa.array([r["spans"] for r in rows],
                              pa.list_(SPAN_STRUCT)),
        })

    return ray.data.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="pyarrow")
