"""Per-document rendering & metadata pipelines.

- ``render_markdown``: the markdown sink (S5) — span sequence ->
  markdown text, boilerplate kinds skipped per the reference's
  ``markdownIgnoreLabels`` (tests/pp_ocr_vl.py:28-36), images as
  markdown references keyed by media_ref (the reference writes
  ``res["markdown"]["text"]`` + image files, tests/pp_ocr_vl.py:64-85).
- ``extract_exam_info``: the exam-info extractor (M12,
  extractor.py:138-193) surfaced as a table: one row per doc with
  title/subject/grade/time_limit/total_score.
"""
from __future__ import annotations

from typing import Any, Dict, List

import pyarrow as pa

from doc_ocr_ray.config import PipelineConfig, DEFAULT_CONFIG
from doc_ocr_ray.functions import textfns


def render_doc_markdown(spans: List[Dict[str, Any]],
                        config: PipelineConfig = DEFAULT_CONFIG) -> str:
    lines: List[str] = []
    for span in sorted(spans, key=lambda s: s["offset"]):
        kind, text = span["kind"], span["text"]
        if kind in config.boilerplate_kinds:
            continue
        if kind == "doc_title":
            lines.append(f"# {text}")
        elif kind == "paragraph_title":
            lines.append(f"## {text}")
        elif kind == "image":
            lines.append(f"![]({span['media_ref']})")
        elif text:
            lines.append(text)
    return "\n\n".join(lines)


def render_markdown(ds, config: PipelineConfig = DEFAULT_CONFIG):
    """documents Dataset -> (doc_id, markdown) rows."""
    def render(batch: pa.Table) -> pa.Table:
        docs = batch["doc_id"].to_pylist()
        span_lists = batch["spans"].to_pylist()
        return pa.table({
            "doc_id": pa.array(docs, pa.string()),
            "markdown": pa.array(
                [render_doc_markdown(s or [], config) for s in span_lists],
                pa.string()),
        })
    return ds.map_batches(render, batch_format="pyarrow")


def extract_exam_info(ds):
    """documents Dataset -> one metadata row per doc (M12 semantics:
    last doc_title wins for the title, first matching text span for
    time/total)."""
    def info(batch: pa.Table) -> pa.Table:
        docs = batch["doc_id"].to_pylist()
        span_lists = batch["spans"].to_pylist()
        rows = [textfns.extract_exam_info(
                    sorted(s or [], key=lambda x: x["offset"]))
                for s in span_lists]
        return pa.table({
            "doc_id": pa.array(docs, pa.string()),
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "subject": pa.array([r["subject"] for r in rows], pa.string()),
            "grade": pa.array([r["grade"] for r in rows], pa.string()),
            "time_limit": pa.array([r["time_limit"] for r in rows], pa.string()),
            "total_score": pa.array([r["total_score"] for r in rows], pa.string()),
        })
    return ds.map_batches(info, batch_format="pyarrow")
