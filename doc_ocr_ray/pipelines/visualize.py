"""Debug visualization sink (S6 analog).

The reference draws per-page annotated JPEGs for visual fixture
diffing (src/question_extraction/visualizer.py:29-343: colored box per
block, group label text).  No image libraries exist here and the
engine works in the span domain, so the analog is a deterministic SVG
per document: one colored bar per group in reading order, bar length
proportional to merged-text length, group type + question number +
image count as the label.  Diffable (text), viewable (browser), and
written DISTRIBUTED — one coarse-partition groupby co-locates each
doc's rows, every group task writes its docs' files (the engine's
version of the reference's per-page image writes).
"""
from __future__ import annotations

import html
import os
from typing import List

import pandas as pd

GROUP_COLORS = {
    "question": "#4e79a7",
    "doc_title": "#e15759",
    "header": "#f28e2b",
    "text": "#76b7b2",
    "aside": "#bab0ab",
    "table": "#59a14f",
    "unknown": "#9c755f",
}
_ROW_H = 22
_CHAR_W = 6.0
_MAX_W = 900


def doc_svg(doc_id: str, rows: List[dict]) -> str:
    """Question rows of ONE doc (ordered by question_id) -> SVG text."""
    rows = sorted(rows, key=lambda r: r["question_id"])
    height = _ROW_H * (len(rows) + 1)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_MAX_W + 320}" '
        f'height="{height}" font-family="monospace" font-size="11">',
        f'<text x="4" y="14">{html.escape(doc_id)} '
        f'({len(rows)} groups)</text>',
    ]
    for i, r in enumerate(rows):
        y = _ROW_H * (i + 1)
        gtype = r["group_type"]
        color = GROUP_COLORS.get(gtype, "#79706e")
        w = max(4, min(_MAX_W, int(len(r.get("merged_text") or "") * _CHAR_W)))
        qn = r.get("question_number", -1)
        label = gtype + (f" #{qn}" if qn is not None and qn >= 0 else "")
        n_img = r.get("n_images", 0)
        if n_img:
            label += f" [{n_img} img]"
        parts.append(f'<rect x="4" y="{y + 4}" width="{w}" '
                     f'height="{_ROW_H - 8}" fill="{color}" '
                     f'fill-opacity="0.6" stroke="{color}"/>')
        parts.append(f'<text x="{w + 10}" y="{y + _ROW_H - 8}">'
                     f'{html.escape(label)}</text>')
    parts.append("</svg>")
    return "\n".join(parts)


def write_annotations(questions_ds, out_dir: str,
                      num_partitions: int = 64) -> int:
    """Questions Dataset -> one ``<doc_id>.svg`` per document under
    ``out_dir``.  Returns the number of files written.  Debug-scale
    sink: run it on a fixture slice, not the corpus."""
    os.makedirs(out_dir, exist_ok=True)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[["doc_id", "question_id", "group_type",
                       "question_number", "merged_text", "n_images"]].copy()
        from doc_ocr_ray.util import coarse_part
        batch["part"] = coarse_part(batch["doc_id"], num_partitions)
        return batch

    def write_part(group: pd.DataFrame) -> pd.DataFrame:
        written = []
        for doc_id, g in group.groupby("doc_id", sort=False):
            safe = "".join(c if c.isalnum() or c in "-_." else "_"
                           for c in str(doc_id))
            path = os.path.join(out_dir, f"{safe}.svg")
            tmp = f"{path}.tmp.{os.getpid()}"   # unique per writer: task
            # retry/speculation must never interleave into one tmp file
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(doc_svg(str(doc_id), g.to_dict("records")))
            os.replace(tmp, path)
            written.append(doc_id)
        return pd.DataFrame({"doc_id": written})

    done = (questions_ds.map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(write_part, batch_format="pandas"))
    return done.count()
