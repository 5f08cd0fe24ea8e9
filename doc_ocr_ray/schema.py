"""Arrow schemas for the interleaved-document data model.

One logical table, columnar (SURVEY.md section 1.3): a document is one
row of ``(doc_id, spans)`` where ``spans`` is an offset-ordered list of
``(kind, text, media_ref, offset)`` structs.  This is the engine's
re-expression of the reference's layout-block lists
(/root/reference/src/question_extraction/extractor.py:71-79).
"""
from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

DOCUMENTS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

# Output: one row per (doc, group).  ``spans`` carries the final span
# sequence of the group; the correctness invariant compares
# (kind, text, media_ref, order-by-offset) only.
QUESTIONS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("question_id", pa.int32()),        # 1-based ordinal within the doc
    ("group_type", pa.string()),        # question | doc_title | header | aside | unknown | text | table
    ("question_number", pa.int32()),    # detected number; -1 when absent
    ("spans", pa.list_(SPAN_STRUCT)),
    ("merged_text", pa.string()),       # member texts joined " " in offset order (A1)
    ("qtype", pa.string()),             # M10 question-type heuristic
    ("score", pa.int32()),              # M11 score extraction; 0 when absent
    ("n_images", pa.int32()),
    ("split_from_merged", pa.bool_()),
])


def spans_from_lists(kinds, texts, media_refs, offsets) -> list[dict]:
    """Build a span list-of-dicts (row form) from parallel lists."""
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": int(o)}
        for k, t, m, o in zip(kinds, texts, media_refs, offsets)
    ]


def empty_documents_table() -> pa.Table:
    return pa.table(
        {"doc_id": pa.array([], pa.string()),
         "spans": pa.array([], pa.list_(SPAN_STRUCT))})


def empty_questions_table() -> pa.Table:
    arrays = [pa.array([], f.type) for f in QUESTIONS_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=QUESTIONS_SCHEMA)
