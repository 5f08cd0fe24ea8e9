"""doc_ocr_ray — a Ray-Data-native document-extraction engine.

Rebuilds the semantics of SunJINM/doc-ocr (question-block split /
text-media merge over interleaved OCR'd documents) as streaming Ray
Data pipelines over zero-copy Arrow batches.  See SURVEY.md for the
operator-by-operator mapping.
"""
from doc_ocr_ray.config import PipelineConfig, DEFAULT_CONFIG
from doc_ocr_ray.runtime import patch_hash_shuffle_schema_broadcast
from doc_ocr_ray.schema import DOCUMENTS_SCHEMA, QUESTIONS_SCHEMA, SPAN_STRUCT

# driver-side fix for the Ray 2.49 hash-join schema-broadcast race
# (see runtime.patch_hash_shuffle_schema_broadcast) — applied on
# import so every pipeline using Dataset.join is covered
patch_hash_shuffle_schema_broadcast()

__all__ = [
    "PipelineConfig", "DEFAULT_CONFIG",
    "DOCUMENTS_SCHEMA", "QUESTIONS_SCHEMA", "SPAN_STRUCT",
]
