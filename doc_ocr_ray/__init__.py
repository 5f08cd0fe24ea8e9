"""doc_ocr_ray — a Ray-Data-native document-extraction engine.

Rebuilds the semantics of SunJINM/doc-ocr (question-block split /
text-media merge over interleaved OCR'd documents) as streaming Ray
Data pipelines over zero-copy Arrow batches.  See SURVEY.md for the
operator-by-operator mapping.
"""
from doc_ocr_ray.config import PipelineConfig, DEFAULT_CONFIG
from doc_ocr_ray.schema import DOCUMENTS_SCHEMA, QUESTIONS_SCHEMA, SPAN_STRUCT

__all__ = [
    "PipelineConfig", "DEFAULT_CONFIG",
    "DOCUMENTS_SCHEMA", "QUESTIONS_SCHEMA", "SPAN_STRUCT",
]
