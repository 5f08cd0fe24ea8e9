"""Pipeline configuration.

Every threshold / pattern the reference hardcodes or injects through its
config dataclasses (reference: src/question_extraction/config.py:31-59)
is surfaced here so users can extend the pattern list and tune the
heuristics, mirroring the reference's user-extension surface
(SURVEY.md section 2.10).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

# Question-number patterns. Same vocabulary as the reference
# (src/question_extraction/config.py:40-46), but in the v2 form without
# the '^' anchor (tests/test_exam_paper_analysis_vl_ocr_v2.py:305-311):
# line-start-ness is enforced by validation, not by the regex.
DEFAULT_QUESTION_PATTERNS: List[str] = [
    r"(\d+)[\.、]\s*",      # 1. or 1、
    r"\((\d+)\)\s*",        # (1)
    r"第(\d+)题\s*",        # 第1题
    r"\[(\d+)\]\s*",        # [1]
    r"[【](\d+)[】]\s*",     # 【1】
]

# Block kinds treated as boilerplate (reference: tests/pp_ocr_vl.py:28-36
# markdownIgnoreLabels). They never join a question's span sequence.
BOILERPLATE_KINDS: Tuple[str, ...] = (
    "header", "header_image", "footer", "footer_image",
    "number", "footnote", "aside_text",
)

TITLE_KINDS: Tuple[str, ...] = ("doc_title", "paragraph_title")

# Full kind vocabulary (reference block-label census, SURVEY.md section 1.1).
KIND_VOCABULARY: Tuple[str, ...] = (
    "text", "image", "doc_title", "paragraph_title", "table",
    "display_formula", "inline_formula", "aside_text", "header",
    "header_image", "footer", "footer_image", "number", "footnote",
)


@dataclass
class PipelineConfig:
    """All tunables of the extraction engine.

    Reference twins noted per field (paths relative to /root/reference).
    """

    # --- question-number detection (M2-M5) ---
    question_patterns: List[str] = field(
        default_factory=lambda: list(DEFAULT_QUESTION_PATTERNS))
    # collapse matches closer than this (question_splitter.py:119-127)
    dedup_window: int = 5
    # minimum stripped chars after a match (question_splitter.py:156-159)
    min_following_chars: int = 5
    # window scanned for following content (question_splitter.py:156)
    following_window: int = 100
    # "near line start" slack when no newline precedes (question_splitter.py:174-176)
    line_start_max_lead: int = 10

    # --- deterministic stand-ins for the VL / OCR ladders ---
    # Tie-break (v2 strict-vs-loose arbiter, tests/..._v2.py:347-399):
    # when strict and loose disagree, accept the loose result iff its
    # numbers are strictly consecutive ascending (n, n+1, ...).  This
    # reproduces the reference's VL verdicts on every committed fixture.
    tiebreak_require_consecutive: bool = True
    # Locate validation (stand-in for the OCR line-locate that aborts a
    # split when a number can't be found, tests/..._v2.py:221-223):
    # split only if matched numbers are strictly ascending with bounded
    # gaps.  Kills garbage sequences like [1, 2163] (fixture 2 block 14).
    max_number_gap: int = 10

    # --- split semantics (M6) ---
    # the reference's enable_ocr_split feature flag
    # (tests/test_exam_paper_analysis_vl_ocr_v2.py:1220): False skips
    # the split step entirely (v1-analyzer behavior) — spans pass
    # through unsplit
    enable_split: bool = True
    # v2 starts the first sub-span at offset 0 (tests/..._v2.py:141-149);
    # the library starts at the first match (question_splitter.py:372-376).
    # Fixtures are v2, so v2 is the default.
    first_interval_from_zero: bool = True

    # --- media association (J1/J2/J3 re-expressed in offset domain) ---
    # how many spans ahead of a question's last text span an image may
    # sit and still be a candidate (analog of max_vertical_distance=300px,
    # config.py:34)
    max_offset_distance: int = 3
    # cap per question (config.py:57)
    max_images_per_question: int = 8
    # classifier verdict threshold (config.py:37)
    vl_confidence_threshold: float = 0.7
    # max media judged in ONE VL call (O2 batch verify,
    # question_merger.py:375-472: vl_batch_size=3, degrade-to-single)
    vl_batch_size: int = 3

    # --- deterministic relatedness stand-in (O1/O2 interface) ---
    # a candidate image is "related" iff the question text references a
    # figure.  Stands in for the Qwen-VL relatedness verdict
    # (question_merger.py:474-540) with a reproducible rule.
    figure_keyword_pattern: str = (
        r"如图|右图|左图|下图|上图|图所示|看图|观察图|见图"
        r"|figure|diagram|see\s+fig|shown\s+below|image"
    )

    # --- boilerplate / titles (M1) ---
    # boilerplate kinds route to "aside" groups; title kinds become
    # doc_title/header groups (both consulted by the aggregator)
    boilerplate_kinds: Tuple[str, ...] = BOILERPLATE_KINDS
    title_kinds: Tuple[str, ...] = TITLE_KINDS

    # --- execution knobs ---
    # 128 measured consistently >= the old 256 at 32 CPUs (3.9 vs
    # 4.1-5.3 s / 100k docs; smaller batches cut the per-call working
    # set, which matters more as concurrency contends for memory
    # bandwidth); below 64 the per-batch Python overhead resurfaces
    batch_size: int = 128               # docs per batch in span stages

    # --- failure policy ---
    # False (default): a document that raises inside the per-doc chain
    # becomes a single "error" group row carrying the exception text —
    # the batch, task, and job keep going (at 10^12 docs a poison doc
    # must not kill a shard).  True: re-raise (debugging).
    fail_fast: bool = False

    # --- cache (O7) ---
    # verdict cache key formula preserved from the reference:
    # md5(question_text) + "_" + md5(str(identity))
    # (question_merger.py:568-573)
    enable_cache: bool = True


DEFAULT_CONFIG = PipelineConfig()
