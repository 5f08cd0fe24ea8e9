"""Pluggable classifier protocol (the reference's extension surface).

The reference injects an OpenAI-SDK-compatible Qwen-VL client into its
merger/extractor (extractor.py:23-34, SURVEY.md section 2.10); this
module defines the engine-side equivalent so a real VL backend can be
swapped in without touching pipeline code:

- ``VLClientClassifier``: RelatednessClassifier subclass that calls an
  OpenAI-compatible ``chat.completions`` client with the reference's
  prompt contract (question_merger.py:476-492) and JSON-robustness
  ladder (M13: strict parse -> ```json fence -> brace-greedy -> default,
  question_merger.py:516-538).  No network exists in this environment,
  so constructing it without a client raises cleanly.
- ``TokenBucket``: per-actor rate limiter (the engine analog of the
  hardcoded 0.5 s sleep between VL-OCR calls,
  tests/test_exam_paper_analysis_vl_ocr_v2.py:760-761).
- persistent verdict cache save/load (S7/O7 pickles ->
  JSON sidecar, key formula preserved: question_merger.py:568-573).
"""
from __future__ import annotations

import json
import os
import re
import time
from typing import Any, Dict

from doc_ocr_ray.config import PipelineConfig, DEFAULT_CONFIG
from doc_ocr_ray.functions.merge import RelatednessClassifier

_JSON_FENCE = re.compile(r"```json\s*(.*?)\s*```", re.DOTALL)
_BRACES = re.compile(r"\{.*\}", re.DOTALL)


def parse_model_json(text: str) -> Dict[str, Any]:
    """M13 robustness ladder: strict -> fenced -> brace-greedy ->
    default failure verdict (question_merger.py:516-538)."""
    text = (text or "").strip()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        pass
    m = _JSON_FENCE.search(text)
    if m:
        try:
            return json.loads(m.group(1))
        except json.JSONDecodeError:
            pass
    m = _BRACES.search(text)
    if m:
        try:
            return json.loads(m.group(0))
        except json.JSONDecodeError:
            pass
    return {"is_related": False, "reason": "parse failure", "confidence": 0.0}


class TokenBucket:
    """Simple per-actor rate limiter: ``acquire()`` blocks until a
    token is available (rate tokens/sec, burst capacity)."""

    def __init__(self, rate: float = 2.0, burst: int = 1):
        self.rate = rate
        self.capacity = burst
        self.tokens = float(burst)
        self.last = time.monotonic()

    def acquire(self) -> None:
        while True:
            now = time.monotonic()
            self.tokens = min(self.capacity,
                              self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            time.sleep((1.0 - self.tokens) / self.rate)


def build_text_context(spans, max_chars: int = 80) -> str:
    """M14: per-span context lines for a VL prompt —
    ``ID {offset} [{kind}]: {text[:80]}`` (tests/..._v2.py:956-970)."""
    return "\n".join(
        f"ID {s['offset']} [{s['kind']}]: {(s['text'] or '')[:max_chars]}"
        for s in sorted(spans, key=lambda x: x["offset"]))


RELATEDNESS_PROMPT = """请分析以下数学题目是否需要这张图片来辅助解答：

题目内容：
{question_text}

请以JSON格式回答：
{{"is_related": true/false, "reason": "原因说明", "confidence": 0.0-1.0}}
"""


class VLClientClassifier(RelatednessClassifier):
    """Relatedness verdicts from a real OpenAI-compatible VL client.

    Same verdict contract and cache key as the deterministic stand-in;
    per-call rate limiting via the token bucket; on any client error
    the verdict degrades to not-related (the reference's ladder,
    question_merger.py:369-371).
    """

    def __init__(self, client: Any, model: str,
                 config: PipelineConfig = DEFAULT_CONFIG,
                 temperature: float = 0.1, max_tokens: int = 800,
                 rate_per_sec: float = 2.0):
        if client is None:
            raise ValueError(
                "VLClientClassifier needs an OpenAI-compatible client; "
                "use the default RelatednessClassifier stand-in when no "
                "model backend is available")
        super().__init__(config)
        self.client = client
        self.model = model
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.bucket = TokenBucket(rate=rate_per_sec)

    def _judge_uncached(self, question_text: str, media_ref: str) -> Dict[str, Any]:
        self.calls += 1
        self.bucket.acquire()
        try:
            response = self.client.chat.completions.create(
                model=self.model,
                messages=[{"role": "user", "content":
                           RELATEDNESS_PROMPT.format(question_text=question_text)
                           + f"\n[media: {media_ref}]"}],
                temperature=self.temperature,
                max_tokens=self.max_tokens)
            verdict = parse_model_json(response.choices[0].message.content)
        except Exception:
            verdict = {"is_related": False, "reason": "client error",
                       "confidence": 0.0}
        verdict.setdefault("is_related", False)
        verdict.setdefault("confidence", 0.0)
        return verdict


def save_verdict_cache(classifier: RelatednessClassifier, path: str) -> None:
    """Persist the md5-keyed verdict cache as a JSON sidecar (the
    engine's version of cache/vl_results/*.pkl)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(classifier._cache, f, ensure_ascii=False)
    os.replace(tmp, path)


def load_verdict_cache(classifier: RelatednessClassifier, path: str) -> int:
    if not os.path.exists(path):
        return 0
    with open(path, "r", encoding="utf-8") as f:
        cached = json.load(f)
    classifier._cache.update(cached)
    return len(cached)
