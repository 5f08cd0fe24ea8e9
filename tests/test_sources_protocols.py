"""Tests: layout-JSON reader (S1), classifier protocol (O1-O7 surface)."""
import json
import os
import time

import pytest

REFERENCE_JSON = "/root/reference/result_data1.json"


def test_blocks_to_spans_ordering_and_media():
    from doc_ocr_ray.sources.layout_json import blocks_to_spans
    blocks = [
        {"block_label": "image", "block_content": "", "block_id": 5,
         "block_bbox": [0, 100, 10, 110], "block_order": None},
        {"block_label": "text", "block_content": "hello", "block_id": 1,
         "block_bbox": [0, 50, 10, 60], "block_order": None},
    ]
    spans = blocks_to_spans(blocks)
    # no block_order -> file order preserved
    assert [s["kind"] for s in spans] == ["image", "text"]
    assert spans[0]["media_ref"] == "img:5"
    assert [s["offset"] for s in spans] == [0, 1]


@pytest.mark.skipif(not os.path.exists(REFERENCE_JSON),
                    reason="reference JSON not present")
def test_parse_reference_result_json():
    from doc_ocr_ray.sources.layout_json import parse_layout_json
    with open(REFERENCE_JSON, "rb") as f:
        rows = parse_layout_json("result_data1", f.read())
    assert len(rows) == 1
    spans = rows[0]["spans"]
    assert len(spans) == 27                     # SURVEY.md section 1.1
    kinds = {s["kind"] for s in spans}
    assert "text" in kinds and "doc_title" in kinds
    # every image block got a media_ref; no text block did
    for s in spans:
        assert (s["media_ref"] != "") == (s["kind"] == "image")


@pytest.mark.skipif(not os.path.exists(REFERENCE_JSON),
                    reason="reference JSON not present")
@pytest.mark.usefixtures("ray_session")
def test_read_layout_json_pipeline():
    from doc_ocr_ray.sources.layout_json import read_layout_json
    from doc_ocr_ray.pipelines.extract import extract_questions
    ds = read_layout_json([REFERENCE_JSON])
    rows = extract_questions(ds).take_all()
    assert rows and all(r["doc_id"] == "result_data1" for r in rows)
    assert any(r["group_type"] == "question" for r in rows)


def test_parse_model_json_ladder():
    from doc_ocr_ray.functions.protocols import parse_model_json
    ok = {"is_related": True, "reason": "x", "confidence": 0.9}
    assert parse_model_json(json.dumps(ok)) == ok
    assert parse_model_json(f"prefix\n```json\n{json.dumps(ok)}\n```\n") == ok
    assert parse_model_json(f"noise {json.dumps(ok)} noise") == ok
    bad = parse_model_json("not json at all")
    assert bad["is_related"] is False and bad["confidence"] == 0.0


def test_token_bucket_rate():
    from doc_ocr_ray.functions.protocols import TokenBucket
    bucket = TokenBucket(rate=50.0, burst=1)
    t0 = time.monotonic()
    for _ in range(5):
        bucket.acquire()
    elapsed = time.monotonic() - t0
    assert elapsed >= 4 / 50.0 * 0.8            # ~4 waits at 20ms


def test_vl_client_classifier_contract():
    from doc_ocr_ray.functions.protocols import VLClientClassifier

    class FakeCompletions:
        def create(self, **kwargs):
            class Msg:
                content = '{"is_related": true, "reason": "ok", "confidence": 0.95}'
            class Choice:
                message = Msg()
            class Resp:
                choices = [Choice()]
            return Resp()

    class FakeClient:
        class chat:
            completions = FakeCompletions()

    clf = VLClientClassifier(FakeClient(), model="fake", rate_per_sec=1000)
    v = clf.judge("题目", "img:1")
    assert v["is_related"] is True and v["confidence"] == 0.95
    # cached second call, no new client call
    clf.judge("题目", "img:1")
    assert clf.calls == 1
    with pytest.raises(ValueError):
        VLClientClassifier(None, model="x")


class _Boom:
    class chat:
        class completions:
            @staticmethod
            def create(**kwargs):
                raise RuntimeError("network down")


def test_vl_client_degrades_on_error():
    from doc_ocr_ray.functions.protocols import VLClientClassifier
    clf = VLClientClassifier(_Boom(), model="fake", rate_per_sec=1000)
    v = clf.judge("题目", "img:2")
    assert v["is_related"] is False and v["confidence"] == 0.0


def test_verdict_cache_persistence(tmp_path):
    from doc_ocr_ray.functions.merge import RelatednessClassifier
    from doc_ocr_ray.functions.protocols import (load_verdict_cache,
                                                 save_verdict_cache)
    c1 = RelatednessClassifier()
    c1.judge("如图，求面积", "img:1")
    path = str(tmp_path / "cache.json")
    save_verdict_cache(c1, path)
    c2 = RelatednessClassifier()
    assert load_verdict_cache(c2, path) == 1
    c2.judge("如图，求面积", "img:1")
    assert c2.calls == 0                        # served from loaded cache
