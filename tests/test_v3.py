"""V3 pure-VL one-shot pipeline: bbox parse, denormalize, stand-in
parse determinism, client adapter, actor-pool stage."""
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_parse_bbox_formats():
    from doc_ocr_ray.pipelines.v3 import parse_bbox
    assert parse_bbox("<bbox>175 98 791 476</bbox>") == [175, 98, 791, 476]
    assert parse_bbox("x <bbox> 1  2  3  4 </bbox> y") == [1, 2, 3, 4]
    assert parse_bbox("no box here") is None
    assert parse_bbox("") is None


def test_denormalize_matches_reference_arithmetic():
    from doc_ocr_ray.pipelines.v3 import denormalize_bbox
    # int(x * w / 1000) exactly (exam_paper_splitter_v3.py:108-126)
    assert denormalize_bbox([175, 98, 791, 476], 800, 1200) == \
        [int(175 * 800 / 1000), int(98 * 1200 / 1000),
         int(791 * 800 / 1000), int(476 * 1200 / 1000)]


def test_parse_v3_response_fenced_and_bboxes():
    from doc_ocr_ray.pipelines.v3 import parse_v3_response
    raw = '''```json
{"paper_info": {"total_questions": 1},
 "questions": [{"question_id": 1, "question_type": "填空题",
   "question_text": "t", "question_bboxes": ["<bbox>1 2 3 4</bbox>", "bad"],
   "blanks": [{"blank_id": 1, "blank_bbox": "<bbox>5 6 7 8</bbox>",
               "blank_type": "横线"}]}]}
```'''
    out = parse_v3_response(raw)
    q = out["questions"][0]
    assert q["question_bboxes"] == [[1, 2, 3, 4]]      # bad bbox dropped
    assert q["blanks"][0]["blank_bbox"] == [5, 6, 7, 8]


def test_standin_parser_deterministic():
    from doc_ocr_ray.pipelines.v3 import StandInParser
    p = StandInParser()
    a = p.parse("img:1", b"payload")
    b = p.parse("img:1", b"payload")
    assert a == b
    assert a["paper_info"]["total_questions"] == len(a["questions"]) >= 1
    assert all(q["question_bboxes"] for q in a["questions"])


def test_v3_pipeline_end_to_end():
    import ray.data
    from doc_ocr_ray.stages.multimodal import synthesize_media_table
    from doc_ocr_ray.pipelines.v3 import parse_exam_pages
    tbl = synthesize_media_table([f"d{i}" for i in range(8)],
                                 [f"img:{i}" for i in range(8)])
    rows = parse_exam_pages(ray.data.from_arrow(tbl),
                            concurrency=1).take_all()
    assert len(rows) >= 8                       # >=1 question per page
    refs = {r["media_ref"] for r in rows}
    assert len(refs) == 8
    for r in rows:
        assert r["question_id"] >= 1
        assert len(r["bbox"]) == 4
        # pixel domain at default 1000x1400 page
        assert 0 <= r["bbox"][0] <= 1000 and 0 <= r["bbox"][3] <= 1400
    # deterministic across runs
    rows2 = parse_exam_pages(ray.data.from_arrow(tbl),
                             concurrency=1).take_all()
    key = lambda r: (r["media_ref"], r["question_id"])
    assert sorted(map(key, rows)) == sorted(map(key, rows2))


def test_v3_client_parser_mock_and_failure():
    from doc_ocr_ray.pipelines.v3 import V3ClientParser, V3ParseStage
    import json as _j

    class Client:
        class chat:
            class completions:
                @staticmethod
                def create(**kwargs):
                    class Msg:
                        content = _j.dumps({
                            "paper_info": {"total_questions": 1},
                            "questions": [{"question_id": 7,
                                           "question_type": "解答题",
                                           "question_text": "x",
                                           "question_bboxes":
                                               ["<bbox>0 0 1000 1000</bbox>"],
                                           "blanks": []}]})
                    class Choice:
                        message = Msg()
                    class Resp:
                        choices = [Choice()]
                    return Resp()

    p = V3ClientParser(Client(), model="fake")
    out = p.parse("img:1", b"x")
    assert out["questions"][0]["question_id"] == 7

    class Boom:
        class chat:
            class completions:
                @staticmethod
                def create(**kwargs):
                    raise RuntimeError("down")

    pb = V3ClientParser(Boom(), model="fake")
    assert pb.parse("img:1", b"x") is None
    # poison-page containment: error row, not a crash
    import pyarrow as pa
    from doc_ocr_ray.stages.multimodal import synthesize_media_table
    stage = V3ParseStage(parser=pb)
    out = stage(synthesize_media_table(["d1"], ["img:1"]))
    assert out.num_rows == 1 and out["question_id"][0].as_py() == -1
    with pytest.raises(ValueError):
        V3ClientParser(None, model="x")


def test_visualize_annotation_sink(tmp_path):
    import ray.data
    from doc_ocr_ray import synth
    from doc_ocr_ray.pipelines.extract import extract_questions
    from doc_ocr_ray.pipelines.visualize import write_annotations, doc_svg
    qs = extract_questions(ray.data.from_arrow(synth.generate_table(12, seed=42)))
    out = str(tmp_path / "viz")
    n = write_annotations(qs, out)
    import os
    files = sorted(os.listdir(out))
    assert n == len(files) > 0
    body = open(os.path.join(out, files[0]), encoding="utf-8").read()
    assert body.startswith("<svg") and "question" in body
    # deterministic rendering
    rows = [{"question_id": 1, "group_type": "question",
             "question_number": 3, "merged_text": "abc", "n_images": 1}]
    assert doc_svg("d", rows) == doc_svg("d", rows)
    assert "#3" in doc_svg("d", rows) and "[1 img]" in doc_svg("d", rows)


def test_v3_stage_tolerates_bad_question_ids():
    """Null / non-numeric question_id from a real model must not kill
    the batch (poison containment at the field level)."""
    from doc_ocr_ray.pipelines.v3 import V3ParseStage
    from doc_ocr_ray.stages.multimodal import synthesize_media_table

    class NullIdParser:
        def parse(self, ref, payload):
            return {"questions": [
                {"question_id": None, "question_type": "t",
                 "question_text": "x", "question_bboxes": [[1, 2, 3, 4]],
                 "blanks": []},
                {"question_id": "三", "question_type": "t",
                 "question_text": "y", "question_bboxes": [], "blanks": []},
            ]}

    out = V3ParseStage(parser=NullIdParser())(
        synthesize_media_table(["d1"], ["img:1"]))
    assert out.num_rows == 2
    assert out["question_id"].to_pylist() == [-1, -1]


def test_v3_stage_accepts_parser_class_as_factory():
    from doc_ocr_ray.pipelines.v3 import StandInParser, V3ParseStage
    from doc_ocr_ray.stages.multimodal import synthesize_media_table
    stage = V3ParseStage(parser=StandInParser)     # class, not instance
    out = stage(synthesize_media_table(["d1"], ["img:1"]))
    assert out.num_rows >= 1
