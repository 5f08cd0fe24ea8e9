"""Span-sequence equality against the reference's own golden fixtures.

The correctness invariant (BASELINE.json north rule): every output row
matches the reference's split/merge fixtures on (kind, text, media_ref,
order).  Split equality is fully deterministic; merge equality replays
the reference VL model's recorded group verdicts through the engine's
ReplayAggregator (the analog of the reference's cached VL results,
question_merger.py:344-363) and checks the engine's grouping, claiming,
residual and envelope-merge plumbing bit-for-bit.
"""
import pytest

from doc_ocr_ray import fixtures
from doc_ocr_ray.pipelines.extract import (
    extract_questions, flatten_documents, restitch_documents, split_documents,
)

pytestmark = pytest.mark.skipif(
    not fixtures.fixture_available(), reason="reference fixtures not present")


def _seq(spans):
    ordered = sorted(spans, key=lambda s: s["offset"])
    return [(s["kind"], s["text"], s["media_ref"]) for s in ordered]


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data
    return ray.data.from_arrow(fixtures.load_fixture_documents())


def test_split_span_sequence_equality(docs_ds):
    expected = fixtures.expected_split_sequences()
    out = split_documents(docs_ds).take_all()
    assert len(out) == len(expected)
    for row in out:
        assert _seq(row["spans"]) == expected[row["doc_id"]], row["doc_id"]


def test_merge_span_sequence_equality(docs_ds):
    verdicts = fixtures.replay_verdicts()
    expected = fixtures.expected_group_sequences()
    rows = extract_questions(docs_ds, verdicts=verdicts).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, want_groups in expected.items():
        got = sorted(by_doc[doc_id], key=lambda r: r["question_id"])
        assert len(got) == len(want_groups), doc_id
        for r, w in zip(got, want_groups):
            assert r["group_type"] == w["type"]
            assert _seq(r["spans"]) == w["spans"]
            assert r["merged_text"] == w["merged_text"]


def test_flatten_restitch_roundtrip(docs_ds):
    """The groupby(doc_id) re-stitch path reproduces the same documents."""
    original = {r["doc_id"]: _seq(r["spans"]) for r in docs_ds.take_all()}
    stitched = restitch_documents(flatten_documents(docs_ds)).take_all()
    assert len(stitched) == len(original)
    for row in stitched:
        assert _seq(row["spans"]) == original[row["doc_id"]]


def test_flat_path_split_equality(docs_ds):
    """Split equality holds through the flattened/groupby path too."""
    expected = fixtures.expected_split_sequences()
    ds = restitch_documents(flatten_documents(docs_ds))
    rows = split_documents(ds).take_all()
    assert len(rows) == len(expected)      # guard against a vacuous pass
    for row in rows:
        assert _seq(row["spans"]) == expected[row["doc_id"]]


@pytest.mark.skipif(not __import__("os").path.isdir(fixtures.V1_FIXTURE_DIR),
                    reason="v1 reference fixtures not present")
def test_v1_merge_span_sequence_equality(ray_session):
    """The v1-analyzer pages (no split step — enable_split=False, the
    reference's enable_ocr_split feature flag) also reproduce their
    recorded groupings exactly."""
    import ray.data
    from doc_ocr_ray.config import PipelineConfig
    verdicts = fixtures.v1_replay_verdicts()
    expected = fixtures.v1_expected_group_sequences()
    ds = ray.data.from_arrow(fixtures.load_v1_documents())
    rows = extract_questions(ds, config=PipelineConfig(enable_split=False),
                             verdicts=verdicts).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, want_groups in expected.items():
        got = sorted(by_doc[doc_id], key=lambda r: r["question_id"])
        assert len(got) == len(want_groups), doc_id
        for r, w in zip(got, want_groups):
            assert r["group_type"] == w["type"]
            assert _seq(r["spans"]) == w["spans"]
            assert r["merged_text"] == w["merged_text"]
