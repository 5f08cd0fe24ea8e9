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


class _CountingBatchClient:
    """Answers the O2 batch prompt: marks even indices related."""
    def __init__(self):
        self.n_calls = 0
        self.last_content = None
        client = self

        class Completions:
            @staticmethod
            def create(**kwargs):
                client.n_calls += 1
                content = kwargs["messages"][0]["content"]
                client.last_content = content
                n_imgs = sum(1 for c in content if c["type"] == "image_url")
                import json as _j
                payload = {"images": [
                    {"index": i, "is_related": i % 2 == 0,
                     "reason": "r", "confidence": 0.9}
                    for i in range(n_imgs)]}
                class Msg:
                    pass
                Msg.content = _j.dumps(payload)
                class Choice:
                    message = Msg()
                class Resp:
                    choices = [Choice()]
                return Resp()

        class Chat:
            completions = Completions()
        self.chat = Chat()


def test_vl_client_batch_judging_one_call_per_chunk():
    from doc_ocr_ray.config import PipelineConfig
    from doc_ocr_ray.functions.protocols import VLClientClassifier
    cfg = PipelineConfig(vl_batch_size=3)
    client = _CountingBatchClient()
    clf = VLClientClassifier(client, model="fake", config=cfg,
                             rate_per_sec=10000)
    refs = [f"img:{i}" for i in range(5)]
    verdicts = clf.judge_batch("题目", refs)
    # 5 media at batch size 3 -> one batch call (3) + one batch call (2)
    assert client.n_calls == 2
    assert [v["is_related"] for v in verdicts] == [True, False, True, True, False]
    # all five verdicts now cached: a re-judge issues NO call
    n = client.n_calls
    verdicts2 = clf.judge_batch("题目", refs)
    assert client.n_calls == n
    assert [v["is_related"] for v in verdicts2] == \
           [v["is_related"] for v in verdicts]


def test_vl_client_batch_degrades_to_single():
    """A garbage batch response falls back to per-item judge calls."""
    from doc_ocr_ray.config import PipelineConfig
    from doc_ocr_ray.functions.protocols import VLClientClassifier

    class Flaky:
        def __init__(self):
            self.n_calls = 0
            outer = self

            class Completions:
                @staticmethod
                def create(**kwargs):
                    outer.n_calls += 1
                    content = kwargs["messages"][0]["content"]
                    n_imgs = (sum(1 for c in content
                                  if c["type"] == "image_url")
                              if isinstance(content, list) else 0)
                    class Msg:
                        pass
                    # batch calls (>=2 images) get garbage; single
                    # relatedness calls get a valid dict verdict
                    Msg.content = ("not json at all" if n_imgs >= 2 else
                                   '{"is_related": true, "confidence": 0.8}')
                    class Choice:
                        message = Msg()
                    class Resp:
                        choices = [Choice()]
                    return Resp()

            class Chat:
                completions = Completions()
            self.chat = Chat()

    cfg = PipelineConfig(vl_batch_size=3)
    client = Flaky()
    clf = VLClientClassifier(client, model="fake", config=cfg,
                             rate_per_sec=10000)
    verdicts = clf.judge_batch("题目", ["img:0", "img:1", "img:2"])
    # 1 failed batch call + 3 single-item degrades
    assert client.n_calls == 4
    assert all(v["is_related"] for v in verdicts)


class _AggClient:
    """Answers the O4 aggregate prompt with a fixed group list."""
    def __init__(self, payload):
        self.n_calls = 0
        outer = self

        class Completions:
            @staticmethod
            def create(**kwargs):
                outer.n_calls += 1
                class Msg:
                    pass
                Msg.content = payload
                class Choice:
                    message = Msg()
                class Resp:
                    choices = [Choice()]
                return Resp()

        class Chat:
            completions = Completions()
        self.chat = Chat()


_AGG_SPANS = [
    {"kind": "doc_title", "text": "数学试卷", "media_ref": "", "offset": 0},
    {"kind": "text", "text": "1.如图，求面积", "media_ref": "", "offset": 1,
     "question_number": 1},
    {"kind": "image", "text": "", "media_ref": "img:0", "offset": 2},
]


def test_vl_client_aggregator_resolves_block_ids():
    from doc_ocr_ray.functions.protocols import VLClientAggregator
    payload = ('```json\n[{"type": "doc_title", "block_ids": [0]},'
               ' {"type": "question", "block_ids": [2, 1]}]\n```')
    agg = VLClientAggregator(_AggClient(payload), model="fake",
                             rate_per_sec=10000)
    groups = agg.aggregate("d1", _AGG_SPANS)
    # fenced JSON parsed, block ids (=offsets) resolved to sorted ranks
    assert groups == [{"type": "doc_title", "members": [0]},
                      {"type": "question", "members": [1, 2]}]
    assert agg.fallbacks == 0


def test_vl_client_aggregator_falls_back_on_garbage():
    from doc_ocr_ray.functions.merge import HeuristicAggregator
    from doc_ocr_ray.functions.protocols import VLClientAggregator
    agg = VLClientAggregator(_AggClient("no json here"), model="fake",
                             rate_per_sec=10000)
    groups = agg.aggregate("d1", _AGG_SPANS)
    assert agg.fallbacks == 1
    # degraded result equals the deterministic stand-in's
    assert groups == HeuristicAggregator().aggregate("d1", _AGG_SPANS)


def test_make_aggregator_selection_switch():
    import pytest as _pt
    from doc_ocr_ray.functions.merge import HeuristicAggregator
    from doc_ocr_ray.functions.protocols import (VLClientAggregator,
                                                 make_aggregator)
    assert isinstance(make_aggregator("heuristic"), HeuristicAggregator)
    qwen = make_aggregator("qwen", client=_AggClient("[]"), model="m")
    doubao = make_aggregator("doubao", client=_AggClient("[]"), model="m")
    assert isinstance(qwen, VLClientAggregator)
    assert qwen.prompt != doubao.prompt
    with _pt.raises(ValueError):
        make_aggregator("qwen", client=None, model="m")
    with _pt.raises(ValueError):
        make_aggregator("gemini", client=_AggClient("[]"), model="m")


def test_make_aggregator_replay():
    from doc_ocr_ray.functions.merge import ReplayAggregator
    from doc_ocr_ray.functions.protocols import make_aggregator
    agg = make_aggregator("replay",
                          verdicts={"d": [{"type": "text", "members": [0]}]})
    assert isinstance(agg, ReplayAggregator)
    assert agg.aggregate("d", []) == [{"type": "text", "members": [0]}]
    # unknown doc degrades to the heuristic fallback, not []
    assert agg.fallback is not None


def test_read_documents_jsonl(ray_session, tmp_path):
    import pandas as pd
    from doc_ocr_ray.sources.io import read_documents_jsonl
    p = tmp_path / "docs"
    p.mkdir()
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["one two", "três quatro", ""],
        "source": ["a", "b", "a"]})
    rows.iloc[:2].to_json(p / "part0.jsonl", orient="records",
                          lines=True, force_ascii=False)
    rows.iloc[2:].to_json(p / "part1.jsonl", orient="records",
                          lines=True, force_ascii=False)
    ds = read_documents_jsonl([str(p / "part0.jsonl"),
                               str(p / "part1.jsonl")],
                              columns=["doc_id", "text"])
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["text"].tolist() == ["one two", "três quatro", ""]
    assert list(got.columns) == ["doc_id", "text"]
    # composes with downstream stages (token_count over jsonl input)
    from doc_ocr_ray.stages.text_analysis import token_count_batch
    toks = (ds.map_batches(token_count_batch, batch_format="pandas")
            .to_pandas().sort_values("doc_id"))
    assert toks["n_tokens"].tolist() == [2, 2, 0]

    # GZIPPED jsonl (the Dolma/Common-Crawl drop format): detected
    # PER FILE from the path, so plain and .gz members mix in one
    # list; the explicit override still forces a codec
    import gzip
    gz = p / "part0.jsonl.gz"
    with open(p / "part0.jsonl", "rb") as src, \
            gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    got_mixed = (read_documents_jsonl([str(gz), str(p / "part1.jsonl")])
                 .to_pandas().sort_values("doc_id")
                 .reset_index(drop=True))
    assert got_mixed["text"].tolist() == ["one two", "três quatro", ""]
    got_explicit = (read_documents_jsonl([str(gz)], compression="gzip")
                    .to_pandas())
    assert len(got_explicit) == 2


def test_warc_record_scan_and_page_filter():
    """Content-Length-bounded WARC scan: decoy version lines inside
    bodies, non-response records, status filtering, malformed
    framing raising loudly."""
    import pytest
    from doc_ocr_ray.sources.warc import (encode_warc, http_response,
                                          iter_warc_records, split_http,
                                          warc_pages_batch)
    import pandas as pd

    body = b"<p>contains\r\nWARC/1.0\r\nand Content-Length: 7</p>"
    raw = encode_warc([
        ({"WARC-Type": "warcinfo"}, b"software: x\r\n"),
        ({"WARC-Type": "response", "WARC-Target-URI": "http://a/"},
         http_response(body)),
        ({"WARC-Type": "response", "WARC-Target-URI": "http://b/"},
         http_response(b"<p>gone</p>", status=404)),
    ])
    recs = list(iter_warc_records(raw))
    assert [h["warc-type"] for h, _ in recs] == ["warcinfo",
                                                 "response", "response"]
    assert split_http(recs[1][1]) == (200, body)

    out = warc_pages_batch(pd.DataFrame(
        {"doc_id": pd.Series([1], dtype="int64"), "payload": [raw]}))
    assert list(out["url"]) == ["http://a/"]       # 404 filtered
    assert list(out["rec_idx"]) == [0]             # response ordinal
    assert out["html"].iloc[0] == body.decode()

    # keep_statuses widens the filter
    out = warc_pages_batch(pd.DataFrame(
        {"doc_id": pd.Series([1], dtype="int64"), "payload": [raw]}),
        keep_statuses=(200, 404))
    assert list(out["rec_idx"]) == [0, 1]

    with pytest.raises(ValueError):
        list(iter_warc_records(b"NOTWARC/9.9\r\n\r\n"))
    with pytest.raises(ValueError):                # corrupt gzip magic
        list(iter_warc_records(b"\x1f\x8b rest"))
    with pytest.raises(ValueError):                # no Content-Length
        list(iter_warc_records(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n"))


def test_warc_gzip_members():
    """Per-record gzip members (.warc.gz): member splitting must agree
    with the plain reader, survive decoy gzip magic inside compressed
    bodies, and raise on truncation / inter-member garbage."""
    import gzip
    import pytest
    import pandas as pd
    from doc_ocr_ray.sources.warc import (encode_warc, encode_warc_gz,
                                          http_response, iter_warc_records,
                                          split_gzip_members,
                                          warc_pages_batch)

    # decoy gzip magic INSIDE a body: framing follows deflate, not magic
    body = b"<p>decoy \x1f\x8b\x08 gzip magic and WARC/1.0 inside</p>"
    records = [
        ({"WARC-Type": "warcinfo"}, b"software: x\r\n"),
        ({"WARC-Type": "response", "WARC-Target-URI": "http://a/"},
         http_response(body)),
        ({"WARC-Type": "response", "WARC-Target-URI": "http://b/"},
         http_response(b"<p>two</p>")),
    ]
    gz = encode_warc_gz(records)
    assert gz[:2] == b"\x1f\x8b"
    assert len(list(split_gzip_members(gz))) == 3

    plain = list(iter_warc_records(encode_warc(records)))
    via_gz = list(iter_warc_records(gz))
    assert [(h, p) for h, p in via_gz] == [(h, p) for h, p in plain]

    out = warc_pages_batch(pd.DataFrame(
        {"doc_id": pd.Series([7], dtype="int64"), "payload": [gz]}))
    assert list(out["url"]) == ["http://a/", "http://b/"]
    assert out["html"].iloc[0] == body.decode("utf-8", errors="replace")

    # a member holding SEVERAL records (tolerated: spec says one, real
    # files occasionally batch) still parses
    multi = gzip.compress(encode_warc(records), mtime=0)
    assert len(list(iter_warc_records(multi))) == 3

    with pytest.raises(ValueError):   # truncated final member
        list(iter_warc_records(gz[:-5]))
    with pytest.raises(ValueError):   # garbage between members
        list(iter_warc_records(gz + b"trailing junk"))
    with pytest.raises(ValueError):   # corrupt member body
        list(iter_warc_records(gz[:10] + b"\x00" * 20))
    # empty member contributes nothing but doesn't break the walk
    assert list(iter_warc_records(gzip.compress(b"", mtime=0))) == []


def test_robots_classify_longest_match_and_ties(ray_session):
    import pandas as pd
    import pytest
    import ray.data
    from doc_ocr_ray.stages.urls import robots_classify

    rules = [("a.test", "/p", 0), ("a.test", "/p/keep", 1),
             ("a.test", "/tie", 0), ("a.test", "/tie", 1)]
    urls = pd.DataFrame({
        "doc_id": pd.Series(range(5), dtype="int64"),
        "url": ["http://a.test/p/drop", "https://WWW.a.test/p/keep/x",
                "http://a.test/tie/page", "http://a.test/other",
                "http://b.test/p/drop"]})
    out = (robots_classify(ray.data.from_pandas(urls), rules)
           .to_pandas().sort_values("doc_id"))
    # longest-match: /p/keep allow overrides /p disallow; tie->allow;
    # no rule (other path, other domain) -> allowed
    assert list(out["allowed"]) == [0, 1, 1, 1, 1]
    assert out["path"].iloc[1] == "/p/keep/x"   # www+scheme stripped
    with pytest.raises(ValueError):
        robots_classify(ray.data.from_pandas(urls),
                        [("a.test", "nope", 0)])


def test_robots_wildcards_and_anchors(ray_session):
    """Google REP wildcard semantics: '*' crosses '/', trailing '$'
    anchors end-of-path, '$' mid-pattern is literal, specificity is
    raw pattern length (wildcards count), ties go to allow."""
    import pandas as pd
    import ray.data
    from doc_ocr_ray.stages.urls import robots_classify, _robots_pattern

    rules = [
        ("w.test", "/*.gif$", 0),        # extension block, any depth
        ("w.test", "/a*z", 0),           # star crosses slashes
        ("w.test", "/a/keep*", 1),       # len 8 allow beats len 5 block
        ("w.test", "/exact$", 0),        # anchored: no suffixes
        ("w.test", "/lit$eral", 0),      # mid-pattern $ is literal
        ("w.test", "/t*", 0),            # len 3 vs len 3 plain allow:
        ("w.test", "/ti", 1),            # -> tie resolves to allow
    ]
    urls = pd.DataFrame({
        "doc_id": pd.Series(range(9), dtype="int64"),
        "url": ["http://w.test/img/pic.gif",      # 0: blocked by *.gif$
                "http://w.test/img/pic.gifx",     # 1: $ anchor -> allowed
                "http://w.test/a/b/c/z",          # 2: /a*z crosses /
                "http://w.test/a/keep/z",         # 3: longer allow wins
                "http://w.test/exact",            # 4: anchored block
                "http://w.test/exact/sub",        # 5: past anchor -> ok
                "http://w.test/lit$eral/x",       # 6: literal $ matches
                "http://w.test/ti/page",          # 7: tie -> allow
                "http://w.test/unrelated"]})      # 8: no rule -> allow
    out = (robots_classify(ray.data.from_pandas(urls), rules)
           .to_pandas().sort_values("doc_id"))
    assert list(out["allowed"]) == [0, 1, 0, 1, 0, 1, 0, 1, 1]

    # leading-* patterns are legal REP; regex metachars stay literal
    plen, is_rx, m = _robots_pattern("/p(1)+?")
    assert not is_rx and m == "/p(1)+?"
    out2 = (robots_classify(
        ray.data.from_pandas(pd.DataFrame({
            "doc_id": pd.Series([0, 1], dtype="int64"),
            "url": ["http://w.test/x/f.pdf", "http://w.test/f.pdfx"]})),
        [("w.test", "*.pdf$", 0)]).to_pandas().sort_values("doc_id"))
    assert list(out2["allowed"]) == [0, 1]


def test_warc_http2_status_and_truncation():
    import pytest
    from doc_ocr_ray.sources.warc import (encode_warc, iter_warc_records,
                                          split_http, warc_pages_batch)
    import pandas as pd

    raw = encode_warc([
        ({"WARC-Type": "response", "WARC-Target-URI": "http://h2/"},
         b"HTTP/2 200 OK\r\nx: y\r\n\r\n<p>h2 body</p>")])
    out = warc_pages_batch(pd.DataFrame(
        {"doc_id": pd.Series([1], dtype="int64"), "payload": [raw]}))
    assert list(out["url"]) == ["http://h2/"]
    assert split_http(b"HTTP/2 404 NF\r\n\r\nx")[0] == 404

    # truncated archive raises instead of yielding a partial body
    with pytest.raises(ValueError):
        list(iter_warc_records(raw[:-20]))


def test_robots_uppercase_rule_domain_matches(ray_session):
    import pandas as pd
    import ray.data
    from doc_ocr_ray.stages.urls import robots_classify
    urls = pd.DataFrame({"doc_id": pd.Series([0], dtype="int64"),
                         "url": ["http://Example.com/private/x"]})
    out = robots_classify(ray.data.from_pandas(urls),
                          [("Example.com", "/private", 0)]).to_pandas()
    assert list(out["allowed"]) == [0]


def test_robots_www_rule_domain_matches(ray_session):
    import pandas as pd
    import ray.data
    from doc_ocr_ray.stages.urls import robots_classify
    urls = pd.DataFrame({"doc_id": pd.Series([0], dtype="int64"),
                         "url": ["http://www.example.com/private/x"]})
    out = robots_classify(ray.data.from_pandas(urls),
                          [("www.Example.com", "/private", 0)]).to_pandas()
    assert list(out["allowed"]) == [0]


def test_sitemap_entries_adversarial():
    from doc_ocr_ray.stages.urls import sitemap_entries
    # truncated/unclosed entries, decoys, entity edge cases
    kind, es = sitemap_entries(
        '<urlset><url><loc>http://a.test/ok</loc></url>'
        '<url><loc>http://a.test/unclosed'       # no </loc>, no </url>
        '<url><loc>http://a.test/after</loc></url>')
    assert kind == "url"
    # the unclosed entry swallows up to the NEXT </url> close — its
    # loc field never closes, so only the intact first entry and the
    # recovered scan afterwards emit
    assert [e["loc"] for e in es] == ["http://a.test/ok"]
    # index root ignores <url> decoys; url root ignores <sitemap>
    kind, es = sitemap_entries(
        '<sitemapindex><url><loc>http://x.test/decoy</loc></url>'
        '<sitemap><loc>http://x.test/s.xml</loc></sitemap>'
        '</sitemapindex>')
    assert kind == "sitemap" and [e["loc"] for e in es] == [
        "http://x.test/s.xml"]
    # entities: named, numeric, hex, and an invalid one left literal
    kind, es = sitemap_entries(
        '<urlset><url><loc>http://a.test/?q=&quot;x&quot;&amp;r=&#x2F;'
        '&#47;&#xZZ;</loc></url></urlset>')
    assert es[0]["loc"] == 'http://a.test/?q="x"&r=//&#xZZ;'
    # lastmod: invalid dates/junk -> None (the stage maps None to
    # the -1 sentinel); fractional seconds + offsets ok
    cases = {
        "2020-13-01": None, "2020-00-10": None, "garbage": None,
        "2020-01-02junk": None,
        "2020-01-02": 1577923200000000,
        "2020-01-02T00:00:00.5Z": 1577923200000000,
        "2020-01-02T01:00:00+01:00": 1577923200000000}
    for text, want in cases.items():
        _, es = sitemap_entries(
            f'<urlset><url><loc>http://a.test/</loc>'
            f'<lastmod>{text}</lastmod></url></urlset>')
        assert es[0]["lastmod_us"] == want, text
    # priority: clamp both ends, junk -> None
    for text, want in {"1.7": 1000, "-0.5": 0, "0.55": 550,
                       "abc": None}.items():
        _, es = sitemap_entries(
            f'<urlset><url><loc>http://a.test/</loc>'
            f'<priority>{text}</priority></url></urlset>')
        assert es[0]["priority_milli"] == want, text
    # loc-less entries skip without shifting ranks of later entries
    _, es = sitemap_entries(
        '<urlset><url><priority>0.9</priority></url>'
        '<url><loc>http://a.test/second</loc></url></urlset>')
    assert len(es) == 1 and es[0]["loc"] == "http://a.test/second"
    # whitespace stripped INSIDE loc (spec: no embedded whitespace)
    _, es = sitemap_entries(
        '<urlset><url><loc>\n  http://a.test/x\n  </loc></url></urlset>')
    assert es[0]["loc"] == "http://a.test/x"
    # no recognizable root
    assert sitemap_entries("<rss><channel/></rss>") == ("", [])
    assert sitemap_entries("") == ("", [])


def test_sitemap_urls_stage_nan_and_empty(ray_session):
    import pandas as pd
    import ray.data
    from doc_ocr_ray.stages.urls import sitemap_urls
    df = pd.DataFrame({
        "doc_id": pd.Series([1, 2], dtype="int64"),
        "xml": ['<urlset><url><loc>http://a.test/p</loc></url></urlset>',
                None]})
    out = sitemap_urls(ray.data.from_pandas(df).repartition(2)).to_pandas()
    assert list(out["loc"]) == ["http://a.test/p"]
    assert list(out["lastmod_us"]) == [-1]


def test_robots_sitemaps_directive_parsing(ray_session):
    import pandas as pd
    import ray.data
    from doc_ocr_ray.stages.urls import robots_sitemaps
    txt = ("User-agent: *\nDisallow: /private\n"
           "Sitemap: http://a.test/s1.xml\n"
           "sitemap:http://a.test/s2.xml   # inline comment\n"
           "SiteMap\t: http://a.test/s3.xml\n"      # space before colon ok
           "Sitemap: http://a.test/s4.xml#frag\n"   # strips at '#'
           "Sitemap:\n"                             # empty value: skip
           "#Sitemap: http://a.test/commented\n"    # commented out: skip
           "NotSitemap: http://a.test/decoy\n")
    df = pd.DataFrame({"doc_id": pd.Series([1, 2], dtype="int64"),
                       "robots_txt": [txt, None]})
    out = (robots_sitemaps(ray.data.from_pandas(df).repartition(2))
           .to_pandas().sort_values("rank"))
    assert list(out["doc_id"].unique()) == [1]
    assert list(out["sitemap_url"]) == [
        "http://a.test/s1.xml", "http://a.test/s2.xml",
        "http://a.test/s3.xml", "http://a.test/s4.xml"]
    assert list(out["rank"]) == [0, 1, 2, 3]


def test_sitemap_review_fixes_cdata_dates_priority_bom():
    # CDATA content is literal (no entity decode) and mixed
    # text+CDATA concatenates; calendar-aware lastmod validation;
    # strict-decimal priority (nan/inf/underscores rejected); BOM
    # tolerated before a robots Sitemap directive
    from doc_ocr_ray.stages.urls import (_RS_LINE, _sm_lastmod_us,
                                         sitemap_entries)
    _, es = sitemap_entries('<urlset><url><loc><![CDATA['
                            'http://a.test/?u=x&amp;t=y]]></loc>'
                            '</url></urlset>')
    assert es[0]["loc"] == "http://a.test/?u=x&amp;t=y"
    _, es = sitemap_entries('<urlset><url><loc>http://a.test/'
                            '<![CDATA[p&amp;]]>?a=&amp;b</loc>'
                            '</url></urlset>')
    assert es[0]["loc"] == "http://a.test/p&amp;?a=&b"
    assert _sm_lastmod_us("2020-02-31") is None
    assert _sm_lastmod_us("2020-02-29") is not None
    assert _sm_lastmod_us("2019-02-29") is None
    assert _sm_lastmod_us("2020-01-02T99:00:00Z") is None
    assert _sm_lastmod_us("2020-01-02T23:59:59Z") is not None
    for t, want in [("nan", None), ("1_0", None), ("inf", None),
                    ("+0.25", 250)]:
        _, es = sitemap_entries(
            f'<urlset><url><loc>http://a.test/</loc>'
            f'<priority>{t}</priority></url></urlset>')
        assert es[0]["priority_milli"] == want, t
    assert _RS_LINE.findall(
        "﻿Sitemap: http://a.test/s.xml\n") == [
        "http://a.test/s.xml"]
