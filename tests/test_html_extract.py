"""HTML main-content extraction: block heuristics, entity decoding,
dropped subtrees, media spans, and the nested-document assembly."""
import pandas as pd
import pyarrow as pa
import pytest

from doc_ocr_ray.schema import DOCUMENTS_SCHEMA
from doc_ocr_ray.stages.html_extract import (MainContentParser,
                                             extract_main_content,
                                             html_to_documents_batch,
                                             html_to_spans_batch)


def spans_of(html, **kw):
    p = MainContentParser(**kw)
    p.feed(html)
    p.close()
    return p.spans


LONG = "x" * 30  # comfortably over the 25-char text floor


def test_adversarial_page_end_to_end():
    html = (
        '<html><head><title>T</title>'
        '<script>var x = "<p>decoy</p>";</script></head><body>'
        '<header><h1>Site junk</h1></header>'
        '<nav><a href="/">Home</a> <a>About</a></nav>'
        '<h1>Doc heading</h1>'
        '<!-- comment with <p>fake</p> -->'
        f'<p>{LONG} first</p>'
        '<p><a href="1">click here now</a> <a href="2">more spam here</a></p>'
        '<p>tiny.</p>'
        f'<p>{LONG} has one small <a href="#">link</a> inline</p>'
        '<IMG SRC="img/1.png" alt="x">'
        f'<div><div><p>{LONG} nested</p></div></div>'
        f'<p>{LONG} before.<img src="mid/1.jpg"/>{LONG} after.</p>'
        '<p>Entities &amp; escapes &lt;tag&gt; &quot;q&quot; '
        'stay textual here.</p>'
        '<footer>(c) footer</footer></body></html>')
    assert spans_of(html) == [
        ("text", "Doc heading", ""),
        ("text", f"{LONG} first", ""),
        ("text", f"{LONG} has one small link inline", ""),
        ("media", "", "img/1.png"),
        ("text", f"{LONG} nested", ""),
        ("text", f"{LONG} before.", ""),
        ("media", "", "mid/1.jpg"),
        ("text", f"{LONG} after.", ""),
        ("text", 'Entities & escapes <tag> "q" stay textual here.', ""),
    ]


def test_link_density_boundary_exactly_half_kept():
    # 30 linked chars, 30 unlinked -> 2*30 <= 60, kept
    html = f'<p><a href="#">{"l" * 30}</a>{"t" * 30}</p>'
    assert spans_of(html) == [("text", "l" * 30 + "t" * 30, "")]
    # one more linked char tips it over -> dropped
    html = f'<p><a href="#">{"l" * 31}</a>{"t" * 30}</p>'
    assert spans_of(html) == []


def test_heading_floor_and_text_floor():
    assert spans_of("<h1>ab</h1>") == []            # < 3 chars
    assert spans_of("<h2>abc</h2>") == [("text", "abc", "")]
    assert spans_of(f"<p>{'y' * 24}</p>") == []     # < 25 chars
    assert spans_of(f"<p>{'y' * 25}</p>") == [("text", "y" * 25, "")]
    # heading leniency does not leak into the following paragraph
    assert spans_of(f"<h1>abc</h1><p>{'y' * 24}</p>") == [
        ("text", "abc", "")]


def test_img_without_src_and_img_in_dropped_subtree():
    assert spans_of('<img alt="no src"><img src="">') == []
    assert spans_of('<nav><img src="x.png"></nav>') == []
    assert spans_of('<a href="#"><img src="x.png"></a>') == [
        ("media", "", "x.png")]


def test_unclosed_block_flushes_at_eof_and_stray_close_tags():
    assert spans_of(f"</footer></div><p>{LONG} tail") == [
        ("text", f"{LONG} tail", "")]


def test_br_and_hr_split_blocks():
    a, b = "a" * 30, "b" * 30
    assert spans_of(f"<p>{a}<br>{b}</p>") == [
        ("text", a, ""), ("text", b, "")]
    assert spans_of(f"{a}<hr>{b}") == [("text", a, ""), ("text", b, "")]
    # each half is judged on its own: a short half drops alone
    assert spans_of(f"<p>{a}<br>tiny</p>") == [("text", a, "")]


def test_whitespace_collapse_contract():
    html = f"<p>  {LONG}\t\n multi   space\f{LONG} </p>"
    assert spans_of(html) == [
        ("text", f"{LONG} multi space {LONG}", "")]


def test_nested_drop_subtrees_and_numeric_entities():
    html = ('<div><nav><div><p>deep boilerplate stays dropped here</p>'
            '</div></nav></div>'
            f'<p>&#65;&#66; {LONG} numeric entities decode</p>')
    assert spans_of(html) == [
        ("text", f"AB {LONG} numeric entities decode", "")]


def test_batch_fn_flat_rows_and_typed_empty():
    batch = pd.DataFrame({
        "doc_id": pd.Series([7, 8], dtype="int64"),
        "html": [f"<p>{LONG} seven</p><img src='s.png'>", ""]})
    out = html_to_spans_batch(batch)
    assert list(out["doc_id"]) == [7, 7]
    assert list(out["offset"]) == [0, 1]
    assert list(out["kind"]) == ["text", "media"]
    empty = html_to_spans_batch(batch.iloc[:0])
    assert isinstance(empty, pa.Table) and empty.num_rows == 0
    assert empty.schema.field("doc_id").type == pa.int64()
    assert empty.schema.field("text").type == pa.string()


def test_nested_documents_match_flat_and_schema():
    batch = pd.DataFrame({
        "doc_id": pd.Series([3], dtype="int64"),
        "html": [f"<h1>Head three</h1><p>{LONG}</p><img src='i.png'>"]})
    tbl = html_to_documents_batch(batch)
    assert tbl.schema.equals(DOCUMENTS_SCHEMA)
    rows = tbl.to_pylist()
    assert rows[0]["doc_id"] == "html-3"
    assert [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in rows[0]["spans"]] == [
        ("text", "Head three", "", 0),
        ("text", LONG, "", 1),
        ("media", "", "i.png", 2)]


def test_dataset_stage_streams(ray_session):
    import ray.data
    batch = pd.DataFrame({
        "doc_id": pd.Series(range(20), dtype="int64"),
        "html": [f"<p>{LONG} body {i}</p>" for i in range(20)]})
    ds = ray.data.from_pandas(batch).repartition(4)
    out = extract_main_content(ds).to_pandas()
    assert len(out) == 20
    assert set(out["kind"]) == {"text"}


def test_unclosed_anchor_auto_closes_at_block_boundary():
    # a single missing </a> must not mark the rest of the page as
    # link text (browsers auto-close <a> at block boundaries)
    html = (f'<p><a href="#">click here now more spam</a> x</p>'
            f'<p><a href="#">unclosed link text goes here</p>'
            f'<p>{LONG} real prose survives</p>')
    assert spans_of(html) == [("text", f"{LONG} real prose survives", "")]


def test_documents_batch_empty_and_all_boilerplate():
    for frame in (
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "html": pd.Series([], dtype="object")}),
        pd.DataFrame({"doc_id": pd.Series([1, 2], dtype="int64"),
                      "html": ["<nav><a>x</a></nav>",
                               "<script>junk()</script>"]}),
    ):
        tbl = html_to_documents_batch(frame)
        assert tbl.num_rows == 0
        assert tbl.schema.equals(DOCUMENTS_SCHEMA)


def test_table_extraction_nesting_and_structure():
    from doc_ocr_ray.stages.html_extract import html_tables_batch
    html = ("<p>pre</p><table><tr><th>H1</th><th>H &amp; 2</th></tr>"
            "<tr><td>a <b>bold</b></td><td><script>x</script>b</td></tr>"
            "</table>"
            "<table><tr><td>t2</td>"
            "<td><table><tr><td>inner</td></tr></table></td></tr></table>")
    out = html_tables_batch(pd.DataFrame(
        {"doc_id": pd.Series([5], dtype="int64"), "html": [html]}))
    got = list(map(tuple, out[["table_idx", "row", "col", "is_header",
                               "cell"]].to_numpy()))
    # cells emit at CLOSE time: the outer cell hosting the nested
    # table completes after its inner table's cells
    assert sorted(got) == [
        (0, 0, 0, 1, "H1"), (0, 0, 1, 1, "H & 2"),
        (0, 1, 0, 0, "a bold"), (0, 1, 1, 0, "b"),
        (1, 0, 0, 0, "t2"), (1, 0, 1, 0, ""),     # structural empty
        (2, 0, 0, 0, "inner")]                    # nested = own table
    # text AFTER a nested table stays part of the enclosing cell
    out = html_tables_batch(pd.DataFrame(
        {"doc_id": pd.Series([1], dtype="int64"),
         "html": ["<table><tr><td>Total: <table><tr><td>i</td></tr>"
                  "</table> 42 USD</td></tr></table>"]}))
    outer = out[out["table_idx"] == 0]
    assert list(outer["cell"]) == ["Total: 42 USD"]
    # td outside any tr is ignored; stray close tags are harmless
    out = html_tables_batch(pd.DataFrame(
        {"doc_id": pd.Series([1], dtype="int64"),
         "html": ["</table><table><td>orphan</td></table>"]}))
    assert len(out) == 0


def test_mega_page_containment():
    """A multi-megabyte page parses in bounded time/memory and only
    costs its own document — the mega-doc skew story for the parse
    stages (north rule: mega-documents must not stall the stream)."""
    import time
    n_blocks = 20_000
    html = "".join(
        f"<p>Block {i} of the mega page holds enough words to pass "
        f"the length floor.</p>" for i in range(n_blocks))
    assert len(html) > 1_500_000
    t0 = time.time()
    spans = spans_of(html)
    wall = time.time() - t0
    assert len(spans) == n_blocks
    assert wall < 20.0      # parse is linear; generous CI allowance


def test_link_extraction_and_resolution():
    from doc_ocr_ray.stages.html_extract import (html_links_batch,
                                                 resolve_href)
    assert resolve_href("http://a.test/d/p", "mailto:x@y") == "mailto:x@y"
    assert resolve_href("http://a.test/d/p", "ftp://f.test/z") == \
        "ftp://f.test/z"
    assert resolve_href("http://a.test/d/p", "//c.test/j") == \
        "http://c.test/j"
    assert resolve_href("http://a.test/d/p", "/abs") == \
        "http://a.test/abs"
    assert resolve_href("http://a.test/d/p", "rel.html") == \
        "http://a.test/d/rel.html"
    assert resolve_href("http://a.test", "rel.html") == \
        "http://a.test/rel.html"


def test_remove_dot_segments_rfc3986():
    """RFC 3986 §5.2.4 cases incl. the spec's own examples, plus the
    resolve_href integration (verdict round-2 item 6)."""
    from doc_ocr_ray.stages.html_extract import (remove_dot_segments,
                                                 resolve_href)
    # the two RFC examples
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"
    # root-pops are consumed, never leak '..'
    assert remove_dot_segments("/../x") == "/x"
    assert remove_dot_segments("/a/../../../x") == "/x"
    # trailing '.'/'..' keep the directory slash
    assert remove_dot_segments("/a/b/.") == "/a/b/"
    assert remove_dot_segments("/a/b/..") == "/a/"
    # dotted FILENAMES are not dot segments
    assert remove_dot_segments("/a/..b/c..") == "/a/..b/c.."
    assert remove_dot_segments("/a/.hidden") == "/a/.hidden"
    assert remove_dot_segments("") == ""
    assert remove_dot_segments("..") == ""

    base = "http://a.test/d1/d2/p"
    assert resolve_href(base, "../up") == "http://a.test/d1/up"
    assert resolve_href(base, "./here") == "http://a.test/d1/d2/here"
    assert resolve_href(base, "../../../../x") == "http://a.test/x"
    assert resolve_href(base, "/a/b/../c") == "http://a.test/a/c"
    assert resolve_href(base, "//c.test/q/../r") == "http://c.test/r"
    assert resolve_href(base, "//c.test") == "http://c.test"
    # absolute refs still pass through untouched (documented contract)
    assert resolve_href(base, "http://e.test/a/../b") == \
        "http://e.test/a/../b"

    # §5.2.4 applies to the PATH only: dot segments inside a query or
    # fragment pass through verbatim and never pop real path segments
    assert resolve_href(base, "/search?next=/a/../b") == \
        "http://a.test/search?next=/a/../b"
    assert resolve_href(base, "../q#s/../t") == \
        "http://a.test/d1/q#s/../t"
    assert resolve_href(base, "x?../y") == "http://a.test/d1/d2/x?../y"
    assert resolve_href(base, "//c.test/p/../q?r=/./s") == \
        "http://c.test/q?r=/./s"


def test_html_links_batch_ranks_and_decoys():
    from doc_ocr_ray.stages.html_extract import html_links_batch
    b = pd.DataFrame({
        "doc_id": pd.Series([1], dtype="int64"),
        "url": ["http://a.test/d/p"],
        "html": ["<nav><a href='/n'>n</a></nav>"
                 "<p><a href='r'>r</a><a href='#f'>skip</a><a>none</a>"
                 "</p><script><a href='decoy'>x</a></script>"]})
    out = html_links_batch(b)
    assert list(out["rank"]) == [0, 1]   # nav kept, fragment/script not
    assert list(out["target"]) == ["http://a.test/n",
                                   "http://a.test/d/r"]


def test_review_fixes_head_close_optional_and_href_hygiene():
    from doc_ocr_ray.stages.html_extract import (html_links_batch,
                                                 html_tables_batch,
                                                 resolve_href)
    # legal HTML5: no </head> — <body> must exit the dropped subtree
    html = ('<html><head><title>t</title><body>'
            f'<p>{LONG} content survives the missing head close</p>'
            '<p><a href="/x">link</a></p>'
            '<table><tr><td>cell</td></tr></table>')
    assert spans_of(html) == [
        ("text", f"{LONG} content survives the missing head close", "")]
    frame = pd.DataFrame({"doc_id": pd.Series([1], dtype="int64"),
                          "url": ["http://a.test/"], "html": [html]})
    assert list(html_links_batch(frame)["href"]) == ["/x"]
    assert list(html_tables_batch(frame)["cell"]) == ["cell"]

    # https base keeps its scheme on every relative branch
    assert resolve_href("https://a.test/d/p", "/abs") == \
        "https://a.test/abs"
    assert resolve_href("https://a.test/d/p", "r.html") == \
        "https://a.test/d/r.html"
    assert resolve_href("https://a.test/d/p", "//c.test/j") == \
        "https://c.test/j"

    # attribute whitespace strips; whitespace-only and padded
    # fragments never emit
    frame = pd.DataFrame({"doc_id": pd.Series([1], dtype="int64"),
                          "url": ["http://a.test/"],
                          "html": ['<a href=" #top">f</a>'
                                   '<a href="   ">w</a>'
                                   '<a href="\n/ok\n">k</a>']})
    out = html_links_batch(frame)
    assert list(out["target"]) == ["http://a.test/ok"]

    # NaN url/html cells: no TypeError; a base-less page emits ONLY
    # scheme-absolute hrefs (relative ones cannot resolve)
    frame = pd.DataFrame({"doc_id": pd.Series([1, 2], dtype="int64"),
                          "url": [float("nan"), "http://a.test/"],
                          "html": ['<a href="/x">x</a>'
                                   '<a href="http://abs.test/y">y</a>',
                                   float("nan")]})
    out = html_links_batch(frame)
    assert list(out["target"]) == ["http://abs.test/y"]
    # internal tab/newline removed ANYWHERE per WHATWG
    frame = pd.DataFrame({"doc_id": pd.Series([1], dtype="int64"),
                          "url": ["http://a.test/"],
                          "html": ['<a href="/a\n/b\tc">x</a>']})
    assert list(html_links_batch(frame)["target"]) == \
        ["http://a.test/a/bc"]


def test_body_reset_is_head_scoped():
    """<body> closes ONLY an open head subtree: embedded documents
    inside template/noscript stay dropped in all three parsers."""
    from doc_ocr_ray.stages.html_extract import (html_links_batch,
                                                 html_tables_batch)
    leak = ('<template><html><head></head><body>'
            f'<p>{LONG} embedded boilerplate</p>'
            '<a href="/tracking-pixel">t</a>'
            '<table><tr><td>ghost</td></tr></table>'
            '</body></html></template>'
            f'<p>{LONG} real content</p>'
            '<a href="/real">r</a>'
            '<table><tr><td>real cell</td></tr></table>')
    assert spans_of(leak) == [("text", f"{LONG} real content", "")]
    frame = pd.DataFrame({"doc_id": pd.Series([1], dtype="int64"),
                          "url": ["http://a.test/"], "html": [leak]})
    assert list(html_links_batch(frame)["href"]) == ["/real"]
    assert list(html_tables_batch(frame)["cell"]) == ["real cell"]


def test_truncated_nested_table_drains_suspended_cells():
    from doc_ocr_ray.stages.html_extract import html_tables_batch
    out = html_tables_batch(pd.DataFrame(
        {"doc_id": pd.Series([1], dtype="int64"),
         "html": ["<table><tr><td>Total: <table><tr><td>i"]}))
    got = sorted(map(tuple, out[["table_idx", "row", "col",
                                 "cell"]].to_numpy()))
    # the suspended outer cell survives truncation
    assert got == [(0, 0, 0, "Total:"), (1, 0, 0, "i")]


def test_crawl_frontier_composition(ray_session):
    """Crawled anti-join, robots block, rank-mass aggregation and the
    per-host cap all fire on a handcrafted 2-page snapshot."""
    import ray.data
    from doc_ocr_ray.pipelines.frontier import crawl_frontier

    pages = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1],
        "url": ["http://a.test/p0", "http://a.test/p1"],
        "html": [
            '<p><a href="http://b.test/x">1</a>'
            '<a href="http://a.test/p1">crawled</a>'
            '<a href="http://c.test/blocked">rob</a></p>',
            '<p><a href="http://b.test/x">1</a>'
            '<a href="http://b.test/y">2</a>'
            '<a href="http://b.test/z">3</a>'
            '<a href="http://b.test/w">4</a></p>',
        ]}))
    ranks = ray.data.from_pandas(pd.DataFrame(
        {"node": [0, 1], "rank_scaled": [100, 10]}))
    out = (crawl_frontier(pages, ranks, [("c.test", "/", 0)],
                          k_per_host=2)
           .to_pandas().sort_values(["domain", "host_rank"])
           .reset_index(drop=True))
    got = [tuple(r) for r in out[["domain", "canon_url",
                                  "frontier_score", "n_links",
                                  "host_rank"]].itertuples(index=False)]
    assert got == [("b.test", "b.test/x", 110, 2, 1),
                   ("b.test", "b.test/w", 10, 1, 2)]


def test_anchor_links_batch_scopes_and_collapse():
    from doc_ocr_ray.stages.html_extract import anchor_links_batch
    html = ('<p><a href="/top"> home\n\tpage </a></p>'
            # invalid nesting: second <a> implicitly closes the first
            '<div><a href="/x">alpha<a href="/y">beta</a></div>'
            # dropped subtree inside an anchor never contributes text
            '<p><a href="/z">pre <script>var a;</script>post</a></p>'
            # empty (image-style) anchor keeps its href, empty text
            '<p><a href="/img"></a></p>'
            # unclosed at EOF still closes
            '<p><a href="/tail">tail text')
    out = anchor_links_batch(pd.DataFrame({
        "doc_id": pd.Series([3], dtype="int64"),
        "url": ["http://h.test/d/p"], "html": [html]}))
    got = list(zip(out["target"], out["anchor"]))
    assert got == [("http://h.test/top", "home page"),
                   ("http://h.test/x", "alpha"),
                   ("http://h.test/y", "beta"),
                   ("http://h.test/z", "pre post"),
                   ("http://h.test/img", ""),
                   ("http://h.test/tail", "tail text")]
    assert list(out["rank"]) == [0, 1, 2, 3, 4, 5]


def test_anchor_corpus_distinct_pages_topk_and_ties(ray_session):
    import ray
    from doc_ocr_ray.stages.html_extract import anchor_corpus
    # doc 0 repeats (target=/t, 'home') twice -> ONE distinct page;
    # /t collects 4 distinct anchors so k=3 cuts the rarest; 'aa' and
    # 'bb' tie on n_docs -> ascending anchor order breaks the tie.
    # repartition(2) forces the cross-batch distinct through the
    # group fn (in-batch drop_duplicates is only a combiner).
    link = lambda a: f'<p><a href="/t">{a}</a></p>'
    pages = pd.DataFrame({
        "doc_id": pd.Series(range(4), dtype="int64"),
        "url": [f"http://h.test/p{i}" for i in range(4)],
        "html": [link("home") + link("home") + link("aa"),
                 link("home") + link("bb"),
                 link("home") + link("aa") + link("rare"),
                 link("home") + link("bb")]})
    ds = ray.data.from_pandas(pages).repartition(2)
    out = (anchor_corpus(ds, k=3).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    got = [tuple(r) for r in out[["target", "anchor", "n_docs",
                                  "rank"]].itertuples(index=False)]
    assert got == [("http://h.test/t", "home", 4, 0),
                   ("http://h.test/t", "aa", 2, 1),
                   ("http://h.test/t", "bb", 2, 2)]
