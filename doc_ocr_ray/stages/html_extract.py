"""HTML main-content extraction: raw page markup -> interleaved spans.

This is the web-corpus front door the north rule names ("HTML
boilerplate strip, DOM heuristics"): a crawl delivers pages as raw
HTML strings; this stage parses each page with a real HTML parser and
emits the engine's canonical interleaved span rows ``(doc_id, offset,
kind, text, media_ref)`` — the exact table shape every downstream
operator (dedup, quality funnel, packing, rendering) already consumes.
The reference engine ingests already-parsed layout JSON
(`/root/reference/src/question_extraction/extractor.py:36` reads the
PP-OCR output); this stage is the analogous ingestion boundary for
HTML-origin corpora, built on jusText/Arc90-style block heuristics
(Pomikalek 2011) rather than a port of anything.

Content model (all thresholds explicit so the deterministic-generator
oracle in ``__ray_entry__`` can state the expected spans exactly):

- **Dropped subtrees**: everything inside ``<script> <style>
  <noscript> <template> <head> <nav> <header> <footer> <aside>
  <form> <iframe> <svg>`` is boilerplate/markup by construction —
  text AND images inside them never reach the output.
- **Blocks**: text accumulates into the current block; any open or
  close of a block-level tag (``p div h1-h6 li ul ol table tr td th
  pre blockquote article section main br hr``) flushes it.  ``<img>``
  also flushes (so a mid-paragraph image splits its paragraph into
  two independently-judged text spans, keeping document order exact).
- **Keep rule** per flushed block, over entity-decoded text with
  whitespace collapsed per the repo contract (``[\\t\\n\\f\\r ]+`` ->
  one space, edges stripped):
    1. non-empty after collapsing;
    2. clean length >= ``min_text_chars`` (25), or >=
       ``min_heading_chars`` (3) when the block was opened by a
       heading tag — headings are short by nature but high-signal;
    3. link density <= 1/2: ``2 * link_chars <= raw_chars`` where
       both counts are raw (pre-collapse) character counts and
       ``link_chars`` is text emitted inside any open ``<a>`` —
       the classic link-farm / nav-remnant discriminator.
- **Media**: ``<img src=...>`` outside dropped subtrees emits a
  ``kind='media'`` span carrying ``src`` as ``media_ref`` (no length
  or density rule — images are not boilerplate-judged, matching how
  the span-domain pipeline treats ``media_ref`` spans as opaque).
- **Offsets**: ``offset`` is the span's index within its document
  (the same order-index convention ``synth.make_doc`` uses), so the
  output feeds ``restitch_documents`` / ``pack_interleaved``
  unchanged.

Scale shape: ONE stateless ``map_batches`` — parsing is per-document
string work (exactly like the question-extraction kernel), state is a
per-worker compiled parser class, nothing shuffles, mega-pages cost
only their own parse.  At 100 TB this stage is embarrassingly
parallel and reads only (doc_id, html) columns.
"""
from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Tuple

import pandas as pd

from doc_ocr_ray.util import str_or_empty, typed_if_empty

_WS = re.compile(r"[\t\n\f\r ]+")

DROP_SUBTREES = frozenset(
    "script style noscript template head nav header footer aside "
    "form iframe svg".split())
BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol table tr td th pre blockquote "
    "article section main br hr".split())
HEADING_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])

MIN_TEXT_CHARS = 25
MIN_HEADING_CHARS = 3


class MainContentParser(HTMLParser):
    """Streaming tag-event parser (stdlib ``html.parser`` — lenient on
    broken markup, decodes entities via ``convert_charrefs``) that
    applies the block model above and collects spans."""

    def __init__(self, min_text_chars: int = MIN_TEXT_CHARS,
                 min_heading_chars: int = MIN_HEADING_CHARS):
        super().__init__(convert_charrefs=True)
        self._min_t = min_text_chars
        self._min_h = min_heading_chars
        self.spans: List[Tuple[str, str, str]] = []  # (kind, text, ref)
        self._pieces: List[str] = []
        self._raw = 0          # raw chars accumulated in current block
        self._link = 0         # raw chars accumulated while inside <a>
        self._drop = 0         # depth of open dropped subtrees
        self._head_mark = None  # drop depth at which <head> opened
        self._a = 0            # depth of open <a>
        self._heading = False  # current block opened by a heading tag

    def _flush(self) -> None:
        raw, link = self._raw, self._link
        text = _WS.sub(" ", "".join(self._pieces)).strip(" ")
        self._pieces.clear()
        self._raw = self._link = 0
        if not text:
            return
        if len(text) < (self._min_h if self._heading else self._min_t):
            return
        if 2 * link > raw:
            return
        self.spans.append(("text", text, ""))

    # -- tag events ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "body":
            # the </head> close tag is optional in HTML (browsers
            # auto-close at <body>); html.parser never synthesizes it.
            # Close ONLY an innermost open head subtree — a <body>
            # inside <template>/<noscript> must NOT cancel that drop
            if self._head_mark is not None and \
                    self._drop == self._head_mark + 1:
                self._drop = self._head_mark
            self._head_mark = None
            return
        if tag in DROP_SUBTREES:
            self._flush()
            self._a = 0          # auto-close an <a> left open
            if tag == "head" and self._head_mark is None:
                self._head_mark = self._drop
            self._drop += 1
            return
        if self._drop:
            return
        if tag == "a":
            self._a += 1
            return
        if tag == "img":
            self._flush()
            src = next((v for k, v in attrs if k == "src" and v), "")
            if src:
                self.spans.append(("media", "", src))
            return
        if tag in BLOCK_TAGS:
            self._flush()
            # browsers auto-close an unclosed <a> at block boundaries;
            # html.parser does not — without this reset one missing
            # </a> marks the REST OF THE PAGE as link text and the
            # density rule silently deletes all remaining content
            self._a = 0
            self._heading = tag in HEADING_TAGS

    def handle_endtag(self, tag):
        if tag in DROP_SUBTREES:
            # max() keeps stray close tags from corrupting the counter
            self._drop = max(0, self._drop - 1)
            if tag == "head":
                self._head_mark = None
            return
        if self._drop:
            return
        if tag == "a":
            self._a = max(0, self._a - 1)
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._a = 0          # block boundary auto-closes <a>
            self._heading = False

    # void elements written as <img .../> arrive here; route both ways
    # through the same handlers (the stdlib default does the same, but
    # being explicit keeps the contract visible)
    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_data(self, data):
        if self._drop or not data:
            return
        self._pieces.append(data)
        self._raw += len(data)
        if self._a:
            self._link += len(data)

    def close(self):
        super().close()
        self._flush()


def html_to_spans_batch(batch: pd.DataFrame, *, html_col: str = "html",
                        id_col: str = "doc_id",
                        min_text_chars: int = MIN_TEXT_CHARS,
                        min_heading_chars: int = MIN_HEADING_CHARS,
                        ) -> pd.DataFrame:
    """One flat span row per kept block / image, in document order.

    Per-document Python parse is the honest cost model here (markup
    parsing has no columnar kernel); everything around it is batch-
    columnar and the stage fuses with its reader."""
    ids, offs, kinds, texts, refs = [], [], [], [], []
    for doc_id, html in zip(batch[id_col].to_numpy(),
                            batch[html_col].to_numpy()):
        parser = MainContentParser(min_text_chars, min_heading_chars)
        parser.feed(str_or_empty(html))
        parser.close()
        for i, (kind, text, ref) in enumerate(parser.spans):
            ids.append(doc_id)
            offs.append(i)
            kinds.append(kind)
            texts.append(text)
            refs.append(ref)
    out = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                        "offset": pd.Series(offs, dtype="int64"),
                        "kind": pd.Series(kinds, dtype="object"),
                        "text": pd.Series(texts, dtype="object"),
                        "media_ref": pd.Series(refs, dtype="object")})
    return typed_if_empty(out)


def extract_main_content(ds, *, html_col: str = "html",
                         min_text_chars: int = MIN_TEXT_CHARS,
                         min_heading_chars: int = MIN_HEADING_CHARS):
    """Dataset of (doc_id, html) -> Dataset of flat interleaved span
    rows.  Single stateless map_batches; no shuffle."""
    return ds.map_batches(
        html_to_spans_batch,
        batch_format="pandas",
        fn_kwargs={"html_col": html_col,
                   "min_text_chars": min_text_chars,
                   "min_heading_chars": min_heading_chars})


def html_to_documents_batch(batch: pd.DataFrame, *, html_col: str = "html",
                            id_col: str = "doc_id"):
    """Nested variant: one row per document with the ``spans``
    list-of-struct column of the canonical interleaved table
    (FIXTURES.md section 1), so HTML corpora can feed the flagship
    extraction pipeline without a restitch groupby — spans of one
    page are born co-located, no shuffle needed to nest them.
    Returns an Arrow block typed exactly as ``DOCUMENTS_SCHEMA``
    (string doc_id, ``html-`` prefixed for provenance)."""
    import pyarrow as pa

    from doc_ocr_ray.schema import DOCUMENTS_SCHEMA

    flat = html_to_spans_batch(batch, html_col=html_col, id_col=id_col)
    if not isinstance(flat, pd.DataFrame):
        # typed_if_empty returned an Arrow table: zero kept spans
        # (empty batch, or every page was pure boilerplate)
        return pa.Table.from_pylist([], schema=DOCUMENTS_SCHEMA)
    rows = []
    for doc_id, g in flat.groupby("doc_id", sort=False):
        rows.append({"doc_id": f"html-{doc_id}", "spans": [
            {"kind": k, "text": t, "media_ref": r, "offset": int(o)}
            for k, t, r, o in zip(g["kind"], g["text"],
                                  g["media_ref"], g["offset"])]})
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def html_corpus_stats_batch(batch: pd.DataFrame, *, html_col: str = "html",
                            id_col: str = "doc_id") -> pd.DataFrame:
    """Compose the HTML front door with the text stack: per page, the
    rebuilt main text (kept text spans joined " " in order — the A1
    merged_text convention), its whitespace token count (same
    tokenizer contract as ``token_count_batch``) and the media-span
    count.  Pages whose markup yields no kept span still emit a row
    (empty text, zero counts) so corpus accounting stays total."""
    from doc_ocr_ray.stages.text_analysis import _tokens

    flat = html_to_spans_batch(batch, html_col=html_col, id_col=id_col)
    if isinstance(flat, pd.DataFrame) and len(flat):
        is_text = flat["kind"] == "text"
        text_per = (flat[is_text].groupby("doc_id", sort=False)["text"]
                    .agg(" ".join))
        media_per = (flat[~is_text].groupby("doc_id", sort=False)
                     .size())
    else:
        text_per = pd.Series(dtype="object")
        media_per = pd.Series(dtype="int64")
    ids = batch[id_col].astype("int64")
    main = ids.map(text_per).fillna("").astype("object")
    out = pd.DataFrame({
        "doc_id": ids.to_numpy(),
        "main_text": main.to_numpy(),
        "n_tokens": _tokens(main).str.len().astype("int64").to_numpy(),
        "n_media": ids.map(media_per).fillna(0).astype("int64")
                      .to_numpy()})
    return typed_if_empty(out)


def html_corpus_stats(ds, *, html_col: str = "html"):
    """Dataset of (doc_id, html) -> (doc_id, main_text, n_tokens,
    n_media).  One stateless map_batches, fuses with the reader."""
    return ds.map_batches(html_corpus_stats_batch,
                          batch_format="pandas",
                          fn_kwargs={"html_col": html_col})


class TableParser(HTMLParser):
    """Structured <table> extraction: one record per cell with
    (table_idx, row, col, is_header, text).  Tables are numbered in
    document order of their OPEN tags; nested tables stack — cells
    attribute to the innermost open table.  Inline markup inside a
    cell contributes its text; dropped subtrees (script/style/...)
    contribute nothing.  colspan/rowspan are ignored (cells keep
    their source-order coordinates — the standard web-table-mining
    simplification)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.cells = []        # (table_idx, row, col, is_header, text)
        self._next_table = 0
        self._stack = []       # per open table: [table_idx, row, col]
        self._susp = []        # suspended enclosing cells, one/table
        self._cell = None      # (is_header, [pieces]) when in a cell
        self._drop = 0
        self._head_mark = None

    def handle_starttag(self, tag, attrs):
        if tag == "body":
            # close ONLY an innermost open head (optional </head>);
            # see MainContentParser for the template/noscript hazard
            if self._head_mark is not None and \
                    self._drop == self._head_mark + 1:
                self._drop = self._head_mark
            self._head_mark = None
            return
        if tag in DROP_SUBTREES:
            if tag == "head" and self._head_mark is None:
                self._head_mark = self._drop
            self._drop += 1
            return
        if self._drop:
            return
        if tag == "table":
            # suspend the enclosing cell (if any) instead of flushing
            # it: '<td>Total: <table>..</table> 42</td>' must emit ONE
            # outer cell 'Total: 42', not a truncated 'Total:'
            self._susp.append(self._cell)
            self._cell = None
            self._stack.append([self._next_table, -1, -1])
            self._next_table += 1
        elif tag == "tr" and self._stack:
            self._flush_cell()
            self._stack[-1][1] += 1
            self._stack[-1][2] = -1
        elif tag in ("td", "th") and self._stack:
            self._flush_cell()
            self._stack[-1][2] += 1
            self._cell = (1 if tag == "th" else 0, [])

    def handle_endtag(self, tag):
        if tag in DROP_SUBTREES:
            self._drop = max(0, self._drop - 1)
            if tag == "head":
                self._head_mark = None
            return
        if self._drop:
            return
        if tag in ("td", "th"):
            self._flush_cell()
        elif tag == "table":
            self._flush_cell()   # an unclosed inner td flushes here
            if self._stack:
                self._stack.pop()
            # resume the enclosing cell: its trailing text (after the
            # nested table) keeps accumulating until its own </td>
            self._cell = self._susp.pop() if self._susp else None

    def handle_data(self, data):
        if self._cell is not None and not self._drop:
            self._cell[1].append(data)

    def _flush_cell(self):
        if self._cell is None or not self._stack:
            self._cell = None
            return
        is_header, pieces = self._cell
        self._cell = None
        t, r, c = self._stack[-1]
        if r < 0 or c < 0:
            return              # td outside any tr: ignore
        text = _WS.sub(" ", "".join(pieces)).strip(" ")
        self.cells.append((t, r, c, is_header, text))

    def close(self):
        super().close()
        self._flush_cell()
        # drain suspended enclosing cells (their nested tables never
        # closed — truncated markup): flush each against ITS table
        while self._susp:
            if self._stack:
                self._stack.pop()
            self._cell = self._susp.pop()
            self._flush_cell()


def html_tables_batch(batch: pd.DataFrame, *, html_col: str = "html",
                      id_col: str = "doc_id") -> pd.DataFrame:
    """One row per table cell: (doc_id, table_idx, row, col,
    is_header, cell)."""
    ids, tbls, rows_, cols_, hdrs, texts = [], [], [], [], [], []
    for doc_id, html in zip(batch[id_col].to_numpy(),
                            batch[html_col].to_numpy()):
        p = TableParser()
        p.feed(str_or_empty(html))
        p.close()
        for t, r, c, h, text in p.cells:
            ids.append(int(doc_id))
            tbls.append(t)
            rows_.append(r)
            cols_.append(c)
            hdrs.append(h)
            texts.append(text)
    out = pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "table_idx": pd.Series(tbls, dtype="int64"),
        "row": pd.Series(rows_, dtype="int64"),
        "col": pd.Series(cols_, dtype="int64"),
        "is_header": pd.Series(hdrs, dtype="int64"),
        "cell": pd.Series(texts, dtype="object")})
    return typed_if_empty(out)


def extract_tables(ds, *, html_col: str = "html"):
    """Dataset of (doc_id, html) -> flat table-cell rows.  Stateless,
    fuses with the reader, no shuffle."""
    return ds.map_batches(html_tables_batch, batch_format="pandas",
                          fn_kwargs={"html_col": html_col})


# link extraction keeps nav/header/footer links — for a crawler's
# frontier and the link graph those ARE the signal; only non-content
# containers that never hold real hrefs are dropped
LINK_DROP_SUBTREES = frozenset(
    "script style noscript template head svg iframe".split())

# an RFC 3986 scheme prefix ("http:", "mailto:", "ftp:") marks an
# absolute reference that passes through resolution untouched
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")

# WHATWG removes ASCII tab/LF/CR ANYWHERE in a URL, not just edges
_HREF_JUNK = re.compile(r"[\t\n\r]")


class LinkParser(HTMLParser):
    """Collects <a href> targets in document order (entity-decoded by
    the parser), skipping dropped subtrees and empty/fragment-only
    hrefs.  ``texts`` is index-aligned with ``hrefs``: the anchor's
    inner text with house whitespace collapse (``[\\t\\n\\f\\r ]+`` →
    one space, edges stripped).  Anchor scope follows HTML5 browser
    behavior for the cases crawled HTML actually contains: a new
    ``<a>`` implicitly closes any open one (nesting is invalid), text
    inside a dropped subtree (``<script>`` inside an anchor) never
    counts, and an anchor left open at document end closes at
    ``close()``."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: List[str] = []
        self.texts: List[str] = []
        self._drop = 0
        self._head_mark = None
        self._open_idx = None   # index into texts of the open anchor
        self._buf: List[str] = []

    def _finish_anchor(self):
        if self._open_idx is not None:
            self.texts[self._open_idx] = _WS.sub(
                " ", "".join(self._buf)).strip()
            self._open_idx = None
        self._buf = []

    def handle_starttag(self, tag, attrs):
        if tag == "body":
            # close ONLY an innermost open head (optional </head>)
            if self._head_mark is not None and \
                    self._drop == self._head_mark + 1:
                self._drop = self._head_mark
            self._head_mark = None
            return
        if tag in LINK_DROP_SUBTREES:
            if tag == "head" and self._head_mark is None:
                self._head_mark = self._drop
            self._drop += 1
            return
        if self._drop:
            return
        if tag == "a":
            self._finish_anchor()
            href = next((v for k, v in attrs if k == "href" and v), "")
            # WHATWG URL hygiene: strip edge whitespace AND remove
            # tab/newline/CR anywhere (attribute values wrapped across
            # source lines are common in crawled HTML)
            href = _HREF_JUNK.sub("", href.strip("\t\n\f\r "))
            if href and not href.startswith("#"):
                self.hrefs.append(href)
                self.texts.append("")
                self._open_idx = len(self.texts) - 1

    def handle_endtag(self, tag):
        if tag in LINK_DROP_SUBTREES:
            self._drop = max(0, self._drop - 1)
            if tag == "head":
                self._head_mark = None
            return
        if tag == "a" and not self._drop:
            self._finish_anchor()

    def handle_data(self, data):
        if not self._drop and self._open_idx is not None:
            self._buf.append(data)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def close(self):
        super().close()
        self._finish_anchor()


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments, verbatim: resolve ``.``
    and ``..`` segments in a merged path; ``..`` at the root is
    consumed (``/../x`` -> ``/x``), trailing ``/.`` / ``/..`` keep
    the directory slash.  Without this, relative links with parent
    traversal mis-resolve and skew host_graph / frontier edges."""
    out: list = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if out:
                out.pop()
        elif buf == "/..":
            buf = "/"
            if out:
                out.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            i = buf.find("/", 1)
            if i == -1:
                out.append(buf)
                buf = ""
            else:
                out.append(buf[:i])
                buf = buf[i:]
    return "".join(out)


def _split_path_suffix(ref: str):
    """Split a path-reference at the first ``?`` or ``#``: RFC 3986
    §5.2.4 applies remove_dot_segments to the PATH component only — a
    query or fragment containing ``/../`` must pass through untouched
    (and must never pop real path segments)."""
    for i, c in enumerate(ref):
        if c in "?#":
            return ref[:i], ref[i:]
    return ref, ""


def resolve_href(base_url: str, href: str) -> str:
    """RFC-lite reference resolution against an absolute base URL
    (scheme://host/path, no query).  Contract (each branch exact so
    the SQL twin can state it): absolute refs pass through untouched;
    protocol-relative ``//host/x``, root-relative ``/x`` and
    directory-relative refs all adopt the BASE's scheme (an https
    page's internal links stay https; http is the fallback when the
    base carries no scheme) and get RFC 3986 §5.2.4
    :func:`remove_dot_segments` applied to the merged PATH (query /
    fragment split off first, reattached verbatim), so ``../``
    traversals resolve instead of leaking into the frontier / host
    graph."""
    if _SCHEME_RE.match(href):      # any scheme: pass through as-is
        return href
    if "://" in base_url:
        scheme, rest = base_url.split("://", 1)
    else:
        scheme, rest = "http", base_url
    if href.startswith("//"):
        h, slash, p = href[2:].partition("/")
        if not slash:
            return scheme + "://" + h
        p, suffix = _split_path_suffix(p)
        return scheme + "://" + h + remove_dot_segments("/" + p) + suffix
    host = rest.split("/", 1)[0]
    if href.startswith("/"):
        p, suffix = _split_path_suffix(href)
        return scheme + "://" + host + remove_dot_segments(p) + suffix
    path = rest[len(host):] or "/"
    base_dir = path[:path.rfind("/") + 1]
    p, suffix = _split_path_suffix(href)
    return (scheme + "://" + host
            + remove_dot_segments(base_dir + p) + suffix)


def html_links_batch(batch: pd.DataFrame, *, html_col: str = "html",
                     url_col: str = "url",
                     id_col: str = "doc_id") -> pd.DataFrame:
    """One row per outlink: (doc_id, rank, href, target) where
    ``rank`` is the link's document-order index, ``href`` the
    attribute after WHATWG whitespace hygiene and ``target`` the
    resolved absolute URL.  Rows whose page has no base URL emit only
    scheme-absolute hrefs.  Feeds the link graph
    (`stages/graph.pagerank` edges) and the crawl frontier."""
    ids, ranks, hrefs, targets = [], [], [], []
    for doc_id, base, html in zip(batch[id_col].to_numpy(),
                                  batch[url_col].to_numpy(),
                                  batch[html_col].to_numpy()):
        base = str_or_empty(base)
        p = LinkParser()
        p.feed(str_or_empty(html))
        p.close()
        for i, href in enumerate(p.hrefs):
            if not base and not _SCHEME_RE.match(href):
                # no base URL: a relative href cannot resolve — drop
                # it rather than fabricate 'http:///...' junk for the
                # frontier / link graph
                continue
            ids.append(int(doc_id))
            ranks.append(i)
            hrefs.append(href)
            targets.append(resolve_href(base, href))
    out = pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "rank": pd.Series(ranks, dtype="int64"),
        "href": pd.Series(hrefs, dtype="object"),
        "target": pd.Series(targets, dtype="object")})
    return typed_if_empty(out)


def extract_links(ds, *, html_col: str = "html", url_col: str = "url"):
    """Dataset of (doc_id, url, html) -> outlink rows.  Stateless,
    fuses with the reader."""
    return ds.map_batches(html_links_batch, batch_format="pandas",
                          fn_kwargs={"html_col": html_col,
                                     "url_col": url_col})


def anchor_links_batch(batch: pd.DataFrame, *, html_col: str = "html",
                       url_col: str = "url",
                       id_col: str = "doc_id") -> pd.DataFrame:
    """One row per outlink WITH its anchor text: (doc_id, rank,
    target, anchor).  Same parse/resolve contract as
    :func:`html_links_batch`; ``anchor`` is the whitespace-collapsed
    inner text (may be empty — image links)."""
    ids, ranks, targets, anchors = [], [], [], []
    for doc_id, base, html in zip(batch[id_col].to_numpy(),
                                  batch[url_col].to_numpy(),
                                  batch[html_col].to_numpy()):
        base = str_or_empty(base)
        p = LinkParser()
        p.feed(str_or_empty(html))
        p.close()
        for i, (href, text) in enumerate(zip(p.hrefs, p.texts)):
            if not base and not _SCHEME_RE.match(href):
                continue
            ids.append(int(doc_id))
            ranks.append(i)
            targets.append(resolve_href(base, href))
            anchors.append(text)
    return typed_if_empty(pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "rank": pd.Series(ranks, dtype="int64"),
        "target": pd.Series(targets, dtype="object"),
        "anchor": pd.Series(anchors, dtype="object")}))


def anchor_corpus(ds, *, k: int = 3, num_parts: int = 256,
                  html_col: str = "html", url_col: str = "url"):
    """Anchor-text corpus — the classic web-graph training signal
    (anchor text describing the TARGET page, used for retrieval /
    query-doc relevance data): for every link target, the top-``k``
    anchor strings by number of DISTINCT linking pages (ties broken
    ascending on the anchor string).

    Shape: stateless parse/explode to (doc_id, target, anchor) with
    an IN-BATCH ``drop_duplicates`` combiner (a page repeating one
    anchor ships it once per batch — combiner, not the dedup: the
    cross-batch distinct happens inside the group fn, the
    repartition-tested rule), then ONE coarse target-keyed exchange
    (``hash(target) % num_parts``) where each group dedups
    (doc_id, target, anchor) exactly, counts distinct pages per
    (target, anchor), and ranks per target locally — the partition
    key IS the ranking key, so top-k needs no second shuffle.  Empty
    anchors are dropped after the parse (they carry no signal).
    Output: (target, anchor, n_docs, rank), rank 0-based.
    """
    from doc_ocr_ray.util import coarse_part, typed_if_empty as _typed

    _empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "target": pd.Series([], dtype="object"),
        "anchor": pd.Series([], dtype="object"),
        "part": pd.Series([], dtype="int64")})

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        links = anchor_links_batch(batch, html_col=html_col,
                                   url_col=url_col)
        links = links.loc[links["anchor"] != "",
                          ["doc_id", "target", "anchor"]]
        links = links.drop_duplicates()      # in-batch combiner only
        if not len(links):
            return _typed(_empty)
        out = links.reset_index(drop=True)
        out["part"] = coarse_part(out["target"], num_parts)
        return out

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["doc_id", "target", "anchor"])
        cnt = (g.groupby(["target", "anchor"], sort=False)
               .size().rename("n_docs").reset_index())
        cnt = cnt.sort_values(["target", "n_docs", "anchor"],
                              ascending=[True, False, True],
                              kind="mergesort")
        cnt["rank"] = cnt.groupby("target", sort=False).cumcount()
        cnt = cnt.loc[cnt["rank"] < k]
        return _typed(pd.DataFrame({
            "target": cnt["target"].astype(object),
            "anchor": cnt["anchor"].astype(object),
            "n_docs": cnt["n_docs"].astype("int64"),
            "rank": cnt["rank"].astype("int64")}))

    return (ds.map_batches(explode, batch_format="pandas")
            .groupby("part").map_groups(per_part, batch_format="pandas"))
