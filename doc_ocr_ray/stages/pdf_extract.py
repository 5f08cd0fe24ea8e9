"""PDF text extraction: real content-stream parsing, no codec libs.

The third leg of the north rule's ingestion triad ("HTML boilerplate
strip, PDF/layout parse, DOM heuristics"): HTML pages enter through
``stages/html_extract``, layout JSON through ``sources/layout_json``;
this module ingests PDF documents.  Like the repo's PNG decoder, the
parse is REAL and built only on stdlib: the PDF object graph is
length-delimited text (objects, dictionaries, the /Pages tree), and
content streams are either plain bytes or /FlateDecode — stdlib zlib.
Scope (documented, raised-on loudly): PDF 1.x with uncompressed xref,
Type1/standard-font text operators, literal ``(...)`` and hex
``<...>`` strings.  Non-Flate stream filters (DCTDecode et al.)
dispatch to a caller-injected codec mapping (``filters=``, the
decode_image seam) and raise without one.  No object streams
(/ObjStm), no encryption, no CID/UTF-16 fonts — those need a real PDF
library and raise ``ValueError`` with a clear message instead of
silently extracting garbage.

Text model: inside each page's content stream, ``BT..ET`` blocks emit
text with ``Tj`` (show string) and ``TJ`` (show array with kerning —
numbers adjust spacing and are ignored, strings concatenate, the
universal extractor simplification); every ``Td``/``TD``/``T*``
line-move starts a NEW line.  Escapes in literal strings follow the
spec: ``\\(`` ``\\)`` ``\\\\`` ``\\n`` ``\\r`` ``\\t`` and octal
``\\ddd``; a backslash-newline continuation joins lines.

Output: one row per text line, ``(doc_id, page, offset, text)`` with
``page`` 0-based in /Kids order and ``offset`` the line index within
the page — the same order-index convention the span domain uses, so
PDF corpora feed the text stack (token counts, dedup, quality) the
way HTML pages do.

Scale shape: ONE stateless ``map_batches`` over fat binary rows
(small batches), per-document parse cost only, nothing shuffles.
"""
from __future__ import annotations

import re
import zlib
from typing import Dict, List

import numpy as np
import pandas as pd

from doc_ocr_ray.util import typed_if_empty

# ---------------------------------------------------------------- writer

_ESC = {ord("("): b"\\(", ord(")"): b"\\)", ord("\\"): b"\\\\"}


def _pdf_string(s: str) -> bytes:
    out = bytearray(b"(")
    for b in s.encode("latin-1"):
        out += _ESC.get(b, bytes([b]))
    out += b")"
    return bytes(out)


def encode_pdf(pages: List[List[str]], compress: bool = False,
               chain: bool = False) -> bytes:
    """Minimal single-font PDF with one content stream per page.
    ``pages`` is a list of pages, each a list of text lines.  With
    ``compress`` the content streams are /FlateDecode (stdlib zlib) —
    the dominant real-world encoding, so the reader's inflate path is
    exercised by the same writer round trip.  With ``chain`` the
    streams are hex-wrapped deflate with the two-member filter ARRAY
    ``[/ASCIIHexDecode /FlateDecode]`` (decode applies members in
    listed order: un-hex, then inflate), line-broken every 64 hex
    digits so the reader's whitespace skipping is exercised too."""
    objs: Dict[int, bytes] = {}
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
               .encode())
    font_num = 3 + 2 * n_pages
    for i, lines in enumerate(pages):
        page_num, stream_num = 3 + 2 * i, 4 + 2 * i
        ops = bytearray(b"BT /F1 12 Tf 72 720 Td\n")
        for j, line in enumerate(lines):
            if j:
                ops += b"0 -14 Td\n"
            if j % 2:
                # exercise the TJ-array path: split the line in two
                # with a kerning number between the halves
                half = len(line) // 2
                ops += (b"[" + _pdf_string(line[:half]) + b" -120 "
                        + _pdf_string(line[half:]) + b"] TJ\n")
            else:
                ops += _pdf_string(line) + b" Tj\n"
        ops += b"ET"
        if chain:
            import binascii
            hx = binascii.hexlify(zlib.compress(bytes(ops)))
            data = b"\n".join(hx[i:i + 64]
                              for i in range(0, len(hx), 64)) + b">"
            filt = b" /Filter [/ASCIIHexDecode /FlateDecode]"
        elif compress:
            data = zlib.compress(bytes(ops))
            filt = b" /Filter /FlateDecode"
        else:
            data = bytes(ops)
            filt = b""
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {stream_num} 0 R "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            .encode())
        objs[stream_num] = (b"<< /Length " + str(len(data)).encode()
                            + filt + b" >>\nstream\n" + data
                            + b"\nendstream")
    objs[font_num] = (b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Helvetica >>")

    buf = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for num in sorted(objs):
        buf += f"{offsets[num]:010d} 00000 n \n".encode()
    buf += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF").encode()
    return bytes(buf)


# ---------------------------------------------------------------- reader

_OBJ_HDR_RE = re.compile(rb"(\d+)\s+0\s+obj\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(\s+0\s+R)?")
_STREAM_KW_RE = re.compile(rb"stream\r?\n")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)*)\s*\]")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+0\s+R")
_PAGES_RE = re.compile(rb"/Pages\s+(\d+)\s+0\s+R")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")

# tokens that may sit between a string and its showing operator
# without invalidating it: numbers (TJ kerning) and array brackets
_NEUTRAL_TOKEN = re.compile(rb"^(\[|\]|[-+]?[0-9.]+)$")

_STR_ESCAPES = {ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
                ord("b"): "\b", ord("f"): "\f", ord("("): "(",
                ord(")"): ")", ord("\\"): "\\"}


def _parse_objects(payload: bytes):
    """Sequential, /Length-bounded object scan.  Stream payloads are
    jumped over using the dict's /Length, never pattern-matched — a
    compressed stream (or prose) containing the bytes ``endobj`` must
    not truncate the object graph.  Returns num -> (head, stream):
    the dictionary bytes and the raw stream bytes (or None)."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    objs: Dict[int, tuple] = {}
    pos = 0
    while True:
        hdr = _OBJ_HDR_RE.search(payload, pos)
        if hdr is None:
            break
        num = int(hdr.group(1))
        body_at = hdr.end()
        j_stream = _STREAM_KW_RE.search(payload, body_at)
        j_end = payload.find(b"endobj", body_at)
        if j_end == -1:
            raise ValueError("malformed PDF: unterminated object")
        if j_stream is not None and j_stream.start() < j_end:
            head = payload[body_at:j_stream.start()]
            lm = _LENGTH_RE.search(head)
            if lm is None:
                raise ValueError("stream object without direct /Length")
            if lm.group(2):
                raise ValueError("indirect /Length is out of scope")
            data_at = j_stream.end()
            data_end = data_at + int(lm.group(1))
            # primary: trust /Length.  Stale lengths are common in
            # the wild — verify 'endstream' actually follows, else
            # fall back to the standard keyword-scan recovery.
            if (payload[data_end:data_end + 16].lstrip(b"\r\n \t")
                    .startswith(b"endstream")):
                data = payload[data_at:data_end]
            else:
                k = payload.find(b"endstream", data_at)
                if k == -1:
                    raise ValueError("malformed PDF: stream without "
                                     "endstream")
                data = payload[data_at:k]
                if data.endswith(b"\r\n"):
                    data = data[:-2]
                elif data.endswith(b"\n") or data.endswith(b"\r"):
                    data = data[:-1]
                data_end = k
            j_end = payload.find(b"endobj", data_end)
            if j_end == -1:
                raise ValueError("malformed PDF: unterminated stream "
                                 "object")
            objs[num] = (head, data)
        else:
            objs[num] = (payload[body_at:j_end], None)
        pos = j_end + len(b"endobj")
    if not objs:
        raise ValueError("malformed PDF: no indirect objects found")
    return objs


_FILTER_NAME_RE = re.compile(rb"/Filter\s*/(\w+)")
_FILTER_ARRAY_RE = re.compile(rb"/Filter\s*\[([^\]]*)\]")
_FILTER_ARRAY_OPEN_RE = re.compile(rb"/Filter\s*\[")
_NAME_TOKEN_RE = re.compile(rb"/(\w+)")

_PDF_WS = b"\x00\t\n\x0c\r "
_HEX_DIGITS = b"0123456789abcdefABCDEF"


def _ascii_hex_decode(data: bytes) -> bytes:
    """Native /ASCIIHexDecode (PDF 32000-1 7.4.2): PDF whitespace is
    skipped, ``>`` is EOD (bytes after it ignored), an odd trailing
    digit is padded with 0, any other character raises."""
    end = data.find(b">")
    if end != -1:
        data = data[:end]
    hx = bytes(c for c in data if c not in _PDF_WS)
    bad = [c for c in hx if c not in _HEX_DIGITS]
    if bad:
        raise ValueError("ASCIIHexDecode: non-hex byte 0x%02x" % bad[0])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _apply_filter(name: bytes, data: bytes, filters) -> bytes:
    if name == b"FlateDecode":
        return zlib.decompress(data)
    if name == b"ASCIIHexDecode":
        return _ascii_hex_decode(data)
    if filters and name in filters:
        return filters[name](data)
    raise ValueError(
        "unsupported stream /Filter %r (FlateDecode/ASCIIHexDecode "
        "are native; pass filters={name: fn} to inject another "
        "codec)" % name)


def _stream_bytes(obj: tuple, filters=None) -> bytes:
    """Decode one stream object's bytes.  /FlateDecode and
    /ASCIIHexDecode are native (stdlib zlib / hex); filter ARRAYS
    apply their members in listed order (``[/ASCIIHexDecode
    /FlateDecode]`` un-hexes then inflates — PDF 32000-1 7.4); any
    other named filter (DCTDecode, LZWDecode, ...) dispatches to the
    caller-INJECTED ``filters`` mapping ``{b"DCTDecode": bytes ->
    bytes, ...}`` — the codec-injection seam (stages/multimodal.py
    decode_image pattern), so scanned-PDF corpora plug a real JPEG
    codec without touching the parser; unknown members raise."""
    head, data = obj
    if data is None:
        raise ValueError("content object has no stream")
    if b"/Filter" in head:
        # array check FIRST: '/Filter [/ASCIIHexDecode /FlateDecode]'
        # must never match the FlateDecode substring alone and
        # silently inflate a still-hex-encoded stream
        m_arr = _FILTER_ARRAY_RE.search(head)
        if m_arr is not None:
            for nm in _NAME_TOKEN_RE.finditer(m_arr.group(1)):
                data = _apply_filter(nm.group(1), data, filters)
        elif _FILTER_ARRAY_OPEN_RE.search(head):
            raise ValueError("unterminated /Filter array")
        else:
            m = _FILTER_NAME_RE.search(head)
            if m is None:
                raise ValueError("/Filter without a filter name")
            data = _apply_filter(m.group(1), data, filters)
    return data


def _literal_strings_and_ops(stream: bytes):
    """One linear scan: yields ('str', decoded) for each literal
    string and ('op', name) for the operators between them.  Hex
    strings ``<..>`` are rejected loudly (out of scope)."""
    i, n = 0, len(stream)
    token = bytearray()

    def flush_tokens():
        for t in bytes(token).split():
            yield ("op", t)
        token.clear()

    while i < n:
        c = stream[i]
        if c == ord("("):
            yield from flush_tokens()
            depth, i = 1, i + 1
            out = []
            while i < n and depth:
                c = stream[i]
                if c == ord("\\"):
                    i += 1
                    if i >= n:
                        break
                    e = stream[i]
                    if ord("0") <= e <= ord("7"):     # octal \ddd
                        oct_digits = chr(e)
                        for _ in range(2):
                            if (i + 1 < n and ord("0") <= stream[i + 1]
                                    <= ord("7")):
                                i += 1
                                oct_digits += chr(stream[i])
                        out.append(chr(int(oct_digits, 8)))
                    elif e == ord("\n"):
                        pass                          # continuation
                    else:
                        out.append(_STR_ESCAPES.get(e, chr(e)))
                    i += 1
                    continue
                if c == ord("("):
                    depth += 1
                elif c == ord(")"):
                    depth -= 1
                    if not depth:
                        i += 1
                        break
                out.append(chr(c))
                i += 1
            yield ("str", "".join(out))
            continue
        if c == ord("<"):
            if stream[i:i + 2] == b"<<":
                # skip BOTH chars of a dict opener, or the second '<'
                # would be misread as a hex-string opener
                token += b"<<"
                i += 2
                continue
            # hex string <48656C6C6F>: hex pairs, PDF whitespace
            # ignored, an odd trailing digit pads with '0' (spec
            # 7.3.4.3); anything else is malformed and raises
            yield from flush_tokens()
            j = stream.find(b">", i + 1)
            if j == -1:
                raise ValueError("malformed PDF: unterminated hex "
                                 "string")
            digits = bytes(stream[i + 1:j].translate(
                None, b"\x00\t\n\f\r "))
            if not all(chr(d) in "0123456789abcdefABCDEF"
                       for d in digits):
                raise ValueError("malformed PDF: non-hex byte in hex "
                                 "string")
            if len(digits) % 2:
                digits += b"0"
            yield ("str", bytes.fromhex(digits.decode("ascii"))
                   .decode("latin-1"))
            i = j + 1
            continue
        token.append(c)
        i += 1
    yield from flush_tokens()


def decode_pdf_text(payload: bytes, filters=None) -> List[List[str]]:
    """PDF bytes -> per-page lists of text lines (see module doc).
    ``filters`` injects codecs for non-Flate stream filters (see
    :func:`_stream_bytes`)."""
    objs = _parse_objects(payload)
    root_m = _ROOT_RE.search(payload)
    if root_m is None:
        raise ValueError("malformed PDF: no /Root in trailer")
    pages_m = _PAGES_RE.search(objs[int(root_m.group(1))][0])
    if pages_m is None:
        raise ValueError("catalog has no /Pages")
    kids_m = _KIDS_RE.search(objs[int(pages_m.group(1))][0])
    if kids_m is None:
        raise ValueError("pages tree has no /Kids (nested trees are "
                         "out of scope)")
    pages: List[List[str]] = []
    for ref in _REF_RE.finditer(kids_m.group(1)):
        page_obj = objs[int(ref.group(1))][0]
        cont_m = _CONTENTS_RE.search(page_obj)
        if cont_m is None:
            pages.append([])
            continue
        stream = _stream_bytes(objs[int(cont_m.group(1))], filters)
        lines: List[str] = []
        cur: List[str] = []
        pending: List[str] = []
        in_text = False
        for kind, val in _literal_strings_and_ops(stream):
            if kind == "str":
                pending.append(val)
                continue
            if val == b"BT":
                in_text = True
            elif val == b"ET":
                in_text = False
                if cur:                 # a text block ends its line
                    lines.append("".join(cur))
                    cur = []
            elif val in (b"Tj", b"TJ"):
                if in_text:
                    cur.extend(pending)
                pending.clear()
            elif val in (b"'", b'"'):
                # spec: move to the NEXT line, THEN show — the break
                # goes before the string, not after it
                if in_text:
                    if cur:
                        lines.append("".join(cur))
                    cur = list(pending)
                pending.clear()
            elif val in (b"Td", b"TD", b"T*"):
                if cur:
                    lines.append("".join(cur))
                    cur = []
                pending.clear()
            elif _NEUTRAL_TOKEN.match(val):
                pass        # numbers / array brackets: TJ operands
            else:
                pending.clear()       # a real operator we don't show
        if cur:
            lines.append("".join(cur))
        pages.append(lines)
    return pages


# ----------------------------------------------------------------- stage

def pdf_to_lines_batch(batch, *, id_col: str = "doc_id",
                       payload_col: str = "payload",
                       filters=None) -> pd.DataFrame:
    """One row per extracted text line: (doc_id, page, offset, text).
    Same honest per-document parse cost model as the HTML stage."""
    if not isinstance(batch, pd.DataFrame):
        batch = batch.to_pandas()
    ids, pgs, offs, texts = [], [], [], []
    for doc_id, payload in zip(batch[id_col].to_numpy(),
                               batch[payload_col]):
        for p, lines in enumerate(decode_pdf_text(bytes(payload),
                                                    filters)):
            for j, line in enumerate(lines):
                ids.append(int(doc_id))
                pgs.append(p)
                offs.append(j)
                texts.append(line)
    out = pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "page": pd.Series(pgs, dtype="int64"),
        "offset": pd.Series(offs, dtype="int64"),
        "text": pd.Series(texts, dtype="object")})
    return typed_if_empty(out)


def extract_pdf_lines(ds, batch_size: int = 32, filters=None):
    """Dataset of (doc_id, payload) -> flat text-line rows.  Small
    batches (fat binary rows), stateless, fuses with the reader.
    ``filters`` injects non-Flate stream codecs (DCTDecode et al.)."""
    return ds.map_batches(pdf_to_lines_batch, batch_format="pandas",
                          batch_size=batch_size,
                          fn_kwargs={"filters": filters})


def synthesize_pdf_table(doc_ids):
    """Deterministic PDF testbed whose expected lines have a closed
    form (the SQL oracle assembles them from the same arithmetic):
    doc d has ``1 + d%2`` pages; page p has ``2 + (d+p)%2`` lines,
    line j = 'Doc {d} page {p} line {j} content.'; docs with d%3==0
    append an escape-torture line (parens + backslash); odd-index
    lines are written as split TJ arrays (kern-joined), the rest as
    plain Tj; odd docs compress their streams with FlateDecode; docs
    with d%5==0 use the chained filter array [/ASCIIHexDecode
    /FlateDecode] so the multi-member decode path is oracle-checked
    (same expected lines, different wire format)."""
    import pyarrow as pa

    refs, ids, payloads = [], [], []
    for d in doc_ids:
        d = int(d)
        pages = []
        for p in range(1 + d % 2):
            lines = [f"Doc {d} page {p} line {j} content."
                     for j in range(2 + (d + p) % 2)]
            if d % 3 == 0 and p == 0:
                lines.append(f"Escape (paren) and \\ slash in doc {d}.")
            pages.append(lines)
        refs.append(f"pdf:{d}")
        ids.append(d)
        payloads.append(encode_pdf(pages, compress=bool(d % 2),
                                   chain=(d % 5 == 0)))
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(["pdf"] * len(ids), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(x) for x in payloads], pa.int64()),
    })
