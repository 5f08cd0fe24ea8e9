"""WARC (ISO 28500) crawl-archive ingestion — the web-scale arrival
format (Common Crawl ships as WARC).  Pure stdlib parse with the same
length-bounded discipline as the PDF reader: record payloads are
jumped over using Content-Length, NEVER pattern-matched, so a body
containing the bytes ``WARC/1.0`` cannot desynchronize the scan.

Record model: a WARC file is a sequence of records, each a version
line (``WARC/1.0`` or ``WARC/1.1``), CRLF-separated headers, a blank
line, ``Content-Length`` payload bytes, and a trailing blank pair.
``warc_pages_batch`` keeps **response** records whose HTTP status
passes the filter (default: 200 only — the standard extraction
behavior), splits the HTTP envelope from the body at the first
``\\r\\n\\r\\n``, and emits one row per kept page: (doc_id, rec_idx,
url, status, html) — ready to feed ``stages/html_extract`` (the
composed WARC -> main-content path is the `warc_html_spans` driver
query).  warcinfo/request/metadata records are parsed and skipped.

Scale shape: one Dataset row = one WARC file (or chunk); the batch fn
fans each file out to its page rows — a stateless flat map, small
batches for fat payloads, nothing shuffles.  Gzip members (the
``.warc.gz`` per-record framing real Common Crawl dumps use) are
split with a stdlib-only ``zlib.decompressobj`` walk: each member is
inflated until ``eof`` and the next member starts at ``unused_data``
— the deflate framing itself delimits members, so decoy ``\\x1f\\x8b``
bytes inside a compressed body cannot desynchronize the scan (the
same never-pattern-match discipline as the plain reader's
Content-Length jumps).
"""
from __future__ import annotations

import re
import zlib
from typing import Dict, List, Tuple

import pandas as pd

from doc_ocr_ray.util import typed_if_empty

_CRLF = b"\r\n"
_VERSION_RE = re.compile(rb"^WARC/\d+\.\d+$")
# dotless versions too: crawlers record 'HTTP/2 200' status lines
_STATUS_RE = re.compile(rb"^HTTP/\d(?:\.\d)?\s+(\d{3})")


def encode_warc(records: List[Tuple[Dict[str, str], bytes]]) -> bytes:
    """records = [(warc_headers, payload_bytes)] -> WARC file bytes.
    ``Content-Length`` is computed; callers set ``WARC-Type`` etc."""
    out = bytearray()
    for headers, payload in records:
        out += b"WARC/1.0" + _CRLF
        for k, v in headers.items():
            out += f"{k}: {v}".encode() + _CRLF
        out += f"Content-Length: {len(payload)}".encode() + _CRLF
        out += _CRLF + payload + _CRLF + _CRLF
    return bytes(out)


def encode_warc_gz(records: List[Tuple[Dict[str, str], bytes]]) -> bytes:
    """records -> ``.warc.gz`` bytes: one gzip member per record
    (the Common Crawl framing), deterministic (mtime=0, no name)."""
    import gzip
    out = bytearray()
    for rec in records:
        out += gzip.compress(encode_warc([rec]), mtime=0)
    return bytes(out)


def http_response(body: bytes, status: int = 200,
                  ctype: str = "text/html") -> bytes:
    """Minimal HTTP envelope for a response record payload."""
    return (f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n\r\n"
            .encode() + body)


def split_gzip_members(data: bytes):
    """Yield the decompressed bytes of each gzip member in a
    multi-member stream (the ``.warc.gz`` framing: one member per
    record).  ``zlib.decompressobj(wbits=31)`` inflates exactly one
    member; ``unused_data`` is where the next one starts.  Truncated
    members and non-gzip trailing bytes raise ValueError — a cut-off
    download must fail loudly, never flow a partial record."""
    # feed bounded chunks from a tracked offset: `buf = d.unused_data`
    # after a whole-tail decompress would copy the entire remaining
    # file once per member — O(members^2) memcpy on a real CC chunk
    # with tens of thousands of members.  The chunk size ADAPTS to
    # ~2x the previous member's compressed size (doubling within a
    # member), so the per-member unused_data copy is proportional to
    # the member itself, not to a fixed large buffer: total work stays
    # O(file size) for any member-size distribution
    mv = memoryview(data)
    pos, n = 0, len(data)
    est = 64 * 1024
    while pos < n:
        if data[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError("malformed .warc.gz: non-gzip bytes "
                             "between members")
        d = zlib.decompressobj(wbits=31)
        parts = []
        start = pos
        chunk_size = est
        while pos < n and not d.eof:
            chunk = mv[pos:pos + chunk_size]
            try:
                parts.append(d.decompress(chunk))
            except zlib.error as e:
                raise ValueError(
                    f"malformed .warc.gz member: {e}") from None
            pos += len(chunk)
            chunk_size = min(chunk_size * 2, 8 << 20)
        if not d.eof:
            raise ValueError("malformed .warc.gz: truncated gzip "
                             "member (interrupted download)")
        # unused_data is a suffix of the LAST chunk fed: rewind to
        # where the next member starts
        pos -= len(d.unused_data)
        est = max(4096, 2 * (pos - start))
        yield b"".join(parts)


def iter_warc_records(payload: bytes):
    """Yield (headers: dict[str,str], payload: bytes) per record.
    Content-Length-bounded; malformed framing raises ValueError.
    Accepts plain ``.warc`` bytes or per-record-gzip ``.warc.gz``
    (detected by the gzip magic)."""
    if payload[:2] == b"\x1f\x8b":
        for member in split_gzip_members(payload):
            yield from _iter_plain_records(member)
        return
    yield from _iter_plain_records(payload)


def _iter_plain_records(payload: bytes):
    i, n = 0, len(payload)
    while i < n:
        # skip inter-record blank lines
        while payload[i:i + 2] == _CRLF:
            i += 2
        if i >= n:
            break
        hdr_end = payload.find(_CRLF + _CRLF, i)
        if hdr_end == -1:
            raise ValueError("malformed WARC: unterminated header block")
        lines = payload[i:hdr_end].split(_CRLF)
        if not _VERSION_RE.match(lines[0]):
            raise ValueError("malformed WARC: missing version line")
        headers: Dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("malformed WARC: record without a "
                             "numeric Content-Length") from None
        body_at = hdr_end + 4
        if body_at + length > n:
            # a truncated archive (interrupted download) must raise
            # like every other framing error, not flow a partial body
            # downstream as if it were a complete page
            raise ValueError("malformed WARC: Content-Length extends "
                             "past end of file (truncated archive)")
        yield headers, payload[body_at:body_at + length]
        i = body_at + length


def split_http(payload: bytes) -> Tuple[int, bytes]:
    """HTTP response payload -> (status, body).  A payload without an
    HTTP status line is status -1 with the whole payload as body."""
    m = _STATUS_RE.match(payload)
    if m is None:
        return -1, payload
    sep = payload.find(b"\r\n\r\n")
    body = payload[sep + 4:] if sep != -1 else b""
    return int(m.group(1)), body


def warc_pages_batch(batch, *, id_col: str = "doc_id",
                     payload_col: str = "payload",
                     keep_statuses=(200,)) -> pd.DataFrame:
    """One row per kept response record: (doc_id, rec_idx, url,
    status, html).  ``rec_idx`` counts response records per file (in
    file order, BEFORE status filtering, so it is stable when the
    filter changes)."""
    if not isinstance(batch, pd.DataFrame):
        batch = batch.to_pandas()
    ids, recs, urls, stats, bodies = [], [], [], [], []
    for doc_id, payload in zip(batch[id_col].to_numpy(),
                               batch[payload_col]):
        rec_idx = 0
        for headers, rec_payload in iter_warc_records(bytes(payload)):
            if headers.get("warc-type") != "response":
                continue
            status, body = split_http(rec_payload)
            if status in keep_statuses:
                ids.append(int(doc_id))
                recs.append(rec_idx)
                urls.append(headers.get("warc-target-uri", ""))
                stats.append(status)
                bodies.append(body.decode("utf-8", errors="replace"))
            rec_idx += 1
    out = pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "rec_idx": pd.Series(recs, dtype="int64"),
        "url": pd.Series(urls, dtype="object"),
        "status": pd.Series(stats, dtype="int64"),
        "html": pd.Series(bodies, dtype="object")})
    return typed_if_empty(out)


def read_warc_pages(ds, batch_size: int = 8, keep_statuses=(200,)):
    """Dataset of (doc_id, payload=WARC file bytes) -> page rows.
    Small batches: one row can be a whole archive file."""
    return ds.map_batches(
        warc_pages_batch, batch_format="pandas", batch_size=batch_size,
        fn_kwargs={"keep_statuses": tuple(keep_statuses)})


def synthesize_warc_table(doc_ids, gzipped: bool = False):
    """Deterministic WARC testbed: file d holds one warcinfo record,
    one request record (both skipped), and 2 + d%2 response records.
    Response k targets ``http://site{d}.test/page{k}``; docs with
    d%5==0 serve page 0 as a 404 (filtered out, but it still consumes
    rec_idx 0).  Bodies are small HTML pages whose kept main-content
    span has a closed form — including decoy ``WARC/1.0`` bytes in
    every body to prove the scan is length-bounded.  ``gzipped=True``
    emits the same logical content as per-record-gzip ``.warc.gz``
    members (so plain and gz readers must agree row-for-row)."""
    import pyarrow as pa

    refs, ids, payloads = [], [], []
    for d in doc_ids:
        d = int(d)
        records = [
            ({"WARC-Type": "warcinfo"}, b"software: synth\r\n"),
            ({"WARC-Type": "request",
              "WARC-Target-URI": f"http://site{d}.test/page0"},
             b"GET /page0 HTTP/1.1\r\n"),
        ]
        for k in range(2 + d % 2):
            status = 404 if (d % 5 == 0 and k == 0) else 200
            body = (f"<html><body><nav><a href='/'>x</a></nav>"
                    f"<p>WARC/1.0 decoy bytes stay inside body "
                    f"{d} page {k} of this record.</p>"
                    f"<footer>f</footer></body></html>").encode()
            records.append((
                {"WARC-Type": "response",
                 "WARC-Target-URI": f"http://site{d}.test/page{k}"},
                http_response(body, status=status)))
        refs.append(f"warc:{d}")
        ids.append(d)
        payloads.append(encode_warc_gz(records) if gzipped
                        else encode_warc(records))
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
    })
