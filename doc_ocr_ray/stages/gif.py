"""Built-in GIF codec — stdlib + numpy only, no image libraries.

The last common web image format without a native path in the engine
(reference scope: the reference's image reader, extractor.py:76-88,
delegates to a codec library; this engine decodes in-process so the
multimodal map stages stay dependency-free).  Supported envelope:

- GIF87a and GIF89a, global and local color tables, multiple frames
- real LZW (variable code width 3..12, CLEAR/EOI, 4096-entry cap,
  KwKwK case), sub-block reassembly
- 4-pass row interlacing
- graphic-control extensions: transparency and disposal methods
  0/1 (keep), 2 (restore to background), 3 (restore to previous)
- other extensions (comment/application/plain-text) are skipped by
  their sub-block structure — length-delimited jumps, never
  pattern-matched (the house parser discipline)

Out of scope (loud raise): nothing structural — malformed streams
raise ValueError with a position, oversized frames are rejected by the
same 2^28-pixel input cap as decode_y4m/decode_jpeg/decode_png.

The encoder exists for synthesis/testing (closed-form oracle tables
and round-trip property tests): real greedy LZW compression tracking
the decoder's table size so code-width bumps stay in lockstep.
"""
from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 1 << 28          # input cap shared with y4m/jpeg/png
_MAX_FRAMES = 4096


# ------------------------------------------------------------------ LZW

def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """GIF-variant LZW: LSB-first variable-width codes; table width
    bumps when the table size reaches 2^width (max 12); stops at EOI
    or once ``expected`` symbols are produced."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("bad LZW minimum code size %d" % min_code_size)
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    code_size = min_code_size + 1
    table: list = []
    prev: bytes | None = None

    def reset():
        nonlocal code_size, table, prev
        code_size = min_code_size + 1
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        prev = None

    reset()
    while len(out) < expected:
        if bitpos + code_size > nbits:
            raise ValueError("LZW stream truncated")
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]          # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < expected:
        raise ValueError("LZW output underrun (%d < %d)"
                         % (len(out), expected))
    return bytes(out[:expected])


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Greedy LZW matching :func:`_lzw_decode`'s width schedule: the
    encoder tracks the DECODER's table size (one behind its own) so
    both sides bump the code width on the same bit."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    cur = 0
    nbits = 0
    code_size = min_code_size + 1
    table: dict = {}
    next_code = 0
    dec_size = 0
    first_after_clear = True

    def emit(code):
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(cur & 255)
            cur >>= 8
            nbits -= 8

    def sync_after_emit():
        # mirror the decoder: it adds one table entry per code AFTER
        # the first post-clear code, then bumps width at 2^size
        nonlocal dec_size, code_size, first_after_clear
        if first_after_clear:
            first_after_clear = False
            return
        dec_size += 1
        if dec_size == (1 << code_size) and code_size < 12:
            code_size += 1

    def reset():
        nonlocal table, next_code, dec_size, code_size, \
            first_after_clear
        emit(clear)
        code_size = min_code_size + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = eoi + 1
        dec_size = clear + 2
        first_after_clear = True

    reset()
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        sync_after_emit()
        table[wc] = next_code
        next_code += 1
        if next_code >= 4095:        # re-clear just before the cap
            reset()
        w = bytes([b])
    if w:
        emit(table[w])
        sync_after_emit()
    emit(eoi)
    if nbits:
        out.append(cur & 255)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Pack bytes into <=255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(payload: bytes, pos: int) -> tuple:
    """Concatenate sub-blocks starting at ``pos``; returns
    (data, position after the 0 terminator).  Length-delimited jumps
    only — block contents are never scanned."""
    parts = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF sub-blocks truncated at %d" % pos)
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        if pos + ln > n:
            raise ValueError("GIF sub-block overruns payload")
        parts.append(payload[pos:pos + ln])
        pos += ln


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """GIF 4-pass row interleave -> sequential rows."""
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        rows = range(start, h, step)
        for r in rows:
            out[r] = idx[src]
            src += 1
    return out


def _interlace(idx: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_deinterlace` (encoder side)."""
    h = idx.shape[0]
    rows = [r for start, step in _INTERLACE_PASSES
            for r in range(start, h, step)]
    return idx[np.array(rows, dtype=np.int64)]


# --------------------------------------------------------------- decode

def decode_gif(payload: bytes) -> np.ndarray:
    """GIF -> (n_frames, h, w, 3) uint8 composited canvases (each
    frame is the canvas AFTER drawing it, BEFORE its disposal runs —
    what a viewer displays)."""
    n = len(payload)
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    if n < 13:
        raise ValueError("GIF header truncated")
    w, h, packed, bg_index, _aspect = struct.unpack(
        "<HHBBB", payload[6:13])
    if not w or not h:
        raise ValueError("GIF with zero logical screen dimension")
    if w * h > _MAX_PIXELS:
        raise ValueError("GIF frame size implausible")
    pos = 13
    gct = None
    if packed & 0x80:
        gct_len = 2 << (packed & 0x07)
        if pos + 3 * gct_len > n:
            raise ValueError("GIF global color table truncated")
        gct = np.frombuffer(payload, np.uint8, 3 * gct_len,
                            pos).reshape(gct_len, 3)
        pos += 3 * gct_len

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    frames = []
    # pending graphic-control state for the NEXT image
    transparent = -1
    disposal = 0
    while True:
        if pos >= n:
            raise ValueError("GIF truncated before trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:                       # trailer
            break
        if block == 0x21:                       # extension
            if pos >= n:
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            data, pos = _read_sub_blocks(payload, pos)
            if label == 0xF9:                   # graphic control
                if len(data) < 4:
                    raise ValueError("GIF graphic control too short")
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else -1
            # comment (0xFE) / application (0xFF) / plain text
            # (0x01): skipped entirely by sub-block structure
            continue
        if block != 0x2C:
            raise ValueError("unknown GIF block 0x%02x at %d"
                             % (block, pos - 1))
        # ---- image descriptor
        if pos + 9 > n:
            raise ValueError("GIF image descriptor truncated")
        left, top, fw, fh, ipacked = struct.unpack(
            "<HHHHB", payload[pos:pos + 9])
        pos += 9
        if not fw or not fh:
            raise ValueError("GIF image with zero dimension")
        if left + fw > w or top + fh > h:
            raise ValueError("GIF image rect outside logical screen")
        if fw * fh > _MAX_PIXELS:
            raise ValueError("GIF frame size implausible")
        ct = gct
        if ipacked & 0x80:
            lct_len = 2 << (ipacked & 0x07)
            if pos + 3 * lct_len > n:
                raise ValueError("GIF local color table truncated")
            ct = np.frombuffer(payload, np.uint8, 3 * lct_len,
                               pos).reshape(lct_len, 3)
            pos += 3 * lct_len
        if ct is None:
            raise ValueError("GIF image with no color table")
        if pos >= n:
            raise ValueError("GIF LZW header truncated")
        min_code_size = payload[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(payload, pos)
        idx = np.frombuffer(
            _lzw_decode(min_code_size, lzw, fw * fh),
            np.uint8).reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index outside color table")
        if len(frames) >= _MAX_FRAMES or \
                (len(frames) + 1) * w * h > _MAX_PIXELS:
            # cumulative-output cap: each frame appends a full canvas
            # copy, so a tiny stream of many one-pixel frames over a
            # large screen would otherwise amplify to TBs (the same
            # decompression-bomb class the per-frame cap catches)
            raise ValueError("GIF frame count implausible")
        # ---- composite
        before = canvas[top:top + fh, left:left + fw].copy()
        rgb = ct[idx]                            # (fh, fw, 3)
        if transparent >= 0:
            mask = (idx == transparent)[:, :, None]
            rgb = np.where(mask, before, rgb)
        canvas[top:top + fh, left:left + fw] = rgb
        frames.append(canvas.copy())
        if disposal == 2:                        # restore to background
            bg = (gct[bg_index] if gct is not None
                  and bg_index < len(gct) else np.zeros(3, np.uint8))
            canvas[top:top + fh, left:left + fw] = bg
        elif disposal == 3:                      # restore to previous
            canvas[top:top + fh, left:left + fw] = before
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("GIF with no image data")
    return np.stack(frames)


# --------------------------------------------------------------- encode

def encode_gif(frames, palette: np.ndarray, screen=None,
               bg_index: int = 0) -> bytes:
    """Synthesis-side writer.  ``frames`` is a list of dicts:
    ``{"indices": (fh, fw) uint8, "left": int, "top": int,
    "palette": optional LCT (replaces the global table for this
    frame), "transparent": optional index, "disposal": 0..3,
    "interlace": bool}``; ``palette`` is the (N, 3) uint8 global
    table (N a power of two >= 4); ``screen`` the (h, w) logical
    size (defaults to frame 0's)."""
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or \
            palette.shape[0] < 4 or \
            palette.shape[0] & (palette.shape[0] - 1):
        raise ValueError("palette must be (2^k, 3) uint8 with >= 4 "
                         "entries")
    if screen is None:
        f0 = frames[0]["indices"]
        screen = (f0.shape[0] + frames[0].get("top", 0),
                  f0.shape[1] + frames[0].get("left", 0))
    h, w = screen
    gct_bits = max(1, int(palette.shape[0]).bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 7),
                       bg_index, 0)
    out += palette.tobytes()
    for fr in frames:
        idx = np.ascontiguousarray(fr["indices"], dtype=np.uint8)
        fh, fw = idx.shape
        left, top = fr.get("left", 0), fr.get("top", 0)
        transparent = fr.get("transparent", -1)
        disposal = fr.get("disposal", 0)
        if transparent >= 0 or disposal:
            out += bytes([0x21, 0xF9, 4,
                          ((disposal & 7) << 2)
                          | (1 if transparent >= 0 else 0),
                          0, 0, max(transparent, 0), 0])
        lct = fr.get("palette")
        ipacked = 0x40 if fr.get("interlace") else 0
        if lct is not None:
            lct = np.ascontiguousarray(lct, dtype=np.uint8)
            lct_bits = max(1, int(lct.shape[0]).bit_length() - 1)
            ipacked |= 0x80 | ((lct_bits - 1) & 7)
        out += bytes([0x2C]) + struct.pack("<HHHHB", left, top,
                                           fw, fh, ipacked)
        if lct is not None:
            out += lct.tobytes()
        if fr.get("interlace"):
            idx = _interlace(idx)
        table_n = (lct if lct is not None else palette).shape[0]
        if int(idx.max(initial=0)) >= table_n:
            raise ValueError("frame index outside its color table")
        min_code = max(2, int(table_n - 1).bit_length())
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(min_code, idx.tobytes()))
    out += b"\x3B"
    return bytes(out)
