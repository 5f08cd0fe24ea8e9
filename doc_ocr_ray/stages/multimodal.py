"""Multimodal columns: opaque binary payloads + typed metadata.

Media (image/audio/video) travel through the engine as ``binary``
columns with sidecar metadata, exactly as the span table carries
``media_ref`` strings (axes A+B: interleaved payloads, no pixel
processing in the invariant path — SURVEY.md section 1.3).

Decode kernels: formats that genuinely need codec libraries (MP4,
WebP, arithmetic-coded JPEG — absent in this environment) are
STUBBED with a documented ``NotImplementedError``, with
``use_fake_decoder=True`` running a deterministic fake that
exercises the full Ray-side plumbing.  FOUR formats get REAL
no-codec decode chains (pure stdlib + numpy): binary PPM images
(``ppm_image_stats``), PNG (chunk walk + inflate + unfilter,
``png_image_stats``), baseline AND progressive JPEG (Huffman +
vectorized IDCT, stages/jpeg.py, ``jpeg_image_stats``) and RIFF/PCM16 WAV audio (``wav_audio_stats``)
— all over closed-form synthetic payloads; the lossless formats'
stats are evaluated analytically by the DuckDB oracles, JPEG's gate
is a per-image roundtrip tolerance the oracle states verbatim.
"""
from __future__ import annotations

import hashlib
import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("doc_id", pa.string()),
    ("media_type", pa.string()),       # image | audio | video
    ("payload", pa.binary()),
    ("payload_len", pa.int64()),
])

FEATURE_DIM = 16


def synthesize_media_table(doc_ids, media_refs, seed: int = 42) -> pa.Table:
    """Deterministic fake payloads for plumbing tests: payload bytes =
    repeated md5 stream keyed by media_ref."""
    payloads = []
    types = []
    for ref in media_refs:
        h = hashlib.md5(f"{seed}:{ref}".encode()).digest()
        payloads.append(h * 64)         # 1 KiB fake payload
        types.append("image")
    return pa.table({
        "media_ref": pa.array(list(media_refs), pa.string()),
        "doc_id": pa.array(list(doc_ids), pa.string()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
    })


class MediaDecodeStage:
    """Actor-pool stage: decode + feature-extract media payloads.

    Real decoders load once per actor in ``__init__`` (model weights,
    codec contexts); per-batch work in ``__call__``.  Use small
    ``batch_size`` (e.g. 16-64) with fat payloads so batch x
    concurrency fits worker heaps.
    """

    def __init__(self, use_fake_decoder: bool = True, seed: int = 42,
                 codec=None):
        self.seed = seed
        self.use_fake_decoder = use_fake_decoder
        # codec: caller-injected ``bytes -> uint8 ndarray`` for image
        # containers beyond PPM/PNG (JPEG via PIL/turbojpeg in a real
        # deployment) — the VL-client injection pattern; loaded once
        # per ACTOR here, never per batch
        self.codec = codec
        self.decoder = None             # real decoder would load here
        try:
            import PIL.Image               # noqa: F401  (absent here)
            self.decoder = "pillow"
        except ImportError:
            self.decoder = None

    def _decode_real(self, payload: bytes, media_type: str) -> np.ndarray:
        # dispatch on the declared media_type AND the magic bytes — a
        # non-image payload that happens to start with 'P6' must fall
        # through to the documented stub, not mis-parse as pixels
        if media_type == "image" and (payload.startswith(b"P6")
                                      or payload.startswith(_PNG_SIG)
                                      or payload.startswith(b"\xff\xd8")
                                      or payload[:6] in (b"GIF87a",
                                                         b"GIF89a")
                                      or self.codec is not None):
            # pure-bytes image path (PPM header parse, PNG chunk
            # walk + zlib inflate + unfilter, or baseline-JPEG
            # Huffman + IDCT — stages/jpeg.py) or the injected codec:
            # decode -> 4x4 nearest resize -> grayscale mean per cell
            # = a REAL 16-dim feature
            img = decode_image(payload, self.codec)
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            small = resize_nearest(img, 4, 4).astype(np.float64)
            feat = small.mean(axis=2).reshape(-1) / 255.0
            return np.resize(feat, FEATURE_DIM)
        raise NotImplementedError(
            "real media decoding beyond binary PPM/PNG requires an "
            "image library not present in this environment; inject "
            "codec=... or run with use_fake_decoder=True")

    def _decode_fake(self, payload: bytes, media_type: str) -> np.ndarray:
        """Deterministic stand-in: feature = normalized bytes of
        md5(hex(payload)), fixed FEATURE_DIM.  Hashing the lowercase
        hex encoding (not the raw bytes) keeps the formula expressible
        in engines whose md5 only accepts text — the SQL oracle
        recomputes it as md5(repeat(md5(seed||ref), 64))."""
        h = hashlib.md5(payload.hex().encode("ascii")).digest()
        raw = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
        feat = np.resize(raw, FEATURE_DIM)
        return feat / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        # use_fake_decoder decides: True -> deterministic fake (even
        # when a real decoder library is importable), False -> the real
        # path, which raises if no decoder is available
        fn = self._decode_fake if self.use_fake_decoder else self._decode_real
        feats = [fn(p or b"", t) for p, t in zip(payloads, types)]
        return pa.table({
            "media_ref": batch["media_ref"],
            "doc_id": batch["doc_id"],
            "media_type": batch["media_type"],
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float64())),
            "payload_len": batch["payload_len"],
        })


class FrameSampleStage:
    """Video frame sampling: emits every-nth frame reference rows
    from a video payload — the one-row-in-N-rows-out media transform
    (flat map over fat binary rows).  With ``use_fake_decoder=False``
    y4m payloads decode FOR REAL (frame count from the container
    walk; an injected ``codec`` covers compressed containers), and
    each emitted row carries the frame's luma mean so the sample is a
    real feature, not just plumbing."""

    def __init__(self, every_n: int = 10, use_fake_decoder: bool = True,
                 codec=None):
        self.every_n = every_n
        self.use_fake_decoder = use_fake_decoder
        self.codec = codec              # once per ACTOR, never per batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, docs, frames, lens, lumas = [], [], [], [], []
        for ref, doc, payload in zip(batch["media_ref"].to_pylist(),
                                     batch["doc_id"].to_pylist(),
                                     batch["payload"].to_pylist()):
            payload = payload or b""
            if self.use_fake_decoder:
                n_frames = max(1, len(payload) // 256)
                sampled = ((f, -1) for f in
                           range(0, n_frames, self.every_n))
            else:
                decoded = decode_video(payload, self.codec)
                sampled = ((f, int(decoded[f].mean()))
                           for f in range(0, len(decoded),
                                          self.every_n))
            for f, luma in sampled:
                refs.append(f"{ref}#frame{f}")
                docs.append(str(doc))   # media tables carry int OR
                frames.append(f)        # string doc ids; frame refs
                lens.append(len(payload))   # normalize to string
                lumas.append(luma)
        return pa.table({
            "frame_ref": pa.array(refs, pa.string()),
            "doc_id": pa.array(docs, pa.string()),
            "frame_index": pa.array(frames, pa.int64()),
            "payload_len": pa.array(lens, pa.int64()),
            "luma_mean": pa.array(lumas, pa.int64()),
        })


def decode_media(media_ds, concurrency=(1, 4), batch_size: int = 32,
                 use_fake_decoder: bool = True, codec=None):
    """documents-with-payload Dataset -> feature rows (actor pool).
    ``codec`` is handed to each actor's constructor (once per actor,
    not per batch) for image containers beyond PPM/PNG."""
    return media_ds.map_batches(
        MediaDecodeStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"use_fake_decoder": use_fake_decoder,
                               "codec": codec})


# ------------------------------------------------------- real PPM path
# P6 (binary PPM) needs no codec library — header parse + frombuffer —
# so at least one image format gets a REAL decode/resize/feature chain
# (the Pillow/ffmpeg hooks above stay stubbed for formats that need
# them).

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 bytes."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 -> (h, w, 3) uint8.  Pure-bytes parse: whitespace-
    separated header tokens (with ``#`` comments), then raw RGB."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":        # comment to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1                                    # single ws after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=pos)
    return data.reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize by pure index mapping (no image libs)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def synthesize_ppm_media_table(doc_ids, width: int = 32,
                               height: int = 32) -> pa.Table:
    """Deterministic gradient test images whose channel means have a
    CLOSED FORM (pixel[y, x, c] = (x + 2y + 37c + doc_id) % 256), so
    decode output is SQL-oracle-checkable."""
    refs, docs, payloads = [], [], []
    x = np.arange(width)[None, :, None]
    y = np.arange(height)[:, None, None]
    c = np.arange(3)[None, None, :]
    for d in doc_ids:
        img = ((x + 2 * y + 37 * c + int(d)) % 256).astype(np.uint8)
        refs.append(f"ppm:{d}")
        docs.append(str(d))
        payloads.append(encode_ppm(img))
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "doc_id": pa.array(docs, pa.string()),
        "media_type": pa.array(["image"] * len(refs), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
    })


def ppm_image_stats(media_ds, batch_size: int = 32):
    """REAL decode chain over PPM payloads: parse -> per-channel means
    + dimensions.  Small batches (fat rows), stateless map; means use
    the floor(10000*sum/npix)/10000 grid rule shared with the SQL
    oracles."""
    def stats(batch: pa.Table) -> pa.Table:
        refs, ws, hs, means = [], [], [], ([], [], [])
        for ref, payload in zip(batch["media_ref"].to_pylist(),
                                batch["payload"].to_pylist()):
            img = decode_ppm(payload or b"")
            h, w = img.shape[:2]
            refs.append(ref)
            ws.append(w)
            hs.append(h)
            sums = img.sum(axis=(0, 1), dtype=np.int64)
            for ci in range(3):
                means[ci].append(
                    float(np.floor(10000 * sums[ci] / (w * h)) / 10000))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mean_r": pa.array(means[0], pa.float64()),
            "mean_g": pa.array(means[1], pa.float64()),
            "mean_b": pa.array(means[2], pa.float64()),
        })
    return media_ds.map_batches(stats, batch_format="pyarrow",
                                batch_size=batch_size)


# ------------------------------------------------------- real PNG path
# PNG needs no codec library either: the container is length-tagged
# chunks (struct + zlib.crc32) and the pixel stream is stdlib zlib
# plus the five scanline filters (numpy).  8-bit grayscale (color 0)
# and truecolor (color 2), non-interlaced — the dominant web case;
# everything else raises the documented NotImplementedError.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


# Adam7 interlace grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> PNG bytes (filter-0 rows, one
    IDAT) — the synthesis side of the roundtrip test.  With
    ``interlace=True`` the pixel stream is the seven Adam7 passes
    (each pass its own filtered scanline run, empty passes absent)."""
    import struct
    import zlib
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        color = 0
        img3 = img[:, :, None]
    else:
        h, w, ch = img.shape
        if ch != 3:
            raise NotImplementedError("encode_png: gray or RGB only")
        color = 2
        img3 = img
    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = img3[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(b"\x00" + sub[y].tobytes()
                         for y in range(sub.shape[0]))
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + img3[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0,
                       1 if interlace else 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def _png_unfilter(raw: bytes, h: int, w: int, nch: int,
                  offset: int) -> tuple:
    """Unfilter ``h`` scanlines of ``w * nch`` bytes starting at
    ``raw[offset]`` (all FIVE filters: None/Sub/Up/Average/Paeth);
    returns ``((h, w * nch) uint8 array, next offset)``.  Shared by
    the sequential decode and each Adam7 pass — a pass is its own
    filtered sub-image with the prior-row state reset."""
    stride = w * nch
    need = h * (stride + 1)
    if offset + need > len(raw):
        raise ValueError("PNG pixel stream length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        base = offset + y * (stride + 1)
        ft = raw[base]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=base + 1).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:                         # Up: vectorized
            cur = (line + prev) & 255
        elif ft == 1:                         # Sub: per-lane prefix sum
            # cur[i] = (line[i] + cur[i-nch]) & 255 telescopes to a
            # running sum within each channel lane, so the common
            # libpng-default filter decodes vectorized too
            cur = (line.reshape(w, nch).cumsum(axis=0) & 255).reshape(stride)
        elif ft in (3, 4):                    # serial in x by spec
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                if ft == 3:                   # Average
                    pred = (a + b) >> 1
                else:                         # Paeth
                    c = prev[i - nch] if i >= nch else 0
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = (a if pa_ <= pb_ and pa_ <= pc_
                            else b if pb_ <= pc_ else c)
                cur[i] = (line[i] + pred) & 255
        else:
            raise ValueError("unknown PNG filter %d" % ft)
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, offset + need


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (h, w, 3) or (h, w) uint8.  REAL decode: chunk walk with
    CRC verification, multi-IDAT concatenation, zlib inflate, all FIVE
    scanline filters (None/Sub/Up/Average/Paeth), and BOTH interlace
    modes (sequential and Adam7 seven-pass) so any baseline encoder's
    output decodes — not just :func:`encode_png`'s filter-0 stream."""
    import struct
    import zlib
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = 8
    idat = []
    w = h = color = interlace = None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk %r CRC mismatch" % tag)
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or color not in (0, 2):
                raise NotImplementedError(
                    "only 8-bit gray/RGB PNG decodes without a codec "
                    "library")
            if interlace not in (0, 1):
                raise ValueError("bad PNG interlace method %d" % interlace)
            if w * h > 1 << 28:               # input cap (decode_y4m rule)
                raise ValueError("PNG frame size implausible")
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(b"".join(idat))
    nch = 3 if color == 2 else 1
    if not interlace:
        out, end = _png_unfilter(raw, h, w, nch, 0)
        if end != len(raw):
            raise ValueError("PNG pixel stream length mismatch")
        img = out.reshape(h, w, nch)
        return img[:, :, 0] if nch == 1 else img
    # Adam7: seven independently-filtered sub-images, scattered onto
    # the full grid; passes with zero extent are wholly absent (no
    # filter bytes) per the spec
    img = np.zeros((h, w, nch), dtype=np.uint8)
    offset = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs if w > x0 else 0
        ph = (h - y0 + ys - 1) // ys if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        sub, offset = _png_unfilter(raw, ph, pw, nch, offset)
        img[y0::ys, x0::xs] = sub.reshape(ph, pw, nch)
    if offset != len(raw):
        raise ValueError("PNG pixel stream length mismatch")
    return img[:, :, 0] if nch == 1 else img


def synthesize_png_media_table(doc_ids, width: int = 32,
                               height: int = 32) -> pa.Table:
    """Deterministic gradient PNGs with the same closed-form pixels as
    :func:`synthesize_ppm_media_table` (pixel[y, x, c] =
    (x + 2y + 37c + doc_id) % 256), so the decoded channel means are
    SQL-oracle-checkable.  Every third image is Adam7-INTERLACED —
    same pixels, different wire format — so the oracle exercises the
    seven-pass decode path alongside the sequential one."""
    refs, docs, payloads = [], [], []
    x = np.arange(width)[None, :, None]
    y = np.arange(height)[:, None, None]
    c = np.arange(3)[None, None, :]
    for d in doc_ids:
        img = ((x + 2 * y + 37 * c + int(d)) % 256).astype(np.uint8)
        refs.append(f"png:{d}")
        docs.append(str(d))
        payloads.append(encode_png(img, interlace=(int(d) % 3 == 0)))
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "doc_id": pa.array(docs, pa.string()),
        "media_type": pa.array(["image"] * len(refs), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
    })


def png_image_stats(media_ds, batch_size: int = 32):
    """REAL decode chain over PNG payloads: chunk walk -> inflate ->
    unfilter -> per-channel means + dimensions, same output contract
    and floor grid as :func:`ppm_image_stats`."""
    def stats(batch: pa.Table) -> pa.Table:
        refs, ws, hs, means = [], [], [], ([], [], [])
        for ref, payload in zip(batch["media_ref"].to_pylist(),
                                batch["payload"].to_pylist()):
            img = decode_png(payload or b"")
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            h, w = img.shape[:2]
            refs.append(ref)
            ws.append(w)
            hs.append(h)
            sums = img.sum(axis=(0, 1), dtype=np.int64)
            for ci in range(3):
                means[ci].append(
                    float(np.floor(10000 * sums[ci] / (w * h)) / 10000))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mean_r": pa.array(means[0], pa.float64()),
            "mean_g": pa.array(means[1], pa.float64()),
            "mean_b": pa.array(means[2], pa.float64()),
        })
    return media_ds.map_batches(stats, batch_format="pyarrow",
                                batch_size=batch_size)


# ------------------------------------------------------- real GIF path

_GIF_GCT = None
_GIF_LCT = None


def _gif_palettes():
    """Closed-form 256-entry palettes shared by the synthesizer and
    the SQL oracle: GCT[i] = ((7i)%256, (5i+11)%256, (3i+23)%256),
    LCT[i] = ((9i+1)%256, (11i+3)%256, (13i+5)%256)."""
    global _GIF_GCT, _GIF_LCT
    if _GIF_GCT is None:
        i = np.arange(256, dtype=np.int64)
        _GIF_GCT = np.stack([(7 * i) % 256, (5 * i + 11) % 256,
                             (3 * i + 23) % 256], axis=1).astype(np.uint8)
        _GIF_LCT = np.stack([(9 * i + 1) % 256, (11 * i + 3) % 256,
                             (13 * i + 5) % 256], axis=1).astype(np.uint8)
    return _GIF_GCT, _GIF_LCT


def synthesize_gif_media_table(doc_ids, width: int = 32,
                               height: int = 32) -> pa.Table:
    """Deterministic TWO-frame GIFs whose composited canvases have a
    closed form the SQL oracle restates exactly:

    - frame 0: full-screen, index[y, x] = (x + 2y + d) % 256 over the
      global table; Adam-style 4-pass INTERLACED for d % 3 == 0
    - frame 1: a 16x16 patch at (8, 8), index[py, px] =
      (px + py + d) % 256, transparent index (d + 9) % 256 (so the 10
      px+py==9 pixels keep frame 0's pixels), LOCAL color table for
      odd d, global for even d

    Every decoder path (LZW, sub-blocks, interlace, GCE transparency,
    LCT, compositing) lands inside the hash-checked oracle."""
    from doc_ocr_ray.stages.gif import encode_gif
    if width < 24 or height < 24:
        raise ValueError("gif testbed needs >= 24x24 (16x16 patch "
                         "at (8, 8))")
    gct, lct = _gif_palettes()
    refs, docs, payloads = [], [], []
    x = np.arange(width)[None, :]
    y = np.arange(height)[:, None]
    px = np.arange(16)[None, :]
    py = np.arange(16)[:, None]
    for d in doc_ids:
        d = int(d)
        idx0 = ((x + 2 * y + d) % 256).astype(np.uint8)
        idx1 = ((px + py + d) % 256).astype(np.uint8)
        frames = [
            {"indices": idx0, "disposal": 1,
             "interlace": d % 3 == 0},
            {"indices": idx1, "left": 8, "top": 8,
             "transparent": (d + 9) % 256,
             "palette": lct if d % 2 else None},
        ]
        refs.append(f"gif:{d}")
        docs.append(str(d))
        payloads.append(encode_gif(frames, gct,
                                   screen=(height, width)))
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "doc_id": pa.array(docs, pa.string()),
        "media_type": pa.array(["image"] * len(refs), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
    })


def gif_image_stats(media_ds, batch_size: int = 32):
    """REAL decode chain over multi-frame GIF payloads: LZW +
    compositing -> per-FRAME channel means + dimensions (one output
    row per composited frame), same floor grid as
    :func:`ppm_image_stats`."""
    from doc_ocr_ray.stages.gif import decode_gif

    def stats(batch: pa.Table) -> pa.Table:
        refs, frs, ws, hs = [], [], [], []
        means = ([], [], [])
        for ref, payload in zip(batch["media_ref"].to_pylist(),
                                batch["payload"].to_pylist()):
            frames = decode_gif(payload or b"")
            nf, h, w = frames.shape[:3]
            sums = frames.sum(axis=(1, 2), dtype=np.int64)  # (nf, 3)
            for fi in range(nf):
                refs.append(ref)
                frs.append(fi)
                ws.append(w)
                hs.append(h)
                for ci in range(3):
                    means[ci].append(float(
                        np.floor(10000 * sums[fi, ci] / (w * h))
                        / 10000))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "frame": pa.array(frs, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mean_r": pa.array(means[0], pa.float64()),
            "mean_g": pa.array(means[1], pa.float64()),
            "mean_b": pa.array(means[2], pa.float64()),
        })
    return media_ds.map_batches(stats, batch_format="pyarrow",
                                batch_size=batch_size)


def _jpeg_expected_image(doc_id: int, width: int = 48,
                         height: int = 40) -> np.ndarray:
    """The closed-form smooth gradient `synthesize_jpeg_media_table`
    encodes: pixel[y, x, c] = 2x + 2y + 17c + (doc_id % 29) — stays
    below 256 at 48x40 so there are no mod-wrap edges (sharp edges
    would ring through the DCT and blow the roundtrip tolerance)."""
    x = np.arange(width)[None, :, None]
    y = np.arange(height)[:, None, None]
    c = np.arange(3)[None, None, :]
    return (2 * x + 2 * y + 17 * c + int(doc_id) % 29).astype(np.uint8)


def synthesize_jpeg_media_table(doc_ids, width: int = 48,
                                height: int = 40) -> pa.Table:
    """Deterministic smooth-gradient JPEGs via the built-in encoder
    (stages/jpeg.py), varying quality / 4:2:0 / restart interval per
    doc so one query covers every decoder path.  JPEG is lossy, so
    unlike the PPM/PNG tables the oracle contract is a per-image
    ROUNDTRIP-TOLERANCE gate (:func:`jpeg_image_stats`), not exact
    channel means."""
    from doc_ocr_ray.stages.jpeg import (encode_jpeg,
                                         encode_jpeg_progressive)
    refs, docs, payloads = [], [], []
    for d in doc_ids:
        d = int(d)
        img = _jpeg_expected_image(d, width, height)
        if d % 5 == 0:
            # every 5th doc is a PROGRESSIVE (SOF2) stream — same
            # quantized coefficients, so the same tolerance holds
            payloads.append(encode_jpeg_progressive(
                img, quality=85 + 5 * (d % 3), subsample=bool(d % 2)))
        else:
            payloads.append(encode_jpeg(
                img, quality=85 + 5 * (d % 3), subsample=bool(d % 2),
                restart_interval=d % 4))
        refs.append(f"jpg:{d}")
        docs.append(d)
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "doc_id": pa.array(docs, pa.int64()),
        "media_type": pa.array(["image"] * len(refs), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
    })


def jpeg_image_stats(media_ds, tol: int = 2, batch_size: int = 32):
    """REAL baseline-JPEG decode chain with a hash-checked gate: each
    synthesized image decodes through stages/jpeg.py and is compared
    pixelwise to its closed-form original; the output row
    (media_ref, width, height, err_le_tol) is fully SQL-statable
    because dims are exact by construction and err_le_tol must be 1
    for every image (the `similarity_*_recall` pattern applied to a
    lossy codec — the oracle states the contract verbatim, the engine
    proves it held)."""
    def stats(batch: pa.Table) -> pa.Table:
        refs, ws, hs, ok = [], [], [], []
        for ref, did, payload in zip(batch["media_ref"].to_pylist(),
                                     batch["doc_id"].to_pylist(),
                                     batch["payload"].to_pylist()):
            img = decode_image(payload or b"")
            expect = _jpeg_expected_image(int(did))
            refs.append(ref)
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            err = (np.abs(img.astype(np.int64)
                          - expect.astype(np.int64)).max()
                   if img.shape == expect.shape else tol + 1)
            ok.append(1 if err <= tol else 0)
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "err_le_tol": pa.array(ok, pa.int64()),
        })
    return media_ds.map_batches(stats, batch_format="pyarrow",
                                batch_size=batch_size)


# ------------------------------------------------------- real WAV path
# RIFF/PCM16 needs no audio library either: chunk walk + frombuffer.

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """mono int16 samples -> RIFF/WAVE PCM bytes (stdlib ``wave``)."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM16 mono -> (samples int16 ndarray, sample_rate).

    stdlib ``wave`` does the chunk walk (alignment, fmt extensions,
    unknown-chunk skipping); we validate the parts it reports —
    compression, channel count, sample WIDTH, and that the data chunk
    actually contains the declared frame count (a truncated payload
    raises instead of silently decoding short)."""
    import io
    import wave
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getcomptype() != "NONE" or w.getnchannels() != 1:
                raise ValueError("only PCM mono supported")
            if w.getsampwidth() != 2:
                raise ValueError("only 16-bit samples supported")
            rate = w.getframerate()
            n = w.getnframes()
            data = w.readframes(n)
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"malformed WAV payload: {exc}") from exc
    if len(data) != 2 * n:
        raise ValueError("truncated WAV data chunk")
    return np.frombuffer(data, dtype="<i2"), rate


def synthesize_wav_media_table(doc_ids, n_samples: int = 2048,
                               sample_rate: int = 16000) -> pa.Table:
    """Deterministic sawtooth test clips with a CLOSED FORM
    (sample[i] = ((i * (doc_id+3)) % 65536) - 32768), so decode output
    is SQL-oracle-checkable."""
    refs, docs, payloads = [], [], []
    i = np.arange(n_samples, dtype=np.int64)
    for d in doc_ids:
        s = ((i * (int(d) + 3)) % 65536) - 32768
        refs.append(f"wav:{d}")
        docs.append(str(d))
        payloads.append(encode_wav(s.astype(np.int16), sample_rate))
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "doc_id": pa.array(docs, pa.string()),
        "media_type": pa.array(["audio"] * len(refs), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
    })


def wav_audio_stats(media_ds, batch_size: int = 32):
    """REAL audio decode chain: RIFF parse -> sample count, rate, peak
    (exact int) and RMS on the floor-grid rule."""
    def stats(batch: pa.Table) -> pa.Table:
        refs, ns, rates, peaks, rmss = [], [], [], [], []
        for ref, payload in zip(batch["media_ref"].to_pylist(),
                                batch["payload"].to_pylist()):
            samples, rate = decode_wav(payload or b"")
            s = samples.astype(np.int64)
            refs.append(ref)
            ns.append(len(s))
            rates.append(rate)
            peaks.append(int(np.abs(s).max()) if len(s) else 0)
            sum_sq = int((s * s).sum())
            rmss.append(float(np.floor(
                10000 * np.sqrt(sum_sq / max(1, len(s)))) / 10000))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "n_samples": pa.array(ns, pa.int64()),
            "sample_rate": pa.array(rates, pa.int64()),
            "peak": pa.array(peaks, pa.int64()),
            "rms": pa.array(rmss, pa.float64()),
        })
    return media_ds.map_batches(stats, batch_format="pyarrow",
                                batch_size=batch_size)


# ------------------------------------------ perceptual audio dedup
# The audio counterpart of dHash below: re-encoded / re-hosted copies
# of the same clip share their ENERGY CONTOUR even when bytes differ.
# Fingerprint: decimate by 2 (every other sample — cheap anti-alias-
# free downsample; integer, so the SQL twin is exact), frame the
# decimated signal into 65 frames of 16, per-frame energy = sum of
# offset-shifted samples, one bit per adjacent-frame comparison ->
# 64 bits; near-dup iff hamming <= k via the shared
# `dedup.hash64_band_pairs` banding.

_AFP_FRAMES = 65
_AFP_FRAME_LEN = 16            # decimated samples per frame
_AFP_MIN_SAMPLES = _AFP_FRAMES * _AFP_FRAME_LEN * 2   # 2080 raw


def _pack_bits64(bits: np.ndarray) -> int:
    """64 comparison bits -> uint64 packed low-to-high, returned in
    two's complement (the repo's int64 hash storage contract).  The
    ONE definition both dHash and the audio fingerprint use."""
    h = np.uint64(0)
    for i in np.nonzero(bits)[0]:
        h |= np.uint64(1) << np.uint64(i)
    return int(h.astype(np.int64))


def _banded_hash_frame(ids, hashes, hash_col: str) -> "pd.DataFrame":
    """(doc_id, <hash_col>, band0..3) — the layout
    `dedup.hash64_band_pairs` consumes, built once for every 64-bit
    media hash domain."""
    import pandas as pd

    hs = np.array(hashes, dtype=np.int64).astype(np.uint64)
    out = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})
    out[hash_col] = hs.astype(np.int64)
    for band in range(4):
        out[f"band{band}"] = ((hs >> np.uint64(band * 16))
                              & np.uint64(0xFFFF)).astype(np.int64)
    return out


def _media_hash64_pairs(media_ds, row_hash, hash_col: str,
                        max_hamming: int, batch_size: int):
    """Shared decode->hash->band->pair plumbing: ``row_hash`` maps one
    payload to its 64-bit perceptual hash; everything after that is
    identical across media domains."""
    from doc_ocr_ray.stages.dedup import hash64_band_pairs

    def hash_batch(batch: pa.Table):
        ids = [int(d) for d in batch["doc_id"].to_pylist()]
        hashes = [row_hash(p) for p in batch["payload"].to_pylist()]
        return _banded_hash_frame(ids, hashes, hash_col)

    hashed = media_ds.map_batches(hash_batch, batch_format="pyarrow",
                                  batch_size=batch_size).materialize()
    return hash64_band_pairs(hashed, hash_col=hash_col,
                             max_hamming=max_hamming)


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit energy-contour fingerprint of an int16 clip.  Clips
    shorter than the 2080-sample analysis window are zero-padded
    (silence) so the operator is total."""
    s = samples.astype(np.int64) + 32768        # non-negative shift
    if len(s) < _AFP_MIN_SAMPLES:
        s = np.pad(s, (0, _AFP_MIN_SAMPLES - len(s)))
    dec = s[0:_AFP_MIN_SAMPLES:2]
    energy = dec.reshape(_AFP_FRAMES, _AFP_FRAME_LEN).sum(axis=1)
    return _pack_bits64(energy[1:] > energy[:-1])


def media_afp_batch(batch: pa.Table) -> "pd.DataFrame":
    """Real WAV decode -> fingerprint -> the (doc_id, afp, band0..3)
    layout `dedup.hash64_band_pairs` consumes."""
    ids = [int(d) for d in batch["doc_id"].to_pylist()]
    hashes = [audio_fingerprint64(decode_wav(p)[0])
              for p in batch["payload"].to_pylist()]
    return _banded_hash_frame(ids, hashes, "afp")


def media_afp_pairs(media_ds, max_hamming: int = 3,
                    batch_size: int = 32):
    """Perceptual near-duplicate audio pairs (doc_a, doc_b, hamming).
    Decode+fingerprint is one stateless map; 40 bytes/clip ride the
    banding shuffle, never samples."""
    return _media_hash64_pairs(
        media_ds, lambda p: audio_fingerprint64(decode_wav(p)[0]),
        "afp", max_hamming, batch_size)


def synthesize_neardup_wav_table(doc_ids,
                                 n_samples: int = _AFP_MIN_SAMPLES,
                                 sample_rate: int = 16000) -> pa.Table:
    """Deterministic near-duplicate audio testbed (closed-form samples
    so the SQL oracle recomputes the fingerprint exactly).  Groups of
    three share a base clip (g = doc_id // 3): variant 0 is the base;
    variant 1 perturbs ODD sample indices only — the 2x decimation
    keeps even indices, so its fingerprint is identical (hamming 0);
    variant 2 additionally bumps SAMPLED sample 0 by 5000 — a
    sub-contour change (frame-energy gaps here are ~10^5) that the
    fingerprint absorbs, the robustness-to-small-perturbation case.
    Nonzero hamming is exercised by cross-group pairs: distinct base
    clips whose contours agree on 61+ of 64 comparisons land at
    hamming 3 and are (correctly, per the predicate) reported too.

    sample(i) = ((i^2 (3 + g%13) + i (7 + g%5) + 11 g
                  + [v>=1][i odd]((i + g) % 997)
                  + [v=2][i=0] * 5000) % 65536) - 32768
    """
    refs, docs, payloads = [], [], []
    i = np.arange(n_samples, dtype=np.int64)
    odd = i % 2
    for d in doc_ids:
        d = int(d)
        g, v = d // 3, d % 3
        s = i * i * (3 + g % 13) + i * (7 + g % 5) + 11 * g
        if v >= 1:
            s = s + odd * ((i + g) % 997)
        if v == 2:
            s = s.copy()
            s[0] += 5000
        refs.append(f"afp:{d}")
        docs.append(d)
        payloads.append(encode_wav((s % 65536 - 32768).astype(np.int16),
                                   sample_rate))
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "doc_id": pa.array(docs, pa.int64()),
        "media_type": pa.array(["audio"] * len(refs), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
    })


# ------------------------------------------------------ real video path
# YUV4MPEG2 (y4m) is the PPM of video: a plain-text header, then
# length-implied raw frames — parseable with stdlib + numpy, no codec.
# This closes the round-3 stretch item (media scaffolding existed, no
# video operator): real container decode -> keyframe/energy contour ->
# the shared 64-bit banding pipeline.  Compressed containers (MP4 et
# al.) stay behind the injected-codec seam, exactly like JPEG exotics.

_Y4M_SIG = b"YUV4MPEG2 "
# total Cb+Cr bytes per frame = factor * (w*h) / 4
_Y4M_CHROMA_FACTOR = {"mono": 0, "420": 2, "420jpeg": 2,
                      "420mpeg2": 2, "420paldv": 2, "422": 4, "444": 8}


def encode_y4m(frames: np.ndarray, chroma: str = "mono") -> bytes:
    """(n, h, w) uint8 luma -> y4m bytes.  ``chroma != 'mono'`` emits
    flat 128 (neutral) chroma planes of the right size — enough to
    exercise the decoder's plane jumping."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    cname = "420jpeg" if chroma == "420" else chroma
    if cname not in _Y4M_CHROMA_FACTOR:
        raise ValueError("encode_y4m: unknown chroma %r" % chroma)
    head = (f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{cname}\n"
            .encode("ascii"))
    extra = (w * h * _Y4M_CHROMA_FACTOR[cname]) // 4
    pad = b"\x80" * extra
    return head + b"".join(b"FRAME\n" + frames[i].tobytes() + pad
                           for i in range(n))


def decode_y4m(payload: bytes) -> np.ndarray:
    """y4m -> (n, h, w) uint8 LUMA frames.  REAL parse: header tags,
    per-frame optional parameters, and chroma planes JUMPED by their
    computed length (the length-delimited-scan rule — never
    pattern-matched).  Unknown chroma modes raise; truncated frames
    raise ValueError."""
    if not payload.startswith(_Y4M_SIG):
        raise ValueError("not a y4m payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("y4m header unterminated")
    w = h = None
    chroma = "420"                    # spec default when C is absent
    for tag in payload[len(_Y4M_SIG):nl].split(b" "):
        if not tag:
            continue
        key, val = tag[:1], tag[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"C":
            chroma = val.decode("ascii", "replace")
    if not w or not h or w < 0 or h < 0:
        raise ValueError("y4m without valid W/H")
    if w * h > 1 << 28:
        raise ValueError("y4m frame size implausible")   # input cap
    factor = _Y4M_CHROMA_FACTOR.get(chroma)
    if factor is None:
        raise NotImplementedError(
            "y4m chroma mode %r needs an injected codec" % chroma)
    luma_len = w * h
    frame_len = luma_len + (luma_len * factor) // 4
    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        if not payload.startswith(b"FRAME", pos):
            raise ValueError("y4m FRAME marker expected at %d" % pos)
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("y4m frame header unterminated")
        pos = fnl + 1                  # frame params skipped
        if pos + frame_len > n:
            raise ValueError("y4m frame truncated")
        frames.append(np.frombuffer(payload, np.uint8, luma_len, pos)
                      .reshape(h, w))
        pos += frame_len               # JUMP luma + chroma planes
    if not frames:
        raise ValueError("y4m with zero frames")
    return np.stack(frames)


def decode_video(payload: bytes, codec=None) -> np.ndarray:
    """Container sniff for video, mirroring :func:`decode_image`:
    y4m parses for real; anything else (MP4/WebM/... — codec
    libraries absent here) goes to the injected ``codec`` callable
    (``bytes -> (n, h, w) uint8 luma ndarray``) or raises."""
    if payload.startswith(_Y4M_SIG):
        try:
            return decode_y4m(payload)
        except (NotImplementedError, ValueError):
            # unknown chroma (NotImplementedError) or a stream past
            # the built-in envelope (ValueError): fall through to the
            # injected codec when supplied — the same seam contract
            # as decode_image's JPEG route
            if codec is None:
                raise
    if codec is not None:
        frames = np.asarray(codec(payload))
        if frames.ndim != 3 or frames.dtype != np.uint8:
            raise ValueError("injected video codec must return a "
                             "(n, h, w) uint8 ndarray")
        return frames
    raise NotImplementedError(
        "unrecognized video container (MP4 et al. need a codec "
        "library not present here; pass codec=... to inject one)")


_VFP_FRAMES = 65


def video_fingerprint64(frames: np.ndarray) -> int:
    """64-bit temporal luma-energy-contour fingerprint — the video
    twin of :func:`audio_fingerprint64`: per-frame luma SUM over the
    first 65 frames (shorter clips zero-pad: black tail), one bit per
    consecutive-frame energy comparison."""
    e = (frames.reshape(len(frames), -1).astype(np.int64).sum(axis=1)
         [:_VFP_FRAMES])
    if len(e) < _VFP_FRAMES:
        e = np.pad(e, (0, _VFP_FRAMES - len(e)))
    return _pack_bits64(e[1:] > e[:-1])


def synthesize_video_table(doc_ids, width: int = 8,
                           height: int = 8) -> pa.Table:
    """Deterministic near-duplicate video testbed (closed-form luma
    so the SQL oracle recomputes the fingerprint exactly).  Groups of
    three share a base clip (g = doc_id // 3): variant 0 is the base;
    variant 1 cyclically shifts every frame one pixel in x — real
    pixel motion whose per-frame SUM (and so the fingerprint) is
    IDENTICAL, the re-encode/pan robustness case the contour absorbs;
    variant 2 additionally bumps frame 0 pixel (0,0) by +100 before
    the mod, which the oracle models verbatim.  GROUPS with
    g % 7 == 0 carry 40 frames instead of 65, exercising the
    zero-pad tail (keyed on the group so variants stay comparable).  luma(f, y, x) = (f^2 (3 + g%13) + f (7 + g%5)
    + 11 g + 2 y + 3 x + [v=2][f=y=x=0] 100) % 256."""
    refs, docs, payloads = [], [], []
    y = np.arange(height)[None, :, None]
    x = np.arange(width)[None, None, :]
    for d in doc_ids:
        d = int(d)
        g, v = d // 3, d % 3
        nf = 40 if g % 7 == 0 else _VFP_FRAMES
        f = np.arange(nf)[:, None, None]
        luma = (f * f * (3 + g % 13) + f * (7 + g % 5) + 11 * g
                + 2 * y + 3 * x)
        if v == 2:
            luma = luma.copy()
            luma[0, 0, 0] += 100
        luma = (luma % 256).astype(np.uint8)
        if v == 1:
            luma = np.roll(luma, 1, axis=2)   # sum-invariant pan
        refs.append(f"vid:{d}")
        docs.append(d)
        payloads.append(encode_y4m(luma))
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "doc_id": pa.array(docs, pa.int64()),
        "media_type": pa.array(["video"] * len(refs), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
    })


def media_vfp_pairs(media_ds, max_hamming: int = 3,
                    batch_size: int = 16, codec=None):
    """Perceptual near-duplicate video pairs (doc_a, doc_b, hamming):
    real y4m decode -> energy-contour fingerprint -> the shared
    64-bit banding pipeline; 40 bytes/clip ride the shuffle, never
    frames.  ``codec`` injects a decoder for compressed containers."""
    return _media_hash64_pairs(
        media_ds, lambda p: video_fingerprint64(decode_video(p, codec)),
        "vfp", max_hamming, batch_size)


# --------------------------------------------- perceptual image dedup
# A crawl re-hosts the same picture at many sizes / re-encodes — exact
# byte dedup (media_dedup below) misses every one of those.  dHash
# (difference hash) is the standard cheap perceptual key: resize to a
# 9x8 grid, one bit per horizontally-adjacent comparison, 64 bits per
# image; near-duplicate iff hamming distance <= k.  The banding+verify
# shuffle is shared with SimHash (`dedup.hash64_band_pairs`).


def decode_image(payload: bytes, codec=None) -> np.ndarray:
    """Container sniff: route PPM / PNG / baseline-JPEG payloads to
    their real no-codec decoders (JPEG: stages/jpeg.py — Huffman +
    vectorized IDCT; closes the round-3 S2 gap).
    Any other container (WebP / arithmetic-coded JPEG / ... — codec
    libraries absent in this environment) goes to the
    caller-INJECTED ``codec`` callable
    (``bytes -> (h, w[, c]) uint8 ndarray``) when one is supplied —
    the VL-client injection pattern (functions/protocols.py) applied
    to pixels, so a real deployment plugs PIL/turbojpeg without
    touching any stage — and raises the documented
    NotImplementedError otherwise."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from doc_ocr_ray.stages.gif import decode_gif
        return decode_gif(payload)[0]       # first composited frame
    if payload[:2] == b"\xff\xd8":
        from doc_ocr_ray.stages.jpeg import decode_jpeg
        try:
            return decode_jpeg(payload)
        except (NotImplementedError, ValueError):
            # arithmetic / hierarchical / 12-bit (NotImplementedError)
            # or a stream past the built-in envelope (ValueError):
            # the injected codec — PIL/turbojpeg in a real deployment,
            # a strict superset of the built-in baseline+progressive
            # decoder — stays the fallback; with no codec the error
            # propagates loudly
            if codec is None:
                raise
    if codec is not None:
        img = np.asarray(codec(payload))
        if img.ndim not in (2, 3) or img.dtype != np.uint8:
            raise ValueError("injected codec must return a "
                             "(h, w[, c]) uint8 ndarray")
        return img
    raise NotImplementedError(
        "unrecognized image container (JPEG et al. need a codec "
        "library not present here; pass codec=... to inject one)")


def dhash64(img: np.ndarray) -> int:
    """Difference hash: nearest-resize to 9 wide x 8 high, grayscale
    as the CHANNEL SUM (monotone in luminance, no division so the SQL
    twin is exact), bit (r, c) = [g[r, c+1] > g[r, c]], packed
    row-major into a uint64 returned in two's complement (the int64
    storage convention `simhash64` uses)."""
    small = resize_nearest(img, 8, 9).astype(np.int64)
    g = small.sum(axis=2) if small.ndim == 3 else small
    return _pack_bits64((g[:, 1:] > g[:, :-1]).ravel())


def media_dhash_batch(batch: pa.Table, codec=None) -> "pd.DataFrame":
    """Real decode -> dHash -> the (doc_id, dhash, band0..3) layout
    `dedup.hash64_band_pairs` consumes.  doc_id passes through as
    int64 (pair emission sorts and hashes on it).  ``codec`` plugs
    containers beyond PPM/PNG (see :func:`decode_image`)."""
    ids = [int(d) for d in batch["doc_id"].to_pylist()]
    hashes = [dhash64(decode_image(p, codec))
              for p in batch["payload"].to_pylist()]
    return _banded_hash_frame(ids, hashes, "dhash")


def media_dhash_pairs(media_ds, max_hamming: int = 3,
                      batch_size: int = 32, codec=None):
    """Perceptual near-duplicate image pairs: (doc_a, doc_b, hamming)
    with hamming <= ``max_hamming``.  Decode+hash is one stateless
    map (small batches — fat binary rows); only 40 bytes/image ride
    the banding shuffle, never pixels.  ``codec`` injects a decoder
    for containers beyond PPM/PNG (see :func:`decode_image`)."""
    return _media_hash64_pairs(
        media_ds, lambda p: dhash64(decode_image(p, codec)),
        "dhash", max_hamming, batch_size)


def media_dhash_incremental(new_media_ds, old_media_ds,
                            max_hamming: int = 3, batch_size: int = 32,
                            num_parts: int = 64, codec=None):
    """Incremental perceptual image dedup: drop NEW images that
    near-duplicate ANY image of the existing snapshot — the
    per-crawl-snapshot pattern `dedup.exact_dedup_incremental` /
    `minhash_dedup_incremental` implement for text, completed for the
    media domain.  Returns the surviving NEW doc_ids (one column).

    Shape: both sides hash through the shared decode->dHash->band
    plumbing with a side bit folded into the id (old = 2*id,
    new = 2*id+1 — no assumption that the two tables' id spaces are
    disjoint), ONE banding exchange finds candidate pairs, cross-side
    pairs mark their new id as a victim, and survivors come from a
    coarse-keyed tagged anti-join (no broadcast: the victim set is
    new-corpus-sized in the worst case of a fully-duplicate crawl).
    """
    import pandas as pd

    from doc_ocr_ray.stages.dedup import hash64_band_pairs
    from doc_ocr_ray.util import coarse_part, typed_if_empty

    def hash_side(side):
        def fn(batch: pa.Table):
            df = media_dhash_batch(batch, codec)
            df["doc_id"] = df["doc_id"] * 2 + side
            return df
        return fn

    hashed = (old_media_ds.map_batches(hash_side(0),
                                       batch_format="pyarrow",
                                       batch_size=batch_size)
              .union(new_media_ds.map_batches(hash_side(1),
                                              batch_format="pyarrow",
                                              batch_size=batch_size))
              ).materialize()
    pairs = hash64_band_pairs(hashed, hash_col="dhash",
                              max_hamming=max_hamming)

    def victims(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        cross = (a % 2) != (b % 2)
        new_enc = np.where(a % 2 == 1, a, b)[cross]
        out = pd.DataFrame({"doc_id": (new_enc // 2).astype("int64")})
        out["side"] = np.int64(1)
        out["part"] = coarse_part(out["doc_id"], num_parts)
        return typed_if_empty(out)

    def tag_new(batch: pa.Table) -> pd.DataFrame:
        ids = pd.Series([int(d) for d in batch["doc_id"].to_pylist()],
                        dtype="int64")
        out = pd.DataFrame({"doc_id": ids})
        out["side"] = np.int64(0)
        out["part"] = coarse_part(out["doc_id"], num_parts)
        return typed_if_empty(out)

    tagged = (new_media_ds.select_columns(["doc_id"])
              .map_batches(tag_new, batch_format="pyarrow")
              .union(pairs.map_batches(victims, batch_format="pandas")))

    def survivors(group: pd.DataFrame) -> pd.DataFrame:
        dead = set(group.loc[group["side"] == 1, "doc_id"].to_numpy())
        keep = group[(group["side"] == 0)
                     & ~group["doc_id"].isin(dead)]
        return typed_if_empty(
            keep[["doc_id"]].drop_duplicates().reset_index(drop=True))

    return (tagged.groupby("part")
            .map_groups(survivors, batch_format="pandas"))


def synthesize_neardup_ppm_table(doc_ids, width: int = 18,
                                 height: int = 16) -> pa.Table:
    """Deterministic near-duplicate image testbed (closed-form pixels
    so the SQL oracle recomputes the dHash exactly).  Docs come in
    groups of three sharing a base pattern (g = doc_id // 3):
    variant 0 is the base; variant 1 perturbs ODD coordinates only —
    the 2x nearest-resize samples even coordinates, so its dHash is
    identical (hamming 0); variant 2 additionally bumps the sampled
    pixel (0, 0) by 128, flipping at most bit (0, 0) (hamming <= 1).

    pixel(y, x, ch) = ((3 + g%11) x^2 + (5 + g%7) xy + 11ch + 7g
                       + [v>=1][x or y odd]((x + y + g) % 97)
                       + [v=2][x=y=0] * 128) % 256

    The x^2 and xy coefficients depend on g, so different groups have
    genuinely different comparison structure (a constant inter-group
    shift would leave every dHash bit equal mod the 256-wraps).
    """
    x = np.arange(width)[None, :, None]
    y = np.arange(height)[:, None, None]
    ch = np.arange(3)[None, None, :]
    odd = ((x % 2) | (y % 2))
    refs, docs, payloads = [], [], []
    for d in doc_ids:
        d = int(d)
        g, v = d // 3, d % 3
        img = (3 + g % 11) * x * x + (5 + g % 7) * x * y + 11 * ch + 7 * g
        if v >= 1:
            img = img + odd * ((x + y + g) % 97)
        if v == 2:
            img = img.copy()
            img[0, 0, :] += 128
        refs.append(f"nd:{d}")
        docs.append(d)
        payloads.append(encode_ppm((img % 256).astype(np.uint8)))
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "doc_id": pa.array(docs, pa.int64()),
        "media_type": pa.array(["image"] * len(refs), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
    })


def media_dedup(media_ds, num_parts: int = 64):
    """Exact binary dedup of media payloads — the image/asset-level
    dedup a multimodal corpus needs (the same bytes crawled under many
    URLs keep ONE copy): survivor per distinct payload = smallest
    (doc_id, media_ref).  Output: (media_ref, doc_id, payload_len) —
    payloads themselves stay out of the result.

    Shape: per-batch md5 keying with an in-batch keep-first combiner
    (a viral image repeated millions of times ships one candidate per
    batch, not one per copy); ONE coarse hash-keyed exchange whose
    keep-first compares the payload BYTES inside the group, so an md5
    collision can never merge distinct media — the exact_dedup
    discipline applied to binary columns.  Payload bytes cross the
    wire once per in-batch-distinct candidate.  Rows whose payload is
    NULL (a fetch that failed upstream) have no bytes to dedup on and
    are dropped from the result.
    """
    import pandas as pd

    key_schema = pa.schema([
        ("media_ref", pa.string()), ("doc_id", pa.string()),
        ("payload", pa.binary()), ("payload_len", pa.int64()),
        ("part", pa.int64())])

    def key(batch: pa.Table) -> pa.Table:
        df = batch.select(
            ["media_ref", "doc_id", "payload", "payload_len"]).to_pandas()
        df = df[df["payload"].notna()]
        df = (df.sort_values(["doc_id", "media_ref"])
              .drop_duplicates("payload", keep="first"))
        if len(df) == 0:
            # typed empty: an object-dtype payload column would break
            # schema unification with the binary blocks in the shuffle
            return key_schema.empty_table()
        pkey = np.fromiter(
            (int.from_bytes(hashlib.md5(bytes(p)).digest()[:8],
                            "big") >> 1 for p in df["payload"]),
            dtype="int64", count=len(df))
        df["part"] = pkey % num_parts
        return pa.Table.from_pandas(df, schema=key_schema,
                                    preserve_index=False)

    def keep_first(group: "pd.DataFrame") -> "pd.DataFrame":
        g = (group.sort_values(["doc_id", "media_ref"])
             .drop_duplicates("payload", keep="first"))
        return (g[["media_ref", "doc_id", "payload_len"]]
                .reset_index(drop=True))

    return (media_ds.map_batches(key, batch_format="pyarrow")
            .groupby("part").map_groups(keep_first,
                                        batch_format="pandas"))


def media_context_stats(flat_ds, num_parts: int = 64):
    """Per-document media-context coverage over INTERLEAVED flat spans
    — the multimodal-loader curation signal: an image whose
    immediately preceding span is real text can be trained as a
    captioned pair; orphan media (no adjacent text) are the rows a
    curation pass drops or re-captions.  Input: flat span rows
    ``(doc_id, kind, text, media_ref, offset)`` (ordinal offsets);
    output per doc: ``(doc_id, n_spans, n_media, n_captioned,
    context_chars)`` where a media span (``media_ref != ''``) is
    captioned iff the previous offset's span is NON-media with
    non-empty text, and ``context_chars`` sums those captions'
    lengths.

    Shape: ONE coarse doc-hash exchange; inside the group everything
    is a vectorized sort + groupby shift — per-doc span counts are
    loader-bounded, and only span metadata (never media payloads)
    rides the shuffle.  SQL twin: LAG OVER (PARTITION BY doc_id
    ORDER BY offset).
    """
    import pandas as pd

    from doc_ocr_ray.util import coarse_part, typed_if_empty

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["part"] = coarse_part(batch["doc_id"], num_parts)
        return batch

    def per_doc(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["doc_id", "offset"],
                              kind="mergesort").copy()
        g["media_ref"] = g["media_ref"].fillna("")
        g["text"] = g["text"].fillna("")
        gb = g.groupby("doc_id", sort=False)
        prev_ref = gb["media_ref"].shift(1)     # NaN at doc start
        prev_text = gb["text"].shift(1)
        is_media = (g["media_ref"] != "").to_numpy()
        captioned = (is_media
                     & (prev_ref == "").to_numpy()
                     & (prev_text.fillna("") != "").to_numpy())
        g["is_media"] = is_media.astype("int64")
        g["captioned"] = captioned.astype("int64")
        g["ctx"] = np.where(captioned,
                            prev_text.fillna("").str.len().to_numpy(),
                            0).astype("int64")
        out = (g.groupby("doc_id", sort=False)
               .agg(n_spans=("offset", "size"),
                    n_media=("is_media", "sum"),
                    n_captioned=("captioned", "sum"),
                    context_chars=("ctx", "sum"))
               .reset_index())
        for c in ("n_spans", "n_media", "n_captioned", "context_chars"):
            out[c] = out[c].astype("int64")
        return typed_if_empty(out)

    return (flat_ds.map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(per_doc, batch_format="pandas"))
