"""Real media decoders with zero third-party codec dependencies.

``multimodal.DECODERS`` ships with an honest stub for modalities we
cannot decode; this module provides *actual* decode paths built from
what is guaranteed importable:

- images: PNG (8-bit gray/RGB/RGBA, non-interlaced — zlib inflate +
  full filter reconstruction per the PNG spec), binary PPM/PGM (P6/P5),
  and uncompressed 24/32-bit BMP. When PIL is importable it is
  preferred and handles every format it knows.
- audio: WAV/RIFF PCM via the stdlib ``wave`` module (+ numpy for the
  sample math).
- video: YUV4MPEG2 (y4m — the raw-frame interchange format ffmpeg/x264
  read and write; plain-text header + uncompressed planar frames) parsed
  with stdlib struct-free slicing, and MJPEG-in-AVI (RIFF demux +
  per-frame baseline JPEG decode via the pure-numpy codec in
  ``db_spark.llm.jpeg``) — one COMPRESSED container decodes with zero
  third-party codec dependencies. Other compressed containers
  (mp4/mkv/webm) decode through PyAV when it is importable; without it
  they raise the honest NotImplementedError.

Decoders run inside Arrow-batched ``mapInPandas`` workers
(``multimodal.extract_features``): payload bytes never leave the
executor, and the decode is per-row Python *inside* a vectorized batch
— the unavoidable shape for format parsing (reference analog: the
reference has no media layer at all; this is north-star surface from
BASELINE.json).

Feature contract (matches ``FEATURE_SCHEMA.features: array<float>``):

- image  -> [width, height, channels, mean_ch0..mean_ch2, stddev, entropy8]
- audio  -> [sample_rate, n_channels, duration_ms, rms, zero_cross_rate,
             peak, mean_abs, sample_width]

All statistics are computed in float64 and rounded to 6 places so the
same payload yields identical features on every worker.
"""

from __future__ import annotations

import io
import math
import struct
import zlib

import numpy as np

try:  # pragma: no cover - not present in this container
    from PIL import Image as _PILImage
except Exception:  # noqa: BLE001
    _PILImage = None

try:  # pragma: no cover - not present in this container
    import av as _pyav
except Exception:  # noqa: BLE001
    _pyav = None


# ---------------------------------------------------------------------------
# PNG (pure stdlib): spec https://www.w3.org/TR/png-3/
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (palette unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4). Returns (height, stride)
    uint8 array of reconstructed bytes."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = line
        prev = line
    return out


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """-> (width, height, channels, pixels[h, w, c] uint8). Supports
    bit depth 8, color types 0/2/4/6, non-interlaced."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width = 8, 0
    height = depth = ctype = interlace = 0
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif ctag == b"IDAT":
            idat.extend(body)
        elif ctag == b"IEND":
            break
    if depth != 8 or ctype not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"PNG: unsupported (depth={depth} color={ctype} interlace={interlace})")
    channels = _PNG_CHANNELS[ctype]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG: IDAT length mismatch")
    grid = _png_unfilter(raw, height, stride, channels)
    return width, height, channels, grid.reshape(height, width, channels)


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 on every scanline) — used by tests to
    round-trip the decoder against known pixel data."""
    h, w, c = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# PPM / PGM (binary P6 / P5)
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    magic = payload[:2]
    channels = {b"P6": 3, b"P5": 1}.get(magic)
    if channels is None:
        raise ValueError("not a binary PPM/PGM")
    # header: magic, width, height, maxval — whitespace/comment separated
    toks: list[int] = []
    pos = 2
    while len(toks) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while payload[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        toks.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = toks
    if maxval > 255:
        raise ValueError("PPM: 16-bit not supported")
    n = width * height * channels
    pix = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return width, height, channels, pix.reshape(height, width, channels)


# ---------------------------------------------------------------------------
# BMP (uncompressed 24/32-bit, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    bpp, compression = struct.unpack("<HI", payload[28:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"BMP: unsupported (bpp={bpp} compression={compression})")
    channels = bpp // 8
    flipped = height > 0
    height = abs(height)
    row_bytes = ((width * channels + 3) // 4) * 4  # 4-byte row padding
    # Explicit channel indices: BMP stores BGR / BGRA. A blanket [::-1]
    # would turn BGRA into ARGB — putting alpha in ch0 — while the
    # PNG/PIL paths put red there; features must agree across formats.
    order = [2, 1, 0] if channels == 3 else [2, 1, 0, 3]
    rows = []
    for y in range(height):
        off = data_off + y * row_bytes
        row = np.frombuffer(payload, np.uint8, width * channels, off)
        rows.append(row.reshape(width, channels)[:, order])  # -> RGB(A)
    grid = np.stack(rows[::-1] if flipped else rows)
    return width, height, channels, grid


# ---------------------------------------------------------------------------
# Video: YUV4MPEG2 (y4m) — https://wiki.multimedia.cx/index.php/YUV4MPEG2
# Plain-text stream header ("YUV4MPEG2 W.. H.. F..:.. ... C<cs>\n") then
# per-frame "FRAME[params]\n" + raw planar pixel data. No compression,
# no third-party codec needed — this is the raw interchange format
# ffmpeg/x264/mjpegtools read and write.
# ---------------------------------------------------------------------------

_Y4M_SIG = b"YUV4MPEG2 "
#: colorspace tag -> (chroma_x_div, chroma_y_div); mono has no chroma.
_Y4M_CS = {
    "420": (2, 2), "420jpeg": (2, 2), "420mpeg2": (2, 2), "420paldv": (2, 2),
    "422": (2, 1), "444": (1, 1), "mono": None,
}


def decode_y4m_parts(
    payload: bytes,
) -> tuple[int, int, tuple[int, int], np.ndarray]:
    """-> (width, height, (fps_num, fps_den), luma[n_frames, h, w]
    uint8). The fps is kept as the stream's EXACT rational so samplers
    can do pure integer index arithmetic (F30000:1001 as a float can
    land one ulp below a frame boundary). Supports the 8-bit
    colorspaces (C420*, C422, C444, Cmono); chroma planes are parsed
    (the frame stride needs them) but only luma is returned — every
    downstream feature here is luma-based."""
    if not payload.startswith(_Y4M_SIG):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.index(b"\n")
    width = height = 0
    fps_num, fps_den = 30, 1
    cs = "420"
    for tok in payload[len(_Y4M_SIG):nl].split():
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), max(1, int(den))
        elif tag == "C":
            cs = val
    if cs not in _Y4M_CS:
        raise ValueError(f"y4m: unsupported colorspace C{cs}")
    if width <= 0 or height <= 0:
        raise ValueError("y4m: missing W/H in stream header")
    sub = _Y4M_CS[cs]
    luma_len = width * height
    chroma_len = 0 if sub is None else 2 * ((width // sub[0]) * (height // sub[1]))
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"y4m: expected FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1  # skip per-frame params
        if pos + luma_len > len(payload):
            raise ValueError("y4m: truncated frame data")
        frames.append(np.frombuffer(payload, np.uint8, luma_len, pos)
                      .reshape(height, width))
        pos += luma_len + chroma_len
    if not frames:
        # a header-only stream is legal y4m; np.stack([]) would raise
        # numpy's opaque "need at least one array to stack" instead
        raise ValueError("y4m: stream contains no frames")
    return width, height, (fps_num, fps_den), np.stack(frames)


def decode_y4m(payload: bytes) -> tuple[int, int, float, np.ndarray]:
    """Float-fps convenience wrapper over :func:`decode_y4m_parts`."""
    w, h, (num, den), luma = decode_y4m_parts(payload)
    return w, h, num / den, luma


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (30, 1)) -> bytes:
    """Minimal Cmono y4m writer over luma frames [n, h, w] uint8 — used
    by tests to round-trip the decoder against known pixel data."""
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
    return head.encode("ascii") + b"".join(
        b"FRAME\n" + frames[i].tobytes() for i in range(n))


# ---------------------------------------------------------------------------
# AVI / MJPEG (RIFF container, Motion-JPEG frames via the pure-numpy
# baseline JPEG codec in db_spark.llm.jpeg — no PyAV needed)
# ---------------------------------------------------------------------------

_RIFF_SIG = b"RIFF"


def _luma_of(frame_rgb: np.ndarray) -> np.ndarray:
    """uint8 [h, w, 1|3] -> uint8 luma plane (ITU-R BT.601)."""
    if frame_rgb.shape[2] == 1:
        return frame_rgb[:, :, 0]
    f = frame_rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    return np.clip(np.round(y), 0, 255).astype(np.uint8)


def decode_avi_mjpeg_parts(
    payload: bytes,
) -> tuple[int, int, tuple[int, int], np.ndarray]:
    """Demux a RIFF/AVI container and decode its MJPEG video frames to
    (width, height, (fps_num, fps_den), luma[n, h, w]). Tolerant
    TWO-PASS chunk walk: pass 1 resolves the video stream index —
    streams are numbered by strh appearance order (the AVI contract);
    fps and the frame-chunk stream index both come from the first
    'vids' strh (dwRate/dwScale) — and only then does pass 2 decode
    that index's '{NN}dc'/'{NN}db' chunks inside LIST 'movi' (each a
    standalone baseline JPEG — the MJPEG contract). One pass would
    have to guess an index for frame chunks that precede the header
    (malformed movi-before-hdrl muxing, stray pre-header dc chunks)
    and could decode another stream's data as video (r11 ADVICE); the
    extra pass only re-reads chunk HEADERS, never frame bytes. An AVI
    whose video stream is not stream 0 (audio-first muxing) decodes;
    frame chunks with no vids strh anywhere are ignored; the optional
    idx1 index is ignored. Chunks are word-aligned per the RIFF spec.
    A declared vids stream with zero decodable frame chunks raises
    ValueError (silently returning an empty grid would cascade into NaN
    features downstream)."""
    from db_spark.llm.jpeg import decode_jpeg

    if payload[:4] != _RIFF_SIG or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/'AVI ' header)")
    fps = (30, 1)
    vids_idx = -1  # -1 = no vids strh seen yet; first one wins
    n_strh = 0
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int, decode: bool) -> None:
        nonlocal fps, vids_idx, n_strh
        while pos + 8 <= end:
            cid = payload[pos:pos + 4]
            size = int.from_bytes(payload[pos + 4:pos + 8], "little")
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + size, decode)  # skip list type
            elif cid == b"strh" and not decode:
                if payload[body_at:body_at + 4] == b"vids" and vids_idx < 0:
                    vids_idx = n_strh
                    scale = int.from_bytes(
                        payload[body_at + 20:body_at + 24], "little")
                    rate = int.from_bytes(
                        payload[body_at + 24:body_at + 28], "little")
                    if rate and scale:
                        fps = (rate, scale)
                n_strh += 1
            elif decode and size and len(cid) == 4 \
                    and cid[2:4] in (b"dc", b"db") \
                    and cid[:2] == b"%02d" % vids_idx:
                _, _, _, px = decode_jpeg(payload[body_at:body_at + size])
                frames.append(_luma_of(px))
            pos = body_at + size + (size & 1)  # word alignment

    walk(12, len(payload), decode=False)  # pass 1: resolve vids_idx
    if vids_idx >= 0:
        walk(12, len(payload), decode=True)  # pass 2: decode its frames
    if not frames:
        if vids_idx >= 0:
            raise ValueError(
                "AVI declares a vids stream (index %d) but contains no "
                "decodable '%02ddc'/'%02ddb' frame chunks"
                % (vids_idx, vids_idx, vids_idx))
        return 0, 0, fps, np.zeros((0, 0, 0), np.uint8)
    grid = np.stack(frames)
    return grid.shape[2], grid.shape[1], fps, grid


def encode_avi_mjpeg(
    frames: "list[np.ndarray] | np.ndarray",
    fps: tuple[int, int] = (30, 1),
    quality: int = 90,
    luma_quant_zz: "list[int] | None" = None,
) -> bytes:
    """Mux grayscale/RGB frames as an MJPEG AVI (spec-shaped RIFF:
    hdrl with avih + vids strl, movi with one '00dc' JPEG per frame).
    Fixture/round-trip counterpart of :func:`decode_avi_mjpeg_parts`."""
    from db_spark.llm.jpeg import encode_jpeg

    frames = [np.asarray(f) for f in frames]
    h, w = frames[0].shape[:2]
    num, den = fps
    payloads = [encode_jpeg(f, quality=quality,
                            luma_quant_zz=luma_quant_zz) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + \
            (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    usec = (1_000_000 * den) // num if num else 0
    avih = struct.pack(
        "<14I", usec, 0, 0, 0x10, len(frames), 0, 1,
        max(map(len, payloads)), w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIII", 0, 0, 0, 0, den, num, 0, len(frames),
        max(map(len, payloads)), 0xFFFFFFFF) +
        struct.pack("<I", 0) + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_video_parts(
    payload: bytes,
) -> tuple[int, int, tuple[int, int], np.ndarray]:
    """Decode to (width, height, (fps_num, fps_den), luma[n, h, w]).
    y4m via the stdlib parser above; MJPEG-in-AVI via the pure-numpy
    baseline JPEG codec (db_spark/llm/jpeg.py) — one compressed
    container decodes with zero third-party codec dependencies; other
    compressed containers via PyAV when importable, else the honest
    NotImplementedError (the pipeline plumbing stays real — register a
    decoder when a codec library is present)."""
    if payload.startswith(_Y4M_SIG):
        return decode_y4m_parts(payload)
    if payload[:4] == _RIFF_SIG and payload[8:12] == b"AVI ":
        return decode_avi_mjpeg_parts(payload)
    if _pyav is not None:  # pragma: no cover - PyAV absent in container
        with _pyav.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            rate = stream.average_rate  # a Fraction, or None
            num, den = (int(rate.numerator), int(rate.denominator)) \
                if rate else (30, 1)
            lumas = [np.asarray(f.reformat(format="gray8").planes[0])
                     for f in container.decode(stream)]
        grid = np.stack(lumas)
        return grid.shape[2], grid.shape[1], (num, den), grid
    raise NotImplementedError(
        "y4m and MJPEG-AVI payloads decode natively; other compressed "
        "video needs a codec library (PyAV) not present in this "
        "environment — or register a decoder with "
        "register_decoder('video', fn)")


def decode_video(payload: bytes) -> tuple[int, int, float, np.ndarray]:
    """Float-fps convenience wrapper over :func:`decode_video_parts`."""
    w, h, (num, den), luma = decode_video_parts(payload)
    return w, h, num / den, luma


def video_features(payload: bytes, modality: str = "video") -> list[float]:
    """DECODERS-compatible video featurizer over decoded luma frames:
    [width, height, n_frames, fps, duration_ms, mean_luma, std_luma,
    motion] where motion is the mean |frame-delta| of consecutive luma
    frames (0 for a single frame) — the standard cheap cut/static-scene
    signal. float64 math, rounded to 6 places (same determinism contract
    as the image/audio featurizers)."""
    if payload is None:
        return []
    w, h, fps, luma = decode_video(payload)
    flat = luma.astype(np.float64)
    n = luma.shape[0]
    motion = (float(np.abs(np.diff(flat, axis=0)).mean()) if n > 1 else 0.0)
    duration_ms = 1000.0 * n / fps if fps > 0 else 0.0
    return [round(v, 6) for v in [
        float(w), float(h), float(n), fps, duration_ms,
        float(flat.mean()), float(flat.std()), motion,
    ]]


def extract_video_frames(
    payload: bytes, meta: dict, every_ms: int, max_frames: int,
) -> list[tuple[int, bytes]]:
    """REAL frame sampler for ``multimodal.sample_frames``: decode the
    video, pick the frame CURRENT at each ``every_ms`` timestamp (floor
    of the exact rational product ms * fps_num / (1000 * fps_den) —
    pure integer arithmetic on the stream's rational frame rate, so
    fractional rates like F30000:1001 make the identical choice on
    every worker; a float product can land one ulp below an exact
    frame boundary), re-encode each sampled luma frame as mono PNG.
    Returns [(frame_ms, png_bytes)]."""
    _w, _h, (fps_num, fps_den), luma = decode_video_parts(payload)
    n = luma.shape[0]
    out: list[tuple[int, bytes]] = []
    for i in range(max_frames):
        ms = i * every_ms
        idx = ms * fps_num // (1000 * fps_den)
        if idx >= n:
            break
        out.append((ms, encode_png(luma[idx][:, :, None])))
    return out


# ---------------------------------------------------------------------------
# Dispatch + feature extraction
# ---------------------------------------------------------------------------

def decode_image(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode to (width, height, channels, pixels). PIL when importable,
    else the stdlib PNG/PPM/BMP parsers above + the pure-numpy baseline
    JPEG decoder (db_spark/llm/jpeg.py)."""
    if _PILImage is not None:  # pragma: no cover
        img = _PILImage.open(io.BytesIO(payload))
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return img.width, img.height, arr.shape[2], arr
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from db_spark.llm.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError(
        "unsupported image format (PNG/PPM/PGM/BMP/JPEG supported)")


def resize_image(payload: bytes, meta: dict, width: int, height: int) -> bytes:
    """REAL image resize: decode (any supported format), nearest-neighbor
    sample with pure integer index arithmetic (``row = y*H // height``),
    re-encode as PNG. Deliberately NOT PIL's filtered resize even when
    PIL is importable — filter kernels differ per library version, while
    integer nearest-neighbor picks the identical source pixel on every
    worker, keeping the 'same features everywhere' contract the decode
    path makes. Registered as the ``image_resize`` transform for
    ``multimodal.resize_media``."""
    w, h, _c, pix = decode_image(payload)
    rows = (np.arange(height, dtype=np.int64) * h) // height
    cols = (np.arange(width, dtype=np.int64) * w) // width
    return encode_png(np.ascontiguousarray(pix[rows][:, cols]))


def image_features(payload: bytes, modality: str = "image") -> list[float]:
    """DECODERS-compatible image featurizer over *decoded pixels*:
    [width, height, channels, mean_ch0, mean_ch1, mean_ch2, stddev,
    entropy8]. Mono images report their single channel mean in ch0 and
    0.0 for the missing channels."""
    if payload is None:
        return []
    w, h, c, pix = decode_image(payload)
    flat = pix.astype(np.float64)
    means = [float(flat[:, :, i].mean()) for i in range(min(c, 3))]
    means += [0.0] * (3 - len(means))
    hist = np.bincount((pix.reshape(-1) >> 5).astype(np.int64), minlength=8)
    p = hist / max(1, hist.sum())
    entropy = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
    return [round(v, 6) for v in
            [float(w), float(h), float(c), *means, float(flat.std()), entropy]]


def audio_features(payload: bytes, modality: str = "audio") -> list[float]:
    """DECODERS-compatible WAV featurizer via stdlib ``wave``:
    [sample_rate, n_channels, duration_ms, rms, zero_cross_rate, peak,
    mean_abs, sample_width]. Samples normalized to [-1, 1]."""
    if payload is None:
        return []
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate, nch = wf.getframerate(), wf.getnchannels()
        width, nframes = wf.getsampwidth(), wf.getnframes()
        frames = wf.readframes(nframes)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"WAV: unsupported sample width {width}")
    samples = np.frombuffer(frames, dtype=dtype).astype(np.float64)
    if width == 1:
        samples -= 128.0
    samples /= float(2 ** (8 * width - 1))
    if samples.size == 0:
        samples = np.zeros(1)
    signs = np.signbit(samples)
    zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) / max(1, samples.size - 1)
    duration_ms = 1000.0 * nframes / max(1, rate)
    return [round(v, 6) for v in [
        float(rate), float(nch), duration_ms,
        float(math.sqrt((samples ** 2).mean())), zcr,
        float(np.abs(samples).max()), float(np.abs(samples).mean()),
        float(width),
    ]]


def install_default_decoders() -> dict[str, str]:
    """Register the real image/audio/video decoders into
    multimodal.DECODERS. Returns {modality: implementation} for
    observability. Video decodes y4m natively (PyAV extends coverage to
    compressed containers when importable); unsupported codecs keep the
    honest NotImplementedError inside decode_video."""
    from db_spark.llm import multimodal

    multimodal.register_decoder("image", image_features)
    multimodal.register_decoder("audio", audio_features)
    multimodal.register_decoder("video", video_features)
    multimodal.register_transform("image_resize", resize_image)
    multimodal.register_frame_extractor("video_frames", extract_video_frames)
    return {
        "image": "PIL" if _PILImage is not None else "stdlib-png/ppm/bmp",
        "audio": "stdlib-wave",
        "video": "PyAV+y4m" if _pyav is not None else "stdlib-y4m",
    }
