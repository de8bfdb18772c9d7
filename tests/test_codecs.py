"""Real media decode paths (db_spark/llm/codecs.py): stdlib PNG/PPM/BMP
image parsing and WAV audio parsing, exercised end-to-end through the
Arrow-batched extract_features pipeline."""

import io
import math
import struct
import wave

import numpy as np
import pytest

from db_spark.llm import codecs, multimodal


def _checker(w, h, c):
    """Deterministic checkerboard pixels."""
    y, x = np.mgrid[0:h, 0:w]
    base = ((x + y) % 2 * 255).astype(np.uint8)
    return np.stack([np.roll(base, i, axis=1) for i in range(c)], axis=2)


def _wav_bytes(rate=8000, freq=440.0, ms=250, width=2):
    n = rate * ms // 1000
    t = np.arange(n) / rate
    samples = (np.sin(2 * math.pi * freq * t) * 0.5 * (2 ** (8 * width - 1) - 1))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        wf.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def test_png_round_trip_all_color_types():
    for c in (1, 2, 3, 4):
        pix = _checker(6, 4, c)
        w, h, ch, got = codecs.decode_png(codecs.encode_png(pix))
        assert (w, h, ch) == (6, 4, c)
        assert np.array_equal(got, pix)


def test_png_filters_reconstruct():
    """Exercise Sub/Up/Average/Paeth reconstruction by re-encoding with
    each filter type manually and decoding."""
    import zlib

    pix = _checker(8, 5, 3)
    stride = 8 * 3
    for ftype in (0, 1, 2, 3, 4):
        raw = bytearray()
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(5):
            line = pix[y].reshape(-1).astype(np.int32)
            raw.append(ftype)
            if ftype == 0:
                enc = line
            elif ftype == 1:
                left = np.concatenate([np.zeros(3, np.int32), line[:-3]])
                enc = (line - left) % 256
            elif ftype == 2:
                enc = (line - prev) % 256
            elif ftype == 3:
                left = np.concatenate([np.zeros(3, np.int32), line[:-3]])
                enc = (line - ((left + prev) >> 1)) % 256
            else:  # paeth
                enc = np.zeros(stride, np.int32)
                for x in range(stride):
                    a = int(line[x - 3]) if x >= 3 else 0
                    b = int(prev[x])
                    cc = int(prev[x - 3]) if x >= 3 else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    enc[x] = (line[x] - pred) % 256
            raw.extend(enc.astype(np.uint8).tobytes())
            prev = line

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 5, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
        w, h, ch, got = codecs.decode_png(png)
        assert np.array_equal(got, pix), f"filter {ftype}"


def test_ppm_and_pgm_decode():
    pix = _checker(5, 3, 3)
    ppm = b"P6\n# comment\n5 3\n255\n" + pix.tobytes()
    w, h, c, got = codecs.decode_ppm(ppm)
    assert (w, h, c) == (5, 3, 3)
    assert np.array_equal(got, pix)
    mono = _checker(5, 3, 1)
    pgm = b"P5 5 3 255\n" + mono.tobytes()
    assert np.array_equal(codecs.decode_ppm(pgm)[3], mono)


def test_bmp_decode_24bit():
    pix = _checker(4, 2, 3)
    row_bytes = ((4 * 3 + 3) // 4) * 4
    data = bytearray()
    for y in range(1, -1, -1):  # bottom-up
        row = pix[y][:, ::-1].tobytes()  # RGB -> BGR
        data.extend(row + b"\x00" * (row_bytes - len(row)))
    info = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54) + info
    bmp = header + bytes(data)
    w, h, c, got = codecs.decode_bmp(bmp)
    assert (w, h, c) == (4, 2, 3)
    assert np.array_equal(got, pix)


def test_image_features_values():
    pix = np.full((4, 4, 3), 128, dtype=np.uint8)
    feats = codecs.image_features(codecs.encode_png(pix))
    assert feats[:3] == [4.0, 4.0, 3.0]
    assert feats[3:6] == [128.0, 128.0, 128.0]
    assert feats[6] == 0.0  # stddev of constant image
    assert feats[7] == 0.0  # single-bucket entropy


def test_audio_features_sine():
    feats = codecs.audio_features(_wav_bytes())
    rate, nch, dur_ms, rms, zcr, peak, mean_abs, width = feats
    assert (rate, nch, width) == (8000.0, 1.0, 2.0)
    assert dur_ms == 250.0
    # 0.5-amplitude sine: rms = 0.5/sqrt(2), zcr ~ 2*440/8000
    assert abs(rms - 0.5 / math.sqrt(2)) < 0.01
    assert abs(zcr - 2 * 440 / 8000) < 0.01
    assert 0.49 < peak <= 0.5


def test_extract_features_real_decoders_in_pipeline(spark):
    """End-to-end: real PNG + WAV payloads through the Arrow-batched
    mapInPandas pipeline, per-row modality dispatch."""
    png = codecs.encode_png(_checker(8, 8, 3))
    wav = _wav_bytes()
    rows = [
        (1, "image", bytearray(png), ("image/png", 8, 8, None, None)),
        (2, "audio", bytearray(wav), ("audio/wav", None, None, 250, 8000)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in
             multimodal.extract_features(df).collect()}
    assert feats[1]["features"][:3] == [8.0, 8.0, 3.0]
    assert feats[2]["features"][0] == 8000.0
    assert feats[1]["n_bytes"] == len(png)
    # implementation registry is honest about what's real
    assert multimodal.DECODER_IMPLS["audio"] == "stdlib-wave"
    assert multimodal.DECODER_IMPLS["video"] in ("stdlib-y4m", "PyAV+y4m")


def test_fake_decoder_path_still_available(spark):
    rows = [(1, "image", bytearray(b"\x00\x20\x40" * 10), None)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(df, decoder="fake").collect()
    assert len(feats[0]["features"]) == 8


def test_decode_image_dispatch_errors():
    with pytest.raises(ValueError, match="unsupported image format"):
        codecs.decode_image(b"not an image at all")


def test_bmp_decode_32bit_rgba_channel_order():
    """ADVICE r3: a blanket [::-1] turned BGRA into ARGB (alpha in ch0);
    the explicit reorder must yield RGBA so mean_ch0 is red in every
    decode path."""
    pix = _checker(4, 2, 4)
    pix[:, :, 3] = 255  # opaque alpha, distinct from the checker channels
    row_bytes = 4 * 4  # 32bpp rows are already 4-byte aligned
    data = bytearray()
    for y in range(1, -1, -1):  # bottom-up
        data.extend(pix[y][:, [2, 1, 0, 3]].tobytes())  # RGBA -> BGRA
    info = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 32, 0, len(data),
                       2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54) + info
    w, h, c, got = codecs.decode_bmp(header + bytes(data))
    assert (w, h, c) == (4, 2, 4)
    assert np.array_equal(got, pix)  # RGBA, not ARGB


def test_resize_image_nearest_neighbor_exact():
    pix = _checker(8, 8, 3)
    out = codecs.resize_image(codecs.encode_png(pix), {}, 4, 4)
    w, h, c, got = codecs.decode_image(out)
    assert (w, h, c) == (4, 4, 3)
    # integer nearest-neighbor: out[y, x] == src[y*8//4, x*8//4]
    rows = (np.arange(4) * 8) // 4
    expect = pix[rows][:, rows]
    assert np.array_equal(got, expect)


def test_resize_image_upscale_and_mono():
    pix = _checker(3, 2, 1)
    out = codecs.resize_image(codecs.encode_png(pix), {}, 6, 4)
    w, h, c, got = codecs.decode_image(out)
    assert (w, h, c) == (6, 4, 1)
    rows = (np.arange(4) * 2) // 4
    cols = (np.arange(6) * 3) // 6
    assert np.array_equal(got, pix[rows][:, cols])


def test_resize_media_real_transform_in_pipeline(spark):
    from db_spark.llm import multimodal as mm

    png = codecs.encode_png(_checker(8, 8, 3))
    df = spark.createDataFrame(
        [(1, "image", png, ("image/png", 8, 8, None, None))],
        mm.MEDIA_SCHEMA)
    out = mm.resize_media(df, 4, 4, transform="image_resize").collect()[0]
    w, h, c, got = codecs.decode_image(bytes(out["payload"]))
    assert (w, h) == (4, 4)
    assert out["meta"]["width"] == 4 and out["meta"]["height"] == 4


# ---------------------------------------------------------------------------
# Video: y4m decode, features, frame sampling
# ---------------------------------------------------------------------------

def _video_frames(n=6, w=8, h=4):
    """n luma frames with a deterministic per-frame gradient shift."""
    base = (np.arange(h * w, dtype=np.uint8).reshape(h, w) * 7) % 256
    return np.stack([(base + 10 * i) % 256 for i in range(n)]).astype(np.uint8)


def test_y4m_round_trip_mono():
    frames = _video_frames()
    w, h, fps, got = codecs.decode_y4m(codecs.encode_y4m(frames, (25, 1)))
    assert (w, h, fps) == (8, 4, 25.0)
    assert np.array_equal(got, frames)


def test_y4m_chroma_stride_420_and_444():
    """Hand-built C420/C444 streams: the parser must step over chroma
    planes to land each FRAME marker exactly."""
    y0 = np.full((4, 8), 50, np.uint8)
    y1 = np.full((4, 8), 200, np.uint8)
    for cs, cdiv in (("420jpeg", 4), ("444", 1)):
        chroma = b"\x80" * (2 * (8 * 4 // cdiv))
        payload = (f"YUV4MPEG2 W8 H4 F30000:1001 Ip A1:1 C{cs}\n".encode()
                   + b"FRAME\n" + y0.tobytes() + chroma
                   + b"FRAME\n" + y1.tobytes() + chroma)
        w, h, fps, got = codecs.decode_y4m(payload)
        assert (w, h) == (8, 4)
        assert abs(fps - 29.97) < 0.01
        assert np.array_equal(got[0], y0) and np.array_equal(got[1], y1)


def test_y4m_error_paths():
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        codecs.decode_y4m(b"RIFF....")
    with pytest.raises(ValueError, match="unsupported colorspace"):
        codecs.decode_y4m(b"YUV4MPEG2 W2 H2 F30:1 C420p10\nFRAME\n" + b"\x00" * 6)
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_y4m(b"YUV4MPEG2 W4 H4 F30:1 Cmono\nFRAME\n" + b"\x00" * 3)


def test_y4m_header_only_stream_raises():
    with pytest.raises(ValueError, match="no frames"):
        codecs.decode_y4m(b"YUV4MPEG2 W4 H4 F30:1 Cmono\n")


def test_fractional_fps_frame_index_is_exact():
    """The sampler must use ms * fps_num // (1000 * fps_den), never a
    float product: for fractional rates the float can land one ulp
    below an exact boundary and pick the previous frame. Witness (found
    by search): F43875:972 at ms=5616288 — exact index 253513, float
    index 253512. Then the behavioral check: F30000:1001 at ms=1001
    lands exactly on frame 30."""
    num, den, ms = 43875, 972, 5616288
    assert ms * num // (1000 * den) == 253513
    assert int(ms * (num / den)) // 1000 == 253512  # the float bug
    frames = np.stack([np.full((2, 2), i, np.uint8) for i in range(32)])
    payload = codecs.encode_y4m(frames, (30000, 1001))
    got = codecs.extract_video_frames(payload, {}, every_ms=1001,
                                      max_frames=2)
    assert [ms for ms, _ in got] == [0, 1001]
    # decode the sampled PNGs back to pixels: frame 0 then frame 30
    for (ms, png), want in zip(got, (0, 30)):
        _w, _h, _c, px = codecs.decode_image(png)
        assert int(px.flat[0]) == want, (ms, int(px.flat[0]))


def test_compressed_video_path_with_pyav():
    """Exercises the PyAV branch end-to-end so it isn't dead-on-arrival
    in an environment that has a codec library; skipped here."""
    av = pytest.importorskip("av")
    buf = io.BytesIO()
    frames = _video_frames(n=4, w=16, h=16)
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=10)
        stream.width, stream.height = 16, 16
        stream.pix_fmt = "yuv420p"
        for f in frames:
            vf = av.VideoFrame.from_ndarray(
                np.repeat(f[:, :, None], 3, axis=2), format="rgb24")
            container.mux(stream.encode(vf))
        container.mux(stream.encode())
    w, h, (num, den), luma = codecs.decode_video_parts(buf.getvalue())
    assert (w, h) == (16, 16) and num // den == 10
    assert luma.shape[0] == 4
    feats = codecs.video_features(buf.getvalue())
    assert feats[0] == 16.0 and feats[2] == 4.0


def test_video_features_values():
    """Exact values: static pair of frames -> motion equals the uniform
    luma delta; duration from n/fps."""
    f0 = np.full((4, 8), 100, np.uint8)
    f1 = np.full((4, 8), 130, np.uint8)
    feats = codecs.video_features(codecs.encode_y4m(np.stack([f0, f1]), (10, 1)))
    assert feats[:5] == [8.0, 4.0, 2.0, 10.0, 200.0]
    assert feats[5] == 115.0          # mean luma
    assert feats[6] == 15.0           # std of {100, 130}
    assert feats[7] == 30.0           # motion: |130-100|
    single = codecs.video_features(codecs.encode_y4m(f0[None], (10, 1)))
    assert single[2] == 1.0 and single[7] == 0.0


def test_video_decode_dispatch_honest_without_pyav():
    """Non-y4m compressed payloads: PyAV path when importable, honest
    NotImplementedError otherwise."""
    mp4ish = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64
    if codecs._pyav is None:
        with pytest.raises(NotImplementedError, match="PyAV"):
            codecs.decode_video(mp4ish)
    else:  # pragma: no cover - PyAV absent in this container
        with pytest.raises(Exception):
            codecs.decode_video(mp4ish)  # junk body still fails cleanly


def test_extract_features_video_in_pipeline(spark):
    """Real y4m payload through the Arrow-batched modality-dispatch
    pipeline alongside image/audio rows."""
    vid = codecs.encode_y4m(_video_frames(), (30, 1))
    png = codecs.encode_png(_checker(8, 8, 3))
    rows = [
        (1, "video", bytearray(vid), ("video/x-y4m", 8, 4, 200, None)),
        (2, "image", bytearray(png), ("image/png", 8, 8, None, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in
             multimodal.extract_features(df).collect()}
    assert feats[1]["features"][:4] == [8.0, 4.0, 6.0, 30.0]
    assert feats[2]["features"][:3] == [8.0, 8.0, 3.0]


def test_sample_frames_real_video_extractor(spark):
    """sample_frames(extractor='video_frames'): y4m decoded, sampled at
    the ms stride, PNG-framed — pixel-exact against the source luma."""
    frames = _video_frames(n=10)          # 10 frames @ 5 fps -> 2000 ms
    vid = codecs.encode_y4m(frames, (5, 1))
    df = spark.createDataFrame(
        [(7, "video", bytearray(vid), ("video/x-y4m", 8, 4, 2000, None))],
        multimodal.MEDIA_SCHEMA)
    out = multimodal.sample_frames(
        df, every_ms=600, max_frames=4, extractor="video_frames").collect()
    got = sorted((r["frame_idx"], r["frame_ms"]) for r in out)
    # 600 ms stride at 5 fps: frame index = ms*5//1000 -> 0, 3, 6, 9
    assert got == [(0, 0), (1, 600), (2, 1200), (3, 1800)]
    for r in out:
        _w, _h, _c, pix = codecs.decode_image(bytes(r["payload"]))
        src = frames[int(r["frame_ms"]) * 5 // 1000]
        assert np.array_equal(pix[:, :, 0], src)


def test_sample_frames_default_slicing_unchanged(spark):
    """The format-agnostic byte-slicing default still works (no
    extractor arg) — regression guard for the new registry plumbing."""
    df = spark.createDataFrame(
        [(1, "video", bytearray(b"x" * 64), (None, None, None, 4000, None))],
        multimodal.MEDIA_SCHEMA)
    out = multimodal.sample_frames(df, every_ms=1000, max_frames=4).collect()
    assert len(out) == 4
    assert b"".join(bytes(r["payload"]) for r in
                    sorted(out, key=lambda r: r["frame_idx"])) == b"x" * 64


# ---------------------------------------------------------------------------
# baseline JPEG (db_spark/llm/jpeg.py) + MJPEG-in-AVI (r10)
# ---------------------------------------------------------------------------

from db_spark.llm import jpeg as J


def _bits_to_ecs(bits: str) -> bytes:
    """Hand bit-assembly independent of the encoder's _BitWriter: pack
    a bit string MSB-first, pad with 1s, apply 0xFF00 stuffing."""
    bits = bits + "1" * (-len(bits) % 8)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = int(bits[i:i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dht(tc_th, table):
    bits, values = table
    return _seg(0xC4, bytes([tc_th] + bits + values))


def test_jpeg_decoder_against_hand_assembled_grayscale():
    """Decoder correctness independent of the encoder: a single 8x8
    grayscale MCU hand-assembled bit by bit from the T.81 spec. Flat
    g=148 with an all-8 quant table: DC = (148-128)*8/8 = 20 -> DC
    size 5 (std luma DC code '110'), magnitude bits '10100', EOB
    '1010'. Any shared encoder/decoder sign or table bug cannot cancel
    here."""
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([8] * 64))
        + _seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        + _dht(0x00, J.K_DC_LUMA) + _dht(0x10, J.K_AC_LUMA)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + _bits_to_ecs("110" + "10100" + "1010")
        + b"\xff\xd9")
    w, h, c, px = J.decode_jpeg(payload)
    assert (w, h, c) == (8, 8, 1)
    assert (px[:, :, 0] == 148).all()


def test_jpeg_decoder_hand_assembled_420_color():
    """4:2:0 subsampled color MCU (the encoder never emits subsampling,
    so this path is only reachable from foreign JPEGs): 16x16, Y=100,
    Cb=168, Cr=104, all DC-only with all-8 quant. Scan = 4 Y blocks
    (diff -28 then three 0s) + Cb (40) + Cr (-24); chroma uses the std
    chroma tables (EOB '00'). Expected RGB is the analytic BT.601
    inverse: (66, 103, 171)."""
    y_bits = "110" + "00011" + "1010" + ("00" + "1010") * 3
    cb_bits = "111110" + "101000" + "00"
    cr_bits = "11110" + "00111" + "00"
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([8] * 64))
        + _seg(0xDB, bytes([0x01]) + bytes([8] * 64))
        + _seg(0xC0, bytes([8, 0, 16, 0, 16, 3,
                            1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
        + _dht(0x00, J.K_DC_LUMA) + _dht(0x10, J.K_AC_LUMA)
        + _dht(0x01, J.K_DC_CHROMA) + _dht(0x11, J.K_AC_CHROMA)
        + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        + _bits_to_ecs(y_bits + cb_bits + cr_bits)
        + b"\xff\xd9")
    w, h, c, px = J.decode_jpeg(payload)
    assert (w, h, c) == (16, 16, 3)
    assert (px[:, :, 0] == 66).all()
    assert (px[:, :, 1] == 103).all()
    assert (px[:, :, 2] == 171).all()


def test_jpeg_flat_pinned_quant_is_exact():
    for g in (0, 1, 77, 128, 254, 255):
        img = np.full((8, 8), g, np.uint8)
        w, h, c, out = J.decode_jpeg(
            J.encode_jpeg(img, luma_quant_zz=[8] * 64))
        assert (w, h, c) == (8, 8, 1)
        assert (out[:, :, 0] == g).all()


def test_jpeg_gray_gradient_round_trip_close():
    img = np.linspace(0, 255, 24 * 16).reshape(24, 16).astype(np.uint8)
    w, h, c, out = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert (w, h, c) == (16, 24, 1)
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 4


def test_jpeg_rgb_smooth_round_trip_close():
    xx, yy = np.meshgrid(np.arange(21), np.arange(13))
    img = np.stack([np.clip(xx * 8, 0, 255), np.clip(yy * 11, 0, 255),
                    np.clip(xx * 3 + yy * 3, 0, 255)], -1).astype(np.uint8)
    w, h, c, out = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert (w, h, c) == (21, 13, 3)  # non-multiple-of-8 dims both axes
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 12


def test_jpeg_rejects_progressive_and_garbage():
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"nope")
    prog = (b"\xff\xd8"
            + _seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])))
    with pytest.raises(ValueError, match="baseline"):
        J.decode_jpeg(prog)


def test_avi_mjpeg_round_trip_exact_and_features():
    f = [np.full((16, 24), v, np.uint8) for v in (40, 90, 200)]
    avi = codecs.encode_avi_mjpeg(f, fps=(10, 1), luma_quant_zz=[8] * 64)
    w, h, fps, luma = codecs.decode_avi_mjpeg_parts(avi)
    assert (w, h, fps) == (24, 16, (10, 1))
    assert (luma[0] == 40).all() and (luma[2] == 200).all()
    # generic dispatcher picks the RIFF path without PyAV
    w2, h2, f2, luma2 = codecs.decode_video_parts(avi)
    assert np.array_equal(luma2, luma)
    feats = codecs.video_features(avi)
    # mean (40+90+200)/3 = 110; motion (50+110)/2 = 80; 3 frames @10fps
    assert feats[:6] == [24.0, 16.0, 3.0, 10.0, 300.0, 110.0]
    assert feats[7] == 80.0


def test_avi_mjpeg_rgb_frames_lumaize():
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[:, :, 0] = 255  # pure red -> BT.601 luma 76
    avi = codecs.encode_avi_mjpeg([rgb], fps=(5, 1), quality=100)
    _, _, _, luma = codecs.decode_avi_mjpeg_parts(avi)
    assert abs(int(luma[0].mean()) - 76) <= 2


def test_decode_image_jpeg_dispatch():
    img = np.full((8, 8), 77, np.uint8)
    w, h, c, px = codecs.decode_image(
        J.encode_jpeg(img, luma_quant_zz=[8] * 64))
    assert (w, h, c) == (8, 8, 1) and (px[:, :, 0] == 77).all()


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError, match="AVI"):
        codecs.decode_avi_mjpeg_parts(b"RIFFxxxxWAVE")


def test_jpeg_restart_markers_reset_dc_predictor():
    """DRI=1 + RST0 between two MCUs: each MCU's DC is coded against a
    RESET predictor (both diffs absolute), and the reader must
    byte-align and consume the marker. Hand-assembled."""
    ecs1 = _bits_to_ecs("110" + "10100" + "1010")   # flat 148 (dc +20)
    ecs2 = _bits_to_ecs("110" + "00011" + "1010")   # flat 100 (dc -28)
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([8] * 64))
        + _seg(0xC0, bytes([8, 0, 8, 0, 16, 1, 1, 0x11, 0]))
        + _dht(0x00, J.K_DC_LUMA) + _dht(0x10, J.K_AC_LUMA)
        + _seg(0xDD, (1).to_bytes(2, "big"))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + ecs1 + b"\xff\xd0" + ecs2
        + b"\xff\xd9")
    w, h, c, px = J.decode_jpeg(payload)
    assert (w, h, c) == (16, 8, 1)
    assert (px[:, :8, 0] == 148).all()
    assert (px[:, 8:, 0] == 100).all()


def test_jpeg_decoder_hand_assembled_422_color():
    """4:2:2 (Y h=2,v=1): one MCU = 2 Y blocks + Cb + Cr for a 16x8
    image; chroma replicates horizontally only. Same analytic BT.601
    expectations as the 4:2:0 test."""
    y_bits = "110" + "00011" + "1010" + "00" + "1010"   # -28 then diff 0
    cb_bits = "111110" + "101000" + "00"                 # +40
    cr_bits = "11110" + "00111" + "00"                   # -24
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([8] * 64))
        + _seg(0xDB, bytes([0x01]) + bytes([8] * 64))
        + _seg(0xC0, bytes([8, 0, 8, 0, 16, 3,
                            1, 0x21, 0, 2, 0x11, 1, 3, 0x11, 1]))
        + _dht(0x00, J.K_DC_LUMA) + _dht(0x10, J.K_AC_LUMA)
        + _dht(0x01, J.K_DC_CHROMA) + _dht(0x11, J.K_AC_CHROMA)
        + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        + _bits_to_ecs(y_bits + cb_bits + cr_bits)
        + b"\xff\xd9")
    w, h, c, px = J.decode_jpeg(payload)
    assert (w, h, c) == (16, 8, 3)
    assert (px[:, :, 0] == 66).all()
    assert (px[:, :, 1] == 103).all()
    assert (px[:, :, 2] == 171).all()


# ---------------------------------------------------------------------------
# r11 robustness: non-stream-0 video, vids-without-frames, truncated ECS
# ---------------------------------------------------------------------------


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + len(body).to_bytes(4, "little") + body + \
        (b"\x00" if len(body) & 1 else b"")


def _lst(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def _avi(strls: bytes, movi_body: bytes) -> bytes:
    hdrl = _lst(b"hdrl", _chunk(b"avih", bytes(56)) + strls)
    body = b"AVI " + hdrl + _lst(b"movi", movi_body)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _vids_strh(rate=12, scale=1) -> bytes:
    import struct as _s
    return _chunk(b"strh", b"vids" + b"MJPG"
                  + _s.pack("<IHHIIIIIII", 0, 0, 0, 0, scale, rate,
                            0, 1, 0, 0xFFFFFFFF)
                  + _s.pack("<I", 0) + _s.pack("<4H", 0, 0, 8, 8))


def test_avi_video_stream_not_first():
    """Audio-first AVI: the vids strh is stream 1, so frames live in
    '01dc' chunks — the decoder must follow the strh appearance index
    instead of assuming stream 0 (r10 ADVICE)."""
    frame = J.encode_jpeg(np.full((8, 8), 148, np.uint8),
                          luma_quant_zz=[8] * 64)
    auds = _lst(b"strl", _chunk(b"strh", b"auds" + bytes(52)))
    vids = _lst(b"strl", _vids_strh())
    avi = _avi(auds + vids, _chunk(b"01dc", frame))
    w, h, fps, luma = codecs.decode_avi_mjpeg_parts(avi)
    assert (w, h, fps) == (8, 8, (12, 1))
    assert luma.shape == (1, 8, 8) and (luma[0] == 148).all()
    # and a stray '00dc' chunk (the audio stream's data) is NOT decoded
    avi2 = _avi(auds + vids,
                _chunk(b"00dc", b"not a jpeg") + _chunk(b"01dc", frame))
    _, _, _, luma2 = codecs.decode_avi_mjpeg_parts(avi2)
    assert luma2.shape == (1, 8, 8)


def test_avi_vids_stream_without_frames_raises():
    """A declared vids stream with zero frame chunks is a malformed
    payload, not an empty video — silent (0, 0) would cascade into NaN
    features downstream (r10 ADVICE)."""
    vids = _lst(b"strl", _vids_strh())
    with pytest.raises(ValueError, match="no\\s+decodable"):
        codecs.decode_avi_mjpeg_parts(_avi(vids, b""))
    # no vids stream at all stays the tolerant empty-grid path
    auds = _lst(b"strl", _chunk(b"strh", b"auds" + bytes(52)))
    w, h, fps, luma = codecs.decode_avi_mjpeg_parts(_avi(auds, b""))
    assert (w, h) == (0, 0) and luma.size == 0


def test_jpeg_truncated_ecs_raises_value_error():
    """Truncated entropy-coded data must raise the module's documented
    ValueError contract, not a raw IndexError (r10 ADVICE)."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 16), np.uint8)
    full = J.encode_jpeg(img)
    sos_at = full.index(b"\xff\xda")
    ecs_at = sos_at + 2 + int.from_bytes(full[sos_at + 2:sos_at + 4], "big")
    for cut in (ecs_at + 1, len(full) - 8):
        with pytest.raises(ValueError, match="invalid JPEG"):
            J.decode_jpeg(full[:cut])


def test_jpeg_decoder_hand_assembled_411_color():
    """4:1:1 (Y h=4,v=1): one MCU = 4 Y blocks + Cb + Cr for a 32x8
    image; chroma replicates 4x horizontally only — the remaining
    common baseline subsampling after 4:2:0/4:2:2/4:4:4/gray. Same
    analytic BT.601 expectations as the 4:2:2 test (flat Y=100,
    Cb=+40, Cr=-24)."""
    y_bits = ("110" + "00011" + "1010"            # block 1: dc -28
              + ("00" + "1010") * 3)              # blocks 2-4: diff 0
    cb_bits = "111110" + "101000" + "00"          # +40
    cr_bits = "11110" + "00111" + "00"            # -24
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([8] * 64))
        + _seg(0xDB, bytes([0x01]) + bytes([8] * 64))
        + _seg(0xC0, bytes([8, 0, 8, 0, 32, 3,
                            1, 0x41, 0, 2, 0x11, 1, 3, 0x11, 1]))
        + _dht(0x00, J.K_DC_LUMA) + _dht(0x10, J.K_AC_LUMA)
        + _dht(0x01, J.K_DC_CHROMA) + _dht(0x11, J.K_AC_CHROMA)
        + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        + _bits_to_ecs(y_bits + cb_bits + cr_bits)
        + b"\xff\xd9")
    w, h, c, px = J.decode_jpeg(payload)
    assert (w, h, c) == (32, 8, 3)
    assert (px[:, :, 0] == 66).all()
    assert (px[:, :, 1] == 103).all()
    assert (px[:, :, 2] == 171).all()


def test_avi_movi_before_hdrl_two_pass():
    """Malformed-but-seen-in-the-wild muxing: LIST 'movi' precedes
    LIST 'hdrl'. The two-pass walk resolves the vids stream index from
    the whole file BEFORE decoding any frame chunk, so an audio-first
    AVI with movi-first layout still decodes only '01dc' and never
    feeds the audio stream's '00dc' bytes to the JPEG decoder
    (r11 ADVICE)."""
    frame = J.encode_jpeg(np.full((8, 8), 90, np.uint8),
                          luma_quant_zz=[8] * 64)
    auds = _lst(b"strl", _chunk(b"strh", b"auds" + bytes(52)))
    vids = _lst(b"strl", _vids_strh())
    hdrl = _lst(b"hdrl", _chunk(b"avih", bytes(56)) + auds + vids)
    movi = _lst(b"movi",
                _chunk(b"00dc", b"not a jpeg") + _chunk(b"01dc", frame))
    body = b"AVI " + movi + hdrl  # movi FIRST
    avi = b"RIFF" + len(body).to_bytes(4, "little") + body
    w, h, fps, luma = codecs.decode_avi_mjpeg_parts(avi)
    assert (w, h, fps) == (8, 8, (12, 1))
    assert luma.shape == (1, 8, 8) and (luma[0] == 90).all()
    # stray dc chunks with NO vids strh anywhere are never decoded
    avi2 = _avi(auds, _chunk(b"00dc", b"not a jpeg"))
    w2, h2, _, luma2 = codecs.decode_avi_mjpeg_parts(avi2)
    assert (w2, h2) == (0, 0) and luma2.size == 0
