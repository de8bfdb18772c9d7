"""Baseline JPEG (ITU-T T.81) codec in pure numpy — no PIL, no libjpeg.

Decoder: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/RSTn/EOI; 8-bit baseline
sequential DCT, 1 component (grayscale) or 3 components (YCbCr) with
arbitrary 1-2 sampling factors (4:4:4, 4:2:2, 4:2:0), interleaved
single scan, restart markers. Progressive (SOF2) and arithmetic coding
are rejected with a clear error — baseline covers MJPEG streams and
the vast majority of camera/web JPEGs.

Encoder: baseline, grayscale or RGB (4:4:4 YCbCr), Annex K example
quantization tables scaled by the libjpeg quality formula (or caller
tables), Annex K "typical" Huffman tables. Exists so fixtures and the
MJPEG-AVI tests need no third-party encoder.

Determinism: the IDCT/DCT are exact float64 matrix products (the 8x8
DCT-II basis is orthonormal) with a single final round+clip, so the
same bytes decode to the same pixels on every worker.

The quantization/Huffman table constants below are the public example
tables from ITU-T T.81 Annex K (K.1, K.2, K.3.3.1, K.3.3.2), reproduced
by every JPEG implementation.

Reference parity note: the reference engine (michalusio/DB) has no
media layer at all — this module is north-star surface for the
multimodal pipeline (see BASELINE.json), plumbed through the same
Arrow-batched ``mapInPandas`` decode path as PNG/WAV/y4m.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------


def _zigzag() -> list[int]:
    order, r, c = [], 0, 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # heading up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # heading down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


ZIGZAG = _zigzag()

# 8x8 DCT-II basis: B[u, x] = c(u) * cos((2x+1) u pi / 16) / 2.
# pixels = B.T @ coeffs @ B;  coeffs = B @ pixels @ B.T  (orthonormal).
_B = np.zeros((8, 8))
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _B[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Annex K.1 / K.2 example quantization tables (natural order applied
# via zigzag at emit/parse time; stored here in zigzag order as in the
# spec listing).
K_LUMA_QUANT_ZZ = [
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
]
K_CHROMA_QUANT_ZZ = [
    17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3.3.1 / K.3.3.2 "typical" Huffman tables: (bits[1..16], values)
K_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
             list(range(12)))
K_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
               list(range(12)))
K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)


def _build_decode_table(bits: list[int], values: list[int]) -> dict:
    """Canonical Huffman: (length, code) -> symbol (T.81 C.2)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict:
    """symbol -> (length, code)."""
    return {sym: lc for lc, sym in _build_decode_table(bits, values).items()}


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-coded-segment reader: 0xFF00 byte stuffing removed; any
    other marker ends the segment (RSTn are consumed by restart())."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._cur = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError(
                    "invalid JPEG: truncated entropy-coded segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError(
                        "invalid JPEG: truncated entropy-coded segment")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:  # a real marker: ECS over — pad with 1-bits (F.2.2.5)
                    self.pos -= 1
                    b = 0xFF
            self._cur = b
            self._nbits = 8
        self._nbits -= 1
        return (self._cur >> self._nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align, consume the RSTn marker."""
        self._nbits = 0
        if (self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2


def _decode_huff(r: _BitReader, table: dict) -> int:
    length, code = 0, 0
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: bad Huffman code")


def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline JPEG to (width, height, channels, pixels
    uint8[h, w, channels]); channels is 1 (grayscale) or 3 (RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None  # (H, W, [(comp_id, h, v, tq), ...])
    restart_interval = 0
    out = None

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("invalid JPEG: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            continue
        seg_len = int.from_bytes(payload[pos:pos + 2], "big")
        seg = payload[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:  # 16-bit table
                    vals = [int.from_bytes(seg[i + 2 * j:i + 2 * j + 2],
                                           "big") for j in range(64)]
                    i += 128
                else:
                    vals = list(seg[i:i + 64])
                    i += 64
                nat = np.zeros(64)
                for j, z in enumerate(ZIGZAG):
                    nat[z] = vals[j]
                quant[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                values = list(seg[i + 17:i + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, values)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            if seg[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            h_img = int.from_bytes(seg[1:3], "big")
            w_img = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * c]))
            frame = (h_img, w_img, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0/SOF1) supported")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = seg[0]
            scan = []  # (comp index, dc table, ac table)
            h_img, w_img, comps = frame
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15
                ci = next(i for i, cc in enumerate(comps) if cc[0] == cs)
                scan.append((ci, huff[(0, td)], huff[(1, ta)]))
            out = _decode_scan(payload, pos + seg_len, frame, scan,
                               quant, restart_interval)
            break
        pos += seg_len

    if out is None:
        raise ValueError("invalid JPEG: no scan data")
    h_img, w_img, comps = frame
    if len(comps) == 1:
        return w_img, h_img, 1, out[0][:h_img, :w_img, None]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for (cid, ch, cv, tq), plane in zip(comps, out):
        if ch != hmax or cv != vmax:  # replicate-upsample chroma
            plane = np.repeat(np.repeat(plane, vmax // cv, axis=0),
                              hmax // ch, axis=1)
        planes.append(plane[:h_img, :w_img].astype(np.float64))
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w_img, h_img, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_scan(data, pos, frame, scan, quant, restart_interval):
    h_img, w_img, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    planes = [np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8))
              for c in comps]
    preds = [0] * len(comps)
    r = _BitReader(data, pos)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.restart()
                preds = [0] * len(comps)
            for ci, dc_tab, ac_tab in scan:
                _, ch, cv, tq = comps[ci]
                q = quant[tq]
                for bv in range(cv):
                    for bh in range(ch):
                        coef = np.zeros(64)
                        t = _decode_huff(r, dc_tab)
                        diff = _extend(r.receive(t), t) if t else 0
                        preds[ci] += diff
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, ac_tab)
                            run, size = rs >> 4, rs & 15
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "invalid JPEG: AC index overrun")
                            coef[ZIGZAG[k]] = _extend(r.receive(size), size)
                            k += 1
                        block = coef.reshape(8, 8) * q
                        px = _B.T @ block @ _B + 128.0
                        px = np.clip(np.round(px), 0, 255)
                        y0 = (my * cv + bv) * 8
                        x0 = (mx * ch + bh) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu += 1
    return [p.astype(np.uint8) for p in planes]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._cur = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._cur = (self._cur << 1) | ((value >> i) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self.out.append(self._cur)
                if self._cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._cur = 0
                self._nbits = 0

    def flush(self) -> None:
        if self._nbits:
            self.write((1 << (8 - self._nbits)) - 1, 8 - self._nbits)


def _scale_quant(zz_table: list[int], quality: int) -> list[int]:
    """libjpeg quality scaling of an Annex K table (zigzag order)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(max((v * scale + 50) // 100, 1), 255) for v in zz_table]


def _encode_block(w: _BitWriter, block: np.ndarray, q_nat: np.ndarray,
                  pred: int, dc_tab: dict, ac_tab: dict) -> int:
    coef_nat = np.round((_B @ (block - 128.0) @ _B.T) / q_nat).astype(int)
    zz = [int(coef_nat.flat[z]) for z in ZIGZAG]
    diff = zz[0] - pred
    t = diff if diff >= 0 else -diff
    size = int(t).bit_length()
    length, code = dc_tab[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_tab[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size = int(abs(v)).bit_length()
        length, code = ac_tab[(run << 4) | size]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        length, code = ac_tab[0x00]  # EOB
        w.write(code, length)
    return zz[0]


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                luma_quant_zz: list[int] | None = None) -> bytes:
    """Encode uint8 [h, w] / [h, w, 1] grayscale or [h, w, 3] RGB to a
    baseline JPEG (4:4:4, Annex K typical Huffman tables). Pass
    ``luma_quant_zz`` (64 values, zigzag order) to pin the luma table
    exactly — e.g. all-8 makes flat DC-only tiles decode EXACTLY
    (dc = 8*(g-128)/8 = g-128, IDCT of a flat block is flat)."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h_img, w_img, nch = px.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if luma_quant_zz is None:
        luma_zz = _scale_quant(K_LUMA_QUANT_ZZ, quality)
    else:
        luma_zz = list(luma_quant_zz)
    chroma_zz = _scale_quant(K_CHROMA_QUANT_ZZ, quality)
    lq_nat = np.zeros(64)
    cq_nat = np.zeros(64)
    for j, z in enumerate(ZIGZAG):
        lq_nat[z] = luma_zz[j]
        cq_nat[z] = chroma_zz[j]
    lq_nat = lq_nat.reshape(8, 8)
    cq_nat = cq_nat.reshape(8, 8)

    if nch == 1:
        planes = [px[:, :, 0].astype(np.float64)]
    else:
        rgb = px.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    seg(0xDB, bytes([0x00]) + bytes(luma_zz))
    if nch == 3:
        seg(0xDB, bytes([0x01]) + bytes(chroma_zz))
    sof = bytearray([8])
    sof += h_img.to_bytes(2, "big") + w_img.to_bytes(2, "big")
    sof.append(nch)
    for c in range(nch):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    seg(0xC0, bytes(sof))
    for tc_th, (bits, values) in (
            ((0x00, K_DC_LUMA)), ((0x10, K_AC_LUMA)),
            *(((0x01, K_DC_CHROMA), (0x11, K_AC_CHROMA))
              if nch == 3 else ())):
        seg(0xC4, bytes([tc_th] + bits + values))
    sos = bytearray([nch])
    for c in range(nch):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    enc_dc = [_build_encode_table(*K_DC_LUMA),
              _build_encode_table(*K_DC_CHROMA)]
    enc_ac = [_build_encode_table(*K_AC_LUMA),
              _build_encode_table(*K_AC_CHROMA)]
    w = _BitWriter()
    preds = [0] * nch
    blocks_y = -(-h_img // 8)
    blocks_x = -(-w_img // 8)
    padded = []
    for p in planes:
        pad = np.empty((blocks_y * 8, blocks_x * 8))
        pad[:h_img, :w_img] = p
        pad[h_img:, :w_img] = p[h_img - 1:h_img, :]  # edge-replicate
        pad[:, w_img:] = pad[:, w_img - 1:w_img]
        padded.append(pad)
    for by in range(blocks_y):
        for bx in range(blocks_x):
            for ci in range(nch):
                tbl = 0 if ci == 0 else 1
                preds[ci] = _encode_block(
                    w, padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                    lq_nat if ci == 0 else cq_nat,
                    preds[ci], enc_dc[tbl], enc_ac[tbl])
    w.flush()
    out.extend(w.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
