"""Pure-numpy baseline JPEG (JFIF) codec — no PIL/libjpeg in this
container, so this is a real, from-spec implementation of ITU-T T.81
baseline sequential DCT, closing the reference's image parity
(/root/reference/tfdata/core/example.go:131-146 decodes JPEG via Go's
stdlib `image/jpeg`; its tar fixtures are .jpg).

Scope:
- encode: 8-bit gray or RGB, quality 1-100 (libjpeg-style quant scaling),
  4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 / 4:1:1 chroma subsampling, standard
  Annex K quant + Huffman tables, interleaved single scan.
- decode: baseline SOF0/SOF1 AND progressive SOF2 (spectral selection +
  successive approximation, DC/AC first and refinement scans, EOB runs —
  T.81 G.1.2/G.2), 1 or 3 components, any divisible sampling factors up
  to the spec's 4x4 (4:4:4 / 4:2:2 / 4:2:0 / 4:1:1 / ...; fractional
  ratios raise), Huffman tables from the stream (16-bit-peek
  lookup tables, cached by table bytes), restart intervals (DRI/RSTn),
  byte unstuffing. Validated against externally-produced progressive
  JPEGs (tests/test_jpeg.py golden fixtures).

Cost model: all pixel math (DCT/IDCT, quantization, color transform,
up/downsampling) is vectorized over every block of the image at once;
only the entropy coder walks symbols in Python (inherently sequential),
~a few k symbols for the synthetic fixture sizes.
"""

from __future__ import annotations

import numpy as np

# -- constants (ITU-T T.81 Annex K) -----------------------------------------

_QL = np.array([  # K.1 luminance quant
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

_QC = np.array([  # K.2 chrominance quant
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _zigzag_order() -> np.ndarray:
    """ZZ[k] = raster index of the k-th coefficient in zigzag scan order."""
    out = np.empty(64, dtype=np.int64)
    i = j = 0
    for k in range(64):
        out[k] = i * 8 + j
        if (i + j) % 2 == 0:  # moving up-right
            if j == 7:
                i += 1
            elif i == 0:
                j += 1
            else:
                i -= 1
                j += 1
        else:  # moving down-left
            if i == 7:
                j += 1
            elif j == 0:
                i += 1
            else:
                i += 1
                j -= 1
    return out


_ZZ = _zigzag_order()
_UNZZ = np.argsort(_ZZ)  # raster index -> zigzag position

# orthonormal 8x8 DCT-II basis: D @ f @ D.T forward, D.T @ F @ D inverse
_DCT = np.array([
    [(np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
     * np.cos((2 * n + 1) * k * np.pi / 16) for n in range(8)]
    for k in range(8)
])


def _scaled_qtab(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _build_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# -- color transforms (JFIF full-range BT.601) ------------------------------

def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# -- bit I/O ----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


class _BitReader:
    """MSB-first bit reader over unstuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        if self.nbits >= 16:
            return (self.acc >> (self.nbits - 16)) & 0xFFFF
        return (self.acc << (16 - self.nbits)) & 0xFFFF  # zero-padded tail

    def skip(self, n: int) -> None:
        if self.nbits < n:
            self._fill()
        if self.nbits < n:
            raise ValueError("truncated entropy segment")
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        if self.nbits < n:
            raise ValueError("truncated entropy segment")
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return out


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, raw bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


# -- encoder ----------------------------------------------------------------

def _component_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H,W) float plane, H,W multiples of 8 -> (H//8, W//8, 64) int32 of
    quantized zigzagged DCT coefficients — all blocks at once."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ku,yxuv,lv->yxkl", _DCT, blocks, _DCT, optimize=True)
    q = coef.reshape(h // 8, w // 8, 64)[..., _ZZ]
    return np.round(q / qtab[np.newaxis, np.newaxis, _ZZ]).astype(np.int32)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


# Y sampling factors per named chroma-subsampling mode (chroma is always
# (1,1)): "422"/"440" halve one chroma axis, "420" both, "411" quarters
# the horizontal axis (the DV-camera layout — exercises factor 4)
_SUBSAMP = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "440": ((1, 2), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
    "411": ((4, 1), (1, 1), (1, 1)),
}


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """uint8 (H,W) gray or (H,W,3) RGB -> baseline JFIF JPEG bytes."""
    import struct

    img = np.asarray(img)
    if img.ndim == 2:
        gray = True
    elif img.ndim == 3 and img.shape[2] == 3:
        gray = False
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    if subsampling not in _SUBSAMP:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMP)}")
    h, w = img.shape[:2]
    ql = _scaled_qtab(_QL, quality)
    qc = _scaled_qtab(_QC, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qmap = [0]
    else:
        ycc = _rgb_to_ycbcr(img)
        samp = list(_SUBSAMP[subsampling])
        yh, yv = samp[0]
        if (yh, yv) == (1, 1):
            planes = [ycc[..., i] for i in range(3)]
        else:
            # yv x yh box-mean chroma downsample over the MCU-padded grid
            ypad = _pad_to(ycc[..., 0], 8 * yv, 8 * yh)
            cpad = (_pad_to(ycc[..., 1], 8 * yv, 8 * yh),
                    _pad_to(ycc[..., 2], 8 * yv, 8 * yh))
            planes = [ypad] + [
                c.reshape(c.shape[0] // yv, yv,
                          c.shape[1] // yh, yh).mean(axis=(1, 3))
                for c in cpad
            ]
        qmap = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_y = -(-h // (8 * vmax))
    mcus_x = -(-w // (8 * hmax))
    qtabs = [ql, qc]
    coefs = []
    for plane, (sh, sv), qi in zip(planes, samp, qmap):
        # each component covers mcus_y*sv × mcus_x*sh blocks; edge-pad its
        # plane (already at component resolution) to exactly that grid
        need_h, need_w = mcus_y * sv * 8, mcus_x * sh * 8
        ph, pw = need_h - plane.shape[0], need_w - plane.shape[1]
        if ph or pw:
            plane = np.pad(plane, ((0, max(ph, 0)), (0, max(pw, 0))),
                           mode="edge")[:need_h, :need_w]
        coefs.append(_component_blocks(plane, qtabs[qi]))

    dc_tabs = [_build_codes(_DC_L_BITS, _DC_L_VALS),
               _build_codes(_DC_C_BITS, _DC_C_VALS)]
    ac_tabs = [_build_codes(_AC_L_BITS, _AC_L_VALS),
               _build_codes(_AC_C_BITS, _AC_C_VALS)]
    tmap = [0] if gray else [0, 1, 1]

    bw = _BitWriter()
    pred = [0] * len(coefs)
    mcus_y = -(-h // (8 * vmax))
    mcus_x = -(-w // (8 * hmax))

    def put_block(ci: int, zz: np.ndarray) -> None:
        dc_codes, ac_codes = dc_tabs[tmap[ci]], ac_tabs[tmap[ci]]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size, raw = _magnitude(diff)
        c, ln = dc_codes[size]
        bw.write(c, ln)
        bw.write(raw, size)
        nz = np.flatnonzero(zz[1:])
        run = 0
        prev = 0
        for idx in nz:
            gap = int(idx) - prev
            prev = int(idx) + 1
            run += gap
            while run >= 16:
                c, ln = ac_codes[0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
            v = int(zz[1 + idx])
            size, raw = _magnitude(v)
            c, ln = ac_codes[(run << 4) | size]
            bw.write(c, ln)
            bw.write(raw, size)
            run = 0
        if prev < 63:
            c, ln = ac_codes[0x00]  # EOB
            bw.write(c, ln)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        put_block(ci, coefs[ci][my * sv + by, mx * sh + bx])
    bw.flush()

    # -- markers --
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(ql[_ZZ].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, bytes([1]) + bytes(qc[_ZZ].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qmap[ci]])
    out += seg(0xFFC0, sof)

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _DC_L_BITS, _DC_L_VALS)
    out += dht(1, 0, _AC_L_BITS, _AC_L_VALS)
    if not gray:
        out += dht(0, 1, _DC_C_BITS, _DC_C_VALS)
        out += dht(1, 1, _AC_C_BITS, _AC_C_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tmap[ci] << 4) | tmap[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ----------------------------------------------------------------

_LUT_CACHE: dict[bytes, tuple[np.ndarray, np.ndarray]] = {}


def _huff_lut(bits_vals: bytes) -> tuple[np.ndarray, np.ndarray]:
    """DHT payload (16 count bytes + values) -> 65536-entry (symbol, length)
    lookup arrays keyed by a 16-bit peek."""
    cached = _LUT_CACHE.get(bits_vals)
    if cached is not None:
        return cached
    bits = bits_vals[:16]
    vals = bits_vals[16:]
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    _LUT_CACHE[bits_vals] = (sym, ln)
    return sym, ln


def _entropy_segments(buf: bytes, pos: int) -> tuple[list[bytes], int]:
    """Restart-delimited entropy segments starting at ``pos``; returns the
    UNSTUFFED segment list and the offset of the terminating marker."""
    segments = []
    p = pos
    seg_begin = p
    while p < len(buf) - 1:
        if buf[p] == 0xFF and buf[p + 1] != 0x00:
            m = buf[p + 1]
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(buf[seg_begin:p])
                p += 2
                seg_begin = p
                continue
            segments.append(buf[seg_begin:p])
            return ([s.replace(b"\xff\x00", b"\xff") for s in segments], p)
        p += 1
    segments.append(buf[seg_begin:])
    return ([s.replace(b"\xff\x00", b"\xff") for s in segments], len(buf))


def _dec_sym(br: _BitReader, sym: np.ndarray, ln: np.ndarray) -> int:
    peek = br.peek16()
    ll = int(ln[peek])
    if ll == 0:
        raise ValueError("bad Huffman code")
    br.skip(ll)
    return int(sym[peek])


def decode_jpeg(buf: bytes) -> np.ndarray:
    """JPEG bytes (baseline SOF0/SOF1 or progressive SOF2) -> uint8 (H,W)
    gray or (H,W,3) RGB."""
    import struct

    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps = None  # list of dicts
    h = w = None
    progressive = False
    restart_interval = 0
    scans = []  # one dict per SOS, in stream order

    while pos < len(buf) - 1:
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: fill bytes — any number of
            pos += 1        # 0xFFs may pad before a marker code
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", buf[pos + 2:pos + 4])
        body = buf[pos + 4:pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0xF
                if pq == 0:
                    qtabs[tq] = np.frombuffer(b[1:65], dtype=np.uint8).astype(np.int32)
                    b = b[65:]
                else:
                    qtabs[tq] = np.frombuffer(b[1:129], dtype=">u2").astype(np.int32)
                    b = b[129:]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, sf, tq = body[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF marker 0x{marker:02x} (lossless/arithmetic/hierarchical)"
                " not supported — baseline and progressive Huffman only")
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = body
            while b:
                cls, tid = b[0] >> 4, b[0] & 0xF
                n = sum(b[1:17])
                huff[(cls, tid)] = _huff_lut(bytes(b[1:17 + n]))
                b = b[17 + n:]
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cid, tabs = body[1 + ci * 2:3 + ci * 2]
                scan_comps.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 0xF})
            ss, se, a = body[1 + ns * 2:4 + ns * 2]
            segments, nxt = _entropy_segments(buf, pos + 2 + ln)
            scans.append({
                "comps": scan_comps, "ss": ss, "se": se,
                "ah": a >> 4, "al": a & 0xF,
                "segments": segments, "dri": restart_interval,
                # huffman tables are mutable between scans: snapshot refs
                "huff": dict(huff),
            })
            pos = nxt
            continue
        pos += 2 + ln

    if comps is None or not scans:
        raise ValueError("no SOF/SOS found")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 4 or vmax > 4:
        raise ValueError("sampling factors > 4 are invalid JPEG")
    if any(hmax % c["h"] or vmax % c["v"] for c in comps):
        # integer-ratio upsampling only; fractional ratios (e.g. 3-vs-2)
        # essentially never occur in real corpora
        raise NotImplementedError("non-divisible sampling ratios not supported")
    mcus_y = -(-h // (8 * vmax))
    mcus_x = -(-w // (8 * hmax))
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        c["coef"] = np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64),
                             dtype=np.int32)
        # non-interleaved scans cover the component's OWN ceil grid
        comp_h = -(-h * c["v"] // vmax)
        comp_w = -(-w * c["h"] // hmax)
        c["bys"] = -(-comp_h // 8)
        c["bxs"] = -(-comp_w // 8)

    for scan in scans:
        if progressive:
            _decode_progressive_scan(scan, by_id, mcus_y, mcus_x)
        else:
            _decode_sequential_scan(scan, by_id, mcus_y, mcus_x)

    # dequantize + IDCT every block at once, per component
    planes = {}
    for c in comps:
        q = qtabs[c["tq"]]
        zz = c["coef"] * q[np.newaxis, np.newaxis, :]
        raster = np.zeros_like(zz)
        raster[..., _ZZ] = zz
        by_, bx_ = raster.shape[0], raster.shape[1]
        blocks = raster.reshape(by_, bx_, 8, 8)
        pix = np.einsum("uk,yxkl,vl->yxuv", _DCT.T, blocks, _DCT.T,
                        optimize=True) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(by_ * 8, bx_ * 8)
        # upsample to full resolution
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes[c["id"]] = plane[:h, :w]

    if len(comps) == 1:
        return np.clip(planes[comps[0]["id"]].round(), 0, 255).astype(np.uint8)
    y, cb, cr = (planes[c["id"]] for c in comps)
    return _ycbcr_to_rgb(y, cb, cr)


def _decode_sequential_scan(scan, by_id, mcus_y, mcus_x) -> None:
    """Baseline scan: full-spectrum Huffman blocks, interleaved MCU order
    (or the component's own grid for single-component scans)."""
    huff = scan["huff"]
    order = [by_id[s["id"]] for s in scan["comps"]]
    for c, s in zip(order, scan["comps"]):
        c["dc_t"], c["ac_t"] = s["dc"], s["ac"]
    readers = [_BitReader(s) for s in scan["segments"]]
    restart_interval = scan["dri"]
    seg_i = 0
    br = readers[0]
    pred = {c["id"]: 0 for c in order}
    mcu_count = 0

    def read_block(c, zz) -> None:
        nonlocal br
        dsym, dlen = huff[(0, c["dc_t"])]
        s = _dec_sym(br, dsym, dlen)
        diff = _extend(br.read(s), s)
        pred[c["id"]] += diff
        zz[0] = pred[c["id"]]
        asym, alen = huff[(1, c["ac_t"])]
        k = 1
        while k < 64:
            sym = _dec_sym(br, asym, alen)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, size = sym >> 4, sym & 0xF
            k += run
            if k > 63:
                raise ValueError("AC run past end of block")
            zz[k] = _extend(br.read(size), size)
            k += 1

    if len(order) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and \
                        mcu_count % restart_interval == 0:
                    seg_i += 1
                    br = readers[seg_i]
                    for c in order:
                        pred[c["id"]] = 0
                for c in order:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            read_block(c, c["coef"][my * c["v"] + by,
                                                    mx * c["h"] + bx])
                mcu_count += 1
    else:
        c = order[0]
        for by in range(c["bys"]):
            for bx in range(c["bxs"]):
                if restart_interval and mcu_count and \
                        mcu_count % restart_interval == 0:
                    seg_i += 1
                    br = readers[seg_i]
                    pred[c["id"]] = 0
                read_block(c, c["coef"][by, bx])
                mcu_count += 1


def _decode_progressive_scan(scan, by_id, mcus_y, mcus_x) -> None:
    """One progressive scan (T.81 G.2): DC first / DC refinement
    (interleaved or single-component) or AC first / AC refinement
    (single-component only), with EOB-run bookkeeping and restart
    resets."""
    huff = scan["huff"]
    order = [by_id[s["id"]] for s in scan["comps"]]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    readers = [_BitReader(s) for s in scan["segments"]]
    restart_interval = scan["dri"]
    bit = 1 << al

    if ss == 0:  # ---- DC scan ----
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC (Ss=0, Se>0)")
        pred = {c["id"]: 0 for c in order}
        seg_i, br, mcu_count = 0, readers[0], 0
        tabs = {c["id"]: huff[(0, s["dc"])]
                for c, s in zip(order, scan["comps"])} if ah == 0 else {}

        def dc_block(c, zz) -> None:
            if ah == 0:  # first pass: diff-coded, scaled by 2^Al
                dsym, dlen = tabs[c["id"]]
                s = _dec_sym(br, dsym, dlen)
                pred[c["id"]] += _extend(br.read(s), s)
                zz[0] = pred[c["id"]] << al
            else:  # refinement: one correction bit
                if br.read(1):
                    zz[0] |= bit

        if len(order) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and mcu_count and \
                            mcu_count % restart_interval == 0:
                        seg_i += 1
                        br = readers[seg_i]
                        for c in order:
                            pred[c["id"]] = 0
                    for c in order:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(c, c["coef"][my * c["v"] + by,
                                                      mx * c["h"] + bx])
                    mcu_count += 1
        else:
            c = order[0]
            for by in range(c["bys"]):
                for bx in range(c["bxs"]):
                    if restart_interval and mcu_count and \
                            mcu_count % restart_interval == 0:
                        seg_i += 1
                        br = readers[seg_i]
                        pred[c["id"]] = 0
                    dc_block(c, c["coef"][by, bx])
                    mcu_count += 1
        return

    # ---- AC scan: exactly one component ----
    if len(order) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = order[0]
    asym, alen = huff[(1, scan["comps"][0]["ac"])]
    seg_i, br = 0, readers[0]
    eobrun = 0
    blk_count = 0

    def ac_first(zz) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            sym = _dec_sym(br, asym, alen)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r < 15:  # EOBn: run of (1<<r)+bits blocks ending here
                    eobrun = (1 << r) - 1 + br.read(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past Se")
            zz[k] = _extend(br.read(s), s) << al
            k += 1

    def refine_nonzero(zz, k, last) -> int:
        """Correction bits for already-nonzero coefs in [k, last]; returns
        the first ZERO-history position > the refined span (== k of the
        caller's next insertion point)."""
        while k <= last:
            if zz[k] != 0:
                if br.read(1) and not (zz[k] & bit):
                    zz[k] += bit if zz[k] > 0 else -bit
            k += 1
        return k

    def ac_refine(zz) -> None:
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _dec_sym(br, asym, alen)
                r, s = sym >> 4, sym & 0xF
                if s == 0 and r < 15:
                    eobrun = (1 << r) + br.read(r)  # incl. this block's tail
                    break
                newval = 0
                if s:
                    # s == 1 by the standard; value is ±2^Al
                    newval = bit if br.read(1) else -bit
                # advance past r zero-HISTORY coefs (ZRL: r=15 → 16 zeros),
                # emitting correction bits for nonzero-history coefs passed
                while k <= se:
                    if zz[k] != 0:
                        if br.read(1) and not (zz[k] & bit):
                            zz[k] += bit if zz[k] > 0 else -bit
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    zz[k] = newval
                k += 1
        if eobrun > 0:
            refine_nonzero(zz, k, se)
            eobrun -= 1

    for by in range(c["bys"]):
        for bx in range(c["bxs"]):
            if restart_interval and blk_count and \
                    blk_count % restart_interval == 0:
                seg_i += 1
                br = readers[seg_i]
                eobrun = 0
            if ah == 0:
                ac_first(c["coef"][by, bx])
            else:
                ac_refine(c["coef"][by, bx])
            blk_count += 1
