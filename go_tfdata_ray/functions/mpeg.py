"""From-spec MPEG-1 video (ISO/IEC 11172-2) intra codec + systems demux.

Closes the "general video" seam left by the MJPEG container walks: a real
motion-video bitstream format with its own entropy layer (the Annex B VLC
tables), quantizer matrix, DC prediction and slice/macroblock structure —
not JPEG in a box. Scope is the honest keyframe subset a frame-sampling
data pipeline needs:

- ``encode_mpeg1``: all-I-picture 4:2:0 elementary stream (sequence /
  GOP / picture / one-slice-per-MB-row), full Table B.5 run-level VLC
  with escape fallback, DC-predicted size coding, default intra
  quantizer matrix, selectable quantizer_scale.
- ``decode_mpeg1`` / ``extract_mpeg_frames``: parses any MPEG-1 video
  ES (custom quant matrices, intra+quant macroblock type, extension /
  user-data codes, MB address escapes), pixel-decodes I pictures;
  P/B pictures are counted and *skipped* structurally but raise
  ``NotImplementedError`` if their pixels are requested — motion
  compensation is the documented seam (keyframe sampling never needs
  it: extract the nearest I picture instead).
- ``count_mpeg_frames``: O(bytes) picture-start-code scan — exact,
  because the VLC design forbids start-code emulation (23 consecutive
  zero bits cannot occur inside valid entropy data).
- ``mux_mpeg_ps`` / ``demux_mpeg_ps``: minimal ISO 11172-1 program
  stream (pack header, system header, MPEG-1-format PES packets with
  stuffing/STD/PTS handling on the demux side).

Reference-parity note: the reference decodes media via Go stdlib codecs
(/root/reference/tfdata/core/example.go:131-146); this module extends
that surface the same way jpeg.py/gif.py do — from the public spec, no
external libs. DCT basis, zigzag and magnitude helpers are shared with
the JPEG codec (identical 8x8 math).

Scale shape: pure per-payload byte kernels — used inside actor-pool
``map_batches`` stages (functions/multimodal.py), never on the driver.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import _DCT, _ZZ, _BitReader, _rgb_to_ycbcr, _ycbcr_to_rgb

# default intra quantizer matrix (ISO 11172-2 §2.4.2.3), raster order
_INTRA_Q = np.array([
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83,
], dtype=np.int64)

# picture_rate code -> fps (§2.4.3.2); encoder picks the nearest
_PICTURE_RATES = {1: 23.976, 2: 24.0, 3: 25.0, 4: 29.97, 5: 30.0,
                  6: 50.0, 7: 59.94, 8: 60.0}

# dct_dc_size VLCs (§2.4.3.7): size -> code string
_DC_LUM = {0: "100", 1: "00", 2: "01", 3: "101", 4: "110", 5: "1110",
           6: "11110", 7: "111110", 8: "1111110"}
_DC_CHROM = {0: "00", 1: "01", 2: "10", 3: "110", 4: "1110", 5: "11110",
             6: "111110", 7: "1111110", 8: "11111110"}

# macroblock_address_increment (Table B.1); escape adds 33, stuffing skips
_MBA = {
    1: "1", 2: "011", 3: "010", 4: "0011", 5: "0010", 6: "00011",
    7: "00010", 8: "0000111", 9: "0000110", 10: "00001011", 11: "00001010",
    12: "00001001", 13: "00001000", 14: "00000111", 15: "00000110",
    16: "0000010111", 17: "0000010110", 18: "0000010101", 19: "0000010100",
    20: "0000010011", 21: "0000010010", 22: "00000100011", 23: "00000100010",
    24: "00000100001", 25: "00000100000", 26: "00000011111",
    27: "00000011110", 28: "00000011101", 29: "00000011100",
    30: "00000011011", 31: "00000011010", 32: "00000011001",
    33: "00000011000",
}
_MBA_ESCAPE = "00000001000"
_MBA_STUFFING = "00000001111"

# dct_coeff run/level VLC (Table B.5, == H.262 Table B.14), sign bit
# appended on the wire. The 0,1 entry here is the "next" form '11';
# intra blocks only ever use the next form (DC is size-coded).
_AC_TABLE: list[tuple[int, int, str]] = [
    (0, 1, "11"), (1, 1, "011"),
    (0, 2, "0100"), (2, 1, "0101"),
    (0, 3, "00101"), (3, 1, "00111"), (4, 1, "00110"),
    (1, 2, "000110"), (5, 1, "000111"), (6, 1, "000101"), (7, 1, "000100"),
    (0, 4, "0000110"), (2, 2, "0000100"), (8, 1, "0000111"),
    (9, 1, "0000101"),
    (0, 5, "00100110"), (0, 6, "00100001"), (1, 3, "00100101"),
    (3, 2, "00100100"), (10, 1, "00100111"), (11, 1, "00100011"),
    (12, 1, "00100010"), (13, 1, "00100000"),
    (0, 7, "0000001010"), (1, 4, "0000001100"), (2, 3, "0000001011"),
    (4, 2, "0000001111"), (5, 2, "0000001001"), (14, 1, "0000001101"),
    (15, 1, "0000001000"), (16, 1, "0000001110"),
    (0, 8, "000000011101"), (0, 9, "000000011000"), (0, 10, "000000010011"),
    (0, 11, "000000010000"), (1, 5, "000000011011"), (2, 4, "000000010100"),
    (3, 3, "000000011100"), (4, 3, "000000010010"), (6, 2, "000000011110"),
    (7, 2, "000000010101"), (8, 2, "000000010001"), (17, 1, "000000011111"),
    (18, 1, "000000011010"), (19, 1, "000000011001"),
    (20, 1, "000000010111"), (21, 1, "000000010110"),
    (0, 12, "0000000011010"), (0, 13, "0000000011001"),
    (0, 14, "0000000011000"), (0, 15, "0000000010111"),
    (1, 6, "0000000010110"), (1, 7, "0000000010101"),
    (2, 5, "0000000010100"), (3, 4, "0000000010011"),
    (5, 3, "0000000010010"), (9, 2, "0000000010001"),
    (10, 2, "0000000010000"), (22, 1, "0000000011111"),
    (23, 1, "0000000011110"), (24, 1, "0000000011101"),
    (25, 1, "0000000011100"), (26, 1, "0000000011011"),
    (0, 16, "00000000011111"), (0, 17, "00000000011110"),
    (0, 18, "00000000011101"), (0, 19, "00000000011100"),
    (0, 20, "00000000011011"), (0, 21, "00000000011010"),
    (0, 22, "00000000011001"), (0, 23, "00000000011000"),
    (0, 24, "00000000010111"), (0, 25, "00000000010110"),
    (0, 26, "00000000010101"), (0, 27, "00000000010100"),
    (0, 28, "00000000010011"), (0, 29, "00000000010010"),
    (0, 30, "00000000010001"), (0, 31, "00000000010000"),
    (0, 32, "000000000011000"), (0, 33, "000000000010111"),
    (0, 34, "000000000010110"), (0, 35, "000000000010101"),
    (0, 36, "000000000010100"), (0, 37, "000000000010011"),
    (0, 38, "000000000010010"), (0, 39, "000000000010001"),
    (0, 40, "000000000010000"), (1, 8, "000000000011111"),
    (1, 9, "000000000011110"), (1, 10, "000000000011101"),
    (1, 11, "000000000011100"), (1, 12, "000000000011011"),
    (1, 13, "000000000011010"), (1, 14, "000000000011001"),
    (1, 15, "0000000000011111"), (1, 16, "0000000000011110"),
    (1, 17, "0000000000011101"), (1, 18, "0000000000011100"),
    (6, 3, "0000000000011011"), (11, 2, "0000000000011010"),
    (12, 2, "0000000000011001"), (13, 2, "0000000000011000"),
    (14, 2, "0000000000010111"), (15, 2, "0000000000010110"),
    (16, 2, "0000000000010101"), (27, 1, "0000000000010100"),
    (28, 1, "0000000000010011"), (29, 1, "0000000000010010"),
    (30, 1, "0000000000010001"), (31, 1, "0000000000010000"),
]
_AC_EOB = "10"
_AC_ESCAPE = "000001"

_AC_ENC = {(r, lv): (int(c, 2), len(c)) for r, lv, c in _AC_TABLE}


def _prefix_decoder(entries: dict[str, object]):
    """code-string table -> (lut: dict[(len, code)] -> value, max_len)."""
    lut = {(len(c), int(c, 2)): v for c, v in entries.items()}
    return lut, max(len(c) for c in entries)


_DC_LUM_DEC = _prefix_decoder({c: s for s, c in _DC_LUM.items()})
_DC_CHROM_DEC = _prefix_decoder({c: s for s, c in _DC_CHROM.items()})
_MBA_DEC = _prefix_decoder({**{c: n for n, c in _MBA.items()},
                            _MBA_ESCAPE: "escape",
                            _MBA_STUFFING: "stuffing"})
_AC_DEC = _prefix_decoder({c: (r, lv) for r, lv, c in _AC_TABLE})


def _read_vlc(br: _BitReader, dec) -> object:
    lut, max_len = dec
    code = 0
    for n in range(1, max_len + 1):
        code = (code << 1) | br.read(1)
        v = lut.get((n, code))
        if v is not None:
            return v
    raise ValueError("invalid VLC code in MPEG-1 stream")


class _BW:
    """Plain MSB-first bit writer (no byte stuffing — MPEG start codes
    rely on the VLC tables' guarantee that 23 zero bits never occur)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def write_code(self, code: str) -> None:
        self.write(int(code, 2), len(code))

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def start_code(self, code: int) -> None:
        self.align()
        self.buf += struct.pack(">I", 0x00000100 | code)


# -- encoder ----------------------------------------------------------------

def _enc_dc(bw: _BW, diff: int, table: dict[int, str]) -> None:
    size = int(abs(diff)).bit_length()
    bw.write_code(table[size])
    if size:
        raw = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(raw, size)


def _enc_ac(bw: _BW, run: int, level: int, force_escape: bool = False) -> None:
    key = (run, abs(level))
    if not force_escape and key in _AC_ENC:
        code, n = _AC_ENC[key]
        bw.write(code, n)
        bw.write(1 if level < 0 else 0, 1)
        return
    # escape: 6-bit run + 8-bit level, 16-bit double-byte form past ±127
    bw.write_code(_AC_ESCAPE)
    bw.write(run, 6)
    if -127 <= level <= 127:
        bw.write(level & 0xFF, 8)
    elif level > 0:  # 128..255
        bw.write(0x00, 8)
        bw.write(level, 8)
    else:  # -255..-128
        bw.write(0x80, 8)
        bw.write(level & 0xFF, 8)


def _quant_block(coef_zz: np.ndarray, qscale: int) -> np.ndarray:
    """Zigzagged float DCT coefficients -> quantized int levels (AC only;
    [0] is DC, quantized at the fixed step of 8)."""
    q = np.empty(64, dtype=np.int64)
    q[0] = int(np.round(coef_zz[0] / 8.0))
    qz = _INTRA_Q[_ZZ][1:]
    q[1:] = np.clip(np.round(8.0 * coef_zz[1:] / (qscale * qz)),
                    -255, 255).astype(np.int64)
    return q


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H,W) float plane (H,W multiples of 8) -> (H//8, W//8, 64)
    zigzagged DCT coefficients. MPEG-1 DCTs unshifted 0..255 samples
    (the 128 offset lives in the DC predictor reset of 1024)."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ku,yxuv,lv->yxkl", _DCT, blocks, _DCT, optimize=True)
    return coef.reshape(h // 8, w // 8, 64)[..., _ZZ]


def encode_mpeg1(frames, fps: float = 25.0, qscale: int = 8,
                 gop_size: int = 0, force_escape: bool = False) -> bytes:
    """uint8 (N,H,W,3) RGB (or list of (H,W,3)) -> MPEG-1 video
    elementary stream, every picture intra-coded, 4:2:0, one slice per
    macroblock row. ``force_escape`` routes every AC coefficient through
    the escape coding (a legal stream; used to cross-check the VLC
    table). ``gop_size`` > 0 starts a new GOP header every that many
    pictures (all pictures are I either way)."""
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[np.newaxis]
    n, h, w = frames.shape[:3]
    if h > 2800:
        raise ValueError("slice_vertical_position caps height at 2800")
    mb_w, mb_h = -(-w // 16), -(-h // 16)
    qscale = min(max(int(qscale), 1), 31)
    rate_code = min(_PICTURE_RATES, key=lambda k: abs(_PICTURE_RATES[k] - fps))

    bw = _BW()
    # sequence header
    bw.buf += struct.pack(">I", 0x000001B3)
    bw.write(w, 12)
    bw.write(h, 12)
    bw.write(1, 4)   # pel_aspect_ratio: square
    bw.write(rate_code, 4)
    bw.write(0x3FFFF, 18)  # bit_rate: variable
    bw.write(1, 1)   # marker
    bw.write(0, 10)  # vbv_buffer_size
    bw.write(0, 1)   # constrained_parameters_flag
    bw.write(0, 1)   # load_intra_quantizer_matrix (default)
    bw.write(0, 1)   # load_non_intra_quantizer_matrix

    for idx in range(n):
        if idx == 0 or (gop_size and idx % gop_size == 0):
            bw.start_code(0xB8)  # group_of_pictures
            bw.write(0, 25)  # time_code
            bw.write(1, 1)   # closed_gop
            bw.write(0, 1)   # broken_link
        bw.start_code(0x00)  # picture
        bw.write(idx % (gop_size or 1024), 10)  # temporal_reference
        bw.write(1, 3)       # picture_coding_type: I
        bw.write(0xFFFF, 16)  # vbv_delay: variable
        bw.write(0, 1)       # extra_bit_picture

        ycc = _rgb_to_ycbcr(frames[idx])
        planes = []
        for ci in range(3):
            p = ycc[..., ci]
            ph, pw = mb_h * 16 - h, mb_w * 16 - w
            if ph or pw:
                p = np.pad(p, ((0, ph), (0, pw)), mode="edge")
            if ci:  # 4:2:0 chroma: 2x2 box mean
                p = p.reshape(mb_h * 8, 2, mb_w * 8, 2).mean(axis=(1, 3))
            planes.append(_plane_blocks(p))

        for row in range(mb_h):
            bw.start_code(row + 1)  # slice_vertical_position
            bw.write(qscale, 5)
            bw.write(0, 1)  # extra_bit_slice
            pred = [128, 128, 128]  # quantized-DC predictors (1024/8)
            for col in range(mb_w):
                bw.write_code(_MBA[1])  # address increment 1
                bw.write_code("1")      # macroblock_type: intra
                for b in range(6):
                    if b < 4:  # Y blocks raster order within the MB
                        zz = planes[0][row * 2 + b // 2, col * 2 + b % 2]
                        comp, table = 0, _DC_LUM
                    else:
                        zz = planes[b - 3][row, col]
                        comp, table = b - 3, _DC_CHROM
                    q = _quant_block(zz, qscale)
                    _enc_dc(bw, int(q[0]) - pred[comp], table)
                    pred[comp] = int(q[0])
                    nz = np.nonzero(q[1:])[0]
                    last = -1
                    for pos in nz:
                        _enc_ac(bw, int(pos - last - 1), int(q[1 + pos]),
                                force_escape)
                        last = pos
                    bw.write_code(_AC_EOB)
    bw.align()
    bw.buf += struct.pack(">I", 0x000001B7)  # sequence_end
    return bytes(bw.buf)


# -- decoder ----------------------------------------------------------------

def _start_codes(buf: bytes) -> list[tuple[int, int]]:
    """All byte-aligned (offset, code) start codes — exact: valid VLC data
    cannot emulate the 23-zero-bit prefix."""
    a = np.frombuffer(buf, dtype=np.uint8)
    if len(a) < 4:
        return []
    hits = np.flatnonzero((a[:-3] == 0) & (a[1:-2] == 0) & (a[2:-1] == 1))
    return [(int(o), int(a[o + 3])) for o in hits]


def _dec_block(br: _BitReader, table_dec, pred: int) -> tuple[np.ndarray, int]:
    """One intra block -> (64 quantized zigzag levels, new DC pred)."""
    zz = np.zeros(64, dtype=np.int64)
    size = _read_vlc(br, table_dec)
    if size:
        raw = br.read(size)
        diff = raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1
    else:
        diff = 0
    dc = pred + diff
    zz[0] = dc
    i = 0
    while True:
        if br.peek16() >> 14 == 0b10:  # EOB
            br.skip(2)
            break
        if br.peek16() >> 10 == 0b000001:  # escape
            br.skip(6)
            run = br.read(6)
            b = br.read(8)
            if b == 0x00:
                level = br.read(8)
            elif b == 0x80:
                level = br.read(8) - 256
            else:
                level = b if b < 128 else b - 256
        else:
            run, alevel = _read_vlc(br, _AC_DEC)
            level = -alevel if br.read(1) else alevel
        i += run + 1
        if i > 63:
            raise ValueError("DCT coefficient run past block end")
        zz[i] = level
    return zz, dc


def _dequant_idct(zz: np.ndarray, qscales: np.ndarray,
                  intra_q: np.ndarray | None = None) -> np.ndarray:
    """(n,64) quantized zigzag levels + per-block quantizer_scale ->
    (n,8,8) uint8 samples. Intra dequant per §2.4.4.2: truncating
    division, oddification mismatch control (AC only — the DC overwrite
    comes after the loop), ±2048 clamp."""
    qz = (_INTRA_Q if intra_q is None else intra_q)[_ZZ]
    rec = (2 * zz * qscales[:, None] * qz[None, :]) / 16.0
    rec = np.trunc(rec).astype(np.int64)
    even = (rec != 0) & (rec % 2 == 0)
    rec[even] -= np.sign(rec[even])
    rec = np.clip(rec, -2048, 2047)
    rec[:, 0] = np.clip(zz[:, 0] * 8, -2048, 2047)
    raster = np.zeros_like(rec)
    raster[:, _ZZ] = rec
    blocks = raster.reshape(-1, 8, 8).astype(np.float64)
    px = np.einsum("uk,xkl,vl->xuv", _DCT.T, blocks, _DCT.T, optimize=True)
    return np.clip(px.round(), 0, 255).astype(np.uint8)


class _SeqState:
    def __init__(self):
        self.w = self.h = 0
        self.fps = 25.0
        self.intra_q: np.ndarray | None = None  # custom matrix, raster order


def _parse_sequence_header(payload: bytes, st: _SeqState) -> None:
    br = _BitReader(payload)
    st.w = br.read(12)
    st.h = br.read(12)
    br.read(4)
    st.fps = _PICTURE_RATES.get(br.read(4), 25.0)
    br.read(18)
    br.read(1)
    br.read(10)
    br.read(1)
    if br.read(1):  # load_intra_quantizer_matrix: 64 u8 in zigzag order
        zz_vals = np.array([br.read(8) for _ in range(64)], dtype=np.int64)
        raster = np.zeros(64, dtype=np.int64)
        raster[_ZZ] = zz_vals
        st.intra_q = raster
    if br.read(1):  # load_non_intra_quantizer_matrix (unused by intra)
        for _ in range(64):
            br.read(8)


def _iter_pictures(es: bytes):
    """Yield (pic_index, coding_type, [(slice_code, payload), ...], seq)
    per picture. Extension/user-data codes are skipped."""
    codes = _start_codes(es)
    seq = _SeqState()
    cur = None
    for k, (off, code) in enumerate(codes):
        end = codes[k + 1][0] if k + 1 < len(codes) else len(es)
        payload = es[off + 4:end]
        if code == 0xB3:
            _parse_sequence_header(payload, seq)
        elif code == 0x00:
            if cur is not None:
                yield cur
            br = _BitReader(payload)
            br.read(10)
            ptype = br.read(3)
            cur = (ptype, [], seq)
        elif 0x01 <= code <= 0xAF and cur is not None:
            cur[1].append((code, payload))
    if cur is not None:
        yield cur


def _decode_picture(ptype: int, slices, seq: _SeqState) -> np.ndarray:
    if ptype != 1:
        raise NotImplementedError(
            "inter-coded (P/B) picture pixel decode needs motion "
            "compensation — seam; sample the nearest I picture instead")
    mb_w, mb_h = -(-seq.w // 16), -(-seq.h // 16)
    n_mb = mb_w * mb_h
    zz_all = np.zeros((n_mb * 6, 64), dtype=np.int64)
    q_all = np.zeros(n_mb * 6, dtype=np.int64)
    seen = np.zeros(n_mb, dtype=bool)
    for code, payload in slices:
        br = _BitReader(payload)
        qscale = br.read(5)
        while br.read(1):  # extra_information_slice
            br.read(8)
        addr = (code - 1) * mb_w - 1
        pred = [128, 128, 128]
        while True:
            # slice payloads are framed by byte-aligned start codes, so
            # end-of-slice == only zero padding bits remain (valid VLC
            # data cannot contain 23 zero bits, so a zero tail is exact)
            rest = br.nbits + (len(br.data) - br.pos) * 8
            if rest < 2:
                break
            if br.peek16() == 0:
                tail_zero = (br.acc & ((1 << br.nbits) - 1)) == 0 and not any(
                    br.data[br.pos:])
                if tail_zero:
                    break
            inc = _read_vlc(br, _MBA_DEC)
            while inc == "stuffing":
                inc = _read_vlc(br, _MBA_DEC)
            total = 0
            while inc == "escape":
                total += 33
                inc = _read_vlc(br, _MBA_DEC)
            total += inc
            addr += total
            if total > 1:
                pred = [128, 128, 128]  # skipped MBs reset DC prediction
            if addr >= n_mb:
                raise ValueError("macroblock address past picture end")
            if br.read(1) == 0:  # macroblock_type: '1' intra, '01' +quant
                if br.read(1) != 1:
                    raise ValueError("non-intra macroblock in I picture")
                qscale = br.read(5)
            for b in range(6):
                comp = 0 if b < 4 else b - 3
                table = _DC_LUM_DEC if b < 4 else _DC_CHROM_DEC
                zz, pred[comp] = _dec_block(br, table, pred[comp])
                zz_all[addr * 6 + b] = zz
                q_all[addr * 6 + b] = qscale
            seen[addr] = True
    if not seen.all():
        # legal but unexpected for our encoder: uncoded MBs stay mid-gray
        for m in np.flatnonzero(~seen):
            zz_all[m * 6:(m + 1) * 6, 0] = 128
            q_all[m * 6:(m + 1) * 6] = 8
    px = _dequant_idct(zz_all, q_all, seq.intra_q)  # (n_mb*6, 8, 8)
    y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    cb = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    cr = np.zeros_like(cb)
    for m in range(n_mb):
        r, c = divmod(m, mb_w)
        blk = px[m * 6:(m + 1) * 6]
        y[r * 16:r * 16 + 8, c * 16:c * 16 + 8] = blk[0]
        y[r * 16:r * 16 + 8, c * 16 + 8:c * 16 + 16] = blk[1]
        y[r * 16 + 8:r * 16 + 16, c * 16:c * 16 + 8] = blk[2]
        y[r * 16 + 8:r * 16 + 16, c * 16 + 8:c * 16 + 16] = blk[3]
        cb[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = blk[4]
        cr[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = blk[5]
    cb = cb.repeat(2, axis=0).repeat(2, axis=1).astype(np.float64)
    cr = cr.repeat(2, axis=0).repeat(2, axis=1).astype(np.float64)
    rgb = _ycbcr_to_rgb(y.astype(np.float64), cb, cr)
    return rgb[:seq.h, :seq.w]


def _as_es(buf: bytes) -> bytes:
    if buf[:4] == b"\x00\x00\x01\xba":
        return demux_mpeg_ps(buf)
    return buf


def decode_mpeg1(buf: bytes) -> np.ndarray:
    """MPEG-1 video ES (or PS) -> (N,H,W,3) uint8 RGB of the I pictures.
    Raises on P/B pictures — use ``extract_mpeg_frames`` with I-picture
    indices for mixed streams."""
    es = _as_es(buf)
    out = [_decode_picture(pt, sl, seq) for pt, sl, seq in _iter_pictures(es)]
    if not out:
        raise ValueError("no pictures in MPEG-1 stream")
    return np.stack(out)


def extract_mpeg_frames(buf: bytes, indices) -> list[np.ndarray]:
    """Decode only the requested picture indices (container walk skips
    the rest — the seek shape for sampling)."""
    want = set(int(i) for i in indices)
    out: dict[int, np.ndarray] = {}
    es = _as_es(buf)
    for i, (pt, sl, seq) in enumerate(_iter_pictures(es)):
        if i in want:
            out[i] = _decode_picture(pt, sl, seq)
    missing = want - set(out)
    if missing:
        raise IndexError(f"frame indices {sorted(missing)} out of range")
    return [out[i] for i in sorted(want)]


def count_mpeg_frames(buf: bytes) -> int:
    """Exact picture count by start-code scan, O(bytes), no entropy
    decode (start-code emulation is impossible in valid streams)."""
    es = _as_es(buf)
    return sum(1 for _, c in _start_codes(es) if c == 0x00)


def mpeg_dims(buf: bytes) -> tuple[int, int]:
    """(width, height) from the first sequence header."""
    es = _as_es(buf)
    for off, code in _start_codes(es):
        if code == 0xB3:
            br = _BitReader(es[off + 4:off + 8])
            return br.read(12), br.read(12)
    raise ValueError("no sequence header")


# -- ISO 11172-1 program stream ----------------------------------------------

def mux_mpeg_ps(es: bytes, packet_size: int = 2048) -> bytes:
    """Wrap a video ES in a minimal MPEG-1 program stream: one pack with
    a system header, then MPEG-1-format PES packets for stream 0xE0."""
    out = bytearray()
    out += struct.pack(">I", 0x000001BA)
    bw = _BW()
    scr = 0
    bw.write(0b0010, 4)
    bw.write((scr >> 30) & 0x7, 3)
    bw.write(1, 1)
    bw.write((scr >> 15) & 0x7FFF, 15)
    bw.write(1, 1)
    bw.write(scr & 0x7FFF, 15)
    bw.write(1, 1)
    bw.write(1, 1)
    bw.write(20000, 22)  # mux_rate (x50 bytes/s)
    bw.write(1, 1)
    out += bw.buf
    # system header: one video stream bound entry
    out += struct.pack(">I", 0x000001BB)
    body = _BW()
    body.write(1, 1)
    body.write(20000, 22)
    body.write(1, 1)
    body.write(0, 6)   # audio_bound
    body.write(0, 1)   # fixed_flag
    body.write(0, 1)   # CSPS_flag
    body.write(0, 1)   # system_audio_lock
    body.write(0, 1)   # system_video_lock
    body.write(1, 1)
    body.write(1, 5)   # video_bound
    body.write(0xFF, 8)  # reserved
    body.write(0xE0, 8)  # stream_id
    body.write(0b11, 2)
    body.write(1, 1)   # STD_buffer_bound_scale (video)
    body.write(46, 13)  # STD_buffer_size_bound (x1024 bytes)
    out += struct.pack(">H", len(body.buf)) + body.buf
    for k in range(0, len(es), packet_size):
        chunk = es[k:k + packet_size]
        # MPEG-1 PES: no-timestamp marker byte 0x0F
        out += struct.pack(">IH", 0x000001E0, len(chunk) + 1) + b"\x0f" + chunk
    out += struct.pack(">I", 0x000001B9)
    return bytes(out)


def demux_mpeg_ps(buf: bytes) -> bytes:
    """Extract the concatenated video ES (streams 0xE0-0xEF) from an
    MPEG-1 program stream: walks pack/system headers, strips PES
    stuffing, STD and PTS/DTS fields."""
    es = bytearray()
    pos = 0
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos:pos + 3] != b"\x00\x00\x01":
            pos += 1
            continue
        sid = buf[pos + 3]
        if sid == 0xBA:
            pos += 12  # pack header: start code + 8 body bytes
            continue
        if sid == 0xB9:
            break
        if sid < 0xB9:  # a raw video start code: ES was passed in directly
            return bytes(buf[pos:])
        length = struct.unpack(">H", buf[pos + 4:pos + 6])[0]
        body = buf[pos + 6:pos + 6 + length]
        pos += 6 + length
        if not (0xE0 <= sid <= 0xEF):
            continue  # system header / padding / audio
        i = 0
        while i < len(body) and body[i] == 0xFF:  # stuffing
            i += 1
        if i < len(body) and body[i] >> 6 == 0b01:  # STD buffer fields
            i += 2
        if i < len(body):
            top = body[i] >> 4
            if top == 0b0010:  # PTS
                i += 5
            elif top == 0b0011:  # PTS + DTS
                i += 10
            else:  # '00001111' no-timestamp marker
                i += 1
        es += body[i:]
    return bytes(es)
