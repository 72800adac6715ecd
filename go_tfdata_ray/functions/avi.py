"""From-spec AVI (RIFF) container walk — the general-video seam.

AVI is Microsoft's RIFF-based video container (public spec: the
`AVIMAINHEADER`/`AVISTREAMHEADER`/`idx1` layout documented in the
Windows Multimedia "AVI RIFF File Reference"). Everything here is a
CONTAINER parse, not a pixel decode — frame payloads come out as the
raw stream chunks (for MJPEG-in-AVI each ``00dc`` chunk is a complete
baseline JPEG, decodable by ``functions/jpeg.py``), matching the cost
model of ``FrameSampler``: sampling touches container structure only,
and only the sampled frames are ever pixel-decoded downstream.

Layout parsed::

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' <56-byte main header>          # frames/streams/dims
        LIST 'strl'                            # one per stream
          'strh' <56-byte stream header>       # 'vids'/'auds', handler
          'strf' <format blob>                 # BITMAPINFOHEADER for vids
      LIST 'movi'
        '00dc' <frame bytes> ...               # stream-00 compressed video
        (LIST 'rec ' groupings are recursed)
    'idx1' <16-byte entries>                   # optional seek index

Scale shape: ``avi_frame_index`` prefers the ``idx1`` index — O(index
bytes), not O(file) — so sampling N of F frames slices exactly N chunks
out of the payload; the ``movi`` walk is the fallback for index-less
files. Both paths return identical (offset, size) lists (pytest-pinned).

Writer ``encode_avi_mjpeg`` builds a minimal valid single-stream
MJPEG AVI (with idx1) for tests and synthetic media tables.
"""

from __future__ import annotations

import struct


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _iter_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each RIFF chunk in
    [pos, end). Chunk bodies are word-aligned (odd sizes carry a pad
    byte that is NOT part of the body)."""
    while pos + 8 <= end:
        fcc = buf[pos:pos + 4]
        size = _u32(buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"truncated RIFF chunk {fcc!r} at offset {pos}: "
                f"size {size} exceeds container")
        yield fcc, body, size
        pos = body + size + (size & 1)


def _require_avi(buf: bytes) -> int:
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/'AVI ' signature")
    return min(8 + _u32(buf, 4), len(buf))


def is_avi(buf: bytes) -> bool:
    return len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI "


def avi_info(buf: bytes) -> dict:
    """Parse the main + first-video-stream headers: width, height, fps,
    n_frames (as declared by ``avih`` — the container WALK in
    ``count_avi_frames`` is the ground truth), handler fourcc."""
    end = _require_avi(buf)
    info: dict = {}
    for fcc, body, size in _iter_chunks(buf, 12, end):
        if fcc != b"LIST" or buf[body:body + 4] != b"hdrl":
            continue
        for f2, b2, s2 in _iter_chunks(buf, body + 4, body + size):
            if f2 == b"avih":
                usec = _u32(buf, b2)
                info.update(
                    n_frames=_u32(buf, b2 + 16),
                    n_streams=_u32(buf, b2 + 24),
                    width=_u32(buf, b2 + 32),
                    height=_u32(buf, b2 + 36),
                    fps=round(1e6 / usec, 3) if usec else 0.0,
                )
            elif f2 == b"LIST" and buf[b2:b2 + 4] == b"strl":
                for f3, b3, s3 in _iter_chunks(buf, b2 + 4, b2 + s2):
                    if (f3 == b"strh" and buf[b3:b3 + 4] == b"vids"
                            and "handler" not in info):
                        scale = _u32(buf, b3 + 20) or 1
                        info["handler"] = buf[b3 + 4:b3 + 8].decode(
                            "ascii", "replace").strip()
                        info["stream_fps"] = round(
                            _u32(buf, b3 + 24) / scale, 3)
                        info["stream_length"] = _u32(buf, b3 + 32)
        break
    if not info:
        raise ValueError("AVI has no hdrl header list")
    return info


def _movi_bounds(buf: bytes) -> tuple[int, int]:
    end = _require_avi(buf)
    for fcc, body, size in _iter_chunks(buf, 12, end):
        if fcc == b"LIST" and buf[body:body + 4] == b"movi":
            return body, body + size
    raise ValueError("AVI has no movi list")


def _stream_ckids(stream: int) -> tuple[bytes, bytes]:
    sid = f"{stream:02d}".encode()
    return sid + b"dc", sid + b"db"  # compressed / uncompressed video


def _walk_frames(buf: bytes, stream: int) -> list[tuple[int, int]]:
    """(body_offset, size) per video chunk of ``stream``, movi-order,
    recursing into LIST 'rec ' interleave groupings."""
    dc, db = _stream_ckids(stream)
    out: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        for fcc, body, size in _iter_chunks(buf, pos, end):
            if fcc == b"LIST" and buf[body:body + 4] == b"rec ":
                walk(body + 4, body + size)
            elif fcc in (dc, db):
                out.append((body, size))

    movi_start, movi_end = _movi_bounds(buf)
    walk(movi_start + 4, movi_end)
    return out


def _index_frames(buf: bytes, stream: int) -> list[tuple[int, int]] | None:
    """(body_offset, size) per video chunk from the ``idx1`` index —
    O(index), never touches movi bytes. Returns None when the file has
    no index. Handles both offset conventions in the wild: relative to
    the 'movi' fourcc (the spec'd form) and absolute file offsets
    (validated against the chunk id actually present at the offset)."""
    end = _require_avi(buf)
    idx_body = idx_size = None
    for fcc, body, size in _iter_chunks(buf, 12, end):
        if fcc == b"idx1":
            idx_body, idx_size = body, size
            break
    if idx_body is None:
        return None
    movi_start, _ = _movi_bounds(buf)
    dc, db = _stream_ckids(stream)
    out: list[tuple[int, int]] = []
    base: int | None = None
    for off in range(idx_body, idx_body + (idx_size // 16) * 16, 16):
        ckid = buf[off:off + 4]
        if ckid not in (dc, db):
            continue
        pos, size = _u32(buf, off + 8), _u32(buf, off + 12)
        if base is None:
            # disambiguate the two conventions by checking which base
            # lands the stored offset on this entry's chunk id
            if buf[movi_start + pos:movi_start + pos + 4] == ckid:
                base = movi_start
            elif buf[pos:pos + 4] == ckid:
                base = 0
            else:
                raise ValueError("idx1 offsets match neither convention")
        out.append((base + pos + 8, size))  # +8: skip ckid + size header
    return out


def avi_frame_index(buf: bytes, stream: int = 0) -> list[tuple[int, int]]:
    """(payload_offset, size) of every video frame of ``stream``, via
    ``idx1`` when present (seek path) else the movi walk."""
    idx = _index_frames(buf, stream)
    return idx if idx is not None else _walk_frames(buf, stream)


def count_avi_frames(buf: bytes, stream: int = 0) -> int:
    return len(avi_frame_index(buf, stream))


def split_avi_frames(buf: bytes, stream: int = 0) -> list[bytes]:
    """Every frame payload, in stream order (MJPEG-in-AVI: each is a
    complete baseline JPEG)."""
    return [buf[o:o + s] for o, s in avi_frame_index(buf, stream)]


def extract_avi_frames(buf: bytes, indices, stream: int = 0) -> list[bytes]:
    """Only the requested frames — the sampling path: with an idx1 index
    this reads O(index) + the selected chunks, never the full movi."""
    idx = avi_frame_index(buf, stream)
    return [buf[idx[i][0]:idx[i][0] + idx[i][1]] for i in indices]


# ---------------------------------------------------------------------------
# writer (tests / synthetic media tables)
# ---------------------------------------------------------------------------

def _chunk(fcc: bytes, body: bytes) -> bytes:
    return fcc + struct.pack("<I", len(body)) + body + (b"\0" if len(body) & 1 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(frames: list[bytes], fps: int = 10,
                     width: int = 16, height: int = 16) -> bytes:
    """Minimal valid single-stream MJPEG AVI: hdrl (avih + vids strl with
    a BITMAPINFOHEADER strf), movi of ``00dc`` chunks, and an idx1 index
    (movi-relative offsets, AVIIF_KEYFRAME on every frame — MJPEG frames
    are all intra-coded)."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    n = len(frames)
    maxf = max(len(f) for f in frames)
    avih = struct.pack(
        "<10I", 1_000_000 // max(fps, 1), maxf * fps, 0,
        0x10 | 0x100,  # AVIF_HASINDEX | AVIF_ISINTERLEAVED
        n, 0, 1, maxf, width, height) + b"\0" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0,
                                            1, fps, 0, n, maxf, 0xFFFF, 0)
            + struct.pack("<4h", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_body = b"movi"
    idx = b""
    for f in frames:
        # idx1 offset = position of the chunk's fourcc relative to the
        # 'movi' fourcc (the spec'd convention)
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(f))
        movi_body += _chunk(b"00dc", f)
    riff = b"AVI " + hdrl + _chunk(b"LIST", movi_body) + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
