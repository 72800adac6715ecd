"""From-spec MP4 (ISO base media file format) container walk.

MP4/ISO-BMFF is the ISO/IEC 14496-12 box format: length-prefixed,
big-endian, nested boxes. Like ``functions/avi.py`` this is a CONTAINER
parse, not a pixel decode — frame payloads come out as the raw sample
bytes (for MJPEG-in-MP4, sample-description fourcc ``jpeg``, each sample
is a complete baseline JPEG decodable by ``functions/jpeg.py``).

Boxes parsed::

    ftyp                          # brand
    moov                          # metadata container
      mvhd                        # movie timescale/duration (v0 + v1)
      trak
        tkhd                      # track id, 16.16 fixed width/height
        mdia
          mdhd                    # media timescale/duration (v0 + v1)
          hdlr                    # handler type: 'vide' selects the track
          minf / stbl             # the sample tables:
            stsd                  #   sample descriptions (codec fourcc)
            stts                  #   decode deltas (frame count check)
            stsc                  #   sample→chunk run-length map
            stsz                  #   per-sample sizes (or uniform)
            stco / co64           #   32/64-bit absolute chunk offsets
      mvex / trex                 # fMP4: per-track sample defaults
    mdat                          # raw sample bytes (never walked)
    moof                          # fMP4/DASH fragments:
      mfhd                        #   sequence number
      traf / tfhd                 #   per-fragment defaults + base offset
             trun                 #   per-sample size/duration runs
    mdat                          #   fragment payload (never walked)

Scale shape: unlike AVI — where an index-less file forces an O(file)
``movi`` walk — MP4 sample tables are MANDATORY, so ``mp4_frame_index``
is always O(sample tables + fragment headers): every frame's
(absolute_offset, size) is computed from stsz x stsc x stco (plus
moof/tfhd/trun runs for fragmented files) without touching ``mdat``.
Sampling N of F frames therefore slices exactly N byte ranges out of
the payload, the same cost model as ``FrameSampler``'s other legs.

Writers ``encode_mp4_mjpeg`` (progressive layout; ``samples_per_chunk``
> 1 exercises real stsc run-length expansion, ``moov_first`` the
faststart ordering, ``wide`` the 64-bit v1/co64/largesize shapes) and
``encode_fmp4_mjpeg`` (fragmented/DASH layout) build minimal valid
single-track MJPEG files for tests and synthetic media tables.
"""

from __future__ import annotations

import struct


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from(">H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from(">I", b, off)[0]


def _u64(b: bytes, off: int) -> int:
    return struct.unpack_from(">Q", b, off)[0]


def is_mp4(buf: bytes) -> bool:
    return len(buf) >= 12 and buf[4:8] == b"ftyp"


def _iter_boxes(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [pos, end).
    Handles 64-bit ``largesize`` (size==1) and to-end boxes (size==0)."""
    while pos + 8 <= end:
        size = _u32(buf, pos)
        fcc = buf[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError(f"truncated largesize box {fcc!r} at {pos}")
            size = _u64(buf, body)
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if box_end > end or box_end < body:
            raise ValueError(
                f"truncated MP4 box {fcc!r} at offset {pos}: "
                f"end {box_end} exceeds container {end}")
        yield fcc, body, box_end
        pos = box_end


def _find(buf: bytes, pos: int, end: int, fcc: bytes) -> tuple[int, int]:
    for f, b, e in _iter_boxes(buf, pos, end):
        if f == fcc:
            return b, e
    raise ValueError(f"MP4 missing required box {fcc!r}")


def _full(buf: bytes, body: int) -> tuple[int, int]:
    """FullBox header: (version, first-field offset past version/flags)."""
    return buf[body], body + 4


def _video_stbl(buf: bytes) -> tuple[int, int, dict]:
    """Locate the first 'vide' track's stbl; returns (stbl_body, stbl_end,
    info) where info carries tkhd/mdhd/stsd fields gathered on the way."""
    if not is_mp4(buf):
        raise ValueError("not an MP4: missing ftyp box")
    moov_b, moov_e = _find(buf, 0, len(buf), b"moov")
    info: dict = {}
    mv_b, _mv_e = _find(buf, moov_b, moov_e, b"mvhd")
    ver, p = _full(buf, mv_b)
    if ver == 1:
        info["timescale"] = _u32(buf, p + 16)
        info["duration"] = _u64(buf, p + 20)
    else:
        info["timescale"] = _u32(buf, p + 8)
        info["duration"] = _u32(buf, p + 12)
    for f, b, e in _iter_boxes(buf, moov_b, moov_e):
        if f != b"trak":
            continue
        mdia_b, mdia_e = _find(buf, b, e, b"mdia")
        h_b, _h_e = _find(buf, mdia_b, mdia_e, b"hdlr")
        if buf[h_b + 8:h_b + 12] != b"vide":
            continue
        tk_b, _tk_e = _find(buf, b, e, b"tkhd")
        ver, p = _full(buf, tk_b)
        info["track_id"] = _u32(buf, p + (16 if ver == 1 else 8))
        base = p + (32 if ver == 1 else 20)  # past ids/times/duration
        # reserved(8) layer(2) alternate(2) volume(2) reserved(2) matrix(36)
        info["width"] = _u32(buf, base + 52) / 65536.0
        info["height"] = _u32(buf, base + 56) / 65536.0
        md_b, _md_e = _find(buf, mdia_b, mdia_e, b"mdhd")
        ver, p = _full(buf, md_b)
        if ver == 1:
            info["media_timescale"] = _u32(buf, p + 16)
            info["media_duration"] = _u64(buf, p + 20)
        else:
            info["media_timescale"] = _u32(buf, p + 8)
            info["media_duration"] = _u32(buf, p + 12)
        minf_b, minf_e = _find(buf, mdia_b, mdia_e, b"minf")
        stbl_b, stbl_e = _find(buf, minf_b, minf_e, b"stbl")
        sd_b, _sd_e = _find(buf, stbl_b, stbl_e, b"stsd")
        _ver, p = _full(buf, sd_b)
        if _u32(buf, p):  # entry_count
            info["codec"] = buf[p + 8:p + 12].decode("ascii", "replace")
        # fragmented files: mvex/trex carries per-track sample defaults
        for f2, b2, e2 in _iter_boxes(buf, moov_b, moov_e):
            if f2 != b"mvex":
                continue
            for f3, b3, _e3 in _iter_boxes(buf, b2, e2):
                if f3 == b"trex" and _u32(buf, b3 + 4) == info["track_id"]:
                    # version/flags(4) track(4) desc_idx(4) duration(4) size(4)
                    info["default_sample_size"] = _u32(buf, b3 + 16)
        return stbl_b, stbl_e, info
    raise ValueError("MP4 has no video ('vide' handler) track")


def _sample_sizes(buf: bytes, stbl_b: int, stbl_e: int) -> list[int]:
    sz_b, _ = _find(buf, stbl_b, stbl_e, b"stsz")
    _ver, p = _full(buf, sz_b)
    uniform, count = _u32(buf, p), _u32(buf, p + 4)
    if uniform:
        return [uniform] * count
    return [_u32(buf, p + 8 + 4 * i) for i in range(count)]


def _chunk_offsets(buf: bytes, stbl_b: int, stbl_e: int) -> list[int]:
    try:
        co_b, _ = _find(buf, stbl_b, stbl_e, b"stco")
        wide = False
    except ValueError:
        co_b, _ = _find(buf, stbl_b, stbl_e, b"co64")
        wide = True
    _ver, p = _full(buf, co_b)
    n = _u32(buf, p)
    if wide:
        return [_u64(buf, p + 4 + 8 * i) for i in range(n)]
    return [_u32(buf, p + 4 + 4 * i) for i in range(n)]


def _samples_per_chunk(buf: bytes, stbl_b: int, stbl_e: int,
                       n_chunks: int) -> list[int]:
    """Expand stsc's (first_chunk, samples_per_chunk) runs to one count
    per chunk — each run extends to the next entry's first_chunk."""
    sc_b, _ = _find(buf, stbl_b, stbl_e, b"stsc")
    _ver, p = _full(buf, sc_b)
    n = _u32(buf, p)
    runs = [(_u32(buf, p + 4 + 12 * i), _u32(buf, p + 8 + 12 * i))
            for i in range(n)]
    out: list[int] = []
    for i, (first, spc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        out.extend([spc] * (last - first + 1))
    if len(out) != n_chunks:
        raise ValueError(
            f"stsc expands to {len(out)} chunks, stco declares {n_chunks}")
    return out


def mp4_info(buf: bytes) -> dict:
    """Movie/track headers + sample-table frame count: width, height,
    fps (media timescale over per-frame delta), n_frames, codec fourcc."""
    stbl_b, stbl_e, info = _video_stbl(buf)
    n = len(_sample_sizes(buf, stbl_b, stbl_e))
    if not n:  # fragmented layout: samples live in moof/trun runs
        n = len(_fragment_index(buf, info["track_id"],
                                info.get("default_sample_size", 0)))
    info["n_frames"] = n
    tt_b, _ = _find(buf, stbl_b, stbl_e, b"stts")
    _ver, p = _full(buf, tt_b)
    if _u32(buf, p):  # entry_count: (count, delta) of the first run
        delta = _u32(buf, p + 8) or 1
        info["fps"] = round(info["media_timescale"] / delta, 3)
    return info


def _fragment_index(buf: bytes, track_id: int,
                    default_size: int) -> list[tuple[int, int]]:
    """(absolute_offset, size) per sample across every ``moof`` fragment
    (fMP4/DASH layout): tfhd carries per-fragment defaults and the base
    offset (explicit u64, or moof-relative per the default-base-is-moof
    flag / first-trun convention); trun carries per-sample sizes. Only
    moof headers are walked — mdat payload bytes are never touched."""
    out: list[tuple[int, int]] = []
    for fcc, body, end in _iter_boxes(buf, 0, len(buf)):
        if fcc != b"moof":
            continue
        moof_start = body - 8
        for f2, b2, e2 in _iter_boxes(buf, body, end):
            if f2 != b"traf":
                continue
            tf_b, _tf_e = _find(buf, b2, e2, b"tfhd")
            flags = int.from_bytes(buf[tf_b + 1:tf_b + 4], "big")
            p = tf_b + 4
            if _u32(buf, p) != track_id:
                continue
            p += 4
            base: int | None = None
            if flags & 0x01:  # base-data-offset-present
                base = _u64(buf, p)
                p += 8
            if flags & 0x02:  # sample-description-index-present
                p += 4
            if flags & 0x08:  # default-sample-duration-present
                p += 4
            frag_size = default_size
            if flags & 0x10:  # default-sample-size-present
                frag_size = _u32(buf, p)
                p += 4
            if base is None:  # default-base-is-moof (0x20000) / first-trun
                base = moof_start
            pos = base
            for f3, b3, _e3 in _iter_boxes(buf, b2, e2):
                if f3 != b"trun":
                    continue
                tflags = int.from_bytes(buf[b3 + 1:b3 + 4], "big")
                q = b3 + 4
                n = _u32(buf, q)
                q += 4
                if tflags & 0x01:  # data-offset-present (signed, base-rel)
                    pos = base + struct.unpack_from(">i", buf, q)[0]
                    q += 4
                if tflags & 0x04:  # first-sample-flags-present
                    q += 4
                per = (4 if tflags & 0x100 else 0)  # sample-duration
                for _ in range(n):
                    q += per
                    if tflags & 0x200:  # sample-size-present
                        size = _u32(buf, q)
                        q += 4
                    else:
                        size = frag_size
                    if tflags & 0x400:  # sample-flags
                        q += 4
                    if tflags & 0x800:  # composition-time-offset
                        q += 4
                    if not size:
                        raise ValueError(
                            "fMP4 sample has no size in trun, tfhd or trex")
                    out.append((pos, size))
                    pos += size
    return out


def mp4_frame_index(buf: bytes) -> list[tuple[int, int]]:
    """(absolute_offset, size) of every video sample, decode order,
    computed purely from the sample tables — stsz x stsc x stco/co64 for
    the progressive layout, plus moof/tfhd/trun fragment runs for
    fMP4/DASH files — O(tables + fragment headers); ``mdat`` is never
    walked (MP4's tables are mandatory, so unlike AVI there is no
    O(file) fallback to need)."""
    stbl_b, stbl_e, info = _video_stbl(buf)
    sizes = _sample_sizes(buf, stbl_b, stbl_e)
    offsets = _chunk_offsets(buf, stbl_b, stbl_e)
    spc = _samples_per_chunk(buf, stbl_b, stbl_e, len(offsets))
    out: list[tuple[int, int]] = []
    s = 0
    for chunk_off, k in zip(offsets, spc):
        pos = chunk_off
        for _ in range(k):
            if s >= len(sizes):
                break
            out.append((pos, sizes[s]))
            pos += sizes[s]
            s += 1
    if s != len(sizes):
        raise ValueError(
            f"stsc/stco cover {s} samples, stsz declares {len(sizes)}")
    out.extend(_fragment_index(buf, info["track_id"],
                               info.get("default_sample_size", 0)))
    if out and max(o + sz for o, sz in out) > len(buf):
        raise ValueError("truncated MP4: last sample exceeds file size")
    return out


def count_mp4_frames(buf: bytes) -> int:
    return len(mp4_frame_index(buf))


def split_mp4_frames(buf: bytes) -> list[bytes]:
    """Every sample payload, decode order (MJPEG-in-MP4: each a complete
    baseline JPEG)."""
    return [buf[o:o + s] for o, s in mp4_frame_index(buf)]


def extract_mp4_frames(buf: bytes, indices) -> list[bytes]:
    """Only the requested frames — the sampling path reads O(sample
    tables) + the selected byte ranges."""
    idx = mp4_frame_index(buf)
    return [buf[idx[i][0]:idx[i][0] + idx[i][1]] for i in indices]


# ---------------------------------------------------------------------------
# writer (tests / synthetic media tables)
# ---------------------------------------------------------------------------

def _box(fcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fcc + body


def _fbox(fcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fcc, struct.pack(">B", version) + flags.to_bytes(3, "big") + body)


_UNITY = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _build_moov(frames: list[bytes], chunk_offs: list[int],
                stsc_runs: list[tuple[int, int]], fps: int,
                width: int, height: int, wide: bool,
                fragmented: bool = False) -> bytes:
    """moov whose size is independent of the VALUES in ``chunk_offs``
    (each offset is a fixed-width field), so a moov-first layout can be
    built by measuring a dummy moov first. ``fragmented`` writes the
    fMP4 shape: zero-entry sample tables plus an mvex/trex box — the
    samples live in moof/trun runs appended after."""
    n = len(frames)
    dur = n * 1000 // max(fps, 1)
    stsd = _fbox(b"stsd", 0, 0, struct.pack(">I", 1) + _box(
        b"jpeg",
        b"\0" * 6 + struct.pack(">H", 1)            # data_reference_index
        + struct.pack(">HH", 0, 0) + b"\0" * 12      # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)     # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)  # frame_count
        + b"\0" * 32                                  # compressorname
        + struct.pack(">Hh", 24, -1)))
    if fragmented:  # zero-entry tables: samples live in moof/trun runs
        stts = _fbox(b"stts", 0, 0, struct.pack(">I", 0))
        stsc = _fbox(b"stsc", 0, 0, struct.pack(">I", 0))
        stsz = _fbox(b"stsz", 0, 0, struct.pack(">II", 0, 0))
        stco = _fbox(b"stco", 0, 0, struct.pack(">I", 0))
    else:
        stts = _fbox(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
        stsc = _fbox(b"stsc", 0, 0, struct.pack(">I", len(stsc_runs))
                     + b"".join(struct.pack(">III", first, k, 1)
                                for first, k in stsc_runs))
        stsz = _fbox(b"stsz", 0, 0, struct.pack(">II", 0, n) + b"".join(
            struct.pack(">I", len(f)) for f in frames))
        if wide:
            stco = _fbox(b"co64", 0, 0, struct.pack(">I", len(chunk_offs))
                         + b"".join(struct.pack(">Q", o) for o in chunk_offs))
        else:
            stco = _fbox(b"stco", 0, 0, struct.pack(">I", len(chunk_offs))
                         + b"".join(struct.pack(">I", o) for o in chunk_offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _box(b"dinf", _fbox(b"dref", 0, 0, struct.pack(">I", 1)
                               + _fbox(b"url ", 0, 1, b"")))
    vmhd = _fbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _fbox(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\0" * 12 + b"VideoHandler\0")
    if wide:  # version-1 FullBoxes: 64-bit creation/modification/duration
        mdhd = _fbox(b"mdhd", 1, 0, struct.pack(">QQIQ", 0, 0, fps, n)
                     + struct.pack(">HH", 0x55C4, 0))  # language 'und'
        tkhd = _fbox(b"tkhd", 1, 7, struct.pack(">QQIIQ", 0, 0, 1, 0, dur)
                     + b"\0" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + _UNITY
                     + struct.pack(">II", width << 16, height << 16))
        mvhd = _fbox(b"mvhd", 1, 0, struct.pack(">QQIQ", 0, 0, 1000, dur)
                     + struct.pack(">IHH", 0x10000, 0x100, 0) + b"\0" * 8
                     + _UNITY + b"\0" * 24 + struct.pack(">I", 2))
    else:
        mdhd = _fbox(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, fps, n)
                     + struct.pack(">HH", 0x55C4, 0))
        tkhd = _fbox(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, dur)
                     + b"\0" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + _UNITY
                     + struct.pack(">II", width << 16, height << 16))
        mvhd = _fbox(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, dur)
                     + struct.pack(">IHH", 0x10000, 0x100, 0) + b"\0" * 8
                     + _UNITY + b"\0" * 24 + struct.pack(">I", 2))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    body = mvhd + _box(b"trak", tkhd + mdia)
    if fragmented:
        trex = _fbox(b"trex", 0, 0, struct.pack(">IIIII", 1, 1, 1, 0, 0))
        body += _box(b"mvex", trex)
    return _box(b"moov", body)


def encode_mp4_mjpeg(frames: list[bytes], fps: int = 10,
                     width: int = 16, height: int = 16,
                     samples_per_chunk: int = 3,
                     moov_first: bool = False,
                     wide: bool = False) -> bytes:
    """Minimal valid single-track MJPEG MP4: ``ftyp`` + ``mdat`` of raw
    JPEG samples + ``moov`` whose stbl indexes them. Samples are grouped
    ``samples_per_chunk`` per chunk so stsc carries a real run (plus a
    short-tail run when the last chunk is partial); stco stores absolute
    file offsets, which pins the mdat placement. ``moov_first`` writes
    the streaming layout (metadata before media, as MOV/faststart files
    do); ``wide`` writes the >4 GB shapes — version-1 mvhd/tkhd/mdhd,
    ``co64`` 64-bit chunk offsets and a largesize ``mdat``."""
    if not frames:
        raise ValueError("MJPEG MP4 needs at least one frame")
    n = len(frames)
    spc = max(1, samples_per_chunk)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_body = b"".join(frames)
    mdat_hdr = 16 if wide else 8  # largesize mdat: size=1 + 64-bit size

    chunks = [frames[i:i + spc] for i in range(0, n, spc)]
    stsc_runs = [(1, spc)]
    if len(chunks[-1]) != spc:
        if len(chunks) == 1:
            stsc_runs = [(1, len(chunks[-1]))]
        else:
            stsc_runs.append((len(chunks), len(chunks[-1])))

    def offsets(mdat_body_off: int) -> list[int]:
        offs, pos = [], mdat_body_off
        for c in chunks:
            offs.append(pos)
            pos += sum(len(f) for f in c)
        return offs

    if moov_first:
        # moov size doesn't depend on the offset VALUES — measure, place
        probe = _build_moov(frames, offsets(0), stsc_runs, fps,
                            width, height, wide)
        body_off = len(ftyp) + len(probe) + mdat_hdr
    else:
        body_off = len(ftyp) + mdat_hdr
    moov = _build_moov(frames, offsets(body_off), stsc_runs, fps,
                       width, height, wide)
    if wide:
        mdat = (struct.pack(">I", 1) + b"mdat"
                + struct.pack(">Q", 16 + len(mdat_body)) + mdat_body)
    else:
        mdat = _box(b"mdat", mdat_body)
    return ftyp + (moov + mdat if moov_first else mdat + moov)


def encode_fmp4_mjpeg(frames: list[bytes], fps: int = 10,
                      width: int = 16, height: int = 16,
                      frames_per_fragment: int = 2,
                      use_default_size: bool = False) -> bytes:
    """Fragmented MP4 (the fMP4/DASH streaming layout): ``ftyp`` +
    ``moov`` with ZERO-entry sample tables and an ``mvex/trex``, then one
    ``moof`` + ``mdat`` pair per fragment. Each moof's tfhd sets
    default-base-is-moof and its trun carries data-offset + per-sample
    sizes; ``use_default_size`` instead writes one default-sample-size in
    tfhd and omits trun sizes (requires all samples equal-length — the
    fixed-record shape), covering the tfhd/trex default fallbacks."""
    if not frames:
        raise ValueError("fragmented MJPEG MP4 needs at least one frame")
    if use_default_size and len({len(f) for f in frames}) != 1:
        raise ValueError("use_default_size requires equal-length samples")
    fpf = max(1, frames_per_fragment)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso6mp41")
    moov = _build_moov(frames, [], [], fps, width, height, wide=False,
                       fragmented=True)
    out = ftyp + moov
    for seq, lo in enumerate(range(0, len(frames), fpf), start=1):
        group = frames[lo:lo + fpf]
        mfhd = _fbox(b"mfhd", 0, 0, struct.pack(">I", seq))
        if use_default_size:
            # tfhd: default-base-is-moof | default-sample-size-present
            tfhd = _fbox(b"tfhd", 0, 0x020010,
                         struct.pack(">II", 1, len(group[0])))
            trun_body = struct.pack(">Ii", len(group), 0)  # count, offset
            tr_flags = 0x000001  # data-offset only
        else:
            tfhd = _fbox(b"tfhd", 0, 0x020000, struct.pack(">I", 1))
            trun_body = (struct.pack(">Ii", len(group), 0)
                         + b"".join(struct.pack(">I", len(f)) for f in group))
            tr_flags = 0x000201  # data-offset + sample-size
        trun = _fbox(b"trun", 0, tr_flags, trun_body)
        moof = _box(b"moof", mfhd + _box(b"traf", tfhd + trun))
        # patch the trun data offset: mdat body starts right after moof
        data_off = len(moof) + 8
        at = moof.rfind(trun) + 8 + 4 + 4  # box hdr + version/flags + count
        moof = moof[:at] + struct.pack(">i", data_off) + moof[at + 4:]
        out += moof + _box(b"mdat", b"".join(group))
    return out
