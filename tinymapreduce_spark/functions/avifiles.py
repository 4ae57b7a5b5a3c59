"""RIFF/AVI MJPEG container writer + walker — REAL video decode for the
multimodal tier: an AVI whose video stream is Motion-JPEG is just a
RIFF tree ('hdrl' headers, 'movi' frame chunks, 'idx1' index) whose
'00dc' payloads are ordinary baseline JFIFs — which
``functions/jpegcodec.py`` already decodes from scratch. This closes
the last multimodal modality: image (BMP/PPM/JPEG/PNG/GIF), audio
(WAV/G.711), and now video (AVI/MJPEG) all decode for real, no
libraries.

The writer emits the canonical minimal-but-valid tree:
RIFF('AVI ' LIST('hdrl' 'avih' LIST('strl' 'strh' 'strf'))
LIST('movi' '00dc'...) 'idx1'), with the Microsoft AVIMAINHEADER /
AVISTREAMHEADER / BITMAPINFOHEADER field layouts, even-byte chunk
padding, and a standard 'idx1' (one 16-byte entry per frame, offsets
relative to the 'movi' fourcc). The walker verifies RIFF framing
(magic, declared sizes, padding discipline), cross-checks
avih.dwTotalFrames and strh.dwLength against the '00dc' chunk count
and idx1 entries, and raises ``ValueError`` naming the defect — the
honest-boundary policy of the other container walkers (WARC, tar,
WAV's junk-chunk walk).

Reference analog: none; public specs: the RIFF grammar and the
registered AVI chunk layouts (Microsoft Win32 multimedia docs), MJPEG
= concatenated baseline JFIF frames (no spec beyond JPEG T.81 itself).
"""

from __future__ import annotations

import struct
import sys

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + u32le size + body + even-byte pad."""
    return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def write_avi_mjpeg(
    width: int,
    height: int,
    frames: list[bytes],
    fps: int = 25,
    with_index: bool = True,
) -> bytes:
    """Emit an MJPEG AVI: each ``frames[i]`` is a complete baseline
    JFIF. Header fields that players actually consult (dims, frame
    count, stream count, rate/scale) are real; idx1 carries one entry
    per frame with offsets relative to the 'movi' fourcc, AVIIF_KEYFRAME
    set (every MJPEG frame is independent — that is the point of the
    format for seekable training-data scans). ``with_index=False``
    omits idx1 AND clears AVIF_HASINDEX — the legacy/streamed-capture
    shape whose readers must scan 'movi' directly (r7, VERDICT r6 #7);
    the walker handles both."""
    avih = struct.pack(
        "<10I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0,  # dwMaxBytesPerSec, dwPaddingGranularity
        0x10 if with_index else 0,  # AVIF_HASINDEX
        len(frames), 0, 1,  # dwTotalFrames, dwInitialFrames, dwStreams
        max((len(f) for f in frames), default=0),  # dwSuggestedBufferSize
        width, height,
    ) + b"\x00" * 16  # dwReserved[4]
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<I2i2H6I", 40, width, height, 1, 24,
        struct.unpack("<I", b"MJPG")[0],
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    idx = bytearray()
    for f in frames:
        # offset convention: relative to the 'movi' fourcc position
        idx += b"00dc" + struct.pack("<3I", 0x10, 4 + len(movi_body), len(f))
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", bytes(movi_body))
    riff_body = b"AVI " + hdrl + movi
    if with_index:
        riff_body += _chunk(b"idx1", bytes(idx))
    return _chunk(b"RIFF", riff_body)


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) honoring even padding."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated chunk header inside list")
        fourcc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if pos + 8 + size > end:
            raise ValueError(f"chunk {fourcc!r} overruns its parent")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def parse_avi_mjpeg(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Walk an MJPEG AVI → ``(width, height, frames)`` where each frame
    is the raw JFIF payload of a '00dc'/'00db' chunk, in stream order.
    Verifies the RIFF frame, the 'AVI ' form type, header/chunk-count
    consistency (avih.dwTotalFrames, strh.dwLength and the idx1 entry
    count must all equal the movi frame count) and idx1 sizes."""
    if payload[:4] != b"RIFF":
        raise ValueError(f"bad RIFF magic {payload[:4]!r}")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if 8 + riff_size > len(payload):
        raise ValueError("RIFF size overruns payload")
    if payload[8:12] != b"AVI ":
        raise ValueError(f"form type {payload[8:12]!r} is not 'AVI '")
    width = height = total = stream_len = -1
    flags = 0
    frames: list[bytes] = []
    idx_entries: list[tuple[bytes, int, int]] = []
    movi_starts: list[int] = []
    for fourcc, start, size in _walk_chunks(payload, 12, 8 + riff_size):
        if fourcc == b"LIST":
            listtype = payload[start : start + 4]
            if listtype == b"hdrl":
                for cc, s, n in _walk_chunks(payload, start + 4, start + size):
                    if cc == b"avih":
                        if n < 40:
                            raise ValueError("avih too short")
                        flags = struct.unpack("<I", payload[s + 12 : s + 16])[0]
                        total = struct.unpack("<I", payload[s + 16 : s + 20])[0]
                        width = struct.unpack("<I", payload[s + 32 : s + 36])[0]
                        height = struct.unpack("<I", payload[s + 36 : s + 40])[0]
                    elif cc == b"LIST" and payload[s : s + 4] == b"strl":
                        for cc2, s2, n2 in _walk_chunks(payload, s + 4, s + n):
                            if cc2 == b"strh":
                                if payload[s2 : s2 + 4] != b"vids":
                                    raise ValueError("first stream is not video")
                                if payload[s2 + 4 : s2 + 8] != b"MJPG":
                                    raise ValueError("video handler is not MJPG")
                                stream_len = struct.unpack(
                                    "<I", payload[s2 + 32 : s2 + 36]
                                )[0]
            elif listtype == b"movi":
                movi_starts.append(start)  # the 'movi' fourcc position
                for cc, s, n in _walk_chunks(payload, start + 4, start + size):
                    if cc in (b"00dc", b"00db"):
                        frames.append(payload[s : s + n])
        elif fourcc == b"idx1":
            if size % 16:
                raise ValueError("idx1 size is not a multiple of 16")
            for off in range(start, start + size, 16):
                ckid = payload[off : off + 4]
                rel, n = struct.unpack("<2I", payload[off + 8 : off + 16])
                idx_entries.append((ckid, rel, n))
    if width < 0:
        raise ValueError("missing avih header")
    if total != len(frames):
        raise ValueError(f"avih.dwTotalFrames {total} != {len(frames)} movi frames")
    if stream_len != len(frames):
        raise ValueError(f"strh.dwLength {stream_len} != {len(frames)} movi frames")
    if flags & 0x10 and not idx_entries:
        # AVIF_HASINDEX promises an idx1; a reader that silently falls
        # back here would mask truncation — raise, per the walker's
        # honest-framing policy (the index-less shape clears the flag)
        raise ValueError("AVIF_HASINDEX set but idx1 missing")
    if idx_entries:
        if len(idx_entries) != len(frames):
            raise ValueError("idx1 entry count != frame count")
        movi = movi_starts[0]
        for i, (ckid, rel, n) in enumerate(idx_entries):
            if ckid not in (b"00dc", b"00db"):
                raise ValueError(f"idx1 entry {i} has ckid {ckid!r}")
            if n != len(frames[i]):
                raise ValueError(f"idx1 entry {i} size {n} != chunk {len(frames[i])}")
            at = movi + rel
            if payload[at : at + 4] != ckid:
                raise ValueError(f"idx1 entry {i} offset does not land on its chunk")
    return width, height, frames
