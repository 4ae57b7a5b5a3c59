"""RIFF/AVI MJPEG container walker (functions/avifiles.py): framing
roundtrip, idx1 cross-checks, header-consistency rejections, even-byte
padding discipline, and end-to-end frame-pixel parity through the real
baseline JPEG codec."""

from __future__ import annotations

import struct

import pytest

from tinymapreduce_spark.functions.avifiles import parse_avi_mjpeg, write_avi_mjpeg
from tinymapreduce_spark.operators.multimodal import (
    VID_FRAMES,
    VID_H,
    VID_W,
    _vid_frame_jpeg,
)


def _avi(d: int) -> bytes:
    frames = [_vid_frame_jpeg(d, f) for f in range(VID_FRAMES(d))]
    return write_avi_mjpeg(VID_W(d), VID_H, frames)


def test_roundtrip_and_frame_order():
    for d in [0, 1, 2, 3, 9]:
        frames = [_vid_frame_jpeg(d, f) for f in range(VID_FRAMES(d))]
        w, h, back = parse_avi_mjpeg(write_avi_mjpeg(VID_W(d), VID_H, frames))
        assert (w, h) == (VID_W(d), VID_H)
        assert back == frames  # stream order, byte-exact


def test_odd_sized_frames_pad_to_even():
    # a JFIF of odd length forces the chunk pad byte; the next chunk
    # must still be found (pad discipline) and payloads stay exact
    frames = [b"\xff\xd8" + b"x" * 3 + b"\xff\xd9", b"\xff\xd8" + b"y" * 4 + b"\xff\xd9"]
    assert len(frames[0]) % 2 == 1
    w, h, back = parse_avi_mjpeg(write_avi_mjpeg(8, 8, frames))
    assert back == frames


def test_header_consistency_rejections():
    blob = bytearray(_avi(3))
    bad = blob.copy()
    bad[:4] = b"RIFX"
    with pytest.raises(ValueError, match="RIFF magic"):
        parse_avi_mjpeg(bytes(bad))
    bad = blob.copy()
    bad[8:12] = b"WAVE"
    with pytest.raises(ValueError, match="form type"):
        parse_avi_mjpeg(bytes(bad))
    # corrupt avih.dwTotalFrames: count cross-check must catch it
    at = bytes(blob).index(b"avih") + 8 + 16
    bad = blob.copy()
    bad[at : at + 4] = struct.pack("<I", 99)
    with pytest.raises(ValueError, match="dwTotalFrames"):
        parse_avi_mjpeg(bytes(bad))
    # corrupt strh.dwLength likewise
    at = bytes(blob).index(b"strh") + 8 + 32
    bad = blob.copy()
    bad[at : at + 4] = struct.pack("<I", 99)
    with pytest.raises(ValueError, match="dwLength"):
        parse_avi_mjpeg(bytes(bad))
    # idx1 offset that misses its chunk
    at = bytes(blob).index(b"idx1") + 8 + 8
    bad = blob.copy()
    bad[at : at + 4] = struct.pack("<I", 2)
    with pytest.raises(ValueError, match="offset"):
        parse_avi_mjpeg(bytes(bad))
    # truncation inside movi
    with pytest.raises(ValueError):
        parse_avi_mjpeg(bytes(blob[: len(blob) // 2]))


def test_sampled_decode_matches_formula():
    from tinymapreduce_spark.functions.jpegcodec import decode_jpeg, idct_block
    from tinymapreduce_spark.operators.multimodal import JPG_QT, VID_COEF

    d = 5
    _, _, frames = parse_avi_mjpeg(_avi(d))
    nb = VID_W(d) // 8
    for f in range(0, len(frames), 2):
        fw, fh, planes = decode_jpeg(frames[f])
        assert (fw, fh) == (VID_W(d), VID_H)
        for b in range(nb):
            coef = [[0] * 8 for _ in range(8)]
            for (r, c), fn in VID_COEF.items():
                coef[r][c] = fn(d, f, b) * JPG_QT[r * 8 + c]
            want = idct_block(coef)
            got = [row[b * 8 : b * 8 + 8] for row in planes[0]]
            assert got == want
