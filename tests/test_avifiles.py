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


def test_indexless_movi_scan_and_flag_consistency():
    """r7: containers written WITHOUT idx1 (AVIF_HASINDEX cleared) must
    walk via the 'movi' scan and yield identical frames; a container
    that PROMISES an index (flag set) but carries none must raise."""
    frames = [b"\xff\xd8 frame %d \xff\xd9" % i for i in range(4)]
    with_idx = write_avi_mjpeg(16, 8, frames)
    without = write_avi_mjpeg(16, 8, frames, with_index=False)
    assert len(without) < len(with_idx)
    assert b"idx1" not in without
    assert parse_avi_mjpeg(without) == parse_avi_mjpeg(with_idx) == (16, 8, frames)

    # flip AVIF_HASINDEX on in the index-less container -> must raise
    lying = bytearray(without)
    avih_at = lying.index(b"avih") + 8  # past fourcc+size
    flags_at = avih_at + 12  # dwMicroSecPerFrame, MaxBytesPerSec, Padding
    lying[flags_at] |= 0x10
    with pytest.raises(ValueError, match="AVIF_HASINDEX"):
        parse_avi_mjpeg(bytes(lying))


def test_video420_sampled_frames_match_formula():
    from tinymapreduce_spark.functions.jpegcodec import decode_jpeg
    from tinymapreduce_spark.functions.jpegcodec import (
        IDCT_OUT_SHIFT,
        IDCT_ROUND,
        IDCT_T,
    )
    from tinymapreduce_spark.operators.multimodal import (
        J420_H,
        J420_W,
        V420_COEF,
    )
    from tinymapreduce_spark.functions.jpegcodec import encode_jpeg
    from tinymapreduce_spark.operators.multimodal import JPG_QT

    for d in (3, 4, 10):  # odd d -> index-less leg
        w, h = J420_W(d), J420_H(d)
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
        frames = []
        for f in range(2 + d % 4):
            comps = []
            for ci, n in ((0, 4 * mcux * mcuy), (1, mcux * mcuy), (2, mcux * mcuy)):
                blocks = []
                for b in range(n):
                    blk = [[0] * 8 for _ in range(8)]
                    for (r, c), fn in V420_COEF.items():
                        blk[r][c] = fn(d, f, ci, b)
                    blocks.append(blk)
                comps.append(blocks)
            frames.append(
                encode_jpeg(w, h, JPG_QT, comps, sampling=[(2, 2), (1, 1), (1, 1)])
            )
        blob = write_avi_mjpeg(w, h, frames, with_index=(d % 2 == 0))
        W, H, got = parse_avi_mjpeg(blob)
        assert (W, H) == (w, h) and got == frames
        # sampled frames decode to per-plane dims of the j420 geometry
        fw, fh, planes = decode_jpeg(got[0])
        assert (fw, fh) == (w, h)
        assert (len(planes[1][0]), len(planes[1])) == ((w + 1) // 2, (h + 1) // 2)


class TestImaAdpcm:
    """IMA ADPCM (WAV 0x11): state machine, container, block layout.
    Lives here with the other A/V container suites."""

    def test_state_machine_lockstep(self):
        import random

        from tinymapreduce_spark.operators.multimodal import (
            _ima_encode_nibble, _ima_step, decode_wav_ima, encode_wav_ima)

        rnd = random.Random(5)
        for _ in range(30):
            nb = rnd.randrange(1, 12)
            samples = [rnd.randrange(-32768, 32768) for _ in range(9 * nb)]
            idxs = [rnd.randrange(0, 89) for _ in range(nb)]
            sr, got = decode_wav_ima(encode_wav_ima(samples, idxs))
            assert len(got) == len(samples)
            for b in range(nb):
                assert got[9 * b] == samples[9 * b]  # header sample exact
                pred, idx = samples[9 * b], idxs[b]
                for k in range(8):
                    nib = _ima_encode_nibble(samples[9 * b + 1 + k], pred, idx)
                    pred, idx = _ima_step(pred, idx, nib)
                    assert got[9 * b + 1 + k] == pred

    def test_tracks_smooth_signal(self):
        """On a gentle ramp the quantizer error stays within one step
        of the adapted table — the codec's purpose."""
        from tinymapreduce_spark.operators.multimodal import (
            decode_wav_ima, encode_wav_ima)

        ramp = [min(32767, 50 * t) for t in range(9 * 20)]
        _, got = decode_wav_ima(encode_wav_ima(ramp, [10] * 20))
        errs = [abs(a - b) for a, b in zip(ramp, got)]
        assert sum(errs) / len(errs) < 60

    def test_clamps_hit(self):
        """Full-scale alternation drives both the predictor clamp and
        the index clamp (0 and 88)."""
        from tinymapreduce_spark.operators.multimodal import (
            decode_wav_ima, encode_wav_ima)

        wild = [(-32768 if t % 2 else 32767) for t in range(9 * 4)]
        _, got = decode_wav_ima(encode_wav_ima(wild, [0, 88, 44, 88]))
        assert all(-32768 <= v <= 32767 for v in got)

    def test_defects_raise(self):
        import pytest

        from tinymapreduce_spark.operators.multimodal import (
            decode_wav_ima, encode_wav_ima)

        with pytest.raises(ValueError, match="whole 9-sample"):
            encode_wav_ima([0] * 10, [0])
        blob = bytearray(encode_wav_ima([0] * 9, [0]))
        at = blob.index(b"data") + 8
        bad = blob.copy()
        bad[at + 2] = 120  # index byte > 88
        with pytest.raises(ValueError, match="corrupt"):
            decode_wav_ima(bytes(bad))
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav_ima(b"nope")
        # PCM decoder must refuse the ADPCM format tag
        from tinymapreduce_spark.operators.multimodal import decode_wav

        with pytest.raises(ValueError, match="only mono PCM16"):
            decode_wav(bytes(blob))
