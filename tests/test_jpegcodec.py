"""Unit tests for the pure-Python baseline JPEG codec
(``functions/jpegcodec.py``) — the compressed-codec rung of the
multimodal tier. No Spark involved: the codec is row-local; the Spark
plumbing is certified by the oracle-backed ``jpeg_decode_stats`` query.
"""

from __future__ import annotations

import random

import pytest

from tinymapreduce_spark.functions.jpegcodec import (
    IDCT_T,
    ZIGZAG,
    _BitWriter,
    decode_jpeg,
    encode_jpeg_gray,
    idct_block,
)

QT = [1 + r + c for r in range(8) for c in range(8)]


def _random_blocks(rng: random.Random, n: int) -> list[list[list[int]]]:
    blocks = []
    for _ in range(n):
        blk = [[0] * 8 for _ in range(8)]
        blk[0][0] = rng.randint(-16, 15)
        for _ in range(rng.randint(0, 8)):
            blk[rng.randint(0, 7)][rng.randint(0, 7)] = rng.randint(-7, 7)
        blocks.append(blk)
    return blocks


def _expected_pixels(w, h, blocks):
    bw, bh = (w + 7) // 8, (h + 7) // 8
    out = [[0] * w for _ in range(h)]
    for by in range(bh):
        for bx in range(bw):
            blk = blocks[by * bw + bx]
            coef = [[blk[r][c] * QT[r * 8 + c] for c in range(8)] for r in range(8)]
            px = idct_block(coef)
            for y in range(8):
                if by * 8 + y >= h:
                    break
                for x in range(8):
                    if bx * 8 + x >= w:
                        break
                    out[by * 8 + y][bx * 8 + x] = px[y][x]
    return out


def test_zigzag_is_the_t81_scan():
    # first ten and last entries of T.81 figure A.6
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert ZIGZAG[-1] == (7, 7)
    assert len(set(ZIGZAG)) == 64


def test_idct_dc_only_block_is_flat():
    # a DC-only block must decode to a constant plane at the level-shifted
    # DC value: F(0,0)=d ⇒ f(x,y) = d/8 exactly (alpha0²·d·cos0² / 4)
    coef = [[0] * 8 for _ in range(8)]
    coef[0][0] = 80
    px = idct_block(coef)
    assert all(v == 138 for row in px for v in row)  # 128 + 80/8
    coef[0][0] = -2048
    px = idct_block(coef)
    assert all(v == 0 for row in px for v in row)  # clamped


def test_roundtrip_fuzz_including_crop_and_dc_prediction():
    rng = random.Random(7)
    for _ in range(40):
        w = rng.choice([8, 13, 16, 17, 24])
        h = rng.choice([8, 9, 16, 22])
        bw, bh = (w + 7) // 8, (h + 7) // 8
        blocks = _random_blocks(rng, bw * bh)
        w2, h2, planes = decode_jpeg(encode_jpeg_gray(w, h, QT, blocks))
        assert (w2, h2) == (w, h)
        assert planes[0] == _expected_pixels(w, h, blocks)


def test_color_444_roundtrip_interleaved_mcus():
    """The decoder's multi-component path: 3 planes, interleaved MCUs,
    one DC predictor per component — each plane decodes to exactly its
    own coefficients' IDCT (no cross-component bleed)."""
    from tinymapreduce_spark.functions.jpegcodec import encode_jpeg

    rng = random.Random(99)
    for _ in range(10):
        w = rng.choice([8, 12, 16])
        h = rng.choice([8, 11, 16])
        bw, bh = (w + 7) // 8, (h + 7) // 8
        comps = [_random_blocks(rng, bw * bh) for _ in range(3)]
        w2, h2, planes = decode_jpeg(encode_jpeg(w, h, QT, comps))
        assert (w2, h2) == (w, h)
        assert len(planes) == 3
        for ci in range(3):
            assert planes[ci] == _expected_pixels(w, h, comps[ci])


def test_bitwriter_stuffs_ff_bytes():
    bw = _BitWriter()
    bw.write(0xFF, 8)
    bw.write(0xAB, 8)
    assert bw.flush() == b"\xff\x00\xab"


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2 permits any number of 0xFF fill bytes before a
    marker; real camera baselines emit them (ADVICE r5). Planting fill
    runs before every marker must not change the decode."""
    rng = random.Random(7)
    blocks = _random_blocks(rng, 4)
    payload = encode_jpeg_gray(13, 10, QT, blocks)
    clean = decode_jpeg(payload)
    # rebuild the byte stream with 1-3 fill bytes before each marker
    # OUTSIDE entropy data (we pad SOI, APP0, DQT, SOF0, DHT, SOS; the
    # entropy segment's stuffed 0xFF00s must not be touched)
    out = bytearray()
    pos = 0
    fills = [1, 2, 3]
    i = 0
    while pos < len(payload):
        if payload[pos] == 0xFF and payload[pos + 1] not in (0x00,):
            if pos > 0:  # fill before every marker except SOI itself
                out += b"\xff" * fills[i % 3]
                i += 1
            out += payload[pos : pos + 2]
            marker = payload[pos + 1]
            pos += 2
            if marker in (0xD8, 0xD9):
                continue
            import struct as _s

            seglen = _s.unpack(">H", payload[pos : pos + 2])[0]
            out += payload[pos : pos + seglen]
            pos += seglen
            if marker == 0xDA:  # entropy data: copy verbatim to EOI
                eoi = payload.rfind(b"\xff\xd9")
                out += payload[pos:eoi]
                pos = eoi
        else:
            out += payload[pos : pos + 1]
            pos += 1
    assert decode_jpeg(bytes(out)) == clean


def test_decoder_rejects_non_baseline_frames():
    blocks = [[[0] * 8 for _ in range(8)]]
    payload = bytearray(encode_jpeg_gray(8, 8, QT, blocks))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # progressive
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(payload))


def test_decoder_rejects_subsampling_and_truncation():
    blocks = [[[0] * 8 for _ in range(8)]]
    payload = bytearray(encode_jpeg_gray(8, 8, QT, blocks))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 11] = 0x22  # 2x2 sampling on the only component
    with pytest.raises(ValueError, match="subsampled"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg_gray(8, 8, QT, blocks)[:-4])  # lost EOI+data
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")


def test_idct_table_is_the_documented_fixed_point_spec():
    import math

    for u in range(8):
        alpha = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            want = round(alpha * math.cos((2 * x + 1) * u * math.pi / 16) * 2048)
            assert IDCT_T[u][x] == want


def test_restart_interval_roundtrip_and_sequencing():
    """DRI/RSTm path: byte-aligned restarts every `dri` MCUs with DC
    predictors reset — roundtrip over several intervals (including >8
    restarts so the m-cycle wraps), plus out-of-sequence detection."""
    from tinymapreduce_spark.functions.jpegcodec import encode_jpeg

    rng = random.Random(31)
    for dri in (1, 2, 3):
        w, h = 40, 24  # 5x3 = 15 MCUs -> up to 14 restarts at dri=1
        bw, bh = (w + 7) // 8, (h + 7) // 8
        blocks = _random_blocks(rng, bw * bh)
        payload = encode_jpeg(w, h, QT, [blocks], dri=dri)
        assert b"\xff\xdd" in payload  # DRI segment present
        w2, h2, planes = decode_jpeg(payload)
        assert (w2, h2) == (w, h)
        assert planes[0] == _expected_pixels(w, h, blocks)
    # corrupt the first restart marker's index -> sequence error
    payload = bytearray(encode_jpeg(40, 24, QT, [_random_blocks(rng, 15)], dri=1))
    sos = payload.find(b"\xff\xda")
    i = payload.find(b"\xff\xd0", sos)
    if i == -1:  # first marker may be RST0..RST7 depending on content
        for m in range(8):
            i = payload.find(bytes([0xFF, 0xD0 + m]), sos)
            if i != -1:
                break
    payload[i + 1] = 0xD0 + ((payload[i + 1] - 0xD0 + 3) % 8)
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(payload))


def test_color_restart_resets_all_component_predictors():
    from tinymapreduce_spark.functions.jpegcodec import encode_jpeg

    rng = random.Random(55)
    w, h = 24, 16
    comps = [_random_blocks(rng, 6) for _ in range(3)]
    w2, h2, planes = decode_jpeg(encode_jpeg(w, h, QT, comps, dri=2))
    for ci in range(3):
        assert planes[ci] == _expected_pixels(w, h, comps[ci])
