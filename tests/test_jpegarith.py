"""Arithmetic-coded JPEG (SOF9): the QM coder (T.81 Annex D) and the
Annex F statistics model, both from-scratch. Roundtrip-focused — the
coder's estimation state machine, carry stacking, byte stuffing and
marker padding all break roundtrips if wrong."""

from __future__ import annotations

import random

import pytest

from tinymapreduce_spark.functions.jpegarith import (
    QE_TABLE,
    ArithDecoder,
    ArithEncoder,
    decode_jpeg_arith,
    encode_jpeg_arith,
)
from tinymapreduce_spark.functions.jpegcodec import idct_block

QT = [1 + (3 * i) % 7 for i in range(64)]


def _roundtrip_bits(bits, nctx, seed):
    rnd = random.Random(seed)
    picks = [rnd.randrange(nctx) for _ in bits]
    enc = ArithEncoder()
    st = [[0, 0] for _ in range(nctx)]
    for b, ci in zip(bits, picks):
        enc.encode(st[ci], b)
    data = enc.flush() + b"\xff\xd9"
    dec = ArithDecoder(data, 0)
    st2 = [[0, 0] for _ in range(nctx)]
    return [dec.decode(st2[ci]) for ci in picks] == bits


class TestQMCoder:
    def test_qe_table_invariants(self):
        """Every transition stays in range; Qe values are < 0x8000 (an
        LPS estimate above half would break the interval math); the
        fixed state 113 self-loops without switching."""
        assert len(QE_TABLE) == 114
        for i, (qe, nmps, nlps, sw) in enumerate(QE_TABLE):
            assert 0 < qe < 0x8000, i
            assert 0 <= nmps < 114 and 0 <= nlps < 114, i
            assert sw in (0, 1), i
        assert QE_TABLE[113] == (0x5A1D, 113, 113, 0)

    def test_skew_matrix_roundtrips(self):
        for seed in range(12):
            rnd = random.Random(seed)
            p = rnd.choice([0.01, 0.2, 0.5, 0.8, 0.99])
            bits = [1 if rnd.random() < p else 0
                    for _ in range(rnd.randrange(1, 4000))]
            assert _roundtrip_bits(bits, rnd.choice([1, 5, 32]), seed)

    def test_pathological_streams(self):
        assert _roundtrip_bits([0] * 9000, 1, 1)
        assert _roundtrip_bits([1] * 9000, 1, 2)
        assert _roundtrip_bits([0, 1] * 4500, 1, 3)
        assert _roundtrip_bits([], 1, 4)
        assert _roundtrip_bits([1], 1, 5)

    def test_compresses_near_entropy(self):
        rnd = random.Random(99)
        bits = [1 if rnd.random() < 0.02 else 0 for _ in range(60000)]
        enc = ArithEncoder()
        st = [0, 0]
        for b in bits:
            enc.encode(st, b)
        blob = enc.flush()
        # H(0.02) = 0.1414 bits/bit; the adaptive coder should land
        # well under 0.25 (a broken estimator decays toward 1.0)
        assert 8 * len(blob) / len(bits) < 0.25

    def test_stuffing_discipline(self):
        """No bare 0xFF may appear in the entropy output (every one
        must carry a 0x00 stuffing byte)."""
        for seed in range(8):
            rnd = random.Random(seed)
            bits = [rnd.randrange(2) for _ in range(3000)]
            enc = ArithEncoder()
            st = [[0, 0] for _ in range(4)]
            for b in bits:
                enc.encode(st[rnd.randrange(4)], b)
            blob = enc.flush()
            i = 0
            while i < len(blob):
                if blob[i] == 0xFF:
                    assert i + 1 < len(blob) and blob[i + 1] == 0x00, seed
                    i += 2
                else:
                    i += 1


def _blocks(d, w, h, dense_seed=None):
    bw, bh = (w + 7) // 8, (h + 7) // 8
    out = []
    rnd = random.Random(dense_seed) if dense_seed is not None else None
    for b in range(bw * bh):
        blk = [[0] * 8 for _ in range(8)]
        if rnd is None:
            blk[0][0] = (d + 5 * b) % 32 - 16
            blk[0][1] = (d + 3 * b) % 15 - 7
            blk[1][0] = (2 * d + b) % 11 - 5
            blk[3][2] = (d * b + d) % 7 - 3
        else:
            for _ in range(rnd.randrange(64)):
                blk[rnd.randrange(8)][rnd.randrange(8)] = rnd.randrange(-999, 1000)
            blk[7][7] = rnd.randrange(1, 9)  # no-EOB path
        out.append(blk)
    return out


def _replay(blocks, w, h):
    bw = (w + 7) // 8
    plane = [[0] * (bw * 8) for _ in range(((h + 7) // 8) * 8)]
    for bi, blk in enumerate(blocks):
        by, bx = divmod(bi, bw)
        coef = [[blk[r][c] * QT[r * 8 + c] for c in range(8)] for r in range(8)]
        px = idct_block(coef)
        for y in range(8):
            for x in range(8):
                plane[by * 8 + y][bx * 8 + x] = px[y][x]
    return [row[:w] for row in plane[:h]]


class TestSOF9:
    def test_formula_corpus_matches_replay(self):
        for d in range(25):
            w, h = 8 + d % 11, 8 + (d * 3) % 9
            blocks = _blocks(d, w, h)
            got = decode_jpeg_arith(encode_jpeg_arith(w, h, QT, blocks))
            assert got == (w, h, _replay(blocks, w, h)), d

    def test_dense_random_blocks(self):
        for t in range(8):
            w, h = 8 + t * 3, 8 + t * 2
            blocks = _blocks(0, w, h, dense_seed=t)
            got = decode_jpeg_arith(encode_jpeg_arith(w, h, QT, blocks))
            assert got[2] == _replay(blocks, w, h), t

    def test_kx_split_both_sides(self):
        """Kx=1 sends nearly all AC magnitudes to the high area, Kx=63
        to the low one — pixels must be identical either way."""
        blocks = _blocks(0, 16, 16, dense_seed=42)
        a = decode_jpeg_arith(encode_jpeg_arith(16, 16, QT, blocks, kx=1))
        b = decode_jpeg_arith(encode_jpeg_arith(16, 16, QT, blocks, kx=63))
        assert a == b == (16, 16, _replay(blocks, 16, 16))

    def test_dc_conditioning_classes_hit(self):
        """Alternate huge and tiny DC diffs so every conditioning class
        (zero, small +/-, large +/-) drives context selection."""
        bw = 4
        blocks = []
        dcs = [0, 0, 2, -2, 200, -200, 1, -1, 300, 300, 0, -300] * 4
        for dc in dcs[: bw * bw]:
            blk = [[0] * 8 for _ in range(8)]
            blk[0][0] = dc
            blocks.append(blk)
        got = decode_jpeg_arith(encode_jpeg_arith(32, 32, QT, blocks))
        assert got[2] == _replay(blocks, 32, 32)

    def test_defects_raise(self):
        blocks = _blocks(1, 8, 8)
        blob = bytearray(encode_jpeg_arith(8, 8, QT, blocks))
        at = blob.index(b"\xff\xc9")
        huff = blob.copy()
        huff[at + 1] = 0xC0
        with pytest.raises(ValueError, match="SOF9"):
            decode_jpeg_arith(bytes(huff))
        prog = blob.copy()
        prog[at + 1] = 0xC2  # HUFFMAN progressive: not arithmetic
        with pytest.raises(ValueError, match="SOF9/SOF10"):
            decode_jpeg_arith(bytes(prog))
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg_arith(b"\x00\x00")
        with pytest.raises(ValueError, match="block count"):
            encode_jpeg_arith(8, 8, QT, blocks * 2)

    def test_huffman_decoder_refuses_sof9(self):
        from tinymapreduce_spark.functions.jpegcodec import decode_jpeg

        blob = encode_jpeg_arith(8, 8, QT, _blocks(1, 8, 8))
        with pytest.raises(ValueError, match="arithmetic"):
            decode_jpeg(blob)


class TestSOF10Progressive:
    """Annex G.2 progressive arithmetic: the five-scan script must
    reproduce the sequential result bit-exactly for any coefficients."""

    def test_matches_sequential(self):
        from tinymapreduce_spark.functions.jpegarith import (
            encode_jpeg_arith_progressive)

        for d in range(15):
            w, h = 8 + d % 11, 8 + (d * 3) % 9
            blocks = _blocks(d, w, h)
            seq = decode_jpeg_arith(encode_jpeg_arith(w, h, QT, blocks))
            prog = decode_jpeg_arith(
                encode_jpeg_arith_progressive(w, h, QT, blocks))
            assert seq == prog

    def test_dense_and_kx_extremes(self):
        from tinymapreduce_spark.functions.jpegarith import (
            encode_jpeg_arith_progressive)

        for t in range(6):
            blocks = _blocks(0, 24, 24, dense_seed=t + 50)
            seq = decode_jpeg_arith(encode_jpeg_arith(24, 24, QT, blocks))
            for kx in (1, 63):
                prog = decode_jpeg_arith(
                    encode_jpeg_arith_progressive(24, 24, QT, blocks, kx=kx))
                assert seq == prog

    def test_negative_dc_refinement(self):
        """Negative DC values exercise the arithmetic-shift + OR-bit
        reconstruction (two's complement semantics)."""
        from tinymapreduce_spark.functions.jpegarith import (
            encode_jpeg_arith_progressive)

        blocks = []
        for dc in (-1, -2, -3, -5, -17, 3, 0, 255, -255):
            blk = [[0] * 8 for _ in range(8)]
            blk[0][0] = dc
            blocks.append(blk)
        while len(blocks) < 9:
            blocks.append([[0] * 8 for _ in range(8)])
        seq = decode_jpeg_arith(encode_jpeg_arith(24, 24, QT, blocks[:9]))
        prog = decode_jpeg_arith(
            encode_jpeg_arith_progressive(24, 24, QT, blocks[:9]))
        assert seq == prog

    def test_progressive_smaller_on_sparse(self):
        """On sparse natural-statistics coefficients the progressive
        organization should not blow up the stream (sanity: within 2x
        of sequential)."""
        from tinymapreduce_spark.functions.jpegarith import (
            encode_jpeg_arith_progressive)

        blocks = _blocks(3, 40, 40)
        a = len(encode_jpeg_arith(40, 40, QT, blocks))
        b = len(encode_jpeg_arith_progressive(40, 40, QT, blocks))
        assert b < 2 * a

    def test_lossless_arith_still_refused(self):
        blob = bytearray(encode_jpeg_arith(8, 8, QT, _blocks(1, 8, 8)))
        at = blob.index(b"\xff\xc9")
        blob[at + 1] = 0xCB
        with pytest.raises(ValueError, match="lossless"):
            decode_jpeg_arith(bytes(blob))
