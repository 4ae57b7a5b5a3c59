"""Parquet encoding layer (RLE/bit-packing hybrid, DELTA_BINARY_PACKED)
from the public format spec — the engine's own storage format as a
verifiable codec."""

from __future__ import annotations

import random

import pytest

from tinymapreduce_spark.functions.parquet_enc import (
    delta_binary_packed_decode,
    delta_binary_packed_encode,
    read_uleb128,
    rle_hybrid_decode,
    rle_hybrid_encode,
    uleb128,
    unzigzag,
    zigzag,
)


def test_uleb_and_zigzag_vectors():
    assert uleb128(0) == b"\x00"
    assert uleb128(127) == b"\x7f"
    assert uleb128(128) == b"\x80\x01"
    assert uleb128(300) == b"\xac\x02"  # the spec's classic example
    for v in [0, 1, 127, 128, 300, 2**40]:
        assert read_uleb128(uleb128(v), 0)[0] == v
    # zigzag: 0,-1,1,-2,2 -> 0,1,2,3,4
    assert [zigzag(v) for v in [0, -1, 1, -2, 2]] == [0, 1, 2, 3, 4]
    for v in [0, 1, -1, 5, -5, 2**31, -(2**31)]:
        assert unzigzag(zigzag(v)) == v


def test_hybrid_roundtrips_mixed_shapes():
    rnd = random.Random(2)
    for _ in range(100):
        bw = rnd.randrange(1, 21)
        n = rnd.randrange(0, 900)
        vals: list[int] = []
        while len(vals) < n:
            if rnd.random() < 0.4:
                vals.extend([rnd.randrange(1 << bw)] * rnd.randrange(1, 40))
            else:
                vals.append(rnd.randrange(1 << bw))
        vals = vals[:n]
        enc = rle_hybrid_encode(vals, bw)
        assert rle_hybrid_decode(enc, bw, n) == vals


def test_hybrid_section_policy():
    """All-equal streams collapse to one RLE section; the header is
    uleb((8k)<<1) + ceil(bw/8) value bytes."""
    enc = rle_hybrid_encode([5] * 10000, 3)
    # 10000 = 1250 groups -> run 10000: header uleb(20000)=3? 20000
    # needs 3 bytes (>= 16384); + 1 value byte
    assert len(enc) == 4
    # pure noise at bw=8: one bit-packed section per 63 groups
    vals = list(range(256)) * 2  # 512 values, 64 groups, none uniform
    enc2 = rle_hybrid_encode(vals, 8)
    assert len(enc2) == 2 + 512  # two headers (63 + 1 groups) + bytes


def test_hybrid_range_check():
    with pytest.raises(ValueError, match="outside"):
        rle_hybrid_encode([9], 3)
    with pytest.raises(ValueError, match="bit width"):
        rle_hybrid_encode([0], 0)


def test_delta_roundtrips():
    rnd = random.Random(7)
    for _ in range(60):
        n = rnd.randrange(0, 600)
        vals, cur = [], rnd.randrange(-1000, 1000)
        for _ in range(n):
            cur += rnd.randrange(-50, 200)
            vals.append(cur)
        assert delta_binary_packed_decode(
            delta_binary_packed_encode(vals)) == vals
    assert delta_binary_packed_decode(delta_binary_packed_encode([])) == []
    assert delta_binary_packed_decode(
        delta_binary_packed_encode([42])) == [42]


def test_delta_monotone_is_compact():
    """A pure arithmetic progression has all-zero adjusted deltas:
    one block header per 128 deltas and NO packed data."""
    vals = list(range(0, 129 * 7, 7))[:129]  # 129 values = 1 full block
    enc = delta_binary_packed_encode(vals)
    # header: uleb(128)=2 + uleb(4)=1 + uleb(129)=2 + zigzag(0)=1
    # block: zigzag(7)=1 + 4 width bytes + 0 data
    assert len(enc) == 2 + 1 + 2 + 1 + 1 + 4


def test_delta_truncation_raises():
    vals = list(range(50))
    enc = delta_binary_packed_encode([v * v for v in vals])
    with pytest.raises(ValueError):
        delta_binary_packed_decode(enc[:-3])


class TestLZ4:
    """LZ4 raw block format (Parquet's LZ4_RAW page codec)."""

    def test_roundtrips(self):
        from tinymapreduce_spark.functions.parquet_enc import (
            lz4_compress, lz4_decompress)

        rnd = random.Random(6)
        cases = [b"", b"a", b"abcd" * 5000, bytes(range(256)) * 10,
                 b"x" * 100000, bytes(range(13))]
        for _ in range(60):
            n = rnd.randrange(0, 20000)
            alpha = bytes(rnd.randrange(256)
                          for _ in range(rnd.randrange(2, 30)))
            cases.append(bytes(rnd.choice(alpha) for _ in range(n)))
        for data in cases:
            assert lz4_decompress(lz4_compress(data), len(data)) == data

    def test_end_of_block_rules(self):
        """The last sequence is literals-only and matches never cover
        the final 5 bytes — walk the emitted tokens to verify."""
        from tinymapreduce_spark.functions.parquet_enc import lz4_compress

        data = b"abcdabcdabcdabcdabcdXYZVW"
        blob = lz4_compress(data)
        pos, n = 0, len(blob)
        last_had_match = True
        while pos < n:
            token = blob[pos]
            pos += 1
            lit = token >> 4
            if lit == 15:
                while blob[pos] == 255:
                    lit += 255
                    pos += 1
                lit += blob[pos]
                pos += 1
            pos += lit
            if pos >= n:
                last_had_match = False
                break
            pos += 2  # offset
            ml = token & 0xF
            if ml == 15:
                while blob[pos] == 255:
                    pos += 1
                pos += 1
        assert not last_had_match

    def test_overlapping_copy_rle(self):
        """offset < match length is the RLE idiom — decode must copy
        byte-by-byte, not memmove."""
        from tinymapreduce_spark.functions.parquet_enc import (
            lz4_compress, lz4_decompress)

        data = b"Q" * 5000
        blob = lz4_compress(data)
        assert len(blob) < 40
        assert lz4_decompress(blob, 5000) == data

    def test_defects_raise(self):
        from tinymapreduce_spark.functions.parquet_enc import (
            lz4_compress, lz4_decompress)

        blob = lz4_compress(b"hello world, hello world, hello world!!")
        with pytest.raises(ValueError):
            lz4_decompress(blob[:-2], 40)
        with pytest.raises(ValueError, match="offset"):
            # token with a match at offset 0
            lz4_decompress(b"\x01A\x00\x00", 10)
