"""TIFF 6.0 / PackBits codec (functions/tiffcodec.py): roundtrips
across both byte orders, both compressions, multi-strip assembly and
odd dimensions; PackBits control-stream semantics incl. the -128
no-op; SHORT left-justification in the value field; defect
rejections."""

from __future__ import annotations

import pytest

from tinymapreduce_spark.functions.tiffcodec import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


def _px(w, h, seed=0):
    return [[(7 * x + 13 * y + seed) % 256 for x in range(w)] for y in range(h)]


def test_roundtrips_all_axes():
    for w, h in [(1, 1), (5, 3), (8, 9), (13, 11)]:
        px = _px(w, h)
        for pb in (False, True):
            for be in (False, True):
                blob = encode_tiff(w, h, px, packbits=pb, big_endian=be)
                assert blob[:2] == (b"MM" if be else b"II")
                assert decode_tiff(blob) == (w, h, px)


def test_packbits_semantics():
    # literal, replicate, max-length runs, and the -128 no-op
    for data in [b"", b"a", b"aaa", b"a" * 128, b"a" * 129, b"a" * 300,
                 bytes(range(256)), b"xy" + b"z" * 7 + b"pq"]:
        assert packbits_decode(packbits_encode(data), len(data)) == data
    assert packbits_decode(b"\x80\x00X", 1) == b"X"  # -128 skipped
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"", 1)
    with pytest.raises(ValueError, match="overruns"):
        packbits_decode(b"\x05ab", 6)
    with pytest.raises(ValueError, match="overshoots"):
        packbits_decode(b"\xfeZ", 2)  # replicate of 3 > expected 2


def test_defects_raise():
    px = _px(6, 5)
    blob = bytearray(encode_tiff(6, 5, px))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + bytes(blob[2:]))
    bad = blob.copy()
    bad[2] = 43  # the 42
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(bytes(bad))
    with pytest.raises(ValueError):
        decode_tiff(bytes(blob[:-3]))  # last strip truncated
    # unsupported compression id planted in the IFD
    lzw = bytearray(encode_tiff(6, 5, px))
    import struct

    at = 8 + 2 + 3 * 12  # 4th entry = compression tag
    assert struct.unpack("<H", lzw[at : at + 2])[0] == 259
    lzw[at + 8 : at + 10] = struct.pack("<H", 5)  # LZW
    with pytest.raises(ValueError, match="compression 5"):
        decode_tiff(bytes(lzw))


def test_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=0, max_value=255),
        st.booleans(),
        st.booleans(),
    )
    def check(w, h, seed, pb, be):
        px = _px(w, h, seed)
        assert decode_tiff(encode_tiff(w, h, px, packbits=pb, big_endian=be)) == (
            w, h, px
        )

    check()
