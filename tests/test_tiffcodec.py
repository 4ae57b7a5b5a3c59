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
    # unsupported compression id planted in the IFD (LZW is id 5 and
    # real now; 8 = Deflate-in-TIFF stays an honest boundary)
    bad_comp = bytearray(encode_tiff(6, 5, px))
    import struct

    at = 8 + 2 + 3 * 12  # 4th entry = compression tag
    assert struct.unpack("<H", bad_comp[at : at + 2])[0] == 259
    bad_comp[at + 8 : at + 10] = struct.pack("<H", 8)
    with pytest.raises(ValueError, match="compression 8"):
        decode_tiff(bytes(bad_comp))


def test_lzw_roundtrip_axes():
    """LZW + predictor across byte orders; multi-strip; exact pixels."""
    for lzw in (False, True):
        preds = (False, True) if lzw else (False,)
        for pred in preds:
            for be in (False, True):
                px = _px(21, 17, seed=9)
                blob = encode_tiff(
                    21, 17, px, big_endian=be, lzw=lzw, predictor=pred
                )
                assert decode_tiff(blob) == (21, 17, px)


def test_lzw_stream_conventions():
    """TIFF §13 conventions: the stream opens with ClearCode at 9 bits
    MSB-first (first byte 0x80), early-change width bumps and the
    4094-entry clear roundtrip on a pseudo-random megastream, and
    KwKwK phrases decode."""
    from tinymapreduce_spark.functions.tiffcodec import lzw_decode, lzw_encode

    assert lzw_encode(b"\x07\x07\x07")[0] == 0x80
    # LCG stream long enough to cross 9->10->11->12 bumps AND the clear
    x, buf = 12345, bytearray()
    for _ in range(30000):
        x = (1103515245 * x + 12345) % (1 << 31)
        buf.append((x >> 16) & 0xFF)
    data = bytes(buf)
    assert lzw_decode(lzw_encode(data), len(data)) == data
    # KwKwK: aba ab ab... classic pattern emits a just-defined code
    kwk = b"abababababab" * 50
    assert lzw_decode(lzw_encode(kwk), len(kwk)) == kwk
    # defects
    with pytest.raises(ValueError, match="truncated"):
        lzw_decode(lzw_encode(b"hello")[:-2], 5)
    with pytest.raises(ValueError, match="short of"):
        lzw_decode(lzw_encode(b"hi"), 3)


def test_predictor_changes_stream_not_pixels():
    """Predictor 2 must alter the compressed bytes (deltas, smaller on
    gradients) while decoding to identical pixels."""
    px = [[(x * 3 + y) % 256 for x in range(40)] for y in range(20)]
    plain = encode_tiff(40, 20, px, lzw=True)
    pred = encode_tiff(40, 20, px, lzw=True, predictor=True)
    assert plain != pred
    assert len(pred) < len(plain)  # gradient rows become constant deltas
    assert decode_tiff(pred) == decode_tiff(plain) == (40, 20, px)


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
