"""Unit tests for the pure-Python GIF codec (``functions/gifcodec.py``)
— the LZW rung of the compressed-codec tier. No Spark involved: the
codec is row-local; the Spark plumbing is certified by the
oracle-backed ``gif_decode_stats`` query.
"""

from __future__ import annotations

import random

import pytest

from tinymapreduce_spark.functions.gifcodec import (
    INTERLACE_PASSES,
    _interlaced_row_order,
    decode_gif,
    encode_gif,
    lzw_compress,
    lzw_decompress,
)


def _strip_subblocks(sub: bytes) -> bytes:
    out = bytearray()
    p = 0
    while sub[p]:
        out += sub[p + 1 : p + 1 + sub[p]]
        p += 1 + sub[p]
    return bytes(out)


def _rand_indices(rng: random.Random, w: int, h: int, npal: int):
    idx = []
    for _ in range(h):
        row: list[int] = []
        while len(row) < w:
            if rng.random() < 0.5:  # runs exercise dictionary growth
                row.extend(
                    [rng.randrange(npal)] * min(rng.randint(1, 12), w - len(row))
                )
            else:
                row.append(rng.randrange(npal))
        idx.append(row)
    return idx


def test_roundtrip_fuzz_palettes_interlace_and_runs():
    rng = random.Random(9)
    for t in range(50):
        w, h = rng.randint(1, 40), rng.randint(1, 35)
        npal = rng.choice([2, 3, 4, 7, 16, 100, 256])
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(npal)
        ]
        idx = _rand_indices(rng, w, h, npal)
        payload = encode_gif(w, h, idx, pal, interlace=rng.random() < 0.5)
        want = [[pal[v] for v in row] for row in idx]
        assert decode_gif(payload) == (w, h, want), t


def test_lzw_table_overflow_emits_clear_and_roundtrips():
    """A long repetitive stream drives the dictionary to 4096 entries —
    the compressor must emit CLEAR and reset; the decompressor must
    follow (the classic 12-bit-boundary bug)."""
    flat = ([1] * 3000 + [2, 3] * 2000 + list(range(4)) * 2500) * 3
    comp = lzw_compress(flat, 2)
    raw = _strip_subblocks(comp)
    assert lzw_decompress(raw, 2, len(flat)) == flat
    # compression actually happened (runs collapse)
    assert len(raw) < len(flat) // 10


def test_kwkwk_special_case():
    """Input 'aaa...' forces codes that reference the entry being
    defined (the KwKwK case in every LZW writeup)."""
    flat = [0] * 50
    comp = _strip_subblocks(lzw_compress(flat, 2))
    assert lzw_decompress(comp, 2, 50) == flat


def test_interlace_order_is_the_spec_four_pass():
    assert INTERLACE_PASSES == [(0, 8), (4, 8), (2, 4), (1, 2)]
    assert _interlaced_row_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert sorted(_interlaced_row_order(23)) == list(range(23))


def test_extension_blocks_are_walked_not_assumed():
    """The encoder plants a two-sub-block comment extension; a decoder
    that skips a fixed length instead of walking sub-blocks desyncs."""
    pal = [(1, 2, 3), (4, 5, 6)]
    payload = encode_gif(3, 2, [[0, 1, 0], [1, 0, 1]], pal)
    assert b"hello" in payload and b"gif" in payload
    assert decode_gif(payload)[2][0] == [(1, 2, 3), (4, 5, 6), (1, 2, 3)]


def test_decoder_rejects_bad_inputs():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    pal = [(0, 0, 0), (255, 255, 255)]
    good = bytearray(encode_gif(4, 4, [[0, 1, 0, 1]] * 4, pal))
    with pytest.raises(ValueError, match="truncated|expected"):
        decode_gif(bytes(good[:-6]))
    bad = bytearray(good)
    bad[bad.index(0x2C)] = 0x7A  # corrupt the image separator
    with pytest.raises(ValueError, match="unknown block"):
        decode_gif(bytes(bad))
