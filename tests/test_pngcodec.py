"""Unit tests for the pure-Python PNG codec (``functions/pngcodec.py``)
— the PNG rung of the compressed-codec tier. No Spark involved: the
codec is row-local; the Spark plumbing is certified by the
oracle-backed ``png_decode_stats`` query.
"""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from tinymapreduce_spark.functions.pngcodec import (
    ADAM7,
    _paeth,
    decode_png,
    encode_png,
)


def _rand_image(rng: random.Random, w: int, h: int, ct: int):
    """(pixels-for-encode, expected-rgb-rows, palette)."""
    if ct == 2:
        px = [
            [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
             for _ in range(w)]
            for _ in range(h)
        ]
        return px, px, None
    if ct == 0:
        px = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        return px, [[(v, v, v) for v in row] for row in px], None
    pal = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(16)
    ]
    px = [[rng.randrange(16) for _ in range(w)] for _ in range(h)]
    return px, [[pal[v] for v in row] for row in px], pal


def test_paeth_tie_breaking_is_the_spec_order():
    # ties break left, then up, then up-left (spec 6.6)
    assert _paeth(1, 1, 1) == 1
    assert _paeth(10, 10, 0) == 10  # pa == pb -> a
    # a=0 b=4 c=2 -> p=2, pa=2, pb=2, pc=0 -> pc strictly smallest -> c
    assert _paeth(0, 4, 2) == 2
    # pb == pc -> up wins over up-left: a=3 b=0 c=2 -> p=1, pa=2, pb=1, pc=1
    assert _paeth(3, 0, 2) == 0


def test_roundtrip_all_color_types_filters_and_interlace():
    """decode(encode(pixels)) must be bit-exact across color types 0/2/3,
    both interlace methods, all five row filters, and edge sizes down to
    1x1 (which leaves several Adam7 passes empty)."""
    rng = random.Random(5)
    for t in range(60):
        w, h = rng.randint(1, 33), rng.randint(1, 30)
        ct = rng.choice([0, 2, 3])
        interlace = rng.choice([0, 1])
        px, want, pal = _rand_image(rng, w, h, ct)
        payload = encode_png(
            w, h, px, color_type=ct, palette=pal, interlace=interlace,
            filters=lambda y, t=t: (y + t),
        )
        assert decode_png(payload) == (w, h, want), (t, w, h, ct, interlace)


def test_each_single_filter_type_roundtrips():
    """Pin every filter independently — a broken Average or Paeth must
    not hide behind the cycling default."""
    rng = random.Random(6)
    px, want, _ = _rand_image(rng, 19, 13, 2)
    for f in range(5):
        payload = encode_png(19, 13, px, color_type=2, filters=lambda y, f=f: f)
        assert decode_png(payload) == (19, 13, want), f


def test_adam7_pass_geometry_covers_each_pixel_once():
    seen = set()
    w = h = 16
    for x0, y0, dx, dy in ADAM7:
        for y in range(y0, h, dy):
            for x in range(x0, w, dx):
                assert (x, y) not in seen
                seen.add((x, y))
    assert len(seen) == w * h


def test_multi_idat_concatenation_and_ancillary_chunks_skipped():
    rng = random.Random(7)
    px, want, _ = _rand_image(rng, 12, 9, 0)
    payload = bytearray(encode_png(12, 9, px, color_type=0))
    assert payload.count(b"IDAT") == 2  # encoder splits on purpose
    # inject a tEXt chunk between the IDATs — decoders must skip it
    body = b"comment\x00hi"
    chunk = (
        struct.pack(">I", len(body)) + b"tEXt" + body
        + struct.pack(">I", zlib.crc32(b"tEXt" + body) & 0xFFFFFFFF)
    )
    second = payload.index(b"IDAT", payload.index(b"IDAT") + 4) - 4
    patched = bytes(payload[:second]) + chunk + bytes(payload[second:])
    assert decode_png(patched) == (12, 9, want)


def test_decoder_rejects_bad_inputs():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX" + b"\x00" * 20)
    px = [[1] * 4] * 4
    good = bytearray(encode_png(4, 4, px, color_type=0))
    bad = bytearray(good)
    bad[20] ^= 0xFF  # corrupt IHDR body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # depth 3 is illegal PNG at every color type (sub-byte 1/2/4 and
    # 16-bit are all real now)
    deep = bytearray(good)
    depth_off = good.index(b"IHDR") + 4 + 8  # IHDR body: w(4) h(4) depth
    deep[depth_off] = 3
    # re-CRC the IHDR chunk so the depth error (not CRC) fires
    body = bytes(deep[good.index(b"IHDR") : good.index(b"IHDR") + 4 + 13])
    deep[good.index(b"IHDR") + 17 : good.index(b"IHDR") + 21] = struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(deep))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(bytes(good[:-8]))


def test_roundtrip_16bit_and_alpha_types():
    """r7 rungs: color types 4/6 and bit depth 16 (big-endian samples,
    widened filter bpp) across both interlace methods and all filters."""
    rng = random.Random(77)
    for ct, depth in [(0, 16), (2, 16), (4, 8), (4, 16), (6, 8), (6, 16)]:
        hi = 65535 if depth == 16 else 255
        nch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
        for interlace in (0, 1):
            w, h = rng.randrange(1, 12), rng.randrange(1, 10)
            px = [
                [
                    rng.randrange(hi + 1)
                    if nch == 1
                    else tuple(rng.randrange(hi + 1) for _ in range(nch))
                    for _ in range(w)
                ]
                for _ in range(h)
            ]
            blob = encode_png(
                w, h, px, color_type=ct, depth=depth, interlace=interlace
            )
            W, H, out = decode_png(blob)
            assert (W, H) == (w, h)
            for y in range(h):
                for x in range(w):
                    p = px[y][x]
                    if ct == 0:
                        assert out[y][x] == (p, p, p)
                    elif ct == 2:
                        assert out[y][x] == p
                    elif ct == 4:
                        assert out[y][x] == (p[0], p[0], p[0], p[1])
                    else:
                        assert out[y][x] == p


def test_16bit_palette_and_bad_depths_raise():
    with pytest.raises(ValueError, match="depth 16 illegal"):
        encode_png(2, 2, [[0, 0], [0, 0]], color_type=3,
                   palette=[(1, 2, 3)], depth=16)
    with pytest.raises(ValueError, match="bit depth"):
        encode_png(2, 2, [[0, 0], [0, 0]], color_type=0, depth=5)
    # decoder side: a hand-built IHDR with depth 16 palette must raise
    # (sub-byte gray depths are real since r7; 16-bit PLTE stays illegal)
    blob = bytearray(encode_png(2, 2, [[0, 0], [0, 0]], color_type=3,
                                palette=[(1, 2, 3)]))
    ihdr_at = blob.index(b"IHDR")
    body = bytearray(blob[ihdr_at + 4 : ihdr_at + 4 + 13])
    body[8] = 16  # depth byte
    crc = zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF
    blob[ihdr_at + 4 : ihdr_at + 4 + 13] = body
    blob[ihdr_at + 17 : ihdr_at + 21] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(blob))


class TestSubByte:
    """Depths 1/2/4 (spec 7.2 bit packing, 7.3 byte-wise filters)."""

    def test_roundtrip_gray_and_palette(self):
        from tinymapreduce_spark.functions.pngcodec import (
            decode_png, encode_png)

        pal = [(i * 17 % 256, i * 31 % 256, i * 7 % 256) for i in range(16)]
        for depth in (1, 2, 4):
            mod = 1 << depth
            for il in (0, 1):
                # widths that leave partial final bytes at every depth
                for w, h in ((13, 9), (1, 1), (17, 3)):
                    px = [[(3 * x + 5 * y + 1) % mod for x in range(w)]
                          for y in range(h)]
                    blob = encode_png(w, h, px, color_type=0, depth=depth,
                                      interlace=il)
                    assert decode_png(blob)[2] == [
                        [(v, v, v) for v in row] for row in px
                    ]
                    blob = encode_png(w, h, px, color_type=3,
                                      palette=pal[:mod], depth=depth,
                                      interlace=il)
                    assert decode_png(blob)[2] == [
                        [pal[v] for v in row] for row in px
                    ]

    def test_stride_rounds_up(self):
        """w=9 at depth 1 needs ceil(9/8)=2 bytes per scanline — a
        floor-division stride would desync every following row."""
        from tinymapreduce_spark.functions.pngcodec import (
            decode_png, encode_png)

        px = [[(x + y) % 2 for x in range(9)] for y in range(6)]
        assert decode_png(encode_png(9, 6, px, color_type=0, depth=1))[2] == [
            [(v, v, v) for v in row] for row in px
        ]

    def test_illegal_combos_refused(self):
        import pytest

        from tinymapreduce_spark.functions.pngcodec import (
            decode_png, encode_png)

        for ct, d in ((2, 4), (6, 4), (4, 2), (3, 16), (0, 3)):
            with pytest.raises(ValueError):
                encode_png(4, 4, [[0] * 4] * 4, color_type=ct, depth=d,
                           palette=[(0, 0, 0)])
        # decoder side: patch a legal file's IHDR to an illegal combo
        import struct
        import zlib

        blob = bytearray(encode_png(4, 4, [[0] * 4] * 4, color_type=0,
                                    depth=4))
        body = bytearray(blob[16:29])  # IHDR body (13 bytes)
        body[9] = 2  # truecolor at depth 4: illegal
        blob[16:29] = body
        blob[29:33] = struct.pack(
            ">I", zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF
        )
        with pytest.raises(ValueError, match="illegal"):
            decode_png(bytes(blob))
