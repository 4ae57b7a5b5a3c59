"""From-scratch DEFLATE/gzip/zlib decoder (functions/inflate.py) vs the
stdlib: every compressed byte stream the engine can produce must inflate
to the identical plaintext, and every trailer/framing defect must raise.
RFC 1950/1951/1952 parity pinned across block types (stored, fixed,
dynamic), levels 0-9, overlapping LZ77 copies, multi-member gzip, full
header-flag coverage (FEXTRA/FNAME/FCOMMENT/FHCRC) and the actual PNG
IDAT / .warc.gz bytes the other codec rungs emit."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from tinymapreduce_spark.functions.inflate import (
    adler32,
    crc32,
    gunzip,
    inflate,
    zlib_inflate,
)


def _corpora() -> list[bytes]:
    rng = random.Random(42)
    return [
        b"",
        b"a",
        b"hello world",
        b"abc" * 2000,  # overlapping back-references
        bytes(rng.randrange(256) for _ in range(5000)),  # incompressible
        ("the quick brown fox " * 400).encode(),
        bytes(range(256)) * 40,
        b"\x00" * 70000,  # > one stored-block max (65535)
    ]


def test_crc32_adler32_match_stdlib():
    for data in _corpora():
        assert crc32(data) == zlib.crc32(data)
        assert adler32(data) == zlib.adler32(data)


def test_raw_inflate_all_levels():
    for data in _corpora():
        for level in range(10):  # 0 = stored blocks, 1-9 = huffman
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            blob = co.compress(data) + co.flush()
            out, pos = inflate(blob)
            assert out == data
            assert pos == len(blob)


def test_fixed_huffman_blocks():
    # Z_FIXED forces BTYPE=01 — the hardwired 288/30 code path
    for data in _corpora():
        co = zlib.compressobj(6, zlib.DEFLATED, -15, 9, zlib.Z_FIXED)
        blob = co.compress(data) + co.flush()
        assert inflate(blob)[0] == data


def test_zlib_wrapper_parity_and_trailer():
    for data in _corpora():
        blob = zlib.compress(data, 7)
        assert zlib_inflate(blob) == data
    bad = bytearray(zlib.compress(b"payload"))
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="Adler-32"):
        zlib_inflate(bytes(bad))


def test_gunzip_single_and_multi_member():
    for data in _corpora():
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        blob = co.compress(data) + co.flush()
        assert gunzip(blob) == data
    # concatenated members — the .warc.gz convention
    parts = [b"first member ", b"second " * 100, b""]
    blob = b"".join(
        (lambda co: co.compress(p) + co.flush())(zlib.compressobj(6, zlib.DEFLATED, 31))
        for p in parts
    )
    assert gunzip(blob) == b"".join(parts)


def test_gzip_header_flags():
    # hand-built member: FEXTRA + FNAME + FCOMMENT + FHCRC all set
    payload = b"flagged payload " * 9
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = co.compress(payload) + co.flush()
    extra = b"\x04\x00ab\x01\x00"  # one subfield, len 6
    hdr = bytearray(b"\x1f\x8b\x08" + bytes([0x02 | 0x04 | 0x08 | 0x10]))
    hdr += b"\x00\x00\x00\x00\x00\xff"  # mtime/xfl/os
    hdr += struct.pack("<H", len(extra)) + extra
    hdr += b"name.txt\x00" + b"a comment\x00"
    hdr += struct.pack("<H", zlib.crc32(bytes(hdr)) & 0xFFFF)
    blob = bytes(hdr) + raw + struct.pack(
        "<II", zlib.crc32(payload), len(payload) & 0xFFFFFFFF
    )
    assert gunzip(blob) == payload
    # flip one header byte: the FHCRC check must catch it
    bad = bytearray(blob)
    bad[4] ^= 1  # mtime byte, covered by FHCRC
    with pytest.raises(ValueError, match="header CRC"):
        gunzip(bytes(bad))


def test_framing_defects_raise():
    blob = zlib.compress(b"x" * 100)[2:-4]  # raw deflate
    with pytest.raises(ValueError):
        inflate(blob[:3])  # truncated mid-stream
    with pytest.raises(ValueError, match="BTYPE"):
        inflate(b"\x07\x00")  # BFINAL=1, BTYPE=11 reserved
    with pytest.raises(ValueError, match="LEN/NLEN"):
        inflate(b"\x01\x05\x00\x00\x00xxxxx")  # NLEN not complement
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    g = co.compress(b"payload") + co.flush()
    with pytest.raises(ValueError, match="magic"):
        gunzip(b"\x1f\x8c" + g[2:])
    bad = bytearray(g)
    bad[-5] ^= 0x40  # corrupt CRC-32 trailer
    with pytest.raises(ValueError, match="CRC-32"):
        gunzip(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        gunzip(g[:-3])


def test_distance_beyond_window_raises():
    # hand-rolled fixed-huffman block: literal 'A' then a match with
    # dist 4 > produced 1 byte. Fixed code: 'A'(65)->0x71 len8,
    # len-code 257(len 3)->0000001 len7, dist 3 -> 00011 5 bits
    bits = "01" + "10"[::-1]  # BFINAL=1, BTYPE=01 (LSB-first writing)

    class W:
        def __init__(self):
            self.acc, self.n, self.out = 0, 0, bytearray()

        def put(self, val, n):  # LSB-first
            self.acc |= val << self.n
            self.n += n
            while self.n >= 8:
                self.out.append(self.acc & 0xFF)
                self.acc >>= 8
                self.n -= 8

        def put_code(self, code, n):  # huffman codes go MSB-first
            for i in range(n - 1, -1, -1):
                self.put((code >> i) & 1, 1)

        def done(self):
            if self.n:
                self.out.append(self.acc & 0xFF)
            return bytes(self.out)

    w = W()
    w.put(1, 1)  # BFINAL
    w.put(1, 2)  # BTYPE=01
    w.put_code(0b00110000 + 65, 8)  # literal 'A'
    w.put_code(0b0000001, 7)  # length code 257 => len 3
    w.put_code(3, 5)  # dist code 3 => dist 4 > window(1)
    w.put_code(0, 7)  # EOB (unreached)
    with pytest.raises(ValueError, match="window"):
        inflate(w.done())
    assert bits  # silence lint on the doc string scratch


def test_overlapping_copy_semantics():
    # 'abc' then a 9-byte copy at distance 3 == 'abc'*4 — byte-serial
    data = b"abcabcabcabc"
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    blob = co.compress(data) + co.flush()
    assert inflate(blob)[0] == data


def test_parity_on_engine_byte_streams():
    # the exact compressed streams the other rungs produce
    from tinymapreduce_spark.functions.pngcodec import encode_png
    from tinymapreduce_spark.sources.warcfiles import (
        _doc_records,
        parse_warc,
        write_warc,
    )

    px = [[(x * 7 + y) % 256 for x in range(20)] for y in range(10)]
    png = encode_png(20, 10, px, color_type=0)
    idat, pos = bytearray(), 8  # walk chunks: len, tag, body, crc
    while pos < len(png):
        n = int.from_bytes(png[pos : pos + 4], "big")
        if png[pos + 4 : pos + 8] == b"IDAT":
            idat += png[pos + 8 : pos + 8 + n]
        pos += 12 + n
    idat = bytes(idat)
    assert zlib_inflate(idat) == zlib.decompress(idat)

    gz = write_warc(_doc_records(7), gzip_members=True)
    plain = write_warc(_doc_records(7), gzip_members=False)
    assert gunzip(gz) == plain
    assert parse_warc(gz) == parse_warc(plain)


def test_deflate_fixed_roundtrips_both_decoders():
    from tinymapreduce_spark.functions.inflate import deflate_fixed, gzip_compress

    import gzip as _gzip

    for data in _corpora():
        blob = deflate_fixed(data)
        assert zlib.decompress(blob, -15) == data  # a REAL inflater accepts it
        out, pos = inflate(blob)
        assert out == data and pos == len(blob)
        assert gunzip(gzip_compress(data)) == data
        assert _gzip.decompress(gzip_compress(data)) == data


def test_deflate_fixed_actually_compresses():
    from tinymapreduce_spark.functions.inflate import deflate_fixed

    rep = ("spark deflate " * 3000).encode()
    assert len(deflate_fixed(rep)) < len(rep) // 20  # LZ77 matches fire
    # window cap respected: a match can never reach past 32768 bytes
    far = bytes(10) + bytes([1]) * 40000 + bytes(10)
    assert zlib.decompress(deflate_fixed(far), -15) == far


def test_deflate_inflate_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tinymapreduce_spark.functions.inflate import deflate_fixed

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=3000))
    def check(data):
        blob = deflate_fixed(data)
        assert zlib.decompress(blob, -15) == data
        out, pos = inflate(blob)
        assert out == data and pos == len(blob)
        # and our inflate accepts zlib's encoding of the same data
        assert inflate(zlib.compress(data, 6)[2:-4])[0] == data

    check()


def test_deflate_rle_roundtrip_and_closed_form():
    """The dist-1-restricted leg: valid RFC 1951 for both decoders, and
    len() must equal the closed-form `rle_deflate_size` (the formula the
    compressibility SQL oracle replays) on corpora, edge shapes, and
    random bytes."""
    from tinymapreduce_spark.functions.inflate import deflate_rle, rle_deflate_size

    edge = [
        b"", b"a", b"ab", b"aa", b"aaa", b"aaab",
        b"a" * 258, b"a" * 259, b"a" * 260, b"a" * 261, b"a" * 517,
        b"a" * 258 * 3 + b"b" * 2, bytes([200]) * 7 + b"q" + bytes([150]) * 3,
    ]
    for data in list(_corpora()) + edge:
        blob = deflate_rle(data)
        assert zlib.decompress(blob, -15) == data
        out, pos = inflate(blob)
        assert out == data and pos == len(blob)
        assert len(blob) == rle_deflate_size(data)


def test_deflate_rle_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tinymapreduce_spark.functions.inflate import deflate_rle, rle_deflate_size

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=3000))
    def check(data):
        blob = deflate_rle(data)
        assert zlib.decompress(blob, -15) == data
        assert len(blob) == rle_deflate_size(data)

    check()

    # runny inputs exercise every rung of the bit ladder
    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 255), st.integers(1, 600)),
            max_size=12,
        )
    )
    def check_runs(runs):
        data = b"".join(bytes([b]) * n for b, n in runs)
        blob = deflate_rle(data)
        assert zlib.decompress(blob, -15) == data
        assert len(blob) == rle_deflate_size(data)

    check_runs()


class TestDeflateDynamic:
    """BTYPE=10 emitter: package-merge limited lengths, canonical
    codes, the §3.2.7 code-length RLE. Stdlib zlib is the independent
    referee — it rejects malformed tables and wrong streams."""

    def test_roundtrips_vs_both_decoders(self):
        import random
        import zlib

        from tinymapreduce_spark.functions.inflate import (
            deflate_dynamic, inflate)

        rnd = random.Random(3)
        cases = [b"", b"a", b"ab" * 3000, bytes(range(256)) * 6,
                 b"the quick brown fox " * 400]
        for _ in range(12):
            n = rnd.randrange(0, 12000)
            alpha = bytes(rnd.randrange(256)
                          for _ in range(rnd.randrange(2, 40)))
            cases.append(bytes(rnd.choice(alpha) for _ in range(n)))
        for data in cases:
            blob = deflate_dynamic(data)
            assert inflate(blob)[0] == data
            assert zlib.decompress(blob, -15) == data

    def test_beats_fixed_on_skewed_text(self):
        from tinymapreduce_spark.functions.inflate import (
            deflate_dynamic, deflate_fixed)

        data = (b"aaaaabbbbcccdde" * 800)
        assert len(deflate_dynamic(data)) < len(deflate_fixed(data))

    def test_length_limit_forced(self):
        """Fibonacci-weighted frequencies over 24 symbols force an
        unlimited Huffman tree deeper than 15; package-merge must clamp
        — zlib would reject an over-deep table outright."""
        import zlib

        from tinymapreduce_spark.functions.inflate import deflate_dynamic

        fib = [1, 1]
        while len(fib) < 24:
            fib.append(fib[-1] + fib[-2])
        data = b"".join(bytes([i]) * f for i, f in enumerate(fib))
        blob = deflate_dynamic(data)
        assert zlib.decompress(blob, -15) == data

    def test_single_symbol_and_no_matches(self):
        import zlib

        from tinymapreduce_spark.functions.inflate import deflate_dynamic

        # single distinct literal: length-1 incomplete code
        data = b"z" * 5000
        assert zlib.decompress(deflate_dynamic(data), -15) == data
        # all-distinct short input: no LZ77 matches, HDIST=1 with an
        # all-zero distance table
        data2 = bytes(range(200))
        blob = deflate_dynamic(data2)
        assert zlib.decompress(blob, -15) == data2

    def test_package_merge_is_kraft_tight(self):
        from tinymapreduce_spark.functions.inflate import _limited_lengths

        import random
        rnd = random.Random(9)
        for _ in range(40):
            n = rnd.randrange(2, 60)
            freqs = [rnd.randrange(0, 1000) for _ in range(n)]
            if sum(1 for f in freqs if f) < 2:
                freqs[0] += 1
                freqs[1 % n] += 1
            for lim in (7, 15):
                ls = _limited_lengths(freqs, lim)
                used = [l for l in ls if l]
                assert max(used) <= lim
                # complete prefix code over the used symbols
                assert sum(1 << (lim - l) for l in used) == (1 << lim) or \
                    len(used) == 1
