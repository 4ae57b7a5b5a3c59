"""From-scratch DEFLATE (RFC 1951) codec — inflate AND a fixed-Huffman
greedy-LZ77 compressor — plus the gzip (RFC 1952) and zlib (RFC 1950)
wrappers; no ``zlib`` import anywhere in the decode path. Completes
the codec tier's spec-derived story: JPEG/PNG/GIF/G.711
already decode from their specs, but PNG IDAT and .warc.gz members still
leaned on stdlib zlib for the inflate step. This module removes that
last dependency for VERIFICATION paths (stdlib zlib stays the default
hot path — it is C — but every compressed byte the engine reads can now
be re-derived from the RFCs alone, and the tar.gz ingest rung runs this
decoder in-query, driver-verified).

Implements the full RFC 1951 grammar:
- stored blocks (BTYPE=00, LEN/NLEN complement check),
- fixed-Huffman blocks (BTYPE=01, the hardwired 288/30 code),
- dynamic-Huffman blocks (BTYPE=10: HLIT/HDIST/HCLEN, the 3-bit
  code-length code in its permuted order, then symbols 16/17/18 with
  their repeat semantics spanning the literal->distance boundary),
- LZ77 back-references incl. overlapping copies (dist < len),
- LSB-first bit order, end-of-stream on BFINAL.

Wrappers verify their trailers with from-scratch CRC-32 (reflected
0xEDB88320 table) and Adler-32 — a wrong checksum raises, same
honest-boundary policy as the other codecs (bad magic / reserved BTYPE
/ oversubscribed Huffman code / out-of-window distance all raise
``ValueError`` naming the defect).

Reference analog: none (TinyMapreduce reads plain text); public spec:
RFC 1950/1951/1952. Parity with stdlib zlib is pinned in
``tests/test_inflate.py`` across levels 0-9, Z_FIXED, multi-member gzip
and the PNG/WARC byte streams the engine actually produces.
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

# RFC 1951 §3.2.5 — length codes 257..285: (extra bits, base length)
_LEN_EXTRA = (0,0,0,0,0,0,0,0,1,1,1,1,2,2,2,2,3,3,3,3,4,4,4,4,5,5,5,5,0)  # fmt: skip
_LEN_BASE = (3,4,5,6,7,8,9,10,11,13,15,17,19,23,27,31,35,43,51,59,67,83,99,115,131,163,195,227,258)  # fmt: skip
# distance codes 0..29
_DIST_EXTRA = (0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,6,7,7,8,8,9,9,10,10,11,11,12,12,13,13)  # fmt: skip
_DIST_BASE = (1,2,3,4,5,7,9,13,17,25,33,49,65,97,129,193,257,385,513,769,1025,1537,2049,3073,4097,6145,8193,12289,16385,24577)  # fmt: skip
# RFC 1951 §3.2.7 — the code-length code's transmission order
_CLC_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)


def _crc_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _crc_table()


def crc32(data: bytes, crc: int = 0) -> int:
    """Reflected CRC-32 (the gzip/PNG polynomial), from the table."""
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def adler32(data: bytes, value: int = 1) -> int:
    """RFC 1950 §8 Adler-32 (mod 65521, deferred in 5552-byte spans)."""
    a, b = value & 0xFFFF, (value >> 16) & 0xFFFF
    for i in range(0, len(data), 5552):
        for byte in data[i : i + 5552]:
            a += byte
            b += a
        a %= 65521
        b %= 65521
    return (b << 16) | a


class _BitReader:
    """LSB-first bit reader over the deflate stream (RFC 1951 §3.1.1:
    data elements are packed starting at the least-significant bit)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos >= len(self.data):
                raise ValueError("deflate stream truncated mid-symbol")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        out = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return out

    def align_byte(self) -> None:
        self.acc = 0
        self.nbits = 0


class _Huffman:
    """Canonical Huffman decoder built from code lengths (RFC 1951
    §3.2.2). Decode walks the code MSB-first while the stream delivers
    bits LSB-first — one bit at a time against a (length, code) map;
    max 15 steps per symbol. An oversubscribed or over-complete length
    vector raises (corrupt table)."""

    __slots__ = ("map", "min_len", "max_len")

    def __init__(self, lengths: list[int]):
        max_len = max(lengths, default=0)
        bl_count = [0] * (max_len + 1)
        for ln in lengths:
            if ln:
                bl_count[ln] += 1
        # Kraft check: sum 2^-len must not exceed 1. Incomplete codes
        # are LEGAL (the fixed distance table is 30 codes of length 5
        # out of 32 — RFC 1951 §3.2.6); a stream that reaches an
        # unassigned code fails in decode() instead.
        kraft = sum(bl_count[ln] << (max_len - ln) for ln in range(1, max_len + 1))
        if max_len and kraft > (1 << max_len):
            raise ValueError("oversubscribed Huffman code")
        code = 0
        next_code = [0] * (max_len + 1)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        table: dict[tuple[int, int], int] = {}
        for sym, ln in enumerate(lengths):
            if ln:
                table[(ln, next_code[ln])] = sym
                next_code[ln] += 1
        self.map = table
        self.min_len = next((i for i, c in enumerate(bl_count) if i and c), 1)
        self.max_len = max_len

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.bits(1)
            if ln >= self.min_len:
                sym = self.map.get((ln, code))
                if sym is not None:
                    return sym
        raise ValueError("invalid Huffman code in stream")


def _fixed_tables() -> tuple[_Huffman, _Huffman]:
    lit = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8  # RFC 1951 §3.2.6
    return _Huffman(lit), _Huffman([5] * 30)


_FIXED_LIT, _FIXED_DIST = None, None


def _read_dynamic_tables(br: _BitReader) -> tuple[_Huffman, _Huffman]:
    hlit = br.bits(5) + 257
    hdist = br.bits(5) + 1
    hclen = br.bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(hclen):
        cl_lengths[_CLC_ORDER[i]] = br.bits(3)
    cl_huff = _Huffman(cl_lengths)
    # literal + distance lengths decode as ONE sequence: a 16/17/18
    # repeat may cross the boundary (RFC 1951 §3.2.7).
    lengths: list[int] = []
    while len(lengths) < hlit + hdist:
        sym = cl_huff.decode(br)
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            if not lengths:
                raise ValueError("repeat code with no previous length")
            lengths.extend([lengths[-1]] * (3 + br.bits(2)))
        elif sym == 17:
            lengths.extend([0] * (3 + br.bits(3)))
        else:
            lengths.extend([0] * (11 + br.bits(7)))
    if len(lengths) != hlit + hdist:
        raise ValueError("code-length repeat overflows table")
    return _Huffman(lengths[:hlit]), _Huffman(lengths[hlit:])


def inflate(data: bytes, pos: int = 0) -> tuple[bytes, int]:
    """Inflate one raw DEFLATE stream starting at byte ``pos``; returns
    ``(decompressed, next_byte_pos)`` — the position just past the
    final block, byte-aligned, so wrappers can read their trailers and
    concatenated members can continue."""
    global _FIXED_LIT, _FIXED_DIST
    br = _BitReader(data, pos)
    out = bytearray()
    while True:
        bfinal = br.bits(1)
        btype = br.bits(2)
        if btype == 0:  # stored
            br.align_byte()
            p = br.pos
            if p + 4 > len(data):
                raise ValueError("stored block header truncated")
            ln = data[p] | (data[p + 1] << 8)
            nlen = data[p + 2] | (data[p + 3] << 8)
            if ln != (~nlen & 0xFFFF):
                raise ValueError("stored block LEN/NLEN mismatch")
            if p + 4 + ln > len(data):
                raise ValueError("stored block payload truncated")
            out += data[p + 4 : p + 4 + ln]
            br.pos = p + 4 + ln
        elif btype in (1, 2):
            if btype == 1:
                if _FIXED_LIT is None:
                    _FIXED_LIT, _FIXED_DIST = _fixed_tables()
                lit_huff, dist_huff = _FIXED_LIT, _FIXED_DIST
            else:
                lit_huff, dist_huff = _read_dynamic_tables(br)
            while True:
                sym = lit_huff.decode(br)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError(f"invalid length code {sym}")
                    i = sym - 257
                    length = _LEN_BASE[i] + br.bits(_LEN_EXTRA[i])
                    dsym = dist_huff.decode(br)
                    if dsym > 29:
                        raise ValueError(f"invalid distance code {dsym}")
                    dist = _DIST_BASE[dsym] + br.bits(_DIST_EXTRA[dsym])
                    if dist > len(out):
                        raise ValueError("distance beyond window start")
                    start = len(out) - dist
                    if dist >= length:
                        out += out[start : start + length]
                    else:  # overlapping copy: byte-serial by definition
                        for k in range(length):
                            out.append(out[start + k])
        else:
            raise ValueError("reserved BTYPE=11 block")
        if bfinal:
            break
    # byte-align: trailer fields start at the next whole byte
    return bytes(out), br.pos - (br.nbits // 8)


def zlib_inflate(data: bytes) -> bytes:
    """RFC 1950: CMF/FLG sanity (method 8, header check mod 31, no
    preset dictionary), raw inflate, Adler-32 trailer verification."""
    if len(data) < 6:
        raise ValueError("zlib stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError(f"zlib CM {cmf & 0x0F} is not deflate")
    if (cmf << 8 | flg) % 31:
        raise ValueError("zlib header check failed")
    if flg & 0x20:
        raise ValueError("preset dictionary not supported")
    out, pos = inflate(data, 2)
    if pos + 4 > len(data):
        raise ValueError("zlib Adler-32 trailer truncated")
    stored = int.from_bytes(data[pos : pos + 4], "big")
    if stored != adler32(out):
        raise ValueError("zlib Adler-32 mismatch")
    return out


def gunzip(data: bytes) -> bytes:
    """RFC 1952: walk ALL concatenated gzip members (the .gz multi-
    member convention _gunzip_members handles via stdlib), honoring
    FEXTRA/FNAME/FCOMMENT/FHCRC, verifying each member's CRC-32 and
    ISIZE trailer. Trailing garbage that is not a member raises."""
    out = bytearray()
    pos = 0
    if not data:
        raise ValueError("empty gzip stream")
    while pos < len(data):
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("bad gzip magic")
        if pos + 10 > len(data):
            raise ValueError("gzip header truncated")
        if data[pos + 2] != 8:
            raise ValueError(f"gzip CM {data[pos + 2]} is not deflate")
        flg = data[pos + 3]
        if flg & 0xE0:
            raise ValueError("reserved gzip FLG bits set")
        p = pos + 10
        if flg & 0x04:  # FEXTRA
            if p + 2 > len(data):
                raise ValueError("FEXTRA length truncated")
            p += 2 + (data[p] | (data[p + 1] << 8))
        for bit in (0x08, 0x10):  # FNAME, FCOMMENT: NUL-terminated
            if flg & bit:
                end = data.find(b"\x00", p)
                if end < 0:
                    raise ValueError("unterminated gzip header string")
                p = end + 1
        if flg & 0x02:  # FHCRC: low 16 bits of the header's CRC-32
            if p + 2 > len(data):
                raise ValueError("FHCRC truncated")
            if (data[p] | (data[p + 1] << 8)) != (crc32(data[pos:p]) & 0xFFFF):
                raise ValueError("gzip header CRC mismatch")
            p += 2
        member, p = inflate(data, p)
        if p + 8 > len(data):
            raise ValueError("gzip trailer truncated")
        if int.from_bytes(data[p : p + 4], "little") != crc32(member):
            raise ValueError("gzip CRC-32 mismatch")
        if int.from_bytes(data[p + 4 : p + 8], "little") != len(member) % (1 << 32):
            raise ValueError("gzip ISIZE mismatch")
        out += member
        pos = p + 8
    return bytes(out)


# --- encode side: from-scratch DEFLATE compressor ---------------------------
# Fixed-Huffman (BTYPE=01) blocks over a greedy hash-chain LZ77 matcher
# (RFC 1951 §4 describes exactly this strategy): 3-byte hash heads,
# bounded chain walk, longest-match with the 258 cap, no lazy matching
# (greedy is legal — only ratio, never correctness, depends on the
# matcher). The output is a VALID deflate stream any inflater accepts;
# roundtrip exactness is pinned against BOTH stdlib zlib and this
# module's own inflate. This closes the codec tier's encode side: GIF
# already compresses LZW from scratch; with this, the gzip family
# (tar shards) compresses from scratch too.
_FIXED_LIT_CODE: list[tuple[int, int]] = []
for _sym in range(288):  # RFC 1951 §3.2.6
    if _sym < 144:
        _FIXED_LIT_CODE.append((0b00110000 + _sym, 8))
    elif _sym < 256:
        _FIXED_LIT_CODE.append((0b110010000 + _sym - 144, 9))
    elif _sym < 280:
        _FIXED_LIT_CODE.append((_sym - 256, 7))
    else:
        _FIXED_LIT_CODE.append((0b11000000 + _sym - 280, 8))


class _BitWriter:
    __slots__ = ("acc", "nbits", "out")

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def bits(self, val: int, n: int) -> None:  # LSB-first data elements
        self.acc |= val << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def code(self, code: int, n: int) -> None:  # Huffman codes go MSB-first
        for i in range(n - 1, -1, -1):
            self.bits((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _len_symbol(length: int) -> tuple[int, int, int]:
    for i in range(len(_LEN_BASE) - 1, -1, -1):
        if length >= _LEN_BASE[i]:
            return 257 + i, length - _LEN_BASE[i], _LEN_EXTRA[i]
    raise ValueError(length)


def _dist_symbol(dist: int) -> tuple[int, int, int]:
    for i in range(len(_DIST_BASE) - 1, -1, -1):
        if dist >= _DIST_BASE[i]:
            return i, dist - _DIST_BASE[i], _DIST_EXTRA[i]
    raise ValueError(dist)


def _lz77_tokens(data: bytes, max_chain: int = 32):
    """Greedy hash-chain LZ77 tokenizer shared by the fixed- and
    dynamic-Huffman emitters: yields ``(literal_byte, None)`` or
    ``(length, distance)`` tuples, identical match selection and head
    insertion order to the original deflate_fixed loop."""
    heads: dict[int, list[int]] = {}
    i, n = 0, len(data)
    while i < n:
        best_len, best_dist = 0, 0
        if i + 3 <= n:
            key = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
            chain = heads.get(key, ())
            tried = 0
            for j in reversed(chain):
                if i - j > 32768:
                    break
                tried += 1
                if tried > max_chain:
                    break
                ln = 0
                maxl = min(258, n - i)
                while ln < maxl and data[j + ln] == data[i + ln]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, i - j
                    if ln >= maxl:
                        break
        if best_len >= 3:
            yield best_len, best_dist
            end = i + best_len
            while i < end:
                if i + 3 <= n:
                    k = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
                    heads.setdefault(k, []).append(i)
                i += 1
        else:
            yield data[i], None
            if i + 3 <= n:
                k = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
                heads.setdefault(k, []).append(i)
            i += 1


def deflate_fixed(data: bytes, max_chain: int = 32) -> bytes:
    """Compress ``data`` as one fixed-Huffman deflate block (BFINAL=1)."""
    w = _BitWriter()
    w.bits(1, 1)  # BFINAL
    w.bits(1, 2)  # BTYPE=01
    for a, b in _lz77_tokens(data, max_chain):
        if b is None:
            c, cl = _FIXED_LIT_CODE[a]
            w.code(c, cl)
        else:
            sym, extra, nbits = _len_symbol(a)
            c, cl = _FIXED_LIT_CODE[sym]
            w.code(c, cl)
            w.bits(extra, nbits)
            dsym, dextra, dnbits = _dist_symbol(b)
            w.code(dsym, 5)  # fixed dist codes: 5-bit, value == symbol
            w.bits(dextra, dnbits)
    c, cl = _FIXED_LIT_CODE[256]  # end of block
    w.code(c, cl)
    return w.done()


def deflate_rle(data: bytes) -> bytes:
    """Run-length-restricted fixed-Huffman deflate (one BFINAL=1 block):
    matches are emitted ONLY at distance 1 — each maximal equal-byte run
    becomes one literal plus greedy 258-capped dist-1 matches (a 1-2 byte
    tail falls back to literals). Still a fully valid RFC 1951 stream
    (``zlib.decompressobj(-15)`` and ``inflate`` both reproduce the
    input), but unlike the greedy-LZ77 ``deflate_fixed`` its exact output
    size is a CLOSED-FORM function of the run-length decomposition —
    replayable in plain SQL, which is what gives ``compressibility`` a
    full hash oracle (``rle_deflate_size`` below is that formula)."""
    w = _BitWriter()
    w.bits(1, 1)  # BFINAL
    w.bits(1, 2)  # BTYPE=01 fixed Huffman
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        j = i + 1
        while j < n and data[j] == b:
            j += 1
        c, cl = _FIXED_LIT_CODE[b]
        w.code(c, cl)
        rem = (j - i) - 1  # bytes covered by dist-1 back-references
        while rem >= 3:
            m = min(rem, 258)
            sym, extra, nbits = _len_symbol(m)
            lc, lcl = _FIXED_LIT_CODE[sym]
            w.code(lc, lcl)
            w.bits(extra, nbits)
            w.code(0, 5)  # distance 1 -> symbol 0, 5-bit code, no extra
            rem -= m
        for _ in range(rem):  # 1-2 byte run tail: literals
            w.code(c, cl)
        i = j
    c, cl = _FIXED_LIT_CODE[256]
    w.code(c, cl)
    return w.done()


def rle_deflate_size(data: bytes) -> int:
    """Closed-form byte count of ``deflate_rle(data)`` — the exact
    quantity the ``compressibility`` SQL oracle recomputes per document
    from the run-length decomposition. Per maximal run of byte ``b``
    with length L: one literal (8 bits if b < 144 else 9), then with
    R = L-1: R // 258 full matches at 13 bits each (symbol 285 + 5-bit
    dist code) and a remainder r = R % 258 that costs one more match if
    r >= 3 else r literals. Plus 3 header bits, the 7-bit end-of-block
    code, and padding to a byte boundary."""
    bits = 3 + 7  # BFINAL/BTYPE header + EOB (symbol 256, 7-bit code)
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        j = i + 1
        while j < n and data[j] == b:
            j += 1
        lit = 8 if b < 144 else 9
        bits += lit
        R = (j - i) - 1
        bits += (R // 258) * 13
        r = R % 258
        if r >= 3:
            # CASE ladder mirrored verbatim by COMPRESSIBILITY_SQL
            if r >= 131:
                bits += 18  # 8-bit len code (280-284) + 5 extra + 5 dist
            elif r >= 115:
                bits += 17  # 8-bit len code + 4 extra + 5 dist
            elif r >= 67:
                bits += 16  # 7-bit len code + 4 extra + 5 dist
            elif r >= 35:
                bits += 15
            elif r >= 19:
                bits += 14
            elif r >= 11:
                bits += 13
            else:
                bits += 12  # lengths 3-10: 7 + 0 + 5
        else:
            bits += r * lit
        i = j
    return (bits + 7) // 8


def gzip_compress(data: bytes) -> bytes:
    """Single-member RFC 1952 gzip around ``deflate_fixed`` — own
    CRC-32/ISIZE trailer, mtime pinned to 0 (determinism convention)."""
    hdr = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
    return (
        hdr
        + deflate_fixed(data)
        + crc32(data).to_bytes(4, "little")
        + (len(data) % (1 << 32)).to_bytes(4, "little")
    )


# --------------------------------------------------------------------------
# dynamic-Huffman deflate (BTYPE=10 emitter) — round 7
# --------------------------------------------------------------------------

def _limited_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Package-merge (Larmore-Hirschberg) length-limited Huffman code
    lengths for the nonzero-frequency symbols; zeros get length 0.
    A single used symbol gets length 1 (RFC 1951 permits the resulting
    incomplete code)."""
    syms = [i for i, f in enumerate(freqs) if f > 0]
    if not syms:
        return [0] * len(freqs)
    if len(syms) == 1:
        out = [0] * len(freqs)
        out[syms[0]] = 1
        return out
    if len(syms) > (1 << max_len):
        raise ValueError("alphabet too large for the length limit")
    # packages[j] = list at level j of (weight, {sym: count}) items
    items = sorted((freqs[s], (s,)) for s in syms)
    level = [(w, list(ss)) for w, ss in items]
    for _ in range(max_len - 1):
        # package pairs, then merge with the original item list
        packaged = [
            (level[k][0] + level[k + 1][0], level[k][1] + level[k + 1][1])
            for k in range(0, len(level) - 1, 2)
        ]
        merged = [(w, list(ss)) for w, ss in items] + packaged
        merged.sort(key=lambda t: t[0])
        level = merged
    # take the 2(n-1) cheapest packages; each symbol appearance adds 1
    out = [0] * len(freqs)
    for w, ss in level[: 2 * (len(syms) - 1)]:
        for s in ss:
            out[s] += 1
    return out


def _canonical_codes(lengths: list[int]) -> list[int]:
    """RFC 1951 §3.2.2 canonical code assignment from lengths."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out = [0] * len(lengths)
    for s, ln in enumerate(lengths):
        if ln:
            out[s] = next_code[ln]
            next_code[ln] += 1
    return out


def _clc_sequence(lengths: list[int]):
    """Encode a code-length vector as the RLE symbol stream of §3.2.7:
    yields (symbol, extra_value, extra_bits)."""
    i, n = 0, len(lengths)
    while i < n:
        v = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == v:
            run += 1
        if v == 0:
            while run >= 11:
                take = min(run, 138)
                yield 18, take - 11, 7
                run -= take
            while run >= 3:
                take = min(run, 10)
                yield 17, take - 3, 3
                run -= take
            for _ in range(run):
                yield 0, 0, 0
        else:
            yield v, 0, 0
            run -= 1
            while run >= 3:
                take = min(run, 6)
                yield 16, take - 3, 2
                run -= take
            for _ in range(run):
                yield v, 0, 0
        # advance past the run we just consumed
        j = i + 1
        while j < n and lengths[j] == v:
            j += 1
        i = j


def deflate_dynamic(data: bytes, max_chain: int = 32) -> bytes:
    """Compress ``data`` as ONE dynamic-Huffman block (BFINAL=1,
    BTYPE=10): greedy-LZ77 tokens -> per-block symbol frequencies ->
    package-merge length-limited codes (15 for literal/distance, 7 for
    the code-length code) -> canonical assignment -> HLIT/HDIST/HCLEN
    header with the §3.2.7 RLE'd code-length sequence. Decodable by
    this module's inflate AND stdlib zlib (raw, wbits=-15)."""
    tokens = list(_lz77_tokens(data, max_chain))
    lit_freq = [0] * 286
    dist_freq = [0] * 30
    for a, b in tokens:
        if b is None:
            lit_freq[a] += 1
        else:
            lit_freq[_len_symbol(a)[0]] += 1
            dist_freq[_dist_symbol(b)[0]] += 1
    lit_freq[256] += 1  # end-of-block
    lit_len = _limited_lengths(lit_freq, 15)
    dist_len = _limited_lengths(dist_freq, 15)
    lit_code = _canonical_codes(lit_len)
    dist_code = _canonical_codes(dist_len)

    hlit = max(257, max(i + 1 for i, ln in enumerate(lit_len) if ln))
    used_d = [i + 1 for i, ln in enumerate(dist_len) if ln]
    hdist = max(1, used_d[-1] if used_d else 0)

    cl_seq = list(_clc_sequence(lit_len[:hlit] + dist_len[:hdist]))
    clc_freq = [0] * 19
    for sym, _, _ in cl_seq:
        clc_freq[sym] += 1
    clc_len = _limited_lengths(clc_freq, 7)
    clc_code = _canonical_codes(clc_len)
    hclen = 19
    while hclen > 4 and clc_len[_CLC_ORDER[hclen - 1]] == 0:
        hclen -= 1

    w = _BitWriter()
    w.bits(1, 1)  # BFINAL
    w.bits(2, 2)  # BTYPE=10
    w.bits(hlit - 257, 5)
    w.bits(hdist - 1, 5)
    w.bits(hclen - 4, 4)
    for k in range(hclen):
        w.bits(clc_len[_CLC_ORDER[k]], 3)
    for sym, extra, nbits in cl_seq:
        w.code(clc_code[sym], clc_len[sym])
        if nbits:
            w.bits(extra, nbits)
    for a, b in tokens:
        if b is None:
            w.code(lit_code[a], lit_len[a])
        else:
            sym, extra, nbits = _len_symbol(a)
            w.code(lit_code[sym], lit_len[sym])
            w.bits(extra, nbits)
            dsym, dextra, dnbits = _dist_symbol(b)
            w.code(dist_code[dsym], dist_len[dsym])
            w.bits(dextra, dnbits)
    w.code(lit_code[256], lit_len[256])
    return w.done()
