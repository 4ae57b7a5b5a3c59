"""TIFF 6.0 reader + writer (grayscale, strip-based) with PackBits —
the TAG-DIRECTORY container family (IFD: a counted list of 12-byte
(tag, type, count, value-or-offset) entries, little- or big-endian by
the byte-order mark) and the RLE compression family the codec tier
lacked (PackBits, TIFF 6.0 §9: control byte n in [0,127] = literal run
of n+1 bytes; n in [-127,-1] = the next byte repeated 1-n times; -128
is a no-op). GIF contributed LZW, functions/inflate.py LZ77+Huffman;
PackBits completes the classic taxonomy. TIFF's OWN LZW variant
(§13) is implemented too — MSB-first code packing and the
"early-change" width bumps that differ from GIF's LSB-first late
change — plus the horizontal-differencing predictor (tag 317 = 2,
§14) that turns smooth gradients into small-delta streams before
compression.

Both byte orders are written and read ("II" little, "MM" big — the
endianness axis none of the other containers exercise), strips split
the image so multi-strip assembly is real, and the honest-boundary
policy applies: bad magic, unsupported compression/bit depth, strip
overruns and PackBits control-stream defects raise ``ValueError``
naming the defect.

Reference analog: none; public spec: Adobe TIFF 6.0 (1992).
"""

from __future__ import annotations

import struct
import sys

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

# the IFD tags we read/write (TIFF 6.0 baseline grayscale)
_WIDTH, _HEIGHT, _BITS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _STRIP_OFFSETS, _ROWS_PER_STRIP, _STRIP_COUNTS = 262, 273, 278, 279
_PREDICTOR = 317  # 1 = none, 2 = horizontal differencing (TIFF 6.0 §14)

# TIFF LZW (TIFF 6.0 §13): 8-bit-initial LZW with two conventions that
# differ from GIF's — codes pack MSB-first into the byte stream, and
# the code width bumps one table entry EARLY ("early change": encoder
# widens when the next free code reaches 511/1023/2047, the decoder —
# which lags the encoder's table by exactly one entry — at
# 510/1022/2046). ClearCode 256 / EOI 257, first free entry 258,
# 12-bit cap, encoder emits ClearCode when the table reaches 4094.
_LZW_CLEAR, _LZW_EOI, _LZW_FIRST = 256, 257, 258


def lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW compressor (MSB-first, early change)."""
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt, width = _LZW_FIRST, 9
    put(_LZW_CLEAR, width)
    omega = b""
    for b in data:
        cand = omega + bytes([b])
        if cand in table:
            omega = cand
            continue
        put(table[omega], width)
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if nxt >= 4094:  # table nearly full: flush dictionary
            put(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = _LZW_FIRST, 9
        omega = bytes([b])
    if omega:
        put(table[omega], width)
    put(_LZW_EOI, width)
    if nbits:  # flush the final partial byte, zero-padded low
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    """Decode exactly ``expected`` bytes; dictionary/width defects and
    over/underruns raise ``ValueError`` naming the defect."""
    out = bytearray()
    pos = acc = nbits = 0

    def get(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated before EOI")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        return (acc >> nbits) & ((1 << width) - 1)

    table: list[bytes] = []
    nxt, width = _LZW_FIRST, 9
    old: bytes | None = None
    while True:
        code = get(width)
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nxt, width, old = _LZW_FIRST, 9, None
            continue
        if not table:
            raise ValueError("LZW code before initial ClearCode")
        if code < nxt:
            entry = table[code]
            if old is not None:
                table.append(old + entry[:1])
                nxt += 1
        elif code == nxt and old is not None:  # KwKwK
            entry = old + old[:1]
            table.append(entry)
            nxt += 1
        else:
            raise ValueError(f"LZW code {code} outside table of {nxt}")
        out += entry
        # early change, one entry before the encoder (decoder table lag)
        if nxt == (1 << width) - 2 and width < 12:
            width += 1
        old = entry
        if len(out) > expected:
            raise ValueError("LZW output overshoots strip size")
    if len(out) != expected:
        raise ValueError("LZW output short of strip size")
    return bytes(out)


def _diff_rows(raw: bytes, width: int) -> bytes:
    """Predictor 2 forward pass: each row keeps its first byte, the
    rest become horizontal deltas mod 256 (TIFF 6.0 §14)."""
    out = bytearray()
    for r0 in range(0, len(raw), width):
        row = raw[r0 : r0 + width]
        out.append(row[0])
        out += bytes((row[x] - row[x - 1]) & 0xFF for x in range(1, len(row)))
    return bytes(out)


def _undiff_rows(raw: bytes, width: int) -> bytes:
    """Predictor 2 inverse: per-row prefix sum mod 256."""
    out = bytearray()
    for r0 in range(0, len(raw), width):
        acc = 0
        for x in range(r0, min(r0 + width, len(raw))):
            acc = (acc + raw[x]) & 0xFF
            out.append(acc)
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """TIFF 6.0 PackBits: greedy — repeat runs >= 3 become replicate
    packets (max 128), everything else literal packets (max 128)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([256 - (run - 1), data[i]])  # -(run-1) two's complement
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Decode exactly ``expected`` bytes; anything else is a defect."""
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("PackBits stream truncated")
        c = data[i]
        i += 1
        if c == 128:  # no-op
            continue
        if c < 128:  # literal run of c+1
            if i + c + 1 > len(data):
                raise ValueError("PackBits literal overruns stream")
            out += data[i : i + c + 1]
            i += c + 1
        else:  # replicate next byte 257-c times
            if i >= len(data):
                raise ValueError("PackBits replicate missing byte")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) != expected:
        raise ValueError("PackBits output overshoots strip size")
    return bytes(out)


def encode_tiff(
    width: int,
    height: int,
    pixels: list[list[int]],
    packbits: bool = False,
    big_endian: bool = False,
    rows_per_strip: int = 4,
    lzw: bool = False,
    predictor: bool = False,
) -> bytes:
    """8-bit grayscale strip-based TIFF; ``pixels[y][x]``. Strips of
    ``rows_per_strip`` rows (so multi-strip assembly is exercised),
    optional PackBits or LZW (with optional horizontal-differencing
    predictor), either byte order."""
    if packbits and lzw:
        raise ValueError("choose one of packbits/lzw")
    e = ">" if big_endian else "<"
    strips: list[bytes] = []
    for y0 in range(0, height, rows_per_strip):
        raw = b"".join(
            bytes(pixels[y]) for y in range(y0, min(y0 + rows_per_strip, height))
        )
        if predictor:
            raw = _diff_rows(raw, width)
        if packbits:
            raw = packbits_encode(raw)
        elif lzw:
            raw = lzw_encode(raw)
        strips.append(raw)
    n_strips = len(strips)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # TIFF 6.0: values shorter than 4 bytes sit LEFT-justified in
        # the value field — a big-endian SHORT must be packed as H + pad,
        # not as a 4-byte I (which would right-justify it)
        if typ == 3 and count == 1:
            field = struct.pack(f"{e}H", value) + b"\x00\x00"
        else:
            field = struct.pack(f"{e}I", value)
        return struct.pack(f"{e}HHI", tag, typ, count) + field

    # layout: header(8) + IFD + [offsets array][counts array] + strips
    n_entries = 9 if predictor else 8
    ifd_size = 2 + n_entries * 12 + 4
    arrays_at = 8 + ifd_size
    extra = b""
    if n_strips > 1:
        offs_at = arrays_at
        cnts_at = offs_at + 4 * n_strips
        data_at = cnts_at + 4 * n_strips
    else:
        data_at = arrays_at
    offsets, pos = [], data_at
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    if n_strips > 1:
        extra = struct.pack(f"{e}{n_strips}I", *offsets) + struct.pack(
            f"{e}{n_strips}I", *[len(s) for s in strips]
        )
        off_val, cnt_val = offs_at, cnts_at
    else:
        off_val, cnt_val = offsets[0], len(strips[0])
    ifd = struct.pack(f"{e}H", n_entries)
    ifd += entry(_WIDTH, 4, 1, width)
    ifd += entry(_HEIGHT, 4, 1, height)
    ifd += entry(_BITS, 3, 1, 8)
    ifd += entry(_COMPRESSION, 3, 1, 5 if lzw else (32773 if packbits else 1))
    ifd += entry(_PHOTOMETRIC, 3, 1, 1)  # BlackIsZero
    ifd += entry(_STRIP_OFFSETS, 4, n_strips, off_val)
    ifd += entry(_ROWS_PER_STRIP, 4, 1, rows_per_strip)
    ifd += entry(_STRIP_COUNTS, 4, n_strips, cnt_val)
    if predictor:  # tags stay ascending: 317 follows 279
        ifd += entry(_PREDICTOR, 3, 1, 2)
    ifd += struct.pack(f"{e}I", 0)  # next-IFD pointer: none
    header = (b"MM" if big_endian else b"II") + struct.pack(f"{e}HI", 42, 8)
    return header + ifd + extra + b"".join(strips)


def decode_tiff(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Walk header -> IFD -> strip arrays -> (packbits-)decode strips
    -> (width, height, pixels). Verifies the byte-order mark, the 42,
    bit depth 8, compression in {1, 32773}, and exact strip coverage."""
    bom = payload[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise ValueError(f"bad TIFF byte-order mark {bom!r}")
    magic, ifd_at = struct.unpack(f"{e}HI", payload[2:8])
    if magic != 42:
        raise ValueError(f"bad TIFF magic number {magic}")
    (n_entries,) = struct.unpack(f"{e}H", payload[ifd_at : ifd_at + 2])
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n_entries):
        at = ifd_at + 2 + i * 12
        tag, typ, count = struct.unpack(f"{e}HHI", payload[at : at + 8])
        (value,) = struct.unpack(f"{e}I", payload[at + 8 : at + 12])
        if typ == 3 and count == 1:  # SHORT packs into the value field
            value = struct.unpack(f"{e}H", payload[at + 8 : at + 10])[0]
        tags[tag] = (typ, count, value)
    for req in (_WIDTH, _HEIGHT, _BITS, _COMPRESSION, _STRIP_OFFSETS,
                _ROWS_PER_STRIP, _STRIP_COUNTS):
        if req not in tags:
            raise ValueError(f"missing required tag {req}")
    width, height = tags[_WIDTH][2], tags[_HEIGHT][2]
    if tags[_BITS][2] != 8:
        raise ValueError(f"bit depth {tags[_BITS][2]} unsupported")
    comp = tags[_COMPRESSION][2]
    if comp not in (1, 5, 32773):
        raise ValueError(f"compression {comp} unsupported")
    pred = tags[_PREDICTOR][2] if _PREDICTOR in tags else 1
    if pred not in (1, 2):
        raise ValueError(f"predictor {pred} unsupported")
    rps = tags[_ROWS_PER_STRIP][2]

    def array_of(tag: int) -> list[int]:
        typ, count, value = tags[tag]
        if count == 1:
            return [value]
        return list(
            struct.unpack(f"{e}{count}I", payload[value : value + 4 * count])
        )

    offsets, counts = array_of(_STRIP_OFFSETS), array_of(_STRIP_COUNTS)
    if len(offsets) != len(counts):
        raise ValueError("strip offset/count arity mismatch")
    raw = bytearray()
    for k, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(payload):
            raise ValueError(f"strip {k} overruns file")
        strip = payload[off : off + cnt]
        rows = min(rps, height - k * rps)
        if comp == 32773:
            strip = packbits_decode(strip, rows * width)
        elif comp == 5:
            strip = lzw_decode(strip, rows * width)
        elif len(strip) != rows * width:
            raise ValueError(f"strip {k} size != rows*width")
        if pred == 2:
            strip = _undiff_rows(strip, width)
        raw += strip
    if len(raw) != width * height:
        raise ValueError("strips do not cover the image exactly")
    return width, height, [
        list(raw[y * width : (y + 1) * width]) for y in range(height)
    ]
