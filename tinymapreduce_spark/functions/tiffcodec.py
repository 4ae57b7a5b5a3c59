"""TIFF 6.0 reader + writer (grayscale, strip-based) with PackBits —
the TAG-DIRECTORY container family (IFD: a counted list of 12-byte
(tag, type, count, value-or-offset) entries, little- or big-endian by
the byte-order mark) and the RLE compression family the codec tier
lacked (PackBits, TIFF 6.0 §9: control byte n in [0,127] = literal run
of n+1 bytes; n in [-127,-1] = the next byte repeated 1-n times; -128
is a no-op). GIF contributed LZW, functions/inflate.py LZ77+Huffman;
PackBits completes the classic taxonomy.

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
) -> bytes:
    """8-bit grayscale strip-based TIFF; ``pixels[y][x]``. Strips of
    ``rows_per_strip`` rows (so multi-strip assembly is exercised),
    optional PackBits, either byte order."""
    e = ">" if big_endian else "<"
    strips: list[bytes] = []
    for y0 in range(0, height, rows_per_strip):
        raw = b"".join(
            bytes(pixels[y]) for y in range(y0, min(y0 + rows_per_strip, height))
        )
        strips.append(packbits_encode(raw) if packbits else raw)
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
    n_entries = 8
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
    ifd += entry(_COMPRESSION, 3, 1, 32773 if packbits else 1)
    ifd += entry(_PHOTOMETRIC, 3, 1, 1)  # BlackIsZero
    ifd += entry(_STRIP_OFFSETS, 4, n_strips, off_val)
    ifd += entry(_ROWS_PER_STRIP, 4, 1, rows_per_strip)
    ifd += entry(_STRIP_COUNTS, 4, n_strips, cnt_val)
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
    if comp not in (1, 32773):
        raise ValueError(f"compression {comp} unsupported")
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
        elif len(strip) != rows * width:
            raise ValueError(f"strip {k} size != rows*width")
        raw += strip
    if len(raw) != width * height:
        raise ValueError("strips do not cover the image exactly")
    return width, height, [
        list(raw[y * width : (y + 1) * width]) for y in range(height)
    ]
