"""Pure-Python GIF codec — the LZW rung of the compressed-codec tier
(after Huffman-coded JPEG and DEFLATE-backed PNG, this adds the third
classic compression family, implemented from the public GIF87a/89a
specification with no libraries at all — LZW included).

``decode_gif`` is a REAL decoder: header + logical screen descriptor,
global/local color tables, extension blocks skipped by their sub-block
structure (GIF89a graphic control etc.), the image descriptor, and the
LZW-compressed index stream: variable code width (min_code_size+1 up to
12 bits, LSB-first bit packing across 255-byte sub-blocks), clear-code
dictionary resets, end-of-information, and the KwKwK special case (a
code referencing the entry being defined). Both row orders are
supported: sequential and the 4-pass GIF interlace. Returns
``(width, height, rows)`` of (r, g, b) tuples resolved through the
active color table. Animated multi-image streams decode their FIRST
frame (the stats contract here); unknown block types raise
``ValueError`` naming the byte.

``encode_gif`` writes real GIFs with a REAL LZW compressor (greedy
longest-match dictionary, emitting a clear code whenever the table
fills — the classic strategy), optional interlacing, and an injected
GIF89a comment extension so decoders must really walk sub-blocks.
decode(encode(indices)) == indices exactly (LZW is lossless and both
ends are fixed here), so pixel oracles replay the generation formula
directly, like the PNG rung.

Reference analog: none (no multimodal tier in TinyMapreduce); brief's
multimodal-column requirement, same posture as jpegcodec/pngcodec.
"""

from __future__ import annotations

import struct
import sys

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

# 4-pass interlace: (start row, step) per pass, spec appendix E
INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]
MAX_CODE_WIDTH = 12


def _interlaced_row_order(h: int) -> list[int]:
    order = []
    for start, step in INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


class _LZWWriter:
    """LSB-first bit packer feeding 255-byte GIF sub-blocks."""

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.bytes = bytearray()

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
        out = bytearray()
        for i in range(0, len(self.bytes), 255):
            chunk = self.bytes[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
        return bytes(out)


def lzw_compress(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW: dictionary seeded with single indices + CLEAR +
    EOI, greedy longest match, code width grows when the next code
    would not fit, CLEAR emitted when the table reaches 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LZWWriter()

    def reset() -> tuple[dict[tuple[int, ...], int], int, int]:
        return (
            {(i,): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    w.put(clear, width)
    seq: tuple[int, ...] = ()
    for idx in indices:
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        w.put(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < MAX_CODE_WIDTH:
            width += 1
        elif next_code > (1 << MAX_CODE_WIDTH) - 1:
            w.put(clear, width)
            table, next_code, width = reset()
        seq = (idx,)
    if seq:
        w.put(table[seq], width)
    w.put(eoi, width)
    return w.finish()


class _LZWReader:
    """LSB-first bit reader over the concatenated sub-block payload."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def get(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def lzw_decompress(data: bytes, min_code_size: int, n_expected: int) -> list[int]:
    """Inverse of ``lzw_compress`` (and of every spec-conforming GIF
    writer): handles clear-code resets, width growth at table size
    2^width, and the KwKwK case."""
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _LZWReader(data)
    out: list[int] = []
    table: list[tuple[int, ...]] = []
    width = min_code_size + 1
    prev: tuple[int, ...] | None = None

    def reset_table() -> None:
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code_size + 1
        prev = None

    reset_table()
    while len(out) < n_expected:
        code = r.get(width)
        if code == clear:
            reset_table()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # KwKwK
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < MAX_CODE_WIDTH:
            width += 1
    if len(out) != n_expected:
        raise ValueError(f"decoded {len(out)} pixels, expected {n_expected}")
    return out


def encode_gif(
    width: int,
    height: int,
    indices: list[list[int]],
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
) -> bytes:
    """Write a GIF89a: logical screen + global color table (padded to a
    power of two), a comment extension (decoders must walk sub-blocks),
    one image (optionally interlaced) with LZW-compressed indices."""
    n = len(palette)
    bits = max(2, (n - 1).bit_length())
    table = list(palette) + [(0, 0, 0)] * ((1 << bits) - n)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    for rgb in table:
        out += bytes(rgb)
    # comment extension: two sub-blocks, then terminator
    out += b"\x21\xfe" + b"\x05hello" + b"\x03gif" + b"\x00"
    flags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, flags)
    rows = _interlaced_row_order(height) if interlace else list(range(height))
    flat = [v for y in rows for v in indices[y]]
    min_code_size = max(2, bits)
    out += bytes([min_code_size])
    out += lzw_compress(flat, min_code_size)
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif(payload: bytes):
    """Decode a GIF → (width, height, rows) of (r, g, b) tuples. See
    module docstring for the supported subset."""
    try:
        return _decode_gif(payload)
    except (IndexError, struct.error) as e:  # ran off the end mid-block
        raise ValueError(f"truncated GIF ({e})") from e


def _decode_gif(payload: bytes):
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    global_table: list[tuple[int, int, int]] | None = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        global_table = [
            (payload[pos + 3 * i], payload[pos + 3 * i + 1], payload[pos + 3 * i + 2])
            for i in range(size)
        ]
        pos += 3 * size
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("no image data before trailer")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block type {block:#x}")
        x0, y0, w, h, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        if (x0, y0) != (0, 0) or (w, h) != (sw, sh):
            raise ValueError("sub-rectangle frames unsupported (full frame only)")
        table = global_table
        if iflags & 0x80:
            size = 2 << (iflags & 0x07)
            table = [
                (payload[pos + 3 * i], payload[pos + 3 * i + 1], payload[pos + 3 * i + 2])
                for i in range(size)
            ]
            pos += 3 * size
        if table is None:
            raise ValueError("image without any color table")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        flat = lzw_decompress(bytes(data), min_code_size, w * h)
        rows_px = [[(0, 0, 0)] * w for _ in range(h)]
        order = (
            _interlaced_row_order(h) if iflags & 0x40 else list(range(h))
        )
        for k, y in enumerate(order):
            for x in range(w):
                idx = flat[k * w + x]
                if idx >= len(table):
                    raise ValueError(f"color index {idx} out of range")
                rows_px[y][x] = table[idx]
        return w, h, rows_px  # first frame is the contract
    raise ValueError("truncated GIF (no trailer)")
