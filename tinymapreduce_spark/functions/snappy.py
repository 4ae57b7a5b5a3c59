"""From-scratch Snappy raw-block codec (compress + decompress) — the
LZ77-family format Avro's ``snappy`` codec wraps (Apache Avro 1.11 spec:
each compressed block is the raw Snappy stream followed by the 4-byte
big-endian CRC32 of the UNCOMPRESSED data; the length-prefixed "xerial"
framing some Kafka/Hadoop paths use is NOT part of the Avro container).

Format (google/snappy format_description.txt — public):
- preamble: uncompressed length as a little-endian base-128 varint;
- then a tag stream. Tag low 2 bits select the element type:
  - 00 literal: (len-1) in bits 2-7; values 60-63 mean the length is
    carried in the following 1-4 little-endian bytes (+1);
  - 01 copy: length 4-11 in bits 2-4, offset high 3 bits in bits 5-7 +
    one more offset byte (11-bit offset, 1-2047);
  - 10 copy: (len-1) in bits 2-7 (1-64), 2-byte little-endian offset;
  - 11 copy: (len-1) in bits 2-7, 4-byte little-endian offset.
- copies may overlap their output (offset < length replays runs), and
  a zero offset is invalid.

The compressor is deterministic (fixed hash table, greedy matching,
64 KiB fragments like the reference implementation, so offsets always
fit the 2-byte copy tag) and emits only literal + 2-byte-offset copy
elements — a strictly valid stream; the decompressor implements ALL tag
types incl. overlapping copies and raises ``ValueError`` naming the
defect for truncated varints, bad offsets, or length overruns (the
honest-boundary policy the other from-scratch codecs follow).

No snappy library exists in this container, so roundtrip + constructed
tag-stream vectors in tests/test_snappy.py pin the format (same posture
as the spec-from-scratch GIF/LZW and Avro rungs).

Reference analog: none (TinyMapreduce reads plain text); public spec:
google/snappy format_description.txt; Avro 1.11 "Required Codecs".
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

_FRAGMENT = 65536  # compress per 64 KiB fragment -> offsets fit 16 bits
_MIN_MATCH = 4
_HASH_BITS = 14


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated length varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: overlong length varint")


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    n = end - start
    while n > 0:
        take = min(n, 65536)  # 2-byte extended length covers any fragment
        if take <= 60:
            out.append((take - 1) << 2)
        elif take <= 256:
            out.append(60 << 2)
            out.append(take - 1)
        else:
            out.append(61 << 2)
            out += (take - 1).to_bytes(2, "little")
        out += data[start : start + take]
        start += take
        n -= take


def _emit_copy2(out: bytearray, offset: int, length: int) -> None:
    # 2-byte-offset copies, 64-byte chunks (the last chunk >= 4 by
    # construction: matches are >= _MIN_MATCH and we never leave a
    # sub-4 tail — see the chunking below)
    while length > 0:
        take = min(length, 64)
        if length - take in (1, 2, 3):
            take = length - 4  # keep a >= 4 tail so every tag is legal
        out.append(0x02 | ((take - 1) << 2))
        out += offset.to_bytes(2, "little")
        length -= take


def snappy_compress(data: bytes) -> bytes:
    """Deterministic greedy snappy: per-64 KiB fragment, a 16 K-entry
    hash table over 4-byte windows, greedy extension, literal + 2-byte
    copy tags only."""
    out = bytearray(_varint(len(data)))
    for frag_at in range(0, len(data), _FRAGMENT) or [0]:
        frag = data[frag_at : frag_at + _FRAGMENT]
        n = len(frag)
        table: dict[int, int] = {}
        i = 0
        lit_start = 0
        while i + _MIN_MATCH <= n:
            key = frag[i] | (frag[i + 1] << 8) | (frag[i + 2] << 16) | (frag[i + 3] << 24)
            h = (key * 0x1E35A7BD) & 0xFFFFFFFF
            h >>= 32 - _HASH_BITS
            j = table.get(h)
            table[h] = i
            if (
                j is not None
                and frag[j : j + _MIN_MATCH] == frag[i : i + _MIN_MATCH]
            ):
                ln = _MIN_MATCH
                while i + ln < n and frag[j + ln] == frag[i + ln]:
                    ln += 1
                _emit_literal(out, frag, lit_start, i)
                _emit_copy2(out, i - j, ln)
                i += ln
                lit_start = i
            else:
                i += 1
        _emit_literal(out, frag, lit_start, n)
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    """Full-format decoder: all four tag types, overlapping copies,
    strict length/offset validation."""
    expect, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59  # 1-4 following length bytes
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: literal overruns input")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 11-bit offset, length 4-11
            ln = 4 + ((tag >> 2) & 0x07)
            if pos >= n:
                raise ValueError("snappy: truncated copy-1 offset")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2 offset")
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4 offset")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError(f"snappy: bad copy offset {offset} at {len(out)}")
        start = len(out) - offset
        for k in range(ln):  # byte-wise: overlapping copies replay runs
            out.append(out[start + k])
    if len(out) != expect:
        raise ValueError(
            f"snappy: declared length {expect} != decoded {len(out)}"
        )
    return bytes(out)
