"""Parquet encoding layer from the public format spec
(apache/parquet-format Encodings.md) — the two workhorse integer
encodings every Parquet file the engine reads is built on, implemented
from scratch so the storage format itself is a verifiable codec rung:

- RLE/bit-packing hybrid: ULEB128-prefixed sections, header
  ``run_len << 1`` for an RLE run (value stored little-endian in
  ``ceil(bw/8)`` bytes) and ``(groups << 1) | 1`` for bit-packed
  groups of 8 values (LSB-first packing). This encoder's POLICY is
  deterministic, 8-ALIGNED and oracle-friendly (the same discipline
  real writers keep — bit-packed counts are always whole groups of 8,
  so padding can only ever sit at the very end of the stream): values
  are consumed in groups of 8; maximal runs of consecutive groups
  that are each uniform in the SAME value become one RLE run of 8k,
  all other full groups accumulate into bit-packed sections (capped
  at 63 groups per section so headers stay one byte), and the final
  partial group is zero-padded and bit-packed.
- DELTA_BINARY_PACKED: block 128 = 4 miniblocks x 32; header =
  ULEB128(block), ULEB128(miniblocks), ULEB128(count),
  zigzag-ULEB128(first value); per block zigzag-ULEB128(min delta) +
  one bit-width byte per miniblock + the packed deltas (LSB-first).

Byte lengths under these policies are closed-form functions of the
value sequence (runs decomposition / per-miniblock bit widths), so the
SQL oracle re-derives the encoded SIZE as well as the roundtrip.

Reference analog: none; public spec: Apache Parquet format
Encodings.md (RLE hybrid, DELTA_BINARY_PACKED).
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def uleb128(n: int) -> bytes:
    if n < 0:
        raise ValueError("uleb128 takes non-negative ints")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_uleb128(data: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if pos >= len(data):
            raise ValueError("ULEB128 truncated")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def unzigzag(u: int) -> int:
    return (u >> 1) if u % 2 == 0 else -((u + 1) >> 1)


MIN_RLE_RUN = 8  # encoder policy: equal runs >= 8 become RLE runs


def rle_hybrid_encode(values: list[int], bit_width: int) -> bytes:
    """Parquet RLE/bit-packing hybrid under the documented policy."""
    if bit_width < 1 or bit_width > 32:
        raise ValueError("bit width outside 1..32")
    top = 1 << bit_width
    for v in values:
        if not 0 <= v < top:
            raise ValueError(f"value {v} outside {bit_width}-bit range")
    out = bytearray()
    vbytes = (bit_width + 7) // 8

    def emit_bitpacked(vs: list[int]) -> None:
        # whole groups of 8 real values; only the caller's final
        # partial group arrives padded
        while vs:
            chunk = vs[: 63 * 8]  # keep headers single-byte
            vs = vs[63 * 8 :]
            groups = len(chunk) // 8
            out.append((groups << 1) | 1)
            acc = nbits = 0
            for v in chunk:  # LSB-first packing
                acc |= v << nbits
                nbits += bit_width
                while nbits >= 8:
                    out.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8
            if nbits:
                out.append(acc & 0xFF)

    n = len(values)
    n_groups = n // 8
    pending: list[int] = []
    g = 0
    while g < n_groups:
        grp = values[g * 8 : g * 8 + 8]
        if all(v == grp[0] for v in grp):
            k = 1
            while g + k < n_groups:
                nxt = values[(g + k) * 8 : (g + k) * 8 + 8]
                if all(v == grp[0] for v in nxt):
                    k += 1
                else:
                    break
            emit_bitpacked(pending)
            pending = []
            out += uleb128((8 * k) << 1)
            out += grp[0].to_bytes(vbytes, "little")
            g += k
        else:
            pending.extend(grp)
            g += 1
    tail = values[n_groups * 8 :]
    if tail:
        pending.extend(tail + [0] * (8 - len(tail)))
    emit_bitpacked(pending)
    return bytes(out)


def rle_hybrid_decode(data: bytes, bit_width: int, count: int) -> list[int]:
    out: list[int] = []
    pos = 0
    mask = (1 << bit_width) - 1
    vbytes = (bit_width + 7) // 8
    while len(out) < count:
        header, pos = read_uleb128(data, pos)
        if header & 1:  # bit-packed groups
            groups = header >> 1
            nbytes = groups * bit_width  # groups of 8: 8*bw bits = bw bytes
            chunk = data[pos : pos + nbytes]
            if len(chunk) < nbytes:
                raise ValueError("bit-packed section truncated")
            pos += nbytes
            acc = int.from_bytes(chunk, "little")
            for k in range(groups * 8):
                out.append((acc >> (k * bit_width)) & mask)
        else:
            run = header >> 1
            if pos + vbytes > len(data):
                raise ValueError("RLE run value truncated")
            v = int.from_bytes(data[pos : pos + vbytes], "little")
            pos += vbytes
            out.extend([v] * run)
    if len(out) > count + 7:
        # Well-formed streams overshoot only by bit-packed padding to a
        # multiple of 8; anything more means a malformed group/run header.
        raise ValueError("stream overshoots declared count")
    return out[:count]  # bit-packed padding may overshoot by <8; trim


DELTA_BLOCK, DELTA_MINIBLOCKS = 128, 4  # 32 values per miniblock


def delta_binary_packed_encode(values: list[int]) -> bytes:
    """DELTA_BINARY_PACKED (spec layout, block 128 / 4 miniblocks)."""
    out = bytearray()
    out += uleb128(DELTA_BLOCK)
    out += uleb128(DELTA_MINIBLOCKS)
    out += uleb128(len(values))
    if not values:
        return bytes(out)
    out += uleb128(zigzag(values[0]))
    deltas = [b - a for a, b in zip(values, values[1:])]
    per_mb = DELTA_BLOCK // DELTA_MINIBLOCKS
    for b0 in range(0, len(deltas), DELTA_BLOCK):
        block = deltas[b0 : b0 + DELTA_BLOCK]
        mind = min(block)
        out += uleb128(zigzag(mind))
        adj = [d - mind for d in block] + [0] * (DELTA_BLOCK - len(block))
        widths = []
        for m in range(DELTA_MINIBLOCKS):
            mb = adj[m * per_mb : (m + 1) * per_mb]
            widths.append(max(v.bit_length() for v in mb) if any(mb) else 0)
        # spec: only miniblocks containing REAL deltas are stored
        used = (len(block) + per_mb - 1) // per_mb
        out += bytes(widths[:DELTA_MINIBLOCKS])
        for m in range(used):
            bw = widths[m]
            if bw == 0:
                continue
            acc = nbits = 0
            for v in adj[m * per_mb : (m + 1) * per_mb]:
                acc |= v << nbits
                nbits += bw
                while nbits >= 8:
                    out.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8
            if nbits:
                out.append(acc & 0xFF)
    return bytes(out)


def delta_binary_packed_decode(data: bytes) -> list[int]:
    pos = 0
    block, pos = read_uleb128(data, pos)
    nmb, pos = read_uleb128(data, pos)
    if block != DELTA_BLOCK or nmb != DELTA_MINIBLOCKS:
        raise ValueError("unsupported delta block geometry")
    count, pos = read_uleb128(data, pos)
    if count == 0:
        return []
    u, pos = read_uleb128(data, pos)
    first = unzigzag(u)
    out = [first]
    per_mb = block // nmb
    remaining = count - 1
    while remaining > 0:
        u, pos = read_uleb128(data, pos)
        mind = unzigzag(u)
        widths = list(data[pos : pos + nmb])
        if len(widths) < nmb:
            raise ValueError("miniblock width list truncated")
        pos += nmb
        in_block = min(remaining, block)
        used = (in_block + per_mb - 1) // per_mb
        deltas: list[int] = []
        for m in range(used):
            bw = widths[m]
            if bw == 0:
                deltas.extend([0] * per_mb)
                continue
            nbytes = per_mb * bw // 8
            chunk = data[pos : pos + nbytes]
            if len(chunk) < nbytes:
                raise ValueError("miniblock data truncated")
            pos += nbytes
            acc = int.from_bytes(chunk, "little")
            mask = (1 << bw) - 1
            deltas.extend((acc >> (k * bw)) & mask for k in range(per_mb))
        for d in deltas[:in_block]:
            out.append(out[-1] + mind + d)
        remaining -= in_block
    return out


# --- LZ4 raw block format (round 7) -----------------------------------------
# Parquet's LZ4_RAW codec (the lz4 block format, public spec at
# lz4.github.io/lz4/lz4_Block_format.html): sequences of
# [token][literals][offset][match], token = (lit_len:4 | match_len:4)
# with 255-saturated length extension bytes, 16-bit little-endian
# offsets, minimum match 4, and the end-of-block rules (last sequence
# is literals-only; the final 5 bytes are always literals; the last
# match must start at least 12 bytes before the end).


def lz4_compress(data: bytes) -> bytes:
    """Greedy hash-table LZ4 block compressor honoring the spec's
    end-of-block margins."""
    n = len(data)
    out = bytearray()
    if n == 0:
        return b"\x00"  # one empty-literals token

    def emit_sequence(lit: bytes, match_len: int, offset: int) -> None:
        nonlocal out
        ml = match_len - 4 if match_len else 0
        tok_lit = min(len(lit), 15)
        tok_ml = min(ml, 15) if match_len else 0
        out.append((tok_lit << 4) | tok_ml)
        rest = len(lit) - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255
        out += lit
        if match_len:
            out += offset.to_bytes(2, "little")
            rest = ml - 15
            while rest >= 0:
                out.append(min(rest, 255))
                if rest < 255:
                    break
                rest -= 255

    heads: dict[bytes, int] = {}
    i = lit_start = 0
    # matches may not cover the final 12 bytes (spec end-of-block rule)
    limit = n - 12
    while i < limit:
        key = data[i : i + 4]
        j = heads.get(key)
        heads[key] = i
        if j is not None and i - j <= 0xFFFF and data[j : j + 4] == key:
            ln = 4
            # matches must leave the last 5 bytes as literals
            maxl = n - 5 - i
            while ln < maxl and data[j + ln] == data[i + ln]:
                ln += 1
            if ln >= 4:
                emit_sequence(data[lit_start:i], ln, i - j)
                i += ln
                lit_start = i
                continue
        i += 1
    emit_sequence(data[lit_start:], 0, 0)  # final literals-only sequence
    return bytes(out)


def lz4_decompress(data: bytes, expected: int) -> bytes:
    """Full block decoder: token walk, length extensions, overlapping
    copies; defects raise ValueError naming them."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("LZ4 literal length truncated")
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("LZ4 literals overrun block")
        out += data[pos : pos + lit]
        pos += lit
        if pos >= n:
            break  # last sequence: literals only
        offset = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError(f"LZ4 offset {offset} out of window")
        ml = token & 0xF
        if ml == 15:
            while True:
                if pos >= n:
                    raise ValueError("LZ4 match length truncated")
                b = data[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        start = len(out) - offset
        for k in range(ml):  # overlapping copies are the RLE idiom
            out.append(out[start + k])
    if len(out) != expected:
        raise ValueError(f"LZ4 block decoded {len(out)} != {expected}")
    return bytes(out)
