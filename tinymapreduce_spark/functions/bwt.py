"""Burrows-Wheeler transform family — the BLOCK-SORTING compression
family (Burrows & Wheeler 1994, the bzip2 lineage), completing the
classic taxonomy next to LZW (GIF), LZ77+Huffman (deflate), byte-LZ77
(snappy) and RLE (PackBits): a reversible permutation that groups
same-context characters, a move-to-front stage that turns locality
into small integers, and a zero-run-length stage (RUNA/RUNB bijective
counting, the bzip2 convention) that crushes the MTF zero runs.

``bwt_forward`` sorts rotations with a deterministic tie-break (the
rotation start index) so the transform is a pure function of the text
— which makes it replayable in SQL: the oracle rebuilds every rotation
with substr concatenation, sorts, and takes last characters. UTF-8
byte order equals code-point order, so DuckDB's binary collation and
Python's string comparison agree on any text.

``bwt_inverse`` is the standard LF-mapping walk (stable-rank
counting), no sentinel required — the primary index (rank of the
original string among the rotations) carries the anchoring.

Reference analog: none; public sources: Burrows & Wheeler, "A
Block-sorting Lossless Data Compression Algorithm" (DEC SRC-124,
1994); the RUNA/RUNB zero-run coding follows the bzip2 format's
public description.
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def bwt_forward(s: str) -> tuple[str, int]:
    """Sorted-rotations BWT of a string: returns (last column, primary
    index). Ties between equal rotations (periodic strings) break on
    the rotation start index, making the output deterministic and
    SQL-replayable."""
    n = len(s)
    if n == 0:
        return "", 0
    order = sorted(range(n), key=lambda i: (s[i:] + s[:i], i))
    last = "".join(s[i - 1] for i in order)
    return last, order.index(0)


def bwt_inverse(last: str, primary: int) -> str:
    """LF-mapping inversion: stable rank of each last-column character
    links row i to the row holding its predecessor."""
    n = len(last)
    if n == 0:
        return ""
    if not 0 <= primary < n:
        raise ValueError(f"primary index {primary} outside 0..{n - 1}")
    # first column = sorted last column; lf[i] = position of last[i]'s
    # occurrence in the first column (stable within equal characters)
    counts: dict[str, int] = {}
    for ch in last:
        counts[ch] = counts.get(ch, 0) + 1
    starts: dict[str, int] = {}
    at = 0
    for ch in sorted(counts):
        starts[ch] = at
        at += counts[ch]
    seen: dict[str, int] = {}
    lf = [0] * n
    for i, ch in enumerate(last):
        k = seen.get(ch, 0)
        seen[ch] = k + 1
        lf[i] = starts[ch] + k
    out = []
    row = primary
    for _ in range(n):
        # row holds some rotation; its LAST character precedes the
        # rotation's first — walking LF from the primary row emits the
        # original string back to front
        out.append(last[row])
        row = lf[row]
    return "".join(reversed(out))


def mtf_encode(s: str, alphabet: list[str]) -> list[int]:
    """Move-to-front over an explicit alphabet (sorted distinct chars
    of the document, the bzip2 convention of a per-block alphabet)."""
    table = list(alphabet)
    out = []
    for ch in s:
        i = table.index(ch)
        out.append(i)
        if i:
            table.pop(i)
            table.insert(0, ch)
    return out


def mtf_decode(codes: list[int], alphabet: list[str]) -> str:
    table = list(alphabet)
    out = []
    for i in codes:
        if not 0 <= i < len(table):
            raise ValueError(f"MTF index {i} outside the alphabet")
        ch = table[i]
        out.append(ch)
        if i:
            table.pop(i)
            table.insert(0, ch)
    return "".join(out)


# RUNA/RUNB zero-run coding (bzip2): a run of z zeros is written as the
# little-endian bijective-base-2 digits of z+1 minus its leading 1,
# using symbols RUNA=0 (digit 1) and RUNB=1 (digit 2); nonzero MTF
# symbols shift up by 1.
_RUNA, _RUNB = 0, 1


def rle0_encode(codes: list[int]) -> list[int]:
    out: list[int] = []
    z = 0
    for c in codes:
        if c == 0:
            z += 1
            continue
        if z:
            out.extend(_run_digits(z))
            z = 0
        out.append(c + 1)
    if z:
        out.extend(_run_digits(z))
    return out


def _run_digits(z: int) -> list[int]:
    digits = []
    while z > 0:
        z -= 1
        digits.append(_RUNA if z % 2 == 0 else _RUNB)
        z //= 2
    return digits


def rle0_decode(symbols: list[int]) -> list[int]:
    out: list[int] = []
    i, n = 0, len(symbols)
    while i < n:
        if symbols[i] in (_RUNA, _RUNB):
            z = 0
            place = 1
            while i < n and symbols[i] in (_RUNA, _RUNB):
                z += place * (1 if symbols[i] == _RUNA else 2)
                place *= 2
                i += 1
            out.extend([0] * z)
        else:
            out.append(symbols[i] - 1)
            i += 1
    return out
