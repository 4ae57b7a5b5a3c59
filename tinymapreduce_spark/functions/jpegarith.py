"""Arithmetic-coded JPEG (SOF9, sequential DCT) — the QM coder of
T.81 Annex D plus the Annex F statistics model for DC differences and
AC coefficients, implemented from the public spec's flowcharts
(Figures D.2-D.19 for the coder, F.19-F.24 for the model; the
probability estimation state machine is Table D.3 transcribed below,
with the extra non-adapting ~0.5 "fixed" state the AC sign decision
uses per F.1.4.4.1.2).

Coder conventions (D.1): 16-bit A interval register normalized into
[0x8000, 0x10000), C code register with 3 spacer bits (output byte at
bits 19-26), byte stuffing 0xFF -> 0xFF 0x00 on output, carry
resolution by 0xFF stacking (stacked bytes become 0x00 when a carry
propagates), trailing-zero suppression at flush, and zero-padding
after the terminating marker on decode (hitting a marker inside the
entropy segment is LEGAL in arithmetic coding, unlike Huffman).

Statistics model (F.1.4.4): DC uses 49 bins per conditioning table —
contexts 0..19 indexed by the previous diff's five-way classification
(zero/small+/small-/large+/large- from the L/U conditioning bounds,
defaults 0/1) x (S0, SS, SP, SN), the shared magnitude-category chain
X1.. at bin 20, and magnitude bits at Xn+14. AC uses 245 bins: an
(SE, S0, X1) triple per coefficient index k, plus two shared X2..X15 /
M2..M15 areas at 189/217 split by the Kx conditioning bound (default
5). The DAC segment (0xCC) carries the bounds; defaults are written
explicitly so the parse path is exercised.

Scope: single-component 8-bit sequential (SOF9) and progressive
(SOF10, Annex G.2 — decoded by decode_jpeg_arith's SOF10 branch, with
encode_jpeg_arith_progressive as the test-vector producer) frames;
multi-component interleave, restart intervals and lossless (SOF11)
arithmetic variants raise ValueError naming the gap — the
honest-boundary policy of the Huffman codec.

Reference analog: none; public spec: ITU-T T.81 (1992) Annexes D/F.
"""

from __future__ import annotations

import struct
import sys

from pyspark import cloudpickle

from tinymapreduce_spark.functions.jpegcodec import ZIGZAG, idct_block

cloudpickle.register_pickle_by_value(sys.modules[__name__])

# Table D.3 — (Qe, NMPS, NLPS, SWITCH); index 113 is the non-adapting
# ~0.5 state (NMPS = NLPS = 113) used for AC sign decisions.
QE_TABLE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # fixed ~0.5 state (AC sign)
]


class ArithEncoder:
    """QM encoder (T.81 D.1): bins are [state_index, mps] two-lists."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # -1 = no byte buffered yet
        self.sc = 0  # stacked 0xFF bytes awaiting carry resolution
        self.zc = 0  # deferred 0x00 bytes (trailing-zero suppression)
        self.out = bytearray()

    def _emit(self, b: int) -> None:
        self.out.append(b)

    def _flush_zc(self) -> None:
        while self.zc:
            self._emit(0x00)
            self.zc -= 1

    def encode(self, st: list, val: int) -> None:
        qe, nmps, nlps, switch = QE_TABLE[st[0]]
        self.a -= qe
        if val != st[1]:
            # LPS path (D.1.5, Figure D.7) with conditional exchange
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if switch:
                st[1] ^= 1
            st[0] = nlps
        else:
            # MPS path (Figure D.6)
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[0] = nmps
        # RENORME + BYTEOUT (Figures D.8/D.9)
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a >= 0x8000:
                break

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: propagate into the buffered byte; stacked 0xFF
            # bytes become 0x00 (D.1.8.3)
            if self.buffer >= 0:
                self._flush_zc()
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)  # stuffing
            self.zc += self.sc
            self.sc = 0
            # the 3 spacer bits guarantee t & 0xFF != 0xFF here
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # stack: a later carry may still bump it
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zc()
                self._emit(self.buffer)
            if self.sc:
                self._flush_zc()
                while self.sc:
                    self._emit(0xFF)
                    self._emit(0x00)
                    self.sc -= 1
            self.buffer = t
        self.c &= 0x7FFFF

    def flush(self) -> bytes:
        """D.1.8/D.1.9: pick the in-interval code value with the most
        trailing zeros, discharge the register, suppress trailing
        zero bytes."""
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # final carry
            if self.buffer >= 0:
                self._flush_zc()
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zc()
                self._emit(self.buffer)
            if self.sc:
                self._flush_zc()
                while self.sc:
                    self._emit(0xFF)
                    self._emit(0x00)
                    self.sc -= 1
        # final bytes only if nonzero (trailing zeros are implicit)
        if self.c & 0x7FFF800:
            self._flush_zc()
            b = (self.c >> 19) & 0xFF
            self._emit(b)
            if b == 0xFF:
                self._emit(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self._emit(b)
                if b == 0xFF:
                    self._emit(0x00)
        return bytes(self.out)


class ArithDecoder:
    """QM decoder (T.81 D.2), C-register formulation: ``ct`` counts the
    not-yet-consumed low bits of ``c``; comparisons align A by
    ``a << ct``. Zero bytes are fed forever once the terminating
    marker is reached (D.2.7)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.c = 0
        self.a = 0
        self.ct = -16  # forces the two initial byte loads
        self.at_marker = False

    def _next_byte(self) -> int:
        if self.at_marker or self.pos >= len(self.data):
            return 0
        b = self.data[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
        if nxt == 0x00:
            self.pos += 2  # stuffed data byte
            return 0xFF
        self.at_marker = True  # marker: zero-pad from here on
        return 0

    def decode(self, st: list) -> int:
        # renormalization + byte feed (D.2.6)
        while self.a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = ((self.c << 8) | self._next_byte()) & 0xFFFFFFFF
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        self.a = 0x8000  # two init bytes in: A = 0x10000 after shift
            self.a <<= 1
        qe, nmps, nlps, switch = QE_TABLE[st[0]]
        self.a -= qe
        aligned = self.a << self.ct
        if self.c >= aligned:
            self.c -= aligned
            # LPS exchange (Figure D.18)
            if self.a < qe:
                d = st[1]
                st[0] = nmps
            else:
                d = st[1] ^ 1
                if switch:
                    st[1] ^= 1
                st[0] = nlps
            self.a = qe
        else:
            if self.a >= 0x8000:
                return st[1]
            # MPS exchange (Figure D.17)
            if self.a < qe:
                d = st[1] ^ 1
                if switch:
                    st[1] ^= 1
                st[0] = nlps
            else:
                d = st[1]
                st[0] = nmps
        return d


# --------------------------------------------------------------------------
# Annex F statistics model (sequential DCT)
# --------------------------------------------------------------------------

_DC_BINS = 49   # 5 classes x (S0,SS,SP,SN) + X1..X15 at 20 + M at +14
_AC_BINS = 245  # 63 x (SE,S0,X1) + two X2../M2.. areas at 189/217
_DEFAULT_L, _DEFAULT_U, _DEFAULT_KX = 0, 1, 5


def _new_bins(n: int) -> list:
    return [[0, 0] for _ in range(n)]


class _DCState:
    def __init__(self) -> None:
        self.context = 0  # five-way classification of the previous diff
        self.prev = 0  # DC predictor


def _encode_dc(enc, bins, st8, diff, low, up) -> None:
    """F.1.4.1 / Figures F.19-F.24 mirrored for encoding."""
    base = st8.context
    if diff == 0:
        enc.encode(bins[base], 0)
        st8.context = 0
        return
    enc.encode(bins[base], 1)
    sign = 1 if diff < 0 else 0
    enc.encode(bins[base + 1], sign)
    v = abs(diff) - 1  # Sz
    st2 = bins[base + 2 + sign]
    if v == 0:
        enc.encode(st2, 0)
        m = 0
    else:
        enc.encode(st2, 1)
        m = 1
        x = 20
        while v >= (m << 1):
            enc.encode(bins[x], 1)
            m <<= 1
            x += 1
        enc.encode(bins[x], 0)
        mm = m >> 1
        while mm:
            enc.encode(bins[x + 14], 1 if v & mm else 0)
            mm >>= 1
    # F.1.4.4.1.2: conditioning category for the NEXT block
    if m < (1 << low) >> 1:
        st8.context = 0
    elif m > (1 << up) >> 1:
        st8.context = 12 + sign * 4
    else:
        st8.context = 4 + sign * 4


def _decode_dc(dec, bins, st8, low, up) -> int:
    base = st8.context
    if dec.decode(bins[base]) == 0:
        st8.context = 0
        return 0
    sign = dec.decode(bins[base + 1])
    m = dec.decode(bins[base + 2 + sign])
    if m != 0:
        x = 20
        while dec.decode(bins[x]):
            m <<= 1
            if m == 0x8000:
                raise ValueError("corrupt arithmetic DC magnitude")
            x += 1
    else:
        x = None  # no magnitude bits follow when m == 0; fail loudly if used
    if m < (1 << low) >> 1:
        st8.context = 0
    elif m > (1 << up) >> 1:
        st8.context = 12 + sign * 4
    else:
        st8.context = 4 + sign * 4
    v = m
    mm = m >> 1
    while mm:
        if dec.decode(bins[x + 14]):
            v |= mm
        mm >>= 1
    v += 1
    return -v if sign else v


def _encode_ac(enc, bins, fixed, zz, kx) -> None:
    """F.1.4.2 mirrored for encoding: per-k (SE, S0, X1) triples,
    shared magnitude areas split at Kx."""
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if k > last_nz:
            enc.encode(bins[st], 1)  # EOB
            return
        enc.encode(bins[st], 0)
        while zz[k] == 0:
            enc.encode(bins[st + 1], 0)
            k += 1
            st += 3
        enc.encode(bins[st + 1], 1)
        val = zz[k]
        sign = 1 if val < 0 else 0
        enc.encode(fixed, sign)  # AC sign: fixed ~0.5 state
        v = abs(val) - 1
        st2 = bins[st + 2]
        if v == 0:
            enc.encode(st2, 0)
        else:
            enc.encode(st2, 1)  # v >= 1
            if v == 1:
                enc.encode(st2, 0)
                x, m = None, 1
            else:
                enc.encode(st2, 1)
                m = 2
                x = 189 if k <= kx else 217
                while v >= (m << 1):
                    enc.encode(bins[x], 1)
                    m <<= 1
                    x += 1
                enc.encode(bins[x], 0)
            mm = m >> 1
            while mm:
                enc.encode(bins[x + 14], 1 if v & mm else 0)
                mm >>= 1
        k += 1


def _decode_ac(dec, bins, fixed, kx) -> list[int]:
    zz = [0] * 64
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if dec.decode(bins[st]):
            break  # EOB
        while dec.decode(bins[st + 1]) == 0:
            k += 1
            st += 3
            if k > 63:
                raise ValueError("corrupt arithmetic AC run")
        sign = dec.decode(fixed)
        st2 = bins[st + 2]
        m = dec.decode(st2)
        x = st + 2  # only consulted when magnitude bits exist (m >= 2)
        if m != 0:
            if dec.decode(st2):
                m <<= 1
                x = 189 if k <= kx else 217
                while dec.decode(bins[x]):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("corrupt arithmetic AC magnitude")
                    x += 1
        v = m
        mm = m >> 1
        while mm:
            if dec.decode(bins[x + 14]):
                v |= mm
            mm >>= 1
        v += 1
        zz[k] = -v if sign else v
        k += 1
    return zz


# --------------------------------------------------------------------------
# container: SOI / DQT / DAC / SOF9 / SOS / entropy / EOI
# --------------------------------------------------------------------------


def encode_jpeg_arith(
    width: int,
    height: int,
    qtable: list[int],
    blocks: list[list[list[int]]],
    kx: int = _DEFAULT_KX,
) -> bytes:
    """Single-component 8-bit arithmetic-coded sequential JPEG from
    QUANTIZED coefficient blocks (raster order over the ceil grid).
    Writes the DAC segment explicitly (DC bounds L/U and AC Kx) so the
    conditioning parse path is exercised. Lossless over the
    coefficients, so IDCT-replay oracles carry over unchanged."""
    bw, bh = (width + 7) // 8, (height + 7) // 8
    if len(blocks) != bw * bh:
        raise ValueError("block count does not cover the image grid")
    out = bytearray()
    out += b"\xff\xd8"
    zz_q = bytes(qtable[r * 8 + c] for (r, c) in ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    # DAC: DC table 0 (Tc=0) conditioning (U<<4)|L, AC table 0 (Tc=1) Kx
    out += b"\xff\xcc" + struct.pack(">H", 6)
    out += bytes([0x00, (_DEFAULT_U << 4) | _DEFAULT_L, 0x10, kx])
    out += b"\xff\xc9" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
    out += bytes([0, 63, 0])  # Ss=0 Se=63 Ah=0 Al=0 (sequential)
    enc = ArithEncoder()
    dc_bins, ac_bins = _new_bins(_DC_BINS), _new_bins(_AC_BINS)
    fixed = [113, 0]
    dc = _DCState()
    for blk in blocks:
        zz = [blk[r][c] for (r, c) in ZIGZAG]
        diff = zz[0] - dc.prev
        dc.prev = zz[0]
        _encode_dc(enc, dc_bins, dc, diff, _DEFAULT_L, _DEFAULT_U)
        _encode_ac(enc, ac_bins, fixed, zz, kx)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_arith(payload: bytes):
    """Decode a single-component arithmetic sequential JPEG ->
    (width, height, pixel rows). Walks DQT/DAC/SOF9/SOS, runs the QM
    decoder through the Annex F model, then dequant + the shared
    integer IDCT. Unsupported arithmetic variants raise ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("missing SOI")
    pos = 2
    qtable: list[int] | None = None
    low, up, kx = _DEFAULT_L, _DEFAULT_U, _DEFAULT_KX
    dims = None
    progressive = False
    coefs: list[list[int]] | None = None
    dc_state: _DCState | None = None
    dc_bins = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            if progressive and coefs is not None:
                return _render_arith(dims, qtable, coefs)
            raise ValueError("EOI before scan data")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:
            if body[0] != 0x00:
                raise ValueError("only 8-bit DQT table 0 supported here")
            qtable = [0] * 64
            for k, (r, c) in enumerate(ZIGZAG):
                qtable[r * 8 + c] = body[1 + k]
        elif marker == 0xCC:  # DAC conditioning
            at = 0
            while at < len(body):
                tc_tb, cs = body[at], body[at + 1]
                if tc_tb >> 4 == 0:
                    low, up = cs & 0x0F, cs >> 4
                    if not 0 <= low <= up <= 15:
                        raise ValueError("bad DC conditioning bounds")
                else:
                    kx = cs
                    if not 1 <= kx <= 63:
                        raise ValueError("bad AC conditioning Kx")
                at += 2
        elif marker in (0xC9, 0xCA):  # SOF9 sequential / SOF10 progressive
            precision, h, w, nc = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError("arithmetic decode supports 8-bit only")
            if nc != 1:
                raise ValueError("multi-component arithmetic unsupported")
            dims = (w, h)
            progressive = marker == 0xCA
            if progressive:
                bw, bh = (w + 7) // 8, (h + 7) // 8
                coefs = [[0] * 64 for _ in range(bw * bh)]
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            raise ValueError("not an arithmetic-coded (SOF9/SOF10) stream")
        elif marker == 0xCB:
            raise ValueError("lossless arithmetic unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported in arithmetic")
        elif marker == 0xDA:
            if dims is None or qtable is None:
                raise ValueError("SOS before SOF/DQT")
            if progressive:
                ns = body[0]
                if ns != 1:
                    raise ValueError("multi-component scan unsupported")
                ss = body[1 + 2 * ns]
                se = body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                dec = ArithDecoder(payload, pos + seglen)
                fixed = [113, 0]
                if ss == 0 and ah == 0:  # DC first
                    dc_bins = _new_bins(_DC_BINS)
                    dc_state = _DCState()
                    for zz in coefs:
                        diff = _decode_dc(dec, dc_bins, dc_state, low, up)
                        dc_state.prev += diff
                        zz[0] = dc_state.prev << al
                elif ss == 0:  # DC refinement
                    p1 = 1 << al
                    for zz in coefs:
                        if dec.decode(fixed):
                            zz[0] |= p1
                elif ah == 0:  # AC first
                    ac_bins = _new_bins(_AC_BINS)
                    for zz in coefs:
                        _dec_ac_first(dec, ac_bins, fixed, zz, ss, se, al, kx)
                else:  # AC refinement
                    ac_bins = _new_bins(_AC_BINS)
                    for zz in coefs:
                        _dec_ac_refine(dec, ac_bins, fixed, zz, ss, se, al)
                pos = _skip_to_marker(payload, dec.pos)
                continue
            w, h = dims
            dec = ArithDecoder(payload, pos + seglen)
            dc_bins, ac_bins = _new_bins(_DC_BINS), _new_bins(_AC_BINS)
            fixed = [113, 0]
            dc = _DCState()
            bw, bh = (w + 7) // 8, (h + 7) // 8
            plane = [[0] * (bw * 8) for _ in range(bh * 8)]
            for bi in range(bw * bh):
                diff = _decode_dc(dec, dc_bins, dc, low, up)
                dc.prev += diff
                zz = _decode_ac(dec, ac_bins, fixed, kx)
                zz[0] = dc.prev
                coef = [[0] * 8 for _ in range(8)]
                for k, (r, c) in enumerate(ZIGZAG):
                    if zz[k]:
                        coef[r][c] = zz[k] * qtable[r * 8 + c]
                px = idct_block(coef)
                by, bx = divmod(bi, bw)
                for y in range(8):
                    row = plane[by * 8 + y]
                    for x in range(8):
                        row[bx * 8 + x] = px[y][x]
            return w, h, [row[:w] for row in plane[:h]]
        pos += seglen
    raise ValueError("no scan found")


# --------------------------------------------------------------------------
# progressive (SOF10): Annex G.2's arithmetic scan types
# --------------------------------------------------------------------------
# Scan script matches the Huffman progressive writer's (T.81
# G.1.1.1.1): DC first at Al=1, DC refinement to Al=0, AC bands 1..5
# and 6..63 at Al=1, then a full-band AC refinement. Per-scan rules:
# DC first codes differences of the arithmetic-shifted values through
# the same conditioned DC model; DC refinement is ONE FIXED-BIN bit
# per block; AC first is the sequential AC model over point-shifted
# magnitudes; AC refinement codes correction bits (per-k bin +2) for
# previously-nonzero coefficients, significance (bin +1) + fixed-bin
# sign for newly-nonzero ones, and allows EOB decisions only past the
# last previously-nonzero index. Statistics bins re-initialize at
# every scan. Bin layout follows the Annex G flowchart structure as
# reproduced in this module; no external arithmetic-JPEG decoder
# exists in this container, so the pinned evidence is the oracle's
# coefficient-level replay plus the codec's own cross-scan
# consistency (progressive output must equal sequential output for
# identical coefficients, asserted in tests).

_PROG_SCANS = [  # (ss, se, ah, al)
    (0, 0, 0, 1),
    (0, 0, 1, 0),
    (1, 5, 0, 1),
    (6, 63, 0, 1),
    (1, 63, 1, 0),
]


def _pshift(v: int, al: int) -> int:
    """AC point transform: magnitude toward zero, sign kept."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _enc_ac_first(enc, bins, fixed, zz, ss, se, al, kx) -> None:
    shifted = [0] * 64
    for k in range(ss, se + 1):
        shifted[k] = _pshift(zz[k], al)
    last_nz = 0
    for k in range(se, ss - 1, -1):
        if shifted[k]:
            last_nz = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > last_nz:
            enc.encode(bins[st], 1)  # EOB
            return
        enc.encode(bins[st], 0)
        while shifted[k] == 0:
            enc.encode(bins[st + 1], 0)
            k += 1
            st += 3
        enc.encode(bins[st + 1], 1)
        val = shifted[k]
        sign = 1 if val < 0 else 0
        enc.encode(fixed, sign)
        v = abs(val) - 1
        st2 = bins[st + 2]
        if v == 0:
            enc.encode(st2, 0)
        else:
            enc.encode(st2, 1)
            if v == 1:
                enc.encode(st2, 0)
                x, m = None, 1
            else:
                enc.encode(st2, 1)
                m = 2
                x = 189 if k <= kx else 217
                while v >= (m << 1):
                    enc.encode(bins[x], 1)
                    m <<= 1
                    x += 1
                enc.encode(bins[x], 0)
            mm = m >> 1
            while mm:
                enc.encode(bins[x + 14], 1 if v & mm else 0)
                mm >>= 1
        k += 1


def _dec_ac_first(dec, bins, fixed, zz, ss, se, al, kx) -> None:
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(bins[st]):
            return  # EOB
        while dec.decode(bins[st + 1]) == 0:
            k += 1
            st += 3
            if k > se:
                raise ValueError("corrupt progressive AC run")
        sign = dec.decode(fixed)
        st2 = bins[st + 2]
        m = dec.decode(st2)
        x = st + 2
        if m != 0:
            if dec.decode(st2):
                m <<= 1
                x = 189 if k <= kx else 217
                while dec.decode(bins[x]):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("corrupt progressive AC magnitude")
                    x += 1
        v = m
        mm = m >> 1
        while mm:
            if dec.decode(bins[x + 14]):
                v |= mm
            mm >>= 1
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _enc_ac_refine(enc, bins, fixed, zz, ss, se, ah, al) -> None:
    prev = [_pshift(zz[k], ah) for k in range(64)]
    cur = [_pshift(zz[k], al) for k in range(64)]
    kex = 0
    for k in range(se, ss - 1, -1):
        if prev[k]:
            kex = k
            break
    ken = 0
    for k in range(se, ss - 1, -1):
        if cur[k]:
            ken = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            eob = k > ken
            enc.encode(bins[st], 1 if eob else 0)
            if eob:
                return
        while True:
            if prev[k]:
                bit = (abs(zz[k]) >> al) & 1
                enc.encode(bins[st + 2], bit)
                break
            if cur[k]:
                enc.encode(bins[st + 1], 1)
                enc.encode(fixed, 1 if cur[k] < 0 else 0)
                break
            enc.encode(bins[st + 1], 0)
            st += 3
            k += 1
        k += 1


def _dec_ac_refine(dec, bins, fixed, zz, ss, se, al) -> None:
    p1 = 1 << al
    m1 = -p1
    kex = 0
    for k in range(se, ss - 1, -1):
        if zz[k]:
            kex = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(bins[st]):
                return  # EOB
        while True:
            if zz[k]:
                if dec.decode(bins[st + 2]):
                    zz[k] += m1 if zz[k] < 0 else p1
                break
            if dec.decode(bins[st + 1]):
                sign = dec.decode(fixed)
                zz[k] = m1 if sign else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("corrupt AC refinement run")
        k += 1


def encode_jpeg_arith_progressive(
    width: int,
    height: int,
    qtable: list[int],
    blocks: list[list[list[int]]],
    kx: int = _DEFAULT_KX,
) -> bytes:
    """Single-component 8-bit PROGRESSIVE arithmetic JPEG (SOF10) with
    the classic five-scan script. Lossless over the coefficients, so
    the sequential oracle replay carries over unchanged."""
    bw, bh = (width + 7) // 8, (height + 7) // 8
    if len(blocks) != bw * bh:
        raise ValueError("block count does not cover the image grid")
    zz_blocks = [
        [blk[r][c] for (r, c) in ZIGZAG] for blk in blocks
    ]
    out = bytearray()
    out += b"\xff\xd8"
    zz_q = bytes(qtable[r * 8 + c] for (r, c) in ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    out += b"\xff\xcc" + struct.pack(">H", 6)
    out += bytes([0x00, (_DEFAULT_U << 4) | _DEFAULT_L, 0x10, kx])
    out += b"\xff\xca" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])
    for ss, se, ah, al in _PROG_SCANS:
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
        out += bytes([ss, se, (ah << 4) | al])
        enc = ArithEncoder()
        fixed = [113, 0]
        if ss == 0 and ah == 0:  # DC first
            dc_bins = _new_bins(_DC_BINS)
            dc = _DCState()
            for zz in zz_blocks:
                v = zz[0] >> al  # DC arithmetic shift (G.1.2.1)
                diff = v - dc.prev
                dc.prev = v
                _encode_dc(enc, dc_bins, dc, diff, _DEFAULT_L, _DEFAULT_U)
        elif ss == 0:  # DC refinement: one fixed bit per block
            for zz in zz_blocks:
                enc.encode(fixed, (zz[0] >> al) & 1)
        elif ah == 0:  # AC first
            ac_bins = _new_bins(_AC_BINS)
            for zz in zz_blocks:
                _enc_ac_first(enc, ac_bins, fixed, zz, ss, se, al, kx)
        else:  # AC refinement
            ac_bins = _new_bins(_AC_BINS)
            for zz in zz_blocks:
                _enc_ac_refine(enc, ac_bins, fixed, zz, ss, se, ah, al)
        out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _skip_to_marker(payload: bytes, pos: int) -> int:
    """Advance past remaining entropy bytes to the next true marker
    (0xFF followed by a non-zero byte — 0xFF00 is stuffed data)."""
    n = len(payload)
    while pos < n:
        if payload[pos] == 0xFF and pos + 1 < n and payload[pos + 1] != 0x00:
            return pos
        pos += 1
    return pos


def _render_arith(dims, qtable, coefs):
    """Dequant + IDCT the accumulated coefficient grid (progressive
    EOI path)."""
    w, h = dims
    bw, bh = (w + 7) // 8, (h + 7) // 8
    plane = [[0] * (bw * 8) for _ in range(bh * 8)]
    for bi, zz in enumerate(coefs):
        coef = [[0] * 8 for _ in range(8)]
        for k, (r, c) in enumerate(ZIGZAG):
            if zz[k]:
                coef[r][c] = zz[k] * qtable[r * 8 + c]
        px = idct_block(coef)
        by, bx = divmod(bi, bw)
        for y in range(8):
            row = plane[by * 8 + y]
            for x in range(8):
                row[bx * 8 + x] = px[y][x]
    return w, h, [row[:w] for row in plane[:h]]
