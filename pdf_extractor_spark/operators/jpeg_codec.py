"""From-scratch baseline-JPEG codec (ITU-T T.81, public spec): real
Huffman entropy coding, 8x8 DCT, 4:2:0 / 4:4:4 sampling, restart
markers — the fifth full image decode next to PNG, GIF, TIFF and BMP,
completing the marker-walk sniffer in ``jpeg_markers.py`` with actual
pixel recovery (reference scope: pdf-extractor treats images as
opaque attachments; this engine decodes them for multimodal columns).

Scope is baseline sequential DCT (SOF0), 8-bit precision, grayscale
or YCbCr, interleaved scan — what the overwhelming majority of web
JPEGs are. Progressive (SOF2), arithmetic coding and hierarchical
modes raise :class:`JpegError` explicitly rather than mis-decoding.

Determinism contract (shared with the DuckDB oracle in
``functions/multimodal.py``): every lossy rounding step uses
round-half-up implemented as ``floor(x + 0.5 + 1e-9)``. Exactly
representable rationals reach the rounder through float matrix
multiplies carrying ~1e-13 of noise; the 1e-9 bias is far above that
noise and far below the 1/255 minimum spacing of the quantization
grid, so the codec lands on the same side of every .5 boundary as
exact SQL arithmetic does. Without the bias, a DC level sitting
exactly on a boundary (possible whenever 16*(v-128) is a multiple of
the quant step) would round by float luck.

Huffman tables follow the T.81 Annex K standard-table *shape*
(BITS length-count + HUFFVAL symbol list, canonical code
assignment per Annex C); the tables are written into DHT segments,
so encode/decode agree by construction and any reader consuming the
DHT works too. The all-ones code of the longest length is never
assigned (Annex C's reserved-pattern rule) — checked by a test.
"""

from __future__ import annotations

import math
import struct

import numpy as np


class JpegError(ValueError):
    """Malformed, truncated or unsupported-mode JPEG payload."""


# ------------------------------------------------------------ tables

# T.81 Annex K.1 example quantization tables (the de-facto standard
# every encoder scales).
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)


def scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention): 1-100 →
    scaled table clamped to [1, 255]."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _zigzag() -> np.ndarray:
    """Flat-index order of the T.81 zigzag scan (anti-diagonals,
    alternating direction)."""
    order = []
    for s in range(15):
        ys = range(max(0, s - 7), min(s, 7) + 1)
        for y in (ys if s % 2 else reversed(list(ys))):
            order.append(y * 8 + (s - y))
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag()
UNZIGZAG = np.argsort(ZIGZAG)

# Orthonormal 8x8 DCT basis: FDCT = C @ B @ C.T, IDCT = C.T @ S @ C.
_C = np.array([
    [
        (math.sqrt(0.5) if u == 0 else 1.0) * 0.5
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])

_EPS = 1e-9


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """The codec-wide deterministic rounder (see module docstring)."""
    return np.floor(x + (0.5 + _EPS)).astype(np.int64)


# Standard-shape Huffman tables: one flat 8-bit length for every
# symbol the baseline scan can emit (12 DC categories; 162 AC
# run/size symbols incl. EOB and ZRL + 2 spares = 176 codes, Kraft
# sum 176/256 < 1, max assigned code 175 so the all-ones pattern is
# never used). A flat table is a *valid* canonical table per Annex C
# and removes any chance of a misremembered Annex K value corrupting
# the symbol mapping; compression is a few percent worse — this
# codec optimizes for provable determinism, not byte parity with
# libjpeg output.
def _std_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    bits = [0] * 17  # 1-indexed code lengths
    bits[8] = len(symbols)
    return bits, list(symbols)


DC_SYMBOLS = list(range(12))
# (run<<4)|0 for run 1..14 are the EOBn codes progressive AC scans
# use for end-of-band runs (§G.1.2.2); baseline never emits them.
AC_SYMBOLS = [0x00, 0xF0] + [
    run << 4 for run in range(1, 15)
] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]

HUFF_DC = _std_table(DC_SYMBOLS)
HUFF_AC = _std_table(AC_SYMBOLS)


def _canonical_codes(
    bits: list[int], values: list[int]
) -> dict[int, tuple[int, int]]:
    """Annex C code assignment: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ------------------------------------------------------- bit streams

class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (§B.1.1.5)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad_byte(self) -> None:
        """Pad to a byte boundary with 1-bits (§F.1.2.3)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def marker(self, m: int) -> None:
        self.pad_byte()
        self.buf += bytes([0xFF, m])


class _BitReader:
    """MSB-first reader over entropy-coded data: un-stuffs 0xFF00,
    stops at markers, resynchronizes across RSTn."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.at_marker = 0  # marker byte seen where data expected

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JpegError("entropy data truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise JpegError("entropy data truncated at 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: record it, feed 1-bit padding so a
                # decoder overrunning the scan fails loudly later
                self.at_marker = nxt
                raise JpegError(
                    f"marker 0x{nxt:02x} inside entropy segment"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        # trim consumed high bits: without this the accumulator
        # grows into an arbitrarily long Python int over a scan and
        # every shift turns O(scan length) — quadratic total
        self.acc &= (1 << self.nbits) - 1

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def _fill8(self) -> None:
        """Best-effort top-up to >= 8 buffered bits (stops quietly
        at markers/stream end: the caller falls back to the per-bit
        path, which raises with the precise diagnosis)."""
        while self.nbits < 8:
            try:
                self._fill()
            except JpegError:
                return

    def restart(self, expect: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.nbits = 0
        self.acc = 0
        # a 1-bit pad that fills the byte to 0xFF gets stuffed by the
        # writer; the stuffed pair is entropy data we never pulled —
        # step over it before expecting the marker
        while (
            self.pos + 2 <= len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0x00
        ):
            self.pos += 2
        if self.pos + 2 > len(self.data):
            raise JpegError("truncated at restart marker")
        if self.data[self.pos] != 0xFF or (
            self.data[self.pos + 1] != 0xD0 + expect
        ):
            raise JpegError(
                f"expected RST{expect} at offset {self.pos}"
            )
        self.pos += 2


class _HuffDecoder:
    """Annex F.2.2 canonical decode via per-length min/max code,
    fronted by an 8-bit lookup table: one peek resolves any code of
    length <= 8 (all of them, for this codec's flat tables; real
    DHTs resolve their short codes the same way and fall back to
    the per-bit walk for longer ones)."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.lut: list[tuple[int, int] | None] = [None] * 256
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length]):
                if length <= 8:
                    prefix = code << (8 - length)
                    for fill in range(1 << (8 - length)):
                        self.lut[prefix | fill] = (values[k], length)
                k += 1
                code += 1
            code <<= 1
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length]
                k += bits[length]
                self.maxcode[length] = code - 1
            code <<= 1
        self.values = values

    def decode(self, reader: _BitReader) -> int:
        if reader.nbits < 8:
            reader._fill8()
        if reader.nbits >= 8:
            ent = self.lut[(reader.acc >> (reader.nbits - 8)) & 0xFF]
            if ent is not None:
                reader.nbits -= ent[1]
                return ent[0]
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.values[
                    self.valptr[length] + code - self.mincode[length]
                ]
        raise JpegError("invalid Huffman code")


def _category(v: int) -> tuple[int, int]:
    """(size, raw bits) for a DC diff / AC level (§F.1.2.1.1):
    negatives are stored as value + 2^size - 1."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    if raw >> (size - 1):
        return raw
    return raw - (1 << size) + 1


# ----------------------------------------------------------- encoder

def _pad_plane(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = -h % mult
    pw = -w % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(n_blocks_y, n_blocks_x, 8, 8) view-copy of an 8-padded
    plane, raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    )


def _fdct_quant(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """All blocks of a plane → quantized coefficient blocks
    (nby, nbx, 8, 8) int64. Vectorized: one einsum per plane."""
    b = _blocks(plane).astype(np.float64) - 128.0
    coef = np.einsum("ux,ryxc,vc->ryuv", _C, b, _C, optimize=True)
    return _round_half_up(coef / quant)


def _encode_block(
    writer: _BitWriter,
    qblock: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = qblock.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    size, raw = _category(dc - pred)
    code, length = dc_codes[size]
    writer.write(code, length)
    writer.write(raw, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, raw = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(raw, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(
        ">H", len(payload) + 2
    ) + payload


def jpeg_encode(
    planes: list[np.ndarray],
    quality: int = 75,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode a grayscale ([Y]) or full-resolution YCbCr
    ([Y, Cb, Cr]) image. ``subsample`` selects 4:2:0 (chroma
    averaged 2x2 with the codec rounder, Y sampling factor 2x2);
    ``restart_interval`` > 0 writes DRI and RSTn every that many
    MCUs with DC-predictor resets."""
    if len(planes) not in (1, 3):
        raise JpegError("1 or 3 planes required")
    h, w = planes[0].shape
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise JpegError("bad dimensions")
    color = len(planes) == 3
    if color and any(p.shape != (h, w) for p in planes[1:]):
        raise JpegError("plane shapes differ")
    subsample = bool(subsample and color)

    qy = scale_quant(QUANT_LUMA, quality)
    qc = scale_quant(QUANT_CHROMA, quality)

    mcu = 16 if subsample else 8
    ypad = _pad_plane(np.asarray(planes[0], dtype=np.float64), mcu)
    comp_blocks = [_fdct_quant(ypad, qy)]
    if color:
        for p in planes[1:]:
            cp = np.asarray(p, dtype=np.float64)
            if subsample:
                cp = _pad_plane(cp, 2)
                cp = _round_half_up(
                    (cp[0::2, 0::2] + cp[0::2, 1::2]
                     + cp[1::2, 0::2] + cp[1::2, 1::2]) / 4.0
                ).astype(np.float64)[: (h + 1) // 2, : (w + 1) // 2]
            comp_blocks.append(_fdct_quant(_pad_plane(cp, 8), qc))

    out = [b"\xff\xd8"]  # SOI
    out.append(_seg(
        0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    ))
    zz_y = qy.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out.append(_seg(0xDB, b"\x00" + zz_y))
    if color:
        zz_c = qc.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        out.append(_seg(0xDB, b"\x01" + zz_c))

    y_sampling = 0x22 if subsample else 0x11
    comps = bytes([1, y_sampling, 0])
    if color:
        comps += bytes([2, 0x11, 1, 3, 0x11, 1])
    out.append(_seg(0xC0, b"\x08" + struct.pack(">HH", h, w)
                    + bytes([3 if color else 1]) + comps))

    def dht(tclass: int, tid: int, table) -> bytes:
        bits, values = table
        return _seg(0xC4, bytes([(tclass << 4) | tid])
                    + bytes(bits[1:17]) + bytes(values))

    out.append(dht(0, 0, HUFF_DC))
    out.append(dht(1, 0, HUFF_AC))
    if color:
        out.append(dht(0, 1, HUFF_DC))
        out.append(dht(1, 1, HUFF_AC))
    if restart_interval:
        out.append(_seg(0xDD, struct.pack(">H", restart_interval)))

    scan = bytes([3 if color else 1])
    scan += bytes([1, 0x00])
    if color:
        scan += bytes([2, 0x11, 3, 0x11])
    out.append(_seg(0xDA, scan + b"\x00\x3f\x00"))

    dc_codes = _canonical_codes(*HUFF_DC)
    ac_codes = _canonical_codes(*HUFF_AC)

    writer = _BitWriter()
    preds = [0] * len(comp_blocks)
    mcus_x = (w + mcu - 1) // mcu
    mcus_y = (h + mcu - 1) // mcu
    n_mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and (
                n_mcu % restart_interval == 0
            ):
                writer.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * len(comp_blocks)
            if subsample:
                for dy in (0, 1):
                    for dx in (0, 1):
                        preds[0] = _encode_block(
                            writer,
                            comp_blocks[0][2 * my + dy, 2 * mx + dx],
                            preds[0], dc_codes, ac_codes,
                        )
                for ci in (1, 2):
                    preds[ci] = _encode_block(
                        writer, comp_blocks[ci][my, mx],
                        preds[ci], dc_codes, ac_codes,
                    )
            else:
                for ci in range(len(comp_blocks)):
                    preds[ci] = _encode_block(
                        writer, comp_blocks[ci][my, mx],
                        preds[ci], dc_codes, ac_codes,
                    )
            n_mcu += 1
    writer.pad_byte()
    out.append(bytes(writer.buf))
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# ------------------------------------------------ progressive encoder
#
# Spectral selection + successive approximation (T.81 Annex G). The
# refinement bit-plumbing mirrors the spec's G.1.2.3 discipline: at
# every nonzero coefficient the pending zero-run drains through ZRL
# codes FIRST (each carrying the correction bits buffered so far),
# so the decoder's walk — which reads a correction bit the moment it
# passes an already-significant coefficient — meets every bit at the
# same offset the encoder wrote it.

_MAX_EOBRUN = 0x7FFF


def _emit_eobrun(writer: _BitWriter, ac_codes, state: dict) -> None:
    if state["eobrun"] > 0:
        nbits = state["eobrun"].bit_length() - 1
        code, ln = ac_codes[nbits << 4]
        writer.write(code, ln)
        if nbits:
            writer.write(state["eobrun"] & ((1 << nbits) - 1), nbits)
        state["eobrun"] = 0
    for bit in state["bits"]:
        writer.write(bit, 1)
    state["bits"] = []


def _enc_ac_first(
    writer, zz: np.ndarray, ss: int, se: int, al: int,
    ac_codes, state: dict,
) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        _emit_eobrun(writer, ac_codes, state)
        while r > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            r -= 16
        size, raw = _category(t if v > 0 else -t)
        code, ln = ac_codes[(r << 4) | size]
        writer.write(code, ln)
        writer.write(raw, size)
        r = 0
    if r:
        state["eobrun"] += 1
        if state["eobrun"] == _MAX_EOBRUN:
            _emit_eobrun(writer, ac_codes, state)


def _enc_ac_refine(
    writer, zz: np.ndarray, ss: int, se: int, al: int,
    ac_codes, state: dict,
) -> None:
    tvals = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = -1
    for idx, t in enumerate(tvals):
        if t == 1:
            eob = idx
    r = 0
    br: list[int] = []
    for idx, t in enumerate(tvals):
        if t == 0:
            r += 1
            continue
        while r > 15 and idx <= eob:
            _emit_eobrun(writer, ac_codes, state)
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            r -= 16
            for bit in br:
                writer.write(bit, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        _emit_eobrun(writer, ac_codes, state)
        code, ln = ac_codes[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if int(zz[ss + idx]) > 0 else 0, 1)
        for bit in br:
            writer.write(bit, 1)
        br = []
        r = 0
    if r or br:
        state["eobrun"] += 1
        state["bits"].extend(br)
        if state["eobrun"] == _MAX_EOBRUN or len(state["bits"]) > 960:
            _emit_eobrun(writer, ac_codes, state)


_SCRIPT_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)
_SCRIPT_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def jpeg_encode_progressive(
    planes: list[np.ndarray],
    quality: int = 75,
    subsample: bool = False,
    restart_interval: int = 0,
    scans=None,
) -> bytes:
    """Progressive (SOF2) encode with the default libjpeg-shaped
    scan script (DC first at Al=1, spectral AC bands, then one
    successive-approximation refinement level): same quantized
    coefficients as :func:`jpeg_encode`, delivered over multiple
    scans — decoded pixels are bit-identical to the baseline
    encoding of the same input (pinned by tests).

    ``scans`` overrides the script: tuples of
    (component_indices, Ss, Se, Ah, Al)."""
    if len(planes) not in (1, 3):
        raise JpegError("1 or 3 planes required")
    h, w = planes[0].shape
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise JpegError("bad dimensions")
    color = len(planes) == 3
    if color and any(p.shape != (h, w) for p in planes[1:]):
        raise JpegError("plane shapes differ")
    subsample = bool(subsample and color)

    qy = scale_quant(QUANT_LUMA, quality)
    qc = scale_quant(QUANT_CHROMA, quality)
    mcu = 16 if subsample else 8
    ypad = _pad_plane(np.asarray(planes[0], dtype=np.float64), mcu)
    comp_blocks = [_fdct_quant(ypad, qy)]
    if color:
        for p in planes[1:]:
            cp = np.asarray(p, dtype=np.float64)
            if subsample:
                cp = _pad_plane(cp, 2)
                cp = _round_half_up(
                    (cp[0::2, 0::2] + cp[0::2, 1::2]
                     + cp[1::2, 0::2] + cp[1::2, 1::2]) / 4.0
                ).astype(np.float64)[: (h + 1) // 2, : (w + 1) // 2]
            comp_blocks.append(_fdct_quant(_pad_plane(cp, 8), qc))
    # zigzag views per component: (nby, nbx, 64)
    comp_zz = [
        cb.reshape(cb.shape[0], cb.shape[1], 64)[:, :, ZIGZAG]
        for cb in comp_blocks
    ]
    samps = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = 2 if subsample else 1
    mcus_x = (w + mcu - 1) // mcu
    mcus_y = (h + mcu - 1) // mcu

    out = [b"\xff\xd8"]
    out.append(_seg(
        0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    ))
    out.append(_seg(
        0xDB, b"\x00" + qy.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    ))
    if color:
        out.append(_seg(
            0xDB,
            b"\x01" + qc.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        ))
    comps = bytes([1, (samps[0][0] << 4) | samps[0][1], 0])
    if color:
        comps += bytes([2, 0x11, 1, 3, 0x11, 1])
    out.append(_seg(0xC2, b"\x08" + struct.pack(">HH", h, w)
                    + bytes([3 if color else 1]) + comps))

    def dht(tclass: int, tid: int, table) -> bytes:
        bits, values = table
        return _seg(0xC4, bytes([(tclass << 4) | tid])
                    + bytes(bits[1:17]) + bytes(values))

    out.append(dht(0, 0, HUFF_DC))
    out.append(dht(1, 0, HUFF_AC))
    if color:
        out.append(dht(0, 1, HUFF_DC))
        out.append(dht(1, 1, HUFF_AC))
    if restart_interval:
        out.append(_seg(0xDD, struct.pack(">H", restart_interval)))

    dc_codes = _canonical_codes(*HUFF_DC)
    ac_codes = _canonical_codes(*HUFF_AC)
    if scans is None:
        scans = _SCRIPT_COLOR if color else _SCRIPT_GRAY

    for comp_ids, ss, se, ah, al in scans:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            tid = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tid << 4) | tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out.append(_seg(0xDA, sos))

        writer = _BitWriter()
        state = {"eobrun": 0, "bits": []}
        preds = {ci: 0 for ci in comp_ids}
        rst = 0
        n_unit = 0

        def maybe_restart():
            nonlocal rst, preds, n_unit
            if restart_interval and n_unit and (
                n_unit % restart_interval == 0
            ):
                _emit_eobrun(writer, ac_codes, state)
                writer.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = {ci: 0 for ci in comp_ids}

        if ss == 0:  # DC scan (interleaved over the MCU grid)
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_restart()
                    for ci in comp_ids:
                        hs, vs = samps[ci]
                        for dy in range(vs):
                            for dx in range(hs):
                                dc = int(
                                    comp_zz[ci][vs * my + dy,
                                                hs * mx + dx, 0]
                                )
                                if ah == 0:
                                    v = dc >> al
                                    size, raw = _category(
                                        v - preds[ci]
                                    )
                                    code, ln = dc_codes[size]
                                    writer.write(code, ln)
                                    writer.write(raw, size)
                                    preds[ci] = v
                                else:
                                    writer.write((dc >> al) & 1, 1)
                    n_unit += 1
        else:  # AC scan: single component, natural block grid
            if len(comp_ids) != 1:
                raise JpegError("interleaved AC scan is illegal")
            ci = comp_ids[0]
            hs, vs = samps[ci]
            if ci == 0:
                nbx_nat = (w + 7) // 8
                nby_nat = (h + 7) // 8
            else:
                nbx_nat = ((w * hs + hmax - 1) // hmax + 7) // 8
                nby_nat = ((h * vs + hmax - 1) // hmax + 7) // 8
            for by in range(nby_nat):
                for bx in range(nbx_nat):
                    maybe_restart()
                    if ah == 0:
                        _enc_ac_first(
                            writer, comp_zz[ci][by, bx], ss, se,
                            al, ac_codes, state,
                        )
                    else:
                        _enc_ac_refine(
                            writer, comp_zz[ci][by, bx], ss, se,
                            al, ac_codes, state,
                        )
                    n_unit += 1
        _emit_eobrun(writer, ac_codes, state)
        writer.pad_byte()
        out.append(bytes(writer.buf))
    out.append(b"\xff\xd9")
    return b"".join(out)


# ----------------------------------------------------------- decoder

_STANDALONE = frozenset(
    [0xD8, 0xD9, 0x01] + list(range(0xD0, 0xD8))
)


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next marker at/after ``pos`` (skips entropy
    remnants, stuffed 0xFF00 pairs and 0xFF fill bytes)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            return pos
        pos += 1
    raise JpegError("no marker after scan data")


def _refine_sweep(
    reader: _BitReader, zz: np.ndarray, k: int, se: int, p1: int
) -> None:
    """Correction bits for every already-nonzero coefficient in
    zz[k..se] (§G.2.2 EOB-run path)."""
    while k <= se:
        c = int(zz[k])
        if c:
            if reader.bit() and not (c & p1):
                zz[k] = c + (p1 if c > 0 else -p1)
        k += 1


def _dec_ac_first(
    reader, ac, zz: np.ndarray, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = ac.decode(reader)
        r, s = sym >> 4, sym & 0x0F
        if s:
            k += r
            if k > se:
                raise JpegError("AC band overrun")
            zz[k] = _extend(reader.bits(s), s) << al
            k += 1
        else:
            if r == 15:
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += reader.bits(r)
            return eobrun - 1
    return 0


def _dec_ac_refine(
    reader, ac, zz: np.ndarray, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = ac.decode(reader)
            r, s = sym >> 4, sym & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise JpegError("refinement size != 1")
                val = p1 if reader.bit() else -p1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.bits(r)
                break  # fall into the correction sweep below
            # advance r zero-history positions, reading correction
            # bits at already-nonzero ones along the way
            while k <= se:
                c = int(zz[k])
                if c:
                    if reader.bit() and not (c & p1):
                        zz[k] = c + (p1 if c > 0 else -p1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val:
                if k > se:
                    raise JpegError("refine overrun")
                zz[k] = val
            k += 1
    if eobrun > 0:
        _refine_sweep(reader, zz, k, se, p1)
        eobrun -= 1
    return eobrun


def _decode_one_scan(
    payload: bytes, pos: int, comp_info: list[dict], scan, geom,
    quant, huff_dc, huff_ac, progressive: bool,
    restart_interval: int, ss: int, se: int, ah: int, al: int,
) -> int:
    """Entropy-decode one scan into the component coefficient
    arrays; returns the byte position after the scan's data.
    Sequential scans are the (ss,se,ah,al) = (0,63,0,0) case of the
    same unit walk; progressive scans dispatch on the band and
    approximation parameters (§G.2)."""
    hmax, vmax, mcus_x, mcus_y = geom
    if ss > se or se > 63:
        raise JpegError("bad spectral band")
    if progressive and ss > 0 and len(scan) > 1:
        raise JpegError("interleaved AC scan is illegal")
    if progressive and ss == 0 and se != 0:
        raise JpegError("progressive DC scan with Se != 0")
    tabs = {}
    for ci, td, ta in scan:
        needs_dc = not progressive or (ss == 0 and ah == 0)
        needs_ac = not progressive or ss > 0
        dc = huff_dc.get(td)
        ac = huff_ac.get(ta)
        if needs_dc and dc is None:
            raise JpegError("huffman DC table undefined")
        if needs_ac and ac is None:
            raise JpegError("huffman AC table undefined")
        tabs[ci] = (dc, ac)

    if len(scan) > 1:
        def units():
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    blocks = []
                    for ci, _td, _ta in scan:
                        info = comp_info[ci]
                        for dy in range(info["vs"]):
                            for dx in range(info["hs"]):
                                blocks.append((
                                    ci,
                                    info["vs"] * my + dy,
                                    info["hs"] * mx + dx,
                                ))
                    yield blocks
    else:
        ci0 = scan[0][0]
        info0 = comp_info[ci0]

        def units():
            for by in range(info0["nby_nat"]):
                for bx in range(info0["nbx_nat"]):
                    yield [(ci0, by, bx)]

    reader = _BitReader(payload, pos)
    preds = {ci: 0 for ci, _td, _ta in scan}
    eobrun = 0
    rst = 0
    n_unit = 0
    for blocks in units():
        if restart_interval and n_unit and (
            n_unit % restart_interval == 0
        ):
            reader.restart(rst)
            rst = (rst + 1) % 8
            preds = {ci: 0 for ci, _td, _ta in scan}
            eobrun = 0
        for ci, by, bx in blocks:
            zz = comp_info[ci]["coef"][by, bx]
            dc_dec, ac_dec = tabs[ci]
            if not progressive:
                size = dc_dec.decode(reader)
                if size > 11:
                    raise JpegError("bad DC category")
                preds[ci] += _extend(reader.bits(size), size)
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = ac_dec.decode(reader)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    k += run
                    if k > 63:
                        raise JpegError("AC index overrun")
                    zz[k] = _extend(reader.bits(size), size)
                    k += 1
            elif ss == 0:
                if ah == 0:
                    size = dc_dec.decode(reader)
                    if size > 11:
                        raise JpegError("bad DC category")
                    preds[ci] += _extend(reader.bits(size), size)
                    zz[0] = preds[ci] << al
                elif reader.bit():
                    zz[0] |= 1 << al
            elif ah == 0:
                eobrun = _dec_ac_first(
                    reader, ac_dec, zz, ss, se, al, eobrun
                )
            else:
                eobrun = _dec_ac_refine(
                    reader, ac_dec, zz, ss, se, al, eobrun
                )
        n_unit += 1
    return reader.pos


def _jpeg_decode_impl(
    payload: bytes, salvage: bool = False
) -> tuple[list[np.ndarray], dict]:
    """Full decode, baseline (SOF0/SOF1) or progressive (SOF2) →
    (planes, meta). Planes come back at their NATURAL sampling size
    (chroma stays subsampled; use :func:`jpeg_to_rgb` to
    upsample+convert), cropped to the frame dimensions. meta:
    width, height, n_components, subsampled, progressive,
    restart_interval, n_scans, salvaged.

    ``salvage``: a structural/entropy failure AFTER at least one
    complete scan reconstructs from the completed scans instead of
    raising — what a browser does with a crawl-truncated progressive
    image (the failing scan's partial coefficients are rolled back,
    so the result is exactly "first k scans")."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    progressive = False
    restart_interval = 0
    comp_info: list[dict] | None = None
    geom = None
    n_scans = 0
    salvaged = False
    i = 2
    n = len(payload)
    while i + 2 <= n:
        try:
            if payload[i] != 0xFF:
                raise JpegError(f"marker desync at {i}")
            marker = payload[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in _STANDALONE:
                if marker == 0xD9:
                    if n_scans == 0:
                        raise JpegError("EOI before any scan")
                    break
                i += 2
                continue
            if i + 4 > n:
                raise JpegError("truncated segment header")
            seglen = struct.unpack(">H", payload[i + 2:i + 4])[0]
            if seglen < 2 or i + 2 + seglen > n:
                raise JpegError("truncated segment")
            body = payload[i + 4:i + 2 + seglen]
            if marker == 0xDB:
                p = 0
                while p < len(body):
                    prec = body[p] >> 4
                    tid = body[p] & 0x0F
                    if prec != 0:
                        raise JpegError("16-bit quant tables unsupported")
                    if p + 65 > len(body):
                        raise JpegError("short DQT")
                    tbl = np.frombuffer(
                        body[p + 1:p + 65], dtype=np.uint8
                    ).astype(np.int64)[UNZIGZAG].reshape(8, 8)
                    quant[tid] = tbl
                    p += 65
            elif marker == 0xC4:
                p = 0
                while p < len(body):
                    tclass = body[p] >> 4
                    tid = body[p] & 0x0F
                    if p + 17 > len(body):
                        raise JpegError("short DHT")
                    bits = [0] + list(body[p + 1:p + 17])
                    count = sum(bits)
                    values = list(body[p + 17:p + 17 + count])
                    if len(values) < count:
                        raise JpegError("short DHT values")
                    dec = _HuffDecoder(bits, values)
                    (huff_ac if tclass else huff_dc)[tid] = dec
                    p += 17 + count
            elif marker in (0xC0, 0xC1, 0xC2):
                if frame is not None:
                    raise JpegError("multiple SOF segments")
                progressive = marker == 0xC2
                prec = body[0]
                if prec != 8:
                    raise JpegError("only 8-bit precision supported")
                h, w = struct.unpack(">HH", body[1:5])
                ncomp = body[5]
                if ncomp not in (1, 3):
                    raise JpegError(f"{ncomp}-component frames unsupported")
                comps = []
                for c in range(ncomp):
                    cid = body[6 + 3 * c]
                    samp = body[7 + 3 * c]
                    tq = body[8 + 3 * c]
                    comps.append((cid, samp >> 4, samp & 0x0F, tq))
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if (hmax, vmax) not in ((1, 1), (2, 2)):
                    raise JpegError("only 1x1 and 2x2 max sampling supported")
                for cid, hs, vs, _tq in comps:
                    if (hs, vs) not in ((1, 1), (hmax, vmax)):
                        raise JpegError("mixed sampling layout unsupported")
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                frame = (w, h, comps)
                geom = (hmax, vmax, mcus_x, mcus_y)
                comp_info = []
                for cid, hs, vs, tq in comps:
                    comp_info.append({
                        "cid": cid, "hs": hs, "vs": vs, "tq": tq,
                        "coef": np.zeros(
                            (mcus_y * vs, mcus_x * hs, 64), dtype=np.int64
                        ),
                        # natural (unpadded) block grid for
                        # non-interleaved scans (§A.2.2)
                        "nbx_nat": (
                            ((w * hs + hmax - 1) // hmax + 7) // 8
                        ),
                        "nby_nat": (
                            ((h * vs + vmax - 1) // vmax + 7) // 8
                        ),
                    })
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise JpegError(
                    f"unsupported frame type 0x{marker:02x}"
                )
            elif marker == 0xDD:
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:
                if frame is None or comp_info is None:
                    raise JpegError("SOS before SOF")
                ns = body[0]
                scan = []
                for c in range(ns):
                    cid = body[1 + 2 * c]
                    tables = body[2 + 2 * c]
                    ci = next(
                        (j for j, info in enumerate(comp_info)
                         if info["cid"] == cid), None
                    )
                    if ci is None:
                        raise JpegError(f"scan component {cid} unknown")
                    scan.append((ci, tables >> 4, tables & 0x0F))
                ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                if not progressive:
                    ss, se, ah, al = 0, 63, 0, 0
                    if len(scan) != len(comp_info):
                        raise JpegError(
                            "baseline scan must carry every component"
                        )
                # roll back the failing scan's partial writes so a
                # salvaged image is exactly "first k complete scans"
                snapshot = [
                    info["coef"].copy() for info in comp_info
                ] if salvage else None
                try:
                    pos = _decode_one_scan(
                        payload, i + 2 + seglen, comp_info, scan,
                        geom, quant, huff_dc, huff_ac, progressive,
                        restart_interval, ss, se, ah, al,
                    )
                except JpegError:
                    if snapshot is not None:
                        for info, snap in zip(comp_info, snapshot):
                            info["coef"] = snap
                    raise
                n_scans += 1
                i = _next_marker(payload, pos)
                continue
            # APPn / COM / others: skip by length
            i += 2 + seglen
        except JpegError:
            # salvage mode: anything broken after >= 1
            # complete scan reconstructs from what landed;
            # the failing scan was rolled back at its own
            # snapshot (SOS branch)
            if salvage and n_scans >= 1:
                salvaged = True
                break
            raise
    if frame is None or n_scans == 0:
        raise JpegError("missing SOF or SOS")

    w, h, comps = frame
    hmax, vmax, mcus_x, mcus_y = geom
    subsampled = hmax == 2
    for info in comp_info:
        if info["tq"] not in quant:
            raise JpegError(f"quant table {info['tq']} undefined")
        info["quant"] = quant[info["tq"]]

    planes = []
    for info in comp_info:
        nby, nbx, _ = info["coef"].shape
        blocks = info["coef"][:, :, UNZIGZAG].reshape(nby, nbx, 8, 8)
        deq = blocks * info["quant"]
        pix = np.einsum(
            "ux,ryuv,vc->ryxc", _C, deq.astype(np.float64), _C,
            optimize=True,
        )
        full = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        img = np.clip(_round_half_up(full) + 128, 0, 255)
        cw = (w * info["hs"] + hmax - 1) // hmax
        ch = (h * info["vs"] + vmax - 1) // vmax
        planes.append(img[:ch, :cw].astype(np.uint8))

    meta = {
        "width": w,
        "height": h,
        "n_components": len(comp_info),
        "subsampled": subsampled,
        "progressive": progressive,
        "restart_interval": restart_interval,
        "n_scans": n_scans,
        "salvaged": salvaged,
    }
    return planes, meta


def jpeg_decode(payload: bytes) -> tuple[list[np.ndarray], dict]:
    """Public decode entry: every structural failure — including
    raw struct/slice errors from adversarially corrupted length
    fields — surfaces as :class:`JpegError`, so batch harvests can
    catch ONE exception type and never die on a mutant byte."""
    try:
        return _jpeg_decode_impl(payload)
    except JpegError:
        raise
    except (ValueError, IndexError, struct.error) as exc:
        raise JpegError(f"malformed stream: {exc}") from exc


def jpeg_decode_salvage(
    payload: bytes,
) -> tuple[list[np.ndarray], dict]:
    """Browser-style progressive salvage: decode a truncated or
    tail-corrupted stream from its COMPLETE scans (meta
    ``salvaged``/``n_scans`` report what happened). Streams broken
    before the first complete scan still raise :class:`JpegError`
    — there is nothing to show."""
    try:
        return _jpeg_decode_impl(payload, salvage=True)
    except JpegError:
        raise
    except (ValueError, IndexError, struct.error) as exc:
        raise JpegError(f"malformed stream: {exc}") from exc


def jpeg_to_rgb(planes: list[np.ndarray], meta: dict) -> np.ndarray:
    """(H, W, 3) uint8 via nearest-neighbor chroma upsample + JFIF
    full-range BT.601 (grayscale replicates Y)."""
    h, w = meta["height"], meta["width"]
    y = planes[0].astype(np.float64)
    if meta["n_components"] == 1:
        g = np.clip(_round_half_up(y), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    cb = planes[1].astype(np.float64)
    cr = planes[2].astype(np.float64)
    if meta["subsampled"]:
        cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w]
        cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack(
        [
            np.clip(_round_half_up(ch), 0, 255).astype(np.uint8)
            for ch in (r, g, b)
        ],
        axis=-1,
    )


# ---------------------------------------------------- metadata strip

def jpeg_strip_metadata(payload: bytes) -> tuple[bytes, int]:
    """Privacy scrub: drop every APP1-APP15 and COM segment (Exif
    with its GPS sub-IFD, XMP, Photoshop IRBs, comments) while
    copying everything else byte-identically — pixels, quant and
    Huffman tables, scans untouched. APP0/JFIF stays (display
    metadata, no provenance). Returns (stripped bytes,
    bytes_removed). Segments after the first SOS copy verbatim
    (entropy data may contain any byte pattern; metadata segments
    between progressive scans are not a thing real writers emit)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    out = bytearray(b"\xff\xd8")
    removed = 0
    i = 2
    n = len(payload)
    while i + 2 <= n:
        if payload[i] != 0xFF:
            raise JpegError(f"marker desync at {i}")
        marker = payload[i + 1]
        if marker == 0xFF:
            out.append(0xFF)
            i += 1
            continue
        if marker in _STANDALONE:
            out += payload[i:i + 2]
            i += 2
            if marker == 0xD9:
                break
            continue
        if i + 4 > n:
            raise JpegError("truncated segment header")
        seglen = struct.unpack(">H", payload[i + 2:i + 4])[0]
        if seglen < 2 or i + 2 + seglen > n:
            raise JpegError("truncated segment")
        if 0xE1 <= marker <= 0xEF or marker == 0xFE:
            removed += 2 + seglen
        else:
            out += payload[i:i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDA:
            out += payload[i:]  # entropy + remaining scans, verbatim
            break
    return bytes(out), removed
