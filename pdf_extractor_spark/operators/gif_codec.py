"""From-scratch GIF codec (87a/89a) — palette images and animations,
next to the PNG (``png_codec.py``) and Y4M (``y4m_codec.py``) codecs.

Public format only (the GIF87a/89a specification): logical screen
descriptor, global color table, optional 89a extension blocks
(skipped by length, never scanned), per-frame image descriptors with
optional local color tables and the 4-pass interlace, and LZW-
compressed index data. GIF's LZW is a genuinely different machine
from the PDF filter the repo already masters (``pdf_tokenizer``'s
LZWDecode): codes pack LSB-FIRST into a byte stream that is itself
chopped into 255-byte sub-blocks, the code width grows 3..12 bits
from a per-image minimum, and a CLEAR code resets the table mid-
stream. The writer emits the classic "uncompressed GIF" encoding —
literal root codes with a CLEAR before the table would force a width
bump — which is valid LZW any conforming decoder accepts, while THIS
decoder implements the full general machine (KwKwK case included) so
real crawl GIFs decode too.

Strict on structural damage (bad magic, truncated sub-blocks, code
beyond table → :class:`GifError`); lenient on what real files carry
(any 89a extension, missing trailer byte, trailing junk).
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step)


class GifError(ValueError):
    """Malformed or unsupported GIF payload."""


# ------------------------------------------------------------- writer

def _lzw_encode_uncompressed(indices: np.ndarray, min_code: int) -> bytes:
    """Literal-root-code LZW: every pixel emitted as its own code at
    ``min_code + 1`` bits, with CLEAR whenever the implicit table
    would force a width bump. Valid LZW; ~0 % compression — the
    fixture writer's job is bit-exact decodability, not size."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    cap = (1 << width) - 1   # emit CLEAR before table size exceeds this
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    table_size = eoi + 1
    for px in indices.ravel().tolist():
        emit(int(px))
        table_size += 1
        if table_size >= cap:
            emit(clear)
            table_size = eoi + 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_encode(
    frames: list[np.ndarray],
    interlaced: bool = False,
    loop_ext: bool = True,
) -> bytes:
    """Serialize index ``frames`` (each ``(h, w)`` uint8 into a
    256-entry grayscale global palette) into a GIF89a byte stream.
    ``interlaced`` stores rows in the 4-pass order."""
    if not frames:
        raise GifError("no frames")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])  # GCT present, 256 entries, 8-bit
    for i in range(256):
        out += bytes([i, i, i])  # grayscale palette: index == luma
    if loop_ext:
        # NETSCAPE looping application extension — the block every
        # animated GIF carries; decoders must skip it by length
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        if fr.shape != (h, w):
            raise GifError("frame shape mismatch")
        # 89a graphic control extension (delay 4/100 s)
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"
        out += b"\x2c" + bytes(4)  # image descriptor at (0, 0)
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if interlaced else 0x00])  # no LCT
        rows = fr
        if interlaced:
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, h, step)
            ]
            rows = fr[order]
        out += bytes([8])  # LZW minimum code size
        out += _sub_blocks(
            _lzw_encode_uncompressed(rows.astype(np.uint8), 8)
        )
    out += b"\x3b"
    return bytes(out)


# ------------------------------------------------------------- reader

def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            raise GifError("truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise GifError("truncated sub-block")
        out += data[pos : pos + size]
        pos += size


def _lzw_decode(data: bytes, min_code: int, expect: int) -> np.ndarray:
    """General GIF LZW: LSB-first bit unpacking, growing code width,
    CLEAR resets, the KwKwK first-use case. Returns ``expect``
    indices (uint8)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = np.empty(expect, dtype=np.uint8)
    n_out = 0
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                if n_out != expect:
                    raise GifError(
                        f"LZW ended early: {n_out}/{expect} pixels"
                    )
                return out
            if code < len(table) and (code < clear or table[code]):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise GifError(f"LZW code {code} beyond table")
            take = min(len(entry), expect - n_out)
            if take < len(entry):
                raise GifError("LZW output exceeds image size")
            out[n_out : n_out + take] = np.frombuffer(entry, np.uint8)
            n_out += take
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
            prev = entry
    raise GifError("LZW stream ended without EOI")


def gif_decode(payload: bytes) -> tuple[list[np.ndarray], dict]:
    """Parse a GIF → ``(frames [(h, w) uint8 luma], meta)``. Luma is
    the palette's red channel (the fixture palette is grayscale, so
    luma == index; real palettes would convert — the plumbing is
    identical). meta: width, height, n_frames, interlaced (any
    frame), version."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    version = payload[3:6].decode("ascii")
    if len(payload) < 13:
        raise GifError("truncated header")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        if pos + 3 * size > len(payload):
            raise GifError("truncated global color table")
        gct = np.frombuffer(
            payload, np.uint8, 3 * size, pos
        ).reshape(size, 3)
        pos += 3 * size
    frames: list[np.ndarray] = []
    any_interlaced = False
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip whole
            if pos >= n:
                raise GifError("truncated extension")
            pos += 1
            _, pos = _read_sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        if pos + 9 > n:
            raise GifError("truncated image descriptor")
        fw = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        fh = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        pal = gct
        if iflags & 0x80:  # local color table overrides
            size = 2 << (iflags & 0x07)
            if pos + 3 * size > n:
                raise GifError("truncated local color table")
            pal = np.frombuffer(
                payload, np.uint8, 3 * size, pos
            ).reshape(size, 3)
            pos += 3 * size
        if pal is None:
            raise GifError("image with no color table")
        if pos >= n:
            raise GifError("missing LZW minimum code size")
        min_code = payload[pos]
        if not 2 <= min_code <= 11:
            raise GifError(f"bad LZW minimum code size {min_code}")
        pos += 1
        lzw, pos = _read_sub_blocks(payload, pos)
        idx = _lzw_decode(lzw, min_code, fw * fh).reshape(fh, fw)
        if iflags & 0x40:
            any_interlaced = True
            out = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, fh, step)
                out[list(rows)] = idx[src : src + len(rows)]
                src += len(rows)
            idx = out
        safe = np.minimum(idx, len(pal) - 1)
        frames.append(pal[safe, 0])  # red channel as luma
    if not frames:
        raise GifError("GIF carries no image data")
    return frames, {
        "width": w,
        "height": h,
        "n_frames": len(frames),
        "interlaced": any_interlaced,
        "version": version,
    }
