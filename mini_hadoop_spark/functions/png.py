"""Pure-stdlib PNG decoder (RFC 2083 / ISO 15948 — public spec).

The PIL-free PNG arm of the multimodal image decode path, sibling of
``functions/jpeg.py`` (r15): zlib inflate is in the standard library,
so a complete 8-bit PNG decode — chunk walk with CRC checks, IDAT
inflate, the five scanline filters, palette/alpha handling — needs no
third-party code.  Returns pixels in the same ``[(r, g, b), ...]``
raster-order contract as ``multimodal._decode_bmp_rgb`` and
``jpeg.decode_baseline_jpeg``.

Supported profile: bit depth 8, color types 0 (grayscale), 2 (RGB),
3 (palette), 4 (gray+alpha) and 6 (RGBA), non-interlaced.  Alpha is
dropped (composited as-is — the luma-histogram consumer is opaque).
16-bit depths, sub-8-bit depths and Adam7 interlacing raise
``NotImplementedError`` LOUDLY; corrupt streams (bad magic, CRC
mismatch, wrong scanline length, bad filter id) raise ``ValueError``.

Scale note: runs inside Arrow-batched ``mapInPandas`` workers like the
other stdlib decoders — per-payload CPU cost parallelizes across
executors.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"
#: samples per pixel for each supported color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Undo the per-scanline filters; returns the concatenated
    reconstructed scanlines (height * width * bpp bytes)."""
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG pixel data is {len(raw)} bytes, expected {height * (stride + 1)}"
        )
    out = bytearray(height * stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        base = y * stride
        prev_base = base - stride
        if f == 0:  # None
            out[base : base + stride] = line
        elif f == 1:  # Sub
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                out[base + x] = (line[x] + left) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                up = out[prev_base + x] if y else 0
                out[base + x] = (line[x] + up) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                up = out[prev_base + x] if y else 0
                out[base + x] = (line[x] + (left + up) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                up = out[prev_base + x] if y else 0
                ul = out[prev_base + x - bpp] if (y and x >= bpp) else 0
                out[base + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"PNG scanline {y} has invalid filter type {f}")
    return out


def decode_png_rgb(payload: bytes) -> tuple[int, int, list]:
    """Decode an 8-bit non-interlaced PNG into ``(width, height,
    pixels)`` with pixels as ``[(r, g, b), ...]`` in raster order.
    Truncated/corrupt streams always surface as ValueError (struct /
    index errors from short chunks convert at this boundary)."""
    try:
        return _decode_png(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated or corrupt PNG stream: {exc}") from None


def _decode_png(payload: bytes) -> tuple[int, int, list]:
    if len(payload) < 8 or payload[:8] != _MAGIC:
        raise ValueError("not a PNG payload (missing magic)")
    pos = 8
    ihdr = None
    palette: bytes | None = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"PNG chunk {ctype!r} truncated")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} fails its CRC")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG has no IHDR chunk")
    width, height, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"PNG with invalid compression/filter method {comp}/{filt}")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG does not decode here")
    if depth != 8:
        raise NotImplementedError(f"only 8-bit PNG decodes here, got depth {depth}")
    if color not in _CHANNELS:
        raise ValueError(f"PNG with invalid color type {color}")
    if color == 3 and palette is None:
        raise ValueError("palette PNG without a PLTE chunk")
    if width == 0 or height == 0:
        raise ValueError("PNG with zero dimensions")
    if not idat:
        raise ValueError("PNG has no IDAT data")
    bpp = _CHANNELS[color]
    # Bound the inflate to the exact expected scanline bytes (ADVICE
    # r15): an unbounded zlib.decompress lets a small decompression-bomb
    # IDAT allocate gigabytes in an executor before the length check.
    expected = height * (width * bpp + 1)
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
        if len(raw) > expected or dec.unconsumed_tail:
            raise ValueError("PNG IDAT inflates past the declared dimensions")
        raw += dec.flush()
        if len(raw) > expected:
            raise ValueError("PNG IDAT inflates past the declared dimensions")
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from None
    data = _unfilter(raw, width, height, bpp)
    pixels = []
    if color == 2:
        for i in range(0, len(data), 3):
            pixels.append((data[i], data[i + 1], data[i + 2]))
    elif color == 6:
        for i in range(0, len(data), 4):
            pixels.append((data[i], data[i + 1], data[i + 2]))
    elif color == 0:
        pixels = [(v, v, v) for v in data]
    elif color == 4:
        pixels = [(data[i], data[i], data[i]) for i in range(0, len(data), 2)]
    else:  # palette
        for v in data:
            j = 3 * v
            if j + 2 >= len(palette):
                raise ValueError(f"PNG palette index {v} out of range")
            pixels.append((palette[j], palette[j + 1], palette[j + 2]))
    return width, height, pixels
