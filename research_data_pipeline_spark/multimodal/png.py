"""Minimal pure-stdlib PNG codec (zlib inflate + scanline unfilter).

The container ships no image library (PIL/imageio), but "real decode"
must still be a live, tested branch — the point of the multimodal layer
is that swapping the innermost decode function is the ONLY change needed
to go from fake-decode to real pixels. PNG is the one mainstream format
whose compression layer is plain DEFLATE (stdlib ``zlib``), so a
complete, correct decoder fits in ~100 lines with zero dependencies.

Scope (asserted, not silently wrong): 8-bit depth, color types 0
(grayscale), 2 (RGB), 6 (RGBA); all five scanline filters; no interlace.
That covers everything the matching :func:`encode_png` writes and the
typical ML-pipeline thumbnail payload. Anything else raises ``ValueError``
with the offending header field.

Reference behavior: the reference pipeline hands image bytes to a codec
library inside its Python workers (see /root/reference dags' media
handling); here the decode runs inside Arrow-batched ``mapInPandas``
(multimodal/ops.py) so bytes cross the JVM boundary once per batch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG byte string to a uint8 array.

    Returns shape (h, w) for grayscale, (h, w, c) for RGB/RGBA.
    """
    if payload[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width, height, color_type, idat = 8, 0, 0, -1, bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if color_type < 0:
        raise ValueError("no IHDR chunk")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        out[y] = _unfilter(raw[off], row, prev, ch)
        prev = out[y]
    return out if ch == 1 else out.reshape(height, width, ch)


def _unfilter(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse one scanline filter (PNG spec §9). ``row`` is the filtered
    bytes, ``prev`` the RECONSTRUCTED previous scanline. Sub/Average/Paeth
    depend on the in-progress reconstruction, so they walk the row; rows
    are short (w×ch bytes) and the loop is per-scanline, not per-pixel-op.
    """
    if ftype == 0:  # None
        return row.copy()
    if ftype == 2:  # Up
        return (row.astype(np.int16) + prev).astype(np.uint8)
    out = np.zeros(len(row), dtype=np.uint8)
    if ftype == 1:  # Sub
        for i in range(len(row)):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(row[i]) + left) & 0xFF
    elif ftype == 3:  # Average
        for i in range(len(row)):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(row[i]) + (left + int(prev[i])) // 2) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(len(row)):
            a = int(out[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (int(row[i]) + pred) & 0xFF
    else:
        raise ValueError(f"bad filter type {ftype}")
    return out


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array — (h, w) gray, (h, w, 3) RGB, (h, w, 4) RGBA —
    as a valid PNG. ``filter_type`` applies one filter (0-4) to every
    scanline so tests can exercise each of the decoder's unfilter paths
    with files any external viewer also accepts. Forward filtering uses
    the ORIGINAL pixel values as the reconstructed neighbors — exactly
    what the spec prescribes, since reconstruction is lossless."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, ch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, ch = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, ch = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * ch).astype(np.int16)
    lines = bytearray()
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            filtered = row
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(ch, dtype=np.int16), row[:-ch]])
            filtered = (row - left) & 0xFF
        elif filter_type == 2:  # Up
            up = flat[y - 1] if y else np.zeros_like(row)
            filtered = (row - up) & 0xFF
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(ch, dtype=np.int16), row[:-ch]])
            up = flat[y - 1] if y else np.zeros_like(row)
            filtered = (row - (left + up) // 2) & 0xFF
        elif filter_type == 4:  # Paeth
            left = np.concatenate([np.zeros(ch, dtype=np.int16), row[:-ch]])
            up = flat[y - 1] if y else np.zeros_like(row)
            ul = np.concatenate([np.zeros(ch, dtype=np.int16), up[:-ch]])
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
            )
            filtered = (row - pred) & 0xFF
        else:
            raise ValueError(f"encode filter {filter_type} not supported")
        lines.append(filter_type)
        lines += filtered.astype(np.uint8).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )
