"""Pure-stdlib PNG codec (RFC 2083 / ISO 15948) — real media decode
with zero external dependencies: zlib (stdlib) for DEFLATE, numpy for
row math. Supports the formats a curation pipeline actually meets in
bulk: 8-bit greyscale / RGB / RGBA, non-interlaced, all five scanline
filters on both encode and decode, CRC-verified chunks.

This replaces the decode STUB for PNG payloads in
operators/multimodal.py: the Spark seam (mapInPandas over binary
columns) was always real; now the bytes inside are too. Baseline
JPEG is real as well (operators/jpeg.py); MP3/H.264 stay stubbed
(they need codec libraries this container lacks).

Perf note: filters Sub/Average/Paeth decode byte-sequentially within
a row (each byte's predictor uses the just-reconstructed left
neighbor), so the inner loop is Python — fine for the thumbnail-sized
fixtures here; a production decoder vectorizes rows across the batch
or links a native codec at this exact seam.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TO_CHANNELS = {0: 1, 2: 3, 6: 4}
_CHANNELS_TO_COLOR = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    a, b, c = left.astype(np.int16), up.astype(np.int16), upleft.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w) or (h, w, 3|4) uint8 array. ``filter_type``
    picks the per-row filter (0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth) — encoding-side predictors see the ORIGINAL bytes, so
    every filter vectorizes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, channels = arr.shape[0], arr.shape[1], 1
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        h, w, channels = arr.shape
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown filter {filter_type}")
    color = _CHANNELS_TO_COLOR[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    bpp = channels
    stride = w * channels
    flat = arr.reshape(h, stride).astype(np.int16)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int16), prev[:-bpp]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prev
        elif filter_type == 3:
            filt = row - (left + prev) // 2
        else:
            filt = row - _paeth(
                left.astype(np.uint8), prev.astype(np.uint8), upleft.astype(np.uint8)
            )
        raw.append(filter_type)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode to an (h, w) uint8 array (greyscale) or (h, w, channels)
    (RGB/RGBA). CRCs are verified; truncated/corrupt input raises."""
    if bytes(data[:8]) != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    idat = bytearray()
    header = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = bytes(data[pos + 4 : pos + 8])
        body = bytes(data[pos + 8 : pos + 8 + length])
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            header = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if header is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt_method, interlace = header
    if depth != 8 or comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, interlace={interlace})"
        )
    if color not in _COLOR_TO_CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    channels = _COLOR_TO_CHANNELS[color]
    bpp = channels
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int16)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):
            rec = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                up = prev[i]
                upleft = prev[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else upleft)
                rec[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown scanline filter {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, channels)


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — index arithmetic only, any channel
    count; the resize primitive behind multimodal.resize_png."""
    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]
