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
neighbor), so decode_png's inner loop is Python — fine for one-off
thumbnails. Bulk callers use decode_png_batch / encode_png_batch
(r12 verdict #3): same recurrences, but the per-pixel step runs over
EVERY same-shape image in the Arrow batch at once (measured ~25× on
32×32 decode, ~4.5× on encode, which is then zlib-bound); a
production deployment would link a native codec at this exact seam.
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


def _parse_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Chunk walk + inflate shared by the scalar and batch decoders:
    (w, h, channels, raw) with raw the decompressed filter-tagged
    scanline bytes, length-validated. CRCs verified; truncated /
    corrupt / unsupported input raises."""
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
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    return w, h, channels, raw


def encode_png_batch(arrs: np.ndarray, filter_types) -> list[bytes]:
    """Encode a stack of SAME-SHAPE images — (n, h, w) or
    (n, h, w, 3|4) uint8 — with a per-image scanline filter, emitting
    bytes identical to encode_png per image (same predictors, same
    zlib level; pinned in tests/test_png_codec.py). Encoding-side
    predictors see ORIGINAL pixels, so every filter vectorizes across
    the whole batch in one shot — the batch twin of decode_png_batch
    for synthetic-corpus generators that build millions of thumbnails
    (r12 verdict #3)."""
    arrs = np.asarray(arrs, dtype=np.uint8)
    if arrs.ndim == 3:
        n, h, w = arrs.shape
        channels = 1
    elif arrs.ndim == 4 and arrs.shape[3] in (3, 4):
        n, h, w, channels = arrs.shape
    else:
        raise ValueError(f"unsupported batch shape {arrs.shape}")
    ftv = np.asarray(filter_types, dtype=np.int64)
    if ftv.shape != (n,) or not np.isin(ftv, (0, 1, 2, 3, 4)).all():
        raise ValueError("filter_types must be one of 0..4 per image")
    color = _CHANNELS_TO_COLOR[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    bpp = channels
    stride = w * channels
    flat = arrs.reshape(n, h, stride).astype(np.int16)
    left = np.zeros_like(flat)
    left[:, :, bpp:] = flat[:, :, :-bpp]
    prev = np.zeros_like(flat)
    prev[:, 1:] = flat[:, :-1]
    upleft = np.zeros_like(flat)
    upleft[:, 1:, bpp:] = flat[:, :-1, :-bpp]
    filt = np.empty_like(flat)
    for ft in range(5):
        m = ftv == ft
        if not m.any():
            continue
        if ft == 0:
            filt[m] = flat[m]
        elif ft == 1:
            filt[m] = flat[m] - left[m]
        elif ft == 2:
            filt[m] = flat[m] - prev[m]
        elif ft == 3:
            filt[m] = flat[m] - (left[m] + prev[m]) // 2
        else:
            filt[m] = flat[m] - _paeth(
                left[m].astype(np.uint8),
                prev[m].astype(np.uint8),
                upleft[m].astype(np.uint8),
            )
    tagged = np.empty((n, h, stride + 1), dtype=np.uint8)
    tagged[:, :, 0] = ftv[:, None]
    tagged[:, :, 1:] = (filt % 256).astype(np.uint8)
    head = _SIG + _chunk(b"IHDR", ihdr)
    tail = _chunk(b"IEND", b"")
    return [
        head + _chunk(b"IDAT", zlib.compress(tagged[i].tobytes(), 6)) + tail
        for i in range(n)
    ]


def decode_png(data: bytes) -> np.ndarray:
    """Decode to an (h, w) uint8 array (greyscale) or (h, w, channels)
    (RGB/RGBA). CRCs are verified; truncated/corrupt input raises."""
    w, h, channels, raw = _parse_png(data)
    bpp = channels
    stride = w * channels
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


def decode_png_batch(datas) -> np.ndarray:
    """Decode a sequence of SAME-SHAPE 8-bit PNGs into one
    (n, h, w[, channels]) uint8 array, vectorizing the scanline-filter
    recurrences ACROSS the batch (r12 verdict #3: decode_png's
    per-byte Python loop for Sub/Average/Paeth was the cost center of
    llm_image_dedup_pairs — 199 s at sf30). The recurrences are
    unchanged mathematically; only the iteration axis moves:

    - None/Up rows are whole-row numpy ops as before, but over all n
      images at once (Up is applied per row against the already-
      reconstructed previous row, so cross-row order is preserved).
    - Sub (left-only) collapses to a per-channel-phase cumsum — zero
      Python steps.
    - Average/Paeth keep their inherent left-to-right data dependence,
      but the per-PIXEL Python step now processes that pixel position
      for EVERY image (and channel) in the batch simultaneously:
      h*w numpy steps per batch instead of h*w per image.

    Raises on heterogeneous shapes (callers with mixed corpora decode
    per image); bitwise-identical to decode_png per image, pinned in
    tests/test_png_codec.py."""
    datas = [bytes(d) for d in datas]
    n = len(datas)
    if n == 0:
        raise ValueError("decode_png_batch: empty batch")
    parsed = [_parse_png(d) for d in datas]
    w, h, channels = parsed[0][:3]
    if any(p[:3] != (w, h, channels) for p in parsed):
        raise ValueError(
            "decode_png_batch requires same-shape images; decode "
            "heterogeneous corpora per image with decode_png"
        )
    bpp = channels
    stride = w * channels
    raw = np.frombuffer(
        b"".join(p[3] for p in parsed), dtype=np.uint8
    ).reshape(n, h, stride + 1)
    fts = raw[:, :, 0]
    lines = raw[:, :, 1:].astype(np.int16)
    bad = ~np.isin(fts, (0, 1, 2, 3, 4))
    if bad.any():
        raise ValueError(f"unknown scanline filter {int(fts[bad][0])}")
    out = np.zeros((n, h, stride), dtype=np.int16)
    prev = np.zeros((n, stride), dtype=np.int16)
    for y in range(h):
        line = lines[:, y]
        ft = fts[:, y]
        rec = np.empty((n, stride), dtype=np.int16)
        m = ft == 0
        if m.any():
            rec[m] = line[m]
        m = ft == 2
        if m.any():
            rec[m] = (line[m] + prev[m]) % 256
        m = ft == 1
        if m.any():
            sub = line[m].reshape(-1, w, bpp)
            rec[m] = (np.cumsum(sub, axis=1) % 256).reshape(-1, stride)
        m = ft == 3
        if m.any():
            l3 = line[m].reshape(-1, w, bpp)
            p3 = prev[m].reshape(-1, w, bpp)
            r3 = np.empty_like(l3)
            left = np.zeros((l3.shape[0], bpp), dtype=np.int16)
            for x in range(w):
                left = (l3[:, x] + (left + p3[:, x]) // 2) % 256
                r3[:, x] = left
            rec[m] = r3.reshape(-1, stride)
        m = ft == 4
        if m.any():
            l4 = line[m].reshape(-1, w, bpp)
            p4 = prev[m].reshape(-1, w, bpp)
            r4 = np.empty_like(l4)
            left = np.zeros((l4.shape[0], bpp), dtype=np.int16)
            upleft = np.zeros((l4.shape[0], bpp), dtype=np.int16)
            for x in range(w):
                up = p4[:, x]
                p = left + up - upleft
                pa = np.abs(p - left)
                pb = np.abs(p - up)
                pc = np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, up, upleft),
                )
                left = (l4[:, x] + pred) % 256
                r4[:, x] = left
                upleft = up
            rec[m] = r4.reshape(-1, stride)
        out[:, y] = rec
        prev = rec
    res = out.astype(np.uint8)
    return (
        res.reshape(n, h, w)
        if channels == 1
        else res.reshape(n, h, w, channels)
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — index arithmetic only, any channel
    count; the resize primitive behind multimodal.resize_png."""
    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]
