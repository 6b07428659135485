"""Pure-stdlib AVI (RIFF) video codec — real video container parsing
with zero external dependencies, the video sibling of operators/wav.py
(same RIFF chunk grammar) and operators/png.py: uncompressed 24-bit
BI_RGB DIB frames ('00db' chunks), explicit header/LIST walking so
malformed containers fail loudly instead of mis-parsing.

Backs the real video path in operators/multimodal.py
(synth_avi_video / avi_frame_metrics): synthetic frame stacks with
closed-form pixel content are encoded to genuine AVI bytes —
MainAVIHeader, stream header, BITMAPINFOHEADER, movi LIST, idx1
index — decoded back frame by frame, and reduced to integer metrics a
SQL oracle recomputes from the formula. A green driver row proves the
container walk, the bottom-up row order, the BGR channel order, and
the 4-byte row padding were all undone exactly.

The container layout implemented here is the public OpenDML/VFW AVI
spec (RIFF 'AVI ' / LIST 'hdrl' {avih, LIST 'strl' {strh,strf}} /
LIST 'movi' {00db...} / idx1). The reference pipeline has no media
path at all; this slots into the multimodal mandate's frame-sampling
seam (SURVEY.md §2: multimodal columns as binary + typed metadata).
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # DIB rows pad to 4-byte boundaries


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode an (n_frames, height, width, 3) uint8 RGB stack as an
    uncompressed AVI: each frame a bottom-up, BGR, row-padded DIB in a
    '00db' chunk, plus a full idx1 index."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB frames, got {frames.shape}")
    n, h, w, _ = frames.shape
    stride = _row_stride(w)

    def frame_dib(rgb: np.ndarray) -> bytes:
        bgr = rgb[::-1, :, ::-1]  # bottom-up rows, BGR channels
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        return rows.tobytes()

    dibs = [frame_dib(f) for f in frames]
    frame_bytes = stride * h

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate/scale)
            0,  # dwStart
            n,  # dwLength in frames
            frame_bytes,  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize
        )
        + struct.pack("<4h", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        w,
        h,  # positive => bottom-up DIB
        1,  # biPlanes
        24,  # biBitCount
        0,  # biCompression = BI_RGB
        frame_bytes,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_body = b""
    idx_entries = []
    for dib in dibs:
        # idx1 offsets point at the chunk tag, relative to the 'movi'
        # fourcc position
        idx_entries.append((4 + len(movi_body), len(dib)))
        movi_body += _chunk(b"00db", dib)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00db" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
            for off, size in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_len) over a RIFF chunk sequence,
    enforcing word alignment and in-bounds lengths."""
    while pos + 8 <= end:
        tag = bytes(data[pos : pos + 4])
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + length > end:
            raise ValueError(f"AVI chunk {tag!r} truncated")
        yield tag, pos + 8, length
        pos += 8 + length + (length & 1)


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """Decode AVI bytes to ((n_frames, h, w, 3) uint8 RGB, fps).
    Validates the RIFF framing, requires uncompressed 24-bit BI_RGB,
    and cross-checks header frame counts against the movi chunks."""
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI header")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len != len(data) - 8:
        raise ValueError("AVI length field mismatch")

    avih = strh = strf = None
    strl_seen = 0
    dibs: list[bytes] = []

    def walk_list(pos: int, end: int, in_first_strl: bool = False) -> None:
        nonlocal avih, strh, strf, strl_seen
        for tag, body_start, length in _walk_chunks(data, pos, end):
            body_end = body_start + length
            if tag == b"LIST":
                # stream headers bind per 'strl' LIST: only the FIRST
                # strl's strh/strf describe stream 0 — later strls
                # (audio, subtitles) are legal and ignored here
                list_type = bytes(data[body_start : body_start + 4])
                first = False
                if list_type == b"strl":
                    first = strl_seen == 0
                    strl_seen += 1
                walk_list(body_start + 4, body_end, in_first_strl=first)
            elif tag == b"avih":
                avih = struct.unpack("<14I", data[body_start : body_start + 56])
            elif tag == b"strh" and in_first_strl:
                strh = bytes(data[body_start:body_end])
            elif tag == b"strf" and in_first_strl:
                strf = struct.unpack("<IiiHHIIiiII", data[body_start : body_start + 40])
            elif tag in (b"00db", b"00dc"):
                dibs.append(bytes(data[body_start:body_end]))

    walk_list(12, 8 + riff_len)
    if avih is None or strh is None or strf is None:
        raise ValueError("AVI missing avih/strh/strf header")
    if bytes(strh[:4]) != b"vids":
        raise ValueError("first AVI stream is not video")
    n_frames, width, height = avih[4], avih[8], avih[9]
    _, bi_w, bi_h, _, bits, compression = strf[:6]
    if compression != 0 or bits != 24:
        raise ValueError(f"unsupported AVI (compression={compression}, bits={bits})")
    if bi_w != width or abs(bi_h) != height:
        raise ValueError("AVI avih/strf dimension mismatch")
    if len(dibs) != n_frames:
        raise ValueError(f"AVI header says {n_frames} frames, movi has {len(dibs)}")
    scale, rate = struct.unpack("<II", strh[20:28])
    if scale == 0 or rate % scale:
        raise ValueError("AVI non-integral frame rate")
    fps = rate // scale

    stride = _row_stride(width)
    bottom_up = bi_h > 0  # negative biHeight = spec-valid top-down DIB
    out = np.empty((n_frames, height, width, 3), dtype=np.uint8)
    for i, dib in enumerate(dibs):
        if len(dib) != stride * height:
            raise ValueError(f"AVI frame {i}: bad DIB size {len(dib)}")
        rows = np.frombuffer(dib, dtype=np.uint8).reshape(height, stride)
        bgr = rows[:, : width * 3].reshape(height, width, 3)
        rgb = bgr[:, :, ::-1]  # undo BGR
        out[i] = rgb[::-1] if bottom_up else rgb  # undo row order
    return out, fps
