"""Pure-stdlib GIF codec (GIF87a/GIF89a, CompuServe spec + RFC-cited
LZW) — the palette/LZW compressed-image format web-scraped training
corpora meet constantly (and, via GIF89a animation, the smallest real
multi-frame video-ish container). Zero external dependencies: the
variable-width LZW coder is implemented directly.

Supports on both encode and decode: 87a and 89a streams, global color
tables, the 4-pass interlace layout, animation (graphic control
extensions + NETSCAPE 2.0 looping application extension), data
sub-block framing, LZW with deferred clear codes and the full 12-bit
dictionary growth/reset cycle. Decode additionally tolerates local
color tables and skips unknown extensions by sub-block walking.
Unsupported-on-purpose (raise loudly): sorted/partial palettes beyond
size byte semantics need nothing special; truncated streams, bad
signatures, out-of-range LZW codes, and missing trailers all raise.

This joins PNG (operators/png.py), baseline JPEG (operators/jpeg.py),
WAV and AVI as the fifth REAL codec behind the multimodal decode seam
(operators/multimodal.py); MP3/H.264 remain sanctioned stubs — their
spec tables (polyphase windows, Huffman code books) are not
reproducible from memory, and guessing them would fake correctness.

LZW notes (the part worth reading): codes are packed LSB-first; the
initial code width is min_code_size+1 (9 for 256-color images); the
dictionary holds 2^min_code_size literals plus CLEAR and EOI; the
width grows when the NEXT code to be assigned would not fit, and at
4096 entries the encoder must emit CLEAR and reset (the decoder
mirrors by never growing past 12 bits until a CLEAR arrives). The
classic KwKwK case — a code referencing the entry being defined —
decodes as prev + prev[0].
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21
_GCE_LABEL = 0xF9
_APP_LABEL = 0xFF
_MAX_CODE_WIDTH = 12


def grayscale_palette() -> np.ndarray:
    """The default 256-entry (i, i, i) palette."""
    g = np.arange(256, dtype=np.uint8)
    return np.stack([g, g, g], axis=1)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    """GIF-flavor LZW: returns the code stream (no sub-block framing).
    Emits CLEAR first (as real encoders do), resets the dictionary at
    the 12-bit ceiling, ends with EOI.

    Width bookkeeping deliberately MIRRORS the decoder's table-length
    model instead of the encoder's own next_code: the decoder appends
    one entry per non-first data code — including the FINAL data code
    before EOI, for which the encoder assigns nothing — and grows its
    read width when that table fills the current code space. An
    encoder that grows only on its own assignments writes the EOI one
    bit narrower than the decoder reads it whenever the last append
    lands exactly on a power of two (the classic LZW tail desync)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    # decoder-mirror state: table length and whether the next data
    # code is the decoder's post-clear "first" (which appends nothing)
    state = {"width": min_code_size + 1, "dec_len": eoi + 1, "first": True}

    def emit(code: int) -> None:
        bw.write(code, state["width"])
        if code == clear:
            state.update(width=min_code_size + 1, dec_len=eoi + 1, first=True)
        elif code != eoi:
            if state["first"]:
                state["first"] = False
            else:
                state["dec_len"] += 1
                if state["dec_len"] >= (1 << state["width"]) and state["width"] < _MAX_CODE_WIDTH:
                    state["width"] += 1

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1

    table, next_code = fresh()
    emit(clear)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        if next_code <= (1 << _MAX_CODE_WIDTH) - 1:
            table[cand] = next_code
            next_code += 1
        else:  # dictionary full: reset (decoder mirrors on CLEAR)
            emit(clear)
            table, next_code = fresh()
        prefix = bytes([b])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    return bw.finish()


def lzw_decode(data: bytes, min_code_size: int = 8, expected: int | None = None) -> bytes:
    """Inverse of lzw_encode. Raises on out-of-range codes or a stream
    that ends without EOI when `expected` pixels were promised."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = nbits = pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                if expected is not None and len(out) < expected:
                    raise ValueError("GIF LZW stream truncated (no EOI)")
                return bytes(out)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF LZW: first code {code} out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table size {len(table)}")
        out.extend(entry)
        prev = entry
        # decoder grows width when the table fills the current space,
        # capped at 12 bits until the next CLEAR
        if len(table) >= (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# Interlace + sub-blocks
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def interlace_order(h: int) -> np.ndarray:
    """Row indices in GIF 4-pass interlace transmission order."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-blocks truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("GIF sub-block overruns stream")
        out.extend(data[pos : pos + n])
        pos += n


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    palette: np.ndarray | None = None,
    interlace: bool = False,
    delay_cs: int = 4,
) -> bytes:
    """Encode (h, w) uint8 palette-index frames. One frame -> GIF87a
    (no extensions); several -> animated GIF89a with per-frame graphic
    control extensions and the NETSCAPE loop block."""
    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one shape")
    pal = grayscale_palette() if palette is None else np.asarray(palette, dtype=np.uint8)
    if pal.shape != (256, 3):
        raise ValueError("palette must be 256x3")
    animated = len(frames) > 1
    out = bytearray(b"GIF89a" if animated else b"GIF87a")
    # logical screen descriptor: GCT present, 8-bit color res, 256 entries
    out.extend(struct.pack("<HHBBB", w, h, 0xF7, 0, 0))
    out.extend(pal.tobytes())
    if animated:
        out.extend(bytes([_EXTENSION, _APP_LABEL, 11]))
        out.extend(b"NETSCAPE2.0")
        out.extend(bytes([3, 1, 0, 0, 0]))  # loop forever
    for f in frames:
        if animated:
            out.extend(bytes([_EXTENSION, _GCE_LABEL, 4, 0]))
            out.extend(struct.pack("<H", delay_cs))
            out.extend(bytes([0, 0]))  # no transparency
        flag = 0x40 if interlace else 0x00
        out.extend(bytes([_IMAGE_SEP]))
        out.extend(struct.pack("<HHHHB", 0, 0, w, h, flag))
        rows = f[interlace_order(h)] if interlace else f
        out.append(8)  # LZW minimum code size
        out.extend(_sub_blocks(lzw_encode(rows.tobytes(), 8)))
    out.append(_TRAILER)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_gif(data: bytes) -> dict:
    """Decode to {'width', 'height', 'frames': [(h, w) uint8 index
    arrays], 'palette': (256, 3) uint8, 'delays_cs': [int per frame],
    'version': '87a'|'89a'}. Raises on bad signature, truncation,
    missing trailer, or malformed LZW."""
    data = bytes(data)
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF: bad signature")
    version = data[3:6].decode("ascii")
    if len(data) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("GIF global color table truncated")
        palette = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    delays: list[int] = []
    pending_delay = 0
    saw_trailer = False
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == _TRAILER:
            saw_trailer = True
            break
        if block == _EXTENSION:
            if pos >= len(data):
                raise ValueError("GIF extension truncated")
            label = data[pos]
            pos += 1
            body, pos = _read_sub_blocks(data, pos)
            if label == _GCE_LABEL and len(body) >= 4:
                (pending_delay,) = struct.unpack("<H", body[1:3])
            continue
        if block != _IMAGE_SEP:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("GIF image descriptor truncated")
        left, top, fw, fh, flags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        local_pal = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            local_pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pos >= len(data):
            raise ValueError("GIF image data truncated")
        min_code = data[pos]
        pos += 1
        payload, pos = _read_sub_blocks(data, pos)
        pixels = lzw_decode(payload, min_code, expected=fw * fh)
        if len(pixels) < fw * fh:
            raise ValueError(
                f"GIF frame decoded {len(pixels)} of {fw * fh} pixels"
            )
        frame = np.frombuffer(pixels[: fw * fh], dtype=np.uint8).reshape(fh, fw)
        if flags & 0x40:  # interlaced: invert the transmission order
            restored = np.zeros_like(frame)
            restored[interlace_order(fh)] = frame
            frame = restored
        pal = local_pal if local_pal is not None else palette
        npal = 0 if pal is None else pal.shape[0]
        if frame.size and int(frame.max()) >= npal:
            raise ValueError("GIF pixel index outside color table")
        if (left, top) != (0, 0) or (fw, fh) != (w, h):
            full = np.zeros((h, w), dtype=np.uint8)
            full[top : top + fh, left : left + fw] = frame
            frame = full
        frames.append(frame)
        delays.append(pending_delay)
        pending_delay = 0
    if not saw_trailer:
        raise ValueError("GIF missing trailer")
    if not frames:
        raise ValueError("GIF contains no image")
    return {
        "width": w,
        "height": h,
        "frames": frames,
        "palette": palette,
        "delays_cs": delays,
        "version": version,
    }
