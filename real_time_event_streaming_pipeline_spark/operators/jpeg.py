"""Pure-stdlib baseline JPEG codec (ITU-T T.81 / JFIF) — greyscale,
baseline sequential DCT, standard Annex K quantization + Huffman
tables with the IJG quality curve. Zero external dependencies: numpy
for the 8×8 block transforms, everything else is integer/bit
plumbing.

This replaces the highest-value remaining decode STUB in
operators/multimodal.py (VERDICT r5 #6): the Spark seam
(mapInPandas over binary columns) was always real; now baseline JPEG
bytes are too. The supported profile is the one a curation pipeline
bulk-decodes: 8-bit greyscale baseline (SOF0, one component, no
subsampling, no restart markers). Everything else — progressive
(SOF2), 12-bit, arithmetic coding, multi-component color — raises
loudly, never silently mis-decodes.

Exactness note (what makes the DuckDB oracle possible): JPEG is
lossy in general, but at quality=100 the IJG scaling collapses the
quantization table to all-ones, and an 8×8 block of CONSTANT value c
has a DCT that is exactly DC-only with DC = 8·(c−128) — an integer.
Nothing is lost in quantize→dequantize, so decode(encode(img)) == img
bit-for-bit for per-block-constant images. The registered query
(plans/llmdata.q_multimodal_jpeg) uses exactly such a closed-form
fixture, which lets a SQL oracle verify the FULL pipeline — marker
framing, Huffman DC coding, byte stuffing, dequantize, IDCT, level
shift — end-to-end without being able to parse JPEG itself. The AC /
lossy paths are pytest-covered with spec-derived error bounds
(tests/test_jpeg_codec.py).

Perf note: the per-block FDCT/IDCT are dense 8×8 matrix products in
numpy (vectorized across each image's blocks); the Huffman layer is
Python bit plumbing — fine for thumbnail fixtures, and the seam a
production pipeline would hand to a native codec, exactly as
operators/png.py documents for its scanline filters.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# Standard tables (ITU-T T.81 Annex K — public)
# ---------------------------------------------------------------------------

# Luminance quantization table, natural (row-major) order, K.1
_BASE_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# Huffman spec = (BITS[1..16] code-length counts, HUFFVAL symbol list)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag() -> np.ndarray:
    """64 (row, col) pairs in zigzag scan order, generated from the
    anti-diagonal walk rather than typed as literals."""
    order = []
    for d in range(15):
        rng = range(min(d, 7), max(0, d - 7) - 1, -1) if d % 2 == 0 else range(
            max(0, d - 7), min(d, 7) + 1
        )
        for r in rng:
            order.append((r, d - r))
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag()
_ZZ_FLAT = _ZZ[:, 0] * 8 + _ZZ[:, 1]  # natural index of the k-th zigzag coeff


def _dct_matrix() -> np.ndarray:
    """D[u, x] = (1/2)·C(u)·cos((2x+1)uπ/16); FDCT = D·B·Dᵀ, IDCT =
    Dᵀ·S·D — the exact T.81 A.3 definition in matrix form."""
    D = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            D[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return D


_D = _dct_matrix()


def scaled_quant_table(quality: int) -> np.ndarray:
    """IJG quality curve: 5000/Q below 50, 200−2Q above; entries
    clamped to [1, 255]. quality=50 is the Annex K table verbatim;
    quality=100 is all ones (the lossless-for-constant-blocks
    operating point the oracle fixture uses)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (_BASE_LUMA_Q * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) -> symbol."""
    return {(ln, code): sym for sym, (code, ln) in _build_codes(bits, vals).items()}


_DC_ENC = _build_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _build_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing inside entropy data
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def encode_jpeg(arr: np.ndarray, quality: int = 75) -> bytes:
    """Encode an (h, w) uint8 greyscale array as baseline JFIF.
    Dimensions need not be multiples of 8 (edge-replication padding,
    the standard convention — the decoder crops back to SOF dims)."""
    arr = np.asarray(arr)
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError(f"encode_jpeg wants (h, w) uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt = scaled_quant_table(quality)
    qt2d = qt.reshape(8, 8).astype(np.float64)

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(arr, ((0, ph - h), (0, pw - w)), mode="edge")

    bw = _BitWriter()
    prev_dc = 0
    shifted = padded.astype(np.float64) - 128.0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = shifted[by : by + 8, bx : bx + 8]
            coef = _D @ block @ _D.T
            q = np.rint(coef / qt2d).astype(np.int64)
            zz = q.reshape(-1)[_ZZ_FLAT]
            # DC: differential, category + offset bits
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            s = _category(diff)
            code, ln = _DC_ENC[s]
            bw.write(code, ln)
            if s:
                bits = diff if diff > 0 else diff + (1 << s) - 1
                bw.write(bits, s)
            # AC: (run, size) symbols with ZRL and EOB
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if k > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_ENC[0xF0]  # ZRL: 16 zeros
                    bw.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = _AC_ENC[(run << 4) | s]
                bw.write(code, ln)
                bits = v if v > 0 else v + (1 << s) - 1
                bw.write(bits, s)
                run = 0
            if last_nz < 63:
                code, ln = _AC_ENC[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT stores the table in zigzag order of the natural-order table
    out += _seg(
        0xFFDB,
        bytes([0x00]) + bytes(int(qt.reshape(8, 8)[r, c]) for r, c in _ZZ),
    )
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing;
    any other FFxx is a marker — stop and raise (no restart support)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG entropy data truncated at FF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed FF
                elif nxt == 0xD9:  # EOI reached mid-read: padding bits
                    raise ValueError("JPEG entropy data ended before all blocks")
                else:
                    raise ValueError(f"unexpected marker FF{nxt:02X} in entropy data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline greyscale JFIF to an (h, w) uint8 array.
    Unsupported profiles (progressive SOF2, 12-bit, color,
    subsampling, restart intervals, arithmetic coding) raise loudly —
    silent mis-decode is the one failure mode a curation pipeline
    can't detect downstream."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    frame = None
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}, got {data[pos]:02X}")
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if pos + 2 + seglen > len(data) or seglen < 2:
            raise ValueError("JPEG segment truncated")
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                if len(body) < i + 65:
                    raise ValueError("DQT segment truncated")
                zz_vals = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZZ_FLAT] = zz_vals.astype(np.int64)
                qtables[tq] = nat.reshape(8, 8)
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                if len(bits) < 16 or len(body) < i + 17 + nvals:
                    raise ValueError("DHT segment truncated")
                vals = list(body[i + 17 : i + 17 + nvals])
                (dc_dec if tc == 0 else ac_dec)[th] = _build_decode(bits, vals)
                i += 17 + nvals
        elif marker == 0xFFC0:
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG unsupported")
            if ncomp != 1:
                raise ValueError("only single-component (greyscale) JPEG supported")
            cid, sampling, tq = body[6], body[7], body[8]
            if sampling != 0x11:
                raise ValueError("chroma subsampling unsupported")
            frame = (h, w, cid, tq)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError(f"non-baseline JPEG (SOF marker FF{marker & 0xFF:02X}) unsupported")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:
            ns = body[0]
            if ns != 1:
                raise ValueError("multi-component scan unsupported")
            td, ta = body[2] >> 4, body[2] & 0x0F
            scan = (td, ta)
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, _cid, tq = frame
    td, ta = scan
    if tq not in qtables or td not in dc_dec or ta not in ac_dec:
        raise ValueError("JPEG references undefined quantization/Huffman table")
    qt2d = qtables[tq].astype(np.float64)

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    out = np.zeros((ph, pw), dtype=np.float64)
    br = _BitReader(data, pos)
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = np.zeros(64, dtype=np.int64)
            s = br.read_symbol(dc_dec[td])
            diff = _extend(br.read_bits(s), s) if s else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = br.read_symbol(ac_dec[ta])
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = rs >> 4, rs & 0x0F
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _extend(br.read_bits(size), size)
                k += 1
            nat = np.zeros(64, dtype=np.int64)
            nat[_ZZ_FLAT] = zz
            coef = nat.reshape(8, 8).astype(np.float64) * qt2d
            block = _D.T @ coef @ _D
            out[by : by + 8, bx : bx + 8] = block
    return np.clip(np.rint(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]
