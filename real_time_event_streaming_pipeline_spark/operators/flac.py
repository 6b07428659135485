"""Pure-stdlib FLAC codec (the free-lossless-audio-codec format) —
real COMPRESSED audio decode with zero external dependencies, the
audio sibling of the GIF/LZW and PNG/DEFLATE paths: fixed-predictor
linear prediction + Rice/Golomb residual coding, bit-exact because
FLAC is lossless.

Supported on both encode and decode: the fLaC stream marker,
STREAMINFO (and skipping any other metadata block), multi-frame
streams, 8/16-bit samples, 1-2 independent channels, constant /
verbatim / fixed-order-0..4 subframes, Rice partitions (both 4- and
5-bit parameter widths, escape-to-raw partitions), UTF-8-style frame
numbering, CRC-8 frame-header and CRC-16 whole-frame checks, and
wasted-bits shifting on decode. Unsupported-on-purpose (raise
loudly): arbitrary-order LPC subframes and mid/side stereo on decode
(the encoder never emits them), anything failing a CRC.

MP3 remains a sanctioned stub (operators/multimodal.py): its spec
tables (polyphase window, Huffman books) are not reproducible from
memory. FLAC's machinery — polynomial predictors, Rice codes, CRCs —
is small enough to state exactly, which is the line between a real
codec and a faked one.

Format notes (the load-bearing details):
- Rice residual: signed -> unsigned zigzag (n>=0 -> 2n, n<0 ->
  -2n-1), quotient written in unary as q ZERO bits terminated by a
  ONE bit, then the parameter's low bits. Escape parameter (0b1111 /
  0b11111) switches the partition to raw fixed-width two's-complement
  residuals.
- Fixed predictors are the binomial-coefficient differencers
  (order k: e[n] = Δ^k x[n]); warm-up samples are stored verbatim at
  sample width.
- Frame header: 14-bit sync 0b11111111111110, blocking-strategy bit,
  4-bit block-size / sample-rate codes (this encoder always writes
  block size as the 16-bit end-of-header form, code 0b0111, and
  sample rate by reference to STREAMINFO, code 0b0000), channel
  assignment = channels-1 (independent), 3-bit sample-size code,
  UTF-8-coded frame number, CRC-8 (poly 0x07). Frame ends with
  zero-padding to a byte boundary and CRC-16 (poly 0x8005) over the
  whole frame.
"""

from __future__ import annotations

import numpy as np

_SYNC = 0b11111111111110
_SAMPLE_SIZE_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}
_SAMPLE_SIZE_FROM_CODE = {v: k for k, v in _SAMPLE_SIZE_CODES.items()}
_BLOCK_SIZE_DEFAULT = 4096


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            out = (out << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(e: np.ndarray) -> np.ndarray:
    e = e.astype(np.int64)
    return np.where(e >= 0, 2 * e, -2 * e - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coding of the frame number."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)):  # capacity: (7-nbytes) + 6*(nbytes-1)
        nbytes += 1
    lead = (0xFF << (8 - nbytes) & 0xFF) | (n >> (6 * (nbytes - 1)))
    out.append(lead & 0xFF)
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("FLAC: malformed UTF-8 frame number")
    n = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        cont = br.read(8)
        if (cont & 0xC0) != 0x80:
            raise ValueError("FLAC: malformed UTF-8 continuation")
        n = (n << 6) | (cont & 0x3F)
    return n


_FIXED_COEFFS = {  # prediction p[n] from previous samples for order k
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    e = x.astype(np.int64)
    for _ in range(order):
        e = np.diff(e)
    return e


def _best_fixed_order(x: np.ndarray) -> int:
    best, best_cost = 0, None
    for k in range(0, 5):
        if len(x) <= k:
            break
        cost = int(np.abs(_fixed_residual(x, k)).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = k, cost
    return best


def _rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = max(1.0, float(np.abs(res.astype(np.int64)).mean()) * 2.0)
    p = int(np.floor(np.log2(mean)))
    return min(max(p, 0), 14)


def encode_flac(samples: np.ndarray, sample_rate: int = 16000,
                bits_per_sample: int = 16,
                block_size: int = _BLOCK_SIZE_DEFAULT) -> bytes:
    """Encode (n,) mono or (n, ch) int arrays (independent channels).
    Subframe per channel: constant when flat, else best fixed
    predictor with single-partition Rice residuals."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if not 1 <= ch <= 2:
        raise ValueError("1 or 2 channels only")
    if bits_per_sample not in _SAMPLE_SIZE_CODES:
        raise ValueError(f"unsupported bits_per_sample {bits_per_sample}")
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if x.size and (x.min() < lo or x.max() > hi):
        raise ValueError("samples out of range for bits_per_sample")

    out = bytearray(b"fLaC")
    # STREAMINFO: last-metadata flag + type 0, 34-byte body
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    si.align()
    body = si.bytes() + b"\x00" * 16  # md5 unset (all zero = unknown)
    out.append(0x80)  # last-metadata-block, type 0 (STREAMINFO)
    out.extend(len(body).to_bytes(3, "big"))
    out.extend(body)

    for fno, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(_SYNC, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(0b0111, 4)  # block size: 16-bit at end of header
        bw.write(0b0000, 4)  # sample rate: from STREAMINFO
        bw.write(ch - 1, 4)  # independent channels
        bw.write(_SAMPLE_SIZE_CODES[bits_per_sample], 3)
        bw.write(0, 1)  # reserved
        bw.align()
        hdr = bw.bytes() + _utf8_number(fno) + (bs - 1).to_bytes(2, "big")
        hdr += bytes([_crc8(hdr)])
        fw = _BitWriter()
        for c in range(ch):
            sub = blk[:, c]
            fw.write(0, 1)  # zero pad bit
            if bs and (sub == sub[0]).all():
                fw.write(0, 6)  # constant
                fw.write(0, 1)  # no wasted bits
                fw.write(int(sub[0]), bits_per_sample)
                continue
            order = _best_fixed_order(sub)
            fw.write(0b001000 | order, 6)  # fixed, order k
            fw.write(0, 1)  # no wasted bits
            for w in sub[:order]:  # warm-up, verbatim
                fw.write(int(w), bits_per_sample)
            res = _fixed_residual(sub, order)
            fw.write(0, 2)  # residual method 0: 4-bit rice params
            fw.write(0, 4)  # partition order 0 -> one partition
            p = _rice_param(res)
            fw.write(p, 4)
            for u in _zigzag(res):
                u = int(u)
                fw.write_unary(u >> p)
                fw.write(u, p)
        fw.align()
        frame = hdr + fw.bytes()
        out.extend(frame)
        out.extend(_crc16(frame).to_bytes(2, "big"))
    return bytes(out)


def decode_flac(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode to ((n,) or (n, ch) int32 samples, sample_rate,
    bits_per_sample). CRCs verified; truncation/corruption raises."""
    data = bytes(data)
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream: bad marker")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("FLAC metadata block overruns stream")
        if btype == 0:
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, ch, bps, total)
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, ch, bps, total = info
    chans: list[list[int]] = [[] for _ in range(ch)]
    while pos < len(data):
        frame_start = pos
        br = _BitReader(data, pos)
        if br.read(14) != _SYNC:
            raise ValueError("FLAC: lost frame sync")
        br.read(1)
        br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        if ch_code >= 8:
            raise ValueError("FLAC: mid/side stereo not supported")
        if ch_code + 1 != ch:
            raise ValueError("FLAC: frame channel count != STREAMINFO")
        _read_utf8_number(br)
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError(f"FLAC: reserved block size code {bs_code}")
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        elif sr_code == 0b1111:
            raise ValueError("FLAC: invalid sample rate code")
        sbps = _SAMPLE_SIZE_FROM_CODE.get(ss_code, bps) if ss_code else bps
        br.align()
        hdr_end = br.byte
        if _crc8(data[frame_start:hdr_end]) != br.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        for c in range(ch):
            if br.read(1) != 0:
                raise ValueError("FLAC: subframe pad bit set")
            stype = br.read(6)
            wasted = 0
            if br.read(1):  # wasted-bits flag: unary count-1 follows
                wasted = br.read_unary() + 1
            width = sbps - wasted
            if stype == 0:  # constant
                v = br.read(width)
                v -= (v >> (width - 1)) << width  # sign extend
                chans[c].extend([v << wasted] * bs)
                continue
            if stype == 1:  # verbatim
                vals = []
                for _ in range(bs):
                    v = br.read(width)
                    v -= (v >> (width - 1)) << width
                    vals.append(v << wasted)
                chans[c].extend(vals)
                continue
            if not (0b001000 <= stype <= 0b001100):
                raise ValueError(f"FLAC: unsupported subframe type {stype:#08b}")
            order = stype - 0b001000
            warm = []
            for _ in range(order):
                v = br.read(width)
                v -= (v >> (width - 1)) << width
                warm.append(v)
            method = br.read(2)
            if method > 1:
                raise ValueError("FLAC: reserved residual method")
            pbits = 4 if method == 0 else 5
            escape = (1 << pbits) - 1
            porder = br.read(4)
            nparts = 1 << porder
            res: list[int] = []
            for part in range(nparts):
                cnt = (bs >> porder) - (order if part == 0 else 0)
                if cnt < 0:
                    raise ValueError("FLAC: partition smaller than order")
                p = br.read(pbits)
                if p == escape:
                    raw = br.read(5)
                    for _ in range(cnt):
                        v = br.read(raw) if raw else 0
                        if raw:
                            v -= (v >> (raw - 1)) << raw
                        res.append(v)
                else:
                    for _ in range(cnt):
                        q = br.read_unary()
                        u = (q << p) | (br.read(p) if p else 0)
                        res.append(_unzigzag(u))
            vals = list(warm)
            coef = _FIXED_COEFFS[order]
            for e in res:
                pred = sum(coef[i] * vals[-1 - i] for i in range(order))
                vals.append(e + pred)
            chans[c].extend((v << wasted) for v in vals)
        br.align()
        crc = int.from_bytes(data[br.byte : br.byte + 2], "big")
        if _crc16(data[frame_start : br.byte]) != crc:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = br.byte + 2
    arr = np.array(chans, dtype=np.int32).T
    if total and arr.shape[0] != total:
        raise ValueError(f"FLAC: decoded {arr.shape[0]} of {total} samples")
    return (arr[:, 0] if ch == 1 else arr), rate, bps
