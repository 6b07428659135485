"""Pure-stdlib baseline JPEG codec (operators/jpeg.py) and the real
multimodal decode path built on it: bit-exact round-trips on the
constant-block/quality-100 operating point (the oracle fixture),
spec-derived error bounds on the genuinely lossy paths (which
exercise the AC Huffman coder), structural checks on the emitted JFIF
stream, loud failure on corruption and unsupported profiles, and the
cross-codec JPEG→PNG transcode."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from real_time_event_streaming_pipeline_spark.operators.jpeg import (
    _AC_BITS,
    _AC_VALS,
    _DC_BITS,
    _DC_VALS,
    _build_codes,
    decode_jpeg,
    encode_jpeg,
    scaled_quant_table,
)


def _const_block_img(seed: int, nb: int = 2) -> np.ndarray:
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, (nb, nb))
    return np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


def test_constant_blocks_bit_exact_at_q100():
    """The oracle operating point: all-ones quant table + DC-only
    blocks ⇒ the full lossy pipeline is the identity."""
    for seed in range(8):
        img = _const_block_img(seed)
        dec = decode_jpeg(encode_jpeg(img, quality=100))
        assert dec.shape == img.shape
        assert (dec == img).all()


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (24, 40), (10, 13), (1, 1), (9, 8)])
def test_lossy_roundtrip_error_bound(shape):
    """Random images through the REAL lossy path (nonzero AC
    coefficients, ZRL/EOB symbols live). Error bound: each dequantized
    coefficient is off by at most q/2, and the IDCT rows/cols are
    orthonormal up to the 1/4 scaling, so per-pixel error is bounded
    by (1/8)·Σ(q_uv/2) over the 64 coefficients — loose but
    spec-derived; quality 95 keeps it tight."""
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    qt = scaled_quant_table(95).astype(np.float64)
    bound = np.ceil((qt / 2).sum() / 8.0)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
    assert err <= bound


def test_smooth_gradient_near_exact_at_q100():
    x = np.arange(32)
    img = ((x[:, None] + x[None, :]) * 3 % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(dec.astype(np.int64) - img.astype(np.int64)).max() <= 1


def test_quality_monotone_and_annexk_at_50():
    assert (scaled_quant_table(100) == 1).all()
    t50 = scaled_quant_table(50)
    assert t50[0] == 16 and t50[63] == 99  # Annex K verbatim at Q=50
    e_lo = len(encode_jpeg(_rand_img(), quality=10))
    e_hi = len(encode_jpeg(_rand_img(), quality=95))
    assert e_lo < e_hi  # coarser quantization compresses harder


def _rand_img() -> np.ndarray:
    return np.random.default_rng(3).integers(0, 256, (32, 32), dtype=np.uint8)


def test_jfif_stream_structure():
    """The emitted bytes are a real JFIF stream: SOI/APP0/DQT/SOF0/
    DHT/SOS/EOI markers in order, Huffman specs are the T.81 Annex K
    standard tables, and every 0xFF inside entropy data is stuffed."""
    data = encode_jpeg(_rand_img(), quality=75)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    markers = []
    pos = 2
    while pos < len(data) - 2:
        assert data[pos] == 0xFF
        m = struct.unpack(">H", data[pos : pos + 2])[0]
        markers.append(m)
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if m == 0xFFDA:
            body = data[pos + 4 : pos + 2 + ln]
            assert body[0] == 1  # one component
            entropy = data[pos + 2 + ln : -2]
            i = 0
            while i < len(entropy):
                if entropy[i] == 0xFF:
                    assert entropy[i + 1] == 0x00  # stuffed
                    i += 1
                i += 1
            break
        if m == 0xFFC4:
            body = data[pos + 4 : pos + 2 + ln]
            assert list(body[1:17]) == _DC_BITS
            assert list(body[17 : 17 + 12]) == _DC_VALS
            off = 17 + 12
            assert body[off] == 0x10
            assert list(body[off + 1 : off + 17]) == _AC_BITS
            assert list(body[off + 17 :]) == _AC_VALS
        pos += 2 + ln
    assert markers == [0xFFE0, 0xFFDB, 0xFFC0, 0xFFC4, 0xFFDA]


def test_dc_huffman_bits_match_spec_for_known_block():
    """Semi-independent entropy-coder check: a single 8×8 constant
    block at q100 has exactly one DC diff and an EOB; the expected
    bitstream is derivable from the spec tables alone (category =
    bit_length, canonical code from BITS/HUFFVAL), without running
    the encoder's own bit plumbing."""
    c = 200  # DC diff = 8*(200-128) = 576, category 10
    img = np.full((8, 8), c, dtype=np.uint8)
    data = encode_jpeg(img, quality=100)
    sos = data.index(b"\xff\xda")
    (ln,) = struct.unpack(">H", data[sos + 2 : sos + 4])
    entropy = data[sos + 2 + ln : -2]
    bits = "".join(f"{b:08b}" for b in entropy)

    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_codes = _build_codes(_AC_BITS, _AC_VALS)
    diff = 8 * (c - 128)
    s = diff.bit_length()
    code, code_len = dc_codes[s]
    eob, eob_len = ac_codes[0x00]
    want = (
        format(code, f"0{code_len}b")
        + format(diff, f"0{s}b")
        + format(eob, f"0{eob_len}b")
    )
    assert bits.startswith(want)
    # remainder is 1-bit padding to a byte boundary
    rest = bits[len(want) :]
    assert len(rest) < 8 and rest == "1" * len(rest)


def test_corruption_and_unsupported_profiles_raise():
    img = _const_block_img(1)
    good = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])  # truncated
    prog = bytearray(good)
    sof = bytes(prog).index(b"\xff\xc0")
    prog[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(prog))
    # flipping an entropy byte must not silently pass: either a
    # Huffman/marker error or a changed image
    flip = bytearray(good)
    flip[-10] ^= 0x55
    try:
        changed = decode_jpeg(bytes(flip))
        assert not (changed == img).all()
    except ValueError:
        pass


def test_jpeg_decode_metrics_matches_formula(spark, sf_small):
    """The registered query's contract, locally: decoding the real
    baseline-JFIF bytes reproduces the closed-form pixel content for
    every doc (llm_multimodal_jpeg ↔ _MULTIMODAL_JPEG_SQL)."""
    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.operators import multimodal as M

    docs = load(spark, sf_small, "documents").limit(40)
    rows = M.jpeg_decode_metrics(docs).collect()
    assert len(rows) == 40
    for r in rows:
        d = r.doc_id
        vals = [(d * 11 + by * 2 + bx) % 256 for by in range(2) for bx in range(2)]
        px = [vals[(i // 16) // 8 * 2 + (i % 16) // 8] for i in range(256)]
        assert (r.width, r.height) == (16, 16)
        assert r.top_left == px[0]
        assert r.weighted_sum == sum((i + 1) * v for i, v in enumerate(px))


def test_jpeg_to_png_transcode_roundtrip(spark, sf_small):
    """Cross-codec agreement: JPEG decode -> PNG encode produces valid
    PNGs whose pixels equal the closed-form fixture content."""
    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.operators import multimodal as M
    from real_time_event_streaming_pipeline_spark.operators.png import decode_png

    docs = load(spark, sf_small, "documents").limit(10)
    rows = M.jpeg_transcode_to_png(docs).collect()
    assert len(rows) == 10
    for r in rows:
        arr = decode_png(bytes(r.payload))
        assert arr.shape == (16, 16)
        d = r.doc_id
        for by in range(2):
            for bx in range(2):
                want = (d * 11 + by * 2 + bx) % 256
                block = arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                assert (block == want).all()


def test_transcode_reports_decoded_dims(spark, sf_small):
    """A non-default `side` must flow through to the reported
    width/height — the metadata comes from the DECODED pixel array,
    not the module default (a consumer trusting the schema would
    otherwise act on 16x16 for an 8x8 payload)."""
    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.operators import multimodal as M

    docs = load(spark, sf_small, "documents").limit(4)
    rows = M.jpeg_transcode_to_png(docs, side=8).collect()
    assert rows and all(r.width == 8 and r.height == 8 for r in rows)
