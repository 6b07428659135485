"""Pure-stdlib FLAC codec (operators/flac.py) and the real
compressed-audio decode path built on it: bit-exact round-trips across
waveform shapes / channel counts / frame boundaries, real compression
on smooth signals, UTF-8 frame-number coding, CRC-enforced corruption
detection, and the registered query's closed-form contract."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_event_streaming_pipeline_spark.operators.flac import (
    _BitReader,
    _read_utf8_number,
    _utf8_number,
    decode_flac,
    encode_flac,
)


def _roundtrip(x, ch=1, **kw):
    data = x if ch == 1 else np.stack([x, -(x // 2)], axis=1)
    dec, rate, bps = decode_flac(encode_flac(data, **kw))
    assert (dec.astype(np.int64) == data).all()
    return rate, bps


@pytest.mark.parametrize("n", [1, 2, 7, 199, 200, 201, 512, 5000])
@pytest.mark.parametrize("ch", [1, 2])
def test_roundtrip_shapes(n, ch):
    rng = np.random.default_rng(n * 10 + ch)
    for wave in (
        rng.integers(-32768, 32768, n).astype(np.int64),        # incompressible
        (np.arange(n) * 37 % 4000 - 2000).astype(np.int64),     # ramp (order 1-2)
        np.full(n, -123, dtype=np.int64),                        # constant subframe
        (3000 * np.sin(np.arange(n) / 7)).astype(np.int64),      # smooth (order 3-4)
    ):
        rate, bps = _roundtrip(wave, ch, block_size=200)
        assert (rate, bps) == (16000, 16)


def test_roundtrip_8bit_and_empty():
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, 300).astype(np.int64)
    dec, rate, bps = decode_flac(encode_flac(x, 8000, 8))
    assert (dec == x).all() and (rate, bps) == (8000, 8)
    dec, _, _ = decode_flac(encode_flac(np.zeros(0, np.int64)))
    assert dec.shape == (0,)


def test_actually_compresses():
    """A smooth waveform must come out much smaller than raw PCM —
    otherwise the 'codec' is a container, not compression."""
    smooth = (1000 * np.sin(np.arange(20000) / 50)).astype(np.int64)
    blob = encode_flac(smooth)
    assert len(blob) < 0.25 * (2 * len(smooth))
    dec, _, _ = decode_flac(blob)
    assert (dec == smooth).all()


def test_utf8_frame_number_coding():
    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 123456, 2**20):
        assert _read_utf8_number(_BitReader(_utf8_number(n))) == n


def test_corruption_detected():
    rng = np.random.default_rng(3)
    good = encode_flac(rng.integers(-1000, 1000, 600).astype(np.int64))
    with pytest.raises(ValueError):
        decode_flac(b"fLaX" + good[4:])  # bad marker
    with pytest.raises(ValueError):
        decode_flac(good[:-1])  # truncated mid-frame
    with pytest.raises(ValueError):
        decode_flac(good[:30])  # truncated metadata
    bad = bytearray(good)
    bad[60] ^= 0x40  # bit flip inside a frame
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))


def test_out_of_range_samples_rejected():
    with pytest.raises(ValueError):
        encode_flac(np.array([40000], dtype=np.int64), bits_per_sample=16)


@given(
    n=st.integers(1, 600),
    seed=st.integers(0, 2**31),
    block=st.sampled_from([64, 200, 4096]),
    ch=st.integers(1, 2),
)
@settings(max_examples=25, deadline=None)
def test_roundtrip_property(n, seed, block, ch):
    rng = np.random.default_rng(seed)
    x = rng.integers(-2000, 2000, n).astype(np.int64).cumsum() % 30000 - 15000
    _roundtrip(x.astype(np.int64), ch, block_size=block)


def test_flac_decode_metrics_matches_formula(spark, sf_small):
    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.operators.multimodal import (
        FLAC_SAMPLES,
        flac_decode_metrics,
    )

    docs = load(spark, sf_small, "documents").limit(50)
    got = {r.doc_id: r for r in flac_decode_metrics(docs).collect()}
    assert len(got) == 50
    i = np.arange(FLAC_SAMPLES, dtype=np.int64)
    for d, r in got.items():
        wave = (d * 29 + i * 7) % 4000 - 2000
        assert (r.n_samples, r.sample_rate, r.bits_per_sample) == (512, 16000, 16)
        assert r.first_sample == int(wave[0])
        assert r.abs_sum == int(np.abs(wave).sum())
