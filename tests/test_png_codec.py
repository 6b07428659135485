"""Pure-stdlib PNG codec (operators/png.py) and the real multimodal
decode path built on it: byte-exact round-trips across every shape and
scanline filter, loud failure on corruption, and the resize pipeline
producing valid PNGs whose pixels match the numpy resize."""

from __future__ import annotations

import numpy as np
import pytest

from real_time_event_streaming_pipeline_spark.operators.png import (
    decode_png,
    decode_png_batch,
    encode_png,
    encode_png_batch,
    resize_nearest,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(16, 16), (7, 5), (16, 16, 3), (9, 13, 4), (1, 1), (2, 3, 3)]
)
def test_roundtrip_every_shape_and_filter(shape, filter_type):
    rng = np.random.default_rng(sum(shape) * 10 + filter_type)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec = decode_png(encode_png(arr, filter_type))
    assert dec.shape == arr.shape
    assert (dec == arr).all()


@pytest.mark.parametrize("shape", [(16, 16), (9, 13, 3), (7, 5, 4)])
def test_batch_codec_matches_per_image(shape):
    """r12 verdict #3: the batch codec twins must be BYTE/PIXEL
    identical to the scalar ones for every filter type, mixed within
    one batch — the bitwise llm_image_dedup_pairs oracle rides on
    this."""
    rng = np.random.default_rng(sum(shape))
    n = 23
    arrs = rng.integers(0, 256, size=(n, *shape), dtype=np.uint8)
    fts = np.arange(n) % 5
    pngs = encode_png_batch(arrs, fts)
    for i in range(n):
        assert pngs[i] == encode_png(arrs[i], int(fts[i]))
    dec = decode_png_batch(pngs)
    for i in range(n):
        assert (dec[i] == arrs[i]).all()
        assert (decode_png(pngs[i]) == arrs[i]).all()


def test_batch_codec_rejects_bad_input():
    a = np.zeros((2, 8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="filter_types"):
        encode_png_batch(a, [0, 9])
    small = encode_png(np.zeros((4, 4), dtype=np.uint8))
    big = encode_png(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="same-shape"):
        decode_png_batch([small, big])
    with pytest.raises(ValueError, match="empty"):
        decode_png_batch([])


def test_corruption_detected():
    arr = np.arange(256, dtype=np.uint8).reshape(16, 16)
    good = bytearray(encode_png(arr, 2))
    good[30] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")


def test_resize_nearest_semantics():
    arr = np.arange(256, dtype=np.uint8).reshape(16, 16)
    small = resize_nearest(arr, 8, 8)
    assert small.shape == (8, 8)
    # nearest-neighbor picks source index (i*16)//8 = 2i
    assert (small == arr[::2, ::2]).all()


def test_png_decode_metrics_matches_formula(spark, sf_small):
    """The registered query's contract, locally: decoding the real PNG
    bytes reproduces the closed-form pixel content for every doc."""
    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.operators.multimodal import (
        png_decode_metrics,
    )

    docs = load(spark, sf_small, "documents").limit(50)
    got = {r.doc_id: r for r in png_decode_metrics(docs).collect()}
    assert len(got) == 50
    i = np.arange(256, dtype=np.int64)
    for d, r in got.items():
        pix = (d * 7 + i) % 256
        assert (r.width, r.height, r.channels) == (16, 16, 1)
        assert r.top_left == int(pix[0])
        assert r.weighted_sum == int(((i + 1) * pix).sum())


def test_resize_png_pipeline(spark, sf_small):
    """REAL resize at the mapInPandas seam: outputs are valid PNGs and
    their pixels equal nearest-neighbor of the synthetic source."""
    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.operators.multimodal import (
        resize_png,
    )

    docs = load(spark, sf_small, "documents").limit(10)
    rows = resize_png(docs, width=8, height=8).collect()
    assert len(rows) == 10
    i = np.arange(256, dtype=np.int64)
    for r in rows:
        assert (r.width, r.height) == (8, 8)
        arr = decode_png(bytes(r.payload))
        src = ((r.doc_id * 7 + i) % 256).astype(np.uint8).reshape(16, 16)
        assert (arr == resize_nearest(src, 8, 8)).all()


# ---------------------------------------------------------------------------
# WAV codec (operators/wav.py)
# ---------------------------------------------------------------------------


def test_wav_roundtrip_mono_stereo():
    from real_time_event_streaming_pipeline_spark.operators.wav import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, size=300, dtype=np.int16)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and (s == mono).all()
    stereo = rng.integers(-32768, 32768, size=(200, 2), dtype=np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (200, 2) and (s2 == stereo).all()


def test_wav_malformed_detected():
    from real_time_event_streaming_pipeline_spark.operators.wav import (
        decode_wav,
        encode_wav,
    )

    good = bytearray(encode_wav(np.zeros(16, dtype=np.int16)))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope" + bytes(good[4:]))
    truncated = bytes(good[:-10])
    with pytest.raises(ValueError):
        decode_wav(truncated)


def test_wav_decode_metrics_matches_formula(spark, sf_small):
    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.operators.multimodal import (
        wav_decode_metrics,
    )

    docs = load(spark, sf_small, "documents").limit(40)
    got = {r.doc_id: r for r in wav_decode_metrics(docs).collect()}
    assert len(got) == 40
    i = np.arange(512, dtype=np.int64)
    for d, r in got.items():
        s = (d * 13 + i * 257) % 65536 - 32768
        assert (r.n_samples, r.sample_rate) == (512, 16000)
        assert r.first_sample == int(s[0])
        assert r.abs_sum == int(np.abs(s).sum())


# ---------------------------------------------------------------- AVI


def test_avi_roundtrip_shapes_and_padding():
    """Byte-exact round-trips including widths whose DIB row stride is
    padded (w*3 % 4 != 0) and unpadded, multi- and single-frame."""
    from real_time_event_streaming_pipeline_spark.operators.avi import (
        decode_avi,
        encode_avi,
    )

    for shape, fps in [((12, 5, 6, 3), 10), ((1, 1, 1, 3), 30), ((3, 4, 8, 3), 24), ((5, 7, 3, 3), 15)]:
        rng = np.random.default_rng(sum(shape))
        frames = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out, got_fps = decode_avi(encode_avi(frames, fps))
        assert got_fps == fps
        assert out.shape == frames.shape
        assert (out == frames).all()


def test_avi_malformed_detected():
    from real_time_event_streaming_pipeline_spark.operators.avi import (
        decode_avi,
        encode_avi,
    )

    good = bytearray(encode_avi(np.zeros((2, 3, 4, 3), dtype=np.uint8), 10))
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi(b"nope" + bytes(good[4:]))
    with pytest.raises(ValueError):
        decode_avi(bytes(good[:-6]))  # truncated: length field mismatch
    # header/movi disagreement: claim 3 frames, ship 2
    bad = bytearray(good)
    # dwTotalFrames sits 16 bytes into the avih body; find it robustly
    at = bytes(good).index(b"avih") + 8 + 16
    bad[at : at + 4] = (3).to_bytes(4, "little")
    with pytest.raises(ValueError, match="frames"):
        decode_avi(bytes(bad))


def test_avi_frame_metrics_matches_formula(spark, sf_small):
    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.operators.multimodal import (
        avi_frame_metrics,
    )

    docs = load(spark, sf_small, "documents").limit(25)
    rows = avi_frame_metrics(docs).collect()
    assert len(rows) == 25 * 4  # every 3rd of 12 frames
    i = np.arange(90, dtype=np.int64)
    for r in rows:
        px = (r.doc_id * 11 + r.frame_idx * 31 + i) % 256
        assert (r.width, r.height, r.n_frames, r.fps) == (6, 5, 12, 10)
        assert r.frame_idx in (0, 3, 6, 9)
        assert r.first_px == int(px[0])
        assert r.weighted_sum == int(((i + 1) * px).sum())


def test_avi_top_down_dib_decodes_unmirrored():
    """Spec-valid top-down AVIs (negative biHeight) must decode with
    rows in the right order, not silently mirrored."""
    import struct

    from real_time_event_streaming_pipeline_spark.operators.avi import (
        _row_stride,
        decode_avi,
        encode_avi,
    )

    h, w = 4, 3
    frames = np.arange(2 * h * w * 3, dtype=np.uint8).reshape(2, h, w, 3)
    data = bytearray(encode_avi(frames, 10))
    # flip biHeight (strf body: biSize(4) biWidth(4) then biHeight)
    at = bytes(data).index(b"strf") + 8 + 8
    data[at : at + 4] = struct.pack("<i", -h)
    # rewrite each 00db chunk's rows from bottom-up to top-down order
    # (idx1 entries also contain the fourcc, but their length field is
    # the flags word, filtered out by the exact-frame-size guard)
    stride = _row_stride(w)
    fsize = stride * h
    pos = 0
    while True:
        pos = bytes(data).find(b"00db", pos)
        if pos < 0:
            break
        (length,) = struct.unpack("<I", bytes(data[pos + 4 : pos + 8]))
        if length == fsize:
            body = bytes(data[pos + 8 : pos + 8 + length])
            rows = [body[i * stride : (i + 1) * stride] for i in range(h)]
            data[pos + 8 : pos + 8 + length] = b"".join(reversed(rows))
        pos += 4
    out, fps = decode_avi(bytes(data))
    assert fps == 10
    assert (out == frames).all()


def test_avi_extra_audio_stream_ignored():
    """A spec-valid multi-stream AVI (video strl first, audio strl
    second) must decode the video stream; before the per-strl header
    fix the walker kept the LAST strh/strf and rejected the file as
    'first AVI stream is not video' (ADVICE r4)."""
    import struct

    from real_time_event_streaming_pipeline_spark.operators.avi import (
        _chunk,
        _list,
        decode_avi,
        encode_avi,
    )

    h, w = 4, 3
    frames = np.arange(2 * h * w * 3, dtype=np.uint8).reshape(2, h, w, 3) % 251
    base = encode_avi(frames, 10)

    # splice an audio 'strl' after the video one and a '01wb' audio
    # chunk into movi, rebuilding the RIFF framing with the module's
    # own chunk helpers
    audio_strh = (
        b"auds"
        + b"\x00\x00\x00\x00"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 16, 32, 0, 2)
        + struct.pack("<4h", 0, 0, 0, 0)
    )
    # WAVEFORMATEX-ish blob; strf length for audio streams is format-
    # specific, the walker must not unpack it with the video layout
    audio_strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    audio_strl = _list(b"strl", _chunk(b"strh", audio_strh) + _chunk(b"strf", audio_strf))

    body = bytearray(base[12:])  # after RIFF header + 'AVI '
    hdrl_at = bytes(body).index(b"hdrl") - 8
    (hdrl_len,) = struct.unpack("<I", bytes(body[hdrl_at + 4 : hdrl_at + 8]))
    hdrl_end = hdrl_at + 8 + hdrl_len
    body[hdrl_end:hdrl_end] = b""  # no-op, keep indices obvious
    body[hdrl_at + 4 : hdrl_at + 8] = struct.pack("<I", hdrl_len + len(audio_strl))
    body[hdrl_end:hdrl_end] = audio_strl

    movi_at = bytes(body).index(b"movi") - 8
    (movi_len,) = struct.unpack("<I", bytes(body[movi_at + 4 : movi_at + 8]))
    movi_end = movi_at + 8 + movi_len
    audio_chunk = _chunk(b"01wb", b"\x01\x02\x03\x04")
    body[movi_at + 4 : movi_at + 8] = struct.pack("<I", movi_len + len(audio_chunk))
    body[movi_end:movi_end] = audio_chunk

    data = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + bytes(body)
    out, fps = decode_avi(data)
    assert fps == 10
    assert (out == frames).all()

    # and an AVI whose FIRST stream is audio still fails loudly
    swapped = bytearray(base[12:])
    # the video strl LIST chunk starts 8 bytes before its 'strl' fourcc
    v_strl_at = bytes(swapped).index(b"strl") - 8
    hdrl_at2 = bytes(swapped).index(b"hdrl") - 8
    (h_len,) = struct.unpack("<I", bytes(swapped[hdrl_at2 + 4 : hdrl_at2 + 8]))
    swapped[hdrl_at2 + 4 : hdrl_at2 + 8] = struct.pack("<I", h_len + len(audio_strl))
    swapped[v_strl_at:v_strl_at] = audio_strl
    data2 = b"RIFF" + struct.pack("<I", len(swapped) + 4) + b"AVI " + bytes(swapped)
    with pytest.raises(ValueError, match="not video"):
        decode_avi(data2)
