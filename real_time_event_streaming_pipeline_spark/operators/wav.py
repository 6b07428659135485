"""Pure-stdlib WAV (RIFF/PCM) codec — real audio decode with zero
external dependencies, the audio sibling of operators/png.py:
16-bit signed PCM, mono or stereo, explicit RIFF chunk walking (so
malformed containers fail loudly instead of mis-parsing).

Backs the real audio path in operators/multimodal.py
(synth_wav_audio / wav_decode_metrics): synthetic waveforms with
closed-form sample content are encoded to genuine WAV bytes, decoded
back, and reduced to integer metrics a SQL oracle recomputes from the
formula — a green driver row proves the container parse + PCM
reconstruction sample-for-sample.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode an (n,) mono or (n, 2) stereo int16 array as RIFF/PCM."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        channels = 1
    elif samples.ndim == 2 and samples.shape[1] == 2:
        channels = 2
    else:
        raise ValueError(f"unsupported sample shape {samples.shape}")
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/PCM bytes to (samples, sample_rate); samples come
    back as (n,) int16 for mono, (n, 2) for stereo."""
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len != len(data) - 8:
        raise ValueError("WAV length field mismatch")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = bytes(data[pos : pos + 4])
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = bytes(data[pos + 8 : pos + 8 + length])
        if len(body) != length:
            raise ValueError(f"WAV chunk {tag!r} truncated")
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    if channels not in (1, 2):
        raise ValueError(f"unsupported channel count {channels}")
    samples = np.frombuffer(pcm, dtype="<i2")
    return (samples if channels == 1 else samples.reshape(-1, 2)), sample_rate
