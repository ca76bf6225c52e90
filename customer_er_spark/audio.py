"""WAV (RIFF PCM) codec — pure stdlib (`wave`) + numpy, no external libs.

The one real audio format in the container (mp3/mp4/webm stay honestly
stubbed in operators/multimodal.py): integer PCM, 8/16/32-bit, any channel
count.  Decode returns (samples[int32, shape (n_frames, channels)], rate);
encode is the exact inverse for 16-bit (the canonical interchange width),
so roundtrips are bit-exact — the audio analog of the lossless-image
invariant in operators/verify.check_decode_invariant.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """bytes -> (samples int32 (n_frames, channels), sample_rate).

    8-bit WAV is unsigned per RIFF spec (rescaled to signed), 16/32-bit are
    little-endian signed.  Malformed containers raise wave.Error/ValueError
    — callers (audio_meta) catch per row, poison-safe."""
    with wave.open(io.BytesIO(data), "rb") as w:
        n, ch = w.getnframes(), w.getnchannels()
        width, rate = w.getsampwidth(), w.getframerate()
        raw = w.readframes(n)
    if width == 1:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    elif width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif width == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported PCM sample width {width} bytes")
    if ch <= 0 or len(arr) % ch:
        raise ValueError(f"frame misalignment: {len(arr)} samples, {ch} ch")
    return arr.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_frames, channels) int16-range samples -> 16-bit PCM WAV bytes.
    Deterministic; decode_wav(encode_wav(x)) == x exactly."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"expected (n_frames, channels), got shape {s.shape}")
    if np.any(s < -32768) or np.any(s > 32767):
        raise ValueError("samples out of int16 range")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s.astype("<i2").tobytes())
    return buf.getvalue()
