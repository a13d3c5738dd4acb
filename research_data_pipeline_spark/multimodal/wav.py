"""Minimal stdlib WAV (PCM) codec — the audio counterpart of png.py.

The container ships no audio library (librosa/soundfile), but WAV's PCM
payload is raw samples behind a RIFF header, fully decodable with the
stdlib ``wave`` module — so, like PNG for images, real audio decode can
be a LIVE tested branch rather than a gate. Compressed formats (MP3,
AAC, FLAC) still require a codec library and keep the loud
``require_codec`` gate in ops.py.

Scope: PCM integer WAV, 8/16/32-bit, any channel count / sample rate.
"""

from __future__ import annotations

import io
import wave

import numpy as np

_DTYPES = {1: np.uint8, 2: np.int16, 4: np.int32}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV byte string → (samples, sample_rate).

    ``samples`` has shape (n_frames,) for mono, (n_frames, n_channels)
    otherwise; dtype follows the container width (u8 / i16 / i32).
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        width = w.getsampwidth()
        if width not in _DTYPES:
            raise ValueError(f"unsupported PCM sample width {width}")
        n, ch, rate = w.getnframes(), w.getnchannels(), w.getframerate()
        raw = w.readframes(n)
    arr = np.frombuffer(raw, dtype=_DTYPES[width])
    if ch > 1:
        arr = arr.reshape(-1, ch)
    return arr, rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode integer PCM samples — (n,) mono or (n, ch) — as a WAV byte
    string any audio tool also accepts."""
    samples = np.asarray(samples)
    if samples.dtype not in (np.uint8, np.int16, np.int32):
        raise ValueError(f"unsupported dtype {samples.dtype}")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(samples.dtype.itemsize)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()
