"""Pure-stdlib WAV codec + spectral featurizer — the real audio kernel
for the multimodal stage in environments without torchaudio/librosa.

``decode_wav`` reads RIFF/WAVE PCM (the public Microsoft/IBM RIFF spec,
as exposed by the stdlib ``wave`` module): 8-bit unsigned, 16/32-bit
signed, and 24-bit packed little-endian samples, any channel count
(mixed down to mono by mean).  Everything else (compressed codecs,
float WAV) raises ``NotImplementedError`` — the caller's injectable
surface falls back to a real audio lib or the deterministic fake.

``band_energies`` is the real feature kernel: one ``numpy.fft.rfft``
power spectrum split into ``n_bands`` equal-width bands up to Nyquist,
log10-compressed — the classic filter-bank energy front end (public
textbook DSP), deterministic and vectorized.

``encode_wav`` exists for the pytest oracle: it writes valid PCM WAVs at
caller-chosen sample width so decode is round-trip-tested sample-exact
at every width.

Scale note: this is per-clip work inside an actor-pool ``map_batches``
stage — bounded by the decoded clip length, never by the corpus; the
FFT is O(n log n) on the clip.
"""

from __future__ import annotations

import io
import wave

import numpy as np

__all__ = ["is_wav", "decode_wav", "encode_wav", "band_energies",
           "stdlib_wav_featurizer"]


def is_wav(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" \
        and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV byte string → (mono float64 samples in [-1, 1],
    sample_rate).

    Multi-channel input is mixed down by per-frame mean.  Raises
    ``ValueError`` on malformed input, ``NotImplementedError`` on
    non-PCM encodings (the ``wave`` module rejects those)."""
    if not is_wav(payload):
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            rate = wf.getframerate()
            nframes = wf.getnframes()
            raw = wf.readframes(nframes)
    except wave.Error as e:  # compressed / malformed header
        raise NotImplementedError(f"non-PCM or malformed WAV: {e}") from e
    if width == 1:                                      # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:                                    # signed 16-bit LE
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 3:                                    # packed 24-bit LE
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        v = (b[:, 0].astype(np.int32)
             | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        v = np.where(v >= 1 << 23, v - (1 << 24), v)    # sign extend
        x = v.astype(np.float64) / float(1 << 23)
    elif width == 4:                                    # signed 32-bit LE
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) \
            / float(1 << 31)
    else:
        raise NotImplementedError(f"WAV sample width {width}")
    if nch > 1:
        n = (len(x) // nch) * nch
        x = x[:n].reshape(-1, nch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int, sampwidth: int = 2,
               channels: int = 1) -> bytes:
    """Encode float samples in [-1, 1] → PCM WAV bytes (oracle encoder).

    ``samples``: 1-D mono, or (n, channels).  Quantization matches the
    decode scaling exactly, so encode→decode is sample-exact for values
    on the quantization grid."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1 and channels > 1:
        x = np.repeat(x[:, None], channels, axis=1)
    x = np.clip(x, -1.0, 1.0).reshape(-1)
    if sampwidth == 1:
        raw = (np.round(x * 128.0) + 128.0).clip(0, 255) \
            .astype(np.uint8).tobytes()
    elif sampwidth == 2:
        raw = np.round(x * 32768.0).clip(-32768, 32767) \
            .astype("<i2").tobytes()
    elif sampwidth == 3:
        v = np.round(x * float(1 << 23)).clip(-(1 << 23), (1 << 23) - 1) \
            .astype(np.int32)
        v = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
        b = np.empty((len(v), 3), dtype=np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        raw = b.tobytes()
    elif sampwidth == 4:
        raw = np.round(x * float(1 << 31)) \
            .clip(-(1 << 31), (1 << 31) - 1).astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported sample width {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(rate)
        wf.writeframes(raw)
    return buf.getvalue()


def band_energies(samples: np.ndarray, n_bands: int = 16,
                  eps: float = 1e-12) -> np.ndarray:
    """Filter-bank log-energies: rfft power spectrum split into
    ``n_bands`` equal-width bands over [0, Nyquist], log10-compressed.
    Deterministic, fully vectorized, length-normalized (so the feature
    is comparable across clip durations)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.size == 0:
        return np.full(n_bands, np.log10(eps))
    spec = np.abs(np.fft.rfft(x)) ** 2 / x.size
    # drop the DC bin so silence/offset doesn't dominate band 0
    spec = spec[1:] if spec.size > 1 else spec
    edges = np.linspace(0, spec.size, n_bands + 1).astype(np.int64)
    sums = np.add.reduceat(np.concatenate([spec, [0.0]]),
                           np.minimum(edges[:-1], spec.size))
    # reduceat segments past the end read the sentinel 0
    out = np.where(edges[:-1] < edges[1:], sums, 0.0)[:n_bands]
    return np.log10(out + eps)


def stdlib_wav_featurizer(payload: bytes, n_bands: int) -> np.ndarray:
    """Drop-in for ``AudioFeaturizer``'s injectable surface: real decode
    + filter-bank energies for WAV payloads (pure stdlib), ``ValueError``
    for other formats so the caller can fall back."""
    samples, _rate = decode_wav(payload)
    return band_energies(samples, n_bands)
