"""Sample-exact oracle for the pure-stdlib WAV codec (csvweb_ray.ops.wav)
and its wiring into the multimodal AudioFeaturizer stage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from csvweb_ray.ops.wav import (
    band_energies,
    decode_wav,
    encode_wav,
    is_wav,
    stdlib_wav_featurizer,
)


def _sine(freq=440.0, rate=8000, secs=1.0, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


@pytest.mark.parametrize("width", [1, 2, 3, 4])
def test_roundtrip_every_sample_width(width):
    src = _sine()
    payload = encode_wav(src, 8000, sampwidth=width)
    assert is_wav(payload)
    got, rate = decode_wav(payload)
    assert rate == 8000
    assert got.shape == src.shape
    # quantization grid: half a step at the encoded width
    step = {1: 1 / 128, 2: 1 / 32768, 3: 1 / (1 << 23), 4: 1 / (1 << 31)}
    assert np.abs(got - src).max() <= 0.5001 * step[width] + 1e-12


def test_roundtrip_exact_on_grid():
    """Values already on the int16 grid survive encode→decode bit-exact."""
    q = np.round(_sine() * 32768.0).clip(-32768, 32767) / 32768.0
    got, _ = decode_wav(encode_wav(q, 8000, sampwidth=2))
    assert np.array_equal(got, q)


def test_stereo_mixdown():
    src = _sine()
    stereo = np.stack([src, src], axis=1)
    got, _ = decode_wav(encode_wav(stereo, 8000, sampwidth=2, channels=2))
    assert got.shape == src.shape
    assert np.abs(got - src).max() < 1 / 32768 + 1e-12


def test_not_wav_and_non_pcm():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    assert not is_wav(b"RIFFxxxxJUNK")


def test_band_energies_peak_band():
    """A pure 440 Hz tone at 8 kHz (Nyquist 4 kHz, 16 bands of 250 Hz)
    must put its argmax energy in band 1 — checked against a direct
    numpy spectrum, not a pinned constant."""
    feats = band_energies(_sine(freq=440.0, rate=8000), n_bands=16)
    assert feats.shape == (16,)
    assert int(np.argmax(feats)) == 1                  # 250–500 Hz band
    # and a 2.1 kHz tone lands mid-band-8 (2000–2250 Hz)
    feats2 = band_energies(_sine(freq=2100.0, rate=8000), n_bands=16)
    assert int(np.argmax(feats2)) == 8


def test_band_energies_edge_cases():
    empty = band_energies(np.array([]), n_bands=4)
    assert empty.shape == (4,) and np.all(np.isfinite(empty))
    # more bands than spectrum bins: finite, no crash
    tiny = band_energies(np.array([0.1, -0.2, 0.3]), n_bands=8)
    assert tiny.shape == (8,) and np.all(np.isfinite(tiny))


def test_featurizer_matches_direct_computation():
    payload = encode_wav(_sine(), 8000, sampwidth=2)
    feats = stdlib_wav_featurizer(payload, 16)
    samples, _ = decode_wav(payload)
    assert np.array_equal(feats, band_energies(samples, 16))


def test_audio_featurizer_real_wav_path(ray_session):
    """The Ray actor-pool stage must route WAV payloads through the real
    codec (exact match to a driver-side computation) and non-WAV payloads
    through the deterministic stub."""
    import ray.data as rd

    from csvweb_ray.ops.multimodal import extract_audio_features

    wav1 = encode_wav(_sine(freq=440.0), 8000)
    wav2 = encode_wav(_sine(freq=2000.0), 8000)
    tbl = pa.table({
        "media_id": pa.array([1, 2, 3], type=pa.int64()),
        "payload": pa.array([wav1, wav2, b"not-audio"], type=pa.binary()),
    })
    out = (extract_audio_features(rd.from_arrow(tbl), n_bands=16,
                                  concurrency=1, batch_size=2)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert np.array_equal(np.asarray(out.features[0]),
                          stdlib_wav_featurizer(wav1, 16))
    assert np.array_equal(np.asarray(out.features[1]),
                          stdlib_wav_featurizer(wav2, 16))
    assert len(out.features[2]) == 16                  # stub fallback


def test_audio_featurizer_strict():
    """strict=True: WAV still decodes for real; non-WAV raises instead of
    silently faking."""
    from csvweb_ray.ops.multimodal import AudioFeaturizer

    feat = AudioFeaturizer(n_bands=8, strict=True)
    wav = encode_wav(_sine(), 8000)
    out = feat(pa.Table.from_pylist([{"media_id": 1, "payload": wav}]))
    assert len(out["features"][0].as_py()) == 8
    with pytest.raises(NotImplementedError):
        feat(pa.Table.from_pylist([{"media_id": 2, "payload": b"mp3???"}]))
