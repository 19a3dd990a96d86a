"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The IMAGE path decodes for real: PNG payloads go through the pure-stdlib
codec in ``ops.png`` (zlib inflate + numpy filter reconstruction,
pixel-exact-tested in ``tests/test_png.py``), baseline JPEG payloads
through ``ops.jpeg`` (huffman + DCT from the T.81 spec, round-trip- and
planted-oracle-tested in ``tests/test_jpeg.py``), with PIL picked up
automatically when importable for every other format.  The AUDIO path
featurizes for real too: PCM WAV payloads go through ``ops.wav`` (RIFF
parse + rfft filter-bank energies, sample-exact round-trip tested in
``tests/test_wav.py``).  The VIDEO path extracts frames for real from
YUV4MPEG2 payloads via ``ops.y4m`` (header/FRAME parse + BT.601 RGB,
round-trip tested in ``tests/test_y4m.py``); compressed containers
(mp4/mkv) still need an injected pyav/opencv extractor.  Everything
Ray-side is real and tested: schema contracts, actor-pool signatures,
batch sizing for large binary payloads, and the output layout.

Batch-size guidance baked in: binary payloads are MB-scale, so these
stages default to small ``batch_size`` (64) and ``batch_format="pyarrow"``
(binary columns do not survive pandas round-trips unscathed).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["ImageDecoder", "decode_images", "AudioFeaturizer",
           "extract_audio_features", "VideoFrameSampler",
           "sample_video_frames", "MEDIA_SCHEMA"]

#: Input contract for a multimodal corpus table.
MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("mime", pa.string()),
    ("meta", pa.string()),            # JSON sidecar (dims, duration, …)
])


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic fake decode: payload hash seeds a pixel grid.  Stands
    in for a real decoder so the distributed plumbing is exercisable."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def pil_image_decoder(payload: bytes, h: int, w: int):
    """Real decode path (used automatically when PIL is installed): decode
    + RGB + resize → (h, w, 3) uint8.  Import inside so environments
    without PIL never pay for it."""
    import io as _io

    from PIL import Image

    img = Image.open(_io.BytesIO(payload)).convert("RGB").resize((w, h))
    return np.asarray(img, dtype=np.uint8)


class ImageDecoder:
    """Actor-pool stage: decode + resize → fixed-shape uint8 tensor column.

    The decode kernel is INJECTABLE: pass ``decoder=fn`` with signature
    ``fn(payload: bytes, h: int, w: int) -> np.uint8[h, w, 3]`` — a real
    environment swaps in PIL/opencv with zero pipeline changes (PIL is
    picked up automatically when importable).  Without PIL, PNG payloads
    decode for REAL through the pure-stdlib codec (``ops.png``: chunk
    walk + zlib inflate + numpy filter reconstruction, pixel-exact
    pytest oracle) and baseline JPEG payloads through ``ops.jpeg``
    (huffman + DCT per ITU-T T.81, planted-oracle-tested); other formats
    fall back to the deterministic fake (``strict=True`` raises instead
    of faking).
    """

    def __init__(self, height: int = 32, width: int = 32, strict: bool = False,
                 decoder=None):
        self.h, self.w, self.strict = height, width, strict
        if decoder is None:
            try:
                import PIL  # noqa: F401 - probe only, once per actor

                decoder = pil_image_decoder
            except ImportError:
                decoder = None
        self.decoder = decoder

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if self.decoder is not None:
            return self.decoder(payload, self.h, self.w)
        from .jpeg import is_jpeg, stdlib_jpeg_decoder
        from .png import is_png, stdlib_png_decoder

        if is_png(payload):
            return stdlib_png_decoder(payload, self.h, self.w)
        if is_jpeg(payload):
            return stdlib_jpeg_decoder(payload, self.h, self.w)
        if self.strict:
            raise NotImplementedError(
                "non-PNG/JPEG image decoding requires PIL/opencv (none "
                "importable and no decoder injected); run with strict=False "
                "for the deterministic stub")
        return _fake_pixels(payload, self.h, self.w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tensors = []
        for payload in batch["payload"].to_pylist():
            px = self._decode_one(payload or b"")
            tensors.append(np.asarray(px, dtype=np.uint8).reshape(-1).tolist())
        col = pa.array(tensors, type=pa.list_(pa.uint8(), self.h * self.w * 3))
        return (batch.drop_columns(["payload"])
                .append_column("pixels", col))


def decode_images(ds, height: int = 32, width: int = 32, concurrency: int = 2,
                  batch_size: int = 64, decoder=None):
    """Small batches on purpose: batch_size × payload size × concurrency
    must fit the worker heap (SURVEY "memory-aware")."""
    return ds.map_batches(
        ImageDecoder, fn_constructor_kwargs={"height": height, "width": width,
                                             "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


class AudioFeaturizer:
    """Actor-pool stage: waveform → fixed-size feature vector.  Injectable
    like ``ImageDecoder``: pass ``featurizer(payload: bytes, n_bands) ->
    float[n_bands]`` (e.g. a torchaudio log-mel).  Without one, PCM WAV
    payloads featurize for REAL through the pure-stdlib codec
    (``ops.wav``: RIFF parse + rfft filter-bank energies, sample-exact
    round-trip pytest oracle); other formats fall back to the
    deterministic hash-seeded stub (``strict=True`` raises instead)."""

    def __init__(self, n_bands: int = 16, strict: bool = False,
                 featurizer=None):
        self.n_bands, self.strict = n_bands, strict
        self.featurizer = featurizer

    def _feat_one(self, payload: bytes) -> np.ndarray:
        if self.featurizer is not None:
            return self.featurizer(payload, self.n_bands)
        from .wav import is_wav, stdlib_wav_featurizer

        if is_wav(payload):
            return stdlib_wav_featurizer(payload, self.n_bands)
        if self.strict:
            raise NotImplementedError(
                "non-WAV audio decoding requires torchaudio/librosa (none "
                "importable and no featurizer injected); run with "
                "strict=False for the deterministic stub")
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "little")
        return np.random.RandomState(seed).standard_normal(self.n_bands)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [np.asarray(self._feat_one(p or b""),
                            dtype=np.float64).tolist()
                 for p in batch["payload"].to_pylist()]
        col = pa.array(feats, type=pa.list_(pa.float64(), self.n_bands))
        return batch.drop_columns(["payload"]).append_column("features", col)


def extract_audio_features(ds, n_bands: int = 16, concurrency: int = 2,
                           batch_size: int = 64, featurizer=None):
    return ds.map_batches(
        AudioFeaturizer, fn_constructor_kwargs={"n_bands": n_bands,
                                                "featurizer": featurizer},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


class VideoFrameSampler:
    """Actor-pool stage: video payload → sampled frame rows (one input
    row explodes into N output rows — flat-map shape via map_batches).

    Injectable like its image/audio siblings: pass ``extractor(payload,
    every_nth, h, w) -> [(frame_no, uint8[h, w, 3]), …]`` (e.g. a pyav
    keyframe walker).  Without one, YUV4MPEG2 payloads extract for REAL
    through the pure-stdlib codec (``ops.y4m``: header/FRAME parse,
    planar YUV → BT.601 RGB, nearest resize — round-trip pytest oracle);
    other formats fall back to the deterministic hash-seeded stub
    (``strict=True`` raises instead)."""

    def __init__(self, every_nth: int = 10, height: int = 8, width: int = 8,
                 strict: bool = False, extractor=None):
        self.every_nth = max(1, every_nth)
        self.h, self.w, self.strict = height, width, strict
        self.extractor = extractor

    def _frames_one(self, payload: bytes):
        if self.extractor is not None:
            return self.extractor(payload, self.every_nth, self.h, self.w)
        from .y4m import is_y4m, stdlib_y4m_frame_sampler

        if is_y4m(payload):
            return stdlib_y4m_frame_sampler(payload, self.every_nth,
                                            self.h, self.w)
        if self.strict:
            raise NotImplementedError(
                "non-Y4M video decoding requires pyav/opencv (none "
                "importable and no extractor injected); run with "
                "strict=False for the deterministic stub")
        n_frames = (len(payload) % 50) + 1  # stub: payload-derived
        return [(f, _fake_pixels(payload + f.to_bytes(4, "little"),
                                 self.h, self.w))
                for f in range(0, n_frames, self.every_nth)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_no": [], "pixels": []}
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            for fno, px in self._frames_one(payload or b""):
                out["media_id"].append(mid)
                out["frame_no"].append(fno)
                out["pixels"].append(
                    np.asarray(px, dtype=np.uint8).reshape(-1).tolist())
        return pa.Table.from_pydict({
            "media_id": pa.array(out["media_id"], type=pa.int64()),
            "frame_no": pa.array(out["frame_no"], type=pa.int32()),
            "pixels": pa.array(out["pixels"],
                               type=pa.list_(pa.uint8(), self.h * self.w * 3)),
        })


def sample_video_frames(ds, every_nth: int = 10, concurrency: int = 2,
                        batch_size: int = 16, height: int = 8, width: int = 8,
                        extractor=None):
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every_nth": every_nth, "height": height,
                               "width": width, "extractor": extractor},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
