"""Pure-stdlib Y4M codec: round-trip exactness, RGB conversion, frame
sampling, malformed-input rejection, and the real distributed video
path through ``VideoFrameSampler``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from csvweb_ray.ops.y4m import (decode_y4m, encode_y4m, frame_to_rgb, is_y4m,
                                stdlib_y4m_frame_sampler)


def _rand_planes(rng, w, h, cs):
    if cs == "mono":
        return (rng.integers(0, 256, (h, w), dtype=np.uint8), None, None)
    fx, fy = {"420": (2, 2), "422": (2, 1), "444": (1, 1)}[cs]
    return (rng.integers(0, 256, (h, w), dtype=np.uint8),
            rng.integers(0, 256, (h // fy, w // fx), dtype=np.uint8),
            rng.integers(0, 256, (h // fy, w // fx), dtype=np.uint8))


@pytest.mark.parametrize("cs", ["420", "422", "444", "mono"])
@pytest.mark.parametrize("dims", [(4, 4), (16, 8), (32, 32), (12, 6)])
def test_roundtrip_exact(cs, dims):
    w, h = dims
    rng = np.random.default_rng(hash((cs, dims)) % 2**32)
    frames = [_rand_planes(rng, w, h, cs) for _ in range(5)]
    payload = encode_y4m(frames, colorspace=cs)
    assert is_y4m(payload)
    dec, meta = decode_y4m(payload)
    assert meta["width"] == w and meta["height"] == h
    assert meta["colorspace"] == cs and meta["n_frames"] == 5
    for (y, u, v), (y2, u2, v2) in zip(frames, dec):
        assert np.array_equal(y, y2)
        if cs == "mono":
            assert u2 is None and v2 is None
        else:
            assert np.array_equal(u, u2) and np.array_equal(v, v2)


def test_420_siting_variants_decode():
    rng = np.random.default_rng(7)
    frames = [_rand_planes(rng, 8, 8, "420")]
    for variant in ("420jpeg", "420mpeg2", "420paldv"):
        dec, meta = decode_y4m(encode_y4m(frames, colorspace=variant))
        assert meta["colorspace"] == variant
        assert np.array_equal(dec[0][0], frames[0][0])


def test_header_parsing_tolerates_aspect_and_comment():
    rng = np.random.default_rng(3)
    y, u, v = _rand_planes(rng, 4, 4, "444")
    body = b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes()
    payload = b"YUV4MPEG2 W4 H4 F25:1 Ip A16:9 C444 XYSCSS=444\n" + body
    dec, meta = decode_y4m(payload)
    assert meta["fps"] == (25, 1) and np.array_equal(dec[0][2], v)


def test_neutral_chroma_rgb_equals_luma():
    # U = V = 128 ⇒ R = G = B = Y exactly (the driver-oracle property)
    y = np.arange(64, dtype=np.uint8).reshape(8, 8)
    u = np.full((4, 4), 128, np.uint8)
    rgb = frame_to_rgb(y, u, u)
    for c in range(3):
        assert np.array_equal(rgb[:, :, c], y)


def test_rgb_known_value():
    # single pixel, classic BT.601 full-range: Y=128, U=0, V=255 →
    # R = 128 + 1.402*127 = 306.05 → clip 255; B = 128 + 1.772*(-128) → 0
    y = np.array([[128]], np.uint8)
    u = np.array([[0]], np.uint8)
    v = np.array([[255]], np.uint8)
    r, g, b = frame_to_rgb(y, u, v)[0, 0]
    assert (r, b) == (255, 0) and 0 < g < 128


def test_frame_sampler_every_nth_and_resize():
    rng = np.random.default_rng(11)
    frames = [_rand_planes(rng, 16, 16, "mono") for _ in range(10)]
    payload = encode_y4m(frames, colorspace="mono")
    out = stdlib_y4m_frame_sampler(payload, every_nth=3, h=4, w=4)
    assert [f for f, _ in out] == [0, 3, 6, 9]
    # nearest resize of a mono frame picks exact source pixels
    y0 = frames[0][0]
    expect = y0[::4, ::4]
    assert np.array_equal(out[0][1][:, :, 0], expect)


@pytest.mark.parametrize("bad", [
    b"YUV4MPEG2 W4 H4",                               # no newline
    b"YUV4MPEG2 W4 F30:1 C444\n",                     # missing H
    b"YUV4MPEG2 W4 H4 It C444\n",                     # interlaced
    b"YUV4MPEG2 W4 H4 C410\nFRAME\n" + b"\0" * 24,    # unsupported cs
    b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + b"\0" * 10,    # truncated frame
    b"YUV4MPEG2 W5 H5 C420\nFRAME\n" + b"\0" * 38,    # odd dims for 420
    b"YUV4MPEG2 W4 H4 C444\nGARBAGE\n" + b"\0" * 48,  # bad marker
])
def test_malformed_rejected(bad):
    with pytest.raises(ValueError):
        decode_y4m(bad)


def test_video_sampler_real_y4m_distributed(ray_session):
    """The actor-pool stage must produce the exact frames the local codec
    does — solid frames so resize is value-exact."""
    import ray.data as rd

    from csvweb_ray.ops.multimodal import sample_video_frames

    rows = []
    for mid in range(6):
        n = mid % 4 + 1
        frames = [(np.full((16, 16), (mid * 31 + f * 17) % 256, np.uint8),
                   np.full((8, 8), 128, np.uint8),
                   np.full((8, 8), 128, np.uint8)) for f in range(n)]
        rows.append({"media_id": mid, "kind": "video",
                     "payload": encode_y4m(frames),
                     "mime": "video/x-yuv4mpeg", "meta": "{}"})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = (sample_video_frames(ds, every_nth=1, concurrency=1)
           .to_pandas().sort_values(["media_id", "frame_no"]))
    assert len(out) == sum(m % 4 + 1 for m in range(6))
    for _, r in out.iterrows():
        expect = (r.media_id * 31 + r.frame_no * 17) % 256
        assert set(r.pixels) == {expect}


def test_video_sampler_strict_raises():
    from csvweb_ray.ops.multimodal import VideoFrameSampler

    s = VideoFrameSampler(strict=True)
    with pytest.raises(NotImplementedError):
        s(pa.Table.from_pylist([{"media_id": 1, "payload": b"not-a-video"}]))
