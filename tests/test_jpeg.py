"""Oracles for the pure-stdlib baseline JPEG codec (csvweb_ray.ops.jpeg)
and its wiring into the multimodal ImageDecoder stage.

JPEG is lossy, so the oracle strategy differs from PNG's pixel-exact
round trip: (a) solid images at quality=100 ARE exact by construction
(all-ones quant tables, DC-only blocks — the planted-signal trick the
driver's ``image_decode`` query relies on); (b) smooth images round-trip
within a small bounded error at high quality; (c) the huffman tables
must form valid canonical prefix codes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from csvweb_ray.ops.jpeg import (
    _AC_CHROMA_BITS,
    _AC_CHROMA_VALS,
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_CHROMA_BITS,
    _DC_CHROMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _HuffTable,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
    stdlib_jpeg_decoder,
)


def _smooth(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([np.clip(80 + yy, 0, 255), np.clip(60 + xx, 0, 255),
                     np.clip(100 + (yy + xx) // 2, 0, 255)],
                    -1).astype(np.uint8)


def test_solid_gray_q100_is_exact():
    for level in (0, 1, 77, 128, 137, 254, 255):
        img = np.full((24, 40), level, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert np.array_equal(out, np.stack([img] * 3, -1)), level


def test_solid_color_q100_is_exact():
    for rgb in ((200, 30, 90), (0, 0, 255), (17, 255, 3)):
        img = np.zeros((16, 16, 3), np.uint8)
        img[:] = rgb
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert np.array_equal(out, img), rgb


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("ri", [0, 1, 3])
def test_smooth_roundtrip_subsampling_and_restarts(sub, ri):
    img = _smooth()
    out = decode_jpeg(encode_jpeg(img, quality=92, subsampling=sub,
                                  restart_interval=ri))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 4, (sub, ri, err.max())


def test_odd_dimensions_and_mcu_padding():
    # non-multiple-of-8 (and of-16 for 420) dims force edge padding + crop
    for h, w in ((19, 21), (8, 8), (9, 24), (33, 47)):
        img = _smooth(h, w)
        for sub in ("444", "420"):
            out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
            assert out.shape == (h, w, 3)
            err = np.abs(out.astype(int) - img.astype(int))
            assert err.max() <= 6, (h, w, sub, err.max())


def test_noise_q100_bounded():
    # q=100 quant tables are all ones: error is pure DCT/rounding noise
    img = np.random.RandomState(0).randint(0, 256, (19, 21, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_grayscale_single_component_scan():
    yy = np.mgrid[0:24, 0:24][0]
    img = np.clip(50 + yy * 2, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100, restart_interval=2))
    assert np.abs(out[..., 0].astype(int) - img.astype(int)).max() <= 1
    assert np.array_equal(out[..., 0], out[..., 1])


def test_annex_k_tables_are_valid_prefix_codes():
    # canonical-code validity: kraft sum == coverage, construction raises
    # on bits/vals mismatch; also every symbol gets a unique code
    for bits, vals in ((_DC_LUMA_BITS, _DC_LUMA_VALS),
                       (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
                       (_AC_LUMA_BITS, _AC_LUMA_VALS),
                       (_AC_CHROMA_BITS, _AC_CHROMA_VALS)):
        t = _HuffTable(bits, vals)
        assert len(t.enc) == len(vals) == len(set(vals))
        assert sum(n * 2 ** -(i + 1) for i, n in enumerate(bits)) <= 1.0


def test_is_jpeg_and_rejects():
    assert is_jpeg(encode_jpeg(np.zeros((8, 8), np.uint8)))
    assert not is_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_progressive_raises_not_implemented():
    b = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(b))


def test_stdlib_decoder_resize_contract():
    img = np.full((24, 24), 99, np.uint8)
    out = stdlib_jpeg_decoder(encode_jpeg(img, quality=100), 16, 48)
    assert out.shape == (16, 48, 3)
    assert np.all(out == 99)  # solid survives nearest resize exactly


def test_image_decoder_stage_routes_jpeg(ray_session):
    """End-to-end through the distributed actor-pool stage with NO
    injected decoder: the stage must route JPEG payloads through the
    stdlib codec and recover the planted solid level exactly."""
    import ray.data as rd

    from csvweb_ray.ops.multimodal import ImageDecoder, decode_images

    levels = [(i * 37) % 256 for i in range(12)]
    subs = ["444", "422", "420"]
    rows = [{
        "media_id": i,
        "kind": "image",
        "payload": encode_jpeg(np.full((24, 24), lv, np.uint8)
                               if i % 2 else
                               np.full((24, 24, 3), lv, np.uint8),
                               quality=100, subsampling=subs[i % 3],
                               restart_interval=i % 4),
        "mime": "image/jpeg",
        "meta": "{}",
    } for i, lv in enumerate(levels)]
    # force the no-PIL stdlib path regardless of environment
    dec = ImageDecoder(height=8, width=8)
    if dec.decoder is not None:
        from csvweb_ray.ops.jpeg import stdlib_jpeg_decoder as sj

        ds = decode_images(rd.from_arrow(pa.Table.from_pylist(rows)),
                           height=8, width=8, decoder=sj)
    else:
        ds = decode_images(rd.from_arrow(pa.Table.from_pylist(rows)),
                           height=8, width=8)
    out = ds.sort("media_id").to_pandas()
    for i, lv in enumerate(levels):
        px = np.asarray(out["pixels"].iloc[i])
        assert px.min() == px.max() == lv, (i, lv, px.min(), px.max())


# ---------------------------------------------------------------------------
# fuzz: random images through every encoder configuration

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None, derandomize=True)
@given(data=st.data())
def test_fuzz_roundtrip_bounded_error(data):
    """Any uint8 image, any dims 1..40, any subsampling/restart/quality
    ≥ 90 must decode to the right shape with bounded error.  Smooth
    images bound tighter; pure noise at high quality stays within the
    quantization-noise envelope (q=100 tables are all ones)."""
    h = data.draw(st.integers(1, 40), label="h")
    w = data.draw(st.integers(1, 40), label="w")
    gray = data.draw(st.booleans(), label="gray")
    sub = data.draw(st.sampled_from(["444", "422", "420"]), label="sub")
    ri = data.draw(st.integers(0, 4), label="ri")
    quality = data.draw(st.sampled_from([90, 95, 100]), label="q")
    smooth = data.draw(st.booleans(), label="smooth")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    rng = np.random.RandomState(seed)
    shape = (h, w) if gray else (h, w, 3)
    if smooth:
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.clip(rng.randint(30, 220) + yy + xx, 0, 255)
        img = (base if gray
               else np.stack([base, np.clip(base + 10, 0, 255),
                              np.clip(base - 10, 0, 255)], -1)) \
            .astype(np.uint8)
    else:
        img = rng.randint(0, 256, shape, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub,
                                  restart_interval=ri))
    assert out.shape == (h, w, 3)
    ref = img if not gray else np.stack([img] * 3, -1)
    err = np.abs(out.astype(int) - ref.astype(int))
    if smooth and quality == 100 and (gray or sub == "444"):
        assert err.max() <= 3, (h, w, sub, ri, err.max())
    elif smooth:
        assert err.max() <= 40 and err.mean() <= 6, (
            h, w, sub, ri, quality, err.max(), err.mean())
    # noise images: decode must simply be valid and roughly faithful
    # at q=100 (quantization tables are all ones)
    elif quality == 100 and (gray or sub == "444"):
        assert err.max() <= 3, (h, w, sub, ri, err.max())
