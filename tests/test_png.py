"""Pixel-exact oracle for the pure-stdlib PNG codec (csvweb_ray.ops.png)
and its wiring into the multimodal ImageDecoder stage."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from csvweb_ray.ops.png import (
    _resize_nearest,
    decode_png,
    encode_png,
    is_png,
    png_rgb,
    stdlib_png_decoder,
)


def _img(h=13, w=17, ch=3, seed=7):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4, "mixed"])
def test_roundtrip_rgb_every_filter(ftype):
    src = _img()
    out = decode_png(encode_png(src, filter_type=ftype))
    assert out.shape == src.shape
    assert np.array_equal(out, src)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4, "mixed"])
def test_roundtrip_gray_every_filter(ftype):
    src = _img(ch=1, seed=11)
    out = decode_png(encode_png(src, filter_type=ftype))
    assert np.array_equal(out, src)
    rgb = png_rgb(encode_png(src, filter_type=ftype))
    assert np.array_equal(rgb, np.repeat(src, 3, axis=2))


def test_adversarial_gradient_and_edges():
    """Gradients make Average/Paeth predictors actually predict (constant
    inputs degrade every filter to None-ish); 1-pixel edges exercise the
    zero left/up boundary conditions."""
    h, w = 9, 9
    grad = (np.arange(h)[:, None] * 29 + np.arange(w)[None, :] * 17) % 256
    src = np.dstack([grad, grad.T, (grad * 3) % 256]).astype(np.uint8)
    for ftype in (3, 4, "mixed"):
        assert np.array_equal(decode_png(encode_png(src, ftype)), src)
    one = _img(1, 1)
    assert np.array_equal(decode_png(encode_png(one, 4)), one)
    row = _img(1, 31, seed=3)
    col = _img(31, 1, seed=4)
    for ftype in range(5):
        assert np.array_equal(decode_png(encode_png(row, ftype)), row)
        assert np.array_equal(decode_png(encode_png(col, ftype)), col)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _manual_png(w, h, color_type, channels, pixels, extra_chunks=()):
    """Hand-built PNG for color types encode_png doesn't write."""
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    body = b"".join(_chunk(t, d) for t, d in extra_chunks)
    return (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                          0, 0, 0))
            + body
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))


def test_rgba_decode_and_alpha_drop():
    h, w = 5, 6
    src = _img(h, w, 4, seed=9)
    payload = _manual_png(w, h, 6, 4, src.reshape(h, w * 4))
    out = decode_png(payload)
    assert np.array_equal(out, src)
    assert np.array_equal(png_rgb(payload), src[:, :, :3])


def test_gray_alpha_decode():
    h, w = 4, 5
    src = _img(h, w, 2, seed=10)
    payload = _manual_png(w, h, 4, 2, src.reshape(h, w * 2))
    assert np.array_equal(decode_png(payload), src)
    assert np.array_equal(png_rgb(payload),
                          np.repeat(src[:, :, :1], 3, axis=2))


def test_palette_decode():
    h, w = 3, 7
    palette = _img(1, 16, 3, seed=12).reshape(16, 3)
    idx = np.random.RandomState(13).randint(0, 16, size=(h, w),
                                            dtype=np.uint8)
    payload = _manual_png(w, h, 3, 1, idx.reshape(h, w),
                          extra_chunks=[(b"PLTE", palette.tobytes())])
    assert np.array_equal(decode_png(payload), palette[idx])


def test_malformed_inputs_raise():
    good = encode_png(_img())
    assert is_png(good) and not is_png(b"JFIF....")
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # flip one byte inside the IDAT payload -> CRC mismatch
    bad = bytearray(good)
    idat = good.index(b"IDAT")
    bad[idat + 8] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated mid-chunk


def test_interlace_and_depth_unsupported():
    src = _img(2, 2)
    raw = b"".join(b"\x00" + src[y].tobytes() for y in range(2))
    interlaced = (b"\x89PNG\r\n\x1a\n"
                  + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2,
                                                0, 0, 1))
                  + _chunk(b"IDAT", zlib.compress(raw))
                  + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png(interlaced)


def test_resize_nearest_identity_and_shape():
    src = _img(8, 8)
    assert np.array_equal(_resize_nearest(src, 8, 8), src)
    out = _resize_nearest(src, 3, 5)
    assert out.shape == (3, 5, 3)
    big = _resize_nearest(src, 16, 16)
    assert np.array_equal(big[::2, ::2], src)


def test_pil_crosscheck_if_available():
    PIL = pytest.importorskip("PIL")  # noqa: F841 - container has no PIL
    import io

    from PIL import Image

    src = _img(10, 12)
    via_pil = np.asarray(
        Image.open(io.BytesIO(encode_png(src, "mixed"))).convert("RGB"))
    assert np.array_equal(via_pil, src)


def test_image_decoder_uses_real_png_path(ray_session):
    """End-to-end through the distributed actor-pool stage: real PNG
    payloads decode pixel-exactly (resize is identity at the source
    size); non-PNG payloads still take the deterministic fake."""
    import ray.data as rd

    from csvweb_ray.ops.multimodal import decode_images

    srcs = [_img(8, 8, seed=s) for s in range(4)]
    rows = [{"media_id": i, "kind": "image",
             "payload": encode_png(px, filter_type="mixed"),
             "mime": "image/png", "meta": "{}"}
            for i, px in enumerate(srcs)]
    rows.append({"media_id": 99, "kind": "image", "payload": b"\xffnotpng",
                 "mime": "image/jpeg", "meta": "{}"})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = (decode_images(ds, height=8, width=8, concurrency=1, batch_size=2)
           .to_pandas().set_index("media_id"))
    for i, px in enumerate(srcs):
        assert np.array_equal(
            np.asarray(out.loc[i, "pixels"], dtype=np.uint8).reshape(8, 8, 3),
            px)
    assert len(out.loc[99, "pixels"]) == 8 * 8 * 3  # fake fallback ran


def test_stdlib_decoder_rejects_non_png():
    with pytest.raises(ValueError):
        stdlib_png_decoder(b"GIF89a....", 8, 8)
