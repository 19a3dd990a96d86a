"""Pure-stdlib YUV4MPEG2 (.y4m) video codec — zero new dependencies.

Y4M is the uncompressed interchange format mjpegtools/ffmpeg use for
raw video: one ASCII stream header (``YUV4MPEG2 W.. H.. F.. [Ii] [Aa]
[Cxxx] [Xcomment]``) followed by ``FRAME[params]\\n`` + planar YUV
bytes per frame (spec: the mjpegtools ``yuv4mpeg(5)`` man page).  That
makes it the one real video container this container can decode with
nothing but ``bytes`` and numpy — the same trick ``ops.png`` (zlib) and
``ops.wav`` (RIFF) use to de-stub the image/audio kernels.

Supports progressive C420 (all jpeg/mpeg2/paldv siting variants — siting
only matters for resampling filters, not for plane layout), C422, C444
and Cmono, 8-bit.  Interlaced and >8-bit streams raise: a real pipeline
feeds those through an injected pyav/opencv extractor instead.

Frame → RGB uses full-range BT.601 with nearest-neighbor chroma
upsampling, so a chroma-neutral frame (U = V = 128) maps to R = G = B =
Y exactly — the property the ``video_frames`` driver oracle leans on.
"""

from __future__ import annotations

import numpy as np

__all__ = ["is_y4m", "decode_y4m", "encode_y4m", "frame_to_rgb",
           "stdlib_y4m_frame_sampler"]

_MAGIC = b"YUV4MPEG2"

#: colorspace tag → (x_subsample, y_subsample) of the chroma planes
_CHROMA = {
    "420": (2, 2), "420jpeg": (2, 2), "420mpeg2": (2, 2),
    "420paldv": (2, 2), "422": (2, 1), "444": (1, 1),
}


def is_y4m(payload: bytes) -> bool:
    return payload[:len(_MAGIC)] == _MAGIC


def _parse_header(line: bytes) -> dict:
    parts = line.decode("ascii", errors="strict").split(" ")
    if parts[0] != _MAGIC.decode():
        raise ValueError("not a YUV4MPEG2 stream")
    hdr = {"w": None, "h": None, "cs": "420", "fps": (30, 1), "ilace": "p"}
    for p in parts[1:]:
        if not p:
            continue
        tag, val = p[0], p[1:]
        if tag == "W":
            hdr["w"] = int(val)
        elif tag == "H":
            hdr["h"] = int(val)
        elif tag == "C":
            hdr["cs"] = val
        elif tag == "F":
            num, den = val.split(":")
            hdr["fps"] = (int(num), int(den))
        elif tag == "I":
            hdr["ilace"] = val
        # A (aspect) and X (comment) parameters are legal; ignored
    if not hdr["w"] or not hdr["h"]:
        raise ValueError("Y4M header missing W/H")
    return hdr


def decode_y4m(payload: bytes):
    """Decode a Y4M byte stream → ``(frames, meta)``.

    ``frames`` is a list of ``(y, u, v)`` uint8 numpy planes (``u``/``v``
    are ``None`` for Cmono); ``meta`` carries width/height/colorspace/
    fps.  Raises ``ValueError`` on malformed, truncated, interlaced or
    unsupported-colorspace input — loud failure over silent garbage.
    """
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M: no stream-header terminator")
    hdr = _parse_header(payload[:nl])
    w, h, cs = hdr["w"], hdr["h"], hdr["cs"]
    if hdr["ilace"] not in ("p", "?"):
        raise ValueError(f"interlaced Y4M (I{hdr['ilace']}) unsupported — "
                         "inject a pyav/opencv extractor")
    if cs == "mono":
        cw = ch = 0
    elif cs in _CHROMA:
        fx, fy = _CHROMA[cs]
        if w % fx or h % fy:
            raise ValueError(f"C{cs} needs dims divisible by {fx}x{fy}")
        cw, ch = w // fx, h // fy
    else:
        raise ValueError(f"unsupported Y4M colorspace C{cs}")
    ysz, csz = w * h, cw * ch
    fsz = ysz + 2 * csz
    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("Y4M: bad FRAME marker")
        pos = fnl + 1
        if pos + fsz > n:
            raise ValueError("Y4M: truncated frame data")
        raw = payload[pos:pos + fsz]
        y = np.frombuffer(raw, np.uint8, count=ysz).reshape(h, w)
        if csz:
            u = np.frombuffer(raw, np.uint8, count=csz,
                              offset=ysz).reshape(ch, cw)
            v = np.frombuffer(raw, np.uint8, count=csz,
                              offset=ysz + csz).reshape(ch, cw)
        else:
            u = v = None
        frames.append((y, u, v))
        pos += fsz
    meta = {"width": w, "height": h, "colorspace": cs, "fps": hdr["fps"],
            "n_frames": len(frames)}
    return frames, meta


def encode_y4m(frames, colorspace: str = "420", fps=(30, 1)) -> bytes:
    """Encode ``(y, u, v)`` plane triples (``u``/``v`` ``None`` ⇒ Cmono)
    into a Y4M byte stream.  Test/driver twin of :func:`decode_y4m`."""
    if not frames:
        raise ValueError("encode_y4m: need at least one frame")
    y0 = np.asarray(frames[0][0])
    h, w = y0.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    out = [head.encode("ascii")]
    for y, u, v in frames:
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(np.asarray(y, dtype=np.uint8)).tobytes())
        if colorspace != "mono":
            out.append(np.ascontiguousarray(
                np.asarray(u, dtype=np.uint8)).tobytes())
            out.append(np.ascontiguousarray(
                np.asarray(v, dtype=np.uint8)).tobytes())
    return b"".join(out)


def frame_to_rgb(y, u, v) -> np.ndarray:
    """Planar YUV → (h, w, 3) uint8 RGB.  Full-range BT.601 with
    nearest-neighbor chroma upsampling; mono replicates Y.  U = V = 128
    maps to R = G = B = Y exactly (rounding included)."""
    if u is None:
        return np.repeat(np.asarray(y, np.uint8)[:, :, None], 3, axis=2)
    yf = np.asarray(y, np.float64)
    ry, rx = y.shape[0] // u.shape[0], y.shape[1] // u.shape[1]
    uf = np.repeat(np.repeat(u, ry, 0), rx, 1).astype(np.float64) - 128.0
    vf = np.repeat(np.repeat(v, ry, 0), rx, 1).astype(np.float64) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    yi = (np.arange(h) * img.shape[0]) // h
    xi = (np.arange(w) * img.shape[1]) // w
    return img[yi][:, xi]


def stdlib_y4m_frame_sampler(payload: bytes, every_nth: int,
                             h: int, w: int):
    """Real extractor for :class:`~csvweb_ray.ops.multimodal.VideoFrameSampler`:
    decode → take every ``every_nth`` frame → RGB → nearest-resize to
    (h, w).  Returns ``[(frame_no, uint8[h, w, 3]), …]``."""
    frames, _meta = decode_y4m(payload)
    return [(i, _nearest(frame_to_rgb(*frames[i]), h, w))
            for i in range(0, len(frames), max(1, every_nth))]
