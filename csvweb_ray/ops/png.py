"""Pure-stdlib PNG codec — the real image-decode kernel for the
multimodal stage in environments without PIL.

``decode_png`` implements the PNG spec's mandatory path from scratch
(public spec, RFC 2083 / W3C PNG): chunk walk with CRC verification,
zlib inflate of the IDAT stream, and per-scanline filter reconstruction
(None/Sub/Up/Average/Paeth) over numpy rows.  Supported: bit depth 8,
color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
non-interlaced — the shapes a training-data pipeline actually meets;
everything else raises ``NotImplementedError`` (the caller's injectable
surface falls back to PIL or the deterministic fake).

``encode_png`` exists for the pytest oracle: it writes valid PNGs with
a CALLER-CHOSEN filter type per image, so decode's reconstruction of
every filter is pixel-exact-tested round-trip (and cross-checked against
PIL when that is importable).

Reconstruction shape notes (this is per-image work inside an actor-pool
``map_batches`` stage — bounded by the decoded image size, never by the
corpus): None/Up are whole-row vectorized; Sub is a per-lane cumsum mod
256; Average/Paeth walk pixels left-to-right but vectorize over the
channel lane.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png", "png_rgb", "is_png"]

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIG


def _chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack(">I", payload[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth_scalar(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor over int16 lane vectors (exact spec arithmetic)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def _reconstruct(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering: ``raw`` is the inflated stream reshaped
    to (h, 1 + stride); returns (h, stride) reconstructed bytes."""
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int16)
        if ftype == 0:                                   # None
            cur = line
        elif ftype == 1:                                 # Sub
            # recon[x] = raw[x] + recon[x-bpp]: per-lane cumsum mod 256
            lanes = line.reshape(-1, bpp).astype(np.uint64)
            cur = (np.cumsum(lanes, axis=0) & 0xFF) \
                .astype(np.int16).reshape(-1)
        elif ftype == 2:                                 # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:                                 # Average
            cur = np.empty(stride, dtype=np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            for x0 in range(0, stride, bpp):
                seg = (line[x0:x0 + bpp]
                       + ((left + prev[x0:x0 + bpp]) >> 1)) & 0xFF
                cur[x0:x0 + bpp] = seg
                left = seg
        elif ftype == 4:                                 # Paeth
            cur = np.empty(stride, dtype=np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            upleft = np.zeros(bpp, dtype=np.int16)
            for x0 in range(0, stride, bpp):
                up = prev[x0:x0 + bpp]
                seg = (line[x0:x0 + bpp]
                       + _paeth_scalar(left, up, upleft)) & 0xFF
                cur[x0:x0 + bpp] = seg
                left, upleft = seg, up
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        recon[y] = cur.astype(np.uint8)
        prev = cur
    return recon


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG byte string → (h, w, channels) uint8 array.

    Channels follow the file's color type (1/2/3/4); palette images come
    back expanded to RGB(A).  Raises ``ValueError`` on malformed input
    and ``NotImplementedError`` on unsupported (non-8-bit / interlaced)
    variants."""
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte = trns = None
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8)")
    if interlace:
        raise NotImplementedError("interlaced PNG")
    if color_type not in _CHANNELS:
        raise ValueError(f"bad PNG color type {color_type}")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (stride + 1):
        raise ValueError("PNG pixel stream size mismatch")
    recon = _reconstruct(raw.reshape(height, stride + 1), height, stride, ch)
    img = recon.reshape(height, width, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[:len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return img


def png_rgb(payload: bytes) -> np.ndarray:
    """Decode → (h, w, 3) RGB uint8 (gray replicated, alpha dropped)."""
    img = decode_png(payload)
    ch = img.shape[2]
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    if ch == 2:                           # gray + alpha → replicate gray
        return np.repeat(img[:, :, :1], 3, axis=2)
    if ch == 4:
        return img[:, :, :3]
    return img


def _filter_line(line: np.ndarray, prev: np.ndarray, bpp: int,
                 ftype: int) -> np.ndarray:
    """Apply filter ``ftype`` to one reconstructed scanline (encoder side;
    fully vectorized — every predictor input is known)."""
    cur = line.astype(np.int16)
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = cur
    elif ftype == 1:
        out = cur - left
    elif ftype == 2:
        out = cur - up
    elif ftype == 3:
        out = cur - ((left + up) >> 1)
    elif ftype == 4:
        out = cur - _paeth_scalar(left, up, upleft)
    else:
        raise ValueError(f"unknown filter {ftype}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(img: np.ndarray, filter_type: int | str = 0,
               level: int = 6) -> bytes:
    """Encode (h, w, 3) or (h, w, 1)/(h, w) uint8 → PNG bytes.

    ``filter_type``: a fixed PNG filter 0–4 for every scanline, or
    ``"mixed"`` to cycle through all five (the decode-oracle workout)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in (1, 3):
        raise ValueError("encode_png supports 1 or 3 channels")
    color_type = 0 if ch == 1 else 2
    flat = img.reshape(h, w * ch)
    lines = []
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        ft = (y % 5) if filter_type == "mixed" else int(filter_type)
        lines.append(bytes([ft]) + _filter_line(flat[y], prev, ch, ft).tobytes())
        prev = flat[y]
    raw = zlib.compress(b"".join(lines), level)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw) \
        + chunk(b"IEND", b"")


def _resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize (the stdlib path has no resampling libs);
    deterministic and shape-exact, which is what the tensor contract
    needs."""
    sh, sw = img.shape[:2]
    ys = (np.arange(h) * sh // h).clip(0, sh - 1)
    xs = (np.arange(w) * sw // w).clip(0, sw - 1)
    return img[ys][:, xs]


def stdlib_png_decoder(payload: bytes, h: int, w: int) -> np.ndarray:
    """Drop-in for ``ImageDecoder``'s injectable surface: real decode for
    PNG payloads (pure stdlib), ``ValueError`` for other formats so the
    caller can fall back."""
    return _resize_nearest(png_rgb(payload), h, w)
