"""Pure-stdlib baseline JPEG codec (encode + decode), numpy-vectorized
where it counts.

The round-5 de-stub family (PNG via zlib, WAV via struct, Y4M via header
parse) left one residue: compressed image containers still required an
injected PIL kernel.  This module closes it for baseline JPEG — by far
the dominant compressed image format in web-scale corpora — with zero
new dependencies: the entropy coder, DCT, quantization, and color math
are implemented from the public spec (ITU-T T.81; JFIF color conversion
per ITU-T T.871).

Decoder: baseline sequential DCT (SOF0), 8-bit, huffman entropy coding,
grayscale or YCbCr with any h×v chroma subsampling (4:4:4 / 4:2:2 /
4:2:0 covered by tests), 8/16-bit DQT, multiple DHT per segment,
restart intervals (DRI + RSTn).  Progressive (SOF2) and arithmetic
coding raise ``NotImplementedError`` — ``ImageDecoder`` surfaces that
as the documented strict-mode gap rather than faking pixels.

Encoder: baseline sequential, standard Annex-K quantization tables with
libjpeg quality scaling, standard Annex-K huffman tables (written into
DHT, so decode correctness never depends on transcription fidelity —
the prefix-code validity is pytest-gated), 4:4:4 or 4:2:0.  Exists so
tests can round-trip planted-signal images through the REAL decode path
without any binary fixture: at quality=100 the quant tables are all
ones, a solid-gray image is DC-only, and the decode recovers the level
exactly — the same planted-oracle trick as ``ops.y4m``.

Scale note: decode runs inside the ``ImageDecoder`` actor pool, one
payload at a time (entropy decoding is inherently sequential per image);
parallelism comes from ``concurrency × batch_size`` across payloads,
never from within one image.  The per-image huffman loop is plain
Python over a prefetched bit array — the right trade at thumbnail test
sizes; a real deployment injects PIL/libjpeg-turbo through the existing
decoder surface for multi-megapixel corpora.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_jpeg", "encode_jpeg", "decode_jpeg", "stdlib_jpeg_decoder"]

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K)

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8-point DCT-II matrix: forward = C @ X @ C.T, inverse = C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(0.125) if _k == 0 else 0.5) * \
            np.cos((2 * _n + 1) * _k * np.pi / 16)


def is_jpeg(payload: bytes) -> bool:
    return len(payload) > 3 and payload[:3] == b"\xff\xd8\xff"


def _quality_scale(q_base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q_base * scale + 50) // 100, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    return np.stack([y + 1.402 * cr,
                     y - 0.344136 * cb - 0.714136 * cr,
                     y + 1.772 * cb], axis=-1)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded plane → (n_blocks, 8, 8), row-major block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


# ---------------------------------------------------------------------------
# bit IO

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1  # keep the int bounded

    def align(self) -> None:
        if self.nbits:                # pad with 1-bits per the spec
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)

    def marker(self, byte: int) -> None:
        self.align()
        self.out += bytes([0xFF, byte])   # markers are never stuffed

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over destuffed entropy bytes, prefetched as a
    numpy bit array (one unpackbits per image, no per-bit byte math)."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        bits = self.bits
        p = self.pos
        for _ in range(n):
            v = (v << 1) | int(bits[p])
            p += 1
        self.pos = p
        return v


# ---------------------------------------------------------------------------
# huffman

class _HuffTable:
    """Canonical huffman per T.81 — built from the DHT (bits, vals) pair."""

    def __init__(self, bits, vals):
        self.bits = list(bits)
        self.vals = list(vals)
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        for length in range(1, 17):
            n = self.bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1
        if k != len(self.vals):
            raise ValueError("DHT bits/vals length mismatch")
        # encoder side: symbol → (code, length)
        self.enc = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(self.bits[length - 1]):
                self.enc[self.vals[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.bit()
        length = 1
        while code > self.maxcode[length]:
            code = (code << 1) | br.bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt huffman stream")
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude per the spec's EXTEND."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder

def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """Baseline JFIF encode of ``(H, W, 3)`` RGB or ``(H, W)`` grayscale
    uint8.  ``subsampling``: ``"444"``, ``"422"`` or ``"420"`` (ignored
    for gray); ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs (exists so the decoder's restart path is testable)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    dc_y, ac_y = _HuffTable(_DC_LUMA_BITS, _DC_LUMA_VALS), \
        _HuffTable(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c, ac_c = _HuffTable(_DC_CHROMA_BITS, _DC_CHROMA_VALS), \
        _HuffTable(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    sub = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling] \
        if not gray else (1, 1)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        quants = [qy]
    else:
        ycc = _rgb_to_ycbcr(img)
        y = ycc[..., 0]
        cb, cr = ycc[..., 1], ycc[..., 2]
        fh, fv = sub  # chroma decimation factors (horizontal, vertical)
        if (fh, fv) != (1, 1):
            cb = _pad_edge(cb, fv, fh)
            cr = _pad_edge(cr, fv, fh)
            cb = cb.reshape(cb.shape[0] // fv, fv, cb.shape[1] // fh, fh) \
                .mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // fv, fv, cr.shape[1] // fh, fh) \
                .mean(axis=(1, 3))
        planes = [y, cb, cr]
        samp = [sub, (1, 1), (1, 1)]
        quants = [qy, qc, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # per-component quantized zigzag coefficients, in row-major block order
    comp_zz, comp_bw = [], []
    for plane, (sh, sv), q in zip(planes, samp, quants):
        # pad so every component tiles the same MCU grid
        need_w = -(-w // (8 * hmax)) * 8 * sh
        need_h = -(-h // (8 * vmax)) * 8 * sv
        p = np.pad(plane, ((0, need_h - plane.shape[0]),
                           (0, need_w - plane.shape[1])), mode="edge")
        blocks = _blocks_of(p - 128.0)
        coef = np.einsum("kn,bnm,lm->bkl", _C, blocks, _C)
        zz = np.round(coef.reshape(-1, 64)[:, _ZIGZAG] /
                      q[_ZIGZAG]).astype(np.int64)
        comp_zz.append(zz)
        comp_bw.append(p.shape[1] // 8)  # blocks per row

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n \
                    and mcu_n % restart_interval == 0:
                bw.marker(0xD0 + (mcu_n // restart_interval - 1) % 8)
                preds = [0] * len(planes)
            mcu_n += 1
            for ci, (sh, sv) in enumerate(samp):
                dct, act = (dc_y, ac_y) if ci == 0 else (dc_c, ac_c)
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * comp_bw[ci] + (mx * sh + bx)
                        zz = comp_zz[ci][bi]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        s = _category(diff)
                        code, ln = dct.enc[s]
                        bw.put(code, ln)
                        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        run = 0
                        nz = np.nonzero(zz[1:])[0]
                        last = nz[-1] + 1 if nz.size else 0
                        for i in range(1, last + 1):
                            v = int(zz[i])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = act.enc[0xF0]
                                bw.put(code, ln)   # ZRL
                                run -= 16
                            s = _category(v)
                            code, ln = act.enc[(run << 4) | s]
                            bw.put(code, ln)
                            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
                        if last < 63:
                            code, ln = act.enc[0x00]
                            bw.put(code, ln)       # EOB
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")                              # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])                  # APP0
    for tq, q in enumerate(quants[:2] if not gray else quants[:1]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in q[_ZIGZAG])               # DQT (zigzag)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof  # SOF0
    for tc, th, tab in ((0, 0, dc_y), (1, 0, ac_y), (0, 1, dc_c),
                        (1, 1, ac_c))[: 2 if gray else 4]:
        body = bytes([(tc << 4) | th]) + bytes(tab.bits) + bytes(tab.vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body  # DHT
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos  # SOS
    out += entropy
    out += b"\xff\xd9"                                          # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG → ``(H, W, 3)`` uint8 RGB (grayscale is
    replicated across channels).  See module docstring for coverage."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    restart = 0
    frame = None
    n = len(payload)

    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:            # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                  # standalone
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2: pos + seglen]
        pos += seglen
        if marker == 0xDB:            # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:
                    q = np.frombuffer(body[i:i + 128], dtype=">u2") \
                        .astype(np.int64)
                    i += 128
                else:
                    q = np.frombuffer(body[i:i + 64], dtype=np.uint8) \
                        .astype(np.int64)
                    i += 64
                nat = np.empty(64, np.int64)
                nat[_ZIGZAG] = q      # stored in zigzag order
                qtables[tq] = nat
        elif marker == 0xC4:          # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1: i + 17])
                nv = sum(bits)
                vals = list(body[i + 17: i + 17 + nv])
                htables[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:          # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline/ext sequential)
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            fh, fw = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci: 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported SOF marker {marker:#x}")
        elif marker == 0xDA:          # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            if ns != len(frame["comps"]):
                raise NotImplementedError("multi-scan baseline JPEG")
            end = _entropy_end(payload, pos)
            pixels = _decode_scan(payload[pos:end], frame, scan, qtables,
                                  htables, restart)
            return pixels
        # APPn / COM / others: skipped
    raise ValueError("no SOS segment found")


def _entropy_end(payload: bytes, pos: int) -> int:
    """Index of the first non-RST marker after the entropy data."""
    i = pos
    n = len(payload)
    while i < n - 1:
        if payload[i] == 0xFF and payload[i + 1] != 0x00 \
                and not (0xD0 <= payload[i + 1] <= 0xD7):
            return i
        i += 1
    return n


def _decode_scan(data: bytes, frame, scan, qtables, htables,
                 restart: int) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # split into restart intervals, destuff each
    segments = []
    if restart:
        start = 0
        i = 0
        n = len(data)
        while i < n - 1:
            if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
                segments.append(data[start:i])
                start = i + 2
                i += 2
            else:
                i += 1
        segments.append(data[start:])
    else:
        segments = [data]
    readers = [_BitReader(seg.replace(b"\xff\x00", b"\xff"))
               for seg in segments]

    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
              for c in comps]
    bw = [mcux * c["h"] for c in comps]  # blocks per plane row
    coefs = [np.zeros((bw[ci] * mcuy * c["v"], 64))
             for ci, c in enumerate(comps)]

    preds = [0] * len(comps)
    br = readers[0]
    seg_i = 0
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_n and mcu_n % restart == 0:
                seg_i += 1
                br = readers[seg_i]
                preds = [0] * len(comps)
            mcu_n += 1
            for ci, (comp, tdc, tac) in enumerate(scan):
                dct = htables[(0, tdc)]
                act = htables[(1, tac)]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64)
                        s = dct.decode(br)
                        diff = _extend(br.take(s), s)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16   # ZRL
                                    continue
                                break         # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.take(s), s)
                            k += 1
                        bi = (my * comp["v"] + by) * bw[ci] \
                            + mx * comp["h"] + bx
                        coefs[ci][bi] = zz

    out_planes = []
    for ci, comp in enumerate(comps):
        q = qtables[comp["tq"]]
        nat = (coefs[ci][:, _UNZIGZAG] * q).reshape(-1, 8, 8)
        spatial = np.einsum("kn,bkl,lm->bnm", _C, nat, _C) + 128.0
        ph, pw = planes[ci].shape
        plane = (spatial.reshape(ph // 8, pw // 8, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(ph, pw))
        # upsample to full MCU-grid resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    rgb = _ycbcr_to_rgb(*out_planes)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def stdlib_jpeg_decoder(payload: bytes, h: int, w: int) -> np.ndarray:
    """``ImageDecoder``-shaped kernel: decode + nearest resize → (h, w, 3)."""
    px = decode_jpeg(payload)
    sh, sw = px.shape[:2]
    ri = (np.arange(h) * sh // h).clip(0, sh - 1)
    ci = (np.arange(w) * sw // w).clip(0, sw - 1)
    return px[ri][:, ci]
