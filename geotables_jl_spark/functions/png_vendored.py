"""Vendored pure-stdlib+numpy PNG codec for the multimodal decode path.

When Pillow is absent (as in this container), ``operators/multimodal``'s
real-decode arm falls back here so the image pipeline still executes a
GENUINE decode — PNG is lossless, so the pixels are bit-identical to
what any conformant decoder (Pillow included) produces. Everything is
public specification: the PNG datastream format and the five scanline
filters are defined in the W3C PNG spec (ISO/IEC 15948); the
decompressor is stdlib ``zlib``.

Scope (and honest boundary): 8-bit samples, color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), no interlacing. That
covers the overwhelming share of web PNGs; 16-bit and Adam7 raise a
clear error naming the limitation (lossy formats like JPEG still need a
codec library — their decoders aren't bit-reproducible anyway).

Also provides ``encode_png`` (filter-selectable writer) so tests can
build fixtures and exercise every filter's inverse without any image
library, and ``resize_nearest`` — the deterministic numpy NEAREST
resample both decode arms share, keeping feature output identical
whether Pillow or this module did the decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal RGB/gray 8-bit PNG writer (color type 2 or 0, no alpha).

    ``filter_type`` applies that one filter (0-4) to EVERY scanline —
    deliberately exposed so tests can exercise each filter's decode
    inverse; real encoders pick per-row, which changes nothing for the
    decoder under test.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in (1, 3):
        raise ValueError(f"encode_png writes gray or RGB, got {ch} channels")
    color = 0 if ch == 1 else 2
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter {filter_type}")

    raw = a.astype(np.int32)
    prior = np.zeros((w, ch), dtype=np.int32)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.vstack([np.zeros((1, ch), np.int32), cur[:-1]])
        ul = np.vstack([np.zeros((1, ch), np.int32), prior[:-1]])
        if filter_type == 0:
            flt = cur
        elif filter_type == 1:
            flt = cur - left
        elif filter_type == 2:
            flt = cur - prior
        elif filter_type == 3:
            flt = cur - (left + prior) // 2
        else:  # Paeth
            flt = cur - _paeth(left, prior, ul)
        lines.append(bytes([filter_type]) + (flt % 256).astype(np.uint8).tobytes())
        prior = cur

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 9)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a scanline."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG datastream to an HWC uint8 RGB array.

    Gray/palette/alpha inputs are expanded to RGB (alpha dropped — the
    feature extractor downstream is RGB-mean); pixels are bit-exact per
    the spec, so outputs match Pillow's ``convert("RGB")`` for the
    supported subset.
    """
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG datastream (bad signature)")
    pos = len(_SIG)
    idat = []
    ihdr = None
    plte = None
    trns_gone = False  # tRNS would add alpha to palette entries; we drop alpha
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"tRNS":
            trns_gone = True
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"vendored PNG decode is 8-bit only (got {depth})")
    if interlace != 0:
        raise NotImplementedError("vendored PNG decode does not support Adam7")
    if comp != 0 or filt != 0:
        raise ValueError("non-standard PNG compression/filter method")
    if color not in _CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    ch = _CHANNELS[color]

    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:].reshape(h, w, ch).astype(np.int32)

    out = np.empty((h, w, ch), dtype=np.int32)
    prior = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        f = int(filters[y])
        cur = data[y]
        if f == 0:
            rec = cur
        elif f == 2:
            rec = (cur + prior) % 256
        elif f == 1:
            # left-predictor recurrences are per-pixel sequential; the
            # per-channel prefix loop below is over W pixels, not W*C
            # bytes, and stays in numpy row slices
            rec = cur.copy()
            for x in range(1, w):
                rec[x] = (rec[x] + rec[x - 1]) % 256
        elif f == 3:
            rec = cur.copy()
            rec[0] = (rec[0] + prior[0] // 2) % 256
            for x in range(1, w):
                rec[x] = (rec[x] + (rec[x - 1] + prior[x]) // 2) % 256
        elif f == 4:
            rec = cur.copy()
            zero = np.zeros(ch, dtype=np.int32)
            rec[0] = (rec[0] + _paeth(zero, prior[0], zero)) % 256
            for x in range(1, w):
                rec[x] = (rec[x] + _paeth(rec[x - 1], prior[x], prior[x - 1])) % 256
        else:
            raise ValueError(f"bad PNG scanline filter {f}")
        out[y] = rec
        prior = rec

    img = out.astype(np.uint8)
    if color == 2:
        return img
    if color == 0:
        return np.repeat(img, 3, axis=2)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        _ = trns_gone  # transparency dropped by contract (RGB output)
        return plte[img[:, :, 0]]
    if color == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]  # RGBA -> RGB


def resize_nearest(img: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Deterministic NEAREST resample: source index = floor(center map),
    the standard pixel-center convention (``(i + 0.5) * src/dst``).
    Pure integer-index gather — identical output on every platform,
    which the decode feature contract requires (antialiased filters
    differ across library versions; NEAREST with a fixed convention
    cannot)."""
    tw, th = target
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    return img[ys][:, xs]
