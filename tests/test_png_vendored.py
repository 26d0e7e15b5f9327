"""Vendored PNG codec (functions/png_vendored): every scanline filter's
inverse, color-type expansion, the deterministic NEAREST resample, and
the declared error boundaries — all with zero optional dependencies.

Oracle strategy: (1) encode→decode round-trips must be bit-exact against
the ORIGINAL array (filters are invertible; encoder subtracts the
predictor, decoder adds it — independent directions); (2) a naive
per-BYTE decoder written straight from the PNG spec's filter equations
(section 9: Recon(x) = Filt(x) + predictor over bytes at offset bpp)
cross-checks the production per-PIXEL numpy decoder on random images.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from geotables_jl_spark.functions.png_vendored import (
    _SIG,
    _chunk,
    decode_png,
    encode_png,
    resize_nearest,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# naive spec decoder (test-side oracle): per-byte, straight from the text
# ---------------------------------------------------------------------------


def _naive_decode(payload: bytes) -> np.ndarray:
    pos = len(_SIG)
    idat = []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, color, _, _, _ = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        pos += 12 + ln
    ch = {0: 1, 2: 3}[color]
    bpp = ch  # 8-bit
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = bytearray()
    prior = bytes(stride)
    p = 0
    for _y in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if f == 1:
                line[x] = (line[x] + a) % 256
            elif f == 2:
                line[x] = (line[x] + b) % 256
            elif f == 3:
                line[x] = (line[x] + (a + b) // 2) % 256
            elif f == 4:
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) % 256
        prior = bytes(line)
        out += prior
    img = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if ch == 1 else img


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_roundtrip_every_filter(filt, channels):
    arr = _rng(100 + filt).integers(0, 256, size=(13, 7, channels), dtype=np.uint8)
    png = encode_png(arr, filter_type=filt)
    got = decode_png(png)
    want = np.repeat(arr, 3, axis=2) if channels == 1 else arr
    assert got.dtype == np.uint8 and got.shape == want.shape
    assert np.array_equal(got, want), f"filter {filt} round-trip drift"
    # independent per-byte spec decoder agrees with the numpy decoder
    assert np.array_equal(_naive_decode(png), want)


def test_mixed_filters_per_row():
    """Real encoders choose a filter per row; splice five one-filter
    streams' scanlines into one IDAT to exercise row-to-row filter
    transitions (each row's predictor reads the RECONSTRUCTED prior
    row, whatever filter produced it)."""
    arr = _rng(7).integers(0, 256, size=(10, 9, 3), dtype=np.uint8)
    stride = 9 * 3 + 1
    # re-filter each row against the true prior row, cycling filters
    rows = []
    prior = np.zeros((9, 3), np.int32)
    for y in range(10):
        f = y % 5
        one = encode_png(
            np.vstack([prior[None].astype(np.uint8), arr[y][None]]), filter_type=f
        )
        # second scanline of that 2-row image has exactly prior=prior
        body = _idat(one)
        rows.append(body[stride : 2 * stride])
        prior = arr[y].astype(np.int32)
    ihdr = struct.pack(">IIBBBBB", 9, 10, 8, 2, 0, 0, 0)
    png = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), arr)
    assert np.array_equal(_naive_decode(png), arr)


def _idat(png: bytes) -> bytes:
    pos = len(_SIG)
    parts = []
    while pos + 8 <= len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        if png[pos + 4 : pos + 8] == b"IDAT":
            parts.append(png[pos + 8 : pos + 8 + ln])
        pos += 12 + ln
    return zlib.decompress(b"".join(parts))


def _raw_png(w, h, color, pixels: bytes, extra_chunks=()) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    lines = b"".join(
        b"\x00" + pixels[y * w * ch : (y + 1) * w * ch] for y in range(h)
    )
    body = _chunk(b"IHDR", ihdr)
    for tag, cb in extra_chunks:
        body += _chunk(tag, cb)
    return _SIG + body + _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")


def test_palette_rgba_grayalpha_expansion():
    # palette: 3 entries, 2x2 image of indices
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    png = _raw_png(2, 2, 3, bytes([0, 1, 2, 0]), extra_chunks=[(b"PLTE", plte)])
    got = decode_png(png)
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[0, 1].tolist() == [0, 255, 0]
    assert got[1, 0].tolist() == [0, 0, 255]
    # RGBA: alpha dropped
    rgba = bytes([10, 20, 30, 255, 40, 50, 60, 0])
    got = decode_png(_raw_png(2, 1, 6, rgba))
    assert got[0, 0].tolist() == [10, 20, 30] and got[0, 1].tolist() == [40, 50, 60]
    # gray+alpha: gray replicated, alpha dropped
    ga = bytes([77, 255, 200, 0])
    got = decode_png(_raw_png(2, 1, 4, ga))
    assert got[0, 0].tolist() == [77, 77, 77] and got[0, 1].tolist() == [200, 200, 200]


def test_error_boundaries():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng")
    arr = np.zeros((2, 2, 3), np.uint8)
    png = bytearray(encode_png(arr))
    # IHDR body starts at 16; depth byte at offset 16+8, interlace at 16+12
    depth_at = len(_SIG) + 8 + 8
    png16 = bytes(png[:depth_at]) + b"\x10" + bytes(png[depth_at + 1 :])
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(png16)
    inter_at = len(_SIG) + 8 + 12
    png_adam = bytes(png[:inter_at]) + b"\x01" + bytes(png[inter_at + 1 :])
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(png_adam)


def test_resize_nearest_convention():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)[:, :, None].repeat(3, axis=2)
    # 4 -> 2 with pixel centers: src index floor((i+0.5)*4/2) = 1, 3
    small = resize_nearest(img, (2, 2))
    assert small[:, :, 0].tolist() == [[5, 7], [13, 15]]
    # identity
    assert np.array_equal(resize_nearest(img, (4, 4)), img)
    # upscale 2 -> 4: floor((i+0.5)*2/4) = 0,0,1,1
    up = resize_nearest(small, (4, 4))
    assert up[0, :, 0].tolist() == [5, 5, 7, 7]


def test_pillow_parity_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    arr = _rng(3).integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    for filt in range(5):
        png = encode_png(arr, filter_type=filt)
        with PIL.open(io.BytesIO(png)) as im:
            pil = np.asarray(im.convert("RGB"), dtype=np.uint8)
        assert np.array_equal(decode_png(png), pil)
