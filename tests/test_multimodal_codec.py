"""Real-codec boundary of operators/multimodal.py (VERDICT r2 'Next
round' #8): golden-fixture decode parity when Pillow is installed;
a clear NotImplementedError (not a crash deep in a task) when absent."""

from __future__ import annotations

import pytest

from geotables_jl_spark.operators.multimodal import (
    _decode_image_real,
    _pil,
    attach_media_meta,
    decode_resize_features,
)


def test_real_decode_errors_clearly_without_pillow():
    if _pil() is not None:
        pytest.skip("Pillow present: decode works instead of erroring")
    with pytest.raises(NotImplementedError, match="Pillow"):
        _decode_image_real(b"\x89PNG\r\n\x1a\n", (8, 8))


@pytest.mark.skipif(_pil() is None, reason="Pillow not installed")
def test_real_decode_golden_fixture(spark):
    """A deterministic 4×4 gradient PNG decoded through the full
    mapInPandas path must reproduce the known per-channel means."""
    import io

    import numpy as np
    from PIL import Image

    # golden fixture: gradient R=x*60, G=y*60, B=128, generated in-test
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    for y in range(4):
        for x in range(4):
            arr[y, x] = (x * 60, y * 60, 128)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    payload = buf.getvalue()

    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, img binary")
    df = attach_media_meta(df, "img", "image")
    assert df.select("img_meta.format").first()[0] == "png"

    # NEAREST resize 4×4→4×4 is identity: means are exact
    out = decode_resize_features(
        df, "img", "doc_id", width=4, height=4, decode_stub=False
    ).collect()
    assert len(out) == 1 and out[0]["id"] == 1
    want = [float(arr[..., c].mean()) for c in range(3)]
    assert out[0]["features"] == want
