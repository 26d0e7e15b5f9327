"""Multimodal (image/audio/video) column plumbing.

Media ride along as opaque ``binary`` columns with typed metadata —
exactly how the north-star table carries ``html:binary``. The Spark-side
plumbing (schemas, batch iteration, partition-preserving mapInPandas) is
real and tested; the actual codec calls are STUBBED behind
``decode_stub=True`` (this container has no image/audio libraries) with
a deterministic fake so pipelines are testable end-to-end. Swap
``_decode_image_real`` for a PIL/libvips call in production.

Scale: media bytes dominate row size → ``spark.sql.files.maxPartitionBytes``
should be lowered (128 MB default is ~thousands of images per task —
fine); decode runs inside ``mapInPandas`` so one Arrow batch of binaries
crosses per task step, never per-row Python round-trips.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct attached to every media payload
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("format", T.StringType(), True),  # sniffed container
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

_MAGIC = [
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi
    ("494433", "mp3"),
    ("1A45DFA3", "webm"),
]


def sniff_format(binary_col):
    """Container sniff from magic bytes — pure JVM (hex + startswith)."""
    head = F.upper(F.hex(F.substring(binary_col, 1, 8)))
    expr = F.lit(None).cast("string")
    for magic, name in reversed(_MAGIC):
        expr = F.when(head.startswith(magic), F.lit(name)).otherwise(expr)
    return expr


def attach_media_meta(df: DataFrame, binary_col: str, media_type: str) -> DataFrame:
    """Add the typed metadata struct (sizes JVM-side; dims filled by decode)."""
    b = F.col(binary_col)
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        sniff_format(b).alias("format"),
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.withColumn(f"{binary_col}_meta", meta)


def _pil():
    try:
        from PIL import Image  # optional dependency

        return Image
    except ImportError:
        return None


def _decode_image_real(payload: bytes, target: tuple[int, int]) -> np.ndarray:
    """Real decode via Pillow when installed: decode → RGB → resize with
    NEAREST (deterministic across Pillow versions, unlike the
    antialiased filters) → HWC uint8. Raises with a clear message when
    no codec library is present (use decode_stub=True then)."""
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "real image decode needs Pillow — not installed; "
            "use decode_stub=True (deterministic fake) or plug a codec in here"
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:
        im = im.convert("RGB").resize(target, resample=Image.NEAREST)
        return np.asarray(im, dtype=np.uint8)


def _decode_image_fake(payload: bytes, target: tuple[int, int]) -> np.ndarray:
    """Deterministic fake decode: pixels from a rolling hash of the bytes.
    Shape/dtype identical to a real decoder's output."""
    h = np.frombuffer(payload[: 8 * ((len(payload)) // 8)] or b"\0" * 8, dtype=np.uint64)
    seed = int(h.sum() % (2**32)) if len(h) else 0
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(target[1], target[0], 3), dtype=np.uint8)


def decode_resize_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    width: int = 32,
    height: int = 32,
    decode_stub: bool = True,
) -> DataFrame:
    """Decode → resize → mean-channel feature vector, over mapInPandas.

    Output: (id, width, height, features: array<double> len 3) — one
    Arrow batch of binaries in, one small batch of features out. The
    decode call is per-image but inside the batch loop (CPU-bound codec
    work; the Spark plumbing cost is batch-level).
    """
    decoder = _decode_image_fake if decode_stub else _decode_image_real
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )
    target = (width, height)

    def _iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf[binary_col]:
                img = decoder(bytes(payload), target)
                feats.append([float(img[..., c].mean()) for c in range(3)])
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "features": feats,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_iter, schema=schema)


def frame_sample_plan(
    df: DataFrame, binary_col: str, id_col: str, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (video, frame_ts).

    The timestamp lattice is generated JVM-side from the (stubbed)
    duration; the actual frame grab would happen in the same mapInPandas
    pattern as ``decode_resize_features``. Duration stub: 1 ms per 1000
    bytes, deterministic."""
    b = F.col(binary_col)
    duration = (F.octet_length(b) / F.lit(1000)).cast("long") * F.lit(1000)
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.greatest(duration - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
