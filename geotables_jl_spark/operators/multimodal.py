"""Multimodal (image/audio/video) column plumbing.

Media ride along as opaque ``binary`` columns with typed metadata —
exactly how the north-star table carries ``html:binary``. The Spark-side
plumbing (schemas, batch iteration, partition-preserving mapInPandas) is
real and tested. Decode is REAL with zero optional dependencies for the
lossless/stdlib formats — PNG via the vendored codec
(``functions/png_vendored``), PCM WAV via stdlib ``wave`` — and uses
Pillow when installed for the rest (JPEG/GIF/...); ``decode_stub=True``
keeps the deterministic fake for pipelines that only test plumbing.

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
    """Real decode → RGB → deterministic NEAREST resize → HWC uint8.

    PNG payloads decode through the vendored pure-stdlib codec
    (``functions/png_vendored``) — PNG is lossless, so the pixels are
    bit-identical to any conformant decoder, and the path runs with ZERO
    optional dependencies. Other formats (JPEG/GIF/...) need Pillow;
    absent that, a clear NotImplementedError names the boundary (use
    decode_stub=True then). Both arms share ``resize_nearest`` (fixed
    pixel-center convention), so feature output is environment-
    independent: same bytes → same features, with or without Pillow."""
    from geotables_jl_spark.functions.png_vendored import decode_png, resize_nearest

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return resize_nearest(decode_png(payload), target)
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "real decode of non-PNG images needs Pillow — not installed; "
            "use decode_stub=True (deterministic fake) or plug a codec in here"
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:
        return resize_nearest(np.asarray(im.convert("RGB"), dtype=np.uint8), target)


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

    Undecodable payloads yield a NULL ``features`` row instead of
    failing the task — at 10¹² documents even a 10⁻⁶ corruption rate is
    ~10⁶ blobs, and one poison payload must not kill (or retry-loop) a
    scan. A MISSING decoder is different and still raises: Pillow absent
    for a non-PNG format is a deployment error the job owner must see,
    not a per-row data condition to swallow.
    """
    decoder = _decode_image_fake if decode_stub else _decode_image_real
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )
    target = (width, height)

    def _iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf[binary_col]:
                try:
                    img = decoder(bytes(payload), target)
                except NotImplementedError:
                    raise  # missing decoder = config error, not bad data
                except Exception:
                    feats.append(None)
                    continue
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


def decode_audio_features(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """PCM WAV decode → (id, sample_rate, n_samples, duration_ms, rms),
    over mapInPandas — REAL decode via stdlib ``wave`` (no optional
    libraries): RIFF header parse + int8/16/32 sample extraction, RMS
    normalized to [0, 1] full scale. Undecodable payloads yield NULL
    fields rather than failing the task (one corrupt blob must not kill
    a 100 TB scan); compressed codecs (mp3/ogg) are outside stdlib and
    land in the NULL arm with everything else ``wave`` rejects."""
    import io
    import wave

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("rms", T.DoubleType(), True),
        ]
    )
    _WIDTH_DTYPE = {1: np.int8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}

    def _one(payload: bytes):
        try:
            with wave.open(io.BytesIO(payload)) as wv:
                rate, n, width = wv.getframerate(), wv.getnframes(), wv.getsampwidth()
                frames = wv.readframes(n)
        except Exception:
            return (None, None, None, None)
        dtype = _WIDTH_DTYPE.get(width)
        if dtype is None or rate <= 0:
            return (None, None, None, None)
        if width == 1:  # wave format: 8-bit PCM is unsigned, wider is signed
            samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        else:
            samples = np.frombuffer(frames, dtype=dtype).astype(np.float64)
        full = float(2 ** (8 * width - 1))
        rms = float(np.sqrt(np.mean((samples / full) ** 2))) if samples.size else 0.0
        return (rate, len(samples), int(n * 1000 / rate), rms)

    def _iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols = [_one(bytes(p)) for p in pdf[binary_col]]
            rate, n, dur, rms = zip(*cols)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "sample_rate": pd.array(rate, dtype="Int32"),
                    "n_samples": pd.array(n, dtype="Int64"),
                    "duration_ms": pd.array(dur, dtype="Int64"),
                    "rms": pd.array(rms, dtype="float64"),
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
