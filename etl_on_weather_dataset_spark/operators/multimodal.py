"""Multimodal column plumbing (north-star par.2b).

Images/audio/video are opaque `binary` columns with typed metadata.
The Spark-side plumbing -- schema, partitioning, Arrow batch shape,
`mapInPandas` UDF signature -- is real and tested. Decode status:
`decode_audio` is REAL for WAV (stdlib ``wave``, zero external deps);
`decode_image` is real when PIL is importable (import-guarded,
NotImplementedError otherwise); `sample_frames` stays a stub (no
ffmpeg anywhere reachable). `decode_binary_metadata` is the
deterministic byte-level "decode" (length, first byte, md5) that
exercises the identical execution path with zero codec dependencies.

Scale notes: binary payloads ride the normal columnar pipeline; the
decode runs per Arrow batch (`mapInPandas`), so executor memory is
bounded by `spark.sql.execution.arrow.maxRecordsPerBatch` x payload
size -- tune that down for large blobs. Payload columns should be
pruned before shuffles (carry doc ids through joins, re-attach late).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MULTIMODAL_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def with_binary_payload(
    df: DataFrame, text_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Attach an opaque binary column (UTF-8 bytes of a string column;
    in production this is the raw image/audio/video blob)."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8"))


def decode_binary_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake 'decode': per-Arrow-batch metadata extraction
    over the binary payload via mapInPandas. This is the exact plumbing
    a real image decode uses -- swap the body for PIL/ffmpeg."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + MULTIMODAL_META_SCHEMA.fields
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else None
                    ).astype("Int32"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, out_schema)


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
    ]
)


def decode_image(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real image decode -> (width, height, mode) per payload, via the
    same mapInPandas plumbing as decode_binary_metadata.

    Import-guarded: uses PIL when importable; raises NotImplementedError
    otherwise (this build ships no codec libs). The guard runs on the
    DRIVER at plan time so a missing dependency fails fast instead of
    inside executor tasks. Undecodable payloads yield null metadata
    (corrupt blobs must not kill a 100 TB scan).
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL (pillow); not available in this "
            "build. Plumbing-wise identical to decode_binary_metadata."
        ) from exc

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + IMAGE_META_SCHEMA.fields
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        def meta(b: bytes):
            try:
                with Image.open(io.BytesIO(b)) as im:
                    return im.width, im.height, im.mode
            except Exception:  # noqa: BLE001 -- corrupt payload -> nulls
                return None, None, None

        for pdf in batches:
            decoded = [meta(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": pd.array(
                        [d[0] for d in decoded], dtype="Int32"
                    ),
                    "height": pd.array(
                        [d[1] for d in decoded], dtype="Int32"
                    ),
                    "mode": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, out_schema)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
    ]
)


def decode_audio(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real audio decode for WAV payloads -> (sample_rate, n_channels,
    n_frames, duration_sec), via the standard mapInPandas plumbing.

    Uses the stdlib ``wave`` module -- zero external codec deps, so
    this path is always live. Compressed formats (mp3/flac/ogg) would
    swap the body for soundfile/ffmpeg; undecodable payloads yield
    null metadata rather than failing the scan.
    """
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + AUDIO_META_SCHEMA.fields
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        def meta(b: bytes):
            try:
                with wave.open(io.BytesIO(bytes(b))) as w:
                    rate, ch, n = (
                        w.getframerate(), w.getnchannels(), w.getnframes()
                    )
                    return rate, ch, n, (n / rate if rate else None)
            except Exception:  # noqa: BLE001 -- corrupt payload -> nulls
                return None, None, None, None

        for pdf in batches:
            decoded = [meta(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": pd.array(
                        [d[0] for d in decoded], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [d[1] for d in decoded], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [d[2] for d in decoded], dtype="Int64"
                    ),
                    "duration_sec": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fmt: str = "PNG",
) -> DataFrame:
    """Decode -> resize -> re-encode thumbnails per Arrow batch.

    Import-guarded like decode_image (PIL). Output payloads are a new
    binary column -- the standard image-preprocessing step before
    feature extraction. Undecodable inputs yield a null thumbnail.
    Memory note: both source and thumbnail batches are bounded by
    arrow.maxRecordsPerBatch; shrink it for large images.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image resize requires PIL (pillow); not available in this "
            "build."
        ) from exc

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("thumbnail", T.BinaryType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        def shrink(b: bytes):
            try:
                with Image.open(io.BytesIO(b)) as im:
                    out = io.BytesIO()
                    im.resize((width, height)).save(out, format=fmt)
                    return out.getvalue()
            except Exception:  # noqa: BLE001
                return None

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "thumbnail": [shrink(b) for b in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_resize, out_schema)


def sample_frames(
    df: DataFrame, payload_col: str = "payload", every_n: int = 30
) -> DataFrame:
    """Video frame sampling. STUB: no ffmpeg in this build."""
    raise NotImplementedError("video frame sampling requires ffmpeg.")
