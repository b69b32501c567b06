"""Multimodal column plumbing (north-star par.2b).

Images/audio/video are opaque `binary` columns with typed metadata.
The Spark-side plumbing -- schema, partitioning, Arrow batch shape,
`mapInPandas` UDF signature -- is real and tested; the codec-dependent
decodes are import-guarded: `decode_image` runs for real when PIL is
importable and raises NotImplementedError otherwise; `decode_audio`/
`sample_frames` stay stubs (no audio/video libs anywhere reachable).
`decode_binary_metadata` uses a deterministic byte-level "decode"
(length, first byte, md5) that exercises the identical execution path
with zero codec dependencies.

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


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real audio decode -> (sample_rate, n_samples, duration).
    STUB: codec libs are not available in this build."""
    raise NotImplementedError(
        "audio decode requires soundfile/ffmpeg; see decode_binary_metadata."
    )


def sample_frames(
    df: DataFrame, payload_col: str = "payload", every_n: int = 30
) -> DataFrame:
    """Video frame sampling. STUB: no ffmpeg in this build."""
    raise NotImplementedError("video frame sampling requires ffmpeg.")
