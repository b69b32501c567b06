"""Multimodal column plumbing (north-star par.2b).

Images/audio/video are opaque `binary` columns with typed metadata.
The Spark-side plumbing -- schema, partitioning, Arrow batch shape,
`mapInPandas` UDF signature -- is real and tested; the actual
image/audio decode is STUBBED (the codec libraries are not in this
container): `decode_image`/`decode_audio` raise NotImplementedError,
and `decode_binary_metadata` uses a deterministic byte-level "decode"
(length, first byte, md5) that exercises the identical execution path.

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


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode -> (width, height, mode) + resized thumbnail.
    STUB: codec libs (PIL/opencv) are not available in this build."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; plumbing-wise identical to "
        "decode_binary_metadata -- swap the mapInPandas body."
    )


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
