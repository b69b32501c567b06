"""Multimodal column plumbing (north-star par.2b).

Images/audio/video are opaque `binary` columns with typed metadata.
The Spark-side plumbing -- schema, partitioning, Arrow batch shape,
`mapInPandas` UDF signature -- is real and tested. Decode status:
`decode_audio` is REAL for WAV (stdlib ``wave``, zero external deps);
`decode_image` is real when PIL is importable (import-guarded,
NotImplementedError otherwise); `sample_frames` is real for MP4/MOV
(pure-Python ISO-BMFF box walker: parses the `stts` table for frame
timestamps and samples frame indices at a target rate -- no ffmpeg
needed; only the pixel DECODE of sampled frames would need a codec).
`decode_binary_metadata` is the
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


# --- video: MP4/MOV container parsing, pure Python (no ffmpeg) ---------------
#
# The ISO BMFF container (MP4/MOV) is a tree of length-prefixed boxes;
# the structural metadata a sampling pipeline needs -- movie duration/
# timescale (moov/mvhd), track count (moov/trak), per-frame timing of
# the video track (trak/mdia/{mdhd,hdlr} + stbl/stts) -- is plain
# big-endian integers, no codec required. Only PIXEL decode needs
# ffmpeg; frame SELECTION does not. Same pattern as decode_audio's
# stdlib-wave path: real parsing, zero external deps.


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each child box."""
    off = start
    while off + 8 <= end:
        size = int.from_bytes(buf[off:off + 4], "big")
        btype = bytes(buf[off + 4:off + 8])
        hdr = 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                return
            size = int.from_bytes(buf[off + 8:off + 16], "big")
            hdr = 16
        elif size == 0:  # box runs to end of enclosing scope
            size = end - off
        if size < hdr or off + size > end:
            return  # truncated/corrupt: stop, keep what we have
        yield btype, off + hdr, off + size
        off += size


def _find_box(buf: bytes, start: int, end: int, *path: bytes):
    """Payload range of the first box at the given nested path."""
    for btype, s, e in _iter_boxes(buf, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return s, e
            return _find_box(buf, s, e, *path[1:])
    return None


def _parse_mvhd(buf: bytes, s: int, e: int):
    """(timescale, duration) from a movie-header payload."""
    if s + 4 > e:
        return None
    version = buf[s]
    if version == 1:  # 8-byte creation/modification times
        if s + 28 > e:
            return None
        ts = int.from_bytes(buf[s + 20:s + 24], "big")
        dur = int.from_bytes(buf[s + 24:s + 32], "big")
    else:
        if s + 20 > e:
            return None
        ts = int.from_bytes(buf[s + 12:s + 16], "big")
        dur = int.from_bytes(buf[s + 16:s + 20], "big")
    return (ts, dur) if ts else None


def _video_track_frame_times(buf: bytes, moov_s: int, moov_e: int):
    """Frame timestamps (sec) of the first video track, from its
    stts (decoding time-to-sample) table."""
    for btype, s, e in _iter_boxes(buf, moov_s, moov_e):
        if btype != b"trak":
            continue
        mdia = _find_box(buf, s, e, b"mdia")
        if not mdia:
            continue
        hdlr = _find_box(buf, *mdia, b"hdlr")
        # handler_type is bytes 8..12 of the hdlr payload
        if not hdlr or buf[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find_box(buf, *mdia, b"mdhd")
        if not mdhd:
            return None
        ms, me = mdhd
        version = buf[ms]
        ts_off = ms + (20 if version == 1 else 12)
        if ts_off + 4 > me:
            return None
        media_ts = int.from_bytes(buf[ts_off:ts_off + 4], "big")
        stts = _find_box(buf, *mdia, b"minf", b"stbl", b"stts")
        if not stts or not media_ts:
            return None
        ss, se = stts
        if ss + 8 > se:
            return None
        n_entries = int.from_bytes(buf[ss + 4:ss + 8], "big")
        times, t = [], 0
        off = ss + 8
        for _ in range(n_entries):
            if off + 8 > se:
                break
            count = int.from_bytes(buf[off:off + 4], "big")
            delta = int.from_bytes(buf[off + 4:off + 8], "big")
            for _ in range(count):
                times.append(t / media_ts)
                t += delta
            off += 8
        return times
    return None


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("timescale", T.IntegerType()),
        T.StructField("n_tracks", T.IntegerType()),
    ]
)


def decode_video(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Container-level video decode -> (duration_sec, timescale,
    n_tracks) per MP4/MOV payload, via the standard mapInPandas
    plumbing. Pure-Python box parsing (moov/mvhd/trak) -- no ffmpeg;
    undecodable payloads yield null metadata rather than failing the
    scan."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + VIDEO_META_SCHEMA.fields
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def meta(b: bytes):
            try:
                b = bytes(b)
                moov = _find_box(b, 0, len(b), b"moov")
                if not moov:
                    return None, None, None
                mvhd = _find_box(b, *moov, b"mvhd")
                parsed = _parse_mvhd(b, *mvhd) if mvhd else None
                n_tracks = sum(
                    1 for t, _, _ in _iter_boxes(b, *moov)
                    if t == b"trak"
                )
                if not parsed:
                    return None, None, n_tracks
                ts, dur = parsed
                return dur / ts, ts, n_tracks
            except Exception:  # noqa: BLE001 -- corrupt payload -> nulls
                return None, None, None

        for pdf in batches:
            decoded = [meta(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "duration_sec": [d[0] for d in decoded],
                    "timescale": pd.array(
                        [d[1] for d in decoded], dtype="Int32"
                    ),
                    "n_tracks": pd.array(
                        [d[2] for d in decoded], dtype="Int32"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 30,
) -> DataFrame:
    """Frame SAMPLING over video payloads: one output row per selected
    frame -- (id, frame_idx, t_sec) for every ``every_n``-th frame of
    the first video track, with timestamps from the container's stts
    (time-to-sample) table. Pure-Python MP4/MOV box parsing inside the
    standard mapInPandas plumbing; a downstream pixel decode (the only
    step that truly needs ffmpeg) would seek to exactly these
    timestamps. Corrupt/non-MP4 payloads yield zero rows, not errors.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("t_sec", T.DoubleType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    b = bytes(b)
                    moov = _find_box(b, 0, len(b), b"moov")
                    times = (
                        _video_track_frame_times(b, *moov)
                        if moov else None
                    )
                except Exception:  # noqa: BLE001
                    times = None
                for k in range(0, len(times or []), every_n):
                    ids.append(i)
                    idxs.append(k)
                    ts.append(times[k])
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "t_sec": pd.array(ts, dtype="float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, out_schema)


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("clipping_frac", T.DoubleType()),
])


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    clip_threshold: float = 0.99,
) -> DataFrame:
    """Signal-level audio features from 16-bit PCM WAV payloads:
    RMS level, peak amplitude (both normalized to [0, 1]), and the
    fraction of samples at/above ``clip_threshold`` of full scale
    (the clipping gate an audio-corpus curation pipeline filters on,
    the audio analogue of the text quality gates).

    Same Arrow-batch ``mapInPandas`` plumbing as decode_audio; the
    sample math is numpy over the frame buffer (vectorized per
    payload, no per-sample Python). Non-WAV / non-16-bit payloads
    yield nulls rather than failing the scan.
    """
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())]
        + AUDIO_FEATURE_SCHEMA.fields
    )

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        def feats(b: bytes):
            try:
                with wave.open(io.BytesIO(bytes(b))) as w:
                    if w.getsampwidth() != 2:
                        return None, None, None
                    raw = w.readframes(w.getnframes())
                x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                if x.size == 0:
                    return None, None, None
                x /= 32768.0
                ax = np.abs(x)
                return (
                    float(np.sqrt(np.mean(x * x))),
                    float(ax.max()),
                    float((ax >= clip_threshold).mean()),
                )
            except Exception:  # noqa: BLE001 -- corrupt payload -> nulls
                return None, None, None

        for pdf in batches:
            out = [feats(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "rms": [o[0] for o in out],
                    "peak": [o[1] for o in out],
                    "clipping_frac": [o[2] for o in out],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_feats, out_schema)


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.LongType()),
        T.StructField("n_frames_used", T.IntegerType()),
    ]
)


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame: int = 256,
    hop: int = 128,
    n_bits: int = 64,
) -> DataFrame:
    """64-bit spectral fingerprint per 16-bit PCM WAV payload --
    Haitsma-Kalker-style robust audio hashing, fully live in this
    build (stdlib ``wave`` + numpy rFFT, no codec libs):

    - frames of ``frame`` samples every ``hop`` (channel-averaged),
    - per-frame rFFT magnitude split into ``n_bits`` equal bands,
    - bit b votes +1 per frame where band b's energy INCREASED vs the
      previous frame, -1 where it decreased; the fingerprint sets bit
      b iff the net vote is positive.

    Energy-delta signs survive volume changes, re-encoding, and mild
    noise, so perturbed copies land within a small Hamming distance
    while unrelated audio is ~32 bits away -- the same 64-bit
    near-dup geometry as the text SimHash tier, which is exactly the
    point: :func:`audio_near_dup_pairs` reuses the banded-Hamming
    join, making this the multimodal leg of the dedup suite.

    Per-payload work is vectorized numpy inside the standard
    Arrow-batch ``mapInPandas`` plumbing; undecodable / non-16-bit /
    too-short payloads yield null fingerprints rather than failing
    the scan.
    """
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + AUDIO_FP_SCHEMA.fields
    )

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        def fingerprint(b: bytes):
            try:
                with wave.open(io.BytesIO(bytes(b))) as w:
                    if w.getsampwidth() != 2:
                        return None, None
                    ch = w.getnchannels()
                    raw = w.readframes(w.getnframes())
                x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                if ch > 1:
                    x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(1)
                if x.size < frame + hop:
                    return None, None  # too short for a delta vote
                n_frames = 1 + (x.size - frame) // hop
                idx = (
                    np.arange(frame)[None, :]
                    + hop * np.arange(n_frames)[:, None]
                )
                mags = np.abs(np.fft.rfft(x[idx], axis=1))
                # drop DC, split the remaining bins into n_bits bands
                usable = mags[:, 1:]
                width = usable.shape[1] // n_bits
                if width == 0:
                    return None, None
                bands = usable[:, : width * n_bits].reshape(
                    n_frames, n_bits, width
                ).sum(axis=2)
                votes = np.sign(np.diff(bands, axis=0)).sum(axis=0)
                bits = (votes > 0).astype(np.uint64)
                fp = 0
                for i in range(n_bits):
                    fp |= int(bits[i]) << i
                # reinterpret as signed 64-bit for Spark's LongType
                if fp >= 1 << 63:
                    fp -= 1 << 64
                return fp, n_frames
            except Exception:  # noqa: BLE001 -- corrupt payload -> nulls
                return None, None

        for pdf in batches:
            out = [fingerprint(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "fingerprint": pd.array(
                        [o[0] for o in out], dtype="Int64"
                    ),
                    "n_frames_used": pd.array(
                        [o[1] for o in out], dtype="Int32"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_fp, out_schema)


def audio_near_dup_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fingerprint",
    max_hamming: int = 8,
    n_bands: int = 8,
) -> DataFrame:
    """Near-duplicate audio pairs from 64-bit fingerprints: banded
    equi-join (the SimHash tier's pigeonhole blocking -- any pair
    within ``max_hamming <= n_bands - 1`` bits shares at least one
    exact band) + ``bit_count`` verify BEFORE any exchange of
    results. Returns (id_a, id_b, hamming). Null fingerprints
    (undecodable audio) never pair."""
    band_width = 64 // n_bands
    mask = (1 << band_width) - 1
    f = fps.filter(F.col(fp_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(fp_col).alias("fp")
    )
    banded = f.select(
        "id", "fp",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned("fp", i * band_width)
                    .bitwiseAND(F.lit(mask))
                    .alias("key"),
                )
                for i in range(n_bands)
            ])
        ).alias("bk"),
    ).select("id", "fp", "bk.band", "bk.key")
    a = banded.select(
        F.col("id").alias("id_a"), F.col("fp").alias("fp_a"),
        "band", "key",
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("fp").alias("fp_b"),
        "band", "key",
    )
    ham = F.bit_count(
        F.col("fp_a").bitwiseXOR(F.col("fp_b"))
    ).cast("int")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


IMAGE_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("dhash", T.LongType()),
        T.StructField("img_w", T.IntegerType()),
        T.StructField("img_h", T.IntegerType()),
    ]
)


def _gray_dhash_fold(rgb, grid: int = 8) -> int | None:
    """The shared gray -> thumbnail -> gradient fold behind every
    image dHash path: an (h, w, 3) uint8 RGB array in, a signed
    64-bit fingerprint out (None when the grid doesn't fit).

    Kept as ONE function so the native-BMP tier (:func:`image_dhash`)
    and the codec-decoded tier (:func:`image_dhash_decoded`) are
    bit-identical by construction: integer grayscale
    ((299 r + 587 g + 114 b) // 1000), area-average to a
    (grid x grid+1) thumbnail on integer block boundaries
    (i*h // grid), bit (y, x) = thumb[y][x+1] > thumb[y][x].
    """
    import numpy as np

    h, w = rgb.shape[0], rgb.shape[1]
    if w < grid + 1 or h < grid:
        return None
    px = rgb.astype(np.int64)
    gray = (
        299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    ) // 1000
    ys = [i * h // grid for i in range(grid + 1)]
    xs = [i * w // (grid + 1) for i in range(grid + 2)]
    thumb = np.array([
        [
            gray[ys[r]:ys[r + 1], xs[c]:xs[c + 1]].mean()
            for c in range(grid + 1)
        ]
        for r in range(grid)
    ])
    bits = (thumb[:, 1:] > thumb[:, :-1]).astype(np.uint64)
    fp = 0
    for i, bit in enumerate(bits.ravel()):
        fp |= int(bit) << i
    if fp >= 1 << 63:  # LongType is signed
        fp -= 1 << 64
    return fp


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 8,
) -> DataFrame:
    """64-bit difference hash (dHash) per image payload -- the image
    leg of the near-dup suite, fully LIVE for uncompressed 24-bit BMP
    (the format is a struct-unpackable header + raw BGR rows, so no
    codec library is needed -- the WAV/stdlib stance of
    :func:`audio_fingerprint` applied to images; JPEG/PNG route
    through :func:`image_dhash_decoded`, the PIL-decoded composition
    sharing this exact fold).

    The classic perceptual-hash recipe: integer-grayscale
    ((299 r + 587 g + 114 b) // 1000), area-average to a
    (grid x grid+1) thumbnail using integer block boundaries
    (i*h // grid), then bit (y, x) = thumb[y][x+1] > thumb[y][x].
    Gradient-direction bits survive brightness/contrast shifts and
    mild noise, so perturbed copies land within a small Hamming
    distance -- the same 64-bit geometry as the audio fingerprint and
    text SimHash tiers, which is the point:
    :func:`fingerprint_near_dup_pairs` (the banded-Hamming join)
    serves all three modalities.

    Vectorized numpy inside Arrow-batch ``mapInPandas``; undecodable
    / non-24-bit / compressed / tiny payloads yield null hashes
    rather than failing the scan.
    """
    return _dhash_over(df, _native_bmp_rgb, payload_col, id_col, grid)


def _dhash_over(
    df: DataFrame,
    decoder,
    payload_col: str,
    id_col: str,
    grid: int,
) -> DataFrame:
    """Shared mapInPandas plumbing: run ``decoder`` (bytes ->
    (h, w, 3) uint8 RGB array or None) then :func:`_gray_dhash_fold`
    over every payload. ``decoder`` must be a module-level (picklable)
    function -- it ships to executors inside the task closure."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + IMAGE_DHASH_SCHEMA.fields
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def dhash(b):
            try:
                rgb = decoder(bytes(b))
                if rgb is None:
                    return None, None, None
                fp = _gray_dhash_fold(rgb, grid)
                if fp is None:
                    return None, None, None
                return fp, int(rgb.shape[1]), int(rgb.shape[0])
            except Exception:  # noqa: BLE001 -- corrupt payload -> nulls
                return None, None, None

        for pdf in batches:
            out = [dhash(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "dhash": pd.array([o[0] for o in out], dtype="Int64"),
                    "img_w": pd.array([o[1] for o in out], dtype="Int32"),
                    "img_h": pd.array([o[2] for o in out], dtype="Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_hash, out_schema)


def _native_bmp_rgb(b: bytes):
    """Decode an uncompressed 24-bit BMP payload to an (h, w, 3)
    uint8 RGB array with no codec library -- the native tier's
    decoder. Returns None for anything else (compressed, paletted,
    truncated, non-BMP)."""
    import struct

    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        return None
    off, = struct.unpack_from("<I", b, 10)
    w, h = struct.unpack_from("<ii", b, 18)
    bpp, = struct.unpack_from("<H", b, 28)
    comp, = struct.unpack_from("<I", b, 30)
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    if bpp != 24 or comp != 0 or w <= 0 or h <= 0:
        return None
    stride = ((3 * w + 3) // 4) * 4
    if off + stride * h > len(b):
        return None
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    # BMP stores BGR -> RGB
    return rows[:, :, ::-1]


def _pil_rgb(b: bytes):
    """Decode any PIL-supported payload (JPEG/PNG/BMP/...) to an
    (h, w, 3) uint8 RGB array. Import happens inside the call so the
    function object pickles to executors cleanly; the plan-time guard
    in :func:`image_dhash_decoded` already proved PIL importable."""
    import io

    import numpy as np

    from PIL import Image

    with Image.open(io.BytesIO(b)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def image_dhash_decoded(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 8,
    decoder=None,
) -> DataFrame:
    """dHash over CODEC-DECODED images -- the composition that makes
    the perceptual tier reachable on a real crawl corpus (round-11
    verdict item 3): :func:`decode_image`'s pixel grid (PIL: JPEG,
    PNG, BMP, ...) fed through the SAME gray -> thumbnail -> gradient
    fold as the native-BMP :func:`image_dhash`
    (:func:`_gray_dhash_fold`), so the two tiers are bit-identical on
    payloads both can decode and their hashes live in one 64-bit
    space -- one corpus can mix BMP landings with JPEG crawls and
    :func:`image_near_dup_pairs` still joins across them. A
    re-encoded JPEG copy of a BMP lands within a small Hamming
    distance of the original (lossy DCT noise moves few
    gradient-direction bits; pytest plants exactly that clone).

    Import-guarded like :func:`decode_image`: PIL is probed on the
    DRIVER at plan time, failing fast instead of inside executor
    tasks. ``decoder`` injects an alternative module-level
    bytes -> RGB-array function (tests exercise the full composed
    path with :func:`_native_bmp_rgb`, PIL-free); undecodable
    payloads yield null hashes, never a failed 100 TB scan.
    """
    if decoder is None:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "image_dhash_decoded requires PIL (pillow) unless an "
                "explicit decoder= is injected; not available in this "
                "build. The native-BMP tier (image_dhash) stays live."
            ) from exc
        decoder = _pil_rgb
    return _dhash_over(df, decoder, payload_col, id_col, grid)


def image_near_dup_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 8,
    n_bands: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs from 64-bit dHashes: the SAME
    banded-Hamming pigeonhole join the audio tier uses (any pair
    within max_hamming <= n_bands - 1 bits shares one exact band) --
    one fingerprint geometry, three modalities."""
    return audio_near_dup_pairs(
        hashes, id_col=id_col, fp_col=hash_col,
        max_hamming=max_hamming, n_bands=n_bands,
    )


def _video_track_sample_ranges(buf: bytes, moov_s: int, moov_e: int):
    """(offset, size) of every sample (encoded frame) of the first
    video track, from the stbl's stsz (sizes) + stsc (sample->chunk
    runs) + stco/co64 (chunk offsets). This is the container-level
    frame EXTRACTION the stts walker stops short of: with byte
    ranges, frames can be hashed/deduped/shipped without any codec.
    Returns None when any required box is missing/truncated."""
    for btype, s, e in _iter_boxes(buf, moov_s, moov_e):
        if btype != b"trak":
            continue
        mdia = _find_box(buf, s, e, b"mdia")
        if not mdia:
            continue
        hdlr = _find_box(buf, *mdia, b"hdlr")
        if not hdlr or buf[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        stbl = _find_box(buf, *mdia, b"minf", b"stbl")
        if not stbl:
            return None
        stsz = _find_box(buf, *stbl, b"stsz")
        stsc = _find_box(buf, *stbl, b"stsc")
        stco = _find_box(buf, *stbl, b"stco")
        co64 = None if stco else _find_box(buf, *stbl, b"co64")
        if not stsz or not stsc or not (stco or co64):
            return None
        # stsz: version+flags, uniform_size, count [, size per sample]
        zs, ze = stsz
        if zs + 12 > ze:
            return None
        uniform = int.from_bytes(buf[zs + 4:zs + 8], "big")
        n_samples = int.from_bytes(buf[zs + 8:zs + 12], "big")
        if uniform:
            sizes = [uniform] * n_samples
        else:
            if zs + 12 + 4 * n_samples > ze:
                return None
            sizes = [
                int.from_bytes(buf[zs + 12 + 4 * i:zs + 16 + 4 * i],
                               "big")
                for i in range(n_samples)
            ]
        # chunk offsets
        cs, ce = stco if stco else co64
        width = 4 if stco else 8
        if cs + 8 > ce:
            return None
        n_chunks = int.from_bytes(buf[cs + 4:cs + 8], "big")
        if cs + 8 + width * n_chunks > ce:
            return None
        offsets = [
            int.from_bytes(
                buf[cs + 8 + width * i:cs + 8 + width * (i + 1)], "big"
            )
            for i in range(n_chunks)
        ]
        # stsc runs: (first_chunk 1-based, samples_per_chunk, sdi)
        ss, se = stsc
        if ss + 8 > se:
            return None
        n_runs = int.from_bytes(buf[ss + 4:ss + 8], "big")
        if ss + 8 + 12 * n_runs > se:
            return None
        runs = [
            (
                int.from_bytes(buf[ss + 8 + 12 * i:ss + 12 + 12 * i],
                               "big"),
                int.from_bytes(buf[ss + 12 + 12 * i:ss + 16 + 12 * i],
                               "big"),
            )
            for i in range(n_runs)
        ]
        # walk chunks; each run applies until the next run's chunk
        ranges, si = [], 0
        for ci in range(n_chunks):
            per = 0
            for first, spc in runs:
                if first <= ci + 1:
                    per = spc
                else:
                    break
            off = offsets[ci]
            for _ in range(per):
                if si >= n_samples:
                    break
                ranges.append((off, sizes[si]))
                off += sizes[si]
                si += 1
        return ranges if si == n_samples else None
    return None


FRAME_HASH_SCHEMA_FIELDS = [
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_hash", T.LongType()),
]


def frame_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 1,
) -> DataFrame:
    """Per-frame content hashes over video payloads: one row per
    selected sample -- (id, frame_idx, frame_hash) where frame_hash
    is the signed-int64 of the first 8 md5 bytes of the frame's
    ENCODED byte range (stsz/stsc/stco walk). Byte-identical encoded
    frames -- re-muxed, copied, or concatenated clips -- hash equal
    with no codec anywhere; rows stay linear in sampled frames.
    Corrupt/non-MP4 payloads yield zero rows, not errors."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + FRAME_HASH_SCHEMA_FIELDS
    )

    def _hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, hs = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    b = bytes(b)
                    moov = _find_box(b, 0, len(b), b"moov")
                    ranges = (
                        _video_track_sample_ranges(b, *moov)
                        if moov else None
                    )
                except Exception:  # noqa: BLE001
                    ranges = None
                for k in range(0, len(ranges or []), every_n):
                    off, size = ranges[k]
                    if off + size > len(b):
                        continue
                    d = hashlib.md5(b[off:off + size]).digest()[:8]
                    h = int.from_bytes(d, "big", signed=True)
                    ids.append(i)
                    idxs.append(k)
                    hs.append(h)
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_hash": pd.array(hs, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_hashes, out_schema)


def video_near_dup_pairs(
    fhashes: DataFrame,
    id_col: str = "doc_id",
    min_overlap_ppm: int = 500_000,
    max_ids_per_hash: int | None = 1000,
) -> DataFrame:
    """Near-duplicate video pairs from per-frame content hashes: the
    inverted-index shape of the n-gram text tier, with frames as the
    shingles. DISTINCT (id, frame_hash) postings equi-join on
    frame_hash (never an all-pairs join), shared-frame counts roll up
    per pair, and the pair qualifies at
    ``overlap_ppm = shared * 1e6 div min(n_a, n_b) >= min_overlap_ppm``
    (containment, so a clip cut from a longer video still pairs).
    ``max_ids_per_hash`` drops degenerate frames shared by more
    videos than the cap (black frames, slates -- the stop-shingle
    guard) BEFORE the join, bounding every posting list. Returns
    (id_a, id_b, n_shared, overlap_ppm)."""
    posts = fhashes.select(
        F.col(id_col).alias("id"), "frame_hash"
    ).distinct()
    if max_ids_per_hash is not None:
        hot = posts.groupBy("frame_hash").agg(
            F.count(F.lit(1)).alias("df_")
        ).filter(F.col("df_") > max_ids_per_hash).select("frame_hash")
        posts = posts.join(F.broadcast(hot), "frame_hash", "left_anti")
    sizes = posts.groupBy("id").agg(F.count(F.lit(1)).alias("n_frames"))
    a = posts.select(F.col("id").alias("id_a"), "frame_hash")
    b = posts.select(F.col("id").alias("id_b"), "frame_hash")
    shared = (
        a.join(b, "frame_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            sizes.select(F.col("id").alias("id_a"),
                         F.col("n_frames").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"),
                         F.col("n_frames").alias("n_b")),
            "id_b",
        )
        .select(
            "id_a", "id_b", "n_shared",
            F.expr(
                "n_shared * CAST(1000000 AS BIGINT) div least(n_a, n_b)"
            ).alias("overlap_ppm"),
        )
        .filter(F.col("overlap_ppm") >= min_overlap_ppm)
    )
