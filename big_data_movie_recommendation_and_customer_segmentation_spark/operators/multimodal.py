"""Multimodal (image/audio/video) column operators — plumbing-real,
decode-stubbed (north-star extension).

Design: media travel as opaque ``binary`` payload columns with a
typed metadata struct alongside:

    media: struct<payload: binary,
                  mime: string, width: int, height: int,
                  duration_ms: long, sample_rate: int>

Decode / resize / frame-sample run as Arrow-batched ``mapInPandas``
operators: per-partition, zero shuffle, memory bounded by the Arrow
batch size (``spark.sql.execution.arrow.maxRecordsPerBatch`` — for
multi-MB payloads set it to O(10-100) rows at 100 TB). The actual
codec calls are STUBBED — the image/audio libraries are not in this
container — behind ``_decode_image_bytes``: deterministic fake
pixels when ``fake=True`` (tests), ``NotImplementedError``
otherwise. The Spark-side contract (schemas, batch iteration,
partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_FIELDS = (
    ("mime", T.StringType()),
    ("width", T.IntegerType()),
    ("height", T.IntegerType()),
    ("duration_ms", T.LongType()),
    ("sample_rate", T.IntegerType()),
)

MEDIA_SCHEMA = T.StructType(
    [T.StructField("payload", T.BinaryType())]
    + [T.StructField(n, t) for n, t in MEDIA_META_FIELDS]
)


def pack_media(payload: F.Column, mime: F.Column, **meta: F.Column) -> F.Column:
    """Assemble the media struct from columns (missing metadata →
    NULL)."""
    fields = [payload.alias("payload"), mime.alias("mime")]
    for name, _ in MEDIA_META_FIELDS[1:]:
        fields.append(meta.get(name, F.lit(None)).alias(name))
    return F.struct(*fields)


def synthetic_media_table(df: DataFrame, id_col: str, seed_col: str) -> DataFrame:
    """Deterministic fake media column for tests/benchmarks: payload
    bytes derived from a hash of ``seed_col`` so every run produces
    identical binaries without any media libs."""
    payload = F.encode(F.concat(F.lit("IMG:"), F.sha2(F.col(seed_col).cast("string"), 256)), "utf-8")
    media = pack_media(
        payload,
        F.lit("image/fake"),
        width=F.lit(64),
        height=F.lit(64),
    )
    return df.select(F.col(id_col), media.alias("media"))


def _decode_image_bytes(payload: bytes, fake: bool) -> list[float]:
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/libjpeg, not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    # deterministic 8-dim "features" from payload bytes
    acc = [0.0] * 8
    for i, b in enumerate(payload):
        acc[i % 8] += float(b)
    n = max(1.0, float(len(payload)))
    return [a / n for a in acc]


def extract_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    fake: bool = True,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode payloads and emit fixed-width feature vectors via
    Arrow-batched ``mapInPandas``. The iterator-of-batches shape is
    the real production contract: per-batch decode keeps peak memory
    at batch_size × payload, independent of partition size.
    Output: id, features array<float>, width, height."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _decode_image_bytes(p, fake)[:feature_dim] for p in pdf["payload"]
                    ],
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.width").alias("width"),
        F.col(f"{media_col}.height").alias("height"),
    )
    return flat.mapInPandas(batches, out_schema)


def extract_audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    fake: bool = True,
    frame_ms: int = 1000,
) -> DataFrame:
    """Audio leg of the multimodal triad: per-frame energy features
    via the same Arrow-batched ``mapInPandas`` contract as images —
    one output row per ``frame_ms`` window of each clip. Decode is
    stubbed (no audio codec here): with ``fake=True`` the per-frame
    "rms" is a deterministic function of (payload bytes, frame
    index), so schemas/row-amplification/batch shapes are real and
    reproducible. Output: id, frame_idx, rms float.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("rms", T.FloatType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, rms = [], [], []
            for mid, payload, dur in zip(
                pdf[id_col], pdf["payload"], pdf["duration_ms"]
            ):
                if not fake:
                    raise NotImplementedError(
                        "real audio decode requires an audio codec, not "
                        "present in this environment; pass fake=True"
                    )
                n_frames = max(1, int((dur or 0) // frame_ms))
                base = float(sum(payload[:64])) if payload is not None else 0.0
                for i in range(n_frames):
                    ids.append(mid)
                    frames.append(i)
                    rms.append((base * (i + 1)) % 997 / 997.0)
            yield pd.DataFrame({id_col: ids, "frame_idx": frames, "rms": rms})

    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.duration_ms").alias("duration_ms"),
    )
    return flat.mapInPandas(batches, out_schema)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (real frame extraction stubbed — emits frame offsets only).
    Pure column ops: ``sequence`` over the duration, ``explode`` —
    the row-amplification pattern a video pipeline needs, with no
    shuffle (explode is map-local)."""
    dur = F.coalesce(F.col(f"{media_col}.duration_ms"), F.lit(0).cast("long"))
    offsets = F.sequence(F.lit(0).cast("long"), dur, F.lit(every_ms).cast("long"))
    return df.select(
        F.col(id_col),
        F.explode(offsets).alias("frame_ms"),
    )
