"""Multimodal column handling: image/audio/video as opaque `binary`
columns with typed metadata, plus Pandas-UDF decode/feature plumbing.

The Spark-side contract is real and tested — schema, partitioning, UDF
signatures, Arrow batch shapes. The actual codec work is stubbed behind
`DECODERS` (image/audio libraries are not in this container): each stub
is deterministic so tests can assert end-to-end behavior, and raises
`NotImplementedError` through :func:`require_real_decoder` when a caller
demands real decoding.

Schema model (SURVEY §1.3 String/Binary row; FixedString -> binary):

    payload  binary          -- the opaque media bytes
    media    struct<mime: string, n_bytes: int, checksum: string>
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.StringType(), False),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Wrap a source column as an opaque media payload + typed metadata.

    In production the payload column arrives from the lakehouse already
    binary (parquet BYTE_ARRAY); here we derive it from text so the whole
    path is testable. Metadata is computed JVM-side (octet_length / sha2),
    not in Python.
    """
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.sha2(F.col(text_col), 256).alias("checksum"),
        ).alias("media"),
    )


def _fake_image_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decoder: derives a fake
    (width, height, feature vector) from the payload bytes. Replace with
    a real decoder (PIL/torchvision) in production."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % (1 << 31)
    width = 16 + h % 1024
    height = 16 + (h // 1024) % 1024
    feats = [((h >> (i * 3)) % 256) / 255.0 for i in range(FEATURE_DIM)]
    return width, height, feats


DECODERS = {
    "application/octet-stream": _fake_image_decode,
    # "image/jpeg": <real decoder>,  -- not available in this container
}


def require_real_decoder(mime: str):
    """Call when a pipeline needs genuine media decoding."""
    raise NotImplementedError(
        f"real decoder for {mime!r} is not bundled in this environment; "
        "register one in clickhouse_arrow_spark.operators.multimodal.DECODERS"
    )


def decode_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode payloads to feature rows via `mapInPandas`.

    Arrow-batched: each partition streams pandas DataFrames through the
    decoder; no per-row Python calls across the serialization boundary,
    no driver involvement. Output schema is fixed (`FEATURE_SCHEMA`) so
    downstream joins/ANN are plannable before decode runs.
    """
    from clickhouse_arrow_spark.operators.dedup import _spread

    df = _spread(df, "doc_id")  # one Python worker per core, not per file

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "mime": pdf["media"].map(lambda m: m["mime"]),
                "width": [],
                "height": [],
                "features": [],
            }
            for payload, meta in zip(pdf["payload"], pdf["media"]):
                decoder = DECODERS.get(meta["mime"])
                if decoder is None:
                    require_real_decoder(meta["mime"])
                w, h, feats = decoder(bytes(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame-sampling plumbing: emit (doc_id, frame_idx) rows for
    every n-th frame of a fake 100-frame clip — the explode pattern that
    real frame extraction plugs into (posexplode over the decoded frame
    array). Deterministic and fully planned before any codec runs."""
    frames = F.sequence(F.lit(0), F.lit(99), F.lit(every_n))
    return df.select(
        F.col(id_col), F.explode(frames).alias("frame_idx")
    )
