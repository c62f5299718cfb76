"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a typed metadata struct,
processed via Arrow-batched ``mapInPandas`` — the only operator family where
Python is the right tool (codec libraries). The Spark-side plumbing (schemas,
batch shapes, partitioning) is real and tested; the codec call itself is
STUBBED behind ``_decode_stub`` because image/audio libraries are not in this
container — swap ``_decode_stub`` for PIL/torchaudio/pyav in production.

Scale notes:
- payloads stay in executor memory exactly one Arrow batch at a time
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory);
- decode is embarrassingly parallel — no shuffle anywhere in the family;
- metadata-only queries (see ``q_binary_meta`` in textanalysis.py) never
  touch the payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", StringType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)

N_FEATURES = 8


def _decode_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decode + featurize'.

    Production swap-in: PIL decode → resize → CNN embed (images),
    torchaudio load → mel features (audio), pyav frame-sample (video).
    The fake derives N_FEATURES floats from the payload digest so tests are
    reproducible and the full Arrow round-trip is exercised."""
    if payload is None:
        raise NotImplementedError("real codecs unavailable in this container")
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(N_FEATURES)]


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/featurize via mapInPandas: Arrow batches in, Arrow batches out.

    Column pruning upstream means only (media_id, kind, payload) cross the
    Python boundary; the returned frame is narrow (id + small feature vector),
    so downstream joins/aggregations are cheap regardless of payload size."""
    src = media.select("media_id", "kind", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes, checksums, features = [], [], []
            # one pass, one digest per payload (checksum + features share it)
            for b in pdf["payload"]:
                if b is None:
                    n_bytes.append(0)
                    checksums.append(hashlib.md5(b"").hexdigest()[:8])
                    features.append([0.0] * N_FEATURES)
                    continue
                digest = hashlib.md5(b)
                n_bytes.append(len(b))
                checksums.append(digest.hexdigest()[:8])
                raw = digest.digest()
                features.append([raw[i] / 255.0 for i in range(N_FEATURES)])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "checksum": checksums,
                    "features": features,
                }
            )

    return src.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp.

    The timestamp grid is computed JVM-side (sequence + explode) from
    duration metadata — the expensive per-frame decode happens only after
    sampling, on the reduced row set, via ``extract_features``."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "sample_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "sample_ms", "payload")
    )


def resize_plan(media: DataFrame, max_px: int = 256) -> DataFrame:
    """Resize planning: JVM-side computation of target dims (aspect-preserving
    clamp to ``max_px``); the pixel work itself belongs in the decode stub."""
    scale = F.least(
        F.lit(1.0),
        max_px / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.withColumn(
        "target_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn("target_height", F.ceil(F.col("height") * scale).cast("int"))


from pyspark.sql import SparkSession  # noqa: E402

from projet_data_engineering_spark.io import load_table, spread  # noqa: E402
from projet_data_engineering_spark.registry import query  # noqa: E402


@query(
    "q_media_features",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           substr(md5(text), 1, 8) AS checksum,
           ROUND(CAST(concat('0x', substr(md5(text), 1, 2)) AS INT) / 255.0, 4)
               AS f0,
           ROUND(CAST(concat('0x', substr(md5(text), 15, 2)) AS INT) / 255.0, 4)
               AS f7
    FROM documents
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction end-to-end on driver data: documents'
    text bytes stand in for opaque media payloads (this container has no
    codec libraries — ``_decode_stub`` marks the swap point), flowing through
    the real Arrow plumbing: column-pruned payload scan → mapInPandas
    batches → narrow (id, meta, features) output ready for similarity joins.
    Python-side math is per-batch vectorizable; no shuffle anywhere.

    The stub features are md5-digest bytes, so even this Python path is
    oracle-checked exactly: DuckDB recomputes n_bytes/checksum/feature bytes
    from the same UTF-8 payload — the Arrow round-trip is verified
    bit-for-bit, not just rows-only."""
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        "checksum",
        F.round(F.element_at("features", 1), 4).alias("f0"),
        F.round(F.element_at("features", N_FEATURES), 4).alias("f7"),
    )
