"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a typed metadata struct,
processed via Arrow-batched ``mapInPandas`` — the only operator family where
Python is the right tool (codec libraries). The Spark-side plumbing (schemas,
batch shapes, partitioning) is real and tested. Header-level decode is REAL
for the two stdlib-parsable container formats — BMP dimensions and RIFF/WAVE
duration via ``struct`` (``decode_media``) — while pixel/sample decode and
compressed codecs (PNG/JPEG/MP4) raise ``NotImplementedError`` at the marked
swap point (``_decode_stub``): no image/audio libraries in this container;
swap in PIL/torchaudio/pyav in production.

Scale notes:
- payloads stay in executor memory exactly one Arrow batch at a time
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory);
- decode is embarrassingly parallel — no shuffle anywhere in the family;
- metadata-only queries (see ``q_binary_meta`` in textanalysis.py) never
  touch the payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
import struct
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
        # header-decoded metadata — filled when decode_media recognizes the
        # container (BMP/WAV), NULL for formats needing a real codec library
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

N_FEATURES = 8


def decode_media(payload: bytes) -> dict:
    """REAL header decode for stdlib-parsable containers, no dependencies.

    - BMP (``BM`` magic): width/height from the BITMAPINFOHEADER int32s at
      byte offsets 18/22 (height may be negative = top-down row order; the
      magnitude is the pixel height).
    - WAV (``RIFF..WAVE``): walks the RIFF chunk list with ``struct``; the
      ``fmt `` chunk yields byte_rate, the ``data`` chunk its size;
      duration_ms = data_size * 1000 // byte_rate.

    Anything else (PNG/JPEG/MP4/...) needs a real codec library and raises —
    same loud-failure policy as ``crawl.default_fetch``.

    Returns ``{"mime", "width", "height", "duration_ms"}`` (absent
    dimensions/duration are None)."""
    if payload is None:
        raise NotImplementedError("null payload: nothing to decode")
    b = bytes(payload)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack_from("<ii", b, 18)
        return {
            "mime": "image/bmp",
            "width": w,
            "height": abs(h),
            "duration_ms": None,
        }
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        byte_rate = None
        data_size = None
        off = 12
        while off + 8 <= len(b):
            cid, sz = struct.unpack_from("<4sI", b, off)
            if cid == b"fmt " and off + 20 <= len(b):
                byte_rate = struct.unpack_from("<I", b, off + 16)[0]
            elif cid == b"data":
                data_size = sz
            off += 8 + sz + (sz & 1)  # chunks are word-aligned
        if byte_rate and data_size is not None:
            return {
                "mime": "audio/wav",
                "width": None,
                "height": None,
                "duration_ms": data_size * 1000 // byte_rate,
            }
        raise NotImplementedError("malformed WAV: missing fmt/data chunk")
    raise NotImplementedError(
        "unrecognized container; only BMP/WAV decode without codec libraries"
    )


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
            mimes, widths, heights, durations = [], [], [], []
            # one pass, one digest per payload (checksum + features share it)
            for b in pdf["payload"]:
                try:
                    meta = decode_media(b)
                except NotImplementedError:
                    meta = {}  # needs a real codec (or null payload)
                mimes.append(meta.get("mime"))
                widths.append(meta.get("width"))
                heights.append(meta.get("height"))
                durations.append(meta.get("duration_ms"))
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
                    "mime": mimes,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array(durations, dtype="Int64"),
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


def _le_hex(col, n_bytes: int):
    """Fixed-width little-endian hex rendering of a non-negative integer
    column — the JVM-side byte-builder for binary fixtures (consumed by
    ``unhex``). Byte i of the output is the i-th least significant byte."""
    hx = F.lpad(F.hex(col.cast("bigint")), 2 * n_bytes, "0")
    return F.concat(
        *[
            F.substring(hx, 2 * (n_bytes - 1 - i) + 1, 2)
            for i in range(n_bytes)
        ]
    )


@query(
    "q_media_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END
               AS mime,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 54 ELSE 44 END AS BIGINT)
               AS n_bytes,
           CAST(CASE WHEN doc_id % 2 = 0 THEN n_chars % 1920 + 32 END AS INT)
               AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id * 7) % 1080 + 32 END
                AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 1 THEN
                ((n_chars * 131) % 200000 + 4000) * 1000 //
                (8000 * (1 + n_chars % 3) * ((doc_id % 4 + 1) // 2) * 2)
           END AS BIGINT) AS duration_ms
    FROM documents
    """,
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode end-to-end: genuine BMP headers (even doc_ids)
    and RIFF/WAVE files (odd doc_ids) are assembled JVM-side byte-for-byte
    (``unhex`` over little-endian hex fields derived from document columns),
    cross the Arrow boundary as binary payloads, and ``decode_media`` parses
    them back with stdlib ``struct`` inside ``mapInPandas``. The oracle
    recomputes the expected dimensions/duration from the same generating
    formulas — a wrong offset, endianness slip, or chunk-walk bug in the
    decoder breaks the hash match. No codec library involved: BMP and WAV
    are header-parsable by design."""
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    even = F.col("doc_id") % 2 == 0
    width = F.col("n_chars") % 1920 + 32
    height = (F.col("doc_id") * 7) % 1080 + 32
    bmp_hex = F.concat(
        F.lit("424D"),              # 'BM'
        _le_hex(F.lit(54), 4),      # file size (header-only fixture)
        F.lit("00000000"),          # reserved
        _le_hex(F.lit(54), 4),      # pixel-data offset
        _le_hex(F.lit(40), 4),      # BITMAPINFOHEADER size
        _le_hex(width, 4),          # width  @ byte 18
        _le_hex(height, 4),         # height @ byte 22
        F.lit("0100"),              # planes = 1
        F.lit("1800"),              # 24 bpp
        F.lit("00000000"),          # BI_RGB
        F.lit("00000000"),          # image size (0 ok for BI_RGB)
        _le_hex(F.lit(2835), 4),    # x px/m
        _le_hex(F.lit(2835), 4),    # y px/m
        F.lit("00000000"),          # palette colors
        F.lit("00000000"),          # important colors
    )
    channels = F.expr("(doc_id % 4 + 1) div 2")       # 1 or 2
    rate = 8000 * (1 + F.col("n_chars") % 3)          # 8/16/24 kHz
    byte_rate = rate * channels * 2                   # 16-bit PCM
    data_size = (F.col("n_chars") * 131) % 200000 + 4000
    wav_hex = F.concat(
        F.lit("52494646"),          # 'RIFF'
        _le_hex(data_size + 36, 4), # riff size
        F.lit("57415645"),          # 'WAVE'
        F.lit("666D7420"),          # 'fmt '
        _le_hex(F.lit(16), 4),      # fmt chunk size
        F.lit("0100"),              # PCM
        _le_hex(channels, 2),
        _le_hex(rate, 4),
        _le_hex(byte_rate, 4),
        _le_hex(channels * 2, 2),   # block align
        F.lit("1000"),              # 16 bits/sample
        F.lit("64617461"),          # 'data'
        _le_hex(data_size, 4),      # declared size (samples not written)
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(even, F.lit("image")).otherwise(F.lit("audio")).alias("kind"),
        F.unhex(F.when(even, bmp_hex).otherwise(wav_hex)).alias("payload"),
    )
    return extract_features(media).select(
        "media_id", "mime", "n_bytes", "width", "height", "duration_ms"
    )


@query(
    "q_media_resize",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id,
               CAST(n_chars % 1920 + 32 AS INT) AS width,
               CAST((doc_id * 7) % 1080 + 32 AS INT) AS height
        FROM documents
    )
    SELECT media_id, width, height,
           CAST(CEIL(width * LEAST(1.0, 256.0 / GREATEST(width, height)))
                AS INT) AS target_width,
           CAST(CEIL(height * LEAST(1.0, 256.0 / GREATEST(width, height)))
                AS INT) AS target_height
    FROM media
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over typed media metadata: aspect-preserving clamp to
    a 256-px long edge, computed ENTIRELY from the metadata struct — the
    payload column is never read (parquet pruning), and the pixel work is
    deferred to the decode stub on the already-planned dimensions. Synthetic
    width/height derive from document columns so the oracle is exact."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 1920 + 32).cast("int").alias("width"),
        ((F.col("doc_id") * 7) % 1080 + 32).cast("int").alias("height"),
    )
    return resize_plan(media, max_px=256).select(
        "media_id", "width", "height", "target_width", "target_height"
    )


@query(
    "q_media_frame_sample",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id, n_chars * 13 AS duration_ms
        FROM documents WHERE doc_id % 7 = 0
    )
    SELECT media_id,
           COUNT(*) AS n_frames,
           CAST(MAX(s) AS BIGINT) AS last_ms
    FROM media, UNNEST(generate_series(0, GREATEST(duration_ms - 1, 0), 250))
         AS t(s)
    GROUP BY media_id
    """,
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: the per-media timestamp grid is JVM
    generated (sequence + explode over duration metadata) so the expensive
    per-frame decode — stubbed here — runs only on the sampled subset. The
    query returns the sampling plan's shape (frames per video, last sample
    offset), which the oracle reproduces with generate_series."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit(None).cast("binary").alias("payload"),
        (F.col("n_chars") * 13).alias("duration_ms"),
    )
    frames = frame_sample(media, every_ms=250)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.max("sample_ms").cast("long").alias("last_ms"),
    )
