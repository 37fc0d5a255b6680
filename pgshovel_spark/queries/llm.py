"""Multimodal-column pipeline queries (north-star surface).

The documents' text bytes stand in for opaque media payloads (no
media fixtures in the testdata); the OPERATORS under test
(pgshovel_spark.operators.multimodal) are payload-agnostic
mapInPandas stages.  The oracles recompute the deterministic fake
decode arithmetic in SQL, pinning the full Arrow round-trip:
binary cast -> mapInPandas batches -> typed schema out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgshovel_spark.operators.multimodal import extract_media_features, sample_frames
from pgshovel_spark.sources.tables import load_table


def _media(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # spread the single-file fixture across cores so the Arrow
    # mapInPandas stages run one python worker per partition, not one
    # worker total.
    return d.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )


def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary feature extraction via Arrow mapInPandas."""
    return extract_media_features(_media(spark, sf_dir), "doc_id", "payload")


_MM_FEATURES_SQL = """
SELECT
  doc_id,
  CAST(length(text) AS BIGINT) AS n_bytes,
  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
  CAST((ascii(substring(text, 1, 1)) % 64 + 1) * 16 AS BIGINT) AS width,
  CAST((length(text) % 64 + 1) * 16 AS BIGINT) AS height
FROM documents
"""


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many frame sampling (every 3rd 100-byte 'frame')."""
    return sample_frames(_media(spark, sf_dir), "doc_id", "payload", 100, 3)


_MM_FRAME_SAMPLE_SQL = """
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(f * 100 AS BIGINT) AS frame_offset_bytes
FROM documents,
     LATERAL (SELECT unnest(generate_series(0, length(text) // 100 - 1, 3)) AS f)
WHERE length(text) >= 100
"""


QUERIES = {
    "q_mm_features": q_mm_features,
    "q_mm_frame_sample": q_mm_frame_sample,
}

ORACLES = {
    "q_mm_features": _MM_FEATURES_SQL,
    "q_mm_frame_sample": _MM_FRAME_SAMPLE_SQL,
}
