"""Structured Streaming over the DOCUMENTS corpus — the incremental
form of the text-cleaning pipeline.

The reference has no streaming (SURVEY.md §2.3); this is extension
surface.  At 100 TB the corpus does not arrive as one parquet snapshot:
crawl shards land continuously, and the cleaning passes (PII redaction,
quality scoring, filtering) must run incrementally on each micro-batch
without a backfill job.  All three passes here are MAP-ONLY
projections, so the streaming plan is the same whole-stage-codegen
expression pipeline as the batch operators — no state, no watermark, no
shuffle; throughput scales with input partitions.

Design guarantee: the streaming pipeline REUSES the batch operators'
expression builders (``redact_pii_frame``, the quality-score blend), so
batch and stream can never drift — the parity tests assert equal
results on a staged directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_documents_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-source stream over a directory of documents parquet files —
    each newly-landed crawl shard becomes a micro-batch."""
    return spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(docs_dir)


def streaming_redact_pii(docs: DataFrame) -> DataFrame:
    """Incremental PII redaction: the batch ``redact_pii_frame``
    expressions applied per micro-batch (map-only, stateless)."""
    from mini_hadoop_spark.operators.text_analysis import redact_pii_frame

    return redact_pii_frame(docs)


def streaming_clean_pipeline(docs: DataFrame, min_quality: float | None = None) -> DataFrame:
    """Redact → quality-score → filter, incrementally: the streaming form
    of the corpus-cleaning front half.  (Exact DEDUP deliberately stays
    batch/stateful — content-hash state over an unbounded corpus needs a
    TTL policy, which events-style ``streaming/stateful.py`` shows; the
    map-only passes here are the ones safe to run stateless.)"""
    from mini_hadoop_spark.operators.text_analysis import (
        QUALITY_KEEP_THRESHOLD,
        _quality_parts,
    )
    from mini_hadoop_spark.functions.text import round_half_up

    if min_quality is None:
        min_quality = QUALITY_KEEP_THRESHOLD
    red = streaming_redact_pii(docs).select(
        "doc_id", "n_emails", "n_urls", "n_numbers",
        F.col("redacted_text").alias("text"),
    )
    *_rest, score = _quality_parts()
    scored = red.withColumn("quality_score", round_half_up(score, 6))
    return scored.filter(F.col("quality_score") >= min_quality).select(
        "doc_id", "n_emails", "n_urls", "n_numbers", "quality_score"
    )
