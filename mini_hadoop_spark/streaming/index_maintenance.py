"""foreachBatch maintenance of a persistent dedup fingerprint index —
the streaming form of ``operators/dedup.py::dedup_incremental``.

The batch query answers "dedup ONE new batch against a static corpus";
a production crawl needs the loop form: every micro-batch of newly
landed documents is deduped (a) against the on-disk fingerprint index
and (b) within itself, and its surviving fingerprints are APPENDED to
the index, which the next batch then sees.  ``foreachBatch`` is the
Structured Streaming primitive for exactly this read-modify-append
cycle — the sink body is a plain batch plan, so the digest-keyed
anti-join posture of the batch operator carries over unchanged.

Delivery semantics: micro-batches run strictly sequentially, so there
is never a concurrent writer.  A batch REPLAYED after a successful
append is a no-op by construction — its hashes are already in the
index, so the anti-join emits nothing — which upgrades
foreachBatch's at-least-once to effectively-once for this sink.  (A
crash BETWEEN the parquet append and the checkpoint commit that leaves
a partial file behind is the residual window; production would append
to a transactional table format instead of raw parquet.)

Keeper semantics are FIRST-SEEN-BATCH (matching
``streaming_dedup_first_seen``): the keeper for a fingerprint is the
min doc_id within the earliest batch that contained it — later, even
smaller, doc_ids are duplicates by definition.

Scale posture: per batch, one map-side-combined digest aggregate + one
digest anti-join against the index scan; shuffle keys are 64-hex
digests, never text.  The index grows with DISTINCT content only.  At
100 TB the index read is the dominant side — partition/bucket the index
by digest prefix so the anti-join prunes, and compact it periodically
(``sources/formats.py`` compaction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from mini_hadoop_spark.streaming.documents import DOCS_STREAM_SCHEMA

INDEX_SCHEMA = "content_hash string, keep_doc_id bigint, n_batch_copies bigint"


def _index_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API — resolves
    whatever scheme the path carries (file://, hdfs://, s3a://, ...), so
    the index can live on an object store, not just the local disk."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(hpath)


def read_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The current fingerprint index, or an empty frame if no batch has
    ever committed (first run).

    ONLY the missing-path case maps to "empty" — a corrupt or
    unreadable index must raise, because treating it as empty would
    silently re-admit every duplicate the index existed to suppress."""
    if not _index_exists(spark, index_dir):
        return spark.createDataFrame([], INDEX_SCHEMA)
    return spark.read.schema(INDEX_SCHEMA).parquet(index_dir)


def dedup_index_batch(batch: DataFrame, index_dir: str) -> DataFrame:
    """The NEW fingerprint rows one document batch contributes, given
    the index as currently on disk: in-batch dedup (min doc_id keeper +
    copy count per digest) anti-joined against the existing index."""
    spark = batch.sparkSession
    agg = (
        batch.select(F.sha2(F.col("text"), 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_batch_copies"))
    )
    existing = read_index(spark, index_dir).select("content_hash")
    return agg.join(existing, "content_hash", "left_anti")


def run_incremental_dedup_index(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain every unprocessed document shard in ``docs_dir`` through
    the index-maintenance cycle (availableNow trigger: processes what
    exists, then stops — call again when new shards land; the
    checkpoint remembers which files are done)."""
    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def _append_new(batch: DataFrame, _batch_id: int) -> None:
        # materialize the new rows BEFORE the append so the write job
        # never has an in-flight scan of the directory it is appending
        # to: correct even unmaterialized today (batches are sequential,
        # parquet append never deletes listed files) but fragile if the
        # sink mode changes or the index moves to an object store whose
        # listing is not atomic — the new-rows side is small (distinct
        # new digests of one micro-batch), so the localCheckpoint is
        # cheap insurance
        new_rows = dedup_index_batch(batch, index_dir).localCheckpoint(eager=True)
        new_rows.write.mode("append").parquet(index_dir)

    q = (
        stream.writeStream.foreachBatch(_append_new)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def contamination_batch(batch: DataFrame, eval_sh: DataFrame) -> DataFrame:
    """ONE micro-batch of the streaming decontamination gate: the
    train-side rows of ``batch`` (eval docs are filtered out — the
    benchmark suite never contaminates itself) shingle into distinct
    word 5-grams and broadcast-join the STATIC eval index; output is
    the per-(train, eval) overlap rows of ``contamination_ngram``,
    byte-identical because every measure is DOC-LOCAL (a document's
    distinct-shingle set and its per-eval overlap depend on that one
    row only), so per-batch aggregation composes to the batch answer
    under ANY batching of the corpus.

    Scale posture matches the batch twin: the eval side broadcasts
    (benchmark suites are small next to a 100 TB crawl), the train side
    streams through with NO shuffle of its shingles; the only shuffle
    is the per-pair count over matched rows — per batch, bounded by the
    batch's matched rows."""
    from mini_hadoop_spark.functions.text import round_half_up, shingles, tokens
    from mini_hadoop_spark.operators.dedup import CONTAM_EVAL_MODULUS, CONTAM_K

    train_sh = (
        batch.filter(F.col("doc_id") % CONTAM_EVAL_MODULUS != 0)
        .select("doc_id", tokens("text").alias("t"))
        .select("doc_id", F.explode(shingles("t", CONTAM_K)).alias("shingle"))
    )
    sizes = train_sh.groupBy("doc_id").agg(F.count("*").alias("n_train_shingles"))
    hits = (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy(F.col("doc_id").alias("train_doc_id"), "eval_doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return hits.join(
        sizes.select(F.col("doc_id").alias("train_doc_id"), "n_train_shingles"),
        "train_doc_id",
    ).select(
        "train_doc_id",
        "eval_doc_id",
        "n_shared",
        round_half_up(F.col("n_shared") / F.col("n_train_shingles"), 6).alias(
            "contam_frac"
        ),
    )


def _run_streaming_doc_report(
    spark: SparkSession,
    docs_dir: str,
    transform,
    report_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    schema=None,
) -> None:
    """Shared drain body for ROW-LOCAL per-shard report pipelines
    (contamination, classifier scoring, PIT enrichment — ADVICE-r12
    pattern: one body instead of verbatim copies to keep in sync),
    parameterized by the per-batch transform and the source schema
    (default: the documents landing schema): file-source stream over
    the landing dir → ``transform(batch)`` → parquet-append to the
    report (availableNow trigger; the checkpoint remembers which
    shards are done).

    Replay safety is shared too: a replayed batch would APPEND
    duplicate report rows, so exactly-once leans on the checkpoint
    commit; production would write a transactional table keyed on the
    report's natural key."""
    reader = spark.readStream.schema(schema if schema is not None else DOCS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def _append(batch: DataFrame, _batch_id: int) -> None:
        rows = transform(batch).localCheckpoint(eager=True)
        rows.write.mode("append").parquet(report_dir)

    q = (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_streaming_classifier_scores(
    spark: SparkSession,
    docs_dir: str,
    w: dict,
    report_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain every unprocessed document shard through the FROZEN
    distilled quality scorer (operators/classifier.py), appending each
    batch's (doc_id, margin, pred_keep) rows to the on-disk score table
    — the production serve loop where every newly crawled shard is
    quality-scored as it lands, with the model trained OFFLINE and
    shipped as a constant.  Scoring is doc-local, so the per-shard
    union equals whole-corpus scoring under any sharding.  Drain
    mechanics + replay semantics: :func:`_run_streaming_doc_report`."""
    from mini_hadoop_spark.operators.classifier import score_docs

    _run_streaming_doc_report(
        spark, docs_dir, lambda batch: score_docs(batch, w),
        report_dir, checkpoint_dir, max_files_per_trigger,
    )


#: landing schema for shipment-fact shards (the PIT enrichment drain's
#: file source) — the subset of lineitem the enrichment needs.  The
#: l_shipdate field is the DEFAULT (plain timestamp) encoding; the
#: runner swaps in the probed on-disk raw type per directory (the same
#: footer-probe-then-normalize contract as read_events_stream — the
#: generator's timestamp encoding has already changed between rounds).
FACTS_STREAM_SCHEMA = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_shipdate", TimestampType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
    ]
)

_RAW_TS_TYPES = {
    "nanos": LongType(),
    "ntz": TimestampNTZType(),
    "ts": TimestampType(),
}


def run_streaming_pit_enrich(
    spark: SparkSession,
    facts_dir: str,
    order_keys: DataFrame,
    versions: DataFrame,
    report_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain every unprocessed shipment-fact shard through the
    POINT-IN-TIME enrichment (operators/relational_ext.py::
    pit_scd2_shipments' per-fact core): each landed batch resolves its
    custkey via the static ``order_keys`` side, as-of joins the frozen
    SCD2 ``versions`` intervals (valid_from <= ship ts < valid_to,
    never a future version), and appends the enriched fact rows — the
    feature-store serve loop where facts are PIT-stamped at ingest
    with the dimension shipped as a constant.  Enrichment is
    FACT-LOCAL (each row's match depends only on itself and the static
    dims), so the per-shard union equals batch enrichment under any
    sharding.  The l_shipdate on-disk encoding is footer-probed and
    normalized per batch (the read_events_stream contract — a stream
    must commit to a fixed raw schema up front, and the generator's
    timestamp encoding has changed between rounds).  Drain mechanics +
    replay semantics: :func:`_run_streaming_doc_report`."""
    from mini_hadoop_spark.operators.temporal import asof_join
    from mini_hadoop_spark.sources.catalog import normalize_ts_column, ts_encoding

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    enc = ts_encoding(spark, facts_dir, "l_shipdate")
    schema = StructType(
        [
            f if f.name != "l_shipdate"
            else StructField("l_shipdate", _RAW_TS_TYPES[enc])
            for f in FACTS_STREAM_SCHEMA
        ]
    )

    def transform(batch: DataFrame) -> DataFrame:
        batch = batch.withColumn(
            "l_shipdate", normalize_ts_column("l_shipdate", enc)
        )
        rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
            F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
        )
        facts = batch.join(
            order_keys, batch["l_orderkey"] == order_keys["o_orderkey"]
        ).select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("o_custkey").alias("custkey"),
            F.col("l_shipdate").alias("ship_ts"),
            rev.cast("double").alias("rev"),
        )
        j = asof_join(
            facts,
            versions,
            key="custkey",
            probe_ts="ship_ts",
            build_ts="valid_from",
            build_payload=["version", "is_current"],
            tiebreak="version",
            how="left",
        )
        return j.select(
            "orderkey",
            "linenumber",
            "custkey",
            F.date_format("ship_ts", "yyyy-MM-dd").alias("ship_date"),
            F.col("asof_version").alias("version"),
            F.col("asof_is_current").alias("is_current"),
            "rev",
        )

    _run_streaming_doc_report(
        spark, facts_dir, transform, report_dir, checkpoint_dir,
        max_files_per_trigger, schema=schema,
    )


def run_streaming_contamination(
    spark: SparkSession,
    docs_dir: str,
    eval_sh: DataFrame,
    report_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain every unprocessed document shard through the contamination
    gate, appending each batch's overlap rows to the on-disk report —
    the production ingest loop where every newly crawled shard is
    decontaminated against the frozen benchmark suite as it lands.
    Drain mechanics + replay semantics (duplicate rows on replayed
    batches, checkpoint-commit exactly-once):
    :func:`_run_streaming_doc_report`."""
    _run_streaming_doc_report(
        spark, docs_dir, lambda batch: contamination_batch(batch, eval_sh),
        report_dir, checkpoint_dir, max_files_per_trigger,
    )
