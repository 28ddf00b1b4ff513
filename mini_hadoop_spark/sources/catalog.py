"""Table catalog over the driver-provided parquet test data.

The reference's DFS (file → blocks → replicas, SURVEY.md §2.1 S1-S5) is
delegated entirely to the storage layer: Spark reads parquet splits with
locality, pushdown and column pruning via the DataSource V2 path.  Nothing
to reimplement — `table_path` + `spark.read.parquet` IS the scan operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table as a DataFrame.

    SIDE EFFECT on the session: every call pins
    ``spark.sql.session.timeZone=UTC`` (and, for ``events`` stored with
    nanosecond timestamps, ``spark.sql.legacy.parquet.nanosAsLong=true``)
    as session-global runtime confs.  This is required by the driver contract — the
    external harness runs these queries on a vanilla session it built
    itself, so the confs the package needs MUST be set at runtime here —
    but it also changes timestamp rendering for any UNRELATED queries an
    external owner runs on the same session afterwards.  Callers
    embedding this package in a shared session should save/restore those
    confs if they depend on non-UTC rendering."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # Runtime confs (NOT session-build confs): the external driver runs
    # these queries on a vanilla session it built itself, so every conf
    # the package NEEDS must be set here.  UTC pins timestamp rendering
    # (date_trunc/date_format/session_window): on a non-UTC host,
    # session-local rendering would shift every hour/session boundary
    # away from the DuckDB oracle, which treats the naive timestamps
    # as-is.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, table_path(sf_dir, name))
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Load the events table, adapting to whichever on-disk encoding of
    ``ts`` the data generator used.  Three encodings have been observed:

    - INT64 TIMESTAMP(NANOS): Spark's reader rejects this outright
      (PARQUET_TYPE_ILLEGAL) unless ``nanosAsLong`` is set, in which case
      ``ts`` reads as LongType nanos → truncate to micros with integer
      DIV, exactly like DuckDB reading the same file.
    - plain ``timestamp[us]`` (no isAdjustedToUTC): reads as
      TIMESTAMP_NTZ → cast to session-zone timestamp (UTC is pinned
      above, so wall-clock values are preserved bit-for-bit).
    - UTC-adjusted ``timestamp[us]``: reads as TimestampType → as-is.

    ``nanosAsLong`` is only set when the plain read actually fails, so a
    session that never sees a nanos file never has the conf flipped."""
    df, enc = _probe_events(spark, path)
    return df.withColumn("ts", normalize_events_ts(enc))


def _probe_events(spark: SparkSession, path: str):
    """Batch-read the events data and classify the on-disk ``ts``
    encoding: ``"nanos"`` (LongType after nanosAsLong), ``"ntz"``
    (TIMESTAMP_NTZ), or ``"ts"`` (TimestampType, pass-through)."""
    try:
        df = spark.read.parquet(path)
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df, "nanos"
    if isinstance(dt, T.TimestampNTZType):
        return df, "ntz"
    return df, "ts"


def events_ts_encoding(spark: SparkSession, path: str) -> str:
    """Classify how ``path`` stores ``ts`` (see ``_probe_events``).
    Used by the streaming source, which must commit to a fixed read
    schema up front and so probes with a batch read first."""
    return _probe_events(spark, path)[1]


def normalize_events_ts(encoding: str):
    """Column expression converting a raw ``ts`` in the given encoding to
    microsecond TimestampType (the driver/DuckDB view of the data).
    Nanos truncate with integer DIV exactly like DuckDB reading the same
    file; NTZ values are wall-clock-preserved under the pinned UTC zone."""
    if encoding == "nanos":
        return F.timestamp_micros(F.expr("ts DIV 1000"))
    if encoding == "ntz":
        return F.col("ts").cast("timestamp")
    return F.col("ts")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the driver's DuckDB
    side, where the same names are pre-registered)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
