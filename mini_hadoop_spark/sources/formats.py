"""Multi-format ingestion: one reader for parquet / jsonl / csv / text.

The driver's test tables are parquet, but a corpus engine ingests
whatever the crawl produced.  ``read_any`` normalizes the format choice
(explicit or by extension) and returns a DataFrame ready for the same
operator pipelines; ``write_any`` is the sink twin.  Format notes:

* parquet — through the catalog's adaptive loader (timestamp-encoding
  probe, sources/catalog.py) so generator quirks are handled uniformly.
* jsonl — one JSON object per line (``spark.read.json``); the scalable
  interchange format for text corpora.  Schema may be passed to skip
  the inference scan at 100 TB.
* csv — header row, RFC-4180 quoting; ``multiLine`` so quoted document
  bodies may contain newlines.  NOTE: multiLine forces whole-file
  splits (a quoted record could span any split boundary, so Spark
  cannot split the file); at scale prefer many medium csv files — or
  better, jsonl/parquet — over one giant csv.  A user-supplied schema
  maps POSITIONALLY (Spark does not reorder by header name) — declare
  columns in file order.
* text — one row per line as column ``value`` (record-aligned splits,
  arbitrarily scalable).
* orc — columnar like parquet (predicate pushdown, column pruning,
  stripe-parallel splits); same scale posture, second-class only in
  that the driver tables are parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXT_FORMATS = {
    ".parquet": "parquet",
    ".jsonl": "jsonl",
    ".json": "jsonl",
    ".ndjson": "jsonl",
    ".csv": "csv",
    ".tsv": "tsv",
    ".txt": "text",
    ".text": "text",
    ".orc": "orc",
    ".avro": "avro",
}

FORMATS = ("parquet", "jsonl", "csv", "tsv", "text", "orc", "avro")


def _avro_unavailable_hint(exc: Exception) -> Exception:
    """Spark ships avro-core jars but NOT the spark-avro connector by
    default; map the bare 'Failed to find data source' failure to an
    actionable message instead of letting callers degrade silently."""
    return RuntimeError(
        "avro datasource is not available in this Spark distribution; add "
        "the org.apache.spark:spark-avro package (spark.jars.packages) to "
        f"read/write avro (underlying error: {exc})"
    )


def infer_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _EXT_FORMATS:
        return _EXT_FORMATS[ext]
    raise ValueError(
        f"cannot infer format from {path!r}; pass fmt= one of {FORMATS}"
    )


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Read ``path`` as a DataFrame in ``fmt`` (inferred from the
    extension when omitted).  ``schema`` (DDL string) skips inference —
    pass it at scale: jsonl/csv inference is a full extra pass over the
    data."""
    fmt = fmt or infer_format(path)
    if fmt == "parquet":
        from mini_hadoop_spark.sources.catalog import _load_adaptive

        return _load_adaptive(spark, path)
    if fmt == "jsonl":
        r = spark.read
        if schema:
            r = r.schema(schema)
        return r.json(path)
    if fmt in ("csv", "tsv"):
        r = spark.read.options(
            header=True,
            quote='"',
            escape='"',
            multiLine=True,
            sep="\t" if fmt == "tsv" else ",",
        )
        if schema:
            r = r.schema(schema)
        else:
            r = r.option("inferSchema", True)
        return r.csv(path)
    if fmt == "text":
        return spark.read.text(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "avro":
        try:
            return spark.read.format("avro").load(path)
        except Exception as exc:  # noqa: BLE001 — re-raise with guidance
            if "Failed to find data source" in str(exc):
                raise _avro_unavailable_hint(exc) from exc
            raise
    raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")


def write_any(df: DataFrame, path: str, fmt: str | None = None, mode: str = "error") -> None:
    """Sink twin of ``read_any`` — multi-file committer writes (one file
    per partition, the 100 TB path; the single-object reference-parity
    sinks live in sources/sinks.py)."""
    fmt = fmt or infer_format(path)
    w = df.write.mode(mode)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "jsonl":
        w.json(path)
    elif fmt in ("csv", "tsv"):
        w.options(header=True, quote='"', escape='"', sep="\t" if fmt == "tsv" else ",").csv(path)
    elif fmt == "text":
        w.text(path)
    elif fmt == "orc":
        w.orc(path)
    elif fmt == "avro":
        try:
            w.format("avro").save(path)
        except Exception as exc:  # noqa: BLE001 — re-raise with guidance
            if "Failed to find data source" in str(exc):
                raise _avro_unavailable_hint(exc) from exc
            raise
    else:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
