"""Multi-format ingestion (sources/formats.py): the same corpus read
through jsonl/csv/text must feed the operator pipelines identically to
the parquet original."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    from mini_hadoop_spark.sources.catalog import load_table

    return load_table(spark, SF_DIR, "documents").persist()


def _as_set(df):
    return {tuple(r) for r in df.select("doc_id", "text", "source", "lang").collect()}


def test_jsonl_roundtrip_matches_parquet(spark, docs, tmp_path):
    from mini_hadoop_spark.sources.formats import read_any, write_any

    p = str(tmp_path / "docs.jsonl")
    write_any(docs, p, fmt="jsonl")
    back = read_any(spark, p, schema="doc_id long, text string, source string, lang string")
    assert _as_set(back) == _as_set(docs)


def test_orc_roundtrip_matches_parquet(spark, docs, tmp_path):
    from mini_hadoop_spark.sources.formats import read_any, write_any

    p = str(tmp_path / "docs.orc")
    write_any(docs, p, fmt="orc")
    back = read_any(spark, p)  # .orc extension infers
    assert _as_set(back) == _as_set(docs)


def test_csv_roundtrip_matches_parquet(spark, docs, tmp_path):
    """CSV with RFC-4180 quoting: document bodies with embedded commas,
    quotes and newlines survive.  (CSV schema maps POSITIONALLY — write
    in the same column order the read schema declares.)"""
    from mini_hadoop_spark.sources.formats import read_any, write_any

    p = str(tmp_path / "docs.csv")
    write_any(docs.select("doc_id", "text", "source", "lang"), p, fmt="csv")
    back = read_any(spark, p, schema="doc_id long, text string, source string, lang string")
    assert _as_set(back) == _as_set(docs)


def test_csv_quoting_hard_cases(spark, tmp_path):
    from mini_hadoop_spark.sources.formats import read_any, write_any

    df = spark.createDataFrame(
        [
            (1, 'has "quotes" and, commas', "s", "en"),
            (2, "has\nnewlines\nin body", "s", "en"),
            (3, "", "s", "en"),
        ],
        "doc_id long, text string, source string, lang string",
    )
    p = str(tmp_path / "hard.csv")
    write_any(df, p, fmt="csv")
    back = read_any(spark, p, schema="doc_id long, text string, source string, lang string")
    got = {r.doc_id: r.text for r in back.collect()}
    assert got[1] == 'has "quotes" and, commas'
    assert got[2] == "has\nnewlines\nin body"
    assert got[3] in ("", None)  # csv cannot distinguish empty from null


def test_format_inference_and_errors(spark):
    from mini_hadoop_spark.sources.formats import infer_format

    assert infer_format("/x/y.parquet") == "parquet"
    assert infer_format("/x/y.jsonl") == "jsonl"
    assert infer_format("/x/y.ndjson") == "jsonl"
    assert infer_format("/x/y.tsv") == "tsv"
    assert infer_format("/x/y.txt") == "text"
    with pytest.raises(ValueError, match="cannot infer"):
        infer_format("/x/y.unknown")


def test_operators_agree_across_formats(spark, docs, tmp_path):
    """dedup_exact's plan over a jsonl copy equals the parquet answer —
    format is an ingestion detail, not an operator concern."""
    from mini_hadoop_spark.sources.formats import read_any, write_any

    p = str(tmp_path / "docs2.jsonl")
    write_any(docs, p, fmt="jsonl")
    back = read_any(spark, p, schema="doc_id long, text string, source string, lang string")

    def exact(d):
        return {
            (r.content_hash, r.keep_doc_id, r.n_copies)
            for r in d.select(F.sha2("text", 256).alias("content_hash"), "doc_id")
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
            .collect()
        }

    assert exact(back) == exact(docs)


def test_text_format_lines(spark, tmp_path):
    from mini_hadoop_spark.sources.formats import read_any

    p = tmp_path / "corpus.txt"
    p.write_text("line one\nline two\n")
    back = read_any(spark, str(p))
    assert {r.value for r in back.collect()} == {"line one", "line two"}


def test_avro_roundtrip_or_actionable_error(spark, docs, tmp_path):
    """Avro is registered but the spark-avro connector isn't bundled in
    every distribution: with the jar, the round-trip must match; without
    it, the failure must carry the spark-avro package hint, not a bare
    'Failed to find data source'."""
    from mini_hadoop_spark.sources.formats import read_any, write_any

    p = str(tmp_path / "docs.avro")
    try:
        write_any(docs, p, fmt="avro")
    except RuntimeError as exc:
        assert "spark-avro" in str(exc)
        pytest.skip("spark-avro connector not bundled in this distribution")
    back = read_any(spark, p)
    assert _as_set(back) == _as_set(docs)
