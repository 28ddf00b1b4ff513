"""Planted-fixture semantics for operators/retrieval.py (the oracle
battery covers sf-data hash-parity; these pin the intended behavior on
hand-built corpora)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from mini_hadoop_spark.operators.retrieval import (
    BM25_TOP_K,
    bm25_search,
    dup_span_coverage,
)


def _write_docs(tmp_path, texts):
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, n + 1), pa.int64()),
                "text": pa.array(texts),
                "source": pa.array(["t"] * n),
                "lang": pa.array(["en"] * n),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_dup_span_identical_docs_fully_covered(spark, tmp_path):
    d = _write_docs(
        tmp_path,
        [
            "alpha beta gamma delta epsilon",   # identical pair -> 1.0
            "alpha beta gamma delta epsilon",
            "zeta eta theta iota kappa",        # unique vocab -> 0.0
            "xy",                               # <3 tokens -> no shingles
        ],
    )
    rows = {r["doc_id"]: r for r in dup_span_coverage(spark, d).collect()}
    assert rows[1]["shared_frac"] == 1.0 and rows[1]["near_dup_suspect"]
    assert rows[2]["shared_frac"] == 1.0
    assert rows[3]["shared_frac"] == 0.0 and not rows[3]["near_dup_suspect"]
    assert rows[4]["n_shingles"] == 0 and rows[4]["shared_frac"] == 0.0


def test_dup_span_partial_overlap(spark, tmp_path):
    # doc1 has 4 shingles; its last 2 ("c d e", "d e f") also appear in
    # doc2 -> shared_frac = 2/4.
    d = _write_docs(tmp_path, ["a b c d e f", "c d e f zz qq"])
    rows = {r["doc_id"]: r for r in dup_span_coverage(spark, d).collect()}
    assert rows[1]["n_shingles"] == 4
    assert rows[1]["n_shared"] == 2
    assert rows[1]["shared_frac"] == 0.5


def test_bm25_prefers_higher_tf_and_shorter_docs(spark, tmp_path):
    filler = "pad " * 50
    d = _write_docs(
        tmp_path,
        [
            "hash hash hash table probe",       # high tf, short -> best
            "hash table probe lookup chain",    # tf=1, short
            f"hash {filler}",                   # tf=1, long -> worst
            "no match here",
        ],
    )
    out = bm25_search(spark, d)
    hash_rows = sorted(
        (r for r in out.collect() if r["term"] == "hash"), key=lambda r: r["rnk"]
    )
    assert [r["doc_id"] for r in hash_rows] == [1, 2, 3]
    assert hash_rows[0]["score"] > hash_rows[1]["score"] > hash_rows[2]["score"] > 0
    # absent terms produce no rows for doc 4
    assert all(r["doc_id"] != 4 for r in out.collect())


def test_bm25_topk_bound_and_rank_density(spark):
    import tests.conftest as c

    out = bm25_search(spark, c.SF_DIR).collect()
    by_term: dict[str, list[int]] = {}
    for r in out:
        by_term.setdefault(r["term"], []).append(r["rnk"])
    for term, rnks in by_term.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= BM25_TOP_K
