"""Planted-fixture semantics for operators/compression.py."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from mini_hadoop_spark.operators.compression import (
    bpe_merge_candidates,
    quantize_embeddings_int8,
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


def _write_embeddings(tmp_path, vecs):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(1, len(vecs) + 1), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    return str(tmp_path)


def test_bpe_counts_weighted_within_token_pairs(spark, tmp_path):
    # tokens: abab (pairs ab, ba, ab), ab (ab), x (too short, ignored)
    d = _write_docs(tmp_path, ["abab ab x"])
    rows = {r["pair"]: r["cnt"] for r in bpe_merge_candidates(spark, d).collect()}
    assert rows == {"ab": 3, "ba": 1}


def test_bpe_tie_break_and_limit(spark, tmp_path):
    # two pairs with equal counts must both appear, ordered by pair
    d = _write_docs(tmp_path, ["ab cd ab cd"])
    out = bpe_merge_candidates(spark, d).collect()
    assert [(r["pair"], r["cnt"]) for r in out] == [("ab", 2), ("cd", 2)]


def test_quantize_int8_exact_checksums(spark, tmp_path):
    d = _write_embeddings(tmp_path, [[1.0, -0.5, 0.0], [0.0, 0.0, 0.0]])
    rows = {r["vec_id"]: r for r in quantize_embeddings_int8(spark, d).collect()}
    r1 = rows[1]
    # scale = 1/127; q = [127, floor(-63.5 + 0.5) = -63, 0]
    assert r1["sum_q"] == 127 - 63
    assert r1["sum_abs_q"] == 127 + 63
    assert r1["n_dims"] == 3
    # max reconstruction error is bounded by one quantization step
    assert 0.0 <= r1["max_abs_err_r"] <= r1["scale_r"] + 1e-9
    # zero vector: zero scale, zero error
    r2 = rows[2]
    assert r2["sum_q"] == 0 and r2["sum_abs_q"] == 0
    assert r2["scale_r"] == 0.0 and r2["mse_r"] == 0.0


def test_quantize_plan_is_shuffle_free(spark):
    import contextlib, io

    import tests.conftest as c

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        quantize_embeddings_int8(spark, c.SF_DIR).explain("formatted")
    plan = buf.getvalue()
    # the only allowed Exchange is spread_small_scan's round-robin fan-out
    # (a small-input artifact): no hash/range shuffle anywhere — the
    # quantization itself is a pure projection
    assert "hashpartitioning" not in plan.lower()
    assert "rangepartitioning" not in plan.lower()
