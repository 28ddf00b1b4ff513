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
    # the only allowed Exchange is spread_small_scan's explicit fan-out
    # (a small-input artifact; r17 made it a deterministic-hash-key
    # repartition, tagged REPARTITION_BY_NUM, instead of round-robin):
    # no KEYED shuffle that the engine itself required anywhere — the
    # quantization is a pure projection, so every remaining exchange
    # must be the stated explicit repartition
    engine_exchanges = [
        ln
        for ln in plan.lower().splitlines()
        if ("hashpartitioning" in ln or "rangepartitioning" in ln)
        and "repartition_by_num" not in ln
    ]
    assert not engine_exchanges, engine_exchanges


def _ref_bpe_train(texts, rounds):
    """Pure-Python reference BPE trainer (Sennrich et al. 2016): word-
    frequency dict, per round count adjacent symbol pairs weighted by
    word count, merge the (max count, lexicographic) winner GREEDILY
    left-to-right non-overlapping in every word."""
    import re
    from collections import Counter

    vocab = Counter()
    for t in texts:
        vocab.update(re.findall(r"[a-z0-9]+", t.lower()))
    words = {w: list(w) for w in vocab}
    merges = []
    for rnd in range(1, rounds + 1):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rnd, best[0], best[1], best[0] + best[1], pairs[best]))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_bpe_train_matches_reference_semantics(spark, tmp_path):
    """The Spark trainer IS greedy BPE, not merely Spark==DuckDB: the
    fixture forces the tricky cases — an odd run ('aaa' merges to
    [aa, a], not overlapping), a later round merging a PREVIOUSLY
    MERGED symbol, and count ties broken lexicographically."""
    from mini_hadoop_spark.operators import compression

    texts = ["aaaa aaa abab abab baba zz zz zz"]
    d = _write_docs(tmp_path, texts)
    got = [
        (r.rnd, r.left_sym, r.right_sym, r.merged, r.cnt)
        for r in compression.bpe_train_merges(spark, d).collect()
    ]
    want = _ref_bpe_train(texts, compression.BPE_TRAIN_ROUNDS)
    assert got == want


def test_bpe_encode_counts_match_reference(spark, tmp_path):
    """Encoding applies the trained merges in order, within tokens only:
    per-doc symbol counts match the reference tokenizer applied to the
    same text (and merges never cross a token boundary)."""
    import re

    from mini_hadoop_spark.operators import compression

    texts = ["aaaa aaa abab", "abab baba zz zz zz aaab"]
    d = _write_docs(tmp_path, texts)
    merges = _ref_bpe_train(texts, compression.BPE_TRAIN_ROUNDS)

    def encode_len(text):
        n = 0
        for tok in re.findall(r"[a-z0-9]+", text.lower()):
            syms = list(tok)
            for _, a, b, _, _ in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            n += len(syms)
        return n

    got = {
        r.doc_id: (r.n_char_syms, r.n_bpe_syms)
        for r in compression.bpe_encode_docs(spark, d).collect()
    }
    want = {
        i + 1: (len(re.sub(r"[^a-z0-9]", "", t.lower())), encode_len(t))
        for i, t in enumerate(texts)
    }
    assert got == want


def test_bpe_curve_total_matches_encoder(spark, tmp_path):
    """Cross-query consistency: the sizing curve's final corpus symbol
    total must equal the per-document encoder's sum — the curve
    re-measures the merged VOCAB (weighted), the encoder re-applies the
    merges to every DOCUMENT; greedy semantics make them land on the
    same number."""
    from pyspark.sql import functions as F

    from mini_hadoop_spark.operators import compression

    d = _write_docs(tmp_path, ["aaaa aaa abab abab baba zz zz zz", "abab aaab zz"])
    curve = {r.rnd: r for r in compression.bpe_compression_curve(spark, d).collect()}
    # tiny fixture exhausts its pair space before BPE_TRAIN_ROUNDS: the
    # curve is a contiguous 1..k prefix (early stop, both engines)
    assert list(sorted(curve)) == list(range(1, len(curve) + 1))
    assert 1 <= len(curve) <= compression.BPE_TRAIN_ROUNDS
    # monotone non-increasing symbol totals; each round removes at least
    # one symbol occurrence while its pair still exists
    totals = [curve[r].corpus_syms_after for r in sorted(curve)]
    assert all(a >= b for a, b in zip(totals, totals[1:]))
    enc_total = (
        compression.bpe_encode_docs(spark, d)
        .agg(F.sum("n_bpe_syms").alias("t"))
        .first()["t"]
    )
    assert enc_total == totals[-1]


def test_bpe_early_stop_matches_oracle_on_exhausting_corpus(spark, tmp_path):
    """When the pair space exhausts before BPE_TRAIN_ROUNDS, BOTH
    engines must emit the identical TRUNCATED merge table: the Spark
    loop breaks, the oracle's empty b{r} rounds contribute no rows and
    the LEFT JOIN keeps v{r} = v{r-1}.  Pins the total-semantics
    contract on a corpus that exhausts (round 9 here)."""
    import duckdb

    import __spark_entry__ as entry_mod

    d = _write_docs(tmp_path, ["aaaa aaa abab abab baba zz zz zz"])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    for name in ("bpe_train_merges", "bpe_compression_curve", "bpe_encode_docs"):
        s = entry_mod.queries()[name](spark, d).toPandas()
        o = con.sql(entry_mod.oracle_sql()[name]).fetchdf()
        s, o = s[sorted(s.columns)], o[sorted(o.columns)]
        assert list(s.columns) == list(o.columns), name
        assert len(s) == len(o), (name, len(s), len(o))
        sv = sorted(map(tuple, s.astype(str).itertuples(index=False)))
        ov = sorted(map(tuple, o.astype(str).itertuples(index=False)))
        assert sv == ov, name
