"""WordCount — the reference's flagship workload, as a DataFrame query.

Reference parity (citations into /root/reference):
  * README variant  — lowercase, strip non-word chars, split on whitespace
    (README.md:653-660).
  * strict variant  — state-machine tokenizer in
    lib/mini_hadoop/examples/word_count.ex:29-128: word chars are Unicode
    letters/digits plus ``' _ -``; single-char words are dropped unless the
    word is ``a`` or ``i``; every kept word must contain at least one letter.

Both are pure Catalyst expression pipelines (lower/regexp/explode/groupBy)
— whole-stage-codegen'd, shuffle = one hash aggregate on the word key with
map-side partial aggregation (strictly stronger than the reference's
map-side grouping, task_result_storage.ex:291-304).  Scales by input
partitions; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# README.md:653-660 semantics: \w is ASCII word chars; split on whitespace.
_README_TOKEN_PATTERN = "[a-z0-9_]+"

# word_count.ex:103-111 word-char set: \p{L}\p{Nd} plus ' _ -
_STRICT_TOKEN_PATTERN = r"[\p{L}\p{Nd}'_\-]+"


def tokenize(df: DataFrame, text_col: str = "text", pattern: str = _README_TOKEN_PATTERN) -> DataFrame:
    """Explode a text column into a ``word`` column (lowercased)."""
    return (
        df.select(F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), F.lit(0))).alias("word"))
        .filter(F.col("word") != "")
    )


def word_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """README-variant WordCount: (word, cnt) sorted desc by count.

    Equivalent reference job: mini_hadoop.ex:22-32 (word_count_submit_job)
    with the README.md:653-660 tokenizer.
    """
    return (
        tokenize(docs, text_col)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def word_count_strict(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Strict-variant WordCount mirroring word_count.ex:103-128 filters:
    keep 'a'/'i'; otherwise require BYTE length >= 2 (the reference's
    valid_word? uses byte_size/1, word_count.ex:118-128 — so a single
    multi-byte letter like 'é' is kept) and at least one letter."""
    words = tokenize(docs, text_col, _STRICT_TOKEN_PATTERN)
    kept = words.filter(
        F.col("word").isin("a", "i")
        | ((F.octet_length("word") >= 2) & F.col("word").rlike(r"\p{L}"))
    )
    return kept.groupBy("word").agg(F.count("*").alias("cnt"))
