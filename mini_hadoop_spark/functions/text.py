"""Text expression builders — pure Catalyst expressions, no Python UDFs.

Everything here compiles to whole-stage-codegen'd JVM expressions, so the
text operators scale exactly like any relational scan: per-partition, no
Python serialization in the hot path.  Each builder has a documented
DuckDB-SQL twin used by the oracle queries (same tokenizer, same
arithmetic) so results hash-match across engines.

The tokenizer set deliberately mirrors the reference's README WordCount
tokenizer (ASCII word chars, /root/reference README.md:653-660); the
strict Unicode variant lives in workloads/wordcount.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: ASCII token pattern — twin of DuckDB regexp_extract_all(lower(text), '[a-z0-9]+')
TOKEN_PATTERN = "[a-z0-9]+"


def tokens(col: str | Column = "text") -> Column:
    """Array of lowercase ASCII tokens.  DuckDB twin:
    ``regexp_extract_all(lower(text), '[a-z0-9]+')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), F.lit(0))


def shingles(tok_col: str, k: int = 3) -> Column:
    """Distinct word k-gram shingles (space-joined) from a token-array
    column named ``tok_col``.

    Pure expression: ``transform(sequence(...))`` over the token array —
    no explode until the caller wants one row per shingle.  DuckDB twin::

        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2,0))) AS i) g

    (Spark ``sequence(0, -1)`` would generate a DESCENDING sequence, so
    the size guard is load-bearing.)
    """
    joined = ", ".join(f"{tok_col}[i + {j}]" for j in range(k))
    return F.when(
        F.size(F.col(tok_col)) >= k,
        F.array_distinct(
            F.expr(f"transform(sequence(0, size({tok_col}) - {k}), i -> concat_ws(' ', {joined}))")
        ),
    ).otherwise(F.array().cast("array<string>"))


def round_half_up(col: Column, digits: int = 6) -> Column:
    """Engine-agnostic round-half-up: floor(x * 10^d + 0.5) / 10^d.

    Identical IEEE double operations on Spark and DuckDB, unlike round()
    whose halfway-tie resolution differs between the engines.  DuckDB
    twin: ``CAST(floor(x * 1e{d} + 0.5) AS BIGINT) / 1e{d}``.
    """
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / F.lit(scale)


def sql_round_half_up(expr: str, digits: int = 6) -> str:
    """The DuckDB twin of :func:`round_half_up` as a SQL fragment."""
    scale = f"1e{digits}"
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT) / {scale}"
