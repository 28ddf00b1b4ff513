"""Every queries()/oracle_sql() pair must hash-match — mirror of the
driver's t2 correctness gate, run at sf0.001 for speed (driver uses
sf0.01; run with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the
full-fidelity check)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle


def _oracle_names():
    import __spark_entry__ as entry_mod

    return sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_match(spark, name):
    assert_matches_oracle(spark, name, SF_DIR)


def test_all_queries_have_unique_names():
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    assert len(q) == len(set(q))
    for name, sql in entry_mod.oracle_sql().items():
        assert name in q, f"oracle {name} has no query"
        assert sql.strip()


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["word", "cnt"]
