"""Physical-plan invariants for EVERY registered query — the automated
form of the 100 TB design review:

* no CartesianProduct anywhere;
* BroadcastNestedLoopJoin only where declared intentional (the
  brute-force similarity baseline broadcasts a bounded query set by
  design — see operators/similarity.py docstring);
* no Python row-at-a-time UDF nodes (BatchEvalPython) — Python is
  allowed only behind Arrow (mapInPandas / applyInPandas show up as
  MapInPandas / FlatMapGroupsInPandas nodes).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from tests.conftest import SF_DIR

# Queries that legitimately use a bounded non-equi broadcast join:
# - similarity_topk_brute: the bounded query set broadcasts into one scan
#   (the deliberate brute-force baseline);
# - tfidf_top_terms: crossJoin(broadcast(<1-row aggregate>)) — the
#   canonical scalar-attach, build side is exactly one row.
# - similarity_ann_ivf: crossJoin(broadcast(<=32-row centroid table)) —
#   bounded constant build side (the IVF coarse quantizer).
# - scalar_subquery_uncorrelated: crossJoin(broadcast(<1-row aggregate>))
#   — the same canonical scalar-attach as tfidf_top_terms.
BNLJ_ALLOWED = {
    "similarity_topk_brute",
    "tfidf_top_terms",
    "similarity_ann_ivf",
    "scalar_subquery_uncorrelated",
}


def _names():
    import __spark_entry__ as entry_mod

    return sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_no_cartesian_or_interpreted_python(spark, name):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()

    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product:\n{plan}"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans an unbounded nested-loop join:\n{plan}"
        )
    assert "BatchEvalPython" not in plan, (
        f"{name} uses a row-at-a-time Python UDF (use Arrow batches):\n{plan}"
    )
