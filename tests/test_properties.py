"""Property-based tests (hypothesis) for the engine-agnostic invariants
the oracle gate depends on:

* round_half_up is EXACTLY decimal ROUND_HALF_UP at the representable
  boundary cases the driver's 9-sig-digit comparison can distinguish;
* the MapReduce shim computes exactly the Python-reference word counts
  for arbitrary inputs (SURVEY.md §5's property-style corpus, upgraded
  from examples to generated cases).
"""

from __future__ import annotations

import math
import re
from collections import Counter

from hypothesis import given, settings, strategies as st


# round_half_up is a pure expression builder; evaluate it via Python's
# float ops (the builder emits the identical IEEE sequence on both
# engines — floor(x*scale + 0.5)/scale)
def _py_round_half_up(x: float, digits: int) -> float:
    scale = float(10**digits)
    return math.floor(x * scale + 0.5) / scale


@given(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=6),
)
def test_round_half_up_matches_float_semantics(x, digits):
    """The helper's documented contract: floor(x*10^d + 0.5)/10^d on
    IEEE doubles — monotone, idempotent, and within half an ulp-scaled
    step of x."""
    r = _py_round_half_up(x, digits)
    step = 10.0**-digits
    assert abs(r - x) <= step / 2 + abs(x) * 1e-12
    # idempotent: rounding an already-rounded value is a no-op
    assert _py_round_half_up(r, digits) == r


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_round_half_up_column_matches_python_model(spark, xs, digits):
    """The REAL Column builder (functions.text.round_half_up), evaluated
    through Spark, must agree bit-for-bit with the Python float model —
    guarding the invariant the oracle gate depends on (a regression in
    the builder must fail here, not only in the driver gate)."""
    from pyspark.sql import functions as F

    from mini_hadoop_spark.functions.text import round_half_up

    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    got = [r[0] for r in df.select(round_half_up(F.col("x"), digits)).collect()]
    want = [_py_round_half_up(x, digits) for x in xs]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc XY.,\n", min_size=0, max_size=40),
        min_size=1,
        max_size=5,
    )
)
def test_run_job_wordcount_matches_python_reference(spark, texts):
    """For ARBITRARY text, shim output == a 10-line Python reference.
    (The shim's mapPartitions/groupByKey/sort machinery must never
    change the answer, only the distribution strategy.)"""
    import tempfile
    from pathlib import Path

    from mini_hadoop_spark.engine import JobSpec, run_job

    text = "\n".join(texts)
    p = Path(tempfile.mkdtemp()) / "in.txt"
    p.write_text(text)

    def mapper(block, _ctx):
        return [(w, 1) for w in re.findall(r"[a-z]+", block.lower())]

    def reducer(key, values, _ctx):
        return sum(values)

    res = run_job(
        spark,
        JobSpec.create(
            job_name="hyp", input_files=[str(p)],
            map_function=mapper, reduce_function=reducer,
        ),
    )
    got = dict(res.collect_pairs())

    # Python reference on the SAME newline semantics textFile sees
    want = Counter(re.findall(r"[a-z]+", text.lower()))
    assert got == dict(want)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_connected_components_matches_union_find(spark, edges):
    """The distributed HashMin loop labels every vertex with its
    component's minimum id — exactly what a driver-side union-find
    computes on the same random edge list (self-loops and duplicate
    edges included)."""
    from mini_hadoop_spark.operators.dedup import connected_components

    # pure-Python reference: union-find with path compression
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {v: find(v) for v in parent}
    # canonicalize: label = min id of the component
    comp_min: dict[int, int] = {}
    for v in parent:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[find(v)] for v in parent}

    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.id: r.label
        for r in connected_components(df, src="src", dst="dst").collect()
    }
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "hot"]),
            st.integers(0, 10**6),
            st.one_of(st.none(), st.integers(-1000, 1000)),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_salted_agg_matches_plain_agg(spark, rows):
    """salted_agg is a physical rewrite only: on arbitrary data
    (nulls, hot keys, integer values so sums are exact) it returns
    EXACTLY the single-stage aggregation's rows."""
    from pyspark.sql import functions as F

    from mini_hadoop_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, "k string, id long, v long")
    got = {
        tuple(r)
        for r in salted_agg(df, key="k", value="v", salt_on="id", buckets=4).collect()
    }
    plain = {
        tuple(r)
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("v"), 4).alias("min_v"),
            F.round(F.max("v"), 4).alias("max_v"),
            F.round(F.sum("v") / F.count("v"), 4).alias("avg_v"),
        )
        .collect()
    }
    assert got == plain


@given(
    probe=st.lists(
        st.tuples(
            st.integers(0, 999),
            st.one_of(st.none(), st.integers(1, 3)),
            st.integers(0, 20),
        ),
        min_size=1,
        max_size=15,
    ),
    build=st.lists(
        st.tuples(st.integers(0, 999), st.integers(1, 3), st.integers(0, 20)),
        min_size=0,
        max_size=15,
    ),
    direction=st.sampled_from(["backward", "forward"]),
    how=st.sampled_from(["inner", "left"]),
)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_sort_reference(spark, probe, build, direction, how):
    """The union+window as-of merge equals the naive per-probe scan on
    arbitrary data: latest build at-or-before (backward) / earliest
    at-or-after (forward) per key, ties resolved by the documented
    sort-then-last rule, null probe keys never matching."""
    from mini_hadoop_spark.operators.temporal import asof_join

    def reference(pid, k, pt):
        if k is None:
            return None
        cands = [(bts, bid) for bid, bk, bts in build if bk == k and (
            bts <= pt if direction == "backward" else bts >= pt)]
        if not cands:
            return None
        if direction == "backward":
            cands.sort(key=lambda c: (c[0], c[1]))          # _t asc, _tb asc
        else:
            cands.sort(key=lambda c: (-c[0], -c[1]))        # _t desc, _tb desc
        return cands[-1]                                     # running last wins

    # distinct pids FIRST so the expected dict is well-defined
    seen = set()
    probe = [p for p in probe if not (p[0] in seen or seen.add(p[0]))]

    expected = {}
    for pid, k, pt in probe:
        m = reference(pid, k, pt)
        if m is None and how == "inner":
            continue
        expected[pid] = m

    pdf = spark.createDataFrame(probe, "pid long, k long, pts long")
    bdf = spark.createDataFrame(build, "bid long, k long, bts long") if build else (
        spark.createDataFrame([], "bid long, k long, bts long"))
    out = asof_join(
        pdf, bdf, key="k", probe_ts="pts", build_ts="bts",
        build_payload=["bid"], tiebreak="bid", how=how, direction=direction,
    )
    got = {
        r.pid: (None if r.asof_bts is None else (r.asof_bts, r.asof_bid))
        for r in out.collect()
    }
    assert got == expected


@given(
    left=st.lists(
        st.tuples(st.integers(0, 999), st.integers(1, 2), st.integers(0, 120)),
        min_size=1,
        max_size=12,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 999), st.integers(1, 2), st.integers(0, 120)),
        min_size=0,
        max_size=12,
    ),
    gap=st.sampled_from([1, 7, 30]),
)
@settings(max_examples=12, deadline=None)
def test_range_join_binned_matches_naive(spark, left, right, gap):
    """The two-bin probe + exact verify equals the naive all-pairs
    range filter on arbitrary second-offset data — including pairs that
    straddle a bin boundary and exact-boundary gaps."""
    import datetime as dt

    from mini_hadoop_spark.operators.temporal import range_join_binned

    base = dt.datetime(2026, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    expected = {
        (lid, rid)
        for lid, lk, ls in left
        for rid, rk, rs in right
        if lk == rk and rs >= ls and rs - ls <= gap
    }

    ldf = spark.createDataFrame(
        [(lid, k, ts(s)) for lid, k, s in left], "lid long, k long, lts timestamp"
    )
    rdf = spark.createDataFrame(
        [(rid, k, ts(s)) for rid, k, s in right], "rid long, k long, rts timestamp"
    ) if right else spark.createDataFrame([], "rid long, k long, rts timestamp")
    out = range_join_binned(
        ldf, rdf, key="k", left_ts="lts", right_ts="rts", max_gap_sec=gap
    )
    got = {(r.lid, r.rid) for r in out.collect()}
    assert got == expected


def _ref_pagerank_fixed_point(edges, damping=0.85, tol9=50_000_000, max_iters=12):
    """Pure-Python model of pagerank_fixed_point: BIGINT 1e-9 ranks,
    per-edge floor(d * r9 / deg + 0.5) contributions, integer sums,
    teleport to sources only, mean-|Δ| stop rule."""
    import math as m
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    pages = {s for s, _ in edges} | {d for _, d in edges}
    if not pages:
        return {}, 0
    t9 = m.floor((1.0 - damping) / len(pages) * 1e9 + 0.5)

    def step(prev):
        nxt = defaultdict(int)
        for s, d in edges:
            r9 = prev.get(s, 1_000_000_000) if prev is not None else 1_000_000_000
            nxt[d] += m.floor(damping * r9 / deg[s] + 0.5)
        for s in deg:
            nxt[s] += t9
        return dict(nxt)

    prev = step(None)
    for k in range(2, max_iters + 1):
        cur = step(prev)
        s = sum(abs(cur[p] - prev[p]) for p in cur)
        prev = cur
        if s < tol9 * len(cur):
            return cur, k
    return prev, max_iters


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=0, max_size=24
    )
)
@settings(max_examples=12, deadline=None)
def test_pagerank_fixed_point_matches_python_model(spark, edges):
    """The distributed convergence loop lands on EXACTLY the model's
    integer rank vector and stop iteration on arbitrary small graphs —
    self-loops, dangling sinks, multi-edges, empty input included.
    Integer fixed-point state means equality is exact, not approximate."""
    from mini_hadoop_spark.workloads.pagerank import pagerank_fixed_point

    df = spark.createDataFrame(edges, "src long, dst long") if edges else (
        spark.createDataFrame([], "src long, dst long")
    )
    got_df, got_k = pagerank_fixed_point(df, tol9=200_000_000, max_iters=6)
    got = {r.page: r.rank9 for r in got_df.collect()}
    want, want_k = _ref_pagerank_fixed_point(edges, tol9=200_000_000, max_iters=6)
    assert got == want
    assert got_k == want_k


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "R"]),
            st.one_of(
                st.floats(min_value=900.0, max_value=110000.0, allow_nan=False),
                st.sampled_from([1.0, 1.0, 2.0, 42.5]),  # force duplicates
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_quantile_prefix_sum_matches_type1_reference(spark, rows):
    """r14's bucketed distributed prefix-sum (quantile_disc_price) must
    select EXACTLY the type-1 quantile — the element at position
    ceil(p*n) of the value-ordered cohort — for arbitrary cohorts:
    duplicates, all-equal values (degenerate bucket width), single-row
    flags, and values straddling min/max bucket edges.  The oracle
    battery pins the fixed corpora; this pins the algorithm itself."""
    import mini_hadoop_spark.operators.relational_ext as rx

    df = spark.createDataFrame(
        [(i, 1, f, float(v)) for i, (f, v) in enumerate(rows)],
        "l_orderkey long, l_linenumber long, l_returnflag string, l_quantity double",
    ).selectExpr(
        "l_orderkey", "l_linenumber", "l_returnflag",
        "l_quantity AS l_extendedprice",
    )
    orig = rx._t
    rx._t = lambda sp, d, t: df
    try:
        got = {
            (r.l_returnflag, r.p): r.quantile_disc
            for r in rx.quantile_disc_price(spark, "ignored").collect()
        }
    finally:
        rx._t = orig

    by_flag: dict = {}
    for f, v in rows:
        by_flag.setdefault(f, []).append(float(v))
    want = {}
    for f, vs in by_flag.items():
        vs.sort()
        for p in (0.5, 0.95):
            want[(f, p)] = vs[math.ceil(p * len(vs)) - 1]
    assert got == want, (got, want)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ).filter(lambda v: any(abs(x) > 1e-6 for x in v)),
        min_size=2,
        max_size=40,
    )
)
def test_grid_estimate_identity_random_vectors(spark, vecs):
    """The quadratic guard's core invariant on ARBITRARY vector sets:
    the cell-histogram estimate must equal the oriented candidate
    join's row count exactly — clusters, spread-out points, boundary
    cells, duplicate vectors.  (Zero-norm vectors are excluded: x/0
    cells are NaN/NULL territory the operator never sees — embeddings
    are non-degenerate by the loader's contract.)"""
    from mini_hadoop_spark.operators.dedup import (
        COSINE_DUP_THRESHOLD,
        _grid_candidate_join,
        grid_candidate_estimate,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, e array<double>",
    )
    n, est = grid_candidate_estimate(df, COSINE_DUP_THRESHOLD, 2)
    joined = _grid_candidate_join(df, COSINE_DUP_THRESHOLD, 2).count()
    assert n == len(vecs)
    assert est == joined, (est, joined)


@given(
    orders=st.lists(
        st.tuples(st.integers(0, 99), st.integers(1, 3), st.integers(0, 30)),
        min_size=1,
        max_size=12,
        unique_by=lambda o: o[0],
    ),
    facts=st.lists(
        st.tuples(st.integers(0, 999), st.integers(1, 3), st.integers(-5, 40)),
        min_size=1,
        max_size=12,
        unique_by=lambda f: f[0],
    ),
)
@settings(max_examples=12, deadline=None)
def test_pit_asof_matches_interval_cover(spark, orders, facts):
    """The identity pit_scd2_shipments and its oracle equivalence rest
    on: for a lead()-built SCD2 chain (half-open, non-overlapping
    per-key intervals; same-instant versions leave empty intervals for
    all but the last of the tie group), a backward as-of join with a
    max-version tiebreak selects EXACTLY the interval covering each
    fact (valid_from <= ts < valid_to), and facts before the first
    version match nothing — on arbitrary chains including ties."""
    from pyspark.sql import Window as W, functions as F

    from mini_hadoop_spark.operators.temporal import asof_join

    # python reference: build the chain, then interval-cover per fact
    chains: dict[int, list] = {}
    for okey, ck, od in sorted(orders, key=lambda o: (o[1], o[2], o[0])):
        chains.setdefault(ck, []).append((od, okey))
    covers = {}
    for fid, ck, ts in facts:
        got = None
        chain = chains.get(ck, [])
        for i, (od, okey) in enumerate(chain):
            valid_to = chain[i + 1][0] if i + 1 < len(chain) else None
            if od <= ts and (valid_to is None or ts < valid_to):
                assert got is None, "intervals must not overlap"
                got = (i + 1, valid_to is None)  # (version, is_current)
        covers[fid] = got

    odf = spark.createDataFrame(orders, "orderkey long, custkey long, odate long")
    w = W.partitionBy("custkey").orderBy("odate", "orderkey")
    v = odf.select(
        "custkey",
        F.row_number().over(w).alias("version"),
        F.col("odate").alias("valid_from"),
        F.lead("odate").over(w).isNull().alias("is_current"),
    )
    fdf = spark.createDataFrame(facts, "fid long, custkey long, fts long")
    j = asof_join(
        fdf, v, key="custkey", probe_ts="fts", build_ts="valid_from",
        build_payload=["version", "is_current"], tiebreak="version", how="left",
    )
    got = {
        r.fid: (None if r.asof_version is None else (r.asof_version, r.asof_is_current))
        for r in j.collect()
    }
    assert got == covers
