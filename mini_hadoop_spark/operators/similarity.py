"""Similarity search over the ``embeddings`` table (vec_id,
embedding: array<float>, label) — LLM-pipeline operator family #2.

* ``similarity_topk_brute`` — brute-force cosine top-k: the correctness
  baseline.  The (small) query set broadcasts into a single scan of the
  full vector table (BroadcastNestedLoopJoin — a deliberate, bounded
  non-equi join, NOT an accidental cartesian: cost = |queries| x N with
  |queries| = ANN_QUERY_BUDGET, an absolute md5-ranked sample — total
  audit work stays linear in corpus size).  Oracle-checked — cosines
  are bit-identical to
  DuckDB (see functions/vectors.py determinism contract).
* ``similarity_ann_lsh``  — the 100 TB path: LSH_TABLES (4) independent
  LSH_BITS-bit (8) random-hyperplane (sign-random-projection) hash
  tables.  Vectors hash to a bucket per table; candidates meet only
  within a shared (table, bucket) key (equi-join — shuffle, no broadcast
  of the big side, no all-pairs), E[bucket size] = N / 2^LSH_BITS per
  table.  Hyperplanes are deterministic ±1 sign matrices derived from
  SHA-256, so the operator is reproducible across runs/engines;
  rows-only driver check (DuckDB twin impractical), recall vs the
  brute-force baseline is asserted in tests.
* ``embedding_norm_stats`` — per-label vector statistics (oracle).

At 100 TB: brute-force is O(Q*N) and exists as the semantic baseline;
the LSH variant shuffles each vector once (bucket key) and joins within
buckets whose expected size is N / 2^LSH_BITS per hash table — add
tables / probe neighboring buckets for recall, repartition by bucket
for skew.
"""

from __future__ import annotations

import hashlib
import math
import os

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from mini_hadoop_spark.functions.text import round_half_up, sql_round_half_up
from mini_hadoop_spark.functions.vectors import as_double, dot, norm
from mini_hadoop_spark.functions.partitioning import spread_small_scan
from mini_hadoop_spark.sources.catalog import load_table

TOP_K = 5
# Absolute md5-ranked ANN query budget (r10 verdict: the relative
# vec_id % 50 sample made every ANN audit's query set grow WITH the
# corpus — total candidate work O(n²/400) at 100x, the exact regime
# where ANN is supposed to win).  The budget is the matryoshka /
# hard-negative idiom: deterministic, engine-portable (md5 ranks agree
# across Spark and DuckDB), and ABSOLUTE — total audit work is
# budget x candidates, linear in corpus size.
ANN_QUERY_BUDGET = 32

LSH_TABLES = 4  # independent hash tables (union of candidates)
LSH_BITS = 8  # bucket width per table: E[bucket size] = N / 2^8 per table
EMBEDDING_DIM = 64


def _hyperplane_sign(plane: int, dim: int) -> float:
    """Deterministic ±1 from SHA-256 — a reproducible sign-random-
    projection matrix (public SRP-LSH construction; no RNG state)."""
    digest = hashlib.sha256(f"srp:{plane}:{dim}".encode()).digest()
    return 1.0 if digest[0] % 2 == 0 else -1.0


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, e, nv) — norm computed ONCE per vector here: the
    per-pair cosine is then a single fold + two divisions
    (dot / query-norm / vector-norm, the exact op order of the oracle's
    dot/sqrt/sqrt — identical IEEE results, ~3x less work on pair-heavy
    plans; the same hoist embedding_dup_pairs already uses)."""
    emb = spread_small_scan(load_table(spark, sf_dir, "embeddings"))
    return emb.select("vec_id", "label", as_double("embedding").alias("e")).withColumn(
        "nv", norm(F.col("e"))
    )


def ann_query_ids(v: DataFrame, budget: int | None = None) -> DataFrame:
    """The ``budget`` (default ANN_QUERY_BUDGET) query vec_ids whose
    md5(vec_id) ranks lowest — the absolute, deterministic,
    engine-portable query sample EVERY ANN arm and audit shares (brute
    ground truth included, so recall joins always align; the Matryoshka
    audit passes its own budget — ONE picker, r15 review, so the idiom
    cannot drift between sites).  ``orderBy(mh, vec_id).limit(K)``
    compiles to TakeOrderedAndProject — per-partition top-K heaps
    merged on the driver, NO single-task global sort even at 10^9+ ids
    — and selects exactly the same deterministic set a rank-<=K window
    would, so every downstream oracle hash is unchanged.  Result is
    always exactly min(budget, n) rows: broadcast-able at any scale."""
    return (
        v.select("vec_id")
        .withColumn("mh", F.md5(F.col("vec_id").cast("string")))
        .orderBy(F.col("mh"), F.col("vec_id"))
        .limit(ANN_QUERY_BUDGET if budget is None else budget)
        .select("vec_id")
    )


#: DuckDB twin of ``ann_query_ids`` — depends on a prior ``v`` CTE
#: (vec_id, e, ...), so splice it AFTER v in a WITH chain.
ANN_QSET_CTE = f"""qset AS (
  SELECT vec_id FROM (
    SELECT vec_id, row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) AS rn
    FROM v)
  WHERE rn <= {ANN_QUERY_BUDGET}
)"""


def _topk_brute_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors for each of the ANN_QUERY_BUDGET
    md5-selected query vectors, deterministic tiebreak on neighbor_id.
    Plan builder behind the memoized ``similarity_topk_brute`` (guarded
    directly in tests/test_plan_guards.py::_internal_plans)."""
    v = _vectors(spark, sf_dir)
    queries = v.join(F.broadcast(ann_query_ids(v)), "vec_id").select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nv").alias("nq")
    )
    scored = (
        v.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("qe"), F.col("e")) / F.col("nq") / F.col("nv")).alias("cos"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", round_half_up(F.col("cos"), 6).alias("cos_sim"))
    )


SIMILARITY_TOPK_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), {ANN_QSET_CTE}, q AS (
  SELECT vec_id AS query_id, e AS qe FROM v JOIN qset USING (vec_id)
), pairs AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         list_dot_product(qe, e)
           / sqrt(list_dot_product(qe, qe))
           / sqrt(list_dot_product(e, e)) AS cos
  FROM q JOIN v ON v.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM pairs
)
SELECT query_id, neighbor_id, rnk, {sql_round_half_up('cos', 6)} AS cos_sim
FROM ranked WHERE rnk <= {TOP_K}
"""


# Hard-negative mining: absolute md5-ranked query budget (linear at any
# corpus scale — DESIGN lesson 18), top-K other-label neighbors each.
HARD_NEG_BUDGET = 32
HARD_NEG_K = 5
# the hard-negatives plan + oracle reuse ann_query_ids/ANN_QSET_CTE,
# which sample ANN_QUERY_BUDGET ids — keep the budgets in lockstep
assert HARD_NEG_BUDGET == ANN_QUERY_BUDGET


def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retriever/reranker training: for each of
    HARD_NEG_BUDGET md5-selected query vectors, the HARD_NEG_K corpus
    vectors most cosine-similar to the query but carrying a DIFFERENT
    label — the near-miss negatives contrastive training needs (random
    negatives are too easy; the hard ones sit just across the decision
    boundary).  Output: (query_id, query_label, neighbor_id,
    neighbor_label, rnk, cos_sim).

    Plan: identical brute shape to ``similarity_topk_brute`` (broadcast
    the bounded query set over one corpus scan, one rank window) plus a
    label-mismatch predicate INSIDE the join condition, so same-label
    rows never reach the window.  The md5-ranked ABSOLUTE budget keeps
    the scored-row count budget x corpus — linear at 100x data.  At
    100 TB the candidate generation swaps to the shared LSH/IVF index
    family (equi-join on bucket/list, filter label, same ranking)."""
    v = _vectors(spark, sf_dir).select("vec_id", "label", "e", "nv")
    # HARD_NEG_BUDGET == ANN_QUERY_BUDGET, so the shared md5-ranked
    # sampler yields exactly the HARD_NEG_BUDGET query set (one
    # definition of the sampling idiom — ADVICE r11).
    queries = v.join(F.broadcast(ann_query_ids(v)), "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("e").alias("qe"),
        F.col("nv").alias("nq"),
    )
    scored = v.join(
        F.broadcast(queries),
        (F.col("vec_id") != F.col("query_id")) & (F.col("label") != F.col("query_label")),
    ).select(
        "query_id",
        "query_label",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        (dot(F.col("qe"), F.col("e")) / F.col("nq") / F.col("nv")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HARD_NEG_K)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "rnk",
            round_half_up(F.col("cos"), 6).alias("cos_sim"),
        )
    )


SIMILARITY_HARD_NEG_SQL = f"""
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nv
  FROM embeddings
), {ANN_QSET_CTE}, q AS (
  SELECT vec_id AS query_id, label AS query_label, e AS qe, nv AS nq
  FROM v JOIN qset USING (vec_id)
), pairs AS (
  SELECT q.query_id, q.query_label, v.vec_id AS neighbor_id,
         v.label AS neighbor_label,
         list_dot_product(qe, e) / nq / nv AS cos
  FROM q JOIN v ON v.vec_id <> q.query_id AND v.label <> q.query_label
), ranked AS (
  SELECT query_id, query_label, neighbor_id, neighbor_label, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM pairs
)
SELECT query_id, query_label, neighbor_id, neighbor_label, rnk,
       {sql_round_half_up('cos', 6)} AS cos_sim
FROM ranked WHERE rnk <= {HARD_NEG_K}
"""


# Cosine above which a training vector counts as semantically
# contaminated by an eval vector.  On this corpus the pairwise cosine
# p99 is ~0.295 (max ~0.47), so 0.3 flags the genuinely-near ~1% tail
# at every SF; a production run sets this from a held-out calibration
# (the same way ngram decontamination picks its n).
SEMANTIC_CONTAM_THRESHOLD = 0.3


def contamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC eval-set decontamination — the embedding-space twin of
    ``contamination_ngram`` (exact n-gram overlap misses paraphrases;
    Phi/LLaMA-class reports use embedding similarity as the stronger
    second pass).  The ANN_QUERY_BUDGET md5-selected vectors stand in
    for the eval set; every OTHER corpus vector is the train side.  Per
    eval vector: how many train vectors sit above the contamination
    threshold, the max cosine, and the nearest train vector — the
    per-benchmark exposure report a release review reads.

    Plan: identical brute shape to ``similarity_topk_brute`` — the
    bounded eval set broadcasts over one corpus scan (work = budget x
    corpus, linear at 100x), eval rows leave the train side via a
    broadcast anti join, and the per-eval report is ONE map-side-
    combined hash aggregate: count, thresholded sum, and the nearest
    pick as max(struct(cos, -train_id)) — lexicographic struct max ==
    (cos desc, train_id asc) rank-1, the same total order the r16
    window used, so the picked row is identical (r17; previously three
    window functions shuffled the full budget×corpus scored stream on
    eval_id — the aggregate shuffles |eval| partials per task instead).
    At 100 TB the candidate pass swaps to the shared LSH/IVF index
    family, same as the other brute baselines.  Threshold compares raw
    doubles — both engines compute bit-identical cosines (the
    topk_brute determinism contract), so the flag set matches
    exactly."""
    v = _vectors(spark, sf_dir)
    qids = ann_query_ids(v)
    evalq = v.join(F.broadcast(qids), "vec_id").select(
        F.col("vec_id").alias("eval_id"), F.col("e").alias("qe"), F.col("nv").alias("nq")
    )
    train = v.join(F.broadcast(qids), "vec_id", "left_anti")
    scored = train.crossJoin(F.broadcast(evalq)).select(
        "eval_id",
        F.col("vec_id").alias("train_id"),
        (dot(F.col("qe"), F.col("e")) / F.col("nq") / F.col("nv")).alias("cos"),
    )
    agg = scored.groupBy("eval_id").agg(
        F.count("*").alias("n_train"),
        F.sum(
            F.when(F.col("cos") >= SEMANTIC_CONTAM_THRESHOLD, 1).otherwise(0)
        ).alias("n_contaminated"),
        F.max(F.struct(F.col("cos"), (-F.col("train_id")).alias("neg_id"))).alias(
            "best"
        ),
    )
    return agg.select(
        "eval_id",
        "n_train",
        "n_contaminated",
        round_half_up(F.col("best.cos"), 6).alias("max_cos"),
        (-F.col("best.neg_id")).alias("nearest_train_id"),
    )


CONTAMINATION_SEMANTIC_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nv
  FROM embeddings
), {ANN_QSET_CTE}, evalq AS (
  SELECT vec_id AS eval_id, e AS qe, nv AS nq FROM v JOIN qset USING (vec_id)
), pairs AS (
  SELECT q.eval_id, t.vec_id AS train_id,
         list_dot_product(q.qe, t.e) / q.nq / t.nv AS cos
  FROM v t CROSS JOIN evalq q
  WHERE t.vec_id NOT IN (SELECT vec_id FROM qset)
), ranked AS (
  SELECT eval_id, train_id, cos,
         row_number() OVER (PARTITION BY eval_id ORDER BY cos DESC, train_id) AS rn,
         count(*) OVER (PARTITION BY eval_id) AS n_train,
         CAST(sum(CASE WHEN cos >= {SEMANTIC_CONTAM_THRESHOLD} THEN 1 ELSE 0 END)
           OVER (PARTITION BY eval_id) AS BIGINT) AS n_contaminated
  FROM pairs
)
SELECT eval_id, n_train, n_contaminated,
       {sql_round_half_up('cos', 6)} AS max_cos,
       train_id AS nearest_train_id
FROM ranked WHERE rn = 1
"""


def _srp_bucket_sql(e_col: str, table: int) -> str:
    """SQL text for the LSH_BITS-bit sign-random-projection bucket id of
    hash table ``table``: bit j = (sum_i sign(table,j,i) * e[i]) > 0,
    each per-plane dot a zip_with fold against a LITERAL ±1 array.

    Emitted as ONE SQL string parsed JVM-side: building the same tree
    through the Column API costs thousands of py4j round trips (64 lits
    x 8 planes x tables, measured ~2.6s of driver time per query build);
    parsing a ~3 KB string is milliseconds and yields the identical
    constant-folded plan.  (Also-measured alternative: expanding the ±1
    dots into 2048 scalar add/sub expressions is 5-8x slower still —
    the giant tree overwhelms analysis and falls out of codegen.)"""
    bits = []
    for j in range(LSH_BITS):
        plane = table * LSH_BITS + j
        signs = ",".join(
            "1.0D" if _hyperplane_sign(plane, i) > 0 else "-1.0D" for i in range(EMBEDDING_DIM)
        )
        proj = (
            f"aggregate(zip_with({e_col}, array({signs}), (x, y) -> x * y),"
            f" 0.0D, (acc, x) -> acc + x)"
        )
        bits.append(f"(CASE WHEN {proj} > 0.0D THEN {1 << j}L ELSE 0L END)")
    return " | ".join(bits)


def srp_bucket(e: Column | str, table: int) -> Column:
    """Column form of ``_srp_bucket_sql`` (column name input only — the
    expression is parsed from SQL text, see there for why)."""
    e_col = e if isinstance(e, str) else "e"
    return F.expr(_srp_bucket_sql(e_col, table))


def _bucketed(v: DataFrame) -> DataFrame:
    """Explode each vector into LSH_TABLES (table_id, bucket) keys —
    the standard multi-table LSH layout: more tables = higher recall,
    linearly more shuffle rows, never all-pairs."""
    entries = F.array(
        *[
            F.struct(F.lit(t).alias("table_id"), srp_bucket("e", t).alias("bucket"))
            for t in range(LSH_TABLES)
        ]
    )
    return v.select("vec_id", "e", "nv", F.explode(entries).alias("tb")).select(
        "vec_id", "e", "nv", F.col("tb.table_id").alias("table_id"), F.col("tb.bucket").alias("bucket")
    )


def _ann_lsh_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-3 per query via multi-table SRP-LSH: query vectors only
    meet vectors sharing a (table_id, bucket) key in at least one of the
    LSH_TABLES hash tables (equi-join; shuffle bounded by bucket sizes).
    Output: (query_id, neighbor_id, rnk, cos_sim) — approximate, recall
    vs the brute-force baseline asserted in tests."""
    v = _vectors(spark, sf_dir)
    # Materialize the bucketed index ONCE (localCheckpoint) — the
    # standard "build the LSH index" step: both self-join sides read the
    # materialized (vec_id, table_id, bucket) rows instead of each
    # recomputing the 32 projection folds over every vector.
    keyed = _bucketed(v).localCheckpoint(eager=False)
    queries = keyed.join(F.broadcast(ann_query_ids(v)), "vec_id").select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
        F.col("nv").alias("nq"), "table_id", "bucket",
    )
    # cosine INSIDE the join stage (deterministic, so equal across a
    # pair's multi-table collisions); the dedupe shuffles scalar rows
    # only — the embedding arrays never travel through a shuffle.
    cand = (
        keyed.join(queries, ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("qe"), F.col("e")) / F.col("nq") / F.col("nv")).alias("cos"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "rnk", round_half_up(F.col("cos"), 6).alias("cos_sim"))
    )


def _srp_bucket_duckdb(table: int) -> str:
    """DuckDB twin of ``_srp_bucket_sql``: bit j of the bucket = sign of
    the SAME ±1-plane projection.  The projection is emitted as an
    explicit left-associated term chain ``e[1]*s1 + e[2]*s2 + ...`` —
    IEEE-identical to Spark's ``aggregate(zip_with(...), 0.0, +)`` fold
    (0.0 + x == x exactly, then the same sequential add order), so the
    bucket ids agree bit-for-bit; disjoint power-of-two terms sum
    instead of OR-ing."""
    bits = []
    for j in range(LSH_BITS):
        plane = table * LSH_BITS + j
        terms = " + ".join(
            f"e[{i + 1}] * {'1.0' if _hyperplane_sign(plane, i) > 0 else '-1.0'}"
            for i in range(EMBEDDING_DIM)
        )
        bits.append(f"(CASE WHEN ({terms}) > 0.0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(bits)


def _ann_lsh_sql() -> str:
    table_arms = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, e, {t} AS table_id, {_srp_bucket_duckdb(t)} AS bucket FROM v"
        for t in range(LSH_TABLES)
    )
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), {ANN_QSET_CTE}, keyed AS (
{table_arms}
), q AS (
  SELECT vec_id AS query_id, e AS qe, table_id, bucket
  FROM keyed JOIN qset USING (vec_id)
), cand AS (
  SELECT DISTINCT q.query_id, k.vec_id AS neighbor_id,
         list_dot_product(qe, k.e)
           / sqrt(list_dot_product(qe, qe))
           / sqrt(list_dot_product(k.e, k.e)) AS cos
  FROM keyed k
  JOIN q ON k.table_id = q.table_id AND k.bucket = q.bucket
        AND k.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM cand
)
SELECT query_id, neighbor_id, rnk, {sql_round_half_up('cos', 6)} AS cos_sim
FROM ranked WHERE rnk <= 3
"""


SIMILARITY_ANN_LSH_SQL = _ann_lsh_sql()


IVF_NPROBE = 4

# Corpus-derived coarse-quantizer sizing (VERDICT r10/r11: a fixed K
# means each probe scans a list that grows linearly with the corpus —
# at 100x data every query reads 100x more candidate rows).  The
# classic IVF tradeoff (FAISS guidance: K ~ c*sqrt(n)) balances the two
# costs that pull K in opposite directions: per-query probe work =
# nprobe x n/K and per-query quantizer scoring = K, so K = sqrt(2n)
# makes BOTH grow as sqrt(n) instead of either growing linearly.  The
# one-time build (n x K assignment fold) is n^1.5 — itemized in bench
# index_build, amortized over every query against the corpus.  sqrt is
# the one exponent IEEE 754 guarantees correctly rounded, so Python's
# math.sqrt and DuckDB's sqrt return the SAME double and ceil lands on
# the same integer — the Spark plans and the oracles derive identical K
# at every scale factor (the semdedup_k precedent).  At the K_MAX cap
# the broadcast quantizer is 65536 x 64 doubles ~ 33 MB (still
# broadcast-able); past that — n > 2.1e9 vectors — shard the corpus.
IVF_K_MIN = 8
IVF_K_MAX = 65536


def ivf_k(n: int) -> int:
    """Corpus-derived IVF centroid count: clamp(ceil(sqrt(2n)), 8, 64Ki).
    n=500 (sf0.01 embeddings) -> 32 — identical to the historical fixed
    K at the driver's correctness SF; n=2000 (sf0.1) -> 64."""
    return min(max(math.ceil(math.sqrt(2 * n)), IVF_K_MIN), IVF_K_MAX)


#: DuckDB twin of ``ivf_k`` over the full embeddings table — a scalar
#: subquery usable directly as a LIMIT bound (no CTE, so it composes
#: with callers that define their own kparam CTE, e.g. SemDeDup's).
IVF_KPARAM_SQL = (
    f"(SELECT least(greatest(CAST(ceil(sqrt(2 * count(*))) AS BIGINT), "
    f"{IVF_K_MIN}), {IVF_K_MAX}) FROM embeddings)"
)


def _ivf_ctes(k_limit: int | str | None = None) -> str:
    """Shared DuckDB CTE chain reproducing the IVF build bit-for-bit:
    ``v`` (vectors + hoisted norm) → ``seeds`` (first K by vec_id) →
    first Lloyd assignment → fixed-point per-(cid,pos) mean → ``cent``
    (refined centroids) → ``lists`` (final inverted lists).  Every float
    op matches the Spark plan's order (dot fold, / norm / norm, window
    tiebreak on cid), and the centroid mean is the same integer
    fixed-point sum, so downstream rankings agree exactly.  Used by both
    the ANN oracle and the kmeans-topics oracle.

    ``k_limit`` parameterizes K: an int literal, a SQL scalar
    expression such as ``(SELECT k FROM kparam)`` (the SemDeDup oracle
    derives its own K from count(*) — DuckDB accepts a scalar subquery
    in LIMIT), or None (default) for the corpus-derived ``ivf_k``
    sizing via IVF_KPARAM_SQL — the twin of the Spark side's
    ``ivf_quantizer``/``ivf_lists`` defaults, so every engine derives
    the same K at every scale factor."""
    if k_limit is None:
        k_limit = IVF_KPARAM_SQL
    cos = "list_dot_product({v}.e, {c}.ce) / {v}.nv / sqrt(list_dot_product({c}.ce, {c}.ce))"
    return f"""v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nv
  FROM embeddings
), seeds AS (
  SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT {k_limit}
), assign0 AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, s.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             list_dot_product(v.e, s.ce) / v.nv / sqrt(list_dot_product(s.ce, s.ce)) DESC,
             s.cid) AS r
    FROM v CROSS JOIN seeds s)
  WHERE r = 1
), comp AS (
  SELECT cid, i AS pos, e[i] AS x
  FROM assign0, LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) g
), cent AS (
  SELECT cid, list(m ORDER BY pos) AS ce FROM (
    SELECT cid, pos,
           CAST(sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
             / (count(*) * 1e9) AS m
    FROM comp GROUP BY cid, pos)
  GROUP BY cid
), lists AS (
  SELECT vec_id, e, nv, cid FROM (
    SELECT v.vec_id, v.e, v.nv, c.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             {cos.format(v='v', c='c')} DESC, c.cid) AS r
    FROM v CROSS JOIN cent c)
  WHERE r = 1
)"""


def _ann_ivf_sql(nprobe: int = IVF_NPROBE) -> str:
    return f"""
WITH {_ivf_ctes()}, {ANN_QSET_CTE}, probes AS (
  SELECT vec_id AS query_id, e AS qe, nv AS nq, cid FROM (
    SELECT v.vec_id, v.e, v.nv, c.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             list_dot_product(v.e, c.ce) / v.nv / sqrt(list_dot_product(c.ce, c.ce)) DESC,
             c.cid) AS r
    FROM v JOIN qset USING (vec_id) CROSS JOIN cent c)
  WHERE r <= {nprobe}
), cand AS (
  SELECT DISTINCT p.query_id, l.vec_id AS neighbor_id,
         list_dot_product(p.qe, l.e) / p.nq / l.nv AS cos
  FROM lists l JOIN probes p USING (cid)
  WHERE l.vec_id <> p.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM cand
)
SELECT query_id, neighbor_id, rnk, {sql_round_half_up('cos', 6)} AS cos_sim
FROM ranked WHERE rnk <= 3
"""


SIMILARITY_ANN_IVF_SQL = _ann_ivf_sql()


def _assign(
    v: DataFrame,
    centroids: DataFrame,
    n_nearest: int,
    out_col: str,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each vector its ``n_nearest`` centroids by cosine —
    ZERO-SHUFFLE: the K centroids collapse into one broadcast row
    carrying a cid-sorted array of (cid, ce, nce) structs, each vector
    scores all K inline (transform + dot fold), and the top-n falls out
    of an array_sort comparator + slice — a pure codegen projection.

    The previous form (crossJoin K rows + row_number window partitioned
    by vec_id) shuffled |v| x K rows EACH CARRYING THE 64-double vector
    — at 100 TB that is a K-times-corpus shuffle of array payloads for
    what is per-row arithmetic over a broadcast model.  Results are
    identical (same dot/div op order, same (cs desc, cid asc) ordering),
    so the DuckDB oracles reproduce either plan.

    ``v`` carries its hoisted ``nv`` norm; centroid norms are computed
    once per centroid inside the 1-row aggregate.  ``passthrough``
    columns of ``v`` ride along unchanged (r17: lets a caller keep e.g.
    its previous assignment without an id-keyed re-join afterwards)."""
    keep = ["vec_id", "e", "nv", *passthrough]
    c_arr = F.broadcast(
        centroids.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("cid"), F.col("ce"), norm(F.col("ce")).alias("nce"))
                )
            ).alias("cents")
        )
    )
    scored = v.crossJoin(c_arr).select(
        *keep,
        F.transform(
            F.col("cents"),
            lambda s: F.struct(
                (dot(F.col("e"), s["ce"]) / F.col("nv") / s["nce"]).alias("cs"),
                s["cid"].alias("cid"),
            ),
        ).alias("scores"),
    )

    if n_nearest == 1:
        # Top-1 is the hot path (full-corpus list assignment, SemDeDup,
        # recenter) and K now scales with the corpus — sorting a
        # K-element array per row is O(K log K) with comparator-lambda
        # overhead, measured as the wall-clock wall at the 100x smoke's
        # K=6250.  A left FOLD keeps the single best struct in O(K) with
        # the exact same (cs desc, cid asc) tie-break, so results are
        # bit-identical to the sort path and to the oracles' row_number.
        best = F.aggregate(
            F.expr("slice(scores, 2, greatest(size(scores) - 1, 0))"),
            F.col("scores")[0],
            lambda acc, s: F.when(
                (s["cs"] > acc["cs"]) | ((s["cs"] == acc["cs"]) & (s["cid"] < acc["cid"])),
                s,
            ).otherwise(acc),
        )
        picked = F.when(F.size("scores") > 0, F.array(best)).otherwise(
            F.expr("array()").cast("array<struct<cs:double,cid:bigint>>")
        )
    else:

        def by_cos_desc_then_cid(l, r):
            return (
                F.when(l["cs"] > r["cs"], F.lit(-1))
                .when(l["cs"] < r["cs"], F.lit(1))
                .when(l["cid"] < r["cid"], F.lit(-1))
                .when(l["cid"] > r["cid"], F.lit(1))
                .otherwise(F.lit(0))
            )

        picked = F.slice(F.array_sort("scores", by_cos_desc_then_cid), 1, n_nearest)

    return scored.select(
        *keep,
        F.explode(picked).alias("_pick"),
    ).select(*keep, F.col("_pick.cid").alias(out_col))


def ivf_index(v: DataFrame, k: int, refine: bool = True) -> DataFrame:
    """Build an IVF coarse-quantizer index: (cid, ce: array<double>).

    Seeds are the first ``k`` vectors by vec_id (deterministic — no RNG
    state to leak across runs); ``refine`` runs ONE distributed Lloyd
    step: assign all vectors to their nearest seed, then recompute each
    centroid as the element-wise mean of its members (posexplode →
    per-(cid, pos) mean → re-pack), which is the standard k-means
    iteration expressed as two shuffles.

    The mean is an INTEGER fixed-point sum (per-member components
    rounded half-up at 1e-9 to BIGINT, summed, divided once) —
    order-independent, so the centroid doubles are bit-identical across
    partitionings AND across engines (DuckDB reproduces the arithmetic
    exactly), which is what lets similarity_ann_ivf and
    cluster_kmeans_topics carry full value-hash oracles.  A float avg
    drifts in the last ulp with summation order and can flip near-tie
    rankings downstream.  Bound: |sum| < 2^63 needs
    members x 1e9 x max|x| < 9.2e18 — fine for billions of members of
    unit-norm-ish vectors."""
    seeds = (
        v.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
    )
    if not refine:
        return seeds
    return fixed_point_means(_assign(v, seeds, 1, "cid"))


def fixed_point_means(assigned: DataFrame) -> DataFrame:
    """One Lloyd mean step over an assignment frame (cid, e, …) →
    (cid, ce): per-(cid, pos) INTEGER fixed-point mean (see ivf_index's
    docstring for the bit-identical-across-engines rationale).  Shared
    by the initial build's refine step, the recenter AUDIT (drift
    preview) and the recenter APPLY (the actual offline rebuild) — all
    three must move centroids by the exact same arithmetic."""
    return (
        assigned.select("cid", F.posexplode("e").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(
                    F.floor(F.col("x") * F.lit(1e9) + F.lit(0.5)).cast("long")
                ).cast("double")
                / (F.count("*") * F.lit(1e9))
            ).alias("m")
        )
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cid", F.col("pm.m").alias("ce"))
    )


# (application, sf_dir, k) -> materialized quantizer.  An IVF quantizer
# is a build-once artifact: every query against the same corpus probes
# the same centroids, so rebuilding the seed scan + Lloyd step per query
# call is pure waste (and the driver/bench call each query fresh).
_quantizers: dict[tuple, DataFrame] = {}


def ivf_quantizer(spark: SparkSession, sf_dir: str, k: int | None = None) -> DataFrame:
    """The memoized, materialized (localCheckpoint) IVF coarse quantizer
    for a corpus — built once per (session, sf_dir, k) and reused by
    every subsequent assignment pass.  ``k=None`` (every registered
    query) uses the corpus-derived ``ivf_k`` sizing; explicit k is for
    callers with their own scaling rule (SemDeDup) and tests."""
    if k is None:
        k = ivf_k(corpus_vector_count(spark, sf_dir))
    key = (spark.sparkContext.applicationId, os.path.normpath(sf_dir), k)
    if key not in _quantizers:
        v = _vectors(spark, sf_dir).select("vec_id", "e", "nv")
        _quantizers[key] = ivf_index(v, k).localCheckpoint(eager=True)
    return _quantizers[key]


def ivf_lists(spark: SparkSession, sf_dir: str, k: int | None = None) -> DataFrame:
    """The memoized inverted lists (vec_id, e, nv, cid) — like the
    quantizer, a build-once index artifact: the full-corpus assignment
    pass (score x K centroids + argmax fold) runs once per
    (session, sf_dir), not once per query call.  ``k=None`` = the
    corpus-derived ``ivf_k`` sizing (matches the quantizer default)."""
    if k is None:
        k = ivf_k(corpus_vector_count(spark, sf_dir))
    key = (spark.sparkContext.applicationId, os.path.normpath(sf_dir), k, "lists")
    if key not in _quantizers:
        v = _vectors(spark, sf_dir).select("vec_id", "e", "nv")
        _quantizers[key] = _assign(v, ivf_quantizer(spark, sf_dir, k), 1, "cid").localCheckpoint(
            eager=True
        )
    return _quantizers[key]


# SemDeDup K-scaling (VERDICT r9 weak item): the published recipe keeps
# PER-CLUSTER cardinality bounded by growing K with the corpus (Abbas et
# al. 2023 run K=50k on LAION); a fixed K makes the within-cluster pair
# space Σ|cluster|² grow quadratically with n.  K = ceil(n / target),
# clamped — so cluster size stays ~SEMDEDUP_TARGET_CLUSTER and the pair
# space stays LINEAR in n.  At the K_MAX ceiling the broadcast quantizer
# is 65536 x 64 doubles ≈ 33 MB — still broadcast-able; beyond that,
# shard the corpus (the paper's own regime).
SEMDEDUP_TARGET_CLUSTER = 32
SEMDEDUP_K_MIN = 8
SEMDEDUP_K_MAX = 65536

_corpus_counts: dict[tuple, int] = {}


def corpus_vector_count(spark: SparkSession, sf_dir: str) -> int:
    """Memoized embeddings-table row count per (session, corpus) — one
    parquet metadata count, used to derive corpus-scaled parameters
    (SemDeDup's K).  Not a driver-side result collect: it's the same
    scalar-statistic pattern as sizing shuffle partitions."""
    key = (spark.sparkContext.applicationId, os.path.normpath(sf_dir))
    if key not in _corpus_counts:
        _corpus_counts[key] = load_table(spark, sf_dir, "embeddings").count()
    return _corpus_counts[key]


def semdedup_k(n: int) -> int:
    """Corpus-derived cluster count: ceil(n / target cluster size),
    clamped to [K_MIN, K_MAX].  The DuckDB oracle derives the SAME value
    from count(*) in SQL (dedup.py::_semdedup_sql's kparam CTE)."""
    import math

    return min(max(math.ceil(n / SEMDEDUP_TARGET_CLUSTER), SEMDEDUP_K_MIN), SEMDEDUP_K_MAX)


def _ann_ivf_plan(
    spark: SparkSession, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """ANN top-3 per query via IVF: vectors live in their nearest
    centroid's inverted list; each query probes its IVF_NPROBE nearest
    centroids and scores ONLY those lists (equi-join on cid — shuffle
    bounded by list sizes, never all-pairs).  Complements the SRP-LSH
    variant: IVF adapts to the data's cluster structure, LSH does not.
    Deterministic; rows-only driver check, recall vs brute force
    asserted in tests."""
    from pyspark.sql import Window as W

    v = _vectors(spark, sf_dir).select("vec_id", "e", "nv")
    # the (<=32-row) quantizer is memoized per (session, sf_dir) and
    # materialized once: its build lineage (seed scan + Lloyd step) never
    # re-executes, neither across the assignment passes below nor across
    # repeated query calls
    centroids = ivf_quantizer(spark, sf_dir)
    lists = ivf_lists(spark, sf_dir)
    probes = _assign(
        v.join(F.broadcast(ann_query_ids(v)), "vec_id"), centroids, nprobe, "cid"
    ).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
        F.col("nv").alias("nq"), "cid",
    )
    cand = (
        lists.join(probes, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("qe"), F.col("e")) / F.col("nq") / F.col("nv")).alias("cos"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "rnk", round_half_up(F.col("cos"), 6).alias("cos_sim"))
    )


def _ann_ivfpq_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN — the full modern vector-store stack (Jegou et al.
    2011 IVFADC, non-residual variant): the IVF coarse quantizer routes
    each query to its IVF_NPROBE nearest inverted lists, and candidates
    are scored by ASYMMETRIC DISTANCE over their 8 product-quantization
    codes (sum over subspaces of ||q_sub − codeword||²) instead of their
    raw vectors — at 100 TB the scan reads 8 small codes per candidate,
    not 64 doubles, an ~8x read-volume cut on the hot path.  Returns
    top-3 candidates per query by approximate distance:
    (query_id, neighbor_id, rnk, approx_dist).

    Composition: shares the memoized IVF quantizer/lists (coarse stage)
    and the memoized PQ codebook/codes (compression.pq_model/pq_codes)
    — all four are build-once session artifacts.  Every distance is an
    integer fixed-point sum, so ranking is exact and the DuckDB oracle
    (the _ivf_ctes + pq_ctes chains composed) reproduces the result
    bit-for-bit.  Recall loss vs similarity_ann_ivf comes only from PQ
    approximation — bounded in tests."""
    from mini_hadoop_spark.operators.compression import (
        PQ_M,
        PQ_SUBDIM,
        _pq_d9,
        pq_codes,
        pq_model,
        pq_subvectors,
    )

    v = _vectors(spark, sf_dir).select("vec_id", "e", "nv")
    centroids = ivf_quantizer(spark, sf_dir)
    lists = ivf_lists(spark, sf_dir)
    probes = _assign(
        v.join(F.broadcast(ann_query_ids(v)), "vec_id"), centroids, IVF_NPROBE, "cid"
    ).select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), "cid")
    cand = (
        lists.select("vec_id", "cid")
        .join(probes.select("query_id", "cid"), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    qsub = pq_subvectors(
        probes.select("query_id", "qe").distinct(), vec_col="qe", id_col="query_id"
    ).select(F.col("query_id"), "m", F.col("sv").alias("qsv"))
    codes = pq_codes(spark, sf_dir).select("vec_id", "m", "cid")
    cent = pq_model(spark, sf_dir)
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(cent), ["m", "cid"])
        .join(F.broadcast(qsub), ["query_id", "m"])
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _pq_d9(F.col("qsv"), F.col("ce")).alias("d9m"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d9m").alias("dist9"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("dist9").asc(), F.col("neighbor_id"))
    total_dims = PQ_M * PQ_SUBDIM
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "query_id",
            "neighbor_id",
            "rnk",
            round_half_up(
                F.col("dist9").cast("double") / F.lit(float(total_dims) * 1e9), 6
            ).alias("approx_dist"),
        )
    )


# ---------------------------------------------------------------------------
# Memoized ANN result layer (VERDICT r8 #2).  The four neighbor sets —
# brute ground truth + the three ANN arms — are consumed by MULTIPLE
# registered queries (each arm's own query, similarity_ann_recall's
# 3-arm audit, and the pytest recall gates), and each result is tiny
# (|queries| x top-k rows, ~hundreds at any SF: the corpus never
# materializes, only the ranked neighbor ids).  Re-deriving an arm per
# consuming query repeats the expensive candidate generation — the r8
# verdict measured the recall audit at 4.27 s warm / 62.5 s cold-10x
# purely from that redundancy.  Same memo+localCheckpoint pattern as
# dedup.near_dup_pairs: build once per (application, sf_dir, method),
# every consumer reads the materialized rows.  The REAL plans stay
# guarded: tests/test_plan_guards.py::_internal_plans walks the
# _*_plan builders directly (cartesian/BNLJ/global-window classes),
# and bench.py itemizes the one-time builds as index_build entries.
# ---------------------------------------------------------------------------

_ANN_PLANS = {
    "brute": _topk_brute_plan,
    "lsh": _ann_lsh_plan,
    "ivf": _ann_ivf_plan,
    "ivfpq": _ann_ivfpq_plan,
}
_ann_memo: dict[tuple, DataFrame] = {}


def ann_results(spark: SparkSession, sf_dir: str, method: str) -> DataFrame:
    """The memoized, materialized (localCheckpoint) neighbor set for
    ``method`` — built once per (session, sf_dir), shared by the arm's
    registered query and every audit that consumes it."""
    if method not in _ANN_PLANS:
        raise ValueError(f"unknown ANN method {method!r}; expected one of {sorted(_ANN_PLANS)}")
    key = (spark.sparkContext.applicationId, os.path.normpath(sf_dir), "ann", method)
    if key not in _ann_memo:
        _ann_memo[key] = _ANN_PLANS[method](spark, sf_dir).localCheckpoint(eager=True)
    return _ann_memo[key]


def clear_memo() -> None:
    """Drop memoized quantizer/list/ANN frames and corpus counts (tests
    that rewrite an sf_dir in place call this; distinct tmp dirs never
    collide)."""
    _quantizers.clear()
    _ann_memo.clear()
    _corpus_counts.clear()


def similarity_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: the memoized brute-force cosine top-5 ground
    truth (plan: _topk_brute_plan — the deliberate quadratic baseline)."""
    return ann_results(spark, sf_dir, "brute")


def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: the memoized SRP-LSH ANN top-3 neighbor set
    (plan: _ann_lsh_plan — (table, bucket) equi-join candidates)."""
    return ann_results(spark, sf_dir, "lsh")


def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: the memoized IVF ANN top-3 neighbor set
    (plan: _ann_ivf_plan — nprobe inverted-list equi-join candidates)."""
    return ann_results(spark, sf_dir, "ivf")


def similarity_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: the memoized IVF-PQ ANN top-3 neighbor set
    (plan: _ann_ivfpq_plan — asymmetric PQ distances over IVF lists)."""
    return ann_results(spark, sf_dir, "ivfpq")


def _ann_ivfpq_sql() -> str:
    from mini_hadoop_spark.operators.compression import PQ_M, PQ_SUBDIM, pq_ctes

    return f"""
WITH {_ivf_ctes()}, {pq_ctes()}, {ANN_QSET_CTE}, probes AS (
  SELECT vec_id AS query_id, e AS qe, cid FROM (
    SELECT v.vec_id, v.e, c.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             list_dot_product(v.e, c.ce) / v.nv / sqrt(list_dot_product(c.ce, c.ce)) DESC,
             c.cid) AS r
    FROM v JOIN qset USING (vec_id) CROSS JOIN cent c)
  WHERE r <= {IVF_NPROBE}
), cnd AS (
  SELECT DISTINCT p.query_id, l.vec_id
  FROM lists l JOIN probes p USING (cid)
  WHERE l.vec_id <> p.query_id
), qsub AS (
  SELECT query_id, m, qe[(m * {PQ_SUBDIM} + 1):((m + 1) * {PQ_SUBDIM})] AS qsv
  FROM (SELECT DISTINCT query_id, qe FROM probes) q,
       LATERAL (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) g
), adc AS (
  SELECT c.query_id, c.vec_id AS neighbor_id,
         sum(CAST(floor((q.qsv[i] - ct.ce[i]) * (q.qsv[i] - ct.ce[i]) * 1e9 + 0.5) AS BIGINT)) AS dist9
  FROM cnd c
  JOIN pq_a1 a ON a.vec_id = c.vec_id
  JOIN pq_cent ct ON ct.m = a.m AND ct.cid = a.cid
  JOIN qsub q ON q.query_id = c.query_id AND q.m = a.m,
       LATERAL (SELECT unnest(generate_series(1, {PQ_SUBDIM})) AS i) g
  GROUP BY c.query_id, c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, dist9,
         row_number() OVER (PARTITION BY query_id ORDER BY dist9, neighbor_id) AS rnk
  FROM adc
)
SELECT query_id, neighbor_id, rnk,
       {sql_round_half_up(f'CAST(dist9 AS DOUBLE) / ({PQ_M * PQ_SUBDIM} * 1e9)', 6)} AS approx_dist
FROM ranked WHERE rnk <= 3
"""


SIMILARITY_ANN_IVFPQ_SQL = _ann_ivfpq_sql()


def ivf_recenter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF re-centering audit — "how far would ONE more Lloyd step move
    each centroid": the go/no-go signal for scheduling the offline
    recenter+rebuild pass that a streaming-maintained IVF index
    (streaming/ivf_maintenance.py) needs periodically as ingested
    vectors drift away from the frozen quantizer.  For each centroid:
    member count and cosine drift (1 − cos) between the current
    centroid and the fixed-point mean of its CURRENT inverted list.
    Near-zero drift everywhere = the quantizer still fits; large drift
    on fat lists = recenter now.

    Plan: reuses the memoized quantizer + lists; one posexplode mean
    (the exact Lloyd-step arithmetic from ivf_index — integer
    fixed-point sums, order-independent) + two tiny per-cid joins, all
    shuffles keyed on (cid, pos) — K·dims rows, independent of corpus
    size after the scan.  Centroids whose list emptied in the final
    assignment drop out of the audit in BOTH engines (inner join).
    Output: (cid, n_vectors, recenter_drift)."""
    lists = ivf_lists(spark, sf_dir)
    cent = ivf_quantizer(spark, sf_dir)
    means = fixed_point_means(lists).select("cid", F.col("ce").alias("ce_new"))
    sizes = lists.groupBy("cid").agg(F.count("*").alias("n_vectors"))
    drift = F.lit(1.0) - (
        dot(F.col("ce"), F.col("ce_new")) / norm(F.col("ce")) / norm(F.col("ce_new"))
    )
    return (
        cent.join(means, "cid")
        .join(sizes, "cid")
        .select("cid", "n_vectors", round_half_up(drift, 9).alias("recenter_drift"))
    )


def _ivf_recenter_sql() -> str:
    return f"""
WITH {_ivf_ctes()}, comp2 AS (
  SELECT cid, i AS pos, e[i] AS x
  FROM lists, LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) g
), cent2 AS (
  SELECT cid, list(m ORDER BY pos) AS ce2 FROM (
    SELECT cid, pos,
           CAST(sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
             / (count(*) * 1e9) AS m
    FROM comp2 GROUP BY cid, pos)
  GROUP BY cid
), sizes AS (
  SELECT cid, count(*)::BIGINT AS n_vectors FROM lists GROUP BY cid
)
SELECT c.cid, z.n_vectors,
       {sql_round_half_up(
           '1 - list_dot_product(c.ce, n.ce2)'
           ' / sqrt(list_dot_product(c.ce, c.ce))'
           ' / sqrt(list_dot_product(n.ce2, n.ce2))', 9)} AS recenter_drift
FROM cent c JOIN cent2 n USING (cid) JOIN sizes z USING (cid)
"""


IVF_RECENTER_SQL = _ivf_recenter_sql()


def ivf_recenter_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF re-centering APPLIED — the offline rebuild the recenter audit
    gates (and the missing production step between the audit and the
    streaming list maintenance): recompute every centroid as the
    fixed-point mean of its CURRENT inverted list (exactly one more
    Lloyd round — ``fixed_point_means``, the same arithmetic as the
    build's refine step and the audit's preview), then REASSIGN the full
    corpus to the moved centroids.  Output per vector: (vec_id,
    cid_before, cid_after, moved) — the new index plus the migration
    evidence an operator reviews after a rebuild (how many vectors
    changed lists).  Centroids whose list emptied drop out of the new
    quantizer in both engines, so cid_after ranges over surviving cids.

    Plan: memoized lists → K·dims-row mean aggregate (corpus-
    independent after the scan) → one broadcast-quantizer zero-shuffle
    reassignment (`_assign`), with the OLD cid riding through as an
    `_assign` passthrough column (r17; previously an id-keyed self-join
    re-shuffled the full corpus on vec_id just to re-attach a value
    every row already carried).  The streaming twin
    (`streaming/ivf_maintenance.py::recenter_ivf_index`) runs this same
    recompute+swap against the on-disk index; a pytest pins that its
    post-recenter index equals this batch apply exactly.

    Cites reference surface: none (extension operator — SURVEY §2.3)."""
    lists = ivf_lists(spark, sf_dir)
    cent_new = fixed_point_means(lists)
    return _assign(
        lists.select("vec_id", "e", "nv", F.col("cid").alias("cid_before")),
        cent_new,
        1,
        "cid_after",
        passthrough=("cid_before",),
    ).select(
        "vec_id",
        "cid_before",
        "cid_after",
        (F.col("cid_before") != F.col("cid_after")).cast("long").alias("moved"),
    )


def _ivf_recenter_apply_sql() -> str:
    return f"""
WITH {_ivf_ctes()}, comp2 AS (
  SELECT cid, i AS pos, e[i] AS x
  FROM lists, LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) g
), cent2 AS (
  SELECT cid, list(m ORDER BY pos) AS ce2 FROM (
    SELECT cid, pos,
           CAST(sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
             / (count(*) * 1e9) AS m
    FROM comp2 GROUP BY cid, pos)
  GROUP BY cid
), re AS (
  SELECT vec_id, cid_after FROM (
    SELECT l.vec_id, c.cid AS cid_after,
           row_number() OVER (PARTITION BY l.vec_id ORDER BY
             list_dot_product(l.e, c.ce2) / l.nv / sqrt(list_dot_product(c.ce2, c.ce2)) DESC,
             c.cid) AS r
    FROM lists l CROSS JOIN cent2 c)
  WHERE r = 1
)
SELECT l.vec_id, l.cid AS cid_before, re.cid_after,
       (CASE WHEN l.cid <> re.cid_after THEN 1 ELSE 0 END)::BIGINT AS moved
FROM lists l JOIN re USING (vec_id)
"""


IVF_RECENTER_APPLY_SQL = _ivf_recenter_apply_sql()


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics: count, avg L2 norm, avg first
    component — the kind of sanity aggregation a training pipeline runs
    before ingesting an embedding shard."""
    v = _vectors(spark, sf_dir)
    return (
        v.select("label", F.col("nv").alias("nrm"), F.col("e").getItem(0).alias("c0"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.avg("c0"), 4).alias("avg_c0"),
        )
    )


EMBEDDING_NORM_SQL = """
SELECT label,
       count(*) AS n_vectors,
       round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS avg_norm,
       round(avg((embedding::DOUBLE[])[1]), 4) AS avg_c0
FROM embeddings
GROUP BY label
"""


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION embedding audit: min, max, zero count and value
    count for each of the vector's components — the shard-level sanity
    check that catches dead dimensions (all zeros), clipped ranges and
    scale blowups before a corrupt embedding shard poisons an index.

    Only order-independent aggregates (min/max/integer counts), so the
    result is bit-exact on both engines with no float-sum caveat.

    Scale posture: posexplode is a |dims|× row expansion, but the
    map-side partial agg collapses every partition to ≤|dims| rows
    before the shuffle — shuffle volume is dims × partitions tiny rows,
    independent of corpus size."""
    emb = spread_small_scan(load_table(spark, sf_dir, "embeddings"))
    d = emb.select(F.posexplode("embedding").alias("dim", "v"))
    return d.groupBy("dim").agg(
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).alias("n_zero"),
        F.count("*").alias("n_vals"),
    )


EMBEDDING_DIM_STATS_SQL = """
WITH d AS (
  SELECT (i - 1) AS dim, embedding[i] AS v
  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
)
SELECT dim, min(v) AS min_v, max(v) AS max_v,
       CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       count(*) AS n_vals
FROM d GROUP BY dim
"""


OUTLIER_TOP = 20
OUTLIER_EPS = 1e-9  # variance floor: dead dims contribute ~0, never inf


def embedding_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-OUTLIER_TOP most-anomalous vectors per the per-label diagonal
    z-score: score(v) = Σ_d (x_d − μ_{label,d})² / (σ²_{label,d} + eps).
    The mislabeled-or-corrupt detector an embedding pipeline runs before
    training a classifier or building a label-routed index — a vector
    far from its own label's distribution is either noise, a labeling
    error, or genuine drift worth a look.

    Determinism: the (label, dim) moment sums AND the per-vector score
    sum are INTEGER fixed-point accumulations (round half-up at 1e-9 →
    BIGINT), so both are order-independent and bit-identical in DuckDB;
    mean/variance/score derive from the exact sums with one identical
    IEEE op sequence.  Ranking compares the integer score — no float
    tie ambiguity.

    Scale: the moment table is |labels| x |dims| rows (map-combined
    partial sums; broadcast back — r17: collapsed to ONE pos-sorted
    struct array per label, so the score is a pure per-row zip_with
    fold over the vector against its label's broadcast stats.  The
    previous form re-exploded the corpus to |corpus|·dims rows, probed
    the broadcast per COMPONENT and hash-aggregated the whole exploded
    stream back to per-vector scores; the fold does the identical
    integer sum in document order — exact long arithmetic is
    order-independent — with no explode, no join and no aggregate on
    the scoring side).  The per-vector score table is corpus-sized, so
    the top-N is selected by ``orderBy().limit(OUTLIER_TOP)`` — per-
    partition heaps folding to a TakeOrderedAndProject, never a global
    sort — and the rank window runs over only the ≤OUTLIER_TOP
    survivors (the ``skew_heavy_hitters`` idiom, VERDICT r15 #1).
    The (score9 desc, vec_id) order is total, so the selected set and
    ranks are identical to a full-table rank filter."""
    v = _vectors(spark, sf_dir).select("vec_id", "label", "e")
    ex = v.select("vec_id", "label", F.posexplode("e").alias("pos", "x"))

    def r9(col: Column) -> Column:
        return F.floor(col * F.lit(1e9) + F.lit(0.5)).cast("long")

    stats = ex.groupBy("label", "pos").agg(
        F.count("*").alias("n"),
        F.sum(r9(F.col("x"))).alias("s1"),
        F.sum(r9(F.col("x") * F.col("x"))).alias("s2"),
    )
    mean = F.col("s1").cast("double") / (F.col("n") * F.lit(1e9))
    ex2 = F.col("s2").cast("double") / (F.col("n") * F.lit(1e9))
    stats = stats.select(
        "label", "pos", mean.alias("mu"), (ex2 - mean * mean).alias("var")
    )
    # every vector of a label carries all dims positions, so the sorted
    # stats array lines up index-for-index with the embedding array
    sa = stats.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("pos", "mu", "var"))).alias("sa")
    )
    score9 = F.aggregate(
        F.zip_with(
            F.col("e"),
            F.col("sa"),
            lambda x, s: r9(
                (x - s["mu"]) * (x - s["mu"]) / (s["var"] + F.lit(OUTLIER_EPS))
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    scored = v.join(F.broadcast(sa), "label").select(
        "vec_id", "label", score9.alias("score9")
    )
    top = scored.orderBy(F.col("score9").desc(), F.col("vec_id")).limit(OUTLIER_TOP)
    w = W.orderBy(F.col("score9").desc(), F.col("vec_id"))
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select(
            "vec_id",
            "label",
            "rnk",
            round_half_up(F.col("score9").cast("double") / F.lit(1e9), 6).alias(
                "outlier_score"
            ),
        )
    )


EMBEDDING_OUTLIER_SQL = f"""
WITH ex AS (
  SELECT vec_id, label, (i - 1) AS pos, (embedding::DOUBLE[])[i] AS x
  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
), stats AS (
  SELECT label, pos,
         CAST(sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / (count(*) * 1e9) AS mu,
         CAST(sum(CAST(floor(x * x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / (count(*) * 1e9)
           - (CAST(sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / (count(*) * 1e9))
             * (CAST(sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / (count(*) * 1e9)) AS var
  FROM ex GROUP BY label, pos
), scored AS (
  SELECT e.vec_id, e.label,
         sum(CAST(floor((e.x - s.mu) * (e.x - s.mu) / (s.var + {OUTLIER_EPS}) * 1e9 + 0.5) AS BIGINT)) AS score9
  FROM ex e JOIN stats s ON e.label = s.label AND e.pos = s.pos
  GROUP BY e.vec_id, e.label
), ranked AS (
  SELECT vec_id, label, score9,
         row_number() OVER (ORDER BY score9 DESC, vec_id) AS rnk
  FROM scored
)
SELECT vec_id, label, rnk,
       {sql_round_half_up('CAST(score9 AS DOUBLE) / 1e9', 6)} AS outlier_score
FROM ranked WHERE rnk <= {OUTLIER_TOP}
"""


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label class centroids — the nearest-centroid-classifier /
    class-prototype primitive (and the k-means update step as a
    standalone audit): mean embedding component per (label, dim).

    Float sums are order-dependent, so each component is first rounded
    to 6 dp with the shared floor-half-up idiom (bit-identical per
    element on both engines) and then summed as an exact DECIMAL —
    order-independent at any parallelism — before one final double
    division (the ``events_decayed_engagement`` pattern).

    Plan: one posexplode + one (label, dim) hash aggregate, map-side
    combined — output is |labels|×|dims| rows, corpus-size-independent."""
    emb = spread_small_scan(load_table(spark, sf_dir, "embeddings"))
    d = emb.select("label", F.posexplode("embedding").alias("dim", "v"))
    term = (F.floor(F.col("v").cast("double") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast(
        "decimal(18,6)"
    )
    agg = d.groupBy("label", "dim").agg(
        F.count("*").alias("n"),
        F.sum(term).alias("s"),
    )
    centroid = (
        F.floor(
            F.col("s").cast("double") / F.col("n").cast("double") * F.lit(1e6) + F.lit(0.5)
        )
        / F.lit(1e6)
    )
    return agg.select("label", "dim", "n", centroid.alias("centroid"))


EMBEDDING_CENTROIDS_SQL = """
WITH d AS (
  SELECT label, (i - 1) AS dim,
         CAST(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) / 1e6 AS DECIMAL(18,6)) AS term
  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
), agg AS (
  SELECT label, dim, count(*) AS n, sum(term) AS s FROM d GROUP BY label, dim
)
SELECT label, dim, n,
       CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) AS BIGINT) / 1e6 AS centroid
FROM agg
"""


def centroid_classify_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification accuracy — the end of the
    prototype loop (``embedding_label_centroids`` builds the model,
    this query evaluates it): assign every vector to its closest label
    centroid and report per-true-label counts and accuracy, i.e. "does
    this embedding space separate the classes".

    Exactness: squared-difference terms are rounded per element with
    the shared floor-half-up idiom and summed as exact DECIMALs, so
    distances are order-independent and bit-identical cross-engine;
    argmin ties break on label.  Accuracy is one exact-int division.

    Scale posture: the model side is |labels| rows of |dims| values —
    packed into ONE broadcast row; assignment is a pure per-row fold
    argmin over the label-sorted centroid array (zero shuffle — the
    r7 _assign/PQ idiom; previously a crossJoin fanout + row_number
    window that shuffled |v| x |labels| rows carrying the vectors);
    the final agg is |labels| rows."""
    emb = spread_small_scan(load_table(spark, sf_dir, "embeddings"))
    cents = (
        embedding_label_centroids(spark, sf_dir)
        .groupBy(F.col("label").alias("cent_label"))
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "centroid"))),
                lambda s: s.centroid,
            ).alias("cvec")
        )
    )
    cb = F.broadcast(
        cents.agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("cent_label"), F.col("cvec")))
            ).alias("cbs")
        )
    )
    v = emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))

    def dist_to(cv):
        term = F.zip_with(
            F.col("e"),
            cv,
            lambda a, b: (
                F.floor((a - b) * (a - b) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
            ).cast("decimal(18,6)"),
        )
        return F.aggregate(
            term,
            F.lit(0).cast("decimal(28,6)"),
            # re-cast: decimal addition widens the type per element, and
            # aggregate() requires the merge result to keep the zero's type
            lambda acc, x: (acc + x).cast("decimal(28,6)"),
        )

    scores = F.transform(
        F.col("cbs"),
        lambda s: F.struct(dist_to(s["cvec"]).alias("dist"), s["cent_label"].alias("cent_label")),
    )
    best = F.aggregate(
        F.slice(scores, 2, F.size(scores) - 1),
        F.element_at(scores, 1),
        lambda acc, s: F.when(
            (s["dist"] < acc["dist"])
            | ((s["dist"] == acc["dist"]) & (s["cent_label"] < acc["cent_label"])),
            s,
        ).otherwise(acc),
    )
    pred = v.crossJoin(cb).select(
        "vec_id", "label", best["cent_label"].alias("pred_label")
    )
    return pred.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.when(F.col("label") == F.col("pred_label"), 1).otherwise(0)).alias("n_correct"),
    ).select(
        "label",
        "n_vectors",
        "n_correct",
        (
            F.floor(
                F.col("n_correct").cast("double") / F.col("n_vectors").cast("double") * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("accuracy"),
    )


CENTROID_CLASSIFY_SQL = """
WITH d AS (
  SELECT label, (i - 1) AS dim,
         CAST(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) / 1e6 AS DECIMAL(18,6)) AS term
  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
), agg AS (
  SELECT label, dim, count(*) AS n, sum(term) AS s FROM d GROUP BY label, dim
), cent AS (
  SELECT label AS cent_label, dim,
         CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) AS BIGINT) / 1e6 AS c
  FROM agg
), cvec AS (
  SELECT cent_label, list(c ORDER BY dim) AS cv FROM cent GROUP BY cent_label
), scored AS (
  SELECT e.vec_id, e.label, c.cent_label,
         list_sum(list_transform(generate_series(1, len(e.embedding)),
           i -> CAST(CAST(floor((CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) * (CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) * 1e6 + 0.5) AS BIGINT) / 1e6 AS DECIMAL(18,6)))) AS dist
  FROM embeddings e CROSS JOIN cvec c
), pred AS (
  SELECT vec_id, label, cent_label AS pred_label,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cent_label) AS rn
  FROM scored
)
SELECT label, count(*) AS n_vectors,
       CAST(sum(CASE WHEN label = pred_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(floor(CAST(sum(CASE WHEN label = pred_label THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) / 1e6 AS accuracy
FROM pred WHERE rn = 1
GROUP BY label
"""


#: matryoshka truncation prefixes audited (full dim is 64 by data contract)
MATRYOSHKA_DIMS = (8, 16, 32)
# Absolute query budget for the matryoshka audit.  A FRACTIONAL query set
# (vec_id % 50) makes the brute scoring join quadratic at scale —
# 100x corpus -> 100x queries -> 10_000x scored rows.  A fixed md5-ranked
# budget keeps the audit LINEAR in corpus size (budget x corpus), and the
# md5 ranking is deterministic + engine-portable (same sample both sides).
MATRYOSHKA_QUERY_BUDGET = 32


def _matryoshka_pick(v: DataFrame) -> DataFrame:
    """The Matryoshka audit's query sample — the same deterministic
    ``orderBy(md5(vec_id), vec_id).limit(K)`` TakeOrderedAndProject
    idiom as :func:`ann_query_ids` (see its docstring for why this is
    the engine-portable pick), selecting the IDENTICAL vec_id set, but
    carrying the vector payload ``e`` through the top-K heap so the
    driver-side collect is ONE job (r18: the old id-only pick needed a
    join back onto the corpus to attach e — a second pass + shuffle
    just to fetch 32 vectors).  Module-level so the plan-guard test can
    pin the TakeOrdered shape (the full query hides it behind a driver
    collect)."""
    return (
        v.withColumn("mh", F.md5(F.col("vec_id").cast("string")))
        .orderBy(F.col("mh"), F.col("vec_id"))
        .limit(MATRYOSHKA_QUERY_BUDGET)
        .select("vec_id", "e")
    )


def similarity_matryoshka_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation audit (Kusupati et al. 2022, MRL): can the
    first k dimensions stand in for the full embedding?  Per truncation
    prefix k ∈ {8, 16, 32}: (a) the fraction of full-dim top-5 neighbor
    slots the truncated top-5 reproduces (exact integer overlap over the
    same deterministic ranking), and (b) the mean share of vector energy
    (squared norm) the prefix retains — the go/no-go report before
    serving truncated vectors from a cheaper index.

    Determinism: overlap counts are integers; the energy share is
    rounded per-vector at 9 decimals to a BIGINT before the sum (the
    same order-independence idiom as embedding_label_centroids), so both
    engines agree bit-for-bit.  Plan: each prefix re-runs the brute
    scoring shape (broadcast ~N/50 queries over the vector scan, one
    row_number window per query group) + one zero-shuffle energy
    aggregate; the output is |MATRYOSHKA_DIMS| rows.  At 100 TB the
    truncated rankings would come from the LSH/IVF index family instead
    of brute force — this query is the exactness baseline for them.

    Query set: the MATRYOSHKA_QUERY_BUDGET vectors whose md5(vec_id)
    ranks lowest — a deterministic, engine-portable sample with an
    ABSOLUTE size, so the scored-row count is budget x corpus (linear at
    100x data) instead of the quadratic (corpus/50) x corpus the old
    modulus sample gave.  The pick is ``orderBy(mh, vec_id).limit(K)``
    — TakeOrderedAndProject (distributed per-partition heaps), never a
    single-task global-rank window — and the selected set is identical
    to a rank-<=K window, so the oracle hash is unchanged."""
    v0 = _vectors(spark, sf_dir).select("vec_id", "e")
    # OPTIMIZATION_r18 (guide §4.2 — hand whole batches to vectorized
    # native code): the |budget|x|corpus| brute scoring used to run as a
    # broadcast non-equi join whose projection evaluated 4 Catalyst
    # higher-order-function folds per scored PAIR — HOF lambdas are
    # interpreted per element, the dominant cost of this query (r17
    # already hoisted the norms; the remaining per-pair folds were the
    # floor for a pure-Catalyst plan).  The scoring is now ONE
    # mapInArrow kernel over the corpus scan: the bounded query sample
    # (≤ MATRYOSHKA_QUERY_BUDGET rows — the same _matryoshka_pick set)
    # is collected to the driver and shipped in the task closure, and
    # each Arrow batch scores against all queries with NumPy loops that
    # replay the EXACT IEEE op sequence of the Catalyst fold:
    #   * dot/norm folds run sequentially over the DIMENSION index
    #     (acc += e_i*q_i — one rounded multiply then one rounded add
    #     per step, vectorized ACROSS rows, never across dims), and a
    #     k-prefix fold's value IS the full fold's accumulator snapshot
    #     at step k, so one pass yields full + all three prefixes;
    #   * np.sqrt and np division are correctly-rounded IEEE doubles,
    #     identical to the JVM's, applied in the same dot → /qn → /n
    #     order.
    # Every cosine is therefore bit-identical to the r17 plan (oracle
    # re-verified at sf0.01 + sf0.1); plan: BroadcastNestedLoopJoin +
    # per-pair folds → one MapInArrow node over the spread corpus scan.
    # At 100 TB the kernel keeps the right shape: linear in corpus,
    # the bounded query set rides the closure (§4.5 — setup once per
    # task, Arrow batches amortized), and only (vec_id, e) crosses the
    # Python boundary.
    pick_rows = _matryoshka_pick(v0).collect()
    q_ids = [int(r["vec_id"]) for r in pick_rows]
    q_vecs = [list(r["e"]) for r in pick_rows]
    dims = tuple(MATRYOSHKA_DIMS)
    top_k = TOP_K

    def _score_batches(batches):
        import numpy as np
        import pyarrow as pa

        if not q_ids:
            return
        Q = np.asarray(q_vecs, dtype=np.float64)  # (m, d)
        m, d = Q.shape
        snap_at = set(dims) | {d}
        # Catalyst's slice(e, 1, k) CLAMPS to the array length, so a
        # k-prefix of a shorter-than-k vector is the whole vector: a
        # snapshot at min(k, d) reproduces that exactly
        snap_pts = {min(k, d) for k in snap_at}

        def at(snaps, k):
            return snaps[min(k, d)]

        # query-side norms: the same sequential fold + sqrt as norm()
        qacc = np.zeros(m)
        qn = {}
        for i in range(d):
            qacc += Q[:, i] * Q[:, i]
            if i + 1 in snap_pts:
                qn[i + 1] = np.sqrt(qacc)
        qid_arr = np.asarray(q_ids, dtype=np.int64)
        names = ["trunc", "query_id", "neighbor_id", "cos"]
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(batch.schema.get_field_index("vec_id")).to_numpy(
                zero_copy_only=False
            )
            E = (
                batch.column(batch.schema.get_field_index("e"))
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(n, d)
            )
            nacc = np.zeros(n)
            dacc = np.zeros((n, m))
            nsq = {}
            nn = {}
            dd = {}
            for i in range(d):
                nacc += E[:, i] * E[:, i]
                dacc += E[:, i : i + 1] * Q[:, i][None, :]
                if i + 1 in snap_pts:
                    nsq[i + 1] = nacc.copy()
                    nn[i + 1] = np.sqrt(nacc)
                    dd[i + 1] = dacc.copy()
            out_t, out_q, out_n, out_c = [], [], [], []
            for k in sorted(snap_at):
                # one rounded /qn then one rounded /n — the Catalyst
                # projection's exact division order
                cos_k = (at(dd, k) / at(qn, k)[None, :]) / at(nn, k)[:, None]
                for j in range(m):
                    mask = ids != qid_arr[j]
                    nb = ids[mask]
                    cj = cos_k[mask, j]
                    # per-batch top-K candidates under the GLOBAL
                    # ranking order (cos DESC, neighbor_id ASC; NaN
                    # ranks LARGEST, Spark's descending-sort rule) —
                    # the union of per-batch top-Ks is a superset of
                    # the global top-K, so the downstream window
                    # selects exactly the rows the old full-set window
                    # did, while only K rows per (batch, trunc, query)
                    # ever leave the kernel (§2.3: shuffle decisions,
                    # not the scored corpus)
                    if len(cj) > top_k:
                        key = np.where(np.isnan(cj), -np.inf, -cj)
                        sel = np.lexsort((nb, key))[:top_k]
                        nb, cj = nb[sel], cj[sel]
                    out_t.append(np.full(len(nb), k, dtype=np.int32))
                    out_q.append(np.full(len(nb), qid_arr[j], dtype=np.int64))
                    out_n.append(nb)
                    out_c.append(cj)
            # per-batch ENERGY partials as negative-trunc marker rows
            # (§2.3 — one corpus pass): nacc's snapshot at k IS
            # dot(e[:k], e[:k]), so the old separate energy aggregate's
            # per-row fixed-point share floor((dk/dfull)*1e9 + 0.5)
            # falls out here for free — op-for-op the Catalyst r9
            # expression ((dk / dfull) * 1e9) + 0.5 then floor.  Each
            # partial sum is an exact integer ≤ |batch| x 1e9 « 2^53,
            # so carrying it in the double `cos` column is lossless;
            # nansum mirrors Spark's sum-skips-NULL on a zero-norm row
            # (floor(NaN) casts to NULL in the Catalyst form).
            # neighbor_id carries the batch row count for n_vec.
            for k in dims:
                r9 = np.floor(at(nsq, k) / at(nsq, d) * 1e9 + 0.5)
                out_t.append(np.full(1, -k, dtype=np.int32))
                out_q.append(np.full(1, -1, dtype=np.int64))
                out_n.append(np.full(1, n, dtype=np.int64))
                out_c.append(np.asarray([np.nansum(r9)]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_t)),
                    pa.array(np.concatenate(out_q)),
                    pa.array(np.concatenate(out_n)),
                    pa.array(np.concatenate(out_c)),
                ],
                names,
            )

    # Candidate set: |partitions| x |rankings| x |queries| x K rows —
    # corpus-INDEPENDENT per partition.  One repartition by query_id
    # (a subset of every window's (trunc, query_id) key, so the hash
    # clustering satisfies all of them) + lazy checkpoint; the four
    # old per-ranking windows collapse into ONE window over this
    # bounded frame.
    cands = (
        v0.mapInArrow(
            _score_batches, "trunc int, query_id long, neighbor_id long, cos double"
        )
        .repartition("query_id")
        .localCheckpoint(eager=False)
    )
    w = W.partitionBy("trunc", "query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    ranked = (
        cands.filter(F.col("trunc") > 0)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("trunc", "query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    full_dim = len(q_vecs[0]) if q_vecs else 0

    def topk(k: int) -> DataFrame:
        return ranked.filter(F.col("trunc") == k).select("query_id", "neighbor_id")

    full = topk(full_dim)
    nq = full.agg(F.countDistinct("query_id").alias("n_queries"))

    # prefix energies reassembled from the kernel's per-batch partials
    # (exact-integer doubles; the sum of sums regroups an integer
    # addition, so the total is bit-identical to the old one-pass
    # corpus aggregate).  n_vec rides any single marker family — each
    # batch emits its row count once per prefix.
    mk = cands.filter(F.col("trunc") < 0)
    en = mk.agg(
        F.coalesce(
            F.sum(
                F.when(F.col("trunc") == -int(MATRYOSHKA_DIMS[0]), F.col("neighbor_id"))
            ),
            F.lit(0),
        ).alias("n_vec"),
        *[
            # cast each exact-integer partial to LONG before the sum:
            # the per-batch partial is ≤ |batch| x 1e9 « 2^53 (exact in
            # a double), but the corpus TOTAL would stop being exact
            # past ~9e6 vectors if summed as doubles — the long sum is
            # exact at any corpus size, like the old one-pass aggregate
            F.sum(F.when(F.col("trunc") == -int(k), F.col("cos")).cast("long"))
            .alias(f"s9_{k}")
            for k in MATRYOSHKA_DIMS
        ],
    )

    rows = []
    for k in MATRYOSHKA_DIMS:
        ov = full.join(topk(k), ["query_id", "neighbor_id"]).agg(
            F.count("*").alias("n_overlap")
        )
        rows.append(
            ov.crossJoin(F.broadcast(nq))
            .crossJoin(F.broadcast(en))
            .select(
                F.lit(k).alias("trunc_dim"),
                "n_queries",
                "n_overlap",
                round_half_up(
                    F.col("n_overlap").cast("double")
                    / (F.col("n_queries") * F.lit(float(TOP_K))),
                    6,
                ).alias("topk_agreement"),
                round_half_up(
                    F.col(f"s9_{k}").cast("double") / (F.col("n_vec") * F.lit(1e9)), 6
                ).alias("mean_energy_share"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def _matryoshka_sql() -> str:
    arms = []
    for k in MATRYOSHKA_DIMS:
        arms.append(f"""
SELECT {k} AS trunc_dim,
       (SELECT count(DISTINCT query_id) FROM full_ranked) AS n_queries,
       (SELECT count(*)::BIGINT
        FROM full_ranked f JOIN (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
            FROM (
              SELECT q.query_id, v.vec_id AS neighbor_id,
                     list_dot_product(qe[1:{k}], e[1:{k}])
                       / sqrt(list_dot_product(qe[1:{k}], qe[1:{k}]))
                       / sqrt(list_dot_product(e[1:{k}], e[1:{k}])) AS cos
              FROM q JOIN v ON v.vec_id <> q.query_id)
          ) WHERE rnk <= {TOP_K}
        ) t USING (query_id, neighbor_id)) AS n_overlap,
       {sql_round_half_up(f"(SELECT count(*) FROM full_ranked f JOIN (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM (SELECT q.query_id, v.vec_id AS neighbor_id, list_dot_product(qe[1:{k}], e[1:{k}]) / sqrt(list_dot_product(qe[1:{k}], qe[1:{k}])) / sqrt(list_dot_product(e[1:{k}], e[1:{k}])) AS cos FROM q JOIN v ON v.vec_id <> q.query_id)) WHERE rnk <= {TOP_K}) t USING (query_id, neighbor_id)) * 1.0 / ((SELECT count(DISTINCT query_id) FROM full_ranked) * {float(TOP_K)})", 6)} AS topk_agreement,
       {sql_round_half_up(f"(SELECT CAST(sum(CAST(floor(list_dot_product(e[1:{k}], e[1:{k}]) / list_dot_product(e, e) * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) FROM v) / ((SELECT count(*) FROM v) * 1e9)", 6)} AS mean_energy_share""")
    body = "\nUNION ALL\n".join(arms)
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), q AS (
  SELECT vec_id AS query_id, qe FROM (
    SELECT vec_id, e AS qe,
           row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) AS rn
    FROM v)
  WHERE rn <= {MATRYOSHKA_QUERY_BUDGET}
), full_ranked AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
    FROM (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             list_dot_product(qe, e) / sqrt(list_dot_product(qe, qe))
               / sqrt(list_dot_product(e, e)) AS cos
      FROM q JOIN v ON v.vec_id <> q.query_id)
  ) WHERE rnk <= {TOP_K}
)
{body}
"""


MATRYOSHKA_SQL = _matryoshka_sql()


def similarity_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 audit of ALL THREE approximate index paths against the
    brute ground truth — the acceptance gate an ANN index must pass
    before it replaces exact search in a production retrieval pipeline.
    For every query vector: n_true = its brute top-3 set size, n_hit =
    how many of those the LSH / IVF / IVFPQ candidate path actually
    returned, recall = n_hit / n_true.  Output: (query_id, method,
    n_true, n_hit, recall), one row per (query, method).  The IVFPQ arm
    additionally quantifies what 8x-compressed asymmetric-distance
    ranking costs in recall relative to the exact-cosine IVF arm over
    the same inverted lists.

    This promotes the pytest-only recall assertions into a registered,
    fully-oracled query: the DuckDB twin recomputes brute/LSH/IVF from
    their existing bit-identical oracle chains and must land on the
    same per-query hit counts.  Plan: the three sub-plans are the
    audited plans of their own registered queries (brute's bounded
    broadcast, LSH's (table,bucket) equi-join, IVF's nprobe equi-join);
    the audit adds only left-semi joins on (query_id, neighbor_id)
    scalars and two ≤|queries|-row aggregates.  At 100 TB the audit runs
    on a sampled query set exactly as its inputs do (all three inherit
    the ANN_QUERY_BUDGET md5-ranked query sample via ann_query_ids).

    r9: all four inputs are the MEMOIZED materialized neighbor sets
    (ann_results) — the audit no longer re-derives any arm; it joins
    four ~|queries|·k-row checkpointed frames (VERDICT r8 #2)."""
    brute = (
        ann_results(spark, sf_dir, "brute")
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id")
    )
    truth = brute.groupBy("query_id").agg(F.count("*").alias("n_true"))
    arms = []
    for method in ("lsh", "ivf", "ivfpq"):
        ann = ann_results(spark, sf_dir, method).select("query_id", "neighbor_id")
        hits = (
            brute.join(ann, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count("*").alias("n_hit"))
        )
        arms.append(
            truth.join(hits, "query_id", "left")
            .na.fill(0, ["n_hit"])
            .select(
                "query_id",
                F.lit(method).alias("method"),
                "n_true",
                "n_hit",
                round_half_up(
                    F.col("n_hit").cast("double") / F.col("n_true"), 6
                ).alias("recall"),
            )
        )
    out = arms[0]
    for arm in arms[1:]:
        out = out.unionAll(arm)
    return out


def _ann_recall_sql() -> str:
    method_arm = (
        "SELECT t.query_id, '{m}' AS method, t.n_true,\n"
        "       coalesce(h.n_hit, 0)::BIGINT AS n_hit,\n"
        f"       {sql_round_half_up('CAST(coalesce(h.n_hit, 0) AS DOUBLE) / t.n_true', 6)} AS recall\n"
        "FROM truth t LEFT JOIN hit_{m} h USING (query_id)"
    )
    return f"""
WITH brute AS (
  SELECT query_id, neighbor_id FROM ({SIMILARITY_TOPK_SQL}) WHERE rnk <= 3
), lsh AS (
  SELECT query_id, neighbor_id FROM ({SIMILARITY_ANN_LSH_SQL})
), ivf AS (
  SELECT query_id, neighbor_id FROM ({SIMILARITY_ANN_IVF_SQL})
), ivfpq AS (
  SELECT query_id, neighbor_id FROM ({SIMILARITY_ANN_IVFPQ_SQL})
), truth AS (
  SELECT query_id, count(*)::BIGINT AS n_true FROM brute GROUP BY 1
), hit_lsh AS (
  SELECT b.query_id, count(*)::BIGINT AS n_hit
  FROM brute b JOIN lsh a USING (query_id, neighbor_id) GROUP BY 1
), hit_ivf AS (
  SELECT b.query_id, count(*)::BIGINT AS n_hit
  FROM brute b JOIN ivf a USING (query_id, neighbor_id) GROUP BY 1
), hit_ivfpq AS (
  SELECT b.query_id, count(*)::BIGINT AS n_hit
  FROM brute b JOIN ivfpq a USING (query_id, neighbor_id) GROUP BY 1
)
{method_arm.format(m='lsh')}
UNION ALL
{method_arm.format(m='ivf')}
UNION ALL
{method_arm.format(m='ivfpq')}
"""


SIMILARITY_ANN_RECALL_SQL = _ann_recall_sql()


#: RRF smoothing constant — the standard k=60 from the original
#: Cormack/Clarke/Buettcher formulation (and Elasticsearch's default).
RRF_K = 60
#: fused neighbors reported per query
RRF_TOP = 3


def similarity_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the three ANN arms — the standard
    ensemble a retrieval stack runs when multiple rankers (lexical +
    vector, or several index variants) each return a candidate list:
    score(q, d) = Σ_arms 1/(RRF_K + rank_arm(q, d)), fused list ranked
    by that sum.  Here the arms are the LSH / IVF / IVF-PQ neighbor
    sets over the shared md5-sampled query set — the ensemble that
    recovers recall lost to any single index's blind spots without
    touching the brute path.  Output: (query_id, neighbor_id,
    fused_rank, n_arms, rrf_score), top-RRF_TOP per query.

    Deterministic/exact: ranks are the arms' integer rnk columns; each
    reciprocal contributes the FIXED-POINT integer
    floor(1e9/(RRF_K + rnk) + 0.5), so the per-pair sum is an
    order-independent BIGINT and the fused ordering (score9 desc,
    neighbor_id) is total — bit-identical in DuckDB, which recomputes
    the arms from their existing oracle chains.

    Plan: the arms are the memoized materialized neighbor sets
    (ann_results — |queries|·k rows each, corpus never rematerialized);
    fusion is one union + one (query_id, neighbor_id) hash agg + a
    per-query (PARTITIONED) rank window over ≤3k candidate rows per
    query.  At 100 TB the fused set stays |queries|-bounded exactly
    like its inputs."""
    arms = [
        ann_results(spark, sf_dir, m).select("query_id", "neighbor_id", "rnk")
        for m in ("lsh", "ivf", "ivfpq")
    ]
    u = arms[0].unionAll(arms[1]).unionAll(arms[2])
    contrib = F.floor(F.lit(1e9) / (F.lit(RRF_K) + F.col("rnk")) + F.lit(0.5)).cast(
        "long"
    )
    scored = u.groupBy("query_id", "neighbor_id").agg(
        F.count("*").alias("n_arms"), F.sum(contrib).alias("score9")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score9"), "neighbor_id")
    return (
        scored.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= RRF_TOP)
        .select(
            "query_id",
            "neighbor_id",
            "fused_rank",
            "n_arms",
            round_half_up(F.col("score9").cast("double") / F.lit(1e9), 6).alias(
                "rrf_score"
            ),
        )
    )


def _rrf_fusion_sql() -> str:
    return f"""
WITH lsh AS (
  SELECT query_id, neighbor_id, rnk FROM ({SIMILARITY_ANN_LSH_SQL})
), ivf AS (
  SELECT query_id, neighbor_id, rnk FROM ({SIMILARITY_ANN_IVF_SQL})
), ivfpq AS (
  SELECT query_id, neighbor_id, rnk FROM ({SIMILARITY_ANN_IVFPQ_SQL})
), u AS (
  SELECT * FROM lsh UNION ALL SELECT * FROM ivf UNION ALL SELECT * FROM ivfpq
), scored AS (
  SELECT query_id, neighbor_id, count(*)::BIGINT AS n_arms,
         sum(CAST(floor(1e9 / ({RRF_K} + rnk) + 0.5) AS BIGINT)) AS score9
  FROM u GROUP BY 1, 2
), fused AS (
  SELECT query_id, neighbor_id, n_arms, score9,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score9 DESC, neighbor_id) AS fused_rank
  FROM scored
)
SELECT query_id, neighbor_id, fused_rank, n_arms,
       {sql_round_half_up('CAST(score9 AS DOUBLE) / 1e9', 6)} AS rrf_score
FROM fused WHERE fused_rank <= {RRF_TOP}
"""


SIMILARITY_RRF_SQL = _rrf_fusion_sql()


#: nprobe ladder for the IVF tuning curve — spans "cheapest" (1 list
#: per query) to "most of the index" (8 of 32 lists).
NPROBE_CURVE = (1, 2, 4, 8)


def similarity_ann_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF TUNING curve — corpus-level recall@3 vs nprobe: the
    how-many-lists-must-I-probe sizing decision every IVF deployment
    makes (probe count is THE latency/recall dial: candidates scanned
    grow ~linearly with nprobe).  For each nprobe in NPROBE_CURVE, run
    the exact IVF candidate path (`_ann_ivf_plan`, the audited plan of
    similarity_ann_ivf, parametric in nprobe) and score its top-3
    against the memoized brute ground truth.  Output one row per
    nprobe: (nprobe, n_queries, n_true, n_hit, recall) — the curve an
    operator reads to pick the knee.  Companion to
    `similarity_ann_recall` (fixed-nprobe, per-query, 3 methods) the
    way `vocab_coverage_curve` companions `vocab_oov_rate`.

    Plan: the 4 arms share the memoized quantizer/lists; each adds one
    probe assignment (broadcast fold/sort), one cid equi-join bounded
    by list sizes, a semi-join on (query_id, neighbor_id) scalars and
    two 1-row aggregates cross-attached (allowlisted scalar-attach).
    At 100 TB the curve runs on the sampled query set like every ANN
    audit here (the ANN_QUERY_BUDGET md5-ranked sample, ann_query_ids).

    Cites reference surface: none (extension operator — SURVEY §2.3)."""
    key = (spark.sparkContext.applicationId, os.path.normpath(sf_dir), "nprobe_curve")
    if key in _ann_memo:
        return _ann_memo[key]
    brute = (
        ann_results(spark, sf_dir, "brute")
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id")
    )
    totals = brute.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count("*").alias("n_true"),
    )
    arms = []
    for np_ in NPROBE_CURVE:
        ann = _ann_ivf_plan(spark, sf_dir, nprobe=np_).select("query_id", "neighbor_id")
        hit = brute.join(ann, ["query_id", "neighbor_id"], "left_semi").agg(
            F.count("*").alias("n_hit")
        )
        arms.append(
            totals.crossJoin(F.broadcast(hit)).select(
                F.lit(np_).cast("long").alias("nprobe"),
                "n_queries",
                "n_true",
                "n_hit",
                round_half_up(
                    F.col("n_hit").cast("double") / F.col("n_true"), 6
                ).alias("recall"),
            )
        )
    out = arms[0]
    for arm in arms[1:]:
        out = out.unionAll(arm)
    _ann_memo[key] = out.localCheckpoint(eager=True)
    return _ann_memo[key]


def ivf_list_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list balance report — the capacity check every
    production IVF deployment runs: per-query probe cost is nprobe x
    the sizes of the PROBED lists, so one oversized list (a dense
    region the coarse quantizer under-splits) silently turns the
    average-case sqrt(n) design point into near-linear scans for every
    query routed there.  One row: configured K (corpus-derived
    ``ivf_k``), non-empty/empty list counts, min/max/avg and exact
    discrete p50/p90 list sizes, and the imbalance factor max/avg (1.0
    = perfectly balanced; FAISS guidance flags >~3 as re-train-the-
    quantizer territory — at 100 TB this report is what pages before
    latency does).

    Exactness: sizes and selections are integers (type-1 discrete
    quantiles, value at position ceil(p·m) of the size multiset — tie
    order can't change the selected VALUE, so no cid tiebreak is
    needed); avg and imbalance are single double divisions of exact
    BIGINTs, rounded half-up — bit-identical cross-engine.  Plan: one
    groupBy over the memoized lists (K rows out) and ONE global
    aggregate whose quantiles come from ``sort_array(collect_list)`` —
    K is clamped at 64Ki (``IVF_K_MAX``), so the collected size array
    is bounded regardless of corpus size, and the whole report is two
    shuffles past the index scan ``ivf_lists`` already paid."""
    k = ivf_k(corpus_vector_count(spark, sf_dir))
    sizes = ivf_lists(spark, sf_dir).groupBy("cid").agg(F.count("*").alias("sz"))
    agg = sizes.agg(
        F.count("*").alias("n_lists"),
        F.sum("sz").alias("n_vectors"),
        F.min("sz").alias("min_list"),
        F.max("sz").alias("max_list"),
        F.sort_array(F.collect_list("sz")).alias("szs"),
    )

    def q_at(p: float) -> Column:
        return F.element_at(
            F.col("szs"), F.ceil(F.size("szs") * F.lit(p)).cast("int")
        )

    return agg.select(
        F.lit(k).cast("long").alias("k_configured"),
        "n_lists",
        (F.lit(k) - F.col("n_lists")).cast("long").alias("empty_lists"),
        "n_vectors",
        "min_list",
        "max_list",
        q_at(0.5).alias("p50_list"),
        q_at(0.9).alias("p90_list"),
        round_half_up(
            F.col("n_vectors").cast("double") / F.col("n_lists"), 6
        ).alias("avg_list"),
        round_half_up(
            F.col("max_list").cast("double") * F.col("n_lists") / F.col("n_vectors"),
            6,
        ).alias("imbalance"),
    )


IVF_LIST_BALANCE_SQL = f"""
WITH {_ivf_ctes()}, sizes AS (
  SELECT cid, count(*) AS sz FROM lists GROUP BY cid
), ranked AS (
  SELECT cid, sz, row_number() OVER (ORDER BY sz, cid) AS rn,
         count(*) OVER () AS m
  FROM sizes
), med AS (
  SELECT sz AS p50_list FROM ranked WHERE rn = ceil(m * 0.5)
), p90 AS (
  SELECT sz AS p90_list FROM ranked WHERE rn = ceil(m * 0.9)
), agg AS (
  SELECT count(*) AS n_lists, CAST(sum(sz) AS BIGINT) AS n_vectors,
         min(sz) AS min_list, max(sz) AS max_list
  FROM sizes
)
SELECT {IVF_KPARAM_SQL} AS k_configured,
       n_lists,
       {IVF_KPARAM_SQL} - n_lists AS empty_lists,
       n_vectors, min_list, max_list, p50_list, p90_list,
       {sql_round_half_up('CAST(n_vectors AS DOUBLE) / n_lists', 6)} AS avg_list,
       {sql_round_half_up('CAST(max_list AS DOUBLE) * n_lists / n_vectors', 6)} AS imbalance
FROM agg, med, p90
"""


def _ann_nprobe_curve_sql() -> str:
    arms = []
    for np_ in NPROBE_CURVE:
        arms.append(
            f"""SELECT {np_}::BIGINT AS nprobe,
       (SELECT count(DISTINCT query_id) FROM brute)::BIGINT AS n_queries,
       (SELECT count(*) FROM brute)::BIGINT AS n_true,
       (SELECT count(*) FROM brute b
        JOIN (SELECT query_id, neighbor_id FROM ({_ann_ivf_sql(np_)})) a
        USING (query_id, neighbor_id))::BIGINT AS n_hit,
       {sql_round_half_up(
           'CAST((SELECT count(*) FROM brute b '
           'JOIN (SELECT query_id, neighbor_id FROM (' + _ann_ivf_sql(np_) + ')) a '
           'USING (query_id, neighbor_id)) AS DOUBLE) '
           '/ (SELECT count(*) FROM brute)', 6)} AS recall"""
        )
    return (
        f"WITH brute AS (\n  SELECT query_id, neighbor_id FROM ({SIMILARITY_TOPK_SQL}) WHERE rnk <= 3\n)\n"
        + "\nUNION ALL\n".join(arms)
    )


SIMILARITY_ANN_NPROBE_CURVE_SQL = _ann_nprobe_curve_sql()


QUERIES = {
    "similarity_topk_brute": similarity_topk_brute,
    "similarity_ann_recall": similarity_ann_recall,
    "similarity_ann_nprobe_curve": similarity_ann_nprobe_curve,
    "similarity_hard_negatives": similarity_hard_negatives,
    "contamination_semantic": contamination_semantic,
    "similarity_matryoshka_agreement": similarity_matryoshka_agreement,
    "similarity_ann_lsh": similarity_ann_lsh,
    "similarity_ann_ivf": similarity_ann_ivf,
    "similarity_ann_ivfpq": similarity_ann_ivfpq,
    "ivf_recenter_audit": ivf_recenter_audit,
    "ivf_recenter_apply": ivf_recenter_apply,
    "ivf_list_balance": ivf_list_balance,
    "embedding_norm_stats": embedding_norm_stats,
    "embedding_dim_stats": embedding_dim_stats,
    "embedding_outlier_audit": embedding_outlier_audit,
    "embedding_label_centroids": embedding_label_centroids,
    "centroid_classify_eval": centroid_classify_eval,
    "similarity_rrf_fusion": similarity_rrf_fusion,
}

ORACLES = {
    "similarity_topk_brute": SIMILARITY_TOPK_SQL,
    "similarity_hard_negatives": SIMILARITY_HARD_NEG_SQL,
    "contamination_semantic": CONTAMINATION_SEMANTIC_SQL,
    "similarity_matryoshka_agreement": MATRYOSHKA_SQL,
    "embedding_norm_stats": EMBEDDING_NORM_SQL,
    "embedding_dim_stats": EMBEDDING_DIM_STATS_SQL,
    "embedding_outlier_audit": EMBEDDING_OUTLIER_SQL,
    "embedding_label_centroids": EMBEDDING_CENTROIDS_SQL,
    "centroid_classify_eval": CENTROID_CLASSIFY_SQL,
    # similarity_ann_lsh IS directly oracle-able: the ±1 planes are
    # literals and every float op sequence (projection fold, cosine,
    # rounding) is IEEE-identical on both engines (r6 upgrade from
    # rows-only).  similarity_ann_ivf joined it in r7: the quantizer's
    # one Lloyd step uses an order-independent fixed-point mean, so the
    # whole build (seeds -> assign -> mean -> assign -> topk) is
    # reproduced exactly by _ivf_ctes(); recall vs brute additionally
    # asserted in tests.
    "similarity_ann_lsh": SIMILARITY_ANN_LSH_SQL,
    "similarity_ann_ivf": SIMILARITY_ANN_IVF_SQL,
    "similarity_ann_ivfpq": SIMILARITY_ANN_IVFPQ_SQL,
    "ivf_recenter_audit": IVF_RECENTER_SQL,
    "ivf_recenter_apply": IVF_RECENTER_APPLY_SQL,
    "ivf_list_balance": IVF_LIST_BALANCE_SQL,
    # similarity_ann_recall composes the three oracles above as
    # subquery chains — bit-identical inputs in, exact integer hit
    # counts out.
    "similarity_ann_recall": SIMILARITY_ANN_RECALL_SQL,
    "similarity_ann_nprobe_curve": SIMILARITY_ANN_NPROBE_CURVE_SQL,
    # similarity_rrf_fusion composes the three arm oracles: integer
    # ranks in, fixed-point reciprocal sums out — fully exact.
    "similarity_rrf_fusion": SIMILARITY_RRF_SQL,
}
