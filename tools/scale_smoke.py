#!/usr/bin/env python
"""Scale smoke: time selected queries at sf0.1 vs a 10x corpus built in
/tmp, and report the wall-time ratio (DESIGN.md lessons 11-12 record the
round-5 numbers; this tool makes the harness reproducible).

The 10x corpus is 10 shifted copies of the sf0.1 tables:

* documents  — doc_id + i*10^7; text run through a per-copy letter
  rotation (translate), so each copy keeps its internal near-dup
  structure but shares NO shingles across copies — pair-emitting stages
  stay linear instead of exploding quadratically on identical copies.
* lineitem/orders — l_orderkey/o_orderkey + i*10^9 (same part/supp/cust
  keys, so dim joins still resolve); events — event_id shifted,
  user_id + i*10^6 (10x users, same per-user density).
* embeddings — vec_id + i*10^7 (10x vectors; brute-force topk with its
  %50 fractional query rule stays excluded by design — ANN is its scale
  path — but the matryoshka audit is INCLUDED since r7: its md5-ranked
  ABSOLUTE query budget makes it linear in corpus size).
* dims (region nation customer supplier part) — copied as-is.

Usage: python tools/scale_smoke.py [query ...]
"""

from __future__ import annotations

import os
import shutil
import string
import sys
import time

COPIES = 10
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_scale10x"

DEFAULT_QUERIES = [
    "dedup_minhash_lsh_md5",
    "quality_c4_rules",
    "split_leakage_audit",
    "q2_min_cost_supplier",
    "q21_waiting_suppliers",
    "orders_rfm_segmentation_approx",
    "similarity_matryoshka_agreement",
]


def _rot_alphabet(i: int) -> str:
    letters = string.ascii_lowercase
    return letters[i:] + letters[:i]


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    for dim in ("region", "nation", "customer", "supplier", "part"):
        dst = f"{OUT}/{dim}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{dim}.parquet", dst)

    def tenfold(name: str, shift_fn) -> None:
        dst = f"{OUT}/{name}.parquet"
        if os.path.exists(dst):
            return
        base = spark.read.parquet(f"{BASE}/{name}.parquet")
        parts = [shift_fn(base, i) for i in range(COPIES)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        # single-file parquet like the driver's layout (coalesce is fine:
        # this is test-fixture construction, not a production write)
        tmp = f"{OUT}/_{name}_dir"
        out.coalesce(4).write.mode("overwrite").parquet(tmp)
        os.makedirs(dst, exist_ok=True)
        for j, f in enumerate(sorted(os.listdir(tmp))):
            if f.endswith(".parquet"):
                shutil.move(f"{tmp}/{f}", f"{dst}/part-{j:03d}.parquet")
        shutil.rmtree(tmp)

    lower = string.ascii_lowercase
    upper = string.ascii_uppercase

    tenfold(
        "documents",
        lambda df, i: df.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.translate(
                F.col("text"), lower + upper, _rot_alphabet(i) + _rot_alphabet(i).upper()
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        ),
    )
    tenfold(
        "lineitem",
        lambda df, i: df.withColumn("l_orderkey", F.col("l_orderkey") + i * 1_000_000_000),
    )
    tenfold(
        "orders",
        lambda df, i: df.withColumn("o_orderkey", F.col("o_orderkey") + i * 1_000_000_000),
    )
    tenfold(
        "events",
        lambda df, i: df.withColumn("event_id", F.col("event_id") + i * 100_000_000)
        .withColumn("user_id", F.col("user_id") + i * 1_000_000),
    )
    tenfold(
        "embeddings",
        lambda df, i: df.withColumn("vec_id", F.col("vec_id") + i * 10_000_000),
    )


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mini_hadoop_spark.session import get_spark

    spark = get_spark("scale-smoke")
    build_corpus(spark)

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    def time_query(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"{'query':40s} {'1x sec':>8s} {'10x sec':>8s} {'ratio':>6s}")
    for name in names:
        t1 = time_query(name, BASE)
        t10 = time_query(name, OUT)
        print(f"{name:40s} {t1:8.2f} {t10:8.2f} {t10 / t1:6.2f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
