#!/usr/bin/env python
"""Driver-contract simulation — the external harness's comparison,
reproduced locally on a VANILLA SparkSession (the driver does not use
our session.py, so any config the code needs must be set at runtime
inside the package; this sim catches config leaks the pytest session
would mask).

For each named query: run the Spark plan AND the DuckDB oracle on the
same sf0.01 parquet tables, compare row count + 9-sig-digit canonical
value multiset (the driver's hash canon).

Usage:
    python tools/driver_sim.py --window          # the 50 DRIVER_WINDOW slots
    python tools/driver_sim.py --all             # every oracled query
    python tools/driver_sim.py name [name ...]   # specific queries
    SPARK_GRAFT_SIM_SF_DIR=... overrides the data dir (default sf0.01).

Exit status 1 if any query mismatches — usable as a gate.
"""

from __future__ import annotations

import os
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    import pandas as pd

    df = df[sorted(df.columns)]
    return sorted(
        tuple(
            "<null>"
            if (v is None or (isinstance(v, float) and pd.isna(v)))
            else (f"{v:.9g}" if isinstance(v, float) else str(v))
            for v in r
        )
        for r in df.itertuples(index=False)
    )


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
    args = sys.argv[1:]

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from mini_hadoop_spark.registry import DRIVER_WINDOW

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    if "--window" in args:
        names = list(DRIVER_WINDOW)
    elif "--all" in args:
        names = [n for n in qs if n in osql]
    else:
        names = args
        assert names, "pass --window, --all, or query names"
        missing = [n for n in names if n not in qs]
        assert not missing, f"not registered: {missing}"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    fails: list[str] = []
    t0 = time.time()
    for name in names:
        if name not in osql:
            print(f"{name}: rows-only (no oracle) — skipped")
            continue
        try:
            s = qs[name](spark, sf_dir).toPandas()
            o = con.sql(osql[name]).fetchdf()
            ok = len(s) == len(o) and _canon(s) == _canon(o)
        except Exception as exc:  # noqa: BLE001 — record and keep simming
            ok = False
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:160]}")
        if not ok:
            fails.append(name)
            print(f"{name}: MISMATCH")
    n = len([x for x in names if x in osql])
    print(
        f"driver sim @ {sf_dir}: {n - len(fails)}/{n} green in "
        f"{time.time() - t0:.0f}s; fails={fails}"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
