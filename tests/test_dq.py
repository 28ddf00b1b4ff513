"""Planted-fixture semantics for operators/dq.py (the oracle battery
covers sf-data hash-parity; these pin rule semantics on corrupted
inputs the clean driver data never exercises)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from mini_hadoop_spark.operators.dq import (
    dq_expectations,
    events_decayed_engagement,
)


def _write_orders_customer(tmp_path, orders, custkeys):
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                "o_orderstatus": pa.array([o[2] for o in orders]),
                "o_totalprice": pa.array([o[3] for o in orders], pa.float64()),
                "o_orderdate": pa.array([o[4] for o in orders], pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(orders)),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(custkeys, pa.int64()),
                "c_name": pa.array([f"c{k}" for k in custkeys]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    return str(tmp_path)


def test_dq_flags_each_violation_class(spark, tmp_path):
    d = dt.datetime(2024, 1, 1)
    orders = [
        (1, 10, "O", 100.0, d),      # clean
        (1, 10, "F", 50.0, d),       # duplicate orderkey
        (2, 99, "P", -5.0, d),       # negative price + dangling FK (99)
        (3, 10, "X", 10.0, None),    # bad status + null date
    ]
    path = _write_orders_customer(tmp_path, orders, custkeys=[10])
    rows = {r["rule"]: r for r in dq_expectations(spark, path).collect()}
    assert set(rows) == {
        "not_null_orderkey", "unique_orderkey", "nonneg_totalprice",
        "status_in_domain", "not_null_orderdate", "fk_custkey_exists",
    }
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert rows["not_null_orderkey"]["n_violations"] == 0 and rows["not_null_orderkey"]["pass"]
    assert rows["unique_orderkey"]["n_violations"] == 1 and not rows["unique_orderkey"]["pass"]
    assert rows["nonneg_totalprice"]["n_violations"] == 1
    assert rows["status_in_domain"]["n_violations"] == 1
    assert rows["not_null_orderdate"]["n_violations"] == 1
    assert rows["fk_custkey_exists"]["n_violations"] == 1


def _write_events(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[1] for r in rows]),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def test_decayed_engagement_halves_per_day(spark, tmp_path):
    day = dt.datetime(2024, 3, 10, 12, 0, 0)
    path = _write_events(
        tmp_path,
        [
            (day, "click", 8.0),                            # age 0 -> 8.0
            (day - dt.timedelta(days=1), "click", 8.0),     # age 1 -> 4.0
            (day - dt.timedelta(days=3), "click", 8.0),     # age 3 -> 1.0
            (day - dt.timedelta(days=2), "view", 10.0),     # age 2 -> 2.5
        ],
    )
    rows = {r["event_type"]: r for r in events_decayed_engagement(spark, path).collect()}
    assert rows["click"]["n_events"] == 3
    assert rows["click"]["decayed_sum"] == 13.0
    assert rows["view"]["decayed_sum"] == 2.5


def test_hourly_anomalies_flags_planted_spike(spark, tmp_path):
    base = dt.datetime(2024, 3, 1, 0, 30, 0)
    rows = []
    # 9 quiet hours with 1 click each, then a 50-event spike hour
    for h in range(9):
        rows.append((base + dt.timedelta(hours=h), "click", 1.0))
    for i in range(50):
        rows.append((base + dt.timedelta(hours=9, seconds=i), "click", 1.0))
    path = _write_events(tmp_path, rows)
    from mini_hadoop_spark.operators.dq import events_hourly_anomalies

    out = sorted(events_hourly_anomalies(spark, path).collect(), key=lambda r: r["rnk"])
    assert len(out) == 3
    assert out[0]["n_events"] == 50 and out[0]["is_anomaly"]
    # the quiet hours are all identical -> z < 0 and not anomalous
    assert out[1]["n_events"] == 1 and not out[1]["is_anomaly"]
    assert out[0]["z_r"] > 2.9
