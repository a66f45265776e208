"""As-of and range join tests against hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from scipi_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return F.to_timestamp(F.lit(s))


def _frames(spark):
    trades = spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 10:00:00"),
            (2, "u1", "2024-01-01 10:05:00"),
            (3, "u2", "2024-01-01 10:03:00"),
            (4, "u3", "2024-01-01 10:00:00"),  # user with no quotes
        ],
        "trade_id long, user string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    quotes = spark.createDataFrame(
        [
            ("u1", "2024-01-01 09:59:00", 10.0),
            ("u1", "2024-01-01 10:05:00", 12.0),  # tie with trade 2 -> matches
            ("u1", "2024-01-01 10:06:00", 13.0),  # after all trades
            ("u2", "2024-01-01 10:00:00", 20.0),
            ("u2", "2024-01-01 10:02:00", 21.0),
        ],
        "user string, ts string, px double",
    ).withColumn("ts", F.to_timestamp("ts"))
    return trades, quotes


def test_asof_join_semantics(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on="ts", by=["user"])
    got = {r["trade_id"]: r["px_r"] for r in out.collect()}
    assert got == {1: 10.0, 2: 12.0, 3: 21.0, 4: None}
    assert out.count() == trades.count()  # left-preserving


def test_asof_join_no_by(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00")], "id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("2024-01-01 00:05:00", 5.0), ("2024-01-01 00:20:00", 9.0)],
        "ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = asof_join(left, right, on="ts").collect()
    assert got[0]["v_r"] == 5.0


def test_range_join_semantics(spark):
    trades, quotes = _frames(spark)
    out = range_join(
        trades, quotes, on="ts", by=["user"], lower_seconds=0, upper_seconds=120
    )
    pairs = {(r["trade_id"], r["px_r"]) for r in out.collect()}
    # trade1@10:00: quotes within [09:58, 10:00] for u1 -> 09:59 (10.0)
    # trade2@10:05: [10:03,10:05] -> 10:05 (12.0)
    # trade3@10:03 u2: [10:01,10:03] -> 10:02 (21.0)
    assert pairs == {(1, 10.0), (2, 12.0), (3, 21.0)}


def test_range_join_bucket_boundary(spark):
    # right event exactly upper_seconds before left -> included
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00")], "id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0), ("2023-12-31 23:59:59", 2.0)],
        "ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = range_join(left, right, on="ts", lower_seconds=0, upper_seconds=600)
    assert {r["v_r"] for r in out.collect()} == {1.0}
