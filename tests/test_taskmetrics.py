"""Executor task-time measurement (scipi_spark/taskmetrics.py) — the
contention-robust bench metric (round-6 verdict #1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scipi_spark import taskmetrics


def test_task_timer_attributes_query_work(spark):
    timer = taskmetrics.TaskTimer(spark)
    df = spark.range(0, 2_000_000, 1, 8).withColumn("k", F.col("id") % 97)
    wall, task_run, task_cpu = timer.measure(
        lambda: df.groupBy("k").agg(F.count("id")).count()
    )
    assert wall > 0
    # the shuffle+agg genuinely runs tasks; their summed run time is
    # non-trivial and the JVM CPU floor is positive but never exceeds it
    assert task_run > 0.005
    assert 0 < task_cpu <= task_run * 1.5


def test_snapshot_delta_ignores_evicted_stages():
    before = {(1, 0): (500, 10**9), (2, 0): (100, 10**8)}
    after = {(2, 0): (250, 2 * 10**8), (7, 0): (40, 10**7)}  # stage 1 evicted
    run_ms, cpu_ms = taskmetrics.delta_ms(before, after)
    assert run_ms == 150 + 40
    assert cpu_ms == (10**8 + 10**7) / 1e6


def test_measure_is_cumulative_safe(spark):
    """Back-to-back measurements don't double-count each other's stages."""
    timer = taskmetrics.TaskTimer(spark)
    df = spark.range(0, 500_000, 1, 4)
    _, t1, _ = timer.measure(lambda: df.agg(F.sum("id")).count())
    _, t2, _ = timer.measure(lambda: df.agg(F.sum("id")).count())
    # identical work: second measurement must not include the first's
    # task time (a cumulative-sum bug would make t2 >= 2 * t1)
    assert t2 < max(2 * t1, t1 + 0.5)
