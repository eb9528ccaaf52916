"""Port of the reference's worker-failure tests (SURVEY §5 layer 2,
mapreduce/test_test.go TestOneFailure/TestManyFailures): a task that
dies mid-flight is re-executed and the job's result is unaffected.

In the reference the master re-issues the task to the next idle worker
(schedule.go:27-34). In Spark that capability is the task scheduler's
retry (``spark.task.maxFailures``; ``local[N,R]`` locally) — the test
injects a deterministic first-attempt crash via TaskContext and asserts
the job completes with exactly-correct results.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import functions as F


def test_task_retry_recovers_and_result_exact(spark):
    """One partition's task crashes on its first attempt; Spark
    re-executes it and the aggregate equals the no-failure answer."""

    def flaky(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        if ctx.partitionId() == 1 and ctx.attemptNumber() == 0:
            raise RuntimeError("injected worker failure (first attempt)")
        for pdf in batches:
            yield pdf.assign(doubled=pdf["id"] * 2)

    df = (
        spark.range(0, 10_000)
        .repartition(4)
        .mapInPandas(flaky, schema="id long, doubled long")
    )
    agg = df.agg(
        F.count("*").alias("n"), F.sum("doubled").alias("s")
    ).collect()[0]
    assert agg["n"] == 10_000
    assert agg["s"] == 2 * (9_999 * 10_000) // 2


def test_retry_is_exactly_once_not_at_least_once(spark):
    """Re-execution must not double-count the failed partition's rows
    (the reference relies on idempotent task output; Spark's shuffle
    commit protocol gives the same guarantee)."""

    def flaky(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        emitted = 0
        for pdf in batches:
            emitted += len(pdf)
            yield pdf
        # crash AFTER emitting some output on the first attempt — the
        # partial output of the failed attempt must be discarded
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0 and emitted:
            raise RuntimeError("injected failure after partial output")

    df = spark.range(0, 5_000).repartition(4).mapInPandas(flaky, schema="id long")
    rows = df.groupBy("id").count().where(F.col("count") > 1).count()
    assert rows == 0
    assert df.count() == 5_000
