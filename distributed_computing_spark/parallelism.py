"""Partitioning helpers for Python-compute-bound Arrow stages.

CLAUDE.md round-3 lesson, promoted to a shared helper in round 12:
Spark sizes scan splits and AQE-coalesced exchanges by BYTES, which
under-parallelizes a Python-compute-bound ``mapInPandas``/pandas_udf
stage — a 30 MB single-file table is one split, so the whole Arrow
stage runs on ONE core regardless of cluster width (measured: the
JPEG decode pipeline ran 6.5-7.6 s on the 1-split sf0.1 documents
scan vs 1.5-3.0 s after spreading to the core count). Partition count
for Arrow compute stages should track CORES, not the shuffle byte
target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_arrow(df: DataFrame) -> DataFrame:
    """Ensure a Python-bound Arrow stage sees at least
    ``defaultParallelism`` input partitions.

    Scale-adaptive, not a local[32] constant: when the input already
    carries >= core-count splits (any real multi-file table at scale)
    this is a NO-OP — the round-robin exchange only fires on
    small/under-split inputs, where one skinny pass of the stage's
    (already column-pruned) input buys full-width Python compute.
    Round-robin ``repartition(n)`` is deterministic under task retry
    (sortBeforeRepartition, SPARK-23207) and every consumer below is a
    per-row map or an order-independent aggregate, so results are
    unchanged.
    """
    if df.isStreaming:
        # micro-batch inputs size themselves per trigger; .rdd is also
        # unsupported on a streaming frame — the helper is a no-op so
        # batch/stream-shared transforms can call it unconditionally
        return df
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
