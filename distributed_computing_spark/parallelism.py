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

Round-13 (VERDICT r12 item 4): the split probe is METADATA-ONLY.
The round-12 probe was ``df.rdd.getNumPartitions()``, which compiles
the physical plan of whatever frame it is handed — measured ~7 s cold
on corpus_pipeline's derived frame for a guaranteed no-op, and the
"raw-scan call sites only" rule lived in docstrings with no guard.
Now the helper walks the (already-computed) ANALYZED logical plan:

- a {Project, Filter, SubqueryAlias} chain over one file-source
  ``LogicalRelation`` → split count estimated from the scan's FILE
  INDEX (total bytes + file count + the session's
  maxPartitionBytes/openCostInBytes, Spark's own FilePartition
  sizing formula) — no physical planning, no job;
- the same chain over an in-memory leaf (``LocalRelation`` /
  ``LogicalRDD`` / ``Range`` — unit-test frames) → the old ``.rdd``
  probe, which is bounded-cheap there because the plan the guard just
  admitted contains no joins/aggregates/generates to compile;
- anything else (a join, an aggregate, a Generate, a union anywhere
  above the leaf) → ``ValueError``. The next operator that hands a
  derived frame to the helper fails loudly at build time instead of
  silently re-introducing the double-compile class
  (tests/test_parallelism.py pins this).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

# Unary nodes that neither change the scan's split count nor make the
# fallback .rdd probe expensive. Deliberately minimal: joins,
# aggregates, Generates, unions all fall through to the guard below.
# Limits are included: a limit-over-scan is strictly cheaper than the
# scan the walk would otherwise admit (test harnesses hand the blob
# generators docs.limit(n) frames).
_PASS_THROUGH = {
    "Project", "Filter", "SubqueryAlias", "GlobalLimit", "LocalLimit",
}

# In-memory leaves (unit-test frames): the .rdd probe on a
# Project/Filter chain over these is trivially cheap.
_INMEMORY_LEAVES = {"LocalRelation", "LogicalRDD", "Range", "OneRowRelation"}

# An explicit repartition in the input means the caller already set the
# partitioning deliberately (e.g. a test frame's .repartition(8), or an
# operator's own probe_in spread) — the helper must respect it rather
# than raise or stack a second exchange on top.
_EXPLICIT_REPARTITION = {"Repartition", "RepartitionByExpression"}


def _conf_bytes(spark, key: str, default: int) -> int:
    raw = spark.conf.get(key, str(default))
    try:
        return int(raw)
    except ValueError:
        # suffixed form ("128m"); JavaUtils is what Spark itself uses
        ju = spark.sparkContext._jvm.org.apache.spark.network.util.JavaUtils
        return int(ju.byteStringAsBytes(raw))


def _scan_split_estimate(df: DataFrame, relation) -> int:
    """Estimate the scan's split count from file-index metadata only,
    reproducing FilePartition's sizing formula: maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, bytesPerCore)); the
    packed partition count is then ~ total charged bytes / maxSplit.
    Uniform-file approximation of the bin packing — decision-grade for
    the `< defaultParallelism` test, not an exact replica."""
    spark = df.sparkSession
    sc = spark.sparkContext
    location = relation.location()
    total = location.sizeInBytes()
    n_files = len(location.inputFiles())
    if n_files == 0 or total <= 0:
        return 0
    max_pb = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024)
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 * 1024 * 1024)
    min_pn = int(
        spark.conf.get(
            "spark.sql.files.minPartitionNum", str(sc.defaultParallelism)
        )
    )
    charged = total + n_files * open_cost
    bytes_per_core = charged / max(1, min_pn)
    max_split = min(max_pb, max(open_cost, bytes_per_core))
    return max(1, math.ceil(charged / max_split))


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

    Accepts RAW SCANS ONLY (a Project/Filter chain over one file
    relation or an in-memory test frame) — see the module docstring;
    derived frames raise.
    """
    if df.isStreaming:
        # micro-batch inputs size themselves per trigger; .rdd is also
        # unsupported on a streaming frame — the helper is a no-op so
        # batch/stream-shared transforms can call it unconditionally
        return df
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    node = df._jdf.queryExecution().analyzed()
    while (
        node.getClass().getSimpleName() in _PASS_THROUGH
        and node.children().size() == 1
    ):
        node = node.children().apply(0)
    leaf = node.getClass().getSimpleName()
    if leaf in _EXPLICIT_REPARTITION:
        # The caller already chose a partitioning (test frames are
        # createDataFrame(...).repartition(8); operator call sites with
        # their own probe_in repartition). Respect it — no probe, no
        # job, no second exchange.
        return df
    if leaf == "LogicalRelation":
        if _scan_split_estimate(df, node.relation()) < n:
            return df.repartition(n)
        return df
    if leaf in _INMEMORY_LEAVES:
        if df.rdd.getNumPartitions() < n:
            return df.repartition(n)
        return df
    raise ValueError(
        "spread_for_arrow requires a raw scan (Project/Filter over one "
        f"file relation), got leaf node {leaf!r} — probing a derived "
        "frame would compile its physical plan twice (round-12 measured "
        "~7 s cold on corpus_pipeline); repartition explicitly at the "
        "call site instead"
    )
