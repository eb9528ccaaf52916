"""Physical-plan inspection utilities.

The reference has no optimizer to inspect (SURVEY.md §4.1 — fixed
map→shuffle→reduce dataflow); on Spark the plan IS the performance
contract, so the engine ships first-class helpers to read and assert on
it. tests/test_plans.py and tests/test_sinks.py use these to pin the
scale-critical properties (pushdown, pruning, broadcast-vs-sort-merge,
partial aggregation, exchange counts); tools/explain_all.py renders
PLANS.md from the same functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string Catalyst will execute (pre-runtime; AQE nodes
    unresolved). Modes: simple | extended | codegen | cost | formatted."""
    jmode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def operator_tree(df: DataFrame) -> str:
    """Just the operator tree of the formatted plan (the detail section
    repeats operator names, which breaks naive substring counting)."""
    return physical_plan(df).split("\n\n")[0]


def executed_plan(df: DataFrame) -> str:
    """The final adaptive plan AFTER execution — shows AQE's runtime
    decisions (coalesced partitions, skew=true splits, join switches).
    Only meaningful once THIS DataFrame's own QueryExecution has run
    (e.g. ``df.rdd.count()``; ``df.count()`` plans a separate query)."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame, kind: str = "hashpartitioning") -> int:
    """Number of shuffle exchanges of the given partitioning in the
    initial plan — the per-query shuffle budget, assertable in tests.

    Round-5 fix: under AQE the formatted TREE prints bare ``Exchange``
    and the partitioning only appears in the detail section as
    ``Arguments: hashpartitioning(...)`` — the old
    ``"Exchange <kind>"`` substring matched NOTHING there, so
    zero-shuffle assertions passed trivially. Count both spellings.
    """
    plan = physical_plan(df)
    return plan.count(f"Exchange {kind}") + plan.count(f"Arguments: {kind}")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan received a pushed filter containing
    ``fragment`` (e.g. "LessThanOrEqual(l_shipdate")."""
    plan = physical_plan(df)
    return "PushedFilters" in plan and fragment in plan


def has_partition_filters(df: DataFrame, column: str) -> bool:
    """True if the scan prunes hive partitions on ``column``."""
    plan = physical_plan(df)
    return "PartitionFilters" in plan and column in plan
