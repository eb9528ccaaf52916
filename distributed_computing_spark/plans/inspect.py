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
    """Number of LIVE shuffle exchanges of the given partitioning in
    the plan — the per-query shuffle budget, assertable in tests.

    Round-5 fixes, both load-bearing:
    - Under AQE the formatted TREE prints bare ``Exchange`` and the
      partitioning only appears in the detail section as
      ``Arguments: hashpartitioning(...)`` — a plain
      ``"Exchange <kind>"`` substring matches nothing, so zero-shuffle
      assertions pass trivially.
    - A materialized ``persist`` prints its ENTIRE build plan (Final +
      Initial) under ``InMemoryRelation`` — those exchanges already ran
      at cache time and must not count against the consumer.

    Semantics: count each shuffle the query's full computation performs
    ONCE — a cache build's exchanges count once (they run at
    materialization), and the duplicate ``== Initial Plan ==`` dump of
    an executed/cached AdaptiveSparkPlan is skipped (same plan, fresh
    node ids). Walk the tree, collect ``Exchange (N)`` node ids outside
    any ``== Initial Plan ==`` subtree (indentation-scoped), then match
    each id's ``(N) Exchange`` detail block against the requested
    partitioning. ``BroadcastExchange``/``ReusedExchange`` never match
    (no word boundary).
    """
    import re

    plan = physical_plan(df)
    tree = plan.split("\n\n")[0]
    detail = plan[len(tree) :]

    # indent = column of the first payload char; '=' is NOT stripped so
    # a "+- == Initial Plan ==" marker's indent equals its children's
    # (they align under the '==')
    def _indent(line: str) -> int:
        return len(line) - len(line.lstrip(" :+|-"))

    def _collect(lines: list[str], seen_caches: set[str]) -> list[str]:
        ids: list[str] = []
        i = 0
        while i < len(lines):
            line, ind = lines[i], _indent(lines[i])
            if "== Initial Plan ==" in line:
                i += 1
                while i < len(lines) and _indent(lines[i]) >= ind:
                    i += 1
                continue
            if "InMemoryRelation" in line:
                j = i + 1
                sub = []
                while j < len(lines) and _indent(lines[j]) > ind:
                    sub.append(lines[j])
                    j += 1
                # one cache referenced from two consumers prints its
                # build plan twice with fresh expr-ids and at different
                # nesting depths — dedupe by the digit- and
                # indent-normalized subtree so the build counts ONCE
                key = re.sub(
                    r"\d+", "", "\n".join(s.lstrip(" :+|-") for s in sub)
                )
                if key not in seen_caches:
                    seen_caches.add(key)
                    ids += _collect(sub, seen_caches)
                i = j
                continue
            ids += re.findall(r"\bExchange \((\d+)\)", line)
            i += 1
        return ids

    live_ids = _collect(tree.split("\n"), set())

    if not live_ids:
        # non-numbered fallback (simple-mode strings)
        return tree.count(f"Exchange {kind}")
    n = 0
    for nid in live_ids:
        block = detail.split(f"({nid}) Exchange", 1)
        if len(block) == 2 and kind in block[1].split("\n\n")[0]:
            n += 1
    return n


# columns that uniquely identify an SF-scaling table's parquet relation
# in an analyzed-plan string (region/nation are fixed-size and exempt;
# part/supplier broadcasts are audited as dimension attachments, per the
# VERDICT r10 item-1 table list)
SCALING_TABLE_MARKERS = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

_REDUCING_NODES = ("Aggregate [", "Deduplicate ", "GlobalLimit ")


def ungated_broadcast_tables(df: DataFrame) -> set[str]:
    """SF-scaling tables reached by a FORCED broadcast with no
    cardinality-reducing node on the path (round 11 — the repo-wide
    defense for the VERDICT r10 item-1 class: an unconditional
    ``F.broadcast`` of a fact-fraction side is a billions-of-rows
    broadcast at 100×).

    Reads the ANALYZED logical plan, where ``ResolvedHint
    (strategy=broadcast)`` marks exactly the user's ``F.broadcast`` /
    ``hint`` sites — never the planner's own size-estimated picks
    (which would make every join at tiny SF a false positive). For
    each hint subtree, each scaling-table ``Relation`` leaf is traced
    up to the hint: if an Aggregate / Deduplicate / GlobalLimit sits
    on that path, the broadcast side is bounded by group cardinality
    (the broadcast-of-aggregate pattern — its residual risk is the
    group key's cardinality, which the per-operator docstrings audit);
    otherwise the table is reported. Callers compare the result
    against an allowlist of GATED call sites."""
    lines = df._jdf.queryExecution().analyzed().toString().split("\n")

    def indent(line: str) -> int:
        return len(line) - len(line.lstrip(" :+|-"))

    flagged: set[str] = set()
    for i, line in enumerate(lines):
        if "ResolvedHint (strategy=broadcast" not in line:
            continue
        ind = indent(line)
        j = i + 1
        sub: list[str] = []
        while j < len(lines) and indent(lines[j]) > ind:
            sub.append(lines[j])
            j += 1
        for k, sl in enumerate(sub):
            if "Relation [" not in sl:
                continue
            hit = {
                t
                for t, m in SCALING_TABLE_MARKERS.items()
                if m in sl.split("Relation", 1)[1]
            }
            if not hit:
                continue
            # walk the leaf's ancestor chain inside the hint subtree
            reduced = False
            cur = indent(sub[k])
            for p in range(k - 1, -1, -1):
                if indent(sub[p]) < cur:
                    cur = indent(sub[p])
                    if any(r in sub[p] for r in _REDUCING_NODES):
                        reduced = True
                        break
            if not reduced:
                flagged |= hit
    return flagged


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan received a pushed filter containing
    ``fragment`` (e.g. "LessThanOrEqual(l_shipdate")."""
    plan = physical_plan(df)
    return "PushedFilters" in plan and fragment in plan


def has_partition_filters(df: DataFrame, column: str) -> bool:
    """True if the scan prunes hive partitions on ``column``."""
    plan = physical_plan(df)
    return "PartitionFilters" in plan and column in plan
