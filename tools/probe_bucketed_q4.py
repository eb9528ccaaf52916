"""Round-13 VERDICT item 5: bucketed co-partitioned layout experiment
for the Q4/Q12 family at R400.

late_shipment_priority's below-gate plan broadcasts the half-year
orders window — it has NO fact-fact exchange to remove, so bucketing
cannot help it (recorded analysis, not measured). The experiment
therefore targets late_lines_priority_mix, whose lateness predicate
couples columns from both facts and carries the one irreducible
fact-fact exchange: write orders+lineitem bucketed by orderkey
(same bucket count) into a temp warehouse, run the identical join
logic on the bucketed tables, verify the exchange disappears from the
plan, and compare warm times on the same session.

Usage: python tools/probe_bucketed_q4.py [sf_dir] [R] [buckets]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_computing_spark.caching import release_tracked, session_tmpdir
from distributed_computing_spark.session import get_spark


def main() -> None:
    from pyspark.sql import functions as F

    from distributed_computing_spark.plans.inspect import count_exchanges, operator_tree
    from distributed_computing_spark.registry import QUERIES
    from distributed_computing_spark.sources.catalog import load_table
    from tools.crossover import ensure_scaled

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    wh = session_tmpdir(prefix="dcs_bucketwh_")
    spark = get_spark(
        app_name="probe_bucketed_q4",
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    spark.sparkContext.setLogLevel("ERROR")
    scaled = ensure_scaled(spark, sf_dir, R, facts=("orders", "lineitem"))

    li = load_table(spark, scaled, "lineitem")
    o = load_table(spark, scaled, "orders")
    for t in (li, o):
        t.write.format("noop").mode("overwrite").save()  # warm IO

    def timed(tag, fn, n=2):
        out = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{tag} run{i}")
            t0 = time.time()
            fn()
            out.append(round(time.time() - t0, 2))
            release_tracked()
        print(f"{tag}: {out}", flush=True)
        return out

    # 1. baseline: the registry query on the parquet replica
    timed(
        "late_lines parquet",
        lambda: QUERIES["late_lines_priority_mix"](spark, scaled)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # 2. the layout investment: bucketed copies by orderkey
    t0 = time.time()
    (
        li.write.bucketBy(n_buckets, "l_orderkey")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable("li_b")
    )
    (
        o.write.bucketBy(n_buckets, "o_orderkey")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable("o_b")
    )
    print(f"bucketed write ({n_buckets} buckets): {time.time()-t0:.1f}s", flush=True)

    # 3. identical Q12 logic on the bucketed tables
    def q12_bucketed():
        lib = spark.table("li_b")
        ob = spark.table("o_b")
        hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        j = (
            lib.where(F.col("l_shipdate") > F.lit("1996-01-31 00:00:00"))
            .select("l_orderkey", "l_returnflag", "l_shipdate")
            .join(
                ob.where(
                    (F.col("o_orderdate") >= F.lit("1996-01-01"))
                    & (F.col("o_orderdate") < F.lit("1997-01-01"))
                )
                .select("o_orderkey", "o_orderdate", "o_orderpriority")
                .hint("shuffle_hash"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .where(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            )
        )
        return (
            j.groupBy("l_returnflag")
            .agg(
                F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
                F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_line_count"),
            )
            .orderBy("l_returnflag")
        )

    dfb = q12_bucketed()
    tree = operator_tree(dfb)
    print(
        "bucketed plan: hash exchanges =",
        count_exchanges(dfb, "hashpartitioning"),
        "| SortMergeJoin" if "SortMergeJoin" in tree else "| ShuffledHashJoin"
        if "ShuffledHashJoin" in tree else "| other join",
        flush=True,
    )
    timed(
        "late_lines bucketed",
        lambda: q12_bucketed().write.format("noop").mode("overwrite").save(),
        n=3,
    )

    # answer identity
    a = QUERIES["late_lines_priority_mix"](spark, scaled).collect()
    b = q12_bucketed().collect()
    print("rows equal:", a == b, a, flush=True)


if __name__ == "__main__":
    main()
