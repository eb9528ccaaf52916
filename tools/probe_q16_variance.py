"""Round-12 VERDICT item 3a: diagnose parts_supplier_count's 14-60 s
R400 band. Runs the query N times warm on the scaled replica at the
DEFAULT heap, recording per-run wall time, JVM GC delta, and the AQE
final plan's exchange row/partition shape; then measures the
dedup-first candidate re-plan the same way."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from distributed_computing_spark.session import get_spark
from distributed_computing_spark.sources.catalog import load_table


def gc_ms(spark):
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def run(df, spark, label, n=4):
    times = []
    for i in range(n):
        g0, t0 = gc_ms(spark), time.time()
        df.write.format("noop").mode("overwrite").save()
        dt, dg = time.time() - t0, gc_ms(spark) - g0
        times.append((round(dt, 2), dg))
        print(f"{label} run{i}: {dt:.2f}s gc={dg}ms", flush=True)
    return times


def main():
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scalecache/sf0.1_x400_or-li"
    spark = get_spark(cpus=32, shuffle_partitions=32)
    from distributed_computing_spark.registry import QUERIES

    # warm: full-column scans of both facts + a pandas_udf noop
    for t in ("lineitem", "part", "supplier"):
        load_table(spark, scaled, t).write.format("noop").mode("overwrite").save()

    cur = QUERIES["parts_supplier_count"](spark, scaled)
    t_cur = run(cur, spark, "current", n=4)

    # candidate: collapse lineitem to DISTINCT (partkey, suppkey) pairs
    # BEFORE the part join — the census question only needs the pair set
    li = load_table(spark, scaled, "lineitem")
    part = load_table(spark, scaled, "part")
    supp = load_table(spark, scaled, "supplier")
    bad = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = part.where(F.col("p_type") != "STANDARD").select("p_partkey", "p_type", "p_size")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    cand = (
        pairs.join(F.broadcast(p), pairs["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(bad), pairs["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_type", "p_size")
    )
    t_cand = run(cand, spark, "dedup_first", n=4)

    # value identity
    a = sorted(map(tuple, cur.collect()))
    b = sorted(map(tuple, cand.collect()))
    print("IDENTICAL:", a == b, len(a), flush=True)
    print(json.dumps({"current": t_cur, "dedup_first": t_cand}))


if __name__ == "__main__":
    main()
