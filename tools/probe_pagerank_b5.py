"""Round-13 pagerank probe B5: per-round = ONE Arrow map stage over the
persisted edge cache with the node-state dict closure-shipped, node
sums collected to the driver (node-sized, same broadcast_nodes_max
gate), rank/contrib fold on the driver in exact nonneg int arithmetic.
Compares values against the current implementation and times both.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from distributed_computing_spark.caching import release_tracked, track_persist
from distributed_computing_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_ITER, SCALE, NUM, DEN, K = 8, 10**9, 85, 100, 100


def b5(spark, sf_dir):
    import pandas as pd

    from distributed_computing_spark.operators.graph import copurchase_edges
    from distributed_computing_spark.sources.catalog import load_table

    edges = track_persist(copurchase_edges(load_table(spark, sf_dir, "lineitem")))
    deg_rows = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .collect()
    )
    outdeg = {r.node: r.outdeg for r in deg_rows}
    teleport = (SCALE * (DEN - NUM)) // DEN
    c = {n: SCALE // d for n, d in outdeg.items()}  # c_1 off r_0 = scale
    c_in = None
    for _t in range(N_ITER):
        cc = c

        def sum_pass(batches):
            from collections import Counter

            acc = Counter()
            for b in batches:
                src = b["src"].to_numpy()
                dst = b["dst"].to_numpy()
                get = cc.get
                for i in range(len(src)):
                    acc[dst[i]] += get(src[i], 0)
            yield pd.DataFrame(
                {
                    "node": pd.Series(list(acc.keys()), dtype="int64"),
                    "c_in": pd.Series(list(acc.values()), dtype="int64"),
                }
            )

        rows = edges.mapInPandas(sum_pass, "node long, c_in long").collect()
        c_in = {}
        for r in rows:
            c_in[r.node] = c_in.get(r.node, 0) + r.c_in
        c = {
            n: (teleport + (NUM * c_in.get(n, 0)) // DEN) // d
            for n, d in outdeg.items()
        }
    ranks = [
        (n, outdeg[n], teleport + (NUM * c_in.get(n, 0)) // DEN)
        for n in outdeg
    ]
    out = spark.createDataFrame(ranks, "p_partkey long, n_neighbors long, rank_score long")
    return (
        out.orderBy(F.col("rank_score").desc(), F.col("p_partkey").asc())
        .limit(K)
    )


def main() -> None:
    spark = get_spark(app_name="probe-pagerank-b5")
    spark.sparkContext.setLogLevel("ERROR")
    from distributed_computing_spark.registry import QUERIES
    from distributed_computing_spark.sources.catalog import load_table

    load_table(spark, SF_DIR, "lineitem").write.format("noop").mode("overwrite").save()

    @F.pandas_udf("double")
    def _warm(v):
        return v * 1.0

    spark.range(10000).repartition(64).select(_warm(F.col("id").cast("double"))).count()

    def t_old():
        t0 = time.time()
        QUERIES["pagerank_parts"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        release_tracked()
        return round(time.time() - t0, 2)

    def t_new():
        t0 = time.time()
        b5(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        release_tracked()
        return round(time.time() - t0, 2)

    # value identity first
    old_rows = QUERIES["pagerank_parts"](spark, SF_DIR).collect()
    release_tracked()
    new_rows = b5(spark, SF_DIR).collect()
    release_tracked()
    same = [tuple(r) for r in old_rows] == [tuple(r) for r in new_rows]
    print(f"values identical: {same} ({len(old_rows)} rows)", flush=True)
    if not same:
        for a, b in zip(old_rows, new_rows):
            if tuple(a) != tuple(b):
                print("  first diff:", tuple(a), "vs", tuple(b))
                break
        return
    for rep in range(3):
        print(f"rep{rep}: old={t_old()}s new={t_new()}s", flush=True)


if __name__ == "__main__":
    main()
