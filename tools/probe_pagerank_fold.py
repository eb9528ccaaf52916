"""Round-13 pagerank probe PR2 (VERDICT item 2b, measured form): fold
the rank/contrib projection INTO the per-round aggregate by carrying
dst's outdeg on the persisted edge table — per round, ONE broadcast
(contrib) and ONE exchange (node-sized agg), no deg-side join stage.
Nodes with no in-edges contribute a CONSTANT c = teleport div outdeg
from round 1 on; they ride a once-computed persisted table unioned
into each round's broadcast build (no exchange — union of two cached
scans).
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


def pr2(spark, sf_dir, n_iter=N_ITER):
    from distributed_computing_spark.operators.graph import copurchase_edges
    from distributed_computing_spark.sources.catalog import load_table

    edges = track_persist(copurchase_edges(load_table(spark, sf_dir, "lineitem")))
    deg = track_persist(
        edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("outdeg")
        )
    )
    n_nodes = deg.count()
    use_broadcast = n_nodes <= 5_000_000
    teleport = (SCALE * (DEN - NUM)) // DEN
    # edges + the receiving node's outdeg (edge-sized, persisted once)
    e2 = track_persist(
        edges.join(
            F.broadcast(deg.select(F.col("node").alias("dst"), F.col("outdeg").alias("dst_outdeg")))
            if use_broadcast
            else deg.select(F.col("node").alias("dst"), F.col("outdeg").alias("dst_outdeg")),
            "dst",
        )
    )
    # nodes with no in-edges: rank_t = teleport for every t >= 1, so
    # their contribution is the CONSTANT teleport div outdeg
    noin = track_persist(
        deg.join(
            edges.select(F.col("dst").alias("node")).distinct(),
            "node",
            "left_anti",
        ).select(
            F.col("node").alias("src"),
            F.expr(f"cast({teleport} as bigint) div outdeg").alias("c"),
        )
    )
    fold_c = F.expr(
        f"(cast({teleport} as bigint) + ({NUM} * c_in) div {DEN}) div dst_outdeg"
    )
    contrib = deg.select(
        F.col("node").alias("src"),
        F.expr(f"cast({SCALE} as bigint) div outdeg").alias("c"),
    )
    c_in = None
    for _t in range(n_iter):
        if use_broadcast:
            contrib = F.broadcast(contrib)
        c_in = e2.join(contrib, "src").groupBy(
            F.col("dst"), F.col("dst_outdeg")
        ).agg(F.sum("c").alias("c_in"))
        contrib = c_in.select(
            F.col("dst").alias("src"), fold_c.alias("c")
        ).unionAll(noin)
    # final ranks over the full node universe (deg), as today
    last = c_in.select(F.col("dst").alias("node"), "c_in")
    rank_expr = (
        F.lit(teleport)
        + F.expr(f"({NUM} * coalesce(c_in, 0L)) div {DEN}")
    ).cast("long")
    ranks = deg.join(
        F.broadcast(last) if use_broadcast else last, "node", "left"
    ).select("node", "outdeg", rank_expr.alias("rank"))
    return (
        ranks.orderBy(F.col("rank").desc(), F.col("node").asc())
        .select(
            F.col("node").alias("p_partkey"),
            F.col("outdeg").alias("n_neighbors"),
            F.col("rank").alias("rank_score"),
        )
        .limit(K)
    )


def main() -> None:
    spark = get_spark(app_name="probe-pr2")
    spark.sparkContext.setLogLevel("ERROR")
    from distributed_computing_spark.registry import QUERIES
    from distributed_computing_spark.sources.catalog import load_table

    load_table(spark, SF_DIR, "lineitem").write.format("noop").mode("overwrite").save()

    old_rows = QUERIES["pagerank_parts"](spark, SF_DIR).collect()
    release_tracked()
    new_rows = pr2(spark, SF_DIR).collect()
    release_tracked()
    same = [tuple(r) for r in old_rows] == [tuple(r) for r in new_rows]
    print(f"values identical: {same} ({len(old_rows)} rows)", flush=True)
    if not same:
        for a, b in zip(old_rows, new_rows):
            if tuple(a) != tuple(b):
                print("  first diff:", tuple(a), "vs", tuple(b))
        return

    def t_old():
        t0 = time.time()
        QUERIES["pagerank_parts"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        release_tracked()
        return round(time.time() - t0, 2)

    def t_new():
        t0 = time.time()
        pr2(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        release_tracked()
        return round(time.time() - t0, 2)

    for rep in range(4):
        print(f"rep{rep}: old={t_old()}s new={t_new()}s", flush=True)
    # AQE-off leg on the folded shape
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for rep in range(2):
        print(f"aqe-off rep{rep}: old={t_old()}s new={t_new()}s", flush=True)


if __name__ == "__main__":
    main()
