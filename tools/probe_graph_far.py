"""Round-13 far-tier graph cells (VERDICT r12 items 2c and 3).

The standard crossover replica remaps only l_orderkey, so the
co-purchase graph's DISTINCT edge set is R-invariant — every recorded
triangle/pagerank cell so far measured a constant-size graph, the
triangle fast-path gate (oriented edges <= 5 M) never flipped, and
pagerank's "dispatch-bound floor" claim was never tested against a
graph that actually grows. The `pklineitem` replica (crossover.py)
remaps l_partkey too, yielding R disconnected copies of the sf graph:

    sf0.1 graph: 20 000 nodes, 1.196 M oriented edges, 41 M wedges
    pk R4:  4.78 M oriented edges  -> below the 5 M gate (fast path)
    pk R8:  9.57 M oriented edges  -> ABOVE the gate (wedge fallback)

Usage: python tools/probe_graph_far.py [sf_dir] [R ...]
Each tier prints: edge-build + oe.count() gate cost, whole-query
triangles time (twice, warm), pagerank 1-round and 8-round times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_computing_spark.caching import release_tracked
from distributed_computing_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from distributed_computing_spark.operators import graph
    from distributed_computing_spark.sources.catalog import load_table
    from tools.crossover import ensure_scaled

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tiers = [int(x) for x in sys.argv[2:]] or [4, 8]
    spark = get_spark(app_name="probe_graph_far")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for R in tiers:
        scaled = ensure_scaled(spark, sf_dir, R, facts=("pklineitem",))
        li = load_table(spark, scaled, "lineitem")
        noop(li)  # warm page cache
        rec: dict = {}

        # gate decomposition: edge build + persist + the oe.count()
        # the gate pays (it also warms the cache every consumer reads)
        spark.sparkContext.setJobDescription(f"R{R}: edge build + gate count")
        t0 = time.time()
        edges = graph.track_persist(graph.copurchase_edges(li))
        und = edges.where(F.col("src") < F.col("dst"))
        rec["oriented_edges"] = und.count()
        rec["gate_count_s"] = round(time.time() - t0, 2)
        release_tracked()

        # whole query, twice (second run is the warm number)
        for i in range(2):
            spark.sparkContext.setJobDescription(f"R{R}: triangles run{i}")
            t0 = time.time()
            noop(graph.copurchase_triangles(spark, scaled))
            rec[f"triangles_s_{i}"] = round(time.time() - t0, 2)
            release_tracked()

        # pagerank: 1 round vs 8 rounds isolates the per-round cost
        for n_it in (1, 8):
            spark.sparkContext.setJobDescription(f"R{R}: pagerank {n_it}r")
            t0 = time.time()
            noop(graph.pagerank_parts(spark, scaled, n_iter=n_it))
            rec[f"pagerank_{n_it}r_s"] = round(time.time() - t0, 2)
            release_tracked()
        spark.sparkContext.setJobDescription(None)
        out[f"R{R}"] = rec
        print(json.dumps({f"R{R}": rec}), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
