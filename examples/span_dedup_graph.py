"""Round-6 surface demo: exact substring-span dedup + graph analytics.

The Lee-et-al exact-span pipeline (find duplicated spans, account
tokens keep-earliest, cut them) and the co-purchase graph family
(PageRank / triangles / k-core / weighted shortest paths) over the
shared test tables — every
step a lazy DataFrame plan, nothing unbounded on the driver.

Run: python examples/span_dedup_graph.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from distributed_computing_spark.caching import release_tracked
from distributed_computing_spark.operators.dedup import (
    duplicate_spans,
    span_dedup_apply,
    span_dedup_stats,
)
from distributed_computing_spark.operators.graph import (
    bellman_ford_hops,
    copurchase_edges,
    copurchase_edges_weighted,
    kcore,
    pagerank,
    triangle_counts,
)
from distributed_computing_spark.session import get_spark
from distributed_computing_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="span-dedup-graph", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    spans = duplicate_spans(docs, k=8)
    print("— longest duplicated spans (a, b, a_start, b_start, len):")
    spans.orderBy(F.desc("span_len"), "a", "b").show(5)

    stats = span_dedup_stats(docs, k=8)
    stats.agg(
        F.sum("dup_tokens").alias("dup_tokens_total"),
        F.sum("n_tokens").alias("tokens_total"),
    ).show()

    print("— keep-earliest cut (docs losing the most tokens):")
    span_dedup_apply(docs, k=8).orderBy(
        F.desc(F.col("n_tokens") - F.col("kept_tokens")), "doc_id"
    ).show(5)

    edges = copurchase_edges(load_table(spark, sf_dir, "lineitem"))
    print("— PageRank top parts:")
    pagerank(edges, n_iter=4).orderBy(F.desc("rank_score")).show(5)
    print("— triangle-dense parts:")
    triangle_counts(edges).orderBy(F.desc("n_triangles"), "node").show(5)
    core, rounds = kcore(edges, k=40)
    print(f"— 40-core: {core.count()} parts after {rounds} peel rounds")

    wedges = copurchase_edges_weighted(
        load_table(spark, sf_dir, "lineitem"), min_support=2
    )
    print("— nearest non-seed parts by weighted distance (Bellman-Ford, ≤4 hops):")
    bellman_ford_hops(wedges, n_seeds=5, max_rounds=4).where(
        F.col("d") > 0
    ).orderBy("d", "node").show(5)
    release_tracked()


if __name__ == "__main__":
    main()
