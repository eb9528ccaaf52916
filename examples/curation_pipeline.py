"""End-to-end training-data curation over the shared test tables.

What a reference user's "wc/ii + dedup scripts" become on this engine:
one lazy DataFrame program — dedup tiers, quality/language filtering,
tokenization, ANN near-dup sweep, train/test split — all Catalyst-
planned, nothing collected to the driver until the final small shows.

Run: python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from distributed_computing_spark.functions.text import quality_score
from distributed_computing_spark.operators.dedup import (
    exact_dedup_keep,
    minhash_lsh_pairs,
    neardup_clusters,
)
from distributed_computing_spark.operators.similarity import cosine_topk_gemm
from distributed_computing_spark.operators.textstats import train_test_split
from distributed_computing_spark.session import get_spark
from distributed_computing_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation-example", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    print(f"corpus: {docs.count()} docs")

    # 1. exact dedup (cheapest tier first)
    unique = exact_dedup_keep(docs)
    print(f"after exact dedup: {unique.count()}")

    # 2. near-dup tier: MinHash-LSH pairs → connected components →
    # keep exactly one canonical doc (the min id) per duplicate cluster
    pairs = minhash_lsh_pairs(unique, threshold=0.5)
    clusters = neardup_clusters(unique, pairs)
    canonical = clusters.where(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    curated = unique.join(canonical, "doc_id", "left_semi")
    print(f"after near-dedup: {curated.count()}")

    # 3. quality + language gate
    scored = curated.withColumn("quality", quality_score("text"))
    kept = scored.where((F.col("quality") >= 0.3) & (F.col("lang") != "und"))
    print(f"after quality/lang gate: {kept.count()}")

    # 4. deterministic split + summary
    final = train_test_split(kept, test_frac=0.1)
    final.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    ).orderBy("lang", "split").show()

    # 5. embedding ANN sanity: nearest neighbors of a few vectors
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3)
    cosine_topk_gemm(emb, q, k=3).show()


if __name__ == "__main__":
    main()
