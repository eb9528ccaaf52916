"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full operator registry
(distributed_computing_spark/registry.py) for the driver's
DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributed_computing_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the training-data curation pipeline end-to-end on
    sf0.001 — exact dedup → quality scoring → deterministic train/test
    split → per-(lang, split) corpus stats. One lazy plan; every stage
    is an operator the registry also exposes individually."""
    from pyspark.sql import functions as F

    from distributed_computing_spark.functions.text import quality_score
    from distributed_computing_spark.operators.dedup import exact_dedup_keep
    from distributed_computing_spark.operators.textstats import train_test_split
    from distributed_computing_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    curated = train_test_split(exact_dedup_keep(docs)).withColumn(
        "quality", quality_score("text")
    )
    return (
        curated.where(F.col("quality") >= 0.3)
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang", "split")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
