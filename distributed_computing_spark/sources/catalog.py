"""Table catalog over the driver-generated parquet test data.

Mirrors the reference's sources/sinks surface (SURVEY.md §2.1):
- S1/S2 whole-file text scan + per-file splits → ``read_text_corpus``
- parquet star schema (the engine's native columnar format; the
  reference's JSON shuffle files are Spark-internal shuffle now)

Column pruning + predicate pushdown reach the parquet scan because all
downstream operators are lazy DataFrame transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # events.parquet has shipped with ts as TIMESTAMP(NANOS) (which
        # Spark's reader rejects outright) and as TIMESTAMP(MICROS,
        # isAdjustedToUTC=false) (which Spark reads as TIMESTAMP_NTZ —
        # un-castable to long under ANSI). Normalize both to the
        # session-UTC instant type TIMESTAMP so every downstream
        # epoch-seconds expression (`cast(ts as long)`) works and
        # matches the DuckDB oracles' `epoch_us(ts) // 1000000`.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(path)
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":  # nanos read as long → truncate
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif ts_type == "timestamp_ntz":
                # NTZ → instant, interpreted in the session tz (UTC):
                # identical wall-clock values, castable to epoch seconds.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` works too."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """S1: text files → (doc, line) rows, one doc id per source file.

    Reference reads each whole file into one map task
    (mapreduce/common_map.go:50-56). Spark's split-per-file/block is
    strictly more scalable; ``input_file_name`` preserves the doc id.
    """
    return spark.read.text(path).select(
        F.input_file_name().alias("doc"), F.col("value").alias("line")
    )


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, str] | None = None,
    table_name: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Durable columnar sink (S3/S5 analog, parquet).

    ``partition_by``: hive-style directory partitioning — downstream
    filters on these columns prune at the SCAN (PartitionFilters), the
    coarse-grained analog of the reference's per-reduce-task output
    files (common.go:36-43), but query-addressable.
    ``bucket_by=(n, col)``: pre-shuffled layout so later joins/aggs on
    ``col`` skip their exchange entirely (requires ``table_name`` —
    bucketing metadata lives in the catalog, saveAsTable).
    """
    if bucket_by is not None:
        if table_name is None:
            raise ValueError("bucketed writes need table_name (catalog metadata)")
        n, col = bucket_by
        w = df.write.mode(mode).option("path", path).bucketBy(n, col).sortBy(col)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.format("parquet").saveAsTable(table_name)
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_merged_text(df: DataFrame, path: str, key: str = "key", value: str = "value") -> None:
    """S6: merged, key-sorted ``"k: v"`` text sink.

    Reference merges all reduce outputs single-threaded on the driver
    (mapreduce/master_splitmerge.go:14-51) — exactly what we must not do
    at 100 TB. ``orderBy`` gives a global range-partitioned sort; the
    single output file is only for golden-parity tests (coalesce(1) is
    opt-in by small output size, not a driver collect).
    """
    (
        df.orderBy(key)
        .select(F.concat_ws(": ", F.col(key).cast("string"), F.col(value).cast("string")).alias("line"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
