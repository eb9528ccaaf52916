"""Kafka ops-log source behind an availability gate.

The reference's KV surface is a continuously arriving ops stream
(shardkv/server.go:368-385 — the server polls for committed ops and
applies them in order). In Spark terms that stream is a Kafka topic:
each record's value is one JSON-encoded op ``{seq, client_id, req_id,
op, key, value}``; partitions preserve per-producer order, and the
micro-batch apply (kv_stream.foreach_batch_apply) provides the
serialized, exactly-once apply loop.

The Kafka connector jar (spark-sql-kafka-0-10) is not in this
container, so the source is gated on classpath availability:

- ``kafka_available(spark)`` — True iff KafkaSourceProvider is loadable.
- ``read_ops_stream`` — unified entry: Kafka when asked-for AND
  available, bounded file source otherwise. Both produce the identical
  OPS_SCHEMA stream, so everything downstream (KVTableStore,
  stateful_fold_stream, stream_dedup_ops) is source-agnostic.
- ``parse_kafka_ops`` — the value-decode transform, split out so its
  semantics are testable WITHOUT the connector: any DataFrame with
  Kafka's wire columns (value binary, partition, offset, ...) decodes
  the same way, batch or streaming.

At 100 TB: Kafka partitions map 1:1 to Spark input partitions — size
the topic's partition count to the executor count; the JSON decode is
a JVM-side ``from_json`` (no Python), and malformed records land in a
``_corrupt`` column instead of killing the stream.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_spark.streaming.kv_stream import OPS_SCHEMA


def kafka_available(spark: SparkSession) -> bool:
    """True iff the spark-sql-kafka connector is on this session's
    classpath, so ``format("kafka")`` will actually resolve."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def parse_kafka_ops(kafka_df: DataFrame) -> DataFrame:
    """Decode Kafka wire rows into the ops schema.

    Input needs Kafka's shape: ``value`` (binary JSON op), plus
    ``partition``/``offset`` for provenance. Output is OPS_SCHEMA plus
    ``_corrupt`` (the raw value when JSON decode failed — route to a
    dead-letter sink rather than crashing a 1000-executor stream).
    JVM-side only: cast + from_json, no Python workers.
    """
    decoded = kafka_df.select(
        F.col("value").cast("string").alias("_raw"),
        F.from_json(F.col("value").cast("string"), OPS_SCHEMA).alias("_op"),
    )
    return decoded.select(
        "_op.seq",
        "_op.client_id",
        "_op.req_id",
        "_op.op",
        "_op.key",
        "_op.value",
        # from_json yields an all-null struct on bad input; seq is
        # non-null in every well-formed op, so use it as the sentinel.
        F.when(F.col("_op.seq").isNull(), F.col("_raw")).alias("_corrupt"),
    )


def read_ops_stream(
    spark: SparkSession,
    files_path: Optional[str] = None,
    kafka_bootstrap: Optional[str] = None,
    kafka_topic: str = "kv-ops",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """The ops stream, source-agnostic.

    Kafka when ``kafka_bootstrap`` is given and the connector is
    present; otherwise the bounded parquet file source at
    ``files_path`` (the in-container gate path). Both return a
    streaming DataFrame in OPS_SCHEMA (+ ``_corrupt`` on the Kafka
    path, already-dropped for well-formed file data).
    """
    if kafka_bootstrap is not None:
        if not kafka_available(spark):
            raise RuntimeError(
                "Kafka source requested but spark-sql-kafka-0-10 is not "
                "on the classpath; pass files_path for the bounded "
                "file-source fallback"
            )
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", kafka_bootstrap)
            .option("subscribe", kafka_topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
        return parse_kafka_ops(raw).where(F.col("_corrupt").isNull()).drop("_corrupt")
    if files_path is None:
        raise ValueError("need files_path when no kafka_bootstrap is given")
    return spark.readStream.schema(OPS_SCHEMA).parquet(files_path)
