"""P8: the shard-config poll loop as a stream-vs-latest-config join.

The reference's shardkv group leader polls the shardmaster every 100 ms
and applies new configs ONE AT A TIME, in order
(shardkv/server.go:368-385); ops arriving between reconfigurations
route by the config in effect at that moment.

Spark-first mapping (SURVEY.md §2.6 P8): the config history is a tiny
versioned table an external "master" appends to; the ops log is a
micro-batched stream. Each micro-batch POLLS the config location — a
fresh batch read inside ``foreachBatch``, i.e. the stream-static join
pattern with the static side re-resolved per trigger — and routes that
batch's ops by the LATEST installed version. Structured Streaming
serializes micro-batches, so configs are observed in install order (the
reference's apply-one-by-one contract), and every routed row records
which config version governed it.

Scale shape: the config is O(nshards) rows — always broadcast; the ops
stream is the only large side and is never shuffled for routing (the
shard column is a one-expression projection). At 100 TB the same loop
runs with a Kafka source and a Delta config table; only the source and
the poll read change.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_spark.operators.sharding import NSHARDS, key2shard

# logical config row; `num` is physically a partition directory (num=N)
CONFIG_SCHEMA = "num int, shard int, gid int"


class ConfigMaster:
    """The polled side of P8: a master that installs config versions
    into a directory, one file per version (append-only history, P5).

    ``install_next`` publishes version ``installed+1`` using
    ``assign``(num) -> gid Column over ``spark.range(nshards)``. The
    default evolution is arithmetic — v1 routes every shard to gid 100,
    v2 splits across two groups, v3 across three — so an external
    oracle can reproduce the assignment without reading our files.
    """

    def __init__(
        self,
        spark: SparkSession,
        cfg_dir: str,
        nshards: int = NSHARDS,
        max_version: int = 3,
        assign: Callable[[int], F.Column] | None = None,
    ) -> None:
        self.spark = spark
        self.cfg_dir = cfg_dir
        self.nshards = nshards
        self.max_version = max_version
        self._assign = assign or (
            # 100 + shard % min(num, 3): one group, then two, then three
            lambda num: (F.lit(100) + F.col("shard") % F.lit(min(num, 3))).cast(
                "int"
            )
        )

    @property
    def installed(self) -> int:
        """Highest version on disk — derived, never cached, so a master
        restarted mid-history (or re-entered after a foreachBatch task
        retry) resumes from durable state instead of re-counting."""
        if not os.path.isdir(self.cfg_dir):
            return 0
        nums = [
            int(d.split("=", 1)[1])
            for d in os.listdir(self.cfg_dir)
            if d.startswith("num=")
        ]
        return max(nums, default=0)

    def install_next(self) -> None:
        """Publish the next config version, if any remain. Each version
        lives in its own ``num=N`` partition directory written with
        overwrite, so a re-install of the same version (batch retry) is
        idempotent — no duplicate config rows for the poll to join."""
        num = self.installed + 1
        if num > self.max_version:
            return
        cfg = self.spark.range(self.nshards).select(
            F.col("id").cast("int").alias("shard")
        )
        cfg = cfg.withColumn("gid", self._assign(num))
        cfg.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.cfg_dir, f"num={num}")
        )


def poll_latest(spark: SparkSession, cfg_dir: str) -> DataFrame:
    """One poll: re-read the config history fresh and keep only the
    highest installed version (Query(-1), shardmaster/server.go).

    The history is tiny metadata (versions × nshards rows) laid out as
    ``num=N`` partition dirs — the version filter is partition pruning,
    not a data read — and the result is always broadcast into the
    routing join.
    """
    hist = spark.read.parquet(cfg_dir)  # partition column: num (int)
    latest = hist.agg(F.max("num").alias("num"))
    return hist.join(F.broadcast(latest), "num").select("num", "shard", "gid")


def route_batch(
    batch: DataFrame,
    batch_id: int,
    cfg_dir: str,
    out_dir: str,
    master: ConfigMaster | None = None,
    key: str = "key",
) -> None:
    """One P8 micro-batch, idempotent under foreachBatch retry.

    (a) Version to install derives from ``batch_id`` (install up to
    batch_id+1), NOT from installed+1 — a retried batch finds its
    version already on disk and re-installs nothing, so retries can't
    skew the batch→version mapping. (b) The sink is a batch_id-
    partitioned DYNAMIC overwrite: a retry rewrites only its own
    batch_id partition instead of append-duplicating rows.
    """
    if master is not None:
        target = min(batch_id + 1, master.max_version)
        while master.installed < target:
            master.install_next()
    spark = batch.sparkSession
    cfg = poll_latest(spark, cfg_dir)
    routed = (
        batch.withColumn("shard", key2shard(key))
        .join(F.broadcast(cfg), "shard")
        .select(
            F.col("num").alias("config_num"),
            "gid",
            F.col(key).alias("key"),
        )
    )
    (
        routed.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )


def route_stream_by_latest_config(
    stream: DataFrame,
    cfg_dir: str,
    out_dir: str,
    ckpt_dir: str,
    master: ConfigMaster | None = None,
    key: str = "key",
):
    """Run the P8 loop: per micro-batch, (optionally) let the master
    install its next config, poll the latest version, and route the
    batch's ops ``key -> shard -> gid``, writing ``(config_num, gid,
    key)`` rows to ``out_dir`` (exactly-once; see ``route_batch``).

    ``master`` is the test/replay hook — in production nothing installs
    from inside the loop; the poll simply observes whatever the real
    master has published since the last trigger.
    """

    def _apply(batch: DataFrame, batch_id: int) -> None:
        route_batch(batch, batch_id, cfg_dir, out_dir, master=master, key=key)

    os.makedirs(out_dir, exist_ok=True)
    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
