"""Scale-smoke: replicate the test tables Rx in /tmp and compare
operator runtimes at 1x vs Rx — evidence the plans scale with data, not
with fixed overhead (the property the 100 TB posture rests on).

Replication remaps ids (doc_id/event_id/seq stay unique) and perturbs
document text per replica so dedup structures aren't degenerate.

Usage: python tools/scale_smoke.py [sf_dir] [R]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from distributed_computing_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_signatures,
)
from distributed_computing_spark.operators.kv import ops_from_events, replay  # noqa: E402
from distributed_computing_spark.functions.text import tokens  # noqa: E402
from distributed_computing_spark.session import get_spark  # noqa: E402
from distributed_computing_spark.sources.catalog import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    n_docs, n_ev = docs.count(), ev.count()

    reps = spark.range(R).select(F.col("id").alias("_r"))
    big_dir = tempfile.mkdtemp(prefix="dcs_scale_")
    (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * R + F.col("_r")).alias("doc_id"),
            F.concat("text", F.lit(" rep"), F.col("_r").cast("string")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{big_dir}/documents.parquet")
    )
    (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") * R + F.col("_r")).alias("event_id"),
            "ts",
            (F.col("user_id") * R + F.col("_r")).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{big_dir}/events.parquet")
    )

    def wc(d):
        return (
            d.select(F.explode(tokens("text")).alias("w")).groupBy("w").count().count()
        )

    # noop write forces full column materialization; .count() would let
    # Catalyst prune computed projections (minhash signatures!) and
    # measure only the scan.
    def force(df):
        df.write.format("noop").mode("overwrite").save()

    workloads = {
        "word_count": lambda dd, ee: wc(dd),
        "exact_dedup": lambda dd, ee: force(exact_dedup(dd)),
        "minhash_signatures": lambda dd, ee: force(minhash_signatures(dd)),
        "kv_replay": lambda dd, ee: force(replay(ops_from_events(ee))),
        "hourly_rollup": lambda dd, ee: ee.groupBy(
            F.date_trunc("hour", "ts"), "event_type"
        ).count().count(),
    }

    big_docs = spark.read.parquet(f"{big_dir}/documents.parquet")
    big_ev = load_table(spark, big_dir, "events")
    # warm both datasets + JVM/Python
    wc(docs.limit(10)); big_docs.count(); big_ev.count()

    print(f"# scale smoke: {sf_dir} (docs={n_docs}, events={n_ev}) vs {R}x replica")
    print(f"{'workload':<20} {'1x (s)':>8} {f'{R}x (s)':>8} {'ratio':>6}  (linear == {R}.0)")
    for name, fn in workloads.items():
        t0 = time.time(); fn(docs, ev); t1 = time.time() - t0
        t0 = time.time(); fn(big_docs, big_ev); t2 = time.time() - t0
        print(f"{name:<20} {t1:>8.2f} {t2:>8.2f} {t2 / max(t1, 1e-9):>6.1f}")


if __name__ == "__main__":
    main()
