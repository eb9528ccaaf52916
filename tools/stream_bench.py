"""Streaming-ingest throughput tier (round 4 — VERDICT r3 item 5).

Drives `streaming/ingest.CorpusIngestStore` in curate mode over the
20× replica corpus in bounded micro-batches and records rows/sec +
per-batch latency, next to the equivalent single-batch (batch-mode)
pipeline over the same rows — the number that flags a state-store or
per-batch-overhead bottleneck before a real cluster does.

Usage: python tools/stream_bench.py [R] [n_batches] [near_dup]
Prints one JSON line. Run solo — timings are load-sensitive.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    near_dup = (sys.argv[3] if len(sys.argv) > 3 else "0") == "1"

    from distributed_computing_spark.session import get_spark
    from distributed_computing_spark.sources.catalog import load_table
    from distributed_computing_spark.streaming.ingest import CorpusIngestStore
    from tools.crossover import ensure_scaled

    spark = get_spark(app_name="stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = ensure_scaled(spark, "/root/testdata/sf0.1", R)

    work = tempfile.mkdtemp(prefix="stream_bench_")
    src = os.path.join(work, "src")
    docs = load_table(spark, scaled, "documents")
    n_rows = docs.count()
    # bounded micro-batches: hash-sliced so batch sizes are even and the
    # slicing itself is deterministic; one parquet file per batch with
    # pinned mtimes so the file source replays them in order.
    for i in range(n_batches):
        (
            docs.where(F.pmod(F.xxhash64("doc_id"), n_batches) == i)
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"b{i:03d}"))
        )
    files = []
    for i in range(n_batches):
        d = os.path.join(src, f"b{i:03d}")
        files.extend(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))
    for j, f in enumerate(sorted(files)):
        os.utime(f, (1_000_000 + j, 1_000_000 + j))

    # warm Arrow workers (same rationale as bench.py)
    @F.pandas_udf("double")
    def _warm(v):
        return v * 1.0

    spark.range(10000).repartition(64).select(_warm(F.col("id").cast("double"))).count()

    # ---- streaming mode: per-batch latency via a timed admit wrapper
    store = CorpusIngestStore(spark, os.path.join(work, "store_stream"))
    latencies: list[float] = []
    orig_admit = store.admit_batch

    def timed_admit(batch, **kw):
        t0 = time.time()
        orig_admit(batch, **kw)
        latencies.append(round(time.time() - t0, 3))

    store.admit_batch = timed_admit  # type: ignore[method-assign]
    schema = spark.read.parquet(os.path.join(src, "b000")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max(1, len(files) // n_batches)))
        .parquet(os.path.join(src, "b*"))
    )
    t0 = time.time()
    store.attach(
        stream, os.path.join(work, "ckpt"), curate=True, near_dup=near_dup
    ).awaitTermination()
    stream_s = round(time.time() - t0, 2)
    admitted_stream = store.corpus().count()

    # ---- batch mode: the same curation over all rows in ONE admit
    store_b = CorpusIngestStore(spark, os.path.join(work, "store_batch"))
    t0 = time.time()
    store_b.admit_batch(docs, batch_id=0, curate=True, near_dup=near_dup)
    batch_s = round(time.time() - t0, 2)
    admitted_batch = store_b.corpus().count()

    out = {
        "metric": "streaming_ingest_throughput",
        "R": R,
        "rows_in": n_rows,
        "n_batches": len(latencies),
        "near_dup": near_dup,
        "stream_total_s": stream_s,
        "stream_rows_per_s": round(n_rows / stream_s, 1),
        "batch_latency_s": {
            "min": min(latencies),
            "median": sorted(latencies)[len(latencies) // 2],
            "max": max(latencies),
            "all": latencies,
        },
        "admitted_stream": admitted_stream,
        "batch_total_s": batch_s,
        "batch_rows_per_s": round(n_rows / batch_s, 1),
        "admitted_batch": admitted_batch,
        "stream_over_batch": round(stream_s / batch_s, 3),
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
