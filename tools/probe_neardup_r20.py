"""Round-13 item 6: where do the neardup R20 seconds actually go?

Runs ngram_jaccard_pairs / minhash_neardup on the cached R20 replica
with the UI enabled, then dumps per-stage metrics (shuffle read/write
bytes, spill, executor time) from the REST API so the shuffle-vs-agg
split is measured, not guessed.

Usage: python tools/probe_neardup_r20.py [sf_dir] [R] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_computing_spark.caching import release_tracked
from distributed_computing_spark.session import get_spark


def main() -> None:
    from distributed_computing_spark.registry import QUERIES
    from tools.crossover import ensure_scaled

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    names = sys.argv[3:] or ["ngram_jaccard_pairs", "minhash_neardup"]
    spark = get_spark(
        app_name="probe_neardup",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    scaled = ensure_scaled(spark, sf_dir, R)

    from distributed_computing_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, scaled, "documents")
    docs.write.format("noop").mode("overwrite").save()  # warm IO

    @F.pandas_udf("double")
    def _warm(v):
        return v * 1.0

    spark.range(10000).repartition(64).select(
        _warm(F.col("id").cast("double"))
    ).count()

    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
            f"http://localhost:4047/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    seen = set()
    for name in names:
        for s in stages():
            seen.add(s["stageId"])
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        QUERIES[name](spark, scaled).write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        release_tracked()
        rows = []
        for s in stages():
            if s["stageId"] in seen:
                continue
            rows.append(
                {
                    "stage": s["stageId"],
                    "name": s["name"].split("\n")[0][:70],
                    "tasks": s["numCompleteTasks"],
                    "exec_s": round(s["executorRunTime"] / 1000, 1),
                    "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                    "sh_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                    "sh_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                    "spill_mb": round(s["diskBytesSpilled"] / 1e6, 1),
                    "fetch_wait_s": round(
                        s.get("shuffleFetchWaitTime", 0) / 1000, 1
                    ),
                    "in_mb": round(s["inputBytes"] / 1e6, 1),
                    "out_rows": s.get("outputRecords", 0),
                }
            )
        rows.sort(key=lambda r: -r["exec_s"])
        print(f"\n=== {name}: wall {wall}s ===")
        for r in rows[:14]:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
