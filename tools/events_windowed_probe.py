"""events_windowed last-lever probe (round 5 — VERDICT r4 item 8).

The query's persistent ~9× vs DuckDB at the 20× tier is engine
overhead at small absolutes (bare scan 0.51 s of the 1.5 s total). The
one untried lever: a fused mapInPandas pre-aggregation emitting
(window, type, user, partial-count, partial-sum) tuples — the shape
that won word_count/repetition_scores/chunk_docs 10–40×. Here the
per-row work is numeric (date_trunc + two aggregates), exactly what
JVM whole-stage codegen is BEST at, so the prior is that Arrow
transfer + pandas groupby LOSES — this harness measures it so the
docstring can record adopt-or-dead-end with a number.

Usage: python tools/events_windowed_probe.py [R]   (default 20)
Prints one JSON line; run solo.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def fused_events_windowed(spark, sf_dir: str):
    """Candidate plan: pandas per-batch pre-agg → JVM merge."""
    from distributed_computing_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "user_id", "value"
    )

    def pre(batches):
        for pdf in batches:
            g = (
                pdf.assign(window_start=pdf["ts"].dt.floor("h"))
                .groupby(
                    ["window_start", "event_type", "user_id"],
                    as_index=False,
                    sort=False,
                )
                .agg(_c=("value", "size"), _s=("value", "sum"))
            )
            yield g[["window_start", "event_type", "user_id", "_c", "_s"]]

    pre_df = ev.mapInPandas(
        pre,
        schema="window_start timestamp, event_type string, user_id long, "
        "_c long, _s double",
    )
    mid = pre_df.groupBy("window_start", "event_type", "user_id").agg(
        F.sum("_c").alias("_c"), F.sum("_s").alias("_s")
    )
    return mid.groupBy("window_start", "event_type").agg(
        F.sum("_c").alias("n_events"),
        F.round(F.sum("_s"), 4).alias("sum_value"),
        F.count("*").alias("n_users"),
    )


def main() -> None:
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from distributed_computing_spark.registry import QUERIES
    from distributed_computing_spark.session import get_spark
    from distributed_computing_spark.sources.catalog import load_table
    from tools.crossover import ensure_scaled

    spark = get_spark(app_name="ew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = ensure_scaled(spark, "/root/testdata/sf0.1", R)

    ev = load_table(spark, scaled, "events")
    ev.write.format("noop").mode("overwrite").save()  # warm cache

    @F.pandas_udf("double")
    def _warm(v):
        return v * 1.0

    spark.range(10000).repartition(64).select(
        _warm(F.col("id").cast("double"))
    ).count()

    def t(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # interleave 3 rounds so host drift hits both variants equally
    cur, fus = [], []
    for _ in range(3):
        cur.append(t(QUERIES["events_windowed"](spark, scaled)))
        fus.append(t(fused_events_windowed(spark, scaled)))

    # value parity: identical rows after sorting (same oracle contract)
    a = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"], r["n_users"])
        for r in QUERIES["events_windowed"](spark, scaled).collect()
    }
    b = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"], r["n_users"])
        for r in fused_events_windowed(spark, scaled).collect()
    }
    print(
        json.dumps(
            {
                "metric": "events_windowed_fused_probe",
                "R": R,
                "current_s": cur,
                "fused_s": fus,
                "current_best": min(cur),
                "fused_best": min(fus),
                "fused_over_current": round(min(fus) / min(cur), 3),
                "values_match": a == b,
                "n_groups": len(a),
            }
        )
    )


if __name__ == "__main__":
    main()
