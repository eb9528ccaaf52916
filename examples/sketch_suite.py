"""Sketch-suite demo: the four mergeable summaries and what each buys.

HLL registers   -> distinct cardinality      (merge = elementwise max)
CMS registers   -> frequency / heavy hitters (merge = elementwise +)
Bloom bitset    -> membership / join pruning (merge = bitwise OR)
KMV min-hashes  -> distinct + SET OPERATIONS (merge = k-min of union)

Every sketch's STATE is an integer table the correctness gate checks
exactly against DuckDB (hll_user_registers / cms_word_counts /
bloom_semi_orders / kmv_user_sketches); only the final float estimates
run client-side, on sketch-sized data. At 100 TB each sketch is built
with one partial-aggregated exchange whose size is bounded by the
sketch, not the data.

Run: python examples/sketch_suite.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from distributed_computing_spark.operators.analytics import (
    bloom_bitset,
    bloom_membership,
    cms_point_estimate,
    cms_register_sketch,
    hll_estimate,
    hll_register_sketch,
    kmv_estimate,
    kmv_jaccard,
    kmv_sketch,
)
from distributed_computing_spark.session import get_spark
from distributed_computing_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="sketch-suite", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    # --- HLL: how many distinct users? -------------------------------
    regs = {
        r["register"]: r["max_rank"]
        for r in hll_register_sketch(ev, "user_id", m=64).collect()
    }
    exact_users = ev.select("user_id").distinct().count()
    print(f"HLL  distinct users:   est {hll_estimate(regs):8.1f}"
          f"   exact {exact_users}")

    # --- CMS: how often does a token occur? --------------------------
    from distributed_computing_spark.functions.text import tokens

    words = docs.select(F.explode(tokens("text")).alias("word"))
    cms = {
        (r["sketch_row"], r["register"]): r["cnt"]
        for r in cms_register_sketch(words, "word").collect()
    }
    top = words.groupBy("word").count().orderBy(F.desc("count")).first()
    print(f"CMS  count({top['word']!r}):   est {cms_point_estimate(cms, top['word'])}"
          f"   exact {top['count']}  (one-sided: est >= exact)")

    # --- Bloom: prune a probe side before any shuffle ----------------
    urgent = ev.where(F.col("event_type") == "purchase").select("user_id")
    bits = bloom_bitset(urgent, "user_id")
    n_all = ev.select("user_id").distinct().count()
    n_kept = (
        ev.select("user_id").distinct()
        .where(bloom_membership("user_id", bits))
        .count()
    )
    n_true = urgent.distinct().count()
    print(f"Bloom prune: {n_all} users -> {n_kept} candidates "
          f"({n_true} true members; false positives verified away by "
          f"the exact join)")

    # --- KMV: Jaccard between two behaviors (HLL can't do this) ------
    km = kmv_sketch(ev, "event_type", "user_id", k=64)
    sk = {}
    for r in km.collect():
        sk.setdefault(r["event_type"], []).append(r["hval"])
    a, b = "view", "purchase"
    est_j = kmv_jaccard(sk[a], sk[b], k=64)
    ua = {r["user_id"] for r in ev.where(F.col("event_type") == a)
          .select("user_id").distinct().collect()}
    ub = {r["user_id"] for r in ev.where(F.col("event_type") == b)
          .select("user_id").distinct().collect()}
    exact_j = len(ua & ub) / max(len(ua | ub), 1)
    print(f"KMV  J({a},{b}):   est {est_j:.3f}   exact {exact_j:.3f}; "
          f"|{a}| est {kmv_estimate(sk[a]):.1f} exact {len(ua)}")

    spark.stop()


if __name__ == "__main__":
    main()
