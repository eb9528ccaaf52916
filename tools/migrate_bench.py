"""Shard-migration cost at a measured tier (round 5 — VERDICT r4 item 7).

The reference moves shards between replica groups with a per-shard pull
protocol (TransferShard RPC + state install, shardkv/server.go:237-319).
The Spark-first equivalent is ONE deterministic hash exchange: route the
state table under the new config (broadcast of the ~NSHARDS-row config,
never a shuffle of the data side) and repartition by the new owner —
task retries give exactly-once, and no driver loop ever touches a
shard. This harness times that move on a real state table (the 50×
lineitem tier ≈ 30 M rows) across a Join+Leave config change and
asserts the plan shape: exactly one Exchange hashpartitioning (the data
move itself), zero per-shard driver iterations.

Usage: python tools/migrate_bench.py [R]        (default R=50)
Prints one JSON line. Run solo — timings are load-sensitive.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from distributed_computing_spark.operators.sharding import (
        ShardMaster,
        migration_plan,
        route,
    )
    from distributed_computing_spark.plans import count_exchanges, operator_tree
    from distributed_computing_spark.session import get_spark
    from distributed_computing_spark.sources.catalog import load_table
    from tools.crossover import ensure_scaled

    spark = get_spark(app_name="migrate-bench")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = ensure_scaled(spark, "/root/testdata/sf0.1", R)

    # the state table: one row per lineitem, string key with uniform
    # first-byte distribution (key2shard routes on ascii(key[0]) % 10)
    li = load_table(spark, scaled, "lineitem")
    state = li.select(
        F.concat(
            F.pmod(F.col("l_orderkey"), 97).cast("string"),
            F.lit("-"),
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        ).alias("key"),
        F.concat_ws("|", "l_returnflag", "l_linestatus",
                    F.col("l_extendedprice").cast("string")).alias("value"),
    )
    n_rows = state.count()
    state.write.format("noop").mode("overwrite").save()  # warm page cache

    # config history: 3 groups -> (Join 103, Leave 101) in one step —
    # the reference's kvraft reconfiguration exercised as one change
    sm = ShardMaster()
    sm.join({100: ["a"], 101: ["b"], 102: ["c"]})
    old_cfg = sm.config_df(spark)
    sm.join({103: ["d"]})
    sm.leave([101])
    new_cfg = sm.config_df(spark)
    moves = migration_plan(old_cfg, new_cfg).collect()

    # the migration: route under the NEW config (broadcast join), then
    # the physical move — one hash exchange on the new owner gid
    migrated = route(state, new_cfg).repartition("gid")
    tree = operator_tree(migrated)
    n_exchange = count_exchanges(migrated)
    n_bcast = tree.count("BroadcastHashJoin") + tree.count("BroadcastNestedLoopJoin")

    t0 = time.time()
    migrated.write.format("noop").mode("overwrite").save()
    move_s = round(time.time() - t0, 2)

    # rows that actually changed owner (both routings in one pass:
    # two broadcast joins, no extra shuffle of the state side)
    o = old_cfg.select("shard", F.col("gid").alias("from_gid"))
    n = new_cfg.select("shard", F.col("gid").alias("to_gid"))
    from distributed_computing_spark.operators.sharding import key2shard

    both = (
        state.withColumn("shard", key2shard("key"))
        .join(F.broadcast(o), "shard")
        .join(F.broadcast(n), "shard")
    )
    moved_rows = both.where(F.col("from_gid") != F.col("to_gid")).count()

    out = {
        "metric": "shard_migration",
        "R": R,
        "state_rows": n_rows,
        "moved_shards": [(r["shard"], r["from_gid"], r["to_gid"]) for r in moves],
        "moved_rows": moved_rows,
        "moved_frac": round(moved_rows / n_rows, 4),
        "migrate_s": move_s,
        "rows_per_s": round(n_rows / move_s, 1),
        "plan": {
            "hash_exchanges": n_exchange,
            "broadcast_joins": n_bcast,
            "one_exchange_no_pershard_loop": n_exchange == 1,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
