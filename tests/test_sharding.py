"""Sharding tests — port of shardmaster/test_test.go invariants:
balance (max-min ≤ 1), no orphan shards, Query versioning, and the
shardkv migration no-loss/no-dup property."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_computing_spark.operators.sharding import (
    NSHARDS,
    ShardMaster,
    install_config,
    key2shard,
    migration_plan,
    owned,
    route,
)


def test_join_balances():
    sm = ShardMaster()
    sm.join({1: ["s1a", "s1b"]})
    assert sm.balance_spread() == 0
    sm.join({2: ["s2a"]})
    assert sm.balance_spread() <= 1
    sm.join({3: ["s3a"]})
    assert sm.balance_spread() <= 1
    counts = {}
    for g in sm.query().shards:
        counts[g] = counts.get(g, 0) + 1
    assert sum(counts.values()) == NSHARDS


def test_leave_rebalances():
    sm = ShardMaster()
    sm.join({1: ["a"], 2: ["b"], 3: ["c"]})
    sm.leave([2])
    cfg = sm.query()
    assert 2 not in cfg.shards
    assert sm.balance_spread() <= 1


def test_move_pins_shard():
    sm = ShardMaster()
    sm.join({1: ["a"], 2: ["b"]})
    sm.move(4, 2)
    assert sm.query().shards[4] == 2


def test_query_versioning():
    """P4/P5: configs are immutable history; Query(num) time-travels."""
    sm = ShardMaster()
    sm.join({1: ["a"]})
    v1 = sm.query().num
    sm.join({2: ["b"]})
    assert sm.query(v1).shards != sm.query(-1).shards or sm.query(v1).num != sm.query(-1).num
    assert sm.query(999).num == sm.query(-1).num  # out-of-range → latest
    assert sm.query(0).shards == tuple([0] * NSHARDS)


def test_no_orphan_shards_invariant():
    sm = ShardMaster()
    sm.join({1: ["a"], 2: ["b"], 3: ["c"], 4: ["d"]})
    sm.leave([1, 3])
    cfg = sm.query()
    for gid in cfg.shards:
        assert gid in cfg.groups


def test_routing_and_ownership(spark):
    sm = ShardMaster()
    sm.join({1: ["a"], 2: ["b"]})
    cfg = sm.config_df(spark)
    data = spark.createDataFrame([(str(i), f"v{i}") for i in range(50)], "key string, value string")
    routed = route(data, cfg)
    assert routed.count() == 50
    # every row got a live gid
    assert routed.where(~F.col("gid").isin(1, 2)).count() == 0
    # ownership filter partitions the data exactly
    n1 = owned(data, cfg, 1).count()
    n2 = owned(data, cfg, 2).count()
    assert n1 + n2 == 50


def test_migration_no_loss_no_dup(spark):
    """P6/P7: re-routing state under a new config loses/duplicates nothing."""
    sm = ShardMaster()
    sm.join({1: ["a"], 2: ["b"]})
    old_cfg = sm.query()
    old = sm.config_df(spark)
    data = spark.createDataFrame([(str(i), f"v{i}") for i in range(100)], "key string, value string")
    sm.join({3: ["c"]})
    new_cfg = sm.query()
    new = sm.config_df(spark)
    after = install_config(data, new)
    assert after.count() == data.count()
    assert after.select("key").distinct().count() == 100
    plan = migration_plan(old, new)
    moved = {r["shard"] for r in plan.collect()}
    changed = {s for s in range(NSHARDS) if old_cfg.shards[s] != new_cfg.shards[s]}
    assert moved == changed


def test_key2shard_first_byte(spark):
    df = spark.createDataFrame([("0",), ("5",), ("abc",)], "key string")
    got = {r["key"]: r["s"] for r in df.select("key", key2shard("key").alias("s")).collect()}
    assert got["0"] == ord("0") % 10
    assert got["5"] == ord("5") % 10
    assert got["abc"] == ord("a") % 10


def test_random_churn_invariants():
    """Port of shardkv/shardmaster concurrency tests (SURVEY §5 layer
    5): a random Join/Leave/Move sequence; after every reconfiguration
    the balance (max-min <= 1 across live groups, shardmaster/
    test_test.go:33-49) and no-orphan invariants hold, and the config
    history stays monotonic copy-on-write."""
    import random

    rng = random.Random(42)
    sm = ShardMaster()
    live: set[int] = set()
    for _ in range(200):
        op = rng.choice(["join", "leave", "move", "move"])
        if op == "join" or not live:
            gid = rng.randrange(100, 115)
            if gid not in live:
                sm.join({gid: [f"server-{gid}"]})
                live.add(gid)
                assert sm.balance_spread() <= 1
        elif op == "leave" and len(live) > 1:
            gid = rng.choice(sorted(live))
            sm.leave([gid])
            live.discard(gid)
            assert sm.balance_spread() <= 1
        elif op == "move" and live:
            # manual pin may break balance (reference semantics: Move
            # does not rebalance) but must never orphan a shard
            sm.move(rng.randrange(sm.nshards), rng.choice(sorted(live)))
        cfg = sm.query(-1)
        for g in cfg.shards:
            assert g == 0 or g in cfg.groups
    assert [c.num for c in sm.configs] == list(range(len(sm.configs)))
