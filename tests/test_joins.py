"""As-of and range join semantics on hand-built data (ties, bounds,
missing matches) — the oracle gate covers corpus-level parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_computing_spark.operators.joins import asof_join, range_join_count

TRADES = "user_id long, ts timestamp, event_id long"
QUOTES = "user_id long, ts timestamp, event_id long"


def _ts(s: str):
    from datetime import datetime

    return datetime.fromisoformat(f"2024-01-01 {s}")


def test_asof_backward_inner_semantics(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("10:00:00"), 100),  # quote at 09:59 matches
            (1, _ts("10:05:00"), 101),  # later quote 10:05 exact-tie matches (<=)
            (2, _ts("10:00:00"), 102),  # no quote for user 2 -> dropped (inner)
            (3, _ts("09:00:00"), 103),  # quote only AFTER trade -> dropped
        ],
        TRADES,
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("09:59:00"), 7),
            (1, _ts("10:05:00"), 8),
            (3, _ts("09:30:00"), 9),
        ],
        QUOTES,
    )
    out = {
        r["event_id"]: r["event_id_r"]
        for r in asof_join(trades, quotes, on="user_id", right_cols=("event_id",)).collect()
    }
    assert out == {100: 7, 101: 8}


def test_asof_picks_latest_not_any(spark):
    trades = spark.createDataFrame([(1, _ts("12:00:00"), 1)], TRADES)
    quotes = spark.createDataFrame(
        [(1, _ts("09:00:00"), 10), (1, _ts("11:00:00"), 11), (1, _ts("11:30:00"), 12)],
        QUOTES,
    )
    [r] = asof_join(trades, quotes, on="user_id", right_cols=("event_id",)).collect()
    assert r["event_id_r"] == 12


def test_range_join_count_bounds_and_zeros(spark):
    purchases = spark.createDataFrame(
        [(1, _ts("12:00:00"), 1), (2, _ts("12:00:00"), 2)], TRADES
    )
    views = spark.createDataFrame(
        [
            (1, _ts("11:00:00"), 20),  # exactly 1h before -> EXCLUDED (strict >)
            (1, _ts("11:00:01"), 21),  # inside
            (1, _ts("12:00:00"), 22),  # at the purchase -> included (<=)
            (1, _ts("12:00:01"), 23),  # after -> excluded
        ],
        QUOTES,
    )
    out = {
        r["event_id"]: r["n_in_range"]
        for r in range_join_count(purchases, views, on="user_id", span=3600).collect()
    }
    assert out == {1: 2, 2: 0}


def test_range_join_count_span_exceeds_bucket(spark):
    # span = 4h, bucket = 1h -> each left row must explode into 5 buckets;
    # the pre-fix plan only looked 1 bucket back and undercounted.
    purchases = spark.createDataFrame([(1, _ts("12:00:00"), 1)], TRADES)
    views = spark.createDataFrame(
        [
            (1, _ts("08:00:00"), 30),  # exactly 4h before -> EXCLUDED (strict >)
            (1, _ts("08:00:01"), 31),  # inside, 4 buckets back
            (1, _ts("09:30:00"), 32),  # inside, 3 buckets back
            (1, _ts("11:59:59"), 33),  # inside, same bucket
            (1, _ts("12:00:01"), 34),  # after -> excluded
        ],
        QUOTES,
    )
    [r] = range_join_count(
        purchases, views, on="user_id", span=4 * 3600, bucket="1 hour"
    ).collect()
    assert r["n_in_range"] == 3


def test_range_join_count_bucket_exceeds_span(spark):
    # bucket wider than span still needs 2 buckets (window can straddle).
    purchases = spark.createDataFrame([(1, _ts("12:00:30"), 1)], TRADES)
    views = spark.createDataFrame(
        [
            (1, _ts("11:59:45"), 40),  # inside, previous hour-bucket
            (1, _ts("12:00:10"), 41),  # inside, same bucket
        ],
        QUOTES,
    )
    [r] = range_join_count(
        purchases, views, on="user_id", span=60, bucket="1 hour"
    ).collect()
    assert r["n_in_range"] == 2


def test_salted_join_matches_plain_join_and_spreads_hot_key(spark):
    from distributed_computing_spark.operators.joins import salted_join

    # one pathologically hot key (900 of 1000 rows) + a cold tail
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 7).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("rowid"),
    )
    right = spark.createDataFrame(
        [(7, "hot"), (950, "cold")], "k long, tag string"
    )
    got = salted_join(left, right, "k", ["k", "rowid"], n_salt=8).collect()
    want = left.join(right, "k").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    # the hot key's rows really carry > 1 distinct salt value
    salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64("k", "rowid"), F.lit(8)).cast("int")
    )
    n_salts = (
        salted.where(F.col("k") == 7).select("_salt").distinct().count()
    )
    assert n_salts == 8


def test_salted_join_exchange_partitions_on_salt(spark):
    from distributed_computing_spark.plans import physical_plan
    from distributed_computing_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    plan = physical_plan(QUERIES["salted_revenue_join"](spark, SF_DIR))
    # the join exchange must hash on (key, salt), not key alone
    assert "ShuffledHashJoin" in plan
    assert "hashpartitioning(okey" in plan and "_salt" in plan
    assert "BroadcastHashJoin" not in plan
