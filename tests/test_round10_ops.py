"""Round-10 operator contracts: the ADVICE r9 hardening set —
null-safe Merkle repair, length-prefixed row hashing, the absolute
basket cap, benford's filter-not-throw degradation, and the gated
support broadcast in copurchase_cosine.
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F


def test_merkle_repair_catches_null_value_divergence(spark):
    """ADVICE r9 (medium): key present on BOTH replicas with value NULL
    on exactly one side is a real divergence — the old plain != compare
    evaluated to NULL and silently dropped it. Both directions must
    emit 'U'; a key NULL on BOTH sides is NOT a divergence."""
    from distributed_computing_spark.operators.kv import merkle_repair_keys

    rows_a = [("1", "x"), ("2", None), ("3", None), ("4", "same")]
    rows_b = [("1", None), ("2", "y"), ("3", None), ("4", "same")]
    a = spark.createDataFrame(rows_a, "key string, value string")
    b = spark.createDataFrame(rows_b, "key string, value string")
    got = {(r["key"], r["op"]) for r in merkle_repair_keys(a, b, 16).collect()}
    assert got == {("1", "U"), ("2", "U")}


def test_merkle_digest_distinguishes_null_from_empty_value(spark):
    """The old concat_ws('|', k, v) SKIPPED a NULL value, hashing
    (k, NULL) like a bare key; the length-prefixed repr gives NULL its
    own marker, so states differing only in NULL-vs-'' diverge."""
    from distributed_computing_spark.operators.kv import merkle_diff

    a = spark.createDataFrame([("k", None)], "key string, value string")
    b = spark.createDataFrame([("k", "")], "key string, value string")
    assert merkle_diff(a, b, n_buckets=4).count() == 1
    assert merkle_diff(a, a, n_buckets=4).count() == 0


def test_merkle_row_hash_is_delimiter_unambiguous(spark):
    """('a|b', 'c') and ('a', 'b|c') concatenated with a raw '|' are the
    same string; the length-prefixed repr keeps their ROW hashes apart.
    Compared at n_buckets=1 so only the digest (not the key-derived
    bucket) can separate them — counts are equal on both sides."""
    from distributed_computing_spark.operators.kv import merkle_diff

    a = spark.createDataFrame([("a|b", "c")], "key string, value string")
    b = spark.createDataFrame([("a", "b|c")], "key string, value string")
    diffs = merkle_diff(a, b, n_buckets=1).collect()
    assert len(diffs) == 1
    assert diffs[0]["n_a"] == diffs[0]["n_b"] == 1
    assert diffs[0]["digest_a"] != diffs[0]["digest_b"]


def test_basket_pair_counts_skips_mega_basket(spark):
    """ADVICE r9: the absolute max_basket companion cap — a degenerate
    mega-basket is SKIPPED (its C(k,2) fan-out never reaches the
    Python pair loop), normal baskets still count."""
    from distributed_computing_spark.operators.analytics import (
        basket_pair_counts,
    )

    rows = [(1, i) for i in range(50)] + [(2, 10), (2, 11), (3, 10), (3, 11)]
    items = spark.createDataFrame(rows, "l_orderkey long, item long")
    got = {
        (r["a"], r["b"]): r["n_orders"]
        for r in basket_pair_counts(
            items, min_count=1, max_basket=10
        ).collect()
    }
    # basket 1 (50 items) is over the cap and contributes nothing
    assert got == {(10, 11): 2}
    # without the cap binding, basket 1's pairs appear
    uncapped = basket_pair_counts(items, min_count=1, max_basket=100)
    assert uncapped.count() == 50 * 49 // 2  # (10,11) merges with basket 1's


def test_benford_filters_negative_amounts_instead_of_throwing(
    spark, tmp_path
):
    """ADVICE r9: a negative o_totalprice must degrade to filtering
    (the '-' leading char would throw under ANSI cast otherwise). The
    digit histogram over [19.99, -5.00, 29.99, 0.00] sees digits 1 and
    2 only."""
    from distributed_computing_spark.operators.analytics import benford_audit

    d = str(tmp_path / "sf")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 1, "O", 19.99, t0, "P"),
        (2, 1, "O", -5.00, t0, "P"),
        (3, 1, "O", 29.99, t0, "P"),
        (4, 1, "O", 0.00, t0, "P"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = {r["digit"]: r["n_orders"] for r in benford_audit(spark, d).collect()}
    assert out == {1: 1, 2: 1}


def test_copurchase_cosine_broadcast_gate_answer_identical(spark, sf_dir):
    """ADVICE r9: above max_broadcast_items the support re-attach falls
    back to a shuffle join — same answer, no broadcast of the support
    tables (the bigram_pmi max_broadcast_vocab rule)."""
    from distributed_computing_spark.operators.analytics import (
        copurchase_cosine,
    )
    from distributed_computing_spark.plans import executed_plan

    hinted = copurchase_cosine(spark, sf_dir, min_count=3)
    forced = copurchase_cosine(
        spark, sf_dir, min_count=3, max_broadcast_items=0
    )
    assert sorted(map(tuple, hinted.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, forced.collect()), key=lambda t: t[:2]
    )
    # the gated fallback really does drop the broadcast HINT — with
    # the size-based auto-broadcast off (at sf0.001 AQE would convert
    # the tiny support tables regardless), only the hinted plan keeps
    # broadcast joins
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        n_forced = executed_plan(
            copurchase_cosine(spark, sf_dir, 3, max_broadcast_items=0)
        ).count("BroadcastHashJoin")
        n_hinted = executed_plan(
            copurchase_cosine(spark, sf_dir, 3)
        ).count("BroadcastHashJoin")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert n_hinted > n_forced


def _brute_quantile(pairs, q_permille):
    """Lower weighted quantile reference: smallest v with
    1000*cumweight >= q_permille*W over (v, wt) pairs."""
    total = sum(w for _, w in pairs)
    cum = 0
    for v, w in sorted(pairs):
        cum += w
        if 1000 * cum >= q_permille * total:
            return v
    raise AssertionError("unreachable for q <= 1000")


def test_grouped_weighted_quantile_matches_bruteforce(spark):
    """VERDICT r9 item 3: the three-pass q-permille generalization is
    gate-only — pin it against a sorted-reference brute force on
    adversarial shapes: ties at the crossing, all-equal values, a
    two-value column (256 buckets mostly empty), weights > 1, a
    single-group input, and boundary q values (1, 500, 900, 990,
    1000)."""
    from distributed_computing_spark.operators.analytics import (
        grouped_weighted_quantile,
    )

    cases = {
        # (g) -> list of (v, wt)
        "ties": [(10, 3), (20, 3), (30, 3)],
        "allequal": [(7, 5)],
        "twoval": [(0, 7), (1_000_000, 3)],
        "skew": [(1, 1), (2, 1), (3, 1), (4, 1), (5, 96)],
        "single": [(42, 1)],
    }
    rows = [(g, v, w) for g, pairs in cases.items() for v, w in pairs]
    vw = spark.createDataFrame(rows, "g string, v long, wt long")
    for q in (1, 500, 900, 990, 1000):
        got = {
            r["g"]: (r["w_total"], r["q_v"])
            for r in grouped_weighted_quantile(vw, q).collect()
        }
        want = {
            g: (sum(w for _, w in pairs), _brute_quantile(pairs, q))
            for g, pairs in cases.items()
        }
        assert got == want, (q, got, want)


def test_order_price_quantiles_matches_bruteforce(spark, tmp_path):
    """End-to-end: planted orders with ties and a heavy tail — the
    gated query's P50/P90/P99 equal the sorted-reference quantiles per
    priority."""
    import datetime

    from distributed_computing_spark.caching import release_tracked
    from distributed_computing_spark.operators.analytics import (
        order_price_quantiles,
    )

    d = str(tmp_path / "sf")
    t0 = datetime.datetime(2024, 1, 1)
    prices = {
        "A": [1.00] * 10 + [2.00] * 85 + [99.99] * 5,
        "B": [0.01, 0.02, 0.03, 0.04],
    }
    rows = []
    i = 0
    for g, ps in prices.items():
        for p in ps:
            rows.append((i, 1, "O", p, t0, g))
            i += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    try:
        got = {
            r["priority"]: (
                r["n_orders"],
                r["p50_cents"],
                r["p90_cents"],
                r["p99_cents"],
            )
            for r in order_price_quantiles(spark, d).collect()
        }
    finally:
        release_tracked()
    for g, ps in prices.items():
        pairs = {}
        for p in ps:
            c = int(p * 100 + 0.5)
            pairs[c] = pairs.get(c, 0) + 1
        pl = sorted(pairs.items())
        want = (
            len(ps),
            _brute_quantile(pl, 500),
            _brute_quantile(pl, 900),
            _brute_quantile(pl, 990),
        )
        assert got[g] == want, (g, got[g], want)


def test_grouped_min_rank_adversarial_matches_window_rank(spark):
    """VERDICT r9 item 6: grouped_min_rank is exact for min-rank
    because ties never span buckets — prove it on the adversarial
    shapes: an all-equal column (every rank 1), a two-value column
    (256 buckets, two occupied), a degenerate single-group input, and
    negative values; reference = brute-force rank() window at small
    n."""
    from pyspark.sql import Window as W

    from distributed_computing_spark.operators.analytics import (
        grouped_min_rank,
    )

    cases = [
        [("g1", 5)] * 40,  # all-equal
        [("g1", 0)] * 20 + [("g1", 1_000_000)] * 20,  # two values
        [("solo", v) for v in (3, 1, 2, 2, 9, -7, -7)],  # single group, negatives
        [("a", v) for v in range(10)] + [("b", v % 3) for v in range(30)],
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "g string, v long")
        got = sorted(
            (r["g"], r["v"], r["rk"])
            for r in grouped_min_rank(df, "g", "v", "rk").collect()
        )
        want = sorted(
            (r["g"], r["v"], r["rk"])
            for r in df.withColumn(
                "rk", F.rank().over(W.partitionBy("g").orderBy("v"))
            ).collect()
        )
        assert got == want, rows[:3]
