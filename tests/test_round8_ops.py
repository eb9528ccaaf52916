"""Round-8 operators: snapshot-diff CDC extraction, association rules,
packed-bitmap audience overlap, PMI collocations. The sf0.01 oracle
gate covers the registry queries end-to-end; these tests pin the
OPERATOR contracts on small synthetic inputs where the expected answer
is computable by hand (the _py_kmeans discipline)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_snapshot_diff_classifies_i_u_d_and_drops_unchanged(spark):
    from distributed_computing_spark.operators.analytics import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200), (3, 30, 300), (4, None, 400)],
        "k int, n int, v int",
    )
    new = spark.createDataFrame(
        [(2, 20, 200), (3, 31, 300), (4, None, 400), (5, 50, 500)],
        "k int, n int, v int",
    )
    got = {
        r["k"]: (r["op"], r["old_n"], r["new_n"], r["old_v"], r["new_v"])
        for r in snapshot_diff(old, new, ["k"], ["n", "v"]).collect()
    }
    # 1 deleted, 3 updated, 5 inserted; 2 unchanged drops; 4 has a NULL
    # measure on both sides — eqNullSafe must treat it as unchanged
    assert got == {
        1: ("D", 10, None, 100, None),
        3: ("U", 30, 31, 300, 300),
        5: ("I", None, 50, None, 500),
    }


def test_snapshot_diff_null_transition_is_update(spark):
    from distributed_computing_spark.operators.analytics import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k int, n int")
    new = spark.createDataFrame([(1, 7)], "k int, n int")
    rows = snapshot_diff(old, new, ["k"], ["n"]).collect()
    assert [(r["op"], r["old_n"], r["new_n"]) for r in rows] == [
        ("U", None, 7)
    ]


def test_audience_overlap_matches_naive_set_arithmetic(spark, sf_dir):
    """The packed-bitmap intersection equals exact COUNT(DISTINCT) set
    arithmetic computed the naive way on the same table."""
    from distributed_computing_spark.operators.analytics import (
        audience_overlap,
    )

    got = {
        (r["g_a"], r["g_b"]): (
            r["n_a"], r["n_b"], r["n_common"], r["n_union"],
            r["jaccard_ppm"],
        )
        for r in audience_overlap(spark, sf_dir).collect()
    }
    from distributed_computing_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    sets: dict[str, set] = {}
    for r in ev.select("event_type", "user_id").distinct().collect():
        sets.setdefault(r["event_type"], set()).add(r["user_id"])
    types = sorted(sets)
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            common = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if common == 0 and not (sets[a] and sets[b]):
                continue
            want[(a, b)] = (
                len(sets[a]), len(sets[b]), common, union,
                common * 10**6 // union,
            )
    # bitmap pairs only exist where the types share at least one word;
    # with sf0.001's dense user ids every pair shares words
    assert got == {k: v for k, v in want.items() if k in got}
    assert len(got) == len(want)


def test_sliding_audience_matches_naive_trailing_distinct(spark, sf_dir):
    """The bitmap-coverage sliding distinct equals the naive
    per-(type, end-day) trailing-7-day set union."""
    from distributed_computing_spark.operators.analytics import (
        sliding_audience,
    )
    from distributed_computing_spark.sources.catalog import load_table

    got = {
        (r["event_type"], r["day_end"]): r["n_users_7d"]
        for r in sliding_audience(spark, sf_dir, window_days=7).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    days: dict[tuple, set] = {}
    for r in ev.select(
        "event_type", F.expr("cast(ts as long) div 86400").alias("d"),
        "user_id",
    ).collect():
        days.setdefault((r["event_type"], r["d"]), set()).add(r["user_id"])
    md = max(d for _, d in days)
    # union of the trailing window's day sets, for every (type, end-day)
    # some window day of which has data
    want = {}
    keys = {(t, de) for (t, d) in days for de in range(d, min(d + 7, md + 1))}
    for (t, de) in keys:
        u: set = set()
        for k in range(de - 6, de + 1):
            u |= days.get((t, k), set())
        want[(t, de)] = len(u)
    assert got == want


def test_association_rules_confidence_and_lift_math(spark, tmp_path, sf_dir):
    """Hand-checkable baskets: rules' ppm keys equal exact integer
    division of the support counts."""
    import os
    import shutil

    from distributed_computing_spark.operators.analytics import (
        association_rules,
    )

    # baskets: {1,2} x3, {1,3} x1, {2,3} x1  -> pair (1,2) supp 3
    rows = []
    ok = 0
    for _ in range(3):
        rows += [(ok, 1), (ok, 2)]
        ok += 1
    rows += [(ok, 1), (ok, 3)]
    ok += 1
    rows += [(ok, 2), (ok, 3)]
    ok += 1
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    d = str(tmp_path / "sf")
    os.makedirs(d)
    li.write.parquet(os.path.join(d, "lineitem.parquet"))
    # association_rules loads via catalog: copy nothing else needed
    out = {
        (r["lhs"], r["rhs"]): (
            r["supp_ab"], r["supp_lhs"], r["supp_rhs"],
            r["conf_ppm"], r["lift_ppm"],
        )
        for r in association_rules(spark, d, min_count=3).collect()
    }
    # N=5 baskets; supp(1)=4, supp(2)=4, supp_ab=3
    assert out == {
        (1, 2): (3, 4, 4, 3 * 10**6 // 4, 3 * 5 * 10**6 // 16),
        (2, 1): (3, 4, 4, 3 * 10**6 // 4, 3 * 5 * 10**6 // 16),
    }


def test_snapshot_diff_apply_reconstructs_new_state(spark):
    """Algebraic completeness (hypothesis): for arbitrary old/new
    states, replaying the emitted I/U/D rows over the old state
    reconstructs the new state EXACTLY — no change lost, none
    fabricated. This is the property a CDC consumer depends on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from distributed_computing_spark.operators.analytics import snapshot_diff

    state = st.dictionaries(
        st.integers(0, 14),
        st.tuples(
            st.one_of(st.none(), st.integers(-5, 5)),
            st.integers(0, 3),
        ),
        max_size=10,
    )

    @settings(max_examples=12, deadline=None)
    @given(old=state, new=state)
    def check(old, new):
        o = spark.createDataFrame(
            [(k, a, b) for k, (a, b) in old.items()] or [(None, None, None)],
            "k int, n int, v int",
        ).where(F.col("k").isNotNull())
        n = spark.createDataFrame(
            [(k, a, b) for k, (a, b) in new.items()] or [(None, None, None)],
            "k int, n int, v int",
        ).where(F.col("k").isNotNull())
        rows = snapshot_diff(o, n, ["k"], ["n", "v"]).collect()
        replay = dict(old)
        for r in rows:
            if r["op"] == "D":
                assert r["k"] in replay
                del replay[r["k"]]
            else:
                if r["op"] == "U":
                    assert replay[r["k"]] == (r["old_n"], r["old_v"])
                else:
                    assert r["k"] not in replay
                replay[r["k"]] = (r["new_n"], r["new_v"])
        assert replay == new

    check()


def test_user_streaks_islands_math(spark, sf_dir):
    """Cross-check gaps-and-islands against a pure-Python fold over the
    same distinct-day sets."""
    from distributed_computing_spark.operators.analytics import user_streaks
    from distributed_computing_spark.sources.catalog import load_table

    got = {
        r["user_id"]: (
            r["n_active_days"], r["n_streaks"], r["longest_streak"]
        )
        for r in user_streaks(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    days: dict[int, set] = {}
    for r in ev.select(
        "user_id", F.expr("cast(ts as long) div 86400").alias("d")
    ).collect():
        days.setdefault(r["user_id"], set()).add(r["d"])
    for uid, ds in days.items():
        sd = sorted(ds)
        streaks, cur = [], 1
        for a, b in zip(sd, sd[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert got[uid] == (len(sd), len(streaks), max(streaks)), uid
    assert set(got) == set(days)


def test_event_trend_slopes_recovers_planted_line(spark, tmp_path):
    """A perfectly linear planted series must yield the exact slope in
    cents-per-million-seconds, for positive AND negative trends."""
    import os

    from distributed_computing_spark.operators.analytics import (
        event_trend_slopes,
    )

    rows = []
    t0 = 1_700_000_000
    for i in range(100):
        # quarter-valued series are binary-exact, so floor(value*100)
        # is the intended cents (3.03*100 would floor to 302 — the
        # quantization contract, not a bug); slopes: +75 / -50 c/s
        rows.append(("up", t0 + i, (300 + 3 * i) / 4.0))
        rows.append(("down", t0 + i, (1000 - 2 * i) / 4.0))
    df = spark.createDataFrame(rows, "event_type string, sec long, value double")
    ev = df.select(
        "event_type",
        F.timestamp_seconds("sec").alias("ts"),
        "value",
        F.lit(1).alias("event_id"),
        F.lit(1).alias("user_id"),
        F.lit("{}").alias("props"),
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    ev.write.parquet(os.path.join(d, "events.parquet"))
    got = {
        r["event_type"]: r["slope_ppm"]
        for r in event_trend_slopes(spark, d).collect()
    }
    assert got == {"up": 75 * 10**6, "down": -50 * 10**6}


def test_funnel_strict_matches_python_greedy_matcher(spark, sf_dir):
    """The stacked window-min chain equals a pure-Python greedy
    earliest-completion matcher over the same events."""
    from distributed_computing_spark.operators.analytics import funnel_strict
    from distributed_computing_spark.sources.catalog import load_table

    row = funnel_strict(spark, sf_dir, window_s=86400 * 7).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    by_user: dict[int, list] = {}
    for r in ev.select(
        "user_id", "event_type", F.col("ts").cast("long").alias("sec")
    ).collect():
        by_user.setdefault(r["user_id"], []).append(
            (r["sec"], r["event_type"])
        )
    n1 = n2 = n3 = nw = 0
    for evs in by_user.values():
        t1 = min((s for s, t in evs if t == "view"), default=None)
        if t1 is None:
            continue
        n1 += 1
        t2 = min(
            (s for s, t in evs if t == "click" and s > t1), default=None
        )
        if t2 is None:
            continue
        n2 += 1
        t3 = min(
            (s for s, t in evs if t == "purchase" and s > t2), default=None
        )
        if t3 is None:
            continue
        n3 += 1
        if t3 - t1 <= 86400 * 7:
            nw += 1
    assert (
        row["n_users"], row["n_step1"], row["n_step2"],
        row["n_step3"], row["n_within_window"],
    ) == (len(by_user), n1, n2, n3, nw)


def test_events_twap_matches_python_fold(spark, sf_dir):
    """TWAP sums equal a pure-Python fold over the type-sorted events
    (integer cents x holding seconds, truncating quotient)."""
    import math

    from distributed_computing_spark.registry import QUERIES
    from distributed_computing_spark.sources.catalog import load_table

    got = {
        r["event_type"]: (
            r["n_intervals"], r["span_s"], int(r["vt_sum"]),
            r["twap_cents"],
        )
        for r in QUERIES["events_twap"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    by_type: dict[str, list] = {}
    for r in ev.select(
        "event_type", "event_id", F.col("ts").cast("long").alias("sec"),
        "value",
    ).collect():
        by_type.setdefault(r["event_type"], []).append(
            (r["sec"], r["event_id"], math.floor(r["value"] * 100))
        )
    for t, rows in by_type.items():
        rows.sort()
        n = span = vt = 0
        for (s, _, v), (s2, _, _) in zip(rows, rows[1:]):
            n += 1
            span += s2 - s
            vt += v * (s2 - s)
        if n == 0:
            assert t not in got
            continue
        assert got[t] == (n, span, vt, vt // span), t
    assert set(got) == {t for t, rows in by_type.items() if len(rows) > 1}


def test_bigram_pmi_ranks_collocations_first(spark, sf_dir):
    """PMI's defining property on the gated output: the ranking key is
    exactly the integer-scaled independence ratio, recomputable from
    the emitted counts and corpus totals."""
    from distributed_computing_spark.operators.textstats import bigram_pmi
    from distributed_computing_spark.functions.text import TOKEN_SPLIT_RE
    from distributed_computing_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.col("text"), TOKEN_SPLIT_RE), lambda t: t != ""
    )
    n_tok = docs.select(F.explode(toks).alias("w")).count()
    n_bi = docs.select(
        (F.greatest(F.size(toks) - 1, F.lit(0))).alias("m")
    ).agg(F.sum("m")).collect()[0][0]
    rows = bigram_pmi(spark, sf_dir, min_count=2, k=10).collect()
    assert rows, "no bigrams above the support floor at this sf"
    ppm = [r["pmi_ppm"] for r in rows]
    assert ppm == sorted(ppm, reverse=True)
    for r in rows:
        expect = (
            r["n_xy"] * n_tok * n_tok * 10**6
            // (n_bi * r["n_x"] * r["n_y"])
        )
        assert r["pmi_ppm"] == expect
