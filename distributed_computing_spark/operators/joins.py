"""Time-series joins Spark lacks as built-ins: as-of and bounded-range.

The reference has no joins at all (SURVEY.md §2.8); these are [EXT]
operators a complete analytics engine needs, built strictly from
composition of DataFrame primitives — no non-equi joins, no UDFs —
so Catalyst plans them as ordinary shuffles.

Scale design:
- as-of: the classic union + last(ignoreNulls) running-window. ONE
  shuffle on the join key; never a range self-join (which explodes
  quadratically on hot keys). Equivalent plans power point-in-time
  joins in production feature stores.
- range: bucketize both sides to equi-join keys (window span / bucket
  size = bounded explode factor), then filter the exact bound inside
  the bucket-local join. Shuffle volume = input × (span/bucket + 1),
  chosen by the caller — never |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gated_broadcast(
    dim: DataFrame, n_rows: int, max_rows: int = 10_000_000
) -> DataFrame:
    """Forced-broadcast of a join side ONLY under a caller-supplied row
    bound — the repo-wide rule (VERDICT r10 item 1): every
    ``F.broadcast`` whose child scans an SF-scaling table must carry a
    size gate, because a fixed FRACTION of a fact or dimension table is
    a billions-of-rows broadcast at 100×. ``n_rows`` should be a
    METADATA-ONLY upper bound: a parquet ``count()`` of the source
    table reads only footers and bounds any filtered projection of it
    at zero scan cost. Above the cap the side is returned with a
    shuffle-hash hint, so the join exchanges co-partitioned on the key
    (no sort legs) instead of collecting to every executor.
    tests/test_broadcast_gates.py sweeps every registry query's
    analyzed plan for broadcasts that bypass this rule."""
    return (
        F.broadcast(dim) if n_rows <= max_rows else dim.hint("shuffle_hash")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """For each left row, attach the LATEST right row with
    ``right_ts <= left_ts`` sharing the key ``on`` (backward as-of,
    DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` semantics; inner —
    left rows with no prior right row are dropped).

    Right-side payload arrives as struct fields ``<col>`` for each of
    ``right_cols`` plus ``_asof_ts`` (the matched right timestamp).
    Ties on ``right_ts`` within a key are resolved by the LAST row in
    (ts, *right_cols) sort order — pre-deduplicate the right side if
    ties must be impossible.
    """
    payload = F.struct(
        F.col(right_ts).alias("_asof_ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        payload.alias("_rpay"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(dict(r.dtypes)["_rpay"]).alias("_rpay"),
    )
    both = r.unionByName(l, allowMissingColumns=True)
    # right rows sort before left rows at equal ts => a quote AT the
    # trade's timestamp matches (<=, not <)
    w = (
        Window.partitionBy(on)
        .orderBy("_ats", "_side", "_rpay")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
    return (
        carried.where((F.col("_side") == 1) & F.col("_match").isNotNull())
        .drop("_ats", "_side", "_rpay")
        .select(
            *left.columns,
            F.col("_match._asof_ts").alias("_asof_ts"),
            *[F.col(f"_match.{c}").alias(f"{c}_r") for c in right_cols],
        )
    )


_BUCKET_UNITS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _bucket_seconds(bucket: str | int) -> int:
    if isinstance(bucket, str):
        qty, unit = bucket.split()
        return int(qty) * _BUCKET_UNITS[unit.rstrip("s")]
    return int(bucket)


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    span: int,
    bucket: str | int = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_id: str = "event_id",
) -> DataFrame:
    """Count right rows with ``right_ts ∈ (left_ts - span, left_ts]``
    per left row (left join — zero counts kept). ``span`` is the window
    length in seconds (a plan-time number, not a Column: the explode
    factor is derived from it).

    Bucketed equi-join: both sides get epoch-aligned time buckets; a
    left row explodes into the ⌈span/bucket⌉+1 consecutive buckets its
    window can touch, the join runs on (key, bucket), and the exact
    bound filters inside. Shuffle volume = |L|·(⌈span/bucket⌉+1) + |R|,
    never |L|×|R| — size ``bucket`` close to ``span`` to keep the
    explode factor small.
    """
    bucket_s = _bucket_seconds(bucket)
    span_s = int(span)
    if span_s <= 0:
        raise ValueError(f"span must be a positive number of seconds, got {span}")
    n_buckets = -(-span_s // bucket_s) + 1  # ceil + 1
    b = F.lit(bucket_s)
    lsec = F.col(left_ts).cast("long")
    rsec = F.col(right_ts).cast("long")
    base = F.floor(lsec / b).cast("long")
    lb = left.select(
        F.col(left_id).alias("_lid"),
        F.col(on),
        F.col(left_ts),
        lsec.alias("_lsec"),
        # consecutive buckets base-k are distinct by construction — no
        # dedup pass (and no extra exchange) needed
        F.explode(F.array(*[base - k for k in range(n_buckets)])).alias("_bucket"),
    )
    rb = right.select(
        F.col(on), rsec.alias("_rsec"), F.floor(rsec / b).cast("long").alias("_bucket")
    )
    hits = (
        lb.join(rb, [on, "_bucket"])
        .where((F.col("_rsec") <= F.col("_lsec")) & (F.col("_rsec") > F.col("_lsec") - span_s))
        .groupBy("_lid")
        .agg(F.count("*").alias("_n"))
    )
    return (
        left.select(F.col(left_id).alias("_lid"), on)
        .join(hits, "_lid", "left")
        .select(
            F.col("_lid").alias(left_id),
            on,
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_in_range"),
        )
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_by: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the result is EXACTLY ``left.join(
    right, key, how)`` — salting only changes how the work partitions.

    A hot join key at 100 TB puts its entire payload in ONE reducer
    task (the classic straggler). Here each left row gets a
    deterministic salt in [0, n_salt) — xxhash64 of caller-named
    columns, never rand(), so task retries recompute the identical
    salt — and the right side replicates n_salt ways, so the hot key's
    rows spread across n_salt tasks. Use when BOTH sides are too big to
    broadcast and a key is hot; AQE's skew-join split handles the
    sort-merge case, but salting also works for shuffled hash joins
    and for aggregations downstream of the join.
    """
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_by), F.lit(n_salt)).cast("int")
    )
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l.join(r, [key, "_salt"], how).drop("_salt")
