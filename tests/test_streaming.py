"""Structured Streaming tests: the ops log consumed as a stream must
reach the same state as batch replay (K5 streaming/batch parity), and
windowed aggs must equal their batch equivalents."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_computing_spark.operators.kv import replay
from distributed_computing_spark.streaming.kv_stream import (
    OPS_SCHEMA,
    KVTableStore,
    foreach_batch_apply,
    stateful_fold_stream,
)
from distributed_computing_spark.streaming.windows import (
    session_windows,
    sliding_rates,
    tumbling_counts,
)
from tests.test_kv import OPS_SCHEMA as OPS_DDL
from tests.test_kv import random_ops, serial_replay


def _write_ops_batches(spark, tmpdir: str, ops: list[tuple], n_batches: int = 3) -> str:
    """Write the ops log as n_batches parquet files (arrival batches
    follow log order, like committed raft log slices)."""
    src = os.path.join(tmpdir, "ops_src")
    per = (len(ops) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = ops[b * per : (b + 1) * per]
        if chunk:
            spark.createDataFrame(chunk, OPS_DDL).coalesce(1).write.mode(
                "append"
            ).parquet(src)
    return src


def test_foreach_batch_apply_matches_batch_replay(spark, tmp_path):
    ops = random_ops(11, n=300)
    src = _write_ops_batches(spark, str(tmp_path), ops)
    stream = spark.readStream.schema(OPS_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    store = KVTableStore(spark, str(tmp_path / "store"))
    q = foreach_batch_apply(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {r["key"]: r["value"] for r in store.state().collect() if r["value"] != ""}
    want = {k: v for k, v in serial_replay(ops).items() if v != ""}
    assert got == want


def test_foreach_batch_continuous_trigger_live_arrivals(spark, tmp_path):
    """The live (processingTime-trigger, unbounded) mode of the apply
    loop: ops files arrive WHILE the query runs — the reference's
    100 ms shardkv poll loop (shardkv/server.go:368-385) — and the
    final state equals serial batch replay. Closes the one streaming
    mode AvailableNow bounded replay never exercises."""
    import time

    ops = random_ops(47, n=120)
    per = 40
    src = str(tmp_path / "ops_src")
    # first slice exists before the query starts
    spark.createDataFrame(ops[:per], OPS_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(OPS_SCHEMA).parquet(src)
    store = KVTableStore(spark, str(tmp_path / "store"))
    q = foreach_batch_apply(
        stream,
        store,
        str(tmp_path / "ckpt"),
        trigger={"processingTime": "200 milliseconds"},
    )
    try:
        assert q.isActive
        # remaining slices land mid-flight
        for b in (1, 2):
            time.sleep(0.5)
            spark.createDataFrame(
                ops[b * per : (b + 1) * per], OPS_DDL
            ).coalesce(1).write.mode("append").parquet(src)
        want = {k: v for k, v in serial_replay(ops).items() if v != ""}
        deadline = time.time() + 90
        while time.time() < deadline:
            # concurrent polls may transiently fail mid parquet-swap
            # (single-writer backend has no reader isolation — the gap
            # the Delta MERGE backend closes); retry until stable.
            try:
                got = {
                    r["key"]: r["value"]
                    for r in store.state().collect()
                    if r["value"] != ""
                }
            except Exception:
                time.sleep(0.2)
                continue
            if got == want:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    # authoritative read after stop — no writer racing the scan
    got = {r["key"]: r["value"] for r in store.state().collect() if r["value"] != ""}
    assert got == want


def test_foreach_batch_is_incremental(spark, tmp_path):
    """New files after the first run are picked up from the checkpoint
    and applied exactly once (restart = reference's snapshot restore)."""
    ops = random_ops(5, n=200)
    first, second = ops[:120], ops[120:]
    src = str(tmp_path / "ops_src")
    spark.createDataFrame(first, OPS_DDL).coalesce(1).write.mode("append").parquet(src)
    store = KVTableStore(spark, str(tmp_path / "store"))
    stream = spark.readStream.schema(OPS_SCHEMA).parquet(src)
    foreach_batch_apply(stream, store, str(tmp_path / "ckpt")).awaitTermination(120)
    spark.createDataFrame(second, OPS_DDL).coalesce(1).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(OPS_SCHEMA).parquet(src)
    foreach_batch_apply(stream2, store, str(tmp_path / "ckpt")).awaitTermination(120)
    got = {r["key"]: r["value"] for r in store.state().collect() if r["value"] != ""}
    want = {k: v for k, v in serial_replay(ops).items() if v != ""}
    assert got == want


def test_stateful_fold_pipeline_matches_batch(spark, tmp_path):
    """dedup_stream (per-client K4) → intermediate sink → fold stream
    (per-key K2/K3) reaches exactly the serial-replay state."""
    from distributed_computing_spark.streaming.kv_stream import dedup_stream

    ops = random_ops(23, n=300)
    src = _write_ops_batches(spark, str(tmp_path), ops, n_batches=1)
    stream = spark.readStream.schema(OPS_SCHEMA).parquet(src)
    eff_dir = str(tmp_path / "effective")
    q1 = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", eff_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(120)
    eff_stream = spark.readStream.schema(OPS_SCHEMA).parquet(eff_dir)
    q2 = (
        stateful_fold_stream(eff_stream)
        .writeStream.format("memory")
        .queryName("kv_fold_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_fold"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.sql("SELECT * FROM kv_fold_out").collect()
    got = {}
    for r in rows:
        got[r["key"]] = r["value"]
    got = {k: v for k, v in got.items() if v != ""}
    want = {k: v for k, v in serial_replay(ops).items() if v != ""}
    assert got == want


def test_tumbling_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    # events.parquet has ns timestamps; load through the catalog (micros)
    from distributed_computing_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    want = {
        (r["ws"], r["event_type"]): (r["n"], round(r["sv"], 4))
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    # watermark with availableNow emits all windows; batch must agree
    # on every window the stream emitted
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_session_and_sliding_plans_build(spark, sf_dir):
    """Plan-level checks for the remaining window shapes (batch mode)."""
    from distributed_computing_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    assert session_windows(ev).count() > 0
    assert sliding_rates(ev).count() > 0


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics across RESTARTS: run 1 commits a watermark to
    the checkpoint; a beyond-watermark event arriving in run 2 is
    dropped — the closed window is never re-emitted or updated. This is
    the state-eviction contract that bounds streaming state at scale
    (K6 analog). (Within a single AvailableNow run the watermark only
    advances at the end, so the drop is observable only across runs.)"""
    import datetime as dt

    from distributed_computing_spark.streaming.windows import tumbling_counts

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "ts timestamp, event_type string, value double"
    src_dir = str(tmp_path / "late_src")
    out_dir = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    def run():
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        q = (
            tumbling_counts(stream, window="1 hour", watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1 = [(base + dt.timedelta(hours=h), "a", 1.0) for h in (0, 1, 2, 6)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src_dir)
    run()  # commits watermark 6h - 2h = 4h; emits closed windows 0,1,2

    late = [(base + dt.timedelta(hours=1, minutes=30), "a", 100.0)]
    spark.createDataFrame(late, schema).coalesce(1).write.mode("append").parquet(src_dir)
    run()  # resumes at watermark 4h -> the 1:30 event is beyond it

    rows = spark.read.parquet(out_dir).collect()
    hour1 = [r for r in rows if r["window_start"].hour == 1]
    # exactly one emission for the hour-1 window, and the late 100.0
    # never entered it
    assert [(r["n_events"], r["sum_value"]) for r in hour1] == [(1, 1.0)]


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming exactly-once ingestion (K4's streaming twin for raw
    event feeds): duplicate event_ids arriving within the watermark are
    dropped by dropDuplicatesWithinWatermark."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, value double"
    rows = [(i, base + dt.timedelta(minutes=i), float(i)) for i in range(100)]
    dups = rows + rows[:40]  # 40 redelivered events
    src = str(tmp_path / "dup_src")
    spark.createDataFrame(dups, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert len(got) == 100
    assert len({r["event_id"] for r in got}) == 100


def test_kafka_source_gate_and_decode(spark, tmp_path):
    """Kafka ops source (kafka_source.py): connector absent in this
    container -> gate False and a clear error; the value-decode
    transform itself is connector-independent, so verify it on a
    batch DataFrame shaped like Kafka's wire format — well-formed ops
    round-trip, malformed values land in _corrupt instead of crashing."""
    import json as _json

    import pytest as _pytest

    from distributed_computing_spark.streaming.kafka_source import (
        kafka_available,
        parse_kafka_ops,
        read_ops_stream,
    )

    assert not kafka_available(spark)
    with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_ops_stream(spark, kafka_bootstrap="broker:9092")

    ops = random_ops(7, n=50)
    wire = [
        (
            _json.dumps(
                dict(
                    zip(
                        ("seq", "client_id", "req_id", "op", "key", "value"), o
                    )
                )
            ).encode(),
            0,
            i,
        )
        for i, o in enumerate(ops)
    ] + [(b"not json", 0, len(ops)), (b'{"op": "get"}', 0, len(ops) + 1)]
    kafka_shaped = spark.createDataFrame(
        wire, "value binary, partition int, offset long"
    )
    decoded = parse_kafka_ops(kafka_shaped)
    good = decoded.where(F.col("_corrupt").isNull()).drop("_corrupt")
    got = sorted(tuple(r) for r in good.collect())
    assert got == sorted(ops)
    bad = decoded.where(F.col("_corrupt").isNotNull()).collect()
    assert {r["_corrupt"] for r in bad} == {"not json", '{"op": "get"}'}


def test_kafka_file_fallback_feeds_apply_loop(spark, tmp_path):
    """read_ops_stream's file fallback is the same OPS_SCHEMA stream:
    wiring it into KVTableStore reaches serial-replay state (the
    source-agnostic contract the Kafka path shares)."""
    from distributed_computing_spark.streaming.kafka_source import read_ops_stream

    ops = random_ops(31, n=200)
    src = _write_ops_batches(spark, str(tmp_path), ops, n_batches=2)
    stream = read_ops_stream(spark, files_path=src)
    store = KVTableStore(spark, str(tmp_path / "store"))
    foreach_batch_apply(stream, store, str(tmp_path / "ckpt")).awaitTermination(120)
    got = {r["key"]: r["value"] for r in store.state().collect() if r["value"] != ""}
    want = {k: v for k, v in serial_replay(ops).items() if v != ""}
    assert got == want


def test_config_poll_applies_versions_in_order(spark, tmp_path):
    """P8: each micro-batch routes by the latest config installed at
    poll time — versions are observed one-by-one, in install order
    (shardkv/server.go:368-385 parity), and gid follows the
    arithmetic evolution 100 + shard % min(num, 3)."""
    import glob
    import os
    import time

    from distributed_computing_spark.streaming.config_poll import (
        ConfigMaster,
        poll_latest,
        route_stream_by_latest_config,
    )

    # 3 single-file batches of keyed ops, mtimes pinned for replay order
    rows = [(i, f"k{i % 7}") for i in range(30)]
    src = str(tmp_path / "src")
    now = time.time()
    stamped: set[str] = set()
    for b in range(3):
        chunk = rows[b * 10 : (b + 1) * 10]
        spark.createDataFrame(chunk, "seq long, key string").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        # stamp only files NEW this iteration — re-stamping everything
        # would give all files the same final mtime and leave replay
        # order unpinned (micro-batch order = file mtime)
        for f in glob.glob(f"{src}/part-*"):
            if f not in stamped:
                os.utime(f, (now + b, now + b))
                stamped.add(f)
    stream = (
        spark.readStream.schema("seq long, key string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    cfg_dir, out_dir = str(tmp_path / "cfg"), str(tmp_path / "out")
    master = ConfigMaster(spark, cfg_dir, max_version=3)
    q = route_stream_by_latest_config(
        stream, cfg_dir, out_dir, str(tmp_path / "ckpt"), master=master
    )
    q.awaitTermination(120)

    routed = spark.read.parquet(out_dir).collect()
    assert len(routed) == 30
    for r in routed:
        shard = ord(r["key"][0]) % 10
        assert r["gid"] == 100 + shard % min(r["config_num"], 3)
    # exact batch→version mapping: batch b (10 rows) routed by config
    # b+1 — the oracle's seq-tertile contract, now actually pinned by
    # the per-file mtimes above
    from collections import Counter

    assert Counter(r["config_num"] for r in routed) == {1: 10, 2: 10, 3: 10}

    # poll_latest returns only the max installed version
    latest = poll_latest(spark, cfg_dir)
    nums = {r["num"] for r in latest.collect()}
    assert nums == {3}
    assert latest.count() == 10  # one row per shard


def test_config_poll_restart_resumes_from_checkpoint(spark, tmp_path):
    """P8 across a restart: a second AvailableNow run sharing the
    checkpoint replays only NEW ops batches (exactly-once routing), and
    a fresh ConfigMaster resumes version numbering from durable state
    (installed derives from the num=N dirs, not driver memory)."""
    import glob
    import os
    import time

    from distributed_computing_spark.streaming.config_poll import (
        ConfigMaster,
        route_stream_by_latest_config,
    )

    src = str(tmp_path / "src")
    cfg_dir, out_dir, ckpt = (
        str(tmp_path / "cfg"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    now = time.time()
    stamped: set[str] = set()

    def write_batch(b):
        rows = [(b * 10 + i, f"k{i % 7}") for i in range(10)]
        spark.createDataFrame(rows, "seq long, key string").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        # stamp only NEW files so earlier batches keep earlier mtimes
        for f in glob.glob(f"{src}/part-*"):
            if f not in stamped:
                os.utime(f, (now + b, now + b))
                stamped.add(f)

    def run():
        stream = (
            spark.readStream.schema("seq long, key string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        master = ConfigMaster(spark, cfg_dir, max_version=3)
        q = route_stream_by_latest_config(stream, cfg_dir, out_dir, ckpt, master=master)
        q.awaitTermination(120)

    write_batch(0)
    run()  # first run: only v1 installed, batch 0 routed by it
    first = spark.read.parquet(out_dir).collect()
    assert len(first) == 10 and {r["config_num"] for r in first} == {1}

    write_batch(1)
    write_batch(2)
    run()  # restart: resumes at v2/v3, does NOT re-route batch 0
    routed = spark.read.parquet(out_dir).collect()
    assert len(routed) == 30
    from collections import Counter

    assert Counter(r["config_num"] for r in routed) == {1: 10, 2: 10, 3: 10}


def test_config_poll_batch_retry_is_idempotent(spark, tmp_path):
    """A retried foreachBatch invocation (same batch_id) must neither
    duplicate routed rows nor advance the config version: the install
    target derives from batch_id and the sink dynamically overwrites
    only its own batch_id partition."""
    from distributed_computing_spark.streaming.config_poll import (
        ConfigMaster,
        route_batch,
    )

    cfg_dir, out_dir = str(tmp_path / "cfg"), str(tmp_path / "out")
    master = ConfigMaster(spark, cfg_dir, max_version=3)
    batch = spark.createDataFrame(
        [(i, f"k{i % 7}") for i in range(10)], "seq long, key string"
    )

    route_batch(batch, 0, cfg_dir, out_dir, master=master)
    assert master.installed == 1
    first = sorted(
        (r["config_num"], r["gid"], r["key"])
        for r in spark.read.parquet(out_dir).collect()
    )
    assert len(first) == 10 and {c for c, _, _ in first} == {1}

    # simulate the task retry: same batch, same batch_id, twice more
    route_batch(batch, 0, cfg_dir, out_dir, master=master)
    route_batch(batch, 0, cfg_dir, out_dir, master=master)
    assert master.installed == 1  # version NOT advanced by retries
    again = sorted(
        (r["config_num"], r["gid"], r["key"])
        for r in spark.read.parquet(out_dir).collect()
    )
    assert again == first  # no duplicate rows, identical routing

    # the next REAL batch still advances normally and keeps batch 0 rows
    batch1 = spark.createDataFrame(
        [(10 + i, f"k{i % 7}") for i in range(10)], "seq long, key string"
    )
    route_batch(batch1, 1, cfg_dir, out_dir, master=master)
    assert master.installed == 2
    rows = spark.read.parquet(out_dir).collect()
    from collections import Counter

    assert Counter(r["config_num"] for r in rows) == {1: 10, 2: 10}


def test_interval_join_stream_stream_bounds(spark, tmp_path):
    """Only purchases in [click_ts, click_ts + 30 min] by the same user
    match; earlier/later/other-user purchases do not."""
    import datetime as dt

    from distributed_computing_spark.streaming.runner import run_to_batch
    from distributed_computing_spark.streaming.windows import interval_join

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "user_id long, ts timestamp, value double"
    clicks = [(1, base, 0.0)]
    purchases = [
        (1, base + dt.timedelta(minutes=10), 5.0),   # match
        (1, base + dt.timedelta(minutes=30), 7.0),   # boundary: match
        (1, base + dt.timedelta(minutes=31), 9.0),   # too late
        (1, base - dt.timedelta(minutes=5), 11.0),   # before click
        (2, base + dt.timedelta(minutes=10), 13.0),  # other user
    ]

    def as_stream(rows, sub):
        d = str(tmp_path / sub)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        return spark.readStream.schema(schema).parquet(d)

    out = run_to_batch(
        interval_join(as_stream(clicks, "c"), as_stream(purchases, "p")),
        spark,
        output_mode="append",
    )
    got = sorted(r["purch_value"] for r in out.collect())
    assert got == [5.0, 7.0]


def test_cms_stream_equals_batch_sketch(spark):
    """The CMS counter table built by a streaming aggregation over a
    bounded replay must equal the batch sketch bit-for-bit — the
    sketch is distributive agg state, so the state store holds at most
    depth*width counters regardless of stream length."""
    from pyspark.sql import functions as F

    from distributed_computing_spark.operators.analytics import (
        cms_register_sketch,
    )
    from distributed_computing_spark.streaming.runner import (
        run_to_batch,
        stream_table,
    )

    rows = [(i, f"tok{i % 23}") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, word string")
    batch = {
        (r["sketch_row"], r["register"]): r["cnt"]
        for r in cms_register_sketch(df, "word", depth=4, width=64).collect()
    }
    sdf = stream_table(spark, df)
    streamed = {
        (r["sketch_row"], r["register"]): r["cnt"]
        for r in run_to_batch(
            cms_register_sketch(sdf, "word", depth=4, width=64), spark
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) <= 4 * 64


def test_cms_stream_restart_recovers_sketch_state(spark, tmp_path):
    """A second AvailableNow run sharing the checkpoint reads ONLY the
    files added after run 1, so the final sketch being equal to the
    batch sketch over ALL rows proves the counter state was RECOVERED
    from the checkpoint and incremented — the restart story a
    production streaming sketch needs (reference analog: snapshot
    restore; the foreach_batch_is_incremental motion applied to a
    stateful aggregation)."""
    from pyspark.sql import functions as F

    from distributed_computing_spark.operators.analytics import (
        cms_register_sketch,
    )

    rows = [(i, f"tok{i % 31}") for i in range(500)]
    first, second = rows[:300], rows[300:]
    ddl = "id long, word string"
    src = str(tmp_path / "cms_src")
    ckpt = str(tmp_path / "cms_ckpt")
    spark.createDataFrame(first, ddl).coalesce(1).write.mode("append").parquet(src)

    def _run(qname):
        sdf = spark.readStream.schema(ddl).parquet(src)
        q = (
            cms_register_sketch(sdf, "word", depth=4, width=64)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["sketch_row"], r["register"]): r["cnt"]
            for r in spark.table(qname).collect()
        }

    got1 = _run("cms_restart_run1")
    batch1 = {
        (r["sketch_row"], r["register"]): r["cnt"]
        for r in cms_register_sketch(
            spark.createDataFrame(first, ddl), "word", depth=4, width=64
        ).collect()
    }
    assert got1 == batch1
    spark.createDataFrame(second, ddl).coalesce(1).write.mode("append").parquet(src)
    got2 = _run("cms_restart_run2")
    batch_all = {
        (r["sketch_row"], r["register"]): r["cnt"]
        for r in cms_register_sketch(
            spark.createDataFrame(rows, ddl), "word", depth=4, width=64
        ).collect()
    }
    assert got2 == batch_all
    assert got2 != batch1  # run 2 really advanced the recovered state


def test_stateful_fold_restart_recovers_per_key_state(spark, tmp_path):
    """applyInPandasWithState across a checkpoint restart: run 2 (same
    checkpoint, only NEW files) must fold onto the RECOVERED per-key
    (value, max_seq) state — append concatenation makes recovery
    observable (a fold restarted from empty state would drop run 1's
    prefix). This is the streaming analog of the reference's snapshot
    restore for shape 2b (kv_stream.py:213)."""
    # unique (client, req) per op -> already-effective stream, no dedup
    # stage needed (stateful_fold_stream's input contract)
    ops = [
        (seq, 0, seq, op, key, f"v{seq}")
        for seq, (op, key) in enumerate(
            [
                ("put", "a"), ("append", "a"), ("put", "b"),
                ("append", "b"), ("append", "a"), ("put", "c"),
            ]
            * 10
        )
    ]
    first, second = ops[:30], ops[30:]
    src = str(tmp_path / "fold_src")
    ckpt = str(tmp_path / "fold_ckpt")
    spark.createDataFrame(first, OPS_DDL).coalesce(1).write.mode("append").parquet(src)

    out_dir = str(tmp_path / "fold_out")

    def _run():
        # memory sink can't recover an update-mode query from a
        # checkpoint; foreachBatch can (the repo's restart-test sink).
        # batch_id keeps incrementing across restarts sharing the
        # checkpoint, so max-batch_id-per-key is the final state.
        def sink(bdf, bid):
            bdf.withColumn("batch_id", F.lit(bid)).write.mode(
                "append"
            ).parquet(out_dir)

        stream = spark.readStream.schema(OPS_SCHEMA).parquet(src)
        q = (
            stateful_fold_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        latest = {}
        for r in sorted(
            spark.read.parquet(out_dir).collect(),
            key=lambda r: r["batch_id"],
        ):
            latest[r["key"]] = r["value"]
        return latest

    got1 = _run()
    assert got1 == serial_replay(first)
    spark.createDataFrame(second, OPS_DDL).coalesce(1).write.mode("append").parquet(src)
    got2 = _run()
    want = serial_replay(ops)
    # update mode: run 2 emits every key it touched; all three keys
    # receive ops in `second`, so run 2's table IS the final state
    assert got2 == want
    # the recovered-state signature: run 2's values START with run 1's
    for k in got1:
        assert got2[k].startswith(got1[k]) or any(
            op == "put" and key == k for _, _, _, op, key, _ in second
        )


def test_stream_dhash_ingest_equals_batch(spark):
    """Round 9 (exact twin of the rows-only gated query): the
    stateless decode+dHash Arrow map is deterministic per row, so the
    micro-batched streaming replay must equal the batch hashing
    bit-for-bit — every blob_id present, every hash identical."""
    from distributed_computing_spark.operators.multimodal import (
        dhash_images,
        textured_blobs,
    )
    from distributed_computing_spark.registry import QUERIES
    from distributed_computing_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    got = {
        r["blob_id"]: r["dhash"]
        for r in QUERIES["stream_dhash_ingest"](spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents")
    want = {
        r["blob_id"]: r["dhash"]
        for r in dhash_images(textured_blobs(docs)).collect()
    }
    assert got == want and len(got) > 0


def test_stream_cusum_drift_equals_batch(spark):
    """Round 10: the CUSUM detector over streamed daily counts — the
    streaming aggregation's final state must reproduce the batch
    detector exactly (counting is distributive; the detector runs on
    the flushed state)."""
    from distributed_computing_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in QUERIES["events_cusum_drift"](spark, sf).collect()}
    stream = {tuple(r) for r in QUERIES["stream_cusum_drift"](spark, sf).collect()}
    assert batch == stream and len(batch) > 0


def test_interarrival_gaps_span_batches(spark, tmp_path):
    """Cross-batch state: a key whose consecutive events land in
    DIFFERENT micro-batches must still emit the boundary gap (from the
    one-long state), and the total gap multiset must equal the batch
    lag-window fold. Ties within a batch follow (us, event_id)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from distributed_computing_spark.streaming.interarrival import (
        gap_stream,
    )
    from distributed_computing_spark.streaming.runner import (
        run_to_batch,
        stream_in_seq_batches,
    )

    t0 = dt.datetime(2024, 1, 1)
    # user 1 'click': events at 0s, 10s, 1000s, 1990s -> gaps 10, 990, 990
    # (the 10->1000 and 1000->1990 gaps cross the 2-batch split at 995)
    # user 2 'click': 500s, 500s (tie), 600s -> gaps 0, 100
    # user 3 'view': single event -> no gaps
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(seconds=10), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(seconds=1000), 1, "click", 1.0, "{}"),
        (4, t0 + dt.timedelta(seconds=1990), 1, "click", 1.0, "{}"),
        (5, t0 + dt.timedelta(seconds=500), 2, "click", 1.0, "{}"),
        (6, t0 + dt.timedelta(seconds=500), 2, "click", 1.0, "{}"),
        (7, t0 + dt.timedelta(seconds=600), 2, "click", 1.0, "{}"),
        (8, t0 + dt.timedelta(seconds=77), 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    e = df.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"),
        "event_id",
    )
    t_min = e.agg(F.min("us")).collect()[0][0]
    e = e.withColumn("rel", (F.col("us") - F.lit(int(t_min))).cast("long"))
    sdf = stream_in_seq_batches(spark, e, n=2, order_col="rel")
    got = run_to_batch(
        gap_stream(sdf.drop("rel")), spark, output_mode="append"
    ).collect()
    gaps = sorted((r.event_type, r.gap_s) for r in got)
    assert gaps == sorted(
        [("click", 10), ("click", 990), ("click", 990),
         ("click", 0), ("click", 100)]
    )
