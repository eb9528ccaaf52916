"""spread_for_arrow contract (round 13, VERDICT r12 item 4).

The split probe must be metadata-only: a raw file scan is sized from
its file index (no physical planning, no job), in-memory test frames
keep the cheap .rdd probe, and a DERIVED frame raises — the round-12
``df.rdd.getNumPartitions()`` probe silently compiled the physical
plan of whatever it was handed (~7 s cold on corpus_pipeline's derived
frame for a guaranteed no-op), and the "raw-scan sites only" rule
lived in docstrings with no guard.
"""

from __future__ import annotations

import pytest

from distributed_computing_spark.parallelism import spread_for_arrow
from distributed_computing_spark.sources.catalog import load_table

from tests.conftest import SF_DIR


def _n_parts(df) -> int:
    return df.rdd.getNumPartitions()


def test_raw_scan_spreads_to_default_parallelism(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    out = spread_for_arrow(docs)
    n = spark.sparkContext.defaultParallelism
    # the sf0.001 documents table is a single small file — far fewer
    # splits than cores, so the round-robin exchange must fire
    assert _n_parts(out) == n
    assert "RoundRobinPartitioning" in out._jdf.queryExecution().toString()


def test_events_project_chain_is_accepted(spark):
    # load_table("events") wraps the scan in a Project (nanos cast) —
    # the walker must see through Project/Filter chains
    ev = load_table(spark, SF_DIR, "events").select("user_id").where("user_id >= 0")
    out = spread_for_arrow(ev)
    assert _n_parts(out) == spark.sparkContext.defaultParallelism


def test_in_memory_frame_keeps_cheap_probe(spark):
    mem = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    out = spread_for_arrow(mem)
    assert _n_parts(out) == spark.sparkContext.defaultParallelism


def test_explicit_repartition_is_respected(spark):
    # an input the caller already repartitioned (test frames, operator
    # probe_in sites) must pass through unchanged — no raise, no probe,
    # no second exchange (this broke every _docs()-based emitter test
    # when the guard first landed)
    mem = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).repartition(8)
    out = spread_for_arrow(mem)
    assert out is mem
    docs = load_table(spark, SF_DIR, "documents").repartition(4)
    assert spread_for_arrow(docs) is docs


def test_limit_over_scan_is_accepted(spark):
    # multimodal tests hand the blob generators docs.limit(n) frames;
    # a limit-over-scan is strictly cheaper than the admitted scan
    docs = load_table(spark, SF_DIR, "documents").limit(5).select("doc_id")
    out = spread_for_arrow(docs)
    assert out.count() == 5


def test_derived_frame_raises(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="raw scan"):
        spread_for_arrow(docs.groupBy("lang").count())
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="raw scan"):
        spread_for_arrow(docs.join(ev, docs.doc_id == ev.user_id))
    with pytest.raises(ValueError, match="raw scan"):
        spread_for_arrow(docs.select("doc_id").union(docs.select("doc_id")))


def test_probe_is_metadata_only_no_job(spark):
    # counting jobs via the status tracker: building the spread frame
    # for a raw scan must not run any Spark job (the round-12 probe
    # compiled the plan AND converted to an RDD)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    spread_for_arrow(docs)
    after = tracker.getJobIdsForGroup(None)
    assert before == after
