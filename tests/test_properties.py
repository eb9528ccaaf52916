"""Distribution-safety properties: results must be invariant to
physical row order / partitioning (what actually varies on a cluster),
and scale guards must behave as documented."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_computing_spark.operators.dedup import minhash_lsh_pairs
from distributed_computing_spark.operators.kv import replay
from tests.test_kv import OPS_SCHEMA, random_ops


def test_replay_invariant_to_row_order_and_partitioning(spark):
    """The ops log arrives in arbitrary physical order on a cluster —
    the fold's semantics come from `seq`, never from row order."""
    ops = random_ops(17, n=400)
    base = spark.createDataFrame(ops, OPS_SCHEMA)
    want = {r["key"]: r["value"] for r in replay(base).collect()}
    scrambled = (
        spark.createDataFrame(list(reversed(ops)), OPS_SCHEMA)
        .repartition(13)  # round-robin: arbitrary physical placement
    )
    got = {r["key"]: r["value"] for r in replay(scrambled).collect()}
    assert got == want


def test_minhash_pairs_invariant_to_partitioning(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {tuple(r) for r in minhash_lsh_pairs(docs, threshold=0.35).collect()}
    b = {
        tuple(r)
        for r in minhash_lsh_pairs(docs.repartition(7), threshold=0.35).collect()
    }
    assert a == b and a


def test_minhash_max_bucket_guard(spark):
    """A degenerate cluster (50 identical docs) fans out quadratically;
    max_bucket drops those buckets entirely. Exact-dup removal runs
    BEFORE near-dup in the tiered pipeline, so the cap only ever drops
    boilerplate collisions in practice."""
    rows = [(i, "common boilerplate text repeated in every doc " * 5) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = minhash_lsh_pairs(docs, threshold=0.3, max_bucket=None).count()
    assert uncapped == 50 * 49 // 2
    capped = minhash_lsh_pairs(docs, threshold=0.3, max_bucket=10).count()
    assert capped == 0
