"""Relational analytics tests: a sample of registry queries checked
against their DuckDB oracles at sf0.001 (the full set runs in
tools/check_correctness.py at sf0.01 — this keeps CI fast)."""

from __future__ import annotations

import math

import duckdb
import pytest

from distributed_computing_spark.registry import ORACLES, QUERIES

CHECK = [
    "pricing_summary",
    "revenue_by_segment",
    "priority_rollup",
    "events_windowed",
    "kv_state",
    "shard_census",
    "user_sessions",
]


def _norm(v):
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", CHECK)
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    srows, scols = sdf.collect(), sdf.columns
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _multiset([tuple(r) for r in srows], scols) == _multiset(orows, ocols)


def test_approx_distinct_within_error(spark, sf_dir):
    import pyspark.sql.functions as F

    from distributed_computing_spark.operators.analytics import approx_distinct_users
    from distributed_computing_spark.sources.catalog import load_table

    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(2.0, 0.05 * v)


def test_entry_contract(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
