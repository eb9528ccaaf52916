"""PageRank (operators/graph.py): integer-fold parity against a pure-
Python reference, structural invariants, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_computing_spark.caching import release_tracked
from distributed_computing_spark.operators.graph import (
    copurchase_edges,
    pagerank,
    pagerank_parts,
)


def _py_pagerank(edges, n_iter=8, scale=10**9, num=85, den=100):
    """Reference fold: same integer arithmetic, plain dicts."""
    out = {}
    for s, d in edges:
        out.setdefault(s, set()).add(d)
    deg = {n: len(vs) for n, vs in out.items()}
    ranks = {n: scale for n in deg}
    teleport = (scale * (den - num)) // den
    for _ in range(n_iter):
        c_in = {n: 0 for n in deg}
        for u, vs in out.items():
            c = ranks[u] // deg[u]
            for v in vs:
                if v in c_in:
                    c_in[v] += c
        ranks = {n: teleport + (num * c_in[n]) // den for n in deg}
    return ranks, deg


@pytest.fixture(scope="module")
def toy_edges():
    # directed, asymmetric, includes a rank sink structure (d has high
    # in-degree) and a 2-cycle — exercises uneven mass flow
    return [
        (1, 2), (2, 1), (1, 3), (3, 4), (2, 4), (4, 1), (5, 4), (5, 1),
        (1, 4), (4, 5),
    ]


def test_pagerank_matches_python_reference(spark, toy_edges):
    df = spark.createDataFrame(toy_edges, "src long, dst long")
    got = {
        r["node"]: (r["outdeg"], r["rank_score"])
        for r in pagerank(df, n_iter=8).collect()
    }
    release_tracked()
    ranks, deg = _py_pagerank(toy_edges)
    assert set(got) == set(deg)
    for n in deg:
        assert got[n] == (deg[n], ranks[n]), n


def test_pagerank_uniform_on_symmetric_regular_graph(spark):
    # a 4-cycle traversed both ways: 2-regular symmetric graph, so the
    # stationary distribution is uniform and every iteration must keep
    # rank exactly at the fixed point of the integer fold
    edges = [(i, (i + 1) % 4) for i in range(4)]
    edges += [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank(df, n_iter=3, scale=10**9).collect()
    release_tracked()
    scores = {r["rank_score"] for r in rows}
    assert len(scores) == 1
    # integer fixed point of r = 0.15*S + 0.85*r under truncation sits
    # just below S
    (score,) = scores
    assert 10**9 - 100 <= score <= 10**9


def test_copurchase_edges_symmetric_and_loop_free(spark, sf_dir):
    from distributed_computing_spark.sources.catalog import load_table

    edges = copurchase_edges(load_table(spark, sf_dir, "lineitem"))
    assert edges.where(F.col("src") == F.col("dst")).count() == 0
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert edges.exceptAll(rev).count() == 0  # same order ⇒ both directions


def test_pagerank_parts_total_mass_and_shape(spark, sf_dir):
    out = pagerank_parts(spark, sf_dir, n_iter=4, k=50)
    rows = out.collect()
    release_tracked()
    assert len(rows) == 50
    assert out.columns == ["p_partkey", "n_neighbors", "rank_score"]
    scores = [r["rank_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # truncating division only loses mass: every rank is positive and
    # bounded by total initial mass
    assert all(0 < s < 2000 * 10**9 for s in scores)


def test_pagerank_iteration_shuffle_budget(spark, toy_edges):
    """Shuffle contract under the broadcast dispatch: the edge table is
    NEVER re-exchanged — each round's only hash exchange is the
    partial-aggregated groupBy(dst), so the whole n_iter chain costs
    n_iter exchanges plus the one-off cache builds. (The naive
    co-partitioned formulation measured 5 exchanges/round: AQE-cached
    relations report unknown partitioning, so edges re-shuffled every
    round.)"""
    from distributed_computing_spark.plans.inspect import count_exchanges

    df = spark.createDataFrame(toy_edges, "src long, dst long")
    n_iter = 4
    pr = pagerank(df, n_iter=n_iter)
    n = count_exchanges(pr)
    release_tracked()
    # one agg exchange per round + at most two one-off cache builds
    assert n <= n_iter + 2, n


def test_pagerank_shuffle_fallback_matches_broadcast(spark, toy_edges):
    """Above broadcast_nodes_max the co-partitioned shuffle path must
    produce bit-identical ranks (the dispatch changes the plan, never
    the fold)."""
    df = spark.createDataFrame(toy_edges, "src long, dst long")
    a = {r["node"]: r["rank_score"] for r in pagerank(df, n_iter=5).collect()}
    b = {
        r["node"]: r["rank_score"]
        for r in pagerank(df, n_iter=5, broadcast_nodes_max=0).collect()
    }
    release_tracked()
    assert a == b
