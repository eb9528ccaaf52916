"""Repo-wide broadcast-gate defense (round 11, VERDICT r10 item 1).

The class being killed: an unconditional ``F.broadcast`` of a side
that is a fixed FRACTION of an SF-scaling table. Fine at every test
SF, a billions-of-rows broadcast (driver/executor OOM) at 100×. Round
10 fixed two instances reactively (copurchase_cosine, market_share);
this file makes the class structurally un-reintroducible:

1. A SWEEP over every registry query's ANALYZED plan at sf0.001:
   every ``ResolvedHint (strategy=broadcast)`` subtree that reaches a
   scaling-table relation without a cardinality-reducing node
   (Aggregate / Deduplicate / GlobalLimit) on the path must belong to
   a query in the audited allowlist below — where each entry names the
   GATE its call site carries. A new query with a bare fact-fraction
   broadcast lands in the sweep but not the allowlist and fails here.
2. ANSWER-IDENTITY tests for the round-11 gates: with the cap forced
   to 0 the plan must lose the broadcast (falls back to a
   co-partitioned shuffle) and the rows must be identical — proving
   the fallback path is live and correct, not dead code.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from distributed_computing_spark.caching import release_tracked
from distributed_computing_spark.plans import ungated_broadcast_tables
from distributed_computing_spark.registry import (
    QUERIES,
    late_shipment_priority,
    market_share_ppm,
    nation_trade_volume,
    segment_allocation,
)

# Every entry is an AUDITED gated call site: query -> (tables its
# forced-broadcast subtrees scan, the gate that bounds the broadcast).
# At sf0.001 the gates all pass, so the hints are present and the
# sweep flags them — membership here certifies the gate exists.
GATED_ALLOWLIST = {
    "nation_trade_volume": (
        {"customer"},
        "max_broadcast_rows footer gate, shuffle-hash fallback",
    ),
    "market_share_ppm": (
        {"customer", "orders"},
        "max_broadcast_customers footer gate + three-band qualifying-"
        "orders gate (exact count probe), shuffle-hash fallbacks",
    ),
    "segment_allocation": (
        {"customer"},
        "max_broadcast_customers footer gate, shuffle-hash fallback",
    ),
    "late_shipment_priority": (
        {"orders"},
        "market_share three-band gate (footer-certify / linear count "
        "probe / refuse) on the half-year orders window; decorrelated "
        "per-order-max shuffle-hash fallback",
    ),
    "ivm_segment_revenue": (
        {"customer"},
        "joins.gated_broadcast on the customer footer count",
    ),
    "segment_revenue_gini": (
        {"customer"},
        "joins.gated_broadcast on the customer footer count",
    ),
    "revenue_by_segment": (
        {"customer"},
        "joins.gated_broadcast on the customer footer count",
    ),
    "regional_revenue": (
        {"customer"},
        "joins.gated_broadcast on the customer footer count",
    ),
    "regional_revenue_bucketed": (
        {"customer"},
        "joins.gated_broadcast on the customer footer count",
    ),
    "revenue_percentiles": (
        {"customer"},
        "joins.gated_broadcast on the customer footer count",
    ),
    "scd2_pointintime": (
        {"customer"},
        "joins.gated_broadcast on n_versions x customer footer count",
    ),
    "lsh_topk": (
        {"embeddings"},
        "similarity max_broadcast_queries gate, n_queries_bound="
        "embeddings footer count, bucket-local shuffle fallback",
    ),
    "lsh_topk_exact": (
        {"embeddings"},
        "similarity max_broadcast_queries gate (same as lsh_topk)",
    ),
    "ivf_topk": (
        {"embeddings"},
        "similarity max_broadcast_queries gate, list-local fallback",
    ),
    "ivf_topk_exact": (
        {"embeddings"},
        "similarity max_broadcast_queries gate on the q_id vector join",
    ),
    "multimodal_ann": (
        {"documents"},
        "cosine_topk max_broadcast_queries gate, n_queries_bound="
        "documents footer count (partitioned cross join beyond)",
    ),
    "multimodal_real_ann": (
        {"documents"},
        "inline footer-bound gate (|docs|/50+1), partitioned cross "
        "join beyond",
    ),
}

# Constructions that run >5 s of eager iterative/index-building jobs
# even at sf0.001; each one's broadcasts are bounded-by-construction
# and plan-audited in their own test modules (test_plans /
# test_graph / test_bpe / test_kmeans). Excluded to keep this sweep
# inside the suite budget — NOT because they are exempt from the rule.
EXPENSIVE_CONSTRUCTION = {
    "copurchase_components",  # iterative min-label propagation (~40 s)
    "bpe_merges",  # iterative merge loop with localCheckpoints
    "bpe_encode_stats",
    "kmeans_embeddings",  # Lloyd iterations
    "kmeans_trace_a5",
}


def test_every_scaling_broadcast_is_from_a_gated_site(spark):
    flagged: dict[str, set[str]] = {}
    for name, fn in QUERIES.items():
        if name.startswith("stream_") or name in EXPENSIVE_CONSTRUCTION:
            continue
        try:
            hits = ungated_broadcast_tables(fn(spark, SF_DIR))
        finally:
            release_tracked()
        if hits:
            flagged[name] = hits
    unaudited = {
        n: sorted(t) for n, t in flagged.items() if n not in GATED_ALLOWLIST
    }
    assert not unaudited, (
        "forced broadcast of an SF-scaling side with no gate audit: "
        f"{unaudited} — either add a size gate (joins.gated_broadcast "
        "or a footer-count bound with a shuffle fallback) and register "
        "it in GATED_ALLOWLIST, or restructure the plan"
    )
    # the allowlist must also stay honest: an entry whose tables no
    # longer match reality is stale audit text
    for n, (tables, _why) in GATED_ALLOWLIST.items():
        if n in flagged:
            assert flagged[n] <= tables, (
                f"{n}: broadcast now reaches {sorted(flagged[n])} but "
                f"the audit covers {sorted(tables)} — re-audit"
            )


@pytest.mark.parametrize(
    "fn,kwargs",
    [
        (nation_trade_volume, {"max_broadcast_rows": 0}),
        (
            market_share_ppm,
            {"max_broadcast_orders": 0, "max_broadcast_customers": 0},
        ),
        (segment_allocation, {"max_broadcast_customers": 0}),
        (late_shipment_priority, {"max_broadcast_orders": 0}),
    ],
    ids=[
        "nation_trade_volume",
        "market_share_ppm",
        "segment_allocation",
        "late_shipment_priority",
    ],
)
def test_round11_gate_fallbacks_answer_identical(spark, fn, kwargs):
    """Cap forced to 0: the scaling-side broadcasts must vanish from
    the analyzed plan AND the rows must match the hinted plan —
    the copurchase_cosine / market_share gate rule, now for all three
    round-11 sites."""
    try:
        hinted = fn(spark, SF_DIR)
        forced = fn(spark, SF_DIR, **kwargs)
        assert ungated_broadcast_tables(forced) == set(), (
            "gate did not remove the scaling-side broadcast"
        )
        assert sorted(map(tuple, hinted.collect())) == sorted(
            map(tuple, forced.collect())
        )
    finally:
        release_tracked()


def test_similarity_gate_fallback_answer_identical(spark):
    """The ANN query-side gate: forcing the cap to 0 must produce the
    identical top-k under the shuffled bucket join."""
    from distributed_computing_spark.operators import similarity
    from distributed_computing_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where((emb["vec_id"] % 100) == 0)
    a = similarity.lsh_topk_exact(emb, queries, k=5, n_planes=4)
    b = similarity.lsh_topk_exact(
        emb, queries, k=5, n_planes=4, max_broadcast_queries=0
    )
    assert ungated_broadcast_tables(b) == set()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_gated_broadcast_helper_thresholds(spark):
    """joins.gated_broadcast: hint present at/below the cap, absent
    (shuffle-hash) above it."""
    from distributed_computing_spark.operators.joins import gated_broadcast
    from distributed_computing_spark.sources.catalog import load_table

    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    n = cust.count()
    fits = orders.join(
        gated_broadcast(cust, n, max_rows=n),
        orders["o_custkey"] == cust["c_custkey"],
    )
    spills = orders.join(
        gated_broadcast(cust, n, max_rows=n - 1),
        orders["o_custkey"] == cust["c_custkey"],
    )
    assert ungated_broadcast_tables(fits) == {"customer"}
    assert ungated_broadcast_tables(spills) == set()
    assert fits.count() == spills.count()
