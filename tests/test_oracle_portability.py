"""Oracle portability: no oracle may depend on engine-version-sensitive
integer-division semantics.

DuckDB's integer ``//`` on a NEGATIVE left operand is version-sensitive:
1.0.0 (this box) truncates toward zero (``-7 // 2 = -3``), newer releases
floor (``-7 // 2 = -4``).  Spark's ``div`` and the repo's driver-side
folds pin truncation.  Round 6's ``kmeans_embeddings`` driver red
(CORRECTNESS_r06, hash-only mismatch) was root-caused to exactly this:
the generated oracle's centroid update divided possibly-negative sums
with a bare ``//``.

Two guards:

1. ``test_kmeans_oracle_engine_invariant`` — evaluates the generated
   kmeans CTE chain on data with guaranteed-negative centroid sums under
   BOTH semantics (native truncating ``//`` and an exact floored-division
   stand-in) and asserts identical output; also proves the test has teeth
   by showing the OLD unguarded form diverges between the two.
2. ``test_oracle_floordiv_operands_audited`` — sweeps every registered
   oracle for ``//`` and asserts each occurrence's left operand is in the
   audited non-negative allowlist, so a new signable ``//`` cannot land
   silently.
"""

import re

import duckdb
import pytest

from distributed_computing_spark.operators.similarity import kmeans_oracle_sql
from distributed_computing_spark.registry import ORACLES

# The guarded centroid-update expressions as emitted by kmeans_oracle_sql.
_GUARDED_POS = "CAST(s.sx // s.n AS BIGINT)"
_GUARDED_NEG = "CAST(-((-s.sx) // s.n) AS BIGINT)"

# Exact floored-division stand-ins (integer arithmetic only, no float):
# floor(a/b) for b>0 is a//b when a>=0 else -ceil(-a/b) = -(((-a)+b-1)//b).
# Substituting these for the native ``//`` simulates a FLOORING engine.
_FLOOR_POS = (
    "CAST(CASE WHEN s.sx >= 0 THEN s.sx // s.n"
    " ELSE -(((-s.sx) + s.n - 1) // s.n) END AS BIGINT)"
)
_FLOOR_NEG = (
    "CAST(-(CASE WHEN (-s.sx) >= 0 THEN (-s.sx) // s.n"
    " ELSE -((s.sx + s.n - 1) // s.n) END) AS BIGINT)"
)

_OLD_UNGUARDED = "CASE WHEN s.n IS NULL THEN p.cx ELSE s.sx // s.n END AS cx"
_OLD_UNGUARDED_FLOOR = (
    "CASE WHEN s.n IS NULL THEN p.cx"
    " ELSE CASE WHEN s.sx >= 0 THEN s.sx // s.n"
    " ELSE -(((-s.sx) + s.n - 1) // s.n) END END AS cx"
)

_GUARDED_BLOCK = re.compile(
    r"CASE WHEN s\.n IS NULL THEN p\.cx\s+"
    r"WHEN s\.sx >= 0 THEN CAST\(s\.sx // s\.n AS BIGINT\)\s+"
    r"ELSE CAST\(-\(\(-s\.sx\) // s\.n\) AS BIGINT\) END AS cx"
)


def _synthetic_embeddings_con():
    """A DuckDB connection whose ``embeddings`` view has strongly
    negative coordinates, so centroid sums go negative and the two
    division semantics would diverge on an unguarded oracle."""
    con = duckdb.connect()
    con.execute(
        """
CREATE VIEW embeddings AS
SELECT i AS vec_id,
       [sin(i * 1.7) - 0.6,
        cos(i * 2.3) - 0.4,
        sin(i * 0.9) * 0.5 - 0.3]::DOUBLE[] AS embedding
FROM range(1, 61) t(i)"""
    )
    return con


def test_kmeans_oracle_engine_invariant():
    sql = kmeans_oracle_sql(k=4, n_iter=3)
    # Round-8 defense: the +2*scale shift makes every coordinate (and
    # therefore every centroid sum) non-negative, where flooring and
    # truncating // coincide for ANY engine version.
    assert "+ 2000000 AS x" in sql, (
        "kmeans oracle lost its non-negative quantization shift"
    )
    # Round-7 defense kept (ELSE branch now unreachable): sign-explicit
    # centroid division.
    assert _GUARDED_BLOCK.search(sql), (
        "kmeans oracle lost its sign-explicit centroid division — "
        "bare // on negative sums is DuckDB-version-sensitive"
    )
    assert sql.count(_GUARDED_POS) == 2 and sql.count(_GUARDED_NEG) == 2

    floored = sql.replace(_GUARDED_POS, _FLOOR_POS).replace(
        _GUARDED_NEG, _FLOOR_NEG
    )

    con = _synthetic_embeddings_con()
    trunc_rows = con.execute(sql).fetchall()
    floor_rows = con.execute(floored).fetchall()
    assert trunc_rows == floor_rows, (
        "guarded centroid division diverges between truncating and "
        "flooring // semantics"
    )

    # Teeth: strip BOTH defenses (no shift, round-6 unguarded division)
    # and show the two engine semantics DISAGREE on this data — i.e.
    # the synthetic coordinates really do drive centroid sums negative
    # once the shift is removed, so the invariance above is earned.
    unshifted = sql.replace("+ 2000000 AS x", "+ 0 AS x")
    guarded_block = _GUARDED_BLOCK.search(sql).group(0)
    old = unshifted.replace(guarded_block, _OLD_UNGUARDED)
    old_floor = unshifted.replace(guarded_block, _OLD_UNGUARDED_FLOOR)
    assert old != unshifted and old_floor != old
    old_trunc_rows = con.execute(old).fetchall()
    old_floor_rows = con.execute(old_floor).fetchall()
    assert old_floor_rows != old_trunc_rows, (
        "synthetic data no longer exercises negative centroid sums — "
        "the engine-invariance test lost its teeth"
    )
    # With the shift in place, even the unguarded round-6 division is
    # engine-invariant (the non-negativity defense is sufficient alone).
    shifted_old = sql.replace(guarded_block, _OLD_UNGUARDED)
    shifted_old_floor = sql.replace(guarded_block, _OLD_UNGUARDED_FLOOR)
    assert (
        con.execute(shifted_old).fetchall()
        == con.execute(shifted_old_floor).fetchall()
        == trunc_rows
    )


def test_kmeans_trace_oracles_consistent_with_main_chain():
    """The driver-bisect trace oracles are strict prefixes of the main
    chain: aggregating the final trace assignment reproduces the main
    oracle's output, and the centroid traces are engine-invariant under
    the floored-division stand-in."""
    from distributed_computing_spark.operators.similarity import (
        kmeans_trace_assign_sql,
        kmeans_trace_centroid_sql,
    )

    con = _synthetic_embeddings_con()
    main = con.execute(kmeans_oracle_sql(k=4, n_iter=3)).fetchall()
    a3 = kmeans_trace_assign_sql(3, k=4)
    # wss ships as the canonical digit string since round 9 (the
    # decimal purge) — mirror it here so prefix consistency stays exact
    agg = con.execute(
        f"WITH t AS ({a3}) SELECT cluster, CAST(count(*) AS BIGINT), "
        "CAST(CAST(sum(dist) AS HUGEINT) AS VARCHAR) FROM t "
        "GROUP BY cluster ORDER BY cluster"
    ).fetchall()
    assert agg == main
    for t in range(3):
        sql = kmeans_trace_centroid_sql(t, k=4)
        rows = con.execute(sql).fetchall()
        assert rows and all(r[2] >= 0 for r in rows), (
            "trace centroids must be non-negative under the shift"
        )
        floored = sql.replace(_GUARDED_POS, _FLOOR_POS).replace(
            _GUARDED_NEG, _FLOOR_NEG
        )
        assert con.execute(floored).fetchall() == rows


# Audited ``//`` left-operand patterns: each is provably non-negative,
# so truncation == flooring and the oracle is engine-version-invariant.
# Adding a NEW ``//`` to any oracle fails this test until its operand is
# audited (non-negative) and a pattern is added here with a reason.
_AUDITED_FLOORDIV = [
    # epoch_us(ts) on the testdata's post-1970 timestamps is positive.
    r"epoch_us\([a-z]?\.?\w*\(?ts\)?\)? // 1000000",
    r"epoch_us\(o_orderdate\) // 1000000",
    r"epoch_us\(ts\) // 1000000 // 21600",
    # (x - min(x)) and (max - min) spans are non-negative by construction.
    r"\(\(user_id - \(SELECT min\(user_id\)",
    r"\(\(epoch_us\(ts\) // 1000000 - \(SELECT min\(",
    r"\(\(umax - umin\) \* \d+\) // 100",
    r"\(\(tmax - tmin\) \* \d+\) // 100",
    # a.wk >= per-user min week, so datediff is non-negative.
    r"CAST\(datediff\('day', f\.cohort_week, a\.wk\) // 7",
    # MP3 spec frame size: kbps and sample rate are positive constants.
    r"144000 \* kbps // 44100",
    # counts / sequence numbers / token counts are non-negative.
    r"max\(seq\) // 2",
    r"seq <= ms // 3",
    r"seq <= \(2 \* ms\) // 3",
    r"tokens_before // 256",
    # md5-derived 60-bit hashes are non-negative.
    r"\)\)::BIGINT\s+// 1073741824",
    r"h // 64",
    # dot^2 over norms: both sides non-negative (quantized-rank rule).
    r"// \(\(q\.r\*q\.r \+ q\.g\*q\.g \+ q\.b\*q\.b\)",
    # row_number()-derived rank is non-negative.
    r"\(rk \* 10\) // n",
    # round 9: sum_d2 = Σ(rq-rp)² >= 0 and the CASE guards n >= 2, so
    # both operands are non-negative.
    r"\(6 \* sum_d2 \* 1000000\) // \(n \* \(n \* n - 1\)\)",
    # round 9: order/pair/support counts are non-negative by
    # construction; promo/total cents sum floor(price*100) of positive
    # prices.
    r"\(n_orders \* 1000000\) // n_total",
    r"// \(sa\.supp::HUGEINT \* sb\.supp\)",
    r"\(promo_cents \* 1000000\) // total_cents",
    # round 11: interarrival gap d_us = us - lag(us) over an ORDER BY
    # us window is non-negative by the window order.
    r"\(d_us\) // 1000000",
    # round 11: the Gini numerator 2Σr·x − (N+1)ΣX is non-negative by
    # Chebyshev's sum inequality over ascending ranks; n·sx > 0 under
    # the CASE guard.
    r"\(\(2 \* srx - \(n \+ 1\) \* sx\) \* 1000000\) // \(n \* sx\)",
    # pagerank: rank/teleport/support counters are non-negative.
    r"sum\(r\.rank // d2\.outdeg\)",
    r"\d+ \* COALESCE\(s\.c_in, 0\)\) // \d+",
    r"\d+ // count\(\*\)",
    # round 11: per-part revenue myriacents (floor of positive prices)
    # and the 1e6 ppm scale are non-negative; session epoch-second
    # bounds t0/t1 are post-1970 timestamps, so >= 0.
    r"\(CAST\(pr\.part_mc AS HUGEINT\) \* 1000000\) // t\.total_mc",
    r"\(t0 // 60\)",
    r"\(t1 // 60\)",
    # linkage segment offsets: ln and seg_i are non-negative.
    r"\(ln \* s?\.?\w*seg_i\w*\)? ?\)? //",
    r"substr\(name, \(ln \* s\.seg_i\) // \d+",
    # kmeans centroid update: sign-explicit guarded forms only.
    r"WHEN s\.sx >= 0 THEN CAST\(s\.sx // s\.n AS BIGINT\)",
    r"ELSE CAST\(-\(\(-s\.sx\) // s\.n\) AS BIGINT\)",
    # association rules: supports and order counts are non-negative.
    r"supp_ab::HUGEINT \* 1000000\) // sl\.supp",
    r"\* 1000000\)\s+// \(sl\.supp::HUGEINT \* sr\.supp\)",
    # bigram PMI: token/bigram counts are non-negative.
    r"\* 1000000\)\s+// \(nb\.nb::HUGEINT \* cx\.c \* cy\.c\)",
    # audience overlap: user_id and popcounts are non-negative.
    r"user_id // 62",
    r"\* 1000000\)\s+// \(ta\.n_users \+ tb\.n_users - i\.n_common\)",
    # user streaks: epoch-day arithmetic on post-1970 timestamps.
    r"epoch_us\(ts\) // 1000000 // 86400",
    # round 10 dHash oracles: doc_id is non-negative in the testdata,
    # and id = doc_id*8+f packs non-negatives.
    r"doc_id // 20",
    r"id // 8",
    # TWAP: value·dt products and spans are non-negative.
    r"vt_sum // span_s::HUGEINT",
    # trend slopes: sign-explicit CASE — both branches' dividends are
    # non-negative by construction (the kmeans r7 guarded form).
    r"THEN \(\(n \* sxy - sx \* sy\) \* 1000000\) // \(n \* sxx - sx \* sx\)",
    r"ELSE -\(\(\(sx \* sy - n \* sxy\) \* 1000000\) // \(n \* sxx - sx \* sx\)\)",
    # round 10 market share: both sums are HUGEINT sums of floor-cent
    # revenue of positive prices with discount in [0, 1) — non-negative;
    # the CASE guards total_mc > 0.
    r"\(target_mc \* 1000000\) // total_mc",
    # round 10 Theil–Sen: n_pairs is a window count(*), non-negative.
    r"\(n_pairs \+ 1\) // 2",
    # round 10 apportionment: revenue cents of positive order totals.
    r"\(10000 \* r\.rev_cents\) // t\.total_cents",
    # round 11 KS drift: d_num = max(abs(...)) >= 0 and the CASE guards
    # a strictly-positive denominator (n_g > 0 AND n_tot > n_g).
    r"\(d_num \* 1000000\)\s+// \(n_g \* \(\(SELECT n_tot FROM nt\) - n_g\)\)",
    # round 11 vocab growth: doc ids and token/vocab counts are
    # non-negative; the ttr CASE guards a positive denominator.
    r"\(\(CAST\(i AS BIGINT\) \+ 1\) \* \(m \+ 1\)\) // 20",
    r"\(COALESCE\(v\.n_vocab, 0\) \* 1000000\) // n\.n_toks",
    # round 11 winnowing: keys are md5-derived non-negatives; counts
    # non-negative with a CASE-guarded positive denominator.
    r"wmin // 2097152",
    r"\(srcf\.n_fp \* 1000000\) // srcg\.n_grams",
    # round 11 clustering coefficient: triangle/degree counts are
    # non-negative and the WHERE guards d >= 2.
    r"// \(d\.d::HUGEINT \* \(d\.d - 1\)\)",
    # round 12 retention cohorts: epoch_us of 2024 timestamps and the
    # week bucket are non-negative; counts non-negative with the CASE
    # guarding a positive cohort_size.
    r"\(epoch_us\(ts\) // 86400000000\) // 7",
    r"\(n_users \* 1000000\) // cohort_size",
    # round 12 doc co-occurrence: document-frequency counts, all
    # non-negative; denominators are df's of tokens present in some
    # pair (>= 1 by construction).
    r"\(p\.n_xy \* n\.n_docs \* 1000000\) // \(dx\.df \* dy\.df\)",
]


def _all_oracle_sql():
    out = dict(ORACLES)
    out["__generated_kmeans__"] = kmeans_oracle_sql()
    return out


def test_oracle_floordiv_operands_audited():
    unaudited = []
    for name, sql in _all_oracle_sql().items():
        if not isinstance(sql, str):
            continue
        for m in re.finditer(r"//", sql):
            # `https?://` etc. in regex literals is not integer division.
            if m.start() > 0 and sql[m.start() - 1] == ":":
                continue
            ctx = sql[max(0, m.start() - 70) : m.end() + 40].replace(
                "\n", " "
            )
            if not any(re.search(p, ctx) for p in _AUDITED_FLOORDIV):
                unaudited.append((name, ctx))
    assert not unaudited, (
        "oracle // on un-audited operands (DuckDB floors vs truncates on "
        f"negatives — audit non-negativity or rewrite sign-explicitly): "
        f"{unaudited[:10]}"
    )
