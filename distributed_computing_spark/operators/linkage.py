"""Record linkage: edit-distance self-join with pigeonhole blocking.

Entity resolution over dirty identifiers ("find records whose keys
differ by a typo") is the cross-record analog of the dedup family's
near-dup text matching — EXT coverage next to SimHash's pigeonhole
chunks (dedup.py): to find all pairs within Levenshtein distance d
among EQUAL-LENGTH strings, split every string into d+1 aligned
segments; d substitutions can corrupt at most d segments, so every
true pair still agrees on at least one (segment_index, segment_text)
block. Equal length is part of the block key, which is what makes the
pigeonhole sound (equal-length strings at distance <= d differ by
exactly <= d substitutions — an insert/delete pair would already cost
distance 2 and change alignment).

Design for 100 TB:
- Candidate generation is a self-join on (length, segment_index,
  segment_text) — bounded blocks, never a cross join.
- Every block carries an ABSOLUTE size cap (CLAUDE.md round-4 rule:
  relative caps don't survive scale-up); oversized blocks are dropped
  deterministically on BOTH engines, so the oracle stays exact.
- The candidate-pair exchange carries ids only; names re-attach via
  two id-keyed joins before the Levenshtein verify (same ids-only
  discipline as the MinHash band joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
    max_block: int = 512,
) -> DataFrame:
    """All (a_id, b_id, dist) pairs with levenshtein <= ``max_dist``
    among equal-length values of ``name_col``, a_id < b_id.

    Complete for equal-length inputs whose blocks stay within
    ``max_block`` (oversized blocks are dropped entirely — the
    deterministic guard both engines mirror). Intended for values with
    length >= max_dist + 1 segments of at least one char.
    """
    n_seg = max_dist + 1
    nm = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.length(name_col).alias("ln"),
    )
    segs = nm.select(
        "id",
        "ln",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seg_i"),
                        F.expr(
                            f"substring(name, (ln * {i}) div {n_seg} + 1, "
                            f"(ln * {i + 1}) div {n_seg} - (ln * {i}) div {n_seg})"
                        ).alias("seg"),
                    )
                    for i in range(n_seg)
                ]
            )
        ).alias("s"),
    ).select("id", "ln", F.col("s.seg_i").alias("seg_i"), F.col("s.seg").alias("seg"))
    ok = (
        segs.groupBy("ln", "seg_i", "seg")
        .agg(F.count(F.lit(1)).alias("block_n"))
        .where(F.col("block_n") <= max_block)
        .select("ln", "seg_i", "seg")
    )
    blocked = segs.join(ok, ["ln", "seg_i", "seg"])
    cand = (
        blocked.select("ln", "seg_i", "seg", F.col("id").alias("a_id"))
        .join(
            blocked.select("ln", "seg_i", "seg", F.col("id").alias("b_id")),
            ["ln", "seg_i", "seg"],
        )
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    return (
        cand.join(nm.select(F.col("id").alias("a_id"), F.col("name").alias("a_name")), "a_id")
        .join(nm.select(F.col("id").alias("b_id"), F.col("name").alias("b_name")), "b_id")
        .select(
            "a_id",
            "b_id",
            F.levenshtein("a_name", "b_name").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )


def fuzzy_customer_match(
    spark: SparkSession, sf_dir: str, max_dist: int = 1, max_block: int = 512
) -> DataFrame:
    """Registry query: customer-name pairs one typo apart (among the
    deterministic c_custkey % 3 == 0 subset, which bounds the gate
    output while keeping a few thousand true matches)."""
    from distributed_computing_spark.sources.catalog import load_table

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 3 == 0
    )
    return edit_distance_pairs(
        cust, "c_custkey", "c_name", max_dist=max_dist, max_block=max_block
    )


def fuzzy_match_oracle_sql(max_dist: int = 1, max_block: int = 512) -> str:
    """Exact DuckDB oracle: same segmentation arithmetic (truncating
    integer division), same absolute block cap, same levenshtein
    verify."""
    n_seg = max_dist + 1
    seg_rows = ", ".join(str(i) for i in range(n_seg))
    return f"""
WITH nm AS (
  SELECT c_custkey AS id, c_name AS name, length(c_name) AS ln
  FROM customer WHERE c_custkey % 3 = 0),
segs AS (
  SELECT id, ln, s.seg_i,
         substr(name, (ln * s.seg_i) // {n_seg} + 1,
                (ln * (s.seg_i + 1)) // {n_seg} - (ln * s.seg_i) // {n_seg})
           AS seg
  FROM nm, (SELECT unnest([{seg_rows}]) AS seg_i) s),
ok AS (
  SELECT ln, seg_i, seg FROM segs
  GROUP BY 1, 2, 3 HAVING count(*) <= {max_block}),
blocked AS (
  SELECT s.id, s.ln, s.seg_i, s.seg
  FROM segs s JOIN ok o
    ON s.ln = o.ln AND s.seg_i = o.seg_i AND s.seg = o.seg),
cand AS (
  SELECT DISTINCT a.id AS a_id, b.id AS b_id
  FROM blocked a JOIN blocked b
    ON a.ln = b.ln AND a.seg_i = b.seg_i AND a.seg = b.seg
   AND a.id < b.id)
SELECT c.a_id, c.b_id, levenshtein(na.name, nb.name) AS dist
FROM cand c
JOIN nm na ON na.id = c.a_id
JOIN nm nb ON nb.id = c.b_id
WHERE levenshtein(na.name, nb.name) <= {max_dist}"""


def fastss_edit1_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_bucket: int = 10000,
) -> DataFrame:
    """All (a, b, dist) pairs with Levenshtein distance <= 1, a < b —
    INCLUDING the insert/delete pairs the equal-length pigeonhole
    (``edit_distance_pairs``) cannot reach: FastSS deletion
    neighborhoods (Bocek et al. 2007). Two strings are within edit
    distance 1 iff their 1-deletion neighborhoods D(s) = {s} ∪
    {s minus char i} intersect: a substitution pair meets at the key
    with the differing char deleted; an insert/delete pair meets at
    the shorter string itself.

    Design for 100 TB (the MinHash-band discipline):
    - neighborhood generation is pure JVM (sequence + transform +
      substring) — |s|+1 variants per row, no Python;
    - the candidate exchange carries (id, xxhash64(variant)) ONLY —
      a hash collision can only ADD a candidate, and the exact
      Levenshtein verify removes it, so hashing is loss-free;
    - every bucket carries the ABSOLUTE ``max_bucket`` cap (CLAUDE.md
      rule: relative caps don't survive scale-up); at the gated data
      the deepest bucket is ~15, so the default cap is provably
      inactive and the brute-force oracle stays exact — at a scale
      where the cap binds, the contract becomes pairs-within-cap,
      like the MinHash/ngram guards;
    - names re-attach by id-keyed joins only for the final verify.
    """
    nm = F.col(name_col)
    variants = F.array_distinct(
        F.concat(
            F.array(nm),
            F.transform(
                F.sequence(F.lit(1), F.length(nm)),
                lambda i: F.concat(
                    F.substring(nm, F.lit(1), i - 1),
                    F.substring(nm, i + 1, F.length(nm)),
                ),
            ),
        )
    )
    # Round-12 probe (kept as a record): a track_persist of this
    # variant table measured NEUTRAL within noise at sf0.1 and on the
    # R10 customer replica — its consumers already shared the distinct
    # exchange via runtime ReusedExchange (verify against an EXECUTED
    # AQE plan; pre-execution explains print no reuse), so the cache
    # only added memory pressure.
    vk = (
        df.select(F.col(id_col).alias("_id"), F.explode(variants).alias("_v"))
        .select("_id", F.xxhash64("_v").alias("_kh"))
        .distinct()
    )
    # Round-12 (second pass): candidate pairs come from the BASKET
    # pattern (the copurchase_edges motion) — ONE groupBy collects
    # each bucket's sorted id list (the size filter IS the cap check,
    # so the separate count rollup disappears) and a<b pairs explode
    # map-side from the sorted array. The old hash self-join shuffled
    # the variant table into both join sides plus the cap rollup;
    # measured warm: sf0.1 full query 3.4-4.3 s → 3.1-3.8 s, R10
    # customer replica 10.4/16.1 s → 9.2/8.9 s, candidate sets
    # bit-identical (956 109 pairs, exceptAll 0 both directions).
    # Pair fan-out stays bounded by the same absolute max_bucket cap.
    buckets = (
        vk.groupBy("_kh")
        .agg(F.array_sort(F.collect_list("_id")).alias("_ids"))
        .where(F.size("_ids") <= max_bucket)
    )
    cand = (
        buckets.select(F.posexplode("_ids").alias("_i", "a"), "_ids")
        .select(
            "a",
            F.explode(
                F.expr("slice(_ids, _i + 2, size(_ids) - _i - 1)")
            ).alias("b"),
        )
        .distinct()
    )
    names = df.select(F.col(id_col).alias("_nid"), F.col(name_col).alias("_nm"))
    return (
        cand.join(names.withColumnRenamed("_nid", "a").withColumnRenamed("_nm", "_na"), "a")
        .join(names.withColumnRenamed("_nid", "b").withColumnRenamed("_nm", "_nb"), "b")
        .where(F.levenshtein("_na", "_nb") <= 1)
        .select("a", "b", F.levenshtein("_na", "_nb").cast("int").alias("dist"))
    )


def global_rank_by_range(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    n_parts: int | None = None,
    keep_pid: bool = False,
):
    """Exact 1-based GLOBAL dense row number over ``order_cols``
    (must be a unique total order) WITHOUT a single-task global sort:
    range-partition on the order columns, rank within each partition,
    and add per-partition row-count offsets (a bounded |partitions|
    collect). The result is invariant to WHERE the RangePartitioner
    draws its sampled boundaries (CLAUDE.md: boundaries shift with
    session history — any boundary placement yields the same global
    order), but the partitioned frame PERSISTS because two consumers
    (the counts and the ranked rows) would otherwise re-evaluate the
    range exchange with potentially different sampled boundaries,
    making offsets inconsistent with ranks.

    Returns (ranked_df, offsets, persisted_handle) — ``offsets`` maps
    partition id → rows before it (the contiguity contract callers
    like the boundary-replication pair generator need); the caller
    releases the handle (or leaves it to session cleanup —
    track_persist registers it). ``keep_pid=True`` retains the ``_pid``
    column on the ranked frame.
    """
    from pyspark.sql import Window

    from distributed_computing_spark.caching import track_persist

    sess = df.sparkSession
    if n_parts is None:
        n_parts = sess.sparkContext.defaultParallelism
    parted = track_persist(
        df.repartitionByRange(n_parts, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in parted.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )  # bounded: one row per partition
    offs, acc = {}, 0
    for pid, n in counts:
        offs[pid] = acc
        acc += n
    off_df = F.broadcast(
        sess.createDataFrame(
            [(p, o) for p, o in offs.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = (
        parted.join(off_df, "_pid")
        # pin the window exchange's parallelism: AQE sizes post-shuffle
        # partitions by BYTES and coalesces this narrow (pid, keys)
        # frame to ~1 task, serializing the per-partition sort (the
        # CLAUDE.md round-3 rule — compute-bound stage parallelism
        # should track cores, not the shuffle byte target; measured in
        # the sorted-neighborhood decomposition, BASELINE.md).
        .repartition(n_parts, "_pid")
        .withColumn(out_col, F.col("_off") + F.row_number().over(w))
        .drop(*([] if keep_pid else ["_pid"]), "_off")
    )
    return ranked, offs, parted


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    window: int = 8,
    max_dist: int = 2,
) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernández & Stolfo 1995,
    the merge/purge method): sort all records by the key, slide a
    fixed window of ``window`` positions, and verify only pairs that
    fall in a common window — candidate generation linear in n with a
    FIXED per-row fan-out (window−1), where blocking methods depend on
    block-size distributions. The complement of the pigeonhole
    family: it catches near-misses that disagree on every block but
    sort adjacently.

    Exact and engine-portable: the global position comes from
    ``global_rank_by_range`` over the unique total order
    (name, id) — two-level range ranking, never a single-task global
    sort (the spearman skew-cliff rule); the pair set is then
    POSITION-DEFINED (0 < rn_b − rn_a < window), so the oracle's
    row_number() window reproduces it exactly, and the Levenshtein
    verify is identical on both engines (cross-checked in
    test_round11_ops).

    Candidate generation is BOUNDARY REPLICATION, not a join (measured
    re-plan, BASELINE.md round-11 late: the draft exploded d∈[1,w)
    offsets and hash-joined rn+d back onto the rank table — AQE turned
    the (w−1)×-fan side into a BuildLeft broadcast hash relation and
    the R20 tier ran 22.5 s, SLOWER than R100's 16.9; this shape runs
    4.5/9.5 s). Each group's rows are a contiguous global-rank slice,
    so a row additionally ships to every group whose first (w−1)
    positions it occupies (a ≤ (w−1)/avg-partition-size fractional
    fan-out via a |partitions|-row broadcast range join); after ONE
    exchange on the group id, every neighbor pair is (lead(d) over the
    group, d < w) — window + Generate + Levenshtein all in the same
    stage, no pair join, no data-sized broadcast. A pair is kept only
    in the group where b is an ORIGINAL row (rn_b > group start), so
    band-internal pairs never duplicate.
    """
    nm = df.select(
        F.col(id_col).alias("id"), F.col(name_col).alias("name")
    )
    w = window
    ranked, offs, _parted = global_rank_by_range(
        nm, ["name", "id"], "rn", keep_pid=True
    )
    sess = df.sparkSession
    starts = F.broadcast(
        sess.createDataFrame(
            [(h, o) for h, o in offs.items()], "_grp int, _start long"
        )
    )
    own = ranked.select(
        F.col("_pid").alias("_grp"), "rn", "id", "name"
    )
    # replica band of group h = global ranks [start_h − w + 2, start_h]
    repl = ranked.join(
        starts,
        (F.col("_start") >= F.col("rn"))
        & (F.col("_start") <= F.col("rn") + (w - 2)),
    ).select("_grp", "rn", "id", "name")
    assigned = own.unionByName(repl).repartition(
        df.sparkSession.sparkContext.defaultParallelism, "_grp"
    )  # pinned for the same AQE-coalescing reason as the rank window
    wspec = Window.partitionBy("_grp").orderBy("rn")
    leads = assigned.select(
        "_grp",
        "rn",
        "id",
        "name",
        *[
            F.lead("id", d).over(wspec).alias(f"_bid{d}")
            for d in range(1, w)
        ],
        *[
            F.lead("name", d).over(wspec).alias(f"_bnm{d}")
            for d in range(1, w)
        ],
    )
    fan = leads.select(
        "_grp",
        "rn",
        F.col("id").alias("a_id"),
        F.col("name").alias("a_name"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.col(f"_bid{d}").alias("b_id"),
                        F.col(f"_bnm{d}").alias("b_name"),
                    )
                    for d in range(1, w)
                ]
            )
        ).alias("s"),
    ).select(
        "_grp",
        "rn",
        "a_id",
        "a_name",
        F.col("s.d").alias("_d"),
        F.col("s.b_id").alias("b_id"),
        F.col("s.b_name").alias("b_name"),
    )
    return (
        fan.where(F.col("b_id").isNotNull())
        .join(starts, "_grp")
        .where(F.col("rn") + F.col("_d") > F.col("_start"))
        .withColumn("dist", F.levenshtein("a_name", "b_name"))
        .where(F.col("dist") <= max_dist)
        .select("a_id", "b_id", F.col("dist").cast("long").alias("dist"))
    )
