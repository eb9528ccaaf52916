"""Similarity search over embedding columns ([EXT], SURVEY §2.9).

- ``cosine_topk``      exact brute-force top-k (the correctness baseline)
- ``lsh_topk``         sign-LSH bucketed approximate top-k (scale path)
- ``embedding_neardup`` cosine-threshold near-duplicate pairs

Scale design: brute force is O(Q·N) — fine when the query set is small
and broadcast; the LSH variant turns it into bucket-local joins. Dot
products stay JVM-side (``F.zip_with``/``F.aggregate``); no Python in
the hot path at 64-dim. For 1k+ dims, swap in the Arrow-batched pandas
UDF (``_pandas_cosine``) which BLAS-vectorizes the inner loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_computing_spark.functions.vectors import (
    cosine,
    lsh_bucket,
    random_hyperplanes,
)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries_bound: int | None = None,
    max_broadcast_queries: int = 2_000_000,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast the (small) query side against the corpus → JVM
    dot products → per-query top-k via window rank. The corpus is never
    shuffled; only (q_id, n_id, sim) rows reach the rank exchange, and
    AQE coalesces them. Self-matches are excluded.

    The query-side broadcast is SIZE-GATED (round 11 — the repo-wide
    VERDICT r10 item-1 rule: a query set taken as a fixed fraction of
    an SF-scaling table out-grows every executor at 100×). Callers
    should pass ``n_queries_bound``, a metadata-only upper bound (e.g.
    the source table's parquet footer count); without it the operator
    pays one ``queries.count()`` job. Above ``max_broadcast_queries``
    the product runs as a partitioned cross join — brute force is
    O(Q·N) either way, and the shuffled form is the one that cannot
    OOM; at that scale prefer ``lsh_topk`` / ``ivf_topk``.
    """
    nq = queries.count() if n_queries_bound is None else n_queries_bound
    q_fits = nq <= max_broadcast_queries
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("nn_vec")
    )
    sims = (
        (c.join(F.broadcast(q)) if q_fits else c.crossJoin(q))
        .where(F.col("q_id") != F.col("nn_id"))
        .select(
            "q_id",
            "nn_id",
            cosine(F.col("q_vec"), F.col("nn_vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "nn_id", "rank")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries_bound: int | None = None,
    max_broadcast_queries: int = 2_000_000,
) -> DataFrame:
    """Approximate top-k: sign-LSH buckets, union over ``n_tables`` tables.

    The query-side broadcast is size-gated (see ``cosine_topk``) —
    above the cap the bucket join shuffles co-partitioned on
    (table, bucket), which stays bucket-local and never OOMs.

    Each table hashes vectors into 2^n_planes buckets with independent
    hyperplanes; candidates = corpus vectors sharing a bucket with the
    query in ANY table; exact cosine re-rank within candidates. Recall
    rises with n_tables, selectivity with n_planes; for sign-LSH the
    per-plane collision prob is 1-θ/π, so 4 planes × 8 tables ≈ 0.66
    recall at cos≈0.3 and ≈1.0 for near-dups (cos≥0.9). Tune n_planes up
    as corpus density grows; cost is bucket-local instead of O(Q·N).
    At 100 TB the corpus-side bucket ids are computed once and written
    bucketed-by(bucket) so query lookups prune to matching buckets.
    """
    # All tables' buckets in ONE pass over each side: an Arrow-batched
    # pandas UDF does a single (batch × dim) @ (dim × tables·planes)
    # GEMM and packs sign bits — a tiny constant plan regardless of
    # n_tables·n_planes (the pure-Column form builds a literal tree of
    # n_tables·n_planes·dim nodes, which measured *slower* than the
    # Arrow round-trip). posexplode then yields (table, bucket) keys so
    # one broadcast join serves every table.
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [p for t in range(n_tables) for p in random_hyperplanes(dim, n_planes, seed=42 + t)]
    )  # (n_tables*n_planes, dim)
    weights = 1 << np.arange(n_planes)
    T, P = n_tables, n_planes

    @pandas_udf("array<long>")
    def bucket_array(vs: pd.Series) -> pd.Series:
        mat = np.array(list(vs), dtype="float64")  # (B, dim)
        bits = (mat @ planes.T) > 0  # (B, T*P)
        vals = (bits.reshape(len(mat), T, P) * weights).sum(axis=2)
        return pd.Series([row.tolist() for row in vals])

    emb_b = embeddings.select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("nn_vec"),
        F.posexplode(bucket_array(F.col(vec_col))).alias("table", "bucket"),
    )
    q_b = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.posexplode(bucket_array(F.col(vec_col))).alias("table", "bucket"),
    )
    # Compute sim BEFORE the (q_id, nn_id) dedup so the dedup+rank
    # shuffles move 24-byte rows, not 2×dim float vectors. A pair found
    # in several tables computes its cosine that many times — cheaper
    # than shipping vectors through two exchanges.
    nq = queries.count() if n_queries_bound is None else n_queries_bound
    q_side = F.broadcast(q_b) if nq <= max_broadcast_queries else q_b
    emb_side = (
        emb_b if nq <= max_broadcast_queries else emb_b.hint("shuffle_hash")
    )
    sims = (
        emb_side.join(q_side, ["table", "bucket"])
        .where(F.col("q_id") != F.col("nn_id"))
        .select("q_id", "nn_id", cosine(F.col("q_vec"), F.col("nn_vec")).alias("sim"))
        .dropDuplicates(["q_id", "nn_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "nn_id", "rank", F.round("sim", 6).alias("sim"))
    )


def lsh_topk_exact(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    scale: int = 1000,
    seed: int = 7,
    bound: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries_bound: int | None = None,
    max_broadcast_queries: int = 2_000_000,
) -> DataFrame:
    """ORACLE-EXACT LSH top-k: cross-engine-reproducible buckets.

    The query-side broadcast is size-gated (see ``cosine_topk``) with
    a bucket-local shuffle-hash fallback.

    Same topology as ``lsh_topk`` (bucket → candidate join → exact
    cosine re-rank) but the bucketing is exact INTEGER arithmetic:
    quantize each vector to ``floor(v*scale)`` BIGINTs, dot against
    integer hyperplanes (``int_hyperplanes`` — plain LCG both the
    query builder AND the registry's SQL generator call), bit =
    [dot > 0]. Every engine computes identical buckets, so a DuckDB
    oracle can rebuild the candidate sets and the result is a strict
    hash-gated query — the bridge between the rows-only approximate
    family and the exact family. One table (union-of-tables recall is
    ``lsh_topk``'s job); output is (q_id, nn_id, rank), rank-only like
    ``cosine_topk`` so float sims never reach the gate hash.
    """
    from distributed_computing_spark.functions.vectors import (
        int_hyperplanes,
        int_lsh_bucket,
    )

    planes = int_hyperplanes(dim, n_planes, seed=seed, bound=bound)
    c = embeddings.select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("nn_vec"),
        int_lsh_bucket(F.col(vec_col), planes, scale).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        int_lsh_bucket(F.col(vec_col), planes, scale).alias("bucket"),
    )
    nq = queries.count() if n_queries_bound is None else n_queries_bound
    q_side = F.broadcast(q) if nq <= max_broadcast_queries else q
    c_side = c if nq <= max_broadcast_queries else c.hint("shuffle_hash")
    sims = (
        c_side.join(q_side, "bucket")
        .where(F.col("q_id") != F.col("nn_id"))
        .select("q_id", "nn_id", cosine(F.col("q_vec"), F.col("nn_vec")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "nn_id", "rank")
    )


def ivf_topk_exact(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries_bound: int | None = None,
    max_broadcast_queries: int = 2_000_000,
) -> DataFrame:
    """ORACLE-EXACT IVF top-k: the full IVF machinery — coarse
    quantize → inverted lists → probe-time list pruning → exact
    re-rank — with a DETERMINISTIC codebook, so a DuckDB oracle
    reproduces assignments, probe sets, and ranks exactly (the strict-
    gated bridge for the IVF family, cf. ``lsh_topk_exact`` for LSH).

    Codebook = the ``n_lists`` lowest-id vectors (sampled-centroid
    init, no Lloyd iterations — k-means refinement is what makes
    ``ivf_topk`` engine-specific). Assignment = argmax cosine against
    the broadcast codebook, ties to the lowest centroid id, expressed
    as a max-of-struct aggregate (partial-agg friendly: no per-vector
    window sort rides the corpus). Each query probes its ``n_probe``
    nearest lists; candidates re-rank by exact cosine. Sequential-fold
    float parity with DuckDB's ``list_cosine_similarity`` is the same
    contract ``cosine_topk`` already gates. Output (q_id, nn_id, rank),
    rank-only so float sims never reach the gate hash.
    """
    cents = (
        embeddings.orderBy(id_col)
        .limit(n_lists)
        .select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    )
    asgn = (
        embeddings.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("nn_vec"))
        .crossJoin(F.broadcast(cents))
        .select(
            "nn_id",
            "c_id",
            cosine(F.col("nn_vec"), F.col("c_vec")).alias("csim"),
        )
    )
    lists = asgn.groupBy("nn_id").agg(
        F.max(F.struct(F.col("csim"), (-F.col("c_id")).alias("nci"))).alias("m")
    ).select("nn_id", (-F.col("m.nci")).alias("list_id"))
    q_asgn = asgn.join(
        queries.select(F.col(id_col).alias("nn_id")), "nn_id", "left_semi"
    ).select(F.col("nn_id").alias("q_id"), "c_id", "csim")
    wq = Window.partitionBy("q_id").orderBy(F.col("csim").desc(), F.col("c_id"))
    probes = (
        q_asgn.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= n_probe)
        .select("q_id", F.col("c_id").alias("list_id"))
    )
    # each corpus vector lives in exactly one list → no (q, nn) dups
    cand = probes.join(lists, "list_id").where(F.col("q_id") != F.col("nn_id"))
    qv = embeddings.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    nv = embeddings.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("nn_vec"))
    nq = queries.count() if n_queries_bound is None else n_queries_bound
    q_vecs = qv.join(
        queries.select(F.col(id_col).alias("q_id")), "q_id", "left_semi"
    )
    # size-gated (see cosine_topk): above the cap the q_id join
    # shuffles co-partitioned instead of broadcasting query vectors
    q_vec_side = F.broadcast(q_vecs) if nq <= max_broadcast_queries else q_vecs
    sims = (
        cand.join(q_vec_side, "q_id")
        .join(nv, "nn_id")
        .select("q_id", "nn_id", cosine(F.col("q_vec"), F.col("nn_vec")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "nn_id", "rank")
    )


def _ivf_centroids(
    embeddings: DataFrame,
    n_lists: int,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF codebook: seed with the ``n_lists`` corpus
    vectors of smallest ``hash(id)`` (a reproducible pseudo-random
    sample), then refine with ``n_iter`` distributed Lloyd steps.

    The per-list mean is computed by posexplode → groupBy(list, pos) →
    avg: N·dim skinny rows through one shuffle, no vector ever
    collected per-list — this is the 100 TB-safe k-means step. Only the
    (n_lists × dim) codebook reaches the driver.
    """
    seeds = (
        embeddings.select(
            F.col(vec_col).alias("v"),
            F.hash(F.col(id_col)).alias("h"),
            F.col(id_col).alias("_id"),
        )
        .orderBy("h", "_id")  # id tiebreak: hash collisions must not
        .limit(n_lists)       # make the codebook partition-dependent
        .collect()
    )
    cents = np.array([r["v"] for r in seeds], dtype="float64")
    cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12
    for _ in range(n_iter):
        assign = _list_assign_udf(cents)
        means = (
            embeddings.select(
                assign(F.col(vec_col)).alias("list"),
                F.posexplode(vec_col).alias("pos", "x"),
            )
            .groupBy("list", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("list")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("a"))
            .select("list", F.transform("a", lambda s: s["m"]).alias("mean"))
            .collect()
        )
        for r in means:
            v = np.array(r["mean"], dtype="float64")
            n = np.linalg.norm(v)
            if n > 0:
                cents[r["list"]] = v / n
    return cents


def _list_assign_udf(cents: np.ndarray):
    """pandas_udf: vector → nearest-centroid list id (one GEMM/batch)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        mat = np.array(list(vs), dtype="float64")
        mat /= np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12
        return pd.Series((mat @ cents.T).argmax(axis=1)).astype("int32")

    return assign


def _list_probe_udf(cents: np.ndarray, n_probe: int):
    """pandas_udf: query vector → its ``n_probe`` nearest list ids."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def probe(vs: pd.Series) -> pd.Series:
        mat = np.array(list(vs), dtype="float64")
        mat /= np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12
        idx = np.argsort(-(mat @ cents.T), axis=1)[:, :n_probe]
        return pd.Series([row.tolist() for row in idx])

    return probe


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries_bound: int | None = None,
    max_broadcast_queries: int = 2_000_000,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning.

    The query-side broadcast is size-gated (see ``cosine_topk``) with
    a list-local shuffle-hash fallback.

    Corpus vectors are assigned to their nearest of ``n_lists``
    k-means centroids; each query probes its ``n_probe`` closest lists
    and exact-reranks only those candidates — cost drops from O(Q·N) to
    O(Q·N·n_probe/n_lists) plus one tiny codebook broadcast.

    At 100 TB the assignment runs once at ingest and the corpus is
    written ``partitionBy("list")`` (or bucketed), so a probe prunes to
    n_probe partitions at the parquet scan — the Spark-native analog of
    a FAISS IVF index. Recall rises with n_probe (= n_lists recovers
    exact brute force).
    """
    cents = _ivf_centroids(embeddings, n_lists, id_col=id_col, vec_col=vec_col)
    assign = _list_assign_udf(cents)
    probe = _list_probe_udf(cents, n_probe)
    corpus = embeddings.select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("nn_vec"),
        assign(F.col(vec_col)).alias("list"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe(F.col(vec_col))).alias("list"),
    )
    nq = queries.count() if n_queries_bound is None else n_queries_bound
    q_side = F.broadcast(q) if nq <= max_broadcast_queries else q
    corpus_side = (
        corpus if nq <= max_broadcast_queries else corpus.hint("shuffle_hash")
    )
    cand = (
        corpus_side.join(q_side, "list")
        .where(F.col("q_id") != F.col("nn_id"))
        .select("q_id", "nn_id", cosine(F.col("q_vec"), F.col("nn_vec")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "nn_id", "rank")
    )


def ivf_write_index(
    embeddings: DataFrame,
    path: str,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Materialize the IVF index: corpus assigned to lists and written
    ``partitionBy("list")`` — the ingest-time half of IVF at scale.
    Returns the codebook (the only driver-side artifact; persist it
    alongside the index). Queries against the written index prune to
    their probed lists AT THE SCAN (PartitionFilters) — the Spark-
    native analog of reading only n_probe inverted lists.
    """
    cents = _ivf_centroids(embeddings, n_lists, id_col=id_col, vec_col=vec_col)
    assign = _list_assign_udf(cents)
    (
        embeddings.select(
            F.col(id_col).alias("nn_id"),
            F.col(vec_col).alias("nn_vec"),
            assign(F.col(vec_col)).alias("list"),
        )
        .write.mode("overwrite")
        .partitionBy("list")
        .parquet(path)
    )
    return cents


def ivf_append_index(
    new_vectors: DataFrame,
    path: str,
    cents: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Index maintenance: assign NEW vectors with the existing codebook
    and append to their list partitions — no rebuild, no read of the
    existing index. (Re-train the codebook only when drift degrades
    recall; the assignment is append-only until then.)"""
    assign = _list_assign_udf(cents)
    (
        new_vectors.select(
            F.col(id_col).alias("nn_id"),
            F.col(vec_col).alias("nn_vec"),
            assign(F.col(vec_col)).alias("list"),
        )
        .write.mode("append")
        .partitionBy("list")
        .parquet(path)
    )


def ivf_query_index(
    spark,
    path: str,
    cents: np.ndarray,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries_bound: int | None = None,
    max_broadcast_queries: int = 2_000_000,
) -> DataFrame:
    """Search a persisted IVF index: probe lists per query, scan ONLY
    those partitions (filter on the partition column prunes the read),
    exact cosine re-rank within candidates. The query-side broadcast
    is size-gated (see ``cosine_topk``) with a list-local shuffle-hash
    fallback."""
    probe = _list_probe_udf(cents, n_probe)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe(F.col(vec_col))).alias("list"),
    )
    # the probed-list set must reach the scan as a LITERAL predicate —
    # a join condition alone doesn't prune partitions. Bounded collect:
    # ≤ n_lists values.
    probed = sorted({r["list"] for r in q.select("list").distinct().collect()})
    corpus = spark.read.parquet(path).where(F.col("list").isin(probed))
    nq = queries.count() if n_queries_bound is None else n_queries_bound
    q_side = F.broadcast(q) if nq <= max_broadcast_queries else q
    corpus_side = (
        corpus if nq <= max_broadcast_queries else corpus.hint("shuffle_hash")
    )
    cand = (
        corpus_side.join(q_side, "list")
        .where(F.col("q_id") != F.col("nn_id"))
        .select("q_id", "nn_id", cosine(F.col("q_vec"), F.col("nn_vec")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "nn_id", "rank")
    )


def embedding_neardup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """[EXT] embedding-cosine near-duplicate pairs (a < b, sim ≥ t) —
    EXACT, via blocked all-pairs GEMM.

    Vectors hash into ``n_blocks`` blocks; every unordered block pair
    (i ≤ j) is one ``applyInPandas`` group that runs a single BLAS GEMM
    between its two blocks and emits only the qualifying id pairs. Each
    unordered vector pair lives in exactly one group (same-block groups
    take the strict upper triangle), so no dedup pass is needed. The
    plan is replicate(×n_blocks) → one hash exchange → grouped GEMM:
    no nested-loop join, and the only rows ever materialized are the
    qualifying pairs themselves.

    Scale: exact threshold joins are inherently O(N²) *flops*; this
    shape keeps them inside BLAS (≈free up to ~10⁷ vectors per corpus
    shard — size ``n_blocks`` so a block pair, 2N/B vectors, fits an
    executor) while the shuffle stays O(N·B) skinny rows. Past that,
    drop the exactness contract and use ``lsh_topk``-style banding;
    on THIS data LSH cannot hold an exact oracle (qualifying sims
    start at 0.4501 with bulk pairs at 0.40 — no gap to tune into).
    Output keeps ids only; sims are recomputed cheaply when needed.
    """
    t = float(threshold)
    id_out = "a long, b long"

    def block_pairs(key, pdf):
        bi, bj = int(key[0]), int(key[1])
        ids = pdf["_id"].to_numpy()
        mat = np.array(list(pdf["_vec"]), dtype="float64")
        mat /= np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12
        if bi == bj:
            sims = mat @ mat.T
            ii, jj = np.nonzero(np.triu(sims >= t, k=1))
            a, b = ids[ii], ids[jj]
        else:
            left = pdf["_blk"].to_numpy() == bi
            la, lb = mat[left], mat[~left]
            if not len(la) or not len(lb):
                return pd.DataFrame({"a": [], "b": []}, dtype="int64")
            sims = la @ lb.T
            ii, jj = np.nonzero(sims >= t)
            a, b = ids[left][ii], ids[~left][jj]
        # dtype pins (CLAUDE.md r11): a/b are int64 ndarrays today, but
        # an above-threshold-free block emits zero rows — pin so the
        # declared long schema never meets an inferred float64 frame.
        return pd.DataFrame(
            {
                "a": pd.Series(np.minimum(a, b), dtype="int64"),
                "b": pd.Series(np.maximum(a, b), dtype="int64"),
            }
        )

    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    rep = (
        embeddings.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"), blk.alias("_blk")
        )
        .select(
            "*",
            F.explode(F.array(*[F.lit(p) for p in range(n_blocks)])).alias("_p"),
        )
        .select(
            "_id",
            "_vec",
            "_blk",
            F.least("_blk", "_p").alias("bi"),
            F.greatest("_blk", "_p").alias("bj"),
        )
    )
    return rep.groupBy("bi", "bj").applyInPandas(block_pairs, id_out)


def cosine_topk_gemm(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy brute-force top-k: mapInPandas matrix-multiply.

    Collects the query block once (fine while Q·dim fits in memory —
    the broadcast contract), then each corpus Arrow batch does one BLAS
    GEMM. Measured ~3.5x over the JVM ``F.aggregate`` fold at dim=64
    (higher-order array functions aren't vectorized); the gap widens
    with dim. This is the registry's exact-ANN path; ``cosine_topk``
    stays as the all-JVM reference implementation.
    """
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        return embeddings.sparkSession.createDataFrame(
            [], "q_id long, nn_id long, rank int"
        )
    q_ids = np.array([r[id_col] for r in q_rows])
    q_mat = np.array([r[vec_col] for r in q_rows], dtype="float64")
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True) + 1e-12

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                # an empty Arrow batch would make the 1-D empty ndarray
                # below throw on axis=1 (CLAUDE.md r11 shape class)
                continue
            mat = np.array(list(pdf[vec_col]), dtype="float64")
            mat /= np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12
            sims = mat @ q_mat.T  # (batch, Q)
            nn = pdf[id_col].to_numpy()
            n = sims.shape[0]
            # PARTIAL top-k inside the batch (map-side combine for
            # rank): only Q·k candidate rows per batch reach the
            # exchange, not Q·batch — the shuffle no longer scales with
            # corpus size. argpartition then exact sort of k items,
            # nn_id ascending on sim ties (matches the window order).
            kk = min(k + 1, n)  # +1 headroom: a self-match drops later
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
            out_q, out_nn, out_sim = [], [], []
            for j in range(sims.shape[1]):
                idx = part[:, j]
                order = np.lexsort((nn[idx], -sims[idx, j]))
                sel = idx[order]
                out_q.append(np.full(len(sel), q_ids[j]))
                out_nn.append(nn[sel])
                out_sim.append(sims[sel, j])
            yield pd.DataFrame(
                {
                    "q_id": pd.Series(
                        np.concatenate(out_q), dtype="int64"
                    ),
                    "nn_id": pd.Series(
                        np.concatenate(out_nn), dtype="int64"
                    ),
                    "sim": pd.Series(
                        np.concatenate(out_sim), dtype="float64"
                    ),
                }
            )

    sims = embeddings.select(id_col, vec_col).mapInPandas(
        score, schema="q_id long, nn_id long, sim double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id"))
    return (
        sims.where(F.col("q_id") != F.col("nn_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "nn_id", "rank")
    )


# ---------------------------------------------------------------------------
# Integer-exact k-means (Lloyd's) over quantized embeddings
# ---------------------------------------------------------------------------


def kmeans_quantized(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    force_gemm: bool | None = None,
    return_trace: bool = False,
):
    """Lloyd's k-means made bit-exact across engines: vectors quantize
    to NON-NEGATIVE longs (``floor(v * scale) + 2*scale`` — floor is
    toward -inf in both Spark and DuckDB, and the +2·scale shift is an
    exact long translation under which squared distances and the
    argmin are invariant), distances are integer sums, centroid
    updates are integer division of non-negative sums (where floor ==
    truncate, so Spark ``div``, DuckDB ``//`` of EVERY version, and
    Python ``//`` all agree — round 7 proved division-semantics bugs
    can't be ruled out while any operand can go negative, so round 8
    removes the negative class entirely; the shift is checked at
    runtime, not assumed), ties in the argmin break to the lowest
    cluster id, and an emptied cluster keeps its previous centroid.
    With every step a pure integer function of the inputs, the whole
    iteration reproduces in generated unrolled-CTE SQL — the
    PageRank/BPE trick applied to iterative ML.

    Seeding: the k lowest ``id_col`` rows (deterministic; k-means++
    would need engine-matched randomness for no gate value).

    Scale shape: vertex state is the k×d centroid table (a few KB) —
    collected and re-broadcast as LITERAL expressions each round, so
    one Lloyd round is a map-side assignment pass (zip_with/aggregate
    over the vector column against k literal arrays — no join, no
    shuffle) plus ONE partial-aggregated groupBy(cluster) whose output
    is k×d longs. Driver state is bounded by k·d·n_iter, the same
    contract as BPE's per-round argmax collect. The quantized vector
    table is persisted once; nothing vector-sized ever exchanges.

    Returns (assignments DataFrame (id, cluster, dist), centroids
    dict {cluster: [long]*d}; when ``return_trace`` is set, a third
    element: the list of per-round centroid dicts, ``trace[0]`` the
    seeds and ``trace[t]`` after the t-th update — bounded k·d·n_iter
    driver state, the BPE per-round-collect contract). Overflow audit:
    shifted coords lie in [0, 4·scale] for v in [-2, 2] (checked),
    squared diffs <= (4·scale)², times d — keep (4·scale)²·d < 2^62
    (guarded).
    """
    from distributed_computing_spark.caching import track_persist

    d_probe = embeddings.select(
        F.size(F.col(vec_col)).alias("d")
    ).limit(1).collect()
    if not d_probe:
        raise ValueError("empty embeddings input")
    dim = d_probe[0]["d"]
    if (4 * scale) ** 2 * dim >= 1 << 62:
        raise ValueError("scale too large: (4*scale)^2 * dim must stay under 2^62")

    shift = 2 * scale
    q = embeddings.select(
        id_col,
        F.transform(
            F.col(vec_col),
            lambda v: F.floor(v.cast("double") * F.lit(float(scale))).cast(
                "long"
            )
            + F.lit(shift).cast("long"),
        ).alias("q"),
    )
    q = track_persist(q)
    # ONE bounded setup aggregate (round-12 optimization: the separate
    # count() and bounds jobs each paid a full job round-trip; fused
    # they materialize the persist once and return 1 row): the row
    # count dispatches the assignment path, and the non-negative
    # contract is CHECKED, not assumed.
    setup = q.select(
        F.count(F.lit(1)).alias("n"),
        F.min(F.array_min("q")).alias("lo"),
        F.max(F.array_max("q")).alias("hi"),
    ).collect()[0]
    n_rows = setup["n"]
    bounds = setup
    if bounds["lo"] < 0 or bounds["hi"] > 4 * scale:
        raise ValueError(
            "embedding values outside [-2, 2]: shifted quantization "
            f"left range [{bounds['lo']}, {bounds['hi']}] — raise the "
            "shift or pre-normalize"
        )
    seed_rows = q.orderBy(id_col).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(seed_rows)}")
    cents = {j: list(r["q"]) for j, r in enumerate(seed_rows)}

    # Assignment dispatch (measured, 100k x 64, k=8, local[8]): the
    # JVM zip_with/aggregate HOF runs 3.9 s/pass (interpreted per
    # element, O(k*d) per row), the Arrow int64 GEMM
    # (x^2 + c^2 - 2xC^T, argmin ties to lowest index) 2.1 s/pass —
    # bit-identical outputs (integer arithmetic both sides). Below the
    # work threshold the JVM path wins by skipping Python worker
    # startup; above it the GEMM path scales with BLAS-style batch
    # throughput. Same enforced-dispatch discipline as
    # dedup.decontaminate's broadcast contract.
    # Round-12 re-measure: with WARM Python workers (any pipeline that
    # has already run one Arrow query — the bench and the gate both
    # do) the GEMM path wins from far smaller inputs: at 2000×64, k=8
    # (n·k·d ≈ 1.0M) five GEMM rounds run 1.7-3.7 s vs 7.0-10.5 s
    # interpreted (the HOF's per-element lambda never codegens). The
    # threshold drops 10M → 500k; below it (the sf0.01 gate tier,
    # n·k·d ≈ 100k) the JVM path still avoids a cold worker spin-up.
    use_gemm = (
        force_gemm
        if force_gemm is not None
        else n_rows * k * dim > 500_000
    )

    def _gemm_consts():
        import numpy as np

        C = np.array([cents[j] for j in range(k)], dtype=np.int64)
        return C, (C * C).sum(1)

    def _assigned(with_q: bool = True):
        # ``with_q=False`` (round-12 optimization): the RETURNED frame
        # never uses q — the old shape declared q in the mapInPandas
        # schema and .drop()'d it after, which still ships every
        # vector back across the Arrow boundary (opaque schema: no
        # column pruning into a Python map). Emitting (id, cluster,
        # dist) only halves the final pass's JVM←Python transfer.
        if use_gemm:
            import numpy as np
            import pandas as pd

            C, c2 = _gemm_consts()

            def assign(batches):
                for p in batches:
                    if not len(p):
                        continue  # np.stack throws on an empty batch
                    X = np.stack(p["q"].values).astype(np.int64)
                    x2 = (X * X).sum(1)
                    d2 = x2[:, None] + c2[None, :] - 2 * (X @ C.T)
                    j = d2.argmin(1)  # first min = lowest cluster id
                    out = {id_col: p[id_col]}
                    if with_q:
                        out["q"] = p["q"]
                    out["cluster"] = j.astype("int32")
                    out["dist"] = d2[np.arange(len(j)), j]
                    yield pd.DataFrame(out)

            schema_q = ", q array<long>" if with_q else ""
            return q.mapInPandas(
                assign,
                f"{id_col} long{schema_q}, cluster int, dist long",
            )
        dist_cols = [
            F.aggregate(
                F.zip_with(
                    F.col("q"),
                    F.array(*[F.lit(x).cast("long") for x in cents[j]]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, e: acc + e,
            )
            for j in range(k)
        ]
        dists = F.array(*dist_cols)
        cols = [id_col, "q"] if with_q else [id_col]
        return q.select(
            *cols,
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cluster"),
            F.array_min(dists).alias("dist"),
        )

    def _cluster_sums():
        """One Lloyd update's (cluster, dim) → (Σx, n) rows.

        GEMM path (round-12 optimization): the assignment AND the
        per-cluster coordinate sums fuse into ONE mapInPandas pass
        emitting k×d-bounded PARTIAL sums per batch — the map-side
        combine moved inside the Arrow stage. The old shape shipped
        every (id, q, cluster, dist) row back to the JVM (|n|·d longs
        per round across the Arrow boundary) and then posexploded to
        |n|·d rows before the partial aggregate; sums of longs are
        order-independent, so batch-partials then F.sum reproduce the
        exact same integers. Clusters absent from a batch emit no row
        (empty keeps previous centroid, as before)."""
        if use_gemm:
            import numpy as np
            import pandas as pd

            C, c2 = _gemm_consts()

            def partial_sums(batches):
                S = np.zeros((k, dim), dtype=np.int64)
                cnt = np.zeros(k, dtype=np.int64)
                for p in batches:
                    if not len(p):
                        continue
                    X = np.stack(p["q"].values).astype(np.int64)
                    x2 = (X * X).sum(1)
                    d2 = x2[:, None] + c2[None, :] - 2 * (X @ C.T)
                    j = d2.argmin(1)
                    np.add.at(S, j, X)
                    cnt += np.bincount(j, minlength=k)
                present = np.flatnonzero(cnt)
                yield pd.DataFrame(
                    {
                        "cluster": pd.Series(
                            np.repeat(present, dim), dtype="int32"
                        ),
                        "dim": pd.Series(
                            np.tile(np.arange(dim), len(present)),
                            dtype="int32",
                        ),
                        "sx": pd.Series(S[present].ravel(), dtype="int64"),
                        "n": pd.Series(
                            np.repeat(cnt[present], dim), dtype="int64"
                        ),
                    }
                )

            return (
                q.select("q")
                .mapInPandas(
                    partial_sums, "cluster int, dim int, sx long, n long"
                )
                .groupBy("cluster", "dim")
                .agg(F.sum("sx").alias("sx"), F.sum("n").alias("n"))
                .collect()
            )
        return (
            _assigned()
            .select("cluster", F.posexplode("q").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
            .collect()
        )

    trace = [dict(cents)]
    for _ in range(n_iter - 1):
        sums = _cluster_sums()
        new = {j: list(cents[j]) for j in range(k)}  # empty keeps old
        for r in sums:
            # sums of SHIFTED coords are non-negative (checked above),
            # where Python //, Spark div and every DuckDB version's //
            # coincide — no division-semantics surface left
            sx, n = r["sx"], r["n"]
            if sx < 0:
                raise AssertionError(
                    "negative centroid sum despite shifted coords"
                )
            new[r["cluster"]][r["dim"]] = sx // n
        cents = new
        trace.append(dict(cents))
    if return_trace:
        return _assigned(with_q=False), cents, trace
    return _assigned(with_q=False), cents


def _kmeans_cte_parts(
    k: int, n_rounds: int, scale: int, last_centroid: int
) -> list[str]:
    """Shared CTE chain for the kmeans oracle and its trace oracles:
    q (shifted quantization), c0 (seeds), then per round t a distance
    CTE d{t}, assignment a{t}, and — for t <= last_centroid — the
    updated centroid table c{t}.  Every multiply-referenced CTE is
    MATERIALIZED (CLAUDE.md rule).

    Round 8: coordinates carry the same +2·scale shift as the
    operator, making every centroid sum non-negative, where flooring
    and truncating integer division coincide — no DuckDB version's
    ``//`` semantics can enter.  The sign-explicit CASE from round 7
    is kept anyway (its ELSE branch is now unreachable): belt and
    suspenders, and tests/test_oracle_portability.py keeps proving the
    chain engine-invariant under a floored-division stand-in."""
    shift = 2 * scale
    parts = [
        f"""q AS MATERIALIZED (
  SELECT vec_id, dim,
         CAST(floor(CAST(v AS DOUBLE) * {scale}.0) AS BIGINT) + {shift} AS x
  FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
               unnest(embedding) AS v
        FROM embeddings)),
c0 AS MATERIALIZED (
  SELECT CAST(dense_rank() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
         dim, x AS cx
  FROM q
  WHERE vec_id IN (SELECT vec_id FROM (
          SELECT DISTINCT vec_id FROM q ORDER BY vec_id LIMIT {k})))"""
    ]
    for t in range(1, n_rounds + 1):
        parts.append(
            f"""d{t} AS (
  SELECT q.vec_id, c.cluster,
         sum((q.x - c.cx) * (q.x - c.cx)) AS dist
  FROM q JOIN c{t - 1} c ON q.dim = c.dim
  GROUP BY q.vec_id, c.cluster),
a{t} AS MATERIALIZED (
  SELECT vec_id, cluster, CAST(dist AS BIGINT) AS dist FROM (
    SELECT vec_id, cluster, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM d{t})
  WHERE rn = 1)"""
        )
        if t <= last_centroid:
            parts.append(
                f"""c{t} AS MATERIALIZED (
  SELECT p.cluster, p.dim,
         CASE WHEN s.n IS NULL THEN p.cx
              WHEN s.sx >= 0 THEN CAST(s.sx // s.n AS BIGINT)
              ELSE CAST(-((-s.sx) // s.n) AS BIGINT) END AS cx
  FROM c{t - 1} p LEFT JOIN (
    SELECT a.cluster, q.dim, sum(q.x) AS sx, count(*) AS n
    FROM a{t} a JOIN q ON q.vec_id = a.vec_id
    GROUP BY a.cluster, q.dim) s
  ON p.cluster = s.cluster AND p.dim = s.dim)"""
            )
    return parts


def kmeans_oracle_sql(
    k: int = 8, n_iter: int = 5, scale: int = 10**6
) -> str:
    """Generated unrolled-CTE oracle for ``kmeans_embeddings``: each
    Lloyd round is one assignment CTE + one centroid CTE (see
    ``_kmeans_cte_parts`` for the non-negative-shift contract).

    ``wss`` ships as the CANONICAL DIGIT STRING, not DECIMAL: the
    round-8 driver bisect proved DECIMAL(38,0) final columns value-hash
    differently in the driver environment than in both local engines
    (every all-BIGINT trace green, the decimal aggregate red — VERDICT
    r8 item 1). The sum itself still rides HUGEINT/DECIMAL internally
    (replica tiers push it past 2^63, so BIGINT output is not safely
    bounded); non-negative integers render identically on both
    engines."""
    parts = _kmeans_cte_parts(k, n_iter, scale, last_centroid=n_iter - 1)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
       CAST(CAST(sum(dist) AS HUGEINT) AS VARCHAR) AS wss
FROM a{n_iter} GROUP BY cluster ORDER BY cluster"""
    )


def kmeans_trace_centroid_sql(
    t: int, k: int = 8, scale: int = 10**6
) -> str:
    """Oracle for the ``kmeans_trace_c{t}`` driver-bisect queries: the
    (cluster, dim, cx) centroid table after t Lloyd updates, a strict
    PREFIX of the kmeans_embeddings CTE chain (VERDICT r7 item 1b: if
    the driver's kmeans row stays red, the first red trace round
    localizes the divergent update step driver-side).  ``dim`` is
    re-based to 0 to match the operator's posexplode numbering."""
    parts = _kmeans_cte_parts(k, t, scale, last_centroid=t)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT cluster, CAST(dim - 1 AS INT) AS dim, CAST(cx AS BIGINT) AS cx
FROM c{t} ORDER BY cluster, dim"""
    )


def kmeans_trace_assign_sql(t: int, k: int = 8, scale: int = 10**6) -> str:
    """Oracle for ``kmeans_trace_a{t}``: the full (vec_id, cluster,
    dist) assignment after round t — splits an assignment-step
    divergence from a centroid-update one in the driver bisect."""
    parts = _kmeans_cte_parts(k, t, scale, last_centroid=t - 1)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, cluster, dist FROM a{t} ORDER BY vec_id"""
    )
