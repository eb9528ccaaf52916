"""Run a Structured Streaming pipeline to completion as a batch query.

This is the registry/correctness bridge: each streaming operator
(windows.py, kv_stream.py) is executed with ``Trigger.AvailableNow``
over a bounded file source and its final result returned as a batch
DataFrame, so the DuckDB oracle gate covers the *streaming* execution
path (stateful aggregation, micro-batch apply), not just the batch
twin. On a real cluster the same pipelines run unbounded — only the
trigger and sink differ.

Memory-sink note: aggregation queries run in ``complete`` mode so every
window is emitted at end-of-stream; ``append`` mode would hold back
windows newer than the final watermark, which for a bounded replay
means silently dropping the tail.
"""

from __future__ import annotations

import itertools
from distributed_computing_spark.caching import session_tmpdir

from pyspark.sql import DataFrame, SparkSession

_name_counter = itertools.count()


def run_to_batch(
    stream_df: DataFrame,
    spark: SparkSession,
    output_mode: str = "complete",
    timeout_s: int = 300,
) -> DataFrame:
    """Execute a (bounded) streaming DataFrame with AvailableNow into a
    memory sink; return the sink's contents as a batch DataFrame."""
    name = f"stream_out_{next(_name_counter)}"
    ckpt = session_tmpdir(prefix="dcs_ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return spark.table(name)


_STAGED: dict[tuple, str] = {}


def _staging_key(spark: SparkSession, df: DataFrame) -> tuple | None:
    """Identity of a file-backed frame for staging reuse: the
    canonicalized analyzed plan (expr-id-normalized, so two
    load_table().where(...) builds of the same transform match) plus
    the source files' (uri, mtime, size). Returns None for frames the
    key cannot pin exactly (in-memory tests, unstattable files) —
    those always stage fresh."""
    import os

    try:
        files = sorted(df.inputFiles())
        if not files:
            return None
        stats = []
        for uri in files:
            path = uri[7:] if uri.startswith("file://") else uri
            path = path if path.startswith("/") else "/" + path.lstrip("/")
            st = os.stat(path)
            stats.append((uri, int(st.st_mtime_ns), st.st_size))
        analyzed = df._jdf.queryExecution().analyzed()
        return (
            spark.sparkContext.applicationId,
            analyzed.canonicalized().toString(),
            analyzed.semanticHash(),
            df.schema.json(),
            tuple(stats),
        )
    except Exception:
        return None


def stream_table(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Re-expose a batch DataFrame as a bounded stream: materialize to a
    temp parquet dir and ``readStream`` it with the same schema. The
    registry uses this to drive streaming operators from the shared
    parquet test tables (whose nanos timestamps need the catalog's
    batch-side conversion first).

    Round-13 (VERDICT r12 item 7): the staged source is memoized per
    (session, canonical plan, source files+mtimes+sizes) — a gate run
    drives ~15 stream queries off the SAME events frame, and each used
    to re-write the identical staging parquet (~0.4 s/query measured
    at sf0.01). The memo is process-lifetime only (the tempdir dies at
    interpreter exit — nothing persists across runs); any frame whose
    identity can't be pinned exactly stages fresh."""
    key = _staging_key(spark, df)
    src = _STAGED.get(key) if key is not None else None
    if src is None:
        src = session_tmpdir(prefix="dcs_streamsrc_")
        df.write.mode("overwrite").parquet(src)
        if key is not None:
            _STAGED[key] = src
    return spark.readStream.schema(df.schema).parquet(src)


def stream_in_seq_batches(
    spark: SparkSession,
    df: DataFrame,
    n: int = 3,
    order_col: str = "seq",
) -> DataFrame:
    """Replay ``df`` as a file-source stream of exactly ``n``
    micro-batches split by ``order_col`` range (batch i covers the i-th
    n-tile of [0, max]).

    The file source orders new files by modification time, so each
    chunk's mtime is pinned strictly increasing — write-completion
    times could tie, which would scramble replay order (CLAUDE.md
    file-source-ordering invariant). With ``maxFilesPerTrigger=1`` the
    chunks arrive one per micro-batch, in ``order_col`` order.
    """
    import glob
    import os
    from distributed_computing_spark.caching import session_tmpdir
    import time

    from pyspark.sql import functions as F

    max_val = df.agg(F.max(order_col)).collect()[0][0]
    src = session_tmpdir(prefix="dcs_seqsrc_")
    now = time.time()
    stamped: set[str] = set()
    bounds = [
        (i * max_val // n + (1 if i else 0), (i + 1) * max_val // n)
        for i in range(n)
    ]
    bounds[-1] = (bounds[-1][0], max_val)
    for i, (lo, hi) in enumerate(bounds):
        df.where(F.col(order_col).between(lo, hi)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        for f in glob.glob(f"{src}/part-*"):
            if f not in stamped:
                os.utime(f, (now + i, now + i))
                stamped.add(f)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
