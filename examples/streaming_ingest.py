"""Streaming corpus ingest demo: documents arrive in micro-batches,
each batch dedups (exact + near-dup) against the growing admitted
corpus — the switchover story for a reference user's ingest scripts.

Run: python examples/streaming_ingest.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_computing_spark.session import get_spark
from distributed_computing_spark.streaming.ingest import CorpusIngestStore

DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def main() -> None:
    spark = get_spark(app_name="ingest-example", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    def doc(i: int, text: str):
        return (i, text, "en", "feed", len(text))

    batches = [
        [  # batch 1: one internal exact duplicate
            doc(1, "the quick brown fox jumps over the lazy dog " * 6),
            doc(2, "pack my box with five dozen liquor jugs today " * 6),
            doc(3, "the quick brown fox jumps over the lazy dog " * 6),
        ],
        [  # batch 2: re-delivery, a near-dup, and a novel doc
            doc(10, "the quick brown fox jumps over the lazy dog " * 6),
            doc(11, "pack my box with five dozen liquor jugs today " * 6 + "extra"),
            doc(12, "sphinx of black quartz judge my vow entirely new " * 6),
        ],
    ]
    src = tempfile.mkdtemp(prefix="ingest_src_")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, DOCS).coalesce(1).write.mode("append").parquet(src)
        for f in os.listdir(src):
            if f.startswith("part-"):
                p = os.path.join(src, f)
                if os.path.getmtime(p) > 1_000_000 + i:
                    os.utime(p, (1_000_000 + i, 1_000_000 + i))

    store = CorpusIngestStore(spark, tempfile.mkdtemp(prefix="ingest_store_"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store.attach(stream, tempfile.mkdtemp(prefix="ingest_ckpt_")).awaitTermination(180)

    print("admitted corpus (6 arrived, duplicates dropped):")
    store.corpus().select("doc_id", "n_chars").orderBy("doc_id").show()


if __name__ == "__main__":
    main()
