"""Streaming corpus ingest with incremental deduplication.

The production 100 TB pipeline shape: documents arrive as a stream;
each micro-batch is deduplicated (exact, then MinHash near-dup) BOTH
against the already-admitted corpus index AND within itself, survivors
are appended to the corpus and their signatures to the index. The
signature index is the only state, it grows with the *unique* corpus,
and every batch's work is proportional to the batch — the corpus is
never re-shingled (dedup.minhash_incremental_pairs).

Exactly-once: foreachBatch + checkpoint give atomic per-batch apply;
an exact re-delivered batch dedups against the index like any other
duplicate content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_computing_spark.operators.dedup import (
    _band_rows,
    fingerprint,
    minhash_signatures,
)


class CorpusIngestStore:
    """Admitted-corpus + signature-index state (parquet-backed, same
    swap discipline as kv_stream.KVTableStore)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.corpus_dir = os.path.join(root, "corpus")
        self.sig_dir = os.path.join(root, "sigs")
        self.fp_dir = os.path.join(root, "fps")

    def _read(self, path: str, schema: str) -> DataFrame:
        if os.path.exists(path):
            return self.spark.read.parquet(path)
        return self.spark.createDataFrame([], schema)

    def corpus(self) -> DataFrame:
        return self._read(
            self.corpus_dir,
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    def admit_batch(
        self,
        batch: DataFrame,
        n: int = 3,
        num_hashes: int = 64,
        bands: int = 16,
        threshold: float = 0.5,
    ) -> None:
        """Dedup the batch against index + itself; append survivors."""
        spark = self.spark
        rows_per_band = num_hashes // bands
        batch = batch.dropDuplicates(["doc_id"]).persist()
        try:
            # tier 1: exact — fingerprint against admitted fingerprints
            # and within-batch (min doc_id wins)
            fps = self._read(self.fp_dir, "fp string")
            fresh = (
                batch.withColumn("fp", fingerprint("text"))
                .withColumn(
                    "_rk",
                    F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
                )
                .where(F.col("_rk") == 1)
                .drop("_rk")
                .join(fps, "fp", "left_anti")
            )
            # tier 2: near-dup — new sigs vs index bands + within-batch
            new_sigs = minhash_signatures(fresh, n, num_hashes).persist()
            idx_sigs = self._read(self.sig_dir, "doc_id long, sig array<bigint>")
            nb = _band_rows(new_sigs, bands, rows_per_band)
            ib = _band_rows(idx_sigs, bands, rows_per_band)
            est = F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                    lambda v: v == 1,
                )
            ) / F.lit(float(num_hashes))
            # vs index: any hit ≥ threshold kills the new doc
            cand_idx = (
                ib.select(F.col("doc_id").alias("a"), "band", "bucket")
                .join(nb.select(F.col("doc_id").alias("b"), "band", "bucket"), ["band", "bucket"])
                .select("a", "b")
                .dropDuplicates(["a", "b"])
                .join(idx_sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a")), "a")
                .join(new_sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b")), "b")
                .where(est >= threshold)
                .select(F.col("b").alias("doc_id"))
                .distinct()
            )
            # within batch: min-id survivor per near-dup pair
            cand_new = (
                nb.select(F.col("doc_id").alias("a"), "band", "bucket")
                .join(nb.select(F.col("doc_id").alias("b"), "band", "bucket"), ["band", "bucket"])
                .where(F.col("a") < F.col("b"))
                .select("a", "b")
                .dropDuplicates(["a", "b"])
                .join(new_sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a")), "a")
                .join(new_sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b")), "b")
                .where(est >= threshold)
                .select(F.col("b").alias("doc_id"))
                .distinct()
            )
            admitted = (
                fresh.join(cand_idx, "doc_id", "left_anti")
                .join(cand_new, "doc_id", "left_anti")
                .persist()
            )
            adm_sigs = new_sigs.join(
                admitted.select("doc_id"), "doc_id", "left_semi"
            )
            adm_fps = admitted.select("fp")
            admitted_rows = admitted.drop("fp")
            for df, path in (
                (admitted_rows, self.corpus_dir),
                (adm_sigs, self.sig_dir),
                (adm_fps, self.fp_dir),
            ):
                df.write.mode("append").parquet(path)
            admitted.unpersist()
        finally:
            new_sigs.unpersist()
            batch.unpersist()

    def attach(self, doc_stream: DataFrame, checkpoint: str):
        """Run the ingest loop over a document stream (AvailableNow or
        continuous — the apply is per-micro-batch either way)."""

        def apply(batch: DataFrame, batch_id: int) -> None:
            self.admit_batch(batch)

        return (
            doc_stream.writeStream.foreachBatch(apply)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
