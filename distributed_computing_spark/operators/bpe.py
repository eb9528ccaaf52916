"""BPE tokenizer training as a distributed iterative algorithm ([EXT]).

The classic word-frequency formulation (Sennrich et al. 2016): train on
the corpus's (word, count) table, not the raw token stream — merge
statistics are identical and the iterated table is vocabulary-sized
(|V| rows), not corpus-sized. Each round:

1. explode every word's current symbol array into adjacent pairs,
   weighted by the word's corpus count (distributed, partial-agg
   shuffle on the pair),
2. pick the most frequent pair (1-row collect — the same bounded
   driver-side step as neardup_clusters' convergence check),
3. rewrite the symbol arrays with that pair merged (greedy
   left-to-right, a per-row fold over ≤ word-length symbols).

Scale notes: production tokenizers train on a corpus SAMPLE (the merge
table saturates long before full-corpus statistics are needed) — at
100 TB you'd `mixture_sample` first, then this exact loop runs on the
sampled vocabulary. Encoding afterwards is NOT iterative: training
already yields every known word's final pieces, so encoding is a
broadcast join against the trained table (unknown words fall back to
character pieces).

SQL oracle (round 4): the registry gates this EXACTLY against DuckDB
via a generated chain of unrolled MATERIALIZED CTE rounds
(registry._bpe_rounds_sql) — the greedy left-to-right pair merge is
leftmost-non-overlapping string replacement over a bracketed symbol
encoding, so each round is an argmax CTE plus a replace() rewrite.
Contract: the oracle unrolls exactly ``n_merges`` rounds, so it is
valid only while no early ``min_count`` stop fires within that many
merges (true at gate scales; ``registry.bpe_merges`` asserts
``len(rules) == n_merges`` so a future early stop fails loudly as the
documented contract, not as a silent oracle divergence). The merge
sequence is additionally pinned by hand-computed tests
(tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_spark.functions.text import tokens

END = "</w>"  # end-of-word marker symbol (Sennrich et al. 2016 fig. 2)


def word_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) training table — the only corpus-sized pass."""
    return (
        documents.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word -> its character symbols + the end-of-word marker."""
    return words.select(
        "word",
        "cnt",
        F.concat(
            F.split(F.col("word"), ""),  # one element per character
            F.array(F.lit(END)),
        ).alias("syms"),
    )


def _merge_pair(col, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) inside a symbol
    array: fold that either fuses x into a just-appended `a` or appends.
    Word arrays are short (≤ chars-per-word), so the interpreted-HOF
    cost is bounded per row — this is NOT the corpus-sized HOF pattern
    textstats.repetition_scores documents as a dead end."""
    merged = a + b
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    spark: SparkSession,
    documents: DataFrame,
    n_merges: int = 30,
    min_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` merge rules; returns (rules, pieces)
    where rules = [(left, right, pair_count), ...] in learned order and
    pieces = the final (word, cnt, syms) table (the encoding cache).

    Ties break by lexicographic (left, right) so the merge sequence is
    deterministic across engines, partitionings, and row orders.
    """
    # localCheckpoint (not persist): each round's rewrite NESTS another
    # fold expression into the plan, so lineage must be CUT, not just
    # cached — with persist alone the accumulated plan string OOMed the
    # driver at ~20 iterations (AQE formats the full plan per execution).
    words = _initial_symbols(word_counts(documents)).localCheckpoint(eager=True)
    rules: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            words.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
        )
        best = pairs.orderBy(F.col("n").desc(), "a", "b").limit(1).collect()
        if not best or best[0]["n"] < min_count:
            break
        a, b, n = best[0]["a"], best[0]["b"], best[0]["n"]
        rules.append((a, b, n))
        words = words.select(
            "word", "cnt", _merge_pair(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return rules, words


def encode_with_pieces(
    documents: DataFrame, pieces: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Encode docs using the trained pieces table: token -> piece list
    via broadcast join (training already finalized every known word);
    out-of-vocabulary words fall back to character pieces. Returns
    (doc_id, n_words, n_pieces, n_oov)."""
    tok = documents.select(
        "doc_id", F.explode(tokens(text_col)).alias("word")
    )
    enc = tok.join(
        F.broadcast(pieces.select("word", "syms")), "word", "left"
    ).select(
        "doc_id",
        F.coalesce(
            F.size("syms"),
            F.length("word") + 1,  # OOV: chars + </w>
        ).alias("n_p"),
        F.col("syms").isNull().cast("long").alias("oov"),
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_p").alias("n_pieces"),
        F.sum("oov").alias("n_oov"),
    )
