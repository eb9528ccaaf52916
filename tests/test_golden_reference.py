"""Golden-file parity with the reference's own end-to-end tests.

The reference's only true goldens are shell diffs over the 16 Gutenberg
books (src/main/test-wc.sh:2-3 vs mr-testout.txt, src/main/test-ii.sh:2-3
vs mr-challenge.txt), with the Go Unicode tokenizer
(wc.go:16-29 / ii.go:17-31: split on !IsLetter && !IsNumber runes).

These tests run the same corpus through ``read_text_corpus`` +
``tokens_unicode`` and reproduce the exact shell pipelines, byte-for-byte:

- wc:  ``sort -n -k2 mrtmp.wcseq | tail -10``  (numeric by count, whole-line
  last-resort tie-break)
- ii:  ``sort -k1,1 | sort -snk2,2 | grep -v '16' | tail -10``  (stable
  numeric by doc-count over word-sorted lines, drop lines containing "16")

Closes SURVEY §5 layer 1 ("verifiable against a golden today").
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from distributed_computing_spark.functions.text import tokens_unicode
from distributed_computing_spark.sources.catalog import read_text_corpus

REF_MAIN = "/root/reference/src/main"

pytestmark = pytest.mark.skipif(
    not glob.glob(f"{REF_MAIN}/pg-*.txt"), reason="reference corpus not present"
)


def _golden(name: str) -> list[str]:
    with open(f"{REF_MAIN}/{name}", encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f]


@pytest.fixture(scope="module")
def corpus(spark):
    df = read_text_corpus(spark, f"{REF_MAIN}/pg-*.txt")
    # doc is a file URI; the goldens use the bare filename.
    return df.select(
        F.element_at(F.split(F.col("doc"), "/"), -1).alias("doc"), "line"
    )


def test_wordcount_golden_top10(corpus):
    counts = (
        corpus.select(F.explode(tokens_unicode("line")).alias("word"))
        .groupBy("word")
        .count()
    )
    # Only the global top of the distribution can reach tail -10; pull a
    # comfortable margin and replay the exact shell sort on the driver.
    top = counts.orderBy(F.col("count").desc()).limit(50).collect()
    lines = [f"{r['word']}: {r['count']}" for r in top]
    # sort -n -k2: numeric on field 2, then whole-line bytes as the
    # last-resort tie-break (GNU sort without -s).
    lines.sort(key=lambda l: (int(l.rsplit(" ", 1)[1]), l.encode()))
    assert lines[-10:] == _golden("mr-testout.txt")


def test_inverted_index_golden_top10(corpus):
    agg = (
        corpus.select("doc", F.explode(tokens_unicode("line")).alias("word"))
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("doc")).alias("docs"))
        .select(
            "word",
            F.size("docs").alias("n"),
            F.concat_ws(",", "docs").alias("doclist"),
        )
        .select(
            "word",
            "n",
            F.concat(F.col("word"), F.lit(": "), F.col("n"), F.lit(" "), F.col("doclist")).alias(
                "line"
            ),
        )
        # grep -v '16': drops every line containing the substring "16"
        # (notably all 16-of-16 words, plus numeric tokens like "1666").
        .where(~F.col("line").contains("16"))
    )
    # sort -k1,1 then stable sort -snk2,2 == order by (n, word); tail -10.
    tail10 = [
        r["line"]
        for r in agg.orderBy(F.col("n").desc(), F.col("word").desc()).limit(10).collect()
    ][::-1]
    assert tail10 == _golden("mr-challenge.txt")
