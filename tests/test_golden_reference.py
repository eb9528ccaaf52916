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

mr-testout.txt and mr-challenge.txt are 10 lines IN THEIR ENTIRETY (the
shell pipes end in ``tail -10``), so the tests above already diff the
complete golden files byte-for-byte — there is no further reference
golden to compare. Regenerating the reference's full intermediate
(mrtmp.wcseq via ``go run wc.go``) is environment-blocked: no Go
toolchain in this container. In its place, the full-output tests below
pin sha256 self-goldens of the ENTIRE 66,360-line wc and ii outputs, so
any tokenizer/aggregation drift beyond the top-10 window fails loudly.

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


# Full-output self-goldens (sha256 over the complete sorted outputs,
# pinned from the first verified run): the 66,360 distinct tokens of the
# 16-book corpus, in "word: count" / "word: n doclist" form. These hold
# the ENTIRE output surface fixed, not just the reference's top-10
# window.
_WC_FULL_SHA256 = "81299fb94f3d3076791792f75ecdec9b4efd03e1d8d774b392bcfe0dc7ef855c"
_II_FULL_SHA256 = "06d2e8c42650e11a16afcef4ab99fce09eaaac8eafa3a70f001185e3f4f5a50c"
_N_DISTINCT_TOKENS = 66360


def _sha(lines: list[str]) -> str:
    import hashlib

    return hashlib.sha256(("\n".join(lines) + "\n").encode()).hexdigest()


def test_wordcount_full_output_pinned(corpus):
    counts = (
        corpus.select(F.explode(tokens_unicode("line")).alias("word"))
        .groupBy("word")
        .count()
    )
    lines = sorted(f"{r['word']}: {r['count']}" for r in counts.collect())
    assert len(lines) == _N_DISTINCT_TOKENS
    assert _sha(lines) == _WC_FULL_SHA256


def test_inverted_index_full_output_pinned(corpus):
    agg = (
        corpus.select("doc", F.explode(tokens_unicode("line")).alias("word"))
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("doc")).alias("docs"))
        .select(
            "word",
            F.size("docs").alias("n"),
            F.concat_ws(",", "docs").alias("doclist"),
        )
    )
    lines = sorted(f"{r['word']}: {r['n']} {r['doclist']}" for r in agg.collect())
    assert len(lines) == _N_DISTINCT_TOKENS
    assert _sha(lines) == _II_FULL_SHA256
