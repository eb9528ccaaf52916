"""Round-11 surface demo: the corpus similarity/drift audit suite.

The session a curation owner runs before a training cut: winnowing
fingerprints (MOSS) for self-similarity density and near-dup candidate
pairs, the Heaps-law vocabulary-growth curve (is more of this corpus
still adding vocabulary?), the exact two-sample KS drift test (has a
segment's distribution moved?), sorted-neighborhood record linkage,
and per-node clustering coefficients on the co-purchase graph — every
step a lazy DataFrame plan with an exact DuckDB oracle in the
registry.

Run: python examples/similarity_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_computing_spark.caching import release_tracked
from distributed_computing_spark.operators.analytics import ks_price_drift
from distributed_computing_spark.operators.graph import (
    clustering_coefficients,
    copurchase_edges,
)
from distributed_computing_spark.operators.linkage import (
    sorted_neighborhood_pairs,
)
from distributed_computing_spark.operators.textstats import (
    vocab_growth,
    winnow_fingerprints,
    winnow_neardup,
)
from distributed_computing_spark.session import get_spark
from distributed_computing_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="similarity_audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    print("== winnowing fingerprint density per source ==")
    winnow_fingerprints(spark, sf_dir).show(10, truncate=False)
    release_tracked()

    print("== near-dup candidate pairs (>= 2 shared fingerprints) ==")
    winnow_neardup(spark, sf_dir).show(10)

    print("== Heaps-law vocabulary growth (20 checkpoints) ==")
    vocab_growth(spark, sf_dir).show(20)
    release_tracked()

    print("== exact KS price drift per return flag ==")
    ks_price_drift(spark, sf_dir).show()

    print("== sorted-neighborhood name linkage (first 10 pairs) ==")
    cust = load_table(spark, sf_dir, "customer")
    sorted_neighborhood_pairs(cust, "c_custkey", "c_name").orderBy(
        "a_id", "b_id"
    ).show(10)
    release_tracked()

    print("== co-purchase clustering coefficients (10 densest) ==")
    edges = copurchase_edges(load_table(spark, sf_dir, "lineitem"))
    clustering_coefficients(edges).orderBy(
        "cc_ppm", ascending=False
    ).show(10)
    release_tracked()


if __name__ == "__main__":
    main()
