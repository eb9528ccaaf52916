"""Dump .explain('formatted') for named queries (default: the bench
HEADLINE set) into plans/r13/<query>_<tag>.txt — the optimization
round's before/after plan evidence.

Usage: python tools/r13_explain.py <tag> [query ...]
  tag is 'before' or 'after'; with no query names, dumps the full
  HEADLINE set. Runs at sf0.001 (plan shape is SF-invariant; the
  explain itself never executes the query).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from distributed_computing_spark.registry import QUERIES  # noqa: E402
from distributed_computing_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r13-explain", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    from distributed_computing_spark.caching import release_tracked

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", flush=True)
        # builder persists must not leak into the NEXT query's dump:
        # the CacheManager is context-shared, so a prior query's cached
        # subtree (compiled under ITS session conf) would substitute
        # into later plans — round 13 caught pagerank's AQE-off dump
        # polluted by triangles' cached edges this way.
        release_tracked()


if __name__ == "__main__":
    main()
