"""Round-13 pagerank probes (VERDICT r12 item 2): measure, don't argue.

(a) AQE on vs off per-round cost; (b) rounds decomposition;
(c) coalesced edge cache. Usage:
    python tools/probe_pagerank_r13.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_computing_spark.caching import release_tracked
from distributed_computing_spark.registry import QUERIES
from distributed_computing_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    spark = get_spark(app_name="probe-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: parquet footers + page cache on lineitem
    from distributed_computing_spark.sources.catalog import load_table

    load_table(spark, SF_DIR, "lineitem").write.format("noop").mode(
        "overwrite"
    ).save()

    from distributed_computing_spark.operators.graph import pagerank_parts

    def run(tag: str, n_iter: int = 8, aqe: bool = True) -> float:
        spark.conf.set("spark.sql.adaptive.enabled", "true" if aqe else "false")
        spark.sparkContext.setJobDescription(f"pagerank {tag}")
        t = noop(pagerank_parts(spark, SF_DIR, n_iter=n_iter))
        release_tracked()
        print(f"{tag}: {t}s", flush=True)
        return t

    # steady-state interleaved A/B, AQE on vs off
    run("warm0 aqe=on n=8")
    for rep in range(3):
        run(f"rep{rep} aqe=on  n=8")
        run(f"rep{rep} aqe=off n=8")
    # rounds decomposition (per-round marginal cost), both modes
    for aqe in (True, False):
        for n in (1, 2, 4, 8):
            run(f"decomp aqe={'on' if aqe else 'off'} n={n}", n_iter=n, aqe=aqe)
    spark.conf.set("spark.sql.adaptive.enabled", "true")


if __name__ == "__main__":
    main()
