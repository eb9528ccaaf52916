"""Lake-ops walkthrough: layout, observability, and maintenance.

The physical-layout lifecycle a 100 TB table runs on this engine:

1. cluster events on the HILBERT curve of (user_id, ts) —
   `hilbert_write` (round 8 adopted it over Morton: BASELINE.md's
   skip-fraction table shows Hilbert >= Morton on every probe class);
2. prove the layout prunes: `rowgroup_skip_fraction` reads ONLY the
   parquet footers and reports how many row groups a 2-D range
   predicate eliminates;
3. profile the files distributedly — `parquet_footer_profile` (one row
   per file/row-group/column, KBs per file regardless of data size);
4. plan maintenance — `compaction_plan` bin-packs small files toward a
   target size (the lakehouse OPTIMIZE planning step).

Run: python examples/lakehouse_ops.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from distributed_computing_spark.operators.layout import (
    compaction_plan,
    hilbert_write,
    parquet_footer_profile,
    rowgroup_skip_fraction,
    _window,
)
from distributed_computing_spark.session import get_spark
from distributed_computing_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="lakehouse_ops", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.col("ts").cast("long")
    )
    row = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts_sec"), F.max("ts_sec")
    ).collect()[0]
    bounds = tuple(int(v) for v in row)

    # 1. cluster on the Hilbert curve
    layout_dir = tempfile.mkdtemp(prefix="dcs_example_hilbert_")
    hilbert_write(ev, layout_dir, "user_id", "ts_sec", bounds, n_files=16)
    print(f"hilbert layout written: {layout_dir}")

    # 2. footer-measured pruning on a 2-D range probe
    xmin, xmax, ymin, ymax = bounds
    preds = {
        "user_id": _window(xmin, xmax, 20, 40),
        "ts_sec": _window(ymin, ymax, 30, 45),
    }
    skipped, total = rowgroup_skip_fraction(layout_dir, preds)
    print(f"2-D probe prunes {skipped}/{total} row groups "
          f"({skipped / total:.0%}) from footers alone")

    # 3. distributed footer profile of the layout's files
    paths = [
        os.path.join(layout_dir, f)
        for f in sorted(os.listdir(layout_dir))
        if f.endswith(".parquet")
    ]
    profile = parquet_footer_profile(spark, paths)
    profile.groupBy("file_name").agg(
        F.sum("compressed_bytes").alias("bytes"),
        F.countDistinct("row_group").alias("row_groups"),
    ).orderBy("file_name").show(8, truncate=False)

    # 4. compaction plan toward 1 MiB targets
    plan = compaction_plan(profile, target_bytes=1 << 20)
    print("compaction plan (bin -> files to merge):")
    plan.show(20, truncate=False)


if __name__ == "__main__":
    main()
