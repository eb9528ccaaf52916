"""Round-12 far-tier cells: events R2000 (dow_anomalies, theilsen,
lag_autocorr) and/or named queries on a given replica — spark side then
duckdb side, solo, default heap.

usage: probe_r12_tiers.py <scaled_dir> <q1> [q2 ...] [--spark-runs N]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = [a for a in sys.argv[1:] if not a.startswith("--")]
scaled, names = args[0], args[1:]
n_runs = 2

from distributed_computing_spark.session import get_spark
from distributed_computing_spark.sources.catalog import load_table
from distributed_computing_spark.registry import QUERIES, ORACLES
from distributed_computing_spark.caching import release_tracked

spark = get_spark(cpus=32, shuffle_partitions=32)
warm = "events" if "_ev" in scaled else "lineitem"
load_table(spark, scaled, warm).write.format("noop").mode("overwrite").save()
for name in names:
    for i in range(n_runs):
        t0 = time.time()
        QUERIES[name](spark, scaled).write.format("noop").mode("overwrite").save()
        release_tracked()
        print(f"{name} spark run{i}: {time.time()-t0:.2f}s", flush=True)
spark.stop()

import duckdb
con = duckdb.connect()
for t in ("lineitem", "orders", "part", "supplier", "customer",
          "nation", "region", "events", "documents", "embeddings"):
    p = os.path.join(scaled, f"{t}.parquet")
    if os.path.exists(p):
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{src}')")
for name in names:
    for i in range(n_runs):
        t0 = time.time()
        con.execute(ORACLES[name]).fetchall()
        print(f"{name} duckdb run{i}: {time.time()-t0:.2f}s", flush=True)
