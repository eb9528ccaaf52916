"""Round-12 item 4: late_shipment_priority / late_lines_priority_mix
far-tier confirmation runs (R400 or R800 replica per argv)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from distributed_computing_spark.session import get_spark
from distributed_computing_spark.sources.catalog import load_table

scaled = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scalecache/sf0.1_x400_or-li"
names = sys.argv[2:] or ["late_shipment_priority", "late_lines_priority_mix"]
spark = get_spark(cpus=32, shuffle_partitions=32)
from distributed_computing_spark.registry import QUERIES, ORACLES
from distributed_computing_spark.caching import release_tracked

for t in ("lineitem", "orders"):
    load_table(spark, scaled, t).write.format("noop").mode("overwrite").save()

for name in names:
    for i in range(3):
        t0 = time.time()
        QUERIES[name](spark, scaled).write.format("noop").mode("overwrite").save()
        release_tracked()
        print(f"{name} spark run{i}: {time.time()-t0:.2f}s", flush=True)
spark.stop()

import duckdb
con = duckdb.connect()
for t in ("lineitem", "orders", "part", "supplier", "customer", "nation", "region"):
    p = os.path.join(scaled, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}/*.parquet')"
                    if os.path.isdir(p) else
                    f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
for name in names:
    for i in range(2):
        t0 = time.time()
        con.execute(ORACLES[name]).fetchall()
        print(f"{name} duckdb run{i}: {time.time()-t0:.2f}s", flush=True)
