"""Round-12 item 3b: decompose important_part_share at R400."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from distributed_computing_spark.session import get_spark
from distributed_computing_spark.sources.catalog import load_table

scaled = "/root/repo/.scalecache/sf0.1_x400_or-li"
spark = get_spark(cpus=32, shuffle_partitions=32)
li = load_table(spark, scaled, "lineitem")
li.write.format("noop").mode("overwrite").save()  # warm pages

def t(df, label, n=3):
    for i in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label} run{i}: {time.time()-t0:.2f}s", flush=True)

from distributed_computing_spark.registry import _rev_mc, QUERIES
from distributed_computing_spark.caching import release_tracked

# (a) decimal-expression rollup only
t(li.groupBy("l_partkey").agg(F.sum(_rev_mc()).alias("m")), "agg_decimal")
# (b) pure-long rollup: cents * (100 - disc_cents)
rev_long = (
    (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    * (F.lit(100).cast("long") - (F.col("l_discount").cast("decimal(3,2)") * 100).cast("long"))
)
t(li.groupBy("l_partkey").agg(F.sum(rev_long).alias("m")), "agg_long")
# (c) scan+sum only, no groupBy exchange
t(li.agg(F.sum(_rev_mc()).alias("m")), "global_sum_decimal")
# (d) full current query
for i in range(3):
    t0 = time.time()
    QUERIES["important_part_share"](spark, scaled).write.format("noop").mode("overwrite").save()
    release_tracked()
    print(f"full run{i}: {time.time()-t0:.2f}s", flush=True)
# value identity of the long form
a = li.groupBy("l_partkey").agg(F.sum(_rev_mc()).alias("m")).orderBy("l_partkey").limit(5).collect()
b = li.groupBy("l_partkey").agg(F.sum(rev_long).alias("m")).orderBy("l_partkey").limit(5).collect()
print("long==decimal on sample:", [tuple(r) for r in a] == [tuple(r) for r in b], flush=True)
