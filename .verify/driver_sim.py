"""Simulates the driver: vanilla SparkSession, smoke entry(), then run
every queries() entry at sf0.01 and compare against oracle_sql() via DuckDB."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         # the full catalog accumulates driver-side broadcast blobs across
         # 180+ queries in one session; the 1g default is borderline at
         # sf0.1 (observed flaky "Not enough memory to broadcast" under
         # concurrent load). The real driver runs ~50 queries at sf0.01 —
         # far below this pressure.
         .config("spark.driver.memory", "4g")
         .getOrCreate())

import __spark_entry__ as entrymod

t0 = time.time()
df = entrymod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}, {time.time()-t0:.1f}s")
assert len(rows) > 0

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} oracles")

sys.path.insert(0, "/root/repo/tests")
from oracle_harness import compare, duck_connection
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duck_connection(SF)
import gc
fails = []
for name in sorted(qs):
    t = time.time()
    try:
        sdf = qs[name](spark, SF)
        if name in oracles:
            ok, msg = compare(sdf, con, oracles[name])
            status = "OK " if ok else "FAIL"
            if not ok: fails.append((name, msg))
        else:
            n = sdf.count(); status, msg = "ROWS", f"{n} rows"
        print(f"{status} {name} ({time.time()-t:.1f}s) {msg if status!='OK ' else ''}")
    except Exception as e:
        fails.append((name, str(e)[:200])); print(f"ERR  {name}: {str(e)[:200]}")
    # release plan refs so checkpoint blocks/broadcasts are freed — 195
    # queries of retained state otherwise age the session (see bench.py)
    sdf = None
    gc.collect()
print(f"\n{len(fails)} failures")
for n, m in fails: print(" -", n, m[:300])
sys.exit(1 if fails else 0)
