"""Simulates the external verification driver: vanilla session, hostile TZ."""
import sys, os, math, datetime
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import SparkSession

# hostile driver session: non-UTC tz, no engine tuning at all
spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

import __spark_entry__ as E

# 1. entry smoke
df = E.entry(spark)
rows = df.collect()
print("ENTRY_OK rows=%d schema=%s" % (len(rows), df.schema.simpleString()))

# 2. each query vs oracle at sf0.01
sys.path.insert(0, os.path.join(REPO, "tests"))
from oracle_check import duckdb_con, compare
con = duckdb_con("/root/testdata/sf0.01")
qs, os_ = E.queries(), E.oracle_sql()
missing = set(os_) - set(qs)
print("ORACLE_KEYS_SUBSET=%s (extra oracle keys: %s)" % (not missing, missing))
fails = 0
for name in sorted(qs):
    d = qs[name](spark, "/root/testdata/sf0.01")
    if name in os_:
        ok, msg = compare(d, con, os_[name])
        print(("PASS" if ok else "FAIL"), name, msg)
        fails += (not ok)
    else:
        print("ROWSONLY", name, d.count())
print("TOTAL_FAILS=%d" % fails)
