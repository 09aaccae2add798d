"""Pre-validate the external driver's correctness gate: run
``__spark_entry__.queries()[q]`` and ``oracle_sql()[q]`` side-by-side,
sort columns by name + rows, and compare values WITH their dtypes —
the driver's value-hash is dtype-strict (int64 != float64 even when
values are equal; see tests/test_probes_duckdb.py for the pytest
mirror).

Usage:  python scripts/driver_sim.py [SF_DIR] [q1,q2,...|ALL]
        (defaults: /root/testdata/sf0.01, ALL probes)
"""

import hashlib
import os
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as ep  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else ["ALL"]

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         # UTC pin: session.py and submit.sh both set it; without it a
         # non-UTC machine shifts date_trunc/hour_epoch vs the DuckDB
         # oracle and this sim reports FALSE mismatches
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, osql = ep.queries(), ep.oracle_sql()
if NAMES == ["ALL"]:
    NAMES = sorted(qs)


def canon_hash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        tuple((type(v).__name__, repr(v)) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    # column NAMES are part of the hash: the driver's compare (and the
    # pytest mirror, test_probes_duckdb.py) rejects alias mismatches
    # even when the value matrices agree
    h = hashlib.sha256(repr((sorted(pdf.columns), rows)).encode()).hexdigest()[:16]
    dtypes = {c: str(pdf[c].dtype) for c in pdf.columns}
    return h, dtypes, len(pdf)


ok = True
for name in NAMES:
    sp = qs[name](spark, SF).toPandas()
    sql = osql.get(name)
    if sql is None:
        print(f"{name}: rows-only probe ({len(sp)} rows, no SQL oracle)")
        continue
    du = con.execute(sql).df()
    hs, ds, ns = canon_hash(sp)
    hd, dd, nd = canon_hash(du)
    match = hs == hd
    ok &= match
    detail = "" if match else f" spark_dtypes={ds} duck_dtypes={dd}"
    print(f"{name}: rows {ns}/{nd} hash_match={match}{detail}")

e = ep.entry(spark)
n_entry = e.count()
print("entry rows:", n_entry, "schema:", e.schema.simpleString())
if n_entry <= 0:
    # the driver smoke-gates entry() on rows > 0 — mirror that
    print("entry produced no rows")
    ok = False
print("ALL_MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
