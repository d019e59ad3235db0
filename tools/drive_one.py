"""Single-query slice of drive_contract.py for fast iteration:
``python tools/drive_one.py name [name ...]`` runs just those
registered queries against the DuckDB oracle at sf0.01 (or
``DRIVE_SF_DIR``), with the identical compare logic."""
import os
import sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E
from tools.contract_compare import compare_result

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("driver-sim-one")
    .getOrCreate()
)

SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    # Driver testdata ships one file per table; Spark-written copies
    # (e.g. make_sfbig output) are directories of part files.
    src = f"{SF}/{t}.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

qs = E.queries()
oracles = E.oracle_sql()
fail = 0
for name in sys.argv[1:]:
    if name not in qs:
        print(f"FAIL {name}: not registered")
        fail += 1
        continue
    t0 = time.time()
    try:
        spdf = qs[name](spark, SF).toPandas()
    except Exception as ex:
        print(f"FAIL {name}: spark raised {type(ex).__name__}: {str(ex)[:300]}")
        fail += 1
        continue
    if name not in oracles:
        print(f"rows-only {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
        continue
    ddf = con.execute(oracles[name]).df()
    r = compare_result(spdf, ddf, max_diffs=5)
    for x, y in r["diffs"]:
        print(f"  spark={x}\n  duck ={y}")
    status = "OK  " if r["ok"] else "FAIL"
    if not r["ok"]:
        fail += 1
    print(f"{status} {name}: spark={len(spdf)} duck={len(ddf)} cols_ok={r['cols_ok']} "
          f"dtype_ok={r['dtype_ok']} vals_ok={r['val_ok']}  ({time.time()-t0:.1f}s){r['dtype_detail']}")

print("ALL GREEN" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
