"""Verify a SUBSET of gate entries against their DuckDB oracles with the
driver-exact compare — the per-entry version of tools/full_verify.py for
fast iteration while building.

Usage: python3 tools/verify_entries.py name1 [name2 ...]
Env:   SPARK_GRAFT_VERIFY_SF (default /root/testdata/sf0.01)
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402

names = sys.argv[1:]
if not names:
    print("usage: verify_entries.py name1 [name2 ...]")
    sys.exit(2)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import duckdb  # noqa: E402

from oracle import TABLES, _dtype_kind_audit  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )

qs, osql = e.queries(), e.oracle_sql()
fails = []
for name in names:
    if name not in qs:
        print(name, "ERROR: not in registry", flush=True)
        fails.append(name)
        continue
    try:
        sdf = qs[name](spark, SF_DIR)
        if name not in osql:
            print(name, "rows-only:", len(sdf.collect()), flush=True)
            continue
        duck_pdf = con.execute(osql[name]).df()
        _dtype_kind_audit(sdf, duck_pdf)
        srows = sorted(
            [
                tuple(sorted(zip(sdf.columns, r), key=lambda kv: kv[0]))
                for r in map(tuple, sdf.collect())
            ],
            key=str,
        )
        dcols = [d[0] for d in con.execute(osql[name]).description]
        drows = sorted(
            [
                tuple(sorted(zip(dcols, r), key=lambda kv: kv[0]))
                for r in con.execute(osql[name]).fetchall()
            ],
            key=str,
        )
        ok = srows == drows
        print(name, "match:", ok, len(srows), flush=True)
        if not ok:
            fails.append(name)
    except Exception as ex:  # noqa: BLE001 - report and continue
        print(name, "ERROR:", repr(ex)[:300], flush=True)
        fails.append(name)
print("FAILS:", fails, flush=True)
sys.exit(1 if fails else 0)
