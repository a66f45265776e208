"""Full driver-contract verification: entry() smoke + every queries()
entry vs its oracle_sql() at sf0.01, with the driver-exact compare
(column-name-sorted values AND the pandas dtype-kind audit that catches
the DuckDB HUGEINT -> float64 hash-mismatch class).

Usage (fresh process, any cwd):  python3 tools/full_verify.py
Writes per-entry lines + a final "FAILS: [...]" to stdout.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
print("entry rows:", len(df.collect()), df.schema.simpleString(), flush=True)

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
for name in list(qs):
    try:
        sdf = qs[name](spark, SF_DIR)
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
        print(name, "ERROR:", repr(ex)[:200], flush=True)
        fails.append(name)
print("FAILS:", fails, flush=True)
sys.exit(1 if fails else 0)
