"""DuckDB-oracle comparison helper mirroring the driver's t2 gate:
row-count + schema + order-insensitive value comparison with the parquet
tables registered as views."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(rows, columns):
    """Sort columns by name, then rows; round floats for cross-engine sums."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = 0.0 if v == 0 else round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark_df, sql: str, sf_dir: str) -> None:
    """Assert the Spark DataFrame and the DuckDB result match
    (row count, column-name set, order-insensitive values)."""
    con = duck_connection(sf_dir)
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s = _canon(spark_rows, spark_cols)
    d = _canon(duck_rows, duck_cols)
    for i, (a, b) in enumerate(zip(s, d)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9), (
                    f"row {i}: {a} != {b}"
                )
            else:
                assert x == y, f"row {i}: {a} != {b}"
