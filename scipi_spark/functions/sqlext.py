"""User-registered SQL function surface (SURVEY §2.7: absent in the
reference — its "UDFs" are hardcoded map/flatMap/reduce operator
classes; a full engine lets users register functions and call them from
SQL). The UDTF half lives in functions/text.py
(``register_word_lens_udtf``); this module holds the UDAF half.

Both registrations use the Arrow transfer paths (plan nodes
ArrowEvalPythonUDTF / ArrowAggregatePython) — never the row-pickling
BatchEvalPython path the plan audit forbids. At scale the aggregation
is still a single hash Exchange on the group key with the Python worker
fed whole Arrow batches per group; the slow part is the per-group
Python reduction, which is why built-in aggregates stay preferred and
this surface exists for the genuinely-custom tail."""

from __future__ import annotations

import pandas as pd


def register_median_udaf(spark) -> None:
    """Register ``median_val(double) -> double``: an exact per-group
    median as a pandas GROUPED_AGG UDF callable from SQL GROUP BY.
    pandas ``Series.median`` interpolates the two middle values on even
    counts — the same convention as DuckDB/Spark ``median``, so oracles
    replay it directly. Idempotent re-registration."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_val(v: pd.Series) -> float:
        return float(v.median())

    spark.udf.register("median_val", median_val)
