"""Capture `.explain("formatted")` for bench headliners into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [entry ...]
  suffix: "before" or "after" — files land at
  $SPARK_GRAFT_PLANS_DIR (default plans/r13/) as <entry>_<suffix>.txt
  entries: default = every bench.py HEADLINER.

The plan is captured at sf0.1 (the bench SF) WITHOUT executing the query:
`_sdf.explain` on the built DataFrame. Store-backed entries build their
store if missing (same as the bench cold path).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINERS  # noqa: E402
from scipi_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINERS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR", os.path.join(REPO, "plans", "r13")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="scipi-spark-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure instead of dying
            text = f"PLAN CAPTURE FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        n_ex = text.count("Exchange")
        print(f"{name}: {len(text)} bytes, {n_ex} Exchange refs -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
