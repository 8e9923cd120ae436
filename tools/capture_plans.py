"""Capture .explain('formatted') for every headline bench query.

Usage: python tools/capture_plans.py <outdir> [suffix] [name ...]

Writes <outdir>/<query>_<suffix>.txt (suffix default 'before') for each
HEADLINE query that returns a DataFrame (EXTRA_ACTIONS lanes are
multi-step; their interesting sub-plans are captured by name where a
single DataFrame exists). Planning only — nothing is executed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entry
from confluent_kafka_vector_search_prompt_inference_spark import get_spark


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-capture", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entry.queries()
    for name in bench.HEADLINE:
        if only and name not in only:
            continue
        if name in bench.EXTRA_ACTIONS:
            continue
        df = qs[name](spark, sf_dir)
        # queryExecution().explainString(ExplainMode) is the stable JVM
        # surface (PythonSQLUtils.explainString depends on PySpark's
        # java_import set and moves across Spark versions)
        mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")
    entry.release_persisted()
    return 0


if __name__ == "__main__":
    sys.exit(main())
