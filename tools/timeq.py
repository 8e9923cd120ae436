"""Time individual headline queries into the noop sink (min-of-N).

Usage: python tools/timeq.py [-n REPS] name [name ...]

Mirrors bench.py's methodology (same session config, same noop action,
min over reps after a lineitem warm) for one-query iteration while
optimizing — NOT the round-of-record (that stays bench.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entry
from confluent_kafka_vector_search_prompt_inference_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    spark = get_spark("timeq", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    for name in args:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            if name in bench.EXTRA_ACTIONS:
                bench.EXTRA_ACTIONS[name](spark, SF_DIR)
            else:
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            best = min(best, time.time() - t0)
        print(f"{best:7.3f}  {name}")
    entry.release_persisted()
    return 0


if __name__ == "__main__":
    sys.exit(main())
