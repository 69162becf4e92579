#!/usr/bin/env python
"""Per-query isolation bench (supplement to the frozen bench.py).

Usage:
    python bench_extra.py [sf_dir] [query ...]

Runs ONLY the named queries (default: all), each forced with a noop sink
and labelled via setJobDescription, after the same warmup bench.py does,
against a fresh stage root (SPARK_GRAFT_STAGE_DIR, wiped at start unless
SPARK_GRAFT_KEEP_STAGES=1). Prints one JSON line with per-query seconds.
Numbers here are for optimization work; the graded numbers come from the
frozen bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    only = argv[1:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    stage_root = os.environ.get(
        "SPARK_GRAFT_STAGE_DIR", "/tmp/spark_graft_stages_extra"
    )
    os.environ["SPARK_GRAFT_STAGE_DIR"] = stage_root
    if os.environ.get("SPARK_GRAFT_KEEP_STAGES") != "1":
        shutil.rmtree(stage_root, ignore_errors=True)

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from tabiya_livelihoods_classifier_spark.functions.strsim import (
        jaro_winkler_udf,
    )
    from tabiya_livelihoods_classifier_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    queries = entry.queries()
    names = only or list(queries)

    # same warmup as bench.py: codegen/Arrow + Python worker pool
    queries["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(int(cpus) * 8).repartition(int(cpus)).select(
        jaro_winkler_udf(F.lit("warm"), F.lit("warm"))
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings,
                      "total": round(sum(timings.values()), 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
