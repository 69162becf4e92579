"""spark-submit entrypoint for the ER pipeline (north rule: "run via
spark-submit --py-files on multi-executor clusters").

Cluster usage:

    cd /root/repo
    zip -r /tmp/er_pkg.zip tabiya_livelihoods_classifier_spark
    spark-submit --py-files /tmp/er_pkg.zip \\
        tabiya_livelihoods_classifier_spark/plans/submit.py \\
        --input  s3://bucket/transcripts/   \\
        --output s3://bucket/er_out/        \\
        --store  s3://bucket/er_stages/     \\
        --input-id run-2026-08-16

Local twin (what the sandbox tests):

    python -m tabiya_livelihoods_classifier_spark.plans.submit \\
        --input /tmp/turns.parquet --output /tmp/out --store /tmp/stages

The job is the 7-stage resumable pipeline (plans/resumable.py): every stage
commits atomically with per-partition lineage + metrics, and a rerun with
the same (--input-id, config) resumes from the first uncommitted stage.
No master/conf is hard-coded here — spark-submit owns cluster sizing, which
is how the N vs 4N executor comparison is driven externally.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Resumable transcript ER job")
    ap.add_argument("--input", required=True, help="transcript parquet dir")
    ap.add_argument("--output", required=True, help="clusters parquet dir")
    ap.add_argument("--store", required=True, help="stage-commit root")
    ap.add_argument("--input-id", default="", help="resume identity")
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args(argv)

    from tabiya_livelihoods_classifier_spark.config import ERConfig
    from tabiya_livelihoods_classifier_spark.plans.resumable import (
        run_resumable,
    )
    from tabiya_livelihoods_classifier_spark.session import get_spark
    from tabiya_livelihoods_classifier_spark.storage import StageStore

    spark = get_spark(app_name="er-submit")
    if args.checkpoint_dir:
        spark.sparkContext.setCheckpointDir(args.checkpoint_dir)
    else:
        import tempfile

        spark.sparkContext.setCheckpointDir(
            tempfile.mkdtemp(prefix="er-submit-ckpt-")
        )

    t0 = time.perf_counter()
    turns = spark.read.parquet(args.input)
    store = StageStore(spark, args.store)
    out = run_resumable(
        spark, turns, store, ERConfig(), input_id=args.input_id
    )
    clusters = out["clusters"]
    clusters.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "clusters_rows": n,
                "stages_computed": out.get("_computed", []),
                "wall_s": round(time.perf_counter() - t0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
