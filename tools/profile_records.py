"""Sub-stage profiler for the ER records stage (the 88%-of-wall corpus pass).

Times each materialize barrier of conversation_records separately —
per_conv (conversation metadata aggregate), tok_counts (token
explode+aggregate), recs (majority join + collect_set) — plus the final
stop-subtraction/name_key projection and the slim persist, at a given
master. Run at two parallelism levels to see WHICH sub-stage limits N->4N
scaling:

    taskset -c 0-1 python tools/profile_records.py local[2] <turns_parquet>
    taskset -c 0-7 python tools/profile_records.py local[8] <turns_parquet>

Prints one JSON line with per-barrier wall seconds and row counts.
"""

from __future__ import annotations

import atexit
import json
import re
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    master, turns_pq = sys.argv[1], sys.argv[2]
    from pyspark.sql import functions as F

    from tabiya_livelihoods_classifier_spark.plans import pipeline as P
    from tabiya_livelihoods_classifier_spark.session import get_spark

    local_dir = tempfile.mkdtemp(dir="/dev/shm", prefix="sl-")
    ckpt_dir = tempfile.mkdtemp(dir="/dev/shm", prefix="er-ckpt-")
    for d in (local_dir, ckpt_dir):
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    spark = get_spark(
        app_name="profile-records",
        master=master,
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": local_dir,
        },
    )
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    turns = spark.read.parquet(turns_pq)
    n_turns = turns.count()

    # steady-state warmup (2% slice), mirroring bench.py --er-run
    warm = turns.filter(F.crc32(F.col("conv_id")) % 50 == 0)
    P.conversation_records(
        P.canonical_turns(warm), embed=False, with_text=False,
        materialize=P._materialize_stage, token_source=warm,
    ).select("rid", "role_sig", "name_key").write.format("noop").mode(
        "overwrite"
    ).save()

    barriers: list[dict] = []

    def timed_mat(df):
        t0 = time.perf_counter()
        out = P._materialize_stage(df)
        barriers.append(
            {
                "cols": df.columns,
                "wall_s": round(time.perf_counter() - t0, 3),
            }
        )
        print(f"  barrier {len(barriers)}: {barriers[-1]}", file=sys.stderr)
        return out

    t_all = time.perf_counter()
    recs = P.conversation_records(
        P.canonical_turns(turns),
        embed=False,
        with_text=False,
        materialize=timed_mat,
        token_source=turns,
    ).select("rid", "role_sig", "name_key")
    t0 = time.perf_counter()
    recs = recs.persist()
    n_recs = recs.count()
    tail_s = round(time.perf_counter() - t0, 3)
    total_s = round(time.perf_counter() - t_all, 3)
    print(
        json.dumps(
            {
                "master": master,
                "turns": n_turns,
                "records": n_recs,
                "barriers": barriers,
                "stop_subtract_and_persist_s": tail_s,
                "records_total_s": total_s,
                "tps": round(n_turns / total_s, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
