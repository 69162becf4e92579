"""Deployment-faithfulness smoke: the ER pipeline runs unmodified on a
multi-executor cluster (separate executor JVMs + python workers that do NOT
share the driver's sys.path), the scenario the north rule's
`spark-submit --py-files` deployment implies. `local-cluster[2,1,2048]`
spawns two single-core standalone executors; the package reaches their
python workers via executor PYTHONPATH (the --py-files analog), and the
clusters must match the single-process oracle exactly — proving no stage
depends on driver-local state (sys.path, cwd, driver-only temp files).

Runs in a subprocess: a JVM can host only one master, and the suite's
shared session is plain local[*].
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_SCRIPT = r"""
import json, sys
from tabiya_livelihoods_classifier_spark.session import get_spark
from tabiya_livelihoods_classifier_spark.data.transcripts import (
    transcripts_spark, generate_transcripts,
)
from tabiya_livelihoods_classifier_spark.plans.pipeline import er_pipeline
from tabiya_livelihoods_classifier_spark.plans.oracle import oracle_pipeline

spark = get_spark(
    app_name="lc-smoke",
    master="local-cluster[2,1,2048]",
    shuffle_partitions=8,
    extra_conf={
        "spark.executor.memory": "1536m",
        "spark.executorEnv.PYTHONPATH": sys.argv[1],
    },
)
tdf, _ = transcripts_spark(spark, "xs", 42)
clusters = {r.rid: r.component for r in er_pipeline(spark, tdf)["clusters"].collect()}
turns, _ = generate_transcripts("xs", 42)
assert clusters == oracle_pipeline(turns)["clusters"], "cluster mismatch"
print("LC_SMOKE_OK", len(set(clusters.values())))
spark.stop()
"""


def test_er_pipeline_on_multi_executor_cluster(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}{env.get('PYTHONPATH', '')}"
    env["SPARK_GRAFT_CHECKPOINT_DIR"] = str(tmp_path / "ckpt")
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(REPO)],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),
    )
    assert "LC_SMOKE_OK" in proc.stdout, (
        proc.stdout[-2000:],
        proc.stderr[-3000:],
    )
