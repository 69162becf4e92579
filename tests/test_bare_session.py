"""Regression guard for the round-4 checkpoint-dir failure class.

The driver's correctness harness builds its OWN SparkSession (no checkpoint
dir, default confs) and passes it into ``queries()`` — the engine must be
self-sufficient on an arbitrary session. A same-process test cannot model
this (the conftest session already set a checkpoint dir on the shared
SparkContext), so this test launches a fresh interpreter whose session is
built exactly like the harness's: bare ``SparkSession.builder.getOrCreate``.

Covers: q23 (transitive closure), q24 (connected components), q26 (ER
flagship), q44 (dedup clusters) — the four operators that reliably
checkpoint — plus the runtime-conf contract (UTC timezone + generate-
pushdown exclusion applied onto the received session by plans.queries.load).
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession

sys.path.insert(0, sys.argv[1])
import __spark_entry__ as E

spark = SparkSession.builder.master("local[4]").getOrCreate()
assert spark.sparkContext.getCheckpointDir() is None, "precondition: bare"

qs = E.queries()
out = {}
for key in (
    "q23_graph_closure",
    "q24_connected_components",
    "q26_er_clusters",
    "q44_dedup_clusters",
):
    out[key] = qs[key](spark, sys.argv[2]).count()

out["tz"] = spark.conf.get("spark.sql.session.timeZone")
out["excluded"] = spark.conf.get("spark.sql.optimizer.excludedRules", "")
out["ckpt_set"] = spark.sparkContext.getCheckpointDir() is not None
print("RESULT:" + json.dumps(out))
"""


def test_queries_run_on_bare_driver_session(tmp_path):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    script = tmp_path / "bare_session_probe.py"
    script.write_text(_SCRIPT)
    env = dict(os.environ)
    # the harness does not set these either — the engine must not need them
    env.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)
    env.setdefault("SPARK_GRAFT_STAGE_DIR", str(tmp_path / "stages"))
    proc = subprocess.run(
        [sys.executable, str(script), str(REPO), sf_dir],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    import json

    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    res = json.loads(line[0][len("RESULT:") :])
    assert res["q23_graph_closure"] > 0
    assert res["q24_connected_components"] > 0
    assert res["q26_er_clusters"] > 0
    assert res["q44_dedup_clusters"] > 0
    assert res["tz"] == "UTC"
    assert "InferFiltersFromGenerate" in res["excluded"]
    assert res["ckpt_set"] is True
