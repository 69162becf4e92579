"""SparkSession factory tuned for the ER workload.

Local-mode defaults mirror what we would submit to a real cluster via
``spark-submit --py-files`` (see ``plans/submit.py``): AQE on (runtime
re-planning + skew-join splitting), Arrow on (every pandas UDF crosses the
JVM/Python boundary in columnar batches), UTC session timezone (oracle
comparison against DuckDB's naive-UTC timestamps), and shuffle partitions
sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "tabiya-er-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    On a real cluster the same conf block ships unchanged; nothing here is
    local-only except the master fallback.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalescing of small shuffle partitions + skew-join
        # splitting. The north rule demands explicit skew handling; AQE is
        # the built-in half (salting in operators/blocking.py is the other).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow: all pandas UDF traffic is columnar-batched.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Split small local files into >= cores scan partitions; on a real
        # cluster input splits dominate and this floor is a no-op.
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.sql.leafNodeDefaultParallelism", str(shuffle_partitions))
        # 64 MB broadcast ceiling (default 10 MB): the ER feature table
        # (rid, tokens, name_key, 64-dim embedding) measures ~40 MB per 50k
        # records — under 10 MB Spark sort-merge-joins 15M candidate pairs
        # against it (measured 218s); broadcast-hash does it in 23s. On a
        # real cluster executors have GBs; 64 MB is a conservative ceiling,
        # and genuinely large dimensions still fall back to SMJ via AQE.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # Iterative connected-components checkpoints truncate lineage here.
        .config("spark.checkpoint.compress", "true")
        # InferFiltersFromGenerate infers `size(x)>0 AND isnotnull(x)` from
        # every explode and pushes it below exchanges, INLINING the generator
        # input expression into the filter. Our generator inputs are expensive
        # computed columns (tokenize->shingle trees), so the rule re-evaluates
        # them 3x per row on the pre-shuffle (often single-split) side —
        # measured 6-13x slowdown on the shingle/minhash family at sf0.1.
        # Exploded shingle arrays are never null/empty here, so the inferred
        # filter buys nothing.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Reliable checkpoint dir for the iterative operators (connected
    # components / transitive closure): their per-iteration lineage
    # truncation must be a RELIABLE checkpoint — localCheckpoint stores
    # blocks on executors only, so one lost executor after truncation kills
    # the job unrecoverably on a real cluster. Point
    # SPARK_GRAFT_CHECKPOINT_DIR at durable shared storage (HDFS/S3) when
    # submitting; the local-mode default below is equivalent there.
    if spark.sparkContext.getCheckpointDir() is None:
        import tempfile

        ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or os.path.join(
            tempfile.gettempdir(), f"spark-graft-ckpt-{os.getpid()}"
        )
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark
