"""Driver-contract query battery: each operator from SURVEY.md §2 expressed
as (a) an idiomatic Spark DataFrame query over the /root/testdata tables and
(b) an equivalent ANSI-SQL oracle for DuckDB.

Cross-engine determinism rules used throughout (documented once here):

  * money/count aggregates go through DECIMAL casts so sums are exact and
    order-independent, then cast back to double at the end;
  * similarity scores are single-expression rationals (p/q) or quantized
    integer arithmetic (embeddings -> round(x*1e6) bigints) so both engines
    produce bit-identical doubles; doubles are additionally round()ed;
  * hashes are md5/sha256 of explicitly formatted strings (never engine
    default casts of timestamps);
  * every computed column is aliased identically in both dialects;
  * ranking ties always break on a unique id column.

The shared text pipeline (tokens -> 3-word shingles -> md5 MinHash) matches
functions/text.py + operators/blocking.py semantics exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tabiya_livelihoods_classifier_spark.functions.text import (
    canonicalize_text,
    shingles,
    tokens,
)
from tabiya_livelihoods_classifier_spark.operators.blocking import (
    minhash_signature,
)
from tabiya_livelihoods_classifier_spark.session import ensure_session

# --------------------------------------------------------------------------
# table access
# --------------------------------------------------------------------------

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver's correctness harness passes an arbitrary session into
    # queries(); apply the engine's runtime contract (UTC timezone /
    # generate-pushdown exclusion / Arrow / checkpoint dir) on first touch
    # instead of assuming session.get_spark built it.
    ensure_session(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_TABLE_ROWS_CACHE: dict[tuple, int] = {}


def _table_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet FOOTER metadata — no Spark job. Used
    for plan-construction branches (q20's exact-vs-IVF gate), where an
    eager count() action at plan-build time would cost a full scan per
    call; footers are a few KB and the result is cached per (sf_dir,
    table)."""
    import pathlib

    import pyarrow.parquet as pq

    path = pathlib.Path(sf_dir) / f"{name}.parquet"
    # mtime in the key: a corpus regenerated at the same path within one
    # process must not serve a stale count (q20's exact-vs-IVF gate would
    # branch differently from the oracle's live COUNT(*)).
    key = (str(path.resolve()), name, path.stat().st_mtime_ns)
    if key not in _TABLE_ROWS_CACHE:
        files = (
            sorted(path.rglob("*.parquet")) if path.is_dir() else [path]
        )
        _TABLE_ROWS_CACHE[key] = sum(
            pq.ParquetFile(f).metadata.num_rows for f in files
        )
    return _TABLE_ROWS_CACHE[key]


def _dec(col: Column, scale: int = 2) -> Column:
    return col.cast(f"decimal(18,{scale})")


# --------------------------------------------------------------------------
# Q01  pricing summary (A9 aggregation family; TPC-H Q1 shape)
#      ref: counter summaries 2_1...py:140-197 generalized to grouped aggs
# --------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # Two-level aggregation instead of COUNT(DISTINCT) in the grouped agg:
    # a single-pass countDistinct plans an Expand that DOUBLES the 6M-row
    # fact through the aggregate (one copy per grouping set); pre-grouping
    # by (flag, status, orderkey) shuffles only the ~1.5M partial rows and
    # the distinct count falls out as COUNT(*) over groups (guide §2.3:
    # aggregate before you shuffle). Decimal partial sums re-sum exactly
    # (decimal addition is exact and associative at these precisions), so
    # the final doubles are bit-identical to the one-pass form.
    lvl1 = (
        li.filter(F.col("l_shipdate") <= "1997-09-02")
        .groupBy("l_returnflag", "l_linestatus", "l_orderkey")
        .agg(
            F.sum(_dec(F.col("l_quantity"))).alias("s_qty"),
            F.sum(_dec(F.col("l_extendedprice"))).alias("s_base"),
            F.sum(
                _dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount"))
            ).alias("s_disc"),
            F.count("*").alias("c_rows"),
        )
    )
    return (
        lvl1.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("s_qty").cast("double").alias("sum_qty"),
            F.sum("s_base").cast("double").alias("sum_base"),
            F.sum("s_disc").cast("double").alias("sum_disc_price"),
            F.sum("c_rows").alias("n_rows"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1997-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q02  grouped top-k (T1: torch.topk analog, linker.py:306-311)
# --------------------------------------------------------------------------


def q02_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
    )


Q02_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk
  FROM part) t
WHERE rnk <= 3
"""


# --------------------------------------------------------------------------
# Q03  broadcast dim-join chain (J1/J12: dict-lookup joins 2_2...py:106-141)
# --------------------------------------------------------------------------


def q03_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    rev = _dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount"))
    # NOTE: the q01-style two-level countDistinct rewrite was A/B'd here
    # (3 interleaved runs at sf1.0) and does NOT win: the join chain
    # dominates and the (r_name, o_orderkey) pre-group shuffles 1.5M
    # decimal partials where Expand's map-side partial agg was already
    # compact for 5 region groups. Left as the single-pass form.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("r_name")
    )


Q03_SQL = """
SELECT r_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# --------------------------------------------------------------------------
# Q04/Q05  semi / anti joins (J10 validity filter; J11 anti-join resume)
# --------------------------------------------------------------------------


def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


Q04_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


Q05_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --------------------------------------------------------------------------
# Q06  last-wins compaction (S12/A6: compact_ndjson 3_1...py:185-215)
# --------------------------------------------------------------------------


def q06_last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


Q06_SQL = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Q07  exact dedupe with representative mapping (A4/A5/A8)
# --------------------------------------------------------------------------

_CANON_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[\\n\\r\\t]', ' ', 'g'),"
    " ' {2,}', ' ', 'g'))"
)


def _canon_doc(col: Column) -> Column:
    return F.lower(canonicalize_text(col))


def q07_dedupe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    canon = docs.select("doc_id", _canon_doc(F.col("text")).alias("canon"))
    w = Window.partitionBy("canon")
    return canon.select(
        "doc_id",
        F.min("doc_id").over(w).alias("keep_id"),
        F.count("*").over(w).alias("group_size"),
    )


Q07_SQL = f"""
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY canon) AS keep_id,
       COUNT(*)    OVER (PARTITION BY canon) AS group_size
FROM (SELECT doc_id, {_CANON_SQL} AS canon FROM documents) t
"""


# --------------------------------------------------------------------------
# Q08  canonicalization (P1/P3/P4) — per-row text invariant on documents
# --------------------------------------------------------------------------


def q08_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _canon_doc(F.col("text")).alias("canon_text"),
        F.length(_canon_doc(F.col("text"))).alias("canon_len"),
    )


Q08_SQL = f"""
SELECT doc_id, {_CANON_SQL} AS canon_text, length({_CANON_SQL}) AS canon_len
FROM documents
"""


# --------------------------------------------------------------------------
# Q09  staleness/active flag (P13: compute_active_flags 3_2b...py:447-456)
# --------------------------------------------------------------------------


def q09_active_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("m"))
    return (
        ev.crossJoin(F.broadcast(max_ts))
        .select(
            "event_id",
            (
                F.datediff(F.to_date("m"), F.to_date("ts")) <= 120
            ).alias("active"),
        )
    )


Q09_SQL = """
SELECT event_id,
       date_diff('day', CAST(ts AS DATE),
                 CAST((SELECT MAX(ts) FROM events) AS DATE)) <= 120 AS active
FROM events
"""


# --------------------------------------------------------------------------
# Q10  composite-score keep-best dedupe (P12+A5: 1_1...py:254-265)
# --------------------------------------------------------------------------


def q10_best_order_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    score = _dec(F.col("o_totalprice")) + F.length("o_orderpriority").cast(
        "decimal(18,2)"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("score").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("score", score.cast("double"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "score")
    )


Q10_SQL = """
SELECT o_custkey, o_orderkey, score FROM (
  SELECT o_custkey, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2))
              + CAST(length(o_orderpriority) AS DECIMAL(18,2)) AS DOUBLE) AS score,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
                                     + CAST(length(o_orderpriority) AS DECIMAL(18,2)) DESC,
                                     o_orderkey ASC) AS rn
  FROM orders) t
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Q11  row hash (P19: _row_hash 3_2b...py:875-878) with explicit formatting
# --------------------------------------------------------------------------


def q11_row_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    payload = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
    )
    return orders.select(
        "o_orderkey", F.sha2(payload, 256).alias("row_hash")
    )


Q11_SQL = """
SELECT o_orderkey,
       sha256(CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
              || '|' || strftime(o_orderdate, '%Y-%m-%d')) AS row_hash
FROM orders
"""


# ==========================================================================
# Text / near-duplicate operators on the `documents` table.
#
# The documents corpus has a 31-word vocabulary, so token-level Jaccard is
# non-discriminative (random pairs ~0.73); every near-dup operator works on
# 3-word shingles (random pairs ~0.0, perturbed copies ~0.93) — mirroring
# the ER pipeline's MinHash-over-signature design at document granularity.
#
# A deterministic "perturbed corpus" (originals + appended-marker near-dups
# + uppercased exact-dups) gives the dedup operators real positives; both
# engines derive it identically.
# ==========================================================================

_TOK_LIST_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)

_CORPUS_CTE = """
corpus AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' near duplicate copy marker', lang
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000, upper(text), lang
  FROM documents WHERE doc_id % 5 = 0
)
"""

_SHINGLE_CTE = f"""
tok AS (SELECT doc_id, lang, {_TOK_LIST_SQL} AS ts FROM corpus),
shing AS (
  SELECT doc_id, lang,
         CASE WHEN len(ts) >= 3
              THEN list_distinct(list_transform(range(1, len(ts) - 1),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
              ELSE [array_to_string(ts, ' ')] END AS sh
  FROM tok)
"""


def _fanout_partitions(
    spark: SparkSession, sf_dir: str, table: str, per_task_bytes: int = 8 << 20
) -> int:
    """Byte-adaptive fan-out for the single-row-group local test parquet:
    one task per ~8 MB of source, clamped to the core count. At cluster
    scale the source bytes dwarf cores x 8 MB so this is exactly
    defaultParallelism (every core busy); at test scale it avoids
    scheduling dozens of near-empty tasks per stage — with a 32-core
    session and a 0.6 MB corpus, a fixed defaultParallelism fan-out made
    EVERY downstream stage (stage write, lineage scan, grouped aggregates)
    pay 32-96 task launches to move kilobytes."""
    from pathlib import Path as _Path

    src = _Path(sf_dir) / f"{table}.parquet"
    nbytes = (
        sum(f.stat().st_size for f in src.rglob("*") if f.is_file())
        if src.is_dir()
        else (src.stat().st_size if src.exists() else 0)
    )
    cores = spark.sparkContext.defaultParallelism
    return max(1, min(cores, -(-nbytes // per_task_bytes)))


_TABLE_ID_COL = {
    "documents": "doc_id", "events": "event_id", "part": "p_partkey",
    "orders": "o_orderkey", "customer": "c_custkey",
    "embeddings": "vec_id", "lineitem": "l_orderkey",
}


def _cpu_fanout(
    spark: SparkSession, sf_dir: str, table: str, id_col: str | None = None,
    per_task_bytes: int = 256 << 10,
) -> Callable[[DataFrame], DataFrame]:
    """Fan a CPU-dense per-row query across cores. The local test parquet
    holds ONE row group per table, so (despite files.minPartitionNum) a
    single task does all the work of any no-shuffle query — measured: q36's
    1M-row JSON parse cascade ran single-threaded at sf1.0. Per-task budget
    is small (default 256 KB) because these rows are parse/hash-dense, not
    scan-dense; the byte-adaptive cap (_fanout_partitions) keeps tiny
    corpora at 1 task and real corpora at defaultParallelism, where input
    splits dominate anyway (same rationale as _perturbed_corpus)."""
    n = _fanout_partitions(spark, sf_dir, table, per_task_bytes)
    key = id_col or _TABLE_ID_COL[table]
    return lambda df: df.repartition(n, key) if n > 1 else df


def _perturbed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-row-group local parquet = 1 scan task; fan the corpus out so
    # the tokenize/shingle/minhash pipelines downstream use every core (at
    # real scale the input has thousands of splits and this shuffle of the
    # raw docs is the cheapest exchange in the whole plan). Full core
    # fan-out on purpose, NOT the byte-adaptive _fanout_partitions: this
    # frame feeds the costliest CPU per input byte in the battery (regex
    # tokenize -> shingle -> 16-permutation md5 minhash), and the staged
    # shingle snapshot inherits this partitioning as its file count — a
    # byte-proportional write collapsed it to ONE file at test scale and
    # serialized every downstream md5 grind (q13 2.6x slower). The shuffle
    # is placed AFTER the perturbation union so the write is cores files,
    # not 3 x cores.
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    near = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" near duplicate copy marker")).alias(
                "text"
            ),
            "lang",
        )
    )
    exact = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.upper(F.col("text")).alias("text"),
            "lang",
        )
    )
    return (
        docs.unionByName(near)
        .unionByName(exact)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )


def _with_shingles(corpus: DataFrame) -> DataFrame:
    # bind tokens to an attribute FIRST: inside shingles' transform lambda a
    # raw expression tree would be re-evaluated once per shingle index
    # (regexp split per slice — quadratic in tokens), an attribute is not.
    #
    # The staged frame carries sh PRE-SORTED plus the two per-doc scalars
    # every q12 branch needs — n (shingle count) and ss (the set-signature
    # md5) — so downstream consumers are pure column-pruned projections of
    # the committed parquet: q12's per-doc stats frame needs NO persist +
    # eager-count barrier of its own (one whole Spark job removed from the
    # battery's critical path), and the sort/md5 CPU is paid once in the
    # shared stage instead of once per consumer. Every consumer is
    # order-insensitive (set ops, explode+min minhash), so the sort is free
    # to impose here.
    return (
        corpus.select("doc_id", "lang", tokens(F.col("text")).alias("ts"))
        .select("doc_id", "lang", F.array_sort(shingles(F.col("ts"), 3)).alias("sh"))
        .select(
            "doc_id",
            "lang",
            "sh",
            F.size("sh").alias("n"),
            F.md5(F.array_join("sh", "\x01")).alias("ss"),
        )
    )


def _stage_store(spark: SparkSession):
    """Battery-scoped StageStore (bench.py wipes the root per run)."""
    import os as _os

    from tabiya_livelihoods_classifier_spark.storage import StageStore

    root = _os.environ.get("SPARK_GRAFT_STAGE_DIR", "/tmp/spark_graft_stages")
    return StageStore(spark, root)


def _corpus_bytes(sf_dir: str, table: str = "documents") -> int:
    from pathlib import Path as _Path

    src = _Path(sf_dir) / f"{table}.parquet"
    if src.is_dir():
        return sum(f.stat().st_size for f in src.rglob("*") if f.is_file())
    return src.stat().st_size if src.exists() else 0


def _corpus_mtime(sf_dir: str, table: str = "documents") -> int:
    from pathlib import Path as _Path

    src = _Path(sf_dir) / f"{table}.parquet"
    return src.stat().st_mtime_ns if src.exists() else 0


def _shingled_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenized + shingled perturbed corpus, materialized ONCE per
    (corpus, params) through storage.StageStore. The regex tokenize +
    3-shingle pass is the dominant cost of the whole similarity family
    (q12 consumes the frame from 2 plan branches, q13 from 1, the q14 LSH
    stage from 2) — without the stage each branch re-runs it. Reading the
    committed snapshot costs one column-pruned parquet scan per branch and
    is durable across executor loss."""
    from tabiya_livelihoods_classifier_spark.storage import params_hash

    ph = params_hash("shingles_v2", str(sf_dir), _corpus_mtime(sf_dir), 3)
    stage = f"shingles_{ph}"
    store = _stage_store(spark)
    if store.is_committed(stage, ph):
        return store.read(stage)
    return store.commit(
        stage, _with_shingles(_perturbed_corpus(spark, sf_dir)), ph
    )


# --------------------------------------------------------------------------
# Q12  shingle-Jaccard similarity join (U2/J13/J14 family)
# --------------------------------------------------------------------------


# Candidate-generation guard: shingles present in more docs than this are
# skipped for PAIR GENERATION (their quadratic fan-out buys ~no precision:
# a pair at Jaccard >= 0.5 shares many rare shingles). The cap bounds the
# self-join (<= cap^2/2 pairs per shingle) — same discipline as the LSH
# path's block purging (operators/blocking.purge_oversized). Recall bound:
# a pair ALL of whose shared shingles are hot is only recovered when the
# two shingle SETS are identical (the set-signature path below, covering
# the duplicate-heavy case of >cap near-identical docs); a non-identical
# pair overlapping exclusively on hot shingles stays ungenerated by design.
# Jaccard on every EMITTED pair is exact: |rare∩| is counted in the
# candidate join itself, |hot∩| from the per-doc hot-shingle arrays (tiny:
# bounded by the number of distinct hot shingles), and |A∪B|=|A|+|B|-|A∩B|
# from per-doc shingle counts — no full-shingle-array rejoin anywhere.
SHINGLE_DF_CAP = 200


def _pair_explode(
    grouped: DataFrame,
    arr: str,
    a_name: str = "id_a",
    b_name: str = "id_b",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """STREAMED (arr[i], arr[j]) i<j pair emission from a SORTED array
    column — the candidate-generation primitive shared by the dedup family
    (q12 rare-shingle and set-signature pairs, q14 LSH buckets, q42
    bucket/intra pairs). posexplode picks the left id, then a second
    explode over slice(arr, i+2, n) streams the right ids.

    Why two generators instead of one materialized pair array: the previous
    formulation (flatten(transform(...)) of C(n,2) structs, then explode)
    held EVERY pair of a group in ONE row before the explode — a corpus
    with one value duplicated 1e6 times builds a C(1e6,2)-element array in
    a single task (executor OOM; above ~65k it exceeds the JVM array-length
    limit outright). Here the widest row is O(n) (the group's id array,
    which the upstream collect_list already materializes anyway), the two
    Generate nodes pipeline inside one whole-stage-codegen stage, and total
    streamed bytes are the same order as the pair OUTPUT itself — i.e. the
    emission is output-bound, never a single-row memory spike. Pair order
    (a < b) is inherited from the array sort; `keep` columns pass through.
    """
    step = grouped.select(
        *keep,
        F.col(arr).alias("_arr"),
        F.posexplode(F.col(arr)).alias("_i", a_name),
    )
    return step.select(
        *keep,
        a_name,
        F.explode(
            F.slice(F.col("_arr"), F.col("_i") + 2, F.size(F.col("_arr")))
        ).alias(b_name),
    )


def _jaccard_pairs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shape chosen by measurement: the classic rare-shingle SELF-JOIN plan
    # (round 2) consumed the shingled corpus from 10 branches (10 full
    # tokenize+shingle passes) and pushed 2.7M join rows through 8
    # sequential exchanges. This formulation groups the exploded corpus by
    # shingle ONCE and generates candidate pairs INSIDE the grouped arrays
    # (bounded by SHINGLE_DF_CAP^2/2 per shingle), so the whole query is ~5
    # exchanges with no self-join; the shingled corpus itself comes from
    # the shared battery stage (one tokenize pass per battery, not per
    # branch — _shingled_staged).
    sh = _shingled_staged(spark, sf_dir)
    exploded = sh.select("doc_id", F.explode("sh").alias("s"))
    # shingles() emits distinct shingles per doc, so the group size IS the
    # doc frequency; sorted (packed-id) doc lists make pair order
    # (id_a < id_b) deterministic in-array — see pbys below.
    #
    # the (tiny, bounded) hot-shingle set folded back as a broadcast 1-row
    # aggregate — same pattern as the ER pipeline's stop-token array. Doc
    # frequency comes from count(*), NOT size(collect_list): the count's
    # partial aggregate combines map-side, so this branch's shuffle carries
    # (shingle, long) — vocabulary-sized — instead of a second copy of the
    # full doc-list shuffle.
    hot_one = (
        exploded.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .agg(F.collect_list("s").alias("hot_g"))
    )
    empty = F.array().cast("array<string>")
    # per-doc stats need NO aggregation — and since the shared stage
    # pre-computes n (shingle count) and ss (set-signature md5) on the
    # committed parquet, NO persist/eager-count barrier either: each of the
    # three consumers (the two sides of the pair join, the set-signature
    # grouping) pays only a column-pruned scan of the tiny snapshot plus
    # the hot-set intersect, and the identical broadcast-hot subtrees reuse
    # one exchange. Empty shingle sets are excluded (Jaccard undefined —
    # and md5("") must not pair all empty docs at 1.0).
    stats = (
        sh.filter(F.col("n") > 0)
        .crossJoin(F.broadcast(hot_one))
        .select(
            "doc_id",
            "n",
            F.array_intersect("sh", F.coalesce("hot_g", empty)).alias(
                "hot_arr"
            ),
            "ss",
        )
    )
    # candidate pairs streamed per rare shingle: (ds[i], ds[j]) for i < j —
    # fan-out <= C(SHINGLE_DF_CAP, 2) per shingle, no join, no materialized
    # pair array. The grouped count over them IS |rare(A) ∩ rare(B)|.
    #
    # PRUNE BEFORE THE JOIN (guide §2.3 / §3.2: reduce the big side before
    # it moves): the distinct-pair aggregate output is ~|corpus|^2-shaped on
    # template corpora (measured 268M distinct pairs at sf1.0) while the
    # final jac >= 0.5 survivors are ~4 orders smaller (36k). Joining the
    # full aggregate against per-doc stats twice was the round-6 plan's
    # scale wall. Instead each doc's two scalars (n = shingle count, nh =
    # hot-shingle count) ride WITH its id through the emission, packed into
    # one bigint — id<<24 | min(n,4095)<<12 | min(nh,4095) — so the shuffle
    # rows stay two longs wide and array_sort still orders by doc id (the
    # high bits). After the count aggregate, a NECESSARY condition for
    # jaccard >= 0.5 prunes in-stage, before any join:
    #     common = common_rare + |hot(A) ∩ hot(B)|
    #            <= common_rare + min(nh_a, nh_b)
    #     jac = common/(na+nb-common) >= 0.5  <=>  3*common >= na+nb
    # so every true survivor satisfies 3*(cr + min(nh)) >= na+nb. The caps
    # stay conservative: an understated (capped) n only shrinks the RHS
    # (keeps more), and a capped nh (= 4095 sentinel) skips the prune for
    # that pair outright. Survivors then pay the exact hot-array intersect
    # join; exact jaccard is computed from the UNCAPPED stats columns, so
    # emitted rows are bit-identical to the unpruned plan.
    nh = F.size(F.array_intersect("sh", F.coalesce("hot_g", empty)))
    packed = (
        F.col("doc_id") * F.lit(1 << 24).cast("long")
        + F.least(F.col("n"), F.lit(4095)).cast("long") * F.lit(4096).cast("long")
        + F.least(nh, F.lit(4095)).cast("long")
    )
    pex = (
        sh.filter(F.col("n") > 0)
        .crossJoin(F.broadcast(hot_one))
        .select(packed.alias("p"), F.explode("sh").alias("s"))
    )
    pbys = pex.groupBy("s").agg(
        F.array_sort(F.collect_list("p")).alias("ds")
    )
    # Emission-time size-ratio prune (before the exchange): jac >= 0.5
    # needs common >= (na+nb)/3 and common <= min(na,nb), so surviving
    # pairs satisfy 2*min(na,nb) >= max(na,nb). The packed n fields make
    # this a pair of shift/compare ops inside the generate stage — measured
    # 23% of the 299M sf1.0 emissions dropped before they are shuffled
    # (capped n = 4095 sentinel bypasses the prune, keeping it necessary).
    em_na = F.shiftright("pa", 12).bitwiseAND(F.lit(4095))
    em_nb = F.shiftright("pb", 12).bitwiseAND(F.lit(4095))
    # The pair aggregate's distinct-group count is ~|corpus|^2-shaped
    # (268M at sf1.0) while the session's shuffle partitions track the
    # core count: at 32 partitions each reduce task held an ~8M-entry
    # aggregation map and spilled to sort. Widen THIS exchange
    # byte-adaptively (~48 KB of source corpus per partition, floored at
    # defaultParallelism so small corpora keep today's plan, capped at
    # 32x cores): interleaved A/B at sf1.0 measured 34-37 s at 32
    # partitions vs 17-20 s at 128 (guide §5: smaller per-task state
    # beats spill). The groupBy reuses the repartition's hash
    # partitioning, so no extra exchange is introduced.
    dp = spark.sparkContext.defaultParallelism
    n_pair_parts = max(dp, min(dp * 32, -(-_corpus_bytes(sf_dir) // (48 << 10))))
    cand = (
        _pair_explode(
            pbys.filter(
                (F.size("ds") >= 2) & (F.size("ds") <= SHINGLE_DF_CAP)
            ),
            "ds",
            "pa",
            "pb",
        )
        .filter(
            (em_na == 4095)
            | (em_nb == 4095)
            | (2 * F.least(em_na, em_nb) >= F.greatest(em_na, em_nb))
        )
        .repartition(n_pair_parts, "pa", "pb")
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("common_rare"))
    )
    na_p = F.shiftright("pa", 12).bitwiseAND(F.lit(4095))
    nb_p = F.shiftright("pb", 12).bitwiseAND(F.lit(4095))
    nha_p = F.col("pa").bitwiseAND(F.lit(4095))
    nhb_p = F.col("pb").bitwiseAND(F.lit(4095))
    may_survive = (
        (nha_p == 4095)
        | (nhb_p == 4095)
        | (
            3 * (F.col("common_rare") + F.least(nha_p, nhb_p))
            >= na_p + nb_p
        )
    )
    cand_f = cand.filter(may_survive).select(
        F.shiftright("pa", 24).alias("id_a"),
        F.shiftright("pb", 24).alias("id_b"),
        "common_rare",
    )
    sa = stats.select(
        F.col("doc_id").alias("id_a"), F.col("n").alias("na"),
        F.col("hot_arr").alias("ha"),
    )
    sb = stats.select(
        F.col("doc_id").alias("id_b"), F.col("n").alias("nb"),
        F.col("hot_arr").alias("hb"),
    )
    common = F.col("common_rare") + F.size(F.array_intersect("ha", "hb"))
    jac = F.round(
        common.cast("double")
        / (F.col("na") + F.col("nb") - common).cast("double"),
        6,
    )
    # stats is CORPUS-sized with fat array payloads (hot_arr): its parquet
    # footprint (the compressed staged snapshot) sits under the session's
    # 64 MB broadcast ceiling while the deserialized rows run to GBs at
    # sf1.0+ — Catalyst's size estimate follows the file bytes, picks a
    # broadcast, and the build collect blows spark.driver.maxResultSize.
    # Pin the strategy: shuffled-hash with the stats side as build (guide
    # §3.1 — pick deliberately; a corpus-sized side must never broadcast).
    rare_pairs = (
        cand_f.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    )
    # hot-only recovery (duplicate-heavy corpora): docs whose shingle sets
    # are IDENTICAL pair at Jaccard exactly 1.0 even when every shingle is
    # hot — pair them within set-signature groups, streamed like cand (one
    # shuffle of (ss, doc_id), no self-join; these groups are UNCAPPED, so
    # the streamed emission is what keeps a 1e5-duplicate corpus from
    # building a C(1e5,2) array in one task — see _pair_explode).
    eq = (
        _pair_explode(
            sh.filter(F.col("n") > 0)
            .groupBy("ss")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
            .filter(F.size("ds") >= 2),
            "ds",
        )
        .select(
            "id_a",
            "id_b",
            F.lit(1.0).alias("jaccard"),
        )
    )
    return rare_pairs.unionByName(eq).dropDuplicates(["id_a", "id_b"])


def q12_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged like q14 (_lsh_pairs_staged): committing the result through
    the StageStore bounds the pair computation to ONE materialization per
    (corpus, params). The plan itself holds no persists and no eager
    counts (r5 ADVICE asked for the leak fix; r6 removed the barriers
    outright): per-doc stats (n/ss) live on the committed shingle snapshot
    (_with_shingles), the hot-shingle set comes from a count aggregate
    whose shuffle is vocabulary-sized, and the doc-list grouping has a
    single consumer — the whole query is one Spark job plus the commit."""
    from tabiya_livelihoods_classifier_spark.storage import params_hash

    ph = params_hash(
        "jaccard_pairs_v2", str(sf_dir), _corpus_mtime(sf_dir),
        SHINGLE_DF_CAP, 0.5,
    )
    stage = f"jaccard_pairs_{ph}"
    store = _stage_store(spark)
    if store.is_committed(stage, ph):
        return store.read(stage)
    return store.commit(stage, _jaccard_pairs_plan(spark, sf_dir), ph)


Q12_SQL = f"""
WITH {_CORPUS_CTE.strip()},
{_SHINGLE_CTE.strip()},
ex AS (SELECT doc_id, unnest(sh) AS s FROM shing),
hot AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) > {SHINGLE_DF_CAP}),
stats AS (
  SELECT doc_id, COUNT(*) AS n,
         COALESCE(list_sort(list(s) FILTER (WHERE s IN (SELECT s FROM hot))),
                  []) AS hot_arr,
         md5(array_to_string(list_sort(list(s)), chr(1))) AS ss
  FROM ex GROUP BY doc_id),
rare AS (SELECT doc_id, s FROM ex WHERE s NOT IN (SELECT s FROM hot)),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common_rare
  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
rare_pairs AS (
  SELECT id_a, id_b,
         round(CAST(common_rare + len(list_intersect(sa.hot_arr, sb.hot_arr))
                    AS DOUBLE)
               / CAST(sa.n + sb.n - common_rare
                      - len(list_intersect(sa.hot_arr, sb.hot_arr))
                      AS DOUBLE), 6) AS jaccard
  FROM cand
  JOIN stats sa ON sa.doc_id = id_a
  JOIN stats sb ON sb.doc_id = id_b),
eq AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
  FROM stats x JOIN stats y ON x.ss = y.ss AND x.doc_id < y.doc_id)
SELECT DISTINCT id_a, id_b, jaccard FROM (
  SELECT * FROM rare_pairs WHERE jaccard >= 0.5
  UNION ALL SELECT * FROM eq)
"""


# --------------------------------------------------------------------------
# Q13  MinHash signatures (blocking core, engine-portable md5 MinHash)
# --------------------------------------------------------------------------


def _minhash_sig_relational(
    spark: SparkSession, sh: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """(doc_id, h, minhash): explode shingles x hash ids, min(md5) per (doc,h).

    Identical result to the nested-HOF minhash_signature() but immune to
    CollapseProject duplicating the shingle expression into all signature
    columns, and shuffle-partial (map-side min) at scale.
    """
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    # one grouped min-aggregate per permutation over the EXPLODED shingles:
    # same md5 count as a hashes-cross-join, but no 16x row materialization
    # and the partial min happens map-side, so the shuffle carries only
    # (doc_id, 16 hashes) — the wide-then-posexplode shape is the one that
    # survives 100x scale.
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    wide = ex.groupBy("doc_id").agg(*aggs)
    return (
        wide.select(
            "doc_id",
            F.posexplode(F.array(*[F.col(f"m{i}") for i in range(num_hashes)])),
        )
        .withColumnRenamed("pos", "h")
        .withColumnRenamed("col", "minhash")
    )


def _minhash_sig_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 16-permutation MinHash signature frame, staged once per
    (corpus, params): q13 emits it and q14's band membership groups it —
    round 6 ran the explode + 16-way min aggregate twice per battery
    (guide §1.2: don't compute things twice)."""
    from tabiya_livelihoods_classifier_spark.storage import params_hash

    ph = params_hash(
        "minhash_sig_v1", str(sf_dir), _corpus_mtime(sf_dir), 16
    )
    stage = f"minhash_sig_{ph}"
    store = _stage_store(spark)
    if store.is_committed(stage, ph):
        return store.read(stage)
    sh = _shingled_staged(spark, sf_dir)
    return store.commit(stage, _minhash_sig_relational(spark, sh, 16), ph)


def q13_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_sig_staged(spark, sf_dir)


Q13_SQL = f"""
WITH {_CORPUS_CTE.strip()},
{_SHINGLE_CTE.strip()}
SELECT doc_id, h, MIN(md5(CAST(h AS VARCHAR) || ':' || s)) AS minhash
FROM (SELECT doc_id, unnest(sh) AS s FROM shing) ex
CROSS JOIN (SELECT unnest(range(0, 16)) AS h) hs
GROUP BY doc_id, h
"""


# --------------------------------------------------------------------------
# Q14  MinHash-LSH near-duplicate pairs (blocking + exact rescoring)
# --------------------------------------------------------------------------


def _band_membership(
    spark: SparkSession, sh: DataFrame, num_hashes: int = 16, band_rows: int = 2
) -> DataFrame:
    """(doc_id, bk) LSH band membership from a shingled frame — band keys
    built relationally from the exploded minhash signature (same reason as
    q13: a wide HOF signature invites expression duplication). Key format
    matches operators.blocking.minhash_band_keys: 'b{band}|h0|h1'. A doc's
    band keys are a pure function of its own shingles, which is what makes
    the incremental maintenance (q45) exact: old docs' keys never change
    when new docs arrive."""
    sig = _minhash_sig_relational(spark, sh, num_hashes)
    return _band_membership_from_sig(sig, band_rows)


def _band_membership_from_sig(sig: DataFrame, band_rows: int = 2) -> DataFrame:
    return (
        sig.groupBy(
            "doc_id", (F.col("h") / band_rows).cast("int").alias("band")
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("h", "minhash"))),
                    lambda x: x["minhash"],
                ),
                "|",
            ).alias("hashes")
        )
        .select(
            "doc_id",
            F.concat_ws(
                "|", F.concat(F.lit("b"), F.col("band").cast("string")),
                F.col("hashes"),
            ).alias("bk"),
        )
    )


def _lsh_pairs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tabiya_livelihoods_classifier_spark.functions.strsim import jaccard_expr

    # sh consumed from 2 branches (signature + exact-rescore features):
    # the shared stage makes each branch a parquet scan, not a re-tokenize
    sh = _shingled_staged(spark, sf_dir)
    # band keys built relationally from the exploded signature (same reason
    # as q13: a 16-column HOF signature invites expression duplication).
    # Key format matches operators.blocking.minhash_band_keys: 'b{band}|h0|h1'.
    # The signature comes from the shared stage q13 also emits, so a
    # battery computes the 16-way min aggregate once, not twice.
    mem = _band_membership_from_sig(_minhash_sig_staged(spark, sf_dir))
    # candidate pairs streamed per band bucket (one groupBy of the
    # membership fact instead of a bucket self-join): identical fan-out
    # bound — C(bucket, 2) either way — one fewer shuffle, pair order
    # (id_a < id_b) falls out of the array sort, and buckets are UNCAPPED
    # (identical docs share every band key), so the streamed emission is
    # what bounds task memory on duplicate-heavy corpora (_pair_explode).
    pairs = (
        _pair_explode(
            mem.groupBy("bk")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
            .filter(F.size("ds") >= 2),
            "ds",
        )
        .dropDuplicates()
    )
    # feats carries the full shingle arrays for every corpus doc: like q12's
    # stats frame, its parquet-size estimate is far below its deserialized
    # size, so an auto-broadcast here collects GBs to the driver at sf1.0+.
    # Explicit shuffled-hash keeps the exact-rescore join scale-safe.
    feats = sh.select("doc_id", "sh")
    out = (
        pairs.join(feats.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a").hint("shuffle_hash"), "id_a")
        .join(feats.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b").hint("shuffle_hash"), "id_b")
        .withColumn("jaccard", F.round(jaccard_expr(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= 0.6)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def _lsh_pairs_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup pair stage, materialized at most ONCE per (corpus,
    params) through storage.StageStore and shared by every consumer (q14
    emits it; q44 clusters it) — a battery run pays the LSH pipeline once,
    not once per consumer. The committed parquet is also the durable
    barrier that used to be a localCheckpoint in q44: reading a snapshot
    survives executor loss, localCheckpoint does not (VERDICT r3 #3).

    The stage key chains the corpus identity (sf_dir + documents.parquet
    mtime) with every parameter of the pair plan, so a changed input or
    config recomputes instead of serving stale pairs. bench.py wipes the
    stage root at battery start so timings never credit a previous run.
    """
    from tabiya_livelihoods_classifier_spark.storage import params_hash

    ph = params_hash(
        "lsh_pairs_v1", str(sf_dir), _corpus_mtime(sf_dir), 16, 2, 0.6
    )
    stage = f"lsh_pairs_{ph}"
    store = _stage_store(spark)
    if store.is_committed(stage, ph):
        return store.read(stage)
    return store.commit(stage, _lsh_pairs_plan(spark, sf_dir), ph)


def q14_lsh_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_pairs_staged(spark, sf_dir)


Q14_SQL = f"""
WITH {_CORPUS_CTE.strip()},
{_SHINGLE_CTE.strip()},
sig AS (
  SELECT doc_id, h, MIN(md5(CAST(h AS VARCHAR) || ':' || s)) AS minhash
  FROM (SELECT doc_id, unnest(sh) AS s FROM shing) ex
  CROSS JOIN (SELECT unnest(range(0, 16)) AS h) hs
  GROUP BY doc_id, h),
bands AS (
  SELECT doc_id, 'b' || CAST(h // 2 AS VARCHAR) || '|'
         || string_agg(minhash, '|' ORDER BY h) AS bk
  FROM sig GROUP BY doc_id, h // 2),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, sh FROM shing)
SELECT id_a, id_b,
       round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 6)
         AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 6)
      >= 0.6
"""


# --------------------------------------------------------------------------
# Q15  SimHash (64->32-bit) document sketch
# --------------------------------------------------------------------------


def _simhash_wide(corpus: DataFrame, nbits: int = 32) -> DataFrame:
    """(doc_id, simhash): nbits-wide SimHash per (doc_id, text) row
    (nbits <= 62: the sketch stays clear of the BIGINT sign bit).

    One md5 per token, then a single WIDE aggregate: 32 +/-1 bit-sum columns
    accumulated map-side (partial agg), so the shuffle carries exactly one
    32-column row per doc per mapper. The naive shape — crossJoin with a
    32-row k table — re-hashes every token 32x and shuffles a 32x-exploded
    fact; this shape survives a 100x scale-up, that one doesn't.

    Bit extraction parses the leading 15 hex chars into ONE bigint per
    token instance (a single conv), then each of the nbits sums is a pure
    integer shift/mask — the previous shape ran a per-bit
    substring+conv+cast string pipeline, i.e. nbits string parses per
    token. Bit k lives at shift 4*(14 - k//4) + k%4: hex digit k//4 is
    big-endian within the parsed number, bit k%4 is the digit's LSB-first
    bit — exactly the oracle's strpos/shift formula, so sketches are
    bit-identical.
    """
    assert nbits <= 60  # 15 hex chars -> one sign-safe bigint
    toks = corpus.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("token")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("num"),
    )
    aggs = [
        F.sum(
            F.shiftright(F.col("num"), 4 * (14 - k // 4) + k % 4)
            .bitwiseAND(F.lit(1))
            .cast("int")
            * 2
            - 1
        ).alias(f"s{k}")
        for k in range(nbits)
    ]
    wide = toks.groupBy("doc_id").agg(*aggs)
    simhash = None
    for k in range(nbits):
        bitval = F.when(
            F.col(f"s{k}") > 0, F.shiftleft(F.lit(1).cast("bigint"), k)
        ).otherwise(F.lit(0).cast("bigint"))
        simhash = bitval if simhash is None else simhash + bitval
    return wide.select("doc_id", simhash.alias("simhash"))


def q15_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full core fan-out: token-hash simhash is CPU-bound per input byte
    # (same rationale as _perturbed_corpus)
    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return _simhash_wide(docs.select("doc_id", "text"))


Q15_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOK_LIST_SQL})) AS token FROM documents),
bits AS (
  SELECT doc_id, k,
         SUM(2 * ((strpos('0123456789abcdef',
                          substr(md5(token), CAST(k // 4 AS INT) + 1, 1)) - 1)
                  >> (k % 4) & 1) - 1) AS s
  FROM toks CROSS JOIN (SELECT unnest(range(0, 32)) AS k) ks
  GROUP BY doc_id, k)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << k ELSE 0 END)
            AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Q16  document fingerprint (P19 analog over sorted token set)
# --------------------------------------------------------------------------


def q16_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _cpu_fanout(spark, sf_dir, "documents")(
        load(spark, sf_dir, "documents")
    )
    ts = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct(ts)), " ")).alias(
            "fingerprint"
        ),
    )


Q16_SQL = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_TOK_LIST_SQL})), ' '))
         AS fingerprint
FROM documents
"""


# --------------------------------------------------------------------------
# Q17  token statistics (text-analysis family)
# --------------------------------------------------------------------------


def q17_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _cpu_fanout(spark, sf_dir, "documents")(
        load(spark, sf_dir, "documents")
    )
    ts = tokens(F.col("text"))
    sum_len = F.aggregate(
        F.transform(ts, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.size(ts).alias("n_tokens"),
        F.size(F.array_distinct(ts)).alias("n_distinct"),
        F.round(
            sum_len.cast("double") / F.size(ts).cast("double"), 6
        ).alias("avg_token_len"),
    )


Q17_SQL = f"""
SELECT doc_id,
       len(ts) AS n_tokens,
       len(list_distinct(ts)) AS n_distinct,
       round(CAST(list_sum(list_transform(ts, x -> CAST(length(x) AS BIGINT)))
                  AS DOUBLE) / CAST(len(ts) AS DOUBLE), 6) AS avg_token_len
FROM (SELECT doc_id, {_TOK_LIST_SQL} AS ts FROM documents) t
"""


# --------------------------------------------------------------------------
# Q18  quality score (length + stopword-ratio heuristic)
# --------------------------------------------------------------------------

_STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def q18_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _cpu_fanout(spark, sf_dir, "documents")(
        load(spark, sf_dir, "documents")
    )
    ts = tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(ts, lambda t: F.array_contains(stop_arr, t)))
    n = F.size(ts)
    stop_ratio = F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )
    len_factor = F.least(F.lit(1.0), n.cast("double") / F.lit(100.0))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(len_factor * (1.0 - stop_ratio), 6).alias("quality"),
    )


_STOP_SQL = "['the','a','of','and','to','in']"

Q18_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK_LIST_SQL} AS ts FROM documents),
s AS (SELECT doc_id, len(ts) AS n,
             len(list_filter(ts, x -> list_contains({_STOP_SQL}, x))) AS n_stop
      FROM t)
SELECT doc_id, n AS n_tokens,
       round(CASE WHEN n > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n AS DOUBLE)
                  ELSE 0.0 END, 6) AS stop_ratio,
       round(least(1.0, CAST(n AS DOUBLE) / 100.0)
             * (1.0 - CASE WHEN n > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n AS DOUBLE)
                           ELSE 0.0 END), 6) AS quality
FROM s
"""


# --------------------------------------------------------------------------
# Q19  language guess by stopword voting (n-gram-heuristic language ID)
# --------------------------------------------------------------------------

_LANG_WORDS = [
    ("en", "the"), ("en", "a"), ("en", "and"), ("en", "of"),
    ("es", "el"), ("es", "la"), ("es", "de"), ("es", "y"),
    ("fr", "le"), ("fr", "la"), ("fr", "et"), ("fr", "de"),
    ("de", "der"), ("de", "die"), ("de", "und"), ("de", "das"),
]


def q19_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The lexicon is a FIXED 16-word constant, so the vote count per
    # candidate language is a pure per-row array expression: count tokens
    # (with multiplicity — array_intersect would dedupe) that fall in that
    # language's word list. The argmax (votes desc, lang asc — exactly the
    # oracle's ROW_NUMBER order) is array_min over (-votes, lang) structs,
    # and docs with zero matches fall out as an empty filtered array ->
    # null -> ('und', 0), mirroring the old left-join miss. This replaces
    # the previous explode -> broadcast-join -> groupBy -> window -> join
    # plan (3 exchanges + a token-level shuffle fact) with a single
    # zero-shuffle scan — same rows bit-for-bit (guide §2.4: remove
    # shuffles outright).
    by_lang: dict[str, list[str]] = {}
    for lang, word in _LANG_WORDS:
        by_lang.setdefault(lang, []).append(word)
    docs = _cpu_fanout(spark, sf_dir, "documents")(
        load(spark, sf_dir, "documents")
    )
    ts = docs.select("doc_id", "lang", tokens(F.col("text")).alias("ts"))
    cand = F.array(
        *[
            F.struct(
                (
                    -F.size(F.filter(F.col("ts"), lambda t: t.isin(*words)))
                )
                .cast("long")
                .alias("nv"),
                F.lit(lang).alias("cl"),
            )
            for lang, words in sorted(by_lang.items())
        ]
    )
    best = F.array_min(F.filter(cand, lambda x: x["nv"] < 0))
    return ts.select(
        "doc_id",
        "lang",
        F.coalesce(best["cl"], F.lit("und")).alias("guess"),
        F.coalesce(-best["nv"], F.lit(0).cast("long")).alias("votes"),
    )


_LANG_VALUES = ", ".join(f"('{lang}', '{w}')" for lang, w in _LANG_WORDS)

Q19_SQL = f"""
WITH lw(cand_lang, word) AS (VALUES {_LANG_VALUES}),
toks AS (SELECT doc_id, unnest({_TOK_LIST_SQL}) AS token FROM documents),
votes AS (
  SELECT doc_id, cand_lang, COUNT(*) AS votes
  FROM toks JOIN lw ON token = word GROUP BY 1, 2),
best AS (
  SELECT doc_id, cand_lang AS guess, votes,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY votes DESC, cand_lang ASC) AS rn
  FROM votes)
SELECT d.doc_id, d.lang,
       COALESCE(b.guess, 'und') AS guess,
       COALESCE(b.votes, 0) AS votes
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
"""


# ==========================================================================
# Embedding similarity search + IR metrics (J14/M7/T1/A10)
#
# Cross-engine float determinism: embeddings are quantized to
# round(x * 1e6) BIGINTs. Integer dot products / norms stay < 2^53, so every
# accumulation order yields the same exact value; the final cosine is one
# double division — bit-identical in both engines.
# ==========================================================================

_QUANT_SQL = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"

_KNN_CTE = f"""
vecs AS (
  SELECT vec_id, label, {_QUANT_SQL} AS q FROM embeddings),
norms AS (
  -- nq > 0 mirrors _quantized_vecs: zero-norm vectors produce NaN cosines
  -- whose rank order is engine-defined, so both engines exclude them
  SELECT * FROM (
    SELECT vec_id, label, q,
           list_sum(list_transform(q, x -> x * x)) AS nq
    FROM vecs) t
  WHERE nq > 0),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS candidate_id,
         a.label AS query_label, b.label AS candidate_label,
         CAST(list_sum(list_transform(range(1, 65),
                       i -> a.q[i] * b.q[i])) AS DOUBLE)
           / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) AS sim
  FROM norms a JOIN norms b ON b.vec_id <> a.vec_id
  WHERE a.vec_id % 10 = 0),
ranked AS (
  SELECT query_id, candidate_id, query_label, candidate_label,
         round(sim, 6) AS sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, candidate_id ASC) AS rnk
  FROM scored)
"""


def _quantized_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan the vectors across cores: single-file scan = 1 task, and every
    # consumer runs matmul/dot-product-heavy work per row — vector bytes
    # are ~100x denser in compute than the text tables, so the fan-out
    # budget is 1 MB/task, not the default 8 MB (at sf1.0 the 5.9 MB
    # embeddings file otherwise quantizes AND block-matmuls in ONE task)
    emb = load(spark, sf_dir, "embeddings").repartition(
        _fanout_partitions(spark, sf_dir, "embeddings", per_task_bytes=1 << 20),
        "vec_id",
    )
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000).cast("long"),
    )
    vecs = emb.select("vec_id", "label", q.alias("q"))
    nq = F.aggregate(
        F.transform(F.col("q"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # Zero-norm vectors are excluded from BOTH roles (query and candidate):
    # cosine of a zero vector is 0/0 = NaN, and the two exact-kNN strategies
    # disagree on NaN ordering (numpy argsort ranks NaN last and the
    # isfinite mask drops it; Spark's window ORDER BY sim DESC ranks NaN
    # FIRST) — so the cross-strategy bitwise contract silently breaks on a
    # degenerate row. Mirrored as `nq > 0` in every oracle twin's norms CTE.
    return vecs.withColumn("nq", nq).filter(F.col("nq") > 0)


def _idcg_table(spark: SparkSession, kmax: int) -> DataFrame:
    """(r, idcg) for r in 1..kmax with idcg = sum_{i<=r} 1/log2(i+1).

    Relational replacement for a hardcoded IDCG case table (evaluator.py
    computes this inside sentence-transformers' IR evaluator): rank
    discounts as exact DECIMAL(18,12) terms, prefix-summed with
    sequence+aggregate per row — the same decimal discipline as the DCG
    sums, so both engines agree bitwise. No window: an unpartitioned
    cumulative window (even over kmax<=32 rows) moves the table to a single
    partition and its WindowExec warning drowns out REAL single-partition
    regressions in the bench log.
    """
    dec = "decimal(18,12)"
    ranks = spark.range(1, kmax + 1).select(F.col("id").cast("int").alias("r"))
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.col("r")),
        F.lit(0).cast("decimal(20,12)"),
        lambda acc, i: (
            acc + (F.lit(1.0) / F.log2(i + 1)).cast(dec)
        ).cast("decimal(20,12)"),
    ).cast(dec)
    return ranks.select("r", idcg.alias("idcg"))


# Gate for the numpy block-matmul exact scorer: the query matrix (every
# 10th vector) is collected and broadcast to executors, so it must be
# bounded. At this cap the broadcast is <= ~50k queries x 64 int64 ~ 25 MB
# — the same order as Spark's own broadcast-join threshold. Above it the
# relational shuffle-replicated cartesian runs instead (no driver collect,
# no broadcast — survives any corpus size; q22's IVF is the sub-quadratic
# route anyway).
KNN_NUMPY_MAX_ROWS = 500_000


def _knn_topk(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Exact brute-force cosine top-k (queries = every 10th vector).

    Two physical strategies under one contract:
    - numpy block matmul (corpus <= KNN_NUMPY_MAX_ROWS): the quantized
      query matrix is broadcast and each Arrow batch of candidates is scored
      with one BLAS matmul + per-batch partial top-k — ~20x the
      element-at-a-time Catalyst aggregate-HOF dot product, and exact:
      integer-valued float64 products/sums stay < 2^53.
    - relational cartesian above the gate (see _knn_topk_relational).
    """
    if _table_rows(sf_dir, "embeddings") <= KNN_NUMPY_MAX_ROWS:
        return _knn_topk_numpy(spark, sf_dir, k)
    return _knn_topk_relational(spark, sf_dir, k)


def _knn_topk_numpy(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    import numpy as np

    vecs = _quantized_vecs(spark, sf_dir)
    # bounded driver collect (see KNN_NUMPY_MAX_ROWS): queries only
    qrows = (
        vecs.filter(F.col("vec_id") % 10 == 0)
        .select("vec_id", "label", "q", "nq")
        .collect()
    )
    lab_t = dict(vecs.dtypes)["label"]  # follow the corpus label type
    out_schema = (
        f"query_id bigint, candidate_id bigint, query_label {lab_t}, "
        f"candidate_label {lab_t}, sim double"
    )
    if not qrows:
        return spark.createDataFrame([], out_schema + ", rnk int")
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qlab = np.array([r["label"] for r in qrows], dtype=object)
    qmat = np.array([r["q"] for r in qrows], dtype=np.float64)
    qnrm = np.array([r["nq"] for r in qrows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((qids, qlab, qmat, qnrm))
    kk = int(k)

    def score_blocks(batches):
        import numpy as _np
        import pandas as _pd

        b_qids, b_qlab, b_qmat, b_qnrm = bc.value
        nq = len(b_qids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cid = pdf["vec_id"].to_numpy(dtype=_np.int64)
            cmat = _np.array(list(pdf["q"]), dtype=_np.float64)
            cnrm = pdf["nq"].to_numpy(dtype=_np.float64)
            clab = pdf["label"].to_numpy(dtype=object)
            # exact: quantized components <= 1e6, so every product and
            # 64-term sum is an integer < 2^53 — float64 matmul loses
            # nothing regardless of BLAS accumulation order. Denominator
            # mirrors the relational/oracle form sqrt(na_double*nb_double)
            # op-for-op, so sims are bitwise identical across strategies.
            sims = (b_qmat @ cmat.T) / _np.sqrt(
                b_qnrm[:, None] * cnrm[None, :]
            )
            sims[b_qids[:, None] == cid[None, :]] = -_np.inf  # self-match
            # partial top-k per batch under the GLOBAL total order
            # (sim desc, candidate_id asc): columns pre-sorted by id asc,
            # then a stable sort on -sim keeps ties id-ascending — so the
            # union of per-batch top-k provably contains the global top-k.
            order = _np.argsort(cid, kind="stable")
            cid_s = cid[order]
            sims_s = sims[:, order]
            kept = min(kk, cid_s.shape[0])
            top = _np.argsort(-sims_s, axis=1, kind="stable")[:, :kept]
            qi = _np.repeat(_np.arange(nq), kept)
            ci = top.ravel()
            s = sims_s[_np.repeat(_np.arange(nq), kept), ci]
            mask = _np.isfinite(s)  # drop self rows that slipped into top-k
            yield _pd.DataFrame(
                {
                    "query_id": b_qids[qi][mask],
                    "candidate_id": cid_s[ci][mask],
                    "query_label": b_qlab[qi][mask],
                    "candidate_label": clab[order][ci][mask],
                    "sim": s[mask],
                }
            )

    partials = vecs.mapInPandas(score_blocks, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("candidate_id").asc()
    )
    return (
        partials.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= kk)
        .select(
            "query_id",
            "candidate_id",
            "query_label",
            "candidate_label",
            F.round("sim", 6).alias("sim"),
            "rnk",
        )
    )


def _knn_topk_relational(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    vecs = _quantized_vecs(spark, sf_dir)
    a = vecs.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
    )
    b = vecs.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("label").alias("candidate_label"),
        F.col("q").alias("qb"),
        F.col("nq").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sim = dot.cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    # exact brute-force baseline, but with a SCALE-SAFE join strategy: a
    # shuffle-replicated cartesian (each task pairs one query block with one
    # candidate block) instead of broadcasting the entire candidate corpus
    # to every executor — the broadcast dies at 100 TB, the cartesian
    # doesn't. q22 is the sub-quadratic IVF route for the same predicate.
    scored = (
        a.crossJoin(b.hint("shuffle_replicate_nl"))
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn("sim", sim)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("candidate_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "candidate_id",
            "query_label",
            "candidate_label",
            F.round("sim", 6).alias("sim"),
            "rnk",
        )
    )


def _knn_topk_staged(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """The exact brute-force kNN ranking at kmax = max(IR_KS), staged once
    per (corpus, params) and shared by every exact-kNN consumer (q20's
    small-N branch at k=5, q21 at k=5, q41 at the full grid): a window
    rank is independent of the cutoff, so smaller-k consumers just filter
    rnk <= k on the committed snapshot instead of re-running the
    O(Q x C) scoring pass."""
    from tabiya_livelihoods_classifier_spark.storage import params_hash

    kmax = max(IR_K_GRID)
    ph = params_hash(
        "knn_topk_v1", str(sf_dir), _corpus_mtime(sf_dir, "embeddings"), kmax
    )
    stage = f"knn_topk_{ph}"
    store = _stage_store(spark)
    if store.is_committed(stage, ph):
        df = store.read(stage)
    else:
        df = store.commit(stage, _knn_topk(spark, sf_dir, kmax), ph)
    return df.filter(F.col("rnk") <= k) if k < kmax else df


# Corpus-size gate for the user-facing ANN entry: at or below this row
# count the exact brute-force path runs (O(Q x C) compute — affordable, and
# it is what the DuckDB oracle verifies at the correctness scale); above it
# the query routes through the q22 IVF centroid-bucket path, which keeps
# the same top-k-per-query contract sub-quadratically. A cartesian in a
# user-facing default is a scale-killer regardless of join strategy; the
# exact path survives only as the small-N baseline.
ANN_EXACT_MAX_ROWS = 1000


def q20_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-5 per query (every 10th vector queries all): exact
    brute force under ANN_EXACT_MAX_ROWS, IVF-bucketed above it.

    The gate reads the parquet footer row count (cached, no Spark job) —
    the oracle twin Q20_SQL applies the SAME gate relationally, so Spark
    and DuckDB take the same branch at every scale (VERDICT r3 #4)."""
    n = _table_rows(sf_dir, "embeddings")
    if n <= ANN_EXACT_MAX_ROWS:
        return _knn_topk_staged(spark, sf_dir, 5).select(
            "query_id", "candidate_id", "rnk", "sim"
        )
    return _ivf_topk_staged(spark, sf_dir, 5)


# IVF oracle CTEs (shared by Q20_SQL's large-N branch and Q22_SQL).
# Depends on vecs/norms from _KNN_CTE; names prefixed to avoid collisions.
_IVF_CTE = """
cent_el AS (
  SELECT label, i, CAST(round(CAST(SUM(q[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
  FROM vecs CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ii
  GROUP BY label, i),
cent AS (
  SELECT label AS c_label, array_agg(cv ORDER BY i) AS cq
  FROM cent_el GROUP BY label),
cent_n AS (
  SELECT c_label, cq, list_sum(list_transform(cq, x -> x * x)) AS ncq FROM cent),
assigned AS (
  SELECT vec_id, label, q, nq, c_label AS bucket FROM (
    SELECT v.vec_id, v.label, v.q, v.nq, c.c_label,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY CAST(list_sum(list_transform(range(1, 65),
                           i -> v.q[i] * c.cq[i])) AS DOUBLE)
                      / sqrt(CAST(v.nq AS DOUBLE) * CAST(c.ncq AS DOUBLE)) DESC,
                      c.c_label ASC) AS crn
    FROM norms v CROSS JOIN cent_n c) t
  WHERE crn = 1),
ivf_scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS candidate_id,
         CAST(list_sum(list_transform(range(1, 65),
                       i -> a.q[i] * b.q[i])) AS DOUBLE)
           / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) AS sim
  FROM assigned a JOIN assigned b
    ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
  WHERE a.vec_id % 10 = 0),
ivf_ranked AS (
  SELECT query_id, candidate_id, round(sim, 6) AS sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, candidate_id ASC) AS rnk
  FROM ivf_scored)
"""

# Q20's oracle MIRRORS the engine's corpus-size gate: both branches are
# present, and the scalar row count routes exactly one of them — so Spark
# and DuckDB agree at sf0.001 (exact) AND at sf >= 0.01 (IVF), closing the
# round-3 latent drift.
Q20_SQL = f"""
WITH {_KNN_CTE.strip()},
{_IVF_CTE.strip()},
nn AS (SELECT COUNT(*) AS cnt FROM embeddings)
SELECT query_id, candidate_id, rnk, sim FROM ranked
WHERE rnk <= 5 AND (SELECT cnt FROM nn) <= {ANN_EXACT_MAX_ROWS}
UNION ALL
SELECT query_id, candidate_id, rnk, sim FROM ivf_ranked
WHERE rnk <= 5 AND (SELECT cnt FROM nn) > {ANN_EXACT_MAX_ROWS}
"""


def _nrel_per_query(vecs: DataFrame) -> DataFrame:
    """(query_id, n_rel): relevant candidates per query in the FULL pool.

    Relevance is label equality, so n_rel is a pure function of the label
    histogram: count vectors sharing the query's label, minus the query
    itself. One O(|corpus|) aggregate + a broadcast join — no
    (queries x corpus) theta-join whose pushed-down equality a refactor
    could silently un-push into a broadcast nested loop.
    """
    label_counts = vecs.groupBy("label").agg(F.count("*").alias("n_lab"))
    return (
        vecs.filter(F.col("vec_id") % 10 == 0)
        .select(F.col("vec_id").alias("query_id"), "label")
        .join(F.broadcast(label_counts), "label")
        .select("query_id", (F.col("n_lab") - 1).alias("n_rel"))
    )


def q21_knn_ir_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR metric aggregation (A10: evaluator.py:68-161) at k=5 over the kNN
    results, relevance = same label. All per-query metric values are cast to
    DECIMAL(18,12) before averaging so cross-engine sums are exact."""
    topk = _knn_topk_staged(spark, sf_dir, 5)
    rel = topk.withColumn(
        "rel", (F.col("query_label") == F.col("candidate_label")).cast("int")
    )
    # total relevant per query in full candidate pool (for recall/ndcg):
    # the RAW embeddings table, matching the oracle's `FROM embeddings`
    # nrel CTE — the relevance pool deliberately includes zero-norm vectors
    # that _quantized_vecs excludes from RANKING (they can never be
    # retrieved, but they are still "relevant" rows the recall denominator
    # counts). Also cheaper: no quantization pass for a (vec_id, label)
    # histogram.
    nrel = _nrel_per_query(load(spark, sf_dir, "embeddings"))
    dec = "decimal(18,12)"
    cum_w = (
        Window.partitionBy("query_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rel = rel.withColumn("cum_rel", F.sum("rel").over(cum_w))
    per_q = (
        rel.groupBy("query_id")
        .agg(
            F.max(F.when(F.col("rnk") == 1, F.col("rel"))).alias("acc1"),
            F.sum("rel").alias("hits"),
            F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    (F.lit(1.0) / F.log2(F.col("rnk") + 1)).cast(dec),
                ).otherwise(F.lit(0).cast(dec))
            ).alias("dcg"),
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    (F.col("cum_rel").cast("double") / F.col("rnk")).cast(dec),
                ).otherwise(F.lit(0).cast(dec))
            ).alias("ap_num"),
        )
        .join(nrel, "query_id", "left")
        .na.fill({"n_rel": 0})
    )
    # idcg for m ideal hits = sum_{i=1..min(m,5)} 1/log2(i+1): computed
    # RELATIONALLY from a rank-discount table with a cumulative window (no
    # hardcoded case constants), joined on the capped relevant count.
    idcg_tab = _idcg_table(spark, 5)
    per_q = per_q.join(
        F.broadcast(idcg_tab),
        F.least(F.col("n_rel"), F.lit(5)) == idcg_tab.r,
        "left",
    )
    idcg_col = F.col("idcg").cast("double")
    per_q = per_q.select(
        "query_id",
        F.coalesce(F.col("acc1"), F.lit(0)).alias("acc1"),
        "hits",
        F.col("n_rel"),
        F.coalesce(
            (F.lit(1.0) / F.col("first_rel")).cast(dec), F.lit(0).cast(dec)
        ).alias("rr"),
        F.coalesce(
            (F.col("dcg").cast("double") / idcg_col).cast(dec),
            F.lit(0).cast(dec),
        ).alias("ndcg"),
        F.coalesce(
            (
                F.col("ap_num").cast("double")
                / F.least(F.col("n_rel"), F.lit(5)).cast("double")
            ).cast(dec),
            F.lit(0).cast(dec),
        ).alias("ap"),
        F.coalesce(
            (
                F.col("hits").cast("double") / F.col("n_rel").cast("double")
            ).cast(dec),
            F.lit(0).cast(dec),
        ).alias("recall"),
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.round(F.sum("acc1").cast("double") / F.count("*"), 6).alias("accuracy_at_1"),
        F.round(
            F.sum("hits").cast("double") / (5.0 * F.count("*")), 6
        ).alias("precision_at_5"),
        F.round(F.sum("recall").cast("double") / F.count("*"), 6).alias(
            "recall_at_5"
        ),
        F.round(F.sum("rr").cast("double") / F.count("*"), 6).alias("mrr_at_5"),
        F.round(F.sum("ndcg").cast("double") / F.count("*"), 6).alias("ndcg_at_5"),
        F.round(F.sum("ap").cast("double") / F.count("*"), 6).alias("map_at_5"),
    )


def _idcg_tab_sql(kmax: int) -> str:
    """DuckDB twin of `_idcg_table` (same decimal discipline)."""
    return f"""idcg_tab AS (
  SELECT r, SUM(CAST(1.0 / log2(r + 1) AS DECIMAL(18,12))) OVER (
           ORDER BY r ROWS UNBOUNDED PRECEDING) AS idcg
  FROM (SELECT unnest(range(1, {kmax + 1})) AS r) ranks)"""

Q21_SQL = f"""
WITH {_KNN_CTE.strip()},
topk AS (
  SELECT query_id, candidate_id, rnk,
         CASE WHEN query_label = candidate_label THEN 1 ELSE 0 END AS rel
  FROM ranked WHERE rnk <= 5),
nrel AS (
  SELECT a.vec_id AS query_id, COUNT(*) AS n_rel
  FROM embeddings a JOIN embeddings b
    ON b.vec_id <> a.vec_id AND a.label = b.label
  WHERE a.vec_id % 10 = 0
  GROUP BY 1),
cum AS (
  SELECT *, SUM(rel) OVER (PARTITION BY query_id ORDER BY rnk) AS cum_rel
  FROM topk),
per_q AS (
  SELECT t.query_id,
         COALESCE(MAX(CASE WHEN rnk = 1 THEN rel END), 0) AS acc1,
         SUM(rel) AS hits,
         COALESCE(n.n_rel, 0) AS n_rel,
         COALESCE(CAST(1.0 / MIN(CASE WHEN rel = 1 THEN rnk END)
                       AS DECIMAL(18,12)), CAST(0 AS DECIMAL(18,12))) AS rr,
         SUM(CASE WHEN rel = 1
                  THEN CAST(1.0 / log2(rnk + 1) AS DECIMAL(18,12))
                  ELSE CAST(0 AS DECIMAL(18,12)) END) AS dcg,
         SUM(CASE WHEN rel = 1
                  THEN CAST(CAST(cum_rel AS DOUBLE) / rnk AS DECIMAL(18,12))
                  ELSE CAST(0 AS DECIMAL(18,12)) END) AS ap_num
  FROM cum t LEFT JOIN nrel n ON t.query_id = n.query_id
  GROUP BY t.query_id, n.n_rel),
{_idcg_tab_sql(5)},
fin AS (
  SELECT query_id, acc1, hits, n_rel, rr,
         COALESCE(CAST(CAST(dcg AS DOUBLE) / CAST(it.idcg AS DOUBLE)
                       AS DECIMAL(18,12)), CAST(0 AS DECIMAL(18,12))) AS ndcg,
         COALESCE(CAST(CAST(ap_num AS DOUBLE) / CAST(least(n_rel, 5) AS DOUBLE)
                       AS DECIMAL(18,12)), CAST(0 AS DECIMAL(18,12))) AS ap,
         COALESCE(CAST(CAST(hits AS DOUBLE) / CAST(n_rel AS DOUBLE)
                       AS DECIMAL(18,12)), CAST(0 AS DECIMAL(18,12))) AS recall
  FROM per_q LEFT JOIN idcg_tab it ON least(per_q.n_rel, 5) = it.r)
SELECT COUNT(*) AS n_queries,
       round(CAST(SUM(acc1) AS DOUBLE) / COUNT(*), 6) AS accuracy_at_1,
       round(CAST(SUM(hits) AS DOUBLE) / (5.0 * COUNT(*)), 6) AS precision_at_5,
       round(CAST(SUM(recall) AS DOUBLE) / COUNT(*), 6) AS recall_at_5,
       round(CAST(SUM(rr) AS DOUBLE) / COUNT(*), 6) AS mrr_at_5,
       round(CAST(SUM(ndcg) AS DOUBLE) / COUNT(*), 6) AS ndcg_at_5,
       round(CAST(SUM(ap) AS DOUBLE) / COUNT(*), 6) AS map_at_5
FROM fin
"""


# --------------------------------------------------------------------------
# Q22  IVF-style bucketed ANN (scale path): coarse-quantize to per-label
#      centroids, search only within the assigned bucket
# --------------------------------------------------------------------------


def _ivf_topk(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """IVF bucketed ANN: relational centroid assignment (broadcast centroid
    table, one window), then per-bucket exact top-k. The in-bucket scorer
    has two strategies under one contract (same split as q38/_knn_topk):

    - per-bucket numpy matmul under KNN_NUMPY_MAX_ROWS: a query's
      candidate set is EXACTLY its bucket, so one applyInPandas over the
      bucket groups computes the final gated top-k directly — one BLAS
      matmul per (bucket, query-chunk), no 4M-row pair join, no window.
      Exact: integer-valued float64 products < 2^53, denominator
      op-for-op the relational sqrt, stable argsort over candidates
      pre-sorted by id reproduces the (sim desc, candidate_id asc)
      window order, self-matches excluded via -inf like _knn_topk_numpy.
      Replaces ~|bucket|^2 interpreted aggregate-HOF dot products
      (guide §4.2): measured ~22 s -> ~6 s at sf1.0.
    - the relational bucket join above the gate (shuffles, never collects).
    """
    assigned = _ivf_assigned(spark, sf_dir)
    if _table_rows(sf_dir, "embeddings") <= KNN_NUMPY_MAX_ROWS:
        return _ivf_score_numpy(assigned, k)
    return _ivf_score_relational(assigned, k)


def _ivf_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _quantized_vecs(spark, sf_dir)
    # centroids: elementwise mean of quantized vectors per label, requantized
    cent = (
        vecs.select("label", F.posexplode("q").alias("i", "v"))
        .groupBy("label", "i")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .withColumn("cv", F.round(F.col("s").cast("double") / F.col("c")).cast("long"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cv"))).alias("pairs"))
        .select(
            F.col("label").alias("c_label"),
            F.transform(F.col("pairs"), lambda p: p["cv"]).alias("cq"),
        )
    )
    ncq = F.aggregate(
        F.transform(F.col("cq"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cent = cent.withColumn("ncq", ncq)
    dot_c = F.aggregate(
        F.zip_with(F.col("q"), F.col("cq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sim_c = dot_c.cast("double") / F.sqrt(
        F.col("nq").cast("double") * F.col("ncq").cast("double")
    )
    wc = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("c_label").asc()
    )
    return (
        vecs.crossJoin(F.broadcast(cent))
        .withColumn("csim", sim_c)
        .withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") == 1)
        .select("vec_id", "label", "q", "nq", F.col("c_label").alias("bucket"))
    )


def _ivf_score_numpy(assigned: DataFrame, k: int) -> DataFrame:
    out_schema = "query_id bigint, candidate_id bigint, rnk int, sim double"
    kk = int(k)

    def score(pdf):
        import numpy as _np
        import pandas as _pd

        cid = pdf["vec_id"].to_numpy(_np.int64)
        order = _np.argsort(cid, kind="stable")
        cid = cid[order]
        cmat = _np.array(list(pdf["q"]), dtype=_np.float64)[order]
        cnq = pdf["nq"].to_numpy(_np.float64)[order]
        is_q = cid % 10 == 0
        qid = cid[is_q]
        if not len(qid):
            return _pd.DataFrame(
                {"query_id": [], "candidate_id": [], "rnk": [], "sim": []}
            ).astype(
                {"query_id": "int64", "candidate_id": "int64",
                 "rnk": "int32", "sim": "float64"}
            )
        qmat, qnq = cmat[is_q], cnq[is_q]
        outs = []
        # chunk the query rows so the sims matrix stays bounded
        # (<= 512 x |bucket| float64) no matter how big the bucket is
        for lo in range(0, len(qid), 512):
            hi = min(lo + 512, len(qid))
            sims = (qmat[lo:hi] @ cmat.T) / _np.sqrt(
                qnq[lo:hi, None] * cnq[None, :]
            )
            sims[qid[lo:hi, None] == cid[None, :]] = -_np.inf  # self-match
            kept = min(kk + 1, cid.shape[0])
            top = _np.argsort(-sims, axis=1, kind="stable")[:, :kept]
            s = _np.take_along_axis(sims, top, axis=1)
            finite = _np.isfinite(s)
            rnk = _np.cumsum(finite, axis=1)  # rank among non-self rows
            keep = (finite & (rnk <= kk)).ravel()
            if not keep.any():
                continue
            m = hi - lo
            qi = _np.repeat(_np.arange(lo, hi), kept)
            outs.append(
                _pd.DataFrame(
                    {
                        "query_id": qid[qi][keep],
                        "candidate_id": cid[top.ravel()][keep],
                        "rnk": rnk.ravel()[keep].astype(_np.int32),
                        "sim": s.ravel()[keep],
                    }
                )
            )
        if not outs:
            return _pd.DataFrame(
                {"query_id": [], "candidate_id": [], "rnk": [], "sim": []}
            ).astype(
                {"query_id": "int64", "candidate_id": "int64",
                 "rnk": "int32", "sim": "float64"}
            )
        return _pd.concat(outs, ignore_index=True)

    scored = assigned.groupBy("bucket").applyInPandas(score, schema=out_schema)
    return scored.select(
        "query_id", "candidate_id", "rnk", F.round("sim", 6).alias("sim")
    )


def _ivf_score_relational(assigned: DataFrame, k: int) -> DataFrame:
    a = assigned.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
        "bucket",
    )
    b = assigned.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("q").alias("qb"),
        F.col("nq").alias("nb"),
        "bucket",
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sim = dot.cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("candidate_id").asc()
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "candidate_id", "rnk", F.round("sim", 6).alias("sim"))
    )


def _ivf_topk_staged(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """The IVF bucketed ANN ranking, staged once per (corpus, params) and
    shared by its two consumers — q22 always, and q20 above its exact-path
    gate: both run the IDENTICAL _ivf_topk plan, so without the stage a
    battery paid the centroid build + bucket self-join twice (guide §1.2:
    don't compute things twice). Same StageStore discipline as
    _lsh_pairs_staged: keyed on corpus identity + params, wiped per bench
    run, durable within one."""
    from tabiya_livelihoods_classifier_spark.storage import params_hash

    ph = params_hash(
        "ivf_topk_v1", str(sf_dir), _corpus_mtime(sf_dir, "embeddings"), k
    )
    stage = f"ivf_topk_{ph}"
    store = _stage_store(spark)
    if store.is_committed(stage, ph):
        return store.read(stage)
    return store.commit(stage, _ivf_topk(spark, sf_dir, k), ph)


def q22_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk_staged(spark, sf_dir, 5)


Q22_SQL = f"""
WITH vecs AS (
  SELECT vec_id, label, {_QUANT_SQL} AS q FROM embeddings),
norms AS (
  SELECT * FROM (
    SELECT vec_id, label, q, list_sum(list_transform(q, x -> x * x)) AS nq
    FROM vecs) t
  WHERE nq > 0),
{_IVF_CTE.strip()}
SELECT query_id, candidate_id, rnk, sim FROM ivf_ranked WHERE rnk <= 5
"""


# --------------------------------------------------------------------------
# Q23  transitive ancestor closure (J8: DAG chains 3_2b...py:473-532)
# --------------------------------------------------------------------------


def q23_graph_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tabiya_livelihoods_classifier_spark.operators.graph import (
        transitive_ancestors,
    )

    part = load(spark, sf_dir, "part")
    edges = (
        part.selectExpr("p_partkey as child", "p_partkey div 7 as parent")
        .filter("parent >= 1 and parent <> child")
        .dropDuplicates()
    )
    return transitive_ancestors(edges).select("node", "ancestor")


Q23_SQL = """
WITH RECURSIVE edges AS (
  SELECT p_partkey AS child, p_partkey // 7 AS parent
  FROM part WHERE p_partkey // 7 >= 1 AND p_partkey // 7 <> p_partkey),
anc(node, ancestor) AS (
  SELECT child, parent FROM edges
  UNION
  SELECT a.node, e.parent FROM anc a JOIN edges e ON a.ancestor = e.child)
SELECT DISTINCT node, ancestor FROM anc
"""


# --------------------------------------------------------------------------
# Q24  connected components (clustering core) on a derived bipartite graph
# --------------------------------------------------------------------------


def q24_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tabiya_livelihoods_classifier_spark.operators.clustering import (
        connected_components,
    )

    orders = load(spark, sf_dir, "orders")
    edges = orders.selectExpr(
        "o_custkey % 40 as id_a", "40 + o_orderkey % 40 as id_b"
    ).dropDuplicates()
    return connected_components(edges).select(
        F.col("rid").alias("node"), "component"
    )


Q24_SQL = """
WITH RECURSIVE e AS (
  SELECT DISTINCT o_custkey % 40 AS a, 40 + o_orderkey % 40 AS b FROM orders),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
reach(s, n) AS (
  SELECT a, a FROM (SELECT a FROM sym UNION SELECT b FROM sym) nodes(a)
  UNION
  SELECT r.s, y.b FROM reach r JOIN sym y ON r.n = y.a)
SELECT s AS node, MIN(n) AS component FROM reach GROUP BY s
"""


# --------------------------------------------------------------------------
# Q25  transcript derivation + canonicalization (input_hint shape; T6 stable
#      turn ordering) from the events stream
# --------------------------------------------------------------------------

_ROLE_CASE_SPARK = (
    "CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'user' "
    "WHEN 'signup' THEN 'system' WHEN 'purchase' THEN 'assistant' "
    "ELSE 'tool' END"
)


def q25_transcripts_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    df = ev.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 6, "0")).alias(
            "conv_id"
        ),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.expr(_ROLE_CASE_SPARK).alias("role"),
        canonicalize_text(
            F.concat(F.lit("event "), F.col("event_type"), F.lit(" props "), F.col("props"))
        ).alias("text"),
        F.when(F.expr(_ROLE_CASE_SPARK) == "tool", F.col("event_type"))
        .otherwise(F.lit(""))
        .alias("tool"),
        "ts",
    )
    return df


Q25_SQL = """
SELECT 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
            AS INT) AS turn_idx,
       CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'user'
            WHEN 'signup' THEN 'system' WHEN 'purchase' THEN 'assistant'
            ELSE 'tool' END AS role,
       trim(regexp_replace(regexp_replace(
            'event ' || event_type || ' props ' || props,
            '[\\n\\r\\t]', ' ', 'g'), ' {2,}', ' ', 'g')) AS text,
       CASE WHEN (CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'user'
                  WHEN 'signup' THEN 'system' WHEN 'purchase' THEN 'assistant'
                  ELSE 'tool' END) = 'tool' THEN event_type ELSE '' END AS tool,
       ts
FROM events
"""


# --------------------------------------------------------------------------
# Q26  flagship: near-duplicate ER clustering over the perturbed documents
#      corpus — blocking (MinHash bands) -> exact Jaccard >= 0.6 ->
#      transitive clustering (hash-min CC) -> (doc_id, cluster_id)
# --------------------------------------------------------------------------


def _er_clusters_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) connected components over the staged LSH pair
    set, materialized ONCE per (corpus, params): q26 emits it and q44
    derives canonical ids + cluster sizes from the SAME snapshot, so the
    iterative CC never runs twice in a battery."""
    from tabiya_livelihoods_classifier_spark.operators.clustering import (
        connected_components,
    )
    from tabiya_livelihoods_classifier_spark.storage import params_hash

    ph = params_hash("er_clusters_v1", str(sf_dir), _corpus_mtime(sf_dir))
    stage = f"er_clusters_{ph}"
    store = _stage_store(spark)
    if store.is_committed(stage, ph):
        return store.read(stage)
    # the staged pair snapshot is the durable barrier connected_components
    # needs (its 2-branch symmetrizing union would otherwise re-run the
    # whole LSH pipeline per branch)
    edges = _lsh_pairs_staged(spark, sf_dir).select("id_a", "id_b")
    nodes = _perturbed_corpus(spark, sf_dir).select(
        F.col("doc_id").alias("rid")
    )
    clusters = connected_components(edges, nodes=nodes).select(
        F.col("rid").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    return store.commit(stage, clusters, ph)


def q26_er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _er_clusters_staged(spark, sf_dir)


Q26_SQL = f"""
WITH RECURSIVE {_CORPUS_CTE.strip()},
{_SHINGLE_CTE.strip()},
sig AS (
  SELECT doc_id, h, MIN(md5(CAST(h AS VARCHAR) || ':' || s)) AS minhash
  FROM (SELECT doc_id, unnest(sh) AS s FROM shing) ex
  CROSS JOIN (SELECT unnest(range(0, 16)) AS h) hs
  GROUP BY doc_id, h),
bands AS (
  SELECT doc_id, 'b' || CAST(h // 2 AS VARCHAR) || '|'
         || string_agg(minhash, '|' ORDER BY h) AS bk
  FROM sig GROUP BY doc_id, h // 2),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
edges AS (
  SELECT id_a, id_b FROM pairs
  JOIN shing sa ON sa.doc_id = id_a
  JOIN shing sb ON sb.doc_id = id_b
  WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 6)
        >= 0.6),
sym AS (SELECT id_a AS a, id_b AS b FROM edges
        UNION SELECT id_b, id_a FROM edges),
reach(s, n) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT r.s, y.b FROM reach r JOIN sym y ON r.n = y.a)
SELECT s AS doc_id, MIN(n) AS cluster_id FROM reach GROUP BY s
"""


# --------------------------------------------------------------------------
# Q27  sessionization (gap > 30 min) over events
# --------------------------------------------------------------------------


def q27_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet gives TIMESTAMP_NTZ; session TZ is pinned UTC so this cast is
    # wall-clock-preserving and matches DuckDB's naive epoch()
    ep = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / 1000000
    ).cast("long")
    df = ev.withColumn("ep", ep).withColumn(
        "gap", F.col("ep") - F.lag("ep").over(w)
    )
    brk = F.when(F.col("gap").isNull() | (F.col("gap") <= 1800), 0).otherwise(1)
    return (
        df.withColumn("brk", brk)
        .withColumn(
            "session_idx",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("user_id", "event_id", "session_idx")
    )


Q27_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT)
         - LAG(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events)
SELECT user_id, event_id,
       CAST(SUM(CASE WHEN gap IS NULL OR gap <= 1800 THEN 0 ELSE 1 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
FROM g
"""


# --------------------------------------------------------------------------
# Q28  scalar-enrichment family (P7-P12, P14): digit strip, numeric strip,
#      full_details assembly, composite score, EQF parse — one codegen pass
# --------------------------------------------------------------------------


def q28_scalar_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tabiya_livelihoods_classifier_spark.functions.text import (
        digits_only,
        eqf_level,
        numeric_strip,
    )

    cust = load(spark, sf_dir, "customer")
    salary_raw = F.concat(
        F.col("c_custkey").cast("string"),
        F.lit("."),
        F.col("c_nationkey").cast("string"),
        F.lit(" ZAR"),
    )
    details = F.concat_ws(
        "; ",
        F.concat(F.lit("Name: "), F.col("c_name")),
        F.concat(
            F.lit("Segment: "),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("")), F.lit("NA")),
        ),
        F.concat(F.lit("Nation: "), F.col("c_nationkey").cast("string")),
    )
    return cust.select(
        "c_custkey",
        digits_only("c_name").alias("ref_digits"),
        numeric_strip(salary_raw).alias("salary"),
        details.alias("full_details"),
        (F.length(F.col("c_name")).cast("long") + F.col("c_custkey") * 1000).alias(
            "composite_score"
        ),
        eqf_level(
            F.concat(F.lit("EQF level "), (F.col("c_custkey") % 9).cast("string"))
        ).alias("eqf"),
    )


Q28_SQL = """
SELECT c_custkey,
       CAST(regexp_replace(c_name, '\\D', '', 'g') AS BIGINT) AS ref_digits,
       CAST(regexp_replace(CAST(c_custkey AS VARCHAR) || '.'
            || CAST(c_nationkey AS VARCHAR) || ' ZAR', '[^0-9.]', '', 'g')
            AS DOUBLE) AS salary,
       concat_ws('; ', 'Name: ' || c_name,
                 'Segment: ' || COALESCE(nullif(c_mktsegment, ''), 'NA'),
                 'Nation: ' || CAST(c_nationkey AS VARCHAR)) AS full_details,
       CAST(length(c_name) AS BIGINT) + c_custkey * 1000 AS composite_score,
       COALESCE(TRY_CAST(substr('EQF level ' || CAST(c_custkey % 9 AS VARCHAR),
                -1, 1) AS DOUBLE), 0.0) AS eqf
FROM customer
"""


# --------------------------------------------------------------------------
# Q29  merge-with-fill dedupe (A7): first non-null field per key under an
#      explicit order — 3_2a...py:402-478's dict merge as one aggregate
# --------------------------------------------------------------------------


def q29_merge_fill_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # inject missing-ness: 'view' rows carry no usable props (the reference
    # merges records where later occurrences fill fields the first left null)
    usable = (F.col("event_type") != "view") & (F.col("props") != "")
    first_props = F.min(
        F.when(usable, F.struct("ts", "event_id", "props"))
    )["props"]
    return ev.groupBy("user_id").agg(
        first_props.alias("first_props"),
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_ts"),
    )


Q29_SQL = """
SELECT user_id,
       (min(CASE WHEN event_type <> 'view' AND props <> ''
            THEN struct_pack(ts := ts, event_id := event_id, props := props)
            END)).props AS first_props,
       count(*) AS n_events,
       min(ts) AS first_ts
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Q30  UUIDHISTORY handling (P7): newline-joined uuid lists — extract
#      first/oldest + last/newest, count entries (3_2b...py:249-258)
# --------------------------------------------------------------------------

# two nested transforms bind the md5 digest to a lambda variable, so each
# UUID hashes ONCE and the five substr slices read the bound value — the
# flat form re-evaluated md5 five times per element (the shingles() lesson:
# lambda bodies re-run their whole expression tree per reference)
_UUID_ARR_SPARK = (
    "transform(transform(sequence(0, cast(p_partkey % 3 as int)), "
    "i -> md5(concat(p_name, ':', i))), "
    "h -> concat(substr(h, 1, 8), '-', substr(h, 9, 4), '-', "
    "substr(h, 13, 4), '-', substr(h, 17, 4), '-', substr(h, 21, 12)))"
)


def q30_uuid_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # md5-transform-dense rows over a 1-row-group table: fan across cores
    part = _cpu_fanout(spark, sf_dir, "part", per_task_bytes=128 << 10)(
        load(spark, sf_dir, "part")
    )
    hist = F.expr(f"array_join({_UUID_ARR_SPARK}, '\\n')")
    df = part.select("p_partkey", hist.alias("uuidhistory"))
    parts_arr = F.split(F.col("uuidhistory"), "\n")
    return df.select(
        "p_partkey",
        F.element_at(parts_arr, 1).alias("first_uuid"),
        F.element_at(parts_arr, -1).alias("last_uuid"),
        F.size(parts_arr).alias("n_uuids"),
    )


Q30_SQL = r"""
WITH hist AS (
  SELECT p_partkey,
         array_to_string(list_transform(range(0, CAST(p_partkey % 3 AS INT) + 1),
           i -> substr(md5(p_name || ':' || i), 1, 8) || '-'
             || substr(md5(p_name || ':' || i), 9, 4) || '-'
             || substr(md5(p_name || ':' || i), 13, 4) || '-'
             || substr(md5(p_name || ':' || i), 17, 4) || '-'
             || substr(md5(p_name || ':' || i), 21, 12)), chr(10))
           AS uuidhistory
  FROM part)
SELECT p_partkey,
       string_split(uuidhistory, chr(10))[1] AS first_uuid,
       string_split(uuidhistory, chr(10))[-1] AS last_uuid,
       len(string_split(uuidhistory, chr(10))) AS n_uuids
FROM hist
"""


# --------------------------------------------------------------------------
# Q31  compaction: last-wins by key (S12/A6) via sources.sinks
# --------------------------------------------------------------------------


def q31_compact_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tabiya_livelihoods_classifier_spark.sources.sinks import (
        compact_last_wins,
    )

    ev = load(spark, sf_dir, "events")
    return compact_last_wins(
        ev, keys=["user_id", "event_type"], order=[F.col("ts"), F.col("event_id")]
    ).select("user_id", "event_type", "event_id", "ts")


Q31_SQL = """
SELECT user_id, event_type, event_id, ts
FROM (SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Q32  multimodal metadata extraction: binary payload column -> Arrow-batched
#      mapInPandas probe (functions/multimodal.py; decode itself is a
#      deterministic stand-in, the plumbing is the production shape)
# --------------------------------------------------------------------------


def q32_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tabiya_livelihoods_classifier_spark.functions.multimodal import (
        decode_media_meta,
    )

    docs = _cpu_fanout(spark, sf_dir, "documents")(
        load(spark, sf_dir, "documents")
    )
    media = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return decode_media_meta(media)


Q32_SQL = """
WITH d AS (SELECT doc_id, md5(text) AS h, octet_length(encode(text)) AS nb
           FROM documents),
m AS (SELECT doc_id, nb, h,
             CAST(('0x' || substr(h, 1, 1)) AS INT) % 4 AS fsel,
             CAST(('0x' || substr(h, 2, 4)) AS INT) AS w4,
             CAST(('0x' || substr(h, 6, 4)) AS INT) AS h4,
             CAST(('0x' || substr(h, 10, 2)) AS INT) AS f2
      FROM d)
SELECT doc_id, CAST(nb AS INT) AS n_bytes,
       CASE fsel WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'webp'
            ELSE 'gif' END AS format,
       CAST(16 + w4 % 4080 AS INT) AS width,
       CAST(16 + h4 % 2144 AS INT) AS height,
       CAST(CASE WHEN fsel = 3 THEN 1 + f2 % 30 ELSE 1 END AS INT) AS n_frames
FROM m
"""


# --------------------------------------------------------------------------
# Q33  built-in session_window sessionization (streaming/sessionize.py run
#      in batch mode — identical code path serves the stream)
# --------------------------------------------------------------------------


def q33_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tabiya_livelihoods_classifier_spark.streaming.sessionize import (
        session_stats,
    )

    ev = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return session_stats(ev, gap="30 minutes")


Q33_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800 OR
                   LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_event_id
FROM s GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# Q34  embedding-cosine near-duplicate pairs via sign-band LSH: candidate
#      pairs come from 8-bit hyperplane-sign band keys (equi-join, sub-
#      quadratic — a pair at cosine >= 0.98 differs on ~4/64 signs, so it
#      agrees on at least one 8-bit band with overwhelming probability),
#      then EXACT cosine within candidates. No all-pairs join anywhere.
#      Recall bound (like q12's SHINGLE_DF_CAP note): a sim >= 0.98 pair
#      whose differing coordinates sit near zero can flip sign in EVERY
#      band and never collide — deterministic, and mirrored in the SQL
#      twin, so the oracle verifies the candidate contract, not perfect
#      recall. Tightening it means a second offset band layout (bands
#      shifted by band_bits/2), trading 2x candidate volume for a squared
#      miss probability.
# --------------------------------------------------------------------------

_NEARDUP_BANDS = 8
_NEARDUP_BAND_BITS = 8


def q34_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # random embeddings have no near-dups (max pairwise cosine ~0.51), so a
    # deterministic perturbed copy of every 4th vector supplies positives:
    # scale + tiny uniform shift, exact-representable constants so both
    # engines compute identical IEEE doubles before quantization
    emb = load(spark, sf_dir, "embeddings")
    near = emb.filter(F.col("vec_id") % 4 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.lit("neardup").alias("label"),
        F.transform(
            F.col("embedding"),
            lambda x: x.cast("double") * 1.015625 + 0.0078125,
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).unionByName(near)
    q = F.transform(
        F.col("embedding"), lambda x: F.round(x * 1000000).cast("long")
    )
    vecs = corpus.select("vec_id", q.alias("q"))
    nq = F.aggregate(
        F.transform(F.col("q"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # zero-norm exclusion (same NaN-parity rationale as _quantized_vecs).
    # Fan-out stays at the default byte budget: q34's cost is in the
    # band-join shuffles, not the scan, and an A/B at sf1.0 (str/int keys
    # x 1/6 scan partitions, interleaved twice) showed the wider scan
    # consistently ~8 s SLOWER (more exchange-reuse consumers re-reading
    # the wider shuffle) with no compute win.
    vecs = (
        vecs.withColumn("nq", nq)
        .filter(F.col("nq") > 0)
        .repartition(_fanout_partitions(spark, sf_dir, "embeddings"), "vec_id")
    )
    # band key as a PACKED INT (band index in the high bits, the band's
    # sign bits below): the bucketing partition is identical to the old
    # 'b{j}|01011010' string form — the key never leaves this plan — but
    # the equi-join hashes/compares 4-byte ints instead of ~11-char
    # strings and the band-membership shuffle shrinks accordingly
    # (guide §2.3: narrower types).
    def _band_int(j: int) -> Column:
        bits = None
        for i in range(_NEARDUP_BAND_BITS):
            b = F.when(
                F.element_at(F.col("q"), j * _NEARDUP_BAND_BITS + i + 1) > 0,
                F.lit(1 << i),
            ).otherwise(F.lit(0))
            bits = b if bits is None else bits + b
        return F.lit(j * (1 << _NEARDUP_BAND_BITS)) + bits

    band_keys = F.array(*[_band_int(j) for j in range(_NEARDUP_BANDS)])
    bands = vecs.select("vec_id", F.explode(band_keys).alias("bk"))
    ba = bands.alias("ba")
    bb = bands.hint("shuffle_hash").alias("bb")
    # NO pair dedupe here: candidate duplication is bounded by the band
    # count (8) and on sign-band LSH only true near-dups collide in more
    # than one band (~0.5% extra rows at sf1.0: 9.70M raw vs 9.65M
    # distinct), while deduping BEFORE scoring cost a 9.6M-row
    # shuffle+aggregate (~6 s measured). Duplicates are scored
    # identically (the sim expression is deterministic) and collapsed
    # after the >= 0.98 filter, where the row count is output-sized.
    cand = (
        ba.join(bb, "bk")
        .filter(F.col("ba.vec_id") < F.col("bb.vec_id"))
        .select(
            F.col("ba.vec_id").alias("id_a"), F.col("bb.vec_id").alias("id_b")
        )
    )
    fa = vecs.select(
        F.col("vec_id").alias("id_a"), F.col("q").alias("qa"), F.col("nq").alias("na")
    )
    fb = vecs.select(
        F.col("vec_id").alias("id_b"), F.col("q").alias("qb"), F.col("nq").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sim = dot.cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    # fa/fb are corpus-sized with 64-long quantized vectors per row — same
    # deserialized-vs-file-size broadcast trap as q12/q14; pin shuffled-hash
    return (
        cand.join(fa.hint("shuffle_hash"), "id_a")
        .join(fb.hint("shuffle_hash"), "id_b")
        .withColumn("sim", F.round(sim, 6))
        .filter(F.col("sim") >= 0.98)
        .select("id_a", "id_b", "sim")
        .dropDuplicates(["id_a", "id_b"])
    )


Q34_SQL = """
WITH corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * 1.015625 + 0.0078125)
  FROM embeddings WHERE vec_id % 4 = 0),
vecs AS (
  SELECT vec_id,
         list_transform(e, x -> CAST(round(x * 1000000) AS BIGINT)) AS q
  FROM corpus),
norms AS (
  SELECT * FROM (
    SELECT vec_id, q, list_sum(list_transform(q, x -> x * x)) AS nq
    FROM vecs) t
  WHERE nq > 0),
bands AS (
  SELECT vec_id,
         'b' || j || '|' ||
         array_to_string(list_transform(q[(8 * j + 1):(8 * j + 8)],
                         x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '')
           AS bk
  FROM vecs CROSS JOIN (SELECT unnest(range(0, 8)) AS j) jj),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b ON a.bk = b.bk AND a.vec_id < b.vec_id)
SELECT id_a, id_b,
       round(CAST(list_sum(list_transform(range(1, 65),
                 i -> a.q[i] * b.q[i])) AS DOUBLE)
             / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)), 6) AS sim
FROM cand
JOIN norms a ON a.vec_id = id_a
JOIN norms b ON b.vec_id = id_b
WHERE round(CAST(list_sum(list_transform(range(1, 65),
            i -> a.q[i] * b.q[i])) AS DOUBLE)
            / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)), 6) >= 0.98
"""


# --------------------------------------------------------------------------
# Q35  entity extraction (M1-M5 chain): dictionary BIO tagger -> tag repair
#      -> BIO->span assembly, all inside one Arrow mapInPandas stage; the
#      oracle reproduces the span semantics as gaps-and-islands SQL
# --------------------------------------------------------------------------

_EXTRACT_LEXICON = {
    "join": "Operator", "scan": "Operator", "sort": "Operator",
    "merge": "Operator", "filter": "Operator", "agg": "Operator",
    "hash": "Structure", "vector": "Structure", "stream": "Structure",
    "window": "Structure", "batch": "Structure", "column": "Structure",
    "row": "Structure", "table": "Structure",
}


def q35_entity_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tabiya_livelihoods_classifier_spark.functions.extraction import (
        extract_entities_df,
    )

    docs = _cpu_fanout(spark, sf_dir, "documents")(
        load(spark, sf_dir, "documents")
    ).select("doc_id", "text")
    return extract_entities_df(docs, _EXTRACT_LEXICON)


_LEX_VALUES = ", ".join(
    f"('{w}', '{t}')" for w, t in _EXTRACT_LEXICON.items()
)

Q35_SQL = f"""
WITH lex(token, ent_type) AS (VALUES {_LEX_VALUES}),
toks AS (
  SELECT doc_id, unnest(ts) AS token, generate_subscripts(ts, 1) AS pos
  FROM (SELECT doc_id, {_TOK_LIST_SQL} AS ts FROM documents) t),
tagged AS (
  SELECT doc_id, pos, toks.token, ent_type
  FROM toks JOIN lex ON toks.token = lex.token),
islands AS (
  SELECT doc_id, pos, token, ent_type,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id, ent_type
                                  ORDER BY pos) AS grp
  FROM tagged),
ents AS (
  SELECT doc_id, ent_type, MIN(pos) AS start_pos,
         string_agg(token, ' ' ORDER BY pos) AS ent_text
  FROM islands GROUP BY doc_id, ent_type, grp
  -- adjacent same-type runs merge; a gap or a type switch splits
  )
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_pos) - 1
            AS INT) AS ent_idx,
       ent_type, ent_text
FROM ents
"""


# --------------------------------------------------------------------------
# Q36  tolerant payload extraction (P15/P16): the reference's fallback
#      chain JSON -> literal_eval -> delimiter/regex scrape
#      (2_2_clean_bert_results.py:170-250) as an expression CASCADE. The
#      events.props corpus is clean JSON, so malformed tiers are derived
#      deterministically first: every 3rd row becomes python-ish
#      single-quoted dict (literal tier), every 3rd+1 a 'k=<n>;...'
#      delimiter string (regex tier), the rest stay JSON.
# --------------------------------------------------------------------------


def q36_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # JSON-parse-dense rows: fan across cores (single-row-group local
    # parquet = 1 effective scan task; measured single-threaded at sf1.0)
    ev = _cpu_fanout(spark, sf_dir, "events")(load(spark, sf_dir, "events"))
    kstr = F.get_json_object(F.col("props"), "$.k")
    kint = kstr.cast("int")
    # regex-tier payloads carry a quoted multi-value 'retrieved' list WITH
    # duplicates (derived from k, deterministic) — the hardest shape the
    # reference's fallback scrape recovers (2_2_clean_bert_results.py:
    # 213-250: "'retrieved': '...'" list extraction + ordered dedupe).
    lab = lambda c: F.concat(F.lit("lab"), c.cast("string"))  # noqa: E731
    payload = (
        F.when(
            F.col("event_id") % 3 == 0,
            F.translate(F.col("props"), '"', "'"),
        )
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(
                F.lit("k="), kstr,
                F.lit(";retrieved='"), lab(kint % 5),
                F.lit("|"), lab((kint + 1) % 5),
                F.lit("|"), lab(kint % 5),
                F.lit("';src=evt"),
            ),
        )
        .otherwise(F.col("props"))
    )
    df = ev.select("event_id", payload.alias("payload"))
    # Structural pre-gates (guide §1.2 per-task work): from_json on a
    # non-JSON string raises+catches a JVM exception per row inside the
    # FailureSafeParser — measured ~200 core-us per malformed row at sf1.0,
    # i.e. the malformed tiers made the parse cascade ~10x the cost of the
    # parse itself. A struct-schema from_json can only return non-null when
    # the input is a JSON OBJECT, and a JSON object must open with '{'
    # followed (after JSON whitespace) by '"' or '}' — strict quoting
    # (allowSingleQuotes=false) and default unquoted-field-name rejection
    # guarantee any string failing the regex parses to null anyway. The
    # gate therefore only SKIPS provably-null parses: same result, no
    # exception storm (the literal tier's "{'" no longer reaches the strict
    # parser, the regex tier's 'k=' reaches neither parser).
    _json_obj_gate = r"^\s*\{\s*[\"}]"
    k_json = F.when(
        F.col("payload").rlike(_json_obj_gate),
        # allowSingleQuotes=false: Jackson's lenient default would swallow
        # the literal tier's python-ish quoting and misreport it as strict
        # JSON
        F.from_json(
            F.col("payload"), "k int", {"allowSingleQuotes": "false"}
        )["k"],
    )
    # literal tier: deterministic single->double quote normalization, the
    # engine-portable analog of ast.literal_eval on dict-ish strings
    k_lit = F.when(
        F.col("payload").rlike(r"^\s*\{\s*['\"}]"),
        F.from_json(F.translate(F.col("payload"), "'", '"'), "k int")["k"],
    )
    k_rx = F.regexp_extract(F.col("payload"), r"k=(-?\d+)", 1).cast("int")
    tier = (
        F.when(k_json.isNotNull(), F.lit("json"))
        .when(k_lit.isNotNull(), F.lit("literal"))
        .when(k_rx.isNotNull(), F.lit("regex"))
        .otherwise(F.lit("failed"))
    )
    # multi-value recovery (P16 hardest tier): scrape the quoted list, split
    # on '|', order-preserving dedupe (T2 remove_duplicates_ordered analog:
    # keep an element only at its FIRST position) — all JVM expressions.
    ret_raw = F.regexp_extract(F.col("payload"), r"retrieved='([^']*)'", 1)
    ret_list = F.split(ret_raw, r"\|")
    ret = F.when(
        ret_raw != "",
        F.filter(
            ret_list,
            lambda x, i: F.array_position(ret_list, x) == i + 1,
        ),
    )
    # serialized (not array<string>): the driver's correctness gate
    # canonicalizes via pandas sort_values, which cannot hash list cells —
    # the ordered-dedup semantics live in `ret`; the join is presentation
    return df.select(
        "event_id",
        F.coalesce(k_json, k_lit, k_rx).alias("k"),
        tier.alias("parse_tier"),
        F.array_join(ret, "|").alias("retrieved"),
    )


Q36_SQL = """
WITH pay AS (
  SELECT event_id,
         CASE
           WHEN event_id % 3 = 0 THEN replace(props, '"', CHR(39))
           WHEN event_id % 3 = 1
             THEN 'k=' || json_extract_string(props, '$.k')
                  || ';retrieved=''lab'
                  || CAST(TRY_CAST(json_extract_string(props, '$.k') AS INT)
                          % 5 AS VARCHAR)
                  || '|lab'
                  || CAST((TRY_CAST(json_extract_string(props, '$.k') AS INT)
                           + 1) % 5 AS VARCHAR)
                  || '|lab'
                  || CAST(TRY_CAST(json_extract_string(props, '$.k') AS INT)
                          % 5 AS VARCHAR)
                  || ''';src=evt'
           ELSE props
         END AS payload
  FROM events),
tiers AS (
  SELECT event_id, payload,
         TRY_CAST(json_extract_string(TRY_CAST(payload AS JSON), '$.k')
                  AS INT) AS k_json,
         TRY_CAST(json_extract_string(
                    TRY_CAST(replace(payload, CHR(39), '"') AS JSON), '$.k')
                  AS INT) AS k_lit,
         TRY_CAST(regexp_extract(payload, 'k=(-?\\d+)', 1) AS INT) AS k_rx,
         regexp_extract(payload, 'retrieved=''([^'']*)''', 1) AS ret_raw
  FROM pay)
SELECT event_id,
       COALESCE(k_json, k_lit, k_rx) AS k,
       CASE WHEN k_json IS NOT NULL THEN 'json'
            WHEN k_lit IS NOT NULL THEN 'literal'
            WHEN k_rx IS NOT NULL THEN 'regex'
            ELSE 'failed' END AS parse_tier,
       CASE WHEN ret_raw <> ''
            THEN array_to_string(
                   list_filter(str_split(ret_raw, '|'),
                     (x, i) ->
                       list_position(str_split(ret_raw, '|'), x) = i),
                   '|')
       END AS retrieved
FROM tiers
"""


# --------------------------------------------------------------------------
# Q37  relation-type routing (J5): blank relation type fans the row into
#      BOTH the essential and optional buckets (3_2a...py:539-547,576-595)
# --------------------------------------------------------------------------


def q37_relation_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    rel = li.select(
        "l_orderkey",
        "l_partkey",
        F.when(F.col("l_returnflag") == "R", F.lit("essential"))
        .when(F.col("l_returnflag") == "A", F.lit("optional"))
        .otherwise(F.lit(""))
        .alias("rel_type"),
    )
    # blank -> both buckets, exactly the reference's fan-out — expressed as
    # ONE grouped pass with two conditional DISTINCT aggregates instead of
    # two full aggregations of lineitem + a full-outer join (guide §2.4:
    # two operations keyed the same way share one exchange; the r6 plan
    # scanned + shuffled lineitem twice and joined 1.5M-row results).
    # countDistinct ignores the NULLs the when() injects, so each side
    # counts exactly the rows its filter kept, an orderkey missing from one
    # bucket counts 0 (the old full-outer coalesce), and the output keys —
    # every orderkey with >= 1 lineitem row — are identical.
    ess_pk = F.when(
        F.col("rel_type").isin("essential", ""), F.col("l_partkey")
    )
    opt_pk = F.when(
        F.col("rel_type").isin("optional", ""), F.col("l_partkey")
    )
    return rel.groupBy("l_orderkey").agg(
        F.countDistinct(ess_pk).alias("n_essential"),
        F.countDistinct(opt_pk).alias("n_optional"),
    )


Q37_SQL = """
WITH rel AS (
  SELECT l_orderkey, l_partkey,
         CASE l_returnflag WHEN 'R' THEN 'essential'
              WHEN 'A' THEN 'optional' ELSE '' END AS rel_type
  FROM lineitem),
ess AS (SELECT l_orderkey, COUNT(DISTINCT l_partkey) AS n_essential
        FROM rel WHERE rel_type IN ('essential', '') GROUP BY 1),
opt AS (SELECT l_orderkey, COUNT(DISTINCT l_partkey) AS n_optional
        FROM rel WHERE rel_type IN ('optional', '') GROUP BY 1)
SELECT COALESCE(ess.l_orderkey, opt.l_orderkey) AS l_orderkey,
       COALESCE(n_essential, 0) AS n_essential,
       COALESCE(n_optional, 0) AS n_optional
FROM ess FULL OUTER JOIN opt ON ess.l_orderkey = opt.l_orderkey
"""


# --------------------------------------------------------------------------
# Q38  per-type taxonomy linking: entity-type routing + per-type cosine
#      bounds + top-k (plans/linking.link_entities semantics — linker.py:
#      268-330, evaluator.py:190 bounds — with the battery's quantized
#      parity arithmetic; every 10th vector queries the rest as "taxonomy")
# --------------------------------------------------------------------------


_Q38_BOUNDS = {"Occupation": 0.0, "Skill": 0.7, "Qualification": 0.8}


def q38_entity_linking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity->taxonomy linking. Two physical strategies, same contract:

    - numpy block matmul (corpus <= KNN_NUMPY_MAX_ROWS): the entity side
      (every 10th vector — the same 10% the exact-kNN path broadcasts) is
      collected per type and each Arrow batch of the taxonomy side is
      scored with one BLAS matmul per type + per-batch gated top-4; a
      final window merges partials. Exact: integer-valued float64
      products/sums stay < 2^53 and the denominator mirrors the relational
      sqrt(na_double * nb_double) op-for-op, so sims are bitwise identical.
      Replaces a BroadcastNestedLoopJoin whose per-pair dot product ran as
      an interpreted aggregate-HOF (guide §4.2 — hand whole batches to
      native code): measured 130.8 s -> ~4 s at sf1.0.
    - the relational join above the gate (no driver collect; survives any
      corpus size).
    """
    if _table_rows(sf_dir, "embeddings") <= KNN_NUMPY_MAX_ROWS:
        return _entity_linking_numpy(spark, sf_dir)
    return _entity_linking_relational(spark, sf_dir)


def _q38_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _quantized_vecs(spark, sf_dir)
    etype = (
        F.when(F.col("label") % 3 == 0, F.lit("Occupation"))
        .when(F.col("label") % 3 == 1, F.lit("Skill"))
        .otherwise(F.lit("Qualification"))
    )
    return vecs.withColumn("entity_type", etype)


def _entity_linking_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    typed = _q38_typed(spark, sf_dir)
    erows = (
        typed.filter(F.col("vec_id") % 10 == 0)
        .select("vec_id", "entity_type", "q", "nq")
        .collect()
    )
    out_schema = (
        "entity_id bigint, entity_type string, tax_id bigint, sim double"
    )
    if not erows:
        return spark.createDataFrame([], out_schema + ", rnk int").select(
            "entity_id", "entity_type", "tax_id",
            F.round("sim", 6).alias("sim"), "rnk",
        )
    by_type: dict[str, list] = {}
    for r in erows:
        by_type.setdefault(r["entity_type"], []).append(r)
    payload = {}
    for et, rows in by_type.items():
        payload[et] = (
            np.array([r["vec_id"] for r in rows], dtype=np.int64),
            np.array([r["q"] for r in rows], dtype=np.float64),
            np.array([r["nq"] for r in rows], dtype=np.float64),
        )
    bc = spark.sparkContext.broadcast((payload, dict(_Q38_BOUNDS)))

    def score(batches):
        import numpy as _np
        import pandas as _pd

        b_payload, b_bounds = bc.value
        for pdf in batches:
            for et, grp in pdf.groupby("entity_type"):
                if et not in b_payload or not len(grp):
                    continue
                eids, emat, enq = b_payload[et]
                cid = grp["vec_id"].to_numpy(dtype=_np.int64)
                cmat = _np.array(list(grp["q"]), dtype=_np.float64)
                cnq = grp["nq"].to_numpy(dtype=_np.float64)
                # candidates pre-sorted by tax_id asc so the stable sort on
                # -sim breaks float ties exactly like the relational
                # window's tax_id ASC tie-break
                order = _np.argsort(cid, kind="stable")
                cid_s = cid[order]
                sims = (emat @ cmat[order].T) / _np.sqrt(
                    enq[:, None] * cnq[None, :]
                )
                m = len(eids)
                kept = min(4, cid_s.shape[0])
                top = _np.argsort(-sims, axis=1, kind="stable")[:, :kept]
                qi = _np.repeat(_np.arange(m), kept)
                ci = top.ravel()
                s = sims[qi, ci]
                # the >= bound gate commutes with ranking (gated rows are a
                # sim-desc prefix), so applying it per batch only drops
                # rows the final filter would drop anyway
                mask = s >= b_bounds.get(et, 0.0)
                if not mask.any():
                    continue
                yield _pd.DataFrame(
                    {
                        "entity_id": eids[qi][mask],
                        "entity_type": et,
                        "tax_id": cid_s[ci][mask],
                        "sim": s[mask],
                    }
                )

    partials = (
        typed.filter(F.col("vec_id") % 10 != 0)
        .select("vec_id", "entity_type", "q", "nq")
        .mapInPandas(score, schema=out_schema)
    )
    w = Window.partitionBy("entity_id", "entity_type").orderBy(
        F.col("sim").desc(), F.col("tax_id").asc()
    )
    return (
        partials.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 4)
        .select(
            "entity_id", "entity_type", "tax_id",
            F.round("sim", 6).alias("sim"), "rnk",
        )
    )


def _entity_linking_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _quantized_vecs(spark, sf_dir)
    etype = (
        F.when(F.col("label") % 3 == 0, F.lit("Occupation"))
        .when(F.col("label") % 3 == 1, F.lit("Skill"))
        .otherwise(F.lit("Qualification"))
    )
    typed = vecs.withColumn("entity_type", etype)
    a = typed.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("entity_id"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
        "entity_type",
    )
    b = typed.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("tax_id"),
        F.col("q").alias("qb"),
        F.col("nq").alias("nb"),
        "entity_type",
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sim = dot.cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    bound = (
        F.when(F.col("entity_type") == "Occupation", F.lit(0.0))
        .when(F.col("entity_type") == "Skill", F.lit(0.7))
        .otherwise(F.lit(0.8))
    )
    # entity-type routing join = the reference's per-type vector stores;
    # the taxonomy side is the broadcast dim side at real scale
    w = Window.partitionBy("entity_id", "entity_type").orderBy(
        F.col("sim").desc(), F.col("tax_id").asc()
    )
    return (
        a.join(F.broadcast(b), "entity_type")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= bound)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 4)
        .select(
            "entity_id",
            "entity_type",
            "tax_id",
            F.round("sim", 6).alias("sim"),
            "rnk",
        )
    )


Q38_SQL = f"""
WITH vecs AS (
  SELECT vec_id, label, {_QUANT_SQL} AS q FROM embeddings),
norms AS (
  SELECT * FROM (
    SELECT vec_id, label, q,
           list_sum(list_transform(q, x -> x * x)) AS nq,
           CASE WHEN label % 3 = 0 THEN 'Occupation'
                WHEN label % 3 = 1 THEN 'Skill'
                ELSE 'Qualification' END AS entity_type
    FROM vecs) t
  WHERE nq > 0),
scored AS (
  SELECT a.vec_id AS entity_id, a.entity_type, b.vec_id AS tax_id,
         CAST(list_sum(list_transform(range(1, 65),
                       i -> a.q[i] * b.q[i])) AS DOUBLE)
           / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) AS sim
  FROM norms a JOIN norms b
    ON a.entity_type = b.entity_type AND b.vec_id % 10 <> 0
  WHERE a.vec_id % 10 = 0),
gated AS (
  SELECT * FROM scored
  WHERE sim >= CASE entity_type WHEN 'Occupation' THEN 0.0
               WHEN 'Skill' THEN 0.7 ELSE 0.8 END)
SELECT entity_id, entity_type, tax_id, round(sim, 6) AS sim, rnk FROM (
  SELECT entity_id, entity_type, tax_id, sim,
         ROW_NUMBER() OVER (PARTITION BY entity_id, entity_type
                            ORDER BY sim DESC, tax_id ASC) AS rnk
  FROM gated) t
WHERE rnk <= 4
"""


# --------------------------------------------------------------------------
# Q39  graph-distance kernel (M9): weighted depth-<=3 ancestor closure with
#      min summed edge weight and exp(-0.7*d) kernel scoring
#      (operators/graph.weighted_ancestors; matching_config.json:5-12)
# --------------------------------------------------------------------------


def q39_graph_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tabiya_livelihoods_classifier_spark.operators.graph import (
        kernel_scores,
        weighted_ancestors,
    )

    part = load(spark, sf_dir, "part")
    # hierarchy edges (weight 1.0) within the part-id space + relation
    # edges (weight 1.5) into a disjoint 200000+ space, itself carrying a
    # second hierarchy level — mixed-weight multi-hop paths
    hier = part.selectExpr(
        "p_partkey as child", "p_partkey div 7 as parent",
        "cast(1.0 as double) as weight",
    ).filter("parent >= 1 and parent <> child")
    rel = part.selectExpr(
        "p_partkey as child", "200000 + p_partkey div 5 as parent",
        "cast(1.5 as double) as weight",
    )
    rel2 = (
        part.selectExpr("p_partkey div 5 as k")
        .filter("k div 7 >= 1")
        .distinct()
        .selectExpr(
            "200000 + k as child", "200000 + k div 7 as parent",
            "cast(1.0 as double) as weight",
        )
    )
    edges = hier.unionByName(rel).unionByName(rel2).dropDuplicates(
        ["child", "parent"]
    )
    out = kernel_scores(weighted_ancestors(edges, max_depth=3))
    return out.select(
        "node", "ancestor", "dist", F.round("score", 6).alias("score")
    )


Q39_SQL = """
WITH RECURSIVE e AS (
  SELECT p_partkey AS child, p_partkey // 7 AS parent, 1.0 AS w
  FROM part WHERE p_partkey // 7 >= 1 AND p_partkey // 7 <> p_partkey
  UNION
  SELECT p_partkey, 200000 + p_partkey // 5, 1.5 FROM part
  UNION
  SELECT 200000 + k, 200000 + k // 7, 1.0
  FROM (SELECT DISTINCT p_partkey // 5 AS k FROM part) t
  WHERE k // 7 >= 1),
walk(node, ancestor, dist, steps) AS (
  SELECT child, parent, w, 1 FROM e
  UNION
  SELECT wk.node, e.parent, wk.dist + e.w, wk.steps + 1
  FROM walk wk JOIN e ON wk.ancestor = e.child
  WHERE wk.steps < 3)
SELECT node, ancestor, MIN(dist) AS dist,
       round(exp(-0.7 * MIN(dist)), 6) AS score
FROM walk GROUP BY node, ancestor
"""


# --------------------------------------------------------------------------
# Q40  sentence tokenization (P2: linker.py:158 sent_tokenize analog) —
#      documents carry no punctuation, so sentence structure is derived
#      deterministically first (articles become terminators), then split
#      with functions.text.sentences and exploded with positions
# --------------------------------------------------------------------------


def q40_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tabiya_livelihoods_classifier_spark.functions.text import sentences

    docs = _cpu_fanout(spark, sf_dir, "documents")(
        load(spark, sf_dir, "documents")
    )
    sent_text = F.regexp_replace(F.col("text"), r" (the|a) ", ". ")
    return docs.select(
        "doc_id", F.posexplode(sentences(sent_text)).alias("sent_idx", "sentence")
    ).select(
        "doc_id", F.col("sent_idx").cast("int").alias("sent_idx"), "sentence"
    )


Q40_SQL = r"""
WITH c AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             regexp_extract_all(
               trim(regexp_replace(regexp_replace(
                 regexp_replace(COALESCE(text, ''), ' (the|a) ', '. ', 'g'),
                 '[\n\r\t]', ' ', 'g'), ' {2,}', ' ', 'g')),
               '[^.!?]+[.!?]*'),
             x -> trim(x)),
           x -> x <> '') AS ss
  FROM documents)
SELECT doc_id,
       CAST(generate_subscripts(ss, 1) - 1 AS INT) AS sent_idx,
       unnest(ss) AS sentence
FROM c
"""


# --------------------------------------------------------------------------
# Q41  IR metrics at the reference's k grid {1,4,16,32}
#      (inference/evaluator.py:34-38) — one kNN pass at k=32, fanned per k
#      with a broadcast k table; IDCG relational (no hardcoded constants)
# --------------------------------------------------------------------------

from tabiya_livelihoods_classifier_spark.config import IR_KS as IR_K_GRID


def q41_ir_multi_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    kmax = max(IR_K_GRID)
    topk = _knn_topk_staged(spark, sf_dir, kmax)
    rel = topk.withColumn(
        "rel", (F.col("query_label") == F.col("candidate_label")).cast("int")
    )
    # raw embeddings for the relevance pool — same rationale as q21
    nrel = _nrel_per_query(load(spark, sf_dir, "embeddings"))
    dec = "decimal(18,12)"
    ks = spark.createDataFrame([(k,) for k in IR_K_GRID], "k int")
    fan = rel.crossJoin(F.broadcast(ks)).filter(F.col("rnk") <= F.col("k"))
    cum_w = (
        Window.partitionBy("k", "query_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fan = fan.withColumn("cum_rel", F.sum("rel").over(cum_w))
    per_q = (
        fan.groupBy("k", "query_id")
        .agg(
            F.max("rel").alias("acc"),
            F.sum("rel").alias("hits"),
            F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    (F.lit(1.0) / F.log2(F.col("rnk") + 1)).cast(dec),
                ).otherwise(F.lit(0).cast(dec))
            ).alias("dcg"),
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    (F.col("cum_rel").cast("double") / F.col("rnk")).cast(dec),
                ).otherwise(F.lit(0).cast(dec))
            ).alias("ap_num"),
        )
        .join(nrel, "query_id", "left")
        .na.fill({"n_rel": 0})
    )
    idcg_tab = _idcg_table(spark, kmax)
    per_q = per_q.join(
        F.broadcast(idcg_tab),
        F.least(F.col("n_rel"), F.col("k")) == idcg_tab.r,
        "left",
    )
    per_q = per_q.select(
        "k",
        "query_id",
        "acc",
        "hits",
        "n_rel",
        F.coalesce(
            (F.lit(1.0) / F.col("first_rel")).cast(dec), F.lit(0).cast(dec)
        ).alias("rr"),
        F.coalesce(
            (F.col("dcg").cast("double") / F.col("idcg").cast("double")).cast(dec),
            F.lit(0).cast(dec),
        ).alias("ndcg"),
        F.coalesce(
            (
                F.col("ap_num").cast("double")
                / F.least(F.col("n_rel"), F.col("k")).cast("double")
            ).cast(dec),
            F.lit(0).cast(dec),
        ).alias("ap"),
        F.coalesce(
            (F.col("hits").cast("double") / F.col("n_rel").cast("double")).cast(
                dec
            ),
            F.lit(0).cast(dec),
        ).alias("recall"),
    )
    return (
        per_q.groupBy("k")
        .agg(
            F.count("*").alias("n_queries"),
            F.round(F.sum("acc").cast("double") / F.count("*"), 6).alias(
                "accuracy"
            ),
            F.round(
                F.sum("hits").cast("double")
                / (F.first("k").cast("double") * F.count("*")),
                6,
            ).alias("precision"),
            F.round(F.sum("recall").cast("double") / F.count("*"), 6).alias(
                "recall"
            ),
            F.round(F.sum("rr").cast("double") / F.count("*"), 6).alias("mrr"),
            F.round(F.sum("ndcg").cast("double") / F.count("*"), 6).alias(
                "ndcg"
            ),
            F.round(F.sum("ap").cast("double") / F.count("*"), 6).alias("map"),
        )
        .select(
            "k", "n_queries", "accuracy", "precision", "recall", "mrr",
            "ndcg", "map",
        )
    )


Q41_SQL = f"""
WITH {_KNN_CTE.strip()},
ks AS (SELECT unnest([1, 4, 16, 32]) AS k),
fan AS (
  SELECT ks.k, query_id, candidate_id, rnk,
         CASE WHEN query_label = candidate_label THEN 1 ELSE 0 END AS rel
  FROM ranked CROSS JOIN ks WHERE rnk <= ks.k),
nrel AS (
  SELECT a.vec_id AS query_id, COUNT(*) AS n_rel
  FROM embeddings a JOIN embeddings b
    ON b.vec_id <> a.vec_id AND a.label = b.label
  WHERE a.vec_id % 10 = 0
  GROUP BY 1),
cum AS (
  SELECT *, SUM(rel) OVER (PARTITION BY k, query_id ORDER BY rnk) AS cum_rel
  FROM fan),
per_q AS (
  SELECT t.k, t.query_id,
         MAX(rel) AS acc,
         SUM(rel) AS hits,
         COALESCE(n.n_rel, 0) AS n_rel,
         COALESCE(CAST(1.0 / MIN(CASE WHEN rel = 1 THEN rnk END)
                       AS DECIMAL(18,12)), CAST(0 AS DECIMAL(18,12))) AS rr,
         SUM(CASE WHEN rel = 1
                  THEN CAST(1.0 / log2(rnk + 1) AS DECIMAL(18,12))
                  ELSE CAST(0 AS DECIMAL(18,12)) END) AS dcg,
         SUM(CASE WHEN rel = 1
                  THEN CAST(CAST(cum_rel AS DOUBLE) / rnk AS DECIMAL(18,12))
                  ELSE CAST(0 AS DECIMAL(18,12)) END) AS ap_num
  FROM cum t LEFT JOIN nrel n ON t.query_id = n.query_id
  GROUP BY t.k, t.query_id, n.n_rel),
{_idcg_tab_sql(32)},
fin AS (
  SELECT k, query_id, acc, hits, n_rel, rr,
         COALESCE(CAST(CAST(dcg AS DOUBLE) / CAST(it.idcg AS DOUBLE)
                       AS DECIMAL(18,12)), CAST(0 AS DECIMAL(18,12))) AS ndcg,
         COALESCE(CAST(CAST(ap_num AS DOUBLE) / CAST(least(n_rel, k) AS DOUBLE)
                       AS DECIMAL(18,12)), CAST(0 AS DECIMAL(18,12))) AS ap,
         COALESCE(CAST(CAST(hits AS DOUBLE) / CAST(n_rel AS DOUBLE)
                       AS DECIMAL(18,12)), CAST(0 AS DECIMAL(18,12))) AS recall
  FROM per_q LEFT JOIN idcg_tab it ON least(per_q.n_rel, per_q.k) = it.r)
SELECT k, COUNT(*) AS n_queries,
       round(CAST(SUM(acc) AS DOUBLE) / COUNT(*), 6) AS accuracy,
       round(CAST(SUM(hits) AS DOUBLE) / (CAST(k AS DOUBLE) * COUNT(*)), 6)
         AS precision,
       round(CAST(SUM(recall) AS DOUBLE) / COUNT(*), 6) AS recall,
       round(CAST(SUM(rr) AS DOUBLE) / COUNT(*), 6) AS mrr,
       round(CAST(SUM(ndcg) AS DOUBLE) / COUNT(*), 6) AS ndcg,
       round(CAST(SUM(ap) AS DOUBLE) / COUNT(*), 6) AS map
FROM fin GROUP BY k
"""


# --------------------------------------------------------------------------
# Q42  SimHash hamming near-dup pairs: 4x8-bit band equi-join over the
#      32-bit sketch, exact popcount filter. Banding here is EXACT — a pair
#      within hamming distance 3 differs in at most 3 of the 4 bands, so by
#      pigeonhole it agrees on at least one band key: zero recall loss,
#      unlike q12's DF cap or q34's sign bands (both documented lossy).
# --------------------------------------------------------------------------

SIMHASH_HAMMING_MAX = 3
_SIMHASH_BANDS = 4  # must be > SIMHASH_HAMMING_MAX for exactness
# 60-bit sketch (15 bits/band): on a template-generated corpus a 32-bit
# sketch band-collides half the corpus into shared buckets (measured 30k
# hamming<=3 pairs among 767 docs); 15-bit band values keep random
# collisions at 2^-15 so candidate volume tracks TRUE near-duplicates.
_SIMHASH_NBITS = 60
# Band buckets are joined over DISTINCT simhashes (see below), so a bucket
# only grows with distinct-sketch collisions, never with duplication. A
# bucket above this many distinct hashes is a degenerate band value (e.g.
# all-zero bands from empty/near-empty docs) whose quadratic rep-join cost
# buys ~no recall — purged outright, same discipline as
# operators/blocking.purge_oversized; pairs in a purged bucket can still be
# recovered by their other 3 bands. Random 15-bit collisions put ~N/2^15
# hashes per bucket, so the cap only ever triggers on degenerate values.
SIMHASH_BUCKET_MAX = 4096


def collapse_sketches(shh: DataFrame) -> DataFrame:
    """Duplicate collapse (the q12 set-signature / candidate_pairs
    duplicate-block discipline applied to sketches): one (simhash, sorted
    ids) row per DISTINCT sketch — a corpus with one document duplicated
    1e6 times puts ONE row per band bucket downstream, not 1e6."""
    return shh.groupBy("simhash").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )


def simhash_band_membership(
    groups: DataFrame,
    nbits: int = _SIMHASH_NBITS,
    n_bands: int = _SIMHASH_BANDS,
    bucket_max: int = SIMHASH_BUCKET_MAX,
) -> DataFrame:
    """(band, bv, simhash) membership over distinct sketches, with buckets
    above `bucket_max` DISTINCT hashes purged (anti-join against the purged
    keys — at most |bands|/cap of them, cf. blocking.purge_oversized)."""
    bw = nbits // n_bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", bw * b)
            .bitwiseAND(F.lit((1 << bw) - 1))
            .alias("bv"),
        )
        for b in range(n_bands)
    ]
    bands = groups.select(
        "simhash", F.explode(F.array(*band_structs)).alias("bb")
    ).select(
        "simhash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv")
    )
    purged = (
        bands.groupBy("band", "bv")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > bucket_max)
        .select("band", "bv")
    )
    return bands.join(purged, ["band", "bv"], "left_anti")


def simhash_neardup_pairs(
    shh: DataFrame,
    hamming_max: int = SIMHASH_HAMMING_MAX,
    nbits: int = _SIMHASH_NBITS,
    n_bands: int = _SIMHASH_BANDS,
    bucket_max: int = SIMHASH_BUCKET_MAX,
) -> DataFrame:
    """All (id_a < id_b, hamming) pairs within `hamming_max` from a
    (doc_id, simhash) frame, duplication-proof: identical sketches collapse
    before the band join, so join fan-out is bounded by distinct-sketch
    bucket sizes regardless of how duplicate-heavy the corpus is."""
    groups = collapse_sketches(shh)
    # Identical-sketch pairs are hamming-0 by definition: streamed from the
    # sorted id arrays (id_a < id_b via the sort), no join at all. These
    # are true result rows, so the emission is output-bound — and because
    # _pair_explode never materializes the C(n,2) pair array in one row, a
    # 1e5-duplicate group streams its pairs at bounded task memory instead
    # of OOMing (at the scale where even the OUTPUT is intractable —
    # 1e6-dup groups => C(1e6,2) pairs — the cluster representation (q44)
    # is the product, not pair enumeration).
    intra = _pair_explode(groups.filter(F.size("ids") >= 2), "ids").select(
        "id_a",
        "id_b",
        F.lit(0).cast("int").alias("hamming"),
    )
    # band buckets grouped ONCE over distinct sketches: the same grouped
    # pass yields the purge predicate (bucket size in DISTINCT hashes) AND
    # the sorted member list for in-array pair generation — replacing the
    # previous count-aggregate + anti-join + band self-join (two shuffles
    # of the membership fact) with one groupBy. Fan-out stays bounded by
    # C(bucket_max, 2) per surviving bucket, exactly the self-join's bound.
    bw = nbits // n_bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", bw * b)
            .bitwiseAND(F.lit((1 << bw) - 1))
            .alias("bv"),
        )
        for b in range(n_bands)
    ]
    buckets = (
        groups.select(
            "simhash", F.explode(F.array(*band_structs)).alias("bb")
        )
        .groupBy(F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
        .agg(F.array_sort(F.collect_list("simhash")).alias("hs"))
    )
    # rep-level pair dedupe: a distinct-hash pair can match in up to 4
    # bands, so the dedupe fact is O(distinct near-dup hash pairs) — NOT
    # O(doc pairs x bands) as the pre-collapse formulation paid.
    rep_pairs = (
        _pair_explode(
            buckets.filter(
                (F.size("hs") >= 2) & (F.size("hs") <= bucket_max)
            ),
            "hs",
            "ha",
            "hb",
        )
        .dropDuplicates(["ha", "hb"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int"),
        )
        .filter((F.col("hamming") > 0) & (F.col("hamming") <= hamming_max))
    )
    # expand surviving rep pairs back to doc pairs: groups are disjoint, so
    # each unordered doc pair appears under exactly one rep pair — no
    # doc-level dedupe needed (least/greatest restores id_a < id_b).
    ga = groups.select(F.col("simhash").alias("ha"), F.col("ids").alias("ia"))
    gb = groups.select(F.col("simhash").alias("hb"), F.col("ids").alias("ib"))
    cross = (
        rep_pairs.join(ga.hint("shuffle_hash"), "ha")
        .join(gb.hint("shuffle_hash"), "hb")
        .select(F.explode("ia").alias("x"), "ib", "hamming")
        .select("x", F.explode("ib").alias("y"), "hamming")
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            "hamming",
        )
    )
    return intra.unionByName(cross)


def q42_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    shh = _simhash_wide(
        _perturbed_corpus(spark, sf_dir).select("doc_id", "text"),
        _SIMHASH_NBITS,
    )
    return simhash_neardup_pairs(shh)


Q42_SQL = f"""
WITH {_CORPUS_CTE.strip()},
toks AS (
  SELECT doc_id, unnest(list_distinct({_TOK_LIST_SQL})) AS token FROM corpus),
bits AS (
  SELECT doc_id, k,
         SUM(2 * ((strpos('0123456789abcdef',
                          substr(md5(token), CAST(k // 4 AS INT) + 1, 1)) - 1)
                  >> (k % 4) & 1) - 1) AS s
  FROM toks CROSS JOIN (SELECT unnest(range(0, {_SIMHASH_NBITS})) AS k) ks
  GROUP BY doc_id, k),
shh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << k ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id),
intra AS (
  -- identical sketches are hamming-0 by definition: emitted from the
  -- sketch groups directly, NEVER subject to band-bucket purging
  -- (mirrors simhash_neardup_pairs' in-array intra emission)
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS hamming
  FROM shh a JOIN shh b
    ON a.simhash = b.simhash AND a.doc_id < b.doc_id),
bands AS (
  -- DISTINCT-sketch banding (mirrors collapse_sketches): bucket size is
  -- counted in distinct sketches, not documents
  SELECT simhash, b AS band,
         (simhash >> ({_SIMHASH_NBITS // _SIMHASH_BANDS} * b))
           & {(1 << (_SIMHASH_NBITS // _SIMHASH_BANDS)) - 1} AS bv
  FROM (SELECT DISTINCT simhash FROM shh)
  CROSS JOIN (SELECT unnest(range(0, {_SIMHASH_BANDS})) AS b) bs),
kept AS (
  -- mirror SIMHASH_BUCKET_MAX: degenerate buckets (> cap distinct
  -- sketches in one band value) are dropped on BOTH engines
  SELECT band, bv FROM bands GROUP BY band, bv
  HAVING COUNT(*) <= {SIMHASH_BUCKET_MAX}),
rep_pairs AS (
  SELECT DISTINCT a.simhash AS ha, b.simhash AS hb
  FROM bands a
  JOIN kept k ON a.band = k.band AND a.bv = k.bv
  JOIN bands b ON a.band = b.band AND a.bv = b.bv
              AND a.simhash < b.simhash),
near AS (
  SELECT ha, hb, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
  FROM rep_pairs
  WHERE bit_count(xor(ha, hb)) BETWEEN 1 AND {SIMHASH_HAMMING_MAX})
SELECT least(sa.doc_id, sb.doc_id) AS id_a,
       greatest(sa.doc_id, sb.doc_id) AS id_b,
       n.hamming AS hamming
FROM near n
JOIN shh sa ON sa.simhash = n.ha
JOIN shh sb ON sb.simhash = n.hb
UNION ALL
SELECT id_a, id_b, hamming FROM intra
"""


# --------------------------------------------------------------------------
# Q43  per-document TF-IDF top terms (training-data text analysis): smooth
#      idf = ln((N+1)/(df+1)) + 1 (the sklearn TfidfVectorizer smoothing),
#      scores ranked as DECIMAL(18,12) so cross-engine ordering is exact
#      (same discipline as the q21/q41 IR metrics), ties broken by term.
# --------------------------------------------------------------------------


def q43_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("ts"))
    )
    tf = (
        docs.select("doc_id", F.explode("ts").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # tf rows are distinct per (doc, term), so count(*) IS the doc frequency
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = load(spark, sf_dir, "documents").groupBy().agg(
        F.count("*").alias("nd")
    )
    dec = "decimal(18,12)"
    sdec = (
        F.col("tf")
        * (F.log((F.col("nd") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + 1.0)
    ).cast(dec)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("sdec").desc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("sdec", sdec)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "doc_id", "term", "rnk",
            F.round(F.col("sdec").cast("double"), 6).alias("score"),
        )
    )


Q43_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOK_LIST_SQL}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS nd FROM documents),
scored AS (
  SELECT doc_id, tf.term,
         CAST(tf * (ln((nd + 1.0) / (df + 1.0)) + 1.0) AS DECIMAL(18,12))
           AS sdec
  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN nd),
ranked AS (
  SELECT doc_id, term, sdec,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY sdec DESC, term ASC) AS rnk
  FROM scored)
SELECT doc_id, term, rnk, round(CAST(sdec AS DOUBLE), 6) AS score
FROM ranked WHERE rnk <= 5
"""


# --------------------------------------------------------------------------
# Q44  near-duplicate dedup CLUSTERS: the step a training-data pipeline runs
#      after q14 — LSH near-dup pairs -> connected components (contraction +
#      hash-min, operators/clustering) -> per-doc canonical id (min doc_id
#      of the component) + cluster size. Keeping one row per canon_id IS
#      corpus dedup; every other row is a near-duplicate to drop.
# --------------------------------------------------------------------------


def q44_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # derived entirely from the staged CC snapshot q26 shares — the
    # near-dup dedup PRODUCT (canonical id + cluster size) costs one
    # aggregate + one join over the committed clusters, never a second CC.
    comp = _er_clusters_staged(spark, sf_dir).select(
        F.col("doc_id").alias("rid"), F.col("cluster_id").alias("component")
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("rid").alias("doc_id"),
            F.col("component").alias("canon_id"),
            "cluster_size",
        )
    )


Q44_SQL = f"""
WITH RECURSIVE {_CORPUS_CTE.strip()},
{_SHINGLE_CTE.strip()},
sig AS (
  SELECT doc_id, h, MIN(md5(CAST(h AS VARCHAR) || ':' || s)) AS minhash
  FROM (SELECT doc_id, unnest(sh) AS s FROM shing) ex
  CROSS JOIN (SELECT unnest(range(0, 16)) AS h) hs
  GROUP BY doc_id, h),
bands AS (
  SELECT doc_id, 'b' || CAST(h // 2 AS VARCHAR) || '|'
         || string_agg(minhash, '|' ORDER BY h) AS bk
  FROM sig GROUP BY doc_id, h // 2),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
e AS (
  SELECT id_a AS a, id_b AS b
  FROM cand
  JOIN shing sa ON sa.doc_id = id_a
  JOIN shing sb ON sb.doc_id = id_b
  WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE),
              6) >= 0.6),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
reach(s, n) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT r.s, y.b FROM reach r JOIN sym y ON r.n = y.a),
comp AS (SELECT s AS doc_id, MIN(n) AS canon_id FROM reach GROUP BY s)
SELECT doc_id, canon_id,
       COUNT(*) OVER (PARTITION BY canon_id) AS cluster_size
FROM comp
"""


# --------------------------------------------------------------------------
# Q45  incremental near-dup cluster maintenance (delta fold == full rerun)
# --------------------------------------------------------------------------


def q45_incremental_dedup_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup clusters maintained INCREMENTALLY: the corpus is split
    deterministically into a base slice and a delta batch (doc_id % 3 == 2
    — the perturbation offsets are ≢ 0 mod 3, so a document and its
    near/exact copies land in DIFFERENT slices and the delta genuinely
    merges into existing clusters), the base slice is clustered the batch
    way, then the delta is folded in touching only its own band buckets:

      * band keys are per-doc functions (_band_membership), so old docs'
        buckets never change — new candidate pairs can only appear in a
        bucket CONTAINING a delta doc;
      * an (old, old) pair co-bucketed in a touched bucket was co-bucketed
        in the base run too, so only pairs with >= 1 delta endpoint are
        rescored;
      * connected components re-runs ONLY on base components touched by a
        new edge (plus delta docs as nodes); every other (doc, cluster)
        row passes through from the base clustering.

    The oracle is the FULL-recompute recursive SQL (Q26 family), so the
    correctness row certifies incremental == batch on rows, schema, and
    values — the document-table twin of streaming/incremental_er.py's
    transcript-ER state fold (which carries the full touched-bucket /
    rescore-set machinery; here the incremental substance is the CLUSTER
    maintenance). Pair discovery is shared with q14's staged snapshot:
    because a doc's band keys are functions of its own shingles alone, the
    base slice's pair set is EXACTLY the staged pairs with both endpoints
    in the base slice, and the delta's new pairs are exactly those with a
    delta endpoint — the same per-doc-key argument that makes the
    transcript updater's touched-bucket join exact, collapsed to two
    filters over one shared materialization. Scale: beyond the shared pair
    stage the query shuffles only the base edge set once (base CC) and the
    affected components' edges (sub CC), both contraction + checkpointed.
    """
    from tabiya_livelihoods_classifier_spark.operators.clustering import (
        connected_components,
    )

    all_pairs = _lsh_pairs_staged(spark, sf_dir).select("id_a", "id_b")
    corpus_ids = _perturbed_corpus(spark, sf_dir).select("doc_id")
    is_delta = F.pmod(F.col("doc_id"), F.lit(3)) == F.lit(2)
    d_a = F.pmod(F.col("id_a"), F.lit(3)) == F.lit(2)
    d_b = F.pmod(F.col("id_b"), F.lit(3)) == F.lit(2)

    # ---- batch clustering of the base slice
    base_nodes = corpus_ids.filter(~is_delta).select(
        F.col("doc_id").alias("rid")
    )
    base_edges = all_pairs.filter(~d_a & ~d_b)
    base_cl = connected_components(base_edges, nodes=base_nodes)

    # ---- delta fold: only pairs with a delta endpoint are new
    new_edges = all_pairs.filter(d_a | d_b)

    # ---- component-local re-clustering
    ends = (
        new_edges.select(F.col("id_a").alias("rid"))
        .unionByName(new_edges.select(F.col("id_b").alias("rid")))
        .distinct()
    )
    aff_comps = (
        base_cl.join(ends, "rid", "left_semi").select("component").distinct()
    )
    aff_members = base_cl.join(aff_comps, "component", "left_semi").select(
        "rid"
    )
    sub_nodes = (
        aff_members.unionByName(
            corpus_ids.filter(is_delta).select(F.col("doc_id").alias("rid"))
        )
        .distinct()
    )
    aff_base_edges = base_edges.join(
        aff_members.withColumnRenamed("rid", "id_a"), "id_a", "left_semi"
    )
    sub_cl = connected_components(
        aff_base_edges.unionByName(new_edges), nodes=sub_nodes
    )
    return (
        base_cl.join(aff_comps, "component", "left_anti")
        .unionByName(sub_cl)
        .select(
            F.col("rid").alias("doc_id"), F.col("component").alias("cluster_id")
        )
    )


Q45_SQL = Q26_SQL  # the oracle IS the full batch recompute — that's the claim


# ==========================================================================
# registry
# ==========================================================================

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_topk_per_group": q02_topk_per_group,
    "q03_region_revenue": q03_region_revenue,
    "q04_semi_join": q04_semi_join,
    "q05_anti_join": q05_anti_join,
    "q06_last_event_per_user": q06_last_event_per_user,
    "q07_dedupe_exact": q07_dedupe_exact,
    "q08_canonicalize": q08_canonicalize,
    "q09_active_flag": q09_active_flag,
    "q10_best_order_per_cust": q10_best_order_per_cust,
    "q11_row_hash": q11_row_hash,
    "q12_jaccard_pairs": q12_jaccard_pairs,
    "q13_minhash_signature": q13_minhash_signature,
    "q14_lsh_dedup_pairs": q14_lsh_dedup_pairs,
    "q15_simhash": q15_simhash,
    "q16_fingerprint": q16_fingerprint,
    "q17_token_stats": q17_token_stats,
    "q18_quality_score": q18_quality_score,
    "q19_lang_guess": q19_lang_guess,
    "q20_ann_topk": q20_ann_topk,
    "q21_knn_ir_metrics": q21_knn_ir_metrics,
    "q22_ann_ivf": q22_ann_ivf,
    "q23_graph_closure": q23_graph_closure,
    "q24_connected_components": q24_connected_components,
    "q25_transcripts_canonical": q25_transcripts_canonical,
    "q26_er_clusters": q26_er_clusters,
    "q27_sessionize": q27_sessionize,
    "q28_scalar_enrich": q28_scalar_enrich,
    "q29_merge_fill_dedupe": q29_merge_fill_dedupe,
    "q30_uuid_history": q30_uuid_history,
    "q31_compact_last_wins": q31_compact_last_wins,
    "q32_multimodal_meta": q32_multimodal_meta,
    "q33_session_window": q33_session_window,
    "q34_embedding_neardup": q34_embedding_neardup,
    "q35_entity_extraction": q35_entity_extraction,
    "q36_json_extract": q36_json_extract,
    "q37_relation_routing": q37_relation_routing,
    "q38_entity_linking": q38_entity_linking,
    "q39_graph_kernel": q39_graph_kernel,
    "q40_sentence_split": q40_sentence_split,
    "q41_ir_multi_k": q41_ir_multi_k,
    "q42_simhash_neardup": q42_simhash_neardup,
    "q43_tfidf_topterms": q43_tfidf_topterms,
    "q44_dedup_clusters": q44_dedup_clusters,
    "q45_incremental_dedup_clusters": q45_incremental_dedup_clusters,
}

ORACLE_SQL: dict[str, str] = {
    "q01_pricing_summary": Q01_SQL,
    "q02_topk_per_group": Q02_SQL,
    "q03_region_revenue": Q03_SQL,
    "q04_semi_join": Q04_SQL,
    "q05_anti_join": Q05_SQL,
    "q06_last_event_per_user": Q06_SQL,
    "q07_dedupe_exact": Q07_SQL,
    "q08_canonicalize": Q08_SQL,
    "q09_active_flag": Q09_SQL,
    "q10_best_order_per_cust": Q10_SQL,
    "q11_row_hash": Q11_SQL,
    "q12_jaccard_pairs": Q12_SQL,
    "q13_minhash_signature": Q13_SQL,
    "q14_lsh_dedup_pairs": Q14_SQL,
    "q15_simhash": Q15_SQL,
    "q16_fingerprint": Q16_SQL,
    "q17_token_stats": Q17_SQL,
    "q18_quality_score": Q18_SQL,
    "q19_lang_guess": Q19_SQL,
    "q20_ann_topk": Q20_SQL,
    "q21_knn_ir_metrics": Q21_SQL,
    "q22_ann_ivf": Q22_SQL,
    "q23_graph_closure": Q23_SQL,
    "q24_connected_components": Q24_SQL,
    "q25_transcripts_canonical": Q25_SQL,
    "q26_er_clusters": Q26_SQL,
    "q27_sessionize": Q27_SQL,
    "q28_scalar_enrich": Q28_SQL,
    "q29_merge_fill_dedupe": Q29_SQL,
    "q30_uuid_history": Q30_SQL,
    "q31_compact_last_wins": Q31_SQL,
    "q32_multimodal_meta": Q32_SQL,
    "q33_session_window": Q33_SQL,
    "q34_embedding_neardup": Q34_SQL,
    "q35_entity_extraction": Q35_SQL,
    "q36_json_extract": Q36_SQL,
    "q37_relation_routing": Q37_SQL,
    "q38_entity_linking": Q38_SQL,
    "q39_graph_kernel": Q39_SQL,
    "q40_sentence_split": Q40_SQL,
    "q41_ir_multi_k": Q41_SQL,
    "q42_simhash_neardup": Q42_SQL,
    "q43_tfidf_topterms": Q43_SQL,
    "q44_dedup_clusters": Q44_SQL,
    "q45_incremental_dedup_clusters": Q45_SQL,
}
