"""S5: REST API source (SURVEY §2.1 S5).

The reference pulls a jobs feed with ONE driver-side GET over the whole
date range, capped at ``num_records=10000``, then merges the payload into
a master database by whole-row string dedupe
(scripts/1_import_jobs/1_1_harambee_jobs_API_and_formatting.py:36-68 fetch,
:74-103 merge — its own TODO flags the truncation/duplication hazards).

Spark-first re-expression:

* the date range is split into bounded windows (``date_windows``), the
  windows become a small DataFrame, and each window is fetched INSIDE
  ``mapInPandas`` — on a real cluster 1,000 executors pull 1,000 windows
  concurrently instead of one driver socket pulling everything;
* a window that comes back with exactly ``max_records`` rows is flagged
  ``truncated`` instead of silently dropping the tail (the reference's
  10k cap bug); callers re-fetch flagged windows at a finer ``step_days``;
* the fetched rows land as raw JSON strings + provenance (window bounds),
  parsed to columns with ``from_json`` when a schema is supplied — the
  raw string column is the replayable audit record;
* the reference's merge-with-master (json.dumps(sort_keys=True) set
  union) becomes ``merge_whole_row``: unionByName + dropDuplicates over
  every column — distributed, no driver materialization.

Network access is injected (``fetcher``): production binds urllib, tests
bind a local HTTP server or an in-process fake. The fetcher must be
picklable (top-level function / functools.partial) because it ships to
executors.
"""

from __future__ import annotations

import datetime as dt
import json
from functools import partial
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

Fetcher = Callable[[str, dict], bytes]

#: Overflow guard default, mirroring the reference's num_records=10000.
DEFAULT_MAX_RECORDS = 10_000


def urllib_fetcher(url: str, headers: dict, timeout: float = 30.0) -> bytes:
    """Default fetcher: stdlib GET with headers (API key etc.).

    Top-level so it pickles into executor tasks.
    """
    import urllib.request

    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return resp.read()


def date_windows(
    date_from: str, date_to: str, step_days: int = 7
) -> list[dict]:
    """Split [date_from, date_to] into inclusive, non-overlapping windows.

    Returns [{"date_from": ..., "date_to": ...}, ...] — the partition-able
    unit of fetch work. The reference uses a single 2022->today window.
    """
    if step_days < 1:
        raise ValueError("step_days must be >= 1")
    lo = dt.date.fromisoformat(date_from)
    hi = dt.date.fromisoformat(date_to)
    if hi < lo:
        raise ValueError(f"date_to {date_to} before date_from {date_from}")
    out = []
    cur = lo
    while cur <= hi:
        end = min(cur + dt.timedelta(days=step_days - 1), hi)
        out.append({"date_from": cur.isoformat(), "date_to": end.isoformat()})
        cur = end + dt.timedelta(days=1)
    return out


def _fetch_window_batches(
    pdf_iter,
    *,
    url_template: str,
    headers: dict,
    fetcher: Fetcher,
    max_records: int,
):
    """mapInPandas body: one GET per window row, one output row per record.

    Yields (date_from, date_to, truncated, raw) — raw is the record's JSON
    text, provenance columns carry the window that produced it. An empty
    window yields nothing (no placeholder rows to filter later).
    """
    import pandas as pd

    for pdf in pdf_iter:
        frames = []
        for win_from, win_to in zip(pdf["date_from"], pdf["date_to"]):
            url = url_template.format(date_from=win_from, date_to=win_to)
            payload = json.loads(fetcher(url, headers).decode("utf-8"))
            if isinstance(payload, dict):  # wrapped {"items": [...]} shape
                payload = payload.get("items", [payload])
            if not payload:
                continue
            truncated = len(payload) >= max_records
            frames.append(
                pd.DataFrame(
                    {
                        "date_from": win_from,
                        "date_to": win_to,
                        "truncated": truncated,
                        "raw": [
                            json.dumps(rec, sort_keys=True) for rec in payload
                        ],
                    }
                )
            )
        if frames:
            yield pd.concat(frames, ignore_index=True)


def read_rest_json(
    spark: SparkSession,
    url_template: str,
    windows: Iterable[dict],
    *,
    headers: dict | None = None,
    schema: str | None = None,
    fetcher: Fetcher | None = None,
    max_records: int = DEFAULT_MAX_RECORDS,
) -> DataFrame:
    """S5: distributed REST scan — one task per date window.

    url_template contains ``{date_from}``/``{date_to}`` placeholders
    (reference URL 1_1_...py:42). With ``schema`` the raw JSON parses to
    typed columns (plus provenance + truncated flag + raw audit string);
    without it the caller gets the raw strings.

    Rows from a window flagged ``truncated`` hit the server-side record
    cap: the caller must re-fetch that window at a finer step (the engine
    refuses to guess at the missing tail).
    """
    win_list = list(windows)
    if not win_list:
        raise ValueError("no fetch windows")
    wdf = spark.createDataFrame(
        [(w["date_from"], w["date_to"]) for w in win_list],
        "date_from string, date_to string",
    )
    # one window per task: fetches are IO-bound, parallelism == windows
    wdf = wdf.repartition(len(win_list))
    body = partial(
        _fetch_window_batches,
        url_template=url_template,
        headers=headers or {},
        fetcher=fetcher or urllib_fetcher,
        max_records=max_records,
    )
    raw = wdf.mapInPandas(
        body, "date_from string, date_to string, truncated boolean, raw string"
    )
    if schema is None:
        return raw
    return raw.withColumn("rec", F.from_json("raw", schema)).select(
        "date_from", "date_to", "truncated", "raw", "rec.*"
    )


#: Columns read_rest_json attaches that describe the FETCH, not the record.
#: They must not participate in the merge identity: re-fetching a truncated
#: window at finer step_days yields the same record under different window
#: bounds, and whole-row dedupe would keep both copies where the
#: reference's content-based set union drops them.
PROVENANCE_COLS = ("date_from", "date_to", "truncated")


def merge_whole_row(incoming: DataFrame, existing: DataFrame | None) -> DataFrame:
    """Reference merge-with-master (1_1_...py:90-103): set-union of whole
    rows. json.dumps(sort_keys=True) over every record == distinct over
    every CONTENT column (the canonical ``raw`` string when present);
    unionByName keeps the comparison field-aligned even when the feeds
    evolve column order.

    One provenance row survives per distinct record — deterministically the
    lexicographically smallest (date_from, date_to, truncated) tuple — so
    repeated window refinements converge to a stable table.
    """
    merged = (
        incoming
        if existing is None
        else existing.unionByName(incoming, allowMissingColumns=True)
    )
    prov = [c for c in PROVENANCE_COLS if c in merged.columns]
    content = [c for c in merged.columns if c not in prov]
    if not prov or not content:
        return merged.dropDuplicates()
    w = Window.partitionBy(*content).orderBy(
        *[F.col(c).asc_nulls_last() for c in prov]
    )
    return (
        merged.dropDuplicates()
        .withColumn("_mrn", F.row_number().over(w))
        .filter(F.col("_mrn") == 1)
        .drop("_mrn")
    )
