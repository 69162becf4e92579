"""S5 REST source: windowed distributed fetch + whole-row master merge.

Runs a real local HTTP server (stdlib http.server) so the executor-side
urllib path is exercised end-to-end — no network leaves the machine.
"""

from __future__ import annotations

import json
import threading
from datetime import date
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from tabiya_livelihoods_classifier_spark.sources.rest import (
    date_windows,
    merge_whole_row,
    read_rest_json,
)

API_KEY = "test-key-123"

# one record per (day, slot); day 2024-01-03 is "hot" (3 records) so a
# max_records=3 fetch of any window containing it trips the truncation flag
_RECORDS = {
    "2024-01-01": 1,
    "2024-01-02": 1,
    "2024-01-03": 3,
    "2024-01-05": 2,
}


def _records_between(lo: str, hi: str) -> list[dict]:
    out = []
    for day, n in sorted(_RECORDS.items()):
        if lo <= day <= hi:
            out.extend(
                {"posted": day, "ref": f"{day}#{i}", "title": f"job {day}/{i}"}
                for i in range(n)
            )
    return out


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (http.server API)
        if self.headers.get("X-API-KEY") != API_KEY:
            self.send_response(403)
            self.end_headers()
            return
        qs = parse_qs(urlparse(self.path).query)
        body = json.dumps(
            _records_between(qs["date_from"][0], qs["date_to"][0])
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def api_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield (
        f"http://127.0.0.1:{srv.server_port}/jobs"
        "?date_from={date_from}&date_to={date_to}"
    )
    srv.shutdown()


def test_date_windows_cover_range_inclusively():
    wins = date_windows("2024-01-01", "2024-01-07", step_days=3)
    assert wins == [
        {"date_from": "2024-01-01", "date_to": "2024-01-03"},
        {"date_from": "2024-01-04", "date_to": "2024-01-06"},
        {"date_from": "2024-01-07", "date_to": "2024-01-07"},
    ]
    # every calendar day appears in exactly one window
    seen = []
    for w in wins:
        lo, hi = date.fromisoformat(w["date_from"]), date.fromisoformat(w["date_to"])
        d = lo
        while d <= hi:
            seen.append(d)
            d = date.fromordinal(d.toordinal() + 1)
    assert len(seen) == len(set(seen)) == 7
    with pytest.raises(ValueError):
        date_windows("2024-01-02", "2024-01-01")
    with pytest.raises(ValueError):
        date_windows("2024-01-01", "2024-01-02", step_days=0)


def test_windowed_fetch_parses_records_with_provenance(spark, api_url):
    df = read_rest_json(
        spark,
        api_url,
        date_windows("2024-01-01", "2024-01-06", step_days=2),
        headers={"X-API-KEY": API_KEY},
        schema="posted string, ref string, title string",
    )
    rows = df.collect()
    # all 7 records across the range, none duplicated across windows
    assert sorted(r["ref"] for r in rows) == sorted(
        r["ref"] for r in _records_between("2024-01-01", "2024-01-06")
    )
    # provenance: each record's window brackets its posted date
    for r in rows:
        assert r["date_from"] <= r["posted"] <= r["date_to"]
    # raw audit string replays to the typed row
    r0 = next(r for r in rows if r["ref"] == "2024-01-01#0")
    assert json.loads(r0["raw"])["title"] == r0["title"]
    assert not any(r["truncated"] for r in rows)


def test_record_cap_flags_truncated_window(spark, api_url):
    # the 2024-01-03 window returns exactly 3 == max_records -> flagged;
    # other windows stay clean
    df = read_rest_json(
        spark,
        api_url,
        date_windows("2024-01-01", "2024-01-06", step_days=1),
        headers={"X-API-KEY": API_KEY},
        max_records=3,
    )
    by_win = {
        r["date_from"]: r["truncated"] for r in df.collect()
    }
    assert by_win["2024-01-03"] is True
    assert by_win["2024-01-01"] is False
    # re-fetch policy: nothing hides the flag — raw rows still delivered
    assert df.count() == 7


def test_missing_api_key_fails_loudly(spark, api_url):
    df = read_rest_json(
        spark,
        api_url,
        date_windows("2024-01-01", "2024-01-01"),
        headers={},  # no key -> server 403 -> task error, not silent empty
    )
    with pytest.raises(Exception, match="403"):
        df.collect()


def test_injected_fetcher_and_wrapped_object_payload(spark):
    # injected fake: API that wraps its records ({"items": [...]}). A
    # lambda cloudpickles BY VALUE into executor tasks; a test-module
    # function would pickle by reference and fail to import worker-side.
    records = {k: _records_between(k, k) for k in _RECORDS}
    df = read_rest_json(
        spark,
        "fake://api?{date_from}..{date_to}",
        date_windows("2024-01-01", "2024-01-06", step_days=3),
        fetcher=lambda url, headers, _r=records: json.dumps(
            {
                "items": [
                    rec
                    for day, recs in sorted(_r.items())
                    if url.split("?")[1].split("..")[0]
                    <= day
                    <= url.split("?")[1].split("..")[1]
                    for rec in recs
                ]
            }
        ).encode(),
        schema="posted string, ref string, title string",
    )
    assert df.count() == 7  # {"items": [...]} unwraps like a bare array


def test_merge_whole_row_is_set_union(spark):
    existing = spark.createDataFrame(
        [("a", 1), ("b", 2)], "ref string, v int"
    )
    incoming = spark.createDataFrame(
        [("b", 2), ("c", 3), ("c", 3)], "ref string, v int"
    )
    merged = merge_whole_row(incoming, existing)
    assert sorted((r["ref"], r["v"]) for r in merged.collect()) == [
        ("a", 1), ("b", 2), ("c", 3)
    ]
    # evolved feed: new column arrives -> old rows null-filled, no error
    wider = spark.createDataFrame(
        [("d", 4, "new")], "ref string, v int, extra string"
    )
    merged2 = merge_whole_row(wider, existing)
    assert merged2.count() == 3
    assert dict(merged2.dtypes)["extra"] == "string"
    # first-load path
    assert merge_whole_row(incoming, None).count() == 2


def test_merge_ignores_fetch_provenance(spark):
    """Re-fetching a truncated window at finer step_days yields the same
    record under different (date_from, date_to) bounds — the merge must
    collapse them to ONE row (reference 1_1_...py:90-103 set-unions record
    CONTENT), keeping the lexicographically smallest provenance tuple."""
    schema = (
        "date_from string, date_to string, truncated boolean, "
        "raw string, ref string"
    )
    coarse = spark.createDataFrame(
        [("2024-01-01", "2024-01-31", True, '{"ref":"a"}', "a")], schema
    )
    fine = spark.createDataFrame(
        [
            ("2024-01-01", "2024-01-07", False, '{"ref":"a"}', "a"),
            ("2024-01-08", "2024-01-14", False, '{"ref":"b"}', "b"),
        ],
        schema,
    )
    merged = merge_whole_row(fine, coarse)
    rows = {r["ref"]: r for r in merged.collect()}
    assert len(rows) == 2
    # deterministic survivor: smallest (date_from, date_to, truncated)
    assert rows["a"]["date_to"] == "2024-01-07"
    assert rows["a"]["truncated"] is False
    # idempotent under replay
    assert merge_whole_row(fine, merged).count() == 2
