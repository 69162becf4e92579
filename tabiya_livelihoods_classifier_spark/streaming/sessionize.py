"""Event-time sessionization + custom stateful streaming operator.

Two realizations of "group a user's events into gap-bounded sessions":

* `session_stats` — Spark's built-in ``session_window`` (works identically
  on batch and streaming DataFrames; on streams pair it with a watermark so
  state for closed sessions is evicted).
* `running_turn_totals` — ``applyInPandasWithState``: a custom stateful
  operator keeping one (n_turns, max_turn_idx) state row per conversation
  across micro-batches. This is the pattern the engine uses for any
  stateful op Spark lacks; state survives restarts via the checkpoint.

The staleness/decay windows of the reference (120-day active window,
3_2b_clean_LLM_create_opp-db.py:447-456; half-life decay,
matching_config.json:21-28) are event-time filters over the same `ts`
column and need no extra machinery.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP = "30 minutes"


def session_stats(
    events: DataFrame,
    gap: str = SESSION_GAP,
    watermark: str | None = None,
) -> DataFrame:
    """Per (user, session) stats via the built-in session window.

    Session semantics: a session's window is extended by `gap` past each
    event; an event landing AT the current end still merges (boundary
    inclusive — only a gap strictly greater than `gap` splits).
    """
    src = events
    if watermark is not None and events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event_id"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "first_event_id",
        )
    )


# --------------------------------------------------------------------------
# applyInPandasWithState: per-conversation running totals
# --------------------------------------------------------------------------

TURN_TOTALS_SCHEMA = "conv_id string, n_turns long, max_turn_idx int"
_STATE_SCHEMA = "n long, mx int"


def _update_turn_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, mx = state.get if state.exists else (0, -1)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, int(pdf["turn_idx"].max()))
    state.update((n, mx))
    yield pd.DataFrame(
        {"conv_id": [key[0]], "n_turns": [n], "max_turn_idx": [mx]}
    )


def running_turn_totals(turn_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative turn count + max turn_idx per
    conversation, updated every micro-batch, state kept in the checkpoint.

    Arrow-batched per group (no per-row Python): each group's micro-batch
    slice arrives as pandas DataFrame chunks.
    """
    return turn_stream.groupBy("conv_id").applyInPandasWithState(
        _update_turn_totals,
        outputStructType=TURN_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
