"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for semantics tumbling windows can't express
(pyspark_guide.md 'Stateful'). State lives in the RocksDB state store
(session.py), so per-key state scales to disk, not heap.

The reference has no custom stateful ops (SURVEY.md §2.4: "no
mapGroupsWithState"); these are engine extensions: a per-user running
profile (count / value total / last event type) maintained across
micro-batches, emitted in update mode.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_event_type string"
STATE_SCHEMA = "n long, total double, last string"


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = str(pdf["event_type"].iloc[-1])
    state.update((n, round(total, 4), last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "last_event_type": [last],
        }
    )


def running_user_profile(enriched: DataFrame) -> DataFrame:
    """Streaming: one updated row per user per micro-batch with the
    accumulated profile. Shuffles only by user_id; state per key is a
    3-field tuple — O(distinct users), not O(events)."""
    return (
        enriched.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
