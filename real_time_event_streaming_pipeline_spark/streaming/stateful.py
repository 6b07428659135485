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


class _UserCounterProcessor:
    """transformWithStateInPandas processor (Spark 4 stateful API):
    per-user running count + exact-cent value total in a ValueState.
    Money accumulates in integer cents (same discipline as the batch
    _exact_sum) so the streamed total is bitwise-comparable to the
    batch aggregate regardless of batch boundaries."""

    def init(self, handle) -> None:
        self._st = handle.getValueState("profile", "n LONG, total_e2 LONG")

    def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
        import numpy as np

        n, total_e2 = self._st.get() if self._st.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            total_e2 += int(np.floor(pdf["value"] * 100 + 0.5).astype("int64").sum())
        self._st.update((n, total_e2))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "total_value": [total_e2 / 100.0],
            }
        )

    def close(self) -> None:
        pass


def _tws_base():
    """StatefulProcessor import, deferred: keeps module import safe on
    Spark versions without transformWithState."""
    from pyspark.sql.streaming import StatefulProcessor

    return StatefulProcessor


def running_user_counts_tws(enriched: DataFrame) -> DataFrame:
    """Per-user running profile via transformWithStateInPandas — the
    Spark 4 replacement for applyInPandasWithState (typed state
    handles, timers, state TTL). Requires the RocksDB state store
    (session.py sets it). Same shuffle/state profile as
    running_user_profile above."""
    base = _tws_base()
    proc = type("UserCounter", (base,), dict(_UserCounterProcessor.__dict__))()
    return (
        enriched.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
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
