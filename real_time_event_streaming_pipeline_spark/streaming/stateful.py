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
STATE_SCHEMA = "n long, total double, last string, last_ts long, last_eid string"


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last, last_ts, last_eid = state.get
    else:
        n, total, last, last_ts, last_eid = 0, 0.0, None, None, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())  # pandas sum skips NaN like F.sum
        if len(pdf):
            # "last" is EVENT-TIME last, totally ordered by
            # (ts, event_id). The winner is tracked in state across
            # BOTH pandas chunks (one group spans several chunks when
            # it crosses Arrow batch boundaries — a per-chunk
            # sort alone would report the last chunk's max) and
            # micro-batches (late data must not overwrite a newer
            # profile entry).
            top = pdf.sort_values(["ts", "event_id"]).iloc[-1]
            cand = (int(pd.Timestamp(top["ts"]).value // 1000), str(top["event_id"]))
            if last_ts is None or cand >= (last_ts, last_eid or ""):
                last_ts, last_eid = cand
                last = str(top["event_type"])
    state.update((n, round(total, 4), last, last_ts, last_eid))
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
            # dropna BEFORE the int cast: floor(NaN).astype(int64) is
            # undefined garbage (INT64_MIN), not an error — the batch
            # twin (_exact_sum) skips nulls via F.floor->NULL->F.sum,
            # so the streamed total must skip them too
            vals = pdf["value"].dropna()
            total_e2 += int(np.floor(vals * 100 + 0.5).astype("int64").sum())
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
