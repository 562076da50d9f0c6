"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for stateful semantics Spark's built-in windows can't
express (SURVEY §2.B streaming row: 'applyInPandasWithState for custom
stateful operators').

Operator: per-user running spend monitor. State = (event_count,
total_value); every micro-batch updates the state and emits the user's
running totals plus a ``big_spender`` flag once total_value crosses a
threshold. State expires after 1 hour of event-time inactivity (timeout →
bounded state at 100 TB)."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

BIG_SPENDER_THRESHOLD = 10_000.0

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_count", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("big_spender", T.BooleanType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("event_count", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def _make_update_fn(with_timeout: bool):
    def update_user_state(key, pdfs: Iterable[pd.DataFrame],
                          state: GroupState) -> Iterable[pd.DataFrame]:
        """Fold each micro-batch's rows for one user into running state."""
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, total))
        if with_timeout:
            state.setTimeoutDuration(3600 * 1000)  # 1h inactivity → dropped
        yield pd.DataFrame({
            "user_id": [user_id],
            "event_count": [count],
            "total_value": [total],
            "big_spender": [total >= BIG_SPENDER_THRESHOLD],
        })
    return update_user_state


def running_spend(events: DataFrame, with_timeout: bool = False) -> DataFrame:
    """Streaming per-user running totals with custom state.

    ``with_timeout=True`` adds a 1-hour inactivity timeout so state stays
    bounded on an unbounded deployment. Leave it off for drain-and-stop
    (availableNow) runs: with a timeout configured the engine keeps
    scheduling timeout-processing micro-batches and an availableNow query
    never terminates.
    """
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if with_timeout
               else GroupStateTimeout.NoTimeout)
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_update_fn(with_timeout),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=timeout))
