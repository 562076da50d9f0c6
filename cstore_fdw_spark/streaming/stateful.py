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


# ------------------------------------------------- sequence-pattern match

PATTERN_WINDOW_US = 30 * 60 * 1_000_000  # signup→purchase within 30 min

MATCH_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("signup_us", T.LongType()),
    T.StructField("purchase_us", T.LongType()),
    T.StructField("micros_between", T.LongType()),
])

PATTERN_STATE_SCHEMA = T.StructType([
    T.StructField("signup_us", T.LongType()),
])


def _pattern_update(key, pdfs: "Iterable[pd.DataFrame]",
                    state: GroupState) -> "Iterable[pd.DataFrame]":
    """Per-user A-then-B matcher: remember the EARLIEST unmatched signup;
    emit a match for every purchase within the pattern window after it.
    State is one long per user (the canonical CEP building block — Spark's
    built-in windows can't express 'first A, then any B within T of it'
    because the anchor is data-dependent, not clock-aligned)."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    signup_us = state.get[0] if state.exists else None
    rows = []
    events = []
    for pdf in pdfs:
        for us, etype in zip(pdf["us"], pdf["event_type"]):
            events.append((int(us), etype))
    events.sort()  # event-time order within the batch
    for us, etype in events:
        if etype == "signup":
            if signup_us is None or us < signup_us:
                signup_us = us
        elif etype == "purchase" and signup_us is not None:
            if 0 < us - signup_us <= PATTERN_WINDOW_US:
                rows.append((user_id, signup_us, us, us - signup_us))
    if signup_us is not None:
        state.update((signup_us,))
    if rows:
        yield pd.DataFrame(rows, columns=[f.name for f in MATCH_SCHEMA])


def signup_purchase_pattern(events: DataFrame) -> DataFrame:
    """Streaming sequence-pattern detection (CEP): first signup per user,
    then every purchase within 30 minutes of it. The batch equivalent is
    a min-aggregate + interval join; here one long of state per user
    does it incrementally. Caveat for multi-batch replays: a purchase
    arriving in an earlier micro-batch than its signup (out-of-order
    across batches) is missed — the documented at-most-once CEP
    trade-off; a production variant buffers purchases for the watermark
    delay."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "event_type",
        F.unix_micros("ts").alias("us"))
    return (prepared.groupBy("user_id")
            .applyInPandasWithState(
                _pattern_update,
                outputStructType=MATCH_SCHEMA,
                stateStructType=PATTERN_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
