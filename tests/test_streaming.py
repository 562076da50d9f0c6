"""Structured Streaming tests: each streaming operator must produce the
same result as its batch twin when run to completion (availableNow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cstore_fdw_spark.operators import load_all, table
from cstore_fdw_spark.streaming import events as se

REGISTRY = load_all()


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    out = se.run_available_now(spark, sf_dir, se.tumbling_counts,
                               "t_tumbling", "complete")
    batch = (REGISTRY["events_tumbling_hourly"].builder(spark, sf_dir)
             .select("hour_start", "event_type", "n"))
    srows = {tuple(r) for r in out.collect()}
    brows = {tuple(r) for r in batch.collect()}
    assert srows == brows


def test_streaming_dedup(spark, sf_dir):
    out = se.run_available_now(spark, sf_dir, se.dedup_events,
                               "t_dedup", "append")
    n_distinct = (table(spark, sf_dir, "events")
                  .select("event_id").distinct().count())
    assert out.count() == n_distinct


def test_streaming_sessionize_matches_batch(spark, sf_dir):
    out = se.run_available_now(spark, sf_dir, se.sessionize,
                               "t_sessions", "complete")
    batch = (REGISTRY["events_sessionize"].builder(spark, sf_dir)
             .select("user_id", "session_start", "n_events"))
    srows = {tuple(r) for r in out.collect()}
    brows = {tuple(r) for r in batch.collect()}
    assert srows == brows


def test_streaming_is_actually_streaming(spark, sf_dir):
    stream = se.read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    assert se.tumbling_counts(stream).isStreaming
