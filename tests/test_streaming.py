"""Streaming tests: batch/stream parity + sliding-window semantics."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_frames_match
from zarr_datafusion_spark.operators import streaming_queries


@pytest.mark.parametrize("name", sorted(streaming_queries.ORACLE))
def test_streaming_oracles(spark, duck, name):
    df = streaming_queries.QUERIES[name](spark, SF_DIR)
    rel = duck.sql(streaming_queries.ORACLE[name])
    assert_frames_match(df, rel)


def test_streaming_equals_batch(spark):
    """Stream-complete over a finite source == batch groupBy."""
    from pyspark.sql import functions as F

    from zarr_datafusion_spark.session import load_table

    stream = streaming_queries.QUERIES["streaming_window_counts"](spark, SF_DIR)
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    s = {tuple(r) for r in stream.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_sliding_windows_double_count(spark):
    """10-min windows sliding by 5: every event is in exactly 2 windows."""
    df = streaming_queries.QUERIES["streaming_sliding_windows"](spark, SF_DIR)
    rows = df.collect()
    total_events = sum(r.n_events for r in rows)
    import os

    import pyarrow.parquet as pq

    n = pq.read_metadata(os.path.join(SF_DIR, "events.parquet")).num_rows
    assert total_events == 2 * n
    for r in rows:
        assert (r.window_end - r.window_start).total_seconds() == 600


def test_session_window_vs_duckdb(spark, duck):
    from zarr_datafusion_spark.streaming.sessionize import (
        SESSION_WINDOW_ORACLE,
        session_window_agg,
    )

    assert_frames_match(
        session_window_agg(spark, SF_DIR), duck.sql(SESSION_WINDOW_ORACLE)
    )


def test_stateful_sessions_subset_of_batch(spark):
    from zarr_datafusion_spark.streaming.sessionize import (
        session_window_agg,
        sessionize_stateful,
    )

    closed = sessionize_stateful(spark, SF_DIR).toPandas()
    batch = session_window_agg(spark, SF_DIR).toPandas()
    n_users = batch["user_id"].nunique()
    # every user's final session is still open in state at end-of-input
    assert len(closed) == len(batch) - n_users
    merged = closed.merge(
        batch.drop(columns=["sum_value"]),
        on=["user_id", "session_start_us", "session_end_us", "n_events"],
        how="left",
        indicator=True,
    )
    assert (merged["_merge"] == "both").all()


def test_file_sink_checkpoint_resume(spark, tmp_path):
    """Parquet sink + checkpoint: a second run with the same checkpoint
    must be a no-op (exactly-once), not a duplicate append.  Append mode
    only emits windows the watermark has closed — the final (open)
    window is withheld, hence strictly fewer rows than the batch
    count of distinct (window, type) pairs."""
    from zarr_datafusion_spark.streaming.demo import stream_to_parquet

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    n1 = stream_to_parquet(spark, SF_DIR, out, ckpt)
    assert n1 > 0
    n2 = stream_to_parquet(spark, SF_DIR, out, ckpt)
    assert n2 == n1, "checkpoint resume reprocessed data"
