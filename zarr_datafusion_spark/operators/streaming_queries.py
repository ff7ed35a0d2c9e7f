"""Streaming queries for the driver contract.

``streaming_window_counts`` has a genuine DuckDB oracle: a finite
file-source stream aggregated in complete mode must equal the batch
GROUP BY over the same data (``time_bucket`` in DuckDB == epoch-aligned
``window()`` in Spark).  ``streaming_sliding_windows`` is rows-only
(DuckDB has no overlapping-window relational form as a single
expression; semantics tested in tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_WINDOW_COUNTS_ORACLE = """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
"""


def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zarr_datafusion_spark.streaming import streaming_event_counts

    return streaming_event_counts(spark, sf_dir)


def streaming_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zarr_datafusion_spark.streaming import sliding_window_rates

    return sliding_window_rates(spark, sf_dir)


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (built-in ``session_window``; identical
    code shape for batch and watermarked streams).  DuckDB oracle:
    lag/cumsum sessionization."""
    from zarr_datafusion_spark.streaming.sessionize import session_window_agg

    return session_window_agg(spark, sf_dir)


def sessionize_stateful_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): sessions
    closed while draining the stream (rows-only check; subset property
    vs the batch form is tested in tests/test_streaming.py)."""
    from zarr_datafusion_spark.streaming.sessionize import sessionize_stateful

    return sessionize_stateful(spark, sf_dir)


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dropDuplicates == batch DISTINCT on a
    finite source."""
    from zarr_datafusion_spark.streaming.demo import streaming_dedup_ids

    return streaming_dedup_ids(spark, sf_dir)


QUERIES["streaming_dedup"] = streaming_dedup
ORACLE["streaming_dedup"] = (
    "SELECT DISTINCT event_id, event_type FROM events"
)

from zarr_datafusion_spark.streaming.sessionize import (  # noqa: E402
    SESSION_WINDOW_ORACLE,
)

QUERIES["streaming_window_counts"] = streaming_window_counts
ORACLE["streaming_window_counts"] = _WINDOW_COUNTS_ORACLE
QUERIES["streaming_sliding_windows"] = streaming_sliding_windows
QUERIES["sessionize_events"] = sessionize_events
QUERIES["sessionize_stateful_stream"] = sessionize_stateful_stream
ORACLE["sessionize_events"] = SESSION_WINDOW_ORACLE
