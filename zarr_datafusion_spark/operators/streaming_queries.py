"""Streaming queries for the driver contract.

``streaming_window_counts`` has a genuine DuckDB oracle: a finite
file-source stream aggregated in complete mode must equal the batch
GROUP BY over the same data (``time_bucket`` in DuckDB == epoch-aligned
``window()`` in Spark).

``streaming_sliding_windows`` (oracle added r4): a 10-minute window
sliding by 5 minutes assigns each event to exactly two epoch-aligned
window starts — ``time_bucket(5min, ts) - k*5min`` for k in {0,1} —
so the overlapping-window aggregate is a plain GROUP BY after a 2-way
offset expansion.

``sessionize_stateful_stream`` (oracle added r4): the stateful
operator emits sessions *closed* while draining the finite source;
with the fixture arriving as one in-order micro-batch that is exactly
the batch sessionization minus each user's final (still-open) session
— expressible as the gaps-and-islands SQL with a
``QUALIFY sid < MAX(sid) OVER (PARTITION BY user_id)`` cut.
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
    """Tumbling 5-minute windowed counts/sums over the event stream
    (watermarked complete-mode aggregate; see
    :func:`zarr_datafusion_spark.streaming.streaming_event_counts` for
    the full design notes).  Oracle: the equivalent batch GROUP BY."""
    from zarr_datafusion_spark.streaming import streaming_event_counts

    return streaming_event_counts(spark, sf_dir)


def streaming_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5 over the event stream — each
    event lands in exactly two epoch-aligned windows (see
    :func:`zarr_datafusion_spark.streaming.sliding_window_rates`).
    Oracle: 2-way offset expansion + GROUP BY."""
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

ORACLE["streaming_sliding_windows"] = """
    WITH w AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts)
               - k * INTERVAL '5 minutes' AS window_start
      FROM events, (VALUES (0),(1)) offs(k)
    )
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           COUNT(*) AS n_events
    FROM w GROUP BY 1
"""

from zarr_datafusion_spark.streaming.sessionize import (  # noqa: E402
    _GAP_US as _G,
)

ORACLE["sessionize_stateful_stream"] = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {_G}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts_us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    ),
    sess AS (
      SELECT user_id, sid,
             MIN(ts_us) AS session_start_us,
             MAX(ts_us) + {_G} AS session_end_us,
             COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id, session_start_us, session_end_us, n_events
    FROM sess
    QUALIFY sid < MAX(sid) OVER (PARTITION BY user_id)
"""


def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality filter on the documents file stream (r14):
    map-side rule flags + a bounded-key complete-mode keep-rate
    aggregate — see
    :func:`zarr_datafusion_spark.streaming.demo.streaming_gopher_gate`.
    Oracle: the same GROUP BY over the batch gopher frame."""
    from zarr_datafusion_spark.streaming.demo import streaming_gopher_gate

    return streaming_gopher_gate(spark, sf_dir)


QUERIES["streaming_quality_gate"] = streaming_quality_gate
from zarr_datafusion_spark.operators.textstats import (  # noqa: E402
    _GOPHER_ORACLE,
)

ORACLE["streaming_quality_gate"] = f"""
    SELECT d.lang, d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(g.keep) AS BIGINT) AS n_keep,
           CAST(SUM(g.n_rules_passed) AS BIGINT) AS sum_rules_passed
    FROM ({_GOPHER_ORACLE}) g JOIN documents d USING (doc_id)
    GROUP BY d.lang, d.source
"""
