"""Sessionization — native session windows + a custom stateful operator.

Beyond-reference scope (the reference is batch-only, ``zarr_exec.rs:102``);
this is the canonical "user journey" operator of a training-data /
clickstream pipeline, implemented both ways SURVEY §2 prescribes:

1. :func:`session_window_agg` — Spark's built-in ``session_window``
   (declarative, JVM-side, works identically on batch DataFrames and
   watermarked streams; state merging is handled by the engine).  The
   built-in is the 100 TB path: state is partitioned by user across the
   cluster and bounded by the watermark.
2. :func:`sessionize_stateful` — ``applyInPandasWithState`` over a
   stream: an explicitly-managed per-user open-session state that
   survives across micro-batches, for session semantics the built-in
   can't express (e.g. value-dependent gaps, session caps).  This is
   the template for any custom stateful operator.

Session definition (both): events of one user belong to one session
while each inter-event gap is `< gap`; a session's end is its last
event + gap (matching ``session_window`` semantics, end-exclusive).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GAP_MINUTES = 30
_GAP_US = GAP_MINUTES * 60 * 1_000_000


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows over ``events`` via the built-in
    ``session_window`` (batch form; the streaming form only adds
    ``withWatermark``).  Output timestamps as unix microseconds so the
    ns-precision DuckDB oracle compares exactly."""
    from zarr_datafusion_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{GAP_MINUTES} minutes").alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


SESSION_WINDOW_ORACLE = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us, value,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts_us, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + {_GAP_US} AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# Custom stateful operator: applyInPandasWithState
# ---------------------------------------------------------------------------

_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

#: open-session carry-over between micro-batches:
#: (start_us, last_us, n_events)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into sessions,
    continuing the open session from state; emit closed sessions, keep
    the still-open one in state for the next micro-batch."""
    (user_id,) = key
    ts_list: list[int] = []
    for pdf in pdfs:
        ts_list.extend(int(v) for v in pdf["ts_us"])
    ts_list.sort()

    open_session = state.get if state.exists else None
    closed: list[tuple[int, int, int]] = []
    for t in ts_list:
        if open_session is None:
            open_session = (t, t, 1)
        else:
            start, last, n = open_session
            if t - last < _GAP_US:
                # merge; clamp both ends so a cross-batch late event
                # (t < last, possibly t < start) can never move the
                # session end backwards or leave t outside [start, last]
                open_session = (min(start, t), max(last, t), n + 1)
            else:
                closed.append((start, last, n))
                open_session = (t, t, 1)
    if open_session is not None:
        state.update(open_session)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start_us": [c[0] for c in closed],
                "session_end_us": [c[1] + _GAP_US for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )


def sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization with explicit state
    (``applyInPandasWithState``): open sessions persist in the state
    store across micro-batches.  Returns the sessions *closed* while
    draining the finite file source — each user's final session is
    still open in state at end-of-input (a real deployment keeps
    running and would flush it via a state timeout; with a finite
    fixture a ProcessingTimeTimeout keeps scheduling wake-up batches
    and the query never drains, so tests assert closed ⊂ batch
    sessions instead)."""
    from zarr_datafusion_spark.streaming.demo import _event_stream, _run_to_memory

    stream = _event_stream(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    return _run_to_memory(sessions, "append")
