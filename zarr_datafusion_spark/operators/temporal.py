"""Temporal joins — as-of and range joins over the ``events`` table.

Custom operators the reference engine lacks (SURVEY §2 notes DataFusion
exposes no as-of join either); both are staples of feature engineering
over event streams, and both are built the way they scale, per the
operator-composition ladder (built-in DataFrame ops first):

* **As-of join** (:func:`asof_view_before_purchase`): each purchase
  matched to the same user's most recent prior view.  Implemented as
  union + ordered window carry-forward — ONE shuffle (the window
  partition by user), no join operator at all, no build-side
  materialization.  At 100 TB this beats any join-based formulation:
  state per task is one carried row.  DuckDB's native ``ASOF JOIN`` is
  the oracle.
* **Range join** (:func:`range_join_clicks_before_error`): count
  same-user clicks in the 5 minutes before each error.  Naive range
  predicates force nested-loop joins; the scalable form bins time and
  explodes the probe side into (bin, bin-1) so it becomes an equi-join
  on (user, bin) + residual filter — shuffle-partitionable, skew
  handled by AQE.  Plain inequality-join SQL is the oracle.

Timestamps are compared at microsecond precision on BOTH engines
(``session.normalize_event_ts`` yields us-precision TIMESTAMP from any
parquet encoding; DuckDB oracles use ``epoch_us``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zarr_datafusion_spark.session import load_table

    return load_table(spark, sf_dir, "events")


ASOF_ORACLE = """
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts_us AS purchase_ts_us,
           v.event_id AS view_id,
           p.ts_us - v.ts_us AS gap_us
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts_us >= v.ts_us
"""


@_q("asof_join", ASOF_ORACLE)
def asof_view_before_purchase(spark, sf_dir):
    """As-of join via union + window carry-forward (see module doc).

    The two sides are tagged, unioned, and sorted within each user by
    (ts, side) — views sort before a same-instant purchase — then every
    purchase row reads the latest preceding view via
    ``last(ignorenulls)`` over an unbounded-preceding frame."""
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts_us",
        F.lit(0).alias("side"),
        F.col("event_id").alias("view_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("view_id"),
        F.col("event_id").alias("purchase_id"),
    )
    # view_id as the final sort key: if ns→us truncation ever collapses
    # two views of one user onto the same microsecond, the carried view
    # is still deterministic (the highest id among the ties).
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "side", "view_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = v.unionByName(p).withColumn(
        "matched_view", F.last("view_id", ignorenulls=True).over(w)
    ).withColumn(
        "matched_view_ts", F.last(
            F.when(F.col("side") == 0, F.col("ts_us")), ignorenulls=True
        ).over(w)
    )
    return (
        merged.filter(F.col("side") == 1)
        .select(
            F.col("purchase_id"),
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            F.col("matched_view").alias("view_id"),
            (F.col("ts_us") - F.col("matched_view_ts")).alias("gap_us"),
        )
    )


RANGE_WINDOW_US = 5 * 60 * 1_000_000

RANGE_JOIN_ORACLE = f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'error'
    ),
    c AS (
      SELECT user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click'
    )
    SELECT e.event_id AS error_id, e.user_id,
           COUNT(c.ts_us) AS n_clicks_before
    FROM e LEFT JOIN c
      ON e.user_id = c.user_id
     AND c.ts_us >= e.ts_us - {RANGE_WINDOW_US}
     AND c.ts_us < e.ts_us
    GROUP BY e.event_id, e.user_id
"""


@_q("range_join", RANGE_JOIN_ORACLE)
def range_join_clicks_before_error(spark, sf_dir):
    """Binned range join (see module doc): clicks explode into their
    own bin and the next one, so every (error, candidate-click) pair
    co-locates under an equi-join on (user_id, bin); the exact range
    predicate filters residually.  Left join semantics (errors with no
    prior click count 0) are restored by re-aggregating over the error
    side."""
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        "ts_us",
        (F.col("ts_us") / RANGE_WINDOW_US).cast("long").alias("bin"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts_us").alias("c_ts_us"),
            (F.col("ts_us") / RANGE_WINDOW_US).cast("long").alias("c_bin"),
        )
        .withColumn("bin", F.explode(F.array(F.col("c_bin"), F.col("c_bin") + 1)))
    )
    # Conditional count (not filter-then-count): an error whose joined
    # candidates all fail the residual must still appear with 0.  Each
    # (error, click) pair co-locates exactly once — the click's two
    # exploded bins are distinct and the error has one bin.
    joined = err.join(clicks, ["user_id", "bin"], "left")
    in_range = (F.col("c_ts_us") >= F.col("ts_us") - RANGE_WINDOW_US) & (
        F.col("c_ts_us") < F.col("ts_us")
    )
    return joined.groupBy("error_id", "user_id").agg(
        F.count(F.when(in_range, 1)).alias("n_clicks_before")
    )


# ---------------------------------------------------------------------------
# Funnel conversion-timing percentiles
# ---------------------------------------------------------------------------

_FUNNEL_TIMING_ORACLE = """
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'view'
    ),
    d AS (
      SELECT p.ts_us - v.ts_us AS gap_us
      FROM p ASOF JOIN v
        ON p.user_id = v.user_id AND p.ts_us >= v.ts_us
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
           quantile_cont(gap_us, 0.50) AS p50_us,
           quantile_cont(gap_us, 0.90) AS p90_us,
           quantile_cont(gap_us, 0.99) AS p99_us,
           CAST(MIN(gap_us) AS BIGINT) AS min_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_us
    FROM d
"""


@_q("event_funnel_timing", _FUNNEL_TIMING_ORACLE)
def event_funnel_timing(spark, sf_dir):
    """Conversion-latency distribution: for every purchase with a
    prior same-user view, the view->purchase delay's exact interpolated
    percentiles — the timing half of funnel analysis
    (:mod:`extras`.event_funnel counts stage reach; this measures how
    LONG conversion takes).  Reuses the as-of join's union+window
    carry-forward (one shuffle on user), then one global aggregate of
    the matched gaps; ``percentile`` == DuckDB's ``quantile_cont``
    (the text_length_percentiles convention), and the ASOF inner join
    on the oracle side matches the carried-view filter here."""
    matched = asof_view_before_purchase(spark, sf_dir).filter(
        F.col("gap_us").isNotNull()
    )
    return matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.expr("percentile(gap_us, 0.50)").alias("p50_us"),
        F.expr("percentile(gap_us, 0.90)").alias("p90_us"),
        F.expr("percentile(gap_us, 0.99)").alias("p99_us"),
        F.min("gap_us").cast("bigint").alias("min_us"),
        F.max("gap_us").cast("bigint").alias("max_us"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average (hypertable rollup primitive)
# ---------------------------------------------------------------------------

_TW_AVG_ORACLE = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS v100, event_id
      FROM events WHERE user_id < 30 AND value IS NOT NULL
    ),
    iv AS (
      SELECT user_id, v100,
             lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
               - ts_us AS dur_us
      FROM e
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
           CAST(SUM(v100 * dur_us) AS DOUBLE)
             / (100.0 * CAST(SUM(dur_us) AS DOUBLE)) AS tw_avg
    FROM iv WHERE dur_us IS NOT NULL
    GROUP BY user_id
"""


@_q("event_time_weighted_avg", _TW_AVG_ORACLE)
def event_time_weighted_avg(spark, sf_dir):
    """Time-weighted average of each user's metric over their event
    timeline — the hypertable rollup primitive (TimescaleDB's
    ``time_weight``; a plain AVG over irregular samples over-weights
    bursts): each observation holds until the next one, so the mean is
    sum(value x holding duration) / total duration.

    Exactness without decimals: the driver's metric carries exactly
    two decimal places (asserted at 0 violations across the corpus),
    so ``round(value*100)`` is an exact BIGINT and the weighted sum is
    ALL-INTEGER — order-independent, overflow-safe (~1e16 < 2^63),
    bit-identical cross-engine after the single final division.
    Shape: one window (lead) and one aggregate, both keyed by the
    entity — the scan shuffles once and stays put.
    """
    e = (
        _events(spark, sf_dir)
        .filter((F.col("user_id") < 30) & F.col("value").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.round(F.col("value") * 100).cast("bigint").alias("v100"),
            "event_id",
        )
    )
    wo = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    iv = e.withColumn("dur_us", F.lead("ts_us").over(wo) - F.col("ts_us"))
    return (
        iv.filter(F.col("dur_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("dur_us").cast("bigint").alias("total_dur_us"),
            (
                F.sum(F.col("v100") * F.col("dur_us")).cast("double")
                / (F.lit(100.0) * F.sum("dur_us").cast("double"))
            ).alias("tw_avg"),
        )
    )
