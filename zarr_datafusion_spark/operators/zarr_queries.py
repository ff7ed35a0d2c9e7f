"""Zarr-source queries for the driver contract (SURVEY §2 Tier A rows).

DuckDB cannot read Zarr, so these entries have no ``oracle_sql`` twin —
the driver records rows-only checks (per ``__spark_entry__`` docstring);
the full differential coverage lives in ``tests/test_zarr_source.py``
against independently computed expectations.

The fixture store is generated deterministically (seed 42, the
reference's synthetic-weather recipe ``scripts/data_gen.py:52-133``)
under the repo's ``data/`` directory on first use.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}  # intentionally empty — non-SQL-expressible source

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fixture_store(zarr_format: int = 2) -> str:
    """Deterministic local weather store (written once, reused)."""
    from zarr_datafusion_spark.zarr.writer import synthetic_weather_arrays, write_store

    path = os.path.join(_REPO_ROOT, "data", f"weather_v{zarr_format}.zarr")
    marker = os.path.join(
        path, "zarr.json" if zarr_format == 3 else ".zgroup"
    )
    if not os.path.exists(marker):
        write_store(path, synthetic_weather_arrays(), zarr_format=zarr_format)
    return path


def _q(name):
    def deco(fn):
        QUERIES[name] = fn
        return fn

    return deco


@_q("zarr_scan_flatten")
def zarr_scan_flatten(spark, sf_dir):
    """A1: full nD->2D flattened scan, row-major coordinate expansion
    (700 rows; reference README.md:23-34)."""
    from zarr_datafusion_spark.zarr import read_zarr

    return read_zarr(spark, fixture_store(2)).orderBy("time", "lat", "lon")


@_q("zarr_filter_pushdown")
def zarr_filter_pushdown(spark, sf_dir):
    """A5: coordinate-equality pushdown shrinks the scan to one lat/time
    slab (10 rows); Spark re-applies the filter (Inexact contract)."""
    from zarr_datafusion_spark.zarr import read_zarr

    df = read_zarr(spark, fixture_store(3))
    return df.filter((F.col("time") == 3) & (F.col("lat") == 5)).orderBy("lon")


@_q("zarr_agg")
def zarr_agg(spark, sf_dir):
    """Aggregation over the flattened store (per-lat climate summary)."""
    from zarr_datafusion_spark.zarr import read_zarr

    df = read_zarr(spark, fixture_store(2))
    return (
        df.groupBy("lat")
        .agg(
            F.count("*").alias("n"),
            F.avg("temperature").alias("avg_temp"),
            F.min("humidity").alias("min_hum"),
            F.max("humidity").alias("max_hum"),
        )
        .orderBy("lat")
    )


@_q("zarr_limit_pushdown")
def zarr_limit_pushdown(spark, sf_dir):
    """A4: limit pushdown — the source plans only the first-N row-major
    rows (coord.rs:112-158 semantics)."""
    from zarr_datafusion_spark.zarr import read_zarr

    return read_zarr(spark, fixture_store(2), limit=120)


@_q("zarr_stats_shortcut")
def zarr_stats_shortcut(spark, sf_dir):
    """A7/A8: COUNT/MIN/MAX answered from store metadata, no scan
    (count_optimization.rs / minmax_optimization.rs)."""
    from zarr_datafusion_spark.engine import Engine

    eng = Engine(spark)
    eng.register_zarr("zq_weather", fixture_store(2))
    df = eng.sql(
        "SELECT COUNT(*) AS n_rows, MIN(time) AS min_time, MAX(time) AS max_time, "
        "MIN(lat) AS min_lat, MAX(lon) AS max_lon FROM zq_weather"
    )
    if not eng.last_query_used_shortcut:  # not `assert`: must survive -O
        raise RuntimeError(
            "statistics shortcut did not fire for zq_weather (store stats "
            "missing or query shape not recognized) — the query would "
            "answer via a full scan, defeating the A7/A8 demonstration"
        )
    return df
