"""One-Trillion-Row-Challenge shape (reference roadmap README.md:337).

The challenge query — per-station MIN/MEAN/MAX over a measurements
grid — must answer ENTIRELY from the chunk-statistics sidecar when
stations are the outer coordinate (one per chunk row): query cost is
then O(stations), not O(rows), which is what makes the trillion-row
scale an exercise in the one-time stats pass (``scripts/trc_demo.py``
measures it at 10^8 rows)."""

from __future__ import annotations


def test_trc_rollup_is_scan_free_and_exact(spark):
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.operators.zarr_queries import trc_store
    from zarr_datafusion_spark.zarr import read_zarr

    eng = Engine(spark)
    eng.register_zarr("trc_t", trc_store(), data_filter_pushdown=True)
    sql = (
        "SELECT station, MIN(temp_x10) AS min_t, AVG(temp_x10) AS mean_t, "
        "MAX(temp_x10) AS max_t, COUNT(*) AS n FROM trc_t GROUP BY station"
    )
    df = eng.sql(sql)
    assert eng.last_shortcut_kind == "scan_free"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "trc_temps.zarr" not in plan  # no zarr scan node at all

    got = sorted(map(tuple, df.collect()))
    full = read_zarr(spark, trc_store())
    full.createOrReplaceTempView("trc_full")
    want = sorted(map(tuple, spark.sql(sql.replace("trc_t", "trc_full")).collect()))
    assert got == want
