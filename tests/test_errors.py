"""Error-path tests mirroring the reference's ``tests/integration_error.rs``:
bad store paths, bad SQL, unknown columns/tables — and, critically, the
session keeps working after every failure (``integration_error.rs:60-85``)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def test_bad_store_path():
    from zarr_datafusion_spark.zarr.metadata import discover_arrays

    with pytest.raises(Exception):
        discover_arrays("/nonexistent/store.zarr")


def test_not_a_zarr_store(tmp_path):
    from zarr_datafusion_spark.zarr.metadata import discover_arrays

    (tmp_path / "random.txt").write_text("not zarr")
    with pytest.raises(Exception):
        discover_arrays(str(tmp_path))


def test_bad_sql_then_recover(spark):
    from pyspark.sql.utils import AnalysisException, ParseException

    with pytest.raises(ParseException):
        spark.sql("SELEKT 1").collect()
    # session survives
    assert spark.sql("SELECT 1 AS x").collect()[0].x == 1


def test_unknown_table(spark):
    from pyspark.sql.utils import AnalysisException

    with pytest.raises(AnalysisException):
        spark.sql("SELECT * FROM definitely_not_a_table_xyz").collect()


def test_unknown_column(spark):
    from pyspark.sql.utils import AnalysisException

    from zarr_datafusion_spark.session import register_tables

    register_tables(spark, SF_DIR)
    with pytest.raises(AnalysisException):
        spark.sql("SELECT bogus_col FROM lineitem").collect()
    # session survives with a correct query on the same table
    assert spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n > 0


def test_engine_sql_error_then_shortcut_still_works(engine):
    from pyspark.sql.utils import AnalysisException

    with pytest.raises(AnalysisException):
        engine.sql("SELECT nope FROM lineitem").collect()
    df = engine.sql("SELECT COUNT(*) AS n FROM lineitem")
    assert engine.last_query_used_shortcut
    assert df.collect()[0].n > 0


def test_zarr_source_requires_path(spark):
    from zarr_datafusion_spark.zarr import register_zarr_source

    register_zarr_source(spark)
    with pytest.raises(Exception):
        spark.read.format("zarr").load().collect()
