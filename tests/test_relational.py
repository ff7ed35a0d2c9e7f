"""Differential tests: every Tier B query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate (row count + columns +
order-insensitive values) so oracle misalignment is caught locally
before a round submission.  Pattern from the reference's differential
optimizer tests (``tests/integration_optimizer.rs:149-212``).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_frames_match
from zarr_datafusion_spark.operators import relational


@pytest.mark.parametrize("name", sorted(relational.ORACLE))
def test_relational_vs_duckdb(spark, duck, name):
    df = relational.QUERIES[name](spark, SF_DIR)
    rel = duck.sql(relational.ORACLE[name])
    assert_frames_match(df, rel)


def test_every_query_has_oracle():
    missing = set(relational.QUERIES) - set(relational.ORACLE)
    assert not missing, f"queries without oracle twins: {missing}"


def test_approx_distinct_within_error(spark):
    # rsd=0.02 → generous 5x band still catches a broken sketch; the
    # band boolean is also oracle-pinned (must hash as TRUE).
    row = relational.QUERIES["agg_approx_distinct"](spark, SF_DIR).collect()[0]
    assert row.approx_within_band


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "count_order" in df.columns
