"""Tests for the post-window extras: contamination, pivot, and the
watermarked stream-stream join.  Oracle-checked through the shared
differential harness, plus semantic invariants the hash can't see."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_frames_match
from zarr_datafusion_spark.operators import extras


@pytest.mark.parametrize("name", sorted(extras.ORACLE))
def test_extras_oracle(spark, duck, name):
    assert_frames_match(extras.QUERIES[name](spark, SF_DIR), duck.sql(extras.ORACLE[name]))


def test_contamination_bounds_and_nonvacuous(spark):
    rows = extras.QUERIES["text_contamination"](spark, SF_DIR).collect()
    assert rows, "no test-split documents at this sf"
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_grams
        assert abs(r.contamination - r.n_contaminated / r.n_grams) < 1e-12
    # the synthetic corpus shares phrases across splits — an all-zero
    # result would mean the train gram set never matched (vacuous join)
    assert any(r.n_contaminated > 0 for r in rows)


def test_pivot_cells_match_filtered_aggregates(spark, duck):
    """Each pivot cell must equal the independently-computed filtered
    aggregate — catches a value-list/column mix-up the oracle's own
    conditional aggregation would replicate."""
    out = {
        r.o_orderpriority: r
        for r in extras.QUERIES["agg_pivot"](spark, SF_DIR).collect()
    }
    probe = duck.sql(
        """SELECT o_orderpriority,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
           FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority"""
    ).df()
    for _, row in probe.iterrows():
        assert out[row.o_orderpriority].status_f == pytest.approx(row.v, abs=1e-9)


def test_streaming_join_nonempty_and_within_window(spark):
    rows = extras.QUERIES["streaming_join"](spark, SF_DIR).collect()
    assert rows, "no click->purchase pairs within an hour at this sf"
    ids = {(r.click_id, r.purchase_id) for r in rows}
    assert len(ids) == len(rows), "duplicate attribution pairs"
