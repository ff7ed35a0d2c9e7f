"""Chunk-level aggregate pushdown tests (reference ``README.md:297``,
the unchecked "push SUM/AVG/COUNT to chunk level" roadmap item).

Layers: differential (shortcut answer == full-scan answer, the
``integration_optimizer.rs`` discipline), plan shape (no zarr scan when
every chunk row is interior), I/O accounting (ONLY boundary slabs are
read when the window cuts mid-chunk), and the bail guards (floats,
overflow-withheld sums, unsorted coordinates — the full plan must
answer, never a wrong shortcut).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import plan_text


@pytest.fixture(scope="module")
def agg_engine(spark):
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.operators.zarr_queries import (
        trending_chunked_store,
    )

    e = Engine(spark)
    e.register_zarr("tc", trending_chunked_store(), data_filter_pushdown=True)
    return e


@pytest.mark.parametrize(
    "sql",
    [
        # boundary + interior mix (window cuts chunk rows 0 and 2)
        "SELECT SUM(pressure) AS s, COUNT(*) AS n, AVG(pressure) AS a, "
        "MIN(pressure) AS lo, MAX(pressure) AS hi "
        "FROM tc WHERE time >= 2 AND time <= 9",
        # chunk-aligned window: interior only
        "SELECT SUM(pressure) AS s FROM tc WHERE time BETWEEN 4 AND 7",
        # no WHERE: global fold
        "SELECT SUM(pressure) AS s, AVG(pressure) AS a FROM tc",
        # strict bounds
        "SELECT SUM(pressure) AS s, COUNT(pressure) AS c FROM tc WHERE time > 5",
        "SELECT AVG(pressure) AS a FROM tc WHERE time < 3",
        # equality inside a chunk (boundary-only)
        "SELECT COUNT(*) AS n, SUM(pressure) AS s FROM tc WHERE time = 5",
        # empty window: SUM/AVG NULL, COUNT 0
        "SELECT SUM(pressure) AS s, COUNT(*) AS n FROM tc WHERE time > 100",
        # redundant conjuncts tighten correctly
        "SELECT SUM(pressure) AS s FROM tc WHERE time >= 1 AND time >= 3 AND time <= 10 AND time < 9",
    ],
)
def test_pushdown_matches_full_scan(agg_engine, spark, sql):
    fast = agg_engine.sql(sql)
    assert agg_engine.last_query_used_shortcut, sql
    full = spark.sql(sql)
    assert fast.collect() == full.collect()
    assert [f.name for f in fast.schema.fields] == [
        f.name for f in full.schema.fields
    ]


def test_interior_only_plan_is_scan_free(agg_engine):
    """A chunk-aligned window needs no boundary scan — the physical
    plan must contain no zarr source at all (the ``assert_no_zarr_exec``
    discipline, reference ``tests/common/mod.rs:118-124``)."""
    df = agg_engine.sql("SELECT SUM(pressure) AS s FROM tc WHERE time BETWEEN 4 AND 7")
    assert agg_engine.last_query_used_shortcut
    assert "zarr" not in plan_text(df).lower()
    df = agg_engine.sql("SELECT SUM(pressure) AS s, AVG(pressure) AS a FROM tc")
    assert agg_engine.last_query_used_shortcut
    assert "zarr" not in plan_text(df).lower()


def test_boundary_slabs_only_are_read(spark, tmp_path, monkeypatch):
    """The done-bar I/O check (VERDICT r9 item 2): under
    ``time BETWEEN 2 AND 9`` over outer chunks of 4, chunk rows 0 and 2
    are boundary (cut at t=2 / t=9) and row 1 (times 4-7) is interior —
    the assembled answer must never read the interior slab.  The
    coordinate-range pushdown narrows WITHIN each boundary slab too,
    so exactly the filtered outer indices {2,3} and {8,9} are read —
    4 x 10 x 14 = 560 of 1680 rows."""
    import zarr_datafusion_spark.zarr as Z
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.operators.zarr_queries import (
        trending_chunked_store,
    )
    from zarr_datafusion_spark.stats.io_stats import collect_stats_dir

    sd = str(tmp_path / "io")
    orig = Z.read_zarr

    def instrumented(spark_, store, **kw):
        return orig(spark_, store, stats_dir=sd, **kw)

    monkeypatch.setattr(Z, "read_zarr", instrumented)
    e = Engine(spark)
    e.register_zarr("tc_io", trending_chunked_store(), data_filter_pushdown=True)
    df = e.sql(
        "SELECT SUM(pressure) AS s, COUNT(*) AS n FROM tc_io "
        "WHERE time >= 2 AND time <= 9"
    )
    assert e.last_query_used_shortcut
    row = df.collect()[0]
    # independent arithmetic: sum over t in [2,9] of (1000+10t+lat+lon)
    t = np.arange(2, 10)
    la = np.arange(10)
    lo = np.arange(14)
    expect = int(
        (1000 + 10 * t[:, None, None] + la[None, :, None] + lo[None, None, :]).sum()
    )
    assert (row.s, row.n) == (expect, 8 * 10 * 14)
    s = collect_stats_dir(sd)
    assert s.rows == 4 * 10 * 14, "read beyond the boundary windows"


def test_float_and_unsorted_and_overflow_bail(spark, tmp_path):
    """Guards: float vars (order-dependent sums), unsorted outer
    coordinates (boundary scan could double-count), and
    overflow-withheld sums must all fall through to the full plan —
    which still answers correctly."""
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.zarr.writer import write_store

    e = Engine(spark)

    # float data var: SUM/AVG never shortcut
    fstore = str(tmp_path / "f.zarr")
    write_store(
        fstore,
        {
            "t": (np.arange(6, dtype=np.int64), (6,)),
            "x": (np.arange(4, dtype=np.int64), (4,)),
            "v": (np.arange(24, dtype=np.float64).reshape(6, 4) / 3.0, (2, 4)),
        },
    )
    e.register_zarr("fstore", fstore, data_filter_pushdown=True)
    df = e.sql("SELECT SUM(v) AS s FROM fstore WHERE t >= 2")
    # float SUM never takes the scan-free stats assembly — but the
    # pruned-SCAN rewrite may serve it (Spark computes the sum itself,
    # so there is no stats-vs-scan float contract to violate)
    assert e.last_shortcut_kind in (None, "pruned")
    assert df.collect() == spark.sql(
        "SELECT SUM(v) AS s FROM fstore WHERE t >= 2"
    ).collect()

    # unsorted outer coordinate: filtered form disabled, global still ok
    ustore = str(tmp_path / "u.zarr")
    write_store(
        ustore,
        {
            "t": (np.array([3, 0, 2, 5, 1, 4], dtype=np.int64), (6,)),
            "x": (np.arange(4, dtype=np.int64), (4,)),
            "v": (np.arange(24, dtype=np.int64).reshape(6, 4), (2, 4)),
        },
    )
    e.register_zarr("ustore", ustore, data_filter_pushdown=True)
    df = e.sql("SELECT SUM(v) AS s FROM ustore WHERE t >= 2")
    # the scan-free assembly must decline (unsorted coords); the
    # pruned-scan rewrite may serve it instead — values via Spark
    assert e.last_shortcut_kind in (None, "pruned")
    assert df.collect()[0].s == spark.sql(
        "SELECT SUM(v) AS s FROM ustore WHERE t >= 2"
    ).collect()[0].s
    df = e.sql("SELECT SUM(v) AS s FROM ustore")  # no WHERE: safe
    assert e.last_query_used_shortcut
    assert df.collect()[0].s == 24 * 23 // 2

    # overflow-withheld per-row sums: bail (the full plan then raises
    # Spark's own ANSI overflow — the shortcut must never answer where
    # the scan would error, and must not answer FROM stats it withheld)
    big = str(tmp_path / "big.zarr")
    write_store(
        big,
        {
            "t": (np.arange(4, dtype=np.int64), (4,)),
            "x": (np.arange(2, dtype=np.int64), (2,)),
            "v": (
                np.full((4, 2), (1 << 61) + 7, dtype=np.int64),
                (2, 2),
            ),
        },
    )
    e.register_zarr("bigstore", big, data_filter_pushdown=True)
    e.sql("SELECT SUM(v) AS s FROM bigstore WHERE t >= 1")
    # never answered FROM the withheld stats — at most a pruned scan
    # whose Spark-computed SUM raises the same ANSI overflow the full
    # plan would
    assert e.last_shortcut_kind in (None, "pruned")


def test_minmax_only_over_withheld_sums(spark, tmp_path):
    """ADVICE r10 (medium): a MIN/MAX-only aggregate over a var whose
    per-row sums were overflow-withheld must still be answered (the
    per-row MIN/MAX stats are present and exact) — it used to raise
    TypeError folding ``sum([None, ...])`` for the interior rows.  And
    the boundary scan must not compute a SUM the query never asked for
    (that sum can ANSI-overflow where the full MIN/MAX plan succeeds)."""
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.zarr.writer import write_store

    big = str(tmp_path / "big_mm.zarr")
    write_store(
        big,
        {
            "t": (np.arange(4, dtype=np.int64), (4,)),
            "x": (np.arange(2, dtype=np.int64), (2,)),
            # |bound| * cells >= 2^62: sidecar withholds per-row sums;
            # 8 cells of ~2^61 also make any full-column SUM raise
            # Spark's ANSI long overflow — MIN/MAX must not trip it
            "v": (
                np.full((4, 2), (1 << 61) + 7, dtype=np.int64),
                (2, 2),
            ),
        },
    )
    e = Engine(spark)
    e.register_zarr("big_mm", big, data_filter_pushdown=True)
    sql = "SELECT MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n FROM big_mm WHERE t >= 1"
    df = e.sql(sql)  # regression: raised TypeError out of Engine.sql
    row = df.collect()[0]
    assert (row.lo, row.hi, row.n) == ((1 << 61) + 7, (1 << 61) + 7, 6)
    assert df.collect() == spark.sql(sql).collect()
    # whichever path served it, no SUM over v may appear in the plan
    assert "sum(v" not in plan_text(df).lower()

    # SUM over the same var must still bail to the full plan (which
    # raises ANSI overflow) — the mixed-item guard is unchanged
    e.sql("SELECT SUM(v) AS s, MIN(v) AS lo FROM big_mm WHERE t >= 1")
    assert e.last_shortcut_kind in (None, "pruned")


def test_rollup_avg_overflow_defers_to_full_plan(spark, tmp_path):
    """ADVICE r10 (low): merging duplicate coordinate rows can push a
    group's exact integer sum past 2^63 even though every per-row sum
    was kept.  SUM already bails there; AVG must too — Spark's
    AVG(bigint) accumulates in DOUBLE (it does NOT overflow), and at
    that magnitude the full plan's rounding is the answer of record."""
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.zarr.writer import write_store

    store = str(tmp_path / "avg_ovf.zarr")
    # outer_chunk == 1 (rollup shape); four duplicate t=7 rows, each
    # per-row sum = 2 * 2^60 = 2^61 (< 2^62: kept); merged group sum
    # = 2^63 (>= 2^63: must defer)
    write_store(
        store,
        {
            "t": (np.array([7, 7, 7, 7], dtype=np.int64), (1,)),
            "x": (np.arange(2, dtype=np.int64), (2,)),
            "v": (np.full((4, 2), 1 << 60, dtype=np.int64), (1, 2)),
        },
    )
    e = Engine(spark)
    e.register_zarr("avg_ovf", store, data_filter_pushdown=True)
    df = e.sql("SELECT t, AVG(v) AS a FROM avg_ovf GROUP BY t")
    assert not e.last_query_used_shortcut
    # the full plan answers (double accumulation), and the values agree
    assert df.collect() == spark.sql(
        "SELECT t, AVG(v) AS a FROM avg_ovf GROUP BY t"
    ).collect()
    # MIN/MAX/COUNT over the same store still roll up scan-free
    df = e.sql("SELECT t, MIN(v) AS lo, COUNT(*) AS n FROM avg_ovf GROUP BY t")
    assert e.last_query_used_shortcut
    assert df.collect() == spark.sql(
        "SELECT t, MIN(v) AS lo, COUNT(*) AS n FROM avg_ovf GROUP BY t"
    ).collect()


def test_bail_shapes_fall_through(agg_engine, spark):
    """Shapes outside EVERY rewrite's contract must leave the full
    plan in charge (and the answers correct): ungrouped-unfiltered
    GROUP BY, OR disjunctions, parenthesised predicates.  (Data-var
    and mixed-column predicates now route to the pruned-scan
    aggregate rewrite instead — covered by test_pruned_agg_rewrite.)"""
    for sql, rows in [
        ("SELECT time, SUM(pressure) AS s FROM tc GROUP BY time", 12),
        ("SELECT SUM(pressure) AS s FROM tc WHERE time >= 2 OR time <= 1", 1),
        ("SELECT SUM(pressure) AS s FROM tc WHERE (time >= 2)", 1),
        # QUOTED literal: every rewrite's conjunct grammar is numeric-
        # only, so a string literal must decline to Spark (which casts
        # '2' and answers identically) — the literal-safety twin of the
        # r13 Engine.sql fuzz, applied to the pruning rewrites
        ("SELECT SUM(pressure) AS s FROM tc WHERE time = '2'", 1),
    ]:
        df = agg_engine.sql(sql)
        assert not agg_engine.last_query_used_shortcut, sql
        got = df.collect()
        assert len(got) == rows
        assert got == spark.sql(sql).collect()


@pytest.mark.parametrize(
    "sql,expect_shortcut",
    [
        # full rollup, no scan (trending_store has outer_chunk == 1)
        ("SELECT time, SUM(pressure) AS s, COUNT(*) AS n, AVG(pressure) AS a, "
         "MIN(pressure) AS lo, MAX(pressure) AS hi FROM tr GROUP BY time", True),
        # windowed rollup
        ("SELECT time, SUM(pressure) AS s FROM tr WHERE time >= 3 GROUP BY time", True),
        ("SELECT SUM(pressure) AS s, time FROM tr WHERE time BETWEEN 2 AND 5 "
         "GROUP BY time", True),
        # empty window
        ("SELECT time, SUM(pressure) AS s FROM tr WHERE time > 99 GROUP BY time", True),
        # outer chunks of 4: per-group sums unavailable -> full plan
        ("SELECT time, SUM(pressure) AS s FROM tc GROUP BY time", False),
        # grouping on a non-outer coordinate -> full plan
        ("SELECT lat, SUM(pressure) AS s FROM tr GROUP BY lat", False),
    ],
)
def test_grouped_rollup_matches_full_scan(rollup_engine, spark, sql, expect_shortcut):
    fast = rollup_engine.sql(sql)
    assert rollup_engine.last_query_used_shortcut == expect_shortcut, sql
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, spark.sql(sql).collect())
    )
    assert [(f.name, f.dataType) for f in fast.schema.fields] == [
        (f.name, f.dataType) for f in spark.sql(sql).schema.fields
    ]


@pytest.fixture(scope="module")
def rollup_engine(spark):
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.operators.zarr_queries import (
        trending_chunked_store,
        trending_store,
    )

    e = Engine(spark)
    e.register_zarr("tr", trending_store(), data_filter_pushdown=True)
    e.register_zarr("tc", trending_chunked_store(), data_filter_pushdown=True)
    return e


def test_grouped_rollup_plan_is_scan_free(rollup_engine):
    df = rollup_engine.sql(
        "SELECT time, SUM(pressure) AS s FROM tr WHERE time >= 3 GROUP BY time"
    )
    assert rollup_engine.last_query_used_shortcut
    assert "zarr" not in plan_text(df).lower()


def test_grouped_rollup_merges_duplicate_coord_values(spark, tmp_path):
    """An outer coordinate with DUPLICATE values (legal in an unsorted
    axis) must merge into one SQL group, not emit one row per chunk
    row."""
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.zarr.writer import write_store

    store = str(tmp_path / "dup.zarr")
    write_store(
        store,
        {
            "t": (np.array([2, 1, 2, 1], dtype=np.int64), (4,)),
            "x": (np.arange(3, dtype=np.int64), (3,)),
            "v": (np.arange(12, dtype=np.int64).reshape(4, 3), (1, 3)),
        },
    )
    e = Engine(spark)
    e.register_zarr("dup_t", store, data_filter_pushdown=True)
    sql = (
        "SELECT t, SUM(v) AS s, COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi "
        "FROM dup_t GROUP BY t"
    )
    fast = e.sql(sql)
    assert e.last_query_used_shortcut
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, spark.sql(sql).collect())
    )
    assert fast.count() == 2


@pytest.mark.parametrize(
    "sql,expect_shortcut",
    [
        # tail top-k across a slab boundary (200 rows = 2 outer indices)
        ("SELECT time, lat, lon, pressure FROM tc "
         "ORDER BY time DESC, lat DESC, lon DESC LIMIT 200", True),
        # head direction, SELECT *
        ("SELECT * FROM tc ORDER BY time, lat, lon LIMIT 150", True),
        # k >= total rows: nothing prunable
        ("SELECT time, pressure FROM tc ORDER BY time DESC LIMIT 5000", False),
        # leading key not the outer coordinate
        ("SELECT time, pressure FROM tc ORDER BY pressure DESC LIMIT 10", False),
    ],
)
def test_topk_matches_full_plan(agg_engine, spark, sql, expect_shortcut):
    """Top-K pushdown (reference roadmap README.md:298): coordinate-
    leading ORDER BY ... LIMIT answers from a threshold-pruned scan and
    must equal the full plan row-for-row (total orders only here)."""
    fast = agg_engine.sql(sql)
    assert agg_engine.last_query_used_shortcut == expect_shortcut, sql
    assert [tuple(r) for r in fast.collect()] == [
        tuple(r) for r in spark.sql(sql).collect()
    ]


def test_topk_reads_only_tail_slabs(spark, tmp_path, monkeypatch):
    """ORDER BY time DESC LIMIT 200 over 3 slabs of 4 outer indices x
    140 rows: the top 200 fit inside the LAST slab, so the pruned scan
    reads exactly that one slab (560 rows) and never the other 1120.
    Slab granularity is the honest statistics contract (the parquet
    row-group analog): the sidecar bounds coordinates per chunk row,
    so the threshold lands on a slab edge, not a row edge."""
    import zarr_datafusion_spark.zarr as Z
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.operators.zarr_queries import (
        trending_chunked_store,
    )
    from zarr_datafusion_spark.stats.io_stats import collect_stats_dir

    sd = str(tmp_path / "io")
    orig = Z.read_zarr
    monkeypatch.setattr(
        Z, "read_zarr", lambda sp, st, **kw: orig(sp, st, stats_dir=sd, **kw)
    )
    e = Engine(spark)
    e.register_zarr("tc_tk", trending_chunked_store(), data_filter_pushdown=True)
    df = e.sql(
        "SELECT time, lat, lon, pressure FROM tc_tk "
        "ORDER BY time DESC, lat DESC, lon DESC LIMIT 200"
    )
    assert e.last_query_used_shortcut
    assert e.last_shortcut_kind == "pruned"  # it DOES read tail slabs
    rows = df.collect()
    assert len(rows) == 200
    assert rows[0].time == 11 and rows[0].lat == 9 and rows[0].lon == 13
    assert {r.time for r in rows} == {10, 11}
    s = collect_stats_dir(sd)
    assert s.rows == 4 * 10 * 14, "read beyond the top-k tail slab"


def test_shortcut_kind_accounting(agg_engine):
    """`last_shortcut_kind` must say scan_free only when the plan has
    no zarr source (the honest REPL line, ADVICE-proofing)."""
    agg_engine.sql("SELECT SUM(pressure) AS s FROM tc WHERE time BETWEEN 4 AND 7")
    assert agg_engine.last_shortcut_kind == "scan_free"
    agg_engine.sql("SELECT SUM(pressure) AS s FROM tc WHERE time >= 2 AND time <= 9")
    assert agg_engine.last_shortcut_kind == "pruned"  # boundary slabs read
    agg_engine.sql("SELECT time, SUM(pressure) AS s FROM tc GROUP BY time")
    assert agg_engine.last_shortcut_kind is None  # full plan (outer_chunk=4)


def test_ddl_options_enable_chunk_stats(spark):
    """DataFusion's OPTIONS spelling on the verbatim DDL enables the
    sidecar from SQL: ``CREATE EXTERNAL TABLE ... STORED AS ZARR
    LOCATION '...' OPTIONS ('chunk_stats' 'true')`` makes aggregate
    and top-k pushdown serve the table; without the option the DDL
    registers the plain (also multi-query-safe) view."""
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.operators.zarr_queries import trending_store

    e = Engine(spark)
    e.sql(
        f"CREATE EXTERNAL TABLE trend_ddl_cs STORED AS ZARR "
        f"LOCATION '{trending_store()}' OPTIONS ('chunk_stats' 'true')"
    )
    df = e.sql("SELECT SUM(pressure) AS s FROM trend_ddl_cs WHERE time >= 6")
    assert e.last_query_used_shortcut
    assert df.collect() == spark.sql(
        "SELECT SUM(pressure) AS s FROM trend_ddl_cs WHERE time >= 6"
    ).collect()

    e.sql(
        f"CREATE EXTERNAL TABLE trend_ddl_plain STORED AS ZARR "
        f"LOCATION '{trending_store()}'"
    )
    e.sql("SELECT SUM(pressure) AS s FROM trend_ddl_plain WHERE time >= 6")
    assert not e.last_query_used_shortcut


def test_sql_filter_rewrite_prunes_and_matches(spark, tmp_path, monkeypatch):
    """A plain filtered SELECT against a chunk-stats table rewrites
    onto a FRESH pruned relation per statement: the scan skips the
    slabs the data statistics prove empty, the values equal the lazy
    view's, and — the ADVICE r9 regression — a later full COUNT on the
    same view still sees every row (nothing cacheable survives)."""
    import zarr_datafusion_spark.zarr as Z
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.operators.zarr_queries import trending_store
    from zarr_datafusion_spark.stats.io_stats import collect_stats_dir

    sd = str(tmp_path / "io")
    orig = Z.read_zarr

    def instrumented(spark_, store, **kw):
        kw.setdefault("stats_dir", sd)
        return orig(spark_, store, **kw)

    monkeypatch.setattr(Z, "read_zarr", instrumented)
    e = Engine(spark)
    e.register_zarr("tr_fr", trending_store(), data_filter_pushdown=True)

    sql = (
        "SELECT time, lat, lon, pressure FROM tr_fr "
        "WHERE pressure >= 1075 AND lat > 2"
    )
    fast = e.sql(sql)
    assert e.last_query_used_shortcut
    assert e.last_shortcut_kind == "pruned"
    fast_rows = sorted(map(tuple, fast.collect()))
    # snapshot BEFORE the view comparison below (the view's full scan
    # spills into the same instrumented stats dir)
    s = collect_stats_dir(sd)
    # pressure >= 1075 skips slabs t<6 via data stats; lat > 2 narrows
    # the lat window to 7 of 10 — 6 slabs x 7 lats x 14 lons
    assert s.rows == 6 * 7 * 14, "rewrite did not prune the scan"
    assert fast_rows == sorted(map(tuple, spark.sql(sql).collect()))

    # the named view itself stays lazy and multi-query-safe
    assert spark.sql("SELECT COUNT(*) AS n FROM tr_fr").collect()[0].n == 1680

    # non-rewritable shapes answer through the view, correctly
    odd = "SELECT time, pressure FROM tr_fr WHERE pressure >= 1075 OR lat > 2"
    e.sql(odd)
    assert not e.last_query_used_shortcut


def test_pruned_agg_rewrite(spark, tmp_path, monkeypatch):
    """Aggregates the stats assembly declines (data-variable
    predicates, grouped forms over multi-index chunks) still run on a
    PRUNED scan: Spark computes the aggregate, the chunk statistics
    skip the provably-empty slabs, values equal the lazy view's."""
    import zarr_datafusion_spark.zarr as Z
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.operators.zarr_queries import (
        trending_chunked_store,
    )
    from zarr_datafusion_spark.stats.io_stats import collect_stats_dir

    sd = str(tmp_path / "io")
    orig = Z.read_zarr

    def instrumented(spark_, store, **kw):
        kw.setdefault("stats_dir", sd)
        return orig(spark_, store, **kw)

    monkeypatch.setattr(Z, "read_zarr", instrumented)
    e = Engine(spark)
    e.register_zarr("tc_pa", trending_chunked_store(), data_filter_pushdown=True)

    # data-variable predicate: pressure >= 1075 skips slabs whose max
    # (1022 + 10*t_hi) proves empty — rows t in [0..3] skip entirely
    sql = (
        "SELECT COUNT(*) AS n, SUM(pressure) AS s, AVG(pressure) AS a "
        "FROM tc_pa WHERE pressure >= 1075"
    )
    fast = e.sql(sql)
    assert e.last_query_used_shortcut
    assert e.last_shortcut_kind == "pruned"
    got = fast.collect()
    s = collect_stats_dir(sd)
    assert s.rows == 2 * 4 * 10 * 14, "data-var pruning did not skip slabs"
    assert got == spark.sql(sql).collect()

    # grouped over multi-index chunks (stats assembly bails: outer
    # chunks of 4): the pruned-scan rewrite still serves it, column
    # order preserved even with the group key listed last
    sql = (
        "SELECT SUM(pressure) AS s, time FROM tc_pa "
        "WHERE pressure >= 1075 GROUP BY time"
    )
    fast = e.sql(sql)
    assert e.last_query_used_shortcut
    assert [f.name for f in fast.schema.fields] == ["s", "time"]
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, spark.sql(sql).collect())
    )
