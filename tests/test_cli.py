"""A11 REPL tests (reference ``src/bin/zarr_cli/main.rs`` behaviors:
query execution + timing line, DDL detection, stats-shortcut line,
error recovery)."""

from __future__ import annotations

import builtins

import pytest

from zarr_datafusion_spark import cli


def _run_repl(monkeypatch, capsys, engine, lines, zarr_tables=None):
    it = iter(lines)
    monkeypatch.setattr(builtins, "input", lambda *_: next(it))
    try:
        cli.repl(engine, zarr_tables or {})
    except StopIteration:
        pass
    return capsys.readouterr().out


def test_repl_select_and_quit(monkeypatch, capsys, engine):
    out = _run_repl(
        monkeypatch, capsys, engine, ["SELECT 1 AS x;", "\\q"]
    )
    assert "| x |" in out and "| 1 |" in out
    assert "1 rows ·" in out


def test_repl_shortcut_line(monkeypatch, capsys, engine):
    out = _run_repl(
        monkeypatch, capsys, engine, ["SELECT COUNT(*) AS n FROM lineitem", "exit"]
    )
    assert "answered from statistics (no scan)" in out


def test_repl_error_recovery(monkeypatch, capsys, engine):
    out = _run_repl(
        monkeypatch,
        capsys,
        engine,
        ["SELECT nope FROM lineitem;", "SELECT 2 AS y;", "quit"],
    )
    assert "Error:" in out
    assert "| 2 |" in out  # session survived


def test_repl_ddl_ok_line(monkeypatch, capsys, engine):
    out = _run_repl(
        monkeypatch,
        capsys,
        engine,
        ["CREATE TEMPORARY VIEW _cli_t AS SELECT 1 AS x;", "DROP VIEW _cli_t;", "\\q"],
    )
    assert out.count("OK (") == 2


def test_repl_continuation(monkeypatch, capsys, engine):
    out = _run_repl(
        monkeypatch, capsys, engine, ["SELECT 41 + 1 \\", "AS z;", "\\q"]
    )
    assert "| z  |" in out and "| 42 |" in out


def test_repl_zarr_stats_line(monkeypatch, capsys, engine):
    from zarr_datafusion_spark.operators.zarr_queries import fixture_store

    store = fixture_store(2)
    engine.register_zarr("weather_cli", store)
    out = _run_repl(
        monkeypatch,
        capsys,
        engine,
        ["SELECT COUNT(DISTINCT lat) AS n FROM weather_cli;", "\\q"],
        zarr_tables={"weather_cli": store},
    )
    assert "arrays · scan 700 cells ·" in out and "disk" in out


def test_status_line_format():
    from zarr_datafusion_spark.cli import _status_line

    assert _status_line(1.23, []) == "1.2s"
    assert (
        _status_line(0.5, [(3, 5, 8), (4, 0, 32)])
        == "0.5s · stage 3: 5/8 tasks · stage 4: 0/32 tasks"
    )


def test_live_status_paints_and_clears_tty(spark):
    """With a TTY-like sink the live line paints \r-updates and erases
    itself on exit; with a non-TTY sink it stays silent."""
    import io
    import time as _t

    from zarr_datafusion_spark.cli import _live_status

    class FakeTty(io.StringIO):
        def isatty(self):
            return True

    out = FakeTty()
    with _live_status(spark, out=out, interval=0.05):
        _t.sleep(0.25)
    text = out.getvalue()
    assert "\r" in text and "s" in text
    assert text.endswith("\r"), "line must erase itself before results print"

    silent = io.StringIO()
    with _live_status(spark, out=silent, interval=0.05):
        _t.sleep(0.15)
    assert silent.getvalue() == ""


def test_explain_analyze_prints_metrics(engine):
    """EXPLAIN ANALYZE (reference docs/CLI_REFERENCE.md:463-467): the
    executed plan comes back annotated with real runtime metrics, and
    the stats shortcut still answers metadata-only queries scan-free."""
    out = engine.explain_analyze(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
    )
    assert "number of output rows" in out
    assert "HashAggregate" in out
    # rows actually flowed (the fixture has 3 return flags)
    assert "number of output rows: 3" in out


def test_information_schema_queries(engine):
    """The reference enables DataFusion's information_schema
    (main.rs:54-65; CLI_REFERENCE.md:445-451): the documented
    column-listing query must run verbatim through Engine.sql."""
    rows = engine.sql(
        "SELECT column_name, data_type FROM information_schema.columns "
        "WHERE table_name = 'lineitem' ORDER BY column_name"
    ).collect()
    names = [r.column_name for r in rows]
    assert "l_orderkey" in names and "l_quantity" in names
    types = {r.column_name: r.data_type for r in rows}
    assert types["l_orderkey"] == "bigint"
    tabs = {
        r.table_name
        for r in engine.sql(
            "SELECT table_name FROM information_schema.tables"
        ).collect()
    }
    assert {"lineitem", "orders", "customer"} <= tabs
    # the third relation (REPL.md:66-69): registered views, with a
    # NULL definition (Spark exposes no text for temp views)
    views = {
        r.table_name: r.view_definition
        for r in engine.sql(
            "SELECT table_name, view_definition FROM information_schema.views"
        ).collect()
    }
    assert "lineitem" in views and views["lineitem"] is None


def test_information_schema_rewrite_skips_string_literals(engine):
    """ADVICE r6: the information_schema rewrite is word-bounded and
    must never rewrite INSIDE a string literal — a query that merely
    mentions 'information_schema.columns' as data keeps its literal
    value (and one that references the relation AND carries the literal
    rewrites only the identifier position)."""
    row = engine.sql("SELECT 'information_schema.columns' AS s").collect()[0]
    assert row.s == "information_schema.columns"
    rows = engine.sql(
        "SELECT table_name, 'information_schema.tables' AS lit "
        "FROM information_schema.tables WHERE table_name = 'lineitem'"
    ).collect()
    assert rows and rows[0].lit == "information_schema.tables"


def test_explain_verbose_accepted_verbatim(engine):
    """The reference's EXPLAIN VERBOSE spelling
    (docs/CLI_REFERENCE.md:469-475) must run unchanged — rewritten to
    Spark's EXPLAIN EXTENDED, whose output carries the full
    parsed/analyzed/optimized/physical plan sections."""
    rows = engine.sql(
        "EXPLAIN VERBOSE SELECT l_returnflag, COUNT(*) FROM lineitem "
        "GROUP BY l_returnflag"
    ).collect()
    text = rows[0][0]
    assert "== Parsed Logical Plan ==" in text
    assert "== Physical Plan ==" in text


def test_repl_help_and_backslash_d(monkeypatch, capsys, engine):
    """The reference CLI's `help` and `\\d` commands
    (docs/CLI_REFERENCE.md:29-34) must work in the REPL: help prints
    the command table, `\\d` lists registered tables like SHOW
    TABLES."""
    out = _run_repl(monkeypatch, capsys, engine, ["help", "\\d", "\\q"])
    assert "show tables / \\d" in out
    assert "lineitem" in out  # \d listed the registered tables


def test_repl_schema_command(monkeypatch, capsys, engine):
    """Reference roadmap `.schema <table>` (README.md:308): one line
    per column, no result framing."""
    out = _run_repl(monkeypatch, capsys, engine, [".schema region", "\\q"])
    assert "r_regionkey" in out and "r_name  string" in out
    assert "| " not in out.split(".schema", 1)[-1][:20]


def test_repl_format_csv_and_json(monkeypatch, capsys, engine):
    """Reference roadmap output formats (README.md:305): csv and json
    emit EVERY row machine-readably; table stays the default."""
    out = _run_repl(
        monkeypatch,
        capsys,
        engine,
        [
            "\\format csv",
            "SELECT r_regionkey AS k, r_name AS n FROM region "
            "ORDER BY r_regionkey;",
            "\\format json",
            "SELECT 7 AS seven;",
            "\\format",
            "\\format bogus",
            "\\q",
        ],
    )
    assert "format: csv" in out
    assert "k,n" in out  # csv header
    assert "0,AFRICA" in out
    assert '{"seven": 7}' in out
    assert out.count("format: json") >= 2  # set + bare query
    assert "usage: \\format" in out


def test_repl_pager_used_for_large_tty_results(monkeypatch, capsys, engine):
    """Reference roadmap pager support (README.md:309): on a tty, a
    >40-row table pages in FULL through $PAGER instead of truncating."""
    import sys as _sys

    paged = {}

    def fake_page(text):
        paged["text"] = text
        return True

    monkeypatch.setattr(cli, "_page", fake_page)
    monkeypatch.setattr(_sys.stdout, "isatty", lambda: True, raising=False)
    out = _run_repl(
        monkeypatch,
        capsys,
        engine,
        ["SELECT l_orderkey FROM lineitem LIMIT 50;", "\\q"],
    )
    assert "text" in paged, "pager was not invoked"
    assert paged["text"].count("\n") >= 50  # full result, no truncation
    assert "more rows)" not in paged["text"]
    assert "50 rows ·" in out


def test_repl_format_parquet(monkeypatch, capsys, engine, tmp_path):
    """The 4th roadmap output format (README.md:305): \\format parquet
    <path> writes each result as a parquet dataset via the EXECUTORS
    (no driver collect) and reports the row count; bad usage keeps the
    session alive."""
    out_path = str(tmp_path / "res.parquet")
    out = _run_repl(
        monkeypatch,
        capsys,
        engine,
        [
            "\\format parquet",  # missing path: usage
            f"\\format parquet {out_path}",
            "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag;",
            "\\format table",
            "\\q",
        ],
    )
    assert "usage: \\format" in out
    assert f"format: parquet -> {out_path}" in out
    assert f"rows written to {out_path}" in out
    assert "format: table" in out
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out_path}/*.parquet')"
    ).fetchone()[0]
    assert n == 3


def test_needs_continuation_rules():
    from zarr_datafusion_spark.cli import _needs_continuation as nc

    assert nc("SELECT sum(")
    assert nc("WITH x AS (SELECT 1")
    assert nc("SELECT 'an open string")
    assert nc("SELECT 'it''s open")           # '' escape, still open
    assert not nc("SELECT 'it''s closed'")
    assert not nc("SELECT ')' -- (comment (")  # paren in string/comment
    assert not nc("SELECT (1 + (2)) AS x")


def test_repl_multiline_paste(monkeypatch, capsys, engine):
    """A formatted statement with open parens buffers line-by-line and
    runs once balanced (reference roadmap README.md:303)."""
    out = _run_repl(
        monkeypatch,
        capsys,
        engine,
        ["SELECT t.x FROM (", "  SELECT 2 AS x", ") t;", "quit"],
    )
    assert "2" in out and "Error" not in out


def test_needs_continuation_escapes_and_comments():
    from zarr_datafusion_spark.cli import _needs_continuation as nc

    assert not nc(r"SELECT 'O\'Brien'")      # backslash escape closes
    assert nc(r"SELECT 'O\'Brien")            # genuinely open
    assert not nc("SELECT 1 /* ( unbalanced in comment */")
    assert nc("SELECT 1 /* unterminated comment")


def test_repl_empty_line_force_submits(monkeypatch, capsys, engine):
    """A stuck continuation (scanner/dialect disagreement) escapes via
    an empty line: the buffer submits as-is and the error comes back
    instead of an endless prompt."""
    out = _run_repl(
        monkeypatch, capsys, engine,
        ["SELECT (1 + 1 AS x", "", "SELECT 7 AS ok;", "quit"],
    )
    assert "Error" in out and "7" in out


def test_repl_icechunk_history_and_refs(monkeypatch, capsys, engine, tmp_path):
    from pyspark.sql import functions as F

    from zarr_datafusion_spark.operators.zarr_queries import fixture_store
    from zarr_datafusion_spark.zarr import read_zarr
    from zarr_datafusion_spark.zarr.icechunk import commit_zarr, create_tag

    repo = str(tmp_path / "cli.ic")
    src = read_zarr(engine.spark, fixture_store(2))
    s1 = commit_zarr(src.filter(F.col("time") < 2), repo,
                     coords=["time", "lat", "lon"], message="first")
    create_tag(repo, "v1", s1)
    commit_zarr(src, repo, coords=["time", "lat", "lon"], message="second")

    out = _run_repl(
        monkeypatch, capsys, engine,
        [f".history icechunk://{repo}", f".refs {repo}",
         ".history /nonexistent", "quit"],
    )
    assert "second" in out and "first" in out
    assert "branch main ->" in out and "tag    v1 ->" in out
    assert "Error" in out  # the nonexistent repo reports, not crashes

    # ADVICE r11: a ref'd URL shows THAT ref's history (the ref used to
    # pass through as part of the filesystem path and ENOENT)
    out = _run_repl(
        monkeypatch, capsys, engine,
        [f".history icechunk://{repo}@tag:v1", "quit"],
    )
    assert "first" in out and "second" not in out and "Error" not in out
