"""Unit tests for the REPL SQL highlighter + hint/completion helpers
(reference parity: ``src/bin/zarr_cli/highlight.rs``). Pure Python —
no Spark session needed."""

from __future__ import annotations

from zarr_datafusion_spark.highlight import (
    SqlCompleter,
    highlight_sql,
    history_hint,
    strip_ansi,
)


def test_roundtrip_is_lossless():
    cases = [
        "SELECT a, b FROM t WHERE x = 1 AND y <> 'it''s' -- tail",
        "select count(*) from lineitem group by l_returnflag",
        "/* multi\nline */ SELECT 1.5e3 + .25",
        "CREATE TEMPORARY VIEW w USING zarr OPTIONS (path '/tmp/s')",
        "",
        "   ",
        "not sql at all ~~~ ☃ unterminated ' string",
    ]
    for sql in cases:
        assert strip_ansi(highlight_sql(sql)) == sql


def test_token_classes_colored():
    out = highlight_sql("SELECT name FROM t WHERE n >= 10 -- c")
    assert "\x1b[1;32mSELECT\x1b[0m" in out  # keyword: bold green
    assert "\x1b[1;32mFROM\x1b[0m" in out
    assert "\x1b[34m>=\x1b[0m" in out  # operator: blue
    assert "\x1b[33m10\x1b[0m" in out  # number: yellow
    assert "\x1b[90m-- c\x1b[0m" in out  # comment: dark gray
    # identifiers stay unstyled
    assert "\x1b" not in strip_ansi(out)
    assert "name" in strip_ansi(out)


def test_strings_and_case_insensitive_keywords():
    out = highlight_sql("select 'a--b' as x")
    # the comment marker inside the string must NOT be comment-colored
    assert "\x1b[90m" not in out
    assert "\x1b[33m'a--b'\x1b[0m" in out
    assert "\x1b[1;32mselect\x1b[0m" in out
    # ZARR is a keyword like the reference's custom case
    assert "\x1b[1;32mZARR\x1b[0m" in highlight_sql("USING ZARR")


def test_history_hint_semantics():
    hist = ["SELECT 1", "SELECT a FROM t", "SHOW TABLES"]
    # most recent match wins, case-insensitive, suffix only
    assert history_hint("select a", hist) == " FROM t"
    assert history_hint("SH", hist) == "OW TABLES"
    # under 2 chars: no hint; exact match: no empty hint
    assert history_hint("S", hist) is None
    assert history_hint("SHOW TABLES", hist) is None
    assert history_hint("zz", hist) is None


def test_completer_keywords_tables_history():
    comp = SqlCompleter(tables=["lineitem", "orders"], history=["SELECT x FROM orders"])
    comp._buffer = lambda text: text  # simulate completing at line start

    def matches(text):
        out = []
        i = 0
        while (m := comp(text, i)) is not None:
            out.append(m)
            i += 1
        return out

    got = matches("SEL")
    assert got[0] == "SELECT x FROM orders"  # history continuation first
    assert "SELECT" in got  # upper-cased keyword (input was upper)
    assert matches("line") == ["lineitem"]
    assert "select" in matches("sel")  # lower stays lower
    assert matches("zzz") == []


def test_completer_columns_live(monkeypatch):
    """Column names complete alongside tables/keywords (reference
    roadmap README.md:301: tables/columns/keywords), read LIVE so
    in-REPL DDL surfaces new columns; a failing provider degrades to
    no column candidates instead of breaking completion."""
    cols = ["l_orderkey", "l_quantity"]
    comp = SqlCompleter(tables=["lineitem"], columns_fn=lambda: list(cols))
    comp._buffer = lambda text: "SELECT " + text  # mid-statement

    def matches(text):
        out, i = [], 0
        while (m := comp(text, i)) is not None:
            out.append(m)
            i += 1
        return out

    assert matches("l_or") == ["l_orderkey"]
    cols.append("l_extendedprice")  # live provider: new column appears
    assert "l_extendedprice" in matches("l_ex")
    comp.columns_fn = lambda: (_ for _ in ()).throw(RuntimeError("down"))
    assert matches("l_or") == []  # degraded, not broken
    assert matches("line") == ["lineitem"]
