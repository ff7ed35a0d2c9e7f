"""Interactive SQL shell — the reference's ``zarr-cli`` (A11), thin.

The reference ships a readline REPL with history, DDL detection, and a
timing + I/O stats line (``src/bin/zarr_cli/main.rs:45-211``,
``docs/CLI_REFERENCE.md``).  Spark already has a full shell
(``pyspark``); this wrapper adds the pieces the reference layers on
top: the stats-shortcut engine front door, per-query timing, and the
A10 stats line for zarr-backed tables.

Run: ``python -m zarr_datafusion_spark.cli [--sf-dir DIR] [--zarr name=path ...]``

Commands: any Spark SQL (``SHOW TABLES``, ``DESCRIBE t``, ``EXPLAIN
SELECT ...``, ``CREATE TEMPORARY VIEW t USING zarr OPTIONS (path
'...')``, ...), plus ``\\q`` / ``exit`` to quit.
"""

from __future__ import annotations

import argparse
import atexit
import json
import os
import sys
import time

HISTORY_FILE = os.path.expanduser("~/.zds_cli_history")


def _setup_readline(
    tables: list[str] | None = None, tables_fn=None, columns_fn=None
) -> None:
    """History persistence like the reference's ~/.zarr_cli_history
    (``main.rs:83-95``), plus tab-completion over SQL keywords, table
    names, COLUMN names (roadmap ``README.md:301``), and history
    continuations (the plain-readline analog of the reference's
    Hinter, ``highlight.rs:29-59``).  History/table/column candidates
    are read LIVE at completion time — statements typed this session
    and tables created via in-REPL DDL complete immediately, matching
    the reference Hinter's live-history behavior."""
    try:
        import readline
    except ImportError:  # non-readline platform: plain input()
        return
    try:
        readline.read_history_file(HISTORY_FILE)
    except OSError:
        pass
    readline.set_history_length(1000)
    atexit.register(lambda: readline.write_history_file(HISTORY_FILE))

    from zarr_datafusion_spark.highlight import SqlCompleter

    def history_fn() -> list[str]:
        return [
            readline.get_history_item(i + 1)
            for i in range(readline.get_current_history_length())
            if readline.get_history_item(i + 1)
        ]

    readline.set_completer(
        SqlCompleter(
            tables or [],
            tables_fn=tables_fn,
            history_fn=history_fn,
            columns_fn=columns_fn,
        )
    )
    readline.set_completer_delims(" \t\n,;()")
    readline.parse_and_bind("tab: complete")


def _is_ddl(sql: str) -> bool:
    """DDL detected textually, like ``main.rs:114-126``."""
    head = sql.lstrip().split(None, 1)
    return bool(head) and head[0].upper() in ("CREATE", "DROP", "ALTER")


def _status_line(elapsed: float, stages: list[tuple[int, int, int]]) -> str:
    """One live progress line: elapsed seconds + per-active-stage task
    completion (the reference's background stats line,
    ``main.rs:282-301``; ours shows Spark stage progress instead of
    byte counters, which aren't observable mid-flight from the driver)."""
    parts = [f"{elapsed:.1f}s"]
    for sid, done, total in stages:
        parts.append(f"stage {sid}: {done}/{total} tasks")
    return " · ".join(parts)


def _needs_continuation(sql: str) -> bool:
    """True while the statement cannot be complete yet: inside an
    unterminated '…'/"…" literal or with unclosed parentheses
    (``--`` line comments ignored).  The multi-line-editing rule
    (reference roadmap README.md:303): pasting a formatted statement
    keeps buffering until it balances."""
    depth = 0
    quote: str | None = None
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if quote is not None:
            if ch == "\\":  # Spark SQL backslash escape: 'O\'Brien'
                i += 2
                continue
            if ch == quote:
                if i + 1 < n and sql[i + 1] == quote:  # SQL '' escape
                    i += 1
                else:
                    quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            nl = sql.find("\n", i)
            i = n if nl < 0 else nl
        elif ch == "/" and i + 1 < n and sql[i + 1] == "*":
            end = sql.find("*/", i + 2)  # bracketed comment
            if end < 0:
                return True  # unterminated comment: keep buffering
            i = end + 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        i += 1
    return quote is not None or depth > 0


class _live_status:
    """Context manager painting :func:`_status_line` to a TTY at 5 Hz
    while the query runs; silent when stdout is not a terminal (tests,
    pipes).  The line is erased before results print."""

    def __init__(self, spark, out=None, interval: float = 0.2):
        self._spark = spark
        self._out = out if out is not None else sys.stdout
        self._interval = interval
        self._stop = None
        self._thread = None

    def _stages(self) -> list[tuple[int, int, int]]:
        try:
            tracker = self._spark.sparkContext.statusTracker()
            out = []
            for sid in sorted(tracker.getActiveStageIds()):
                info = tracker.getStageInfo(sid)
                if info is not None:
                    out.append((sid, info.numCompletedTasks, info.numTasks))
            return out
        except Exception:
            return []

    def _run(self, t0: float) -> None:
        import threading  # noqa: F401  (imported for clarity; see __enter__)

        last_len = 0
        while not self._stop.wait(self._interval):
            line = _status_line(time.perf_counter() - t0, self._stages())
            pad = max(0, last_len - len(line))
            self._out.write("\r" + line + " " * pad)
            self._out.flush()
            last_len = len(line)
        if last_len:
            self._out.write("\r" + " " * last_len + "\r")
            self._out.flush()

    def __enter__(self):
        if not getattr(self._out, "isatty", lambda: False)():
            return self
        import threading

        self._stop = threading.Event()
        t0 = time.perf_counter()
        self._thread = threading.Thread(
            target=self._run, args=(t0,), daemon=True
        )
        self._thread.start()
        return self

    def __exit__(self, *exc):
        if self._thread is not None:
            self._stop.set()
            self._thread.join(timeout=2)
        return False


def repl(engine, zarr_tables: dict[str, str]) -> None:
    """Read-eval-print loop over ``engine.sql``.

    ``zarr_tables`` maps registered table name -> store path, used to
    print the A10 I/O stats line when a query's base table is a zarr
    store."""
    from zarr_datafusion_spark.highlight import highlight_sql
    from zarr_datafusion_spark.stats.io_stats import plan_scan_stats

    # memoized on the table-name set: N listColumns RPCs run only when
    # the catalog actually changed, not on every Tab keypress (r12
    # review finding — tens of tables made each Tab block noticeably)
    _cols_cache: dict = {"key": None, "cols": []}

    def _catalog_columns() -> list[str]:
        names = tuple(
            sorted(t.name for t in engine.spark.catalog.listTables())
        )
        if _cols_cache["key"] != names:
            cols: list[str] = []
            for name in names:
                try:
                    cols += [
                        c.name
                        for c in engine.spark.catalog.listColumns(name)
                    ]
                except Exception:
                    continue  # a view whose source vanished mid-session
            _cols_cache["key"] = names
            _cols_cache["cols"] = cols
        return _cols_cache["cols"]

    _setup_readline(
        list(zarr_tables),
        tables_fn=lambda: [t.name for t in engine.spark.catalog.listTables()],
        columns_fn=_catalog_columns,
    )
    tty = getattr(sys.stdout, "isatty", lambda: False)()
    fmt = "table"  # \format table|csv|json (reference README.md:305)
    buffer: list[str] = []
    while True:
        try:
            line = input("...> " if buffer else "zds> ")
        except KeyboardInterrupt:
            # Ctrl-C clears the current statement (rustyline behavior),
            # it does not kill the session
            print()
            buffer = []
            continue
        except EOFError:
            print()
            return
        if not buffer and line.strip().lower() in ("\\q", "quit", "exit"):
            return
        if not buffer and line.strip().lower() == "help":
            # reference CLI `help` (docs/CLI_REFERENCE.md:29-34)
            print(
                "Commands:\n"
                "  help                 show this message\n"
                "  quit / exit / \\q     exit the CLI\n"
                "  show tables / \\d     list all registered tables\n"
                "  .schema <table>      quick schema view\n"
                "  .history <repo>      icechunk commit log (newest first)\n"
                "  .refs <repo>         icechunk branches and tags\n"
                "  \\format [table|csv|json|parquet <path>]   result output format\n"
                "  DESCRIBE <table>     show a table's schema\n"
                "  EXPLAIN [ANALYZE|VERBOSE] <query>\n"
                "  CREATE EXTERNAL TABLE t STORED AS ZARR LOCATION '<path>'\n"
                "  COPY (query) TO 'path' STORED AS ZARR (COORDS '...')\n"
                "  any Spark SQL statement (terminate with ; or newline;"
                " trailing \\, open parens, or an open string continue)\n"
                "  large results page through $PAGER on a tty"
            )
            continue
        if not buffer and line.strip() == "\\d":
            # reference CLI `\d` = SHOW TABLES (docs/CLI_REFERENCE.md:33)
            line = "SHOW TABLES"
        stripped = line.strip()
        if not buffer and stripped.lower().startswith(".schema"):
            # reference roadmap `.schema <table>` (README.md:308) —
            # the quick view: one line per column, no result framing
            target = stripped.split(None, 1)[1:] or [""]
            try:
                for f in engine.spark.table(target[0].strip(" ;")).schema.fields:
                    nn = "" if f.nullable else " NOT NULL"
                    print(f"  {f.name}  {f.dataType.simpleString()}{nn}")
            except Exception as e:
                print(f"Error: {e}")
            continue
        if not buffer and stripped.lower().startswith((".history", ".refs")):
            # transactional-repo inspection: the git-log/git-branch
            # views over an icechunk repository (path or icechunk://)
            from zarr_datafusion_spark.zarr.icechunk import (
                history,
                list_refs,
                parse_icechunk_url,
            )

            target = (stripped.split(None, 1)[1:] or [""])[0].strip(" ;")
            # a ref'd URL (icechunk://repo@tag:v1) shows that ref's
            # history; bare paths and bare icechunk:// URLs show main
            # (ADVICE r11: the ref used to be passed through as part of
            # the filesystem path and fail with a confusing ENOENT)
            ref = None
            if target.startswith("icechunk://"):
                repo, ref = parse_icechunk_url(target)
            else:
                repo = target
            try:
                if stripped.lower().startswith(".history"):
                    for s in history(repo, ref):
                        print(
                            f"  {s['id']}  #{s['sequence']}  "
                            f"{s.get('message') or '(no message)'}"
                        )
                else:
                    refs = list_refs(repo)
                    for b, sid in sorted(refs["branches"].items()):
                        print(f"  branch {b} -> {sid}")
                    for t, sid in sorted(refs["tags"].items()):
                        print(f"  tag    {t} -> {sid}")
                    if not refs["branches"] and not refs["tags"]:
                        print("  (no refs)")
            except Exception as e:
                print(f"Error: {e}")
            continue
        if not buffer and stripped.lower().startswith("\\format"):
            # reference roadmap output formats (README.md:305);
            # bare \format prints the current mode
            parts = stripped.split()
            if len(parts) == 1:
                print(f"format: {fmt if isinstance(fmt, str) else 'parquet ' + fmt[1]}")
            elif parts[1].lower() in ("table", "csv", "json"):
                fmt = parts[1].lower()
                print(f"format: {fmt}")
            elif parts[1].lower() == "parquet" and len(parts) == 3:
                # the 4th roadmap output format: results land as a
                # parquet dataset at the given path (written by the
                # EXECUTORS — the one mode where a result larger than
                # the driver stays distributed end-to-end)
                fmt = ("parquet", parts[2])
                print(f"format: parquet -> {parts[2]}")
            else:
                print("usage: \\format [table|csv|json|parquet <path>]")
            continue
        if not line.strip():
            if not buffer:
                continue
            # escape hatch: an empty line FORCE-SUBMITS a buffering
            # statement unconditionally (a parse error beats an
            # inescapable prompt if the balance scanner and the
            # dialect ever disagree)
        else:
            buffer.append(line)
            # A trailing backslash continues the statement on the next
            # line (the reference uses rustyline's multiline editing;
            # '\' is the plain-stdin equivalent).
            if line.rstrip().endswith("\\"):
                buffer[-1] = line.rstrip()[:-1]
                continue
            # Multi-line query editing (reference roadmap
            # README.md:303): an open parenthesis or an unterminated
            # string keeps the statement buffering, so a formatted
            # query (CTEs, IN lists) pastes straight in without
            # per-line '\' markers.
            if _needs_continuation("\n".join(buffer)):
                continue
        sql = "\n".join(buffer).rstrip().rstrip(";")
        buffer = []
        if tty:
            # Syntax-colored echo of the statement above its result —
            # the post-hoc analog of the reference's live line
            # highlighting (readline can't restyle the buffer in
            # flight).  Token colors match highlight.rs.
            print(highlight_sql(sql))

        t0 = time.perf_counter()
        try:
            if sql.lower().startswith("explain analyze "):
                # metrics-annotated executed plan (reference EXPLAIN
                # ANALYZE, docs/CLI_REFERENCE.md:463-467)
                print(engine.explain_analyze(sql[len("explain analyze ") :]))
                print(f"({time.perf_counter() - t0:.3f}s)")
                continue
            if _is_ddl(sql):
                engine.sql(sql)  # handles STORED AS ZARR DDL rewrite too
                print(f"OK ({time.perf_counter() - t0:.3f}s)")
                continue
            df = engine.sql(sql)
            if isinstance(fmt, tuple):  # parquet sink mode: no collect
                path = fmt[1]
                with _live_status(engine.spark):
                    df.write.mode("overwrite").parquet(path)
                n = engine.spark.read.parquet(path).count()
                print(
                    f"{n} rows written to {path} "
                    f"({time.perf_counter() - t0:.3f}s)"
                )
                continue
            with _live_status(engine.spark):
                rows = df.collect()
            secs = time.perf_counter() - t0
        except Exception as e:  # session survives errors (integration_error.rs)
            print(f"Error: {e}")
            continue

        _emit_rows(df.columns, rows, fmt=fmt, tty=tty)
        scanned = _base_zarr_table(sql, zarr_tables)
        if engine.last_query_used_shortcut:
            kind = getattr(engine, "last_shortcut_kind", "scan_free")
            how = (
                "answered from statistics (no scan)"
                if kind == "scan_free"
                else "statistics rewrite (pruned scan)"
            )
            print(f"{len(rows)} rows · {how} · {secs:.3f}s")
        elif scanned:
            # Unpruned figures: REPL zarr views use the reuse-safe
            # (non-narrowing) pushdown default, so the full store is
            # what the scan actually read — printing filter-narrowed
            # numbers here would overstate the pruning (they were
            # accurate only while narrowing was unconditional).
            stats = plan_scan_stats(zarr_tables[scanned])
            print(
                f"{len(rows)} rows · {stats.n_arrays} arrays · "
                f"scan {stats.rows} cells · "
                + stats.format_line(secs).split(" · ", 2)[2]
            )
        else:
            print(f"{len(rows)} rows · {secs:.3f}s")


def _base_zarr_table(sql: str, zarr_tables: dict[str, str]) -> str | None:
    tokens = sql.replace(",", " ").split()
    for t in tokens:
        if t.strip("`\"'") in zarr_tables:
            return t.strip("`\"'")
    return None


def _format_table(columns: list[str], rows, max_rows: int | None = 40) -> str:
    shown = rows if max_rows is None else rows[:max_rows]
    cells = [[str(c) for c in columns]] + [
        ["NULL" if v is None else str(v) for v in r] for r in shown
    ]
    widths = [max(len(row[i]) for row in cells) for i in range(len(columns))]
    sep = "+-" + "-+-".join("-" * w for w in widths) + "-+"
    lines = [sep]
    lines.append(
        "| " + " | ".join(c.ljust(w) for c, w in zip(cells[0], widths)) + " |"
    )
    lines.append(sep)
    for row in cells[1:]:
        lines.append(
            "| " + " | ".join(c.ljust(w) for c, w in zip(row, widths)) + " |"
        )
    lines.append(sep)
    if max_rows is not None and len(rows) > max_rows:
        lines.append(f"... ({len(rows) - max_rows} more rows)")
    return "\n".join(lines)


def _print_rows(columns: list[str], rows, max_rows: int = 40) -> None:
    print(_format_table(columns, rows, max_rows))


def _page(text: str) -> bool:
    """Pipe ``text`` through $PAGER/less (reference roadmap
    ``README.md:309``); returns False when no pager could run (the
    caller prints normally)."""
    import shutil
    import subprocess

    pager = os.environ.get("PAGER") or "less"
    exe = shutil.which(pager.split()[0])
    if exe is None:
        return False
    try:
        subprocess.run(
            pager.split(),
            input=text.encode(),
            env={**os.environ, "LESS": os.environ.get("LESS", "-FRX")},
            check=False,
        )
        return True
    except OSError:
        return False


def _emit_rows(
    columns: list[str], rows, fmt: str = "table", tty: bool = False
) -> None:
    """Result presentation (reference roadmap output formats + pager,
    ``README.md:305,309``): csv/json emit EVERY row machine-readably;
    table view truncates at 40 rows — unless the session is
    interactive, where a large result pages through $PAGER in full."""
    if fmt == "csv":
        import csv
        import io as _io

        buf = _io.StringIO()
        w = csv.writer(buf, lineterminator="\n")
        w.writerow(columns)
        for r in rows:
            w.writerow(["" if v is None else v for v in r])
        print(buf.getvalue(), end="")
        return
    if fmt == "json":
        for r in rows:
            print(
                json.dumps(
                    {c: v for c, v in zip(columns, r)}, default=str
                )
            )
        return
    if tty and len(rows) > 40 and _page(_format_table(columns, rows, None)):
        return
    _print_rows(columns, rows)


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="zarr_datafusion_spark SQL shell")
    parser.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        help="directory of driver parquet tables to register",
    )
    parser.add_argument(
        "--zarr",
        action="append",
        default=[],
        metavar="NAME=PATH",
        help="register a Zarr store as a table (repeatable)",
    )
    parser.add_argument(
        "--flight",
        metavar="LOCATION",
        default=None,
        help="also serve the engine over Arrow Flight "
        "(e.g. grpc://127.0.0.1:8815; reference roadmap README.md:334)",
    )
    args = parser.parse_args(argv)

    from zarr_datafusion_spark.engine import Engine

    engine = Engine()
    engine.spark.sparkContext.setLogLevel("ERROR")
    tables = engine.register_parquet_dir(args.sf_dir)
    zarr_tables: dict[str, str] = {}
    for spec in args.zarr:
        name, _, path = spec.partition("=")
        if not path:
            print(f"bad --zarr spec (want NAME=PATH): {spec}", file=sys.stderr)
            sys.exit(2)
        engine.register_zarr(name, path)
        zarr_tables[name] = path

    if args.flight:
        from zarr_datafusion_spark.flight import start_server

        server, _t = start_server(engine, args.flight)
        print(f"Arrow Flight serving at {server.location}")

    print(f"zarr_datafusion_spark shell — {len(tables)} parquet tables"
          + (f", {len(zarr_tables)} zarr tables" if zarr_tables else "")
          + " registered. \\q to quit.")
    repl(engine, zarr_tables)


if __name__ == "__main__":
    main()
