"""SQL syntax highlighting + history hints for the REPL (A11 parity).

The reference colors REPL input with a sqlparser tokenizer and
nu-ansi-term styles and hints from history
(``src/bin/zarr_cli/highlight.rs:1-233``).  Python's ``readline``
cannot restyle the line buffer live, so the Spark CLI applies the same
token colors when echoing the statement back above its result table,
and surfaces history matches through tab-completion instead of inline
ghost text.  Same color scheme, same token classes, same
fall-back-to-plain-on-error contract.

Pure Python, no dependencies; every function is total (never raises on
arbitrary input — a highlighter that can crash the shell is worse than
no highlighter, ``highlight.rs:131-134`` makes the same call).
"""

from __future__ import annotations

import re

# ANSI styles mirroring highlight.rs Colors (keyword bold green,
# string/number yellow, operator blue, comment dark gray).
_RESET = "\x1b[0m"
_KEYWORD = "\x1b[1;32m"
_STRING = "\x1b[33m"
_NUMBER = "\x1b[33m"
_OPERATOR = "\x1b[34m"
_COMMENT = "\x1b[90m"

#: ANSI keywords Spark SQL + the custom ZARR word (highlight.rs:153-156
#: special-cases ZARR the same way).
KEYWORDS = frozenset(
    """
    select from where group by having order limit offset distinct all as
    and or not in is null like ilike rlike between exists any some case
    when then else end cast try_cast union intersect except inner left
    right full outer cross join on using natural semi anti lateral
    with recursive values insert into overwrite update delete create
    drop alter table view temporary temp replace if describe desc show
    explain analyze use set reset partition partitioned clustered sorted
    buckets stored options tblproperties comment asc desc nulls first
    last rollup cube grouping sets window over rows range unbounded
    preceding following current row true false interval day month year
    hour minute second to extract filter within ordinality pivot
    unpivot tablesample sample zarr
    """.split()
)

# Token regex, longest-match-first within alternatives.  Mirrors the
# token classes colorize_token handles (highlight.rs:146-192):
# comments, quoted strings (with '' / "" escapes), numbers, words,
# multi-char then single-char operators.
_TOKEN_RE = re.compile(
    r"""
    (?P<comment>--[^\n]*|/\*.*?(?:\*/|$))
  | (?P<string>'(?:[^']|'')*'?|"(?:[^"]|"")*"?)
  | (?P<number>\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+)
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<operator><=>|<<|>>|<>|!=|<=|>=|->>|->|\|\||[=<>+\-*/%&|^~!])
  | (?P<other>\s+|.)
    """,
    re.VERBOSE | re.DOTALL,
)


def highlight_sql(sql: str) -> str:
    """Return ``sql`` with ANSI colors per token class; the input
    string is returned unchanged (never raises) when anything about it
    resists tokenization."""
    try:
        out: list[str] = []
        for m in _TOKEN_RE.finditer(sql):
            text = m.group(0)
            kind = m.lastgroup
            if kind == "comment":
                out.append(f"{_COMMENT}{text}{_RESET}")
            elif kind == "string":
                out.append(f"{_STRING}{text}{_RESET}")
            elif kind == "number":
                out.append(f"{_NUMBER}{text}{_RESET}")
            elif kind == "word":
                if text.lower() in KEYWORDS:
                    out.append(f"{_KEYWORD}{text}{_RESET}")
                else:
                    out.append(text)  # identifier: default style
            elif kind == "operator":
                out.append(f"{_OPERATOR}{text}{_RESET}")
            else:
                out.append(text)
        colored = "".join(out)
        # Invariant the tests pin: stripping ANSI returns the input.
        return colored if strip_ansi(colored) == sql else sql
    except Exception:
        return sql


_ANSI_RE = re.compile(r"\x1b\[[0-9;]*m")


def strip_ansi(s: str) -> str:
    return _ANSI_RE.sub("", s)


def history_hint(line: str, history: list[str]) -> str | None:
    """Suffix of the most recent history entry extending ``line``
    (case-insensitive prefix match), or None.  Mirrors the reference's
    Hinter (highlight.rs:33-59): no hint under 2 chars, most recent
    entry wins, empty suffix suppressed."""
    if len(line) < 2:
        return None
    upper = line.upper()
    for entry in reversed(history):
        if entry.upper().startswith(upper) and len(entry) > len(line):
            return entry[len(line):]
    return None


class SqlCompleter:
    """readline tab-completer: SQL keywords, registered table names,
    their COLUMN names (reference roadmap ``README.md:301`` asks for
    tables/columns/keywords), and whole-line history continuations
    (the tab-key stand-in for the reference's inline ghost hint)."""

    def __init__(
        self,
        tables: list[str] | None = None,
        history: list[str] | None = None,
        tables_fn=None,
        history_fn=None,
        columns_fn=None,
    ):
        #: static seeds plus optional live providers — the REPL passes
        #: callables so statements typed THIS session and tables created
        #: by in-REPL DDL show up in completions (a startup snapshot
        #: would freeze both).
        self.tables = list(tables or [])
        self.history = history if history is not None else []
        self.tables_fn = tables_fn
        self.history_fn = history_fn
        self.columns_fn = columns_fn
        self._matches: list[str] = []

    def _live_tables(self) -> list[str]:
        extra: list[str] = []
        if self.tables_fn is not None:
            try:
                extra = list(self.tables_fn())
            except Exception:
                pass
        return self.tables + [t for t in extra if t not in self.tables]

    def _live_history(self) -> list[str]:
        extra: list[str] = []
        if self.history_fn is not None:
            try:
                extra = list(self.history_fn())
            except Exception:
                pass
        return self.history + [h for h in extra if h not in self.history]

    def _live_columns(self) -> list[str]:
        if self.columns_fn is None:
            return []
        try:
            return list(self.columns_fn())
        except Exception:
            return []

    def _buffer(self, text: str) -> str:
        try:
            import readline

            return readline.get_line_buffer()
        except Exception:
            return text

    def __call__(self, text: str, state: int) -> str | None:
        try:
            if state == 0:
                seen: set[str] = set()
                matches: list[str] = []
                low = text.lower()
                # Whole-line history continuation when completing at the
                # start of the statement (the reference's inline hint).
                if self._buffer(text) == text:
                    hint = history_hint(text, self._live_history())
                    if hint is not None:
                        matches.append(text + hint)
                        seen.add(text + hint)
                for cand in (
                    self._live_tables()
                    + self._live_columns()
                    + sorted(KEYWORDS)
                ):
                    if cand.lower().startswith(low) and cand not in seen:
                        seen.add(cand)
                        matches.append(
                            cand.upper() if cand in KEYWORDS and text[:1].isupper() else cand
                        )
                self._matches = matches
            return self._matches[state]
        except Exception:
            return None
