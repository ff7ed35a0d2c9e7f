"""Mechanical change detection for the driver-contract registry
(VERDICT r6 "What's wrong" #3 / Next-round item 4).

The driver records a correctness result for the first ``WINDOW``
registry slots each round; an entry whose code or oracle changed AFTER
its last green record holds a record that no longer covers the shipped
code.  Round 6 relied on the builder hand-declaring such entries in
``__spark_entry__.RE_RECORD`` — honesty-dependent, so a forgotten
declaration left a stale green record silently counting as correct.

This module makes detection mechanical:

* :func:`entry_fingerprint` hashes an entry's TRANSITIVE in-package
  call graph — the function's bytecode, every package-internal function
  it (recursively) references, and every module-level constant it names
  (SQL strings, expression templates) — plus its oracle text.
  Bytecode-based hashing is comment/docstring-insensitive, so doc-only
  edits don't reflag 124 entries, while a change to a SHARED helper
  (the r6 gram-fallback / localCheckpoint cases) reflags every entry
  that reaches it.
* :func:`compute_fingerprints` produces the full entry->digest map;
  the snapshot lives in ``REGISTRY_FINGERPRINTS.json`` at the repo
  root (regenerate with ``python scripts/update_fingerprints.py``; a
  test pins file == computed so the snapshot cannot go stale).
* :func:`recorded_fingerprints` reads the snapshot AS OF a given
  round's driver commit (``git show <round-commit>:...``) — the code
  state the driver's records were taken against.

``__spark_entry__._registries`` unions the mechanically-changed set
into the re-record rotation, so "forgot to declare" is no longer a
failure mode; the hand dict remains only to carry human-readable
reasons.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import types

_PKG = "zarr_datafusion_spark"

FINGERPRINTS_FILE = "REGISTRY_FINGERPRINTS.json"

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _code_names(code) -> set[str]:
    """All global names referenced by a code object, including from
    nested code objects (lambdas, comprehensions, inner defs)."""
    names: set[str] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        names.update(c.co_names)
        for k in c.co_consts:
            if isinstance(k, types.CodeType):
                stack.append(k)
    return names


def _hash_code(code, doc, parts: list[bytes]) -> None:
    """Bytecode + names + non-docstring constants, recursing into
    nested code objects.  Comments never reach bytecode; the docstring
    is skipped explicitly so doc-only edits don't change the digest."""
    parts.append(code.co_code)
    parts.append(",".join(code.co_names).encode())
    parts.append(",".join(code.co_varnames).encode())
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            _hash_code(c, None, parts)
        elif c is not None and c != doc:
            parts.append(repr(c).encode())


def _collect(obj, seen: set[int], parts: list[bytes]) -> None:
    """Transitively hash ``obj`` (function or class) and every
    package-internal global it references."""
    if id(obj) in seen:
        return
    seen.add(id(obj))

    if isinstance(obj, type):
        for attr in sorted(vars(obj)):
            v = vars(obj)[attr]
            if callable(v) and getattr(v, "__code__", None) is not None:
                _collect(v, seen, parts)
        return

    code = getattr(obj, "__code__", None)
    if code is None:
        return
    _hash_code(code, getattr(obj, "__doc__", None), parts)

    mod = sys.modules.get(getattr(obj, "__module__", None) or "")
    if mod is None:
        return
    # Resolution scope: the defining module PLUS any package module the
    # code imports FUNCTION-LOCALLY (`from pkg.mod import helper` inside
    # the body — the dominant style in this codebase).  A local import
    # compiles to IMPORT_NAME with the dotted module path in co_names
    # (not a module global), so without this the traversal is blind to
    # most helpers.
    import importlib

    scopes = [mod]
    for dotted in sorted(n for n in _code_names(code) if n.startswith(_PKG)):
        try:
            scopes.append(importlib.import_module(dotted))
        except ImportError:
            pass
    for name in sorted(_code_names(code)):
        g = next(
            (
                v
                for v in (getattr(m, name, None) for m in scopes)
                if v is not None
            ),
            None,
        )
        if g is None or isinstance(g, types.ModuleType):
            continue
        gmod = getattr(g, "__module__", None)
        if callable(g) and isinstance(gmod, str) and gmod.startswith(_PKG):
            _collect(g, seen, parts)
        elif isinstance(g, frozenset):
            # sorted repr: set iteration order varies with hash
            # randomization across interpreter runs
            parts.append(f"{name}={sorted(map(repr, g))!r}".encode())
        elif isinstance(g, (str, bytes, int, float, bool, tuple)):
            # module-level constants: shared SQL strings, expression
            # templates, thresholds — semantic inputs to the entry
            parts.append(f"{name}={g!r}".encode())


def entry_fingerprint(fn, oracle_text: str = "") -> str:
    """Digest of an entry's in-package call-graph semantics + oracle."""
    parts: list[bytes] = [oracle_text.encode()]
    _collect(fn, set(), parts)
    return hashlib.md5(b"\x00".join(parts)).hexdigest()


def compute_fingerprints(queries: dict, oracles: dict) -> dict[str, str]:
    """entry name -> fingerprint for the whole registry (rows-only
    entries hash with an empty oracle)."""
    return {
        name: entry_fingerprint(fn, oracles.get(name, ""))
        for name, fn in queries.items()
    }


def _round_commit(round_no: int | None) -> str | None:
    """Hash of the driver's ``round N: verdict/...`` commit — the code
    state round N's correctness records were taken against.  ``None``
    finds the LATEST round commit (the previous round boundary)."""
    if round_no is None:
        grep = ["-E", "--grep=round [0-9]+: verdict"]
    else:
        grep = ["-F", f"--grep=round {round_no}: verdict"]
    try:
        out = subprocess.run(
            ["git", "log", "--format=%H", *grep, "-1"],
            cwd=_REPO_ROOT,
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.SubprocessError):
        return None
    h = out.stdout.strip()
    return h or None


def file_at_round_commit(
    rel_path: str, round_no: int | None = None
) -> str | None:
    """Contents of ``rel_path`` as committed at a round boundary
    (latest boundary when ``round_no`` is None), or None when git, the
    commit, or the file is unavailable — never raises.  bench.py's
    probe-normalization reads its previous-round artifact through this
    (r13 review: it had re-implemented the plumbing)."""
    commit = _round_commit(round_no)
    if not commit:
        return None
    try:
        out = subprocess.run(
            ["git", "show", f"{commit}:{rel_path}"],
            cwd=_REPO_ROOT,
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.SubprocessError):
        return None
    return out.stdout if out.returncode == 0 else None


_recorded_cache: dict[int, dict | None] = {}


def recorded_fingerprints(round_no: int) -> dict[str, str] | None:
    """The fingerprint snapshot as committed at round ``round_no``'s
    driver commit, or ``None`` when unavailable (pre-r7 rounds predate
    the snapshot; missing git degrades to None, never an error)."""
    if round_no in _recorded_cache:
        return _recorded_cache[round_no]
    result = None
    commit = _round_commit(round_no)
    if commit:
        try:
            out = subprocess.run(
                ["git", "show", f"{commit}:{FINGERPRINTS_FILE}"],
                cwd=_REPO_ROOT,
                capture_output=True,
                text=True,
                timeout=30,
            )
            if out.returncode == 0:
                result = json.loads(out.stdout)
        except (OSError, subprocess.SubprocessError, ValueError):
            result = None
    _recorded_cache[round_no] = result
    return result


def changed_since_record(
    green: dict[str, int], current: dict[str, str]
) -> set[str]:
    """Entries whose current fingerprint differs from the snapshot at
    their latest green round — the mechanically-derived RE_RECORD set.
    Entries from rounds without a committed snapshot are skipped (their
    staleness, if any, was covered by that round's hand declarations)."""
    changed: set[str] = set()
    for name, rnd in green.items():
        if name not in current:
            continue
        snap = recorded_fingerprints(rnd)
        if snap is None:
            continue
        old = snap.get(name)
        if old is not None and old != current[name]:
            changed.add(name)
    return changed
