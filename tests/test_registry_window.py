"""Guards for the driver-contract registry ordering in
``__spark_entry__`` (the driver records correctness for exactly the
first 50 slots each round, so ordering IS contract — VERDICT r3 item
5).  Since round 6 the window is COMPUTED from the checked-in
CORRECTNESS_r*.json files plus the per-round RE_RECORD declaration
(VERDICT r5 item 4) — these tests pin the computation's invariants
instead of a curated name list."""

from __future__ import annotations

import __spark_entry__ as E


def test_window_is_all_oracle_backed():
    qs, oracles = E._registries()
    window = list(qs)[: E.WINDOW]
    assert all(n in oracles for n in window), [
        n for n in window if n not in oracles
    ]


def test_every_oracle_entry_recorded_or_in_window():
    """The record contract: an oracle-backed entry either already holds
    a green driver record (any round) or sits inside the checked window
    so it earns one this round.  With the computed rotation this cannot
    fail by omission — the test guards against WINDOW shrinking or the
    ordering code regressing."""
    qs, oracles = E._registries()
    green = E._latest_green_round()
    window = set(list(qs)[: E.WINDOW])
    missing = [
        n for n in qs if n in oracles and n not in green and n not in window
    ]
    assert not missing, missing


def test_re_record_entries_inside_window():
    """Entries declared code-changed this round re-record — unless the
    window is saturated by strictly-more-urgent entries (first records,
    the freshness floor, staler stale entries).  A deferred entry keeps
    its fingerprint mismatch, so it re-derives and leads the rotation
    next round; what may NEVER happen is a standing (fresh-fingerprint,
    green) entry holding a slot while a declared-stale entry waits."""
    import math

    from zarr_datafusion_spark import fingerprints as FP

    qs, oracles = E._registries()
    green = E._latest_green_round()
    window = list(qs)[: E.WINDOW]
    deferred = set(E.RE_RECORD) - set(window)
    if not deferred:
        return
    changed = FP.changed_since_record(
        green, FP.compute_fingerprints(qs, E.oracle_sql())
    )
    recorded = [n for n in qs if n in oracles and n in green]
    latest = max((green[n] for n in recorded), default=0)
    cycle = math.ceil(len(recorded) / E.WINDOW) if recorded else 1
    urgent = {n for n in recorded if green[n] < (latest + 1) - cycle}
    standing_in_window = [
        n
        for n in window
        if n in green
        and n not in E.RE_RECORD
        and n not in changed
        and n not in urgent
    ]
    assert not standing_in_window, (
        f"RE_RECORD entries {sorted(deferred)} deferred while standing "
        f"entries hold window slots: {standing_in_window}"
    )


def test_need_entries_lead_the_window():
    """First-record entries, stale entries (RE_RECORD + mechanically
    fingerprint-flagged), and about-to-become-ancient entries (VERDICT
    r11 item 1) occupy the FRONT of the registry — a driver that checks
    fewer than WINDOW slots still records the entries that need it
    most."""
    import math

    from zarr_datafusion_spark import fingerprints as FP

    qs, oracles = E._registries()
    green = E._latest_green_round()
    changed = FP.changed_since_record(
        green, FP.compute_fingerprints(qs, E.oracle_sql())
    )
    names = list(qs)
    recorded = [n for n in names if n in oracles and n in green]
    latest = max((green[n] for n in recorded), default=0)
    cycle = math.ceil(len(recorded) / E.WINDOW) if recorded else 1
    urgent = {n for n in recorded if green[n] < (latest + 1) - cycle}
    need = {
        n
        for n in names
        if n in oracles
        and (
            n not in green
            or n in E.RE_RECORD
            or n in changed
            or n in urgent
        )
    }
    head = names[: min(len(need), E.WINDOW)]
    assert all(n in need for n in head), [n for n in head if n not in need]


def test_changed_entries_outrank_freshness_floor():
    """VERDICT r14 item 1: a stale record on CHANGED code is strictly
    less safe than a stale-but-unchanged record, so within the stale
    block every changed/RE_RECORD entry must precede every urgent-only
    (freshness-floor) entry — under window saturation the changed code
    re-records first."""
    import math

    from zarr_datafusion_spark import fingerprints as FP

    qs, oracles = E._registries()
    green = E._latest_green_round()
    changed = FP.changed_since_record(
        green, FP.compute_fingerprints(qs, E.oracle_sql())
    )
    names = list(qs)
    recorded = [n for n in names if n in oracles and n in green]
    latest = max((green[n] for n in recorded), default=0)
    cycle = math.ceil(len(recorded) / E.WINDOW) if recorded else 1
    urgent = {n for n in recorded if green[n] < (latest + 1) - cycle}
    changed_all = set(E.RE_RECORD) | set(changed)
    urgent_only = urgent - changed_all
    if not changed_all or not urgent_only:
        return
    positions = {n: i for i, n in enumerate(names)}
    last_changed = max(positions[n] for n in changed_all if n in positions)
    first_urgent_only = min(
        positions[n] for n in urgent_only if n in positions
    )
    assert last_changed < first_urgent_only, (
        "urgent-only entry holds a slot ahead of a changed entry: "
        f"changed ends at {last_changed}, urgent-only starts at "
        f"{first_urgent_only}"
    )


def test_standing_entries_fill_window_stalest_first():
    """Standing = green, not hand-declared (RE_RECORD), and not
    mechanically fingerprint-flagged — the flagged set sorts into the
    stale block at the window front, same as RE_RECORD."""
    from zarr_datafusion_spark import fingerprints as FP

    qs, oracles = E._registries()
    green = E._latest_green_round()
    changed = FP.changed_since_record(
        green, FP.compute_fingerprints(qs, E.oracle_sql())
    )
    names = list(qs)
    standing = [
        n
        for n in names
        if n in oracles
        and n in green
        and n not in E.RE_RECORD
        and n not in changed
    ]
    rounds = [green[n] for n in standing]
    assert rounds == sorted(rounds), "standing entries not stalest-first"


def test_oracles_subset_of_queries_and_nonempty_sql():
    qs, _ = E._registries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(sql.strip() for sql in oracles.values())


def test_rows_only_entries_are_last():
    qs, oracles = E._registries()
    names = list(qs)
    # r13: sim_kmeans_train gained its oracle, so the registry may be
    # FULLY oracle-backed — the ordering contract is then vacuous
    first_rows_only = next(
        (i for i, n in enumerate(names) if n not in oracles), len(names)
    )
    assert all(n not in oracles for n in names[first_rows_only:])


def _fp_module(helper_body: str, doc: str = "d", const: str = "X"):
    """Build a throwaway in-package module with an entry that calls a
    helper and references a module constant — the shapes fingerprinting
    must be sensitive to."""
    import sys
    import types

    src = f'''
CONST = {const!r}

def helper(x):
    {helper_body}

def entry(spark, sf_dir):
    """{doc}"""
    return helper(CONST)
'''
    mod = types.ModuleType("zarr_datafusion_spark._fp_probe")
    sys.modules[mod.__name__] = mod
    exec(src, mod.__dict__)
    mod.helper.__module__ = mod.__name__
    mod.entry.__module__ = mod.__name__
    return mod


def test_fingerprint_sensitivity():
    """The mechanized RE_RECORD detection (VERDICT r6 item 4) must see
    through to SHARED HELPERS and MODULE CONSTANTS — the two r6 cases
    (gram-fallback oracle text, localCheckpoint helper) — while staying
    blind to docstring/comment edits (else every doc pass reflags 124
    entries)."""
    from zarr_datafusion_spark.fingerprints import entry_fingerprint

    base = entry_fingerprint(_fp_module("return x + 1").entry, "SELECT 1")
    # helper body change -> different digest (the entry's own source
    # is unchanged)
    assert entry_fingerprint(_fp_module("return x + 2").entry, "SELECT 1") != base
    # module-constant change -> different digest
    assert (
        entry_fingerprint(_fp_module("return x + 1", const="Y").entry, "SELECT 1")
        != base
    )
    # oracle text change -> different digest
    assert entry_fingerprint(_fp_module("return x + 1").entry, "SELECT 2") != base
    # docstring-only change -> SAME digest
    assert (
        entry_fingerprint(_fp_module("return x + 1", doc="other").entry, "SELECT 1")
        == base
    )


def test_fingerprint_sees_function_local_imports():
    """The codebase's dominant helper style is a FUNCTION-LOCAL import
    (``from pkg.mod import helper`` inside the body) — the traversal
    must follow the dotted module path from co_names into the helper
    module, or it is blind to most real helpers (the r7 sink-bound
    change was invisible to the shallow version)."""
    import sys
    import types

    from zarr_datafusion_spark.fingerprints import entry_fingerprint

    def build(helper_body: str):
        helper_mod = types.ModuleType("zarr_datafusion_spark._fp_probe_helper")
        sys.modules[helper_mod.__name__] = helper_mod
        exec(f"def shared(x):\n    {helper_body}\n", helper_mod.__dict__)
        helper_mod.shared.__module__ = helper_mod.__name__

        entry_mod = types.ModuleType("zarr_datafusion_spark._fp_probe_entry")
        sys.modules[entry_mod.__name__] = entry_mod
        exec(
            "def entry(spark, sf_dir):\n"
            "    from zarr_datafusion_spark._fp_probe_helper import shared\n"
            "    return shared(1)\n",
            entry_mod.__dict__,
        )
        entry_mod.entry.__module__ = entry_mod.__name__
        return entry_mod.entry

    a = entry_fingerprint(build("return x * 2"), "SELECT 1")
    b = entry_fingerprint(build("return x * 3"), "SELECT 1")
    assert a != b, "locally-imported helper change not seen"


def test_fingerprint_snapshot_current():
    """REGISTRY_FINGERPRINTS.json must equal the computed fingerprints
    — the snapshot is the git-historical baseline the staleness check
    reads at each round commit, so it may never lag the code.  On
    failure: run ``python scripts/update_fingerprints.py`` AND add the
    changed entries to RE_RECORD (the mechanical check only covers
    rounds whose commits carry a snapshot)."""
    import json
    import os

    from zarr_datafusion_spark import fingerprints as FP

    qs, oracles = E._registries()
    computed = FP.compute_fingerprints(qs, oracles)
    path = os.path.join(FP._REPO_ROOT, FP.FINGERPRINTS_FILE)
    with open(path) as f:
        snapshot = json.load(f)
    drifted = sorted(
        n
        for n in set(snapshot) | set(computed)
        if snapshot.get(n) != computed.get(n)
    )
    assert not drifted, (
        f"stale fingerprint snapshot for {drifted}: run "
        "scripts/update_fingerprints.py and declare these in RE_RECORD"
    )


def test_staged_mutation_is_caught(monkeypatch):
    """End-to-end mechanism check (VERDICT item 4's done-bar): simulate
    a green-recorded entry whose code changed after its record — the
    historical snapshot carries a different digest — and assert the
    registry puts it at the head of the checked window WITHOUT any
    RE_RECORD declaration."""
    from zarr_datafusion_spark import fingerprints as FP

    green = E._latest_green_round()
    qs, oracles = E._registries()
    # pick a green oracle-backed entry with no hand declaration
    victim = next(
        n for n in qs if n in oracles and n in green and n not in E.RE_RECORD
    )

    real = FP.compute_fingerprints(qs, oracles)

    def fake_recorded(round_no):
        snap = dict(real)
        snap[victim] = "0" * 32  # the digest the record was taken against
        return snap

    monkeypatch.setattr(FP, "recorded_fingerprints", fake_recorded)
    FP._recorded_cache.clear()
    changed = FP.changed_since_record(green, real)
    assert victim in changed
    # and the registry ordering reacts: victim joins the need head
    window = list(E._registries()[0])[: E.WINDOW]
    assert victim in window, "mechanically-flagged entry missed the window"


def test_no_function_local_relative_imports():
    """``fingerprints._collect`` follows function-local imports through
    the DOTTED module path in co_names; a function-local RELATIVE
    import (``from .x import h``) compiles to a bare module name and
    would be invisible to the staleness net (ADVICE r7).  Forbid the
    pattern package-wide — module-level relative imports are fine
    (resolved via module globals)."""
    import ast
    import os

    import zarr_datafusion_spark as pkg

    root = os.path.dirname(pkg.__file__)
    offenders = []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as f:
                tree = ast.parse(f.read(), filename=path)
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    for sub in ast.walk(node):
                        if isinstance(sub, ast.ImportFrom) and sub.level > 0:
                            offenders.append(f"{path}:{sub.lineno}")
    assert not offenders, (
        "function-local relative imports escape fingerprinting; use the "
        f"absolute dotted form: {offenders}"
    )


def test_refresh_floor_no_ancient_green_records():
    """Standing rotation invariant (VERDICT r7 item 6, re-cut per
    VERDICT r11 item 1): every green oracle-backed entry refreshes at
    least every ceil(n_green / WINDOW) rounds.  Asserted against
    ``latest + 1`` — the round the driver is ABOUT to write — so the
    builder sees a would-be violation DURING the round that creates it,
    not after the driver file lands: any entry whose record would be
    ancient at latest+1 must sit inside the checked window now (it will
    then refresh in this round's CORRECTNESS file)."""
    import math

    green = E._latest_green_round()
    qs, oracles = E._registries()
    rounds = {n: r for n, r in green.items() if n in oracles and n in qs}
    latest = max(rounds.values())
    cycle = math.ceil(len(rounds) / E.WINDOW)
    window = set(list(qs)[: E.WINDOW])
    stranded = sorted(
        n
        for n, r in rounds.items()
        if r < (latest + 1) - cycle and n not in window
    )
    assert not stranded, (
        f"records that become ancient at r{latest + 1} are outside the "
        f"checked window — the stalest-first rotation stalled: {stranded}"
    )


def test_green_parser_reads_driver_records():
    """The rotation's input parser must see the real driver files: r5
    recorded 50 green rows, so the union across rounds is well past the
    window size and includes multi-round entries."""
    green = E._latest_green_round()
    assert len(green) > E.WINDOW
    # a known r5-green entry parsed with the right round
    assert green.get("zarr_scan_flatten", 0) >= 5
