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
    """Entries declared code-changed this round must re-record."""
    qs, _ = E._registries()
    window = set(list(qs)[: E.WINDOW])
    assert set(E.RE_RECORD) <= window, set(E.RE_RECORD) - window


def test_need_entries_lead_the_window():
    """First-record entries and stale (RE_RECORD) entries occupy the
    FRONT of the registry — a driver that checks fewer than WINDOW
    slots still records the entries that need it most."""
    qs, oracles = E._registries()
    green = E._latest_green_round()
    names = list(qs)
    n_need = sum(
        1
        for n in names
        if n in oracles and (n not in green or n in E.RE_RECORD)
    )
    head = names[:n_need]
    assert all(n not in green or n in E.RE_RECORD for n in head), head


def test_standing_entries_fill_window_stalest_first():
    qs, oracles = E._registries()
    green = E._latest_green_round()
    names = list(qs)
    standing = [
        n
        for n in names
        if n in oracles and n in green and n not in E.RE_RECORD
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
    first_rows_only = next(i for i, n in enumerate(names) if n not in oracles)
    assert all(n not in oracles for n in names[first_rows_only:])


def test_green_parser_reads_driver_records():
    """The rotation's input parser must see the real driver files: r5
    recorded 50 green rows, so the union across rounds is well past the
    window size and includes multi-round entries."""
    green = E._latest_green_round()
    assert len(green) > E.WINDOW
    # a known r5-green entry parsed with the right round
    assert green.get("zarr_scan_flatten", 0) >= 5
