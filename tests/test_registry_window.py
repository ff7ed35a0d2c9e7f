"""Guards for the driver-contract registry ordering in
``__spark_entry__`` (the driver records correctness for roughly the
first 50 slots only, so ordering IS contract — VERDICT r3 item 5)."""

from __future__ import annotations

import __spark_entry__ as E

#: Entries that had no green driver record across rounds 1-3 and were
#: rotated into the checked window in round 4.  They must stay there
#: until a green CORRECTNESS row exists for each.
ROTATED_IN = {

    "text_contamination",
    "agg_pivot",
    "agg_unpivot",
    "streaming_join",
    "sample_stratified",
    "topk_per_group",
    # r4 rows-only -> oracle-backed upgrades (no prior green record)
    "sim_ann_ivf",
    "streaming_sliding_windows",
    "sessionize_stateful_stream",
    "mm_synthesize",
    "mm_resize",
    "text_langid_heuristic",
    # new r4 operators
    "text_repetition_signals",
    "pii_redact",
    "pack_sequences",
    "corpus_upsert",
    "tpch_q6_forecast_revenue",
    "subquery_correlated",
    "dedup_bloom_prefilter",
    "quota_sample_per_lang",
    "text_oov_rate",
    "embedding_project",
    "mm_audio_windows",
    "event_funnel",
    "event_retention_cohorts",
    "text_heavy_hitters_cms",
    "agg_approx_percentile",
    "text_token_windows_udtf",
    "event_anomaly_zscore",
    "scale_salted_join",
    "tpch_q4_order_priority",
    "tpch_q12_shipmode_priority",
}

#: Entries restored by the round-4 events.ts fix — their r4 green row
#: proves the regression fix, so they also must stay in-window.
FIX_PROOF = {
    "asof_join",
    "range_join",
    "sessionize_events",
    "scalar_functions",
    "agg_grouping_ext",
    "win_ranking",
    "win_offset_frames",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "cte_subquery",
    "streaming_window_counts",
}


def test_window_is_all_oracle_backed():
    qs, oracles = E._registries()
    window = list(qs)[:50]
    assert all(n in oracles for n in window), [
        n for n in window if n not in oracles
    ]


def test_rotated_entries_inside_window():
    window = set(list(E._registries()[0])[:50])
    assert ROTATED_IN <= window, ROTATED_IN - window
    assert FIX_PROOF <= window, FIX_PROOF - window


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
