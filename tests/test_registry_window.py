"""Guards for the driver-contract registry ordering in
``__spark_entry__`` (the driver records correctness for roughly the
first 50 slots only, so ordering IS contract — VERDICT r3 item 5)."""

from __future__ import annotations

import __spark_entry__ as E

#: Entries that need their FIRST green driver record (or a fresh one
#: after a code-path change) as of round 5 — they must sit inside the
#: ~50-slot checked window until CORRECTNESS_r05 records them.
ROTATED_IN = {
    # rows-only -> full value oracle upgrades (md5-deterministic hash
    # families, VERDICT r4 item 1) — first-ever hash records
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ann_lsh",
    # new r5 operators
    "scale_ranked_two_pass",
    "tpch_q17_small_quantity",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_supplier",
    # freshness rotation (VERDICT r4 item 3): code paths changed in r5
    # (LSH candidate generator / deterministic salt / zscore guard),
    # so their newest green record predates the change
    "dedup_ngram_jaccard",
    "dedup_components",
    "pipeline_curate",
    "scale_salted_agg",
    "event_anomaly_zscore",
    "scale_salted_join",
    # late-r5 operators
    "scale_bloom_join",
    "bpe_pair_counts",
    "text_unigram_logprob",
    "text_encode_ids",
    "zarr_range_pushdown",
    "sim_topk_pq_adc",
    "asof_interpolate",
    "data_mixture_plan",
    "profile_numeric_columns",
    "event_markov_transitions",
    "sample_weighted_priority",
}

#: r4 first-record entries whose implementing functions are untouched
#: in r5 — they keep their slots simply because nothing displaced
#: them; their r4 green rows already satisfy the record contract.
FIX_PROOF = {
    "asof_join",
    "range_join",
    "scalar_functions",
    "agg_grouping_ext",
    "win_ranking",
    "win_offset_frames",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "cte_subquery",
    "sim_ann_ivf",
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
