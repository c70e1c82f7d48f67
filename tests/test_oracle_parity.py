"""Mini-driver: replicate the correctness gate locally.

For every key in __spark_entry__.queries() that has an oracle_sql()
entry, run both at sf0.001 and compare row count, column names, and
values (order-insensitive, columns sorted by name — the driver's
contract).  Keys without an oracle get a determinism check (two runs,
identical rows).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from .conftest import SF_DIR, register_views


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name}.{c}[{i}]: {x!r} != {y!r} (float, exact)"
            else:
                assert str(x) == str(y), f"{name}.{c}[{i}]: {x!r} != {y!r}"


# Oracled keys where an empty result would make the hash-match vacuous
# (a broken dot product / join would still "pass" on 0 == 0 rows).
_MUST_BE_NONEMPTY = {
    "dedup_embedding", "dedup_ngram_jaccard", "similarity_topk",
    "dedup_components", "dedup_near_keep", "corpus_curation",
    "corpus_pack_blocks", "pii_redact", "text_repetition",
    "events_retention", "events_funnel", "corpus_decontaminate",
    "corpus_mixture", "events_spike_hours", "tokenizer_merges",
    "tpch_q15", "tpch_q22", "similarity_filtered_topk",
    "text_rarity_score", "corpus_shuffle_order", "events_histogram",
    "dedup_spans", "corpus_quality_gate", "corpus_source_stats",
    "similarity_range_search", "text_clean",
    "tpch_q2", "tpch_q9", "tpch_q11", "tpch_q12", "tpch_q16",
    "tpch_q20", "tpch_q21",
    "dedup_minhash_exact", "dedup_edit_distance", "similarity_knn_join",
    "corpus_cap_per_source", "dedup_component_stats",
    "embedding_label_centroids", "embedding_quantize_sq8",
    "corpus_lang_source_matrix", "corpus_length_deciles",
    "events_user_growth", "events_rolling_active_users",
    "pii_stats_by_source", "basket_pairs", "corpus_datasheet", "orders_rfm",
    "multimodal_features", "multimodal_resize", "multimodal_frames",
    "skew_salted_join", "skew_salted_agg", "corpus_e2e_factory",
    "corpus_decontaminate_lsh", "dedup_simhash_exact", "events_inter_arrival",
    "corpus_chunk_windows", "events_transitions", "text_token_coverage",
    "corpus_mixture_temperature", "split_group_safe", "corpus_token_budget",
    "embedding_centroid_assign", "text_hash_features",
    # round 4
    "events_anomaly_zscore", "events_user_entropy", "orders_cohort_ltv",
    "dedup_minhash_estimate", "dedup_ngram_novelty",
    "corpus_contamination_score", "corpus_keep_best_quality",
    "dedup_containment", "events_funnel_windowed",
    # round 6: ANN paths moved from rows-only to oracled (deterministic
    # seeded centroids / fixed hyperplane lattice)
    "similarity_ivf_topk", "similarity_lsh_topk", "similarity_mmr_topk",
    "similarity_recall_report", "corpus_pack_greedy",
    "tokenizer_bpe_train", "tokenizer_bpe_encode",
    "multimodal_dedup", "corpus_field_profile", "corpus_interleave_shards",
    "embedding_pq_encode", "similarity_pq_adc_topk",
    # round 6 new operators
    "dedup_semantic", "corpus_importance_weights",
    "similarity_pq_rerank_topk", "corpus_curation_semantic",
    "corpus_dsir_resample", "corpus_drift_tv", "events_cms_heavy_hitters",
    "events_hll_set_algebra", "events_ts_motif_topk",
    "events_ts_discord_topk", "events_ts_seasonality",
    "events_approx_distinct", "corpus_ngram_lm_score",
    "corpus_nb_lang_classifier",
    # round 7
    "privacy_k_anonymity", "corpus_lm_quality_buckets",
    # round 7 batch 2: warehouse + time-series + association rules
    "scd2_user_attr", "bloom_semi_join", "basket_lift",
    "events_ts_changepoint", "events_ts_ewma", "events_ts_holt",
    "orders_abc_pareto", "embedding_pca_power", "text_tfidf_topk",
    "events_outlier_mad", "quality_expectations",
    "events_bitmap_overlap", "split_temporal", "embedding_pca_project",
    "dedup_graph_pagerank", "corpus_cluster_topics", "events_attribution",
    "events_session_paths", "dedup_lsh_recall_report", "text_bm25_search",
    "text_readability", "events_ts_forecast_backtest", "orders_benford_audit",
    "corpus_langid_confusion", "events_conversion_time",
    "dedup_lsh_power_curve", "events_slo_burn", "corpus_cluster_coherence",
    "events_growth_accounting", "supplier_concentration_hhi",
    "orders_revenue_gini", "corpus_length_quality_corr",
    "events_alert_episodes", "corpus_vocab_growth", "dedup_source_overlap",
}


def _keys():
    import __spark_entry__ as entry

    return sorted(entry.queries().keys())


@pytest.mark.parametrize("key", _keys())
def test_query_matches_oracle(key, spark, duck):
    import __spark_entry__ as entry

    q = entry.queries()[key]
    oracles = entry.oracle_sql()
    sdf = q(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if key in oracles:
        register_views(duck, SF_DIR)
        duck_pdf = duck.execute(oracles[key]).fetchdf()
        # normalize duckdb NaN for nullable numeric -> None-compatible
        _compare(key, spark_pdf, duck_pdf)
        if key in _MUST_BE_NONEMPTY:
            assert len(spark_pdf) > 0, f"{key}: vacuously-passing empty oracle"
    else:
        # rows-only keys: deterministic across runs
        again = q(spark, SF_DIR).toPandas()
        assert len(spark_pdf) == len(again)
        assert len(spark_pdf) > 0, f"{key}: empty result"


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 7
