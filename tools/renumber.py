#!/usr/bin/env python
"""One-shot corpus renumbering (round 2).

The driver's CORRECTNESS check covers only the FIRST 50 query names in
sorted order. Round 1 shipped names q01..q29 + q100..q120 inside that
window, leaving every merge/dedup/similarity/text/multimodal/streaming
family unchecked. This script renames the whole corpus to zero-padded
q001..q117 such that q001..q050 hold one representative per operator
family (VERDICT.md "Next round" #2).

Applied once; kept for audit. Mapping is OLD -> NEW full name.
"""

from __future__ import annotations

import pathlib
import re

MAPPING = {
    # ---- in-window (new q001..q050): one rep per SURVEY §2 family ----
    "q01_pricing_summary": "q001_pricing_summary",
    "q02_filter_project": "q002_filter_project",
    "q03_domain_filter": "q003_domain_filter",
    "q04_top_k": "q004_top_k",
    "q05_distinct": "q005_distinct",
    "q07_star_join_revenue": "q006_star_join_revenue",
    "q09_semi_join": "q007_semi_join",
    "q10_anti_join": "q008_anti_join",
    "q11_theta_self_join": "q009_theta_self_join",
    "q12_range_band_join": "q010_range_band_join",
    "q13_window_rank": "q011_window_rank",
    "q14_window_lag": "q012_window_lag",
    "q15_window_running": "q013_window_running",
    "q16_rollup": "q014_rollup",
    "q18_union_all": "q015_union_all",
    "q19_intersect_except": "q016_intersect_except",
    "q20_scalar_pack": "q017_scalar_pack",
    "q21_json_extract": "q018_json_extract",
    "q24_date_pack": "q019_date_pack",
    "q25_asof_join": "q020_asof_join",
    "q26_correlated_subquery": "q021_correlated_subquery",
    "q30_value_mapping": "q022_value_mapping",
    "q31_xmlid_resolve": "q023_xmlid_resolve",
    "q32_name_search_first_hit": "q024_name_search_first_hit",
    "q33_insert_if_absent": "q025_insert_if_absent",
    "q34_merge_update": "q026_merge_update",
    "q37_merge_delete": "q027_merge_delete",
    "q39_ledger_id_recovery": "q028_ledger_id_recovery",
    "q45_pandas_scalar_udf": "q029_pandas_scalar_udf",
    "q50_dedup_keep_latest": "q030_dedup_keep_latest",
    "q52_ngram_jaccard_probe": "q031_ngram_jaccard_probe",
    "q53_minhash_lsh_candidates": "q032_minhash_lsh_candidates",
    "q54_simhash": "q033_simhash",
    "q55_cosine_topk": "q034_cosine_topk",
    "q57_lsh_bucketed_pairs": "q035_lsh_bucketed_pairs",
    "q62_ivf_topk": "q036_ivf_topk",
    "q58_text_analysis": "q037_text_analysis",
    "q64_bpe_token_count": "q038_bpe_token_count",
    "q79_tfidf_top_terms": "q039_tfidf_top_terms",
    "q60_multimodal_meta": "q040_multimodal_meta",
    "q61_multimodal_features": "q041_multimodal_features",
    "q78_frame_sample": "q042_frame_sample",
    "q70_tumbling_window": "q043_tumbling_window",
    "q72_session_window": "q044_session_window",
    "q74_sessionize_lag_cumsum": "q045_sessionize_lag_cumsum",
    "q73_header_footer_broadcast": "q046_header_footer_broadcast",
    "q90_neardup_components": "q047_neardup_components",
    "q68_salted_skew_join": "q048_salted_skew_join",
    "q110_quality_report": "q049_quality_report",
    "q117_pagerank_int": "q050_pagerank_int",
    # ---- out-of-window (q051+): covered by sweep + pytest ----
    "q06_group_having": "q051_group_having",
    "q08_left_join": "q052_left_join",
    "q17_cube": "q053_cube",
    "q22_pivot": "q054_pivot",
    "q23_count_distinct": "q055_count_distinct",
    "q27_median_window": "q056_median_window",
    "q28_histogram": "q057_histogram",
    "q29_unpivot": "q058_unpivot",
    "q35_merge_noupdate": "q059_merge_noupdate",
    "q36_merge_onlyupdate": "q060_merge_onlyupdate",
    "q38_merge_insert": "q061_merge_insert",
    "q40_exists_agg": "q062_exists_agg",
    "q41_case_buckets": "q063_case_buckets",
    "q42_conditional_ratio": "q064_conditional_ratio",
    "q43_levenshtein": "q065_levenshtein",
    "q44_explode_wordcount": "q066_explode_wordcount",
    "q46_apply_in_pandas": "q067_apply_in_pandas",
    "q47_map_in_pandas": "q068_map_in_pandas",
    "q51_dedup_fingerprint": "q069_dedup_fingerprint",
    "q56_cosine_pairs": "q070_cosine_pairs",
    "q59_corpus_stats": "q071_corpus_stats",
    "q63_quality_score": "q072_quality_score",
    "q65_grouping_sets": "q073_grouping_sets",
    "q66_sorted_listagg": "q074_sorted_listagg",
    "q69_embedding_near_dup": "q075_embedding_near_dup",
    "q71_sliding_window": "q076_sliding_window",
    "q75_approx_count_distinct": "q077_approx_count_distinct",
    "q76_ntile_first_last": "q078_ntile_first_last",
    "q77_multimodal_resize": "q079_multimodal_resize",
    "q80_tpch_q3_shipping_priority": "q080_tpch_q3_shipping_priority",
    "q81_tpch_q4_order_priority": "q081_tpch_q4_order_priority",
    "q82_tpch_q10_returned_items": "q082_tpch_q10_returned_items",
    "q83_tpch_q13_cust_distribution": "q083_tpch_q13_cust_distribution",
    "q84_tpch_q18_large_volume": "q084_tpch_q18_large_volume",
    "q85_tpch_q19_disjunctive": "q085_tpch_q19_disjunctive",
    "q86_tpch_q22_global_sales": "q086_tpch_q22_global_sales",
    "q87_tpch_q7_volume_shipping": "q087_tpch_q7_volume_shipping",
    "q88_tpch_q11_supplier_share": "q088_tpch_q11_supplier_share",
    "q89_tpch_q15_top_supplier": "q089_tpch_q15_top_supplier",
    "q91_corpus_curation": "q090_corpus_curation",
    "q92_stats_pack": "q091_stats_pack",
    "q93_dau_wow": "q092_dau_wow",
    "q94_tpch_q5_local_supplier_volume": "q093_tpch_q5_local_supplier_volume",
    "q95_tpch_q6_forecast_revenue": "q094_tpch_q6_forecast_revenue",
    "q96_tpch_q8_market_share": "q095_tpch_q8_market_share",
    "q97_tpch_q9_product_profit": "q096_tpch_q9_product_profit",
    "q98_tpch_q12_late_shipping": "q097_tpch_q12_late_shipping",
    "q99_tpch_q14_promo_revenue": "q098_tpch_q14_promo_revenue",
    "q100_tpch_q16_supplier_cnt": "q099_tpch_q16_supplier_cnt",
    "q101_tpch_q17_small_qty": "q100_tpch_q17_small_qty",
    "q102_tpch_q20_excess_supply": "q101_tpch_q20_excess_supply",
    "q103_tpch_q21_waiting_suppliers": "q102_tpch_q21_waiting_suppliers",
    "q104_pivot_revenue_matrix": "q103_pivot_revenue_matrix",
    "q105_unpivot_part_attrs": "q104_unpivot_part_attrs",
    "q106_tpch_q2_min_cost_supplier": "q105_tpch_q2_min_cost_supplier",
    "q107_scd2_intervals": "q106_scd2_intervals",
    "q108_cdc_snapshot_diff": "q107_cdc_snapshot_diff",
    "q109_hash_split_stratified": "q108_hash_split_stratified",
    "q111_exact_percentiles": "q109_exact_percentiles",
    "q112_incremental_rollup": "q110_incremental_rollup",
    "q113_heavy_hitters": "q111_heavy_hitters",
    "q114_interval_join_attribution": "q112_interval_join_attribution",
    "q115_python_udtf_bigrams": "q113_python_udtf_bigrams",
    "q116_pii_redaction": "q114_pii_redaction",
    "q118_trailing_range_window": "q115_trailing_range_window",
    "q119_k_anonymity_audit": "q116_k_anonymity_audit",
    "q120_asof_cogroup": "q117_asof_cogroup",
}


def main() -> None:
    assert len(MAPPING) == 117, len(MAPPING)
    assert len(set(MAPPING.values())) == 117
    pat = re.compile(
        "|".join(re.escape(k) for k in sorted(MAPPING, key=len, reverse=True))
    )
    root = pathlib.Path("/root/repo")
    targets = [
        *root.glob("cubicerp_client_etl_spark/**/*.py"),
        *root.glob("tests/**/*.py"),
        root / "__spark_entry__.py",
        root / "bench.py",
        root / "tools" / "oracle_sweep.py",
        root / "README.md",
    ]
    for path in targets:
        text = path.read_text()
        new, n = pat.subn(lambda m: MAPPING[m.group(0)], text)
        if n:
            path.write_text(new)
            print(f"{path}: {n} replacements")


if __name__ == "__main__":
    main()
