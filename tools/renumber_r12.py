#!/usr/bin/env python
"""Round-12 rotation: twenty pairwise number swaps that move the
never-driver-hashed round-11 ERP/finance wave (q278-q291 — the whole
14-query block, led by the two-state recursive-CTE Holt forecast, the
banded-join fuzzy duplicate-invoice screen, and the VAT box summary
with its streaming twin) plus SIX never-hashed TPC-H ports (Q10
returned items, Q13 customer distribution, Q18 large-volume
having-subquery, Q19 disjunctive predicates, Q11 supplier share with
global scalar subquery, Q15 top supplier) into the first-50
driver-hash window (the judge's r11 item 1).

Evictees all carry green driver-hash rows in BOTH CORRECTNESS_r10 and
CORRECTNESS_r11 (verified programmatically before this tool was
written; ten of them are also green in r09) and none is in the
judge's 7-query perf core (q001 q006 q030 q034 q037 q043 q080) or the
19-query bench headline set. Family coverage after eviction:

  out (multi-round hashed; family keeps)      in
  ------------------------------------------  --------------------------
  q002 filter/project (B1/B6: Q4/Q5/Q19 predicates stay/come in-window)
                                              depreciation sched (q278)
  q003 domain filter (B5: property tests + sweep stay)
                                              purchase price var (q279)
  q004 top-k (F3: q046 Q2 min-cost top-k stays in-window)
                                              monthly DSO (q280)
  q008 sequence packing (L-batch1: sweep q168/q194)
                                              VAT box summary (q281)
  q012 PII card audit (L-pii1: Luhn property tests; stream twin pytest)
                                              OTIF fill rate (q282)
  q014 image phash (L-mm3: q041 JPEG + q042 GIF stay in-window)
                                              intercompany elim (q283)
  q016 funnel (L-beh1: q289 cohort LTV rotates IN for behavior family)
                                              seasonality index (q284)
  q019 Markov transitions (L-beh3: stream twin pytest; q289 in)
                                              Holt forecast (q285)
  q022 value mapping (C1: sweep q144/q211/q227 lookup family)
                                              inventory turns (q286)
  q025 incremental aggregate (L-ivm1: property test + sweep)
                                              customer HHI (q287)
  q026 discount proration (L-erp4: property test; 14 ERP rows come in)
                                              n-gram novelty (q288)
  q027 html strip (L-web1: sweep q053/q213)
                                              cohort LTV (q289)
  q028 ledger id recovery (C4: merge family sweep q059-q061 + q005 stays)
                                              credit exposure (q290)
  q031 TWAP (C9/D-twa: q013 FIFO interval join stays; sweep q112/q117/q234)
                                              fuzzy dup invoices (q291)
  q032 MinHash LSH candidates (L-dedup2: q047 components + q040 stay)
                                              TPC-H Q10 (q082)
  q035 quantile sketch audit (L-qsk1: sweep q175/q232)
                                              TPC-H Q13 (q083)
  q036 TPC-H Q7 (C6: Q4/Q5/Q6->Q19/Q17->Q11/Q2 keep C6 in-window)
                                              TPC-H Q18 (q084)
  q038 TPC-H Q6 (C6/B6: pushdown pins in PLANS.md + posture tests)
                                              TPC-H Q19 (q085)
  q039 TPC-H Q17 (C6 scalar subquery: Q18/Q11 subquery shapes come in)
                                              TPC-H Q11 (q088)
  q044 TPC-H Q21 (C7: q020 Q4 exists-semi stays in-window)
                                              TPC-H Q15 (q089)

Pairwise number swaps only — suffixes preserved, no query added or
removed. Applied once; kept for audit. Mapping is OLD -> NEW name.
The full old->new table is also documented in CHANGES_r12.md for
downstream consumers who pin query names (ADVICE r8).
"""

from __future__ import annotations

import pathlib
import re

MAPPING = {
    "q002_filter_project": "q278_filter_project",
    "q278_depreciation_schedule": "q002_depreciation_schedule",
    "q003_domain_filter": "q279_domain_filter",
    "q279_purchase_price_variance": "q003_purchase_price_variance",
    "q004_top_k": "q280_top_k",
    "q280_dso_monthly": "q004_dso_monthly",
    "q008_sequence_packing": "q281_sequence_packing",
    "q281_tax_box_summary": "q008_tax_box_summary",
    "q012_pii_card_audit": "q282_pii_card_audit",
    "q282_otif_fill_rate": "q012_otif_fill_rate",
    "q014_image_phash_neardup": "q283_image_phash_neardup",
    "q283_intercompany_elimination": "q014_intercompany_elimination",
    "q016_funnel_analysis": "q284_funnel_analysis",
    "q284_seasonality_index": "q016_seasonality_index",
    "q019_markov_transitions": "q285_markov_transitions",
    "q285_holt_forecast": "q019_holt_forecast",
    "q022_value_mapping": "q286_value_mapping",
    "q286_inventory_turns": "q022_inventory_turns",
    "q025_incremental_aggregate": "q287_incremental_aggregate",
    "q287_customer_hhi": "q025_customer_hhi",
    "q026_discount_proration": "q288_discount_proration",
    "q288_ngram_novelty": "q026_ngram_novelty",
    "q027_html_strip": "q289_html_strip",
    "q289_cohort_ltv": "q027_cohort_ltv",
    "q028_ledger_id_recovery": "q290_ledger_id_recovery",
    "q290_credit_exposure": "q028_credit_exposure",
    "q031_time_weighted_average": "q291_time_weighted_average",
    "q291_fuzzy_dup_invoices": "q031_fuzzy_dup_invoices",
    "q032_minhash_lsh_candidates": "q082_minhash_lsh_candidates",
    "q082_tpch_q10_returned_items": "q032_tpch_q10_returned_items",
    "q035_quantile_sketch_audit": "q083_quantile_sketch_audit",
    "q083_tpch_q13_cust_distribution": "q035_tpch_q13_cust_distribution",
    "q036_tpch_q7_volume_shipping": "q084_tpch_q7_volume_shipping",
    "q084_tpch_q18_large_volume": "q036_tpch_q18_large_volume",
    "q038_tpch_q6_forecast_revenue": "q085_tpch_q6_forecast_revenue",
    "q085_tpch_q19_disjunctive": "q038_tpch_q19_disjunctive",
    "q039_tpch_q17_small_qty": "q088_tpch_q17_small_qty",
    "q088_tpch_q11_supplier_share": "q039_tpch_q11_supplier_share",
    "q044_tpch_q21_waiting_suppliers": "q089_tpch_q21_waiting_suppliers",
    "q089_tpch_q15_top_supplier": "q044_tpch_q15_top_supplier",
}


def main() -> None:
    assert len(MAPPING) == 40
    assert sorted(k[:4] for k in MAPPING) == sorted(v[:4] for v in MAPPING.values())
    swaps = {(k[:4], v[:4]) for k, v in MAPPING.items()}
    for k, v in MAPPING.items():
        assert k[5:] == v[5:], (k, v)
        assert (v[:4], k[:4]) in swaps, (k, v)
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
        root / "tools" / "plan_digest.py",
        root / "tools" / "scale_census.py",
        root / "README.md",
        root / "SURVEY.md",
    ]
    for path in targets:
        text = path.read_text()
        new, n = pat.subn(lambda m: MAPPING[m.group(0)], text)
        if n:
            path.write_text(new)
            print(f"{path}: {n} replacements")


if __name__ == "__main__":
    main()
