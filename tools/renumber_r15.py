#!/usr/bin/env python
"""Round-15 rotation: fourteen pairwise number swaps that move the
round-14 wave (cash application, progressive brackets, FX revaluation
— all born unhashed in r14), the declared-contract family's first
driver hash (exact cosine pairs), and ten never-or-once-hashed
operator-family firsts (pointer-jump hierarchy roots, funnel, IVF
multiprobe, inverted index, windowed HLL, Bloom decontamination,
stock-ledger balance, bitemporal restatement, longest-prefix match,
AR aging) into the first-50 driver-hash window (judge r14 item 2).

Evictee eligibility is proven from the committed HASHLEDGER.json:
every evictee carries green driver-hash rows in >= 2 prior CORRECTNESS
rounds, and none is in the judge's 7-query perf core (q001 q006 q030
q034 q037 q043 q080) or the 21-query bench headline set. q005 (the
lifecycle flagship), q007/q009 (the scale-posture pair), and q050 (the
freshly DECLARED uncapped SimHash contract) are deliberately kept
in-window despite eligibility — their driver rows anchor a dozen
VERDICT evidence cells. Family coverage after eviction (every evictee
also remains under the judge's independent two-SF oracle sweep):

  out (rounds hashed)                  in                        family keeps
  -----------------------------------  ------------------------  ------------
  q015 AVCO inventory (11-14)          cash application match    L-erp10: sweep (oracled)
  q018 ref-integrity audit (11-14)     progressive brackets      L-qa3: sweep
  q019 Holt forecast (12-14)           FX revaluation            L-fc3: sweep; Croston q041 stays
  q026 n-gram novelty (12-14)          exact cosine pairs        L-cur3: sweep
  q027 cohort LTV (12-14)              hierarchy pointer-jump    L-beh8: sweep
  q031 fuzzy dup invoices (12-14)      funnel analysis           L-erp17: sweep
  q035 TPC-H Q13 (12-14)               IVF multiprobe            C6: Q10/Q19/Q11/Q15 stay in-window
  q036 TPC-H Q18 (12-14)               inverted index            C6: as above
  q042 Wilson EOQ (13,14)              windowed HLL uniques      L-erp18: sweep
  q045 ABC-XYZ matrix (13,14)          Bloom decontamination     L-erp19: sweep
  q046 vendor lead time (13,14)        stock-ledger balance      L-erp20: sweep
  q047 FIFO inventory aging (13,14)    bitemporal restatement    L-erp21: sweep
  q048 price waterfall (13,14)         longest-prefix match      L-fin8: sweep + stream twin pytest
  q049 SES forecast (13,14)            AR aging buckets          L-fc1: sweep (recursive-CTE oracle)

Pairwise number swaps only — suffixes preserved, no query added or
removed. Applied once; kept for audit. Mapping is OLD -> NEW name.
The full old->new table is also documented in CHANGES_r15.md.
"""

from __future__ import annotations

import json
import pathlib
import re

MAPPING = {
    "q015_avco_inventory": "q309_avco_inventory",
    "q309_cash_application_match": "q015_cash_application_match",
    "q018_referential_integrity_audit": "q310_referential_integrity_audit",
    "q310_progressive_tax_brackets": "q018_progressive_tax_brackets",
    "q019_holt_forecast": "q311_holt_forecast",
    "q311_fx_revaluation": "q019_fx_revaluation",
    "q026_ngram_novelty": "q070_ngram_novelty",
    "q070_cosine_pairs": "q026_cosine_pairs",
    "q027_cohort_ltv": "q135_cohort_ltv",
    "q135_hierarchy_roots": "q027_hierarchy_roots",
    "q031_fuzzy_dup_invoices": "q136_fuzzy_dup_invoices",
    "q136_funnel": "q031_funnel",
    "q035_tpch_q13_cust_distribution": "q150_tpch_q13_cust_distribution",
    "q150_ivf_multiprobe": "q035_ivf_multiprobe",
    "q036_tpch_q18_large_volume": "q182_tpch_q18_large_volume",
    "q182_inverted_index": "q036_inverted_index",
    "q042_eoq_order_quantity": "q205_eoq_order_quantity",
    "q205_windowed_hll_uniques": "q042_windowed_hll_uniques",
    "q045_abc_xyz_matrix": "q216_abc_xyz_matrix",
    "q216_bloom_decontaminate": "q045_bloom_decontaminate",
    "q046_vendor_lead_time": "q240_vendor_lead_time",
    "q240_stock_ledger_balance": "q046_stock_ledger_balance",
    "q047_fifo_inventory_aging": "q241_fifo_inventory_aging",
    "q241_bitemporal_restatement": "q047_bitemporal_restatement",
    "q048_price_waterfall": "q243_price_waterfall",
    "q243_longest_prefix_match": "q048_longest_prefix_match",
    "q049_ses_forecast": "q261_ses_forecast",
    "q261_ar_aging_buckets": "q049_ar_aging_buckets",
}

PERF_CORE = {
    "q001_pricing_summary",
    "q006_star_join_revenue",
    "q030_dedup_keep_latest",
    "q034_cosine_topk",
    "q037_text_analysis",
    "q043_tumbling_window",
    "q080_tpch_q3_shipping_priority",
}


def main() -> None:
    assert len(MAPPING) == 28
    assert sorted(k[:4] for k in MAPPING) == sorted(v[:4] for v in MAPPING.values())
    swaps = {(k[:4], v[:4]) for k, v in MAPPING.items()}
    for k, v in MAPPING.items():
        assert k[5:] == v[5:], (k, v)
        assert (v[:4], k[:4]) in swaps, (k, v)

    root = pathlib.Path("/root/repo")

    # Evictee eligibility proven from the committed ledger.
    ledger = json.loads((root / "HASHLEDGER.json").read_text())["ledger"]
    import sys

    sys.path.insert(0, str(root))
    from cubicerp_client_etl_spark.queries import REGISTRY

    bench_headliners = {n for n, q in REGISTRY.items() if q.headline}
    for old, new in MAPPING.items():
        if old < new:  # evictee: moves OUT of the first-50 window
            rounds = ledger[old]["rounds"]
            assert len(rounds) >= 2, (old, rounds)
            assert old not in PERF_CORE, old
            assert old not in bench_headliners, old

    pat = re.compile(
        "|".join(re.escape(k) for k in sorted(MAPPING, key=len, reverse=True))
    )
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
