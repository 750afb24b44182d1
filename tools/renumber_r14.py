#!/usr/bin/env python
"""Round-14 rotation: fourteen pairwise number swaps that move the
entire never-driver-hashed round-13 wave (q299-q306 — the capped
SimHash/fuzzy-dedup twins, the MP4 video metadata + keyframe plan, and
the ERP planning quartet BOM/MRP/ATP/scorecard), the two highest-value
round-14 additions (the capped hyperplane-LSH twin and the MJPEG
keyframe decode — the 100 TB cap story and the closed video modality
deserve the hard gate immediately), and four never-hashed tail queries
(CDC changelog apply, BMP feature histogram, BPE vocab induction,
BM25+nDCG retrieval — each the first driver hash for its operator
family) into the first-50 driver-hash window (judge r13 item 2).

Evictee eligibility is proven from the committed HASHLEDGER.json:
every evictee carries green driver-hash rows in >= 2 prior CORRECTNESS
rounds, and none is in the judge's 7-query perf core (q001 q006 q030
q034 q037 q043 q080) or the 21-query bench headline set. Family
coverage after eviction (every evictee also remains under the judge's
independent two-SF oracle sweep of the full corpus):

  out (rounds hashed)                  in                       family keeps
  -----------------------------------  -----------------------  ------------
  q002 depreciation (12,13)            capped SimHash twin      L-erp12: sweep (oracled)
  q003 purchase price var (12,13)      capped retention twin    L-erp13: sweep
  q004 DSO monthly (12,13)             MP4 video metadata       L-fin5: sweep
  q008 VAT box summary (12,13)         keyframe sample plan     L-erp14: sweep + stream twin pytest
  q012 OTIF fill rate (12,13)          BOM cost rollup          L-erp15: sweep
  q014 intercompany elim (12,13)       MRP net requirements     L-fin6: sweep
  q016 seasonality index (12,13)       available-to-promise     L-fc2: sweep; Holt q019 stays in-window
  q020 TPC-H Q7 (10,11,13)             supplier scorecard       C6: Q10/Q13/Q18/Q19/Q11/Q15 in-window
  q021 TPC-H Q6 (10,11,13)             capped LSH pairs twin    C6: as above
  q022 inventory turns (12,13)         MJPEG keyframe decode    L-erp16: sweep
  q023 TPC-H Q17 (1,10,11,13)          CDC changelog apply      C6: as above
  q024 TPC-H Q21 (1,10,11,13)          BMP feature histogram    C7: semi/anti via sweep q258; Q19 stays
  q025 customer HHI (12,13)            BPE vocab induction      L-qa4: sweep
  q028 credit exposure (12,13)         BM25 + nDCG              L-fin7: sweep

Pairwise number swaps only — suffixes preserved, no query added or
removed. Applied once; kept for audit. Mapping is OLD -> NEW name.
The full old->new table is also documented in CHANGES_r14.md.
"""

from __future__ import annotations

import json
import pathlib
import re

MAPPING = {
    "q002_depreciation_schedule": "q299_depreciation_schedule",
    "q299_simhash_capped_blocking": "q002_simhash_capped_blocking",
    "q003_purchase_price_variance": "q300_purchase_price_variance",
    "q300_fuzzy_dedup_retention_capped": "q003_fuzzy_dedup_retention_capped",
    "q004_dso_monthly": "q301_dso_monthly",
    "q301_mp4_video_metadata": "q004_mp4_video_metadata",
    "q008_tax_box_summary": "q302_tax_box_summary",
    "q302_keyframe_sample_plan": "q008_keyframe_sample_plan",
    "q012_otif_fill_rate": "q303_otif_fill_rate",
    "q303_bom_cost_rollup": "q012_bom_cost_rollup",
    "q014_intercompany_elimination": "q304_intercompany_elimination",
    "q304_mrp_net_requirements": "q014_mrp_net_requirements",
    "q016_seasonality_index": "q305_seasonality_index",
    "q305_available_to_promise": "q016_available_to_promise",
    "q020_tpch_q7_volume_shipping": "q306_tpch_q7_volume_shipping",
    "q306_supplier_scorecard": "q020_supplier_scorecard",
    "q021_tpch_q6_forecast_revenue": "q307_tpch_q6_forecast_revenue",
    "q307_lsh_bucketed_pairs_capped": "q021_lsh_bucketed_pairs_capped",
    "q022_inventory_turns": "q308_inventory_turns",
    "q308_mjpeg_keyframe_decode": "q022_mjpeg_keyframe_decode",
    "q023_tpch_q17_small_qty": "q127_tpch_q17_small_qty",
    "q127_apply_changelog": "q023_apply_changelog",
    "q024_tpch_q21_waiting_suppliers": "q157_tpch_q21_waiting_suppliers",
    "q157_bmp_feature_histogram": "q024_bmp_feature_histogram",
    "q025_customer_hhi": "q160_customer_hhi",
    "q160_bpe_vocab_induction": "q025_bpe_vocab_induction",
    "q028_credit_exposure": "q187_credit_exposure",
    "q187_bm25_ndcg": "q028_bm25_ndcg",
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
