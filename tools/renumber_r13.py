#!/usr/bin/env python
"""Round-13 rotation: thirteen pairwise number swaps that move the
entire never-driver-hashed round-12 wave (q292-q298 — the near-dup
candidate datasheet, the three-state recursive-CTE Croston forecast,
Wilson EOQ, ABC-XYZ, vendor lead time, closed-form FIFO aging, price
waterfall) plus the four remaining never-hashed TPC-H ports (Q7, Q6,
Q17, Q21 — the queries the reference delegates via ``sql_query``,
cubicerpetl.py:299) plus two high-value never-hashed extension queries
(SES forecast — completing the recursive-CTE-oracle forecast trio under
driver hashes alongside in-window Holt q019 and incoming Croston — and
SimHash chunk blocking, the family whose hot-bucket mass q292 measured
and whose capped twin gains an oracle this round) into the first-50
driver-hash window (the judge's r12 item 1).

Evictee eligibility is now proven from the committed HASHLEDGER.json
(r12 item 3) rather than ad-hoc arithmetic: every evictee carries green
driver-hash rows in >= 2 prior CORRECTNESS rounds, and none is in the
judge's 7-query perf core (q001 q006 q030 q034 q037 q043 q080) or the
21-query bench headline set. Family coverage after eviction (every
evictee also remains under the judge's independent two-SF oracle sweep
of the full corpus):

  out (rounds hashed)                 in                       family keeps
  ----------------------------------  -----------------------  ------------
  q020 TPC-H Q4 exists-semi (11,12)   Q7 volume shipping       C6/C7: Q10/Q13/Q18/Q19/Q11/Q15/
                                                               incoming Q21 all in-window
  q021 TPC-H Q5 (11,12)               Q6 forecast revenue      C6: as above
  q023 CUBE (1,11,12)                 Q17 small-qty scalar     D4: sweep q073/q103/q174
  q024 JSON extract (2,4,5,11,12)     Q21 waiting suppliers    H14: sweep q255 nested JSON export
  q040 SemDeDup (7,9,10,11,12)        near-dup datasheet       L-dedup3: sweep (oracled) + pytest
  q041 JPEG histogram (8-12)          Croston forecast         L-mm1: sweep q157/q197/q214
  q042 GIF histogram (8-12)           Wilson EOQ               L-mm1: as above
  q045 intersect/except (1,2,4-7,11,12)  ABC-XYZ matrix        G2: sweep (oracled) + 8 banked rounds
  q046 TPC-H Q2 top-k (1,10,11,12)    vendor lead time         C6/F3: q044 Q15 top-k stays in-window
  q047 near-dup components (2,4-12)   FIFO inventory aging     L-dedup2: q082 sweep + q204 comes IN
  q048 PQ-ADC top-k (6-12)            price waterfall          L-sim1: q034 stays in-window
  q049 quality report (2,4-12)        SES forecast             L-cls1/L-txt1: q037 stays; sweep q166/q179
  q050 Soundex blocking (8-12)        SimHash chunk blocking   L-er3: sweep q087 linkage; q029 SNM stays

Pairwise number swaps only — suffixes preserved, no query added or
removed. Applied once; kept for audit. Mapping is OLD -> NEW name.
The full old->new table is also documented in CHANGES_r13.md.
"""

from __future__ import annotations

import json
import pathlib
import re

MAPPING = {
    "q020_tpch_q4_order_priority": "q084_tpch_q4_order_priority",
    "q084_tpch_q7_volume_shipping": "q020_tpch_q7_volume_shipping",
    "q021_tpch_q5_local_supplier_volume": "q085_tpch_q5_local_supplier_volume",
    "q085_tpch_q6_forecast_revenue": "q021_tpch_q6_forecast_revenue",
    "q023_cube": "q088_cube",
    "q088_tpch_q17_small_qty": "q023_tpch_q17_small_qty",
    "q024_json_extract": "q089_json_extract",
    "q089_tpch_q21_waiting_suppliers": "q024_tpch_q21_waiting_suppliers",
    "q040_semantic_dedup": "q292_semantic_dedup",
    "q292_neardup_candidate_datasheet": "q040_neardup_candidate_datasheet",
    "q041_jpeg_feature_histogram": "q293_jpeg_feature_histogram",
    "q293_croston_forecast": "q041_croston_forecast",
    "q042_gif_feature_histogram": "q294_gif_feature_histogram",
    "q294_eoq_order_quantity": "q042_eoq_order_quantity",
    "q045_intersect_except": "q295_intersect_except",
    "q295_abc_xyz_matrix": "q045_abc_xyz_matrix",
    "q046_tpch_q2_min_cost_supplier": "q296_tpch_q2_min_cost_supplier",
    "q296_vendor_lead_time": "q046_vendor_lead_time",
    "q047_neardup_components": "q297_neardup_components",
    "q297_fifo_inventory_aging": "q047_fifo_inventory_aging",
    "q048_pq_adc_topk": "q298_pq_adc_topk",
    "q298_price_waterfall": "q048_price_waterfall",
    "q049_quality_report": "q272_quality_report",
    "q272_ses_forecast": "q049_ses_forecast",
    "q050_soundex_blocking": "q204_soundex_blocking",
    "q204_simhash_blocking": "q050_simhash_blocking",
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
    assert len(MAPPING) == 26
    assert sorted(k[:4] for k in MAPPING) == sorted(v[:4] for v in MAPPING.values())
    swaps = {(k[:4], v[:4]) for k, v in MAPPING.items()}
    for k, v in MAPPING.items():
        assert k[5:] == v[5:], (k, v)
        assert (v[:4], k[:4]) in swaps, (k, v)

    root = pathlib.Path("/root/repo")

    # Evictee eligibility proven from the committed ledger (r12 item 3).
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
