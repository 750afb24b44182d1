#!/usr/bin/env python
"""Round-10 rotation: eleven pairwise number swaps that move the
never-driver-hashed round-9 wave's leads (FIFO COGS — the bench
headline and ledger-reconciliation analogue; image perceptual-hash
near-dup — the only multimodal blocking-family member; funnel; Markov
transitions; incremental aggregate maintenance; exact proration) plus
FIVE never-hashed TPC-H ports (Q6 scan-agg, Q7 two-nation join tree,
Q17 avg-subquery shape, Q21 multi-semi/anti-join, Q2 min-cost
correlated join — the judge's r9 item 3: the q080-q105 block has never
carried a driver hash except the Q9 port) into the first-50
driver-hash window. Evictees all carry MULTIPLE rounds of green driver
hashes (every first-50 row was green in CORRECTNESS_r09) and their
family keeps in-window or sweep coverage:

  out (multi-round hashed; family keeps)  in
  ------------------------------------    -------------------------------
  q013 epoch allocation (L-mix: q017 temperature mixture stays)
                                          FIFO COGS (q248)
  q014 DSIR weights (L-sel: q008 packing + sweep q108/q173 splits)
                                          image phash near-dup (q239)
  q016 winsorized stats (D-quantile: q024 + q035 stay in-window)
                                          funnel analysis (q232)
  q019 as-of FX (C9: q031 TWAP stays in-window; q112/q117 sweep)
                                          Markov transitions (q234)
  q025 triangles (L-graph: sweep q178/q184 graph family)
                                          incremental aggregate (q254)
  q026 geo neighbor join (blocking: q029 SNM + q032 LSH + q050
                       soundex stay in-window)
                                          discount proration (q244)
  q036 record linkage (L-er: q050 soundex blocking stays in-window)
                                          TPC-H Q7 volume shipping (q087)
  q038 contrastive negatives (L-neg: sweep; derivation regression-
                       tested in pytest)
                                          TPC-H Q6 forecast revenue (q094)
  q039 HLL set algebra (L-card: q011 keyed HLL stays in-window)
                                          TPC-H Q17 small-qty (q100)
  q044 matryoshka recall (L-sim: q034 cosine + q048 PQ stay)
                                          TPC-H Q21 waiting suppliers (q102)
  q046 CDF transform (D-quantile: q024 + q035 stay in-window)
                                          TPC-H Q2 min-cost supplier (q105)

Pairwise number swaps only — suffixes preserved, no query added or
removed. Applied once; kept for audit. Mapping is OLD -> NEW name.
The full old->new table is also documented in CHANGES_r10.md for
downstream consumers who pin query names (ADVICE r8).
"""

from __future__ import annotations

import pathlib
import re

MAPPING = {
    "q013_epoch_allocation": "q248_epoch_allocation",
    "q248_fifo_cogs": "q013_fifo_cogs",
    "q014_dsir_importance_weights": "q239_dsir_importance_weights",
    "q239_image_phash_neardup": "q014_image_phash_neardup",
    "q016_winsorized_stats": "q232_winsorized_stats",
    "q232_funnel_analysis": "q016_funnel_analysis",
    "q019_currency_asof_conversion": "q234_currency_asof_conversion",
    "q234_markov_transitions": "q019_markov_transitions",
    "q025_copurchase_triangles": "q254_copurchase_triangles",
    "q254_incremental_aggregate": "q025_incremental_aggregate",
    "q026_geo_neighbor_join": "q244_geo_neighbor_join",
    "q244_discount_proration": "q026_discount_proration",
    "q036_record_linkage": "q087_record_linkage",
    "q087_tpch_q7_volume_shipping": "q036_tpch_q7_volume_shipping",
    "q038_contrastive_negatives": "q094_contrastive_negatives",
    "q094_tpch_q6_forecast_revenue": "q038_tpch_q6_forecast_revenue",
    "q039_hll_join_cardinality": "q100_hll_join_cardinality",
    "q100_tpch_q17_small_qty": "q039_tpch_q17_small_qty",
    "q044_matryoshka_recall": "q102_matryoshka_recall",
    "q102_tpch_q21_waiting_suppliers": "q044_tpch_q21_waiting_suppliers",
    "q046_cdf_transform": "q105_cdf_transform",
    "q105_tpch_q2_min_cost_supplier": "q046_tpch_q2_min_cost_supplier",
}


def main() -> None:
    assert len(MAPPING) == 22
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
