#!/usr/bin/env python
"""One-shot corpus renumbering (round 6) — window rotation.

The driver's CORRECTNESS check covers only the FIRST 50 query names in
sorted order. VERDICT r5 "Next round" #2: the q141-q156 mixture/
quantile/retention/sketch/ANN wave — the most novel work in the repo —
had zero driver-hash rows. This swap moves 8 of its representatives
into the q001..q050 window (q141 post the keyed-prefix-scan fix),
evicting shapes whose family keeps another in-window driver rep or a
sweep-checked representative:

  out (family keeps a rep)              in (previously sweep-only)
  ----------------------------------    -------------------------------
  q005 distinct     (keyed distinct: q030 keep-latest; set ops: q016)
                                        weighted priority sample
  q017 scalar pack  (H funcs: q019 date pack; K7 eval: q029)
                                        token-budget mixture
  q021 correlated subquery (TPC-H sweep q086/q090/q102; semi: q007)
                                        exact quantiles
  q024 name-search first hit (C lookups: q022/q023/q025/q028 stay)
                                        incremental dedup
  q031 ngram jaccard probe (exact verify: q027 setsim; LSH: q032/q035)
                                        interval overlap join
  q038 bpe token count (L-txt: q037 analysis + q039 tfidf stay)
                                        count-min sketch
  q040 multimodal meta (L-mm: q041 features stays; q157 real decode)
                                        fuzzy dedup retention
  q048 salted skew join (C6: q006 + TPC-H sweep; AQE posture tests)
                                        PQ ADC top-k

Pairwise number swaps only — every query keeps its semantic suffix, no
query is added or removed, and the full corpus remains sweep-checked.
Applied once; kept for audit. Mapping is OLD -> NEW full name.
"""

from __future__ import annotations

import pathlib
import re

MAPPING = {
    "q005_distinct": "q153_distinct",
    "q153_weighted_priority_sample": "q005_weighted_priority_sample",
    "q017_scalar_pack": "q141_scalar_pack",
    "q141_token_budget_mixture": "q017_token_budget_mixture",
    "q021_correlated_subquery": "q143_correlated_subquery",
    "q143_exact_quantiles": "q021_exact_quantiles",
    "q024_name_search_first_hit": "q144_name_search_first_hit",
    "q144_incremental_dedup": "q024_incremental_dedup",
    "q031_ngram_jaccard_probe": "q146_ngram_jaccard_probe",
    "q146_interval_overlap_join": "q031_interval_overlap_join",
    "q038_bpe_token_count": "q147_bpe_token_count",
    "q147_count_min_sketch": "q038_count_min_sketch",
    "q040_multimodal_meta": "q149_multimodal_meta",
    "q149_fuzzy_dedup_retention": "q040_fuzzy_dedup_retention",
    "q048_salted_skew_join": "q151_salted_skew_join",
    "q151_pq_adc_topk": "q048_pq_adc_topk",
}


def main() -> None:
    assert len(MAPPING) == 16
    # pairwise NUMBER swaps preserving each query's semantic suffix:
    # the multiset of numeric prefixes is unchanged, every suffix rides
    # along, and each swap has its inverse partner in the mapping.
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
    ]
    for path in targets:
        text = path.read_text()
        new, n = pat.subn(lambda m: MAPPING[m.group(0)], text)
        if n:
            path.write_text(new)
            print(f"{path}: {n} replacements")


if __name__ == "__main__":
    main()
