#!/usr/bin/env python
"""Round-9 rotation: six pairwise number swaps that move the two
post-r8c additions (Benford, TWAP), one reference-identity rep
(value-mapping — restoring the C1 lookup family to the window, per
the r8 verdict), the heaviest TPC-H join tree (Q9 product profit —
the TPC-H ports q080-q105 have never carried a driver hash), SemDeDup
(q165-family successor) and the LSH quality audit into the first-50
driver-hash window. Evictees all carry r01-r08 driver hashes over
multiple rounds and their family keeps in-window or sweep coverage:

  out (hashed r01-r08; family keeps)     in
  -----------------------------------    -------------------------------
  q021 exact quantiles (D-quantile: q024 grouped sketch + q035 audit
                       + q016 winsorized stay in-window)
                                         Benford first-digit audit
  q031 interval overlap join (C9: q019 as-of FX stays in-window;
                       q112/q117 sweep)
                                         time-weighted average (TWAP)
  q022 url canonicalize (L-web: q027 html strip + q023 NFC dedup
                       stay in-window)
                                         value mapping (C1 identity
                       rep returns to its BIRTH number q022)
  q005 weighted priority sample (L-split/sampling: q038 negative
                       sampling stays in-window; q108/q173 sweep)
                                         TPC-H Q9 product profit
  q040 fuzzy dedup retention (L-dedup2: q030 exact + q032 minhash +
                       q047 components + q029 SNM stay in-window)
                                         SemDeDup semantic dedup
  q010 repetition filter (L-txt: q037 text analysis + q049 quality +
                       q012 PII + q020 vocab growth stay in-window)
                                         LSH quality report

Pairwise number swaps only — suffixes preserved, no query added or
removed. Applied once; kept for audit. Mapping is OLD -> NEW name.
The full old->new table is also documented in CHANGES_r9.md for
downstream consumers who pin query names (ADVICE r8).
"""

from __future__ import annotations

import pathlib
import re

MAPPING = {
    "q021_exact_quantiles": "q230_exact_quantiles",
    "q230_benford_audit": "q021_benford_audit",
    "q031_interval_overlap_join": "q231_interval_overlap_join",
    "q231_time_weighted_average": "q031_time_weighted_average",
    "q022_url_canonicalize": "q213_url_canonicalize",
    "q213_value_mapping": "q022_value_mapping",
    "q005_weighted_priority_sample": "q096_weighted_priority_sample",
    "q096_tpch_q9_product_profit": "q005_tpch_q9_product_profit",
    "q040_fuzzy_dedup_retention": "q217_fuzzy_dedup_retention",
    "q217_semantic_dedup": "q040_semantic_dedup",
    "q010_repetition_filter": "q177_repetition_filter",
    "q177_lsh_quality_report": "q010_lsh_quality_report",
}


def main() -> None:
    assert len(MAPPING) == 12
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
