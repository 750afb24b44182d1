#!/usr/bin/env python
"""One-shot corpus renumbering (round 6, second rotation).

The driver's CORRECTNESS check covers only the FIRST 50 query names in
sorted order. The round-6 continuation waves (q171+) added the
fingerprint/sketch/selection/retrieval/linear-algebra flagships with
sweep+pytest evidence only; this swap moves six of them into the
q001..q050 window, evicting shapes whose family keeps another
in-window driver rep or a sweep-checked representative:

  out (family keeps a rep)              in (previously sweep-only)
  ----------------------------------    -------------------------------
  q009 theta self join  (C8: q046 crossJoin-broadcast stays in-window)
                                        winnowing fingerprints
  q011 window rank      (E: q020 asof + q045 pareto in-window;
                         q078/q123/q126 sweep)
                                        portable HLL cardinality
  q014 rollup           (D4: q053/q073/q103/q104 sweep)
                                        DSIR importance weights
  q018 json extract     (H: q019 date pack in-window; q065/q074 sweep)
                                        BM25 top-k
  q033 simhash          (L-dedup2: q027/q030/q032/q035/q040/q047
                         in-window)
                                        PCA power iteration
  q036 ivf topk         (L-sim: q034 cosine + q048 PQ-ADC in-window;
                         q150/q162 sweep)
                                        record linkage

Pairwise number swaps only — every query keeps its semantic suffix, no
query is added or removed, and the full corpus remains sweep-checked.
Applied once; kept for audit. Mapping is OLD -> NEW full name.
"""

from __future__ import annotations

import pathlib
import re

MAPPING = {
    "q009_theta_self_join": "q171_theta_self_join",
    "q171_winnowing_fingerprints": "q009_winnowing_fingerprints",
    "q011_window_rank": "q172_window_rank",
    "q172_hll_portable_cardinality": "q011_hll_portable_cardinality",
    "q014_rollup": "q174_rollup",
    "q174_dsir_importance_weights": "q014_dsir_importance_weights",
    "q018_json_extract": "q175_json_extract",
    "q175_bm25_topk": "q018_bm25_topk",
    "q033_simhash": "q183_simhash",
    "q183_pca_power_iteration": "q033_pca_power_iteration",
    "q036_ivf_topk": "q184_ivf_topk",
    "q184_record_linkage": "q036_record_linkage",
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
    ]
    for path in targets:
        text = path.read_text()
        new, n = pat.subn(lambda m: MAPPING[m.group(0)], text)
        if n:
            path.write_text(new)
            print(f"{path}: {n} replacements")


if __name__ == "__main__":
    main()
