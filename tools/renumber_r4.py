#!/usr/bin/env python
"""One-shot corpus renumbering (round 4) — window rotation.

The driver's CORRECTNESS check covers only the FIRST 50 query names in
sorted order. VERDICT r2 "Next round" #2: the q118-q140 curation wave
(the LLM-pipeline centerpiece) had zero hard-signal rows. This swap
moves 8 curation-wave representatives into the q001..q050 window,
evicting near-duplicate relational shapes whose families keep another
in-window or sweep-checked representative:

  out (family keeps a rep)          in (previously sweep-only)
  ------------------------------    ---------------------------------
  q008 anti join   (C7: q007)       sequence packing
  q010 range band  (C9: q020)       Gopher repetition filter
  q012 window lag  (E2: sweep q056/q076/q092)   decontamination
  q013 window running (E3: prefix scan is the stronger cumsum)  k-means
  q015 union all   (G-set-ops: q016)            curation pipeline
  q027 merge delete (I1: q026; sweep q059-q061) setsim join
  q042 frame sample (L-mm1: q040+q041)          stratified sample
  q045 sessionize  (J3: q044)                   two-phase prefix scan

Pairwise number swaps only — every query keeps its semantic suffix, no
query is added or removed, and the full corpus remains sweep-checked.
Applied once; kept for audit. Mapping is OLD -> NEW full name.
"""

from __future__ import annotations

import pathlib
import re

MAPPING = {
    "q008_anti_join": "q119_anti_join",
    "q119_sequence_packing": "q008_sequence_packing",
    "q010_range_band_join": "q122_range_band_join",
    "q122_repetition_filter": "q010_repetition_filter",
    "q012_window_lag": "q123_window_lag",
    "q123_decontaminate": "q012_decontaminate",
    "q013_window_running": "q126_window_running",
    "q126_kmeans_int": "q013_kmeans_int",
    "q015_union_all": "q130_union_all",
    "q130_curation_pipeline": "q015_curation_pipeline",
    "q027_merge_delete": "q134_merge_delete",
    "q134_setsim_join": "q027_setsim_join",
    "q042_frame_sample": "q138_frame_sample",
    "q138_stratified_sample": "q042_stratified_sample",
    "q045_sessionize_lag_cumsum": "q140_sessionize_lag_cumsum",
    "q140_pareto_scan": "q045_pareto_scan",
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
