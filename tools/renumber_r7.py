#!/usr/bin/env python
"""One-shot corpus renumbering (round 7).

The driver's CORRECTNESS check covers only the FIRST 50 query names in
sorted order. VERDICT.md round 6 ("Next round" #1) lists eight
round-6 flagships that have sweep+pytest evidence but have never had a
driver-hash row; this swap moves them into the q001..q050 window,
evicting shapes whose family keeps another in-window driver rep or a
sweep-checked representative:

  out (family keeps a rep)               in (previously sweep-only)
  -----------------------------------    -------------------------------
  q012 decontaminate  (same decontamination family as the entrant;
                       anti-join form retains sweep coverage)
                                         Bloom decontaminate
  q013 kmeans int     (clustering: SemDeDup's k-means cells stay
                       in-window; q202 cell balance sweep)
                                         SemDeDup semantic dedup
  q029 pandas scalar UDF (K7: q017 expr-eval in-window; q067/q068
                       pandas sweep)
                                         hybrid RRF fusion
  q038 count-min sketch (sketches: q011 HLL in-window; q111/q152
                       sweep)
                                         BPE tokenize corpus
  q039 tf-idf top terms (L-txt: q037 text analysis + q010 repetition
                       in-window; q125/q154 sweep)
                                         quality classifier
  q042 stratified sample (sampling: q005 weighted sample in-window;
                       q108/q121 sweep)
                                         PNG feature histogram
  q045 pareto scan    (E analytic: q021 frames in-window; q078/q123/
                       q140 sweep)
                                         WAV audio features
  q050 pagerank int   (graph: q047 components in-window; q135 sweep)
                                         release pipeline

Pairwise number swaps only — every query keeps its semantic suffix, no
query is added or removed, and the full corpus remains sweep-checked.
Applied once; kept for audit. Mapping is OLD -> NEW full name.
"""

from __future__ import annotations

import pathlib
import re

MAPPING = {
    "q012_decontaminate": "q158_decontaminate",
    "q158_bloom_decontaminate": "q012_bloom_decontaminate",
    "q013_kmeans_int": "q165_kmeans_int",
    "q165_semantic_dedup": "q013_semantic_dedup",
    "q029_pandas_scalar_udf": "q188_pandas_scalar_udf",
    "q188_hybrid_rrf_fusion": "q029_hybrid_rrf_fusion",
    "q038_count_min_sketch": "q161_count_min_sketch",
    "q161_bpe_tokenize_corpus": "q038_bpe_tokenize_corpus",
    "q039_tfidf_top_terms": "q166_tfidf_top_terms",
    "q166_quality_classifier": "q039_quality_classifier",
    "q042_stratified_sample": "q197_stratified_sample",
    "q197_png_feature_histogram": "q042_png_feature_histogram",
    "q045_pareto_scan": "q170_pareto_scan",
    "q170_wav_audio_features": "q045_wav_audio_features",
    "q050_pagerank_int": "q200_pagerank_int",
    "q200_release_pipeline": "q050_release_pipeline",
}


def main() -> None:
    assert len(MAPPING) == 16
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
