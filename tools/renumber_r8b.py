#!/usr/bin/env python
"""Second round-8 renumbering: move the ROUND-8 additions themselves
into the first-50 driver-hash window (the r6/r6b precedent), so the
new operator wave gets CORRECTNESS rows this round instead of waiting
for round 9. Evictees all carry r07-or-earlier driver hashes and
their family keeps an in-window rep; nothing rotated IN by
tools/renumber_r8.py (which has no hash row yet) is touched:

  out (family keeps a rep)               in (added this round)
  -----------------------------------    -------------------------------
  q012 bloom decontaminate (r07 hash; q015 curation pipeline's
                       decontamination stage in-window; sweep rep)
                                         Luhn PII card audit
  q013 semantic dedup  (r07 hash; dedup family keeps q030/q032/q040/
                       q047 in-window)
                                         epoch allocation
  q020 asof join       (hashed r01-r07; C9 family keeps q031 interval
                       join in-window; q117/q122 sweep)
                                         vocab growth datasheet
  q029 hybrid RRF      (r07 hash; retrieval family keeps q018 BM25
                       in-window)
                                         sorted-neighborhood dedup
  q038 BPE tokenize    (r07 hash; q037 text analysis in-window;
                       q160/q176 sweep)
                                         contrastive negatives
  q039 quality classifier (r07 hash; quality family keeps q010
                       repetition + q049 report in-window)
                                         HLL join-cardinality
  q044 session window  (hashed r01-r07; J family keeps q043 tumbling
                       in-window)
                                         Matryoshka recall audit
  q050 release pipeline (r07 hash; q015 curation chain in-window)
                                         Soundex blocking

Pairwise number swaps only — suffixes preserved, no query added or
removed. Applied once; kept for audit. Mapping is OLD -> NEW name.
"""

from __future__ import annotations

import pathlib
import re

MAPPING = {
    "q012_bloom_decontaminate": "q216_bloom_decontaminate",
    "q216_pii_card_audit": "q012_pii_card_audit",
    "q013_semantic_dedup": "q217_semantic_dedup",
    "q217_epoch_allocation": "q013_epoch_allocation",
    "q020_asof_join": "q218_asof_join",
    "q218_vocab_growth": "q020_vocab_growth",
    "q029_hybrid_rrf_fusion": "q219_hybrid_rrf_fusion",
    "q219_sorted_neighborhood": "q029_sorted_neighborhood",
    "q038_bpe_tokenize_corpus": "q220_bpe_tokenize_corpus",
    "q220_contrastive_negatives": "q038_contrastive_negatives",
    "q039_quality_classifier": "q221_quality_classifier",
    "q221_hll_join_cardinality": "q039_hll_join_cardinality",
    "q044_session_window": "q222_session_window",
    "q222_matryoshka_recall": "q044_matryoshka_recall",
    "q050_release_pipeline": "q223_release_pipeline",
    "q223_soundex_blocking": "q050_soundex_blocking",
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
        root / "CHANGES_r8.md",
    ]
    for path in targets:
        text = path.read_text()
        new, n = pat.subn(lambda m: MAPPING[m.group(0)], text)
        if n:
            path.write_text(new)
            print(f"{path}: {n} replacements")


if __name__ == "__main__":
    main()
