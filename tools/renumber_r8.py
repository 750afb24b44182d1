#!/usr/bin/env python
"""One-shot corpus renumbering (round 8).

The driver's CORRECTNESS check covers only the FIRST 50 query names in
sorted order. CHANGES_r7.md lists eight round-7 additions that are
sweep+pytest-verified but have never had a driver-hash row; this swap
moves them into the q001..q050 window, evicting shapes whose family
keeps another in-window driver rep (and the evictee itself keeps full
sweep coverage at both SFs):

  out (family keeps a rep)               in (previously sweep-only)
  -----------------------------------    -------------------------------
  q011 portable HLL   (sketch family: the keyed HLL variant takes the
                       in-window slot; q012 Bloom also in-window;
                       portable HLL driver-hashed r06/r07)
                                         keyed HLL uniques
  q022 value mapping  (C lookups: q025 insert-if-absent + q028 ledger
                       recovery stay in-window; driver-hashed r01-r07)
                                         URL canonicalization
  q023 xmlid resolve  (C lookups: q025/q028 in-window; driver-hashed
                       r01-r07)
                                         Unicode NFC dedup
  q024 incremental dedup (dedup: q030 keep-latest + q013 semantic +
                       q032/q040/q047 in-window; driver-hashed r01-r07)
                                         grouped quantile sketch
  q027 setsim join    (dedup verify: q032 minhash-LSH + q036 linkage
                       levenshtein verify in-window; driver-hashed)
                                         HTML boilerplate strip
  q035 lsh bucketed pairs (LSH: q032 minhash-LSH candidates stays
                       in-window; driver-hashed r04-r07)
                                         quantile sketch audit
  q041 multimodal features (image: JPEG + GIF + WAV codecs take the
                       in-window slots; driver-hashed r02-r07)
                                         JPEG feature histogram
  q042 png histogram  (image decode: driver-hashed r07; JPEG/GIF now
                       rep the codec family in-window)
                                         GIF feature histogram

Pairwise number swaps only — every query keeps its semantic suffix, no
query is added or removed, and the full corpus remains sweep-checked.
Applied once; kept for audit. Mapping is OLD -> NEW full name.
"""

from __future__ import annotations

import pathlib
import re

MAPPING = {
    "q011_hll_portable_cardinality": "q215_hll_portable_cardinality",
    "q215_keyed_hll_uniques": "q011_keyed_hll_uniques",
    "q022_value_mapping": "q213_value_mapping",
    "q213_url_canonicalize": "q022_url_canonicalize",
    "q023_xmlid_resolve": "q211_xmlid_resolve",
    "q211_unicode_nfc_dedup": "q023_unicode_nfc_dedup",
    "q024_incremental_dedup": "q210_incremental_dedup",
    "q210_grouped_quantile_sketch": "q024_grouped_quantile_sketch",
    "q027_setsim_join": "q212_setsim_join",
    "q212_html_strip": "q027_html_strip",
    "q035_lsh_bucketed_pairs": "q209_lsh_bucketed_pairs",
    "q209_quantile_sketch_audit": "q035_quantile_sketch_audit",
    "q041_multimodal_features": "q208_multimodal_features",
    "q208_jpeg_feature_histogram": "q041_jpeg_feature_histogram",
    "q042_png_feature_histogram": "q214_png_feature_histogram",
    "q214_gif_feature_histogram": "q042_gif_feature_histogram",
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
