#!/usr/bin/env python
"""Third round-8 renumbering: the six queries added AFTER the r8b
rotation (k-anonymous release, winsorized stats, currency as-of
conversion, triangle census, geo neighbor join, CDF transform) move
into the first-50 driver-hash window. Evictees all carry r01–r07
driver hashes across multiple rounds and their family keeps coverage
(in-window rep or judge-re-run sweep):

  out (hashed r01-r07; family keeps)     in (added this round)
  -----------------------------------    -------------------------------
  q015 curation pipeline (curation: q010 repetition + q037 text
                       analysis + q049 quality report in-window)
                                         k-anonymous release
  q016 intersect/except (G2: q130 union-all sweep; set-op semantics
                       also pinned in pytest)
                                         winsorized stats
  q019 date pack       (H: q141/q175 sweep; scalar pack pytest golden)
                                         currency as-of conversion
  q025 insert-if-absent (C5: q028 ledger recovery stays in-window as
                       the C-lookup rep; q144 sweep)
                                         co-purchase triangle census
  q026 merge update    (I1: five-mode merge matrix in pytest;
                       q059-q061/q134 sweep)
                                         geo neighbor join
  q046 header/footer broadcast (A3/B8: golden + round-trip pytest;
                       q130 sweep)
                                         CDF transform

Pairwise number swaps only — suffixes preserved, no query added or
removed. Applied once; kept for audit. Mapping is OLD -> NEW name.
"""

from __future__ import annotations

import pathlib
import re

MAPPING = {
    "q015_curation_pipeline": "q224_curation_pipeline",
    "q224_k_anonymous_release": "q015_k_anonymous_release",
    "q016_intersect_except": "q225_intersect_except",
    "q225_winsorized_stats": "q016_winsorized_stats",
    "q019_date_pack": "q226_date_pack",
    "q226_currency_asof_conversion": "q019_currency_asof_conversion",
    "q025_insert_if_absent": "q227_insert_if_absent",
    "q227_copurchase_triangles": "q025_copurchase_triangles",
    "q026_merge_update": "q228_merge_update",
    "q228_geo_neighbor_join": "q026_geo_neighbor_join",
    "q046_header_footer_broadcast": "q229_header_footer_broadcast",
    "q229_cdf_transform": "q046_cdf_transform",
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
