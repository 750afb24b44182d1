"""Deterministic sampling & mixture weighting (L-pipeline extension).

Training-data pipelines blend corpora at fixed per-source rates ("20%
web, 50% books, …"). ``sample()``-style RNG sampling is partition- and
retry-dependent — rerunning the job yields a different corpus. The
engine's form is KEYED Bernoulli sampling: a row is kept iff the first
8 hex chars of ``md5(key || '|' || seed)`` fall below ``rate·2³²``,
compared as zero-padded lowercase hex STRINGS. Properties:

* deterministic — same key/seed/rate ⇒ same decision on any cluster,
  any partitioning, any retry;
* engine-portable — md5 and substring behave identically in Spark and
  DuckDB, and the hex-string comparison sidesteps integer-conversion
  portability (the reason the driver's oracle can check it exactly);
* map-only — no shuffle, no state; scales to any corpus size;
* composable — different seeds give independent samples (the md5 bits
  are effectively independent across seeds).

The reference has no sampling surface; this generalizes its per-row
routing idea (cubicerpetl.py:494-537 routes per row by mode — here per
row by hash) to corpus construction.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(rate: float) -> str:
    """rate∈[0,1] → 8-hex-char cutoff for the md5 prefix. Rates are
    quantized to k/2³². rate=1.0 returns 'g' — lexicographically above
    every hex string, so `hash < 'g'` keeps ALL rows exactly (a plain
    'ffffffff' cutoff would drop the 2⁻³² hash-prefix collision)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * 2**32), "08x")


def sample_mark(key: Column, rate: float, seed: str = "") -> Column:
    """Boolean keep/drop decision for a deterministic Bernoulli sample."""
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    h = F.substring(F.md5(F.concat(key.cast("string"), F.lit("|" + seed))), 1, 8)
    return h < F.lit(_hex_threshold(rate))


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, seed: str = ""
) -> DataFrame:
    """Keyed Bernoulli sample at ``rate`` — see module docstring."""
    return df.filter(sample_mark(F.col(key_col), rate, seed))


def weighted_mixture(
    df: DataFrame,
    key_col: str,
    group_col: str,
    rates: Mapping[str, float],
    seed: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group mixture sampling in ONE map-only pass: each row's keep
    threshold comes from its ``group_col`` value (e.g. lang or source
    corpus), so the output corpus realizes the requested blend without
    splitting/unioning the input N ways."""
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|" + seed))), 1, 8
    )
    thr: Column = F.lit(_hex_threshold(default_rate))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == g, F.lit(_hex_threshold(r))).otherwise(thr)
    return df.filter(h < thr)
