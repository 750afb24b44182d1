"""Entity resolution (record linkage): blocking + pairwise verify —
the RECORD twin of the document near-dup stack (``operators/dedup``
finds similar texts; this finds records that denote the same
real-world entity under typos and re-entry, the master-data problem
every ERP migration hits — the reference's name-search first-hit
lookup, cubicerpetl.py:595-612, is the 1-row special case of it).

Classic Fellegi–Sunter shape, Spark-first:

* BLOCK: candidates only form inside equal blocking-key groups — an
  equi-join, never all-pairs. Precision/recall of the blocking key is
  the scale knob: at 100 TB you block on several keys and union the
  candidate sets; a hot block (NULL-ish keys) is the same hot-bucket
  exposure ``lsh_candidate_pairs`` documents — cap or split upstream.
* VERIFY: exact per-pair predicates (edit distance, field equality) on
  the candidate set only. ``levenshtein`` is JVM codegen in Spark and
  built-in in DuckDB — the whole chain is oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_pairs(
    df: DataFrame, id_col: str, block_cols: list[str]
) -> DataFrame:
    """Candidate pairs (id_a < id_b) within equal blocking keys.
    Columns: the block keys + every non-key column twice with ``_a`` /
    ``_b`` suffixes. Null-safe on block keys (records with NULL keys
    form their own block rather than silently dropping — the
    ADVICE-r5 interleave lesson)."""
    rest = [c for c in df.columns if c not in block_cols and c != id_col]
    clash = [c for c in df.columns
             if c in (f"{r}_a" for r in rest) or c in (f"{r}_b" for r in rest)
             or c in ("id_a", "id_b")]
    if clash:
        raise ValueError(
            f"columns {clash} collide with the pair suffixes; rename them"
        )
    a = df.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c) for c in block_cols],
        *[F.col(c).alias(f"{c}_a") for c in rest],
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"_bk_{c}") for c in block_cols],
        *[F.col(c).alias(f"{c}_b") for c in rest],
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_bk_{c}"))
    return a.join(b, cond).drop(*[f"_bk_{c}" for c in block_cols])


def verify_links(
    pairs: DataFrame, predicate: Column
) -> DataFrame:
    """Keep candidate pairs satisfying the exact match predicate —
    split out so the candidate count and the verified count can both
    be observed (blocking recall vs verify precision)."""
    return pairs.where(predicate)


def soundex_portable(col: Column | str) -> Column:
    """Portable Soundex blocking key: first letter + three digits from
    the classic letter→code map, adjacent equal codes collapsed,
    vowels dropped after collapsing, zero-padded. The PHONETIC blocking
    key for name-matching (SMITH and SMYTH block together before the
    edit-distance verify).

    Deliberately the h/w-as-vowel VARIANT (H and W map to 0 like
    vowels) rather than ANSI Soundex's "h/w do not separate codes"
    rule: the variant is expressible as a pure translate/regexp chain
    in the RE2-safe subset BOTH Spark and DuckDB execute identically
    (no backreferences — runs collapse via one replace per digit), so
    blocking keys oracle-replay exactly. Spark's built-in ``F.soundex``
    implements the ANSI rule and has no DuckDB twin — don't mix the
    two. Non-letters are stripped first; an empty/garbage name yields
    ``"000"`` (its own block). Pure codegen, map-only at any scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.upper(F.regexp_replace(c, "[^A-Za-z]", ""))
    first = F.substring(u, 1, 1)
    codes = F.translate(
        u, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"
    )
    coll = codes
    for d in "0123456":
        coll = F.regexp_replace(coll, d + "+", d)
    body = F.replace(
        F.substring(coll, 2, F.lit(1 << 30)), F.lit("0"), F.lit("")
    )
    return F.concat(first, F.rpad(F.substring(body, 1, 3), 3, "0"))
