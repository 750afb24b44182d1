"""BPE vocabulary induction — tokenizer training at corpus scale
(Sennrich et al. 2016 — the byte-pair-encoding merge-learning loop
every modern tokenizer starts from; no reference-repo counterpart, part
of the LLM-pipeline extension).

Scale shape — the corpus is touched EXACTLY ONCE:

1. word histogram: one corpus-sized groupBy (map-side combinable) —
   the only stage whose input scales with data;
2. k merge rounds over the BOUNDED vocab table (distinct words):
   each round counts adjacent symbol pairs weighted by word count
   (explode + groupBy over vocab rows), pulls the single argmax row to
   the driver (bounded O(1)/round, the q013-kmeans pattern), and
   rewrites the vocab's symbol strings with one ``replace``.

Symbol representation is the padded string form ``' c h a r s '`` —
merging pair (a, b) is ``replace(sym, ' a b ', ' ab ')``. Plain
left-to-right non-overlapping string replace IS greedy BPE merging
('a a a' + merge (a,a) → 'aa a', exactly the BPE result), and both
Spark's ``replace`` and DuckDB's behave identically — which is what
makes the whole learning loop EXACTLY oracle-replayable (q160 unrolls
the rounds as CTEs). Ties break (count DESC, left ASC, right ASC) in
binary collation on both engines.

Per-round ``localCheckpoint`` keeps the k-round lineage flat (each
round's argmax action would otherwise recompute every prior round —
O(k²)); the checkpointed frame is vocab-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-sized stage."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_learn(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
) -> list[dict]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge table as plain rows:
    ``[{rank, left_sym, right_sym, merged, cnt}, ...]`` (may be shorter
    than ``num_merges`` if the vocab runs out of adjacent pairs).

    Driver state is one argmax row per round — bounded O(num_merges),
    never data-sized; every counting/rewriting stage is Catalyst over
    the vocab table.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    vocab = word_histogram(docs, text_col).select(
        F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 ")).alias("sym"),
        "cnt",
    )
    merges: list[dict] = []
    cur = vocab.localCheckpoint(eager=True)
    for rank in range(num_merges):
        pairs = (
            cur.select("cnt", F.split(F.trim(F.col("sym")), " ").alias("s"))
            .where(F.size("s") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(s) - 2),"
                        " i -> struct(s[i] AS a, s[i + 1] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
        )
        best = pairs.orderBy(F.col("c").desc(), "a", "b").limit(1).collect()
        if not best:
            break
        a, b, c = best[0].a, best[0].b, best[0].c
        merges.append(
            {
                "rank": rank,
                "left_sym": a,
                "right_sym": b,
                "merged": a + b,
                "cnt": int(c),
            }
        )
        cur = cur.select(
            F.replace(
                F.col("sym"), F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
            ).alias("sym"),
            "cnt",
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment_vocab(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to the corpus VOCAB: (word, cnt,
    tokens array) — replaying the merges in rank order on the symbol
    strings. Tokenizing a corpus then reduces to a broadcast join of
    corpus words against this bounded table (words repeat; tokenize
    each distinct word once), never a per-row Python pass over raw
    text."""
    vocab = word_histogram(docs, text_col)
    sym = F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 "))
    for m in sorted(merges, key=lambda m: m["rank"]):
        sym = F.replace(
            sym,
            F.lit(" " + m["left_sym"] + " " + m["right_sym"] + " "),
            F.lit(" " + m["merged"] + " "),
        )
    return vocab.select("w", "cnt", F.split(F.trim(sym), " ").alias("tokens"))
