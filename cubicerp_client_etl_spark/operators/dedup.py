"""Deduplication operators (SURVEY §2.L-dedup).

Exact dedup is a keyed window/aggregate; near-dup is the classic
shingle → MinHash → LSH-band → bucket-join pipeline, built entirely from
DataFrame ops (explode / xxhash64 / groupBy / self-join on band key) so
it scales as shuffles on bounded-size keys instead of an O(n²) compare.
A 100 TB corpus never forms candidate pairs outside shared LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """Keep exactly one row per key group — the first under ``order_by``
    (keep-latest = pass descending ts). Deterministic iff order_by is a
    total order within groups."""
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array of strings (distinct not enforced
    here; MinHash is insensitive to duplicates after the explode-distinct).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """Per-document MinHash signature: (id, h0..h{k-1}).

    One explode + one groupBy with k min-aggregates — a single shuffle on
    the document id. Hash family: xxhash64(shingle, seed_i), deterministic
    across runs and cluster layouts.
    """
    sh = (
        df.select(F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("__sh"))
        .distinct()
    )
    aggs = [
        F.min(F.xxhash64(F.col("__sh"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """Band the signature and self-join on (band_id, band_hash): documents
    agreeing on any full band become a candidate pair. Returns distinct
    (id_a, id_b) with id_a < id_b.

    The self-join key is (band_id, band_hash) — high cardinality, so the
    shuffle is well-spread; hot buckets (boilerplate docs) are the one
    skew risk, handled by AQE skew-join splitting.
    """
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.xxhash64(*cols).alias("band_hash"))
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_id", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for given candidate (id_a, id_b) pairs —
    the verify stage after LSH. Set sizes are precomputed per doc; the
    intersection is one join on shingle value restricted to candidates.
    """
    sh = (
        df.select(F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("sh"))
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ),
        )
        .select("id_a", "id_b", "jaccard")
    )


def simhash_bits(text_col: Column | str, n_bits: int = 64) -> Column:
    """SimHash fingerprint as an ``n_bits``-char '0'/'1' string: for each
    bit position, sum ±1 over token hashes, keep the sign.

    Built as one aggregate over the token array per row (no explode, no
    shuffle): fold token hashes into an n-slot ones-counter, then
    collapse to bits (counter position i holds the count of tokens with
    hash bit 63-i set; sign test 2·ones > n_tokens ≡ Σ±1 > 0). Bit
    extraction is a JVM long ``bitwiseAND`` against a literal mask
    array — integer ops only, no bin()/lpad()/substr string machinery
    in the per-token hot loop (the earlier form built a 64-char string
    per token·bit; this one is pure whole-stage-codegen arithmetic).
    Hamming distance between two fingerprints is then a zip_with sum —
    see ``hamming_distance``.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    # masks[i] = 1 << (63-i) as SIGNED int64 (top bit is the negative
    # literal), matching bin()'s big-endian rendering bit order
    def _signed(m: int) -> int:
        return m - (1 << 64) if m >= (1 << 63) else m

    masks = F.array(
        *[F.lit(_signed(1 << (63 - i))).cast("long") for i in range(n_bits)]
    )
    zeros = F.array_repeat(F.lit(0).cast("long"), n_bits)
    # hash once per token (transform), THEN fold — keeps the hash out
    # of the 64-wide per-position lambda
    tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    ones = F.aggregate(
        tok_hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long"),
        ),
    )
    n_toks = F.size(toks).cast("long")
    bits = F.transform(
        ones, lambda o: F.when(o * 2 > n_toks, F.lit("1")).otherwise(F.lit("0"))
    )
    return F.array_join(bits, "")


def hamming_distance(bits_a: Column, bits_b: Column) -> Column:
    """Hamming distance between two equal-length '0'/'1' fingerprints."""
    return F.size(
        F.filter(
            F.zip_with(
                F.split(bits_a, ""), F.split(bits_b, ""), lambda x, y: x != y
            ),
            lambda d: d,
        )
    )
