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


def remove_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 5,
) -> DataFrame:
    """C4-style exact duplicated-span removal (Raffel et al. 2020 §2.2
    removes any three-sentence span occurring more than once in the
    corpus; here the unit is a ``width``-token window): every
    occurrence of a globally-duplicated token ``width``-gram EXCEPT the
    first (smallest ``(doc_id, position)``) has its span's tokens
    deleted from the document.

    Output per input document: ``(id_col, n_tokens, n_removed,
    clean_md5)`` — the md5 of the cleaned re-joined text keeps the
    result value-checkable without shipping full texts.

    Deterministic: the keeper rule is a total order, so the result is
    partition-/retry-independent and engine-portable (oracle replays
    it exactly).

    Scale posture: one window over the shingle key (rank + global
    count in the same pass — this IS the skew point: an ultra-hot
    boilerplate shingle lands its occurrence list on one partition;
    AQE absorbs moderate cases, and the standard mitigation — count
    shingles first, salt or cap the pathological top — composes in
    front of this operator), one span-explode + per-doc distinct
    aggregate, one join back keyed on ``id_col``. Everything else is
    map-side Catalyst HOFs; no Python anywhere.
    """
    from pyspark.sql import Window as W

    if width < 1:
        raise ValueError("width must be >= 1")
    from cubicerp_client_etl_spark.operators.curation import shingles

    toks = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), toks.alias("_t"))

    sh = base.select(
        id_col,
        F.posexplode(shingles(F.col("_t"), width)).alias("_p0", "_v"),
    ).select(id_col, (F.col("_p0") + 1).alias("pos"), "_v")  # 1-based starts

    w = W.partitionBy("_v").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    ranked = sh.select(
        id_col,
        "pos",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(W.partitionBy("_v")).alias("_c"),
    )
    marked = ranked.filter((F.col("_c") > 1) & (F.col("_rn") > 1))

    removed = (
        marked.select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (width - 1))).alias(
                "_idx"
            ),
        )
        .groupBy(id_col)
        .agg(F.collect_set("_idx").alias("_rm"))
    )

    joined = base.join(removed, id_col, "left")
    keep_idx = F.filter(
        F.sequence(F.lit(1), F.size("_t")),
        lambda i: ~F.array_contains(F.col("_rm"), i),
    )
    clean = F.when(
        F.col("_rm").isNull(), F.array_join(F.col("_t"), " ")
    ).otherwise(
        F.array_join(F.transform(keep_idx, lambda i: F.get("_t", i - 1)), " ")
    )
    return joined.select(
        id_col,
        F.size("_t").cast("bigint").alias("n_tokens"),
        F.coalesce(F.size("_rm"), F.lit(0)).cast("bigint").alias("n_removed"),
        F.md5(clean).alias("clean_md5"),
    )


def setsim_join(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: tuple[int, int] = (1, 2),
) -> DataFrame:
    """EXACT Jaccard set-similarity self-join via prefix filtering
    (the PPJoin/AllPairs family, Xiao et al. WWW'08 / Bayardo et al.
    WWW'07) over ``shingle_n``-gram shingle sets — the lossless
    scalable alternative to MinHash: no hash-family false negatives,
    same equi-join shape.

    ``threshold`` is an integer fraction ``(num, den)`` (J >= num/den),
    so every decision is exact integer arithmetic: the verify test is
    ``(den+num)·|∩| >= num·(|a|+|b|)`` and the prefix length is
    ``|s| - ceil(num·|s|/den) + 1`` — bit-identical across engines.

    Prefix principle (lossless): order the shingle universe globally by
    (corpus frequency, shingle) — rarest first; a pair with J >= t must
    share at least one shingle within BOTH sets' prefixes, so the
    candidate join only explodes prefixes (rare shingles ⇒ few
    collisions) instead of whole sets, plus the length filter
    ``den·min >= num·max``. Verification is exact ``array_intersect``.

    Output: ``(id_a, id_b, inter, uni, jaccard_e6)``, id_a < id_b.

    Scale: shingle-frequency aggregate (vocab-sized), per-doc sort by
    a broadcastable frequency table, prefix-keyed equi-join (the
    MinHash-LSH bucket shape — AQE handles hot shingles), verify joins
    keyed on doc id. No all-pairs stage anywhere.
    """
    num, den = threshold
    if not (0 < num <= den):
        raise ValueError("threshold must be a fraction in (0, 1]")
    from cubicerp_client_etl_spark.operators.curation import shingles as _sh

    toks = F.split(F.col(text_col), " ")
    base = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.array_sort(F.array_distinct(_sh(toks, shingle_n))).alias("_set"),
        )
        .filter(F.size("_set") > 0)
        .withColumn("_sz", F.size("_set").cast("bigint"))
    )

    freq = (
        base.select(F.explode("_set").alias("_t"))
        .groupBy("_t")
        .agg(F.count("*").alias("_f"))
    )
    # per-doc shingles ordered rarest-first; prefix length
    # p = sz - ceil(num*sz/den) + 1  (exact integer ceil-div)
    ordered = (
        base.select("_id", "_sz", F.explode("_set").alias("_t"))
        .join(freq, "_t")
        .groupBy("_id", "_sz")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_f", "_t"))),
                lambda s: s["_t"],
            ).alias("_ord")
        )
        .withColumn(
            "_p",
            F.col("_sz")
            - F.expr(f"({num} * _sz + {den} - 1) div {den}")
            + F.lit(1),
        )
        .select(
            "_id",
            "_sz",
            F.slice("_ord", 1, F.col("_p").cast("int")).alias("_pref"),
        )
    )
    pref = ordered.select(
        "_id", "_sz", F.explode("_pref").alias("_t")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._t") == F.col("b._t"))
            & (F.col("a._id") < F.col("b._id"))
            # length filter: den*min >= num*max
            & (den * F.least("a._sz", "b._sz") >= num * F.greatest("a._sz", "b._sz")),
        )
        .select(F.col("a._id").alias("_ida"), F.col("b._id").alias("_idb"))
        .distinct()
    )
    sa = base.select(F.col("_id").alias("_ida"), F.col("_set").alias("_seta"),
                     F.col("_sz").alias("_sza"))
    sb = base.select(F.col("_id").alias("_idb"), F.col("_set").alias("_setb"),
                     F.col("_sz").alias("_szb"))
    verified = (
        cand.join(sa, "_ida")
        .join(sb, "_idb")
        .withColumn(
            "inter", F.size(F.array_intersect("_seta", "_setb")).cast("bigint")
        )
        .withColumn("uni", F.col("_sza") + F.col("_szb") - F.col("inter"))
        .filter((den + num) * F.col("inter") >= num * (F.col("_sza") + F.col("_szb")))
    )
    return verified.select(
        F.col("_ida").alias("id_a"),
        F.col("_idb").alias("id_b"),
        "inter",
        "uni",
        F.expr("1000000 * inter div uni").alias("jaccard_e6"),
    )
