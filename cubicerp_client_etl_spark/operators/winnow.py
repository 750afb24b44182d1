"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — "Winnowing: Local Algorithms for Document
Fingerprinting").

The copy-detection fingerprint MOSS uses: hash every character k-gram
of the normalized text, slide a window of ``w`` consecutive k-gram
hashes over the document, and record the MINIMUM hash of each window
(rightmost position on ties). The selected (position, hash) set is a
guaranteed-coverage fingerprint — any shared substring of length
``k + w - 1`` between two documents yields at least one shared
fingerprint — with expected density 2/(w+1), so it is both local
(per-document, no corpus state) and tunable.

This rounds out the repo's fingerprint family: whole-doc md5
(``text.fingerprint``), token-set md5 (``retention``), SimHash bit
votes (``dedup``), MinHash shingle sketches (``dedup``) — winnowing is
the POSITIONAL one, the only member that localizes *where* the overlap
is, which is what plagiarism/citation/provenance tooling needs.

Spark shape (100 TB posture): normalization and k-gram expansion are
pure map stages; the window minimum is a frame window PARTITIONED BY
the document id — a high-cardinality key, so no task ever holds more
than one document's grams (the opposite of the q141-class
low-cardinality trap) — and the per-row fan-out is bounded by document
length. No corpus-wide state, no self-join, one keyed exchange.

Engine portability: the hash is the repo's md5_hash32 family, and the
(min-hash, rightmost-position) pair is packed into ONE bigint key
``h * 2^31 + (2^31 - pos)`` so a single MIN aggregate implements the
"smallest hash, rightmost tie" rule exactly — DuckDB replays the whole
selection bit-for-bit (reference has no fingerprinting surface; this
extends cubicerpetl.py:494-537's per-row mapping toward provenance).

The pack is exact: h < 2^32 and pos >= 1 keep the key strictly below
2^63; integer div/mod unpack it losslessly (``div``/``%`` — never
doubles, which lose integers past 2^53).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_POW31 = 2_147_483_648  # 2^31: pack base for (hash, rightmost-pos)


def normalize_text(col: Column | str) -> Column:
    """Winnowing canonical form: lowercase, whitespace runs collapsed
    to one space, outer whitespace trimmed (so formatting edits don't
    shift fingerprints). COLLAPSE-THEN-TRIM, deliberately: SQL trim
    (Spark and DuckDB alike) strips SPACES only, so trimming first
    leaks outer tabs/newlines into the normal form as a stray space —
    found by tests/test_winnow_property.py; collapsing first reduces
    every whitespace run to ' ' where trim can reach it."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    dedup: bool = True,
) -> DataFrame:
    """Per-document winnowing fingerprint set.

    Returns ``(id_col, n_grams bigint, pos bigint, fp_hash bigint)``:
    one row per selected fingerprint — ``pos`` is the 1-based k-gram
    position in the normalized text, ``fp_hash`` the md5_hash32 of that
    k-gram. Documents shorter than ``k`` chars contribute one gram (the
    whole normalized text), so every document gets >= 1 fingerprint.

    Selection rule (the paper's robust-winnowing minimum): for every
    window start ``s`` in [1, max(n_grams - w + 1, 1)] take the k-gram
    with the smallest hash in positions [s, s + w - 1], rightmost on
    ties; the fingerprint set is the distinct selections.

    ``dedup=False`` skips the global distinct (adjacent windows often
    select the same gram, so rows repeat up to w×): the selected
    multiset is already correct per window, and consumers that
    aggregate per document anyway (``fingerprint_digest`` uses
    collect_set) dedup inside their own aggregation — dropping the
    distinct removes one corpus-wide shuffle, and the window's
    doc-keyed exchange is reused by the downstream doc-keyed groupBy.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    for tmp in ("_norm", "_ng", "_i", "_h", "_ck", "_mc"):
        if tmp in docs.columns:
            raise ValueError(f"winnow temporary column {tmp!r} collides with input")
    d = docs.select(
        id_col,
        normalize_text(text_col).alias("_norm"),
    ).withColumn("_ng", F.greatest(F.length("_norm") - F.lit(k - 1), F.lit(1)))
    from cubicerp_client_etl_spark.functions import md5_hash32

    grams = d.select(
        id_col,
        "_ng",
        F.explode(F.sequence(F.lit(1), F.col("_ng"))).alias("_i"),
        "_norm",
    ).select(
        id_col,
        "_ng",
        "_i",
        md5_hash32(
            F.concat(F.col("_norm").substr(F.col("_i"), F.lit(k)), F.lit("|win"))
        ).alias("_h"),
    )
    # pack (hash, rightmost-pos) so MIN picks smallest hash then largest
    # position: pos >= 1 keeps the key < 2^63 even at h = 2^32 - 1
    packed = grams.withColumn(
        "_ck",
        F.col("_h") * F.lit(_POW31) + (F.lit(_POW31) - F.col("_i")),
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("_i")
        .rowsBetween(Window.currentRow, w - 1)
    )
    starts = packed.withColumn("_mc", F.min("_ck").over(win)).where(
        F.col("_i") <= F.greatest(F.col("_ng") - F.lit(w - 1), F.lit(1))
    )
    sel = starts.select(
        id_col,
        F.col("_ng").cast("bigint").alias("n_grams"),
        (F.lit(_POW31) - F.expr(f"_mc % {_POW31}")).cast("bigint").alias("pos"),
        F.expr(f"_mc div {_POW31}").cast("bigint").alias("fp_hash"),
    )
    return sel.distinct() if dedup else sel


def fingerprint_digest(fps: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Collapse a fingerprint set to one row per document:
    ``(id_col, n_grams, n_fp, fp_digest)`` where ``fp_digest`` is the
    md5 of the distinct 'pos:hash' pairs sorted as strings (binary
    UTF-8 order — identical in Spark's array_sort and DuckDB's ORDER
    BY). Deduplicates inside the aggregate (collect_set), so it
    accepts ``winnow_fingerprints(dedup=False)`` output directly —
    one shuffle total, reusing the selection window's doc-keyed
    exchange."""
    # concat of casts, not format_string: java.util.Formatter is the
    # digest chain's hot spot (same bytes for non-negative ints)
    pair = F.concat(
        F.col("pos").cast("string"), F.lit(":"), F.col("fp_hash").cast("string")
    )
    return (
        fps.select(id_col, "n_grams", pair.alias("_p"))
        .groupBy(id_col)
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.size(F.collect_set("_p")).cast("bigint").alias("n_fp"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_set("_p"))).cast("binary")
            ).alias("fp_digest"),
        )
    )


def shared_fingerprint_pairs(
    fps: DataFrame, id_col: str = "doc_id", min_shared: int = 2
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` fingerprint HASHES
    (position-independent — winnowing guarantees any shared run of
    ``k + w - 1`` chars shares a hash, so this is the copy-candidate
    join). Equi-join on the hash value — bucketed like LSH bands, never
    all-pairs; a boilerplate hash shared by |occ| docs fans out |occ|²,
    the same hot-bucket exposure ``lsh_candidate_pairs`` documents
    (cap upstream if the corpus has giant boilerplate)."""
    a = fps.select(F.col(id_col).alias("id_a"), "fp_hash")
    b = fps.select(F.col(id_col).alias("id_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count_distinct("fp_hash").cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def winnow_digest_inline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """SHUFFLE-FREE winnowing digest: the whole selection — k-gram
    hashes, per-window packed minima, dedup, digest — runs as array
    expressions INSIDE each row (winnowing is a per-document local
    algorithm, so nothing about it needs an exchange; the windowed
    form in ``winnow_fingerprints`` exists for consumers that want
    one ROW per fingerprint).

    Returns ``(id_col, n_grams, n_fp, fp_digest)`` — identical values
    to ``fingerprint_digest(winnow_fingerprints(...))``, as a pure map
    stage: embarrassingly parallel at any corpus size, and directly
    usable on a STREAM (no state, no watermark —
    ``streaming/jobs.stream_winnow_digest`` wraps it). Per-row cost is
    O(n_grams · w) slice+min work in codegen. (A classical
    rolling-polynomial gram hash was prototyped as a faster family and
    measured SLOWER than this md5 form on the fixture corpus — the
    per-element HOF overhead of a char-codes array dominates the JVM's
    MessageDigest, so the portable md5 family stays the only one.)
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    for tmp in ("_norm", "_ng", "_packed", "_sel"):
        if tmp in docs.columns:
            raise ValueError(f"winnow temporary column {tmp!r} collides with input")
    from cubicerp_client_etl_spark.functions import md5_hash32

    # Each intermediate array must be materialized as a COLUMN before a
    # lambda references it: HOF lambda bodies are evaluated per element
    # with no loop-invariant hoisting, so an inlined `packed` would be
    # recomputed per window — O(ng²·w) md5 calls per row instead of
    # O(ng) (measured 118 s vs 4 s on the 500-doc fixture). Catalyst's
    # CollapseProject re-inlines a once-referenced projection, undoing
    # the materialization — so every projection below references its
    # child's array column TWICE (Catalyst does not collapse non-cheap
    # expressions with multiple references); the unit equivalence test
    # plus fixture runtime guard the shape.
    norm = normalize_text(text_col)
    d = docs.select(id_col, norm.alias("_norm"))
    d = d.select(
        id_col,
        # second _norm reference (with the lambda's) blocks collapse —
        # an inlined norm would re-run the regexp per k-gram
        F.greatest(F.length("_norm") - F.lit(k - 1), F.lit(1)).alias("_ng"),
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.length("_norm") - F.lit(k - 1), F.lit(1)),
            ),
            lambda i: md5_hash32(
                F.concat(F.col("_norm").substr(i, F.lit(k)), F.lit("|win"))
            )
            * F.lit(_POW31)
            + (F.lit(_POW31) - i),
        ).alias("_packed"),
    )
    d = d.select(
    id_col,
    "_ng",
    F.array_distinct(
        F.transform(
            # size(_packed) (== _ng) as the bound: the second
            # _packed reference that keeps the projection boundary
            F.sequence(
                F.lit(1),
                F.greatest(F.size("_packed") - F.lit(w - 1), F.lit(1)),
            ),
            # window min as an UNROLLED least of w null-safe gets
            # (least skips the NULLs a truncated final window
            # produces) — ~2.4× faster than array_min(slice(...)),
            # which allocates a w-element array per window
            lambda s: F.least(
                *[F.get(F.col("_packed"), s + F.lit(o) - 1) for o in range(w)]
            )
            if w > 1
            else F.get(F.col("_packed"), s - 1),
        )
    ).alias("_sel"),
    )
    # unpack with bit ops — ck < 2^63 with the hash in bits 31..62, so
    # >>31 / &(2^31-1) are exact (never a double division, which loses
    # integers past 2^53)
    # concat of casts, not format_string (java.util.Formatter): same
    # bytes for non-negative ints at a fraction of the per-element cost
    pairs = F.transform(
        F.col("_sel"),
        lambda c: F.concat(
            (F.lit(_POW31) - c.bitwiseAND(F.lit(_POW31 - 1))).cast("string"),
            F.lit(":"),
            F.shiftright(c, 31).cast("string"),
        ),
    )
    return d.select(
        id_col,
        F.col("_ng").cast("bigint").alias("n_grams"),
        F.size(F.col("_sel")).cast("bigint").alias("n_fp"),
        F.md5(F.concat_ws(",", F.array_sort(pairs)).cast("binary")).alias(
            "fp_digest"
        ),
    )
