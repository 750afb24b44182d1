"""Sequence packing (L-pipeline extension): greedy contiguous packing
of documents into fixed token budgets — the "sample packing" step that
turns a ragged document corpus into dense fixed-length training
sequences.

True global greedy packing is inherently sequential, so the distributed
form shards first: documents are hash-bucketed on id into ``n_buckets``
independent packing streams, each packed sequentially (ordered by id,
accumulator resets when the budget would overflow) inside one Arrow
batch via ``applyInPandas``. Properties:

* deterministic — bucket id and intra-bucket order derive only from the
  document id, so the assignment is identical under any input
  partitioning, retry, or cluster layout (asserted by tests);
* scalable — buckets pack independently (one shuffle on the bucket id);
  packing efficiency loss vs a single global stream is O(1) sequence
  per bucket, negligible when docs-per-bucket ≫ 1;
* oversize-safe — a document longer than the budget gets its own
  sequence and is flagged, never silently truncated (truncation is a
  tokenizer-level decision, not a packing decision).

Output grain: one row per document with its (bucket, seq_id) assignment
and position; sequence ids are globally unique (bucket ⊕ local ordinal).
The reference has no packing surface; this is engine-native territory.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.prefix import prefix_sum_by


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_tokens: int,
    n_buckets: int = 64,
    bucket_expr: "F.Column | None" = None,
) -> DataFrame:
    """Assign every document to a packed sequence ≤ ``max_tokens``.

    ``bucket_expr`` overrides the default xxhash64 bucket assignment
    (e.g. ``pmod(id, n)`` when the stream must be reproducible in an
    engine without xxhash64 — the oracle-checked q119 path).

    Returns (id, n_tokens, bucket, seq_id, seq_pos, oversize) — one row
    per input document.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")

    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    )
    src = df.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        bucket.cast("long").alias("bucket"),
    )

    out_schema = (
        "id long, n_tokens long, bucket long, seq_id long, "
        "seq_pos int, oversize boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        seq_local, seq_pos, acc = 0, 0, 0
        seq_ids, positions, oversize = [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > max_tokens:
                # oversize doc: its own sequence, flagged
                if acc > 0:
                    seq_local += 1
                seq_ids.append(seq_local)
                positions.append(0)
                oversize.append(True)
                seq_local += 1
                acc, seq_pos = 0, 0
                continue
            if acc + n > max_tokens:
                seq_local += 1
                acc, seq_pos = 0, 0
            seq_ids.append(seq_local)
            positions.append(seq_pos)
            oversize.append(False)
            acc += n
            seq_pos += 1
        pdf["seq_id"] = [bucket * 1_000_000_000 + s for s in seq_ids]
        pdf["seq_pos"] = positions
        pdf["oversize"] = oversize
        return pdf[["id", "n_tokens", "bucket", "seq_id", "seq_pos", "oversize"]]

    return src.groupBy("bucket").applyInPandas(pack, schema=out_schema)


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    bucket_width: int,
    batch_size: int,
    seed: str = "",
) -> DataFrame:
    """Length-bucketed batch assignment — the dynamic-batching layout
    trainers use to cut padding waste: documents are bucketed by
    length band (``tokens div bucket_width``), deterministically
    shuffled WITHIN their band (md5 of the id, so similar-length docs
    still mix across sources/time), and cut into fixed-size batches in
    that order. Padding cost of a batch is then bounded by the band
    width instead of the corpus-wide max length.

    Returns one row per document: all input columns plus ``bucket``
    and ``batch_id`` (0-based within the bucket).

    Scale: the per-bucket running count rides
    ``prefix.prefix_sum_by`` — the keyed two-phase scan — NOT a
    ``row_number() OVER (PARTITION BY bucket)``: length bands are
    low-cardinality (hundreds), so the naive window would funnel each
    band's full row set through one task at corpus scale. The oracle
    states the plain SQL window; the scan is value-identical because
    the (md5, id) order is total.
    """
    base = df.withColumn(
        "bucket", F.expr(f"CAST({tokens_col} div {int(bucket_width)} AS BIGINT)")
    ).withColumn(
        "_sk",
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"|{seed}"))),
    )
    counted = prefix_sum_by(
        base.withColumn("_one", F.lit(1).cast("bigint")),
        keys=["bucket"],
        order_by=[F.col("_sk"), F.col(id_col)],
        value_col="_one",
        out_col="_rn",
    )
    return counted.withColumn(
        "batch_id", F.expr(f"CAST((_rn - 1) div {int(batch_size)} AS BIGINT)")
    ).drop("_one", "_sk", "_rn")
