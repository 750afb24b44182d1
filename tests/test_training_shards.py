"""Tests for sinks/writers.write_training_shards — deterministic shard
layout, in-file ordering, and manifest integrity."""

from __future__ import annotations

import glob
import hashlib

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.sinks.writers import write_training_shards

SF = "/root/testdata/sf0.001"


def _shard_of(doc_id: int, n: int, seed: str = "") -> int:
    h = hashlib.md5(f"{doc_id}|shard{seed}".encode()).hexdigest()[:8]
    return int(h, 16) % n


def test_shards_roundtrip_ordering_and_manifest(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, n_shards=8, id_col="doc_id", token_col="n_chars", seed="t"
    )

    back = spark.read.parquet(out)
    rows = {r.doc_id: r for r in back.collect()}
    src = {r.doc_id: r for r in docs.collect()}
    assert set(rows) == set(src)  # nothing lost, nothing invented
    for did, r in rows.items():
        assert r._shard == _shard_of(did, 8, "t")

    # one data file per shard, rows inside ordered by doc_id
    for k in range(8):
        files = [
            f
            for f in glob.glob(f"{out}/_shard={k}/*.parquet")
            if "_manifest" not in f
        ]
        assert len(files) == 1, (k, files)
        ids = [r.doc_id for r in spark.read.parquet(files[0]).collect()]
        assert ids == sorted(ids)

    man = {r.shard: r for r in spark.read.parquet(f"{out}.manifest").collect()}
    per_shard: dict[int, list[int]] = {}
    for did, r in src.items():
        per_shard.setdefault(_shard_of(did, 8, "t"), []).append(r.n_chars)
    assert set(man) == set(range(8))  # every shard reported, even empty
    for k in range(8):
        chars = per_shard.get(k, [])
        assert man[k].n_rows == len(chars)
        assert man[k].n_tokens == sum(chars)


def test_manifest_is_sibling_and_empty_shards_reported(spark, tmp_path):
    """ADVICE r5: the manifest must live OUTSIDE the shard dataset (a
    non-Spark loader globbing path/**/*.parquet must see only document
    rows), and shards that received no documents still get a manifest
    row with n_rows = 0."""
    docs = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "doc_id long, n_chars long"
    )
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, n_shards=16, id_col="doc_id", token_col="n_chars", seed="e"
    )
    # glob safety: no manifest file inside the dataset directory
    inside = glob.glob(f"{out}/**/*.parquet", recursive=True)
    rels = [f[len(out):] for f in inside]
    assert rels and all("manifest" not in r for r in rels)
    man = {r.shard: r for r in spark.read.parquet(f"{out}.manifest").collect()}
    assert set(man) == set(range(16))
    occupied = {_shard_of(d, 16, "e") for d in (1, 2, 3)}
    assert len(occupied) < 16  # fixture guarantees some empty shards
    for k in range(16):
        if k not in occupied:
            assert man[k].n_rows == 0 and man[k].n_tokens == 0
    assert sum(r.n_rows for r in man.values()) == 3
    assert sum(r.n_tokens for r in man.values()) == 60


def test_rewrites_are_idempotent(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4, id_col="doc_id")
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    write_training_shards(docs, out, n_shards=4, id_col="doc_id")
    second = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert first == second
