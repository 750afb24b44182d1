"""Unit tests for apply_changelog (history.py) and the per-group cap
samplers (sampling.py) — birth q127–q129 wave (changelog apply now q023)."""

from __future__ import annotations

import pytest

from cubicerp_client_etl_spark.operators.history import apply_changelog
from cubicerp_client_etl_spark.operators.sampling import (
    cap_per_group,
    rate_cap_per_group,
)


def test_apply_changelog_routing(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    chg = spark.createDataFrame(
        [
            (2, "U", "b2", 10, 1),  # update key 2
            (3, "D", None, 10, 2),  # delete key 3
            (4, "I", "d", 10, 3),  # insert new key 4
            (2, "U", "stale", 5, 4),  # older change for 2 — must lose
        ],
        "k long, op string, v string, ts long, eid long",
    )
    out = {
        r["k"]: (r["v"], r["src"])
        for r in apply_changelog(
            base, chg, key="k", op_col="op", order_by=["ts", "eid"], payload=["v"]
        ).collect()
    }
    assert out == {
        1: ("a", "base"),
        2: ("b2", "chg"),
        4: ("d", "chg"),
    }  # 3 deleted, 2 updated by the LATEST change, 4 inserted


def test_apply_changelog_delete_then_reinsert_latest_wins(spark):
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    chg = spark.createDataFrame(
        [(1, "D", None, 1, 1), (1, "I", "a2", 2, 2)],
        "k long, op string, v string, ts long, eid long",
    )
    out = apply_changelog(
        base, chg, key="k", op_col="op", order_by=["ts", "eid"], payload=["v"]
    ).collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "a2")]


def _docs(spark, n_groups=3, per_group=100):
    rows = [
        (g * 10_000 + i, f"g{g}") for g in range(n_groups) for i in range(per_group)
    ]
    return spark.createDataFrame(rows, "doc_id long, grp string")


def test_cap_per_group_exact_n(spark):
    df = _docs(spark)
    out = cap_per_group(df, "grp", "doc_id", n=7, seed="s").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["grp"], set()).add(r["doc_id"])
    assert all(len(v) == 7 for v in by_g.values())
    # deterministic: rerun picks the identical subset
    again = cap_per_group(df.repartition(17), "grp", "doc_id", n=7, seed="s").collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}


def test_cap_per_group_small_group_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny")], "doc_id long, grp string"
    )
    assert cap_per_group(df, "grp", "doc_id", n=40).count() == 2


def test_rate_cap_binomial_near_n(spark):
    df = _docs(spark, n_groups=2, per_group=400)
    out = rate_cap_per_group(df, "grp", "doc_id", n=40, seed="s").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["grp"], 0)
        by_g[r["grp"]] += 1
    # binomial(400, 0.1): mean 40, sd ~6 — allow 4 sd
    assert all(16 <= c <= 64 for c in by_g.values()), by_g
    # groups at or under n are kept whole (threshold 'g')
    small = spark.createDataFrame([(9, "s")], "doc_id long, grp string")
    assert rate_cap_per_group(small, "grp", "doc_id", n=40).count() == 1


def test_rate_cap_deterministic_under_partitioning(spark):
    df = _docs(spark, n_groups=2, per_group=300)
    a = {r["doc_id"] for r in rate_cap_per_group(df, "grp", "doc_id", 25, "z").collect()}
    b = {
        r["doc_id"]
        for r in rate_cap_per_group(df.repartition(13), "grp", "doc_id", 25, "z").collect()
    }
    assert a == b and len(a) > 0


def test_cap_rejects_bad_n(spark):
    df = _docs(spark, 1, 5)
    with pytest.raises(ValueError):
        cap_per_group(df, "grp", "doc_id", n=0)
    with pytest.raises(ValueError):
        rate_cap_per_group(df, "grp", "doc_id", n=0)


def test_bench_load_flags_catch_inflated_median():
    """Round-9 judge finding: q029's driver samples (median 18.2 s,
    best 2.2 s) passed the old spread>2x-median rule because the load
    inflated the median itself. Both signatures must now flag."""
    import bench

    # inflated median, clean best run (the round-9 q029 shape)
    assert bench.load_flags({"q": [2.2, 17.9, 18.2, 18.5, 22.8]}) == ["q"]
    # classic wide spread around a sane median
    assert bench.load_flags({"q": [1.0, 1.1, 1.2, 1.1, 9.0]}) == ["q"]
    # healthy samples: tight spread, median near best
    assert bench.load_flags({"q": [1.0, 1.05, 1.1, 1.02, 1.08]}) == []
    # mild first-run JIT cliff (<2x) must NOT false-positive
    assert bench.load_flags({"q": [1.9, 1.0, 1.05, 1.1, 1.02]}) == []


def test_bench_load_flags_prev_median_rule():
    """Round-10 judge finding: rule 2 (median > 2x min) has a blind
    band just under 2x — the judge's own q001 sample sat at
    median/min = 1.96 unflagged. Rule 3 compares against the PREVIOUS
    round's recorded median (an independent yardstick the current box
    can't inflate): median > 1.5x prev_median flags."""
    import bench

    # the round-10 blind-band shape: median 2.992, best 1.524 (1.96x —
    # rules 1+2 silent), prev round's median 1.6 -> rule 3 flags
    blind = {"q": [1.524, 2.9, 2.992, 3.0, 3.1]}
    assert bench.load_flags(blind) == []  # rules 1+2 alone still blind
    assert bench.load_flags(blind, {"q": 1.6}) == ["q"]
    # same samples but prev median compatible (no drift): no flag
    assert bench.load_flags(blind, {"q": 2.8}) == []
    # missing / zero prev entries never flag or crash
    assert bench.load_flags(blind, {"other": 1.0}) == []
    assert bench.load_flags(blind, {"q": 0.0}) == []
    # healthy run against a healthy prev: silent
    assert bench.load_flags({"q": [1.0, 1.02, 1.05, 1.08, 1.1]}, {"q": 1.0}) == []


def test_spark_warehouse_artifacts_stay_untracked():
    """Round-9 judge housekeeping: the bucketed saveAsTable tests
    create real warehouse dirs and a derby.log — they must stay
    ignored (never tracked, never listed as untracked) so a full
    suite run leaves `git status` clean."""
    import subprocess

    root = "/root/repo"
    arts = ["derby.log", "spark-warehouse", "metastore_db"]
    ign = subprocess.run(
        ["git", "-C", root, "check-ignore", *arts],
        capture_output=True, text=True,
    )
    assert set(ign.stdout.split()) == set(arts), ign.stdout
    tracked = subprocess.run(
        ["git", "-C", root, "ls-files", "--", *arts],
        capture_output=True, text=True,
    )
    assert tracked.stdout.strip() == "", tracked.stdout
    status = subprocess.run(
        ["git", "-C", root, "status", "--porcelain", "--", *arts],
        capture_output=True, text=True,
    )
    assert status.stdout.strip() == "", status.stdout
