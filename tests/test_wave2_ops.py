"""Unit tests for the round-6 wave-2 operators: winnowing fingerprints
(operators/winnow.py), portable HLL (operators/sketches.py), hash split
(operators/sampling.py), DSIR importance weights (operators/dsir.py).

Each operator is checked against an independent driver-side Python
reference sharing only the md5 hash definition — the same
exact-arithmetic discipline the DuckDB oracles enforce end-to-end.
"""

from __future__ import annotations

import hashlib
import math
import random
import re
from collections import Counter

import pytest


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---- winnowing ------------------------------------------------------------


def _ref_winnow(text: str, k: int = 8, w: int = 4) -> tuple[int, set[tuple[int, int]]]:
    t = re.sub(r"\s+", " ", text.strip().lower())
    ng = max(len(t) - k + 1, 1)
    hs = [_h32(t[i : i + k] + "|win") for i in range(ng)]
    sel: set[tuple[int, int]] = set()
    for s in range(max(ng - w + 1, 1)):
        window = hs[s : s + w]
        mh = min(window)
        rpos = max(i for i, h in enumerate(window, start=s) if h == mh)
        sel.add((rpos + 1, mh))  # 1-based positions
    return ng, sel


WIN_DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank"),
    (2, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # constant grams → tie-break stress
    (3, "short"),  # < k chars → single whole-text gram
    (4, "The quick brown fox jumps over the lazy dog near another path"),
    (5, "  Mixed   WHITESPACE\tand  CASE text  normalizes the same way "),
]


def test_winnow_matches_python_reference(spark):
    from cubicerp_client_etl_spark.operators.winnow import winnow_fingerprints

    df = spark.createDataFrame(WIN_DOCS, "doc_id bigint, text string")
    got: dict[int, set[tuple[int, int]]] = {}
    ngs: dict[int, int] = {}
    for r in winnow_fingerprints(df, "doc_id", "text").collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp_hash))
        ngs[r.doc_id] = r.n_grams
    for doc_id, text in WIN_DOCS:
        ng, sel = _ref_winnow(text)
        assert ngs[doc_id] == ng, doc_id
        assert got[doc_id] == sel, doc_id


def test_winnow_coverage_guarantee(spark):
    # the paper's guarantee: any shared substring of length k + w - 1
    # (here 11) yields at least one shared fingerprint HASH
    from cubicerp_client_etl_spark.operators.winnow import (
        shared_fingerprint_pairs,
        winnow_fingerprints,
    )

    shared_run = "copied segment appears verbatim here"
    docs = [
        (1, "prefix one two three " + shared_run + " tail alpha"),
        (2, "totally different lead-in words " + shared_run + " other end"),
        (3, "no overlap with anything else in this corpus at all zzz"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    fps = winnow_fingerprints(df, "doc_id", "text")
    pairs = {
        (r.id_a, r.id_b)
        for r in shared_fingerprint_pairs(fps, "doc_id", min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnow_rejects_colliding_temp_columns(spark):
    from cubicerp_client_etl_spark.operators.winnow import winnow_fingerprints

    df = spark.createDataFrame([(1, "x", 0)], "doc_id bigint, text string, _h int")
    with pytest.raises(ValueError, match="_h"):
        winnow_fingerprints(df, "doc_id", "text")


# ---- portable HLL ---------------------------------------------------------


def _ref_hll(keys: list[str], seed: str = "1") -> tuple[list[int], int]:
    regs = [0] * 64
    for kk in keys:
        h = _h32(f"{kk}|hll{seed}")
        b, r = divmod(h, 1 << 26)
        rho = 27 if r == 0 else 27 - r.bit_length()
        regs[b] = max(regs[b], rho)
    denom = sum(1 << (27 - m) for m in regs)
    est = (709_000 * 64 * 64 * (1 << 27)) // (denom * 1_000_000)
    return regs, est


def test_hll_registers_and_estimate_match_reference(spark):
    from cubicerp_client_etl_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    rng = random.Random(11)
    keys = [f"k{rng.randint(0, 5000)}" for _ in range(20000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    regs = hll_registers(df, "k")
    got = {r.bucket: r.m_rho for r in regs.collect()}
    ref_regs, ref_est = _ref_hll(keys)
    assert got == {i: m for i, m in enumerate(ref_regs)}
    row = hll_estimate(regs).collect()[0]
    assert row.hll_est == ref_est
    # HLL's standard error for m=64 is ~1.04/sqrt(64) = 13%; the fixed
    # fixture was chosen to land inside ~1 sigma (some key sets sit 3-4
    # sigma out — the EXACTNESS assertions above are the contract, this
    # line only guards against an estimator-formula regression)
    n_true = len(set(keys))
    assert abs(row.hll_est - n_true) / n_true < 0.2


def test_hll_merge_law(spark):
    # registers of a union == element-wise max of shard registers
    from cubicerp_client_etl_spark.operators.sketches import hll_registers

    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], "k string")
    ra = {r.bucket: r.m_rho for r in hll_registers(a, "k").collect()}
    rb = {r.bucket: r.m_rho for r in hll_registers(b, "k").collect()}
    ru = {
        r.bucket: r.m_rho
        for r in hll_registers(a.unionByName(b), "k").collect()
    }
    assert ru == {i: max(ra[i], rb[i]) for i in range(64)}


# ---- hash split -----------------------------------------------------------


def test_hash_split_partitions_and_is_append_stable(spark):
    from cubicerp_client_etl_spark.operators.sampling import hash_split

    base = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = hash_split(base, "doc_id", salt="s")
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == 2000  # no row dropped, none duplicated
    counts = Counter(rows.values())
    assert set(counts) == {"train", "val", "test"}
    # expectation 90/5/5; allow generous binomial slack at n=2000
    assert 0.85 < counts["train"] / 2000 < 0.95
    # append stability: growing the corpus never reassigns old rows
    grown = hash_split(
        spark.range(4000).withColumnRenamed("id", "doc_id"), "doc_id", salt="s"
    )
    grown_rows = {r.doc_id: r.split for r in grown.collect()}
    assert all(grown_rows[i] == rows[i] for i in rows)
    # membership replays the documented md5 arithmetic
    for i in (0, 7, 1999):
        b = _h32(f"{i}|splits") % 1000
        expect = "train" if b < 900 else ("val" if b < 950 else "test")
        assert rows[i] == expect


def test_hash_split_validates_spec(spark):
    from cubicerp_client_etl_spark.operators.sampling import hash_split

    df = spark.range(1).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", splits=())
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", splits=(("a", 1), ("b", 0)))


# ---- DSIR -----------------------------------------------------------------


def test_dsir_weights_and_scores_match_reference(spark):
    from cubicerp_client_etl_spark.operators.dsir import (
        dsir_bucket_weights,
        dsir_doc_scores,
    )

    B = 32
    docs = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog ate the bone"),
        (3, "xx", "zork blee quux zork frobnicate"),
        (4, "xx", "the zork sat near blee"),
    ]
    rows = [
        (doc_id, lang, t)
        for doc_id, lang, text in docs
        for t in text.split()
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, t string")
    weights = dsir_bucket_weights(
        df, df.where("lang = 'en'"), "t", n_buckets=B, seed="u"
    )
    got_w = {r.b: r.llr_e6 for r in weights.collect()}

    def bucket(t: str) -> int:
        return _h32(f"{t}|dsiru") % B

    raw = Counter(bucket(t) for _, _, t in rows)
    tgt = Counter(bucket(t) for _, lang, t in rows if lang == "en")
    tr, tt = sum(raw.values()), sum(tgt.values())
    ref_w = {
        b: round(
            math.log(
                (float(tgt.get(b, 0) + 1) * (tr + B))
                / (float(raw.get(b, 0) + 1) * (tt + B))
            )
            * 1_000_000
        )
        for b in range(B)
    }
    # Python round is half-even vs Spark ROUND half-up: compare with 1-ulp
    # tolerance at the e6 scale (the oracle comparison is the strict one,
    # DuckDB and Spark both rounding half away from zero)
    assert set(got_w) == set(ref_w)
    assert all(abs(got_w[b] - ref_w[b]) <= 1 for b in ref_w)

    scores = dsir_doc_scores(df, weights, ["doc_id"], "t", n_buckets=B, seed="u")
    got_s = {r.doc_id: (r.n_toks, r.weight_e6) for r in scores.collect()}
    for doc_id, _, text in docs:
        toks = text.split()
        expect = sum(got_w[bucket(t)] for t in toks)
        assert got_s[doc_id] == (len(toks), expect)
    # the English docs must score above the out-of-domain one
    assert got_s[1][1] > got_s[3][1] and got_s[2][1] > got_s[3][1]


def test_dsir_precomputed_bucket_col_matches_default(spark):
    """The r15 hash-once path: passing a pre-hashed ``bucket_col``
    (exactly dsir_bucket(token, B, seed)) must reproduce the default
    hash-per-pass weights AND scores bit-for-bit."""
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators.dsir import (
        dsir_bucket,
        dsir_bucket_weights,
        dsir_doc_scores,
    )

    B = 32
    docs = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog ate the bone"),
        (3, "xx", "zork blee quux zork frobnicate"),
        (4, "xx", "the zork sat near blee"),
    ]
    rows = [
        (doc_id, lang, t)
        for doc_id, lang, text in docs
        for t in text.split()
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, t string")
    w_ref = dsir_bucket_weights(
        df, df.where("lang = 'en'"), "t", n_buckets=B, seed="u"
    )
    s_ref = dsir_doc_scores(df, w_ref, ["doc_id"], "t", n_buckets=B, seed="u")

    dfb = df.withColumn("_b", dsir_bucket(F.col("t"), B, seed="u"))
    w_got = dsir_bucket_weights(
        dfb, dfb.where("lang = 'en'"), "t", n_buckets=B, seed="u",
        bucket_col="_b",
    )
    s_got = dsir_doc_scores(
        dfb, w_got, ["doc_id"], "t", n_buckets=B, seed="u", bucket_col="_b"
    )
    assert sorted(map(tuple, w_got.collect())) == sorted(
        map(tuple, w_ref.collect())
    )
    assert sorted(map(tuple, s_got.collect())) == sorted(
        map(tuple, s_ref.collect())
    )


# ---- BM25 -----------------------------------------------------------------


def test_bm25_matches_python_reference(spark):
    from cubicerp_client_etl_spark.operators.retrieval import bm25_topk

    docs = [
        (1, "apple banana apple cherry"),
        (2, "apple apple apple apple apple apple"),
        (3, "banana cherry durian elderberry fig grape honeydew"),
        (4, "nothing relevant here at all whatsoever"),
        (5, "apple"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    terms = ("apple", "banana")
    got = {
        r.doc_id: (r.n_terms_hit, r.score_e12)
        for r in bm25_topk(df, "doc_id", "text", terms, k=10).collect()
    }

    toks = {d: t.split() for d, t in docs}
    N = len(docs)
    L = sum(len(t) for t in toks.values())
    df_t = {
        t: sum(1 for ts in toks.values() if t in ts) for t in terms
    }
    idf = {
        t: round(math.log(float(N + 1) / (df_t[t] + 0.5)) * 1_000_000)
        for t in terms
    }
    expect = {}
    for d, ts in toks.items():
        score, hits = 0, 0
        for t in terms:
            tf = ts.count(t)
            if tf == 0:
                continue
            hits += 1
            part = (22 * L * tf * 1_000_000) // (
                10 * L * tf + 3 * L + 9 * len(ts) * N
            )
            score += idf[t] * part
        if hits:
            expect[d] = (hits, score)
    # half-even (python round) vs half-up idf rounding can differ by 1
    # at the e6 scale before the tf_part multiply; allow that one ulp
    assert set(got) == set(expect)
    for d in expect:
        assert got[d][0] == expect[d][0]
        assert abs(got[d][1] - expect[d][1]) <= 2_200_000  # 1 e6-ulp × part≤2.2e6 / 1e6
    # saturation: doc 2 (6× apple) must NOT score 6× doc 5 (1× apple)
    assert got[2][1] < 3 * got[5][1]
    # doc 4 matches nothing → absent
    assert 4 not in got


def test_bm25_validates_args(spark):
    from cubicerp_client_etl_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", ())
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", ("x",), k=0)


# ---- PCA power iteration --------------------------------------------------


def test_pca_power_iteration_recovers_planted_direction(spark):
    import numpy as np

    from cubicerp_client_etl_spark.operators.pca import (
        power_iteration_top,
        quantized_vectors,
        scatter_matrix,
    )

    rng = np.random.default_rng(7)
    d, n = 16, 300
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    # planted dominant direction: strong signal along u + isotropic noise
    data = rng.normal(size=(n, 1)) * u * 3.0 + rng.normal(size=(n, d)) * 0.3
    rows = [(i, [float(x) for x in data[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    vecs = quantized_vectors(df, "embedding", "vec_id")
    cm = scatter_matrix(vecs, "vec_id")
    v, lam = power_iteration_top(cm, d=d, iters=3)
    vec = np.zeros(d)
    for r in v.collect():
        vec[r.i - 1] = r.v
    lam0 = lam.collect()[0].lambda0

    # numpy reference on the SAME integer scatter matrix
    A = np.zeros((d, d))
    for r in cm.collect():
        A[r.i - 1, r.j - 1] = r.a
    evals, evecs = np.linalg.eigh(A)
    top = evecs[:, -1]
    cos = abs(vec @ top) / (np.linalg.norm(vec) * np.linalg.norm(top))
    assert cos > 0.999, cos
    # Rayleigh quotient within 1% of the true dominant eigenvalue
    assert abs(lam0 - evals[-1]) / evals[-1] < 0.01

    # determinism: a rerun yields the identical integer vector
    v2, _ = power_iteration_top(cm, d=d, iters=3)
    assert {(r.i, r.v) for r in v2.collect()} == {
        (r.i, r.v) for r in v.collect()
    }


# ---- record linkage -------------------------------------------------------


def test_blocked_linkage_finds_planted_twins_and_keeps_null_blocks(spark):
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators.linkage import (
        blocked_pairs,
        verify_links,
    )

    rows = [
        (1, "Alice Smith", "NY", 100.0),
        (2, "Alice Smyth", "NY", 100.0),   # typo twin of 1, same block
        (3, "Alice Smith", "CA", 100.0),   # same name, different block
        (4, "Bob Jones", "NY", 50.0),
        (5, "Carol White", None, 75.0),
        (6, "Carol Whyte", None, 75.0),    # twin inside the NULL block
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, st string, bal double")
    cand = blocked_pairs(df, "id", ["st"])
    lev = F.levenshtein("name_a", "name_b")
    got = {
        (r.id_a, r.id_b)
        for r in verify_links(
            cand, (lev <= 2) & (F.col("bal_a") == F.col("bal_b"))
        ).collect()
    }
    assert got == {(1, 2), (5, 6)}  # twins linked; NULL block not dropped
    # blocking bounded the candidate set: cross-block pair (1,3) never formed
    cand_pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    assert (1, 3) not in cand_pairs


def test_winnow_inline_digest_equals_windowed(spark):
    from cubicerp_client_etl_spark.operators.winnow import (
        fingerprint_digest,
        winnow_digest_inline,
        winnow_fingerprints,
    )

    df = spark.createDataFrame(WIN_DOCS, "doc_id bigint, text string")
    via_window = {
        (r.doc_id, r.n_grams, r.n_fp, r.fp_digest)
        for r in fingerprint_digest(
            winnow_fingerprints(df, "doc_id", "text", dedup=False), "doc_id"
        ).collect()
    }
    inline = {
        (r.doc_id, r.n_grams, r.n_fp, r.fp_digest)
        for r in winnow_digest_inline(df, "doc_id", "text").collect()
    }
    assert inline == via_window


def test_keyed_pca_matches_per_group_numpy(spark):
    import numpy as np

    from cubicerp_client_etl_spark.operators.pca import (
        power_iteration_top_by,
        quantized_vectors,
        scatter_matrix_by,
    )

    rng = np.random.default_rng(3)
    d = 8
    rows = []
    planted = {}
    for lbl in (0, 1):
        u = rng.normal(size=d)
        u /= np.linalg.norm(u)
        planted[lbl] = u
        data = rng.normal(size=(120, 1)) * u * 3.0 + rng.normal(size=(120, d)) * 0.3
        for i in range(120):
            rows.append((lbl * 1000 + i, lbl, [float(x) for x in data[i]]))
    df = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>"
    )
    vecs = quantized_vectors(df, "embedding", "vec_id", extra=("label",))
    cm = scatter_matrix_by(vecs, "label")
    v, lam = power_iteration_top_by(cm, "label", d=d, iters=3)
    vv = {}
    for r in v.collect():
        vv.setdefault(r.label, np.zeros(d))[r.i - 1] = r.v
    lams = {r.label: r.lambda0 for r in lam.collect()}
    for lbl in (0, 1):
        A = np.zeros((d, d))
        for r in cm.where(cm.label == lbl).collect():
            A[r.i - 1, r.j - 1] = r.a
        evals, evecs = np.linalg.eigh(A)
        top = evecs[:, -1]
        cos = abs(vv[lbl] @ top) / (np.linalg.norm(vv[lbl]) * np.linalg.norm(top))
        assert cos > 0.999, (lbl, cos)
        assert abs(lams[lbl] - evals[-1]) / evals[-1] < 0.01
    # the two labels' planted directions differ, and so do the outputs
    assert (
        abs(vv[0] @ vv[1]) / (np.linalg.norm(vv[0]) * np.linalg.norm(vv[1]))
        < 0.9
    )


def test_pca_top2_matches_numpy_and_is_orthogonal(spark):
    import numpy as np

    from cubicerp_client_etl_spark.operators.pca import (
        power_iteration_top2,
        quantized_vectors,
        scatter_matrix,
    )

    rng = np.random.default_rng(17)
    d, n = 12, 250
    u1 = rng.normal(size=d); u1 /= np.linalg.norm(u1)
    u2 = rng.normal(size=d); u2 -= (u2 @ u1) * u1; u2 /= np.linalg.norm(u2)
    data = (
        rng.normal(size=(n, 1)) * u1 * 4.0
        + rng.normal(size=(n, 1)) * u2 * 2.0
        + rng.normal(size=(n, d)) * 0.2
    )
    rows = [(i, [float(x) for x in data[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cm = scatter_matrix(quantized_vectors(df, "embedding", "vec_id"), "vec_id")
    dirs, lams = power_iteration_top2(cm, d=d, iters=3)
    v1 = np.zeros(d); v2 = np.zeros(d)
    for r in dirs.collect():
        v1[r.i - 1] = r.v1
        v2[r.i - 1] = r.v2
    lr = lams.collect()[0]

    A = np.zeros((d, d))
    for r in cm.collect():
        A[r.i - 1, r.j - 1] = r.a
    evals, evecs = np.linalg.eigh(A)
    t1, t2 = evecs[:, -1], evecs[:, -2]
    cos1 = abs(v1 @ t1) / (np.linalg.norm(v1) * np.linalg.norm(t1))
    cos2 = abs(v2 @ t2) / (np.linalg.norm(v2) * np.linalg.norm(t2))
    assert cos1 > 0.999 and cos2 > 0.99, (cos1, cos2)
    assert abs(lr.lambda0 - evals[-1]) / evals[-1] < 0.01
    assert abs(lr.lambda1 - evals[-2]) / evals[-2] < 0.02
    # integer Gram–Schmidt keeps the directions near-orthogonal
    cos12 = abs(v1 @ v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    assert cos12 < 0.01, cos12
    assert lr.lambda0 > lr.lambda1


def test_new_operator_guards(spark):
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators.linkage import blocked_pairs
    from cubicerp_client_etl_spark.operators.pca import quantized_vectors
    from cubicerp_client_etl_spark.operators.retrieval import bm25_scores
    from cubicerp_client_etl_spark.operators.sampling import hash_split

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="duplicate split names"):
        hash_split(df, "doc_id", splits=(("a", 1), ("a", 2)))
    tdf = df.withColumn("text", F.lit("Vector stream"))
    with pytest.raises(ValueError, match="lowercase"):
        bm25_scores(tdf, "doc_id", "text", ("Vector",))
    edf = df.withColumn("qarr", F.array(F.lit(1.0)))
    with pytest.raises(ValueError, match="qarr"):
        quantized_vectors(edf, "qarr", "doc_id")
    ldf = df.withColumn("st", F.lit("x")).withColumn("name_a", F.lit("y")).withColumn("name", F.lit("z"))
    with pytest.raises(ValueError, match="collide"):
        blocked_pairs(ldf, "doc_id", ["st"])


# ---- hybrid RRF: IVF vector side vs the exact-cosine audit baseline -------


def test_hybrid_rrf_ivf_divergence_vs_exact_fused(spark):
    """q029's vector side is the IVF multi-probe index (32 centroids,
    nprobe=12); the exact full-corpus cosine form it replaced is kept
    here as the audit baseline. The fixture embeddings are random
    vectors — IVF's worst case (no cluster structure) — so some
    divergence is the honest price; the fused top-10 must still
    overlap the exact-fused top-10 >= 8/10 on the sf0.001 fixture,
    and the actual divergence is printed as the recall report."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.catalog import load
    from cubicerp_client_etl_spark.queries import REGISTRY
    from cubicerp_client_etl_spark.operators.similarity import as_double, cosine

    from tests.conftest import SF_SMOKE

    sf = SF_SMOKE
    fused_ivf = [r.doc_id for r in REGISTRY["q219_hybrid_rrf_fusion"].fn(spark, sf).collect()]

    # exact-fused baseline: same lexical side, exact cosine vector side
    from cubicerp_client_etl_spark.queries.pipeline_ext7 import _BM25_TERMS
    from cubicerp_client_etl_spark.operators.retrieval import bm25_scores

    docs = load(spark, sf, "documents").where(F.length(F.trim("text")) > 0)
    lexrank = (
        bm25_scores(docs, "doc_id", "text", _BM25_TERMS)
        .orderBy(F.col("score_e12").desc(), "doc_id")
        .limit(100)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("score_e12").desc(), "doc_id"))
            .cast("bigint")
            .alias("lex_rank"),
        )
    )
    emb = load(spark, sf, "embeddings").select("vec_id", as_double("embedding").alias("v"))
    probe = emb.where(F.col("vec_id") == 0).select(F.col("v").alias("pv"))
    vecrank = (
        emb.where(F.col("vec_id") > 0)
        .join(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("v"), F.col("pv")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "doc_id")
        .limit(100)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("sim").desc(), "doc_id"))
            .cast("bigint")
            .alias("vec_rank"),
        )
    )
    rrf = (
        F.coalesce(F.expr("CAST(1000000 div (60 + lex_rank) AS BIGINT)"), F.lit(0))
        + F.coalesce(F.expr("CAST(1000000 div (60 + vec_rank) AS BIGINT)"), F.lit(0))
    ).cast("bigint")
    fused_exact = [
        r.doc_id
        for r in lexrank.join(vecrank, "doc_id", "full_outer")
        .select("doc_id", rrf.alias("rrf_e6"))
        .orderBy(F.col("rrf_e6").desc(), "doc_id")
        .limit(10)
        .collect()
    ]
    overlap = len(set(fused_ivf) & set(fused_exact))
    print(f"RRF fused-list recall report: overlap {overlap}/10 "
          f"(ivf={fused_ivf}, exact={fused_exact})")
    assert overlap >= 8


def test_ivf_per_probe_candidates_sublinear_with_sqrt_nlist(spark):
    """The amortized-index scale claim measured: with nlist = sqrt(N)
    centroids, the number of candidate rows one probe actually scores
    grows ~sqrt(10)x when the corpus grows 10x — not 10x (the exact
    scan's growth). Deterministic synthetic vectors; candidate count
    is exactly the summed size of the probed clusters."""
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators.similarity import ivf_topk

    def corpus(n):
        rnd = random.Random(7)
        rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(n)]
        return spark.createDataFrame(rows, "vec_id long, v array<double>")

    counts = {}
    for n in (400, 4000):
        emb = corpus(n)
        nlist = int(math.isqrt(n))
        cents = emb.where(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("cid"), F.col("v").alias("cv")
        )
        probe = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
        )
        # candidate mass = rows the rank stage sees before the top-k cut:
        # rebuild the assignment and count members of the probed cells
        topk = ivf_topk(emb, cents, probe, k=n, nprobe=2)
        counts[n] = topk.count()
    ratio = counts[4000] / counts[400]
    print(f"IVF per-probe candidates: {counts} ratio {ratio:.2f}")
    assert ratio < 6.0, counts  # sqrt(10) ~ 3.2 expected; 10x would be linear
