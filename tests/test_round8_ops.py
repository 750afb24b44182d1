"""Round-8 operator tests: Luhn PII, epoch allocation, vocab growth,
sorted-neighborhood blocking, bucketed negative sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- Luhn ----


def _py_luhn(s: str) -> bool:
    if not (13 <= len(s) <= 19):
        return False
    t = 0
    for i, ch in enumerate(s[::-1], 1):
        d = int(ch)
        if i % 2 == 1:
            t += d
        else:
            dd = 2 * d
            t += dd - 9 if dd > 9 else dd
    return t % 10 == 0


def test_luhn_valid_matches_reference(spark):
    from cubicerp_client_etl_spark.operators.text import luhn_valid

    cases = [
        "4111111111111111",  # classic Visa test number — valid
        "4111111111111112",  # off-by-one check digit — invalid
        "79927398713",       # valid Luhn but 11 digits — too short
        "4222222222222",     # 13-digit Visa test number — valid
        "1234567890123456789",  # 19 digits
        "12345678901234567890",  # 20 digits — too long
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r.s: r.ok for r in df.select("s", luhn_valid("s").alias("ok")).collect()}
    for c in cases:
        assert got[c] == _py_luhn(c), c


def test_card_candidates_extract_and_strip(spark):
    from cubicerp_client_etl_spark.operators.text import card_candidates

    df = spark.createDataFrame(
        [("pay 4111 1111 1111 1111 or 4222-2222-2222-2 ok 123",)], "t string"
    )
    (row,) = df.select(card_candidates("t").alias("c")).collect()
    assert row.c == ["4111111111111111", "4222222222222"]


# ---------------------------------------------------- epoch allocation ----


def test_epoch_allocation_caps_and_redistributes(spark):
    from cubicerp_client_etl_spark.operators.budget import epoch_allocation

    # 'tiny' holds 10 tokens (cap 40 at max_epochs=4), 'big' holds 1000.
    # budget=200 → even split 100/100; tiny caps at 40, hands back 60;
    # big's headroom is 3900 → extra = 60*3900 div 3900 = 60 → 160.
    rows = [("tiny", 10), ("big", 1000)]
    df = spark.createDataFrame(rows, "domain string, tok int")
    out = {
        r.domain: r
        for r in epoch_allocation(df, "domain", "tok", budget=200, max_epochs=4)
        .collect()
    }
    t, b = out["tiny"], out["big"]
    assert (t.share, t.allocated, t.full_epochs, t.partial_tokens) == (100, 40, 4, 0)
    assert t.epochs_e6 == 4_000_000
    assert (b.share, b.allocated) == (100, 160)
    assert (b.full_epochs, b.partial_tokens) == (0, 160)
    assert b.epochs_e6 == 160_000


def test_epoch_allocation_no_cap_no_redistribution(spark):
    from cubicerp_client_etl_spark.operators.budget import epoch_allocation

    df = spark.createDataFrame([("a", 500), ("b", 700)], "domain string, tok int")
    out = {r.domain: r for r in
           epoch_allocation(df, "domain", "tok", budget=301, max_epochs=4).collect()}
    # largest-remainder even split: 301 div 2 = 150, first domain by name +1
    assert out["a"].share == 151 and out["b"].share == 150
    assert out["a"].allocated == 151 and out["b"].allocated == 150
    assert sum(r.allocated for r in out.values()) == 301


def test_epoch_allocation_all_capped_leaves_pool_unallocated(spark):
    from cubicerp_client_etl_spark.operators.budget import epoch_allocation

    df = spark.createDataFrame([("a", 1), ("b", 2)], "domain string, tok int")
    out = {r.domain: r for r in
           epoch_allocation(df, "domain", "tok", budget=1000, max_epochs=2).collect()}
    # every domain caps; no headroom anywhere → extra 0, surplus reported
    assert out["a"].allocated == 2 and out["b"].allocated == 4
    assert out["a"].full_epochs == 2 and out["b"].full_epochs == 2


def test_epoch_allocation_never_exceeds_cap_when_overbudgeted(spark):
    from cubicerp_client_etl_spark.operators.budget import epoch_allocation

    # ADVICE r8: budget > max_epochs × total tokens used to over-
    # allocate — extra = (_unused*head) div _thead could exceed head
    # (verified: c_tokens=100, max_epochs=2, budget=300 with a capped
    # sibling → allocated 298, epochs_e6 2.98M > 2M). The redistribution
    # is now clamped to each domain's headroom.
    rows = [("a", 1), ("b", 100)]
    df = spark.createDataFrame(rows, "domain string, tok int")
    out = {r.domain: r for r in
           epoch_allocation(df, "domain", "tok", budget=300, max_epochs=2)
           .collect()}
    for r in out.values():
        assert r.allocated <= 2 * r.c_tokens, r
        assert r.epochs_e6 <= 2_000_000, r
    # a caps at 2, b caps at 200: total allocated 202, surplus 98 stays
    # unallocated (reported via allocated < share), never over the cap
    assert out["a"].allocated == 2 and out["b"].allocated == 200
    assert sum(r.allocated for r in out.values()) == 202


def test_epoch_allocation_rejects_bad_args(spark):
    from cubicerp_client_etl_spark.operators.budget import epoch_allocation

    df = spark.createDataFrame([("a", 1)], "domain string, tok int")
    with pytest.raises(ValueError):
        epoch_allocation(df, "domain", "tok", budget=-1)
    with pytest.raises(ValueError):
        epoch_allocation(df, "domain", "tok", budget=10, max_epochs=0)


# -------------------------------------------------------- vocab growth ----


def test_vocab_growth_hand_computed(spark):
    from cubicerp_client_etl_spark.operators.curation import vocab_growth

    # ids 0..3, 2 buckets: bucket = (id*2) div 4 → {0,1}->0, {2,3}->1
    rows = [
        (0, "a b a"),   # bucket 0: a×2 b×1
        (1, "b c"),     # bucket 0: b c
        (2, "c d"),     # bucket 1: c d
        (3, "d d e"),   # bucket 1: d×2 e
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.bucket: r for r in vocab_growth(df, n_buckets=2).collect()}
    b0, b1 = out[0], out[1]
    assert (b0.tokens, b0.tokens_cum) == (5, 5)
    assert (b1.tokens, b1.tokens_cum) == (5, 10)
    # new words: b0 {a,b,c}, b1 {d,e}
    assert (b0.vocab_new, b0.vocab_cum) == (3, 3)
    assert (b1.vocab_new, b1.vocab_cum) == (2, 5)
    # singletons so far: after b0 → c (a=2,b=2); after b0+b1 → e (c=2,d=3)
    assert b0.n1_cum == 1
    assert b1.n1_cum == 1


def test_vocab_growth_rejects_bad_args(spark):
    from cubicerp_client_etl_spark.operators.curation import vocab_growth

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        vocab_growth(df, n_buckets=0)


# ---------------------------------------------- sorted neighborhood ----


def _global_snm_reference(rows, window):
    """Brute-force classic SNM: global sort, each row pairs with its
    window-1 successors."""
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    pairs = set()
    for i, (ida, _) in enumerate(order):
        for j in range(i + 1, min(i + window, len(order))):
            idb = order[j][0]
            pairs.add((min(ida, idb), max(ida, idb)))
    return pairs


def test_snm_matches_global_reference_when_blocks_are_big_enough(spark):
    from cubicerp_client_etl_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    # 3 prefix blocks ('aa','ab','ba'), each ≥ window rows → the
    # blocked + boundary construction must equal the global slide
    rows = [
        (1, "aa alpha"), (2, "aa beta"), (3, "aa gamma"), (4, "aa zeta"),
        (5, "ab one"), (6, "ab two"), (7, "ab three"), (8, "ab four"),
        (9, "ba x"), (10, "ba y"), (11, "ba z"), (12, "ba w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "doc_id", F.col("k"), window=3, prefix_len=2
        ).collect()
    }
    assert got == _global_snm_reference(rows, 3)


def test_snm_boundary_pairs_labeled_and_exact(spark):
    from cubicerp_client_etl_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = [(1, "aa p"), (2, "aa q"), (3, "aa r"),
            (4, "bb p"), (5, "bb q"), (6, "bb r")]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    out = sorted_neighborhood_pairs(
        df, "doc_id", F.col("k"), window=3, prefix_len=2
    ).collect()
    boundary = {(r.id_a, r.id_b) for r in out if r.via == "boundary"}
    # global order 1,2,3,4,5,6 with w=3: cross pairs are (2,4),(3,4),(3,5)
    assert boundary == {(2, 4), (3, 4), (3, 5)}


def test_snm_recall_edge_block_of_window_minus_2_drops_chain_pair(spark):
    from cubicerp_client_etl_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    # Documented recall edge (bound corrected in ADVICE r8): boundary
    # recovery pairs ADJACENT blocks only, so chain pairs into the
    # block-after-next are lost whenever a block holds fewer than
    # window−1 rows. A middle block of exactly window−2 rows still
    # drops the distance-(window−1) pair — here (3,6) at window=4.
    rows = [(1, "aa p"), (2, "aa q"), (3, "aa r"),
            (4, "bb p"), (5, "bb q"),
            (6, "cc p"), (7, "cc q"), (8, "cc r")]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "doc_id", F.col("k"), window=4, prefix_len=2
        ).collect()
    }
    want_global = _global_snm_reference(rows, 4)
    assert want_global - got == {(3, 6)}
    assert got <= want_global


def test_snm_block_cap_truncates_hot_block(spark):
    from cubicerp_client_etl_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    # one hot prefix with 50 rows; cap at 5 → candidates only among the
    # 5 smallest keys of the block
    rows = [(i, f"zz {i:03d}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    out = sorted_neighborhood_pairs(
        df, "doc_id", F.col("k"), window=3, prefix_len=2, block_cap=5
    ).collect()
    ids = {r.id_a for r in out} | {r.id_b for r in out}
    assert ids <= {0, 1, 2, 3, 4}
    assert len(out) == 3 + 2 + 1 + 1  # w-1 successors within 5 rows


def test_snm_rejects_bad_args(spark):
    from cubicerp_client_etl_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, k string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "doc_id", F.col("k"), window=1)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "doc_id", F.col("k"), prefix_len=0)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "doc_id", F.col("k"), window=4, block_cap=2)


# ------------------------------------------- bucketed negative sample ----


def test_negative_sample_excludes_self_and_label(spark):
    from cubicerp_client_etl_spark.operators.sampling import (
        bucketed_negative_sample,
    )

    rows = [(i, i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, label int")
    out = bucketed_negative_sample(
        df, df, "vec_id", "vec_id", exclude_on="label", k=4, n_buckets=8
    ).collect()
    lab = {i: i % 3 for i in range(60)}
    assert out, "sampler produced no rows"
    for r in out:
        assert r.neg_id != r.vec_id
        assert lab[r.neg_id] != lab[r.vec_id]
        assert 1 <= r.probe <= 4
    # at most one pick per (anchor, probe)
    keys = [(r.vec_id, r.probe) for r in out]
    assert len(keys) == len(set(keys))


def test_negative_sample_is_deterministic(spark):
    from cubicerp_client_etl_spark.operators.sampling import (
        bucketed_negative_sample,
    )

    rows = [(i, i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, label int").repartition(7)
    a = sorted(
        map(tuple, bucketed_negative_sample(
            df, df, "vec_id", "vec_id", exclude_on="label", k=3, n_buckets=4
        ).collect())
    )
    b = sorted(
        map(tuple, bucketed_negative_sample(
            df.repartition(2), df.repartition(13), "vec_id", "vec_id",
            exclude_on="label", k=3, n_buckets=4
        ).collect())
    )
    assert a == b


def test_negative_sample_matches_bruteforce_spec(spark):
    """Per (anchor, probe): the md5-smallest admissible candidate in the
    probed bucket — replicated in plain Python."""
    import hashlib

    from cubicerp_client_etl_spark.operators.sampling import (
        bucketed_negative_sample,
    )

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    n, k, nb = 30, 2, 4
    lab = {i: i % 2 for i in range(n)}
    want = {}
    for aid in range(n):
        for j in range(1, k + 1):
            bkt = h32(f"{aid}|{j}|") % nb
            cands = [
                c for c in range(n)
                if h32(f"{c}|") % nb == bkt and c != aid and lab[c] != lab[aid]
            ]
            if cands:
                want[(aid, j)] = min(
                    cands,
                    key=lambda c: hashlib.md5(f"{aid}|{c}|{j}|".encode()).hexdigest(),
                )
    df = spark.createDataFrame(
        [(i, lab[i]) for i in range(n)], "vec_id long, label int"
    )
    got = {
        (r.vec_id, r.probe): r.neg_id
        for r in bucketed_negative_sample(
            df, df, "vec_id", "vec_id", exclude_on="label", k=k, n_buckets=nb
        ).collect()
    }
    assert got == want


def test_negative_sample_rejects_bad_args(spark):
    from cubicerp_client_etl_spark.operators.sampling import (
        bucketed_negative_sample,
    )

    df = spark.createDataFrame([(1, 0)], "vec_id long, label int")
    with pytest.raises(ValueError):
        bucketed_negative_sample(df, df, "vec_id", "vec_id", k=0)
    with pytest.raises(ValueError):
        bucketed_negative_sample(df, df, "vec_id", "vec_id", n_buckets=0)


# ------------------------------------------------------ streaming twin ----


def test_stream_pii_card_audit_matches_batch(spark):
    """The Luhn audit is stateless map-only: streaming output must be
    row-identical to the batch run over the same fixture (card texts
    planted so the counts are non-trivial)."""
    from cubicerp_client_etl_spark.streaming.jobs import (
        documents_stream,
        run_stream_to_memory,
        stream_pii_card_audit,
    )

    sf = "/root/testdata/sf0.001"
    plant = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit("pay 4111 1111 1111 1111 and 4111111111111112 ref "),
            F.col("text"),
        ),
    ).otherwise(F.col("text"))
    got = run_stream_to_memory(
        stream_pii_card_audit(
            documents_stream(spark, sf).withColumn("text", plant)
        ),
        "pii_stream",
        output_mode="append",
    )
    stream_rows = {
        r.doc_id: (r.n_cands, r.n_valid, r.n_invalid) for r in got.collect()
    }
    batch = (
        spark.read.parquet(f"{sf}/documents.parquet").withColumn("text", plant)
    )
    batch_rows = {
        r.doc_id: (r.n_cands, r.n_valid, r.n_invalid)
        for r in stream_pii_card_audit(batch).collect()
    }
    assert stream_rows == batch_rows and stream_rows
    # planted docs carry one valid + one invalid card
    planted = [v for k, v in batch_rows.items() if k % 3 == 0]
    assert planted and all(v[1] >= 1 and v[2] >= 1 for v in planted)


# -------------------------------------------------------- HLL algebra ----


def test_hll_set_algebra_self_union_is_identity(spark):
    """Max-merging a register table with itself is a no-op, so
    est_union == est_a == est_b and est_inter == est_a."""
    from cubicerp_client_etl_spark.operators.sketches import hll_set_algebra

    df = spark.range(500).select(F.col("id").alias("k"))
    (r,) = hll_set_algebra(df, "k", df, "k").collect()
    assert r.est_union == r.est_a == r.est_b
    assert r.est_inter == r.est_a
    assert r.est_inter_raw == r.est_a


def test_hll_set_algebra_subset_and_disjoint(spark):
    from cubicerp_client_etl_spark.operators.sketches import hll_set_algebra

    sub = spark.range(200).select(F.col("id").alias("k"))
    full = spark.range(1000).select(F.col("id").alias("k"))
    (r,) = hll_set_algebra(sub, "k", full, "k").collect()
    # A ⊆ B → union register table == B's → est_union == est_b,
    # est_inter == est_a exactly (register identity, not approximation)
    assert r.est_union == r.est_b
    assert r.est_inter == r.est_a
    disj = spark.range(1000, 2000).select(F.col("id").alias("k"))
    (d,) = hll_set_algebra(sub, "k", disj, "k").collect()
    # disjoint: inclusion–exclusion error is bounded by sketch error;
    # clamp keeps the reported intersection non-negative
    assert d.est_inter >= 0
    assert d.est_inter == max(d.est_inter_raw, 0)


def test_hll_set_algebra_estimates_are_in_hll_error_range(spark):
    from cubicerp_client_etl_spark.operators.sketches import hll_set_algebra

    a = spark.range(3000).select(F.col("id").alias("k"))
    b = spark.range(1500, 4500).select(F.col("id").alias("k"))
    (r,) = hll_set_algebra(a, "k", b, "k").collect()
    # m=64 → relative error ~1.04/√64 ≈ 13%; allow 3σ
    assert abs(r.est_union - 4500) / 4500 < 0.4
    assert abs(r.est_inter - 1500) / 1500 < 1.0  # intersection compounds error


# ------------------------------------------------------------ soundex ----


def _py_soundex_variant(name: str) -> str:
    """Pure-Python reference of the h/w-as-vowel portable variant."""
    u = "".join(ch for ch in name.upper() if ch.isalpha())
    table = dict(zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"))
    codes = "".join(table[ch] for ch in u)
    coll = []
    for ch in codes:
        if not coll or coll[-1] != ch:
            coll.append(ch)
    body = "".join(coll)[1:].replace("0", "")
    return (u[:1]) + (body[:3]).ljust(3, "0")


def test_soundex_portable_matches_reference(spark):
    from cubicerp_client_etl_spark.operators.linkage import soundex_portable

    names = ["SMITH", "SMYTH", "SMOOT", "JOHNSON", "JONSON", "JANSEN",
             "MEYER", "MAYER", "PFISTER", "Washington", "O'Brien",
             "de la Cruz", "", "42", "Tymczak", "Ashcraft"]
    df = spark.createDataFrame([(n,) for n in names], "n string")
    got = {r.n: r.s for r in
           df.select("n", soundex_portable("n").alias("s")).collect()}
    for n in names:
        assert got[n] == _py_soundex_variant(n), (n, got[n])
    # the variant groups the phonetic families the blocking relies on
    assert got["SMITH"] == got["SMYTH"] == got["SMOOT"]
    assert got["JOHNSON"] == got["JONSON"] == got["JANSEN"]
    # and h/w-as-vowel is a DOCUMENTED divergence from ANSI soundex
    # (ASHCRAFT: ANSI A261 — h does not separate s/c; variant A226)
    assert got["Ashcraft"] == "A226"


# ------------------------------------------------------- bpe cap guard ----


def test_bpe_learn_max_words_prunes_deterministically(spark):
    """The driver-memory guard (ADVICE r7): max_words keeps the top-N
    words by (cnt DESC, word ASC); merges learned from the pruned
    histogram equal merges learned from a corpus containing only those
    words."""
    from cubicerp_client_etl_spark.operators.bpe import bpe_learn

    # 'aa bb' dominate; 30 singleton junk words form the prunable tail
    junk = " ".join(f"junk{i:02d}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, "aa bb aa bb aa bb " + junk)], "doc_id long, text string"
    )
    top_only = spark.createDataFrame(
        [(0, "aa bb aa bb aa bb")], "doc_id long, text string"
    )
    capped = bpe_learn(docs, num_merges=2, max_words=2)
    want = bpe_learn(top_only, num_merges=2, max_words=None)
    assert capped == want
    with pytest.raises(ValueError):
        bpe_learn(docs, num_merges=2, max_words=0)


# --------------------------------------------------------- k-anonymity ----


def test_k_anonymize_release_pools_small_groups_exactly(spark):
    from cubicerp_client_etl_spark.operators.quality import k_anonymize_release

    rows = (
        [("a", 10)] * 5   # released (n=5 >= 3)
        + [("b", 7)] * 2  # suppressed
        + [("c", 1)] * 1  # suppressed
    )
    df = spark.createDataFrame(rows, "g string, v int")
    out = k_anonymize_release(
        df, ["g"], k=3, measures={"sum_v": __import__("pyspark").sql.functions.sum("v").cast("bigint")}
    ).collect()
    got = {r.g: (r.n_rows, r.sum_v) for r in out}
    assert got == {"a": (5, 50), "*": (3, 15)}
    # additivity: published totals equal the raw totals
    assert sum(n for n, _ in got.values()) == len(rows)
    assert sum(s for _, s in got.values()) == sum(v for _, v in rows)


def test_k_anonymize_release_no_catchall_when_nothing_suppressed(spark):
    from cubicerp_client_etl_spark.operators.quality import k_anonymize_release

    df = spark.createDataFrame([("a", 1)] * 4, "g string, v int")
    out = k_anonymize_release(
        df, ["g"], k=3,
        measures={"sum_v": F.sum("v").cast("bigint")},
    ).collect()
    assert [(r.g, r.n_rows) for r in out] == [("a", 4)]


def test_k_anonymize_release_rejects_bad_args(spark):
    from cubicerp_client_etl_spark.operators.quality import k_anonymize_release

    df = spark.createDataFrame([("a", 1)], "g string, v int")
    with pytest.raises(ValueError):
        k_anonymize_release(df, ["g"], k=0, measures={})
    with pytest.raises(ValueError):
        k_anonymize_release(df, [], k=2, measures={})


def test_stream_winsorize_matches_batch(spark):
    """Offline-threshold winsorization is a stateless map: the stream
    output must equal the batch output row-for-row, with thresholds
    taken from the batch quantile sketch."""
    from cubicerp_client_etl_spark.operators.quantiles import (
        histogram_quantile_sketch,
    )
    from cubicerp_client_etl_spark.streaming.jobs import (
        run_stream_to_memory,
        stream_winsorize,
    )

    sf = "/root/testdata/sf0.001"
    batch = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("value_cents"),
    )
    thr = {
        r.q: r.est
        for r in histogram_quantile_sketch(
            batch, "value_cents", [0.01, 0.99]
        ).collect()
    }
    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf}/lineitem.parquet").schema
        )
        .option("pathGlobFilter", "lineitem.parquet")
        .parquet(sf)
    )
    stream = stream.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("value_cents"),
    )
    got = run_stream_to_memory(
        stream_winsorize(stream, int(thr[0.01]), int(thr[0.99])),
        "winsor_stream",
        output_mode="append",
    )
    srows = {
        (r.l_orderkey, r.l_linenumber): (r.winsorized_cents, r.clipped)
        for r in got.collect()
    }
    brows = {
        (r.l_orderkey, r.l_linenumber): (r.winsorized_cents, r.clipped)
        for r in stream_winsorize(batch, int(thr[0.01]), int(thr[0.99])).collect()
    }
    assert srows == brows and srows
    assert {v[1] for v in brows.values()} >= {"none"}


# ---------------------------------------------------------- triangles ----


def test_triangle_stats_known_graphs(spark):
    from cubicerp_client_etl_spark.operators.graph import triangle_stats

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "src long, dst long",
    )
    (r,) = triangle_stats(k4).collect()
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.clustering_e6 == 1_000_000

    # directed duplicates + self-loops normalize away
    messy = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 1)], "src long, dst long"
    )
    (m,) = triangle_stats(messy).collect()
    assert (m.n_edges, m.n_triangles) == (3, 1)

    # triangle-free bipartite K2,3: wedges but no closures
    bip = spark.createDataFrame(
        [(a, b) for a in (0, 1) for b in (10, 11, 12)], "src long, dst long"
    )
    (bp,) = triangle_stats(bip).collect()
    assert bp.n_triangles == 0 and bp.n_wedges > 0


def test_triangle_stats_matches_bruteforce_on_random_graph(spark):
    import itertools

    from cubicerp_client_etl_spark.operators.graph import triangle_stats

    # deterministic pseudo-random graph on 24 nodes
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(24), 2)
        if (a * 7919 + b * 104729) % 5 == 0
    ]
    adj = {n: set() for n in range(24)}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    want = sum(
        1
        for a, b, c in itertools.combinations(range(24), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    (r,) = triangle_stats(df).collect()
    assert r.n_triangles == want


# ------------------------------------------------------- geo blocking ----


def test_grid_neighbor_pairs_matches_bruteforce(spark):
    import itertools

    from cubicerp_client_etl_spark.operators.geo import grid_neighbor_pairs

    pts = [(i, (i * 7919) % 1000, (i * 104729) % 1000) for i in range(120)]
    R = 90
    want = set()
    for (i, xi, yi), (j, xj, yj) in itertools.combinations(pts, 2):
        d2 = (xi - xj) ** 2 + (yi - yj) ** 2
        if d2 <= R * R:
            want.add((min(i, j), max(i, j), d2))
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        (r.id_a, r.id_b, r.dist2)
        for r in grid_neighbor_pairs(df, "id", "x", "y", max_dist=R).collect()
    }
    assert got == want and want
    # a cell larger than max_dist is also complete
    got2 = {
        (r.id_a, r.id_b, r.dist2)
        for r in grid_neighbor_pairs(
            df, "id", "x", "y", max_dist=R, cell_size=250
        ).collect()
    }
    assert got2 == want


def test_grid_neighbor_pairs_rejects_bad_args(spark):
    from cubicerp_client_etl_spark.operators.geo import grid_neighbor_pairs

    df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
    with pytest.raises(ValueError):
        grid_neighbor_pairs(df, "id", "x", "y", max_dist=0)
    with pytest.raises(ValueError):
        grid_neighbor_pairs(df, "id", "x", "y", max_dist=100, cell_size=50)


# ------------------------------------------------------ cdf transform ----


def test_cdf_transform_exact_values(spark):
    from cubicerp_client_etl_spark.operators.quantiles import cdf_transform

    # values 1,1,2,5 → P(X<=1)=.5, P(X<=2)=.75, P(X<=5)=1
    df = spark.createDataFrame([(1,), (1,), (2,), (5,)], "v long")
    got = sorted(
        (r.v, r.cdf_e6) for r in cdf_transform(df, "v").collect()
    )
    assert got == [(1, 500000), (1, 500000), (2, 750000), (5, 1000000)]


def test_cdf_transform_null_safe(spark):
    from cubicerp_client_etl_spark.operators.quantiles import cdf_transform

    df = spark.createDataFrame([(1,), (None,), (3,)], "v long")
    got = {r.v: r.cdf_e6 for r in cdf_transform(df, "v").collect()}
    # nulls pass through untransformed; CDF over the 2 non-null rows
    assert got[1] == 500000 and got[3] == 1000000 and got[None] is None


# ------------------------------------------------------------- benford ----


def test_benford_audit_exact_counts_and_constants(spark):
    import math

    from cubicerp_client_etl_spark.operators.quality import (
        BENFORD_E6,
        benford_audit,
    )

    # the pinned constants ARE floor(log10(1+1/d)*1e6)
    for d in range(1, 10):
        assert BENFORD_E6[d - 1] == math.floor(math.log10(1 + 1 / d) * 1e6)
    # hand fixture: digits 1,1,2,9; zeros/nulls/negatives excluded
    df = spark.createDataFrame(
        [(10,), (199,), (25,), (9,), (0,), (None,), (-3,)], "v long"
    )
    out = {r.digit: (r.n, r.observed_e6) for r in benford_audit(df, "v").collect()}
    assert len(out) == 9
    assert out[1] == (2, 500000)
    assert out[2] == (1, 250000)
    assert out[9] == (1, 250000)
    assert out[5] == (0, 0)
