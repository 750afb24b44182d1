"""Property tests for hash_split and BM25 against pure-Python
references over arbitrary inputs (batched per example — one Spark
round-trip per hypothesis example, the repo's property-test
discipline)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---- hash_split -----------------------------------------------------------

_spec = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(1, 500)),
    min_size=1,
    max_size=4,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=30, unique=True),
    spec=_spec,
    salt=st.sampled_from(["", "x", "r6"]),
)
def test_hash_split_replays_reference_and_partitions(spark, ids, spec, salt):
    from cubicerp_client_etl_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    rows = {
        r.doc_id: r.split
        for r in hash_split(df, "doc_id", splits=tuple(spec), salt=salt).collect()
    }
    assert set(rows) == set(ids)  # partition: no loss, no dupes
    total = sum(s for _, s in spec)
    for i in ids:
        b = _h32(f"{i}|split{salt}") % total
        acc = 0
        expect = spec[-1][0]
        for name, share in spec[:-1]:
            acc += share
            if b < acc:
                expect = name
                break
        assert rows[i] == expect, (i, b, spec)


# ---- BM25 -----------------------------------------------------------------

_word = st.sampled_from(["apple", "banana", "cherry", "dog", "egg", "f"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=1, max_size=10),
    terms=st.lists(_word, min_size=1, max_size=3, unique=True).map(tuple),
)
def test_bm25_scores_replay_reference(spark, docs, terms):
    from cubicerp_client_etl_spark.operators.retrieval import bm25_scores

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.n_terms_hit, r.score_e12)
        for r in bm25_scores(df, "doc_id", "text", terms).collect()
    }

    toks = {i: d.split() for i, d in enumerate(docs)}
    N = len(docs)
    L = sum(len(t) for t in toks.values())
    df_t = {t: sum(1 for ts in toks.values() if t in ts) for t in terms}
    expect = {}
    for i, ts in toks.items():
        score, hits = 0, 0
        for t in terms:
            tf = ts.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = round(math.log((N + 1) / (df_t[t] + 0.5)) * 1_000_000)
            part = (22 * L * tf * 1_000_000) // (
                10 * L * tf + 3 * L + 9 * len(ts) * N
            )
            score += idf * part
        if hits:
            expect[i] = (hits, score)
    assert set(got) == set(expect)
    for i in expect:
        assert got[i][0] == expect[i][0]
        # python round half-even vs engine half-up: <= 1 e6-ulp per
        # term through the <= 2.2e6 tf_part multiplier
        assert abs(got[i][1] - expect[i][1]) <= 2_200_000 * len(terms)
