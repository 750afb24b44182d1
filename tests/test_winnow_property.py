"""Property tests for the winnowing fingerprint family: the shuffle-
free inline digest, the windowed row-form, and a pure-Python reference
must agree on ARBITRARY text — including all-tie runs, whitespace
soup, short-and-empty documents, and unicode — and the paper's
guarantee (any shared substring of length k + w − 1 shares a
fingerprint hash) must hold by construction.

One Spark round-trip per example is slow, so each hypothesis example
carries a BATCH of documents (the repo's property-test discipline:
amortize the JVM, keep shrinking useful).
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

K, W = 5, 3


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _ref(text: str) -> tuple[int, set[tuple[int, int]]]:
    t = re.sub(r"\s+", " ", text.strip().lower())
    ng = max(len(t) - K + 1, 1)
    packed = [
        _h32(t[i : i + K] + "|win") * 2_147_483_648 + (2_147_483_648 - (i + 1))
        for i in range(ng)
    ]
    sel = set()
    for s in range(max(ng - W + 1, 1)):
        c = min(packed[s : s + W])
        sel.add((2_147_483_648 - c % 2_147_483_648, c >> 31))
    return ng, sel


# printable-ish text incl. unicode, repeats, and whitespace runs
_doc = st.text(
    alphabet=st.sampled_from(list("ab x\t\n.é9")), min_size=0, max_size=40
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_inline_and_windowed_match_python_reference(spark, docs):
    from cubicerp_client_etl_spark.operators.winnow import (
        winnow_digest_inline,
        winnow_fingerprints,
    )

    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    got_rows: dict[int, set[tuple[int, int]]] = {}
    ngs: dict[int, int] = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=K, w=W).collect():
        got_rows.setdefault(r.doc_id, set()).add((r.pos, r.fp_hash))
        ngs[r.doc_id] = r.n_grams
    inline = {
        r.doc_id: (r.n_grams, r.n_fp)
        for r in winnow_digest_inline(df, "doc_id", "text", k=K, w=W).collect()
    }
    for i, d in rows:
        ng, sel = _ref(d)
        assert ngs[i] == ng, (i, d)
        assert got_rows[i] == sel, (i, d)
        assert inline[i] == (ng, len(sel)), (i, d)
