"""Unit tests for operators/bpe.py — BPE merge learning vs a
hand-computed reference, greedy-overlap semantics, and vocab
segmentation."""

from __future__ import annotations

import pytest

from cubicerp_client_etl_spark.operators.bpe import (
    bpe_learn,
    bpe_segment_vocab,
    word_histogram,
)


def _docs(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "text string")


def test_bpe_learn_matches_hand_computed_merges(spark):
    """Classic Sennrich-style corpus: 'low' ×5, 'lower' ×2, 'newest' ×6,
    'widest' ×3. Pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, ...
    tie (e,s) vs (s,t) breaks by left symbol: 'e' < 's' → merge 'es'.
    Round 2: (es,t)=9 wins. Round 3: (l,o)=7. Round 4: (lo,w)=7.
    Round 5: (n,e)=6 vs (e,w)=6 vs (w,est)=6 → 'e' < 'n' < 'w' → (e,w)?
    No — after 'est': newest = n e w est, widest = w i d est:
    pairs (n,e)=6, (e,w)=6, (w,est)=6, (w,i)=3, (i,d)=3, (d,est)=3,
    (l,o)=7 wins round 3 first. This test just pins the first five
    merges against an independent Python implementation."""

    def ref_bpe(word_counts, k):
        vocab = {tuple(w): c for w, c in word_counts.items()}
        out = []
        for rank in range(k):
            pairs: dict[tuple[str, str], int] = {}
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] = (
                        pairs.get((syms[i], syms[i + 1]), 0) + c
                    )
            if not pairs:
                break
            (a, b), c = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((rank, a, b, a + b, c))
            new = {}
            for syms, cnt in vocab.items():
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                new[tuple(merged)] = new.get(tuple(merged), 0) + cnt
            vocab = new
        return out

    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    corpus = []
    for w, c in counts.items():
        corpus.extend([w] * c)
    docs = _docs(spark, [" ".join(corpus)])
    got = [
        (m["rank"], m["left_sym"], m["right_sym"], m["merged"], m["cnt"])
        for m in bpe_learn(docs, "text", num_merges=5)
    ]
    assert got == ref_bpe(counts, 5)


def test_bpe_greedy_left_to_right_overlap(spark):
    """'aaa': merging (a,a) greedily left-to-right gives [aa, a] — the
    string-replace form must reproduce exactly that, not [a, aa] and
    not a double merge."""
    docs = _docs(spark, ["aaa aaa aaa b"])
    merges = bpe_learn(docs, "text", num_merges=1)
    assert merges[0]["left_sym"] == "a" and merges[0]["right_sym"] == "a"
    # 3 words × pairs (a,a): positions (1,2) and (2,3) → count 6
    assert merges[0]["cnt"] == 6
    seg = {
        r.w: list(r.tokens)
        for r in bpe_segment_vocab(docs, merges, "text").collect()
    }
    assert seg["aaa"] == ["aa", "a"]
    assert seg["b"] == ["b"]


def test_bpe_runs_out_of_pairs_stops_early(spark):
    docs = _docs(spark, ["a b a b"])
    merges = bpe_learn(docs, "text", num_merges=10)
    # single-char words have no adjacent pairs at all
    assert merges == []


def test_bpe_validates_num_merges(spark):
    with pytest.raises(ValueError):
        bpe_learn(_docs(spark, ["x"]), "text", num_merges=0)


def test_word_histogram_counts(spark):
    docs = _docs(spark, ["a b b", "b  c"])  # double space → empty token dropped
    got = {r.w: r.cnt for r in word_histogram(docs, "text").collect()}
    assert got == {"a": 1, "b": 3, "c": 1}


def test_bpe_driver_recursion_matches_catalyst_replay(spark):
    """The driver-side merge recursion must stay bit-identical to the
    Catalyst ``replace`` replay the oracle CTEs and bpe_segment_vocab
    use. Sharpest case: a pair abutting itself ('abab') — non-
    overlapping replace consumes the shared delimiter space, so round 1
    merges only the FIRST (a,b), leaving ' ab a b ', and round 2
    re-picks the SAME pair (tie count 2 with (ab,a); 'a' < 'ab') to
    finish the job. Canonical tuple-scan BPE would merge both in round
    1 — the engine's defined semantics is the replayable one."""
    docs = _docs(spark, ["abab abab"])
    merges = bpe_learn(docs, "text", num_merges=2)
    assert [(m["left_sym"], m["right_sym"], m["cnt"]) for m in merges] == [
        ("a", "b", 4),
        ("a", "b", 2),
    ]
    seg = bpe_segment_vocab(docs, merges).collect()
    assert len(seg) == 1 and seg[0].tokens == ["ab", "ab"]


def test_bpe_max_words_prunes_tail(spark):
    """max_words keeps only the top-N histogram rows by (cnt DESC, w)
    before the collect — the rare word must stop influencing merges."""
    docs = _docs(spark, ["zz zz zz zz qx"])
    all_merges = bpe_learn(docs, "text", num_merges=2)
    pruned = bpe_learn(docs, "text", num_merges=2, max_words=1)
    assert ("q", "x") in {(m["left_sym"], m["right_sym"]) for m in all_merges}
    assert {(m["left_sym"], m["right_sym"]) for m in pruned} == {("z", "z")}

    with pytest.raises(ValueError):
        bpe_learn(docs, "text", num_merges=1, max_words=0)
