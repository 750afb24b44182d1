"""Text-analysis operators for training-data pipelines (SURVEY §2.L-txt1).

All pure Catalyst expressions (split/regexp/aggregate) — language ID,
quality scoring, token counting and fingerprinting run JVM-side with
whole-stage codegen; at 100 TB these are embarrassingly parallel
map-only stages with zero shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/marker heuristic language
# ID. Deliberately tiny and deterministic: the point is the operator
# shape (scalable scoring + argmax), not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "y"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "et", "les"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty string → empty array (not [''])."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token estimate: word-pieces + digits + punctuation
    counted separately (a cheap, deterministic BPE proxy: count regex
    token boundaries instead of running a real tokenizer)."""
    c = F.col(col) if isinstance(col, str) else col
    # split into runs of letters / digits / single punctuation
    pieces = F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    # long alpha runs count as ceil(len/4) pieces (≈ BPE merge depth)
    return F.aggregate(
        pieces,
        F.lit(0).cast("bigint"),
        lambda acc, p: acc + F.ceil(F.length(p) / 4).cast("bigint"),
    )


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / F.size(toks)
    )


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / F.length(c)
    )


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks)
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length sweet spot, low punct,
    sane stopword presence. Deterministic arithmetic only."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok / 50.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 5.0)
    stop_score = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    return F.round((len_score * 0.5 + punct_pen * 0.3 + stop_score * 0.2), 6)


def language_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts (the scoring half of language ID)."""
    toks = tokens(col)

    def marker_hit(markers: tuple[str, ...]):
        # factory keeps the lambda unary (PySpark derives HOF arity from
        # the Python signature — default params would add a lambda var)
        return lambda t: F.lower(t).isin(*markers)

    return {
        lang: F.size(F.filter(toks, marker_hit(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def language_id(col: Column | str) -> Column:
    """Argmax of marker scores with deterministic tie-break (alphabetical
    language order wins ties); zero hits everywhere → 'und'."""
    scores = language_scores(col)
    langs = sorted(scores)  # alphabetical tie-break, matches oracle
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # fold right-to-left so earlier (alphabetically smaller) langs win ties
    for lang in reversed(langs):
        s = scores[lang]
        best_lang = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(
            best_lang
        )
        best_score = F.greatest(best_score, s)
    return best_lang


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (stable across engines; the rolling-hash shingle variant lives in
    dedup.minhash_signatures)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def tfidf_top_terms(docs, text_col: str = "text", id_col: str = "doc_id", k: int = 3):
    """TF-IDF top-k terms per document (SURVEY L-txt1), pure DataFrame ops.

    Terms are lowercase alphanumeric runs; tf = in-doc term count, df =
    number of docs containing the term, idf = ln(N/df) with N the corpus
    document count. Ranking uses the ROUNDED score (6dp, score desc then
    term asc) so ordering is reproducible cross-engine.

    Scale: two shuffles — (doc, term) tf agg and term df agg; the
    corpus-size N and the df table join back by term (df is vocabulary-
    sized, broadcastable far beyond 100 TB corpora). No Python, all
    codegen expressions.
    """
    terms = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = terms.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.select(F.count_distinct(F.col(id_col)).alias("n"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6),
        )
    )
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


# Engine-portable PII patterns: explicit character classes only — no \w,
# no lookarounds — so Java regex (Spark) and RE2 (DuckDB/most scanners)
# agree character-for-character. Applied email → URL → phone; earlier
# replacements insert no digits, so later patterns can't re-match them.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_URL = "https?://[^ ]+"
PII_PHONE = "[+]?[0-9][0-9()./ -]{6,}[0-9]"


def redact_pii(col: Column | str) -> Column:
    """Mask emails, URLs, and phone-like digit runs (L-txt extension).

    The standard pre-training scrub step: pure regexp_replace chain —
    JVM-side, codegen'd, no UDF, so it runs at full scan speed at
    100 TB. Pattern set is deliberately conservative (false positives
    over false negatives, the right default for training data).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_URL, "<URL>")
    c = F.regexp_replace(c, PII_PHONE, "<PHONE>")
    return c


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-row counts of each PII class (for audit reports)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "n_emails": F.regexp_count(c, F.lit(PII_EMAIL)),
        "n_urls": F.regexp_count(F.regexp_replace(c, PII_EMAIL, "<EMAIL>"), F.lit(PII_URL)),
        "n_phones": F.regexp_count(
            F.regexp_replace(
                F.regexp_replace(c, PII_EMAIL, "<EMAIL>"), PII_URL, "<URL>"
            ),
            F.lit(PII_PHONE),
        ),
    }


# Candidate payment-card number: 13-19 digits, optional single space or
# dash between digits, on word boundaries. Kept to the Java/RE2-common
# regex subset so the DuckDB oracle replays extraction identically.
PII_CARD_CANDIDATE = r"\b\d(?:[ -]?\d){12,18}\b"


def luhn_valid(digits: Column | str) -> Column:
    """Luhn checksum over a digits-only string (ISO/IEC 7812): from the
    RIGHTMOST digit, double every second digit (subtracting 9 when the
    double exceeds 9) and require the sum ≡ 0 (mod 10). Pure Catalyst
    HOF (``aggregate`` over ``sequence``) — JVM-side, codegen'd, zero
    shuffle; DuckDB replays it with ``list_sum`` over ``range`` using
    the identical per-position CASE, so card validation is value-level
    oracle-checkable. Length outside 13..19 → false."""
    c = F.col(digits) if isinstance(digits, str) else digits
    rev = F.reverse(c)
    n = F.length(c)

    def term(i: Column) -> Column:
        d = F.substring(rev, i, F.lit(1)).cast("int")
        dbl = d * 2
        return F.when(i % 2 == 1, d).otherwise(
            F.when(dbl > 9, dbl - 9).otherwise(dbl)
        )

    total = F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0), lambda acc, i: acc + term(i)
    )
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def card_candidates(col: Column | str) -> Column:
    """Array of digits-only payment-card candidates extracted from free
    text (separators stripped); validate each with ``luhn_valid``.
    Regex extraction + HOF transform — map-only at any scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.regexp_extract_all(c, F.lit(PII_CARD_CANDIDATE), F.lit(0)),
        lambda s: F.regexp_replace(s, "[ -]", ""),
    )


def nfc_normalize_col(col: Column | str) -> Column:
    """Unicode NFC normalization as an Arrow-batched pandas UDF
    (stdlib ``unicodedata`` — Spark SQL has no normalization
    built-in). The step every multilingual dedup/fingerprint chain
    needs FIRST: composed ``à`` and decomposed ``a + U+0300`` are
    different byte strings (different md5 keys, different shingles)
    but the same text; NFC collapses them. Cross-engine: Python's
    NFC is probe-verified byte-identical to DuckDB's
    ``nfc_normalize`` (both implement UAX #15), so normalized-key
    queries oracle-replay exactly. Nulls pass through as nulls."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    return _nfc(F.col(col) if isinstance(col, str) else col)


def strip_html(col: Column | str) -> Column:
    """Boilerplate HTML → text: drop <script>/<style> subtrees (their
    CONTENT is not text), strip remaining tags, decode the five
    standard entities, collapse whitespace. Pure whole-stage-codegen
    regex chain (no UDF) using only the regex subset Java and RE2
    evaluate identically (non-greedy ``.*?``, char classes — no
    lookarounds), so the DuckDB oracle replays it verbatim. For
    production HTML with nested CDATA/comments a real parser is the
    optional extra; this is the deterministic 95% fast path."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def canonical_url(col: Column | str) -> Column:
    """Canonicalize a URL for crawl dedup: lowercase scheme+host, strip
    the scheme's default port (:80 http / :443 https), drop the
    fragment, drop ``utm_*`` tracking params, sort the remaining query
    params, and strip trailing path slashes (bare host keeps ``/``).
    Pure whole-stage-codegen Column chain (regexp_extract + HOF
    filter/sort — no UDF), using only constructs DuckDB replays
    identically (list_filter/list_sort/array_to_string), so
    canonical-key dedup queries oracle-replay exactly. Not a full
    WHATWG parser — percent-encoding and IDN are out of scope (the
    optional extra's job); this is the deterministic crawl-frontier
    fast path."""
    u = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    after = F.regexp_replace(u, r"^[A-Za-z]+://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?#]+)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    pathqf = F.substring_index(after, "#", 1)  # drop fragment
    # path+query = everything after hostport (fragment already dropped)
    tail = F.substring(pathqf, F.length(hostport) + 1, F.lit(1 << 30))
    path = F.substring_index(tail, "?", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # after the FIRST '?' — a '?' inside the query string stays in the
    # query, matching the DuckDB oracle's
    # substr(tail, instr(tail,'?')+1) form (split_part(tail,'?',2)
    # would TRUNCATE at a second '?'; the oracle was moved off it in
    # pipeline_ext7.py for exactly that reason)
    query = F.when(
        tail.contains("?"),
        F.substring(tail, F.instr(tail, "?") + 1, F.lit(1 << 30)),
    ).otherwise(F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
