"""Property tests for the round-8 scalar operators: Luhn validation
and portable Soundex against pure-Python references over generated
inputs (one Spark job per property run — inputs batched into a single
DataFrame, the repo's property-test discipline)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


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


def _py_soundex_variant(name: str) -> str:
    u = "".join(ch for ch in name.upper() if "A" <= ch <= "Z")
    table = dict(zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"))
    codes = "".join(table[ch] for ch in u)
    coll = []
    for ch in codes:
        if not coll or coll[-1] != ch:
            coll.append(ch)
    body = "".join(coll)[1:].replace("0", "")
    return (u[:1]) + (body[:3]).ljust(3, "0")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="0123456789", min_size=10, max_size=22),
        min_size=30,
        max_size=30,
    )
)
def test_luhn_property_vs_reference(spark, digit_strings):
    from cubicerp_client_etl_spark.operators.text import luhn_valid

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(digit_strings)], "i int, s string"
    )
    got = {
        r.i: r.ok
        for r in df.select("i", luhn_valid("s").alias("ok")).collect()
    }
    for i, s in enumerate(digit_strings):
        assert got[i] == _py_luhn(s), s


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ '-.0123456789",
            min_size=0,
            max_size=24,
        ),
        min_size=40,
        max_size=40,
    )
)
def test_soundex_property_vs_reference(spark, names):
    from cubicerp_client_etl_spark.operators.linkage import soundex_portable

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "i int, n string"
    )
    got = {
        r.i: r.s
        for r in df.select("i", soundex_portable("n").alias("s")).collect()
    }
    for i, n in enumerate(names):
        assert got[i] == _py_soundex_variant(n), repr(n)
