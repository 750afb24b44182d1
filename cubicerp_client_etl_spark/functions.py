"""Scalar-function pack + oracle-exact numeric helpers (SURVEY §2.H).

Everything here is built-in Catalyst expressions (JVM-side, codegen'd) —
no UDFs. The ``dsum``/``dmoney`` helpers exist because double-precision
SUM is accumulation-order-dependent: Spark's partial aggregation tree and
an oracle engine's serial sum can differ in the last ULPs, which breaks
hash-equality gates. Routing money math through DECIMAL(18,4) makes the
arithmetic exact and order-independent in both engines; the final cast
back to DOUBLE is then bit-identical. This also reflects correct
engineering at 100 TB: decimal money columns don't accumulate float error
across billions of rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,4)"


def dec(col: Column | str) -> Column:
    """Cast to the engine's exact money type."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(col: Column | str) -> Column:
    """Order-independent SUM: exact decimal accumulation, double result."""
    return F.sum(dec(col)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum divided as double.

    (Decimal division scale rules differ between engines; double division
    of two identical values is bit-identical everywhere.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c)).cast("double") / F.count(c)


def dec2(col: Column | str) -> Column:
    """Cast a RAW 2-decimal money/rate column to exact decimal.

    Only safe on stored columns (the fixtures carry 2-decimal values, so
    the nearest-decimal cast is unambiguous in every engine). NEVER cast
    a *computed* double to decimal — Spark rounds via the double's exact
    decimal expansion while DuckDB rounds via scaled double arithmetic,
    and they disagree near .00005 boundaries.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def dsum_disc_price(ep: str, disc: str) -> Column:
    """SUM(ep * (1-disc)) with the whole chain in exact decimal."""
    dp = (dec2(ep) * (F.lit(1) - dec2(disc))).cast(MONEY)
    return F.sum(dp).cast("double")


def dsum_charge(ep: str, disc: str, tax: str) -> Column:
    """SUM(ep * (1-disc) * (1+tax)) in exact decimal (scale 6)."""
    dp = (dec2(ep) * (F.lit(1) - dec2(disc))).cast(MONEY)
    charge = (dp * (F.lit(1) + dec2(tax))).cast("decimal(18,6)")
    return F.sum(charge).cast("double")


# --- fixed-width string physics (SURVEY H1; ref cubicerpetl.py:555-562) ---


def fw_render(col: Column, length: int, align: str = "ljust", fill: str = " ") -> Column:
    """Render one fixed-width field: pad to ``length`` with ``fill`` per
    ``align`` ∈ {ljust, rjust, center}, then hard-truncate to ``length``.

    Matches the reference's semantics including the rjust quirk of keeping
    the *last* n characters on overflow (``str(val)[-n:]``,
    cubicerpetl.py:558), while ljust/center keep the first n.
    """
    s = col.cast("string")
    s = F.coalesce(s, F.lit(""))
    if align == "rjust":
        padded = F.lpad(s, length, fill)
        # lpad already truncates keeping the LAST n? No — lpad truncates
        # keeping the first n. Emulate the reference: overflow keeps tail.
        return F.when(
            F.length(s) > length, F.substring(s, -length, length)
        ).otherwise(padded)
    if align == "center":
        # Python str.center semantics (the reference calls str.center,
        # cubicerpetl.py:561): left = marg//2 + (marg & width & 1) — the
        # extra fill char goes LEFT when both margin and width are odd.
        # Column.substr accepts Column positions, so slide a window over
        # fill || s || fill — pure codegen'd expressions, no UDF.
        marg = F.lit(length) - F.length(s)
        odd_bonus = (
            (marg % 2) * F.lit(length % 2)
        )  # 1 iff margin odd AND width odd
        left = (F.floor(marg / 2) + odd_bonus).cast("int")
        padded_full = F.concat(F.lit(fill * length), s, F.lit(fill * length))
        start = F.lit(length + 1) - left
        padded = padded_full.substr(start, F.lit(length))
        return F.when(F.length(s) >= length, F.substring(s, 1, length)).otherwise(padded)
    # ljust (default)
    return F.substring(F.rpad(s, length, fill), 1, length)


def md5_hash32(key: Column) -> Column:
    """Portable 32-bit hash: integer value of the first 8 hex chars of
    md5(key) — the ONE definition every hash-bucketed operator must
    share (CMS buckets, shard assignment, weighted priorities), because
    DuckDB oracles replay it as
    ``CAST(concat('0x', substr(md5(key), 1, 8)) AS BIGINT)`` and any
    drift in substring width or base silently breaks cross-engine
    equality. Callers build the salted key themselves
    (``concat(id, lit('|salt'))``)."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")


def e6_floor_ratio(c: Column, n: Column) -> Column:
    """Exact ``floor(c * 1e6 / n)`` as BIGINT for the FULL bigint range
    of ``c`` and ``n`` (ADVICE r5: the naive ``c * 1000000 div n``
    aborts under ANSI once a count passes ~9.2e12 — reachable for hot
    tokens in a ~10-trillion-token corpus).

    The multiply runs in DECIMAL(38,0) (exact to 1e38). Decimal
    division then yields the true quotient rounded HALF_UP to 6 dp, so
    ``floor`` of it can only ever be one too HIGH (when the true
    quotient sits within 5e-7 below an integer) — never too low — and
    one exact-decimal comparison (``q0 * n > c * 1e6``) corrects it.
    Verified bit-equal to Python's ``(c * 10**6) // n`` across the
    boundary cases, including c = n = 2^63-1. DuckDB oracles keep the
    plain ``c * 1000000 // n`` form: identical below the overflow
    ceiling (oracle fixtures), and above it DuckDB's BIGINT multiply
    errors rather than diverging."""
    cm = c.cast("decimal(38,0)") * F.lit(1000000)
    nd = n.cast("decimal(38,0)")
    q0 = F.floor(cm / nd).cast("decimal(38,0)")
    return F.when(q0 * nd > cm, q0 - F.lit(1)).otherwise(q0).cast("bigint")


def isqrt_exact(c: Column) -> Column:
    """Exact integer square root ``floor(sqrt(c))`` as BIGINT for
    0 <= c < 2^53 (covers token counts far past the 100 TB corpus).

    ``floor(sqrt(double))`` alone is off by at most one step in either
    direction (one-ulp sqrt error landing on an integer boundary), so
    a single exact-integer correction each way pins it — the same
    floor-correct discipline as ``e6_floor_ratio``. DuckDB replays the
    identical expression, so oracles match bit-for-bit."""
    s0 = F.floor(F.sqrt(c.cast("double"))).cast("bigint")
    return (
        s0
        + F.when((s0 + 1) * (s0 + 1) <= c, 1).otherwise(0)
        - F.when(s0 * s0 > c, 1).otherwise(0)
    )


def hi_lo_bigint(name: str, prefix: str) -> list[Column]:
    """Split a DECIMAL(38,0) column ``name`` into two driver-hashable
    BIGINT carriers: ``{prefix}_hi = d div 1e18`` and ``{prefix}_lo =
    d mod 1e18``. SIGNED values work too (r15, fx_revaluation): Spark
    ``div`` truncates toward zero and ``%`` takes the dividend's sign,
    exactly matching DuckDB HUGEINT ``//``/``%`` — so for negative d
    both carriers come out non-positive and ``d = hi·1e18 + lo`` holds
    identically in both engines.

    The external driver's value hash distinguishes int128-backed
    columns — DuckDB stores any DECIMAL(p>18) as HUGEINT — even when
    rows, schema and stringified values all match (round-1 HUGEINT
    reds; the round-8 DECIMAL(38,0) digest reds q016/q019/q026/q029/
    q038 were exactly this). So wide exact digests stay decimal(38,0)
    INTERNALLY (the round-8 overflow fix was right) but must leave a
    query split across two int64 lanes. DuckDB oracles mirror the
    split as ``CAST(CAST(d AS HUGEINT) // 1e18 AS BIGINT)`` /
    ``% 1e18`` — the HUGEINT hop matters because DuckDB's ``//`` on
    DECIMAL rounds HALF_UP before flooring (1234567.89e18 // 1e18
    gives 1234568, not 1234567) while Spark's ``div`` truncates.

    Takes the COLUMN NAME (not a Column) because ``div`` has no
    PySpark DSL form and the split always runs in a post-aggregate
    projection where the digest already carries an alias."""
    e18 = 10**18
    return [
        F.expr(f"CAST(`{name}` div {e18} AS BIGINT)").alias(f"{prefix}_hi"),
        F.expr(f"CAST(`{name}` % {e18} AS BIGINT)").alias(f"{prefix}_lo"),
    ]


def business_days_between(start: Column, end: Column) -> Column:
    """Exact business days (Mon–Fri) in the half-open [start, end) —
    SLA arithmetic with no calendar table, no explode, no UDF: a
    closed form over epoch days, identical integers in every engine.

    Let ``e`` be the epoch-day number and ``i = e + 3`` its
    Monday-aligned index (1970-01-01 was a Thursday, so ``i % 7 == 0``
    exactly on Mondays). The count of business days since the epoch is
    ``cum(e) = 5·(i div 7) + least(i % 7, 5)`` — full weeks contribute
    5, the partial week contributes its weekday prefix — and the
    answer is ``cum(end) − cum(start)``. Negative when end < start
    (both engines agree; epoch-day indexes are non-negative for any
    post-1970 date so div/% conventions never diverge). DuckDB
    replays it as ``5*(i//7) + least(i % 7, 5)`` on
    ``d − DATE '1970-01-01'``.
    """
    s = F.datediff(start, F.lit("1970-01-01")).cast("bigint") + F.lit(3)
    e = F.datediff(end, F.lit("1970-01-01")).cast("bigint") + F.lit(3)
    # (i - i % 7) / 7 is an exact multiple-of-7 division — double
    # rounding cannot bite below 2^53 epoch-days (year ~2.4e10)
    cs = (F.lit(5) * ((s - s % 7) / F.lit(7)) + F.least(s % 7, F.lit(5))).cast(
        "bigint"
    )
    ce = (F.lit(5) * ((e - e % 7) / F.lit(7)) + F.least(e % 7, F.lit(5))).cast(
        "bigint"
    )
    return (ce - cs).cast("bigint")
