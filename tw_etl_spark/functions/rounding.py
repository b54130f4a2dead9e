"""Engine-exact rounding for integer ratios.

The bug class (round 9, caught by the strict sf0.1 sweep on t15):
``round(num/den, d)`` where num and den are exact integers can land on
an EXACT decimal half at digit d (e.g. 6186/96000 = 0.0644375).  Spark
rounds the shortest decimal representation of the double
(BigDecimal.valueOf -> "0.0644375" -> HALF_UP -> 0.064438) while DuckDB
rounds the binary double (0.06443749999... -> 0.064437): a guaranteed
cross-engine hash mismatch whenever the reduced denominator divides
2^a·5^b with the half landing exactly at the rounding digit.  Count
ratios hit this constantly at scale (n = 16000, 96000, 128, ...).

The fix is to never round a float at all: compute
round-half-away-from-zero of the TRUE rational in exact integer
arithmetic on BOTH engines, then divide once.  ``exact_round_ratio``
is the Spark Column form; ``sql_round_ratio`` emits the equivalent
DuckDB SQL for oracle strings.  Compound float expressions (sums of
money doubles, transcendental functions) keep plain round(): their
true values are not terminating decimals, so the half-boundary has
measure ~zero — exact integer ratios are the systematic risk.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_round_ratio(num: Column, den: Column, digits: int) -> Column:
    """round(num/den, digits) with HALF AWAY FROM ZERO evaluated on the
    true rational via exact integer arithmetic (num, den integral; den
    > 0; |num|*10^digits must stay below 2^53).  The returned double is
    bit-identical on any IEEE-754 engine: the only float ops are an
    exact small-integer cast and one division by a power of ten."""
    s = 10 ** digits
    a = F.abs(num).cast("long") * F.lit(s).cast("long")
    d = den.cast("long")
    rem = F.pmod(a, d)
    # (a - rem) is an exact multiple of d, so the double division is
    # exact (true quotient is a representable integer)
    q = ((a - rem) / d).cast("long")
    r = q + F.when(rem * 2 >= d, F.lit(1)).otherwise(F.lit(0))
    signed = F.when(num < 0, -r).otherwise(r)
    return signed.cast("double") / F.lit(float(s))


def sql_round_ratio(num: str, den: str, digits: int) -> str:
    """DuckDB SQL for the same exact rounding; ``num``/``den`` are SQL
    fragments of integer type (cast ::BIGINT at the call site when the
    source column is DOUBLE-typed but integer-valued)."""
    s = 10 ** digits
    a = f"(abs({num})::BIGINT * {s})"
    d = f"(({den})::BIGINT)"
    up = f"(({a} // {d}) + CASE WHEN 2 * ({a} % {d}) >= {d} THEN 1 ELSE 0 END)"
    return f"(CASE WHEN ({num}) < 0 THEN -{up} ELSE {up} END / {s}.0)"


def exact_round_ratio_long(num: Column, den: Column, scale: int = 1) -> Column:
    """round-half-away-from-zero of num*scale/den as an exact BIGINT
    (num, den integral; den > 0; |num|*scale < 2^53).  The integer twin
    of :func:`exact_round_ratio` for pipelines that keep working in
    integer unit space (milli/micro scores) instead of emitting a
    double — e.g. a quantile gate that BINS the score must never touch
    a float, or the bin edge itself becomes engine-dependent."""
    a = F.abs(num).cast("long") * F.lit(scale).cast("long")
    d = den.cast("long")
    rem = F.pmod(a, d)
    q = ((a - rem) / d).cast("long")
    r = q + F.when(rem * 2 >= d, F.lit(1)).otherwise(F.lit(0))
    return F.when(num < 0, -r).otherwise(r).cast("long")


def sql_round_ratio_long(num: str, den: str, scale: int = 1) -> str:
    """DuckDB twin of :func:`exact_round_ratio_long` (same contract)."""
    a = f"(abs({num})::BIGINT * {scale})"
    d = f"(({den})::BIGINT)"
    up = f"(({a} // {d}) + CASE WHEN 2 * ({a} % {d}) >= {d} THEN 1 ELSE 0 END)"
    return f"(CASE WHEN ({num}) < 0 THEN -{up} ELSE {up} END)::BIGINT"


def floor_div(num: Column, den: Column) -> Column:
    """Exact FLOOR division of integral columns (den > 0) as BIGINT.

    Spark's `div` and DuckDB's `//` both truncate toward zero, so the
    two engines agree with each other but disagree with mathematical
    floor on negative numerators; this form (subtract the positive
    remainder, then divide the exact multiple) floors identically
    everywhere.  |num| must stay below 2^53 (the quotient passes
    through an exact double divide)."""
    a = num.cast("long")
    d = den.cast("long")
    rem = F.pmod(a, d)
    return ((a - rem) / d).cast("long")


def sql_floor_div(num: str, den: str) -> str:
    """DuckDB twin of :func:`floor_div`: a - posmod(a,d) is an exact
    multiple of d, so truncating `//` equals exact division on it."""
    a = f"(({num})::BIGINT)"
    d = f"(({den})::BIGINT)"
    rem = f"((({a} % {d}) + {d}) % {d})"
    return f"((({a} - {rem}) // {d})::BIGINT)"
