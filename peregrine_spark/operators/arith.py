"""Exact column combinatorics shared by the counting shortcuts (D2-D4).

The reference counts order groups with 64-bit arithmetic on candidate-set
sizes (core/PatternMatching.hh:1788-1826); the Spark restatement uses
decimal(38,0) falling factorials so binomials stay exact far past 2^63.
decimal(38,0) itself silently overflows to NULL under non-ANSI mode and
F.sum would then DROP the row (undercount, not error) — so every binomial
carries a guard that raises loudly when a candidate count is large enough
to overflow.

Division headroom: Spark types `decimal(38,0) / int` as decimal(38,6),
which holds integers only to ~10^32 — five orders below the product's
10^37 budget. So the aggregating callers (star counts, tail groups) use
sum_binom_exact: per-row they sum the RAW falling factorials (full
decimal(38,0) range), and the single ÷ t! happens once on the aggregated
total, guarded against the final-answer int64 contract. binom_exact keeps
the per-row division for callers that need a per-row binomial, with its
guard tightened to the division's effective capacity.
"""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"
_I64 = (1 << 63) - 1
# integers representable exactly in decimal(38,6) — the type Spark gives
# every decimal(38,0) division result (scale clamps to 6 at p=38)
_DIV_CAP = 10**31


def binom_overflow_limit(t: int) -> int:
    """Largest n for which n·(n-1)·…·(n-t+1) provably fits decimal(38,0):
    n^t ≤ 10^38 with a safety digit."""
    if t <= 0:
        return _I64
    return min(_I64, int(10 ** (37 / t)))


def binom_div_limit(t: int) -> int:
    """Largest n for which C(n, t) ALSO survives Spark's per-row decimal
    division: the `/ t!` result is typed decimal(38,6) (~10^31 integer
    headroom with a safety digit), so n^t / t! ≤ 10^31, i.e.
    n ≤ (10^31 · t!)^(1/t). Strictly tighter than binom_overflow_limit
    for t ≥ 1 — a product-safe n=1.4e7, t=5 row still blows up in the
    division under ANSI (NUMERIC_VALUE_OUT_OF_RANGE) or NULLs silently
    without it."""
    if t <= 0:
        return _I64
    return min(_I64, int((_DIV_CAP * math.factorial(t)) ** (1 / t)))


def binom_exact(n: Column, t: int) -> Column:
    """C(n, t) as an exact per-row decimal (0 when n < t). The falling
    factorial is exactly divisible by t!, so the single division is
    exact. Raises SparkRuntimeException (via raise_error) when n exceeds
    the division-safe bound — aggregating callers that only need
    Σ C(n_i, t) should use sum_binom_exact, whose per-row bound is five
    orders higher."""
    lim = binom_div_limit(t)
    num = F.lit(1).cast(_DEC)
    for i in range(t):
        num = (num * (n - F.lit(i))).cast(_DEC)
    binom = F.when(n >= t, (num / F.lit(math.factorial(t))).cast(_DEC)).otherwise(
        F.lit(0).cast(_DEC)
    )
    return F.when(
        n <= F.lit(lim).cast("long"), binom
    ).otherwise(
        F.raise_error(
            F.format_string(
                f"binom_exact: candidate count %s exceeds the decimal-"
                f"division-safe bound {lim} for t={t}; the per-row "
                "C(n,t) would overflow decimal(38,6). Use "
                "sum_binom_exact for aggregate sums",
                n.cast("string"),
            )
        ).cast(_DEC)
    )


def sum_binom_exact(n: Column, t: int) -> Column:
    """Aggregate Σ_rows C(n, t) as ONE exact decimal(38,0) column (an
    expression for .agg(...)). Per-row it sums the raw falling
    factorials — guarded at the full 10^(37/t) product budget, so a
    zipf mega-hub candidate set is fine to n ≈ 2.5e7 at t=5 — and
    divides the aggregated total by t! exactly once. The single
    division is guarded against the final answer's int64 contract
    (every caller casts to long), and a silent non-ANSI decimal-sum
    overflow (sum → NULL over a non-empty input) is converted into a
    loud error instead of coalescing to 0."""
    fact = math.factorial(t)
    tot = F.sum(falling_exact(n, t))
    cnt = F.count(F.lit(1))
    safe = F.coalesce(tot, F.lit(0).cast(_DEC))
    return F.when(
        (cnt > 0) & tot.isNull(),
        F.raise_error(
            F.lit(
                f"sum_binom_exact: Σ falling(n,{t}) overflowed "
                "decimal(38,0) (non-ANSI silent NULL)"
            )
        ).cast(_DEC),
    ).when(
        safe > F.lit(Decimal(fact * _I64)).cast(_DEC),
        F.raise_error(
            F.lit(
                f"sum_binom_exact: Σ C(n,{t}) exceeds int64; the long "
                "result contract cannot hold it"
            )
        ).cast(_DEC),
    ).otherwise((safe / F.lit(fact)).cast(_DEC))


def falling_exact(n: Column, t: int, limit: int | None = None) -> Column:
    """(n)_t = n·(n-1)·…·(n-t+1) as exact decimal(38,0) (0 when n < t),
    guarded at the PRODUCT budget (no division happens here). Callers
    that MULTIPLY several falling factorials must pass a tightened
    `limit` so the product of products stays inside decimal(38,0) —
    per-factor guards alone don't compose (two individually-safe
    10¹⁸-range factors overflow to NULL silently when multiplied)."""
    lim = binom_overflow_limit(t) if limit is None else limit
    num = F.lit(1).cast(_DEC)
    for i in range(t):
        num = (num * (n - F.lit(i))).cast(_DEC)
    val = F.when(n >= t, num).otherwise(F.lit(0).cast(_DEC))
    return F.when(
        n <= F.lit(lim).cast("long"), val
    ).otherwise(
        F.raise_error(
            F.format_string(
                f"falling_exact: candidate count %s exceeds the "
                f"decimal(38,0)-safe bound {lim} for t={t}",
                n.cast("string"),
            )
        ).cast(_DEC)
    )
