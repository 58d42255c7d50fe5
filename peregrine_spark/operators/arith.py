"""Exact column combinatorics shared by the counting shortcuts (D2-D4).

The reference counts order groups with 64-bit arithmetic on candidate-set
sizes (core/PatternMatching.hh:1788-1826); the Spark restatement uses
decimal(38,0) falling factorials so binomials stay exact far past 2^63.
decimal(38,0) itself silently overflows to NULL under non-ANSI mode and
F.sum would then DROP the row (undercount, not error) — so every binomial
carries a guard that raises loudly when a candidate count is large enough
for the t-term product to clear 10^38.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def binom_overflow_limit(t: int) -> int:
    """Largest n for which n·(n-1)·…·(n-t+1) provably fits decimal(38,0):
    n^t ≤ 10^38 with a safety digit."""
    if t <= 0:
        return (1 << 63) - 1
    return min((1 << 63) - 1, int(10 ** (37 / t)))


def binom_exact(n: Column, t: int) -> Column:
    """C(n, t) as an exact decimal(38,0) (0 when n < t). The falling
    factorial is exactly divisible by t!, so the single division is
    exact. Raises SparkRuntimeException (via raise_error) when n exceeds
    the overflow-safe bound — a zipf mega-hub candidate set with t ≥ 6
    would otherwise overflow to NULL and silently undercount."""
    lim = binom_overflow_limit(t)
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
                f"binom_exact: candidate count %s exceeds the decimal(38,0)-"
                f"safe bound {lim} for t={t}; the count would silently "
                "overflow to NULL",
                n.cast("string"),
            )
        ).cast(_DEC)
    )


def falling_exact(n: Column, t: int, limit: int | None = None) -> Column:
    """(n)_t = n·(n-1)·…·(n-t+1) as exact decimal(38,0) (0 when n < t),
    with the same overflow guard as binom_exact. Callers that MULTIPLY
    several falling factorials must pass a tightened `limit` so the
    PRODUCT stays inside decimal(38,0) — per-factor guards alone don't
    compose (two individually-safe 10¹⁸-range factors overflow to NULL
    silently when multiplied)."""
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
