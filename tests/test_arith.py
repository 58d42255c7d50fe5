"""Exact-combinatorics guards (operators/arith.py) — pinned against
Python's arbitrary-precision math.comb, including the division-headroom
regression: Spark types decimal(38,0)/int as decimal(38,6) (~10^31
integer capacity), so a product-safe n=1.4e7, t=5 row used to pass the
guard yet blow up (ANSI) or NULL out (non-ANSI) in the per-row `/ t!`."""

import math

import pytest
from pyspark.sql import functions as F

from peregrine_spark.operators.arith import (
    binom_div_limit,
    binom_exact,
    binom_overflow_limit,
    falling_exact,
    sum_binom_exact,
)


def _sum_binom(spark, ns, t):
    df = spark.createDataFrame([(int(n),) for n in ns], "n long")
    row = df.agg(sum_binom_exact(F.col("n"), t).alias("s")).first()
    return int(row["s"])


def test_sum_binom_exact_mega_hub(spark):
    # the round-4 advice repro: n = 14,000,000 — inside the product
    # budget (t=5 lim 2.5e7) but far past the old per-row division
    # capacity (~6.5e6). t=2: the exact value (fits int64). t≥3: the
    # true count exceeds int64 — the old code silently undercounted
    # (non-ANSI NULL-sum) or threw an opaque NUMERIC_VALUE_OUT_OF_RANGE;
    # now it must raise the explicit int64-contract error.
    ns = [14_000_000, 3, 100]
    assert _sum_binom(spark, ns, 2) == sum(math.comb(n, 2) for n in ns)
    for t in (3, 5):
        assert sum(math.comb(n, t) for n in ns) > (1 << 63) - 1
        with pytest.raises(Exception, match="exceeds int64"):
            _sum_binom(spark, ns, t)


def test_sum_binom_exact_large_inside_int64(spark):
    # hubs big enough to exercise the deferred division end-to-end but
    # whose Σ C(n,t) still fits int64 must come back exact:
    # t=2 → 4.5e12+5e11; t=3 → 4.5e18+1.7e17.
    ns = [3_000_000, 1_000_000, 17]
    for t in (2, 3):
        expect = sum(math.comb(n, t) for n in ns)
        assert expect < (1 << 63) - 1
        assert _sum_binom(spark, ns, t) == expect


def test_sum_binom_exact_small_and_empty(spark):
    assert _sum_binom(spark, [0, 1, 2, 3], 2) == sum(
        math.comb(n, 2) for n in [0, 1, 2, 3]
    )
    empty = spark.createDataFrame([], "n long")
    row = empty.agg(sum_binom_exact(F.col("n"), 3).alias("s")).first()
    assert int(row["s"]) == 0


def test_falling_exact_guard_raises(spark):
    # past the product budget the guard must raise, never NULL
    df = spark.createDataFrame([(int(10**8),)], "n long")
    with pytest.raises(Exception, match="falling_exact"):
        df.select(falling_exact(F.col("n"), 5).alias("v")).collect()


def test_binom_exact_division_capacity(spark):
    # per-row binom: exact below the division-safe bound...
    lim = binom_div_limit(5)
    assert lim < binom_overflow_limit(5)  # strictly tighter for t>=1
    n_ok = lim - 1
    df = spark.createDataFrame([(n_ok,)], "n long")
    row = df.select(binom_exact(F.col("n"), 5).alias("v")).first()
    assert int(row["v"]) == math.comb(n_ok, 5)
    # ...and loud above it (the old guard admitted this and overflowed)
    bad = spark.createDataFrame([(14_000_000,)], "n long")
    with pytest.raises(Exception, match="binom_exact"):
        bad.select(binom_exact(F.col("n"), 5).alias("v")).collect()
