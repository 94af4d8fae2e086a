"""Scalar/aggregate helpers shared across operators.

Oracle-exact float policy (SURVEY.md §7 watch-list):
  * SUM/AVG over doubles are order-dependent in IEEE arithmetic, so a Spark
    sum and a DuckDB sum of identical inputs can differ in the last ulps.
    ``dsum``/``davg`` route through DecimalType — decimal addition is exact
    and associative, so any summation order yields the same value; the final
    decimal->double cast is deterministic. The matching oracle spelling is
    ``CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)``.
  * double->decimal(…,6) rounding boundaries ((2k+1)*5e-7) are never exactly
    representable in binary, so HALF_UP (Spark) vs HALF_EVEN (DuckDB) tie
    rules can never disagree.
  * Intrinsically sequential stats (stddev/corr) are instead rounded to 6dp
    on BOTH sides (``round6``). Rounding is ONLY safe on such "continuous"
    values: never round money-like data that lands exactly on half
    boundaries (e.g. round(price*0.1, 2)) — Spark rounds the shortest
    decimal repr HALF_UP while DuckDB rounds the binary value, and they
    disagree exactly on those boundaries. Use division / decimal casts
    instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal wide enough for sf100-scale sums (21 integer digits) at 6dp.
_DEC = "decimal(27,6)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str, alias: str) -> Column:
    """Order-independent SUM over a double column (see module docstring).

    Oracle: ``CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS alias``.
    """
    return F.sum(_col(c).cast(_DEC)).cast("double").alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double.

    Oracle: ``CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(x) AS alias``.
    """
    col = _col(c)
    return (F.sum(col.cast(_DEC)).cast("double") / F.count(col)).alias(alias)


def round6(c: Column | str, alias: str) -> Column:
    """6dp rounding for order-dependent stats; oracle: ROUND(x, 6)."""
    return F.round(_col(c), 6).alias(alias)


def quotation_to_double(units: Column | str, nano: Column | str) -> Column:
    """Tinkoff Quotation fixed-point -> float64, preserving the reference's
    deliberate loss of decimal exactness
    (reference app/for_rabbit/from_parser_to_rabbitmq.py:60-63 collapses
    ``units + nano/1e9`` to Python float)."""
    return _col(units).cast("double") + _col(nano).cast("double") / F.lit(1e9)


def quotation_to_decimal(units: Column | str, nano: Column | str) -> Column:
    """Lossless Quotation fixed-point -> decimal, 9 fractional digits.

    SURVEY §1.3's lossless alternative to the reference's float collapse
    (from_parser_to_rabbitmq.py:60-63): units + nano*1e-9 evaluated entirely
    in decimal arithmetic, so every representable Quotation round-trips
    exactly. Multiplication (not division) by the 1e-9 decimal literal keeps
    both engines in exact decimal: division would rescale (Spark) or fall to
    DOUBLE (DuckDB). Result scale is 9 on both sides.

    Oracle spelling: ``CAST(units AS DECIMAL(18,9))
    + CAST(nano AS DECIMAL(19,0)) * CAST(0.000000001 AS DECIMAL(10,9))``.
    """
    return _col(units).cast("decimal(18,9)") + _col(nano).cast(
        "decimal(19,0)"
    ) * F.lit("0.000000001").cast("decimal(10,9)")


def imbalance(bid_volume: Column | str, ask_volume: Column | str) -> Column:
    """Order-book imbalance (b-a)/(b+a) — analytics goal №4 of the
    reference (app/for_rabbit/from_parser_to_rabbitmq.py:239-240)."""
    b = _col(bid_volume).cast("double")
    a = _col(ask_volume).cast("double")
    return (b - a) / (b + a)


def log_return(price: Column, prev_price: Column) -> Column:
    """Log return ln(p_t / p_{t-1}) — the volatility building block
    (reference analytics goal №1, from_parser_to_rabbitmq.py:228-229)."""
    return F.log(price / prev_price)
