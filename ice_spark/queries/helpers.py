"""Cross-engine deterministic aggregation helpers.

Doubles summed in different orders differ in the last ulps; at sf0.1
the accumulated error can cross a rounding boundary. We therefore sum
through exact decimals (order-insensitive) and cast the final value
back to double so Spark and DuckDB produce bit-identical results with
identical schemas. See queries/registry.py docstring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"
HI = "decimal(30,10)"  # for per-row double products before summing


# String-named columns go through F.expr (one py4j round trip, parsed
# JVM-side) — the sql_* builders below emit SQL that is valid in BOTH
# engines, so the Spark expression and the DuckDB oracle share text.
# Column inputs keep the Column-API path.


def dsum(col: Column | str, scale: str = MONEY) -> Column:
    """Order-insensitive sum of a double column, returned as double."""
    if isinstance(col, str):
        return F.expr(sql_dsum(col, scale.upper()))
    return F.sum(col.cast(scale)).cast("double")


def davg(col: Column | str, count_col: Column | None = None, scale: str = MONEY) -> Column:
    """Deterministic average: exact decimal sum → double, / count."""
    if isinstance(col, str) and count_col is None:
        return F.expr(sql_davg(col, scale=scale.upper()))
    c = F.col(col) if isinstance(col, str) else col
    cnt = count_col if count_col is not None else F.count(F.lit(1))
    return F.sum(c.cast(scale)).cast("double") / cnt


def sql_dsum(expr: str, scale: str = "DECIMAL(18,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE)"


def sql_davg(expr: str, count_expr: str = "COUNT(*)", scale: str = "DECIMAL(18,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE) / {count_expr}"


def sql_dsum_hi(expr: str) -> str:
    return sql_dsum(expr, "DECIMAL(30,10)")


# --- Exact decimal products -------------------------------------------------
# Casting a computed double to a fine-scaled decimal (e.g. (30,10)) is
# NOT portable: the 1e-10 grid is only ~10x the double ulp at 1e4
# magnitudes, so engines disagree on rounding for a measurable share
# of rows. Instead cast the *inputs* at coarse scales (ties are
# unreachable: a 2-decimal-generated double is never half-way between
# two 4-decimal grid points) and multiply in decimal — exact and
# bit-identical everywhere.

# revenue = extendedprice * (1 - discount), exact decimal(25,6)
REV_DEC_SPARK = None  # built lazily in rev_dec() to avoid import-order issues
SQL_REV_DEC = (
    "(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))"
)
SQL_SUM_REV = f"CAST(SUM({SQL_REV_DEC}) AS DOUBLE)"


def rev_dec() -> Column:
    """l_extendedprice * (1 - l_discount) as an exact decimal."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(5,4)")
    )


def charge_dec() -> Column:
    """revenue * (1 + tax) as an exact decimal."""
    return rev_dec().cast("decimal(24,6)") * (
        F.lit(1).cast("decimal(5,4)") + F.col("l_tax").cast("decimal(5,4)")
    )


SQL_CHARGE_DEC = (
    f"(CAST({SQL_REV_DEC} AS DECIMAL(24,6))"
    " * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(5,4))))"
)


def sql_sum_dec(expr: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE)"


# --- Exact integer (cents) arithmetic ---------------------------------------
# The fast path for money aggregates: quantize inputs to integer
# cents / basis points with ROUND(x*scale) — identical in both
# engines on d-decimal-generated doubles (ties unreachable; verified
# row-for-row against DECIMAL input casts on every money column at
# sf0.01) and ~1.7x faster than decimal casts in the q01 hot path
# (no BigDecimal per row). Do all arithmetic in exact 64-bit
# integers, divide once at the end.
#
# Round-6 forensics: the round-5 driver hash failures blamed on this
# idiom were actually HUGEINT exposure — DuckDB widens SUM(BIGINT)
# to int128 and the driver's fetch path renders it differently.
# e17/e20/a07 were driver-GREEN while exposing ROUND-derived integer
# sums (always behind CAST(... AS BIGINT)); the fix is the exposure
# cast + tools/lint_oracles.py's output-type whitelist, not the
# quantization idiom. Headroom: sums stay < 2^63 through ~sf5;
# beyond that use the decimal path (rev_dec).

def cents(col: Column | str, scale: int = 100) -> Column:
    if isinstance(col, str):
        return F.expr(sql_cents(col, scale))
    return F.round(col * scale).cast("long")


def sql_cents(expr: str, scale: int = 100) -> str:
    return f"CAST(ROUND(({expr}) * {scale}) AS BIGINT)"


def rev_u() -> Column:
    """revenue in micro-units (scale 1e6): cents * (1e4 - disc_bp)."""
    return F.expr(SQL_REV_U)


SQL_REV_U = (
    f"({sql_cents('l_extendedprice')} * (10000 - {sql_cents('l_discount', 10000)}))"
)


def sum_rev_fast() -> Column:
    return F.expr(SQL_SUM_REV_FAST)


SQL_SUM_REV_FAST = f"CAST(SUM({SQL_REV_U}) AS DOUBLE) / 1e6"


def csum(col: Column | str, scale: int = 100) -> Column:
    """Deterministic money sum via integer cents, as double."""
    if isinstance(col, str):
        return F.expr(sql_csum(col, scale))
    return F.sum(cents(col, scale)).cast("double") / float(scale)


def sql_csum(expr: str, scale: int = 100) -> str:
    return f"CAST(SUM({sql_cents(expr, scale)}) AS DOUBLE) / {scale}.0"


def cavg(col: Column | str, scale: int = 100) -> Column:
    """Deterministic average via integer cents."""
    if isinstance(col, str):
        return F.expr(sql_cavg(col, scale))
    return F.sum(cents(col, scale)).cast("double") / float(scale) / F.count(F.lit(1))


def sql_cavg(expr: str, scale: int = 100, count_expr: str = "COUNT(*)") -> str:
    return f"CAST(SUM({sql_cents(expr, scale)}) AS DOUBLE) / {scale}.0 / {count_expr}"
