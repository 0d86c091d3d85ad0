"""Shared driver-side rounding that matches the DuckDB twin.

DuckDB's ``round(x, 6)`` rounds half away from zero, while Python's
built-in ``round`` is banker's (half to even).  Every operator that rounds
a driver-side float before handing it to the oracle gate must use
:func:`r6` so a REAL .5-tie (exact rationals with power-of-two
denominators, e.g. lcs/128) cannot diverge between engines.
"""

from __future__ import annotations

import math


def r6(x: float) -> float:
    """Half-away-from-zero 6dp rounding for non-negative inputs."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def r6_col(c):
    """Spark Column twin of :func:`r6`: floor(x·1e6 + 0.5)/1e6.

    The IDENTICAL IEEE op sequence (multiply, add, floor, divide) as
    :func:`r6_sql`, unlike ``F.round`` (HALF_UP over the double's
    shortest decimal repr) vs DuckDB ``round()`` (half away from zero on
    the binary value), which can disagree on representation-boundary
    values — a gate-flipping divergence when the rounded value feeds a
    threshold or an argmin (see analytics/clustering.py's Lloyd rule).
    For negatives the rule is half-up toward +inf at exact .5 ties; what
    matters for the oracle gate is that both engines run the same ops."""
    from pyspark.sql import functions as F

    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def r6_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`r6_col` — the same floor rule."""
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"
