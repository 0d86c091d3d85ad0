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
