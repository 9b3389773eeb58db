"""Decimal rounding that matches DuckDB's ``ROUND(x, d)`` bit-for-bit.

Python ``round()`` and ``np.round`` round HALF TO EVEN; DuckDB (like C
``round``) rounds half AWAY FROM ZERO. The two diverge exactly on dyadic
rationals whose scaled value has fractional part 0.5 — e.g.
``65/128 = 0.5078125``: banker's rounding at 6 digits gives 0.507812,
DuckDB gives 0.507813 — so any Ray-side score compared against a
``ROUND(...)`` oracle must use this kernel (verified 0 mismatches against
DuckDB 1.0.0 over random + adversarial dyadic inputs, including
negatives).

The fractional comparison ``a - floor(a) >= 0.5`` runs on the already-
scaled double, which is precisely what C ``round`` evaluates — no
``+ 0.5`` addition that could carry across a representability boundary.
"""

from __future__ import annotations

import numpy as np


def round_away(values, digits: int = 6):
    """Vectorized round-half-away-from-zero to ``digits`` decimals.

    Accepts a scalar or array-like; returns float64 ndarray (or scalar
    float for scalar input), bit-identical to DuckDB ``ROUND(x, digits)``.
    """
    p = 10.0 ** digits
    x = np.asarray(values, dtype=np.float64)
    scaled = x * p
    a = np.abs(scaled)
    f = np.floor(a)
    r = f + (a - f >= 0.5)
    out = np.copysign(r, scaled) / p
    if np.isscalar(values) or getattr(values, "ndim", 1) == 0:
        return float(out)
    return out
