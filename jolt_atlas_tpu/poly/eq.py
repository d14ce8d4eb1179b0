"""Eq polynomial tables (big-endian index order, r[0] = MSB).

Mirrors reference joltworks/src/poly/eq_poly.rs:62-101: evals(r)[i] =
prod_j (b_j ? r[j] : 1 - r[j]) where b_0 is the most-significant bit of i.
"""

from __future__ import annotations

import numpy as np

from ..field import vec
from ..field.scalar import Fr


def eq_evals(r: list[Fr], scale: Fr | None = None):
    """Table of eq(r, x) for all x in {0,1}^n (FrArray on the native path,
    object-int array on the fallback)."""
    table = vec.full(1, scale if scale is not None else Fr.one())
    for rj in r:  # r[0] first; each new variable becomes the LSB (interleave)
        hi = vec.vscale(table, rj)
        lo = vec.vsub(table, hi)  # table * (1 - r_j)
        if isinstance(table, np.ndarray):
            out = np.empty(2 * len(table), dtype=object)
        else:
            from ..field.frvec import FrArray
            out = FrArray.zeros(2 * len(table))
        out[0::2] = lo
        out[1::2] = hi
        table = out
    return table


def eq_eval_scalar(x: list[Fr], y: list[Fr]) -> Fr:
    """eq(x, y) = prod_i (x_i y_i + (1-x_i)(1-y_i))."""
    assert len(x) == len(y)
    acc = Fr.one()
    one = Fr.one()
    for xi, yi in zip(x, y):
        acc = acc * (xi * yi + (one - xi) * (one - yi))
    return acc
