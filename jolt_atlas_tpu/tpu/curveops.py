"""Batched BN254 G1 arithmetic on TPU: complete projective formulas.

Renes-Costello-Batina 2015 ("Complete addition formulas for prime order
elliptic curves"), Algorithm 7 specialized to a = 0, b = 3 (BN254's
y^2 = x^3 + 3): 12 field muls + cheap additions per point add, uniformly
correct for doubling, identity (0 : 1 : 0) and inverses — no branches, so
every lane of a batch runs the same instruction stream (SIMD-complete,
unlike the branchy Jacobian formulas the reference's CPU path uses,
msm/mod.rs:20-333).

Points are homogeneous projective (X : Y : Z) with coordinates in
fqplanes (16, n) Montgomery planes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field.constants import FQ_MODULUS
from .fqplanes import PlanesCtx, NPLANES

FQ = PlanesCtx(FQ_MODULUS)


def pp_add(P1, P2):
    """Complete projective add: ((X1,Y1,Z1), (X2,Y2,Z2)) -> (X3,Y3,Z3).

    RCB15 Algorithm 7 (a=0), with b3 = 3*b = 9 multiples computed by
    additions. Each input is a tuple of (16, n) planes."""
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    m, a, s = FQ.mul, FQ.add, FQ.sub

    def b3(x):  # 9x = 8x + x
        x2 = a(x, x)
        x4 = a(x2, x2)
        x8 = a(x4, x4)
        return a(x8, x)

    t0 = m(X1, X2)
    t1 = m(Y1, Y2)
    t2 = m(Z1, Z2)
    t3 = a(X1, Y1)
    t4 = a(X2, Y2)
    t3 = m(t3, t4)
    t4 = a(t0, t1)
    t3 = s(t3, t4)          # X1Y2 + X2Y1
    t4 = a(Y1, Z1)
    X3 = a(Y2, Z2)
    t4 = m(t4, X3)
    X3 = a(t1, t2)
    t4 = s(t4, X3)          # Y1Z2 + Y2Z1
    X3 = a(X1, Z1)
    Y3 = a(X2, Z2)
    X3 = m(X3, Y3)
    Y3 = a(t0, t2)
    Y3 = s(X3, Y3)          # X1Z2 + X2Z1
    X3 = a(t0, t0)
    t0 = a(X3, t0)          # 3 X1X2
    t2 = b3(t2)             # b3 Z1Z2
    Z3 = a(t1, t2)
    t1 = s(t1, t2)
    Y3 = b3(Y3)             # b3 (X1Z2 + X2Z1)
    X3 = m(t4, Y3)
    t2 = m(t3, t1)
    X3 = s(t2, X3)
    Y3 = m(Y3, t0)
    t1 = m(t1, Z3)
    Y3 = a(t1, Y3)
    t0 = m(t0, t3)
    Z3 = m(Z3, t4)
    Z3 = a(Z3, t0)
    return (X3, Y3, Z3)


def pp_identity(n: int):
    """(0 : 1 : 0) batch."""
    return (FQ.zero(n), FQ.one(n), FQ.zero(n))


def pp_select(cond, P, Q):
    """Lanewise select: cond ? P : Q."""
    return tuple(FQ.select(cond, p, q) for p, q in zip(P, Q))


# ---------------------------------------------------------------------------
# host conversion helpers
# ---------------------------------------------------------------------------

def points_to_planes(points):
    """list[G1] -> (X, Y, Z) numpy planes (projective, identity = (0,1,0))."""
    n = len(points)
    xs = [0 if p.infinity else p.x for p in points]
    ys = [1 if p.infinity else p.y for p in points]
    zs = [0 if p.infinity else 1 for p in points]
    return (FQ.to_planes(xs), FQ.to_planes(ys), FQ.to_planes(zs))


def planes_to_points(P):
    """(X, Y, Z) planes -> list[G1] (host; projective -> affine)."""
    from ..curve.points import G1
    X = FQ.from_planes(np.asarray(P[0]))
    Y = FQ.from_planes(np.asarray(P[1]))
    Z = FQ.from_planes(np.asarray(P[2]))
    out = []
    p = FQ.P
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(G1.identity())
        else:
            zi = pow(z, -1, p)
            out.append(G1(x * zi % p, y * zi % p))
    return out
