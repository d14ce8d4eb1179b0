"""Pallas TPU kernel: fused complete projective point addition on
limb-plane Montgomery field elements.

The XLA planes engine (tpu/fqplanes.py) builds each field multiply from
~35 separate HLO ops per CIOS step under a fori_loop; a 12-multiply
RCB15 point add then measures ~66 Mmul/s effective — every temporary
round-trips HBM between fused regions. This kernel keeps the ENTIRE
add (12 Montgomery multiplies + ~20 field add/subs, fully unrolled) in
VMEM registers per 128-lane block, so the only HBM traffic per lane is
reading the 6 input plane-sets and writing 3.

Layout: a batch of n field elements is (16, R, 128) uint32 — 16 planes
of 16-bit Montgomery limbs (least-significant first), lanes tiled into
(R, 128) vector-friendly blocks. Conversion from the (16, n) planes of
fqplanes.PlanesCtx is a reshape when n is a multiple of 128.

Replaces the compute path of tpu/curveops.pp_add (reference hot-loop
counterpart: the bucket-accumulation adds of joltworks/src/msm/mod.rs
Pippenger); formulas are RCB15 Algorithm 7 (a=0, b3=9), identical
branch-free complete-add semantics, bit-identical outputs.
"""

from __future__ import annotations

import functools

import numpy as np

from ..field.constants import FQ_MODULUS

NPLANES = 16
MASK = 0xFFFF

_P_LIMBS = [(FQ_MODULUS >> (16 * i)) & MASK for i in range(NPLANES)]
_N0INV = (-pow(FQ_MODULUS, -1, 1 << 16)) % (1 << 16)

# lanes processed per pallas program: 16 planes x R x 128 u32
_R = 8


def _mont_mul(jnp, a, b):
    """16-step CIOS on lists of 16 (R, 128) u32 planes; returns 17 planes
    (value < 2p) — caller must _cond_sub_p. Fully unrolled."""
    t = [None] * 18  # None encodes known-zero
    for i in range(NPLANES):
        ai = a[i]
        c = None
        for j in range(NPLANES):
            cur = ai * b[j]
            if t[j] is not None:
                cur = cur + t[j]
            if c is not None:
                cur = cur + c
            t[j] = cur & MASK
            c = cur >> 16
        cur = c if t[16] is None else t[16] + c
        p16 = cur & MASK
        hi = cur >> 16
        p17 = hi if t[17] is None else t[17] + hi
        m = (t[0] * _N0INV) & MASK
        c = (t[0] + m * _P_LIMBS[0]) >> 16
        for j in range(1, NPLANES):
            cur = t[j] + m * _P_LIMBS[j] + c
            t[j - 1] = cur & MASK
            c = cur >> 16
        cur = p16 + c
        t[15] = cur & MASK
        t[16] = p17 + (cur >> 16)
        t[17] = None
    return t[:17]


def _cond_sub_p(jnp, t17):
    """17 planes (< 2p) -> canonical 16 planes (< p)."""
    ge = None  # all limbs >= p so far (None == True)
    gt = None  # strictly greater found (None == False)
    for j in range(NPLANES - 1, -1, -1):
        is_gt = t17[j] > _P_LIMBS[j]
        is_ge = t17[j] >= _P_LIMBS[j]
        gt = is_gt if gt is None else gt | (ge & is_gt)
        ge = is_ge if ge is None else ge & is_ge
    take = gt | ge
    if t17[16] is not None:
        take = take | (t17[16] > 0)
    out = []
    borrow = None
    for j in range(NPLANES):
        cur = t17[j] + (0x10000 - _P_LIMBS[j])
        if borrow is not None:
            cur = cur - borrow
        out.append(jnp.where(take, cur & MASK, t17[j]))
        borrow = 1 - (cur >> 16)
    return out


def _fadd(jnp, a, b):
    c = None
    t = []
    for j in range(NPLANES):
        cur = a[j] + b[j]
        if c is not None:
            cur = cur + c
        t.append(cur & MASK)
        c = cur >> 16
    t.append(c)
    return _cond_sub_p(jnp, t)


def _fsub(jnp, a, b):
    t = []
    c = None
    for j in range(NPLANES):
        cur = a[j] + np.uint32(_P_LIMBS[j] + 0x10000) - b[j]
        if c is not None:
            cur = cur + c
        t.append(cur & MASK)
        c = (cur >> 16) - 1
    t.append(None)  # a + p - b < 2p: final carry provably zero
    return _cond_sub_p(jnp, t)


def _pp_add_body(jnp, P1, P2):
    """RCB15 Algorithm 7 (a=0, b3=9) on plane lists — mirrors
    tpu/curveops.pp_add op for op so outputs are bit-identical."""
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    m = lambda a, b: _cond_sub_p(jnp, _mont_mul(jnp, a, b))
    a = lambda x, y: _fadd(jnp, x, y)
    s = lambda x, y: _fsub(jnp, x, y)

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


@functools.lru_cache(maxsize=None)
def _add_kernel(nblocks: int):
    """pallas_call: 6 x (16, nblocks*R, 128) -> 3 x (16, nblocks*R, 128)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        P1 = tuple([r[j] for j in range(NPLANES)] for r in (x1, y1, z1))
        P2 = tuple([r[j] for j in range(NPLANES)] for r in (x2, y2, z2))
        X3, Y3, Z3 = _pp_add_body(jnp, P1, P2)
        for j in range(NPLANES):
            ox[j] = X3[j]
            oy[j] = Y3[j]
            oz[j] = Z3[j]

    shape = (NPLANES, _R, 128)
    spec = pl.BlockSpec(shape, lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)

    def run(x1, y1, z1, x2, y2, z2):
        out_shape = jax.ShapeDtypeStruct(x1.shape, jnp.uint32)
        return pl.pallas_call(
            kern,
            grid=(nblocks,),
            out_shape=(out_shape,) * 3,
            in_specs=[spec] * 6,
            out_specs=(spec,) * 3,
        )(x1, y1, z1, x2, y2, z2)

    return jax.jit(run)


def pp_add(P1, P2):
    """Drop-in for curveops.pp_add on (16, n) planes with n a multiple of
    1024 (= _R * 128): routes through the fused Pallas kernel."""
    import jax.numpy as jnp
    n = P1[0].shape[-1]
    assert n % (_R * 128) == 0, n
    nb = n // (_R * 128)
    args = [p.reshape(NPLANES, nb * _R, 128) for p in (*P1, *P2)]
    X3, Y3, Z3 = _add_kernel(nb)(*args)
    return tuple(p.reshape(NPLANES, n) for p in (X3, Y3, Z3))
