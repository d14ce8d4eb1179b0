"""Vectorized BN254 Fr arithmetic for TPU (JAX).

Design (TPU-first, see SURVEY.md §7.1): TPUs have no 64-bit integer multiply,
so field elements are represented as 16 little-endian limbs of 16 bits each,
stored in uint32 lanes (shape (..., 16)). All limb products fit in uint32;
column accumulations stay below 2^22, so there are no intermediate overflows.

Elements are kept in Montgomery form (value * 2^256 mod r) with the *relaxed*
invariant x < 2r: `mont_mul` needs no conditional subtraction at all, and
add/sub need exactly one compare-and-select. Strict canonical reduction only
happens at host conversion / serialization boundaries.

This plays the role of the reference's unreduced-accumulation field layer
(joltworks/src/field/mod.rs:103-341, Unreduced<N>/fmadd — defer reductions out
of hot loops); here the analogue is straight-line limb-plane arithmetic that
XLA fuses into a single VPU kernel.

All public functions are jit-compatible pure functions over uint32 arrays.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .constants import (
    FR_MODULUS,
    FR_N0_INV_16,
    FR_R,
    FR_R2,
    limbs_from_int,
    int_from_limbs,
)

NLIMB = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

_R_LIMBS = limbs_from_int(FR_R, NLIMB, LIMB_BITS)
_R2_LIMBS = limbs_from_int(FR_R2, NLIMB, LIMB_BITS)
_N_LIMBS = limbs_from_int(FR_MODULUS, NLIMB, LIMB_BITS)
_2N_LIMBS = limbs_from_int(2 * FR_MODULUS, NLIMB + 1, LIMB_BITS)
_N0INV = FR_N0_INV_16

# Montgomery representation of handy constants (numpy, shape (16,))
MONT_ONE = np.array(_R_LIMBS, dtype=np.uint32)
MONT_R2 = np.array(_R2_LIMBS, dtype=np.uint32)
ZERO = np.zeros(NLIMB, dtype=np.uint32)


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------

def to_limbs_host(values) -> np.ndarray:
    """Python ints (canonical, mod r) -> Montgomery limb array (n, 16) u32."""
    out = np.zeros((len(values), NLIMB), dtype=np.uint32)
    for i, v in enumerate(values):
        m = (int(v) % FR_MODULUS) * FR_R % FR_MODULUS
        for j in range(NLIMB):
            out[i, j] = (m >> (LIMB_BITS * j)) & LIMB_MASK
    return out


def from_limbs_host(arr) -> list[int]:
    """Montgomery limb array (..., 16) -> canonical Python ints (flattened)."""
    a = np.asarray(arr, dtype=np.uint64).reshape(-1, NLIMB)
    rinv = pow(FR_R, -1, FR_MODULUS)
    return [(int_from_limbs(row, LIMB_BITS) * rinv) % FR_MODULUS for row in a]


def limbs_of_scalar(v: int) -> jnp.ndarray:
    """Single canonical int -> Montgomery limbs, shape (16,)."""
    m = (int(v) % FR_MODULUS) * FR_R % FR_MODULUS
    return jnp.array(limbs_from_int(m, NLIMB, LIMB_BITS), dtype=jnp.uint32)


def zeros(shape) -> jnp.ndarray:
    if isinstance(shape, int):
        shape = (shape,)
    return jnp.zeros(tuple(shape) + (NLIMB,), dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# limb-list helpers: operating on python lists of (...,)-shaped u32 arrays
# keeps the XLA graph purely elementwise (no dynamic-update-slice traffic)
# ---------------------------------------------------------------------------

def _split(arr):
    return [arr[..., i] for i in range(arr.shape[-1])]


def _join(cols):
    return jnp.stack(cols, axis=-1)


def _carry_propagate(cols, n_out):
    """Normalize redundant uint32 columns into 16-bit limbs (n_out of them)."""
    out = []
    carry = jnp.zeros_like(cols[0])
    for i in range(n_out):
        v = (cols[i] if i < len(cols) else jnp.zeros_like(carry)) + carry
        out.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return out, carry


def _sub_with_borrow(a_cols, b_limbs):
    """a - b for normalized limb list a and python-int limbs b.

    Returns (diff limbs, borrow_out) where borrow_out == 1 iff a < b.
    """
    out = []
    borrow = jnp.zeros_like(a_cols[0])
    for i in range(len(a_cols)):
        b = b_limbs[i] if i < len(b_limbs) else 0
        v = a_cols[i] + jnp.uint32(1 << LIMB_BITS) - jnp.uint32(b) - borrow
        out.append(v & LIMB_MASK)
        borrow = 1 - (v >> LIMB_BITS)
    return out, borrow


def _select(cond, a_cols, b_cols):
    return [jnp.where(cond, a, b) for a, b in zip(a_cols, b_cols)]


def _cond_sub_2n(cols17):
    """17 normalized limbs, value < 4r: subtract 2r if >= 2r; 16 limbs out."""
    diff, borrow = _sub_with_borrow(cols17, _2N_LIMBS)
    ge = borrow == 0
    return _select(ge, diff[:NLIMB], cols17[:NLIMB])


# ---------------------------------------------------------------------------
# core modular ops (Montgomery form, relaxed invariant x < 2r)
# ---------------------------------------------------------------------------

def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product of (..., 16) u32 limb arrays; inputs/output < 2r.

    Product-scanning multiply into 33 redundant uint32 columns followed by 16
    rounds of interleaved Montgomery digit reduction, then carry
    normalization. The x < 2r relaxed invariant makes the output bound
    4r^2/2^256 + r < 2r, so no conditional subtract is needed.
    """
    a_cols = _split(a)
    b_cols = _split(b)
    zero = jnp.zeros(
        jnp.broadcast_shapes(a_cols[0].shape, b_cols[0].shape), dtype=jnp.uint32
    )
    cols = [zero] * (2 * NLIMB + 1)

    for i in range(NLIMB):
        ai = a_cols[i]
        for j in range(NLIMB):
            p = ai * b_cols[j]
            cols[i + j] = cols[i + j] + (p & LIMB_MASK)
            cols[i + j + 1] = cols[i + j + 1] + (p >> LIMB_BITS)

    n0inv = jnp.uint32(_N0INV)
    for i in range(NLIMB):
        m = (cols[i] * n0inv) & LIMB_MASK
        for j in range(NLIMB):
            p = m * jnp.uint32(_N_LIMBS[j])
            cols[i + j] = cols[i + j] + (p & LIMB_MASK)
            cols[i + j + 1] = cols[i + j + 1] + (p >> LIMB_BITS)
        cols[i + 1] = cols[i + 1] + (cols[i] >> LIMB_BITS)

    out, _ = _carry_propagate(cols[NLIMB:], NLIMB)
    return _join(out)


def mont_mul_scalar(a: jnp.ndarray, s_limbs) -> jnp.ndarray:
    """Multiply each element of `a` by one scalar given as (16,) limbs."""
    s = jnp.asarray(s_limbs, dtype=jnp.uint32)
    return mont_mul(a, jnp.broadcast_to(s, a.shape))


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field add; inputs < 2r, output < 2r."""
    cols = [x + y for x, y in zip(_split(a), _split(b))]
    norm, carry = _carry_propagate(cols, NLIMB)
    norm.append(carry)
    return _join(_cond_sub_2n(norm))


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field sub: (a + 2r - b) with one conditional subtract; stays < 2r."""
    a_cols = _split(a)
    b_cols = _split(b)
    out = []
    carry = jnp.zeros_like(a_cols[0])  # uint32; -1 wraps, which is fine mod 2^32
    for i in range(NLIMB + 1):
        av = a_cols[i] if i < NLIMB else jnp.zeros_like(a_cols[0])
        bv = b_cols[i] if i < NLIMB else jnp.zeros_like(a_cols[0])
        v = av + jnp.uint32(_2N_LIMBS[i]) - bv + jnp.uint32(1 << LIMB_BITS) + carry
        out.append(v & LIMB_MASK)
        carry = (v >> LIMB_BITS) - 1
    return _join(_cond_sub_2n(out))


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return sub(jnp.zeros_like(a), a)


def mont_square(a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(a, a)


def from_signed_ints(x: jnp.ndarray, bits: int = 32) -> jnp.ndarray:
    """Signed integer array (i32/i64 values) -> Montgomery limb array.

    Mirrors the reference's small-scalar embeddings (JoltField::from_i64,
    field/mod.rs:150-170): |x| -> Montgomery via one mul by R^2, negated where
    x < 0.
    """
    x = jnp.asarray(x)
    negmask = x < 0
    cols = []
    if bits > 32:
        ax = jnp.abs(x.astype(jnp.int64)).astype(jnp.uint64)
        for i in range(NLIMB):
            if i * LIMB_BITS < 64:
                cols.append(((ax >> (i * LIMB_BITS)) & LIMB_MASK).astype(jnp.uint32))
            else:
                cols.append(jnp.zeros_like(cols[0]))
    else:
        ax = jnp.abs(x).astype(jnp.uint32)
        for i in range(NLIMB):
            if i * LIMB_BITS < 32:
                cols.append((ax >> (i * LIMB_BITS)) & LIMB_MASK)
            else:
                cols.append(jnp.zeros_like(cols[0]))
    raw = _join(cols)
    mont = mont_mul(raw, jnp.broadcast_to(jnp.asarray(MONT_R2), raw.shape))
    return jnp.where(negmask[..., None], neg(mont), mont)


def to_canonical(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> strictly-reduced canonical limbs (< r), (..., 16)."""
    one = jnp.zeros_like(a).at[..., 0].set(1)
    v = mont_mul(a, one)  # value * R * R^{-1} = canonical value, < 2r
    cols = _split(v)
    cols.append(jnp.zeros_like(cols[0]))
    diff, borrow = _sub_with_borrow(cols, _N_LIMBS + [0])
    ge = borrow == 0
    return _join(_select(ge, diff[:NLIMB], cols[:NLIMB]))


def sum_reduce(a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Field sum along `axis` via pairwise tree reduction (invariant-safe)."""
    a = jnp.moveaxis(a, axis, 0)
    if a.shape[0] == 0:
        return jnp.zeros(a.shape[1:], dtype=jnp.uint32)
    while a.shape[0] > 1:
        m = a.shape[0]
        if m % 2 == 1:
            pad = jnp.zeros((1,) + a.shape[1:], dtype=jnp.uint32)
            a = jnp.concatenate([a, pad], axis=0)
            m += 1
        a = add(a[: m // 2], a[m // 2 :])
    return a[0]


def dot(a: jnp.ndarray, b: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Field inner product sum(a*b) along `axis`."""
    return sum_reduce(mont_mul(a, b), axis=axis)


# jitted convenience entry points
mont_mul_jit = jax.jit(mont_mul)
add_jit = jax.jit(add)
sub_jit = jax.jit(sub)
