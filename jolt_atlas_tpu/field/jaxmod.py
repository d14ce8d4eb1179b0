"""Parameterized 16-bit-limb Montgomery arithmetic (JAX, TPU-first).

Role: modulus-parameterized TPU limb field core (the Pallas/XLA seam for
the reference's ark Montgomery backend, joltworks/src/field/ark.rs) in
matrix form: int32 dot_general column accumulation, MXU-friendly.

Generalizes field/jaxfr.py to any 256-bit modulus: used with the BN254 base
field Fq for vectorized curve arithmetic (the MSM hot path) and with Fr for
polynomial work. Same representation contract: (..., 16) uint32 arrays of
16-bit limbs in Montgomery form, relaxed invariant x < 2N.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .constants import limbs_from_int, int_from_limbs

NLIMB = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

# scatter matrices mapping flattened (i, j) limb-product positions to columns
_sl = np.zeros((NLIMB * NLIMB, 2 * NLIMB + 1), dtype=np.int32)
_sh = np.zeros((NLIMB * NLIMB, 2 * NLIMB + 1), dtype=np.int32)
for _i in range(NLIMB):
    for _j in range(NLIMB):
        _sl[_i * NLIMB + _j, _i + _j] = 1
        _sh[_i * NLIMB + _j, _i + _j + 1] = 1
_SCATTER_LO = jnp.asarray(_sl)
_SCATTER_HI = jnp.asarray(_sh)


class ModCtx:
    """Precomputed limb constants for one modulus."""

    def __init__(self, modulus: int):
        self.N = modulus
        self.R = (1 << 256) % modulus
        self.R2 = (self.R * self.R) % modulus
        self.n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.n_limbs = limbs_from_int(modulus, NLIMB, LIMB_BITS)
        self.n2_limbs = limbs_from_int(2 * modulus, NLIMB + 1, LIMB_BITS)
        self.mont_one = np.array(limbs_from_int(self.R, NLIMB, LIMB_BITS),
                                 dtype=np.uint32)

    # -- host conversion ---------------------------------------------------
    def to_limbs(self, values) -> np.ndarray:
        out = np.zeros((len(values), NLIMB), dtype=np.uint32)
        for i, v in enumerate(values):
            m = (int(v) % self.N) * self.R % self.N
            for j in range(NLIMB):
                out[i, j] = (m >> (LIMB_BITS * j)) & LIMB_MASK
        return out

    def from_limbs(self, arr) -> list[int]:
        a = np.asarray(arr, dtype=np.uint64).reshape(-1, NLIMB)
        rinv = pow(self.R, -1, self.N)
        return [(int_from_limbs(row, LIMB_BITS) * rinv) % self.N for row in a]

    # -- device ops (jit-compatible; python loops are static unrolls) ------
    def _carry(self, cols, n_out):
        out = []
        carry = jnp.zeros_like(cols[0])
        for i in range(n_out):
            v = (cols[i] if i < len(cols) else jnp.zeros_like(carry)) + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return out, carry

    def _sub_borrow(self, a_cols, b_limbs):
        out = []
        borrow = jnp.zeros_like(a_cols[0])
        for i in range(len(a_cols)):
            b = b_limbs[i] if i < len(b_limbs) else 0
            v = a_cols[i] + jnp.uint32(1 << LIMB_BITS) - jnp.uint32(b) - borrow
            out.append(v & LIMB_MASK)
            borrow = 1 - (v >> LIMB_BITS)
        return out, borrow

    def _cond_sub_2n(self, cols17):
        diff, borrow = self._sub_borrow(cols17, self.n2_limbs)
        ge = borrow == 0
        return [jnp.where(ge, d, c) for d, c in zip(diff[:NLIMB], cols17[:NLIMB])]

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Matrix-form Montgomery product: the schoolbook column sums are one
        (.., 256) x (256, 33) integer matmul (MXU-friendly, tiny XLA graph);
        only the 16 Montgomery reduction steps stay sequential."""
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        p = (a[..., :, None] * b[..., None, :]).reshape(shape[:-1] + (NLIMB * NLIMB,))
        plo = (p & LIMB_MASK).astype(jnp.int32)
        phi = (p >> LIMB_BITS).astype(jnp.int32)
        cols = (
            jax.lax.dot_general(plo, _SCATTER_LO, (((plo.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            + jax.lax.dot_general(phi, _SCATTER_HI, (((phi.ndim - 1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        ).astype(jnp.uint32)
        n0 = jnp.uint32(self.n0inv)
        nvec = jnp.asarray(np.array(self.n_limbs, dtype=np.uint32))
        for i in range(NLIMB):
            m = (cols[..., i] * n0) & LIMB_MASK
            prod = m[..., None] * nvec
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            cols = cols.at[..., i: i + NLIMB].add(lo)
            cols = cols.at[..., i + 1: i + 1 + NLIMB].add(hi)
            cols = cols.at[..., i + 1].add(cols[..., i] >> LIMB_BITS)
        out, _ = self._carry([cols[..., t] for t in range(NLIMB, 2 * NLIMB + 1)],
                             NLIMB)
        return jnp.stack(out, axis=-1)

    def add(self, a, b):
        cols = [a[..., i] + b[..., i] for i in range(NLIMB)]
        norm, carry = self._carry(cols, NLIMB)
        norm.append(carry)
        return jnp.stack(self._cond_sub_2n(norm), axis=-1)

    def sub(self, a, b):
        out = []
        carry = jnp.zeros_like(a[..., 0])
        for i in range(NLIMB + 1):
            av = a[..., i] if i < NLIMB else jnp.zeros_like(carry)
            bv = b[..., i] if i < NLIMB else jnp.zeros_like(carry)
            v = av + jnp.uint32(self.n2_limbs[i]) - bv \
                + jnp.uint32(1 << LIMB_BITS) + carry
            out.append(v & LIMB_MASK)
            carry = (v >> LIMB_BITS) - 1
        return jnp.stack(self._cond_sub_2n(out), axis=-1)

    def is_zero(self, a) -> jnp.ndarray:
        """True where the value is 0 mod N (canonical 0 or N in relaxed form)."""
        z = jnp.all(a == 0, axis=-1)
        cols = [a[..., i] for i in range(NLIMB)] + [jnp.zeros_like(a[..., 0])]
        diff, borrow = self._sub_borrow(cols, self.n_limbs + [0])
        eq_n = (borrow == 0) & jnp.all(
            jnp.stack(diff[:NLIMB], axis=-1) == 0, axis=-1)
        return z | eq_n

    def eq(self, a, b) -> jnp.ndarray:
        return self.is_zero(self.sub(a, b))
