"""Limb-planes Montgomery field arithmetic for TPU (JAX/XLA).

Representation: a batch of field elements is a (16, n) uint32 array — 16
planes of 16-bit Montgomery limbs, least-significant plane first. The
planes layout keeps every step of the CIOS multiply a full-width VPU
vector op with no relayouts or gathers (the previous (n, 16) int-matrix
formulation measured 29.5 Mmul/s; this one measures ~105 Mmul/s on a
v5 lite chip, vs ~80 Mmul/s for the 4-core host C++ kernels).

Plays the role of the reference's ark-ff Montgomery backend on device
(joltworks/src/field/mod.rs:103-310); used by the TPU MSM
(tpu/curveops.py, tpu/msm.py) with the BN254 base field Fq.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

NPLANES = 16
MASK = 0xFFFF


class PlanesCtx:
    """Precomputed limb constants for one 256-bit modulus."""

    def __init__(self, modulus: int):
        self.P = modulus
        self.R = (1 << 256) % modulus
        self.n0inv = (-pow(modulus, -1, 1 << 16)) % (1 << 16)
        self.p_limbs = [(modulus >> (16 * i)) & MASK for i in range(NPLANES)]
        self.mont_one_limbs = [(self.R >> (16 * i)) & MASK
                               for i in range(NPLANES)]

    # -- host conversion ---------------------------------------------------
    def to_planes(self, values) -> np.ndarray:
        """Iterable of ints -> (16, n) uint32 Montgomery planes."""
        vals = [int(v) % self.P for v in values]
        n = len(vals)
        out = np.zeros((NPLANES, n), dtype=np.uint32)
        for col, v in enumerate(vals):
            mv = v * self.R % self.P
            for i in range(NPLANES):
                out[i, col] = (mv >> (16 * i)) & MASK
        return out

    def from_planes(self, arr) -> list[int]:
        a = np.asarray(arr)
        rinv = pow(self.R, -1, self.P)
        out = []
        for col in range(a.shape[1]):
            v = 0
            for i in range(NPLANES - 1, -1, -1):
                v = (v << 16) | int(a[i, col])
            out.append(v * rinv % self.P)
        return out

    def limbs_to_planes_u64(self, limbs_u64: np.ndarray) -> np.ndarray:
        """(n, 4) u64 little-endian limbs -> (16, n) u32 16-bit planes
        (pure numpy reshuffle; values taken as-is, no Montgomery scaling)."""
        n = len(limbs_u64)
        out = np.empty((NPLANES, n), dtype=np.uint32)
        for w in range(4):
            col = limbs_u64[:, w]
            for s in range(4):
                out[4 * w + s] = ((col >> np.uint64(16 * s))
                                  & np.uint64(MASK)).astype(np.uint32)
        return out

    # -- device ops (trace-time; operands are (16, n) uint32) -------------
    def zero(self, n: int):
        return jnp.zeros((NPLANES, n), dtype=jnp.uint32)

    def one(self, n: int):
        base = np.zeros((NPLANES, n), dtype=np.uint32)
        for i, l in enumerate(self.mont_one_limbs):
            base[i, :] = l
        return jnp.asarray(base)

    def mul(self, a, b):
        """Montgomery product, 16-bit CIOS. Result < p (canonical).

        The 16 outer CIOS steps run under lax.fori_loop: a fully unrolled
        multiply is ~2.5k XLA ops and a 12-mul point-add built on it wedged
        this environment's remote-compile relay for ~10 minutes per shape;
        the looped form compiles in seconds at a small runtime cost."""
        pl = jnp.asarray(np.array(self.p_limbs, dtype=np.uint32))
        n0 = jnp.uint32(self.n0inv)
        t0 = jnp.zeros((18,) + a.shape[1:], dtype=jnp.uint32)

        def step(i, t):
            ai = jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False)
            planes = []
            c = None
            for j in range(NPLANES):
                cur = t[j] + ai * b[j] if c is None else t[j] + ai * b[j] + c
                planes.append(cur & MASK)
                c = cur >> 16
            cur = t[16] + c
            p16 = cur & MASK
            p17 = t[17] + (cur >> 16)
            m = (planes[0] * n0) & MASK
            c = (planes[0] + m * pl[0]) >> 16
            out = []
            for j in range(1, NPLANES):
                cur = planes[j] + m * pl[j] + c
                out.append(cur & MASK)
                c = cur >> 16
            cur = p16 + c
            out.append(cur & MASK)
            cur = p17 + (cur >> 16)
            out.append(cur & MASK)
            out.append(jnp.zeros_like(ai))
            return jnp.stack(out)

        t = jax.lax.fori_loop(0, NPLANES, step, t0)
        return self._cond_sub_p([t[j] for j in range(17)])

    def _cond_sub_p(self, t17):
        """t (17 planes, value < 2p) -> canonical < p."""
        pl = self.p_limbs
        ge = jnp.ones_like(t17[0], dtype=jnp.bool_)
        gt = jnp.zeros_like(t17[0], dtype=jnp.bool_)
        for j in range(NPLANES - 1, -1, -1):
            gt = gt | (ge & (t17[j] > pl[j]))
            ge = ge & (t17[j] >= pl[j])
        take = gt | ge | (t17[16] > 0)
        borrow = None
        out = []
        for j in range(NPLANES):
            cur = (t17[j] + 0x10000 - pl[j] if borrow is None
                   else t17[j] + 0x10000 - pl[j] - borrow)
            out.append(jnp.where(take, cur & MASK, t17[j]))
            borrow = 1 - (cur >> 16)
        return jnp.stack(out)

    def add(self, a, b):
        c = None
        t = []
        for j in range(NPLANES):
            cur = a[j] + b[j] if c is None else a[j] + b[j] + c
            t.append(cur & MASK)
            c = cur >> 16
        t.append(c)
        return self._cond_sub_p(t)

    def sub(self, a, b):
        """(a - b) mod p as a + p - b with a 2^16 lend per limb; the
        wrapped-signed carry c is in {-1, 0, 1} (stored mod 2^32)."""
        pl = self.p_limbs
        t = []
        c = jnp.zeros_like(a[0])
        for j in range(NPLANES):
            cur = a[j] + jnp.uint32(pl[j] + 0x10000) - b[j] + c
            t.append(cur & MASK)
            c = (cur >> 16) - 1
        # a + p - b < 2p < 2^256: the final carry is provably zero
        t.append(jnp.zeros_like(c))
        return self._cond_sub_p(t)

    def dbl(self, a):
        return self.add(a, a)

    def triple(self, a):
        return self.add(self.add(a, a), a)

    def is_zero(self, a):
        z = a[0]
        for j in range(1, NPLANES):
            z = z | a[j]
        return z == 0

    def select(self, cond, a, b):
        """cond: (n,) bool -> planes where(cond, a, b)."""
        return jnp.where(cond[None, :], a, b)
