"""Vectorized Fr arrays: host object-int path + TPU limb path dispatch.

Two interchangeable representations of a vector of Fr elements:

  * host: numpy object arrays of canonical Python ints (mod r). Zero
    compile cost, ~1M ops/s — right for the small/medium polynomial sizes
    that dominate per-node sumchecks on host orchestration.
  * device: (n, 16) uint32 Montgomery limb arrays via field.jaxfr — the
    TPU path for large batches (bench / big models), jit-compiled.

This module exposes the *host* representation as the canonical vector type
used by the protocol layers (FrVec), with conversion hooks to/from the limb
representation so hot kernels can be offloaded. It plays the role of the
dtype dispatch in the reference's MultilinearPolynomial enum
(joltworks/src/poly/multilinear_polynomial.rs:22-35).
"""

from __future__ import annotations

import numpy as np

from .constants import FR_MODULUS
from .scalar import Fr

R = FR_MODULUS


def from_ints(xs) -> np.ndarray:
    """Any int iterable / numpy int array -> object array of canonical ints."""
    a = np.asarray(xs)
    if a.dtype == object:
        return np.array([int(x) % R for x in a.ravel()], dtype=object).reshape(a.shape)
    # fast path: numpy ints (can be negative)
    out = np.empty(a.shape, dtype=object)
    flat_in = a.ravel()
    flat_out = out.ravel()
    for i in range(flat_in.size):
        flat_out[i] = int(flat_in[i]) % R
    return out


def from_fr(elems) -> np.ndarray:
    return np.array([e.v for e in elems], dtype=object)


def to_fr(arr) -> list[Fr]:
    return [Fr(int(x)) for x in np.asarray(arr).ravel()]


def zeros(n: int) -> np.ndarray:
    return np.zeros(n, dtype=object)


def ones(n: int) -> np.ndarray:
    return np.ones(n, dtype=object)


def vadd(a, b):
    return (a + b) % R


def vsub(a, b):
    return (a - b) % R


def vmul(a, b):
    return (a * b) % R


def vscale(a, s: Fr):
    return (a * s.v) % R


def vsum(a) -> Fr:
    return Fr(int(np.sum(a)) % R)


def vdot(a, b) -> Fr:
    return Fr(int(np.sum((a * b) % R)) % R)


def vinv(a) -> np.ndarray:
    """Batch inversion (Montgomery's trick) on an object array."""
    flat = [int(x) for x in np.asarray(a).ravel()]
    n = len(flat)
    prefix = [0] * n
    acc = 1
    for i, x in enumerate(flat):
        if x == 0:
            raise ZeroDivisionError("vinv: zero element")
        prefix[i] = acc
        acc = acc * x % R
    inv = pow(acc, -1, R)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = inv * prefix[i] % R
        inv = inv * flat[i] % R
    res = np.array(out, dtype=object)
    return res.reshape(np.asarray(a).shape)
