"""TPU Pippenger MSM: bucket-grid accumulation + bit-plane bucket combine.

Plays the role of the reference's CPU Pippenger (joltworks/src/msm/mod.rs:
20-333) for large full-width-scalar MSMs (HyperKZG fold commitments and
witness openings), redesigned for a SIMD machine:

- Scalars are cut into c-bit windows on the host (vectorized numpy limb
  shifts) and each (window, bucket) pair becomes a *lane*. The host builds
  a [lanes, depth] gather grid assigning every nonzero digit occurrence a
  slot in its bucket's lane; depth = max bucket occupancy.
- The device accumulates the grid in fixed-size row blocks with one
  complete projective add per step under `lax.fori_loop` — every lane runs
  the identical branch-free RCB15 formula (tpu/curveops.py), so bucket
  conflicts cannot exist by construction (a lane IS a bucket) and padding
  slots add the identity. Fixed block shapes mean exactly two kernels
  compile per SRS regardless of MSM count or size (the remote-compile
  relay takes ~2 min per shape; see tpu/__init__ persistent cache).
- Bucket-weighted reduction sum_b b*S_b avoids the reference's sequential
  running-sum (2^c dependent adds) entirely: write b in binary, reduce the
  bit-masked bucket planes with a two-level lane reduction, then a c-step
  Horner of doublings — O(c + sqrt B) batched steps instead of O(2^c)
  sequential ones. The combine runs once per *batch*, lanes stacked, so
  its fixed cost amortizes over all MSMs in flight.

Work is enqueued asynchronously (dispatch returns futures); callers can
overlap host compute with device accumulation via start()/finish().
"""

from __future__ import annotations

import functools

import numpy as np

from ..field.constants import FQ_MODULUS

class _GridSkewError(RuntimeError):
    """Raised when a digit grid would be pathologically deep (low-entropy
    window); callers fall back to the host Pippenger."""

    def __init__(self, depth: int, lanes: int):
        super().__init__(f"grid depth {depth} over {lanes} lanes")


# route to device only when the add-count amortizes dispatch + transfer
_DEVICE_MIN_N = 1 << 15
_WINDOW_C = 12
_BLK = 32          # grid rows per accumulation call (fixed shape)
_NBITS = 254

_STATE = None  # lazy (jax, curveops) tuple or False if unusable


def _state():
    global _STATE
    if _STATE is None:
        try:
            import jax
            from . import curveops
            jax.devices()  # force backend init; raises if none
            _STATE = (jax, curveops)
        except Exception:
            _STATE = False
    return _STATE


def available() -> bool:
    return bool(_state())


# ---------------------------------------------------------------------------
# host-side digit grid construction
# ---------------------------------------------------------------------------

def _digits(scalars_u64: np.ndarray, c: int) -> np.ndarray:
    """(n, 4) LE u64 limbs -> (W, n) int32 c-bit windows of the 254-bit value."""
    n = scalars_u64.shape[0]
    W = (_NBITS + c - 1) // c
    out = np.empty((W, n), dtype=np.int32)
    for w in range(W):
        bit = w * c
        limb, off = divmod(bit, 64)
        v = scalars_u64[:, limb] >> np.uint64(off)
        if off + c > 64 and limb + 1 < 4:
            v = v | (scalars_u64[:, limb + 1] << np.uint64(64 - off))
        out[w] = (v & np.uint64((1 << c) - 1)).astype(np.int32)
    return out


def _grid(digits: np.ndarray, c: int) -> np.ndarray:
    """(W, n) digits -> [M, W * B] int32 point-index grid (row blocks).

    Lane w*B+b accumulates the points whose window-w digit equals b.
    Digit 0 contributes nothing and is dropped. Empty slots are -1.
    M is padded up to a multiple of _BLK.
    """
    W, n = digits.shape
    B = 1 << c
    lane = (np.arange(W, dtype=np.int64)[:, None] * B + digits).ravel()
    pt = np.broadcast_to(np.arange(n, dtype=np.int64), (W, n)).ravel()
    keep = (digits.ravel() != 0)
    lane, pt = lane[keep], pt[keep]
    order = np.argsort(lane, kind="stable")  # radix sort on ints
    lane, pt = lane[order], pt[order]
    counts = np.bincount(lane, minlength=W * B)
    M = int(counts.max()) if len(lane) else 0
    avg = max(1, len(lane) // (W * B))
    if M > max(64, 16 * avg):
        # top-window skew: full-width scalars leave the last window only
        # maxbits - (W-1)*c bits of entropy, so one bucket can swallow
        # ~n/2 points and the dense grid explodes (observed 11.8 GB at
        # 2^16 254-bit scalars). The host engine handles this case with a
        # dense per-digit path (csrc/msm.cpp); here we refuse and let the
        # caller fall back to it.
        raise _GridSkewError(M, W * B)
    M = max(_BLK, -(-M // _BLK) * _BLK)
    offsets = np.zeros(W * B, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    slot = np.arange(len(lane), dtype=np.int64) - offsets[lane]
    grid = np.full((M, W * B), -1, dtype=np.int32)
    grid[slot, lane] = pt.astype(np.int32)
    return grid


# ---------------------------------------------------------------------------
# device kernels (two fixed shapes per SRS)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _accum_kernel(c: int, W: int):
    """(X, Y, Z bases, acc 3x(16,L), grid (BLK, L)) -> new acc."""
    jax, curveops = _state()
    jnp = jax.numpy
    mont_one = np.zeros(16, dtype=np.uint32)
    for i, l in enumerate(curveops.FQ.mont_one_limbs):
        mont_one[i] = l

    def run(X, Y, Z, AX, AY, AZ, grid):
        one_col = jnp.asarray(mont_one)[:, None]

        def body(m, acc):
            idx = jax.lax.dynamic_index_in_dim(grid, m, keepdims=False)
            valid = idx >= 0
            ic = jnp.maximum(idx, 0)
            Pg = (jnp.where(valid, X[:, ic], 0),
                  jnp.where(valid, Y[:, ic], one_col),
                  jnp.where(valid, Z[:, ic], 0))
            return curveops.pp_add(acc, Pg)

        return jax.lax.fori_loop(0, grid.shape[0], body, (AX, AY, AZ))

    return jax.jit(run)


def _reduce_axis1(jax, curveops, P):
    """Sum planes tuple P (16, R, ...) over axis 1 with an R-1-step
    `fori_loop` of full-width adds. Axis 1 slices are contiguous blocks
    (fast layout); static shapes throughout — large one-shot tree graphs
    wedge this environment's compile relay, and minor-axis dynamic slices
    compile pathologically."""
    R = P[0].shape[1]
    if R == 1:
        return tuple(p[:, 0] for p in P)

    def body(j, acc):
        nxt = tuple(jax.lax.dynamic_index_in_dim(p, j, axis=1,
                                                 keepdims=False) for p in P)
        return curveops.pp_add(acc, nxt)

    acc = tuple(p[:, 0] for p in P)
    return jax.lax.fori_loop(1, R, body, acc)


@functools.lru_cache(maxsize=None)
def _combine_kernel(c: int, W: int, k: int):
    """acc 3x(16, k, L) bucket sums -> 3x(16, k, W) window sums.

    sum_b b*S_b with b = h*Gl + l splits into
        Gl * sum_h h*U_h + sum_l l*V_l,
    U_h = sum_l S_{h,l}, V_l = sum_h S_{h,l}: two plain reductions plus
    two small running-sum weighted reductions — O(sqrt B) tiny batched
    steps instead of O(B) sequential adds, with every loop-carried tensor
    at most (16, k, W, sqrt B)."""
    jax, curveops = _state()
    jnp = jax.numpy
    B = 1 << c
    ch = c // 2
    Gh, Gl = 1 << (c - ch), 1 << ch
    mont_one = np.zeros(16, dtype=np.uint32)
    for i, l in enumerate(curveops.FQ.mont_one_limbs):
        mont_one[i] = l

    def ident_like(shape_tail):
        n = 1
        for d in shape_tail[1:]:
            n *= d
        ident = curveops.pp_identity(n)
        return tuple(p.reshape(shape_tail) for p in ident)

    def weighted(P):
        # P (16, R, k, W): sum_b b * P[:, b] by running suffix sums
        R = P[0].shape[1]
        zero = ident_like((16,) + P[0].shape[2:])

        def body(j, st):
            S, T = st
            nxt = tuple(jax.lax.dynamic_index_in_dim(p, R - 1 - j, axis=1,
                                                     keepdims=False)
                        for p in P)
            T = curveops.pp_add(T, nxt)
            S = curveops.pp_add(S, T)
            return (S, T)

        S, _ = jax.lax.fori_loop(0, R - 1, body, (zero, zero))
        return S

    def run(AX, AY, AZ):
        # (16, k, L) -> (16, k, W, Gh, Gl) -> put the reduce axis at pos 1
        S = tuple(p.reshape(16, k, W, Gh, Gl) for p in (AX, AY, AZ))
        Sl = tuple(jnp.moveaxis(p, 4, 1) for p in S)   # (16, Gl, k, W, Gh)
        U = _reduce_axis1(jax, curveops, Sl)           # (16, k, W, Gh)
        Sh = tuple(jnp.moveaxis(p, 3, 1) for p in S)   # (16, Gh, k, W, Gl)
        V = _reduce_axis1(jax, curveops, Sh)           # (16, k, W, Gl)

        Wh = weighted(tuple(jnp.moveaxis(p, 3, 1) for p in U))  # (16, k, W)
        Wl = weighted(tuple(jnp.moveaxis(p, 3, 1) for p in V))  # (16, k, W)

        # result = Gl * Wh + Wl  (Gl is a power of two: ch doublings)
        def dbl(i, Q):
            return curveops.pp_add(Q, Q)

        Wh = jax.lax.fori_loop(0, ch, dbl, Wh)
        return curveops.pp_add(Wh, Wl)

    return jax.jit(run)


def _pow2_pad(x: int) -> int:
    return 1 << max(x - 1, 1).bit_length()


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

class DeviceBases:
    """Planes-form cache of MSM bases on the accelerator.

    Built from the C engine's prepared buffer (csrc/msm.cpp msm_prep_points:
    interleaved Montgomery affine x,y u64x4; x=y=0 encodes infinity), so the
    Montgomery conversion is never repeated. The full base set stays device-
    resident; prefix MSMs reference it by index, keeping kernel shapes
    independent of the scalar count.
    """

    def __init__(self, prep_raw: bytes, n: int):
        jax, curveops = _state()
        jnp = jax.numpy
        FQ = curveops.FQ
        limbs = np.frombuffer(prep_raw, dtype=np.uint64,
                              count=n * 8).reshape(n, 8)
        x, y = limbs[:, :4], limbs[:, 4:]
        inf = ((x == 0).all(axis=1) & (y == 0).all(axis=1))
        X = FQ.limbs_to_planes_u64(np.ascontiguousarray(x))
        Y = FQ.limbs_to_planes_u64(np.ascontiguousarray(y))
        Z = np.zeros_like(X)
        one = np.array(FQ.mont_one_limbs, dtype=np.uint32)
        Z[:, ~inf] = one[:, None]
        Y[:, inf] = one[:, None]
        self.n = n
        self.X = jax.device_put(jnp.asarray(X))
        self.Y = jax.device_put(jnp.asarray(Y))
        self.Z = jax.device_put(jnp.asarray(Z))

    # -- async batch -------------------------------------------------------
    def start(self, packed: list[bytes], counts: list[int],
              c: int = _WINDOW_C):
        """Enqueue a batch of MSMs (canonical 32-byte-LE scalars against
        base prefixes). Device work proceeds asynchronously; pair with
        `finish()`. Returns an opaque handle."""
        from . import telemetry
        jax, curveops = _state()
        jnp = jax.numpy
        W = (_NBITS + c - 1) // c
        accum = _accum_kernel(c, W)
        accs = []
        for raw, count in zip(packed, counts):
            sc = np.frombuffer(raw, dtype=np.uint64,
                               count=count * 4).reshape(count, 4)
            grid = _grid(_digits(sc, c), c)
            acc = curveops.pp_identity(W << c)
            for m0 in range(0, grid.shape[0], _BLK):
                blk = jnp.asarray(grid[m0:m0 + _BLK])
                acc = accum(self.X, self.Y, self.Z, *acc, blk)
                telemetry.count("msm")
            accs.append(acc)
        # stack lanes and run one batched combine (pad batch to pow2)
        k = len(accs)
        kp = _pow2_pad(k)
        while len(accs) < kp:
            accs.append(curveops.pp_identity(W << c))
        stacked = tuple(jnp.stack([a[i] for a in accs], axis=1)
                        for i in range(3))
        R = _combine_kernel(c, W, kp)(*stacked)
        telemetry.count("msm")
        return (R, k, c)

    def finish(self, handle) -> list:
        """Collect a `start()` batch: list of affine G1 (host)."""
        _, curveops = _state()
        R, k, c = handle
        host = tuple(np.asarray(p) for p in R)  # blocks on device work
        out = []
        for i in range(k):
            cols = tuple(p[:, i, :] for p in host)
            out.append(_combine_windows(curveops, cols, c))
        return out

    def msm_batch_packed(self, packed: list[bytes], counts: list[int],
                         c: int = _WINDOW_C) -> list:
        return self.finish(self.start(packed, counts, c))

    def msm_packed(self, scalar_bytes: bytes, count: int,
                   c: int = _WINDOW_C):
        return self.msm_batch_packed([scalar_bytes], [count], c)[0]


def _combine_windows(curveops, R_planes, c: int):
    """Host (16, W) window sums -> affine G1 via Horner doubling."""
    pts = curveops.planes_to_points(R_planes)
    from ..curve.points import (jacobian_add_affine, jacobian_double,
                                jacobian_to_affine, JINF)

    total = JINF
    for p in reversed(pts):
        for _ in range(c):
            total = jacobian_double(total)
        total = jacobian_add_affine(total, p)
    return jacobian_to_affine(total)
