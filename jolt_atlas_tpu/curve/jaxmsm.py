"""Vectorized multi-scalar multiplication on device (JAX / TPU).

The MSM hot path (reference msm/mod.rs + BASELINE "MSM points/s/chip"):
Pippenger with padded per-bucket point lists and a branchless vectorized
Jacobian tree reduction. All curve arithmetic runs as 16-bit-limb Fq
Montgomery kernels (field/jaxmod.py) that XLA fuses for the VPU; per level
of the reduction tree one jacobian-add is applied across every
(window, bucket, pair) lane simultaneously.

Pipeline:
  1. host: scalar -> c-bit window digits; for each (window, bucket) gather
     the point indices, pad each bucket to the max occupancy L (power of 2)
     with the identity (Z = 0).
  2. device: tree-reduce the L axis with branchless complete jacobian adds
     (log2 L levels), leaving one Jacobian accumulator per bucket.
  3. host: running-sum bucket reduction + window recombination (tiny).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field.constants import FQ_MODULUS, FR_MODULUS
from ..field.jaxmod import ModCtx, NLIMB
from .points import G1, jacobian_add, jacobian_to_affine, JINF

FQ = ModCtx(FQ_MODULUS)


# ---------------------------------------------------------------------------
# branchless Jacobian point addition over limb arrays
# ---------------------------------------------------------------------------

# The Jacobian add/double formulas as an SSA program executed by a lax.scan
# interpreter: the compiled graph contains ONE field mul/add/sub regardless
# of instruction count, keeping XLA compile time flat while the scan replays
# ~50 register ops per point-add.
#
# registers: 0:X1 1:Y1 2:Z1 3:X2 4:Y2 5:Z2 6..23 temps (see names below)
_MUL, _ADD, _SUB = 0, 1, 2


def _jac_program():
    P = []

    def ins(op, dst, a, b):
        P.append((op, dst, a, b))

    # --- addition path (add-2007-bl) ---
    ins(_MUL, 6, 2, 2)      # Z1Z1
    ins(_MUL, 7, 5, 5)      # Z2Z2
    ins(_MUL, 8, 0, 7)      # U1
    ins(_MUL, 9, 3, 6)      # U2
    ins(_MUL, 10, 1, 5)
    ins(_MUL, 10, 10, 7)    # S1
    ins(_MUL, 11, 4, 2)
    ins(_MUL, 11, 11, 6)    # S2
    ins(_SUB, 12, 9, 8)     # H
    ins(_SUB, 13, 11, 10)   # S2-S1
    ins(_ADD, 14, 13, 13)   # r = 2(S2-S1)
    ins(_ADD, 15, 12, 12)
    ins(_MUL, 15, 15, 15)   # I = (2H)^2
    ins(_MUL, 16, 12, 15)   # J = H*I
    ins(_MUL, 17, 8, 15)    # V = U1*I
    ins(_MUL, 18, 14, 14)   # r^2
    ins(_SUB, 18, 18, 16)
    ins(_ADD, 19, 17, 17)
    ins(_SUB, 18, 18, 19)   # X3
    ins(_SUB, 19, 17, 18)
    ins(_MUL, 19, 14, 19)
    ins(_MUL, 20, 10, 16)
    ins(_ADD, 20, 20, 20)
    ins(_SUB, 19, 19, 20)   # Y3
    ins(_ADD, 20, 2, 5)
    ins(_MUL, 20, 20, 20)
    ins(_SUB, 20, 20, 6)
    ins(_SUB, 20, 20, 7)
    ins(_MUL, 20, 20, 12)   # Z3
    # --- doubling path (dbl-2009-l on P1) ---
    ins(_MUL, 21, 0, 0)     # A
    ins(_MUL, 22, 1, 1)     # B
    ins(_MUL, 23, 22, 22)   # C
    ins(_ADD, 24, 0, 22)
    ins(_MUL, 24, 24, 24)
    ins(_SUB, 24, 24, 21)
    ins(_SUB, 24, 24, 23)
    ins(_ADD, 24, 24, 24)   # D
    ins(_ADD, 25, 21, 21)
    ins(_ADD, 25, 25, 21)   # E
    ins(_MUL, 26, 25, 25)   # F
    ins(_SUB, 26, 26, 24)
    ins(_SUB, 26, 26, 24)   # Xd
    ins(_SUB, 27, 24, 26)
    ins(_MUL, 27, 25, 27)
    ins(_ADD, 28, 23, 23)
    ins(_ADD, 28, 28, 28)
    ins(_ADD, 28, 28, 28)   # 8C
    ins(_SUB, 27, 27, 28)   # Yd
    ins(_MUL, 28, 1, 2)
    ins(_ADD, 28, 28, 28)   # Zd
    return np.array(P, dtype=np.int32)


_PROGRAM = _jac_program()
_NREGS = 29


def _jac_add_batch(X1, Y1, Z1, X2, Y2, Z2):
    """Branchless vectorized Jacobian add (handles inf, P+P, P-P)."""
    lanes = X1.shape[0]
    regs = jnp.zeros((_NREGS, lanes, NLIMB), dtype=jnp.uint32)
    for i, v in enumerate((X1, Y1, Z1, X2, Y2, Z2)):
        regs = regs.at[i].set(v)

    def step(regs, instr):
        op, dst, a, b = instr[0], instr[1], instr[2], instr[3]
        va = regs[a]
        vb = regs[b]
        out = jax.lax.switch(op, [FQ.mul, FQ.add, FQ.sub], va, vb)
        return regs.at[dst].set(out), None

    regs, _ = jax.lax.scan(step, regs, jnp.asarray(_PROGRAM))
    X3, Y3, Z3 = regs[18], regs[19], regs[20]
    Xd, Yd, Zd = regs[26], regs[27], regs[28]
    H, S21 = regs[12], regs[13]

    inf1 = FQ.is_zero(Z1)[..., None]
    inf2 = FQ.is_zero(Z2)[..., None]
    h_zero = FQ.is_zero(H)
    s_eq = FQ.is_zero(S21)
    dbl = (h_zero & s_eq)[..., None]
    cancel = (h_zero & ~s_eq)[..., None]

    X3 = jnp.where(dbl, Xd, X3)
    Y3 = jnp.where(dbl, Yd, Y3)
    Z3 = jnp.where(dbl, Zd, Z3)
    Z3 = jnp.where(cancel, jnp.zeros_like(Z3), Z3)
    X3 = jnp.where(inf1, X2, jnp.where(inf2, X1, X3))
    Y3 = jnp.where(inf1, Y2, jnp.where(inf2, Y1, Y3))
    Z3 = jnp.where(inf1, Z2, jnp.where(inf2, Z1, Z3))
    return X3, Y3, Z3


LANES = 2048  # fixed kernel width


@jax.jit
def _msm_schedule_run(SX, SY, SZ, IA, IB, ST, FLIP):
    """Run an entire MSM reduction schedule in one dispatch.

    IA/IB: (M, LANES) gather indices; ST: (M,) output offsets; FLIP: (M,)
    1 where the chunk is the last of its level (swap read/write buffers).
    Ping-pong state buffers avoid read-write hazards within a level.
    """
    state = (SX, SY, SZ, jnp.zeros_like(SX), jnp.zeros_like(SY),
             jnp.zeros_like(SZ))

    def step(state, sched):
        ia, ib, start, flip = sched
        SXi, SYi, SZi, SXo, SYo, SZo = state
        X3, Y3, Z3 = _jac_add_inline(SXi[ia], SYi[ia], SZi[ia],
                                     SXi[ib], SYi[ib], SZi[ib])
        SXo = jax.lax.dynamic_update_slice(SXo, X3, (start, 0))
        SYo = jax.lax.dynamic_update_slice(SYo, Y3, (start, 0))
        SZo = jax.lax.dynamic_update_slice(SZo, Z3, (start, 0))
        do_flip = flip == 1

        def pick(a, b):
            return jnp.where(do_flip, a, b)

        new_state = (pick(SXo, SXi), pick(SYo, SYi), pick(SZo, SZi),
                     pick(SXi, SXo), pick(SYi, SYo), pick(SZi, SZo))
        return new_state, None

    state, _ = jax.lax.scan(step, state, (IA, IB, ST, FLIP))
    return state[0], state[1], state[2]


class DeviceBases:
    """SRS points pre-converted to device limb arrays (cache once)."""

    def __init__(self, points: list[G1]):
        n = len(points)
        self.n = n
        self.X = np.asarray(FQ.to_limbs([p.x for p in points]))
        self.Y = np.asarray(FQ.to_limbs([p.y for p in points]))
        self.inf = np.array([p.infinity for p in points], dtype=bool)


def msm_device(bases: DeviceBases, scalars, c: int = 8) -> G1:
    """Pippenger MSM: host builds the full reduction schedule (bucket tree +
    suffix-scan + per-window tree), device executes it in one dispatch."""
    sc = [int(s) % FR_MODULUS for s in scalars]
    n = min(len(sc), bases.n)
    nz = [(i, s) for i, s in enumerate(sc[:n]) if s and not bases.inf[i]]
    if not nz:
        return G1.identity()
    bits = max(s.bit_length() for _, s in nz)
    num_windows = (bits + c - 1) // c
    nbuckets = 1 << c

    assignments = [[[] for _ in range(nbuckets)] for _ in range(num_windows)]
    for i, s in nz:
        for w in range(num_windows):
            digit = (s >> (w * c)) & (nbuckets - 1)
            if digit:
                assignments[w][digit].append(i)
    L = max(1, max(len(b) for w in assignments for b in w))
    L = 1 << (L - 1).bit_length()

    WB = num_windows * nbuckets
    total_slots = WB * L
    N = 1 << (total_slots + 1 - 1).bit_length()
    inf_lane = N - 1
    SX = np.zeros((N, 16), dtype=np.uint32)
    SY = np.zeros((N, 16), dtype=np.uint32)
    SZ = np.zeros((N, 16), dtype=np.uint32)
    mont1 = np.asarray(FQ.mont_one)
    for w in range(num_windows):
        for b in range(nbuckets):
            base_slot = (w * nbuckets + b) * L
            for t, pi in enumerate(assignments[w][b]):
                SX[base_slot + t] = bases.X[pi]
                SY[base_slot + t] = bases.Y[pi]
                SZ[base_slot + t] = mont1

    # ---- build the full schedule on host ----
    sched_ia, sched_ib, sched_st, sched_fl = [], [], [], []

    def emit_level(pairs_a, pairs_b):
        nlv = len(pairs_a)
        for off in range(0, nlv, LANES):
            m = min(LANES, nlv - off)
            ia = np.full(LANES, inf_lane, dtype=np.int32)
            ib = np.full(LANES, inf_lane, dtype=np.int32)
            ia[:m] = pairs_a[off:off + m]
            ib[:m] = pairs_b[off:off + m]
            sched_ia.append(ia)
            sched_ib.append(ib)
            sched_st.append(off)
            sched_fl.append(0)
        sched_fl[-1] = 1  # level boundary: swap buffers

    # phase 1: tree-reduce the per-bucket lists (stride L)
    stride = L
    while stride > 1:
        half = stride // 2
        pa, pb = [], []
        for g in range(WB):
            base_in = g * stride
            for t in range(half):
                pa.append(base_in + 2 * t)
                pb.append(base_in + 2 * t + 1)
        emit_level(pa, pb)
        stride = half
    # bucket (w, b) value now at index w*nbuckets + b

    # phase 2: suffix-sum over buckets (Hillis-Steele)
    width = nbuckets
    shift = 1
    while shift < width:
        pa, pb = [], []
        for w in range(num_windows):
            for b in range(width):
                pa.append(w * nbuckets + b)
                src = b + shift
                pb.append(w * nbuckets + src if src < width else inf_lane)
        emit_level(pa, pb)
        shift *= 2

    # phase 3: per-window tree reduce of running[1..width)
    current = {w: [w * nbuckets + b for b in range(1, width)]
               for w in range(num_windows)}
    while any(len(v) > 1 for v in current.values()):
        pa, pb = [], []
        nxt = {w: [] for w in range(num_windows)}
        out_pos = 0
        for w in range(num_windows):
            lv = current[w]
            for t in range(0, len(lv) - 1, 2):
                pa.append(lv[t])
                pb.append(lv[t + 1])
                nxt[w].append(out_pos)
                out_pos += 1
            if len(lv) % 2:
                pa.append(lv[-1])
                pb.append(inf_lane)
                nxt[w].append(out_pos)
                out_pos += 1
        emit_level(pa, pb)
        current = nxt

    IA = jnp.asarray(np.stack(sched_ia))
    IB = jnp.asarray(np.stack(sched_ib))
    ST = jnp.asarray(np.array(sched_st, dtype=np.int32))
    FLIP = jnp.asarray(np.array(sched_fl, dtype=np.int32))
    RX, RY, RZ = _msm_schedule_run(jnp.asarray(SX), jnp.asarray(SY),
                                   jnp.asarray(SZ), IA, IB, ST, FLIP)

    finals = [current[w][0] for w in range(num_windows)]
    SXh, SYh, SZh = np.asarray(RX), np.asarray(RY), np.asarray(RZ)
    xs = FQ.from_limbs(SXh[finals])
    ys = FQ.from_limbs(SYh[finals])
    zs = FQ.from_limbs(SZh[finals])
    from .points import jacobian_double
    total = JINF
    for w in range(num_windows - 1, -1, -1):
        if w != num_windows - 1:
            for _ in range(c):
                total = jacobian_double(total)
        p = (xs[w], ys[w], zs[w]) if zs[w] != 0 else JINF
        total = jacobian_add(total, p)
    return jacobian_to_affine(total)


def _jac_add_inline(X1, Y1, Z1, X2, Y2, Z2):
    f = FQ
    Z1Z1 = f.mul(Z1, Z1)
    Z2Z2 = f.mul(Z2, Z2)
    U1 = f.mul(X1, Z2Z2)
    U2 = f.mul(X2, Z1Z1)
    S1 = f.mul(f.mul(Y1, Z2), Z2Z2)
    S2 = f.mul(f.mul(Y2, Z1), Z1Z1)
    H = f.sub(U2, U1)
    S21 = f.sub(S2, S1)
    r = f.add(S21, S21)
    HH = f.add(H, H)
    I = f.mul(HH, HH)
    J = f.mul(H, I)
    V = f.mul(U1, I)
    X3 = f.sub(f.sub(f.mul(r, r), J), f.add(V, V))
    S1J = f.mul(S1, J)
    Y3 = f.sub(f.mul(r, f.sub(V, X3)), f.add(S1J, S1J))
    ZZ = f.add(Z1, Z2)
    Z3 = f.mul(f.sub(f.sub(f.mul(ZZ, ZZ), Z1Z1), Z2Z2), H)
    A = f.mul(X1, X1)
    B = f.mul(Y1, Y1)
    C = f.mul(B, B)
    XB = f.add(X1, B)
    D = f.sub(f.sub(f.mul(XB, XB), A), C)
    D = f.add(D, D)
    E = f.add(f.add(A, A), A)
    Xd = f.sub(f.mul(E, E), f.add(D, D))
    C4 = f.add(f.add(C, C), f.add(C, C))
    C8 = f.add(C4, C4)
    Yd = f.sub(f.mul(E, f.sub(D, Xd)), C8)
    YZ = f.mul(Y1, Z1)
    Zd = f.add(YZ, YZ)
    inf1 = f.is_zero(Z1)[..., None]
    inf2 = f.is_zero(Z2)[..., None]
    h_zero = f.is_zero(H)
    s_eq = f.is_zero(S21)
    dbl = (h_zero & s_eq)[..., None]
    cancel = (h_zero & ~s_eq)[..., None]
    X3 = jnp.where(dbl, Xd, X3)
    Y3 = jnp.where(dbl, Yd, Y3)
    Z3 = jnp.where(dbl, Zd, Z3)
    Z3 = jnp.where(cancel, jnp.zeros_like(Z3), Z3)
    X3 = jnp.where(inf1, X2, jnp.where(inf2, X1, X3))
    Y3 = jnp.where(inf1, Y2, jnp.where(inf2, Y1, Y3))
    Z3 = jnp.where(inf1, Z2, jnp.where(inf2, Z1, Z3))
    return X3, Y3, Z3


@jax.jit
def _gather_add_chunk_inline(SXi, SYi, SZi, SXo, SYo, SZo, ia, ib, start):
    X3, Y3, Z3 = _jac_add_inline(SXi[ia], SYi[ia], SZi[ia],
                                 SXi[ib], SYi[ib], SZi[ib])
    SXo = jax.lax.dynamic_update_slice(SXo, X3, (start, 0))
    SYo = jax.lax.dynamic_update_slice(SYo, Y3, (start, 0))
    SZo = jax.lax.dynamic_update_slice(SZo, Z3, (start, 0))
    return SXo, SYo, SZo


