"""Batched TPU execution of the opening-reduction sumcheck instances.

The batch opening reduction (poly/opening.py) runs ~140 single-row
degree-2 Gruen instances — one per distinct opening point — totalling
tens of millions of field elements; round evals + binds over them are the
single largest IOP cost block on the host. They are also embarrassingly
batchable: instances whose polynomials share a length run in lockstep
(same local round, same table shapes), so the fleet stacks each size
class into one (16, G, n) limb-planes array on the accelerator and runs
TWO kernel calls per round per class:

  q0:   q(0) = sum_j whi[j >> s] * wlo[j & m] * lo_j   -> (16, G) scalars
  bind: row'_j = lo_j + r * (hi_j - lo_j)              -> (16, G, n/2)

(The Gruen round message for a degree-2 instance needs only q(0); the
caller reconstructs q(1) from the running claim — sumcheck.py
`_gruen_message`.) Mirrors the role of frvec.GruenInstance for P=1 rows
(reference joltworks/src/subprotocols/opening_reduction.rs +
split_eq_poly.rs:67), redesigned as stacked SIMD lanes.

Montgomery throughout: rows arrive as FrArray (n, 4)-u64 Montgomery
limbs, eq tables from frvec.eq_expand are Montgomery, and mont_mul keeps
the representation closed; scalars leave the device only as 64-byte
plane columns.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..field.constants import FR_MODULUS
from ..field.scalar import Fr

# fleet-eligible instance size: n >= 2^_MIN_ROUNDS; below _HANDOFF entries
# the tail rounds go back to C++ (env knobs exist for small-scale testing)
_MIN_ROUNDS = int(os.environ.get("JOLT_ATLAS_FLEET_MIN_ROUNDS", "12"))
_HANDOFF = 1 << int(os.environ.get("JOLT_ATLAS_FLEET_HANDOFF_LOG2", "11"))
_STATE = None


def _state():
    global _STATE
    if _STATE is None:
        try:
            import jax
            from .fqplanes import PlanesCtx
            jax.devices()
            _STATE = (jax, PlanesCtx(FR_MODULUS))
        except Exception:
            _STATE = False
    return _STATE


def available() -> bool:
    return bool(_state())


def _u64_to_planes(a: np.ndarray) -> np.ndarray:
    """(..., 4) u64 LE limbs -> (16, ...) u32 16-bit planes."""
    lead = a.shape[:-1]
    out = np.empty((16,) + lead, dtype=np.uint32)
    for w in range(4):
        col = a[..., w]
        for s in range(4):
            out[4 * w + s] = ((col >> np.uint64(16 * s))
                              & np.uint64(0xFFFF)).astype(np.uint32)
    return out


def _planes_to_u64(p: np.ndarray) -> np.ndarray:
    """(16, ...) u32 planes -> (..., 4) u64 LE limbs."""
    lead = p.shape[1:]
    out = np.zeros(lead + (4,), dtype=np.uint64)
    for w in range(4):
        for s in range(4):
            out[..., w] |= p[4 * w + s].astype(np.uint64) << np.uint64(16 * s)
    return out


@functools.lru_cache(maxsize=None)
def _q0_kernel(G: int, Hn: int, Ln: int):
    """(rows (16,G,n), whi (16,G,Hn), wlo (16,G,Ln)) -> q(0) (16,G)."""
    jax, FR = _state()
    jnp = jax.numpy

    def run(rows, whi, wlo):
        half = rows.shape[2] // 2
        lo = rows[:, :, :half].reshape(16, G, Hn, Ln)
        t = FR.mul(lo, wlo[:, :, None, :])
        # reduce over Ln then Hn by halving trees of field adds
        while t.shape[-1] > 1:
            k = t.shape[-1] // 2
            t = FR.add(t[..., :k], t[..., k:])
        t = FR.mul(t[..., 0], whi)
        while t.shape[-1] > 1:
            k = t.shape[-1] // 2
            t = FR.add(t[..., :k], t[..., k:])
        return t[..., 0]

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _bind_kernel(G: int, half: int):
    """(rows (16,G,2*half), r (16,1,1)) -> (16,G,half) lo + r (hi - lo)."""
    jax, FR = _state()

    def run(rows, r):
        lo = rows[:, :, :half]
        hi = rows[:, :, half:]
        return FR.add(lo, FR.mul(FR.sub(hi, lo), r))

    return jax.jit(run)


class _Class:
    """One stack of same-length fleet members (padded to pow2 lanes so
    kernel shapes do not depend on the model's group count)."""

    def __init__(self, n: int, gp: int):
        self.n = n
        self.gp = gp                 # padded lane count (pow2)
        self.members: list = []      # SplitEq refs, in slot order
        self.rows = None             # device (16, gp, n) planes
        self.round = 0               # local round index
        self.q0_round = -1
        self.q0_cache = None         # np (16, gp) planes of this round's q(0)
        self.host_rows = None        # after handoff: list of (n,4) u64


class GroupFleet:
    """Coordinates the per-class device kernels. Build via try_build()."""

    def __init__(self):
        self.classes: dict[int, _Class] = {}

    # -- construction ------------------------------------------------------
    @staticmethod
    def try_build(instances) -> "GroupFleet | None":
        """Upload eligible instances' RLC rows; attach fleet adapters.

        `instances` are _GroupReductionProver objects with `rlc_fvec`
        (FrArray) and `point` set, before setup_rows. Returns None when no
        device is usable or nothing is large enough."""
        import os
        from ..field.frvec import FrArray
        # Default OFF: this v1 fleet syncs q(0) back to the host every round,
        # and the axon relay charges ~0.6 s per device->host fetch — measured
        # 15x slower than the host C++ path on small models. Kept as the
        # stepping stone for the fully device-resident reduction
        # (tpu/reduction.py), which batches all rounds into one async chain.
        mode = os.environ.get("JOLT_ATLAS_FLEET", "off")
        if mode != "on" or not _state():
            return None
        eligible = [inst for inst in instances
                    if isinstance(inst.rlc_fvec, FrArray)
                    and len(inst.point) >= _MIN_ROUNDS]
        if not eligible:
            return None
        fleet = GroupFleet()
        jax, _FR = _state()
        jnp = jax.numpy
        by_n: dict[int, list] = {}
        for inst in eligible:
            by_n.setdefault(len(inst.rlc_fvec), []).append(inst)
        for n, insts in sorted(by_n.items()):
            gp = 1 << max(len(insts) - 1, 0).bit_length() \
                if len(insts) > 1 else 1
            cls = _Class(n, gp)
            stack = np.zeros((gp, n, 4), dtype=np.uint64)
            for g, i in enumerate(insts):
                stack[g] = np.asarray(i.rlc_fvec.d).reshape(n, 4)
            planes = _u64_to_planes(stack)                # (16, gp, n)
            cls.rows = jax.device_put(jnp.asarray(planes))
            for slot, inst in enumerate(insts):
                cls.members.append(None)  # SplitEq attached in setup
                inst._fleet = fleet
                inst._fleet_class = cls
                inst._fleet_slot = slot
            fleet.classes[n] = cls
        return fleet

    # -- per-round kernels -------------------------------------------------
    def q0(self, cls: _Class, slot: int, whi, whi_shift: int, wlo,
           log_wlo: int) -> Fr:
        """Member-facing round eval; computes the whole class's q(0) batch
        on first call of each round."""
        if cls.q0_round != cls.round:
            jax, FR = _state()
            jnp = jax.numpy
            half = (cls.rows.shape[2]) // 2
            Ln = 1 << max(log_wlo, 0)
            Hn = half // Ln
            whis = np.empty((cls.gp, Hn, 4), dtype=np.uint64)
            wlos = np.empty((cls.gp, Ln, 4), dtype=np.uint64)
            one = _mont_one_limbs(FR)
            for g in range(cls.gp):
                se = cls.members[g] if g < len(cls.members) else None
                if se is None:
                    whis[g] = one
                    wlos[g] = one
                    continue
                w_hi, _s, w_lo, _l = se.tables(cls.round)
                whis[g] = one if w_hi is None else np.asarray(w_hi)
                wlos[g] = one if w_lo is None else np.asarray(w_lo)
            out = _q0_kernel(cls.gp, Hn, Ln)(
                cls.rows, jnp.asarray(_u64_to_planes(whis)),
                jnp.asarray(_u64_to_planes(wlos)))
            cls.q0_cache = np.asarray(out)
            cls.q0_round = cls.round
        FR = _state()[1]
        return Fr(FR.from_planes(cls.q0_cache[:, slot:slot + 1])[0])

    def bind(self, cls: _Class, r: Fr) -> None:
        """First member bind of a round advances the whole class. Once the
        rows shrink below the handoff size the stack comes back to the
        host and the tail rounds run on the C++ kernels (tiny rounds are
        dispatch-latency-bound on the device)."""
        jax, FR = _state()
        jnp = jax.numpy
        half = cls.rows.shape[2] // 2
        rp = jnp.asarray(FR.to_planes([r.v]).reshape(16, 1, 1))
        cls.rows = _bind_kernel(cls.gp, half)(cls.rows, rp)
        cls.round += 1
        cls.q0_cache = None
        if half <= _HANDOFF:
            cls.host_rows = _planes_to_u64(np.asarray(cls.rows))
            cls.rows = None

    def final_value(self, cls: _Class, slot: int) -> Fr:
        assert cls.rows.shape[2] == 1
        FR = _state()[1]
        col = np.asarray(cls.rows)[:, slot, :]
        return Fr(FR.from_planes(col)[0])


@functools.lru_cache(maxsize=1)
def _mont_one_limbs_cached():
    _, FR = _state()
    v = FR.R % FR.P
    return np.array([[(v >> (64 * i)) & ((1 << 64) - 1) for i in range(4)]],
                    dtype=np.uint64)


def _mont_one_limbs(FR):
    return _mont_one_limbs_cached()


class FleetMember:
    """GruenInstance-compatible adapter backed by a GroupFleet class.

    Plugs into RowsInstance._gruen: round_points/bind/row_value with the
    same signatures, so the round-message assembly (sumcheck.py
    `_gruen_message`) is shared between host and device paths and the
    proof bytes are identical either way."""

    def __init__(self, inst, se):
        self.fleet: GroupFleet = inst._fleet
        self.cls: _Class = inst._fleet_class
        self.slot: int = inst._fleet_slot
        self.cls.members[self.slot] = se
        self._bound = 0
        self._host = None  # frvec.GruenInstance for the tail rounds

    def _host_inst(self):
        if self._host is None:
            from ..field.frvec import FrArray, GruenInstance
            rows = FrArray(
                np.ascontiguousarray(self.cls.host_rows[self.slot]))
            self._host = GruenInstance([rows], [(Fr.one(), [0])], 2)
        return self._host

    def round_points(self, nevals: int, whi, whi_shift: int, wlo,
                     log_wlo: int) -> list[Fr]:
        assert nevals == 1, "fleet serves degree-2 group reductions only"
        if self.cls.host_rows is not None:
            return self._host_inst().round_points(nevals, whi, whi_shift,
                                                  wlo, log_wlo)
        return [self.fleet.q0(self.cls, self.slot, whi, whi_shift, wlo,
                              log_wlo)]

    def bind(self, r: Fr) -> None:
        if self._host is not None:
            self._host.bind(r)
            return
        self._bound += 1
        if self._bound > self.cls.round:
            self.fleet.bind(self.cls, r)

    def row_value(self, p: int) -> Fr:
        assert p == 0
        if self.cls.host_rows is not None:
            return self._host_inst().row_value(0)
        return self.fleet.final_value(self.cls, self.slot)
