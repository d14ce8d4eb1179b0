"""Mesh-sharded batched opening-reduction sumcheck (SPMD over 'sp').

The TPU-native multi-chip layout for the batch opening reduction
(poly/opening.py; reference joltworks/src/poly/opening_proof.rs:500):
every reduction instance's RLC polynomial is sharded over the mesh's
'sp' axis and the per-round degree-2 Gruen message coefficients are the
only cross-chip traffic (one `psum` of 16-bit Montgomery limb columns
per round, renormalized on device).

Key layout fact: the engine binds HighToLow (MSB-first), pairing global
indices (j, j + n/2). Under a *cyclic* (mod-D) placement — element j
lives on device j mod D — both halves of every pair share a device while
n >= 2D, so binding is entirely shard-local and the local kernel is the
single-device kernel applied to the local slice. A flat (16, n) planes
buffer reshaped to (16, n/D, D) with PartitionSpec (None, None, 'sp') IS
that cyclic placement. Every instance reaches length exactly D at global
round `max_rounds - log2(D)`; the engine hands the tiny rows to the host
C++ kernels there (BatchedSumcheck.prove_tail), so proof bytes are
identical to the single-device and all-host paths — the determinism
contract (SURVEY §4: N-chip proof == 1-chip proof) is tested in
tests/test_multichip.py.

Fiat-Shamir runs on the host here (one tiny fetch per round): on a
virtual CPU mesh there is no dispatch-latency penalty, and on real
multi-chip hardware the on-device transcript chain of tpu/reduction.py
composes with this layout (same kernels, sharded operands).
"""

from __future__ import annotations

import numpy as np

from ..field.constants import FR_MODULUS
from ..field.scalar import Fr
from ..poly.spliteq import SplitEq
from ..poly.unipoly import CompressedUniPoly

_MESH = None  # active mesh set by mesh_scope()


def active_mesh():
    return _MESH


class mesh_scope:
    """Context manager routing prove()'s opening reduction through the
    sharded engine: `with mesh_scope(mesh): prover.prove(...)`."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __enter__(self):
        global _MESH
        self._prev = _MESH
        _MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _MESH
        _MESH = self._prev
        return False


# ---------------------------------------------------------------------------
# planes helpers (device, mesh-wide)
# ---------------------------------------------------------------------------

def _ctx():
    from ..tpu.reduction import _state
    st = _state()
    if not st:
        raise RuntimeError("JAX backend unavailable for mesh reduction")
    return st  # (jax, PlanesCtx)


def _psum_planes(s, axis_name: str, ndev: int, FR, jnp):
    """psum a (16, ...) canonical planes value over `axis_name` and
    renormalize to canonical (< p).

    After the psum each plane is < D * 2^16; one carry propagation yields
    a 17-plane value < D * p, and a conditional-subtraction chain over
    k*p for k = D/2 .. 1 restores < p. All ops stay u32."""
    import jax
    t = jax.lax.psum(s, axis_name)
    # carry propagate 16 planes + overflow plane
    planes = []
    c = jnp.zeros_like(t[0])
    for j in range(16):
        cur = t[j] + c
        planes.append(cur & 0xFFFF)
        c = cur >> 16
    planes.append(c)  # < D
    k = ndev // 2
    while k >= 1:
        planes = _cond_sub_const(planes, k * FR.P, jnp)
        k //= 2
    return jnp.stack(planes[:16])


def _cond_sub_const(planes, const: int, jnp):
    """17-plane value -> value - const if value >= const (planes u32)."""
    cl = [(const >> (16 * i)) & 0xFFFF for i in range(17)]
    ge = jnp.ones_like(planes[0], dtype=jnp.bool_)
    gt = jnp.zeros_like(planes[0], dtype=jnp.bool_)
    for j in range(16, -1, -1):
        gt = gt | (ge & (planes[j] > cl[j]))
        ge = ge & (planes[j] >= cl[j])
    take = gt | ge
    out = []
    borrow = None
    for j in range(17):
        cur = (planes[j] + 0x10000 - cl[j] if borrow is None
               else planes[j] + 0x10000 - cl[j] - borrow)
        out.append(jnp.where(take, cur & 0xFFFF, planes[j]))
        borrow = 1 - (cur >> 16)
    return out


# ---------------------------------------------------------------------------
# jitted mesh kernels (cached per mesh + weight-arity; shapes re-jit inside)
# ---------------------------------------------------------------------------

_KERNEL_CACHE: dict = {}


def _q0_kernel(mesh, ndev: int, nw: int):
    """jit(shard_map(...)) computing the psum'd q(0) of one cyclically
    sharded row. `nw` weight factors (0..2), each a replicated table plus
    a sharded index grid. Must be jitted: an eager shard_map binds every
    primitive as its own pjit call (a compile per limb op)."""
    key = ("q0", id(mesh), ndev, nw)
    got = _KERNEL_CACHE.get(key)
    if got is not None:
        return got
    import jax
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    jx, FR = _ctx()
    jnp = jx.numpy

    def kern(x, *wargs):
        p = x[:, : x.shape[1] // 2]
        for i in range(nw):
            tab, idx = wargs[i], wargs[nw + i]
            p = FR.mul(jnp.take(tab, idx, axis=1), p)
        while p.shape[1] > 1:
            k = p.shape[1] // 2
            p = FR.add(p[:, :k], p[:, k:])
        return _psum_planes(p[:, 0], "sp", ndev, FR, jnp)

    in_specs = ((P(None, None, "sp"),)
                + tuple(P(None, None) for _ in range(nw))
                + tuple(P(None, "sp") for _ in range(nw)))
    fn = jax.jit(shard_map(kern, mesh=mesh, in_specs=in_specs,
                           out_specs=P(None, None), check_rep=False))
    _KERNEL_CACHE[key] = fn
    return fn


def _bind_kernel(mesh):
    """jit(shard_map(...)): x' = lo + c * (hi - lo) on the local halves."""
    key = ("bind", id(mesh))
    got = _KERNEL_CACHE.get(key)
    if got is not None:
        return got
    import jax
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    jx, FR = _ctx()

    def kern(x, cc):
        t2 = x.shape[1] // 2
        lo, hi = x[:, :t2], x[:, t2:]
        return FR.add(lo, FR.mul(FR.sub(hi, lo), cc))

    fn = jax.jit(shard_map(
        kern, mesh=mesh,
        in_specs=(P(None, None, "sp"), P(None, None, None)),
        out_specs=P(None, None, "sp"), check_rep=False))
    _KERNEL_CACHE[key] = fn
    return fn


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

class _ShardedRow:
    """One instance's polynomial, cyclically sharded over the mesh."""

    def __init__(self, mesh, ndev: int, fvec, se: SplitEq):
        from ..tpu.reduction import _u64_to_planes
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.ndev = ndev
        self.se = se
        rows = np.asarray(fvec.d).reshape(-1, 4)
        self.n = len(rows)
        planes = _u64_to_planes(rows).reshape(16, self.n // ndev, ndev)
        self.x = jax.device_put(
            planes, NamedSharding(mesh, P(None, None, "sp")))
        self.local_round = 0

    def q0(self) -> Fr:
        """Round message evaluation q(0) = sum_j w(j) * x[j] over the lo
        half, psum'd over the mesh."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..tpu.reduction import _u64_to_planes
        jx, FR = _ctx()
        jnp = jx.numpy

        D = self.ndev
        h = self.n // 2                      # global lo-half length
        whi, shift, wlo, log_wlo = self.se.tables(self.local_round)
        j = np.arange(h, dtype=np.int64)

        tabs, idxs = [], []
        for tab, idx in (
            (whi, (j >> shift).astype(np.int32) if whi is not None else None),
            (wlo, (j & ((1 << log_wlo) - 1)).astype(np.int32)
             if wlo is not None else None),
        ):
            if tab is None:
                continue
            tabs.append(jnp.asarray(_u64_to_planes(
                np.asarray(tab).reshape(-1, 4))))
            idxs.append(jax.device_put(
                idx.reshape(h // D, D),
                NamedSharding(self.mesh, P(None, "sp"))))

        out = _q0_kernel(self.mesh, D, len(tabs))(self.x, *tabs, *idxs)
        return Fr(FR.from_planes(np.asarray(out).reshape(16, 1))[0])

    def bind(self, c: Fr) -> None:
        from ..tpu.reduction import _fr_to_planes
        jx, FR = _ctx()
        jnp = jx.numpy
        c_pl = jnp.asarray(_fr_to_planes([c]))[:, :, None]
        self.x = _bind_kernel(self.mesh)(self.x, c_pl)
        self.se.note_challenge(c, self.local_round)
        self.local_round += 1
        self.n //= 2

    def fetch_rows(self):
        """(16, D) planes -> FrArray of the D remaining coefficients."""
        from ..tpu.reduction import _planes_to_u64
        from ..field.frvec import FrArray
        flat = np.asarray(self.x).reshape(16, self.ndev)
        return FrArray(np.ascontiguousarray(_planes_to_u64(flat)))


def try_prove(instances, accumulator, transcript, mesh=None):
    """Sharded BatchedSumcheck.prove over the opening-reduction instances.
    Proof bytes identical to the host path. Returns None if no mesh is
    active or shapes are unsuitable (caller falls back)."""
    mesh = mesh or _MESH
    if mesh is None:
        return None
    if "sp" not in mesh.axis_names:
        return None
    ndev = mesh.shape["sp"]
    if ndev & (ndev - 1):
        return None
    log_d = ndev.bit_length() - 1

    from ..field.frvec import FrArray
    from ..subprotocols.sumcheck import BatchedSumcheck, _mul_pow2

    max_rounds = max(i.num_rounds() for i in instances)
    r_dev = max_rounds - log_d
    if r_dev < 1:
        return None
    # every instance joining before the handoff must be device-eligible
    # (its length 2^nr >= 2D is implied by offs < r_dev)
    head_ids = [k for k, inst in enumerate(instances)
                if max_rounds - inst.num_rounds() < r_dev]
    if not head_ids:
        return None
    if not all(isinstance(instances[k].rlc_fvec, FrArray)
               for k in head_ids):
        return None

    # ---- protocol prefix (identical to BatchedSumcheck.prove)
    claims = [inst.input_claim(accumulator) for inst in instances]
    for c in claims:
        transcript.append_scalar(c)
    coeffs = transcript.challenge_vector(len(instances))

    offs = {k: max_rounds - instances[k].num_rounds() for k in head_ids}
    one = Fr.one()

    rows: dict[int, _ShardedRow] = {}
    Q = {k: claims[k] for k in head_ids}     # running claim per instance
    es = {k: one for k in head_ids}          # accumulated eq-line scalar

    r_sumcheck: list[Fr] = []
    compressed: list[CompressedUniPoly] = []

    for r in range(r_dev):
        for k in head_ids:
            if offs[k] == r:
                rows[k] = _ShardedRow(mesh, ndev, instances[k].rlc_fvec,
                                      SplitEq(instances[k].point))
        # batched degree-2 message: b0, b2 (b1 from the claim)
        b0 = Fr.zero()
        b2 = Fr.zero()
        lane = {}
        for k, inst in enumerate(instances):
            nr = inst.num_rounds()
            if max_rounds - nr > r:
                b0 = b0 + coeffs[k] * _mul_pow2(claims[k],
                                                max_rounds - r - nr - 1)
                continue
            row = rows[k]
            q0 = row.q0()
            l0, l1 = row.se.l_linear(row.local_round)
            q1 = (Q[k] - l0 * q0) * l1.inverse()
            dq, dl = q1 - q0, l1 - l0
            b0 = b0 + coeffs[k] * (es[k] * l0 * q0)
            b2 = b2 + coeffs[k] * (es[k] * dl * dq)
            lane[k] = (q0, q1, l0, l1)
        cp = CompressedUniPoly([b0, b2])
        cp.append_to_transcript(transcript)
        c = transcript.challenge_scalar_optimized()
        r_sumcheck.append(c)
        compressed.append(cp)
        for k, (q0, q1, l0, l1) in lane.items():
            Q[k] = q0 + (q1 - q0) * c
            es[k] = es[k] * (l0 + (l1 - l0) * c)
            rows[k].bind(c)

    # ---- hand off to host tail (rows are length D now)
    individual_claims: list[Fr] = []
    for k, inst in enumerate(instances):
        nr = inst.num_rounds()
        if k in rows:
            inst.resume_from_device(rows[k].fetch_rows(),
                                    rows[k].local_round, rows[k].se)
            individual_claims.append(es[k] * Q[k])
        else:
            if nr > 0:
                inst.setup_sumcheck()
            individual_claims.append(
                _mul_pow2(claims[k], max_rounds - r_dev - nr)
                if max_rounds - r_dev - nr >= 0 else claims[k])

    return BatchedSumcheck.prove_tail(
        instances, claims, coeffs, individual_claims, compressed,
        r_sumcheck, accumulator, transcript, r_dev, max_rounds)
