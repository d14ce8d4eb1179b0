"""Multi-chip sharding for the prover (jax.sharding mesh + shard_map).

The TPU-native equivalent of the reference's rayon parallelism (SURVEY §2.5):
witness polynomials and sumcheck evaluation domains are sharded over the
cycle dimension across chips; each sumcheck round all-reduces the (deg+1)
univariate message coefficients over ICI (`psum` of 16-bit-limb columns),
while challenge binding is shard-local because LowToHigh binding pairs
adjacent indices (2i, 2i+1) inside one shard.

Mesh axes: ("dp", "sp") — data-parallel over independent proof batches /
nodes, sequence-parallel over the cycle dimension of one polynomial.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..field import jaxfr
from ..field.constants import FR_MODULUS


def make_mesh(n_devices: int | None = None, dp: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % dp == 0
    arr = np.array(devs[:n]).reshape(dp, n // dp)
    return Mesh(arr, axis_names=("dp", "sp"))


def _psum_limbs(cols: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """All-reduce a (..., 16) Montgomery limb value across `axis_name`.

    Limb columns are < 2^16 so a psum over up to 2^12 devices cannot
    overflow uint32; afterwards the value (< n_dev * 2r) is renormalized to
    the < 2r invariant with a static conditional-subtraction chain.
    """
    s = jax.lax.psum(cols, axis_name)
    # carry-normalize into 17+ limbs, then subtract k*2r for k = 8,4,2,1
    limbs = [s[..., i] for i in range(jaxfr.NLIMB)]
    limbs += [jnp.zeros_like(limbs[0])] * 2
    norm, _ = jaxfr._carry_propagate(limbs, jaxfr.NLIMB + 2)
    for k in (8, 4, 2, 1):
        const = jaxfr.limbs_from_int(2 * FR_MODULUS * k, jaxfr.NLIMB + 2, 16)
        diff, borrow = jaxfr._sub_with_borrow(norm, const)
        ge = borrow == 0
        norm = jaxfr._select(ge, diff, norm)
    return jnp.stack(norm[: jaxfr.NLIMB], axis=-1)


def sharded_product_round(mesh: Mesh):
    """Builds a jittable one-round product-sumcheck kernel over the mesh.

    Inputs (sharded over 'sp' on the leading axis): eq, p — (T, 16) uint32
    Montgomery limb arrays; r — (16,) challenge limbs (replicated).
    Returns (m0, m2, eq', p'): the round message evaluations at 0 and 2
    (all-reduced, replicated) and the locally-bound halves.
    """

    def round_fn(eq, p, r):
        eq_lo, eq_hi = eq[0::2], eq[1::2]
        p_lo, p_hi = p[0::2], p[1::2]
        # message eval at 0: sum eq_lo * p_lo ; at 2: sum (2hi - lo) pairs
        m0_part = jaxfr.sum_reduce(jaxfr.mont_mul(eq_lo, p_lo))
        eq2 = jaxfr.add(eq_hi, jaxfr.sub(eq_hi, eq_lo))
        p2 = jaxfr.add(p_hi, jaxfr.sub(p_hi, p_lo))
        m2_part = jaxfr.sum_reduce(jaxfr.mont_mul(eq2, p2))
        m0 = _psum_limbs(m0_part, "sp")
        m2 = _psum_limbs(m2_part, "sp")
        # LowToHigh binding is shard-local
        rb = jnp.broadcast_to(r, p_lo.shape)
        eq_new = jaxfr.add(eq_lo, jaxfr.mont_mul(jaxfr.sub(eq_hi, eq_lo), rb))
        p_new = jaxfr.add(p_lo, jaxfr.mont_mul(jaxfr.sub(p_hi, p_lo), rb))
        return m0, m2, eq_new, p_new

    return jax.jit(shard_map(
        round_fn, mesh=mesh,
        in_specs=(P("sp", None), P("sp", None), P(None)),
        out_specs=(P(None), P(None), P("sp", None), P("sp", None)),
        check_rep=False,
    ))


def dryrun_proving_step(n_devices: int, log_t: int = 6, seed: int = 0):
    """Full sharded proving step: AtlasProver.prove() with the batch
    opening reduction running on the n-device mesh (cyclically sharded
    rows, psum'd round messages — parallel/shardedreduction.py), asserted
    byte-identical to the host proof and verified; plus the sp-sharded
    product-round kernel and a dp-sharded quantized forward on tiny shapes.
    """
    import random
    from .. import jaxexec

    mesh = make_mesh(n_devices, dp=1)

    # --- real prover over the mesh: N-chip proof == 1-chip proof ---
    from ..frontend import ModelBuilder
    from ..frontend.quantize import quantize_tensor
    from ..preprocessing import AtlasPreprocessing
    from ..prover import AtlasProver
    from ..verifier import AtlasVerifier
    from .. import serde
    from .shardedreduction import mesh_scope

    # one-block transformer: gather embedding, self-attention + softmax,
    # tanh (teleport) MLP, residuals, LM head — so the mesh engines see
    # every instance population of a real model (softmax stages, gather,
    # teleport, einsum contraction, clamp chunk families)
    nrng = np.random.default_rng(seed + 7)
    seq, dim, vocab = 16, 16, 32
    b = ModelBuilder(scale=8)
    idx = b.input((seq,))
    emb = b.constant(quantize_tensor(nrng.standard_normal((vocab, dim)), 8))
    x = b.gather(emb, idx)
    wq, wk, wv, wf = (b.constant(quantize_tensor(
        nrng.standard_normal((dim, dim)) * 0.4, 8)) for _ in range(4))
    q = b.einsum("mk,kn->mn", [x, wq])
    k = b.einsum("mk,kn->mn", [x, wk])
    v = b.einsum("mk,kn->mn", [x, wv])
    att = b.softmax_last_axis(b.einsum("mk,nk->mn", [q, k]))
    res1 = b.add(x, b.einsum("mk,kn->mn", [att, v]))
    res2 = b.add(res1, b.tanh(b.einsum("mk,kn->mn", [res1, wf])))
    wl = b.constant(quantize_tensor(
        nrng.standard_normal((dim, vocab)) * 0.4, 8))
    b.output(b.einsum("mk,kn->mn", [res2, wl]))
    model = b.build()
    xq = nrng.integers(0, vocab, size=seq).astype(np.int32)
    pp = AtlasPreprocessing.preprocess(model)
    proof_host, _ = AtlasProver(pp).prove([xq])
    from . import shardedrows
    engaged = []
    orig_setup = shardedrows.try_setup

    def _spy(mlpolys, terms, degree):
        res = orig_setup(mlpolys, terms, degree)
        if res is not None:
            engaged.append(len(mlpolys[0]))
        return res

    shardedrows.try_setup = _spy
    try:
        with mesh_scope(mesh):
            proof_mesh, io = AtlasProver(pp).prove([xq])
    finally:
        shardedrows.try_setup = orig_setup
    assert engaged, "mesh IOP rows engine did not engage"
    assert serde.serialize_proof(proof_mesh) == \
        serde.serialize_proof(proof_host), \
        "mesh proof bytes diverge from single-device proof"
    assert AtlasVerifier(pp).verify(proof_mesh, io), "mesh proof invalid"

    # --- sp-sharded sumcheck round over a 2^log_t cycle domain ---
    rng = random.Random(seed)
    T = 1 << log_t
    eq_vals = [rng.randrange(FR_MODULUS) for _ in range(T)]
    p_vals = [rng.randrange(FR_MODULUS) for _ in range(T)]
    eq = jnp.asarray(jaxfr.to_limbs_host(eq_vals))
    p = jnp.asarray(jaxfr.to_limbs_host(p_vals))
    r = jnp.asarray(jaxfr.to_limbs_host([rng.randrange(FR_MODULUS)])[0])
    spec = NamedSharding(mesh, P("sp", None))
    eq = jax.device_put(eq, spec)
    p = jax.device_put(p, spec)
    kernel = sharded_product_round(mesh)
    m0, m2, eq2, p2 = kernel(eq, p, r)
    m0_int = jaxfr.from_limbs_host(np.asarray(m0)[None] if np.asarray(m0).ndim == 1
                                   else np.asarray(m0))[0]
    expect = sum(a * b for a, b in zip(eq_vals[0::2], p_vals[0::2])) % FR_MODULUS
    assert m0_int == expect, "sharded sumcheck round mismatch"

    # --- dp/tp-sharded quantized forward (model weights replicated,
    #     batch sharded over the full device axis) ---
    model, xq = jaxexec.example_mlp(batch=n_devices * 2, din=32, dh=32, dout=16)
    fwd = jax.jit(jaxexec.compile_forward(model))
    batch_mesh = Mesh(np.array(jax.devices()[:n_devices]), axis_names=("dp",))
    x_sharded = jax.device_put(
        jnp.asarray(xq), NamedSharding(batch_mesh, P("dp", None)))
    outs = fwd(x_sharded)
    jax.block_until_ready(outs)
    return m0_int, outs
