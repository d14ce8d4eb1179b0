"""Multi-chip determinism: an 8-device mesh prove must produce the SAME
proof bytes as the single-device/host prove (SURVEY §4: "N-chip proof ==
1-chip proof"), because Fiat-Shamir replaces interaction and every
collective (psum of Montgomery limb columns) is renormalized to the exact
field value the host computes.

Runs on the virtual 8-device CPU mesh (tests/conftest.py). The engine
under test is parallel/shardedreduction.py: the batch opening reduction
with every instance's RLC polynomial cyclically sharded over 'sp' and one
psum per round; head rounds on the mesh, tail rounds on the host C++
kernels.
"""

import numpy as np

from jolt_atlas_tpu import serde
from jolt_atlas_tpu.frontend import ModelBuilder
from jolt_atlas_tpu.frontend.quantize import quantize_tensor
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
from jolt_atlas_tpu.prover import AtlasProver
from jolt_atlas_tpu.verifier import AtlasVerifier

rng = np.random.default_rng(0x3E5)


def _model(din=32, dh=32, dout=16):
    b = ModelBuilder(scale=8)
    x = b.input((1, din))
    w1 = b.constant(quantize_tensor(rng.standard_normal((din, dh)), 8))
    w2 = b.constant(quantize_tensor(rng.standard_normal((dh, dout)), 8))
    h = b.relu(b.einsum("bi,ij->bj", [x, w1]))
    b.output(b.einsum("bi,ij->bj", [h, w2]))
    return b.build(), quantize_tensor(rng.standard_normal((1, din)), 8)


def test_mesh_proof_matches_host_proof():
    from jolt_atlas_tpu.parallel import make_mesh, mesh_scope

    model, xq = _model()
    pp = AtlasPreprocessing.preprocess(model)

    proof_host, io_host = AtlasProver(pp).prove([xq])
    blob_host = serde.serialize_proof(proof_host)

    mesh = make_mesh(8, dp=1)
    with mesh_scope(mesh):
        proof_mesh, io_mesh = AtlasProver(pp).prove([xq])
    blob_mesh = serde.serialize_proof(proof_mesh)

    assert blob_mesh == blob_host, \
        "8-device sharded prove changed the proof bytes"
    assert AtlasVerifier(pp).verify(proof_mesh, io_mesh)


def test_mesh_engine_engages():
    """The sharded engine must actually run (not silently fall back)."""
    from jolt_atlas_tpu.parallel import make_mesh, mesh_scope
    from jolt_atlas_tpu.parallel import shardedreduction

    model, xq = _model(16, 16, 16)
    pp = AtlasPreprocessing.preprocess(model)

    calls = []
    orig = shardedreduction.try_prove

    def spy(instances, accumulator, transcript, mesh=None):
        res = orig(instances, accumulator, transcript, mesh)
        calls.append(res is not None)
        return res

    shardedreduction.try_prove = spy
    try:
        with mesh_scope(make_mesh(8, dp=1)):
            proof, io = AtlasProver(pp).prove([xq])
    finally:
        shardedreduction.try_prove = orig
    assert calls and all(calls), "mesh reduction engine did not engage"
    assert AtlasVerifier(pp).verify(proof, io)


def _transformer_block(seq=16, dim=16, vocab=32):
    """One-block transformer: gather embedding, self-attention with
    softmax, tanh MLP, residuals, LM head — every instance population the
    mesh engines see on a real model (softmax stages, gather, teleport)."""
    b = ModelBuilder(scale=8)
    idx = b.input((seq,))
    emb = b.constant(quantize_tensor(rng.standard_normal((vocab, dim)), 8))
    x = b.gather(emb, idx)
    wq = b.constant(quantize_tensor(rng.standard_normal((dim, dim)) * 0.4, 8))
    wk = b.constant(quantize_tensor(rng.standard_normal((dim, dim)) * 0.4, 8))
    wv = b.constant(quantize_tensor(rng.standard_normal((dim, dim)) * 0.4, 8))
    q = b.einsum("mk,kn->mn", [x, wq])
    k = b.einsum("mk,kn->mn", [x, wk])
    v = b.einsum("mk,kn->mn", [x, wv])
    att = b.softmax_last_axis(b.einsum("mk,nk->mn", [q, k]))
    ctx = b.einsum("mk,kn->mn", [att, v])
    res1 = b.add(x, ctx)
    wf = b.constant(quantize_tensor(rng.standard_normal((dim, dim)) * 0.4, 8))
    h = b.tanh(b.einsum("mk,kn->mn", [res1, wf]))
    res2 = b.add(res1, h)
    wl = b.constant(quantize_tensor(rng.standard_normal((dim, vocab)) * 0.4, 8))
    b.output(b.einsum("mk,kn->mn", [res2, wl]))
    toks = rng.integers(0, vocab, size=seq).astype(np.int32)
    return b.build(), toks


def test_mesh_transformer_block_proof_matches_host():
    """N-chip == 1-chip bytes on a one-block transformer (softmax, gather,
    teleport tanh all present), with BOTH mesh engines engaged: the
    sharded opening reduction AND the sharded IOP rows engine
    (parallel/shardedrows.py MeshGruen head rounds)."""
    from jolt_atlas_tpu.parallel import make_mesh, mesh_scope
    from jolt_atlas_tpu.parallel import shardedrows

    model, toks = _transformer_block()
    pp = AtlasPreprocessing.preprocess(model)
    proof_host, _ = AtlasProver(pp).prove([toks])

    engaged = []
    orig = shardedrows.try_setup

    def spy(mlpolys, terms, degree):
        res = orig(mlpolys, terms, degree)
        if res is not None:
            engaged.append(len(mlpolys[0]))
        return res

    shardedrows.try_setup = spy
    try:
        with mesh_scope(make_mesh(8, dp=1)):
            proof_mesh, io = AtlasProver(pp).prove([toks])
    finally:
        shardedrows.try_setup = orig

    assert engaged, "mesh IOP rows engine did not engage on any instance"
    assert serde.serialize_proof(proof_mesh) == \
        serde.serialize_proof(proof_host), \
        "mesh transformer-block proof bytes diverge from host"
    assert AtlasVerifier(pp).verify(proof_mesh, io)
