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
