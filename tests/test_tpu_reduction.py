"""Device-resident opening-reduction engine (tpu/reduction.py): the
accelerator head rounds — including the on-device BLAKE2b Fiat-Shamir —
must produce byte-identical proofs to the all-host C++ path.

Forcing JOLT_ATLAS_TPU_REDUCTION=on runs the same XLA kernels on the test
CPU backend, so this exercises the full engine (layout planning, bind /
q(0) / tail kernels, transcript replay + state assertion, host tail
resume) without TPU hardware. Mirrors the role of the reference's
opening-proof tests (joltworks/src/poly/opening_proof.rs)."""

import os

import numpy as np
import pytest

# XLA compiles the per-round bind/q0/tail kernels in ~15+ min on the 4-core
# CPU backend (the TPU relay does it in ~4 min, cached thereafter), so the
# full-engine run is opt-in. The production path self-checks regardless:
# try_prove raises if the device transcript diverges from the host replay.
from conftest import device_tests_enabled, mark_device_tests_warm

pytestmark = pytest.mark.skipif(
    not device_tests_enabled("reduction"),
    reason="first run compiles XLA kernels for minutes; set "
           "JOLT_ATLAS_SLOW_TESTS=1 once to seed .jax_cache, "
           "after which these run by default")

from jolt_atlas_tpu import serde
from jolt_atlas_tpu.frontend import ModelBuilder
from jolt_atlas_tpu.frontend.quantize import quantize_tensor
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
from jolt_atlas_tpu.prover import AtlasProver
from jolt_atlas_tpu.verifier import AtlasVerifier

rng = np.random.default_rng(0xD0)


def _mlp_model(din=64, dh=64, dout=32):
    b = ModelBuilder(scale=8)
    x = b.input((1, din))
    w1 = b.constant(quantize_tensor(rng.standard_normal((din, dh)), 8))
    w2 = b.constant(quantize_tensor(rng.standard_normal((dh, dout)), 8))
    h = b.relu(b.einsum("bi,ij->bj", [x, w1]))
    b.output(b.einsum("bi,ij->bj", [h, w2]))
    return b.build(), quantize_tensor(rng.standard_normal((1, din)), 8)


def _prove_bytes(pp, inputs):
    proof, io = AtlasProver(pp).prove(inputs)
    return serde.serialize_proof(proof), proof, io


def test_device_reduction_byte_exact():
    model, xq = _mlp_model()
    pp = AtlasPreprocessing.preprocess(model)
    old = {k: os.environ.get(k) for k in
           ("JOLT_ATLAS_TPU_REDUCTION", "JOLT_ATLAS_TPU_TAIL_ROUNDS")}
    try:
        os.environ["JOLT_ATLAS_TPU_REDUCTION"] = "off"
        blob_off, _, _ = _prove_bytes(pp, [xq])
        # small model: lower the host-tail handoff so >=2 head rounds
        # actually run on the device
        os.environ["JOLT_ATLAS_TPU_REDUCTION"] = "on"
        os.environ["JOLT_ATLAS_TPU_TAIL_ROUNDS"] = "4"
        blob_on, proof, io = _prove_bytes(pp, [xq])
        # default schedule: EVERY round on device, fetch scalars only
        os.environ["JOLT_ATLAS_TPU_TAIL_ROUNDS"] = "0"
        blob_full, proof_f, io_f = _prove_bytes(pp, [xq])
    finally:
        for k, v in old.items():
            os.environ.pop(k, None)
            if v is not None:
                os.environ[k] = v
    assert blob_on == blob_off, "device head rounds changed the proof bytes"
    assert blob_full == blob_off, "full-device schedule changed proof bytes"
    assert AtlasVerifier(pp).verify(proof, io)
    assert AtlasVerifier(pp).verify(proof_f, io_f)
    mark_device_tests_warm("reduction")  # later runs hit the compile cache -> fast
