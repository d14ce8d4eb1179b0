"""Proof serialization: canonical bytes -> deserialize -> verify, plus
byte-tamper soundness probes and shadow-trace metrics.

Reference: jolt-atlas-core/src/onnx_proof/proof_serialization.rs (canonical
serde roundtrip tests) and atlas-onnx-tracer/src/model/shadow_trace.rs.
"""

import numpy as np
import pytest

from jolt_atlas_tpu.frontend import ModelBuilder
from jolt_atlas_tpu.frontend.quantize import quantize_tensor
from jolt_atlas_tpu.frontend.shadow import print_shadow_report, shadow_trace
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
from jolt_atlas_tpu.prover import AtlasProver
from jolt_atlas_tpu.serde import deserialize_proof, serialize_proof
from jolt_atlas_tpu.verifier import AtlasVerifier

rng = np.random.default_rng(77)


def small_model():
    s = 8
    b = ModelBuilder(scale=s)
    x = b.input([4, 8])
    w = b.constant(quantize_tensor(rng.normal(size=(8, 8)) * 0.4, s))
    h = b.relu(b.matmul(x, w))
    b.output(b.scalar_const_div(h, 3))
    return b.build(), [quantize_tensor(rng.normal(size=(4, 8)), s)]


@pytest.fixture(scope="module")
def proven():
    model, inputs = small_model()
    pp = AtlasPreprocessing.preprocess(model)
    proof, io = AtlasProver(pp).prove(inputs)
    return pp, proof, io


class TestSerde:
    def test_roundtrip_verifies(self, proven):
        pp, proof, io = proven
        blob = serialize_proof(proof)
        proof2 = deserialize_proof(blob)
        assert AtlasVerifier(pp).verify(proof2, io)

    def test_roundtrip_is_canonical(self, proven):
        _, proof, _ = proven
        blob = serialize_proof(proof)
        assert serialize_proof(deserialize_proof(blob)) == blob

    def test_structure_preserved(self, proven):
        _, proof, _ = proven
        p2 = deserialize_proof(serialize_proof(proof))
        assert set(p2.commitments) == set(proof.commitments)
        assert set(p2.proofs) == set(proof.proofs)
        assert set(p2.opening_claims) == set(proof.opening_claims)
        for oid, c in proof.opening_claims.items():
            assert p2.opening_claims[oid] == c
        assert p2.reduced_claims == proof.reduced_claims

    def test_trailing_bytes_rejected(self, proven):
        _, proof, _ = proven
        blob = serialize_proof(proof)
        with pytest.raises((AssertionError, ValueError)):
            deserialize_proof(blob + b"\x00")

    def test_tampered_bytes_fail_verify(self, proven):
        """Flip one byte in several regions; each must deserialize-fail or
        verify-fail — never verify True."""
        pp, proof, io = proven
        blob = bytearray(serialize_proof(proof))
        for off in [len(blob) // 4, len(blob) // 2, 3 * len(blob) // 4,
                    len(blob) - 50]:
            t = bytearray(blob)
            t[off] ^= 0x01
            try:
                p2 = deserialize_proof(bytes(t))
            except Exception:
                continue
            assert not AtlasVerifier(pp).verify(p2, io), \
                f"tamper at byte {off} still verified"


class TestShadowTrace:
    def test_mlp_drift_small(self):
        s = 8
        b = ModelBuilder(scale=s)
        x = b.input([4, 8])
        w1 = b.constant(quantize_tensor(rng.normal(size=(8, 16)) * 0.4, s))
        w2 = b.constant(quantize_tensor(rng.normal(size=(16, 4)) * 0.4, s))
        b.output(b.matmul(b.relu(b.matmul(x, w1)), w2))
        model = b.build()
        xq = quantize_tensor(rng.normal(size=(4, 8)), s)
        metrics = shadow_trace(model, [xq])
        assert len(metrics) >= 3
        final = metrics[-1]
        assert final.cosine_similarity > 0.99
        assert final.max_abs_err < 0.2
        report = print_shadow_report(metrics)
        assert "cos" in report and str(final.node_idx) in report

    def test_softmax_drift_bounded(self):
        s = 8
        b = ModelBuilder(scale=s)
        x = b.input([2, 8])
        b.output(b.softmax_last_axis(x))
        model = b.build()
        xq = quantize_tensor(rng.normal(size=(2, 8)), s)
        metrics = shadow_trace(model, [xq])
        assert metrics[-1].max_abs_err < 0.05
