"""End-to-end zero-knowledge pipeline: AtlasProver.prove_zk /
AtlasVerifier.verify_zk.

Every sumcheck's round polynomials and every eval-reduction h polynomial
are Pedersen-committed (hidden); the round-check chains are proven by
sigma protocols (subprotocols/zk_sumcheck.py — documented deviation from
the reference's BlindFold R1CS-folding construction, BASELINE.md #3).
Mirrors the role of the reference's zk e2e tests (zk.rs, gpt2_zk_bench).
"""

import numpy as np
import pytest

from jolt_atlas_tpu import serde
from jolt_atlas_tpu.field.scalar import Fr
from jolt_atlas_tpu.frontend import ModelBuilder
from jolt_atlas_tpu.frontend.quantize import quantize_tensor
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
from jolt_atlas_tpu.prover import AtlasProver
from jolt_atlas_tpu.subprotocols.zk_sumcheck import ZkSumcheckProof
from jolt_atlas_tpu.verifier import AtlasVerifier

rng = np.random.default_rng(0x2B5)


def _relu_mlp(din=16, dh=16, dout=16):
    # h feeds two einsums -> multi-claim node -> zk eval reduction runs
    b = ModelBuilder(scale=8)
    x = b.input((1, din))
    w1 = b.constant(quantize_tensor(rng.standard_normal((din, dh)), 8))
    w2 = b.constant(quantize_tensor(rng.standard_normal((dh, dout)), 8))
    w3 = b.constant(quantize_tensor(rng.standard_normal((dh, dout)), 8))
    h = b.relu(b.einsum("bi,ij->bj", [x, w1]))
    b.output(b.add(b.einsum("bi,ij->bj", [h, w2]),
                   b.einsum("bi,ij->bj", [h, w3])))
    return b.build(), quantize_tensor(rng.standard_normal((1, din)), 8)


@pytest.fixture(scope="module")
def zk_setup():
    model, xq = _relu_mlp()
    pp = AtlasPreprocessing.preprocess(model)
    proof, io = AtlasProver(pp).prove_zk([xq])
    return pp, proof, io, xq


class TestZkPipeline:
    def test_round_trip(self, zk_setup):
        pp, proof, io, _ = zk_setup
        assert AtlasVerifier(pp).verify_zk(proof, io)

    def test_round_polys_hidden(self, zk_setup):
        """Every per-node sumcheck proof must be the committed form."""
        _, proof, _, _ = zk_setup
        assert proof.proofs, "no sumcheck proofs produced"
        for key, p in proof.proofs.items():
            assert isinstance(p, ZkSumcheckProof), key
        assert isinstance(proof.batch_opening_proof, ZkSumcheckProof)
        for erp in proof.eval_reduction_proofs.values():
            assert not hasattr(erp, "h"), "cleartext h poly in zk proof"

    def test_serde_round_trip(self, zk_setup):
        pp, proof, io, _ = zk_setup
        blob = serde.serialize_proof(proof)
        back = serde.deserialize_proof(blob)
        assert serde.serialize_proof(back) == blob
        assert AtlasVerifier(pp).verify_zk(back, io)

    def test_plain_verifier_rejects_zk_proof(self, zk_setup):
        pp, proof, io, _ = zk_setup
        assert not AtlasVerifier(pp).verify(proof, io)

    def test_zk_verifier_rejects_plain_proof(self, zk_setup):
        pp, _, _, xq = zk_setup
        plain, io = AtlasProver(pp).prove([xq])
        assert not AtlasVerifier(pp).verify_zk(plain, io)

    def test_tampered_round_commitment_rejected(self, zk_setup):
        pp, proof, io, _ = zk_setup
        blob = serde.serialize_proof(proof)
        tampered = serde.deserialize_proof(blob)
        key = next(iter(tampered.proofs))
        zp = tampered.proofs[key]
        zp.round_commitments[0] = zp.round_commitments[0] + \
            zp.round_commitments[0]
        assert not AtlasVerifier(pp).verify_zk(tampered, io)

    def test_tampered_sigma_response_rejected(self, zk_setup):
        pp, proof, io, _ = zk_setup
        blob = serde.serialize_proof(proof)
        tampered = serde.deserialize_proof(blob)
        key = next(iter(tampered.proofs))
        zp = tampered.proofs[key]
        zp.responses[0][0] = zp.responses[0][0] + Fr.one()
        assert not AtlasVerifier(pp).verify_zk(tampered, io)

    def test_tampered_opening_claim_rejected(self, zk_setup):
        pp, proof, io, _ = zk_setup
        blob = serde.serialize_proof(proof)
        tampered = serde.deserialize_proof(blob)
        oid = next(iter(tampered.opening_claims))
        tampered.opening_claims[oid] = \
            tampered.opening_claims[oid] + Fr.one()
        assert not AtlasVerifier(pp).verify_zk(tampered, io)

    def test_tampered_eval_reduction_rejected(self, zk_setup):
        pp, proof, io, _ = zk_setup
        if not proof.eval_reduction_proofs:
            pytest.skip("no eval reductions in this graph")
        blob = serde.serialize_proof(proof)
        tampered = serde.deserialize_proof(blob)
        idx = next(iter(tampered.eval_reduction_proofs))
        erp = tampered.eval_reduction_proofs[idx]
        erp.new_claim = erp.new_claim + Fr.one()
        assert not AtlasVerifier(pp).verify_zk(tampered, io)

    def test_zk_proof_differs_per_run(self, zk_setup):
        """Blinding randomness must make two zk proofs of the same
        statement differ (the plain pipeline is deterministic)."""
        pp, proof, _, xq = zk_setup
        proof2, _ = AtlasProver(pp).prove_zk([xq])
        assert serde.serialize_proof(proof) != serde.serialize_proof(proof2)


def test_zk_softmax_model():
    """Softmax exercises the staged batched sumchecks + aux advice."""
    b = ModelBuilder(scale=8)
    x = b.input((4, 8))
    b.output(b.softmax_last_axis(x))
    model = b.build()
    xq = quantize_tensor(rng.standard_normal((4, 8)), 8)
    pp = AtlasPreprocessing.preprocess(model)
    proof, io = AtlasProver(pp).prove_zk([xq])
    assert AtlasVerifier(pp).verify_zk(proof, io)


class TestZkHiddenClaims:
    """Round-5: the reduced group claims and the joint evaluation are
    hidden (subprotocols/zk_opening.py) — mirrors the claim-hiding the
    reference gets from BlindFold (blindfold/mod.rs:1-7)."""

    def test_no_cleartext_reduced_claims(self, zk_setup):
        pp, proof, io, xq = zk_setup
        from jolt_atlas_tpu.subprotocols.zk_opening import ZkJointOpeningProof
        assert proof.reduced_claims == []
        assert isinstance(proof.joint_opening_proof, ZkJointOpeningProof)
        # the claims a PLAIN prove of the same input produces must not
        # appear anywhere in the zk blob
        plain, _ = AtlasProver(pp).prove([xq])
        assert plain.reduced_claims, "plain prove produced no group claims"
        blob = serde.serialize_proof(proof)
        for c in plain.reduced_claims:
            assert c.to_bytes_le() not in blob
            assert c.to_bytes_be() not in blob

    def test_mask_tamper_rejected(self, zk_setup):
        pp, proof, io, _ = zk_setup
        import copy
        from jolt_atlas_tpu.curve.points import g1_generator
        tampered = copy.copy(proof)
        zo = copy.copy(proof.joint_opening_proof)
        zo.c_mask = zo.c_mask + g1_generator()
        tampered.joint_opening_proof = zo
        assert not AtlasVerifier(pp).verify_zk(tampered, io)

    def test_hidden_claim_commitment_tamper_rejected(self, zk_setup):
        pp, proof, io, _ = zk_setup
        import copy
        from jolt_atlas_tpu.curve.points import g1_generator
        for field in ("e_m", "d", "w_m", "a_d"):
            tampered = copy.copy(proof)
            zo = copy.copy(proof.joint_opening_proof)
            setattr(zo, field, getattr(zo, field) + g1_generator())
            tampered.joint_opening_proof = zo
            assert not AtlasVerifier(pp).verify_zk(tampered, io), field
        # group-claim commitment
        tampered = copy.copy(proof)
        zo = copy.copy(proof.joint_opening_proof)
        zo.e_g = [zo.e_g[0] + g1_generator()] + zo.e_g[1:]
        tampered.joint_opening_proof = zo
        assert not AtlasVerifier(pp).verify_zk(tampered, io)

    def test_masked_eval_tamper_rejected(self, zk_setup):
        pp, proof, io, _ = zk_setup
        import copy
        from jolt_atlas_tpu.field.scalar import Fr
        tampered = copy.copy(proof)
        zo = copy.copy(proof.joint_opening_proof)
        zo.y_k = zo.y_k + Fr.one()
        tampered.joint_opening_proof = zo
        assert not AtlasVerifier(pp).verify_zk(tampered, io)
        # sigma response tamper
        tampered = copy.copy(proof)
        zo = copy.copy(proof.joint_opening_proof)
        zo.z = [list(zv) for zv in zo.z]
        zo.z[0][0] = zo.z[0][0] + Fr.one()
        tampered.joint_opening_proof = zo
        assert not AtlasVerifier(pp).verify_zk(tampered, io)
