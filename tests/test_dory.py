"""Dory transparent PCS: unit tests + an e2e model proof with pcs="dory".

Reference: joltworks/src/poly/commitment/dory/mod.rs:59 (Dory adapter with
the fixed-column-width homomorphic combine) and the test_gpt2_dory e2e
path. See commitment/dory.py for the documented construction/deviation.
"""

import numpy as np
import pytest

from jolt_atlas_tpu import serde
from jolt_atlas_tpu.commitment.dory import (DoryPC, DoryProof, DoryScheme,
                                            DorySetup)
from jolt_atlas_tpu.field.scalar import Fr
from jolt_atlas_tpu.frontend import ModelBuilder
from jolt_atlas_tpu.frontend.quantize import quantize_tensor
from jolt_atlas_tpu.poly.mlpoly import MLPoly
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
from jolt_atlas_tpu.prover import AtlasProver
from jolt_atlas_tpu.transcripts import Blake2bTranscript
from jolt_atlas_tpu.verifier import AtlasVerifier

rng = np.random.default_rng(0xD0FF)


@pytest.fixture(scope="module")
def setup():
    return DorySetup.for_num_vars(10, max_log_rows=3)


class TestDoryPC:
    def test_open_verify(self, setup):
        coeffs = rng.integers(-2**31, 2**31, 1 << 8).astype(np.int64)
        com = DoryPC.commit(setup, coeffs)
        point = [Fr(int(x)) for x in rng.integers(0, 2**61, 8)]
        claim = MLPoly(ints=coeffs.copy()).evaluate(point)
        tr = Blake2bTranscript(b"dory")
        proof = DoryPC.open(setup, coeffs, point, tr)
        tv = Blake2bTranscript(b"dory")
        assert DoryPC.verify(setup, com, point, claim, proof, tv)

    def test_wrong_claim_rejected(self, setup):
        coeffs = rng.integers(-100, 100, 1 << 8).astype(np.int64)
        com = DoryPC.commit(setup, coeffs)
        point = [Fr(int(x)) for x in rng.integers(0, 2**61, 8)]
        claim = MLPoly(ints=coeffs.copy()).evaluate(point)
        tr = Blake2bTranscript(b"dory")
        proof = DoryPC.open(setup, coeffs, point, tr)
        tv = Blake2bTranscript(b"dory")
        assert not DoryPC.verify(setup, com, point, claim + Fr.one(),
                                 proof, tv)

    def test_tampered_cross_term_rejected(self, setup):
        coeffs = rng.integers(-100, 100, 1 << 8).astype(np.int64)
        com = DoryPC.commit(setup, coeffs)
        point = [Fr(int(x)) for x in rng.integers(0, 2**61, 8)]
        claim = MLPoly(ints=coeffs.copy()).evaluate(point)
        tr = Blake2bTranscript(b"dory")
        proof = DoryPC.open(setup, coeffs, point, tr)
        cl, cr, ul, ur = proof.pair_rounds[0]
        proof.pair_rounds[0] = (cl, cr, ul + ul, ur)
        tv = Blake2bTranscript(b"dory")
        assert not DoryPC.verify(setup, com, point, claim, proof, tv)

    def test_homomorphic_combine_fixed_columns(self, setup):
        big = rng.integers(-500, 500, 1 << 9).astype(np.int64)
        small = rng.integers(-500, 500, 1 << 5).astype(np.int64)
        coms = [DoryPC.commit(setup, big), DoryPC.commit(setup, small)]
        deltas = [Fr(3), Fr(11)]
        joint = big * 3
        joint[:32] += small * 11
        combined = DoryScheme().combine_commitments(coms, deltas)
        assert combined.gt.c == DoryPC.commit(setup, joint).gt.c

    def test_proof_serde(self, setup):
        coeffs = rng.integers(-100, 100, 1 << 8).astype(np.int64)
        com = DoryPC.commit(setup, coeffs)
        point = [Fr(int(x)) for x in rng.integers(0, 2**61, 8)]
        claim = MLPoly(ints=coeffs.copy()).evaluate(point)
        tr = Blake2bTranscript(b"dory")
        proof = DoryPC.open(setup, coeffs, point, tr)
        blob = proof.serialize()
        back, off = DoryProof.deserialize(blob)
        assert off == len(blob)
        tv = Blake2bTranscript(b"dory")
        assert DoryPC.verify(setup, com, point, claim, back, tv)


def test_dory_e2e_model():
    """Full prove+verify of a small model with the Dory PCS selected —
    no trusted setup anywhere (reference test_gpt2_dory analogue)."""
    b = ModelBuilder(scale=8)
    x = b.input((1, 16))
    w1 = b.constant(quantize_tensor(rng.standard_normal((16, 16)), 8))
    h = b.relu(b.einsum("bi,ij->bj", [x, w1]))
    b.output(h)
    model = b.build()
    xq = quantize_tensor(rng.standard_normal((1, 16)), 8)

    pp = AtlasPreprocessing.preprocess(model, pcs="dory")
    assert pp.srs is None, "dory mode must not build a trusted SRS"
    proof, io = AtlasProver(pp).prove([xq])
    blob = serde.serialize_proof(proof)
    back = serde.deserialize_proof(blob)
    assert serde.serialize_proof(back) == blob
    assert AtlasVerifier(pp).verify(back, io)

    # tampered commitment must fail
    t2 = serde.deserialize_proof(blob)
    pid = next(iter(t2.commitments))
    t2.commitments[pid].gt = t2.commitments[pid].gt * t2.commitments[pid].gt
    assert not AtlasVerifier(pp).verify(t2, io)


def test_dory_2e16_verify_under_1s():
    """Round-5 (verdict item 8): Dory at 2^16 coefficients with the
    O(1)-group-ops-per-round verifier (structured-scalar native MSM +
    native pairing products) must verify in well under a second."""
    import time
    import numpy as np
    from jolt_atlas_tpu.commitment.dory import DoryPC, DorySetup
    from jolt_atlas_tpu.field.constants import FR_MODULUS
    from jolt_atlas_tpu.field.scalar import Fr
    from jolt_atlas_tpu.transcripts import Blake2bTranscript

    nv = 16
    setup = DorySetup.for_num_vars(nv)
    rng = np.random.default_rng(0xD0E1)
    coeffs = [int(x) for x in rng.integers(0, 1 << 30, size=1 << nv)]
    com = DoryPC.commit(setup, coeffs)
    point = [Fr(int.from_bytes(rng.bytes(31), "little") % FR_MODULUS)
             for _ in range(nv)]
    from jolt_atlas_tpu.poly.mlpoly import MLPoly
    claim = MLPoly(ints=np.array(coeffs, dtype=np.int64)).evaluate(point)
    t = Blake2bTranscript(b"dory16")
    proof = DoryPC.open(setup, coeffs, point, t)
    tv = Blake2bTranscript(b"dory16")
    t0 = time.time()
    ok = DoryPC.verify(setup, com, point, claim, proof, tv)
    dt = time.time() - t0
    assert ok
    assert dt < 1.0, f"Dory 2^16 verify took {dt:.2f}s"
    # tamper: claim shift must fail
    tv2 = Blake2bTranscript(b"dory16")
    assert not DoryPC.verify(setup, com, point, claim + Fr.one(), proof, tv2)
