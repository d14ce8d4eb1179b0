"""ZK sumcheck (Pedersen-committed rounds) + utility harness tests.

Reference: joltworks/src/subprotocols/sumcheck.rs:270-549 prove_zk /
ZkSumcheckProof; utils/counters.rs; utils/monitor.rs.
"""

import numpy as np
import pytest

from jolt_atlas_tpu.commitment.kzg import KZGSRS
from jolt_atlas_tpu.commitment.pedersen import PedersenGenerators
from jolt_atlas_tpu.field.scalar import Fr
from jolt_atlas_tpu.poly.mlpoly import MLPoly
from jolt_atlas_tpu.subprotocols.instances import (ProductSumcheckProver,
                                                   ProductSumcheckVerifier)
from jolt_atlas_tpu.subprotocols.sumcheck import SumcheckError
from jolt_atlas_tpu.subprotocols.zk_sumcheck import ZkSumcheck
from jolt_atlas_tpu.transcripts import Blake2bTranscript, KeccakTranscript

rng = np.random.default_rng(31)


@pytest.fixture(scope="module")
def gens():
    return PedersenGenerators.from_srs(KZGSRS.setup(64), 8)


def _product_instance():
    a = rng.integers(-50, 50, size=16).astype(np.int64)
    b = rng.integers(-50, 50, size=16).astype(np.int64)
    claim = Fr(int((a.astype(object) * b.astype(object)).sum()))
    return MLPoly(ints=a), MLPoly(ints=b), claim


class TestZkSumcheck:
    def test_roundtrip_and_lockstep(self, gens):
        pa, pb, claim = _product_instance()
        tp = Blake2bTranscript(b"zk")
        proof, r_p, final_p = ZkSumcheck.prove(
            ProductSumcheckProver([pa.clone(), pb.clone()], claim),
            gens, None, tp)
        tv = Blake2bTranscript(b"zk")
        r_v, final_v = ZkSumcheck.verify(
            proof, ProductSumcheckVerifier([pa, pb], claim), gens, None, tv)
        assert [x.v for x in r_p] == [x.v for x in r_v]
        assert final_p == final_v
        assert tp.state == tv.state
        # rounds are hidden: only commitments in the proof
        assert len(proof.round_commitments) == 4
        assert not hasattr(proof, "compressed_polys")

    def test_wrong_claim_rejected(self, gens):
        pa, pb, claim = _product_instance()
        proof, _, _ = ZkSumcheck.prove(
            ProductSumcheckProver([pa.clone(), pb.clone()], claim),
            gens, None, Blake2bTranscript(b"zk"))
        with pytest.raises(SumcheckError):
            ZkSumcheck.verify(
                proof, ProductSumcheckVerifier([pa, pb], claim + Fr.one()),
                gens, None, Blake2bTranscript(b"zk"))

    def test_tampered_response_rejected(self, gens):
        pa, pb, claim = _product_instance()
        proof, _, _ = ZkSumcheck.prove(
            ProductSumcheckProver([pa.clone(), pb.clone()], claim),
            gens, None, Blake2bTranscript(b"zk"))
        proof.responses[0][0] = proof.responses[0][0] + Fr.one()
        with pytest.raises(SumcheckError):
            ZkSumcheck.verify(
                proof, ProductSumcheckVerifier([pa, pb], claim),
                gens, None, Blake2bTranscript(b"zk"))

    def test_tampered_round_commitment_rejected(self, gens):
        pa, pb, claim = _product_instance()
        proof, _, _ = ZkSumcheck.prove(
            ProductSumcheckProver([pa.clone(), pb.clone()], claim),
            gens, None, Blake2bTranscript(b"zk"))
        proof.round_commitments[0] = proof.round_commitments[1]
        with pytest.raises(SumcheckError):
            ZkSumcheck.verify(
                proof, ProductSumcheckVerifier([pa, pb], claim),
                gens, None, Blake2bTranscript(b"zk"))


class TestKeccak:
    def test_ethereum_vectors(self):
        from jolt_atlas_tpu.transcripts.keccak import keccak256
        assert keccak256(b"").hex() == ("c5d2460186f7233c927e7db2dcc703c0"
                                        "e500b653ca82273b7bfad8045d85a470")
        assert keccak256(b"abc").hex() == ("4e03657aea45a94fc7d47ba826c8d667"
                                           "c0d1e6e33a64a036ec44f58fa12d6c45")

    def test_transcript_determinism(self):
        t1, t2 = KeccakTranscript(b"t"), KeccakTranscript(b"t")
        t1.append_scalar(Fr(42))
        t2.append_scalar(Fr(42))
        assert t1.challenge_scalar() == t2.challenge_scalar()


class TestUtils:
    def test_counters(self):
        from jolt_atlas_tpu.utils import counters
        counters.reset()
        a = counters.TrackedFr(3)
        _ = a * a + a
        got = counters.read()
        assert got["mul"] == 1 and got["add"] == 1
        assert "total" in counters.report()

    def test_monitor(self):
        from jolt_atlas_tpu.utils.monitor import MetricsMonitor
        with MetricsMonitor(interval=0.01) as m:
            _ = [i * i for i in range(200_000)]
        assert m.peak_rss_mb() > 1
        assert "wall" in m.report()

    def test_pretty_print(self):
        from examples.nanogpt_style import build_model
        from jolt_atlas_tpu.frontend.pretty import format_graph
        model = build_model(32, 8, 16, 1, 8, np.random.default_rng(0), heads=4)
        s = format_graph(model)
        assert "GatherSmall" in s and "(output)" in s and "Einsum" in s
