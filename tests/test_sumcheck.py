import random

import numpy as np

from jolt_atlas_tpu.field.constants import FR_MODULUS
from jolt_atlas_tpu.field.scalar import Fr
from jolt_atlas_tpu.poly import MLPoly, BindingOrder, UniPoly
from jolt_atlas_tpu.poly.eq import eq_evals, eq_eval_scalar
from jolt_atlas_tpu.subprotocols import Sumcheck, BatchedSumcheck
from jolt_atlas_tpu.subprotocols.sumcheck import SumcheckError
from jolt_atlas_tpu.subprotocols.instances import (
    ProductSumcheckProver,
    ProductSumcheckVerifier,
)
from jolt_atlas_tpu.transcripts import Blake2bTranscript

rng = random.Random(99)


def rand_poly(num_vars, small=True):
    n = 1 << num_vars
    if small:
        return MLPoly(ints=np.array([rng.randrange(-100, 100) for _ in range(n)],
                                    dtype=np.int64))
    return MLPoly.from_fr_list([Fr(rng.randrange(FR_MODULUS)) for _ in range(n)])


def brute_force_product_sum(polys):
    n = len(polys[0])
    total = Fr.zero()
    for i in range(n):
        term = Fr.one()
        for p in polys:
            term = term * p.get_coeff(i)
        total = total + term
    return total


class TestUniPoly:
    def test_interpolation_roundtrip(self):
        coeffs = [Fr(3), Fr(7), Fr(11)]
        p = UniPoly(coeffs)
        evals = [p.evaluate(Fr(i)) for i in range(3)]
        q = UniPoly.from_evals(evals)
        assert q.coeffs == coeffs

    def test_compress_hint(self):
        p = UniPoly([Fr(2), Fr(5), Fr(9), Fr(4)])
        claim = p.evaluate(Fr(0)) + p.evaluate(Fr(1))
        cp = p.compress()
        x = Fr(123456)
        assert cp.eval_from_hint(claim, x) == p.evaluate(x)


class TestMLPoly:
    def test_evaluate_matches_bind_chain(self):
        p = rand_poly(4)
        r = [Fr(rng.randrange(FR_MODULUS)) for _ in range(4)]
        want = p.clone().evaluate(r)
        q = p.clone()
        for ri in r:  # HighToLow binds variable 0 (MSB) first
            q.bind(ri, BindingOrder.HighToLow)
        assert q.final_claim() == want
        # LowToHigh binds LSB first -> same as evaluating reversed point
        q2 = p.clone()
        for ri in reversed(r):
            q2.bind(ri, BindingOrder.LowToHigh)
        assert q2.final_claim() == want

    def test_eq_evals_bigendian(self):
        r = [Fr(5), Fr(7)]
        vals = [int(x) for x in eq_evals(r)]
        one = Fr.one()
        # index 2 = binary 10 -> b0(MSB)=1, b1=0 -> r0 * (1 - r1)
        assert Fr(vals[2]) == r[0] * (one - r[1])
        assert Fr(vals[1]) == (one - r[0]) * r[1]
        # sum over hypercube = 1
        assert sum(vals) % FR_MODULUS == 1

    def test_eq_eval_scalar(self):
        x = [Fr(3), Fr(9)]
        vals = [int(v) for v in eq_evals(x)]
        assert Fr(vals[3]) == eq_eval_scalar(x, [Fr(1), Fr(1)])


class TestSumcheck:
    def _roundtrip(self, num_polys, num_vars, order):
        polys = [rand_poly(num_vars) for _ in range(num_polys)]
        claim = brute_force_product_sum(polys)
        prover = ProductSumcheckProver([p.clone() for p in polys], claim, order)
        t = Blake2bTranscript(b"test")
        proof, r_p = Sumcheck.prove(prover, None, t)
        verifier = ProductSumcheckVerifier(polys, claim, order)
        tv = Blake2bTranscript(b"test")
        tv.compare_to(t)
        r_v = Sumcheck.verify(proof, verifier, None, tv)
        assert [x.v for x in r_p] == [x.v for x in r_v]

    def test_degree1(self):
        self._roundtrip(1, 3, BindingOrder.HighToLow)

    def test_degree2(self):
        self._roundtrip(2, 4, BindingOrder.HighToLow)

    def test_degree3_lowtohigh(self):
        self._roundtrip(3, 3, BindingOrder.LowToHigh)

    def test_rejects_wrong_claim(self):
        polys = [rand_poly(3) for _ in range(2)]
        claim = brute_force_product_sum(polys)
        bad_claim = claim + Fr.one()
        prover = ProductSumcheckProver([p.clone() for p in polys], bad_claim)
        t = Blake2bTranscript(b"test")
        proof, _ = Sumcheck.prove(prover, None, t)
        verifier = ProductSumcheckVerifier(polys, bad_claim)
        tv = Blake2bTranscript(b"test")
        try:
            Sumcheck.verify(proof, verifier, None, tv)
            assert False, "should have rejected"
        except SumcheckError:
            pass

    def test_rejects_tampered_proof(self):
        polys = [rand_poly(3) for _ in range(2)]
        claim = brute_force_product_sum(polys)
        prover = ProductSumcheckProver([p.clone() for p in polys], claim)
        t = Blake2bTranscript(b"test")
        proof, _ = Sumcheck.prove(prover, None, t)
        proof.compressed_polys[1].coeffs_except_linear_term[0] = Fr(999999)
        verifier = ProductSumcheckVerifier(polys, claim)
        tv = Blake2bTranscript(b"test")
        try:
            Sumcheck.verify(proof, verifier, None, tv)
            assert False, "should have rejected"
        except SumcheckError:
            pass


class TestBatchedSumcheck:
    def test_unequal_rounds_batch(self):
        # one 2-var degree-2 instance + one 4-var degree-1 instance
        polys_a = [rand_poly(2) for _ in range(2)]
        polys_b = [rand_poly(4)]
        claim_a = brute_force_product_sum(polys_a)
        claim_b = brute_force_product_sum(polys_b)
        provers = [
            ProductSumcheckProver([p.clone() for p in polys_a], claim_a),
            ProductSumcheckProver([p.clone() for p in polys_b], claim_b),
        ]
        t = Blake2bTranscript(b"batch")
        proof, _ = BatchedSumcheck.prove(provers, None, t)
        verifiers = [
            ProductSumcheckVerifier(polys_a, claim_a),
            ProductSumcheckVerifier(polys_b, claim_b),
        ]
        tv = Blake2bTranscript(b"batch")
        tv.compare_to(t)
        BatchedSumcheck.verify(proof, verifiers, None, tv)

    def test_batch_rejects_tamper(self):
        polys_a = [rand_poly(3) for _ in range(2)]
        claim_a = brute_force_product_sum(polys_a)
        provers = [ProductSumcheckProver([p.clone() for p in polys_a], claim_a)]
        t = Blake2bTranscript(b"batch")
        proof, _ = BatchedSumcheck.prove(provers, None, t)
        proof.compressed_polys[0].coeffs_except_linear_term[-1] = Fr(1)
        verifiers = [ProductSumcheckVerifier(polys_a, claim_a + Fr.zero())]
        tv = Blake2bTranscript(b"batch")
        try:
            BatchedSumcheck.verify(proof, verifiers, None, tv)
            assert False
        except SumcheckError:
            pass

    def test_proof_serialization_roundtrip(self):
        polys = [rand_poly(3) for _ in range(2)]
        claim = brute_force_product_sum(polys)
        prover = ProductSumcheckProver([p.clone() for p in polys], claim)
        t = Blake2bTranscript(b"ser")
        proof, _ = Sumcheck.prove(prover, None, t)
        from jolt_atlas_tpu.subprotocols.sumcheck import SumcheckInstanceProof
        data = proof.serialize()
        back, off = SumcheckInstanceProof.deserialize(data)
        assert off == len(data)
        verifier = ProductSumcheckVerifier(polys, claim)
        tv = Blake2bTranscript(b"ser")
        Sumcheck.verify(back, verifier, None, tv)


class TestSparseBooleanity:
    """The sparse two-phase Booleanity schedule must emit byte-identical
    round messages to binding the dense (K, T) one-hot rows (it computes
    the same polynomial — subprotocols/onehot.py BooleanityProver)."""

    def _dense_reference(self, idx_arrays, K, r_b, gammas):
        # the pre-sparse implementation: dense one-hot rows through the
        # generic RowsInstance engine
        from jolt_atlas_tpu.subprotocols import onehot
        from jolt_atlas_tpu.subprotocols.sumcheck import (
            RowsInstance, SumcheckInstanceProver)
        from jolt_atlas_tpu.field.scalar import Fr

        class Dense(RowsInstance, SumcheckInstanceProver):
            def __init__(self):
                ras = [onehot.one_hot_poly(a, K=K) for a in idx_arrays]
                terms = []
                for d, gamma in enumerate(gammas):
                    terms.append((gamma, [d, d]))
                    terms.append((Fr.zero() - gamma, [d]))
                self.setup_rows(ras, terms, 3, eq_r=r_b)

            def num_rounds(self):
                return len(r_b)

            def degree(self):
                return 3

            def input_claim(self, accumulator):
                return Fr.zero()

            def compute_message(self, round, previous_claim):
                return self.rows_message(previous_claim)

            def ingest_challenge(self, r, round):
                self.rows_bind(r)

        return Dense()

    def test_messages_match_dense(self):
        import numpy as np
        from jolt_atlas_tpu.field.scalar import Fr
        from jolt_atlas_tpu.subprotocols import onehot
        from jolt_atlas_tpu.transcripts import Blake2bTranscript

        rng = np.random.default_rng(0xB001)
        for K, T, C in ((16, 64, 3), (8, 16, 1), (16, 4, 2)):
            idxs = [rng.integers(0, K, size=T).astype(np.int64)
                    for _ in range(C)]
            t = Blake2bTranscript(b"bool")
            gammas = t.challenge_vector(C)
            logK = K.bit_length() - 1
            logT = T.bit_length() - 1
            r_b = t.challenge_vector_optimized(logK + logT)
            sparse = onehot.BooleanityProver([None] * C, idxs, K, r_b, gammas)
            dense = self._dense_reference(idxs, K, r_b, gammas)
            prev_s = prev_d = Fr.zero()
            for rnd in range(logK + logT):
                ms = sparse.compute_message(rnd, prev_s)
                md = dense.compute_message(rnd, prev_d)
                assert [c.v for c in ms.coeffs] == [c.v for c in md.coeffs], \
                    f"round {rnd} (K={K}, T={T})"
                r = t.challenge_scalar_optimized()
                prev_s = ms.evaluate(r)
                prev_d = md.evaluate(r)
                sparse.ingest_challenge(r, rnd)
                dense.ingest_challenge(r, rnd)
            for d in range(C):
                assert sparse.row_final(d).v == dense.row_final(d).v
