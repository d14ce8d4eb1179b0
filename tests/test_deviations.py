"""Targeted adversarial tests for this repo's documented protocol deviations
(BASELINE.md "Protocol deviations"): chunk-indicator saturation/comparison
lookups, the point-grouped opening RLC, and chunked GatherLarge RaD.

Each test attacks the *specific* structure the deviation introduces — not
just generic proof-byte tampering — and requires verification to fail.
Reference adversarial model: jolt-atlas-core/src/onnx_proof/
malicious_prover.rs + soundness_tests.rs.
"""

import numpy as np
import pytest

from jolt_atlas_tpu.field.scalar import Fr
from jolt_atlas_tpu.frontend import ModelBuilder
from jolt_atlas_tpu.frontend.quantize import quantize_tensor
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
from jolt_atlas_tpu.prover import AtlasProver
from jolt_atlas_tpu.verifier import AtlasVerifier

rng = np.random.default_rng(1717)


def _prove(model, inputs, prover_cls=AtlasProver):
    pp = AtlasPreprocessing.preprocess(model)
    proof, io = prover_cls(pp).prove(inputs)
    return pp, proof, io


class _TraceTamperProver(AtlasProver):
    """Mutates one node's trace output elementwise before proving."""

    def __init__(self, pp, node_idx, mutate):
        super().__init__(pp)
        self._target = node_idx
        self._mutate = mutate

    def prove(self, inputs):
        model = self.pp.model
        real_trace = model.trace

        def tampered(ins):
            tr = real_trace(ins)
            tr.node_outputs[self._target] = self._mutate(
                tr.node_outputs[self._target].copy())
            return tr

        model.trace = tampered
        try:
            return super().prove(inputs)
        finally:
            model.trace = real_trace


class TestSatClampChunks:
    """Deviation 1: saturation proven via chunk-indicator products.

    A malicious prover claims an unsaturated (wrapped or shifted) matmul
    output; the SatClamp chunk relations must catch it."""

    def _sat_model(self):
        s = 8
        b = ModelBuilder(scale=s)
        x = b.input([2, 8])
        # large weights so the i64 accumulator exceeds the i32 saturation
        # range for some entries; the rescale output clamps
        w = b.constant((rng.integers(-3, 4, size=(8, 8), dtype=np.int64)
                        * (1 << 24)).astype(np.int64))
        b.output(b.matmul(x, w))
        model = b.build()
        xs = (rng.integers(-4, 5, size=(2, 8)) * (1 << 12)).astype(np.int64)
        return model, [xs]

    def test_honest_saturating_matmul(self):
        model, inputs = self._sat_model()
        pp, proof, io = _prove(model, inputs)
        assert AtlasVerifier(pp).verify(proof, io)

    def test_unsaturated_output_rejected(self):
        """Report the true (wrapped) value where the honest output clamps."""
        model, inputs = self._sat_model()
        out_idx = model.graph.outputs[0]

        def unclamp(arr):
            a = arr.astype(np.int64)
            a[a == np.iinfo(np.int32).max] += 7
            a[a == np.iinfo(np.int32).min] -= 7
            return a

        pp = AtlasPreprocessing.preprocess(model)
        try:
            proof, io = _TraceTamperProver(pp, out_idx, unclamp).prove(inputs)
        except Exception:
            return  # loud prover-side rejection is acceptable
        ok = AtlasVerifier(pp).verify(proof, io)
        assert not ok, "unsaturated matmul output slipped past SatClamp"


class TestOpeningRLC:
    """Deviation 2: point-grouped gamma-RLC of opening claims.

    gamma is drawn after all claims are absorbed, so no fixed tampering of
    two same-point claims can cancel in the RLC."""

    def _setup(self):
        b = ModelBuilder()
        x = b.input([8])
        c = b.constant(np.arange(8, dtype=np.int32) - 3)
        y = b.add(x, c)
        z = b.relu(y)
        b.output(b.add(z, z))
        model = b.build()
        xs = np.array([1, -2, 3, -4, 5, -6, 7, -8], dtype=np.int32)
        return _prove(model, [xs])

    def test_paired_claim_cancellation_rejected(self):
        """claim_a += d, claim_b -= d for two claims: the gamma-RLC makes
        the tampered pair fail except with probability ~1/|Fr|."""
        pp, proof, io = self._setup()
        keys = sorted(proof.opening_claims)
        assert len(keys) >= 2
        d = Fr(987654321)
        proof.opening_claims[keys[0]] = proof.opening_claims[keys[0]] + d
        proof.opening_claims[keys[1]] = proof.opening_claims[keys[1]] - d
        assert not AtlasVerifier(pp).verify(proof, io)

    def test_all_claims_scaled_rejected(self):
        """Scaling every claim by the same factor (an attack that survives
        naive un-bound RLC schemes) must fail."""
        pp, proof, io = self._setup()
        two = Fr(2)
        for k in proof.opening_claims:
            proof.opening_claims[k] = proof.opening_claims[k] * two
        assert not AtlasVerifier(pp).verify(proof, io)


class TestGatherLargeRaD:
    """Chunked GatherLarge: tampered gather results must be caught by the
    chunked RaD + RaVirtualization relations."""

    def _gather_model(self, V=1 << 13, d=8, T=16):
        b = ModelBuilder()
        idx = b.input([T])
        table = b.constant(
            rng.integers(-(1 << 10), 1 << 10, size=(V, d)).astype(np.int32))
        b.output(b.gather(table, idx))
        model = b.build()
        ids = rng.integers(0, V, size=T).astype(np.int32)
        return model, [ids]

    def test_honest_gather_large(self):
        model, inputs = self._gather_model()
        pp, proof, io = _prove(model, inputs)
        assert AtlasVerifier(pp).verify(proof, io)

    def test_swapped_row_rejected(self):
        """Return the embedding of a *different* row for one position."""
        model, inputs = self._gather_model()
        out_idx = model.graph.outputs[0]

        def swap(arr):
            a = arr.copy()
            a[0] = a[1]
            return a

        pp = AtlasPreprocessing.preprocess(model)
        try:
            proof, io = _TraceTamperProver(pp, out_idx, swap).prove(inputs)
        except Exception:
            return
        assert not AtlasVerifier(pp).verify(proof, io)


class TestComparisonChunks:
    """LtPair/EqPair chunk comparisons (variable-operand Div bounds)."""

    def test_div_wrong_quotient_rejected(self):
        b = ModelBuilder(scale=6)
        x = b.input([8])
        y = b.input([8])
        b.output(b.div(x, y))
        model = b.build()
        xs = rng.integers(-500, 500, size=8).astype(np.int32)
        ys = (rng.integers(1, 40, size=8) * (1 << 6)).astype(np.int32)
        out_idx = model.graph.outputs[0]

        def bump(arr):
            a = arr.copy()
            a.flat[0] += 1  # off-by-one quotient: remainder bound breaks
            return a

        pp = AtlasPreprocessing.preprocess(model)
        proof, io = AtlasProver(pp).prove([xs, ys])
        assert AtlasVerifier(pp).verify(proof, io)
        try:
            proof2, io2 = _TraceTamperProver(pp, out_idx, bump).prove([xs, ys])
        except Exception:
            return
        assert not AtlasVerifier(pp).verify(proof2, io2)
