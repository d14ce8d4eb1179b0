"""Malicious-prover soundness tests: corrupt the execution trace at an
INTERMEDIATE node (the public io stays untouched) and require verification
to fail.

Reference: jolt-atlas-core/src/onnx_proof/malicious_prover.rs and
ops/malicious_sub.rs — the reference's adversarial harness mutates witness
data between witness generation and proving.
"""

import numpy as np
import pytest

from jolt_atlas_tpu.frontend import ModelBuilder
from jolt_atlas_tpu.frontend.quantize import quantize_tensor
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
from jolt_atlas_tpu.prover import AtlasProver
from jolt_atlas_tpu.verifier import AtlasVerifier

rng = np.random.default_rng(99)


def _mlp_model():
    s = 8
    b = ModelBuilder(scale=s)
    x = b.input([4, 8])
    w1 = b.constant(quantize_tensor(rng.normal(size=(8, 16)) * 0.4, s))
    h = b.relu(b.matmul(x, w1))
    w2 = b.constant(quantize_tensor(rng.normal(size=(16, 8)) * 0.4, s))
    b.output(b.matmul(h, w2))
    return b.build(), [quantize_tensor(rng.normal(size=(4, 8)), s)]


class _MaliciousProver(AtlasProver):
    """Corrupts one intermediate node's trace output before proving."""

    def __init__(self, pp, node_idx, delta):
        super().__init__(pp)
        self._target = node_idx
        self._delta = delta

    def prove(self, inputs):
        model = self.pp.model
        real_trace = model.trace

        def tampered_trace(ins):
            tr = real_trace(ins)
            out = tr.node_outputs[self._target].copy()
            out.flat[0] += self._delta
            tr.node_outputs[self._target] = out
            return tr

        model.trace = tampered_trace
        try:
            return super().prove(inputs)
        finally:
            model.trace = real_trace


def _intermediate_nodes(model):
    from jolt_atlas_tpu.frontend import ops as OPS
    out = []
    for n in model.graph.sorted_nodes():
        if isinstance(n.operator, (OPS.Input, OPS.Constant)):
            continue
        if n.idx in model.graph.outputs:
            continue
        out.append(n.idx)
    return out


class TestMaliciousProver:
    def test_tampered_intermediate_fails(self):
        model, inputs = _mlp_model()
        pp = AtlasPreprocessing.preprocess(model)
        targets = _intermediate_nodes(model)
        assert targets, "model needs intermediate nodes"
        for target in targets:
            try:
                proof, io = _MaliciousProver(pp, target, 3).prove(inputs)
            except Exception:
                continue  # prover crashed on inconsistent witness: fine
            assert not AtlasVerifier(pp).verify(proof, io), \
                f"tampered node {target} still verified"

    def test_tampered_relu_output_fails(self):
        """Flip a ReLU output sign (classic malicious_sub-style mutation)."""
        s = 8
        b = ModelBuilder(scale=s)
        x = b.input([8])
        r = b.relu(x)
        b.output(b.add(r, r))
        model = b.build()
        inputs = [quantize_tensor(rng.normal(size=8), s)]
        pp = AtlasPreprocessing.preprocess(model)
        relu_idx = 1
        try:
            proof, io = _MaliciousProver(pp, relu_idx, -17).prove(inputs)
        except Exception:
            return
        assert not AtlasVerifier(pp).verify(proof, io)

    def test_honest_prover_still_passes(self):
        model, inputs = _mlp_model()
        pp = AtlasPreprocessing.preprocess(model)
        proof, io = AtlasProver(pp).prove(inputs)
        assert AtlasVerifier(pp).verify(proof, io)
