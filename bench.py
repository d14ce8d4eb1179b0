"""Benchmark driver: prints ONE JSON line with the headline metric.

Current round-1 workload: full prove wall-clock of a quantized MLP
(matmul + bias-add + ReLU + matmul — the perceptron-class minimum slice)
through the complete pipeline (witness, commitments, IOP, batched opening,
HyperKZG). Baseline anchor: the reference's nanoGPT prove time (2.288 s on
an M3 MacBook, BASELINE.md) — a larger workload than this MLP; treat
`vs_baseline` as provisional until the model families match.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

NANOGPT_BASELINE_S = 2.288


def main():
    from jolt_atlas_tpu.frontend import ModelBuilder
    from jolt_atlas_tpu.frontend.quantize import quantize_tensor
    from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
    from jolt_atlas_tpu.prover import AtlasProver
    from jolt_atlas_tpu.verifier import AtlasVerifier

    rng = np.random.default_rng(1234)
    s = 8
    b = ModelBuilder(scale=s)
    x = b.input([4, 32])
    w1 = b.constant(quantize_tensor(rng.normal(size=(32, 64)) * 0.2, s))
    h = b.matmul(x, w1)
    bias = b.constant(quantize_tensor(rng.normal(size=(4, 64)) * 0.05, s))
    a = b.relu(b.add(h, bias))
    w2 = b.constant(quantize_tensor(rng.normal(size=(64, 16)) * 0.2, s))
    out = b.matmul(a, w2)
    b.output(out)
    model = b.build()
    xq = quantize_tensor(rng.normal(size=(4, 32)), s)

    pp = AtlasPreprocessing.preprocess(model)
    t0 = time.time()
    proof, io = AtlasProver(pp).prove([xq])
    prove_s = time.time() - t0
    ok = AtlasVerifier(pp).verify(proof, io)
    assert ok, "bench proof failed verification"

    print(json.dumps({
        "metric": "mlp_4x32x64x16_prove_wall_s",
        "value": round(prove_s, 3),
        "unit": "s",
        "vs_baseline": round(NANOGPT_BASELINE_S / prove_s, 3),
    }))


if __name__ == "__main__":
    main()
