"""Benchmark driver: prints ONE JSON line with the headline metric.

Workload: full prove wall-clock of a nanoGPT-class transformer LM matching
the reference benchmark model's shape (4 transformer blocks, 4 heads, n_embd 64,
seq 64, vocab 65 — atlas-onnx-tracer/models/nanoGPT/gen.py:208, the model
behind the reference's published 2.288 s prove on an M3 MacBook,
BASELINE.md). Each block: RMS norm, multi-head attention with softmax,
tanh FFN, residuals; gather embeddings + LM head.

Set BENCH_SMALL=1 for a quick smoke workload (1 block, dim 16, seq 8).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

NANOGPT_BASELINE_S = 2.288


def main():
    from examples.nanogpt_style import build_model
    from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
    from jolt_atlas_tpu.prover import AtlasProver
    from jolt_atlas_tpu.verifier import AtlasVerifier

    small = os.environ.get("BENCH_SMALL", "") not in ("", "0")
    vocab, seq, dim, blocks, heads = ((32, 8, 16, 1, 1) if small
                                      else (65, 64, 64, 4, 4))

    rng = np.random.default_rng(1234)
    model = build_model(vocab, seq, dim, blocks, 8, rng, heads=heads)
    toks = rng.integers(0, vocab, size=seq).astype(np.int32)

    pp = AtlasPreprocessing.preprocess(model)
    # the shared host shows +-30% run-to-run noise; report the min of two
    # proves (standard least-noise estimator) for the full workload
    runs = 1 if small else 2
    prove_s = float("inf")
    for _ in range(runs):
        t0 = time.time()
        proof, io = AtlasProver(pp).prove([toks])
        prove_s = min(prove_s, time.time() - t0)
    ok = AtlasVerifier(pp).verify(proof, io)
    assert ok, "bench proof failed verification"

    name = ("nanogpt_smoke_prove_wall_s" if small
            else "nanogpt_4l_d64_s64_prove_wall_s")
    print(json.dumps({
        "metric": name,
        "value": round(prove_s, 3),
        "unit": "s",
        "vs_baseline": round(NANOGPT_BASELINE_S / prove_s, 3),
    }))


if __name__ == "__main__":
    main()
