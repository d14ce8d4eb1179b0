"""Qwen2-style proving demo (reference analogue: examples/qwen.rs).

Loads `models/qwen/network.onnx` when `scripts/download_qwen.py` has run
(real Qwen2-0.5B weights, or its `--random` export); otherwise exports a
proportional random-weight slice on the fly (2 layers, dim 64, GQA 4/2
heads, rotary, SwiGLU — the same decomposition the full model proves),
then greedy-generates a few tokens with the quantized interpreter and
proves + verifies one forward pass.

    python examples/qwen_style.py [--seq 8] [--gen 4] [--scale 8]
"""

import argparse
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=8)
    ap.add_argument("--gen", type=int, default=4)
    ap.add_argument("--scale", type=int, default=8)
    ap.add_argument("--model", default=os.path.join(REPO, "models", "qwen",
                                                    "network.onnx"))
    args = ap.parse_args()

    from jolt_atlas_tpu.frontend.onnx_load import RunArgs, load_onnx
    from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
    from jolt_atlas_tpu.prover import AtlasProver
    from jolt_atlas_tpu.serde import deserialize_proof, serialize_proof
    from jolt_atlas_tpu.verifier import AtlasVerifier

    path = args.model
    if not os.path.exists(path):
        out = os.path.join(REPO, "models", "qwen_slice")
        path = os.path.join(out, "network.onnx")
        if not os.path.exists(path):
            print("no models/qwen/network.onnx — exporting a random slice "
                  "(run scripts/download_qwen.py for the real weights)")
            subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts", "download_qwen.py"),
                 "--random", "--layers", "2", "--dim", "64", "--heads",
                 "4", "--kv-heads", "2", "--ffn", "128", "--vocab", "512",
                 "--seq", str(args.seq), "--out", out],
                check=True)

    model = load_onnx(path, RunArgs(scale=args.scale))
    vocab = model.graph.nodes[model.graph.outputs[0]].output_dims[-1]
    print(f"model: {len(model.graph.nodes)} nodes, vocab {vocab}")

    rng = np.random.default_rng(7)
    toks = list(rng.integers(0, min(vocab, 512), size=args.seq))
    for _ in range(args.gen):
        logits = model.forward(
            [np.array(toks[-args.seq:], dtype=np.int32)])[0]
        toks.append(int(np.argmax(logits[-1])))
    print("greedy tokens:", toks)

    pp = AtlasPreprocessing.preprocess(model)
    t0 = time.time()
    proof, io = AtlasProver(pp).prove(
        [np.array(toks[:args.seq], dtype=np.int32)])
    blob = serialize_proof(proof)
    print(f"  prove: {time.time()-t0:.1f}s, proof {len(blob)/1024:.1f} KB")
    t0 = time.time()
    ok = AtlasVerifier(pp).verify(deserialize_proof(blob), io)
    print(f"  verify: {time.time()-t0:.1f}s -> {ok}")
    assert ok


if __name__ == "__main__":
    main()
