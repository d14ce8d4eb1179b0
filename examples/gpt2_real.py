"""Real-weight GPT-2: greedy decoding + one proven inference step.

Reference analogue: jolt-atlas-core/examples/gpt2.rs (proves GPT-2 125M at
seq 16) + atlas-onnx-tracer/examples/gpt2_generate.rs (HF tokenizers,
quantized-vs-float side-by-side generation).

Needs `models/gpt2/network.onnx` (+ vocab.json / merges.txt), produced by

    python scripts/download_gpt2.py --seq 16

on a machine with network access. Then:

    python examples/gpt2_real.py --prompt "The meaning of life is" \
        [--gen 8] [--prove]

Decodes greedily with the quantized interpreter, reports per-step drift
vs the f64 shadow execution (frontend/shadow.py), and with --prove runs
the full prove+verify pipeline on the final step.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jolt_atlas_tpu.frontend.onnx_load import RunArgs, load_onnx  # noqa: E402

MODEL_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "models", "gpt2")


def load_tokenizer(model_dir: str):
    from tokenizers import ByteLevelBPETokenizer
    return ByteLevelBPETokenizer(os.path.join(model_dir, "vocab.json"),
                                 os.path.join(model_dir, "merges.txt"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=MODEL_DIR)
    ap.add_argument("--prompt", default="The meaning of life is")
    ap.add_argument("--gen", type=int, default=8)
    ap.add_argument("--prove", action="store_true")
    ap.add_argument("--scale", type=int, default=12)
    args = ap.parse_args(argv)

    onnx_path = os.path.join(args.model_dir, "network.onnx")
    if not os.path.exists(onnx_path):
        print(f"{onnx_path} not found.\nRun scripts/download_gpt2.py on a "
              "machine with network access first.")
        return 1

    model = load_onnx(onnx_path, RunArgs(scale=args.scale))
    seq = model.graph.original_input_dims[0][0]
    print(f"model: {len(model.graph.nodes)} nodes, seq {seq}")

    tok = load_tokenizer(args.model_dir)
    ids = tok.encode(args.prompt).ids
    if len(ids) > seq:
        ids = ids[-seq:]

    from jolt_atlas_tpu.frontend.shadow import shadow_trace
    toks = list(ids)
    for step in range(args.gen):
        window = ([0] * (seq - len(toks)) + toks)[-seq:]
        x = np.asarray(window, dtype=np.int32)
        trace = model.trace([x])
        logits = trace.node_outputs[model.graph.outputs[0]]
        pos = min(len(toks), seq) - 1
        nxt = int(np.argmax(logits.reshape(seq, -1)[pos][: tok.get_vocab_size()]))
        sh = shadow_trace(model, [x])
        out_idx = model.graph.outputs[0]
        drift = next(m for m in sh if m.node_idx == out_idx)
        print(f"step {step}: next={nxt!r} {tok.decode([nxt])!r} "
              f"cos={drift.cosine_similarity:.4f} "
              f"maxerr={drift.max_abs_err:.3f}")
        toks.append(nxt)
    print("decoded:", tok.decode(toks))

    if args.prove:
        from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
        from jolt_atlas_tpu.prover import AtlasProver
        from jolt_atlas_tpu.verifier import AtlasVerifier
        window = ([0] * (seq - len(toks)) + toks)[-seq:]
        x = np.asarray(window, dtype=np.int32)
        t0 = time.time()
        pp = AtlasPreprocessing.preprocess(model)
        print(f"setup: {time.time() - t0:.1f}s")
        t0 = time.time()
        proof, io = AtlasProver(pp).prove([x])
        print(f"prove: {time.time() - t0:.1f}s")
        t0 = time.time()
        ok = AtlasVerifier(pp).verify(proof, io)
        print(f"verify: {time.time() - t0:.1f}s -> {ok}")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
