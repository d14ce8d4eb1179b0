"""BGE-style embedding demo: transformer encoder -> mean pooling ->
RMS-normalized sentence embedding, proven end to end.

Reference analogue: jolt-atlas-core/examples/bge.rs +
atlas-onnx-tracer/examples/bge_generate.rs (BGE embedding generation).

Usage: python examples/bge_style.py [--dim 32] [--seq 16] [--blocks 2]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--seq", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    from jolt_atlas_tpu.frontend import ModelBuilder
    from jolt_atlas_tpu.frontend.quantize import dequantize, quantize_tensor
    from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
    from jolt_atlas_tpu.prover import AtlasProver
    from jolt_atlas_tpu.verifier import AtlasVerifier
    from jolt_atlas_tpu.utils import profiling

    if args.trace:
        profiling.enable()

    rng = np.random.default_rng(11)
    scale = 8
    dim, seq, heads = args.dim, args.seq, args.heads
    b = ModelBuilder(scale=scale)
    emb = b.constant(quantize_tensor(rng.normal(size=(args.vocab, dim)) * 0.3,
                                     scale))
    pos = b.constant(quantize_tensor(rng.normal(size=(seq, dim)) * 0.1, scale))
    tok = b.input([seq])
    x = b.add(b.gather(emb, tok), pos)
    hd = dim // heads
    for _ in range(args.blocks):
        mos = b.mean_of_squares(x, [1])
        xn = b.mul(x, b.broadcast(b.rsqrt(mos), [seq, dim]))
        wq = b.constant(quantize_tensor(rng.normal(size=(dim, dim)) * 0.3, scale))
        wk = b.constant(quantize_tensor(rng.normal(size=(dim, dim)) * 0.3, scale))
        wv = b.constant(quantize_tensor(rng.normal(size=(dim, dim)) * 0.3, scale))
        qh = b.move_axis(b.reshape(b.matmul(xn, wq), [seq, heads, hd]), 1, 0)
        kh = b.move_axis(b.reshape(b.matmul(xn, wk), [seq, heads, hd]), 1, 0)
        vh = b.move_axis(b.reshape(b.matmul(xn, wv), [seq, heads, hd]), 1, 0)
        att = b.softmax_last_axis(b.einsum("hmk,hnk->hmn", [qh, kh]))
        y = b.reshape(b.move_axis(b.einsum("hmn,hnk->hmk", [att, vh]), 0, 1),
                      [seq, dim])
        x = b.add(x, y)
        w1 = b.constant(quantize_tensor(rng.normal(size=(dim, 2 * dim)) * 0.3, scale))
        w2 = b.constant(quantize_tensor(rng.normal(size=(2 * dim, dim)) * 0.3, scale))
        x = b.add(x, b.matmul(b.tanh(b.matmul(x, w1)), w2))
    # mean pooling over the sequence -> (1, dim), then RMS-normalize
    pooled = b.scalar_const_div(b.sum(x, [0]), seq)          # (1, dim)
    mos = b.mean_of_squares(pooled, [1])                     # (1, 1)
    embedding = b.mul(pooled, b.broadcast(b.rsqrt(mos), [1, dim]))
    b.output(embedding)
    model = b.build()
    print(f"encoder: {len(model.graph.nodes)} nodes -> {dim}-d embedding")

    toks = rng.integers(0, args.vocab, size=seq).astype(np.int32)
    e = dequantize(model.forward([toks])[0], scale)
    print("embedding norm (RMS-normalized):",
          round(float(np.sqrt((e ** 2).mean())), 3))

    pp = AtlasPreprocessing.preprocess(model)
    t0 = time.time()
    proof, io = AtlasProver(pp).prove([toks])
    print(f"prove: {time.time()-t0:.1f}s")
    ok = AtlasVerifier(pp).verify(proof, io)
    print("verify:", ok)
    if args.trace:
        print(profiling.report())
    assert ok


if __name__ == "__main__":
    main()
