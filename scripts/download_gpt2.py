#!/usr/bin/env python3
"""Fetch GPT-2 (124M) weights from Hugging Face and emit a provable ONNX.

Reference analogue: scripts/download_gpt2.py (optimum-cli export). The
graph here is written with the in-repo ONNX protobuf writer
(frontend/onnx_proto.py) in the decomposition the frontend proves —
full LayerNorm (native LayerNormalization handler), per-head attention with a
constant causal Where mask, tanh-GELU, tied LM head — the same op class
as the reference's nanoGPT export (atlas-onnx-tracer/models/nanoGPT/
gen.py: LayerNorm + masked_fill(-10) + softmax + tanh gelu).

    python scripts/download_gpt2.py [--seq 16] [--out models/gpt2]
    python scripts/download_gpt2.py --random --layers 2 --dim 64 \
        --vocab 512 --seq 8        # offline: random weights, same graph

Real mode needs network access (transformers.from_pretrained) and saves
the tokenizer (vocab.json, merges.txt) next to network.onnx. `--random`
needs no network; tests/test_gpt2_onnx.py uses it to exercise the whole
export -> load -> trace -> prove pipeline in CI.
"""

import argparse
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from jolt_atlas_tpu.frontend.onnx_proto import (  # noqa: E402
    encode_attr_i, encode_attr_ints, encode_model, encode_node)


def random_weights(n_layer, n_embd, vocab, block_size, rng):
    def w(*shape, s=0.06):
        return (rng.normal(size=shape) * s).astype(np.float32)

    ws = {"wte": w(vocab, n_embd, s=0.1), "wpe": w(block_size, n_embd, s=0.05),
          "lnf_g": np.ones(n_embd, np.float32),
          "lnf_b": np.zeros(n_embd, np.float32)}
    for i in range(n_layer):
        ws[f"b{i}.ln1_g"] = np.ones(n_embd, np.float32)
        ws[f"b{i}.ln1_b"] = np.zeros(n_embd, np.float32)
        ws[f"b{i}.ln2_g"] = np.ones(n_embd, np.float32)
        ws[f"b{i}.ln2_b"] = np.zeros(n_embd, np.float32)
        ws[f"b{i}.attn_w"] = w(n_embd, 3 * n_embd)
        ws[f"b{i}.attn_b"] = np.zeros(3 * n_embd, np.float32)
        ws[f"b{i}.proj_w"] = w(n_embd, n_embd)
        ws[f"b{i}.proj_b"] = np.zeros(n_embd, np.float32)
        ws[f"b{i}.fc_w"] = w(n_embd, 4 * n_embd)
        ws[f"b{i}.fc_b"] = np.zeros(4 * n_embd, np.float32)
        ws[f"b{i}.out_w"] = w(4 * n_embd, n_embd)
        ws[f"b{i}.out_b"] = np.zeros(n_embd, np.float32)
    return ws


def hf_weights(n_layer):
    """transformers GPT2LMHeadModel state dict -> flat numpy weight map
    (HF Conv1D stores (in, out) — already right-multiplication layout)."""
    from transformers import GPT2LMHeadModel
    sd = GPT2LMHeadModel.from_pretrained("gpt2").state_dict()
    t = lambda k: sd["transformer." + k].numpy().astype(np.float32)
    ws = {"wte": t("wte.weight"), "wpe": t("wpe.weight"),
          "lnf_g": t("ln_f.weight"), "lnf_b": t("ln_f.bias")}
    for i in range(n_layer):
        p = f"h.{i}."
        ws[f"b{i}.ln1_g"] = t(p + "ln_1.weight")
        ws[f"b{i}.ln1_b"] = t(p + "ln_1.bias")
        ws[f"b{i}.ln2_g"] = t(p + "ln_2.weight")
        ws[f"b{i}.ln2_b"] = t(p + "ln_2.bias")
        ws[f"b{i}.attn_w"] = t(p + "attn.c_attn.weight")
        ws[f"b{i}.attn_b"] = t(p + "attn.c_attn.bias")
        ws[f"b{i}.proj_w"] = t(p + "attn.c_proj.weight")
        ws[f"b{i}.proj_b"] = t(p + "attn.c_proj.bias")
        ws[f"b{i}.fc_w"] = t(p + "mlp.c_fc.weight")
        ws[f"b{i}.fc_b"] = t(p + "mlp.c_fc.bias")
        ws[f"b{i}.out_w"] = t(p + "mlp.c_proj.weight")
        ws[f"b{i}.out_b"] = t(p + "mlp.c_proj.bias")
    return ws


def emit_graph(ws, n_layer, n_head, n_embd, seq):
    """ONNX nodes + initializers for a seq-token GPT-2 forward."""
    nodes, init = [], {}
    hs = n_embd // n_head

    def ln(x, g, b, out):
        # the frontend's LayerNormalization handler decomposes into the
        # fixed-point mean / MeanOfSquares / Rsqrt ops (onnx_load.py
        # _h_layernorm) — far less quantization drift than a generic
        # Sqrt+Div chain (measured cos 0.88 vs 0.999 at scale 2^12)
        nodes.append(encode_node("LayerNormalization", [x, g, b], [out],
                                 [encode_attr_i("axis", -1)]))

    init["wte"] = ws["wte"]
    init["wpe_s"] = ws["wpe"][:seq]
    # causal mask, multiplicatively: a*tril + (-10)*(1-tril) == the
    # reference's masked_fill(-10) (nanoGPT gen.py), with no bool tensors
    tril = np.tril(np.ones((seq, seq), np.float32))
    init["mask"] = tril
    init["negmask"] = (-10.0 * (1.0 - tril)).astype(np.float32)
    init["iscale"] = np.float32(1.0 / math.sqrt(hs))
    c = math.sqrt(2.0 / math.pi)
    init["g_c"] = np.float32(c)
    init["g_c3"] = np.float32(c * 0.044715)
    init["half"] = np.float32(0.5)
    init["one"] = np.float32(1.0)
    nodes.append(encode_node("Gather", ["wte", "idx"], ["emb"],
                             [encode_attr_i("axis", 0)]))
    nodes.append(encode_node("Add", ["emb", "wpe_s"], ["x0"]))
    x = "x0"
    for i in range(n_layer):
        p = f"b{i}."
        for k in ("ln1_g", "ln1_b", "ln2_g", "ln2_b", "attn_w", "attn_b",
                  "proj_w", "proj_b", "fc_w", "fc_b", "out_w", "out_b"):
            init[p + k] = ws[p + k]
        ln(x, p + "ln1_g", p + "ln1_b", p + "h")
        nodes.append(encode_node("MatMul", [p + "h", p + "attn_w"],
                                 [p + "qkv0"]))
        nodes.append(encode_node("Add", [p + "qkv0", p + "attn_b"],
                                 [p + "qkv"]))
        heads = []
        for h in range(n_head):
            hp = f"{p}h{h}."
            for nm, off in (("q", 0), ("k", n_embd), ("v", 2 * n_embd)):
                nodes.append(encode_node(
                    "Slice", [p + "qkv", hp + nm + ".st", hp + nm + ".en",
                              hp + nm + ".ax"], [hp + nm]))
                init[hp + nm + ".st"] = np.array([off + h * hs], np.int64)
                init[hp + nm + ".en"] = np.array([off + (h + 1) * hs],
                                                 np.int64)
                init[hp + nm + ".ax"] = np.array([1], np.int64)
            nodes.extend([
                encode_node("Transpose", [hp + "k"], [hp + "kt"],
                            [encode_attr_ints("perm", [1, 0])]),
                encode_node("MatMul", [hp + "q", hp + "kt"], [hp + "a0"]),
                encode_node("Mul", [hp + "a0", "iscale"], [hp + "a1"]),
                encode_node("Mul", [hp + "a1", "mask"], [hp + "amul"]),
                encode_node("Add", [hp + "amul", "negmask"], [hp + "am"]),
                encode_node("Softmax", [hp + "am"], [hp + "sm"],
                            [encode_attr_i("axis", -1)]),
                encode_node("MatMul", [hp + "sm", hp + "v"], [hp + "o"]),
            ])
            heads.append(hp + "o")
        nodes.append(encode_node("Concat", heads, [p + "cat"],
                                 [encode_attr_i("axis", 1)]))
        nodes.append(encode_node("MatMul", [p + "cat", p + "proj_w"],
                                 [p + "pr0"]))
        nodes.append(encode_node("Add", [p + "pr0", p + "proj_b"],
                                 [p + "pr"]))
        nodes.append(encode_node("Add", [x, p + "pr"], [p + "res1"]))
        ln(p + "res1", p + "ln2_g", p + "ln2_b", p + "h2")
        nodes.extend([
            encode_node("MatMul", [p + "h2", p + "fc_w"], [p + "g0"]),
            encode_node("Add", [p + "g0", p + "fc_b"], [p + "g"]),
            # tanh gelu: 0.5 g (1 + tanh(c g + c*0.044715 g^3))
            encode_node("Mul", [p + "g", p + "g"], [p + "g2"]),
            encode_node("Mul", [p + "g2", p + "g"], [p + "g3"]),
            encode_node("Mul", [p + "g3", "g_c3"], [p + "t1"]),
            encode_node("Mul", [p + "g", "g_c"], [p + "t0"]),
            encode_node("Add", [p + "t0", p + "t1"], [p + "t"]),
            encode_node("Tanh", [p + "t"], [p + "th"]),
            encode_node("Add", [p + "th", "one"], [p + "th1"]),
            encode_node("Mul", [p + "g", p + "th1"], [p + "gt"]),
            encode_node("Mul", [p + "gt", "half"], [p + "gelu"]),
            encode_node("MatMul", [p + "gelu", p + "out_w"], [p + "o0"]),
            encode_node("Add", [p + "o0", p + "out_b"], [p + "mo"]),
            encode_node("Add", [p + "res1", p + "mo"], [p + "res2"]),
        ])
        x = p + "res2"
    init["lnf_g"] = ws["lnf_g"]
    init["lnf_b"] = ws["lnf_b"]
    ln(x, "lnf_g", "lnf_b", "xf")
    init["wte_t"] = np.ascontiguousarray(ws["wte"].T)
    nodes.append(encode_node("MatMul", ["xf", "wte_t"], ["logits"]))
    vocab = ws["wte"].shape[0]
    return encode_model(nodes, init, [("idx", [seq])],
                        [("logits", [seq, vocab])])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(REPO, "models", "gpt2"))
    ap.add_argument("--random", action="store_true",
                    help="random weights (offline pipeline test)")
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--vocab", type=int, default=50257)
    ap.add_argument("--block", type=int, default=1024)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.random:
        ws = random_weights(args.layers, args.dim, args.vocab, args.block,
                            np.random.default_rng(7))
    else:
        ws = hf_weights(args.layers)
        from transformers import GPT2TokenizerFast
        GPT2TokenizerFast.from_pretrained("gpt2").save_vocabulary(args.out)
    blob = emit_graph(ws, args.layers, args.heads, args.dim, args.seq)
    path = os.path.join(args.out, "network.onnx")
    with open(path, "wb") as f:
        f.write(blob)
    print(f"wrote {path} ({os.path.getsize(path) / (1 << 20):.1f} MiB)")


if __name__ == "__main__":
    main()
