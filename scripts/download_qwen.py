#!/usr/bin/env python3
"""Fetch Qwen2-0.5B weights from Hugging Face and emit a provable ONNX.

Reference analogue: scripts/download_qwen.py (optimum-cli export of
Qwen2-0.5B without KV-cache). The graph here is written with the in-repo
ONNX protobuf writer (frontend/onnx_proto.py) in the decomposition the
frontend proves: RMSNorm as a Pow/ReduceMean/Sqrt/Div chain, rotary
position embeddings as CONSTANT cos/sin tensors (seq is fixed at export,
so the rotation is elementwise Mul/Add over half-slices — no runtime
trig), grouped-query attention with KV heads repeated by Concat, and
SwiGLU as Mul(Sigmoid) — all inside the 33-op proof vocabulary.

    python scripts/download_qwen.py [--seq 16] [--out models/qwen]
    python scripts/download_qwen.py --random --layers 2 --dim 64 \
        --heads 4 --kv-heads 2 --ffn 128 --vocab 512 --seq 8   # offline

Real mode needs network access (transformers.from_pretrained) and saves
the tokenizer next to network.onnx. `--random` needs no network;
tests/test_qwen_bge_onnx.py uses it to exercise export -> load -> trace
-> prove in CI.
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


def random_weights(n_layer, dim, n_heads, n_kv, ffn, vocab, rng):
    hd = dim // n_heads

    def w(*shape, s=None):
        s = s if s is not None else 0.6 / math.sqrt(shape[0])
        return (rng.normal(size=shape) * s).astype(np.float32)

    ws = {"wte": w(vocab, dim, s=0.25), "lnf_g": np.ones(dim, np.float32)}
    for i in range(n_layer):
        p = f"b{i}."
        ws[p + "ln1_g"] = np.ones(dim, np.float32)
        ws[p + "ln2_g"] = np.ones(dim, np.float32)
        ws[p + "wq"] = w(dim, n_heads * hd)
        ws[p + "bq"] = np.zeros(n_heads * hd, np.float32)
        ws[p + "wk"] = w(dim, n_kv * hd)
        ws[p + "bk"] = np.zeros(n_kv * hd, np.float32)
        ws[p + "wv"] = w(dim, n_kv * hd)
        ws[p + "bv"] = np.zeros(n_kv * hd, np.float32)
        ws[p + "wo"] = w(n_heads * hd, dim)
        ws[p + "wgate"] = w(dim, ffn)
        ws[p + "wup"] = w(dim, ffn)
        ws[p + "wdown"] = w(ffn, dim)
    return ws


def hf_weights(n_layer):
    """transformers Qwen2ForCausalLM state dict -> flat numpy weight map
    (torch Linear stores (out, in); transpose to right-multiplication)."""
    from transformers import AutoModelForCausalLM
    sd = AutoModelForCausalLM.from_pretrained("Qwen/Qwen2-0.5B").state_dict()
    t = lambda k: sd["model." + k].numpy().astype(np.float32)
    lin = lambda k: np.ascontiguousarray(t(k).T)
    ws = {"wte": t("embed_tokens.weight"), "lnf_g": t("norm.weight")}
    for i in range(n_layer):
        p, hp = f"b{i}.", f"layers.{i}."
        ws[p + "ln1_g"] = t(hp + "input_layernorm.weight")
        ws[p + "ln2_g"] = t(hp + "post_attention_layernorm.weight")
        ws[p + "wq"] = lin(hp + "self_attn.q_proj.weight")
        ws[p + "bq"] = t(hp + "self_attn.q_proj.bias")
        ws[p + "wk"] = lin(hp + "self_attn.k_proj.weight")
        ws[p + "bk"] = t(hp + "self_attn.k_proj.bias")
        ws[p + "wv"] = lin(hp + "self_attn.v_proj.weight")
        ws[p + "bv"] = t(hp + "self_attn.v_proj.bias")
        ws[p + "wo"] = lin(hp + "self_attn.o_proj.weight")
        ws[p + "wgate"] = lin(hp + "mlp.gate_proj.weight")
        ws[p + "wup"] = lin(hp + "mlp.up_proj.weight")
        ws[p + "wdown"] = lin(hp + "mlp.down_proj.weight")
    return ws


def _rope_tables(seq, hd, base=1000000.0):
    """Qwen2 rotary cos/sin as (seq, hd) constants (half-split layout)."""
    inv = 1.0 / (base ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    ang = np.outer(np.arange(seq, dtype=np.float64), inv)   # (seq, hd/2)
    cos = np.concatenate([np.cos(ang), np.cos(ang)], axis=1)
    sin = np.concatenate([np.sin(ang), np.sin(ang)], axis=1)
    return cos.astype(np.float32), sin.astype(np.float32)


def emit_graph(ws, n_layer, n_heads, n_kv, dim, ffn, seq):
    nodes, init = [], {}
    hd = dim // n_heads
    group = n_heads // n_kv
    cos, sin = _rope_tables(seq, hd)
    init["rcos"], init["rsin"] = cos, sin

    def rms(x, g, out):
        # x / sqrt(mean(x^2) + eps) * g — Pow/ReduceMean/Sqrt proven via
        # square / scalar-const-div / rsqrt advice (onnx_load handlers)
        nodes.extend([
            encode_node("Pow", [x, "two"], [out + ".p2"]),
            encode_node("ReduceMean", [out + ".p2"], [out + ".ms"],
                        [encode_attr_ints("axes", [-1]),
                         encode_attr_i("keepdims", 1)]),
            encode_node("Add", [out + ".ms", "rms_eps"], [out + ".mse"]),
            encode_node("Sqrt", [out + ".mse"], [out + ".rms"]),
            encode_node("Div", [x, out + ".rms"], [out + ".n"]),
            encode_node("Mul", [out + ".n", g], [out]),
        ])

    def slice_cols(src, name, lo, hi):
        nodes.append(encode_node(
            "Slice", [src, name + ".st", name + ".en", name + ".ax"],
            [name]))
        init[name + ".st"] = np.array([lo], np.int64)
        init[name + ".en"] = np.array([hi], np.int64)
        init[name + ".ax"] = np.array([1], np.int64)

    def rope(src, out):
        # src * cos + rotate_half(src) * sin;
        # rotate_half(v) = concat(-v[:, hd/2:], v[:, :hd/2])
        slice_cols(src, out + ".lo", 0, hd // 2)
        slice_cols(src, out + ".hi", hd // 2, hd)
        nodes.extend([
            encode_node("Neg", [out + ".hi"], [out + ".nhi"]),
            encode_node("Concat", [out + ".nhi", out + ".lo"],
                        [out + ".rot"], [encode_attr_i("axis", 1)]),
            encode_node("Mul", [src, "rcos"], [out + ".c"]),
            encode_node("Mul", [out + ".rot", "rsin"], [out + ".s"]),
            encode_node("Add", [out + ".c", out + ".s"], [out]),
        ])

    init["two"] = np.float32(2.0)
    init["rms_eps"] = np.float32(1e-6)
    tril = np.tril(np.ones((seq, seq), np.float32))
    init["mask"] = tril
    init["negmask"] = (-10.0 * (1.0 - tril)).astype(np.float32)
    init["iscale"] = np.float32(1.0 / math.sqrt(hd))
    init["wte"] = ws["wte"]
    nodes.append(encode_node("Gather", ["wte", "idx"], ["x0"],
                             [encode_attr_i("axis", 0)]))
    x = "x0"
    for i in range(n_layer):
        p = f"b{i}."
        for k in ("ln1_g", "ln2_g", "wq", "bq", "wk", "bk", "wv", "bv",
                  "wo", "wgate", "wup", "wdown"):
            init[p + k] = ws[p + k]
        rms(x, p + "ln1_g", p + "h")
        for nm in ("q", "k", "v"):
            nodes.extend([
                encode_node("MatMul", [p + "h", p + "w" + nm],
                            [p + nm + "0"]),
                encode_node("Add", [p + nm + "0", p + "b" + nm], [p + nm]),
            ])
        heads = []
        for h in range(n_heads):
            hp = f"{p}h{h}."
            kv = h // group
            slice_cols(p + "q", hp + "q", h * hd, (h + 1) * hd)
            slice_cols(p + "k", hp + "k", kv * hd, (kv + 1) * hd)
            slice_cols(p + "v", hp + "v", kv * hd, (kv + 1) * hd)
            rope(hp + "q", hp + "qr")
            rope(hp + "k", hp + "kr")
            nodes.extend([
                encode_node("Transpose", [hp + "kr"], [hp + "kt"],
                            [encode_attr_ints("perm", [1, 0])]),
                encode_node("MatMul", [hp + "qr", hp + "kt"], [hp + "a0"]),
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
        nodes.append(encode_node("MatMul", [p + "cat", p + "wo"],
                                 [p + "pr"]))
        nodes.append(encode_node("Add", [x, p + "pr"], [p + "res1"]))
        rms(p + "res1", p + "ln2_g", p + "h2")
        nodes.extend([
            # SwiGLU: silu(h2 @ wgate) * (h2 @ wup) @ wdown
            encode_node("MatMul", [p + "h2", p + "wgate"], [p + "g"]),
            encode_node("Sigmoid", [p + "g"], [p + "gs"]),
            encode_node("Mul", [p + "g", p + "gs"], [p + "silu"]),
            encode_node("MatMul", [p + "h2", p + "wup"], [p + "u"]),
            encode_node("Mul", [p + "silu", p + "u"], [p + "gu"]),
            encode_node("MatMul", [p + "gu", p + "wdown"], [p + "mo"]),
            encode_node("Add", [p + "res1", p + "mo"], [p + "res2"]),
        ])
        x = p + "res2"
    init["lnf_g"] = ws["lnf_g"]
    rms(x, "lnf_g", "xf")
    init["wte_t"] = np.ascontiguousarray(ws["wte"].T)  # tied LM head
    nodes.append(encode_node("MatMul", ["xf", "wte_t"], ["logits"]))
    vocab = ws["wte"].shape[0]
    return encode_model(nodes, init, [("idx", [seq])],
                        [("logits", [seq, vocab])])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "models", "qwen"))
    ap.add_argument("--seq", type=int, default=16)
    ap.add_argument("--random", action="store_true",
                    help="random weights, no network (CI / offline)")
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--dim", type=int, default=896)
    ap.add_argument("--heads", type=int, default=14)
    ap.add_argument("--kv-heads", type=int, default=2)
    ap.add_argument("--ffn", type=int, default=4864)
    ap.add_argument("--vocab", type=int, default=151936)
    args = ap.parse_args()

    rng = np.random.default_rng(17)
    if args.random:
        ws = random_weights(args.layers, args.dim, args.heads,
                            args.kv_heads, args.ffn, args.vocab, rng)
    else:
        args.layers, args.dim = 24, 896
        args.heads, args.kv_heads, args.ffn = 14, 2, 4864
        ws = hf_weights(args.layers)
        from transformers import AutoTokenizer
        AutoTokenizer.from_pretrained("Qwen/Qwen2-0.5B").save_pretrained(
            args.out)
    blob = emit_graph(ws, args.layers, args.heads, args.kv_heads,
                      args.dim, args.ffn, args.seq)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "network.onnx")
    with open(path, "wb") as f:
        f.write(blob)
    print(f"wrote {path} ({len(blob) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
