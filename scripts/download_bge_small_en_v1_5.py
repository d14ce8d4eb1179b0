#!/usr/bin/env python3
"""Fetch BAAI/bge-small-en-v1.5 weights and emit a provable ONNX.

Reference analogue: scripts/download_bge_small_en_v1_5.py (optimum-cli
export). The graph here is written with the in-repo ONNX protobuf writer
(frontend/onnx_proto.py) in the decomposition the frontend proves: BERT
embeddings (word + position + a constant token-type row), full
LayerNormalization (native handler), bidirectional multi-head attention
(no causal mask), exact erf GELU (the Erf teleport op), and a final
CLS-token slice — the [CLS] embedding is BGE's sentence vector
(normalization happens caller-side, as in the reference example).

    python scripts/download_bge_small_en_v1_5.py [--seq 16]
    python scripts/download_bge_small_en_v1_5.py --random --layers 2 \
        --dim 64 --heads 4 --ffn 128 --vocab 512 --seq 8       # offline

Real mode needs network access; `--random` needs none and drives the
export -> load -> trace -> prove CI test (tests/test_qwen_bge_onnx.py).
"""

import argparse
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from jolt_atlas_tpu.frontend.onnx_proto import (  # noqa: E402
    encode_attr_f, encode_attr_i, encode_attr_ints, encode_model,
    encode_node)

MODEL_ID = "BAAI/bge-small-en-v1.5"


def random_weights(n_layer, dim, ffn, vocab, seq, rng):
    def w(*shape, s=None):
        s = s if s is not None else 0.6 / math.sqrt(shape[0])
        return (rng.normal(size=shape) * s).astype(np.float32)

    ws = {"wte": w(vocab, dim, s=0.25), "wpe": w(seq, dim, s=0.1),
          "wtype": w(1, dim, s=0.02)[0],
          "emb_ln_g": np.ones(dim, np.float32),
          "emb_ln_b": np.zeros(dim, np.float32)}
    for i in range(n_layer):
        p = f"b{i}."
        for nm in ("wq", "wk", "wv", "wo"):
            ws[p + nm] = w(dim, dim)
            ws[p + nm[1:] + "_b"] = np.zeros(dim, np.float32)
        ws[p + "ln1_g"] = np.ones(dim, np.float32)
        ws[p + "ln1_b"] = np.zeros(dim, np.float32)
        ws[p + "ln2_g"] = np.ones(dim, np.float32)
        ws[p + "ln2_b"] = np.zeros(dim, np.float32)
        ws[p + "wfc"] = w(dim, ffn)
        ws[p + "fc_b"] = np.zeros(ffn, np.float32)
        ws[p + "wout"] = w(ffn, dim)
        ws[p + "out_b"] = np.zeros(dim, np.float32)
    return ws


def hf_weights(n_layer, seq):
    """transformers BertModel state dict -> flat numpy weight map."""
    from transformers import AutoModel
    sd = AutoModel.from_pretrained(MODEL_ID).state_dict()
    t = lambda k: sd[k].numpy().astype(np.float32)
    lin = lambda k: np.ascontiguousarray(t(k).T)
    ws = {
        "wte": t("embeddings.word_embeddings.weight"),
        "wpe": t("embeddings.position_embeddings.weight")[:seq],
        "wtype": t("embeddings.token_type_embeddings.weight")[0],
        "emb_ln_g": t("embeddings.LayerNorm.weight"),
        "emb_ln_b": t("embeddings.LayerNorm.bias"),
    }
    for i in range(n_layer):
        p, hp = f"b{i}.", f"encoder.layer.{i}."
        ws[p + "wq"] = lin(hp + "attention.self.query.weight")
        ws[p + "q_b"] = t(hp + "attention.self.query.bias")
        ws[p + "wk"] = lin(hp + "attention.self.key.weight")
        ws[p + "k_b"] = t(hp + "attention.self.key.bias")
        ws[p + "wv"] = lin(hp + "attention.self.value.weight")
        ws[p + "v_b"] = t(hp + "attention.self.value.bias")
        ws[p + "wo"] = lin(hp + "attention.output.dense.weight")
        ws[p + "o_b"] = t(hp + "attention.output.dense.bias")
        ws[p + "ln1_g"] = t(hp + "attention.output.LayerNorm.weight")
        ws[p + "ln1_b"] = t(hp + "attention.output.LayerNorm.bias")
        ws[p + "wfc"] = lin(hp + "intermediate.dense.weight")
        ws[p + "fc_b"] = t(hp + "intermediate.dense.bias")
        ws[p + "wout"] = lin(hp + "output.dense.weight")
        ws[p + "out_b"] = t(hp + "output.dense.bias")
        ws[p + "ln2_g"] = t(hp + "output.LayerNorm.weight")
        ws[p + "ln2_b"] = t(hp + "output.LayerNorm.bias")
    return ws


def emit_graph(ws, n_layer, n_head, dim, seq):
    nodes, init = [], {}
    hs = dim // n_head

    def ln(x, g, b, out):
        nodes.append(encode_node("LayerNormalization", [x, g, b], [out],
                                 [encode_attr_i("axis", -1),
                                  encode_attr_f("epsilon", 1e-12)]))

    init["wte"] = ws["wte"]
    init["wpe_s"] = ws["wpe"]
    init["wtype_s"] = np.broadcast_to(ws["wtype"], (seq, dim)).copy()
    init["iscale"] = np.float32(1.0 / math.sqrt(hs))
    init["isqrt2"] = np.float32(1.0 / math.sqrt(2.0))
    init["half"] = np.float32(0.5)
    init["one"] = np.float32(1.0)
    nodes.extend([
        encode_node("Gather", ["wte", "idx"], ["emb"],
                    [encode_attr_i("axis", 0)]),
        encode_node("Add", ["emb", "wpe_s"], ["embp"]),
        encode_node("Add", ["embp", "wtype_s"], ["embt"]),
    ])
    ln("embt", "emb_ln_g", "emb_ln_b", "x0")
    init["emb_ln_g"], init["emb_ln_b"] = ws["emb_ln_g"], ws["emb_ln_b"]
    x = "x0"
    for i in range(n_layer):
        p = f"b{i}."
        for k in ("wq", "q_b", "wk", "k_b", "wv", "v_b", "wo", "o_b",
                  "ln1_g", "ln1_b", "ln2_g", "ln2_b", "wfc", "fc_b",
                  "wout", "out_b"):
            init[p + k] = ws[p + k]
        for nm in ("q", "k", "v"):
            nodes.extend([
                encode_node("MatMul", [x, p + "w" + nm], [p + nm + "0"]),
                encode_node("Add", [p + nm + "0", p + nm + "_b"], [p + nm]),
            ])
        heads = []
        for h in range(n_head):
            hp = f"{p}h{h}."
            for nm in ("q", "k", "v"):
                nodes.append(encode_node(
                    "Slice", [p + nm, hp + nm + ".st", hp + nm + ".en",
                              hp + nm + ".ax"], [hp + nm]))
                init[hp + nm + ".st"] = np.array([h * hs], np.int64)
                init[hp + nm + ".en"] = np.array([(h + 1) * hs], np.int64)
                init[hp + nm + ".ax"] = np.array([1], np.int64)
            nodes.extend([
                # bidirectional attention: no causal mask
                encode_node("Transpose", [hp + "k"], [hp + "kt"],
                            [encode_attr_ints("perm", [1, 0])]),
                encode_node("MatMul", [hp + "q", hp + "kt"], [hp + "a0"]),
                encode_node("Mul", [hp + "a0", "iscale"], [hp + "a1"]),
                encode_node("Softmax", [hp + "a1"], [hp + "sm"],
                            [encode_attr_i("axis", -1)]),
                encode_node("MatMul", [hp + "sm", hp + "v"], [hp + "o"]),
            ])
            heads.append(hp + "o")
        nodes.extend([
            encode_node("Concat", heads, [p + "cat"],
                        [encode_attr_i("axis", 1)]),
            encode_node("MatMul", [p + "cat", p + "wo"], [p + "pr0"]),
            encode_node("Add", [p + "pr0", p + "o_b"], [p + "pr"]),
            encode_node("Add", [x, p + "pr"], [p + "res1"]),
        ])
        ln(p + "res1", p + "ln1_g", p + "ln1_b", p + "a")
        nodes.extend([
            encode_node("MatMul", [p + "a", p + "wfc"], [p + "g0"]),
            encode_node("Add", [p + "g0", p + "fc_b"], [p + "g"]),
            # exact GELU: 0.5 g (1 + erf(g / sqrt(2)))
            encode_node("Mul", [p + "g", "isqrt2"], [p + "ge"]),
            encode_node("Erf", [p + "ge"], [p + "erf"]),
            encode_node("Add", [p + "erf", "one"], [p + "e1"]),
            encode_node("Mul", [p + "g", p + "e1"], [p + "gh"]),
            encode_node("Mul", [p + "gh", "half"], [p + "gelu"]),
            encode_node("MatMul", [p + "gelu", p + "wout"], [p + "o0"]),
            encode_node("Add", [p + "o0", p + "out_b"], [p + "mo"]),
            encode_node("Add", [p + "a", p + "mo"], [p + "pre2"]),
        ])
        ln(p + "pre2", p + "ln2_g", p + "ln2_b", p + "res2")
        x = p + "res2"
    # [CLS] token (row 0) is the BGE sentence embedding
    init["cls.st"] = np.array([0], np.int64)
    init["cls.en"] = np.array([1], np.int64)
    init["cls.ax"] = np.array([0], np.int64)
    nodes.append(encode_node("Slice", [x, "cls.st", "cls.en", "cls.ax"],
                             ["cls"]))
    return encode_model(nodes, init, [("idx", [seq])], [("cls", [1, dim])])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "models",
                                                  "bge-small-en-v1.5"))
    ap.add_argument("--seq", type=int, default=16)
    ap.add_argument("--random", action="store_true",
                    help="random weights, no network (CI / offline)")
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--ffn", type=int, default=1536)
    ap.add_argument("--vocab", type=int, default=30522)
    args = ap.parse_args()

    rng = np.random.default_rng(23)
    if args.random:
        ws = random_weights(args.layers, args.dim, args.ffn, args.vocab,
                            args.seq, rng)
    else:
        args.layers, args.dim, args.heads, args.ffn = 12, 384, 12, 1536
        ws = hf_weights(args.layers, args.seq)
        from transformers import AutoTokenizer
        AutoTokenizer.from_pretrained(MODEL_ID).save_pretrained(args.out)
    blob = emit_graph(ws, args.layers, args.heads, args.dim, args.seq)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "network.onnx")
    with open(path, "wb") as f:
        f.write(blob)
    print(f"wrote {path} ({len(blob) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
