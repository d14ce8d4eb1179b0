"""Model zoo generator: writes ONNX fixture files with the in-repo protobuf
writer (no torch/onnx dependency).

Reference: atlas-onnx-tracer/models/*/gen.py — each model family ships a
generator + network.onnx. Here one script emits every family:

    python models/gen_all.py [outdir]

Families (mirroring the reference zoo's coverage classes):
perceptron, mlp_square, mlp_square_4layer, relu_mlp, gather, sum_axes,
broadcast, moveaxis, slice, concat, layernorm_head, self_attention_layer,
tanh_mlp, sigmoid_encoder, erf_head, softmax_head, positional_encoding.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jolt_atlas_tpu.frontend.onnx_proto import (  # noqa: E402
    encode_attr_i, encode_attr_ints, encode_model, encode_node,
)

rng = np.random.default_rng(2024)


def _w(shape, scale=0.4):
    return (rng.normal(size=shape) * scale).astype(np.float32)


def perceptron():
    nodes = [encode_node("MatMul", ["x", "w"], ["h"]),
             encode_node("Add", ["h", "b"], ["hb"]),
             encode_node("Relu", ["hb"], ["y"])]
    return nodes, {"w": _w((8, 4)), "b": _w((4,), 0.1)}, \
        [("x", [1, 8])], [("y", [1, 4])]


def mlp_square():
    nodes = [encode_node("MatMul", ["x", "w1"], ["h"]),
             encode_node("Mul", ["h", "h"], ["s"]),
             encode_node("MatMul", ["s", "w2"], ["y"])]
    return nodes, {"w1": _w((8, 8)), "w2": _w((8, 4))}, \
        [("x", [2, 8])], [("y", [2, 4])]


def mlp_square_4layer():
    nodes, init = [], {}
    prev = "x"
    for i in range(4):
        w = f"w{i}"
        init[w] = _w((8, 8), 0.3)
        nodes.append(encode_node("MatMul", [prev, w], [f"h{i}"]))
        nodes.append(encode_node("Mul", [f"h{i}", f"h{i}"], [f"s{i}"]))
        prev = f"s{i}"
    nodes.append(encode_node("Relu", [prev], ["y"]))
    return nodes, init, [("x", [2, 8])], [("y", [2, 8])]


def relu_mlp():
    nodes = [encode_node("MatMul", ["x", "w1"], ["h"]),
             encode_node("Relu", ["h"], ["a"]),
             encode_node("MatMul", ["a", "w2"], ["y"])]
    return nodes, {"w1": _w((8, 16)), "w2": _w((16, 4))}, \
        [("x", [2, 8])], [("y", [2, 4])]


def gather():
    return ([encode_node("Gather", ["emb", "idx"], ["y"],
                         [encode_attr_i("axis", 0)])],
            {"emb": _w((16, 8))}, [("idx", [4])], [("y", [4, 8])])


def sum_axes():
    return ([encode_node("ReduceSum", ["x"], ["y"],
                         [encode_attr_ints("axes", [1]),
                          encode_attr_i("keepdims", 1)])],
            {}, [("x", [4, 8])], [("y", [4, 1])])


def broadcast():
    return ([encode_node("Add", ["x", "b"], ["y"])],
            {"b": _w((8,), 0.2)}, [("x", [4, 8])], [("y", [4, 8])])


def moveaxis():
    return ([encode_node("Transpose", ["x"], ["t"],
                         [encode_attr_ints("perm", [1, 0])]),
             encode_node("Relu", ["t"], ["y"])],
            {}, [("x", [4, 8])], [("y", [8, 4])])


def slice_model():
    return ([encode_node("Relu", ["x"], ["r"]),
             encode_node("Softmax", ["r"], ["y"],
                         [encode_attr_i("axis", -1)])],
            {}, [("x", [2, 8])], [("y", [2, 8])])


def concat():
    return ([encode_node("Concat", ["x", "x2"], ["c"],
                         [encode_attr_i("axis", 1)]),
             encode_node("Relu", ["c"], ["y"])],
            {}, [("x", [2, 4]), ("x2", [2, 4])], [("y", [2, 8])])


def layernorm_head():
    nodes = [encode_node("Mul", ["x", "x"], ["x2"]),
             encode_node("ReduceMean", ["x2"], ["m"],
                         [encode_attr_ints("axes", [1]),
                          encode_attr_i("keepdims", 1)]),
             encode_node("Sqrt", ["m"], ["s"]),
             encode_node("Div", ["x", "s"], ["n"]),
             encode_node("MatMul", ["n", "w"], ["y"])]
    return nodes, {"w": _w((8, 4))}, [("x", [2, 8])], [("y", [2, 4])]


def self_attention_layer():
    nodes = [encode_node("MatMul", ["x", "wq"], ["q"]),
             encode_node("MatMul", ["x", "wk"], ["k"]),
             encode_node("MatMul", ["x", "wv"], ["v"]),
             encode_node("Transpose", ["k"], ["kt"],
                         [encode_attr_ints("perm", [1, 0])]),
             encode_node("MatMul", ["q", "kt"], ["scores"]),
             encode_node("Softmax", ["scores"], ["att"],
                         [encode_attr_i("axis", -1)]),
             encode_node("MatMul", ["att", "v"], ["y"])]
    init = {"wq": _w((8, 8), 0.3), "wk": _w((8, 8), 0.3),
            "wv": _w((8, 8), 0.3)}
    return nodes, init, [("x", [4, 8])], [("y", [4, 8])]


def tanh_mlp():
    return ([encode_node("MatMul", ["x", "w"], ["h"]),
             encode_node("Tanh", ["h"], ["y"])],
            {"w": _w((8, 8))}, [("x", [2, 8])], [("y", [2, 8])])


def sigmoid_encoder():
    return ([encode_node("MatMul", ["x", "w"], ["h"]),
             encode_node("Sigmoid", ["h"], ["y"])],
            {"w": _w((8, 4))}, [("x", [2, 8])], [("y", [2, 4])])


def erf_head():
    return ([encode_node("Erf", ["x"], ["y"])],
            {}, [("x", [8])], [("y", [8])])


def softmax_head():
    return ([encode_node("MatMul", ["x", "w"], ["h"]),
             encode_node("Softmax", ["h"], ["y"],
                         [encode_attr_i("axis", -1)])],
            {"w": _w((8, 8))}, [("x", [2, 8])], [("y", [2, 8])])


def positional_encoding():
    return ([encode_node("Gather", ["emb", "idx"], ["e"],
                         [encode_attr_i("axis", 0)]),
             encode_node("Add", ["e", "pos"], ["y"])],
            {"emb": _w((32, 8)), "pos": _w((8, 8), 0.1)},
            [("idx", [8])], [("y", [8, 8])])


FAMILIES = {
    "perceptron": perceptron,
    "mlp_square": mlp_square,
    "mlp_square_4layer": mlp_square_4layer,
    "relu_mlp": relu_mlp,
    "gather": gather,
    "sum_axes": sum_axes,
    "broadcast": broadcast,
    "moveaxis": moveaxis,
    "slice": slice_model,
    "concat": concat,
    "layernorm_head": layernorm_head,
    "self_attention_layer": self_attention_layer,
    "tanh_mlp": tanh_mlp,
    "sigmoid_encoder": sigmoid_encoder,
    "erf_head": erf_head,
    "softmax_head": softmax_head,
    "positional_encoding": positional_encoding,
}


def generate(outdir: str) -> list[str]:
    written = []
    for name, fn in FAMILIES.items():
        nodes, init, inputs, outputs = fn()
        data = encode_model(nodes, init, inputs, outputs)
        d = os.path.join(outdir, name)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "network.onnx")
        with open(path, "wb") as f:
            f.write(data)
        written.append(path)
    return written


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.abspath(__file__))
    for p in generate(out):
        print(p)
