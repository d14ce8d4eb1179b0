"""ONNX loading: wire-format models -> quantized graph -> prove+verify.

Models are constructed with the built-in protobuf writer (the environment
ships neither `onnx` nor a working torch exporter); the reference generates
equivalent fixtures with torch gen.py scripts (atlas-onnx-tracer/models/).
"""

import numpy as np

from jolt_atlas_tpu.frontend.onnx_proto import (
    encode_attr_i, encode_attr_ints, encode_attr_tensor, encode_model,
    encode_node, parse_onnx,
)
from jolt_atlas_tpu.frontend.onnx_load import OnnxLoader, RunArgs
from jolt_atlas_tpu.frontend.quantize import dequantize, quantize_tensor
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
from jolt_atlas_tpu.prover import AtlasProver
from jolt_atlas_tpu.verifier import AtlasVerifier

rng = np.random.default_rng(55)


def mlp_onnx(din=8, dh=16, dout=4, batch=2, seed=0):
    r = np.random.default_rng(seed)
    w1 = r.normal(size=(din, dh)).astype(np.float32) * 0.4
    b1 = r.normal(size=(dh,)).astype(np.float32) * 0.1
    w2 = r.normal(size=(dh, dout)).astype(np.float32) * 0.4
    nodes = [
        encode_node("MatMul", ["x", "w1"], ["h"]),
        encode_node("Add", ["h", "b1"], ["hb"]),
        encode_node("Relu", ["hb"], ["a"]),
        encode_node("MatMul", ["a", "w2"], ["y"]),
    ]
    data = encode_model(nodes, {"w1": w1, "b1": b1, "w2": w2},
                        [("x", [batch, din])], [("y", [batch, dout])])
    ref = lambda x: np.maximum(x @ w1 + b1, 0) @ w2
    return data, ref


class TestOnnxParse:
    def test_roundtrip(self):
        data, _ = mlp_onnx()
        g = parse_onnx(data)
        assert len(g.nodes) == 4
        assert set(g.initializers) == {"w1", "b1", "w2"}
        assert g.inputs[0].name == "x" and g.inputs[0].shape == [2, 8]

    def test_negative_ints_and_attrs(self):
        arr = np.array([-5, 3, -(2**40)], dtype=np.int64)
        nodes = [encode_node("Gather", ["d", "i"], ["y"],
                             [encode_attr_i("axis", 0)])]
        data = encode_model(nodes, {"d": arr}, [("i", [2])], [("y", [2])])
        g = parse_onnx(data)
        assert list(g.initializers["d"].to_array()) == [-5, 3, -(2**40)]
        assert g.nodes[0].attributes["axis"].i == 0


class TestOnnxLoad:
    def test_mlp_forward(self):
        data, ref = mlp_onnx()
        model = OnnxLoader().load_bytes(data)
        x = rng.normal(size=(2, 8)).astype(np.float32)
        got = dequantize(model.forward([quantize_tensor(x, 8)])[0], 8)
        assert np.abs(got - ref(x)).max() < 0.15

    def test_mlp_prove_verify(self):
        data, _ = mlp_onnx(din=8, dh=8, dout=4, batch=1, seed=1)
        model = OnnxLoader().load_bytes(data)
        xq = quantize_tensor(rng.normal(size=(1, 8)).astype(np.float32), 8)
        pp = AtlasPreprocessing.preprocess(model)
        proof, io = AtlasProver(pp).prove([xq])
        v = AtlasVerifier(pp)
        assert v.verify(proof, io), getattr(v, "last_error", None)

    def test_softmax_transpose(self):
        nodes = [
            encode_node("Transpose", ["x"], ["xt"],
                        [encode_attr_ints("perm", [1, 0])]),
            encode_node("Softmax", ["xt"], ["y"], [encode_attr_i("axis", -1)]),
        ]
        data = encode_model(nodes, {}, [("x", [8, 4])], [("y", [4, 8])])
        model = OnnxLoader().load_bytes(data)
        x = rng.normal(size=(8, 4)).astype(np.float32)
        got = dequantize(model.forward([quantize_tensor(x, 8)])[0], 8)
        want = np.exp(x.T) / np.exp(x.T).sum(axis=-1, keepdims=True)
        assert np.abs(got - want).max() < 0.05

    def test_gather_reduce(self):
        emb = rng.normal(size=(16, 8)).astype(np.float32)
        nodes = [
            encode_node("Gather", ["emb", "idx"], ["e"],
                        [encode_attr_i("axis", 0)]),
            encode_node("ReduceMean", ["e"], ["m"],
                        [encode_attr_ints("axes", [1]), encode_attr_i("keepdims", 1)]),
        ]
        data = encode_model(nodes, {"emb": emb}, [("idx", [4])], [("m", [4, 1])])
        model = OnnxLoader().load_bytes(data)
        idx = np.array([3, 0, 15, 7], dtype=np.int32)
        got = dequantize(model.forward([idx])[0], 8)
        want = emb[idx].mean(axis=1, keepdims=True)
        assert np.abs(got - want).max() < 0.05

    def test_symbolic_dims(self):
        nodes = [encode_node("Relu", ["x"], ["y"])]
        data = encode_model(nodes, {}, [("x", ["batch", 8])], [("y", ["batch", 8])])
        model = OnnxLoader(RunArgs(variables={"batch": 2})).load_bytes(data)
        x = rng.integers(-10, 10, size=(2, 8)).astype(np.int32)
        assert (model.forward([x])[0] == np.maximum(x, 0)).all()

    def test_constant_node_and_div(self):
        cval = np.array([2.0], dtype=np.float32)
        nodes = [
            encode_node("Constant", [], ["c"], [encode_attr_tensor("value", cval)]),
            encode_node("Div", ["x", "c"], ["y"]),
        ]
        data = encode_model(nodes, {"c2": cval}, [("x", [4])], [("y", [4])])
        # Div by initializer constant path
        nodes2 = [encode_node("Div", ["x", "c2"], ["y"])]
        data2 = encode_model(nodes2, {"c2": cval}, [("x", [4])], [("y", [4])])
        model = OnnxLoader().load_bytes(data2)
        x = rng.normal(size=(4,)).astype(np.float32)
        got = dequantize(model.forward([quantize_tensor(x, 8)])[0], 8)
        assert np.abs(got - x / 2).max() < 0.05

    def test_activations_prove(self):
        """ONNX Tanh/Sigmoid/Erf route through the neural-teleport proof
        path end to end (reference models tanh/, erf/, sigmoid_encoder/)."""
        for opname, ref in [("Tanh", np.tanh),
                            ("Sigmoid", lambda v: 1 / (1 + np.exp(-v)))]:
            nodes = [encode_node(opname, ["x"], ["y"])]
            data = encode_model(nodes, {}, [("x", [8])], [("y", [8])])
            model = OnnxLoader().load_bytes(data)
            x = rng.normal(size=8).astype(np.float32)
            got = dequantize(model.forward([quantize_tensor(x, 8)])[0], 8)
            assert np.abs(got - ref(x)).max() < 0.05, opname
            pp = AtlasPreprocessing.preprocess(model)
            proof, io = AtlasProver(pp).prove([quantize_tensor(x, 8)])
            v = AtlasVerifier(pp)
            assert v.verify(proof, io), (opname, getattr(v, "last_error", None))

    def test_nonpow2_padding(self):
        r = np.random.default_rng(6)
        w = r.normal(size=(6, 10)).astype(np.float32) * 0.4
        nodes = [encode_node("MatMul", ["x", "w"], ["h"]),
                 encode_node("Relu", ["h"], ["y"])]
        data = encode_model(nodes, {"w": w}, [("x", [1, 6])], [("y", [1, 10])])
        model = OnnxLoader().load_bytes(data)
        in_node = model.graph.nodes[model.graph.inputs[0]]
        assert tuple(in_node.output_dims) == (1, 8)
        x = r.normal(size=(1, 6)).astype(np.float32)
        xpad = np.zeros((1, 8), dtype=np.float32)
        xpad[:, :6] = x
        got = dequantize(model.forward([quantize_tensor(xpad, 8)])[0], 8)
        want = np.maximum(x @ w, 0)
        assert np.abs(got[:, :10] - want).max() < 0.1
