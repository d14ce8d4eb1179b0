"""Reference ONNX fixtures: load the upstream repo's checked-in models
through this frontend, run them, and prove a subset end to end.

The fixture binaries live read-only under /root/reference/atlas-onnx-tracer/
models/ (network.onnx [+ network.onnx.data], input.json, and for
article_classification a trained classifier with vocab.json/labels.json).
They are consumed in place as data — mirrored from the reference's own e2e
strategy (jolt-atlas-core/src/onnx_proof/e2e_tests.rs:298-415), which loads
each fixture and proves a random-input forward pass.

NOTE on input.json: several fixtures' stored output_data is stale relative
to network.onnx (independent numpy reimplementations of gen.py's
architecture using the shipped weights disagree with the JSON for
transformer and nanoGPT by >1.0 max-abs). The reference tests never read
output_data; closeness is asserted here only for the families where the
JSON matches the weights.
"""

import json
import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jolt_atlas_tpu.frontend.onnx_load import OnnxLoader, RunArgs  # noqa: E402
from jolt_atlas_tpu.frontend.onnx_proto import parse_onnx  # noqa: E402
from jolt_atlas_tpu.frontend.quantize import quantize_tensor  # noqa: E402
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing  # noqa: E402
from jolt_atlas_tpu.prover import AtlasProver  # noqa: E402
from jolt_atlas_tpu.verifier import AtlasVerifier  # noqa: E402

FIXTURES = "/root/reference/atlas-onnx-tracer/models"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not mounted")

rng = np.random.default_rng(0x1096)

# families that load + run; (name, input builder)
LOAD_FAMILIES = [
    "article_classification", "authorization", "broadcast",
    "concat_transformer_block", "erf", "gather", "layernorm_head",
    "layernorm_partial_head", "microgpt", "minigpt", "mlp_square",
    "mlp_square_4layer", "moveaxis", "multihead_attention", "nanoGPT",
    "nanoGPT_1M", "perceptron", "positional_encoding", "relu_nanoGPT",
    "relu_self_attention", "reshape", "rsqrt", "self_attention_layer",
    "sigmoid_encoder", "slice", "sum_1d_axis0", "sum_2d_axis0",
    "sum_2d_axis1", "sum_3d_axis2", "sum_axes_test", "sum_independent",
    "tanh", "test_add_sub_mul", "transformer",
]

# families whose stored output_data matches the shipped weights; values are
# min correlation for the ideal-f64 execution of the loaded graph (the
# quantized run drifts on layernorm-of-small-activations exactly as the
# reference's quantized interpreter does — its tests check only
# self-consistency, e2e_tests.rs:298)
CONSISTENT = {"microgpt": 0.98, "minigpt": 0.98, "self_attention_layer": 0.99}


def _load(name, scale=None):
    ra = RunArgs(variables={"batch_size": 1, "batch": 1, "N": 1})
    if scale is not None:
        ra.scale = scale
    return OnnxLoader(ra).load_file(os.path.join(FIXTURES, name,
                                                 "network.onnx"))


def _graph_meta(name):
    p = os.path.join(FIXTURES, name, "network.onnx")
    return parse_onnx(open(p, "rb").read(), base_dir=os.path.dirname(p))


def _fixture_inputs(name, model):
    """Inputs for a fixture: input.json when present, random otherwise."""
    g = _graph_meta(name)
    path = os.path.join(FIXTURES, name, "input.json")
    data = json.load(open(path)) if os.path.exists(path) else None
    if data is not None and data.get("input_data") and \
            np.isscalar(data["input_data"][0]):
        data["input_data"] = [data["input_data"]]  # flat single-input form
    ins = []
    for k, widx in enumerate(model.graph.inputs):
        dims = model.graph.nodes[widx].output_dims
        vi = g.inputs[k] if k < len(g.inputs) else None
        is_int = vi is not None and vi.elem_type in (6, 7)
        if data is not None and k < len(data.get("input_data", [])):
            flat = np.asarray(data["input_data"][k], dtype=np.float64)
            nominal = [1 if isinstance(s, str) else s for s in vi.shape]
            if int(np.prod(nominal)) != flat.size:
                nominal = list(flat.shape)  # fall back to flat
                arr = flat
            else:
                arr = flat.reshape(nominal)
            pads = [(0, t - s) for s, t in zip(arr.shape, dims)]
            arr = np.pad(arr, pads)
            ins.append(arr.astype(np.int32) if is_int
                       else quantize_tensor(arr, model.scale))
        elif is_int:
            ins.append(rng.integers(0, 4, size=dims).astype(np.int32))
        else:
            ins.append(quantize_tensor(rng.normal(size=dims) * 0.5,
                                       model.scale))
    return ins


class TestReferenceFixtures:
    @pytest.mark.parametrize("name", LOAD_FAMILIES)
    def test_loads_and_runs(self, name):
        model = _load(name)
        outs = model.forward(_fixture_inputs(name, model))
        for o in outs:
            a = np.asarray(o, dtype=np.float64)
            assert a.size and np.isfinite(a).all(), name

    @pytest.mark.parametrize("name", sorted(CONSISTENT))
    def test_matches_reference_output(self, name):
        from jolt_atlas_tpu.frontend.shadow import f64_forward
        model = _load(name)
        g = _graph_meta(name)
        data = json.load(open(os.path.join(FIXTURES, name, "input.json")))
        y = f64_forward(model, _fixture_inputs(name, model))[0]
        e = np.asarray(data["output_data"][0], dtype=np.float64)
        vo = g.outputs[0]
        oshape = [1 if isinstance(s, str) else s for s in vo.shape]
        if int(np.prod(oshape)) != e.size:  # symbolic middle dim
            known = int(np.prod([s for s in vo.shape if isinstance(s, int)]))
            oshape = [e.size // known if isinstance(s, str) else s
                      for s in vo.shape]
        yn = y[tuple(slice(0, s) for s in oshape)].reshape(-1)
        corr = np.corrcoef(yn, e.reshape(-1))[0, 1]
        assert corr > CONSISTENT[name], f"{name}: corr {corr:.4f}"

    @pytest.mark.parametrize("name", [
        "perceptron", "mlp_square", "layernorm_head", "microgpt",
    ])
    def test_proves_end_to_end(self, name):
        model = _load(name)
        ins = _fixture_inputs(name, model)
        pp = AtlasPreprocessing.preprocess(model)
        proof, io = AtlasProver(pp).prove(ins)
        assert AtlasVerifier(pp).verify(proof, io)


class TestArticleClassification:
    """The trained news classifier: real weights, real tokenizer, proven
    end to end (reference models/article_classification/test_onnx.py)."""

    LABELS = ["business", "entertainment", "politics", "sport", "tech"]

    @staticmethod
    def _features(text, vocab, n=512):
        f = np.zeros(n, dtype=np.float64)
        for w in re.findall(r"\b\w+\b", text.lower()):
            if w in vocab and vocab[w]["index"] < n:
                f[vocab[w]["index"]] += 1.0
        return f

    @pytest.fixture(scope="class")
    def clf(self):
        model = _load("article_classification")
        vocab = json.load(open(os.path.join(
            FIXTURES, "article_classification", "vocab.json")))
        return model, vocab

    def test_classifies_real_text(self, clf):
        model, vocab = clf
        cases = [
            ("The team won the championship game with a last minute goal",
             "sport"),
            ("The company reported record quarterly profits and rising "
             "shares", "business"),
            ("The new film premiere attracted many celebrities",
             "entertainment"),
            ("Scientists developed a new computer chip with faster software",
             "tech"),
        ]
        for text, want in cases:
            x = quantize_tensor(
                self._features(text, vocab).reshape(1, 512), model.scale)
            y = np.asarray(model.forward([x])[0], np.float64)[0, :5]
            assert self.LABELS[int(np.argmax(y))] == want, text

    def test_proves_classification(self, clf):
        model, vocab = clf
        text = "The team won the championship game with a last minute goal"
        x = quantize_tensor(self._features(text, vocab).reshape(1, 512),
                            model.scale)
        pp = AtlasPreprocessing.preprocess(model)
        proof, io = AtlasProver(pp).prove([x])
        assert AtlasVerifier(pp).verify(proof, io)
        logits = np.asarray(io[1][0], dtype=np.float64).reshape(-1)[:5]
        assert self.LABELS[int(np.argmax(logits))] == "sport"
