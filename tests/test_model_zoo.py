"""Model zoo: every family generates, loads through the ONNX pipeline, and
runs; a representative subset proves end to end.

Reference: atlas-onnx-tracer/models/ (30+ fixture dirs with gen.py).
"""

import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from models.gen_all import FAMILIES, generate  # noqa: E402

from jolt_atlas_tpu.frontend.onnx_load import OnnxLoader  # noqa: E402
from jolt_atlas_tpu.frontend.quantize import quantize_tensor  # noqa: E402
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing  # noqa: E402
from jolt_atlas_tpu.prover import AtlasProver  # noqa: E402
from jolt_atlas_tpu.verifier import AtlasVerifier  # noqa: E402

rng = np.random.default_rng(17)


@pytest.fixture(scope="module")
def zoo_dir():
    d = tempfile.mkdtemp(prefix="zoo_")
    generate(d)
    return d


def _inputs_for(model):
    ins = []
    for idx in model.graph.inputs:
        dims = model.graph.nodes[idx].output_dims
        name_hint = len(dims) == 1 and dims[0] <= 16
        # index-typed inputs (gather idx) get small nonneg ints; rest float
        producer_ops = [n.operator.name for n in model.graph.nodes.values()
                        if idx in n.inputs]
        if "GatherSmall" in producer_ops or "GatherLarge" in producer_ops:
            ins.append(rng.integers(0, 8, size=dims).astype(np.int32))
        else:
            ins.append(quantize_tensor(rng.normal(size=dims), model.scale))
    return ins


class TestModelZoo:
    def test_all_families_load_and_run(self, zoo_dir):
        for name in FAMILIES:
            path = os.path.join(zoo_dir, name, "network.onnx")
            model = OnnxLoader().load_file(path)
            out = model.forward(_inputs_for(model))
            assert all(np.asarray(o).size for o in out), name

    @pytest.mark.parametrize("name", [
        "perceptron", "gather", "tanh_mlp", "layernorm_head", "concat",
    ])
    def test_family_proves(self, zoo_dir, name):
        path = os.path.join(zoo_dir, name, "network.onnx")
        model = OnnxLoader().load_file(path)
        ins = _inputs_for(model)
        pp = AtlasPreprocessing.preprocess(model)
        proof, io = AtlasProver(pp).prove(ins)
        v = AtlasVerifier(pp)
        assert v.verify(proof, io), (name, getattr(v, "last_error", None))
