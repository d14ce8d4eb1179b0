"""GPT-2 ONNX pipeline: export -> load -> trace -> prove.

Covers the reference's GPT-2 path (scripts/download_gpt2.py +
examples/gpt2.rs): the exporter's graph (full LayerNorm, per-head causal
attention, tanh-GELU, tied LM head) at a tiny random-weight shape in CI,
plus the real-124M-weights path opt-in when the downloaded file exists.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REAL_ONNX = os.path.join(REPO, "models", "gpt2", "network.onnx")


@pytest.fixture(scope="module")
def tiny_gpt2_onnx(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gpt2_rand"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "download_gpt2.py"),
         "--random", "--layers", "1", "--heads", "2", "--dim", "32",
         "--vocab", "64", "--block", "16", "--seq", "8", "--out", out],
        check=True, capture_output=True, timeout=180)
    return os.path.join(out, "network.onnx")


def test_export_load_trace_shadow(tiny_gpt2_onnx):
    from jolt_atlas_tpu.frontend.onnx_load import RunArgs, load_onnx
    from jolt_atlas_tpu.frontend.shadow import shadow_trace
    m = load_onnx(tiny_gpt2_onnx, RunArgs(scale=12))
    toks = np.array([1, 5, 9, 13, 2, 6, 10, 0], dtype=np.int32)
    tr = m.trace([toks])
    out = tr.node_outputs[m.graph.outputs[0]]
    assert out.shape[0] == 8
    # f64 shadow agreement on the logits (scale 2^12 quantization)
    sh = shadow_trace(m, [toks])
    drift = next(x for x in sh if x.node_idx == m.graph.outputs[0])
    assert drift.cosine_similarity > 0.99, drift


def test_prove_verify_tiny(tiny_gpt2_onnx):
    from jolt_atlas_tpu.frontend.onnx_load import RunArgs, load_onnx
    from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
    from jolt_atlas_tpu.prover import AtlasProver
    from jolt_atlas_tpu.verifier import AtlasVerifier
    m = load_onnx(tiny_gpt2_onnx, RunArgs(scale=12))
    toks = np.array([1, 5, 9, 13, 2, 6, 10, 0], dtype=np.int32)
    pp = AtlasPreprocessing.preprocess(m)
    proof, io = AtlasProver(pp).prove([toks])
    assert AtlasVerifier(pp).verify(proof, io)


@pytest.mark.skipif(not os.path.exists(REAL_ONNX),
                    reason="real GPT-2 weights not downloaded "
                           "(run scripts/download_gpt2.py)")
def test_real_gpt2_loads_and_decodes():
    from jolt_atlas_tpu.frontend.onnx_load import RunArgs, load_onnx
    m = load_onnx(REAL_ONNX, RunArgs(scale=12))
    seq = m.graph.original_input_dims[0][0]
    toks = np.zeros(seq, dtype=np.int32)
    tr = m.trace([toks])
    out = tr.node_outputs[m.graph.outputs[0]]
    assert out.shape[0] >= seq
