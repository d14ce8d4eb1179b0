"""Qwen2 + BGE export -> load -> trace -> prove CI tests.

Reference analogues: scripts/download_qwen.py +
scripts/download_bge_small_en_v1_5.py + examples/{qwen,bge}.rs. Random
tiny-shape exports (no network) exercise the full tooling path: the
in-repo ONNX writer's Qwen2 decomposition (RMSNorm chain, constant-table
rotary, GQA via sliced KV heads, SwiGLU) and BERT decomposition
(LayerNormalization, erf-GELU, bidirectional attention, CLS slice).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _export(tmp_path, script, args):
    out = str(tmp_path)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script),
         "--random", "--out", out, *args],
        check=True, capture_output=True, timeout=300)
    return os.path.join(out, "network.onnx")


@pytest.fixture(scope="module")
def qwen_onnx(tmp_path_factory):
    return _export(tmp_path_factory.mktemp("qwen"), "download_qwen.py",
                   ["--layers", "2", "--dim", "64", "--heads", "4",
                    "--kv-heads", "2", "--ffn", "128", "--vocab", "512",
                    "--seq", "8"])


@pytest.fixture(scope="module")
def bge_onnx(tmp_path_factory):
    return _export(tmp_path_factory.mktemp("bge"),
                   "download_bge_small_en_v1_5.py",
                   ["--layers", "2", "--dim", "64", "--heads", "4",
                    "--ffn", "128", "--vocab", "512", "--seq", "8"])


def _prove(path, out_check):
    from jolt_atlas_tpu.frontend.onnx_load import RunArgs, load_onnx
    from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
    from jolt_atlas_tpu.prover import AtlasProver
    from jolt_atlas_tpu.verifier import AtlasVerifier
    model = load_onnx(path, RunArgs(scale=8))
    toks = np.random.default_rng(5).integers(0, 512, size=8).astype(np.int32)
    tr = model.trace([toks])
    out_check(model, tr)
    pp = AtlasPreprocessing.preprocess(model)
    proof, io = AtlasProver(pp).prove([toks])
    assert AtlasVerifier(pp).verify(proof, io)


def test_qwen_export_prove_verify(qwen_onnx):
    def check(model, tr):
        out = tr.node_outputs[model.graph.outputs[0]]
        assert out.shape == (8, 512)  # (seq, vocab) logits

    _prove(qwen_onnx, check)


def test_bge_export_prove_verify(bge_onnx):
    def check(model, tr):
        out = tr.node_outputs[model.graph.outputs[0]]
        assert out.shape[-1] == 64    # CLS embedding row

    _prove(bge_onnx, check)


def test_qwen_shadow_drift(qwen_onnx):
    """f64 shadow agreement through rotary + GQA + SwiGLU at scale 2^8."""
    from jolt_atlas_tpu.frontend.onnx_load import RunArgs, load_onnx
    from jolt_atlas_tpu.frontend.shadow import shadow_trace
    m = load_onnx(qwen_onnx, RunArgs(scale=12))
    toks = np.arange(8, dtype=np.int32) * 3
    sh = shadow_trace(m, [toks])
    drift = next(x for x in sh if x.node_idx == m.graph.outputs[0])
    assert drift.cosine_similarity > 0.98, drift
