"""Prove a real trained model: the reference's BBC-news article classifier.

Loads the trained TF-IDF MLP shipped with the reference repo
(atlas-onnx-tracer/models/article_classification/: network.onnx with real
trained weights, vocab.json tokenizer, labels.json), featurizes real text,
proves the quantized forward pass, verifies, and reports the classified
label. Mirrors the reference's test_onnx.py driver, but with a zk proof
instead of onnxruntime.

Usage:  python examples/article_classification.py ["your headline here"]
"""

import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jolt_atlas_tpu.frontend.onnx_load import OnnxLoader, RunArgs
from jolt_atlas_tpu.frontend.quantize import quantize_tensor
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
from jolt_atlas_tpu.prover import AtlasProver
from jolt_atlas_tpu.verifier import AtlasVerifier
from jolt_atlas_tpu import serde

FIXTURE = "/root/reference/atlas-onnx-tracer/models/article_classification"
LABELS = ["business", "entertainment", "politics", "sport", "tech"]


def featurize(text: str, vocab: dict, n: int = 512) -> np.ndarray:
    """Term-frequency vector over the trained vocabulary (the same
    preprocessing as the reference's test_onnx.py)."""
    f = np.zeros(n, dtype=np.float64)
    for w in re.findall(r"\b\w+\b", text.lower()):
        if w in vocab and vocab[w]["index"] < n:
            f[vocab[w]["index"]] += 1.0
    return f


def main():
    if not os.path.isdir(FIXTURE):
        print("reference fixture not mounted at", FIXTURE)
        return 1
    text = (sys.argv[1] if len(sys.argv) > 1 else
            "The team won the championship game with a last minute goal")
    vocab = json.load(open(os.path.join(FIXTURE, "vocab.json")))
    model = OnnxLoader(RunArgs(variables={"batch_size": 1})).load_file(
        os.path.join(FIXTURE, "network.onnx"))
    x = quantize_tensor(featurize(text, vocab).reshape(1, 512), model.scale)

    pp = AtlasPreprocessing.preprocess(model)
    t0 = time.time()
    proof, io = AtlasProver(pp).prove([x])
    t1 = time.time()
    ok = AtlasVerifier(pp).verify(proof, io)
    t2 = time.time()
    blob = serde.serialize_proof(proof)

    logits = np.asarray(io[1][0], dtype=np.float64).reshape(-1)[:5]
    label = LABELS[int(np.argmax(logits))]
    print(f"text:    {text!r}")
    print(f"label:   {label}  (logits {np.round(logits / (1 << model.scale), 2).tolist()})")
    print(f"prove:   {t1 - t0:.2f}s   verify: {t2 - t1:.2f}s   "
          f"proof: {len(blob) / 1024:.1f} KiB   verified: {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
