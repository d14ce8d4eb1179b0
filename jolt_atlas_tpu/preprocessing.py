"""Prover/verifier preprocessing: SRS sized from the model.

Reference: jolt-atlas-core/src/onnx_proof/preprocessing.rs — the SRS is
sized by the model's max committed-polynomial size; the shared preprocessing
carries the model.
"""

from __future__ import annotations

from .commitment.kzg import KZGSRS
from .frontend.graph import Model


class AtlasPreprocessing:
    def __init__(self, model: Model, srs: KZGSRS):
        self.model = model
        self.srs = srs

    @classmethod
    def preprocess(cls, model: Model, extra_log2: int = 0) -> "AtlasPreprocessing":
        max_vars = model.graph.max_num_vars() + extra_log2
        srs = KZGSRS.setup(1 << max_vars)
        return cls(model, srs)
