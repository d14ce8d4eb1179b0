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
        self._pedersen = None

    def pedersen_gens(self, count: int = 128):
        """Pedersen generators for the ZK pipeline, derived from the SRS
        G1 powers (reference preprocessing.rs:115-123). Deterministic, so
        prover and verifier preprocessing agree. Sized for the widest
        committed vector (round polys are ~degree 8; eval-reduction h
        polys grow with claim fan-in — 128 covers the model zoo and the
        generators auto-extend by hashing past the SRS length)."""
        if self._pedersen is None:
            from .commitment.pedersen import PedersenGenerators
            # fixed base width: generators beyond 128 always come from the
            # hash chain (never later SRS powers), so any two sides agree
            # regardless of how wide each needed to commit
            self._pedersen = PedersenGenerators.from_srs(self.srs, 128)
        if count > 128:
            self._pedersen.ensure(count)
        return self._pedersen

    @classmethod
    def preprocess(cls, model: Model, extra_log2: int = 0) -> "AtlasPreprocessing":
        max_vars = model.graph.max_num_vars() + extra_log2
        srs = KZGSRS.setup(1 << max_vars)
        return cls(model, srs)
