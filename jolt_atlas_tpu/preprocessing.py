"""Prover/verifier preprocessing: SRS sized from the model.

Reference: jolt-atlas-core/src/onnx_proof/preprocessing.rs — the SRS is
sized by the model's max committed-polynomial size; the shared preprocessing
carries the model.
"""

from __future__ import annotations

from .commitment.kzg import KZGSRS
from .frontend.graph import Model


class AtlasPreprocessing:
    def __init__(self, model: Model, srs: KZGSRS, pcs: str = "hyperkzg",
                 pcs_setup=None):
        self.model = model
        self.srs = srs
        self.pcs = pcs              # "hyperkzg" | "dory"
        self.pcs_setup = pcs_setup  # DorySetup when pcs == "dory"
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
            if self.srs is None:
                # transparent (dory) mode: hash-to-curve generators (no
                # known discrete logs -> binding without any trusted setup)
                from .commitment.dory import hash_to_g1
                self._pedersen = PedersenGenerators(
                    [hash_to_g1(b"jolt-atlas-tpu-pedersen", i)
                     for i in range(128)],
                    hash_to_g1(b"jolt-atlas-tpu-pedersen-h", 0))
            else:
                # fixed base width: generators beyond 128 always come from
                # the hash chain (never later SRS powers), so any two sides
                # agree regardless of how wide each needed to commit
                self._pedersen = PedersenGenerators.from_srs(self.srs, 128)
        if count > 128:
            self._pedersen.ensure(count)
        return self._pedersen

    @classmethod
    def preprocess(cls, model: Model, extra_log2: int = 0,
                   pcs: str = "hyperkzg") -> "AtlasPreprocessing":
        max_vars = model.graph.max_num_vars() + extra_log2
        if pcs == "dory":
            # transparent: no trusted tau anywhere (reference dory/mod.rs)
            from .commitment.dory import DorySetup
            return cls(model, None, pcs="dory",
                       pcs_setup=DorySetup.for_num_vars(max_vars))
        srs = KZGSRS.setup(1 << max_vars)
        return cls(model, srs)
