"""Opening accumulation and the batched opening reduction.

Mirrors reference joltworks/src/poly/opening_proof.rs +
subprotocols/opening_reduction.rs: every polynomial-opening claim made during
the IOP is collected; committed-poly claims each spawn a degree-2 reduction
sumcheck instance proving  claim = sum_x eq(point, x) * P(x);  all instances
are batched into ONE BatchedSumcheck ending at a common challenge point
r_sumcheck; the per-poly evaluations P_i(r_sumcheck) are gamma-RLC'd into a
single joint polynomial opened once with HyperKZG.

Design deviation from the reference (documented): the reference keys
reduction instances by CommittedPoly (one PCS-verified point per polynomial,
later appends overwrite earlier ones — opening_proof.rs:309,369). We key by
OpeningId, so every claim on a committed polynomial gets its own reduction
instance and is PCS-verified. Strictly sound; costs a few extra degree-2
instances per proof.
"""

from __future__ import annotations

import numpy as np

from ..field import vec
from ..field.scalar import Fr
from ..ids import CommittedPoly, OpeningId, VirtualPoly
from .eq import eq_evals, eq_eval_scalar
from .mlpoly import BindingOrder, MLPoly
from .unipoly import UniPoly
from ..subprotocols.sumcheck import (
    BatchedSumcheck,
    SumcheckInstanceProver,
    SumcheckInstanceVerifier,
)

OPENING_SUMCHECK_DEGREE = 2


class _ReductionProver(SumcheckInstanceProver):
    """Proves claim = sum_x eq(point, x) * P(x); final claim P(r')."""

    def __init__(self, opening_id: OpeningId, poly_id: CommittedPoly,
                 point: list[Fr], claim: Fr):
        self.opening_id = opening_id
        self.poly_id = poly_id
        self.point = point
        self.claim = claim
        self.poly: MLPoly | None = None
        self.eq: MLPoly | None = None

    def prepare(self, poly_map):
        src = poly_map[self.poly_id]
        self.poly = src.clone()
        self.eq = MLPoly(fvec=eq_evals(self.point))

    def num_rounds(self) -> int:
        return len(self.point)

    def degree(self) -> int:
        return OPENING_SUMCHECK_DEGREE

    def input_claim(self, accumulator) -> Fr:
        return self.claim

    def compute_message(self, round: int, previous_claim: Fr) -> UniPoly:
        e_eq = self.eq.sumcheck_evals(2, BindingOrder.HighToLow)
        e_p = self.poly.sumcheck_evals(2, BindingOrder.HighToLow)
        points = [vec.vsum(vec.vmul(e_eq[t], e_p[t])) for t in range(2)]
        return UniPoly.from_evals_and_hint(previous_claim, points)

    def ingest_challenge(self, r: Fr, round: int) -> None:
        self.eq.bind(r, BindingOrder.HighToLow)
        self.poly.bind(r, BindingOrder.HighToLow)

    def final_poly_claim(self) -> Fr:
        return self.poly.final_claim()


class _ReductionVerifier(SumcheckInstanceVerifier):
    def __init__(self, opening_id: OpeningId, poly_id: CommittedPoly,
                 point: list[Fr], claim: Fr):
        self.opening_id = opening_id
        self.poly_id = poly_id
        self.point = point
        self.claim = claim
        self.sumcheck_claim: Fr | None = None  # P(r'), from the proof

    def num_rounds(self) -> int:
        return len(self.point)

    def degree(self) -> int:
        return OPENING_SUMCHECK_DEGREE

    def input_claim(self, accumulator) -> Fr:
        return self.claim

    def expected_output_claim(self, accumulator, r: list[Fr]) -> Fr:
        return eq_eval_scalar(self.point, r) * self.sumcheck_claim


class ProverOpeningAccumulator:
    def __init__(self):
        self.openings: dict[OpeningId, tuple[list[Fr], Fr]] = {}
        self.reductions: dict[OpeningId, _ReductionProver] = {}

    # -- appends (absorb claim into transcript, like the reference) --------
    def append_committed(self, transcript, opening_id: OpeningId,
                         point: list[Fr], claim: Fr) -> None:
        assert not opening_id.is_virtual
        transcript.append_scalar(claim)
        self.openings[opening_id] = (list(point), claim)
        self.reductions[opening_id] = _ReductionProver(
            opening_id, opening_id.poly, list(point), claim)

    def append_virtual(self, transcript, opening_id: OpeningId,
                       point: list[Fr], claim: Fr) -> None:
        assert opening_id.is_virtual
        transcript.append_scalar(claim)
        self.openings[opening_id] = (list(point), claim)

    def get_opening(self, opening_id: OpeningId) -> tuple[list[Fr], Fr]:
        return self.openings[opening_id]

    def take_claims(self) -> dict[OpeningId, Fr]:
        """Claims only (points dropped) — goes into the serialized proof."""
        return {k: v[1] for k, v in self.openings.items()}

    # -- batch opening reduction ------------------------------------------
    def sorted_reductions(self) -> list[_ReductionProver]:
        return [self.reductions[k] for k in sorted(self.reductions)]

    def prove_batch_opening(self, poly_map, transcript):
        """Runs the batched reduction sumcheck; returns
        (sumcheck_proof, r_sumcheck, sumcheck_claims, gamma_powers)."""
        instances = self.sorted_reductions()
        for inst in instances:
            inst.prepare(poly_map)
        proof, r_sumcheck = BatchedSumcheck.prove(instances, self, transcript)
        sumcheck_claims = [inst.final_poly_claim() for inst in instances]
        transcript.append_scalars(sumcheck_claims)
        gamma_powers = transcript.challenge_scalar_powers(len(sumcheck_claims))
        return proof, r_sumcheck, sumcheck_claims, gamma_powers


class VerifierOpeningAccumulator:
    def __init__(self, proof_claims: dict[OpeningId, Fr]):
        self.proof_claims = proof_claims
        self.openings: dict[OpeningId, tuple[list[Fr], Fr]] = {}
        self.reductions: dict[OpeningId, _ReductionVerifier] = {}

    def claim_of(self, opening_id: OpeningId) -> Fr:
        return self.proof_claims[opening_id]

    def append_committed(self, transcript, opening_id: OpeningId,
                         point: list[Fr]) -> None:
        assert not opening_id.is_virtual
        claim = self.proof_claims[opening_id]
        transcript.append_scalar(claim)
        self.openings[opening_id] = (list(point), claim)
        self.reductions[opening_id] = _ReductionVerifier(
            opening_id, opening_id.poly, list(point), claim)

    def append_virtual(self, transcript, opening_id: OpeningId,
                       point: list[Fr]) -> None:
        assert opening_id.is_virtual
        claim = self.proof_claims[opening_id]
        transcript.append_scalar(claim)
        self.openings[opening_id] = (list(point), claim)

    def get_opening(self, opening_id: OpeningId) -> tuple[list[Fr], Fr]:
        return self.openings[opening_id]

    def sorted_reductions(self) -> list[_ReductionVerifier]:
        return [self.reductions[k] for k in sorted(self.reductions)]

    def verify_batch_opening(self, proof, sumcheck_claims: list[Fr], transcript):
        """Verifies the batched reduction sumcheck; returns
        (r_sumcheck, gamma_powers)."""
        instances = self.sorted_reductions()
        assert len(sumcheck_claims) == len(instances), "claim count mismatch"
        for inst, c in zip(instances, sumcheck_claims):
            inst.sumcheck_claim = c
        r_sumcheck = BatchedSumcheck.verify(proof, instances, self, transcript)
        transcript.append_scalars(sumcheck_claims)
        gamma_powers = transcript.challenge_scalar_powers(len(sumcheck_claims))
        return r_sumcheck, gamma_powers

    def compute_joint_claim(self, r_sumcheck: list[Fr],
                            sumcheck_claims: list[Fr],
                            gamma_powers: list[Fr]) -> Fr:
        """Joint opening claim: shorter polys are embedded at the low indices
        of the joint polynomial, contributing a prod(1-r) prefix factor
        (reference opening_proof.rs:1016-1036)."""
        max_rounds = max(i.num_rounds() for i in self.sorted_reductions())
        total = Fr.zero()
        one = Fr.one()
        for gamma, claim, inst in zip(gamma_powers, sumcheck_claims,
                                      self.sorted_reductions()):
            prefix = one
            for r in r_sumcheck[: max_rounds - inst.num_rounds()]:
                prefix = prefix * (one - r)
            total = total + gamma * claim * prefix
        return total


def build_materialized_rlc(gamma_powers: list[Fr],
                           ordered_polys: list[tuple[CommittedPoly, MLPoly]],
                           poly_map) -> list[Fr]:
    """joint[i] = sum_j gamma_j * P_j[i] (zero-padded to the max length).

    `ordered_polys` aligns with gamma order (reference rlc_polynomial.rs:13).
    """
    max_len = max(len(poly_map[pid]) for pid, _ in ordered_polys)
    acc = vec.zeros(max_len)
    for gamma, (pid, _) in zip(gamma_powers, ordered_polys):
        p = poly_map[pid].to_field()
        contrib = vec.vscale(p, gamma)
        if len(p) < max_len:
            acc[: len(p)] = vec.vadd(acc[: len(p)], contrib)
        else:
            acc = vec.vadd(acc, contrib)
    return [Fr(int(x)) for x in acc]
