"""Evaluation reduction: N opening claims on one MLE -> 1 claim.

Reference: joltworks/src/subprotocols/evaluation_reduction.rs (PAZK line/
curve-restriction): for claims P(x_i) = v_i, i = 0..N-1, the prover sends the
univariate h(t) = P(l(t)) where l is the coordinate-wise degree-(N-1) curve
with l(i) = x_i. The verifier checks h(i) = v_i, draws x*, and both reduce to
the single claim P(l(x*)) = h(x*). Run per node to merge all consumer claims
on its output MLE before the node's own execution sumcheck
(jolt-atlas-core ops/eval_reduction.rs:15-66).
"""

from __future__ import annotations

from ..field.scalar import Fr, batch_inverse
from ..poly.mlpoly import MLPoly
from ..poly.unipoly import UniPoly, _interpolate_at_0_to_d


class EvalReductionProof:
    def __init__(self, h: UniPoly):
        self.h = h


def _curve_points(points: list[list[Fr]], t: Fr) -> list[Fr]:
    """Evaluate the coordinate-wise Lagrange curve l(t), l(i) = points[i]."""
    n = len(points)
    if n == 1:
        return list(points[0])
    # Lagrange basis at t over nodes 0..n-1
    nodes = [Fr(i) for i in range(n)]
    basis = []
    for i in range(n):
        num = Fr.one()
        den = Fr.one()
        for j in range(n):
            if j != i:
                num = num * (t - nodes[j])
                den = den * (nodes[i] - nodes[j])
        basis.append(num * den.inverse())
    dim = len(points[0])
    out = []
    for c in range(dim):
        acc = Fr.zero()
        for i in range(n):
            acc = acc + basis[i] * points[i][c]
        out.append(acc)
    return out


def prove_eval_reduction(poly: MLPoly, points: list[list[Fr]],
                         claims: list[Fr], transcript):
    """Returns (proof, new_point, new_claim). Requires >= 2 claims."""
    n = len(points)
    assert n >= 2
    nv = poly.num_vars
    deg_h = nv * (n - 1)
    # evaluate h at 0..deg_h and interpolate
    evals = []
    for e in range(deg_h + 1):
        pt = _curve_points(points, Fr(e))
        evals.append(poly.clone().evaluate(pt))
    h = UniPoly(_interpolate_at_0_to_d(evals))
    # absorb h, draw x*
    transcript.append_scalars(h.coeffs)
    x_star = transcript.challenge_scalar_optimized()
    new_point = _curve_points(points, x_star)
    new_claim = h.evaluate(x_star)
    return EvalReductionProof(h), new_point, new_claim


def verify_eval_reduction(proof: EvalReductionProof, points: list[list[Fr]],
                          claims: list[Fr], num_vars: int, transcript):
    """Returns (new_point, new_claim) or raises."""
    n = len(points)
    assert n >= 2
    if proof.h.degree() > num_vars * (n - 1):
        raise ValueError("eval reduction: h degree too large")
    for i, v in enumerate(claims):
        if proof.h.evaluate(Fr(i)) != v:
            raise ValueError(f"eval reduction: h({i}) != claim")
    transcript.append_scalars(proof.h.coeffs)
    x_star = transcript.challenge_scalar_optimized()
    return _curve_points(points, x_star), proof.h.evaluate(x_star)
