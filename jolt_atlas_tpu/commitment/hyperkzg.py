"""HyperKZG: multilinear PCS via the Gemini univariate transform + KZG.

Protocol mirror of reference joltworks/src/poly/commitment/hyperkzg/mod.rs
(itself a port of Nova's hyperkzg):

open(poly, point):                                     (mod.rs:400-448)
  1. Fold chain: P_0 = poly; P_{i+1}[j] =
     point[ell-1-i] * (P_i[2j+1] - P_i[2j]) + P_i[2j]   (ell-1 polys)
  2. Commit P_1..P_{ell-1}; absorb commitments; r = challenge_scalar.
  3. u = [r, -r, r^2]; evaluate every P_i as a univariate at each u_j
     (v matrix, absorbed); q = challenge powers; B = sum q^i P_i;
     W_j = KZG witness of B at u_j; absorb W; squeeze dummy d_0.

verify(C, point, y, proof):                            (mod.rs:451-514)
  - re-derive r/q/d challenges, check the fold consistency relation
      2 r Y[i+1] = r (1 - x_{ell-1-i}) (ypos_i + yneg_i)
                   + x_{ell-1-i} (ypos_i - yneg_i)
    with Y = v[2] ++ [y], then one combined pairing check
      e(L, g2) == e(R, tau_g2).
"""

from __future__ import annotations

from ..field.constants import FR_MODULUS
from ..field.scalar import Fr
from ..curve.msm import msm
from ..curve.points import G1
from .kzg import KZGSRS, eval_as_univariate, kzg_commit, kzg_open_no_rem


def _msm_batch_packed(prep, packed: list[bytes]):
    return prep.msm_batch_packed(packed)


class HyperKZGProof:
    def __init__(self, com: list[G1], w: list[G1], v: list[list[Fr]]):
        self.com = com  # ell - 1 fold commitments
        self.w = w      # 3 KZG witnesses
        self.v = v      # 3 x ell evaluation matrix

    def serialize(self) -> bytes:
        out = len(self.com).to_bytes(8, "little")
        for p in self.com:
            out += p.serialize()
        for p in self.w:
            out += p.serialize()
        out += len(self.v[0]).to_bytes(8, "little") if self.v else (0).to_bytes(8, "little")
        for row in self.v:
            for x in row:
                out += x.to_bytes_le()
        return out

    @classmethod
    def deserialize(cls, data: bytes, offset: int = 0):
        ncom = int.from_bytes(data[offset:offset + 8], "little")
        offset += 8
        com = []
        for _ in range(ncom):
            com.append(G1.deserialize(data[offset:offset + 64]))
            offset += 64
        w = []
        for _ in range(3):
            w.append(G1.deserialize(data[offset:offset + 64]))
            offset += 64
        ell = int.from_bytes(data[offset:offset + 8], "little")
        offset += 8
        v = []
        for _ in range(3):
            row = []
            for _ in range(ell):
                row.append(Fr.from_bytes_le(data[offset:offset + 32]))
                offset += 32
            v.append(row)
        return cls(com, w, v), offset


class HyperKZG:
    @staticmethod
    def commit(srs: KZGSRS, coeffs) -> G1:
        return kzg_commit(srs, coeffs)

    @staticmethod
    def open(srs: KZGSRS, coeffs, point: list[Fr], transcript) -> HyperKZGProof:
        """coeffs: FrArray (native fast path) or list[Fr] (fallback)."""
        from ..field.frvec import FrArray
        ell = len(point)
        n = len(coeffs)
        assert n == 1 << ell

        native = isinstance(coeffs, FrArray)
        if native:
            polys = [coeffs]
            for i in range(ell - 1):
                # P_{i+1}[j] = P_i[2j] + x * (P_i[2j+1] - P_i[2j])
                polys.append(polys[i].bind_halves(0, point[ell - i - 1],
                                                  interleaved=True))
            assert len(polys[-1]) == 2
        else:
            polys = [list(coeffs)]
            for i in range(ell - 1):
                prev = polys[i]
                x = point[ell - i - 1]
                nxt = [prev[2 * j] + x * (prev[2 * j + 1] - prev[2 * j])
                       for j in range(len(prev) // 2)]
                polys.append(nxt)
            assert len(polys[-1]) == 2

        prep = srs.prepared_bases()
        if native and prep is not None and len(polys) > 1:
            # all folds exist before any is absorbed: one batched MSM call
            packed = [p.canonical().tobytes() for p in polys[1:]]
            com = _msm_batch_packed(prep, packed)
        else:
            com = [kzg_commit(srs, p) for p in polys[1:]]
        transcript.append_points(com)
        r = transcript.challenge_scalar()
        u = [r, Fr.zero() - r, r * r]

        # v[i][j] = polys[j] evaluated as univariate at u[i]
        v = [[eval_as_univariate(p, ui) for p in polys] for ui in u]
        flat = [x for row in v for x in row]
        transcript.append_scalars(flat)
        q_powers = transcript.challenge_scalar_powers(len(polys))

        # B = sum_j q^j * polys[j] (padded to len of polys[0])
        if native:
            b = FrArray.zeros(n)
            for qp, p in zip(q_powers, polys):
                b.axpy_inplace(qp, p)
        else:
            bi = [0] * n
            for qp, p in zip(q_powers, polys):
                qv = qp.v
                for idx, c in enumerate(p):
                    bi[idx] = (bi[idx] + qv * c.v) % FR_MODULUS
            b = [Fr(x) for x in bi]

        if native and prep is not None:
            from ..field import frvec
            packed = [frvec.syndiv(b, ui).canonical().tobytes() for ui in u]
            w = _msm_batch_packed(prep, packed)
        else:
            w = [kzg_open_no_rem(srs, b, ui) for ui in u]
        transcript.append_points(w)
        transcript.challenge_scalar()  # d_0, keeps transcripts in lockstep

        return HyperKZGProof(com, w, v)

    @staticmethod
    def verify(srs: KZGSRS, commitment: G1, point: list[Fr], claimed_eval: Fr,
               proof: HyperKZGProof, transcript) -> bool:
        ell = len(point)
        com = list(proof.com)
        transcript.append_points(com)
        r = transcript.challenge_scalar()
        if r.is_zero() or commitment.is_zero():
            return False
        com.insert(0, commitment)
        u = [r, Fr.zero() - r, r * r]

        v = proof.v
        if len(v) != 3 or any(len(row) != ell for row in v):
            return False
        ypos, yneg = v[0], v[1]
        Y = list(v[2]) + [claimed_eval]

        two = Fr(2)
        one = Fr.one()
        for i in range(ell):
            x = point[ell - i - 1]
            lhs = two * r * Y[i + 1]
            rhs = r * (one - x) * (ypos[i] + yneg[i]) + x * (ypos[i] - yneg[i])
            if lhs != rhs:
                return False

        return HyperKZG._kzg_verify_batch(srs, com, proof.w, u, v, transcript)

    @staticmethod
    def _kzg_verify_batch(srs: KZGSRS, C: list[G1], W: list[G1], u: list[Fr],
                          v: list[list[Fr]], transcript) -> bool:
        k = len(C)
        flat = [x for row in v for x in row]
        transcript.append_scalars(flat)
        q_powers = transcript.challenge_scalar_powers(k)
        transcript.append_points(W)
        d0 = transcript.challenge_scalar()
        d1 = d0 * d0

        if len(W) != 3 or len(u) != 3:
            return False

        mult = Fr.one() + d0 + d1
        q_mult = [q * mult for q in q_powers]
        # B(u_i) = sum_j q^j v[i][j]
        B_u = []
        for row in v:
            acc = Fr.zero()
            for a, b in zip(row, q_powers):
                acc = acc + a * b
            B_u.append(acc)

        bases = C + [W[0], W[1], W[2], srs.g1_powers[0]]
        scalars = [q.v for q in q_mult] + [
            u[0].v,
            (u[1] * d0).v,
            (u[2] * d1).v,
            (Fr.zero() - (B_u[0] + d0 * B_u[1] + d1 * B_u[2])).v,
        ]
        L = msm(bases, scalars)
        R = W[0] + W[1] * d0.v + W[2] * d1.v

        from ..curve.pairing import pairing_check
        # e(L, g2) * e(-R, beta_g2) == 1
        return pairing_check([(L, srs.g2), (-R, srs.beta_g2)])
