"""Per-table MLE tests, mirroring the reference's lookup-table tier
(joltworks/src/lookup_tables/*: every table asserts materialize_entry ==
evaluate_mle on Boolean points, exhaustively at small sizes).

Here the analogous contracts are:
  * table_vec(spec) entry k == MLE of the table evaluated at bits(k),
    exhaustively for every named and parametric chunk-table spec;
  * the verifier's memoized table evaluation (_table_mle_eval) matches a
    fresh MLPoly evaluation at random field points;
  * the 2^16 neural-teleport activation tables agree with the frontend's
    quantized nonlinearities (reference neural_teleport/mod.rs
    define_signed_activation_table!) at sampled entries;
  * the decomposed exp LUT satisfies its defining rounding law
    (atlas-onnx-tracer ops/softmax.rs:238 generate_exp_lut_decomposed).
"""

import math

import numpy as np
import pytest

from jolt_atlas_tpu.field.scalar import Fr
from jolt_atlas_tpu.poly.mlpoly import MLPoly
from jolt_atlas_tpu.subprotocols import onehot
from jolt_atlas_tpu.subprotocols.onehot import table_vec, _table_mle_eval

rng = np.random.default_rng(0xAB1E)

NAMED = ["identity", "one", "msb", "notmsb", "eq0", "eq15"]
PARAMETRIC = ([("ltc", b) for b in (0, 1, 7, 15, 16)]
              + [("eqc", b) for b in (0, 3, 15)]
              + [("lut", (5, 0, 9, 2, 2, 7)), ("lut", tuple(range(31)))]
              + [("onesN", 64), ("identN", 256)])


def _bits_point(k: int, nv: int) -> list[Fr]:
    """Boolean point for index k, MSB-first (MLPoly index convention)."""
    return [Fr((k >> (nv - 1 - i)) & 1) for i in range(nv)]


@pytest.mark.parametrize("spec", NAMED + PARAMETRIC,
                         ids=[str(s) for s in NAMED + PARAMETRIC])
def test_table_mle_matches_entries_exhaustive(spec):
    vec = table_vec(spec)
    nv = len(vec).bit_length() - 1
    assert len(vec) == 1 << nv
    for k in range(len(vec)):
        got = MLPoly(ints=vec.copy()).evaluate(_bits_point(k, nv))
        assert got == Fr(int(vec[k])), (spec, k)


@pytest.mark.parametrize("spec", NAMED, ids=NAMED)
def test_table_mle_memo_matches_fresh(spec):
    vec = table_vec(spec)
    nv = len(vec).bit_length() - 1
    for trial in range(3):
        r = [Fr(int(rng.integers(1, 1 << 62))) for _ in range(nv)]
        memo = _table_mle_eval(spec, r)
        fresh = MLPoly(ints=vec.copy()).evaluate(list(r))
        assert memo == fresh
        # second lookup must hit the cache and stay equal
        assert _table_mle_eval(spec, r) == fresh


def test_teleport_tables_match_frontend_nonlinearities():
    from jolt_atlas_tpu.frontend import nonlinearities as nl
    from jolt_atlas_tpu.frontend import ops as FOPS
    from jolt_atlas_tpu.frontend.quantize import scale_to_multiplier
    from jolt_atlas_tpu.zkops.ops import _teleport_table

    scale = 8
    S = scale_to_multiplier(scale)
    tau = 2  # reference handlers/activation.rs:17-41 at scale 8
    for op_cls in (FOPS.Tanh, FOPS.Erf, FOPS.Sigmoid):
        op = op_cls(scale=scale, tau=tau, log_table=16)
        table = _teleport_table(op)
        assert len(table) == 1 << 16
        # sampled entries: the table at index i must equal the quantized
        # nonlinearity of the teleported (q * tau) input
        idxs = np.concatenate([
            np.array([0, 1, (1 << 15) - 1, 1 << 15, (1 << 16) - 1]),
            rng.integers(0, 1 << 16, size=64),
        ])
        for i in idxs:
            i = int(i)
            q = i - (1 << 16) if i >= (1 << 15) else i
            tele = q * op.tau
            if isinstance(op, FOPS.Tanh):
                lo = -(1 << (op.log_table - 1))
                hi = (1 << (op.log_table - 1)) - 1
                tele = min(max(tele, lo), hi)
                want = nl.tanh(np.array([tele], dtype=np.int32), S)[0]
            elif isinstance(op, FOPS.Erf):
                want = nl.erffunc(np.array([tele], dtype=np.int32), S)[0]
            else:
                want = nl.sigmoid(np.array([tele], dtype=np.int32), S)[0]
            assert table[i] == want, (op_cls.__name__, i)
        # sign structure: tanh is odd around 0 -> negative inputs give
        # non-positive outputs; sigmoid stays within [0, S]
        if op_cls is FOPS.Sigmoid:
            assert table.min() >= 0 and table.max() <= S


def test_exp_lut_decomposition_law():
    from jolt_atlas_tpu.frontend.softmax import generate_exp_lut_decomposed
    for scale in (256, 4096):
        d = generate_exp_lut_decomposed(scale)
        base = d.base
        assert base == 1 << d.log2_base
        assert len(d.lut_lo) == base
        sf = float(scale)
        # defining law: lut_hi[h] = round(S e^{-hB/S}), lut_lo[l] = round(S e^{-l/S})
        for h in range(len(d.lut_hi)):
            want = max(0, int(math.floor(sf * math.exp(-(h * base) / sf) + 0.5)))
            assert int(d.lut_hi[h]) == want
        for loidx in range(base):
            want = max(0, int(math.floor(sf * math.exp(-loidx / sf) + 0.5)))
            assert int(d.lut_lo[loidx]) == want
        # monotone non-increasing, and hi table reaches (near) zero so the
        # decomposition covers the active exponent range
        assert (np.diff(d.lut_hi) <= 0).all()
        assert (np.diff(d.lut_lo) <= 0).all()
        assert d.lut_hi[-1] <= 1


def test_derived_cycle_array_gathers():
    chunks = rng.integers(0, 16, size=64)
    for spec in ("identity", "msb", ("ltc", 9)):
        got = onehot.derived_cycle_array(spec, chunks)
        want = table_vec(spec)[chunks]
        assert (got == want).all()
