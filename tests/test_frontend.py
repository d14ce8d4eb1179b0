import math

import numpy as np

from jolt_atlas_tpu.frontend import ModelBuilder
from jolt_atlas_tpu.frontend import ops as OPS
from jolt_atlas_tpu.frontend import nonlinearities as nl
from jolt_atlas_tpu.frontend.quantize import (
    dequantize,
    mask_sentinel_magnitude,
    quantize_tensor,
    scale_to_multiplier,
)
from jolt_atlas_tpu.frontend.softmax import (
    generate_exp_lut_decomposed,
    softmax_last_axis_decomposed,
)

rng = np.random.default_rng(12)


class TestQuantize:
    def test_roundtrip(self):
        x = np.array([0.5, -0.25, 1.0, 0.0, 3.14159])
        q = quantize_tensor(x, 8)
        assert q.dtype == np.int32
        back = dequantize(q, 8)
        assert np.abs(back - x).max() <= 1 / 256 + 1e-12

    def test_extreme_mask_sentinel(self):
        q = quantize_tensor(np.array([-3.4e38]), 8)
        assert q[0] == -int(mask_sentinel_magnitude(8)) * 256

    def test_zero_preservation(self):
        q = quantize_tensor(np.array([1e-9, -1e-9, 0.0]), 8)
        assert list(q) == [1, -1, 0]


class TestFusedSemantics:
    def test_add_saturates(self):
        a = np.array([2**31 - 1, 5], dtype=np.int32)
        b = np.array([100, 7], dtype=np.int32)
        out = OPS.Add().f([a, b])
        assert out[0] == 2**31 - 1 and out[1] == 12

    def test_sub_saturates_negative(self):
        a = np.array([-(2**31) + 1], dtype=np.int32)
        b = np.array([100], dtype=np.int32)
        out = OPS.Sub().f([a, b])
        assert out[0] == -(2**31)

    def test_mul_floor_rebase_negative(self):
        # -5 * 3 = -15; floor(-15 / 4) = -4 (Euclidean), remainder 1
        a = np.array([-5], dtype=np.int32)
        b = np.array([3], dtype=np.int32)
        out = OPS.Mul(scale=2).f([a, b])
        assert out[0] == -4
        q, r = OPS.Mul(scale=2).intermediate_and_remainder([a, b])
        assert q[0] == -4 and r[0] == 1
        assert q[0] * 4 + r[0] == -15

    def test_einsum_matches_float_reference(self):
        s = 8
        m = 1 << s
        a_f = rng.normal(size=(4, 8))
        b_f = rng.normal(size=(8, 4))
        a = quantize_tensor(a_f, s)
        b = quantize_tensor(b_f, s)
        out = OPS.Einsum(equation="mk,kn->mn", scale=s).f([a, b])
        got = dequantize(out, s)
        want = a_f @ b_f
        assert np.abs(got - want).max() < 0.15

    def test_einsum_remainder_identity(self):
        a = rng.integers(-1000, 1000, size=(3, 5)).astype(np.int32)
        b = rng.integers(-1000, 1000, size=(5, 2)).astype(np.int32)
        op = OPS.Einsum(equation="mk,kn->mn", scale=6)
        q, r = op.intermediate_and_remainder([a, b])
        acc = np.einsum("mk,kn->mn", a.astype(np.int64), b.astype(np.int64))
        assert (q * 64 + r == acc).all()
        assert (r >= 0).all() and (r < 64).all()

    def test_div_euclid(self):
        a = np.array([-7, 7, -7, 7], dtype=np.int32)
        b = np.array([2, 2, -2, -2], dtype=np.int32)
        out = OPS.Div().f([a, b])
        # floor division semantics
        assert list(out) == [-4, 3, 3, -4]

    def test_rsqrt(self):
        s = 8
        x = quantize_tensor(np.array([4.0]), s)
        out = OPS.Rsqrt(scale=s).f([x])
        # 1/sqrt(4) = 0.5 -> 128 at scale 8
        assert abs(int(out[0]) - 128) <= 1

    def test_relu(self):
        x = np.array([-5, 0, 7], dtype=np.int32)
        assert list(OPS.ReLU().f([x])) == [0, 0, 7]


class TestActivations:
    def test_tanh_quantized(self):
        s = 8
        x_f = np.linspace(-3, 3, 16)
        x = quantize_tensor(x_f, s)
        out = OPS.Tanh(scale=s, tau=2, log_table=16).f([x])
        want = np.tanh(dequantize(x, s))
        assert np.abs(dequantize(out, s) - want).max() < 0.02

    def test_sigmoid_quantized(self):
        s = 8
        x = quantize_tensor(np.linspace(-4, 4, 10), s)
        out = OPS.Sigmoid(scale=s, tau=2, log_table=16).f([x])
        want = 1 / (1 + np.exp(-dequantize(x, s)))
        assert np.abs(dequantize(out, s) - want).max() < 0.02

    def test_erf_chebyshev_close_to_math_erf(self):
        xs = np.linspace(-3, 3, 50)
        got = nl.erf_f64(xs)
        want = np.array([math.erf(v) for v in xs])
        assert np.abs(got - want).max() < 1e-10

    def test_trig_periodicity_teleport(self):
        s = 8
        x = quantize_tensor(np.array([0.7, -1.2, 9.9]), s)
        out = OPS.Sin(scale=s).f([x])
        want = np.sin(dequantize(x, s))
        assert np.abs(dequantize(out, s) - want).max() < 0.05


class TestSoftmax:
    def test_softmax_sums_to_one(self):
        s = 256
        x = rng.integers(-500, 500, size=(4, 8)).astype(np.int32)
        out, trace = softmax_last_axis_decomposed(x, s)
        sums = out.astype(np.float64).sum(axis=1) / s
        assert np.abs(sums - 1.0).max() < 0.05
        # witness identities
        flat = out.reshape(-1).astype(np.int64)
        prod = trace.exp_q.astype(np.int64) * np.repeat(trace.inv_sum, 8).astype(np.int64)
        assert (flat * s + trace.R == prod).all()
        assert (trace.R >= 0).all() and (trace.R < s).all()
        assert (trace.r_exp >= 0).all() and (trace.r_exp < s).all()

    def test_exp_lut_decomposition_identity(self):
        s = 256
        lut = generate_exp_lut_decomposed(s)
        # z_c reconstruction over the full range
        z_bound = len(lut.lut_hi) * lut.base
        for z in range(0, z_bound, 37):
            hi, lo = z >> lut.log2_base, z & (lut.base - 1)
            assert hi * lut.base + lo == z

    def test_softmax_matches_float(self):
        s = 256
        x_f = rng.normal(size=(2, 8))
        x = quantize_tensor(x_f, 8)
        out, _ = softmax_last_axis_decomposed(x, s)
        want = np.exp(x_f) / np.exp(x_f).sum(axis=1, keepdims=True)
        got = out.astype(np.float64) / s
        assert np.abs(got - want).max() < 0.03


class TestModelBuilder:
    def test_mlp_forward(self):
        s = 8
        b = ModelBuilder(scale=s)
        x = b.input([4, 8])
        w_f = rng.normal(size=(8, 4)) * 0.5
        w = b.constant(quantize_tensor(w_f, s))
        h = b.matmul(x, w)
        r = b.relu(h)
        b.output(r)
        model = b.build()

        x_f = rng.normal(size=(4, 8))
        xq = quantize_tensor(x_f, s)
        out = model.forward([xq])[0]
        want = np.maximum(x_f @ w_f, 0)
        assert np.abs(dequantize(out, s) - want).max() < 0.1

    def test_trace_captures_all_nodes(self):
        b = ModelBuilder()
        x = b.input([2, 2])
        y = b.relu(x)
        z = b.add(x, y)
        b.output(z)
        model = b.build()
        tr = model.trace([np.array([[1, -2], [3, -4]], dtype=np.int32)])
        assert set(tr.node_outputs) == {0, 1, 2}
        assert (tr.output(2) == np.array([[2, -2], [6, -4]])).all()

    def test_gather(self):
        b = ModelBuilder()
        dict_w = b.constant(np.arange(16).reshape(4, 4).astype(np.int32))
        idx = b.input([2])
        g = b.gather(dict_w, idx)
        b.output(g)
        model = b.build()
        out = model.forward([np.array([2, 0], dtype=np.int32)])[0]
        assert (out == np.array([[8, 9, 10, 11], [0, 1, 2, 3]])).all()

    def test_shapes_ops(self):
        b = ModelBuilder()
        x = b.input([2, 4])
        r = b.reshape(x, [4, 2])
        m = b.move_axis(r, 0, 1)
        sl = b.slice(m, 1, 0, 2)
        b.output(sl)
        model = b.build()
        out = model.forward([np.arange(8).reshape(2, 4).astype(np.int32)])[0]
        want = np.moveaxis(np.arange(8).reshape(4, 2), 0, 1)[:, 0:2]
        assert (out == want).all()

    def test_layernorm_style(self):
        # x / sqrt(mean(x^2)) via mean_of_squares + rsqrt + mul
        s = 8
        b = ModelBuilder(scale=s)
        x = b.input([2, 8])
        mos = b.mean_of_squares(x, [1])
        rs = b.rsqrt(mos)
        bc = b.broadcast(rs, [2, 8])
        out = b.mul(x, bc)
        b.output(out)
        model = b.build()
        x_f = rng.normal(size=(2, 8)) + 0.5
        xq = quantize_tensor(x_f, s)
        got = dequantize(model.forward([xq])[0], s)
        want = x_f / np.sqrt((x_f**2).mean(axis=1, keepdims=True))
        assert np.abs(got - want).max() < 0.15
