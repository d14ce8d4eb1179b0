"""Tensor-kernel library tests (frontend/tensor_kernels.py) —
the reference's tensor/ops.rs conv/pool/reduction/nonlinearity surface."""

import numpy as np

from jolt_atlas_tpu.frontend import tensor_kernels as TK

rng = np.random.default_rng(0x7e50)
S = 8


def _deq(a):
    return np.asarray(a, dtype=np.float64) / (1 << S)


def test_conv2d_matches_float():
    x = rng.integers(-1000, 1000, size=(3, 8, 8)).astype(np.int32)
    w = rng.integers(-200, 200, size=(5, 3, 3, 3)).astype(np.int32)
    y = TK.conv2d(x, w, S)
    xf, wf = _deq(x), _deq(w)
    ref = np.zeros((5, 6, 6))
    for co in range(5):
        for i in range(6):
            for j in range(6):
                ref[co, i, j] = (xf[:, i:i + 3, j:j + 3] * wf[co]).sum()
    assert np.abs(_deq(y) - ref).max() < 2.0 / (1 << S)


def test_conv2d_stride_padding_bias():
    x = rng.integers(-500, 500, size=(2, 9, 9)).astype(np.int32)
    w = rng.integers(-100, 100, size=(4, 2, 3, 3)).astype(np.int32)
    b = rng.integers(-50, 50, size=4).astype(np.int32)
    y = TK.conv2d(x, w, S, bias=b, stride=(2, 2), padding=(1, 1))
    assert y.shape == (4, 5, 5)


def test_deconv2d_inverts_shape():
    x = rng.integers(-300, 300, size=(3, 4, 4)).astype(np.int32)
    w = rng.integers(-100, 100, size=(3, 2, 3, 3)).astype(np.int32)
    y = TK.deconv2d(x, w, S, stride=(2, 2))
    assert y.shape == (2, 9, 9)


def test_pooling():
    x = rng.integers(-1000, 1000, size=(2, 6, 6)).astype(np.int32)
    mp = TK.max_pool2d(x, (2, 2))
    ap = TK.avg_pool2d(x, S, (2, 2))
    assert mp.shape == ap.shape == (2, 3, 3)
    assert mp[0, 0, 0] == x[0, :2, :2].max()
    assert ap[0, 0, 0] == x[0, :2, :2].astype(np.int64).sum() // 4
    assert (mp >= ap).all()


def test_reductions_and_logic():
    x = rng.integers(-50, 50, size=(4, 6)).astype(np.int32)
    assert (TK.argmax_axis(x, 1) == np.argmax(x, axis=1)).all()
    assert (TK.argmin_axis(x, 0) == np.argmin(x, axis=0)).all()
    assert (TK.downsample(x, 1, 2) == x[:, ::2]).all()
    a, b = x, np.roll(x, 1)
    assert (TK.greater(a, b) == (a > b)).all()
    assert (TK.equals(a, a) == 1).all()
    assert (TK.logical_xor(a != 0, 0) == (a != 0)).all()
    assert (TK.kronecker_delta(a, a, S) == (1 << S)).all()


def test_prod_axes_matches_sequential_mul():
    x = rng.integers(100, 400, size=(3, 4)).astype(np.int32)
    y = TK.prod_axes(x, S, (1,))
    ref = x[:, 0].astype(np.int64)
    for i in range(1, 4):
        ref = np.floor_divide(ref * x[:, i], 1 << S)
    assert (y == ref).all()


def test_nonlinearities_roundtrip():
    x = rng.integers(-2 << S, 2 << S, size=32).astype(np.int32)
    xf = _deq(x)
    tol = 2.0 / (1 << S)
    from jolt_atlas_tpu.frontend.nonlinearities import erf_f64
    gelu_ref = 0.5 * xf * (1 + erf_f64(xf / np.sqrt(2)))
    assert np.abs(_deq(TK.gelu(x, S)) - gelu_ref).max() < tol
    assert np.abs(_deq(TK.exp(np.minimum(x, 1 << S), S))
                  - np.exp(np.minimum(xf, 1.0))).max() < tol
    pos = np.abs(x) + 1
    assert np.abs(_deq(TK.sqrt(pos, S)) - np.sqrt(_deq(pos))).max() < tol
    assert np.abs(_deq(TK.arctan(x, S)) - np.arctan(xf)).max() < tol
    assert np.abs(_deq(TK.softplus(x, S))
                  - np.log1p(np.exp(-np.abs(xf)))
                  - np.maximum(xf, 0)).max() < tol


def test_range_check_percent():
    a = np.array([100, 200, 300], dtype=np.int32)
    b = np.array([100, 210, 300], dtype=np.int32)
    assert TK.range_check_percent(a, b, 1.0) == 1 / 3
    assert TK.range_check_percent(a, b, 10.0) == 0.0
