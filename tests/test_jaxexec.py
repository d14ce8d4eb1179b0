"""JAX executor must be bit-exact with the numpy frontend interpreter."""

import numpy as np
import jax
import jax.numpy as jnp

from jolt_atlas_tpu import jaxexec
from jolt_atlas_tpu.frontend import ModelBuilder
from jolt_atlas_tpu.frontend.quantize import quantize_tensor

rng = np.random.default_rng(21)


def check_model(model, inputs):
    want = model.forward(inputs)
    fn = jax.jit(jaxexec.compile_forward(model))
    got = fn(*[jnp.asarray(x) for x in inputs])
    for w, g in zip(want, got):
        assert (np.asarray(g) == w).all(), f"jaxexec mismatch:\n{np.asarray(g)}\nvs\n{w}"


class TestJaxExec:
    def test_exact_matmul_saturation(self):
        a = (np.ones((4, 16)) * (2**27 - 1)).astype(np.int32)
        b = (np.ones((16, 4)) * (2**27 - 1)).astype(np.int32)
        for S in (8, 12):
            want = np.clip(
                np.floor_divide(a.astype(np.int64) @ b.astype(np.int64), 1 << S),
                -(2**31), 2**31 - 1).astype(np.int32)
            got = np.asarray(jaxexec.exact_matmul_rescale(jnp.asarray(a),
                                                          jnp.asarray(b), S))
            assert (got == want).all()

    def test_saturating_add(self):
        a = np.array([2**31 - 1, -(2**31), 5, -7], dtype=np.int32)
        b = np.array([10, -10, 3, 7], dtype=np.int32)
        got = np.asarray(jaxexec.saturating_add(jnp.asarray(a), jnp.asarray(b)))
        want = np.clip(a.astype(np.int64) + b, -(2**31), 2**31 - 1)
        assert (got == want).all()
        got = np.asarray(jaxexec.saturating_add(jnp.asarray(a), jnp.asarray(b), -1))
        want = np.clip(a.astype(np.int64) - b, -(2**31), 2**31 - 1)
        assert (got == want).all()

    def test_mlp_matches_frontend(self):
        model, xq = jaxexec.example_mlp(batch=4, din=32, dh=32, dout=16)
        check_model(model, [xq])

    def test_mixed_ops(self):
        s = 8
        b = ModelBuilder(scale=s)
        x = b.input([4, 8])
        c = b.constant(quantize_tensor(rng.normal(size=(4, 8)), s))
        m = b.mul(x, c)
        sq = b.square(m)
        r = b.relu(b.sub(sq, c))
        out = b.reshape(r, [32])
        b.output(out)
        check_model(b.build(), [quantize_tensor(rng.normal(size=(4, 8)), s)])

    def test_gather_iff_concat(self):
        b = ModelBuilder()
        dict_w = b.constant(rng.integers(-50, 50, size=(8, 4)).astype(np.int32))
        idx = b.input([4])
        g = b.gather(dict_w, idx)
        g2 = b.move_axis(g, 0, 1)
        cc = b.concat([g, b.move_axis(g2, 0, 1)], axis=1)
        b.output(cc)
        check_model(b.build(), [np.array([1, 0, 7, 3], dtype=np.int32)])
