"""JAX executor for quantized computation graphs (the TPU forward path).

Compiles a Model's graph into a single jittable function mirroring the exact
fused i64-accumulate / Euclidean-floor-rebase / saturate semantics of the
numpy frontend (frontend/ops.py; reference atlas-onnx-tracer ops). Used as
the flagship forward step and as the device-side witness generator.

Static graph, static shapes: the returned function is pure and traced once
per input shape — XLA fuses the whole graph.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .frontend import ops as FOPS
from .frontend.graph import Model

I32_MIN = -(2**31)
I32_MAX = 2**31 - 1


def _clamp_i32(x):
    return jnp.clip(x, I32_MIN, I32_MAX).astype(jnp.int32)


def _floor_div_pow2(acc, bits):
    # Euclidean/floor division by 2^bits == arithmetic right shift
    return jnp.right_shift(acc, bits)


def exact_matmul_rescale(a, b, shift: int):
    """TPU-native exact i64 matmul + floor-shift + i32 saturate, in int32 ops.

    TPUs cannot lower s64 dot_general, so operands are decomposed into four
    8-bit limbs and multiplied as 16 int32 partial matmuls (the int8-MXU
    layout); the 64-bit accumulation is reconstructed as base-256 digits
    with an int32 carry cascade, then floor-shifted by `shift` and saturated
    — bit-exact with the reference's fused i64 semantics
    (atlas-onnx-tracer ops/mod.rs:187-311) without any 64-bit integers.

    Requires contraction depth K <= 2^13 (partial sums < 2^31).
    """
    assert a.shape[-1] <= (1 << 12), "contraction too deep for int32 partials"
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)

    def limbs(x):
        return [
            (x >> 0) & 0xFF,
            (x >> 8) & 0xFF,
            (x >> 16) & 0xFF,
            x >> 24,  # arithmetic: signed top limb
        ]

    al, bl = limbs(a), limbs(b)
    # digit sums D_t = sum_{i+j=t} A_i @ B_j  (t = 0..6)
    D = [None] * 7
    for i in range(4):
        for j in range(4):
            p = jax.lax.dot_general(
                al[i], bl[j], (((a.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            t = i + j
            D[t] = p if D[t] is None else D[t] + p
    return _digits_rescale_saturate(D, shift)


def _digits_rescale_saturate(D, shift: int):
    """Base-256 partial sums D_t (int32) -> floor(total/2^shift) sat. to i32."""
    # carry-normalize; |total| < 2^88, so after 12 digits the remaining
    # carry is pure sign (0 or -1)
    NDIG = 12
    digits = []
    carry = jnp.zeros_like(D[0])
    for t in range(NDIG):
        v = (D[t] if t < len(D) else jnp.zeros_like(carry)) + carry
        digits.append(jnp.mod(v, 256))
        carry = jnp.floor_divide(v, 256)

    # shift right by `shift` = 8*whole + frac; carry (sign) keeps its role
    whole, frac = divmod(shift, 8)
    digits = digits[whole:]
    ntop = len(digits)
    if frac:
        mask = (1 << frac) - 1
        r = carry & mask  # -1 & mask = mask: correct sign extension
        carry = jnp.right_shift(carry, frac)
        for t in range(ntop - 1, -1, -1):
            cur = r * 256 + digits[t]
            digits[t] = jnp.right_shift(cur, frac)
            r = cur & mask

    # saturate to i32: V = sum digits*2^{8t} + carry*2^{8*ntop} (carry sign)
    lo = (digits[0] + digits[1] * 256 + digits[2] * 65536
          + jnp.mod(digits[3], 128) * (1 << 24))
    top_zero = digits[4] == 0
    top_ones = digits[4] == 255
    for d in digits[5:]:
        top_zero = top_zero & (d == 0)
        top_ones = top_ones & (d == 255)
    in_pos = (carry == 0) & top_zero & (digits[3] < 128)
    in_neg = (carry == -1) & top_ones & (digits[3] >= 128)
    out = jnp.where(in_pos, lo,
                    jnp.where(in_neg, lo + jnp.int32(I32_MIN),
                              jnp.where(carry >= 0, jnp.int32(I32_MAX),
                                        jnp.int32(I32_MIN))))
    return out.astype(jnp.int32)


def saturating_add(a, b, sign: int = 1):
    """i32 a +- b with saturation, in pure int32 ops (TPU-safe)."""
    a = a.astype(jnp.int32)
    b = (b if sign > 0 else -b).astype(jnp.int32)
    s = a + b  # wrapping
    ovf = ((a ^ s) & (b ^ s)) < 0
    return jnp.where(ovf, jnp.where(a < 0, jnp.int32(I32_MIN),
                                    jnp.int32(I32_MAX)), s).astype(jnp.int32)


def exact_mul_rescale(a, b, shift: int):
    """Elementwise i32*i32 -> floor-shift -> i32 saturate without int64."""
    a = a.astype(jnp.int32)
    b = jnp.broadcast_to(b.astype(jnp.int32), a.shape)

    def limbs(x):
        return [(x >> 0) & 0xFF, (x >> 8) & 0xFF, (x >> 16) & 0xFF, x >> 24]

    al, bl = limbs(a), limbs(b)
    D = [None] * 7
    for i in range(4):
        for j in range(4):
            p = al[i] * bl[j]
            D[i + j] = p if D[i + j] is None else D[i + j] + p
    return _digits_rescale_saturate(D, shift)


def _node_fn(op, ins, consts):
    if isinstance(op, FOPS.Add):
        return saturating_add(ins[0], ins[1], 1)
    if isinstance(op, FOPS.Sub):
        return saturating_add(ins[0], ins[1], -1)
    if isinstance(op, FOPS.Mul):
        if op.scale == 0:
            acc = ins[0].astype(jnp.int32)
            for x in ins[1:]:
                acc = acc * x.astype(jnp.int32)  # raw path: known in-range
            return acc
        assert len(ins) == 2
        return exact_mul_rescale(ins[0], ins[1], op.scale)
    if isinstance(op, FOPS.Square):
        if op.scale == 0:
            a = ins[0].astype(jnp.int32)
            return a * a
        return exact_mul_rescale(ins[0], ins[0], op.scale)
    if isinstance(op, FOPS.Cube):
        a = ins[0].astype(jnp.int64)
        if op.scale == 0:
            return (a * a * a).astype(jnp.int32)
        return _clamp_i32(_floor_div_pow2(a * a * a, op.rebase_bits()))
    if isinstance(op, FOPS.Einsum):
        if op.equation.replace(" ", "") == "mk,kn->mn":
            return exact_matmul_rescale(ins[0], ins[1], op.scale)
        acc = jnp.einsum(op.equation, *[x.astype(jnp.int64) for x in ins])
        return _clamp_i32(_floor_div_pow2(acc, op.scale))
    if isinstance(op, FOPS.ReLU):
        return jnp.maximum(ins[0], 0).astype(jnp.int32)
    if isinstance(op, FOPS.Neg):
        return (-ins[0].astype(jnp.int64)).astype(jnp.int32)
    if isinstance(op, FOPS.Identity):
        return ins[0]
    if isinstance(op, FOPS.Reshape):
        return ins[0].reshape(tuple(op.shape))
    if isinstance(op, FOPS.Broadcast):
        return jnp.broadcast_to(ins[0], tuple(op.shape)).astype(jnp.int32)
    if isinstance(op, FOPS.MoveAxis):
        return jnp.moveaxis(ins[0], op.source, op.destination)
    if isinstance(op, FOPS.Slice):
        sl = [slice(None)] * ins[0].ndim
        sl[op.axis] = slice(op.start, op.end)
        return ins[0][tuple(sl)]
    if isinstance(op, FOPS.Concat):
        rank = ins[0].ndim
        axis = op.axis if op.axis >= 0 else op.axis + rank
        return jnp.concatenate(ins, axis=axis)
    if isinstance(op, (FOPS.GatherSmall, FOPS.GatherLarge)):
        return jnp.take(ins[0], ins[1].astype(jnp.int32), axis=0)
    if isinstance(op, FOPS.Sum):
        acc = jnp.sum(ins[0].astype(jnp.int64), axis=tuple(op.axes),
                      keepdims=True)
        return _clamp_i32(acc)
    if isinstance(op, FOPS.MeanOfSquares):
        a = ins[0].astype(jnp.int64)
        acc = jnp.sum(a * a, axis=tuple(op.axes), keepdims=True)
        return _clamp_i32(jnp.floor_divide(acc, op.divisor()))
    if isinstance(op, FOPS.Iff):
        return jnp.where(ins[0] != 0, ins[1], ins[2]).astype(jnp.int32)
    if isinstance(op, FOPS.And):
        return ((ins[0] != 0) & (ins[1] != 0)).astype(jnp.int32)
    if isinstance(op, FOPS.Clamp):
        a = ins[0]
        if a.ndim == 1:
            mx = jnp.max(a)
        else:
            mx = jnp.max(a, axis=-1, keepdims=True)
        return jnp.maximum(a, mx - op.max_spread).astype(jnp.int32)
    raise NotImplementedError(f"jaxexec: {op.name} (f64-LUT ops run on host)")


def compile_forward(model: Model):
    """Returns a jittable fn(inputs...) -> tuple of output tensors."""
    graph = model.graph
    nodes = graph.sorted_nodes()
    consts = {
        n.idx: jnp.asarray(n.operator.array)
        for n in nodes if isinstance(n.operator, FOPS.Constant)
    }

    def forward(*inputs):
        vals = dict(consts)
        for idx, x in zip(graph.inputs, inputs):
            vals[idx] = x
        for node in nodes:
            if isinstance(node.operator, (FOPS.Input, FOPS.Constant)):
                continue
            ins = [vals[i] for i in node.inputs]
            vals[node.idx] = _node_fn(node.operator, ins, consts)
        return tuple(vals[i] for i in graph.outputs)

    return forward


def example_mlp(scale: int = 8, batch: int = 8, din: int = 64, dh: int = 128,
                dout: int = 32, seed: int = 0):
    """Flagship demo model: quantized 2-layer MLP."""
    from .frontend import ModelBuilder
    from .frontend.quantize import quantize_tensor
    rng = np.random.default_rng(seed)
    b = ModelBuilder(scale=scale)
    x = b.input([batch, din])
    w1 = b.constant(quantize_tensor(rng.normal(size=(din, dh)) * 0.2, scale))
    h = b.matmul(x, w1)
    bias = b.constant(quantize_tensor(rng.normal(size=(batch, dh)) * 0.05, scale))
    a = b.relu(b.add(h, bias))
    w2 = b.constant(quantize_tensor(rng.normal(size=(dh, dout)) * 0.2, scale))
    out = b.matmul(a, w2)
    b.output(out)
    model = b.build()
    xq = quantize_tensor(rng.normal(size=(batch, din)), scale)
    return model, xq
