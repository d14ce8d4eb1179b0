"""ONNX model loading: parse, quantize, build the computation graph.

The tract-onnx replacement (reference atlas-onnx-tracer/src/model/load.rs +
node/handlers/): each ONNX node is mapped through a handler registry onto
the quantized operator set, float initializers are quantized to i32 at the
model scale, symbolic dims are concretized from RunArgs-style variables, and
every dimension is padded to a power of two (weights zero-padded; exact for
contractions/elementwise ops, approximate for softmax axes — the same
padding contract as the reference's load.rs:504 `pad`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import DEFAULT_SCALE
from .builder import ModelBuilder
from .graph import Model
from .onnx_proto import parse_onnx
from .quantize import quantize_tensor


@dataclass
class RunArgs:
    variables: dict = field(default_factory=dict)  # dim_param -> value
    scale: int = DEFAULT_SCALE
    pad_to_power_of_two: bool = True


def _pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def _pad_dims(dims, pad: bool):
    return [(_pow2(d) if pad else d) for d in dims]


def _pad_array(arr: np.ndarray, pad: bool) -> np.ndarray:
    if not pad:
        return arr
    target = [_pow2(d) for d in arr.shape]
    widths = [(0, t - s) for s, t in zip(arr.shape, target)]
    return np.pad(arr, widths, mode="constant")


class OnnxLoader:
    def __init__(self, run_args: RunArgs | None = None):
        self.ra = run_args or RunArgs()

    def load_bytes(self, data: bytes) -> Model:
        g = parse_onnx(data)
        b = ModelBuilder(scale=self.ra.scale)
        wires: dict[str, int] = {}
        raw_consts: dict[str, np.ndarray] = {}  # unquantized (shape/idx data)

        # graph inputs (minus initializers)
        for vi in g.inputs:
            if vi.name in g.initializers:
                continue
            dims = []
            for d in vi.shape:
                if isinstance(d, str):
                    if d not in self.ra.variables:
                        raise ValueError(f"unbound symbolic dim {d!r}")
                    dims.append(self.ra.variables[d])
                else:
                    dims.append(int(d) if d else 1)
            dims = _pad_dims(dims, self.ra.pad_to_power_of_two)
            wires[vi.name] = b.input(dims)

        def materialize_const(name: str):
            if name in wires:
                return
            t = g.initializers[name]
            arr = t.to_array()
            raw_consts[name] = arr
            if arr.dtype in (np.float32, np.float64):
                q = quantize_tensor(arr, self.ra.scale)
            else:
                q = arr.astype(np.int32)
            q = _pad_array(q, self.ra.pad_to_power_of_two)
            wires[name] = b.constant(q)

        def w(name: str) -> int:
            if name not in wires:
                materialize_const(name)
            return wires[name]

        for node in g.nodes:
            handler = _HANDLERS.get(node.op_type)
            if handler is None:
                raise NotImplementedError(f"ONNX op {node.op_type}")
            ctx = _Ctx(self, b, g, node, wires, raw_consts, w)
            outs = handler(ctx)
            for name, wire in zip(node.output, outs):
                wires[name] = wire

        for vo in g.outputs:
            b.output(wires[vo.name])
        return b.build()

    def load_file(self, path: str) -> Model:
        with open(path, "rb") as f:
            return self.load_bytes(f.read())


@dataclass
class _Ctx:
    loader: OnnxLoader
    b: ModelBuilder
    g: object
    node: object
    wires: dict
    raw_consts: dict
    w: object  # name -> wire resolver

    def attr(self, name, default=None):
        a = self.node.attributes.get(name)
        return a if a is not None else default

    def const_array(self, name: str) -> np.ndarray:
        """Raw (unquantized) constant value, e.g. shapes and axes."""
        if name in self.raw_consts:
            return self.raw_consts[name]
        t = self.g.initializers.get(name)
        if t is None:
            raise ValueError(f"expected constant input {name}")
        arr = t.to_array()
        self.raw_consts[name] = arr
        return arr


# ---------------------------------------------------------------------------
# handlers (reference node/handlers/: arith, activation, shape, reduce, ...)
# ---------------------------------------------------------------------------

def _h_gemm(c: _Ctx):
    n = c.node
    a = c.w(n.input[0])
    w2 = c.w(n.input[1])
    trans_b = c.attr("transB")
    bdims = c.b.dims(w2)
    if trans_b is not None and trans_b.i:
        assert len(bdims) == 2
        w2 = c.b.move_axis(w2, 0, 1)
    out = c.b.matmul(a, w2)
    if len(n.input) > 2:
        bias = c.w(n.input[2])
        bdims = c.b.dims(bias)
        out_dims = c.b.dims(out)
        if tuple(bdims) != tuple(out_dims):
            bias = c.b.broadcast(bias, out_dims)
        out = c.b.add(out, bias)
    return [out]


def _h_matmul(c: _Ctx):
    a, bb = c.w(c.node.input[0]), c.w(c.node.input[1])
    da, db = c.b.dims(a), c.b.dims(bb)
    if len(da) == 2 and len(db) == 2:
        return [c.b.matmul(a, bb)]
    if len(da) == 3 and len(db) == 3:
        return [c.b.einsum("bmk,bkn->bmn", [a, bb])]
    if len(da) == 3 and len(db) == 2:
        return [c.b.einsum("bmk,kn->bmn", [a, bb])]
    raise NotImplementedError(f"MatMul ranks {len(da)}x{len(db)}")


def _h_relu(c: _Ctx):
    return [c.b.relu(c.w(c.node.input[0]))]


def _binary(fn):
    def h(c: _Ctx):
        a, bb = c.w(c.node.input[0]), c.w(c.node.input[1])
        da, db = c.b.dims(a), c.b.dims(bb)
        if tuple(da) != tuple(db):
            # broadcast the smaller operand
            if int(np.prod(da)) >= int(np.prod(db)):
                bb = c.b.broadcast(bb, da)
            else:
                a = c.b.broadcast(a, db)
        return [fn(c.b, a, bb)]
    return h


def _h_div(c: _Ctx):
    n = c.node
    if n.input[1] in c.g.initializers:
        d = c.const_array(n.input[1])
        if d.size == 1 and d.dtype in (np.float32, np.float64):
            # divide by float constant -> multiply by quantized reciprocal
            recip = quantize_tensor(np.array(1.0 / float(d.reshape(-1)[0])),
                                    c.loader.ra.scale)
            rw = c.b.constant(np.full(c.b.dims(c.w(n.input[0])),
                                      int(recip), dtype=np.int32))
            return [c.b.mul(c.w(n.input[0]), rw)]
    return [_binary(lambda b, a, d: b.div(a, d))(c)[0]]


def _h_sqrt(c: _Ctx):
    # sqrt(x) = x * rsqrt(x): reuses the proven rsqrt advice op (the
    # reference reaches the same decomposition via tract declutter)
    x = c.w(c.node.input[0])
    r = c.b.rsqrt(x)
    if tuple(c.b.dims(r)) != tuple(c.b.dims(x)):
        r = c.b.broadcast(r, c.b.dims(x))
    return [c.b.mul(x, r)]


def _h_pow(c: _Ctx):
    e = c.const_array(c.node.input[1]).reshape(-1)
    assert e.size == 1, "Pow needs a scalar exponent"
    exp = float(e[0])
    x = c.w(c.node.input[0])
    if exp == 2.0:
        return [c.b.square(x)]
    if exp == 3.0:
        return [c.b.cube(x)]
    raise NotImplementedError(f"Pow exponent {exp} (only 2 and 3)")


def _h_where(c: _Ctx):
    n = c.node
    return [c.b.iff(c.w(n.input[0]), c.w(n.input[1]), c.w(n.input[2]))]


def _h_einsum(c: _Ctx):
    eq = c.attr("equation")
    assert eq is not None, "Einsum needs an equation attribute"
    equation = eq.s.decode() if isinstance(eq.s, bytes) else str(eq.s)
    ops = [c.w(i) for i in c.node.input]
    return [c.b.einsum(equation.replace(" ", ""), ops)]


def _h_softmax(c: _Ctx):
    axis = c.attr("axis")
    x = c.w(c.node.input[0])
    rank = len(c.b.dims(x))
    ax = axis.i if axis is not None else -1
    if ax < 0:
        ax += rank
    assert ax == rank - 1, "softmax only on the last axis"
    return [c.b.softmax_last_axis(x)]


def _h_transpose(c: _Ctx):
    perm_attr = c.attr("perm")
    x = c.w(c.node.input[0])
    rank = len(c.b.dims(x))
    perm = list(perm_attr.ints) if perm_attr else list(reversed(range(rank)))
    # decompose permutation into a sequence of single-axis moves
    cur = list(range(rank))
    for dst in range(rank):
        src = cur.index(perm[dst])
        if src != dst:
            x = c.b.move_axis(x, src, dst)
            ax = cur.pop(src)
            cur.insert(dst, ax)
    return [x]


def _h_reshape(c: _Ctx):
    x = c.w(c.node.input[0])
    shape = [int(v) for v in c.const_array(c.node.input[1]).reshape(-1)]
    in_dims = c.b.dims(x)
    total = int(np.prod(in_dims))
    out = []
    for i, d in enumerate(shape):
        if d == 0:
            out.append(in_dims[i])
        else:
            out.append(d)
    if -1 in out:
        known = int(np.prod([d for d in out if d != -1]))
        out[out.index(-1)] = total // known
    out = _pad_dims(out, c.loader.ra.pad_to_power_of_two)
    assert int(np.prod(out)) == total, \
        f"reshape {in_dims} -> {out} changes padded element count"
    return [c.b.reshape(x, out)]


def _h_flatten(c: _Ctx):
    x = c.w(c.node.input[0])
    dims = c.b.dims(x)
    ax_attr = c.attr("axis")
    ax = ax_attr.i if ax_attr is not None else 1
    lead = int(np.prod(dims[:ax])) if ax else 1
    rest = int(np.prod(dims[ax:]))
    return [c.b.reshape(x, [lead, rest])]


def _h_squeeze(c: _Ctx):
    x = c.w(c.node.input[0])
    dims = list(c.b.dims(x))
    if len(c.node.input) > 1:
        axes = [int(v) for v in c.const_array(c.node.input[1]).reshape(-1)]
    else:
        a = c.attr("axes")
        axes = list(a.ints) if a else [i for i, d in enumerate(dims) if d == 1]
    axes = [ax % len(dims) for ax in axes]
    new = [d for i, d in enumerate(dims) if i not in axes]
    return [c.b.reshape(x, new or [1])]


def _h_unsqueeze(c: _Ctx):
    x = c.w(c.node.input[0])
    dims = list(c.b.dims(x))
    if len(c.node.input) > 1:
        axes = [int(v) for v in c.const_array(c.node.input[1]).reshape(-1)]
    else:
        axes = list(c.attr("axes").ints)
    for ax in sorted(axes):
        dims.insert(ax if ax >= 0 else ax + len(dims) + 1, 1)
    return [c.b.reshape(x, dims)]


def _h_gather(c: _Ctx):
    data = c.w(c.node.input[0])
    idx = c.w(c.node.input[1])
    ax = c.attr("axis")
    assert ax is None or ax.i == 0, "gather axis 0 only"
    return [c.b.gather(data, idx)]


def _h_reduce(sum_only: bool):
    def h(c: _Ctx):
        x = c.w(c.node.input[0])
        dims = c.b.dims(x)
        if len(c.node.input) > 1:
            axes = [int(v) for v in c.const_array(c.node.input[1]).reshape(-1)]
        else:
            a = c.attr("axes")
            axes = list(a.ints) if a else list(range(len(dims)))
        axes = [ax % len(dims) for ax in axes]
        out = c.b.sum(x, axes)
        if not sum_only:  # ReduceMean: divide by the true element count
            count = int(np.prod([dims[ax] for ax in axes]))
            out = c.b.scalar_const_div(out, count)
        keep = c.attr("keepdims")
        if keep is not None and keep.i == 0:
            newd = [d for i, d in enumerate(c.b.dims(out)) if i not in axes]
            out = c.b.reshape(out, newd or [1])
        return [out]
    return h


def _h_constant(c: _Ctx):
    a = c.attr("value")
    arr = a.t.to_array()
    if arr.dtype in (np.float32, np.float64):
        q = quantize_tensor(arr, c.loader.ra.scale)
    else:
        q = arr.astype(np.int32)
    c.raw_consts[c.node.output[0]] = arr
    q = _pad_array(q, c.loader.ra.pad_to_power_of_two)
    return [c.b.constant(q)]


def _h_concat(c: _Ctx):
    ax = c.attr("axis").i
    return [c.b.concat([c.w(i) for i in c.node.input], ax)]


def _h_slice(c: _Ctx):
    n = c.node
    x = c.w(n.input[0])
    starts = [int(v) for v in c.const_array(n.input[1]).reshape(-1)]
    ends = [int(v) for v in c.const_array(n.input[2]).reshape(-1)]
    axes = ([int(v) for v in c.const_array(n.input[3]).reshape(-1)]
            if len(n.input) > 3 else list(range(len(starts))))
    for st, en, ax in zip(starts, ends, axes):
        dims = c.b.dims(x)
        en = min(en, dims[ax])
        x = c.b.slice(x, ax, st, en)
    return [x]


_HANDLERS = {
    "Gemm": _h_gemm,
    "MatMul": _h_matmul,
    "Relu": _h_relu,
    "Add": _binary(lambda b, a, d: b.add(a, d)),
    "Sub": _binary(lambda b, a, d: b.sub(a, d)),
    "Mul": _binary(lambda b, a, d: b.mul(a, d)),
    "Div": _h_div,
    "Softmax": _h_softmax,
    "Tanh": lambda c: [c.b.tanh(c.w(c.node.input[0]))],
    "Erf": lambda c: [c.b.erf(c.w(c.node.input[0]))],
    "Sigmoid": lambda c: [c.b.sigmoid(c.w(c.node.input[0]))],
    "Sin": lambda c: [c.b.sin(c.w(c.node.input[0]))],
    "Cos": lambda c: [c.b.cos(c.w(c.node.input[0]))],
    "Neg": lambda c: [c.b.neg(c.w(c.node.input[0]))],
    "Identity": lambda c: [c.b.identity(c.w(c.node.input[0]))],
    "Transpose": _h_transpose,
    "Reshape": _h_reshape,
    "Flatten": _h_flatten,
    "Squeeze": _h_squeeze,
    "Unsqueeze": _h_unsqueeze,
    "Gather": _h_gather,
    "ReduceSum": _h_reduce(True),
    "ReduceMean": _h_reduce(False),
    "Constant": _h_constant,
    "Concat": _h_concat,
    "Slice": _h_slice,
    "Sqrt": _h_sqrt,
    "Pow": _h_pow,
    "Where": _h_where,
    "Einsum": _h_einsum,
    "Cast": lambda c: [c.b.identity(c.w(c.node.input[0]))],
}


def load_onnx(path: str, run_args: RunArgs | None = None) -> Model:
    return OnnxLoader(run_args).load_file(path)
