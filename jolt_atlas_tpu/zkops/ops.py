"""Per-operator prove/verify implementations.

Reference: jolt-atlas-core/src/onnx_proof/ops/ (OperatorProofTrait +
dispatch_operator!). Each operator consumes its node's reduced output claim
(r, out_claim) and produces:
  * an Execution cycle sumcheck binding outputs/inputs/chunk-derived values,
  * a RaChecks batched sumcheck (booleanity + hamming + address reads),
  * op-specific extra sumchecks (EinsumMatmul contraction),
with all committed-poly claims flowing into the opening accumulator.

Shape ops (Identity/Reshape/Broadcast/MoveAxis/Slice/Concat) are pure claim
plumbing: the output claim is re-expressed as claims on input MLEs at mapped
points (reference ops/{reshape,broadcast,...}.rs).
"""

from __future__ import annotations

import numpy as np

from ..field import vec
from ..field.scalar import Fr
from ..frontend import ops as FOPS
from ..ids import CommittedPoly, OpeningId, SumcheckId, VirtualPoly
from ..poly.eq import eq_evals
from ..poly.mlpoly import BindingOrder, MLPoly
from ..poly.unipoly import UniPoly
from ..subprotocols import onehot
from ..subprotocols.sumcheck import (
    BatchedSumcheck,
    Sumcheck,
    SumcheckInstanceProver,
    SumcheckInstanceVerifier,
)
from . import framework as FW
from .framework import (
    ADD_SAT_CHUNKS,
    MUL_SAT_CHUNKS,
    ChunkFamily,
    CycleExecutionProver,
    CycleExecutionVerifier,
    build_derived_polys,
    build_ra_checks_provers,
    build_ra_checks_verifiers,
    recon_terms,
    sat_clamp_terms,
    unsigned_recon_terms,
)


class VerificationError(Exception):
    pass


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def input_opening_id(consumer_idx: int, slot: int, producer_idx: int) -> OpeningId:
    return OpeningId.virtual(
        VirtualPoly.make("NodeOutput", producer_idx),
        SumcheckId.make("NodeExecution", consumer_idx, slot),
    )


def acc_opening_id(node_idx: int) -> OpeningId:
    return OpeningId.virtual(
        VirtualPoly.make("ClampAcc", node_idx),
        SumcheckId.make("NodeExecution", node_idx),
    )


def padded_flat(arr: np.ndarray) -> np.ndarray:
    flat = np.asarray(arr).reshape(-1)
    n = len(flat)
    p = 1 if n <= 1 else 1 << (n - 1).bit_length()
    if p != n:
        flat = np.concatenate([flat, np.zeros(p - n, dtype=flat.dtype)])
    return flat


def to_unsigned(x: np.ndarray, bits: int) -> np.ndarray:
    """Two's-complement encode into [0, 2^bits)."""
    mask = np.uint64((1 << bits) - 1) if bits < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    return (x.astype(np.int64).astype(np.uint64)) & mask


def axis_var_groups(dims: tuple) -> list[int]:
    """Per-axis variable counts; every padded dim must be a power of two."""
    groups = []
    for d in dims:
        assert d & (d - 1) == 0, f"dim {d} not a power of two"
        groups.append(d.bit_length() - 1)
    return groups


def split_point(r: list[Fr], groups: list[int]) -> list[list[Fr]]:
    out = []
    i = 0
    for g in groups:
        out.append(r[i:i + g])
        i += g
    assert i == len(r)
    return out


# ---------------------------------------------------------------------------
# witness generation (committed chunk polys per op)
# ---------------------------------------------------------------------------

def node_witness(node, model, trace):
    """Returns (poly_map additions, chunk_cache additions) for one node."""
    op = node.operator
    polys: dict[CommittedPoly, MLPoly] = {}
    chunks: dict[tuple, np.ndarray] = {}

    def fam(tag, arr_u, C):
        cvals = onehot.chunk_values(arr_u, C)
        chunks[(node.idx, tag)] = cvals
        for d in range(C):
            polys[CommittedPoly.make(tag, node.idx, d)] = onehot.one_hot_poly(cvals[d])

    if isinstance(op, FOPS.ReLU):
        x = padded_flat(trace.node_outputs[node.inputs[0]])
        fam("NodeOutputRaD", to_unsigned(x, 32), 8)
    elif isinstance(op, (FOPS.Add, FOPS.Sub)):
        a = padded_flat(trace.node_outputs[node.inputs[0]]).astype(np.int64)
        b = padded_flat(trace.node_outputs[node.inputs[1]]).astype(np.int64)
        acc = a + b if isinstance(op, FOPS.Add) else a - b
        fam("ClampRaD", to_unsigned(acc, 4 * ADD_SAT_CHUNKS), ADD_SAT_CHUNKS)
    elif isinstance(op, (FOPS.Mul, FOPS.Square, FOPS.Einsum)):
        s = op.scale
        assert s % 4 == 0, "scale must be a multiple of 4 for chunked remainders"
        if isinstance(op, FOPS.Einsum):
            ins = [trace.node_outputs[i] for i in node.inputs]
            acc = FOPS.einsum_acc_i64(op.equation, ins)
        elif isinstance(op, FOPS.Square):
            a = trace.node_outputs[node.inputs[0]].astype(np.int64)
            acc = a * a
        else:
            acc = trace.node_outputs[node.inputs[0]].astype(np.int64)
            for i in node.inputs[1:]:
                acc = acc * trace.node_outputs[i].astype(np.int64)
        acc = padded_flat(acc)
        q = np.floor_divide(acc, np.int64(1) << np.int64(s))
        rem = np.mod(acc, np.int64(1) << np.int64(s))
        fam("ClampRaD", to_unsigned(q, 4 * MUL_SAT_CHUNKS), MUL_SAT_CHUNKS)
        fam("RescaleRemainderRaD", rem.astype(np.uint64), s // 4)
    return polys, chunks


def node_committed_polys(node) -> list[CommittedPoly]:
    op = node.operator
    out = []
    if isinstance(op, FOPS.ReLU):
        out += [CommittedPoly.make("NodeOutputRaD", node.idx, d) for d in range(8)]
    elif isinstance(op, (FOPS.Add, FOPS.Sub)):
        out += [CommittedPoly.make("ClampRaD", node.idx, d)
                for d in range(ADD_SAT_CHUNKS)]
    elif isinstance(op, (FOPS.Mul, FOPS.Square, FOPS.Einsum)):
        out += [CommittedPoly.make("ClampRaD", node.idx, d)
                for d in range(MUL_SAT_CHUNKS)]
        out += [CommittedPoly.make("RescaleRemainderRaD", node.idx, d)
                for d in range(op.scale // 4)]
    return out


# ---------------------------------------------------------------------------
# einsum contraction sumcheck (mk,kn->mn family; reference ops/einsum/dot.rs)
# ---------------------------------------------------------------------------

class EinsumContractionProver(SumcheckInstanceProver):
    def __init__(self, node, a_bound: MLPoly, b_bound: MLPoly, claim: Fr,
                 r_m: list[Fr], r_n: list[Fr], producers: tuple[int, int]):
        self.node = node
        self.a = a_bound
        self.b = b_bound
        self.claim = claim
        self.r_m, self.r_n = r_m, r_n
        self.producers = producers
        self._rounds = a_bound.num_vars

    def num_rounds(self):
        return self._rounds

    def degree(self):
        return 2

    def input_claim(self, accumulator):
        return self.claim

    def compute_message(self, round, previous_claim):
        ea = self.a.sumcheck_evals(2, BindingOrder.HighToLow)
        eb = self.b.sumcheck_evals(2, BindingOrder.HighToLow)
        pts = [vec.vsum(vec.vmul(ea[t], eb[t])) for t in range(2)]
        return UniPoly.from_evals_and_hint(previous_claim, pts)

    def ingest_challenge(self, r, round):
        self.a.bind(r, BindingOrder.HighToLow)
        self.b.bind(r, BindingOrder.HighToLow)

    def cache_openings(self, accumulator, transcript, r):
        r_k = list(r)
        accumulator.append_virtual(
            transcript, input_opening_id(self.node.idx, 0, self.producers[0]),
            self.r_m + r_k, self.a.final_claim())
        accumulator.append_virtual(
            transcript, input_opening_id(self.node.idx, 1, self.producers[1]),
            r_k + self.r_n, self.b.final_claim())


class EinsumContractionVerifier(SumcheckInstanceVerifier):
    def __init__(self, node, log_k: int, claim: Fr, r_m, r_n, producers):
        self.node = node
        self.log_k = log_k
        self.claim = claim
        self.r_m, self.r_n = r_m, r_n
        self.producers = producers

    def num_rounds(self):
        return self.log_k

    def degree(self):
        return 2

    def input_claim(self, accumulator):
        return self.claim

    def cache_openings(self, accumulator, transcript, r):
        r_k = list(r)
        accumulator.append_virtual(
            transcript, input_opening_id(self.node.idx, 0, self.producers[0]),
            self.r_m + r_k)
        accumulator.append_virtual(
            transcript, input_opening_id(self.node.idx, 1, self.producers[1]),
            r_k + self.r_n)

    def expected_output_claim(self, accumulator, r):
        a = accumulator.get_opening(
            input_opening_id(self.node.idx, 0, self.producers[0]))[1]
        b = accumulator.get_opening(
            input_opening_id(self.node.idx, 1, self.producers[1]))[1]
        return a * b


# ---------------------------------------------------------------------------
# operator prove / verify dispatch
# ---------------------------------------------------------------------------

def prove_node(node, ctx):
    op = node.operator
    if isinstance(op, (FOPS.Input, FOPS.Constant)):
        return  # claims checked directly against public MLEs by the verifier
    r, out_claim = ctx.reduced[node.idx]
    if isinstance(op, (FOPS.Identity, FOPS.Reshape)):
        _prove_passthrough(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.Broadcast):
        _prove_broadcast(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.MoveAxis):
        _prove_moveaxis(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.Slice):
        _prove_slice(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.Neg):
        _prove_neg(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.ReLU):
        _prove_relu(node, ctx, r, out_claim)
    elif isinstance(op, (FOPS.Add, FOPS.Sub)):
        _prove_addsub(node, ctx, r, out_claim)
    elif isinstance(op, (FOPS.Mul, FOPS.Square)):
        _prove_mul(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.Einsum):
        _prove_einsum(node, ctx, r, out_claim)
    else:
        raise NotImplementedError(f"prove: {op.name}")


def verify_node(node, ctx):
    op = node.operator
    if isinstance(op, (FOPS.Input, FOPS.Constant)):
        return
    r, out_claim = ctx.reduced[node.idx]
    if isinstance(op, (FOPS.Identity, FOPS.Reshape)):
        _verify_passthrough(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.Broadcast):
        _verify_broadcast(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.MoveAxis):
        _verify_moveaxis(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.Slice):
        _verify_slice(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.Neg):
        _verify_neg(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.ReLU):
        _verify_relu(node, ctx, r, out_claim)
    elif isinstance(op, (FOPS.Add, FOPS.Sub)):
        _verify_addsub(node, ctx, r, out_claim)
    elif isinstance(op, (FOPS.Mul, FOPS.Square)):
        _verify_mul(node, ctx, r, out_claim)
    elif isinstance(op, FOPS.Einsum):
        _verify_einsum(node, ctx, r, out_claim)
    else:
        raise NotImplementedError(f"verify: {op.name}")


# -- claim plumbing ops ------------------------------------------------------

def _prove_passthrough(node, ctx, r, out_claim):
    # flattened padded data is identical (requires equal padded lengths)
    src = node.inputs[0]
    assert ctx.padded_len(src) == ctx.padded_len(node.idx), \
        "reshape with different padded lengths not yet supported"
    ctx.accumulator.append_virtual(
        ctx.transcript, input_opening_id(node.idx, 0, src), r, out_claim)


def _verify_passthrough(node, ctx, r, out_claim):
    src = node.inputs[0]
    oid = input_opening_id(node.idx, 0, src)
    ctx.accumulator.append_virtual(ctx.transcript, oid, r)
    if ctx.accumulator.get_opening(oid)[1] != out_claim:
        raise VerificationError(f"passthrough claim mismatch at node {node.idx}")


def _broadcast_point(node, ctx, r):
    in_dims = tuple(ctx.node(node.inputs[0]).output_dims)
    out_dims = tuple(node.output_dims)
    out_groups = axis_var_groups(out_dims)
    parts = split_point(r, out_groups)
    # align right: trailing axes of out map to axes of in
    offset = len(out_dims) - len(in_dims)
    pt = []
    for i, d in enumerate(in_dims):
        if d == out_dims[offset + i]:
            pt.extend(parts[offset + i])
        else:
            assert d == 1, "broadcast with non-unit mismatched dim"
    return pt


def _prove_broadcast(node, ctx, r, out_claim):
    pt = _broadcast_point(node, ctx, r)
    ctx.accumulator.append_virtual(
        ctx.transcript, input_opening_id(node.idx, 0, node.inputs[0]), pt,
        out_claim)


def _verify_broadcast(node, ctx, r, out_claim):
    pt = _broadcast_point(node, ctx, r)
    oid = input_opening_id(node.idx, 0, node.inputs[0])
    ctx.accumulator.append_virtual(ctx.transcript, oid, pt)
    if ctx.accumulator.get_opening(oid)[1] != out_claim:
        raise VerificationError(f"broadcast claim mismatch at node {node.idx}")


def _moveaxis_point(node, ctx, r):
    op = node.operator
    in_dims = tuple(ctx.node(node.inputs[0]).output_dims)
    out_groups = axis_var_groups(tuple(node.output_dims))
    parts = split_point(r, out_groups)
    # out axes are in axes with `source` moved to `destination`; invert
    order = list(range(len(in_dims)))
    d = order.pop(op.source)
    order.insert(op.destination, d)
    # parts[i] corresponds to in-axis order[i]; input point in axis order:
    pt_parts = [None] * len(in_dims)
    for i, ax in enumerate(order):
        pt_parts[ax] = parts[i]
    return [c for g in pt_parts for c in g]


def _prove_moveaxis(node, ctx, r, out_claim):
    pt = _moveaxis_point(node, ctx, r)
    ctx.accumulator.append_virtual(
        ctx.transcript, input_opening_id(node.idx, 0, node.inputs[0]), pt,
        out_claim)


def _verify_moveaxis(node, ctx, r, out_claim):
    pt = _moveaxis_point(node, ctx, r)
    oid = input_opening_id(node.idx, 0, node.inputs[0])
    ctx.accumulator.append_virtual(ctx.transcript, oid, pt)
    if ctx.accumulator.get_opening(oid)[1] != out_claim:
        raise VerificationError(f"moveaxis claim mismatch at node {node.idx}")


def _slice_point(node, ctx, r):
    op = node.operator
    in_dims = tuple(ctx.node(node.inputs[0]).output_dims)
    out_dims = tuple(node.output_dims)
    length = op.end - op.start
    assert length & (length - 1) == 0 and op.start % length == 0, \
        "only aligned power-of-two slices supported"
    out_groups = axis_var_groups(out_dims)
    parts = split_point(r, out_groups)
    pt = []
    for ax, d in enumerate(in_dims):
        if ax == op.axis:
            extra = (d.bit_length() - 1) - (out_dims[ax].bit_length() - 1)
            block = op.start // length
            bits = [Fr((block >> (extra - 1 - i)) & 1) for i in range(extra)]
            pt.extend(bits + parts[ax])
        else:
            pt.extend(parts[ax])
    return pt


def _prove_slice(node, ctx, r, out_claim):
    pt = _slice_point(node, ctx, r)
    ctx.accumulator.append_virtual(
        ctx.transcript, input_opening_id(node.idx, 0, node.inputs[0]), pt,
        out_claim)


def _verify_slice(node, ctx, r, out_claim):
    pt = _slice_point(node, ctx, r)
    oid = input_opening_id(node.idx, 0, node.inputs[0])
    ctx.accumulator.append_virtual(ctx.transcript, oid, pt)
    if ctx.accumulator.get_opening(oid)[1] != out_claim:
        raise VerificationError(f"slice claim mismatch at node {node.idx}")


def _prove_neg(node, ctx, r, out_claim):
    ctx.accumulator.append_virtual(
        ctx.transcript, input_opening_id(node.idx, 0, node.inputs[0]), r,
        Fr.zero() - out_claim)


def _verify_neg(node, ctx, r, out_claim):
    oid = input_opening_id(node.idx, 0, node.inputs[0])
    ctx.accumulator.append_virtual(ctx.transcript, oid, r)
    if ctx.accumulator.get_opening(oid)[1] != (Fr.zero() - out_claim):
        raise VerificationError(f"neg claim mismatch at node {node.idx}")


# -- ReLU --------------------------------------------------------------------

def _relu_terms(gamma: Fr):
    terms = []
    spec = {}
    for d in range(8):
        spec[f"cv{d}"] = (d, "identity")
        terms.append((Fr(1 << (4 * d)), ["cnhi7", f"cv{d}"]))
    spec["chi7"] = (7, "msb")
    spec["cnhi7"] = (7, "notmsb")
    # gamma * (x - recon):  recon = sum 2^{4d} v_d - 2^32 hi7
    terms.append((gamma, ["x"]))
    for d in range(8):
        terms.append((Fr.zero() - gamma * Fr(1 << (4 * d)), [f"cv{d}"]))
    terms.append((gamma * Fr(1 << 32), ["chi7"]))
    return terms, spec


def _prove_relu(node, ctx, r, out_claim):
    gamma = ctx.transcript.challenge_scalar()
    terms, spec = _relu_terms(gamma)
    chunks = ctx.chunks[(node.idx, "NodeOutputRaD")]
    polys, specs = build_derived_polys(node.idx, spec, chunks)
    x = padded_flat(ctx.trace.node_outputs[node.inputs[0]])
    polys["x"] = MLPoly(ints=x.astype(np.int64))
    specs.append(("x", input_opening_id(node.idx, 0, node.inputs[0])))
    inst = CycleExecutionProver(polys, terms, r, out_claim, specs)
    proof, r_sc = Sumcheck.prove(inst, ctx.accumulator, ctx.transcript)
    ctx.proofs[(node.idx, "Execution")] = proof
    fam = ChunkFamily(lambda d: CommittedPoly.make("NodeOutputRaD", node.idx, d),
                      8, chunks)
    ra_inst = build_ra_checks_provers(node.idx, [(fam, spec)], list(r_sc),
                                      ctx.accumulator, ctx.transcript)
    ra_proof, _ = BatchedSumcheck.prove(ra_inst, ctx.accumulator, ctx.transcript)
    ctx.proofs[(node.idx, "RaChecks")] = ra_proof


def _verify_relu(node, ctx, r, out_claim):
    gamma = ctx.transcript.challenge_scalar()
    terms, spec = _relu_terms(gamma)
    _, specs = _derived_specs(node.idx, spec)
    specs.append(("x", input_opening_id(node.idx, 0, node.inputs[0])))
    inst = CycleExecutionVerifier(terms, r, out_claim, specs)
    r_sc = Sumcheck.verify(ctx.proofs[(node.idx, "Execution")], inst,
                           ctx.accumulator, ctx.transcript)
    fam = ChunkFamily(lambda d: CommittedPoly.make("NodeOutputRaD", node.idx, d),
                      8, None)
    ra_inst = build_ra_checks_verifiers(node.idx, [(fam, spec)], list(r_sc),
                                        ctx.accumulator, ctx.transcript)
    BatchedSumcheck.verify(ctx.proofs[(node.idx, "RaChecks")], ra_inst,
                           ctx.accumulator, ctx.transcript)


def _derived_specs(node_idx, spec):
    specs = [(name, FW.derived_claim_id(node_idx, name)) for name in sorted(spec)]
    return None, specs


# -- Add / Sub ---------------------------------------------------------------

def _addsub_terms(gamma: Fr, sign: int):
    C = ADD_SAT_CHUNKS
    terms, spec = sat_clamp_terms(C, "c")
    # gamma * (a +- b - recon)
    terms.append((gamma, ["a"]))
    terms.append((gamma * Fr(sign), ["b"]))
    for coeff, factors in recon_terms(C, "c"):
        terms.append((Fr.zero() - gamma * coeff, factors))
    return terms, spec


def _prove_addsub(node, ctx, r, out_claim):
    sign = 1 if isinstance(node.operator, FOPS.Add) else -1
    gamma = ctx.transcript.challenge_scalar()
    terms, spec = _addsub_terms(gamma, sign)
    chunks = ctx.chunks[(node.idx, "ClampRaD")]
    polys, specs = build_derived_polys(node.idx, spec, chunks)
    a = padded_flat(ctx.trace.node_outputs[node.inputs[0]])
    b = padded_flat(ctx.trace.node_outputs[node.inputs[1]])
    polys["a"] = MLPoly(ints=a.astype(np.int64))
    polys["b"] = MLPoly(ints=b.astype(np.int64))
    specs.append(("a", input_opening_id(node.idx, 0, node.inputs[0])))
    specs.append(("b", input_opening_id(node.idx, 1, node.inputs[1])))
    inst = CycleExecutionProver(polys, terms, r, out_claim, specs)
    proof, r_sc = Sumcheck.prove(inst, ctx.accumulator, ctx.transcript)
    ctx.proofs[(node.idx, "Execution")] = proof
    fam = ChunkFamily(lambda d: CommittedPoly.make("ClampRaD", node.idx, d),
                      ADD_SAT_CHUNKS, chunks)
    ra_inst = build_ra_checks_provers(node.idx, [(fam, spec)], list(r_sc),
                                      ctx.accumulator, ctx.transcript)
    ra_proof, _ = BatchedSumcheck.prove(ra_inst, ctx.accumulator, ctx.transcript)
    ctx.proofs[(node.idx, "RaChecks")] = ra_proof


def _verify_addsub(node, ctx, r, out_claim):
    sign = 1 if isinstance(node.operator, FOPS.Add) else -1
    gamma = ctx.transcript.challenge_scalar()
    terms, spec = _addsub_terms(gamma, sign)
    _, specs = _derived_specs(node.idx, spec)
    specs.append(("a", input_opening_id(node.idx, 0, node.inputs[0])))
    specs.append(("b", input_opening_id(node.idx, 1, node.inputs[1])))
    inst = CycleExecutionVerifier(terms, r, out_claim, specs)
    r_sc = Sumcheck.verify(ctx.proofs[(node.idx, "Execution")], inst,
                           ctx.accumulator, ctx.transcript)
    fam = ChunkFamily(lambda d: CommittedPoly.make("ClampRaD", node.idx, d),
                      ADD_SAT_CHUNKS, None)
    ra_inst = build_ra_checks_verifiers(node.idx, [(fam, spec)], list(r_sc),
                                        ctx.accumulator, ctx.transcript)
    BatchedSumcheck.verify(ctx.proofs[(node.idx, "RaChecks")], ra_inst,
                           ctx.accumulator, ctx.transcript)


# -- Mul / Square (fused rescale, elementwise) ------------------------------

def _mul_terms(gamma: Fr, scale: int, square: bool):
    C = MUL_SAT_CHUNKS
    terms, spec = sat_clamp_terms(C, "c")
    rspec_chunks = scale // 4
    _, rspec = {}, {}
    for d in range(rspec_chunks):
        rspec[f"rv{d}"] = (d, "identity")
    # gamma * (a*b - 2^S * recon_q - recon_R)
    terms.append((gamma, ["a", "a"] if square else ["a", "b"]))
    for coeff, factors in recon_terms(C, "c", scale=1 << scale):
        terms.append((Fr.zero() - gamma * coeff, factors))
    for coeff, factors in unsigned_recon_terms(rspec_chunks, "r"):
        terms.append((Fr.zero() - gamma * coeff, factors))
    return terms, spec, rspec


def _prove_mul(node, ctx, r, out_claim):
    op = node.operator
    square = isinstance(op, FOPS.Square)
    gamma = ctx.transcript.challenge_scalar()
    terms, spec, rspec = _mul_terms(gamma, op.scale, square)
    qchunks = ctx.chunks[(node.idx, "ClampRaD")]
    rchunks = ctx.chunks[(node.idx, "RescaleRemainderRaD")]
    polys, specs = build_derived_polys(node.idx, spec, qchunks)
    rpolys, rspecs = build_derived_polys(node.idx, rspec, rchunks)
    polys.update(rpolys)
    specs.extend(rspecs)
    a = padded_flat(ctx.trace.node_outputs[node.inputs[0]])
    polys["a"] = MLPoly(ints=a.astype(np.int64))
    specs.append(("a", input_opening_id(node.idx, 0, node.inputs[0])))
    if not square:
        b = padded_flat(ctx.trace.node_outputs[node.inputs[1]])
        polys["b"] = MLPoly(ints=b.astype(np.int64))
        specs.append(("b", input_opening_id(node.idx, 1, node.inputs[1])))
    inst = CycleExecutionProver(polys, terms, r, out_claim, specs)
    proof, r_sc = Sumcheck.prove(inst, ctx.accumulator, ctx.transcript)
    ctx.proofs[(node.idx, "Execution")] = proof
    fams = [
        (ChunkFamily(lambda d: CommittedPoly.make("ClampRaD", node.idx, d),
                     MUL_SAT_CHUNKS, qchunks), spec),
        (ChunkFamily(lambda d: CommittedPoly.make("RescaleRemainderRaD", node.idx, d),
                     op.scale // 4, rchunks), rspec),
    ]
    ra_inst = build_ra_checks_provers(node.idx, fams, list(r_sc),
                                      ctx.accumulator, ctx.transcript)
    ra_proof, _ = BatchedSumcheck.prove(ra_inst, ctx.accumulator, ctx.transcript)
    ctx.proofs[(node.idx, "RaChecks")] = ra_proof


def _verify_mul(node, ctx, r, out_claim):
    op = node.operator
    square = isinstance(op, FOPS.Square)
    gamma = ctx.transcript.challenge_scalar()
    terms, spec, rspec = _mul_terms(gamma, op.scale, square)
    _, specs = _derived_specs(node.idx, spec)
    _, rspecs = _derived_specs(node.idx, rspec)
    specs.extend(rspecs)
    specs.append(("a", input_opening_id(node.idx, 0, node.inputs[0])))
    if not square:
        specs.append(("b", input_opening_id(node.idx, 1, node.inputs[1])))
    inst = CycleExecutionVerifier(terms, r, out_claim, specs)
    r_sc = Sumcheck.verify(ctx.proofs[(node.idx, "Execution")], inst,
                           ctx.accumulator, ctx.transcript)
    fams = [
        (ChunkFamily(lambda d: CommittedPoly.make("ClampRaD", node.idx, d),
                     MUL_SAT_CHUNKS, None), spec),
        (ChunkFamily(lambda d: CommittedPoly.make("RescaleRemainderRaD", node.idx, d),
                     op.scale // 4, None), rspec),
    ]
    ra_inst = build_ra_checks_verifiers(node.idx, fams, list(r_sc),
                                        ctx.accumulator, ctx.transcript)
    BatchedSumcheck.verify(ctx.proofs[(node.idx, "RaChecks")], ra_inst,
                           ctx.accumulator, ctx.transcript)


# -- Einsum (mk,kn->mn) ------------------------------------------------------

def _einsum_terms(gamma: Fr, scale: int):
    C = MUL_SAT_CHUNKS
    terms, spec = sat_clamp_terms(C, "c")
    rspec = {}
    for d in range(scale // 4):
        rspec[f"rv{d}"] = (d, "identity")
    terms.append((gamma, ["acc"]))
    for coeff, factors in recon_terms(C, "c", scale=1 << scale):
        terms.append((Fr.zero() - gamma * coeff, factors))
    for coeff, factors in unsigned_recon_terms(scale // 4, "r"):
        terms.append((Fr.zero() - gamma * coeff, factors))
    return terms, spec, rspec


def _prove_einsum(node, ctx, r, out_claim):
    op = node.operator
    assert op.equation.replace(" ", "") == "mk,kn->mn", \
        f"einsum layout {op.equation} not yet supported"
    gamma = ctx.transcript.challenge_scalar()
    terms, spec, rspec = _einsum_terms(gamma, op.scale)
    qchunks = ctx.chunks[(node.idx, "ClampRaD")]
    rchunks = ctx.chunks[(node.idx, "RescaleRemainderRaD")]
    polys, specs = build_derived_polys(node.idx, spec, qchunks)
    rpolys, rspecs = build_derived_polys(node.idx, rspec, rchunks)
    polys.update(rpolys)
    specs.extend(rspecs)
    a_in = ctx.trace.node_outputs[node.inputs[0]]
    b_in = ctx.trace.node_outputs[node.inputs[1]]
    acc = padded_flat(FOPS.einsum_acc_i64(op.equation, [a_in, b_in]))
    polys["acc"] = MLPoly(ints=acc)
    specs.append(("acc", acc_opening_id(node.idx)))
    inst = CycleExecutionProver(polys, terms, r, out_claim, specs)
    proof, r_sc = Sumcheck.prove(inst, ctx.accumulator, ctx.transcript)
    ctx.proofs[(node.idx, "Execution")] = proof

    fams = [
        (ChunkFamily(lambda d: CommittedPoly.make("ClampRaD", node.idx, d),
                     MUL_SAT_CHUNKS, qchunks), spec),
        (ChunkFamily(lambda d: CommittedPoly.make("RescaleRemainderRaD", node.idx, d),
                     op.scale // 4, rchunks), rspec),
    ]
    ra_inst = build_ra_checks_provers(node.idx, fams, list(r_sc),
                                      ctx.accumulator, ctx.transcript)
    ra_proof, _ = BatchedSumcheck.prove(ra_inst, ctx.accumulator, ctx.transcript)
    ctx.proofs[(node.idx, "RaChecks")] = ra_proof

    # contraction: acc(r_sc) = sum_k A(r_m, k) B(k, r_n)
    M, K = a_in.shape
    K2, N = b_in.shape
    r_m = list(r_sc)[: M.bit_length() - 1]
    r_n = list(r_sc)[M.bit_length() - 1:]
    acc_claim = ctx.accumulator.get_opening(acc_opening_id(node.idx))[1]
    eq_m = eq_evals(r_m)
    eq_n = eq_evals(r_n)
    a_obj = vec.from_ints(a_in.astype(np.int64))
    b_obj = vec.from_ints(b_in.astype(np.int64))
    a_bound = MLPoly(fvec=(a_obj * eq_m[:, None] % vec.R).sum(axis=0) % vec.R)
    b_bound = MLPoly(fvec=(b_obj * eq_n[None, :] % vec.R).sum(axis=1) % vec.R)
    cinst = EinsumContractionProver(node, a_bound, b_bound, acc_claim, r_m, r_n,
                                    (node.inputs[0], node.inputs[1]))
    cproof, _ = Sumcheck.prove(cinst, ctx.accumulator, ctx.transcript)
    ctx.proofs[(node.idx, "EinsumMatmul")] = cproof


def _verify_einsum(node, ctx, r, out_claim):
    op = node.operator
    gamma = ctx.transcript.challenge_scalar()
    terms, spec, rspec = _einsum_terms(gamma, op.scale)
    _, specs = _derived_specs(node.idx, spec)
    _, rspecs = _derived_specs(node.idx, rspec)
    specs.extend(rspecs)
    specs.append(("acc", acc_opening_id(node.idx)))
    inst = CycleExecutionVerifier(terms, r, out_claim, specs)
    r_sc = Sumcheck.verify(ctx.proofs[(node.idx, "Execution")], inst,
                           ctx.accumulator, ctx.transcript)
    fams = [
        (ChunkFamily(lambda d: CommittedPoly.make("ClampRaD", node.idx, d),
                     MUL_SAT_CHUNKS, None), spec),
        (ChunkFamily(lambda d: CommittedPoly.make("RescaleRemainderRaD", node.idx, d),
                     op.scale // 4, None), rspec),
    ]
    ra_inst = build_ra_checks_verifiers(node.idx, fams, list(r_sc),
                                        ctx.accumulator, ctx.transcript)
    BatchedSumcheck.verify(ctx.proofs[(node.idx, "RaChecks")], ra_inst,
                           ctx.accumulator, ctx.transcript)

    a_dims = tuple(ctx.node(node.inputs[0]).output_dims)
    M, K = a_dims
    r_m = list(r_sc)[: M.bit_length() - 1]
    r_n = list(r_sc)[M.bit_length() - 1:]
    acc_claim = ctx.accumulator.get_opening(acc_opening_id(node.idx))[1]
    cinst = EinsumContractionVerifier(node, K.bit_length() - 1, acc_claim,
                                      r_m, r_n,
                                      (node.inputs[0], node.inputs[1]))
    Sumcheck.verify(ctx.proofs[(node.idx, "EinsumMatmul")], cinst,
                    ctx.accumulator, ctx.transcript)
