"""Reference-specific adversarial soundness tests.

Mirrors jolt-atlas-core/src/onnx_proof/soundness_tests.rs (600 LoC),
malicious_prover.rs and ops/malicious_sub.rs attack for attack:

- the Sub virtual-operand forge (a malicious prover forges ONE operand's
  NodeOutput opening claim, runs everything else honestly; the verifier's
  operand tie left - right == acc must reject),
- the 3 - 2 -> 0 trace tamper (clamp execution lookup rejects),
- the shared-producer fan-out structure (reference issue #138): one
  producer consumed by two nodes yields per-consumer openings — here the
  point-grouped opening RLC (BASELINE.md deviation 2) keeps EVERY claim
  PCS-bound, so forging either consumer's claim must reject,
- the duplicate-operand y = sub(x, x) flow (must still prove + verify),
- the tanh tau range-check bypass (soundness_tests.rs:270-599): a fully
  malicious teleport flow proves q' = q - 1 with remainder r' = r + tau —
  arithmetically consistent with x = q'·tau + r' but out of range; the
  remainder chunk range-check must reject,
- per-advice-op malicious forks: div quotient shift (R >= divisor),
  rsqrt range-check witness forge, softmax/clamp aux-advice tampers
  (reference TODO #218 vectors), and a dense two-hot forged ra chunk
  (HammingWeight violation).

Every test asserts the verifier REJECTS (or names the honest-pass
property being locked in).
"""

import numpy as np
import pytest

import jolt_atlas_tpu.zkops.ops as Z
from jolt_atlas_tpu.field.scalar import Fr
from jolt_atlas_tpu.frontend import ModelBuilder
from jolt_atlas_tpu.frontend import ops as FOPS
from jolt_atlas_tpu.frontend.quantize import quantize_tensor
from jolt_atlas_tpu.ids import CommittedPoly, OpeningId, SumcheckId, VirtualPoly
from jolt_atlas_tpu.poly.mlpoly import MLPoly
from jolt_atlas_tpu.preprocessing import AtlasPreprocessing
from jolt_atlas_tpu.prover import AtlasProver
from jolt_atlas_tpu.verifier import AtlasVerifier

rng = np.random.default_rng(0xA77ACCEE)


def _prove_verify(model, inputs, prover=None):
    pp = AtlasPreprocessing.preprocess(model)
    p = (prover or AtlasProver)(pp)
    proof, io = p.prove(inputs)
    v = AtlasVerifier(pp)
    return pp, proof, io, v.verify(proof, io)


def _sub_model(t=64):
    b = ModelBuilder()
    x = b.input([t])
    c = b.constant(rng.integers(-50, 50, size=t).astype(np.int32))
    b.output(b.sub(x, c))
    return b.build()


class _ClaimForgeProver(AtlasProver):
    """Forges the claim of ONE OpeningId by `delta` at append time —
    everything else (witness, commitments, sumchecks) stays honest.
    The reference analogue is malicious_sub.rs's forged operand opening."""

    def __init__(self, pp, match, delta=Fr(1)):
        super().__init__(pp)
        self._match = match
        self._delta = delta
        self.forged = 0

    def prove(self, inputs):
        from jolt_atlas_tpu.poly import opening as OP
        orig = OP.ProverOpeningAccumulator.append_virtual
        forger = self

        def patched(self, transcript, opening_id, point, claim):
            if forger._match(opening_id):
                claim = claim + forger._delta
                forger.forged += 1
            return orig(self, transcript, opening_id, point, claim)

        OP.ProverOpeningAccumulator.append_virtual = patched
        try:
            return super().prove(inputs)
        finally:
            OP.ProverOpeningAccumulator.append_virtual = orig


class TestSubOperandForge:
    def test_sub_virtual_operand_forge_rejected(self):
        """soundness_sub_virtual_operand_attack_is_rejected: forge the
        LEFT operand's NodeOutput opening at the Sub node (off by one),
        leave the right operand and all lookups honest."""
        model = _sub_model()
        sub_idx = next(n.idx for n in model.graph.sorted_nodes()
                       if isinstance(n.operator, FOPS.Sub))
        left = model.graph.nodes[sub_idx].inputs[0]

        def match(oid):
            # left operand: NodeExecution(consumer, slot=0)
            return (oid.is_virtual
                    and oid.poly == VirtualPoly.make("NodeOutput", left)
                    and oid.sumcheck == SumcheckId.make("NodeExecution",
                                                        sub_idx, 0))

        pp = AtlasPreprocessing.preprocess(model)
        prover = _ClaimForgeProver(pp, match)
        inputs = [rng.integers(-50, 50, size=64).astype(np.int32)]
        try:
            proof, io = prover.prove(inputs)
        except Exception:
            return  # prover-side consistency check tripped: also a reject
        assert prover.forged, "attack precondition: claim was forged"
        assert not AtlasVerifier(pp).verify(proof, io), \
            "forged Sub operand opening must be rejected"

    def test_sub_trace_tamper_3_minus_2_becomes_0_rejected(self):
        """soundness_sub_trace_tamper_3_minus_2_becomes_0_is_rejected:
        output forced to 0 although SatClamp(3 - 2) = 1 — the clamp
        execution lookup must reject."""
        t = 64
        b = ModelBuilder()
        x = b.input([t])
        c = b.constant(np.full(t, 2, dtype=np.int32))
        b.output(b.sub(x, c))
        model = b.build()
        sub_idx = next(n.idx for n in model.graph.sorted_nodes()
                       if isinstance(n.operator, FOPS.Sub))
        pp = AtlasPreprocessing.preprocess(model)

        class _Tamper(AtlasProver):
            def prove(self, inputs):
                real = self.pp.model.trace

                def tampered(ins):
                    tr = real(ins)
                    out = tr.node_outputs[sub_idx].copy()
                    out[:] = 0
                    tr.node_outputs[sub_idx] = out
                    return tr

                self.pp.model.trace = tampered
                try:
                    return super().prove(inputs)
                finally:
                    self.pp.model.trace = real

        try:
            proof, io = _Tamper(pp).prove([np.full(t, 3, dtype=np.int32)])
        except Exception:
            return
        assert (np.asarray(io[1][0]) == 0).all()
        assert not AtlasVerifier(pp).verify(proof, io)


class TestSharedProducer:
    """Reference issue #138: x consumed by two nodes produces one opening
    per consumer. This repo's point-grouped RLC (BASELINE.md deviation 2)
    keeps every claim alive and PCS-bound — forging EITHER consumer's
    claim must reject (the reference's desired-but-then-missing
    property)."""

    def _model(self, t=64):
        b = ModelBuilder()
        x = b.input([t])
        c1 = b.constant(rng.integers(-40, 40, size=t).astype(np.int32))
        c2 = b.constant(rng.integers(-40, 40, size=t).astype(np.int32))
        y = b.sub(x, c1)
        w = b.relu(y)       # consumer 1 of y
        z = b.sub(y, c2)    # consumer 2 of y
        b.output(b.add(w, z))
        return b.build(), b

    def _forge_consumer(self, consumer_pick):
        model, _ = self._model()
        nodes = list(model.graph.sorted_nodes())
        y_idx = next(n.idx for n in nodes
                     if isinstance(n.operator, FOPS.Sub))
        consumers = sorted(n.idx for n in nodes if y_idx in n.inputs)
        assert len(consumers) == 2, "test precondition: two consumers"
        target = consumers[consumer_pick]

        ne_tag = SumcheckId.make("NodeExecution", 0, 0).tag

        def match(oid):
            # any operand slot of the targeted consumer
            return (oid.is_virtual
                    and oid.poly == VirtualPoly.make("NodeOutput", y_idx)
                    and oid.sumcheck.tag == ne_tag
                    and oid.sumcheck.payload
                    and oid.sumcheck.payload[0] == target)

        pp = AtlasPreprocessing.preprocess(model)
        prover = _ClaimForgeProver(pp, match)
        inputs = [rng.integers(-40, 40, size=64).astype(np.int32)]
        try:
            proof, io = prover.prove(inputs)
        except Exception:
            return True, 1
        return AtlasVerifier(pp).verify(proof, io) is False, prover.forged

    def test_forged_first_consumer_claim_rejected(self):
        rejected, forged = self._forge_consumer(0)
        assert forged and rejected

    def test_forged_second_consumer_claim_rejected(self):
        rejected, forged = self._forge_consumer(1)
        assert forged and rejected

    def test_duplicate_operand_sub_proves_and_verifies(self):
        """soundness_same_consumer_duplicate_operand_should_track_both:
        y = sub(x, x) — both operands open the same producer at the same
        point; the flow must still complete and verify."""
        t = 64
        b = ModelBuilder()
        x = b.input([t])
        b.output(b.sub(x, x))
        model = b.build()
        _, _, io, ok = _prove_verify(
            model, [rng.integers(-40, 40, size=t).astype(np.int32)])
        assert ok
        assert (np.asarray(io[1][0]) == 0).all()


class TestTauRangeCheckBypass:
    def test_tanh_tau_rangecheck_bypass_rejected(self):
        """soundness_tanh_tau_rangecheck_bypass_is_rejected: a FULLY
        malicious teleport flow proves quotient q' = q - 1 with remainder
        r' = r + tau. x = q'·tau + r' still holds, so the division tie
        passes; only the remainder chunk range-check (r < tau via chunk
        indicators + the partial-top ltc indicator, BASELINE.md
        deviation 1) can reject it."""
        s = 8
        b = ModelBuilder(scale=s)
        x = b.input([8])
        b.output(b.tanh(x))
        model = b.build()
        tanh_idx = next(n.idx for n in model.graph.sorted_nodes()
                        if isinstance(n.operator, FOPS.Tanh))
        pp = AtlasPreprocessing.preprocess(model)

        orig_witness = Z.node_witness
        orig_prove = Z._PROVERS[FOPS.Tanh]

        def mal_witness(node, model_, trace):
            polys, chunks = orig_witness(node, model_, trace)
            if node.idx != tanh_idx:
                return polys, chunks
            op = node.operator
            fam_tag, _ = Z._ACT_FAMILY[type(op)]
            xv = Z.padded_flat(
                trace.node_outputs[node.inputs[0]]).astype(np.int64)
            q = np.floor_divide(xv, op.tau) - 1          # forged quotient
            u = np.mod(q, 1 << 16)
            rem = xv - q * op.tau                        # = r + tau >= tau
            C_rem, _ = Z._teleport_rem_chunks(op)
            uc = Z.onehot.chunk_values(u.astype(np.uint64), 4)
            rc = Z.onehot.chunk_values(rem.astype(np.uint64), C_rem)
            chunks[(node.idx, fam_tag)] = uc
            chunks[(node.idx, "TeleportRangeCheckRaD")] = rc
            for d in range(4):
                polys[CommittedPoly.make(fam_tag, node.idx, d)] = \
                    Z.onehot.one_hot_lazy(uc[d])
            for d in range(C_rem):
                polys[CommittedPoly.make("TeleportRangeCheckRaD",
                                         node.idx, d)] = \
                    Z.onehot.one_hot_lazy(rc[d])
            return polys, chunks

        def mal_prove(node, ctx, r, out_claim):
            # _prove_teleport_act with the forged (q - 1, r + tau) pair
            op = node.operator
            fam_tag, ra_tag = Z._ACT_FAMILY[type(op)]
            xv = Z.padded_flat(
                ctx.trace.node_outputs[node.inputs[0]]).astype(np.int64)
            q = np.floor_divide(xv, op.tau) - 1
            u = np.mod(q, 1 << 16)
            ga = ctx.transcript.challenge_scalar()
            g1, g2, g3 = ctx.transcript.challenge_vector(3)
            u_claim = MLPoly(ints=u).evaluate(list(r))
            ctx.accumulator.append_virtual(
                ctx.transcript, Z._u_claim_id(node.idx), list(r), u_claim)
            x_claim = MLPoly(ints=xv).evaluate(list(r))
            ctx.accumulator.append_virtual(
                ctx.transcript,
                Z.input_opening_id(node.idx, 0, node.inputs[0]),
                list(r), x_claim)
            table = Z._teleport_table(op)
            rr = Z.onehot.ReadRafProver(
                Z._ra_claim_id(node.idx, ra_tag), table, u, ga,
                out_claim + ga * u_claim, list(r))
            terms, spec, rspec, has_ltc = Z._teleport_terms(g1, g2, g3, op)
            uchunks = ctx.chunks[(node.idx, fam_tag)]
            rchunks = ctx.chunks[(node.idx, "TeleportRangeCheckRaD")]
            polys, specs = Z.build_derived_polys(node.idx, spec, uchunks)
            rpolys, rspecs = Z.build_derived_polys(node.idx, rspec, rchunks)
            polys.update(rpolys)
            specs.extend(rspecs)
            cyc_claim = (g1 * u_claim + g2 * x_claim
                         + (g3 if has_ltc else Fr.zero()))
            cyc = Z.CycleExecutionProver(polys, terms, list(r), cyc_claim,
                                         specs)
            proof, r_batch = Z.BatchedSumcheck.prove(
                [rr, cyc], ctx.accumulator, ctx.transcript)
            ctx.proofs[(node.idx, "Execution")] = proof
            r_sc = list(r_batch)[-len(r):] if r else []
            ra_pt, ra_claim = ctx.accumulator.get_opening(
                Z._ra_claim_id(node.idx, ra_tag))
            r_addr, r_cyc = ra_pt[:16], ra_pt[16:]
            rv = Z.onehot.RaVirtualizationProver(
                lambda d: CommittedPoly.make(fam_tag, node.idx, d), 4,
                uchunks, r_addr, r_cyc, ra_claim,
                SumcheckId.make("RaVirtualization"))
            vproof, _ = Z.Sumcheck.prove(rv, ctx.accumulator, ctx.transcript)
            ctx.proofs[(node.idx, "RaVirtual")] = vproof
            C_rem, _ = Z._teleport_rem_chunks(op)
            fams = [
                (Z.ChunkFamily(
                    lambda d: CommittedPoly.make(fam_tag, node.idx, d),
                    4, uchunks), spec),
                (Z.ChunkFamily(
                    lambda d: CommittedPoly.make("TeleportRangeCheckRaD",
                                                 node.idx, d),
                    C_rem, rchunks), rspec),
            ]
            ra_inst = Z.build_ra_checks_provers(
                node.idx, fams, r_sc, ctx.accumulator, ctx.transcript)
            ra_proof, _ = Z.BatchedSumcheck.prove(ra_inst, ctx.accumulator,
                                                  ctx.transcript)
            ctx.proofs[(node.idx, "RaChecks")] = ra_proof

        Z.node_witness = mal_witness
        Z._PROVERS[FOPS.Tanh] = mal_prove
        try:
            inputs = [quantize_tensor(rng.normal(size=8) * 2, s)]
            try:
                proof, io = AtlasProver(pp).prove(inputs)
            except Exception:
                return  # internal consistency assertion: also a reject
            assert not AtlasVerifier(pp).verify(proof, io), \
                "tau range-check bypass must be rejected"
        finally:
            Z.node_witness = orig_witness
            Z._PROVERS[FOPS.Tanh] = orig_prove


class TestAdviceForks:
    def test_div_remainder_ge_divisor_rejected(self):
        """Malicious div advice: quotient q - 1 with remainder
        R + divisor — the division tie holds; the R < divisor binary
        range check must reject (reference range_checking/
        DivRangeCheckOperands)."""
        t = 16
        b = ModelBuilder()
        x = b.input([t])
        d = b.constant(np.full(t, 7, dtype=np.int32))
        b.output(b.div(x, d))
        model = b.build()
        div_idx = next(n.idx for n in model.graph.sorted_nodes()
                       if isinstance(n.operator, FOPS.Div))
        pp = AtlasPreprocessing.preprocess(model)

        orig_witness = Z.node_witness

        def mal_witness(node, model_, trace):
            polys, chunks = orig_witness(node, model_, trace)
            if node.idx == div_idx:
                pid = CommittedPoly.make("DivNodeQuotient", node.idx)
                if pid in polys:
                    ints = polys[pid].ints.copy()
                    ints -= 1          # q - 1  =>  R' = R + divisor
                    polys[pid] = MLPoly(ints=ints)
            return polys, chunks

        Z.node_witness = mal_witness
        try:
            inputs = [rng.integers(0, 100, size=t).astype(np.int32)]
            try:
                proof, io = AtlasProver(pp).prove(inputs)
            except Exception:
                return
            assert not AtlasVerifier(pp).verify(proof, io)
        finally:
            Z.node_witness = orig_witness

    def test_rsqrt_rangecheck_witness_forge_rejected(self):
        """Malicious rsqrt advice: shift the committed range-check chunk
        witness (r1 + 1) — the identity range-check tie between the
        decoded chunks and the virtual residual claim must reject."""
        s = 8
        b = ModelBuilder(scale=s)
        x = b.input([8])
        b.output(b.rsqrt(x))
        model = b.build()
        rs_idx = next(n.idx for n in model.graph.sorted_nodes()
                      if isinstance(n.operator, FOPS.Rsqrt))
        pp = AtlasPreprocessing.preprocess(model)

        orig_witness = Z.node_witness

        def mal_witness(node, model_, trace):
            polys, chunks = orig_witness(node, model_, trace)
            if node.idx == rs_idx:
                cv = chunks[(node.idx, "SqrtRangeCheckRaD")]
                cv = cv.copy()
                cv[8] = (cv[8] + 1) % 16   # first r1 chunk +1
                chunks[(node.idx, "SqrtRangeCheckRaD")] = cv
                polys[CommittedPoly.make("SqrtRangeCheckRaD", node.idx, 8)] \
                    = Z.onehot.one_hot_lazy(cv[8])
            return polys, chunks

        Z.node_witness = mal_witness
        try:
            inputs = [quantize_tensor(np.abs(rng.normal(size=8)) + 0.5, s)]
            try:
                proof, io = AtlasProver(pp).prove(inputs)
            except Exception:
                return
            assert not AtlasVerifier(pp).verify(proof, io)
        finally:
            Z.node_witness = orig_witness

    def test_clamp_aux_max_tamper_rejected(self):
        """Aux-advice tamper (reference TODO #218 vectors): mutate the
        prover-supplied clamp max_k vector inside the serialized proof —
        the transcript binding + max-indicator relation must reject."""
        s = 8
        b = ModelBuilder(scale=s)
        x = b.input([2, 8])
        b.output(b.softmax_last_axis(x))
        model = b.build()
        pp = AtlasPreprocessing.preprocess(model)
        inputs = [quantize_tensor(rng.normal(size=(2, 8)), s)]
        proof, io = AtlasProver(pp).prove(inputs)
        assert AtlasVerifier(pp).verify(proof, io)
        tampered = False
        for key in list(proof.aux):
            arr = np.asarray(proof.aux[key])
            if arr.size and np.issubdtype(arr.dtype, np.integer):
                arr = arr.copy()
                arr.flat[0] += 1
                proof.aux[key] = arr
                tampered = True
                break
        assert tampered, "softmax proof should carry aux advice"
        assert not AtlasVerifier(pp).verify(proof, io)

    def test_two_hot_ra_chunk_forge_rejected(self):
        """Forge a ra chunk into a dense two-hot row (each entry still
        boolean, but the row sums to 2): the HammingWeight check — or the
        opening tie against the honest sparse IOP — must reject."""
        t = 64
        b = ModelBuilder()
        x = b.input([t])
        b.output(b.relu(x))
        model = b.build()
        relu_idx = next(n.idx for n in model.graph.sorted_nodes()
                        if isinstance(n.operator, FOPS.ReLU))
        pp = AtlasPreprocessing.preprocess(model)

        orig_witness = Z.node_witness

        def mal_witness(node, model_, trace):
            polys, chunks = orig_witness(node, model_, trace)
            if node.idx == relu_idx:
                for pid, poly in list(polys.items()):
                    if poly.onehot_indices is None:
                        continue
                    idx, K = poly.onehot_indices
                    dense = np.zeros(int(K) * len(idx), dtype=np.int64)
                    for j, v in enumerate(np.asarray(idx)):
                        dense[int(v) * len(idx) + j] = 1
                        other = (int(v) + 1) % int(K)
                        dense[other * len(idx) + j] = 1  # second one
                    polys[pid] = MLPoly(ints=dense)
                    break
            return polys, chunks

        Z.node_witness = mal_witness
        try:
            inputs = [rng.integers(-50, 50, size=t).astype(np.int32)]
            try:
                proof, io = AtlasProver(pp).prove(inputs)
            except Exception:
                return
            assert not AtlasVerifier(pp).verify(proof, io)
        finally:
            Z.node_witness = orig_witness
