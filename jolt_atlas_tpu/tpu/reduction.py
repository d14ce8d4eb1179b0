"""Device-resident batched opening-reduction sumcheck.

The batch opening reduction (poly/opening.py) is a BatchedSumcheck over
~10^2 single-row degree-2 Gruen instances — one per distinct opening
point — whose polynomials total tens of millions of field elements. The
naive device mapping (one round-eval kernel + one host sync per round)
loses to the host C++ path because the tunnel to the
accelerator charges ~0.6 s per device->host fetch and the per-round
Fiat-Shamir challenge forces that fetch. This engine removes the
round-trips entirely:

  - ALL per-round eq weight tables depend only on each instance's fixed
    opening point (poly/spliteq.py), never on challenges — so the whole
    round schedule is precomputed on the host and uploaded up front.
  - The Fiat-Shamir transcript itself runs on device (tpu/blake2b.py:
    every absorb/squeeze is one BLAKE2b block), so round challenges are
    produced and consumed inside one asynchronous dispatch chain.
  - The "head" rounds (large polynomials, all the FLOPs) run on device
    with zero syncs; ONE fetch returns every round message, the
    transcript state, and the partially-bound rows; the host replays the
    messages through its own transcript (bit-identical challenges — the
    fetched state is asserted equal) and finishes the cheap tail rounds
    on the C++ kernels. Proof bytes are identical to the all-host path.

Data layout: one flat (16, N) uint32 limb-planes buffer (tpu/fqplanes.py)
holding every joined instance's current polynomial as a segment; per
round, a gather + two Montgomery muls + a segment scatter-add computes
all instances' q(0) evals at once, a small fixed-shape "tail" kernel
assembles the batched round message, hashes it, derives the 125-bit
challenge, and a gather kernel binds every segment. Shapes are pow2-
canonical so compiled kernels persist across models (.jax_cache).

Mirrors the role of reference joltworks/src/poly/opening_proof.rs +
split_eq_poly.rs:67, redesigned for a high-latency-link accelerator.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..field.constants import FR_MODULUS
from ..field.scalar import Fr

_STATE = None


def _state():
    """(jax, PlanesCtx) once the backend is up, else False.

    Backend init runs in a daemon thread with a deadline: the axon relay
    can wedge (observed: make_c_api_client blocking forever when a killed
    client's device claim lingers), and a prover must degrade to the host
    path instead of hanging. A timed-out init keeps probing in the
    background; later proves in the same process pick the device path up
    if the relay recovers."""
    global _STATE
    if _STATE is None or _STATE is False:
        import concurrent.futures

        def init():
            import jax
            from .fqplanes import PlanesCtx
            jax.devices()
            return (jax, PlanesCtx(FR_MODULUS))

        global _INIT_FUTURE
        try:
            if _INIT_FUTURE is None:
                ex = concurrent.futures.ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="jax-init")
                _INIT_FUTURE = ex.submit(init)
                ex.shutdown(wait=False)
            timeout = float(os.environ.get(
                "JOLT_ATLAS_TPU_INIT_TIMEOUT", "90" if _STATE is None else "1"))
            _STATE = _INIT_FUTURE.result(timeout=timeout)
        except concurrent.futures.TimeoutError:
            _STATE = False
        except Exception:
            _STATE = False
            _INIT_FUTURE = None
    return _STATE


_INIT_FUTURE = None


def _pow2(x: int) -> int:
    return 1 << max(x - 1, 0).bit_length() if x > 1 else 1


# ---------------------------------------------------------------------------
# host <-> planes helpers
# ---------------------------------------------------------------------------

def _u64_to_planes(a: np.ndarray) -> np.ndarray:
    """(n, 4) u64 LE limbs -> (16, n) u32 16-bit planes."""
    n = a.shape[0]
    out = np.empty((16, n), dtype=np.uint32)
    for w in range(4):
        col = a[:, w]
        for s in range(4):
            out[4 * w + s] = ((col >> np.uint64(16 * s))
                              & np.uint64(0xFFFF)).astype(np.uint32)
    return out


def _planes_to_u64(p: np.ndarray) -> np.ndarray:
    lead = p.shape[1:]
    out = np.zeros(lead + (4,), dtype=np.uint64)
    for w in range(4):
        for s in range(4):
            out[..., w] |= p[4 * w + s].astype(np.uint64) << np.uint64(16 * s)
    return out


def _fr_to_planes(frs: list[Fr]) -> np.ndarray:
    """list of Fr -> (16, n) Montgomery planes."""
    _, FR = _state()
    return FR.to_planes([f.v for f in frs])


def _planes_col_to_fr(p: np.ndarray, col: int) -> Fr:
    _, FR = _state()
    return Fr(FR.from_planes(p[:, col:col + 1])[0])


def _put_flat(planes: np.ndarray):
    """Upload (16, n) planes as a flat buffer (the link moves 1-D arrays
    ~20x faster than 2-D) and reshape on device."""
    jax, _ = _state()
    jnp = jax.numpy
    n = planes.shape[1]
    return jnp.reshape(jax.device_put(np.ascontiguousarray(planes).ravel()),
                       (16, n))


def _const_planes(value: int) -> np.ndarray:
    """(16, 1) u32 planes of a raw (non-Montgomery) integer constant."""
    return np.array([[(value >> (16 * i)) & 0xFFFF] for i in range(16)],
                    dtype=np.uint32)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

_Q0_BLK = 1 << 12   # entries per block sum (keeps all partial sums in u32)


@functools.lru_cache(maxsize=None)
def _q0_kernel(Npad: int, Kpad: int, Ipad: int, nblk: int, blk: int):
    """Batched q(0): gather lo values + two-factor eq weights, multiply,
    segment-accumulate into (2, 16, Ipad) u32 lazy limb sums (lo16/hi16
    split so every accumulator provably fits u32 — TPU has no native u64:
    per-block sums < 2^12 * 2^16 = 2^28; per-lane block counts < 2^16)."""
    jax, FR = _state()
    jnp = jax.numpy

    def run(buf, whi_tab, wlo_tab, whi_idx, wlo_idx, lo_pos, blkseg):
        lo = jnp.take(buf, lo_pos, axis=1)
        w = FR.mul(jnp.take(whi_tab, whi_idx, axis=1),
                   jnp.take(wlo_tab, wlo_idx, axis=1))
        p = FR.mul(w, lo)
        s = jnp.sum(p.reshape(16, nblk, blk), axis=2)   # < 2^28
        acc = jnp.zeros((2, 16, Ipad), dtype=jnp.uint32)
        acc = acc.at[0, :, blkseg].add((s & 0xFFFF).T)
        acc = acc.at[1, :, blkseg].add((s >> 16).T)
        return acc

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _bind_kernel(Nout: int, Nin: int, Ninit: int):
    """buf' = where(is_new, init[init_pos], lo + c (hi - lo))."""
    jax, FR = _state()
    jnp = jax.numpy

    def run(buf, init, c, lo_pos, hi_pos, init_pos, is_new):
        lo = jnp.take(buf, lo_pos, axis=1)
        hi = jnp.take(buf, hi_pos, axis=1)
        bound = FR.add(lo, FR.mul(FR.sub(hi, lo), c))
        ni = jnp.take(init, init_pos, axis=1)
        return jnp.where(is_new[None, :], ni, bound)

    return jax.jit(run)



@functools.lru_cache(maxsize=None)
def _tail_kernel(Ipad: int):
    """Per-round batched message assembly + device Fiat-Shamir.

    Computes per-lane q1 from the running claim, the degree-2 batched
    round message coefficients b0/b2, absorbs the compressed poly,
    squeezes the 125-bit challenge, and advances Q/es. One compiled
    shape serves every round and model (lanes are pow2-padded)."""
    jax, FR = _state()
    jnp = jax.numpy
    from . import blake2b as B

    P = FR.P
    R = FR.R
    one_m = _const_planes(R % P)                       # Montgomery 1
    one_raw = _const_planes(1)                         # raw 1 (to-canonical)
    two16_m = _const_planes((1 << 16) * R % P)
    two32_m = _const_planes((1 << 32) * R % P)
    two128r = _const_planes(pow(2, 384, P))            # raw 2^384 mod p
    # batched-absorb framing (poly/unipoly.py append_to_transcript):
    # one update of b"UniPoly\x01" + coeff bytes
    frame_pl = np.frombuffer(b"UniPoly\x01", dtype="<u4").copy()

    def lane_sum(x):
        # (16, Ipad) field elements -> (16, 1) sum by halving tree
        while x.shape[1] > 1:
            k = x.shape[1] // 2
            x = FR.add(x[:, :k], x[:, k:])
        return x

    def reduce_lazy(qsum):
        # (2, 16, Ipad) u32 lo/hi limb sums -> canonical planes
        a = qsum[0] & 0xFFFF
        b = qsum[0] >> 16
        c = qsum[1] & 0xFFFF
        d = qsum[1] >> 16
        e = b + c                      # < 2^17: fold the overflow bit up
        d = d + (e >> 16)
        e = e & 0xFFFF
        return FR.add(FR.add(FR.mul(a, one_m), FR.mul(e, two16_m)),
                      FR.mul(d, two32_m))

    def canonical_payload(x_m):
        # Montgomery (16, 1) -> transcript payload: 4 (lo,hi) u64 pairs of
        # the canonical big-endian 32-byte encoding
        c = FR.mul(x_m, one_raw)
        w = [c[2 * j, 0] | (c[2 * j + 1, 0] << 16) for j in range(8)]
        bs = [B.bswap32(x) for x in w]
        return [(bs[7], bs[6]), (bs[5], bs[4]), (bs[3], bs[2]),
                (bs[1], bs[0])]

    def np_payload(words: np.ndarray):
        return [(jnp.uint32(words[2 * i]), jnp.uint32(words[2 * i + 1]))
                for i in range(4)]

    def run(qsum, Q, es, l0, l1, invl1, coeff, joined, const_b0, Qinit,
            state, n_rounds):
        q0 = reduce_lazy(qsum)
        q1 = FR.mul(FR.sub(Q, FR.mul(l0, q0)), invl1)
        dq = FR.sub(q1, q0)
        dl = FR.sub(l1, l0)
        s0 = FR.mul(es, FR.mul(l0, q0))
        s2 = FR.mul(es, FR.mul(dl, dq))
        jm = joined[None, :]
        s0 = jnp.where(jm, FR.mul(coeff, s0), 0)
        s2 = jnp.where(jm, FR.mul(coeff, s2), 0)
        b0 = FR.add(lane_sum(s0), const_b0)
        b2 = lane_sum(s2)

        st = [(state[0], state[1]), (state[2], state[3]),
              (state[4], state[5]), (state[6], state[7])]
        payload = ([(jnp.uint32(frame_pl[0]), jnp.uint32(frame_pl[1]))]
                   + canonical_payload(b0) + canonical_payload(b2))
        st = B.transcript_absorb_long(st, n_rounds, payload)
        dig = B.transcript_squeeze(st, n_rounds + 1)

        # 125-bit optimized challenge: u128 LE of digest bytes 0..15,
        # masked, then * 2^-128 (Montgomery planes via one mul by 2^384)
        w0, w1 = dig[0]
        w2, w3 = dig[1]
        w3 = w3 & jnp.uint32(0x1FFFFFFF)
        ch_raw = jnp.stack(
            [w0 & 0xFFFF, w0 >> 16, w1 & 0xFFFF, w1 >> 16,
             w2 & 0xFFFF, w2 >> 16, w3 & 0xFFFF, w3 >> 16]
            + [jnp.zeros_like(w0)] * 8)[:, None]
        c = FR.mul(ch_raw, two128r)

        # NB: the wider operand goes first (FR.mul shapes its carry state
        # from the first argument; the second broadcasts)
        l_at_c = FR.add(l0, FR.mul(dl, c))
        q_at_c = FR.add(q0, FR.mul(dq, c))
        Qn = jnp.where(jm, q_at_c, Qinit)
        esn = jnp.where(jm, FR.mul(es, l_at_c), es)
        new_state = jnp.stack([x for pair in dig for x in pair])
        return new_state, n_rounds + 2, Qn, esn, c, b0, b2

    return jax.jit(run)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def try_prove(instances, accumulator, transcript):
    """Device-assisted BatchedSumcheck.prove over the opening-reduction
    instances. Returns (proof, r_sumcheck) with identical proof bytes to
    the host path, or None when the device path is not engaged (caller
    falls back). Instances must NOT have setup_sumcheck() called yet;
    this function initializes them (device-resumed or host)."""
    from . import telemetry
    mode = os.environ.get("JOLT_ATLAS_TPU_REDUCTION", "auto")
    if mode == "off":
        telemetry.decide("reduction", "off (env)")
        return None
    from ..field.frvec import FrArray
    from ..poly.spliteq import SplitEq

    # 0 (default): run EVERY round on device, so the one fetch returns only
    # scalars (round messages + final row values, ~10-100 KB) — never the
    # bound rows. A tunneled link can be 1000x slower device->host than
    # host->device (measured 0.1 MB/s down vs 219 MB/s up), so fetch bytes,
    # not FLOPs, decide this path's viability. >0 hands the last N rounds
    # to the host C++ kernels (costs a bound-row fetch; test knob).
    tail_rounds = int(os.environ.get("JOLT_ATLAS_TPU_TAIL_ROUNDS", "0"))
    max_rounds = max(i.num_rounds() for i in instances)
    r_dev = max_rounds - tail_rounds
    if r_dev < 2:
        return None
    head_ids = [k for k, inst in enumerate(instances)
                if max_rounds - inst.num_rounds() < r_dev]
    if not head_ids:
        return None
    if not all(isinstance(instances[k].rlc_fvec, FrArray) for k in head_ids):
        return None
    total = sum(len(instances[k].rlc_fvec) for k in head_ids)
    if mode == "auto" and total < int(
            os.environ.get("JOLT_ATLAS_TPU_REDUCTION_MIN", str(1 << 21))):
        telemetry.decide("reduction", f"below size floor ({total} elems)")
        return None
    # only now pay backend init (jax import / relay handshake) — unless a
    # persisted calibration already ruled this machine's link out
    if mode == "auto":
        from . import linkcal
        if linkcal.cached_nonviable():
            telemetry.decide("reduction", "link nonviable (persisted cal: "
                             + linkcal.cached_summary() + ")")
            return None
    if not _state():
        telemetry.decide("reduction", "no jax backend")
        return None
    jax, FR = _state()
    if mode == "auto" and jax.default_backend() == "cpu":
        telemetry.decide("reduction", "cpu backend")
        return None
    jnp = jax.numpy
    if mode == "auto":
        # measured-link gate: this plan moves ~90 B/elem over the host<->
        # device link; engage only when a one-time calibration shows the
        # link is PCIe/ICI-class (see tpu/linkcal.py for the breakeven
        # math and the measured 150x loss through a tunneled relay)
        from . import linkcal
        if not linkcal.device_path_viable(jax, FR):
            telemetry.decide("reduction", "link nonviable (measured: "
                             + linkcal.cached_summary() + ")")
            return None
    telemetry.decide("reduction", f"ENGAGED ({total} elems, backend "
                     + jax.default_backend() + ")")

    # ---- protocol prefix (host transcript, identical to BatchedSumcheck)
    claims = [inst.input_claim(accumulator) for inst in instances]
    for c in claims:
        transcript.append_scalar(c)
    coeffs = transcript.challenge_vector(len(instances))

    # ---- static plan
    offs = {k: max_rounds - instances[k].num_rounds() for k in head_ids}
    join_order = sorted(head_ids, key=lambda k: (offs[k], k))
    lanes = {k: slot for slot, k in enumerate(join_order)}
    I = len(join_order)
    Ipad = max(_pow2(I), 2)

    # init buffer: every head instance's full RLC row, join order, plus a
    # trailing zero element as the gather target for padding lanes
    parts = [np.asarray(instances[k].rlc_fvec.d).reshape(-1, 4)
             for k in join_order]
    init_off = {}
    pos = 0
    for k, part in zip(join_order, parts):
        init_off[k] = pos
        pos += len(part)
    n_init = pos
    init_np = np.concatenate(parts + [np.zeros((1, 4), np.uint64)], axis=0)
    ninit_pad = _pow2(len(init_np))
    if ninit_pad > len(init_np):
        init_np = np.concatenate(
            [init_np, np.zeros((ninit_pad - len(init_np), 4), np.uint64)])
    zero_slot = n_init
    init_dev = _put_flat(_u64_to_planes(init_np))

    ses = {k: SplitEq(instances[k].point) for k in join_order}

    # per-lane constants
    one = Fr.one()
    coeff_pl = _fr_to_planes(
        [coeffs[k] for k in join_order] + [Fr.zero()] * (Ipad - I))
    qinit_pl = _fr_to_planes(
        [claims[k] for k in join_order] + [Fr.zero()] * (Ipad - I))
    coeff_dev = _put_flat(coeff_pl)
    qinit_dev = _put_flat(qinit_pl)

    Q = qinit_dev
    es = _put_flat(_fr_to_planes([one] * Ipad))

    state_np = np.frombuffer(transcript.state, dtype="<u4").copy()
    state = jax.device_put(state_np)
    n_rounds = jnp.uint32(transcript.n_rounds)

    tail_k = _tail_kernel(Ipad)
    b0s, b2s = [], []
    dbg = os.environ.get("JOLT_ATLAS_TPU_DEBUG", "") not in ("", "0")
    if dbg:
        import sys
        import time as _time
        _t_start = _time.time()
        print(f"[tpu.reduction] {I} instances, {total} elems, "
              f"{r_dev} device rounds", file=sys.stderr, flush=True)

    # round-0 layout is built from init by the bind kernel (all-new lanes)
    buf = jnp.zeros((16, 1), dtype=jnp.uint32)
    layout = []          # list of (k, elem_off, size) in join order

    for r in range(r_dev):
        # -- build next layout: continuing halves + round-r joiners
        new_layout = []
        pos = 0
        for (k, _o, sz) in layout:
            new_layout.append((k, pos, sz // 2))
            pos += sz // 2
        for k in join_order:
            if offs[k] == r:
                sz = len(instances[k].rlc_fvec)
                new_layout.append((k, pos, sz))
                pos += sz
        n_exact = pos
        n_pad = _pow2(n_exact)

        lo_pos = np.full(n_pad, 0, dtype=np.int32)
        hi_pos = np.zeros(n_pad, dtype=np.int32)
        init_pos = np.full(n_pad, zero_slot, dtype=np.int32)
        is_new = np.ones(n_pad, dtype=bool)
        for (k, o, sz) in new_layout:
            j = np.arange(sz, dtype=np.int32)
            if offs[k] == r:
                is_new[o:o + sz] = True
                init_pos[o:o + sz] = init_off[k] + j
            else:
                old_off = next(oo for (kk, oo, ss) in layout if kk == k)
                is_new[o:o + sz] = False
                lo_pos[o:o + sz] = old_off + j
                hi_pos[o:o + sz] = old_off + sz + j

        if r == 0:
            c_dummy = jnp.zeros((16, 1), dtype=jnp.uint32)
            buf = _bind_kernel(n_pad, buf.shape[1], init_dev.shape[1])(
                buf, init_dev, c_dummy, jnp.asarray(lo_pos),
                jnp.asarray(hi_pos), jnp.asarray(init_pos),
                jnp.asarray(is_new))
        else:
            buf = _bind_kernel(n_pad, buf.shape[1], init_dev.shape[1])(
                buf, init_dev, c_dev, jnp.asarray(lo_pos),
                jnp.asarray(hi_pos), jnp.asarray(init_pos),
                jnp.asarray(is_new))
        layout = new_layout

        # -- q(0) gather tables for this round
        whi_parts = [np.array([(FR.R % FR.P >> (16 * i)) & 0xFFFF
                               for i in range(16)], dtype=np.uint32
                              ).reshape(16, 1)]
        wlo_parts = [whi_parts[0].copy()]
        whi_off, wlo_off = {}, {}
        koff1, koff2 = 1, 1
        for (k, o, sz) in layout:
            lr = r - offs[k]
            whi, shift, wlo, log_wlo = ses[k].tables(lr)
            if whi is not None:
                arr = _u64_to_planes(np.asarray(whi if isinstance(whi, np.ndarray) else whi.d).reshape(-1, 4))
                whi_parts.append(arr)
                whi_off[k] = (koff1, shift)
                koff1 += arr.shape[1]
            else:
                whi_off[k] = (0, 0)
            if wlo is not None:
                arr = _u64_to_planes(np.asarray(wlo if isinstance(wlo, np.ndarray) else wlo.d).reshape(-1, 4))
                wlo_parts.append(arr)
                wlo_off[k] = (koff2, log_wlo)
                koff2 += arr.shape[1]
            else:
                wlo_off[k] = (0, -1)
        # +1: a guaranteed all-zero column at koff1/koff2 — padding grid
        # entries point their weight there so they contribute exactly 0
        Kpad = _pow2(max(koff1, koff2) + 1)
        whi_tab = np.zeros((16, Kpad), dtype=np.uint32)
        whi_tab[:, :koff1] = np.concatenate(whi_parts, axis=1)
        wlo_tab = np.zeros((16, Kpad), dtype=np.uint32)
        wlo_tab[:, :koff2] = np.concatenate(wlo_parts, axis=1)

        # block-aligned grid: every _Q0_BLK-entry block is segment-pure, so
        # the kernel can block-sum before the (slow) lane scatter and all
        # accumulation provably fits u32
        raw = sum(sz // 2 for (_k, _o, _sz) in layout)
        blk = min(_Q0_BLK, _pow2(raw))
        aligned = 0
        for (_k, _o, sz) in layout:
            aligned += -(-(sz // 2) // blk) * blk
        G = _pow2(aligned)
        nblk = G // blk
        whi_idx = np.full(G, koff1, dtype=np.int32)
        wlo_idx = np.full(G, koff2, dtype=np.int32)
        lo_q = np.zeros(G, dtype=np.int32)
        blkseg = np.full(nblk, Ipad - 1, dtype=np.int32)
        pos = 0
        for (k, o, sz) in layout:
            half = sz // 2
            j = np.arange(half, dtype=np.int32)
            off1, shift = whi_off[k]
            off2, log_wlo = wlo_off[k]
            whi_idx[pos:pos + half] = off1 + (j >> shift) if off1 else 0
            wlo_idx[pos:pos + half] = (
                off2 + (j & ((1 << log_wlo) - 1)) if off2 else 0)
            lo_q[pos:pos + half] = o + j
            blkseg[pos // blk:-(-(pos + half) // blk)] = lanes[k]
            pos += -(-half // blk) * blk

        telemetry.count("reduction", 3)  # bind + q0 + tail this round
        qsum = _q0_kernel(n_pad, Kpad, Ipad, nblk, blk)(
            buf, _put_flat(whi_tab), _put_flat(wlo_tab),
            jnp.asarray(whi_idx), jnp.asarray(wlo_idx), jnp.asarray(lo_q),
            jnp.asarray(blkseg))

        # -- per-round lane scalars
        l0s, l1s, inv1s = [], [], []
        joined_np = np.zeros(Ipad, dtype=bool)
        for k in join_order:
            if offs[k] <= r:
                l0, l1 = ses[k].l_linear(r - offs[k])
                l0s.append(l0)
                l1s.append(l1)
                inv1s.append(l1.inverse())
                joined_np[lanes[k]] = True
            else:
                l0s.append(one)
                l1s.append(one)
                inv1s.append(one)
        pad = [one] * (Ipad - I)
        cb0 = Fr.zero()
        for k, inst in enumerate(instances):
            nr = inst.num_rounds()
            if max_rounds - nr > r:
                cb0 = cb0 + coeffs[k] * _mul_pow2(
                    claims[k], max_rounds - r - nr - 1)

        state, n_rounds, Q, es, c_dev, b0, b2 = tail_k(
            qsum, Q, es,
            _put_flat(_fr_to_planes(l0s + pad)),
            _put_flat(_fr_to_planes(l1s + pad)),
            _put_flat(_fr_to_planes(inv1s + pad)),
            coeff_dev, jnp.asarray(joined_np),
            _put_flat(_fr_to_planes([cb0])), qinit_dev, state, n_rounds)
        b0s.append(b0[:, 0])
        b2s.append(b2[:, 0])
        if dbg:
            print(f"[tpu.reduction] round {r}: n_pad={n_pad} Kpad={Kpad} "
                  f"nblk={nblk} dispatched t+{_time.time() - _t_start:.1f}s",
                  file=sys.stderr, flush=True)

    # final half-bind to materialize the handoff rows
    n_fin = sum(sz for (_k, _o, sz) in layout) // 2
    nfin_pad = _pow2(n_fin)
    lo_pos = np.full(nfin_pad, 0, dtype=np.int32)
    hi_pos = np.zeros(nfin_pad, dtype=np.int32)
    fin_layout = []
    pos = 0
    for (k, o, sz) in layout:
        fin_layout.append((k, pos, sz // 2))
        j = np.arange(sz // 2, dtype=np.int32)
        lo_pos[pos:pos + sz // 2] = o + j
        hi_pos[pos:pos + sz // 2] = o + sz // 2 + j
        pos += sz // 2
    telemetry.count("reduction", 1)  # final bind
    buf = _bind_kernel(nfin_pad, buf.shape[1], init_dev.shape[1])(
        buf, init_dev, c_dev, jnp.asarray(lo_pos), jnp.asarray(hi_pos),
        jnp.full(nfin_pad, zero_slot, dtype=np.int32),
        jnp.zeros(nfin_pad, dtype=bool))

    packed = jnp.concatenate(
        [jnp.stack(b0s).ravel().astype(jnp.uint32),
         jnp.stack(b2s).ravel().astype(jnp.uint32),
         state, Q.ravel(), es.ravel(), buf.ravel()])
    flat = np.asarray(packed)          # the single device->host fetch

    # ---- unpack
    o = 0
    b0_np = flat[o:o + 16 * r_dev].reshape(r_dev, 16)[:, :, None]
    o += 16 * r_dev
    b2_np = flat[o:o + 16 * r_dev].reshape(r_dev, 16)[:, :, None]
    o += 16 * r_dev
    dev_state = flat[o:o + 8].astype("<u4").tobytes()
    o += 8
    Q_np = flat[o:o + 16 * Ipad].reshape(16, Ipad)
    o += 16 * Ipad
    es_np = flat[o:o + 16 * Ipad].reshape(16, Ipad)
    o += 16 * Ipad
    buf_np = flat[o:o + 16 * nfin_pad].reshape(16, nfin_pad)

    # ---- host transcript replay (derives the same challenges bit-exactly)
    from ..poly.unipoly import CompressedUniPoly
    r_sumcheck: list[Fr] = []
    compressed: list[CompressedUniPoly] = []
    for r in range(r_dev):
        cb0 = _planes_col_to_fr(b0_np[r], 0)
        cb2 = _planes_col_to_fr(b2_np[r], 0)
        cp = CompressedUniPoly([cb0, cb2])
        cp.append_to_transcript(transcript)
        r_sumcheck.append(transcript.challenge_scalar_optimized())
        compressed.append(cp)
    if transcript.state != dev_state:
        raise RuntimeError(
            "device transcript diverged from host replay — "
            "TPU Fiat-Shamir kernel produced different bytes")

    # ---- resume instances on the host for the tail rounds
    individual_claims: list[Fr] = []
    for k, inst in enumerate(instances):
        nr = inst.num_rounds()
        if k in lanes:
            slot = lanes[k]
            ko, sz = next((o2, s2) for (k2, o2, s2) in fin_layout
                          if k2 == k)
            rows = FrArray(np.ascontiguousarray(
                _planes_to_u64(buf_np[:, ko:ko + sz])))
            se = SplitEq(inst.point)
            local = r_dev - offs[k]
            for lr in range(local):
                se.note_challenge(r_sumcheck[offs[k] + lr], lr)
            inst.resume_from_device(rows, local, se)
            individual_claims.append(
                _planes_col_to_fr(es_np, slot) * _planes_col_to_fr(Q_np, slot))
        else:
            if nr > 0:
                inst.setup_sumcheck()
            individual_claims.append(
                _mul_pow2(claims[k], max_rounds - r_dev - nr)
                if max_rounds - r_dev - nr >= 0 else claims[k])

    # ---- tail rounds (host, same loop as BatchedSumcheck.prove)
    from ..subprotocols.sumcheck import BatchedSumcheck
    return BatchedSumcheck.prove_tail(
        instances, claims, coeffs, individual_claims, compressed,
        r_sumcheck, accumulator, transcript, r_dev, max_rounds)


def _mul_pow2(x: Fr, k: int) -> Fr:
    from ..subprotocols.sumcheck import _mul_pow2 as m
    return m(x, k)
