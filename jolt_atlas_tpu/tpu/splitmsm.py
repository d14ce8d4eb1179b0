"""Heterogeneous host+device MSM: the chip takes a power-of-two suffix of
the points while the host Pippenger runs its prefix CONCURRENTLY, and the
two partial sums combine with one point add.

This is the TPU-native answer to the reference's multi-threaded CPU MSM
(joltworks/src/msm/mod.rs:20-333): instead of translating its rayon split
across cores, the split crosses the host/accelerator boundary. Even when
the chip's end-to-end rate only matches the host's, overlapping the two
engines halves the wall time of the big HyperKZG MSMs (the fold-commit
batch and the opening witness, joltworks/src/poly/commitment/hyperkzg/
mod.rs:44-100) — and the byte plan is favorable precisely there: the SRS
bases are device-resident across proofs (DeviceBases), per-MSM traffic is
32 B/point of scalars up and ~100 bytes of result down, so the measured
dead down-link of a relayed deployment is irrelevant to this engine.

The split fraction comes from the persisted calibration's MEASURED
end-to-end engine rates (tpu/linkcal.py msm_split_plan), sized so both
engines finish together; the device share is rounded to a power of two so
the jit compile-key set stays tiny (compiles persist in the XLA cache).
"""

from __future__ import annotations

# test hook: force a tiny Pippenger window so the CPU-backend kernels
# compile in seconds (production windows are chosen by tpu/msm._pick_c)
_FORCE_C = 0


def start_split(srs, packed: bytes, count: int):
    """Enqueue the device's power-of-two suffix share of one MSM. Returns
    an opaque state (the host prefix length is state[2]) or None when the
    split is not engaged. The caller computes the host prefix MSM (and any
    other host work) while the device runs, then calls finish_split."""
    from . import linkcal, telemetry
    resident = getattr(srs, "_device", None) is not None
    prep_n = srs.prepared_bases().n if srs.prepared_bases() else 0
    n_dev, why = linkcal.msm_split_plan(
        count, setup_points=0 if resident else prep_n)
    if not n_dev:
        telemetry.decide("msm", "declined: " + why)
        return None
    dev = srs.device_bases()
    if dev is None:
        return None
    from .msm import _GridSkewError
    k = count - n_dev
    try:
        handle = dev.start([packed[32 * k:]], [n_dev], c=_FORCE_C,
                           offsets=[k])
    except _GridSkewError:
        return None  # low-entropy scalars: host dense path handles them
    telemetry.decide("msm", "ENGAGED: " + why)
    return (dev, handle, k)


def finish_split(state, host_prefix_pt):
    """Combine the device partial sum with the host prefix point."""
    dev, handle, k = state
    dev_pt = dev.finish(handle)[0]
    return dev_pt if host_prefix_pt is None else host_prefix_pt + dev_pt


def _host_threads(n: int) -> None:
    """Cap the host Pippenger's OpenMP threads while device work is in
    flight (one core stays free for the relay IO threads; without it the
    4-way MSM starves the link and the 'concurrent' split serializes)."""
    try:
        from ..curve import native
        lib = native._load()
        if lib is not None:
            lib.msm_set_threads(n)
    except Exception:
        pass


def msm_packed_split(srs, packed: bytes, count: int):
    """One MSM of `count` canonical 32-byte-LE scalars against the SRS
    base prefix, host+device split. Returns the affine G1 sum, or None
    when the split is not engaged (caller runs its host path)."""
    st = start_split(srs, packed, count)
    if st is None:
        return None
    prep = srs.prepared_bases()
    if prep is None:
        return None
    import os
    k = st[2]
    ncpu = os.cpu_count() or 4
    _host_threads(max(1, ncpu - 1))
    try:
        host_pt = prep.msm_packed(packed[: 32 * k], k) if k else None
    finally:
        _host_threads(ncpu)
    return finish_split(st, host_pt)
