"""Device Pippenger MSM (tpu/msm.py) vs the host batch-affine engine.

Forcing JOLT_ATLAS_TPU_MSM=on runs the XLA kernels on the test CPU
backend, so this exercises the whole device path (base upload, digit
grids, projective accumulation, bit-plane bucket combine, window Horner)
without TPU hardware. Mirrors the role of the reference's MSM tests
(joltworks/src/msm/mod.rs) for the accelerator engine that backs dense
witness commits on link-viable deployments (commitment/kzg.py
device_bases)."""

import os

import numpy as np
import pytest

# the accumulate/combine kernels take minutes to compile on the CPU
# backend the first time; opt-in alongside the other device-path tests
from conftest import device_tests_enabled, mark_device_tests_warm

pytestmark = pytest.mark.skipif(
    not device_tests_enabled("msm"),
    reason="first run compiles XLA kernels for minutes; set "
           "JOLT_ATLAS_SLOW_TESTS=1 once to seed .jax_cache, "
           "after which these run by default")

from jolt_atlas_tpu.commitment.kzg import KZGSRS
from jolt_atlas_tpu.curve.native import pack_scalars
from jolt_atlas_tpu.field.constants import FR_MODULUS


def test_device_msm_matches_host():
    from jolt_atlas_tpu.tpu import msm as tmsm
    if not tmsm.available():
        pytest.skip("no jax backend")
    n = 512
    srs = KZGSRS.setup(n - 1)
    prep = srs.prepared_bases()
    assert prep is not None
    dev = tmsm.DeviceBases(prep.buf.raw, prep.n)
    rng = np.random.default_rng(0x715)
    cases = [
        # bulk full-width (254-bit) scalars: exercises the top-window
        # sub-lane split (the top Pippenger window has only
        # 254 - (W-1)c bits of entropy; its digits round-robin over
        # S = B/2^topbits sub-lanes folded on device)
        [int.from_bytes(rng.bytes(32), "little") % FR_MODULUS
         for _ in range(n)],
        [int.from_bytes(rng.bytes(24), "little") for _ in range(n)],
        list(rng.integers(0, 1 << 16, size=n)),      # small witness values
        [0] * n,                                     # all zero -> infinity
        [1] + [0] * (n - 1),                         # single base
        [FR_MODULUS - 1] * 8,                        # r-1 (negation-heavy)
    ]
    from jolt_atlas_tpu.field.scalar import Fr
    packed = [pack_scalars([Fr(int(x)) for x in c]) for c in cases]
    counts = [len(c) for c in cases]
    # c=4 keeps the CPU-backend kernels tiny (64 windows x 16 buckets =
    # 1024 lanes; the adaptive production windows compile for minutes on
    # the XLA CPU backend) while exercising the same machinery, including
    # the top-window sub-lane fold (topbits=2 -> S=4)
    got = dev.msm_batch_packed(packed, counts, c=4)
    want = [prep.msm_packed(p, k) for p, k in zip(packed, counts)]
    for g, w, c in zip(got, want, cases):
        assert g == w, f"device MSM diverged on case {cases.index(c)}"
    # contract: pathologically non-uniform scalars (all equal at bulk
    # count) collapse every window into one bucket — the engine refuses
    # with _GridSkewError and the production caller takes the host
    # engine's dense per-digit path instead (prover.py commit phase
    # try/except)
    # adaptive (production) window here: the guard trips during the HOST
    # grid build, before any kernel compile (at c=4 the depth cap scales
    # with average occupancy and equal scalars can never exceed it)
    equal = pack_scalars([Fr(FR_MODULUS - 3)] * n)
    with pytest.raises(tmsm._GridSkewError):
        dev.msm_batch_packed([equal], [n])
    mark_device_tests_warm("msm")  # later runs hit the compile cache -> fast


def test_split_msm_matches_host(tmp_path, monkeypatch):
    """Host-prefix + device-pow2-suffix split (tpu/splitmsm.py) returns
    exactly the host engine's point; exercises the on-device grid with a
    nonzero base offset and the calibration-driven fraction plumbing."""
    import json, time
    from jolt_atlas_tpu.tpu import linkcal, splitmsm
    from jolt_atlas_tpu.tpu import msm as tmsm
    if not tmsm.available():
        pytest.skip("no jax backend")
    # fabricated calibration: device ~ host -> split takes half
    cal = {"backend": "cpu", "up_MBps": 1e4, "down_MBps": 1e4,
           "round_64k_s": 0.001, "pallas_adds_per_s": 3e7,
           "host_msm_pps": 1e6, "dev_msm_pps": 1e6,
           "dev_msm_pps_16": 1e6, "ts": time.time()}
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "link_calibration.json").write_text(json.dumps(cal))
    monkeypatch.setenv("JOLT_ATLAS_JAX_CACHE", str(cache))
    monkeypatch.setenv("JOLT_ATLAS_TPU_MSM", "on")
    monkeypatch.setattr(linkcal, "_CACHED", None)
    monkeypatch.setattr(linkcal, "_SPLIT_FLOOR", 64)
    monkeypatch.setattr(linkcal, "_SPLIT_MIN_DEV", 64)
    monkeypatch.setattr(linkcal, "_SPLIT_MIN_SAVE_S", -1.0)
    monkeypatch.setattr(splitmsm, "_FORCE_C", 4)
    n = 256
    srs = KZGSRS.setup(n - 1)
    prep = srs.prepared_bases()
    from jolt_atlas_tpu.field.scalar import Fr
    rng = np.random.default_rng(0x5717)
    scalars = [Fr(int.from_bytes(rng.bytes(32), "little") % FR_MODULUS)
               for _ in range(n)]
    packed = pack_scalars(scalars)
    got = splitmsm.msm_packed_split(srs, packed, n)
    assert got is not None, "split did not engage under forced calibration"
    want = prep.msm_packed(packed, n)
    assert got == want
    mark_device_tests_warm("msm")
