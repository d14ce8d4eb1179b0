"""Host<->device link calibration for the device-path dispatch decision.

The device-resident engines (tpu/reduction.py, tpu/msm.py) are
bandwidth plays: they move every polynomial element to the accelerator
(~64 B/elem in limb planes), run the sumcheck head rounds there, and fetch
the bound rows back. Whether that beats the host C++ kernels depends
entirely on what the link sustains:

  - co-located TPU (PCIe/ICI-class runtime): multi-GB/s transfers,
    sub-ms dispatches -> device path wins for multi-M-element batches.
  - tunneled / relayed device (e.g. a remote-compile relay): tens of
    MB/s and 0.1-1 s dispatch latency -> the SAME plan loses to the host
    path by 10-100x (measured: 1054 s vs ~7 s on a 17.8M-element
    nanoGPT opening reduction through one such relay).

No static heuristic distinguishes these — same jax API, same device name
— so `auto` mode measures once: a small up/down transfer probe plus one
timed micro round of the actual planes kernels, persisted next to the
XLA compilation cache and keyed by backend, so every later process pays
nothing. Mirrors the role of the reference's rayon-vs-serial dispatch
switch (common/src/lib.rs parallelism guard), recast for an accelerator
whose *link*, not core count, is the variable.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Engage thresholds for the device head-round engines. Derivation (see
# module docstring of tpu/reduction.py for the byte plan): the device plan
# moves ~90 B/elem amortized; the host path sustains ~2.5-3M elems/s
# (4-core C++ Gruen kernels, SCALING.md). Breakeven is therefore
# ~250 MB/s sustained; 2x safety margin -> 500 MB/s. The micro-round
# bound rejects links whose per-dispatch latency would dominate the
# ~20-60 dispatches of a real schedule.
MIN_MBPS = float(os.environ.get("JOLT_ATLAS_LINK_MIN_MBPS", "500"))
MAX_ROUND_S = float(os.environ.get("JOLT_ATLAS_LINK_MAX_ROUND_S", "0.05"))

_CACHED: dict | None = None


def _cal_path() -> str:
    base = os.environ.get("JOLT_ATLAS_JAX_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".jax_cache")
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, "link_calibration.json")


def _measure(jax, FR) -> dict:
    """~16 MB up, ~16 MB down, one 64k-element q0-shaped micro round."""
    jnp = jax.numpy
    dev = jax.devices()[0]

    up = np.zeros((16, 1 << 18), dtype=np.uint32)  # 16 MB of limb planes
    t0 = time.time()
    d = jax.device_put(up.ravel(), dev)
    d.block_until_ready()
    up_s = max(time.time() - t0, 1e-6)
    mb = up.nbytes / 1e6

    # down: probe 256 KB first — on a slow tunneled link (observed
    # 0.1 MB/s) a full-size fetch would make the calibration itself take
    # minutes; only bother with the accurate 16 MB fetch on a fast link
    t0 = time.time()
    _ = np.asarray(jax.numpy.reshape(d, (16, 1 << 18))[0, : 1 << 16])
    small_s = max(time.time() - t0, 1e-6)
    if small_s > 0.25:           # < ~1 MB/s: no need for a bigger sample
        down_mbps = 0.262144 / small_s
    else:
        t0 = time.time()
        _ = np.asarray(d)
        down_mbps = mb / max(time.time() - t0, 1e-6)

    # micro round: gather + two Montgomery muls + block sum on 64k elements
    # (the exact shape class reduction.py dispatches, tiny-size instance)
    x = jnp.reshape(d, (16, 1 << 18))[:, : 1 << 16]
    idx = jnp.arange(1 << 16, dtype=jnp.int32)

    def kern(buf, ix):
        g = jnp.take(buf, ix, axis=1)
        p = FR.mul(FR.mul(g, g), g)
        return jnp.sum(p.reshape(16, 1 << 4, 1 << 12), axis=2)

    k = jax.jit(kern)
    k(x, idx).block_until_ready()          # compile (not timed)
    t0 = time.time()
    for _ in range(3):
        r = k(x, idx)
    r.block_until_ready()
    round_s = (time.time() - t0) / 3

    return {
        "backend": jax.default_backend(),
        "up_MBps": round(mb / up_s, 1),
        "down_MBps": round(down_mbps, 1),
        "round_64k_s": round(round_s, 4),
        "ts": time.time(),
    }


def get(jax, FR) -> dict | None:
    """The persisted (or freshly measured) calibration for this backend;
    None when measurement itself fails."""
    global _CACHED
    if _CACHED is not None:
        return _CACHED
    path = _cal_path()
    backend = jax.default_backend()
    try:
        with open(path) as f:
            data = json.load(f)
        # a persisted calibration describes a *link*, not the machine —
        # tunneled runtimes change bandwidth run to run (observed: down
        # 0.0 MB/s one session, 30 MB/s the next). Expire after 12 h.
        if (data.get("backend") == backend
                and time.time() - data.get("ts", 0) < 12 * 3600):
            _CACHED = data
            return data
    except (OSError, ValueError):
        pass
    try:
        data = _measure(jax, FR)
    except Exception:
        return None
    try:
        with open(path, "w") as f:
            json.dump(data, f)
    except OSError:
        pass
    _CACHED = data
    return data


def _clears(cal: dict) -> bool:
    return (min(cal["up_MBps"], cal["down_MBps"]) >= MIN_MBPS
            and cal["round_64k_s"] <= MAX_ROUND_S)


def cached_summary() -> str:
    """Human-readable one-liner of the persisted calibration (telemetry)."""
    cal = _CACHED
    if cal is None:
        try:
            import json as _json
            with open(_cal_path()) as f:
                cal = _json.load(f)
        except (OSError, ValueError):
            return "no calibration"
    return (f"up {cal.get('up_MBps', '?')} MB/s, "
            f"down {cal.get('down_MBps', '?')} MB/s, "
            f"round {cal.get('round_64k_s', '?')} s")


def cached_nonviable() -> bool:
    """True when a persisted calibration (any backend) already failed the
    thresholds — lets callers skip backend init (a ~10 s jax import +
    relay handshake) entirely on machines known to have a slow link."""
    try:
        with open(_cal_path()) as f:
            data = json.load(f)
        if time.time() - data.get("ts", 0) >= 12 * 3600:
            return False  # stale: re-measure before deciding
        return not _clears(data)
    except (OSError, ValueError, KeyError):
        return False


def device_path_viable(jax, FR) -> bool:
    """True when the measured link clears the engage thresholds."""
    cal = get(jax, FR)
    if cal is None:
        return False
    return _clears(cal)
