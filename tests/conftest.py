import os

# Run the test suite on a virtual 8-device CPU mesh so multi-chip sharding
# logic is exercised without TPU hardware. The ambient environment pins
# JAX_PLATFORMS=axon (TPU) via sitecustomize before conftest runs, so the
# platform must be overridden through jax.config, and XLA_FLAGS before the
# first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# Device-engine tests (test_tpu_msm.py / test_tpu_reduction.py): their XLA
# kernels take many minutes to compile on the CPU backend the FIRST time,
# but the repo-local persistent compilation cache (.jax_cache/<cpu-tag>/)
# makes later runs take seconds. Policy: run them by default once a prior
# successful run has left the cache warm (marker below), otherwise require
# the JOLT_ATLAS_SLOW_TESTS=1 opt-in that pays the one-time compile.

def _device_cache_marker(kind: str = "") -> str:
    from jolt_atlas_tpu.tpu import enable_compile_cache  # noqa: F401
    import jax
    d = jax.config.jax_compilation_cache_dir or "/tmp/.jax_cache"
    return os.path.join(d, "device_tests_warm"
                        + ("_" + kind if kind else ""))


def device_tests_enabled(kind: str = "") -> bool:
    # per-engine warm gate: msm and reduction kernels compile
    # independently (reduction takes far longer on the CPU backend)
    if os.environ.get("JOLT_ATLAS_SLOW_TESTS", "") not in ("", "0"):
        return True
    try:
        return (os.path.exists(_device_cache_marker(kind))
                or os.path.exists(_device_cache_marker()))
    except Exception:
        return False


def mark_device_tests_warm(kind: str = "") -> None:
    try:
        path = _device_cache_marker(kind)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write("device-engine kernels compiled and cached\n")
    except OSError:
        pass
