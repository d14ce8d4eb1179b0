"""TPU-native compute kernels (JAX/XLA/Pallas).

Device-side field arithmetic, curve operations and MSM used inside
`prove()` when a real accelerator is present. Host C++ kernels remain the
fallback and the correctness oracle.

Importing this package enables JAX's persistent compilation cache (repo-local
`.jax_cache/`): the MSM/sumcheck kernels take 10-100 s to compile per shape
on the remote-compile relay, and every prover process would otherwise pay
that again.
"""

import os


def enable_compile_cache() -> None:
    # Cache entries are NOT portable across host CPUs (XLA:CPU AOT bakes
    # the compile machine's feature set and warns/SIGILLs on mismatch), so
    # key the directory by platform + CPU model. The TPU relay entries are
    # the expensive ones (10-100 s compiles) and the chip generation is
    # stable per deployment.
    base = os.environ.get("JOLT_ATLAS_JAX_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".jax_cache")
    tag = "dev"
    try:
        import hashlib
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    tag = hashlib.sha256(line.encode()).hexdigest()[:8]
                    break
    except OSError:
        pass
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(base, tag))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


enable_compile_cache()
