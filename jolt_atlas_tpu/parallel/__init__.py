"""Multi-chip parallelism: mesh construction, sharded kernels, and the
mesh-sharded opening reduction.

Lazy imports: `opening.prove_batch_opening` probes `active_mesh()` on every
prove, and the jax/shard_map imports in the submodules must not tax the
host-only path.
"""


def __getattr__(name):
    if name in ("make_mesh", "sharded_product_round", "dryrun_proving_step"):
        from . import mesh
        return getattr(mesh, name)
    if name in ("mesh_scope", "active_mesh", "try_prove"):
        from . import shardedreduction
        return getattr(shardedreduction, name)
    raise AttributeError(name)


__all__ = ["make_mesh", "sharded_product_round", "dryrun_proving_step",
           "mesh_scope", "active_mesh"]
