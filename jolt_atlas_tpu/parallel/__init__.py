from .mesh import make_mesh, sharded_product_round, dryrun_proving_step

__all__ = ["make_mesh", "sharded_product_round", "dryrun_proving_step"]
