from .mesh import make_mesh, shard_theta, sharded_solve  # noqa: F401
