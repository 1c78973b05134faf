from .mesh import host_max, make_mesh, replicate, shard_batch  # noqa: F401
