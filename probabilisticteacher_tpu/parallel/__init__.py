from .mesh import host_max, make_mesh, replicate, shard_batch  # noqa: F401
from .prefetch import DevicePrefetcher  # noqa: F401
