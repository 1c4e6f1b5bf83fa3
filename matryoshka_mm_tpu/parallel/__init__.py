from .mesh import make_mesh  # noqa: F401
from .sharding import batch_sharding, param_shardings, shard_params  # noqa: F401
