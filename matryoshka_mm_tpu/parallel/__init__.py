from .mesh import initialize_distributed, make_mesh, put_batch  # noqa: F401
from .sharding import batch_sharding, param_shardings, shard_params  # noqa: F401
