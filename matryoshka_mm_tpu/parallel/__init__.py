from .inference import make_tp_mesh, shard_model_for_inference  # noqa: F401
from .mesh import initialize_distributed, make_mesh, put_batch  # noqa: F401
from .sharding import batch_sharding, param_shardings, shard_params  # noqa: F401
