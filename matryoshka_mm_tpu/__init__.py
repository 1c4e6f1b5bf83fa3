"""matryoshka_mm_tpu: a TPU-native (JAX/XLA/Pallas) Matryoshka Multimodal
Model framework.

Re-implements the capabilities of the M3 / LLaVA reference stack
(matryoshka-mm) with an idiomatic JAX architecture: functional models over
parameter pytrees, Pallas flash attention, pjit/``jax.sharding`` parallelism,
and a fixed-shape multimodal splice that compiles once per shape bucket.
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
from .kvconfig import (  # noqa: F401
    create_string_from_kv,
    parse_kv_from_string,
    parse_list,
    per_scale_specs,
    tokscales_from_spec,
)
