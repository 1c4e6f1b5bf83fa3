from .pooling import matryoshka_pool, pooling_matrix  # noqa: F401
from .splice import splice_multimodal  # noqa: F401
