from .clip import ClipVisionConfig, clip_vision_forward, init_clip_params  # noqa: F401
from .llama import (  # noqa: F401
    KVCache,
    LlamaConfig,
    embed_tokens,
    init_kv_cache,
    init_llama_params,
    llama_forward,
    llama_logits,
    lm_head,
)
from .llava import (  # noqa: F401
    LlavaConfig,
    M3Preset,
    encode_images,
    forward_spliced,
    init_llava_params,
    prepare_multimodal,
    project,
    router_forward,
    splice_capacity,
)
from .projector import apply_projector, init_projector_params  # noqa: F401
from .router import (  # noqa: F401
    build_router_input,
    dense_gating_forward,
    ema_update,
    init_dense_gating_params,
    uniform_gating_forward,
)
