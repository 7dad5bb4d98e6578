from lmrs_tpu.models.transformer import (  # noqa: F401
    KVCache,
    LayerWeights,
    TransformerParams,
    embed_tokens,
    forward,
    init_kv_cache,
)
