from .config import (
    BLOCK_OUTPUT,
    MLP_OUTPUT,
    CrossAttnConfig,
    DecoderConfig,
    PerceiverConfig,
    VisionConfig,
    injection_site_from_layer_format,
)
from .decoder import (
    causal_lm_forward,
    decoder_layer,
    forward_hidden,
    init_decoder_params,
    init_kv_cache,
    logits_from_hidden,
)

__all__ = [
    "BLOCK_OUTPUT",
    "MLP_OUTPUT",
    "CrossAttnConfig",
    "DecoderConfig",
    "PerceiverConfig",
    "VisionConfig",
    "injection_site_from_layer_format",
    "causal_lm_forward",
    "decoder_layer",
    "forward_hidden",
    "init_decoder_params",
    "init_kv_cache",
    "logits_from_hidden",
]
