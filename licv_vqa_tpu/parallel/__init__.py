from .ring import RingSpec, ring_self_attention
from .sharding import batch_spec, param_specs, shard_params_and_batch

__all__ = [
    "RingSpec",
    "batch_spec",
    "param_specs",
    "ring_self_attention",
    "shard_params_and_batch",
]
