from .sharding import batch_spec, param_specs, shard_params_and_batch

__all__ = ["batch_spec", "param_specs", "shard_params_and_batch"]
