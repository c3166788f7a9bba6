from phantom_vlb_tpu.parallel.sharding import (
    DEFAULT_RULES,
    batch_spec,
    infer_param_shardings,
    shard_params,
)

__all__ = ["DEFAULT_RULES", "batch_spec", "infer_param_shardings", "shard_params"]
