"""Mesh/sharding layer: DP batch sharding + volume model-parallelism."""
from eval_driving_safety_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    dp_sharding,
    replicated,
    shard_batch,
    constrain_psv,
    sharded_pgd_step,
    sharded_patch_step,
)
