"""Device-mesh parallelism: dp/tp sharding over ICI via jax.sharding + jit."""

from seld_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_partition_spec,
    shard_batch,
    shard_variables,
)
from seld_tpu.parallel.dp_step import make_dp_train_step, replicate_state  # noqa: F401
from seld_tpu.parallel import multihost  # noqa: F401
