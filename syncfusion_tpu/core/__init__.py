"""Core runtime: device mesh, precision policy, config, RNG, checkpointing."""

from syncfusion_tpu.core.mesh import (
    MeshSpec,
    create_mesh,
    data_sharding,
    replicated,
    shard_batch,
    local_batch_size,
)
from syncfusion_tpu.core.precision import Precision, policy
from syncfusion_tpu.core.config import load_config, instantiate, Config
