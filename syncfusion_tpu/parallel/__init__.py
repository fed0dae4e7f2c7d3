"""Multi-chip parallelism utilities (mesh lives in core.mesh)."""

from syncfusion_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    MeshSpec,
    create_mesh,
    mesh_for_batch,
    shard_batch,
)
from syncfusion_tpu.parallel.sampling import DataParallelSampler
