from ntire2022_esr_tpu.parallel.mesh import (  # noqa: F401
    data_mesh,
    data_space_mesh,
    make_mesh,
)
from ntire2022_esr_tpu.parallel.eval import (  # noqa: F401
    sharded_batch_apply,
    sharded_eval_step,
)
from ntire2022_esr_tpu.parallel.pipeline import PipelinedSR  # noqa: F401
from ntire2022_esr_tpu.parallel.spatial import (  # noqa: F401
    SpatialShardUnavailable,
    make_spatial_apply,
    spatial_shard_apply,
)
