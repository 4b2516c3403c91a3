from rusty_sr_tpu.parallel.tiling import tiled_sr, HALO  # noqa: F401
from rusty_sr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_sharded_apply,
    shard_batch,
    tiled_sr_sharded,
)
