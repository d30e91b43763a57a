from haloop_tpu.parallel.mesh import (
    data_mesh,
    make_mesh,
    replicate,
    shard_batch,
    is_master,
)
