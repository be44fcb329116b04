from avoid_mpc_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_solve,
    sharded_metrics,
    knn_sharded_points,
)
