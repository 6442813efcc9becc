from pde_inverse_tpu.parallel.mesh import (
    MeshSpec,
    build_mesh,
    shard_batch,
    replicate,
)
