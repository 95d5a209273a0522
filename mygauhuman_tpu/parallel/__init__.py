from mygauhuman_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    state_sharding,
)
