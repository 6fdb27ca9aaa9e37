from recommendar_systems_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    table_sharding,
    shard_params,
)
