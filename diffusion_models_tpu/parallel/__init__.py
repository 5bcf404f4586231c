from diffusion_models_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_shardings,
    fsdp_sharding_for,
    shard_params_fsdp,
    make_mesh_2d,
    tp_sharding_for,
    shard_params_tp,
)
