from diffusion_models_tpu.ops.schedules import (
    DiffusionSchedule,
    make_schedule,
    linear_beta_schedule,
    cosine_beta_schedule,
    sigmoid_beta_schedule,
    extract,
)
