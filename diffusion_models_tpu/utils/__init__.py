from diffusion_models_tpu.utils.helpers import (
    exists,
    default,
    cast_tuple,
    divisible_by,
    identity,
    cycle,
    has_int_squareroot,
    num_to_groups,
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
    count_params,
)
from diffusion_models_tpu.utils.ema import EMAState, ema_init, ema_update
from diffusion_models_tpu.utils.checkpoint import CheckpointManager
from diffusion_models_tpu.utils.logging import MetricWriter
from diffusion_models_tpu.utils.image import (
    make_grid,
    save_image_grid,
    load_image,
    log_txt_as_img,
)
from diffusion_models_tpu.utils.config import (
    load_config,
    register,
    instantiate_from_config,
    REGISTRY,
)
