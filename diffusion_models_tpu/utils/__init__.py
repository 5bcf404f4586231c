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
)
