"""diffusion_models_tpu — a TPU-native (JAX/XLA/Pallas/pjit) diffusion framework.

Clean-room rebuild of the capabilities of `lbarseghyan/diffusion-models`
(DDPM / DDIM / Latent Diffusion; unconditional, image-conditional and
text-conditional; FID/IS evaluation) designed TPU-first:

- NHWC layouts, bf16 compute / f32 params, MXU-friendly convs and attention.
- Diffusion schedules as frozen pytrees of f32 arrays (computed in f64).
- Sampling loops as single `jax.lax.scan`s inside one `jit` — no host-driven
  per-step dispatch.
- Data parallelism via `jax.sharding.Mesh` + NamedSharding; gradients reduced
  over ICI by XLA collectives.

Layer map mirrors SURVEY.md §1 (reference layer map), re-architected for TPU.
"""

__version__ = "0.1.0"

from diffusion_models_tpu.ops.schedules import (
    DiffusionSchedule,
    make_schedule,
    linear_beta_schedule,
    cosine_beta_schedule,
    sigmoid_beta_schedule,
)
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
