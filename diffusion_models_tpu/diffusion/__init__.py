from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion, ModelPrediction
from diffusion_models_tpu.diffusion.image_conditional import (
    ImageConditionalGaussianDiffusion,
)
from diffusion_models_tpu.diffusion.text_conditional import (
    TextConditionalGaussianDiffusion,
)
from diffusion_models_tpu.diffusion.latent import (
    LatentDiffusion,
    ImageConditionalLatentDiffusion,
    TextConditionalLatentDiffusion,
)
