from diffusion_models_tpu.models.unet import (
    Unet,
    RMSNorm,
    RMSNorm1D,
    CrossAttention,
    SinusoidalPosEmb,
    RandomOrLearnedSinusoidalPosEmb,
    ResnetBlock,
    LinearAttention,
    Attention,
)
from diffusion_models_tpu.models.vae import (
    Encoder,
    Decoder,
    VectorQuantizer,
    VQModel,
    AutoencoderKL,
    IdentityFirstStage,
    DiagonalGaussianDistribution,
)
from diffusion_models_tpu.models.discriminator import NLayerDiscriminator
from diffusion_models_tpu.models.inception import InceptionV3
