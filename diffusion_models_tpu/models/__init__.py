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
from diffusion_models_tpu.models.unet1d import Unet1D
from diffusion_models_tpu.models.uvit import UViT
from diffusion_models_tpu.models.karras_unet import (
    KarrasUnet,
    KarrasUnet1D,
    KarrasUnet3D,
    KarrasUnetND,
    MPImageTransformer,
    inv_sqrt_decay_schedule,
    normalize_karras_weights,
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
from diffusion_models_tpu.models.lpips import LPIPS
from diffusion_models_tpu.models.inception import InceptionV3
