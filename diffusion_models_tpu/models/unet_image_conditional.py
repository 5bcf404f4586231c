"""Image-conditional U-Net: channel-concat conditioning.

Capability parity with the reference conditional `Unet`
(`denoising_diffusion_image_conditional.py:31-55`): the conditioning image is
concatenated to the denoiser input along channels and the init conv widens by
`cond_channels`. Implemented directly in the base `Unet` (the `cond_channels`
field + `cond` argument) — in NHWC this is a pure channel-axis concat ahead
of the 7×7 init conv, zero extra kernels.
"""

from functools import partial

from diffusion_models_tpu.models.unet import Unet

# `ImageConditionalUnet(dim=..., cond_channels=3, ...)`
ImageConditionalUnet = Unet
