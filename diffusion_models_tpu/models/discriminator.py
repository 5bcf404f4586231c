"""PatchGAN discriminator (pix2pix NLayerDiscriminator).

In-repo replacement for `taming.modules.discriminator.model.
NLayerDiscriminator`, which the reference's VQ loss target imports (the
reference does not vendor taming — `ldm/models/autoencoder.py:11,44`,
`VAE_cifar.yaml:30`). 70×70 PatchGAN: stride-2 4×4 convs with
(Group)Norm+LeakyReLU, final 1-channel logit map.

TPU note: BatchNorm (the pix2pix default) is replaced by GroupNorm — batch
statistics would force cross-device syncs under data parallelism; GroupNorm
is sync-free and standard practice for TPU GAN training.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        conv = lambda ch, stride, name: nn.Conv(
            ch, (4, 4), strides=(stride, stride), padding=((1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        x = x.astype(self.dtype)
        x = conv(self.ndf, 2, "conv_0")(x)
        x = nn.leaky_relu(x, 0.2)

        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            x = conv(self.ndf * nf, 2, f"conv_{n}")(x)
            x = nn.GroupNorm(
                num_groups=min(32, self.ndf * nf), dtype=jnp.float32,
                param_dtype=jnp.float32, name=f"norm_{n}",
            )(x.astype(jnp.float32)).astype(self.dtype)
            x = nn.leaky_relu(x, 0.2)

        nf = min(2**self.n_layers, 8)
        x = conv(self.ndf * nf, 1, f"conv_{self.n_layers}")(x)
        x = nn.GroupNorm(
            num_groups=min(32, self.ndf * nf), dtype=jnp.float32,
            param_dtype=jnp.float32, name=f"norm_{self.n_layers}",
        )(x.astype(jnp.float32)).astype(self.dtype)
        x = nn.leaky_relu(x, 0.2)

        x = conv(1, 1, "conv_out")(x)
        return x.astype(jnp.float32)
