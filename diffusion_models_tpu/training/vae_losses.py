"""VQ-GAN / KL-VAE adversarial losses.

In-repo replacement for `taming.modules.losses.vqperceptual.
VQLPIPSWithDiscriminator` (the reference's loss target string,
`VAE_cifar.yaml:29-36`, used at `ldm/models/autoencoder.py:186-207`) and its
KL sibling. Semantics reproduced:

  - reconstruction = L1 + perceptual_weight · LPIPS
  - generator loss  = nll + d_weight · disc_factor · (−E[D(xrec)])
                      + codebook_weight · codebook_loss   (VQ)
                      or + kl_weight · KL                 (KL)
  - adaptive d_weight = ‖∇_last nll‖ / (‖∇_last g‖ + 1e-4), clamped to
    [0, 1e4], × disc_weight — computed w.r.t. the decoder's final conv
    (reference passes `last_layer=decoder.conv_out.weight`,
    `autoencoder.py:186-193`)
  - disc_factor gates the GAN term until `disc_start` steps
  - discriminator: hinge loss (or vanilla BCE)

JAX design: the adaptive weight needs ∇nll and ∇g w.r.t. ONLY the last
decoder conv kernel. Instead of two full backward passes (torch
`autograd.grad`), we re-linearize just the decoder's final conv: both
gradients come from `jax.grad` of closures over that single kernel, with the
rest of the forward held constant — cheap and jit-fusable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    return jnp.where(global_step < threshold, value, weight)


def adaptive_d_weight(nll_grad_last, g_grad_last, disc_weight: float):
    """‖∇nll‖/‖∇g‖ clamp [0,1e4] × disc_weight (taming semantics)."""
    nll_norm = jnp.linalg.norm(nll_grad_last)
    g_norm = jnp.linalg.norm(g_grad_last)
    d_weight = nll_norm / (g_norm + 1e-4)
    d_weight = jnp.clip(d_weight, 0.0, 1e4)
    return jax.lax.stop_gradient(d_weight) * disc_weight


class VQLPIPSWithDiscriminator:
    """Config-compatible with the reference's lossconfig params
    (`VAE_cifar.yaml:29-36`)."""

    def __init__(
        self,
        disc_start: int = 0,
        codebook_weight: float = 1.0,
        pixelloss_weight: float = 1.0,
        disc_num_layers: int = 3,
        disc_in_channels: int = 3,
        disc_factor: float = 1.0,
        disc_weight: float = 1.0,
        perceptual_weight: float = 1.0,
        disc_conditional: bool = False,
        disc_ndf: int = 64,
        disc_loss: str = "hinge",
        lpips=None,
    ):
        assert disc_loss in ("hinge", "vanilla")
        self.disc_start = disc_start
        self.codebook_weight = codebook_weight
        self.pixel_weight = pixelloss_weight
        self.disc_factor = disc_factor
        self.discriminator_weight = disc_weight
        self.perceptual_weight = perceptual_weight if lpips is not None else 0.0
        self.disc_conditional = disc_conditional
        self.disc_loss = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss
        self.lpips = lpips
        self.disc_num_layers = disc_num_layers
        self.disc_in_channels = disc_in_channels
        self.disc_ndf = disc_ndf

    def reconstruction_loss(self, x, xrec):
        rec = jnp.abs(x - xrec) * self.pixel_weight
        nll = jnp.mean(rec)
        if self.perceptual_weight > 0 and self.lpips is not None:
            nll = nll + self.perceptual_weight * jnp.mean(self.lpips(x, xrec))
        return nll

    def generator_loss(
        self, codebook_loss, nll_loss, logits_fake, d_weight, global_step
    ):
        g_loss = -jnp.mean(logits_fake)
        disc_factor = adopt_weight(
            self.disc_factor, global_step, threshold=self.disc_start
        )
        loss = (
            nll_loss
            + d_weight * disc_factor * g_loss
            + self.codebook_weight * jnp.mean(codebook_loss)
        )
        return loss, {
            "nll_loss": nll_loss,
            "g_loss": g_loss,
            "d_weight": d_weight,
            "quant_loss": jnp.mean(codebook_loss),
        }

    def discriminator_loss(self, logits_real, logits_fake, global_step):
        disc_factor = adopt_weight(
            self.disc_factor, global_step, threshold=self.disc_start
        )
        return disc_factor * self.disc_loss(logits_real, logits_fake)


class LPIPSWithDiscriminator(VQLPIPSWithDiscriminator):
    """KL-VAE variant: codebook term replaced by kl_weight·KL
    (taming's `LPIPSWithDiscriminator`, used by AutoencoderKL configs)."""

    def __init__(self, *args, kl_weight: float = 1.0, logvar_init: float = 0.0,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.kl_weight = kl_weight
        self.logvar_init = logvar_init

    def generator_loss_kl(
        self, posteriors, nll_loss, logits_fake, d_weight, global_step
    ):
        g_loss = -jnp.mean(logits_fake)
        disc_factor = adopt_weight(
            self.disc_factor, global_step, threshold=self.disc_start
        )
        kl = jnp.mean(posteriors.kl())
        loss = nll_loss + self.kl_weight * kl + d_weight * disc_factor * g_loss
        return loss, {
            "nll_loss": nll_loss,
            "g_loss": g_loss,
            "d_weight": d_weight,
            "kl_loss": kl,
        }
