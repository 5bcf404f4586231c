"""Latent diffusion: diffusion processes over frozen-VAE latents.

Capability parity with the reference LDM wrappers:
  - `LatentDiffusion` (`ldm/models/latent_diffusion.py:9-67`): encode with a
    frozen VQ-VAE, run the DDPM objective on (quantized) latents with
    normalize/unnormalize = identity, decode samples back to pixels. The
    latent shape comes from `decoder.z_shape` (consumed at
    `train/train_ldm.py:71-72`).
  - `ImageConditionalLatentDiffusion`
    (`ldm/models/latent_diffusion_image_conditional.py:17-182`): optional
    separate cond-VAE; conditions on the *encoded* cond image.
  - `TextConditionalLatentDiffusion`
    (`ldm/models/latent_diffusion_text_conditional.py:11-99`).

TPU design notes:
  - VAE weights live as a frozen constant (`stop_gradient` at use sites);
    the trainable pytree stays just the denoiser, so the Trainer is unchanged.
  - The reference re-encodes the conditioning image inside EVERY reverse
    step (`latent_diffusion_image_conditional.py:126-129`); here the cond
    latent is computed ONCE and rides the `lax.scan` as a loop-invariant —
    identical math (the encoder is deterministic), ~S× fewer encoder calls.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.diffusion.text_conditional import (
    TextConditionalGaussianDiffusion,
)
from diffusion_models_tpu.utils.helpers import identity


class _FrozenVAE:
    """A (module, params) pair with gradient-stopped encode/decode."""

    def __init__(self, vae_module, vae_params):
        self.module = vae_module
        self.params = vae_params

    def encode(self, images):
        out = self.module.apply(
            {"params": self.params}, images, method=self.module.encode
        )
        if isinstance(out, tuple):  # VQModel.encode → (quant, loss, ind)
            out = out[0]
        elif hasattr(out, "mode"):  # AutoencoderKL → DiagonalGaussian
            out = out.mode()
        return jax.lax.stop_gradient(out)

    def decode(self, latents):
        return jax.lax.stop_gradient(
            self.module.apply(
                {"params": self.params}, latents, method=self.module.decode
            )
        )

    @property
    def z_shape(self):
        return self.module.z_shape  # (1, h, w, c) NHWC


class LatentDiffusion(GaussianDiffusion):
    """Diffusion over VAE latents. `latent_shape` is NHWC (h, w, c)."""

    def __init__(self, model, vae: _FrozenVAE | tuple, latent_shape=None, **kwargs):
        if isinstance(vae, tuple):
            vae = _FrozenVAE(*vae)
        if latent_shape is None:
            _, h, w, c = vae.z_shape
            latent_shape = (h, w, c)
        h, w, c = latent_shape
        kwargs.setdefault("auto_normalize", False)
        super().__init__(model, image_size=(h, w), **kwargs)
        self.vae = vae
        self.latent_channels = c
        self.channels = c
        # latents are already zero-centered-ish; identity (reference :25-26)
        self.normalize = identity
        self.unnormalize = identity
        # pixel-space resolution the *dataset* must produce (the Trainer
        # reads this; image_size itself is the latent resolution)
        res = vae.module.ddconfig["resolution"]
        self.pixel_image_size = (res, res)

    def encode(self, images):
        return self.vae.encode(images)

    def decode(self, latents):
        return self.vae.decode(latents)

    def loss(self, params, rng, img, cond=None, *, train: bool = True):
        """Pixel batch → encode → latent diffusion loss (reference
        `forward` :51-56)."""
        latents = self.encode(img)
        b = latents.shape[0]
        t_key, loss_key = jax.random.split(rng)
        t = jax.random.randint(t_key, (b,), 0, self.num_timesteps)
        return self.p_losses(params, loss_key, latents, t, cond, train=train)

    def sample(self, params, rng, batch_size: int = 16, cond=None,
               return_all_timesteps: bool = False):
        latents = super().sample(
            params, rng, batch_size, cond=cond,
            return_all_timesteps=return_all_timesteps,
        )
        if return_all_timesteps:
            b, s = latents.shape[:2]
            flat = latents.reshape((b * s,) + latents.shape[2:])
            dec = self.decode(flat)
            return dec.reshape((b, s) + dec.shape[1:])
        return self.decode(latents)


class ImageConditionalLatentDiffusion(LatentDiffusion):
    """Conditions the latent denoiser on the encoded cond image; decodes
    samples and returns (cond, decoded) pairs on request."""

    def __init__(self, model, vae, latent_shape=None, cond_vae=None,
                 condition_data_folder=None, **kwargs):
        super().__init__(model, vae, latent_shape, **kwargs)
        if isinstance(cond_vae, tuple):
            cond_vae = _FrozenVAE(*cond_vae)
        self.cond_vae = cond_vae or self.vae
        self.condition_data_folder = condition_data_folder

    def encode_cond(self, cond_images):
        # encode ONCE per sample/loss call (the reference re-encodes inside
        # every reverse step, :126-129 — mathematically identical)
        return self.cond_vae.encode(cond_images)

    def loss(self, params, rng, img, cond=None, *, train: bool = True):
        latent_cond = self.encode_cond(cond) if cond is not None else None
        return super().loss(params, rng, img, cond=latent_cond, train=train)

    def get_random_condition(self, batch: int, rng: np.random.Generator):
        """Random cond images from the folder at the VAE's PIXEL resolution
        (latent size × downsampling factor), [0,1] NHWC."""
        from pathlib import Path

        from PIL import Image

        from diffusion_models_tpu.utils.data import resize_and_center_crop

        pixel_size = tuple(s * self.pixels_per_latent for s in self.image_size)
        folder = Path(self.condition_data_folder)
        paths = sorted(folder.glob("*.*"))
        assert paths, f"no condition images under {folder}"
        idxs = rng.integers(len(paths), size=batch)
        imgs = []
        for i in idxs:
            img = Image.open(paths[int(i)]).convert("RGB")
            img = resize_and_center_crop(img, pixel_size)
            imgs.append(np.asarray(img, dtype=np.float32) / 255.0)
        return np.stack(imgs)

    def sample(self, params, rng, batch_size: int = 16, cond=None,
               return_all_timesteps: bool = False,
               return_condition_image: bool = False,
               cond_rng: np.random.Generator | None = None):
        cond_pixels = cond
        if cond_pixels is None and self.condition_data_folder is not None:
            cond_rng = cond_rng or np.random.default_rng(
                int(jax.random.randint(rng, (), 0, 2**31 - 1))
            )
            cond_pixels = self.get_random_condition(batch_size, cond_rng)
        latent_cond = (
            self.encode_cond(jnp.asarray(cond_pixels))
            if cond_pixels is not None
            else None
        )
        out = LatentDiffusion.sample(
            self, params, rng, batch_size, cond=latent_cond,
            return_all_timesteps=return_all_timesteps,
        )
        if return_condition_image:
            return cond_pixels, out
        return out

    @property
    def pixels_per_latent(self) -> int:
        cfg = self.cond_vae.module.ddconfig
        return 2 ** (len(cfg["ch_mult"]) - 1)


class TextConditionalLatentDiffusion(TextConditionalGaussianDiffusion):
    """Text-conditional diffusion over VAE latents
    (`latent_diffusion_text_conditional.py:11-99`)."""

    def __init__(self, model, vae, latent_shape=None, text_emb_dim: int = 512,
                 **kwargs):
        if isinstance(vae, tuple):
            vae = _FrozenVAE(*vae)
        if latent_shape is None:
            _, h, w, c = vae.z_shape
            latent_shape = (h, w, c)
        h, w, c = latent_shape
        kwargs.setdefault("auto_normalize", False)
        super().__init__(
            model, image_size=(h, w), text_emb_dim=text_emb_dim, **kwargs
        )
        self.vae = vae
        self.channels = c
        self.normalize = identity
        self.unnormalize = identity
        res = vae.module.ddconfig["resolution"]
        self.pixel_image_size = (res, res)

    def encode(self, images):
        return self.vae.encode(images)

    def decode(self, latents):
        return self.vae.decode(latents)

    def loss(self, params, rng, img, cond=None, *, train: bool = True):
        latents = self.encode(img)
        b = latents.shape[0]
        t_key, loss_key = jax.random.split(rng)
        t = jax.random.randint(t_key, (b,), 0, self.num_timesteps)
        return self.p_losses(params, loss_key, latents, t, cond, train=train)

    def sample(self, params, rng, batch_size: int = 16, cond=None,
               return_all_timesteps: bool = False, return_captions: bool = False,
               cond_rng: np.random.Generator | None = None):
        captions = None
        if cond is None:
            cond_rng = cond_rng or np.random.default_rng(
                int(jax.random.randint(rng, (), 0, 2**31 - 1))
            )
            captions, cond = self.get_random_text(batch_size, cond_rng)
        latents = GaussianDiffusion.sample(
            self, params, rng, batch_size, cond=cond,
            return_all_timesteps=return_all_timesteps,
        )
        out = self.decode(latents)
        if return_captions:
            return out, captions
        return out
