"""RePaint inpainting (Lugmayr et al. 2022, arXiv 2201.09865).

Capability parity with `repaint.py` (:424-780): ancestral sampling with
known-region replacement — at every step the masked region is overwritten by
√ᾱ_t·gt + √(1−ᾱ_t)·ε (:619-628), at t=0 by the ground truth itself
(:637-639) — plus the Algorithm-1 resampling loop: every `resample_every`
steps (and at t==1), jump back `resample_jump` noise levels and re-denoise,
`resample_iter` times (:669-677). The reference's inner loop denoises at the
CONSTANT level t=resample_jump for all inner steps (it reuses `t` rather
than the inner index, :672-677); this is reproduced faithfully.

TPU design: outer chain is one `lax.scan`; the resample block is a
`lax.cond`-guarded double `fori_loop` inside the scan body — the whole
inpainting chain is a single compiled program (the reference nests Python
loops with per-step dispatches).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.utils.helpers import normalize_to_neg_one_to_one


class RePaintGaussianDiffusion(GaussianDiffusion):
    def _known_region_replace(self, img, t_b, gt_norm, mask, key):
        """x ← mask·(√ᾱ_t·gt + √(1−ᾱ_t)·ε) + (1−mask)·x."""
        ac_t = self.schedule.alphas_cumprod[t_b[0]]
        noise = jax.random.normal(key, img.shape, jnp.float32)
        weighed_gt = jnp.sqrt(ac_t) * gt_norm + jnp.sqrt(1 - ac_t) * noise
        return mask * weighed_gt + (1 - mask) * img

    def _p_sample(self, params, img, t, gt_norm, mask, key, x_self_cond=None):
        batch = img.shape[0]
        t_b = jnp.full((batch,), t, jnp.int32)
        rep_key, noise_key = jax.random.split(key)

        if gt_norm is not None:
            img = self._known_region_replace(img, t_b, gt_norm, mask, rep_key)

        model_mean, _, model_log_variance, x_start = self.p_mean_variance(
            params, img, t_b, x_self_cond, None, clip_denoised=True
        )
        noise = jax.random.normal(noise_key, img.shape, jnp.float32)
        noise = jnp.where(t > 0, noise, 0.0)
        pred_img = model_mean + jnp.exp(0.5 * model_log_variance) * noise

        if gt_norm is not None:
            # at t == 0 paste the ground truth into the known region
            pred_img = jnp.where(
                t == 0, mask * gt_norm + (1 - mask) * pred_img, pred_img
            )
        return pred_img, x_start

    def p_sample_loop(
        self,
        params,
        rng,
        shape,
        cond=None,
        return_all_timesteps: bool = False,
        gt=None,
        mask=None,
        resample: bool = True,
        resample_iter: int = 10,
        resample_jump: int = 3,
        resample_every: int = 50,
    ):
        del cond
        if gt is None or mask is None:
            return super().p_sample_loop(
                params, rng, shape, return_all_timesteps=return_all_timesteps
            )

        gt_norm = normalize_to_neg_one_to_one(gt.astype(jnp.float32))
        mask = mask.astype(jnp.float32)
        batch = shape[0]

        rng, init_key = jax.random.split(rng)
        img0 = jax.random.normal(init_key, shape, jnp.float32)
        beta_r = self.schedule.betas[resample_jump]

        def resample_block(img, key):
            def one_iter(_, carry):
                img, key = carry
                key, jump_key = jax.random.split(key)
                # jump back `resample_jump` levels in one q-step
                img = (
                    jnp.sqrt(1 - beta_r) * img
                    + jnp.sqrt(beta_r)
                    * jax.random.normal(jump_key, img.shape, jnp.float32)
                )

                def one_inner(_, carry2):
                    img2, key2 = carry2
                    key2, skey = jax.random.split(key2)
                    img2, _ = self._p_sample(
                        params, img2, resample_jump, gt_norm, mask, skey
                    )
                    return (img2, key2)

                img, key = jax.lax.fori_loop(
                    0, resample_jump, one_inner, (img, key)
                )
                return (img, key)

            return jax.lax.fori_loop(0, resample_iter, one_iter, (img, key))

        def step(carry, t):
            img, x_start, key = carry
            key, sample_key, resample_key = jax.random.split(key, 3)
            self_cond = x_start if self.self_condition else None
            img, x_start = self._p_sample(
                params, img, t, gt_norm, mask, sample_key, self_cond
            )

            if resample:
                do_it = (t > 0) & ((t % resample_every == 0) | (t == 1))

                def yes(args):
                    im, k = args
                    return resample_block(im, k)

                img, _ = jax.lax.cond(
                    do_it, yes, lambda a: a, (img, resample_key)
                )
            return (img, x_start, key), (img if return_all_timesteps else None)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (img, _, _), imgs = jax.lax.scan(step, (img0, jnp.zeros_like(img0), rng), ts)
        if return_all_timesteps:
            ret = jnp.concatenate([img0[:, None], jnp.moveaxis(imgs, 0, 1)], axis=1)
        else:
            ret = img
        return self.unnormalize(ret)

    def sample(
        self,
        params,
        rng,
        batch_size: int = 16,
        cond=None,
        return_all_timesteps: bool = False,
        gt=None,
        mask=None,
        resample: bool = True,
        resample_iter: int = 10,
        resample_jump: int = 10,
        resample_every: int = 50,
    ):
        if mask is not None:
            batch_size = mask.shape[0]
        shape = self.sample_shape(batch_size)
        if gt is None and self.is_ddim_sampling:
            return self.ddim_sample(
                params, rng, shape, return_all_timesteps=return_all_timesteps
            )
        return self.p_sample_loop(
            params, rng, shape,
            return_all_timesteps=return_all_timesteps,
            gt=gt, mask=mask, resample=resample,
            resample_iter=resample_iter, resample_jump=resample_jump,
            resample_every=resample_every,
        )
