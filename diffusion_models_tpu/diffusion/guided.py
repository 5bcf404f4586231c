"""Classifier-guided diffusion (Dhariwal & Nichol 2021 / Sohl-Dickstein).

Capability parity with `guided_diffusion.py` (:380-976): ancestral sampling
whose posterior mean is shifted by variance·∇ₓ log p(y|x) from an external
classifier (`condition_mean` :553-570, including the OpenAI-issue-51 fix of
differentiating at the predicted mean), plus the `classifier_cond_fn`
helper (:939-950) and a toy linear time-aware classifier.

The reference copies its entire Unet/diffusion/Trainer for this; here it is
a subclass that injects `cond_fn` into the sampler, which remains a single
`lax.scan` — the classifier gradient is obtained with `jax.grad` inside the
scan body, so guidance compiles into the same fused step program.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.utils.helpers import exists


def classifier_cond_fn(classifier_apply, classifier_params, x, t, y,
                       classifier_scale: float = 1.0):
    """∇ₓ log p(y|x) under the classifier (reference `classifier_cond_fn`)."""

    def selected_logprob(x_in):
        logits = classifier_apply(classifier_params, x_in, t)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return jnp.sum(log_probs[jnp.arange(x_in.shape[0]), y.reshape(-1)])

    return jax.grad(selected_logprob)(x) * classifier_scale


class LinearTimeClassifier(nn.Module):
    """Toy classifier p(y | x, t) (reference `Classifier`, :900-936)."""

    image_size: int
    num_classes: int
    channels: int = 3

    @nn.compact
    def __call__(self, x, t):
        b = x.shape[0]
        t = t.reshape(b, 1).astype(jnp.float32)
        logits_t = nn.Dense(self.num_classes, name="linear_t")(t)
        logits_x = nn.Dense(self.num_classes, name="linear_img")(
            x.reshape(b, -1)
        )
        return logits_t + logits_x


class GuidedGaussianDiffusion(GaussianDiffusion):
    """GaussianDiffusion whose ancestral sampler accepts a guidance fn
    `cond_fn(mean, t) -> gradient` applied as mean += variance · grad."""

    def condition_mean(self, cond_fn, mean, variance, t):
        gradient = cond_fn(mean, t)
        return mean + variance * gradient

    def p_sample_loop(
        self, params, rng, shape, cond=None, return_all_timesteps: bool = False,
        cond_fn: Optional[Callable] = None,
    ):
        batch = shape[0]
        rng, init_key = jax.random.split(rng)
        img0 = jax.random.normal(init_key, shape, jnp.float32)

        def step(carry, t):
            img, x_start, key = carry
            key, noise_key = jax.random.split(key)
            t_b = jnp.full((batch,), t, jnp.int32)
            self_cond = x_start if self.self_condition else None
            model_mean, variance, model_log_variance, x_start = (
                self.p_mean_variance(params, img, t_b, self_cond, cond)
            )
            if exists(cond_fn):
                model_mean = self.condition_mean(cond_fn, model_mean, variance, t_b)
            noise = jax.random.normal(noise_key, shape, jnp.float32)
            noise = jnp.where(t > 0, noise, 0.0)
            img = model_mean + jnp.exp(0.5 * model_log_variance) * noise
            return (img, x_start, key), (img if return_all_timesteps else None)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (img, _, _), imgs = jax.lax.scan(step, (img0, jnp.zeros_like(img0), rng), ts)
        if return_all_timesteps:
            ret = jnp.concatenate([img0[:, None], jnp.moveaxis(imgs, 0, 1)], axis=1)
        else:
            ret = img
        return self.unnormalize(ret)

    def sample(
        self, params, rng, batch_size: int = 16, cond=None,
        return_all_timesteps: bool = False, cond_fn: Optional[Callable] = None,
    ):
        shape = self.sample_shape(batch_size)
        if self.is_ddim_sampling and cond_fn is None:
            return self.ddim_sample(
                params, rng, shape, cond=cond,
                return_all_timesteps=return_all_timesteps,
            )
        return self.p_sample_loop(
            params, rng, shape, cond=cond,
            return_all_timesteps=return_all_timesteps, cond_fn=cond_fn,
        )
