"""Simple diffusion (Hoogeboom et al. 2023) over the U-ViT backbone.

Capability parity with the reference simple-diffusion `GaussianDiffusion`
(`simple_diffusion.py:517-693`): continuous-time cosine log-SNR with optional
resolution SHIFTED (noise_d) or shifted+INTERPOLATED (noise_d_low/high)
schedules (:495-514), v or eps objective, min-SNR weighting (default ON),
and a 500-step discretized ancestral sampler — here one `lax.scan`.
"""

from __future__ import annotations

import math
from functools import wraps
from typing import Optional

import jax
import jax.numpy as jnp

from diffusion_models_tpu.utils.helpers import (
    default,
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
)


def log_clamped(t, eps=1e-20):
    return jnp.log(jnp.maximum(t, eps))


def logsnr_schedule_cosine(t, logsnr_min: float = -15, logsnr_max: float = 15):
    t_min = math.atan(math.exp(-0.5 * logsnr_max))
    t_max = math.atan(math.exp(-0.5 * logsnr_min))
    return -2 * log_clamped(jnp.tan(t_min + t * (t_max - t_min)))


def logsnr_schedule_shifted(fn, image_d, noise_d):
    shift = 2 * math.log(noise_d / image_d)

    @wraps(fn)
    def inner(*args, **kwargs):
        return fn(*args, **kwargs) + shift

    return inner


def logsnr_schedule_interpolated(fn, image_d, noise_d_low, noise_d_high):
    low = logsnr_schedule_shifted(fn, image_d, noise_d_low)
    high = logsnr_schedule_shifted(fn, image_d, noise_d_high)

    @wraps(fn)
    def inner(t, *args, **kwargs):
        return t * low(t, *args, **kwargs) + (1 - t) * high(t, *args, **kwargs)

    return inner


class SimpleDiffusion:
    def __init__(
        self,
        model,
        *,
        image_size,
        channels: int = 3,
        pred_objective: str = "v",
        noise_schedule=logsnr_schedule_cosine,
        noise_d: Optional[float] = None,
        noise_d_low: Optional[float] = None,
        noise_d_high: Optional[float] = None,
        num_sample_steps: int = 500,
        clip_sample_denoised: bool = True,
        min_snr_loss_weight: bool = True,
        min_snr_gamma: float = 5,
    ):
        assert pred_objective in {"v", "eps"}
        self.model = model
        self.channels = channels
        self.image_size = (
            (image_size, image_size) if isinstance(image_size, int) else tuple(image_size)
        )
        self.pred_objective = pred_objective
        self.objective = "pred_v" if pred_objective == "v" else "pred_noise"

        assert not all(
            x is not None for x in (noise_d, noise_d_low, noise_d_high)
        ), "set noise_d (shifted) OR noise_d_low+noise_d_high (interpolated)"
        self.log_snr = noise_schedule
        size = self.image_size[0]
        if noise_d is not None:
            self.log_snr = logsnr_schedule_shifted(self.log_snr, size, noise_d)
        if noise_d_low is not None or noise_d_high is not None:
            assert noise_d_low is not None and noise_d_high is not None
            self.log_snr = logsnr_schedule_interpolated(
                self.log_snr, size, noise_d_low, noise_d_high
            )

        self.num_sample_steps = num_sample_steps
        self.num_timesteps = num_sample_steps
        self.clip_sample_denoised = clip_sample_denoised
        self.min_snr_loss_weight = min_snr_loss_weight
        self.min_snr_gamma = min_snr_gamma
        self.normalize = normalize_to_neg_one_to_one
        self.unnormalize = unnormalize_to_zero_to_one

    def sample_shape(self, batch_size):
        h, w = self.image_size
        return (batch_size, h, w, self.channels)

    def init(self, rng, batch_size: int = 1):
        x = jnp.zeros(self.sample_shape(batch_size), jnp.float32)
        s = jnp.zeros((batch_size,), jnp.float32)
        p, d = jax.random.split(rng)
        return jax.jit(self.model.init)(
            {"params": p, "dropout": d}, x, s
        )["params"]

    def _model(self, params, x, batch_log_snr, *, train=False, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        # route_for_inference is a no-op for UViT (no fused_attn_block
        # field) but keeps the routing contract uniform across families
        mdl = self.model
        if not train:
            if getattr(self, "_eval_model_cache", None) is None:
                from diffusion_models_tpu.diffusion.gaussian import (
                    route_for_inference,
                )

                self._eval_model_cache = route_for_inference(self.model)
            mdl = self._eval_model_cache
        return mdl.apply(
            {"params": params}, x, batch_log_snr, train=train, rngs=rngs
        ).astype(jnp.float32)

    # -------------------------------------------------------------- sampling

    def p_mean_variance(self, params, x, time, time_next):
        log_snr = self.log_snr(time)
        log_snr_next = self.log_snr(time_next)
        c = -jnp.expm1(log_snr - log_snr_next)

        alpha = jnp.sqrt(jax.nn.sigmoid(log_snr))
        sigma = jnp.sqrt(jax.nn.sigmoid(-log_snr))
        alpha_next = jnp.sqrt(jax.nn.sigmoid(log_snr_next))
        squared_sigma_next = jax.nn.sigmoid(-log_snr_next)

        batch_log_snr = jnp.full((x.shape[0],), log_snr)
        pred = self._model(params, x, batch_log_snr)

        if self.pred_objective == "v":
            x_start = alpha * x - sigma * pred
        else:
            x_start = (x - sigma * pred) / alpha
        if self.clip_sample_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)

        model_mean = alpha_next * (x * (1 - c) / alpha + c * x_start)
        posterior_variance = squared_sigma_next * c
        return model_mean, posterior_variance

    def p_sample_loop(self, params, rng, shape):
        rng, init_key = jax.random.split(rng)
        img0 = jax.random.normal(init_key, shape, jnp.float32)
        steps = jnp.linspace(1.0, 0.0, self.num_sample_steps + 1)

        def step(carry, i):
            img, key = carry
            key, noise_key = jax.random.split(key)
            mean, var = self.p_mean_variance(params, img, steps[i], steps[i + 1])
            noise = jax.random.normal(noise_key, shape, jnp.float32)
            img = jnp.where(steps[i + 1] == 0, mean, mean + jnp.sqrt(var) * noise)
            return (img, key), None

        (img, _), _ = jax.lax.scan(
            step, (img0, rng), jnp.arange(self.num_sample_steps)
        )
        return unnormalize_to_zero_to_one(jnp.clip(img, -1.0, 1.0))

    def sample(self, params, rng, batch_size: int = 16, cond=None):
        del cond
        return self.p_sample_loop(params, rng, self.sample_shape(batch_size))

    # ------------------------------------------------------------------ loss

    def q_sample(self, x_start, times, noise):
        log_snr = self.log_snr(times)
        padded = log_snr.reshape(log_snr.shape + (1,) * (x_start.ndim - 1))
        alpha = jnp.sqrt(jax.nn.sigmoid(padded))
        sigma = jnp.sqrt(jax.nn.sigmoid(-padded))
        return x_start * alpha + noise * sigma, log_snr, alpha, sigma

    def p_losses(self, params, rng, x_start, times, *, train: bool = True):
        noise_key, model_rng = jax.random.split(rng)
        noise = jax.random.normal(noise_key, x_start.shape, jnp.float32)
        x, log_snr, alpha, sigma = self.q_sample(x_start, times, noise)
        model_out = self._model(params, x, log_snr, train=train, rng=model_rng)

        if self.pred_objective == "v":
            target = alpha * noise - sigma * x_start
        else:
            target = noise

        loss = jnp.mean(((model_out - target) ** 2).reshape(x.shape[0], -1), -1)

        snr = jnp.exp(log_snr)
        maybe_clip_snr = (
            jnp.minimum(snr, self.min_snr_gamma) if self.min_snr_loss_weight else snr
        )
        if self.pred_objective == "v":
            loss_weight = maybe_clip_snr / (snr + 1)
        else:
            loss_weight = maybe_clip_snr / snr
        return jnp.mean(loss * loss_weight)

    def loss(self, params, rng, img, cond=None, *, train: bool = True):
        del cond
        b, h, w, c = img.shape
        assert (h, w) == self.image_size
        t_key, loss_key = jax.random.split(rng)
        times = jax.random.uniform(t_key, (b,))
        img = normalize_to_neg_one_to_one(img.astype(jnp.float32))
        return self.p_losses(params, loss_key, img, times, train=train)
