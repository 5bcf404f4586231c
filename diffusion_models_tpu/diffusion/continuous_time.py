"""Continuous-time Gaussian diffusion (Variational Diffusion Models).

Capability parity with `ContinuousTimeGaussianDiffusion`
(`continuous_time_gaussian_diffusion.py:97-259`) and
`VParamContinuousTimeGaussianDiffusion`
(`v_param_continuous_time_gaussian_diffusion.py:32-170`):

  - t ∈ [0,1]; log-SNR schedules: linear (β-linear), cosine, or a LEARNED
    monotonic MLP (VDM supplement §H/I.2: |W| Monotonic linears + residual
    sigmoid bottleneck, endpoint-normalized, with a gradient fraction knob).
  - ε-objective (continuous) or v-objective (fixed-cosine subclass).
  - Ancestral sampler discretized to `num_sample_steps` uniform times —
    here ONE `lax.scan` (the reference loops in Python per step).
  - min-SNR weighting reproduces the reference's exact formula
    `snr.clamp(min=γ)/snr` (:246-249) — note the reference clamps *min*.

The learned schedule's parameters live in the same pytree as the denoiser
(`params = {"model": ..., "log_snr": ...}`) so the standard Trainer trains
both jointly.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_models_tpu.utils.helpers import (
    default,
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
)


def log_clamped(t, eps=1e-20):
    return jnp.log(jnp.maximum(t, eps))


def beta_linear_log_snr(t):
    return -log_clamped(jnp.expm1(1e-4 + 10 * (t**2)))


def alpha_cosine_log_snr(t, s: float = 0.008):
    return -log_clamped(
        jnp.cos((t + s) / (1 + s) * math.pi * 0.5) ** -2 - 1, eps=1e-5
    )


class MonotonicDense(nn.Module):
    """Dense layer with |W|, |b| — guarantees a monotone map."""

    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ jnp.abs(kernel) + jnp.abs(bias)


class LearnedNoiseSchedule(nn.Module):
    """Monotonic learned log-SNR(t) normalized to fixed endpoints
    (`continuous_time_gaussian_diffusion.py:57-95`)."""

    log_snr_max: float
    log_snr_min: float
    hidden_dim: int = 1024
    frac_gradient: float = 1.0

    @nn.compact
    def __call__(self, t):
        slope = self.log_snr_min - self.log_snr_max
        intercept = self.log_snr_max

        mono_in = MonotonicDense(1, name="lin_in")
        mono_h1 = MonotonicDense(self.hidden_dim, name="lin_hidden")
        mono_h2 = MonotonicDense(1, name="lin_out")

        def net(x):
            x = x[..., None]
            x = mono_in(x)
            x = x + mono_h2(jax.nn.sigmoid(mono_h1(x)))
            return x[..., 0]

        out_zero = net(jnp.zeros_like(t))
        out_one = net(jnp.ones_like(t))
        x = net(t)

        normed = slope * ((x - out_zero) / (out_one - out_zero)) + intercept
        fg = self.frac_gradient
        return normed * fg + jax.lax.stop_gradient(normed) * (1 - fg)


class ContinuousTimeGaussianDiffusion:
    objective = "pred_noise"

    def __init__(
        self,
        model,
        *,
        image_size,
        channels: int = 3,
        noise_schedule: str = "linear",
        num_sample_steps: int = 500,
        clip_sample_denoised: bool = True,
        learned_schedule_net_hidden_dim: int = 1024,
        learned_noise_schedule_frac_gradient: float = 1.0,
        min_snr_loss_weight: bool = False,
        min_snr_gamma: float = 5,
    ):
        assert (
            model.learned_sinusoidal_cond or model.random_fourier_features
        ), "continuous-time diffusion conditions on log-SNR: use learned/random sinusoidal embedding"
        assert not getattr(model, "self_condition", False), "not supported yet"
        self.model = model
        self.channels = channels
        self.image_size = (
            (image_size, image_size) if isinstance(image_size, int) else tuple(image_size)
        )

        self.noise_schedule = noise_schedule
        self._learned_schedule = None
        if noise_schedule == "linear":
            self._log_snr_fn = beta_linear_log_snr
        elif noise_schedule == "cosine":
            self._log_snr_fn = alpha_cosine_log_snr
        elif noise_schedule == "learned":
            log_snr_max = float(beta_linear_log_snr(jnp.array(0.0)))
            log_snr_min = float(beta_linear_log_snr(jnp.array(1.0)))
            self._learned_schedule = LearnedNoiseSchedule(
                log_snr_max=log_snr_max,
                log_snr_min=log_snr_min,
                hidden_dim=learned_schedule_net_hidden_dim,
                frac_gradient=learned_noise_schedule_frac_gradient,
            )
        else:
            raise ValueError(f"unknown noise schedule {noise_schedule}")

        self.num_sample_steps = num_sample_steps
        self.num_timesteps = num_sample_steps  # trainer compatibility
        self.clip_sample_denoised = clip_sample_denoised
        self.min_snr_loss_weight = min_snr_loss_weight
        self.min_snr_gamma = min_snr_gamma
        self.normalize = normalize_to_neg_one_to_one
        self.unnormalize = unnormalize_to_zero_to_one

    def sample_shape(self, batch_size):
        h, w = self.image_size
        return (batch_size, h, w, self.channels)

    # ------------------------------------------------------------------ init

    def init(self, rng, batch_size: int = 1):
        x = jnp.zeros(self.sample_shape(batch_size), jnp.float32)
        s = jnp.zeros((batch_size,), jnp.float32)
        p_rng, d_rng, s_rng = jax.random.split(rng, 3)
        params = {
            "model": self.model.init(
                {"params": p_rng, "dropout": d_rng}, x, s
            )["params"]
        }
        if self._learned_schedule is not None:
            params["log_snr"] = self._learned_schedule.init(
                s_rng, jnp.zeros((batch_size,))
            )["params"]
        return params

    def log_snr(self, params, t):
        if self._learned_schedule is not None:
            return self._learned_schedule.apply({"params": params["log_snr"]}, t)
        return self._log_snr_fn(t)

    def _model(self, params, x, batch_log_snr, *, train=False, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        mdl = self.model if train else self._eval_model()
        return mdl.apply(
            {"params": params["model"]}, x, batch_log_snr, train=train, rngs=rngs
        ).astype(jnp.float32)

    def _eval_model(self):
        # inference routing (fused Pallas LinearAttention on TPU; same
        # params; see diffusion/gaussian.py::route_for_inference)
        if getattr(self, "_eval_model_cache", None) is None:
            from diffusion_models_tpu.diffusion.gaussian import (
                route_for_inference,
            )

            self._eval_model_cache = route_for_inference(self.model)
        return self._eval_model_cache

    # -------------------------------------------------------------- sampling

    def _model_target_to_x_start(self, x, pred, alpha, sigma):
        """ε-objective: x0 = (x − σ·ε̂)/α."""
        return (x - sigma * pred) / alpha

    def p_mean_variance(self, params, x, time, time_next, *, rng=None):
        log_snr = self.log_snr(params, time)
        log_snr_next = self.log_snr(params, time_next)
        c = -jnp.expm1(log_snr - log_snr_next)

        squared_alpha = jax.nn.sigmoid(log_snr)
        squared_sigma_next = jax.nn.sigmoid(-log_snr_next)
        alpha = jnp.sqrt(squared_alpha)
        sigma = jnp.sqrt(jax.nn.sigmoid(-log_snr))
        alpha_next = jnp.sqrt(jax.nn.sigmoid(log_snr_next))

        batch_log_snr = jnp.full((x.shape[0],), log_snr)
        pred = self._model(params, x, batch_log_snr)

        if self.clip_sample_denoised:
            x_start = jnp.clip(
                self._model_target_to_x_start(x, pred, alpha, sigma), -1.0, 1.0
            )
            model_mean = alpha_next * (x * (1 - c) / alpha + c * x_start)
        else:
            model_mean = alpha_next / alpha * (x - c * sigma * pred)

        posterior_variance = squared_sigma_next * c
        return model_mean, posterior_variance

    def p_sample_loop(self, params, rng, shape):
        rng, init_key = jax.random.split(rng)
        img0 = jax.random.normal(init_key, shape, jnp.float32)
        steps = jnp.linspace(1.0, 0.0, self.num_sample_steps + 1)

        def step(carry, i):
            img, key = carry
            key, noise_key = jax.random.split(key)
            time, time_next = steps[i], steps[i + 1]
            mean, var = self.p_mean_variance(params, img, time, time_next)
            noise = jax.random.normal(noise_key, shape, jnp.float32)
            img = jnp.where(
                time_next == 0, mean, mean + jnp.sqrt(var) * noise
            )
            return (img, key), None

        (img, _), _ = jax.lax.scan(
            step, (img0, rng), jnp.arange(self.num_sample_steps)
        )
        return unnormalize_to_zero_to_one(jnp.clip(img, -1.0, 1.0))

    def sample(self, params, rng, batch_size: int = 16, cond=None):
        del cond
        return self.p_sample_loop(params, rng, self.sample_shape(batch_size))

    # ------------------------------------------------------------------ loss

    def q_sample(self, params, x_start, times, noise):
        log_snr = self.log_snr(params, times)
        padded = log_snr.reshape(log_snr.shape + (1,) * (x_start.ndim - 1))
        alpha = jnp.sqrt(jax.nn.sigmoid(padded))
        sigma = jnp.sqrt(jax.nn.sigmoid(-padded))
        return x_start * alpha + noise * sigma, log_snr, alpha, sigma

    def _loss_target(self, x_start, noise, alpha, sigma):
        return noise  # ε-objective

    def p_losses(self, params, rng, x_start, times, *, train: bool = True):
        noise_key, model_rng = jax.random.split(rng)
        noise = jax.random.normal(noise_key, x_start.shape, jnp.float32)
        x, log_snr, alpha, sigma = self.q_sample(params, x_start, times, noise)
        model_out = self._model(params, x, log_snr, train=train, rng=model_rng)

        target = self._loss_target(x_start, noise, alpha, sigma)
        losses = jnp.mean(
            ((model_out - target) ** 2).reshape(x.shape[0], -1), axis=-1
        )
        if self.min_snr_loss_weight:
            snr = jnp.exp(log_snr)
            # reference formula verbatim (`:246-249`): clamp MIN then divide
            loss_weight = jnp.maximum(snr, self.min_snr_gamma) / snr
            losses = losses * loss_weight
        return jnp.mean(losses)

    def loss(self, params, rng, img, cond=None, *, train: bool = True):
        del cond
        b, h, w, c = img.shape
        assert (h, w) == self.image_size
        t_key, loss_key = jax.random.split(rng)
        times = jax.random.uniform(t_key, (b,))
        img = normalize_to_neg_one_to_one(img.astype(jnp.float32))
        return self.p_losses(params, loss_key, img, times, train=train)


class VParamContinuousTimeGaussianDiffusion(ContinuousTimeGaussianDiffusion):
    """v-parameterization on a fixed cosine log-SNR (progressive
    distillation, Salimans & Ho 2022 — reference
    `v_param_continuous_time_gaussian_diffusion.py:32-170`)."""

    objective = "pred_v"

    def __init__(self, model, *, image_size, channels: int = 3,
                 num_sample_steps: int = 500, clip_sample_denoised: bool = True):
        super().__init__(
            model,
            image_size=image_size,
            channels=channels,
            noise_schedule="cosine",
            num_sample_steps=num_sample_steps,
            clip_sample_denoised=clip_sample_denoised,
        )

    def _model_target_to_x_start(self, x, pred_v, alpha, sigma):
        # Appendix D: x0 = α·x − σ·v̂
        return alpha * x - sigma * pred_v

    def p_mean_variance(self, params, x, time, time_next, *, rng=None):
        log_snr = self.log_snr(params, time)
        log_snr_next = self.log_snr(params, time_next)
        c = -jnp.expm1(log_snr - log_snr_next)

        alpha = jnp.sqrt(jax.nn.sigmoid(log_snr))
        sigma = jnp.sqrt(jax.nn.sigmoid(-log_snr))
        alpha_next = jnp.sqrt(jax.nn.sigmoid(log_snr_next))
        squared_sigma_next = jax.nn.sigmoid(-log_snr_next)

        batch_log_snr = jnp.full((x.shape[0],), log_snr)
        pred_v = self._model(params, x, batch_log_snr)
        x_start = alpha * x - sigma * pred_v
        if self.clip_sample_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        model_mean = alpha_next * (x * (1 - c) / alpha + c * x_start)
        posterior_variance = squared_sigma_next * c
        return model_mean, posterior_variance

    def _loss_target(self, x_start, noise, alpha, sigma):
        return alpha * noise - sigma * x_start  # v-objective
