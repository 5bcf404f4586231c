"""Learned-variance diffusion (Improved DDPM, Nichol & Dhariwal 2021).

Capability parity with `LearnedGaussianDiffusion`
(`learned_gaussian_diffusion.py:61-146`): the denoiser outputs 2×channels —
(prediction, variance-interpolation fraction); the reverse variance is
exp(v·log β_t + (1−v)·log σ̃²_t); training adds λ·L_vlb (KL against the true
posterior with a DETACHED mean, plus the discretized-Gaussian decoder NLL at
t=0) to the simple MSE loss, λ = 0.001.

The variance interpolation and both VLB terms are elementwise chains that
XLA fuses into the surrounding U-Net program; the t==0 decoder-NLL branch is
a `jnp.where`, not control flow.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion, ModelPrediction
from diffusion_models_tpu.ops.schedules import extract
from diffusion_models_tpu.utils.helpers import unnormalize_to_zero_to_one

NAT = 1.0 / math.log(2)


def log_clamped(t, eps=1e-15):
    return jnp.log(jnp.maximum(t, eps))


def meanflat(x):
    return jnp.mean(x.reshape(x.shape[0], -1), axis=-1)


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales, thres=0.999):
    """log p(x) for images discretized to 255 bins (Improved DDPM eq. for
    the decoder NLL at t=0)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered_x + 1.0 / 255.0))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered_x - 1.0 / 255.0))
    log_cdf_plus = log_clamped(cdf_plus)
    log_one_minus_cdf_min = log_clamped(1.0 - cdf_min)
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -thres,
        log_cdf_plus,
        jnp.where(x > thres, log_one_minus_cdf_min, log_clamped(cdf_delta)),
    )


class LearnedGaussianDiffusion(GaussianDiffusion):
    def __init__(self, model, vb_loss_weight: float = 0.001, *args, **kwargs):
        super().__init__(model, *args, **kwargs)
        assert model.default_out_dim == model.channels * 2 or (
            model.out_dim == model.channels * 2
        ), "denoiser must output 2×channels (set learned_variance=True on the Unet)"
        assert not self.self_condition, "not supported yet"
        assert self.objective in ("pred_noise", "pred_x0")
        self.vb_loss_weight = vb_loss_weight

    def _split(self, model_output):
        return jnp.split(model_output, 2, axis=-1)

    def model_predictions(
        self, params, x, t, x_self_cond=None, cond=None,
        clip_x_start=False, rederive_pred_noise=False, *, train=False, rng=None,
    ):
        model_output = self._apply_model(
            params, x, t, None, cond, train=train, rng=rng
        )
        model_output, pred_variance = self._split(model_output)
        maybe_clip = (lambda v: jnp.clip(v, -1, 1)) if clip_x_start else (lambda v: v)

        if self.objective == "pred_noise":
            pred_noise = model_output
            x_start = self.predict_start_from_noise(x, t, model_output)
        else:  # pred_x0
            pred_noise = self.predict_noise_from_start(x, t, model_output)
            x_start = model_output
        x_start = maybe_clip(x_start)
        return ModelPrediction(pred_noise, x_start)

    def _variance_interp(self, x, t, var_frac_unnormalized):
        nd = x.ndim
        min_log = extract(self.schedule.posterior_log_variance_clipped, t, nd)
        max_log = extract(jnp.log(self.schedule.betas), t, nd)
        frac = unnormalize_to_zero_to_one(var_frac_unnormalized)
        return frac * max_log + (1 - frac) * min_log

    def p_mean_variance(
        self, params, x, t, x_self_cond=None, cond=None, clip_denoised=True,
        *, model_output=None, train=False, rng=None,
    ):
        if model_output is None:
            model_output = self._apply_model(
                params, x, t, None, cond, train=train, rng=rng
            )
        pred, var_frac = self._split(model_output)

        model_log_variance = self._variance_interp(x, t, var_frac)
        model_variance = jnp.exp(model_log_variance)

        if self.objective == "pred_noise":
            x_start = self.predict_start_from_noise(x, t, pred)
        else:
            x_start = pred
        if clip_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        model_mean, _, _ = self.q_posterior(x_start, x, t)
        return model_mean, model_variance, model_log_variance, x_start

    def p_losses(self, params, rng, x_start, t, cond=None, *, train: bool = True):
        noise_key, model_rng = jax.random.split(rng)
        x_start = x_start.astype(jnp.float32)
        noise = jax.random.normal(noise_key, x_start.shape, jnp.float32)
        x_t = self.q_sample(x_start, t, noise)

        model_output = self._apply_model(
            params, x_t, t, None, cond, train=train, rng=model_rng
        )

        true_mean, _, true_log_var = self.q_posterior(x_start, x_t, t)
        model_mean, _, model_log_var, _ = self.p_mean_variance(
            params, x_t, t, cond=cond, clip_denoised=False,
            model_output=model_output,
        )

        # detached mean: the VLB only trains the variance head (paper §3.1)
        detached_mean = jax.lax.stop_gradient(model_mean)
        kl = normal_kl(true_mean, true_log_var, detached_mean, model_log_var)
        kl = meanflat(kl) * NAT
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=detached_mean, log_scales=0.5 * model_log_var
        )
        decoder_nll = meanflat(decoder_nll) * NAT
        vb_losses = jnp.where(t == 0, decoder_nll, kl)

        pred, _ = self._split(model_output)
        if self.objective == "pred_noise":
            target = noise
        else:
            target = x_start
        simple_loss = jnp.mean((pred - target) ** 2)

        return simple_loss + jnp.mean(vb_losses) * self.vb_loss_weight
