"""Weighted-objective diffusion.

Capability parity with `WeightedObjectiveGaussianDiffusion`
(`weighted_objective_gaussian_diffusion.py:14-74`): the denoiser outputs
(ε̂, x̂0, 2 weight logits); x0 used for the posterior is the softmax-weighted
combination of x0-from-ε̂ and the direct x̂0. Training = weighted-x0 MSE +
small auxiliary ε and x0 MSEs. Ancestral sampling only.

NHWC note: the channel split is over the LAST axis; the 2-way weighted sum
is an einsum over a stacked axis — a fused elementwise op for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion


class WeightedObjectiveGaussianDiffusion(GaussianDiffusion):
    def __init__(
        self,
        model,
        *args,
        pred_noise_loss_weight: float = 0.1,
        pred_x_start_loss_weight: float = 0.1,
        **kwargs,
    ):
        super().__init__(model, *args, **kwargs)
        channels = model.channels
        assert model.out_dim == channels * 2 + 2, (
            "unet out_dim must be 2*channels + 2 (for the softmax weights)"
        )
        assert not self.self_condition, "not supported yet"
        assert not self.is_ddim_sampling, "ddim sampling cannot be used"

        self.split_dims = (channels, channels * 2)
        self.pred_noise_loss_weight = pred_noise_loss_weight
        self.pred_x_start_loss_weight = pred_x_start_loss_weight

    def _split(self, model_output):
        c = self.channels
        return (
            model_output[..., :c],
            model_output[..., c : 2 * c],
            model_output[..., 2 * c :],
        )

    def _weighted_x_start(self, x_start_from_noise, pred_x_start, weights):
        # weights: (B, H, W, 2) → softmax over the 2 candidates
        w = jax.nn.softmax(weights, axis=-1)
        stacked = jnp.stack([x_start_from_noise, pred_x_start], axis=-1)
        return jnp.einsum("bhwj,bhwcj->bhwc", w, stacked)

    def p_mean_variance(
        self, params, x, t, x_self_cond=None, cond=None, clip_denoised=True,
        *, train=False, rng=None,
    ):
        model_output = self._apply_model(
            params, x, t, None, cond, train=train, rng=rng
        )
        pred_noise, pred_x_start, weights = self._split(model_output)
        x_start_from_noise = self.predict_start_from_noise(x, t, pred_noise)
        weighted = self._weighted_x_start(x_start_from_noise, pred_x_start, weights)
        if clip_denoised:
            weighted = jnp.clip(weighted, -1.0, 1.0)
        model_mean, model_variance, model_log_variance = self.q_posterior(
            weighted, x, t
        )
        return model_mean, model_variance, model_log_variance, weighted

    def p_losses(self, params, rng, x_start, t, cond=None, *, train: bool = True):
        noise_key, model_rng = jax.random.split(rng)
        x_start = x_start.astype(jnp.float32)
        noise = jax.random.normal(noise_key, x_start.shape, jnp.float32)
        x_t = self.q_sample(x_start, t, noise)

        model_output = self._apply_model(
            params, x_t, t, None, cond, train=train, rng=model_rng
        )
        pred_noise, pred_x_start, weights = self._split(model_output)

        noise_loss = jnp.mean((noise - pred_noise) ** 2) * self.pred_noise_loss_weight
        x_start_loss = (
            jnp.mean((x_start - pred_x_start) ** 2) * self.pred_x_start_loss_weight
        )

        x_start_from_noise = jnp.clip(
            self.predict_start_from_noise(x_t, t, pred_noise), -2.0, 2.0
        )
        weighted = self._weighted_x_start(x_start_from_noise, pred_x_start, weights)
        weighted_x_start_loss = jnp.mean((x_start - weighted) ** 2)

        return weighted_x_start_loss + x_start_loss + noise_loss
