"""Elucidated diffusion (EDM, Karras et al. 2022).

Capability parity with `ElucidatedDiffusion` (`elucidated_diffusion.py:22-264`):
σ-space preconditioning c_skip/c_out/c_in/c_noise (Table 1), ρ=7 sampling
schedule (eq. 5), stochastic 2nd-order Heun sampler with churn, the
DPM-Solver++ sampler, log-normal training σ distribution, and λ(σ) loss
weighting.

TPU design: both samplers are single `lax.scan`s. The Heun correction
(reference's `if sigma_next != 0`, :176-181) always evaluates both branches
and selects with `jnp.where` — only the final step differs and its second
network call is masked out of the result, keeping the scan body branch-free
for XLA. DPM-Solver++'s `old_denoised` history is scan carry state.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_tpu.utils.helpers import (
    default,
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
)


def log_clamped(t, eps=1e-20):
    return jnp.log(jnp.maximum(t, eps))


class ElucidatedDiffusion:
    def __init__(
        self,
        net,
        *,
        image_size,
        channels: int = 3,
        num_sample_steps: int = 32,
        sigma_min: float = 0.002,
        sigma_max: float = 80,
        sigma_data: float = 0.5,
        rho: float = 7,
        P_mean: float = -1.2,
        P_std: float = 1.2,
        S_churn: float = 80,
        S_tmin: float = 0.05,
        S_tmax: float = 50,
        S_noise: float = 1.003,
    ):
        assert (
            net.learned_sinusoidal_cond or net.random_fourier_features
        ), "EDM conditions on continuous log-σ: use learned/random sinusoidal time embedding"
        self.net = net
        self.model = net  # Trainer-facing alias (same contract as GaussianDiffusion)
        self._eval_net = None  # lazily route_for_inference(net)
        self.self_condition = getattr(net, "self_condition", False)
        self.channels = channels
        self.image_size = (
            (image_size, image_size) if isinstance(image_size, int) else tuple(image_size)
        )
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        self.sigma_data = sigma_data
        self.rho = rho
        self.P_mean = P_mean
        self.P_std = P_std
        self.num_sample_steps = num_sample_steps
        self.S_churn = S_churn
        self.S_tmin = S_tmin
        self.S_tmax = S_tmax
        self.S_noise = S_noise

    def sample_shape(self, batch_size):
        h, w = self.image_size
        return (batch_size, h, w, self.channels)

    def init(self, rng, batch_size: int = 1):
        x = jnp.zeros(self.sample_shape(batch_size), jnp.float32)
        s = jnp.zeros((batch_size,), jnp.float32)
        p_rng, d_rng = jax.random.split(rng)
        return self.net.init({"params": p_rng, "dropout": d_rng}, x, s)["params"]

    # ----------------------------------------------- preconditioning (Tab.1)

    def c_skip(self, sigma):
        return (self.sigma_data**2) / (sigma**2 + self.sigma_data**2)

    def c_out(self, sigma):
        return sigma * self.sigma_data * (self.sigma_data**2 + sigma**2) ** -0.5

    def c_in(self, sigma):
        return (sigma**2 + self.sigma_data**2) ** -0.5

    def c_noise(self, sigma):
        return log_clamped(sigma) * 0.25

    def preconditioned_network_forward(
        self, params, noised_images, sigma, self_cond=None, clamp=False,
        *, train=False, rng=None,
    ):
        batch = noised_images.shape[0]
        if not hasattr(sigma, "shape") or sigma.ndim == 0:
            sigma = jnp.full((batch,), sigma, jnp.float32)
        padded = sigma[:, None, None, None]

        rngs = {"dropout": rng} if rng is not None else None
        if train:
            # single-device training routes through the fused block too
            # (analytic backward kernel, +32% train step); sharded training
            # keeps XLA — see GaussianDiffusion._model_for
            if getattr(self, "_train_net", None) is None:
                from diffusion_models_tpu.diffusion.gaussian import (
                    route_for_inference,
                )

                self._train_net = route_for_inference(self.net)
            net = self._train_net
        else:
            # fused Pallas LinearAttention routing for the samplers (same
            # params; see diffusion/gaussian.py::route_for_inference)
            if self._eval_net is None:
                from diffusion_models_tpu.diffusion.gaussian import (
                    route_for_inference,
                )

                self._eval_net = route_for_inference(self.net)
            net = self._eval_net
        net_out = net.apply(
            {"params": params},
            self.c_in(padded) * noised_images,
            self.c_noise(sigma),
            self_cond,
            train=train,
            rngs=rngs,
        ).astype(jnp.float32)
        out = self.c_skip(padded) * noised_images + self.c_out(padded) * net_out
        if clamp:
            out = jnp.clip(out, -1.0, 1.0)
        return out

    # -------------------------------------------------------------- schedule

    def sample_schedule(self, num_sample_steps: Optional[int] = None):
        N = default(num_sample_steps, self.num_sample_steps)
        inv_rho = 1 / self.rho
        steps = np.arange(N, dtype=np.float32)
        sigmas = (
            self.sigma_max**inv_rho
            + steps / (N - 1) * (self.sigma_min**inv_rho - self.sigma_max**inv_rho)
        ) ** self.rho
        return jnp.asarray(np.concatenate([sigmas, [0.0]]), jnp.float32)

    # --------------------------------------------------------------- sampler

    def sample(
        self, params, rng, batch_size: int = 16, cond=None,
        num_sample_steps: Optional[int] = None, clamp: bool = True,
    ):
        del cond  # unconditional model (Trainer-interface compatibility)
        """Stochastic Heun (alg. 2) with churn, as one lax.scan."""
        N = default(num_sample_steps, self.num_sample_steps)
        shape = self.sample_shape(batch_size)
        sigmas = self.sample_schedule(N)
        gammas = jnp.where(
            (sigmas >= self.S_tmin) & (sigmas <= self.S_tmax),
            min(self.S_churn / N, math.sqrt(2) - 1),
            0.0,
        )
        triples = jnp.stack([sigmas[:-1], sigmas[1:], gammas[:-1]], axis=1)

        rng, init_key = jax.random.split(rng)
        images0 = sigmas[0] * jax.random.normal(init_key, shape, jnp.float32)

        def step(carry, trip):
            images, x_start, key = carry
            sigma, sigma_next, gamma = trip[0], trip[1], trip[2]
            key, eps_key = jax.random.split(key)

            eps = self.S_noise * jax.random.normal(eps_key, shape, jnp.float32)
            sigma_hat = sigma + gamma * sigma
            images_hat = images + jnp.sqrt(
                jnp.maximum(sigma_hat**2 - sigma**2, 0.0)
            ) * eps

            self_cond = x_start if self.self_condition else None
            model_output = self.preconditioned_network_forward(
                params, images_hat, sigma_hat, self_cond, clamp=clamp
            )
            d = (images_hat - model_output) / sigma_hat
            images_next = images_hat + (sigma_next - sigma_hat) * d

            # 2nd-order correction — branch-free: evaluate and select.
            self_cond2 = model_output if self.self_condition else None
            sigma_next_safe = jnp.maximum(sigma_next, self.sigma_min * 1e-3)
            model_output_next = self.preconditioned_network_forward(
                params, images_next, sigma_next_safe, self_cond2, clamp=clamp
            )
            d_prime = (images_next - model_output_next) / sigma_next_safe
            images_heun = images_hat + 0.5 * (sigma_next - sigma_hat) * (d + d_prime)

            is_last = sigma_next == 0.0
            images = jnp.where(is_last, images_next, images_heun)
            x_start = jnp.where(is_last, model_output, model_output_next)
            return (images, x_start, key), None

        (images, _, _), _ = jax.lax.scan(
            step, (images0, jnp.zeros_like(images0), rng), triples
        )
        return unnormalize_to_zero_to_one(jnp.clip(images, -1.0, 1.0))

    def sample_using_dpmpp(
        self, params, rng, batch_size: int = 16,
        num_sample_steps: Optional[int] = None,
    ):
        """DPM-Solver++(2M) (Lu et al. 2022, Crowson's k-diffusion form)."""
        N = default(num_sample_steps, self.num_sample_steps)
        sigmas = self.sample_schedule(N)
        shape = self.sample_shape(batch_size)

        rng, init_key = jax.random.split(rng)
        images0 = sigmas[0] * jax.random.normal(init_key, shape, jnp.float32)

        sigma_fn = lambda t: jnp.exp(-t)
        t_fn = lambda sigma: -log_clamped(sigma)

        idxs = jnp.arange(len(sigmas) - 1)

        def step(carry, i):
            images, old_denoised, has_old = carry
            sigma_i = sigmas[i]
            sigma_n = sigmas[i + 1]
            denoised = self.preconditioned_network_forward(params, images, sigma_i)
            t, t_next = t_fn(sigma_i), t_fn(sigma_n)
            h = t_next - t

            sigma_prev = sigmas[jnp.maximum(i - 1, 0)]
            h_last = t - t_fn(sigma_prev)
            r = h_last / jnp.where(h == 0, 1.0, h)
            gamma = -1 / (2 * jnp.where(r == 0, 1.0, r))
            denoised_mix = (1 - gamma) * denoised + gamma * old_denoised

            use_plain = jnp.logical_or(
                jnp.logical_not(has_old), sigma_n == 0.0
            )
            denoised_d = jnp.where(use_plain, denoised, denoised_mix)

            images = (sigma_fn(t_next) / sigma_fn(t)) * images - jnp.expm1(
                -h
            ) * denoised_d
            return (images, denoised, jnp.asarray(True)), None

        (images, _, _), _ = jax.lax.scan(
            step, (images0, jnp.zeros_like(images0), jnp.asarray(False)), idxs
        )
        return unnormalize_to_zero_to_one(jnp.clip(images, -1.0, 1.0))

    # ------------------------------------------------------------------ loss

    def loss_weight(self, sigma):
        return (sigma**2 + self.sigma_data**2) * (sigma * self.sigma_data) ** -2

    def noise_distribution(self, rng, batch_size):
        return jnp.exp(
            self.P_mean + self.P_std * jax.random.normal(rng, (batch_size,))
        )

    def loss(self, params, rng, images, cond=None, *, train: bool = True):
        del cond
        b, h, w, c = images.shape
        assert (h, w) == self.image_size and c == self.channels

        sigma_key, noise_key, sc_key, sc_rng, model_rng = jax.random.split(rng, 5)
        images = normalize_to_neg_one_to_one(images.astype(jnp.float32))
        sigmas = self.noise_distribution(sigma_key, b)
        padded = sigmas[:, None, None, None]
        noise = jax.random.normal(noise_key, images.shape, jnp.float32)
        noised = images + padded * noise

        self_cond = None
        if self.self_condition:
            def with_sc(_):
                return jax.lax.stop_gradient(
                    self.preconditioned_network_forward(
                        params, noised, sigmas, train=train, rng=sc_rng
                    )
                )

            coin = jax.random.bernoulli(sc_key, 0.5)
            self_cond = jax.lax.cond(
                coin, with_sc, lambda _: jnp.zeros_like(noised), None
            )

        denoised = self.preconditioned_network_forward(
            params, noised, sigmas, self_cond, train=train, rng=model_rng
        )
        losses = jnp.mean(
            ((denoised - images) ** 2).reshape(b, -1), axis=-1
        )
        return jnp.mean(losses * self.loss_weight(sigmas))

    # trainer compatibility
    @property
    def num_timesteps(self):
        return self.num_sample_steps

    objective = "edm"
    normalize = staticmethod(normalize_to_neg_one_to_one)
    unnormalize = staticmethod(unnormalize_to_zero_to_one)
