"""Golden sampler tests: the scan-fused DDPM/DDIM loops must match a plain
Python/NumPy re-execution of the published update equations step by step,
using a closed-form 'denoiser' (ε̂ = 0.5·x) so there is no network noise.

This pins the exact semantics of the fused samplers (coefficient usage, clip
→ rederive order, σ/c formulas, t==0 and time_next<0 handling, RNG
threading) against independently written math.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from flax import linen as nn


class ClosedFormModel(nn.Module):
    """Deterministic 'denoiser': eps_hat = 0.5 * x (no params used)."""

    channels: int = 3
    self_condition: bool = False

    @nn.compact
    def __call__(self, x, t, x_self_cond=None, cond=None, *, train=False):
        # touch a param so init produces a non-empty tree
        _ = self.param("dummy", nn.initializers.zeros, (1,))
        return 0.5 * x


@pytest.fixture(scope="module")
def diff_and_params():
    model = ClosedFormModel()
    diff = GaussianDiffusion(
        model, image_size=8, timesteps=12, beta_schedule="cosine"
    )
    params = diff.init(jax.random.PRNGKey(0))
    return diff, params


def _schedule_np(diff):
    s = diff.schedule
    return {k: np.asarray(getattr(s, k), np.float64) for k in (
        "alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_mean_coef1",
        "posterior_mean_coef2", "posterior_log_variance_clipped",
    )}


def test_ddpm_ancestral_matches_numpy_oracle(diff_and_params):
    diff, params = diff_and_params
    shape = (2, 8, 8, 3)
    rng = jax.random.PRNGKey(42)

    out = np.asarray(diff.p_sample_loop(params, rng, shape))

    # ---- oracle: replicate the scan's RNG threading and update math
    s = _schedule_np(diff)
    rng_o, init_key = jax.random.split(rng)
    img = np.asarray(jax.random.normal(init_key, shape), np.float64)
    key = rng_o
    for t in range(diff.num_timesteps - 1, -1, -1):
        key, noise_key = jax.random.split(key)
        eps = 0.5 * img
        x0 = (
            s["sqrt_recip_alphas_cumprod"][t] * img
            - s["sqrt_recipm1_alphas_cumprod"][t] * eps
        )
        x0 = np.clip(x0, -1.0, 1.0)
        mean = (
            s["posterior_mean_coef1"][t] * x0
            + s["posterior_mean_coef2"][t] * img
        )
        logvar = s["posterior_log_variance_clipped"][t]
        noise = np.asarray(jax.random.normal(noise_key, shape), np.float64)
        if t == 0:
            noise = 0.0
        img = mean + np.exp(0.5 * logvar) * noise
    expect = (img + 1) * 0.5

    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_ddim_matches_numpy_oracle(diff_and_params):
    diff, params = diff_and_params
    shape = (2, 8, 8, 3)
    rng = jax.random.PRNGKey(7)
    S, eta = 5, 0.4  # nonzero eta exercises the sigma branch

    out = np.asarray(
        diff.ddim_sample(params, rng, shape, sampling_timesteps=S, eta=eta)
    )

    s = _schedule_np(diff)
    total = diff.num_timesteps
    times = list(reversed(np.linspace(-1, total - 1, S + 1).astype(int).tolist()))
    pairs = list(zip(times[:-1], times[1:]))

    rng_o, init_key = jax.random.split(rng)
    img = np.asarray(jax.random.normal(init_key, shape), np.float64)
    key = rng_o
    for time_, time_next in pairs:
        key, noise_key = jax.random.split(key)
        eps = 0.5 * img
        x0 = (
            s["sqrt_recip_alphas_cumprod"][time_] * img
            - s["sqrt_recipm1_alphas_cumprod"][time_] * eps
        )
        x0 = np.clip(x0, -1.0, 1.0)
        # rederive pred noise from the clipped x0
        eps = (
            s["sqrt_recip_alphas_cumprod"][time_] * img - x0
        ) / s["sqrt_recipm1_alphas_cumprod"][time_]

        alpha = s["alphas_cumprod"][time_]
        alpha_next = 1.0 if time_next < 0 else s["alphas_cumprod"][time_next]
        sigma = eta * np.sqrt(
            max((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0)
        )
        c = np.sqrt(max(1 - alpha_next - sigma**2, 0))
        noise = np.asarray(jax.random.normal(noise_key, shape), np.float64)
        img = x0 * np.sqrt(alpha_next) + c * eps + sigma * noise
    expect = (img + 1) * 0.5

    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_ddim_eta_zero_deterministic_tail(diff_and_params):
    """η=0: two runs share everything but the init key → different outputs;
    the same rng → identical outputs (fully deterministic given the key)."""
    diff, params = diff_and_params
    shape = (1, 8, 8, 3)
    a = diff.ddim_sample(params, jax.random.PRNGKey(1), shape, sampling_timesteps=4)
    b = diff.ddim_sample(params, jax.random.PRNGKey(1), shape, sampling_timesteps=4)
    c = diff.ddim_sample(params, jax.random.PRNGKey(2), shape, sampling_timesteps=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
