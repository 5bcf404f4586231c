"""Golden numerics tests for schedules and diffusion coefficient tables.

Oracles are independent fp64 NumPy transliterations of the published DDPM /
Improved-DDPM formulas (as used by the reference at
`denoising_diffusion.py:394-433,503-557`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from diffusion_models_tpu.ops.schedules import (
    cosine_beta_schedule,
    extract,
    linear_beta_schedule,
    make_schedule,
    sigmoid_beta_schedule,
)


def test_linear_schedule_endpoints():
    betas = linear_beta_schedule(1000)
    assert betas.dtype == np.float64
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-12)


def test_linear_schedule_rescales_with_T():
    # scale = 1000/T keeps the *continuous* schedule fixed as T varies
    betas = linear_beta_schedule(500)
    np.testing.assert_allclose(betas[0], 2e-4, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.04, rtol=1e-12)


def test_cosine_schedule_against_oracle():
    T, s = 100, 0.008
    steps = np.linspace(0, T, T + 1, dtype=np.float64) / T
    ac = np.cos((steps + s) / (1 + s) * np.pi / 2) ** 2
    ac = ac / ac[0]
    expect = np.clip(1 - ac[1:] / ac[:-1], 0, 0.999)
    np.testing.assert_allclose(cosine_beta_schedule(T), expect, rtol=1e-12)


def test_sigmoid_schedule_monotone_alphabar():
    betas = sigmoid_beta_schedule(200)
    ac = np.cumprod(1 - betas)
    assert np.all(np.diff(ac) < 0)
    assert np.all(betas >= 0) and np.all(betas <= 0.999)


@pytest.mark.parametrize("name", ["linear", "cosine", "sigmoid"])
def test_buffer_identities(name):
    """The 11 derived tables must satisfy their defining identities in f32."""
    sched = make_schedule(50, beta_schedule=name)
    betas = np.asarray(sched.betas, dtype=np.float64)
    alphas = 1 - betas
    ac = np.cumprod(alphas)
    acp = np.concatenate([[1.0], ac[:-1]])

    # oracle recomputes the cumprod from f32-rounded betas: allow f32 drift
    np.testing.assert_allclose(sched.alphas_cumprod, ac, rtol=1e-4)
    np.testing.assert_allclose(sched.alphas_cumprod_prev, acp, rtol=1e-4)
    np.testing.assert_allclose(sched.sqrt_alphas_cumprod, np.sqrt(ac), rtol=1e-4)
    np.testing.assert_allclose(
        sched.sqrt_one_minus_alphas_cumprod, np.sqrt(1 - ac), rtol=1e-5
    )
    np.testing.assert_allclose(
        sched.sqrt_recip_alphas_cumprod, np.sqrt(1 / ac), rtol=1e-5
    )
    np.testing.assert_allclose(
        sched.sqrt_recipm1_alphas_cumprod, np.sqrt(1 / ac - 1), rtol=1e-4
    )
    post_var = betas * (1 - acp) / (1 - ac)
    np.testing.assert_allclose(sched.posterior_variance, post_var, rtol=1e-5)
    np.testing.assert_allclose(
        sched.posterior_log_variance_clipped,
        np.log(np.maximum(post_var, 1e-20)),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        sched.posterior_mean_coef1, betas * np.sqrt(acp) / (1 - ac), rtol=1e-4
    )
    np.testing.assert_allclose(
        sched.posterior_mean_coef2, (1 - acp) * np.sqrt(alphas) / (1 - ac), rtol=1e-5
    )


def test_loss_weight_ddpm_flag():
    sched = make_schedule(10, ddpm=True, beta_schedule="cosine")
    np.testing.assert_array_equal(np.asarray(sched.loss_weight), np.ones(10))


def test_degenerate_linear_schedule_fails_loudly():
    """Small-T linear schedules yield betas >= 1 (beta_end = (1000/T)*0.02),
    which would silently fill the posterior tables with NaN — make_schedule
    must reject them instead."""
    with pytest.raises(ValueError, match="outside"):
        make_schedule(10, beta_schedule="linear")
    # T large enough is fine
    make_schedule(100, beta_schedule="linear")


@pytest.mark.parametrize(
    "objective,clip",
    [("pred_noise", False), ("pred_noise", True), ("pred_x0", True), ("pred_v", True)],
)
def test_loss_weight_snr(objective, clip):
    T, gamma = 64, 5.0
    sched = make_schedule(
        T, ddpm=False, objective=objective, min_snr_loss_weight=clip, min_snr_gamma=gamma
    )
    betas = linear_beta_schedule(T)
    ac = np.cumprod(1 - betas)
    snr = ac / (1 - ac)
    clipped = np.minimum(snr, gamma) if clip else snr
    expect = {
        "pred_noise": clipped / snr,
        "pred_x0": clipped,
        "pred_v": clipped / (snr + 1),
    }[objective]
    np.testing.assert_allclose(sched.loss_weight, expect, rtol=1e-5)


def test_extract_gather_broadcast():
    a = jnp.arange(10, dtype=jnp.float32)
    t = jnp.array([2, 7], dtype=jnp.int32)
    out = extract(a, t, 4)
    assert out.shape == (2, 1, 1, 1)
    np.testing.assert_array_equal(np.asarray(out).ravel(), [2.0, 7.0])
