"""Tests for the diffusion variant zoo: learned-variance, continuous-time,
v-param, weighted-objective, elucidated (EDM), CFG, guided, RePaint."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_models_tpu.models.unet import Unet


def tiny_unet(**kw):
    kw.setdefault("dim", 8)
    kw.setdefault("dim_mults", (1, 2))
    kw.setdefault("channels", 3)
    return Unet(**kw)


IMG = lambda key=1, b=2: jax.random.uniform(jax.random.PRNGKey(key), (b, 16, 16, 3))


# --------------------------------------------------------- learned variance


def test_learned_variance_loss_and_sample():
    from diffusion_models_tpu.diffusion.learned_variance import (
        LearnedGaussianDiffusion,
    )

    model = tiny_unet(learned_variance=True)
    diff = LearnedGaussianDiffusion(
        model, image_size=16, timesteps=10, beta_schedule="cosine"
    )
    params = diff.init(jax.random.PRNGKey(0))
    loss = jax.jit(diff.loss)(params, jax.random.PRNGKey(1), IMG())
    assert np.isfinite(float(loss))

    out = diff.p_sample_loop(params, jax.random.PRNGKey(2), (2, 16, 16, 3))
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_learned_variance_interp_bounds():
    from diffusion_models_tpu.diffusion.learned_variance import (
        LearnedGaussianDiffusion,
    )

    model = tiny_unet(learned_variance=True)
    diff = LearnedGaussianDiffusion(
        model, image_size=16, timesteps=10, beta_schedule="cosine"
    )
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([3, 7])
    # v=-1 → min (posterior), v=+1 → max (beta)
    lo = diff._variance_interp(x, t, -jnp.ones_like(x))
    hi = diff._variance_interp(x, t, jnp.ones_like(x))
    min_log = np.asarray(diff.schedule.posterior_log_variance_clipped)[np.asarray(t)]
    max_log = np.log(np.asarray(diff.schedule.betas))[np.asarray(t)]
    np.testing.assert_allclose(np.asarray(lo)[:, 0, 0, 0], min_log, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hi)[:, 0, 0, 0], max_log, rtol=1e-5)


# --------------------------------------------------------- continuous time


@pytest.mark.parametrize("schedule", ["linear", "cosine", "learned"])
def test_continuous_time_loss(schedule):
    from diffusion_models_tpu.diffusion.continuous_time import (
        ContinuousTimeGaussianDiffusion,
    )

    model = tiny_unet(learned_sinusoidal_cond=True)
    diff = ContinuousTimeGaussianDiffusion(
        model, image_size=16, noise_schedule=schedule, num_sample_steps=4,
        learned_schedule_net_hidden_dim=16,
    )
    params = diff.init(jax.random.PRNGKey(0))
    if schedule == "learned":
        assert "log_snr" in params
    loss = jax.jit(diff.loss)(params, jax.random.PRNGKey(1), IMG())
    assert np.isfinite(float(loss))


def test_continuous_time_sample():
    from diffusion_models_tpu.diffusion.continuous_time import (
        ContinuousTimeGaussianDiffusion,
    )

    model = tiny_unet(learned_sinusoidal_cond=True)
    diff = ContinuousTimeGaussianDiffusion(
        model, image_size=16, num_sample_steps=4
    )
    params = diff.init(jax.random.PRNGKey(0))
    out = diff.sample(params, jax.random.PRNGKey(1), batch_size=2)
    assert out.shape == (2, 16, 16, 3)
    o = np.asarray(out)
    assert np.all(np.isfinite(o)) and o.min() >= 0 and o.max() <= 1


def test_learned_schedule_monotone():
    from diffusion_models_tpu.diffusion.continuous_time import (
        LearnedNoiseSchedule,
        beta_linear_log_snr,
    )

    sched = LearnedNoiseSchedule(
        log_snr_max=float(beta_linear_log_snr(jnp.array(0.0))),
        log_snr_min=float(beta_linear_log_snr(jnp.array(1.0))),
        hidden_dim=16,
    )
    t = jnp.linspace(0, 1, 32)
    params = sched.init(jax.random.PRNGKey(0), t)["params"]
    out = np.asarray(sched.apply({"params": params}, t))
    assert np.all(np.diff(out) <= 1e-5)  # log-SNR decreasing in t
    # endpoint normalization
    np.testing.assert_allclose(out[0], float(beta_linear_log_snr(jnp.array(0.0))), rtol=1e-4)
    np.testing.assert_allclose(out[-1], float(beta_linear_log_snr(jnp.array(1.0))), rtol=1e-4)


def test_v_param_continuous_time():
    from diffusion_models_tpu.diffusion.continuous_time import (
        VParamContinuousTimeGaussianDiffusion,
    )

    model = tiny_unet(learned_sinusoidal_cond=True)
    diff = VParamContinuousTimeGaussianDiffusion(
        model, image_size=16, num_sample_steps=4
    )
    params = diff.init(jax.random.PRNGKey(0))
    loss = diff.loss(params, jax.random.PRNGKey(1), IMG())
    assert np.isfinite(float(loss))
    out = diff.sample(params, jax.random.PRNGKey(2), batch_size=2)
    assert out.shape == (2, 16, 16, 3)


# ------------------------------------------------------- weighted objective


def test_weighted_objective():
    from diffusion_models_tpu.diffusion.weighted_objective import (
        WeightedObjectiveGaussianDiffusion,
    )

    model = tiny_unet(out_dim=3 * 2 + 2)
    diff = WeightedObjectiveGaussianDiffusion(
        model, image_size=16, timesteps=10, beta_schedule="cosine"
    )
    params = diff.init(jax.random.PRNGKey(0))
    loss = jax.jit(diff.loss)(params, jax.random.PRNGKey(1), IMG())
    assert np.isfinite(float(loss))
    out = diff.p_sample_loop(params, jax.random.PRNGKey(2), (2, 16, 16, 3))
    assert out.shape == (2, 16, 16, 3)


# ------------------------------------------------------------- elucidated


def test_elucidated_loss_and_samplers():
    from diffusion_models_tpu.diffusion.elucidated import ElucidatedDiffusion

    model = tiny_unet(learned_sinusoidal_cond=True)
    diff = ElucidatedDiffusion(model, image_size=16, num_sample_steps=4)
    params = diff.init(jax.random.PRNGKey(0))
    loss = jax.jit(diff.loss)(params, jax.random.PRNGKey(1), IMG())
    assert np.isfinite(float(loss))

    out = diff.sample(params, jax.random.PRNGKey(2), batch_size=2)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))

    out2 = diff.sample_using_dpmpp(params, jax.random.PRNGKey(3), batch_size=2)
    assert out2.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_elucidated_schedule():
    from diffusion_models_tpu.diffusion.elucidated import ElucidatedDiffusion

    model = tiny_unet(learned_sinusoidal_cond=True)
    diff = ElucidatedDiffusion(model, image_size=16, num_sample_steps=8)
    sig = np.asarray(diff.sample_schedule())
    assert sig.shape == (9,)
    np.testing.assert_allclose(sig[0], 80.0, rtol=1e-5)
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)


# ---------------------------------------------------------------------- cfg


def test_cfg_unet_and_diffusion():
    from diffusion_models_tpu.diffusion.cfg import CFGGaussianDiffusion, CFGUnet

    model = CFGUnet(dim=8, dim_mults=(1, 2), channels=3, num_classes=5)
    diff = CFGGaussianDiffusion(
        model, image_size=16, timesteps=10, sampling_timesteps=3,
        cond_scale=3.0, beta_schedule="cosine",
    )
    params = diff.init(jax.random.PRNGKey(0))
    classes = jnp.array([0, 3], jnp.int32)
    loss = jax.jit(diff.loss)(params, jax.random.PRNGKey(1), IMG(), classes)
    assert np.isfinite(float(loss))

    out = diff.sample(params, jax.random.PRNGKey(2), classes=classes)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cfg_plus_plus():
    from diffusion_models_tpu.diffusion.cfg import CFGGaussianDiffusion, CFGUnet

    model = CFGUnet(dim=8, dim_mults=(1, 2), channels=3, num_classes=5)
    diff = CFGGaussianDiffusion(
        model, image_size=16, timesteps=10, sampling_timesteps=3,
        use_cfg_plus_plus=True, beta_schedule="cosine",
    )
    params = diff.init(jax.random.PRNGKey(0))
    out = diff.sample(params, jax.random.PRNGKey(1), classes=jnp.array([1, 2]))
    assert np.all(np.isfinite(np.asarray(out)))


def test_cfg_project():
    from diffusion_models_tpu.diffusion.cfg import project

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
    par, orth = project(x, y)
    np.testing.assert_allclose(np.asarray(par + orth), np.asarray(x), rtol=1e-4, atol=1e-5)
    # orthogonal component ⟂ y per sample
    dots = np.sum(np.asarray(orth).reshape(2, -1) * np.asarray(y).reshape(2, -1), axis=-1)
    np.testing.assert_allclose(dots, 0.0, atol=1e-3)


# ------------------------------------------------------------------- guided


def test_classifier_guided_sampling():
    from diffusion_models_tpu.diffusion.guided import (
        GuidedGaussianDiffusion,
        LinearTimeClassifier,
        classifier_cond_fn,
    )

    model = tiny_unet()
    diff = GuidedGaussianDiffusion(
        model, image_size=16, timesteps=10, beta_schedule="cosine"
    )
    params = diff.init(jax.random.PRNGKey(0))

    clf = LinearTimeClassifier(image_size=16, num_classes=4)
    clf_params = clf.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 16, 16, 3)), jnp.zeros((2,))
    )
    y = jnp.array([1, 2])

    cond_fn = lambda mean, t: classifier_cond_fn(
        lambda p, x, tt: clf.apply(p, x, tt), clf_params, mean, t, y,
        classifier_scale=1.0,
    )
    out = diff.sample(params, jax.random.PRNGKey(2), batch_size=2, cond_fn=cond_fn)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))

    # guidance changes the output
    out_unguided = diff.sample(params, jax.random.PRNGKey(2), batch_size=2)
    assert not np.allclose(np.asarray(out), np.asarray(out_unguided))


# ------------------------------------------------------------------ repaint


def test_repaint_inpainting():
    from diffusion_models_tpu.diffusion.repaint import RePaintGaussianDiffusion

    model = tiny_unet()
    diff = RePaintGaussianDiffusion(
        model, image_size=16, timesteps=10, beta_schedule="cosine"
    )
    params = diff.init(jax.random.PRNGKey(0))
    gt = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    mask = jnp.zeros((2, 16, 16, 1)).at[:, :8].set(1.0)  # top half known

    out = diff.sample(
        params, jax.random.PRNGKey(2), gt=gt, mask=mask,
        resample=True, resample_iter=2, resample_jump=2, resample_every=5,
    )
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # known region equals gt exactly (pasted at t=0, then unnormalized)
    np.testing.assert_allclose(
        np.asarray(out)[:, :8], np.asarray(gt)[:, :8], atol=1e-5
    )


def test_ddim_sample_guided():
    from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion

    model = tiny_unet()
    diff = GaussianDiffusion(
        model, image_size=16, timesteps=10, beta_schedule="cosine"
    )
    params = diff.init(jax.random.PRNGKey(0))
    guide = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.1
    mask = jnp.zeros((2, 16, 16, 1)).at[:, 8:].set(1.0)
    out = diff.ddim_sample_guided(
        params, jax.random.PRNGKey(2), (2, 16, 16, 3),
        sampling_timesteps=3, guide=guide, mask=mask,
    )
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))
