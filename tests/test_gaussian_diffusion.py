"""Tests for the GaussianDiffusion process: numerics oracles + end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.models.unet import Unet


def tiny_diffusion(**kwargs):
    model = Unet(dim=16, dim_mults=(1, 2), channels=3)
    # cosine schedule: at T=20 the reference-parity *linear* schedule has
    # beta_end = (1000/20)*0.02 = 1.0, i.e. alphas_cumprod[-1] == 0 and the
    # x0-from-noise coefficients are inf (true of the reference too — linear
    # is only meaningful near T=1000). Cosine clips betas to 0.999.
    defaults = dict(image_size=16, timesteps=20, beta_schedule="cosine")
    defaults.update(kwargs)
    return GaussianDiffusion(model, **defaults)


@pytest.fixture(scope="module")
def diff_and_params():
    diff = tiny_diffusion()
    params = diff.init(jax.random.PRNGKey(0))
    return diff, params


def test_q_sample_oracle(diff_and_params):
    diff, _ = diff_and_params
    rs = np.random.RandomState(0)
    x0 = rs.randn(2, 16, 16, 3).astype(np.float32)
    noise = rs.randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([3, 17])

    out = diff.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))

    ac = np.asarray(diff.schedule.alphas_cumprod, dtype=np.float64)
    expect = (
        np.sqrt(ac[t])[:, None, None, None] * x0
        + np.sqrt(1 - ac[t])[:, None, None, None] * noise
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_pred_noise_x0_roundtrip(diff_and_params):
    """predict_start_from_noise ∘ q_sample recovers x0 exactly."""
    diff, _ = diff_and_params
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (2, 16, 16, 3))
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t = jnp.array([5, 12])
    xt = diff.q_sample(x0, t, noise)
    rec = diff.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)
    rec_noise = diff.predict_noise_from_start(xt, t, x0)
    np.testing.assert_allclose(
        np.asarray(rec_noise), np.asarray(noise), rtol=1e-3, atol=1e-4
    )


def test_v_parameterization_roundtrip(diff_and_params):
    diff, _ = diff_and_params
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
    noise = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
    t = jnp.array([0, 19])
    v = diff.predict_v(x0, t, noise)
    xt = diff.q_sample(x0, t, noise)
    rec = diff.predict_start_from_v(xt, t, v)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_q_posterior_oracle(diff_and_params):
    diff, _ = diff_and_params
    rs = np.random.RandomState(5)
    x0 = rs.randn(2, 16, 16, 3).astype(np.float32)
    xt = rs.randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([1, 10])

    mean, var, logvar = diff.q_posterior(jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t))

    betas = np.asarray(diff.schedule.betas, np.float64)
    ac = np.cumprod(1 - betas)
    acp = np.concatenate([[1.0], ac[:-1]])
    c1 = (betas * np.sqrt(acp) / (1 - ac))[t][:, None, None, None]
    c2 = ((1 - acp) * np.sqrt(1 - betas) / (1 - ac))[t][:, None, None, None]
    np.testing.assert_allclose(np.asarray(mean), c1 * x0 + c2 * xt, rtol=1e-4, atol=1e-5)
    pv = (betas * (1 - acp) / (1 - ac))[t][:, None, None, None]
    np.testing.assert_allclose(np.asarray(var), np.broadcast_to(pv, var.shape), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logvar),
        np.broadcast_to(np.log(np.maximum(pv, 1e-20)), logvar.shape),
        rtol=1e-3,
    )


def test_ddim_time_pairs_match_reference_spacing():
    diff = tiny_diffusion(timesteps=1000)
    pairs = np.asarray(diff._ddim_time_pairs(50))
    assert pairs.shape == (50, 2)
    assert pairs[0, 0] == 999
    assert pairs[-1, 1] == -1
    # consecutive: next of pair i is time of pair i+1
    np.testing.assert_array_equal(pairs[:-1, 1], pairs[1:, 0])
    # matches linspace(-1, 999, 51) truncated to int, reversed
    times = np.linspace(-1, 999, 51).astype(np.int32)[::-1]
    np.testing.assert_array_equal(pairs[:, 0], times[:-1])
    np.testing.assert_array_equal(pairs[:, 1], times[1:])


def test_loss_scalar_finite(diff_and_params):
    diff, params = diff_and_params
    img = jax.random.uniform(jax.random.PRNGKey(7), (2, 16, 16, 3))
    loss = jax.jit(diff.loss)(params, jax.random.PRNGKey(8), img)
    assert loss.shape == ()
    assert np.isfinite(float(loss))
    assert float(loss) > 0


@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0", "pred_v"])
def test_loss_all_objectives(objective):
    diff = tiny_diffusion(objective=objective)
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    loss = diff.loss(params, jax.random.PRNGKey(2), img)
    assert np.isfinite(float(loss))


def test_hybrid_loss():
    diff = tiny_diffusion(hybrid_loss=True)
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    loss = diff.loss(params, jax.random.PRNGKey(2), img)
    assert np.isfinite(float(loss))


def test_loss_differentiable(diff_and_params):
    diff, params = diff_and_params
    img = jax.random.uniform(jax.random.PRNGKey(9), (2, 16, 16, 3))
    grads = jax.grad(diff.loss)(params, jax.random.PRNGKey(10), img)
    gnorm = jnp.sqrt(
        sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads))
    )
    assert np.isfinite(float(gnorm))
    assert float(gnorm) > 0


def test_ancestral_sampling_shapes_and_range(diff_and_params):
    diff, params = diff_and_params
    out = jax.jit(lambda p, r: diff.p_sample_loop(p, r, (2, 16, 16, 3)))(
        params, jax.random.PRNGKey(11)
    )
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_sampling_shapes(diff_and_params):
    diff, params = diff_and_params
    out = jax.jit(
        lambda p, r: diff.ddim_sample(p, r, (2, 16, 16, 3), sampling_timesteps=5)
    )(params, jax.random.PRNGKey(12))
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_return_all_timesteps(diff_and_params):
    diff, params = diff_and_params
    out = diff.ddim_sample(
        params, jax.random.PRNGKey(13), (1, 16, 16, 3),
        sampling_timesteps=4, return_all_timesteps=True,
    )
    assert out.shape == (1, 5, 16, 16, 3)


def test_sample_dispatches_ddim():
    diff = tiny_diffusion(sampling_timesteps=4)
    assert diff.is_ddim_sampling
    params = diff.init(jax.random.PRNGKey(0))
    out = diff.sample(params, jax.random.PRNGKey(1), batch_size=2)
    assert out.shape == (2, 16, 16, 3)


def test_self_conditioning_loss():
    model = Unet(dim=16, dim_mults=(1, 2), channels=3, self_condition=True)
    diff = GaussianDiffusion(
        model, image_size=16, timesteps=10, beta_schedule="cosine"
    )
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    loss = jax.jit(diff.loss)(params, jax.random.PRNGKey(2), img)
    assert np.isfinite(float(loss))
    out = diff.sample(params, jax.random.PRNGKey(3), batch_size=1)
    assert out.shape == (1, 16, 16, 3)


def test_interpolate(diff_and_params):
    diff, params = diff_and_params
    x1 = jax.random.normal(jax.random.PRNGKey(14), (1, 16, 16, 3))
    x2 = jax.random.normal(jax.random.PRNGKey(15), (1, 16, 16, 3))
    out = diff.interpolate(params, jax.random.PRNGKey(16), x1, x2, t=5)
    assert out.shape == x1.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_immiscible_noise_assignment():
    diff = tiny_diffusion(immiscible=True)
    x0 = jax.random.normal(jax.random.PRNGKey(17), (4, 16, 16, 3))
    noise = jax.random.normal(jax.random.PRNGKey(18), (4, 16, 16, 3))
    t = jnp.zeros((4,), jnp.int32)
    out = diff.q_sample(x0, t, noise)
    assert out.shape == x0.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_offset_noise_loss():
    diff = tiny_diffusion(offset_noise_strength=0.1)
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    loss = diff.loss(params, jax.random.PRNGKey(2), img)
    assert np.isfinite(float(loss))


def test_immiscible_greedy_in_jit():
    """Greedy assignment runs entirely in-jit and yields a permutation with
    cost <= the identity assignment."""
    diff = tiny_diffusion(immiscible=True, immiscible_mode="greedy")
    x0 = jax.random.normal(jax.random.PRNGKey(20), (8, 16, 16, 3))
    noise = jax.random.normal(jax.random.PRNGKey(21), (8, 16, 16, 3))

    assign = jax.jit(diff._noise_assignment)(x0, noise)
    assign = np.asarray(assign)
    assert sorted(assign.tolist()) == list(range(8))  # a permutation

    xf = np.asarray(x0).reshape(8, -1)
    nf = np.asarray(noise).reshape(8, -1)
    dist = np.linalg.norm(xf[:, None] - nf[None, :], axis=-1)
    greedy_cost = dist[np.arange(8), assign].sum()
    identity_cost = np.trace(dist)
    assert greedy_cost <= identity_cost + 1e-4

    # whole q_sample jits (no host callback in the greedy path)
    t = jnp.zeros((8,), jnp.int32)
    out = jax.jit(lambda a, b, c: diff.q_sample(a, b, c))(x0, t, noise)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_remat_matches_no_remat():
    """remat=True changes memory strategy only — loss and grads identical."""
    model = Unet(dim=8, dim_mults=(1, 2), channels=3)
    d0 = GaussianDiffusion(model, image_size=16, timesteps=10,
                           beta_schedule="cosine", remat=False)
    d1 = GaussianDiffusion(model, image_size=16, timesteps=10,
                           beta_schedule="cosine", remat=True)
    params = d0.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    rng = jax.random.PRNGKey(2)

    l0, g0 = jax.value_and_grad(d0.loss)(params, rng, img)
    l1, g1 = jax.value_and_grad(d1.loss)(params, rng, img)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_hybrid_loss_matches_reference_reduction():
    """Golden NumPy oracle for the Improved-DDPM hybrid loss, pinned to the
    reference's reduction (`denoising_diffusion.py:864-892`): per-sample MSE
    × loss_weight, plus the t>0-masked *scalar* mean KL weighted 0.001,
    then a final batch mean."""
    from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
    from diffusion_models_tpu.models.unet import Unet

    model = Unet(dim=8, dim_mults=(1, 2), channels=3)
    diff = GaussianDiffusion(
        model, image_size=16, timesteps=50, beta_schedule="cosine",
        hybrid_loss=True,
    )
    params = diff.init(jax.random.PRNGKey(0))
    x_start = (
        jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3)) * 2 - 1
    )
    t = jnp.array([0, 7, 23, 49], jnp.int32)
    rng = jax.random.PRNGKey(2)

    got = float(diff.p_losses(params, rng, x_start, t, train=False))

    # ---- oracle: replicate p_losses' rng handling, then apply the
    # reference's formula step by step in NumPy
    keys = jax.random.split(rng, 5)
    noise = jax.random.normal(keys[0], x_start.shape, jnp.float32)
    x = np.asarray(diff.q_sample(x_start, t, noise))
    model_out = diff._apply_model(
        params, jnp.asarray(x), t, None, None, train=False, rng=keys[4]
    )
    mo = np.asarray(model_out, np.float32)

    mse = ((mo - np.asarray(noise)) ** 2).reshape(4, -1).mean(axis=1)
    lw = np.asarray(diff.schedule.loss_weight)[np.asarray(t)]
    loss_vec = mse * lw

    # KL(q(x_{t-1}|x_t,x0) || p_theta): model mean from clipped x0_hat
    x_hat = np.asarray(
        diff.predict_start_from_noise(jnp.asarray(x), t, model_out)
    )
    x_hat = np.clip(x_hat, -1.0, 1.0)
    m_mean, _, m_logvar = (
        np.asarray(v)
        for v in diff.q_posterior(jnp.asarray(x_hat), jnp.asarray(x), t)
    )
    p_mean, p_var, p_logvar = (
        np.asarray(v)
        for v in diff.q_posterior(x_start.astype(jnp.float32), jnp.asarray(x), t)
    )
    kl = 0.5 * (
        p_logvar - m_logvar
        + (np.exp(m_logvar) + (m_mean - p_mean) ** 2) / p_var
        - 1.0
    )
    kl = kl.reshape(4, -1).mean(axis=1)
    mask = (np.asarray(t) > 0).astype(np.float32)
    kl_scalar = (kl * mask).sum() / (mask.sum() + 1e-8)

    expect = float((loss_vec + 0.001 * kl_scalar).mean())
    np.testing.assert_allclose(got, expect, rtol=2e-5)


def test_eval_model_routing_preserves_params_and_train_path():
    """`_model_for` must (a) hand both training and inference a module
    with an IDENTICAL param tree (the `fused_attn_block` clone only
    changes op routing, never parameters; training routes fused only on a
    single device, inference always on TPU), and (b) respect the
    DMT_PALLAS_LINATTN=0 kill switch. On the CPU test backend the clone
    never happens (TPU-only routing), so also pin the clone behavior
    explicitly."""
    import os

    from diffusion_models_tpu.models.unet import Unet

    model = Unet(dim=8, dim_mults=(1, 2), channels=3)
    diff = GaussianDiffusion(model, image_size=8, timesteps=10,
                              beta_schedule="cosine")
    # CPU backend: route_for_inference is a no-op, so both paths return
    # the configured module itself
    assert diff._model_for(train=True) is model

    eval_model = diff._model_for(train=False)
    # CPU backend: no clone; TPU: clone with the flag set
    if jax.default_backend() == "tpu" and os.environ.get(
        "DMT_PALLAS_LINATTN"
    ) != "0":
        assert eval_model.fused_attn_block is True
    else:
        assert eval_model is model

    # the clone (whether taken or not) must not change the param tree
    cloned = model.clone(fused_attn_block=True)
    p1 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                    jnp.zeros((1,), jnp.int32))
    p2 = cloned.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                     jnp.zeros((1,), jnp.int32))
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dpmpp_sampling_shapes_and_range(diff_and_params):
    diff, params = diff_and_params
    out = jax.jit(
        lambda p, r: diff.dpmpp_sample(p, r, (2, 16, 16, 3), sampling_timesteps=5)
    )(params, jax.random.PRNGKey(21))
    assert out.shape == (2, 16, 16, 3)
    o = np.asarray(out)
    assert np.all(np.isfinite(o))
    assert o.min() >= 0.0 and o.max() <= 1.0


def test_dpmpp_single_step_is_x0_prediction(diff_and_params):
    """With S=1 the grid is [(T-1) -> -1]: the solver must land exactly on
    the clipped x0 prediction at t = T-1 (the terminal endpoint of the
    lambda integral), matching model_predictions."""
    diff, params = diff_and_params
    rng = jax.random.PRNGKey(22)
    out = diff.dpmpp_sample(params, rng, (2, 16, 16, 3), sampling_timesteps=1)

    init_key = jax.random.split(rng)[1]
    img0 = jax.random.normal(init_key, (2, 16, 16, 3), jnp.float32)
    t_b = jnp.full((2,), diff.num_timesteps - 1, jnp.int32)
    # jit the reference prediction too: an eager forward differs from the
    # compiled one by ~7e-4 (fusion reassociation), which would swamp the
    # solver-exactness property under test
    x0 = jax.jit(
        lambda p, x, t: diff.model_predictions(
            p, x, t, None, None, clip_x_start=True
        )[1]
    )(params, img0, t_b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(diff.unnormalize(x0)), rtol=1e-4, atol=1e-5
    )


def test_dpmpp_matches_ddim_at_dense_steps(diff_and_params):
    """Both DDIM (eta=0) and DPM-Solver++ discretize the same probability-
    flow ODE; at a dense grid (S = T) on the same init noise their samples
    must converge to the same trajectory endpoint."""
    diff, params = diff_and_params
    rng = jax.random.PRNGKey(23)
    ddim = diff.ddim_sample(params, rng, (2, 16, 16, 3), sampling_timesteps=20)
    dpmpp = diff.dpmpp_sample(params, rng, (2, 16, 16, 3), sampling_timesteps=20)
    d = np.abs(np.asarray(ddim) - np.asarray(dpmpp))
    assert d.mean() < 0.05, d.mean()


def test_sample_dispatches_dpmpp():
    diff = tiny_diffusion(sampling_timesteps=4, sampling_method="dpmpp")
    params = diff.init(jax.random.PRNGKey(0))
    out = diff.sample(params, jax.random.PRNGKey(1), batch_size=2)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))
