"""Tests for the remaining model families: 1D diffusion, UViT/simple
diffusion, Karras MP U-Nets (1D/2D/3D)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


# ------------------------------------------------------------------- 1D


def test_unet1d_and_diffusion_1d():
    from diffusion_models_tpu.diffusion.diffusion_1d import (
        Dataset1D,
        GaussianDiffusion1D,
    )
    from diffusion_models_tpu.models.unet1d import Unet1D

    model = Unet1D(dim=8, dim_mults=(1, 2), channels=2)
    diff = GaussianDiffusion1D(
        model, seq_length=32, timesteps=10, sampling_timesteps=3,
        beta_schedule="cosine",
    )
    params = diff.init(jax.random.PRNGKey(0))
    seq = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 2))
    loss = jax.jit(diff.loss)(params, jax.random.PRNGKey(2), seq)
    assert np.isfinite(float(loss))

    out = diff.sample(params, jax.random.PRNGKey(3), batch_size=2)
    assert out.shape == (2, 32, 2)
    assert np.all(np.isfinite(np.asarray(out)))

    ds = Dataset1D(np.random.RandomState(0).rand(8, 32, 2))
    assert len(ds) == 8
    assert ds.get(0).shape == (32, 2)


# ------------------------------------------------------------------ UViT


def test_uvit_forward():
    from diffusion_models_tpu.models.uvit import UViT

    model = UViT(dim=16, dim_mults=(1, 2), channels=3, vit_depth=1,
                 vit_dropout=0.0)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_uvit_patchified():
    from diffusion_models_tpu.models.uvit import UViT

    model = UViT(dim=16, dim_mults=(1, 2), channels=3, vit_depth=1,
                 vit_dropout=0.0, patch_size=2, dual_patchnorm=True)
    x = jnp.zeros((1, 32, 32, 3))
    t = jnp.zeros((1,), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (1, 32, 32, 3)


def test_simple_diffusion():
    from diffusion_models_tpu.diffusion.simple_diffusion import (
        SimpleDiffusion,
        logsnr_schedule_cosine,
        logsnr_schedule_shifted,
    )
    from diffusion_models_tpu.models.uvit import UViT

    model = UViT(dim=8, dim_mults=(1, 2), channels=3, vit_depth=1,
                 vit_dropout=0.0)
    diff = SimpleDiffusion(
        model, image_size=16, num_sample_steps=4, noise_d=8,
    )
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    loss = jax.jit(diff.loss)(params, jax.random.PRNGKey(2), img)
    assert np.isfinite(float(loss))

    out = diff.sample(params, jax.random.PRNGKey(3), batch_size=2)
    assert out.shape == (2, 16, 16, 3)
    o = np.asarray(out)
    assert np.all(np.isfinite(o)) and o.min() >= 0 and o.max() <= 1

    # shifted schedule = base + 2 log(noise_d / image_d)
    t = jnp.array(0.3)
    base = logsnr_schedule_cosine(t)
    shifted = logsnr_schedule_shifted(logsnr_schedule_cosine, 16, 8)(t)
    np.testing.assert_allclose(
        float(shifted - base), 2 * np.log(8 / 16), rtol=1e-5
    )


def test_simple_diffusion_eps_objective():
    from diffusion_models_tpu.diffusion.simple_diffusion import SimpleDiffusion
    from diffusion_models_tpu.models.uvit import UViT

    model = UViT(dim=8, dim_mults=(1, 2), channels=3, vit_depth=1,
                 vit_dropout=0.0)
    diff = SimpleDiffusion(model, image_size=16, pred_objective="eps",
                           num_sample_steps=3)
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    assert np.isfinite(float(diff.loss(params, jax.random.PRNGKey(2), img)))


# ----------------------------------------------------------------- Karras


def test_mp_ops():
    from diffusion_models_tpu.models.karras_unet import (
        mp_add,
        mp_cat,
        normalize_weight,
        pixel_norm,
    )

    rs = jax.random.PRNGKey(0)
    a = jax.random.normal(rs, (2, 8, 8, 16))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))

    out = mp_cat(a, b, t=0.5)
    assert out.shape == (2, 8, 8, 32)
    # magnitude preservation: unit-variance in → approx unit-variance out
    assert 0.8 < float(jnp.std(out)) < 1.2

    out = mp_add(a, b, t=0.3)
    assert 0.8 < float(jnp.std(out)) < 1.2

    pn = pixel_norm(a)
    norms = jnp.linalg.norm(pn, axis=-1) / np.sqrt(16)
    np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-4)

    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 4, 8))
    nw = normalize_weight(w)
    flat = np.asarray(nw).reshape(-1, 8)
    np.testing.assert_allclose(
        np.linalg.norm(flat, axis=0), np.sqrt(flat.shape[0]), rtol=1e-4
    )


@pytest.mark.parametrize("rank", [1, 2])
def test_karras_unet_forward(rank):
    from diffusion_models_tpu.models.karras_unet import KarrasUnetND

    size = 16
    model = KarrasUnetND(
        image_size=size, rank=rank, dim=16, dim_max=32, channels=3,
        num_downsamples=1, num_blocks_per_stage=1, attn_res=(8,),
        attn_dim_head=8,
    )
    spatial = (size,) * rank
    x = jax.random.normal(jax.random.PRNGKey(0), (2,) + spatial + (3,))
    t = jnp.ones((2,))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, t,
    )["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_karras_unet_class_conditional():
    from diffusion_models_tpu.models.karras_unet import KarrasUnetND

    model = KarrasUnetND(
        image_size=16, dim=16, dim_max=32, channels=3, num_classes=7,
        num_downsamples=1, num_blocks_per_stage=1, attn_res=(8,),
        attn_dim_head=8,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    t = jnp.ones((2,))
    labels = jnp.array([1, 5])
    params = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, t, None, labels,
    )["params"]
    # every Gain (output + per-block emb gains) inits to 0 (EDM2 behavior:
    # conditioning opens up during training) — open them all to observe the
    # class conditioning at the output
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.ones_like(v)
        if getattr(p[-1], "key", "") == "gain"
        else v,
        params,
    )
    out = model.apply({"params": params}, x, t, None, labels)
    out2 = model.apply({"params": params}, x, t, None, jnp.array([2, 3]))
    assert out.shape == x.shape
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_karras_weight_renorm():
    from diffusion_models_tpu.models.karras_unet import (
        KarrasUnetND,
        normalize_karras_weights,
    )

    model = KarrasUnetND(
        image_size=16, dim=16, dim_max=32, channels=3,
        num_downsamples=1, num_blocks_per_stage=1, attn_res=(),
        attn_dim_head=8,
    )
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, jnp.ones((1,)),
    )["params"]
    normed = normalize_karras_weights(params)
    # forward invariant under stored-weight renorm (forward re-normalizes)
    out1 = model.apply({"params": params}, x, jnp.ones((1,)))
    out2 = model.apply({"params": normed}, x, jnp.ones((1,)))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-3)


def test_mp_image_transformer():
    from diffusion_models_tpu.models.karras_unet import MPImageTransformer

    model = MPImageTransformer(dim=16, depth=1, dim_head=8, heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    params = model.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == x.shape


def test_inv_sqrt_decay_schedule():
    from diffusion_models_tpu.models.karras_unet import inv_sqrt_decay_schedule

    sched = sched = inv_sqrt_decay_schedule(1.0, t_ref=100, sigma_ref=0.01)
    np.testing.assert_allclose(float(sched(50)), 0.01, rtol=1e-6)  # flat before t_ref
    np.testing.assert_allclose(float(sched(400)), 0.005, rtol=1e-6)  # 1/sqrt(4)


def test_karras_unet_3d_forward():
    from diffusion_models_tpu.models.karras_unet import KarrasUnetND

    model = KarrasUnetND(
        image_size=8, rank=3, dim=8, dim_max=16, channels=2,
        num_downsamples=1, num_blocks_per_stage=1, attn_res=(4,),
        attn_dim_head=8,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8, 2))
    t = jnp.ones((1,))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, t,
    )["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_karras_unet_in_elucidated_diffusion():
    """The natural EDM2 pairing: KarrasUnet as the EDM denoiser."""
    from diffusion_models_tpu.diffusion.elucidated import ElucidatedDiffusion
    from diffusion_models_tpu.models.karras_unet import KarrasUnetND

    net = KarrasUnetND(
        image_size=16, dim=16, dim_max=32, channels=3,
        num_downsamples=1, num_blocks_per_stage=1, attn_res=(8,),
        attn_dim_head=8,
    )
    edm = ElucidatedDiffusion(net, image_size=16, channels=3,
                              num_sample_steps=3)
    params = edm.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    loss = jax.jit(edm.loss)(params, jax.random.PRNGKey(2), img)
    assert np.isfinite(float(loss))
    out = edm.sample(params, jax.random.PRNGKey(3), batch_size=2)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))
