"""Latent-diffusion wrapper tests (frozen VQ-VAE + latent-space DDPM)."""

import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.latent import (
    ImageConditionalLatentDiffusion,
    LatentDiffusion,
    TextConditionalLatentDiffusion,
    _FrozenVAE,
)
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.models.vae import VQModel

DDCONFIG = dict(
    double_z=False, z_channels=3, resolution=32, in_channels=3, out_ch=3,
    ch=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=[], dropout=0.0,
)


@pytest.fixture(scope="module")
def frozen_vae():
    vae = VQModel(ddconfig=DDCONFIG, n_embed=32, embed_dim=3)
    x0 = jnp.zeros((1, 32, 32, 3))
    params = vae.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    return _FrozenVAE(vae, params)


def test_latent_diffusion_loss_and_sample(frozen_vae):
    unet = Unet(dim=8, dim_mults=(1, 2), channels=3)
    ldm = LatentDiffusion(
        unet, frozen_vae, timesteps=10, sampling_timesteps=2,
        beta_schedule="cosine",
    )
    assert ldm.image_size == (16, 16)  # latent resolution from z_shape
    assert ldm.pixel_image_size == (32, 32)
    params = ldm.init(jax.random.PRNGKey(0))

    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    loss = jax.jit(ldm.loss)(params, jax.random.PRNGKey(2), img)
    assert np.isfinite(float(loss))

    # VAE params receive no gradient (frozen): grads flow only to denoiser
    grads = jax.grad(ldm.loss)(params, jax.random.PRNGKey(3), img)
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0

    out = ldm.sample(params, jax.random.PRNGKey(4), batch_size=2)
    assert out.shape == (2, 32, 32, 3)  # decoded back to pixels
    assert np.all(np.isfinite(np.asarray(out)))


def test_image_conditional_ldm(frozen_vae, tmp_path):
    from PIL import Image

    cond_dir = tmp_path / "condition"
    cond_dir.mkdir()
    rs = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(
            rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(cond_dir / f"{i}_A.png")

    unet = Unet(dim=8, dim_mults=(1, 2), channels=3, cond_channels=3)
    ldm = ImageConditionalLatentDiffusion(
        unet, frozen_vae, timesteps=10, sampling_timesteps=2,
        beta_schedule="cosine", condition_data_folder=cond_dir,
    )
    params = ldm.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    loss = ldm.loss(params, jax.random.PRNGKey(3), img, cond=cond)
    assert np.isfinite(float(loss))

    cond_px, out = ldm.sample(
        params, jax.random.PRNGKey(4), batch_size=2, return_condition_image=True
    )
    assert out.shape == (2, 32, 32, 3)
    assert cond_px.shape == (2, 32, 32, 3)


def test_text_conditional_ldm(frozen_vae, tmp_path):
    emb_file = tmp_path / "emb.pkl"
    rs = np.random.RandomState(0)
    with open(emb_file, "wb") as f:
        pickle.dump(
            {"a": {"captions": ["x"], "embeddings": rs.randn(1, 16).astype(np.float32)}},
            f,
        )
    unet = Unet(
        dim=8, dim_mults=(1, 2), channels=3,
        text_condition=True, text_emb_dim=16, use_cross_attn=True,
    )
    ldm = TextConditionalLatentDiffusion(
        unet, frozen_vae, text_emb_dim=16, timesteps=10, sampling_timesteps=2,
        beta_schedule="cosine", embeddings_file=emb_file,
    )
    params = ldm.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    loss = ldm.loss(params, jax.random.PRNGKey(3), img, cond=emb)
    assert np.isfinite(float(loss))

    out, captions = ldm.sample(
        params, jax.random.PRNGKey(4), batch_size=2, return_captions=True
    )
    assert out.shape == (2, 32, 32, 3)
    assert captions == ["x", "x"]
