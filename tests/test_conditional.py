"""Tests for image- and text-conditional models, diffusion, and trainers."""

import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from diffusion_models_tpu.diffusion.image_conditional import (
    ImageConditionalGaussianDiffusion,
)
from diffusion_models_tpu.diffusion.text_conditional import (
    TextConditionalGaussianDiffusion,
)
from diffusion_models_tpu.models.unet import Unet


# ------------------------------------------------------------ image cond


def test_image_conditional_unet_forward():
    model = Unet(dim=16, dim_mults=(1, 2), channels=3, cond_channels=3)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    cond = jnp.ones((2, 16, 16, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t, None, cond)["params"]
    out_c = model.apply({"params": params}, x, t, None, cond)
    out_n = model.apply({"params": params}, x, t)  # zeros-cond path
    assert out_c.shape == (2, 16, 16, 3)
    assert not np.allclose(np.asarray(out_c), np.asarray(out_n))


@pytest.fixture()
def cond_folder(tmp_path):
    d = tmp_path / "conds"
    d.mkdir()
    rs = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(
            rs.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        ).save(d / f"{i}_A.png")
    return d


def test_image_conditional_diffusion_loss_and_sample(cond_folder):
    model = Unet(dim=8, dim_mults=(1, 2), channels=3, cond_channels=3)
    diff = ImageConditionalGaussianDiffusion(
        model, image_size=16, timesteps=10, sampling_timesteps=2,
        beta_schedule="cosine", condition_data_folder=cond_folder,
    )
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3))
    loss = diff.loss(params, jax.random.PRNGKey(3), img, cond=cond)
    assert np.isfinite(float(loss))

    # sampling draws random conditions from the folder
    cond_img, out = diff.sample(
        params, jax.random.PRNGKey(4), batch_size=2, return_condition_image=True
    )
    assert out.shape == (2, 16, 16, 3)
    assert cond_img.shape == (2, 16, 16, 3)
    assert cond_img.min() >= 0 and cond_img.max() <= 1  # [0,1], not normalized


# ------------------------------------------------------------- text cond


@pytest.mark.parametrize("use_cross_attn", [False, True])
def test_text_conditional_unet_forward(use_cross_attn):
    model = Unet(
        dim=16, dim_mults=(1, 2), channels=3,
        text_condition=True, text_emb_dim=32, use_cross_attn=use_cross_attn,
    )
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t, None, emb)["params"]
    out = model.apply({"params": params}, x, t, None, emb)
    assert out.shape == (2, 16, 16, 3)
    # NB: must change the embedding *direction*: with a single context token
    # the attention weights are 1 and the RMS-normed output is scale-invariant
    emb2 = jax.random.normal(jax.random.PRNGKey(9), emb.shape)
    out2 = model.apply({"params": params}, x, t, None, emb2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    if use_cross_attn:
        assert "cross_attn" in params and "cross_attn_down" in params
    else:
        assert "text_concat_proj" in params


def test_text_cross_attn_token_context():
    """Cross-attention accepts (B, M, D) token-level context."""
    model = Unet(
        dim=16, dim_mults=(1, 2), channels=3,
        text_condition=True, text_emb_dim=32, use_cross_attn=True,
    )
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t, None, emb)["params"]
    out = model.apply({"params": params}, x, t, None, emb)
    assert out.shape == (2, 16, 16, 3)


def test_text_conditional_diffusion(tmp_path):
    emb_file = tmp_path / "emb.pkl"
    rs = np.random.RandomState(0)
    with open(emb_file, "wb") as f:
        pickle.dump(
            {
                f"{i}": {
                    "captions": [f"cap {i}"],
                    "embeddings": rs.randn(1, 32).astype(np.float32),
                }
                for i in range(3)
            },
            f,
        )

    model = Unet(
        dim=8, dim_mults=(1, 2), channels=3,
        text_condition=True, text_emb_dim=32, use_cross_attn=True,
    )
    diff = TextConditionalGaussianDiffusion(
        model, image_size=16, timesteps=10, sampling_timesteps=2,
        beta_schedule="cosine", embeddings_file=emb_file, text_emb_dim=32,
    )
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    loss = diff.loss(params, jax.random.PRNGKey(3), img, cond=emb)
    assert np.isfinite(float(loss))

    out, captions = diff.sample(
        params, jax.random.PRNGKey(4), batch_size=2, return_captions=True
    )
    assert out.shape == (2, 16, 16, 3)
    assert len(captions) == 2
