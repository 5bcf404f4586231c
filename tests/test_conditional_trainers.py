"""Smoke tests for the image-/text-conditional trainers end-to-end."""

import pickle

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from diffusion_models_tpu.diffusion.image_conditional import (
    ImageConditionalGaussianDiffusion,
)
from diffusion_models_tpu.diffusion.text_conditional import (
    TextConditionalGaussianDiffusion,
)
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.training.conditional_trainers import (
    ImageConditionalTrainer,
    TextConditionalTrainer,
)


@pytest.fixture(scope="module")
def paired_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pairs")
    (root / "condition").mkdir()
    (root / "target").mkdir()
    rs = np.random.RandomState(0)
    for i in range(24):
        a = rs.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        b = rs.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(a).save(root / "condition" / f"{i}_A.jpg")
        Image.fromarray(b).save(root / "target" / f"{i}_B.jpg")
    return root


@pytest.fixture(scope="module")
def text_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("textds")
    (root / "condition").mkdir()
    (root / "target").mkdir()
    rs = np.random.RandomState(1)
    emb = {}
    for i in range(24):
        stem = f"{i:06d}"
        Image.fromarray(
            rs.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        ).save(root / "target" / f"{stem}.jpg")
        emb[stem] = {
            "captions": [f"caption {i}"],
            "embeddings": rs.randn(1, 32).astype(np.float32),
        }
    with open(root / "text_embeddings.pkl", "wb") as f:
        pickle.dump(emb, f)
    return root


@pytest.mark.slow
def test_image_conditional_trainer(paired_root, tmp_path):
    model = Unet(dim=8, dim_mults=(1, 2), channels=3, cond_channels=3)
    diff = ImageConditionalGaussianDiffusion(
        model, image_size=16, timesteps=10, sampling_timesteps=2,
        beta_schedule="cosine",
        condition_data_folder=paired_root / "condition",
    )
    trainer = ImageConditionalTrainer(
        diff, str(paired_root),
        train_batch_size=16, train_num_steps=2, train_lr=1e-3,
        save_and_sample_every=2, num_samples=4,
        calculate_fid=False, calculate_is=False,
        results_folder=str(tmp_path / "r"), num_workers=1,
    )
    trainer.train()
    assert int(trainer.state.step) == 2
    # milestone eval ran: cond|sample grid + checkpoint
    assert (tmp_path / "r" / "sample-1.png").exists()
    assert trainer.ckpt.milestones() == [1]


@pytest.mark.slow
def test_text_conditional_trainer(text_root, tmp_path):
    model = Unet(
        dim=8, dim_mults=(1, 2), channels=3,
        text_condition=True, text_emb_dim=32, use_cross_attn=False,
    )
    diff = TextConditionalGaussianDiffusion(
        model, image_size=16, timesteps=10, sampling_timesteps=2,
        beta_schedule="cosine",
        embeddings_file=text_root / "text_embeddings.pkl", text_emb_dim=32,
    )
    trainer = TextConditionalTrainer(
        diff, str(text_root),
        train_batch_size=16, train_num_steps=2, train_lr=1e-3,
        save_and_sample_every=2, num_samples=4,
        calculate_fid=False, calculate_is=False,
        results_folder=str(tmp_path / "r"), num_workers=1,
    )
    trainer.train()
    assert int(trainer.state.step) == 2
    assert (tmp_path / "r" / "sample-1.png").exists()
    # captions saved alongside the grid
    captions = (tmp_path / "r" / "sample-1.txt").read_text().splitlines()
    assert len(captions) == 4


@pytest.mark.slow
def test_image_conditional_fused_steps_match_single(paired_root, tmp_path):
    """steps_per_call>1 must be equivalent on CONDITIONAL (tuple) batches
    too — the fused (K, accum, B, ...) stacking is pytree-generic."""
    import jax
    import numpy as np

    def make(folder, steps_per_call):
        model = Unet(dim=8, dim_mults=(1, 2), channels=3, cond_channels=3)
        diff = ImageConditionalGaussianDiffusion(
            model, image_size=16, timesteps=10, sampling_timesteps=2,
            beta_schedule="cosine",
            condition_data_folder=paired_root / "condition",
        )
        return ImageConditionalTrainer(
            diff, str(paired_root),
            train_batch_size=16, train_num_steps=4, train_lr=1e-3,
            save_and_sample_every=4, num_samples=4,
            calculate_fid=False, calculate_is=False,
            results_folder=str(folder), num_workers=1,
            steps_per_call=steps_per_call,
        )

    t1 = make(tmp_path / "a", 1)
    t1.train()
    t2 = make(tmp_path / "b", 2)
    t2.train()
    assert int(t1.state.step) == int(t2.state.step) == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
