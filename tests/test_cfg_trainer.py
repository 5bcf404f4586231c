"""CFG training path: class dataset, CFGTrainer end-to-end, lr-schedule
round-trip through training_params.json."""

import json

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from diffusion_models_tpu.diffusion.cfg import CFGGaussianDiffusion, CFGUnet
from diffusion_models_tpu.training.conditional_trainers import CFGTrainer
from diffusion_models_tpu.training.trainer import build_lr_schedule
from diffusion_models_tpu.utils.data import ClassConditionalDataset


@pytest.fixture(scope="module")
def class_folder(tmp_path_factory):
    """Caption-folder layout: target/<id>.png + condition/<id>.txt."""
    root = tmp_path_factory.mktemp("class_data")
    (root / "target").mkdir()
    (root / "condition").mkdir()
    rs = np.random.RandomState(0)
    names = ["a red patch", "a green patch", "a blue patch"]
    for i in range(24):
        cls = i % 3
        img = np.zeros((16, 16, 3), np.uint8)
        img[..., cls] = 200
        img += rs.randint(0, 20, img.shape).astype(np.uint8)
        Image.fromarray(img).save(root / "target" / f"{i:03d}.png")
        (root / "condition" / f"{i:03d}.txt").write_text(names[cls])
    return root


def test_class_conditional_dataset(class_folder):
    ds = ClassConditionalDataset(class_folder, 16)
    assert len(ds) == 24
    assert ds.num_classes == 3
    assert ds.class_names == ["a blue patch", "a green patch", "a red patch"]
    img, label = ds.get(0)
    assert img.shape == (16, 16, 3) and img.dtype == np.float32
    # 000.png is red → caption "a red patch" → index 2 in sorted order
    assert label == 2
    imgs, labels = ds.get_batch([0, 1, 2], [None] * 3)
    assert imgs.shape == (3, 16, 16, 3)
    assert list(labels) == [2, 1, 0]


def make_cfg_trainer(class_folder, tmp_path, **kwargs):
    model = CFGUnet(dim=8, dim_mults=(1, 2), channels=3, num_classes=3)
    diff = CFGGaussianDiffusion(
        model, image_size=16, timesteps=10, sampling_timesteps=3,
        cond_scale=3.0,
    )
    defaults = dict(
        train_batch_size=16,
        train_num_steps=2,
        train_lr=1e-3,
        save_and_sample_every=2,
        num_samples=4,
        calculate_fid=False,
        calculate_is=False,
        results_folder=str(tmp_path / "results"),
        num_workers=2,
    )
    defaults.update(kwargs)
    return CFGTrainer(diff, str(class_folder), **defaults)


@pytest.mark.slow
def test_cfg_trainer_end_to_end(class_folder, tmp_path):
    """Train 2 steps, hit a milestone: guided sampling grid + class captions
    + checkpoint must all be produced."""
    trainer = make_cfg_trainer(class_folder, tmp_path)
    trainer.train()
    results = tmp_path / "results"
    assert (results / "sample-1.png").exists()
    classes_txt = (results / "sample-1.txt").read_text().splitlines()
    assert len(classes_txt) == 4
    assert all(c in trainer.dataset.class_names for c in classes_txt)
    assert (results / "model-1").exists()


@pytest.mark.slow
def test_cfg_trainer_guided_samples(class_folder, tmp_path):
    trainer = make_cfg_trainer(class_folder, tmp_path, train_num_steps=2,
                               save_and_sample_every=4)
    trainer.train()
    samples = trainer.generate_samples(4, rng_seed=0)
    assert samples.shape == (4, 16, 16, 3)
    assert np.isfinite(samples).all()


def test_lr_schedule_roundtrip(class_folder, tmp_path):
    """lr_schedule_config lands in training_params.json and reconstructs
    the exact schedule values."""
    cfg = {"type": "inv_sqrt", "t_ref": 100.0, "base_lr": 2e-4}
    trainer = make_cfg_trainer(
        class_folder, tmp_path,
        lr_schedule=build_lr_schedule(cfg), lr_schedule_config=cfg,
    )
    dumped = json.loads(
        (tmp_path / "results" / "training_params.json").read_text()
    )
    assert dumped["lr_schedule_config"] == cfg
    rebuilt = build_lr_schedule(dumped["lr_schedule_config"])
    for step in (0, 100, 400, 10000):
        expected = cfg["base_lr"] / np.sqrt(max(1.0, step / cfg["t_ref"]))
        assert np.allclose(float(rebuilt(jnp.asarray(step, jnp.float32))),
                           expected, rtol=1e-6)
    del trainer


def test_training_params_records_beta_schedule(class_folder, tmp_path):
    make_cfg_trainer(class_folder, tmp_path)
    dumped = json.loads(
        (tmp_path / "results" / "training_params.json").read_text()
    )
    assert dumped["beta_schedule"] == "cosine"  # CFG default
    assert dumped["objective"] == "pred_noise"


def test_cfg_unet_fused_route_matches_jnp_with_shared_params():
    """CFGUnet(fused_attn_block=True) must produce the same output as the
    default route from the SAME param tree (off-TPU the fused route falls
    back to the jnp twin, exercising the thread-through + the residual=x
    call-style change against the previous external `+ x`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_models_tpu.diffusion.cfg import CFGUnet

    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(2, 16, 16, 3), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    classes = jnp.asarray([0, 1], jnp.int32)
    mod = CFGUnet(dim=16, num_classes=4, dim_mults=(1, 2), cond_drop_prob=0.0)
    params = mod.init(
        {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
        x, t, classes,
    )["params"]
    out_default = mod.apply({"params": params}, x, t, classes)
    out_fused = CFGUnet(
        dim=16, num_classes=4, dim_mults=(1, 2), cond_drop_prob=0.0,
        fused_attn_block=True,
    ).apply({"params": params}, x, t, classes)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_default), rtol=2e-5, atol=2e-5
    )
