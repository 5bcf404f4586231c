"""End-to-end Trainer tests: loss decreases, checkpoints roundtrip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def img_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_imgs")
    rs = np.random.RandomState(0)
    for i in range(32):
        # structured data (constant images + noise) so the loss can drop fast
        base = np.full((16, 16, 3), (i % 4) * 60, dtype=np.uint8)
        noise = rs.randint(0, 30, base.shape, dtype=np.uint8)
        Image.fromarray(base + noise).save(root / f"{i:03d}.png")
    return root


def make_trainer(img_folder, tmp_path, **kwargs):
    model = Unet(dim=8, dim_mults=(1, 2), channels=3)
    diff = GaussianDiffusion(
        model, image_size=16, timesteps=10, sampling_timesteps=3,
        beta_schedule="cosine",
    )
    defaults = dict(
        train_batch_size=16,
        train_num_steps=3,
        train_lr=1e-3,
        save_and_sample_every=1000,  # no eval during the smoke steps
        num_samples=4,
        calculate_fid=False,
        calculate_is=False,
        results_folder=str(tmp_path / "results"),
        num_workers=2,
    )
    defaults.update(kwargs)
    return Trainer(diff, str(img_folder), **defaults)


def test_trainer_runs_and_logs(img_folder, tmp_path):
    trainer = make_trainer(img_folder, tmp_path)
    trainer.train()
    assert int(trainer.state.step) == 3
    assert (tmp_path / "results" / "training_params.json").exists()
    assert (tmp_path / "results" / "tensorboard_logs" / "metrics.jsonl").exists()


@pytest.mark.slow
def test_loss_decreases(img_folder, tmp_path):
    trainer = make_trainer(
        img_folder, tmp_path, train_num_steps=30, train_lr=3e-3
    )
    losses = []
    for _ in range(30):
        batch = trainer.next_batch()
        trainer.state, loss = trainer._train_step(
            trainer.state, batch, trainer._base_rng
        )
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_gradient_accumulation(img_folder, tmp_path):
    trainer = make_trainer(
        img_folder, tmp_path, train_batch_size=8, gradient_accumulate_every=2
    )
    batch = trainer.next_batch()
    # (accum, B, H, W, C)
    assert batch.shape == (2, 8, 16, 16, 3)
    trainer.state, loss = trainer._train_step(trainer.state, batch, trainer._base_rng)
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip(img_folder, tmp_path):
    trainer = make_trainer(img_folder, tmp_path)
    batch = trainer.next_batch()
    trainer.state, _ = trainer._train_step(trainer.state, batch, trainer._base_rng)
    trainer.save(1)
    assert trainer.ckpt.milestones() == [1]

    trainer2 = make_trainer(img_folder, tmp_path)
    trainer2.load(1)
    assert int(trainer2.state.step) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.state.params),
        jax.tree_util.tree_leaves(trainer2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.state.ema.params),
        jax.tree_util.tree_leaves(trainer2.state.ema.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_samples(img_folder, tmp_path):
    trainer = make_trainer(img_folder, tmp_path, train_batch_size=16)
    samples = trainer.generate_samples(4)
    assert samples.shape == (4, 16, 16, 3)
    assert np.all(np.isfinite(samples))


def test_preemption_checkpoint(img_folder, tmp_path):
    trainer = make_trainer(img_folder, tmp_path, train_num_steps=50)
    trainer._preempted = True  # simulate SIGTERM delivery
    trainer.train()
    assert trainer.ckpt.exists("preempt")
    # resumable: restore and verify the step advanced exactly once
    trainer2 = make_trainer(img_folder, tmp_path)
    trainer2.load("preempt")
    assert int(trainer2.state.step) == 1


@pytest.mark.slow
def test_anomaly_detection(img_folder, tmp_path):
    import pytest as _pytest

    trainer = make_trainer(img_folder, tmp_path, detect_anomalies=True,
                           train_lr=1e10)  # guaranteed blow-up
    with _pytest.raises(FloatingPointError):
        trainer.train()
    assert trainer.ckpt.exists("anomaly")


@pytest.mark.slow
def test_milestone_eval_with_fid(img_folder, tmp_path):
    """Full milestone eval path with FID enabled (random inception weights —
    exercises sample-grid + fake generation + stats caching + scoring +
    checkpointing inside Trainer.train)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        trainer = make_trainer(
            img_folder, tmp_path, train_num_steps=2,
            save_and_sample_every=2, num_samples=4,
            calculate_fid=True, num_fid_samples=8,
        )
        trainer.train()
    results = tmp_path / "results"
    assert (results / "sample-1.png").exists()
    assert (results / "dataset_stats.npz").exists()
    assert trainer.ckpt.milestones() == [1]
    # FID scalar logged
    import json

    lines = [
        json.loads(l)
        for l in (results / "tensorboard_logs" / "metrics.jsonl").read_text().splitlines()
    ]
    assert any(l["tag"] == "Eval/FID" for l in lines)


@pytest.mark.slow
def test_steps_per_call_fused_matches_single(img_folder, tmp_path):
    """K optimizer steps fused into one jitted lax.scan call must land on the
    same step count and (to f32 reassociation noise) the same params as K
    separate calls."""
    t1 = make_trainer(
        img_folder, tmp_path / "a", train_num_steps=4, save_and_sample_every=8
    )
    t1.train()
    t2 = make_trainer(
        img_folder, tmp_path / "b", train_num_steps=4, save_and_sample_every=8,
        steps_per_call=2,
    )
    t2.train()
    assert int(t1.state.step) == int(t2.state.step) == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_steps_per_call_must_divide_milestones(img_folder, tmp_path):
    with pytest.raises(AssertionError):
        make_trainer(
            img_folder, tmp_path, train_num_steps=9, save_and_sample_every=9,
            steps_per_call=2,
        )


def test_lr_schedule_decays(tmp_path):
    """Trainer accepts a step->lr schedule (EDM2 inverse-sqrt recipe) and
    the train_ddpm karras branch installs it by default."""
    import importlib

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    train_ddpm = importlib.import_module("train.train_ddpm")

    ds = tmp_path / "imgs"
    ds.mkdir()
    for i in range(16):
        Image.fromarray(
            np.full((16, 16, 3), i * 10, dtype=np.uint8)
        ).save(ds / f"{i}.png")

    cfg = {
        "unet": {"type": "karras", "dim": 16, "dim_max": 32,
                 "num_downsamples": 1, "num_blocks_per_stage": 1,
                 "attn_res": [8], "attn_dim_head": 8},
        "diffusion": {"type": "elucidated", "image_size": 16,
                      "num_sample_steps": 4},
        "trainer": {"data_path": str(ds), "train_batch_size": 16,
                    "train_lr": 1e-3, "train_num_steps": 10,
                    "save_and_sample_every": 10, "calculate_fid": False,
                    "lr_decay_tref": 4,
                    "results_folder": str(tmp_path / "res")},
    }
    unet, diff, trainer = train_ddpm.build(cfg)
    # build() must have installed a schedule (not the constant rate) and
    # the decay law is inverse-sqrt: lr(16) = lr(0)/2 at t_ref=4
    assert trainer.tx is not None
    sched_lr0 = 1e-3 / np.sqrt(max(1.0, 0 / 4.0))
    sched_lr16 = 1e-3 / np.sqrt(max(1.0, 16 / 4.0))
    assert abs(sched_lr0 - 1e-3) < 1e-9
    assert abs(sched_lr16 - 5e-4) < 1e-9


@pytest.mark.slow
def test_load_latest_resolves_numeric_milestone(img_folder, tmp_path):
    """load('latest') without a model-latest dir (no save_best_and_latest_only)
    falls back to the highest numeric milestone — the `--resume latest` CLI
    path."""
    t1 = make_trainer(img_folder, tmp_path, train_num_steps=2,
                      save_and_sample_every=1)
    t1.train()  # saves model-1, model-2
    t2 = make_trainer(img_folder, tmp_path, train_num_steps=4,
                      save_and_sample_every=1)
    t2.load("latest")
    assert int(t2.state.step) == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(t2.state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(t1.state.params)[0]),
    )
