"""Tests for the sampling.py CLI helpers (model rebuild paths)."""

import json
import sys
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_build_diffusion_from_training_params(tmp_path):
    """No --config: the model is rebuilt from the run's training_params.json
    (the metadata the Trainer records)."""
    import sampling as sampling_cli

    (tmp_path / "training_params.json").write_text(json.dumps({
        "unet_dim": 8, "unet_dim_mults": [1, 2], "channels": 3,
        "image_size": [16, 16], "timesteps": 100, "objective": "pred_noise",
    }))
    args = SimpleNamespace(
        config=None, trained_models_folder=str(tmp_path),
        ddim_sampling_timesteps=4,
    )
    diff = sampling_cli.build_diffusion(args)
    assert diff.image_size == (16, 16)
    assert diff.num_timesteps == 100
    assert diff.sampling_timesteps == 4
    assert diff.model.dim == 8


def test_build_diffusion_from_config(tmp_path):
    import sampling as sampling_cli
    import yaml

    cfg = {
        "unet": {"dim": 8, "dim_mults": [1, 2]},
        "diffusion": {"image_size": 16, "timesteps": 100},
    }
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    args = SimpleNamespace(
        config=str(cfg_path), trained_models_folder=str(tmp_path),
        ddim_sampling_timesteps=4,
    )
    diff = sampling_cli.build_diffusion(args)
    assert diff.model.dim == 8
    assert diff.num_timesteps == 100


def test_train_ddpm_build_elucidated(tmp_path):
    """`diffusion.type: elucidated` builds the EDM process through the same
    entry point (train/train_ddpm.py), with Fourier time features forced on."""
    import importlib

    import numpy as np
    from PIL import Image

    train_ddpm = importlib.import_module("train.train_ddpm")
    from diffusion_models_tpu.diffusion.elucidated import ElucidatedDiffusion

    ds = tmp_path / "imgs"
    ds.mkdir()
    for i in range(16):
        Image.fromarray(
            np.full((16, 16, 3), i * 10, dtype=np.uint8)
        ).save(ds / f"{i}.png")

    cfg = {
        "unet": {"dim": 8, "dim_mults": [1, 2]},
        "diffusion": {"type": "elucidated", "image_size": 16,
                      "num_sample_steps": 4},
        "trainer": {"data_path": str(ds), "train_batch_size": 16,
                    "train_lr": 1e-3, "train_num_steps": 10,
                    "save_and_sample_every": 10,
                    "calculate_fid": False,
                    "results_folder": str(tmp_path / "res")},
    }
    unet, diff, trainer = train_ddpm.build(cfg)
    assert isinstance(diff, ElucidatedDiffusion)
    assert diff.model is unet  # Trainer-facing alias
    assert diff.objective == "edm"
    assert unet.learned_sinusoidal_cond  # forced on for EDM
    assert diff.sample_shape(2) == (2, 16, 16, 3)


def test_milestones_filter_semantics():
    """--milestones restricts the sweep (order preserved, unknown ignored)."""
    milestones = [1, 2, 3, 4]
    wanted = [4, 2, 99]
    filtered = [m for m in milestones if m in set(wanted)]
    assert filtered == [2, 4]


def test_train_ddpm_build_karras_edm2(tmp_path):
    """`unet.type: karras` + `diffusion.type: elucidated` builds the EDM2
    pairing with the forced weight-norm post-update installed."""
    import importlib

    import numpy as np
    from PIL import Image

    train_ddpm = importlib.import_module("train.train_ddpm")
    from diffusion_models_tpu.diffusion.elucidated import ElucidatedDiffusion
    from diffusion_models_tpu.models.karras_unet import (
        KarrasUnetND,
        normalize_karras_weights,
    )

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
                    "save_and_sample_every": 10,
                    "calculate_fid": False,
                    "results_folder": str(tmp_path / "res")},
    }
    unet, diff, trainer = train_ddpm.build(cfg)
    assert isinstance(unet, KarrasUnetND)
    assert isinstance(diff, ElucidatedDiffusion)
    assert trainer.post_update_fn is normalize_karras_weights
