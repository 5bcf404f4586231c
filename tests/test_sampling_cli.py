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
