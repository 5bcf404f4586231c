"""Guidance-scale sweep for a trained CFG checkpoint: the classic
fidelity/diversity trade (Ho & Salimans 2022, reference
`classifier_free_guidance.py:339-369` guidance math).

For each cond_scale, samples a fixed per-class batch from the final
milestone's EMA weights and reports:
  - class fidelity: fraction of samples whose hue/brightness statistics
    match their conditioning class (the same deterministic rule that
    labeled the dataset, `data/scripts/make_color_captions.py::caption_for`)
  - diversity: mean per-class pixel std across samples
  - FID vs the training set (He-init Inception protocol)

    python scripts/cfg_guidance_sweep.py --milestone 8 \
        --scales 1 2 4 6 8 --n_per_class 64
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/dmt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffusion_models_tpu.diffusion.cfg import CFGGaussianDiffusion, CFGUnet
from diffusion_models_tpu.utils.checkpoint import CheckpointManager
from diffusion_models_tpu.utils.config import load_config
from diffusion_models_tpu.utils.data import ClassConditionalDataset
from diffusion_models_tpu.utils.image import save_image_grid


def class_matches(cap: str, mean_rgb: np.ndarray) -> np.ndarray:
    """Does a batch of mean-RGB stats (B, 3) in [0,1] match caption `cap`?
    Mirrors `caption_for` (brightness threshold 110/255, hue spread 12/255)."""
    bright_ok = (mean_rgb.mean(axis=1) > 110 / 255) == ("bright" in cap)
    spread = mean_rgb.max(axis=1) - mean_rgb.min(axis=1)
    if "gray" in cap:
        return (spread < 12 / 255) & bright_ok
    chan = [c for c in ("red", "green", "blue") if c in cap][0]
    idx = ("red", "green", "blue").index(chan)
    return (spread >= 12 / 255) & (mean_rgb.argmax(axis=1) == idx) & bright_ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="train/configs/cfg_color_classes.yaml")
    p.add_argument("--results_folder", default=None)
    p.add_argument("--milestone", type=int, default=None,
                   help="default: highest saved milestone")
    p.add_argument("--scales", type=float, nargs="+",
                   default=[1.0, 2.0, 4.0, 6.0, 8.0])
    p.add_argument("--n_per_class", type=int, default=64)
    p.add_argument("--num_fid_samples", type=int, default=1024)
    p.add_argument("--calculate_fid", action=argparse.BooleanOptionalAction,
                   default=True)
    args = p.parse_args()

    cfg = load_config(args.config)
    unet_cfg, d, t = cfg["unet"], cfg["diffusion"], cfg["trainer"]
    results = Path(args.results_folder or t["results_folder"])
    out_dir = results / "guidance_sweep"
    out_dir.mkdir(parents=True, exist_ok=True)

    ds = ClassConditionalDataset(t["data_path"], d["image_size"])
    num_classes = ds.num_classes
    assert num_classes == unet_cfg["num_classes"]

    unet = CFGUnet(
        dim=unet_cfg["dim"],
        num_classes=num_classes,
        dim_mults=tuple(unet_cfg["dim_mults"]),
        channels=unet_cfg.get("channels", 3),
        dtype=jnp.bfloat16,
    )

    def build(scale):
        return CFGGaussianDiffusion(
            unet,
            image_size=d["image_size"],
            timesteps=d["timesteps"],
            sampling_timesteps=d.get("sampling_timesteps"),
            beta_schedule=d.get("beta_schedule", "cosine"),
            cond_scale=scale,
            rescaled_phi=d.get("rescaled_phi", 0.7),
        )

    diffusion = build(args.scales[0])
    params_template = diffusion.init(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(results)
    milestone = args.milestone
    if milestone is None:
        ms = ckpt.milestones()
        assert ms, f"no milestones in {results}"
        milestone = max(ms)
    print(f"sweeping milestone {milestone}")
    restored = ckpt.restore(
        milestone,
        {"step": jnp.zeros((), jnp.int32), "ema_params": params_template,
         "ema_step": jnp.zeros((), jnp.int32)},
        partial=True,
    )
    ema = restored["ema_params"]

    fid_scorer = None
    if args.calculate_fid:
        from diffusion_models_tpu.training.evaluation import FIDEvaluation

        fid_scorer = FIDEvaluation(
            batch_size=128, data_loader=ds, stats_dir=results,
            num_fid_samples=args.num_fid_samples, weights_path=None,
        )

    n = args.n_per_class
    classes = np.repeat(np.arange(num_classes, dtype=np.int32), n)
    report = []
    for scale in args.scales:
        diff_s = build(scale)
        sample = jax.jit(
            lambda p, r, c: diff_s.sample(p, r, c.shape[0], cond=c)
        )
        out = np.asarray(
            sample(ema, jax.random.PRNGKey(7), jnp.asarray(classes))
        )
        # fidelity + per-class diversity
        fid_frac, div = [], []
        for ci, cap in enumerate(ds.class_names):
            block = out[ci * n : (ci + 1) * n]
            mean_rgb = block.mean(axis=(1, 2))
            fid_frac.append(float(class_matches(cap, mean_rgb).mean()))
            div.append(float(block.std(axis=0).mean()))
        row = {
            "cond_scale": scale,
            "class_fidelity": round(float(np.mean(fid_frac)), 4),
            "per_class_fidelity": {
                c: round(f, 3) for c, f in zip(ds.class_names, fid_frac)
            },
            "diversity_pixel_std": round(float(np.mean(div)), 4),
        }
        if fid_scorer is not None:
            fakes = []
            rng = jax.random.PRNGKey(11)
            np_rng = np.random.default_rng(11)
            remaining = args.num_fid_samples
            while remaining > 0:
                b = min(128, args.num_fid_samples)
                rng, key = jax.random.split(rng)
                cls = jnp.asarray(
                    np_rng.integers(num_classes, size=b).astype(np.int32)
                )
                fakes.append(np.asarray(sample(ema, key, cls))[:remaining])
                remaining -= b
            row["fid"] = round(float(fid_scorer.fid_score(np.concatenate(fakes))), 3)
        # grid: one row per class, 8 samples each
        grid = np.concatenate(
            [out[ci * n : ci * n + 8] for ci in range(num_classes)], axis=0
        )
        save_image_grid(grid, out_dir / f"grid_scale{scale:g}.png", nrow=8)
        print(json.dumps(row))
        report.append(row)

    with open(out_dir / "sweep.json", "w") as f:
        json.dump(report, f, indent=2)
    print(f"saved {out_dir}/sweep.json")


if __name__ == "__main__":
    main()
