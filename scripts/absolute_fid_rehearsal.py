"""One-command path from a pretrained-weights file to absolute FID/IS scores.

This image has zero egress, so the pretrained InceptionV3 the reference gets
for free through pytorch-fid (`fid_evaluation.py:7-8,36-51`) is a FILE INPUT
here. The moment that file exists, this script turns every committed
milestone trend into absolute scores:

  1. locate the Inception state dict under --weights_dir (pytorch-fid
     `pt_inception-2015-12-05-6726825d.pth` schema, the FID variant),
  2. convert it with `InceptionV3.load_torch_state_dict` and VALIDATE the
     conversion against the reference-architecture torch oracle at the
     parity-test tolerances (rtol 1e-3 / atol 2e-4,
     `tests/test_torch_oracle_models.py::test_inception_converted_forward...`),
  3. delete every cached `dataset_stats.npz` (they were computed with the
     He-init stand-in features),
  4. re-sweep the committed milestones of each measured run with
     `--inception_weights` pointing at the file.

Dry-runnable TODAY: `--dry-run` builds a random-init torch state dict with
the exact pytorch-fid schema as a stand-in, then exercises every step end to
end (scores stay meaningless, plumbing is proven).

    python scripts/absolute_fid_rehearsal.py --weights_dir /path/to/weights
    python scripts/absolute_fid_rehearsal.py --dry-run
"""

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np

# measured runs → (sweep command template, real-images folder). Sweeps run
# as subprocesses so each gets a fresh jit cache and the exact CLI surface
# a user would drive.
SWEEPS = [
    {
        "results": "results/ddpm_natural32",
        "cmd": [
            "python", "sampling.py",
            "--trained_models_folder", "results/ddpm_natural32",
            "--images_folder", "data/natural_patches_32/train_images",
            "--config", "train/configs/ddpm_natural32.yaml",
            "--ddim_sampling_timesteps", "50", "--calculate_is",
        ],
    },
    {
        "results": "results/ldm_natural32",
        "cmd": [
            "python", "sampling_ldm.py",
            "--trained_models_folder", "results/ldm_natural32",
            "--images_folder", "data/natural_patches_32/train_images",
            "--config", "train/configs/ldm_natural32.yaml",
            "--ddim_sampling_timesteps", "50",
        ],
    },
    {
        "results": "results/ldm_gray2color",
        "cmd": [
            "python", "sampling_ldm.py",
            "--trained_models_folder", "results/ldm_gray2color",
            "--config", "train/configs/ldm_image_conditional_gray2color.yaml",
            "--mode", "image_cond",
            "--condition_folder", "data/gray2color_32/condition",
            "--images_folder", "data/gray2color_32/target",
            "--ddim_sampling_timesteps", "50",
        ],
    },
    {
        "results": "results/ddpm_gray2color",
        "cmd": [
            "python", "sampling_image_conditional.py",
            "--trained_models_folder", "results/ddpm_gray2color",
            "--images_folder", "data/gray2color_32",
            "--config", "train/configs/ddpm_image_conditional_gray2color.yaml",
            "--ddim_sampling_timesteps", "50",
        ],
    },
    {
        "results": "results/ddpm_text_colors",
        "cmd": [
            "python", "sampling_text_conditional.py",
            "--trained_models_folder", "results/ddpm_text_colors",
            "--embedding_file", "data/color_captions_32/text_embeddings.pkl",
            "--images_folder", "data/color_captions_32/target",
            "--config", "train/configs/ddpm_text_conditional_colors.yaml",
            "--ddim_sampling_timesteps", "50",
        ],
    },
]


def find_inception_weights(weights_dir: Path):
    pats = ["pt_inception*.pth", "*inception*.pth", "*.pth", "*.pt"]
    for pat in pats:
        hits = sorted(weights_dir.glob(pat))
        if hits:
            return hits[0]
    raise FileNotFoundError(
        f"no .pth/.pt inception state dict under {weights_dir}"
    )


def make_standin_state_dict(path: Path):
    """Random-init torch state dict with the exact pytorch-fid schema
    (built from the oracle architecture) — the dry-run stand-in."""
    import torch
    from test_torch_oracle_models import TInceptionV3

    g = torch.Generator().manual_seed(77)
    oracle = TInceptionV3()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g)
                               * (0.5 / m.weight[0].numel() ** 0.5))
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
            elif isinstance(m, torch.nn.Linear):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.01)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.01)
    torch.save(oracle.state_dict(), path)
    return path


def validate_conversion(weights_path: Path) -> bool:
    """Convert and compare against the torch oracle at the parity-test
    tolerances. Returns True when the state dict fits the oracle
    architecture (pytorch-fid schema); False (with a warning) otherwise."""
    import torch
    import jax.numpy as jnp
    from test_torch_oracle_models import TInceptionV3
    from diffusion_models_tpu.models.inception import InceptionV3

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    oracle = TInceptionV3()
    try:
        oracle.load_state_dict(sd, strict=True)
    except RuntimeError as e:
        print(f"  [validate] state dict does not match the pytorch-fid "
              f"oracle schema ({str(e)[:120]}...) — skipping activation "
              f"validation (conversion itself may still work, e.g. "
              f"torchvision weights)")
        return False
    oracle.eval()

    rs = np.random.RandomState(22)
    x = rs.rand(2, 299, 299, 3).astype(np.float32)
    with torch.no_grad():
        tpool, tlogits = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))

    net = InceptionV3(fid_variant=True)
    params = net.load_torch_state_dict(sd)
    pool, logits = net.apply(params, jnp.asarray(x), resize=False)
    np.testing.assert_allclose(np.asarray(pool), tpool.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), tlogits.numpy(),
                               rtol=1e-3, atol=2e-4)
    print("  [validate] converted activations match the torch oracle "
          "(rtol 1e-3 / atol 2e-4) ✓")
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights_dir", type=str, default=None)
    p.add_argument("--dry-run", action="store_true",
                   help="use a random stand-in state dict and sweep only "
                        "the last milestone with few samples")
    p.add_argument("--num_fid_samples", type=int, default=5000)
    p.add_argument("--runs", nargs="+", default=None,
                   help="restrict to these results folders")
    args = p.parse_args()

    if args.dry_run and args.weights_dir is None:
        tmp = Path(tempfile.mkdtemp(prefix="fid_rehearsal_"))
        weights = make_standin_state_dict(tmp / "pt_inception_standin.pth")
        print(f"[dry-run] stand-in state dict: {weights}")
    else:
        assert args.weights_dir, "--weights_dir required (or --dry-run)"
        weights = find_inception_weights(Path(args.weights_dir))
        print(f"inception weights: {weights}")

    validate_conversion(weights)

    sweeps = SWEEPS
    if args.runs:
        keep = set(args.runs)
        sweeps = [s for s in SWEEPS if s["results"] in keep]

    summary = {}
    for sweep in sweeps:
        results = REPO / sweep["results"]
        if not results.exists():
            print(f"[skip] {sweep['results']} (not present)")
            continue
        stats = results / "dataset_stats.npz"
        if stats.exists():
            stats.unlink()
            print(f"[stats] cleared stale {stats.relative_to(REPO)}")

        cmd = list(sweep["cmd"]) + [
            "--inception_weights", str(weights),
            "--num_fid_samples",
            str(64 if args.dry_run else args.num_fid_samples),
        ]
        if args.dry_run:
            # last committed milestone only
            from diffusion_models_tpu.utils.checkpoint import CheckpointManager

            ms = CheckpointManager(results).milestones()
            if not ms:
                print(f"[skip] {sweep['results']} (no milestones)")
                continue
            cmd += ["--milestones", str(ms[-1])]
        print(f"[sweep] {' '.join(cmd)}")
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        tail = "\n".join(proc.stdout.strip().splitlines()[-6:])
        print(tail)
        if proc.returncode != 0:
            print(proc.stderr[-2000:])
            raise SystemExit(f"sweep failed for {sweep['results']}")
        summary[sweep["results"]] = tail

    out = REPO / "results" / (
        "fid_rehearsal_dryrun.json" if args.dry_run else "fid_absolute.json"
    )
    out.write_text(json.dumps(summary, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
