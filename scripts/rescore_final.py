"""Re-score a trained run's final milestone at high sample count with
multiple sampler seeds (VERDICT round-2 item 5: the n=1000 milestone FIDs
carry a 1.3–8.1 noise band; headline comparisons need n≥5000 and error
bars; reference protocol defaults to 50k fakes,
`denoising_diffusion.py:964`).

Reuses the family's own training entry point (`train.<entry>.build`) and
the Trainer's EMA sampling + FID plumbing, so the rescore measures exactly
what training measured — only with more samples, fresh high-n real-dataset
statistics (cached separately from the training-time 1000-sample stats),
and one FID per seed.

    python scripts/rescore_final.py --entry train_ddpm \
        --config train/configs/ddpm_natural32.yaml \
        --n 5000 --seeds 101 202 303
"""

import argparse
import importlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entry", required=True,
                    help="train entry module, e.g. train_ddpm, train_ddpm_cfg,"
                         " train_ldm, train_ldm_image_conditional")
    ap.add_argument("--config", required=True)
    ap.add_argument("--milestone", default=None,
                    help="int milestone (default: highest found)")
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--seeds", type=int, nargs="+", default=[101, 202, 303])
    ap.add_argument("--real_n", type=int, default=20000,
                    help="real samples for the dataset stats (capped at the"
                         " dataset size)")
    ap.add_argument("--out", default=None,
                    help="output JSON (default <results>/rescore.json)")
    ap.add_argument("--sampling_method", default=None, choices=["ddim", "dpmpp"],
                    help="override the trained config's sampler for this "
                         "rescore (round-3 verdict item 6: put a quality "
                         "number on DPM-Solver++(2M))")
    ap.add_argument("--sampling_timesteps", type=int, default=None,
                    help="override the sampler step count for this rescore")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dmt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from diffusion_models_tpu.training.evaluation import (
        FIDEvaluation,
        InceptionScoreEvaluation,
    )
    from diffusion_models_tpu.utils.config import load_config

    mod = importlib.import_module(f"train.{args.entry}")
    cfg = load_config(args.config)
    # entry build() signatures vary: (unet, diffusion, trainer) for the
    # pixel families, (diffusion, trainer) for the LDM ones
    trainer = mod.build(cfg)[-1]

    milestone = args.milestone
    if milestone is None:
        ms = trainer.ckpt.milestones()
        assert ms, f"no milestones in {trainer.results_folder}"
        milestone = max(ms)
    else:
        milestone = int(milestone)
    trainer.load(milestone, params_only=True)

    # sampler overrides: applied before the first _jit_sample trace (the
    # trainer jits with `self` static, so mutation after a trace would be
    # silently stale — here nothing has been traced yet)
    diff = trainer.diffusion
    if args.sampling_method is not None:
        # sample() only consults sampling_method when is_ddim_sampling is
        # True (fixed at construction, gaussian.py) — without this guard a
        # full-step ancestral run would silently ignore the override while
        # the artifact below records "sampling_method": "dpmpp"
        assert diff.is_ddim_sampling, (
            "--sampling_method override requires a DDIM/DPM++-configured "
            "process (sampling_timesteps < timesteps); a full-step config "
            "would silently ignore it")
        diff.sampling_method = args.sampling_method
    if args.sampling_timesteps is not None:
        assert diff.is_ddim_sampling, (
            "step-count override requires a DDIM/DPM++-configured process")
        diff.sampling_timesteps = args.sampling_timesteps

    # fresh high-n real stats, cached separately from the training-time ones
    stats_dir = trainer.results_folder / f"rescore_stats_n{args.real_n}"
    fid_scorer = FIDEvaluation(
        batch_size=trainer.batch_size,
        data_loader=trainer.dataset,
        stats_dir=stats_dir,
        num_fid_samples=args.real_n,
        weights_path=trainer.inception_weights,
    )

    # reference eval protocol is FID+IS (`inception_score_evaluation.py:52`);
    # round-3 verdict item 9: report both per seed in the artifact
    is_scorer = InceptionScoreEvaluation(
        batch_size=trainer.batch_size,
        log_file=stats_dir / "inception_score_log.txt",
        weights_path=trainer.inception_weights,
    )

    fids, is_scores = [], []
    for seed in args.seeds:
        fakes = trainer.generate_samples(args.n, rng_seed=seed)
        fid = float(fid_scorer.fid_score(fakes))
        is_score, _ = is_scorer.calculate_inception_score(fakes)
        fids.append(fid)
        is_scores.append(float(is_score))
        print(f"milestone {milestone} seed {seed}: FID {fid:.4f} "
              f"IS {is_score:.4f} (n={args.n})")

    rec = {
        "config": args.config,
        "entry": args.entry,
        "milestone": int(milestone),
        "n": args.n,
        "real_n": args.real_n,
        "seeds": args.seeds,
        "sampling_method": getattr(diff, "sampling_method", "ddim"),
        "sampling_timesteps": getattr(diff, "sampling_timesteps", None),
        "fids": fids,
        "fid_mean": float(np.mean(fids)),
        "fid_std": float(np.std(fids)),
        "is_scores": is_scores,
        "is_mean": float(np.mean(is_scores)),
        "is_std": float(np.std(is_scores)),
    }
    out = Path(args.out or trainer.results_folder / "rescore.json")
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
