"""FID and Inception-Score evaluation on TPU.

Capability parity with the reference evaluators:
  - `FIDEvaluation` (`fid_evaluation.py:15-133`): InceptionV3 block-2048 pool
    features, real-dataset stats cached to `dataset_stats.npz` (same keys
    m2/s2), Fréchet distance on a provided fake-sample stack.
  - `InceptionScoreEvaluation` (`inception_score_evaluation.py:11-114`):
    inception logits with ImageNet normalization at 299², IS = exp(E KL),
    appended to `inception_score_log.txt`.

TPU-native: both use the single in-repo JAX `InceptionV3`
(`models/inception.py`) — feature extraction is one jitted program per batch
size, images stay NHWC on device; only the O(D²) covariance / sqrtm runs on
host (NumPy/SciPy), as in the reference.

Pretrained weights are a file input (`weights_path`, a pytorch-fid
`pt_inception-2015-12-05-*.pth` or torchvision `inception_v3` state dict);
without them the evaluators still run (random features) for pipeline tests,
with a loud warning since scores are then meaningless.
"""

from __future__ import annotations

import math
import warnings
from functools import partial
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_models_tpu.models.inception import InceptionV3


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (Dowson–Landau 1982):
    ||μ1−μ2||² + tr(Σ1 + Σ2 − 2(Σ1Σ2)^{1/2})."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


class _InceptionRunner:
    """Shared jitted feature/logit extraction."""

    def __init__(self, weights_path=None, fid_variant: bool = True):
        self.net = InceptionV3(fid_variant=fid_variant)
        if weights_path is not None:
            self.params = self.net.load_torch_state_dict(weights_path)
            self.pretrained = True
        else:
            warnings.warn(
                "No Inception weights provided — FID/IS will use RANDOM "
                "features (pipeline smoke only, scores are meaningless). "
                "Pass weights_path pointing at a pytorch-fid or torchvision "
                "inception state dict for real scores."
            )
            self.params = self.net.init_random(jax.random.PRNGKey(0))
            self.pretrained = False

        @partial(jax.jit, static_argnames=("mode",))
        def _run(params, x, mode):
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)
            if mode == "fid":
                pool, _ = self.net.apply(params, x, resize=True, normalize=True)
                return pool
            # IS: ImageNet normalization on [0,1] inputs, resize first
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
            _, logits = self.net.apply(params, x, resize=False, normalize=False)
            return jax.nn.softmax(logits, axis=-1)

        self._run = _run

    def pool_features(self, batch_01_nhwc) -> np.ndarray:
        x = jnp.asarray(batch_01_nhwc, jnp.float32)
        return np.asarray(self._run(self.params, x, "fid"))

    def probs(self, batch_01_nhwc) -> np.ndarray:
        x = jnp.asarray(batch_01_nhwc, jnp.float32)
        return np.asarray(self._run(self.params, x, "is"))


class FIDEvaluation:
    def __init__(
        self,
        batch_size,
        data_loader=None,
        stats_dir="./results",
        num_fid_samples: int = 50000,
        weights_path=None,
        runner: _InceptionRunner | None = None,
    ):
        """`data_loader`: an item-level dataset (with .get/__len__) or an
        iterator of [0,1] NHWC numpy batches — used once to compute real
        stats, then cached."""
        self.batch_size = batch_size
        self.n_samples = num_fid_samples
        self.dl = data_loader
        self.stats_dir = Path(stats_dir)
        self.stats_dir.mkdir(parents=True, exist_ok=True)
        self.runner = runner or _InceptionRunner(weights_path)
        self.dataset_stats_loaded = False

    def _real_batches(self):
        if hasattr(self.dl, "get"):
            n = min(self.n_samples, len(self.dl))
            for i in range(0, n, self.batch_size):
                idxs = range(i, min(i + self.batch_size, n))
                items = [self.dl.get(j) for j in idxs]
                # conditional datasets yield (target, cond) — FID is on targets
                items = [it[0] if isinstance(it, tuple) else it for it in items]
                yield np.stack(items)
        else:
            remaining = self.n_samples
            for batch in self.dl:
                if isinstance(batch, tuple):
                    batch = batch[0]
                yield np.asarray(batch)[:remaining]
                remaining -= len(batch)
                if remaining <= 0:
                    break

    def load_or_precalc_dataset_stats(self):
        path = self.stats_dir / "dataset_stats.npz"
        if path.exists():
            ckpt = np.load(path)
            self.m2, self.s2 = ckpt["m2"], ckpt["s2"]
            ckpt.close()
        else:
            feats = [self.runner.pool_features(b) for b in self._real_batches()]
            feats = np.concatenate(feats, axis=0)
            self.m2 = np.mean(feats, axis=0)
            self.s2 = np.cov(feats, rowvar=False)
            # multi-host: every process computes the stats (host-side numpy,
            # identical inputs) but only process 0 writes the cache — two
            # processes racing on one npz corrupts it
            if jax.process_index() == 0:
                np.savez_compressed(path, m2=self.m2, s2=self.s2)
        self.dataset_stats_loaded = True

    def fid_score(self, fake_samples) -> float:
        """fake_samples: [0,1] NHWC stack (numpy or jax array)."""
        if not self.dataset_stats_loaded:
            self.load_or_precalc_dataset_stats()
        fake_samples = np.asarray(fake_samples)
        feats = []
        for i in range(0, len(fake_samples), self.batch_size):
            feats.append(self.runner.pool_features(fake_samples[i : i + self.batch_size]))
        feats = np.concatenate(feats, axis=0)
        m1 = np.mean(feats, axis=0)
        s1 = np.cov(feats, rowvar=False)
        return calculate_frechet_distance(m1, s1, self.m2, self.s2)


class InceptionScoreEvaluation:
    def __init__(
        self,
        batch_size,
        log_file="./results/inception_score_log.txt",
        weights_path=None,
        runner: _InceptionRunner | None = None,
    ):
        self.batch_size = batch_size
        self.log_path = Path(log_file)
        self.log_path.parent.mkdir(parents=True, exist_ok=True)
        self.runner = runner or _InceptionRunner(weights_path, fid_variant=False)

    def calculate_inception_score(self, fake_samples, step=None):
        """fake_samples: [0,1] NHWC stack. Returns (IS, 0.0) — the reference
        computes a single unsplit IS (`inception_score_evaluation.py:97-104`)."""
        fake_samples = np.asarray(fake_samples)
        preds = []
        for i in range(0, len(fake_samples), self.batch_size):
            preds.append(self.runner.probs(fake_samples[i : i + self.batch_size]))
        preds = np.concatenate(preds, axis=0)

        p_y = preds.mean(axis=0)
        eps = 1e-10
        kl = preds * (np.log(preds + eps) - np.log(p_y + eps))
        inception_score = math.exp(float(kl.sum(axis=1).mean()))

        if jax.process_index() == 0:
            try:
                with open(self.log_path, "a") as f:
                    f.write(f"{inception_score}\n")
            except OSError:
                pass
        return inception_score, 0.0
