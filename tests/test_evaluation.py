"""Tests for the FID/IS eval stack (random inception weights — the math and
caching behavior are exact; the scores are only meaningful with pretrained
weights)."""

import numpy as np
import pytest
import jax

from diffusion_models_tpu.training.evaluation import (
    FIDEvaluation,
    InceptionScoreEvaluation,
    _InceptionRunner,
    calculate_frechet_distance,
)


def test_frechet_distance_identical_is_zero():
    rs = np.random.RandomState(0)
    mu = rs.randn(8)
    a = rs.randn(64, 8)
    sigma = np.cov(a, rowvar=False)
    d = calculate_frechet_distance(mu, sigma, mu.copy(), sigma.copy())
    assert abs(d) < 1e-6


def test_frechet_distance_mean_shift():
    mu1 = np.zeros(4)
    mu2 = np.ones(4) * 2.0
    sigma = np.eye(4)
    d = calculate_frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(d, 16.0, rtol=1e-6)  # ||mu1-mu2||^2


@pytest.fixture(scope="module")
def runner():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return _InceptionRunner(weights_path=None)


def test_inception_feature_shapes(runner):
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    feats = runner.pool_features(x)
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(feats))
    probs = runner.probs(x)
    assert probs.shape == (2, 1008)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)


def test_inception_grayscale_broadcast(runner):
    x = np.random.RandomState(0).rand(2, 32, 32, 1).astype(np.float32)
    feats = runner.pool_features(x)
    assert feats.shape == (2, 2048)


@pytest.mark.slow
def test_fid_stats_caching(tmp_path, runner):
    class FakeDS:
        def __len__(self):
            return 8

        def get(self, i, rng=None):
            rs = np.random.RandomState(i)
            return rs.rand(32, 32, 3).astype(np.float32)

    fid = FIDEvaluation(
        batch_size=4, data_loader=FakeDS(), stats_dir=tmp_path,
        num_fid_samples=8, runner=runner,
    )
    fakes = np.random.RandomState(9).rand(8, 32, 32, 3).astype(np.float32)
    score1 = fid.fid_score(fakes)
    assert (tmp_path / "dataset_stats.npz").exists()
    assert np.isfinite(score1)

    # second evaluator must load the cached stats (no dataset access)
    fid2 = FIDEvaluation(
        batch_size=4, data_loader=None, stats_dir=tmp_path,
        num_fid_samples=8, runner=runner,
    )
    score2 = fid2.fid_score(fakes)
    np.testing.assert_allclose(score1, score2, rtol=1e-4)


def test_inception_score_logging(tmp_path, runner):
    is_eval = InceptionScoreEvaluation(
        batch_size=4, log_file=tmp_path / "is.txt", runner=runner
    )
    fakes = np.random.RandomState(3).rand(8, 32, 32, 3).astype(np.float32)
    score, _ = is_eval.calculate_inception_score(fakes)
    # IS >= 1 mathematically; allow f32 rounding just below 1
    assert np.isfinite(score) and score > 0.999
    assert (tmp_path / "is.txt").exists()
