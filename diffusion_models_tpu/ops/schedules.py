"""Diffusion noise schedules and precomputed coefficient tables.

TPU-native design: instead of the reference's torch `register_buffer` tensors
(`denoising_diffusion/denoising_diffusion.py:499-557`), the full coefficient
set lives in a single frozen `DiffusionSchedule` pytree of f32 `jnp` arrays.
All schedule math is done host-side in NumPy float64 (matching the reference's
f64 init at `denoising_diffusion.py:406,414,427`) and cast to f32 once, so the
numerics are identical while the arrays are jit-closure-friendly constants
that XLA folds straight into compiled programs.

Schedule formulas mirror:
  - linear:  `denoising_diffusion.py:399-406`
  - cosine:  `denoising_diffusion.py:408-418`
  - sigmoid: `denoising_diffusion.py:420-433`
  - buffers: `denoising_diffusion.py:503-527`
  - loss weights (ddpm flag / min-SNR): `denoising_diffusion.py:540-557`
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Original DDPM linear schedule, rescaled so the endpoints match T=1000."""
    scale = 1000 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule from Improved DDPM (Nichol & Dhariwal 2021)."""
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    alphas_cumprod = np.cos((t + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int,
    start: float = -3,
    end: float = 3,
    tau: float = 1,
    clamp_min: float = 1e-5,
) -> np.ndarray:
    """Sigmoid schedule (https://arxiv.org/abs/2212.11972, Fig. 8)."""
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps

    def _sigmoid(x):
        return 1 / (1 + np.exp(-x))

    v_start = _sigmoid(start / tau)
    v_end = _sigmoid(end / tau)
    alphas_cumprod = (-_sigmoid((t * (end - start) + start) / tau) + v_end) / (
        v_end - v_start
    )
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


BETA_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


@struct.dataclass
class DiffusionSchedule:
    """All diffusion coefficient tables, each of shape (T,), dtype f32.

    A frozen pytree: safe to close over in jitted functions (XLA constant-folds
    the gathers) or to pass as an argument when schedules vary.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    loss_weight: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    timesteps: int,
    beta_schedule: str = "linear",
    schedule_fn_kwargs: dict | None = None,
    objective: str = "pred_noise",
    ddpm: bool = True,
    min_snr_loss_weight: bool = False,
    min_snr_gamma: float = 5,
) -> DiffusionSchedule:
    """Build the full coefficient table set in f64, cast once to f32."""
    if beta_schedule not in BETA_SCHEDULES:
        raise ValueError(f"unknown beta schedule {beta_schedule}")
    betas = BETA_SCHEDULES[beta_schedule](timesteps, **(schedule_fn_kwargs or {}))
    # The rescaled linear schedule is degenerate for small T (beta_end =
    # (1000/T)*0.02 >= 1 when T <= 20), which silently fills the posterior
    # coefficient tables with NaN. Fail loudly instead of training on NaN.
    if np.any(betas >= 1.0) or np.any(betas <= 0.0):
        raise ValueError(
            f"beta schedule '{beta_schedule}' with T={timesteps} produced "
            f"betas outside (0, 1) (max={betas.max():.4g}); the linear "
            "schedule needs T large enough that (1000/T)*0.02 < 1 — "
            "use T >= 100 or the cosine schedule for small T"
        )

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    if ddpm:
        # Original-DDPM simple loss: unit weight for every timestep.
        loss_weight = np.ones(timesteps, dtype=np.float64)
    else:
        snr = alphas_cumprod / (1 - alphas_cumprod)
        maybe_clipped_snr = snr.copy()
        if min_snr_loss_weight:
            maybe_clipped_snr = np.minimum(maybe_clipped_snr, min_snr_gamma)
        if objective == "pred_noise":
            loss_weight = maybe_clipped_snr / snr
        elif objective == "pred_x0":
            loss_weight = maybe_clipped_snr
        elif objective == "pred_v":
            loss_weight = maybe_clipped_snr / (snr + 1)
        else:
            raise ValueError(f"unknown objective {objective}")

    as_f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=as_f32(betas),
        alphas_cumprod=as_f32(alphas_cumprod),
        alphas_cumprod_prev=as_f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=as_f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=as_f32(posterior_variance),
        posterior_log_variance_clipped=as_f32(
            np.log(np.maximum(posterior_variance, 1e-20))
        ),
        posterior_mean_coef1=as_f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=as_f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        loss_weight=as_f32(loss_weight),
    )


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to an `ndim` tensor.

    Equivalent of the reference's `extract` (`denoising_diffusion.py:394-397`)
    — `a[t]` reshaped to (B, 1, 1, ..., 1) so it broadcasts over image dims.
    """
    out = a[t]
    return out.reshape(t.shape + (1,) * (ndim - 1))
