"""DDPM / DDIM diffusion process as pure, jittable functions.

Capability parity with the reference `DenoisingDiffusion`
(`denoising_diffusion/denoising_diffusion.py:435-900`): pred_noise / pred_x0 /
pred_v objectives, linear/cosine/sigmoid schedules, ancestral and DDIM
sampling, self-conditioning, offset noise, min-SNR weighting, hybrid
(Improved-DDPM) loss, immiscible-noise assignment, and interpolation.

TPU-native design decisions (deliberately NOT a port of the torch class):

  - The reference drives its reverse loops from host Python, one kernel-launch
    set per timestep (`p_sample_loop` at :648, `ddim_sample` at :667). Here
    both loops are a single `jax.lax.scan` over the timestep axis inside one
    jitted function: the whole 1000-step (or S-step DDIM) chain compiles to
    one XLA program with zero host round-trips.
  - Stochasticity is explicit: every entry point takes a PRNG key and splits
    it functionally (no global RNG). Self-conditioning's coin flip
    (reference `random() < 0.5` at :845) becomes a `bernoulli` + `lax.cond`.
  - All schedule gathers come from the frozen `DiffusionSchedule` pytree, so
    XLA constant-folds them into the compiled step.
  - q_sample and the loss run in f32 (matching the reference's
    autocast-disabled fp32 q_sample at :811) while the inner U-Net runs bf16.
  - `cond` is a generic pytree threaded through to the model, which is how the
    image-/text-conditional subclasses specialize without copying samplers.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import os

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_models_tpu.ops.schedules import DiffusionSchedule, extract, make_schedule
from diffusion_models_tpu.utils.helpers import (
    default,
    exists,
    identity,
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
)


class ModelPrediction(NamedTuple):
    pred_noise: jnp.ndarray
    pred_x_start: jnp.ndarray


def route_for_inference(model):
    """Route a denoiser module through the fused Pallas LinearAttention
    block kernel (`ops/pallas/linear_attn_block.py`, the head-folded v2
    kernel with analytic backward). On TPU, 2-D Unets are cloned with
    `fused_attn_block=True` so every LinearAttention site runs the whole
    block (pre-norm → qkv → both softmaxes → contractions → out-proj →
    out-norm → residual) as one VMEM-resident program. This is the
    DEFAULT for BOTH sampling and training — measured on v5e at the
    flagship shapes: +24% DDIM-50 sampling throughput and +20.6% on the
    clean-chip bs256 train step (honest idle-chip A/B; see
    docs/ROUND3_NOTES.md), with HBM traffic per call roughly halved.

    Multi-device envelope: the kernel itself is batch-tiled and rides a
    `jax.shard_map` over the data axis when the Trainer has registered its
    mesh (`linear_attn_block.set_fused_mesh` — pure-DP only; fsdp/tp shard
    the weights and keep the plain-XLA path). Without a registered mesh,
    multi-device programs keep plain XLA, which GSPMD shards natively.

    The clone only reroutes ops — the param tree is identical. Models
    without the field (UViT, Unet1D, KarrasUnetND) and CPU backends are
    returned unchanged; DMT_PALLAS_LINATTN=0 disables globally."""
    if (
        getattr(model, "fused_attn_block", False) is None
        and jax.default_backend() == "tpu"
        and os.environ.get("DMT_PALLAS_LINATTN") != "0"
    ):
        if jax.device_count() == 1:
            return model.clone(fused_attn_block=True)
        from diffusion_models_tpu.ops.pallas.linear_attn_block import (
            get_fused_mesh,
        )

        if get_fused_mesh() is not None:
            return model.clone(fused_attn_block=True)
    return model


class GaussianDiffusion:
    """Diffusion process wrapper around a denoiser `flax.linen` module.

    All methods are pure in (params, rng, data) and safe to `jax.jit` /
    `pjit`; the object itself only holds static config plus the schedule
    pytree.
    """

    def __init__(
        self,
        model,
        *,
        image_size,
        timesteps: int = 1000,
        sampling_timesteps: Optional[int] = None,
        objective: str = "pred_noise",
        beta_schedule: str = "linear",
        schedule_fn_kwargs: Optional[dict] = None,
        ddim_sampling_eta: float = 0.0,
        auto_normalize: bool = True,
        offset_noise_strength: float = 0.0,
        min_snr_loss_weight: bool = False,
        min_snr_gamma: float = 5,
        immiscible: bool = False,
        immiscible_mode: str = "hungarian",
        ddpm: bool = True,
        hybrid_loss: bool = False,
        remat: bool = False,
        use_pallas: bool = False,
        sampling_method: str = "ddim",
    ):
        self.model = model
        self.channels = model.channels
        self.self_condition = getattr(model, "self_condition", False)

        if isinstance(image_size, int):
            image_size = (image_size, image_size)
        assert (
            isinstance(image_size, (tuple, list)) and len(image_size) == 2
        ), "image size must be an integer or a tuple/list of two integers"
        self.image_size = tuple(image_size)

        assert objective in {"pred_noise", "pred_x0", "pred_v"}
        self.objective = objective

        self.num_timesteps = int(timesteps)
        self.beta_schedule = beta_schedule
        self.sampling_timesteps = default(sampling_timesteps, timesteps)
        assert self.sampling_timesteps <= timesteps
        self.is_ddim_sampling = self.sampling_timesteps < timesteps
        self.ddim_sampling_eta = ddim_sampling_eta
        assert sampling_method in {"ddim", "dpmpp"}
        self.sampling_method = sampling_method

        self.schedule: DiffusionSchedule = make_schedule(
            timesteps,
            beta_schedule=beta_schedule,
            schedule_fn_kwargs=schedule_fn_kwargs,
            objective=objective,
            ddpm=ddpm,
            min_snr_loss_weight=min_snr_loss_weight,
            min_snr_gamma=min_snr_gamma,
        )

        self.offset_noise_strength = offset_noise_strength
        self.immiscible = immiscible
        assert immiscible_mode in ("hungarian", "greedy")
        self.immiscible_mode = immiscible_mode
        self.hybrid_loss = hybrid_loss
        # rematerialization: recompute denoiser activations in the backward
        # pass instead of storing them — trades FLOPs for HBM, the standard
        # TPU lever for denoisers too large to fit activations at full batch
        self.remat = remat
        # opt-in fused Pallas kernels for the elementwise endpoints of the
        # train/sample hot paths (q_sample, per-sample MSE, DDIM update).
        # Non-default: measured on TPU v5e at the bench shapes, XLA's own
        # fusion of these chains is within noise of the hand-written kernels
        # (see docs/ROUND2_NOTES.md), so the simpler XLA path stays default.
        self.use_pallas = use_pallas

        self.normalize = normalize_to_neg_one_to_one if auto_normalize else identity
        self.unnormalize = unnormalize_to_zero_to_one if auto_normalize else identity
        self._eval_model = None  # lazily built by _model_for(train=False)
        self._train_model = None  # lazily built by _model_for(train=True)

    def _model_for(self, train: bool):
        """The module to apply. Both inference and training route 2-D
        Unets through the fused Pallas LinearAttention block on TPU
        (`models/unet.py::Unet.fused_attn_block`): measured +24% DDIM-50
        sampling and +20.6% clean-chip train-step throughput on v5e (the
        analytic backward kernel; honest idle-chip A/B, ROUND3_NOTES).
        Multi-device: rides shard_map over the data axis when the Trainer
        registered its mesh (see `route_for_inference`). Same param tree
        either way; DMT_PALLAS_LINATTN=0 disables globally."""
        if train:
            if self._train_model is None:
                self._train_model = route_for_inference(self.model)
            return self._train_model
        if self._eval_model is None:
            self._eval_model = route_for_inference(self.model)
        return self._eval_model

    # ------------------------------------------------------------------ init

    def sample_shape(self, batch_size: int) -> tuple:
        h, w = self.image_size
        return (batch_size, h, w, self.channels)

    def init(self, rng, batch_size: int = 1, cond=None):
        """Initialize denoiser parameters (NHWC dummy batch). `cond` must be
        an example conditioning pytree for conditional models so all params
        materialize."""
        x = jnp.zeros(self.sample_shape(batch_size), jnp.float32)
        t = jnp.zeros((batch_size,), jnp.int32)
        params_rng, dropout_rng = jax.random.split(rng)
        cond = default(cond, self.example_cond(batch_size))
        rngs = {"params": params_rng, "dropout": dropout_rng}
        # jit the init: eager init issues hundreds of tiny ops, which is
        # pathological over a remote-compile TPU attach; one jitted program
        # compiles once.
        if cond is None:
            variables = jax.jit(self.model.init)(rngs, x, t)
        else:
            variables = jax.jit(self.model.init)(rngs, x, t, None, cond)
        return variables["params"]

    def example_cond(self, batch_size: int):
        """Example conditioning pytree for parameter init (None = uncond)."""
        return None

    # ------------------------------------------------------- model interface

    def _apply_model(self, params, x, t, x_self_cond, cond, *, train, rng):
        """Single denoiser call. `cond` is an arbitrary conditioning pytree
        (image map, text embedding, ...) passed straight to the network —
        this one hook is how every conditional variant specializes without
        duplicating the samplers (unlike the reference, which copies
        p_sample/ddim_sample per conditional class)."""
        rngs = {"dropout": rng} if rng is not None else None

        # statics (train flag, rng dict structure, cond presence) live in the
        # closure so jax.checkpoint only sees array arguments
        mdl = self._model_for(train)
        if cond is None:
            fwd = lambda p, x_, t_, sc: mdl.apply(
                {"params": p}, x_, t_, sc, train=train, rngs=rngs
            )
            args = (params, x, t, x_self_cond)
        else:
            fwd = lambda p, x_, t_, sc, c_: mdl.apply(
                {"params": p}, x_, t_, sc, c_, train=train, rngs=rngs
            )
            args = (params, x, t, x_self_cond, cond)

        if self.remat and train:
            fwd = jax.checkpoint(fwd)
        return fwd(*args).astype(jnp.float32)

    # --------------------------------------------------------- pure numerics

    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        nd = x_t.ndim
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        s = self.schedule
        nd = x_t.ndim
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
        ) / extract(s.sqrt_recipm1_alphas_cumprod, t, nd)

    def predict_v(self, x_start, t, noise):
        s = self.schedule
        nd = x_start.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * noise
            - extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        s = self.schedule
        nd = x_t.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * x_t
            - extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    def q_posterior(self, x_start, x_t, t):
        s = self.schedule
        nd = x_t.ndim
        posterior_mean = (
            extract(s.posterior_mean_coef1, t, nd) * x_start
            + extract(s.posterior_mean_coef2, t, nd) * x_t
        )
        posterior_variance = extract(s.posterior_variance, t, nd)
        posterior_log_variance = extract(s.posterior_log_variance_clipped, t, nd)
        return posterior_mean, posterior_variance, posterior_log_variance

    def _noise_assignment(self, x_start, noise):
        """Immiscible diffusion: match noise draws to data points
        (reference `noise_assignment` at :805-809 uses scipy Hungarian).

        Two modes:
          - 'hungarian': exact, via a host pure_callback (O(B³) scalar work
            that does not belong on the MXU; matches the reference exactly,
            but blocks the device pipeline on the host round-trip).
          - 'greedy': in-jit greedy matching (B argmins over the B×B cost
            matrix inside a fori_loop) — near-optimal in practice and keeps
            the whole train step on-device. TPU-native default choice for
            production runs."""
        b = x_start.shape[0]
        xf = x_start.reshape(b, -1)
        nf = noise.reshape(b, -1)
        dist = jnp.sqrt(
            jnp.maximum(
                jnp.sum(xf**2, 1)[:, None]
                - 2 * xf @ nf.T
                + jnp.sum(nf**2, 1)[None, :],
                0.0,
            )
        )

        if self.immiscible_mode == "greedy":
            def body(_, carry):
                d, assign = carry
                flat_idx = jnp.argmin(d)
                r, c = flat_idx // b, flat_idx % b
                assign = assign.at[r].set(c)
                d = d.at[r, :].set(jnp.inf).at[:, c].set(jnp.inf)
                return d, assign

            _, assign = jax.lax.fori_loop(
                0, b, body, (dist, jnp.zeros((b,), jnp.int32))
            )
            return assign

        from scipy.optimize import linear_sum_assignment  # host-side only

        def host_assign(d):
            _, assign = linear_sum_assignment(np.asarray(d))
            return assign.astype(np.int32)

        return jax.pure_callback(
            host_assign, jax.ShapeDtypeStruct((b,), np.int32), dist
        )

    def q_sample(self, x_start, t, noise, rng=None):
        """Forward diffusion q(x_t | x_0); always f32
        (reference forces fp32 via disabled autocast at :811)."""
        x_start = x_start.astype(jnp.float32)
        noise = noise.astype(jnp.float32)
        if self.immiscible:
            assign = self._noise_assignment(x_start, noise)
            noise = noise[assign]
        s = self.schedule
        if self.use_pallas:
            from diffusion_models_tpu.ops.pallas.q_sample import fused_q_sample

            return fused_q_sample(
                x_start, noise,
                s.sqrt_alphas_cumprod[t], s.sqrt_one_minus_alphas_cumprod[t],
            )
        nd = x_start.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    # ------------------------------------------------------------ prediction

    def model_predictions(
        self,
        params,
        x,
        t,
        x_self_cond=None,
        cond=None,
        clip_x_start: bool = False,
        rederive_pred_noise: bool = False,
        *,
        train: bool = False,
        rng=None,
    ) -> ModelPrediction:
        model_output = self._apply_model(
            params, x, t, x_self_cond, cond, train=train, rng=rng
        )
        return self._predictions_from_output(
            model_output, x, t, clip_x_start, rederive_pred_noise
        )

    def _predictions_from_output(
        self, model_output, x, t, clip_x_start: bool, rederive_pred_noise: bool
    ) -> ModelPrediction:
        """(model output, x_t, t) → (pred_noise, x_start) per objective."""
        maybe_clip = (
            (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)
        )

        if self.objective == "pred_noise":
            pred_noise = model_output
            x_start = self.predict_start_from_noise(x, t, pred_noise)
            x_start = maybe_clip(x_start)
            if clip_x_start and rederive_pred_noise:
                pred_noise = self.predict_noise_from_start(x, t, x_start)
        elif self.objective == "pred_x0":
            x_start = maybe_clip(model_output)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # pred_v
            x_start = maybe_clip(self.predict_start_from_v(x, t, model_output))
            pred_noise = self.predict_noise_from_start(x, t, x_start)

        return ModelPrediction(pred_noise, x_start)

    def p_mean_variance(
        self, params, x, t, x_self_cond=None, cond=None, clip_denoised: bool = True,
        *, train: bool = False, rng=None,
    ):
        preds = self.model_predictions(
            params, x, t, x_self_cond, cond, train=train, rng=rng
        )
        x_start = preds.pred_x_start
        if clip_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        model_mean, posterior_variance, posterior_log_variance = self.q_posterior(
            x_start, x, t
        )
        return model_mean, posterior_variance, posterior_log_variance, x_start

    # -------------------------------------------------------------- sampling

    def p_sample_loop(
        self, params, rng, shape, cond=None, return_all_timesteps: bool = False
    ):
        """Ancestral DDPM sampling — one `lax.scan` over all T steps."""
        batch = shape[0]
        rng, init_key = jax.random.split(rng)
        img0 = jax.random.normal(init_key, shape, jnp.float32)

        def step(carry, t):
            img, x_start, key = carry
            key, noise_key = jax.random.split(key)
            t_b = jnp.full((batch,), t, jnp.int32)
            self_cond = x_start if self.self_condition else None
            model_mean, _, model_log_variance, x_start = self.p_mean_variance(
                params, img, t_b, self_cond, cond, clip_denoised=True
            )
            noise = jax.random.normal(noise_key, shape, jnp.float32)
            # no noise at t == 0
            noise = jnp.where(t > 0, noise, 0.0)
            img = model_mean + jnp.exp(0.5 * model_log_variance) * noise
            return (img, x_start, key), (img if return_all_timesteps else None)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (img, _, _), imgs = jax.lax.scan(step, (img0, jnp.zeros_like(img0), rng), ts)

        if return_all_timesteps:
            ret = jnp.concatenate([img0[:, None], jnp.moveaxis(imgs, 0, 1)], axis=1)
        else:
            ret = img
        return self.unnormalize(ret)

    def _ddim_time_pairs(self, sampling_timesteps: int):
        """Static (time, time_next) pairs: [(T-1, ...), ..., (·, -1)]
        (reference `ddim_sample` :672-674)."""
        total = self.num_timesteps
        times = np.linspace(-1, total - 1, num=sampling_timesteps + 1)
        times = list(reversed(times.astype(np.int32).tolist()))
        pairs = np.array(list(zip(times[:-1], times[1:])), dtype=np.int32)
        return jnp.asarray(pairs)

    def ddim_sample(
        self,
        params,
        rng,
        shape,
        sampling_timesteps: Optional[int] = None,
        eta: Optional[float] = None,
        cond=None,
        return_all_timesteps: bool = False,
        encoder_cache_interval: int = 1,
    ):
        """DDIM sampling — one `lax.scan` over the S step pairs.

        `encoder_cache_interval=k > 1` enables encoder propagation (Faster
        Diffusion, arXiv:2312.09608): the U-Net down-path runs only at every
        k-th ("key") step; non-key steps reuse the cached skip activations
        and recompute just init-conv + bottleneck + decoder. Approximate
        (measure the FID delta before adopting), off by default.
        """
        if encoder_cache_interval > 1:
            return self._ddim_sample_enc_cached(
                params, rng, shape, sampling_timesteps, eta, cond,
                return_all_timesteps, encoder_cache_interval,
            )
        sampling_timesteps = default(sampling_timesteps, self.sampling_timesteps)
        eta = default(eta, self.ddim_sampling_eta)
        batch = shape[0]
        s = self.schedule

        rng, init_key = jax.random.split(rng)
        img0 = jax.random.normal(init_key, shape, jnp.float32)
        pairs = self._ddim_time_pairs(sampling_timesteps)

        # the fused Pallas update computes the pred_noise clip+rederive chain
        # internally, so it applies only on that objective (and keeps x_start
        # out of the carry, so not with self-conditioning)
        fused = (
            self.use_pallas
            and self.objective == "pred_noise"
            and not self.self_condition
        )

        def step(carry, pair):
            img, x_start, key = carry
            time, time_next = pair[0], pair[1]
            key, noise_key = jax.random.split(key)

            t_b = jnp.full((batch,), time, jnp.int32)

            alpha = s.alphas_cumprod[time]
            # time_next == -1 ⇒ alpha_next = 1 ⇒ sigma = c = 0 ⇒ img = x_start,
            # exactly the reference's explicit branch at :686-688.
            alpha_next = jnp.where(
                time_next < 0, 1.0, s.alphas_cumprod[jnp.maximum(time_next, 0)]
            )

            sigma = eta * jnp.sqrt(
                jnp.maximum((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0)
            )
            c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma**2, 0.0))
            noise = jax.random.normal(noise_key, shape, jnp.float32)

            if fused:
                from diffusion_models_tpu.ops.pallas.ddim_step import (
                    fused_ddim_step,
                )

                eps_out = self._apply_model(
                    params, img, t_b, None, cond, train=False, rng=None
                )
                coefs = jnp.stack(
                    [
                        s.sqrt_recip_alphas_cumprod[time],
                        s.sqrt_recipm1_alphas_cumprod[time],
                        jnp.sqrt(alpha_next),
                        c,
                        sigma,
                    ]
                )
                img = fused_ddim_step(img, eps_out, noise, coefs)
            else:
                self_cond = x_start if self.self_condition else None
                pred_noise, x_start = self.model_predictions(
                    params, img, t_b, self_cond, cond,
                    clip_x_start=True, rederive_pred_noise=True,
                )
                img = (
                    x_start * jnp.sqrt(alpha_next)
                    + c * pred_noise
                    + sigma * noise
                )
            return (img, x_start, key), (img if return_all_timesteps else None)

        (img, _, _), imgs = jax.lax.scan(
            step, (img0, jnp.zeros_like(img0), rng), pairs
        )

        if return_all_timesteps:
            ret = jnp.concatenate([img0[:, None], jnp.moveaxis(imgs, 0, 1)], axis=1)
        else:
            ret = img
        return self.unnormalize(ret)

    def _ddim_sample_enc_cached(
        self, params, rng, shape, sampling_timesteps, eta, cond,
        return_all_timesteps, interval,
    ):
        """Encoder-propagation DDIM (arXiv:2312.09608): `lax.cond` picks the
        full forward (key steps, refreshes the encoder cache) or the
        decoder-only forward (non-key steps, reuses it)."""
        assert not self.self_condition, (
            "encoder caching assumes the denoiser input distribution shifts "
            "slowly; self-conditioning changes the encoder input every step"
        )
        assert type(self)._apply_model is GaussianDiffusion._apply_model, (
            "encoder caching calls the denoiser directly; variants with a "
            "custom _apply_model (e.g. CFG's guided 2B forward) are not "
            "supported"
        )
        # clear error instead of an opaque Flax TypeError deep inside
        # lax.cond tracing when the model can't cache (Unet1D/UViT/Karras)
        import inspect

        model_params = inspect.signature(type(self.model).__call__).parameters
        if not {"return_enc_cache", "enc_cache"} <= set(model_params):
            raise TypeError(
                f"encoder_cache_interval > 1 requires a model with "
                f"`return_enc_cache`/`enc_cache` forward kwargs (the 2D "
                f"Unet); {type(self.model).__name__} does not support it"
            )
        sampling_timesteps = default(sampling_timesteps, self.sampling_timesteps)
        eta = default(eta, self.ddim_sampling_eta)
        batch = shape[0]
        s = self.schedule

        rng, init_key = jax.random.split(rng)
        img0 = jax.random.normal(init_key, shape, jnp.float32)
        pairs = self._ddim_time_pairs(sampling_timesteps)

        eval_mdl = self._model_for(train=False)

        def full_fwd(p, x, t_b):
            out, cache = eval_mdl.apply(
                {"params": p}, x, t_b, None, *(() if cond is None else (cond,)),
                return_enc_cache=True,
            )
            return out.astype(jnp.float32), cache

        def cached_fwd(p, x, t_b, cache):
            out = eval_mdl.apply(
                {"params": p}, x, t_b, None, *(() if cond is None else (cond,)),
                enc_cache=cache,
            )
            return out.astype(jnp.float32)

        t0_b = jnp.full((batch,), self.num_timesteps - 1, jnp.int32)
        cache0 = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype),
            jax.eval_shape(full_fwd, params, img0, t0_b)[1],
        )

        def step(carry, xs):
            img, key, cache = carry
            pair, idx = xs
            time, time_next = pair[0], pair[1]
            key, noise_key = jax.random.split(key)
            t_b = jnp.full((batch,), time, jnp.int32)

            model_out, cache = jax.lax.cond(
                idx % interval == 0,
                lambda op: full_fwd(params, op[0], op[1]),
                lambda op: (cached_fwd(params, op[0], op[1], op[2]), op[2]),
                (img, t_b, cache),
            )
            pred_noise, x_start = self._predictions_from_output(
                model_out, img, t_b, clip_x_start=True, rederive_pred_noise=True
            )

            alpha = s.alphas_cumprod[time]
            alpha_next = jnp.where(
                time_next < 0, 1.0, s.alphas_cumprod[jnp.maximum(time_next, 0)]
            )
            sigma = eta * jnp.sqrt(jnp.maximum(
                (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0
            ))
            c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma**2, 0.0))
            noise = jax.random.normal(noise_key, shape, jnp.float32)
            img = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            return (img, key, cache), (img if return_all_timesteps else None)

        (img, _, _), imgs = jax.lax.scan(
            step, (img0, rng, cache0),
            (pairs, jnp.arange(pairs.shape[0])),
        )
        if return_all_timesteps:
            ret = jnp.concatenate([img0[:, None], jnp.moveaxis(imgs, 0, 1)], axis=1)
        else:
            ret = img
        return self.unnormalize(ret)

    def dpmpp_sample(
        self,
        params,
        rng,
        shape,
        sampling_timesteps: Optional[int] = None,
        cond=None,
    ):
        """DPM-Solver++(2M) for the VP (DDPM) process — one `lax.scan`.

        Data-prediction multistep solver (Lu et al. 2022, arXiv:2211.01095;
        same 2M form the reference ships only for EDM,
        `elucidated_diffusion.py:190-226`). Uses the DDIM time grid so step
        counts are directly comparable to `ddim_sample`. Measured on the
        flagship 100k checkpoint (n=5000 x 3 seeds, He-init FID,
        `results/ddpm_natural32/dpmpp_rescore.json`): 2.94 +- 0.37 at 10
        steps (within DDIM-50's 2.69 +- 0.41 noise band), 2.07 +- 0.36 at
        15, 1.44 +- 0.31 at 25 — i.e. matches DDIM-50 at 10 steps and beats
        it from 15 up. Deterministic (no ancestral noise).

        Per step, with a_t = sqrt(abar_t), s_t = sqrt(1-abar_t),
        lam_t = log(a_t/s_t), h = lam_next - lam_t:
            x <- (s_next/s_t) x - a_next expm1(-h) D
        where D is the 2nd-order combination of the current and previous
        x0 predictions ((1-g) x0 + g x0_prev, g = -h_prev/(2h)).
        """
        sampling_timesteps = default(sampling_timesteps, self.sampling_timesteps)
        batch = shape[0]
        s = self.schedule

        # grid: [T-1, ..., -1]; abar(-1) = 1 exactly (the clean endpoint)
        total = self.num_timesteps
        times = np.linspace(-1, total - 1, num=sampling_timesteps + 1)
        times = np.array(list(reversed(times.astype(np.int64).tolist())))
        abar = np.where(
            times < 0, 1.0, np.asarray(s.alphas_cumprod)[np.maximum(times, 0)]
        ).astype(np.float64)
        a = np.sqrt(abar)
        sig = np.sqrt(np.maximum(1.0 - abar, 0.0))
        lam = np.log(a / np.maximum(sig, 1e-20))
        n_steps = sampling_timesteps

        a_j = jnp.asarray(a, jnp.float32)
        sig_j = jnp.asarray(sig, jnp.float32)
        lam_j = jnp.asarray(lam, jnp.float32)
        times_j = jnp.asarray(times, jnp.int32)

        rng, init_key = jax.random.split(rng)
        img0 = jax.random.normal(init_key, shape, jnp.float32)

        def step(carry, i):
            img, x0_prev = carry
            t_b = jnp.full((batch,), times_j[i], jnp.int32)
            self_cond = x0_prev if self.self_condition else None
            _, x0 = self.model_predictions(
                params, img, t_b, self_cond, cond, clip_x_start=True
            )

            h = lam_j[i + 1] - lam_j[i]
            h_last = lam_j[i] - lam_j[jnp.maximum(i - 1, 0)]
            r = h_last / jnp.where(h == 0, 1.0, h)
            gamma = -1.0 / (2.0 * jnp.where(r == 0, 1.0, r))
            x0_mix = (1.0 - gamma) * x0 + gamma * x0_prev

            # first step has no x0_prev; last step lands exactly on x0
            # (sig_next = 0 would also send gamma's guard degenerate)
            use_plain = jnp.logical_or(i == 0, i == n_steps - 1)
            d = jnp.where(use_plain, x0, x0_mix)

            ratio = sig_j[i + 1] / jnp.maximum(sig_j[i], 1e-20)
            img = ratio * img - a_j[i + 1] * jnp.expm1(-h) * d
            return (img, x0), None

        (img, _), _ = jax.lax.scan(
            step, (img0, jnp.zeros_like(img0)), jnp.arange(n_steps)
        )
        return self.unnormalize(jnp.clip(img, -1.0, 1.0))

    def ddim_sample_guided(
        self,
        params,
        rng,
        shape,
        sampling_timesteps: Optional[int] = None,
        guide=None,
        mask=None,
        clip_denoised: bool = True,
        eta: Optional[float] = None,
    ):
        """Mask-guided DDIM inpainting (reference `ddim_sample_guided`
        :711-777, minus its in-loop matplotlib display — on SURVEY.md's
        do-not-replicate list). After each DDIM update the unmasked region is
        replaced by q_sample(guide, t): img ← img·mask + guide_t·(1−mask)."""
        sampling_timesteps = default(sampling_timesteps, self.sampling_timesteps)
        eta = default(eta, self.ddim_sampling_eta)
        batch = shape[0]
        s = self.schedule

        rng, init_key = jax.random.split(rng)
        img0 = jax.random.normal(init_key, shape, jnp.float32)
        pairs = self._ddim_time_pairs(sampling_timesteps)
        has_guide = guide is not None
        if has_guide:
            guide = guide.astype(jnp.float32)
            mask = mask.astype(jnp.float32)

        def step(carry, pair):
            img, x_start, key = carry
            time, time_next = pair[0], pair[1]
            key, noise_key, guide_key = jax.random.split(key, 3)

            t_b = jnp.full((batch,), time, jnp.int32)
            self_cond = x_start if self.self_condition else None
            pred_noise, x_start = self.model_predictions(
                params, img, t_b, self_cond, None, clip_x_start=clip_denoised
            )

            alpha = s.alphas_cumprod[time]
            alpha_next = jnp.where(
                time_next < 0, 1.0, s.alphas_cumprod[jnp.maximum(time_next, 0)]
            )
            sigma = eta * jnp.sqrt(
                jnp.maximum(
                    (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0
                )
            )
            c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma**2, 0.0))
            noise = jax.random.normal(noise_key, shape, jnp.float32)
            img = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise

            if has_guide:
                # reference noises the guide at the CURRENT time (:750-752)
                g_noise = jax.random.normal(guide_key, shape, jnp.float32)
                guide_t = self.q_sample(guide, t_b, g_noise)
                guided = img * mask + guide_t * (1 - mask)
                img = jnp.where(time_next < 0, img, guided)
            return (img, x_start, key), None

        (img, _, _), _ = jax.lax.scan(step, (img0, jnp.zeros_like(img0), rng), pairs)
        return unnormalize_to_zero_to_one(img)

    def sample(
        self,
        params,
        rng,
        batch_size: int = 16,
        cond=None,
        return_all_timesteps: bool = False,
    ):
        shape = self.sample_shape(batch_size)
        if self.is_ddim_sampling:
            if self.sampling_method == "dpmpp" and not return_all_timesteps:
                return self.dpmpp_sample(params, rng, shape, cond=cond)
            return self.ddim_sample(
                params, rng, shape, cond=cond, return_all_timesteps=return_all_timesteps
            )
        return self.p_sample_loop(
            params, rng, shape, cond=cond, return_all_timesteps=return_all_timesteps
        )

    def interpolate(self, params, rng, x1, x2, t: Optional[int] = None,
                    lam: float = 0.5, cond=None):
        """Noise-space interpolation between two images (reference :786-803;
        the conditional variants thread `cond`, `...image_conditional.py:
        232-249`)."""
        assert x1.shape == x2.shape
        b = x1.shape[0]
        t = default(t, self.num_timesteps - 1)

        rng, k1, k2 = jax.random.split(rng, 3)
        t_b = jnp.full((b,), t, jnp.int32)
        xt1 = self.q_sample(x1, t_b, jax.random.normal(k1, x1.shape, jnp.float32))
        xt2 = self.q_sample(x2, t_b, jax.random.normal(k2, x2.shape, jnp.float32))
        img0 = (1 - lam) * xt1 + lam * xt2

        def step(carry, i):
            img, x_start, key = carry
            key, noise_key = jax.random.split(key)
            i_b = jnp.full((b,), i, jnp.int32)
            self_cond = x_start if self.self_condition else None
            model_mean, _, model_log_variance, x_start = self.p_mean_variance(
                params, img, i_b, self_cond, cond, clip_denoised=True
            )
            noise = jnp.where(
                i > 0, jax.random.normal(noise_key, img.shape, jnp.float32), 0.0
            )
            img = model_mean + jnp.exp(0.5 * model_log_variance) * noise
            return (img, x_start, key), None

        ts = jnp.arange(t - 1, -1, -1)
        (img, _, _), _ = jax.lax.scan(step, (img0, jnp.zeros_like(img0), rng), ts)
        return img

    # ------------------------------------------------------------------ loss

    def p_losses(self, params, rng, x_start, t, cond=None, *, train: bool = True):
        """Denoising loss for a normalized [-1,1] batch at timesteps `t`.

        Mirrors reference `p_losses` (:823-891) with one deliberate efficiency
        change: the hybrid (Improved-DDPM) KL term reuses the same denoiser
        output as the MSE term instead of running a second forward pass — the
        reference calls the model twice (:852 and :872), which is pure waste
        under jit.
        """
        noise_key, offset_key, sc_coin_key, sc_rng, model_rng = jax.random.split(
            rng, 5
        )
        x_start = x_start.astype(jnp.float32)
        noise = jax.random.normal(noise_key, x_start.shape, jnp.float32)

        if self.offset_noise_strength > 0.0:
            # per-(batch, channel) DC offset — https://www.crosslabs.org/blog/diffusion-with-offset-noise
            b, c = x_start.shape[0], x_start.shape[-1]
            offset = jax.random.normal(offset_key, (b, c), jnp.float32)
            offset = offset.reshape((b,) + (1,) * (x_start.ndim - 2) + (c,))
            noise = noise + self.offset_noise_strength * offset

        x = self.q_sample(x_start, t, noise)

        x_self_cond = None
        if self.self_condition:
            def with_self_cond(op):
                x_, t_ = op
                pred = self.model_predictions(
                    params, x_, t_, None, cond, train=train, rng=sc_rng
                )
                return jax.lax.stop_gradient(pred.pred_x_start)

            def without_self_cond(op):
                return jnp.zeros_like(op[0])

            coin = jax.random.bernoulli(sc_coin_key, 0.5)
            x_self_cond = jax.lax.cond(coin, with_self_cond, without_self_cond, (x, t))

        model_out = self._apply_model(
            params, x, t, x_self_cond, cond, train=train, rng=model_rng
        )

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_start
        else:  # pred_v
            target = self.predict_v(x_start, t, noise)

        if self.use_pallas:
            from diffusion_models_tpu.ops.pallas.q_sample import (
                fused_mse_per_sample,
            )

            loss = fused_mse_per_sample(model_out, target)
        else:
            loss = (model_out - target) ** 2
            loss = jnp.mean(loss.reshape(loss.shape[0], -1), axis=-1)
        loss = loss * extract(self.schedule.loss_weight, t, 1)

        if self.hybrid_loss:
            # L_vlb: KL(q(x_{t-1}|x_t,x_0) ‖ p_θ(x_{t-1}|x_t)), t>0 only,
            # weighted by 0.001 (reference :870-889).
            x_hat = self._pred_x_start_from_output(x, t, model_out)
            x_hat = jnp.clip(x_hat, -1.0, 1.0)
            model_mean, _, model_log_variance = self.q_posterior(x_hat, x, t)
            posterior_mean, posterior_variance, posterior_log_variance = (
                self.q_posterior(x_start, x, t)
            )
            kl = 0.5 * (
                posterior_log_variance
                - model_log_variance
                + (jnp.exp(model_log_variance) + (model_mean - posterior_mean) ** 2)
                / posterior_variance
                - 1
            )
            kl = jnp.mean(kl.reshape(kl.shape[0], -1), axis=-1)
            mask = (t > 0).astype(jnp.float32)
            kl = jnp.sum(kl * mask) / (jnp.sum(mask) + 1e-8)
            loss = loss + 0.001 * kl

        return jnp.mean(loss)

    def _pred_x_start_from_output(self, x, t, model_output):
        if self.objective == "pred_noise":
            return self.predict_start_from_noise(x, t, model_output)
        if self.objective == "pred_x0":
            return model_output
        return self.predict_start_from_v(x, t, model_output)

    def loss(self, params, rng, img, cond=None, *, train: bool = True):
        """Full training objective for a [0,1] NHWC batch (reference
        `forward` at :894-900): sample t ~ U[0,T), normalize, p_losses."""
        b, h, w, c = img.shape
        assert (h, w) == self.image_size, (
            f"height/width of image must be {self.image_size}, got {(h, w)}"
        )
        t_key, loss_key = jax.random.split(rng)
        t = jax.random.randint(t_key, (b,), 0, self.num_timesteps)
        img = self.normalize(img)
        return self.p_losses(params, loss_key, img, t, cond, train=train)
