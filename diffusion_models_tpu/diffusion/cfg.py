"""Classifier-free guidance (Ho & Salimans 2022) + CFG++.

Capability parity with `classifier_free_guidance.py` (self-contained in the
reference, :235-816): a class-conditional U-Net with condition dropout to a
learned null embedding, `forward_with_cond_scale` guidance with
parallel-component removal and rescaled-phi (arXiv 2305.08891), CFG++
(arXiv 2406.08070) where the null prediction drives the DDIM noise, and a
diffusion process whose samplers thread classes/cond_scale throughout.

TPU design: the guided prediction needs conditional AND null outputs — they
are computed as ONE batched forward (2B batch) rather than two sequential
calls, doubling MXU utilization per step; samplers remain single `lax.scan`s.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion, ModelPrediction
from diffusion_models_tpu.models.unet import (
    Attention,
    LinearAttention,
    ResnetBlock,
    SinusoidalPosEmb,
    RandomOrLearnedSinusoidalPosEmb,
    Downsample,
    Upsample,
)
from diffusion_models_tpu.utils.helpers import cast_tuple, default, divisible_by


def project(x, y, eps: float = 1e-12):
    """Decompose x into (parallel, orthogonal) components w.r.t. y,
    per-sample (reference `project`, classifier_free_guidance.py)."""
    b = x.shape[0]
    xf = x.reshape(b, -1)
    yf = y.reshape(b, -1)
    unit = yf / jnp.maximum(jnp.linalg.norm(yf, axis=-1, keepdims=True), eps)
    parallel = jnp.sum(xf * unit, axis=-1, keepdims=True) * unit
    orthogonal = xf - parallel
    return parallel.reshape(x.shape), orthogonal.reshape(x.shape)


class CFGUnet(nn.Module):
    """Class-conditional U-Net with cond-drop to a learned null embedding.

    `__call__(x, time, classes, cond_drop_prob=None, train=False)`;
    the FiLM conditioning concatenates time and class embeddings, matching
    the reference ResnetBlock's joint (t, c) MLP.
    """

    dim: int
    num_classes: int
    cond_drop_prob: float = 0.5
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 3
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    attn_dim_head: int = 32
    attn_heads: int = 4
    dropout: float = 0.0
    # thread-through to LinearAttention's fused Pallas block (see
    # models/unet.py::Unet.fused_attn_block); set by route_for_inference
    fused_attn_block: Optional[bool] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def downsample_factor(self):
        return 2 ** (len(self.dim_mults) - 1)

    @property
    def default_out_dim(self):
        return self.channels * (2 if self.learned_variance else 1)

    @nn.compact
    def __call__(self, x, time, classes, cond_drop_prob: Optional[float] = None,
                 *, train: bool = False):
        assert all(divisible_by(d, self.downsample_factor) for d in x.shape[1:3])
        batch = x.shape[0]
        cond_drop_prob = default(cond_drop_prob, self.cond_drop_prob)

        init_dim = default(self.init_dim, self.dim)
        dims = [init_dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = self.dim * 4
        classes_dim = self.dim * 4

        # ---- class embedding with condition dropout to the null embedding
        classes_emb = nn.Embed(
            self.num_classes, self.dim, param_dtype=jnp.float32,
            name="classes_emb",
        )(classes)
        null_emb = self.param(
            "null_classes_emb", nn.initializers.normal(1.0), (self.dim,),
            jnp.float32,
        )
        if isinstance(cond_drop_prob, jnp.ndarray):
            # explicit per-sample drop mask (B, 1): 1 ⇒ null embedding
            keep = cond_drop_prob == 0
            classes_emb = jnp.where(keep, classes_emb, null_emb[None, :])
        elif cond_drop_prob == 0:
            pass
        elif cond_drop_prob == 1:
            classes_emb = jnp.broadcast_to(null_emb[None, :], classes_emb.shape)
        else:
            keep = (
                jax.random.uniform(self.make_rng("cond_drop"), (batch, 1))
                < (1 - cond_drop_prob)
            )
            classes_emb = jnp.where(keep, classes_emb, null_emb[None, :])

        c = nn.Dense(classes_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="classes_dense1")(classes_emb.astype(self.dtype))
        c = nn.gelu(c, approximate=False)
        c = nn.Dense(classes_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="classes_dense2")(c)

        # ---- time embedding
        if self.learned_sinusoidal_cond or self.random_fourier_features:
            emb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, is_random=self.random_fourier_features,
                name="sinu_pos_emb",
            )(time)
        else:
            emb = SinusoidalPosEmb(self.dim, name="sinu_pos_emb")(time)
        t = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_dense1")(emb.astype(self.dtype))
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_dense2")(t)

        # joint FiLM conditioning = concat(t, c) (reference ResnetBlock
        # concatenates both embeddings before its scale-shift MLP)
        tc = jnp.concatenate([t, c], axis=-1)

        x = nn.Conv(init_dim, (7, 7), dtype=self.dtype, param_dtype=jnp.float32,
                    name="init_conv")(x.astype(self.dtype))
        r = x

        from functools import partial

        resnet = partial(ResnetBlock, dropout=self.dropout, dtype=self.dtype)
        num_resolutions = len(in_out)

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_resolutions - 1
            x = resnet(dim_in, name=f"down_{ind}_block1")(x, tc, train=train)
            hs.append(x)
            x = resnet(dim_in, name=f"down_{ind}_block2")(x, tc, train=train)
            x = LinearAttention(
                dim_in, heads=self.attn_heads, dim_head=self.attn_dim_head,
                fused_block=self.fused_attn_block,
                dtype=self.dtype, name=f"down_{ind}_attn",
            )(x, residual=x)
            hs.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype=self.dtype, name=f"down_{ind}_down")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"down_{ind}_conv")(x)

        mid_dim = dims[-1]
        x = resnet(mid_dim, name="mid_block1")(x, tc, train=train)
        x = Attention(
            mid_dim, heads=self.attn_heads, dim_head=self.attn_dim_head,
            dtype=self.dtype, name="mid_attn",
        )(x) + x
        x = resnet(mid_dim, name="mid_block2")(x, tc, train=train)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == num_resolutions - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = resnet(dim_out, name=f"up_{ind}_block1")(x, tc, train=train)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = resnet(dim_out, name=f"up_{ind}_block2")(x, tc, train=train)
            x = LinearAttention(
                dim_out, heads=self.attn_heads, dim_head=self.attn_dim_head,
                fused_block=self.fused_attn_block,
                dtype=self.dtype, name=f"up_{ind}_attn",
            )(x, residual=x)
            if not is_last:
                x = Upsample(dim_in, dtype=self.dtype, name=f"up_{ind}_up")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"up_{ind}_conv")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = resnet(init_dim, name="final_res_block")(x, tc, train=train)
        out_dim = default(self.out_dim, self.default_out_dim)
        x = nn.Conv(out_dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="final_conv")(x)
        return x.astype(jnp.float32)


class CFGGaussianDiffusion(GaussianDiffusion):
    """Diffusion with classifier-free guidance at sampling time
    (reference `GaussianDiffusion` in classifier_free_guidance.py:461-780;
    defaults there: cosine schedule, η=1)."""

    def __init__(self, model, *, cond_scale: float = 6.0,
                 rescaled_phi: float = 0.7, use_cfg_plus_plus: bool = False,
                 remove_parallel_component: bool = True,
                 keep_parallel_frac: float = 0.0,
                 beta_schedule: str = "cosine", ddim_sampling_eta: float = 1.0,
                 **kwargs):
        super().__init__(
            model, beta_schedule=beta_schedule,
            ddim_sampling_eta=ddim_sampling_eta, **kwargs,
        )
        self.cond_scale = cond_scale
        self.rescaled_phi = rescaled_phi
        self.use_cfg_plus_plus = use_cfg_plus_plus
        self.remove_parallel_component = remove_parallel_component
        self.keep_parallel_frac = keep_parallel_frac

    def example_cond(self, batch_size: int):
        return jnp.zeros((batch_size,), jnp.int32)

    def init(self, rng, batch_size: int = 1, cond=None):
        x = jnp.zeros(self.sample_shape(batch_size), jnp.float32)
        t = jnp.zeros((batch_size,), jnp.int32)
        classes = default(cond, self.example_cond(batch_size))
        p, d, cdrop = jax.random.split(rng, 3)
        return jax.jit(self.model.init)(
            {"params": p, "dropout": d, "cond_drop": cdrop}, x, t, classes
        )["params"]

    def _apply_model(self, params, x, t, x_self_cond, cond, *, train, rng):
        """Training-time call: condition dropout active."""
        del x_self_cond
        rngs = {}
        if rng is not None:
            drop_rng, cdrop_rng = jax.random.split(rng)
            rngs = {"dropout": drop_rng, "cond_drop": cdrop_rng}
        return self._model_for(train).apply(
            {"params": params}, x, t, cond, train=train, rngs=rngs or None
        ).astype(jnp.float32)

    def forward_with_cond_scale(self, params, x, t, classes):
        """Guided output: ONE 2B-batched forward for (cond, null)."""
        b = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        classes2 = jnp.concatenate([classes, classes], axis=0)
        # per-sample drop mask: first half conditional, second half null
        drop2 = jnp.concatenate(
            [jnp.zeros((b, 1)), jnp.ones((b, 1))], axis=0
        )
        out2 = self._model_for(train=False).apply(
            {"params": params}, x2, t2, classes2, cond_drop_prob=drop2
        ).astype(jnp.float32)
        logits, null_logits = out2[:b], out2[b:]

        if self.cond_scale == 1:
            return logits, null_logits

        update = logits - null_logits
        if self.remove_parallel_component:
            parallel, orthogonal = project(update, logits)
            update = orthogonal + parallel * self.keep_parallel_frac

        scaled = logits + update * (self.cond_scale - 1.0)

        if self.rescaled_phi == 0.0:
            return scaled, null_logits

        std = lambda v: jnp.std(
            v.reshape(v.shape[0], -1), axis=-1
        ).reshape((-1,) + (1,) * (v.ndim - 1))
        rescaled = scaled * (std(logits) / jnp.maximum(std(scaled), 1e-12))
        out = rescaled * self.rescaled_phi + scaled * (1.0 - self.rescaled_phi)
        return out, null_logits

    def model_predictions(
        self, params, x, t, x_self_cond=None, cond=None,
        clip_x_start=False, rederive_pred_noise=False, *, train=False, rng=None,
    ):
        classes = cond
        model_output, model_output_null = self.forward_with_cond_scale(
            params, x, t, classes
        )
        maybe_clip = (lambda v: jnp.clip(v, -1, 1)) if clip_x_start else (lambda v: v)

        if self.objective == "pred_noise":
            pred_noise = (
                model_output if not self.use_cfg_plus_plus else model_output_null
            )
            x_start = maybe_clip(self.predict_start_from_noise(x, t, model_output))
        elif self.objective == "pred_x0":
            x_start = maybe_clip(model_output)
            x_for_noise = (
                x_start if not self.use_cfg_plus_plus else maybe_clip(model_output_null)
            )
            pred_noise = self.predict_noise_from_start(x, t, x_for_noise)
        else:  # pred_v
            x_start = maybe_clip(self.predict_start_from_v(x, t, model_output))
            x_for_noise = x_start
            if self.use_cfg_plus_plus:
                x_for_noise = maybe_clip(
                    self.predict_start_from_v(x, t, model_output_null)
                )
            pred_noise = self.predict_noise_from_start(x, t, x_for_noise)

        return ModelPrediction(pred_noise, x_start)

    def sample(self, params, rng, batch_size: Optional[int] = None,
               cond=None, return_all_timesteps: bool = False, *,
               classes=None):
        """Positionally compatible with the base `GaussianDiffusion.sample`
        (so the generic Trainer's `_jit_sample` works unchanged); `classes`
        is an alias for `cond`."""
        classes = default(classes, cond)
        assert classes is not None, "CFG sampling requires `classes`"
        batch_size = default(batch_size, classes.shape[0])
        return super().sample(
            params, rng, batch_size, cond=classes,
            return_all_timesteps=return_all_timesteps,
        )
