"""InceptionV3 feature extractor for FID / Inception Score, in pure JAX.

The reference evaluates FID with `pytorch-fid`'s InceptionV3 (block-2048 pool
features, `fid_evaluation.py:7-8,36-51`) and IS with torchvision
`inception_v3` logits (`inception_score_evaluation.py:5,41`). Both are the
same backbone; this module provides it once with two heads:

    apply(params, images_01_nhwc) -> (pool_features[B,2048], logits[B,C])

Design notes:
  - Inference-only network ⇒ implemented as pure functions over a flat
    {layer_name: {w, scale, bias, mean, var}} param dict (BatchNorm constants
    applied directly), NHWC layout, bf16-friendly matmul-heavy convs. No
    module framework needed; jits to a single XLA program.
  - `fid_variant=True` reproduces pytorch-fid's FIDInception blocks: average
    pools inside Inception A/C/E-1 use count_include_pad=False, and the
    second InceptionE (Mixed_7c) uses a MAX pool in its pool branch — these
    details change FID numbers, so they are faithfully implemented.
  - `load_torch_state_dict` converts either the pt_inception-2015-12-05
    weights (pytorch-fid, 1008 classes) or torchvision inception_v3
    (1000 classes) state dicts (OIHW→HWIO transpose only).
  - Preprocessing matches the reference: inputs are [0,1] RGB, bilinearly
    resized to 299², then scaled to [-1,1] (pytorch-fid `normalize_input`;
    the torchvision-IS path's ImageNet normalization is handled in
    `training/evaluation.py`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# --------------------------------------------------------------- primitives


def _conv(x, w, stride=1, padding=((0, 0), (0, 0))):
    if isinstance(stride, int):
        stride = (stride, stride)
    return lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, p, eps=1e-3):
    inv = lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def basic_conv(params, name, x, stride=1, padding=((0, 0), (0, 0))):
    p = params[name]
    x = _conv(x, p["w"], stride=stride, padding=padding)
    return jax.nn.relu(_bn(x, p))


def _max_pool(x, window=3, stride=2, padding="VALID"):
    if isinstance(padding, int):
        padding = (((0, 0),) + ((padding, padding),) * 2 + ((0, 0),))
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1), (1, stride, stride, 1),
        padding if isinstance(padding, str) else padding,
    )


def _avg_pool(x, window=3, stride=1, pad=1, count_include_pad=True):
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, padding)
    if count_include_pad:
        return summed / (window * window)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, dims, strides, padding)
    return summed / counts


# ------------------------------------------------------- inception branches


def _inception_a(params, prefix, x, fid_variant):
    b1 = basic_conv(params, f"{prefix}.branch1x1", x)
    b5 = basic_conv(params, f"{prefix}.branch5x5_1", x)
    b5 = basic_conv(params, f"{prefix}.branch5x5_2", b5, padding=((2, 2), (2, 2)))
    b3 = basic_conv(params, f"{prefix}.branch3x3dbl_1", x)
    b3 = basic_conv(params, f"{prefix}.branch3x3dbl_2", b3, padding=((1, 1), (1, 1)))
    b3 = basic_conv(params, f"{prefix}.branch3x3dbl_3", b3, padding=((1, 1), (1, 1)))
    bp = _avg_pool(x, count_include_pad=not fid_variant)
    bp = basic_conv(params, f"{prefix}.branch_pool", bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, prefix, x):
    b3 = basic_conv(params, f"{prefix}.branch3x3", x, stride=2)
    bd = basic_conv(params, f"{prefix}.branch3x3dbl_1", x)
    bd = basic_conv(params, f"{prefix}.branch3x3dbl_2", bd, padding=((1, 1), (1, 1)))
    bd = basic_conv(params, f"{prefix}.branch3x3dbl_3", bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(params, prefix, x, fid_variant):
    p17 = ((0, 0), (3, 3))
    p71 = ((3, 3), (0, 0))
    b1 = basic_conv(params, f"{prefix}.branch1x1", x)
    b7 = basic_conv(params, f"{prefix}.branch7x7_1", x)
    b7 = basic_conv(params, f"{prefix}.branch7x7_2", b7, padding=p17)
    b7 = basic_conv(params, f"{prefix}.branch7x7_3", b7, padding=p71)
    bd = basic_conv(params, f"{prefix}.branch7x7dbl_1", x)
    bd = basic_conv(params, f"{prefix}.branch7x7dbl_2", bd, padding=p71)
    bd = basic_conv(params, f"{prefix}.branch7x7dbl_3", bd, padding=p17)
    bd = basic_conv(params, f"{prefix}.branch7x7dbl_4", bd, padding=p71)
    bd = basic_conv(params, f"{prefix}.branch7x7dbl_5", bd, padding=p17)
    bp = _avg_pool(x, count_include_pad=not fid_variant)
    bp = basic_conv(params, f"{prefix}.branch_pool", bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, prefix, x):
    b3 = basic_conv(params, f"{prefix}.branch3x3_1", x)
    b3 = basic_conv(params, f"{prefix}.branch3x3_2", b3, stride=2)
    b7 = basic_conv(params, f"{prefix}.branch7x7x3_1", x)
    b7 = basic_conv(params, f"{prefix}.branch7x7x3_2", b7, padding=((0, 0), (3, 3)))
    b7 = basic_conv(params, f"{prefix}.branch7x7x3_3", b7, padding=((3, 3), (0, 0)))
    b7 = basic_conv(params, f"{prefix}.branch7x7x3_4", b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(params, prefix, x, pool_mode, fid_variant):
    b1 = basic_conv(params, f"{prefix}.branch1x1", x)

    b3 = basic_conv(params, f"{prefix}.branch3x3_1", x)
    b3a = basic_conv(params, f"{prefix}.branch3x3_2a", b3, padding=((0, 0), (1, 1)))
    b3b = basic_conv(params, f"{prefix}.branch3x3_2b", b3, padding=((1, 1), (0, 0)))
    b3 = jnp.concatenate([b3a, b3b], axis=-1)

    bd = basic_conv(params, f"{prefix}.branch3x3dbl_1", x)
    bd = basic_conv(params, f"{prefix}.branch3x3dbl_2", bd, padding=((1, 1), (1, 1)))
    bda = basic_conv(params, f"{prefix}.branch3x3dbl_3a", bd, padding=((0, 0), (1, 1)))
    bdb = basic_conv(params, f"{prefix}.branch3x3dbl_3b", bd, padding=((1, 1), (0, 0)))
    bd = jnp.concatenate([bda, bdb], axis=-1)

    if pool_mode == "max":
        # FID variant: Mixed_7c pool branch is a stride-1 max pool
        bp = _max_pool(x, window=3, stride=1, padding=1)
    else:
        bp = _avg_pool(x, count_include_pad=not fid_variant)
    bp = basic_conv(params, f"{prefix}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ------------------------------------------------------------ architecture


# (name, out_channels, kernel, stride, padding) for the stem
_STEM = [
    ("Conv2d_1a_3x3", 32, 3, 2, 0),
    ("Conv2d_2a_3x3", 32, 3, 1, 0),
    ("Conv2d_2b_3x3", 64, 3, 1, 1),
    ("Conv2d_3b_1x1", 80, 1, 1, 0),
    ("Conv2d_4a_3x3", 192, 3, 1, 0),
]

# conv layer table: name -> (in_ch, out_ch, (kh, kw)) for random init
def _conv_table() -> Dict[str, Tuple[int, int, Tuple[int, int]]]:
    t = {}
    t["Conv2d_1a_3x3"] = (3, 32, (3, 3))
    t["Conv2d_2a_3x3"] = (32, 32, (3, 3))
    t["Conv2d_2b_3x3"] = (32, 64, (3, 3))
    t["Conv2d_3b_1x1"] = (64, 80, (1, 1))
    t["Conv2d_4a_3x3"] = (80, 192, (3, 3))

    def add_a(prefix, in_ch, pool_features):
        t[f"{prefix}.branch1x1"] = (in_ch, 64, (1, 1))
        t[f"{prefix}.branch5x5_1"] = (in_ch, 48, (1, 1))
        t[f"{prefix}.branch5x5_2"] = (48, 64, (5, 5))
        t[f"{prefix}.branch3x3dbl_1"] = (in_ch, 64, (1, 1))
        t[f"{prefix}.branch3x3dbl_2"] = (64, 96, (3, 3))
        t[f"{prefix}.branch3x3dbl_3"] = (96, 96, (3, 3))
        t[f"{prefix}.branch_pool"] = (in_ch, pool_features, (1, 1))

    add_a("Mixed_5b", 192, 32)
    add_a("Mixed_5c", 256, 64)
    add_a("Mixed_5d", 288, 64)

    t["Mixed_6a.branch3x3"] = (288, 384, (3, 3))
    t["Mixed_6a.branch3x3dbl_1"] = (288, 64, (1, 1))
    t["Mixed_6a.branch3x3dbl_2"] = (64, 96, (3, 3))
    t["Mixed_6a.branch3x3dbl_3"] = (96, 96, (3, 3))

    def add_c(prefix, c7):
        t[f"{prefix}.branch1x1"] = (768, 192, (1, 1))
        t[f"{prefix}.branch7x7_1"] = (768, c7, (1, 1))
        t[f"{prefix}.branch7x7_2"] = (c7, c7, (1, 7))
        t[f"{prefix}.branch7x7_3"] = (c7, 192, (7, 1))
        t[f"{prefix}.branch7x7dbl_1"] = (768, c7, (1, 1))
        t[f"{prefix}.branch7x7dbl_2"] = (c7, c7, (7, 1))
        t[f"{prefix}.branch7x7dbl_3"] = (c7, c7, (1, 7))
        t[f"{prefix}.branch7x7dbl_4"] = (c7, c7, (7, 1))
        t[f"{prefix}.branch7x7dbl_5"] = (c7, 192, (1, 7))
        t[f"{prefix}.branch_pool"] = (768, 192, (1, 1))

    add_c("Mixed_6b", 128)
    add_c("Mixed_6c", 160)
    add_c("Mixed_6d", 160)
    add_c("Mixed_6e", 192)

    t["Mixed_7a.branch3x3_1"] = (768, 192, (1, 1))
    t["Mixed_7a.branch3x3_2"] = (192, 320, (3, 3))
    t["Mixed_7a.branch7x7x3_1"] = (768, 192, (1, 1))
    t["Mixed_7a.branch7x7x3_2"] = (192, 192, (1, 7))
    t["Mixed_7a.branch7x7x3_3"] = (192, 192, (7, 1))
    t["Mixed_7a.branch7x7x3_4"] = (192, 192, (3, 3))

    def add_e(prefix, in_ch):
        t[f"{prefix}.branch1x1"] = (in_ch, 320, (1, 1))
        t[f"{prefix}.branch3x3_1"] = (in_ch, 384, (1, 1))
        t[f"{prefix}.branch3x3_2a"] = (384, 384, (1, 3))
        t[f"{prefix}.branch3x3_2b"] = (384, 384, (3, 1))
        t[f"{prefix}.branch3x3dbl_1"] = (in_ch, 448, (1, 1))
        t[f"{prefix}.branch3x3dbl_2"] = (448, 384, (3, 3))
        t[f"{prefix}.branch3x3dbl_3a"] = (384, 384, (1, 3))
        t[f"{prefix}.branch3x3dbl_3b"] = (384, 384, (3, 1))
        t[f"{prefix}.branch_pool"] = (in_ch, 192, (1, 1))

    add_e("Mixed_7b", 1280)
    add_e("Mixed_7c", 2048)
    return t


class InceptionV3:
    """Two-headed InceptionV3: 2048-d pool features (FID) + logits (IS)."""

    POOL_DIM = 2048

    def __init__(self, fid_variant: bool = True, num_classes: int = 1008):
        self.fid_variant = fid_variant
        self.num_classes = num_classes

    # ------------------------------------------------------------- params

    def init_random(self, rng) -> dict:
        """Random weights (for tests / smoke runs — NOT real FID scores).

        He-scaled (gain √2 for the ReLU cascade): with 1/√fan scaling the
        ~20-deep conv stack attenuates activations to ~1e-4 and every image
        maps to nearly the same feature (FID collapses to float noise).
        He-scaled random features keep O(1) variance and act as a usable
        random-projection metric: the FID *trend* across milestones is
        meaningful even though absolute values are not comparable to real
        Inception FID."""
        params = {}
        keys = jax.random.split(rng, len(_conv_table()) + 1)
        for key, (name, (cin, cout, k)) in zip(keys, _conv_table().items()):
            params[name] = {
                "w": jax.random.normal(key, k + (cin, cout), jnp.float32)
                * np.sqrt(2.0 / (cin * k[0] * k[1])),
                "scale": jnp.ones((cout,), jnp.float32),
                "bias": jnp.zeros((cout,), jnp.float32),
                "mean": jnp.zeros((cout,), jnp.float32),
                "var": jnp.ones((cout,), jnp.float32),
            }
        params["fc"] = {
            "w": jax.random.normal(keys[-1], (self.POOL_DIM, self.num_classes))
            * 0.01,
            "b": jnp.zeros((self.num_classes,), jnp.float32),
        }
        return params

    def load_torch_state_dict(self, path_or_dict) -> dict:
        """Convert a pytorch-fid / torchvision inception state dict."""
        if isinstance(path_or_dict, (str, bytes)) or hasattr(path_or_dict, "__fspath__"):
            import torch

            sd = torch.load(path_or_dict, map_location="cpu", weights_only=True)
        else:
            sd = path_or_dict
        to_np = lambda v: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

        params = {}
        for name in _conv_table():
            w = to_np(sd[f"{name}.conv.weight"])  # OIHW
            params[name] = {
                "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # -> HWIO
                "scale": jnp.asarray(to_np(sd[f"{name}.bn.weight"])),
                "bias": jnp.asarray(to_np(sd[f"{name}.bn.bias"])),
                "mean": jnp.asarray(to_np(sd[f"{name}.bn.running_mean"])),
                "var": jnp.asarray(to_np(sd[f"{name}.bn.running_var"])),
            }
        fc_w = to_np(sd["fc.weight"])  # (C, 2048)
        params["fc"] = {
            "w": jnp.asarray(fc_w.T),
            "b": jnp.asarray(to_np(sd["fc.bias"])),
        }
        return params

    # -------------------------------------------------------------- apply

    def apply(self, params, x, *, resize: bool = True, normalize: bool = True):
        """x: [0,1] float NHWC RGB → (pool_features [B,2048], logits [B,C])."""
        if resize and x.shape[1:3] != (299, 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        if normalize:
            x = x * 2.0 - 1.0  # pytorch-fid normalize_input

        fv = self.fid_variant
        x = basic_conv(params, "Conv2d_1a_3x3", x, stride=2)
        x = basic_conv(params, "Conv2d_2a_3x3", x)
        x = basic_conv(params, "Conv2d_2b_3x3", x, padding=((1, 1), (1, 1)))
        x = _max_pool(x)
        x = basic_conv(params, "Conv2d_3b_1x1", x)
        x = basic_conv(params, "Conv2d_4a_3x3", x)
        x = _max_pool(x)
        x = _inception_a(params, "Mixed_5b", x, fv)
        x = _inception_a(params, "Mixed_5c", x, fv)
        x = _inception_a(params, "Mixed_5d", x, fv)
        x = _inception_b(params, "Mixed_6a", x)
        x = _inception_c(params, "Mixed_6b", x, fv)
        x = _inception_c(params, "Mixed_6c", x, fv)
        x = _inception_c(params, "Mixed_6d", x, fv)
        x = _inception_c(params, "Mixed_6e", x, fv)
        x = _inception_d(params, "Mixed_7a", x)
        x = _inception_e(params, "Mixed_7b", x, pool_mode="avg", fid_variant=fv)
        x = _inception_e(
            params, "Mixed_7c", x, pool_mode="max" if fv else "avg", fid_variant=fv
        )

        pool = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        logits = pool @ params["fc"]["w"] + params["fc"]["b"]
        return pool, logits
