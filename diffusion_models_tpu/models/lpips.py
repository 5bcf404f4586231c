"""LPIPS perceptual loss (VGG16 backbone), in pure JAX.

In-repo replacement for `taming.modules.losses.LPIPS` (imported, not
vendored, by the reference — SURVEY.md §2.5): VGG16 features at
relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-normalized, squared difference,
1×1 "lin" reweighting, spatial mean, summed over layers.

Pretrained VGG16 + lin weights are a file input (`load_torch_state_dict`
accepts a taming `vgg.pth` LPIPS state dict or a torchvision vgg16 state
dict + default unit lins). Without weights `lpips(...)` is unavailable and
the VAE losses run with `perceptual_weight = 0` — reconstruction quality is
then plain L1, which keeps training functional (scores differ from the
reference until weights are supplied).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# VGG16 conv plan: (name, out_channels); 'M' = maxpool. Feature taps after
# the ReLU of the last conv in each slice.
_VGG_PLAN = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]
_TAPS = ["conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"]
_TAP_CHANNELS = [64, 128, 256, 512, 512]

# ImageNet scaling used by LPIPS (shift/scale on [-1,1] inputs)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    y = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _vgg_features(params, x):
    feats = []
    h = x
    for item in _VGG_PLAN:
        if item == "M":
            h = lax.reduce_window(
                h, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        name, _ = item
        p = params[name]
        h = jax.nn.relu(_conv(h, p["w"], p["b"]))
        if name in _TAPS:
            feats.append(h)
    return feats


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS:
    """Callable perceptual distance over [-1,1] NHWC images."""

    def __init__(self, params):
        self.params = params

    @classmethod
    def init_random(cls, rng):
        """Random backbone — for tests only."""
        params = {}
        cin = 3
        keys = jax.random.split(rng, len(_VGG_PLAN))
        for key, item in zip(keys, _VGG_PLAN):
            if item == "M":
                continue
            name, cout = item
            params[name] = {
                "w": jax.random.normal(key, (3, 3, cin, cout))
                * (1.0 / np.sqrt(9 * cin)),
                "b": jnp.zeros((cout,)),
            }
            cin = cout
        params["lins"] = [
            jnp.ones((c,), jnp.float32) / c for c in _TAP_CHANNELS
        ]
        return cls(params)

    @classmethod
    def load_torch_state_dict(cls, path):
        """Convert a taming/richzhang LPIPS `vgg.pth`-style state dict:
        `net.sliceN.<idx>.weight/bias` VGG convs + `linN.model.1.weight`
        1×1 lins (or a plain torchvision `features.<idx>` vgg16 dict)."""
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        to_np = lambda v: np.asarray(v.detach().numpy())

        # map sequential conv indices to plan names
        conv_names = [it[0] for it in _VGG_PLAN if it != "M"]
        params = {}
        conv_keys = sorted(
            (k for k in sd if k.endswith(".weight") and to_np(sd[k]).ndim == 4
             and "lin" not in k),
            key=lambda k: [int(s) for s in k.split(".") if s.isdigit()],
        )
        assert len(conv_keys) >= len(conv_names), "unexpected vgg state dict"
        for name, wk in zip(conv_names, conv_keys):
            bk = wk[: -len("weight")] + "bias"
            params[name] = {
                "w": jnp.asarray(to_np(sd[wk]).transpose(2, 3, 1, 0)),
                "b": jnp.asarray(to_np(sd[bk])),
            }
        lins = []
        for i, c in enumerate(_TAP_CHANNELS):
            k = f"lin{i}.model.1.weight"
            if k in sd:
                lins.append(jnp.asarray(to_np(sd[k]).reshape(c)))
            else:
                lins.append(jnp.ones((c,), jnp.float32) / c)
        params["lins"] = lins
        return cls(params)

    def __call__(self, x, y):
        """x, y: [-1,1] NHWC → per-sample LPIPS distance (B,)."""
        scale = lambda t: (t - _SHIFT) / _SCALE
        fx = _vgg_features(self.params, scale(x))
        fy = _vgg_features(self.params, scale(y))
        total = 0.0
        for a, b, lin in zip(fx, fy, self.params["lins"]):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            d = jnp.sum(d * lin, axis=-1)          # 1×1 lin reweighting
            total = total + jnp.mean(d, axis=(1, 2))
        return total
