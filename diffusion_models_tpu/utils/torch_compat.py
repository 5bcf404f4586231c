"""Reference-checkpoint (.pt) ⇄ Flax-pytree weight conversion.

BASELINE.json requires checkpoint-compatible weights with the reference.
The reference's `Trainer.save` writes
`{step, model, opt, ema, scaler, version}` (`denoising_diffusion.py:
1100-1113`) where `model` is the DenoisingDiffusion state dict (the U-Net
under the `model.` prefix plus 11 schedule buffers) and `ema` is the
ema_pytorch wrapper (online copy under `online_model.`/nothing, EMA copy
under `ema_model.`).

This module maps the reference U-Net's parameter names/layouts to this
package's Flax `Unet` params:

  torch (NCHW / OIHW / (out,in))            flax (NHWC / HWIO / (in,out))
  ------------------------------------      -----------------------------
  init_conv.{weight,bias}                → init_conv.{kernel,bias}
  time_mlp.1 / time_mlp.3                → time_dense1 / time_dense2
  downs.{i}.0 / .1   (ResnetBlock)       → down_{i}_block1 / _block2
    .mlp.1                               →   .time_proj
    .block1.proj / .block1.norm.g        →   .block1.proj / .block1.norm.g
    .res_conv                            →   .res_conv
  downs.{i}.2  (Linear/Full Attention)   → down_{i}_attn
    .norm.g / .mem_kv / .to_qkv          →   .norm.g / .mem_kv / .to_qkv
    .to_out.0(+.1 RMSNorm)               →   .to_out (+ .out_norm)
  downs.{i}.3  Downsample conv1×1        → down_{i}_down.conv
               or final conv3×3          → down_{i}_conv
  mid_block1 / mid_attn / mid_block2     → same names
  ups.{i}.{0,1,2}                        → up_{i}_block1/_block2/_attn
  ups.{i}.3    Upsample conv3×3          → up_{i}_up.conv  (or up_{i}_conv)
  final_res_block / final_conv           → same names

Schedule buffers are NOT converted — they are recomputed exactly from the
f64 formulas at construction (bit-identical by `tests/test_schedules.py`).

The inverse direction (`unet_params_to_reference_state_dict`) emits a
reference-layout state dict, used both for exporting and to round-trip-test
the mapping.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


def _t(arr):
    return np.asarray(arr)


def _conv_to_flax(w):
    """torch conv OIHW → flax HWIO."""
    return jnp.asarray(_t(w).transpose(2, 3, 1, 0))


def _conv_to_torch(k):
    return _t(k).transpose(3, 2, 0, 1)


def _dense_to_flax(w):
    """torch Linear (out,in) → flax (in,out)."""
    return jnp.asarray(_t(w).T)


def _conv1x1_to_dense_flax(w):
    """torch 1×1 conv (O,I,1,1) used as a token Dense → flax (I,O)."""
    return jnp.asarray(_t(w)[:, :, 0, 0].T)


def _rms_g_to_flax(g):
    """reference RMSNorm g (1,C,1,1) or (1,C) → (C,)."""
    return jnp.asarray(_t(g).reshape(-1))


def _resnet_block_to_flax(sd, p):
    out = {
        "block1": {
            "proj": {"kernel": _conv_to_flax(sd[f"{p}.block1.proj.weight"]),
                     "bias": jnp.asarray(_t(sd[f"{p}.block1.proj.bias"]))},
            "norm": {"g": _rms_g_to_flax(sd[f"{p}.block1.norm.g"])},
        },
        "block2": {
            "proj": {"kernel": _conv_to_flax(sd[f"{p}.block2.proj.weight"]),
                     "bias": jnp.asarray(_t(sd[f"{p}.block2.proj.bias"]))},
            "norm": {"g": _rms_g_to_flax(sd[f"{p}.block2.norm.g"])},
        },
    }
    if f"{p}.mlp.1.weight" in sd:
        out["time_proj"] = {
            "kernel": _dense_to_flax(sd[f"{p}.mlp.1.weight"]),
            "bias": jnp.asarray(_t(sd[f"{p}.mlp.1.bias"])),
        }
    if f"{p}.res_conv.weight" in sd:
        out["res_conv"] = {
            "kernel": _conv_to_flax(sd[f"{p}.res_conv.weight"]),
            "bias": jnp.asarray(_t(sd[f"{p}.res_conv.bias"])),
        }
    return out


def _attn_to_flax(sd, p):
    """Works for both full Attention and LinearAttention."""
    out = {
        "norm": {"g": _rms_g_to_flax(sd[f"{p}.norm.g"])},
        "mem_kv": jnp.asarray(_t(sd[f"{p}.mem_kv"])),
        "to_qkv": {"kernel": _conv1x1_to_dense_flax(sd[f"{p}.to_qkv.weight"])},
    }
    if f"{p}.to_out.0.weight" in sd:  # LinearAttention: Sequential(conv, norm)
        out["to_out"] = {
            "kernel": _conv_to_flax(sd[f"{p}.to_out.0.weight"]),
            "bias": jnp.asarray(_t(sd[f"{p}.to_out.0.bias"])),
        }
        out["out_norm"] = {"g": _rms_g_to_flax(sd[f"{p}.to_out.1.g"])}
    else:  # full Attention: plain conv
        out["to_out"] = {
            "kernel": _conv_to_flax(sd[f"{p}.to_out.weight"]),
            "bias": jnp.asarray(_t(sd[f"{p}.to_out.bias"])),
        }
    return out


def reference_unet_state_dict_to_flax(sd: Dict, num_stages: int = 4) -> Dict:
    """Convert a reference `Unet` state dict (keys WITHOUT the outer `model.`
    prefix) into this package's Flax `Unet` param tree."""
    params = {
        "init_conv": {
            "kernel": _conv_to_flax(sd["init_conv.weight"]),
            "bias": jnp.asarray(_t(sd["init_conv.bias"])),
        },
        "time_dense1": {
            "kernel": _dense_to_flax(sd["time_mlp.1.weight"]),
            "bias": jnp.asarray(_t(sd["time_mlp.1.bias"])),
        },
        "time_dense2": {
            "kernel": _dense_to_flax(sd["time_mlp.3.weight"]),
            "bias": jnp.asarray(_t(sd["time_mlp.3.bias"])),
        },
        "final_res_block": _resnet_block_to_flax(sd, "final_res_block"),
        "final_conv": {
            "kernel": _conv_to_flax(sd["final_conv.weight"]),
            "bias": jnp.asarray(_t(sd["final_conv.bias"])),
        },
        "mid_block1": _resnet_block_to_flax(sd, "mid_block1"),
        "mid_attn": _attn_to_flax(sd, "mid_attn"),
        "mid_block2": _resnet_block_to_flax(sd, "mid_block2"),
    }
    if "sinu_pos_emb.weights" in sd:  # learned/random fourier variant
        params["sinu_pos_emb"] = {
            "weights": jnp.asarray(_t(sd["sinu_pos_emb.weights"]))
        }

    # text-conditional extensions (`denoising_diffusion_text_conditional.py`:
    # embedding-concat MLP :110-115, cross-attention trio :123-125)
    if "text_proj.0.weight" in sd:
        params["text_proj_dense1"] = {
            "kernel": _dense_to_flax(sd["text_proj.0.weight"]),
            "bias": jnp.asarray(_t(sd["text_proj.0.bias"])),
        }
        params["text_proj_dense2"] = {
            "kernel": _dense_to_flax(sd["text_proj.2.weight"]),
            "bias": jnp.asarray(_t(sd["text_proj.2.bias"])),
        }
        params["text_concat_proj"] = {
            "kernel": _dense_to_flax(sd["text_concat_proj.weight"]),
            "bias": jnp.asarray(_t(sd["text_concat_proj.bias"])),
        }
    for name in ("cross_attn", "cross_attn_down", "cross_attn_up"):
        if f"{name}.to_q.weight" in sd:
            params[name] = {
                "to_q": {"kernel": _dense_to_flax(sd[f"{name}.to_q.weight"])},
                "to_k": {"kernel": _dense_to_flax(sd[f"{name}.to_k.weight"])},
                "to_v": {"kernel": _dense_to_flax(sd[f"{name}.to_v.weight"])},
                "to_out": {
                    "kernel": _dense_to_flax(sd[f"{name}.to_out.0.weight"]),
                    "bias": jnp.asarray(_t(sd[f"{name}.to_out.0.bias"])),
                },
                "out_norm": {"g": _rms_g_to_flax(sd[f"{name}.to_out.1.g"])},
            }

    for i in range(num_stages):
        params[f"down_{i}_block1"] = _resnet_block_to_flax(sd, f"downs.{i}.0")
        params[f"down_{i}_block2"] = _resnet_block_to_flax(sd, f"downs.{i}.1")
        params[f"down_{i}_attn"] = _attn_to_flax(sd, f"downs.{i}.2")
        if f"downs.{i}.3.1.weight" in sd:  # Downsample: Rearrange + conv1x1
            params[f"down_{i}_down"] = {
                "conv": {
                    "kernel": _conv_to_flax(sd[f"downs.{i}.3.1.weight"]),
                    "bias": jnp.asarray(_t(sd[f"downs.{i}.3.1.bias"])),
                }
            }
        else:  # last stage: plain conv3x3
            params[f"down_{i}_conv"] = {
                "kernel": _conv_to_flax(sd[f"downs.{i}.3.weight"]),
                "bias": jnp.asarray(_t(sd[f"downs.{i}.3.bias"])),
            }

        params[f"up_{i}_block1"] = _resnet_block_to_flax(sd, f"ups.{i}.0")
        params[f"up_{i}_block2"] = _resnet_block_to_flax(sd, f"ups.{i}.1")
        params[f"up_{i}_attn"] = _attn_to_flax(sd, f"ups.{i}.2")
        if f"ups.{i}.3.1.weight" in sd:  # Upsample: nn.Upsample + conv3x3
            params[f"up_{i}_up"] = {
                "conv": {
                    "kernel": _conv_to_flax(sd[f"ups.{i}.3.1.weight"]),
                    "bias": jnp.asarray(_t(sd[f"ups.{i}.3.1.bias"])),
                }
            }
        else:
            params[f"up_{i}_conv"] = {
                "kernel": _conv_to_flax(sd[f"ups.{i}.3.weight"]),
                "bias": jnp.asarray(_t(sd[f"ups.{i}.3.bias"])),
            }
    return params


def _resnet_block_to_torch(p, prefix, sd):
    sd[f"{prefix}.block1.proj.weight"] = _conv_to_torch(p["block1"]["proj"]["kernel"])
    sd[f"{prefix}.block1.proj.bias"] = _t(p["block1"]["proj"]["bias"])
    sd[f"{prefix}.block1.norm.g"] = _t(p["block1"]["norm"]["g"]).reshape(1, -1, 1, 1)
    sd[f"{prefix}.block2.proj.weight"] = _conv_to_torch(p["block2"]["proj"]["kernel"])
    sd[f"{prefix}.block2.proj.bias"] = _t(p["block2"]["proj"]["bias"])
    sd[f"{prefix}.block2.norm.g"] = _t(p["block2"]["norm"]["g"]).reshape(1, -1, 1, 1)
    if "time_proj" in p:
        sd[f"{prefix}.mlp.1.weight"] = _t(p["time_proj"]["kernel"]).T
        sd[f"{prefix}.mlp.1.bias"] = _t(p["time_proj"]["bias"])
    if "res_conv" in p:
        sd[f"{prefix}.res_conv.weight"] = _conv_to_torch(p["res_conv"]["kernel"])
        sd[f"{prefix}.res_conv.bias"] = _t(p["res_conv"]["bias"])


def _attn_to_torch(p, prefix, sd, linear: bool):
    c = _t(p["norm"]["g"]).shape[0]
    sd[f"{prefix}.norm.g"] = _t(p["norm"]["g"]).reshape(1, c, 1, 1)
    sd[f"{prefix}.mem_kv"] = _t(p["mem_kv"])
    qkv = _t(p["to_qkv"]["kernel"]).T  # (3H, C)
    sd[f"{prefix}.to_qkv.weight"] = qkv[:, :, None, None]
    if linear:
        sd[f"{prefix}.to_out.0.weight"] = _conv_to_torch(p["to_out"]["kernel"])
        sd[f"{prefix}.to_out.0.bias"] = _t(p["to_out"]["bias"])
        sd[f"{prefix}.to_out.1.g"] = _t(p["out_norm"]["g"]).reshape(1, c, 1, 1)
    else:
        sd[f"{prefix}.to_out.weight"] = _conv_to_torch(p["to_out"]["kernel"])
        sd[f"{prefix}.to_out.bias"] = _t(p["to_out"]["bias"])


def unet_params_to_reference_state_dict(params: Dict, num_stages: int = 4) -> Dict:
    """Flax `Unet` params → reference-layout numpy state dict."""
    sd: Dict[str, np.ndarray] = {}
    sd["init_conv.weight"] = _conv_to_torch(params["init_conv"]["kernel"])
    sd["init_conv.bias"] = _t(params["init_conv"]["bias"])
    sd["time_mlp.1.weight"] = _t(params["time_dense1"]["kernel"]).T
    sd["time_mlp.1.bias"] = _t(params["time_dense1"]["bias"])
    sd["time_mlp.3.weight"] = _t(params["time_dense2"]["kernel"]).T
    sd["time_mlp.3.bias"] = _t(params["time_dense2"]["bias"])
    if "sinu_pos_emb" in params and "weights" in params["sinu_pos_emb"]:
        sd["sinu_pos_emb.weights"] = _t(params["sinu_pos_emb"]["weights"])

    if "text_proj_dense1" in params:
        sd["text_proj.0.weight"] = _t(params["text_proj_dense1"]["kernel"]).T
        sd["text_proj.0.bias"] = _t(params["text_proj_dense1"]["bias"])
        sd["text_proj.2.weight"] = _t(params["text_proj_dense2"]["kernel"]).T
        sd["text_proj.2.bias"] = _t(params["text_proj_dense2"]["bias"])
        sd["text_concat_proj.weight"] = _t(params["text_concat_proj"]["kernel"]).T
        sd["text_concat_proj.bias"] = _t(params["text_concat_proj"]["bias"])
    for name in ("cross_attn", "cross_attn_down", "cross_attn_up"):
        if name in params:
            p = params[name]
            sd[f"{name}.to_q.weight"] = _t(p["to_q"]["kernel"]).T
            sd[f"{name}.to_k.weight"] = _t(p["to_k"]["kernel"]).T
            sd[f"{name}.to_v.weight"] = _t(p["to_v"]["kernel"]).T
            sd[f"{name}.to_out.0.weight"] = _t(p["to_out"]["kernel"]).T
            sd[f"{name}.to_out.0.bias"] = _t(p["to_out"]["bias"])
            sd[f"{name}.to_out.1.g"] = _t(p["out_norm"]["g"]).reshape(1, -1)

    for i in range(num_stages):
        _resnet_block_to_torch(params[f"down_{i}_block1"], f"downs.{i}.0", sd)
        _resnet_block_to_torch(params[f"down_{i}_block2"], f"downs.{i}.1", sd)
        _attn_to_torch(
            params[f"down_{i}_attn"], f"downs.{i}.2", sd,
            linear="out_norm" in params[f"down_{i}_attn"],
        )
        if f"down_{i}_down" in params:
            sd[f"downs.{i}.3.1.weight"] = _conv_to_torch(
                params[f"down_{i}_down"]["conv"]["kernel"]
            )
            sd[f"downs.{i}.3.1.bias"] = _t(params[f"down_{i}_down"]["conv"]["bias"])
        else:
            sd[f"downs.{i}.3.weight"] = _conv_to_torch(
                params[f"down_{i}_conv"]["kernel"]
            )
            sd[f"downs.{i}.3.bias"] = _t(params[f"down_{i}_conv"]["bias"])

        _resnet_block_to_torch(params[f"up_{i}_block1"], f"ups.{i}.0", sd)
        _resnet_block_to_torch(params[f"up_{i}_block2"], f"ups.{i}.1", sd)
        _attn_to_torch(
            params[f"up_{i}_attn"], f"ups.{i}.2", sd,
            linear="out_norm" in params[f"up_{i}_attn"],
        )
        if f"up_{i}_up" in params:
            sd[f"ups.{i}.3.1.weight"] = _conv_to_torch(
                params[f"up_{i}_up"]["conv"]["kernel"]
            )
            sd[f"ups.{i}.3.1.bias"] = _t(params[f"up_{i}_up"]["conv"]["bias"])
        else:
            sd[f"ups.{i}.3.weight"] = _conv_to_torch(params[f"up_{i}_conv"]["kernel"])
            sd[f"ups.{i}.3.bias"] = _t(params[f"up_{i}_conv"]["bias"])

    _resnet_block_to_torch(params["mid_block1"], "mid_block1", sd)
    _attn_to_torch(params["mid_attn"], "mid_attn", sd, linear=False)
    _resnet_block_to_torch(params["mid_block2"], "mid_block2", sd)
    _resnet_block_to_torch(params["final_res_block"], "final_res_block", sd)
    sd["final_conv.weight"] = _conv_to_torch(params["final_conv"]["kernel"])
    sd["final_conv.bias"] = _t(params["final_conv"]["bias"])
    return sd


# --------------------------------------------------------------- VAE (LDM)

import re as _re

# (flax module-path regex → torch module-prefix builder). The FINAL group of
# each pattern captures the remaining flax sub-module path (may be empty).
_VAE_PATH_RULES = [
    (r"^(encoder|decoder)/(down|up)_(\d+)_block_(\d+)(?:/(.*))?$",
     lambda m: f"{m.group(1)}.{m.group(2)}.{m.group(3)}.block.{m.group(4)}"),
    (r"^(encoder|decoder)/(down|up)_(\d+)_attn_(\d+)(?:/(.*))?$",
     lambda m: f"{m.group(1)}.{m.group(2)}.{m.group(3)}.attn.{m.group(4)}"),
    (r"^(encoder)/down_(\d+)_downsample(?:/(.*))?$",
     lambda m: f"{m.group(1)}.down.{m.group(2)}.downsample"),
    (r"^(decoder)/up_(\d+)_upsample(?:/(.*))?$",
     lambda m: f"{m.group(1)}.up.{m.group(2)}.upsample"),
    (r"^(encoder|decoder)/mid_(block_1|block_2|attn_1)(?:/(.*))?$",
     lambda m: f"{m.group(1)}.mid.{m.group(2)}"),
    (r"^(encoder|decoder)/(conv_in|conv_out|norm_out)(?:/(.*))?$",
     lambda m: f"{m.group(1)}.{m.group(2)}"),
    (r"^(quant_conv|post_quant_conv)(?:/(.*))?$", lambda m: m.group(1)),
    (r"^quantize(?:/(.*))?$", lambda m: "quantize"),
]


def _vae_flax_path_to_torch_key(path: str):
    """flax param path → (torch key, transform ∈ {'conv_or_dense','plain'})."""
    parts = path.strip("/").split("/")
    leaf = parts[-1]
    if len(parts) >= 2 and parts[-2] == "GroupNorm_0":
        # VAEGroupNorm wraps nn.GroupNorm; torch GroupNorm is weight/bias
        flax_mod = "/".join(parts[:-2])
        torch_leaf = "weight" if leaf == "scale" else "bias"
        transform = "plain"
    elif leaf == "embedding":
        return "quantize.embedding.weight", "plain"
    else:
        flax_mod = "/".join(parts[:-1])
        if leaf == "kernel":
            torch_leaf, transform = "weight", "conv_or_dense"
        else:
            torch_leaf, transform = leaf, "plain"

    for pattern, build in _VAE_PATH_RULES:
        m = _re.match(pattern, flax_mod)
        if m:
            tail = (m.groups()[-1] or "").replace("/", ".")
            prefix = build(m)
            key = ".".join(x for x in (prefix, tail, torch_leaf) if x)
            return key, transform
    return None, None


def vae_params_to_reference_state_dict(params) -> Dict:
    """Flax `VQModel`/`AutoencoderKL` params → CompVis-layout numpy state
    dict (keys as consumed by `ldm/models/autoencoder.py:init_from_ckpt`)."""
    import jax

    sd: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        pstr = "/".join(getattr(p, "key", str(p)) for p in path)
        key, transform = _vae_flax_path_to_torch_key(pstr)
        assert key is not None, f"unmapped VAE param path: {pstr}"
        arr = _t(leaf)
        if transform == "conv_or_dense":
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)  # HWIO → OIHW
            elif arr.ndim == 2:
                arr = arr.T
        sd[key] = arr
    return sd


def reference_vae_state_dict_to_flax(sd: Dict, template_params) -> Dict:
    """CompVis VQModel/AutoencoderKL state dict → Flax params, using the
    target param tree as the naming/shape template."""
    import jax

    flat = jax.tree_util.tree_leaves_with_path(template_params)
    out = jax.tree_util.tree_map(lambda x: x, template_params)

    def set_path(tree, parts, value):
        node = tree
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value

    for path, leaf in flat:
        parts = [getattr(p, "key", str(p)) for p in path]
        pstr = "/".join(parts)
        key, transform = _vae_flax_path_to_torch_key(pstr)
        assert key is not None, f"unmapped VAE param path: {pstr}"
        assert key in sd, f"missing key in state dict: {key}"
        arr = _t(sd[key])
        if transform == "conv_or_dense":
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
            elif arr.ndim == 2:
                arr = arr.T
        assert arr.shape == leaf.shape, (pstr, key, arr.shape, leaf.shape)
        set_path(out, parts, jnp.asarray(arr))
    return out


def load_reference_vae_checkpoint(path, vqmodel, rng=None):
    """Load a reference Lightning VAE ckpt (`state_dict` key) into Flax
    params for `vqmodel` (a `models.vae.VQModel`/`AutoencoderKL`)."""
    import torch
    import jax

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("state_dict", data)
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in sd.items()
    }
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    res = vqmodel.ddconfig["resolution"]
    x0 = jnp.zeros((1, res, res, vqmodel.ddconfig["in_channels"]))
    template = vqmodel.init({"params": rng}, x0)["params"]
    return reference_vae_state_dict_to_flax(sd, template)


def load_reference_checkpoint(path, num_stages: int = 4, use_ema: bool = True):
    """Load a reference `model-<N>.pt` and return
    `{"step": int, "params": flax unet params}`.

    With `use_ema=True` (reference sampling behavior, `sampling.py:157-158`)
    the EMA copy (`ema.ema_model.model.*`) is converted; otherwise the online
    weights (`model.model.*`)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda sd: {
        k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        for k, v in sd.items()
    }

    if use_ema and "ema" in data:
        ema_sd = to_np(data["ema"])
        prefix = "ema_model.model."
        unet_sd = {
            k[len(prefix):]: v for k, v in ema_sd.items() if k.startswith(prefix)
        }
    else:
        model_sd = to_np(data["model"])
        unet_sd = {
            k[len("model."):]: v for k, v in model_sd.items()
            if k.startswith("model.")
        }
    return {
        "step": int(data.get("step", 0)),
        "params": reference_unet_state_dict_to_flax(unet_sd, num_stages),
    }
