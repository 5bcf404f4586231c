"""Round-trip tests for the reference-checkpoint weight converter."""

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.utils.torch_compat import (
    reference_unet_state_dict_to_flax,
    unet_params_to_reference_state_dict,
)


def make_params(**kw):
    model = Unet(dim=8, dim_mults=(1, 2), channels=3, **kw)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    return model, model.init({"params": jax.random.PRNGKey(0)}, x, t)["params"]


def test_roundtrip_exact():
    model, params = make_params()
    sd = unet_params_to_reference_state_dict(params, num_stages=2)
    back = reference_unet_state_dict_to_flax(sd, num_stages=2)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(
        (jax.tree_util.keystr(p), np.asarray(v))
        for p, v in jax.tree_util.tree_leaves_with_path(back)
    )
    assert len(flat_a) == len(flat_b)
    for path, v in flat_a:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(v), flat_b[key], err_msg=key)


def test_state_dict_has_reference_naming():
    _, params = make_params()
    sd = unet_params_to_reference_state_dict(params, num_stages=2)
    # spot-check the reference's module naming scheme
    for key in [
        "init_conv.weight",
        "time_mlp.1.weight",
        "downs.0.0.block1.proj.weight",
        "downs.0.0.mlp.1.weight",
        "downs.0.2.to_qkv.weight",
        "downs.0.2.to_out.0.weight",  # linear attention Sequential
        "downs.0.3.1.weight",         # pixel-unshuffle downsample conv
        "mid_attn.to_out.weight",     # full attention plain conv
        "ups.0.0.res_conv.weight",
        "ups.0.3.1.weight",           # upsample conv
        "final_conv.weight",
    ]:
        assert key in sd, key
    # torch layouts
    assert sd["init_conv.weight"].shape == (8, 3, 7, 7)  # OIHW
    assert sd["downs.0.0.block1.norm.g"].shape == (1, 8, 1, 1)


def test_converted_params_run_forward():
    model, params = make_params()
    sd = unet_params_to_reference_state_dict(params, num_stages=2)
    back = reference_unet_state_dict_to_flax(sd, num_stages=2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.array([1, 5], jnp.int32)
    out_a = model.apply({"params": params}, x, t)
    out_b = model.apply({"params": back}, x, t)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_torch_checkpoint_loading(tmp_path):
    """Full .pt flow: build a reference-layout checkpoint with torch tensors,
    load through load_reference_checkpoint."""
    import torch

    from diffusion_models_tpu.utils.torch_compat import load_reference_checkpoint

    model, params = make_params()
    sd = unet_params_to_reference_state_dict(params, num_stages=2)
    torch_sd = {f"ema_model.model.{k}": torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}
    ckpt = {"step": 123, "ema": torch_sd, "version": "ref"}
    path = tmp_path / "model-1.pt"
    torch.save(ckpt, path)

    restored = load_reference_checkpoint(path, num_stages=2, use_ema=True)
    assert restored["step"] == 123
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    out_a = model.apply({"params": params}, x, t)
    out_b = model.apply({"params": restored["params"]}, x, t)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


# ------------------------------------------------------------------ VAE


def make_vae():
    from diffusion_models_tpu.models.vae import VQModel

    dd = dict(double_z=False, z_channels=3, resolution=32, in_channels=3,
              out_ch=3, ch=16, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=[16], dropout=0.0)
    model = VQModel(ddconfig=dd, n_embed=32, embed_dim=3)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    return model, params


def test_vae_roundtrip_exact():
    from diffusion_models_tpu.utils.torch_compat import (
        reference_vae_state_dict_to_flax,
        vae_params_to_reference_state_dict,
    )

    model, params = make_vae()
    sd = vae_params_to_reference_state_dict(params)
    back = reference_vae_state_dict_to_flax(sd, params)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(pa)
        )


def test_vae_state_dict_compvis_naming():
    from diffusion_models_tpu.utils.torch_compat import (
        vae_params_to_reference_state_dict,
    )

    _, params = make_vae()
    sd = vae_params_to_reference_state_dict(params)
    for key in [
        "encoder.conv_in.weight",
        "encoder.down.0.block.0.norm1.weight",
        "encoder.down.0.block.0.conv1.weight",
        "encoder.down.0.downsample.conv.weight",
        "encoder.mid.block_1.conv1.weight",
        "encoder.mid.attn_1.q.weight",
        "encoder.norm_out.weight",
        "decoder.up.1.block.0.conv1.weight",
        "decoder.up.1.upsample.conv.weight",
        "quantize.embedding.weight",
        "quant_conv.weight",
        "post_quant_conv.weight",
    ]:
        assert key in sd, (key, sorted(sd)[:20])
    assert sd["encoder.conv_in.weight"].shape == (16, 3, 3, 3)  # OIHW
    assert sd["quantize.embedding.weight"].shape == (32, 3)


def test_vae_lightning_checkpoint_loading(tmp_path):
    import torch

    from diffusion_models_tpu.utils.torch_compat import (
        load_reference_vae_checkpoint,
        vae_params_to_reference_state_dict,
    )

    model, params = make_vae()
    sd = vae_params_to_reference_state_dict(params)
    ckpt = {"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}}
    path = tmp_path / "vae.ckpt"
    torch.save(ckpt, path)

    restored = load_reference_vae_checkpoint(path, model)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    out_a, _, _ = model.apply({"params": params}, x)
    out_b, _, _ = model.apply({"params": restored}, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_text_conditional_roundtrip():
    from diffusion_models_tpu.utils.torch_compat import (
        reference_unet_state_dict_to_flax,
        unet_params_to_reference_state_dict,
    )

    model = Unet(
        dim=8, dim_mults=(1, 2), channels=3,
        text_condition=True, text_emb_dim=16, use_cross_attn=True,
    )
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    emb = jnp.zeros((1, 16))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t, None, emb)[
        "params"
    ]
    sd = unet_params_to_reference_state_dict(params, num_stages=2)
    for key in ("cross_attn.to_q.weight", "cross_attn_down.to_out.1.g",
                "cross_attn_up.to_k.weight"):
        assert key in sd

    back = reference_unet_state_dict_to_flax(sd, num_stages=2)
    out_a = model.apply({"params": params}, x, t, None, emb)
    out_b = model.apply({"params": back}, x, t, None, emb)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_text_embed_concat_roundtrip():
    from diffusion_models_tpu.utils.torch_compat import (
        reference_unet_state_dict_to_flax,
        unet_params_to_reference_state_dict,
    )

    model = Unet(
        dim=8, dim_mults=(1, 2), channels=3,
        text_condition=True, text_emb_dim=16, use_cross_attn=False,
    )
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    emb = jnp.ones((1, 16))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t, None, emb)[
        "params"
    ]
    sd = unet_params_to_reference_state_dict(params, num_stages=2)
    assert "text_proj.0.weight" in sd and "text_concat_proj.weight" in sd
    back = reference_unet_state_dict_to_flax(sd, num_stages=2)
    out_a = model.apply({"params": params}, x, t, None, emb)
    out_b = model.apply({"params": back}, x, t, None, emb)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
