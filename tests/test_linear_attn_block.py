"""Tests for the whole-block fused LinearAttention Pallas kernel
(`ops/pallas/linear_attn_block.py`).

The kernel runs in Pallas interpret mode on the CPU test mesh; parity is
checked against its plain-jnp twin `linear_attention_block_reference`,
which is itself the exact composition the `models/unet.py::LinearAttention`
jnp path runs (covered by the torch-oracle tests). Also asserts the
three LinearAttention routes (fused / jnp) agree end-to-end through the
Flax module with SHARED parameters, and that gradients flow through the
recompute-backward VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_tpu.models.unet import LinearAttention
from diffusion_models_tpu.ops.pallas.linear_attn_block import (
    _pallas_impl,
    _pallas_impl_v2,
    linear_attention_block,
    linear_attention_block_reference,
)


def _make_weights(rng, c, heads, dim_head, dtype=jnp.float32):
    hid = heads * dim_head
    return dict(
        g1=jnp.asarray(rng.standard_normal((c,)), jnp.float32),
        wqkv=jnp.asarray(rng.standard_normal((c, 3 * hid)) * 0.05, jnp.float32),
        mem_kv=jnp.asarray(rng.standard_normal((2, heads, dim_head, 4)),
                           jnp.float32),
        wout=jnp.asarray(rng.standard_normal((hid, c)) * 0.05, jnp.float32),
        bout=jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32),
        g2=jnp.asarray(rng.standard_normal((c,)), jnp.float32),
    )


@pytest.mark.parametrize(
    "b,n,c,heads,dim_head",
    [
        (2, 64, 32, 4, 16),
        (3, 49, 48, 2, 32),   # odd batch -> bt=1, non-square N
        (1, 256, 64, 4, 32),  # flagship-ish inner-stage shape
    ],
)
def test_kernel_matches_reference_interpret(b, n, c, heads, dim_head):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    w = _make_weights(rng, c, heads, dim_head)
    got = _pallas_impl(x, w["g1"], w["wqkv"], w["mem_kv"], w["wout"],
                       w["bout"], w["g2"], heads=heads, dim_head=dim_head,
                       scale=dim_head**-0.5, interpret=True)
    want = linear_attention_block_reference(
        x, w["g1"], w["wqkv"], w["mem_kv"], w["wout"], w["bout"], w["g2"],
        heads, dim_head, dim_head**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "b,n,c,heads,dim_head",
    [
        (2, 64, 32, 4, 16),
        (3, 49, 48, 2, 32),   # odd batch -> bt=1, non-square N
        (1, 256, 64, 4, 32),  # flagship-ish outer-stage shape (F=128)
    ],
)
def test_kernel_v2_matches_reference_interpret(b, n, c, heads, dim_head):
    """The head-folded full-lane kernel must equal the same jnp twin as v1
    (global-row-max q softmax is shift-invariant within each head; the
    block-diagonal context mask restores exact per-head contractions)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    w = _make_weights(rng, c, heads, dim_head)
    got = _pallas_impl_v2(x, w["g1"], w["wqkv"], w["mem_kv"], w["wout"],
                          w["bout"], w["g2"], heads=heads, dim_head=dim_head,
                          scale=dim_head**-0.5, interpret=True)
    want = linear_attention_block_reference(
        x, w["g1"], w["wqkv"], w["mem_kv"], w["wout"], w["bout"], w["g2"],
        heads, dim_head, dim_head**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_bf16_interpret():
    rng = np.random.default_rng(1)
    heads, dim_head, c = 4, 16, 32
    x = jnp.asarray(rng.standard_normal((2, 64, c)), jnp.bfloat16)
    w = _make_weights(rng, c, heads, dim_head)
    got = _pallas_impl(x, w["g1"], w["wqkv"], w["mem_kv"], w["wout"],
                       w["bout"], w["g2"], heads=heads, dim_head=dim_head,
                       scale=dim_head**-0.5, interpret=True)
    # the jnp twin's bf16 dots can't execute on the CPU DotThunk either, so
    # the oracle runs in f32 (tolerance covers the bf16 rounding)
    want = linear_attention_block_reference(
        x.astype(jnp.float32), w["g1"], w["wqkv"], w["mem_kv"], w["wout"],
        w["bout"], w["g2"], heads, dim_head, dim_head**-0.5)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.1, atol=0.1)


def test_vjp_matches_autodiff_of_reference():
    rng = np.random.default_rng(2)
    heads, dim_head, c = 2, 8, 16
    x = jnp.asarray(rng.standard_normal((2, 16, c)), jnp.float32)
    w = _make_weights(rng, c, heads, dim_head)
    names = ["g1", "wqkv", "mem_kv", "wout", "bout", "g2"]

    def fused(x, *ws):
        return jnp.sum(linear_attention_block(
            x, *ws, heads=heads, dim_head=dim_head,
            scale=dim_head**-0.5) ** 2)

    def plain(x, *ws):
        return jnp.sum(linear_attention_block_reference(
            x, *ws, heads, dim_head, dim_head**-0.5) ** 2)

    args = (x,) + tuple(w[k] for k in names)
    got = jax.grad(fused, argnums=tuple(range(len(args))))(*args)
    want = jax.grad(plain, argnums=tuple(range(len(args))))(*args)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_module_routes_agree_with_shared_params():
    """`LinearAttention(fused_block=...)` both routes produce the same output
    from the SAME param pytree (the raw-param holders replicate the previous
    nn.Dense/nn.Conv/RMSNorm paths and shapes)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    mod_j = LinearAttention(dim=32, heads=4, dim_head=16, fused_block=False)
    params = mod_j.init(jax.random.PRNGKey(0), x, residual=x)
    out_jnp = mod_j.apply(params, x, residual=x)
    # off-TPU the fused route falls back to the jnp twin — still exercises
    # the routing + param plumbing with identical weights
    mod_f = LinearAttention(dim=32, heads=4, dim_head=16, fused_block=True)
    out_fused = mod_f.apply(params, x, residual=x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_jnp),
                               rtol=2e-5, atol=2e-5)


def test_param_tree_matches_pre_refactor_layout():
    """Checkpoint compatibility: the raw-param holders must produce exactly
    the collection paths the previous nn.Dense/nn.Conv/RMSNorm modules made
    (`norm/g`, `to_qkv/kernel`, `mem_kv`, `to_out/{kernel,bias}`,
    `out_norm/g`) with the same shapes."""
    x = jnp.zeros((1, 8, 8, 32), jnp.float32)
    mod = LinearAttention(dim=32, heads=4, dim_head=16)
    params = mod.init(jax.random.PRNGKey(0), x, residual=x)["params"]
    flat = {"/".join(k): v.shape for k, v in
            jax.tree_util.tree_flatten_with_path(params)[0] and
            [(tuple(p.key for p in kp), v) for kp, v in
             jax.tree_util.tree_flatten_with_path(params)[0]]}
    assert flat == {
        "norm/g": (32,),
        "to_qkv/kernel": (32, 3 * 4 * 16),
        "mem_kv": (2, 4, 16, 4),
        "to_out/kernel": (1, 1, 4 * 16, 32),
        "to_out/bias": (32,),
        "out_norm/g": (32,),
    }


@pytest.mark.slow
def test_analytic_bwd_kernel_matches_autodiff_interpret():
    """The hand-derived backward kernel (interpret mode) must match
    jax.grad of the jnp twin for every input: x and all six weight
    tensors, at several shapes including non-divisible batch tiles."""
    from diffusion_models_tpu.ops.pallas.linear_attn_block import (
        _pallas_impl_v2_bwd,
    )

    for seed, (b, n, c, heads, dim_head) in enumerate(
        [(2, 64, 32, 4, 16), (1, 256, 64, 4, 32), (3, 49, 48, 2, 32)]
    ):
        rng = np.random.default_rng(40 + seed)
        x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        w = _make_weights(rng, c, heads, dim_head)
        gy = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        names = ["g1", "wqkv", "mem_kv", "wout", "bout", "g2"]

        got = _pallas_impl_v2_bwd(
            x, *(w[k] for k in names), gy, heads=heads, dim_head=dim_head,
            scale=dim_head**-0.5, interpret=True,
        )

        def f(x, *ws):
            return linear_attention_block_reference(
                x, *ws, heads, dim_head, dim_head**-0.5)

        _, vjp = jax.vjp(f, x, *(w[k] for k in names))
        want = vjp(gy)
        for name, a, bb in zip(["x"] + names, got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-4,
                err_msg=f"grad mismatch for {name} at shape "
                        f"{(b, n, c, heads, dim_head)}",
            )


# --------------------------------------------------------- mesh legality


def test_shard_mapped_kernel_matches_single_device():
    """Round-3 verdict item 2: with the Trainer's mesh registered, the
    wrapper shard_maps the (interpret-mode) Pallas kernel over the data
    axis — outputs must equal the unsharded kernel exactly."""
    from diffusion_models_tpu.parallel.mesh import make_mesh
    from diffusion_models_tpu.ops.pallas.linear_attn_block import (
        set_fused_mesh,
    )

    heads, dim_head, c = 4, 16, 32
    b, n = 16, 64
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    w = _make_weights(rng, c, heads, dim_head)
    names = ["g1", "wqkv", "mem_kv", "wout", "bout", "g2"]

    def call(x, *ws):
        return linear_attention_block(
            x, *ws, heads=heads, dim_head=dim_head, scale=dim_head**-0.5,
            interpret=True)

    want = call(x, *(w[k] for k in names))

    set_fused_mesh(make_mesh(8))
    try:
        got = jax.jit(call)(x, *(w[k] for k in names))
    finally:
        set_fused_mesh(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_shard_mapped_kernel_grads_match_single_device():
    """Gradients through the shard_mapped kernel: the batch-sharded x grad
    and the psum-ed replicated-weight grads must match the unsharded
    custom_vjp (analytic backward kernel) to accumulation-order noise."""
    from diffusion_models_tpu.parallel.mesh import make_mesh
    from diffusion_models_tpu.ops.pallas.linear_attn_block import (
        set_fused_mesh,
    )

    heads, dim_head, c = 2, 8, 16
    b, n = 8, 16
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    w = _make_weights(rng, c, heads, dim_head)
    names = ["g1", "wqkv", "mem_kv", "wout", "bout", "g2"]

    def loss(x, *ws):
        return jnp.sum(linear_attention_block(
            x, *ws, heads=heads, dim_head=dim_head, scale=dim_head**-0.5,
            interpret=True) ** 2)

    want = jax.grad(loss, argnums=tuple(range(7)))(
        x, *(w[k] for k in names))

    set_fused_mesh(make_mesh(8))
    try:
        got = jax.jit(jax.grad(loss, argnums=tuple(range(7))))(
            x, *(w[k] for k in names))
    finally:
        set_fused_mesh(None)
    for name, a, bb in zip(["x"] + names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=5e-4, atol=5e-4,
            err_msg=f"sharded-grad mismatch for {name}")


def test_registered_mesh_indivisible_batch_falls_back():
    """A batch not divisible by the data axis must fall back to the jnp
    twin (GSPMD shards that natively) and stay numerically correct."""
    from diffusion_models_tpu.parallel.mesh import make_mesh
    from diffusion_models_tpu.ops.pallas.linear_attn_block import (
        set_fused_mesh,
    )

    heads, dim_head, c = 2, 8, 16
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((3, 16, c)), jnp.float32)
    w = _make_weights(rng, c, heads, dim_head)
    names = ["g1", "wqkv", "mem_kv", "wout", "bout", "g2"]

    want = linear_attention_block_reference(
        x, *(w[k] for k in names), heads, dim_head, dim_head**-0.5)
    set_fused_mesh(make_mesh(8))
    try:
        got = linear_attention_block(
            x, *(w[k] for k in names), heads=heads, dim_head=dim_head,
            scale=dim_head**-0.5, interpret=True)
    finally:
        set_fused_mesh(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_batch_tile_v2_caps_small_n_budget():
    """Regression for the queue9 leg-2 compile OOM: at the LDM latent-Unet
    site (b=64, n=64, c=64, F=128, bf16) the calibrated 20 MB budget
    selected bt=64, whose ~19.4 MB estimate landed a 16.57 MB Mosaic stack
    — past the 16 MB scoped-VMEM hard limit. Small-n sites must cap the
    estimated budget at 16 MB (bt≤32 here); flagship n=1024 keeps bt=4."""
    from diffusion_models_tpu.ops.pallas.linear_attn_block import (
        _batch_tile_v2,
    )

    assert _batch_tile_v2(64, 64, 64, 128, 2) <= 32
    # the flagship site's occupancy must not regress
    assert _batch_tile_v2(256, 1024, 64, 128, 2) == 4


def test_kernel_v2_4d_input_matches_3d():
    """DMT_LAB_4D experiment: the kernel accepts the conv-shaped
    (B, H, W, C) tensor directly (H·W flattened inside VMEM). Forward and
    gradients must match the token-major (B, N, C) call bit-for-bit in
    interpret mode."""
    rng = np.random.default_rng(11)
    b, h, w_, c, heads, dim_head = 2, 8, 8, 32, 4, 16
    x4 = jnp.asarray(rng.standard_normal((b, h, w_, c)), jnp.float32)
    w = _make_weights(rng, c, heads, dim_head)
    args = (w["g1"], w["wqkv"], w["mem_kv"], w["wout"], w["bout"], w["g2"])

    def run(x):
        return linear_attention_block(
            x, *args, heads=heads, dim_head=dim_head,
            scale=dim_head**-0.5, interpret=True)

    got4 = run(x4)
    assert got4.shape == (b, h, w_, c)
    want = run(x4.reshape(b, h * w_, c))
    np.testing.assert_allclose(
        np.asarray(got4).reshape(b, h * w_, c), np.asarray(want),
        rtol=1e-6, atol=1e-6)

    def loss4(x, *a):
        return jnp.sum(run(x) ** 2)

    g4 = jax.grad(lambda x: jnp.sum(run(x) ** 2))(x4)
    g3 = jax.grad(lambda x: jnp.sum(run(x) ** 2))(x4.reshape(b, h * w_, c))
    assert g4.shape == (b, h, w_, c)
    np.testing.assert_allclose(
        np.asarray(g4).reshape(b, h * w_, c), np.asarray(g3),
        rtol=2e-5, atol=2e-5)

    # weight grads too (the bwd kernel's 4-D x/gy handling)
    gw4 = jax.grad(lambda wq: jnp.sum(linear_attention_block(
        x4, w["g1"], wq, w["mem_kv"], w["wout"], w["bout"], w["g2"],
        heads=heads, dim_head=dim_head, scale=dim_head**-0.5,
        interpret=True) ** 2))(w["wqkv"])
    gw3 = jax.grad(lambda wq: jnp.sum(linear_attention_block(
        x4.reshape(b, h * w_, c), w["g1"], wq, w["mem_kv"], w["wout"],
        w["bout"], w["g2"], heads=heads, dim_head=dim_head,
        scale=dim_head**-0.5, interpret=True) ** 2))(w["wqkv"])
    np.testing.assert_allclose(np.asarray(gw4), np.asarray(gw3),
                               rtol=2e-5, atol=2e-5)
