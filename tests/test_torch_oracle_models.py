"""Full-model activation parity against torch oracles (VERDICT item 3).

`tests/test_torch_parity.py` pins block-level math; these tests pin the
CONVERTERS at full-model level: a reference-architecture torch model is
assembled here from the published layer list (lucidrains
denoising-diffusion-pytorch `denoising_diffusion.py:233-390`; richzhang
LPIPS), initialized randomly, its state dict converted with
`utils/torch_compat.py` / the LPIPS loader, and the converted Flax forward
must match the torch forward to ~1e-4. This is what turns "round-trips"
into "checkpoint-compatible": a transposed conv axis or renamed key passes
every round-trip test but fails here.

No reference code is imported or copied — the oracles are written from the
published formulas, and their BLOCK semantics are independently pinned by
test_torch_parity.py.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# --------------------------------------------------------------------------
# torch oracle: reference-architecture U-Net (published layer list)
# --------------------------------------------------------------------------


class TRMSNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.g = nn.Parameter(torch.zeros(1, dim, 1, 1))

    def forward(self, x):
        return F.normalize(x, dim=1) * self.g * (x.shape[1] ** 0.5)


class TSinusoidalPosEmb(nn.Module):
    def __init__(self, dim, theta=10000):
        super().__init__()
        self.dim, self.theta = dim, theta

    def forward(self, t):
        half = self.dim // 2
        emb = math.log(self.theta) / (half - 1)
        freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
        args = t[:, None].float() * freqs[None, :]
        return torch.cat([args.sin(), args.cos()], dim=-1)


class TBlock(nn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.proj = nn.Conv2d(dim, dim_out, 3, padding=1)
        self.norm = TRMSNorm(dim_out)

    def forward(self, x, scale_shift=None):
        x = self.norm(self.proj(x))
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return F.silu(x)


class TResnetBlock(nn.Module):
    def __init__(self, dim, dim_out, time_emb_dim=None):
        super().__init__()
        if time_emb_dim is not None:
            self.mlp = nn.Sequential(nn.SiLU(), nn.Linear(time_emb_dim, dim_out * 2))
        else:
            self.mlp = None
        self.block1 = TBlock(dim, dim_out)
        self.block2 = TBlock(dim_out, dim_out)
        self.res_conv = (
            nn.Conv2d(dim, dim_out, 1) if dim != dim_out else nn.Identity()
        )

    def forward(self, x, t=None):
        scale_shift = None
        if self.mlp is not None and t is not None:
            te = self.mlp(t)[:, :, None, None]
            scale_shift = te.chunk(2, dim=1)
        h = self.block1(x, scale_shift=scale_shift)
        h = self.block2(h)
        return h + self.res_conv(x)


class TLinearAttention(nn.Module):
    def __init__(self, dim, heads=4, dim_head=32, num_mem_kv=4):
        super().__init__()
        self.scale = dim_head**-0.5
        self.heads, self.dim_head = heads, dim_head
        hidden = heads * dim_head
        self.norm = TRMSNorm(dim)
        self.mem_kv = nn.Parameter(torch.randn(2, heads, dim_head, num_mem_kv))
        self.to_qkv = nn.Conv2d(dim, hidden * 3, 1, bias=False)
        self.to_out = nn.Sequential(nn.Conv2d(hidden, dim, 1), TRMSNorm(dim))

    def forward(self, x):
        b, c, hh, ww = x.shape
        x = self.norm(x)
        qkv = self.to_qkv(x).chunk(3, dim=1)
        # 'b (h c) x y -> b h c (x y)'
        q, k, v = (
            t.view(b, self.heads, self.dim_head, hh * ww) for t in qkv
        )
        mk, mv = (
            m.unsqueeze(0).expand(b, -1, -1, -1) for m in self.mem_kv
        )
        k = torch.cat([mk, k], dim=-1)
        v = torch.cat([mv, v], dim=-1)
        q = q.softmax(dim=-2) * self.scale
        k = k.softmax(dim=-1)
        context = torch.einsum("bhdn,bhen->bhde", k, v)
        out = torch.einsum("bhde,bhdn->bhen", context, q)
        out = out.reshape(b, self.heads * self.dim_head, hh, ww)
        return self.to_out(out)


class TAttention(nn.Module):
    def __init__(self, dim, heads=4, dim_head=32, num_mem_kv=4):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        hidden = heads * dim_head
        self.norm = TRMSNorm(dim)
        self.mem_kv = nn.Parameter(torch.randn(2, heads, num_mem_kv, dim_head))
        self.to_qkv = nn.Conv2d(dim, hidden * 3, 1, bias=False)
        self.to_out = nn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        b, c, hh, ww = x.shape
        x = self.norm(x)
        qkv = self.to_qkv(x).chunk(3, dim=1)
        # 'b (h c) x y -> b h (x y) c'
        q, k, v = (
            t.view(b, self.heads, self.dim_head, hh * ww).transpose(-2, -1)
            for t in qkv
        )
        mk, mv = (
            m.unsqueeze(0).expand(b, -1, -1, -1) for m in self.mem_kv
        )
        k = torch.cat([mk, k], dim=-2)
        v = torch.cat([mv, v], dim=-2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(-2, -1).reshape(b, self.heads * self.dim_head, hh, ww)
        return self.to_out(out)


def t_downsample(dim, dim_out):
    # Rearrange('b c (h p1) (w p2) -> b (c p1 p2) h w') + 1x1 conv
    class Rearr(nn.Module):
        def forward(self, x):
            b, c, h, w = x.shape
            x = x.view(b, c, h // 2, 2, w // 2, 2)
            return x.permute(0, 1, 3, 5, 2, 4).reshape(b, c * 4, h // 2, w // 2)

    return nn.Sequential(Rearr(), nn.Conv2d(dim * 4, dim_out, 1))


def t_upsample(dim, dim_out):
    return nn.Sequential(
        nn.Upsample(scale_factor=2, mode="nearest"),
        nn.Conv2d(dim, dim_out, 3, padding=1),
    )


class TUnet(nn.Module):
    """Reference-architecture U-Net oracle (`denoising_diffusion.py:233-390`
    published layer list), state-dict-key-compatible with the reference
    checkpoints that `torch_compat.py` converts."""

    def __init__(self, dim, dim_mults=(1, 2), channels=3, attn_heads=2,
                 attn_dim_head=8, num_mem_kv=4):
        super().__init__()
        init_dim = dim
        self.init_conv = nn.Conv2d(channels, init_dim, 7, padding=3)
        dims = [init_dim, *(dim * m for m in dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = dim * 4
        self.time_mlp = nn.Sequential(
            TSinusoidalPosEmb(dim),
            nn.Linear(dim, time_dim),
            nn.GELU(),
            nn.Linear(time_dim, time_dim),
        )
        full_attn = (False,) * (len(dim_mults) - 1) + (True,)

        self.downs = nn.ModuleList()
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i == len(in_out) - 1
            attn = (TAttention if full_attn[i] else TLinearAttention)(
                dim_in, heads=attn_heads, dim_head=attn_dim_head,
                num_mem_kv=num_mem_kv,
            )
            self.downs.append(nn.ModuleList([
                TResnetBlock(dim_in, dim_in, time_dim),
                TResnetBlock(dim_in, dim_in, time_dim),
                attn,
                t_downsample(dim_in, dim_out) if not is_last
                else nn.Conv2d(dim_in, dim_out, 3, padding=1),
            ]))

        mid = dims[-1]
        self.mid_block1 = TResnetBlock(mid, mid, time_dim)
        self.mid_attn = TAttention(
            mid, heads=attn_heads, dim_head=attn_dim_head, num_mem_kv=num_mem_kv
        )
        self.mid_block2 = TResnetBlock(mid, mid, time_dim)

        self.ups = nn.ModuleList()
        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == len(in_out) - 1
            attn = (TAttention if tuple(reversed(full_attn))[i]
                    else TLinearAttention)(
                dim_out, heads=attn_heads, dim_head=attn_dim_head,
                num_mem_kv=num_mem_kv,
            )
            self.ups.append(nn.ModuleList([
                TResnetBlock(dim_out + dim_in, dim_out, time_dim),
                TResnetBlock(dim_out + dim_in, dim_out, time_dim),
                attn,
                t_upsample(dim_out, dim_in) if not is_last
                else nn.Conv2d(dim_out, dim_in, 3, padding=1),
            ]))

        self.final_res_block = TResnetBlock(init_dim * 2, init_dim, time_dim)
        self.final_conv = nn.Conv2d(init_dim, channels, 1)

    def forward(self, x, time):
        x = self.init_conv(x)
        r = x.clone()
        t = self.time_mlp(time)
        hs = []
        for block1, block2, attn, down in self.downs:
            x = block1(x, t)
            hs.append(x)
            x = block2(x, t)
            x = attn(x) + x
            hs.append(x)
            x = down(x)
        x = self.mid_block1(x, t)
        x = self.mid_attn(x) + x
        x = self.mid_block2(x, t)
        for block1, block2, attn, up in self.ups:
            x = torch.cat([x, hs.pop()], dim=1)
            x = block1(x, t)
            x = torch.cat([x, hs.pop()], dim=1)
            x = block2(x, t)
            x = attn(x) + x
            x = up(x)
        x = torch.cat([x, r], dim=1)
        x = self.final_res_block(x, t)
        return self.final_conv(x)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)
    return model


def _flax_unet(dim=16):
    from diffusion_models_tpu.models.unet import Unet

    return Unet(
        dim=dim, dim_mults=(1, 2), channels=3, attn_heads=2, attn_dim_head=8,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def oracle():
    m = _randomize(TUnet(16)).eval()
    rs = np.random.RandomState(7)
    x = rs.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([3.0, 700.0], np.float32)
    with torch.no_grad():
        expect = m(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    return m, x, t, expect


def test_unet_torch_to_flax_converted_forward(oracle):
    """torch state dict → Flax params → identical forward (≤1e-4)."""
    from diffusion_models_tpu.utils.torch_compat import (
        reference_unet_state_dict_to_flax,
    )

    model, x, t, expect = oracle
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = reference_unet_state_dict_to_flax(sd, num_stages=2)

    out = _flax_unet().apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)
    )
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_unet_flax_to_torch_exported_forward(oracle):
    """Flax params → reference state dict → loads STRICTLY into the torch
    oracle and reproduces the Flax forward. Catches missing/renamed keys and
    transposed axes in the export direction."""
    from diffusion_models_tpu.utils.torch_compat import (
        unet_params_to_reference_state_dict,
    )

    _, x, t, _ = oracle
    unet = _flax_unet()
    params = unet.init(
        jax.random.PRNGKey(5),
        jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
    )["params"]
    flax_out = np.asarray(
        unet.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t),
        )
    ).transpose(0, 3, 1, 2)

    sd = unet_params_to_reference_state_dict(params, num_stages=2)
    tmodel = TUnet(16).eval()
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    with torch.no_grad():
        torch_out = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(torch_out, flax_out, rtol=1e-4, atol=1e-4)


def test_reference_checkpoint_ema_prefix_roundtrip(tmp_path, oracle):
    """A Trainer-layout `.pt` ({step, model, ema}) loads the EMA weights
    (`sampling.py:157-158` behavior) and the converted forward matches the
    torch oracle that produced them."""
    from diffusion_models_tpu.utils.torch_compat import load_reference_checkpoint

    model, x, t, expect = oracle
    online = _randomize(TUnet(16), seed=99)  # decoy online weights
    ckpt = {
        "step": 1234,
        "model": {f"model.{k}": v for k, v in online.state_dict().items()},
        "ema": {
            **{f"online_model.model.{k}": v for k, v in online.state_dict().items()},
            **{f"ema_model.model.{k}": v for k, v in model.state_dict().items()},
        },
        "version": "test",
    }
    path = tmp_path / "model-1.pt"
    torch.save(ckpt, path)

    loaded = load_reference_checkpoint(path, num_stages=2, use_ema=True)
    assert loaded["step"] == 1234
    out = _flax_unet().apply(
        {"params": loaded["params"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
    )
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# torch oracle: VGG16-LPIPS (richzhang layer list)
# --------------------------------------------------------------------------

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_TAP_AFTER = {1, 3, 6, 9, 12}  # conv index (0-based among convs) of taps


def _torch_vgg16_features():
    layers, cin = [], 3
    for v in _VGG_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU()]
            cin = v
    return nn.Sequential(*layers)


@pytest.mark.slow
def test_lpips_converted_forward_matches_torch_oracle(tmp_path):
    from diffusion_models_tpu.models.lpips import LPIPS, _SHIFT, _SCALE

    g = torch.Generator().manual_seed(11)
    feats = _torch_vgg16_features()
    with torch.no_grad():
        for p in feats.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    lin_chs = [64, 128, 256, 512, 512]
    lins = [torch.rand(c, generator=g) for c in lin_chs]

    # torchvision-style state dict (features.<idx>.*) + richzhang lin keys
    sd = {f"features.{i}.{suffix}": p
          for i, m in enumerate(feats)
          if isinstance(m, nn.Conv2d)
          for suffix, p in (("weight", m.weight.detach()),
                            ("bias", m.bias.detach()))}
    for i, lin in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = lin.reshape(1, -1, 1, 1)
    path = tmp_path / "vgg_lpips.pth"
    torch.save(sd, path)

    lp = LPIPS.load_torch_state_dict(path)

    rs = np.random.RandomState(13)
    x = (rs.rand(2, 32, 32, 3) * 2 - 1).astype(np.float32)
    y = (rs.rand(2, 32, 32, 3) * 2 - 1).astype(np.float32)
    ours = np.asarray(lp(jnp.asarray(x), jnp.asarray(y)))

    # torch oracle forward (richzhang published pipeline)
    def tap_feats(img):
        h = (torch.from_numpy(img).permute(0, 3, 1, 2)
             - torch.from_numpy(_SHIFT).view(1, 3, 1, 1)) / \
            torch.from_numpy(_SCALE).view(1, 3, 1, 1)
        taps, conv_i = [], 0
        for m in feats:
            h = m(h)
            if isinstance(m, nn.Conv2d):
                pass
            if isinstance(m, nn.ReLU):
                if conv_i in _TAP_AFTER:
                    taps.append(h)
                conv_i += 1
        return taps

    with torch.no_grad():
        fx, fy = tap_feats(x), tap_feats(y)
        total = torch.zeros(2)
        for a, b, lin in zip(fx, fy, lins):
            na = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb).pow(2)
            total = total + (d * lin.view(1, -1, 1, 1)).sum(dim=1).mean(dim=(1, 2))
    np.testing.assert_allclose(ours, total.numpy(), rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# torch oracle: FID InceptionV3 (pytorch-fid published architecture)
# --------------------------------------------------------------------------


class TBasicConv(nn.Module):
    def __init__(self, cin, cout, ks, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, ks, stride, padding, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _fid_avg_pool(x):
    # pytorch-fid FIDInception{A,C,E_1}: count_include_pad=False
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TInceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv(cin, 64, 1)
        self.branch5x5_1 = TBasicConv(cin, 48, 1)
        self.branch5x5_2 = TBasicConv(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = TBasicConv(cin, 64, 1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, 3, padding=1)
        self.branch_pool = TBasicConv(cin, pool_features, 1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_fid_avg_pool(x)),
        ], 1)


class TInceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv(cin, 384, 3, stride=2)
        self.branch3x3dbl_1 = TBasicConv(cin, 64, 1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasicConv(cin, 192, 1)
        self.branch7x7_1 = TBasicConv(cin, c7, 1)
        self.branch7x7_2 = TBasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv(cin, c7, 1)
        self.branch7x7dbl_2 = TBasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv(cin, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([
            self.branch1x1(x), b7, bd, self.branch_pool(_fid_avg_pool(x)),
        ], 1)


class TInceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv(cin, 192, 1)
        self.branch3x3_2 = TBasicConv(192, 320, 3, stride=2)
        self.branch7x7x3_1 = TBasicConv(cin, 192, 1)
        self.branch7x7x3_2 = TBasicConv(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv(192, 192, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionE(nn.Module):
    def __init__(self, cin, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = TBasicConv(cin, 320, 1)
        self.branch3x3_1 = TBasicConv(cin, 384, 1)
        self.branch3x3_2a = TBasicConv(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv(cin, 448, 1)
        self.branch3x3dbl_2 = TBasicConv(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = TBasicConv(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv(cin, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "max":  # pytorch-fid FIDInceptionE_2 (Mixed_7c)
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _fid_avg_pool(x)
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class TInceptionV3(nn.Module):
    """pytorch-fid InceptionV3 oracle (1008-class fc, FID pool variants)."""

    def __init__(self, num_classes=1008):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv(32, 32, 3)
        self.Conv2d_2b_3x3 = TBasicConv(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv(64, 80, 1)
        self.Conv2d_4a_3x3 = TBasicConv(80, 192, 3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, pool_mode="avg")
        self.Mixed_7c = TInceptionE(2048, pool_mode="max")
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x01):
        x = x01 * 2 - 1  # pytorch-fid normalize_input
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for blk in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                    self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                    self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = blk(x)
        pool = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return pool, self.fc(pool)


@pytest.mark.slow
def test_inception_converted_forward_matches_torch_oracle():
    from diffusion_models_tpu.models.inception import InceptionV3

    g = torch.Generator().manual_seed(21)
    oracle = TInceptionV3()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.copy_(
                    torch.randn(m.weight.shape, generator=g)
                    * (0.5 / m.weight[0].numel() ** 0.5)
                )
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1
                )
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )
            elif isinstance(m, nn.Linear):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.01)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.01)
    oracle.eval()

    rs = np.random.RandomState(22)
    x = rs.rand(2, 299, 299, 3).astype(np.float32)
    with torch.no_grad():
        tpool, tlogits = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))

    net = InceptionV3(fid_variant=True)
    params = net.load_torch_state_dict(
        {k: v for k, v in oracle.state_dict().items()}
    )
    pool, logits = net.apply(params, jnp.asarray(x), resize=False)

    np.testing.assert_allclose(
        np.asarray(pool), tpool.numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(logits), tlogits.numpy(), rtol=1e-3, atol=2e-4
    )


# --------------------------------------------------------------------------
# torch oracle: CompVis VQ-VAE (latent-diffusion published architecture)
# --------------------------------------------------------------------------


class TVAEResnetBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class TVAEAttnBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.GroupNorm(32, c, eps=1e-6)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        b, c, hh, ww = h.shape
        q = self.q(h).reshape(b, c, hh * ww).permute(0, 2, 1)
        k = self.k(h).reshape(b, c, hh * ww)
        v = self.v(h).reshape(b, c, hh * ww)
        w = torch.bmm(q, k) * (c ** -0.5)
        w = torch.softmax(w, dim=2)
        out = torch.bmm(v, w.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return x + self.proj_out(out)


class TVAEDownsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))  # asym right/bottom pad


class TVAEUpsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _Level(nn.Module):
    pass


_DD = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
           attn_resolutions=[8], in_channels=3, resolution=16,
           z_channels=4, double_z=False)


class TVAEEncoder(nn.Module):
    def __init__(self, cfg=_DD):
        super().__init__()
        ch, mults = cfg["ch"], cfg["ch_mult"]
        self.conv_in = nn.Conv2d(cfg["in_channels"], ch, 3, padding=1)
        self.down = nn.ModuleList()
        curr_res, cin = cfg["resolution"], ch
        for i, m in enumerate(mults):
            lvl = _Level()
            lvl.block, lvl.attn = nn.ModuleList(), nn.ModuleList()
            cout = ch * m
            for _ in range(cfg["num_res_blocks"]):
                lvl.block.append(TVAEResnetBlock(cin, cout))
                cin = cout
                if curr_res in cfg["attn_resolutions"]:
                    lvl.attn.append(TVAEAttnBlock(cin))
            if i != len(mults) - 1:
                lvl.downsample = TVAEDownsample(cin)
                curr_res //= 2
            self.down.append(lvl)
        self.mid = _Level()
        self.mid.block_1 = TVAEResnetBlock(cin, cin)
        self.mid.attn_1 = TVAEAttnBlock(cin)
        self.mid.block_2 = TVAEResnetBlock(cin, cin)
        self.norm_out = nn.GroupNorm(32, cin, eps=1e-6)
        zc = cfg["z_channels"] * (2 if cfg["double_z"] else 1)
        self.conv_out = nn.Conv2d(cin, zc, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for lvl in self.down:
            for j, blk in enumerate(lvl.block):
                h = blk(h)
                if len(lvl.attn) > j:
                    h = lvl.attn[j](h)
            if hasattr(lvl, "downsample"):
                h = lvl.downsample(h)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        return self.conv_out(F.silu(self.norm_out(h)))


class TVAEDecoder(nn.Module):
    def __init__(self, cfg=_DD):
        super().__init__()
        ch, mults = cfg["ch"], cfg["ch_mult"]
        n_lv = len(mults)
        cin = ch * mults[-1]
        curr_res = cfg["resolution"] // 2 ** (n_lv - 1)
        self.conv_in = nn.Conv2d(cfg["z_channels"], cin, 3, padding=1)
        self.mid = _Level()
        self.mid.block_1 = TVAEResnetBlock(cin, cin)
        self.mid.attn_1 = TVAEAttnBlock(cin)
        self.mid.block_2 = TVAEResnetBlock(cin, cin)
        self.up = nn.ModuleList([_Level() for _ in range(n_lv)])
        for i in reversed(range(n_lv)):
            lvl = self.up[i]
            lvl.block, lvl.attn = nn.ModuleList(), nn.ModuleList()
            cout = ch * mults[i]
            for _ in range(cfg["num_res_blocks"] + 1):
                lvl.block.append(TVAEResnetBlock(cin, cout))
                cin = cout
                if curr_res in cfg["attn_resolutions"]:
                    lvl.attn.append(TVAEAttnBlock(cin))
            if i != 0:
                lvl.upsample = TVAEUpsample(cin)
                curr_res *= 2
        self.norm_out = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv_out = nn.Conv2d(cin, cfg["out_ch"], 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        for i in reversed(range(len(self.up))):
            lvl = self.up[i]
            for j, blk in enumerate(lvl.block):
                h = blk(h)
                if len(lvl.attn) > j:
                    h = lvl.attn[j](h)
            if hasattr(lvl, "upsample"):
                h = lvl.upsample(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class TVQModel(nn.Module):
    def __init__(self, n_embed=16, embed_dim=4, cfg=_DD):
        super().__init__()
        self.encoder = TVAEEncoder(cfg)
        self.decoder = TVAEDecoder(cfg)
        self.quantize = _Level()
        self.quantize.embedding = nn.Embedding(n_embed, embed_dim)
        self.quant_conv = nn.Conv2d(cfg["z_channels"], embed_dim, 1)
        self.post_quant_conv = nn.Conv2d(embed_dim, cfg["z_channels"], 1)

    def forward(self, x):
        h = self.quant_conv(self.encoder(x))
        z = h.permute(0, 2, 3, 1).contiguous()
        flat = z.reshape(-1, z.shape[-1])
        e = self.quantize.embedding.weight
        d = (flat.pow(2).sum(1, keepdim=True) - 2 * flat @ e.t()
             + e.pow(2).sum(1)[None])
        idx = d.argmin(1)
        zq = e[idx].view(z.shape).permute(0, 3, 1, 2).contiguous()
        return self.decoder(self.post_quant_conv(zq)), idx


@pytest.fixture(scope="module")
def vq_pair():
    from diffusion_models_tpu.models.vae import VQModel

    g = torch.Generator().manual_seed(31)
    tm = TVQModel()
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)
    tm.eval()
    fm = VQModel(ddconfig=dict(_DD), n_embed=16, embed_dim=4)
    return tm, fm


@pytest.mark.slow
def test_vae_torch_to_flax_converted_forward(vq_pair, tmp_path):
    from diffusion_models_tpu.utils.torch_compat import (
        load_reference_vae_checkpoint,
    )

    tm, fm = vq_pair
    path = tmp_path / "vae.ckpt"
    torch.save({"state_dict": tm.state_dict()}, path)
    params = load_reference_vae_checkpoint(path, fm)

    rs = np.random.RandomState(33)
    x = rs.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        tdec, tidx = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    dec, _, idx = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(idx).reshape(-1), tidx.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(dec).transpose(0, 3, 1, 2), tdec.numpy(),
        rtol=1e-4, atol=1e-4,
    )


def test_vae_flax_to_torch_exported_forward(vq_pair):
    from diffusion_models_tpu.utils.torch_compat import (
        vae_params_to_reference_state_dict,
    )

    tm, fm = vq_pair
    rs = np.random.RandomState(34)
    x = rs.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1
    params = fm.init({"params": jax.random.PRNGKey(35)}, jnp.asarray(x))["params"]
    dec, _, idx = fm.apply({"params": params}, jnp.asarray(x))

    sd = vae_params_to_reference_state_dict(params)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    with torch.no_grad():
        tdec, tidx = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), tidx.numpy())
    np.testing.assert_allclose(
        np.asarray(dec).transpose(0, 3, 1, 2), tdec.numpy(),
        rtol=1e-4, atol=1e-4,
    )
