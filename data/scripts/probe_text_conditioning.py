"""Conditioning-fidelity probe: sample with specific caption embeddings and
measure hue dominance of the generated patches."""
import sys, hashlib
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/dmt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from pathlib import Path
from diffusion_models_tpu.diffusion.text_conditional import TextConditionalGaussianDiffusion
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.utils.checkpoint import CheckpointManager
from diffusion_models_tpu.utils.image import save_image_grid

MILESTONE = int(sys.argv[1]) if len(sys.argv) > 1 else 4

def embed(caption, dim=512):
    seed = int.from_bytes(hashlib.sha256(caption.encode()).digest()[:8], "little")
    v = np.random.RandomState(seed % (2**32)).normal(size=(dim,))
    return (v / np.linalg.norm(v)).astype(np.float32)

model = Unet(dim=64, dim_mults=(1,2,4,8), channels=3, text_condition=True,
             text_emb_dim=512, use_cross_attn=True, dtype=jnp.bfloat16)
diff = TextConditionalGaussianDiffusion(
    model, image_size=32, timesteps=1000, sampling_timesteps=50,
    embeddings_file="data/color_captions_32/text_embeddings.pkl")
params_template = diff.init(jax.random.PRNGKey(0))
ckpt = CheckpointManager(Path("results/ddpm_text_colors"))
restored = ckpt.restore(MILESTONE, {"step": jnp.zeros((), jnp.int32),
                                    "ema_params": params_template,
                                    "ema_step": jnp.zeros((), jnp.int32)}, partial=True)
params = restored["ema_params"]

B = 64
rows = []
print(f"milestone {MILESTONE}:")
for cap, chan in [("a bright red patch", 0), ("a bright green patch", 1),
                  ("a bright blue patch", 2), ("a dark gray patch", None)]:
    cond = jnp.asarray(np.tile(embed(cap)[None, :], (B, 1)))
    out = np.asarray(diff.ddim_sample(params, jax.random.PRNGKey(5), (B,32,32,3),
                                      sampling_timesteps=50, cond=cond))
    mean = out.mean(axis=(1,2))  # (B,3)
    if chan is None:
        spread = (mean.max(1) - mean.min(1))
        ok = (spread < 12/255) & (mean.mean(1) < 110/255)
        print(f"  {cap!r}: gray+dark match {ok.mean()*100:.0f}% (mean RGB {mean.mean(0).round(3)})")
    else:
        ok = mean.argmax(1) == chan
        print(f"  {cap!r}: hue match {ok.mean()*100:.0f}% (mean RGB {mean.mean(0).round(3)})")
    rows.append(out[:8])
outdir = Path("results/ddpm_text_colors/probe"); outdir.mkdir(parents=True, exist_ok=True)
save_image_grid(np.concatenate(rows, 0), outdir / f"caption_grid_m{MILESTONE}.png", nrow=8)
print("grid saved")
