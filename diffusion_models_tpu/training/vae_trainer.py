"""VQ-VAE / KL-VAE adversarial training loop.

Replaces the reference's Lightning machinery (`train_VAE.py:76-112`,
`VQModel.training_step` manual two-optimizer optimization,
`ldm/models/autoencoder.py:170-215`) with a plain JAX loop:

  - ONE jitted, donated step containing BOTH phases of the manual
    optimization: autoencoder (reconstruction + codebook + adaptive-weight
    GAN) update, then discriminator (hinge) update on the same
    reconstruction, exactly the reference's sequential order
    (`autoencoder.py:178-207`).
  - Adam(0.5, 0.9) for both optimizers (`autoencoder.py:251-282`).
  - The adaptive discriminator weight ‖∇_last nll‖/‖∇_last g‖ is computed by
    differentiating closures over ONLY the decoder's final conv kernel
    (reference uses `last_layer=decoder.conv_out.weight`,
    `autoencoder.py:186-193`).
  - Data parallel over the mesh exactly like the diffusion Trainer.
  - Periodic val reconstruction dumps (orig ‖ recon side-by-side PNGs +
    latents) mirror the Lightning `SampleCallback`
    (`train/utils/callback.py:23-69`).

Inputs are [-1,1] NHWC (the reference's Normalize transform,
`train_VAE.py:33-37`).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusion_models_tpu.models.discriminator import NLayerDiscriminator
from diffusion_models_tpu.models.vae import AutoencoderKL
from diffusion_models_tpu.parallel.mesh import make_mesh
from diffusion_models_tpu.training.vae_losses import (
    LPIPSWithDiscriminator,
    VQLPIPSWithDiscriminator,
)
from diffusion_models_tpu.utils.checkpoint import CheckpointManager
from diffusion_models_tpu.utils.data import DataLoader, ImageFolderDataset
from diffusion_models_tpu.utils.helpers import cycle
from diffusion_models_tpu.utils.image import save_image_grid
from diffusion_models_tpu.utils.logging import MetricWriter


@struct.dataclass
class VAETrainState:
    step: jnp.ndarray
    g_params: any
    g_opt: any
    d_params: any
    d_opt: any


class VAETrainer:
    def __init__(
        self,
        model,  # VQModel flax module
        train_folder,
        val_folder: Optional[str] = None,
        *,
        loss: Optional[VQLPIPSWithDiscriminator] = None,
        batch_size: int = 128,
        learning_rate: float = 4.5e-6,
        train_num_steps: int = 100000,
        sample_every: int = 1000,
        save_every: int = 1000,
        results_folder: str = "./results_vae",
        image_size: Optional[int] = None,
        mesh=None,
        seed: int = 0,
        num_workers: int = 8,
    ):
        self.model = model
        # KL vs VQ first stage: AutoencoderKL returns (dec, posterior) and is
        # regularized by kl_weight·KL instead of the codebook loss
        # (reference `AutoencoderKL.training_step`, `autoencoder.py:405-424`)
        self.is_kl = isinstance(model, AutoencoderKL)
        if loss is None:
            loss = (
                LPIPSWithDiscriminator(
                    disc_start=0, disc_weight=0.75, kl_weight=1.0
                )
                if self.is_kl
                else VQLPIPSWithDiscriminator(
                    disc_start=0, disc_weight=0.75, codebook_weight=1.0
                )
            )
        self.loss = loss
        self.disc = NLayerDiscriminator(
            input_nc=self.loss.disc_in_channels,
            ndf=self.loss.disc_ndf,
            n_layers=self.loss.disc_num_layers,
        )
        self.batch_size = batch_size
        self.train_num_steps = train_num_steps
        self.sample_every = sample_every
        self.save_every = save_every
        self.image_size = image_size or model.ddconfig["resolution"]

        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.writer = MetricWriter(self.results_folder / "tensorboard_logs")
        self.ckpt = CheckpointManager(self.results_folder)

        from diffusion_models_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        enable_persistent_cache()

        self.mesh = make_mesh() if mesh is None else mesh
        self.batch_sharding = NamedSharding(self.mesh, P("data"))
        self.replicated = NamedSharding(self.mesh, P())

        self.train_ds = ImageFolderDataset(
            train_folder, self.image_size, augment_horizontal_flip=False
        )
        # uint8 host→device transport; the [-1,1] rescale runs on device in
        # the jitted step (see Trainer._denormalize_transport rationale)
        self.train_ds.uint8_transport = True
        self.val_ds = (
            ImageFolderDataset(val_folder, self.image_size)
            if val_folder
            else self.train_ds
        )
        # multi-host: each process loads its disjoint shard of every global
        # batch (same split_batches semantics as the diffusion Trainer)
        per_host_batch = batch_size
        if jax.process_count() > 1:
            assert batch_size % jax.process_count() == 0
            per_host_batch = batch_size // jax.process_count()
        self.dl = cycle(
            DataLoader(
                self.train_ds, batch_size=per_host_batch,
                num_workers=num_workers, seed=seed,
                num_shards=jax.process_count(),
                shard_id=jax.process_index(),
            )
        )

        # two Adam(0.5, 0.9) optimizers (reference `autoencoder.py:251-282`)
        self.g_tx = optax.adam(learning_rate, b1=0.5, b2=0.9)
        self.d_tx = optax.adam(learning_rate, b1=0.5, b2=0.9)

        rng = jax.random.PRNGKey(seed)
        g_rng, d_rng = jax.random.split(rng)
        x0 = jnp.zeros((1, self.image_size, self.image_size, 3), jnp.float32)
        if self.is_kl:
            g_params = self.model.init(
                {"params": g_rng, "dropout": g_rng}, x0, g_rng
            )["params"]
        else:
            g_params = self.model.init(
                {"params": g_rng, "dropout": g_rng}, x0
            )["params"]
        d_params = self.disc.init({"params": d_rng}, x0)["params"]
        self.state = VAETrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_opt=self.g_tx.init(g_params),
            d_params=d_params,
            d_opt=self.d_tx.init(d_params),
        )
        self.state = jax.device_put(self.state, self.replicated)
        self._base_rng = jax.random.PRNGKey(seed + 1)
        self._step_fn = self._build_step()

    # ------------------------------------------------------------ step

    def _reconstruct(self, g_params, x, rng):
        """→ (xrec, reg, extra): reg is the codebook loss (VQ) or the
        posterior (KL); extra is the VQ indices or None."""
        drop_rng, post_rng = jax.random.split(rng)
        if self.is_kl:
            dec, posterior = self.model.apply(
                {"params": g_params}, x, post_rng, train=True,
                rngs={"dropout": drop_rng},
            )
            return dec, posterior, None
        xrec, qloss, ind = self.model.apply(
            {"params": g_params}, x, train=True, rngs={"dropout": drop_rng}
        )
        return xrec, qloss, ind

    def _build_step(self):
        loss_mod = self.loss

        def set_last(g_params, last_w):
            dec = dict(g_params["decoder"])
            conv_out = dict(dec["conv_out"])
            conv_out["kernel"] = last_w
            dec["conv_out"] = conv_out
            out = dict(g_params)
            out["decoder"] = dec
            return out

        def step_fn(state: VAETrainState, x, base_rng):
            if x.dtype == jnp.uint8:
                # uint8 transport: same f32 ops the host used to run
                # ((u/255)*2-1), now on device
                x = x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
            rng = jax.random.fold_in(base_rng, state.step)
            step_f = state.step.astype(jnp.float32)

            # ---------- phase 1: autoencoder/generator
            def gen_loss(g_params):
                xrec, reg, _ = self._reconstruct(g_params, x, rng)
                nll = loss_mod.reconstruction_loss(x, xrec)
                logits_fake = self.disc.apply({"params": state.d_params}, xrec)

                # adaptive d_weight needs ∇nll and ∇g w.r.t. the LAST decoder
                # conv kernel. ONE shared vjp through the reconstruction
                # (fwd once, two pullbacks) instead of two full re-forwards.
                last_w = g_params["decoder"]["conv_out"]["kernel"]

                def recon_of(lw):
                    xr, _, _ = self._reconstruct(set_last(g_params, lw), x, rng)
                    return xr

                xrec2, pullback = jax.vjp(recon_of, last_w)
                d_nll_d_xrec = jax.grad(
                    lambda xr: loss_mod.reconstruction_loss(x, xr)
                )(xrec2)
                d_g_d_xrec = jax.grad(
                    lambda xr: -jnp.mean(self.disc.apply({"params": state.d_params}, xr))
                )(xrec2)

                from diffusion_models_tpu.training.vae_losses import (
                    adaptive_d_weight,
                )

                d_weight = adaptive_d_weight(
                    pullback(d_nll_d_xrec)[0],
                    pullback(d_g_d_xrec)[0],
                    loss_mod.discriminator_weight,
                )
                if self.is_kl:
                    total, aux = loss_mod.generator_loss_kl(
                        reg, nll, logits_fake, d_weight, state.step
                    )
                else:
                    total, aux = loss_mod.generator_loss(
                        reg, nll, logits_fake, d_weight, state.step
                    )
                aux["xrec"] = xrec
                return total, aux

            (g_total, aux), g_grads = jax.value_and_grad(gen_loss, has_aux=True)(
                state.g_params
            )
            g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
            g_params = optax.apply_updates(state.g_params, g_updates)

            # ---------- phase 2: discriminator (on the pre-update xrec,
            # matching the reference's sequential manual optimization)
            xrec = jax.lax.stop_gradient(aux.pop("xrec"))

            def disc_loss(d_params):
                logits_real = self.disc.apply({"params": d_params}, x)
                logits_fake = self.disc.apply({"params": d_params}, xrec)
                return loss_mod.discriminator_loss(
                    logits_real, logits_fake, state.step
                )

            d_total, d_grads = jax.value_and_grad(disc_loss)(state.d_params)
            d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt, state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)

            new_state = VAETrainState(
                step=state.step + 1,
                g_params=g_params,
                g_opt=g_opt,
                d_params=d_params,
                d_opt=d_opt,
            )
            metrics = {"aeloss": g_total, "discloss": d_total, **aux}
            return new_state, metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    # ------------------------------------------------------------ loop

    def next_batch(self):
        batch = next(self.dl)
        if batch.dtype != np.uint8:
            # non-cached datasets deliver f32 [0,1]: rescale on host as before
            batch = (batch * 2.0 - 1.0).astype(np.float32)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                self.batch_sharding, batch
            )
        return jax.device_put(batch, self.batch_sharding)

    def train(self):
        step = int(self.state.step)
        while step < self.train_num_steps:
            batch = self.next_batch()
            self.state, metrics = self._step_fn(self.state, batch, self._base_rng)
            step += 1
            if step % 10 == 0:
                for k in ("aeloss", "discloss", "nll_loss", "quant_loss",
                          "kl_loss"):
                    if k in metrics:
                        self.writer.scalar(f"train/{k}", float(metrics[k]), step)
            if step % self.sample_every == 0:
                self.sample_reconstructions(step)
            if step % self.save_every == 0:
                self.save(step // self.save_every)
        print("vae training complete")

    # ------------------------------------------------------- eval / ckpt

    def sample_reconstructions(self, step: int, n: int = 8):
        """orig ‖ recon side-by-side (SampleCallback parity)."""
        x = np.stack([self.val_ds.get(i) for i in range(min(n, len(self.val_ds)))])
        x = x * 2.0 - 1.0
        if self.is_kl:
            xrec, posterior = self.model.apply(
                {"params": self.state.g_params}, jnp.asarray(x),
                sample_posterior=False,
            )
            latents = posterior.mode()
        else:
            xrec, _, _ = self.model.apply(
                {"params": self.state.g_params}, jnp.asarray(x)
            )
            latents, _, _ = self.model.apply(
                {"params": self.state.g_params}, jnp.asarray(x),
                method=self.model.encode,
            )
        xrec = np.asarray(xrec)
        pair = np.concatenate([x, xrec], axis=2)  # side-by-side along width
        pair = (pair + 1.0) / 2.0
        save_image_grid(
            pair, self.results_folder / f"recon-{step}.png", nrow=1
        )
        # latents for inspection (reference saves latents .pt)
        np.save(self.results_folder / f"latents-{step}.npy", np.asarray(latents))

    def save(self, milestone):
        self.ckpt.save(
            milestone,
            {
                "step": self.state.step,
                "g_params": self.state.g_params,
                "g_opt": self.state.g_opt,
                "d_params": self.state.d_params,
                "d_opt": self.state.d_opt,
            },
        )

    def load(self, milestone):
        template = {
            "step": self.state.step,
            "g_params": self.state.g_params,
            "g_opt": self.state.g_opt,
            "d_params": self.state.d_params,
            "d_opt": self.state.d_opt,
        }
        restored = self.ckpt.restore(milestone, template)
        self.state = VAETrainState(
            step=jnp.asarray(restored["step"], jnp.int32),
            g_params=restored["g_params"],
            g_opt=restored["g_opt"],
            d_params=restored["d_params"],
            d_opt=restored["d_opt"],
        )
        self.state = jax.device_put(self.state, self.replicated)
