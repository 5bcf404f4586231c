"""VAE stack tests: encoder/decoder shapes, quantizer, distributions,
VQModel roundtrip, GAN losses, and a VAE trainer smoke step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_models_tpu.models.discriminator import NLayerDiscriminator
from diffusion_models_tpu.models.vae import (
    AutoencoderKL,
    Decoder,
    DiagonalGaussianDistribution,
    Encoder,
    VectorQuantizer,
    VQModel,
)

DDCONFIG = dict(
    double_z=False,
    z_channels=3,
    resolution=32,
    in_channels=3,
    out_ch=3,
    ch=16,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=[],
    dropout=0.0,
)


def test_encoder_decoder_shapes():
    enc = Encoder(**DDCONFIG)
    x = jnp.zeros((2, 32, 32, 3))
    params = enc.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    z = enc.apply({"params": params}, x)
    assert z.shape == (2, 16, 16, 3)  # 32→16, z_channels 3

    dec = Decoder(**DDCONFIG)
    dparams = dec.init({"params": jax.random.PRNGKey(1)}, z)["params"]
    out = dec.apply({"params": dparams}, z)
    assert out.shape == (2, 32, 32, 3)
    # the z_shape API contract consumed by LDM wrappers
    assert dec.z_shape == (1, 16, 16, 3)


def test_encoder_double_z():
    cfg = dict(DDCONFIG, double_z=True)
    enc = Encoder(**cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params = enc.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    z = enc.apply({"params": params}, x)
    assert z.shape == (1, 16, 16, 6)  # 2 * z_channels


def test_encoder_with_attention():
    cfg = dict(DDCONFIG, attn_resolutions=[16])
    enc = Encoder(**cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params = enc.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    z = enc.apply({"params": params}, x)
    assert z.shape == (1, 16, 16, 3)


def test_vector_quantizer():
    vq = VectorQuantizer(n_e=32, e_dim=4, beta=0.25)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    params = vq.init(jax.random.PRNGKey(1), z)["params"]
    z_q, loss, idx = vq.apply({"params": params}, z)
    assert z_q.shape == z.shape
    assert idx.shape == (2, 8, 8)
    assert idx.min() >= 0 and idx.max() < 32
    assert float(loss) >= 0

    # straight-through: gradients flow to z as if identity
    grad = jax.grad(
        lambda zz: jnp.sum(vq.apply({"params": params}, zz)[0])
    )(z)
    np.testing.assert_allclose(np.asarray(grad), 1.0, rtol=1e-5)

    # quantized values come from the codebook
    emb = np.asarray(params["embedding"])
    picked = emb[np.asarray(idx).ravel()]
    # straight-through adds z + (z_q − z) roundoff at f32
    np.testing.assert_allclose(
        np.asarray(z_q).reshape(-1, 4), picked, rtol=1e-3, atol=1e-5
    )


def test_diagonal_gaussian():
    params = jnp.concatenate(
        [jnp.zeros((2, 4, 4, 3)), jnp.zeros((2, 4, 4, 3))], axis=-1
    )
    dist = DiagonalGaussianDistribution(params)
    # standard normal: KL to unit gaussian == 0
    np.testing.assert_allclose(np.asarray(dist.kl()), 0.0, atol=1e-6)
    s = dist.sample(jax.random.PRNGKey(0))
    assert s.shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(dist.mode()), 0.0)


def test_vqmodel_roundtrip():
    model = VQModel(ddconfig=DDCONFIG, n_embed=64, embed_dim=3)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 2 - 1
    params = model.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    dec, diff, ind = model.apply({"params": params}, x)
    assert dec.shape == x.shape
    assert np.isfinite(float(diff))
    quant, _, _ = model.apply({"params": params}, x, method=model.encode)
    assert quant.shape == (2, 16, 16, 3)
    assert model.z_shape == (1, 16, 16, 3)


def test_autoencoder_kl():
    cfg = dict(DDCONFIG, double_z=True)
    model = AutoencoderKL(ddconfig=cfg, embed_dim=3)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 2 - 1
    params = model.init(
        {"params": jax.random.PRNGKey(1)}, x, jax.random.PRNGKey(2)
    )["params"]
    dec, posterior = model.apply(
        {"params": params}, x, jax.random.PRNGKey(3)
    )
    assert dec.shape == x.shape
    assert posterior.mean.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(posterior.kl())))


def test_discriminator_logits():
    disc = NLayerDiscriminator()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = disc.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    logits = disc.apply({"params": params}, x)
    assert logits.ndim == 4 and logits.shape[-1] == 1
    assert np.all(np.isfinite(np.asarray(logits)))


def test_vae_losses():
    from diffusion_models_tpu.training.vae_losses import (
        VQLPIPSWithDiscriminator,
        adopt_weight,
        hinge_d_loss,
    )

    assert float(adopt_weight(1.0, jnp.asarray(5), threshold=10)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(15), threshold=10)) == 1.0

    lr = jnp.ones((2, 4, 4, 1))
    lf = -jnp.ones((2, 4, 4, 1))
    assert float(hinge_d_loss(lr, lf)) == 0.0  # perfectly separated

    loss = VQLPIPSWithDiscriminator(disc_start=0, disc_weight=0.75)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
    xrec = x + 0.1
    nll = loss.reconstruction_loss(x, xrec)
    np.testing.assert_allclose(float(nll), 0.1, rtol=1e-4)


@pytest.mark.slow
def test_vae_trainer_two_steps(tmp_path):
    import jax
    from PIL import Image as PILImage

    from diffusion_models_tpu.training.vae_trainer import VAETrainer

    folder = tmp_path / "imgs"
    folder.mkdir()
    rs = np.random.RandomState(0)
    for i in range(16):
        PILImage.fromarray(
            rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(folder / f"{i}.png")

    model = VQModel(ddconfig=DDCONFIG, n_embed=32, embed_dim=3)
    trainer = VAETrainer(
        model, str(folder), batch_size=8, learning_rate=1e-4,
        train_num_steps=2, sample_every=2, save_every=2,
        results_folder=str(tmp_path / "r"), num_workers=1,
    )
    trainer.train()
    assert int(trainer.state.step) == 2
    assert (tmp_path / "r" / "recon-2.png").exists()
    assert (tmp_path / "r" / "latents-2.npy").exists()
    assert trainer.ckpt.milestones() == [1]

    # checkpoint roundtrip
    trainer2 = VAETrainer(
        model, str(folder), batch_size=8, train_num_steps=2,
        results_folder=str(tmp_path / "r"), num_workers=1,
    )
    trainer2.load(1)
    assert int(trainer2.state.step) == 2


def test_vqmodel_prequant_interface():
    """encode_to_prequant / decode_prequant pair (VQModelInterface parity)."""
    model = VQModel(ddconfig=DDCONFIG, n_embed=64, embed_dim=3)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 2 - 1
    params = model.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    h = model.apply({"params": params}, x, method=model.encode_to_prequant)
    assert h.shape == (2, 16, 16, 3)
    dec = model.apply({"params": params}, h, method=model.decode_prequant)
    assert dec.shape == x.shape
    # matches the full quantized pipeline
    dec_full, _, _ = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec_full), atol=1e-5)


@pytest.mark.slow
def test_kl_vae_trainer_two_steps(tmp_path):
    """AutoencoderKL adversarial training path (reference
    `ldm/models/autoencoder.py:405-424`): two jitted steps, kl_loss logged,
    recon/latents dumps, checkpoint roundtrip."""
    from PIL import Image as PILImage

    from diffusion_models_tpu.training.vae_trainer import VAETrainer

    folder = tmp_path / "imgs"
    folder.mkdir()
    rs = np.random.RandomState(0)
    for i in range(16):
        PILImage.fromarray(
            rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(folder / f"{i}.png")

    dd = dict(DDCONFIG, double_z=True)
    model = AutoencoderKL(ddconfig=dd, embed_dim=3)
    trainer = VAETrainer(
        model, str(folder), batch_size=8, learning_rate=1e-4,
        train_num_steps=2, sample_every=2, save_every=2,
        results_folder=str(tmp_path / "r"), num_workers=1,
    )
    assert trainer.is_kl
    batch = trainer.next_batch()
    state, metrics = trainer._step_fn(trainer.state, batch, trainer._base_rng)
    assert "kl_loss" in metrics and np.isfinite(float(metrics["kl_loss"]))
    assert np.isfinite(float(metrics["aeloss"]))
    assert np.isfinite(float(metrics["discloss"]))
    trainer.state = state

    trainer.train()  # runs the remaining step + milestone dumps
    assert int(trainer.state.step) == 2
    assert (tmp_path / "r" / "recon-2.png").exists()
    lat = np.load(tmp_path / "r" / "latents-2.npy")
    assert lat.shape[-1] == 3  # embed_dim channels (posterior mode)

    trainer2 = VAETrainer(
        model, str(folder), batch_size=8, train_num_steps=2,
        results_folder=str(tmp_path / "r"), num_workers=1,
    )
    trainer2.load(1)
    assert int(trainer2.state.step) == 2
