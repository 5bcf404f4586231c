"""Data-parallel sharding tests on the 8-fake-device CPU mesh.

The JAX-native analogue of the reference's (untested) `accelerate launch`
multi-GPU path (SURVEY.md §2.4): shard the batch over a `data` axis, let XLA
insert the gradient all-reduce, and check the result matches single-device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.parallel.mesh import (
    data_parallel_shardings,
    make_mesh,
    replicate,
    shard_batch,
)


def test_mesh_spans_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == ("data",)


def test_shard_and_replicate():
    mesh = make_mesh()
    batch = np.ones((16, 8, 8, 3), np.float32)
    sharded = shard_batch(batch, mesh)
    assert sharded.sharding.spec == P("data")
    params = {"w": np.ones((4, 4), np.float32)}
    rep = replicate(params, mesh)
    assert rep["w"].sharding.spec == P()


def test_sharded_loss_matches_single_device():
    model = Unet(dim=16, dim_mults=(1, 2), channels=3)
    diff = GaussianDiffusion(
        model, image_size=16, timesteps=20, beta_schedule="cosine"
    )
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 16, 3))
    rng = jax.random.PRNGKey(2)

    loss_fn = lambda p, r, x: diff.loss(p, r, x, train=False)

    # single device
    loss_single = jax.jit(loss_fn)(params, rng, img)

    # sharded over the mesh
    mesh = make_mesh()
    batch_sh, rep_sh = data_parallel_shardings(mesh)
    params_r = jax.device_put(params, rep_sh)
    img_s = jax.device_put(img, batch_sh)
    loss_sharded = jax.jit(loss_fn)(params_r, rng, img_s)

    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=2e-5
    )


def test_sharded_grads_match_single_device():
    model = Unet(dim=8, dim_mults=(1, 2), channels=3)
    diff = GaussianDiffusion(
        model, image_size=8, timesteps=10, beta_schedule="cosine"
    )
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3))
    rng = jax.random.PRNGKey(2)

    grad_fn = jax.grad(lambda p, r, x: diff.loss(p, r, x, train=False))
    g_single = jax.jit(grad_fn)(params, rng, img)

    mesh = make_mesh()
    batch_sh, rep_sh = data_parallel_shardings(mesh)
    g_sharded = jax.jit(grad_fn)(
        jax.device_put(params, rep_sh), rng, jax.device_put(img, batch_sh)
    )

    flat_s = jax.tree_util.tree_leaves(g_single)
    flat_d = jax.tree_util.tree_leaves(g_sharded)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_fsdp_param_sharding_matches_replicated():
    """FSDP-sharded params give the same loss/grads as replicated params —
    XLA inserts the gathers/scatters from the shardings alone."""
    from diffusion_models_tpu.parallel.mesh import shard_params_fsdp

    model = Unet(dim=16, dim_mults=(1, 2), channels=3)
    diff = GaussianDiffusion(
        model, image_size=16, timesteps=10, beta_schedule="cosine"
    )
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 16, 3))
    rng = jax.random.PRNGKey(2)

    loss_fn = lambda p, r, x: diff.loss(p, r, x, train=False)
    loss_rep = jax.jit(loss_fn)(params, rng, img)

    mesh = make_mesh()
    batch_sh, _ = data_parallel_shardings(mesh)
    params_fsdp = shard_params_fsdp(params, mesh, min_size=1024)
    # at least one leaf actually got sharded
    specs = {str(l.sharding.spec) for l in jax.tree_util.tree_leaves(params_fsdp)}
    assert any("data" in s for s in specs)

    loss_fsdp = jax.jit(loss_fn)(
        params_fsdp, rng, jax.device_put(img, batch_sh)
    )
    np.testing.assert_allclose(float(loss_rep), float(loss_fsdp), rtol=2e-5)


def test_tp_param_sharding_matches_replicated():
    """Tensor-parallel weight shardings over a 2-D data×model mesh give the
    same loss as replicated params — GSPMD propagates the channel-sharded
    activations and inserts the per-layer collectives from the weight
    shardings alone."""
    from diffusion_models_tpu.parallel.mesh import make_mesh_2d, shard_params_tp

    model = Unet(dim=16, dim_mults=(1, 2), channels=3)
    diff = GaussianDiffusion(
        model, image_size=16, timesteps=10, beta_schedule="cosine"
    )
    params = diff.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 16, 3))
    rng = jax.random.PRNGKey(2)

    loss_fn = lambda p, r, x: diff.loss(p, r, x, train=False)
    loss_rep = jax.jit(loss_fn)(params, rng, img)

    mesh = make_mesh_2d(model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    params_tp = shard_params_tp(params, mesh, min_size=256)
    specs = {str(l.sharding.spec) for l in jax.tree_util.tree_leaves(params_tp)}
    assert any("model" in s for s in specs), specs

    batch_sh = NamedSharding(mesh, P("data"))
    loss_tp = jax.jit(loss_fn)(params_tp, rng, jax.device_put(img, batch_sh))
    np.testing.assert_allclose(float(loss_rep), float(loss_tp), rtol=2e-5)


@pytest.mark.slow
def test_tp_trainer_step_matches_replicated(tmp_path):
    """One full Trainer step (grad accum + clip + Adam + EMA) with
    param_sharding='tp' on a 2-D mesh produces the same parameters as the
    replicated data-parallel step."""
    from diffusion_models_tpu.parallel.mesh import make_mesh_2d
    from diffusion_models_tpu.training.trainer import Trainer

    class SyntheticDataset:
        def __len__(self):
            return 32

        def get(self, i, rng=None):
            rs = np.random.RandomState(i)
            return rs.rand(12, 12, 3).astype(np.float32)

    def build(mesh, param_sharding, folder):
        model = Unet(dim=8, dim_mults=(1, 2), channels=3)
        diff = GaussianDiffusion(
            model, image_size=12, timesteps=10, sampling_timesteps=2,
            beta_schedule="cosine",
        )
        return Trainer(
            diff,
            dataset=SyntheticDataset(),
            train_batch_size=16,
            train_num_steps=1,
            calculate_fid=False,
            calculate_is=False,
            results_folder=str(folder),
            mesh=mesh,
            seed=7,
            num_workers=1,
            param_sharding=param_sharding,
        )

    t_rep = build(make_mesh(), "replicated", tmp_path / "rep")
    b = t_rep.next_batch()
    state_rep, loss_rep = t_rep._train_step(t_rep.state, b, t_rep._base_rng)

    t_tp = build(make_mesh_2d(model_parallel=2), "tp", tmp_path / "tp")
    b2 = t_tp.next_batch()
    state_tp, loss_tp = t_tp._train_step(t_tp.state, b2, t_tp._base_rng)

    np.testing.assert_allclose(float(loss_rep), float(loss_tp), rtol=2e-5)
    for a, c in zip(
        jax.tree_util.tree_leaves(state_rep.params),
        jax.tree_util.tree_leaves(state_tp.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=5e-4, atol=2e-6
        )


def test_eval_sampling_sharded_over_data_axis(tmp_path):
    """Milestone-eval sampling partitions the reverse-diffusion scan over
    the data axis (without the `_jit_sample` constraint GSPMD replicates
    the whole sampler on every device) and produces the same samples as a
    single-device mesh at the same seed."""
    from jax.sharding import Mesh
    from diffusion_models_tpu.training.trainer import Trainer

    class SyntheticDataset:
        def __len__(self):
            return 32

        def get(self, i, rng=None):
            rs = np.random.RandomState(i)
            return rs.rand(12, 12, 3).astype(np.float32)

    def build(mesh, folder):
        model = Unet(dim=8, dim_mults=(1, 2), channels=3)
        diff = GaussianDiffusion(
            model, image_size=12, timesteps=10, sampling_timesteps=2,
            beta_schedule="cosine",
        )
        return Trainer(
            diff,
            dataset=SyntheticDataset(),
            train_batch_size=16,
            train_num_steps=1,
            calculate_fid=False,
            calculate_is=False,
            results_folder=str(folder),
            mesh=mesh,
            seed=7,
            num_workers=1,
        )

    t8 = build(make_mesh(), tmp_path / "m8")
    out8 = t8._jit_sample(
        t8.state.ema.params, jax.random.PRNGKey(3), 16
    )
    assert out8.sharding.spec == P("data")

    # the scan itself must be partitioned, not just the final output:
    # the compiled module's per-device tensors carry batch 16/8 = 2
    compiled = Trainer._jit_sample.lower(
        t8, t8.state.ema.params, jax.random.PRNGKey(3), 16
    ).compile()
    assert "f32[2,12,12,3]" in compiled.as_text()

    t1 = build(Mesh(np.array(jax.devices()[:1]), ("data",)), tmp_path / "m1")
    out1 = t1._jit_sample(
        t1.state.ema.params, jax.random.PRNGKey(3), 16
    )
    np.testing.assert_allclose(
        np.asarray(out8), np.asarray(out1), rtol=2e-5, atol=2e-6
    )


@pytest.mark.slow
@pytest.mark.parametrize("sharding", ["fsdp", "tp"])
def test_sharded_resume_preserves_placement(tmp_path, sharding):
    """Round-3 verdict item 5: `Trainer.load()` must restore onto the
    placement `param_sharding` dictates — not blanket-replicate (which
    would OOM any model that needed FSDP in the first place). Trains 2
    steps sharded, saves, reloads into a fresh trainer, and asserts both
    the leaf shardings and the next-step loss match the uninterrupted
    run."""
    from diffusion_models_tpu.parallel.mesh import make_mesh_2d
    from diffusion_models_tpu.training.trainer import Trainer

    class SyntheticDataset:
        def __len__(self):
            return 32

        def get(self, i, rng=None):
            rs = np.random.RandomState(i)
            return rs.rand(12, 12, 3).astype(np.float32)

    def build(folder):
        mesh = (make_mesh() if sharding == "fsdp"
                else make_mesh_2d(model_parallel=2))
        model = Unet(dim=8, dim_mults=(1, 2), channels=3)
        diff = GaussianDiffusion(
            model, image_size=12, timesteps=10, sampling_timesteps=2,
            beta_schedule="cosine",
        )
        return Trainer(
            diff,
            dataset=SyntheticDataset(),
            train_batch_size=16,
            train_num_steps=4,
            calculate_fid=False,
            calculate_is=False,
            results_folder=str(folder),
            mesh=mesh,
            seed=7,
            num_workers=1,
            param_sharding=sharding,
            # the tiny test Unet has no 2^16-element leaf; lower the FSDP
            # threshold so some params actually shard
            fsdp_min_size=2**8,
        )

    t1 = build(tmp_path / "run")
    for _ in range(2):
        t1.state, _ = t1._train_step(t1.state, t1.next_batch(), t1._base_rng)
    t1.save(1)

    want_shardings = jax.tree_util.tree_map(
        lambda x: x.sharding, t1.state.params
    )
    # the premise: at least one param is actually sharded
    assert any(
        s.spec != P() for s in jax.tree_util.tree_leaves(
            want_shardings, is_leaf=lambda s: hasattr(s, "spec"))
    ), "test premise broken: no param leaf is sharded"

    b3 = t1.next_batch()
    _, loss_uninterrupted = t1._train_step(t1.state, b3, t1._base_rng)

    t2 = build(tmp_path / "run")  # same folder -> same checkpoints
    t2.load(1)
    got_shardings = jax.tree_util.tree_map(
        lambda x: x.sharding, t2.state.params
    )
    for name_want, name_got in zip(
        jax.tree_util.tree_leaves_with_path(want_shardings,
                                            is_leaf=lambda s: hasattr(s, "spec")),
        jax.tree_util.tree_leaves_with_path(got_shardings,
                                            is_leaf=lambda s: hasattr(s, "spec")),
    ):
        def _norm(spec):
            # P(None, 'data') and P(None, 'data', None) place identically —
            # strip trailing Nones before comparing
            t = tuple(spec)
            while t and t[-1] is None:
                t = t[:-1]
            return t

        assert _norm(name_want[1].spec) == _norm(name_got[1].spec), (
            f"resume changed the sharding of {name_want[0]}: "
            f"{name_want[1].spec} -> {name_got[1].spec}"
        )

    _, loss_resumed = t2._train_step(t2.state, b3, t2._base_rng)
    np.testing.assert_allclose(
        float(loss_uninterrupted), float(loss_resumed), rtol=2e-5
    )


def test_fsdp_trainer_clears_stale_fused_mesh(tmp_path):
    """Round-4 VERDICT item 4 / advisor medium: the fused-kernel mesh
    registry is process-global and read at trace time. A replicated
    Trainer registers its mesh; an fsdp/tp Trainer constructed AFTERWARDS
    in the same process must clear that registration before it builds its
    train step — otherwise its sharded weights would be routed through the
    replicated-weight shard_map wrapper. This test does not rely on the
    conftest autouse reset: both constructions happen inside one test."""
    from diffusion_models_tpu.ops.pallas.linear_attn_block import (
        get_fused_mesh,
    )
    from diffusion_models_tpu.training.trainer import Trainer

    class SyntheticDataset:
        def __len__(self):
            return 32

        def get(self, i, rng=None):
            rs = np.random.RandomState(i)
            return rs.rand(12, 12, 3).astype(np.float32)

    def build(param_sharding, folder):
        model = Unet(dim=8, dim_mults=(1, 2), channels=3)
        diff = GaussianDiffusion(
            model, image_size=12, timesteps=10, sampling_timesteps=2,
            beta_schedule="cosine",
        )
        return Trainer(
            diff,
            dataset=SyntheticDataset(),
            train_batch_size=16,
            train_num_steps=1,
            calculate_fid=False,
            calculate_is=False,
            results_folder=str(folder),
            mesh=make_mesh(),
            seed=7,
            num_workers=1,
            param_sharding=param_sharding,
        )

    t_rep = build("replicated", tmp_path / "rep")
    reg = get_fused_mesh()
    assert reg is not None and reg[0] is t_rep.mesh and reg[1] == "data"

    t_fsdp = build("fsdp", tmp_path / "fsdp")
    assert get_fused_mesh() is None, (
        "fsdp Trainer construction left a stale fused-mesh registration"
    )

    # the fsdp model still trains correctly on the plain-XLA path
    b = t_fsdp.next_batch()
    _, loss = t_fsdp._train_step(t_fsdp.state, b, t_fsdp._base_rng)
    assert np.isfinite(float(loss))

    # and a later replicated Trainer re-registers its own mesh
    t_rep2 = build("replicated", tmp_path / "rep2")
    reg2 = get_fused_mesh()
    assert reg2 is not None and reg2[0] is t_rep2.mesh
