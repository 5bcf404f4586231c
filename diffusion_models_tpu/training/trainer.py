"""Training loop for diffusion models — the reference `Trainer` rebuilt for TPU.

Capability parity with `denoising_diffusion.py:938-1249`: gradient
accumulation, grad clipping at `max_grad_norm`, Adam(0.9, 0.99), EMA
(β=0.995 every 10 steps) used for all sampling/eval, periodic sample grids +
FID/IS, milestone checkpoints with best/latest tracking, TensorBoard scalars,
and a `training_params.json` dump.

TPU-native architecture (vs. the reference's Accelerate/DDP loop):

  - ONE jitted, donated train step containing: microbatch `lax.scan` for
    gradient accumulation, loss/grad, global-norm clip, Adam update, and the
    EMA tick. The reference's per-step barriers
    (`accelerator.wait_for_everyone`, :1179,1185) have no equivalent —
    SPMD programs are globally synchronized by construction.
  - Data parallelism by sharding: batches are placed with
    `NamedSharding(P(None, 'data'))` over the mesh; XLA inserts the gradient
    all-reduce over ICI inside the compiled step (replacing NCCL DDP,
    :971-974,1175).
  - `split_batches=True` semantics: `train_batch_size` is the *global* batch,
    divided across devices by the sharding.
  - RNG is derived per-step by `fold_in(seed_key, step)` — resuming from a
    checkpoint reproduces the exact noise sequence.
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusion_models_tpu.parallel.mesh import make_mesh
from diffusion_models_tpu.utils.checkpoint import CheckpointManager
from diffusion_models_tpu.utils.data import DataLoader, ImageFolderDataset
from diffusion_models_tpu.utils.ema import EMAState, ema_init, ema_update
from diffusion_models_tpu.utils.helpers import (
    cycle,
    default,
    exists,
    has_int_squareroot,
    num_to_groups,
)
from diffusion_models_tpu.utils.image import save_image_grid
from diffusion_models_tpu.utils.logging import MetricWriter


def build_lr_schedule(config: Optional[dict]):
    """Reconstruct a step→lr callable from its JSON-able description
    (the `lr_schedule_config` recorded in training_params.json), so a
    resumed or re-swept run uses the exact original schedule."""
    if config is None:
        return None
    if config["type"] == "constant":
        base = float(config["base_lr"])
        return lambda step: jnp.full((), base, jnp.float32)
    if config["type"] == "inv_sqrt":
        # EDM2 recipe: lr(step) = base / sqrt(max(1, step / t_ref))
        base, t_ref = float(config["base_lr"]), float(config["t_ref"])
        return lambda step: base / jnp.sqrt(jnp.maximum(1.0, step / t_ref))
    raise ValueError(f"unknown lr_schedule type: {config['type']!r}")


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: any
    opt_state: any
    ema: EMAState


class Trainer:
    """Unconditional-diffusion trainer. Conditional trainers subclass and
    override the batch→(img, cond) mapping plus sampling-time conditioning."""

    def __init__(
        self,
        diffusion_model,
        folder: Optional[str] = None,
        *,
        dataset=None,
        train_batch_size: int = 16,
        gradient_accumulate_every: int = 1,
        augment_horizontal_flip: bool = True,
        train_lr: float = 1e-4,
        train_num_steps: int = 100000,
        ema_update_every: int = 10,
        ema_decay: float = 0.995,
        adam_betas=(0.9, 0.99),
        save_and_sample_every: int = 1000,
        num_samples: int = 25,
        results_folder: str = "./results",
        convert_image_to: Optional[str] = None,
        calculate_fid: bool = True,
        calculate_is: bool = False,
        inception_weights: Optional[str] = None,
        max_grad_norm: float = 1.0,
        num_fid_samples: int = 50000,
        save_best_and_latest_only: bool = False,
        mesh=None,
        seed: int = 0,
        num_workers: int = 8,
        detect_anomalies: bool = False,
        checkpoint_on_preemption: bool = True,
        post_update_fn=None,
        steps_per_call: int = 1,
        lr_schedule=None,
        lr_schedule_config: Optional[dict] = None,
        param_sharding: str = "replicated",
        fsdp_min_size: int = 2**16,
    ):
        assert has_int_squareroot(num_samples), "number of samples must have an integer sqrt"
        self.diffusion = diffusion_model
        self.batch_size = train_batch_size
        self.gradient_accumulate_every = gradient_accumulate_every
        assert (
            train_batch_size * gradient_accumulate_every >= 16
        ), "your effective batch size should be at least 16"
        self.train_num_steps = train_num_steps
        self.save_and_sample_every = save_and_sample_every
        self.num_samples = num_samples
        self.max_grad_norm = max_grad_norm
        self.ema_decay = ema_decay
        self.ema_update_every = ema_update_every
        self.train_lr = train_lr
        self.adam_betas = tuple(adam_betas)
        # optional params→params transform applied inside the jitted step
        # right after the optimizer update (e.g. Karras MP forced weight
        # renormalization, `models/karras_unet.normalize_karras_weights`)
        self.post_update_fn = post_update_fn
        # optimizer steps fused into ONE jitted call via lax.scan — amortizes
        # per-dispatch host↔device latency (dominant on tunneled/remote TPUs)
        # over K steps; semantics are identical to K separate calls.
        assert steps_per_call >= 1
        if steps_per_call > 1:
            assert save_and_sample_every % steps_per_call == 0, (
                "steps_per_call must divide save_and_sample_every so "
                "milestones land on call boundaries"
            )
            assert train_num_steps % steps_per_call == 0
        self.steps_per_call = steps_per_call
        self.seed = seed
        # JSON-able description of `lr_schedule` ({"type", "t_ref",
        # "base_lr"}); lands in training_params.json so a sweep can
        # reconstruct the run's optimizer exactly (a callable schedule is
        # not JSON-able and would silently vanish from the dump)
        self.lr_schedule_config = lr_schedule_config
        self.num_fid_samples = num_fid_samples
        self.save_best_and_latest_only = save_best_and_latest_only
        self.calculate_fid = calculate_fid
        self.calculate_is = calculate_is
        self.inception_weights = inception_weights

        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.writer = MetricWriter(self.results_folder / "tensorboard_logs")
        self.ckpt = CheckpointManager(self.results_folder)

        # persistent XLA cache: repeat CLI runs (resume/sweep) skip the
        # multi-minute TPU compile (no-op on CPU, DMT_COMPILE_CACHE=0 off)
        from diffusion_models_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        enable_persistent_cache()

        # --- mesh & shardings (data parallel over all devices)
        self.mesh = make_mesh() if mesh is None else mesh
        self.batch_sharding = NamedSharding(self.mesh, P(None, "data"))
        # (steps_per_call, accum, B, ...) layout for fused multi-step calls
        self.multi_batch_sharding = NamedSharding(self.mesh, P(None, None, "data"))
        self.replicated = NamedSharding(self.mesh, P())

        # --- data
        if dataset is None:
            assert exists(folder), "provide either `folder` or `dataset`"
            dataset = self.build_dataset(
                folder,
                augment_horizontal_flip=augment_horizontal_flip,
                convert_image_to=convert_image_to,
            )
        self.dataset = dataset
        self.folder = folder
        # image batches travel host→device as uint8 (4× less transfer); the
        # /255 runs on device inside the jitted step (`_denormalize_transport`)
        # — bit-identical to host-side normalization. Datasets that don't
        # implement the flag simply keep returning f32.
        if hasattr(dataset, "uint8_transport"):
            dataset.uint8_transport = True
        # multi-host: each process loads its disjoint shard of every global
        # batch (reference `split_batches=True` semantics, SURVEY.md §2.4)
        per_host_batch = train_batch_size
        if jax.process_count() > 1:
            assert train_batch_size % jax.process_count() == 0
            per_host_batch = train_batch_size // jax.process_count()
        self.dl = cycle(
            DataLoader(
                dataset,
                batch_size=per_host_batch,
                num_workers=num_workers,
                seed=seed,
                num_shards=jax.process_count(),
                shard_id=jax.process_index(),
                # deep enough for one full fused call to be pre-staged while
                # the previous call runs on device
                prefetch=max(4, 2 * steps_per_call * gradient_accumulate_every),
            )
        )

        # --- optimizer. `lr_schedule` (a step→lr callable, e.g. the
        # inverse-sqrt decay the EDM2/Karras recipe pairs with forced
        # weight normalization) overrides the constant rate.
        self.tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adam(
                lr_schedule if lr_schedule is not None else train_lr,
                b1=adam_betas[0], b2=adam_betas[1],
            ),
        )

        # --- state. `param_sharding` picks the parameter-placement strategy:
        #   "replicated" — pure DP, params/opt/EMA live whole on every chip
        #     (fastest for reference-sized ≤~100M-param denoisers);
        #   "fsdp" — each large param split over the `data` axis, XLA inserts
        #     all-gathers on use / reduce-scatters on grads;
        #   "tp" — Megatron-style tensor parallelism over a `model` mesh axis
        #     (requires a 2-D mesh from `make_mesh_2d`): kernels sharded on
        #     their feature dims, activations channel-sharded through each
        #     layer. Optimizer moments and the EMA inherit the param shardings
        #     via GSPMD propagation through the jitted inits below.
        assert param_sharding in ("replicated", "fsdp", "tp"), param_sharding
        self.param_sharding = param_sharding
        params = self.diffusion.init(jax.random.PRNGKey(seed))
        if param_sharding == "replicated":
            self.state = jax.device_put(
                TrainState(
                    step=jnp.zeros((), jnp.int32),
                    params=params,
                    opt_state=self.tx.init(params),
                    ema=ema_init(params),
                ),
                self.replicated,
            )
        else:
            if param_sharding == "fsdp":
                from diffusion_models_tpu.parallel.mesh import shard_params_fsdp

                # min_size: leaves smaller than this stay replicated — the
                # all-gather latency beats the memory saved (tunable for
                # tests / unusually wide shallow models)
                params = shard_params_fsdp(
                    params, self.mesh, min_size=fsdp_min_size
                )
            else:
                from diffusion_models_tpu.parallel.mesh import shard_params_tp

                assert "model" in self.mesh.axis_names, (
                    "param_sharding='tp' needs a 2-D mesh with a 'model' "
                    "axis — build it with parallel.mesh.make_mesh_2d"
                )
                params = shard_params_tp(params, self.mesh)
            self.state = TrainState(
                step=jax.device_put(jnp.zeros((), jnp.int32), self.replicated),
                params=params,
                opt_state=jax.jit(self.tx.init)(params),
                ema=jax.jit(ema_init)(params),
            )
        # per-leaf placements of the live state — `load()` restores onto
        # these instead of blanket-replicating, so resuming an fsdp/tp run
        # keeps the sharding the constructor set up (a model that needed
        # FSDP to fit would otherwise OOM on resume). Leaves that aren't on
        # the mesh (e.g. scalar opt_state counters jit placed on the default
        # device) are normalized to mesh-replicated so the whole state lives
        # on one device set — with_sharding_constraint rejects mixed sets.
        def _mesh_sharding(x):
            s = x.sharding
            if getattr(s, "mesh", None) is self.mesh or (
                hasattr(s, "mesh") and s.mesh == self.mesh
            ):
                return s
            return self.replicated

        self._state_shardings = jax.tree_util.tree_map(
            _mesh_sharding, self.state
        )
        self.state = jax.tree_util.tree_map(
            jax.device_put, self.state, self._state_shardings
        )
        self._base_rng = jax.random.PRNGKey(seed + 1)

        # single-device or pure-DP meshes can route LinearAttention sites
        # through the fused Pallas block kernel; registering the mesh lets
        # the kernel wrapper shard_map itself over the data axis (with
        # fsdp/tp the weights are themselves sharded, which the kernel's
        # replicated-weight shard_map does not support — keep plain XLA).
        # The registry is process-global and read at trace time, so a
        # NON-qualifying Trainer must CLEAR any stale registration from an
        # earlier replicated Trainer — otherwise this model's sharded
        # weights would be traced through the replicated-weight shard_map
        # (round-4 VERDICT item 4). Last-constructed Trainer wins; programs
        # an earlier Trainer already compiled keep the mesh they captured.
        from diffusion_models_tpu.ops.pallas.linear_attn_block import (
            set_fused_mesh,
        )

        if param_sharding == "replicated" and "data" in self.mesh.axis_names:
            set_fused_mesh(self.mesh, "data")
        else:
            set_fused_mesh(None)

        self._train_step = self._build_train_step()
        self._fid_scorer = None
        self._is_scorer = None
        self.best_fid = 1e10
        self.detect_anomalies = detect_anomalies
        self.checkpoint_on_preemption = checkpoint_on_preemption
        self._preempted = False

        self.save_training_params()

    # ---------------------------------------------------------------- hooks

    @property
    def data_image_size(self):
        """Dataset resolution: pixel size for latent models, else image_size."""
        return getattr(
            self.diffusion, "pixel_image_size", self.diffusion.image_size
        )

    def build_dataset(self, folder, *, augment_horizontal_flip, convert_image_to):
        return ImageFolderDataset(
            folder,
            self.data_image_size,
            augment_horizontal_flip=augment_horizontal_flip,
            convert_image_to=convert_image_to,
        )

    def batch_to_args(self, batch):
        """batch → (img, cond). Base: unconditional."""
        return batch, None

    def sample_cond(self, n: int, rng: np.random.Generator):
        """Sampling-time conditioning draw. Base: none."""
        return None

    # ----------------------------------------------------------- train step

    @staticmethod
    def _denormalize_transport(batch):
        """uint8-transport inverse: image leaves ride host→device as uint8
        (4× less tunnel/PCIe traffic, see `utils/data.py::to_uint8_image`);
        the /255 happens here, on device, inside the jitted step — the same
        f32 division the loader used to do on host, so results are
        bit-identical. Non-uint8 leaves (embeddings, class labels) pass
        through untouched."""
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32) / 255.0
            if x.dtype == jnp.uint8 else x,
            batch,
        )

    def _loss_fn(self, params, rng, batch):
        img, cond = self.batch_to_args(batch)
        return self.diffusion.loss(params, rng, img, cond=cond, train=True)

    def _build_train_step(self):
        accum = self.gradient_accumulate_every
        tx = self.tx

        def step_fn(state: TrainState, batch, base_rng):
            batch = self._denormalize_transport(batch)
            rng = jax.random.fold_in(base_rng, state.step)
            keys = jax.random.split(rng, accum)

            grad_fn = jax.value_and_grad(self._loss_fn)

            if accum == 1:
                loss, grads = grad_fn(
                    state.params, keys[0],
                    jax.tree_util.tree_map(lambda x: x[0], batch),
                )
            else:
                def micro(carry, xs):
                    loss_acc, grads_acc = carry
                    key, mb = xs
                    loss, grads = grad_fn(state.params, key, mb)
                    grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                    return (loss_acc + loss, grads_acc), None

                zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
                (loss_sum, grads), _ = jax.lax.scan(
                    micro, (0.0, zero_grads), (keys, batch)
                )
                loss = loss_sum / accum
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)

            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if self.post_update_fn is not None:
                params = self.post_update_fn(params)
            ema = ema_update(
                state.ema,
                params,
                beta=self.ema_decay,
                update_every=self.ema_update_every,
            )
            new_state = TrainState(
                step=state.step + 1, params=params, opt_state=opt_state, ema=ema
            )
            # pin the output placement to what the constructor set up —
            # without this GSPMD is free to re-shard state leaves after a
            # step (e.g. moving an fsdp shard to a different axis), which
            # breaks donation reuse and makes resume placement ambiguous
            new_state = jax.lax.with_sharding_constraint(
                new_state, self._state_shardings
            )
            return new_state, loss

        if self.steps_per_call == 1:
            return jax.jit(step_fn, donate_argnums=(0,))

        def multi_step_fn(state, batches, base_rng):
            # batches: (K, accum?, B, ...) — K optimizer steps in one program
            def body(st, b):
                return step_fn(st, b, base_rng)

            state, losses = jax.lax.scan(body, state, batches)
            return state, losses[-1]

        return jax.jit(multi_step_fn, donate_argnums=(0,))

    def _put_batch(self, batches):
        """Stack `accum` host batches → (accum, B, ...) on the data mesh.

        Multi-host: each process holds only its 1/P shard of the global
        batch, so the global array must be assembled from the per-process
        shards — `device_put` with a global sharding would misinterpret the
        host-local array as the full batch.
        """
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *batches
        )
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    self.batch_sharding, x
                ),
                stacked,
            )
        return jax.device_put(stacked, self.batch_sharding)

    def next_batch(self):
        accum = self.gradient_accumulate_every
        if self.steps_per_call == 1:
            return self._put_batch([next(self.dl) for _ in range(accum)])
        # (K, accum?, B, ...): one leading scan axis per fused optimizer step
        calls = []
        for _ in range(self.steps_per_call):
            group = [next(self.dl) for _ in range(accum)]
            calls.append(jax.tree_util.tree_map(lambda *xs: np.stack(xs), *group))
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *calls)
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    self.multi_batch_sharding, x
                ),
                stacked,
            )
        return jax.device_put(stacked, self.multi_batch_sharding)

    # ------------------------------------------------------------- sampling

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _jit_sample(self, params, rng, batch_size, cond=None):
        out = self.diffusion.sample(params, rng, batch_size, cond=cond)
        # Shard milestone-eval sampling over the data axis: without the
        # constraint GSPMD replicates the whole reverse-diffusion scan on
        # every device (params are replicated, the batch has no producer
        # sharding), so an 8-chip mesh does 8x redundant work per FID
        # sweep. The constraint back-propagates through the scan carry and
        # the (partitionable) threefry noise, splitting the batch across
        # chips; values are unchanged.
        n_data = self.mesh.shape.get("data", 1)
        if n_data > 1 and batch_size % n_data == 0:
            out = jax.lax.with_sharding_constraint(
                out, NamedSharding(self.mesh, P("data"))
            )
        return out

    def generate_samples(self, total: int, rng_seed: int = 0):
        """Generate `total` EMA samples in train_batch_size chunks, as one
        stacked [0,1] NHWC numpy array.

        Every chunk runs the sampler at the full `batch_size` and slices the
        remainder on the host, so a milestone sweep compiles exactly ONE
        sampler program (a remainder-sized chunk would otherwise trigger a
        second multi-minute XLA compile per milestone on TPU).
        """
        ema_params = self.state.ema.params
        rng = jax.random.PRNGKey(rng_seed)
        np_rng = np.random.default_rng(rng_seed)
        chunks = []
        for n in num_to_groups(total, self.batch_size):
            rng, key = jax.random.split(rng)
            cond = self.sample_cond(self.batch_size, np_rng)
            out = self._jit_sample(ema_params, key, self.batch_size, cond)
            chunks.append(self._fetch(out, n))
        return np.concatenate(chunks, axis=0)

    @staticmethod
    def _fetch(out, n: Optional[int] = None) -> np.ndarray:
        """Materialize a sampler output as host numpy. Multi-host, the
        output is sharded across processes (the data-axis constraint in
        `_jit_sample`) — `np.asarray` on a non-addressable global array
        raises, so gather it to every host first (the reference's
        main-process gather semantics, `denoising_diffusion.py:1213-1219`)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            out = multihost_utils.process_allgather(out, tiled=True)
        out = np.asarray(out)
        return out if n is None else out[:n]

    # ------------------------------------------------------------------ fid

    def _ensure_eval_stack(self):
        if not (self.calculate_fid or self.calculate_is):
            return
        from diffusion_models_tpu.training.evaluation import (
            FIDEvaluation,
            InceptionScoreEvaluation,
        )

        if self.calculate_fid and self._fid_scorer is None:
            self._fid_scorer = FIDEvaluation(
                batch_size=self.batch_size,
                data_loader=self.dataset,
                stats_dir=self.results_folder,
                num_fid_samples=self.num_fid_samples,
                weights_path=self.inception_weights,
            )
        if self.calculate_is and self._is_scorer is None:
            self._is_scorer = InceptionScoreEvaluation(
                batch_size=self.batch_size,
                log_file=self.results_folder / "inception_score_log.txt",
                weights_path=self.inception_weights,
            )

    # ------------------------------------------------------------ save/load

    def _state_dict(self):
        return {
            "step": self.state.step,
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "ema_params": self.state.ema.params,
            "ema_step": self.state.ema.step,
        }

    def save(self, milestone):
        self.ckpt.save(milestone, self._state_dict())

    def load(self, milestone, params_only: bool = False):
        """`params_only=True` restores params/EMA/step but re-initializes
        the optimizer state — required when the optimizer configuration
        changed since the checkpoint (e.g. a new lr schedule alters the
        opt_state pytree structure, which a full restore rejects).

        `milestone='latest'` resolves to the literal `model-latest`
        directory when present (the `save_best_and_latest_only` layout),
        else to the highest numeric milestone on disk."""
        if milestone == "latest" and not self.ckpt.exists("latest"):
            numeric = self.ckpt.milestones()
            assert numeric, f"no checkpoints in {self.results_folder}"
            milestone = max(numeric)
        if params_only:
            sd = self._state_dict()
            template = {k: sd[k] for k in
                        ("step", "params", "ema_params", "ema_step")}
            restored = self.ckpt.restore(milestone, template, partial=True)
            opt_state = self.tx.init(restored["params"])
        else:
            restored = self.ckpt.restore(milestone, self._state_dict())
            opt_state = restored["opt_state"]
        self.state = TrainState(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=restored["params"],
            opt_state=opt_state,
            ema=EMAState(
                params=restored["ema_params"],
                step=jnp.asarray(restored["ema_step"], jnp.int32),
            ),
        )
        # restore each leaf onto the placement `param_sharding` dictates
        # (captured at construction) — NOT blanket replication, which would
        # silently discard fsdp/tp placements on resume
        self.state = jax.tree_util.tree_map(
            jax.device_put, self.state, self._state_shardings
        )

    def save_training_params(self):
        """JSON dump of all JSON-able config attrs
        (reference `save_training_params`, :1136-1148). Written from
        process 0 only (reference `is_main_process` gating, :1101)."""
        if jax.process_index() != 0:
            return
        out = {}
        for k, v in vars(self).items():
            try:
                json.dumps(v)
                out[k] = v
            except (TypeError, ValueError):
                continue
        out["results_folder"] = str(self.results_folder)
        out["image_size"] = list(self.diffusion.image_size)
        out["timesteps"] = self.diffusion.num_timesteps
        out["objective"] = self.diffusion.objective
        out["beta_schedule"] = getattr(self.diffusion, "beta_schedule", None)
        model = self.diffusion.model
        out["unet_dim"] = getattr(model, "dim", None)
        out["unet_dim_mults"] = list(getattr(model, "dim_mults", ()))
        out["channels"] = getattr(model, "channels", 3)
        with open(self.results_folder / "training_params.json", "w") as f:
            json.dump(out, f, indent=2)

    # ---------------------------------------------------------------- train

    def _install_preemption_handler(self):
        """Failure/elastic-recovery support the reference lacks (SURVEY.md
        §5.3): on SIGTERM/SIGINT, checkpoint a `preempt` milestone before
        exiting so training resumes exactly (per-step fold_in RNG)."""
        import signal

        def handler(signum, frame):
            self._preempted = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, handler)
            except ValueError:
                pass  # not on the main thread

    def train(self, log_every: int = 1):
        self._ensure_eval_stack()
        if self.checkpoint_on_preemption:
            self._install_preemption_handler()
        step = int(self.state.step)
        t0, rate_step = time.time(), step
        loss = None  # stays None if the run is already complete on entry
        pending = None  # (step, device loss) — materialized one step later so
        # the host never blocks on the step it just dispatched (async dispatch
        # keeps the TPU busy while the next batch is assembled)
        k = self.steps_per_call
        while step < self.train_num_steps:
            batch = self.next_batch()
            self.state, loss = self._train_step(self.state, batch, self._base_rng)
            step += k

            if self._preempted:
                print(f"preemption signal received — checkpointing at step {step}")
                self.save("preempt")
                return

            if pending is not None:
                prev_step, prev_loss = pending
                loss_val = float(prev_loss)
                if self.detect_anomalies and not np.isfinite(loss_val):
                    self.save("anomaly")
                    raise FloatingPointError(
                        f"non-finite loss {loss_val} first observed at step "
                        f"{prev_step}; checkpointed state is at step {step} "
                        f"(deferred loss check — with steps_per_call={k} the "
                        f"saved state may include up to {2 * k - 1} "
                        f"optimizer steps past the first NaN)"
                    )
                self.writer.scalar("Train/Loss", loss_val, prev_step)
            pending = (step, loss) if step % log_every < k else None
            if step % 100 < k:
                rate = (step - rate_step) / max(time.time() - t0, 1e-9)
                self.writer.scalar("Train/steps_per_sec", rate, step)
                t0, rate_step = time.time(), step

            if step != 0 and step % self.save_and_sample_every == 0:
                self._milestone_eval(step)

        if loss is not None:
            self.writer.scalar("Train/Loss", float(loss), step)
        print("training complete")

    def _milestone_eval(self, step: int):
        milestone = step // self.save_and_sample_every

        # sample grid from EMA weights. generate_samples is a collective
        # (every process participates in the SPMD sampler); only the host
        # side effects are process-0-gated (reference is_main_process,
        # `denoising_diffusion.py:1023,1050,1101`)
        samples = self.generate_samples(self.num_samples, rng_seed=milestone)
        if jax.process_index() == 0:
            grid_path = self.results_folder / f"sample-{milestone}.png"
            save_image_grid(
                samples, grid_path, nrow=int(np.sqrt(self.num_samples))
            )
            self.writer.image("Samples", np.asarray(samples[0]), step)

        fid = None
        if self.calculate_fid and self._fid_scorer is not None:
            fakes = self.generate_samples(self.num_fid_samples, rng_seed=10_000 + milestone)
            fid = self._fid_scorer.fid_score(fakes)
            self.writer.scalar("Eval/FID", fid, step)
            print(f"fid_score: {fid}")
            if self.calculate_is and self._is_scorer is not None:
                is_mean, is_std = self._is_scorer.calculate_inception_score(fakes, step)
                self.writer.scalar("Eval/IS", is_mean, step)
                print(f"inception_score: {is_mean} ± {is_std}")
        elif self.calculate_is and self._is_scorer is not None:
            fakes = self.generate_samples(self.num_fid_samples, rng_seed=10_000 + milestone)
            is_mean, is_std = self._is_scorer.calculate_inception_score(fakes, step)
            self.writer.scalar("Eval/IS", is_mean, step)

        if self.save_best_and_latest_only:
            if fid is not None and fid < self.best_fid:
                self.best_fid = fid
                self.save("best")
            self.save("latest")
        else:
            self.save(milestone)
