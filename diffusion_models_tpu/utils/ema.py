"""Exponential-moving-average of parameters, as a pure pytree update.

The reference delegates EMA to the `ema_pytorch` package
(`denoising_diffusion.py:32,1024`, β=0.995, update_every=10) and ALL
sampling/eval uses the EMA weights (SURVEY.md §5.9). `ema_pytorch`'s
semantics, reproduced here functionally so the update lives *inside* the
jitted train step (no host sync):

  - an internal step counter increments once per `update()` call;
  - updates are applied only every `update_every` steps;
  - for the first `update_after_step` steps the EMA is a plain copy of the
    online weights;
  - afterwards the decay ramps in as  1 - (1 + epoch/inv_gamma)^(-power),
    clamped to [min_value, beta]  (epoch = step - update_after_step - 1).

Everything is branchless: `jnp.where` on the effective decay, so the whole
thing fuses into the train-step program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EMAState:
    params: any
    step: jnp.ndarray  # int32 counter of update() calls


def ema_init(params) -> EMAState:
    # MUST be a real copy: jnp.asarray would alias the online params, and an
    # aliased buffer inside a donated TrainState is donated twice →
    # "Attempt to donate the same buffer twice" (and, under SPMD, a
    # collective-rendezvous hang on the surviving devices).
    return EMAState(
        params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
        step=jnp.zeros((), jnp.int32),
    )


def current_decay(
    step: jnp.ndarray,
    beta: float = 0.995,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> jnp.ndarray:
    """Effective decay for a given step counter (0 during warmup)."""
    epoch = jnp.clip(
        step.astype(jnp.float32) - update_after_step - 1, 0.0, None
    )
    value = 1.0 - (1.0 + epoch / inv_gamma) ** (-power)
    value = jnp.clip(value, min_value, beta)
    return jnp.where(epoch <= 0, 0.0, value)


def ema_update(
    state: EMAState,
    new_params,
    beta: float = 0.995,
    update_every: int = 10,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> EMAState:
    """One EMA tick. Pure; call once per optimizer step inside jit."""
    step = state.step + 1
    do_update = (step % update_every) == 0
    decay = current_decay(
        step,
        beta=beta,
        update_after_step=update_after_step,
        inv_gamma=inv_gamma,
        power=power,
        min_value=min_value,
    )
    # if not an update tick: keep old ema (decay→1 keeps old value)
    eff_decay = jnp.where(do_update, decay, 1.0)

    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * eff_decay + p.astype(e.dtype) * (1.0 - eff_decay),
        state.params,
        new_params,
    )
    return EMAState(params=new_ema, step=step)
