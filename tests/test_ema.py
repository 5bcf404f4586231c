"""EMA semantics tests (ema_pytorch-parity: warmup copy, decay ramp,
update_every gating)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_tpu.utils.ema import current_decay, ema_init, ema_update


def test_warmup_copies_params():
    params = {"w": jnp.ones((4,))}
    state = ema_init(params)
    # during warmup (step <= update_after_step) decay == 0 → ema := params
    for i in range(1, 31):
        new_params = {"w": jnp.full((4,), float(i))}
        state = ema_update(state, new_params, update_every=10, update_after_step=100)
    # step 30 → last applied update was at step 30 (30 % 10 == 0)
    np.testing.assert_allclose(np.asarray(state.params["w"]), 30.0)


def test_update_every_gating():
    params = {"w": jnp.zeros(())}
    state = ema_init(params)
    s1 = ema_update(state, {"w": jnp.ones(())}, update_every=10)
    # step 1: not an update tick → unchanged
    np.testing.assert_allclose(np.asarray(s1.params["w"]), 0.0)
    assert int(s1.step) == 1


def test_decay_ramp():
    # right after update_after_step the decay is small, then → beta
    d_early = current_decay(jnp.asarray(105), beta=0.995, update_after_step=100)
    d_late = current_decay(jnp.asarray(100000), beta=0.995, update_after_step=100)
    assert 0.0 < float(d_early) < 0.9
    np.testing.assert_allclose(float(d_late), 0.995, rtol=1e-6)
    # warmup → exactly 0
    assert float(current_decay(jnp.asarray(50), update_after_step=100)) == 0.0


def test_steady_state_moving_average():
    params = {"w": jnp.zeros(())}
    state = ema_init(params)
    state = state.replace(step=jnp.asarray(10000, jnp.int32))
    state = state.replace(params={"w": jnp.zeros(())})
    # one applied update at steady state: ema = 0.995*0 + 0.005*1
    # (step 10009→10010 is an update tick)
    for _ in range(10):
        state = ema_update(state, {"w": jnp.ones(())}, beta=0.995, update_every=10)
    np.testing.assert_allclose(np.asarray(state.params["w"]), 0.005, rtol=1e-5)


def test_ema_inside_jit():
    @jax.jit
    def step(state, p):
        return ema_update(state, p)

    state = ema_init({"w": jnp.zeros((2, 2))})
    out = step(state, {"w": jnp.ones((2, 2))})
    assert int(out.step) == 1
