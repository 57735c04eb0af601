"""Elasticity: checkpoint/restart resumes training identically; heartbeat."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ruvector_tpu.parallel.multihost import (
    Heartbeat,
    TrainStateCheckpointer,
    initialize_multihost,
)
from ruvector_tpu.training.optimizers import adam


def test_initialize_single_process_noop():
    assert initialize_multihost(num_processes=1) is False
    assert initialize_multihost() is False


def make_step():
    opt = adam(0.1)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.sum((p["w"] - batch) ** 2)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return opt, step


def test_checkpoint_restart_resumes_identically(tmp_path):
    opt, step = make_step()
    target = jnp.zeros(4)

    # uninterrupted run: 20 steps
    params = {"w": jnp.ones(4) * 5.0}
    opt_state = opt.init(params)
    for i in range(20):
        params, opt_state, _ = step(params, opt_state, target)
    uninterrupted = np.asarray(params["w"])

    # interrupted run: checkpoint at 10, 'crash', restore, continue to 20
    ckpt = TrainStateCheckpointer(tmp_path, every_steps=10)
    params = {"w": jnp.ones(4) * 5.0}
    opt_state = opt.init(params)
    for i in range(1, 11):
        params, opt_state, _ = step(params, opt_state, target)
        ckpt.maybe_save(i, {"params": params, "opt_state": opt_state})
    # crash: fresh process restores
    ckpt2 = TrainStateCheckpointer(tmp_path, every_steps=10)
    proto = {"params": {"w": jnp.zeros(4)}, "opt_state": opt.init({"w": jnp.zeros(4)})}
    state, resumed_step = ckpt2.restore_latest(proto)
    assert resumed_step == 10
    params, opt_state = state["params"], state["opt_state"]
    for i in range(resumed_step + 1, 21):
        params, opt_state, _ = step(params, opt_state, target)

    np.testing.assert_allclose(np.asarray(params["w"]), uninterrupted,
                               atol=1e-6)


def test_checkpointer_keeps_bounded_history(tmp_path):
    ckpt = TrainStateCheckpointer(tmp_path, every_steps=1, keep=2)
    state = {"w": jnp.ones(2)}
    for i in range(1, 6):
        ckpt.maybe_save(i, state)
    steps = sorted(int(p.stem.split("_")[1]) for p in tmp_path.glob("ckpt_*.npz"))
    assert steps == [4, 5]


def test_heartbeat(tmp_path):
    hb = Heartbeat(tmp_path / "hb", interval_s=0.0)
    assert not Heartbeat.is_alive(tmp_path / "hb")
    hb.beat(step=5)
    assert Heartbeat.is_alive(tmp_path / "hb", timeout_s=10)
    assert not Heartbeat.is_alive(tmp_path / "hb", timeout_s=0.0)
