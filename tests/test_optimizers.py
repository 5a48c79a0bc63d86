"""GaLore / LoRA+ / BAdam optimizer factory
(reference trainer_utils.py:184-366; SURVEY §2.1 optimizer-factory row)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llamole_tpu.config import FinetuningArguments, TrainingArguments
from llamole_tpu.train.optimizers import (
    badam,
    build_custom_optimizer,
    galore,
    scale_lora_b,
)
from llamole_tpu.train.trainer import create_optimizer


def _quadratic_problem(seed=0):
    gen = np.random.default_rng(seed)
    target = jnp.asarray(gen.normal(size=(64, 32)).astype(np.float32))
    params = {"w": jnp.zeros((64, 32)), "bias": jnp.zeros((32,))}

    def loss(p):
        return jnp.mean((p["w"] - target) ** 2) + jnp.mean(p["bias"] ** 2)

    return params, loss


def _run(tx, params, loss, steps=60):
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    l0 = float(loss(params))
    for _ in range(steps):
        params, state = step(params, state)
    return l0, float(loss(params)), params


def test_galore_optimizes_and_shrinks_moments():
    params, loss = _quadratic_problem()
    tx = galore(optax.adam(0.05), rank=4, update_interval=5, scale=1.0)
    l0, l1, _ = _run(tx, params, loss, steps=200)
    # full-rank targets need several subspace refreshes; the bar is
    # steady descent, not full-rank convergence speed
    assert l1 < 0.5 * l0, (l0, l1)
    # Adam moments for the projected 2D leaf live in rank-4 space
    state = tx.init(params)
    flat = jax.tree.leaves(state)
    low_rank = [x for x in flat if hasattr(x, "shape") and 4 in x.shape
                and x.ndim == 2]
    assert low_rank, "no low-rank moment buffers found"


def test_galore_projection_refresh_runs():
    params, loss = _quadratic_problem()
    tx = galore(optax.adam(0.05), rank=4, update_interval=3, scale=1.0)
    l0, l1, _ = _run(tx, params, loss, steps=10)
    assert np.isfinite(l1)


def test_lora_plus_scales_b_only():
    params = {"lora": {"layers": [{"q": {"a": jnp.ones((4, 2)),
                                         "b": jnp.ones((2, 4))}}]},
              "connectors": {"w": jnp.ones((4, 4))}}
    tx = scale_lora_b(16.0)
    state = tx.init(params)
    updates = jax.tree.map(jnp.ones_like, params)
    out, _ = tx.update(updates, state)
    assert float(out["lora"]["layers"][0]["q"]["b"][0, 0]) == 16.0
    assert float(out["lora"]["layers"][0]["q"]["a"][0, 0]) == 1.0
    assert float(out["connectors"]["w"][0, 0]) == 1.0


def test_badam_cycles_blocks():
    params = {f"p{i}": jnp.zeros((4,)) for i in range(4)}
    tx = badam(n_blocks=4, switch_interval=2)
    state = tx.init(params)
    updates = jax.tree.map(jnp.ones_like, params)
    active_per_step = []
    for _ in range(8):
        out, state = tx.update(updates, state)
        active = [k for k, v in out.items() if float(v.sum()) > 0]
        assert len(active) == 1
        active_per_step.append(active[0])
    # block switches every 2 steps and cycles
    assert active_per_step[0] == active_per_step[1]
    assert active_per_step[0] != active_per_step[2]
    assert set(active_per_step) == set(params)


def test_factory_wiring_through_create_optimizer():
    args = TrainingArguments(learning_rate=0.05,
                             lr_scheduler_type="constant")
    ft = FinetuningArguments(use_galore=True, galore_rank=4,
                             galore_update_interval=10,
                             loraplus_lr_ratio=8.0)
    tx, _ = create_optimizer(args, 100, ft)
    params, loss = _quadratic_problem()
    l0, l1, _ = _run(tx, params, loss, steps=150)
    assert l1 < 0.9 * l0
