"""ZeRO-1 optimizer-state sharding on the 8-virtual-device mesh.

Reference plumbs DeepSpeed ZeRO (hparams/parser.py:188-221,
requirements.txt:5); the TPU-native analog shards Adam moments and
MultiSteps grad-accumulation buffers along dp via partition specs
(SURVEY §2.2 plan row). VERDICT round-1 item 6.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llamole_tpu.config import TrainingArguments
from llamole_tpu.parallel import create_mesh, zero1_opt_pspecs
from llamole_tpu.train.trainer import Trainer


def _moment_leaves(opt_state):
    """All array leaves living inside ScaleByAdamState mu/nu trees."""
    leaves = []

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            leaves.extend(jax.tree.leaves(node.mu))
            leaves.extend(jax.tree.leaves(node.nu))
        elif isinstance(node, (list, tuple)):
            for c in node:
                walk(c)
        elif hasattr(node, "_fields"):  # other NamedTuples
            for c in node:
                walk(c)

    walk(opt_state)
    return leaves


def test_zero1_pspecs_shard_largest_divisible_dim():
    from jax.sharding import PartitionSpec as P

    state = {"w": jnp.zeros((32, 16)), "b": jnp.zeros((6,)),
             "scalar": jnp.zeros(())}
    specs = zero1_opt_pspecs(state, dp=4)
    assert specs["w"] == P("dp", None)
    assert specs["b"] == P()        # 6 % 4 != 0 -> replicated
    assert specs["scalar"] == P()


def test_zero1_train_step_shards_moments_and_replicates_params():
    mesh = create_mesh(dp=4, tp=2)
    args = TrainingArguments(learning_rate=1e-2, zero_stage=1,
                             gradient_accumulation_steps=2,
                             lr_scheduler_type="constant")

    target = jnp.arange(32 * 16, dtype=jnp.float32).reshape(32, 16) / 100.0

    def loss_fn(trainable, frozen, rng, batch):
        pred = batch["x"] @ trainable["w"]
        loss = jnp.mean((pred - batch["x"] @ target) ** 2)
        aux = {"lm_loss": loss, "design_loss": 0.0, "retro_loss": 0.0}
        return loss, aux

    trainer = Trainer(loss_fn, frozen={}, args=args, num_training_steps=10,
                      mesh=mesh)
    params = {"w": jnp.zeros((32, 16))}
    state = trainer.init_state(params, seed=0)

    # moments sharded 4-way along dp at init
    for leaf in _moment_leaves(state.opt_state):
        shard = leaf.addressable_shards[0].data.shape
        assert shard[0] == leaf.shape[0] // 4, (shard, leaf.shape)

    batch = {"x": np.random.default_rng(0).normal(size=(8, 32)).astype(np.float32)}
    batch_j = trainer._place_batch(batch)
    for _ in range(4):
        (state.params, state.opt_state, state.rng,
         loss, aux, gnorm) = trainer._jit_step(
            state.params, state.opt_state, state.rng, batch_j,
            trainer.frozen)
    assert np.isfinite(float(loss))

    # after the jitted update: moments STILL sharded, params replicated
    for leaf in _moment_leaves(state.opt_state):
        shard = leaf.addressable_shards[0].data.shape
        assert shard[0] == leaf.shape[0] // 4, (shard, leaf.shape)
    w = state.params["w"]
    assert w.addressable_shards[0].data.shape == w.shape  # fully replicated

    # and the optimizer is actually optimizing
    l0 = float(loss)
    for _ in range(20):
        (state.params, state.opt_state, state.rng,
         loss, aux, gnorm) = trainer._jit_step(
            state.params, state.opt_state, state.rng, batch_j,
            trainer.frozen)
    assert float(loss) < l0


@pytest.mark.slow
def test_zero1_full_finetune_composite_step(tmp_path):
    """One FULL-finetune train step of the real composite model with
    zero_stage=1 on a dp=2 x tp=4 mesh: trainable LLM stays tp-sharded,
    its Adam moments dp-shard on top (VERDICT item 6 'done' bar)."""
    from tests.test_finetuning_types import _setup

    model, frozen, trainable, batch = _setup(tmp_path, "full")
    assert "llm" in trainable
    mesh = create_mesh(dp=2, tp=4)
    args = TrainingArguments(learning_rate=1e-4, zero_stage=1,
                             lr_scheduler_type="constant")
    trainer = Trainer(model.loss_fn, frozen, args, num_training_steps=4,
                      mesh=mesh)
    state = trainer.init_state(trainable, seed=0)

    # the trainable LLM is tensor-parallel on the mesh
    q = state.params["llm"]["layers"][0]["attn"]["q"]["w"]
    assert q.addressable_shards[0].data.shape[-1] == q.shape[-1] // 4

    sharded = [leaf for leaf in _moment_leaves(state.opt_state)
               if leaf.ndim and leaf.addressable_shards[0].data.shape
               != leaf.shape]
    assert sharded, "no moment leaf got sharded"
    batch_j = trainer._place_batch(batch)
    (state.params, state.opt_state, state.rng, loss, aux, gnorm) = \
        trainer._jit_step(state.params, state.opt_state, state.rng,
                          batch_j, trainer.frozen)
    assert np.isfinite(float(loss))
    # after the update the LLM params kept their tp sharding
    q = state.params["llm"]["layers"][0]["attn"]["q"]["w"]
    assert q.addressable_shards[0].data.shape[-1] == q.shape[-1] // 4
