"""ZeRO-3 / FSDP-analog frozen-parameter sharding (VERDICT r4 #6).

The reference plumbs DeepSpeed ZeRO-3 (hparams/parser.py:188-196 +
ds_z3 configs); the TPU-native analog shards the FROZEN LLM's parameter
storage along dp via fsdp_param_pspecs and lets GSPMD insert the
per-layer all-gathers. Numerics must equal the replicated step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from llamole_tpu.config import TrainingArguments
from llamole_tpu.parallel import create_mesh
from llamole_tpu.parallel.sharding import fsdp_param_pspecs
from llamole_tpu.train.trainer import Trainer


def test_fsdp_pspecs_shard_largest_free_dim():
    params = {
        "layers": {"self_attn": {"q": {"weight": jnp.zeros((64, 32))}}},
        "norm": {"scale": jnp.zeros((64,))},
    }
    specs = fsdp_param_pspecs(params, dp=4)
    assert specs["layers"]["self_attn"]["q"]["weight"] == P("dp", None)
    assert specs["norm"]["scale"] == P()  # 1D replicated


def test_fsdp_pspecs_compose_with_tp():
    # column-parallel q shards (None, tp); fsdp adds dp on dim 0
    params = {"layers": {"self_attn": {"q": {"weight": jnp.zeros((64, 32))}}}}
    specs = fsdp_param_pspecs(params, dp=4, tp_axis="tp")
    assert specs["layers"]["self_attn"]["q"]["weight"] == P("dp", "tp")


def _toy_setup(zero_stage: int, mesh):
    args = TrainingArguments(learning_rate=1e-2, zero_stage=zero_stage,
                             lr_scheduler_type="constant", seed=0)
    rng = np.random.default_rng(0)
    w_frozen = rng.normal(size=(32, 32)).astype(np.float32)
    target = rng.normal(size=(32, 16)).astype(np.float32)

    def loss_fn(trainable, frozen, _rng, batch):
        h = batch["x"] @ frozen["llm"]["w"]
        pred = h @ trainable["w"]
        loss = jnp.mean((pred - batch["x"] @ target) ** 2)
        aux = {"lm_loss": loss, "design_loss": 0.0, "retro_loss": 0.0}
        return loss, aux

    frozen = {"llm": {"w": jnp.asarray(w_frozen)}}
    trainer = Trainer(loss_fn, frozen=frozen, args=args,
                      num_training_steps=10, mesh=mesh)
    state = trainer.init_state({"w": jnp.zeros((32, 16))}, seed=0)
    batch = {"x": rng.normal(size=(8, 32)).astype(np.float32)}
    return trainer, state, batch


@pytest.mark.slow
def test_zero3_step_matches_replicated():
    """3 train steps with dp-sharded frozen storage == replicated run."""
    losses = {}
    for stage in (0, 3):
        mesh = create_mesh(dp=8)
        trainer, state, batch = _toy_setup(stage, mesh)
        if stage == 3:
            # frozen leaf physically sharded 8-way along dp
            leaf = trainer.frozen["llm"]["w"]
            shard = leaf.addressable_shards[0].data.shape
            assert np.prod(shard) == leaf.size // 8, (shard, leaf.shape)
        batch_j = trainer._place_batch(batch)
        ls = []
        for _ in range(3):
            (state.params, state.opt_state, state.rng,
             loss, aux, gnorm) = trainer._jit_step(
                state.params, state.opt_state, state.rng, batch_j,
                trainer.frozen)
            ls.append(float(loss))
        losses[stage] = ls
    np.testing.assert_allclose(losses[0], losses[3], rtol=1e-5)


def test_zero3_refuses_pipeline():
    mesh = create_mesh(pp=2, dp=4)
    args = TrainingArguments(zero_stage=3, lr_scheduler_type="constant")
    with pytest.raises(ValueError, match="pipeline"):
        Trainer(lambda *a: (0.0, {}), frozen={"llm": {}}, args=args,
                num_training_steps=1, mesh=mesh)
