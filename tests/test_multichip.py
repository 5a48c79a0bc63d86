"""Multi-chip tests on the 8-virtual-device CPU mesh: dp-sharded
GraphDiT sampling and the sharded train step (graft-entry contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.models.graphdit import GraphDiT, GraphDiTConfig
from llamole_tpu.models.graphdit.config import build_data_info_from_smiles
from llamole_tpu.parallel import create_mesh


@pytest.fixture(scope="module")
def tiny():
    info = build_data_info_from_smiles(
        ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CC1"], max_n_nodes=12)
    cfg = GraphDiTConfig(hidden_size=32, depth=2, num_heads=4,
                         diffusion_steps=8, guide_scale=2.0, text_dim=16)
    model = GraphDiT(cfg, info)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_dp_sharded_generate(tiny):
    model, params = tiny
    mesh = create_mesh(dp=8, tp=1)
    y = jnp.full((6, 10), jnp.nan)  # 6 rows: exercises the dp-pad path
    txt = jnp.zeros((6, 16))
    smiles = model.generate(params, jax.random.PRNGKey(3), y, txt, mesh=mesh)
    assert len(smiles) == 6
    for s in smiles:
        assert s is None or isinstance(s, str)


def test_graft_entry_contract():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
    g.dryrun_multichip(8)


def test_dcn_mesh_axes_and_string():
    """dcn > 1 prepends an outer cross-slice data axis (multi-slice
    scale-out; virtual devices use the contiguous-split fallback)."""
    from llamole_tpu.parallel import mesh_from_string

    mesh = create_mesh(dp=2, tp=2, dcn=2)
    assert mesh.axis_names == ("dcn", "dp", "tp")
    assert mesh.shape["dcn"] == 2 and mesh.shape["dp"] == 2
    mesh2 = mesh_from_string("dcn:2,dp:2,tp:2")
    assert mesh2.axis_names == mesh.axis_names
    with pytest.raises(ValueError):
        create_mesh(dp=8, dcn=2)  # 16 devices needed, 8 available


def test_trainer_step_on_dcn_mesh():
    """A train step on a dcn x dp mesh matches the flat-dp mesh: the
    outer axis is pure data parallelism whose gradient reduction GSPMD
    inserts automatically (only that traffic would cross DCN on real
    multi-slice hardware)."""
    from llamole_tpu.config import TrainingArguments
    from llamole_tpu.train.trainer import Trainer

    target = jnp.arange(16 * 8, dtype=jnp.float32).reshape(16, 8) / 50.0

    def loss_fn(trainable, frozen, rng, batch):
        pred = batch["x"] @ trainable["w"]
        loss = jnp.mean((pred - batch["x"] @ target) ** 2)
        aux = {"lm_loss": loss, "design_loss": 0.0, "retro_loss": 0.0}
        return loss, aux

    batch = {"x": np.random.default_rng(0).normal(
        size=(8, 16)).astype(np.float32),
        "input_ids": np.zeros((8, 4), np.int32)}
    args = TrainingArguments(learning_rate=1e-2,
                             lr_scheduler_type="constant")

    losses = []
    for spec in ("dp:4", "dcn:2,dp:2"):
        from llamole_tpu.parallel import mesh_from_string
        mesh = mesh_from_string(spec)
        trainer = Trainer(loss_fn, frozen={}, args=args,
                          num_training_steps=4, mesh=mesh)
        state = trainer.init_state({"w": jnp.zeros((16, 8))}, seed=0)
        placed = trainer._place_batch(batch)
        if spec.startswith("dcn"):
            # per-seq rows sharded over BOTH axes: 2 rows per device
            shards = placed["input_ids"].addressable_shards
            assert shards[0].data.shape[0] == 2
        (state.params, state.opt_state, state.rng,
         loss, aux, gnorm) = trainer._jit_step(
            state.params, state.opt_state, state.rng, placed,
            trainer.frozen)
        losses.append(float(loss))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)


def test_dcn_grouping_verifies_slice_alignment():
    """_dcn_grouped must only return the slice-major order when every
    per_group block sits inside one slice; otherwise contiguous
    fallback (code-review r3b finding #6)."""
    from llamole_tpu.parallel.mesh import _dcn_grouped

    class Dev:
        def __init__(self, i, s):
            self.id = i
            self.slice_index = s

        def __repr__(self):
            return f"d{self.id}s{self.slice_index}"

    # even topology: 2 slices x 4 devices, dcn=2 -> slice-major order
    devs = [Dev(i, i // 4) for i in range(8)]
    shuffled = [devs[i] for i in (3, 7, 0, 4, 1, 5, 2, 6)]
    out = _dcn_grouped(shuffled, dcn=2, per_group=4)
    assert {d.slice_index for d in out[:4]} == {0}
    assert {d.slice_index for d in out[4:]} == {1}

    # uneven topology (3+5 split): blocks would straddle -> fallback
    uneven = [Dev(i, 0 if i < 3 else 1) for i in range(8)]
    assert _dcn_grouped(uneven, dcn=2, per_group=4) == uneven

    # virtual devices without slice ids -> fallback
    class Plain:
        pass
    plains = [Plain() for _ in range(8)]
    assert _dcn_grouped(plains, dcn=2, per_group=4) == plains
