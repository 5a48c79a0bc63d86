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
