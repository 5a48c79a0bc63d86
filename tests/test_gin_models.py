"""GIN encoder/predictor tests: permutation invariance, masking,
conditioning, CostMLP (SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.chem.featurize import pad_graph_batch, smiles_to_graph
from llamole_tpu.models.graphclip import GraphCLIP, GraphCLIPConfig
from llamole_tpu.models.retro import CostMLP, GraphPredictor, GraphPredictorConfig


def _batch(smiles, n=16):
    gs = [smiles_to_graph(s) for s in smiles]
    b = pad_graph_batch(gs, n)
    return (jnp.asarray(b["atom_types"]), jnp.asarray(b["edge_classes"]),
            jnp.asarray(b["node_mask"]))


@pytest.fixture(scope="module")
def clip_model():
    model = GraphCLIP(GraphCLIPConfig(num_layer=2, hidden_size=32))
    return model, model.init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def retro_model():
    cfg = GraphPredictorConfig(num_layer=2, hidden_size=32, out_dim=7,
                               text_input_size=16)
    model = GraphPredictor(cfg)
    return model, model.init(jax.random.PRNGKey(1))


def test_clip_embeddings_unit_norm(clip_model):
    model, params = clip_model
    a, e, m = _batch(["CCO", "c1ccccc1"])
    emb = model(params, a, e, m)
    assert emb.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0,
                               rtol=1e-5)


def test_clip_padding_invariance(clip_model):
    """Same molecule, different padding width -> same embedding."""
    model, params = clip_model
    a1, e1, m1 = _batch(["CCO"], n=8)
    a2, e2, m2 = _batch(["CCO"], n=16)
    emb1 = model(params, a1, e1, m1)
    emb2 = model(params, a2, e2, m2)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2), atol=1e-5)


def test_clip_permutation_invariance(clip_model):
    """Atom relabeling must not change the graph embedding."""
    model, params = clip_model
    g = smiles_to_graph("CC(=O)OC")
    n = g.n_nodes
    perm = np.random.default_rng(0).permutation(n)
    a = np.zeros((1, 8), np.int32); a[0, :n] = g.atom_types[perm]
    e = np.zeros((1, 8, 8), np.int32)
    e[0, :n, :n] = g.edge_classes[np.ix_(perm, perm)]
    m = np.zeros((1, 8), bool); m[0, :n] = True
    a0 = np.zeros((1, 8), np.int32); a0[0, :n] = g.atom_types
    e0 = np.zeros((1, 8, 8), np.int32); e0[0, :n, :n] = g.edge_classes
    emb_p = model(params, jnp.asarray(a), jnp.asarray(e), jnp.asarray(m))
    emb_0 = model(params, jnp.asarray(a0), jnp.asarray(e0), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(emb_p), np.asarray(emb_0), atol=1e-5)


def test_retro_logits_and_conditioning(retro_model):
    model, params = retro_model
    a, e, m = _batch(["CCO", "c1ccccc1"])
    c = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    logits = model(params, a, e, m, c)
    assert logits.shape == (2, 7)
    logits_none = model(params, a, e, m, None)
    assert logits_none.shape == (2, 7)
    # zero-init adapters: same GIN trunk but gates differ once c differs —
    # at init gate==0 so conditioning is inert; check probs normalize
    probs = model.template_probs(params, a, e, m, c)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_retro_save_load(tmp_path, retro_model):
    model, params = retro_model
    model.label_to_template = {0: "[C:1]>>[C:1]O", 1: "[N:1]>>[N:1]"}
    model.available = ["CCO", "CCN"]
    model.save_pretrained(params, str(tmp_path / "gp"))
    m2, p2 = GraphPredictor.from_pretrained(str(tmp_path / "gp"))
    assert m2.label_to_template[0] == "[C:1]>>[C:1]O"
    assert m2.available == ["CCO", "CCN"]
    assert m2.cfg.out_dim == 7
    for x, z in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(z))


def test_cost_mlp():
    cm = CostMLP()
    params = cm.init(jax.random.PRNGKey(0))
    cost = cm.estimate_cost(params, "CCO")
    assert np.isfinite(cost) and cost >= 0
    with pytest.raises(ValueError):
        cm.estimate_cost(params, "((bad")
