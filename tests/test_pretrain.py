"""Graph-module pretraining workflow tests: loss decreases, artifacts
load back through the standard pretrained path."""

import numpy as np
import pytest

from llamole_tpu.train.pretrain import (
    pretrain_graphclip,
    pretrain_graphdit,
    pretrain_predictor,
)


@pytest.mark.slow
def test_pretrain_graphdit_overfits(tmp_path):
    out = tmp_path / "gd"
    metrics = pretrain_graphdit(
        "data/molqa_train_examples.json", str(out),
        hidden_size=32, depth=2, num_heads=4, diffusion_steps=10,
        batch_size=4, steps=30, learning_rate=1e-3, seed=0)
    assert np.isfinite(metrics["final_loss"])
    assert metrics["final_loss"] < metrics["first_loss"]
    # loads back through the standard path and samples
    import jax
    import jax.numpy as jnp
    from llamole_tpu.models.graphdit import GraphDiT
    model, params = GraphDiT.from_pretrained(str(out))
    smiles = model.generate(params, jax.random.PRNGKey(0),
                            jnp.full((2, 10), jnp.nan),
                            jnp.zeros((2, model.cfg.text_dim)))
    assert len(smiles) == 2


def test_strip_molecule_text_removes_raw_smiles():
    """Reaction strings and reactant SMILES OUTSIDE <mol_start> spans
    must not reach the text tower (they would be a degenerate retrieval
    shortcut); plain prose survives — including lowercase words that
    happen to parse as SMILES."""
    from llamole_tpu.train.pretrain import _strip_molecule_text
    text = ("The designed molecule is: <mol_start>CCO<mol_end>. "
            "The applied reaction is: <retro_start><retro_end>"
            "CC(=O)Oc1ccccc1C(=O)O>>CC(=O)O.Oc1ccccc1C(=O)O, which "
            "requires the reactants: CC(=O)O (available), "
            "Oc1ccccc1C(=O)O (available). It cons a balanced profile.")
    cleaned = _strip_molecule_text(text)
    assert "CCO" not in cleaned
    assert ">>" not in cleaned and "c1ccccc1" not in cleaned.lower()
    assert "CC(=O)O" not in cleaned
    for word in ("designed", "molecule", "reaction", "reactants",
                 "available", "balanced", "cons"):
        assert word in cleaned


@pytest.mark.slow
def test_pretrain_graphclip_aligns(tmp_path):
    out = tmp_path / "gc"
    metrics = pretrain_graphclip(
        "data/molqa_train_examples.json", str(out),
        num_layer=2, hidden_size=32, text_hash_dim=512,
        batch_size=4, steps=120, learning_rate=2e-3, seed=0)
    assert metrics["final_loss"] < metrics["first_loss"]
    # on a tiny deduped corpus the pairs should become separable
    assert metrics["final_batch_retrieval_acc"] > 0.5

    # graph tower loads through the standard pretrained path
    import jax.numpy as jnp
    from llamole_tpu.models.graphclip.model import GraphCLIP
    model, params = GraphCLIP.from_pretrained(str(out))
    assert model.cfg.hidden_size == 32

    # text tower round-trips: its embeddings land in the graph space
    import json as _json
    from llamole_tpu.chem.featurize import pad_graph_batch, smiles_to_graph
    from llamole_tpu.train.pretrain import apply_text_tower, hash_text_features
    from llamole_tpu.utils.serialization import load_pytree
    tower = load_pytree(str(out / "text_tower.msgpack"))
    clip_cfg = _json.loads((out / "clip_config.json").read_text())
    feats = hash_text_features(["a small aspirin-like molecule"],
                               clip_cfg["text_hash_dim"])
    t = apply_text_tower(tower["text"], jnp.asarray(feats))
    padded = pad_graph_batch([smiles_to_graph("CC(=O)Oc1ccccc1C(=O)O")], 16)
    g = model(params, jnp.asarray(padded["atom_types"]),
              jnp.asarray(padded["edge_classes"]),
              jnp.asarray(padded["node_mask"]))
    sim = jnp.sum(g * t, axis=-1)
    assert sim.shape == (1,)
    assert bool(jnp.isfinite(sim).all())


@pytest.mark.slow
def test_pretrain_predictor_overfits(tmp_path):
    out = tmp_path / "gp"
    metrics = pretrain_predictor(
        "data/molqa_train_examples.json", str(out),
        hidden_size=32, num_layer=2, batch_size=4, steps=60,
        learning_rate=1e-3, seed=0,
        label_to_template={101: "[C:1]>>[C:1]", 212: "[N:1]>>[N:1]",
                           57: "[O:1]>>[O:1]", 33: "[S:1]>>[S:1]"})
    assert metrics["final_loss"] < metrics["first_loss"]
    from llamole_tpu.models.retro import GraphPredictor
    model, params = GraphPredictor.from_pretrained(str(out))
    assert model.cfg.out_dim >= 2
    assert model.label_to_template  # remapped templates persisted
