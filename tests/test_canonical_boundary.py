"""Canonicalization boundary for externally-sourced SMILES.

The reference's assets (available.csv.gz inventory, MolQA records) are
RDKit-canonical and all its internal strings flow through RDKit, so
string membership (planner is_known, '(available)' annotation) works in
ONE canonical space (graph_predictor/model.py:190-228, loader.py:279-284).
This package's canonicalizer is first-party, so every ingest boundary
must re-spell external SMILES — these tests feed kekulized / aromatic /
atom-order / stereo variant spellings and require membership to hit.
"""

import gzip
import json

import jax
import pytest

from llamole_tpu.chem import canonical_smiles, recanonicalize
from llamole_tpu.models.retro.model import GraphPredictor, GraphPredictorConfig

# externally-spelled inventory: kekulized benzene, reversed ethanol,
# HF-style ester ordering, kekulized phenol, stereo rewrite of alanine
VARIANT_INVENTORY = [
    "C1=CC=CC=C1",          # benzene, kekulized
    "OCC",                  # ethanol, reversed atom order
    "CC(=O)OCC",            # ethyl acetate, acyl-first ordering
    "C1=CC=C(C=C1)O",       # phenol, kekulized
    "N[C@@H](C)C(=O)O",     # L-alanine, N-first spelling
]
CANONICAL_FORMS = ["c1ccccc1", "CCO", "CCOC(C)=O", "c1ccc(cc1)O",
                   "C[C@@H](C(=O)O)N"]


def _tiny_predictor(available):
    cfg = GraphPredictorConfig(num_layer=2, hidden_size=16, out_dim=4,
                               text_input_size=8)
    return GraphPredictor(cfg, label_to_template={0: "dummy"},
                          available=available)


def test_recanonicalize_variants_collapse():
    for variant, canon in zip(VARIANT_INVENTORY, CANONICAL_FORMS):
        assert recanonicalize(variant) == canon
        # idempotent on already-canonical strings
        assert recanonicalize(canon) == canon


def test_recanonicalize_garbage_falls_back_to_raw():
    assert recanonicalize("not_a_smiles") == "not_a_smiles"
    assert recanonicalize("  C1CC ") == "C1CC"  # unclosed ring, stripped
    assert recanonicalize("") == ""


def test_predictor_inventory_recanonicalized():
    pred = _tiny_predictor(VARIANT_INVENTORY)
    assert pred.available == CANONICAL_FORMS


def test_predictor_inventory_dedups_equivalent_spellings():
    pred = _tiny_predictor(["OCC", "CCO", "C(C)O", "C1=CC=CC=C1",
                            "c1ccccc1"])
    assert pred.available == ["CCO", "c1ccccc1"]


def test_from_pretrained_inventory_recanonicalized(tmp_path):
    """available.csv.gz written with external spellings loads canonical
    (retro/model.py from_pretrained <- reference loader.py:279-284)."""
    pred = _tiny_predictor(None)
    params = pred.init(jax.random.PRNGKey(0))
    # write artifacts, then overwrite the inventory with variant rows
    pred.save_pretrained(params, str(tmp_path))
    with gzip.open(tmp_path / "available.csv.gz", "wt") as f:
        f.write("smiles\n")
        for s in VARIANT_INVENTORY:
            f.write(s + "\n")
    loaded, _ = GraphPredictor.from_pretrained(str(tmp_path))
    assert loaded.available == CANONICAL_FORMS


def test_planner_is_known_hits_variant_inventory():
    """Reactants proposed in OUR canonical space must count as known
    against an externally-spelled inventory (planner/search.py:49)."""
    from llamole_tpu.planner import retro_star_search

    pred = _tiny_predictor(VARIANT_INVENTORY)
    known = set(pred.available)

    def expand(s):
        # a one-step disconnection into purchasable (variant-spelled)
        # building blocks, proposed canonically as chem/reaction.py does
        return {"reactants": ["CCO.c1ccccc1"], "scores": [0.9],
                "templates": ["t"], "analysis": []}

    succ, route, used = retro_star_search(
        "CCOc1ccccc1", known, expand, lambda s, p: 0.5, iterations=4)
    assert succ, "route must close when reactants are in-stock"
    # the route's actual leaf reactants must be the in-stock molecules
    reactions, _, _, _ = route.get_reaction_list()
    leaves = {m for rxn in reactions for m in rxn.split(">>")[1].split(".")}
    assert leaves == {"CCO", "c1ccccc1"}
    assert leaves <= known


def test_retrosynthesize_canonicalizes_user_inventory():
    """composite.retrosynthesize re-spells a user-supplied starting_mols
    list; check via the availability set the planner receives (the same
    set feeds the '(available)' annotation, composite.py generate)."""
    # the annotation branch: available = set(graph_predictor.available)
    pred2 = _tiny_predictor(["OCC", "CC(=O)OCC"])
    available = set(pred2.available or [])
    reaction = "CCOC(C)=O>>CCO.CC(=O)O"  # our canonical reactants
    reactants = reaction.split(">>")[1].split(".")
    fmt = [r + " (available)" if r in available else r for r in reactants]
    assert fmt == ["CCO (available)", "CC(=O)O"]


def test_aligner_dedups_variant_record_spellings():
    """Two records spelling the same molecule differently share one
    graph-bank id (data/aligner.py align_dataset)."""
    from llamole_tpu.data.aligner import align_dataset

    records = [
        {"instruction": "q1", "input": "",
         "output": "A <design_start><design_end><mol_start>OCC<mol_end> done",
         "property": {"SC": 1.0, "SA": 1.0}, "retro": []},
        {"instruction": "q2", "input": "",
         "output": "B <design_start><design_end><mol_start>CCO<mol_end> done",
         "property": {"SC": 1.0, "SA": 1.0}, "retro": []},
    ]
    examples, id_to_smiles = align_dataset(records, learned_query_size=2)
    assert len(id_to_smiles) == 1
    assert list(id_to_smiles.values()) == ["CCO"]
    assert examples[0]["molecules"] == examples[1]["molecules"]


def test_generate_canonicalizes_input_smiles_list():
    """Phase-2 standalone targets re-spell at the generate() boundary."""
    # unit-level: the recanonicalize mapping applied in generate()
    targets = ["CC(=O)OCC", None, "garbage("]
    out = [recanonicalize(s) if s is not None else None for s in targets]
    assert out == ["CCOC(C)=O", None, "garbage("]
