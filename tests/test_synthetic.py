"""Synthetic MolQA corpus (data/synthetic.py) — the learnable ground
truth behind the learned-weights operating point (VERDICT r4 next #1).

The load-bearing property: every record is solvable by construction —
running the recorded retro template chain on the target regenerates the
recorded reactants all the way down to purchasable building blocks, so a
planner armed with a retro model trained on this corpus CAN succeed.
"""

import json
import random

import pytest

from llamole_tpu.chem import canonical_smiles
from llamole_tpu.chem.reaction import rdchiral_run_text
from llamole_tpu.data.aligner import (
    convert_molqa_record, extract_all_smiles, extract_retro_products)
from llamole_tpu.data.synthetic import (
    LABEL_TO_TEMPLATE, generate_corpus, inventory, structural_properties,
    write_corpus)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(40, seed=7)


def test_corpus_size_and_schema(corpus):
    assert len(corpus) == 40
    for rec in corpus:
        assert set(rec) == {"instruction", "input", "output", "property",
                            "retro"}
        assert rec["retro"], "every record carries at least one retro step"
        assert all(lbl in LABEL_TO_TEMPLATE for lbl in rec["retro"])
        assert {"SC", "SA"} <= set(rec["property"])


def test_records_aligner_roundtrip(corpus):
    for rec in corpus[:10]:
        ex = convert_molqa_record(rec, learned_query_size=4)
        # one design molecule + one product per retro step
        assert len(ex["retro_products"]) == len(rec["retro"])
        assert len(ex["molecules"]) >= 1 + len(rec["retro"])
        # every retro tag interior got the learned-query bodies
        assert ex["response"][0]["content"].count("<retro_body>") == \
            4 * len(rec["retro"])
        assert "<design_body>" in ex["response"][0]["content"]


def test_routes_solvable_to_inventory(corpus):
    """THE property: the recorded template chain reduces every target to
    purchasable leaves (planner success achievable by construction)."""
    inv = set(inventory())
    for rec in corpus:
        products = extract_retro_products(rec["output"])
        frontier = {canonical_smiles(products[0])}
        for lbl, prod in zip(rec["retro"], products):
            prod_c = canonical_smiles(prod)
            assert prod_c in frontier, "retro chain must be connected"
            frontier.discard(prod_c)
            outcomes = rdchiral_run_text(LABEL_TO_TEMPLATE[lbl], prod_c)
            assert outcomes, f"template {lbl} must fire on {prod_c}"
            # the recorded reactants appear among the outcomes
            recorded = None
            text = rec["output"]
            seg = text.split(f"<retro_end>{prod}>>")[1]
            recorded = sorted(canonical_smiles(p)
                              for p in seg.split(",")[0].split("."))
            hit = any(sorted(canonical_smiles(p) or p
                             for p in out.split(".")) == recorded
                      for out in outcomes)
            assert hit, f"recorded reactants not among template outcomes"
            frontier.update(r for r in recorded if r not in inv)
        assert not frontier, f"leaves not purchasable: {frontier}"


def test_targets_not_in_inventory(corpus):
    inv = set(inventory())
    for rec in corpus:
        target = extract_all_smiles(rec["output"])[0]
        assert canonical_smiles(target) not in inv


def test_properties_deterministic_and_ranged():
    p1 = structural_properties("CC(=O)Oc1ccccc1C(=O)O", route_len=1)
    p2 = structural_properties("CC(=O)Oc1ccccc1C(=O)O", route_len=1)
    assert p1 == p2
    assert p1["BBBP"] in (0.0, 1.0)
    assert 1.0 <= p1["SA"] <= 5.0 and 1.0 <= p1["SC"] <= 5.0
    assert structural_properties("") is None


def test_write_corpus_sidecars(tmp_path):
    path = str(tmp_path / "synth" / "corpus.json")
    manifest = write_corpus(path, 8, seed=3)
    assert manifest["records"] == 8
    with open(path) as f:
        assert len(json.load(f)) == 8
    base = path[:-len(".json")]
    with open(base + ".inventory.json") as f:
        inv = json.load(f)
    assert len(inv) == manifest["inventory"]
    with open(base + ".templates.json") as f:
        templates = json.load(f)
    assert set(templates) == {str(k) for k in LABEL_TO_TEMPLATE}


def test_seeded_determinism():
    a = generate_corpus(6, seed=11)
    b = generate_corpus(6, seed=11)
    assert a == b
