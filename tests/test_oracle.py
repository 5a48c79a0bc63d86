"""Property oracle + eval scoring: training converges, artifacts round
trip, per-channel metrics compute correctly, and the summary surface
(uniqueness / novelty / text metrics) behaves on edge cases."""

import numpy as np
import pytest

from llamole_tpu.eval.scoring import (
    generation_set_metrics,
    oracle_property_metrics,
)


def test_generation_set_metrics_basic():
    results = [
        {"llm_smiles": "CCO", "llm_response": "an alcohol",
         "property": {"SA": 2.0}},
        {"llm_smiles": "OCC", "llm_response": "same alcohol",
         "property": {"SA": 2.0}},              # duplicate of CCO
        {"llm_smiles": "c1ccccc1", "llm_response": "benzene",
         "property": {"HIV": 1.0}},
        {"llm_smiles": None, "llm_response": "failed", "property": {}},
    ]
    records = [
        {"output": "molecule <mol_start>CCO<mol_end> an alcohol"},
        {"output": "molecule <mol_start>CCO<mol_end> again"},
        {"output": "ring <mol_start>CCN<mol_end> described"},
        {"output": "none here"},
    ]
    m = generation_set_metrics(results, records)
    # 3 valid spellings, 2 distinct molecules
    assert m["uniqueness"] == pytest.approx(2 / 3)
    # gold corpus molecules: {CCO, CCN}; distinct generated: {CCO, benzene}
    assert m["novelty"] == pytest.approx(1 / 2)
    assert m["text_metrics"] is not None
    assert set(m["text_metrics"]) == {"bleu-4", "rouge-1", "rouge-2",
                                      "rouge-l"}


def test_generation_set_metrics_no_gold():
    results = [{"llm_smiles": "CCO", "llm_response": "x", "property": {}}]
    m = generation_set_metrics(results, [{"instruction": "q"}])
    assert m["uniqueness"] == 1.0
    assert m["novelty"] is None and m["text_metrics"] is None


def test_frechet_graphclip_distance_properties():
    """FGD = 0 for identical sets, grows with distribution shift,
    None when a set is too small/unembeddable."""
    import jax
    from llamole_tpu.eval.scoring import frechet_graphclip_distance
    from llamole_tpu.models.graphclip.model import GraphCLIP, GraphCLIPConfig

    enc = GraphCLIP(GraphCLIPConfig(num_layer=2, hidden_size=16))
    params = enc.init(jax.random.PRNGKey(0))
    alkanes = ["CC", "CCC", "CCCC", "CCCCC"]
    aromatics = ["c1ccccc1", "c1ccncc1", "Cc1ccccc1", "c1cc[nH]c1"]

    same = frechet_graphclip_distance(enc, params, alkanes, list(alkanes))
    assert same == pytest.approx(0.0, abs=1e-4)
    shifted = frechet_graphclip_distance(enc, params, alkanes, aromatics)
    assert shifted > same + 1e-4
    assert frechet_graphclip_distance(enc, params, ["CC"], alkanes) is None
    assert frechet_graphclip_distance(enc, params,
                                      ["garbage", "???"], alkanes) is None


@pytest.mark.slow
def test_property_oracle_end_to_end(tmp_path):
    from llamole_tpu.train.pretrain import pretrain_property_oracle

    out = tmp_path / "oracle"
    metrics = pretrain_property_oracle(
        "data/molqa_train_examples.json", str(out),
        num_layer=2, hidden_size=32, batch_size=4, steps=120,
        learning_rate=2e-3, seed=0)
    assert metrics["final_loss"] < metrics["first_loss"]

    from llamole_tpu.models.oracle import PropertyOracle
    oracle, params = PropertyOracle.from_pretrained(str(out))
    preds = oracle.predict_smiles(params, ["CC(=O)Oc1ccccc1C(=O)O",
                                           "not-a-smiles", ""])
    assert preds[0] is not None and preds[0].shape == (10,)
    assert 0.0 <= float(preds[0][0]) <= 1.0   # binary channel: probability
    assert preds[1] is None and preds[2] is None

    # scoring hook: binary accuracy + continuous MAE per requested channel
    results = [
        {"llm_smiles": "CC(=O)Oc1ccccc1C(=O)O",
         "property": {"BBBP": 1.0, "SA": 1.8}},
        {"llm_smiles": "CCO", "property": {"SC": 2.0}},
        {"llm_smiles": None, "property": {"HIV": 1.0}},  # skipped
    ]
    m = oracle_property_metrics(str(out), results)
    assert "BBBP" in m["property_accuracy"]
    assert "SA" in m["property_mae"] and "SC" in m["property_mae"]
    assert m["property_mae"]["SA"] >= 0.0
    assert m["property_scored_counts"] == {"BBBP": 1, "SA": 1, "SC": 1}
    # HIV requested only by the failed row -> not scored
    assert "HIV" not in m["property_accuracy"]


@pytest.mark.slow
def test_oracle_overfits_binary_label(tmp_path):
    """Sanity: with enough steps on the tiny corpus the oracle learns
    the binary label of a molecule it saw (HIV=1 for the aromatic
    record in the shipped examples)."""
    import json
    from llamole_tpu.train.pretrain import pretrain_property_oracle
    from llamole_tpu.models.oracle import PropertyOracle
    from llamole_tpu.data.aligner import extract_all_smiles
    from llamole_tpu.utils.constants import MOL_PROPERTIES

    out = tmp_path / "oracle2"
    pretrain_property_oracle(
        "data/molqa_train_examples.json", str(out),
        num_layer=2, hidden_size=32, batch_size=4, steps=250,
        learning_rate=2e-3, seed=1)
    oracle, params = PropertyOracle.from_pretrained(str(out))
    recs = json.load(open("data/molqa_train_examples.json"))
    hits = total = 0
    for rec in recs:
        prop = rec.get("property") or {}
        smis = extract_all_smiles(rec.get("output", ""))
        if not smis:
            continue
        pred = oracle.predict_smiles(params, [smis[0]])[0]
        if pred is None:
            continue
        for name in ("BBBP", "HIV", "BACE"):
            if name in prop:
                total += 1
                hits += int((pred[MOL_PROPERTIES.index(name)] > 0.5)
                            == (prop[name] > 0.5))
    assert total >= 1
    assert hits / total >= 0.5   # learned, not anti-learned
