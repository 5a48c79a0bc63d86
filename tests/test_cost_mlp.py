"""CostMLP feature-compat story.

The reference's cost model consumes RDKit Morgan bits
(graph_predictor/model.py:356-391); this package's Morgan hash is
first-party and bit-incompatible, so (a) the converter must REFUSE
reference cost_model.pt, (b) loading requires a feature-scheme
provenance marker, and (c) the cost model is trained in-framework
(train/pretrain.pretrain_cost_mlp) and drives the planner value
function (estimate_synthesis_complexity, modeling_llamole.py:891-939).
"""

import json

import jax
import numpy as np
import pytest

from llamole_tpu.models.retro.model import COST_FEATURE_SCHEME, CostMLP


def test_cost_mlp_save_load_roundtrip(tmp_path):
    model = CostMLP(n_layers=2, fp_dim=128, latent_dim=16)
    params = model.init(jax.random.PRNGKey(0))
    model.save_pretrained(params, str(tmp_path))
    with open(tmp_path / "cost_config.json") as f:
        cfg = json.load(f)
    assert cfg["feature_scheme"] == COST_FEATURE_SCHEME
    loaded, lp = CostMLP.from_pretrained(str(tmp_path))
    assert loaded.fp_dim == 128 and loaded.n_layers == 2
    c1 = model.estimate_cost(params, "CCO")
    c2 = loaded.estimate_cost(lp, "CCO")
    assert c1 == pytest.approx(c2)
    assert c1 >= 0.0  # softplus output


def test_cost_mlp_load_rejects_foreign_features(tmp_path):
    """A checkpoint without our feature-scheme marker (e.g. converted
    from RDKit-feature weights) must be refused, not loaded."""
    model = CostMLP(fp_dim=64, latent_dim=8)
    params = model.init(jax.random.PRNGKey(0))
    model.save_pretrained(params, str(tmp_path))
    cfg = json.loads((tmp_path / "cost_config.json").read_text())
    cfg["feature_scheme"] = "rdkit-morgan-r2"
    (tmp_path / "cost_config.json").write_text(json.dumps(cfg))
    with pytest.raises(ValueError, match="feature scheme"):
        CostMLP.from_pretrained(str(tmp_path))
    # missing config entirely -> also refused
    (tmp_path / "cost_config.json").unlink()
    with pytest.raises(ValueError, match="feature scheme"):
        CostMLP.from_pretrained(str(tmp_path))


def test_converter_refuses_reference_cost_model(tmp_path):
    """scripts/convert_reference_weights.py predictor conversion must
    abort loudly when cost_model.pt is present."""
    import torch

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import convert_reference_weights as conv

    h, L, text, out = 8, 2, 8, 3
    sd = {"atom_encoder.weight": torch.randn(118, h),
          "virtualnode_embedding.weight": torch.zeros(1, h),
          "text_dropping.weight": torch.randn(1, text)}

    def flat(prefix, d):
        return {f"{prefix}.{k}": v for k, v in d.items()}

    def linear(o, i):
        return {"weight": torch.randn(o, i), "bias": torch.randn(o)}

    for i in range(L):
        sd[f"convs.{i}.eps"] = torch.zeros(1)
        sd[f"convs.{i}.bond_encoder.weight"] = torch.randn(5, h)
        sd.update(flat(f"convs.{i}.mlp.0", linear(4 * h, h)))
        sd.update(flat(f"convs.{i}.mlp.1", {"weight": torch.randn(4 * h),
                                            "bias": torch.randn(4 * h)}))
        sd.update(flat(f"convs.{i}.mlp.4", linear(h, 4 * h)))
        sd.update(flat(f"adapters.{i}.1", linear(3 * h, text)))
        if i < L - 1:
            sd.update(flat(f"mlp_virtualnode_list.{i}.0", linear(4 * h, h)))
            sd.update(flat(f"mlp_virtualnode_list.{i}.1",
                           {"weight": torch.randn(4 * h),
                            "bias": torch.randn(4 * h)}))
            sd.update(flat(f"mlp_virtualnode_list.{i}.4", linear(h, 4 * h)))
    sd.update(flat("decoder.0", linear(4 * h, h)))
    sd.update(flat("decoder.1", {"weight": torch.randn(4 * h),
                                 "bias": torch.randn(4 * h)}))
    sd.update(flat("decoder.4", linear(out, 4 * h)))

    src = tmp_path / "pred"
    src.mkdir()
    torch.save(sd, src / "model.pt")
    torch.save(flat("layers.0", linear(1, 2048)), src / "cost_model.pt")
    with pytest.raises(SystemExit, match="REFUSING"):
        conv.convert_predictor(str(src), str(tmp_path / "out"))
    # without the cost model, the same predictor converts fine
    (src / "cost_model.pt").unlink()
    conv.convert_predictor(str(src), str(tmp_path / "out"))
    assert (tmp_path / "out" / "model.msgpack").exists()


def test_pretrain_cost_mlp_and_value_function(tmp_path):
    """Train on (smiles, cost) pairs, reload, and drive the planner
    value path (estimate_costs + estimate_cost agree; costs order by
    complexity after overfitting a separable corpus)."""
    from llamole_tpu.train.pretrain import pretrain_cost_mlp

    corpus = [{"smiles": "C" * n, "cost": float(n >= 6) * 5.0}
              for n in range(1, 11)]
    path = tmp_path / "cost_corpus.json"
    path.write_text(json.dumps(corpus))
    out_dir = tmp_path / "cost_out"
    metrics = pretrain_cost_mlp(str(path), str(out_dir),
                                fp_dim=256, latent_dim=16,
                                steps=200, learning_rate=3e-3, seed=0)
    assert metrics["final_loss"] < metrics["first_loss"]
    assert metrics["final_loss"] < 1.0  # overfits a 10-sample corpus

    model, params = CostMLP.from_pretrained(str(out_dir))
    cheap = model.estimate_cost(params, "CC")
    dear = model.estimate_cost(params, "C" * 8)
    assert dear > cheap
    batch = model.estimate_costs(params, ["CC", "C" * 8, "not_a_smiles"])
    assert batch[0] == pytest.approx(cheap, rel=1e-5)
    assert batch[1] == pytest.approx(dear, rel=1e-5)
    assert batch[2] == 0.0  # invalid SMILES -> zero cost, no raise


def test_molqa_records_yield_cost_to_go_rows():
    from llamole_tpu.train.pretrain import _cost_rows

    records = [
        {"smiles": "CCO", "cost": 2.5},
        {"output": (
            "Design <design_start><design_end><mol_start>CCOC(C)=O"
            "<mol_end>. This is step 1 in the retrosynthesis process. "
            "The applied reaction is: <retro_start><retro_end>"
            "CCOC(C)=O>>CCO.CC(=O)O, next. This is step 2 in the "
            "retrosynthesis process. The applied reaction is: "
            "<retro_start><retro_end>CC(=O)O>>CC.O done.")},
    ]
    rows = _cost_rows(records)
    assert ("CCO", 2.5) in rows
    # two-step route: step-1 product costs 2 (two steps to go), step-2
    # product costs 1
    assert ("CCOC(C)=O", 2.0) in rows
    assert ("CC(=O)O", 1.0) in rows


def test_available_reactants_anchor_cost_zero():
    """'(available)' reactants contribute cost-0 anchor rows (the
    regressor otherwise never sees a purchasable leaf and learns a
    floor at the min step cost — code-review r3 finding #3)."""
    from llamole_tpu.train.pretrain import _cost_rows

    records = [{"output": (
        "Design <design_start><design_end><mol_start>CCOC(C)=O<mol_end>. "
        "This is step 1 in the retrosynthesis process. The applied "
        "reaction is: <retro_start><retro_end>CCOC(C)=O>>CCO.CC(=O)O, "
        "which requires the reactants: CCO (available), CC(=O)O "
        "(available).")}]
    rows = _cost_rows(records)
    assert ("CCO", 0.0) in rows
    assert ("CC(=O)O", 0.0) in rows
    assert ("CCOC(C)=O", 1.0) in rows


def test_build_graph_lm_picks_up_cost_model(tmp_path):
    """A cost_model.msgpack next to the predictor weights loads into the
    composite (loader.py <- reference loader.py:279-284 value_model)."""
    from llamole_tpu.config import (DataArguments, FinetuningArguments,
                                    ModelArguments)
    from llamole_tpu.models.loader import build_graph_lm, make_fallback_predictor

    pred_dir = tmp_path / "predictor"
    pred = make_fallback_predictor()
    pred.save_pretrained(pred.init(jax.random.PRNGKey(0)), str(pred_dir))
    cm = CostMLP(fp_dim=64, latent_dim=8)
    cm.save_pretrained(cm.init(jax.random.PRNGKey(1)), str(pred_dir))

    margs = ModelArguments(model_name_or_path="",
                           graph_predictor_path=str(pred_dir))
    model, frozen, trainable, tok = build_graph_lm(
        margs, DataArguments(), FinetuningArguments(), seed=0)
    assert model.cost_mlp is not None
    c = model.cost_mlp.estimate_cost(model.cost_mlp_params, "CCO")
    assert np.isfinite(c) and c >= 0.0
