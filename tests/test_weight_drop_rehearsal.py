"""Weight-drop rehearsal: the complete real-checkpoint flow, end to end.

Simulates the day the reference's pretrained assets land: build
reference-layout torch checkpoints for ALL four module kinds (GraphDiT
with the HF-shipped `config.yaml` naming + data.meta.json, GraphCLIP
encoder, GNNPredictor with template/inventory tables spelled the way
RDKit would write them, connectors), run scripts/
convert_reference_weights.py on each, point ModelArguments at the
converted directories, build the composite, and run Phase-1 design +
a Phase-2 expansion. This is the integration seam the per-module schema
tests (test_convert_schema.py) cannot cover.
"""

import gzip
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/src/model/graph_decoder"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.convert_reference_weights import (  # noqa: E402
    convert_connectors,
    convert_encoder,
    convert_graphdit,
    convert_predictor,
)

import test_convert_schema as schema  # noqa: E402  (shared fixtures)


def _make_graphdit_src(tmp_path, info, hidden, text_dim):
    tr = schema._load_reference_transformer()
    torch.manual_seed(0)
    xdim = len(info.active_atoms)
    ref = tr.Transformer(max_n_nodes=info.max_n_nodes, hidden_size=hidden,
                         depth=2, num_heads=4, mlp_ratio=2.0,
                         drop_condition=0.0, Xdim=xdim, Edim=5, ydim=10,
                         text_dim=text_dim)
    src = tmp_path / "Llamole-Pretrained-GraphDiT"
    src.mkdir()
    torch.save(ref.state_dict(), src / "model.pt")
    # HF checkpoint naming: config.yaml, NOT model_config.yaml
    # (reference loader.py:224-231)
    with open(src / "config.yaml", "w") as f:
        f.write(f"""hidden_size: {hidden}
depth: 2
num_heads: 4
mlp_ratio: 2.0
drop_condition: 0.0
diffusion_steps: 8
diffusion_noise_schedule: cosine
guide_scale: 2.0
lambda_train: [1.0, 5.0]
text_dim: {text_dim}
""")
    info.save(str(src))
    return src


def _make_encoder_src(tmp_path, h, L):
    gen = np.random.default_rng(1)
    src = tmp_path / "Llamole-Pretrained-GraphEncoder"
    src.mkdir()
    torch.save(schema._gin_trunk_sd(gen, L, h, norms_affine=True),
               src / "model.pt")
    proj = {}
    proj.update(schema._lin_sd("fc1", h, h, gen=gen))
    proj.update(schema._ln_sd("norm1", h, gen))
    proj.update(schema._lin_sd("fc2", h, h, gen=gen))
    torch.save(proj, src / "model_proj.pt")
    with open(src / "model_config.json", "w") as f:
        json.dump({"graph_num_layer": L, "graph_hidden_size": h}, f)
    return src


def _make_predictor_src(tmp_path, h, L, text_dim, n_task):
    gen = np.random.default_rng(2)
    src = tmp_path / "Llamole-Pretrained-GNNPredictor"
    src.mkdir()
    sd = schema._gin_trunk_sd(gen, L, h, norms_affine=False)
    sd["text_dropping.weight"] = torch.from_numpy(
        gen.normal(size=(1, text_dim)).astype(np.float32))
    for i in range(L):
        sd.update(schema._lin_sd(f"adapters.{i}.1", text_dim, 3 * h, gen=gen))
    sd.update(schema._lin_sd("decoder.0", h, 4 * h, gen=gen))
    sd.update(schema._ln_sd("decoder.1", 4 * h, gen))
    sd.update(schema._lin_sd("decoder.4", 4 * h, n_task, gen=gen))
    torch.save(sd, src / "model.pt")
    with open(src / "model_config.json", "w") as f:
        json.dump({"num_layer": L, "hidden_size": h, "num_task": n_task,
                   "text_input_size": text_dim}, f)
    with gzip.open(src / "label_to_template.csv.gz", "wt") as f:
        f.write('rule_label,retro_templates\n')
        f.write('0,"[C:1](=[O:2])-[O:3]-[C:4]>>[C:1](=[O:2])-[OH].[OH]-[C:4]"\n')
        f.write('1,"[C:1](=[O:2])-[NH:3]>>[C:1](=[O:2])-[OH].[NH2:3]"\n')
    with gzip.open(src / "available.csv.gz", "wt") as f:
        # external (RDKit-style) spellings: kekulized + reversed orders
        f.write("smiles\nOCC\nCC(=O)O\nC1=CC=CC=C1\nCC(O)=O\n")
    return src


def _make_connector_src(tmp_path, enc_h, lm_h, text_dim):
    gen = np.random.default_rng(3)
    src = tmp_path / "Llamole-Adapter"
    src.mkdir()
    torch.save(schema._lin_sd("0", enc_h, lm_h, gen=gen),
               src / "graph_to_lm_connector.pt")
    torch.save(schema._lin_sd("0", lm_h, text_dim, gen=gen),
               src / "lm_to_graph_decoder.pt")
    torch.save(schema._lin_sd("0", lm_h, text_dim, gen=gen),
               src / "lm_to_graph_predictor.pt")
    return src


def test_full_checkpoint_drop_to_running_composite(tmp_path):
    import jax

    from llamole_tpu.config import (DataArguments, FinetuningArguments,
                                    ModelArguments)
    from llamole_tpu.models.composite import GenerationSettings
    from llamole_tpu.models.graphdit.config import build_data_info_from_smiles
    from llamole_tpu.models.loader import build_graph_lm

    lm_h = 64          # tiny LLM hidden size (LLMConfig.tiny default)
    enc_h, text_dim = 32, 16
    corpus = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCOC(C)=O", "C1CC1"]
    info = build_data_info_from_smiles(corpus, max_n_nodes=12)

    dit_src = _make_graphdit_src(tmp_path, info, hidden=48,
                                 text_dim=text_dim)
    enc_src = _make_encoder_src(tmp_path, enc_h, L=2)
    pred_src = _make_predictor_src(tmp_path, h=32, L=2,
                                   text_dim=text_dim, n_task=2)
    conn_src = _make_connector_src(tmp_path, enc_h, lm_h, text_dim)

    dit_dst = tmp_path / "dit"
    enc_dst = tmp_path / "enc"
    pred_dst = tmp_path / "pred"
    conn_dst = tmp_path / "adapter"
    convert_graphdit(str(dit_src), str(dit_dst))
    convert_encoder(str(enc_src), str(enc_dst))
    convert_predictor(str(pred_src), str(pred_dst))
    convert_connectors(str(conn_src), str(conn_dst))

    model_args = ModelArguments(
        model_name_or_path="",
        graph_decoder_path=str(dit_dst),
        graph_encoder_path=str(enc_dst),
        graph_predictor_path=str(pred_dst),
        adapter_name_or_path=str(conn_dst),
    )
    model, frozen, trainable, tok = build_graph_lm(
        model_args, DataArguments(), FinetuningArguments(
            finetuning_type="freeze"), seed=0, load_adapter=True)

    # converted inventory landed in OUR canonical space
    assert "CCO" in model.graph_predictor.available
    assert "c1ccccc1" in model.graph_predictor.available
    assert len(model.graph_predictor.available) == 3  # CC(=O)O deduped

    # config flowed from the HF-named config.yaml
    assert model.graph_decoder.cfg.depth == 2
    assert model.graph_decoder.cfg.diffusion_steps == 8
    assert model.graph_decoder.cfg.text_dim == text_dim

    # Phase 1: prompt -> decode -> connector -> diffusion -> SMILES
    gen = GenerationSettings(max_new_tokens=8, do_sample=True)
    prompt = tok.encode("Design a small molecule that is synthesizable.")
    ids = np.tile(np.asarray(prompt, np.int32)[None], (2, 1))
    props = np.full((2, 10), np.nan, np.float32)
    props[:, -1] = 3.0
    analysis, smiles = model.design_molecule(
        frozen, trainable, jax.random.PRNGKey(0), ids,
        np.ones_like(ids), props, gen=gen)
    assert len(smiles) == 2  # validity depends on random-weight draws

    # Phase 2: one expansion through the converted predictor + templates
    results = model.batched_one_step_reaction(
        frozen, trainable, jax.random.PRNGKey(1), ["CCOC(C)=O"],
        topk=2, gen=gen, analysis_tokens=8)
    assert len(results) == 1
    res = results[0]
    if res is not None and res.get("reactants"):
        # ester template applied: reactants must be canonical spellings
        from llamole_tpu.chem import canonical_smiles
        for r in res["reactants"]:
            for frag in r.split("."):
                assert canonical_smiles(frag) == frag


def test_parity_command_end_to_end(tmp_path):
    """The ONE-command parity pipeline, rehearsed offline: reference-
    layout torch checkpoints -> discovery by content -> conversion ->
    composite build -> two-phase MolQA -> 12-metric table with every
    metric family non-null (runbook §§2-4 collapsed into
    eval/parity.run_parity; real weights only swap the inputs)."""
    import json

    from llamole_tpu.eval.parity import discover_checkpoints, run_parity
    from llamole_tpu.models.graphdit.config import build_data_info_from_smiles
    from llamole_tpu.train.pretrain import pretrain_property_oracle
    from llamole_tpu.utils.constants import MOL_PROPERTIES

    lm_h, enc_h, text_dim = 64, 32, 16
    corpus = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCOC(C)=O", "C1CC1"]
    info = build_data_info_from_smiles(corpus, max_n_nodes=12)

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    _make_graphdit_src(ckpt, info, hidden=48, text_dim=text_dim)
    _make_encoder_src(ckpt, enc_h, L=2)
    _make_predictor_src(ckpt, h=32, L=2, text_dim=text_dim, n_task=2)
    _make_connector_src(ckpt, enc_h, lm_h, text_dim)

    # discovery resolves every kind by content signature
    found = discover_checkpoints(str(ckpt))
    assert set(found) == {"graphdit", "encoder", "predictor", "adapter"}

    # tiny MolQA set: every record requests ALL 10 channels so one valid
    # molecule covers the full property table; gold outputs feed
    # BLEU/novelty
    all_props = {"BBBP": 1.0, "HIV": 0.0, "BACE": 1.0, "CO2": 1.0,
                 "N2": 2.0, "O2": 1.5, "FFV": 0.3, "TC": 0.2,
                 "SC": 2.0, "SA": 3.0}
    records = [
        {"instruction": f"Design molecule number {i} with the requested "
                        "profile and describe its synthesis.",
         "input": "",
         "output": ("The designed molecule is: <design_start><design_end>"
                    f"<mol_start>{smi}<mol_end>. To synthesize "
                    f"<mol_start>{smi}<mol_end>, follow these procedures: "
                    "standard conditions."),
         "property": dict(all_props)}
        for i, smi in enumerate(corpus)
    ]
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "molqa_parity.json", "w") as f:
        json.dump(records, f)

    # tiny first-party oracle (steps shrunk for the rehearsal)
    oracle_dir = tmp_path / "oracle"
    pretrain_property_oracle(str(data_dir / "molqa_parity.json"),
                             str(oracle_dir), steps=30, hidden_size=32,
                             num_layer=2)

    out_dir = tmp_path / "parity_out"
    table = run_parity(
        str(ckpt), oracle=str(oracle_dir),
        dataset="molqa_parity", dataset_dir=str(data_dir),
        output_dir=str(out_dir), batch_size=3, cutoff_len=96,
        max_new_tokens=8, frontier_width=3,
        expansion_topk=2, iterations=2, max_planning_time=2.0)

    # table schema: all 12 metric families + text/set metrics present
    expected = {"validity", "retro_success", "bleu4", "rouge1", "rouge2",
                "rougeL", "uniqueness", "novelty", "fgd", "num_records",
                "molecules_per_min"}
    expected |= {f"acc_{n}" for n in MOL_PROPERTIES[:3]}
    expected |= {f"mae_{n}" for n in MOL_PROPERTIES[3:]}
    assert expected <= set(table)
    nulls = [k for k in expected if table[k] is None]
    assert not nulls, f"parity metrics unexpectedly null: {nulls}"
    assert table["num_records"] == len(records)
    assert 0.0 < table["validity"] <= 1.0

    # artifacts on disk: converted trees + the table + raw results
    on_disk = json.load(open(out_dir / "parity_table.json"))
    assert on_disk == table
    assert (out_dir / "converted" / "graphdit" / "model.msgpack").exists()
    assert (out_dir / "molqa_results.json").exists()

    # idempotent: second run skips conversion and reproduces the schema
    table2 = run_parity(
        str(ckpt), oracle=str(oracle_dir),
        dataset="molqa_parity", dataset_dir=str(data_dir),
        output_dir=str(out_dir), batch_size=3, cutoff_len=96,
        max_new_tokens=8, frontier_width=3,
        expansion_topk=2, iterations=2, max_planning_time=2.0)
    assert expected <= set(table2)
