"""End-to-end eval workflow test on tiny random models: two-phase MolQA
over a small synthetic dataset, result schema parity."""

import json

import numpy as np
import pytest

from llamole_tpu.config import (
    DataArguments,
    FinetuningArguments,
    GeneratingArguments,
    ModelArguments,
    TrainingArguments,
)
from llamole_tpu.eval.workflow import run_molqa

RECORDS = [
    {"instruction": "Design a molecule that is a simple alcohol.",
     "input": "", "property": {"SC": 2.0, "SA": 2.5}},
    {"instruction": "Design an aromatic solvent molecule.",
     "input": "", "property": {"HIV": 0.0, "SC": 1.5, "SA": 1.5}},
]


@pytest.mark.slow
def test_run_molqa_two_phase(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "molqa_tiny.json", "w") as f:
        json.dump(RECORDS, f)

    model_args = ModelArguments(model_name_or_path="")
    data_args = DataArguments(dataset="molqa_tiny", dataset_dir=str(data_dir),
                              template="default", cutoff_len=96,
                              learned_query_size=8)
    training_args = TrainingArguments(per_device_eval_batch_size=2,
                                      output_dir=str(tmp_path / "out"), seed=0)
    ft_args = FinetuningArguments(lora_rank=4)
    gen_args = GeneratingArguments(max_new_tokens=8, temperature=0.6,
                                   top_p=0.9, do_sample=True)

    results = run_molqa(model_args, data_args, training_args, ft_args,
                        gen_args)
    assert len(results) == 2
    for r in results:
        assert set(r) >= {"qa_idx", "instruction", "llm_response",
                          "llm_smiles", "property", "llm_reactions"}
        assert r["llm_smiles"] is None or isinstance(r["llm_smiles"], str)
        assert isinstance(r["llm_reactions"], list)
    assert results[0]["property"] == {"SC": 2.0, "SA": 2.5}
    out = json.load(open(tmp_path / "out" / "molqa_results.json"))
    assert "summary" in out and out["summary"]["num_records"] == 2
    assert 0.0 <= out["summary"]["validity"] <= 1.0


@pytest.mark.slow
def test_run_molqa_multi_batch_walls(tmp_path):
    """records > per_device_eval_batch_size: Phase 2 runs once per batch
    (each with its own planning wall) and the summary aggregates
    retro_expansions_per_mol over every record, not just the last
    batch."""
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "molqa_tiny.json", "w") as f:
        json.dump(RECORDS, f)

    results = run_molqa(
        ModelArguments(model_name_or_path=""),
        DataArguments(dataset="molqa_tiny", dataset_dir=str(data_dir),
                      template="default", cutoff_len=96,
                      learned_query_size=8),
        TrainingArguments(per_device_eval_batch_size=1,
                          output_dir=str(tmp_path / "out"), seed=0),
        FinetuningArguments(lora_rank=4),
        GeneratingArguments(max_new_tokens=8, temperature=0.6,
                            top_p=0.9, do_sample=True, frontier_width=2),
        expansion_topk=2, iterations=1, max_planning_time=5.0)
    assert len(results) == 2
    out = json.load(open(tmp_path / "out" / "molqa_results.json"))
    summary = out["summary"]
    assert summary["num_records"] == 2
    # aggregated over BOTH single-record batches
    assert summary["retro_expansions_per_mol"] is not None
    assert summary["retro_expansions_per_mol"] >= 0.0


@pytest.mark.slow
def test_run_molqa_seed_determinism(tmp_path):
    """Two Phase-1 runs with the same seed produce identical responses
    and molecules — sampling is fully PRNG-keyed, so any divergence is
    a nondeterminism regression (host iteration order, uncontrolled
    randomness, cache-dependent numerics)."""
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "molqa_tiny.json", "w") as f:
        json.dump(RECORDS, f)

    def run(out_name):
        return run_molqa(
            ModelArguments(model_name_or_path=""),
            DataArguments(dataset="molqa_tiny", dataset_dir=str(data_dir),
                          template="default", cutoff_len=96,
                          learned_query_size=8),
            TrainingArguments(per_device_eval_batch_size=2,
                              output_dir=str(tmp_path / out_name), seed=7),
            FinetuningArguments(lora_rank=4),
            GeneratingArguments(max_new_tokens=8, temperature=0.6,
                                top_p=0.9, do_sample=True),
            do_retro=False)

    a = run("a")
    b = run("b")
    for ra, rb in zip(a, b):
        assert ra["llm_response"] == rb["llm_response"]
        assert ra["llm_smiles"] == rb["llm_smiles"]


@pytest.mark.slow
def test_run_molqa_dp_sharded_phase1(tmp_path):
    """Phase-1 design dp-sharded over the 8-virtual-device mesh: batch
    rows pad to the dp multiple, outputs slice back (SURVEY §2.2
    multi-chip sampling; eval workflow honors training_args.mesh)."""
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "molqa_tiny.json", "w") as f:
        json.dump(RECORDS + [
            {"instruction": "Design a tiny ester.", "input": "",
             "property": {"SC": 1.0, "SA": 1.0}},
        ], f)

    model_args = ModelArguments(model_name_or_path="")
    data_args = DataArguments(dataset="molqa_tiny", dataset_dir=str(data_dir),
                              template="default", cutoff_len=96,
                              learned_query_size=8)
    training_args = TrainingArguments(per_device_eval_batch_size=3,
                                      output_dir=str(tmp_path / "out"),
                                      seed=0, mesh="dp:8")
    ft_args = FinetuningArguments(lora_rank=4)
    gen_args = GeneratingArguments(max_new_tokens=8, temperature=0.6,
                                   top_p=0.9, do_sample=True)

    results = run_molqa(model_args, data_args, training_args, ft_args,
                        gen_args, do_retro=False)
    assert len(results) == 3   # 3 records despite dp=8 padding
    for r in results:
        assert r["llm_smiles"] is None or isinstance(r["llm_smiles"], str)
