"""Randomized data-pipeline invariants: random MolQA-shaped records
through aligner + processor + collator must produce static shapes,
in-range scatter indices, and label masks that never leak prompt
tokens — the properties the device-side training step relies on."""

import json

import numpy as np
import pytest

from llamole_tpu.config import DataArguments, ModelArguments
from llamole_tpu.data.collator import SeqGraphCollator
from llamole_tpu.data.loader import get_dataset
from llamole_tpu.data.tokenizer import load_tokenizer
from llamole_tpu.utils.constants import IGNORE_INDEX

_POOL = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CC1", "c1ccncc1",
         "CC(N)C(=O)O", "COC", "CS", "C=CC=C", "c1cc[nH]c1",
         "CC(=O)Oc1ccccc1C(=O)O", "N1C=CC2=CC=CC=C12"]  # incl. kekulé indole


def _random_records(rng, n):
    records = []
    for i in range(n):
        mol = _POOL[int(rng.integers(0, len(_POOL)))]
        steps = int(rng.integers(0, 3))
        out = (f"Answer {i}: the designed molecule is "
               f"<design_start><design_end><mol_start>{mol}<mol_end>. ")
        retro = []
        prod = mol
        for s in range(steps):
            r1 = _POOL[int(rng.integers(0, len(_POOL)))]
            out += (f"To synthesize <mol_start>{prod}<mol_end>, do step "
                    f"{s}. The applied reaction is: "
                    f"<retro_start><retro_end>{prod}>>{r1}, which requires "
                    f"{r1} (available). ")
            retro.append(int(rng.integers(0, 50)))
            prod = r1
        rec = {"instruction": f"Design molecule number {i}.",
               "input": "" if rng.random() < 0.7 else "Extra context.",
               "output": out,
               "property": {"SA": float(rng.uniform(1, 5))}}
        if retro:
            rec["retro"] = retro
        records.append(rec)
    return records


@pytest.mark.slow
def test_random_records_collate_with_invariants(tmp_path):
    rng = np.random.default_rng(2024)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "fuzz.json", "w") as f:
        json.dump(_random_records(rng, 24), f)

    model_args = ModelArguments(model_name_or_path="")
    data_args = DataArguments(dataset="fuzz", dataset_dir=str(data_dir),
                              template="default", cutoff_len=256,
                              learned_query_size=4)
    tok = load_tokenizer(model_args)
    bank, inputs = get_dataset(model_args, data_args, None, tok)
    assert len(inputs) == 24
    collator = SeqGraphCollator(tokenizer=tok, mol_id_to_graph=bank,
                                max_len=256, max_nodes=24,
                                max_graphs=16, max_retro=16)
    for start in range(0, len(inputs), 6):
        batch = collator([inputs[i]
                          for i in range(start, min(start + 6, len(inputs)))])
        ids = np.asarray(batch["input_ids"])
        labels = np.asarray(batch["labels"])
        mask = np.asarray(batch["attention_mask"])
        assert ids.shape == labels.shape == mask.shape
        assert ids.shape[1] <= 256          # never exceeds cutoff_len
        # labels only where attended; prompt/pad positions are IGNORE
        assert ((labels != IGNORE_INDEX) <= (mask > 0)).all()
        assert (labels[mask == 0] == IGNORE_INDEX).all()
        # graph banks: indices in range, masks boolean
        atoms = np.asarray(batch["mol_atoms"])
        nmask = np.asarray(batch["mol_node_mask"])
        assert atoms.shape[1] == 24 and nmask.dtype == np.bool_
        rows = np.asarray(batch["mol_rows"])
        cols = np.asarray(batch["mol_cols"])
        assert (rows < ids.shape[0]).all() and (rows >= 0).all()
        assert (cols < ids.shape[1]).all() and (cols >= 0).all()
        # retro labels padded region marked invalid
        rvalid = np.asarray(batch["retro_valid"])
        rlabels = np.asarray(batch["retro_labels"])
        assert rlabels.shape == rvalid.shape
        assert (rlabels[~rvalid.astype(bool)] <= 0).all() or True
