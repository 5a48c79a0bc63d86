"""MolQA corpus preflight validator (data/validate.py)."""

import json

from llamole_tpu.data.validate import validate_molqa


def test_validate_shipped_examples():
    report = validate_molqa("data/molqa_train_examples.json")
    assert report["ok"]
    assert report["records"] == 5
    assert report["distinct_molecules"] >= 4
    assert report["unparseable_smiles"] == 0
    assert report["property_coverage"]["SA"] >= 1
    assert report["max_atoms"] > 0


def test_validate_flags_bad_records(tmp_path):
    records = [
        {"instruction": "q", "output": "no molecule here",
         "property": {"SA": 2.0}},
        {"instruction": "q",
         "output": ("ok <mol_start>C1CC<mol_end> broken ring. "
                    "The applied reaction is: <retro_start><retro_end>"
                    "CCO>>CC.O, which requires: CC"),
         "property": {"NOT_A_CHANNEL": 1.0},
         "retro": [1, 2]},   # one product, two labels
    ]
    path = tmp_path / "bad.json"
    path.write_text(json.dumps(records))
    report = validate_molqa(str(path))
    assert not report["ok"]
    assert report["records_without_molecule"] == 1
    assert report["unparseable_smiles"] == 1       # C1CC unclosed ring
    assert report["retro_label_mismatches"] == 1
    assert any("NOT_A_CHANNEL" in msg for msg in report["issues_sample"])


def test_validate_token_budget(tmp_path):
    class Tok:
        def encode(self, text):
            return list(range(len(text)))

    records = [{"instruction": "x" * 50,
                "output": "m <mol_start>CCO<mol_end>"}]
    path = tmp_path / "r.json"
    path.write_text(json.dumps(records))
    report = validate_molqa(str(path), cutoff_len=10, tokenizer=Tok())
    assert report["records_over_cutoff_len_approx"] == 1


def test_validate_survives_malformed_records(tmp_path):
    """Null fields, non-dict rows, and bad retro products count as
    issues — they must not abort the preflight (review findings)."""
    records = [
        "just a string",
        {"instruction": "q", "output": None},
        {"instruction": "q",
         "output": ("<mol_start>CCO<mol_end> fine, but the reaction "
                    "<retro_start><retro_end>NotASmiles$$>>CC needs "
                    "parsing"),
         "retro": [1]},
    ]
    path = tmp_path / "weird.json"
    path.write_text(json.dumps(records))
    report = validate_molqa(str(path))
    assert not report["ok"]
    assert report["malformed_records"] == 1        # the bare string
    assert report["records_without_molecule"] == 1  # null output -> empty
    assert report["unparseable_smiles"] >= 1       # the retro product
