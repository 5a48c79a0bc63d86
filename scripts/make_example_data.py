"""Generate the repo's own synthetic MolQA-format example data.

Format parity with the reference's data/molqa_*_examples.json fixtures
(records: instruction / input / output with <design_*>/<mol_*>/<retro_*>
markers / property / retro label list) — content is synthetic so the
repo carries no copied data."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MOLS = [
    # (target, reactant-sets, properties)
    ("CC(=O)Oc1ccccc1C(=O)O",
     [("CC(=O)Oc1ccccc1C(=O)O>>CC(=O)O.Oc1ccccc1C(=O)O",
       ["CC(=O)O", "Oc1ccccc1C(=O)O"], 101)],
     {"BBBP": 1.0, "SC": 2.1, "SA": 1.8}),
    ("CCOC(=O)c1ccc(N)cc1",
     [("CCOC(=O)c1ccc(N)cc1>>CCO.O=C(O)c1ccc(N)cc1",
       ["CCO", "O=C(O)c1ccc(N)cc1"], 57),
      ("O=C(O)c1ccc(N)cc1>>O=C(O)c1ccc([N+](=O)[O-])cc1",
       ["O=C(O)c1ccc([N+](=O)[O-])cc1"], 212)],
     {"HIV": 0.0, "SC": 2.8, "SA": 2.2}),
    ("CC(C)Cc1ccc(C(C)C(=O)O)cc1",
     [("CC(C)Cc1ccc(C(C)C(=O)O)cc1>>CC(C)Cc1ccc(C(C)C#N)cc1.O",
       ["CC(C)Cc1ccc(C(C)C#N)cc1", "O"], 33)],
     {"BBBP": 1.0, "BACE": 0.0, "SC": 3.2, "SA": 2.4}),
    ("*CC(*)c1ccccc1",
     [],
     {"CO2": 2.3, "N2": 1.1, "O2": 1.9, "FFV": 0.37, "SC": 1.5, "SA": 1.2}),
    ("Nc1ccc(O)cc1",
     [("Nc1ccc(O)cc1>>O=[N+]([O-])c1ccc(O)cc1",
       ["O=[N+]([O-])c1ccc(O)cc1"], 212)],
     {"HIV": 1.0, "SC": 1.2, "SA": 1.3}),
]


def record_for(target, steps, props):
    out = [
        "To satisfy the requirements: the designed molecule balances the "
        "requested properties. Therefore, the designed molecule is: "
        f"<design_start><design_end><mol_start>{target}<mol_end>."
    ]
    labels = []
    for i, (rxn, reactants, label) in enumerate(steps, start=1):
        product = rxn.split(">>")[0]
        avail = ", ".join(f"{r} (available)" for r in reactants)
        out.append(
            f" This is step {i} in the retrosynthesis process. To synthesize "
            f"<mol_start>{product}<mol_end>, follow these procedures: "
            f"standard conditions apply for step {i}. The applied reaction "
            f"is: <retro_start><retro_end>{rxn}, which requires the "
            f"reactants: {avail}.")
        labels.append(label)
    return {
        "instruction": (
            "Can you design a molecule with the requested property profile "
            "and describe its synthesis?"),
        "input": "",
        "output": "".join(out),
        "property": props,
        "retro": labels,
    }


def main():
    here = os.path.join(os.path.dirname(__file__), "..", "data")
    os.makedirs(here, exist_ok=True)
    records = [record_for(*m) for m in MOLS]
    drug = [r for r in records if "CO2" not in json.dumps(r)]
    material = [records[3]]
    with open(os.path.join(here, "molqa_train_examples.json"), "w") as f:
        json.dump(records, f, indent=1)
    with open(os.path.join(here, "molqa_drug_examples.json"), "w") as f:
        json.dump(drug, f, indent=1)
    with open(os.path.join(here, "molqa_material_examples.json"), "w") as f:
        json.dump(material, f, indent=1)
    info = {name: {"file_name": f"{name}.json"} for name in [
        "molqa_train_examples", "molqa_drug_examples",
        "molqa_material_examples", "molqa_train", "molqa_drug",
        "molqa_material"]}
    with open(os.path.join(here, "dataset_info.json"), "w") as f:
        json.dump(info, f, indent=2)
    ranges = {
        "BBBP": [0, 1], "HIV": [0, 1], "BACE": [0, 1],
        "CO2": [0.94, 1019], "N2": [0, 73], "O2": [0, 122],
        "FFV": [0.32, 0.43], "TC": [0.12, 0.34],
        "SC": [1.0, 5.0], "SA": [1.0, 10.0],
    }
    with open(os.path.join(here, "property_ranges.json"), "w") as f:
        json.dump(ranges, f, indent=2)
    print("wrote example data to", os.path.abspath(here))


if __name__ == "__main__":
    main()
