"""Build a GraphDiT data.meta.json from a MolQA corpus.

The reference ships this file with its HF weights (diffusion_utils.py:30
DataInfos contract); this computes an equivalent from raw data so the
framework can train GraphDiT-compatible models stand-alone.

Usage:
  python scripts/build_data_meta.py data/molqa_train_examples.json saves/graph_decoder
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llamole_tpu.data.aligner import extract_all_smiles  # noqa: E402
from llamole_tpu.models.graphdit.config import build_data_info_from_smiles  # noqa: E402


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        records = json.load(f)
    smiles = set()
    for rec in records:
        out = rec.get("output", "")
        smiles.update(extract_all_smiles(out))
        for m in re.findall(r"<retro_end>(.*?)>>(.*?)(?:,|\.|$)", out):
            smiles.add(m[0].strip())
            smiles.update(s.strip() for s in m[1].split("."))
    smiles = {s for s in smiles if s}
    info = build_data_info_from_smiles(sorted(smiles))
    os.makedirs(dst, exist_ok=True)
    info.save(dst)
    print(f"data.meta.json written to {dst} "
          f"({len(smiles)} molecules, {len(info.active_atoms)} atom types, "
          f"max {info.max_n_nodes} nodes)")


if __name__ == "__main__":
    main()
