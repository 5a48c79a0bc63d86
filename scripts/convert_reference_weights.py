"""CLI shim over llamole_tpu.models.refconvert — convert the reference's
pretrained torch checkpoints to llamole_tpu param trees.

Usage:
  python scripts/convert_reference_weights.py graphdit  <src_dir> <dst_dir>
  python scripts/convert_reference_weights.py encoder   <src_dir> <dst_dir>
  python scripts/convert_reference_weights.py predictor <src_dir> <dst_dir>
  python scripts/convert_reference_weights.py connectors <src_dir> <dst_dir>

The converters themselves live in the installed package (so the
one-command `llamole parity` pipeline can run without the repo checkout);
see llamole_tpu/models/refconvert.py for the layout documentation.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llamole_tpu.models.refconvert import (  # noqa: E402,F401
    _lin,
    _ln,
    _load_torch,
    convert_connectors,
    convert_encoder,
    convert_graphdit,
    convert_predictor,
)

if __name__ == "__main__":
    if len(sys.argv) != 4:
        raise SystemExit(__doc__)
    kind, src, dst = sys.argv[1:]
    {"graphdit": convert_graphdit, "encoder": convert_encoder,
     "predictor": convert_predictor, "connectors": convert_connectors}[kind](src, dst)
