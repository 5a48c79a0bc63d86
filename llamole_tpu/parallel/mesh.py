"""Device mesh bootstrap.

The reference's distributed story is NCCL-under-HF-Trainer (SURVEY.md
§2.2); the TPU-native equivalent is a jax.sharding.Mesh with named axes:

  dp — data parallel (batch dimension)
  tp — tensor parallel over ICI (attention heads / MLP intermediate)

Graph modules are small and stay replicated; the LLM shards over tp.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(dp: int = 1, tp: int = 1, sp: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """dp x tp mesh; sp > 1 adds a sequence/context-parallel axis for
    ring attention (ops/ring_attention.py)."""
    devices = list(devices if devices is not None else jax.devices())
    need = dp * tp * sp
    if len(devices) < need:
        raise ValueError(f"mesh dp={dp} tp={tp} sp={sp} needs {need} "
                         f"devices, have {len(devices)}")
    if sp > 1:
        grid = np.asarray(devices[:need]).reshape(dp, sp, tp)
        return Mesh(grid, axis_names=("dp", "sp", "tp"))
    grid = np.asarray(devices[:need]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def mesh_from_string(spec: str, devices: Optional[Sequence] = None) -> Mesh:
    """Parse 'dp:2,tp:4' or 'dp:2,sp:2,tp:2' (TrainingArguments.mesh).
    Empty => 1x1 mesh."""
    dims = {"dp": 1, "tp": 1, "sp": 1}
    if spec:
        for part in spec.split(","):
            name, _, num = part.partition(":")
            name = name.strip()
            if name not in dims:
                raise ValueError(f"unknown mesh axis {name!r}")
            dims[name] = int(num)
    return create_mesh(dims["dp"], dims["tp"], dims["sp"], devices)
