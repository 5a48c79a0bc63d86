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


def create_mesh(dp: int = 1, tp: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = dp * tp
    if len(devices) < need:
        raise ValueError(f"mesh dp={dp} tp={tp} needs {need} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def mesh_from_string(spec: str, devices: Optional[Sequence] = None) -> Mesh:
    """Parse 'dp:2,tp:4' (TrainingArguments.mesh). Empty => 1x1 mesh."""
    dp, tp = 1, 1
    if spec:
        for part in spec.split(","):
            name, _, num = part.partition(":")
            if name.strip() == "dp":
                dp = int(num)
            elif name.strip() == "tp":
                tp = int(num)
            else:
                raise ValueError(f"unknown mesh axis {name!r}")
    return create_mesh(dp, tp, devices)
