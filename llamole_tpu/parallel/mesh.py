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


def create_mesh(dp: int = 1, tp: int = 1, sp: int = 1, pp: int = 1,
                ep: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """dp x tp mesh; sp > 1 adds a sequence/context-parallel axis for
    ring attention (ops/ring_attention.py); pp > 1 adds a pipeline axis
    for the GPipe layer-stack schedule (parallel/pipeline.py); ep > 1
    adds an expert-parallel axis for MoE layers (gllm _moe_mlp +
    llm_param_pspecs ep_axis)."""
    devices = list(devices if devices is not None else jax.devices())
    need = dp * tp * sp * pp * ep
    if len(devices) < need:
        raise ValueError(f"mesh dp={dp} tp={tp} sp={sp} pp={pp} ep={ep} "
                         f"needs {need} devices, have {len(devices)}")
    # axis order: pp outermost (stage hops are the rarest, once per
    # microbatch tick), then dp, ep, sp, tp innermost (highest-traffic
    # collectives ride the fastest ICI neighbors). dp/tp axes always
    # exist (existing pspecs reference them); sp/pp/ep only when > 1.
    shape = [("pp", pp), ("dp", dp), ("ep", ep), ("sp", sp), ("tp", tp)]
    kept = [(n, d) for n, d in shape
            if d > 1 or n in ("dp", "tp")]
    grid = np.asarray(devices[:need]).reshape([d for _, d in kept])
    return Mesh(grid, axis_names=tuple(n for n, _ in kept))


def mesh_from_string(spec: str, devices: Optional[Sequence] = None) -> Mesh:
    """Parse 'dp:2,tp:4', 'dp:2,sp:2,tp:2', 'pp:2,dp:4', ...
    (TrainingArguments.mesh). Empty => 1x1 mesh."""
    dims = {"dp": 1, "tp": 1, "sp": 1, "pp": 1, "ep": 1}
    if spec:
        for part in spec.split(","):
            name, _, num = part.partition(":")
            name = name.strip()
            if name not in dims:
                raise ValueError(f"unknown mesh axis {name!r}")
            dims[name] = int(num)
    return create_mesh(dims["dp"], dims["tp"], dims["sp"], dims["pp"],
                       dims["ep"], devices)
