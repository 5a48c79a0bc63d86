"""Device mesh bootstrap.

The reference's distributed story is NCCL-under-HF-Trainer (SURVEY.md
§2.2); the TPU-native equivalent is a jax.sharding.Mesh with named axes:

  dcn — outer data parallel ACROSS slices/pods (gradient all-reduce is
        the only traffic that crosses the data-center network)
  dp  — data parallel (batch dimension) within a slice
  tp  — tensor parallel over ICI (attention heads / MLP intermediate)

Graph modules are small and stay replicated; the LLM shards over tp.
Axis layout follows the scaling-book recipe: the highest-traffic
collectives (tp) ride the innermost/fastest ICI neighbors, and only the
once-per-step dcn gradient reduction leaves the slice.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def _dcn_grouped(devices: Sequence, dcn: int, per_group: int):
    """Order devices so each consecutive `per_group` block (one dcn
    group) stays inside ONE slice (multi-slice hardware exposes
    device.slice_index) — otherwise tp/dp collectives would silently
    cross the data-center network. Falls back to the contiguous order
    when the topology can't honor that (virtual/test devices carry no
    slice ids; uneven per-slice counts can't align blocks)."""
    slice_ids = [getattr(d, "slice_index", None) for d in devices]
    if any(s is None for s in slice_ids) or len(set(slice_ids)) < dcn:
        return list(devices)
    by_slice = {}
    for d in devices:
        by_slice.setdefault(d.slice_index, []).append(d)
    ordered = []
    for _, ds in sorted(by_slice.items()):
        ordered.extend(ds)
    # verify the alignment actually holds for the devices the mesh will
    # use: every per_group block must sit inside exactly one slice
    used = ordered[:dcn * per_group]
    if len(used) < dcn * per_group:
        return list(devices)
    for g in range(dcn):
        block = used[g * per_group:(g + 1) * per_group]
        if len({d.slice_index for d in block}) != 1:
            return list(devices)
    return ordered


def create_mesh(dp: int = 1, tp: int = 1, sp: int = 1, pp: int = 1,
                ep: int = 1, dcn: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """dp x tp mesh; sp > 1 adds a sequence/context-parallel axis for
    ring attention (ops/ring_attention.py); pp > 1 adds a pipeline axis
    for the GPipe layer-stack schedule (parallel/pipeline.py); ep > 1
    adds an expert-parallel axis for MoE layers (gllm _moe_mlp +
    llm_param_pspecs ep_axis); dcn > 1 adds an OUTER data-parallel axis
    mapped across slices (multi-slice / multi-pod scale-out — batch
    shards over ('dcn', 'dp'), see Trainer._place_batch)."""
    devices = list(devices if devices is not None else jax.devices())
    need = dp * tp * sp * pp * ep * dcn
    if len(devices) < need:
        raise ValueError(f"mesh dcn={dcn} dp={dp} tp={tp} sp={sp} pp={pp} "
                         f"ep={ep} needs {need} devices, have {len(devices)}")
    # axis order: dcn outermost (cross-slice traffic is once per step),
    # then pp (stage hops are the rarest ICI traffic, once per
    # microbatch tick), then dp, ep, sp, tp innermost (highest-traffic
    # collectives ride the fastest ICI neighbors). dp/tp axes always
    # exist (existing pspecs reference them); dcn/sp/pp/ep only when > 1.
    if dcn > 1:
        devices = _dcn_grouped(devices, dcn, need // dcn)
    shape = [("dcn", dcn), ("pp", pp), ("dp", dp), ("ep", ep),
             ("sp", sp), ("tp", tp)]
    kept = [(n, d) for n, d in shape
            if d > 1 or n in ("dp", "tp")]
    grid = np.asarray(devices[:need]).reshape([d for _, d in kept])
    return Mesh(grid, axis_names=tuple(n for n, _ in kept))


def mesh_from_string(spec: str, devices: Optional[Sequence] = None) -> Mesh:
    """Parse 'dp:2,tp:4', 'dp:2,sp:2,tp:2', 'pp:2,dp:4', 'dcn:2,dp:4',
    ... (TrainingArguments.mesh). Empty => 1x1 mesh."""
    dims = {"dp": 1, "tp": 1, "sp": 1, "pp": 1, "ep": 1, "dcn": 1}
    if spec:
        for part in spec.split(","):
            name, _, num = part.partition(":")
            name = name.strip()
            if name not in dims:
                raise ValueError(f"unknown mesh axis {name!r}")
            dims[name] = int(num)
    return create_mesh(dims["dp"], dims["tp"], dims["sp"], dims["pp"],
                       dims["ep"], dims["dcn"], devices)
