"""Parameter partition specs (megatron-style TP via GSPMD).

Column-parallel: q/k/v/gate/up (shard output dim on tp).
Row-parallel:    o/down        (shard input dim on tp).
Embedding + lm_head: shard vocab dim.
Everything else (norms, small graph modules): replicated.

XLA inserts the all-reduces at row-parallel outputs — no hand-written
collectives needed (scaling-book recipe: annotate, jit, let GSPMD work).
"""

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def llm_param_pspecs(params: Dict[str, Any], tp_axis: str = "tp",
                     ep_axis: str = None) -> Dict[str, Any]:
    """Pytree of PartitionSpec matching gllm.model.init_params output.

    With ep_axis set, MoE expert weights ([(L,) E, d_in, d_out]) shard
    their expert dim over it (expert parallelism); the router and all
    dense leaves follow the usual tp rules."""

    def spec_for(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        stacked = "layers_stacked" in keys  # [L, ...] leading depth axis
        if "experts" in keys:
            if ep_axis is None:
                return P()
            spec = [None] * leaf.ndim
            spec[1 if stacked else 0] = ep_axis
            return P(*spec)
        if "router" in keys:
            return P()
        base_ndim = leaf.ndim - (1 if stacked else 0)
        if base_ndim <= 1:
            return P()  # norms, biases: replicated (bias of col-parallel
                        # projections is tiny; replication cost is nil)
        if "embed" in keys:
            return P(tp_axis, None)        # vocab-sharded embedding
        if "lm_head" in keys:
            return P(None, tp_axis)
        name = keys[-2] if len(keys) >= 2 else ""
        if name in ("q", "k", "v", "gate", "up"):
            spec = (None, tp_axis)         # column parallel
        elif name in ("o", "down"):
            spec = (tp_axis, None)         # row parallel
        else:
            return P()
        return P(None, *spec) if stacked else P(*spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def zero1_opt_pspecs(opt_state: Any, dp: int, axis: str = "dp") -> Any:
    """ZeRO-1 analog: partition specs that shard optimizer-state moments
    (and grad-accumulation buffers) along the dp axis.

    Each array leaf is sharded on its largest dp-divisible dimension;
    scalars and indivisible leaves stay replicated. With these specs on
    the Adam m/v pytrees plus a replicated constraint on the updated
    params, GSPMD lowers the update to reduce-scatter + shard-local adam
    + all-gather — the DeepSpeed ZeRO stage-1 dataflow the reference
    plumbs via hparams/parser.py:188-221, expressed as shardings.
    """

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        if not shape:
            return P()
        dims = [(d, i) for i, d in enumerate(shape) if d % dp == 0 and d >= dp]
        if not dims:
            return P()
        _, best = max(dims)
        spec = [None] * len(shape)
        spec[best] = axis
        return P(*spec)

    return jax.tree.map(spec_for, opt_state)


def fsdp_param_pspecs(params: Dict[str, Any], dp: int, dp_axis: str = "dp",
                      tp_axis: str = None, ep_axis: str = None) -> Any:
    """ZeRO-3 / FSDP analog: shard PARAMETER storage along dp.

    Each >=2D leaf gets dp on its largest dp-divisible dimension that is
    not already taken by tp/ep (specs compose with llm_param_pspecs when
    tp_axis is given); 1D/scalar leaves replicate (norm scales are tiny
    — the all-gather saved is not worth the spec complexity). At use
    time GSPMD inserts the per-layer all-gather (and re-gathers under
    remat in the backward pass) — the DeepSpeed ZeRO stage-3 dataflow
    the reference plumbs via hparams/parser.py:188-196 + ds_z3 configs,
    expressed as shardings. With scan-over-layers stacked storage the
    gather happens per scan step, i.e. layer by layer, so peak live
    memory is one layer's full weights + the sharded rest.
    """
    base = (llm_param_pspecs(params, tp_axis=tp_axis, ep_axis=ep_axis)
            if tp_axis or ep_axis
            else jax.tree.map(lambda _: P(), params))

    def compose(leaf, spec):
        shape = getattr(leaf, "shape", ())
        if len(shape) < 2:
            return spec
        # pad the base spec out to the leaf's rank (P(...) may be short)
        new = list(spec) + [None] * (len(shape) - len(spec))
        cands = [(d, i) for i, d in enumerate(shape)
                 if new[i] is None and d % dp == 0 and d >= dp]
        if not cands:
            return spec
        _, best = max(cands)
        new[best] = dp_axis
        return P(*new)

    return jax.tree.map(compose, params, base)


def shard_params(params: Dict, mesh: Mesh, pspecs: Dict) -> Dict:
    """Place a host pytree onto the mesh with the given specs."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, pspecs)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
