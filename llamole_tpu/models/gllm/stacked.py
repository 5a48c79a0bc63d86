"""Stacked-layer parameter layout + scan-over-layers forward support.

With list-of-layers storage XLA compiles every transformer layer as a
separate program region — at 8B/32-layer scale that multiplies compile
time ~depth-fold. Stacked storage keeps one [L, ...] array per weight
and the forward lax.scans over the leading axis, compiling the layer
body once.

Helpers here convert between the two layouts (list storage stays the
interchange format for converters/checkpoints); `forward` consumes the
stacked layout when cfg.scan_layers is set.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp


def stack_layers(params: Dict[str, Any]) -> Dict[str, Any]:
    """List-of-layers -> stacked [L, ...] leaves (new tree; shares no
    buffers with the input lists beyond jnp.stack copies)."""
    out = {k: v for k, v in params.items() if k != "layers"}
    layers = params["layers"]
    out["layers_stacked"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return out


def unstack_layers(params: Dict[str, Any]) -> Dict[str, Any]:
    out = {k: v for k, v in params.items() if k != "layers_stacked"}
    stacked = params["layers_stacked"]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    out["layers"] = [jax.tree.map(lambda x: x[i], stacked)
                     for i in range(depth)]
    return out


def is_stacked(params: Dict[str, Any]) -> bool:
    return "layers_stacked" in params
