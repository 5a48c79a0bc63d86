"""LoRA as a parameter-tree overlay.

The reference wires LoRA through peft (src/model/adapter.py:149-268,
lora_target "all" = every linear). Here an adapter is just a second
pytree shaped like {"layers": [{"attn": {q,k,v,o}, "mlp": {gate,up,down}}]}
whose leaves are {"a": [in, r], "b": [r, out]}; forward applies
y += (x @ a) @ b * (alpha / r) inside every projection (model.py _proj).

Only these leaves are trainable during mmsft — the optimizer masks the
base params out, which is the functional analog of requires_grad=False.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .config import LLMConfig

TARGET_ALL = ("q", "k", "v", "o", "gate", "up", "down")


def init_lora(
    key: jax.Array,
    cfg: LLMConfig,
    rank: int = 8,
    targets=TARGET_ALL,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """A ~ N(0, 1/r) (kaiming-ish), B = 0 => adapter starts as identity."""
    hd = cfg.head_dim_
    dims = {
        "q": (cfg.hidden_size, cfg.num_heads * hd),
        "k": (cfg.hidden_size, cfg.num_kv_heads * hd),
        "v": (cfg.hidden_size, cfg.num_kv_heads * hd),
        "o": (cfg.num_heads * hd, cfg.hidden_size),
        "gate": (cfg.hidden_size, cfg.intermediate_size),
        "up": (cfg.hidden_size, cfg.intermediate_size),
        "down": (cfg.intermediate_size, cfg.hidden_size),
    }
    layers = []
    for i in range(cfg.num_layers):
        layer = {"attn": {}, "mlp": {}}
        for name in targets:
            key, sub = jax.random.split(key)
            d_in, d_out = dims[name]
            leaf = {
                "a": (jax.random.normal(sub, (d_in, rank), jnp.float32)
                      * (1.0 / rank)).astype(dtype),
                "b": jnp.zeros((rank, d_out), dtype),
            }
            group = "attn" if name in ("q", "k", "v", "o") else "mlp"
            layer[group][name] = leaf
        layers.append(layer)
    return {"layers": layers}


def lora_scale(rank: int, alpha: Optional[int] = None) -> float:
    return (alpha if alpha is not None else 2 * rank) / rank


def merge_lora(params: Dict, lora: Dict, scale: float) -> Dict:
    """Fold the adapter into base weights (export path; parity:
    adapter.py:190-195 merge_and_unload / tuner.py:40 merge_adapter).
    Accepts list or stacked layouts (restacks on the way out)."""
    from .stacked import is_stacked, stack_layers, unstack_layers

    restack = is_stacked(params)
    if restack:
        params = unstack_layers(params)
    if is_stacked(lora):
        lora = unstack_layers(lora)
    merged = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    for i, layer in enumerate(lora["layers"]):
        for group in ("attn", "mlp"):
            for name, leaf in layer.get(group, {}).items():
                base = merged["layers"][i][group if group != "attn" else "attn"][name]
                delta = (leaf["a"].astype(jnp.float32)
                         @ leaf["b"].astype(jnp.float32)) * scale
                base["w"] = (base["w"].astype(jnp.float32) + delta).astype(
                    base["w"].dtype)
    return stack_layers(merged) if restack else merged


def lora_pspecs(lora: Dict, tp_axis: str = "tp") -> Dict:
    """PartitionSpecs for the adapter: B sharded like the base out-dim on
    column-parallel projections; A replicated (rank is tiny)."""
    from jax.sharding import PartitionSpec as P

    def spec_for(path, leaf):
        name = path[-2].key if hasattr(path[-2], "key") else str(path[-2])
        which = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        col_parallel = name in ("q", "k", "v", "gate", "up")
        if which == "b" and col_parallel:
            return P(None, tp_axis)
        if which == "a" and not col_parallel:
            return P(tp_axis, None)
        return P(None, None)

    return jax.tree_util.tree_map_with_path(spec_for, lora)
