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
    if cfg.num_experts > 0:
        # MoE configs have no dense mlp projections — adapters on
        # gate/up/down would be silently inert (decoder_layer's MoE
        # branch never reads ll['mlp']); restrict to attention targets
        filtered = tuple(t for t in targets if t in ("q", "k", "v", "o"))
        if not filtered:
            raise ValueError(
                f"LoRA targets {tuple(targets)} are all MLP projections, "
                "but MoE configs route tokens through expert weights with "
                "no dense gate/up/down — the adapter would be empty and "
                "fine-tuning a silent no-op. Target attention projections "
                "(q/k/v/o) for MoE models.")
        targets = filtered
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


def lora_scale(rank: int, alpha: Optional[int] = None,
               use_rslora: bool = False) -> float:
    """alpha/r, or alpha/sqrt(r) for rsLoRA (arXiv 2312.03732; reference
    finetuning_args.use_rslora, adapter.py:240)."""
    a = alpha if alpha is not None else 2 * rank
    return a / (rank ** 0.5) if use_rslora else a / rank


def pissa_to_lora(adapter: Dict, init_adapter: Dict) -> Dict:
    """Convert a PiSSA-trained adapter into a standard rank-2r LoRA over
    the ORIGINAL weights (peft convert_pissa_to_lora semantics):

        W_res + s*A_t B_t = W_orig + s*(A_t B_t - A_0 B_0)
                          = W_orig + s*[A_t | A_0] @ [B_t ; -B_0]

    so saved PiSSA adapters load against unmodified base checkpoints —
    the in-memory residual base is never persisted."""
    from .stacked import is_stacked, stack_layers, unstack_layers

    restack = is_stacked(adapter)
    a_l = unstack_layers(adapter) if restack else adapter
    i_l = unstack_layers(init_adapter) if is_stacked(init_adapter) else init_adapter
    out = {"layers": []}
    for layer, layer0 in zip(a_l["layers"], i_l["layers"]):
        new_layer: Dict = {}
        for group in ("attn", "mlp"):
            new_layer[group] = {}
            for name, leaf in layer.get(group, {}).items():
                leaf0 = layer0[group][name]
                merged = {
                    "a": jnp.concatenate([leaf["a"], leaf0["a"]], axis=1),
                    "b": jnp.concatenate([leaf["b"], -leaf0["b"]], axis=0),
                }
                if "m" in leaf:
                    merged["m"] = leaf["m"]
                new_layer[group][name] = merged
        out["layers"].append(new_layer)
    return stack_layers(out) if restack else out


def pissa_init(params: Dict, lora: Dict, scale: float) -> tuple:
    """PiSSA initialization (arXiv 2404.02948; reference adapter.py:248-254
    init_lora_weights='pissa'): the adapter starts as the principal
    rank-r component of each frozen weight (A = U_r sqrt(S_r),
    B = sqrt(S_r) V_r^T) and the frozen weight is replaced by the
    residual W - scale*A@B, so the composite is numerically unchanged at
    init but training moves the principal directions.

    Returns (residual_params, pissa_lora). Requires full-precision
    weights (not int8) in the list layout; stacked params are unstacked
    and restacked."""
    from .stacked import is_stacked, stack_layers, unstack_layers

    restack = is_stacked(params)
    if restack:
        params = unstack_layers(params)
    if is_stacked(lora):
        lora = unstack_layers(lora)
    residual = jax.tree.map(lambda x: x, params)
    new_lora = jax.tree.map(lambda x: x, lora)
    for i, layer in enumerate(new_lora["layers"]):
        for group in ("attn", "mlp"):
            for name, leaf in layer.get(group, {}).items():
                base = residual["layers"][i][group][name]
                if "w" not in base:
                    raise ValueError("PiSSA needs full-precision weights "
                                     "(quantize AFTER pissa_init)")
                w = base["w"].astype(jnp.float32)
                r = leaf["a"].shape[1]
                u, s, vt = jnp.linalg.svd(w, full_matrices=False)
                root_s = jnp.sqrt(s[:r])
                a = (u[:, :r] * root_s[None, :])
                b = (root_s[:, None] * vt[:r, :])
                leaf["a"] = (a / (scale ** 0.5)).astype(leaf["a"].dtype)
                leaf["b"] = (b / (scale ** 0.5)).astype(leaf["b"].dtype)
                base["w"] = (w - a @ b).astype(base["w"].dtype)
    if restack:
        residual = stack_layers(residual)
        new_lora = stack_layers(new_lora)
    return residual, new_lora


def dora_init(params: Dict, lora: Dict, scale: float = 0.0) -> Dict:
    """Add DoRA magnitude vectors (arXiv 2402.09353; reference
    adapter.py:241 use_dora): m initialized to the column norms of the
    EFFECTIVE weight W + scale*A@B so the adapter starts as an identity
    even when A@B is non-zero (PiSSA-initialized adapters); forward
    rescales the merged direction per column (model.py _proj). Returns
    the lora tree with 'm' leaves, stacked iff `params` is stacked (the
    layout forward keys its adapter lookup on)."""
    from .stacked import is_stacked, stack_layers, unstack_layers

    restack = is_stacked(params)
    lora_l = unstack_layers(lora) if is_stacked(lora) else lora
    params_l = unstack_layers(params) if restack else params
    out = jax.tree.map(lambda x: x, lora_l)
    for i, layer in enumerate(out["layers"]):
        for group in ("attn", "mlp"):
            for name, leaf in layer.get(group, {}).items():
                base = params_l["layers"][i][group][name]
                if "w" not in base:
                    raise ValueError("DoRA needs full-precision weights")
                w_eff = base["w"].astype(jnp.float32)
                if scale:
                    w_eff = w_eff + (leaf["a"].astype(jnp.float32)
                                     @ leaf["b"].astype(jnp.float32)) * scale
                norm = jnp.linalg.norm(w_eff, axis=0)
                leaf["m"] = norm.astype(leaf["a"].dtype)
    return stack_layers(out) if restack else out


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
                w = base["w"].astype(jnp.float32) + delta
                if "m" in leaf:
                    # DoRA: the deployed weight is the magnitude-scaled
                    # direction (peft merge semantics)
                    w = w * (leaf["m"].astype(jnp.float32)
                             / (jnp.linalg.norm(w, axis=0) + 1e-6))[None, :]
                base["w"] = w.astype(base["w"].dtype)
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
