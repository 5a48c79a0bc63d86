"""Int8 weight-only quantization for LLM serving.

TPU-native analog of the reference's GPU quantization support
(model_utils/quantization.py:102-205 — bnb/gptq/awq configs): projection
weights stored as int8 with per-output-channel f32 scales. The matmul
runs x @ w_int8 (upcast in the MXU) with the scale applied to the
output, so HBM traffic halves vs bf16 with no dequantized temporary —
decode is bandwidth-bound, which is where this pays.

Embeddings and norms stay in the compute dtype (gathers + tiny tensors).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _quantize_leaf(p: Dict) -> Dict:
    w = p["w"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0  # per output channel
    scale = jnp.maximum(scale, 1e-8)
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


_PROJ_NAMES = ("q", "k", "v", "o", "gate", "up", "down")


def _quantize_leaf_stacked(p: Dict) -> Dict:
    """Per-layer per-output-channel scales for stacked [L, in, out]."""
    w = p["w"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=1) / 127.0  # [L, out]
    scale = jnp.maximum(scale, 1e-8)
    w_q = jnp.clip(jnp.round(w / scale[:, None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_llm_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize all transformer projections to int8; returns a new tree.
    Handles both list and stacked (scan-over-layers) layouts."""
    out = {
        "embed": params["embed"],
        "final_norm": params["final_norm"],
    }
    if "lm_head" in params:
        out["lm_head"] = _quantize_leaf(params["lm_head"])
    if "layers_stacked" in params:
        ls = params["layers_stacked"]
        out["layers_stacked"] = {
            "input_norm": ls["input_norm"],
            "post_norm": ls["post_norm"],
            "attn": {name: _quantize_leaf_stacked(ls["attn"][name])
                     for name in ("q", "k", "v", "o")},
            "mlp": {name: _quantize_leaf_stacked(ls["mlp"][name])
                    for name in ("gate", "up", "down")},
        }
        return out
    out["layers"] = []
    for layer in params["layers"]:
        out["layers"].append({
            "input_norm": layer["input_norm"],
            "post_norm": layer["post_norm"],
            "attn": {name: _quantize_leaf(layer["attn"][name])
                     for name in ("q", "k", "v", "o")},
            "mlp": {name: _quantize_leaf(layer["mlp"][name])
                    for name in ("gate", "up", "down")},
        })
    return out


def quantized_bytes(params: Dict[str, Any]) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
               if hasattr(x, "dtype"))
