"""Int8 / int4 weight-only quantization for LLM serving.

TPU-native analog of the reference's GPU quantization support
(model_utils/quantization.py:102-205 — bnb/gptq/awq configs): projection
weights stored as int8 (or int4) with f32 scales. The matmul runs
x @ w_q (upcast in the MXU) with the scale applied to the output, so
HBM traffic halves (int8) or quarters (int4) vs bf16 with no
dequantized temporary — decode is bandwidth-bound, which is where this
pays.

int8: per-output-channel scales. int4: group-wise scales along the
contraction dim (group_size rows share one scale per output channel, the
gptq/awq layout) — per-channel-only int4 over a 4k contraction loses too
much precision to max-abs outliers. The grouped matmul contracts each
group separately (batched dot_general) and folds the scale in AFTER the
per-group contraction, so the weight operand stays a pure int4->bf16
convert that XLA fuses into the HBM read exactly like the int8 path.

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


def _relabel_a8(leaf: Dict) -> Dict:
    """Mark an int8 leaf for W8A8 execution: the key name dispatches
    _proj to quantize activations per-token and run the matmul natively
    s8xs8->s32 on the MXU, so the weight operand streams from HBM with
    NO VPU convert (probe_int4.py on the v5e: 715 vs 557 Gparam/s for
    the convert-in-matmul weight-only path — decode is weight-read
    bound, so this is a ~1.28x decode step speedup)."""
    out = {"w_qa": leaf["w_q"], "scale": leaf["scale"]}
    if "b" in leaf:
        out["b"] = leaf["b"]
    return out


def _int4_groups(in_dim: int, group_size: int) -> int:
    """Number of scale groups along the contraction dim (1 = per-channel)."""
    if group_size and in_dim % group_size == 0 and in_dim > group_size:
        return in_dim // group_size
    return 1


def _quantize_leaf4(p: Dict, group_size: int = 128) -> Dict:
    """{"w" [in,out]} -> {"w_q4" int4 [in,out], "scale" f32 [G,out]}."""
    w = p["w"].astype(jnp.float32)
    in_dim, out_dim = w.shape
    g = _int4_groups(in_dim, group_size)
    wg = w.reshape(g, in_dim // g, out_dim)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=1) / 7.0, 1e-8)  # [G,out]
    w_q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
    out = {"w_q4": w_q.reshape(in_dim, out_dim).astype(jnp.int4),
           "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _quantize_leaf4_stacked(p: Dict, group_size: int = 128) -> Dict:
    """[L,in,out] -> {"w_q4" int4 [L,in,out], "scale" f32 [L,G,out]}."""
    w = p["w"].astype(jnp.float32)
    L, in_dim, out_dim = w.shape
    g = _int4_groups(in_dim, group_size)
    wg = w.reshape(L, g, in_dim // g, out_dim)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=2) / 7.0, 1e-8)  # [L,G,out]
    w_q = jnp.clip(jnp.round(wg / scale[:, :, None, :]), -7, 7)
    out = {"w_q4": w_q.reshape(L, in_dim, out_dim).astype(jnp.int4),
           "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_llm_params(params: Dict[str, Any], bits: int = 8,
                        group_size: int = 128,
                        act_int8: bool = False) -> Dict[str, Any]:
    """Quantize the dense transformer projections to int8 (bits=8,
    per-output-channel scales) or int4 (bits=4, group-wise scales along
    the contraction dim); returns a new tree. Handles both list and
    stacked (scan-over-layers) layouts. act_int8=True (bits=8 only)
    additionally quantizes ACTIVATIONS per-token at each projection
    (W8A8): both matmul operands run natively int8 on the MXU, removing
    the VPU weight-convert that caps weight-only decode (~1.28x decode
    HBM rate measured; slightly lossier than weight-only).

    MoE experts/router pass through UNQUANTIZED (the expert einsums
    consume raw [E, ...] arrays) — for MoE models that is most of the
    weights, so quantization gives little memory relief there; a warning
    is logged so quantization_bit is not silently a near-no-op."""
    if bits not in (4, 8):
        raise ValueError(f"quantization bits must be 4 or 8, got {bits}")
    if bits == 4:
        if act_int8:
            raise ValueError("act_int8 (W8A8) requires bits=8")
        leaf = lambda p: _quantize_leaf4(p, group_size)
        leaf_stacked = lambda p: _quantize_leaf4_stacked(p, group_size)
    elif act_int8:
        leaf = lambda p: _relabel_a8(_quantize_leaf(p))
        leaf_stacked = lambda p: _relabel_a8(_quantize_leaf_stacked(p))
    else:
        leaf, leaf_stacked = _quantize_leaf, _quantize_leaf_stacked
    first = (params["layers_stacked"] if "layers_stacked" in params
             else params["layers"][0])
    if "experts" in first["mlp"]:
        from ...utils.logging import get_logger
        get_logger(__name__).warning(
            "MoE experts/router are NOT quantized (only the dense "
            "attention projections are) — expect little memory savings")
    out = {
        "embed": params["embed"],
        "final_norm": params["final_norm"],
    }
    if "lm_head" in params:
        out["lm_head"] = leaf(params["lm_head"])
    if "layers_stacked" in params:
        ls = params["layers_stacked"]
        out["layers_stacked"] = {
            # carry every non-projection key through unquantized (norms,
            # incl. gemma2's post_attn_norm/post_mlp_norm sandwich)
            **{k: v for k, v in ls.items() if k not in ("attn", "mlp")},
            "attn": {name: leaf_stacked(ls["attn"][name])
                     for name in ("q", "k", "v", "o")},
            # MoE mlp (router/experts) stays in the compute dtype: the
            # expert einsums consume raw [E, ...] arrays, not {w} dicts
            "mlp": (ls["mlp"] if "experts" in ls["mlp"] else
                    {name: leaf_stacked(ls["mlp"][name])
                     for name in ("gate", "up", "down")}),
        }
        return out
    out["layers"] = []
    for layer in params["layers"]:
        out["layers"].append({
            **{k: v for k, v in layer.items() if k not in ("attn", "mlp")},
            "attn": {name: leaf(layer["attn"][name])
                     for name in ("q", "k", "v", "o")},
            "mlp": (layer["mlp"] if "experts" in layer["mlp"] else
                    {name: leaf(layer["mlp"][name])
                     for name in ("gate", "up", "down")}),
        })
    return out


def quantized_bytes(params: Dict[str, Any]) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
               if hasattr(x, "dtype"))


def init_params_quantized(key: jax.Array, cfg, dtype=jnp.bfloat16,
                          bits: int = 8, group_size: int = 128,
                          act_int8: bool = False) -> Dict[str, Any]:
    """Random-init directly INTO the int8/int4 stacked layout.

    At 8B scale the bf16 tree (~16 GB) cannot coexist with its quantized
    copy in 16 GB of HBM, so serving benchmarks materialize quantized
    weights without ever building the full-precision tree (reference
    analog: load_language_model with a bnb quant config, model_utils/
    quantization.py:102-205). Scales are drawn so dequantized weights
    match init_params' variance (std = in_dim**-0.5).
    """
    if bits not in (4, 8):
        raise ValueError(f"quantization bits must be 4 or 8, got {bits}")
    if act_int8 and bits != 8:
        # same contract as quantize_llm_params: a silent weight-only int4
        # tree labeled "w8a8" would mislabel the measurement
        raise ValueError("act_int8 (W8A8) requires bits=8")
    hd = cfg.head_dim_
    L = cfg.num_layers

    def qleaf(k, in_dim, out_dim, bias):
        if bits == 4:
            # int4 uniform in [-7,7] has std ~4.32
            g = _int4_groups(in_dim, group_size)
            w_q = jax.random.randint(k, (L, in_dim, out_dim), -7, 8,
                                     jnp.int8).astype(jnp.int4)
            scale = jnp.full((L, g, out_dim), (in_dim ** -0.5) / 4.32,
                             jnp.float32)
            out = {"w_q4": w_q, "scale": scale}
            if bias:
                out["b"] = jnp.zeros((L, out_dim), dtype)
            return out
        # int8 uniform in [-127,127] has std ~73.3; choose per-channel
        # scale so w_q * scale has std in_dim**-0.5
        w_q = jax.random.randint(k, (L, in_dim, out_dim), -127, 128, jnp.int8)
        scale = jnp.full((L, out_dim), (in_dim ** -0.5) / 73.3, jnp.float32)
        out = {"w_qa" if act_int8 else "w_q": w_q, "scale": scale}
        if bias:
            out["b"] = jnp.zeros((L, out_dim), dtype)
        return out

    ks = jax.random.split(key, 10)
    norm_one = (jnp.zeros if cfg.rms_norm_unit_offset else jnp.ones)
    params: Dict[str, Any] = {
        "embed": {"weight": (jax.random.normal(
            ks[0], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02)},
        "final_norm": {"scale": norm_one((cfg.hidden_size,), dtype)},
        "layers_stacked": {
            "input_norm": {"scale": norm_one((L, cfg.hidden_size), dtype)},
            "post_norm": {"scale": norm_one((L, cfg.hidden_size), dtype)},
            **({"post_attn_norm":
                    {"scale": norm_one((L, cfg.hidden_size), dtype)},
                "post_mlp_norm":
                    {"scale": norm_one((L, cfg.hidden_size), dtype)}}
               if cfg.sandwich_norms else {}),
            **({"q_norm": {"scale": jnp.ones((L, hd), dtype)},
                "k_norm": {"scale": jnp.ones((L, hd), dtype)}}
               if cfg.qk_norm else {}),
            "attn": {
                "q": qleaf(ks[1], cfg.hidden_size, cfg.num_heads * hd,
                           cfg.attention_bias),
                "k": qleaf(ks[2], cfg.hidden_size, cfg.num_kv_heads * hd,
                           cfg.attention_bias),
                "v": qleaf(ks[3], cfg.hidden_size, cfg.num_kv_heads * hd,
                           cfg.attention_bias),
                "o": qleaf(ks[4], cfg.num_heads * hd, cfg.hidden_size, False),
            },
            "mlp": {
                "gate": qleaf(ks[5], cfg.hidden_size, cfg.intermediate_size,
                              False),
                "up": qleaf(ks[6], cfg.hidden_size, cfg.intermediate_size,
                            False),
                "down": qleaf(ks[7], cfg.intermediate_size, cfg.hidden_size,
                              False),
            },
        },
    }
    if not cfg.tie_word_embeddings:
        if bits == 4:
            g = _int4_groups(cfg.hidden_size, group_size)
            params["lm_head"] = {
                "w_q4": jax.random.randint(
                    ks[8], (cfg.hidden_size, cfg.vocab_size), -7, 8,
                    jnp.int8).astype(jnp.int4),
                "scale": jnp.full((g, cfg.vocab_size),
                                  (cfg.hidden_size ** -0.5) / 4.32,
                                  jnp.float32)}
        else:
            w_q = jax.random.randint(
                ks[8], (cfg.hidden_size, cfg.vocab_size), -127, 128, jnp.int8)
            scale = jnp.full((cfg.vocab_size,),
                             (cfg.hidden_size ** -0.5) / 73.3, jnp.float32)
            params["lm_head"] = {"w_qa" if act_int8 else "w_q": w_q,
                                 "scale": scale}
    return params
