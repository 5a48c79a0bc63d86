"""Small functional NN building blocks over param pytrees.

Conventions:
  - params are nested dicts of jnp arrays
  - every init takes an explicit PRNG key and returns a dict
  - Linear weights are stored as [in, out] so application is x @ w
  - initializers mirror the reference models' torch inits
    (xavier_uniform for Linear, zeros bias — transformer.py:66-80)
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def dense_init(key, in_dim: int, out_dim: int, bias: bool = True,
               init=xavier_uniform, dtype=jnp.float32):
    p = {"w": init(key, (in_dim, out_dim), dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def dense(params, x):
    if "w_q" in params:
        return _dense_int8(params, x)
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def _dense_int8(params, x):
    """int8 x int8 matmul on the MXU (v5e: 2x the bf16 rate).

    Weights are pre-quantized per output channel ({"w_q" int8, "scale"
    f32[out]}, quantize_dense below); activations quantize dynamically
    per row (symmetric max-abs). The int32 accumulator rescales by
    row_scale x col_scale. Serving-path only — the quantizer is not
    differentiable."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    row_scale = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0
    row_scale = jnp.maximum(row_scale, 1e-8)
    x8 = jnp.clip(jnp.round(x2 / row_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, params["w_q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * row_scale * params["scale"][None, :]
    y = y.reshape(*lead, -1).astype(x.dtype)
    if "b" in params:
        y = y + params["b"]
    return y


def quantize_dense(p):
    """{"w", "b"?} -> {"w_q" int8, "scale" f32, "b"?} (per-out-channel)."""
    w = p["w"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "scale": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


def layer_norm_init(dim: int, affine: bool = True, dtype=jnp.float32):
    if not affine:
        return {}
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(x, params=None, eps: float = 1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if params:
        y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def mlp_init(key, in_dim: int, hidden_dim: int, out_dim: Optional[int] = None,
             dtype=jnp.float32):
    """fc1 -> GELU -> fc2 (graph_decoder/layers.py:90-116 MLP)."""
    out_dim = out_dim or in_dim
    k1, k2 = jax.random.split(key)
    return {
        "fc1": dense_init(k1, in_dim, hidden_dim, dtype=dtype),
        "fc2": dense_init(k2, hidden_dim, out_dim, dtype=dtype),
    }


def mlp_apply(params, x):
    return dense(params["fc2"], jax.nn.gelu(dense(params["fc1"], x), approximate=False))


def embedding_init(key, num: int, dim: int, dtype=jnp.float32, std: float = 1.0):
    return {"weight": jax.random.normal(key, (num, dim), dtype) * std}


def softsign(x):
    return x / (1.0 + jnp.abs(x))
