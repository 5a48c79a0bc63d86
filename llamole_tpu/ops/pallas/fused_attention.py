"""Fused qk-norm + masked MHA for the GraphDiT denoiser.

Profiling at the reference shape (depth 28, H 1024, B 128, N 50) shows
the attention sub-chain costs ~43% of denoiser runtime for ~1% of its
FLOPs: XLA materializes the [B,N,3,heads,dh] reshape, two moveaxis
copies, two f32 layer-norm round trips, and the [B,heads,N,N] softmax —
all HBM-bound at tiny N (scripts/profile_denoiser.py).

This kernel consumes the RAW [B, N, 3H] qkv projection (no transposes
ever materialize), applies the per-head q/k layer norms, computes the
masked softmax attention for every head, and emits the head-concatenated
[B, N, H] tensor ready for the output projection. One program handles
G graphs x all heads, so the grid is ~16 programs instead of round 1's
2048 (whose launch overhead lost end-to-end despite winning standalone).

Forward-only by design: the training loss keeps the jnp composition
(XLA's fusion is fine there and autodiff stays free); the sampler scan
— where pallas_call's fusion barrier is irrelevant because the whole
chain lives inside one kernel — is the target (VERDICT round-1 item 7).
"""

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(qkv_ref, mask_ref, qs_ref, qb_ref, ks_ref, kb_ref, out_ref,
            *, num_heads: int, true_dh: int, eps: float = 1e-5):
    # blocks: qkv [G, Np, 3H], mask [G, Np] int32, norms [1, dh],
    # out [G, Np, H]
    g, n, three_h = qkv_ref.shape
    h_total = three_h // 3
    dh = h_total // num_heads
    qkv = qkv_ref[:]
    mask = mask_ref[:] > 0                          # [G, Np]
    neg = jnp.where(mask, 0.0, _NEG)[:, None, :]    # [G, 1, Np]
    scale = 1.0 / np.sqrt(true_dh)

    def ln(x, s_ref, b_ref):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return y * s_ref[0, :].astype(jnp.float32) + b_ref[0, :].astype(jnp.float32)

    outs = []
    for head in range(num_heads):
        off = head * dh
        q = ln(qkv[:, :, off:off + dh], qs_ref, qb_ref)
        k = ln(qkv[:, :, h_total + off:h_total + off + dh], ks_ref, kb_ref)
        v = qkv[:, :, 2 * h_total + off:2 * h_total + off + dh]
        logits = jax.lax.dot_general(
            q.astype(v.dtype), k.astype(v.dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [G, Np, Np]
        logits = logits * scale + neg
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(out_ref.dtype))
    out_ref[:] = jnp.concatenate(outs, axis=-1)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_attention_pallas(qkv, node_mask, q_scale, q_bias, k_scale, k_bias,
                            num_heads: int, interpret: bool = False):
    b, n, three_h = qkv.shape
    h_total = three_h // 3
    dh = h_total // num_heads
    n_pad = _pad_to(n, 64)
    G = 8
    b_pad = _pad_to(b, G)
    if n_pad != n or b_pad != b:
        qkv = jnp.pad(qkv, [(0, b_pad - b), (0, n_pad - n), (0, 0)])
        node_mask = jnp.pad(node_mask, [(0, b_pad - b), (0, n_pad - n)])

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, true_dh=dh),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, h_total), qkv.dtype),
        grid=(b_pad // G,),
        in_specs=[
            pl.BlockSpec((G, n_pad, three_h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, n_pad, h_total), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv, node_mask.astype(jnp.int32),
      q_scale.reshape(1, dh), q_bias.reshape(1, dh),
      k_scale.reshape(1, dh), k_bias.reshape(1, dh))
    return out[:b, :n, :]


def _fused_attention_reference(qkv, node_mask, q_norm: Dict, k_norm: Dict,
                               num_heads: int):
    """jnp composition with identical semantics (and the training path)."""
    from ..attention import masked_attention
    from ..nn import layer_norm

    b, n, three_h = qkv.shape
    h_total = three_h // 3
    dh = h_total // num_heads
    parts = qkv.reshape(b, n, 3, num_heads, dh)
    q, k, v = [jnp.moveaxis(parts[:, :, i], 2, 1) for i in range(3)]
    q = layer_norm(q, q_norm)
    k = layer_norm(k, k_norm)
    attn = masked_attention(q, k, v, key_mask=node_mask)
    return jnp.moveaxis(attn, 1, 2).reshape(b, n, h_total)


def fused_block_attention(
    qkv: jnp.ndarray,          # [B, N, 3H] raw qkv projection
    node_mask: jnp.ndarray,    # [B, N] bool
    q_norm: Dict, k_norm: Dict,  # layer-norm params over dh
    num_heads: int,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """qk-norm + masked MHA, head-concatenated output [B, N, H]."""
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if not use_pallas and not interpret:
        return _fused_attention_reference(qkv, node_mask, q_norm, k_norm,
                                          num_heads)
    return _fused_attention_pallas(
        qkv, node_mask, q_norm["scale"], q_norm["bias"],
        k_norm["scale"], k_norm["bias"], num_heads, interpret=interpret)
