"""Fused masked multi-head attention for dense graph transformers.

Replaces the jnp composition in ops/attention.py (the GraphDiT denoiser
hot op — reference used torch SDPA, layers.py:75). One (batch, head)
program computes QKᵀ -> mask -> softmax -> PV entirely in VMEM: graph
token counts (max_n_nodes ≤ ~128) make a full row-block resident, so no
online-softmax tiling is needed — the win is fusion (no [B,H,N,N]
round-trip to HBM) and f32 logits with bf16 MXU inputs.

Shapes: q,k,v [B, H, N, Dh], key_mask [B, N] bool -> out [B, H, N, Dh].
N and Dh are padded to lane/sublane multiples by the wrapper.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def use_pallas_default() -> bool:
    return jax.devices()[0].platform == "tpu"


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, true_dh: int):
    # blocks: q/k/v/out [1, 1, N, Dh], mask [1, N] (int32)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    mask = mask_ref[pl.program_id(0), :] > 0  # [N] row of the full mask
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / np.sqrt(true_dh))  # scale by the REAL head dim
    logits = jnp.where(mask[None, :], logits, _NEG)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    out_ref[0, 0] = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _graph_attention_pallas(q, k, v, key_mask, interpret=False):
    b, h, n, dh = q.shape
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    n_pad = _pad_to(n, sub)
    dh_pad = _pad_to(dh, 128)

    if n_pad != n or dh_pad != dh:
        pad_q = [(0, 0), (0, 0), (0, n_pad - n), (0, dh_pad - dh)]
        q = jnp.pad(q, pad_q)
        k = jnp.pad(k, pad_q)
        v = jnp.pad(v, pad_q)
    mask = jnp.pad(key_mask.astype(jnp.int32), [(0, 0), (0, n_pad - n)])

    grid = (b, h)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, true_dh=dh),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, dh_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, n_pad, dh_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad, dh_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad, dh_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            # full mask resident per program (tiny); Mosaic disallows
            # (1, N) blocks unless N is lane-aligned to the array
            pl.BlockSpec((b, n_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pad, dh_pad),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, mask)
    return out[:, :, :n, :dh]


def graph_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked MHA with automatic Pallas/jnp dispatch."""
    from ..attention import masked_attention

    if use_pallas is None:
        use_pallas = use_pallas_default()
    if not use_pallas and not interpret:
        return masked_attention(q, k, v, key_mask)
    if key_mask is None:
        key_mask = jnp.ones(q.shape[:1] + q.shape[2:3], bool)
    return _graph_attention_pallas(q, k, v, key_mask, interpret=interpret)
