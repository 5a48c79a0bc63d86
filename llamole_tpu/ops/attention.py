"""Attention ops.

masked_attention: dense multi-head attention with a key-side node mask,
used by the GraphDiT denoiser (reference: graph_decoder/layers.py:56-87
wraps torch SDPA with a node-pair mask; padded query rows there are
un-masked purely to dodge NaNs — their outputs are discarded by
PlaceHolder.mask. A key-side-only mask is equivalent for all surviving
positions and cheaper, so that's what we compute.)

Kept as a plain jnp composition: XLA fuses the softmax chain well at
these sizes (N = max_n_nodes <= ~128). A Pallas fused kernel slots in
behind the same signature later.
"""

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def masked_attention(
    q: jnp.ndarray,  # [B, H, N, Dh]
    k: jnp.ndarray,  # [B, H, N, Dh]
    v: jnp.ndarray,  # [B, H, N, Dh]
    key_mask: Optional[jnp.ndarray] = None,  # [B, N] bool
) -> jnp.ndarray:
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)
