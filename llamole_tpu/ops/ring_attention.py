"""Ring attention: causal attention with the sequence sharded over a
mesh axis (context parallelism).

The reference has NO context/sequence parallelism (SURVEY §2.2: "TP /
PP / SP / EP / CP / ring-attention — absent"); its only long-context
tool is S²-attn. This is the TPU-native extension SURVEY §5 sketches:
each device holds a sequence shard of q/k/v, k/v blocks rotate around
the ring via jax.lax.ppermute while every device accumulates its local
queries' attention with an online-softmax (flash-style) update, so the
full [S, S] score matrix never exists on any chip and sequence length
scales linearly with the ring size.

Communication rides the mesh axis (ICI on hardware); compute and the
ppermute are interleaved inside one lax.fori_loop, so XLA can overlap
the collective with the block attention.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

_NEG = -1e30


def _block_attend(q, k, v, scale, q_pos, k_pos, key_valid):
    """Online-softmax partial attention of local q against one k/v block.

    q [B,Sq,H,D], k/v [B,Sk,H,D], q_pos [Sq], k_pos [Sk] global
    positions for causal masking, key_valid [B,Sk].
    Returns (m [B,H,Sq,1], l [B,H,Sq,1], o [B,H,Sq,D]) contributions."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    causal = q_pos[:, None] >= k_pos[None, :]                 # [Sq, Sk]
    mask = causal[None, None, :, :] & key_valid[:, None, None, :]
    logits = jnp.where(mask, logits, _NEG)
    m = jnp.max(logits, axis=-1, keepdims=True)               # [B,H,Sq,1]
    p = jnp.exp(logits - m)
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bkhd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return m, l, o


def ring_attention(
    q: jnp.ndarray,              # [B, S, H, D] — S sharded over `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],  # [B, S] 1 = real token
    mesh: Mesh,
    axis: str = "sp",
) -> jnp.ndarray:
    """Causal multi-head attention over a sequence-sharded batch.

    Inputs/outputs are GLOBAL arrays with S partitioned along `axis`;
    shard_map runs the ring on the per-device shards. Output matches
    single-device causal attention to accumulation precision."""
    b, s, h, d = q.shape
    n_dev = mesh.shape[axis]
    assert s % n_dev == 0, f"seq {s} must divide over {n_dev} devices"
    s_local = s // n_dev
    scale = 1.0 / np.sqrt(d)
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)

    def local_fn(q_l, k_l, v_l, mask_l):
        # q_l/k_l/v_l [B, S_local, H, D]; mask_l [B, S_local]
        idx = jax.lax.axis_index(axis)
        q_pos = idx * s_local + jnp.arange(s_local)

        # initial accumulators must be marked as device-varying over the
        # ring axis or the fori_loop carry types mismatch (shard_map VMA)
        pcast = getattr(jax.lax, "pcast", None)   # pvary deprecated
        vary = ((lambda v: pcast(v, (axis,), to="varying"))
                if pcast is not None else
                (lambda v: jax.lax.pvary(v, axis)))
        m = vary(jnp.full((b, h, s_local, 1), _NEG, jnp.float32))
        l = vary(jnp.zeros((b, h, s_local, 1), jnp.float32))
        o = vary(jnp.zeros((b, h, s_local, d), jnp.float32))

        def accumulate(t, m, l, o, k_c, v_c, mask_c):
            src = (idx - t) % n_dev        # whose k/v block we hold now
            k_pos = src * s_local + jnp.arange(s_local)
            bm, bl, bo = _block_attend(q_l, k_c, v_c, scale, q_pos, k_pos,
                                       mask_c > 0)
            new_m = jnp.maximum(m, bm)
            alpha = jnp.exp(m - new_m)
            beta = jnp.exp(bm - new_m)
            return new_m, l * alpha + bl * beta, o * alpha + bo * beta

        def step(t, carry):
            m, l, o, k_c, v_c, mask_c = carry
            m, l, o = accumulate(t, m, l, o, k_c, v_c, mask_c)
            # rotate k/v/mask to the next device on the ring
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            k_n = jax.lax.ppermute(k_c, axis, perm)
            v_n = jax.lax.ppermute(v_c, axis, perm)
            mask_n = jax.lax.ppermute(mask_c, axis, perm)
            return m, l, o, k_n, v_n, mask_n

        # n_dev-1 rotating steps, then the final block WITHOUT the
        # rotation (its permuted result would be discarded — a full k/v
        # shard of wasted ICI traffic per call otherwise)
        m, l, o, k_c, v_c, mask_c = jax.lax.fori_loop(
            0, n_dev - 1, step, (m, l, o, k_l, v_l, mask_l))
        m, l, o = accumulate(n_dev - 1, m, l, o, k_c, v_c, mask_c)
        out = o / jnp.maximum(l, 1e-30)
        return jnp.moveaxis(out, 1, 2).astype(q_l.dtype)  # [B,S_local,H,D]

    from jax import shard_map as _shard_map

    spec = P(None, axis, None, None)
    fn = _shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec, spec, spec, P(None, axis)),
        out_specs=spec)
    return fn(q, k, v, attention_mask)
